"""Scale-path operators: salted aggregation/join equivalence, bucketed
co-located joins (zero-exchange plan)."""

from __future__ import annotations

from pyspark.sql import functions as F

from healthcare_data_pipeline_spark import plans
from healthcare_data_pipeline_spark.catalog import table
from healthcare_data_pipeline_spark.operators.skew import salted_join, salted_sum
from healthcare_data_pipeline_spark.sources.bucketed import colocated_join, write_bucketed
from tests.conftest import SF_DIR


def _skewed_df(spark):
    # 90% of rows under one hot key — the shape that stalls a single reducer.
    hot = spark.range(9000).select(
        F.lit("HOT").alias("k"), F.col("id").alias("rid"), F.lit(1.0).alias("v")
    )
    cold = spark.range(1000).select(
        F.concat(F.lit("c"), (F.col("id") % 50).cast("string")).alias("k"),
        (F.col("id") + 100000).alias("rid"),
        F.lit(2.0).alias("v"),
    )
    return hot.unionByName(cold)


def test_salted_sum_equals_plain_sum(spark):
    df = _skewed_df(spark)
    got = {
        r.k: (r.total_v, r.n_rows)
        for r in salted_sum(df, ["k"], {"v": "total_v"}, salt_from="rid").collect()
    }
    want = {
        r.k: (r.total_v, r.n)
        for r in df.groupBy("k").agg(F.sum("v").alias("total_v"), F.count("*").alias("n")).collect()
    }
    assert got == want


def test_salted_join_equals_plain_join(spark):
    big = _skewed_df(spark)
    small = spark.createDataFrame(
        [("HOT", "hot-dim")] + [(f"c{i}", f"dim{i}") for i in range(50)], "k string, attr string"
    )
    got = salted_join(big, small, on="k", n_salts=8, salt_from="rid")
    want = big.join(small, "k")
    assert got.count() == want.count()
    # order-insensitive content check; decimal sum so ANSI mode can't overflow
    digest = F.sum(F.xxhash64("k", "rid", "attr").cast("decimal(38,0)")).alias("h")
    assert got.select(digest).collect() == want.select(digest).collect()


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    o = table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    li = table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(o, "b_orders", "o_orderkey", n_buckets=8)
    write_bucketed(li, "b_lineitem", "o_orderkey", n_buckets=8)
    joined = colocated_join(spark, "b_orders", "b_lineitem", on="o_orderkey")
    assert plans.count_exchanges(joined) == 0, plans.simple_plan(joined)
    # and it is the same result as the shuffled join
    want = o.join(li, "o_orderkey").count()
    assert joined.count() == want
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_zone_write_partition_pruning(spark, tmp_path):
    """Hive-style year=/month=/day= zone layout must partition-prune on read:
    a day filter shows up as a PartitionFilter and the scan reads only that
    day's files (SURVEY §4 'partition layout for pruning' row)."""
    import datetime as dt

    from healthcare_data_pipeline_spark.operators.cleanse import (
        stamp_ingestion_date,
        write_zone,
    )

    o = table(spark, SF_DIR, "orders").limit(200)
    zone = str(tmp_path / "zone" / "orders")
    write_zone(stamp_ingestion_date(o, dt.date(2026, 8, 1)), zone, partitioned=True)
    for day in (2, 3):
        stamped = stamp_ingestion_date(o, dt.date(2026, 8, day))
        stamped.write.mode("append").partitionBy("year", "month", "day").parquet(zone)

    df = spark.read.parquet(zone).filter(F.col("day") == 2)
    plan = plans.formatted_plan(df)
    m = __import__("re").search(r"PartitionFilters: \[(.*?)\]", plan)
    assert m and "day" in m.group(1), plan
    assert df.count() == 200  # only day=2's rows


def test_connected_components_matches_union_find(spark):
    """Distributed min-label propagation must equal a driver-side union-find
    on the same edges (including a chain, a triangle, and singleton-free)."""
    edges = [(1, 2), (2, 3), (10, 11), (11, 12), (12, 10), (20, 21), (3, 4)]
    df = spark.createDataFrame(edges, "d1 long, d2 long")
    from healthcare_data_pipeline_spark.operators.components import (
        canonical_per_cluster,
        connected_components,
    )

    # both sides of the size gate must agree: driver union-find (default for
    # a 7-edge graph) and the forced distributed label propagation
    got = {r.vertex: r.component for r in connected_components(df).collect()}
    got_dist = {
        r.vertex: r.component
        for r in connected_components(df, driver_threshold=0).collect()
    }

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    want = {v: find(v) for v in parent}
    assert got == want
    assert got_dist == want

    canon = {r.component: (r.canonical_id, r.cluster_size)
             for r in canonical_per_cluster(connected_components(df)).collect()}
    assert canon[1] == (1, 4)   # chain 1-2-3-4
    assert canon[10] == (10, 3)  # triangle
    assert canon[20] == (20, 2)


def test_components_use_reliable_checkpoint_when_dir_set(spark, tmp_path):
    """With a checkpoint dir configured (cluster mode), lineage truncation
    must take the RELIABLE checkpoint branch (survives executor loss) and a
    high-diameter chain must still converge; without one, localCheckpoint."""
    from healthcare_data_pipeline_spark.operators.components import connected_components

    sc = spark.sparkContext
    # a 13-node chain needs >5 iterations -> crosses the truncation point
    edges = spark.createDataFrame([(i, i + 1) for i in range(12)], "d1 long, d2 long")
    sc.setCheckpointDir(str(tmp_path / "ckpt"))
    try:
        # driver_threshold=0 forces the distributed path (a 12-edge chain
        # would otherwise take the driver union-find and never checkpoint)
        comp = connected_components(edges, max_iter=30, driver_threshold=0)
        assert comp.count() == 13
        assert {r.component for r in comp.collect()} == {0}
        # the reliable branch actually wrote checkpoint state
        assert any((tmp_path / "ckpt").rglob("*")), "no reliable checkpoint written"
    finally:
        sc._jsc.sc().setCheckpointDir(None)  # noqa: SLF001 — restore session state


def test_dedup_clusters_query_runs(spark):
    from healthcare_data_pipeline_spark.queries import catalog

    out = catalog()["dd08_dedup_clusters"].fn(spark, SF_DIR)
    rows = out.collect()
    assert all(r.cluster_size >= 2 for r in rows)  # singletons never form edges
    assert all(r.canonical_id <= r.component for r in rows)


def test_salted_join_rejects_outer_modes(spark):
    """Right/full-outer through a salted join would duplicate every unmatched
    small-side row once per salt (the small side is exploded) — must raise."""
    big = _skewed_df(spark)
    small = spark.createDataFrame([("HOT", "hot-dim")], "k string, attr string")
    import pytest as _pytest

    for how in ("right", "right_outer", "full", "full_outer", "outer"):
        with _pytest.raises(ValueError, match="salted_join does not support"):
            salted_join(big, small, on="k", n_salts=8, salt_from="rid", how=how)
    # left stays supported and equals the plain left join
    got = salted_join(big, small, on="k", n_salts=8, salt_from="rid", how="left")
    assert got.count() == big.join(small, "k", "left").count()
