"""Unit tests for cleansing, schema resolution, sources, and profiling operators."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from healthcare_data_pipeline_spark.operators import cleanse, profiling, reports, resolve
from healthcare_data_pipeline_spark.sources import files, jdbc
from tests.fixtures import make_dirty_prescriber_drug, write_csv_dir


def test_cleanse_dirty_table(spark, tmp_path):
    rows = make_dirty_prescriber_drug()
    write_csv_dir({"prescriber_drug": rows}, str(tmp_path))
    df = files.read_csv(spark, str(tmp_path / "prescriber_drug.csv"))
    out = cleanse.cleanse_table(df, "prescriber_drug", when=dt.date(2025, 11, 7))
    # cast applied (preprocessing_data.py:124-125)
    assert dict(out.dtypes)["total_claims"] == "int"
    # duplicates removed, distinct rows preserved
    assert out.count() == df.dropDuplicates().count() < df.count()
    # stamped partitions (ingest_data.py:91-96)
    assert out.select("year", "month", "day").first() == (2025, 11, 7)
    # nulls survive cleansing (they're profiling's job, not cleanse's)
    assert out.filter(F.col("total_drug_cost").isNull()).count() > 0


def test_resolver_heuristics(spark):
    df = spark.createDataFrame(
        [(1, "BrandA", 10, 5.0)],
        "presc_id int, drug_brand_name string, total_claims int, total_drug_cost double",
    )
    assert resolve.resolve_drug_column(df) == "drug_brand_name"
    assert resolve.resolve_measure_column(df) == "total_claims"
    assert resolve.resolve_id_column(df, "presc") == "presc_id"
    dfs = {"cleansed_prescriber_drug": df}
    assert resolve.resolve_table(dfs, "prescriber_drug") is df
    # no measure columns -> synthetic _row_count fallback (runnerfile.py:379-381)
    bare = spark.createDataFrame([("x",)], "name string")
    with_m, m = resolve.with_fallback_measure(bare)
    assert m == "_row_count" and with_m.select(m).first()[0] == 1


def test_runner_reports_on_resolved_columns(spark):
    fact = spark.createDataFrame(
        [(1, "A", 5), (1, "B", 3), (2, "A", 7)],
        "presc_id int, drug_brand_name string, total_claims int",
    )
    presc = spark.createDataFrame([(1, "Dr X"), (2, "Dr Y")], "presc_id int, presc_fullname string")
    dr = reports.runner_drug_report(fact, "drug_brand_name", "total_claims").collect()
    assert dr[0].drug_brand_name == "A" and dr[0].prescriptions == 12
    pr = reports.runner_prescriber_report(fact, presc, "presc_id", "presc_fullname").collect()
    assert pr[0].presc_id == 1 and pr[0].num_prescriptions == 2 and pr[0].presc_fullname == "Dr X"


def test_csv_discovery(tmp_path):
    (tmp_path / "a").mkdir()
    (tmp_path / "a" / "part1.csv").write_text("x\n1\n")
    (tmp_path / "b.csv").write_text("y\n2\n")
    found = files.discover_csv_tables(str(tmp_path))
    assert set(found) == {"a", "b"}


def test_jdbc_options_incremental(spark):
    cfg = jdbc.JdbcConfig(url="jdbc:postgresql://h/db", user="u", password="p")
    existing = spark.createDataFrame([(7,), (12,)], "id int")
    pred = jdbc.incremental_predicate(existing, ("id",))
    assert pred == "id > 12"
    opts = jdbc.read_options(cfg, "prescriber", predicate=pred,
                             partition_column="id", lower_bound=0, upper_bound=1000,
                             num_partitions=4)
    assert opts["dbtable"] == "(SELECT * FROM prescriber WHERE id > 12) tmp"
    assert opts["numPartitions"] == "4" and opts["partitionColumn"] == "id"
    # full-load path
    assert jdbc.incremental_predicate(None) is None


def test_profile_single_pass(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a")], "id int, name string"
    )
    recs = {r["column"]: r for r in profiling.profile_table(df)}
    assert recs["name"]["null_count"] == 1
    assert recs["name"]["unique_count"] == 1  # countDistinct ignores nulls
    assert recs["id"]["unique_count"] == 3
    assert recs["id"]["row_count"] == 3
    assert recs["name"]["sample_values"] == ["a"]


def test_histogram_and_topk(spark):
    df = spark.createDataFrame([(float(i),) for i in range(100)], "v double")
    hist = profiling.numeric_histogram(df, "v", bins=10).orderBy("bin").collect()
    assert len(hist) == 10 and all(r.n == 10 for r in hist)
    cats = spark.createDataFrame([("a",)] * 3 + [("b",)] * 2 + [("c",)], "k string")
    top = profiling.categorical_top_k(cats, "k", 2).collect()
    assert [(r.k, r.n) for r in top] == [("a", 3), ("b", 2)]


def test_merge_upsert_semantics(spark):
    from healthcare_data_pipeline_spark.operators.upsert import merge_upsert

    existing = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "id int, tag string, v double"
    )
    updates = spark.createDataFrame(
        [(2, None, 99.0), (4, "d", 40.0)], "id int, tag string, v double"
    )
    got = {r.id: (r.tag, r.v) for r in merge_upsert(existing, updates, "id").collect()}
    assert got == {
        1: ("a", 10.0),
        2: (None, 99.0),  # update wins WHOLLY — its NULL tag overwrites "b"
        3: ("c", 30.0),
        4: ("d", 40.0),
    }

    import pytest as _pytest

    with _pytest.raises(ValueError, match="schema mismatch"):
        merge_upsert(existing, updates.drop("v"), "id")
