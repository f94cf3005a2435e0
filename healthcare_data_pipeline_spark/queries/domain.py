"""Reference-parity report shapes (SURVEY.md §2.3-§2.4, §3) on the driver tables.

The reference's two curated outputs are:
- ``drug_report`` (transform_data.py:77-111): groupBy(fact keys) -> sums ->
  left join dim -> projection;
- ``prescriber_report`` (transform_data.py:113-141): groupBy(single key) ->
  sums -> left join dim -> second left join dim on cross-named key ->
  projection;
plus the local runner's simpler variants (runnerfile.py:366-442).

Here the same operator compositions run over the TPC-H-ish driver tables
(fact = lineitem/orders; dims = part/customer/nation) so the driver's DuckDB
oracle can hash-check them.  The healthcare-schema versions of these same
functions live in ``healthcare_data_pipeline_spark.operators.reports`` and are
exercised by the fixture tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from healthcare_data_pipeline_spark.catalog import table
from healthcare_data_pipeline_spark.functions import xsum
from healthcare_data_pipeline_spark.queries import query


@query(
    "d01_drug_report_shape",
    oracle="""
    SELECT
      a.l_suppkey AS supp_id,
      a.l_partkey AS part_id,
      a.total_qty,
      a.total_cost,
      p.p_type AS part_type
    FROM (
      SELECT l_suppkey, l_partkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(25,8))) AS DOUBLE) AS total_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,8))) AS DOUBLE) AS total_cost
      FROM lineitem
      GROUP BY l_suppkey, l_partkey
    ) a
    LEFT JOIN part p ON a.l_partkey = p.p_partkey
    """,
    tags=("report", "A1", "J1", "P1"),
    doc="drug_report shape (transform_data.py:89-104): two-key grouped sums, left join to the "
    "item dim, enriching projection. Maps (presc_id,drug_brand_name,total_claims,total_drug_cost,"
    "drug_type) -> (l_suppkey,l_partkey,l_quantity,l_extendedprice,p_type).",
)
def d01_drug_report_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    # widen: the two-key grouped decimal sums barely reduce (≈520k groups from
    # 600k rows), so the partial aggregate is corpus-sized work that must not
    # run on one scan task (measured −0.70s at sf0.1)
    li = table(spark, sf_dir, "lineitem", widen=True)
    p = table(spark, sf_dir, "part")
    agg = li.groupBy("l_suppkey", "l_partkey").agg(
        xsum("l_quantity", "total_qty"), xsum("l_extendedprice", "total_cost")
    )
    # No broadcast hint: part grows with scale factor (sf x 200k rows), so a
    # forced broadcast OOMs at 100x. Catalyst/AQE pick BroadcastHashJoin while
    # the dim is under autoBroadcastJoinThreshold and fall back to a shuffle
    # join beyond it. (The healthcare analogue in operators/reports.py keeps
    # its hint — drug/state dims are bounded-small by nature.)
    return agg.join(p, agg.l_partkey == p.p_partkey, "left").select(
        F.col("l_suppkey").alias("supp_id"),
        F.col("l_partkey").alias("part_id"),
        "total_qty",
        "total_cost",
        F.col("p_type").alias("part_type"),
    )


@query(
    "d02_prescriber_report_shape",
    oracle="""
    SELECT
      a.o_custkey AS cust_id,
      c.c_name AS cust_name,
      c.c_mktsegment AS segment,
      n.n_name AS cust_nation,
      a.total_orders,
      a.total_spend
    FROM (
      SELECT o_custkey,
             COUNT(*) AS total_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(25,8))) AS DOUBLE) AS total_spend
      FROM orders
      GROUP BY o_custkey
    ) a
    LEFT JOIN customer c ON a.o_custkey = c.c_custkey
    LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    """,
    tags=("report", "A2", "J2", "J3", "P1"),
    doc="prescriber_report shape (transform_data.py:113-141): single-key grouped sums, left join "
    "entity dim, second left join geo dim on a cross-named key, final projection with renames. "
    "Maps (presc_id->o_custkey, state->nation).",
)
def d02_prescriber_report_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    agg = o.groupBy("o_custkey").agg(
        F.count("*").alias("total_orders"), xsum("o_totalprice", "total_spend")
    )
    # customer scales with sf (sf x 150k rows) -> no forced broadcast (AQE
    # decides); nation is fixed at 25 rows -> the hint is always right.
    joined = agg.join(c, agg.o_custkey == c.c_custkey, "left").join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey, "left"
    )
    return joined.select(
        F.col("o_custkey").alias("cust_id"),
        # The reference wraps name columns in a degenerate self-coalesce
        # (transform_data.py:100,131) — preserved here for shape parity.
        F.coalesce(c.c_name, c.c_name).alias("cust_name"),
        F.col("c_mktsegment").alias("segment"),
        F.col("n_name").alias("cust_nation"),
        "total_orders",
        "total_spend",
    )


@query(
    "d03_runner_drug_report",
    oracle="""
    SELECT l_partkey AS part_id,
           CAST(SUM(CAST(l_quantity AS DECIMAL(25,8))) AS DOUBLE) AS prescriptions
    FROM lineitem
    GROUP BY l_partkey
    ORDER BY prescriptions DESC, part_id ASC
    LIMIT 100
    """,
    tags=("report", "A3", "O1"),
    doc="Local-runner drug_report (runnerfile.py:383): groupBy discovered item column, "
    "sum of discovered measure, order by measure desc — top 100 with unique tie-break.",
)
def d03_runner_drug_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.col("l_partkey").alias("part_id"))
        .agg(xsum("l_quantity", "prescriptions"))
        .orderBy(F.desc("prescriptions"), F.asc("part_id"))
        .limit(100)
    )


@query(
    "d04_runner_prescriber_report",
    oracle="""
    SELECT a.o_custkey AS cust_id, a.num_orders, c.c_name AS cust_name
    FROM (
      SELECT o_custkey, COUNT(*) AS num_orders
      FROM orders
      GROUP BY o_custkey
      ORDER BY num_orders DESC, o_custkey ASC
      LIMIT 100
    ) a
    LEFT JOIN customer c ON a.o_custkey = c.c_custkey
    """,
    tags=("report", "A4", "J4", "O1"),
    doc="Local-runner prescriber_report (runnerfile.py:418-427): groupBy entity id, count(*), "
    "order desc, left join names back (J4).",
)
def d04_runner_prescriber_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    top = (
        o.groupBy("o_custkey")
        .agg(F.count("*").alias("num_orders"))
        .orderBy(F.desc("num_orders"), F.asc("o_custkey"))
        .limit(100)
    )
    # top is LIMIT 100 but customer is the build side of this left join and
    # scales with sf: leave the strategy to AQE rather than force it inflight.
    return top.join(c, top.o_custkey == c.c_custkey, "left").select(
        F.col("o_custkey").alias("cust_id"),
        "num_orders",
        F.col("c_name").alias("cust_name"),
    )
