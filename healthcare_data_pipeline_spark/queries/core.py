"""Core relational operator queries (SURVEY.md §2.1-§2.8) over the driver tables.

Each query exercises one or more inventory rows (S/P/J/A/O/F/W numbers cite
SURVEY.md §2 and through it the reference's file:line evidence) and carries an
ANSI-SQL oracle that DuckDB runs over the same parquet files.  Float parity
follows the decimal-exact convention in
``healthcare_data_pipeline_spark.functions``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from healthcare_data_pipeline_spark.localrel import local_relation

from healthcare_data_pipeline_spark.catalog import table
from healthcare_data_pipeline_spark.functions import MONEY, null_count, sql_xsum, xavg, xsum
from healthcare_data_pipeline_spark.queries import query

# ---------------------------------------------------------------------------
# Aggregations (A1, A2, A6; reference transform_data.py:89-95 groupBy+sum)
# ---------------------------------------------------------------------------


@query(
    "q01_pricing_summary",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(25,8))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,8))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(25,8))) AS DOUBLE) AS sum_disc_price,
      CAST(SUM(CAST((l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS DECIMAL(25,8))) AS DOUBLE) AS sum_charge,
      CAST(SUM(CAST(l_quantity AS DECIMAL(25,8))) AS DOUBLE) / CAST(COUNT(l_quantity) AS DOUBLE) AS avg_qty,
      CAST(SUM(CAST(l_discount AS DECIMAL(25,8))) AS DOUBLE) / CAST(COUNT(l_discount) AS DOUBLE) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "A1", "P2"),
    doc="TPC-H-Q1-style multi-aggregate grouped scan (A1; transform_data.py:89-95 pattern).",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # widen: six decimal sums fuse into the scan's partial aggregate — on a
    # row-group-starved scan that is single-threaded (measured −0.63s at sf0.1)
    li = table(spark, sf_dir, "lineitem", widen=True)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            xsum("l_quantity", "sum_qty"),
            xsum("l_extendedprice", "sum_base_price"),
            xsum(disc_price, "sum_disc_price"),
            xsum(charge, "sum_charge"),
            xavg("l_quantity", "avg_qty"),
            xavg("l_discount", "avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "q02_filter_project",
    oracle="""
    SELECT
      l_orderkey AS orderkey,
      l_linenumber AS line_no,
      l_quantity AS qty,
      l_extendedprice * (1 - l_discount) AS net_price
    FROM lineitem
    WHERE l_quantity > 45
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_returnflag = 'N'
    """,
    tags=("project", "filter", "P1", "P2"),
    doc="Projection + alias + conjunctive filter (P1/P2; transform_data.py:98-104).",
)
def q02_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_quantity") > 45)
            & (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_returnflag") == "N")
        )
        .select(
            F.col("l_orderkey").alias("orderkey"),
            F.col("l_linenumber").alias("line_no"),
            F.col("l_quantity").alias("qty"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        )
    )


@query(
    "q03_cast_literal",
    oracle="""
    SELECT
      o_orderkey,
      CAST(o_orderkey AS INT) AS orderkey_int,
      CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor,
      CAST(CAST(o_orderkey AS INT) AS VARCHAR) AS orderkey_str,
      2025 AS year, 11 AS month, 7 AS day
    FROM orders
    WHERE o_orderkey <= 1000
    """,
    tags=("project", "P3", "P4"),
    doc="Casts + literal ingestion-date stamping (P3/P4; ingest_data.py:91-96, preprocessing_data.py:124-125).",
)
def q03_cast_literal(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderkey") <= 1000).select(
        "o_orderkey",
        F.col("o_orderkey").cast("int").alias("orderkey_int"),
        F.floor("o_totalprice").cast("long").alias("price_floor"),
        F.col("o_orderkey").cast("int").cast("string").alias("orderkey_str"),
        F.lit(2025).alias("year"),
        F.lit(11).alias("month"),
        F.lit(7).alias("day"),
    )


@query(
    "q04_topk_orders",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 25
    """,
    tags=("sort", "limit", "O1", "O2"),
    doc="Order-by-desc + limit with unique tie-break (O1/O2; runnerfile.py:383,418).",
)
def q04_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .limit(25)
    )


@query(
    "q05_group_count",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("agg", "A4"),
    doc="Grouped count(*) (A4; runnerfile.py:418).",
)
def q05_group_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(F.count("*").alias("n_orders"))


@query(
    "q06_global_agg",
    oracle="""
    SELECT
      MAX(l_orderkey) AS max_orderkey,
      COUNT(*) AS n_rows,
      CAST(SUM(CAST(l_quantity AS DECIMAL(25,8))) AS DOUBLE) AS total_qty,
      COUNT(DISTINCT l_suppkey) AS n_suppliers
    FROM lineitem
    """,
    tags=("agg", "A5", "A6", "A8"),
    doc="Global max / count / sum / countDistinct (A5 watermark probe ingest_data.py:66-69; A6; A8).",
)
def q06_global_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # widen A/B LOST decisively (r16: 0.637 vs 1.305 s min, 5/5 clean reps
    # per arm) — the countDistinct expand shuffles more than the single-task
    # map saves; narrow kept.  q05/q10 measured 0.2-0.4 s (nothing to widen).
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.max("l_orderkey").alias("max_orderkey"),
        F.count("*").alias("n_rows"),
        xsum("l_quantity", "total_qty"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
    )


@query(
    "q07_null_profile",
    oracle="""
    SELECT
      COUNT(*) AS n_rows,
      CAST(SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS event_id_nulls,
      CAST(SUM(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS ts_nulls,
      CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS user_id_nulls,
      CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS event_type_nulls,
      CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS value_nulls,
      CAST(SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS props_nulls
    FROM events
    """,
    tags=("profiling", "A7"),
    doc="Single-pass per-column null profile (A7): the reference runs one filter(isNull).count() "
    "job per column (runnerfile.py:130,160); the engine folds all columns into ONE aggregation "
    "job — O(1) scans instead of O(columns), which is the difference between minutes and hours at 100 TB.",
)
def q07_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    aggs = [F.count("*").alias("n_rows")] + [null_count(c) for c in ev.columns]
    return ev.agg(*aggs)


@query(
    "q08_distinct",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
    tags=("agg", "A8", "A9"),
    doc="Distinct value enumeration (A9; runnerfile.py:261 bounded distinct collect).",
)
def q08_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return c.select("c_mktsegment", "c_nationkey").distinct()


@query(
    "q09_dedup_exact",
    oracle="""
    SELECT DISTINCT l_orderkey, l_returnflag, l_linestatus FROM lineitem
    """,
    tags=("dedup", "A10"),
    doc="Whole-row dropDuplicates on a projection (A10; preprocessing_data.py:84,97,110,123).",
)
def q09_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.select("l_orderkey", "l_returnflag", "l_linestatus").dropDuplicates()


@query(
    "q10_value_counts",
    oracle="""
    SELECT event_type, COUNT(*) AS n
    FROM events
    GROUP BY event_type
    ORDER BY n DESC, event_type ASC
    LIMIT 10
    """,
    tags=("agg", "A13", "O1"),
    doc="Categorical top-k value_counts (A13; runnerfile.py:209, eda.py:110).",
)
def q10_value_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("event_type"))
        .limit(10)
    )


@query(
    "q11_histogram",
    oracle="""
    SELECT
      CAST(FLOOR(l_extendedprice / 5000.0) AS BIGINT) AS bin,
      COUNT(*) AS n,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,8))) AS DOUBLE) AS bin_total
    FROM lineitem
    GROUP BY 1
    """,
    tags=("profiling", "A16"),
    doc="Histogram binning as a grouped aggregation (A16; runnerfile.py:190-204, eda.py:46-58) — "
    "distributed equivalent of the reference's driver-side matplotlib hist.",
)
def q11_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.withColumn("bin", F.floor(F.col("l_extendedprice") / 5000.0).cast("long"))
        .groupBy("bin")
        .agg(F.count("*").alias("n"), xsum("l_extendedprice", "bin_total"))
    )


# ---------------------------------------------------------------------------
# Joins (J1-J4; transform_data.py:97,127-128)
# ---------------------------------------------------------------------------


@query(
    "q12_join_left",
    oracle="""
    SELECT
      COALESCE(c.c_mktsegment, 'unknown') AS segment,
      COUNT(*) AS n_orders,
      CAST(SUM(CAST(o.o_totalprice AS DECIMAL(25,8))) AS DOUBLE) AS total_price
    FROM orders o
    LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1
    """,
    tags=("join", "J2", "F2", "F7"),
    doc="Left equi-join fact->dim + coalesce null fallback (J2 transform_data.py:127; F2/F7). "
    "No forced broadcast: customer grows with scale factor, so the strategy is left to "
    "Catalyst/AQE (broadcast under the threshold, shuffle join beyond it).",
)
def q12_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "left")
        .select(F.coalesce(c.c_mktsegment, F.lit("unknown")).alias("segment"), o.o_totalprice)
        .groupBy("segment")
        .agg(F.count("*").alias("n_orders"), xsum("o_totalprice", "total_price"))
    )


@query(
    "q13_join_expr",
    oracle="""
    SELECT n.n_nationkey, n.n_name, r.r_name AS region_name
    FROM nation n
    LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
    tags=("join", "J3"),
    doc="Left join with explicit cross-name key expression (J3; transform_data.py:128).",
)
def q13_join_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "left").select(
        n.n_nationkey, n.n_name, r.r_name.alias("region_name")
    )


@query(
    "q14_star_join",
    oracle="""
    SELECT
      r.r_name AS region_name,
      n.n_name AS nation_name,
      COUNT(*) AS n_lines,
      CAST(SUM(CAST((l.l_extendedprice * (1 - l.l_discount)) AS DECIMAL(25,8))) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY 1, 2
    """,
    tags=("join", "agg", "flagship"),
    doc="Flagship star join: fact ⋈ 4 dims → revenue rollup by region/nation. At scale the "
    "only shuffle is lineitem⋈orders (both huge, co-partitioned on orderkey); customer/nation/"
    "region are broadcast so the dim joins are shuffle-free.",
)
def q14_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(
            o.filter(
                (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            ),
            li.l_orderkey == o.o_orderkey,
        )
        # customer scales with sf -> AQE decides; nation/region are fixed-size
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(r.r_name.alias("region_name"), n.n_name.alias("nation_name"))
        .agg(F.count("*").alias("n_lines"), xsum(revenue, "revenue"))
    )


@query(
    "q15_anti_join",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    tags=("join", "anti"),
    doc="Left anti join — customers with no orders (NOT EXISTS).",
)
def q15_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "q16_semi_join",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier s
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_suppkey = s.s_suppkey
        AND l.l_shipdate >= TIMESTAMP '2001-01-01 00:00:00'
    )
    """,
    tags=("join", "semi"),
    doc="Left semi join — suppliers with recent shipments (EXISTS).",
)
def q16_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = table(spark, sf_dir, "supplier")
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("2001-01-01 00:00:00").cast("timestamp")
    )
    return s.join(li, s.s_suppkey == li.l_suppkey, "left_semi").select("s_suppkey", "s_name")


# ---------------------------------------------------------------------------
# Set operations (§2.6 — absent in reference, free in Spark)
# ---------------------------------------------------------------------------


@query(
    "q17_setops",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    """,
    tags=("setop",),
    doc="INTERSECT of two filtered projections (§2.6).",
)
def q17_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")

    def custkeys(year_lo: str, year_hi: str) -> DataFrame:
        return o.filter(
            (F.col("o_orderdate") >= F.lit(f"{year_lo} 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(f"{year_hi} 00:00:00").cast("timestamp"))
        ).select("o_custkey")

    return custkeys("1995-01-01", "1996-01-01").intersect(custkeys("1996-01-01", "1997-01-01"))


@query(
    "q18_except",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    """,
    tags=("setop",),
    doc="EXCEPT (distinct) of two filtered projections (§2.6).",
)
def q18_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")

    def custkeys(year_lo: str, year_hi: str) -> DataFrame:
        return o.filter(
            (F.col("o_orderdate") >= F.lit(f"{year_lo} 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(f"{year_hi} 00:00:00").cast("timestamp"))
        ).select("o_custkey")

    # subtract() is SQL EXCEPT (distinct) — removes ALL matching rows;
    # exceptAll() would keep multiplicity and diverge from the oracle.
    return custkeys("1995-01-01", "1996-01-01").subtract(custkeys("1996-01-01", "1997-01-01"))


# ---------------------------------------------------------------------------
# Window functions (§2.8 — claimed by reference README.md:270, never implemented)
# ---------------------------------------------------------------------------


@query(
    "q19_window_rank",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice, rn
    FROM (
      SELECT p_brand, p_partkey, p_retailprice,
             ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey ASC) AS rn
      FROM part
    ) t
    WHERE rn <= 3
    """,
    tags=("window", "W"),
    doc="Per-group top-k via ranking window (§2.8 — the README-claimed-but-absent windowing).",
)
def q19_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        p.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", "p_retailprice", "rn")
    )


@query(
    "q20_window_running",
    oracle="""
    SELECT
      o_custkey, o_orderkey, o_totalprice,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(25,8)))
           OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
      LAG(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) AS prev_orderkey
    FROM orders
    WHERE o_custkey <= 100
    """,
    tags=("window", "W"),
    doc="Running decimal-exact sum + lag over a deterministic frame (§2.8 analytic windows).",
)
def q20_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 100)
    w = Window.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.sum(F.col("o_totalprice").cast(MONEY))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
        .alias("running_spend"),
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
    )


# ---------------------------------------------------------------------------
# Grouping sets / pivot ([EXT] §2.4 note: free via Spark SQL)
# ---------------------------------------------------------------------------


@query(
    "q21_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(25,8))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("agg", "rollup"),
    doc="ROLLUP grouping sets with subtotal rows (§2.4 [EXT]).",
)
def q21_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # widen: rollup expands every row x3 grouping sets before the map-side
    # decimal sums — heavy fused map work (r15 A/B: 1.27 -> 1.15 s).
    li = table(spark, sf_dir, "lineitem", widen=True)
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), xsum("l_quantity", "sum_qty")
    )


@query(
    "q22_pivot",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(25,8))) FILTER (WHERE l_linestatus = 'O') AS DOUBLE) AS qty_o,
           CAST(SUM(CAST(l_quantity AS DECIMAL(25,8))) FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS qty_f
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "pivot"),
    doc="Pivot on linestatus (§2.4 [EXT]; conditional-aggregation oracle).",
)
def q22_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(F.col("l_quantity").cast(MONEY)).cast("double"))
        .select(
            "l_returnflag",
            F.col("O").alias("qty_o"),
            F.col("F").alias("qty_f"),
        )
    )


# ---------------------------------------------------------------------------
# Scalar functions (F1-F7) and JSON ([EXT])
# ---------------------------------------------------------------------------


@query(
    "q23_sha2_anonymize",
    oracle="""
    SELECT c_custkey, sha256(c_name) AS name_hash
    FROM customer
    WHERE c_custkey <= 500
    """,
    tags=("function", "F1", "anonymize"),
    doc="PII-style sha2-256 column anonymization (F1; runnerfile.py:271).",
)
def q23_sha2_anonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return c.filter(F.col("c_custkey") <= 500).select(
        "c_custkey", F.sha2(F.col("c_name").cast("string"), 256).alias("name_hash")
    )


@query(
    "q24_json_extract",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k, COUNT(*) AS n
    FROM events
    GROUP BY 1
    """,
    tags=("function", "json", "EXT"),
    doc="JSON field extraction + group ([EXT] §2.7: from_json/get_json_object for events.props).",
)
def q24_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.select(F.get_json_object("props", "$.k").cast("int").alias("k"))
        .groupBy("k")
        .agg(F.count("*").alias("n"))
    )


@query(
    "q25_hourly_agg",
    oracle="""
    SELECT
      date_trunc('hour', ts) AS hour,
      event_type,
      COUNT(*) AS n,
      CAST(SUM(CAST(FLOOR(value * 10000) AS BIGINT)) AS DOUBLE) / 10000.0 AS total_value
    FROM events
    WHERE ts < TIMESTAMP '2024-01-03 00:00:00'
    GROUP BY 1, 2
    """,
    tags=("agg", "time", "streaming-batch"),
    doc="Tumbling-window (hourly) aggregation in batch — the batch shadow of the Structured "
    "Streaming path (§2.9 [EXT]); same plan shape as groupBy(F.window(ts,'1 hour')).",
)
def q25_hourly_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("ts") < F.lit("2024-01-03 00:00:00").cast("timestamp"))
        .groupBy(F.date_trunc("hour", "ts").alias("hour"), F.col("event_type"))
        .agg(
            F.count("*").alias("n"),
            # value is a full-precision double: quantize to an exact integer
            # grid before summing so the aggregate is order-independent and
            # engine-reproducible (see functions module docstring).
            (F.sum(F.floor(F.col("value") * 10000).cast("long")).cast("double") / 10000.0).alias(
                "total_value"
            ),
        )
    )


@query(
    "q26_sessionize",
    oracle="""
    WITH ev AS (
      -- normalize events.ts to plain micros TIMESTAMP whatever unit the
      -- parquet writer used (matches catalog.table()'s normalization)
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
      FROM events
      WHERE user_id <= 50
    ),
    seq AS (
      SELECT user_id, event_id, ts,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_ts
      FROM ev
    ),
    flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN prev_ts IS NULL OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM seq
    ),
    sessions AS (
      SELECT user_id, event_id, ts,
             CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id, COUNT(*) AS n_events, MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM sessions
    GROUP BY user_id, session_id
    """,
    tags=("window", "session", "EXT"),
    doc="Batch sessionization: lag-gap > 30 min starts a new session; running-sum assigns "
    "session ids (§2.9 [EXT] session-window analog; guide 'Sessionization' pattern).",
)
def q26_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").filter(F.col("user_id") <= 50)
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    flagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.lag("ts").over(w).isNull() | (gap > 1800000000), 1)
        .otherwise(0)
        .alias("new_session"),
    )
    sessions = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@query(
    "q27_incremental_watermark",
    oracle="""
    SELECT COUNT(*) AS n_new, MIN(o_orderkey) AS min_new_key, MAX(o_orderkey) AS max_new_key
    FROM orders
    WHERE o_orderkey > (
      SELECT MAX(o_orderkey) FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    )
    """,
    tags=("ingest", "P7", "A5"),
    doc="Incremental watermark ingest (P7/A5; ingest_data.py:56-77): probe max(id) over the "
    "'already ingested' set, then scan only rows above it. At scale the probe reads parquet "
    "max statistics, and the filter pushes down to the source.",
)
def q27_incremental_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    watermark = o.filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    ).agg(F.max("o_orderkey").alias("wm"))
    return (
        o.join(F.broadcast(watermark))
        .filter(F.col("o_orderkey") > F.col("wm"))
        .agg(
            F.count("*").alias("n_new"),
            F.min("o_orderkey").alias("min_new_key"),
            F.max("o_orderkey").alias("max_new_key"),
        )
    )


@query(
    "q28_asof_join",
    oracle="""
    WITH u AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, 1 AS kind,
             CAST(NULL AS DOUBLE) AS pvalue, CAST(NULL AS TIMESTAMP) AS pts
      FROM events WHERE event_type = 'click' AND user_id <= 30
      UNION ALL
      SELECT user_id, CAST(ts AS TIMESTAMP), event_id, 0, value, CAST(ts AS TIMESTAMP)
      FROM events WHERE event_type = 'purchase' AND user_id <= 30
    ),
    w AS (
      SELECT *,
        last_value(pvalue IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY ts ASC, kind ASC, event_id ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_value,
        last_value(pts IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY ts ASC, kind ASC, event_id ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_ts
      FROM u
    )
    SELECT user_id, event_id AS click_id, ts AS click_ts,
           last_purchase_ts, last_purchase_value
    FROM w WHERE kind = 1
    """,
    tags=("join", "asof", "EXT"),
    doc="As-of join (an operator Spark lacks natively): for each click, the most recent "
    "purchase by the same user at ts <= click.ts. Implemented with the union-and-window "
    "pattern — tag both streams, one shuffle on user_id, last(ignorenulls) carries the "
    "latest purchase forward. Scales linearly (no range-explosion join); ties break "
    "deterministically (purchase-before-click at equal ts, then max event_id).",
)
def q28_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").filter(F.col("user_id") <= 30)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(1).alias("kind"),
        F.lit(None).cast("double").alias("pvalue"),
        F.lit(None).cast("timestamp").alias("pts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(0).alias("kind"),
        F.col("value").alias("pvalue"),
        F.col("ts").alias("pts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("kind"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = clicks.unionByName(purchases)
    carried = u.select(
        "user_id",
        "ts",
        "event_id",
        "kind",
        F.last("pvalue", ignorenulls=True).over(w).alias("last_purchase_value"),
        F.last("pts", ignorenulls=True).over(w).alias("last_purchase_ts"),
    )
    return carried.filter(F.col("kind") == 1).select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
        "last_purchase_ts",
        "last_purchase_value",
    )


_VALUE_BANDS = [
    ("p00_tiny", 0.0, 25.0),
    ("p01_small", 25.0, 75.0),
    ("p02_mid", 75.0, 150.0),
    ("p03_large", 150.0, 300.0),
    ("p04_huge", 300.0, 1e9),
]


@query(
    "q29_range_join",
    oracle="""
    WITH bands(band, lo, hi) AS (VALUES
      ('p00_tiny', 0.0, 25.0),
      ('p01_small', 25.0, 75.0),
      ('p02_mid', 75.0, 150.0),
      ('p03_large', 150.0, 300.0),
      ('p04_huge', 300.0, 1e9)
    )
    SELECT b.band, COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR(e.value * 10000) AS BIGINT)) AS DOUBLE) / 10000.0 AS total_value
    FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
    GROUP BY b.band
    """,
    tags=("join", "range", "EXT"),
    doc="Range (interval) join: events banded by non-uniform value intervals. The band table "
    "is broadcast, so the inequality join is a broadcast nested-loop over 5 rows per event — "
    "no shuffle, no cartesian blow-up; at 100 TB this is the only join shape that works for "
    "interval lookup tables.",
)
def q29_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    bands = local_relation(spark, _VALUE_BANDS, "band string, lo double, hi double")
    joined = ev.join(
        F.broadcast(bands), (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi"))
    )
    return joined.groupBy("band").agg(
        F.count("*").alias("n"),
        (F.sum(F.floor(F.col("value") * 10000).cast("long")).cast("double") / 10000.0).alias(
            "total_value"
        ),
    )


@query(
    "q30_cube",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n,
           {sql_xsum("l_quantity", "sum_qty")}
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("agg", "cube", "grouping-sets"),
    doc="CUBE grouping sets (SURVEY §2.4 [EXT] — free via Spark SQL): all 4 aggregation "
    "levels in one pass. Spark expands the cube map-side, so it still costs a single "
    "shuffle; the NULL-keyed subtotal rows follow SQL semantics on both engines.",
)
def q30_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    # widen: cube expands every row x4 grouping sets before the map-side
    # decimal sums (r15 A/B: 1.78 -> 0.89 s on one row-group-starved task).
    li = table(spark, sf_dir, "lineitem", widen=True)
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), xsum("l_quantity", "sum_qty")
    )


@query(
    "q32_local_supplier_revenue",
    oracle="""
    SELECT n.n_name AS nation_name,
           CAST(SUM(CAST((l.l_extendedprice * (1 - l.l_discount)) AS DECIMAL(25,8))) AS DOUBLE)
             AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND s.s_nationkey = c.c_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY 1
    """,
    tags=("join", "agg", "tpch-q5-shape"),
    doc="TPC-H Q5 semantics: revenue from lineitems where the supplier and the ordering "
    "customer share a nation — a correlated two-key dim join (l_suppkey AND nation "
    "equality), the classic case where join ORDER matters. Supplier/customer/nation "
    "broadcast; the only shuffle is the lineitem⋈orders fact join.",
)
def q32_local_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(
            o.filter(
                (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
            ),
            li.l_orderkey == o.o_orderkey,
        )
        # customer/supplier scale with sf -> AQE decides; nation is fixed-size
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(n.n_name.alias("nation_name"))
        .agg(xsum(revenue, "revenue"))
    )


@query(
    "q31_median",
    oracle="""
    SELECT l_linestatus,
           quantile_cont(l_quantity, 0.5) AS median_qty,
           quantile_cont(l_quantity, 0.9) AS p90_qty
    FROM lineitem
    GROUP BY l_linestatus
    """,
    tags=("agg", "percentile"),
    doc="Exact interpolated percentiles per group (F.percentile ~ SQL quantile_cont). "
    "l_quantity is integer-valued so interpolation midpoints are exact in double on any "
    "engine. The 100 TB variant swaps in approx_percentile (t-digest) — same plan shape, "
    "bounded memory.",
)
def q31_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.percentile("l_quantity", 0.5).alias("median_qty"),
        F.percentile("l_quantity", 0.9).alias("p90_qty"),
    )


@query(
    "q33_full_outer",
    oracle="""
    SELECT
      COALESCE(c.c_custkey, o.o_custkey) AS cust_id,
      c.c_name AS cust_name,
      o.n_orders
    FROM customer c
    FULL OUTER JOIN (
      SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey
    ) o ON c.c_custkey = o.o_custkey
    """,
    tags=("join", "outer"),
    doc="Full-outer join (free with Spark SQL; absent from the reference's left-join-only "
    "surface): customers with no orders AND order keys with no customer row both survive. "
    "COALESCE merges the key columns, SQL null semantics on both engines.",
)
def q33_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
    )
    return c.join(o, c.c_custkey == o.o_custkey, "full_outer").select(
        F.coalesce(c.c_custkey, o.o_custkey).alias("cust_id"),
        F.col("c_name").alias("cust_name"),
        "n_orders",
    )


@query(
    "q34_scalar_suite",
    oracle="""
    SELECT
      o_orderkey,
      upper(o_orderpriority) AS prio_upper,
      substr(o_orderpriority, 1, 3) AS prio_prefix,
      length(o_orderpriority) AS prio_len,
      regexp_extract(o_orderpriority, '([0-9]+)', 1) AS prio_num,
      CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
      year(o_orderdate) AS order_year,
      CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor,
      CASE WHEN o_totalprice >= 100000 THEN 'big' ELSE 'small' END AS size_class,
      COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_decoded
    FROM orders
    WHERE o_orderkey <= 5000
    """,
    tags=("scalar", "functions", "F1-F7"),
    doc="Scalar-function breadth in one projection (§2.7 + [EXT]): string case/substr/length, "
    "regex extraction, date truncation and part extraction, numeric floor, CASE, "
    "COALESCE/NULLIF — all JVM-side column expressions inside one codegen stage, "
    "no UDF anywhere.",
)
def q34_scalar_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 5000)
    return o.select(
        "o_orderkey",
        F.upper("o_orderpriority").alias("prio_upper"),
        F.substring("o_orderpriority", 1, 3).alias("prio_prefix"),
        F.length("o_orderpriority").cast("long").alias("prio_len"),
        F.regexp_extract("o_orderpriority", r"([0-9]+)", 1).alias("prio_num"),
        F.date_trunc("month", "o_orderdate").alias("order_month"),
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.floor("o_totalprice").alias("price_floor"),
        F.when(F.col("o_totalprice") >= 100000, "big").otherwise("small").alias("size_class"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("OPEN")).alias("status_decoded"),
    )


@query(
    "q35_approx_stats",
    oracle="""
    SELECT l_linestatus,
           COUNT(*) AS n,
           TRUE AS suppliers_within_tol,
           TRUE AS median_within_tol
    FROM lineitem
    GROUP BY l_linestatus
    """,
    tags=("agg", "approx", "scale-path", "tolerance-oracle"),
    doc="The 100 TB statistics path: approx_count_distinct (HyperLogLog++, bounded memory "
    "vs the full shuffle of exact countDistinct) and approx_percentile (t-digest) per "
    "group. Sketch internals differ across engines, so the hash-checked contract is the "
    "TOLERANCE: the query computes approx and exact side by side and emits "
    "|approx-exact|/exact bounds as booleans; the oracle asserts they all hold (TRUE).",
)
def q35_approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # widen: the map side updates FOUR sketch/buffer aggregates per row
    # (HLL++, t-digest, exact percentile buffer, distinct expand) — the
    # heaviest fused map work in the q-family (r15 A/B: 5.6 -> 2.3 s).
    # Values are partition-safe: HLL/percentile merges are commutative and
    # the hash-checked columns are the tolerance booleans by design.
    li = table(spark, sf_dir, "lineitem", widen=True)
    agg = li.groupBy("l_linestatus").agg(
        F.approx_count_distinct("l_suppkey").alias("acd"),
        F.countDistinct("l_suppkey").alias("ecd"),
        F.approx_percentile("l_quantity", F.lit(0.5), F.lit(10000)).alias("amed"),
        F.expr("percentile(l_quantity, 0.5)").alias("emed"),
        F.count("*").alias("n"),
    )
    return agg.select(
        "l_linestatus",
        "n",
        # HLL++ default rsd is 5%; 2x headroom keeps the gate stable
        (F.abs(F.col("acd") - F.col("ecd")) / F.col("ecd") <= 0.10).alias(
            "suppliers_within_tol"
        ),
        # approx_percentile returns an actual data value; exact percentile
        # interpolates — one quantity unit of slack covers the gap
        (F.abs(F.col("amed") - F.col("emed")) <= 1.0).alias("median_within_tol"),
    )


@query(
    "q36_seeded_sample",
    oracle="""
    SELECT COUNT(*) AS n_total,
           TRUE AS fraction_within_tol,
           TRUE AS deterministic,
           TRUE AS sample_is_subset
    FROM documents
    """,
    tags=("sample", "scale-path", "tolerance-oracle"),
    doc="Seeded corpus subsampling (training-data pipelines downsample before expensive "
    "stages): Bernoulli sample at 10% with a fixed seed — one narrow pass, no shuffle. "
    "Spark's RNG stream is not reproducible in another engine, so the hash-checked "
    "contract is the INVARIANTS: sampled fraction within statistical bounds, identical "
    "re-sample under the same seed, and sample ⊆ corpus — emitted as booleans the "
    "oracle asserts all hold (TRUE).",
)
def q36_seeded_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    s1 = d.sample(fraction=0.1, seed=42).select("doc_id")
    s2 = d.sample(fraction=0.1, seed=42).select("doc_id")
    totals = d.agg(F.count("*").alias("n_total"))
    n_sample = s1.agg(F.count("*").alias("n_sample"))
    # determinism: same seed + same input layout -> identical sample set
    n_diff = (
        s1.subtract(s2).union(s2.subtract(s1)).agg(F.count("*").alias("n_diff"))
    )
    # subset: every sampled id exists in the corpus
    n_orphan = s1.join(d, "doc_id", "left_anti").agg(F.count("*").alias("n_orphan"))
    return (
        totals.crossJoin(n_sample)
        .crossJoin(n_diff)
        .crossJoin(n_orphan)
        .select(
            "n_total",
            # fixed seed -> deterministic count; bounds are ~±4σ of
            # Binomial(n, 0.1) at the driver's sf0.01 (n=500)
            (
                (F.col("n_sample") >= F.col("n_total") * 0.03)
                & (F.col("n_sample") <= F.col("n_total") * 0.20)
            ).alias("fraction_within_tol"),
            (F.col("n_diff") == 0).alias("deterministic"),
            (F.col("n_orphan") == 0).alias("sample_is_subset"),
        )
    )


@query(
    "q37_resample_locf",
    oracle="""
    WITH ev AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
      FROM events WHERE user_id <= 10
    ),
    bounds AS (
      SELECT user_id,
             date_trunc('hour', MIN(ts)) AS t0,
             date_trunc('hour', MAX(ts)) AS t1
      FROM ev GROUP BY user_id
    ),
    spine AS (
      SELECT b.user_id, CAST(g.h AS TIMESTAMP) AS hour
      FROM bounds b, UNNEST(generate_series(b.t0, b.t1, INTERVAL 1 HOUR)) AS g(h)
    ),
    hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS hour,
             COUNT(*) AS n,
             SUM(CAST(FLOOR(value * 10000) AS BIGINT)) AS v_q
      FROM ev GROUP BY 1, 2
    ),
    joined AS (
      SELECT s.user_id, s.hour,
             COALESCE(h.n, 0) AS n_events,
             h.v_q
      FROM spine s LEFT JOIN hourly h ON s.user_id = h.user_id AND s.hour = h.hour
    )
    SELECT user_id, hour, n_events,
           CAST(last_value(v_q IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY hour ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 10000.0
             AS locf_hourly_value
    FROM joined
    """,
    tags=("timeseries", "resample", "EXT"),
    doc="Time-series resampling with gap fill (the hypertable-rollup analog): per-user hourly "
    "spine via sequence+explode, left join of hourly aggregates, last-observation-carried-"
    "forward for empty hours. Spine generation is a narrow fan-out; the only shuffle is the "
    "hourly aggregate + the window on (user, hour) — both on the same key, so AQE reuses "
    "the partitioning.",
)
def q37_resample_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").filter(F.col("user_id") <= 10)
    bounds = ev.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("t0"),
        F.date_trunc("hour", F.max("ts")).alias("t1"),
    )
    spine = bounds.select(
        "user_id",
        F.explode(F.sequence("t0", "t1", F.expr("INTERVAL 1 HOUR"))).alias("hour"),
    )
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("hour")
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.floor(F.col("value") * 10000).cast("long")).alias("v_q"),
    )
    joined = spine.join(hourly, ["user_id", "hour"], "left").select(
        "user_id",
        "hour",
        F.coalesce("n", F.lit(0)).alias("n_events"),
        "v_q",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("hour"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        "hour",
        "n_events",
        (F.last("v_q", ignorenulls=True).over(w).cast("double") / 10000.0).alias(
            "locf_hourly_value"
        ),
    )


@query(
    "q38_top1_per_group",
    oracle="""
    SELECT nation_key, total_spend, cust_id
    FROM (
      SELECT c.c_nationkey AS nation_key,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(25,8))) AS DOUBLE) AS total_spend,
             c.c_custkey AS cust_id,
             ROW_NUMBER() OVER (
               PARTITION BY c.c_nationkey
               ORDER BY SUM(CAST(o.o_totalprice AS DECIMAL(25,8))) DESC, c.c_custkey DESC
             ) AS rn
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_nationkey, c.c_custkey
    ) t WHERE rn = 1
    """,
    tags=("agg", "topk", "scale-path"),
    doc="Top-1 per group WITHOUT a window: max(struct(measure, key)) aggregates map-side and "
    "needs no per-group sort — at 100 TB this replaces the rank-window top-1 (which must "
    "shuffle and sort every row) with an ordinary two-level hash aggregate. Ties break to "
    "the larger cust_id in both formulations.",
)
def q38_top1_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    spend = (
        # customer scales with sf -> no forced broadcast (AQE decides)
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey", "c_custkey")
        .agg(xsum("o_totalprice", "total_spend"))
    )
    top = spend.groupBy(F.col("c_nationkey").alias("nation_key")).agg(
        F.max(F.struct("total_spend", "c_custkey")).alias("t")
    )
    return top.select(
        "nation_key",
        F.col("t.total_spend").alias("total_spend"),
        F.col("t.c_custkey").alias("cust_id"),
    )


@query(
    "q39_exists_subquery",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49
    )
    AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    """,
    tags=("sql-api", "subquery", "semi-join"),
    doc="Correlated EXISTS through the engine's SQL surface (register_views + spark.sql): "
    "Catalyst rewrites it to a left-semi join, so the plan is identical to the DataFrame "
    "q16 path — one API, same physical strategy.",
)
def q39_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.catalog import register_views

    register_views(spark, sf_dir, ("orders", "lineitem"))
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_totalprice
        FROM orders o
        WHERE EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49
        )
        AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        """
    )


@query(
    "q40_cte_scalar_subquery",
    oracle="""
    WITH seg AS (
      SELECT c_mktsegment,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(25,8))) AS DOUBLE) AS seg_bal,
             COUNT(*) AS n_custs
      FROM customer GROUP BY c_mktsegment
    )
    SELECT c_mktsegment, seg_bal, n_custs
    FROM seg
    WHERE seg_bal > (SELECT CAST(AVG(seg_bal) AS DOUBLE) FROM seg)
    """,
    tags=("sql-api", "cte", "scalar-subquery"),
    doc="CTE + scalar subquery via spark.sql: segments whose decimal-exact balance total "
    "beats the cross-segment average. The scalar subquery executes once and broadcasts — "
    "no per-row re-evaluation.",
)
def q40_cte_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.catalog import register_views

    register_views(spark, sf_dir, ("customer",))
    return spark.sql(
        """
        WITH seg AS (
          SELECT c_mktsegment,
                 CAST(SUM(CAST(c_acctbal AS DECIMAL(25,8))) AS DOUBLE) AS seg_bal,
                 COUNT(*) AS n_custs
          FROM customer GROUP BY c_mktsegment
        )
        SELECT c_mktsegment, seg_bal, n_custs
        FROM seg
        WHERE seg_bal > (SELECT CAST(AVG(seg_bal) AS DOUBLE) FROM seg)
        """
    )


@query(
    "q41_group_linefit",
    oracle="""
    WITH s AS (
      SELECT l_linestatus,
             CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS HUGEINT) AS sx,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS HUGEINT) AS sy,
             CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                  AS HUGEINT) AS sxy,
             CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS HUGEINT) AS sxx
      FROM lineitem
      GROUP BY l_linestatus
    )
    SELECT l_linestatus, CAST(n AS BIGINT) AS n,
           CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE) / 100.0
             AS slope,
           (CAST(sy AS DOUBLE) / 100.0
              - (CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE) / 100.0)
                * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE) AS intercept
    FROM s
    """,
    tags=("agg", "statistics", "EXT"),
    doc="Per-group OLS line fit (price ~ quantity) as ONE aggregation pass. Built-in "
    "covar_pop/var_pop float summation order differs across engines, and even decimal "
    "moment sums lose cross-engine bit-parity in the decimal->double cast once the "
    "cancellation-prone products exceed 2^53 — so the moments are EXACT integers on a "
    "cents grid, the products run in wide integer types (Spark decimal(38,0), oracle "
    "HUGEINT), and only the final integer numerator/denominator converts to double. "
    "Pattern generalizes to corr/variance/std at 100 TB (one pass, map-side partials).",
)
def q41_group_linefit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    xi = F.col("l_quantity").cast("long")
    yi = F.round(F.col("l_extendedprice") * 100).cast("long")  # exact cents
    s = li.groupBy("l_linestatus").agg(
        F.count("*").alias("n"),
        F.sum(xi).alias("sx"),
        F.sum(yi).alias("sy"),
        F.sum(xi * yi).alias("sxy"),
        F.sum(xi * xi).alias("sxx"),
    )

    def d(c: str):
        return F.col(c).cast("decimal(38,0)")

    num = (d("n") * d("sxy") - d("sx") * d("sy")).cast("double")
    den = (d("n") * d("sxx") - d("sx") * d("sx")).cast("double")
    slope = num / den / 100.0
    intercept = (
        F.col("sy").cast("double") / 100.0 - slope * F.col("sx").cast("double")
    ) / F.col("n").cast("double")
    return s.select("l_linestatus", "n", slope.alias("slope"), intercept.alias("intercept"))


@query(
    "q42_group_corr",
    oracle="""
    WITH s AS (
      SELECT l_linestatus,
             CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS HUGEINT) AS sx,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS HUGEINT) AS sy,
             CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                  AS HUGEINT) AS sxy,
             CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS HUGEINT) AS sxx,
             SUM(CAST(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                      * CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS HUGEINT)) AS syy
      FROM lineitem
      GROUP BY l_linestatus
    )
    SELECT l_linestatus, CAST(n AS BIGINT) AS n,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
             AS corr_qty_price
    FROM s
    """,
    tags=("agg", "statistics", "EXT"),
    doc="Exact Pearson correlation per group from integer moments (same wide-int technique "
    "as q41; y-squared sums exceed BIGINT at scale so they accumulate directly in the wide "
    "type). sqrt/division run on identical integers -> identical doubles on any engine.",
)
def q42_group_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    xi = F.col("l_quantity").cast("long")
    yi = F.round(F.col("l_extendedprice") * 100).cast("long")
    s = li.groupBy("l_linestatus").agg(
        F.count("*").alias("n"),
        F.sum(xi).alias("sx"),
        F.sum(yi).alias("sy"),
        F.sum(xi * yi).alias("sxy"),
        F.sum(xi * xi).alias("sxx"),
        F.sum((yi * yi).cast("decimal(38,0)")).alias("syy"),
    )

    def d(c: str):
        return F.col(c).cast("decimal(38,0)")

    num = (d("n") * d("sxy") - d("sx") * d("sy")).cast("double")
    denx = (d("n") * d("sxx") - d("sx") * d("sx")).cast("double")
    deny = (d("n") * F.col("syy") - d("sy") * d("sy")).cast("double")
    return s.select(
        "l_linestatus",
        "n",
        (num / (F.sqrt(denx) * F.sqrt(deny))).alias("corr_qty_price"),
    )


@query(
    "q43_funnel",
    oracle="""
    WITH su AS (
      SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS t_signup
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    cl AS (
      SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t_click
      FROM events e JOIN su ON e.user_id = su.user_id
      WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) >= su.t_signup
      GROUP BY e.user_id
    ),
    pu AS (
      SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t_purchase
      FROM events e JOIN cl ON e.user_id = cl.user_id
      WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) >= cl.t_click
      GROUP BY e.user_id
    )
    SELECT
      (SELECT COUNT(*) FROM su) AS n_signup,
      (SELECT COUNT(*) FROM cl) AS n_signup_click,
      (SELECT COUNT(*) FROM pu) AS n_signup_click_purchase
    """,
    tags=("analytics", "funnel", "EXT"),
    doc="Ordered funnel (signup -> click-after-signup -> purchase-after-click): each stage "
    "is a min-timestamp aggregate joined to the previous stage's cohort — three hash aggs "
    "+ two equi-joins on user_id, all co-partitioned on the same key, so AQE reuses one "
    "shuffle partitioning across the whole funnel.",
)
def q43_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    su = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_signup"))
    )
    cl = (
        ev.filter(F.col("event_type") == "click")
        .join(su, "user_id")
        .filter(F.col("ts") >= F.col("t_signup"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    pu = (
        ev.filter(F.col("event_type") == "purchase")
        .join(cl, "user_id")
        .filter(F.col("ts") >= F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        su.agg(F.count("*").alias("n_signup"))
        .crossJoin(cl.agg(F.count("*").alias("n_signup_click")))
        .crossJoin(pu.agg(F.count("*").alias("n_signup_click_purchase")))
    )


@query(
    "q44_window_suite",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           NTILE(4) OVER w AS spend_quartile,
           CAST(PERCENT_RANK() OVER w AS DOUBLE) AS pct_rank,
           LEAD(o_orderkey, 1) OVER w AS next_orderkey,
           LAG(o_orderkey, 1) OVER w AS prev_orderkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_orderkey
    FROM orders
    WHERE o_custkey <= 200
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice ASC, o_orderkey ASC)
    """,
    tags=("window", "W", "EXT"),
    doc="Window-function breadth in one pass: ntile / percent_rank / lead / lag / "
    "first_value over a single window spec — Spark evaluates all five in ONE Window "
    "operator (one shuffle + sort on the partition key), not five.",
)
def q44_window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 200)
    w = Window.partitionBy("o_custkey").orderBy(F.asc("o_totalprice"), F.asc("o_orderkey"))
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.ntile(4).over(w).alias("spend_quartile"),
        F.percent_rank().over(w).cast("double").alias("pct_rank"),
        F.lead("o_orderkey", 1).over(w).alias("next_orderkey"),
        F.lag("o_orderkey", 1).over(w).alias("prev_orderkey"),
        F.first("o_orderkey").over(w).alias("first_orderkey"),
    )


@query(
    "q45_date_arithmetic",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS order_date,
           date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS days_to_eoy,
           CAST(CAST(o_orderdate + INTERVAL 90 DAY AS DATE) AS TIMESTAMP) AS due_date,
           CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP) AS order_quarter,
           dayofweek(CAST(o_orderdate AS DATE)) + 1 AS dow,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end
    FROM orders
    WHERE o_orderkey <= 2000
    """,
    tags=("scalar", "temporal", "EXT"),
    doc="Temporal-function breadth: day differences, interval arithmetic, quarter "
    "truncation, day-of-week, end-of-month — all JVM column expressions. Cross-engine "
    "notes baked into the oracle: DuckDB spells datediff as date_diff('day', ...), its "
    "dayofweek is 0-based (Spark's is 1-based, Sunday first), and DATE results are "
    "surfaced as midnight timestamps so both engines hash the same canonical value.",
)
def q45_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        d.cast("timestamp").alias("order_date"),
        F.datediff(F.lit("1998-12-31").cast("date"), d).cast("long").alias("days_to_eoy"),
        F.to_date(F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .cast("timestamp")
        .alias("due_date"),
        F.date_trunc("quarter", "o_orderdate").alias("order_quarter"),
        F.dayofweek(d).cast("long").alias("dow"),
        F.last_day(d).cast("timestamp").alias("month_end"),
    )


@query(
    "q46_conditional_agg",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n,
           COUNT(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,8)))
                FILTER (WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00') AS DOUBLE)
             AS recent_revenue
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("agg", "conditional"),
    doc="Conditional aggregation (SQL FILTER clause ~ Spark count_if / sum(when)): several "
    "differently-filtered measures in ONE pass over the data instead of one scan per "
    "predicate — the pattern that collapses dashboard metric fans at scale.",
)
def q46_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    recent = F.when(
        F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"),
        F.col("o_totalprice"),
    )
    return o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.count_if(F.col("o_totalprice") > 200000).alias("n_big"),
        F.count_if(F.col("o_orderstatus") == "F").alias("n_finished"),
        F.sum(recent.cast(MONEY)).cast("double").alias("recent_revenue"),
    )


@query(
    "q47_sorted_string_agg",
    oracle="""
    SELECT r.r_name AS region_name,
           string_agg(n.n_name, ',' ORDER BY n.n_name ASC) AS nations_csv,
           COUNT(*) AS n_nations
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    tags=("agg", "string-agg"),
    doc="Deterministic string aggregation: collect_list order is partition-dependent in "
    "Spark, so the engine's convention is array_sort before array_join — which is also "
    "what makes the result hash-comparable to SQL string_agg(... ORDER BY).",
)
def q47_sorted_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations_csv"),
            F.count("*").alias("n_nations"),
        )
    )


@query(
    "q48_merge_upsert",
    oracle="""
    WITH updates AS (
      SELECT o_orderkey + CASE WHEN o_orderkey % 2 = 0 THEN 0 ELSE 10000000 END AS o_orderkey,
             o_custkey, o_orderstatus,
             o_totalprice + 10.0 AS o_totalprice,
             o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey <= 1000
    ),
    merged AS (
      SELECT
        CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_orderkey ELSE e.o_orderkey END AS o_orderkey,
        CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_totalprice ELSE e.o_totalprice END AS o_totalprice,
        CASE WHEN u.o_orderkey IS NOT NULL THEN 1 ELSE 0 END AS from_update
      FROM orders e FULL OUTER JOIN updates u ON e.o_orderkey = u.o_orderkey
    )
    SELECT o_orderkey, o_totalprice, from_update
    FROM merged
    WHERE o_orderkey <= 1200 OR o_orderkey >= 10000000
    """,
    tags=("merge", "upsert", "ingest"),
    doc="Key-based MERGE (operators/upsert.py): the incremental delta updates same-key rows "
    "and appends new keys — the corrected semantics for the reference's delta-query-then-"
    "overwrite contradiction (ingest_data.py:77 vs :115). One full-outer join on the key; "
    "broadcast when the delta is small (the common incremental case).",
)
def q48_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.upsert import merge_upsert

    o = table(spark, sf_dir, "orders")
    updates = o.filter(F.col("o_orderkey") <= 1000).select(
        (
            F.col("o_orderkey")
            + F.when(F.col("o_orderkey") % 2 == 0, 0).otherwise(10_000_000)
        ).alias("o_orderkey"),
        "o_custkey",
        "o_orderstatus",
        (F.col("o_totalprice") + 10.0).alias("o_totalprice"),
        "o_orderdate",
        "o_orderpriority",
    )
    update_keys = updates.select(F.col("o_orderkey").alias("k"))
    merged = merge_upsert(o, updates, "o_orderkey")
    return (
        merged.join(
            F.broadcast(update_keys), merged.o_orderkey == update_keys.k, "left"
        )
        .select(
            "o_orderkey",
            "o_totalprice",
            F.when(F.col("k").isNotNull(), 1).otherwise(0).alias("from_update"),
        )
        .filter((F.col("o_orderkey") <= 1200) | (F.col("o_orderkey") >= 10_000_000))
    )


@query(
    "q49_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS gid,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,8))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), (o_orderpriority), ())
    """,
    tags=("agg", "grouping-sets", "sql-api", "EXT"),
    doc="Explicit GROUPING SETS (the general form of q21 ROLLUP / q30 CUBE; §2.4 [EXT]). "
    "The grouping indicator is computed as grouping(a)*2+grouping(b) in BOTH engines "
    "rather than relying on grouping_id()/GROUPING() bit-order conventions, which keeps "
    "the value portable. Catalyst expands the sets via a single Expand node feeding one "
    "hash aggregate — one shuffle regardless of how many sets, which is the 100 TB plan.",
)
def q49_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.catalog import register_views

    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS gid,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(25,8))) AS DOUBLE) AS total_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "q50_map_functions",
    oracle="""
    SELECT event_id,
           CAST(len(json_keys(props)) AS INT) AS n_keys,
           array_to_string(list_sort(json_keys(props)), ',') AS key_list,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_val
    FROM events
    WHERE event_id <= 2000
    """,
    tags=("function", "map", "json", "EXT"),
    doc="Map-typed column surface (§2.7 [EXT]): events.props parsed with from_json into "
    "map<string,int>, then map_keys / size / element_at — the engine's pattern for "
    "semi-structured props at scale (parse once, operate JVM-side; no per-row Python). "
    "DuckDB oracle reads the same fields through its JSON functions.",
)
def q50_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").filter(F.col("event_id") <= 2000)
    m = F.from_json("props", "map<string,int>")
    return ev.select(
        "event_id",
        F.size(m).alias("n_keys"),
        F.array_join(F.sort_array(F.map_keys(m)), ",").alias("key_list"),
        # try_element_at: ANSI element_at THROWS on a missing map key, but the
        # oracle's json_extract_string yields NULL — match the NULL semantics
        F.try_element_at(m, F.lit("k")).alias("k_val"),
    )


@query(
    "q51_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           COUNT(*) OVER w AS n_within_1k,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,8))) OVER w AS DOUBLE) AS sum_within_1k
    FROM orders
    WHERE o_custkey <= 300
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice
                 RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "range-frame", "EXT"),
    doc="RANGE window frame with a numeric offset (§2.8 [EXT]): per customer, how many "
    "orders (and their total) fall within $1000 below the current order's price. "
    "Complements q20's ROWS frames — RANGE bounds are value-based and include peers. "
    "Frame boundaries are double arithmetic (current - 1000), identical IEEE results in "
    "both engines; the frame SUM goes through the DECIMAL(25,8) parity convention.",
)
def q51_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 300)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_totalprice"))
        .rangeBetween(-1000, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.count("*").over(w).alias("n_within_1k"),
        F.sum(F.col("o_totalprice").cast(MONEY)).over(w).cast("double").alias("sum_within_1k"),
    )


@query(
    "q52_union_by_name",
    oracle="""
    SELECT 'customer' AS src, c_custkey AS entity_id, c_acctbal AS balance,
           c_mktsegment AS segment
    FROM customer
    UNION ALL
    SELECT 'supplier' AS src, s_suppkey AS entity_id, s_acctbal AS balance,
           CAST(NULL AS VARCHAR) AS segment
    FROM supplier
    """,
    tags=("setops", "union-by-name", "schema-evolution", "EXT"),
    doc="Schema-evolution union (§2.6 [EXT]): unionByName(allowMissingColumns=True) "
    "aligns heterogeneous sources by column NAME and null-fills the gaps — the append "
    "path a medallion raw zone needs when upstream adds columns (complements the "
    "positional unions in q17). Pure narrow op: no shuffle, scans stay parallel.",
)
def q52_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").select(
        F.lit("customer").alias("src"),
        F.col("c_custkey").alias("entity_id"),
        F.col("c_acctbal").alias("balance"),
        F.col("c_mktsegment").alias("segment"),
    )
    supp = table(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("src"),
        F.col("s_suppkey").alias("entity_id"),
        F.col("s_acctbal").alias("balance"),
    )
    return cust.unionByName(supp, allowMissingColumns=True)
