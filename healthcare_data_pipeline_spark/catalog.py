"""Table catalog over a directory of parquet files.

The reference keeps its "catalog" as a Python ``dict[str, DataFrame]`` built
by globbing a raw directory (``src/runnerfile.py:453-471``) plus an INI file
mapping logical names to buckets (``utils/project.cfg``).  Here the catalog is
a thin loader over a directory of parquet tables; DataFrames are lazy so
loading every table costs only a schema read, and Catalyst prunes
columns/partitions per query.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# The driver's benchmark tables (TESTDATA.md).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table(spark: SparkSession, sf_dir: str, name: str, widen: bool = False) -> DataFrame:
    """Load one parquet table from ``sf_dir`` (lazy; schema-only until acted on).

    ``widen=True`` opts the scan into the small-scan parallelism floor
    (``_widen_small_scan``) — callers whose fused map-side work is heavy
    (multi-column decimal aggregation, per-row text processing) set it so a
    row-group-starved local scan cannot serialize that work onto one task.
    Off by default: for light map work the extra round-robin exchange costs
    more than the parallelism buys (measured: q26 +0.30s, q14 +0.59s with a
    blanket gate vs q01 −0.63s, d01 −0.70s with the opt-in).

    Timestamp-unit normalization — every table exposes plain ``timestamp``
    (TIMESTAMP_LTZ) columns regardless of how the parquet writer encoded them:

    * TIMESTAMP(NANOS) is not natively readable by Spark's vectorized reader;
      the shim reads it as raw nanos longs
      (``spark.sql.legacy.parquet.nanosAsLong``) and converts to microsecond
      timestamps with exact integer division (truncation — matching what an
      engine that truncates ns->us on cast produces).
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) infers as TIMESTAMP_NTZ, which
      many chrono expressions (``unix_micros``, windowing) reject; cast to
      ``timestamp`` — an identity conversion under the engine's fixed UTC
      session timezone (session.py).
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    nanos_cols = _nanos_columns(path)
    if nanos_cols:
        # Left set for the session: the conf must still be active when the
        # lazy plan actually executes, and it only affects TIMESTAMP(NANOS).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if not widen and not nanos_cols:
        # Tiny-dimension fast path (r16, guide §3.1): region/nation-class
        # tables are consumed almost exclusively as broadcast build sides,
        # and a broadcast relation is collected to the driver anyway — a
        # driver pyarrow read rendered as a literal LocalRelation skips the
        # per-consumer parquet-listing job and the executor scan under
        # every broadcast build.  Strictly gated (file bytes + row count +
        # simple-schema mapping, decimals/dates fall back), re-read from
        # the parquet per invocation (never cached across runs), and
        # scale-adaptive: at 100 TB these tables are still catalog-row
        # sized while every grown table falls past the gate.
        lit = _tiny_local(spark, path)
        if lit is not None:
            return lit
    df = spark.read.parquet(path)
    for c in nanos_cols:
        if isinstance(df.schema[c].dataType, T.LongType):
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` DIV 1000")))
    for field in df.schema.fields:
        if isinstance(field.dataType, T.TimestampNTZType):
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return _widen_small_scan(spark, df, path) if widen else df


# Small-scan parallelism floor (optimization guide §2.5 "input skew" / §6
# split sizing): scan parallelism is capped by parquet ROW GROUPS — a table
# written as one row group is one task no matter how many cores the session
# has, and every map-side operator fused into that scan (per-row text work,
# partial aggregation, explodes) runs single-threaded.  When the achievable
# split count is below the session's parallelism AND the table is big enough
# for the lost parallelism to matter (>= SPARK_GRAFT_WIDEN_MIN_BYTES,
# default 256 KiB compressed), insert one round-robin repartition so the map
# side runs wide.  Scale-adaptive by construction: at production sizes
# ceil(bytes / maxPartitionBytes) exceeds any core count and the gate is a
# no-op — the plan is byte-for-byte the ungated one (the generalized form of
# band_buckets' documented signature-pass gate).  Filters/projections still
# push through a Repartition to the scan (verified in plan tests), and every
# catalog result is partitioning-independent by repo convention, so only the
# physical layout changes.  Set SPARK_GRAFT_WIDEN_MIN_BYTES=0 to disable.
def _widen_small_scan(spark: SparkSession, df: DataFrame, path: str) -> DataFrame:
    try:
        min_bytes = int(os.environ.get("SPARK_GRAFT_WIDEN_MIN_BYTES", str(256 << 10)))
    except ValueError:
        min_bytes = 256 << 10
    if min_bytes <= 0:
        return df
    layout = _parquet_layout(path)
    if layout is None:
        return df
    n_row_groups, n_bytes = layout
    if n_bytes < min_bytes:
        return df
    par = spark.sparkContext.defaultParallelism
    try:
        max_split = int(spark.conf.get("spark.sql.files.maxPartitionBytes"))
    except Exception:
        max_split = 128 << 20
    est_splits = min(n_row_groups, -(-n_bytes // max(max_split, 1)))
    if est_splits >= par:
        return df
    return df.repartition(par)


#: Tiny-table literal gate: FIXED catalog dimensions only (region/nation
#: class — a few KiB at every scale factor).  Deliberately under the size of
#: every growing table at every SF: a wider gate (64 KiB) also literalized
#: supplier/part at the small test SFs, which costs ~100 KiB VALUES parses
#: per consumer build (measured d01 +0.11 s) and makes the test-SF plan
#: shape diverge from the bench/production one.  Set
#: SPARK_GRAFT_TINY_TABLE_BYTES=0 to disable.
_TINY_TABLE_BYTES_DEFAULT = 4 << 10


def _tiny_local(spark: SparkSession, path: str) -> DataFrame | None:
    """A catalog-dimension parquet as a literal LocalRelation, or None when
    any gate misses (size, row count, schema mapping, env kill switch) —
    callers fall back to the normal Spark read.  The read happens per
    invocation straight from the parquet file; values are bit-exact
    (pyarrow physical values -> the localrel typed-literal contract)."""
    try:
        gate = int(
            os.environ.get(
                "SPARK_GRAFT_TINY_TABLE_BYTES", str(_TINY_TABLE_BYTES_DEFAULT)
            )
        )
    except ValueError:
        gate = _TINY_TABLE_BYTES_DEFAULT
    if gate <= 0:
        return None
    try:
        if not os.path.isfile(path) or os.path.getsize(path) > gate:
            return None
        import pyarrow.parquet as pq

        from healthcare_data_pipeline_spark.localrel import arrow_ddl, local_relation

        tbl = pq.read_table(path)
        if tbl.num_rows > 10_000:
            return None
        ddl = arrow_ddl(tbl.schema)
        if ddl is None:
            return None
        names = tbl.column_names
        rows = [tuple(d[c] for c in names) for d in tbl.to_pylist()]
        return local_relation(spark, rows, ddl)
    except Exception:
        return None


def _parquet_layout(path: str) -> tuple[int, int] | None:
    """(num_row_groups, file_bytes) from one footer read — None when the
    path is not a plain parquet file (directory tables keep their layout)."""
    try:
        import pyarrow.parquet as pq

        meta = pq.ParquetFile(path).metadata
        return meta.num_row_groups, os.path.getsize(path)
    except Exception:
        return None


def _nanos_columns(path: str) -> list[str]:
    try:
        import pyarrow.parquet as pq

        arrow_schema = pq.read_schema(path)
        return [f.name for f in arrow_schema if str(f.type) == "timestamp[ns]"]
    except Exception:
        return []


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    out: dict[str, DataFrame] = {}
    for name in names:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            out[name] = table(spark, sf_dir, name)
    return out


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    """Register each table as a temp view (for the SQL API surface)."""
    dfs = load_tables(spark, sf_dir, names)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
