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


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one parquet table from ``sf_dir`` (lazy; schema-only until acted on).

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
    df = spark.read.parquet(path)
    for c in nanos_cols:
        if isinstance(df.schema[c].dataType, T.LongType):
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` DIV 1000")))
    for field in df.schema.fields:
        if isinstance(field.dataType, T.TimestampNTZType):
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df


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
