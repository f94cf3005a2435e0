"""File sources/sinks: CSV and Parquet (S3-S6, S8; reference runnerfile.py:456-481,
src/common/s3.py:25-237).

The reference discovers CSVs by recursive glob and derives the table name from
the parent directory or file stem (runnerfile.py:456-464); parquet IO has a
candidate-path fallback walk (s3.py:25-103).  Both behaviors are kept, with
explicit-schema reads as the correctness path (inference is an extra eager
scan — fine locally, an anti-pattern at 100 TB).
"""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def discover_csv_tables(raw_dir: str) -> dict[str, str]:
    """Recursive *.csv discovery; table name from parent dir or file stem
    (runnerfile.py:456-464)."""
    out: dict[str, str] = {}
    root = Path(raw_dir)
    for p in sorted(root.rglob("*.csv")):
        name = p.parent.name if p.parent != root else p.stem
        out.setdefault(name, str(p))
    return out


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    infer: bool = True,
) -> DataFrame:
    """CSV scan (S3). Explicit schema when given (no inference scan)."""
    reader = spark.read.option("header", True)
    if schema is not None:
        reader = reader.schema(schema)
    elif infer:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_parquet(spark: SparkSession, path: str, *candidates: str) -> DataFrame:
    """Parquet scan with candidate-path fallback (S4; s3.py:25-103 semantics)."""
    for p in (path, *candidates):
        if os.path.exists(p):
            return spark.read.parquet(p)
    # Let Spark raise its own error for the primary path.
    return spark.read.parquet(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_cols: list[str] | None = None,
) -> None:
    """Parquet sink (S5/S6)."""
    writer = df.write.mode(mode)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)


def write_csv_report(df: DataFrame, path: str, limit: int = 10_000) -> None:
    """Bounded readable-report CSV sink (S8; runnerfile.py:536-551): cap rows,
    single file via pandas on the driver — reports are human-scale by design."""
    pdf = df.limit(limit).toPandas()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    pdf.to_csv(path, index=False)
