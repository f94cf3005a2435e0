"""Data-layout operators: schema evolution and sort-for-data-skipping.

Two storage-side levers that matter enormously at 100 TB and cost nothing at
write time:

* **Schema evolution** — years of accumulated parquet have columns appearing
  over time; ``read_merged`` unions them (mergeSchema), nulling the column
  where absent, so old data stays queryable after every schema change.
* **Sort-for-skipping** — parquet row-group min/max statistics only prune
  when values are clustered.  ``write_sorted`` range-partitions + sorts by
  the hot filter column so each row group covers a narrow value band; a
  predicate then skips whole row groups (and with one file per range, whole
  files).  This is the poor-man's Z-order, and for a single dominant filter
  column it is strictly better.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_merged(spark: SparkSession, path: str) -> DataFrame:
    """Read a parquet directory whose files have EVOLVED schemas — the union
    of all columns, nulls where a file predates a column."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def compact(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_bytes: int = 128 << 20,
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ceil(total_bytes / target) files (~128 MiB default — the partition sizing
    guidance the reference documents, README.md:392-394).

    Streaming sinks and incremental ingests accumulate thousands of KB-scale
    files; at 100 TB the resulting driver-side listing and per-file open costs
    dominate scan time, so periodic compaction is an operational necessity.
    Returns the output file count.  Writes to a NEW directory — swap
    atomically (rename) rather than overwriting the live path in place.
    """
    import glob
    import math
    import os

    total = sum(
        os.path.getsize(f)
        for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    )
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.option("recursiveFileLookup", "true").parquet(path)
    df.coalesce(n_files).write.mode("overwrite").parquet(out_path)
    return n_files


def write_sorted(
    df: DataFrame, path: str, sort_cols: list[str], n_files: int = 8, mode: str = "overwrite"
) -> None:
    """Cluster data by ``sort_cols`` for statistics-based skipping:
    range-partition so each output file owns a disjoint value band, then sort
    within files so every row group's min/max is tight."""
    (
        df.repartitionByRange(n_files, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .write.mode(mode)
        .parquet(path)
    )
