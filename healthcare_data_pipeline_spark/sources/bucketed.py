"""Bucketed table writes for shuffle-free co-located joins.

At 100 TB the dominant cost of a fact-to-fact join is shuffling both sides.
Writing both tables bucketed by the join key (same bucket count) lets Spark
join them with ZERO exchanges — each task reads matching buckets from both
sides.  This is the storage-layout investment that pays off when a table is
joined on the same key by many downstream queries (e.g. lineitem⋈orders on
orderkey in every report).

Bucketing requires the session catalog (``saveAsTable``); plain
``.parquet(path)`` writes cannot carry bucket metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (optionally sorted) catalog table."""
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed catalog tables; with matching bucket specs the
    plan has no Exchange on either side (verify with plans.count_exchanges)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
