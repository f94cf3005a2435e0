"""Cleansing-zone operators (reference ``src/helpers/preprocessing_data.py``).

Reference semantics per table (preprocessing_data.py:76-130): read raw ->
``dropDuplicates()`` -> optional cast (``total_claims`` -> int at :124-125) ->
partitioned write to the cleansed zone.

Scale notes (SURVEY.md §4 anti-patterns deliberately not replicated):
- ``dropDuplicates()`` on all columns is a full-row shuffle; when a primary
  key is known, ``dedupe_by_key`` dedups on the key only (shuffles narrow key
  columns, not whole rows) — same output on key-unique data.
- Date stamping uses literals (no repartition); the partitioned write itself
  is the only materialization.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from healthcare_data_pipeline_spark.schemas import PARTITION_COLS


def stamp_ingestion_date(df: DataFrame, when: dt.date | None = None) -> DataFrame:
    """Append year/month/day literal partition columns (ingest_data.py:91-96)."""
    when = when or dt.date.today()
    return (
        df.withColumn("year", F.lit(when.year))
        .withColumn("month", F.lit(when.month))
        .withColumn("day", F.lit(when.day))
    )


def dedupe_rows(df: DataFrame) -> DataFrame:
    """Whole-row dedup (preprocessing_data.py:84,97,110,123 — A10)."""
    return df.dropDuplicates()


def dedupe_by_key(df: DataFrame, keys: list[str]) -> DataFrame:
    """Key-based dedup: keeps one arbitrary row per key, like the reference's
    whole-row variant on key-unique data but shuffling only the keys."""
    return df.dropDuplicates(keys)


def cast_columns(df: DataFrame, casts: dict[str, str]) -> DataFrame:
    """Apply explicit casts (preprocessing_data.py:124-125 total_claims->int)."""
    cols: list[Column] = []
    for name in df.columns:
        cols.append(F.col(name).cast(casts[name]).alias(name) if name in casts else F.col(name))
    return df.select(*cols)


# Per-table cleansing recipes mirroring preprocessing_data.py's four clean_*
# methods; extendable via config.
CLEANSE_CASTS: dict[str, dict[str, str]] = {
    "prescriber_drug": {"total_claims": "int"},
}


def cleanse_table(df: DataFrame, name: str, when: dt.date | None = None) -> DataFrame:
    """Full cleanse: dedup -> casts -> ingestion-date stamp."""
    out = dedupe_rows(df)
    out = cast_columns(out, CLEANSE_CASTS.get(name, {}))
    return stamp_ingestion_date(out, when)


def write_zone(df: DataFrame, path: str, partitioned: bool = True) -> None:
    """Partitioned overwrite write to a zone directory (s3.py:195-227 /
    preprocessing_data.py:85 semantics; S5/S6)."""
    writer = df.write.mode("overwrite")
    if partitioned and set(PARTITION_COLS).issubset(df.columns):
        writer = writer.partitionBy(*PARTITION_COLS)
    writer.parquet(path)
