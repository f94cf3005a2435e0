"""Heuristic schema-resolution layer (reference ``runnerfile.py:319-442``).

The local runner never assumes fixed schemas — it discovers key columns by
substring matching (SURVEY.md §1.3):

- drug column: name contains "drug" AND ("id" or "name")  (runnerfile.py:373-374)
- measure column: contains any of count/qty/quantity/num/total/claims/cost
  (runnerfile.py:375-376), falling back to positional, then to a synthetic
  ``_row_count = lit(1)`` (runnerfile.py:377-381)
- prescriber id/name columns: same pattern (runnerfile.py:402-424)
- table resolution by key-substring over the catalog dict (runnerfile.py:319-346)

This module reproduces those semantics as a reusable resolver for
schema-flexible ingestion; the canonical-schema path (schemas.py) stays the
correctness default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEASURE_MARKERS = ("count", "qty", "quantity", "num", "total", "claims", "cost")


def resolve_table(dfs: dict[str, DataFrame], key: str) -> DataFrame | None:
    """Find a table whose name contains ``key`` (case-insensitive), preferring
    the exact name (runnerfile.py:319-346 _resolve_key semantics)."""
    if key in dfs:
        return dfs[key]
    lowered = {name.lower(): df for name, df in dfs.items()}
    if key.lower() in lowered:
        return lowered[key.lower()]
    for name, df in sorted(dfs.items()):
        if key.lower() in name.lower():
            return df
    return None


def resolve_drug_column(df: DataFrame) -> str | None:
    """Column containing 'drug' and ('id' or 'name') (runnerfile.py:373-374)."""
    for c in df.columns:
        lc = c.lower()
        if "drug" in lc and ("id" in lc or "name" in lc):
            return c
    return None


def resolve_measure_column(df: DataFrame) -> str | None:
    """First column containing a measure marker (runnerfile.py:375-376)."""
    for c in df.columns:
        lc = c.lower()
        if any(m in lc for m in MEASURE_MARKERS):
            return c
    return None


def resolve_id_column(df: DataFrame, entity: str) -> str | None:
    """Column containing the entity marker and 'id' (runnerfile.py:402-411)."""
    for c in df.columns:
        lc = c.lower()
        if entity.lower() in lc and "id" in lc:
            return c
    for c in df.columns:
        if "id" in c.lower():
            return c
    return None


def resolve_name_column(df: DataFrame, entity: str) -> str | None:
    """Column containing the entity marker and 'name' (runnerfile.py:412-424)."""
    for c in df.columns:
        lc = c.lower()
        if entity.lower() in lc and ("name" in lc or "fullname" in lc):
            return c
    for c in df.columns:
        if "name" in c.lower():
            return c
    return None


def with_fallback_measure(df: DataFrame) -> tuple[DataFrame, str]:
    """Resolve a measure column, else append the synthetic ``_row_count = 1``
    (runnerfile.py:379-381)."""
    m = resolve_measure_column(df)
    if m is not None:
        return df, m
    return df.withColumn("_row_count", F.lit(1)), "_row_count"
