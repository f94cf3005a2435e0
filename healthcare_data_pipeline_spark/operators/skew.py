"""Skew mitigation operators: salted aggregation and salted broadcast-free join.

AQE's skew-join handling (on by default in session.py) splits oversized
partitions at runtime, which covers most cases.  These operators are for the
cases AQE can't fix:

* **Salted two-phase aggregation** — a groupBy where one key holds a huge
  share of rows bottlenecks on a single reducer.  Phase 1 aggregates on
  (key, salt) spreading the hot key over `n_salts` reducers; phase 2 merges
  the partials.  Works for any algebraic aggregate (sum/count/min/max —
  supply the merge expression).
* **Salted join** — a shuffle join where the big side's hot key overwhelms
  one task.  The small side is replicated `n_salts` times (explode), the big
  side gets a random-but-deterministic salt, and the join key becomes
  (key, salt).  Row-level results are identical to the unsalted join for
  inner/left-side joins; right/full-outer are rejected (see ``salted_join``).

Salts are derived with ``pmod(xxhash64(unique_col), n)`` — deterministic, so
retries/speculative tasks produce identical results (required for exactly-once
sinks at scale).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(unique_col: str | Column, n_salts: int) -> Column:
    c = F.col(unique_col) if isinstance(unique_col, str) else unique_col
    return F.pmod(F.xxhash64(c), F.lit(n_salts)).cast("int")


def salted_sum(
    df: DataFrame,
    group_cols: list[str],
    sum_cols: dict[str, str],
    salt_from: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted grouped sum: ``sum_cols`` maps input column -> output
    alias; ``salt_from`` is any column that varies within the hot key (e.g. a
    row id) so rows spread evenly."""
    phase1 = df.withColumn("__salt", _salt(salt_from, n_salts)).groupBy(
        *group_cols, "__salt"
    )
    partials = phase1.agg(
        *[F.sum(src).alias(f"__p_{alias}") for src, alias in sum_cols.items()],
        F.count("*").alias("__p_n"),
    )
    final = partials.groupBy(*group_cols).agg(
        *[F.sum(f"__p_{alias}").alias(alias) for alias in sum_cols.values()],
        F.sum("__p_n").alias("n_rows"),
    )
    return final


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 16,
    salt_from: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: replicate ``small`` n_salts times, salt ``big``
    deterministically, join on (key, salt).

    Supports ``how`` in {inner, left/left_outer, left_semi, left_anti} only —
    for these, result rows == unsalted join because every big-side row carries
    exactly one salt.  Right/full-outer would emit each unmatched SMALL-side
    row once per salt (the small side is exploded before the join), so those
    modes raise instead of silently duplicating.

    Use when ``small`` is too big to broadcast but ``big`` has hot keys.
    ``salt_from`` defaults to every big-side column (row-content hash)."""
    allowed = {"inner", "left", "left_outer", "leftouter", "semi", "left_semi", "leftsemi", "anti", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join does not support how={how!r}: unmatched small-side rows "
            f"would be duplicated once per salt (small side is exploded). "
            f"Supported: inner, left, left_semi, left_anti."
        )
    salt_col = (
        _salt(salt_from, n_salts)
        if salt_from
        else F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts)).cast("int")
    )
    big_s = big.withColumn("__salt", salt_col)
    small_s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return big_s.join(small_s, [on, "__salt"], how).drop("__salt")
