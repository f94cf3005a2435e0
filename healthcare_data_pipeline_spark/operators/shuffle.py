"""[EXT] Deterministic corpus shuffle — reproducible global order at scale.

Training wants documents in a pseudo-random order that is (a) the same on
every run/engine and (b) never serialized through one task.  The standard
trick: sort by a hash of the id.  ``shuffle_corpus`` does it scale-safely:

* the sort key is the portable md5-derived hash (same convention as the
  mixture gate / portable MinHash) of (id, epoch) — deterministic, no RNG;
* the total order is realized as ``repartitionByRange(key)`` +
  ``sortWithinPartitions(key)`` — a range shuffle into N parallel,
  globally-ordered output splits, NOT a single-partition global sort:
  reading split 0..N-1 in order replays the full shuffled corpus, and each
  split writes in parallel.

``shuffle_key`` is exposed separately so the key itself can be verified
cross-engine (catalog t13) — the physical range partitioning is pinned by a
plan test instead (an order-insensitive value hash cannot see it).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def shuffle_key(id_col: str = "doc_id", epoch_col: str | None = None) -> Column:
    """Portable 64-bit-ish sort key: md5 of "id[:epoch]", first 12 hex digits
    as a long (48 bits — collision-free ordering for practical corpus sizes,
    ties broken by id downstream)."""
    s = F.col(id_col).cast("string")
    if epoch_col is not None:
        s = F.concat(s, F.lit(":"), F.col(epoch_col).cast("string"))
    return F.conv(F.substring(F.md5(s), 1, 12), 16, 10).cast("long")


def shuffle_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    epoch_col: str | None = None,
    num_splits: int | None = None,
) -> DataFrame:
    """Append ``shuffle_key`` and return the corpus range-partitioned and
    sorted by it — N globally-ordered splits, parallel end to end.

    Determinism scope: the concatenated GLOBAL order (split 0..N-1) is a pure
    function of the keys and always replays identically.  Split BOUNDARIES
    come from range sampling, so which split a row lands in can shift if the
    input layout changes — pin boundaries explicitly (e.g. bucket the key
    range) if per-file determinism matters, not just sequence determinism."""
    out = df.withColumn("shuffle_key", shuffle_key(id_col, epoch_col))
    parts = [F.col("shuffle_key"), F.col(id_col)]
    if num_splits is not None:
        out = out.repartitionByRange(num_splits, *parts)
    else:
        out = out.repartitionByRange(*parts)
    return out.sortWithinPartitions(*parts)
