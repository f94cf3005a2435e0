"""[EXT] Deterministic mixture sampling — per-source data-mixing weights.

Training corpora are blended by SOURCE WEIGHT (3x web, 0.5x forums, ...).
``mixture_sample`` keeps a row iff a portable 32-bit hash of its id, reduced
mod ``DENOM``, falls under the source's integer threshold — so the sample is:

* **deterministic & engine-portable** — same md5-derived hash convention as
  the portable MinHash (queries/dedup.py dd06/dd07); no RNG, no seed state;
  the selection reproduces bit-identically in any SQL engine (catalog t11).
* **stable under resampling** — raising a source's weight only ADDS
  documents (threshold grows, the kept set is a superset), the property that
  lets a pipeline re-weight a 100 TB mix without reshuffling what models
  already trained on.
* **shuffle-free** — one narrow filter; the predicate references only id and
  the shard column, so it pushes to the scan boundary and composes with
  partition pruning on ``source``.

``mixture_sample`` handles weights in [0, 1] (downsampling; catalog t11);
``mixture_resample`` extends to weights > 1 (upsampling) — each row emits
floor(w) full copies plus one hash-gated fractional copy, so E[copies] = w
exactly and the output carries an ``epoch`` index (0-based copy number)
that downstream shuffling/packing can mix on.  Same determinism contract:
no RNG, reproducible anywhere (catalog t12).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DENOM = 1_000_000


def portable_selector(id_col: str = "doc_id") -> Column:
    """md5-derived 32-bit hash of the id, mod DENOM — uniform in [0, DENOM)."""
    h32 = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast("long")
    return h32 % DENOM


def weight_thresholds(weights: dict[str, float]) -> dict[str, int]:
    """Integer thresholds (round(w * DENOM)) — computed ONCE in Python so the
    Spark filter and any SQL oracle compare against identical literals."""
    for s, w in weights.items():
        if not 0.0 <= w <= 1.0:
            raise ValueError(f"mixture weight must be in [0, 1], got {s}={w} (upsampling "
                             "is an explode over ceil(w), not supported here)")
    return {s: int(round(w * DENOM)) for s, w in weights.items()}


def mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    group_col: str = "source",
    default_weight: float = 0.0,
) -> DataFrame:
    """Keep each row with its source's probability, deterministically.

    Sources absent from ``weights`` fall back to ``default_weight`` (0.0 =
    drop unknown sources — the safe default for a curated mix).
    """
    th = weight_thresholds(weights)
    default_th = weight_thresholds({"_": default_weight})["_"]
    thresh = F.lit(default_th).cast("long")
    for s, t in sorted(th.items()):
        thresh = F.when(F.col(group_col) == s, F.lit(t).cast("long")).otherwise(thresh)
    return df.filter(portable_selector(id_col) < thresh)


def fractional_thresholds(weights: dict[str, float]) -> dict[str, tuple[int, int]]:
    """Per source: (floor(w) full copies, round(frac(w) * DENOM) gate) —
    integer literals shared between the Spark plan and any SQL oracle."""
    out: dict[str, tuple[int, int]] = {}
    for s, w in weights.items():
        if w < 0.0:
            raise ValueError(f"mixture weight must be >= 0, got {s}={w}")
        full = int(w)
        out[s] = (full, int(round((w - full) * DENOM)))
    return out


def mixture_resample(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """Weighted resampling with upsampling: E[copies per row] = weight.

    Output = input columns + ``epoch`` (long, 0-based copy index).  A row of
    a weight-2.3 source appears with epoch 0 and 1 always, and epoch 2 iff
    its hash gate falls under 0.3 — so exactly-reproducible, monotone in the
    weight, and still a narrow per-row fan-out (explode over a sequence
    literal; no shuffle, no RNG).  Sources absent from ``weights`` drop.
    """
    fr = fractional_thresholds(weights)
    full = F.lit(0)
    gate = F.lit(0).cast("long")
    for s, (nf, g) in sorted(fr.items()):
        full = F.when(F.col(group_col) == s, F.lit(nf)).otherwise(full)
        gate = F.when(F.col(group_col) == s, F.lit(g).cast("long")).otherwise(gate)
    n_copies = full + (portable_selector(id_col) < gate).cast("int")
    return (
        df.withColumn("__n", n_copies)
        .filter(F.col("__n") > 0)
        .withColumn("epoch", F.explode(F.sequence(F.lit(0), F.col("__n") - 1)))
        .withColumn("epoch", F.col("epoch").cast("long"))
        .drop("__n")
    )
