"""[EXT] Training-shard export — the last-mile sink of a data pipeline: the
curated corpus written as N balanced, deterministic, individually-readable
shards plus an audit manifest, the layout training dataloaders consume
(shard-order shuffling + intra-shard buffers).

Design points, each load-bearing at 100 TB:

- **Deterministic membership.** ``shard = shuffle_key(id) % n_shards`` — a
  pure function of the document id (the portable md5 hash family, no RNG).
  ``repartitionByRange`` would balance too, but its boundaries come from
  RANGE SAMPLING: re-running on different input layout can move rows across
  shards, which breaks resumable training and shard-level caching.  Hash
  membership never moves.
- **Directory per shard** (``__shard=K/``): a dataloader reads exactly the
  shards it owns via partition pruning — worker k's scan touches 1/N of the
  files, verified by the pruned-scan test.
- **Balance by hashing**, verified: the md5-derived key spreads ids
  uniformly, so shard sizes concentrate tightly around rows/N with no
  coordination (no global sort, no count pass).
- **Manifest from ONE aggregation pass** (rows/docs/tokens per shard +
  totals), written as ``manifest.json`` next to the data. Byte sizes come
  from the filesystem after commit.  Nothing about the corpus is ever
  collected to the driver except the N-row manifest itself.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from healthcare_data_pipeline_spark.operators.shuffle import shuffle_key

SHARD_COL = "__shard"


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int = 16,
    id_col: str = "doc_id",
    text_col: str | None = "text",
    epoch_col: str | None = None,
) -> dict:
    """Write ``df`` as ``n_shards`` hash-membership shard directories under
    ``path`` and return the manifest (also persisted as ``manifest.json``).

    Rows within a shard are ordered by the shuffle key (deterministic
    pseudo-random order, the t13 convention), so reading shard files in
    order replays a fixed sequence.  ``text_col=None`` skips token counting
    in the manifest (non-text payloads).
    """
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    if SHARD_COL in df.columns:
        raise ValueError(f"input already has a {SHARD_COL} column")
    key = shuffle_key(id_col, epoch_col)
    sharded = df.withColumn("__skey", key).withColumn(
        SHARD_COL, F.pmod(F.col("__skey"), F.lit(n_shards)).cast("int")
    )
    (
        sharded.repartition(n_shards, F.col(SHARD_COL))
        .sortWithinPartitions(SHARD_COL, "__skey", id_col)
        .drop("__skey")
        .write.mode("overwrite")
        .partitionBy(SHARD_COL)
        .parquet(path)
    )
    # One aggregation pass for the audit numbers; token counts use the
    # canonical explicit whitespace class so they reconcile with t01.
    aggs = [F.count("*").alias("rows")]
    if text_col is not None:
        aggs.append(
            F.sum(
                F.size(F.split(F.col(text_col), "[ \\t\\n\\r\\f\\x0B]+"))
            ).alias("tokens")
        )
    per = (
        sharded.groupBy(SHARD_COL)
        .agg(*aggs)
        .orderBy(SHARD_COL)
        .collect()
    )
    shards = []
    for r in per:
        d = {"shard": r[SHARD_COL], "rows": r["rows"]}
        if text_col is not None:
            d["tokens"] = int(r["tokens"]) if r["tokens"] is not None else 0
        d["bytes"] = _dir_bytes(os.path.join(path, f"{SHARD_COL}={r[SHARD_COL]}"))
        shards.append(d)
    manifest = {
        "n_shards": n_shards,
        "rows": sum(s["rows"] for s in shards),
        "bytes": sum(s["bytes"] for s in shards),
        "shards": shards,
    }
    if text_col is not None:
        manifest["tokens"] = sum(s["tokens"] for s in shards)
    with open(os.path.join(path, "manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    return manifest


def _dir_bytes(d: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(d):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def read_training_shards(
    spark: SparkSession, path: str, shards: list[int] | None = None
) -> DataFrame:
    """Read back shard data; ``shards`` selects a subset via partition
    pruning (worker k's scan never opens other shards' files)."""
    df = spark.read.parquet(path)
    if shards is not None:
        df = df.filter(F.col(SHARD_COL).isin([int(s) for s in shards]))
    return df
