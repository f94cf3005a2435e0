"""Streaming corpus ingestion with incremental dedup — the 100 TB/day path.

A training-data corpus grows by continuous document arrival; re-running batch
dedup over the whole corpus per drop is O(corpus) every time.  This module
wires ``operators.dedup_corpus.dedup_incremental`` into a ``foreachBatch``
sink: each micro-batch is deduplicated against the corpus's two compact
stored indexes (fingerprints + LSH band buckets), survivors are appended, and
the indexes are extended — per-batch cost stays O(batch).

Corpus state is one versioned directory swapped atomically as a unit::

    <corpus_dir>/current/
        docs/    deduplicated corpus parquet
        bands/   band_buckets index      (probe target for near-dups)
        fps/     corpus_fingerprints     (probe target for exact dups)
        _COMMITTED_BATCH

Exactly-once uses the same idempotent rename-aside discipline as
``streaming.events.run_foreach_batch_upsert``: the committed batchId rides
inside the staged version so marker and data become visible in one rename,
replayed batches are detected and skipped, and no crash point can lose the
previous version (it survives in ``current.old`` until the swap completes).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from healthcare_data_pipeline_spark.operators.dedup_corpus import (
    band_buckets,
    corpus_fingerprints,
    dedup_incremental,
)

_BANDS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("band", T.IntegerType()),
        T.StructField("bucket", T.StringType()),
    ]
)
_FPS_SCHEMA = T.StructType([T.StructField("fingerprint", T.StringType())])

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the documents parquet."""
    return (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "documents.parquet")
        .load(sf_dir)
    )


def prep_stream(
    docs: DataFrame,
    weights: dict[str, float] | None = None,
    min_stopword_ratio: float | None = 0.01,
) -> DataFrame:
    """The streaming corpus-prep gate: quality filter -> PII redaction ->
    optional mixture gate.  Every stage is a STATELESS row-level expression,
    so the exact batch operators run unchanged on an unbounded stream — no
    watermark, no state store, append-mode safe.  (Dedup, the stateful
    stage, is `run_stream_dedup_ingest`'s job downstream.)"""
    from healthcare_data_pipeline_spark.operators.mixture import mixture_sample
    from healthcare_data_pipeline_spark.operators.quality import quality_predicate
    from healthcare_data_pipeline_spark.operators.redact import redact_pii

    out = docs.filter(quality_predicate(min_stopword_ratio=min_stopword_ratio))
    out = redact_pii(out)
    if weights is not None:
        out = mixture_sample(out, weights)
    return out


def _load_state(
    spark: SparkSession, current: str
) -> tuple[DataFrame | None, DataFrame, DataFrame]:
    """(docs | None, bands, fps) from the current version; empty-schema
    frames when no version exists yet (first batch bootstraps the corpus)."""
    if os.path.exists(os.path.join(current, "_COMMITTED_BATCH")):
        return (
            spark.read.parquet(os.path.join(current, "docs")),
            spark.read.parquet(os.path.join(current, "bands")),
            spark.read.parquet(os.path.join(current, "fps")),
        )
    return (
        None,
        spark.createDataFrame([], _BANDS_SCHEMA),
        spark.createDataFrame([], _FPS_SCHEMA),
    )


def run_stream_dedup_ingest(
    stream_df: DataFrame,
    corpus_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    hasher: str = "portable",
) -> None:
    """Drain ``stream_df`` (a documents stream) into a deduplicated corpus.

    Blocking convenience wrapper: starts the query, processes everything
    available, stops — call repeatedly with the same ``checkpoint_dir`` to
    resume (replayed batches are skipped idempotently)."""
    current = os.path.join(corpus_dir, "current")
    aside = current + ".old"
    marker_name = "_COMMITTED_BATCH"

    def _recover() -> None:
        if os.path.exists(aside):
            if os.path.exists(current):
                shutil.rmtree(aside)
            else:
                os.rename(aside, current)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        _recover()
        marker = os.path.join(current, marker_name)
        if os.path.exists(marker):
            with open(marker) as fh:
                if batch_id <= int(fh.read().strip()):
                    return  # replayed batch — already ingested
        docs, bands, fps = _load_state(spark, current)
        survivors = dedup_incremental(
            batch_df, bands, fps, id_col=id_col, text_col=text_col, hasher=hasher
        )
        new_docs = docs.unionByName(survivors) if docs is not None else survivors
        new_bands = bands.unionByName(
            band_buckets(survivors, id_col=id_col, text_col=text_col, hasher=hasher)
        )
        new_fps = fps.unionByName(corpus_fingerprints(survivors, text_col=text_col))
        tmp = current + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        # Materialize the new version FULLY before any rename; reads above
        # came from `current`, so writing to tmp never reads-its-own-overwrite.
        new_docs.write.parquet(os.path.join(tmp, "docs"))
        new_bands.write.parquet(os.path.join(tmp, "bands"))
        new_fps.write.parquet(os.path.join(tmp, "fps"))
        with open(os.path.join(tmp, marker_name), "w") as fh:
            fh.write(str(batch_id))
        if os.path.exists(current):
            os.rename(current, aside)
        os.rename(tmp, current)
        if os.path.exists(aside):
            shutil.rmtree(aside)

    os.makedirs(corpus_dir, exist_ok=True)
    q = (
        stream_df.writeStream.outputMode("append")
        .foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def read_corpus(spark: SparkSession, corpus_dir: str) -> DataFrame:
    """The current deduplicated corpus."""
    return spark.read.parquet(os.path.join(corpus_dir, "current", "docs"))
