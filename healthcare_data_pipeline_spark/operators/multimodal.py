"""[EXT] Multimodal column operators (image/audio/video as opaque binary).

Design (per the build charter): media lives in a ``binary`` content column
plus a typed metadata struct; decode / feature-extract / resize / frame-sample
run as Arrow-batched ``mapInPandas`` operators so bytes never round-trip
through row-at-a-time Python.  The actual codec step is STUBBED in this
environment (no image/audio libraries in the container) behind
``NotImplementedError`` with a deterministic fake used by tests — the
Spark-side plumbing (schema, batch iteration, partition sizing) is real.

Scale notes: media blobs dominate row size, so ``repartition_for_media``
targets a row-count per partition derived from expected blob size (keeping
Arrow batches within executor memory), and metadata-only queries should
project the struct WITHOUT the content column so the parquet reader never
materializes the bytes (column pruning does this for free — keep content and
metadata as separate top-level columns, never inside one struct).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("format", T.StringType()),  # png, wav, mp4, ...
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
    ]
)

DECODED_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("mean_intensity", T.DoubleType()),
    ]
)


def attach_media_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Compute the typed metadata columns from the binary content —
    pure column expressions, no UDF."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("raw").alias("format"),
            F.length(F.col(content_col)).cast("long").alias("n_bytes"),
            F.sha2(F.col(content_col), 256).alias("sha256"),
        ),
    )


def repartition_for_media(df: DataFrame, avg_blob_bytes: int, target_partition_bytes: int = 128 << 20) -> DataFrame:
    """Size partitions by blob volume, not row count (Arrow batches must fit
    executor memory when blobs are MB-scale).

    Fully lazy — triggers NO driver-side job (a ``count()`` over a media-scale
    table just to size partitions would be an extra full pass).  Rows are
    binned into chunks of ``rows_per_partition`` via ``monotonically_increasing_id``
    (chunks never span input partitions: the id embeds the partition ordinal in
    its high bits), then hash-repartitioned on the chunk id so each output
    partition holds whole ~target-byte chunks.  AQE (on by default in
    session.py) coalesces small outputs and splits oversized ones at runtime.
    """
    rows_per_partition = max(1, target_partition_bytes // max(1, avg_blob_bytes))
    chunk = (F.monotonically_increasing_id() / F.lit(rows_per_partition)).cast("long")
    return (
        df.withColumn("__media_chunk", chunk)
        .repartition(F.col("__media_chunk"))
        .drop("__media_chunk")
    )


def _fake_decode(content: bytes) -> tuple[int, int, int, float]:
    """Deterministic stand-in for a real image decode (no codec libs in this
    container): pseudo-dimensions/intensity derived from a content digest.
    Replace with PIL/OpenCV decode in production."""
    h = hashlib.sha256(content).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    channels = 3
    mean_intensity = h[2] / 255.0
    return width, height, channels, mean_intensity


def decode_images(
    df: DataFrame, id_col: str = "doc_id", content_col: str = "content", real: bool = False
) -> DataFrame:
    """Arrow-batched decode -> (id, width, height, channels, mean_intensity).

    ``real=True`` is the production path and raises until a codec library is
    wired in; the deterministic fake keeps the plumbing testable end-to-end.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if real:
                raise NotImplementedError(
                    "real image decode needs PIL/OpenCV — not shipped in this container"
                )
            decoded = [_fake_decode(b) for b in pdf[content_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "n_channels": [d[2] for d in decoded],
                    "mean_intensity": [d[3] for d in decoded],
                }
            )

    return df.select(id_col, content_col).mapInPandas(batches, DECODED_IMAGE_SCHEMA)


def embed_media(
    df: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "content",
    dim: int = 16,
    real: bool = False,
) -> DataFrame:
    """Arrow-batched media feature extraction -> (id, emb array<double>).

    The bridge from binary media into the similarity/ANN stack: embeddings
    come out integer-valued (each component is a content-digest byte, 0-255),
    so downstream norms, dot products, and LSH sign bits stay EXACT — the
    same reproducibility contract as queries.similarity.quantized.
    ``real=True`` is where a vision encoder plugs in (not shipped here); the
    deterministic digest features keep the whole media->embedding->retrieval
    path testable and oracle-verifiable end to end (query m04).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if real:
                raise NotImplementedError(
                    "real media embedding needs a vision encoder — not shipped in this container"
                )
            embs = [
                [float(b) for b in hashlib.sha256(c).digest()[:dim]]
                for c in pdf[content_col]
            ]
            yield pd.DataFrame({"doc_id": pdf[id_col].values, "emb": embs})

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("emb", T.ArrayType(T.DoubleType())),
        ]
    )
    return df.select(id_col, content_col).mapInPandas(batches, schema)


def frame_sample(
    df: DataFrame,
    every_n: int = 10,
    id_col: str = "doc_id",
    content_col: str = "content",
) -> DataFrame:
    """Video frame-sampling plumbing: emits one row per sampled frame index.
    The codec step is the same stub; the fan-out schema and batch shape are
    the real thing."""
    n_frames = (F.length(F.col(content_col)) % 100 + 1).alias("n_frames")  # fake probe
    frames = df.select(id_col, n_frames).withColumn(
        "frame_idx", F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n)))
    )
    return frames.select(id_col, "frame_idx")
