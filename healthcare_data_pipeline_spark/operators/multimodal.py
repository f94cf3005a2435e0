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


# Perceptual average-hash geometry: 64 hash bits (an 8x8 thumbnail, one bit
# per pixel) sliced into 4 bands of 16 bits for Hamming-band LSH.  The
# pigeonhole guarantee: two hashes within PHASH_BANDS - 1 = 3 differing bits
# ALWAYS share at least one identical band, so the band-equality join loses
# no pair at the default threshold — same structure as MinHash LSH banding
# (queries/dedup.py), applied to hash-bit slices instead of minhash rows.
PHASH_BITS = 64
PHASH_BANDS = 4
PHASH_BAND_BITS = PHASH_BITS // PHASH_BANDS

PHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("bands", T.ArrayType(T.IntegerType())),
    ]
)


def perceptual_hash(
    df: DataFrame, id_col: str = "doc_id", content_col: str = "content", real: bool = False
) -> DataFrame:
    """Arrow-batched perceptual average-hash -> (id, bands array<int>).

    The aHash recipe over the decoded thumbnail: take the 8x8 grayscale
    pixels, set bit i iff pixel i is above the thumbnail mean (computed in
    pure integer arithmetic as ``p[i] * 64 > sum(p)`` — no float mean), and
    slice the 64 bits into PHASH_BANDS 16-bit band values (little-endian
    within each band).  Re-encoded/resized twins keep nearly identical
    thumbnails, so their hashes differ in only a few bits — the signal
    ``media_neardup_pairs`` banding exploits.

    ``real=True`` is where a decoder + resampler plugs in (PIL/OpenCV, not
    shipped in this container).  The deterministic stand-in derives the 64
    "pixels" from two content digests (sha256(c) || sha256(c + 0x01)), which
    keeps the whole pipeline — including this Python batch stage —
    value-hash-verifiable against integer SQL (query m06), the same
    reproducibility contract as ``decode_images``/``embed_media``.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if real:
                raise NotImplementedError(
                    "real perceptual hashing needs an image decoder — not shipped in this container"
                )
            all_bands = []
            for c in pdf[content_col]:
                c = bytes(c)
                px = hashlib.sha256(c).digest() + hashlib.sha256(c + b"\x01").digest()
                total = sum(px)
                bits = [1 if p * PHASH_BITS > total else 0 for p in px]
                all_bands.append(
                    [
                        sum(
                            bits[PHASH_BAND_BITS * j + i] << i
                            for i in range(PHASH_BAND_BITS)
                        )
                        for j in range(PHASH_BANDS)
                    ]
                )
            yield pd.DataFrame({"doc_id": pdf[id_col].values, "bands": all_bands})

    return df.select(id_col, content_col).mapInPandas(batches, PHASH_SCHEMA)


def media_neardup_pairs(
    df: DataFrame,
    max_hamming: int = PHASH_BANDS - 1,
    id_col: str = "doc_id",
    content_col: str = "content",
) -> DataFrame:
    """Perceptual NEAR-dup candidate pairs -> (d1, d2, hamming).

    The near-dup twin of exact digest dedup (query m05): re-encoded, resized,
    or slightly-retouched media share a perceptual hash within a few bits,
    which byte digests cannot see.  Candidates come from a band-equality
    self-join on the 16-bit hash slices (the dd04 LSH pattern — NO all-pairs
    join anywhere: per band, work is quadratic only within same-band-value
    buckets, and 16-bit bands keep random collisions ~n^2/65536 per band),
    then each candidate's EXACT 64-bit Hamming distance is computed from the
    band arrays carried through the join (bit_count over per-band XOR — one
    projection, no join-back) and filtered to ``max_hamming``.

    Banding recall guarantee holds for ``max_hamming <= PHASH_BANDS - 1``
    (default): any pair within that distance shares a band.  A larger
    threshold still works but becomes approximate — pairs differing in
    ``> PHASH_BANDS - 1`` bits may not collide in any band.

    At 100 TB: hash computation is one Arrow pass over the media scan; the
    self-join shuffles only (band, val, bands) — 24 bytes/row×band, never
    the blobs — and band-value skew (e.g. flat-color thumbnails hashing to
    all-zero bands) is observable with the same band_skew_report pre-flight
    as text LSH.
    """
    ph = perceptual_hash(df, id_col=id_col, content_col=content_col)
    b = ph.select("doc_id", "bands", F.posexplode("bands").alias("band", "val"))
    ham = F.aggregate(
        F.zip_with(
            F.col("a.bands"), F.col("b.bands"), lambda x, y: F.bit_count(x.bitwiseXOR(y))
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    ).cast("int")
    return (
        b.alias("a")
        .join(b.alias("b"), ["band", "val"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("d1"),
            F.col("b.doc_id").alias("d2"),
            ham.alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


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
