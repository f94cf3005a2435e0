"""[EXT] Multimodal-column queries over the ``documents`` table.

The driver testdata has no binary media column, so these queries synthesize
one (``encode(text)`` — UTF-8 bytes) and then exercise the real multimodal
plumbing from operators/multimodal.py: typed metadata as pure column
expressions, Arrow-batched ``mapInPandas`` decode, and frame-sampling fan-out.

Oracle story: the stub decoder derives its outputs from sha256(content), which
DuckDB can reproduce (``sha256(text)`` + hex-pair parsing) — so even the
mapInPandas path is value-hash-checked, not just rows-counted.  That is the
template for production multimodal ops: make the Python batch function a pure
deterministic function of the bytes and the pipeline stays replayable /
verifiable at any scale or partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from healthcare_data_pipeline_spark.catalog import table
from healthcare_data_pipeline_spark.queries import query

# hex pair -> int, in portable SQL (DuckDB lacks blob indexing ergonomics).
_HEXB = (
    "((strpos('0123456789abcdef', substr({h}, {i}, 1)) - 1) * 16"
    " + (strpos('0123456789abcdef', substr({h}, {i} + 1, 1)) - 1))"
)


@query(
    "m01_media_metadata",
    oracle="""
    SELECT doc_id,
           'image' AS media_type,
           octet_length(encode(text)) AS n_bytes,
           sha256(text) AS content_sha256
    FROM documents
    """,
    tags=("multimodal", "EXT", "metadata"),
    doc="Typed media metadata (size + content digest) from a binary column as pure column "
    "expressions — no UDF, fully codegen'd. Metadata-only queries never materialize the "
    "blob bytes beyond this projection (content and metadata stay separate top-level "
    "columns so parquet column pruning skips the bytes entirely).",
)
def m01_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").withColumn("content", F.encode("text", "UTF-8"))
    return d.select(
        "doc_id",
        F.lit("image").alias("media_type"),
        F.length("content").cast("long").alias("n_bytes"),
        F.sha2("content", 256).alias("content_sha256"),
    )


_M02_ORACLE = f"""
    WITH h AS (
      SELECT doc_id, sha256(text) AS hx FROM documents
    )
    SELECT doc_id,
           CAST(64 + {_HEXB.format(h='hx', i=1)} % 192 AS INTEGER) AS width,
           CAST(64 + {_HEXB.format(h='hx', i=3)} % 192 AS INTEGER) AS height,
           3 AS n_channels,
           CAST({_HEXB.format(h='hx', i=5)} AS DOUBLE) / 255.0 AS mean_intensity
    FROM h
"""


@query(
    "m02_image_decode",
    oracle=_M02_ORACLE,
    tags=("multimodal", "EXT", "decode", "mapInPandas"),
    doc="Arrow-batched image decode via mapInPandas (operators/multimodal.decode_images). "
    "The codec is the deterministic sha256-derived stub (no image libs in this container), "
    "which makes even the Python-batch path value-hash-verifiable against SQL — the "
    "contract production decoders should meet (pure function of the bytes).",
)
def m02_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.multimodal import decode_images

    d = table(spark, sf_dir, "documents").withColumn("content", F.encode("text", "UTF-8"))
    out = decode_images(d, id_col="doc_id", content_col="content")
    return out.withColumn("n_channels", F.col("n_channels").cast("int"))


@query(
    "m03_frame_sample",
    oracle="""
    WITH probe AS (
      SELECT doc_id, octet_length(encode(text)) % 100 + 1 AS n_frames
      FROM documents
    )
    SELECT doc_id, CAST(f.frame_idx AS BIGINT) AS frame_idx
    FROM probe, UNNEST(generate_series(0, n_frames - 1, 10)) AS f(frame_idx)
    """,
    tags=("multimodal", "EXT", "video"),
    doc="Video frame-sampling fan-out: one row per sampled frame index "
    "(explode(sequence(...)) — pure JVM fan-out, no UDF; the per-frame decode would then "
    "run as a mapInPandas stage over the sampled rows only).",
)
def m03_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.multimodal import frame_sample

    d = table(spark, sf_dir, "documents").withColumn("content", F.encode("text", "UTF-8"))
    return frame_sample(d, every_n=10, id_col="doc_id", content_col="content").withColumn(
        "frame_idx", F.col("frame_idx").cast("long")
    )
