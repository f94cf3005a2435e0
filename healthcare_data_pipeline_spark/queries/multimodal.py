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


@query(
    "m05_media_dedup",
    oracle="""
    WITH h AS (
      SELECT doc_id, sha256(text) AS d FROM documents
    )
    SELECT doc_id, d AS content_sha256
    FROM h
    WHERE doc_id = (SELECT MIN(doc_id) FROM h h2 WHERE h2.d = h.d)
    """,
    tags=("multimodal", "EXT", "dedup"),
    doc="Exact media dedup: group by the content digest (m01's metadata column), keep the "
    "minimum id per digest — the binary-column twin of dd01. One shuffle on the digest "
    "key; at scale the digest is also the natural bucketing/partition key for media "
    "tables, making re-dedup of appended batches a bucket-local operation.",
)
def m05_media_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents").withColumn("content", F.encode("text", "UTF-8"))
    w = Window.partitionBy("content_sha256").orderBy("doc_id")
    return (
        d.select("doc_id", F.sha2("content", 256).alias("content_sha256"))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("doc_id", "content_sha256")
    )


def _m06_oracle_sql() -> str:
    """m06 oracle: the full aHash pipeline in integer SQL — 64 stub "pixels"
    from two content digests, mean-threshold bits via p*64 > sum(p), 16-bit
    band values, band-equality candidate join, exact Hamming via
    bit_count(xor) per band."""
    return f"""
    WITH h AS (
      SELECT doc_id, sha256(text) AS h1, sha256(text || chr(1)) AS h2 FROM documents
    ),
    px AS (
      SELECT doc_id, t.i AS i,
             CASE WHEN t.i < 32 THEN {_HEXB.format(h='h1', i='2 * t.i + 1')}
                  ELSE {_HEXB.format(h='h2', i='2 * (t.i - 32) + 1')} END AS p
      FROM h, generate_series(0, 63) t(i)
    ),
    tot AS (SELECT doc_id, SUM(p) AS total FROM px GROUP BY doc_id),
    bits AS (
      SELECT px.doc_id, px.i,
             CASE WHEN px.p * 64 > tot.total THEN 1 ELSE 0 END AS b
      FROM px JOIN tot USING (doc_id)
    ),
    bands AS (
      SELECT doc_id, CAST(i // 16 AS INTEGER) AS band,
             CAST(SUM(b << (i % 16)) AS INTEGER) AS val
      FROM bits GROUP BY doc_id, i // 16
    ),
    cands AS (
      SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
      FROM bands a JOIN bands b ON a.band = b.band AND a.val = b.val
                                AND a.doc_id < b.doc_id
    ),
    ham AS (
      SELECT c.d1, c.d2, CAST(SUM(bit_count(xor(x.val, y.val))) AS INTEGER) AS hamming
      FROM cands c
      JOIN bands x ON x.doc_id = c.d1
      JOIN bands y ON y.doc_id = c.d2 AND y.band = x.band
      GROUP BY c.d1, c.d2
    )
    SELECT d1, d2, hamming FROM ham WHERE hamming <= 3
    """


@query(
    "m06_media_neardup",
    oracle=_m06_oracle_sql(),
    tags=("multimodal", "EXT", "dedup", "lsh", "mapInPandas"),
    doc="Perceptual near-dup media pairs (operators/multimodal.media_neardup_pairs): "
    "average-hash over the deterministic decoded pixels, Hamming-band LSH candidate "
    "generation (4x16-bit bands — pigeonhole-complete for the <=3-bit default), exact "
    "Hamming verification via bit_count(xor). The near-dup twin of m05's exact digest "
    "dedup: catches re-encoded/resized media whose bytes (and byte digests) differ. "
    "Full integer oracle — even the Python aHash batch stage reproduces in SQL.",
)
def m06_media_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.multimodal import media_neardup_pairs

    d = table(spark, sf_dir, "documents").withColumn("content", F.encode("text", "UTF-8"))
    return media_neardup_pairs(d, max_hamming=3)


_M04_DIM = 16
_M04_PLANES = 8


def _m04_oracle_sql() -> str:
    """m04 oracle: digest-byte embedding components, exact integer norm, and
    the sign-bit LSH bucket with the SAME LCG hyperplane weights as
    operators.similarity.lcg_weight (plane * dim + d indexing)."""
    return f"""
    WITH h AS (
      SELECT doc_id, sha256(text) AS hx FROM documents
    ),
    v AS (
      SELECT doc_id, td.d AS d,
             CAST({_HEXB.format(h='hx', i='2 * td.d + 1')} AS BIGINT) AS val
      FROM h, generate_series(0, {_M04_DIM - 1}) td(d)
    ),
    bits AS (
      SELECT v.doc_id, tp.p,
             SUM(v.val * (((CAST(1103515245 AS BIGINT) * (tp.p * {_M04_DIM} + v.d) + 12345)
                           % 2147483648) - 1073741824)) AS dp
      FROM v, generate_series(0, {_M04_PLANES - 1}) tp(p)
      GROUP BY v.doc_id, tp.p
    ),
    bucket AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN dp >= 0 THEN CAST(1 AS BIGINT) << p ELSE CAST(0 AS BIGINT) END)
                  AS BIGINT) AS bucket
      FROM bits GROUP BY doc_id
    ),
    nrm AS (
      SELECT doc_id, sqrt(CAST(SUM(val * val) AS DOUBLE)) AS l2_norm
      FROM v GROUP BY doc_id
    )
    SELECT n.doc_id, n.l2_norm, b.bucket
    FROM nrm n JOIN bucket b ON n.doc_id = b.doc_id
    """


@query(
    "m04_media_embedding",
    oracle=_m04_oracle_sql(),
    tags=("multimodal", "EXT", "embedding", "ann", "mapInPandas"),
    doc="The media -> embedding -> retrieval bridge: Arrow-batched feature extraction "
    "(operators.multimodal.embed_media; digest-byte stub standing in for a vision "
    "encoder) producing integer-valued vectors, then the EXACT similarity machinery — "
    "L2 norm and sign-bit LSH bucket (operators.similarity.lsh_bucket) — on top. "
    "Value-hash-verified end to end: even the Python-batch embedding stage reproduces "
    "bit-identically in SQL, the reproducibility contract production encoders should "
    "meet (pure function of the bytes, integer-valued outputs).",
)
def m04_media_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.multimodal import embed_media
    from healthcare_data_pipeline_spark.operators.similarity import lsh_bucket

    d = table(spark, sf_dir, "documents").withColumn("content", F.encode("text", "UTF-8"))
    emb = embed_media(d, id_col="doc_id", content_col="content", dim=_M04_DIM)
    nrm = F.sqrt(
        F.aggregate(F.col("emb"), F.lit(0.0), lambda acc, x: acc + x * x)
    ).alias("l2_norm")
    return (
        lsh_bucket(emb, vec_col="emb", n_planes=_M04_PLANES, dim=_M04_DIM)
        .select("doc_id", nrm, "bucket")
    )
