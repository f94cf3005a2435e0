"""[EXT] Similarity search over the ``embeddings`` table (array<float> column).

Engine-parity design note: cosine similarity on floats is NOT reproducible
across engines if computed naively (different summation orders / widths).  The
engine therefore quantizes each vector to integer-valued doubles
(``round(x * 1e6)``); dot products and norms of integer-valued doubles are
EXACT in IEEE double (values ≪ 2^53), so Spark and any SQL oracle produce
bit-identical similarities — and, with an id tie-break, identical top-k sets.
The same property makes results independent of partitioning/parallelism, which
is what reproducible retrieval at 100 TB requires.

Brute-force top-k here is the correctness baseline; the scale path (LSH
bucketing via random hyperplanes, candidate-only rescoring) is
``healthcare_data_pipeline_spark.operators.similarity``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from healthcare_data_pipeline_spark.catalog import table
from healthcare_data_pipeline_spark.queries import query

# Shared quantized-embedding SQL prelude for the DuckDB oracle.
_QUANT_SQL = """
    WITH e AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> ROUND(CAST(x AS DOUBLE) * 1000000)) AS iv
      FROM embeddings
    ),
    en AS (
      SELECT vec_id, label, iv, list_dot_product(iv, iv) AS nrm2
      FROM e
    )
"""


def quantized(spark: SparkSession, sf_dir: str, widen: bool = False) -> DataFrame:
    """embeddings + ``iv`` (quantized vector) + ``nrm2`` (exact squared norm).

    ``widen=True`` opts the scan into catalog's small-scan parallelism floor
    — set by consumers whose fused map-side work is corpus-heavy (the PQ
    trainer's per-iteration assign scan argmins every row against m*k
    codebooks on what is otherwise ONE row-group-starved task)."""
    e = table(spark, sf_dir, "embeddings", widen=widen)
    iv = F.transform(F.col("embedding"), lambda x: F.round(x.cast("double") * 1000000.0))
    df = e.select("vec_id", "label", iv.alias("iv"))
    nrm2 = F.aggregate(
        F.zip_with(F.col("iv"), F.col("iv"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return df.withColumn("nrm2", nrm2)


@query(
    "s01_knn_cosine",
    oracle=_QUANT_SQL
    + """
    , pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.label AS neighbor_label,
             list_dot_product(q.iv, c.iv) / (sqrt(q.nrm2) * sqrt(c.nrm2)) AS cosine_sim
      FROM en q JOIN en c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < 20
    )
    SELECT query_id, neighbor_id, neighbor_label, cosine_sim, rn
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine_sim DESC, neighbor_id ASC) AS rn
      FROM pairs
    ) t
    WHERE rn <= 5
    """,
    tags=("similarity", "EXT", "knn"),
    doc="Brute-force cosine top-5 neighbors for query vectors (vec_id < 20): quantized exact "
    "dot products -> bit-identical sims -> deterministic ranking. CORRECTNESS BASELINE ONLY: "
    "production retrieval goes through operators.similarity.knn (IVF/LSH probes, s04/s05), "
    "which refuses this O(Q*N) scan unless validate=True.",
)
def s01_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    en = quantized(spark, sf_dir)
    q = en.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"),
        F.col("iv").alias("q_iv"),
        F.col("nrm2").alias("q_nrm2"),
    )
    c = en.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
        F.col("iv").alias("c_iv"),
        F.col("nrm2").alias("c_nrm2"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("q_iv"), F.col("c_iv"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    pairs = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            "neighbor_label",
            (dot / (F.sqrt(F.col("q_nrm2")) * F.sqrt(F.col("c_nrm2")))).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return pairs.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 5)


@query(
    "s04_ivf_knn",
    oracle=_QUANT_SQL
    + """
    , pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_dot_product(q.iv, c.iv) / (sqrt(q.nrm2) * sqrt(c.nrm2)) AS cosine_sim
      FROM en q JOIN en c ON q.label = c.label AND q.vec_id <> c.vec_id
      WHERE q.vec_id < 20
    )
    SELECT query_id, neighbor_id, cosine_sim, rn
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine_sim DESC, neighbor_id ASC) AS rn
      FROM pairs
    ) t
    WHERE rn <= 5
    """,
    tags=("similarity", "EXT", "ann", "ivf"),
    doc="IVF-style ANN (nprobe=1): each query searches only its own coarse cell "
    "(precomputed assignment = embeddings.label), exact rescoring within the cell. At scale "
    "the corpus is bucketed by cell id so a probe is a partition-pruned scan of 1/n_cells "
    "of the data — the linear-candidate path that replaces s01's full scan.",
)
def s04_ivf_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.similarity import ivf_topk

    en = quantized(spark, sf_dir)
    return ivf_topk(en, F.col("vec_id") < 20, cell_col="label", k=5)


def _index_assign_ctes(quantizer_pred: str) -> str:
    """CTEs recomputing a persisted IVF index from scratch, through
    ``assign`` (vec_id -> cell): integer component-sum centroids over the
    vectors satisfying ``quantizer_pred`` (``TRUE`` = quantize on the full
    corpus, s07; a subset predicate = the frozen-quantizer append contract,
    s08/s09), then assignment of ALL vectors against those centroids.
    Shared by the probe oracles (s07/s08) and the occupancy-report oracle
    (s09)."""
    return (
        _QUANT_SQL
        + f"""
    , comp AS (
      SELECT label AS cent_id, i AS pos, SUM(CAST(iv[i] AS HUGEINT)) AS s
      FROM en, generate_series(1, 64) AS t(i)
      WHERE {quantizer_pred}
      GROUP BY label, i
    ),
    cn AS (
      SELECT cent_id, sqrt(CAST(SUM(s * s) AS DOUBLE)) AS cnorm
      FROM comp GROUP BY cent_id
    ),
    scores AS (
      SELECT e.vec_id, c.cent_id,
             CAST(SUM(CAST(e.iv[c.pos] AS HUGEINT) * c.s) AS DOUBLE) AS dot
      FROM en e CROSS JOIN comp c
      GROUP BY e.vec_id, c.cent_id
    ),
    ranked AS (
      SELECT s.vec_id, s.cent_id,
             ROW_NUMBER() OVER (PARTITION BY s.vec_id
                                ORDER BY s.dot / cn.cnorm DESC, s.cent_id ASC) AS crn
      FROM scores s JOIN cn USING (cent_id)
    ),
    assign AS (SELECT vec_id, cent_id AS cell FROM ranked WHERE crn = 1)
    """
    )


def _index_probe_oracle(quantizer_pred: str) -> str:
    """Persisted-IVF probe oracle: the shared assignment CTEs plus query
    routing to the 2 nearest cells and exact rescoring within the probed
    cells."""
    return (
        _index_assign_ctes(quantizer_pred)
        + """
    , probes AS (
      SELECT vec_id AS query_id, cent_id AS cell
      FROM ranked WHERE crn <= 2 AND vec_id < 20
    ),
    pairs AS (
      SELECT p.query_id, a.vec_id AS neighbor_id,
             list_dot_product(q.iv, c.iv) / (sqrt(q.nrm2) * sqrt(c.nrm2)) AS cosine_sim
      FROM probes p
      JOIN assign a ON a.cell = p.cell AND a.vec_id <> p.query_id
      JOIN en q ON q.vec_id = p.query_id
      JOIN en c ON c.vec_id = a.vec_id
    )
    SELECT query_id, neighbor_id, cosine_sim, rn
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine_sim DESC, neighbor_id ASC) AS rn
      FROM pairs
    ) t
    WHERE rn <= 5
    """
    )


@query(
    "s07_ann_index_probe",
    oracle=_index_probe_oracle("TRUE"),
    tags=("similarity", "EXT", "ann", "ivf", "index"),
    doc="Persisted-IVF-index probe, the PRODUCTION ANN path: build once (vectors parquet "
    "partitioned by quantizer cell + integer component-sum centroid table), then probe the "
    "2 nearest cells per query with the probed-cell scan pruned at the DISK partition "
    "level. The quantizer is integer-exact (decimal dot against component sums; cosine is "
    "scale-invariant so ranking vs the sum vector == ranking vs the mean), so cell "
    "assignment, routing, and rescoring are all bit-reproducible and the full probe result "
    "hash-matches a SQL oracle that recomputes the same index from scratch.",
)
def s07_ann_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.similarity import (
        ann_index_for,
        ann_index_probe,
    )

    en = quantized(spark, sf_dir)
    idx = ann_index_for(spark, sf_dir, en)
    qs = en.filter(F.col("vec_id") < 20).select("vec_id", "iv", "nrm2")
    return ann_index_probe(spark, idx, qs, k=5, nprobe=2)


@query(
    "s08_ann_index_append",
    oracle=_index_probe_oracle("vec_id % 2 = 0"),
    tags=("similarity", "EXT", "ann", "ivf", "index", "incremental"),
    doc="Incremental index maintenance (operators.similarity.ann_index_append): the index "
    "is built from the even vec_ids only, then the odd vec_ids are APPENDED against the "
    "frozen quantizer — O(batch) routing + an append into the existing cell partitions, no "
    "rebuild, no rewrite of existing data (the ANN analogue of dd11's incremental dedup "
    "probe). The probe over the mixed built+appended index is hash-verified against an "
    "oracle that quantizes on the even half and assigns ALL vectors against those "
    "centroids — passing proves appended vectors land in exactly the cells the frozen "
    "quantizer dictates.",
)
def s08_ann_index_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.similarity import (
        ann_index_append,
        ann_index_build,
        ann_index_for,
        ann_index_probe,
    )

    en = quantized(spark, sf_dir)

    def build_then_append(idx: str) -> None:
        ann_index_build(en.filter(F.col("vec_id") % 2 == 0), idx)
        ann_index_append(spark, idx, en.filter(F.col("vec_id") % 2 == 1))

    idx = ann_index_for(spark, sf_dir, en, variant="append-demo", builder=build_then_append)
    qs = en.filter(F.col("vec_id") < 20).select("vec_id", "iv", "nrm2")
    return ann_index_probe(spark, idx, qs, k=5, nprobe=2)


@query(
    "s09_ann_index_report",
    oracle=_index_assign_ctes("vec_id % 2 = 0")
    + """
    , cells AS (SELECT DISTINCT label AS cell FROM en WHERE vec_id % 2 = 0),
    occ AS (SELECT cell, COUNT(*) AS n FROM assign GROUP BY cell),
    percell AS (
      SELECT c.cell, COALESCE(o.n, 0) AS n
      FROM cells c LEFT JOIN occ o ON o.cell = c.cell
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST(SUM(n) AS BIGINT) AS n_vectors,
           CAST(SUM(CASE WHEN n = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_empty_cells,
           CAST(MAX(n) AS BIGINT) AS max_cell,
           CAST(MAX(n) AS DOUBLE) * COUNT(*) / CAST(SUM(n) AS BIGINT) AS skew_ratio,
           CAST(MAX(n) AS DOUBLE) * COUNT(*) / CAST(SUM(n) AS BIGINT) >= 4.0
             AS rebuild_recommended
    FROM percell
    """,
    tags=("similarity", "EXT", "ann", "ivf", "index", "diagnostic"),
    doc="Quantizer-drift diagnostic over the persisted built+appended IVF index "
    "(operators.similarity.ann_index_report): per-cell occupancy rolled into "
    "(n_cells, n_vectors, n_empty_cells, max_cell, skew_ratio, rebuild_recommended) — "
    "the index twin of dd15's band-skew pre-flight. ann_index_append freezes the "
    "quantizer, so a drifting embedding distribution concentrates new mass in few cells "
    "and silently degrades probe cost and recall; this report makes that observable "
    "after every append batch for the cost of a partition-column-only scan. The oracle "
    "recomputes the same assignment from scratch (even-half quantizer, all vectors "
    "assigned) and aggregates occupancy identically.",
)
def s09_ann_index_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.similarity import (
        ann_index_append,
        ann_index_build,
        ann_index_for,
        ann_index_report,
    )

    en = quantized(spark, sf_dir)

    def build_then_append(idx: str) -> None:
        ann_index_build(en.filter(F.col("vec_id") % 2 == 0), idx)
        ann_index_append(spark, idx, en.filter(F.col("vec_id") % 2 == 1))

    idx = ann_index_for(spark, sf_dir, en, variant="append-demo", builder=build_then_append)
    return ann_index_report(spark, idx)


_SQ8_PROBE_ORACLE = (
    _index_assign_ctes("TRUE")
    + """
    , bounds AS (
      SELECT i AS pos,
             MIN(CAST(iv[i] AS BIGINT)) AS lo,
             MAX(CAST(iv[i] AS BIGINT)) AS hi
      FROM en, generate_series(1, 64) AS t(i)
      GROUP BY i
    ),
    probes AS (
      SELECT vec_id AS query_id, cent_id AS cell
      FROM ranked WHERE crn <= 2 AND vec_id < 20
    ),
    -- dequantized components of every vector in a probed cell:
    -- code = floor((v - lo) * 255 / max(span, 1)); dq = lo + floor((code*span + 127)/255)
    dq AS (
      SELECT e.vec_id, b.pos,
             b.lo + ((((CAST(e.iv[b.pos] AS BIGINT) - b.lo) * 255)
                       // GREATEST(b.hi - b.lo, 1)) * (b.hi - b.lo) + 127) // 255 AS dqv
      FROM en e
      JOIN assign a ON a.vec_id = e.vec_id
      JOIN (SELECT DISTINCT cell FROM probes) pc ON a.cell = pc.cell
      CROSS JOIN bounds b
    ),
    dqn AS (SELECT vec_id, SUM(dqv * dqv) AS n2 FROM dq GROUP BY vec_id),
    adc AS (
      SELECT p.query_id, d.vec_id AS neighbor_id, SUM(CAST(q.iv[d.pos] AS BIGINT) * d.dqv) AS dot
      FROM probes p
      JOIN assign a ON a.cell = p.cell AND a.vec_id <> p.query_id
      JOIN dq d ON d.vec_id = a.vec_id
      JOIN en q ON q.vec_id = p.query_id
      GROUP BY p.query_id, d.vec_id
    ),
    short AS (
      SELECT query_id, neighbor_id
      FROM (
        SELECT adc.query_id, adc.neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY adc.query_id
                  ORDER BY CAST(adc.dot AS DOUBLE) / (sqrt(q.nrm2) * sqrt(n.n2)) DESC,
                           adc.neighbor_id ASC) AS srn
        FROM adc
        JOIN en q ON q.vec_id = adc.query_id
        JOIN dqn n ON n.vec_id = adc.neighbor_id
      ) t
      WHERE srn <= 20
    ),
    pairs AS (
      SELECT s.query_id, s.neighbor_id,
             list_dot_product(q.iv, c.iv) / (sqrt(q.nrm2) * sqrt(c.nrm2)) AS cosine_sim
      FROM short s
      JOIN en q ON q.vec_id = s.query_id
      JOIN en c ON c.vec_id = s.neighbor_id
    )
    SELECT query_id, neighbor_id, cosine_sim, rn
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine_sim DESC, neighbor_id ASC) AS rn
      FROM pairs
    ) t
    WHERE rn <= 5
    """
)


@query(
    "s10_ann_index_probe_sq8",
    oracle=_SQ8_PROBE_ORACLE,
    tags=("similarity", "EXT", "ann", "ivf", "index", "quantization"),
    doc="SQ8-quantized ANN probe (operators.similarity.ann_index_probe_sq8): the persisted "
    "IVF index additionally stores each vector as 8-bit per-dimension codes under frozen "
    "integer bounds (~4-8x smaller probe scan — at 100 TB the probe's dominant cost is "
    "scan I/O of the probed cells, s07). The probe routes queries against the centroid "
    "table, ranks candidates by the asymmetric exact-query x dequantized-candidate cosine "
    "over the SMALL codes scan, keeps a 20-deep shortlist per query, and exact-rescores "
    "only the shortlist against the full-precision layout — reported scores are exact; "
    "quantization affects only which candidates reach the rescore. Codes, dequantization "
    "(code = floor((v-lo)*255/span), dq = lo + round-half-up(code*span/255)), ADC scores "
    "and tie-breaks are all small-integer arithmetic, bit-identical cross-engine, so the "
    "oracle recomputes the index, the bounds, the shortlist, and the rescore from scratch "
    "and the full result value-hashes.",
)
def s10_ann_index_probe_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.similarity import (
        ann_index_build_sq8,
        ann_index_for,
        ann_index_probe_sq8,
    )

    en = quantized(spark, sf_dir)
    idx = ann_index_for(
        spark, sf_dir, en, variant="sq8", builder=lambda d: ann_index_build_sq8(en, d)
    )
    qs = en.filter(F.col("vec_id") < 20).select("vec_id", "iv", "nrm2")
    return ann_index_probe_sq8(spark, idx, qs, k=5, nprobe=2, shortlist=20)


# Sign-bit-LSH bucketing CTEs (bits/buckets/enb) — shared between the s05
# oracle and the dd10 embedding-dedup oracle; LCG constants mirror
# operators.similarity.lcg_weight exactly.
_LSH_CTES = """
    , bits AS (
      SELECT e.vec_id, tp.p,
             SUM(CAST(e.iv[td.d + 1] AS BIGINT) *
                 (((CAST(1103515245 AS BIGINT) * (tp.p * 64 + td.d) + 12345) % 2147483648)
                  - 1073741824)) AS dp
      FROM en e, generate_series(0, 7) tp(p), generate_series(0, 63) td(d)
      GROUP BY e.vec_id, tp.p
    ),
    buckets AS (
      SELECT vec_id, CAST(SUM(CASE WHEN dp >= 0 THEN CAST(1 AS BIGINT) << p ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS bucket
      FROM bits GROUP BY vec_id
    ),
    enb AS (
      SELECT en.vec_id, en.iv, en.nrm2, b.bucket
      FROM en JOIN buckets b ON en.vec_id = b.vec_id
    )
"""


@query(
    "s05_lsh_ann",
    oracle=_QUANT_SQL
    + _LSH_CTES
    + """
    SELECT a.vec_id AS d1, b.vec_id AS d2, a.bucket AS bucket,
           list_dot_product(a.iv, b.iv) / (sqrt(a.nrm2) * sqrt(b.nrm2)) AS cosine_sim
    FROM enb a JOIN enb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    """,
    tags=("similarity", "EXT", "ann", "lsh"),
    doc="Sign-bit LSH candidate pairs: 8 LCG-derived hyperplanes -> exact BIGINT sign bits "
    "-> 8-bit bucket; intra-bucket pairs rescored with exact cosine. ONE shuffle on the "
    "bucket key (linear candidate generation) vs the N^2 brute-force of dd03 — the 100 TB "
    "near-dup/ANN path. Signatures are bit-identical across engines by construction.",
)
def s05_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.similarity import lsh_candidate_pairs

    # widen=True (r16 A/B win: 3.22 -> 2.92 s min, 3.52 -> 2.93 s median,
    # steal-clean interleaved arms): the bucket self-join's rescore loop
    # otherwise streams the single-row-group scan on one task; gated no-op
    # at production sizes.
    en = quantized(spark, sf_dir, widen=True)
    return lsh_candidate_pairs(en)


@query(
    "s06_ann_recall",
    oracle=_QUANT_SQL
    + _LSH_CTES
    + """
    , exact AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY q.vec_id
                ORDER BY list_dot_product(q.iv, c.iv) / (sqrt(q.nrm2) * sqrt(c.nrm2)) DESC,
                         c.vec_id ASC) AS rn
      FROM en q JOIN en c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < 20
    ),
    ex5 AS (SELECT query_id, neighbor_id FROM exact WHERE rn <= 5),
    ann AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY q.vec_id
                ORDER BY list_dot_product(q.iv, c.iv) / (sqrt(q.nrm2) * sqrt(c.nrm2)) DESC,
                         c.vec_id ASC) AS rn
      FROM enb q JOIN enb c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
      WHERE q.vec_id < 20
    ),
    an5 AS (SELECT query_id, neighbor_id FROM ann WHERE rn <= 5),
    hits AS (SELECT query_id, neighbor_id FROM ex5 INTERSECT SELECT query_id, neighbor_id FROM an5)
    SELECT (SELECT COUNT(DISTINCT query_id) FROM ex5) AS n_queries,
           (SELECT COUNT(*) FROM ex5) AS n_exact,
           (SELECT COUNT(*) FROM hits) AS n_hit,
           CAST((SELECT COUNT(*) FROM hits) AS DOUBLE)
             / (SELECT COUNT(*) FROM ex5) AS recall
    """,
    tags=("similarity", "EXT", "ann", "evaluation"),
    doc="Recall@5 of the sign-bit-LSH ANN route against the exact answer "
    "(operators.similarity.knn_recall, method='lsh') — the evaluation loop for tuning "
    "n_planes/nprobe on a sample before a full-corpus run. FULLY hash-checked, not just "
    "bounded: quantized integer dots make both the exact and the LSH rankings (and hence "
    "n_hit itself) bit-identical in SQL.",
)
def s06_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.similarity import knn_recall

    # widen A/B LOST here (r16: +0.36 s min, medians worse) — the recall
    # twin is dominated by the brute-force comparison pass, not the scan;
    # narrow kept.
    en = quantized(spark, sf_dir)
    return knn_recall(en, F.col("vec_id") < 20, k=5, method="lsh")


@query(
    "s02_embedding_norms",
    oracle=_QUANT_SQL
    + """
    SELECT vec_id, label, sqrt(nrm2) / 1000000.0 AS l2_norm
    FROM en
    """,
    tags=("similarity", "EXT", "vector-math"),
    doc="Per-vector exact L2 norm (quantized) — the vector-math building block as built-in "
    "higher-order array functions, no UDF.",
)
def s02_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    en = quantized(spark, sf_dir)
    return en.select(
        "vec_id", "label", (F.sqrt(F.col("nrm2")) / 1000000.0).alias("l2_norm")
    )


@query(
    "s03_label_centroids",
    oracle=_QUANT_SQL
    + """
    , comp AS (
      SELECT label, i AS pos,
             SUM(CAST(iv[i] AS BIGINT)) AS s,
             COUNT(*) AS n_vecs
      FROM en, generate_series(1, 64) AS t(i)
      GROUP BY label, i
    )
    SELECT label,
           MAX(n_vecs) AS n_vecs,
           CAST(SUM(s * s) AS DOUBLE) / CAST(MAX(n_vecs) * MAX(n_vecs) AS DOUBLE)
             AS centroid_sq_norm
    FROM comp
    GROUP BY label
    """,
    tags=("similarity", "EXT", "centroid"),
    doc="Per-label centroid squared-norm via pure integer math (exact and order-free on any "
    "engine/partitioning): posexplode -> integer component sums S -> sum(S^2)/n^2. The IVF "
    "coarse-quantizer building block (centroid per cluster).",
)
def s03_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    en = quantized(spark, sf_dir)
    comp = (
        en.select("label", F.posexplode("iv").alias("pos0", "v"))
        .groupBy("label", "pos0")
        .agg(F.sum(F.col("v").cast("long")).alias("s"), F.count("*").alias("n_vecs"))
    )
    return comp.groupBy("label").agg(
        F.max("n_vecs").alias("n_vecs"),
        (
            # decimal(38,0) keeps the sum of s^2 exact (s can reach n_vecs*1e6, so
            # sum(s^2) can exceed 2^63 at scale — ANSI mode would throw on long
            # overflow).  Casting ONE multiplicand is sufficient AND load-bearing:
            # Spark promotes the long operand to decimal for the whole product —
            # keep the cast if this expression is edited.
            F.sum(F.col("s").cast("decimal(38,0)") * F.col("s")).cast("double")
            / (F.max("n_vecs") * F.max("n_vecs")).cast("double")
        ).alias("centroid_sq_norm"),
    )


def _kmeans_ctes(k: int = 8, iters: int = 2, dim: int = 64) -> str:
    """The integer-Lloyd iterations UNROLLED as CTE stages (a1/s1/c1,
    a2/s2/c2, ..., final assignment ``af``) — a fully relational recompute
    of operators.similarity.kmeans_assign, shared by the s11 oracle and the
    dd23 composition oracle.  Exactness mirrors: distances via integer dot
    products; truncated-mean centroids via sign-peeled ``//`` (DuckDB
    floors, Spark DIV truncates — on non-negatives they agree); ties break
    toward the lowest cluster id.  The oracle encodes argmin as the
    ``dist_sq*k + j`` min-ordinal (exact at its fixed k=8, where it is
    value-identical to the operator's k-free struct argmin)."""

    def assign(name: str, cent: str) -> str:
        return f"""
    {name} AS (
      SELECT en.vec_id,
             MIN((list_dot_product(en.iv, en.iv) - 2 * list_dot_product(en.iv, c.c)
                  + list_dot_product(c.c, c.c)) * {k} + c.j) AS o
      FROM en CROSS JOIN {cent} c
      GROUP BY en.vec_id
    )"""

    def update(a: str, s: str, c: str) -> str:
        return f"""
    {s} AS (
      SELECT CAST(CAST(a.o AS BIGINT) % {k} AS INT) AS cl, t.i AS pos,
             SUM(CAST(en.iv[t.i] AS BIGINT)) AS s, COUNT(*) AS n
      FROM en JOIN {a} a USING (vec_id), generate_series(1, {dim}) AS t(i)
      GROUP BY 1, 2
    ),
    {c} AS (
      SELECT cl AS j,
             list_transform(list_sort(list(struct_pack(pos := pos,
               cv := CAST(CASE WHEN s >= 0 THEN s // n ELSE -((-s) // n) END AS DOUBLE)))),
               x -> x.cv) AS c
      FROM {s} GROUP BY cl
    )"""

    parts = [
        f"""
    , c0 AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS j, iv AS c
      FROM en ORDER BY vec_id LIMIT {k}
    )"""
    ]
    prev = "c0"
    for it in range(1, iters + 1):
        parts.append("," + assign(f"a{it}", prev))
        parts.append("," + update(f"a{it}", f"s{it}", f"c{it}"))
        prev = f"c{it}"
    parts.append("," + assign("af", prev))
    return _QUANT_SQL + "".join(parts)


def _s11_oracle_sql(k: int = 8, iters: int = 2, dim: int = 64) -> str:
    """s11 oracle: the shared k-means CTEs + the final per-vector decode of
    the min-ordinal into (cluster_id, dist_sq)."""
    return (
        _kmeans_ctes(k, iters, dim)
        + f"""
    SELECT vec_id,
           CAST(CAST(o AS BIGINT) % {k} AS INT) AS cluster_id,
           (CAST(o AS BIGINT) - (CAST(o AS BIGINT) % {k})) // {k} AS dist_sq
    FROM af
    """
    )


@query(
    "s11_kmeans",
    oracle=_s11_oracle_sql(),
    tags=("similarity", "EXT", "clustering", "iterative"),
    doc="Deterministic k-means clustering (operators.similarity.kmeans_assign): the "
    "from-scratch coarse quantizer for IVF/SemDeDup when no label partition exists — "
    "integer-Lloyd with smallest-id seeds, truncated integer-mean centroids, exact "
    "integer distances and a (dist_sq, j) struct-argmin tie-break, so the ITERATIVE float "
    "algorithm (famously engine/order-dependent) value-hashes against a relational "
    "oracle with the iterations unrolled as CTE stages. Per iteration: assignment is a "
    "ZERO-shuffle scan (k centroids ride a broadcast 1-row array; argmin is one scalar "
    "expression), the update one k*dim-key groupBy with map-side combine — nothing is "
    "collected, iters+1 passes total.",
)
def s11_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.similarity import kmeans_assign

    return kmeans_assign(quantized(spark, sf_dir), k=8, iters=2).select(
        "vec_id", "cluster_id", "dist_sq"
    )


def _pq_ctes(
    m: int = 2,
    k: int = 8,
    iters: int = 2,
    dim: int = 64,
    include_quant: bool = True,
    src: str = "en",
) -> str:
    """Product-quantization oracle CTEs: the grouped integer-Lloyd of
    operators.similarity.pq_train with the subspace id as an extra grouping
    key, iterations unrolled (the s11/_kmeans_ctes pattern), ending in the
    final per-(vector, subspace) assignment ``paf`` and final codebooks
    ``pc{iters}``.  ``src`` names the (vec_id, iv) relation the codebooks
    train on — ``en`` for raw vectors (s12), a residual CTE for the IVFADC
    layout (s13).  The min-ordinal ``d*k + j`` stays exact even on
    residuals: d <= sub_dim * (2*2*6e5)^2 ~ 1.9e14, * k=8 ~ 1.5e15 < 2^53
    at the fixed m=2/dim=64 shape (sub_dim=32)."""
    sd = dim // m
    sub = "iv[mi*{sd}+1 : mi*{sd}+{sd}]".format(sd=sd)

    def assign(name: str, cent: str) -> str:
        return f"""
    {name} AS (
      SELECT e.vec_id, e.sub_id,
             MIN((list_dot_product(e.sv, e.sv) - 2 * list_dot_product(e.sv, c.c)
                  + list_dot_product(c.c, c.c)) * {k} + c.j) AS o
      FROM ens e JOIN {cent} c USING (sub_id)
      GROUP BY 1, 2
    )"""

    def update(a: str, s: str, c: str) -> str:
        return f"""
    {s} AS (
      SELECT e.sub_id, CAST(CAST(a.o AS BIGINT) % {k} AS INT) AS cl, t.i AS pos,
             SUM(CAST(e.sv[t.i] AS BIGINT)) AS s, COUNT(*) AS n
      FROM ens e JOIN {a} a ON e.vec_id = a.vec_id AND e.sub_id = a.sub_id,
           generate_series(1, {sd}) AS t(i)
      GROUP BY 1, 2, 3
    ),
    {c} AS (
      SELECT sub_id, cl AS j,
             list_transform(list_sort(list(struct_pack(pos := pos,
               cv := CAST(CASE WHEN s >= 0 THEN s // n ELSE -((-s) // n) END AS DOUBLE)))),
               x -> x.cv) AS c
      FROM {s} GROUP BY 1, 2
    )"""

    parts = [
        f"""
    , ens AS (
      SELECT vec_id, mi AS sub_id, {sub} AS sv
      FROM {src}, UNNEST(generate_series(0, {m - 1})) AS g(mi)
    ),
    pseedj AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS j, iv
      FROM (SELECT vec_id, iv FROM {src} ORDER BY vec_id LIMIT {k})
    ),
    pc0 AS (
      SELECT mi AS sub_id, j, {sub} AS c
      FROM pseedj, UNNEST(generate_series(0, {m - 1})) AS g(mi)
    )"""
    ]
    prev = "pc0"
    for it in range(1, iters + 1):
        parts.append("," + assign(f"pa{it}", prev))
        parts.append("," + update(f"pa{it}", f"ps{it}", f"pc{it}"))
        prev = f"pc{it}"
    parts.append("," + assign("paf", prev))
    body = "".join(parts)
    if not include_quant:
        return body  # starts with ", ens AS (" — splices after any en-defining chain
    return _QUANT_SQL + body


_S12_NQ = 5
_S12_TOP = 5


def _s12_oracle_sql(m: int = 2, k: int = 8, iters: int = 2, dim: int = 64) -> str:
    sd = dim // m
    return (
        _pq_ctes(m, k, iters, dim)
        + f"""
    , pcode AS (
      SELECT vec_id, sub_id, CAST(CAST(o AS BIGINT) % {k} AS INT) AS j FROM paf
    ),
    qsub AS (
      SELECT vec_id AS query_id, mi AS sub_id, iv[mi*{sd}+1 : mi*{sd}+{sd}] AS sv
      FROM en, UNNEST(generate_series(0, {m - 1})) AS g(mi)
      WHERE vec_id < {_S12_NQ}
    ),
    adcp AS (
      SELECT q.query_id, cs.vec_id,
             CAST(SUM(list_dot_product(q.sv, q.sv) - 2 * list_dot_product(q.sv, c.c)
                      + list_dot_product(c.c, c.c)) AS BIGINT) AS adc_dist
      FROM pcode cs
      JOIN pc{iters} c ON cs.sub_id = c.sub_id AND cs.j = c.j
      JOIN qsub q ON q.sub_id = cs.sub_id
      GROUP BY 1, 2
    )
    SELECT query_id, vec_id, adc_dist, rn FROM (
      SELECT query_id, vec_id, adc_dist,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY adc_dist, vec_id) AS rn
      FROM adcp
    ) WHERE rn <= {_S12_TOP}
    """
    )


@query(
    "s12_pq_adc",
    oracle=_s12_oracle_sql(),
    tags=("similarity", "EXT", "ann", "pq", "iterative"),
    doc="Product quantization + ADC top-k (operators.similarity.pq_train/pq_encode/"
    "pq_adc_topk; Jégou et al. 2011 — the FAISS IndexPQ construction): independent "
    "deterministic k-means per contiguous subspace trained as ONE grouped integer-Lloyd "
    "job (subspace id is just a grouping key), vectors encoded to m position-codes in a "
    "zero-shuffle scalar scan, queries ranked by the asymmetric distance (sum of exact "
    "per-subspace LUT entries against the broadcast codebooks — an exact BIGINT, so the "
    "whole train->encode->rank composition hash-verifies with the Lloyd iterations "
    "unrolled as CTE stages).  At 100 TB the codes scan is m bytes/vector vs 4*dim fp32 "
    "(32x at m=8/dim=64) — the axis below SQ8's fixed ~4x; compose with the IVF cell "
    "index for sublinear probes and exact-rescore the shortlist (rescore= path, tested).",
)
def s12_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.similarity import (
        pq_adc_topk,
        pq_encode,
        pq_train,
    )

    en = quantized(spark, sf_dir, widen=True).select("vec_id", "iv")
    books = pq_train(en, m=2, k=8, iters=2)
    codes = pq_encode(en, books).select("vec_id", "codes")
    q = en.filter(F.col("vec_id") < _S12_NQ).select(
        F.col("vec_id").alias("query_id"), F.col("iv").alias("q_iv")
    )
    return pq_adc_topk(q, codes, books, top=_S12_TOP)


def _s13_oracle_sql(m: int = 2, k: int = 8, iters: int = 2, dim: int = 64) -> str:
    """s13 oracle: the IVF assignment CTEs (cells + query routing, s07's) +
    per-cell truncated-integer-mean centers + the grouped-Lloyd PQ CTEs
    trained on the RESIDUALS x − cm(cell) (the Jégou 2011 §IV.A IVFADC
    form) + the asymmetric-cosine shortlist reconstructing x̂ = cm + r̂
    (dot and norm decompose per contiguous subspace, so the cross term is
    a per-cell constant plus per-subspace sums) + the exact rescore — the
    whole IVFPQ probe recomputed from scratch relationally."""
    sd = dim // m
    return (
        _index_assign_ctes("TRUE")
        + f"""
    , cmsum AS (
      SELECT a.cell, t.i AS pos,
             SUM(CAST(en.iv[t.i] AS BIGINT)) AS s, COUNT(*) AS n
      FROM en JOIN assign a USING (vec_id), generate_series(1, {dim}) AS t(i)
      GROUP BY 1, 2
    ),
    cmn AS (
      SELECT cell, cm, list_dot_product(cm, cm) AS cmnorm2 FROM (
        SELECT cell,
               list_transform(list_sort(list(struct_pack(pos := pos,
                 cv := CAST(CASE WHEN s >= 0 THEN s // n ELSE -((-s) // n) END AS DOUBLE)))),
                 x -> x.cv) AS cm
        FROM cmsum GROUP BY cell
      ) t
    ),
    enr AS (
      SELECT en.vec_id,
             list_transform(generate_series(1, {dim}),
                            i -> CAST(en.iv[i] - c.cm[i] AS DOUBLE)) AS iv
      FROM en JOIN assign a USING (vec_id) JOIN cmn c ON c.cell = a.cell
    )"""
        + _pq_ctes(m, k, iters, dim, include_quant=False, src="enr")
        + f"""
    , pcode AS (
      SELECT vec_id, sub_id, CAST(CAST(o AS BIGINT) % {k} AS INT) AS j FROM paf
    ),
    probes AS (
      SELECT vec_id AS query_id, cent_id AS cell
      FROM ranked WHERE crn <= 2 AND vec_id < 5
    ),
    qsub AS (
      SELECT vec_id AS query_id, mi AS sub_id, iv[mi*{sd}+1 : mi*{sd}+{sd}] AS sv
      FROM en, UNNEST(generate_series(0, {m - 1})) AS g(mi)
      WHERE vec_id < 5
    ),
    cand AS (
      SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id, a.cell
      FROM probes p
      JOIN assign a ON a.cell = p.cell AND a.vec_id <> p.query_id
    ),
    adc AS (
      SELECT c.query_id, c.neighbor_id, c.cell,
             SUM(list_dot_product(q.sv, b.c)) AS rdot,
             SUM(2 * list_dot_product(
                   cm.cm[cs.sub_id*{sd}+1 : cs.sub_id*{sd}+{sd}], b.c)
                 + list_dot_product(b.c, b.c)) AS rcross
      FROM cand c
      JOIN pcode cs ON cs.vec_id = c.neighbor_id
      JOIN pc{iters} b ON b.sub_id = cs.sub_id AND b.j = cs.j
      JOIN qsub q ON q.query_id = c.query_id AND q.sub_id = cs.sub_id
      JOIN cmn cm ON cm.cell = c.cell
      GROUP BY 1, 2, 3
    ),
    short AS (
      SELECT query_id, neighbor_id
      FROM (
        SELECT adc.query_id, adc.neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY adc.query_id
                  ORDER BY (list_dot_product(q.iv, cm.cm) + adc.rdot)
                           / (sqrt(q.nrm2) * sqrt(cm.cmnorm2 + adc.rcross)) DESC,
                           adc.neighbor_id ASC) AS srn
        FROM adc
        JOIN en q ON q.vec_id = adc.query_id
        JOIN cmn cm ON cm.cell = adc.cell
      ) t
      WHERE srn <= 20
    ),
    pairs AS (
      SELECT s.query_id, s.neighbor_id,
             list_dot_product(q.iv, c.iv) / (sqrt(q.nrm2) * sqrt(c.nrm2)) AS cosine_sim
      FROM short s
      JOIN en q ON q.vec_id = s.query_id
      JOIN en c ON c.vec_id = s.neighbor_id
    )
    SELECT query_id, neighbor_id, cosine_sim, rn
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine_sim DESC, neighbor_id ASC) AS rn
      FROM pairs
    ) t
    WHERE rn <= 5
    """
    )


@query(
    "s13_ann_index_probe_pq",
    oracle=_s13_oracle_sql(),
    tags=("similarity", "EXT", "ann", "ivf", "pq", "index"),
    doc="IVFPQ probe in the published IVFADC form (operators.similarity."
    "ann_index_build_pq/ann_index_probe_pq; Jégou et al. 2011 §IV.A): the persisted IVF "
    "index additionally stores trained PQ codebooks and m-byte codes under the SAME cell "
    "partitioning — and the codes encode the RESIDUAL x − cm(cell) against the cell's "
    "truncated-integer-mean center (pq_cellmeans/), so codebook capacity describes local "
    "structure instead of re-encoding cell offsets (why IVFADC holds recall at small m; "
    "measured residual ≥ raw at every m in tools/pq_sweep.py).  A probe prunes to its "
    "probed cells, scans m bytes/vector (32x under fp32 at m=8 — the rung below SQ8's "
    "~4x), ranks by the asymmetric cosine of the reconstruction cm + r̂ (per-query LUT "
    "dot + per-cell cross LUT for the norm — all exact-integer doubles, one scalar "
    "zip_with per code row, no explode), keeps a 20-deep shortlist and exact-rescores "
    "only the shortlist against the full-precision layout.  Reported scores are exact; "
    "the oracle recomputes quantizer, cell means, residual codebooks (grouped-Lloyd "
    "CTEs), codes, shortlist and rescore from scratch.",
)
def s13_ann_index_probe_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.similarity import (
        ann_index_build_pq,
        ann_index_for,
        ann_index_probe_pq,
    )

    en = quantized(spark, sf_dir)
    idx = ann_index_for(
        spark, sf_dir, en, variant="pqr", builder=lambda d: ann_index_build_pq(en, d)
    )
    qs = en.filter(F.col("vec_id") < 5).select("vec_id", "iv", "nrm2")
    return ann_index_probe_pq(spark, idx, qs, k=5, nprobe=2, shortlist=20)


def _s14_oracle_sql(m: int = 2, k: int = 8, iters: int = 2, dim: int = 64) -> str:
    """s14 oracle: the OPQ dimension permutation recomputed relationally —
    per-dim exact variance proxy n·Σx² − (Σx)² (HUGEINT), rank DESC with
    dim-ascending tie-break, snake-deal ranks across the m subspaces,
    dims sorted ascending within a subspace — then the grouped-Lloyd PQ
    CTEs over the PERMUTED vectors and the same ADC tail as s12 (queries
    permuted identically)."""
    sd = dim // m
    return (
        _QUANT_SQL
        + f"""
    , vstat AS (
      SELECT t.i AS pos,
             SUM(CAST(en.iv[t.i] AS HUGEINT)) AS s,
             SUM(CAST(en.iv[t.i] AS HUGEINT) * CAST(en.iv[t.i] AS HUGEINT)) AS s2,
             COUNT(*) AS n
      FROM en, generate_series(1, {dim}) AS t(i)
      GROUP BY t.i
    ),
    vrank AS (
      SELECT pos - 1 AS d,
             ROW_NUMBER() OVER (ORDER BY (n * s2 - s * s) DESC, pos ASC) - 1 AS rnk
      FROM vstat
    ),
    vsub AS (
      SELECT d,
             CASE WHEN (rnk // {m}) % 2 = 0 THEN rnk % {m}
                  ELSE {m} - 1 - (rnk % {m}) END AS j
      FROM vrank
    ),
    perm AS (SELECT list(d ORDER BY j, d) AS p FROM vsub),
    enp AS (
      SELECT en.vec_id, list_transform(perm.p, d -> en.iv[d + 1]) AS iv
      FROM en, perm
    )"""
        + _pq_ctes(m, k, iters, dim, include_quant=False, src="enp")
        + f"""
    , pcode AS (
      SELECT vec_id, sub_id, CAST(CAST(o AS BIGINT) % {k} AS INT) AS j FROM paf
    ),
    qsub AS (
      SELECT vec_id AS query_id, mi AS sub_id, iv[mi*{sd}+1 : mi*{sd}+{sd}] AS sv
      FROM enp, UNNEST(generate_series(0, {m - 1})) AS g(mi)
      WHERE vec_id < {_S12_NQ}
    ),
    adcp AS (
      SELECT q.query_id, cs.vec_id,
             CAST(SUM(list_dot_product(q.sv, q.sv) - 2 * list_dot_product(q.sv, c.c)
                      + list_dot_product(c.c, c.c)) AS BIGINT) AS adc_dist
      FROM pcode cs
      JOIN pc{iters} c ON cs.sub_id = c.sub_id AND cs.j = c.j
      JOIN qsub q ON q.sub_id = cs.sub_id
      GROUP BY 1, 2
    )
    SELECT query_id, vec_id, adc_dist, rn FROM (
      SELECT query_id, vec_id, adc_dist,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY adc_dist, vec_id) AS rn
      FROM adcp
    ) WHERE rn <= {_S12_TOP}
    """
    )


@query(
    "s14_pq_adc_opq",
    oracle=_s14_oracle_sql(),
    tags=("similarity", "EXT", "ann", "pq", "opq", "iterative"),
    doc="OPQ-rotated PQ + ADC top-k (operators.similarity.pq_dim_permutation + "
    "pq_train/pq_encode/pq_adc_topk(rotate=); the integer-friendly rung of Ge et al. "
    "2013): dimensions ranked by their EXACT per-dim variance proxy n*Sum(x^2)-(Sum x)^2 "
    "and snake-dealt across subspaces so quantization error balances — a permutation is "
    "orthogonal, so L2/ADC exactness survives and the whole permute->train->encode->rank "
    "composition hash-verifies with the permutation itself recomputed relationally "
    "(window-ranked variance + snake-assignment CTEs).  Train/encode/rank all read the "
    "permuted vector as ONE scalar projection — same zero-shuffle scan shapes as s12, "
    "same m-bytes-per-vector candidate economics; the recall delta vs plain contiguous "
    "splitting is measured per (m,k) config in tools/pq_sweep.py (opq_adc rows).",
)
def s14_pq_adc_opq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.similarity import (
        pq_adc_topk,
        pq_dim_permutation,
        pq_encode,
        pq_train,
    )

    en = quantized(spark, sf_dir, widen=True).select("vec_id", "iv")
    perm = pq_dim_permutation(en, m=2)
    books = pq_train(en, m=2, k=8, iters=2, rotate=perm)
    codes = pq_encode(en, books, rotate=perm).select("vec_id", "codes")
    q = en.filter(F.col("vec_id") < _S12_NQ).select(
        F.col("vec_id").alias("query_id"), F.col("iv").alias("q_iv")
    )
    return pq_adc_topk(q, codes, books, top=_S12_TOP, rotate=perm)


def _s15_oracle_sql(m: int = 2, k: int = 8, iters: int = 2, dim: int = 64) -> str:
    """s15 oracle: s13's full IVFADC chain (quantizer, cell means, residuals,
    grouped-Lloyd codebooks, shortlist, rescore) with the OPQ permutation
    rung threaded through the persisted layout — the permutation is
    recomputed relationally from the RESIDUALS' exact variance proxy (s14's
    CTEs over enr instead of en), the codebooks train on the permuted
    residuals, and the shortlist LUTs slice the PERMUTED query and PERMUTED
    cell means (a permutation is orthogonal, so the dot/norm decomposition
    and the exact rescore are unchanged)."""
    sd = dim // m
    return (
        _index_assign_ctes("TRUE")
        + f"""
    , cmsum AS (
      SELECT a.cell, t.i AS pos,
             SUM(CAST(en.iv[t.i] AS BIGINT)) AS s, COUNT(*) AS n
      FROM en JOIN assign a USING (vec_id), generate_series(1, {dim}) AS t(i)
      GROUP BY 1, 2
    ),
    cmn AS (
      SELECT cell, cm, list_dot_product(cm, cm) AS cmnorm2 FROM (
        SELECT cell,
               list_transform(list_sort(list(struct_pack(pos := pos,
                 cv := CAST(CASE WHEN s >= 0 THEN s // n ELSE -((-s) // n) END AS DOUBLE)))),
                 x -> x.cv) AS cm
        FROM cmsum GROUP BY cell
      ) t
    ),
    enr AS (
      SELECT en.vec_id,
             list_transform(generate_series(1, {dim}),
                            i -> CAST(en.iv[i] - c.cm[i] AS DOUBLE)) AS iv
      FROM en JOIN assign a USING (vec_id) JOIN cmn c ON c.cell = a.cell
    ),
    rvstat AS (
      SELECT t.i AS pos,
             SUM(CAST(enr.iv[t.i] AS HUGEINT)) AS s,
             SUM(CAST(enr.iv[t.i] AS HUGEINT) * CAST(enr.iv[t.i] AS HUGEINT)) AS s2,
             COUNT(*) AS n
      FROM enr, generate_series(1, {dim}) AS t(i)
      GROUP BY t.i
    ),
    rvrank AS (
      SELECT pos - 1 AS d,
             ROW_NUMBER() OVER (ORDER BY (n * s2 - s * s) DESC, pos ASC) - 1 AS rnk
      FROM rvstat
    ),
    rvsub AS (
      SELECT d,
             CASE WHEN (rnk // {m}) % 2 = 0 THEN rnk % {m}
                  ELSE {m} - 1 - (rnk % {m}) END AS j
      FROM rvrank
    ),
    perm AS (SELECT list(d ORDER BY j, d) AS p FROM rvsub),
    enrp AS (
      SELECT enr.vec_id, list_transform(perm.p, d -> enr.iv[d + 1]) AS iv
      FROM enr, perm
    )"""
        + _pq_ctes(m, k, iters, dim, include_quant=False, src="enrp")
        + f"""
    , pcode AS (
      SELECT vec_id, sub_id, CAST(CAST(o AS BIGINT) % {k} AS INT) AS j FROM paf
    ),
    probes AS (
      SELECT vec_id AS query_id, cent_id AS cell
      FROM ranked WHERE crn <= 2 AND vec_id < 5
    ),
    enp AS (
      SELECT en.vec_id, list_transform(perm.p, d -> en.iv[d + 1]) AS iv
      FROM en, perm
    ),
    qsub AS (
      SELECT vec_id AS query_id, mi AS sub_id, iv[mi*{sd}+1 : mi*{sd}+{sd}] AS sv
      FROM enp, UNNEST(generate_series(0, {m - 1})) AS g(mi)
      WHERE vec_id < 5
    ),
    cmp AS (
      SELECT cell, list_transform(perm.p, d -> cmn.cm[d + 1]) AS cmp
      FROM cmn, perm
    ),
    cand AS (
      SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id, a.cell
      FROM probes p
      JOIN assign a ON a.cell = p.cell AND a.vec_id <> p.query_id
    ),
    adc AS (
      SELECT c.query_id, c.neighbor_id, c.cell,
             SUM(list_dot_product(q.sv, b.c)) AS rdot,
             SUM(2 * list_dot_product(
                   cp.cmp[cs.sub_id*{sd}+1 : cs.sub_id*{sd}+{sd}], b.c)
                 + list_dot_product(b.c, b.c)) AS rcross
      FROM cand c
      JOIN pcode cs ON cs.vec_id = c.neighbor_id
      JOIN pc{iters} b ON b.sub_id = cs.sub_id AND b.j = cs.j
      JOIN qsub q ON q.query_id = c.query_id AND q.sub_id = cs.sub_id
      JOIN cmp cp ON cp.cell = c.cell
      GROUP BY 1, 2, 3
    ),
    short AS (
      SELECT query_id, neighbor_id
      FROM (
        SELECT adc.query_id, adc.neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY adc.query_id
                  ORDER BY (list_dot_product(q.iv, cm.cm) + adc.rdot)
                           / (sqrt(q.nrm2) * sqrt(cm.cmnorm2 + adc.rcross)) DESC,
                           adc.neighbor_id ASC) AS srn
        FROM adc
        JOIN en q ON q.vec_id = adc.query_id
        JOIN cmn cm ON cm.cell = adc.cell
      ) t
      WHERE srn <= 20
    ),
    pairs AS (
      SELECT s.query_id, s.neighbor_id,
             list_dot_product(q.iv, c.iv) / (sqrt(q.nrm2) * sqrt(c.nrm2)) AS cosine_sim
      FROM short s
      JOIN en q ON q.vec_id = s.query_id
      JOIN en c ON c.vec_id = s.neighbor_id
    )
    SELECT query_id, neighbor_id, cosine_sim, rn
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine_sim DESC, neighbor_id ASC) AS rn
      FROM pairs
    ) t
    WHERE rn <= 5
    """
    )


@query(
    "s15_ann_index_probe_pq_rotated",
    oracle=_s15_oracle_sql(),
    tags=("similarity", "EXT", "ann", "ivf", "pq", "opq", "index"),
    doc="IVFPQ probe with the OPQ permutation rung threaded through the PERSISTED "
    "layout (operators.similarity.ann_index_build_pq(rotate=True) + ann_index_probe_pq; "
    "Jégou 2011 §IV.A + the permutation rung of Ge 2013): the build derives the "
    "variance-balancing dimension permutation FROM THE RESIDUALS (what the codebooks "
    "actually encode), persists it as pq_perm/ frozen like the cell means, and trains/"
    "encodes in the permuted space; the probe auto-detects pq_perm/ and slices its "
    "per-query dot LUT and per-cell cross LUT from the permuted query and permuted cell "
    "means — a permutation is orthogonal, so every score stays an exact-integer double "
    "and the exact rescore still reads original vectors.  Appends encode against the "
    "frozen permutation (old and new codes decodable by one codebook set — "
    "frozen-permutation contract pytest-pinned); pq_meta/ records (m, k, iters, "
    "residual, rotated) so rebuild re-trains with the ORIGINAL settings.  The oracle "
    "recomputes quantizer, cell means, residual variance ranking, snake-dealt "
    "permutation, permuted-residual codebooks, shortlist, and rescore from scratch.",
)
def s15_ann_index_probe_pq_rotated(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.similarity import (
        ann_index_build_pq,
        ann_index_for,
        ann_index_probe_pq,
    )

    en = quantized(spark, sf_dir)
    idx = ann_index_for(
        spark,
        sf_dir,
        en,
        variant="pqrot",
        builder=lambda d: ann_index_build_pq(en, d, rotate=True),
    )
    qs = en.filter(F.col("vec_id") < 5).select("vec_id", "iv", "nrm2")
    return ann_index_probe_pq(spark, idx, qs, k=5, nprobe=2, shortlist=20)
