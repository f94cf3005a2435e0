"""[EXT] Deduplication operators over ``documents`` / ``embeddings`` (SURVEY.md §7.8).

Four families, as first-class queries:
- exact (hash-groupBy on a normalized fingerprint)      -> dd01 (oracle-checked)
- n-gram Jaccard near-dup (shingle explode + self-join) -> dd02 (oracle-checked)
- embedding-cosine near-dup (quantized exact math)      -> dd03 (oracle-checked)
- MinHash-LSH and SimHash fast paths (xxhash64)         -> dd04/dd05 (hash values
  are Spark-specific, so the hash-checked contract is INVARIANT SUMMARIES in the
  q35/q36 style: engine-independent counts plus booleans the oracle asserts —
  exact-dup pairs collide in all LSH bands / get identical SimHash signatures,
  bounds hold, signatures are bag-of-tokens functions. Raw pair/signature
  surfaces remain available via operators.dedup_corpus.minhash_pairs("fast").)
- portable MinHash-LSH / SimHash                        -> dd06/dd07 (oracle-
  checked: md5-derived hashes + LCG affine permutations / bit-majority votes
  make candidate pairs and signatures bit-identical across engines; dd04/dd05
  stay as the xxhash64 fast paths.)
- cluster formation (connected components + canonical)  -> dd08 (over the
  PORTABLE dd06 pairs, so the full cluster table is value-hash-verified
  against a DuckDB recursive-CTE transitive closure; the iterative fixpoint
  is additionally pytest-verified against a union-find oracle.)
- the PRODUCTION front door (exact -> LSH pairs ->
  components -> canonical filter)                       -> dd09 (oracle-checked
  end-to-end via a DuckDB recursive-CTE transitive closure; the composed
  pipeline lives in operators.dedup_corpus.)

Scale notes: dd02's shingle self-join caps shingle document-frequency (stop-
shingle removal) so a hot shingle cannot produce a quadratic pair explosion;
dd04 is the 100 TB path (candidate generation is linear in corpus size,
pairs only form inside LSH buckets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from healthcare_data_pipeline_spark.catalog import table
from healthcare_data_pipeline_spark.operators.dedup_corpus import (
    PMH_A,
    PMH_B,
    PMH_BANDS,
    PMH_N,
    PMH_PRIME,
    WORD_3GRAMS_SQL,
    dedup_corpus,
    portable_minhash_pairs,
)
from healthcare_data_pipeline_spark.queries import query
from healthcare_data_pipeline_spark.queries.similarity import _QUANT_SQL, quantized

# Max document-frequency for a shingle to participate in pair generation
# (single source of truth in the operator module).
from healthcare_data_pipeline_spark.operators.dedup_corpus import MAX_SHINGLE_DF  # noqa: E402

# SQL fragment: first 8 hex chars of md5(s) as a BIGINT (DuckDB lacks a
# hex-literal cast, so parse pairwise with strpos over the hex alphabet).
_SQL_H32 = " + ".join(
    f"(strpos('0123456789abcdef', substr(md5(s), {i + 1}, 1)) - 1) * {16 ** (7 - i)}"
    for i in range(8)
)


@query(
    "dd01_exact_dedup",
    oracle="""
    SELECT md5(regexp_replace(lower(text), '[ \\t\\n\\r\\f\\x0B]+', ' ', 'g')) AS fingerprint,
           COUNT(*) AS n_copies,
           MIN(doc_id) AS canonical_id
    FROM documents
    GROUP BY 1
    """,
    tags=("dedup", "EXT", "exact"),
    doc="Exact dedup: normalized-text fingerprint hash-groupBy; keeps the smallest doc_id as "
    "canonical. One shuffle on the fingerprint; at 100 TB this is the cheapest dedup pass.",
)
def dd01_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    fp = F.md5(F.regexp_replace(F.lower(F.col("text")), r"[ \t\n\r\f\x0B]+", " "))
    return (
        d.select(fp.alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_copies"), F.min("doc_id").alias("canonical_id"))
    )


@query(
    "dd02_jaccard_pairs",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(text), '[ \\t\\n\\r\\f\\x0B]+') AS toks
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, s
      FROM (
        SELECT doc_id,
               unnest(list_transform(
                 generate_series(1, greatest(len(toks) - 2, 0)),
                 i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
               )) AS s
        FROM t
      )
    ),
    keep AS (
      SELECT s FROM sh GROUP BY s HAVING COUNT(*) <= {MAX_SHINGLE_DF}
    ),
    shk AS (
      SELECT sh.doc_id, sh.s FROM sh JOIN keep USING (s)
    ),
    sizes AS (
      SELECT doc_id, COUNT(*) AS n_sh FROM shk GROUP BY doc_id
    ),
    inter AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS n_common
      FROM shk a JOIN shk b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT i.d1, i.d2, i.n_common,
           CAST(i.n_common AS DOUBLE)
             / CAST(s1.n_sh + s2.n_sh - i.n_common AS DOUBLE) AS jaccard
    FROM inter i
    JOIN sizes s1 ON i.d1 = s1.doc_id
    JOIN sizes s2 ON i.d2 = s2.doc_id
    WHERE CAST(i.n_common AS DOUBLE)
          / CAST(s1.n_sh + s2.n_sh - i.n_common AS DOUBLE) >= 0.05
    """,
    tags=("dedup", "EXT", "jaccard"),
    doc="n-gram Jaccard near-dup: word-3-gram shingles (DF-capped), shingle-equality self-join "
    "for intersections, exact Jaccard >= 0.05 pairs.",
)
def dd02_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.dedup_corpus import (
        df_capped_shingles,
    )

    d = table(spark, sf_dir, "documents")
    shk = df_capped_shingles(d)
    sizes = shk.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = shk.select(F.col("doc_id").alias("d1"), "s")
    b = shk.select(F.col("doc_id").alias("d2"), "s")
    inter = (
        a.join(b, "s")
        .filter(F.col("d1") < F.col("d2"))
        .groupBy("d1", "d2")
        .agg(F.count("*").alias("n_common"))
    )
    s1 = sizes.select(F.col("doc_id").alias("d1"), F.col("n_sh").alias("n_sh1"))
    s2 = sizes.select(F.col("doc_id").alias("d2"), F.col("n_sh").alias("n_sh2"))
    jac = F.col("n_common").cast("double") / (
        F.col("n_sh1") + F.col("n_sh2") - F.col("n_common")
    ).cast("double")
    return (
        inter.join(s1, "d1")
        .join(s2, "d2")
        .select("d1", "d2", "n_common", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.05)
    )


@query(
    "dd16_containment_pairs",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(text), '[ \\t\\n\\r\\f\\x0B]+') AS toks
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, s
      FROM (
        SELECT doc_id,
               unnest(list_transform(
                 generate_series(1, greatest(len(toks) - 2, 0)),
                 i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
               )) AS s
        FROM t
      )
    ),
    keep AS (
      SELECT s FROM sh GROUP BY s HAVING COUNT(*) <= {MAX_SHINGLE_DF}
    ),
    shk AS (
      SELECT sh.doc_id, sh.s FROM sh JOIN keep USING (s)
    ),
    sizes AS (
      SELECT doc_id, COUNT(*) AS n_sh FROM shk GROUP BY doc_id
    ),
    inter AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS n_common
      FROM shk a JOIN shk b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs2 AS (
      SELECT i.d1, i.d2, i.n_common, s1.n_sh AS n_sh1, s2.n_sh AS n_sh2
      FROM inter i
      JOIN sizes s1 ON i.d1 = s1.doc_id
      JOIN sizes s2 ON i.d2 = s2.doc_id
    )
    SELECT contained, container, n_common, containment FROM (
      SELECT d1 AS contained, d2 AS container, n_common,
             CAST(n_common AS DOUBLE) / CAST(n_sh1 AS DOUBLE) AS containment
      FROM pairs2
      UNION ALL
      SELECT d2, d1, n_common,
             CAST(n_common AS DOUBLE) / CAST(n_sh2 AS DOUBLE)
      FROM pairs2
    ) WHERE containment >= 0.5
    """,
    tags=("dedup", "EXT", "containment"),
    doc="Asymmetric containment near-dup (operators.dedup_corpus.containment_pairs): "
    "|A∩B|/|A| over DF-capped word-3-gram shingle sets — the doc-embedded-in-doc case "
    "(boilerplate wrapping, quote expansion) that resemblance measures miss by "
    "construction (a doc fully contained in a 10x larger one has Jaccard ~0.1, and "
    "MinHash-LSH collides with probability ~J). Same bounded shingle-equality join as "
    "dd02; at 100 TB run per LSH bucket or per dd09 cluster, not corpus-wide.",
)
def dd16_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.dedup_corpus import containment_pairs

    return containment_pairs(table(spark, sf_dir, "documents"), threshold=0.5)


@query(
    "dd03_embedding_neardup",
    oracle=_QUANT_SQL
    + """
    SELECT a.vec_id AS d1, b.vec_id AS d2,
           list_dot_product(a.iv, b.iv) / (sqrt(a.nrm2) * sqrt(b.nrm2)) AS cosine_sim
    FROM en a JOIN en b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.iv, b.iv) / (sqrt(a.nrm2) * sqrt(b.nrm2)) >= 0.8
    """,
    tags=("dedup", "EXT", "embedding"),
    doc="Embedding-cosine near-duplicate pairs (sim >= 0.8) via quantized exact math. "
    "CORRECTNESS BASELINE ONLY (O(N^2) theta self-join): production dedup goes through "
    "operators.dedup_corpus.dedup_corpus (dd09) and the LSH-bucketed candidate paths "
    "(dd06/s05), which never form an all-pairs join.",
)
def dd03_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.functions import dot_unrolled
    from healthcare_data_pipeline_spark.operators.similarity import EMBED_DIM

    # r15: the theta join has no equi key, so it can only be a nested-loop
    # join — make it the PARALLEL one.  Without the hint the planner
    # broadcast whichever side it liked and streamed the other through the
    # scan's single row-group task (the whole n^2/2 loop on ONE core,
    # ~27 s at sf0.1); broadcasting b explicitly and widening the streamed
    # side runs the loop on every core (~3.2 s).  dot_unrolled halves the
    # remaining per-pair cost (no interpreted fold / no zip_with allocation
    # on the dim-64 fast path) — bit-identical by the guarded-CASE contract.
    # Scale bound: the broadcast side is the WHOLE embeddings relation,
    # which only fits because this entry is the documented O(N^2)
    # correctness baseline over a bounded slice — production near-dup goes
    # through dd09/dd06/s05; at corpus scale the broadcast (8 GB cap) fails
    # loudly rather than silently serializing.
    a = quantized(spark, sf_dir, widen=True).select(
        F.col("vec_id").alias("d1"), F.col("iv").alias("a_iv"), F.col("nrm2").alias("a_n")
    )
    b = F.broadcast(
        quantized(spark, sf_dir).select(
            F.col("vec_id").alias("d2"), F.col("iv").alias("b_iv"), F.col("nrm2").alias("b_n")
        )
    )
    dot = dot_unrolled(F.col("a_iv"), F.col("b_iv"), dim_hint=EMBED_DIM)
    sim = dot / (F.sqrt(F.col("a_n")) * F.sqrt(F.col("b_n")))
    return (
        a.join(b, F.col("d1") < F.col("d2"))
        .select("d1", "d2", sim.alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= 0.8)
    )


N_MINHASH = 16
LSH_BANDS = 4  # 4 bands x 4 rows

# Fast-path MinHash permutation family: affine transforms of ONE xxhash64 per
# shingle (engine-specific because xxhash64 is; distinct LCG seed range from
# the portable PMH_A/PMH_B family so the two schemes never collide).
from healthcare_data_pipeline_spark.operators.dedup_corpus import _pmh_const

FMH_PRIME = 2147483647
FMH_A = [_pmh_const(3000 + j, 1, 1_000_000) * 2 + 1 for j in range(N_MINHASH)]
FMH_B = [_pmh_const(4000 + j, 0, FMH_PRIME) for j in range(N_MINHASH)]


def _fast_minhash_sig(
    spark: SparkSession, sf_dir: str, with_fingerprint: bool = False
) -> DataFrame:
    """(doc_id[, f], mh0..mh15) xxhash64 MinHash signatures — the shared
    subtree of dd04's candidate generation AND its invariant checks.  With
    ``with_fingerprint`` the whitespace-normalized md5 fingerprint is computed
    from the SAME token array in the SAME pass (``array_join(toks, ' ')`` ==
    the collapsed+trimmed normalized text for EVERY whitespace shape, because
    the tokens are derived by splitting that exact normalized string), so
    dd04 needs no second documents scan or fingerprint join.  Only docs with
    >= 3 tokens appear (3-gram shingles exist) — exactly the oracle's
    fingerprint-population filter."""
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    # Small-scan parallelism gate: a sub-core-count input (one parquet row
    # group locally) would run the CPU-heavy shingle explode + hashing on a
    # single task.  Repartitioning by doc_id here REPLACES the post-explode
    # groupBy shuffle (hash(doc_id) satisfies the agg's clustering), moving
    # raw text once instead; the gate keeps it a no-op at scale, where input
    # splits already exceed core count and map-side partial mins make the
    # post-explode shuffle the far cheaper one.
    target = spark.sparkContext.defaultParallelism
    if d.rdd.getNumPartitions() < target:
        d = d.repartition(target, "doc_id")
    # Oracle-exact token derivation: collapse ALL whitespace runs to single
    # spaces FIRST, then trim, then split on the single space.  Spark's trim
    # strips only ASCII spaces, so the naive split(lower(trim(text)), '[ \t\n\r\f\x0B]+')
    # injects empty edge tokens when text starts/ends with tabs or newlines —
    # and md5(array_join(toks,' ')) would then diverge from the oracle's
    # md5(trim(regexp_replace(lower(text),'[ \t\n\r\f\x0B]+',' '))) on such data.  This
    # form makes the fingerprint (and the shingle set) identical to the
    # normalized text for EVERY whitespace shape.  The class is spelled out
    # instead of \s because the engines' \s differ by exactly one character:
    # Java \s includes \x0B (vertical tab), RE2's (DuckDB) does not — \s on
    # both sides silently diverges on \x0B-edged text (r7 ADVICE; the same
    # explicit class is used at every oracle-paired tokenization site).
    sh = d.selectExpr(
        "doc_id",
        "split(trim(regexp_replace(lower(text), '[ \\\\t\\\\n\\\\r\\\\f\\\\x0B]+', ' ')), ' ') AS toks",
    )
    if with_fingerprint:
        sh = sh.selectExpr("doc_id", "md5(array_join(toks, ' ')) AS f", "toks")
    keys = ["doc_id", "f"] if with_fingerprint else ["doc_id"]
    # explode_OUTER + null filter, not plain explode (r15, the _fast_simhash
    # fix): an inner explode's inferred ``size(...) > 0`` filter substitutes
    # the ENTIRE shingle construction (normalize + split + 3-gram transform)
    # and pushes it below the repartition — single-task at sf scale.  Outer
    # generates infer nothing; <3-token docs (empty shingle array) emit one
    # NULL row each, dropped by the cheap generated-column filter — exactly
    # the docs the inner explode dropped.
    # r16 adjudication (the r15 verdict's dd04 item): interleaved A/B of
    # inner explode vs this outer form measured FLAT on steal-clean minima
    # (1.461 vs 1.452 s) — the r15 driver-box regression does not reproduce
    # as a mechanism effect; outer kept for the scale reason (no inferred
    # filter re-running the shingle construction below the repartition).
    sh = sh.selectExpr(
        *keys, f"explode_outer(array_distinct({WORD_3GRAMS_SQL})) AS s"
    ).filter(F.col("s").isNotNull())
    # Standard MinHash construction: hash each shingle ONCE (xxhash64, the
    # engine-fast path), then drive all N permutations as affine transforms of
    # that one value — 1 string hash + N multiply-add-mods per shingle instead
    # of N string hashes.  pmod clamps to 31 bits so a*h+b stays < 2^52.
    h = F.pmod(F.xxhash64(F.col("s")), F.lit(2147483648)).alias("h")
    return sh.select(*keys, h).groupBy(*keys).agg(
        *[
            F.min(
                (F.lit(FMH_A[i]).cast("long") * F.col("h") + F.lit(FMH_B[i])) % FMH_PRIME
            ).alias(f"mh{i}")
            for i in range(N_MINHASH)
        ]
    )


def _dd04_invariant_sql() -> str:
    """The whole post-signature dd04 plan as ONE SQL statement over the
    cached signature view (``dd04_sig``) and the pruned source-id view
    (``dd04_docids``).  Semantically identical to the former chain of
    DataFrame calls (band explode -> bucket self-join -> pair invariants;
    fingerprint groups -> combinatorial dup count), but issued as a single
    statement so Catalyst analyzes the tree ONCE — the incremental
    per-DataFrame-call analysis of the old form cost ~0.6s of driver time
    per bench rep at sf0.1, pure fixed overhead that the single parse+
    analyze collapses to ~0.1s.  The candidate generation is identical to
    ``operators.dedup_corpus.minhash_pairs`` with ``hasher='fast'``."""
    rpb = N_MINHASH // LSH_BANDS
    band_structs = ", ".join(
        "named_struct('band', {bi}, 'bucket', xxhash64({cols}))".format(
            bi=bi, cols=", ".join(f"mh{bi * rpb + r}" for r in range(rpb))
        )
        for bi in range(LSH_BANDS)
    )
    mh_cols = ", ".join(f"mh{i}" for i in range(N_MINHASH))
    return f"""
    WITH bands AS (
      SELECT doc_id, bb.band AS band, bb.bucket AS bucket
      FROM dd04_sig LATERAL VIEW explode(array({band_structs})) AS bb
    ),
    pairs AS (  -- LSH candidate pairs: band-bucket equi-join, linear in corpus size
      SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS n_shared_bands
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    pair_agg AS (
      -- Pair-level invariants in ONE aggregate; id validity via two left
      -- lookups against the SOURCE relation's doc_id (one pruned column,
      -- AQE-broadcast) — NOT against the cached sig ids, which would be
      -- tautologically true (the pairs were generated from sig) and could
      -- never catch an id-corruption bug in the band pipeline.
      SELECT MIN(p.n_shared_bands BETWEEN 1 AND {LSH_BANDS}) AS bands_bounded,
             MIN(p.d1 < p.d2) AS pairs_ordered,
             MIN(COALESCE(k1.doc_id IS NOT NULL AND k2.doc_id IS NOT NULL,
                          FALSE)) AS ids_valid
      FROM pairs p
      LEFT JOIN dd04_docids k1 ON p.d1 = k1.doc_id
      LEFT JOIN dd04_docids k2 ON p.d2 = k2.doc_id
    ),
    fgroups AS (
      -- Exact-dup invariants WITHOUT a fingerprint self-join or full-outer
      -- pair merge (the r4 perf regression): group the >=3-token docs
      -- (exactly the docs in sig — 3-gram shingles exist) by normalized
      -- fingerprint; a multi-doc group must carry ONE distinct signature
      -- (min==max per permutation).  Identical signature => identical band
      -- buckets => the pair is in the candidate set with all bands shared —
      -- the deterministic LSH guarantee, checked per-group instead of
      -- per-pair.
      SELECT f, COUNT(*) AS n,
             MIN(struct({mh_cols})) AS sig_lo, MAX(struct({mh_cols})) AS sig_hi
      FROM dd04_sig GROUP BY f
    ),
    dup_agg AS (
      -- n*(n-1)/2 == the oracle's equal-f a.doc_id<b.doc_id join count
      SELECT CAST(SUM(n * (n - 1) / 2) AS BIGINT) AS n_exact_dup_pairs,
             MIN(CASE WHEN n >= 2 THEN sig_lo = sig_hi ELSE TRUE END)
               AS exact_dups_all_bands
      FROM fgroups
    )
    -- 1x1 scalar cross join; empty-corpus guard (zero-row aggs yield nulls)
    SELECT COALESCE(n_exact_dup_pairs, CAST(0 AS BIGINT)) AS n_exact_dup_pairs,
           COALESCE(bands_bounded, TRUE) AS bands_bounded,
           COALESCE(pairs_ordered, TRUE) AS pairs_ordered,
           COALESCE(ids_valid, TRUE) AS ids_valid,
           COALESCE(exact_dups_all_bands, TRUE) AS exact_dups_all_bands
    FROM pair_agg CROSS JOIN dup_agg
    """


@query(
    "dd04_minhash_lsh",
    oracle="""
    WITH fp AS (
      SELECT doc_id, md5(trim(regexp_replace(lower(text), '[ \\t\\n\\r\\f\\x0B]+', ' ', 'g'))) AS f
      FROM documents
      WHERE length(trim(regexp_replace(lower(text), '[ \\t\\n\\r\\f\\x0B]+', ' ', 'g')))
            - length(replace(trim(regexp_replace(lower(text), '[ \\t\\n\\r\\f\\x0B]+', ' ', 'g')), ' ', '')) >= 2
    ),
    dups AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2
      FROM fp a JOIN fp b ON a.f = b.f AND a.doc_id < b.doc_id
    )
    SELECT (SELECT COUNT(*) FROM dups) AS n_exact_dup_pairs,
           TRUE AS bands_bounded,
           TRUE AS pairs_ordered,
           TRUE AS ids_valid,
           TRUE AS exact_dups_all_bands
    """,
    tags=("dedup", "EXT", "minhash", "invariant-oracle"),
    doc="MinHash+LSH fast path (16 xxhash64 permutations over word-3-gram shingles, 4 bands "
    "x 4 rows, band-bucket join; candidate generation linear in corpus size — the 100 TB "
    "near-dup path). xxhash64 is engine-specific, so the hash-checked contract is the "
    "INVARIANTS of the pair set, q35/q36-style: shared-band counts within [1,4], pairs "
    "ordered d1<d2 over valid doc ids, and — the deterministic LSH guarantee — every "
    "exact-duplicate pair (identical normalized text, >= 3 tokens so shingles exist; "
    "computable in ANY engine) collides in ALL 4 bands. The oracle recomputes the exact-dup "
    "pair count independently and asserts every boolean holds.",
)
def dd04_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ONE pass computes signatures AND the normalized fingerprint (same token
    # array), cached so the three consumers (two band self-join sides,
    # fingerprint groups) read one materialization instead of re-running the
    # shingle explode per branch — the r5 regression was exactly that: 6
    # documents scans, 0 ReusedExchange.  The cache is n_docs x 17 small
    # columns, bounded and session-scoped; serialized MEMORY_ONLY because the
    # deserialized default's population cost exceeded what the 3 reads saved
    # (the r6 "dd04 slower than r4" regression).
    #
    # COST RECONCILIATION (the r7 verdict item — BENCH_r07 2.34s vs a
    # docstring claiming 1.31s): the 1.31s was min-of-3 EXECUTION time of an
    # already-built DataFrame; a bench rep pays fn-build + execution, and
    # driver-side Catalyst analysis of the old ~15-call DataFrame chain cost
    # ~1.0s per rep on top of ~1.4s cold execution — which is the official
    # 2.3-2.5s, load permitting.  Hence this form: the post-signature plan is
    # ONE spark.sql statement (single parse+analyze, ~0.1s), measured
    # bench-style (fresh build + cold cache, quiet box, sf0.1) at 1.26-1.57s
    # vs 1.59-1.60s for the DataFrame chain.  Execution plan is unchanged.
    # In the FULL bench (sharing the session with 13 preceding queries'
    # residual load and GC) the same code measures ~2.0-2.3s — that
    # in-context number is what BENCH_r{N}.json records, and the honest one
    # to compare across rounds.
    from pyspark import StorageLevel

    sig = _fast_minhash_sig(spark, sf_dir, with_fingerprint=True).persist(
        StorageLevel.MEMORY_ONLY
    )
    sig.createOrReplaceTempView("dd04_sig")
    table(spark, sf_dir, "documents").select("doc_id").createOrReplaceTempView(
        "dd04_docids"
    )
    return spark.sql(_dd04_invariant_sql())


def _fast_simhash(
    docs: DataFrame, text_expr: F.Column, with_fingerprint: bool = False
) -> DataFrame:
    """(doc_id[, f], simhash) — per-token xxhash64, signed bit-majority vote
    over bits 0..62, reassembled to a non-negative bigint signature.  One
    explode + one groupBy.  ``with_fingerprint`` carries the whitespace-
    normalized md5 fingerprint from the SAME token array (dd04's trick), so
    dd05 needs no second documents scan or fingerprint join.  The same
    small-scan parallelism gate as dd04: repartition by doc_id replaces the
    post-explode vote shuffle on sub-core-count inputs, no-op at scale."""
    # Oracle-exact token derivation (dd04's fix applies here too): collapse
    # whitespace runs to single spaces, trim, split on the single space —
    # Spark trim strips only ASCII spaces, so splitting the raw text on [ \t\n\r\f\x0B]+
    # would inject empty edge tokens for tab/newline-padded text and break
    # "same normalized text -> same fingerprint / same token bag".
    # Repartition the RAW text BEFORE the normalization (dd04's ordering,
    # r15 fix): projections do not push below a repartition, so normalizing
    # first ran the regexp collapse + trim on the row-group-starved single
    # scan task (~2 s/pass at sf0.1, twice per dd05 run); exchanged first,
    # the normalization runs at full parallelism.  Same bytes move either
    # way (collapsed text ~= raw text).
    target = docs.sparkSession.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < target:
        docs = docs.repartition(target, "doc_id")
    narrow = docs.select(
        "doc_id",
        F.trim(F.regexp_replace(F.lower(text_expr), r"[ \t\n\r\f\x0B]+", " ")).alias("__lt"),
    )
    narrow = narrow.select("doc_id", F.split(F.col("__lt"), " ").alias("toks"))
    if with_fingerprint:
        narrow = narrow.select(
            "doc_id", F.md5(F.array_join("toks", " ")).alias("f"), "toks"
        )
    keys = ["doc_id", "f"] if with_fingerprint else ["doc_id"]
    # explode_OUTER + a post-generate null filter, NOT plain explode (r15):
    # for an inner explode the optimizer infers ``size(toks) > 0 AND
    # isnotnull(toks)`` (InferFiltersFromGenerate), substitutes the full
    # ``split(trim(regexp_replace(lower(text))))`` expression into it, and
    # pushes THAT below the repartition — re-running the whole
    # normalization on the row-group-starved single scan task (~2 s/pass at
    # sf0.1, the exact cost the repartition exists to parallelize).  An
    # outer generate keeps rows, so nothing is inferred; the only extra
    # rows are one NULL token per NULL-text doc, removed by a cheap filter
    # on the GENERATED column (cannot push below the Generate).
    # Value-identical: split() of non-null text is never empty, so inner
    # explode dropped exactly the NULL-text docs — which the filter drops.
    toks = (
        narrow.select(*keys, F.explode_outer("toks").alias("tok"))
        .filter(F.col("tok").isNotNull())
        .withColumn("h", F.xxhash64("tok"))
    )
    n_bits = 63  # keep the signature non-negative
    # Branch-free vote (r16): summing the raw bit and testing 2*count > n is
    # INTEGER-IDENTICAL to the signed +-1 vote (vote = 2*count - n > 0) and
    # drops 63 per-row CASE branches from the aggregation's map side.
    votes = toks.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("__n"),
        *[
            F.sum(F.shiftrightunsigned(F.col("h"), b).bitwiseAND(F.lit(1))).alias(
                f"b{b}"
            )
            for b in range(n_bits)
        ],
    )
    sig = None
    for b in range(n_bits):
        term = F.when(
            F.col(f"b{b}") * 2 > F.col("__n"), F.lit(1).cast("long") * (2**b)
        ).otherwise(0)
        sig = term if sig is None else sig + term
    return votes.select(*keys, sig.alias("simhash"))


@query(
    "dd05_simhash",
    oracle="""
    WITH fp AS (
      SELECT doc_id, md5(trim(regexp_replace(lower(text), '[ \\t\\n\\r\\f\\x0B]+', ' ', 'g'))) AS f
      FROM documents
    )
    SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
           (SELECT COUNT(*) FROM fp a JOIN fp b ON a.f = b.f AND a.doc_id < b.doc_id)
             AS n_exact_dup_pairs,
           TRUE AS sigs_nonnegative,
           TRUE AS exact_dups_equal_sig,
           TRUE AS token_order_invariant
    """,
    tags=("dedup", "EXT", "simhash", "invariant-oracle"),
    doc="SimHash fast path (per-token xxhash64, signed bit-majority vote over bits 0..62). "
    "xxhash64 is engine-specific, so the hash-checked contract is the INVARIANTS of the "
    "signature function, q35/q36-style: every doc gets a non-negative signature, "
    "exact-duplicate documents (identical normalized text — computable in ANY engine) get "
    "IDENTICAL signatures (Hamming distance 0), and the signature is a bag-of-tokens "
    "function (recomputing over the reversed token sequence changes nothing). The oracle "
    "recomputes doc/exact-dup-pair counts independently and asserts every boolean holds.",
)
def dd05_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    # ONE forward pass computes signatures AND the normalized fingerprint
    # from the same token array, cached for its three consumers (the dd04
    # restructure applied here: the previous shape re-ran the explode per
    # branch — 9 documents scans, 8 exchanges).  The reversed-text pass is
    # inherently a second tokenize (it TESTS order-invariance by computing
    # the signature from a different token sequence); it reuses the same
    # collapse-trim-split normalization so the token BAG is identical.
    from pyspark import StorageLevel

    # MEMORY_ONLY: same measured tradeoff as dd04 — the deserialized default
    # pays more populating the cache than its reads save.
    sigs = _fast_simhash(d, F.col("text"), with_fingerprint=True).persist(
        StorageLevel.MEMORY_ONLY
    )
    reversed_text = F.array_join(
        F.reverse(F.split(F.trim(F.regexp_replace(F.lower(F.col("text")), r"[ \t\n\r\f\x0B]+", " ")), " ")),
        " ",
    )
    sigs_rev = _fast_simhash(d, reversed_text).withColumnRenamed("simhash", "simhash_rev")
    per_doc = sigs.join(sigs_rev, "doc_id").select(
        (F.col("simhash") >= 0).alias("nonneg"),
        (F.col("simhash") == F.col("simhash_rev")).alias("order_inv"),
    )
    # Exact-dup invariants per fingerprint GROUP instead of per pair (dd04's
    # combinatorial trick): pair count = sum n*(n-1)/2, and every multi-doc
    # group carries one distinct signature (min==max) <=> every exact-dup
    # pair has identical signatures.
    fgroups = sigs.groupBy("f").agg(
        F.count("*").alias("n"),
        F.min("simhash").alias("sig_lo"),
        F.max("simhash").alias("sig_hi"),
    )
    dup_agg = fgroups.agg(
        F.coalesce(F.sum(F.col("n") * (F.col("n") - 1) / 2), F.lit(0))
        .cast("long")
        .alias("n_exact_dup_pairs"),
        F.min(
            F.when(F.col("n") >= 2, F.col("sig_lo") == F.col("sig_hi")).otherwise(F.lit(True))
        ).alias("dup_eq"),
    )
    # n_docs from the SOURCE relation, not SUM(n) over fingerprint groups: a
    # NULL-text document never produces an exploded token row (explode drops
    # it from sigs entirely), but the oracle's COUNT(*) FROM documents counts
    # it — summing group sizes would silently undercount on such data.  A
    # count(*) over one zero-column parquet scan is metadata-cheap.
    n_docs_agg = d.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    return n_docs_agg.crossJoin(dup_agg).crossJoin(  # 1x1 scalar combines
        per_doc.agg(
            F.min("nonneg").alias("sigs_nonnegative"),
            F.min("order_inv").alias("token_order_invariant"),
        )
    ).select(
        "n_docs",
        "n_exact_dup_pairs",
        F.coalesce("sigs_nonnegative", F.lit(True)).alias("sigs_nonnegative"),
        F.coalesce("dup_eq", F.lit(True)).alias("exact_dups_equal_sig"),
        F.coalesce("token_order_invariant", F.lit(True)).alias("token_order_invariant"),
    )


def _pmh_pairs_ctes(src: str, p: str = "") -> str:
    """CTE chain ({p}t/{p}sh/{p}hh/{p}sig/{p}bands) computing portable-MinHash
    band buckets over relation ``src`` — generated from the SAME constants as
    the Spark plan so dd06/dd09/dd11 share one source of truth.  ``p``
    prefixes the CTE names so several instances can coexist in one query
    (dd11 indexes the corpus, the new batch, and the remainder)."""
    rows_per_band = PMH_N // PMH_BANDS
    mins = ",\n             ".join(
        f"MIN(({PMH_A[j]} * h32 + {PMH_B[j]}) % {PMH_PRIME}) AS mh{j}" for j in range(PMH_N)
    )
    band_selects = "\n      UNION ALL\n      ".join(
        "SELECT doc_id, {b} AS band, md5({concat}) AS bucket FROM {p}sig".format(
            b=bi,
            p=p,
            concat=" || ',' || ".join(
                f"CAST(mh{bi * rows_per_band + r} AS VARCHAR)" for r in range(rows_per_band)
            ),
        )
        for bi in range(PMH_BANDS)
    )
    return f"""{p}t AS (
      SELECT doc_id, string_split_regex(lower(text), '[ \\t\\n\\r\\f\\x0B]+') AS toks FROM {src}
    ),
    {p}sh AS (
      SELECT DISTINCT doc_id, s FROM (
        SELECT doc_id,
               unnest(list_transform(
                 generate_series(1, greatest(len(toks) - 2, 0)),
                 i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
               )) AS s
        FROM {p}t
      )
    ),
    {p}hh AS (
      SELECT doc_id, ({_SQL_H32}) AS h32 FROM {p}sh
    ),
    {p}sig AS (
      SELECT doc_id,
             {mins}
      FROM {p}hh GROUP BY doc_id
    ),
    {p}bands AS (
      {band_selects}
    )"""


def _pmh_oracle_sql() -> str:
    """Generate the dd06 oracle from the SAME constants as the Spark plan."""
    return f"""
    WITH {_pmh_pairs_ctes("documents")}
    SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS n_shared_bands
    FROM bands a
    JOIN bands b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    """


@query(
    "dd06_minhash_portable",
    oracle=_pmh_oracle_sql(),
    tags=("dedup", "EXT", "minhash", "lsh"),
    doc="MinHash+LSH with fully portable hashing: md5-derived 32-bit shingle hashes, "
    "16 affine LCG permutations mod 2^31-1, 4x4 banding with md5 band buckets — every "
    "step bit-identical on any engine, so unlike dd04 (xxhash64 fast path) the whole "
    "candidate-pair set is value-hash-verified against the SQL oracle. Same linear "
    "candidate-generation shape as dd04: one shuffle to signatures, one on band buckets.",
)
def dd06_minhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    return portable_minhash_pairs(table(spark, sf_dir, "documents"))


def _dd17_oracle_sql() -> str:
    """dd17 oracle: the SAME portable band-bucket candidate CTEs as dd06
    (one source of truth for the constants), then containment computed ONLY
    for candidate pairs — pair ⋈ d1-shingles ⋈ d2-shingles, mirroring the
    Spark plan's per-pair linear work."""

    return f"""
    WITH {_pmh_pairs_ctes("documents")},
    cand AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2
      FROM bands a
      JOIN bands b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    sizes AS (
      SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
    ),
    inter AS (
      SELECT c.d1, c.d2, COUNT(*) AS n_common
      FROM cand c
      JOIN sh a ON a.doc_id = c.d1
      JOIN sh b ON b.doc_id = c.d2 AND b.s = a.s
      GROUP BY 1, 2
    ),
    pairs2 AS (
      SELECT i.d1, i.d2, i.n_common, s1.n_sh AS n_sh1, s2.n_sh AS n_sh2
      FROM inter i
      JOIN sizes s1 ON i.d1 = s1.doc_id
      JOIN sizes s2 ON i.d2 = s2.doc_id
    )
    SELECT contained, container, n_common, containment FROM (
      SELECT d1 AS contained, d2 AS container, n_common,
             CAST(n_common AS DOUBLE) / CAST(n_sh1 AS DOUBLE) AS containment
      FROM pairs2
      UNION ALL
      SELECT d2, d1, n_common,
             CAST(n_common AS DOUBLE) / CAST(n_sh2 AS DOUBLE)
      FROM pairs2
    ) WHERE containment >= 0.5
    """


@query(
    "dd17_containment_scoped",
    oracle=_dd17_oracle_sql(),
    tags=("dedup", "EXT", "containment", "scoped"),
    doc="Bucket-scoped containment (operators.dedup_corpus.containment_for_pairs over the "
    "portable LSH candidate pairs): the 100 TB form of dd16 — containment is computed "
    "ONLY for pairs already sharing an LSH band bucket, so total work is linear in the "
    "candidate count (pair ⋈ d1-shingles ⋈ d2-shingles) instead of a corpus-wide "
    "shingle-equality self-join. Recall is candidate-bounded (a tiny-Jaccard "
    "small-in-huge containment pair may never be a candidate; dd16 with its DF cap is "
    "the discovery pass) — this scores an existing candidate/cluster structure cheaply.",
)
def dd17_containment_scoped(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.dedup_corpus import (
        containment_for_pairs,
    )

    docs = table(spark, sf_dir, "documents")
    return containment_for_pairs(docs, portable_minhash_pairs(docs), threshold=0.5)


PSH_BITS = 30  # bits taken from the md5-derived 32-bit token hash


def _psh_oracle_sql() -> str:
    """dd07 oracle: same md5-derived token hash, bit-majority vote, signature
    reassembly — all integer arithmetic, engine-portable."""
    return f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(lower(text), '[ \\t\\n\\r\\f\\x0B]+')) AS s
      FROM documents
    ),
    hh AS (
      SELECT doc_id, ({_SQL_H32}) AS h32 FROM tok
    ),
    votes AS (
      SELECT doc_id, b.b AS bit,
             SUM(CASE WHEN (h32 // (1 << b.b)) % 2 = 1 THEN 1 ELSE -1 END) AS v
      FROM hh, generate_series(0, {PSH_BITS - 1}) b(b)
      GROUP BY doc_id, b.b
    )
    SELECT doc_id,
           CAST(SUM(CASE WHEN v > 0 THEN CAST(1 AS BIGINT) << bit ELSE 0 END) AS BIGINT) AS simhash
    FROM votes
    GROUP BY doc_id
    """


@query(
    "dd07_simhash_portable",
    oracle=_psh_oracle_sql(),
    tags=("dedup", "EXT", "simhash"),
    doc="SimHash with portable hashing (md5-derived 32-bit token hash, 30-bit signature, "
    "signed bit-majority vote) — unlike dd05 (xxhash64 fast path) the signatures are "
    "value-hash-verified against the SQL oracle. Plan shape: one narrow hash projection, "
    "one shuffle on doc_id; near-dup clustering then groups by low Hamming distance.",
)
def dd07_simhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), r"[ \t\n\r\f\x0B]+")).alias("s")
    ).withColumn("h32", F.conv(F.substring(F.md5("s"), 1, 8), 16, 10).cast("long"))
    # Branch-free vote (r16, dd05's rewrite): 2*count > n == the signed +-1
    # vote's "> 0", exactly, in integers.
    votes = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("__n"),
        *[
            F.sum(F.shiftrightunsigned(F.col("h32"), b).bitwiseAND(F.lit(1))).alias(
                f"b{b}"
            )
            for b in range(PSH_BITS)
        ],
    )
    sig = None
    for b in range(PSH_BITS):
        term = F.when(
            F.col(f"b{b}") * 2 > F.col("__n"), F.lit(2**b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        sig = term if sig is None else sig + term
    return votes.select("doc_id", sig.alias("simhash"))


def _dedup_corpus_oracle_sql() -> str:
    """dd09 oracle: exact-dedup survivors -> portable-MinHash pairs -> the
    transitive closure as a DuckDB recursive CTE -> drop non-minimum cluster
    members.  The closure materializes all reachable pairs, which is only
    viable at oracle scale — the Spark side uses O(diameter) label
    propagation instead — but the SURVIVOR SET is identical, so the composed
    dedup pipeline (including cluster formation) is value-hash-verified."""
    return f"""
    WITH RECURSIVE kept AS (
      SELECT MIN(doc_id) AS doc_id
      FROM documents
      GROUP BY md5(trim(regexp_replace(lower(text), '[ \\t\\n\\r\\f\\x0B]+', ' ', 'g')))
    ),
    kdocs AS (
      SELECT d.doc_id, d.text FROM documents d JOIN kept USING (doc_id)
    ),
    {_pmh_pairs_ctes("kdocs")},
    pairs AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2
      FROM bands a
      JOIN bands b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    edges AS (
      SELECT d1 AS a, d2 AS b FROM pairs
      UNION
      SELECT d2 AS a, d1 AS b FROM pairs
    ),
    reach AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    removed AS (
      SELECT a AS doc_id FROM reach GROUP BY a HAVING MIN(b) < a
    )
    SELECT k.doc_id
    FROM kept k LEFT JOIN removed r ON k.doc_id = r.doc_id
    WHERE r.doc_id IS NULL
    """


@query(
    "dd09_dedup_corpus",
    oracle=_dedup_corpus_oracle_sql(),
    tags=("dedup", "EXT", "front-door"),
    doc="The PRODUCTION dedup front door (operators.dedup_corpus.dedup_corpus): exact "
    "fingerprint dedup -> portable MinHash-LSH candidate pairs -> connected components -> "
    "canonical anti-join, returning the surviving doc_ids. Every stage is linear/bucketed "
    "(no all-pairs join; plan pinned BNLJ-free by tests); unlike dd08 the full composition "
    "IS oracle-checked — the DuckDB oracle computes the same clusters via a recursive-CTE "
    "transitive closure.",
)
def dd09_dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return dedup_corpus(d).select("doc_id")


def _dedup_embeddings_oracle_sql() -> str:
    """dd10 oracle: the s05 bucketing CTEs -> thresholded near-dup edges ->
    recursive-CTE transitive closure -> drop non-minimum cluster members.
    Survivor set identical to the Spark-side O(diameter) label propagation."""
    from healthcare_data_pipeline_spark.queries.similarity import _LSH_CTES, _QUANT_SQL

    return (
        _QUANT_SQL.replace("WITH", "WITH RECURSIVE", 1)
        + _LSH_CTES
        + """
    , pairs AS (
      SELECT a.vec_id AS d1, b.vec_id AS d2
      FROM enb a JOIN enb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
      WHERE list_dot_product(a.iv, b.iv) / (sqrt(a.nrm2) * sqrt(b.nrm2)) >= 0.8
    ),
    edges AS (
      SELECT d1 AS a, d2 AS b FROM pairs
      UNION
      SELECT d2 AS a, d1 AS b FROM pairs
    ),
    reach AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    removed AS (
      SELECT a AS vec_id FROM reach GROUP BY a HAVING MIN(b) < a
    )
    SELECT en.vec_id
    FROM en LEFT JOIN removed r ON en.vec_id = r.vec_id
    WHERE r.vec_id IS NULL
    """
    )


@query(
    "dd10_embedding_dedup",
    oracle=_dedup_embeddings_oracle_sql(),
    tags=("dedup", "EXT", "embedding", "front-door"),
    doc="Embedding dedup PRODUCTION front door (operators.similarity.dedup_embeddings): "
    "sign-bit-LSH candidates -> exact rescoring >= 0.8 -> connected components -> canonical "
    "anti-join, returning surviving vec_ids. The scale-safe replacement for dd03's O(N^2) "
    "all-pairs baseline: candidate generation is ONE shuffle on the bucket key. Oracle-checked "
    "end-to-end via a DuckDB recursive-CTE transitive closure over the same portable signatures.",
)
def dd10_embedding_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.similarity import dedup_embeddings

    # widen=True (r16 A/B win: 4.91 -> 4.18 s min, 5.71 -> 4.71 s median,
    # interleaved arms): same rationale as s05 — the LSH bucket self-join's
    # rescore loop otherwise streams the single-row-group scan on one task.
    en = quantized(spark, sf_dir, widen=True)
    return dedup_embeddings(en).select("vec_id")


def _dedup_incremental_oracle_sql() -> str:
    """dd11 oracle, mirroring operators.dedup_corpus.dedup_incremental stage
    by stage: the even-id half of documents plays the already-ingested corpus
    (contributing only its fingerprint + band indexes), the odd-id half is
    the new batch.  Exact semi-drop -> band-bucket semi-drop -> within-batch
    dd09 pipeline (fingerprint keeper + pairs + recursive closure)."""
    fp = "md5(trim(regexp_replace(lower(text), '[ \\t\\n\\r\\f\\x0B]+', ' ', 'g')))"
    return f"""
    WITH RECURSIVE corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0
    ),
    newb AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
    ),
    cfp AS (
      SELECT DISTINCT {fp} AS fingerprint FROM corpus
    ),
    {_pmh_pairs_ctes("corpus", "c")},
    ne AS (
      SELECT n.doc_id, n.text FROM newb n
      LEFT JOIN cfp ON {fp.replace("text", "n.text")} = cfp.fingerprint
      WHERE cfp.fingerprint IS NULL
    ),
    {_pmh_pairs_ctes("ne", "n")},
    nearhit AS (
      SELECT DISTINCT n.doc_id
      FROM nbands n JOIN cbands c ON n.band = c.band AND n.bucket = c.bucket
    ),
    rem AS (
      SELECT ne.doc_id, ne.text FROM ne
      LEFT JOIN nearhit h ON ne.doc_id = h.doc_id
      WHERE h.doc_id IS NULL
    ),
    kept AS (
      SELECT MIN(doc_id) AS doc_id FROM rem GROUP BY {fp}
    ),
    kdocs AS (
      SELECT r.doc_id, r.text FROM rem r JOIN kept USING (doc_id)
    ),
    {_pmh_pairs_ctes("kdocs", "k")},
    pairs AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2
      FROM kbands a
      JOIN kbands b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    edges AS (
      SELECT d1 AS a, d2 AS b FROM pairs
      UNION
      SELECT d2 AS a, d1 AS b FROM pairs
    ),
    reach AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    removed AS (
      SELECT a AS doc_id FROM reach GROUP BY a HAVING MIN(b) < a
    )
    SELECT k.doc_id
    FROM kept k LEFT JOIN removed r ON k.doc_id = r.doc_id
    WHERE r.doc_id IS NULL
    """


@query(
    "dd11_dedup_incremental",
    oracle=_dedup_incremental_oracle_sql(),
    tags=("dedup", "EXT", "incremental", "front-door"),
    doc="INCREMENTAL dedup (operators.dedup_corpus.dedup_incremental): dedupe a new batch "
    "against an existing corpus using only the corpus's stored fingerprint + LSH band "
    "indexes — per-batch cost O(batch), the corpus is never re-signatured. Demonstrated "
    "on a deterministic split (even doc_ids = corpus, odd = new batch); returns surviving "
    "new doc_ids. Oracle mirrors all three stages (exact semi-drop, band-bucket semi-drop, "
    "within-batch closure) in one recursive-CTE query.",
)
def dd11_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.dedup_corpus import (
        band_buckets,
        corpus_fingerprints,
        dedup_incremental,
    )

    d = table(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % 2 == 0)
    new_batch = d.filter(F.col("doc_id") % 2 == 1)
    return dedup_incremental(
        new_batch, band_buckets(corpus), corpus_fingerprints(corpus)
    ).select("doc_id")


def _prep_corpus_oracle_sql() -> str:
    """dd12 oracle: t07's quality gates -> dd09's dedup chain, one query."""
    from healthcare_data_pipeline_spark.queries.text import _STOP_SQL

    return f"""
    WITH RECURSIVE tq AS (
      SELECT doc_id, text,
             string_split_regex(lower(text), '[ \\t\\n\\r\\f\\x0B]+') AS toks,
             length(text) AS nc
      FROM documents
    ),
    filtered AS (
      SELECT doc_id, text FROM tq
      WHERE len(toks) BETWEEN 20 AND 1000
        AND CAST(nc - len(toks) + 1 AS DOUBLE) / CAST(len(toks) AS DOUBLE) <= 12.0
        AND CAST(len(list_filter(toks, x -> x IN {_STOP_SQL})) AS DOUBLE)
            / CAST(len(toks) AS DOUBLE) >= 0.01
    ),
    kept AS (
      SELECT MIN(doc_id) AS doc_id
      FROM filtered
      GROUP BY md5(trim(regexp_replace(lower(text), '[ \\t\\n\\r\\f\\x0B]+', ' ', 'g')))
    ),
    kdocs AS (
      SELECT f.doc_id, f.text FROM filtered f JOIN kept USING (doc_id)
    ),
    {_pmh_pairs_ctes("kdocs")},
    pairs AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2
      FROM bands a
      JOIN bands b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    edges AS (
      SELECT d1 AS a, d2 AS b FROM pairs
      UNION
      SELECT d2 AS a, d1 AS b FROM pairs
    ),
    reach AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    removed AS (
      SELECT a AS doc_id FROM reach GROUP BY a HAVING MIN(b) < a
    )
    SELECT k.doc_id
    FROM kept k LEFT JOIN removed r ON k.doc_id = r.doc_id
    WHERE r.doc_id IS NULL
    """


def _prep_corpus_gated_oracle_sql() -> str:
    """dd18 oracle: dd12's chain with both optional prep_corpus gates on —
    t23's rare-bigram gibberish gate (frequencies over the quality-passing
    corpus) spliced between the per-doc filter and dedup, and t24's exact
    token-budget window over the dedup survivors."""
    from healthcare_data_pipeline_spark.operators.mixture import DENOM
    from healthcare_data_pipeline_spark.queries.text import _STOP_SQL

    return f"""
    WITH RECURSIVE tq AS (
      SELECT doc_id, text, source,
             string_split_regex(lower(text), '[ \\t\\n\\r\\f\\x0B]+') AS toks,
             length(text) AS nc
      FROM documents
    ),
    filtered AS (
      SELECT doc_id, text, source, toks FROM tq
      WHERE len(toks) BETWEEN 20 AND 1000
        AND CAST(nc - len(toks) + 1 AS DOUBLE) / CAST(len(toks) AS DOUBLE) <= 12.0
        AND CAST(len(list_filter(toks, x -> x IN {_STOP_SQL})) AS DOUBLE)
            / CAST(len(toks) AS DOUBLE) >= 0.01
    ),
    bg AS (
      SELECT doc_id, toks[i] || ' ' || toks[i+1] AS bg
      FROM filtered, UNNEST(generate_series(1, len(toks) - 1)) AS g(i)
      WHERE len(toks) >= 2
    ),
    bgc AS (SELECT bg, COUNT(*) AS df_bg FROM bg GROUP BY bg),
    rr AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN df_bg <= 2 THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS rare_ratio
      FROM bg JOIN bgc USING (bg) GROUP BY doc_id
    ),
    gated AS (
      SELECT f.doc_id, f.text, f.source FROM filtered f JOIN rr USING (doc_id)
      WHERE rr.rare_ratio <= 0.02
    ),
    kept AS (
      SELECT MIN(doc_id) AS doc_id
      FROM gated
      GROUP BY md5(trim(regexp_replace(lower(text), '[ \\t\\n\\r\\f\\x0B]+', ' ', 'g')))
    ),
    kdocs AS (
      SELECT g.doc_id, g.text FROM gated g JOIN kept USING (doc_id)
    ),
    {_pmh_pairs_ctes("kdocs")},
    pairs AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2
      FROM bands a
      JOIN bands b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    edges AS (
      SELECT d1 AS a, d2 AS b FROM pairs
      UNION
      SELECT d2 AS a, d1 AS b FROM pairs
    ),
    reach AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    removed AS (
      SELECT a AS doc_id FROM reach GROUP BY a HAVING MIN(b) < a
    ),
    surv AS (
      SELECT k.doc_id
      FROM kept k LEFT JOIN removed r ON k.doc_id = r.doc_id
      WHERE r.doc_id IS NULL
    ),
    sd AS (
      SELECT g.doc_id, g.source, CAST(g.doc_id AS VARCHAR) || ':budget' AS s,
             CAST(len(string_split_regex(g.text, '[ \\t\\n\\r\\f\\x0B]+')) AS BIGINT)
               AS n_tokens
      FROM gated g JOIN surv USING (doc_id)
      WHERE g.text IS NOT NULL
    ),
    h AS (
      SELECT doc_id, source, n_tokens, ({_SQL_H32}) % {DENOM} AS u FROM sd
    ),
    c AS (
      SELECT doc_id, source, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY source ORDER BY u, doc_id) AS cum_tokens
      FROM h
    )
    SELECT doc_id, source, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM c WHERE cum_tokens <= 5000
    """


def _decontaminate_oracle_sql() -> str:
    """dd13 oracle: eval-side distinct 3-grams -> train ids sharing any ->
    anti-join, mirroring operators.decontaminate.decontaminate(n=3)."""
    g3 = (
        "unnest(list_transform(generate_series(1, greatest(len(toks) - 2, 0)), "
        "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))"
    )
    return f"""
    WITH tr AS (
      SELECT doc_id, lang, source, n_chars,
             string_split_regex(lower(text), '[ \\t\\n\\r\\f\\x0B]+') AS toks
      FROM documents WHERE source <> 'src0'
    ),
    ev AS (
      SELECT DISTINCT {g3} AS g
      FROM (SELECT string_split_regex(lower(text), '[ \\t\\n\\r\\f\\x0B]+') AS toks
            FROM documents WHERE source = 'src0')
    ),
    bad AS (
      SELECT DISTINCT t.doc_id
      FROM (SELECT doc_id, {g3} AS g FROM tr) t
      JOIN ev USING (g)
    )
    SELECT doc_id, lang, source, n_chars
    FROM tr
    WHERE NOT EXISTS (SELECT 1 FROM bad WHERE bad.doc_id = tr.doc_id)
    """


@query(
    "dd13_decontaminate",
    oracle=_decontaminate_oracle_sql(),
    tags=("dedup", "EXT", "decontamination", "front-door"),
    doc="Benchmark decontamination (operators.decontaminate.decontaminate): drop training "
    "documents sharing any word n-gram with a held-out eval set (the GPT-3-style overlap "
    "rule; n=3 here so the synthetic corpus exhibits observable contamination, n=13 the "
    "production default). Eval n-grams broadcast (benchmarks are tiny vs a TB-scale "
    "train side); the train corpus is never shuffled — explode + broadcast semi-join + "
    "broadcast anti-join, all map-side.",
)
def dd13_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.decontaminate import decontaminate

    d = table(spark, sf_dir, "documents")
    train = d.filter(F.col("source") != "src0")
    ev = d.filter(F.col("source") == "src0")
    return decontaminate(train, ev, mode="ngram", n=3).select(
        "doc_id", "lang", "source", "n_chars"
    )


def _decontaminate_bloom_oracle_sql() -> str:
    """dd20 oracle: the Bloom test "all k bits set" rewritten relationally —
    each of the gram's k positions must be IN the set of positions written
    by some eval gram.  Same BLOOM_A/BLOOM_B/m constants as the Spark plan
    (one source of truth), same portable md5-h32, so false positives
    reproduce bit-identically too."""
    from healthcare_data_pipeline_spark.operators.decontaminate import (
        BLOOM_A,
        BLOOM_B,
        BLOOM_K,
        BLOOM_M,
    )
    from healthcare_data_pipeline_spark.operators.dedup_corpus import PMH_PRIME

    g3 = (
        "unnest(list_transform(generate_series(1, greatest(len(toks) - 2, 0)), "
        "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))"
    )

    def pos(j: int) -> str:
        return f"((({BLOOM_A[j]} * h32 + {BLOOM_B[j]}) % {PMH_PRIME}) % {BLOOM_M})"

    pos_union = "\n      UNION\n      ".join(
        f"SELECT DISTINCT {pos(j)} AS p FROM evh" for j in range(BLOOM_K)
    )
    tests = " AND ".join(f"{pos(j)} IN (SELECT p FROM pos)" for j in range(BLOOM_K))
    return f"""
    WITH tr AS (
      SELECT doc_id, lang, source, n_chars,
             string_split_regex(lower(text), '[ \\t\\n\\r\\f\\x0B]+') AS toks
      FROM documents WHERE source <> 'src0'
    ),
    evt AS (
      SELECT string_split_regex(lower(text), '[ \\t\\n\\r\\f\\x0B]+') AS toks
      FROM documents WHERE source = 'src0'
    ),
    evg AS (SELECT DISTINCT {g3} AS s FROM evt),
    evh AS (SELECT ({_SQL_H32}) AS h32 FROM evg),
    pos AS (
      {pos_union}
    ),
    trg AS (SELECT DISTINCT doc_id, s FROM (SELECT doc_id, {g3} AS s FROM tr)),
    trh AS (SELECT doc_id, ({_SQL_H32}) AS h32 FROM trg),
    bad AS (SELECT DISTINCT doc_id FROM trh WHERE {tests})
    SELECT doc_id, lang, source, n_chars
    FROM tr
    WHERE NOT EXISTS (SELECT 1 FROM bad WHERE bad.doc_id = tr.doc_id)
    """


@query(
    "dd20_decontaminate_bloom",
    oracle=_decontaminate_bloom_oracle_sql(),
    tags=("dedup", "EXT", "decontamination", "bloom"),
    doc="Bloom-filter decontamination (operators.decontaminate.decontaminate mode='bloom', "
    "n=3): dd13's n-gram overlap rule through a fixed 2^20-bit bitmap of the eval grams — "
    "the 100 TB form for when the eval-suite gram set (10^8 strings across hundreds of "
    "benchmarks) outgrows a comfortable broadcast. NO false negatives ever (a leaked "
    "benchmark is the failure that matters); false positives at a sized, DETERMINISTIC "
    "rate — the portable md5-h32 + affine-LCG hash family makes even the FPs bit-identical "
    "across engines, so the oracle verifies them too (hasher='portable'; the production "
    "default is the xxhash64 'fast' twin — same family, ~5x cheaper per gram, SCALE.md). "
    "Train side: scan -> project -> 1x1 bitmap broadcast -> codegen predicate; no explode, "
    "no join, no shuffle.",
)
def dd20_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.decontaminate import decontaminate

    d = table(spark, sf_dir, "documents")
    train = d.filter(F.col("source") != "src0")
    ev = d.filter(F.col("source") == "src0")
    return decontaminate(train, ev, mode="bloom", n=3, hasher="portable").select(
        "doc_id", "lang", "source", "n_chars"
    )


@query(
    "dd14_dup_rate_report",
    oracle="""
    SELECT source AS "group",
           COUNT(*) AS n_docs,
           COUNT(*) - COUNT(DISTINCT md5(trim(regexp_replace(lower(text), '[ \\t\\n\\r\\f\\x0B]+', ' ', 'g'))))
             AS n_exact_dups,
           CAST(COUNT(*) - COUNT(DISTINCT md5(trim(regexp_replace(lower(text), '[ \\t\\n\\r\\f\\x0B]+', ' ', 'g'))))
                AS DOUBLE) / COUNT(*) AS dup_rate
    FROM documents
    GROUP BY source
    """,
    tags=("dedup", "EXT", "report"),
    doc="Per-source exact-duplicate rate (operators.dedup_corpus.dup_rate_report): the "
    "curation diagnostic run BEFORE dedup — which slices of the corpus are worth "
    "deduplicating, and how much a fingerprint pass would drop. One two-level hash "
    "aggregate (count + exact count-distinct per group), map-side combined.",
)
def dd14_dup_rate_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.dedup_corpus import dup_rate_report

    return dup_rate_report(table(spark, sf_dir, "documents"))


@query(
    "dd15_band_skew_report",
    oracle=f"""
    WITH {_pmh_pairs_ctes("documents")},
    per_bucket AS (
      SELECT band, bucket, COUNT(*) AS n FROM bands GROUP BY band, bucket
    )
    SELECT band,
           CAST(SUM(n) AS BIGINT) AS n_docs,
           COUNT(*) AS n_buckets,
           CAST(MAX(n) AS BIGINT) AS max_bucket,
           CAST(SUM(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS multi_buckets,
           CAST(SUM(n * (n - 1)) // 2 AS BIGINT) AS candidate_pairs
    FROM per_bucket
    GROUP BY band
    """,
    tags=("dedup", "EXT", "report", "skew"),
    doc="Per-band LSH bucket-occupancy diagnostic (operators.dedup_corpus.band_skew_report): "
    "the pre-flight skew check before a corpus-scale dedup. candidate_pairs is the EXACT "
    "fan-out the banding self-join will produce and max_bucket the per-partition skew "
    "ceiling — the numbers that decide whether the run needs bucket capping or salting "
    "BEFORE it launches. Two narrow aggregations (per-(band,bucket) partials map-side, "
    "per-band rollup); all-integer hash surface.",
)
def dd15_band_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.dedup_corpus import band_skew_report

    return band_skew_report(table(spark, sf_dir, "documents"))


def _contamination_report_oracle_sql() -> str:
    """t17 oracle: dd13's 3-gram collision rule re-aggregated as per-source
    counts/rates instead of the anti-joined survivor rows.

    The hashed projection is all-BIGINT: the human-facing double rate the
    operator returns is re-expressed as parts-per-million via INTEGER
    division on both sides (DuckDB ``//``, Spark ``div``), and EVERY
    aggregate output is wrapped in ``CAST(... AS BIGINT)`` — DuckDB types a
    bare ``SUM(int)`` as HUGEINT (int128), which a type-sensitive value
    hasher (e.g. Arrow's decimal128 mapping) hashes differently from
    Spark's BIGINT even when the values are identical (the r4/r5
    hash_match=false root cause).  ``tests/test_oracle_queries.py``'s
    no-HUGEINT oracle-typing test makes this failure class impossible.
    """
    g3 = (
        "unnest(list_transform(generate_series(1, greatest(len(toks) - 2, 0)), "
        "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))"
    )
    return f"""
    WITH tr AS (
      SELECT doc_id, source, string_split_regex(lower(text), '[ \\t\\n\\r\\f\\x0B]+') AS toks
      FROM documents WHERE source <> 'src0'
    ),
    ev AS (
      SELECT DISTINCT {g3} AS g
      FROM (SELECT string_split_regex(lower(text), '[ \\t\\n\\r\\f\\x0B]+') AS toks
            FROM documents WHERE source = 'src0')
    ),
    bad AS (
      SELECT DISTINCT t.doc_id
      FROM (SELECT doc_id, {g3} AS g FROM tr) t
      JOIN ev USING (g)
    )
    SELECT tr.source AS "group",
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN bad.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_contaminated,
           CAST((1000000 * SUM(CASE WHEN bad.doc_id IS NOT NULL THEN 1 ELSE 0 END))
                // COUNT(*) AS BIGINT) AS contamination_rate_ppm
    FROM tr LEFT JOIN bad ON tr.doc_id = bad.doc_id
    GROUP BY tr.source
    """


@query(
    "t17_contamination_report",
    oracle=_contamination_report_oracle_sql(),
    tags=("decontamination", "EXT", "report"),
    doc="Per-source benchmark-contamination rate (operators.decontaminate."
    "contamination_report): dd13's overlap rule (shared word 3-grams with the held-out "
    "src0 eval slice) reported as counts/rates per slice instead of dropped rows — the "
    "number a curation decision needs before deleting anything. Same scale shape as "
    "decontamination: eval n-grams broadcast, train never shuffled, contaminated-id set "
    "(overlap-sized) broadcast for the flag join, group agg map-side. The hashed "
    "projection replaces the operator's double rate with an integer-division ppm so the "
    "driver hash surface is float-free (r4 hash_match=false on bit-identical doubles).",
)
def t17_contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.decontaminate import contamination_report

    d = table(spark, sf_dir, "documents")
    rep = contamination_report(
        d.filter(F.col("source") != "src0"), d.filter(F.col("source") == "src0"), n=3
    )
    # Integer division (`div`) mirrors the oracle's `//` exactly: no float on
    # the hash surface. The operator keeps returning the double rate for humans.
    return rep.select(
        "group",
        "n_docs",
        "n_contaminated",
        F.expr("(1000000 * n_contaminated) div n_docs")
        .cast("long")
        .alias("contamination_rate_ppm"),
    )


@query(
    "dd12_prep_corpus",
    oracle=_prep_corpus_oracle_sql(),
    tags=("dedup", "EXT", "quality", "front-door"),
    doc="The COMPLETE training-data prep path as one verified composition "
    "(operators.quality.prep_corpus): C4-style quality gates first (narrow predicate, "
    "maximally selective, nothing downstream shuffles junk), then full dedup (exact "
    "fingerprint -> portable LSH near-dup clusters -> canonical survivors). Returns the "
    "ship-ready doc_ids; recursive-CTE oracle mirrors every stage.",
)
def dd12_prep_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.quality import prep_corpus

    d = table(spark, sf_dir, "documents")
    return prep_corpus(d).select("doc_id")


@query(
    "dd18_prep_corpus_gated",
    oracle=_prep_corpus_gated_oracle_sql(),
    tags=("dedup", "EXT", "quality", "mixture", "front-door"),
    doc="The FULLY-GATED prep front door (operators.quality.prep_corpus with both "
    "optional stages on): C4-style quality gates -> corpus-adaptive rare-bigram "
    "gibberish gate (t23's operator, frequencies computed over the quality-passing "
    "corpus, spliced BEFORE dedup so junk never costs shingle shuffles) -> exact "
    "fingerprint + portable-LSH dedup -> token-budget mixture sampling (t24's exact "
    "window, 5000 tokens per source, AFTER dedup so budgets buy unique tokens). One "
    "recursive-CTE oracle mirrors all five stages; cum_tokens makes the final "
    "selection auditable. Gate threshold 0.02, not the production ~0.5: the synthetic "
    "corpus is template-generated, so natural docs share nearly every bigram "
    "(rare_ratio <= 0.045 corpus-wide) and 0.02 is what makes the gate bite on the "
    "injected hostile tail — the composition under verification is the same.",
)
def dd18_prep_corpus_gated(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.quality import prep_corpus

    d = table(spark, sf_dir, "documents")
    return prep_corpus(
        d, max_rare_bigram_ratio=0.02, token_budget=5000
    ).select("doc_id", "source", "n_tokens", "cum_tokens")


@query(
    "dd08_dedup_clusters",
    oracle=f"""
    WITH RECURSIVE {_pmh_pairs_ctes("documents")},
    pairs AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2
      FROM bands a
      JOIN bands b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    edges AS (
      SELECT d1 AS a, d2 AS b FROM pairs
      UNION
      SELECT d2 AS a, d1 AS b FROM pairs
    ),
    reach AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    comp AS (
      SELECT a AS vertex, LEAST(a, MIN(b)) AS component FROM reach GROUP BY a
    )
    SELECT component, MIN(vertex) AS canonical_id, COUNT(*) AS cluster_size
    FROM comp
    GROUP BY component
    """,
    tags=("dedup", "EXT", "components"),
    doc="Near-dup CLUSTER formation: connected components (iterative min-label "
    "propagation, O(diameter) shuffle rounds) over the dd06 portable-LSH candidate "
    "pairs, then one canonical doc per cluster — the transitive-closure step that turns "
    "pair detection into an actual deduplicated corpus. The pairs are the PORTABLE "
    "family, so the full cluster table (component, canonical, size) is value-hash-"
    "verified against a DuckDB recursive-CTE transitive closure over the same edges — "
    "the iterative fixpoint and the recursive closure must land on identical clusters.",
)
def dd08_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.components import (
        canonical_per_cluster,
        connected_components,
    )

    pairs = dd06_minhash_portable(spark, sf_dir).filter(F.col("n_shared_bands") >= 1)
    comp = connected_components(pairs, "d1", "d2")
    return canonical_per_cluster(comp)


@query(
    "dd22_line_dedup",
    oracle="""
    WITH t0 AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    ln AS (
      SELECT doc_id, i AS lpos,
             array_to_string(toks[(i-1)*8+1:(i-1)*8+8], ' ') AS line
      FROM t0, UNNEST(generate_series(1, CAST(ceil(len(toks) / 8.0) AS BIGINT))) AS g(i)
    ),
    dup AS (
      SELECT trim(line) AS k FROM ln WHERE trim(line) != ''
      GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    rm AS (SELECT DISTINCT doc_id, lpos FROM ln JOIN dup ON trim(ln.line) = dup.k),
    kept AS (
      SELECT l.doc_id, l.lpos, l.line
      FROM ln l LEFT JOIN rm ON l.doc_id = rm.doc_id AND l.lpos = rm.lpos
      WHERE rm.doc_id IS NULL
    ),
    agg AS (
      SELECT doc_id, string_agg(line, chr(10) ORDER BY lpos) AS text, COUNT(*) AS n_kept
      FROM kept GROUP BY doc_id
    ),
    nl AS (SELECT doc_id, COUNT(*) AS n_lines FROM ln GROUP BY doc_id)
    SELECT t0.doc_id,
           COALESCE(a.text, '') AS text,
           CAST(nl.n_lines AS INT) AS n_lines,
           CAST(nl.n_lines - COALESCE(a.n_kept, 0) AS INT) AS n_removed_lines
    FROM t0 JOIN nl USING (doc_id) LEFT JOIN agg a USING (doc_id)
    """,
    tags=("dedup", "EXT", "lines"),
    doc="LINE-level boilerplate removal (operators.dedup_corpus.remove_boilerplate_lines, "
    "the RefinedWeb/CCNet line-wise curation stage): delete every line occurring "
    "verbatim (trimmed) in >=2 distinct documents, keep the rest of each document in "
    "order — the unit between span dedup (dd19, aligned k-token windows) and document "
    "dedup (dd01/dd09). The synthetic corpus has no newlines, so the entry first "
    "re-lines each document deterministically (a line break every 8 tokens — both "
    "engines compute the identical re-lining), which makes the stage observably "
    "non-vacuous here (~150 duplicated lines across ~90 docs at sf0.01); real corpora "
    "supply their own newlines. Oracle recomputes line explode -> distinct-doc "
    "frequency -> removed positions -> order-preserving rebuild, and the full rebuilt "
    "text plus audit counts value-hash.",
)
def dd22_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.dedup_corpus import (
        remove_boilerplate_lines,
    )

    d = table(spark, sf_dir, "documents")
    relined = d.withColumn(
        "text",
        F.expr(
            "array_join(transform(sequence(1, CAST(ceil(size(split(text, ' ')) / 8.0) AS INT)), "
            "i -> array_join(slice(split(text, ' '), (i - 1) * 8 + 1, 8), ' ')), '\\n')"
        ),
    )
    return remove_boilerplate_lines(relined, min_docs=2).select(
        "doc_id", "text", "n_lines", "n_removed_lines"
    )


@query(
    "dd19_span_dedup",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split_regex(text, '[ \\t\\n\\r\\f\\x0B]+') AS toks
      FROM documents
    ),
    sh AS (
      SELECT doc_id, i AS spos, array_to_string(toks[i:i+7], ' ') AS span
      FROM t, UNNEST(generate_series(1, len(toks) - 7)) AS g(i)
      WHERE len(toks) >= 8
    ),
    dup AS (SELECT span FROM sh GROUP BY span HAVING COUNT(DISTINCT doc_id) >= 2),
    hits AS (SELECT DISTINCT doc_id, spos FROM sh JOIN dup USING (span)),
    cov AS (
      SELECT DISTINCT doc_id, spos + d AS p
      FROM hits, UNNEST(generate_series(0, 7)) AS u(d)
    ),
    pos AS (
      SELECT doc_id, i AS p, toks[i] AS tok
      FROM t, UNNEST(generate_series(1, len(toks))) AS g(i)
    ),
    kept AS (
      SELECT p.doc_id, p.p, p.tok
      FROM pos p LEFT JOIN cov c ON p.doc_id = c.doc_id AND p.p = c.p
      WHERE c.doc_id IS NULL
    ),
    agg AS (
      SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS text, COUNT(*) AS n_kept
      FROM kept GROUP BY doc_id
    ),
    st AS (SELECT doc_id, COUNT(*) AS n_dup_spans FROM hits GROUP BY doc_id)
    SELECT t.doc_id,
           COALESCE(a.text, '') AS text,
           len(t.toks) AS n_tokens,
           len(t.toks) - COALESCE(a.n_kept, 0) AS n_removed,
           COALESCE(st.n_dup_spans, 0) AS n_dup_spans
    FROM t LEFT JOIN agg a USING (doc_id) LEFT JOIN st USING (doc_id)
    """,
    tags=("dedup", "EXT", "spans"),
    doc="Cross-document duplicated-SPAN removal (operators.dedup_corpus."
    "remove_duplicate_spans, k=8): delete every 8-token span occurring verbatim in "
    ">=2 distinct documents, keep the rest of each document — the shingle-granularity "
    "approximation of exact substring dedup (Lee et al.) / RefinedWeb boilerplate "
    "removal, the sub-document rung document-level dedup cannot see.  The oracle "
    "recomputes coverage relationally (span explode -> df>=2 -> covered positions -> "
    "surviving tokens reassembled in order) and hash-compares the rebuilt text plus "
    "the per-doc audit counts.",
)
def dd19_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.dedup_corpus import (
        remove_duplicate_spans,
    )

    d = table(spark, sf_dir, "documents")
    return remove_duplicate_spans(d, k=8).select(
        "doc_id", "text", "n_tokens", "n_removed", "n_dup_spans"
    )


def _semdedup_oracle_sql(threshold: float) -> str:
    """dd21 oracle: the s07 quantizer-assignment CTEs (integer component-sum
    centroids + exact routing) -> within-cell pairwise cosine at or above
    ``threshold`` -> recursive-CTE transitive closure -> per-vector decision
    flag.  One row per corpus vector: (vec_id, cell, kept)."""
    from healthcare_data_pipeline_spark.queries.similarity import _index_assign_ctes

    return (
        _index_assign_ctes("TRUE").replace("WITH", "WITH RECURSIVE", 1)
        + f"""
    , cp AS (
      SELECT a1.vec_id AS d1, a2.vec_id AS d2
      FROM assign a1
      JOIN assign a2 ON a1.cell = a2.cell AND a1.vec_id < a2.vec_id
      JOIN en e1 ON e1.vec_id = a1.vec_id
      JOIN en e2 ON e2.vec_id = a2.vec_id
      WHERE list_dot_product(e1.iv, e2.iv) / (sqrt(e1.nrm2) * sqrt(e2.nrm2))
            >= {threshold}
    ),
    edges AS (
      SELECT d1 AS a, d2 AS b FROM cp
      UNION
      SELECT d2 AS a, d1 AS b FROM cp
    ),
    reach AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    removed AS (
      SELECT a AS vec_id FROM reach GROUP BY a HAVING MIN(b) < a
    )
    SELECT a.vec_id, a.cell, (r.vec_id IS NULL) AS kept
    FROM assign a LEFT JOIN removed r USING (vec_id)
    """
    )


@query(
    "dd21_semdedup",
    oracle=_semdedup_oracle_sql(0.3),
    tags=("dedup", "EXT", "embedding", "semdedup"),
    doc="SemDeDup (operators.similarity.semdedup, Abbas et al. 2023): quantizer-cell "
    "clustering -> pairwise cosine ONLY within each cell -> connected components -> drop "
    "non-canonical members.  The cluster-scoped twin of dd10's LSH-bucket dedup: every "
    "within-cluster pair is guaranteed scored (no bucket-boundary misses), and the cell "
    "count bounds the quadratic term.  Emits the full per-vector decision table "
    "(vec_id, cell, kept) so the hash verifies assignment, scoring, and the component "
    "decision for every corpus vector; threshold 0.3 is set low to exercise removals on "
    "the synthetic corpus (production default 0.9).",
)
def dd21_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.similarity import semdedup

    # widen A/B LOST here (r16, interleaved arms: 2.94 vs 3.71 min): with
    # _assign_against's vec_id repartition in place the heavy stages already
    # run wide, and the extra round-robin exchange on the scan only adds
    # cost.  Narrow kept.
    en = quantized(spark, sf_dir)
    return semdedup(en, threshold=0.3, keep_flags=True)


def _semdedup_kmeans_oracle_sql(threshold: float, k: int = 8, iters: int = 2) -> str:
    """dd23 oracle: the s11 integer-Lloyd CTEs (iterations unrolled) supply
    the cell assignment, then dd21's within-cell pairwise cosine +
    recursive-CTE transitive closure + per-vector decision flag."""
    from healthcare_data_pipeline_spark.queries.similarity import _kmeans_ctes

    return (
        _kmeans_ctes(k=k, iters=iters).replace("WITH", "WITH RECURSIVE", 1)
        + f"""
    , assign AS (
      SELECT vec_id, CAST(CAST(o AS BIGINT) % {k} AS INT) AS cell FROM af
    ),
    cp AS (
      SELECT a1.vec_id AS d1, a2.vec_id AS d2
      FROM assign a1
      JOIN assign a2 ON a1.cell = a2.cell AND a1.vec_id < a2.vec_id
      JOIN en e1 ON e1.vec_id = a1.vec_id
      JOIN en e2 ON e2.vec_id = a2.vec_id
      WHERE list_dot_product(e1.iv, e2.iv) / (sqrt(e1.nrm2) * sqrt(e2.nrm2))
            >= {threshold}
    ),
    edges AS (
      SELECT d1 AS a, d2 AS b FROM cp
      UNION
      SELECT d2 AS a, d1 AS b FROM cp
    ),
    reach AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    removed AS (
      SELECT a AS vec_id FROM reach GROUP BY a HAVING MIN(b) < a
    )
    SELECT a.vec_id, a.cell, (r.vec_id IS NULL) AS kept
    FROM assign a LEFT JOIN removed r USING (vec_id)
    """
    )


@query(
    "dd23_semdedup_kmeans",
    oracle=_semdedup_kmeans_oracle_sql(0.3),
    tags=("dedup", "EXT", "embedding", "semdedup", "clustering"),
    doc="SemDeDup over DATA-DRIVEN k-means cells (operators.similarity.semdedup with "
    "assigned=kmeans_cells) — the paper-true form of dd21: Abbas et al. 2023 SS2 runs "
    "k-means over the embedding space and dedups within each cluster; dd21's label "
    "quantizer needs labels and sign-bit LSH cells can't follow the data.  The "
    "integer-Lloyd contract (s11) keeps the ITERATIVE clustering stage plus the "
    "within-cell cosine scoring plus the component decision hash-verifiable end to end "
    "— the oracle unrolls the Lloyd iterations as CTE stages and feeds the resulting "
    "cells into the dd21 closure recompute.  Same scale shape as dd21 (the quadratic "
    "term is bounded per cell; k is the knob) with assignment itself a zero-shuffle "
    "scan per iteration.",
)
def dd23_semdedup_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.similarity import (
        kmeans_cells,
        semdedup,
    )

    # widen=True (r16): with the kmeans driver loop in place the assignment
    # is a zero-shuffle scan against literal centroids, so the within-cell
    # pair loop fused above it runs on the scan's single row-group task;
    # two interleaved A/Bs favor the widen on per-arm minima (4.70/4.96 vs
    # 5.03/5.39 s under bursty steal; pre-driver-loop the A/B was flat).
    # Gated no-op at production sizes.
    en = quantized(spark, sf_dir, widen=True)
    return semdedup(en, threshold=0.3, assigned=kmeans_cells(en, k=8, iters=2), keep_flags=True)


_DD24_MIN_LEN = 20


@query(
    "dd24_exact_substring",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split_regex(text, '[ \\t\\n\\r\\f\\x0B]+') AS toks
      FROM documents
    ),
    sh AS (
      SELECT doc_id, i AS spos,
             array_to_string(toks[i:i+{_DD24_MIN_LEN - 1}], ' ') AS span
      FROM t, UNNEST(generate_series(1, len(toks) - {_DD24_MIN_LEN - 1})) AS g(i)
      WHERE len(toks) >= {_DD24_MIN_LEN}
    ),
    dup AS (SELECT span FROM sh GROUP BY span HAVING COUNT(*) >= 2),
    hits AS (SELECT DISTINCT doc_id, spos FROM sh JOIN dup USING (span)),
    cov AS (
      SELECT DISTINCT doc_id, spos + d AS p
      FROM hits, UNNEST(generate_series(0, {_DD24_MIN_LEN - 1})) AS u(d)
    ),
    pos AS (
      SELECT doc_id, i AS p, toks[i] AS tok
      FROM t, UNNEST(generate_series(1, len(toks))) AS g(i)
    ),
    kept AS (
      SELECT p.doc_id, p.p, p.tok
      FROM pos p LEFT JOIN cov c ON p.doc_id = c.doc_id AND p.p = c.p
      WHERE c.doc_id IS NULL
    ),
    agg AS (
      SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS text, COUNT(*) AS n_kept
      FROM kept GROUP BY doc_id
    ),
    st AS (SELECT doc_id, COUNT(*) AS n_dup_spans FROM hits GROUP BY doc_id)
    SELECT t.doc_id,
           COALESCE(a.text, '') AS text,
           len(t.toks) AS n_tokens,
           len(t.toks) - COALESCE(a.n_kept, 0) AS n_removed,
           COALESCE(st.n_dup_spans, 0) AS n_dup_spans
    FROM t LEFT JOIN agg a USING (doc_id) LEFT JOIN st USING (doc_id)
    """,
    tags=("dedup", "EXT", "spans", "exact-substring"),
    doc="EXACT-SUBSTRING dedup at the published semantics (operators.dedup_corpus."
    f"exact_substring_dedup; Lee et al. 2022 ExactSubstr, min_len={_DD24_MIN_LEN} here "
    "for the test corpus vs the paper's 50): remove every substring of >= min_len "
    "tokens occurring MORE THAN ONCE in the corpus — occurrence-counted, so within-doc "
    "repeats count, unlike dd19's distinct-docs curation default.  Aligned min_len "
    "windows are EQUIVALENT to the suffix-array pass, not an approximation: a position "
    "lies in a duplicated >=min_len run iff a duplicated min_len-window covers it "
    "(sub-windows of the run tile it; a duplicated window IS such a run).  The oracle "
    "recomputes coverage relationally on the string path; production defaults to "
    "8-byte hashed window keys (shuffle bytes flat in min_len), equivalence-tested in "
    "pytest.",
)
def dd24_exact_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.dedup_corpus import (
        exact_substring_dedup,
    )

    d = table(spark, sf_dir, "documents", widen=True)
    return exact_substring_dedup(d, min_len=_DD24_MIN_LEN, hash_spans=False).select(
        "doc_id", "text", "n_tokens", "n_removed", "n_dup_spans"
    )


def _dd25_oracle_sql() -> str:
    """dd25 oracle: the SAME portable band-bucket CTEs as dd06 (one source
    of truth for the MinHash constants), instantiated once for the train
    slice and once for the eval slice, then the cross-corpus band join —
    the relational spelling of operators.decontaminate.
    fuzzy_contaminated_matches."""
    return f"""
    WITH {_pmh_pairs_ctes("(SELECT * FROM documents WHERE source <> 'src0')", "tr")},
    {_pmh_pairs_ctes("(SELECT * FROM documents WHERE source = 'src0')", "ev")}
    SELECT t.doc_id AS doc_id,
           COUNT(DISTINCT t.band)::BIGINT AS n_shared_bands,
           COUNT(DISTINCT e.doc_id)::BIGINT AS n_eval_matches
    FROM trbands t
    JOIN evbands e ON t.band = e.band AND t.bucket = e.bucket
    GROUP BY 1
    """


@query(
    "dd25_fuzzy_decontaminate",
    oracle=_dd25_oracle_sql(),
    tags=("dedup", "EXT", "decontamination", "minhash", "lsh"),
    doc="FUZZY benchmark decontamination (operators.decontaminate."
    "fuzzy_contaminated_matches): MinHash+LSH near-duplicate matching between the "
    "train corpus and the eval slice — the edited-leak class exact n-gram overlap "
    "(dd13/dd20) is blind to by construction (an edit every <n tokens leaves no "
    "shared n-gram; the quality harness's paraphrase 0.000 contract).  The "
    "published remedy (StarCoder/BigCode, Li et al. 2023).  Train side signs once "
    "(the same persistable band index dedup uses); the benchmark-sized eval band "
    "index broadcasts; no train self-join — O(train) like ngram mode.  Portable "
    "hashing here so the match set value-verifies cross-engine; hasher='fast' is "
    "the throughput twin (dd04 convention).",
)
def dd25_fuzzy_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.decontaminate import (
        fuzzy_contaminated_matches,
    )

    d = table(spark, sf_dir, "documents")
    train = d.filter(F.col("source") != "src0")
    ev = d.filter(F.col("source") == "src0")
    return fuzzy_contaminated_matches(train, ev, hasher="portable")


@query(
    "dd26_dedup_weights",
    oracle=r"""
    WITH fp AS (
      SELECT doc_id,
             md5(trim(regexp_replace(lower(text), '[ \t\n\r\f\x0B]+', ' ', 'g'))) AS f
      FROM documents
    ),
    c AS (SELECT f, COUNT(*) AS dup_count FROM fp GROUP BY f)
    SELECT fp.doc_id, c.dup_count,
           1.0 / c.dup_count AS weight
    FROM fp JOIN c USING (f)
    """,
    tags=("dedup", "EXT", "exact", "weights"),
    doc="Duplicate-AWARE exact dedup / soft dedup (operators.dedup_corpus."
    "dedup_weights, mode='downweight'): every copy kept with weight = 1/dup_count, so "
    "expected token mass per unique document matches hard dedup while the multiplicity "
    "signal plain dedup destroys (a page seen 10,000 times is evidence — boilerplate "
    "to review or popularity to upweight deliberately) stays available to weight-aware "
    "samplers.  mode='survivor' is the dd01 drop semantics plus the preserved "
    "dup_count (pytest-verified).  Plan: the dd01 fingerprint groupBy plus one join "
    "back on the fingerprint; the weight is one IEEE division of small exact "
    "integers, so the relation value-hashes cross-engine.",
)
def dd26_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_data_pipeline_spark.operators.dedup_corpus import dedup_weights

    d = table(spark, sf_dir, "documents")
    return dedup_weights(d, mode="downweight").select("doc_id", "dup_count", "weight")
