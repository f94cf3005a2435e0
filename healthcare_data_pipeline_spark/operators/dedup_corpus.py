"""[EXT] Corpus deduplication front door — pairs in, deduplicated table out.

The query catalog exposes the *stages* of near-dup detection (dd01 exact,
dd06 portable MinHash-LSH pairs, dd08 clusters); production callers need the
composed pipeline: "give me the corpus with duplicates removed".  That is
``dedup_corpus``:

    1. exact dedup      — normalized-text fingerprint groupBy, keep min id
                          (one shuffle; removes the bulk of web-scale dups
                          before any near-dup math runs);
    2. candidate pairs  — portable MinHash-LSH over the exact survivors
                          (``portable_minhash_pairs``, shared with dd06):
                          linear candidate generation, pairs only form inside
                          LSH band buckets — never an all-pairs join;
    3. clusters         — connected components over the pairs
                          (operators.components, O(diameter) shuffle rounds);
    4. canonical filter — drop every non-canonical cluster member via a
                          left-anti join on the removed-id set.

Every stage is a shuffle shape Spark already scales: no BroadcastNestedLoop
join anywhere in the plan (pinned by tests/test_dedup_corpus.py), no driver-
side collect of corpus-scale data.  The brute-force O(N²) variants (dd02/dd03)
exist only as correctness oracles — this front door never routes through them.

Hashing is the fully portable md5+LCG family (bit-identical on any engine),
so the composed pipeline is value-hash-verified end-to-end against a DuckDB
recursive-CTE oracle (query dd09_dedup_corpus).

Reference has no dedup surface (SURVEY.md §2 [EXT]); charter-mandated for
training-data pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from healthcare_data_pipeline_spark.operators.components import connected_components

# Portable MinHash constants: affine permutations of an md5-derived 32-bit
# shingle hash.  Embedded identically in the Spark plan and the generated
# oracle SQL; all arithmetic stays below 2^63 (1e6 * 2^32 + 2^31 < 2^52), so
# signatures are bit-identical on any engine.
PMH_N = 16
PMH_BANDS = 4
PMH_PRIME = 2147483647  # 2^31 - 1


def _pmh_const(k: int, lo: int, hi: int) -> int:
    # LCG stream (same family as operators.similarity.lcg_weight), clamped to
    # a positive range; A coefficients are forced odd.
    v = (1103515245 * k + 12345) % 2147483648
    return lo + v % (hi - lo)


PMH_A = [_pmh_const(1000 + j, 1, 1_000_000) * 2 + 1 for j in range(PMH_N)]
PMH_B = [_pmh_const(2000 + j, 0, PMH_PRIME) for j in range(PMH_N)]

# The "fast" hasher's permutation family: affine transforms of ONE xxhash64
# per shingle (distinct seed range so fast and portable schemes never share
# buckets).  One string hash + N multiply-add-mods per shingle beats N string
# hashes — the standard MinHash construction.
FAST_A = [_pmh_const(3000 + j, 1, 1_000_000) * 2 + 1 for j in range(PMH_N)]
FAST_B = [_pmh_const(4000 + j, 0, PMH_PRIME) for j in range(PMH_N)]

# Word-3-gram shingles from a ``toks`` array column.  The size guard matters:
# Spark's sequence(1, 0) is DESCENDING [1, 0] (not empty like SQL
# generate_series), so without it any document under 3 tokens crashes
# element_at with INVALID_ARRAY_INDEX.  Sub-3-token docs simply produce no
# shingles (the explode drops them from pair generation; exact dedup still
# covers them).
WORD_3GRAMS_SQL = """
    CASE WHEN size(toks) >= 3 THEN transform(
      sequence(1, size(toks) - 2),
      i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1), ' ', element_at(toks, i + 2))
    ) ELSE array() END
"""


def normalized_fingerprint(text_col: str = "text") -> F.Column:
    """md5 of whitespace-normalized (collapsed + trimmed) lowercase text —
    the exact-dedup key.  The trim matters: without it, leading/trailing
    whitespace survives the collapse and otherwise-identical documents get
    distinct fingerprints."""
    return F.md5(F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"[ \t\n\r\f\x0B]+", " ")))


def minhash_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hasher: str = "portable",
    max_bucket: int | None = None,
    dropped_bucket_log: list | None = None,
) -> DataFrame:
    """MinHash+LSH candidate pairs (d1, d2, n_shared_bands).

    ``hasher``:
      * ``"portable"`` — md5-derived 32-bit shingle hashes, ``PMH_N`` affine
        LCG permutations mod 2^31-1, md5 band buckets: every step
        bit-identical on any engine, so the pair set is verifiable against a
        SQL oracle (dd06/dd09).
      * ``"fast"``     — xxhash64 permutations and band buckets (dd04's
        scheme): ~4x cheaper signatures (one JVM hash vs md5 + hex parse per
        shingle), engine-specific — the raw-throughput production choice when
        cross-engine reproducibility isn't required.

    Same plan shape either way: one shuffle to signatures, one on band
    buckets; candidate generation is linear in corpus size (pairs only form
    inside buckets).

    ``max_bucket`` is the skew remediation ``band_skew_report`` informs: a
    (band, bucket) with more members than the cap — in practice template
    spam, whose n² fan-out lands in ONE shuffle partition — is excluded from
    pair generation entirely.  NEVER silent: the cap is opt-in (default
    off), and when ``dropped_bucket_log`` (a list) is supplied the dropped
    buckets are counted into it as ``(n_buckets_dropped, n_docs_affected)``
    — at a cost of one extra driver action — so the run records what it
    skipped.  Docs in a dropped bucket still pair through their other
    ``PMH_BANDS - 1`` bands, and exact dedup covers identical text
    regardless.
    """
    bands = band_buckets(docs, id_col=id_col, text_col=text_col, hasher=hasher)
    if max_bucket is not None:
        counted = bands.groupBy("band", "bucket").agg(F.count("*").alias("__n"))
        if dropped_bucket_log is not None:
            over = counted.filter(F.col("__n") > max_bucket).agg(
                F.count("*").alias("b"), F.coalesce(F.sum("__n"), F.lit(0)).alias("d")
            ).collect()[0]
            dropped_bucket_log.append((over.b, int(over.d)))
        bands = (
            bands.join(
                counted.filter(F.col("__n") <= max_bucket).select("band", "bucket"),
                ["band", "bucket"],
                "left_semi",
            )
        )
    a = bands.select(F.col("doc_id").alias("d1"), "band", "bucket")
    b = bands.select(F.col("doc_id").alias("d2"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("d1") < F.col("d2"))
        .groupBy("d1", "d2")
        .agg(F.count("*").alias("n_shared_bands"))
    )


def band_buckets(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hasher: str = "portable",
) -> DataFrame:
    """The persistable LSH band index: (doc_id, band, bucket), one row per
    band per document.

    This is the state an INCREMENTAL dedup pipeline stores between batches
    (partition/bucket it by ``bucket`` on disk): new documents are indexed
    once and probed against it, so per-batch cost is O(batch), never
    O(corpus).  ``minhash_pairs`` self-joins it; ``dedup_incremental`` joins
    a new batch's index against a stored corpus index.
    """
    if hasher not in ("portable", "fast"):
        raise ValueError(f"unknown hasher {hasher!r}: expected 'portable' or 'fast'")
    rows_per_band = PMH_N // PMH_BANDS
    narrow = docs.selectExpr(f"{id_col} AS doc_id", f"{text_col} AS __text")
    # Small-scan parallelism gate (same rationale as dd04's signature pass):
    # a sub-core-count input — locally, one parquet row group — would run
    # the CPU-heavy shingle explode + per-shingle hashing (md5 on the
    # portable path) on a single task.  Repartitioning by doc_id REPLACES
    # the post-explode signature shuffle (hash(doc_id) satisfies the
    # groupBy's clustering), moving raw text once instead; at scale input
    # splits exceed core count and this is a no-op, keeping the map-side
    # partial-min + tiny signature shuffle as the production shape.
    target = narrow.sparkSession.sparkContext.defaultParallelism
    if narrow.rdd.getNumPartitions() < target:
        narrow = narrow.repartition(target, "doc_id")
    # explode_OUTER + null filter, not plain explode (r15): an inner
    # explode's inferred ``size(...) > 0`` filter (InferFiltersFromGenerate)
    # substitutes the whole split + 3-gram construction and pushes it below
    # the repartition — re-tokenizing every document on the single
    # row-group-starved scan task.  Outer generates infer nothing; <3-token
    # docs (empty shingle array) emit one NULL row each, dropped by the
    # cheap generated-column filter — exactly the docs inner explode
    # dropped ("sub-3-token docs simply produce no shingles", above).
    sh = (
        narrow.selectExpr("doc_id", "split(lower(__text), '[ \\\\t\\\\n\\\\r\\\\f\\\\x0B]+') AS toks")
        .selectExpr("doc_id", f"explode_outer(array_distinct({WORD_3GRAMS_SQL})) AS s")
        .filter(F.col("s").isNotNull())
    )
    if hasher == "portable":
        h32 = F.conv(F.substring(F.md5("s"), 1, 8), 16, 10).cast("long")
        a_consts, b_consts = PMH_A, PMH_B
    else:
        # pmod clamps the engine hash to 31 bits so a*h+b stays < 2^52
        h32 = F.pmod(F.xxhash64(F.col("s")), F.lit(2147483648))
        a_consts, b_consts = FAST_A, FAST_B
    mins = [
        F.min(
            (F.lit(a_consts[j]).cast("long") * F.col("h32") + F.lit(b_consts[j])) % PMH_PRIME
        ).alias(f"mh{j}")
        for j in range(PMH_N)
    ]
    sh = sh.withColumn("h32", h32)
    sig = sh.groupBy("doc_id").agg(*mins)

    def bucket(bi: int) -> F.Column:
        cols = [F.col(f"mh{bi * rows_per_band + r}") for r in range(rows_per_band)]
        if hasher == "portable":
            return F.md5(F.concat_ws(",", *[c.cast("string") for c in cols]))
        return F.xxhash64(*cols).cast("string")

    return sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(bi).alias("band"), bucket(bi).alias("bucket"))
                    for bi in range(PMH_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


# Shingle document-frequency cap shared by every exact shingle-join pass
# (dd02 Jaccard, containment): shingles appearing in more than this many docs
# are boilerplate, carry no dedup signal, and would blow the join fan-out.
MAX_SHINGLE_DF = 50


def df_capped_shingles(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_shingle_df: int = MAX_SHINGLE_DF,
) -> DataFrame:
    """(doc_id, s): the DF-capped word-3-gram shingle relation shared by the
    exact shingle-join passes (dd02 Jaccard, dd16 containment).

    r15 shape fixes, both value-neutral: the small-scan repartition gate
    (band_buckets' rationale — the tokenize + 3-gram explode is the heavy
    map work and must not serialize onto a row-group-starved single scan
    task; no-op at scale) and explode_outer + a generated-column null
    filter instead of inner explode (an inner explode's inferred
    ``size(...) > 0`` filter re-runs the whole shingle construction below
    the repartition on that same single task)."""
    narrow = docs.selectExpr(f"{id_col} AS doc_id", f"{text_col} AS __text")
    target = narrow.sparkSession.sparkContext.defaultParallelism
    if narrow.rdd.getNumPartitions() < target:
        narrow = narrow.repartition(target, "doc_id")
    sh = (
        narrow.selectExpr("doc_id", "split(lower(__text), '[ \\\\t\\\\n\\\\r\\\\f\\\\x0B]+') AS toks")
        .selectExpr("doc_id", f"explode_outer(array_distinct({WORD_3GRAMS_SQL})) AS s")
        .filter(F.col("s").isNotNull())
    )
    keep = sh.groupBy("s").agg(F.count("*").alias("df")).filter(F.col("df") <= max_shingle_df)
    return sh.join(keep.select("s"), "s")


def containment_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_shingle_df: int = MAX_SHINGLE_DF,
) -> DataFrame:
    """ASYMMETRIC near-dup detection: |A∩B| / |A| over word-3-gram shingle
    sets — the "document A is embedded in document B" case (boilerplate
    wrapping, quote expansion, template + payload) that RESEMBLANCE measures
    miss by construction: a small doc fully contained in a 10x larger one
    has Jaccard |A|/|B| ~ 0.1 and MinHash collides with probability ~J, so
    neither dd02's threshold nor the LSH banding surfaces it.

    Output: (contained, container, n_common, containment) — one row per
    direction at or above ``threshold``.  Candidate generation is the same
    DF-capped shingle-equality join as the exact Jaccard pass: per-shingle
    fan-out is bounded by ``max_shingle_df``² and template shingles (the
    containment workload's natural skew) are excluded by the cap, so the
    join stays linear-ish in corpus size; at 100 TB run it per LSH bucket or
    per dup-cluster (dd09's output) rather than corpus-wide.
    """
    shk = df_capped_shingles(
        docs, id_col=id_col, text_col=text_col, max_shingle_df=max_shingle_df
    )
    # NOT persisted (r16 A/B: persist LOST decisively, 1.56 vs 2.46 s min,
    # 5/5 clean interleaved reps): unlike containment_for_pairs — whose
    # candidate generator is the full banding pipeline — shk's two
    # identically-keyed self-join sides already share one exchange at
    # runtime, so the cache write of corpus-wide shingle rows costs more
    # than the size denominator's single re-run saves.
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
    both = inter.join(s1, "d1").join(s2, "d2")
    return _both_directions(both, threshold)


def _both_directions(both: DataFrame, threshold: float) -> DataFrame:
    """(d1, d2, n_common, n_sh1, n_sh2) -> one row per direction at/above
    ``threshold``.  A single explode(array(struct, struct)) projection, NOT
    a self-union: a union of two selects over the same child duplicates the
    whole upstream subtree in the physical plan (every scan/exchange above
    it runs twice), while the explode emits both directions in one pass."""
    return (
        both.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("d1").alias("contained"),
                        F.col("d2").alias("container"),
                        F.col("n_common").alias("n_common"),
                        (
                            F.col("n_common").cast("double") / F.col("n_sh1").cast("double")
                        ).alias("containment"),
                    ),
                    F.struct(
                        F.col("d2").alias("contained"),
                        F.col("d1").alias("container"),
                        F.col("n_common").alias("n_common"),
                        (
                            F.col("n_common").cast("double") / F.col("n_sh2").cast("double")
                        ).alias("containment"),
                    ),
                )
            ).alias("r")
        )
        .select("r.*")
        .filter(F.col("containment") >= threshold)
    )


def containment_for_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Containment scores for a GIVEN candidate pair set — the scoped form
    of ``containment_pairs`` (its docstring's "at 100 TB run it per LSH
    bucket or per dup-cluster" knob, made concrete).

    ``pairs`` is any (d1, d2) candidate relation: LSH band collisions
    (``minhash_pairs``), dd09's dup clusters expanded pairwise, or a
    metadata blocking key.  Instead of the corpus-wide DF-capped
    shingle-equality SELF-join (whose fan-out is bounded but global), each
    candidate pair joins d1's shingle set against d2's: total work is
    sum over pairs of |shingles(d1)| — LINEAR in the candidate count with a
    per-pair constant, and docs in no pair are pruned before the shingle
    explode.  Recall caveat, documented not hidden: LSH candidates are
    resemblance-biased, so a small-doc-in-huge-doc containment pair with
    tiny Jaccard may never become a candidate — corpus-wide
    ``containment_pairs`` (with its DF cap) is the discovery pass; this is
    the cheap verification/scoring pass over an existing candidate or
    cluster structure.

    Output schema matches ``containment_pairs``: (contained, container,
    n_common, containment), one row per direction at/above ``threshold``.
    """
    # Canonicalize orientation BEFORE distinct: a candidate relation holding
    # both (a,b) and (b,a) would otherwise score each direction's output row
    # twice (the docstring promises "any (d1, d2) candidate relation"), and
    # self-pairs (a,a) would emit a spurious containment=1.0 row.  Output is
    # unaffected for already-canonical inputs (LSH candidates emit d1 < d2),
    # since _both_directions scores both orientations regardless.
    from pyspark import StorageLevel

    p = (
        pairs.select(
            F.least(F.col("d1"), F.col("d2")).alias("d1"),
            F.greatest(F.col("d1"), F.col("d2")).alias("d2"),
        )
        .filter(F.col("d1") != F.col("d2"))
        # Persist the canonical candidate set (r16): ``p`` feeds the paired-id
        # semi join AND the intersection join, so an expensive candidate
        # generator (dd17 passes the full portable-MinHash banding pipeline —
        # an md5 per shingle) otherwise re-executes per consumer.  Candidate
        # pairs are banding-bounded (the whole point of LSH candidates), so
        # this is the dd11 O(batch)-persist budget class; MEMORY_ONLY means
        # eviction recomputes, never fails.
        .distinct()
        .persist(StorageLevel.MEMORY_ONLY)
    )
    # one explode, not a two-select self-union (which would run the whole
    # candidate-generation subtree twice in the physical plan)
    ids = p.select(F.explode(F.array("d1", "d2")).alias("doc_id")).distinct()
    # Shingles for paired docs only, exploded DIRECTLY in the projection:
    # materializing the distinct-shingle ARRAY as its own multi-consumer
    # column (to derive n_sh via F.size without the groupBy) measured ~7x
    # SLOWER at every scale — the standalone array column pushes the
    # Generate out of whole-stage codegen, while the inline explode keeps
    # the whole split->3gram->distinct->explode chain fused.  The groupBy
    # denominator rides sh's existing shuffle; it is not the cost center.
    sh = (
        docs.join(ids, docs[id_col] == ids["doc_id"], "left_semi")
        .selectExpr(
            f"{id_col} AS doc_id",
            f"split(lower({text_col}), '[ \\\\t\\\\n\\\\r\\\\f\\\\x0B]+') AS toks",
        )
        .selectExpr("doc_id", f"explode(array_distinct({WORD_3GRAMS_SQL})) AS s")
        # Three consumers on DIFFERENT keys (the size denominator's doc_id
        # aggregation, the d1 join, the (d2, s) join — no exchange reuse
        # possible, unlike containment_pairs' identically-keyed self-join)
        # otherwise re-run the tokenize->3gram->distinct explode chain per
        # consumer.  Paired-doc shingles only (docs in no candidate pair are
        # pruned above), MEMORY_ONLY — eviction recomputes, never fails.
        # Isolated A/B keeps it: 2.34 vs 2.85 s min without, 5/5 clean.
        .persist(StorageLevel.MEMORY_ONLY)
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    # pair ⋈ d1-shingles on d1, then ⋈ d2-shingles on (d2, s): each surviving
    # row is one common shingle of one candidate pair
    inter = (
        p.join(sh.select(F.col("doc_id").alias("d1"), "s"), "d1")
        .join(sh.select(F.col("doc_id").alias("d2"), "s"), ["d2", "s"])
        .groupBy("d1", "d2")
        .agg(F.count("*").alias("n_common"))
    )
    s1 = sizes.select(F.col("doc_id").alias("d1"), F.col("n_sh").alias("n_sh1"))
    s2 = sizes.select(F.col("doc_id").alias("d2"), F.col("n_sh").alias("n_sh2"))
    both = inter.join(s1, "d1").join(s2, "d2")
    return _both_directions(both, threshold)


def portable_minhash_pairs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The engine-portable (oracle-verifiable) configuration of
    ``minhash_pairs`` — the candidate stage dd06 exposes as a catalog query
    and dd09 composes into full deduplication."""
    return minhash_pairs(docs, id_col=id_col, text_col=text_col, hasher="portable")


def dedup_weights(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "survivor",
) -> DataFrame:
    """Duplicate-AWARE exact dedup (soft dedup): instead of silently
    dropping copies, carry the multiplicity so downstream mixing can use
    it — a document seen 10,000 times on the web is EVIDENCE (boilerplate
    to review, or popularity worth a deliberate upweight), and plain dedup
    destroys that signal.

    ``mode='survivor'``: keep the smallest-id copy of each exact-duplicate
    cluster, with ``dup_count`` = cluster size and ``weight = 1.0`` — the
    dd01 drop semantics plus the preserved frequency signal.
    ``mode='downweight'``: keep EVERY copy with ``weight = 1/dup_count`` —
    expected token mass per unique document equals the survivor form, but
    copies stay available for weight-aware samplers and shard balance.

    Exact-duplicate clusters only (the ``normalized_fingerprint`` key);
    near-dup cluster sizes already exist via ``dedup_clusters`` (dd08).
    One fingerprint groupBy with map-side combine + one join back keyed on
    the fingerprint — the dd01 plan plus one join, nothing new at 100 TB.
    """
    if mode not in ("survivor", "downweight"):
        raise ValueError(f"mode must be 'survivor' or 'downweight', got {mode!r}")
    fp = docs.withColumn("__fp", normalized_fingerprint(text_col))
    clusters = fp.groupBy("__fp").agg(
        F.count("*").alias("dup_count"), F.min(id_col).alias("__keep")
    )
    joined = fp.join(clusters, "__fp")
    if mode == "survivor":
        joined = joined.filter(F.col(id_col) == F.col("__keep")).withColumn(
            "weight", F.lit(1.0)
        )
    else:
        joined = joined.withColumn(
            "weight", F.lit(1.0) / F.col("dup_count").cast("double")
        )
    return joined.drop("__fp", "__keep")


def dedup_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_shared_bands: int = 1,
    hasher: str = "portable",
    max_bucket: int | None = None,
    dropped_bucket_log: list | None = None,
) -> DataFrame:
    """Deduplicated corpus: ``docs`` minus exact and near duplicates, keeping
    the minimum-id document of every duplicate group.  All original columns
    are preserved.

    ``min_shared_bands`` tightens near-dup sensitivity (1 = any shared LSH
    band forms a candidate edge; raise it to require stronger signature
    agreement before documents merge into one cluster).  ``max_bucket`` /
    ``dropped_bucket_log`` forward the skew cap to ``minhash_pairs`` (size
    the cap from ``band_skew_report`` first).  ``hasher`` selects
    the signature family (see ``minhash_pairs``): "portable" is oracle-
    verifiable, "fast" (xxhash64) is ~4x cheaper for production runs that
    don't need cross-engine reproducibility.

    The exact stage is a window (row_number over the fingerprint, min-id
    first), NOT a groupBy + join-back: one shuffle of the corpus instead of a
    light aggregation shuffle plus a full-width sort-merge join-back — at
    corpus scale the keeper-id set is ~N rows, so the join-back would not
    broadcast.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("__fp").orderBy(F.col(id_col).asc())
    kept = (
        docs.withColumn("__fp", normalized_fingerprint(text_col))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__fp", "__rn")
    )
    pairs = minhash_pairs(
        kept,
        id_col=id_col,
        text_col=text_col,
        hasher=hasher,
        max_bucket=max_bucket,
        dropped_bucket_log=dropped_bucket_log,
    ).filter(
        F.col("n_shared_bands") >= min_shared_bands
    )
    comp = connected_components(pairs, "d1", "d2")
    removed = comp.filter(F.col("component") < F.col("vertex")).select(
        F.col("vertex").alias(id_col)
    )
    return kept.join(removed, id_col, "left_anti")


def dup_rate_report(
    docs: DataFrame, group_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """Per-``group_col`` exact-duplicate statistics — the curation diagnostic
    that runs BEFORE anyone dedups: columns (group, n_docs, n_exact_dups,
    dup_rate), where n_exact_dups counts the docs a fingerprint dedup would
    drop (docs minus distinct fingerprints).

    One hash-aggregate pass: count + exact count-distinct per group — a
    two-level aggregation Spark combines map-side; nothing corpus-sized
    crosses the shuffle beyond (group, fingerprint) partials.
    """
    return (
        docs.select(F.col(group_col).alias("group"), normalized_fingerprint(text_col).alias("__fp"))
        .groupBy("group")
        .agg(
            F.count("*").alias("n_docs"),
            (F.count("*") - F.countDistinct("__fp")).alias("n_exact_dups"),
        )
        .select(
            "group",
            "n_docs",
            "n_exact_dups",
            (F.col("n_exact_dups").cast("double") / F.col("n_docs")).alias("dup_rate"),
        )
    )


def band_skew_report(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hasher: str = "portable",
) -> DataFrame:
    """Per-band LSH bucket-occupancy diagnostic — the pre-flight check an
    operator runs BEFORE launching a corpus-scale dedup: columns
    (band, n_docs, n_buckets, max_bucket, multi_buckets, candidate_pairs).

    ``candidate_pairs`` (Σ over buckets of n·(n−1)/2) is the EXACT join
    fan-out the banding self-join will produce, and ``max_bucket`` is the
    skew ceiling — one template-spammed bucket with 10^6 members means
    5·10^11 candidate pairs in a single shuffle partition.  Catching that
    number here costs two narrow aggregations (per-(band,bucket) partial
    counts map-side, then a per-band rollup; nothing doc-sized crosses the
    second shuffle); catching it mid-run costs a dead executor.
    """
    bb = band_buckets(docs, id_col=id_col, text_col=text_col, hasher=hasher)
    per_bucket = bb.groupBy("band", "bucket").agg(F.count("*").alias("n"))
    return per_bucket.groupBy("band").agg(
        F.sum("n").cast("long").alias("n_docs"),
        F.count("*").alias("n_buckets"),
        F.max("n").cast("long").alias("max_bucket"),
        F.sum(F.when(F.col("n") >= 2, 1).otherwise(0)).cast("long").alias("multi_buckets"),
        (F.sum(F.col("n") * (F.col("n") - 1)) / 2).cast("long").alias("candidate_pairs"),
    )


def corpus_fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The persistable exact-dedup index: distinct normalized fingerprints —
    the second piece of incremental-dedup state alongside ``band_buckets``."""
    return docs.select(normalized_fingerprint(text_col).alias("fingerprint")).distinct()


def dedup_incremental(
    new_docs: DataFrame,
    corpus_bands: DataFrame,
    corpus_fps: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hasher: str = "portable",
) -> DataFrame:
    """Dedupe a NEW batch against an already-deduplicated corpus without
    touching corpus-scale data: per-batch cost is O(batch), never O(corpus).

    The corpus contributes only its stored indexes — ``corpus_bands``
    (band_buckets output, ideally disk-bucketed by ``bucket``) and
    ``corpus_fps`` (corpus_fingerprints output).  Three stages:

      1. drop new docs whose fingerprint already exists (exact, semi-join);
      2. drop new docs sharing ANY LSH band bucket with the corpus (near,
         semi-join on (band, bucket) — the same candidate rule the batch
         pipeline uses, minus the rescoring the raw pairs would need);
      3. ``dedup_corpus`` within the remainder (new-vs-new duplicates).

    Returns the surviving new documents; append them — plus their
    band_buckets/corpus_fingerprints rows — to the stored indexes for the
    next batch.  This is the daily-ingest shape at 100 TB: the corpus is
    only ever READ via its two compact indexes, and — join-direction matters —
    never SHUFFLED: a semi/anti join with the batch on the left would force
    the corpus-sized right side through an exchange (semi joins broadcast
    only their right side).  Instead each probe streams the corpus index
    through a broadcast-hash join against the batch's (tiny) key set, then
    anti-joins the small hit set back into the batch; every exchange in the
    plan is batch-sized.
    """
    from pyspark import StorageLevel

    stamped = new_docs.withColumn("__fp", normalized_fingerprint(text_col))
    # r15: persist the batch-sized intermediates.  Every stage below is a
    # diamond — ``no_exact`` feeds the band signing AND the final anti join,
    # ``nb`` feeds the probe's broadcast build AND the semi join, and each
    # BROADCAST build is its own job re-executing the whole upstream subplan
    # (the fingerprint probe, the md5-per-shingle signature pass) from the
    # scan up.  Unpersisted, one dd11 run signed the batch 4x and stamped
    # fingerprints 6x (~90 jobs, 18 s at sf0.1; 3 band-signature passes of
    # the ~6 were pure recomputation).  Persisting is scale-safe HERE by the
    # operator's own contract: everything derived from ``new_docs`` is
    # O(batch), never O(corpus) — the corpus-side inputs stay unpersisted
    # streamed scans.  MEMORY_ONLY: an evicted block recomputes, it never
    # fails the query (the dd04 signature-table precedent).
    # Lifecycle (r15 advice): the persists live until the RETURNED lazy
    # DataFrame is materialized, so this function cannot unpersist them
    # itself — a long-lived driver ingesting many batches must call
    # ``spark.catalog.clearCache()`` (or unpersist via the storage tab)
    # between batches or the O(batch) blocks accumulate; MEMORY_ONLY means
    # eviction reclaims them under pressure, at recompute cost.
    no_exact = stamped.join(
        F.broadcast(probe_fingerprint_index(stamped, corpus_fps)), "__fp", "left_anti"
    ).persist(StorageLevel.MEMORY_ONLY)
    nb = band_buckets(no_exact, id_col=id_col, text_col=text_col, hasher=hasher).persist(
        StorageLevel.MEMORY_ONLY
    )
    near_hits = (
        nb.join(
            F.broadcast(probe_band_index(nb, corpus_bands)), ["band", "bucket"], "left_semi"
        )
        .select(F.col("doc_id").alias(id_col))
        .distinct()
    )
    remainder = (
        no_exact.join(near_hits, id_col, "left_anti")
        .drop("__fp")
        .persist(StorageLevel.MEMORY_ONLY)
    )
    return dedup_corpus(remainder, id_col=id_col, text_col=text_col, hasher=hasher)


def probe_fingerprint_index(stamped: DataFrame, corpus_fps: DataFrame) -> DataFrame:
    """Corpus fingerprints that collide with the batch (``__fp`` rows).

    Join direction is the scale contract: the corpus index is the STREAMED
    side of a broadcast-hash semi-join against the batch's distinct key set —
    the corpus is scanned but never shuffled.  The result is at most
    batch-sized, so the caller can broadcast it straight into an anti-join.
    """
    return corpus_fps.join(
        F.broadcast(stamped.select(F.col("__fp").alias("fingerprint")).distinct()),
        "fingerprint",
        "left_semi",
    ).select(F.col("fingerprint").alias("__fp"))


def probe_band_index(batch_bands: DataFrame, corpus_bands: DataFrame) -> DataFrame:
    """Corpus (band, bucket) keys that collide with the batch's LSH bands —
    same streamed-corpus broadcast-probe shape as the fingerprint probe; the
    result is bounded by the batch's band count."""
    return (
        corpus_bands.join(
            F.broadcast(batch_bands.select("band", "bucket").distinct()),
            ["band", "bucket"],
            "left_semi",
        )
        .select("band", "bucket")
        .distinct()
    )


def remove_boilerplate_lines(
    docs: DataFrame,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    line_sep: str = "\n",
) -> DataFrame:
    """LINE-level boilerplate removal — the RefinedWeb/CCNet curation stage
    (Penedo et al. 2023 §"line-wise filtering"; CCNet's per-line dedup):
    delete every line whose trimmed form occurs in at least ``min_docs``
    DISTINCT documents, keep the rest of each document in order.  Nav bars,
    cookie banners, footers and license blocks repeat verbatim across pages
    at far higher rates than full documents do, so document-level dedup
    (dd01/dd09) never sees them and span dedup (``remove_duplicate_spans``)
    only catches them when they happen to align into k-token windows — the
    line is the natural unit the published pipelines use.

    Semantics mirror the span stage one rung up: within-document repetition
    alone does NOT trigger removal (``min_docs`` counts distinct docs);
    whitespace-only lines are structure, not boilerplate — they are never
    counted and never removed; matching is on the TRIMMED line (indentation
    does not protect a banner) while the surviving text keeps its original
    lines verbatim, rejoined with ``line_sep``.  Audit columns ``n_lines``
    and ``n_removed_lines`` make the deletion accountable per document.

    Scale shape (dd19's, at line granularity, strictly cheaper): one line
    explode (~n_lines rows — lines are ~10x rarer than token spans), one
    groupBy(trimmed line) with map-side combine for the distinct-doc count,
    one left-semi join of line occurrences back against the duplicated set,
    one per-doc groupBy collecting removed positions (bounded by doc
    length), one join back to the docs table; the per-line keep test is a
    scalar ``array_contains`` — codegen, no second explode, no shuffle.

    ``line_sep`` is used as the split REGEX and the rejoin literal; the
    default newline is both.  Catalog dd22 value-hash-verifies the full
    rebuilt text + audit counts against a relational DuckDB oracle.
    """
    base = docs.withColumn("__lines", F.split(F.col(text_col), line_sep))
    lines = (
        base.select(F.col(id_col).alias("__did"), F.posexplode("__lines").alias("__p0", "__line"))
        .select("__did", (F.col("__p0") + 1).alias("__lpos"), F.trim(F.col("__line")).alias("__key"))
        .filter(F.col("__key") != "")
    )
    dup = (
        lines.groupBy("__key")
        .agg(F.count_distinct("__did").alias("__nd"))
        .filter(F.col("__nd") >= min_docs)
        .select("__key")
    )
    removed = (
        lines.join(dup, "__key", "left_semi")
        .groupBy("__did")
        .agg(F.sort_array(F.collect_set("__lpos")).alias("__rm"))
    )
    joined = (
        base.join(removed, F.col(id_col) == F.col("__did"), "left")
        .drop("__did")
        .withColumn("__rmp", F.coalesce(F.col("__rm"), F.array().cast("array<int>")))
        .withColumn(
            "__kept",
            F.expr("filter(__lines, (x, i) -> NOT array_contains(__rmp, i + 1))"),
        )
    )
    return (
        joined.withColumn("n_lines", F.size("__lines"))
        .withColumn("n_removed_lines", F.size("__rmp"))
        .withColumn(text_col, F.array_join("__kept", line_sep))
        .drop("__lines", "__rm", "__rmp", "__kept")
    )


def remove_duplicate_spans(
    docs: DataFrame,
    k: int = 8,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_spans: bool = False,
    count_mode: str = "docs",
) -> DataFrame:
    """CROSS-DOCUMENT duplicated-span removal — the passage-level third rung
    of the dedup ladder (exact doc dd01, near-dup doc dd06/dd09, and now
    sub-document): delete every ``k``-token span that occurs verbatim in at
    least ``min_docs`` DISTINCT documents, keep the rest of each document
    intact.  This is the shingle-granularity approximation of exact
    substring deduplication (Lee et al., "Deduplicating Training Data Makes
    Language Models Better") and the token-stream analogue of RefinedWeb/
    CCNet line-level boilerplate removal: headers, footers, license blocks
    and template wrappers recur across documents even when no two documents
    are near-duplicates, so document-level dedup never sees them.

    Semantics: a token position survives iff NO duplicated span covers it;
    overlapping duplicated spans merge naturally (their covered ranges
    union).  With the default ``count_mode='docs'``, within-document
    repetition alone does NOT trigger removal (``min_docs`` counts distinct
    docs) — looping/boilerplate *inside* one doc is t18's detector, and
    removing it is a quality call, not dedup.  ``count_mode='occurrences'``
    switches to Lee et al.'s corpus-suffix semantics: ``min_docs`` counts
    total OCCURRENCES anywhere, so a span repeated inside one document is
    duplicated too (what ``exact_substring_dedup`` uses).
    The cleaned ``text_col`` is rebuilt from surviving tokens joined by a
    single space (whitespace-normalizing, like ``normalized_fingerprint``);
    audit columns (n_tokens, n_removed, n_dup_spans) make the deletion
    accountable per document.

    Scale shape — the rare_bigram_scores family, nothing quadratic:
    one span explode (~n_tokens rows, each span string k tokens wide — the
    inherent k× byte amplification of any shingle method; ``hash_spans=True``
    collapses each span to 8 bytes via xxhash64 BEFORE the shuffle, the
    100 TB form), one groupBy(span) with map-side combine for the df count,
    one left-semi join of span occurrences back against the duplicated set
    (both sides clustered by span), one per-doc groupBy collecting duplicated
    start positions (bounded by doc length), one join back to the docs table.
    The per-token coverage test then runs as a pure column expression
    (filter + exists over the bounded starts array) — no second explode, no
    shuffle.  Catalog entry dd19_span_dedup value-hash-verifies the string
    path end-to-end; the xxhash64 path is equivalence-tested in pytest.
    """
    base = docs.withColumn("__toks", F.split(F.col(text_col), r"[ \t\n\r\f\x0B]+"))
    span_str = F.transform(
        F.sequence(F.lit(1), F.size("__toks") - (k - 1)),
        lambda i: F.array_join(F.slice("__toks", i, k), " "),
    )
    spans = (
        base.select(F.col(id_col).alias("__did"), "__toks")
        .filter(F.size("__toks") >= k)
        .select("__did", F.posexplode(span_str).alias("__p0", "__span"))
        .select(
            "__did",
            (F.col("__p0") + 1).alias("__spos"),
            (F.xxhash64("__span") if hash_spans else F.col("__span")).alias("__key"),
        )
    )
    if count_mode not in ("docs", "occurrences"):
        raise ValueError(
            f"count_mode must be 'docs' or 'occurrences', got {count_mode!r}"
        )
    counter = (
        F.count_distinct("__did") if count_mode == "docs" else F.count("*")
    )
    dup = (
        spans.groupBy("__key")
        .agg(counter.alias("__nd"))
        .filter(F.col("__nd") >= min_docs)
        .select("__key")
    )
    starts = (
        spans.join(dup, "__key", "left_semi")
        .groupBy("__did")
        .agg(F.sort_array(F.collect_set("__spos")).alias("__starts"))
    )
    joined = (
        base.join(starts, F.col(id_col) == F.col("__did"), "left")
        .drop("__did")
        .withColumn("__st", F.coalesce(F.col("__starts"), F.array().cast("array<int>")))
        .withColumn(
            "__kept",
            F.expr(
                f"filter(__toks, (x, i) -> "
                f"NOT exists(__st, s -> i + 1 >= s AND i + 1 <= s + {k - 1}))"
            ),
        )
    )
    return (
        joined.withColumn("n_tokens", F.size("__toks"))
        .withColumn("n_removed", F.size("__toks") - F.size("__kept"))
        .withColumn("n_dup_spans", F.size("__st"))
        .withColumn(text_col, F.array_join("__kept", " "))
        .drop("__toks", "__starts", "__st", "__kept")
    )


def exact_substring_dedup(
    docs: DataFrame,
    min_len: int = 50,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_spans: bool = True,
) -> DataFrame:
    """EXACT-SUBSTRING deduplication at the published semantics (Lee et al.
    2022, "Deduplicating Training Data Makes Language Models Better", §4.1
    ExactSubstr: remove every substring of >= 50 tokens that occurs more
    than once in the corpus — their reference implementation builds a
    corpus-wide suffix array).  Same OUTPUT as the suffix-array pass, as a
    relational plan:

    **Equivalence** (why aligned windows at k = min_len ARE the gold
    standard, not an approximation of it): a token position is inside some
    duplicated substring of length >= min_len  ⇔  it is covered by some
    duplicated min_len-token window.  (⇐) a duplicated window IS a
    duplicated substring of exactly min_len tokens.  (⇒) if position p lies
    in a duplicated run of length m >= min_len, the run's min_len-wide
    sub-windows are each duplicated verbatim wherever the run recurs, and
    they tile every position of the run, p included.  So the union of
    covered positions — which ``remove_duplicate_spans`` deletes — equals
    the union of maximal duplicated runs >= min_len, which is precisely
    what the suffix-array pass deletes.  Seam behavior is therefore also
    identical: a window straddling two independently-planted copies that
    happens to recur verbatim IS a duplicated >= min_len substring, and the
    published method removes it too (the dedup-quality harness measures
    this seam rate on planted substrings rather than pretending it away).

    Two deliberate deltas from the dd19 curation default, both paper-true:
    ``min_count`` counts total OCCURRENCES (a substring repeated twice
    inside ONE document is duplicated — suffix arrays don't know document
    boundaries), and ``hash_spans`` defaults ON: every window collapses to
    an 8-byte xxhash64 BEFORE the shuffle, so shuffle bytes are flat in
    min_len (the k-gram string form would carry ~min_len x the corpus —
    at min_len=50 that is the difference between shuffling the corpus once
    and fifty times).  An xxhash64 collision joining two unrelated windows
    needs ~2^32 distinct windows to reach even-odds corpus-wide
    (birthday bound) and costs a spurious removal, not corruption; the
    catalog entry (dd24) verifies the string path against the DuckDB
    oracle, and the hash path is equivalence-tested in pytest.

    Cost shape: identical to ``remove_duplicate_spans`` (one explode, one
    map-side-combined groupBy, one semi-join, one bounded per-doc collect,
    one join back) — linear in corpus tokens, every key doc-agnostic but
    hash-uniform (skew-safe).  The suffix array's O(n log n) global sort
    with cross-partition runs is exactly the construction that does NOT
    distribute; this plan trades it for the one extra window explode.
    """
    return remove_duplicate_spans(
        docs,
        k=min_len,
        min_docs=min_count,
        id_col=id_col,
        text_col=text_col,
        hash_spans=hash_spans,
        count_mode="occurrences",
    )
