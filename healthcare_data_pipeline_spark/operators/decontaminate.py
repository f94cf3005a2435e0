"""[EXT] Benchmark decontamination — drop training documents that overlap an
eval set.

The stage every serious training pipeline runs before a model sees data:
remove from the 100 TB training corpus anything that collides with held-out
evaluation sets, so benchmark numbers measure generalization, not leakage.
Two collision definitions, both deterministic:

* **exact** — whitespace-normalized md5 fingerprint equality (the dd01 key,
  operators.dedup_corpus.normalized_fingerprint).
* **ngram** — any shared word n-gram (the GPT-3-style 13-gram overlap rule;
  ``n`` is a knob, catalog dd13 pins n=3 so the synthetic corpus exhibits
  observable contamination).
* **bloom** — the same n-gram rule through a Bloom filter of the eval grams
  (catalog dd20): deterministic false positives at a sized rate, NO false
  negatives (every true collision is always flagged — the direction that
  matters for decontamination, where a false positive costs one training
  doc and a false negative leaks a benchmark).
* **fuzzy** — MinHash+LSH near-duplicate matching between train and eval
  (catalog dd25): the NEAR-verbatim leak class the n-gram rule is blind to
  by construction (an edit every <n tokens leaves no shared n-gram — the
  quality harness's measured ``paraphrase 0.000`` contract).  This is the
  published remedy: StarCoder/BigCode (Li et al. 2023) decontaminate by
  MinHash near-dup against benchmark solutions precisely because light
  rewrites survive exact overlap rules.  Train docs band-bucket once
  (operators.dedup_corpus.band_buckets — the SAME index dedup persists,
  reusable); the eval side's tiny band index broadcasts; a train doc is
  contaminated when >= ``min_shared_bands`` of its bands collide with any
  eval doc.  Recall follows the published 1-(1-J^r)^b curve of the 4x4
  banding, measured per planted family in SCALE.md §quality.

Scale shape: the EVAL side is always the small one (benchmarks are KBs-MBs
against a TB-scale train side), so its distinct n-gram/fingerprint set is
broadcast; the train side is one linear explode + broadcast-hash semi-join
to find contaminated ids, then a broadcast anti-join.  No shuffle of the
train corpus at any point — the whole pass is map-side.

The bloom mode exists because at full eval-suite scale even the broadcast
has a cost: hundreds of benchmarks × 13-grams is easily 10^8 distinct gram
STRINGS (~10 GB as a broadcast hash relation — past Spark's 8 GB broadcast
ceiling and most executors' comfort).  The Bloom bitmap is O(m_bits) — a
fixed 128 KiB at the default 2^20 bits — REGARDLESS of eval gram count.
The batch path (``_bloom_hit_ids``) is explode → scalar bit tests →
distinct over the hit ids → broadcast anti-join: every per-gram expression
is scalar, so the train pass stays inside whole-stage codegen and measures
at ngram-mode speed (SCALE.md) while the train corpus never shuffles (the
one exchange carries only the contaminated candidate ids).  The tempting
alternative — a per-row ``exists()`` over the gram array, no explode at
all — runs INTERPRETED (Spark evaluates higher-order functions outside
codegen) at ~2-4x the cost; it survives as ``flag_bloom`` for streams,
where a stateless row predicate needs no per-batch join or state store.

Hashing is a two-speed family over the same affine-LCG construction (the
dd04/dd06 twin pattern, distinct seed range): ``hasher="fast"`` (default)
feeds xxhash64 per gram; ``hasher="portable"`` feeds the md5-derived h32,
bit-identical in Spark and DuckDB, so bit positions, bitmap, and false
positives included are all value-verified by dd20's oracle — "all k bits
set" is equivalent to "each position ∈ the set of positions written by
some eval gram", which is plain relational SQL.  Build and probe must use
the same hasher (``decontaminate``/``contaminated_ids`` thread it through;
``collect_bloom``/``flag_bloom`` pairs must be called with matching
values).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from healthcare_data_pipeline_spark.localrel import local_relation

from healthcare_data_pipeline_spark.operators.dedup_corpus import (
    PMH_PRIME,
    _pmh_const,
    band_buckets,
    normalized_fingerprint,
)

DEFAULT_NGRAM = 13

# THE default per-gram hasher, shared by every bloom entry point public or
# private — a build/probe pair that disagrees on the hasher produces silent
# FALSE NEGATIVES (leaked benchmarks), so the default must be a single
# module-level fact, never re-stated per signature.
DEFAULT_HASHER = "fast"

# Bloom hash family: k affine transforms of the portable 32-bit md5 hash
# (seed ranges 5000/6000 — disjoint from the MinHash 1000/2000 and fast
# 3000/4000 families, so bloom positions never correlate with LSH buckets).
# k=3 with the default m=2^20 bits gives FPP ≈ (1 - e^(-3n/m))^3 — under
# 1e-5 per gram at n=15k eval grams; size m up for bigger eval suites
# (m = -n·ln(p)/ln(2)² bits for a target p).
BLOOM_K = 3
BLOOM_M = 1 << 20
BLOOM_A = [_pmh_const(5000 + j, 1, 1_000_000) * 2 + 1 for j in range(BLOOM_K)]
BLOOM_B = [_pmh_const(6000 + j, 0, PMH_PRIME) for j in range(BLOOM_K)]

# Per-gram hash feeding the affine family, two speeds (the dd04/dd06 twin
# pattern): "fast" is xxhash64 masked to a nonnegative 31-bit value — one
# cheap JVM hash per gram, the production default; "portable" is the first
# 8 hex chars of md5 as an integer — bit-identical in Spark and DuckDB
# (queries/dedup._SQL_H32 is the DuckDB spelling), which is what lets dd20
# hash-verify even the false positives cross-engine.  md5 is ~5x the cost
# of the whole ngram-mode anti-join at scale (SCALE.md), so portable is for
# verification, fast for the 100 TB pass.
def _h32_sql(col: str, hasher: str = DEFAULT_HASHER) -> str:
    if hasher == "fast":
        return f"(xxhash64({col}) & 2147483647)"
    if hasher != "portable":
        raise ValueError(f"hasher must be 'fast' or 'portable', got {hasher!r}")
    return f"CAST(conv(substring(md5({col}), 1, 8), 16, 10) AS BIGINT)"


def _bloom_pos_sql(j: int, h: str, m_bits: int) -> str:
    """Bit position of hash ``h`` under the j-th bloom hash function."""
    return f"((({BLOOM_A[j]} * {h} + {BLOOM_B[j]}) % {PMH_PRIME}) % {m_bits})"


def word_ngrams_sql(n: int, toks: str = "toks") -> str:
    """Spark SQL expr: word n-grams of a ``toks`` array column (empty array
    below n tokens — guards the descending-sequence gotcha)."""
    joined = ", ' ', ".join(f"element_at({toks}, i + {j})" for j in range(n))
    return (
        f"CASE WHEN size({toks}) >= {n} THEN transform("
        f"sequence(1, size({toks}) - {n - 1}), i -> concat({joined})"
        f") ELSE array() END"
    )


def _exploded_ngrams(df: DataFrame, n: int, id_col: str, text_col: str) -> DataFrame:
    # Inner explode is correct HERE (r15 note): its inferred
    # ``size(...) > 0`` filter lands in the SAME codegen stage as the
    # generate (no exchange between scan and explode in this pipeline), so
    # subexpression elimination already evaluates the gram construction
    # once — the explode_outer rewrite that pays off behind a repartition
    # (band_buckets, bpe_tokens) only added overhead here (A/B: dd13
    # 0.88 -> 0.94 s, reverted).
    return df.selectExpr(
        id_col, f"split(lower({text_col}), '[ \\\\t\\\\n\\\\r\\\\f\\\\x0B]+') AS toks"
    ).selectExpr(id_col, f"explode(array_distinct({word_ngrams_sql(n)})) AS g")


def bloom_m_bits(n_grams: int, target_fpp: float = 1e-4, k: int = BLOOM_K) -> int:
    """Bitmap size for an expected eval gram count and per-gram false-positive
    target, rounded UP to a multiple of 64 (whole words) with a 2^20 floor.

    Sized for the module's FIXED ``k`` hash functions, NOT the textbook
    ``m = -n·ln(p)/ln(2)²`` — that formula assumes the OPTIMAL k ≈
    (m/n)·ln2 (~13 hashes at p=1e-4), and with only k=3 probes it
    under-sizes ~3×: realized per-gram FPP is ``(1-e^{-kn/m})^k``, measured
    at ~30× a 1e-4 target under textbook sizing (the dedup-quality harness
    caught this).  Solving the realized formula for m gives
    ``m = k·n / -ln(1 - p^(1/k))`` — ~63 bits/gram at k=3, p=1e-4.
    Per-DOC false-positive rate compounds over a doc's novel grams
    (≈ g·p for g grams), so pick ``target_fpp`` with the corpus's typical
    doc length in mind; bits are cheap (8 bytes per 64 grams)."""
    import math

    if n_grams < 0 or not (0.0 < target_fpp < 1.0) or k < 1:
        raise ValueError(
            f"need n_grams >= 0, 0 < target_fpp < 1, k >= 1, got {n_grams}, {target_fpp}, {k}"
        )
    m = int(math.ceil(k * n_grams / -math.log(1.0 - target_fpp ** (1.0 / k))))
    m = ((m + 63) // 64) * 64
    return max(m, BLOOM_M)


def bloom_bitmap(
    eval_df: DataFrame,
    n: int = DEFAULT_NGRAM,
    m_bits: int = BLOOM_M,
    id_col: str = "doc_id",
    text_col: str = "text",
    hasher: str = DEFAULT_HASHER,
) -> DataFrame:
    """ONE-row DataFrame [``bm``: array<bigint>, length m_bits/64] — the
    packed Bloom bitmap of ``eval_df``'s distinct word n-grams.

    Built distributed (gram explode → k positions → word-index bit_or), then
    densified on the single aggregate row via transform(sequence(...)) with
    zeros for untouched words — nothing is ever collected to the driver; the
    row broadcasts as the standard 1×1 scalar combine.  An empty eval side
    yields an all-zero bitmap (nothing flagged), not an error.
    """
    if m_bits % 64 != 0 or m_bits <= 0:
        raise ValueError(f"m_bits must be a positive multiple of 64, got {m_bits}")
    n_words = m_bits // 64
    ev = _exploded_ngrams(eval_df, n, id_col, text_col).select("g").distinct()
    positions = ", ".join(_bloom_pos_sql(j, "h32", m_bits) for j in range(BLOOM_K))
    pos = (
        ev.selectExpr(f"{_h32_sql('g', hasher)} AS h32")
        .selectExpr(f"explode(array({positions})) AS p")
        .distinct()
    )
    words = pos.selectExpr(
        "CAST(p DIV 64 AS INT) AS w",
        "shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT)) AS mask",
    )
    wm = words.groupBy("w").agg(F.expr("bit_or(mask)").alias("bits"))
    # Densify via a range LEFT join + ONE ordered collect, then a linear
    # field extract.  (The tempting alternative — collect into a MAP and
    # element_at(map, i) per index — is quadratic: Spark map lookup is a
    # linear scan and higher-order functions run interpreted, measured 14s
    # for 2^20 bits vs ~0.3s for this shape.)
    dense = (
        wm.sparkSession.range(n_words)
        .select(F.col("id").cast("int").alias("w"))
        .join(wm, "w", "left")
        .select("w", F.coalesce("bits", F.lit(0).cast("bigint")).alias("bits"))
        .agg(F.array_sort(F.collect_list(F.struct("w", "bits"))).alias("arr"))
        .selectExpr("transform(arr, x -> x.bits) AS bm")
    )
    return dense


def _bloom_hit_sql(grams_expr: str, m_bits: int, bm_col: str = "bm", hasher: str = DEFAULT_HASHER) -> str:
    """SQL predicate: any gram in ``grams_expr`` has all BLOOM_K bits set in
    the ``bm_col`` bitmap column.  The gram hash runs once per gram
    (transform to h32 first), the k bit tests stay inside whole-stage
    codegen.  ``hasher`` must match the one the bitmap was built with."""
    tests = " AND ".join(
        f"(element_at({bm_col}, CAST({_bloom_pos_sql(j, 'h', m_bits)} DIV 64 AS INT) + 1) & "
        f"shiftleft(CAST(1 AS BIGINT), CAST({_bloom_pos_sql(j, 'h', m_bits)} % 64 AS INT))) != 0"
        for j in range(BLOOM_K)
    )
    return f"exists(transform({grams_expr}, g -> {_h32_sql('g', hasher)}), h -> {tests})"


def collect_bloom(
    eval_df: DataFrame,
    n: int = DEFAULT_NGRAM,
    m_bits: int = BLOOM_M,
    id_col: str = "doc_id",
    text_col: str = "text",
    hasher: str = DEFAULT_HASHER,
) -> list[int]:
    """The packed bitmap as a driver-side list of longs — m_bits/8 bytes
    (128 KiB at the default) REGARDLESS of eval gram count, the one thing
    about the eval suite small enough to embed in a task closure.  This is
    the form streaming gates take (``flag_bloom``): the bitmap becomes a
    single array literal, so an unbounded stream gets decontamination as a
    STATELESS row predicate — no per-batch join, no state store.

    The returned list is a ``BloomWords`` — a plain ``list[int]`` that also
    carries the ``hasher`` (and ``n``) it was built with, so probe sites can
    DETECT a build/probe hasher mismatch instead of silently producing false
    negatives (``flag_bloom`` validates the tag; untagged plain lists from
    external persistence still work but skip the check)."""
    words = list(
        bloom_bitmap(eval_df, n=n, m_bits=m_bits, id_col=id_col, text_col=text_col, hasher=hasher)
        .first()["bm"]
    )
    return BloomWords(words, hasher=hasher, n=n)


class BloomWords(list):
    """``list[int]`` bitmap words tagged with the build-time ``hasher`` and
    gram size ``n``.  Subclassing list keeps every existing consumer working
    (iteration, len, json serialization of the values) while letting
    ``flag_bloom`` refuse a mismatched probe — the failure mode that matters
    here is SILENT (a wrong-hasher probe flags almost nothing, i.e. leaks
    benchmarks), so the tag exists to turn it into a loud error."""

    def __init__(self, words, hasher: str = DEFAULT_HASHER, n: int = DEFAULT_NGRAM):
        super().__init__(words)
        self.hasher = hasher
        self.n = n


def _resolve_probe_hasher(bloom_words, hasher: str | None) -> str:
    """The hasher a probe must use for ``bloom_words``: the bitmap's own tag
    when present (raising on an explicit contradiction), else the caller's
    argument, else DEFAULT_HASHER."""
    tag = getattr(bloom_words, "hasher", None)
    if tag is not None:
        if hasher is not None and hasher != tag:
            raise ValueError(
                f"bloom bitmap was built with hasher={tag!r} but the probe asked for "
                f"{hasher!r}; a mismatched probe silently produces false negatives "
                "(leaked benchmarks), so this is refused"
            )
        return tag
    return hasher if hasher is not None else DEFAULT_HASHER


def flag_bloom(
    df: DataFrame,
    bloom_words: list[int],
    n: int | None = None,
    text_col: str = "text",
    out_col: str = "__hit",
    hasher: str | None = None,
) -> DataFrame:
    """``df`` + boolean ``out_col``: bloom says this row shares an n-gram
    with the eval suite ``bloom_words`` was built from (``collect_bloom``).
    Stateless per row — streaming-safe (stream-static broadcast of the one
    bitmap row), shuffle-free, no join relation.

    ``hasher``/``n`` default to the bitmap's own build-time tag when
    ``bloom_words`` is a ``collect_bloom`` result (``BloomWords``); passing
    explicit values that contradict the tag raises — a wrong-hasher or
    wrong-n probe flags almost nothing, silently leaking benchmarks.
    Untagged plain lists fall back to DEFAULT_HASHER / DEFAULT_NGRAM.

    Delivery detail: the bitmap rides as a ONE-ROW static DataFrame through
    the standard 1×1 broadcast combine, NOT as an inline array literal — a
    16K-element ``F.lit(list)`` becomes a CreateArray expression that Spark
    re-evaluates per input row (measured ~17s over 5k docs vs ~1s for the
    broadcast row)."""
    hasher = _resolve_probe_hasher(bloom_words, hasher)
    tag_n = getattr(bloom_words, "n", None)
    if tag_n is not None and n is not None and n != tag_n:
        raise ValueError(
            f"bloom bitmap was built over {tag_n}-grams but the probe asked for "
            f"n={n}; a mismatched gram size silently produces false negatives"
        )
    n = n if n is not None else (tag_n if tag_n is not None else DEFAULT_NGRAM)
    m_bits = len(bloom_words) * 64
    # LocalRelation (localrel.py): skips the Python-RDD scan tasks under the
    # broadcast build; falls back to createDataFrame past the size gate.
    bm = local_relation(
        df.sparkSession, [(list(bloom_words),)], "__bm array<bigint>"
    )
    return (
        df.withColumn(
            "__bm_toks", F.expr(f"split(lower({text_col}), '[ \\\\t\\\\n\\\\r\\\\f\\\\x0B]+')")
        )
        .withColumn("__bm_grams", F.expr(word_ngrams_sql(n, toks="__bm_toks")))
        .crossJoin(F.broadcast(bm))
        .withColumn(out_col, F.expr(_bloom_hit_sql("__bm_grams", m_bits, bm_col="__bm", hasher=hasher)))
        .drop("__bm_toks", "__bm_grams", "__bm")
    )


def _bloom_hit_ids(
    train: DataFrame,
    eval_df: DataFrame,
    n: int,
    m_bits: int,
    id_col: str,
    text_col: str,
    hasher: str = DEFAULT_HASHER,
) -> DataFrame:
    """Distinct ids of train docs where some n-gram has all k bloom bits set.

    The batch form is explode → plain-expression bit tests → distinct over
    the HIT ids only: every per-gram expression is scalar, so the whole
    train pass stays inside whole-stage codegen — measured at ngram-mode
    speed (SCALE.md), where the tempting exists()-over-grams-array predicate
    runs interpreted (Spark evaluates higher-order functions outside
    codegen) at ~2-4x the cost.  The train corpus itself never shuffles:
    explode+filter are map-side; the one exchange carries only the
    contaminated candidate ids (bounded by actual contamination — the same
    assumption ngram mode's anti-join makes).  The per-ROW predicate form
    survives as ``flag_bloom`` for streams, where a stateless filter beats
    a per-batch join."""
    bm = bloom_bitmap(eval_df, n=n, m_bits=m_bits, id_col=id_col, text_col=text_col, hasher=hasher)
    tests = " AND ".join(
        f"(element_at(bm, CAST({_bloom_pos_sql(j, 'h', m_bits)} DIV 64 AS INT) + 1) & "
        f"shiftleft(CAST(1 AS BIGINT), CAST({_bloom_pos_sql(j, 'h', m_bits)} % 64 AS INT))) != 0"
        for j in range(BLOOM_K)
    )
    return (
        train.selectExpr(
            id_col, f"split(lower({text_col}), '[ \\\\t\\\\n\\\\r\\\\f\\\\x0B]+') AS __toks"
        )
        .selectExpr(id_col, f"explode({word_ngrams_sql(n, toks='__toks')}) AS __g")
        .selectExpr(id_col, f"{_h32_sql('__g', hasher)} AS h")
        .crossJoin(F.broadcast(bm))
        .where(tests)
        .select(id_col)
        .distinct()
    )


def fuzzy_contaminated_matches(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: str | None = None,
    hasher: str = "portable",
    min_shared_bands: int = 1,
    eval_bands: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate contamination matches: training docs whose MinHash
    band buckets collide with any eval doc's (module doc, bullet "fuzzy").

    Output: (doc_id, n_shared_bands, n_eval_matches) for every train doc
    with >= ``min_shared_bands`` distinct colliding bands; ``n_eval_matches``
    counts distinct eval docs hit — the audit column a leak report needs.

    Scale shape: the train side runs ONE signature pass (shingle explode +
    map-side partial mins — the identical ``band_buckets`` relation an
    incremental dedup pipeline already persists, so a production run can
    join the STORED index instead of re-signing); the eval side's band
    index is benchmark-sized and broadcast.  No train self-join, no train
    shuffle beyond its own signature groupBy — O(train) like ngram mode.

    ``hasher="portable"`` (md5/LCG, catalog dd25 hash-verifies the match
    set cross-engine) or ``"fast"`` (xxhash64, the throughput path) — the
    dd04/dd06 twin convention.  At the default 4-band/4-row shape a leak
    with shingle-Jaccard J survives detection with prob (1-J^4)^4; raise
    recall for heavily edited leaks by lowering rows-per-band, measured in
    SCALE.md §quality (decon_fuzzy families).
    """
    if min_shared_bands < 1:
        raise ValueError(f"need min_shared_bands >= 1, got {min_shared_bands}")
    tb = band_buckets(train, id_col=id_col, text_col=text_col, hasher=hasher)
    # ``eval_bands``: a precomputed/persisted band_buckets(eval) relation
    # (columns doc_id, band, bucket) — lets a repeated caller (streaming
    # ingest's per-micro-batch decon) sign the eval side ONCE instead of
    # re-hashing it every batch.  Must have been built with the same hasher.
    if eval_bands is None:
        eval_bands = band_buckets(
            eval_df,
            id_col=id_col,
            text_col=eval_text_col or text_col,
            hasher=hasher,
        )
    eb = eval_bands.select(F.col("doc_id").alias("__eval_id"), "band", "bucket")
    hits = tb.join(F.broadcast(eb), ["band", "bucket"])
    # band_buckets normalizes the id to "doc_id" internally; surface the
    # caller's id_col so decontaminate/contaminated_ids/contamination_report
    # can .select(id_col)/anti-join on it regardless of the input schema.
    return (
        hits.groupBy("doc_id")
        .agg(
            F.countDistinct("band").alias("n_shared_bands"),
            F.countDistinct("__eval_id").alias("n_eval_matches"),
        )
        .filter(F.col("n_shared_bands") >= min_shared_bands)
        .withColumnRenamed("doc_id", id_col)
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    mode: str = "ngram",
    n: int = DEFAULT_NGRAM,
    id_col: str = "doc_id",
    text_col: str = "text",
    m_bits: int = BLOOM_M,
    hasher: str = DEFAULT_HASHER,
    fuzzy_hasher: str = "portable",
    min_shared_bands: int = 1,
    eval_bands: DataFrame | None = None,
) -> DataFrame:
    """Training rows minus those colliding with ``eval_df`` (all original
    columns preserved).  ``mode="bloom"`` applies the same n-gram rule via a
    fixed-size Bloom bitmap (``m_bits``) — no false negatives, sized false
    positives, zero train-side shuffle; the 100 TB form when the eval gram
    set outgrows a comfortable broadcast.  ``mode="fuzzy"`` drops MinHash
    NEAR-duplicates of eval docs (``fuzzy_contaminated_matches``) — the
    edited-leak class every n-gram rule misses.  ``eval_bands`` short-cuts
    the fuzzy eval signing with a precomputed band index."""
    if mode == "fuzzy":
        hits = fuzzy_contaminated_matches(
            train, eval_df, id_col=id_col, text_col=text_col,
            hasher=fuzzy_hasher, min_shared_bands=min_shared_bands,
            eval_bands=eval_bands,
        ).select(id_col)
        return train.join(F.broadcast(hits), id_col, "left_anti")
    if mode == "bloom":
        hits = _bloom_hit_ids(train, eval_df, n, m_bits, id_col, text_col, hasher)
        return train.join(F.broadcast(hits), id_col, "left_anti")
    if mode == "exact":
        ev = eval_df.select(normalized_fingerprint(text_col).alias("__fp")).distinct()
        return (
            train.withColumn("__fp", normalized_fingerprint(text_col))
            .join(F.broadcast(ev), "__fp", "left_anti")
            .drop("__fp")
        )
    contaminated = contaminated_ids(
        train, eval_df, mode=mode, n=n, id_col=id_col, text_col=text_col
    )
    return train.join(F.broadcast(contaminated), id_col, "left_anti")


def contaminated_ids(
    train: DataFrame,
    eval_df: DataFrame,
    mode: str = "ngram",
    n: int = DEFAULT_NGRAM,
    id_col: str = "doc_id",
    text_col: str = "text",
    m_bits: int = BLOOM_M,
    hasher: str = DEFAULT_HASHER,
    fuzzy_hasher: str = "portable",
    min_shared_bands: int = 1,
    eval_bands: DataFrame | None = None,
) -> DataFrame:
    """Ids of training docs colliding with the eval set — the small set both
    ``decontaminate`` (anti-join) and ``contamination_report`` (flag join)
    broadcast; bounded by the actual overlap, not by corpus size."""
    if mode == "fuzzy":
        return fuzzy_contaminated_matches(
            train, eval_df, id_col=id_col, text_col=text_col,
            hasher=fuzzy_hasher, min_shared_bands=min_shared_bands,
            eval_bands=eval_bands,
        ).select(id_col)
    if mode == "bloom":
        return _bloom_hit_ids(train, eval_df, n, m_bits, id_col, text_col, hasher)
    if mode == "exact":
        ev = eval_df.select(normalized_fingerprint(text_col).alias("__fp")).distinct()
        return (
            train.withColumn("__fp", normalized_fingerprint(text_col))
            .join(F.broadcast(ev), "__fp", "left_semi")
            .select(id_col)
            .distinct()
        )
    if mode != "ngram":
        raise ValueError(
            f"unknown decontaminate mode {mode!r}: expected 'exact', 'ngram', 'bloom', or 'fuzzy'"
        )
    ev = _exploded_ngrams(eval_df, n, id_col, text_col).select("g").distinct()
    return (
        _exploded_ngrams(train, n, id_col, text_col)
        .join(F.broadcast(ev), "g", "left_semi")
        .select(id_col)
        .distinct()
    )


def contamination_report(
    train: DataFrame,
    eval_df: DataFrame,
    mode: str = "ngram",
    n: int = DEFAULT_NGRAM,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    m_bits: int = BLOOM_M,
    hasher: str = DEFAULT_HASHER,
    fuzzy_hasher: str = "portable",
    min_shared_bands: int = 1,
) -> DataFrame:
    """Per-``group_col`` contamination statistics — the DIAGNOSTIC twin of
    ``decontaminate``: instead of dropping overlapping training docs, report
    how many each slice has (curation decisions need the rate before anyone
    deletes data).  Columns: group, n_docs, n_contaminated, contamination_rate.

    Same scale shape as decontaminate: the eval side is exploded/broadcast,
    the train side is never shuffled — the contaminated-id set (bounded by
    train doc count but in practice benchmark-overlap-sized) broadcasts back
    for the flag join, and the group aggregation combines map-side.
    """
    bad = contaminated_ids(
        train, eval_df, mode=mode, n=n, id_col=id_col, text_col=text_col,
        m_bits=m_bits, hasher=hasher,
        fuzzy_hasher=fuzzy_hasher, min_shared_bands=min_shared_bands,
    ).withColumn("__bad", F.lit(True))
    return (
        train.join(F.broadcast(bad), id_col, "left")
        .groupBy(F.col(group_col).alias("group"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("__bad"), 1).otherwise(0)).alias("n_contaminated"),
        )
        .select(
            "group",
            "n_docs",
            "n_contaminated",
            (F.col("n_contaminated").cast("double") / F.col("n_docs")).alias(
                "contamination_rate"
            ),
        )
    )
