"""[EXT] N-gram language-model perplexity scoring and bucketing (CCNet).

The published CCNet recipe (Wenzek et al. 2020, "CCNet: Extracting High
Quality Monolingual Datasets from Web Crawl Data") scores every crawl
document with a language model TRAINED ON A TRUSTED REFERENCE CORPUS
(Wikipedia in the paper) and buckets the crawl into head/middle/tail by
per-language perplexity percentiles — the model-based complement of the
heuristic gate batteries (Gopher A1.1/A1.2, C4): a fluent-but-off-domain
or machine-garbled page sails through length/ratio/repetition rules, but
its token transitions are unlikely under a reference LM.

Design for hash-portability (the repo contract: every catalog value must
be bit-identical on any engine):

- The LM is a BIGRAM model with stupid backoff (Brants et al. 2007, "Large
  Language Models in Machine Translation" — the published web-scale choice
  precisely because it needs only counts, no discounting renormalization):

      p(w_i | w_{i-1}) = c(w_{i-1} w_i) / c(w_{i-1})          if seen
                       = 0.4 * (c(w_i) + 1) / (N + V)          otherwise
      p(w_0)           = (c(w_0) + 1) / (N + V)                (add-one)

  Every probability is an exact BIGINT rational num/den (0.4 = 2/5 folds
  into the integers), so no smoothed float ever enters the plan.

- The per-token cost -log2(p) is quantized to EIGHTH-BITS in pure integer
  arithmetic: k = floor(log2(den/num)) via binary-string length
  (length(bin(x)) is exact in both Spark and DuckDB) with a one-step
  shift-compare correction, then a 3-bit mantissa refinement against the
  fixed thresholds round(2^(j/8) * 256), j=1..7.  The quantizer is a
  DEFINED function of (num, den) — max error vs true -log2(p) is
  1/8 bit + threshold rounding (<= 0.127 bits/token — max over the ladder at threshold 431, property-tested) —
  and every step is BIGINT comparison, so document costs value-hash
  identically in any engine (catalog t32).  Safe while den <= 2^53
  (den*470 and den*256 must fit a BIGINT); 2^53/5 ≈ 1.8e15 reference
  tokens is ~100x a 100 TB corpus.

- The document score is a plain BIGINT SUM of per-token costs — integer
  addition is associative, so partition order cannot perturb the hash —
  and ``bits_per_token`` is ONE correctly-rounded IEEE division of that
  sum by 8.0*n, portable by the IEEE-754 contract.

Scale shape (the rare_bigram_scores / dsir_scores family): one positioned
token explode per corpus (~n_tokens rows, the previous token carried in a
2-field struct — the token array itself is never replicated per row), a
bigram-count groupBy and a unigram-count groupBy on the REFERENCE side
(map-side combine; the reference is a fixed trusted slice and does not
grow with the crawl), one shuffle join of the crawl's exploded bigrams
against the bigram table and one against the unigram table (vocabulary
saturates — AQE broadcasts it when it fits), one per-doc integer SUM.
Nothing collects to the driver; no table is assumed to fit anywhere.

Reference parity: /root/reference has no LM scoring (no counterpart —
[EXT] per the round-4+ mandate for training-data pipeline operators).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# round(2^(j/8) * 256) for j = 1..7 — the 3-bit mantissa ladder of the
# eighth-bit log2 quantizer.  Fixed constants, part of the function's
# definition (and of the catalog t32 oracle).
EIGHTH_BIT_THRESHOLDS = (279, 304, 332, 362, 395, 431, 470)

_WS = r"[ \t\n\r\f\x0B]+"


def _toks_sql(text_col: str) -> str:
    return f"filter(split(lower({text_col}), '[ \\\\t\\\\n\\\\r\\\\f\\\\x0B]+'), x -> x != '')"


def _pair_explode(
    docs: DataFrame, id_col: str, text_col: str, group_col: str | None = None
) -> DataFrame:
    """(doc_id[, group], w1, w2) per token position: w2 = token, w1 =
    previous token (NULL at position 0).  Built by exploding an array of
    2-field structs so the full token array is never carried through the
    explode."""
    g = [group_col] if group_col is not None else []
    # Materialize the token array ONCE per row before the pair transform:
    # inlining the split into the lambda would re-tokenize the whole text
    # for EVERY element_at(_, i) — O(n_tokens * n_chars) per document
    # (measured 1.9x on t32, the heaviest text operator).
    return (
        docs.selectExpr(f"{id_col} AS doc_id", *g, f"{_toks_sql(text_col)} AS __toks")
        .selectExpr(
            "doc_id",
            *g,
            """explode(transform(__toks, (t, i) ->
              named_struct(
                'w1', IF(i = 0, CAST(NULL AS STRING),
                         element_at(__toks, i)),
                'w2', t))) AS p""",
        )
        .select("doc_id", *g, "p.w1", "p.w2")
    )


def eighth_bit_cost(num: Column, den: Column) -> Column:
    """Quantized -log2(num/den) in eighth-bits, exact BIGINT arithmetic.

    Requires 1 <= num <= den <= 2^53 (den*470 must fit a signed 64-bit
    integer).  k = floor(log2(den/num)) from binary-digit counts with a
    shift-compare correction; the fractional 3 bits compare the normalized
    mantissa against ``EIGHTH_BIT_THRESHOLDS``.
    """
    k0 = F.length(F.bin(den)) - F.length(F.bin(num))
    # F.shiftleft's python wrapper only takes an int literal for numBits;
    # call_function reaches the SQL ShiftLeft expression, which takes columns.
    shl = lambda a, b: F.call_function("shiftleft", a, b)  # noqa: E731
    k = F.when(shl(num, k0) > den, k0 - F.lit(1)).otherwise(k0)
    m = shl(num, k)
    frac = sum(
        ((den * F.lit(256) >= m * F.lit(t)).cast("int") for t in EIGHTH_BIT_THRESHOLDS),
        F.lit(0),
    )
    return (F.lit(8) * k + frac).cast("long")


def lm_drop_audit(
    docs: DataFrame,
    reference: DataFrame,
    group_col: str,
) -> DataFrame:
    """Per-group count of documents ``lm_score(group_col=)`` will DROP
    because their group has no reference rows (no LM to score them under).

    The drop itself is paper-faithful (CCNet routes by language id first),
    but on a production corpus a typo'd or incomplete reference slice would
    silently shrink the corpus with zero signal — this makes it observable
    BEFORE the scoring pass, the ``minhash_pairs(max_bucket=)`` never-silent
    accounting standard.  Output: (group_col, n_docs_dropped), one row per
    reference-less group (empty when the reference covers every group).

    Cost: one distinct on the reference's group column (vocabulary-sized,
    broadcast into the anti join) + one map-side-combinable groupBy over the
    docs' group column — no token explode, nothing corpus-sized moves.
    """
    ref_groups = reference.select(group_col).distinct()
    return (
        docs.join(F.broadcast(ref_groups), group_col, "left_anti")
        .groupBy(group_col)
        .agg(F.count("*").alias("n_docs_dropped"))
    )


def lm_score(
    docs: DataFrame,
    reference: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ref_text_col: str | None = None,
    group_col: str | None = None,
    dropped_group_log: list | None = None,
) -> DataFrame:
    """Score every document's perplexity under a bigram stupid-backoff LM
    trained on ``reference`` (the CCNet scoring stage; see module doc for
    the exact model and the hash-portable quantization).

    Output per document with >= 1 token: (doc_id, n_tokens, n_backoff,
    n_oov, cost_eighth_bits, bits_per_token) where ``n_backoff`` counts
    positions scored through the backoff branch, ``n_oov`` counts tokens
    absent from the reference vocabulary (they still score, via the
    add-one unigram), ``cost_eighth_bits`` is the exact BIGINT total and
    ``bits_per_token = cost_eighth_bits / (8.0 * n_tokens)`` the document's
    quantized cross-entropy — LOW is reference-like (CCNet's "head").

    ``group_col`` (a column present on BOTH ``docs`` and ``reference``,
    e.g. ``lang``) trains ONE LM PER GROUP — CCNet's actual construction
    (Wenzek 2020 trains a Wikipedia LM per language): counts, totals, and
    vocabulary are all keyed by the group, so an English page is never
    scored against French statistics.  The group key rides the same
    joins (bigram/unigram tables gain one key column; the 1-row totals
    broadcast becomes an n_groups-row broadcast) — no new shuffle class.
    Documents whose group has NO reference rows are DROPPED (there is no
    model to score them under — the paper's pipeline routes by language
    id first for the same reason); the output carries ``group_col``.
    NEVER silent: pass ``dropped_group_log`` (a list) and the dropped
    groups are counted into it as ``(group, n_docs)`` tuples — one extra
    driver action over the bounded ``lm_drop_audit`` relation — so a
    typo'd or incomplete reference slice is observable instead of quietly
    shrinking the corpus (the ``minhash_pairs(max_bucket=)`` accounting
    standard).  Compose with ``perplexity_buckets(group_col=)`` for
    per-group tertiles end to end.
    """
    rtext = ref_text_col or text_col
    g = [group_col] if group_col is not None else []
    if dropped_group_log is not None and group_col is not None:
        dropped_group_log.extend(
            (r[group_col], int(r.n_docs_dropped))
            for r in lm_drop_audit(docs, reference, group_col).collect()
        )
    ref_pairs = _pair_explode(reference, id_col, rtext, group_col=group_col)

    # Reference model tables, ALL derived from ONE positioned-pair
    # aggregation (r15): ``pc`` counts every (w1, w2) pair including the
    # w1-NULL position-0 rows, so the unigram table is a re-aggregation of
    # ``pc`` (sum of pair counts per w2 — every token position appears in
    # exactly one pair row) and the totals are a re-aggregation of the
    # unigram table (n_ref = sum of unigram counts, v_ref = its row count).
    # Previously big/uni/totals each re-ran the reference token explode as
    # their own subplan — three corpus passes over the reference per scoring
    # run; now the explode + pair shuffle appear once and Spark's exchange
    # reuse shares the materialized (w1, w2) exchange between the bigram
    # branch and the unigram re-aggregation (executed t32 plan: 3 reference
    # explodes -> 1, exchanges 18 -> 11).  Values are identical by exact
    # integer arithmetic: same counts, same types, different grouping order.
    pc = ref_pairs.groupBy(*g, "w1", "w2").agg(F.count("*").alias("__c"))
    # c1 attaches to the bigram table by a window over w1 — one counts-table
    # shuffle instead of a second join relation.  The w1-NULL (position-0)
    # rows are deliberately NOT filtered out here: a NULL key never matches
    # an equi-join, so they are unreachable in the scoring join below —
    # and an explicit filter would be pushed below the aggregation by the
    # optimizer, making this branch's explode subplan non-identical to the
    # unigram branch's and defeating the runtime exchange reuse that lets
    # all three model tables share ONE reference pass.
    big = pc.withColumnRenamed("__c", "c12")
    big = big.withColumn("c1", F.sum("c12").over(Window.partitionBy(*g, "w1")))
    uni = pc.groupBy(*g, "w2").agg(F.sum("__c").alias("cu"))
    # The bigram join matches w1 NULL-SAFELY (w2 and the group key stay
    # plain equality).  Value-identical: a position-0 row (w1 NULL) that
    # null-safe-matches a position-0 reference row still scores through the
    # ``w1 IS NULL`` branch of num/den below, which never reads c12/c1 —
    # while a plain-equality key would make the optimizer infer
    # ``isnotnull(w1)`` on the build side, push it below the pair
    # aggregation, and thereby make the bigram branch's explode subplan
    # non-identical to the unigram branch's (defeating the exchange reuse
    # that shares ONE reference pass across all three model tables).
    big_j = big.select(
        *[F.col(c).alias(f"__b_{c}") for c in g + ["w1", "w2"]], "c12", "c1"
    )
    big_cond = F.col("w1").eqNullSafe(F.col("__b_w1")) & (
        F.col("w2") == F.col("__b_w2")
    )
    for c in g:
        big_cond = big_cond & (F.col(c) == F.col(f"__b_{c}"))
    big_drop = [f"__b_{c}" for c in g + ["w1", "w2"]]
    if group_col is None:
        totals = uni.agg(
            F.sum("cu").alias("n_ref"), F.count("*").alias("v_ref")
        )
        scored = (
            _pair_explode(docs, id_col, text_col)
            .join(big_j, big_cond, "left")
            .drop(*big_drop)
            .join(uni, "w2", "left")
            .crossJoin(F.broadcast(totals))
        )
    else:
        totals = uni.groupBy(group_col).agg(
            F.sum("cu").alias("n_ref"), F.count("*").alias("v_ref")
        )
        scored = (
            _pair_explode(docs, id_col, text_col, group_col=group_col)
            .join(big_j, big_cond, "left")
            .drop(*big_drop)
            .join(uni, g + ["w2"], "left")
            # inner: a group with no reference rows has no model — dropped
            .join(F.broadcast(totals), g)
        )
    nv = F.col("n_ref") + F.col("v_ref")
    is_backoff = F.col("w1").isNotNull() & F.col("c12").isNull()
    num = (
        F.when(F.col("w1").isNull(), F.coalesce(F.col("cu"), F.lit(0)) + F.lit(1))
        .when(is_backoff, (F.coalesce(F.col("cu"), F.lit(0)) + F.lit(1)) * F.lit(2))
        .otherwise(F.col("c12"))
        .cast("long")
    )
    den = (
        F.when(F.col("w1").isNull(), nv)
        .when(is_backoff, nv * F.lit(5))
        .otherwise(F.col("c1"))
        .cast("long")
    )
    per_tok = scored.select(
        "doc_id",
        *g,
        is_backoff.cast("int").alias("is_backoff"),
        F.col("cu").isNull().cast("int").alias("is_oov"),
        eighth_bit_cost(num, den).alias("cost"),
    )
    out = per_tok.groupBy("doc_id", *g).agg(
        F.count("*").alias("n_tokens"),
        F.sum("is_backoff").alias("n_backoff"),
        F.sum("is_oov").alias("n_oov"),
        F.sum("cost").alias("cost_eighth_bits"),
    )
    return out.select(
        "doc_id",
        *g,
        "n_tokens",
        "n_backoff",
        "n_oov",
        "cost_eighth_bits",
        (
            F.col("cost_eighth_bits")
            / (F.lit(8.0) * F.col("n_tokens").cast("double"))
        ).alias("bits_per_token"),
    )


def perplexity_buckets(
    scores: DataFrame,
    method: str = "approx",
    bucket_col: str = "ppl_bucket",
    group_col: str | None = None,
) -> DataFrame:
    """CCNet's head/middle/tail bucketing over ``lm_score`` output.

    The paper splits EACH LANGUAGE's crawl at the 33rd/66th perplexity
    percentiles; "head" (lowest perplexity — most reference-like) is what
    high-quality training mixes keep or upsample.  ``group_col`` (e.g. a
    ``lang`` column carried on the scores) is that per-language split —
    tertiles computed within each group, the paper-faithful form; None
    buckets the whole corpus as one group (the catalog t33 shape).

    ``method="approx"`` (the 100 TB path) computes the two thresholds with
    ``approx_percentile`` — a map-side sketch plus one tiny broadcast, the
    corpus never sorts (the adaptive_quality_filter pattern).
    ``method="exact"`` ranks by a window ordered by (bits_per_token,
    doc_id) — deterministic total order for the catalog oracle — and cuts
    at exact thirds: bucket boundaries are integer-rank comparisons
    (3*rank <= n, <= 2n), so the assignment is hash-portable.  Ungrouped,
    the exact path puts the whole corpus through one sort partition (the
    VERIFICATION / bounded-slice contract of the bounded-strata family);
    grouped, each group sorts in its own partition — exact stays viable
    whenever no single language dominates an executor's memory.
    """
    if method == "exact":
        # r15: ``__n`` comes from a COUNT window over the SAME partition key
        # as the rank window (exactly the oracle's construction), not from a
        # groupBy + broadcast join-back — the broadcast build was its own
        # job re-executing the ENTIRE upstream scoring pipeline (for t36
        # that is the full LM pass, ~2 s of single-task document explode per
        # re-execution), while the count window rides the rank window's
        # existing exchange and adds no pass at all.
        if group_col is None:
            w = Window.orderBy("bits_per_token", "doc_id")
            wn = Window.partitionBy()
        else:
            w = Window.partitionBy(group_col).orderBy("bits_per_token", "doc_id")
            wn = Window.partitionBy(group_col)
        ranked = scores.withColumn("__r", F.row_number().over(w)).withColumn(
            "__n", F.count("*").over(wn)
        )
        bucket = (
            F.when(F.col("__r") * 3 <= F.col("__n"), F.lit("head"))
            .when(F.col("__r") * 3 <= F.col("__n") * 2, F.lit("middle"))
            .otherwise(F.lit("tail"))
        )
        return ranked.withColumn(bucket_col, bucket).drop("__r", "__n")
    if method != "approx":
        raise ValueError(f"method must be 'exact' or 'approx', got {method!r}")
    th_expr = F.expr(
        "approx_percentile(bits_per_token, array(0.3333333, 0.6666667), 10000)"
    ).alias("__th")
    if group_col is None:
        th = scores.agg(th_expr).select(
            F.col("__th")[0].alias("__t1"), F.col("__th")[1].alias("__t2")
        )
        cut = scores.crossJoin(F.broadcast(th))
    else:
        th = scores.groupBy(group_col).agg(th_expr).select(
            group_col,
            F.col("__th")[0].alias("__t1"),
            F.col("__th")[1].alias("__t2"),
        )
        cut = scores.join(F.broadcast(th), group_col)
    bucket = (
        F.when(F.col("bits_per_token") <= F.col("__t1"), F.lit("head"))
        .when(F.col("bits_per_token") <= F.col("__t2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return cut.withColumn(bucket_col, bucket).drop("__t1", "__t2")
