"""[EXT] Corpus quality filtering front door — the C4-style cleaning gate.

The text queries expose the SIGNALS (t01 token counts, t02 quality score,
t03 language heuristic); a training-data pipeline needs the composed FILTER:
"give me the corpus minus the junk".  ``filter_corpus`` applies the standard
pre-training gates — word-count band, average-word-length cap, optional
stopword-ratio floor (the language/quality proxy) — as one pure-column-
expression predicate: a single narrow scan, no shuffle, trivially pushed
ahead of every downstream stage (dedup, embedding, tokenization), which is
exactly where a 100 TB pipeline wants its cheapest, most selective filter.

Catalog entry t07_quality_filter pins the composition against a SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from healthcare_data_pipeline_spark.queries.text import GOPHER_STOPWORDS, STOPWORDS


def quality_predicate(
    text_col: str = "text",
    min_words: int = 20,
    max_words: int = 1000,
    max_avg_word_len: float = 12.0,
    min_stopword_ratio: float | None = None,
) -> Column:
    """The reusable gate expression (also usable on a streaming ingest)."""
    toks = F.split(F.lower(F.col(text_col)), r"[ \t\n\r\f\x0B]+")
    n_words = F.size(toks)
    avg_word_len = (F.length(text_col) - n_words + 1).cast("double") / n_words.cast("double")
    pred = n_words.between(min_words, max_words) & (avg_word_len <= max_avg_word_len)
    if min_stopword_ratio is not None:
        stop_ratio = (
            F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS))).cast("double")
            / n_words.cast("double")
        )
        pred = pred & (stop_ratio >= min_stopword_ratio)
    return pred


def filter_corpus(
    docs: DataFrame,
    text_col: str = "text",
    min_words: int = 20,
    max_words: int = 1000,
    max_avg_word_len: float = 12.0,
    min_stopword_ratio: float | None = None,
) -> DataFrame:
    """``docs`` minus documents failing the quality gates; all columns kept."""
    return docs.filter(
        quality_predicate(
            text_col,
            min_words=min_words,
            max_words=max_words,
            max_avg_word_len=max_avg_word_len,
            min_stopword_ratio=min_stopword_ratio,
        )
    )


def gopher_quality_flags(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The published Gopher document-quality rule set (Rae et al. 2021,
    appendix A1.1) as per-document flags — the industry-standard heuristic
    battery a crawl pipeline runs before any model-based scoring:

    - ``flag_word_count``:   50 ≤ words ≤ 100,000
    - ``flag_mean_word_len``: mean word length in [3, 10] chars
    - ``flag_hash_ratio``:   '#'-to-word ratio ≤ 0.1
    - ``flag_ellipsis_ratio``: '...'/'…'-to-word ratio ≤ 0.1
    - ``flag_bullet_lines``: ≤ 90% of (non-empty) lines start with a bullet
    - ``flag_ellipsis_lines``: ≤ 30% of lines end with an ellipsis
    - ``flag_alpha_words``:  ≥ 80% of words contain an alphabetic char
    - ``flag_stopwords``:    ≥ 2 distinct Gopher stopwords present
    - ``gopher_pass``:       AND of all eight

    Every threshold is evaluated in INTEGER arithmetic (``10*count ≤ n``
    instead of ``count/n ≤ 0.1``), so the flags are bit-identical in any
    engine — catalog t27 hash-verifies all eight against DuckDB.  One
    projection, no shuffle, no UDF: the whole battery is a single codegen
    stage over the scan.
    """
    prepared = docs.selectExpr(id_col, _gopher_counts_sql(text_col) + " AS g").selectExpr(
        id_col, "g.*"
    )
    out = prepared.selectExpr(
        id_col,
        "n_words",
        "n_lines",
        *[f"({sql}) AS {name}" for name, sql in _GOPHER_FLAGS.items()],
        f"({_GOPHER_PASS_SQL}) AS gopher_pass",
    )
    return out


def _gopher_counts_sql(text_col: str) -> str:
    """One struct-valued SQL expression with every count the flags need —
    shared by the flag projection and the inline filter predicate."""
    ws = "[ \\\\t\\\\n\\\\r\\\\f\\\\x0B]+"
    toks = f"filter(split(lower({text_col}), '{ws}'), x -> x != '')"
    lines = f"filter(split({text_col}, '\\n'), l -> l != '')"
    stop_sum = " + ".join(
        f"IF(array_contains({toks}, '{w}'), 1, 0)" for w in GOPHER_STOPWORDS
    )
    return f"""named_struct(
      'n_words', size({toks}),
      'n_lines', size({lines}),
      'total_chars', aggregate({toks}, 0, (acc, x) -> acc + length(x)),
      'hash_cnt', length({text_col}) - length(replace({text_col}, '#', '')),
      'ellipsis_cnt', CAST((length({text_col}) - length(replace({text_col}, '...', ''))) DIV 3
        + length({text_col}) - length(replace({text_col}, '…', '')) AS INT),
      'bullet_lines', size(filter({lines}, l -> substring(l, 1, 1) = '•'
        OR substring(l, 1, 2) = '- ' OR substring(l, 1, 2) = '* ')),
      'ellipsis_lines', size(filter({lines}, l -> substring(l, length(l) - 2, 3) = '...'
        OR substring(l, length(l), 1) = '…')),
      'alpha_words', size(filter({toks}, x -> x rlike '[a-z]')),
      'n_stopwords', {stop_sum}
    )"""


_GOPHER_FLAGS = {
    "flag_word_count": "n_words BETWEEN 50 AND 100000",
    "flag_mean_word_len": "3 * n_words <= total_chars AND total_chars <= 10 * n_words",
    "flag_hash_ratio": "10 * hash_cnt <= n_words",
    "flag_ellipsis_ratio": "10 * ellipsis_cnt <= n_words",
    "flag_bullet_lines": "10 * bullet_lines <= 9 * n_lines",
    "flag_ellipsis_lines": "10 * ellipsis_lines <= 3 * n_lines",
    "flag_alpha_words": "5 * alpha_words >= 4 * n_words",
    "flag_stopwords": "n_stopwords >= 2",
}
_GOPHER_PASS_SQL = " AND ".join(f"({sql})" for sql in _GOPHER_FLAGS.values())


def gopher_filter(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """``docs`` minus Gopher-rule failures (all original columns kept) —
    a stateless row predicate (streaming-safe, joins nothing, broadcasts
    nothing): the counts struct is computed once per row, tested, dropped;
    the whole battery stays one codegen stage over the scan."""
    pass_sql = _GOPHER_PASS_SQL
    for field in (
        "n_words",
        "n_lines",
        "total_chars",
        "hash_cnt",
        "ellipsis_cnt",
        "bullet_lines",
        "ellipsis_lines",
        "alpha_words",
        "n_stopwords",
    ):
        pass_sql = pass_sql.replace(field, f"__g.{field}")
    return (
        docs.withColumn("__g", F.expr(_gopher_counts_sql(text_col)))
        .filter(F.expr(pass_sql))
        .drop("__g")
    )


def stopword_ratio(text_col: str = "text") -> Column:
    """The default quality score: stopword fraction of the token bag — an
    IEEE-exact double (small-int division), so rankings on it reproduce
    bit-identically in any engine."""
    toks = F.split(F.lower(F.col(text_col)), r"[ \t\n\r\f\x0B]+")
    return (
        F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS))).cast("double")
        / F.size(toks).cast("double")
    )


def adaptive_quality_filter(
    docs: DataFrame,
    drop_pct: int = 20,
    group_col: str = "source",
    id_col: str = "doc_id",
    score: Column | None = None,
    method: str = "exact",
) -> DataFrame:
    """Distribution-aware quality gate: drop the WORST ``drop_pct`` percent
    of each group by score, instead of a fixed threshold.

    Fixed gates (``filter_corpus``) treat every slice alike, but corpus
    slices have different score distributions — a threshold that trims web
    spam decimates a transcript source.  Percentile gates are how production
    curation actually specifies quality budgets ("drop the bottom 20% per
    source").

    ``method='exact'``: per-group rank ascending by (score, id); the bottom
    ``floor(drop_pct * n / 100)`` rows drop — integer boundary arithmetic,
    so the kept set reproduces exactly in any engine (catalog t21).  Cost:
    one shuffle + per-group sort; a group's ranking lives in one partition,
    so this is for bounded strata or post-sampled slices.  Tie semantics
    differ from approx BY DESIGN: exact drops exactly ``floor(n*pct/100)``
    rows (the (score, id) ordering breaks score ties deterministically, so
    part of a tie mass at the boundary can drop), while approx keeps the
    ENTIRE tie mass at the threshold — on tie-heavy scores (stopword_ratio
    over short docs) the two methods' retained rates can differ well beyond
    sketch error.  Exact = a hard row budget; approx = a score threshold.

    ``method='approx'``: the 100 TB path — one ``approx_percentile`` pass
    computes a per-group threshold (map-side sketches, no sort), broadcast
    back as a narrow filter.  Keeps ~the same rows, not bit-exactly (sketch
    error), so it is rate-tested, not value-oracled.  Tie semantics: rows
    whose score EQUALS the per-group threshold are KEPT (``>=``, erring
    toward keeping) — scores like stopword_ratio are tie-heavy on short
    docs, and a strict ``>`` would drop an entire mass point sitting at the
    percentile, far exceeding ``drop_pct``.
    """
    if not 0 <= drop_pct < 100:
        raise ValueError(f"drop_pct must be in [0, 100), got {drop_pct}")
    if method not in ("exact", "approx"):
        raise ValueError(f"unknown method {method!r}: expected 'exact' or 'approx'")
    s = score if score is not None else stopword_ratio()
    if method == "approx":
        th = docs.groupBy(group_col).agg(
            F.percentile_approx(s, drop_pct / 100.0, 10_000).alias("__th")
        )
        return (
            docs.join(F.broadcast(th), group_col)
            .filter(s >= F.col("__th"))  # keep threshold-tied rows (see docstring)
            .drop("__th")
        )
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(s.asc(), F.col(id_col).asc())
    n = F.count("*").over(Window.partitionBy(group_col))
    rn = F.row_number().over(w)
    return (
        docs.withColumn("__n", n)
        .withColumn("__rn", rn)
        .filter(F.expr(f"__rn > (__n * {drop_pct}) div 100"))
        .drop("__n", "__rn")
    )


def prep_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_stopword_ratio: float | None = 0.01,
    hasher: str = "portable",
    use_gopher: bool = False,
    use_repetition: bool = False,
    classifier_model=None,
    classifier_threshold: float = 0.5,
    max_rare_bigram_ratio: float | None = None,
    rare_df: int = 2,
    span_k: int | None = None,
    span_min_docs: int = 2,
    line_min_docs: int | None = None,
    token_budget: int | None = None,
    token_budgets: dict[str, int] | None = None,
    budget_group_col: str = "source",
    budget_method: str = "exact",
    lm_reference: DataFrame | None = None,
    lm_keep_buckets: tuple[str, ...] = ("head", "middle"),
    lm_bucket_method: str = "approx",
    lm_group_col: str | None = None,
    lm_per_group_model: bool = False,
    lm_dropped_group_log: list | None = None,
    use_c4: bool = False,
    c4_blocklist: tuple[str, ...] = (),
    url_col: str | None = None,
    use_url_dedup: bool = False,
    domain_blocklist: tuple[str, ...] = (),
    max_docs_per_domain: int | None = None,
    domain_cap_method: str = "approx",
    domain_psl_table: DataFrame | None = None,
    url_tracking_params: tuple[str, ...] | None = None,
) -> DataFrame:
    """The whole pre-training prep path: quality FILTER, optional
    corpus-adaptive GIBBERISH gate, full DEDUP (exact fingerprint -> LSH
    near-dup clusters -> canonical survivors), optional TOKEN-BUDGET
    mixture sampling.

    Filter-first is the scale-correct order: the narrow quality predicate is
    the cheapest, most selective stage, so everything the dedup stages
    shuffle (shingles, signatures, band buckets) is computed only for
    documents that can actually ship.  The optional stages slot in where a
    training pipeline actually wants them:

    - ``use_gopher`` adds the Gopher rule battery (``gopher_filter``, t27)
      right after the base gates — another stateless predicate over the same
      scan, so it costs no extra pass.
    - ``use_repetition`` adds the A1.2 repetition battery
      (``repetition_filter``, t28) right after A1.1 and BEFORE the
      corpus-adaptive gate: loops repeated enough manufacture
      corpus-common bigram transitions, so they must be gone before the
      rare-bigram frequency table is built (the gate-matrix harness
      measures that exact slip-through).  Unlike the stateless gates this
      one costs a doc-scoped gram aggregation + semi-join (linear).
    - ``classifier_model`` (from ``ml.quality_classifier``) adds the
      model-based keep (``quality_prob >= classifier_threshold``) after the
      heuristic gates — heuristics first is the published recipe: the
      classifier is ~100× the per-doc cost of a predicate, so it should see
      only documents the cheap rules could not reject.  Map-side JVM
      transform; no shuffle.  (Not SQL-expressible, so the composed form is
      pytest-verified; the catalog entries never pass a model.)
    - ``max_rare_bigram_ratio`` gates on ``rare_bigram_scores`` BETWEEN the
      per-doc filter and dedup — the bigram frequency table is computed over
      the quality-passing corpus (junk should not contribute "natural"
      transitions), and gibberish dropped here never costs shingle shuffles.
      ``rare_df`` forwards the rarity cutoff.
    - ``span_k`` applies ``remove_duplicate_spans`` (dd19's cross-document
      duplicated-span removal) BETWEEN the gates and dedup: stripping shared
      boilerplate BEFORE fingerprinting makes template-wrapped payloads
      collapse to exact duplicates the fingerprint stage can see — run after
      it and the boilerplate would have kept them distinct.  It rewrites
      ``text_col`` (whitespace-normalized surviving tokens), which is what
      every downstream stage should consume anyway.
    - ``line_min_docs`` applies ``remove_boilerplate_lines`` (dd22's
      RefinedWeb/CCNet line-wise stage) in the same pre-fingerprint slot,
      BEFORE ``span_k``'s token-window pass: lines are the natural unit for
      nav/footer/license boilerplate when the corpus has newlines, and
      stripping whole lines first means the span stage only has to catch
      the non-line-aligned residue.  No-op (zero removals) on newline-free
      corpora — opt-in for that reason.
    - ``url_col`` + ``use_url_dedup`` / ``domain_blocklist`` /
      ``max_docs_per_domain`` slot the web-provenance stages (operators.web,
      w01–w05) in their published positions: blocklist and URL dedup run
      FIRST OF ALL (RefinedWeb's order — URL-level filters are the cheapest
      and drop documents before a single token is shingled or scored), and
      the per-domain cap runs AFTER dedup (a cap should buy unique
      documents, not copies) and BEFORE the LM stage (capped docs never pay
      frequency joins).  ``domain_cap_method`` picks the exact
      (window-ranked, bounded domain lists) or approx (hash-threshold,
      100 TB) twin.  ``domain_psl_table`` (r14) threads a public-suffix
      DataFrame into the blocklist and cap so ccTLD-heavy corpora key on
      REAL registrable domains (``with_registrable_domain``);
      ``url_tracking_params`` widens the tracking-parameter families the
      URL dedup canonicalization strips (None = the frozen default).
    - ``use_c4`` applies the C4 battery (``c4_filter``, t34) FIRST — its
      published slot (Raffel 2020 §2.2 runs line-grain cleaning before
      everything): ``text_col`` is rebuilt from the surviving lines, so a
      page whose junk lines (nav stubs, "javascript" banners) would have
      failed the page-level gates can pass them once cleaned — and every
      later stage (gates, dedup shingles, LM scoring, budgets) consumes the
      cleaned text.  ``c4_blocklist`` forwards the caller-supplied word
      blocklist.  Still one zero-shuffle scalar projection + a semi-join.
    - ``lm_reference`` applies the CCNet LM stage (``lm_score`` +
      ``perplexity_buckets``, t32/t33) AFTER dedup — the published CCNet
      order (dedup -> LM bucketing), and scoring deduped survivors means
      the frequency joins never pay for documents dedup was about to drop.
      Keeps documents whose bucket is in ``lm_keep_buckets`` (default
      head+middle — CCNet discards or downweights the tail);
      ``lm_bucket_method`` defaults to the zero-sort approx path.
      ``lm_group_col`` (e.g. a ``lang`` column) makes the tertiles
      PER-GROUP — CCNet's actual recipe splits each LANGUAGE at its own
      33rd/66th percentiles (t36): under one global scale an entire
      high-perplexity language lands in the tail and is silently dropped;
      grouped, each language keeps its own head+middle.
      ``lm_per_group_model=True`` additionally trains ONE LM PER GROUP
      (``lm_score(group_col=)``, t38 — the full CCNet construction; the
      reference must carry ``lm_group_col``): no language is scored
      against another's statistics, and documents of reference-less
      groups DROP — an explicit opt-in because of that drop semantics.
      Pass ``lm_dropped_group_log`` (a list) to record the drops as
      ``(group, n_docs)`` tuples — never-silent accounting for a typo'd
      or incomplete reference slice (see ``lm.lm_drop_audit``).
    - ``token_budget`` (+ per-group ``token_budgets``, grouped by
      ``budget_group_col``) applies ``token_budget_sample`` AFTER dedup —
      a budget must buy unique tokens, not duplicates.  ``budget_method``
      picks the exact (auditable ``cum_tokens``) or approx (100 TB) path;
      the sampled output carries ``n_tokens`` (+ ``cum_tokens`` for exact).

    Catalog entry dd12_prep_corpus verifies the base composition end-to-end
    against a recursive-CTE oracle; dd18_prep_corpus_gated verifies the
    gibberish-gate + token-budget form the same way; the ``span_k`` stage is
    oracle-verified standalone (dd19) and composition-tested in pytest
    (boilerplate-wrapped payloads collapsing to exact duplicates).
    """
    from healthcare_data_pipeline_spark.operators.dedup_corpus import dedup_corpus
    from healthcare_data_pipeline_spark.operators.mixture import token_budget_sample

    if (use_url_dedup or domain_blocklist or max_docs_per_domain) and url_col is None:
        raise ValueError(
            "url_col is required for use_url_dedup / domain_blocklist / "
            "max_docs_per_domain — the web stages key on it"
        )
    if url_col is not None:
        # Provenance-level stages run FIRST (RefinedWeb's order: URL-level
        # filters before any content pass) — they are the cheapest and drop
        # documents before a single token is shingled or scored.
        from healthcare_data_pipeline_spark.operators.web import (
            domain_blocklist_filter,
            url_dedup,
        )

        if domain_blocklist:
            docs = domain_blocklist_filter(
                docs, domain_blocklist, url_col=url_col, psl_table=domain_psl_table
            )
        if use_url_dedup:
            if url_tracking_params is not None:
                docs = url_dedup(
                    docs,
                    url_col=url_col,
                    id_col=id_col,
                    tracking_params=url_tracking_params,
                )
            else:
                docs = url_dedup(docs, url_col=url_col, id_col=id_col)
    if use_c4:
        docs = c4_filter(
            docs, id_col=id_col, text_col=text_col, blocklist=c4_blocklist
        )
    filtered = filter_corpus(
        docs, text_col=text_col, min_stopword_ratio=min_stopword_ratio
    )
    if use_gopher:
        filtered = gopher_filter(filtered, text_col=text_col)
    if use_repetition:
        # A1.2 sits right after A1.1, BEFORE the corpus-adaptive and
        # model-based stages: loops must not contribute "natural" bigram
        # transitions to the rare-bigram frequency table (a within-doc loop
        # repeated enough literally manufactures corpus-common transitions
        # — the gate-matrix harness measures exactly that slip-through).
        filtered = repetition_filter(filtered, id_col=id_col, text_col=text_col)
    if classifier_model is not None:
        from healthcare_data_pipeline_spark.ml.quality_classifier import score_quality

        filtered = (
            score_quality(classifier_model, filtered, text_col=text_col)
            .filter(F.col("quality_prob") >= float(classifier_threshold))
            .drop("quality_prob")
        )
    if max_rare_bigram_ratio is not None:
        keep = (
            rare_bigram_scores(filtered, rare_df=rare_df, id_col=id_col, text_col=text_col)
            .filter(F.col("rare_ratio") <= float(max_rare_bigram_ratio))
            .select(F.col("doc_id").alias(id_col))
        )
        filtered = filtered.join(keep, id_col, "left_semi")
    if line_min_docs is not None:
        from healthcare_data_pipeline_spark.operators.dedup_corpus import (
            remove_boilerplate_lines,
        )

        filtered = remove_boilerplate_lines(
            filtered, min_docs=line_min_docs, id_col=id_col, text_col=text_col
        ).drop("n_lines", "n_removed_lines")
    if span_k is not None:
        from healthcare_data_pipeline_spark.operators.dedup_corpus import (
            remove_duplicate_spans,
        )

        filtered = remove_duplicate_spans(
            filtered,
            k=span_k,
            min_docs=span_min_docs,
            id_col=id_col,
            text_col=text_col,
        ).drop("n_tokens", "n_removed", "n_dup_spans")
    # r15: STAGE-BOUNDARY materialization before dedup — but ONLY when a
    # multi-pass pre-dedup stage ran.  dedup_corpus consumes its input
    # through several independent jobs (the components size-gate collect,
    # broadcast builds, the final anti join), and each re-executes the
    # ENTIRE upstream prep subplan — with the rare-bigram gate on, that is
    # the frequency-table aggregation and its semi join re-run per consumer
    # (~6 re-executions of the gate chain per dd18 run, measured as a
    # string of 0.5-1 s single-task jobs; dd18 6.5 -> 4.7 s with the
    # persist).  The published pipelines (CCNet/RefinedWeb) materialize
    # between exactly these stages.  When only the STATELESS scalar gates
    # ran (dd12's shape), recomputing the filter chain is cheaper than
    # materializing it — measured dd12 2.3 -> 3.3 s with a blanket persist,
    # and at scale a re-scan beats caching a scan-cheap relation — so the
    # persist keys on the expensive stages.  MEMORY_AND_DISK: a block that
    # outgrows memory spills locally instead of being recomputed through
    # the whole gate chain; eviction only ever costs recomputation.
    # Lifecycle (r15 advice): both persists below back the RETURNED lazy
    # DataFrame, so this function cannot unpersist them itself; disk-backed
    # blocks are not reclaimed by eviction, so a session invoking
    # prep_corpus repeatedly must ``spark.catalog.clearCache()`` between
    # invocations (the bench does, between every rep).
    from pyspark import StorageLevel

    multi_pass_prep = (
        max_rare_bigram_ratio is not None
        or use_repetition
        or classifier_model is not None
        or span_k is not None
        or line_min_docs is not None
        or use_url_dedup
    )
    if multi_pass_prep:
        filtered = filtered.persist(StorageLevel.MEMORY_AND_DISK)
    out = dedup_corpus(filtered, id_col=id_col, text_col=text_col, hasher=hasher)
    if max_docs_per_domain is not None:
        # AFTER dedup (a domain's cap should buy unique documents, not
        # copies — the token_budget_sample placement argument), BEFORE the
        # LM stage (scoring is the most expensive remaining pass; capped
        # docs should never pay frequency joins).
        from healthcare_data_pipeline_spark.operators.web import domain_cap

        out = domain_cap(
            out,
            max_docs=max_docs_per_domain,
            url_col=url_col,
            id_col=id_col,
            method=domain_cap_method,
            psl_table=domain_psl_table,
        )
    if lm_reference is not None:
        from healthcare_data_pipeline_spark.operators.lm import (
            lm_score,
            perplexity_buckets,
        )

        # Same stage-boundary rule as the pre-dedup persist above: the LM
        # stage consumes ``out`` THREE ways (the scoring explode, the
        # optional group attach, and the final semi join's left side), and
        # each would otherwise re-run the whole dedup composition.
        out = out.persist(StorageLevel.MEMORY_AND_DISK)

        if lm_per_group_model:
            if lm_group_col is None or lm_group_col not in lm_reference.columns:
                raise ValueError(
                    "lm_per_group_model requires lm_group_col present on the "
                    "reference: one LM trains per group (t38), so the "
                    "reference must be routable by the same column"
                )
            # the full CCNet construction (t38): one LM PER GROUP — scores
            # come back group-keyed; docs of reference-less groups DROP
            # (no model to score them under), which is why this is an
            # explicit opt-in rather than implied by lm_group_col.
            # lm_dropped_group_log makes that drop observable per group
            # (the never-silent accounting standard).
            scores = lm_score(
                out, lm_reference, id_col=id_col, text_col=text_col,
                group_col=lm_group_col,
                dropped_group_log=lm_dropped_group_log,
            )
        else:
            scores = lm_score(
                out, lm_reference, id_col=id_col, text_col=text_col
            )
            if lm_group_col is not None:
                # shared model, per-group TERTILES (t36): carry the doc's
                # group onto the scores so each group splits at its own
                # 33rd/66th percentiles
                scores = scores.join(
                    out.select(F.col(id_col).alias("doc_id"), lm_group_col), "doc_id"
                )
        keep = (
            perplexity_buckets(
                scores, method=lm_bucket_method, group_col=lm_group_col
            )
            .filter(F.col("ppl_bucket").isin(*lm_keep_buckets))
            .select(F.col("doc_id").alias(id_col))
        )
        out = out.join(keep, id_col, "left_semi")
    if token_budget is not None:
        out = token_budget_sample(
            out,
            budget=token_budget,
            budgets=token_budgets,
            group_col=budget_group_col,
            id_col=id_col,
            text_col=text_col,
            method=budget_method,
        )
    return out


def rare_bigram_scores(
    docs: DataFrame,
    rare_df: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    join_side: str = "all",
    broadcast_common: bool = False,
) -> DataFrame:
    """CORPUS-ADAPTIVE gibberish scoring: per-document rare-bigram ratio.

    The per-doc heuristics (stopword ratio, length gates) can't see
    distributional junk — shuffled words, OCR noise, keyboard mash all have
    plausible lengths and may even hit stopwords.  What exposes them is that
    their word BIGRAMS never recur anywhere else: natural text draws its
    transitions from a heavy head ("of the", "in a"), junk draws uniformly
    from the enormous tail.  Score = fraction of a document's bigram
    OCCURRENCES whose corpus-wide bigram frequency is <= ``rare_df``; gate
    high-ratio docs.  This is the integer-exact stand-in for n-gram LM
    perplexity — same signal, but counts and a small-int division instead of
    transcendental logs, so the result value-hashes identically in any
    engine (catalog t23).

    Scale shape: one bigram explode (~n_tokens rows), one groupBy(bigram)
    with map-side combine for the frequency table, one shuffle join of the
    exploded bigrams back against it (both sides already clustered by
    bigram), one per-doc aggregation.  Everything is linear in corpus token
    count; the full frequency table is never collected or broadcast (at
    100 TB it is itself huge — and the RARE side is most of it, so no
    small-side broadcast exists by construction with ``join_side="all"``).

    ``join_side="common"`` is the EXACT join-side reduction for when this
    score is a default prep gate (the r9 review's watch item): only the
    COMMON bigrams (df > ``rare_df`` — the head, typically a small fraction
    of the distinct-bigram tail) form the join relation, and a bigram with
    no match counts as rare.  Identical output values — rarity is the
    complement of commonness — with the join side shrunk from |all distinct
    bigrams| to |head bigrams|; ``broadcast_common=True`` additionally
    broadcast-hints the head when the caller knows it fits executor memory
    (a language's frequent-bigram head saturates far below corpus scale,
    unlike the tail, which grows with every crawl).

    Output: (doc_id, n_bigrams, n_rare, rare_ratio) for every doc with at
    least one bigram (>= 2 tokens).
    """
    toks_sql = f"split(lower({text_col}), '[ \\\\t\\\\n\\\\r\\\\f\\\\x0B]+')"
    bigrams_sql = f"""
      CASE WHEN size(toks) >= 2 THEN transform(
        sequence(1, size(toks) - 1),
        i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1))
      ) ELSE array() END
    """
    bg = (
        docs.selectExpr(f"{id_col} AS doc_id", f"{toks_sql} AS toks")
        .selectExpr("doc_id", f"explode({bigrams_sql}) AS bg")
    )
    counts = bg.groupBy("bg").agg(F.count("*").alias("df_bg"))
    if join_side == "common":
        common = counts.filter(F.col("df_bg") > rare_df).select("bg").withColumn(
            "__common", F.lit(1)
        )
        if broadcast_common:
            common = F.broadcast(common)
        scored = bg.join(common, "bg", "left").groupBy("doc_id").agg(
            F.count("*").alias("n_bigrams"),
            F.sum(F.when(F.col("__common").isNull(), 1).otherwise(0)).alias("n_rare"),
        )
    elif join_side == "all":
        scored = (
            bg.join(counts, "bg")
            .groupBy("doc_id")
            .agg(
                F.count("*").alias("n_bigrams"),
                F.sum(F.when(F.col("df_bg") <= rare_df, 1).otherwise(0)).alias("n_rare"),
            )
        )
    else:
        raise ValueError(f"join_side must be 'all' or 'common', got {join_side!r}")
    return scored.select(
        "doc_id",
        "n_bigrams",
        "n_rare",
        (F.col("n_rare").cast("double") / F.col("n_bigrams").cast("double")).alias(
            "rare_ratio"
        ),
    )


def corpus_drift_report(
    ref: DataFrame,
    new: DataFrame,
    text_col: str = "text",
    mode: str = "summary",
    top_n: int = 20,
) -> DataFrame:
    """TOKEN-DISTRIBUTION drift between a reference corpus and a new batch —
    the text twin of s09's quantizer-drift report, and the monitoring gate a
    continuously-ingesting pipeline (streaming/ingest.py) runs before
    admitting a crawl snapshot: quality filters catch BAD documents, but a
    distribution that silently moved (new boilerplate family, a language
    shift, a scraper change) degrades everything trained downstream while
    every individual document still looks fine.

    The headline statistic is total variation distance over unigram
    distributions, computed in EXACT integer arithmetic via the common-
    denominator form

        TVD = Σ_w |c_ref(w)·N_new − c_new(w)·N_ref| / (2·N_ref·N_new)

    — integer products and sums (decimal(38,0), overflow-safe past 10^14
    tokens per side), ONE final double division, so the report value-hashes
    identically in any engine (catalog t26) with none of the libm-log
    portability problems a KL/JS divergence would bring.  TVD ∈ [0, 1] is
    also directly actionable: it is exactly the total probability mass that
    moved.

    Modes: ``summary`` (one row: n_ref_tokens, n_new_tokens, n_ref_types,
    n_new_types, n_new_only_types, n_lost_types, tvd), ``tokens`` (per-token
    c_ref / c_new / delta_scaled — the full drift table), ``movers`` (top
    ``top_n`` tokens by scaled delta, deterministic (delta DESC, tok)
    order — the "what changed" drill-down).

    Scale shape: one token explode per side unioned with a side flag, ONE
    groupBy(token) with map-side combine building the joint frequency table
    (no join between the sides at all), scalar totals attached via a 1x1
    broadcast combine, then either a scalar rollup (summary) or a bounded
    top-n (movers).  Nothing corpus-sized crosses a second shuffle.
    """
    if mode not in ("summary", "tokens", "movers"):
        raise ValueError(f"mode must be summary|tokens|movers, got {mode!r}")
    ws = r"[ \t\n\r\f\x0B]+"

    def toks(df: DataFrame, flag: int) -> DataFrame:
        return df.select(
            F.explode(F.split(F.lower(F.col(text_col)), ws)).alias("tok"),
            F.lit(flag).alias("is_ref"),
        )

    tk = (
        toks(ref, 1)
        .unionByName(toks(new, 0))
        .groupBy("tok")
        .agg(
            F.sum("is_ref").alias("c_ref"),
            F.sum(1 - F.col("is_ref")).alias("c_new"),
        )
    )
    totals = tk.agg(
        F.sum("c_ref").alias("n_ref"),
        F.sum("c_new").alias("n_new"),
    )
    dec = "decimal(38,0)"
    delta = F.abs(
        F.col("c_ref").cast(dec) * F.col("n_new").cast(dec)
        - F.col("c_new").cast(dec) * F.col("n_ref").cast(dec)
    )
    wide = tk.crossJoin(F.broadcast(totals)).withColumn("delta_scaled", delta)
    if mode == "tokens":
        return wide.select("tok", "c_ref", "c_new", "delta_scaled")
    if mode == "movers":
        return (
            wide.select("tok", "c_ref", "c_new", "delta_scaled")
            .orderBy(F.col("delta_scaled").desc(), "tok")
            .limit(top_n)
        )
    return wide.agg(
        F.sum("c_ref").cast("long").alias("n_ref_tokens"),
        F.sum("c_new").cast("long").alias("n_new_tokens"),
        F.sum(F.when(F.col("c_ref") > 0, 1).otherwise(0)).cast("long").alias("n_ref_types"),
        F.sum(F.when(F.col("c_new") > 0, 1).otherwise(0)).cast("long").alias("n_new_types"),
        F.sum(F.when((F.col("c_ref") == 0) & (F.col("c_new") > 0), 1).otherwise(0))
        .cast("long")
        .alias("n_new_only_types"),
        F.sum(F.when((F.col("c_new") == 0) & (F.col("c_ref") > 0), 1).otherwise(0))
        .cast("long")
        .alias("n_lost_types"),
        (
            F.sum("delta_scaled").cast("double")
            / (
                F.lit(2.0)
                * F.max("n_ref").cast("double")
                * F.max("n_new").cast("double")
            )
        ).alias("tvd"),
    )


# Gopher A1.2 repetition thresholds as exact rationals (numerator, denominator):
# fraction <= num/den evaluated as den*chars <= num*total in BIGINT.  The full
# published battery: top-{2,3,4}-gram caps and duplicated-{5..10}-gram caps.
REP_THRESHOLDS = {
    "top2": (1, 5),     # top 2-gram char fraction <= 0.20
    "top3": (9, 50),    # top 3-gram char fraction <= 0.18
    "top4": (4, 25),    # top 4-gram char fraction <= 0.16
    "dup5": (3, 20),    # duplicated 5-gram char fraction <= 0.15
    "dup6": (7, 50),    # duplicated 6-gram char fraction <= 0.14
    "dup7": (13, 100),  # duplicated 7-gram char fraction <= 0.13
    "dup8": (3, 25),    # duplicated 8-gram char fraction <= 0.12
    "dup9": (11, 100),  # duplicated 9-gram char fraction <= 0.11
    "dup10": (1, 10),   # duplicated 10-gram char fraction <= 0.10
    "dup_lines": (3, 10),       # duplicate line (count) fraction <= 0.30
    "dup_line_chars": (1, 5),   # duplicate line char fraction <= 0.20
}


def repetition_flags(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_grams: bool = False,
) -> DataFrame:
    """The Gopher REPETITION rule battery (Rae et al. 2021, appendix A1.2
    "repetitious text") — the second half of the published quality recipe,
    complementing ``gopher_quality_flags`` (A1.1): loops and boilerplate
    slip every A1.1 gate BY CONSTRUCTION (same words, same lengths, same
    stopwords), and a within-doc loop also slips the corpus-adaptive
    rare-bigram gate (its transitions recur corpus-wide once the doc is in
    the corpus).  The quality-gate effectiveness harness measures exactly
    that gap; this battery closes it.  Signals per document:

    - ``top{2,3,4}_chars``: characters of the MOST FREQUENT word n-gram —
      its occurrence count x its token characters, the gram chosen by max
      count with a deterministic (count, gram-chars) tie-break — fraction
      of ``total_chars`` capped at 0.20 / 0.18 / 0.16;
    - ``dup{5..10}_chars``: characters COVERED by any n-gram occurring >= 2
      times within the doc (position coverage, overlaps counted once — the
      dd19 span-coverage construction, per doc) — capped at the published
      ladder 0.15 / 0.14 / 0.13 / 0.12 / 0.11 / 0.10;
    - ``dup_lines`` / ``dup_line_chars``: occurrences beyond the first of
      repeated (trimmed, non-empty) lines, by count and by characters —
      capped at 0.30 / 0.20 of ``n_lines`` / line characters;
    - ``rep_pass``: AND of all eleven flags.

    Characters count token characters (whitespace excluded), so every
    fraction is a ratio of exact BIGINTs and each threshold evaluates in
    integer arithmetic (``den*c <= num*total``) — bit-identical on any
    engine; catalog t28 hash-verifies all counts and flags.  NULL text
    coalesces to an empty doc (total 0, every flag true) — the oracle's
    COALESCE semantics, so a NULL-text row is never silently dropped.

    Scale shape — two INDEPENDENT single-pass pipelines, nothing cached,
    nothing recomputed, no joins:

    - tokens posexplode once per branch (positions + lengths), grams built
      from WINDOW ``lead`` columns over (doc, position) — every gram
      string, length and the tagged struct array stay inside whole-stage
      codegen (the first cut built grams with per-element ``transform``
      lambdas, which run INTERPRETED and allocate per element; at 64x the
      measured cost was minutes per pass);
    - the top-n branch: one (doc, n, gram) groupBy with map-side combine,
      then a per-(doc, n) arg-max struct;
    - the coverage branch replaces the old groupBy + semi-join +
      position-explode + distinct + length-join chain (which blew rows up
      n-fold and re-shuffled them three times — the measured alpha-1.17
      super-linearity at 64x) with CHAR-SPACE INTERVAL UNION: each gram
      occurrence carries [cum_chars_before, cum_chars_before + gram_chars)
      from a running-sum window, occurrence counts come from a count
      window over (doc, n, gram) so every occurrence row survives, and
      duplicated occurrences union per (doc, n) via the classic
      sorted-interval sweep (running max of interval end).  A gram's char
      interval is exactly the union of its positions' char ranges, so the
      union length equals the covered-position char sum — same exact
      semantics, one pass, zero row blow-up.

    All keys are doc-scoped (skew-safe), no UDF, nothing collected.
    ``hash_grams=True`` keys the gram shuffle on 8-byte xxhash64 values
    instead of gram strings (the dd19 ``hash_spans`` trade: flat shuffle
    bytes in n, astronomically-unlikely in-doc collisions; the
    catalog-verified path keeps strings).
    """
    from pyspark.sql import Window
    toks = f"filter(split({text_col}, '[ \\\\t\\\\n\\\\r\\\\f\\\\x0B]+'), x -> x != '')"
    base = docs.selectExpr(f"{id_col} AS __did", f"{toks} AS __toks", f"{text_col} AS __text")
    base = base.withColumn("__lens", F.expr("transform(__toks, t -> length(t))")).withColumn(
        "__total", F.expr("coalesce(aggregate(__lens, 0L, (a, x) -> a + x), 0L)")
    )

    # token relation with positions + lengths (codegen posexplode), then
    # grams as window-lead columns — all codegen, no interpreted lambdas;
    # each consumer branch builds only the gram sizes it needs and runs as
    # its own single-pass pipeline (the branches share no relation, so
    # there is nothing to cache and nothing recomputed within a branch)
    tok = base.select(
        "__did", F.posexplode("__toks").alias("__p0", "__t")
    ).select("__did", (F.col("__p0") + 1).alias("__p"), "__t", F.length("__t").alias("__l"))
    # CPU-vs-bytes coalescing fix (r16, the r15 verdict's t28 item): the
    # token shuffle feeding the gram windows carries few BYTES, so AQE's
    # byte-based coalescing folds the post-shuffle stage — where the
    # lead-window gram construction and everything above it runs — into
    # 1-2 tasks, serializing the single CPU-dense stage of the operator.
    # An explicit doc-keyed repartition pins that exchange at the session
    # parallelism (user-specified repartitions are exempt from AQE
    # coalescing), satisfies the windows' required distribution (no extra
    # exchange appears — see plans/r16/t28_repetition_flags_after.txt), and
    # scales with defaultParallelism rather than any local constant.
    tok = tok.repartition(
        docs.sparkSession.sparkContext.defaultParallelism, "__did"
    )
    w = Window.partitionBy("__did").orderBy("__p")

    def grams_for(sizes: tuple[int, ...], with_cum: bool) -> DataFrame:
        max_j = max(sizes)
        win_cols = []
        if with_cum:
            win_cols.append(
                F.coalesce(
                    F.sum("__l").over(w.rowsBetween(Window.unboundedPreceding, -1)),
                    F.lit(0),
                ).cast("long").alias("__cumb")
            )
        for j in range(1, max_j):
            win_cols.append(F.lead("__t", j).over(w).alias(f"__t{j}"))
            win_cols.append(F.lead("__l", j).over(w).alias(f"__l{j}"))
        led = tok.select("__did", "__p", "__t", "__l", *win_cols)
        gram_n = []
        for n in sizes:
            toks_n = ", ".join(["__t"] + [f"__t{j}" for j in range(1, n)])
            key = f"concat_ws(' ', {toks_n})"
            if hash_grams:
                key = f"xxhash64({key})"
            lens_n = " + ".join(["__l"] + [f"__l{j}" for j in range(1, n)])
            gram_n.append(
                f"named_struct('n', {n}, 'g', IF(__t{n - 1} IS NULL, NULL, {key}), "
                f"'glen', CAST({lens_n} AS BIGINT))"
            )
        extra = ["__cumb"] if with_cum else []
        return (
            led.selectExpr("__did", *extra, f"array({', '.join(gram_n)}) AS __gs")
            .select("__did", *extra, F.explode("__gs").alias("__s"))
            .filter(F.col("__s.g").isNotNull())
            .selectExpr("__did", "__s.n AS __n", "__s.g AS __g", "__s.glen AS __glen", *extra)
        )

    # top-n branch: per-(doc, n, gram) count, then the MOST FREQUENT gram's
    # count*chars — arg-max by (count, gram-chars), a deterministic struct
    # max (ties beyond that have identical products)
    top = (
        grams_for((2, 3, 4), with_cum=False)
        .groupBy("__did", "__n", "__g")
        .agg(F.count("*").alias("__c"), F.max("__glen").alias("__glen"))
        .groupBy("__did", "__n")
        .agg(F.max(F.struct("__c", "__glen")).alias("__m"))
        .select(
            "__did", "__n", (F.col("__m.__c") * F.col("__m.__glen")).alias("__chars")
        )
    )

    # coverage branch: every occurrence carries its char-space interval;
    # a count window (not groupBy) keeps occurrence rows alive; duplicated
    # intervals union per (doc, n) by the sorted sweep.  Start offsets are
    # strictly increasing within a doc (tokens are non-empty), so the sweep
    # order is total and deterministic.
    dup_sizes = (5, 6, 7, 8, 9, 10)
    occ = grams_for(dup_sizes, with_cum=True).select(
        "__did", "__n", "__g",
        F.col("__cumb").alias("__s0"),
        (F.col("__cumb") + F.col("__glen")).alias("__e0"),
    )
    w_cnt = Window.partitionBy("__did", "__n", "__g")
    w_sweep = Window.partitionBy("__did", "__n").orderBy("__s0")
    dup = (
        occ.withColumn("__c", F.count("*").over(w_cnt))
        .filter(F.col("__c") >= 2)
        .withColumn(
            "__pmax",
            F.max("__e0").over(w_sweep.rowsBetween(Window.unboundedPreceding, -1)),
        )
        .select(
            "__did", "__n",
            F.greatest(
                F.lit(0).cast("long"),
                F.col("__e0")
                - F.greatest(F.col("__s0"), F.coalesce(F.col("__pmax"), F.lit(0).cast("long"))),
            ).alias("__new"),
        )
        .groupBy("__did", "__n")
        .agg(F.sum("__new").cast("long").alias("__chars"))
    )
    per_n = top.unionByName(dup)
    wide = per_n.groupBy("__did").pivot("__n", [2, 3, 4, 5, 6, 7, 8, 9, 10]).agg(
        F.max("__chars")
    )

    # line stats: occurrences beyond the first of repeated trimmed lines
    lines = base.selectExpr(
        "__did", f"explode(filter(transform(split(__text, '\\n'), l -> trim(l)), l -> l != '')) AS __ln"
    )
    lc = lines.groupBy("__did", "__ln").agg(F.count("*").alias("__c"))
    lstats = lc.groupBy("__did").agg(
        F.sum("__c").cast("long").alias("n_lines"),
        F.sum(F.expr("length(__ln) * __c")).cast("long").alias("line_chars"),
        F.sum(F.expr("CASE WHEN __c >= 2 THEN __c - 1 ELSE 0 END")).cast("long").alias("dup_lines"),
        F.sum(F.expr("CASE WHEN __c >= 2 THEN length(__ln) * (__c - 1) ELSE 0 END"))
        .cast("long")
        .alias("dup_line_chars"),
    )

    out = (
        base.select("__did", F.col("__total").alias("total_chars"))
        .join(wide, "__did", "left")
        .join(lstats, "__did", "left")
        .selectExpr(
            f"__did AS {id_col}",
            "total_chars",
            "coalesce(`2`, 0L) AS top2_chars",
            "coalesce(`3`, 0L) AS top3_chars",
            "coalesce(`4`, 0L) AS top4_chars",
            "coalesce(`5`, 0L) AS dup5_chars",
            "coalesce(`6`, 0L) AS dup6_chars",
            "coalesce(`7`, 0L) AS dup7_chars",
            "coalesce(`8`, 0L) AS dup8_chars",
            "coalesce(`9`, 0L) AS dup9_chars",
            "coalesce(`10`, 0L) AS dup10_chars",
            "coalesce(n_lines, 0L) AS n_lines",
            "coalesce(dup_lines, 0L) AS dup_lines",
            "coalesce(dup_line_chars, 0L) AS dup_line_chars",
            "coalesce(line_chars, 0L) AS line_chars",
        )
    )
    flags = {
        "flag_top2": ("top2_chars", "total_chars", REP_THRESHOLDS["top2"]),
        "flag_top3": ("top3_chars", "total_chars", REP_THRESHOLDS["top3"]),
        "flag_top4": ("top4_chars", "total_chars", REP_THRESHOLDS["top4"]),
        "flag_dup5": ("dup5_chars", "total_chars", REP_THRESHOLDS["dup5"]),
        "flag_dup6": ("dup6_chars", "total_chars", REP_THRESHOLDS["dup6"]),
        "flag_dup7": ("dup7_chars", "total_chars", REP_THRESHOLDS["dup7"]),
        "flag_dup8": ("dup8_chars", "total_chars", REP_THRESHOLDS["dup8"]),
        "flag_dup9": ("dup9_chars", "total_chars", REP_THRESHOLDS["dup9"]),
        "flag_dup10": ("dup10_chars", "total_chars", REP_THRESHOLDS["dup10"]),
        "flag_dup_lines": ("dup_lines", "n_lines", REP_THRESHOLDS["dup_lines"]),
        "flag_dup_line_chars": ("dup_line_chars", "line_chars", REP_THRESHOLDS["dup_line_chars"]),
    }
    exprs = [
        f"({den} * {c} <= {num} * {t}) AS {name}"
        for name, (c, t, (num, den)) in flags.items()
    ]
    out = out.selectExpr("*", *exprs)
    return out.withColumn(
        "rep_pass", F.expr(" AND ".join(f"({f})" for f in flags))
    )


def repetition_filter(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """``docs`` minus A1.2 repetition failures (all original columns kept) —
    the companion gate to ``gopher_filter``; unlike that stateless
    predicate this one joins the per-doc repetition aggregate back (a
    doc-keyed semi-join, linear and skew-safe)."""
    keep = repetition_flags(docs, id_col=id_col, text_col=text_col).filter(
        F.col("rep_pass")
    ).select(id_col)
    return docs.join(keep, id_col, "left_semi")


# --------------------------------------------------------------------------
# C4 cleaning battery — Raffel et al. 2020 (T5), §2.2 "Colossal Clean
# Crawled Corpus" heuristics.

C4_TERMINALS = (".", "!", "?", '"')


def c4_clean(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words_per_line: int = 5,
    min_sentences: int = 3,
    blocklist: tuple[str, ...] = (),
) -> DataFrame:
    """The published C4 line/page cleaning rules (Raffel et al. 2020 §2.2),
    as one zero-shuffle projection:

    line rules (a line SURVIVES iff all three hold):
    - ends in a terminal punctuation mark (period / ! / ? / end quote —
      the paper's list, ``C4_TERMINALS``);
    - contains at least ``min_words_per_line`` (paper: 5) words;
    - does not contain the word "javascript" (case-insensitive).

    page rules (the whole document is DROPPED iff any holds):
    - fewer than ``min_sentences`` (paper: 3) surviving lines — each kept
      line ends in terminal punctuation, so kept-line count is the
      battery's sentence proxy;
    - the phrase "lorem ipsum" appears anywhere (case-insensitive);
    - a curly bracket ``{`` appears anywhere (code);
    - any ``blocklist`` word appears as a token (the paper filters against
      the public "List of Dirty, Naughty …" list; the list itself is a
      caller-supplied parameter here, default empty).

    Output: (doc_id, text = surviving lines joined by newline, n_lines,
    n_kept_lines, flag_lorem_ipsum, flag_curly_brace, flag_blocklist,
    c4_keep) — flags are the page-drop reasons, ``c4_keep`` the AND.  The
    battery complements the Gopher batteries: A1.1/A1.2 gate on
    distributional shape, C4 on line-grain editorial shape (boilerplate
    nav links, code fragments, template junk are line-local signals).

    Scale shape: one scalar projection over the scan — every rule is a
    string/array expression inside whole-stage codegen; no shuffle, no UDF,
    no explode (lines live inside per-row arrays).  Hash-portable by
    construction (exact string/integer predicates only); catalog t34.
    """
    lines, keep_l, blocked = _c4_sql_parts(text_col, min_words_per_line, blocklist)
    out = docs.selectExpr(
        f"{id_col} AS doc_id",
        f"array_join({keep_l}, '\\n') AS text",
        f"size({lines}) AS n_lines",
        f"size({keep_l}) AS n_kept_lines",
        f"contains(lower({text_col}), 'lorem ipsum') AS flag_lorem_ipsum",
        f"contains({text_col}, '{{') AS flag_curly_brace",
        f"({blocked}) AS flag_blocklist",
    )
    return out.selectExpr(
        "*",
        f"(NOT flag_lorem_ipsum AND NOT flag_curly_brace AND NOT flag_blocklist "
        f"AND n_kept_lines >= {min_sentences}) AS c4_keep",
    )


def _c4_sql_parts(
    text_col: str, min_words_per_line: int, blocklist: tuple[str, ...]
) -> tuple[str, str, str]:
    """The C4 battery's scalar SQL pieces (lines array, surviving-lines
    array, blocklist predicate) — shared by ``c4_clean`` (the diagnostic
    projection, t34) and ``c4_filter`` (the join-free in-place gate)."""
    terms = ", ".join(f"'{t}'" if t != '"' else "'\"'" for t in C4_TERMINALS)
    lines = f"filter(split({text_col}, '\\n'), l -> trim(l) != '')"
    wc = "size(filter(split(trim(l), '[ \\\\t]+'), w -> w != ''))"
    keep_l = (
        f"filter({lines}, l -> "
        f"substring(trim(l), length(trim(l)), 1) IN ({terms}) "
        f"AND {wc} >= {min_words_per_line} "
        f"AND NOT contains(lower(l), 'javascript'))"
    )
    toks = f"filter(split(lower({text_col}), '[ \\\\t\\\\n\\\\r\\\\f\\\\x0B]+'), x -> x != '')"
    if blocklist:
        bl = ", ".join("'" + w.lower().replace("'", "''") + "'" for w in blocklist)
        blocked = f"size(filter({toks}, x -> x IN ({bl}))) > 0"
    else:
        blocked = "false"
    return lines, keep_l, blocked


def c4_filter(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words_per_line: int = 5,
    min_sentences: int = 3,
    blocklist: tuple[str, ...] = (),
) -> DataFrame:
    """Apply the C4 battery in place: keep only passing documents, with
    ``text_col`` replaced by the line-cleaned text (all other columns
    preserved).  JOIN-FREE: the page predicate evaluates on the original
    text and the rewrite is one scalar projection over the same scan — no
    shuffle, no self-join, and therefore STATELESS, so the identical gate
    runs on an unbounded stream (``prep_stream(use_c4=)``) and costs
    nothing extra in the batch front door (``prep_corpus(use_c4=)``)."""
    lines, keep_l, blocked = _c4_sql_parts(text_col, min_words_per_line, blocklist)
    keep = (
        f"NOT contains(lower({text_col}), 'lorem ipsum') "
        f"AND NOT contains({text_col}, '{{') "
        f"AND NOT ({blocked}) AND size({keep_l}) >= {min_sentences}"
    )
    return (
        docs.filter(F.expr(keep))
        # withColumn evaluates against the INPUT row, so the rewrite reads
        # the original text even though it replaces the same column
        .withColumn(text_col, F.expr(f"array_join({keep_l}, '\\n')"))
    )
