"""[EXT] Deterministic mixture sampling — per-source data-mixing weights.

Training corpora are blended by SOURCE WEIGHT (3x web, 0.5x forums, ...).
``mixture_sample`` keeps a row iff a portable 32-bit hash of its id, reduced
mod ``DENOM``, falls under the source's integer threshold — so the sample is:

* **deterministic & engine-portable** — same md5-derived hash convention as
  the portable MinHash (queries/dedup.py dd06/dd07); no RNG, no seed state;
  the selection reproduces bit-identically in any SQL engine (catalog t11).
* **stable under resampling** — raising a source's weight only ADDS
  documents (threshold grows, the kept set is a superset), the property that
  lets a pipeline re-weight a 100 TB mix without reshuffling what models
  already trained on.
* **shuffle-free** — one narrow filter; the predicate references only id and
  the shard column, so it pushes to the scan boundary and composes with
  partition pruning on ``source``.

``mixture_sample`` handles weights in [0, 1] (downsampling; catalog t11);
``mixture_resample`` extends to weights > 1 (upsampling) — each row emits
floor(w) full copies plus one hash-gated fractional copy, so E[copies] = w
exactly and the output carries an ``epoch`` index (0-based copy number)
that downstream shuffling/packing can mix on.  Same determinism contract:
no RNG, reproducible anywhere (catalog t12).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DENOM = 1_000_000


def portable_selector(id_col: str = "doc_id") -> Column:
    """md5-derived 32-bit hash of the id, mod DENOM — uniform in [0, DENOM)."""
    h32 = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast("long")
    return h32 % DENOM


def weight_thresholds(weights: dict[str, float]) -> dict[str, int]:
    """Integer thresholds (round(w * DENOM)) — computed ONCE in Python so the
    Spark filter and any SQL oracle compare against identical literals."""
    for s, w in weights.items():
        if not 0.0 <= w <= 1.0:
            raise ValueError(f"mixture weight must be in [0, 1], got {s}={w} (upsampling "
                             "is an explode over ceil(w), not supported here)")
    return {s: int(round(w * DENOM)) for s, w in weights.items()}


def mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    group_col: str = "source",
    default_weight: float = 0.0,
) -> DataFrame:
    """Keep each row with its source's probability, deterministically.

    Sources absent from ``weights`` fall back to ``default_weight`` (0.0 =
    drop unknown sources — the safe default for a curated mix).
    """
    th = weight_thresholds(weights)
    default_th = weight_thresholds({"_": default_weight})["_"]
    thresh = F.lit(default_th).cast("long")
    for s, t in sorted(th.items()):
        thresh = F.when(F.col(group_col) == s, F.lit(t).cast("long")).otherwise(thresh)
    return df.filter(portable_selector(id_col) < thresh)


def split_thresholds(fractions: dict[str, float]) -> list[tuple[str, int]]:
    """Ordered cumulative integer thresholds over DENOM for a disjoint,
    exhaustive split — computed ONCE in Python so the Spark CASE chain and
    any SQL oracle compare against identical literals.  The last interval is
    closed at DENOM exactly, so every row gets a split no matter how the
    fractions round."""
    if not fractions:
        raise ValueError("split needs at least one fraction")
    if any(f < 0 for f in fractions.values()):
        raise ValueError(f"split fractions must be >= 0: {fractions}")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-6:
        raise ValueError(f"split fractions must sum to 1, got {total}: {fractions}")
    out: list[tuple[str, int]] = []
    cum = 0.0
    for name, f in fractions.items():  # insertion order = interval order
        cum += f
        out.append((name, int(round(cum * DENOM))))
    out[-1] = (out[-1][0], DENOM)
    return out


def _split_hash(id_col: str, salt: str) -> Column:
    """Portable 32-bit hash of ``id:salt`` mod DENOM.  The salt decorrelates
    the split from every OTHER hash gate in the pipeline (mixture_sample
    keeps the low-hash rows of each source; an unsalted split would then
    assign exactly those rows to the first interval — correlated gates are
    silent selection bias)."""
    s = F.concat(F.col(id_col).cast("string"), F.lit(":" + salt))
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long") % DENOM


def hash_split(
    df: DataFrame,
    fractions: dict[str, float] | None = None,
    id_col: str = "doc_id",
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment — the PRODUCTION split.

    Appends ``split_col`` from a salted portable hash of the id: disjoint,
    exhaustive, no RNG, bit-identical on any engine (catalog t19), and
    stable under corpus growth — a document's split NEVER changes when other
    documents are added or removed, the property that keeps a frozen eval
    set frozen across corpus versions at 100 TB.  Zero shuffle: one narrow
    projection, composes with partition pruning.  Proportions are exact in
    expectation per stratum (any stratum, since the hash is independent of
    every column but the id); use ``exact_stratified_split`` when a small
    stratum needs count-exact proportions.
    """
    ths = split_thresholds(fractions or {"train": 0.9, "val": 0.05, "test": 0.05})
    u = _split_hash(id_col, salt)
    col = F.when(u < ths[0][1], F.lit(ths[0][0]))
    for name, th in ths[1:-1]:
        col = col.when(u < th, F.lit(name))
    col = col.otherwise(F.lit(ths[-1][0]))
    return df.withColumn(split_col, col)


def exact_stratified_split(
    df: DataFrame,
    fractions: dict[str, float] | None = None,
    strat_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Count-exact per-stratum split: within each ``strat_col`` group, rows
    are ranked by the salted portable hash (id tie-break) and the split
    boundaries land at round(cum_fraction * n) — every stratum's split sizes
    are exact to rounding, not just in expectation.

    Cost: one shuffle on ``strat_col`` + a per-stratum sort (window), and a
    whole stratum's rank lives in one partition — so this is for BOUNDED
    strata (a label taxonomy, a source list), not for splitting a 100 TB
    corpus by a heavy-hitter column; ``hash_split`` is the scale path.
    Unlike ``hash_split``, assignments here can shift when the stratum's
    membership changes (ranks move) — the price of exactness.
    """
    from pyspark.sql import Window

    ths = split_thresholds(fractions or {"train": 0.9, "val": 0.05, "test": 0.05})
    w = Window.partitionBy(strat_col).orderBy(_split_hash(id_col, salt), F.col(id_col))
    n = F.count("*").over(Window.partitionBy(strat_col))
    rn = F.row_number().over(w)
    col = F.when(rn <= F.round(n * ths[0][1] / DENOM), F.lit(ths[0][0]))
    for name, th in ths[1:-1]:
        col = col.when(rn <= F.round(n * th / DENOM), F.lit(name))
    col = col.otherwise(F.lit(ths[-1][0]))
    return df.withColumn(split_col, col)


def corpus_composition(
    docs: DataFrame,
    fractions: dict[str, float] | None = None,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "split",
) -> DataFrame:
    """The training-run planning table: documents and whitespace tokens per
    (group, split), with rollup subtotals — "what will this mixture + split
    actually feed the trainer?", answered BEFORE the run.

    Composes ``hash_split`` (so the numbers are exactly the splits training
    will see, not an estimate) with a single rollup aggregation: one narrow
    scan, map-side partial aggregation, one exchange — the same cost as any
    grouped count at 100 TB.  Subtotal rows carry NULL group/split keys
    (standard ROLLUP semantics).
    """
    with_split = hash_split(docs, fractions, id_col=id_col, salt=salt)
    ntok = F.size(F.split(F.col(text_col), r"[ \t\n\r\f\x0B]+")).cast("long")
    return with_split.rollup(group_col, "split").agg(
        F.count("*").alias("n_docs"),
        F.sum(ntok).cast("long").alias("n_tokens"),
    )


def group_sample(
    df: DataFrame,
    k: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "sample",
    oversample: int = 2,
) -> DataFrame:
    """Deterministic fixed-size sample per group: up to ``k`` rows from each
    ``group_col`` value, selected by salted portable hash — the "give me 100
    docs from every source" debugging/eval primitive (t11 samples by RATE;
    this samples by COUNT).

    Scale shape is two-phase so no group's full membership ever sits in one
    window partition: (1) per-group counts (map-side combine) broadcast back
    to gate each row at ~``oversample * k / n`` of its group via the hash —
    a narrow filter that discards almost everything in a big group; (2) a
    window rank over the gated survivors (~oversample*k rows per group)
    picks the ``k`` smallest hashes, id tie-break.  All arithmetic is
    integer (ceil via ``div`` + 1), so any SQL engine reproduces the sample
    bit-identically.  Groups smaller than the gate pass through whole, and
    the output is min(k, survivors) rows — with the default 2x oversample
    the survivor count falls below ``k`` only with negligible probability;
    raise ``oversample`` where that tail matters.  Selection is stable per
    row id under growth ONLY within the gate (the gate threshold tightens as
    a group grows — by design, unlike ``hash_split``: a fixed-size sample
    cannot be growth-stable).
    """
    from pyspark.sql import Window

    if k <= 0:
        raise ValueError(f"group_sample needs k >= 1, got {k}")
    if oversample < 1:
        raise ValueError(f"oversample must be >= 1, got {oversample}")
    u = _split_hash(id_col, salt).alias("__u")
    counts = df.groupBy(group_col).agg(F.count("*").alias("__n"))
    # integer division on both sides (Spark `div`, SQL `//`): float division
    # could round the gate differently across engines at exact quotients
    gate = F.least(
        F.lit(DENOM).cast("long"),
        F.expr(f"({oversample * k}L * {DENOM}L) div __n") + F.lit(1).cast("long"),
    )
    gated = (
        df.withColumn("__u", u)
        .join(F.broadcast(counts), group_col)
        .filter(F.col("__u") < gate)
    )
    w = Window.partitionBy(group_col).orderBy(F.col("__u"), F.col(id_col))
    return (
        gated.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__u", "__n", "__rn")
    )


def fractional_thresholds(weights: dict[str, float]) -> dict[str, tuple[int, int]]:
    """Per source: (floor(w) full copies, round(frac(w) * DENOM) gate) —
    integer literals shared between the Spark plan and any SQL oracle."""
    out: dict[str, tuple[int, int]] = {}
    for s, w in weights.items():
        if w < 0.0:
            raise ValueError(f"mixture weight must be >= 0, got {s}={w}")
        full = int(w)
        out[s] = (full, int(round((w - full) * DENOM)))
    return out


def mixture_resample(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """Weighted resampling with upsampling: E[copies per row] = weight.

    Output = input columns + ``epoch`` (long, 0-based copy index).  A row of
    a weight-2.3 source appears with epoch 0 and 1 always, and epoch 2 iff
    its hash gate falls under 0.3 — so exactly-reproducible, monotone in the
    weight, and still a narrow per-row fan-out (explode over a sequence
    literal; no shuffle, no RNG).  Sources absent from ``weights`` drop.
    """
    fr = fractional_thresholds(weights)
    full = F.lit(0)
    gate = F.lit(0).cast("long")
    for s, (nf, g) in sorted(fr.items()):
        full = F.when(F.col(group_col) == s, F.lit(nf)).otherwise(full)
        gate = F.when(F.col(group_col) == s, F.lit(g).cast("long")).otherwise(gate)
    n_copies = full + (portable_selector(id_col) < gate).cast("int")
    return (
        df.withColumn("__n", n_copies)
        .filter(F.col("__n") > 0)
        .withColumn("epoch", F.explode(F.sequence(F.lit(0), F.col("__n") - 1)))
        .withColumn("epoch", F.col("epoch").cast("long"))
        .drop("__n")
    )


def token_budget_sample(
    df: DataFrame,
    budget: int,
    budgets: dict[str, int] | None = None,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "budget",
    method: str = "exact",
    tokenizer: list[tuple[str, str]] | None = None,
    token_count: Column | None = None,
) -> DataFrame:
    """TOKEN-budget mixture sampling: from each group, keep documents in
    salted-hash order until the group's token budget is spent.

    ``tokenizer``: a BPE merges list (``operators.bpe`` — e.g.
    ``DEMO_MERGES`` or ``load_merges('merges.txt')``).  When given,
    ``n_tokens`` is the EXACT BPE token count under that tokenizer instead
    of the whitespace estimate — budgets are denominated in real tokens,
    the currency mixture recipes are actually written in.  Same plan shape
    (the count is one scan-bound fold column); the estimate stays the
    default because it is tokenizer-independent.

    Mixture recipes are written in tokens ("200B tokens of web, 30B of
    code"), but ``mixture_sample``/``group_sample`` select by DOCUMENT,
    and doc-length distributions differ wildly across sources — a doc-rate
    that hits the web budget blows the transcript budget.  This selects on
    the running TOKEN total directly.  Every group gets the default
    ``budget``; ``budgets`` overrides it per group.

    ``method='exact'``: rank each group by the salted portable hash (id
    tie-break) and keep a document iff its INCLUSIVE cumulative token count
    is <= the budget — integer window arithmetic, bit-identical in any
    engine (catalog t24).  Same bounded-strata cost shape as
    ``exact_stratified_split`` (a group's cumsum lives in one partition —
    see SCALE.md); and unlike ``hash_split``, membership is a SNAPSHOT:
    adding documents can displace later ones in hash order.

    ``method='approx'``: the 100 TB path — one aggregation computes each
    group's total token count, the keep-threshold ``budget/total`` maps
    onto the hash domain, and selection becomes the same zero-shuffle
    narrow filter as ``mixture_sample`` (broadcast per-group thresholds).
    Hits the budget in expectation (doc-length/hash independence), not
    exactly — rate-tested, not value-oracled.

    NULL-text documents carry no tokens and are excluded up front.
    Output: the kept rows of ``df`` plus ``n_tokens`` (and, for the exact
    path, ``cum_tokens`` — the running total that justified keeping each
    row, which makes the selection auditable).
    """
    if method not in ("exact", "approx"):
        raise ValueError(f"unknown method {method!r}: expected 'exact' or 'approx'")
    per_group = dict(budgets or {})
    if token_count is not None:
        # Explicit counting convention — used by temperature_budget_sample to
        # SPEND budgets in the same currency temperature_weights computed them.
        ntok = token_count.cast("long")
    elif tokenizer is not None:
        from healthcare_data_pipeline_spark.operators.bpe import bpe_token_count_col

        ntok = bpe_token_count_col(tokenizer, text_col=text_col).cast("long")
    else:
        ntok = F.size(F.split(F.col(text_col), r"[ \t\n\r\f\x0B]+")).cast("long")
    d = df.filter(F.col(text_col).isNotNull()).withColumn("n_tokens", ntok)
    budget_col = F.lit(int(budget)).cast("long")
    for g, b in sorted(per_group.items()):
        budget_col = F.when(F.col(group_col) == g, F.lit(int(b)).cast("long")).otherwise(
            budget_col
        )
    if method == "approx":
        totals = d.groupBy(group_col).agg(F.sum("n_tokens").alias("__total"))
        return (
            d.join(F.broadcast(totals), group_col)
            # keep-fraction budget/total mapped onto the hash domain; a group
            # under budget keeps everything (threshold caps at DENOM).  The
            # ratio is computed in DOUBLE before scaling: a long product
            # budget*DENOM overflows past ~9.2e12 tokens and wraps negative in
            # non-ANSI Spark — silently emptying the sample for exactly the
            # multi-trillion-token groups this path exists for.
            .filter(
                _split_hash(id_col, salt)
                < F.least(
                    F.lit(DENOM).cast("long"),
                    (budget_col.cast("double") / F.col("__total") * DENOM).cast("long"),
                )
            )
            .drop("__total")
        )
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        _split_hash(id_col, salt).asc(), F.col(id_col).asc()
    )
    return (
        d.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= budget_col)
    )


def dsir_scores(
    docs: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_text_col: str | None = None,
    top_n: int | None = None,
) -> DataFrame:
    """TARGETED data selection via importance scoring (DSIR-style): score
    every document in ``docs`` by how much its token distribution looks like
    the ``target`` corpus relative to the raw corpus itself — the knob that
    turns "filter generic junk" (t07/t21/t23) into "select FOR a domain"
    (pick the medical-looking 1% of a 100 TB web crawl given a small seed of
    in-domain text).

    Scoring: with c_t(w)/c_r(w) the token's occurrence count in target/raw
    and N_t/N_r the corpora's total occurrences,

        importance = (Σ_w∈doc c_t(w) / Σ_w∈doc c_r(w)) · (N_r / N_t)

    — the doc's mean target-frequency over its mean raw-frequency, 1.0 when
    the doc's tokens are distribution-neutral, >1 when they skew toward the
    target.  This is the LINEARIZED surrogate of the DSIR paper's unigram
    log-likelihood ratio Σ log(p_t/p_r): same per-token evidence, arithmetic
    instead of geometric pooling.  The pooling is deliberate: the masses are
    exact BIGINT sums and the score is three IEEE-exact double ops, so the
    result value-hashes identically in any engine (catalog t25), whereas a
    sum of libm logs is not bit-portable and would also need ad-hoc
    smoothing for c_t = 0 (here zero-mass tokens simply contribute nothing,
    and ``n_oov`` reports them explicitly).

    Output per doc: (doc_id, n_tokens, n_oov, target_mass, raw_mass,
    importance); with ``top_n`` set, instead returns the selected documents
    (all ``docs`` columns + importance) — the top-n by (importance DESC,
    doc_id) via TakeOrderedAndProject, a per-partition top-n merge that
    never sorts the corpus.  For budgeted selection compose the scores with
    token_budget_sample / group_sample instead of ``top_n``.

    Scale shape (the r12 fix — SCALE.md had measured alpha 1.21 on the old
    per-OCCURRENCE plan): the exploded corpus is collapsed to distinct
    (doc, token) pairs FIRST — ``groupBy(doc_id, h).count()`` with map-side
    combine, so Zipf's law does the heavy lifting (a 10k-token web doc has
    ~2-3k distinct tokens, and the per-token frequency joins downstream see
    pairs, not occurrences).  Tokens travel as xxhash64 8-byte keys (the
    span_dedup ``hash_spans`` trick), never as strings: the two frequency
    tables group on the hash, the pair table joins both on the hash, and
    the per-doc aggregation weights every sum by the pair multiplicity
    ``k`` — integer-identical to the occurrence-level sums.  This removes
    the two super-linear terms the old plan had: string shuffle bytes, and
    stopword join skew (the partition owning "the" received every
    occurrence in the corpus; now it receives one row per containing doc).
    Collision bound: two distinct tokens sharing an xxhash64 value would
    merge counts — probability ~V²/2⁶⁵ for vocabulary V (≈1e-9 even at a
    100M-type vocabulary), the same documented trade span_dedup makes.
    The scalar totals attach via a 1x1 broadcast combine.  Nothing is
    collected to the driver; no table is assumed to fit anywhere.
    """
    tgt_text = target_text_col or text_col
    ws = r"[ \t\n\r\f\x0B]+"
    raw_pairs = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.lower(F.col(text_col)), ws)).alias("tok"),
        )
        .select("doc_id", F.xxhash64("tok").alias("h"))
        .groupBy("doc_id", "h")
        .agg(F.count("*").alias("k"))
    )
    tgt_tok = target.select(
        F.explode(F.split(F.lower(F.col(tgt_text)), ws)).alias("tok")
    ).select(F.xxhash64("tok").alias("h"))
    c_r = raw_pairs.groupBy("h").agg(F.sum("k").alias("c_r"))
    c_t = tgt_tok.groupBy("h").agg(F.count("*").alias("c_t"))
    per = (
        raw_pairs.join(c_r, "h")
        .join(c_t, "h", "left")
        .groupBy("doc_id")
        .agg(
            F.sum("k").alias("n_tokens"),
            F.sum(F.when(F.col("c_t").isNull(), F.col("k")).otherwise(F.lit(0))).alias(
                "n_oov"
            ),
            F.sum(F.col("k") * F.coalesce(F.col("c_t"), F.lit(0))).alias("target_mass"),
            F.sum(F.col("k") * F.col("c_r")).alias("raw_mass"),
        )
    )
    totals = raw_pairs.agg(F.sum("k").alias("n_raw")).crossJoin(
        tgt_tok.agg(F.count("*").alias("n_target"))
    )
    scores = per.crossJoin(F.broadcast(totals)).select(
        "doc_id",
        "n_tokens",
        "n_oov",
        "target_mass",
        "raw_mass",
        (
            (F.col("target_mass").cast("double") / F.col("raw_mass").cast("double"))
            * (F.col("n_raw").cast("double") / F.col("n_target").cast("double"))
        ).alias("importance"),
    )
    if top_n is None:
        return scores
    sel = scores.select(F.col("doc_id").alias("__sid"), "importance")
    return (
        docs.join(sel, F.col(id_col) == F.col("__sid"))
        .drop("__sid")
        .orderBy(F.col("importance").desc(), F.col(id_col))
        .limit(top_n)
    )


def normalized_token_count(text_col: str = "text") -> Column:
    """The temperature-mixture token currency: whitespace split, lowercased,
    EMPTY TOKENS DROPPED (so leading/trailing/repeated whitespace counts 0,
    unlike the raw-split estimate which counts the empty fragments).  Shared
    by ``temperature_weights`` and — via ``token_budget_sample(token_count=)``
    — by ``temperature_budget_sample``, so budgets are computed and spent in
    the SAME currency and realized shares track the weights."""
    ws = r"[ \t\n\r\f\x0B]+"
    return F.size(
        F.filter(F.split(F.lower(F.col(text_col)), ws), lambda x: x != "")
    ).cast("long")


def temperature_weights(
    docs: DataFrame,
    alpha: float = 0.5,
    total_budget: int | None = None,
    group_col: str = "source",
    text_col: str = "text",
    tokenizer: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """TEMPERATURE-scaled mixture weights (the published multilingual /
    multi-source sampling rule: p_i ∝ n_i^alpha — Conneau & Lample 2019
    §3.1, mT5 §3.2 with alpha=0.3, T5's examples-proportional mixing):
    raising small sources and damping dominant ones before a budgeted
    sample, so a 100 TB web slice cannot drown a 10 GB reference corpus at
    alpha < 1.

    Output per group: (group_col, n_docs, n_tokens, weight,
    budget_tokens?) where weight = n_tokens^alpha / Σ_j n_tokens_j^alpha
    and, when ``total_budget`` is given, budget_tokens =
    floor(weight · total_budget) — the per-group token budgets
    ``token_budget_sample(budgets=)`` consumes.

    Portability: at the default alpha=0.5 the power is computed as
    ``sqrt`` — correctly rounded by IEEE-754, so weights hash-verify
    cross-engine (catalog t35); any other alpha goes through ``pow``,
    which libms do NOT guarantee to the last bit — fine for production,
    not for the oracle (documented, like the hasher twins).

    Scale shape: one groupBy(group) token-sum over the scan (map-side
    combine; group count is mixture-recipe-sized, i.e. tiny), one 1x1
    broadcast combine for the normalizer.  Nothing corpus-sized moves.

    ``tokenizer``: a BPE merges list switches the token currency to the
    EXACT count under that tokenizer (the t09/t24 convention) — recipes
    denominated in real model tokens; default is the normalized
    whitespace count.
    """
    if tokenizer is not None:
        from healthcare_data_pipeline_spark.operators.bpe import bpe_token_count_col

        ntok = bpe_token_count_col(tokenizer, text_col=text_col).cast("long")
    else:
        ntok = normalized_token_count(text_col)
    per = docs.groupBy(group_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(ntok).cast("long").alias("n_tokens"),
    )
    s = (
        F.sqrt(F.col("n_tokens").cast("double"))
        if alpha == 0.5
        else F.pow(F.col("n_tokens").cast("double"), F.lit(float(alpha)))
    )
    per = per.withColumn("__s", s)
    # order-independent normalizer: decimal-exact sum (the repo's xsum
    # convention) — a plain float SUM's accumulation order differs across
    # engines/partitionings and breaks the weight hash in the last bit.
    tot = per.agg(F.sum(F.col("__s").cast("decimal(25,8)")).cast("double").alias("__tot"))
    out = per.crossJoin(F.broadcast(tot)).withColumn(
        "weight", F.col("__s") / F.col("__tot")
    )
    if total_budget is not None:
        out = out.withColumn(
            "budget_tokens",
            F.floor(F.col("weight") * F.lit(float(int(total_budget)))).cast("long"),
        )
    return out.drop("__s", "__tot")


def temperature_budget_sample(
    docs: DataFrame,
    total_budget: int,
    alpha: float = 0.5,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    method: str = "exact",
    max_groups: int = 10_000,
    tokenizer: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """The full published temperature-mixture pipeline: compute
    ``temperature_weights``, then ``token_budget_sample`` each group to its
    temperature-scaled token budget.  The per-group budget table collects to
    the driver — bounded by the number of GROUPS (a mixture recipe has
    dozens of sources, not millions; ``max_groups`` raises if violated, the
    components/BPE budget-gate convention), never by corpus size."""
    w = temperature_weights(
        docs, alpha=alpha, total_budget=total_budget, group_col=group_col,
        text_col=text_col, tokenizer=tokenizer,
    )
    rows = w.select(group_col, "budget_tokens").limit(max_groups + 1).collect()
    if len(rows) > max_groups:
        raise ValueError(
            f"temperature_budget_sample: more than {max_groups} groups — "
            "this gate exists because the budget table collects to the "
            "driver; raise max_groups only if the group column is genuinely "
            "recipe-sized."
        )
    # budget_tokens is NULL when the group's token mass is zero everywhere
    # (weight = 0^a/0 = NaN -> floor/cast NULL): spend nothing on it rather
    # than raise.  Budgets are SPENT in the same normalized token currency
    # they were computed in (token_count=), so realized per-group shares
    # track the temperature weights instead of drifting by the raw-split
    # empty-fragment count.
    budgets = {r[0]: int(r[1]) if r[1] is not None else 0 for r in rows}
    if tokenizer is not None:
        from healthcare_data_pipeline_spark.operators.bpe import bpe_token_count_col

        spend_count = bpe_token_count_col(tokenizer, text_col=text_col).cast("long")
    else:
        spend_count = normalized_token_count(text_col)
    return token_budget_sample(
        docs,
        budget=0,
        budgets=budgets,
        group_col=group_col,
        id_col=id_col,
        text_col=text_col,
        method=method,
        token_count=spend_count,
    )
