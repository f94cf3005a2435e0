"""Contracts for the context-window-prep and PII-scrub operators.

The oracle gate (test_oracle_queries t08/t09/t10) pins cross-engine value
parity; these tests pin the SEMANTIC invariants a training pipeline relies
on: full token coverage with the right overlap, token conservation across
pack bins, bounded bin sizes, and typed redaction tags.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from healthcare_data_pipeline_spark.operators.chunking import chunk_documents, pack_sequences
from healthcare_data_pipeline_spark.operators.redact import redact_pii


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_chunk_coverage_and_overlap(spark):
    # 10 tokens, chunk_size=4, overlap=1 (stride 3): starts 1,4,7 — the last
    # chunk reaches token 10, so no redundant 4th window is emitted
    text = " ".join(f"w{i}" for i in range(1, 11))
    out = chunk_documents(
        _docs(spark, [(1, "a", text)]), chunk_size=4, overlap=1
    ).orderBy("chunk_idx")
    rows = out.collect()
    assert [r.chunk_idx for r in rows] == [0, 1, 2]
    assert [r.chunk_text for r in rows] == [
        "w1 w2 w3 w4",
        "w4 w5 w6 w7",
        "w7 w8 w9 w10",
    ]
    assert [r.n_chunk_tokens for r in rows] == [4, 4, 4]


def test_chunk_short_doc_single_chunk(spark):
    out = chunk_documents(_docs(spark, [(1, "a", "only two")]), chunk_size=64, overlap=16)
    (row,) = out.collect()
    assert (row.chunk_idx, row.n_chunk_tokens, row.chunk_text) == (0, 2, "only two")


def test_chunk_rejects_bad_overlap(spark):
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(_docs(spark, [(1, "a", "x")]), chunk_size=8, overlap=8)


def test_pack_conserves_tokens_and_respects_budget(spark):
    rows = [(i, "s%d" % (i % 2), " ".join(["t"] * (30 + 7 * i))) for i in range(1, 9)]
    d = _docs(spark, rows)
    out = pack_sequences(d, budget=50)
    # conservation: per-document tok_in_bin sums back to n_tokens
    bad = (
        out.groupBy("doc_id", "n_tokens")
        .agg(F.sum("tok_in_bin").alias("s"))
        .filter(F.col("s") != F.col("n_tokens"))
        .count()
    )
    assert bad == 0
    # bin capacity: every bin holds exactly `budget` tokens except each
    # shard's last (the stream is cut every `budget` tokens)
    per_bin = out.groupBy("source", "bin_id").agg(F.sum("tok_in_bin").alias("s")).collect()
    last_bin = {r.source: r.m for r in out.groupBy("source").agg(F.max("bin_id").alias("m")).collect()}
    for r in per_bin:
        assert r.s <= 50
        if r.bin_id < last_bin[r.source]:
            assert r.s == 50


def test_pack_is_per_shard(spark):
    # identical docs in two shards pack identically and independently
    d = _docs(spark, [(1, "a", "x y z"), (1, "b", "x y z")])
    rows = pack_sequences(d, budget=2).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append((r.bin_id, r.tok_in_bin))
    assert by_src["a"] == by_src["b"] == [(0, 2), (1, 1)]


def test_redact_tags_and_counts(spark):
    d = _docs(
        spark,
        [(1, "a", "mail bob.smith@corp.io, call 555-123-4567, ssn 123-45-6789 end")],
    )
    (row,) = redact_pii(d).collect()
    assert (row.n_email, row.n_ssn, row.n_phone) == (1, 1, 1)
    assert row.text == "mail [EMAIL], call [PHONE], ssn [ID] end"


def test_redact_clean_text_unchanged(spark):
    d = _docs(spark, [(1, "a", "no contact info here at all")])
    (row,) = redact_pii(d).collect()
    assert (row.n_email, row.n_ssn, row.n_phone) == (0, 0, 0)
    assert row.text == "no contact info here at all"


def test_plan_shapes(spark):
    """chunk = pure fan-out (no shuffle); pack = exactly one shuffle, on the
    shard key — never a global sort."""
    from healthcare_data_pipeline_spark.plans import count_exchanges, simple_plan
    from tests.conftest import SF_DIR
    from healthcare_data_pipeline_spark.catalog import table

    d = table(spark, SF_DIR, "documents")
    assert count_exchanges(chunk_documents(d)) == 0
    packed = pack_sequences(d)
    assert count_exchanges(packed) == 1
    assert "hashpartitioning(source" in simple_plan(packed)


def test_mixture_sample_rates_and_monotonicity(spark):
    from healthcare_data_pipeline_spark.catalog import table
    from healthcare_data_pipeline_spark.operators.mixture import mixture_sample
    from tests.conftest import SF_DIR

    d = table(spark, SF_DIR, "documents")
    lo = {f"src{i}": 0.3 for i in range(20)}
    hi = {f"src{i}": 0.7 for i in range(20)}
    n = d.count()
    kept_lo = mixture_sample(d, lo).select("doc_id")
    kept_hi = mixture_sample(d, hi).select("doc_id")
    n_lo, n_hi = kept_lo.count(), kept_hi.count()
    # rates land near the target (hash-uniformity; generous band at 500 rows)
    assert abs(n_lo / n - 0.3) < 0.1 and abs(n_hi / n - 0.7) < 0.1
    # monotone: raising every weight only ADDS documents
    assert kept_lo.subtract(kept_hi).count() == 0
    # unknown sources drop under the default weight
    assert mixture_sample(d, {"src0": 1.0}).filter(F.col("source") != "src0").count() == 0


def test_mixture_rejects_upsampling_weight(spark):
    from healthcare_data_pipeline_spark.operators.mixture import mixture_sample

    with pytest.raises(ValueError, match="weight"):
        mixture_sample(_docs(spark, [(1, "a", "x")]), {"a": 1.5})


def test_shuffle_corpus_shape_and_determinism(spark):
    """Range exchange (parallel globally-ordered splits), in-partition sort,
    and a key that reproduces run-to-run."""
    from healthcare_data_pipeline_spark.catalog import table
    from healthcare_data_pipeline_spark.operators.shuffle import shuffle_corpus
    from healthcare_data_pipeline_spark.plans import simple_plan
    from tests.conftest import SF_DIR

    d = table(spark, SF_DIR, "documents")
    out = shuffle_corpus(d, num_splits=4)
    plan = simple_plan(out)
    assert "rangepartitioning" in plan and "Sort" in plan
    assert "SinglePartition" not in plan
    a = [r.doc_id for r in out.select("doc_id").collect()]
    b = [r.doc_id for r in shuffle_corpus(d, num_splits=4).select("doc_id").collect()]
    assert a == b  # deterministic replay
    assert a != sorted(a)  # actually shuffled, not id order
    # epochs interleave: same doc's copies get different keys
    from healthcare_data_pipeline_spark.operators.shuffle import shuffle_key
    from pyspark.sql import functions as FF

    two = d.limit(1).withColumn("epoch", FF.explode(FF.array(FF.lit(0), FF.lit(1))))
    keys = [r.k for r in two.select(shuffle_key("doc_id", "epoch").alias("k")).collect()]
    assert keys[0] != keys[1]


def test_resample_copy_counts(spark):
    from healthcare_data_pipeline_spark.catalog import table
    from healthcare_data_pipeline_spark.operators.mixture import mixture_resample
    from tests.conftest import SF_DIR

    d = table(spark, SF_DIR, "documents")
    w = {f"src{i}": 2.25 for i in range(20)}
    out = mixture_resample(d, w)
    n = d.count()
    counts = out.groupBy("doc_id").agg(F.count("*").alias("c"))
    # every row appears 2 or 3 times; mean near 2.25; epochs are 0..c-1
    assert counts.filter(~F.col("c").isin(2, 3)).count() == 0
    assert abs(out.count() / n - 2.25) < 0.1
    bad_epochs = (
        out.groupBy("doc_id")
        .agg(F.count("*").alias("c"), F.max("epoch").alias("m"), F.min("epoch").alias("lo"))
        .filter((F.col("m") != F.col("c") - 1) | (F.col("lo") != 0))
        .count()
    )
    assert bad_epochs == 0
    # zero-weight sources vanish entirely
    assert mixture_resample(d, {"src0": 0.0}).count() == 0
    # no shuffle in the plan
    from healthcare_data_pipeline_spark.plans import count_exchanges

    assert count_exchanges(mixture_resample(d, w)) == 0


def test_hash_split_contract(spark):
    """Disjoint + exhaustive + stable-under-growth + decorrelated + no shuffle."""
    from healthcare_data_pipeline_spark.catalog import table
    from healthcare_data_pipeline_spark.operators.mixture import hash_split, mixture_sample
    from healthcare_data_pipeline_spark.plans import count_exchanges
    from tests.conftest import SF_DIR

    d = table(spark, SF_DIR, "documents")
    out = hash_split(d).select("doc_id", "source", "split")
    n = d.count()
    counts = {r.split: r["count"] for r in out.groupBy("split").count().collect()}
    # exhaustive and disjoint: one label per row, all rows labeled
    assert sum(counts.values()) == n and set(counts) <= {"train", "val", "test"}
    # proportions near target (hash-uniformity; generous band at 500 rows)
    assert abs(counts.get("train", 0) / n - 0.9) < 0.08
    # stable under growth: dropping half the corpus changes NO surviving label
    half = hash_split(d.filter(F.col("doc_id") % 2 == 0)).select("doc_id", "split")
    assert half.subtract(out.select("doc_id", "split")).count() == 0
    # decorrelated from the mixture gate: the sampled subset's split rate
    # stays near the target (an unsalted split would put ALL low-hash kept
    # rows in 'train' at rate 1.0)
    kept = hash_split(mixture_sample(d, {f"src{i}": 0.3 for i in range(20)}))
    kn = kept.count()
    ktr = kept.filter(F.col("split") == "train").count()
    assert abs(ktr / kn - 0.9) < 0.08
    # zero shuffle
    assert count_exchanges(out) == 0


def test_exact_stratified_split_exactness(spark):
    """Per-stratum split sizes are count-exact to rounding, labels disjoint
    and exhaustive, and the operator matches hash_split's interval order."""
    from healthcare_data_pipeline_spark.catalog import table
    from healthcare_data_pipeline_spark.operators.mixture import exact_stratified_split
    from tests.conftest import SF_DIR

    d = table(spark, SF_DIR, "documents")
    out = exact_stratified_split(d, {"train": 0.8, "val": 0.1, "test": 0.1})
    per = {
        (r.source, r.split): r["count"]
        for r in out.groupBy("source", "split").count().collect()
    }
    totals = d.groupBy("source").count().collect()

    def half_up(x):  # Spark's F.round is HALF_UP, not Python's banker's rounding
        import math

        return math.floor(x + 0.5)

    for row in totals:
        n = row["count"]
        tr = per.get((row.source, "train"), 0)
        va = per.get((row.source, "val"), 0)
        te = per.get((row.source, "test"), 0)
        assert tr + va + te == n
        # boundaries at round(cum * n): train == round(0.8n), train+val == round(0.9n)
        assert tr == half_up(0.8 * n)
        assert tr + va == half_up(0.9 * n)


def test_split_thresholds_validation(spark):
    from healthcare_data_pipeline_spark.operators.mixture import split_thresholds

    with pytest.raises(ValueError, match="sum to 1"):
        split_thresholds({"a": 0.5, "b": 0.4})
    with pytest.raises(ValueError, match=">= 0"):
        split_thresholds({"a": 1.5, "b": -0.5})
    assert split_thresholds({"a": 1.0}) == [("a", 1_000_000)]


def test_group_sample_contract(spark):
    """<= k per group, deterministic, gate+rank agree with the ungated pure
    window rank (the gate must never change WHICH rows win, only how many
    candidates the window sees)."""
    from pyspark.sql import Window

    from healthcare_data_pipeline_spark.catalog import table
    from healthcare_data_pipeline_spark.operators.mixture import _split_hash, group_sample
    from tests.conftest import SF_DIR

    d = table(spark, SF_DIR, "documents")
    k = 5
    got = group_sample(d, k=k).select("doc_id", "source")
    per = {r.source: r["count"] for r in got.groupBy("source").count().collect()}
    sizes = {r.source: r["count"] for r in d.groupBy("source").count().collect()}
    for src, n in sizes.items():
        assert per.get(src, 0) == min(k, n), (src, n, per.get(src))
    # determinism
    again = group_sample(d, k=k).select("doc_id", "source")
    assert got.subtract(again).count() == 0 and again.subtract(got).count() == 0
    # gate never changes the winners: pure (ungated) rank picks the same rows
    w = Window.partitionBy("source").orderBy(_split_hash("doc_id", "sample"), F.col("doc_id"))
    pure = (
        d.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("doc_id", "source")
    )
    assert got.subtract(pure).count() == 0 and pure.subtract(got).count() == 0


def test_group_sample_validation(spark):
    import pytest as _pytest

    from healthcare_data_pipeline_spark.catalog import table
    from healthcare_data_pipeline_spark.operators.mixture import group_sample
    from tests.conftest import SF_DIR

    d = table(spark, SF_DIR, "documents")
    with _pytest.raises(ValueError, match="k >= 1"):
        group_sample(d, k=0)
    with _pytest.raises(ValueError, match="oversample"):
        group_sample(d, k=5, oversample=0)


def test_adaptive_quality_filter_modes(spark):
    """Exact mode: per-source kept count == n - floor(0.2n), survivors are
    the TOP scorers. Approx mode: keeps ~the same fraction (sketch error
    band) with the same direction (low scorers dropped)."""
    from healthcare_data_pipeline_spark.catalog import table
    from healthcare_data_pipeline_spark.operators.quality import (
        adaptive_quality_filter,
        stopword_ratio,
    )
    from tests.conftest import SF_DIR

    d = table(spark, SF_DIR, "documents")
    sizes = {r.source: r["count"] for r in d.groupBy("source").count().collect()}

    exact = adaptive_quality_filter(d, drop_pct=20)
    kept = {r.source: r["count"] for r in exact.groupBy("source").count().collect()}
    for src, n in sizes.items():
        assert kept.get(src, 0) == n - (n * 20) // 100, (src, n, kept.get(src))
    # survivors dominate: the minimum kept score >= the max dropped score is
    # not guaranteed under ties, but mean(kept) must exceed mean(dropped)
    scored = d.withColumn("__s", stopword_ratio())
    kept_ids = exact.select("doc_id")
    mean_kept = scored.join(kept_ids, "doc_id").agg(F.avg("__s")).collect()[0][0]
    mean_drop = scored.join(kept_ids, "doc_id", "left_anti").agg(F.avg("__s")).collect()[0][0]
    assert mean_kept > mean_drop

    approx = adaptive_quality_filter(d, drop_pct=20, method="approx")
    rate = approx.count() / d.count()
    # Threshold-tied rows are KEPT (>=), so the rate floor is ~0.8 minus
    # sketch error only; the ceiling allows for a tie mass point sitting at
    # the 20th percentile being retained in full.
    assert 0.75 < rate <= 0.97

    import pytest as _pytest

    with _pytest.raises(ValueError, match="drop_pct"):
        adaptive_quality_filter(d, drop_pct=100)
    with _pytest.raises(ValueError, match="method"):
        adaptive_quality_filter(d, method="nope")


def test_corpus_composition_totals(spark):
    """Rollup internal consistency + agreement with the actual t19 split."""
    from healthcare_data_pipeline_spark.catalog import table
    from healthcare_data_pipeline_spark.operators.mixture import (
        corpus_composition,
        hash_split,
    )
    from tests.conftest import SF_DIR

    d = table(spark, SF_DIR, "documents")
    rows = corpus_composition(d).collect()
    grand = [r for r in rows if r.source is None and r.split is None]
    assert len(grand) == 1 and grand[0].n_docs == d.count()
    # per-source subtotal == sum of its split rows
    by_src = {}
    for r in rows:
        if r.source is not None and r.split is not None:
            by_src.setdefault(r.source, [0, 0])
            by_src[r.source][0] += r.n_docs
            by_src[r.source][1] += r.n_tokens
    for r in rows:
        if r.source is not None and r.split is None:
            assert [r.n_docs, r.n_tokens] == by_src[r.source]
    # the numbers are the REAL split's numbers, not an estimate
    want = {
        (r.source, r.split): r["count"]
        for r in hash_split(d).groupBy("source", "split").count().collect()
    }
    got = {(r.source, r.split): r.n_docs for r in rows if r.source and r.split}
    assert got == want


def test_rare_bigram_scores_separate_gibberish_from_natural_text(spark):
    """The corpus-adaptive scorer must rank distributional junk above
    natural text even when per-doc gates (length, stopwords) cannot tell
    them apart: the junk docs below reuse the same words as the natural
    ones — only their TRANSITIONS are novel."""
    from healthcare_data_pipeline_spark.operators.quality import rare_bigram_scores

    natural = "the quick brown fox jumps over the lazy dog near the old barn"
    rows = [
        # natural docs share their phrasing -> common bigrams
        (1, natural),
        (2, natural.replace("old barn", "tall tree")),
        (3, "the quick brown fox jumps over the lazy dog every single day"),
        # same vocabulary, shuffled transitions -> every bigram is rare
        (4, "barn the over dog quick near lazy the fox old jumps brown the"),
        (5, None),       # NULL text: no bigrams, absent from output
        (6, "one"),      # single token: no bigrams, absent from output
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in rare_bigram_scores(docs, rare_df=2).collect()}
    assert set(got) == {1, 2, 3, 4}
    # the shuffled doc is maximally rare; the shared-phrasing docs are not
    assert got[4].rare_ratio == 1.0
    assert all(got[i].rare_ratio < got[4].rare_ratio for i in (1, 2, 3))
    # counts are exact: doc 1 has 12 bigrams, and "the lazy" / "lazy dog" /
    # "the quick" / "quick brown" / "brown fox" / "fox jumps" / "jumps over"
    # / "over the" recur in docs 2-3, so well under half of doc 1 is rare
    assert got[1].n_bigrams == 12
    assert 0 <= got[1].n_rare <= 4
    assert all(0 <= r.n_rare <= r.n_bigrams for r in got.values())


def test_token_budget_sample_exact_and_approx(spark):
    """Exact path: per-group inclusive cum_tokens never exceeds its budget,
    per-group overrides bind, NULL text never selected, and the kept token
    mass is maximal for the hash order (adding the next doc in hash order
    would bust the budget).  Approx path: hits each group's budget within
    a loose rate band and keeps everything when the budget exceeds the
    group's total."""
    from healthcare_data_pipeline_spark.catalog import table
    from healthcare_data_pipeline_spark.operators.mixture import token_budget_sample
    from tests.conftest import SF_DIR

    docs = table(spark, SF_DIR, "documents")
    kept = token_budget_sample(docs, budget=1000, budgets={"src0": 200})
    agg = {
        r.source: (r.total, r.n)
        for r in kept.groupBy("source")
        .agg(F.sum("n_tokens").alias("total"), F.count("*").alias("n"))
        .collect()
    }
    assert agg, "selection is non-degenerate"
    for src, (total, n) in agg.items():
        assert total <= (200 if src == "src0" else 1000), (src, total)
        assert n >= 1
    # max(cum_tokens) == kept token mass: the running total is consistent
    mx = {r.source: r.mx for r in kept.groupBy("source").agg(F.max("cum_tokens").alias("mx")).collect()}
    assert all(mx[s] == agg[s][0] for s in agg)
    # NULL text is excluded before selection
    with_null = docs.limit(0).unionByName(
        spark.createDataFrame(
            [(10**9, None, "en", "srcX", 0)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
    ).unionByName(docs)
    assert token_budget_sample(with_null, budget=10**9).filter(
        F.col("doc_id") == 10**9
    ).count() == 0

    # approx: in-expectation budget within a loose band; over-budget keeps all
    n_docs = docs.filter(F.col("text").isNotNull()).count()
    approx = token_budget_sample(docs, budget=1000, method="approx")
    for r in approx.groupBy("source").agg(F.sum("n_tokens").alias("total")).collect():
        assert r.total <= 3000, (r.source, r.total)  # 3x band on a small group
    everything = token_budget_sample(docs, budget=10**9, method="approx")
    assert everything.count() == n_docs
    # multi-trillion-token budget (r8 ADVICE): the threshold math must not
    # overflow long — budget*DENOM at 10^13 wraps negative in non-ANSI Spark
    # and silently emptied the sample before the double-division fix
    huge = token_budget_sample(docs, budget=10**13, method="approx")
    assert huge.count() == n_docs


def test_dsir_scores_rank_target_like_docs_higher(spark):
    """t25's operator contract: docs drawn from the target's vocabulary
    score higher than docs drawn from a disjoint vocabulary, the neutral
    self-target is exactly 1.0, and top_n selection returns the target-like
    docs first."""
    from healthcare_data_pipeline_spark.operators.mixture import dsir_scores

    med = "patient dosage clinical trial symptom diagnosis therapy chronic"
    web = "click subscribe banner cookie advert popup tracker redirect"
    rows = (
        [(i, med + f" filler{i}", "seed") for i in range(5)]
        + [(10 + i, med + f" extra{i}", "crawl") for i in range(5)]
        + [(20 + i, web + f" noise{i}", "crawl") for i in range(5)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    target = docs.filter(F.col("source") == "seed")
    scores = {r.doc_id: r for r in dsir_scores(docs, target).collect()}
    assert len(scores) == 15
    med_imp = min(scores[10 + i].importance for i in range(5))
    web_imp = max(scores[20 + i].importance for i in range(5))
    assert med_imp > web_imp, (med_imp, web_imp)
    # web-only tokens never occur in the target: all 9 are OOV
    assert all(scores[20 + i].n_oov == 9 for i in range(5))
    # self-target is distribution-neutral: c_t == c_r and N_t == N_r, so
    # importance is EXACTLY 1.0 for every doc (IEEE division is exact here)
    neutral = dsir_scores(docs, docs).collect()
    assert all(r.importance == 1.0 for r in neutral)
    # top_n selection: the 10 med-vocab docs outrank every web doc, and the
    # selected frame keeps the docs' own columns + importance
    sel = dsir_scores(docs, target, top_n=10)
    assert set(sel.columns) == {"doc_id", "text", "source", "importance"}
    assert {r.doc_id for r in sel.collect()} == set(range(5)) | {10 + i for i in range(5)}


def test_corpus_drift_report_modes(spark):
    """t26's operator contract: TVD is 0 for identical distributions, 1 for
    disjoint vocabularies, in between for a partial shift; vocabulary-churn
    counts are exact; movers mode surfaces the shifted tokens first."""
    from healthcare_data_pipeline_spark.operators.quality import corpus_drift_report

    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    a = mk([(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta")])
    same = corpus_drift_report(a, a).collect()[0]
    assert same.tvd == 0.0
    assert same.n_new_only_types == 0 and same.n_lost_types == 0
    assert same.n_ref_tokens == 8 and same.n_new_tokens == 8

    b = mk([(3, "epsilon zeta eta theta"), (4, "epsilon zeta eta theta")])
    disjoint = corpus_drift_report(a, b).collect()[0]
    assert disjoint.tvd == 1.0
    assert disjoint.n_new_only_types == 4 and disjoint.n_lost_types == 4

    # partial shift: new batch swaps 'delta' (2 of 8 occurrences) for 'omega'
    # -> exactly 1/4 of the probability mass moved
    c = mk([(5, "alpha beta gamma omega"), (6, "alpha beta gamma omega")])
    part = corpus_drift_report(a, c).collect()[0]
    assert part.tvd == 0.25
    assert part.n_new_only_types == 1 and part.n_lost_types == 1

    movers = corpus_drift_report(a, c, mode="movers", top_n=2).collect()
    assert {m.tok for m in movers} == {"delta", "omega"}
    toks = corpus_drift_report(a, c, mode="tokens")
    assert toks.count() == 5  # alpha beta gamma delta omega
    assert toks.filter(F.col("tok") == "alpha").collect()[0].delta_scaled == 0

    with pytest.raises(ValueError):
        corpus_drift_report(a, c, mode="bogus")


def test_gopher_flags_each_rule_fires_specifically(spark):
    """One crafted violator per Gopher rule: exactly the targeted flag is
    false (the base passing doc trips none)."""
    from healthcare_data_pipeline_spark.operators.quality import gopher_quality_flags

    # a clean doc: 60 natural-ish words incl. stopwords, short lines
    base_words = ("the quick brown fox jumps over the lazy dog and that have with " * 5).split()
    base = " ".join(base_words[:60])
    rows = [
        (0, base),
        (1, "the of and short"),                                # word count < 50
        (2, " ".join(["aa"] * 60)),                             # mean word len < 3 (also stopwords)
        (3, base + " " + "#" * 40),                             # hash ratio (40 hashes vs ~61 words)
        (4, base + " " + "... " * 20),                          # ellipsis ratio
        (5, "\n".join(["- " + base] * 10)),                     # all lines bullets
        (6, "\n".join([base + " ..."] * 10)),                   # all lines end ellipsis
        (7, base + " " + " ".join(["123"] * 60)),               # alpha share < 80%
        (8, " ".join(["zebra"] * 60)),                          # no stopwords
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.asDict() for r in gopher_quality_flags(df).collect()}
    assert got[0]["gopher_pass"], got[0]
    assert not got[1]["flag_word_count"]
    assert not got[2]["flag_mean_word_len"]
    assert not got[3]["flag_hash_ratio"] and got[3]["flag_word_count"]
    assert not got[4]["flag_ellipsis_ratio"]
    assert not got[5]["flag_bullet_lines"]
    assert not got[6]["flag_ellipsis_lines"]
    assert not got[7]["flag_alpha_words"]
    assert not got[8]["flag_stopwords"]
    for i in range(1, 9):
        assert not got[i]["gopher_pass"]


def test_gopher_filter_matches_flags_and_plan_is_scan_bound(spark):
    from healthcare_data_pipeline_spark.catalog import table
    from healthcare_data_pipeline_spark.operators.quality import (
        gopher_filter,
        gopher_quality_flags,
    )
    from healthcare_data_pipeline_spark.plans import simple_plan
    from tests.conftest import SF_DIR

    docs = table(spark, SF_DIR, "documents")
    kept = gopher_filter(docs)
    assert kept.columns == docs.columns
    want = {
        r.doc_id
        for r in gopher_quality_flags(docs).filter("gopher_pass").select("doc_id").collect()
    }
    got = {r.doc_id for r in kept.select("doc_id").collect()}
    assert got == want
    plan = simple_plan(kept)
    assert "Exchange" not in plan and "Join" not in plan


def test_rare_bigram_common_side_is_exact_and_broadcastable(spark):
    """join_side='common' (the join-side reduction for gate duty) must be
    VALUE-IDENTICAL to the default all-bigrams join — rarity is the exact
    complement of commonness — and broadcast_common must land the head as a
    broadcast-hash relation in the plan."""
    from healthcare_data_pipeline_spark.catalog import table
    from healthcare_data_pipeline_spark.operators.quality import rare_bigram_scores
    from healthcare_data_pipeline_spark.plans import simple_plan
    from tests.conftest import SF_DIR

    d = table(spark, SF_DIR, "documents")
    base = {r.doc_id: r for r in rare_bigram_scores(d, rare_df=2).collect()}
    common = {
        r.doc_id: r
        for r in rare_bigram_scores(d, rare_df=2, join_side="common").collect()
    }
    assert base.keys() == common.keys()
    for k in base:
        assert (base[k].n_bigrams, base[k].n_rare, base[k].rare_ratio) == (
            common[k].n_bigrams,
            common[k].n_rare,
            common[k].rare_ratio,
        )
    bcast = rare_bigram_scores(d, rare_df=2, join_side="common", broadcast_common=True)
    plan = simple_plan(bcast)
    assert "BroadcastHashJoin" in plan
    got = {r.doc_id: (r.n_bigrams, r.n_rare) for r in bcast.collect()}
    assert got == {k: (v.n_bigrams, v.n_rare) for k, v in base.items()}

    import pytest as _pytest

    with _pytest.raises(ValueError, match="join_side"):
        rare_bigram_scores(d, join_side="head")


def test_repetition_flags_each_rule_fires_specifically(spark):
    """Gopher A1.2 battery (t28): crafted violators trip exactly their rule;
    a healthy long doc passes everything; counts are the documented exact
    integers."""
    from healthcare_data_pipeline_spark.operators.quality import repetition_flags

    healthy = " ".join(f"tok{i:03d} word{i % 7}x" for i in range(60))
    loop = ("alpha beta " * 30).strip()                      # top-2gram ~100%
    dup_span = (
        " ".join(f"u{i}" for i in range(20))
        + " one two three four five six seven eight nine ten "
        + " ".join(f"v{i}" for i in range(20))
        + " one two three four five six seven eight nine ten "
        + " ".join(f"w{i}" for i in range(20))
    )                                                        # dup 10-gram coverage
    lines = "\n".join(["cookie banner text here"] * 5 + [f"body line {i} unique" for i in range(5)])
    d = spark.createDataFrame(
        [(1, healthy), (2, loop), (3, dup_span), (4, lines)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.asDict() for r in repetition_flags(d).collect()}

    assert got[1]["rep_pass"] is True

    assert got[2]["flag_top2"] is False and got[2]["rep_pass"] is False
    # 'alpha beta' occurs 30 times, 9 chars of tokens each; total 30*9
    assert got[2]["top2_chars"] == 30 * 9 and got[2]["total_chars"] == 270

    # the repeated 10-token run covers 2x10 positions (overlap counted once)
    assert got[3]["flag_dup10"] is False
    assert got[3]["dup10_chars"] == 2 * len("onetwothreefourfivesixseveneightnineten")

    # 5 duplicate lines of 10 total: 4 beyond-first occurrences -> 0.4 > 0.3
    assert got[4]["n_lines"] == 10 and got[4]["dup_lines"] == 4
    assert got[4]["flag_dup_lines"] is False

    # hash-keyed gram shuffle (the dd19 hash_spans trade) is value-identical
    h = {r.doc_id: r.asDict() for r in repetition_flags(d, hash_grams=True).collect()}
    assert h == got


def test_repetition_top_gram_is_most_frequent(spark):
    """A1.2 top-n semantics: the MOST FREQUENT gram's count*chars, not the
    max product over grams — a longer-but-rarer gram must not win."""
    from healthcare_data_pipeline_spark.operators.quality import repetition_flags

    # 'aa bb' x3 (glen 4, product 12) vs 'longword1 longword2' x2 (glen 18,
    # product 36): most-frequent picks the first.
    text = (
        "aa bb aa bb aa bb longword1 longword2 longword1 longword2 "
        + " ".join(f"fil{i:02d}" for i in range(40))
    )
    d = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = repetition_flags(d).collect()[0]
    assert row.top2_chars == 3 * 4


def test_repetition_full_dup_ladder_mid_size_loop(spark):
    """The published n=5..10 ladder: a repeated 7-token run sized so its
    coverage fraction (~0.135) sits under the dup5 (0.15) and dup6 (0.14)
    caps but over the dup7 cap (0.13) — the mid-size slip the two-size
    subset missed."""
    from healthcare_data_pipeline_spark.operators.quality import repetition_flags

    run = " ".join(f"rn{i:02d}" for i in range(7))  # 7 tokens x 4 chars
    fillers = [f"qa{i:02d}" for i in range(90)]     # 90 unique x 4 chars
    text = " ".join(fillers[:45]) + f" {run} " + " ".join(fillers[45:]) + f" {run}"
    d = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = repetition_flags(d).collect()[0]
    assert row.total_chars == 90 * 4 + 2 * 7 * 4 == 416
    # both occurrences covered, overlaps once, for every n in 5..7
    for col in ("dup5_chars", "dup6_chars", "dup7_chars"):
        assert row[col] == 56, col
    assert row.dup8_chars == 0 and row.dup9_chars == 0 and row.dup10_chars == 0
    assert row.flag_dup5 is True and row.flag_dup6 is True
    assert row.flag_dup7 is False          # 100*56 > 13*416
    assert row.rep_pass is False


def test_repetition_null_text_passes_not_dropped(spark):
    """NULL text coalesces to an empty doc (total 0, all flags true) in
    both flags and filter — never a NULL rep_pass, never a silent drop."""
    from healthcare_data_pipeline_spark.operators.quality import (
        repetition_filter,
        repetition_flags,
    )

    d = spark.createDataFrame(
        [(1, None), (2, "ok " * 40)], "doc_id long, text string"
    )
    got = {r.doc_id: r.asDict() for r in repetition_flags(d).collect()}
    assert got[1]["total_chars"] == 0 and got[1]["rep_pass"] is True
    kept = {r.doc_id for r in repetition_filter(d).select("doc_id").collect()}
    assert 1 in kept


def test_repetition_filter_matches_flags(spark):
    from pyspark.sql import functions as F

    from healthcare_data_pipeline_spark.operators.quality import (
        repetition_filter,
        repetition_flags,
    )
    from tests.conftest import SF_DIR

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    kept = {r.doc_id for r in repetition_filter(d).select("doc_id").collect()}
    flags = repetition_flags(d)
    expected = {r.doc_id for r in flags.filter(F.col("rep_pass")).collect()}
    assert kept == expected
    # original columns survive the gate
    assert set(repetition_filter(d).columns) == set(d.columns)


def test_prep_corpus_repetition_gate_composes(spark):
    """use_repetition drops a stopword-scaffolded loop that every other
    heuristic gate admits — the gate-matrix slip-through, closed in the
    front door."""
    from pyspark.sql import functions as F

    from healthcare_data_pipeline_spark.operators.quality import prep_corpus
    from tests.conftest import SF_DIR

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    loop = spark.createDataFrame(
        [(9_900_001, ("the data and the pipeline runs " * 35).strip(), "en", "web", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs = d.unionByName(loop)
    base = prep_corpus(docs)
    gated = prep_corpus(docs, use_repetition=True)
    assert base.filter(F.col("doc_id") == 9_900_001).count() == 1  # admitted
    assert gated.filter(F.col("doc_id") == 9_900_001).count() == 0  # closed
    # the gate only removes docs (subset-monotone)
    assert gated.count() <= base.count()


# --- C4 cleaning battery (t34) --------------------------------------------


def test_c4_line_and_page_rules(spark):
    from healthcare_data_pipeline_spark.operators.quality import c4_clean, c4_filter

    docs = spark.createDataFrame(
        [
            # survives: two 5+-word terminal lines dropped? needs >= 3 kept
            (1, "one two three four five six.\nseven eight nine ten eleven!\ntwelve thirteen fourteen fifteen sixteen?"),
            # line rules: no terminal punct / short / javascript
            (2, "one two three four five six\nshort line here.\nthis line mentions JavaScript five words more.\na b c d e f."),
            # page rules
            (3, "one two three four five.\nlorem ipsum dolor sit amet.\nsix seven eight nine ten.\neleven twelve thirteen fourteen fifteen."),
            (4, 'var x = {\none two three four five.\nsix seven eight nine ten.\neleven twelve thirteen fourteen fifteen.'),
            (5, "one two three badword four five.\nsix seven eight nine ten.\neleven twelve thirteen fourteen fifteen."),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in c4_clean(docs, blocklist=("badword",)).collect()}
    r1 = out[1]
    assert (r1.n_lines, r1.n_kept_lines, r1.c4_keep) == (3, 3, True)
    assert r1.text.count("\n") == 2
    # doc 2: only the last line survives (terminal+5 words+no js) -> < 3 kept
    r2 = out[2]
    assert r2.n_kept_lines == 1 and not r2.c4_keep
    assert "javascript" not in r2.text.lower()
    assert out[3].flag_lorem_ipsum and not out[3].c4_keep
    assert out[4].flag_curly_brace and not out[4].c4_keep
    assert out[5].flag_blocklist and not out[5].c4_keep
    kept = c4_filter(docs, blocklist=("badword",))
    assert [r.doc_id for r in kept.collect()] == [1]
    assert set(kept.columns) == {"doc_id", "text"}


def test_c4_clean_is_one_scan_no_shuffle(spark):
    from healthcare_data_pipeline_spark.operators.quality import c4_clean

    docs = spark.createDataFrame([(1, "a b c d e f.")], "doc_id long, text string")
    plan = c4_clean(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan


# --- temperature-scaled mixture (t35) --------------------------------------


def test_temperature_weights_flatten_and_budget(spark):
    from healthcare_data_pipeline_spark.operators.mixture import temperature_weights

    docs = spark.createDataFrame(
        [(i, "big", "tok " * 20) for i in range(90)]
        + [(1000 + i, "small", "tok " * 20) for i in range(10)],
        "doc_id long, source string, text string",
    )
    w = {r.source: r for r in temperature_weights(docs, alpha=0.5, total_budget=1000).collect()}
    # normalizer is the DECIMAL(25,8)-exact sum (order-independent), so
    # weights sum to 1 within the decimal quantum, not to the last ulp
    assert abs(w["big"].weight + w["small"].weight - 1.0) < 1e-7
    # proportional share of 'small' is 0.1; sqrt-temperature raises it
    assert w["small"].weight > 0.1 and w["big"].weight < 0.9
    assert w["small"].budget_tokens + w["big"].budget_tokens <= 1000
    # alpha=1 degenerates to proportional (pow path)
    w1 = {r.source: r for r in temperature_weights(docs, alpha=1.0).collect()}
    assert abs(w1["small"].weight - 0.1) < 1e-9


def test_temperature_budget_sample_respects_scaled_budgets(spark):
    from pyspark.sql import functions as F
    from healthcare_data_pipeline_spark.operators.mixture import (
        temperature_budget_sample,
        temperature_weights,
    )

    docs = spark.createDataFrame(
        [(i, "big", "tok " * 10) for i in range(90)]
        + [(1000 + i, "small", "tok " * 10) for i in range(10)],
        "doc_id long, source string, text string",
    )
    out = temperature_budget_sample(docs, total_budget=400, alpha=0.5)
    got = {
        r.source: r.tok
        for r in out.groupBy("source")
        .agg(F.sum(F.size(F.split("text", " ")) - 1).alias("tok"))
        .collect()
    }
    w = {
        r.source: r.budget_tokens
        for r in temperature_weights(docs, alpha=0.5, total_budget=400).collect()
    }
    for src_name, tok in got.items():
        assert tok <= w[src_name]
    # the small source gets MORE than its proportional share of the sample
    assert got["small"] / sum(got.values()) > 0.1

    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_groups"):
        temperature_budget_sample(docs, total_budget=400, max_groups=1)


def test_pack_sequences_tokenizer_currency(spark):
    """tokenizer= packs in EXACT BPE tokens ('aa' pieces are one estimate
    token but two exact symbols, and inter-piece whitespace is a symbol of
    its own), so the same budget cuts different bin boundaries per
    currency — and a merge that fuses the piece shrinks the exact count."""
    from pyspark.sql import functions as F
    from healthcare_data_pipeline_spark.operators.chunking import pack_sequences

    docs = spark.createDataFrame(
        [(1, "web", "aa aa aa aa")], "doc_id long, source string, text string"
    )
    est = pack_sequences(docs, budget=4)
    erows = est.collect()
    assert len(erows) == 1 and erows[0].n_tokens == 4
    # exact symbols under a no-op merge: 2 chars per piece + the inter-piece
    # whitespace symbols = 11 tokens -> three bins where the estimate saw one
    ex = pack_sequences(docs, budget=4, tokenizer=[("x", "y")])
    rows = sorted(ex.collect(), key=lambda r: r.bin_id)
    assert [r.tok_in_bin for r in rows] == [4, 4, 3] and rows[0].n_tokens == 11
    # a merge that fuses the piece shrinks the exact count (7 = 4 fused
    # pieces + 3 whitespace symbols) -> two bins
    fused = pack_sequences(docs, budget=4, tokenizer=[("a", "a")])
    frows = sorted(fused.collect(), key=lambda r: r.bin_id)
    assert [r.tok_in_bin for r in frows] == [4, 3] and frows[0].n_tokens == 7
    # conservation in every currency
    assert ex.agg(F.sum("tok_in_bin").alias("s")).head().s == 11

def test_pack_sequences_zero_token_docs_drop(spark):
    """r11 ADVICE: a 0-token doc (empty/whitespace-only text under an exact
    tokenizer) whose cumulative count lands ON a bin boundary used to make
    first_bin > last_bin — F.sequence then generated a DESCENDING range and
    emitted spurious rows; off-boundary it emitted a tok_in_bin=0 row.
    Zero-token docs must simply not appear, and others must be unaffected."""
    from pyspark.sql import functions as F
    from healthcare_data_pipeline_spark.operators.chunking import pack_sequences

    docs = spark.createDataFrame(
        [
            (1, "web", "aa aa"),   # 5 exact symbols under a no-op merge
            (2, "web", ""),        # 0 tokens, cum=5: lands ON the budget=5 boundary
            (3, "web", "   "),     # whitespace-only -> 0 tokens, off-boundary later
            (4, "web", "aa"),      # 2 symbols
        ],
        "doc_id long, source string, text string",
    )
    out = pack_sequences(docs, budget=5, tokenizer=[("x", "y")])
    rows = sorted(out.collect(), key=lambda r: (r.doc_id, r.bin_id))
    assert [r.doc_id for r in rows] == [1, 4]  # zero-token docs gone
    assert all(r.tok_in_bin > 0 for r in rows)
    # conservation: 5 + 2 tokens across bins, bin ids ascending
    assert out.agg(F.sum("tok_in_bin").alias("s")).head().s == 7


def test_temperature_budget_sample_null_budget_and_currency(spark):
    """r11 ADVICE: (a) an all-zero-token group has weight NaN -> NULL
    budget_tokens, which used to raise TypeError in int(); it must spend 0
    instead.  (b) budgets are computed in the normalized token currency
    (empty split fragments dropped) and must be SPENT in the same currency:
    text with doubled whitespace would otherwise burn budget on phantom
    tokens and undershoot the recipe share."""
    from pyspark.sql import functions as F
    from healthcare_data_pipeline_spark.operators.mixture import (
        normalized_token_count,
        temperature_budget_sample,
        temperature_weights,
    )

    docs = spark.createDataFrame(
        # "tok  tok ..." — doubled separators: raw split counts ~2x tokens
        [(i, "web", "  " + "tok  " * 10) for i in range(40)]
        + [(1000, "emptysrc", ""), (1001, "emptysrc", "   ")],
        "doc_id long, source string, text string",
    )
    out = temperature_budget_sample(docs, total_budget=200, alpha=0.5)
    got = {
        r.source: (r.n or 0)
        for r in out.groupBy("source")
        .agg(F.sum(normalized_token_count("text")).alias("n"))
        .collect()
    }
    w = {
        r.source: r.budget_tokens
        for r in temperature_weights(docs, alpha=0.5, total_budget=200).collect()
    }
    assert w["emptysrc"] is None or w["emptysrc"] == 0
    assert got.get("emptysrc", 0) == 0
    # spent-in-same-currency: the web group fills its budget to within one
    # document (10 normalized tokens each) instead of stopping at ~half
    assert w["web"] - 10 < got["web"] <= w["web"]

def test_temperature_pipeline_tokenizer_currency(spark):
    """tokenizer= denominates the WHOLE temperature pipeline in exact BPE
    tokens — weights computed and budgets spent in the same currency (the
    t09/t24 convention extended to t35/t37's pipeline)."""
    from pyspark.sql import functions as F
    from healthcare_data_pipeline_spark.operators.bpe import bpe_token_count_col
    from healthcare_data_pipeline_spark.operators.mixture import (
        temperature_budget_sample,
        temperature_weights,
    )

    docs = spark.createDataFrame(
        [(i, "web", "aa aa aa") for i in range(30)]
        + [(1000 + i, "ref", "aa aa aa") for i in range(5)],
        "doc_id long, source string, text string",
    )
    tok = [("a", "a")]  # fuses 'aa' -> per doc: 3 pieces + 2 ws = 5 exact tokens
    w = {r.source: r for r in temperature_weights(docs, tokenizer=tok, total_budget=100).collect()}
    assert w["web"].n_tokens == 150 and w["ref"].n_tokens == 25
    out = temperature_budget_sample(docs, total_budget=100, tokenizer=tok)
    got = {
        r.source: (r.n or 0)
        for r in out.groupBy("source")
        .agg(F.sum(bpe_token_count_col(tok)).alias("n"))
        .collect()
    }
    # spent in the exact currency: each kept doc costs 5 tokens, so every
    # group fills its floor(weight*100) budget to within one document
    for src in ("web", "ref"):
        assert w[src].budget_tokens - 5 < got.get(src, 0) <= w[src].budget_tokens
