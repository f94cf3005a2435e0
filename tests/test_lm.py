"""operators.lm — CCNet-style LM perplexity scoring (t32/t33).

Pins: the hand-computed stupid-backoff model on a tiny corpus, the
eighth-bit integer log2 quantizer's error bound against math.log2, the
backoff/OOV accounting, NULL/empty-text behavior, exact-vs-approx bucket
agreement on head docs, and the exact bucket thirds.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from healthcare_data_pipeline_spark.operators.lm import (
    EIGHTH_BIT_THRESHOLDS,
    eighth_bit_cost,
    lm_score,
    perplexity_buckets,
)


def _py_cost(num: int, den: int) -> int:
    """The quantizer's defining computation, in python ints."""
    k0 = den.bit_length() - num.bit_length()
    k = k0 - 1 if (num << k0) > den else k0
    m = num << k
    j = sum(1 for t in EIGHTH_BIT_THRESHOLDS if den * 256 >= m * t)
    return 8 * k + j


REF = [(1, "the cat sat on the mat"), (2, "the dog sat on the rug")]
# ref token counts: the=4 cat=1 sat=2 on=2 mat=1 dog=1 rug=1 -> N=12 V=7
# ref bigrams: (the,cat) (cat,sat) (sat,on)x2 (on,the)x2 (the,mat)
#              (the,dog) (dog,sat) (the,rug); c1(the)=4 c1(cat)=1 c1(sat)=2
#              c1(on)=2 c1(dog)=1


@pytest.fixture(scope="module")
def scores(spark):
    ref = spark.createDataFrame(REF, "doc_id long, text string")
    docs = spark.createDataFrame(
        [
            (10, "the cat sat"),
            (11, "zebra quantum flux"),
            (12, "the dog sat on the mat"),
            (13, ""),
            (14, None),
            (15, "mat the"),  # (mat,the) unseen bigram, both in-vocab
        ],
        "doc_id long, text string",
    )
    out = lm_score(docs, ref)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_hand_computed_model(scores):
    # doc 10: p(the)=(4+1)/19, p(cat|the)=1/4, p(sat|cat)=1/1
    exp = _py_cost(5, 19) + _py_cost(1, 4) + _py_cost(1, 1)
    r = scores[10]
    assert r["cost_eighth_bits"] == exp
    assert (r["n_tokens"], r["n_backoff"], r["n_oov"]) == (3, 0, 0)
    assert r["bits_per_token"] == exp / (8.0 * 3)


def test_backoff_and_oov(scores):
    # doc 11: all three tokens OOV; first scores add-one unigram 1/19,
    # the rest back off to 2*(0+1)/(5*19).
    r = scores[11]
    assert (r["n_tokens"], r["n_backoff"], r["n_oov"]) == (3, 2, 3)
    assert r["cost_eighth_bits"] == _py_cost(1, 19) + 2 * _py_cost(2, 95)
    # doc 15: "mat the" — both in vocabulary, bigram unseen: backoff with
    # cu(the)=4 -> 2*(4+1)/95; first token mat -> (1+1)/19.
    r15 = scores[15]
    assert (r15["n_backoff"], r15["n_oov"]) == (1, 0)
    assert r15["cost_eighth_bits"] == _py_cost(2, 19) + _py_cost(10, 95)


def test_empty_and_null_text_absent(scores):
    assert 13 not in scores and 14 not in scores


def test_quantizer_error_bound(spark):
    """cost/8 is within 1/8 bit + mantissa-threshold rounding (<= 0.127)
    of true -log2(num/den), and the Spark column matches the python
    definition bit-for-bit."""
    import random

    rng = random.Random(11)
    cases = [(1, 1), (1, 2), (1, 3), (2, 3), (1, 2**43)]
    for _ in range(300):
        den = rng.randrange(1, 2**40)
        num = rng.randrange(1, den + 1)
        cases.append((num, den))
    df = spark.createDataFrame(cases, "num long, den long")
    got = df.select(
        "num", "den", eighth_bit_cost(F.col("num"), F.col("den")).alias("c")
    ).collect()
    for r in got:
        assert r["c"] == _py_cost(r["num"], r["den"])
        true = -math.log2(r["num"] / r["den"])
        assert abs(r["c"] / 8.0 - true) <= 0.127, (r["num"], r["den"])


def test_buckets_exact_thirds(spark):
    ref = spark.createDataFrame(REF, "doc_id long, text string")
    docs = spark.createDataFrame(
        [(i, "the cat sat on the mat " + "zzz " * (i % 7)) for i in range(30)],
        "doc_id long, text string",
    )
    sc = lm_score(docs, ref)
    b = perplexity_buckets(sc, method="exact")
    counts = {r["ppl_bucket"]: r["n"] for r in b.groupBy("ppl_bucket").agg(F.count("*").alias("n")).collect()}
    assert counts == {"head": 10, "middle": 10, "tail": 10}
    # head has strictly lower-or-equal max score than tail's min
    rows = b.select("ppl_bucket", "bits_per_token").collect()
    head_max = max(r["bits_per_token"] for r in rows if r["ppl_bucket"] == "head")
    tail_min = min(r["bits_per_token"] for r in rows if r["ppl_bucket"] == "tail")
    assert head_max <= tail_min
    # approx mode agrees on the extremes (sketch thresholds may wobble at
    # boundaries; the best head doc and worst tail doc cannot flip).
    ba = {r["doc_id"]: r["ppl_bucket"] for r in perplexity_buckets(sc, method="approx").collect()}
    ordered = sorted(rows and b.select("doc_id", "bits_per_token").collect(), key=lambda r: (r["bits_per_token"], r["doc_id"]))
    assert ba[ordered[0]["doc_id"]] == "head"
    assert ba[ordered[-1]["doc_id"]] == "tail"


def test_bad_method_raises(spark):
    ref = spark.createDataFrame(REF, "doc_id long, text string")
    sc = lm_score(ref, ref)
    with pytest.raises(ValueError, match="method"):
        perplexity_buckets(sc, method="nope")


def test_buckets_grouped_per_language(spark):
    """group_col computes tertiles WITHIN each group (the paper's
    per-language split): groups of different sizes each split into thirds,
    and a language whose scores are globally high still gets its own head."""
    ref = spark.createDataFrame(REF, "doc_id long, text string")
    rows = []
    for i in range(12):  # lang a: scores vary with junk suffix length
        rows.append((i, "the cat sat on the mat " + "zzz " * (i % 4), "a"))
    for i in range(6):  # lang b: ALL heavily OOV -> globally tail-ish
        rows.append((100 + i, " ".join(f"qq{i}x{j}" for j in range(8 + i)), "b"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    sc = lm_score(docs, ref).join(docs.select("doc_id", "lang"), "doc_id")
    b = perplexity_buckets(sc, method="exact", group_col="lang")
    counts = {
        (r["lang"], r["ppl_bucket"]): r["n"]
        for r in b.groupBy("lang", "ppl_bucket").agg(F.count("*").alias("n")).collect()
    }
    assert counts[("a", "head")] == 4 and counts[("a", "tail")] == 4
    # lang b gets its own thirds even though every b score exceeds a's max
    assert counts[("b", "head")] == 2 and counts[("b", "middle")] == 2 and counts[("b", "tail")] == 2
    # grouped approx agrees on each group's extremes
    ba = {r["doc_id"]: r["ppl_bucket"] for r in perplexity_buckets(sc, method="approx", group_col="lang").collect()}
    ordered_b = sorted(
        (r for r in b.select("doc_id", "lang", "bits_per_token").collect() if r["lang"] == "b"),
        key=lambda r: (r["bits_per_token"], r["doc_id"]),
    )
    assert ba[ordered_b[0]["doc_id"]] == "head"
    assert ba[ordered_b[-1]["doc_id"]] == "tail"

def test_lm_score_group_col_trains_per_group_models(spark):
    """group_col='lang' keys the whole model by language (t38): identical
    text scores differently under its own language's statistics than under
    a shared pool, and documents of reference-less languages DROP."""
    from healthcare_data_pipeline_spark.operators.lm import lm_score

    a_text = "the cat sat on the mat near the door"
    b_text = "le chat dort sur le tapis pres de la porte"
    docs = spark.createDataFrame(
        [
            (1, a_text, "aa"),
            (2, b_text, "bb"),
            (3, "zz yy xx ww vv uu", "cc"),  # no cc reference -> drops
        ],
        "doc_id long, text string, lang string",
    )
    ref = spark.createDataFrame(
        [(100, a_text, "aa"), (101, a_text, "aa"), (102, b_text, "bb")],
        "doc_id long, text string, lang string",
    )
    out = {r.doc_id: r for r in lm_score(docs, ref, group_col="lang").collect()}
    assert set(out) == {1, 2}  # reference-less lang dropped
    assert out[1].lang == "aa" and out[2].lang == "bb"
    # per-language: each doc is verbatim in ITS OWN reference -> zero
    # backoff positions (every bigram seen in its language's table)
    assert out[1].n_backoff == 0 and out[2].n_backoff == 0
    # shared-pool model scores the same docs DIFFERENTLY (pooled totals
    # change the add-one unigram denominators at position 0)
    shared = {r.doc_id: r for r in lm_score(docs, ref).collect()}
    assert set(shared) == {1, 2, 3}  # shared model scores everyone
    assert shared[1].cost_eighth_bits != out[1].cost_eighth_bits

def test_pair_explode_tokenizes_once(spark):
    """The r12 perf fix's contract: the pair explode materializes the token
    array ONCE per row — the inlined form re-tokenized the whole text for
    every element_at (O(tokens x chars) per doc, measured ~4x on t32)."""
    from healthcare_data_pipeline_spark.operators.lm import _pair_explode

    d = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = _pair_explode(d, "doc_id", "text")._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("split(lower") == 1
    assert "element_at(filter(split" not in plan


def test_lm_drop_audit_and_score_log(spark):
    """lm_drop_audit reports (group, n_docs) for every reference-less group
    and nothing when the reference covers all groups; lm_score's
    dropped_group_log mirrors it and scored output matches the audit."""
    from healthcare_data_pipeline_spark.operators.lm import lm_drop_audit, lm_score

    docs = spark.createDataFrame(
        [(1, "the cat sat", "en"), (2, "the dog ran", "en"),
         (3, "le chat", "fr"), (4, "el gato corre", "es"), (5, "el perro", "es")],
        "doc_id long, text string, lang string",
    )
    ref = spark.createDataFrame(
        [(10, "the cat ran and the dog sat", "en")],
        "doc_id long, text string, lang string",
    )
    audit = {r.lang: r.n_docs_dropped for r in lm_drop_audit(docs, ref, "lang").collect()}
    assert audit == {"fr": 1, "es": 2}

    log: list = []
    scored = lm_score(docs, ref, group_col="lang", dropped_group_log=log)
    assert sorted(log) == [("es", 2), ("fr", 1)]
    assert {r.doc_id for r in scored.collect()} == {1, 2}

    # full coverage -> empty audit, empty log
    ref_full = ref.union(
        spark.createDataFrame(
            [(11, "le chat et le chien", "fr"), (12, "el gato y el perro", "es")],
            "doc_id long, text string, lang string",
        )
    )
    assert lm_drop_audit(docs, ref_full, "lang").count() == 0
    log2: list = []
    lm_score(docs, ref_full, group_col="lang", dropped_group_log=log2).collect()
    assert log2 == []
