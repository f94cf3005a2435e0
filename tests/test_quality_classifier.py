"""Classifier-based quality filtering contracts (ml/quality_classifier):
separation on separable data, reload-reproducibility, deterministic
stochastic keep, map-side scoring plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from healthcare_data_pipeline_spark.catalog import table
from healthcare_data_pipeline_spark.ml.quality_classifier import (
    classifier_quality_filter,
    load_quality_model,
    save_quality_model,
    score_quality,
    train_quality_classifier,
)
from tests.conftest import SF_DIR


def _corpora(spark):
    """Natural docs (positive) vs deterministic hex-gibberish (negative) —
    separable by construction: natural text shares stopword buckets,
    gibberish tokens are one-off md5 slices."""
    docs = table(spark, SF_DIR, "documents").select("doc_id", "text")
    gib = docs.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.expr(
            "concat_ws(' ', transform(sequence(1, 40), "
            "i -> substring(md5(concat(text, CAST(i AS STRING))), 1, 8)))"
        ).alias("text"),
    )
    return docs, gib


@pytest.fixture(scope="module")
def model_and_data(spark):
    docs, gib = _corpora(spark)
    pos_train, pos_held = docs.filter("doc_id % 5 != 0"), docs.filter("doc_id % 5 = 0")
    neg_train, neg_held = gib.filter("doc_id % 5 != 0"), gib.filter("doc_id % 5 = 0")
    model = train_quality_classifier(pos_train.limit(300), neg_train.limit(300))
    return model, pos_held.limit(100), neg_held.limit(100)


def test_separation_on_separable_corpora(model_and_data):
    model, pos_held, neg_held = model_and_data
    mp = score_quality(model, pos_held).agg(F.avg("quality_prob")).first()[0]
    mn = score_quality(model, neg_held).agg(F.avg("quality_prob")).first()[0]
    assert mp > 0.8, f"held-out natural docs should score high, got {mp:.3f}"
    assert mn < 0.2, f"held-out gibberish should score low, got {mn:.3f}"


def test_scored_schema_keeps_original_columns(model_and_data, spark):
    model, pos_held, _ = model_and_data
    out = score_quality(model, pos_held)
    assert out.columns == ["doc_id", "text", "quality_prob"]


def test_reload_reproduces_scores_exactly(model_and_data, tmp_path):
    model, pos_held, _ = model_and_data
    before = {r.doc_id: r.quality_prob for r in score_quality(model, pos_held).collect()}
    save_quality_model(model, str(tmp_path))
    reloaded = load_quality_model(str(tmp_path))
    after = {r.doc_id: r.quality_prob for r in score_quality(reloaded, pos_held).collect()}
    assert before == after  # bit-identical: same coefficients, same math


def test_hard_filter_separates(model_and_data):
    model, pos_held, neg_held = model_and_data
    n_pos = classifier_quality_filter(pos_held, model, threshold=0.5).count()
    n_neg = classifier_quality_filter(neg_held, model, threshold=0.5).count()
    assert n_pos >= 90 and n_neg <= 10


def test_stochastic_keep_is_deterministic_and_rate_ordered(model_and_data, spark):
    """The hash-uniform Pareto keep: identical sets across invocations (no
    RNG), and high-prob docs survive at a strictly higher rate than
    low-prob ones over the mixed corpus."""
    model, pos_held, neg_held = model_and_data
    mixed = pos_held.unionByName(neg_held)
    k1 = {r.doc_id for r in classifier_quality_filter(mixed, model, stochastic=True).collect()}
    k2 = {r.doc_id for r in classifier_quality_filter(mixed, model, stochastic=True).collect()}
    assert k1 == k2
    pos_ids = {r.doc_id for r in pos_held.select("doc_id").collect()}
    neg_ids = {r.doc_id for r in neg_held.select("doc_id").collect()}
    pos_rate = len(k1 & pos_ids) / len(pos_ids)
    neg_rate = len(k1 & neg_ids) / len(neg_ids)
    assert pos_rate > neg_rate
    # the tail is preserved, not truncated: alpha=2 lets noticeably more
    # low-prob docs through than alpha=16
    loose = {
        r.doc_id
        for r in classifier_quality_filter(mixed, model, stochastic=True, alpha=2.0).collect()
    }
    assert len(loose & neg_ids) >= len(k1 & neg_ids)


def test_scoring_plan_is_mapside_and_python_free(model_and_data):
    """Scoring a 100 TB corpus must not shuffle it or drop into Python:
    no Exchange, no BatchEvalPython/ArrowEvalPython in the scoring plan
    (MLlib transform is JVM-side ScalaUDF)."""
    from healthcare_data_pipeline_spark.plans import simple_plan

    model, pos_held, _ = model_and_data
    plan = simple_plan(score_quality(model, pos_held))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_prep_corpus_composed_with_gopher_and_classifier(model_and_data, spark):
    """The fully-composed front door: heuristic gates -> Gopher battery ->
    classifier keep -> dedup; each optional stage only ever REMOVES docs,
    and the classifier stage drops gibberish the heuristics admit."""
    from healthcare_data_pipeline_spark.operators.quality import prep_corpus

    model, _, _ = model_and_data
    docs, gib = _corpora(spark)
    # give gibberish plausible heuristic stats is hard (hex tokens are
    # 8 chars, no stopwords) — so mix gibberish that PASSES the base gate:
    # natural stopword scaffolding with hex filler (fools ratios, not the
    # classifier's hashed-TF weights)
    tricky = gib.select(
        "doc_id",
        F.expr(
            "concat('the of a in to and that have with be ', text, "
            "' the of a in to and that have with be')"
        ).alias("text"),
    ).withColumn("lang", F.lit("en")).withColumn("source", F.lit("gib")).withColumn(
        "n_chars", F.length("text")
    )
    mixed = docs.select("doc_id", "text").withColumn("lang", F.lit("en")).withColumn(
        "source", F.lit("nat")
    ).withColumn("n_chars", F.length("text")).unionByName(tricky)
    base = prep_corpus(mixed)
    with_cls = prep_corpus(mixed, classifier_model=model, classifier_threshold=0.5)
    base_ids = {r.doc_id for r in base.select("doc_id").collect()}
    cls_ids = {r.doc_id for r in with_cls.select("doc_id").collect()}
    assert cls_ids <= base_ids
    tricky_in_base = {i for i in base_ids if i >= 1_000_000}
    tricky_in_cls = {i for i in cls_ids if i >= 1_000_000}
    assert tricky_in_base, "scaffolded gibberish should pass the heuristic gates"
    assert len(tricky_in_cls) < len(tricky_in_base) / 2, (
        "classifier should drop most scaffolded gibberish the heuristics admit"
    )
    # gopher composes the same way (subset, same schema)
    with_gopher = prep_corpus(mixed, use_gopher=True)
    g_ids = {r.doc_id for r in with_gopher.select("doc_id").collect()}
    assert g_ids <= base_ids and with_gopher.columns == base.columns


def test_scoring_survives_observation_api_use(spark):
    """Regression: pipeline.py's cleanse metrics ride a Dataset.observe —
    after ANY observe on the session, a scoring plan that keeps the model
    UDF (a filter on quality_prob; count() alone would prune it) used to die
    in closure serialization (NotSerializableException: ObservationManager)
    because the fresh LR model retained its training summary and with it a
    session reference.  train/score now strip the summary (ml/util.py)."""
    from pyspark.sql import Observation

    obs = Observation("probe")
    spark.range(10).observe(obs, F.count(F.lit(1)).alias("n")).collect()
    assert obs.get == {"n": 10}  # the session's Observation registry is live

    docs, gib = _corpora(spark)
    model = train_quality_classifier(docs.limit(50), gib.limit(50), max_iter=5)
    assert not model.stages[-1].hasSummary  # summary stripped at train time
    out = classifier_quality_filter(docs.limit(50), model, threshold=0.0)
    assert out.count() == 50  # plan with the model UDF executes


def test_score_quality_warns_when_stripping_an_external_summary(spark):
    """score_quality mutates its input (strips the retained training summary)
    only as a defensive fallback — when it actually does, it must WARN so a
    caller who later reads model.stages[-1].summary can diagnose the 'no
    summary' failure; models from train_quality_classifier are pre-stripped
    and must score silently."""
    import warnings

    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, RegexTokenizer

    docs, gib = _corpora(spark)
    labeled = (
        docs.limit(50).selectExpr("lower(text) AS __text", "1.0 AS label")
        .unionByName(gib.limit(50).selectExpr("lower(text) AS __text", "0.0 AS label"))
    )
    raw = Pipeline(
        stages=[
            RegexTokenizer(inputCol="__text", outputCol="__toks",
                           pattern="[ \\t\\n\\r\\f\\x0B]+", toLowercase=False),
            HashingTF(inputCol="__toks", outputCol="features", numFeatures=1 << 10),
            LogisticRegression(maxIter=5, standardization=False),
        ]
    ).fit(labeled)  # externally fitted: summary retained
    assert raw.stages[-1].hasSummary
    with pytest.warns(RuntimeWarning, match="stripping"):
        score_quality(raw, docs.limit(5))
    assert not raw.stages[-1].hasSummary

    # pre-stripped models (the train_quality_classifier contract) are silent
    clean = train_quality_classifier(docs.limit(50), gib.limit(50), max_iter=5)
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        score_quality(clean, docs.limit(5)).collect()
