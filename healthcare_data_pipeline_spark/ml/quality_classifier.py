"""[EXT] Classifier-based quality filtering — the GPT-3 / LLaMA data-recipe
stage the heuristic gates (operators.quality) cannot replace: train a linear
classifier to distinguish a trusted reference corpus (curated text) from raw
crawl, score every crawl document, and keep the high-scoring ones.

Public precedents this mirrors (behavior, not code): GPT-3's logistic
classifier over hashed features of WebText-vs-crawl with Pareto-thresholded
stochastic keeping (Brown et al. 2020, appendix A), LLaMA's fastText-style
Wikipedia-reference classifier.  The Spark-first shape:

- **Features**: RegexTokenizer (the canonical explicit whitespace class —
  the same ``[ \\t\\n\\r\\f\\x0B]+`` every oracle-paired tokenization site
  uses) → HashingTF into 2^18 buckets.  Hashed term frequencies need no
  vocabulary broadcast, so featurization is embarrassingly parallel and the
  model is a fixed-size vector regardless of corpus size — exactly what a
  100 TB scoring pass needs.
- **Model**: MLlib LogisticRegression (JVM-side, distributed L-BFGS).  One
  training pass over the (small) labeled set; scoring is a map-side
  ``transform`` — no shuffle of the corpus being scored.
- **Stochastic keep**: GPT-3 keeps a doc when ``score > 1 - pareto_draw``;
  a literal RNG draw is irreproducible across retries/partitionings, so the
  deterministic twin here draws the per-doc uniform from xxhash64(id) —
  same distribution, same doc set on every run (the t19 hash-split trick).

Training is iterative (not SQL-expressible), so this module is verified by
behavioral pytest contracts (separation, reload-reproducibility, filter
monotonicity) rather than a DuckDB oracle — the documented weaker tier.
"""

from __future__ import annotations

import os

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import LogisticRegression
from pyspark.ml.feature import HashingTF, RegexTokenizer
from pyspark.ml.functions import vector_to_array
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from healthcare_data_pipeline_spark.ml.util import strip_training_summary

WS_PATTERN = "[ \\t\\n\\r\\f\\x0B]+"
NUM_FEATURES = 1 << 18
SEED = 42


def train_quality_classifier(
    positive: DataFrame,
    negative: DataFrame,
    text_col: str = "text",
    num_features: int = NUM_FEATURES,
    max_iter: int = 50,
    reg_param: float = 1e-4,
) -> PipelineModel:
    """Fit tokenize→hash→logistic on reference-vs-crawl labels.

    ``positive`` is the trusted corpus (label 1), ``negative`` the raw crawl
    sample (label 0).  Both sides are typically small (a labeled sample, not
    the 100 TB corpus); the expensive pass is scoring, which is map-side.
    """
    labeled = positive.select(F.lower(F.col(text_col)).alias("__text")).withColumn(
        "label", F.lit(1.0)
    ).unionByName(
        negative.select(F.lower(F.col(text_col)).alias("__text")).withColumn(
            "label", F.lit(0.0)
        )
    )
    pipe = Pipeline(
        stages=[
            RegexTokenizer(
                inputCol="__text", outputCol="__toks", pattern=WS_PATTERN, toLowercase=False
            ),
            HashingTF(inputCol="__toks", outputCol="features", numFeatures=num_features),
            LogisticRegression(maxIter=max_iter, regParam=reg_param, standardization=False),
        ]
    )
    # The retained LR training summary references the SparkSession; scoring
    # closures that capture the model would then serialize the session —
    # fatal once anything has used the Observation API (see ml/util.py).
    return strip_training_summary(pipe.fit(labeled))


def score_quality(model: PipelineModel, docs: DataFrame, text_col: str = "text") -> DataFrame:
    """``docs`` + ``quality_prob`` (P[reference-like]).  Map-side only: the
    model broadcasts with the task closure; no shuffle of ``docs``.

    Defensively strips any retained training summary from ``model`` (in
    place, with a visible warning) — a summary-bearing model cannot ride a
    task closure on sessions that have used the Observation API (see
    ml/util.py).  Models from ``train_quality_classifier`` or loaded from
    disk never carry one, so the warning only fires for externally-fitted
    models whose ``.summary`` the caller might still expect to read."""
    if any(getattr(s, "hasSummary", False) for s in getattr(model, "stages", [model])):
        import warnings

        warnings.warn(
            "score_quality is stripping the model's retained training summary in "
            "place (model.stages[-1].summary will no longer be readable); strip at "
            "train time with ml.util.strip_training_summary to silence this",
            RuntimeWarning,
            stacklevel=2,
        )
    strip_training_summary(model)
    scored = model.transform(docs.withColumn("__text", F.lower(F.col(text_col))))
    return scored.withColumn(
        "quality_prob", vector_to_array(F.col("probability")).getItem(1)
    ).drop("__text", "__toks", "features", "rawPrediction", "probability", "prediction")


def classifier_quality_filter(
    docs: DataFrame,
    model: PipelineModel,
    threshold: float = 0.5,
    stochastic: bool = False,
    alpha: float = 9.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Keep documents the classifier likes.

    - ``stochastic=False``: hard cut at ``quality_prob >= threshold``.
    - ``stochastic=True``: the GPT-3 rule ``keep iff prob > 1 - draw`` with
      ``draw ~ Pareto-ish via u^(1/alpha)`` — except the uniform ``u`` comes
      from xxhash64(``id_col``) instead of an RNG, so the kept set is a pure
      function of the data (re-runs, retries, and repartitions agree).
      Low-probability docs still get through at a small, alpha-controlled
      rate, which preserves tail diversity instead of hard-truncating it.
    """
    scored = score_quality(model, docs, text_col=text_col)
    if not stochastic:
        return scored.filter(F.col("quality_prob") >= threshold)
    # u in [0,1) from the doc id; draw = 1 - u^(1/alpha) concentrates near 0
    # (most docs need prob near 1 to pass) with a heavy-ish tail of lucky
    # low-prob survivors — the shape GPT-3's np.random.pareto keep achieves.
    u = (F.pmod(F.xxhash64(F.col(id_col)), F.lit(1_000_000_007)) + 0.5) / 1_000_000_007.0
    draw = F.lit(1.0) - F.pow(u, 1.0 / alpha)
    return scored.filter(F.col("quality_prob") > draw)


def save_quality_model(model: PipelineModel, artifacts_dir: str) -> str:
    path = os.path.join(artifacts_dir, "quality_classifier")
    model.write().overwrite().save(path)
    return path


def load_quality_model(artifacts_dir: str) -> PipelineModel:
    return PipelineModel.load(os.path.join(artifacts_dir, "quality_classifier"))
