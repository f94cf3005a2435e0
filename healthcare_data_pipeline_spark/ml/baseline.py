"""Baseline ML model — MLlib parity with the reference's sklearn pipeline
(``src/baseline_model.py:48-167``, SURVEY.md §2.11).

Reference behavior reproduced:
- feature prep (:48-97): left-merge prescriber + drug dims onto the fact,
  engineered features ``brand_prescriber_count`` (distinct prescribers per
  brand, :90-91) and ``presc_total_claims_history`` (prescriber's total
  historical claims, :94-95), nulls imputed to "unknown"/0 (:83-95);
- model (:99-153): one-hot categoricals + standard-scaled numerics ->
  RandomForest regression of ``total_claims``, 100 trees, seed 42, 80/20
  split; RMSE/R² on the holdout; predictions + metrics artifacts.

Spark-first: the pandas ``map(group_size)`` feature engineering becomes
window/group aggregations computed BEFORE the split (exactly like the
reference, which maps statistics computed over the full frame — a known
train-time leakage quirk preserved for parity); the sklearn ColumnTransformer
becomes a pyspark.ml Pipeline, which distributes training at scale.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.ml import Pipeline
from pyspark.ml.evaluation import RegressionEvaluator
from pyspark.ml.feature import OneHotEncoder, StandardScaler, StringIndexer, VectorAssembler
from pyspark.ml.regression import RandomForestRegressor
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CATEGORICAL = ["presc_specialty", "presc_state_code", "drug_type"]
NUMERIC = ["total_drug_cost", "brand_prescriber_count", "presc_total_claims_history"]
LABEL = "total_claims"
SEED = 42


def prepare_features(
    prescriber_drug: DataFrame, prescriber: DataFrame, drug: DataFrame
) -> DataFrame:
    """baseline_model.py:48-97 parity (joins + engineered group statistics)."""
    drug_dim = drug.select("drug_brand_name", "drug_type").dropDuplicates(["drug_brand_name"])
    feats = (
        prescriber_drug.join(
            F.broadcast(prescriber.select("presc_id", "presc_specialty", "presc_state_code")),
            "presc_id",
            "left",
        )
        .join(F.broadcast(drug_dim), "drug_brand_name", "left")
    )
    brand_counts = prescriber_drug.groupBy("drug_brand_name").agg(
        F.countDistinct("presc_id").alias("brand_prescriber_count")
    )
    presc_history = prescriber_drug.groupBy("presc_id").agg(
        F.sum("total_claims").alias("presc_total_claims_history")
    )
    feats = feats.join(F.broadcast(brand_counts), "drug_brand_name", "left").join(
        F.broadcast(presc_history), "presc_id", "left"
    )
    return feats.na.fill({c: "unknown" for c in CATEGORICAL}).na.fill(
        {c: 0 for c in NUMERIC}
    )


def build_pipeline() -> Pipeline:
    """OneHot(categoricals) + StandardScaler(numerics) -> RF(100 trees, seed 42)."""
    indexers = [
        StringIndexer(inputCol=c, outputCol=f"{c}_idx", handleInvalid="keep")
        for c in CATEGORICAL
    ]
    encoder = OneHotEncoder(
        inputCols=[f"{c}_idx" for c in CATEGORICAL],
        outputCols=[f"{c}_oh" for c in CATEGORICAL],
    )
    num_assembler = VectorAssembler(inputCols=NUMERIC, outputCol="num_raw")
    scaler = StandardScaler(inputCol="num_raw", outputCol="num_scaled", withMean=True)
    assembler = VectorAssembler(
        inputCols=[f"{c}_oh" for c in CATEGORICAL] + ["num_scaled"], outputCol="features"
    )
    rf = RandomForestRegressor(
        featuresCol="features", labelCol=LABEL, numTrees=100, seed=SEED
    )
    return Pipeline(stages=[*indexers, encoder, num_assembler, scaler, assembler, rf])


def load_model(path: str):
    """Reload a persisted baseline model (the counterpart of the save in
    ``train_and_evaluate`` — reference model_evaluate.py's joblib.load path).
    Returns a fitted PipelineModel; ``model.transform(features)`` re-scores
    without retraining."""
    from pyspark.ml import PipelineModel

    return PipelineModel.load(path)


@dataclass
class TrainResult:
    rmse: float
    mae: float
    r2: float
    n_train: int
    n_test: int
    predictions: DataFrame
    model: object | None = None  # fitted PipelineModel (last stage = the RF)


def train_and_evaluate(features: DataFrame, artifacts_dir: str | None = None) -> TrainResult:
    """80/20 split (seed 42), fit, holdout metrics, optional artifacts
    (baseline_model.py:99-153 + model_evaluate.py:175-182 metric set)."""
    train, test = features.randomSplit([0.8, 0.2], seed=SEED)
    model = build_pipeline().fit(train)
    preds = model.transform(test)
    evaluator = RegressionEvaluator(labelCol=LABEL, predictionCol="prediction")
    rmse = evaluator.setMetricName("rmse").evaluate(preds)
    mae = evaluator.setMetricName("mae").evaluate(preds)
    r2 = evaluator.setMetricName("r2").evaluate(preds)
    result = TrainResult(
        rmse=rmse,
        mae=mae,
        r2=r2,
        n_train=train.count(),
        n_test=test.count(),
        predictions=preds,
        model=model,
    )
    if artifacts_dir:
        from healthcare_data_pipeline_spark.ml.diagnostics import (
            render_diagnostics,
            rf_feature_importances,
        )

        os.makedirs(artifacts_dir, exist_ok=True)
        # Feature importances from the fitted RF (reference extracts
        # sklearn's feature_importances_ via the saved joblib model,
        # baseline_model.py:155-167 + model_evaluate.py:146-173).  The
        # StandardScaler emits anonymous num_scaled_{i} slots; map them back
        # to the source numeric columns.
        numeric_slots = {f"num_scaled_{i}": c for i, c in enumerate(NUMERIC)}
        importances = rf_feature_importances(model, preds, rename=numeric_slots)
        with open(os.path.join(artifacts_dir, "model_summary.json"), "w") as fh:
            json.dump(
                {
                    "model": "RandomForestRegressor(numTrees=100, seed=42)",
                    "rmse": rmse,
                    "mae": mae,
                    "r2": r2,
                    "n_train": result.n_train,
                    "n_test": result.n_test,
                    "feature_importances": importances,
                },
                fh,
                indent=2,
            )
        preds.select(LABEL, "prediction").limit(10_000).toPandas().to_csv(
            os.path.join(artifacts_dir, "predictions.csv"), index=False
        )
        # Persist the fitted model itself (reference baseline_model.py:144-145,
        # joblib.dump -> models/baseline_model.joblib) so evaluation can
        # reload and re-score without retraining (model_evaluate.py's load
        # path).  MLlib-native save: a directory of per-stage metadata +
        # parquet tree data — written through the Hadoop FS layer, so the
        # same call works on HDFS/object stores; reload with
        # ``load_model(path)``.
        model.write().overwrite().save(os.path.join(artifacts_dir, "baseline_model"))
        # The reference's diagnostic plot set (model_evaluate.py:116-173)
        # under artifacts/plots/.
        render_diagnostics(
            preds, LABEL, "prediction", artifacts_dir, model=model, rename=numeric_slots
        )
    return result
