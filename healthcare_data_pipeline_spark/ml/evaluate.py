"""Standalone model evaluator (SURVEY §2.11; reference
``src/model_evaluate.py:18-105,175-182``).

Reproduces the reference's behavior: auto-detect the (y_true, y_pred) column
pair from a predictions DataFrame by substring heuristics, then compute
MSE / RMSE / MAE / R² — here as ONE Spark aggregation instead of pandas on a
collected frame, so the evaluator works on predictions of any size.

The reference's auto-detection famously picks a wrong column pair on its own
artifact (BASELINE.md "model quality (re-eval)" row, R² = −1.419) — the
heuristic ORDER is preserved (prediction-ish names first, then numeric
fallback by position) so behavior is reproducible, but ``evaluate`` also
accepts explicit column names, which is the engine's recommended path.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TRUE_MARKERS = ("actual", "true", "label", "target", "y_true")
_PRED_MARKERS = ("pred", "prediction", "y_pred", "fitted", "estimate")
_NUMERIC = {"int", "bigint", "double", "float", "smallint", "tinyint"}


def detect_columns(df: DataFrame) -> tuple[str, str]:
    """model_evaluate.py:24-45 semantics: substring match on column names,
    positional numeric fallback."""
    numeric = [c for c, t in df.dtypes if t.split("(")[0] in _NUMERIC]
    y_true = next(
        (c for c in numeric if any(m in c.lower() for m in _TRUE_MARKERS)), None
    )
    y_pred = next(
        (c for c in numeric if c != y_true and any(m in c.lower() for m in _PRED_MARKERS)),
        None,
    )
    if y_true is None or y_pred is None:
        remaining = [c for c in numeric if c not in (y_true, y_pred)]
        if y_true is None and remaining:
            y_true = remaining.pop(0)
        if y_pred is None and remaining:
            y_pred = remaining.pop(0)
    if y_true is None or y_pred is None:
        raise ValueError(f"could not detect y_true/y_pred among numeric columns {numeric}")
    return y_true, y_pred


def evaluate(
    df: DataFrame,
    y_true: str | None = None,
    y_pred: str | None = None,
    artifacts_dir: str | None = None,
) -> dict[str, Any]:
    """MSE/RMSE/MAE/R² in a single aggregation job (model_evaluate.py:175-182)."""
    if y_true is None or y_pred is None:
        y_true, y_pred = detect_columns(df)
    t, p = F.col(y_true).cast("double"), F.col(y_pred).cast("double")
    err = t - p
    row = (
        df.where(t.isNotNull() & p.isNotNull())
        .agg(
            F.count("*").alias("n"),
            F.avg(err * err).alias("mse"),
            F.avg(F.abs(err)).alias("mae"),
            F.avg(t).alias("mean_true"),
            F.sum(err * err).alias("ss_res"),
            F.sum(t * t).alias("sum_t2"),
            F.sum(t).alias("sum_t"),
        )
        .collect()[0]
    )
    n = row["n"]
    ss_tot = row["sum_t2"] - row["sum_t"] ** 2 / n if n else float("nan")
    metrics = {
        "y_true": y_true,
        "y_pred": y_pred,
        "n": n,
        "mse": row["mse"],
        "rmse": row["mse"] ** 0.5 if row["mse"] is not None else None,
        "mae": row["mae"],
        "r2": 1.0 - row["ss_res"] / ss_tot if ss_tot else float("nan"),
    }
    if artifacts_dir:
        os.makedirs(artifacts_dir, exist_ok=True)
        with open(os.path.join(artifacts_dir, "model_metrics.json"), "w") as fh:
            json.dump(metrics, fh, indent=2)
    return metrics
