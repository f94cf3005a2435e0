"""Model diagnostic artifacts — parity with the reference's evaluation plots
(``src/model_evaluate.py:116-173``: ``plots/residuals_hist.png``,
``plots/pred_vs_actual.png``, ``plots/residuals_vs_pred.png``,
``plots/feature_importances.png``) and its feature-importance extraction
(``src/baseline_model.py:155-167`` saves the fitted model;
``model_evaluate.py:146-173`` reads ``feature_importances_``).

Spark-first split of the work: everything unbounded happens as DataFrame
aggregation (residual histogram bins via integer bucketing — one shuffle-free
scan + a tiny groupBy), and only BOUNDED data crosses to the driver (50 bin
counts; a ``limit(max_points)`` scatter sample; the model's importance
vector).  Rendering uses the repo's dependency-free PNG raster encoder
(``operators/png.py``) because this image bundles no matplotlib.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from healthcare_data_pipeline_spark.operators.png import bar_chart_png, scatter_png


def feature_names(predictions: DataFrame, features_col: str = "features") -> list[str]:
    """Expanded feature-slot names (one-hot slots included) from the ML
    attribute metadata VectorAssembler stamped on ``features_col`` — the
    MLlib equivalent of sklearn's ``feature_names_in_``."""
    meta = predictions.schema[features_col].metadata.get("ml_attr", {})
    attrs = meta.get("attrs", {})
    n = meta.get("num_attrs", 0)
    names = [f"f{i}" for i in range(n)]
    for group in attrs.values():  # "numeric" / "binary" / "nominal" lists
        for a in group:
            idx = a["idx"]
            if idx >= len(names):
                names.extend(f"f{i}" for i in range(len(names), idx + 1))
            names[idx] = a.get("name", f"f{idx}")
    return names


def rf_feature_importances(
    model: Any, predictions: DataFrame, rename: dict[str, str] | None = None
) -> list[dict[str, Any]]:
    """(feature, importance) descending, from a fitted tree-ensemble stage.

    ``model`` is a PipelineModel (last stage = the regressor) or the
    regressor model itself; importances come from MLlib's
    ``featureImportances`` sparse vector (reference: sklearn
    ``feature_importances_``, ``model_evaluate.py:148-149``).  ``rename``
    maps metadata slot names back to source columns — intermediate stages
    (e.g. StandardScaler) emit anonymous slots like ``num_scaled_0`` that
    the caller knows the provenance of.
    """
    stage = model.stages[-1] if hasattr(model, "stages") else model
    vec = stage.featureImportances
    names = feature_names(predictions)
    if rename:
        names = [rename.get(n, n) for n in names]
    pairs = [
        {"feature": names[i] if i < len(names) else f"f{i}", "importance": float(v)}
        for i, v in enumerate(vec.toArray())
        if v > 0
    ]
    pairs.sort(key=lambda d: (-d["importance"], d["feature"]))
    return pairs


def residual_histogram(
    df: DataFrame, y_true: str, y_pred: str, bins: int = 50
) -> list[int]:
    """Residual (actual - predicted) histogram counts, computed engine-side:
    one pass for min/max, one integer-bucket groupBy — no sort, no collect of
    rows, so it works on predictions of any size."""
    r = F.col(y_true).cast("double") - F.col(y_pred).cast("double")
    resid = df.where(r.isNotNull()).select(r.alias("r"))
    row = resid.agg(F.min("r").alias("lo"), F.max("r").alias("hi")).collect()[0]
    lo, hi = row["lo"], row["hi"]
    if lo is None:
        return [0] * bins
    span = (hi - lo) or 1.0
    bucket = F.least(
        F.lit(bins - 1),
        F.floor((F.col("r") - F.lit(lo)) / F.lit(span) * bins).cast("int"),
    )
    counts = {
        int(x["b"]): int(x["n"])
        for x in resid.groupBy(bucket.alias("b")).agg(F.count("*").alias("n")).collect()
    }
    return [counts.get(i, 0) for i in range(bins)]


def render_diagnostics(
    predictions: DataFrame,
    y_true: str,
    y_pred: str,
    artifacts_dir: str,
    model: Any | None = None,
    rename: dict[str, str] | None = None,
    bins: int = 50,
    max_points: int = 5000,
    top_k_features: int = 30,
) -> dict[str, Any]:
    """Write the reference's four diagnostic artifacts under
    ``{artifacts_dir}/plots/`` and return ``{name: path}`` (plus the
    importance list under ``"feature_importances"`` when ``model`` is
    given).  Scatter plots use a bounded ``limit(max_points)`` sample — the
    reference collects the full predictions CSV; at 100 TB that is exactly
    what a diagnostic plot must not do."""
    plots_dir = os.path.join(artifacts_dir, "plots")
    os.makedirs(plots_dir, exist_ok=True)
    out: dict[str, Any] = {}

    hist = residual_histogram(predictions, y_true, y_pred, bins=bins)
    path = os.path.join(plots_dir, "residuals_hist.png")
    with open(path, "wb") as fh:
        fh.write(bar_chart_png([float(v) for v in hist], bar_h=4, gap=1))
    out["residuals_hist"] = path

    t, p = F.col(y_true).cast("double"), F.col(y_pred).cast("double")
    sample = (
        predictions.where(t.isNotNull() & p.isNotNull())
        .select(t.alias("t"), p.alias("p"))
        .limit(max_points)
        .collect()
    )
    ts = [r["t"] for r in sample]
    ps = [r["p"] for r in sample]
    path = os.path.join(plots_dir, "pred_vs_actual.png")
    with open(path, "wb") as fh:
        fh.write(scatter_png(ts, ps, diagonal=True))
    out["pred_vs_actual"] = path

    path = os.path.join(plots_dir, "residuals_vs_pred.png")
    with open(path, "wb") as fh:
        fh.write(scatter_png(ps, [a - b for a, b in zip(ts, ps)], zero_line=True))
    out["residuals_vs_pred"] = path

    if model is not None:
        imps = rf_feature_importances(model, predictions, rename=rename)
        out["feature_importances"] = imps
        path = os.path.join(plots_dir, "feature_importances.png")
        with open(path, "wb") as fh:
            fh.write(bar_chart_png([d["importance"] for d in imps[:top_k_features]]))
        out["feature_importances_png"] = path
        with open(os.path.join(plots_dir, "feature_importances.json"), "w") as fh:
            json.dump(imps, fh, indent=2)
    return out
