"""EDA report, transform audit log, and standalone model evaluator
(SURVEY §2.11 subsystems)."""

from __future__ import annotations

import json
import math
import os

from pyspark.sql import functions as F

from healthcare_data_pipeline_spark.catalog import table
from healthcare_data_pipeline_spark.ml.evaluate import detect_columns, evaluate
from healthcare_data_pipeline_spark.operators.audit import TransformLog, summarize
from healthcare_data_pipeline_spark.operators.eda import eda_summary, generate_eda_report
from tests.conftest import SF_DIR


def test_eda_report_artifacts(spark, tmp_path):
    dfs = {
        "nation": table(spark, SF_DIR, "nation"),
        "orders": table(spark, SF_DIR, "orders"),
    }
    html_path, json_path = generate_eda_report(dfs, str(tmp_path))
    html = open(html_path).read()
    # charts embed as base64 PNG (reference parity — eda.py:46-117)
    assert "data:image/png;base64," in html and "nation" in html and "orders" in html
    # interactive variant (plotly.js CDN, data inlined — reference eda.py:311-312)
    interactive = open(os.path.join(str(tmp_path), "eda_interactive.html")).read()
    assert "cdn.plot.ly" in interactive and "Plotly.newPlot" in interactive
    assert "orders" in interactive
    summary = json.load(open(json_path))
    by_table = {s["table"]: s for s in summary}
    n_rows = dfs["nation"].count()
    prof = {p["column"]: p for p in by_table["nation"]["profile"]}
    assert prof["n_nationkey"]["row_count"] == n_rows
    assert prof["n_nationkey"]["unique_count"] == n_rows  # pk
    # full-table stats, not a 10k sample: orders histogram counts must sum to count
    o_hist = by_table["orders"]["histograms"]
    assert any(sum(n for _, n in pairs) == dfs["orders"].count() for pairs in o_hist.values())


def test_audit_log_deltas(spark, tmp_path):
    o = table(spark, SF_DIR, "orders")
    log = TransformLog(os.path.join(str(tmp_path), "transform_log.jsonl"))
    filtered = o.filter(F.col("o_totalprice") > 1000.0)
    rec = log.log_step("filter_cheap_orders", o, filtered, id_cols=["o_orderkey"])
    assert rec["row_delta"] == filtered.count() - o.count()
    assert rec["before"]["duplicate_ids"] == 0
    assert rec["col_delta"] == 0
    assert log.records()[-1]["step"] == "filter_cheap_orders"


def test_summarize_counts_nulls_and_dupes(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, None), (3, "c")], "id int, v string"
    )
    s = summarize(df, id_cols=["id"])
    assert s["rows"] == 4
    assert s["null_counts"] == {"id": 0, "v": 1}
    assert s["duplicate_ids"] == 1


def test_evaluate_explicit_columns(spark):
    df = spark.createDataFrame(
        [(1.0, 1.5), (2.0, 2.0), (3.0, 2.5), (4.0, 4.5)], "y double, prediction double"
    )
    m = evaluate(df, y_true="y", y_pred="prediction")
    # errors: -0.5, 0, 0.5, -0.5 -> mse 0.1875, mae 0.375
    assert math.isclose(m["mse"], 0.1875)
    assert math.isclose(m["mae"], 0.375)
    assert math.isclose(m["rmse"], 0.1875**0.5)
    # r2 = 1 - ss_res/ss_tot = 1 - 0.75/5.0
    assert math.isclose(m["r2"], 1 - 0.75 / 5.0)


def test_evaluate_autodetect_and_artifact(spark, tmp_path):
    df = spark.createDataFrame(
        [(10.0, 11.0, "x"), (20.0, 19.0, "y")], "actual double, predicted double, tag string"
    )
    assert detect_columns(df) == ("actual", "predicted")
    m = evaluate(df, artifacts_dir=str(tmp_path))
    saved = json.load(open(os.path.join(str(tmp_path), "model_metrics.json")))
    assert saved["y_true"] == "actual" and saved["y_pred"] == "predicted"
    assert math.isclose(saved["mse"], m["mse"]) and math.isclose(m["mse"], 1.0)
