"""EDA report, transform audit log, and standalone model evaluator
(SURVEY §2.11 subsystems)."""

from __future__ import annotations

import json
import math
import os

import pytest

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
    # reference object shape (eda.py:296-301) + the engine's richer profiles
    assert set(summary) == {"generated_at", "tables", "top_drugs", "summaries", "table_profiles"}
    assert summary["tables"] == ["nation", "orders"]
    # no domain tables here -> reference 'NA' semantics
    assert summary["summaries"]["distinct_drugs"] == "NA"
    assert summary["top_drugs"] == []
    by_table = {s["table"]: s for s in summary["table_profiles"]}
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


REF_ART = "/root/reference/local_data/artifacts/eda_summary.json"
REF_RAW = "/root/reference/local_data/raw"


@pytest.mark.skipif(not os.path.exists(REF_ART), reason="reference artifact not bundled")
def test_eda_summary_golden_diff_vs_reference(spark, tmp_path):
    """Golden diff against the REFERENCE'S OWN bundled artifact: run our EDA
    over the reference's raw CSVs (the ~6k-row fixture its eda.py ran on)
    and compare eda_summary.json key-by-key — shape AND values for the KPI
    summaries block and the top-drugs list (reference eda.py:220-258,
    296-306)."""
    golden = json.load(open(REF_ART))
    dfs = {
        name: spark.read.option("header", True)
        .option("inferSchema", True)
        .csv(os.path.join(REF_RAW, f"{name}.csv"))
        for name in ("drug", "prescriber", "prescriber_drug")
    }
    _, json_path = generate_eda_report(dfs, str(tmp_path))
    ours = json.load(open(json_path))

    # same top-level keys (ours adds table_profiles on top)
    assert set(golden) <= set(ours)
    assert ours["tables"] == golden["tables"]
    # KPI summaries: identical key set AND identical values
    assert set(ours["summaries"]) == set(golden["summaries"])
    assert ours["summaries"] == golden["summaries"]
    # top_drugs: same element shape, same length, same (drug -> prescriptions)
    assert len(ours["top_drugs"]) == len(golden["top_drugs"]) == 20
    assert all(set(d) == {"drug", "prescriptions"} for d in ours["top_drugs"])
    assert {d["drug"]: d["prescriptions"] for d in ours["top_drugs"]} == {
        d["drug"]: d["prescriptions"] for d in golden["top_drugs"]
    }
