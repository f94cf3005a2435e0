"""Standalone validator CLI contract (reference src/validate.py:13-51):
exit 0 on clean readable reports, exit 2 on ANY validation failure, JSON
report with the reference's keys written either way."""

from __future__ import annotations

import json
from pathlib import Path

from healthcare_data_pipeline_spark.validate import validate_readable_reports


def test_validate_happy_path_exit_0(spark, tmp_path):
    rd = tmp_path / "readable_reports"
    rd.mkdir()
    (rd / "drugs.csv").write_text(
        "drug_id,drug_name,price\n1,aspirin,2.5\n2,ibuprofen,\n2,ibuprofen-dup,3.0\n"
    )
    (rd / "prescribers.csv").write_text("presc_id,presc_fullname\n10,alice\n11,bob\n")
    out = tmp_path / "validation_report.json"
    code = validate_readable_reports(rd, out, spark=spark)
    assert code == 0
    rep = json.loads(out.read_text())
    assert rep["ok"] is True and set(rep["files"]) == {"drugs.csv", "prescribers.csv"}
    d = rep["files"]["drugs.csv"]
    assert d["rows"] == 3 and d["columns"] == ["drug_id", "drug_name", "price"]
    assert d["missing_counts"]["price"] == 1 and d["missing_counts"]["drug_id"] == 0
    assert d["duplicates_on_drug_id"] == 1  # drug_id 2 appears twice
    assert len(d["sample_head"]) == 3
    p = rep["files"]["prescribers.csv"]
    assert p["duplicates_on_presc_id"] == 0 and p["rows"] == 2


def test_validate_failure_paths_exit_2(spark, tmp_path):
    out = tmp_path / "r.json"
    # missing directory
    assert validate_readable_reports(tmp_path / "nope", out, spark=spark) == 2
    assert "not found" in json.loads(out.read_text())["error"]
    # directory with no CSVs
    empty = tmp_path / "empty"
    empty.mkdir()
    assert validate_readable_reports(empty, out, spark=spark) == 2
    assert "No CSV files" in json.loads(out.read_text())["warning"]
    # an unreadable CSV fails that file AND the run, without masking good files
    rd = tmp_path / "mixed"
    rd.mkdir()
    (rd / "good.csv").write_text("id,v\n1,a\n")
    (rd / "bad.csv").write_bytes(b"")  # zero-byte: schema inference fails
    assert validate_readable_reports(rd, out, spark=spark) == 2
    rep = json.loads(out.read_text())
    assert rep["ok"] is False
    assert rep["files"]["good.csv"]["ok"] is True
    assert rep["files"]["bad.csv"]["ok"] is False
    assert "Could not read CSV" in rep["files"]["bad.csv"]["error"]


def test_validate_on_pipeline_readable_reports(spark, tmp_path):
    """End-to-end against the DOMAIN pipeline's actual readable_reports
    output dir shape: Path(csv) per table, exit 0."""
    import pyspark.sql.functions as F

    from healthcare_data_pipeline_spark.catalog import table
    from tests.conftest import SF_DIR

    rd = tmp_path / "readable_reports"
    rd.mkdir()
    # shape-faithful: a de-anonymized drug report CSV like pipeline.py writes
    (
        table(spark, SF_DIR, "part")
        .select(F.col("p_partkey").alias("drug_id"), F.col("p_name").alias("drug_name"))
        .limit(50)
        .toPandas()
        .to_csv(rd / "drug_report.csv", index=False)
    )
    out = tmp_path / "validation_report.json"
    assert validate_readable_reports(rd, out, spark=spark) == 0
    rep = json.loads(out.read_text())
    assert rep["files"]["drug_report.csv"]["rows"] == 50
