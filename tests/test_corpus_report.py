"""Corpus health report contracts: sections present, numbers reconcile with
the standalone operators, optional sections gated on inputs, JSON artifact."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from healthcare_data_pipeline_spark.catalog import table
from healthcare_data_pipeline_spark.operators.corpus_report import corpus_report
from tests.conftest import SF_DIR


def test_report_reconciles_and_persists(spark, tmp_path):
    docs = table(spark, SF_DIR, "documents")
    ev = docs.filter(F.col("source") == "src0")
    train = docs.filter(F.col("source") != "src0")
    rep = corpus_report(train, eval_df=ev, ref_df=ev, artifacts_dir=str(tmp_path))

    assert rep["totals"]["n_docs"] == train.count()
    want_tokens = train.select(
        F.sum(F.size(F.split("text", "[ \\t\\n\\r\\f\\x0B]+")))
    ).first()[0]
    assert rep["totals"]["n_tokens"] == want_tokens

    assert sum(r["n_docs"] for r in rep["by_source"]) == rep["totals"]["n_docs"]
    assert {r["group"] for r in rep["by_source"]} == {
        r.source for r in train.select("source").distinct().collect()
    }
    assert sum(r["n_docs"] for r in rep["by_lang"]) == rep["totals"]["n_docs"]

    # dup rates reconcile with the standalone operator
    from healthcare_data_pipeline_spark.operators.dedup_corpus import dup_rate_report

    want_dups = {r.group: r.n_exact_dups for r in dup_rate_report(train).collect()}
    assert {r["group"]: r["n_exact_dups"] for r in rep["dup_rates"]} == want_dups

    # gopher rates are probabilities; the AND rate cannot exceed any flag rate
    rates = rep["gopher_pass_rates"]
    assert all(0.0 <= v <= 1.0 for v in rates.values())
    assert rates["gopher_pass"] <= min(
        v for k, v in rates.items() if k.startswith("flag_")
    )

    q = rep["stopword_ratio"]
    assert q["min"] <= q["p25"] <= q["p50"] <= q["p75"] <= q["max"]

    # optional sections present because inputs were given
    assert sum(r["n_contaminated"] for r in rep["contamination"]) > 0
    assert 0.0 <= rep["drift_vs_reference"]["tvd"] <= 1.0

    on_disk = json.load(open(os.path.join(str(tmp_path), "corpus_report.json")))
    assert on_disk["totals"] == rep["totals"]


def test_optional_sections_absent_without_inputs(spark):
    docs = table(spark, SF_DIR, "documents").limit(50)
    rep = corpus_report(docs)
    assert "contamination" not in rep and "drift_vs_reference" not in rep
    assert set(rep) >= {"totals", "by_source", "dup_rates", "gopher_pass_rates", "stopword_ratio"}
