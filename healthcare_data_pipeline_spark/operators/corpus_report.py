"""[EXT] Corpus health report — ONE artifact answering "what is in this
corpus and is it fit to train on?", composed from the individual curation
diagnostics (each oracle-verified standalone): totals, per-source
composition, exact-duplicate rates, Gopher rule pass rates, language mix,
quality-score distribution, and (optionally) benchmark contamination and
distribution drift vs a reference corpus.

This is the front door a curation review actually opens — the per-operator
DataFrames are for pipelines; a human deciding whether to admit a crawl
snapshot wants one JSON.  Every section is a bounded aggregate (group
cardinality, flag means, sketch quantiles): nothing corpus-sized is ever
collected, so the report costs a handful of scans at any corpus size —
and at 100 TB the scans share the page-cache/columnar scan profile of any
grouped count.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def corpus_report(
    docs: DataFrame,
    eval_df: DataFrame | None = None,
    ref_df: DataFrame | None = None,
    artifacts_dir: str | None = None,
    text_col: str = "text",
    group_col: str = "source",
) -> dict[str, Any]:
    """Build the report dict (and persist ``corpus_report.json`` when
    ``artifacts_dir`` is given).

    ``eval_df`` adds the contamination section (dd13's n-gram rule, n=3);
    ``ref_df`` adds token-distribution drift vs that reference (t26).
    """
    from healthcare_data_pipeline_spark.operators.dedup_corpus import dup_rate_report
    from healthcare_data_pipeline_spark.operators.quality import (
        gopher_quality_flags,
        stopword_ratio,
    )

    ntok = F.size(F.split(F.col(text_col), r"[ \t\n\r\f\x0B]+")).cast("long")
    totals_row = docs.agg(
        F.count("*").alias("n_docs"),
        F.sum(ntok).alias("n_tokens"),
        F.sum(F.length(text_col).cast("long")).alias("n_chars"),
    ).first()
    report: dict[str, Any] = {
        "totals": {
            "n_docs": totals_row["n_docs"],
            "n_tokens": int(totals_row["n_tokens"] or 0),
            "n_chars": int(totals_row["n_chars"] or 0),
        }
    }

    report["by_source"] = [
        r.asDict()
        for r in docs.groupBy(F.col(group_col).alias("group"))
        .agg(F.count("*").alias("n_docs"), F.sum(ntok).alias("n_tokens"))
        .orderBy("group")
        .collect()
    ]
    if "lang" in docs.columns:
        report["by_lang"] = [
            r.asDict()
            for r in docs.groupBy("lang").agg(F.count("*").alias("n_docs")).orderBy("lang").collect()
        ]

    report["dup_rates"] = [
        r.asDict() for r in dup_rate_report(docs, group_col=group_col, text_col=text_col).orderBy("group").collect()
    ]

    flags = gopher_quality_flags(docs, text_col=text_col)
    flag_cols = [c for c in flags.columns if c.startswith("flag_")] + ["gopher_pass"]
    gr = flags.agg(
        *[F.avg(F.col(c).cast("double")).alias(c) for c in flag_cols]
    ).first()
    report["gopher_pass_rates"] = {c: round(gr[c], 4) for c in flag_cols}

    q = docs.select(stopword_ratio(text_col).alias("s")).agg(
        F.min("s").alias("min"),
        F.expr("percentile_approx(s, array(0.25, 0.5, 0.75), 1000)").alias("quartiles"),
        F.max("s").alias("max"),
    ).first()
    report["stopword_ratio"] = {
        "min": q["min"],
        "p25": q["quartiles"][0],
        "p50": q["quartiles"][1],
        "p75": q["quartiles"][2],
        "max": q["max"],
    }

    if eval_df is not None:
        from healthcare_data_pipeline_spark.operators.decontaminate import (
            contamination_report,
        )

        report["contamination"] = [
            r.asDict()
            for r in contamination_report(
                docs, eval_df, n=3, text_col=text_col, group_col=group_col
            ).orderBy("group").collect()
        ]

    if ref_df is not None:
        from healthcare_data_pipeline_spark.operators.quality import corpus_drift_report

        drift = corpus_drift_report(ref_df, docs, text_col=text_col).first()
        report["drift_vs_reference"] = drift.asDict()

    if artifacts_dir is not None:
        os.makedirs(artifacts_dir, exist_ok=True)
        with open(os.path.join(artifacts_dir, "corpus_report.json"), "w") as fh:
            json.dump(report, fh, indent=1, sort_keys=True, default=float)
    return report
