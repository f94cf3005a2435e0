"""Physical-plan audit: regenerate PLANS.md from the live catalog.

Plan SHAPE is this engine's stable performance signal (wall-clock on a shared
box is noise — see README): every catalog query's physical plan is summarized
into one row — scan count, exchange count, broadcast count, whole-stage
codegen spans, BroadcastNestedLoopJoin presence, pushed-filter presence — and
the headline queries additionally get their full formatted plans, so a
regression in any query's plan is visible as a PLANS.md diff even when the
timing noise floor hides it.  The scale red flags surface as columns: a BNLJ
on a non-scalar relation, an exchange count that jumped, a scan that lost its
pushed filters.

Usage:  python tools/plan_audit.py [--sf-dir /root/testdata/sf0.01]
Writes: PLANS.md (repo root).
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from healthcare_data_pipeline_spark.session import get_spark  # noqa: E402

HEADLINE_DETAIL = [
    "q01_pricing_summary",
    "q14_star_join",
    "d01_drug_report_shape",
    "dd09_dedup_corpus",
    "t14_training_windows",
    "s07_ann_index_probe",
]


def summarize(plan: str) -> dict:
    return {
        "scans": len(re.findall(r"FileScan parquet|Scan parquet", plan)),
        "exchanges": len(re.findall(r"Exchange (?:hash|range|Single)", plan)),
        "broadcasts": len(re.findall(r"BroadcastExchange", plan)),
        "bnlj": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
        "codegen": len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))),
        "pushed": "yes" if re.search(r"PushedFilters: \[[^\]]", plan) else "-",
        "inmem": len(re.findall(r"InMemoryTableScan", plan)),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    from healthcare_data_pipeline_spark.queries import catalog

    spark = get_spark(app_name="hdp-plan-audit")
    cat = catalog()
    rows = []
    details = {}
    failures = {}
    for name, q in sorted(cat.items()):
        try:
            df = q.fn(spark, args.sf_dir)
            qe = df._jdf.queryExecution()
            plan = qe.executedPlan().toString()
            rows.append((name, summarize(plan)))
            if name in HEADLINE_DETAIL:
                mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
                details[name] = qe.explainString(mode)
        except Exception as exc:  # noqa: BLE001 — audit must cover the rest
            failures[name] = f"{type(exc).__name__}: {exc}"[:200]
        spark.catalog.clearCache()

    lines = [
        "# PLANS — physical-plan audit of the full catalog (tools/plan_audit.py)",
        "",
        f"Plans built against `{args.sf_dir}` (plan SHAPE does not depend on the "
        "scale factor; AQE may still re-plan at runtime).  Red flags to scan "
        "for in a diff: a `bnlj` > 0 on a non-scalar relation (every current "
        "BNLJ is a 1x1 scalar combine or a fixed-size interval table), a "
        "`pushed` column that flipped to `-` on a filtering query, or an "
        "`exchanges` jump on an unchanged query.",
        "",
        "| query | scans | exchanges | broadcasts | bnlj | codegen spans | pushed filters | cache reads |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for name, s in rows:
        lines.append(
            f"| {name} | {s['scans']} | {s['exchanges']} | {s['broadcasts']} | "
            f"{s['bnlj']} | {s['codegen']} | {s['pushed']} | {s['inmem']} |"
        )
    if failures:
        lines += ["", "## Audit failures", ""]
        lines += [f"- `{n}`: {e}" for n, e in sorted(failures.items())]
    lines += ["", "## Headline formatted plans", ""]
    for name in HEADLINE_DETAIL:
        if name in details:
            lines += [f"### {name}", "", "```", details[name].rstrip(), "```", ""]

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo_root, "PLANS.md"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"PLANS.md: {len(rows)} plans summarized, {len(failures)} failures")
    spark.stop()


if __name__ == "__main__":
    main()
