"""Standalone offline readable-report validator CLI (reference
``src/validate.py:13-51``) — the user-invokable entry point whose exit-code
contract scripts depend on: **0** when every readable CSV checks out,
**2** on any validation failure (missing directory, no CSVs, unreadable
file), with a JSON report written either way.

The checks themselves (row/column counts, dtypes, per-column missing
counts, duplicate counts on the conventional id columns, a 3-row sample)
already exist inside ``operators/profiling.py`` and the domain e2e tests;
this module packages them behind the reference's CLI surface so a user who
scripts ``python -m src.validate readable_dir --out report.json`` can run
``python -m healthcare_data_pipeline_spark.validate`` with the same
arguments, the same report shape, and the same exit codes.

Spark-first shape: one CSV scan per file, with ALL per-column missing
counts folded into a single aggregation job (``functions.null_count`` —
the A7 one-pass rewrite; the reference runs one pandas ``isna().sum()``
per column, which at scale would be one job per column).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

from pyspark.sql import SparkSession

from healthcare_data_pipeline_spark.functions import null_count

# The reference probes these id columns, first match only (validate.py:26-29).
ID_CANDIDATES = ("presc_id", "drug_id", "id")


def inspect_file(spark: SparkSession, p: Path) -> dict:
    """Per-CSV summary with the reference's keys: rows, columns, dtypes,
    missing_counts, sample_head, duplicates_on_<id>."""
    try:
        df = spark.read.csv(str(p), header=True, inferSchema=True)
        if not df.columns:
            raise ValueError("no columns parsed")
        nulls = df.agg(*[null_count(c) for c in df.columns]).collect()[0]
        summary: dict = {
            "ok": True,
            "rows": df.count(),
            "columns": list(df.columns),
            "dtypes": {c: t for c, t in df.dtypes},
            "missing_counts": {c: int(nulls[f"{c}_nulls"]) for c in df.columns},
            "sample_head": [r.asDict(recursive=True) for r in df.limit(3).collect()],
        }
        for possible_id in ID_CANDIDATES:
            if possible_id in df.columns:
                n = df.count()
                n_distinct = df.select(possible_id).distinct().count()
                summary[f"duplicates_on_{possible_id}"] = n - n_distinct
        return summary
    except Exception as e:  # unreadable file -> per-file failure, like the reference
        return {"ok": False, "error": f"Could not read CSV: {e}"}


def validate_readable_reports(
    readable_dir: Path, out_file: Path, spark: SparkSession | None = None
) -> int:
    """Write the validation report JSON; return the exit code (0 ok / 2 fail).

    Failure conditions mirror the reference exactly: directory missing,
    directory contains no CSVs, or any individual CSV fails to read."""
    own_session = spark is None
    if spark is None:
        spark = (
            SparkSession.builder.appName("hdp-validate")
            .master(os.environ.get("SPARK_GRAFT_MASTER", "local[4]"))
            .getOrCreate()
        )
    try:
        out: dict = {
            "readable_reports_dir": str(readable_dir.resolve()),
            "files": {},
            "ok": True,
        }
        if not readable_dir.exists():
            out["ok"] = False
            out["error"] = f"Directory {readable_dir} not found"
        else:
            csvs = sorted(readable_dir.glob("*.csv"))
            if not csvs:
                out["ok"] = False
                out["warning"] = "No CSV files found in readable_reports"
            for f in csvs:
                out["files"][f.name] = inspect_file(spark, f)
                if not out["files"][f.name].get("ok", False):
                    out["ok"] = False
        out_file.parent.mkdir(parents=True, exist_ok=True)
        out_file.write_text(json.dumps(out, indent=2, default=str), encoding="utf8")
        print(f"Wrote validation report to {out_file}")
        return 0 if out["ok"] else 2
    finally:
        if own_session:
            spark.stop()


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument(
        "readable_dir", nargs="?", default="local_data/artifacts/readable_reports"
    )
    ap.add_argument("--out", default="local_data/artifacts/validation_report.json")
    args = ap.parse_args(argv)
    return validate_readable_reports(Path(args.readable_dir), Path(args.out))


if __name__ == "__main__":
    sys.exit(main())
