"""Profiling operators: data dictionary, validation report, EDA aggregates.

Reference parity (SURVEY.md §2.11):
- data dictionary (runnerfile.py:125-153): per column dtype, null_count,
  unique_count, 5 sample values -> CSV artifact;
- validation report (runnerfile.py:155-169): per table row count + per-column
  null counts -> JSON artifact;
- EDA aggregates (runnerfile.py:177-245, eda.py): numeric histograms,
  categorical top-k, missing-value table (rendering stays driver-side).

Scale design — the single biggest deliberate divergence from the reference:
the reference launches one Spark job per column per metric
(``filter(isNull).count()`` then ``distinct().count()`` per column,
runnerfile.py:129-135 — O(tables x columns x metrics) scans).  Here every
table is profiled in ONE aggregation job; at 100 TB that is the difference
between one pass over the data and hundreds.  ``exact=False`` switches
unique counts to ``approx_count_distinct`` (HLL) — the right default at
scale, where exact per-column distincts are themselves shuffle-heavy.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, exact: bool = True, n_samples: int = 5) -> list[dict[str, Any]]:
    """One-pass per-column profile: dtype, null_count, unique_count, samples."""
    cols = df.columns
    aggs = [F.count("*").alias("__rows")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__null__{c}"))
        if exact:
            aggs.append(F.countDistinct(F.col(c)).alias(f"__uniq__{c}"))
        else:
            aggs.append(F.approx_count_distinct(F.col(c)).alias(f"__uniq__{c}"))
        # bounded, deterministic sample values: smallest n distinct (as strings)
        aggs.append(
            F.slice(F.sort_array(F.collect_set(F.col(c).cast("string"))), 1, n_samples).alias(
                f"__samp__{c}"
            )
        )
    row = df.agg(*aggs).collect()[0].asDict()
    dtypes = dict(df.dtypes)
    return [
        {
            "column": c,
            "dtype": dtypes[c],
            "null_count": int(row[f"__null__{c}"]),
            "unique_count": int(row[f"__uniq__{c}"]),
            "sample_values": list(row[f"__samp__{c}"]),
            "row_count": int(row["__rows"]),
        }
        for c in cols
    ]


def data_dictionary(dfs: dict[str, DataFrame], exact: bool = True) -> list[dict[str, Any]]:
    """Reference data_dictionary.csv shape: one record per (table, column)."""
    out: list[dict[str, Any]] = []
    for name, df in sorted(dfs.items()):
        for rec in profile_table(df, exact=exact):
            out.append({"table": name, **rec})
    return out


def validation_report(dfs: dict[str, DataFrame]) -> dict[str, Any]:
    """Reference validation_report.json shape: rows + null counts per table,
    computed in one job per table (not one per column)."""
    report: dict[str, Any] = {}
    for name, df in sorted(dfs.items()):
        aggs = [F.count("*").alias("__rows")] + [
            F.sum(F.col(c).isNull().cast("long")).alias(c) for c in df.columns
        ]
        row = df.agg(*aggs).collect()[0].asDict()
        report[name] = {
            "rows": int(row["__rows"]),
            "null_counts": {c: int(row[c]) for c in df.columns},
        }
    return report


def numeric_histogram(df: DataFrame, col: str, bins: int = 40) -> DataFrame:
    """Distributed histogram (A16): min/max probe then one binned groupBy.
    Returns (bin, lo, hi, n)."""
    lo, hi = df.agg(F.min(col), F.max(col)).collect()[0]
    if lo is None or hi is None or lo == hi:
        return df.agg(F.count(col).alias("n")).select(
            F.lit(0).alias("bin"),
            F.lit(lo).cast("double").alias("lo"),
            F.lit(hi).cast("double").alias("hi"),
            "n",
        )
    width = (hi - lo) / bins
    b = F.least(F.floor((F.col(col) - F.lit(lo)) / F.lit(width)), F.lit(bins - 1))
    return (
        df.where(F.col(col).isNotNull())
        .groupBy(b.cast("int").alias("bin"))
        .agg(F.count("*").alias("n"))
        .withColumn("lo", (F.lit(lo) + F.col("bin") * F.lit(width)).cast("double"))
        .withColumn("hi", (F.lit(lo) + (F.col("bin") + 1) * F.lit(width)).cast("double"))
        .select("bin", "lo", "hi", "n")
    )


def categorical_top_k(df: DataFrame, col: str, k: int = 10) -> DataFrame:
    """value_counts head-k (A13) with deterministic tie-break."""
    return (
        df.groupBy(col)
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc(col))
        .limit(k)
    )


def write_artifacts(
    dfs: dict[str, DataFrame], artifacts_dir: str, exact: bool = True
) -> dict[str, str]:
    """Materialize the reference's two profiling artifacts (CSV + JSON)."""
    import csv
    import os

    os.makedirs(artifacts_dir, exist_ok=True)
    dd_path = os.path.join(artifacts_dir, "data_dictionary.csv")
    records = data_dictionary(dfs, exact=exact)
    with open(dd_path, "w", newline="") as fh:
        writer = csv.DictWriter(
            fh,
            fieldnames=[
                "table",
                "column",
                "dtype",
                "null_count",
                "unique_count",
                "sample_values",
                "row_count",
            ],
        )
        writer.writeheader()
        for rec in records:
            writer.writerow({**rec, "sample_values": "|".join(map(str, rec["sample_values"]))})
    vr_path = os.path.join(artifacts_dir, "validation_report.json")
    with open(vr_path, "w") as fh:
        json.dump(validation_report(dfs), fh, indent=2, sort_keys=True)
    return {"data_dictionary": dd_path, "validation_report": vr_path}
