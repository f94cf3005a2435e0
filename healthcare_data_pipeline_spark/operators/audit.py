"""Transform audit log (SURVEY §2.11; reference ``src/transform_log.py:21-119``).

JSONL step log with before/after DataFrame summaries — rows, columns, null
counts, duplicate counts, a bounded sample — and row/column deltas per
transform step.  Summaries are computed with ONE aggregation job per
DataFrame (the reference issues separate jobs per metric), so auditing a
pipeline stage costs a single extra pass even at full scale.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def summarize(df: DataFrame, id_cols: list[str] | None = None, n_sample: int = 3) -> dict[str, Any]:
    """Single-job summary: rows, per-column nulls, duplicate rows on id_cols."""
    cols = df.columns
    keys = [c for c in (id_cols or []) if c in cols]
    aggs = [F.count("*").alias("__rows")] + [
        F.sum(F.col(c).isNull().cast("long")).alias(f"__null__{c}") for c in cols
    ]
    if keys:
        aggs.append(F.count_distinct(*[F.col(k) for k in keys]).alias("__distinct_ids"))
    row = df.agg(*aggs).collect()[0].asDict()
    n_rows = int(row["__rows"])
    out: dict[str, Any] = {
        "rows": n_rows,
        "columns": cols,
        "null_counts": {c: int(row[f"__null__{c}"]) for c in cols},
        "sample": [r.asDict() for r in df.limit(n_sample).collect()],
    }
    if keys:
        out["duplicate_ids"] = n_rows - int(row["__distinct_ids"])
    return out


class TransformLog:
    """Append-only JSONL audit of pipeline steps (transform_log.py semantics:
    one record per step with before/after summaries and deltas)."""

    def __init__(self, path: str) -> None:
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def log_step(
        self,
        step: str,
        before: DataFrame,
        after: DataFrame,
        id_cols: list[str] | None = None,
        **extra: Any,
    ) -> dict[str, Any]:
        b = summarize(before, id_cols=id_cols)
        a = summarize(after, id_cols=id_cols)
        rec = {
            "step": step,
            "before": b,
            "after": a,
            "row_delta": a["rows"] - b["rows"],
            "col_delta": len(a["columns"]) - len(b["columns"]),
            **extra,
        }
        with open(self.path, "a") as f:
            f.write(json.dumps(rec, default=str) + "\n")
        return rec

    def records(self) -> list[dict[str, Any]]:
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [json.loads(line) for line in f if line.strip()]
