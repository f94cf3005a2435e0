"""Key-based MERGE (upsert) for the incremental-ingest path.

The reference computes an incremental delta (``WHERE id > max``,
ingest_data.py:56-77) but then writes mode="overwrite" (ingest_data.py:115) —
the SURVEY §7 risk-register contradiction.  This operator supplies the FIXED
semantics: merge the delta into the existing snapshot by key, updates winning
over existing rows, inserts appended.

Plain parquet has no transactional MERGE (that is a table-format feature —
Delta/Iceberg/Hudi); at the DataFrame level the merge is a full-outer join on
the key with update-side precedence, which Catalyst executes as one shuffle
(or broadcast when the delta is small — the common case for incremental
loads).  Writers should emit to a new snapshot directory and swap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(existing: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """Rows from ``updates`` replace same-key rows of ``existing``; new keys
    append.  Columns are taken from the update side when present (both sides
    must share the schema)."""
    if set(existing.columns) != set(updates.columns):
        raise ValueError(
            f"schema mismatch: existing={sorted(existing.columns)} updates={sorted(updates.columns)}"
        )
    e = existing.alias("e")
    u = updates.alias("u")
    joined = e.join(u, F.col(f"e.{key}") == F.col(f"u.{key}"), "full_outer")
    # Update-side presence decides the WHOLE row (a NULL in an update column
    # must overwrite, so per-column coalesce would be wrong).
    take_update = F.col(f"u.{key}").isNotNull()
    cols = [
        F.when(take_update, F.col(f"u.{c}")).otherwise(F.col(f"e.{c}")).alias(c)
        for c in existing.columns
    ]
    return joined.select(*cols)
