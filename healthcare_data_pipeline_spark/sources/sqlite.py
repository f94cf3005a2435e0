"""SQLite export sink (S9; reference ``src/export_sqlite.py:13-42``).

The reference loads curated CSVs into a SQLite file with pandas ``to_sql``
and creates indexes on known id columns.  Same shape here, fed from Spark
DataFrames (bounded to driver scale — SQLite is a report artifact, not a
data path)."""

from __future__ import annotations

import sqlite3

from pyspark.sql import DataFrame

INDEX_COLUMNS = ("presc_id", "drug_id", "id")  # export_sqlite.py:30-38


def export_to_sqlite(
    tables: dict[str, DataFrame], db_path: str, limit: int = 100_000
) -> dict[str, int]:
    """Write each DataFrame into a SQLite table (+ indexes); returns row counts."""
    counts: dict[str, int] = {}
    con = sqlite3.connect(db_path)
    try:
        for name, df in sorted(tables.items()):
            pdf = df.limit(limit).toPandas()
            pdf.to_sql(name, con, if_exists="replace", index=False)
            counts[name] = len(pdf)
            for c in pdf.columns:
                if c.lower() in INDEX_COLUMNS:
                    con.execute(f'CREATE INDEX IF NOT EXISTS "idx_{name}_{c}" ON "{name}" ("{c}")')
        con.commit()
    finally:
        con.close()
    return counts
