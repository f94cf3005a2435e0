"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

The actual catalog lives in ``healthcare_data_pipeline_spark.queries`` — one
entry per implemented operator from SURVEY.md §2, each pairing a DataFrame
implementation with its ANSI-SQL oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from healthcare_data_pipeline_spark.queries import catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return catalog()["q14_star_join"].fn(spark, "/root/testdata/sf0.001")


def _verification_recency(history_dir: str | None = None) -> dict[str, int]:
    """Per-catalog-entry last GREEN driver round, read from the repo's own
    CORRECTNESS_r*.json history.  A rows-only ("no_oracle") record only
    counts as coverage while the query still has no oracle — a query that
    has since GAINED an oracle ranks as unverified so its first hash check
    lands promptly.  Crashed, hash-failed, or schema-failed rows are NOT
    coverage (the r3 q26 lesson — a crash row silently rotated the query
    out of the window).  Shared by ``_catalog_order`` (window rotation) and
    the cadence insurance test (tests/test_entry_contract.py)."""
    import glob
    import json
    import os

    from healthcare_data_pipeline_spark.queries import catalog

    has_oracle = {n: q.oracle is not None for n, q in catalog().items()}
    here = history_dir or os.path.dirname(os.path.abspath(__file__))
    last_verified: dict[str, int] = {}
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        try:
            rnd = int(path.rsplit("CORRECTNESS_r", 1)[1].split(".")[0])
            with open(path) as fh:
                rows = json.load(fh)
        except (ValueError, OSError, json.JSONDecodeError):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            if row.get("err") == "no_oracle":
                if has_oracle.get(name):
                    continue  # had no oracle then, has one now -> needs a hash check
                if row.get("spark_rows") is None:
                    continue  # rows-only check and the query didn't even run
            elif not (
                row.get("err") is None
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                continue
            last_verified[name] = max(last_verified.get(name, 0), rnd)
    return last_verified


def _catalog_order(names: list[str], history_dir: str | None = None) -> list[str]:
    """Priority order for the driver's bounded correctness window.

    The driver verifies a bounded prefix of ``queries()`` in iteration order
    (observed cap: 50 entries, r01/r02).  Order by verification recency:
    never-verified entries first, then least-recently-verified, so the
    window rotates and every catalog entry accumulates driver evidence
    across rounds.
    """
    last_verified = _verification_recency(history_dir)
    return sorted(names, key=lambda n: (last_verified.get(n, 0), n))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    cat = catalog()
    return {name: cat[name].fn for name in _catalog_order(list(cat))}


def oracle_sql() -> dict[str, str]:
    """Equivalent DuckDB SQL per query; queries without an oracle (engine-hash
    based ops) are omitted and get the driver's rows-only check."""
    return {name: q.oracle for name, q in sorted(catalog().items()) if q.oracle is not None}
