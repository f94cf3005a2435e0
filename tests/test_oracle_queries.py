"""t2-gate mirror: every catalog query vs its DuckDB oracle at small SF.

This is the same comparison the driver runs at sf0.01 — run locally at
sf0.001 (override with SPARK_GRAFT_TEST_SF_DIR) so regressions surface before
the round gate does.
"""

from __future__ import annotations

import pytest

from healthcare_data_pipeline_spark.queries import catalog
from tests.conftest import SF_DIR, compare_with_oracle

CATALOG = catalog()


@pytest.mark.parametrize("name", sorted(n for n in CATALOG if CATALOG[n].oracle))
def test_oracle_types_are_hash_portable(oracle_con, name):
    """No oracle may emit HUGEINT or DECIMAL output columns.

    DuckDB types a bare ``SUM(int)`` as HUGEINT (int128); a type-sensitive
    value hasher (e.g. Arrow, where HUGEINT maps to decimal128) then hashes
    values differently from Spark's BIGINT even when they are identical —
    the t17 r4/r5 driver red.  Every aggregate output must be wrapped in
    ``CAST(... AS BIGINT)`` (or DOUBLE where float semantics are intended).
    ``con.sql`` is lazy, so this checks the planned output types without
    executing the query.
    """
    rel = oracle_con.sql(CATALOG[name].oracle)
    flagged = [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if "HUGEINT" in str(t).upper() or "DECIMAL" in str(t).upper()
    ]
    assert not flagged, (
        f"{name}: oracle emits hash-unportable types {flagged}; "
        "wrap the aggregate in CAST(... AS BIGINT)"
    )


@pytest.mark.parametrize("name", sorted(CATALOG))
def test_query_matches_oracle(spark, oracle_con, name):
    q = CATALOG[name]
    df = q.fn(spark, SF_DIR)
    if q.oracle is None:
        # rows-only check (engine-hash-based operators)
        n = df.count()
        assert n >= 0
        assert df.columns  # stable schema
        return
    compare_with_oracle(df, oracle_con, q.oracle, name=name)
