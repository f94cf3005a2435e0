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
