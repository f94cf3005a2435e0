"""Shared pytest fixtures: one local SparkSession + a DuckDB oracle harness."""

from __future__ import annotations

import math
import os
from datetime import date, datetime
from decimal import Decimal

import duckdb
import pytest

from healthcare_data_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TEST_CPUS = int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "8"))


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="hdp-spark-tests",
        master=f"local[{TEST_CPUS}]",
        shuffle_partitions=TEST_CPUS,
    )
    yield s


@pytest.fixture(scope="session")
def oracle_con():
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    yield con
    con.close()


def canon(v, float_ndigits=None):
    """Canonicalize a cell value for cross-engine comparison.

    By default floats compare bit-exact (the engine's decimal-exact aggregation
    convention makes that achievable); ``float_ndigits`` enables rounded
    comparison for queries that deliberately keep reference double-sum
    semantics. Decimals normalize; timestamps go to isoformat.
    """
    if v is None:
        return None
    if isinstance(v, Decimal):
        f = float(v)
        return int(f) if f.is_integer() else f
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if float_ndigits is not None:
            v = round(v, float_ndigits)
        return int(v) if v.is_integer() else v
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, int):
        return v
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    return v


def rows_canon(columns, rows, float_ndigits=None):
    """Sort columns by name, canonicalize cells, sort rows — order-insensitive."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(canon(r[i], float_ndigits) for i in order) for r in rows]
    return sorted(columns), sorted(out, key=lambda t: tuple(repr(x) for x in t))


def compare_with_oracle(spark_df, oracle_con, sql, name="", float_ndigits=None):
    """Mirror the driver's t2 gate: row count + column names + canonical values."""
    sdf = spark_df.toPandas()
    odf = oracle_con.execute(sql).fetchdf()
    s_cols = list(sdf.columns)
    o_cols = list(odf.columns)
    assert sorted(s_cols) == sorted(o_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    )
    assert len(sdf) == len(odf), f"{name}: row count spark={len(sdf)} oracle={len(odf)}"
    s_cols_sorted, s_rows = rows_canon(s_cols, sdf.itertuples(index=False, name=None), float_ndigits)
    o_cols_sorted, o_rows = rows_canon(o_cols, odf.itertuples(index=False, name=None), float_ndigits)
    if s_rows != o_rows:
        diffs = [
            (i, a, b) for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b
        ][:5]
        raise AssertionError(
            f"{name}: value mismatch ({len(diffs)}+ diffs); cols={s_cols_sorted}; "
            f"first diffs (spark vs oracle): {diffs}"
        )
