"""DBAPI database bridge (S1/S2 jar-less fallback): REAL round-trips against
sqlite (stdlib) and duckdb (bundled) files — no jars, no network."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from healthcare_data_pipeline_spark.catalog import table
from healthcare_data_pipeline_spark.sources import pydb

from .conftest import SF_DIR


@pytest.mark.parametrize("scheme", ["sqlite", "duckdb"])
def test_round_trip(spark, tmp_path, scheme):
    url = f"{scheme}:///{tmp_path}/dims_{scheme}.db"
    nation = table(spark, SF_DIR, "nation")
    n = pydb.write_dbapi_table(nation, url, "nation", mode="overwrite")
    assert n == 25

    back = pydb.read_dbapi_table(spark, url, "nation")
    assert back.count() == 25
    assert set(back.columns) == set(nation.columns)
    got = {r.n_nationkey: r.n_name for r in back.collect()}
    want = {r.n_nationkey: r.n_name for r in nation.collect()}
    assert got == want

    # predicate pushdown shape (incremental watermark)
    inc = pydb.read_dbapi_table(spark, url, "nation", predicate="n_nationkey > 20")
    assert inc.count() == 4

    # append mode accumulates
    pydb.write_dbapi_table(nation.limit(5), url, "nation", mode="append")
    assert pydb.read_dbapi_table(spark, url, "nation").count() == 30


def test_overwrite_replaces(spark, tmp_path):
    url = f"sqlite:///{tmp_path}/ow.db"
    nation = table(spark, SF_DIR, "nation")
    pydb.write_dbapi_table(nation, url, "nation")
    pydb.write_dbapi_table(nation.limit(3), url, "nation", mode="overwrite")
    assert pydb.read_dbapi_table(spark, url, "nation").count() == 3


def test_fact_table_guard(spark, tmp_path):
    url = f"sqlite:///{tmp_path}/guard.db"
    li = table(spark, SF_DIR, "lineitem")
    with pytest.raises(ValueError, match="dim-sized"):
        pydb.write_dbapi_table(li, url, "lineitem", limit=100)


def test_identifier_and_url_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="identifier"):
        pydb.read_dbapi_table(spark, f"sqlite:///{tmp_path}/x.db", "nation; DROP")
    with pytest.raises(ValueError, match="unsupported"):
        pydb.read_dbapi_table(spark, "postgres://host/db", "t")


def test_read_table_auto_falls_back(spark, tmp_path):
    url = f"duckdb:///{tmp_path}/auto.db"
    region = table(spark, SF_DIR, "region")
    pydb.write_dbapi_table(region, url, "region")
    out = pydb.read_table_auto(spark, url, "region", jdbc_cfg=None)
    assert out.count() == 5


@pytest.mark.parametrize("scheme", ["sqlite", "duckdb"])
def test_empty_read_keeps_real_schema(spark, tmp_path, scheme):
    """A predicate that matches nothing must return the SAME schema as one
    that matches rows (all-string empty frames silently drift downstream
    schemas — e.g. a watermark read with no new rows)."""
    url = f"{scheme}:///{tmp_path}/empty_{scheme}.db"
    nation = table(spark, SF_DIR, "nation").select("n_nationkey", "n_name", "n_regionkey")
    pydb.write_dbapi_table(nation, url, "nation")
    full = pydb.read_dbapi_table(spark, url, "nation")
    empty = pydb.read_dbapi_table(spark, url, "nation", predicate="n_nationkey < 0")
    assert empty.count() == 0
    assert [(f.name, f.dataType) for f in empty.schema.fields] == [
        (f.name, f.dataType) for f in full.schema.fields
    ]


def test_predicate_tripwire(spark, tmp_path):
    url = f"sqlite:///{tmp_path}/trip.db"
    with pytest.raises(ValueError, match="bare WHERE"):
        pydb.read_dbapi_table(spark, url, "nation", predicate="1=1; DROP TABLE x")
    with pytest.raises(ValueError, match="bare WHERE"):
        pydb.read_dbapi_table(spark, url, "nation", predicate="1=1 -- comment")
