"""Timestamp-unit robustness (the round-3 regression class).

The driver's testdata flipped events.ts from parquet TIMESTAMP(NANOS) to
TIMESTAMP(MICROS, no tz) between rounds and broke q26 + the streaming reader,
which had hardcoded the ns layout.  These tests generate BOTH layouts with
tools/make_testdata.py and assert the engine normalizes each to identical
plain-``timestamp`` results, so the next unit drift fails CI before the round
gate sees it.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest
from pyspark.sql import types as T

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from make_testdata import generate  # noqa: E402

from healthcare_data_pipeline_spark import catalog as cat
from healthcare_data_pipeline_spark.queries import catalog as query_catalog
from healthcare_data_pipeline_spark.streaming import events as stv

from .conftest import compare_with_oracle

UNITS = ("us", "ns")


@pytest.fixture(scope="module")
def unit_dirs(tmp_path_factory):
    dirs = {}
    for unit in UNITS:
        out = str(tmp_path_factory.mktemp(f"ts_{unit}") / "sf0.001")
        generate(out, sf=0.001, ts_unit=unit)
        dirs[unit] = out
    return dirs


@pytest.mark.parametrize("unit", UNITS)
def test_catalog_normalizes_events_ts(spark, unit_dirs, unit):
    df = cat.table(spark, unit_dirs[unit], "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType), df.schema["ts"].dataType
    assert df.count() == 1000


def test_events_identical_across_units(spark, unit_dirs):
    """Same seed, ns truncated to us -> the normalized tables must be equal."""
    us = cat.table(spark, unit_dirs["us"], "events")
    ns = cat.table(spark, unit_dirs["ns"], "events")
    assert us.exceptAll(ns).count() == 0 and ns.exceptAll(us).count() == 0


@pytest.mark.parametrize("unit", UNITS)
def test_q26_sessionize_per_unit_vs_oracle(spark, unit_dirs, unit):
    q = query_catalog()["q26_sessionize"]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{os.path.join(unit_dirs[unit], 'events.parquet')}')"
    )
    try:
        compare_with_oracle(
            q.fn(spark, unit_dirs[unit]), con, q.oracle, name=f"q26[{unit}]"
        )
    finally:
        con.close()


@pytest.mark.parametrize("unit", UNITS)
def test_stream_reader_normalizes_per_unit(spark, unit_dirs, unit):
    """Stream tumbling agg must land in the generated 2024 epoch range — the
    r3 bug put every window in 1970 when the divisor assumed the wrong unit."""
    out = stv.tumbling_agg(stv.read_events_stream(spark, unit_dirs[unit]))
    sink = f"ts_unit_probe_{unit}"
    (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
    )
    rows = spark.sql(
        f"SELECT MIN(YEAR(window_start)) AS y0, MAX(YEAR(window_end)) AS y1, "
        f"SUM(n) AS n FROM {sink}"
    ).collect()[0]
    assert rows["n"] == 1000
    assert rows["y0"] >= 2024, f"windows collapsed to epoch {rows['y0']} (unit bug)"
