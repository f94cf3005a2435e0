"""local_relation (r15): VALUES-backed local relations must be value-identical
to createDataFrame and must actually plan as a LocalRelation (no Python-RDD
scan — the point of the helper)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import types as T

from healthcare_data_pipeline_spark.localrel import local_relation


ROWS = [
    (0, "plain", 0.5, [1, 2, 3]),
    (1, "quo'te and back\\slash", -1.0, []),
    (2, None, 1e-300, [9]),
    (None, "tab\tnewline\nend", 0.1 + 0.2, None),
    (4, "ünïcode — em dash", math.pi, [0]),
]
DDL = "id bigint, s string, d double, a array<bigint>"


def test_values_matches_create_dataframe(spark):
    via_values = local_relation(spark, ROWS, DDL)
    via_create = spark.createDataFrame(
        ROWS, T.StructType.fromDDL(DDL)
    )
    assert via_values.schema == via_create.schema or [
        (f.name, f.dataType) for f in via_values.schema.fields
    ] == [(f.name, f.dataType) for f in via_create.schema.fields]
    a = sorted(map(tuple, via_values.collect()), key=str)
    b = sorted(map(tuple, via_create.collect()), key=str)
    assert a == b


def test_doubles_roundtrip_bit_exact(spark):
    vals = [0.1, 1 / 3, 2.0**-1074, 1.7976931348623157e308, -0.0, 123456.789]
    df = local_relation(spark, [(v,) for v in vals], "d double")
    got = sorted(r.d for r in df.collect())
    assert got == sorted(vals)
    # bit-exactness, not just equality under ==
    import struct

    assert {struct.pack("d", g) for g in got} == {struct.pack("d", v) for v in vals}


def test_plans_as_local_relation(spark):
    df = local_relation(spark, [(1, "a")], "k bigint, v string")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in plan
    assert "ExistingRDD" not in plan


def test_row_gate_falls_back(spark):
    rows = [(i,) for i in range(50)]
    df = local_relation(spark, rows, "k bigint", max_rows=10)
    assert sorted(r.k for r in df.collect()) == list(range(50))


def test_empty_and_scalar_rows(spark):
    assert local_relation(spark, [], "k bigint").count() == 0
    df = local_relation(spark, [7, 8], "k bigint")
    assert sorted(r.k for r in df.collect()) == [7, 8]


def test_unsupported_type_falls_back(spark):
    rows = [({"a": 1},)]
    df = local_relation(spark, rows, "m map<string,int>")
    assert df.collect()[0].m == {"a": 1}


@pytest.mark.parametrize("bad", ["0.30000000000000004", "1e-300"])
def test_double_text_renders_exact(spark, bad):
    v = float(bad)
    df = local_relation(spark, [(v,)], "d double")
    assert df.collect()[0].d == v
