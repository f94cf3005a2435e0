"""Driver-local relations that plan as ``LocalTableScan`` (r15 optimization).

``spark.createDataFrame(rows, ...)`` in classic PySpark always routes through
``applySchemaToPythonRDD``: the relation plans as ``Scan ExistingRDD`` over a
parallelized Python RDD, so every downstream materialization — including each
BroadcastExchange build — launches ``defaultParallelism`` tasks that each pay
a Python-worker round trip just to deserialize a handful of rows.  Measured
on the r15 bench box: a 40-row model table consumed via one broadcast join
costs 1.11s through ``createDataFrame(list)`` vs 0.27s as a SQL ``VALUES``
LocalRelation (t29's merges table alone contributed a 32-task stage with
10.6s of aggregate task runtime and 0.4s of CPU — pure worker startup).

``local_relation`` renders bounded model-sized rows (BPE merges, PSL
suffixes, blocklists, union-find labels, value-band tables, PQ codebooks) as
a typed ``VALUES`` statement instead.  Exactness contract:

* strings are escaped (backslash + quote) for the default Spark SQL parser;
* doubles render via ``repr`` (shortest round-trip decimal) wrapped in
  ``CAST(... AS DOUBLE)`` — string→double parse is correctly rounded, so the
  stored IEEE value is bit-identical to the Python float;
* integers/booleans/NULLs are cast to the declared type, so the schema is
  exactly the DDL one (never the parser's DECIMAL guess for bare literals);
* arrays render element-wise with the same rules.

Rows past ``max_rows`` (default 10k — VALUES parse time grows with text
size) fall back to ``createDataFrame`` unchanged: the helper is a fast path
for bounded relations, not a new size contract.  Result VALUES are
row-for-row identical either way (property-tested in
tests/test_localrel.py), so swapping construction never changes what a
query computes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_MAX_ROWS_DEFAULT = 10_000


def arrow_ddl(schema) -> str | None:
    """Spark DDL for a (simple) pyarrow schema — ints, doubles, strings,
    booleans and lists thereof; None for anything else (decimals, dates,
    timestamps, structs) so callers fall back to a Spark read."""
    import pyarrow as pa

    def one(t) -> str | None:
        if pa.types.is_int64(t):
            return "bigint"
        if pa.types.is_int32(t):
            return "int"
        if pa.types.is_float64(t):
            return "double"
        if pa.types.is_boolean(t):
            return "boolean"
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            return "string"
        if pa.types.is_list(t) or pa.types.is_large_list(t):
            inner = one(t.value_type)
            return f"array<{inner}>" if inner else None
        return None

    cols = []
    for f in schema:
        t = one(f.type)
        if t is None:
            return None
        cols.append(f"`{f.name}` {t}")
    return ", ".join(cols)


def _esc(s: str) -> str:
    return s.replace("\\", "\\\\").replace("'", "\\'")


#: smallest BIGINT: ``-9223372036854775808L`` cannot be rendered with the
#: literal suffix (the parser folds the sign AFTER reading the magnitude,
#: which overflows), so that one value keeps the CAST form.
_LONG_MIN = -(2**63)


def _render(v, dt: T.DataType) -> str:
    if v is None:
        return f"CAST(NULL AS {dt.simpleString()})"
    if isinstance(dt, T.StringType):
        return f"'{_esc(v)}'"
    if isinstance(dt, T.DoubleType):
        # Typed literal suffix, not CAST('…' AS DOUBLE): ~3x less SQL text
        # (VALUES parse time scales with text size — the r15 ANN-probe
        # regression's fixed cost), and bit-identical — the parser's
        # DOUBLE_LITERAL path is the same correctly-rounded
        # string->double parse as the CAST, fed the same shortest
        # round-trip repr.  Non-finite values have no literal form.
        if v == v and v not in (float("inf"), float("-inf")):
            return f"{v!r}D"
        nf = "NaN" if v != v else ("Infinity" if v > 0 else "-Infinity")
        return f"CAST('{nf}' AS DOUBLE)"
    if isinstance(dt, T.FloatType):
        return f"CAST('{v!r}' AS FLOAT)"
    if isinstance(dt, T.LongType):
        # BIGINT literal suffix (same text-size argument as doubles); the
        # parser folds a leading '-' after reading the magnitude, so
        # LONG_MIN alone must keep the CAST form.
        return f"{int(v)}L" if int(v) != _LONG_MIN else f"CAST({int(v)} AS BIGINT)"
    if isinstance(dt, (T.IntegerType, T.ShortType, T.ByteType)):
        return f"CAST({int(v)} AS {dt.simpleString()})"
    if isinstance(dt, T.BooleanType):
        return f"CAST({'true' if v else 'false'} AS BOOLEAN)"
    if isinstance(dt, T.ArrayType):
        elems = list(v)
        if not elems:
            # bare ARRAY() types as array<void>; the cast pins the DDL type
            return f"CAST(ARRAY() AS {dt.simpleString()})"
        inner = ",".join(_render(x, dt.elementType) for x in elems)
        return f"ARRAY({inner})"
    if isinstance(dt, T.StructType):
        vals = v if isinstance(v, (tuple, list)) else tuple(v)
        inner = ",".join(
            f"'{_esc(f.name)}',{_render(x, f.dataType)}"
            for x, f in zip(vals, dt.fields)
        )
        return f"NAMED_STRUCT({inner})"
    raise TypeError(f"local_relation: unsupported type {dt.simpleString()}")


def local_relation(
    spark: SparkSession,
    rows,
    ddl: str,
    max_rows: int = _MAX_ROWS_DEFAULT,
) -> DataFrame:
    """Bounded rows -> a DataFrame backed by a LocalRelation (VALUES).

    ``rows``: iterable of tuples/lists (or scalars for a 1-column schema);
    ``ddl``: the schema as DDL, e.g. ``"rank bigint, left string"``.
    Falls back to ``spark.createDataFrame`` above ``max_rows`` or for types
    the renderer does not cover — same values either way.
    """
    schema = T.StructType.fromDDL(ddl)
    mat = [r if isinstance(r, (tuple, list)) else (r,) for r in rows]
    if len(mat) > max_rows:
        return spark.createDataFrame(mat, schema)
    if not mat:
        return spark.createDataFrame([], schema)
    try:
        body = ",".join(
            "(" + ",".join(_render(v, f.dataType) for v, f in zip(row, schema.fields)) + ")"
            for row in mat
        )
    except TypeError:
        return spark.createDataFrame(mat, schema)
    if len(body) > 1_000_000:
        # row gate can't see array widths; keep VALUES parse time bounded
        return spark.createDataFrame(mat, schema)
    cols = ",".join(f"`{f.name}`" for f in schema.fields)
    return spark.sql(f"SELECT * FROM VALUES {body} AS __lr({cols})")
