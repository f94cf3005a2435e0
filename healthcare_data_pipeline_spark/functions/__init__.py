"""Scalar/aggregate expression helpers shared across operators.

Design note — oracle-exact float aggregation
--------------------------------------------
Double sums are order-dependent, so a Spark sum and a DuckDB sum of the same
parquet column can differ in the last bits and break value-hash comparison.
The engine's convention for money-like measures (2-decimal inputs):

1. do any per-row arithmetic in DOUBLE (IEEE ops are bit-identical across
   engines when written identically, e.g. ``l_extendedprice * (1 - l_discount)``),
2. cast the per-row double to ``DECIMAL(25, 8)`` (deterministic round; scale 8 exceeds the 6-decimal
   exact precision of 2-decimal-input products, so no rounding boundary exists),
3. SUM in decimal (exact, order-independent),
4. cast the final aggregate back to DOUBLE (deterministic).

This gives bit-identical results on any engine with the same parquet input,
at any parallelism — which is exactly what a 1000-executor run needs for
reproducibility, too.  ``xsum``/``xavg`` implement the Spark side;
``sql_xsum``/``sql_xavg`` emit the matching ANSI-SQL fragment.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

MONEY = T.DecimalType(25, 8)


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def xsum(c: Column | str, alias: str) -> Column:
    """Order-independent exact sum of a double column, returned as double."""
    return F.sum(_col(c).cast(MONEY)).cast("double").alias(alias)


def sql_xsum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(25,8))) AS DOUBLE) AS {alias}"


def xavg(c: Column | str, alias: str) -> Column:
    """Exact-sum-based average: decimal sum cast to double, over count."""
    col = _col(c)
    return (
        F.sum(col.cast(MONEY)).cast("double") / F.count(col).cast("double")
    ).alias(alias)


def sql_xavg(expr: str, alias: str) -> str:
    return (
        f"CAST(SUM(CAST(({expr}) AS DECIMAL(25,8))) AS DOUBLE)"
        f" / CAST(COUNT(({expr})) AS DOUBLE) AS {alias}"
    )


def null_count(c: str) -> Column:
    """Single-pass per-column null counter (survey A7: the reference runs one
    ``filter(isNull).count()`` job per column, ``runnerfile.py:130,160`` — the
    engine folds all columns into one aggregation job)."""
    return F.sum(_col(c).isNull().cast("long")).alias(f"{c}_nulls")


# ---------------------------------------------------------------------------
# Vector math over ArrayType(FloatType) embedding columns ([EXT] similarity).
# Built-in higher-order functions keep this JVM-side / codegen-able — no UDF.
# ---------------------------------------------------------------------------


def vec_dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array<float|double> columns, accumulated in double
    in element order (matches a sequential SQL fold)."""
    return F.aggregate(
        F.zip_with(_col(a), _col(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def vec_norm(a: Column | str) -> Column:
    """L2 norm of an array column (double)."""
    return F.sqrt(
        F.aggregate(
            _col(a),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    return vec_dot(a, b) / (vec_norm(a) * vec_norm(b))


def dot_unrolled(a: Column | str, b: Column | str, dim_hint: int) -> Column:
    """Dot product of two array<double> columns, BIT-IDENTICAL to the
    sequential fold ``aggregate(zip_with(a, b, (x, y) -> x * y), 0.0,
    (acc, x) -> acc + x)`` but ~2x cheaper per pair on the fast path.

    Spark does not codegen higher-order functions: every fold evaluation
    interprets the lambda AND allocates the zip_with product array — ~8 us
    per dim-64 pair, which dominates pair-heavy plans (dd03's n^2 baseline
    spent 27 s in it at sf0.1).  When both arrays have exactly ``dim_hint``
    elements, this takes an UNROLLED left-associative sum instead —
    ``0.0 + a[1]*b[1] + ... + a[d]*b[d]`` — a flat codegen-able expression
    tree with the same grouping and the same per-term IEEE products, so the
    result is bit-identical (property-tested in tests/test_functions.py);
    any other length falls back to the fold, also bit-identical by
    definition.  Keep ``dim_hint`` at the PRODUCER's fixed dimension; the
    guard makes a wrong hint a missed optimization, never a wrong value.
    """
    av, bv = _col(a), _col(b)
    acc: Column = F.lit(0.0)
    # cast("double") on each factor: a no-op the optimizer removes for the
    # array<double> call sites (bit-identical, zero cost), and on
    # array<float> inputs it matches vec_dot's promote-then-multiply
    # semantics instead of multiplying in float precision (r15 advice).
    for i in range(1, dim_hint + 1):
        acc = acc + F.element_at(av, i).cast("double") * F.element_at(bv, i).cast(
            "double"
        )
    fold = F.aggregate(
        F.zip_with(av, bv, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc2, x: acc2 + x,
    )
    return F.when((F.size(av) == dim_hint) & (F.size(bv) == dim_hint), acc).otherwise(fold)
