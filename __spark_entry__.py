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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in sorted(catalog().items())}


def oracle_sql() -> dict[str, str]:
    """Equivalent DuckDB SQL per query; queries without an oracle (engine-hash
    based ops) are omitted and get the driver's rows-only check."""
    return {name: q.oracle for name, q in sorted(catalog().items()) if q.oracle is not None}
