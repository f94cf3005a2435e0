"""Query catalog: every operator from SURVEY.md §2 as a named, oracle-checked query.

Each entry pairs a PySpark implementation ``fn(spark, sf_dir) -> DataFrame``
with the equivalent ANSI SQL (run by DuckDB over the same parquet tables) for
the driver's t2 correctness gate.  Queries whose semantics are not
SQL-expressible (custom stateful streaming, LSH banding with engine-specific
hashes) register ``oracle=None`` and get a weaker rows-only check.

Conventions (required for hash parity):
- every computed column is aliased identically in Spark and SQL;
- float aggregates use the decimal-exact ``xsum``/``sql_xsum`` pattern
  (see ``healthcare_data_pipeline_spark.functions``);
- any LIMIT/top-k is preceded by a total ordering (unique tie-break keys).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


CATALOG: dict[str, Query] = {}


def query(name: str, oracle: str | None, tags: tuple[str, ...] = (), doc: str = ""):
    """Decorator registering a query implementation with its oracle SQL."""

    def wrap(fn: QueryFn) -> QueryFn:
        if name in CATALOG:
            raise ValueError(f"duplicate query name: {name}")
        CATALOG[name] = Query(name=name, fn=fn, oracle=oracle, tags=tags, doc=doc or (fn.__doc__ or ""))
        return fn

    return wrap


def _load_all() -> None:
    # Import side-effect: module import populates CATALOG.  Idempotent — a
    # partially-populated CATALOG (someone imported one query module directly)
    # must not suppress loading the rest, so this always imports every module.
    from healthcare_data_pipeline_spark.queries import core  # noqa: F401
    from healthcare_data_pipeline_spark.queries import domain  # noqa: F401
    from healthcare_data_pipeline_spark.queries import text  # noqa: F401
    from healthcare_data_pipeline_spark.queries import similarity  # noqa: F401
    from healthcare_data_pipeline_spark.queries import dedup  # noqa: F401
    from healthcare_data_pipeline_spark.queries import multimodal  # noqa: F401
    from healthcare_data_pipeline_spark.queries import web  # noqa: F401


def catalog() -> dict[str, Query]:
    _load_all()
    return CATALOG
