"""JDBC source/sink (S1/S2; reference ``src/common/database.py:43-110``,
``src/helpers/ingest_data.py``).

Reference parity plus the scale features the reference lacks (SURVEY.md §4
anti-patterns): the reference reads every JDBC table through a single
partition (no partitionColumn, database.py:91-100) — here parallel reads via
``partition_column/num_partitions`` are first-class, and the incremental
watermark probe (ingest_data.py:56-77) is an engine feature.

End-to-end coverage in ANY image: PySpark bundles the Apache Derby embedded
database (``pyspark/jars/derby-*.jar``, already on the session classpath), so
``tests/test_jdbc_e2e.py`` always runs the real write -> partitioned
PARALLEL read -> watermark round-trip through these functions against an
embedded Derby database — no external server or extra jar required.  When
the environment additionally provides a server-grade jar + database
(``SPARK_GRAFT_JDBC_JAR``/``SPARK_GRAFT_JDBC_URL``), the same contract also
runs against that engine.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class JdbcConfig:
    url: str  # e.g. jdbc:postgresql://host:5432/db
    user: str
    password: str
    driver: str = "org.postgresql.Driver"


def read_options(
    cfg: JdbcConfig,
    table: str,
    predicate: str | None = None,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
) -> dict[str, str]:
    """Build the option dict for a JDBC scan; a predicate wraps the table in a
    pushdown subquery exactly like the reference's incremental path
    (ingest_data.py:77: ``(SELECT * FROM t WHERE id > max) tmp``)."""
    dbtable = f"(SELECT * FROM {table} WHERE {predicate}) tmp" if predicate else table
    opts = {
        "url": cfg.url,
        "dbtable": dbtable,
        "user": cfg.user,
        "password": cfg.password,
        "driver": cfg.driver,
    }
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC read needs lower_bound/upper_bound")
        opts.update(
            {
                "partitionColumn": partition_column,
                "numPartitions": str(num_partitions),
                "lowerBound": str(lower_bound),
                "upperBound": str(upper_bound),
            }
        )
    return opts


def read_table(spark: SparkSession, cfg: JdbcConfig, table: str, **kw) -> DataFrame:
    """S1: JDBC table scan."""
    return spark.read.format("jdbc").options(**read_options(cfg, table, **kw)).load()


def write_table(
    df: DataFrame,
    cfg: JdbcConfig,
    table: str,
    mode: str = "overwrite",
    repartition: int | None = None,
) -> None:
    """S2: JDBC sink with optional write fan-in control (database.py:43-83)."""
    if repartition is not None:
        df = df.coalesce(repartition) if repartition < df.rdd.getNumPartitions() else df.repartition(repartition)
    (
        df.write.format("jdbc")
        .mode(mode)
        .options(url=cfg.url, dbtable=table, user=cfg.user, password=cfg.password, driver=cfg.driver)
        .save()
    )


def incremental_predicate(
    existing: DataFrame | None,
    id_column_candidates: tuple[str, ...] = ("id",),
    quote: str | None = None,
) -> str | None:
    """Watermark probe (P7/A5; ingest_data.py:56-77): find the id column among
    candidates in the already-ingested data, take max, and return the
    pushdown predicate — or None for a full load.

    ``quote`` wraps the column identifier for case-folding databases: Spark's
    JDBC writer creates identifier-quoted (case-exact) columns, so an
    UNQUOTED column in the pushdown predicate resolves against the engine's
    folded form instead (uppercase on Derby/Oracle/DB2) and misses.  Pass
    ``quote='"'`` (ANSI) for those engines; Postgres folds unquoted
    identifiers to lowercase, which happens to match, so the bare default
    keeps the reference's exact predicate shape there.
    """
    if existing is None:
        return None
    id_col = next((c for c in existing.columns if c.lower() in id_column_candidates), None)
    if id_col is None:
        return None
    max_val = existing.agg(F.max(id_col).alias("m")).collect()[0].m
    if max_val is None:
        return None
    ident = f"{quote}{id_col}{quote}" if quote else id_col
    return f"{ident} > {max_val}"
