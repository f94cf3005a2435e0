"""JDBC source/sink (S1/S2; reference ``src/common/database.py:43-110``,
``src/helpers/ingest_data.py``).

Reference parity plus the scale features the reference lacks (SURVEY.md §4
anti-patterns): the reference reads every JDBC table through a single
partition (no partitionColumn, database.py:91-100) — here parallel reads via
``partition_column/num_partitions`` are first-class, and the incremental
watermark probe (ingest_data.py:56-77) is an engine feature.

No JDBC driver jars ship in this image, so by default everything here is
exercised by unit tests up to the options dict.  When the environment
provides a jar + database (``SPARK_GRAFT_JDBC_JAR``/``SPARK_GRAFT_JDBC_URL``),
``tests/test_jdbc_e2e.py`` runs the real write -> partitioned-read ->
watermark round-trip through these functions end-to-end.
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
    existing: DataFrame | None, id_column_candidates: tuple[str, ...] = ("id",)
) -> str | None:
    """Watermark probe (P7/A5; ingest_data.py:56-77): find the id column among
    candidates in the already-ingested data, take max, and return the
    pushdown predicate — or None for a full load."""
    if existing is None:
        return None
    id_col = next((c for c in existing.columns if c.lower() in id_column_candidates), None)
    if id_col is None:
        return None
    max_val = existing.agg(F.max(id_col).alias("m")).collect()[0].m
    if max_val is None:
        return None
    return f"{id_col} > {max_val}"
