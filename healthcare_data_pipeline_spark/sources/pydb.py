"""Python-DBAPI database source/sink — the jar-less fallback for S1/S2.

The JDBC layer (``sources.jdbc``) is the production path, but this image
ships no JDBC driver jars, so on its own it can only be options-tested.
Dimension-table traffic (the reference's actual database use: read a few
dim tables, write reports back — ``src/common/database.py:85-110``) is
driver-sized by definition, which makes a DBAPI bridge legitimate Spark
architecture: fetch on the driver, hand Spark an Arrow-backed DataFrame,
broadcast from there.  NOT for fact tables — there is no partitioned
parallel read on this path (use JDBC with a jar for that).

Supported URLs: ``sqlite:///path/to.db`` (stdlib) and ``duckdb:///path/to.db``
(bundled).  ``read_table_auto`` prefers JDBC when a driver jar is on the
classpath and falls back here for supported schemes.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

_URL = re.compile(r"^(sqlite|duckdb)://(.*)$")

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _connect(url: str):
    m = _URL.match(url)
    if not m:
        raise ValueError(
            f"unsupported DBAPI url {url!r}: expected sqlite:///path or duckdb:///path"
        )
    scheme, rest = m.groups()
    # SQLAlchemy convention: scheme:///rel.db is relative, scheme:////abs.db
    # absolute — i.e. one authority slash, the remainder is the path.
    path = rest[1:] if rest.startswith("/") else rest
    if scheme == "sqlite":
        import sqlite3

        return sqlite3.connect(path)
    import duckdb

    return duckdb.connect(path)


def _check_ident(name: str) -> str:
    if not _IDENT.match(name):
        raise ValueError(f"invalid SQL identifier: {name!r}")
    return name


def read_dbapi_table(
    spark: SparkSession, url: str, table: str, predicate: str | None = None
) -> DataFrame:
    """S1 fallback: driver-side fetch of a (dim-sized) table into a Spark
    DataFrame.  ``predicate`` appends a WHERE clause — the same incremental
    watermark pushdown shape as the JDBC path."""
    import pandas as pd

    sql = f"SELECT * FROM {_check_ident(table)}"
    if predicate:
        sql += f" WHERE {predicate}"
    con = _connect(url)
    try:
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        pdf = pd.DataFrame(cur.fetchall(), columns=cols)
    finally:
        con.close()
    return spark.createDataFrame(pdf) if len(pdf) else spark.createDataFrame([], schema=", ".join(f"`{c}` string" for c in cols))


def write_dbapi_table(
    df: DataFrame, url: str, table: str, mode: str = "overwrite", limit: int = 1_000_000
) -> int:
    """S2 fallback: bounded driver-side write (reports / dim refreshes).
    ``limit`` guards against accidentally routing a fact table through the
    driver; raise it only deliberately.  Returns rows written."""
    table = _check_ident(table)
    pdf = df.limit(limit + 1).toPandas()
    if len(pdf) > limit:
        raise ValueError(
            f"write_dbapi_table is for dim-sized data: {len(pdf) - 1}+ rows exceeds "
            f"limit={limit}; use the JDBC sink (driver jar) for fact tables"
        )
    con = _connect(url)
    try:
        cur = con.cursor() if hasattr(con, "cursor") else con
        if mode == "overwrite":
            cur.execute(f"DROP TABLE IF EXISTS {table}")
        elif mode != "append":
            raise ValueError(f"unsupported mode {mode!r}: overwrite or append")
        def sql_type(dtype) -> str:
            k = str(dtype)
            if "int" in k:
                return "BIGINT"
            if "float" in k:
                return "DOUBLE"
            if "bool" in k:
                return "BOOLEAN"
            if "datetime" in k:
                return "TIMESTAMP"
            return "VARCHAR"

        cols = ", ".join(f'"{c}"' for c in pdf.columns)
        placeholders = ", ".join("?" for _ in pdf.columns)
        col_defs = ", ".join(f'"{c}" {sql_type(t)}' for c, t in pdf.dtypes.items())
        cur.execute(f"CREATE TABLE IF NOT EXISTS {table} ({col_defs})")
        cur.executemany(
            f"INSERT INTO {table} ({cols}) VALUES ({placeholders})",
            [tuple(r) for r in pdf.itertuples(index=False, name=None)],
        )
        con.commit()
    finally:
        con.close()
    return len(pdf)


def read_table_auto(
    spark: SparkSession, url: str, table: str, jdbc_cfg=None, **jdbc_kw
) -> DataFrame:
    """Prefer the parallel JDBC path when a config (and therefore a driver
    jar) is provided; fall back to the DBAPI bridge for supported schemes."""
    if jdbc_cfg is not None:
        from healthcare_data_pipeline_spark.sources.jdbc import read_table

        return read_table(spark, jdbc_cfg, table, **jdbc_kw)
    return read_dbapi_table(spark, url, table)
