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


def _check_predicate(predicate: str) -> str:
    """``predicate`` must be TRUSTED SQL (the same contract as the JDBC
    pushdown options it mirrors — it is interpolated into the query).  This
    is a tripwire against accidents, not an injection sanitizer: statement
    separators and comment openers have no place in a WHERE clause."""
    if ";" in predicate or "--" in predicate or "/*" in predicate:
        raise ValueError(
            f"predicate must be a bare WHERE expression (no ';', '--', '/*'): "
            f"{predicate!r}"
        )
    return predicate


def _spark_schema_from_pandas(pdf):
    """Typed Spark schema from pandas dtypes — the empty-result path must
    return the SAME schema a non-empty read would (an all-string fallback
    silently drifts downstream schemas whenever a watermark matches 0 rows)."""
    from pyspark.sql import types as T

    kind_map = {"i": T.LongType(), "u": T.LongType(), "f": T.DoubleType(),
                "b": T.BooleanType(), "M": T.TimestampType()}
    return T.StructType(
        [
            T.StructField(str(c), kind_map.get(dt.kind, T.StringType()))
            for c, dt in pdf.dtypes.items()
        ]
    )


# SQLite column AFFINITY rules (sqlite.org/datatype3.html §3.1) -> Spark DDL
def _sqlite_decl_to_spark(decl: str) -> str:
    d = (decl or "").upper()
    if "INT" in d:
        return "long"
    if "CHAR" in d or "CLOB" in d or "TEXT" in d:
        return "string"
    if not d or "BLOB" in d:
        return "binary"
    if "REAL" in d or "FLOA" in d or "DOUB" in d:
        return "double"
    return "double"  # NUMERIC affinity; matches pandas' float inference


def read_dbapi_table(
    spark: SparkSession, url: str, table: str, predicate: str | None = None
) -> DataFrame:
    """S1 fallback: driver-side fetch of a (dim-sized) table into a Spark
    DataFrame.  ``predicate`` appends a WHERE clause — the same incremental
    watermark pushdown shape as the JDBC path, and the same trust contract:
    it is interpolated into the SQL, so it must come from the pipeline
    author, never from untrusted input (``_check_predicate`` tripwires the
    obvious accidents).

    Empty results keep their real column types: duckdb reports them via a
    typed empty frame, sqlite via declared-type affinities — so a watermark
    read that matches nothing has the same schema as one that matches rows.
    """
    import pandas as pd

    sql = f"SELECT * FROM {_check_ident(table)}"
    if predicate:
        sql += f" WHERE {_check_predicate(predicate)}"
    con = _connect(url)
    try:
        if type(con).__module__.startswith("duckdb"):
            pdf = con.execute(sql).fetch_df()
            if len(pdf):
                return spark.createDataFrame(pdf)
            return spark.createDataFrame([], schema=_spark_schema_from_pandas(pdf))
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        rows = cur.fetchall()
        if rows:
            return spark.createDataFrame(pd.DataFrame(rows, columns=cols))
        decls = {
            r[1]: r[2]
            for r in con.execute(f"PRAGMA table_info({_check_ident(table)})")
        }
        ddl = ", ".join(f"`{c}` {_sqlite_decl_to_spark(decls.get(c))}" for c in cols)
        return spark.createDataFrame([], schema=ddl)
    finally:
        con.close()


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
