"""Data-layout operators: schema evolution and sort-for-data-skipping.

Two storage-side levers that matter enormously at 100 TB and cost nothing at
write time:

* **Schema evolution** — years of accumulated parquet have columns appearing
  over time; ``read_merged`` unions them (mergeSchema), nulling the column
  where absent, so old data stays queryable after every schema change.
* **Sort-for-skipping** — parquet row-group min/max statistics only prune
  when values are clustered.  ``write_sorted`` range-partitions + sorts by
  the hot filter column so each row group covers a narrow value band; a
  predicate then skips whole row groups (and with one file per range, whole
  files).  This is the poor-man's Z-order, and for a single dominant filter
  column it is strictly better.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_merged(spark: SparkSession, path: str) -> DataFrame:
    """Read a parquet directory whose files have EVOLVED schemas — the union
    of all columns, nulls where a file predates a column."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def compact(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_bytes: int = 128 << 20,
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ceil(total_bytes / target) files (~128 MiB default — the partition sizing
    guidance the reference documents, README.md:392-394).

    Streaming sinks and incremental ingests accumulate thousands of KB-scale
    files; at 100 TB the resulting driver-side listing and per-file open costs
    dominate scan time, so periodic compaction is an operational necessity.
    Returns the output file count.  Writes to a NEW directory — swap
    atomically (rename) rather than overwriting the live path in place.
    """
    import glob
    import math
    import os

    total = sum(
        os.path.getsize(f)
        for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    )
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.option("recursiveFileLookup", "true").parquet(path)
    df.coalesce(n_files).write.mode("overwrite").parquet(out_path)
    return n_files


def write_sorted(
    df: DataFrame, path: str, sort_cols: list[str], n_files: int = 8, mode: str = "overwrite"
) -> None:
    """Cluster data by ``sort_cols`` for statistics-based skipping:
    range-partition so each output file owns a disjoint value band, then sort
    within files so every row group's min/max is tight."""
    (
        df.repartitionByRange(n_files, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .write.mode(mode)
        .parquet(path)
    )


def zorder_key(df: DataFrame, cols: list[str], bits: int = 16, bounds: dict | None = None):
    """Z-order (Morton) key over numeric columns: each column is linearly
    quantized to ``bits`` bits against its observed min/max, then the bits
    are interleaved — points close on the space-filling curve are close in
    EVERY dimension, which is what makes multi-column min/max skipping work.

    One bounded driver action (a 2x len(cols) scalar agg for the quantizer
    bounds — skipped when ``bounds`` is supplied); the key itself is pure
    JVM arithmetic inside whole-stage codegen — no UDF, no shuffle.  Returns
    (key_column, bounds) so callers can persist the bounds alongside the
    data and build the SAME key for later incremental appends (out-of-range
    values clamp to the edge cells).
    """
    from pyspark.sql import functions as F

    if not cols:
        raise ValueError("zorder_key needs at least one column")
    if len(cols) * bits > 63:
        raise ValueError(f"{len(cols)} cols x {bits} bits exceeds a signed 64-bit key")
    if bounds is None:
        row = df.agg(
            *[F.min(c).cast("double").alias(f"mn_{c}") for c in cols],
            *[F.max(c).cast("double").alias(f"mx_{c}") for c in cols],
        ).collect()[0]
        bounds = {c: (row[f"mn_{c}"], row[f"mx_{c}"]) for c in cols}
    top = (1 << bits) - 1
    key = F.lit(0).cast("long")
    for ci, c in enumerate(cols):
        mn, mx = bounds[c]
        span = (mx - mn) or 1.0
        q = F.least(
            F.lit(top).cast("long"),
            F.greatest(
                F.lit(0).cast("long"),
                ((F.col(c).cast("double") - F.lit(mn)) / F.lit(span) * top).cast("long"),
            ),
        )
        for b in range(bits):
            key = key + F.shiftleft(
                F.shiftrightunsigned(q, b).bitwiseAND(F.lit(1).cast("long")),
                b * len(cols) + ci,
            )
    return key, bounds


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 8,
    bits: int = 16,
    mode: str = "overwrite",
) -> dict:
    """Multi-column clustering for data skipping: range-partition + sort by
    the Z-order key so every file (and row group) covers a narrow band in
    ALL of ``cols`` simultaneously.

    ``write_sorted`` is strictly better for ONE dominant filter column (its
    per-file range for that column is ~1/n_files of the domain but the other
    columns stay unclustered); Z-order trades a sqrt-ish widening per
    dimension for skipping on EVERY dimension — at 100 TB this is the
    difference between pruning on (ship_date) only and pruning on
    (ship_date, customer_region, price_band) with one layout.  The key is
    computed once at write; readers need nothing special — parquet min/max
    statistics do the pruning.  Returns the quantizer bounds (persist them
    to key later appends identically).
    """
    key, bounds = zorder_key(df, cols, bits=bits)
    (
        df.withColumn("__zkey", key)
        .repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode(mode)
        .parquet(path)
    )
    _write_zorder_meta(df.sparkSession, path, cols, bits, bounds)
    return bounds


def _zorder_meta_path(path: str) -> str:
    return path.rstrip("/") + "/_zorder.json"


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for ``path`` via Spark's Hadoop FS layer — the same
    resolver the parquet writer uses, so the sidecar lands wherever the data
    does (local FS, HDFS, s3a/gs/abfs object stores), not on the driver's
    local disk."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def _write_zorder_meta(
    spark: SparkSession, path: str, cols: list[str], bits: int, bounds: dict
) -> None:
    """Persist the quantizer next to the data (same contract as the ANN
    index's frozen centroid table: layout key and data must never drift
    apart).  Underscore-prefixed, so parquet readers ignore it.  Written
    through the Hadoop FileSystem API — the parquet data goes through that
    layer, and a plain local ``open()`` would succeed for the data but strand
    the sidecar on the driver's local disk when ``path`` is an object-store
    or HDFS URI, silently breaking ``append_zordered``'s contract."""
    import json

    payload = json.dumps({"cols": cols, "bits": bits, "bounds": bounds})
    # Committer-style write: stage to a .tmp sibling, then rename over the
    # target (rename is atomic on HDFS/local FS) — a crashed or concurrent
    # writer can never leave a half-written sidecar that _read_zorder_meta
    # would fail to parse.  Hadoop rename refuses an existing destination on
    # some filesystems, so the old sidecar is deleted first; the window is
    # "no sidecar" (append fails loudly), never "corrupt sidecar".
    fs, jpath = _hadoop_fs(spark, _zorder_meta_path(path))
    jtmp = _hadoop_fs(spark, _zorder_meta_path(path) + ".tmp")[1]
    out = fs.create(jtmp, True)
    try:
        out.write(bytearray(payload.encode("utf-8")))
    finally:
        out.close()
    if fs.exists(jpath):
        fs.delete(jpath, False)
    if not fs.rename(jtmp, jpath):
        raise IOError(f"rename {jtmp} -> {jpath} failed")


def _read_zorder_meta(spark: SparkSession, path: str) -> dict:
    import json
    import time

    fs, jpath = _hadoop_fs(spark, _zorder_meta_path(path))
    # A concurrent rewrite commits via delete-then-rename (Hadoop rename
    # refuses an existing destination on some filesystems), so a reader can
    # race into the "no sidecar yet" window.  If the sidecar is absent but
    # its .tmp sibling exists, the writer is mid-commit: wait a beat and
    # re-check once before failing, so the race surfaces as a transient
    # retry instead of a spurious FileNotFound.
    if not fs.exists(jpath):
        jtmp = _hadoop_fs(spark, _zorder_meta_path(path) + ".tmp")[1]
        if fs.exists(jtmp):
            time.sleep(0.2)
    jvm = spark._jvm
    # Line-wise read through a JVM reader: py4j copies byte[] arguments by
    # value, so a readFully-into-bytearray would never see the data — strings
    # returned per line cross the bridge correctly.
    reader = jvm.java.io.BufferedReader(jvm.java.io.InputStreamReader(fs.open(jpath), "UTF-8"))
    lines = []
    try:
        while True:
            line = reader.readLine()
            if line is None:
                break
            lines.append(line)
    finally:
        reader.close()
    return json.loads("\n".join(lines))


def append_zordered(df: DataFrame, path: str, n_files: int = 1) -> None:
    """Append a batch to a Z-ordered dataset WITHOUT rewriting it.

    The batch is keyed against the dataset's FROZEN quantizer bounds
    (``_zorder.json`` — same immutable-quantizer contract as
    ``ann_index_append``; out-of-range values clamp to edge cells) and
    written as new internally-Z-sorted files.  Per-file min/max statistics
    stay tight, so pruning keeps working as the dataset grows; the
    cross-file interleave degrades gradually — re-cluster with
    ``write_zordered`` when the batch volume or a drifted value range
    warrants it (the ``compact`` tradeoff, not a correctness issue).
    O(batch) per append, existing files never touched.
    """
    meta = _read_zorder_meta(df.sparkSession, path)
    bounds = {c: tuple(v) for c, v in meta["bounds"].items()}
    key, _ = zorder_key(df, meta["cols"], bits=meta["bits"], bounds=bounds)
    (
        df.withColumn("__zkey", key)
        .repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("append")
        .parquet(path)
    )
