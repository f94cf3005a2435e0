"""SparkSession factory with scale-aware defaults.

Reference parity: ``src/common/create_spark_object.py:8-25`` builds a session
with JDBC jars, log4j config and a pinned timezone; ``src/runnerfile.py:92-97``
builds a ``local[*]`` session with a local scratch dir.  This engine keeps the
same two entry points (cluster-oriented vs local) but bakes in the configs a
100 TB deployment needs from day one: AQE (runtime coalescing + skew-join
handling), Arrow-backed pandas exchange, UTC session timezone (so results are
oracle-comparable), and shuffle partitions sized to the actual parallelism
instead of the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def _cpus() -> int:
    try:
        return int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    except ValueError:
        return os.cpu_count() or 4


def get_spark(
    app_name: str = "healthcare_data_pipeline_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    On a real cluster, ``master`` comes from the environment (YARN/K8s) and
    ``shuffle_partitions`` should be ~2-3x total executor cores; locally we
    default to ``local[$SPARK_GRAFT_CPUS]``.
    """
    cpus = _cpus()
    master = master or f"local[{cpus}]"
    shuffle = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(DEFAULT_SHUFFLE_PARTITIONS))
    )
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # INT64 micros, not the legacy INT96 default: INT96 timestamp columns
        # carry NO parquet min/max statistics, so every sorted/partitioned
        # layout loses row-group skipping on time predicates — the main reason
        # to sort by time at 100 TB. (TIMESTAMP_NTZ always wrote INT64; this
        # makes LTZ columns match.)
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        # Reliable checkpoints (components.py's lineage truncation) are
        # write-only by default: a long-lived session running many
        # connected-components jobs grows the checkpoint dir without bound.
        # With this on, the ContextCleaner deletes a checkpoint's files once
        # its RDD is garbage-collected (each iteration drops the previous
        # labels DataFrame, so intermediates reclaim during the run).
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
        # 128 MiB split target: survey §4 notes the reference's own partition
        # sizing guidance (README.md:392-394) — also the right default at scale.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
    )
    if master.startswith("local"):
        builder = builder.config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
