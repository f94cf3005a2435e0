"""[EXT] Structured Streaming operators over the ``events`` stream (SURVEY.md §2.9).

The reference has no streaming (README.md:507 lists it as future work); this
module supplies the streaming surface the driver's ``events`` table implies:
tumbling/sliding windowed aggregation, session windows, watermark-driven late
data handling, and stateful dedup — all built on Structured Streaming
primitives (no custom state store).

Batch/stream duality: every aggregation here has the same shape as its batch
shadow in the query catalog (q25 hourly agg, q26 sessionization), and the
tests assert stream output == batch output over the same parquet rows — the
property that makes a lambda-free architecture trustworthy.

Scale notes: watermarks bound state (late events beyond the horizon are
dropped, so state is O(active windows), not O(history)); parquet is the test
transport, Kafka would be the production source — the operator code is
source-agnostic.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _events_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def _events_ts_layout(sf_dir: str) -> tuple[str, bool]:
    """(time unit, has-timezone) of ``events.ts``, read from the parquet
    footer — streams require a user-supplied schema, so the reader must know
    the writer's layout up front (the batch catalog shim does the same probe;
    hardcoding one unit breaks the moment the producer changes it)."""
    try:
        import pyarrow.parquet as pq

        arrow_type = pq.read_schema(os.path.join(sf_dir, "events.parquet")).field("ts").type
        return getattr(arrow_type, "unit", "us"), getattr(arrow_type, "tz", None) is not None
    except Exception:
        return "us", True


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet, normalized to a plain
    ``timestamp`` column whatever unit the writer used:

    * ns: not natively readable — read as raw nanos longs
      (``nanosAsLong``) and truncate to micros, matching the batch shim.
    * us without UTC flag (TIMESTAMP_NTZ): read NTZ, cast to ``timestamp``
      (identity under the engine's fixed UTC session timezone).
    """
    unit, has_tz = _events_ts_layout(sf_dir)
    if unit == "ns":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        schema = _events_schema(T.LongType())
    elif has_tz:
        schema = _events_schema(T.TimestampType())
    else:
        schema = _events_schema(T.TimestampNTZType())
    raw = (
        spark.readStream.schema(schema)
        .format("parquet")
        # file stream sources take a directory; select just the events table
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    if unit == "ns":
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def tumbling_agg(
    events: DataFrame, window: str = "1 hour", watermark: str = "10 minutes"
) -> DataFrame:
    """Tumbling-window counts/sums per event_type with a late-data watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sliding_agg(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Sliding-window aggregation (each event lands in window/slide windows)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
        )
    )


def session_agg(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Session windows per user: events within ``gap`` of each other merge into
    one session (built-in ``session_window`` state — the batch shadow is the
    lag/cumsum sessionization in q26)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Stateful streaming dedup on event_id, state bounded by the watermark
    (Spark >= 3.5 ``dropDuplicatesWithinWatermark``)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def stream_stream_interval_join(
    clicks: DataFrame,
    purchases: DataFrame,
    lookback: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked stream-stream join: each click joins purchases by the same
    user within ``lookback`` BEFORE the click.

    Both sides buffer state; the watermark + time-bound condition let Spark
    evict rows once they can no longer match (state stays O(active window),
    the requirement for an unbounded 100 TB/day stream).  Range condition on
    event time is mandatory — without it stream-stream state grows forever.
    """
    c = clicks.withWatermark("ts", watermark).select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.withWatermark("ts", watermark).select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") <= F.col("click_ts"))
        & (F.col("purchase_ts") >= F.col("click_ts") - F.expr(f"INTERVAL {lookback}"))
    )
    return c.join(p, cond).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "click_ts",
        "purchase_id",
        "purchase_ts",
        "purchase_value",
    )


def stateful_running_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user running
    event count and value total, carried across micro-batches in the state
    store.

    This is the escape hatch for stateful semantics the built-in windows can't
    express (custom counters, ML feature state, per-key models).  State is
    keyed by user_id — O(distinct users), shuffled once per micro-batch; Arrow
    moves the batch to Python, so the per-group function sees pandas frames,
    never rows.
    """
    import pandas as pd  # noqa: PLC0415 — worker-side import
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id long, n_events long, total_value double"
    state_schema = "n long, total double"

    def update(key: tuple, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [total]})

    return events.groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def stateful_sessions_with_timeout(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Custom sessionization with event-time timeout: a session CLOSES (and is
    emitted) only when the watermark passes last_event + gap — the
    applyInPandasWithState equivalent of ``F.session_window``, but with the
    full power of arbitrary per-session state (counters here; could be any
    feature accumulator).

    Emits one row per CLOSED session; sessions still open at end-of-stream
    stay in the state store (standard streaming semantics — a final watermark
    advance, e.g. a heartbeat event, flushes them in production).
    """
    import pandas as pd  # noqa: PLC0415 — worker-side import
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_ms = gap_minutes * 60 * 1000
    out_schema = (
        "user_id long, session_start timestamp, session_end timestamp, n_events long"
    )
    state_schema = "start_ms long, last_ms long, n long"

    def update(key: tuple, pdfs, state: GroupState):
        if state.hasTimedOut:
            start_ms, last_ms, n = state.get
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start": [pd.Timestamp(start_ms, unit="ms")],
                    "session_end": [pd.Timestamp(last_ms, unit="ms")],
                    "n_events": [n],
                }
            )
            state.remove()
            return
        rows = pd.concat(list(pdfs))
        ts_ms = (rows["ts"].astype("int64") // 1_000_000).sort_values()
        closed: list[tuple[int, int, int]] = []
        if state.exists:
            start_ms, last_ms, n = state.get
        else:
            start_ms, last_ms, n = int(ts_ms.iloc[0]), int(ts_ms.iloc[0]) - 1, 0
        for t in ts_ms:
            t = int(t)
            if n > 0 and t - last_ms > gap_ms:
                closed.append((start_ms, last_ms, n))
                start_ms, n = t, 0
            last_ms = max(last_ms, t)
            n += 1
        state.update((start_ms, last_ms, n))
        # A timeout may not be set before the current watermark; a session whose
        # gap already expired closes at the very next watermark advance.
        state.setTimeoutTimestamp(max(last_ms + gap_ms, state.getCurrentWatermarkMs() + 1))
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="ms") for s, _, _ in closed],
                    "session_end": [pd.Timestamp(e, unit="ms") for _, e, _ in closed],
                    "n_events": [k for _, _, k in closed],
                }
            )

    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy("user_id")
        .applyInPandasWithState(
            update, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
        )
    )


def run_to_memory(
    stream_df: DataFrame, query_name: str, output_mode: str = "complete"
) -> None:
    """Drive a streaming query to completion against the bounded file source
    (memory sink + processAllAvailable — the local test harness)."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def run_to_parquet(stream_df: DataFrame, out_dir: str, checkpoint_dir: str) -> None:
    """Durable streaming sink: parquet file sink + checkpoint, Spark's
    exactly-once output path (file-sink manifest + WAL offsets).

    Restarting the same query against the same checkpoint resumes from the
    recorded offsets — already-committed batches are never rewritten, which is
    the recovery contract a production pipeline relies on."""
    q = (
        stream_df.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def split_events_for_microbatches(
    spark: SparkSession, sf_dir: str, out_dir: str, n_files: int = 4
) -> str:
    """Re-write the events table as ``n_files`` time-ordered parquet files so a
    file stream with maxFilesPerTrigger=1 replays it as real micro-batches —
    the harness that proves stateful operators carry state ACROSS batches
    (one-file sources collapse everything into a single batch)."""
    from healthcare_data_pipeline_spark.catalog import table as _table

    ev = _table(spark, sf_dir, "events").withColumn(
        "__bucket", F.ntile(n_files).over(Window.orderBy("ts", "event_id"))
    ).cache()
    # One file per bucket, written SEQUENTIALLY in time order: the file stream
    # source replays by (modTime, path), so batches must ascend in event time
    # or the watermark drops later files' rows.  (repartitionByRange would
    # sample nondeterministically and can mix buckets across files.)
    for b in range(1, n_files + 1):
        (
            ev.filter(F.col("__bucket") == b)
            .drop("__bucket")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, f"b{b:02d}"))
        )
    ev.unpersist()
    return out_dir


def read_events_stream_microbatched(spark: SparkSession, split_dir: str) -> DataFrame:
    """Stream the split directory one file per trigger (micro-sized batches)."""
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    return (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .load(split_dir)
    )


def stream_static_enrich(
    events: DataFrame, dim: DataFrame, stream_key: str, dim_key: str, how: str = "left"
) -> DataFrame:
    """Stream-static join: enrich a stream with a (slowly-changing) dimension.

    The static side is re-planned on every micro-batch — a file-backed dim
    picks up new data without restarting the query — and is explicitly
    broadcast, so the stream side never shuffles: each micro-batch stays a
    narrow map over the source partitions, which is the only shape that holds
    up when the stream is 100 TB/day.  Stateless (no watermark needed): the
    dim is not buffered as stream state, unlike the stream-stream join above.
    """
    return events.join(F.broadcast(dim), events[stream_key] == dim[dim_key], how)


def run_foreach_batch_upsert(
    stream_df: DataFrame, target_dir: str, checkpoint_dir: str, key: str
) -> None:
    """``foreachBatch`` sink: MERGE each micro-batch into a parquet target by key.

    foreachBatch is the escape hatch for sinks Spark lacks natively (JDBC
    upsert, multi-sink fan-out, MERGE INTO).  Exactly-once comes from
    idempotence: the committed ``batchId`` is recorded atomically WITH the
    data (a ``_COMMITTED_BATCH`` marker written into the staging directory
    *before* the swap, so marker and data become visible in one rename), and a
    replayed batch after crash/restart is detected and skipped rather than
    re-merged.

    The merge materializes to ``<target>.tmp`` then swaps via rename-aside
    (``target -> target.old; tmp -> target; rm target.old``) — read-your-own-
    overwrite is not safe in one pass, and no crash point loses data: before
    the first rename the old target is untouched; between the renames the old
    data survives in ``target.old`` and ``_recover`` restores it on restart;
    after the second rename the new target (with its marker) is complete and
    ``target.old`` is disposable.  Same pattern a production job would use on
    object storage via a manifest.
    """
    import shutil

    marker = os.path.join(target_dir, "_COMMITTED_BATCH")
    aside = target_dir + ".old"

    def _recover() -> None:
        # Crash between the two renames leaves target missing and the previous
        # data in target.old: restore it so the replayed batch re-merges on top.
        # A leftover target.old WITH target present means the swap completed
        # and only the cleanup was lost: discard it.
        if os.path.exists(aside):
            if os.path.exists(target_dir):
                shutil.rmtree(aside)
            else:
                os.rename(aside, target_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        _recover()
        if os.path.exists(marker):
            with open(marker) as fh:
                if batch_id <= int(fh.read().strip()):
                    return  # replayed batch — already merged; skip (idempotence)
        # Last-writer-wins WITHIN the batch: order by every column descending
        # so the kept row per key is deterministic regardless of partition order.
        w_cols = list(batch_df.columns)
        updates = (
            batch_df.withColumn(
                "__rn",
                F.row_number().over(
                    Window.partitionBy(key).orderBy(*[F.desc(c) for c in w_cols])
                ),
            )
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        if os.path.exists(os.path.join(target_dir, "_SUCCESS")):
            from healthcare_data_pipeline_spark.operators.upsert import merge_upsert

            existing = spark.read.parquet(target_dir).select(*updates.columns)
            merged = merge_upsert(existing, updates, key)
        else:
            merged = updates
        tmp = target_dir + ".tmp"
        merged.write.mode("overwrite").parquet(tmp)
        # Marker rides inside tmp: it becomes visible atomically with the data.
        with open(os.path.join(tmp, "_COMMITTED_BATCH"), "w") as fh:
            fh.write(str(batch_id))
        if os.path.exists(target_dir):
            os.rename(target_dir, aside)
        os.rename(tmp, target_dir)
        if os.path.exists(aside):
            shutil.rmtree(aside)

    q = (
        stream_df.writeStream.outputMode("append")
        .foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
