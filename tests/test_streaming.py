"""Streaming correctness: stream output must equal the batch shadow over the
same rows (bounded file source -> memory sink)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from healthcare_data_pipeline_spark.catalog import table
from healthcare_data_pipeline_spark.streaming import events as stv
from tests.conftest import SF_DIR


def test_tumbling_agg_equals_batch(spark):
    stream = stv.tumbling_agg(stv.read_events_stream(spark, SF_DIR), window="1 hour")
    stv.run_to_memory(stream, "tumbling_out", output_mode="complete")
    got = {
        (r.window_start, r.event_type): (r.n, round(r.total_value, 6))
        for r in spark.sql("SELECT * FROM tumbling_out").collect()
    }
    batch = (
        table(spark, SF_DIR, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("h"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("tv"))
        .collect()
    )
    want = {(r.h, r.event_type): (r.n, round(r.tv, 6)) for r in batch}
    assert got == want


def test_sliding_agg_covers_each_event_twice(spark):
    stream = stv.sliding_agg(
        stv.read_events_stream(spark, SF_DIR), window="1 hour", slide="30 minutes"
    )
    stv.run_to_memory(stream, "sliding_out", output_mode="complete")
    total_events = table(spark, SF_DIR, "events").count()
    windowed_sum = spark.sql("SELECT SUM(n) AS s FROM sliding_out").collect()[0].s
    assert windowed_sum == 2 * total_events  # window/slide = 2 windows per event


def test_session_agg_equals_batch_sessionization(spark):
    stream = stv.session_agg(stv.read_events_stream(spark, SF_DIR), gap="30 minutes")
    stv.run_to_memory(stream, "session_out", output_mode="complete")
    stream_sessions = spark.sql(
        "SELECT user_id, COUNT(*) AS n_sessions, SUM(n_events) AS n_events "
        "FROM session_out GROUP BY user_id"
    ).collect()
    got = {r.user_id: (r.n_sessions, r.n_events) for r in stream_sessions}

    # Batch shadow: lag-gap sessionization (same algorithm as q26, all users).
    # session_window closes a session when the NEXT event is > gap after the
    # PREVIOUS EVENT (not window start), identical to the lag-gap rule.
    from pyspark.sql import Window

    ev = table(spark, SF_DIR, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    flagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.lag("ts").over(w).isNull() | (gap > 1800 * 1000000), 1)
        .otherwise(0)
        .alias("new_session"),
    )
    sessions = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    batch = (
        sessions.groupBy("user_id")
        .agg(F.countDistinct("session_id").alias("n_sessions"), F.count("*").alias("n_events"))
        .collect()
    )
    want = {r.user_id: (r.n_sessions, r.n_events) for r in batch}
    assert got == want


def test_stateful_running_totals_equals_batch(spark):
    # applyInPandasWithState in update mode emits one row per (user, batch);
    # the LAST emission per user must equal the batch per-user totals.
    stream = stv.stateful_running_totals(stv.read_events_stream(spark, SF_DIR))
    stv.run_to_memory(stream, "running_out", output_mode="update")
    got_rows = spark.sql(
        "SELECT user_id, MAX(n_events) AS n, MAX(total_value) AS tv "
        "FROM running_out GROUP BY user_id"
    ).collect()
    got = {r.user_id: (r.n, round(r.tv, 6)) for r in got_rows}
    batch = (
        table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("tv"))
        .collect()
    )
    want = {r.user_id: (r.n, round(r.tv, 6)) for r in batch}
    assert got == want


def test_stateful_dedup(spark):
    # Duplicate the stream by unioning it with itself via two file reads is not
    # possible with one source dir; instead verify dedup keeps each event_id once.
    stream = stv.dedup_within_watermark(stv.read_events_stream(spark, SF_DIR))
    stv.run_to_memory(stream.groupBy().count(), "dedup_out", output_mode="complete")
    got = spark.sql("SELECT * FROM dedup_out").collect()[0]["count"]
    want = table(spark, SF_DIR, "events").select("event_id").distinct().count()
    assert got == want


def test_stream_stream_interval_join_equals_batch(spark):
    ev = stv.read_events_stream(spark, SF_DIR)
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    joined = stv.stream_stream_interval_join(clicks, purchases, lookback="30 minutes")
    stv.run_to_memory(joined, "ssj_out", output_mode="append")
    got = spark.sql(
        "SELECT COUNT(*) AS n, COUNT(DISTINCT click_id) AS n_clicks FROM ssj_out"
    ).collect()[0]

    # Batch shadow: identical interval join over the static table.
    bev = table(spark, SF_DIR, "events")
    c = bev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = bev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("purchase_ts"),
    )
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") <= F.col("click_ts"))
        & (F.col("purchase_ts") >= F.col("click_ts") - F.expr("INTERVAL 30 minutes"))
    )
    want = c.join(p, cond).agg(
        F.count("*").alias("n"), F.countDistinct("click_id").alias("n_clicks")
    ).collect()[0]
    assert (got.n, got.n_clicks) == (want.n, want.n_clicks)
    assert got.n > 0  # non-vacuous


def test_stateful_totals_across_microbatches(spark, tmp_path):
    """State must carry across REAL micro-batches: the events table is split
    into 4 time-ordered files streamed one per trigger; the final per-user
    running totals must equal the batch aggregate over everything."""
    split_dir = stv.split_events_for_microbatches(
        spark, SF_DIR, str(tmp_path / "ev_split"), n_files=4
    )
    stream = stv.stateful_running_totals(
        stv.read_events_stream_microbatched(spark, split_dir)
    )
    stv.run_to_memory(stream, "running_mb_out", output_mode="update")
    got = {
        r.user_id: (r.n, round(r.tv, 6))
        for r in spark.sql(
            "SELECT user_id, MAX(n_events) AS n, MAX(total_value) AS tv "
            "FROM running_mb_out GROUP BY user_id"
        ).collect()
    }
    batch = (
        table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("tv"))
        .collect()
    )
    want = {r.user_id: (r.n, round(r.tv, 6)) for r in batch}
    assert got == want
    # each user must have been emitted in MORE than one batch (state exercised)
    emissions = spark.sql(
        "SELECT user_id, COUNT(*) AS k FROM running_mb_out GROUP BY user_id"
    ).collect()
    assert max(r.k for r in emissions) > 1


def test_stateful_sessions_with_timeout_subset_of_batch(spark, tmp_path):
    """Every session the timeout operator emits must exactly match a session
    from the batch lag-gap sessionization (subset: open sessions at stream end
    are legitimately unemitted)."""
    split_dir = stv.split_events_for_microbatches(
        spark, SF_DIR, str(tmp_path / "ev_split_sess"), n_files=4
    )
    stream = stv.stateful_sessions_with_timeout(
        stv.read_events_stream_microbatched(spark, split_dir), gap_minutes=30
    )
    stv.run_to_memory(stream, "sess_timeout_out", output_mode="append")
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.sql("SELECT * FROM sess_timeout_out").collect()
    }
    assert got, "no sessions closed — watermark never advanced past any gap"

    from pyspark.sql import Window

    ev = table(spark, SF_DIR, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    flagged = ev.select(
        "user_id", "ts", "event_id",
        F.when(F.lag("ts").over(w).isNull() | (gap > 1800 * 1000000), 1).otherwise(0).alias("ns"),
    )
    sessions = flagged.withColumn(
        "sid", F.sum("ns").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    )
    batch = {
        (r.user_id, r.s, r.e, r.n)
        for r in sessions.groupBy("user_id", "sid")
        .agg(F.min("ts").alias("s"), F.max("ts").alias("e"), F.count("*").alias("n"))
        .collect()
    }
    # ts in the stream op is millisecond-truncated (state stores epoch ms);
    # truncate the batch side the same way for comparison.
    import datetime as dt

    def trunc_ms(t):
        return t.replace(microsecond=t.microsecond // 1000 * 1000)

    batch_ms = {(u, trunc_ms(s), trunc_ms(e), n) for u, s, e, n in batch}
    assert got <= batch_ms, f"stream emitted sessions not present in batch: {sorted(got - batch_ms)[:3]}"


def test_late_data_dropped_by_watermark(spark, tmp_path):
    """An event arriving after the watermark passed its window must be DROPPED
    from the windowed aggregate (the late-data contract); the same rows in
    batch mode would count it — the difference proves the drop."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"

    def mk(rows, path):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(path)

    import time

    d = str(tmp_path / "late")
    # batch 0: two events at 10:05/10:10 plus one at 13:00 that pushes the
    # watermark (10 min delay) to 12:50 — far past the 10:00-11:00 window.
    mk(
        [
            (1, base + dt.timedelta(minutes=5), 1, "click", 1.0, "{}"),
            (2, base + dt.timedelta(minutes=10), 1, "click", 1.0, "{}"),
            (3, base + dt.timedelta(hours=3), 1, "click", 1.0, "{}"),
        ],
        d + "/b01",
    )
    time.sleep(1.1)  # file-stream replay orders by modification time
    # batch 1: any event — lets the 10:00 window EMIT AND EVICT (append mode
    # finalizes a window during the batch after the watermark passes its end;
    # a late row arriving in that same batch may still be absorbed — the
    # watermark drop guarantee starts only once the state is evicted).
    mk([(5, base + dt.timedelta(hours=3, minutes=5), 1, "click", 1.0, "{}")], d + "/b02")
    time.sleep(1.1)
    # batch 2: a LATE event inside the closed-and-evicted 10:00 window.
    mk([(4, base + dt.timedelta(minutes=20), 1, "click", 1.0, "{}")], d + "/b03")

    stream = stv.tumbling_agg(
        stv.read_events_stream_microbatched(spark, d), window="1 hour", watermark="10 minutes"
    )
    # append mode: only finalized (watermark-closed) windows are emitted
    stv.run_to_memory(stream, "late_out", output_mode="append")
    out = spark.sql("SELECT * FROM late_out").collect()
    rows = {r.window_start: r.n for r in out}
    assert rows[base.replace(minute=0)] == 2, rows  # late event 4 NOT counted
    # and the closed window was emitted exactly once (no duplicate from the late row)
    assert sum(1 for r in out if r.window_start == base.replace(minute=0)) == 1

    # batch over the same files counts all 3 events in the 10:00 window
    batch = (
        spark.read.option("recursiveFileLookup", "true").parquet(d)
        .groupBy(F.date_trunc("hour", "ts").alias("h"))
        .count()
        .collect()
    )
    batch_h10 = {r.h: r["count"] for r in batch}[base.replace(minute=0)]
    assert batch_h10 == 3


def test_parquet_sink_checkpoint_resume_no_duplicates(spark, tmp_path):
    """The durable sink must deliver every source row exactly once, and a
    restart against the same checkpoint must not duplicate or rewrite
    anything (file-sink manifest + WAL offsets)."""
    split_dir = stv.split_events_for_microbatches(
        spark, SF_DIR, str(tmp_path / "ev_split_sink"), n_files=3
    )
    out, ckpt = str(tmp_path / "sink_out"), str(tmp_path / "sink_ckpt")

    def run():
        stv.run_to_parquet(
            stv.read_events_stream_microbatched(spark, split_dir).select(
                "event_id", "ts", "user_id", "value"
            ),
            out,
            ckpt,
        )

    run()
    first = spark.read.parquet(out)
    n_source = table(spark, SF_DIR, "events").count()
    assert first.count() == n_source
    assert first.select("event_id").distinct().count() == n_source

    run()  # restart: same checkpoint, no new source files -> no new output
    again = spark.read.parquet(out)
    assert again.count() == n_source


def test_stream_static_enrich_equals_batch(spark):
    """Stream-static broadcast join: streaming enrichment of events with a
    static dim must equal the same batch join, and must not shuffle the
    stream side (the dim is broadcast)."""
    dim = (
        table(spark, SF_DIR, "customer")
        .select(F.col("c_custkey").alias("dim_key"), "c_mktsegment")
    )
    enriched = stv.stream_static_enrich(
        stv.read_events_stream(spark, SF_DIR), dim, "user_id", "dim_key"
    ).select("event_id", "user_id", "c_mktsegment")
    stv.run_to_memory(enriched, "enrich_out", output_mode="append")
    got = {
        (r.event_id, r.c_mktsegment)
        for r in spark.sql("SELECT * FROM enrich_out").collect()
    }
    batch = (
        table(spark, SF_DIR, "events")
        .join(dim, F.col("user_id") == F.col("dim_key"), "left")
        .select("event_id", "c_mktsegment")
        .collect()
    )
    want = {(r.event_id, r.c_mktsegment) for r in batch}
    assert got == want and len(got) > 0


def test_foreach_batch_upsert_keyed_target(spark, tmp_path):
    """foreachBatch MERGE sink across real micro-batches: the final parquet
    target must hold exactly one row per user_id — the latest (max event_id)
    event for that user across ALL batches — i.e. later batches overwrote
    earlier ones through the keyed merge."""
    split_dir = stv.split_events_for_microbatches(
        spark, SF_DIR, str(tmp_path / "ev_split_fb"), n_files=4
    )
    stream = stv.read_events_stream_microbatched(spark, split_dir).select(
        "user_id", "event_id", "event_type"
    )
    target = str(tmp_path / "upsert_target")
    stv.run_foreach_batch_upsert(
        stream, target, str(tmp_path / "fb_ckpt"), key="user_id"
    )
    got = {
        r.user_id: (r.event_id, r.event_type)
        for r in spark.read.parquet(target).collect()
    }
    batch = (
        table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.max(F.struct("event_id", "event_type")).alias("top"))
        .select("user_id", "top.event_id", "top.event_type")
        .collect()
    )
    want = {r.user_id: (r.event_id, r.event_type) for r in batch}
    assert got == want


def test_foreach_batch_upsert_survives_crash_between_renames(spark, tmp_path, monkeypatch):
    """Kill the sink between the two renames of the swap (old target already
    moved aside, new target not yet in place) and restart from the same
    checkpoint: every previously merged batch must survive — the rename-aside
    recovery restores target.old, and the replayed batch re-merges on top."""
    import os as _os

    split_dir = stv.split_events_for_microbatches(
        spark, SF_DIR, str(tmp_path / "ev_split_crash"), n_files=4
    )
    target = str(tmp_path / "crash_target")
    ckpt = str(tmp_path / "crash_ckpt")

    real_rename = _os.rename
    state = {"tmp_to_target": 0}

    def crashing_rename(src, dst, *a, **kw):
        if str(src) == target + ".tmp" and str(dst) == target:
            state["tmp_to_target"] += 1
            if state["tmp_to_target"] == 2:  # second batch: prior data at risk
                raise RuntimeError("simulated crash between renames")
        return real_rename(src, dst, *a, **kw)

    def make_stream():
        return stv.read_events_stream_microbatched(spark, split_dir).select(
            "user_id", "event_id", "event_type"
        )

    monkeypatch.setattr(stv.os, "rename", crashing_rename)
    try:
        stv.run_foreach_batch_upsert(make_stream(), target, ckpt, key="user_id")
        raise AssertionError("expected the simulated crash to propagate")
    except Exception as exc:  # StreamingQueryException wrapping the crash
        assert "simulated crash" in str(exc)
    finally:
        monkeypatch.setattr(stv.os, "rename", real_rename)

    # Crash left the target renamed aside (worst-case window).
    assert _os.path.exists(target + ".old") and not _os.path.exists(target)

    # Restart from the same checkpoint: replayed + remaining batches merge.
    stv.run_foreach_batch_upsert(make_stream(), target, ckpt, key="user_id")

    got = {
        r.user_id: (r.event_id, r.event_type)
        for r in spark.read.parquet(target).collect()
    }
    batch = (
        table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.max(F.struct("event_id", "event_type")).alias("top"))
        .collect()
    )
    want = {r.user_id: (r.top.event_id, r.top.event_type) for r in batch}
    assert got == want and not _os.path.exists(target + ".old")


def test_progress_recorder_captures_batches(spark, tmp_path):
    """The StreamingQueryListener observability surface: per-batch progress
    (input rows, durations, state rows) captured and persisted as JSONL while
    a windowed stream drains; detached cleanly afterwards."""
    import json as _json

    from healthcare_data_pipeline_spark.streaming.metrics import record_progress

    artifact = str(tmp_path / "progress.jsonl")
    import time as _time

    with record_progress(spark, artifact) as rec:
        stream = stv.tumbling_agg(stv.read_events_stream(spark, SF_DIR), window="1 hour")
        (
            stream.writeStream.format("memory")
            .queryName("metrics_probe")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
            .awaitTermination(120)
        )
        # listener events are delivered asynchronously after awaitTermination
        for _ in range(100):
            if rec.terminated:
                break
            _time.sleep(0.1)
    n_events = spark.sql("SELECT SUM(n) AS s FROM metrics_probe").collect()[0]["s"]
    assert rec.total_input_rows() == n_events
    assert rec.started and rec.terminated
    assert all(d >= 0 for d in rec.batch_durations_ms()) and rec.batch_durations_ms()
    assert rec.max_state_rows() > 0  # windowed agg keeps state
    lines = [_json.loads(ln) for ln in open(artifact)]
    assert len(lines) == len(rec.progress)
    assert sum(p.get("numInputRows", 0) for p in lines) == n_events


def test_stream_dedup_ingest_builds_deduplicated_corpus(spark, tmp_path):
    """Streaming corpus ingestion: micro-batches are deduplicated against the
    stored fingerprint/band indexes (O(batch) per batch), survivors appended,
    and a drained-again stream with no new files changes nothing."""
    from healthcare_data_pipeline_spark.streaming import ingest as ing

    src = str(tmp_path / "doc_src")
    os.makedirs(src)
    schema = "doc_id long, text string"
    base = "the quick brown fox jumps over the lazy dog again and again today"

    def stream():
        return (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "*.parquet")
            .option("recursiveFileLookup", "true")
            .parquet(src)
        )

    corpus, ckpt = str(tmp_path / "corpus"), str(tmp_path / "ingest_ckpt")

    spark.createDataFrame(
        [
            (1, base),
            (2, base),  # intra-batch exact dup of 1
            (3, "completely different text about catalyst plans and tungsten codegen"),
        ],
        schema,
    ).coalesce(1).write.parquet(os.path.join(src, "b1"))
    progress = str(tmp_path / "ingest_progress.jsonl")
    ing.run_stream_dedup_ingest(stream(), corpus, ckpt, progress_path=progress)
    assert sorted(r.doc_id for r in ing.read_corpus(spark, corpus).collect()) == [1, 3]
    assert os.path.exists(progress) and open(progress).read().strip()

    spark.createDataFrame(
        [
            (11, base),  # exact dup of corpus doc 1 -> dropped via fingerprint index
            (12, base.replace("today", "tomorrow")),  # near dup of 1 -> dropped via band index
            (13, "a brand new sentence mentioning shuffles partitions and broadcast joins"),
        ],
        schema,
    ).coalesce(1).write.parquet(os.path.join(src, "b2"))
    ing.run_stream_dedup_ingest(stream(), corpus, ckpt)
    assert sorted(r.doc_id for r in ing.read_corpus(spark, corpus).collect()) == [1, 3, 13]

    # drain again with nothing new: corpus unchanged (idempotent resume)
    ing.run_stream_dedup_ingest(stream(), corpus, ckpt)
    assert sorted(r.doc_id for r in ing.read_corpus(spark, corpus).collect()) == [1, 3, 13]


def test_stream_dedup_ingest_survives_crash_before_publish(spark, tmp_path, monkeypatch):
    """Crash the ingest sink before the segment's publish rename and re-drain
    from the same checkpoint: the staged ``.tmp`` orphan must be discarded,
    the previous segments untouched, and the replayed batch ingested exactly
    once."""
    import os as _os

    from healthcare_data_pipeline_spark.streaming import ingest as ing

    src = str(tmp_path / "crash_doc_src")
    os.makedirs(src)
    schema = "doc_id long, text string"
    corpus, ckpt = str(tmp_path / "crash_corpus"), str(tmp_path / "crash_ingest_ckpt")

    def stream():
        return (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "*.parquet")
            .option("recursiveFileLookup", "true")
            .parquet(src)
        )

    spark.createDataFrame(
        [(1, "first corpus document with plenty of words for shingling today")], schema
    ).coalesce(1).write.parquet(os.path.join(src, "b1"))
    ing.run_stream_dedup_ingest(stream(), corpus, ckpt)

    spark.createDataFrame(
        [(2, "second document that is entirely new and should also survive here")], schema
    ).coalesce(1).write.parquet(os.path.join(src, "b2"))

    real_rename = _os.rename

    def crashing_rename(s, d, *a, **kw):
        if str(s).endswith(".tmp") and "seg-" in str(d):
            raise RuntimeError("simulated crash before segment publish")
        return real_rename(s, d, *a, **kw)

    monkeypatch.setattr(ing.os, "rename", crashing_rename)
    try:
        ing.run_stream_dedup_ingest(stream(), corpus, ckpt)
        raise AssertionError("expected the simulated crash to propagate")
    except Exception as exc:
        assert "simulated crash" in str(exc)
    finally:
        monkeypatch.setattr(ing.os, "rename", real_rename)

    # batch 1's segment survived; batch 2 left only an uncommitted .tmp orphan
    assert sorted(r.doc_id for r in ing.read_corpus(spark, corpus).collect()) == [1]
    ing.run_stream_dedup_ingest(stream(), corpus, ckpt)
    assert sorted(r.doc_id for r in ing.read_corpus(spark, corpus).collect()) == [1, 2]
    # recovery cleaned the orphan
    segroot = os.path.join(corpus, "segments")
    assert not [n for n in os.listdir(segroot) if n.endswith(".tmp")]


def test_compact_survives_crash_between_renames(spark, tmp_path, monkeypatch):
    """Crash compaction in the worst-case window (live segment log moved
    aside, merged log not yet in place): _recover must restore the corpus and
    a later compact() must fold it with nothing lost."""
    import os as _os

    from healthcare_data_pipeline_spark.streaming import ingest as ing

    src = str(tmp_path / "cc_doc_src")
    os.makedirs(src)
    schema = "doc_id long, text string"
    corpus, ckpt = str(tmp_path / "cc_corpus"), str(tmp_path / "cc_ckpt")
    segroot = os.path.join(corpus, "segments")

    def stream():
        return (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "*.parquet")
            .option("recursiveFileLookup", "true")
            .parquet(src)
        )

    texts = [
        (1, "alpha document full of words that describe shuffle free aggregation"),
        (2, "beta document about broadcast joins and adaptive query execution"),
        (3, "gamma document on bucketing salting and skew mitigation at scale"),
    ]
    for i, row in enumerate(texts, 1):
        spark.createDataFrame([row], schema).coalesce(1).write.parquet(
            os.path.join(src, f"b{i}")
        )
        ing.run_stream_dedup_ingest(stream(), corpus, ckpt, compact_every=0)
    assert len([n for n in os.listdir(segroot) if n.startswith("seg-")]) == 3

    real_rename = _os.rename

    def crashing_rename(s, d, *a, **kw):
        if str(s).endswith("segments.tmp") and str(d).endswith("segments"):
            raise RuntimeError("simulated crash mid-compaction")
        return real_rename(s, d, *a, **kw)

    monkeypatch.setattr(ing.os, "rename", crashing_rename)
    try:
        ing.compact(spark, corpus)
        raise AssertionError("expected the simulated crash to propagate")
    except Exception as exc:
        assert "simulated crash" in str(exc)
    finally:
        monkeypatch.setattr(ing.os, "rename", real_rename)

    # worst case on disk: segments gone, segments.old holds the corpus
    assert _os.path.exists(segroot + ".old") and not _os.path.exists(segroot)
    ing._recover(corpus)
    assert sorted(r.doc_id for r in ing.read_corpus(spark, corpus).collect()) == [1, 2, 3]
    ing.compact(spark, corpus)
    assert len([n for n in os.listdir(segroot) if n.startswith("seg-")]) == 1
    assert sorted(r.doc_id for r in ing.read_corpus(spark, corpus).collect()) == [1, 2, 3]
    # replay detection survives compaction: re-drain changes nothing
    ing.run_stream_dedup_ingest(stream(), corpus, ckpt, compact_every=0)
    assert sorted(r.doc_id for r in ing.read_corpus(spark, corpus).collect()) == [1, 2, 3]


def test_ingest_write_cost_is_o_batch_not_o_corpus(spark, tmp_path):
    """The r3 scale bug: every micro-batch rewrote the whole corpus + indexes
    (O(corpus) I/O per batch).  Now a batch writes only its own segment, so
    bytes-written-per-batch stays ~flat while the corpus grows."""
    from healthcare_data_pipeline_spark.streaming import ingest as ing

    src = str(tmp_path / "flat_doc_src")
    os.makedirs(src)
    schema = "doc_id long, text string"
    corpus, ckpt = str(tmp_path / "flat_corpus"), str(tmp_path / "flat_ckpt")
    segroot = os.path.join(corpus, "segments")

    def stream():
        return (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "*.parquet")
            .option("recursiveFileLookup", "true")
            .parquet(src)
        )

    def tree_bytes() -> int:
        total = 0
        for dirpath, _dirs, files in os.walk(segroot):
            total += sum(os.path.getsize(os.path.join(dirpath, f)) for f in files)
        return total

    rng_words = (
        "spark shuffle partition broadcast catalyst tungsten codegen adaptive "
        "skew salt bucket window watermark state checkpoint parquet arrow"
    ).split()
    written_per_batch = []
    n_batches, docs_per_batch = 5, 8
    for b in range(n_batches):
        rows = [
            (
                b * 100 + i,
                " ".join(rng_words[(b * 31 + i * 7 + k) % len(rng_words)] for k in range(12))
                + f" unique marker {b} {i}",
            )
            for i in range(docs_per_batch)
        ]
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            os.path.join(src, f"b{b}")
        )
        before = tree_bytes()
        ing.run_stream_dedup_ingest(stream(), corpus, ckpt, compact_every=0)
        written_per_batch.append(tree_bytes() - before)

    # corpus grew ~n_batches x, but the last batch's write stayed within noise
    # of the first (parquet footer overhead dominates at this tiny size)
    assert written_per_batch[-1] <= 2 * written_per_batch[0], written_per_batch


def test_stream_prep_gate_equals_batch(spark):
    """The stateless prep gates (quality filter -> redaction -> mixture gate)
    run UNCHANGED on an unbounded stream and emit exactly the batch rows —
    the contract that lets one operator library serve both ingest modes."""
    from healthcare_data_pipeline_spark.operators.mixture import mixture_sample
    from healthcare_data_pipeline_spark.operators.quality import quality_predicate
    from healthcare_data_pipeline_spark.operators.redact import redact_pii
    from healthcare_data_pipeline_spark.streaming import ingest as ing

    from healthcare_data_pipeline_spark.operators.mixture import hash_split

    w = {f"src{i}": 0.5 for i in range(20)}
    fr = {"train": 0.9, "val": 0.05, "test": 0.05}
    stream = ing.prep_stream(
        ing.read_documents_stream(spark, SF_DIR), weights=w, split_fractions=fr
    )
    stv.run_to_memory(
        stream.select("doc_id", "text", "n_email", "split"), "prep_out", output_mode="append"
    )
    got = {
        (r.doc_id, r.text, r.n_email, r.split)
        for r in spark.sql("SELECT * FROM prep_out").collect()
    }
    batch = hash_split(
        mixture_sample(
            redact_pii(
                table(spark, SF_DIR, "documents").filter(
                    quality_predicate(min_stopword_ratio=0.01)
                )
            ),
            w,
        ),
        fr,
    )
    want = {
        (r.doc_id, r.text, r.n_email, r.split)
        for r in batch.select("doc_id", "text", "n_email", "split").collect()
    }
    assert got == want and len(got) > 0
    assert {s for (_, _, _, s) in got} <= {"train", "val", "test"}


def _mini_ingest_env(spark, tmp_path, tag):
    """(stream_factory, src, corpus, ckpt) for hand-driven ingest tests."""
    from healthcare_data_pipeline_spark.streaming import ingest as ing  # noqa: F401

    src = str(tmp_path / f"{tag}_src")
    os.makedirs(src)
    schema = "doc_id long, text string"
    corpus, ckpt = str(tmp_path / f"{tag}_corpus"), str(tmp_path / f"{tag}_ckpt")

    def stream():
        return (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "*.parquet")
            .option("recursiveFileLookup", "true")
            .parquet(src)
        )

    return stream, src, corpus, ckpt, schema


def test_tiered_compaction_never_rewrites_the_big_tier(spark, tmp_path):
    """compact_tiered folds ONLY a full tier of similar-sized segments: the
    bytes rewritten are bounded by the tier, and a segment an order of
    magnitude larger is untouched (same dir, same files, same mtimes) — the
    bounded-pause guarantee compact() cannot give."""
    from healthcare_data_pipeline_spark.streaming import ingest as ing

    stream, src, corpus, ckpt, schema = _mini_ingest_env(spark, tmp_path, "tier")
    words = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi"
    ).split()

    # one BIG batch (segment >>4x the small ones — unique digit soup keeps
    # parquet compression from collapsing it into the smalls' size tier),
    # then 4 small batches
    big = [
        (
            i,
            " ".join(
                f"{words[(i * 3 + k) % len(words)]}{(i * 7919 + k * 104729) % 999983}"
                for k in range(60)
            )
            + f" big {i}",
        )
        for i in range(1500)
    ]
    spark.createDataFrame(big, schema).coalesce(1).write.parquet(os.path.join(src, "b0"))
    ing.run_stream_dedup_ingest(stream(), corpus, ckpt, compact_every=0)
    for b in range(1, 5):
        rows = [
            (1000 * b + i, f"small batch doc {b} {i} " + words[(b + i) % len(words)])
            for i in range(3)
        ]
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            os.path.join(src, f"b{b}")
        )
        ing.run_stream_dedup_ingest(stream(), corpus, ckpt, compact_every=0)

    segroot = os.path.join(corpus, "segments")
    segs = ing._committed_segments(corpus)
    assert len(segs) == 5
    sizes = {s: ing._segment_bytes(s) for s in segs}
    big_seg = max(sizes, key=sizes.get)
    big_files = {
        os.path.join(dp, f): os.path.getmtime(os.path.join(dp, f))
        for dp, _, fs in os.walk(big_seg)
        for f in fs
    }
    small_bytes = sum(b for s, b in sizes.items() if s != big_seg)
    n_docs_before = ing.read_corpus(spark, corpus).count()

    rewritten = ing.compact_tiered(spark, corpus, min_merge=4)
    # folded exactly the small tier, never the big segment
    assert 0 < rewritten <= small_bytes
    assert rewritten < sizes[big_seg]
    after = ing._committed_segments(corpus)
    assert big_seg in after and len(after) == 2
    assert {
        os.path.join(dp, f): os.path.getmtime(os.path.join(dp, f))
        for dp, _, fs in os.walk(big_seg)
        for f in fs
    } == big_files
    assert ing.read_corpus(spark, corpus).count() == n_docs_before
    # journal is gone and another call is a no-op (no full tier left)
    assert not os.path.exists(os.path.join(segroot, ing._COMPACTION_JOURNAL))
    assert ing.compact_tiered(spark, corpus, min_merge=4) == 0


def test_tiered_compaction_crash_windows(spark, tmp_path, monkeypatch):
    """Both tiered-compaction crash windows recover with zero loss and zero
    double-counting: (a) crash before the journal publishes -> roll back,
    members stay live; (b) crash after the merged segment publishes but
    before members are deleted -> members are dead immediately (journal-aware
    listing) and _recover finishes forward."""
    import os as _os

    from healthcare_data_pipeline_spark.streaming import ingest as ing

    stream, src, corpus, ckpt, schema = _mini_ingest_env(spark, tmp_path, "crash")
    for b in range(4):
        rows = [(10 * b + i, f"crash test doc {b} {i} words words") for i in range(3)]
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            os.path.join(src, f"b{b}")
        )
        ing.run_stream_dedup_ingest(stream(), corpus, ckpt, compact_every=0)
    want_ids = sorted(r.doc_id for r in ing.read_corpus(spark, corpus).collect())
    segroot = os.path.join(corpus, "segments")
    real_rename = _os.rename

    # (a) crash at journal publish: nothing merged, members stay live
    def crash_at_journal(s, d, *a, **kw):
        if str(d).endswith(ing._COMPACTION_JOURNAL):
            raise RuntimeError("crash before journal")
        return real_rename(s, d, *a, **kw)

    monkeypatch.setattr(ing.os, "rename", crash_at_journal)
    try:
        ing.compact_tiered(spark, corpus, min_merge=4)
        raise AssertionError("expected simulated crash")
    except RuntimeError as exc:
        assert "crash before journal" in str(exc)
    finally:
        monkeypatch.setattr(ing.os, "rename", real_rename)
    ing._recover(corpus)
    assert sorted(r.doc_id for r in ing.read_corpus(spark, corpus).collect()) == want_ids
    assert len(ing._committed_segments(corpus)) == 4
    assert not [n for n in os.listdir(segroot) if n.endswith(".tmp")]

    # (b) crash right after the merged segment publishes (members not yet
    # deleted): the journal-aware listing must already exclude the members
    def crash_after_publish(s, d, *a, **kw):
        out = real_rename(s, d, *a, **kw)
        if str(s).endswith(".tmp") and "seg-" in _os.path.basename(str(d)):
            raise RuntimeError("crash after publish")
        return out

    monkeypatch.setattr(ing.os, "rename", crash_after_publish)
    try:
        ing.compact_tiered(spark, corpus, min_merge=4)
        raise AssertionError("expected simulated crash")
    except RuntimeError as exc:
        assert "crash after publish" in str(exc)
    finally:
        monkeypatch.setattr(ing.os, "rename", real_rename)
    # pre-recovery reads are already correct (members dead via journal)
    assert sorted(r.doc_id for r in ing.read_corpus(spark, corpus).collect()) == want_ids
    ing._recover(corpus)
    assert sorted(r.doc_id for r in ing.read_corpus(spark, corpus).collect()) == want_ids
    segs = ing._committed_segments(corpus)
    assert len(segs) == 1  # the merged tier (all 4 were similar-sized)
    assert not os.path.exists(os.path.join(segroot, ing._COMPACTION_JOURNAL))
    # replay detection survived: re-drain changes nothing
    ing.run_stream_dedup_ingest(stream(), corpus, ckpt, compact_every=0)
    assert sorted(r.doc_id for r in ing.read_corpus(spark, corpus).collect()) == want_ids


def test_read_corpus_waits_out_compaction_swap_window(spark, tmp_path):
    """A reader that lists during compact()'s two-rename swap (segments ->
    aside, tmp -> segments) must wait the window out via the aside marker
    instead of raising on an empty log."""
    import threading

    from healthcare_data_pipeline_spark.streaming import ingest as ing

    src = str(tmp_path / "doc_src")
    os.makedirs(src)
    schema = "doc_id long, text string"
    spark.createDataFrame(
        [(1, "one unique document about adaptive query execution planning")], schema
    ).coalesce(1).write.parquet(os.path.join(src, "b1"))
    corpus, ckpt = str(tmp_path / "corpus"), str(tmp_path / "ckpt")
    ing.run_stream_dedup_ingest(
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .parquet(src),
        corpus,
        ckpt,
    )

    root = os.path.join(corpus, "segments")
    os.rename(root, root + ".old")  # swap window opens
    t = threading.Timer(0.3, lambda: os.rename(root + ".old", root))
    t.start()
    try:
        assert [r.doc_id for r in ing.read_corpus(spark, corpus).collect()] == [1]
    finally:
        t.join()


def test_streaming_vector_ingest_maintains_ann_index(spark, tmp_path):
    """ann_index_append composes with Structured Streaming: a foreachBatch
    sink appends each micro-batch of vectors against the frozen quantizer,
    and after the drain an exhaustive probe over the mixed built+streamed
    index equals brute force on the full vector set."""
    import glob

    from healthcare_data_pipeline_spark.operators.similarity import (
        ann_index_append,
        ann_index_build,
        ann_index_probe,
        brute_topk,
    )
    from healthcare_data_pipeline_spark.queries.similarity import quantized
    from tests.conftest import SF_DIR

    en = quantized(spark, SF_DIR)
    idx = str(tmp_path / "idx")
    ann_index_build(en.filter(F.col("vec_id") % 2 == 0), idx)

    # stream the odd vectors in as parquet micro-batches
    src = str(tmp_path / "vec_src")
    os.makedirs(src)
    odds = en.filter(F.col("vec_id") % 2 == 1).select("vec_id", "label", "iv", "nrm2")
    odds.filter(F.col("vec_id") % 4 == 1).write.parquet(os.path.join(src, "b1"))
    odds.filter(F.col("vec_id") % 4 == 3).write.parquet(os.path.join(src, "b2"))

    stream = (
        spark.readStream.schema(odds.schema)
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda batch_df, batch_id: ann_index_append(spark, idx, batch_df)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    n_cells = len(glob.glob(os.path.join(idx, "vectors", "cell=*")))
    queries = en.filter(F.col("vec_id") <= 10).select("vec_id", "iv", "nrm2")
    full = {
        (r.query_id, r.rn): r.neighbor_id
        for r in ann_index_probe(spark, idx, queries, k=5, nprobe=n_cells).collect()
    }
    brute = {
        (r.query_id, r.rn): r.neighbor_id
        for r in brute_topk(en, F.col("vec_id") <= 10, k=5).collect()
    }
    assert full == brute


def test_streaming_append_with_gated_rebuild_closes_drift_loop(spark, tmp_path):
    """The full drift loop as ONE streaming composition: foreachBatch appends
    each vector micro-batch against the frozen quantizer, then calls
    ann_index_rebuild(if_recommended=True) — healthy batches leave the
    quantizer frozen (appends stay O(batch)), a drifted batch trips the
    report's occupancy gate and re-quantizes in place; by drain time the
    drifted cluster owns its own cell and nprobe=1 recall is exact."""
    from healthcare_data_pipeline_spark.operators.similarity import (
        ann_index_build,
        ann_index_append,
        ann_index_probe,
        ann_index_rebuild,
        brute_topk,
    )

    D = 8

    def to_en(rows):
        df = spark.createDataFrame(rows, "vec_id long, label string, iv array<double>")
        nrm2 = F.aggregate(
            F.zip_with("iv", "iv", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
        )
        return df.withColumn("nrm2", nrm2)

    base = []
    for j in range(8):
        for i in range(10):
            iv = [0.0] * D
            iv[j] = 1000.0 + i
            base.append((j * 100 + i, f"lab{j}", iv))
    healthy = []
    for j in range(8):
        iv = [0.0] * D
        iv[j] = 1020.0
        healthy.append((2000 + j, f"lab{j}", iv))
    drift = []
    for i in range(20):
        s = 1.0 if i % 2 == 0 else -1.0
        iv = [0.0] * D
        iv[0], iv[1], iv[2] = 1000.0 + s, 1000.0 - s, float(i)
        drift.append((10_000 + i, "drift", iv))

    en = to_en(base)
    idx = str(tmp_path / "idx")
    ann_index_build(en, idx)

    src = str(tmp_path / "vec_src")
    os.makedirs(src)
    to_en(healthy).write.parquet(os.path.join(src, "b1"))
    to_en(drift).write.parquet(os.path.join(src, "b2"))

    def sink(batch_df, batch_id):
        ann_index_append(spark, idx, batch_df)
        ann_index_rebuild(spark, idx, if_recommended=True, flag_factor=1.5)

    stream = (
        spark.readStream.schema(to_en(healthy).schema)
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # the rebuild (and only a rebuild — append never touches centroids)
    # gave the drifted cluster its own quantizer cell
    cents = {
        r.cent_id for r in spark.read.parquet(os.path.join(idx, "centroids")).collect()
    }
    assert "drift" in cents and len(cents) == 9

    union = en.unionByName(to_en(healthy)).unionByName(to_en(drift))
    qs = to_en(drift).select("vec_id", "iv", "nrm2")
    got = {
        (r.query_id, r.neighbor_id)
        for r in ann_index_probe(spark, idx, qs, k=5, nprobe=1).collect()
    }
    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_topk(union, F.col("vec_id") >= 10_000, k=5).collect()
    }
    assert got == exact


def test_streaming_ingest_maintains_zordered_layout(spark, tmp_path):
    """append_zordered composes with Structured Streaming the same way the
    ANN index does: a foreachBatch sink keys each micro-batch against the
    dataset's frozen quantizer and appends internally-clustered files —
    O(batch) per micro-batch, existing files untouched, pruning statistics
    stay tight as the stream grows."""
    import glob as _glob

    import pyarrow.parquet as pq

    from healthcare_data_pipeline_spark.sources.layout import (
        append_zordered,
        write_zordered,
    )

    dest = str(tmp_path / "zdata")
    base = spark.range(4000).select(
        F.col("id"),
        F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(1000)).alias("x"),
        F.pmod(F.xxhash64(F.col("id"), F.lit(2)), F.lit(1000)).alias("y"),
    )
    write_zordered(base, dest, ["x", "y"], n_files=4)
    files_before = set(_glob.glob(os.path.join(dest, "*.parquet")))

    src = str(tmp_path / "z_src")
    os.makedirs(src)
    more = spark.range(4000, 6000).select(
        F.col("id"),
        F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(1000)).alias("x"),
        F.pmod(F.xxhash64(F.col("id"), F.lit(2)), F.lit(1000)).alias("y"),
    )
    more.filter(F.col("id") < 5000).write.parquet(os.path.join(src, "b1"))
    more.filter(F.col("id") >= 5000).write.parquet(os.path.join(src, "b2"))

    stream = (
        spark.readStream.schema(more.schema)
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda batch_df, batch_id: append_zordered(batch_df, dest, n_files=4)
        )
        .option("checkpointLocation", str(tmp_path / "z_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    assert spark.read.parquet(dest).count() == 6000
    files_after = set(_glob.glob(os.path.join(dest, "*.parquet")))
    assert files_before < files_after
    # the streamed files are clustered in BOTH dims on average (a file that
    # straddles a top-level curve boundary legitimately spans one dim, so
    # the assertion is on the mean, not per file; unclustered would be ~999)
    spans = {"x": [], "y": []}
    for f in sorted(files_after - files_before):
        md = pq.ParquetFile(f).metadata
        for c in spans:
            idx = md.schema.names.index(c)
            lo = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
            hi = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
            spans[c].append(hi - lo)
    for c, vals in spans.items():
        assert sum(vals) / len(vals) < 850, (c, vals)


def test_stream_bloom_decontamination_gate_equals_batch(spark):
    """The bloom gate is a stateless predicate (bitmap = array literal in
    the closure), so streaming prep with eval_bloom emits exactly the batch
    rows: quality-pass minus bloom-contaminated, then redacted."""
    from healthcare_data_pipeline_spark.operators.decontaminate import (
        collect_bloom,
        contaminated_ids,
    )
    from healthcare_data_pipeline_spark.operators.quality import quality_predicate
    from healthcare_data_pipeline_spark.operators.redact import redact_pii
    from healthcare_data_pipeline_spark.streaming import ingest as ing

    d = table(spark, SF_DIR, "documents")
    ev = d.filter(F.col("source") == "src0")
    words = collect_bloom(ev, n=3)
    stream = ing.prep_stream(
        ing.read_documents_stream(spark, SF_DIR), eval_bloom=words, bloom_ngram=3
    )
    stv.run_to_memory(stream.select("doc_id", "text"), "bloom_prep_out", output_mode="append")
    got = {
        (r.doc_id, r.text) for r in spark.sql("SELECT * FROM bloom_prep_out").collect()
    }
    passing = d.filter(quality_predicate(min_stopword_ratio=0.01))
    bad = contaminated_ids(passing, ev, mode="bloom", n=3)
    batch = redact_pii(passing.join(F.broadcast(bad), "doc_id", "left_anti"))
    want = {(r.doc_id, r.text) for r in batch.select("doc_id", "text").collect()}
    assert got == want and len(got) > 0
    # the gate actually dropped something (src0 text overlaps other sources
    # in the synthetic corpus)
    n_without = passing.count()
    assert len({g[0] for g in got}) < n_without


def test_session_window_state_is_bounded_by_watermark_eviction(spark, tmp_path):
    """The state-store GROWTH contract (r9 verdict task 6): value-equality
    tests can't see a state leak — a session-window query that never evicts
    still emits correct rows, it just OOMs at 100 TB.  Replay the events
    table as 10 time-ordered micro-batches (30 days of event time, so the
    watermark advances ~3 days per batch) and assert from the per-batch
    StreamingQueryProgress that closed sessions actually LEAVE the store:

    - eviction happens repeatedly (>= 3 batches report numRowsRemoved > 0);
    - the store never holds session history: peak numRowsTotal stays well
      under the total session count the query emits (bounded by the
      watermark horizon, not by stream length);
    - the watermark advances across batches (the eviction driver).
    """
    import time as _time

    from healthcare_data_pipeline_spark.streaming.metrics import record_progress

    split_dir = stv.split_events_for_microbatches(
        spark, SF_DIR, str(tmp_path / "ev_split_state"), n_files=10
    )
    stream = stv.session_agg(
        stv.read_events_stream_microbatched(spark, split_dir),
        gap="30 minutes",
        watermark="10 minutes",
    )
    with record_progress(spark) as rec:
        q = (
            stream.writeStream.format("memory")
            .queryName("session_state_bound")
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        for _ in range(100):
            if rec.terminated:
                break
            _time.sleep(0.1)

    n_sessions = spark.sql("SELECT COUNT(*) AS n FROM session_state_bound").collect()[0]["n"]
    assert n_sessions > 100  # the corpus sessionizes richly (q26's shadow)

    state = [
        (p.get("eventTime", {}).get("watermark"), p["stateOperators"][0])
        for p in rec.progress
        if p.get("stateOperators") and p.get("numInputRows", 0) > 0
    ]
    assert len(state) >= 5  # genuinely multi-batch
    watermarks = [w for w, _ in state if w]
    assert sorted(watermarks) == watermarks and len(set(watermarks)) >= 3

    eviction_batches = sum(1 for _, s in state if int(s.get("numRowsRemoved", 0)) > 0)
    assert eviction_batches >= 3, f"eviction cycles: {eviction_batches}"
    total_removed = sum(int(s.get("numRowsRemoved", 0)) for _, s in state)
    assert total_removed > 0.5 * n_sessions  # most sessions were evicted, not retained

    peak = max(int(s.get("numRowsTotal", 0)) for _, s in state)
    assert 0 < peak < 0.6 * n_sessions, (
        f"peak state rows {peak} vs {n_sessions} sessions — state must be bounded "
        "by the watermark horizon, not accumulate the stream's history"
    )


def test_stream_ingest_fuzzy_decontaminates_each_batch(spark, tmp_path):
    """eval_df composes fuzzy decontamination into the ingest foreachBatch:
    a near-verbatim benchmark leak (one token edited — zero impact on most
    bands) is dropped BEFORE the corpus and its indexes see it, while
    unrelated docs ingest normally."""
    from healthcare_data_pipeline_spark.streaming import ingest as ing

    src = str(tmp_path / "doc_src_fz")
    os.makedirs(src)
    schema = "doc_id long, text string"
    bench = " ".join(f"benchtok{i}" for i in range(60))
    leak = bench.replace("benchtok30", "edited30")  # near-dup, not exact
    keep = " ".join(f"cleantok{i}" for i in range(60))

    def stream():
        return (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "*.parquet")
            .option("recursiveFileLookup", "true")
            .parquet(src)
        )

    corpus, ckpt = str(tmp_path / "corpus_fz"), str(tmp_path / "ckpt_fz")
    ev = spark.createDataFrame([(900, bench)], schema)
    spark.createDataFrame([(1, leak), (2, keep)], schema).coalesce(1).write.parquet(
        os.path.join(src, "b1")
    )
    ing.run_stream_dedup_ingest(stream(), corpus, ckpt, eval_df=ev)
    assert [r.doc_id for r in ing.read_corpus(spark, corpus).collect()] == [2]
    # the leak never reached the band index either: re-ingesting the EXACT
    # benchmark text (no eval gate this time) is still novel to the index
    # only through the decontamination gate, so gate it again and ingest a
    # fresh clean doc to prove the pipeline keeps flowing
    keep2 = " ".join(f"freshtok{i}" for i in range(60))
    spark.createDataFrame([(3, keep2)], schema).coalesce(1).write.parquet(
        os.path.join(src, "b2")
    )
    ing.run_stream_dedup_ingest(stream(), corpus, ckpt, eval_df=ev)
    assert sorted(r.doc_id for r in ing.read_corpus(spark, corpus).collect()) == [2, 3]

def test_stream_ingest_fast_hasher_and_kwargs_passthrough(spark, tmp_path):
    """r11 ADVICE: a hasher='fast' ingest must not pay md5 twice per batch —
    the fuzzy decon defaults to the ingest's hasher; decontaminate_kwargs
    passes through (an explicit fuzzy_hasher override wins); and the eval
    band index is computed once up front, not per micro-batch."""
    from healthcare_data_pipeline_spark.streaming import ingest as ing

    src = str(tmp_path / "doc_src_fh")
    os.makedirs(src)
    schema = "doc_id long, text string"
    bench = " ".join(f"benchtok{i}" for i in range(60))
    leak = bench.replace("benchtok30", "edited30")
    keep = " ".join(f"cleantok{i}" for i in range(60))

    def stream():
        return (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "*.parquet")
            .option("recursiveFileLookup", "true")
            .parquet(src)
        )

    ev = spark.createDataFrame([(900, bench)], schema)
    spark.createDataFrame([(1, leak), (2, keep)], schema).coalesce(1).write.parquet(
        os.path.join(src, "b1")
    )
    corpus, ckpt = str(tmp_path / "corpus_fh"), str(tmp_path / "ckpt_fh")
    ing.run_stream_dedup_ingest(stream(), corpus, ckpt, hasher="fast", eval_df=ev)
    assert [r.doc_id for r in ing.read_corpus(spark, corpus).collect()] == [2]

    # kwargs passthrough: min_shared_bands too high -> the leak survives
    corpus2, ckpt2 = str(tmp_path / "corpus_fh2"), str(tmp_path / "ckpt_fh2")
    ing.run_stream_dedup_ingest(
        stream(), corpus2, ckpt2, hasher="fast", eval_df=ev,
        decontaminate_kwargs={"min_shared_bands": 5},  # > PMH_BANDS: nothing fires
    )
    assert sorted(r.doc_id for r in ing.read_corpus(spark, corpus2).collect()) == [1, 2]

def test_stream_prep_c4_gate_equals_batch(spark):
    """use_c4 in the streaming prep gate: since the join-free rewrite,
    c4_filter is one stateless predicate + projection, so the stream emits
    exactly the batch composition's rows — C4-cleaned text included."""
    from healthcare_data_pipeline_spark.operators.quality import (
        c4_filter,
        quality_predicate,
    )
    from healthcare_data_pipeline_spark.operators.redact import redact_pii
    from healthcare_data_pipeline_spark.streaming import ingest as ing

    docs = table(spark, SF_DIR, "documents")
    # re-line the corpus so the C4 battery has passing pages (the synthetic
    # text is single-line): every 8th token ends a sentence, and docs whose
    # id % 13 == 5 get a curly-brace code line planted (page-dropped)
    lined = (
        "concat(array_join(transform(split(text, ' '), (t, i) -> "
        "CASE WHEN i % 8 = 7 THEN concat(t, ' .\\n') ELSE t END), ' '), "
        "CASE WHEN doc_id % 13 = 5 THEN '\\nvar x = { 1 };' ELSE '' END)"
    )
    src = docs.selectExpr("doc_id", f"{lined} AS text", "source")
    tmp = f"{spark.conf.get('spark.sql.warehouse.dir').removeprefix('file:')}/c4_stream_src"
    src.write.mode("overwrite").parquet(tmp)
    stream_src = spark.readStream.schema("doc_id long, text string, source string").parquet(tmp)
    stream = ing.prep_stream(stream_src, use_c4=True)
    stv.run_to_memory(stream.select("doc_id", "text"), "prep_c4_out", output_mode="append")
    got = {(r.doc_id, r.text) for r in spark.sql("SELECT * FROM prep_c4_out").collect()}
    batch = redact_pii(
        c4_filter(spark.read.parquet(tmp)).filter(
            quality_predicate(min_stopword_ratio=0.01)
        )
    )
    want = {(r.doc_id, r.text) for r in batch.select("doc_id", "text").collect()}
    assert got == want and len(got) > 0
    # the curly-brace plants were page-dropped, and surviving text is cleaned
    assert all(d % 13 != 5 for d, _ in got)
    assert all("{" not in t for _, t in got)


def test_c4_filter_is_join_free(spark):
    """The in-place C4 gate must stay one scalar predicate + projection:
    no join, no exchange — the property that makes it streamable and free
    in the batch front door."""
    from healthcare_data_pipeline_spark.operators.quality import c4_filter

    d = table(spark, SF_DIR, "documents")
    plan = c4_filter(d)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Exchange" not in plan


def test_ingest_setup_failure_unpersists_eval_bands(spark, tmp_path):
    """The r12 ADVICE leak: the eval band index is persisted+materialized
    BEFORE the stream starts — if writeStream setup then raises (here: the
    checkpoint path is a FILE), the cached relation must be unpersisted, not
    leaked for the session."""
    import pytest

    from healthcare_data_pipeline_spark.streaming import ingest as ing

    src = str(tmp_path / "doc_src")
    os.makedirs(src)
    schema = "doc_id long, text string"
    spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog in the park")], schema
    ).coalesce(1).write.parquet(os.path.join(src, "b1"))
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    eval_df = spark.createDataFrame(
        [(100, "benchmark question about the lazy dog in the park today")], schema
    )
    bad_ckpt = str(tmp_path / "ckpt_is_a_file")
    with open(bad_ckpt, "w") as fh:
        fh.write("not a directory")

    def n_cached():
        return spark.sparkContext._jsc.getPersistentRDDs().size()

    before = n_cached()
    with pytest.raises(Exception):
        ing.run_stream_dedup_ingest(
            stream, str(tmp_path / "corpus"), bad_ckpt, eval_df=eval_df
        )
    assert n_cached() == before, "eval band cache leaked past a failed setup"


def test_stream_prep_domain_blocklist_equals_batch(spark):
    """url_col + domain_blocklist in the streaming prep gate: the blocklist
    is the STATELESS domain_blocklist_predicate (list rides the task closure
    like eval_bloom), runs before every other stage, and the stream emits
    exactly the batch composition's rows; the knob demands url_col."""
    import pytest

    from healthcare_data_pipeline_spark.operators.quality import quality_predicate
    from healthcare_data_pipeline_spark.operators.redact import redact_pii
    from healthcare_data_pipeline_spark.operators.web import domain_blocklist_predicate
    from healthcare_data_pipeline_spark.streaming import ingest as ing

    docs = table(spark, SF_DIR, "documents")
    src = docs.selectExpr(
        "doc_id",
        "text",
        "source",
        "printf('https://sub.%s-%d.net/x', source, doc_id % 7) AS url",
    )
    tmp = f"{spark.conf.get('spark.sql.warehouse.dir').removeprefix('file:')}/web_stream_src"
    src.write.mode("overwrite").parquet(tmp)
    stream_src = spark.readStream.schema(
        "doc_id long, text string, source string, url string"
    ).parquet(tmp)
    blocked = ("src0-0.net", "sub.src1-1.net")
    stream = ing.prep_stream(stream_src, url_col="url", domain_blocklist=blocked)
    stv.run_to_memory(stream.select("doc_id", "url"), "prep_web_out", output_mode="append")
    got = {(r.doc_id, r.url) for r in spark.sql("SELECT * FROM prep_web_out").collect()}
    batch = redact_pii(
        spark.read.parquet(tmp)
        .filter(domain_blocklist_predicate(blocked, url_col="url"))
        .filter(quality_predicate(min_stopword_ratio=0.01))
    )
    want = {(r.doc_id, r.url) for r in batch.select("doc_id", "url").collect()}
    assert got == want and len(got) > 0
    assert all("src0-0.net" not in u and "src1-1.net" not in u for _, u in got)

    with pytest.raises(ValueError, match="url_col"):
        ing.prep_stream(stream_src, domain_blocklist=blocked)
