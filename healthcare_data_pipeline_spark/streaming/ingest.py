"""Streaming corpus ingestion with incremental dedup — the 100 TB/day path.

A training-data corpus grows by continuous document arrival; re-running batch
dedup over the whole corpus per drop is O(corpus) every time.  This module
wires ``operators.dedup_corpus.dedup_incremental`` into a ``foreachBatch``
sink: each micro-batch is deduplicated against the corpus's two compact
stored indexes (fingerprints + LSH band buckets), and the survivors — docs
plus their index rows — are APPENDED as a new immutable segment.  Per-batch
cost is O(batch) on both the probe side and the write side; nothing
corpus-sized is ever rewritten on the hot path.

Corpus state is a log of immutable segments::

    <corpus_dir>/segments/
        seg-000000000000/      # one per committed micro-batch
            docs/    surviving documents (parquet)
            bands/   their band_buckets index rows
            fps/     their corpus_fingerprints rows
            _COMMITTED_BATCH   # the batchId, written BEFORE the publish rename

Exactly-once per batch needs only ONE atomic rename: the segment is staged
fully (marker included) under ``seg-<id>.tmp`` and published by renaming it
to its final name — a crash before the rename leaves an ignorable ``.tmp``
orphan, a crash after it leaves a committed segment whose embedded batchId
makes the replayed batch a no-op.  No crash point can lose a previous batch,
because previous batches are never touched.

Segment count grows with batch count, so the log is compacted.  The automatic
path (``run_stream_dedup_ingest(compact_every=N)``) is SIZE-TIERED
(``compact_tiered``): segments are bucketed by size and a merge fires only
when a bucket holds N similar-sized segments, folding that tier and touching
nothing else — fresh batches fold into mediums, mediums into larges,
LSM-style, so the worst-case compaction pause is bounded by the tier size no
matter how big the corpus grows, and each byte is rewritten only O(log)
times.  ``compact()`` remains the explicit full fold (all segments -> one)
for cold-corpus small-file hygiene; it rewrites O(corpus) and uses the
whole-log rename-aside swap (stage ``segments.tmp`` ->
``segments -> segments.old`` -> ``segments.tmp -> segments`` -> drop aside).
Tiered compaction instead journals {merged, members} so only the tier's
members are ever at risk; ``_recover`` finishes either mechanism from any
crash window on restart.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from healthcare_data_pipeline_spark.operators.dedup_corpus import (
    band_buckets,
    corpus_fingerprints,
    dedup_incremental,
)

_BANDS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("band", T.IntegerType()),
        T.StructField("bucket", T.StringType()),
    ]
)
_FPS_SCHEMA = T.StructType([T.StructField("fingerprint", T.StringType())])

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

_MARKER = "_COMMITTED_BATCH"
_COMPACTION_JOURNAL = "_COMPACTION"


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the documents parquet."""
    return (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "documents.parquet")
        .load(sf_dir)
    )


def prep_stream(
    docs: DataFrame,
    weights: dict[str, float] | None = None,
    min_stopword_ratio: float | None = 0.01,
    split_fractions: dict[str, float] | None = None,
    eval_bloom: list[int] | None = None,
    bloom_ngram: int | None = None,
    bloom_hasher: str | None = None,
    use_c4: bool = False,
    c4_blocklist: tuple[str, ...] = (),
    url_col: str | None = None,
    domain_blocklist: tuple[str, ...] = (),
    domain_psl_suffixes: tuple[str, ...] = (),
) -> DataFrame:
    """The streaming corpus-prep gate: quality filter -> optional benchmark
    decontamination -> PII redaction -> optional mixture gate -> optional
    train/val/test split.  Every stage is a STATELESS row-level expression,
    so the exact batch operators run unchanged on an unbounded stream — no
    watermark, no state store, append-mode safe.  The split in particular is
    safe to assign at ingest time because ``hash_split`` is a pure function
    of the doc id: a document's split never depends on what else has
    arrived, so replays and late re-ingests assign identically.  (Dedup, the
    stateful stage, is `run_stream_dedup_ingest`'s job downstream.)

    ``eval_bloom`` (from ``operators.decontaminate.collect_bloom``) drops
    documents sharing a ``bloom_ngram``-gram with the eval suite.  The
    bitmap is a fixed-size array literal in the task closure, so even this
    normally join-shaped stage stays a stateless predicate — and it runs
    BEFORE redaction, which rewrites text and could otherwise mask a
    benchmark collision.  ``bloom_ngram``/``bloom_hasher`` default to the
    bitmap's own build-time tag (``collect_bloom`` returns a tagged list);
    explicit values that contradict the tag raise in ``flag_bloom`` — a
    mismatched probe silently produces false negatives, the one failure
    mode decontamination exists to prevent.

    ``use_c4`` runs the C4 line battery FIRST (its published slot, same as
    ``prep_corpus(use_c4=)``): since the r12 join-free rewrite,
    ``c4_filter`` is one scalar predicate + projection — stateless, so it
    streams unchanged; the page gate reads the original text and every
    later stage consumes the line-cleaned rewrite.

    ``url_col`` + ``domain_blocklist`` runs the domain/host blocklist
    BEFORE everything (the prep_corpus order — provenance is the cheapest
    gate) as the stateless ``domain_blocklist_predicate`` — the
    curation-sized list rides the task closure like ``eval_bloom``, so even
    this normally join-shaped stage stays an append-safe row predicate.
    ``domain_psl_suffixes`` (r14) keys the domain on PSL-exact registrable
    domains via the literal-closure longest match
    (``registrable_domain_literal_col``) — the stream-side twin of
    ``prep_corpus(domain_psl_table=)``, keeping stream == batch doc-for-doc
    for PSL-keyed pipelines.
    (URL DEDUP is stateful and belongs to ``run_stream_dedup_ingest``'s
    foreachBatch side, like content dedup.)"""
    from healthcare_data_pipeline_spark.operators.decontaminate import flag_bloom
    from healthcare_data_pipeline_spark.operators.mixture import hash_split, mixture_sample
    from healthcare_data_pipeline_spark.operators.quality import (
        c4_filter,
        quality_predicate,
    )
    from healthcare_data_pipeline_spark.operators.redact import redact_pii

    if domain_blocklist and url_col is None:
        raise ValueError("url_col is required for domain_blocklist")
    out = docs
    if domain_blocklist:
        from healthcare_data_pipeline_spark.operators.web import (
            domain_blocklist_predicate,
        )

        out = out.filter(
            domain_blocklist_predicate(
                domain_blocklist, url_col=url_col, psl_suffixes=domain_psl_suffixes
            )
        )
    if use_c4:
        out = c4_filter(out, blocklist=c4_blocklist)
    out = out.filter(quality_predicate(min_stopword_ratio=min_stopword_ratio))
    if eval_bloom is not None:
        out = (
            flag_bloom(out, eval_bloom, n=bloom_ngram, hasher=bloom_hasher)
            .filter(~F.col("__hit"))
            .drop("__hit")
        )
    out = redact_pii(out)
    if weights is not None:
        out = mixture_sample(out, weights)
    if split_fractions is not None:
        out = hash_split(out, split_fractions)
    return out


def _segments_root(corpus_dir: str) -> str:
    return os.path.join(corpus_dir, "segments")


def _read_journal(corpus_dir: str) -> dict | None:
    """The tiered-compaction journal, or None.  The journal is only ever
    written complete (staged as ``.tmp`` + atomic rename), so a present file
    is trustworthy; corrupt content is treated as absent."""
    import json

    path = os.path.join(_segments_root(corpus_dir), _COMPACTION_JOURNAL)
    try:
        with open(path, encoding="utf-8") as fh:
            info = json.load(fh)
        if isinstance(info, dict) and "merged" in info and "members" in info:
            return info
    except (OSError, ValueError):
        pass
    return None


def _committed_segments(corpus_dir: str) -> list[str]:
    """Committed segment directories, oldest first.  A directory without the
    marker is an uncommitted orphan (crash before publish) and is ignored.

    Journal awareness makes reads correct in the tiered-compaction crash
    window: once the journal's merged segment is committed, the member
    segments it replaced are DEAD even if their directories still exist
    (crash between publish and member deletion) — listing them would
    double-count every merged document."""
    root = _segments_root(corpus_dir)
    if not os.path.isdir(root):
        return []
    dead: set[str] = set()
    j = _read_journal(corpus_dir)
    if j is not None and os.path.exists(os.path.join(root, j["merged"], _MARKER)):
        dead = set(j["members"])
    out = []
    for name in sorted(os.listdir(root)):
        seg = os.path.join(root, name)
        if (
            name.startswith("seg-")
            and not name.endswith(".tmp")
            and name not in dead
            and os.path.exists(os.path.join(seg, _MARKER))
        ):
            out.append(seg)
    return out


def _max_committed_batch(corpus_dir: str) -> int | None:
    ids = []
    for seg in _committed_segments(corpus_dir):
        try:
            with open(os.path.join(seg, _MARKER)) as fh:
                ids.append(int(fh.read().strip()))
        except (OSError, ValueError):
            continue
    return max(ids) if ids else None


def _recover(corpus_dir: str) -> None:
    """Finish any interrupted transition.

    * per-batch publish: drop ``seg-*.tmp`` staging orphans (their batch will
      be replayed from the checkpoint);
    * full compaction: restore ``segments`` from ``segments.old`` if the swap
      crashed mid-way, else drop the stale aside;
    * tiered compaction: if the journal's merged segment is committed, finish
      forward (delete the dead members, drop the journal); if not, roll back
      (drop the journal — the staged ``.tmp`` merge falls to the generic
      orphan cleanup and the members remain the live corpus).
    """
    root = _segments_root(corpus_dir)
    aside = root + ".old"
    if os.path.exists(aside):
        if os.path.exists(root):
            shutil.rmtree(aside)
        else:
            os.rename(aside, root)
    shutil.rmtree(root + ".tmp", ignore_errors=True)
    j = _read_journal(corpus_dir)
    if j is not None:
        if os.path.exists(os.path.join(root, j["merged"], _MARKER)):
            for name in j["members"]:
                shutil.rmtree(os.path.join(root, name), ignore_errors=True)
        os.remove(os.path.join(root, _COMPACTION_JOURNAL))
    if os.path.isdir(root):
        for name in os.listdir(root):
            if name.endswith(".tmp"):
                shutil.rmtree(os.path.join(root, name), ignore_errors=True)
        try:
            os.remove(os.path.join(root, _COMPACTION_JOURNAL + ".tmp"))
        except OSError:
            pass


def _load_state(
    spark: SparkSession, corpus_dir: str
) -> tuple[DataFrame, DataFrame] | tuple[None, None]:
    """(bands, fps) unioned across committed segments; (None, None) when the
    corpus is empty (first batch bootstraps it)."""
    segs = _committed_segments(corpus_dir)
    if not segs:
        return None, None
    return (
        spark.read.parquet(*[os.path.join(s, "bands") for s in segs]),
        spark.read.parquet(*[os.path.join(s, "fps") for s in segs]),
    )


def run_stream_dedup_ingest(
    stream_df: DataFrame,
    corpus_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    hasher: str = "portable",
    compact_every: int = 32,
    progress_path: str | None = None,
    eval_df: DataFrame | None = None,
    decontaminate_mode: str = "fuzzy",
    decontaminate_kwargs: dict | None = None,
) -> None:
    """Drain ``stream_df`` (a documents stream) into a deduplicated corpus.

    Blocking convenience wrapper: starts the query, processes everything
    available, stops — call repeatedly with the same ``checkpoint_dir`` to
    resume (replayed batches are skipped idempotently).  When any size tier
    accumulates ``compact_every`` similar-sized segments, that TIER is folded
    into one (``compact_tiered`` — pause bounded by tier size, never the
    corpus).  ``progress_path`` appends per-batch StreamingQueryProgress
    JSONL (streaming.metrics) for dashboards/alerting.

    ``eval_df`` composes benchmark decontamination into the same
    foreachBatch pass, BEFORE dedup indexing (a leaked benchmark must never
    enter the corpus OR its band/fingerprint indexes): per micro-batch cost
    is O(batch) — the batch signs once against the broadcast eval index.
    The default ``decontaminate_mode="fuzzy"`` (dd25) also stops
    lightly-edited leaks, the variant ``prep_stream``'s stateless Bloom
    gate cannot see (aggregation-shaped, so it belongs HERE, where
    foreachBatch allows per-batch joins, not in the row-predicate gate).

    ``decontaminate_kwargs`` passes through to ``decontaminate`` (n,
    m_bits, min_shared_bands, ...).  Unless overridden there, the fuzzy
    signing uses the INGEST's ``hasher`` — a ``hasher="fast"`` ingest
    should not silently pay md5 twice per batch.  The eval side's band
    index is computed and persisted ONCE before the stream starts and
    reused by every micro-batch (the static side never changes), instead
    of re-signing the eval corpus per batch.
    """
    extra = dict(decontaminate_kwargs or {})
    eval_bands_cached = None

    def _setup_eval_bands() -> None:
        # called INSIDE the try that owns the unpersist: if writeStream setup
        # (recorder attach, query start) raises after the persist, the cached
        # relation must not leak for the session (r12 ADVICE fix)
        nonlocal eval_bands_cached
        if eval_df is not None and decontaminate_mode == "fuzzy":
            extra.setdefault("fuzzy_hasher", hasher)
            if "eval_bands" not in extra:
                from healthcare_data_pipeline_spark.operators.dedup_corpus import (
                    band_buckets as _bb,
                )

                eval_bands_cached = _bb(
                    eval_df, id_col=id_col, text_col=text_col,
                    hasher=extra["fuzzy_hasher"],
                ).persist()
                eval_bands_cached.count()  # materialize before the stream starts
                extra["eval_bands"] = eval_bands_cached

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        _recover(corpus_dir)
        done = _max_committed_batch(corpus_dir)
        if done is not None and batch_id <= done:
            return  # replayed batch — already ingested
        if eval_df is not None:
            from healthcare_data_pipeline_spark.operators.decontaminate import (
                decontaminate,
            )

            batch_df = decontaminate(
                batch_df,
                eval_df,
                mode=decontaminate_mode,
                id_col=id_col,
                text_col=text_col,
                **extra,
            )
        bands, fps = _load_state(spark, corpus_dir)
        if bands is None:
            bands = spark.createDataFrame([], _BANDS_SCHEMA)
            fps = spark.createDataFrame([], _FPS_SCHEMA)
        survivors = dedup_incremental(
            batch_df, bands, fps, id_col=id_col, text_col=text_col, hasher=hasher
        )
        seg = os.path.join(_segments_root(corpus_dir), f"seg-{batch_id:012d}")
        tmp = seg + ".tmp"
        os.makedirs(_segments_root(corpus_dir), exist_ok=True)
        # Stage the WHOLE segment (marker included), then publish with one
        # atomic rename: no crash point leaves a half-visible segment, and
        # previous segments are never touched — the write side is O(batch).
        # The dedup plan runs ONCE (the docs write); bands/fps derive from the
        # just-written parquet, so they re-scan O(batch) bytes instead of
        # re-running the probe joins (and stay correct on executor loss,
        # unlike a cache/localCheckpoint of the un-materialized plan).
        survivors.write.parquet(os.path.join(tmp, "docs"))
        written = spark.read.parquet(os.path.join(tmp, "docs"))
        band_buckets(written, id_col=id_col, text_col=text_col, hasher=hasher).write.parquet(
            os.path.join(tmp, "bands")
        )
        corpus_fingerprints(written, text_col=text_col).write.parquet(
            os.path.join(tmp, "fps")
        )
        with open(os.path.join(tmp, _MARKER), "w") as fh:
            fh.write(str(batch_id))
        os.rename(tmp, seg)
        if compact_every:
            # Size-tiered: no-op unless some tier holds >= compact_every
            # similar-sized segments, so a compaction pause is bounded by the
            # tier's member size, never the corpus (compact() remains the
            # explicit full-fold for small-file hygiene on cold corpora).
            compact_tiered(spark, corpus_dir, min_merge=compact_every)

    os.makedirs(corpus_dir, exist_ok=True)
    recorder_cm = None
    try:
        _setup_eval_bands()
        if progress_path:
            from healthcare_data_pipeline_spark.streaming.metrics import record_progress

            recorder_cm = record_progress(stream_df.sparkSession, progress_path)
            recorder_cm.__enter__()
        q = (
            stream_df.writeStream.outputMode("append")
            .foreachBatch(process)
            .option("checkpointLocation", checkpoint_dir)
            .start()
        )
    except BaseException:
        # release EVERYTHING setup acquired before re-raising: the cached
        # eval band relation AND the attached progress listener (a start()
        # failure after the recorder attach would otherwise leave the
        # listener registered on the session for its lifetime)
        if eval_bands_cached is not None:
            eval_bands_cached.unpersist()
        if recorder_cm is not None:
            recorder_cm.__exit__(None, None, None)
        raise
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        if eval_bands_cached is not None:
            eval_bands_cached.unpersist()
        if recorder_cm is not None:
            # progress events are delivered asynchronously on the listener
            # bus; give queued events a bounded window to land before
            # detaching (detach drops undelivered events)
            import time

            deadline = time.monotonic() + 10
            while time.monotonic() < deadline and not recorder_cm.recorder.terminated:
                time.sleep(0.1)
            recorder_cm.__exit__(None, None, None)


def compact(spark: SparkSession, corpus_dir: str) -> None:
    """Fold all committed segments into one (small-file hygiene: the probe
    reads N segment directories until compaction folds them).

    Rename-aside swap of the whole ``segments`` log: stage the merged segment
    under ``segments.tmp``, move the live log aside, publish, drop the aside.
    ``_recover`` completes the swap from either crash window, so the corpus
    is never lost and replay detection (max committed batchId, preserved in
    the merged marker) keeps working.
    """
    segs = _committed_segments(corpus_dir)
    if len(segs) <= 1:
        return
    max_id = _max_committed_batch(corpus_dir)
    root = _segments_root(corpus_dir)
    staged_root = root + ".tmp"
    shutil.rmtree(staged_root, ignore_errors=True)
    merged = os.path.join(staged_root, f"seg-{max_id:012d}")
    for piece in ("docs", "bands", "fps"):
        spark.read.parquet(*[os.path.join(s, piece) for s in segs]).write.parquet(
            os.path.join(merged, piece)
        )
    with open(os.path.join(merged, _MARKER), "w") as fh:
        fh.write(str(max_id))
    aside = root + ".old"
    os.rename(root, aside)
    os.rename(staged_root, root)
    shutil.rmtree(aside)


def _segment_bytes(seg: str) -> int:
    total = 0
    for dirpath, _dirs, files in os.walk(seg):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(dirpath, f))
            except OSError:
                pass
    return total


def compact_tiered(
    spark: SparkSession,
    corpus_dir: str,
    min_merge: int = 4,
    max_merge: int | None = None,
    tier_factor: int = 4,
) -> int:
    """Size-tiered compaction: fold ONE tier of similar-sized segments and
    leave everything else untouched.  Returns the bytes rewritten (0: no
    tier was full — the call was a no-op).

    ``compact()`` folds the whole log — an O(corpus) stop-the-world rewrite
    whose pause grows with the corpus no matter how it's amortized.  Here
    segments are bucketed by ``floor(log_tier_factor(bytes))`` and a merge
    happens only when some bucket holds >= ``min_merge`` segments, folding at
    most ``max_merge`` (default ``2*min_merge``) of that bucket's smallest
    members.  Fresh micro-batch segments fold into mediums, mediums into
    larges, LSM-style: bytes rewritten per compaction are bounded by the
    tier's member size x ``max_merge`` — never the corpus — and each byte is
    rewritten only O(log) times over its lifetime.  Segment count stays
    O(min_merge x log(corpus/batch)).

    Crash safety (single writer, same discipline family as the per-batch
    publish): the merged segment is staged fully under ``<name>.tmp``, a
    journal ``{merged, members}`` is published by atomic rename, the staged
    segment is renamed live, the members are deleted, the journal dropped.
    Before the journal lands a crash leaves only an ignorable ``.tmp``; after
    it, ``_committed_segments`` treats the members as dead the moment the
    merged segment is committed (no double-count window) and ``_recover``
    rolls the journal forward or back.  The merged marker carries the
    members' max batchId, so replay detection is unchanged.
    """
    if max_merge is None:
        max_merge = 2 * min_merge
    segs = _committed_segments(corpus_dir)
    if len(segs) < min_merge:
        return 0
    import math

    sized = sorted((_segment_bytes(s), s) for s in segs)

    def bucket(nbytes: int) -> int:
        return int(math.log(max(nbytes, 1), tier_factor))

    members: list[str] | None = None
    member_bytes = 0
    from itertools import groupby

    for _b, grp in groupby(sized, key=lambda t: bucket(t[0])):
        tier = list(grp)
        if len(tier) >= min_merge:
            tier = tier[:max_merge]
            members = [s for _, s in tier]
            member_bytes = sum(b for b, _ in tier)
            break
    if members is None:
        return 0

    import json

    root = _segments_root(corpus_dir)
    member_names = [os.path.basename(m) for m in members]
    ids = []
    for m in members:
        with open(os.path.join(m, _MARKER)) as fh:
            ids.append(int(fh.read().strip()))
    max_id = max(ids)
    merged_name = f"seg-{max_id:012d}"
    gen = 0
    while os.path.exists(os.path.join(root, merged_name)) or merged_name in member_names:
        gen += 1
        merged_name = f"seg-{max_id:012d}c{gen}"
    staged = os.path.join(root, merged_name + ".tmp")
    shutil.rmtree(staged, ignore_errors=True)
    for piece in ("docs", "bands", "fps"):
        spark.read.parquet(*[os.path.join(m, piece) for m in members]).write.parquet(
            os.path.join(staged, piece)
        )
    with open(os.path.join(staged, _MARKER), "w") as fh:
        fh.write(str(max_id))
    journal = os.path.join(root, _COMPACTION_JOURNAL)
    with open(journal + ".tmp", "w", encoding="utf-8") as fh:
        json.dump({"merged": merged_name, "members": member_names}, fh)
    os.rename(journal + ".tmp", journal)
    os.rename(staged, os.path.join(root, merged_name))
    for m in members:
        shutil.rmtree(m, ignore_errors=True)
    os.remove(journal)
    return sum(b for b, _ in sized[: len(members)])


def read_corpus(spark: SparkSession, corpus_dir: str) -> DataFrame:
    """The current deduplicated corpus (union of all committed segments).

    Concurrency contract: the segment log is SINGLE-WRITER, and a returned
    DataFrame is lazy over the segment paths listed at call time — a
    compaction that runs while such a DataFrame is still unconsumed deletes
    files under it (tiered: just the folded tier's members; ``compact()``:
    the whole previous log) and the read fails with missing-file errors.
    Consume or re-create readers across compaction points; don't run
    ``compact*()`` concurrently with a live external reader.  (The ingest
    loop itself is safe: it compacts only between batches, after the batch's
    own reads are fully materialized.)
    """
    segs = _committed_segments(corpus_dir)
    if not segs and os.path.exists(_segments_root(corpus_dir) + ".old"):
        # ``compact()``'s swap is two renames (segments -> aside, tmp ->
        # segments); a listing that lands between them sees no log at all.
        # The aside marks that window unambiguously — wait it out briefly
        # instead of erroring on a microseconds-wide race.
        import time

        for _ in range(250):
            time.sleep(0.02)
            segs = _committed_segments(corpus_dir)
            if segs:
                break
    if not segs:
        raise FileNotFoundError(f"no committed corpus segments under {corpus_dir}")
    return spark.read.parquet(*[os.path.join(s, "docs") for s in segs])
