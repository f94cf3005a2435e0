"""Decontamination contracts: collision definitions, preservation, plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from healthcare_data_pipeline_spark.operators.decontaminate import decontaminate


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_mode_drops_normalized_duplicates(spark):
    train = _df(spark, [(1, "The  Cat sat"), (2, "something else entirely")])
    ev = _df(spark, [(100, "the cat   SAT")])  # same after normalize
    out = decontaminate(train, ev, mode="exact").collect()
    assert [r.doc_id for r in out] == [2]


def test_ngram_mode_drops_overlapping_docs(spark):
    train = _df(
        spark,
        [
            (1, "alpha beta gamma delta unrelated tail"),  # shares 'alpha beta gamma'
            (2, "zero overlap with anything here"),
            (3, "too short"),  # below n tokens -> no ngrams -> never contaminated
        ],
    )
    ev = _df(spark, [(100, "prefix alpha beta gamma suffix")])
    out = decontaminate(train, ev, mode="ngram", n=3)
    assert sorted(r.doc_id for r in out.collect()) == [2, 3]
    # all original columns preserved
    assert out.columns == ["doc_id", "text"]


def test_unknown_mode_raises(spark):
    d = _df(spark, [(1, "x")])
    with pytest.raises(ValueError, match="mode"):
        decontaminate(d, d, mode="nope")


def test_train_side_never_shuffles(spark):
    """The contaminated-id discovery and both joins are broadcast-side; the
    only exchange in the plan is the distinct over the (small) contaminated
    candidate set — the train corpus itself is map-side throughout."""
    from healthcare_data_pipeline_spark.catalog import table
    from healthcare_data_pipeline_spark.plans import simple_plan
    from tests.conftest import SF_DIR

    d = table(spark, SF_DIR, "documents")
    out = decontaminate(
        d.filter(F.col("source") != "src0"), d.filter(F.col("source") == "src0"), n=3
    )
    plan = simple_plan(out)
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2  # semi + anti
    # dd13 exhibits observable contamination on the synthetic corpus (shared
    # near-dups across sources) without being vacuous
    n_train = d.filter(F.col("source") != "src0").count()
    n_out = out.count()
    assert 0 < n_out < n_train


def test_contamination_report_counts_and_plan(spark):
    """The report's rates must reconcile with decontaminate's drop counts,
    and its joins stay broadcast-side like the operator it diagnoses."""
    from healthcare_data_pipeline_spark.catalog import table
    from healthcare_data_pipeline_spark.operators.decontaminate import contamination_report
    from healthcare_data_pipeline_spark.plans import simple_plan
    from tests.conftest import SF_DIR

    d = table(spark, SF_DIR, "documents")
    train = d.filter(F.col("source") != "src0")
    ev = d.filter(F.col("source") == "src0")
    rep = contamination_report(train, ev, n=3)
    plan = simple_plan(rep)
    assert "SortMergeJoin" not in plan and "BroadcastNestedLoopJoin" not in plan
    rows = {r.group: r for r in rep.collect()}
    assert sum(r.n_docs for r in rows.values()) == train.count()
    n_dropped = train.count() - decontaminate(train, ev, n=3).count()
    assert sum(r.n_contaminated for r in rows.values()) == n_dropped
    for r in rows.values():
        assert abs(r.contamination_rate - r.n_contaminated / r.n_docs) < 1e-12


def test_bloom_mode_never_misses(spark):
    """The direction that matters: every ngram-mode contaminated id is also
    bloom-flagged (no false negatives, by construction — a true collision's
    positions are all set by the eval gram itself)."""
    from healthcare_data_pipeline_spark.catalog import table
    from healthcare_data_pipeline_spark.operators.decontaminate import contaminated_ids
    from tests.conftest import SF_DIR

    d = table(spark, SF_DIR, "documents")
    train = d.filter(F.col("source") != "src0")
    ev = d.filter(F.col("source") == "src0")
    exact = {r.doc_id for r in contaminated_ids(train, ev, mode="ngram", n=3).collect()}
    bloom = {r.doc_id for r in contaminated_ids(train, ev, mode="bloom", n=3).collect()}
    assert exact, "synthetic corpus should exhibit contamination"
    assert exact <= bloom
    # at the default 2^20 bits the FP rate on this corpus is negligible:
    # the two modes should agree outright (deterministic, pinned by the data)
    assert bloom == exact


def test_bloom_small_bitmap_false_positives_are_supersets(spark):
    """Shrinking m_bits can only ADD flagged docs (more bit collisions),
    never drop one — monotone in the conservative direction."""
    from healthcare_data_pipeline_spark.catalog import table
    from healthcare_data_pipeline_spark.operators.decontaminate import contaminated_ids
    from tests.conftest import SF_DIR

    d = table(spark, SF_DIR, "documents")
    train = d.filter(F.col("source") != "src0")
    ev = d.filter(F.col("source") == "src0")
    big = {r.doc_id for r in contaminated_ids(train, ev, mode="bloom", n=3).collect()}
    small = {
        r.doc_id
        for r in contaminated_ids(train, ev, mode="bloom", n=3, m_bits=512).collect()
    }
    assert big <= small


def test_bloom_m_bits_validation(spark):
    from healthcare_data_pipeline_spark.operators.decontaminate import bloom_bitmap

    d = _df(spark, [(1, "a b c d")])
    with pytest.raises(ValueError, match="m_bits"):
        bloom_bitmap(d, m_bits=100)


def test_bloom_train_side_plan_never_shuffles_the_corpus(spark):
    """The 100 TB contract: the train corpus is map-side throughout — no
    SortMergeJoin anywhere; the only joins are the densify's range-left
    broadcast (eval-side bitmap build), the 1-row bitmap nested-loop
    broadcast (the documented scalar-combine pattern), and the broadcast
    anti-join on the small contaminated-id set.  Everything per-gram is a
    scalar expression, so the hit discovery stays inside codegen (the
    exists()-over-array alternative runs interpreted at ~2-4x — SCALE.md)."""
    from healthcare_data_pipeline_spark.catalog import table
    from healthcare_data_pipeline_spark.plans import simple_plan
    from tests.conftest import SF_DIR

    d = table(spark, SF_DIR, "documents")
    out = decontaminate(
        d.filter(F.col("source") != "src0"),
        d.filter(F.col("source") == "src0"),
        mode="bloom",
        n=3,
    )
    plan = simple_plan(out)
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") == 2  # densify range-left + id anti-join
    assert plan.count("BroadcastNestedLoopJoin") == 1  # the 1-row bitmap combine
    # empty eval side -> all-zero bitmap -> nothing flagged, no error
    empty_ev = d.filter(F.lit(False))
    n_train = d.filter(F.col("source") != "src0").count()
    assert (
        decontaminate(d.filter(F.col("source") != "src0"), empty_ev, mode="bloom").count()
        == n_train
    )


def test_flag_bloom_literal_matches_distributed_bitmap(spark):
    """collect_bloom + flag_bloom (the streaming closure form) flags exactly
    the ids the distributed-bitmap path flags — one construction, two
    delivery mechanisms."""
    from healthcare_data_pipeline_spark.catalog import table
    from healthcare_data_pipeline_spark.operators.decontaminate import (
        collect_bloom,
        contaminated_ids,
        flag_bloom,
    )
    from tests.conftest import SF_DIR

    d = table(spark, SF_DIR, "documents")
    train = d.filter(F.col("source") != "src0")
    ev = d.filter(F.col("source") == "src0")
    words = collect_bloom(ev, n=3)
    assert len(words) * 64 == 1 << 20  # default sizing
    lit_ids = {
        r.doc_id
        for r in flag_bloom(train, words, n=3).filter("__hit").select("doc_id").collect()
    }
    df_ids = {r.doc_id for r in contaminated_ids(train, ev, mode="bloom", n=3).collect()}
    assert lit_ids == df_ids and lit_ids


def test_bloom_m_bits_sizing():
    """Pure-arithmetic sizing contract: word-aligned, floored at the 2^20
    default, monotone in n and in -log(p)."""
    from healthcare_data_pipeline_spark.operators.decontaminate import (
        BLOOM_M,
        bloom_m_bits,
    )

    assert bloom_m_bits(0) == BLOOM_M
    assert bloom_m_bits(10_000) == BLOOM_M  # small suites stay at the floor
    big = bloom_m_bits(100_000_000, 1e-5)
    assert big % 64 == 0 and big > BLOOM_M
    assert bloom_m_bits(200_000_000, 1e-5) > big
    assert bloom_m_bits(100_000_000, 1e-7) > big
    # k-aware sizing: with the module's FIXED k=3 probes, 1e8 grams at 1e-5
    # needs ~13.8 GBits (~138 bits/gram — m = k·n / -ln(1 - p^(1/k))).  The
    # textbook optimal-k formula would say 2.4 GBits and realize ~30x the
    # target FPP at k=3 — the harness-measured trap this sizing fixes.
    assert 1.3e10 < big < 1.4e10
    # realized-FPP contract: fill = 1-exp(-k·n/m) ⇒ fill^k <= target
    import math

    fill = 1.0 - math.exp(-3 * 100_000_000 / big)
    assert fill**3 <= 1e-5
    with pytest.raises(ValueError):
        bloom_m_bits(-1)
    with pytest.raises(ValueError):
        bloom_m_bits(10, 1.5)
    with pytest.raises(ValueError):
        bloom_m_bits(10, 1e-4, k=0)


def test_bloom_hasher_twins_share_the_contract(spark):
    """The xxhash64 'fast' hasher (production default) and the md5 'portable'
    twin (dd20's oracle-verified form) must both satisfy never-misses; their
    flag sets may differ only in false positives, which are negligible at the
    default bitmap size — so on this corpus both agree with ngram mode.
    An unknown hasher name must fail loudly, not fall back silently."""
    import pytest as _pytest

    from healthcare_data_pipeline_spark.catalog import table
    from healthcare_data_pipeline_spark.operators.decontaminate import contaminated_ids
    from tests.conftest import SF_DIR

    d = table(spark, SF_DIR, "documents")
    train = d.filter(F.col("source") != "src0")
    ev = d.filter(F.col("source") == "src0")
    exact = {r.doc_id for r in contaminated_ids(train, ev, mode="ngram", n=3).collect()}
    fast = {
        r.doc_id
        for r in contaminated_ids(train, ev, mode="bloom", n=3, hasher="fast").collect()
    }
    portable = {
        r.doc_id
        for r in contaminated_ids(train, ev, mode="bloom", n=3, hasher="portable").collect()
    }
    assert exact and exact <= fast and exact <= portable
    assert fast == exact and portable == exact
    with _pytest.raises(Exception, match="hasher"):
        contaminated_ids(train, ev, mode="bloom", n=3, hasher="md5").collect()


def test_bloom_tag_detects_build_probe_mismatch(spark):
    """collect_bloom tags the bitmap with its build-time hasher and n; a
    probe that contradicts the tag must RAISE (a mismatched probe flags
    almost nothing — silent benchmark leakage), while tag-consistent and
    tag-defaulted probes agree exactly.  Untagged plain lists (external
    persistence) keep working and fall back to the module defaults."""
    from healthcare_data_pipeline_spark.operators.decontaminate import (
        collect_bloom,
        contaminated_ids,
        flag_bloom,
    )
    from healthcare_data_pipeline_spark.catalog import table
    from tests.conftest import SF_DIR

    d = table(spark, SF_DIR, "documents")
    train = d.filter(F.col("source") != "src0")
    ev = d.filter(F.col("source") == "src0")
    words = collect_bloom(ev, n=3, hasher="portable")
    assert words.hasher == "portable" and words.n == 3

    # tag-defaulted probe (no hasher/n args) uses the build-time values
    tagged = {
        r.doc_id
        for r in flag_bloom(train, words).filter("__hit").select("doc_id").collect()
    }
    expected = {
        r.doc_id
        for r in contaminated_ids(train, ev, mode="bloom", n=3, hasher="portable").collect()
    }
    assert tagged == expected and tagged

    # explicit agreement is fine; contradiction raises
    flag_bloom(train, words, n=3, hasher="portable")
    with pytest.raises(ValueError, match="hasher"):
        flag_bloom(train, words, hasher="fast")
    with pytest.raises(ValueError, match="gram"):
        flag_bloom(train, words, n=13)

    # untagged plain list: no tag to validate, module defaults apply
    plain = list(collect_bloom(ev, n=3))  # built with DEFAULT_HASHER ('fast')
    untagged = {
        r.doc_id
        for r in flag_bloom(train, plain, n=3).filter("__hit").select("doc_id").collect()
    }
    assert untagged == expected


def test_prep_stream_threads_bloom_hasher(spark, tmp_path):
    """The streaming prep gate must probe with the bitmap's build-time
    hasher: a portable-built bitmap through prep_stream (which previously
    always probed 'fast') must drop exactly the documents the batch
    portable path drops — the ADVICE false-negative regression."""
    from healthcare_data_pipeline_spark.catalog import table
    from healthcare_data_pipeline_spark.operators.decontaminate import (
        collect_bloom,
        contaminated_ids,
    )
    from healthcare_data_pipeline_spark.operators.quality import quality_predicate
    from healthcare_data_pipeline_spark.streaming import events as stv
    from healthcare_data_pipeline_spark.streaming import ingest as ing
    from tests.conftest import SF_DIR

    d = table(spark, SF_DIR, "documents")
    train = d.filter(F.col("source") != "src0")
    ev = d.filter(F.col("source") == "src0")
    words = collect_bloom(ev, n=3, hasher="portable")
    stream = ing.prep_stream(
        ing.read_documents_stream(spark, SF_DIR).filter(F.col("source") != "src0"),
        eval_bloom=words,
    )
    stv.run_to_memory(stream.select("doc_id"), "bloom_hasher_prep_out", output_mode="append")
    got = {r.doc_id for r in spark.sql("SELECT doc_id FROM bloom_hasher_prep_out").collect()}
    passing = train.filter(quality_predicate(min_stopword_ratio=0.01))
    bad = {
        r.doc_id
        for r in contaminated_ids(passing, ev, mode="bloom", n=3, hasher="portable").collect()
    }
    expect = {r.doc_id for r in passing.collect()} - bad
    assert bad, "synthetic corpus should exhibit contamination"
    assert got == expect


# --- fuzzy (MinHash) mode: dd25 -----------------------------------------


def _long_doc(seed: str, n: int = 60) -> str:
    return " ".join(f"{seed}tok{i}" for i in range(n))


def test_fuzzy_catches_edited_leak_ngram_misses(spark):
    from healthcare_data_pipeline_spark.operators.decontaminate import (
        fuzzy_contaminated_matches,
    )

    base = _long_doc("leak1", n=120).split()
    # rewrite every 12th token: longest clean run is 11 < 13, so the
    # 13-gram rule sees nothing by construction.  Each edit poisons 3
    # shingles -> J ~ 0.6, per-band fire prob J^4 ~ 0.13, any-band ~ 0.43:
    # catching this class is PROBABILISTIC per doc (the published
    # 1-(1-J^r)^b curve; the quality matrix measures the rate) — the seed
    # "leak1" is a pinned deterministic collider under the portable hashes.
    edited = [
        (t + "_x" if i % 12 == 5 else t) for i, t in enumerate(base)
    ]
    train = _df(
        spark,
        [(1, " ".join(edited)), (2, _long_doc("clean"))],
    )
    ev = _df(spark, [(100, " ".join(base))])
    exact = decontaminate(train, ev, mode="ngram", n=13).collect()
    assert sorted(r.doc_id for r in exact) == [1, 2]  # ngram blind
    m = fuzzy_contaminated_matches(train, ev).collect()
    assert [r.doc_id for r in m] == [1]
    assert m[0].n_shared_bands >= 1 and m[0].n_eval_matches == 1
    out = decontaminate(train, ev, mode="fuzzy").collect()
    assert [r.doc_id for r in out] == [2]


def test_fuzzy_verbatim_leak_shares_all_bands(spark):
    from healthcare_data_pipeline_spark.operators.decontaminate import (
        fuzzy_contaminated_matches,
    )
    from healthcare_data_pipeline_spark.operators.dedup_corpus import PMH_BANDS

    train = _df(spark, [(1, _long_doc("same")), (2, _long_doc("other"))])
    ev = _df(spark, [(100, _long_doc("same"))])
    m = {r.doc_id: r for r in fuzzy_contaminated_matches(train, ev).collect()}
    assert list(m) == [1]
    assert m[1].n_shared_bands == PMH_BANDS


def test_fuzzy_hasher_twins_agree_and_validate(spark):
    from healthcare_data_pipeline_spark.operators.decontaminate import (
        fuzzy_contaminated_matches,
    )

    train = _df(spark, [(1, _long_doc("dup")), (2, _long_doc("keep"))])
    ev = _df(spark, [(100, _long_doc("dup"))])
    ids_p = sorted(
        r.doc_id for r in fuzzy_contaminated_matches(train, ev, hasher="portable").collect()
    )
    ids_f = sorted(
        r.doc_id for r in fuzzy_contaminated_matches(train, ev, hasher="fast").collect()
    )
    assert ids_p == ids_f == [1]
    with pytest.raises(ValueError, match="min_shared_bands"):
        fuzzy_contaminated_matches(train, ev, min_shared_bands=0)


def test_fuzzy_train_side_never_self_joins(spark):
    """The train corpus joins ONLY the broadcast eval band index — no
    train-train join, eval side broadcast."""
    from healthcare_data_pipeline_spark.operators.decontaminate import (
        fuzzy_contaminated_matches,
    )

    train = _df(spark, [(i, _long_doc(f"t{i}")) for i in range(6)])
    ev = _df(spark, [(100, _long_doc("t3"))])
    plan = fuzzy_contaminated_matches(train, ev)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 1
    assert "SortMergeJoin" not in plan

def test_fuzzy_honors_custom_id_col(spark):
    """r11 ADVICE: fuzzy mode hardcoded 'doc_id' in its output, so any
    non-default id_col raised AnalysisException in decontaminate /
    contaminated_ids / contamination_report.  All three front doors must
    honor id_col like the ngram/bloom/exact modes do."""
    from healthcare_data_pipeline_spark.operators.decontaminate import (
        contaminated_ids,
        contamination_report,
        fuzzy_contaminated_matches,
    )

    train = spark.createDataFrame(
        [(1, _long_doc("same"), "web"), (2, _long_doc("other"), "web")],
        "rec_id long, text string, source string",
    )
    ev = spark.createDataFrame(
        [(100, _long_doc("same"))], "rec_id long, text string"
    )
    m = fuzzy_contaminated_matches(train, ev, id_col="rec_id")
    assert m.columns[0] == "rec_id"
    assert [r.rec_id for r in m.collect()] == [1]
    ids = contaminated_ids(train, ev, mode="fuzzy", id_col="rec_id")
    assert [r.rec_id for r in ids.collect()] == [1]
    out = decontaminate(train, ev, mode="fuzzy", id_col="rec_id")
    assert [r.rec_id for r in out.collect()] == [2]
    rep = contamination_report(train, ev, mode="fuzzy", id_col="rec_id").collect()
    assert rep[0].n_contaminated == 1 and rep[0].n_docs == 2


def test_fuzzy_precomputed_eval_bands_equivalent(spark):
    """eval_bands= (a persisted band_buckets(eval) relation) must produce the
    identical match set as signing the eval side inline — the streaming
    ingest reuses one precomputed index across micro-batches."""
    from healthcare_data_pipeline_spark.operators.decontaminate import (
        fuzzy_contaminated_matches,
    )
    from healthcare_data_pipeline_spark.operators.dedup_corpus import band_buckets

    train = _df(spark, [(1, _long_doc("dup")), (2, _long_doc("keep"))])
    ev = _df(spark, [(100, _long_doc("dup"))])
    eb = band_buckets(ev, id_col="doc_id", text_col="text", hasher="portable")
    inline = sorted(r.doc_id for r in fuzzy_contaminated_matches(train, ev).collect())
    pre = sorted(
        r.doc_id
        for r in fuzzy_contaminated_matches(train, ev, eval_bands=eb).collect()
    )
    assert inline == pre == [1]
    out = decontaminate(train, ev, mode="fuzzy", eval_bands=eb).collect()
    assert [r.doc_id for r in out] == [2]
