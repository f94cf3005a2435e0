"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints the
full JSON artifact line {"metric": ..., "value": N, "unit": "sec",
"queries": {...}, "sf": ...} followed by a COMPACT summary line (same
headline fields, < 2,000 chars, printed LAST so the driver's bounded tail
capture always parses it — the full line outgrew that capture in r11).

Each query is executed to completion (count-collapsed — results are consumed,
not collected to the driver) and timed wall-clock, min-of-3 reps (all reps
recorded in the JSON so the variance is visible).  A warmup pass on sf's
smallest table absorbs JVM/codegen startup so timings reflect the plans.
A fixed calibration probe runs before and after the suite; if it deviates
>15% from its committed idle reference, the artifact is stamped quiet=false
even when loadavg looked clean (the r8 lesson).
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

from healthcare_data_pipeline_spark.queries import catalog
from healthcare_data_pipeline_spark.session import _cpus, get_spark

# Headline set: the flagship star join + one representative per operator family.
HEADLINE = [
    "q01_pricing_summary",
    "q14_star_join",
    "q19_window_rank",
    "q26_sessionize",
    "d01_drug_report_shape",
    "d02_prescriber_report_shape",
    "dd01_exact_dedup",
    "dd04_minhash_lsh",
    "dd09_dedup_corpus",
    "t02_quality_score",
    "t13_corpus_shuffle",
    "t14_training_windows",
    "s01_knn_cosine",
    # Persisted-IVF probe: the index is built ONCE during the untimed warmup
    # pass (ann_index_for caches per testdata mtime), so the timed number is
    # the production probe path — partition-pruned scan of the probed cells.
    "s07_ann_index_probe",
]

# Second headline group (r11 verdict task 5): the r9-r11 heavy operators,
# tracked round-over-round from r12 on.  The original HEADLINE list stays
# FROZEN at the r8 set so its total remains comparable across every round;
# this group gets its own total under "headline_v2" in the JSON (both
# probe-normalized).  One representative per new family: the LM scorer (the
# heaviest text operator), the BPE fold, exact-substring dedup, fuzzy
# decontamination, the C4 battery, and the quantized probes (SQ8 + the
# residual-IVFPQ path; their indexes build once in the untimed warmup via
# ann_index_for, so the timed numbers are the probe paths).
HEADLINE_V2 = [
    "t29_bpe_tokenize",
    "t32_lm_perplexity",
    "t34_c4_rules",
    "t35_temperature_mix",
    "dd24_exact_substring",
    "dd25_fuzzy_decontaminate",
    "s10_ann_index_probe_sq8",
    "s12_pq_adc",
    "s13_ann_index_probe_pq",
]

# Calibration probe (the r8 lesson: loadavg sampled once before the run
# CANNOT see decaying contention — BENCH_r08 stamped quiet:true at loadavg
# 3.05 and recorded 25.68s where the same code measured 14.99s idle).  The
# probe is a fixed, data-independent, CPU-saturating computation (xxhash64
# over a 2B-row range, bit_xor-combined — whole-stage codegen, no I/O, no
# shuffle data): its runtime moves with exactly the host contention that
# inflates the query timings.  It runs min-of-PROBE_REPS BEFORE and AFTER
# the timed suite; if either measurement exceeds the committed idle
# reference by >15%, the artifact is stamped quiet:false regardless of
# loadavg.  Reference: repeated min-of-3 measurements at loadavg <2 on the
# 32-cpu build box span 0.444-0.493s across sessions; committed 0.46s, so
# the 15% gate trips at 0.529s — above every idle measurement, below the
# ~30%+ inflation real contention produces.  Gating only applies on
# PROBE_REF_CPUS boxes — on other hosts the probe times are recorded but
# the reference does not transfer.
# r15 RECALIBRATION (the r14 verdict item: the committed reference had gone
# stale — probe_ratio 0.884 on the judge's idle box meant every normalized
# figure was scaled up ~13%).  Re-measured on the r15 bench box, 20 warm
# reps with per-rep /proc/stat steal sampling, co-tenant-steal-clean reps
# only: min 0.477s, median 0.584s, clean spread 0.48-0.72s.  This box's
# idle probe is both SLOWER and WIDER-spread than the r8-r14 build box
# (0.444-0.493s, committed 0.46): it is a Firecracker VM with bursty
# co-tenant steal, so reference 0.55 (between clean min and median) and
# tolerance 1.25 (gate at 0.69s — above every steal-clean measurement,
# below the ~30%+ inflation real sustained contention produces).  The r14
# values (0.46 / 1.15) described the previous box and are kept noted for
# the history of normalized-number comparability: normalized figures are
# comparable WITHIN a box era, never across boxes.
PROBE_ROWS = 2_000_000_000
PROBE_REPS = 3
PROBE_REF_SEC = 0.55
PROBE_REF_CPUS = 32
PROBE_TOL = 1.25

# Rep-spread gate (the r12 lesson: BENCH_r12 shipped ~25% load-inflated at
# quiet:true with probe ratio 1.013 — the CPU-saturating probe still gets
# scheduled near-fully under competing load while shuffle/GC-bound Spark
# queries degrade far more, so probe-normalization under-corrects).  The
# visible tell was IN the artifact all along: per-query rep spreads of 50%+
# on a "quiet" run (dd24 reps [3.13, 3.15, 2.00]).  On a genuinely idle box
# the min-of-3 reps agree within a few percent; decaying background load
# inflates SOME reps of MOST queries.  So: spread = (max-min)/min per query,
# and when the MEDIAN spread across all timed queries exceeds SPREAD_TOL the
# run is contended no matter what loadavg and the probe said — re-run the
# timed passes (up to SPREAD_RETRIES), keep the calmest pass, and stamp
# quiet=false if even that pass is spread-y.  Median, not max: one query
# with a naturally variable plan (cache effects) must not flip the stamp;
# half the suite inflating is unambiguous host contention.
#
# The FIRST rep is excluded when 3+ were taken: it is systematically cold
# even on a genuinely idle box (by the time the timed pass visits a query,
# the OS page cache of its inputs has been evicted by the queries that ran
# since the warmup — measured on an idle run: rep 1 slowest on ~20 of 23
# queries, steady-rep median spread 6% vs 24% with rep 1 included).  That
# benign coldness never inflates the min-of-reps headline (the min is a
# steady rep), while real contention inflates later reps too — which is
# exactly what the gate looks for (r12's dd24 [3.13, 3.15, 2.00]: steady
# spread 57%).
SPREAD_TOL = 0.20

# Per-query regression band (r15 verdict item 2b).  Reference raw seconds are
# the MAX over the two pooled quiet=true artifacts of the r15 era — the
# driver's BENCH_r15.json and the builder's
# plans/r15/BENCH_final_r15code_thisbox.json (the boxes disagree per-query by
# up to 2.4x, so the max is the loosest honest "no quiet run has ever been
# slower than this" bound; the min would false-flag cross-box drift).  A
# query whose min-of-reps exceeds ref * REGRESSION_TOL on a probe-gated
# (32-core) run is flagged in the artifact — fail-loud in the JSON, not the
# exit code: a perf drift is a finding, not a bench failure.  The band only
# engages on probe-gated runs because the references describe the 32-core
# reference configuration.
REGRESSION_REF = {
    "q01_pricing_summary": 1.254,
    "q14_star_join": 1.129,
    "q19_window_rank": 0.298,
    "q26_sessionize": 0.424,
    "d01_drug_report_shape": 1.502,
    "d02_prescriber_report_shape": 0.684,
    "dd01_exact_dedup": 0.632,
    "dd04_minhash_lsh": 1.569,
    "dd09_dedup_corpus": 2.184,
    "t02_quality_score": 0.38,
    "t13_corpus_shuffle": 0.313,
    "t14_training_windows": 1.793,
    "s01_knn_cosine": 0.874,
    "s07_ann_index_probe": 1.513,
    "t29_bpe_tokenize": 0.541,
    "t32_lm_perplexity": 1.721,
    "t34_c4_rules": 0.309,
    "t35_temperature_mix": 0.386,
    "dd24_exact_substring": 1.316,
    "dd25_fuzzy_decontaminate": 1.987,
    "s10_ann_index_probe_sq8": 3.194,
    "s12_pq_adc": 2.267,
    "s13_ann_index_probe_pq": 2.439,
}
REGRESSION_TOL = 1.25


def regression_flags(timings: dict[str, float]) -> dict[str, dict[str, float]]:
    """Queries whose raw min-of-reps drifted >25% above the pooled quiet
    reference (REGRESSION_REF) — {} when all within band."""
    flags: dict[str, dict[str, float]] = {}
    for name, now in timings.items():
        ref = REGRESSION_REF.get(name)
        if ref is not None and now > ref * REGRESSION_TOL:
            flags[name] = {"ref_sec": ref, "now_sec": now}
    return flags


def rep_spread(rep_times: list[float]) -> float:
    """(max-min)/min over one query's STEADY reps.  The first rep is always
    dropped — it is systematically cold even on an idle box (see the
    SPREAD_TOL comment) — so with fewer than 3 reps there are not two steady
    reps to compare and the spread is unmeasurable (0.0): the gate only
    engages at REPS>=3 (r15 verdict item 2c — at REPS=2 genuine rep-1 warmup
    is indistinguishable from contention)."""
    steady = rep_times[1:]
    if len(steady) < 2:
        return 0.0
    lo = min(steady)
    return (max(steady) - lo) / lo if lo > 0 else 0.0


def median_rep_spread(reps: dict[str, list[float]]) -> float:
    """Median per-query rep spread across the suite (0.0 when unmeasurable)."""
    spreads = sorted(rep_spread(r) for r in reps.values() if len(r) > 1)
    if not spreads:
        return 0.0
    mid = len(spreads) // 2
    if len(spreads) % 2:
        return spreads[mid]
    return (spreads[mid - 1] + spreads[mid]) / 2.0


def run_probe(spark, cpus: int, fake: str | None = None) -> float:
    """Min-of-PROBE_REPS wall time of the fixed calibration computation."""
    if fake is not None:
        return float(fake)
    from pyspark.sql import functions as F

    def once() -> float:
        t0 = time.perf_counter()
        spark.range(0, PROBE_ROWS, 1, cpus).select(F.bit_xor(F.xxhash64("id"))).collect()
        return time.perf_counter() - t0

    once()  # warm: codegen for the probe itself is not host noise
    return round(min(once() for _ in range(PROBE_REPS)), 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    # Load hygiene (the r5 lesson: the official 23.0s number was ~28% load
    # noise from a concurrent test run).  Sample the 1-minute loadavg BEFORE
    # Spark starts — that is pre-existing load, not ours — record it in the
    # JSON, and shout when the machine isn't quiet so a polluted number is
    # never mistaken for a regression.
    # EFFECTIVE core count (r15 verdict item 2a): the session runs
    # local[$SPARK_GRAFT_CPUS] (session._cpus), so the artifact's cpus stamp,
    # the probe gate (probe_gated below) and the quiet threshold must use the
    # same number — os.cpu_count() mislabeled the driver's 8-core run as 32
    # and wrongly applied the 32-core probe normalization to it (BENCH_r15_c8).
    cpus = _cpus()

    # Test hook: the quiet-wait gate needs a deterministic "busy machine"
    # (tests/test_bench_harness.py) without actually loading the box.
    fake_load = os.environ.get("SPARK_GRAFT_BENCH_FAKE_LOAD")

    def _load1():
        if fake_load is not None:
            return float(fake_load)
        try:
            return round(os.getloadavg()[0], 2)
        except OSError:  # platform without getloadavg
            return None

    # Threshold: measured on this box, a pre-run 1m loadavg of ~5 on 32 cpus
    # still inflates every query ~30%, so the gate is 0.1*cpus, not 0.2.
    def _quiet(l1):
        return l1 is None or l1 <= max(2.0, 0.1 * cpus)

    # The r6 lesson: the quiet gate fired (loadavg 4.48) and the polluted
    # number still shipped as the round artifact.  Don't just warn — WAIT:
    # poll with backoff until the 1m loadavg decays below the gate or the
    # wait budget (default 15 min, ~3 loadavg half-lives past a burst) is
    # spent.  Only then run, and stamp quiet honestly either way so a
    # still-polluted number can never be mistaken for a regression.
    load1 = _load1()
    wait_budget = float(os.environ.get("SPARK_GRAFT_BENCH_MAX_WAIT", "900"))
    waited, interval = 0.0, 15.0
    while not _quiet(load1) and waited < wait_budget:
        print(
            f"# machine not quiet (1m loadavg {load1} on {cpus} cpus) — "
            f"waiting {interval:.0f}s for load to decay "
            f"({waited:.0f}/{wait_budget:.0f}s used)",
            file=sys.stderr,
        )
        time.sleep(interval)
        waited += interval
        interval = min(interval * 1.5, 60.0)
        load1 = _load1()
    quiet = _quiet(load1)
    if not quiet:
        print(
            f"# WARNING: machine not quiet (1m loadavg {load1} on {cpus} cpus) "
            f"after waiting {waited:.0f}s — timings below are load-inflated; "
            "rerun on an idle machine before comparing across rounds",
            file=sys.stderr,
        )
    spark = get_spark(app_name="hdp-spark-bench")

    cat = catalog()
    names = [n for n in HEADLINE if n in cat]
    names_v2 = [n for n in HEADLINE_V2 if n in cat]
    # Test hook: fault-isolation coverage needs a deterministically broken
    # query (tests/test_bench_harness.py) without corrupting real data.
    sabotage = os.environ.get("SPARK_GRAFT_BENCH_SABOTAGE")

    def build(name):
        if name == sabotage:
            raise RuntimeError(f"sabotaged for fault-isolation test: {name}")
        return cat[name].fn(spark, sf_dir)

    # Warmup: trigger JVM + codegen + shuffle + noop-writer init so fixed
    # startup costs don't land on the first timed query.
    warm = spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
    warm.groupBy("n_regionkey").count().write.format("noop").mode("overwrite").save()

    # Untimed warm pass: each plan compiles its whole-stage-codegen sources and
    # caches parquet footers once, so the timed pass below measures steady-state
    # execution (what a long-lived cluster session sees), not first-run JIT.
    # Fault-isolated per query: one broken query must cost ITS number, never
    # the whole bench (the round-3 lesson — a single AnalysisException in this
    # loop published no numbers at all).
    errors: dict[str, str] = {}
    for name in names + names_v2:
        try:
            build(name).write.format("noop").mode("overwrite").save()
        except Exception as exc:  # noqa: BLE001
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"# {name}: WARMUP FAILED — {errors[name]}", file=sys.stderr)
        # Iterative operators (dd09's connected components) cache/checkpoint
        # intermediates; left in place they (a) eat executor memory under every
        # LATER query and (b) let a rebuilt identical plan silently hit the
        # cache manager, so the timed run would measure cache reads instead of
        # the operator. Clear between queries: each timed number is the plan
        # itself, warm JVM, cold data. (gc.collect drops the Python-side
        # DataFrame refs so the ContextCleaner can reclaim localCheckpoint
        # RDDs promptly instead of mid-way through a later timed query.)
        spark.catalog.clearCache()
        gc.collect()

    # Clustered ANN fixture (r13 verdict task 7): the sf embeddings are
    # structureless by construction, so their recall curve measures the
    # regime where IVF routing is hardest and LEAST representative of real
    # embedding manifolds (recall ~ probed fraction).  The deterministic
    # mixture-of-Gaussians fixture (tools/pq_sweep.py — tight clusters,
    # decaying variance spectrum) is the regime the techniques are designed
    # for; its index is built ONCE here in the untimed warmup so the
    # recall section below measures the probe path, tracked round-over-
    # round under "ann_recall_clustered".
    import shutil
    import tempfile

    # Test hook: the quiet/spread/wait gate tests don't exercise the recall
    # sections — skipping them halves those tests' runtime and removes a
    # contention-flake surface (a broadcast timeout inside an ann section
    # would fail a GATE test for reasons the gate doesn't own).
    skip_ann = bool(os.environ.get("SPARK_GRAFT_BENCH_SKIP_ANN"))
    # Per-run private dir (r14 advice fix): the previous fixed path under
    # the shared system tmp meant two concurrent bench invocations on one
    # host clobbered each other's index mid-probe, and the directory was
    # never cleaned up after the run.  Removed below before spark.stop().
    clustered_root = tempfile.mkdtemp(prefix="hdp_bench_ann_")
    clustered_idx = os.path.join(clustered_root, "clustered")
    en_clustered = None
    if not skip_ann:
        try:
            from tools.pq_sweep import clustered_embeddings

            from healthcare_data_pipeline_spark.operators.similarity import (
                ann_index_build,
            )

            en_clustered = clustered_embeddings(spark)
            ann_index_build(en_clustered, clustered_idx)
            spark.catalog.clearCache()
            gc.collect()
        except Exception as exc:  # noqa: BLE001
            errors["ann_recall_clustered"] = f"{type(exc).__name__}: {exc}"[:300]
            print(
                f"# ann_recall_clustered: WARMUP FAILED — "
                f"{errors['ann_recall_clustered']}",
                file=sys.stderr,
            )
            en_clustered = None

    # Calibration probes bracket EVERY timed pass (see the pass loop):
    # detects the contention-decay shape loadavg cannot — the PROBE_* comment.
    fake_probe = os.environ.get("SPARK_GRAFT_BENCH_FAKE_PROBE")
    probe_ref = float(os.environ.get("SPARK_GRAFT_BENCH_PROBE_REF", str(PROBE_REF_SEC)))

    # Timed pass, min-of-REPS per query: a transient burst of host load can
    # only inflate SOME reps, and the min is the rep that dodged it.  All
    # reps are recorded in the JSON so the variance itself is visible — a
    # wide rep spread on a quiet-stamped artifact is the tell to re-run.
    reps_n = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    # Test hook: the rep-spread gate needs deterministically spread-y reps
    # (tests/test_bench_harness.py) without loading the box — a comma list of
    # ABSOLUTE synthetic rep seconds substituted cyclically for each query's
    # reps.  r15 lesson (verdict item 2c): the previous form MULTIPLIED the
    # measured rep times, so genuine rep-1-cold/rep-2-warm drift of ~1.6x at
    # REPS=2 cancelled an injected x1.6 and the gate test flaked on the
    # driver's box; substituting absolute times removes the measurement from
    # the loop entirely.
    fake_noise = [
        float(x)
        for x in os.environ.get("SPARK_GRAFT_BENCH_FAKE_REP_NOISE", "").split(",")
        if x
    ]

    def time_group(group: list[str]) -> tuple[dict[str, float], dict[str, list[float]], float]:
        timings: dict[str, float] = {}
        reps: dict[str, list[float]] = {}
        total = 0.0
        for name in group:
            if name in errors:
                continue
            rep_times: list[float] = []
            for rep_i in range(reps_n):
                t0 = time.perf_counter()
                try:
                    # Force full execution without driver-side materialization cost.
                    build(name).write.format("noop").mode("overwrite").save()
                except Exception as exc:  # noqa: BLE001
                    errors[name] = f"{type(exc).__name__}: {exc}"[:300]
                    print(f"# {name}: FAILED — {errors[name]}", file=sys.stderr)
                    break
                dt_rep = time.perf_counter() - t0
                if fake_noise:
                    dt_rep = fake_noise[rep_i % len(fake_noise)]
                rep_times.append(round(dt_rep, 3))
                spark.catalog.clearCache()
                gc.collect()
                # Pay JVM GC debt BETWEEN timed windows, not during them: without
                # this, allocation pressure from earlier queries lands as GC pauses
                # inside later queries' timings (dd04/dd09 measured ~+0.7s in-bench
                # vs standalone; the same fix stabilized tools/scale_stress.py).
                spark.sparkContext._jvm.System.gc()
            if name in errors:
                continue
            dt = min(rep_times)
            timings[name] = dt
            reps[name] = rep_times
            total += dt
            print(f"# {name}: {dt:.3f}s (reps: {', '.join(f'{r:.3f}' for r in rep_times)})", file=sys.stderr)
        return timings, reps, total

    # Timed passes with the rep-spread gate (see the SPREAD_TOL comment): a
    # pass whose median per-query rep spread exceeds the tolerance is load-
    # contaminated — re-run it (the contention that produced r12's artifact
    # was DECAYING, so a retry minutes later is usually clean), keep the
    # calmest pass, and stamp quiet=false if even the best pass is spread-y.
    # EVERY pass is bracketed by its OWN before/mid/after probes (r13 review
    # fix): the normalization ratio comes from the kept pass's three probes
    # only, so it can never mix another pass's contention points with the
    # kept pass's calm timings (a kept pass-1 with contention arriving
    # during pass 2 previously inflated the ratio and under-reported
    # runtime).  The mid probe between the two query groups still catches
    # contention that arrives mid-suite and decays before the pass ends.
    spread_retries = int(os.environ.get("SPARK_GRAFT_BENCH_SPREAD_RETRIES", "1"))
    probe_mids: list[float] = []
    all_probe_pts: list[float] = []
    passes = []
    for attempt in range(spread_retries + 1):
        probe_b = run_probe(spark, cpus, fake_probe)
        print(
            f"# calibration probe (pass {attempt + 1} before): {probe_b:.3f}s "
            f"(ref {probe_ref:.2f}s)",
            file=sys.stderr,
        )
        timings, reps, total = time_group(names)
        probe_mid = run_probe(spark, cpus, fake_probe)
        probe_mids.append(probe_mid)
        print(
            f"# calibration probe (pass {attempt + 1} mid): {probe_mid:.3f}s "
            f"(ref {probe_ref:.2f}s)",
            file=sys.stderr,
        )
        timings_v2, reps_v2, total_v2 = time_group(names_v2)
        probe_a = run_probe(spark, cpus, fake_probe)
        print(
            f"# calibration probe (pass {attempt + 1} after): {probe_a:.3f}s "
            f"(ref {probe_ref:.2f}s)",
            file=sys.stderr,
        )
        all_probe_pts += [probe_b, probe_mid, probe_a]
        med_spread = median_rep_spread({**reps, **reps_v2})
        passes.append(
            (
                med_spread,
                timings,
                reps,
                total,
                timings_v2,
                reps_v2,
                total_v2,
                (probe_b, probe_mid, probe_a),
            )
        )
        if med_spread <= SPREAD_TOL:
            break
        if attempt < spread_retries:
            print(
                f"# median rep spread {med_spread:.1%} exceeds {SPREAD_TOL:.0%} — the "
                "host was contended during this pass; re-running the timed suite",
                file=sys.stderr,
            )
    med_spread, timings, reps, total, timings_v2, reps_v2, total_v2, kept_probes = min(
        passes, key=lambda p: p[0]
    )
    probe_before, probe_mid_kept, probe_after = kept_probes
    spread_quiet = med_spread <= SPREAD_TOL

    probe_gated = cpus == PROBE_REF_CPUS or fake_probe is not None
    probe_quiet = (not probe_gated) or max(all_probe_pts) <= probe_ref * PROBE_TOL
    if not spread_quiet:
        quiet = False
        print(
            f"# WARNING: median per-query rep spread {med_spread:.1%} exceeds "
            f"{SPREAD_TOL:.0%} after {len(passes)} pass(es) — reps disagree the way "
            "they only do under host contention (the r12 failure shape); timings "
            "are load-inflated, stamping quiet=false",
            file=sys.stderr,
        )
    if not probe_quiet:
        quiet = False
        print(
            f"# WARNING: calibration probe {max(all_probe_pts):.3f}s exceeds "
            f"{PROBE_TOL:.2f}x the committed idle reference ({probe_ref:.2f}s) — the host "
            "is contended in a way loadavg did not show; timings are load-inflated, "
            "stamping quiet=false",
            file=sys.stderr,
        )

    # Per-query regression band (r15 verdict item 2b): on a probe-gated
    # (32-core reference) run AT THE REFERENCE SCALE (sf0.1 — the pooled
    # references describe that workload; an sf0.001 smoke run trips the
    # band on fixed overhead alone), any query >25% slower than the pooled
    # quiet reference era is flagged in the artifact and on stderr.  Only
    # meaningful when the run itself was quiet — a contended run inflates
    # everything and the quiet=false stamp already says so.
    band_engaged = probe_gated and sf == "0.1"
    band_flags = regression_flags({**timings, **timings_v2}) if band_engaged else {}
    if band_flags and quiet:
        for name, f in sorted(band_flags.items()):
            print(
                f"# REGRESSION BAND: {name} {f['now_sec']:.3f}s exceeds "
                f"{REGRESSION_TOL:.2f}x the pooled quiet reference "
                f"{f['ref_sec']:.3f}s",
                file=sys.stderr,
            )

    # ANN recall/latency point at the bench SF (untimed in the headline
    # total): the IVF nprobe default is a recall-vs-cost tradeoff, so publish
    # the measured point for both nprobe=1 (the persisted-index probe
    # default) and nprobe=2 (the multiprobe recall knob) rather than assert
    # it.  Fault-isolated like the queries: a recall failure never costs the
    # headline numbers.
    ann_recall: dict[str, dict[str, float]] = {}
    if not skip_ann:
        try:
            from pyspark.sql import functions as F

            from healthcare_data_pipeline_spark.operators.similarity import (
                ann_index_for,
                ann_index_probe,
                brute_topk,
            )
            from healthcare_data_pipeline_spark.queries.similarity import quantized

            en = quantized(spark, sf_dir)
            index_dir = ann_index_for(spark, sf_dir, en)
            probe_queries = en.filter(F.col("vec_id") < 20).select(
                "vec_id", "iv", "nrm2"
            )
            exact = (
                brute_topk(en, F.col("vec_id") < 20, k=5)
                .select("query_id", "neighbor_id")
                .collect()
            )
            exact_set = {(r.query_id, r.neighbor_id) for r in exact}
            # Full curve, not one point: the synthetic embeddings are
            # structureless, so recall scales ~linearly with the probed
            # fraction (nprobe/n_cells) — on real clustered embeddings the
            # same machinery concentrates and the curve saturates early
            # (measured by the ann_recall_clustered twin below).  Publishing
            # both curves makes the nprobe default a measured tradeoff.
            for nprobe in (1, 2, 4, 8):
                t0 = time.perf_counter()
                got = ann_index_probe(
                    spark, index_dir, probe_queries, k=5, nprobe=nprobe
                ).collect()
                dt = time.perf_counter() - t0
                hits = sum((r.query_id, r.neighbor_id) in exact_set for r in got)
                ann_recall[f"index_probe_nprobe{nprobe}"] = {
                    "recall_at_5": round(hits / max(len(exact_set), 1), 4),
                    "probe_sec": round(dt, 3),
                }
                spark.catalog.clearCache()
                gc.collect()
        except Exception as exc:  # noqa: BLE001
            errors["ann_recall"] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"# ann_recall: FAILED — {errors['ann_recall']}", file=sys.stderr)

    # Same curve on the clustered fixture (index pre-built in warmup): on a
    # real embedding manifold the cells concentrate, so the curve should
    # saturate at small nprobe — the number the nprobe default actually
    # trades on in production.
    ann_recall_clustered: dict[str, dict[str, float]] = {}
    if en_clustered is not None:
        try:
            from pyspark.sql import functions as F

            from healthcare_data_pipeline_spark.operators.similarity import (
                ann_index_probe,
                brute_topk,
            )

            probe_queries = en_clustered.filter(F.col("vec_id") < 20).select(
                "vec_id", "iv", "nrm2"
            )
            exact = (
                brute_topk(en_clustered, F.col("vec_id") < 20, k=5)
                .select("query_id", "neighbor_id")
                .collect()
            )
            exact_set = {(r.query_id, r.neighbor_id) for r in exact}
            for nprobe in (1, 2, 4, 8):
                t0 = time.perf_counter()
                got = ann_index_probe(
                    spark, clustered_idx, probe_queries, k=5, nprobe=nprobe
                ).collect()
                dt = time.perf_counter() - t0
                hits = sum((r.query_id, r.neighbor_id) in exact_set for r in got)
                ann_recall_clustered[f"index_probe_nprobe{nprobe}"] = {
                    "recall_at_5": round(hits / max(len(exact_set), 1), 4),
                    "probe_sec": round(dt, 3),
                }
                spark.catalog.clearCache()
                gc.collect()
        except Exception as exc:  # noqa: BLE001
            errors["ann_recall_clustered"] = f"{type(exc).__name__}: {exc}"[:300]
            print(
                f"# ann_recall_clustered: FAILED — {errors['ann_recall_clustered']}",
                file=sys.stderr,
            )

    out = {
        "metric": "headline_queries_wall_clock",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "reps": reps,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": cpus,
        "loadavg_1m": load1,
        "probe": {
            # before/mid_kept/after are the KEPT pass's own bracket (r13
            # review fix); all_sec records every probe point of every pass
            # (those feed the quiet GATE — contention anywhere is a stamp
            # signal — but never the normalization ratio).
            "before_sec": probe_before,
            "mid_sec": probe_mids,
            "mid_kept_sec": probe_mid_kept,
            "after_sec": probe_after,
            "all_sec": all_probe_pts,
            "ref_sec": probe_ref,
            "gated": probe_gated,
        },
        "rep_spread_median": round(med_spread, 4),
        "spread_passes": len(passes),
        "quiet": quiet,
        # Band verdict is only trustworthy on a quiet probe-gated run; the
        # raw flags are recorded either way so the artifact self-describes.
        "regression_band": {
            "tol": REGRESSION_TOL,
            "engaged": band_engaged,
            "flags": band_flags,
        },
    }
    # Probe-relative normalization: the calibration probe is fixed work, so
    # probe_time/ref IS the host slowdown factor during this run.  Dividing
    # the raw timings by the mean-of-(before, after) ratio makes a genuine
    # regression separable from a slower sandbox MECHANICALLY (the r9->r10
    # +32% episode needed a human to cross-read the probe).  Raw fields stay
    # frozen for cross-round comparability; normalized fields are additive,
    # and only emitted when the committed reference transfers to this host.
    out["headline_v2"] = {
        "value": round(total_v2, 3),
        "queries": timings_v2,
        "reps": reps_v2,
    }
    if probe_gated:
        # Mean over the probe points the KEPT timings actually experienced:
        # the kept pass's OWN before/mid/after bracket (r13 review fix —
        # previously the suite-level before/after could belong to a
        # different pass's timing era).  Probes of DISCARDED contended
        # passes stay in the quiet GATE above (max over all points —
        # contention anywhere is a stamp signal) but must not feed the
        # ratio: dividing the calm pass's timings by a ratio inflated with
        # a discarded pass's contention would under-report runtime on a
        # quiet-stamped artifact.
        probe_pts = [probe_before, probe_mid_kept, probe_after]
        probe_ratio = round((sum(probe_pts) / len(probe_pts)) / probe_ref, 4)
        out["probe"]["ratio"] = probe_ratio
        out["value_probe_normalized"] = round(total / probe_ratio, 3)
        out["queries_probe_normalized"] = {
            k: round(v / probe_ratio, 3) for k, v in timings.items()
        }
        out["headline_v2"]["value_probe_normalized"] = round(total_v2 / probe_ratio, 3)
        out["headline_v2"]["queries_probe_normalized"] = {
            k: round(v / probe_ratio, 3) for k, v in timings_v2.items()
        }
    if ann_recall:
        out["ann_recall"] = ann_recall
    if ann_recall_clustered:
        out["ann_recall_clustered"] = ann_recall_clustered
    if errors:
        out["errors"] = errors
    print(json.dumps(out))
    # COMPACT summary line LAST (r13 verdict task 2): the full JSON above
    # outgrew the driver's ~2,000-char tail capture in r11 (BENCH_r11/12/13
    # all recorded parsed:null — the leading "value" field fell off every
    # driver-side artifact).  This second line carries the headline fields
    # plus the raw per-query timings, stays well under the tail budget, and
    # is the LAST stdout line so a tail capture always holds it complete.
    compact = {
        "metric": "headline_queries_wall_clock",
        "value": out["value"],
        "unit": "sec",
        "sf": out["sf"],
        "cpus": cpus,
        "quiet": quiet,
        "rep_spread_median": out["rep_spread_median"],
        "headline_v2_value": out["headline_v2"]["value"],
        "queries": timings,
    }
    if "value_probe_normalized" in out:
        compact["value_probe_normalized"] = out["value_probe_normalized"]
        compact["headline_v2_value_probe_normalized"] = out["headline_v2"][
            "value_probe_normalized"
        ]
        compact["probe_ratio"] = out["probe"]["ratio"]
    if errors:
        compact["error_queries"] = sorted(errors)
    if band_flags:
        compact["regression_flags"] = sorted(band_flags)
    line = json.dumps(compact)
    if len(line) > 1900:  # never outgrow the tail capture: drop per-query detail
        compact.pop("queries", None)
        line = json.dumps(compact)
    print(line)
    shutil.rmtree(clustered_root, ignore_errors=True)
    spark.stop()
    # Partial results still print above; the exit code says whether the set
    # was complete.
    if errors:
        sys.exit(1)


if __name__ == "__main__":
    main()
