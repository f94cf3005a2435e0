"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is executed to completion (count-collapsed — results are consumed,
not collected to the driver) and timed wall-clock.  A warmup pass on sf's
smallest table absorbs JVM/codegen startup so timings reflect the plans.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

from healthcare_data_pipeline_spark.queries import catalog
from healthcare_data_pipeline_spark.session import get_spark

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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark(app_name="hdp-spark-bench")

    cat = catalog()
    names = [n for n in HEADLINE if n in cat]
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
    for name in names:
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

    timings: dict[str, float] = {}
    total = 0.0
    for name in names:
        if name in errors:
            continue
        t0 = time.perf_counter()
        try:
            # Force full execution without driver-side materialization cost.
            build(name).write.format("noop").mode("overwrite").save()
        except Exception as exc:  # noqa: BLE001
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"# {name}: FAILED — {errors[name]}", file=sys.stderr)
            continue
        dt = round(time.perf_counter() - t0, 3)
        timings[name] = dt
        total += dt
        print(f"# {name}: {dt:.3f}s", file=sys.stderr)
        spark.catalog.clearCache()
        gc.collect()

    out = {
        "metric": "headline_queries_wall_clock",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))
    spark.stop()
    # Partial results still print above; the exit code says whether the set
    # was complete.
    if errors:
        sys.exit(1)


if __name__ == "__main__":
    main()
