"""Interleaved A/B timing harness for r15 optimization work.

The r15 sandbox shows bursty background contention (rep spreads of 2x within
a session), so sequential A-then-B comparisons routinely flip sign.  This
harness interleaves the two arms rep-by-rep (A B A B ...) so both see the
same noise window, and reports min + median per arm.

Usage:
  python tools/r15_ab.py ENV=VALUE_A ENV=VALUE_B query [query ...]
    e.g. python tools/r15_ab.py SPARK_GRAFT_WIDEN_MIN_BYTES=0 \
             SPARK_GRAFT_WIDEN_MIN_BYTES=1048576 q14_star_join
  Reps per arm via SPARK_GRAFT_AB_REPS (default 5).
"""

from __future__ import annotations

import gc
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from healthcare_data_pipeline_spark.queries import catalog
from healthcare_data_pipeline_spark.session import get_spark


def main() -> None:
    spec_a, spec_b = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    ka, va = spec_a.split("=", 1)
    kb, vb = spec_b.split("=", 1)
    reps = int(os.environ.get("SPARK_GRAFT_AB_REPS", "5"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="r15-ab")
    cat = catalog()

    def steal_jiffies() -> int:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()
        return int(parts[8]) if len(parts) > 8 else 0

    def wait_quiet(max_wait: float = 120.0) -> None:
        """Wait until a 1s steal sample is below ~2% of one core."""
        waited = 0.0
        while waited < max_wait:
            s0 = steal_jiffies()
            time.sleep(1.0)
            if steal_jiffies() - s0 <= 2:
                return
            waited += 1.0

    def run_once(name: str, key: str, val: str) -> tuple[float, int]:
        os.environ[key] = val
        s0 = steal_jiffies()
        t0 = time.perf_counter()
        cat[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        stolen = steal_jiffies() - s0
        spark.catalog.clearCache()
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        return dt, stolen

    for name in names:
        # warm both arms (codegen for both plan shapes)
        run_once(name, ka, va)
        run_once(name, kb, vb)
        a_times, b_times = [], []
        a_steal, b_steal = [], []
        for _ in range(reps):
            wait_quiet()
            dt, st = run_once(name, ka, va)
            a_times.append(dt)
            a_steal.append(st)
            dt, st = run_once(name, kb, vb)
            b_times.append(dt)
            b_steal.append(st)
        # a rep is CLEAN when co-tenant steal during it stayed under ~3% of
        # one core-second per wall second (jiffies are 10 ms)
        a_clean = [t for t, s in zip(a_times, a_steal) if s <= 3 * t] or a_times
        b_clean = [t for t, s in zip(b_times, b_steal) if s <= 3 * t] or b_times
        ma, mb = min(a_clean), min(b_clean)
        print(
            f"{name:34s} A[{va}] min {ma:6.3f} med {statistics.median(a_clean):6.3f} | "
            f"B[{vb}] min {mb:6.3f} med {statistics.median(b_clean):6.3f} | "
            f"dmin {mb - ma:+.3f} | clean {len(a_clean)}/{len(b_clean)}"
        )
        print(f"    A reps: {[round(x,3) for x in a_times]} steal {a_steal}")
        print(f"    B reps: {[round(x,3) for x in b_times]} steal {b_steal}")
    spark.stop()


if __name__ == "__main__":
    main()
