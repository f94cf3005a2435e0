"""Steal-gated min-of-reps timing for named catalog queries (r16 work tool).

Same methodology as the bench's timed region (build + noop sink, cache
cleared and JVM GC paid between reps) with per-rep /proc/stat steal
sampling, so numbers are comparable to BENCH artifacts on this box.

Usage: python tools/r16_time.py query [query ...]
Reps via SPARK_GRAFT_AB_REPS (default 5); SF via SPARK_GRAFT_SF_DIR.
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from healthcare_data_pipeline_spark.queries import catalog
from healthcare_data_pipeline_spark.session import get_spark


def steal_jiffies() -> int:
    with open("/proc/stat") as fh:
        parts = fh.readline().split()
    return int(parts[8]) if len(parts) > 8 else 0


def main() -> None:
    names = sys.argv[1:]
    reps = int(os.environ.get("SPARK_GRAFT_AB_REPS", "5"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="r16-time")
    cat = catalog()
    for name in names:
        fn = cat[name].fn
        # warm pass: codegen + parquet footers, exactly like the bench
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        gc.collect()
        times, steals = [], []
        for _ in range(reps):
            s0 = steal_jiffies()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
            steals.append(steal_jiffies() - s0)
            spark.catalog.clearCache()
            gc.collect()
            spark.sparkContext._jvm.System.gc()
        clean = [t for t, s in zip(times, steals) if s <= max(3, int(t * 3))]
        pool = clean or times
        print(
            f"{name}: min {min(pool):.3f}s median {sorted(pool)[len(pool) // 2]:.3f}s "
            f"({len(clean)}/{reps} steal-clean; reps {' '.join(f'{t:.3f}' for t in times)})"
        )
    spark.stop()


if __name__ == "__main__":
    main()
