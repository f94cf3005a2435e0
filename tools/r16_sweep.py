"""One-rep full-catalog sweep (r16): warm + single timed rep per entry,
sorted by cost — the coverage checklist that finds heavy entries the bench
never times.  Usage: python tools/r16_sweep.py [min_sec_to_print]
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from healthcare_data_pipeline_spark.queries import catalog
from healthcare_data_pipeline_spark.session import get_spark


def main() -> None:
    floor = float(sys.argv[1]) if len(sys.argv) > 1 else 0.0
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="r16-sweep")
    cat = catalog()
    out = []
    for name in sorted(cat):
        try:
            t0 = time.perf_counter()
            cat[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            warm = time.perf_counter() - t0
            spark.catalog.clearCache()
            gc.collect()
            t0 = time.perf_counter()
            cat[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: FAILED {type(exc).__name__}: {exc}", file=sys.stderr)
            continue
        out.append((dt, warm, name))
        spark.catalog.clearCache()
        gc.collect()
        spark.sparkContext._jvm.System.gc()
    for dt, warm, name in sorted(out, reverse=True):
        if dt >= floor:
            print(f"{name:40s} {dt:7.3f}s (warm {warm:7.3f}s)")
    spark.stop()


if __name__ == "__main__":
    main()
