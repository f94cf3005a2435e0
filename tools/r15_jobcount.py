"""r15 profiling: per-query wall time + job/stage/task counts.

The r15 sandbox measures ~175 ms fixed cost per Spark job (vs ~15 ms on the
build boxes), so the number of jobs a query launches — broadcast builds, AQE
shuffle-stage materializations, driver collects — dominates its bench time.
This tool attributes that: for each query it runs the noop sink once (warm)
and then measures wall time alongside how many jobs/stages/tasks the run
submitted (statusTracker deltas).

Usage: python tools/r15_jobcount.py [query ...]  (default: both headline groups)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from healthcare_data_pipeline_spark.queries import catalog
from healthcare_data_pipeline_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from bench import HEADLINE, HEADLINE_V2

    names = sys.argv[1:] or (HEADLINE + HEADLINE_V2)
    spark = get_spark(app_name="r15-jobcount")
    cat = catalog()
    st = spark.sparkContext.statusTracker

    # warm the session
    spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).groupBy(
        "n_regionkey"
    ).count().write.format("noop").mode("overwrite").save()

    import gc

    def jobs_stages() -> tuple[int, int]:
        t = st()
        jids = t.getJobIdsForGroup(None)
        n_stages = 0
        for j in jids:
            info = t.getJobInfo(j)
            if info is not None:
                n_stages += len(info.stageIds)
        return len(jids), n_stages

    print(f"{'query':34s} {'sec':>7s} {'jobs':>5s} {'stages':>7s}")
    for name in names:
        if name not in cat:
            continue
        # warm pass (codegen/JIT) — not counted
        cat[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        j0, s0 = jobs_stages()
        t0 = time.perf_counter()
        cat[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        j1, s1 = jobs_stages()
        print(f"{name:34s} {dt:7.3f} {j1 - j0:5d} {s1 - s0:7d}")
        spark.catalog.clearCache()
        gc.collect()
        spark.sparkContext._jvm.System.gc()
    spark.stop()


if __name__ == "__main__":
    main()
