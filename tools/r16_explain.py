"""Capture .explain('formatted') for catalog queries into plans/r16/.

Usage: python tools/r16_explain.py before|after [query ...]
Writes plans/r16/<query>_<tag>.txt for each query (default: both headline
groups).  Plans are built at $SPARK_GRAFT_SF_DIR (default sf0.1 — the bench
scale, so the captured shapes are the ones the bench timings ran).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from healthcare_data_pipeline_spark.queries import catalog
from healthcare_data_pipeline_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from bench import HEADLINE, HEADLINE_V2

    names = sys.argv[2:] or (HEADLINE + HEADLINE_V2)
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r16"
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="r16-explain")
    cat = catalog()
    for name in names:
        if name not in cat:
            continue
        df = cat[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(
            os.path.join(out_dir, f"{name}_{tag}.txt"), "w", encoding="utf-8"
        ) as fh:
            fh.write(plan)
        print(f"wrote {name}_{tag}.txt ({plan.count('Exchange')} Exchange refs)")
    spark.stop()


if __name__ == "__main__":
    main()
