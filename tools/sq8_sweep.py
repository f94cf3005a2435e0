"""SQ8 recall-vs-shortlist sweep: the measured basis for the README's SQ8
numbers (recall vs the fp probe at increasing shortlist depth, plus the
on-disk byte ratio of the codes layout vs the fp64 layout).

The shortlist is the SQ8 probe's one recall knob — a true neighbor is lost
only when its quantized (ADC) rank falls past the shortlist, so the sweep
shows where the curve saturates for this corpus (at sf0.1 it reaches 1.000
by shortlist=10 for k=5).  Storage bytes are the scale lever: probe cost at
100 TB is scan I/O of the probed cells, and the codes layout is what that
scan reads.

Usage: python tools/sq8_sweep.py [--sf-dir /root/testdata/sf0.1]
Prints one JSON line: {"recall_vs_fp": {shortlist: recall}, "bytes": {...}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from healthcare_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--nprobe", type=int, default=2)
    ap.add_argument("--shortlists", default="5,10,20,40")
    args = ap.parse_args()

    from healthcare_data_pipeline_spark.operators.similarity import (
        ann_index_build_sq8,
        ann_index_probe,
        ann_index_probe_sq8,
    )
    from healthcare_data_pipeline_spark.queries.similarity import quantized

    spark = get_spark(app_name="hdp-sq8-sweep")
    en = quantized(spark, args.sf_dir)
    idx = os.path.join(tempfile.gettempdir(), "hdp_sq8_sweep_idx")
    if not os.path.exists(os.path.join(idx, "sq8_bounds")):
        ann_index_build_sq8(en, idx)
    qs = en.filter(F.col("vec_id") < 50).select("vec_id", "iv", "nrm2")
    fp = {
        (r.query_id, r.neighbor_id)
        for r in ann_index_probe(spark, idx, qs, k=args.k, nprobe=args.nprobe).collect()
    }
    recall = {}
    for sl in (int(x) for x in args.shortlists.split(",")):
        sq = {
            (r.query_id, r.neighbor_id)
            for r in ann_index_probe_sq8(
                spark, idx, qs, k=args.k, nprobe=args.nprobe, shortlist=sl
            ).collect()
        }
        recall[sl] = round(len(fp & sq) / len(fp), 4)

    def dir_bytes(d: str) -> int:
        return sum(
            os.path.getsize(os.path.join(r, f)) for r, _, fs in os.walk(d) for f in fs
        )

    fp_b = dir_bytes(os.path.join(idx, "vectors"))
    sq_b = dir_bytes(os.path.join(idx, "vectors_sq8"))
    print(
        json.dumps(
            {
                "sf_dir": args.sf_dir,
                "k": args.k,
                "nprobe": args.nprobe,
                "recall_vs_fp": recall,
                "bytes": {"fp64": fp_b, "sq8": sq_b, "ratio": round(fp_b / sq_b, 2)},
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
