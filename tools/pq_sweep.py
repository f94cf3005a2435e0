"""PQ recall-vs-shortlist sweep (the s13 IVFPQ layout): the measured basis
for the README's PQ numbers — recall vs the fp probe at increasing
shortlist depth, PER (m, k_codes) CONFIGURATION, plus the on-disk byte
ratio of the codes layout vs the fp64 layout.

Two knobs trade recall for bytes where SQ8 has one: the shortlist (a true
neighbor is lost only when its ADC rank falls past it — same contract as
SQ8) and the codebook resolution (m subspaces x k_codes centroids — coarser
codes mis-rank more candidates, so the same shortlist recovers less).  The
sweep shows both curves for this corpus so the m/k/shortlist choice is a
measured decision, not a guessed one.  Storage bytes are the scale lever:
probe cost at 100 TB is scan I/O of the probed cells, and the codes layout
is what that scan reads.

Usage: python tools/pq_sweep.py [--sf-dir /root/testdata/sf0.1]
                                [--fixture sf|clustered]
Prints one JSON line:
  {"configs": {"m2_k8": {"recall_vs_fp": {5: r, ...}, "bytes": {...}}, ...}}

``--fixture clustered`` swaps the near-random sf embeddings for a
deterministic mixture-of-Gaussians fixture (tight clusters + a decaying
per-dimension variance spectrum) — the regime the published techniques are
DESIGNED for: residual coding wins when vectors concentrate around their
cell centers, and the OPQ permutation wins when contiguous sub-splitting
would hoard the variance in one subspace.  The sf corpus is structureless
by construction, so its sweep verdicts ("parity-within-noise", "OPQ does
not pay") describe the WRONG regime for the techniques — both fixtures are
published so the m/k/rotate choice is a measured decision on the regime
that matters.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from healthcare_data_pipeline_spark.session import get_spark  # noqa: E402


def clustered_embeddings(spark, n: int = 2000, dim: int = 64, n_clusters: int = 32):
    """Deterministic mixture-of-Gaussians embeddings in the repo's quantized
    convention (vec_id, label, iv: integer-valued array<double>, nrm2).

    Each vector is its cluster's center plus small noise; centers carry a
    DECAYING per-dimension scale (PCA-like spectrum: dim 0 spans ~±256k,
    dim 63 ~±4k) so contiguous PQ sub-splitting hoards the variance in the
    first subspaces — the imbalance the OPQ permutation exists to fix —
    while the tight clusters (noise ±2k vs inter-center distances ~1e5) are
    the regime residual coding exists for.  All components are exact
    integers from xxhash64 bit-mixing — no RNG, reproducible anywhere.
    """
    base = spark.range(n).select(F.col("id").alias("vec_id"))
    c = (F.col("vec_id") % n_clusters).cast("int")
    dims = F.sequence(F.lit(0), F.lit(dim - 1))
    center = (
        F.pmod(F.xxhash64(F.lit("ctr"), c, F.col("d")), F.lit(2001)) - 1000
    ) * (F.lit(dim) - F.col("d")) * 4
    noise = F.pmod(F.xxhash64(F.lit("nz"), F.col("vec_id"), F.col("d")), F.lit(41)) - 20
    en = (
        base.withColumn("label", c)
        .withColumn("d", F.explode(dims))
        .withColumn("v", ((center + noise * 100)).cast("double"))
        .groupBy("vec_id", "label")
        .agg(F.array_sort(F.collect_list(F.struct("d", "v"))).alias("dv"))
        .select(
            "vec_id",
            "label",
            F.transform("dv", lambda x: x["v"]).alias("iv"),
        )
    )
    nrm2 = F.aggregate(
        F.zip_with(F.col("iv"), F.col("iv"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return en.withColumn("nrm2", nrm2)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--fixture", choices=("sf", "clustered"), default="sf")
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--nprobe", type=int, default=2)
    ap.add_argument("--shortlists", default="5,10,20,40")
    ap.add_argument("--configs", default="2:8,8:64,8:256")
    args = ap.parse_args()

    from healthcare_data_pipeline_spark.operators.similarity import (
        ann_index_build_pq,
        ann_index_probe,
        ann_index_probe_pq,
    )
    from healthcare_data_pipeline_spark.queries.similarity import quantized

    spark = get_spark(app_name="hdp-pq-sweep")
    if args.fixture == "clustered":
        en = clustered_embeddings(spark).persist()
        en.count()
    else:
        en = quantized(spark, args.sf_dir)

    def dir_bytes(d: str) -> int:
        return sum(
            os.path.getsize(os.path.join(r, f)) for r, _, fs in os.walk(d) for f in fs
        )

    out: dict[str, dict] = {}
    for cfg in args.configs.split(","):
        m, kc = (int(x) for x in cfg.split(":"))
        # residual (IVFADC, the default) vs raw codes, same (m, k): the
        # measured basis for "residual >= raw at every m" — residuals
        # concentrate near 0 so the m*k codebook capacity describes local
        # structure instead of re-encoding cell offsets (Jégou 2011 §IV.A).
        per_form: dict[str, dict] = {}
        # third form (r13): the OPQ permutation threaded through the
        # persisted layout (rotate=True -> pq_perm/) — the rotated IVFPQ row
        # the rotate= knob trades on, measured at every shortlist depth
        for form, residual, rotate in (
            ("residual", True, None),
            ("raw", False, None),
            ("residual_rotated", True, True),
        ):
            idx = os.path.join(
                tempfile.gettempdir(),
                f"hdp_pq_sweep_idx_{args.fixture}_m{m}_k{kc}_{form}",
            )
            if not os.path.exists(os.path.join(idx, "pq_books")):
                shutil.rmtree(idx, ignore_errors=True)
                ann_index_build_pq(
                    en, idx, m=m, k_codes=kc, residual=residual, rotate=rotate
                )
            qs = en.filter(F.col("vec_id") < 50).select("vec_id", "iv", "nrm2")
            fp = {
                (r.query_id, r.neighbor_id)
                for r in ann_index_probe(
                    spark, idx, qs, k=args.k, nprobe=args.nprobe
                ).collect()
            }
            recall = {}
            for sl in (int(x) for x in args.shortlists.split(",")):
                pq = {
                    (r.query_id, r.neighbor_id)
                    for r in ann_index_probe_pq(
                        spark, idx, qs, k=args.k, nprobe=args.nprobe, shortlist=sl
                    ).collect()
                }
                recall[sl] = round(len(fp & pq) / len(fp), 4)
            fp_b = dir_bytes(os.path.join(idx, "vectors"))
            pq_b = dir_bytes(os.path.join(idx, "pq_codes"))
            per_form[form] = {
                "recall_vs_fp": recall,
                "bytes": {"fp64": fp_b, "pq": pq_b, "ratio": round(fp_b / pq_b, 2)},
            }
        per_form["residual_ge_raw"] = {
            str(sl): per_form["residual"]["recall_vs_fp"][sl]
            >= per_form["raw"]["recall_vs_fp"][sl]
            for sl in per_form["raw"]["recall_vs_fp"]
        }
        out[f"m{m}_k{kc}"] = per_form

    # OPQ permutation row (pq_dim_permutation): ADC-only recall@k of the
    # variance-balanced dim assignment vs plain contiguous sub-splitting at
    # equal (m, k) — no IVF, no rescore, so the number isolates what the
    # rotation buys the CODES.  On near-uniform synthetic embeddings the two
    # are close (there is little imbalance to fix); on skewed dims the gap
    # is the OPQ claim (asserted on a fixture in tests).
    from healthcare_data_pipeline_spark.operators.similarity import (
        brute_topk,
        pq_adc_topk,
        pq_dim_permutation,
        pq_encode,
        pq_train,
    )

    opq: dict[str, dict] = {}
    base = en.select("vec_id", "iv")
    q = en.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("query_id"), F.col("iv").alias("q_iv")
    )
    truth = {
        (r.query_id, r.neighbor_id)
        for r in brute_topk(en, F.col("vec_id") < 50, k=args.k).collect()
    }
    for cfg in args.configs.split(","):
        m, kc = (int(x) for x in cfg.split(":"))
        perm = pq_dim_permutation(base, m=m)
        rec = {}
        for form, rot in (("plain", None), ("rotated", perm)):
            books = pq_train(base, m=m, k=kc, iters=2, rotate=rot)
            codes = pq_encode(base, books, rotate=rot).select("vec_id", "codes")
            # ADC ranks the whole table incl. the query itself (dist 0):
            # take k+1, drop the self-match, keep the k best per query
            rows = pq_adc_topk(q, codes, books, top=args.k + 1, rotate=rot).collect()
            per_q: dict[int, list] = {}
            for r in sorted(rows, key=lambda r: (r.query_id, r.rn)):
                if r.query_id != r.vec_id and len(per_q.setdefault(r.query_id, [])) < args.k:
                    per_q[r.query_id].append(r.vec_id)
            got = {(qi, v) for qi, vs in per_q.items() for v in vs}
            rec[form] = round(len(got & truth) / max(len(truth), 1), 4)
        rec["rotated_ge_plain"] = rec["rotated"] >= rec["plain"]
        opq[f"m{m}_k{kc}"] = rec
    print(
        json.dumps(
            {
                "fixture": args.fixture,
                "sf_dir": args.sf_dir if args.fixture == "sf" else None,
                "k": args.k,
                "nprobe": args.nprobe,
                "configs": out,
                "opq_adc": opq,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
