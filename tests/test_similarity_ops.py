"""ANN scale-path quality: the approximate operators must be measurably useful
approximations of the brute-force baseline, not just runnable."""

from __future__ import annotations

from pyspark.sql import functions as F

from healthcare_data_pipeline_spark.operators.similarity import (
    centroid_assign,
    lsh_bucket,
    lsh_candidate_pairs,
)
from healthcare_data_pipeline_spark.queries.similarity import quantized
from tests.conftest import SF_DIR


def test_lsh_buckets_are_deterministic_and_bounded(spark):
    en = quantized(spark, SF_DIR)
    b1 = {r.vec_id: r.bucket for r in lsh_bucket(en).select("vec_id", "bucket").collect()}
    b2 = {
        r.vec_id: r.bucket
        for r in lsh_bucket(en.repartition(7)).select("vec_id", "bucket").collect()
    }
    assert b1 == b2  # partitioning-independent signatures
    assert all(0 <= v < 256 for v in b1.values())


def test_lsh_candidates_have_higher_sim_than_population(spark):
    """LSH bucketing must enrich for similar pairs: mean cosine of intra-bucket
    pairs exceeds the all-pairs mean (the property that makes candidate
    pruning sound)."""
    en = quantized(spark, SF_DIR).cache()
    cand_mean = (
        lsh_candidate_pairs(en).agg(F.avg("cosine_sim").alias("m")).collect()[0].m
    )
    a = en.select(F.col("vec_id").alias("d1"), F.col("iv").alias("a_iv"), F.col("nrm2").alias("a_n"))
    b = en.select(F.col("vec_id").alias("d2"), F.col("iv").alias("b_iv"), F.col("nrm2").alias("b_n"))
    dot = F.aggregate(
        F.zip_with(F.col("a_iv"), F.col("b_iv"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    sim = dot / (F.sqrt(F.col("a_n")) * F.sqrt(F.col("b_n")))
    pop_mean = (
        a.join(b, F.col("d1") < F.col("d2"))
        .select(sim.alias("s"))
        .agg(F.avg("s").alias("m"))
        .collect()[0]
        .m
    )
    en.unpersist()
    assert cand_mean > pop_mean


def test_lsh_recall_of_high_sim_pairs(spark):
    """Candidate set must recover a solid fraction of the truly-similar pairs
    (sim >= 0.8). With 8 hyperplanes, P(collision) = (1 - theta/pi)^8 >= 0.16
    at sim 0.8, and the driver's embeddings are label-clustered, so observed
    recall is far higher; assert a conservative floor."""
    en = quantized(spark, SF_DIR).cache()
    cand = lsh_candidate_pairs(en).filter(F.col("cosine_sim") >= 0.8).select("d1", "d2")
    a = en.select(F.col("vec_id").alias("d1"), F.col("iv").alias("a_iv"), F.col("nrm2").alias("a_n"))
    b = en.select(F.col("vec_id").alias("d2"), F.col("iv").alias("b_iv"), F.col("nrm2").alias("b_n"))
    dot = F.aggregate(
        F.zip_with(F.col("a_iv"), F.col("b_iv"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    sim = dot / (F.sqrt(F.col("a_n")) * F.sqrt(F.col("b_n")))
    truth = (
        a.join(b, F.col("d1") < F.col("d2"))
        .select("d1", "d2", sim.alias("s"))
        .filter(F.col("s") >= 0.8)
        .select("d1", "d2")
    )
    n_truth = truth.count()
    en.unpersist()
    if n_truth == 0:
        return  # no high-sim pairs at this SF — nothing to recall
    n_hit = truth.intersect(cand).count()
    assert n_hit / n_truth >= 0.3


def test_centroid_assign_matches_numpy_oracle(spark):
    """The distributed assignment must pick the same argmax-cosine centroid as
    an independent driver-side numpy computation (ties -> smaller cent_id)."""
    import numpy as np

    en = quantized(spark, SF_DIR)
    rows = en.select("vec_id", "label", "iv").collect()
    vecs = {r.vec_id: np.array(r.iv, dtype=np.float64) for r in rows}
    labels: dict[int, list] = {}
    for r in rows:
        labels.setdefault(r.label, []).append(vecs[r.vec_id])
    cents = {lab: np.mean(np.stack(vs), axis=0) for lab, vs in labels.items()}

    def best_cell(v: np.ndarray) -> int:
        sims = {
            lab: float(v @ c / (np.linalg.norm(v) * np.linalg.norm(c)))
            for lab, c in cents.items()
        }
        top = max(sims.values())
        return min(lab for lab, s in sims.items() if s == top)

    want = {vid: best_cell(v) for vid, v in vecs.items()}
    got = {r.vec_id: r.cell for r in centroid_assign(en).select("vec_id", "cell").collect()}
    # Float sums can differ in the last bits between numpy and Spark's fold;
    # allow disagreement only where the top-2 centroids are within 1e-9.
    mismatches = {vid for vid in want if want[vid] != got[vid]}
    for vid in mismatches:
        v = vecs[vid]
        sims = sorted(
            (float(v @ c / (np.linalg.norm(v) * np.linalg.norm(c))) for c in cents.values()),
            reverse=True,
        )
        assert sims[0] - sims[1] < 1e-9, f"vec {vid}: want {want[vid]}, got {got[vid]}"


def test_approx_stats_accuracy_vs_exact(spark):
    """q35 computes approx and exact side by side and emits tolerance booleans
    (the contract that lets the approximate path replace the exact one at
    scale) — every bound must hold."""
    from healthcare_data_pipeline_spark.queries import catalog

    rows = catalog()["q35_approx_stats"].fn(spark, SF_DIR).collect()
    assert rows
    assert all(r.suppliers_within_tol and r.median_within_tol for r in rows)


def test_seeded_sample_invariants(spark):
    """q36 emits its sampling invariants (fraction band, determinism, subset)
    as booleans — every one must hold."""
    from healthcare_data_pipeline_spark.queries import catalog

    (row,) = catalog()["q36_seeded_sample"].fn(spark, SF_DIR).collect()
    assert row.n_total > 0
    assert row.fraction_within_tol and row.deterministic and row.sample_is_subset


def test_ann_persisted_index_build_and_probe(spark, tmp_path):
    """Persisted IVF index: cell-partitioned layout on disk, probe scans only
    the probed cells (disk partition pruning), and a full-nprobe probe equals
    brute force exactly."""
    import glob
    import os

    from healthcare_data_pipeline_spark.operators.similarity import (
        ann_index_build,
        ann_index_probe,
        brute_topk,
    )
    from healthcare_data_pipeline_spark.plans import formatted_plan

    en = quantized(spark, SF_DIR)
    idx = str(tmp_path / "ann_idx")
    ann_index_build(en, idx)

    cell_dirs = glob.glob(os.path.join(idx, "vectors", "cell=*"))
    n_cells = len(cell_dirs)
    assert n_cells >= 2  # the quantizer produced a real partition layout
    assert os.path.isdir(os.path.join(idx, "centroids"))

    queries = en.filter(F.col("vec_id") <= 10).select("vec_id", "iv", "nrm2")

    # nprobe=1: the vectors scan must carry a disk partition filter on cell
    probe1 = ann_index_probe(spark, idx, queries, k=5, nprobe=1)
    plan = formatted_plan(probe1)
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*cell[^\]]*)\]", plan)
    assert m, plan
    rows1 = probe1.collect()
    assert rows1 and all(r.rn <= 5 for r in rows1)

    # nprobe = all cells == exhaustive search -> exactly brute force
    full = {
        (r.query_id, r.rn): r.neighbor_id
        for r in ann_index_probe(spark, idx, queries, k=5, nprobe=n_cells).collect()
    }
    brute = {
        (r.query_id, r.rn): r.neighbor_id
        for r in brute_topk(en, F.col("vec_id") <= 10, k=5).collect()
    }
    assert full == brute

    # recall is monotone in nprobe (1-probe hits are a subset of the truth)
    hits1 = sum(1 for key, nb in {
        (r.query_id, r.rn): r.neighbor_id for r in rows1
    }.items() if brute.get(key) == nb)
    assert hits1 >= 0 and len(rows1) <= len(brute)


def test_multiprobe_precomputed_quantizer_matches_recompute(spark, tmp_path):
    """ivf_topk_multiprobe(centroids=...) must route identically to the
    self-computed quantizer (cosine is scale-invariant: sum-vector ranking ==
    mean-vector ranking) while keeping the O(corpus) centroid aggregation out
    of the probe plan — the production contract for probe loops at scale."""
    from healthcare_data_pipeline_spark.operators.similarity import (
        int_centroids,
        ivf_topk_multiprobe,
    )
    from healthcare_data_pipeline_spark.plans import formatted_plan

    en = quantized(spark, SF_DIR)
    pred = F.col("vec_id") < 10
    # production shape: the quantizer is a small persisted table, not a
    # corpus-derived subtree
    cent_dir = str(tmp_path / "centroids")
    int_centroids(en).write.parquet(cent_dir)
    recompute = ivf_topk_multiprobe(en, pred, k=5, nprobe=2)
    precomputed = ivf_topk_multiprobe(
        en, pred, k=5, nprobe=2, centroids=spark.read.parquet(cent_dir)
    )
    a = {(r.query_id, r.rn): r.neighbor_id for r in recompute.collect()}
    b = {(r.query_id, r.rn): r.neighbor_id for r in precomputed.collect()}
    assert a == b
    # the recompute path's quantizer subtree (posexplode aggregation) must be
    # absent when the quantizer is supplied
    assert "posexplode" in formatted_plan(recompute).lower()
    assert "posexplode" not in formatted_plan(precomputed).lower()


def test_ann_index_append_extends_without_rebuild(spark, tmp_path):
    """ann_index_append: existing vector files are never rewritten, appended
    vectors land only in cells the frozen quantizer knows, and an exhaustive
    probe over the mixed built+appended index equals brute force on the full
    set."""
    import glob
    import os

    from healthcare_data_pipeline_spark.operators.similarity import (
        ann_index_append,
        ann_index_build,
        ann_index_probe,
        brute_topk,
    )

    en = quantized(spark, SF_DIR)
    idx = str(tmp_path / "idx")
    ann_index_build(en.filter(F.col("vec_id") % 2 == 0), idx)

    def vec_files():
        return {
            p: os.stat(p).st_mtime_ns
            for p in glob.glob(os.path.join(idx, "vectors", "cell=*", "*.parquet"))
        }

    cells_before = set(glob.glob(os.path.join(idx, "vectors", "cell=*")))
    files_before = vec_files()
    ann_index_append(spark, idx, en.filter(F.col("vec_id") % 2 == 1))
    files_after = vec_files()
    # append-only: every pre-existing file survives byte-untouched
    assert set(files_before) <= set(files_after)
    assert all(files_after[p] == t for p, t in files_before.items())
    assert len(files_after) > len(files_before)
    # appended rows only ever land in the frozen quantizer's cells
    assert set(glob.glob(os.path.join(idx, "vectors", "cell=*"))) == cells_before

    n_cells = len(cells_before)
    full = {
        (r.query_id, r.rn): r.neighbor_id
        for r in ann_index_probe(
            spark, idx, en.filter(F.col("vec_id") <= 10).select("vec_id", "iv", "nrm2"),
            k=5, nprobe=n_cells,
        ).collect()
    }
    brute = {
        (r.query_id, r.rn): r.neighbor_id
        for r in brute_topk(en, F.col("vec_id") <= 10, k=5).collect()
    }
    assert full == brute


def test_ann_index_report_flags_drifted_append_and_rebuild_restores_recall(spark, tmp_path):
    """The quantizer-drift failure mode, constructed deliberately: a drifted
    cluster straddling the lab0/lab1 cell boundary is SPLIT by the frozen
    quantizer on append (adjacent true neighbors land in alternating cells),
    so nprobe=1 recall@5 collapses with no error anywhere — while
    ann_index_report's occupancy skew makes the drift observable, and a
    rebuild (which gives the cluster its own cell) restores recall to 1.0."""
    from healthcare_data_pipeline_spark.operators.similarity import (
        ann_index_append,
        ann_index_build,
        ann_index_probe,
        ann_index_report,
        brute_topk,
    )

    D = 8

    def to_en(rows):
        df = spark.createDataFrame(rows, "vec_id long, label string, iv array<double>")
        nrm2 = F.aggregate(
            F.zip_with("iv", "iv", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
        )
        return df.withColumn("nrm2", nrm2)

    # base: 8 one-hot-direction labels x 10 vectors — uniform occupancy
    base = []
    for j in range(8):
        for i in range(10):
            iv = [0.0] * D
            iv[j] = 1000.0 + i
            base.append((j * 100 + i, f"lab{j}", iv))
    # drift: 20 vectors on the lab0/lab1 bisector, +-1 jitter alternating by
    # parity (routes to lab0/lab1 alternately under the frozen quantizer)
    # and a slowly-varying third component (true nearest neighbors are the
    # ADJACENT indices — i.e. the OTHER cell)
    drift = []
    for i in range(20):
        s = 1.0 if i % 2 == 0 else -1.0
        iv = [0.0] * D
        iv[0], iv[1], iv[2] = 1000.0 + s, 1000.0 - s, float(i)
        drift.append((10_000 + i, "drift", iv))
    en, dr = to_en(base), to_en(drift)

    idx = str(tmp_path / "idx")
    ann_index_build(en, idx)
    rep0 = ann_index_report(spark, idx).first()
    assert rep0.n_cells == 8 and rep0.n_vectors == 80 and rep0.n_empty_cells == 0
    assert rep0.skew_ratio == 1.0 and not rep0.rebuild_recommended

    ann_index_append(spark, idx, dr)
    rep1 = ann_index_report(spark, idx, flag_factor=1.5).first()
    # all 20 drifted vectors crowded into the two boundary cells
    assert rep1.n_cells == 8 and rep1.n_vectors == 100
    assert rep1.max_cell == 20 and rep1.rebuild_recommended
    assert abs(rep1.skew_ratio - 1.6) < 1e-12
    # per-cell detail: lab0 and lab1 took +10 each, the rest are untouched
    detail = {r.cell: r.n_vectors for r in ann_index_report(spark, idx, detail=True).collect()}
    assert detail["lab0"] == detail["lab1"] == 20
    assert all(detail[f"lab{j}"] == 10 for j in range(2, 8))

    def recall(index_dir, corpus):
        qs = dr.select("vec_id", "iv", "nrm2")
        got = {
            (r.query_id, r.neighbor_id)
            for r in ann_index_probe(spark, index_dir, qs, k=5, nprobe=1).collect()
        }
        exact = {
            (r.query_id, r.neighbor_id)
            for r in brute_topk(corpus, F.col("vec_id") >= 10_000, k=5).collect()
        }
        return len(got & exact) / len(exact)

    union = en.unionByName(dr)
    appended_recall = recall(idx, union)
    # the drifted cluster's neighbors alternate cells under the frozen
    # quantizer: nprobe=1 recall collapses
    assert appended_recall < 0.7, appended_recall

    # close the loop IN PLACE: report fires -> ann_index_rebuild
    # re-quantizes the same index_dir (atomic rename-aside swap) -> recall
    # restored; the gated form refuses when occupancy is already healthy
    from healthcare_data_pipeline_spark.operators.similarity import ann_index_rebuild

    assert ann_index_rebuild(spark, idx, if_recommended=True, flag_factor=1.5) is True
    rebuilt_recall = recall(idx, union)
    assert rebuilt_recall == 1.0, rebuilt_recall
    import os

    assert not os.path.exists(idx + ".staged") and not os.path.exists(idx + ".aside")
    # the rebuilt index has its own (20-vector) drift cell — mild, expected
    # occupancy variance (skew 1.8 vs 10-vector label cells), under the
    # DEFAULT 4.0 flag; only the boundary-crowding of the frozen-quantizer
    # append was drift signal
    rep2 = ann_index_report(spark, idx).first()
    assert rep2.n_cells == 9 and abs(rep2.skew_ratio - 1.8) < 1e-12
    assert not rep2.rebuild_recommended
    # gated rebuild declines on the healthy index
    assert ann_index_rebuild(spark, idx, if_recommended=True) is False

    import pytest as _pytest

    with _pytest.raises(ValueError, match="variant"):
        ann_index_rebuild(spark, idx, variant="fp16")


def test_ann_index_rebuild_sq8_refreshes_all_layouts(spark, tmp_path):
    """variant='sq8' re-quantizes ALL four artifacts in place — fresh
    centroids (drifted cluster gets its own cell), fresh bounds covering the
    appended components, re-encoded codes for every vector — and the sq8
    probe is exact again at nprobe=1."""
    import os

    from healthcare_data_pipeline_spark.operators.similarity import (
        ann_index_append_sq8,
        ann_index_build_sq8,
        ann_index_probe_sq8,
        ann_index_rebuild,
        brute_topk,
    )

    D = 8

    def to_en(rows):
        df = spark.createDataFrame(rows, "vec_id long, label string, iv array<double>")
        nrm2 = F.aggregate(
            F.zip_with("iv", "iv", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
        )
        return df.withColumn("nrm2", nrm2)

    base = []
    for j in range(8):
        for i in range(10):
            iv = [0.0] * D
            iv[j] = 1000.0 + i
            base.append((j * 100 + i, f"lab{j}", iv))
    drift = []
    for i in range(20):
        s = 1.0 if i % 2 == 0 else -1.0
        iv = [0.0] * D
        iv[0], iv[1], iv[2] = 1000.0 + s, 1000.0 - s, float(i)
        drift.append((10_000 + i, "drift", iv))
    en, dr = to_en(base), to_en(drift)

    idx = str(tmp_path / "idx")
    ann_index_build_sq8(en, idx)
    ann_index_append_sq8(spark, idx, dr)

    assert ann_index_rebuild(spark, idx, variant="sq8", if_recommended=True,
                             flag_factor=1.5) is True
    cents = {
        r.cent_id for r in spark.read.parquet(os.path.join(idx, "centroids")).collect()
    }
    assert "drift" in cents
    codes = spark.read.parquet(os.path.join(idx, "vectors_sq8"))
    assert codes.count() == 100
    # fresh bounds include the drifted third component (base dim-2 range was
    # 0..1009 one-hot; drift pushes nothing ABOVE, but dim 0/1 now co-occur —
    # the decisive check is the probe, exact again at nprobe=1)
    union = en.unionByName(dr)
    qs = dr.select("vec_id", "iv", "nrm2")
    got = {
        (r.query_id, r.neighbor_id)
        for r in ann_index_probe_sq8(spark, idx, qs, k=5, nprobe=1).collect()
    }
    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_topk(union, F.col("vec_id") >= 10_000, k=5).collect()
    }
    assert got == exact


def test_sq8_index_recall_parity_and_storage(spark, tmp_path):
    """The SQ8 layout's contract, all four clauses:

    1. RECALL PARITY: the sq8 probe's top-k loses at most a sliver vs the
       fp probe on the same index (quantization only gates which candidates
       reach the exact rescore);
    2. EXACT SCORES: every (query, neighbor) pair both probes return carries
       the IDENTICAL cosine — sq8 never changes a reported score;
    3. DEQUANTIZE BOUND: |dq - v| <= one quantization level (span/255 + 1)
       for every stored component;
    4. STORAGE: the codes layout is materially smaller on disk than the
       fp64 layout (the 100 TB probe-scan I/O claim).
    """
    import os

    from healthcare_data_pipeline_spark.operators.similarity import (
        ann_index_build_sq8,
        ann_index_probe,
        ann_index_probe_sq8,
    )

    en = quantized(spark, SF_DIR)
    idx = str(tmp_path / "sq8_idx")
    ann_index_build_sq8(en, idx)
    qs = en.filter(F.col("vec_id") < 20).select("vec_id", "iv", "nrm2")
    fp = ann_index_probe(spark, idx, qs, k=5, nprobe=2)
    sq = ann_index_probe_sq8(spark, idx, qs, k=5, nprobe=2, shortlist=20)
    fp_pairs = {(r.query_id, r.neighbor_id): r.cosine_sim for r in fp.collect()}
    sq_pairs = {(r.query_id, r.neighbor_id): r.cosine_sim for r in sq.collect()}
    common = set(fp_pairs) & set(sq_pairs)
    recall = len(common) / len(fp_pairs)
    assert recall >= 0.9, f"sq8 shortlist recall {recall} vs fp probe"
    for key in common:
        assert sq_pairs[key] == fp_pairs[key]  # bit-identical exact rescore

    # dequantize error bound per stored component
    bounds = spark.read.parquet(os.path.join(idx, "sq8_bounds"))
    stored = spark.read.parquet(os.path.join(idx, "vectors")).select("vec_id", "iv")
    codes = spark.read.parquet(os.path.join(idx, "vectors_sq8"))
    from healthcare_data_pipeline_spark.operators.similarity import _SQ8_DQ_SQL

    dq = codes.crossJoin(
        F.broadcast(bounds.select(F.col("lo").alias("__lo"), F.col("hi").alias("__hi")))
    ).select(
        "vec_id",
        F.expr(_SQ8_DQ_SQL.format(qc="qc", lo="__lo", hi="__hi")).alias("dq"),
        F.expr("transform(__hi, (h, i) -> h - element_at(__lo, i + 1))").alias("span"),
    )
    worst = (
        dq.join(stored, "vec_id")
        .selectExpr(
            "aggregate(zip_with(dq, iv, (a, b) -> abs(a - b)), CAST(0.0 AS DOUBLE), "
            "(acc, x) -> greatest(acc, x)) AS err",
            "aggregate(span, CAST(0 AS BIGINT), (acc, x) -> greatest(acc, x)) AS max_span",
        )
        .agg(F.max("err").alias("err"), F.max("max_span").alias("span"))
        .first()
    )
    assert worst.err <= worst.span / 255 + 1

    def dir_bytes(d):
        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(d)
            for f in fs
        )

    fp_bytes = dir_bytes(os.path.join(idx, "vectors"))
    sq_bytes = dir_bytes(os.path.join(idx, "vectors_sq8"))
    assert sq_bytes < fp_bytes / 2, f"sq8 {sq_bytes}B vs fp {fp_bytes}B"


def test_sq8_append_clamps_out_of_range(spark, tmp_path):
    """Appends under the FROZEN bounds clamp out-of-range components instead
    of erroring or writing out-of-range codes: a 3x-scaled vector lands at
    the representable extreme, stays probeable, and every stored code is in
    0..255."""
    import os

    from healthcare_data_pipeline_spark.operators.similarity import (
        ann_index_append_sq8,
        ann_index_build_sq8,
        ann_index_probe_sq8,
    )

    en = quantized(spark, SF_DIR)
    idx = str(tmp_path / "sq8_clamp_idx")
    ann_index_build_sq8(en.filter(F.col("vec_id") < 400), idx)
    nrm2 = F.aggregate(
        F.zip_with(F.col("iv"), F.col("iv"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    wild = (
        en.filter(F.col("vec_id") >= 400)
        .select(
            "vec_id",
            "label",
            F.expr("transform(iv, x -> x * 3.0)").alias("iv"),
        )
        .withColumn("nrm2", nrm2)
    )
    ann_index_append_sq8(spark, idx, wild)
    codes = spark.read.parquet(os.path.join(idx, "vectors_sq8"))
    bad = codes.filter(
        F.expr("exists(qc, c -> c < 0 OR c > 255)")
    ).count()
    assert bad == 0
    n_appended = wild.count()
    assert codes.count() == 400 + n_appended
    # probing still works over the mixed index
    qs = en.filter(F.col("vec_id") < 5).select("vec_id", "iv", "nrm2")
    out = ann_index_probe_sq8(spark, idx, qs, k=3, nprobe=2, shortlist=10)
    assert out.count() > 0


def test_kmeans_assign_contracts(spark):
    """Deterministic integer-Lloyd: partitioning-invariant assignments, exact
    distances, argmin correctness against the final centroids, and the
    degenerate iters=0 / k>n edges."""
    from healthcare_data_pipeline_spark.operators.similarity import kmeans_assign

    en = quantized(spark, SF_DIR)
    out = kmeans_assign(en, k=8, iters=2)
    rows = {r.vec_id: (r.cluster_id, r.dist_sq) for r in out.collect()}
    assert len(rows) == en.count()
    assert set(c for c, _ in rows.values()) <= set(range(8))

    # partitioning invariance: identical bit-for-bit under a hostile layout
    out2 = kmeans_assign(en.repartition(7, "label"), k=8, iters=2)
    assert {r.vec_id: (r.cluster_id, r.dist_sq) for r in out2.collect()} == rows

    # dist_sq is the EXACT squared L2 distance to the assigned centroid, and
    # no other final centroid is strictly closer (argmin correctness) —
    # recompute centroids from the iters=2 assignment path in python
    import collections

    vecs = {r.vec_id: [int(x) for x in r.iv] for r in en.select("vec_id", "iv").collect()}
    seeds = sorted(vecs)[:8]
    cents = {j: vecs[v] for j, v in enumerate(seeds)}

    def assign_once(cents):
        a = {}
        for vid, iv in vecs.items():
            best = min(
                (sum((x - y) * (x - y) for x, y in zip(iv, c)) * 8 + j)
                for j, c in cents.items()
            )
            a[vid] = (int(best % 8), (int(best) - int(best % 8)) // 8)
        return a

    def update(a):
        sums, ns = collections.defaultdict(lambda: [0] * 64), collections.Counter()
        for vid, (j, _) in a.items():
            ns[j] += 1
            for i, x in enumerate(vecs[vid]):
                sums[j][i] += x
        def tdiv(s, n):
            return -((-s) // n) if s < 0 else s // n
        return {j: [float(tdiv(s, ns[j])) for s in sums[j]] for j in sums}

    for _ in range(2):
        cents = update(assign_once(cents))
    assert assign_once(cents) == rows

    # iters=0 assigns directly against the smallest-id seeds: each seed is
    # its own cluster at distance 0
    z = {r.vec_id: (r.cluster_id, r.dist_sq) for r in kmeans_assign(en, k=8, iters=0).collect()}
    for j, v in enumerate(seeds):
        assert z[v] == (j, 0)

    # k > n degenerates to n singleton seeds, never errors
    small = en.filter(F.col("vec_id") < 3)
    zs = kmeans_assign(small, k=8, iters=1)
    assert zs.count() == 3
    assert zs.filter(F.col("dist_sq") != 0).count() == 0


def test_kmeans_assign_sharded_is_bit_identical(spark):
    """centroid_shards: min-of-mins over per-shard ordinals == the unsharded
    global argmin, bit-for-bit — including shard counts that don't divide k,
    exceed k, and the degenerate 1."""
    from healthcare_data_pipeline_spark.operators.similarity import kmeans_assign

    en = quantized(spark, SF_DIR)
    base = {
        r.vec_id: (r.cluster_id, r.dist_sq)
        for r in kmeans_assign(en, k=7, iters=2).collect()
    }
    for shards in (1, 2, 3, 7, 50):
        got = {
            r.vec_id: (r.cluster_id, r.dist_sq)
            for r in kmeans_assign(en, k=7, iters=2, centroid_shards=shards).collect()
        }
        assert got == base, f"shards={shards}"


def test_kmeans_assign_overflow_guard(spark):
    """The 2^53 exactness contract is ENFORCED, not just documented: a
    (dim, max_component) combination whose worst-case dist_sq overflows the
    double mantissa raises before any job runs — and the struct-argmin
    encoding is k-free, so large k alone never trips it."""
    import pytest

    from healthcare_data_pipeline_spark.operators.similarity import kmeans_assign

    en = quantized(spark, SF_DIR)  # dim 64, components <= 6e5
    # dim 64 * (2e7)^2 = 2.6e16 > 2^53: a coarser quantization contract
    # than the data's would silently round distances — refused up front
    with pytest.raises(ValueError, match="exactness overflow"):
        kmeans_assign(en, k=8, iters=0, max_component=1e7)
    # large k under the honest default contract is FINE (the old
    # dist_sq*k+j encoding would have overflowed past k ~ 97)
    out = kmeans_assign(en, k=128, iters=0)
    assert out.count() == en.count()
    with pytest.raises(ValueError, match="centroid_shards"):
        kmeans_assign(en, k=8, centroid_shards=0)


# --- product quantization (s12) ------------------------------------------


def _py_pq(vecs: dict[int, list[float]], m: int, k: int, iters: int):
    """Canonical python mirror of the grouped integer-Lloyd + encode."""
    dim = len(next(iter(vecs.values())))
    sd = dim // m
    subs = {
        (vid, mi): v[mi * sd : (mi + 1) * sd]
        for vid, v in vecs.items()
        for mi in range(m)
    }
    seeds = sorted(vecs)[:k]
    books = {
        mi: [(j, subs[(vid, mi)]) for j, vid in enumerate(seeds)] for mi in range(m)
    }

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    def assign(books):
        return {
            (vid, mi): min((d2(sv, c), j) for j, c in books[mi])[1]
            for (vid, mi), sv in subs.items()
        }

    def tdiv(s, n):
        return s // n if s >= 0 else -((-s) // n)

    for _ in range(iters):
        a = assign(books)
        nb = {}
        for mi in range(m):
            cells = {}
            for vid in vecs:
                cells.setdefault(a[(vid, mi)], []).append(subs[(vid, mi)])
            nb[mi] = sorted(
                (
                    j,
                    [
                        float(tdiv(int(sum(sv[p] for sv in members)), len(members)))
                        for p in range(sd)
                    ],
                )
                for j, members in cells.items()
            )
        books = nb
    a = assign(books)
    # position-codes: index within the j-sorted book
    posmap = {mi: {j: p for p, (j, _) in enumerate(books[mi])} for mi in range(m)}
    codes = {
        vid: [posmap[mi][a[(vid, mi)]] for mi in range(m)] for vid in vecs
    }
    return books, codes


def _pq_fixture(spark):
    import random

    rng = random.Random(7)
    vecs = {i: [float(rng.randrange(-1000, 1000)) for _ in range(8)] for i in range(40)}
    en = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, iv array<double>"
    )
    return vecs, en


def test_pq_train_encode_match_python_mirror(spark):
    from healthcare_data_pipeline_spark.operators.similarity import pq_encode, pq_train

    vecs, en = _pq_fixture(spark)
    books = pq_train(en, m=2, k=4, iters=2)
    got_books = {
        (r.sub_id, r.j): list(r.c) for r in books.collect()
    }
    exp_books, exp_codes = _py_pq(vecs, m=2, k=4, iters=2)
    exp_flat = {
        (mi, j): c for mi, bk in exp_books.items() for j, c in bk
    }
    assert got_books == exp_flat
    got_codes = {
        r.vec_id: list(r.codes)
        for r in pq_encode(en, books).select("vec_id", "codes").collect()
    }
    assert got_codes == exp_codes


def test_pq_adc_exact_on_codes_and_rescore_self_match(spark):
    from healthcare_data_pipeline_spark.operators.similarity import (
        pq_adc_topk,
        pq_encode,
        pq_train,
    )

    vecs, en = _pq_fixture(spark)
    books = pq_train(en, m=2, k=4, iters=2)
    codes = pq_encode(en, books).select("vec_id", "codes")
    q = en.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("iv").alias("q_iv")
    )
    out = pq_adc_topk(q, codes, books, top=3).collect()
    # python ADC recompute
    exp_books, exp_codes = _py_pq(vecs, m=2, k=4, iters=2)

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    for r in out:
        qv, m, sd = vecs[r.query_id], 2, 4
        exp = sum(
            d2(qv[mi * sd : (mi + 1) * sd], exp_books[mi][exp_codes[r.vec_id][mi]][1])
            for mi in range(m)
        )
        assert r.adc_dist == int(exp)
    # exact rescore: each query's own vector must rank first (dist 0)
    r1 = {
        x.query_id: (x.vec_id, x.dist_sq)
        for x in pq_adc_topk(q, codes, books, top=3, rescore=en).filter("rn = 1").collect()
    }
    assert r1 == {0: (0, 0), 1: (1, 0)}


def test_pq_validation_and_plan(spark):
    import pytest as _pytest

    from healthcare_data_pipeline_spark.operators.similarity import (
        pq_adc_topk,
        pq_encode,
        pq_train,
    )

    _, en = _pq_fixture(spark)
    with _pytest.raises(ValueError, match="not divisible"):
        pq_train(en, m=3)
    with _pytest.raises(ValueError, match="overflow"):
        pq_train(en, m=2, max_component=1e8)
    books = pq_train(en, m=2, k=4, iters=1)
    with _pytest.raises(ValueError, match="top"):
        pq_adc_topk(en, en, books, top=0)
    # encode is a zero-shuffle scalar scan: no Exchange, no SortMergeJoin;
    # the only BNLJ is the 1-row broadcast books crossJoin (the repo's
    # scalar-combine pattern).
    plan = (
        pq_encode(en, books)
        .select("vec_id", "codes")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in plan
    head, _, encode_side = plan.partition("BroadcastNestedLoopJoin")
    assert head.count("Exchange") == 0


def test_pq_index_full_shortlist_equals_fp_probe_and_append(spark, tmp_path):
    from healthcare_data_pipeline_spark.operators.similarity import (
        ann_index_append_pq,
        ann_index_build_pq,
        ann_index_probe,
        ann_index_probe_pq,
    )
    from healthcare_data_pipeline_spark.queries.similarity import quantized

    en = quantized(spark, SF_DIR)
    idx = str(tmp_path / "pqidx")
    base = en.filter(F.col("vec_id") % 2 == 0)
    ann_index_build_pq(base, idx)
    q = en.filter(F.col("vec_id").isin(0, 2, 4))
    # PQ probe with an unbounded shortlist must EQUAL the fp probe: the
    # candidate pass only reorders who reaches the rescore, and with
    # everyone rescored the exact ranking is identical.
    pq = ann_index_probe_pq(spark, idx, q, k=5, nprobe=2, shortlist=10**6)
    fp = ann_index_probe(spark, idx, q, k=5, nprobe=2)
    assert sorted(map(tuple, pq.collect())) == sorted(map(tuple, fp.collect()))
    # codes are m smallints per vector
    codes = spark.read.parquet(f"{idx}/pq_codes")
    r = codes.head()
    assert len(r.codes) == 2 and all(0 <= c < 8 for c in r.codes)
    # append under the frozen quantizer+codebooks: appended vectors become
    # findable without a rebuild
    newv = en.filter(F.col("vec_id") % 2 == 1)
    ann_index_append_pq(spark, idx, newv)
    out = ann_index_probe_pq(spark, idx, q, k=5, nprobe=2, shortlist=10**6)
    assert out.filter(F.col("neighbor_id") % 2 == 1).count() > 0

def test_pq_residual_layout_ivfadc(spark, tmp_path):
    """residual=True (default, the Jégou §IV.A IVFADC form): the index
    carries pq_cellmeans/, books train on x − cm(cell), codes differ from
    the raw layout, and the reconstruction math is exact — a cell's center
    itself (residual = 0⃗... approximately: its nearest-code reconstruction)
    must rank its own cell's vectors sensibly.  Probe auto-detects the
    layout; raw (residual=False) stays supported and both satisfy the
    unbounded-shortlist ≡ fp-probe invariant."""
    import os
    from healthcare_data_pipeline_spark.operators.similarity import (
        ann_index_build_pq,
        ann_index_probe,
        ann_index_probe_pq,
    )
    from healthcare_data_pipeline_spark.queries.similarity import quantized

    en = quantized(spark, SF_DIR)
    base = en.filter(F.col("vec_id") % 2 == 0)
    q = en.filter(F.col("vec_id").isin(0, 2, 4))

    res_idx, raw_idx = str(tmp_path / "residx"), str(tmp_path / "rawidx")
    ann_index_build_pq(base, res_idx)  # residual default
    ann_index_build_pq(base, raw_idx, residual=False)
    assert os.path.exists(os.path.join(res_idx, "pq_cellmeans"))
    assert not os.path.exists(os.path.join(raw_idx, "pq_cellmeans"))

    # cell means are integer-valued with exact norms
    cm = spark.read.parquet(os.path.join(res_idx, "pq_cellmeans")).collect()
    for r in cm:
        assert all(float(x).is_integer() for x in r.cm)
        assert r.cmnorm2 == sum(x * x for x in r.cm)

    # the code tables genuinely differ (residual codes describe offsets)
    rc = {r.vec_id: list(r.codes) for r in spark.read.parquet(f"{res_idx}/pq_codes").collect()}
    wc = {r.vec_id: list(r.codes) for r in spark.read.parquet(f"{raw_idx}/pq_codes").collect()}
    assert rc.keys() == wc.keys()
    assert any(rc[k] != wc[k] for k in rc), "residual and raw codes identical?"

    # both layouts: unbounded shortlist == exact fp probe (rescore covers all)
    fp = sorted(map(tuple, ann_index_probe(spark, res_idx, q, k=5, nprobe=2).collect()))
    for idx in (res_idx, raw_idx):
        pq = ann_index_probe_pq(spark, idx, q, k=5, nprobe=2, shortlist=10**6)
        assert sorted(map(tuple, pq.collect())) == fp

def _opq_fixture(spark):
    """Variance-skewed vectors: dims 0-3 span +-1000, dims 4-7 span +-10 —
    plain contiguous sub-splitting puts ALL the variance in subspace 0."""
    import random

    rng = random.Random(11)
    vecs = {
        i: [float(rng.randrange(-1000, 1000)) for _ in range(4)]
        + [float(rng.randrange(-10, 10)) for _ in range(4)]
        for i in range(60)
    }
    en = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, iv array<double>"
    )
    return vecs, en


def test_pq_dim_permutation_balances_variance(spark):
    from healthcare_data_pipeline_spark.operators.similarity import pq_dim_permutation

    _, en = _opq_fixture(spark)
    perm = pq_dim_permutation(en, m=2)
    assert sorted(perm) == list(range(8))
    assert perm == pq_dim_permutation(en, m=2)  # deterministic
    # the 4 high-variance dims (0-3) split 2/2 across the two subspaces
    assert sum(1 for d in perm[:4] if d < 4) == 2
    import pytest as _pytest

    with _pytest.raises(ValueError, match="permutation"):
        from healthcare_data_pipeline_spark.operators.similarity import pq_train

        pq_train(en, m=2, rotate=[0, 1, 2])


def test_pq_rotate_exactness_and_recall(spark):
    """rotate= trains/encodes/ranks in the permuted space.  Exactness: with
    everyone rescored, rotated PQ equals plain PQ equals the exact ranking
    (permutation preserves L2).  Recall: on the variance-skewed fixture the
    balanced assignment's ADC-only top-k beats plain contiguous
    sub-splitting's — the OPQ claim, asserted on a deterministic fixture."""
    from healthcare_data_pipeline_spark.operators.similarity import (
        pq_adc_topk,
        pq_dim_permutation,
        pq_encode,
        pq_train,
    )

    vecs, en = _opq_fixture(spark)
    q = en.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("iv").alias("q_iv")
    )

    def adc_top(rotate):
        books = pq_train(en, m=2, k=4, iters=2, rotate=rotate)
        codes = pq_encode(en, books, rotate=rotate).select("vec_id", "codes")
        return pq_adc_topk(q, codes, books, top=5, rotate=rotate)

    def exact_top(rotate):
        books = pq_train(en, m=2, k=4, iters=2, rotate=rotate)
        codes = pq_encode(en, books, rotate=rotate).select("vec_id", "codes")
        return pq_adc_topk(
            q, codes, books, top=5, rescore=en, shortlist=10**6, rotate=rotate
        )

    perm = pq_dim_permutation(en, m=2)
    ex_plain = sorted(
        (r.query_id, r.vec_id, r.dist_sq, r.rn) for r in exact_top(None).collect()
    )
    ex_rot = sorted(
        (r.query_id, r.vec_id, r.dist_sq, r.rn) for r in exact_top(perm).collect()
    )
    assert ex_plain == ex_rot  # full-rescore ranking is rotation-invariant

    truth = {(a, b) for a, b, _, _ in ex_plain}
    plain = {(r.query_id, r.vec_id) for r in adc_top(None).collect()}
    rot = {(r.query_id, r.vec_id) for r in adc_top(perm).collect()}
    assert len(rot & truth) > len(plain & truth), (
        f"OPQ permutation should improve ADC recall on the skewed fixture: "
        f"rotated {len(rot & truth)} vs plain {len(plain & truth)} of {len(truth)}"
    )

def test_ann_index_rebuild_pq_variant(spark, tmp_path):
    """variant='pq' closes the PQ half of the drift loop: the rebuild
    re-quantizes AND regenerates cell means + codebooks + codes in one
    staged swap, inferring (m, k) from the existing books and keeping the
    residual form — a 'full' rebuild of a PQ index would strand the code
    layout against stale cells."""
    import os
    from healthcare_data_pipeline_spark.operators.similarity import (
        ann_index_append_pq,
        ann_index_build_pq,
        ann_index_probe,
        ann_index_probe_pq,
        ann_index_rebuild,
    )
    from healthcare_data_pipeline_spark.queries.similarity import quantized

    en = quantized(spark, SF_DIR)
    idx = str(tmp_path / "pqidx_rb")
    base = en.filter(F.col("vec_id") % 2 == 0)
    ann_index_build_pq(base, idx, m=2, k_codes=8)
    ann_index_append_pq(spark, idx, en.filter(F.col("vec_id") % 2 == 1))
    assert ann_index_rebuild(spark, idx, variant="pq") is True
    # layout intact and consistent after the swap
    for piece in ("vectors", "centroids", "pq_books", "pq_codes", "pq_cellmeans"):
        assert os.path.exists(os.path.join(idx, piece)), piece
    books = spark.read.parquet(os.path.join(idx, "pq_books"))
    assert books.select("sub_id").distinct().count() == 2
    n_codes = spark.read.parquet(os.path.join(idx, "pq_codes")).count()
    assert n_codes == en.count()
    # rebuilt index still satisfies the unbounded-shortlist == fp invariant
    q = en.filter(F.col("vec_id").isin(0, 1, 2))
    pq = ann_index_probe_pq(spark, idx, q, k=5, nprobe=2, shortlist=10**6)
    fp = ann_index_probe(spark, idx, q, k=5, nprobe=2)
    assert sorted(map(tuple, pq.collect())) == sorted(map(tuple, fp.collect()))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="variant"):
        ann_index_rebuild(spark, idx, variant="nope")

def test_cell_means_cover_empty_quantizer_cells(spark):
    """A quantizer cell with zero build-time members still gets a cellmeans
    row (the zero vector = raw coding): without it, appends routed there
    would silently vanish from the codes layout (inner joins)."""
    import os
    from healthcare_data_pipeline_spark.operators.similarity import (
        _cell_means,
        ann_index_build_pq,
    )
    from healthcare_data_pipeline_spark.queries.similarity import quantized

    en = quantized(spark, SF_DIR)
    assigned = en.limit(20).withColumn("cell", F.lit(3))  # everyone in cell 3
    cent = spark.createDataFrame(
        [(3, [1.0] * 64, 8.0), (9, [1.0] * 64, 8.0)],  # cell 9 is EMPTY
        "cent_id int, cs array<double>, cnorm double",
    )
    cms = {r.cell: r for r in _cell_means(assigned, cent=cent).collect()}
    assert set(cms) == {3, 9}
    assert cms[9].cmnorm2 == 0.0 and all(x == 0.0 for x in cms[9].cm)
    assert cms[3].cmnorm2 > 0.0

    # build invariant: one cellmeans row per quantizer cell
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        idx = os.path.join(d, "idx")
        ann_index_build_pq(en.filter(F.col("vec_id") % 2 == 0), idx)
        n_cells = spark.read.parquet(os.path.join(idx, "centroids")).count()
        n_means = spark.read.parquet(os.path.join(idx, "pq_cellmeans")).count()
        assert n_means == n_cells

def test_pq_index_rotated_layout_frozen_permutation(spark, tmp_path):
    """rotate= threaded through the persisted IVFPQ layout (r12 verdict task
    3): the OPQ permutation persists as pq_perm/ and is FROZEN exactly like
    the cell means — probes build their LUTs in the permuted space (scores
    stay exact: unbounded-shortlist PQ probe == fp probe), appends encode
    against the build-time permutation (old and new codes stay decodable by
    one codebook set), and rebuild re-derives a FRESH permutation because
    pq_meta/ records rotated=true."""
    import os
    from healthcare_data_pipeline_spark.operators.similarity import (
        ann_index_append_pq,
        ann_index_build_pq,
        ann_index_probe,
        ann_index_probe_pq,
        ann_index_rebuild,
    )
    from healthcare_data_pipeline_spark.queries.similarity import quantized

    en = quantized(spark, SF_DIR)
    base = en.filter(F.col("vec_id") % 2 == 0)
    idx = str(tmp_path / "pqrot")
    ann_index_build_pq(base, idx, rotate=True)

    # pq_perm/ is a real permutation of the dims; pq_meta/ records the build
    dim = len(en.select("iv").head().iv)
    perm_before = [
        (r.pos, r.src)
        for r in spark.read.parquet(os.path.join(idx, "pq_perm")).orderBy("pos").collect()
    ]
    assert sorted(src for _, src in perm_before) == list(range(dim))
    meta = spark.read.parquet(os.path.join(idx, "pq_meta")).first()
    assert (meta.m, meta.k_codes, meta.iters, meta.residual, meta.rotated) == (
        2, 8, 2, True, True,
    )

    # exactness survives rotation: unbounded-shortlist PQ probe == fp probe
    q = en.filter(F.col("vec_id").isin(0, 2, 4))
    pq = ann_index_probe_pq(spark, idx, q, k=5, nprobe=2, shortlist=10**6)
    fp = ann_index_probe(spark, idx, q, k=5, nprobe=2)
    assert sorted(map(tuple, pq.collect())) == sorted(map(tuple, fp.collect()))

    # append under the FROZEN permutation: the perm file is untouched and
    # appended vectors become findable through the rotated code layout
    ann_index_append_pq(spark, idx, en.filter(F.col("vec_id") % 2 == 1))
    perm_after = [
        (r.pos, r.src)
        for r in spark.read.parquet(os.path.join(idx, "pq_perm")).orderBy("pos").collect()
    ]
    assert perm_after == perm_before
    grown = ann_index_probe_pq(spark, idx, q, k=5, nprobe=2, shortlist=10**6)
    assert grown.filter(F.col("neighbor_id") % 2 == 1).count() > 0
    fp_grown = ann_index_probe(spark, idx, q, k=5, nprobe=2)
    assert sorted(map(tuple, grown.collect())) == sorted(map(tuple, fp_grown.collect()))

    # rebuild reads pq_meta (no shape inference) and regenerates the rotated
    # layout: meta identical, perm present, exactness invariant still holds
    assert ann_index_rebuild(spark, idx, variant="pq") is True
    meta2 = spark.read.parquet(os.path.join(idx, "pq_meta")).first()
    assert (meta2.m, meta2.k_codes, meta2.iters, meta2.residual, meta2.rotated) == (
        2, 8, 2, True, True,
    )
    assert os.path.exists(os.path.join(idx, "pq_perm"))
    pq2 = ann_index_probe_pq(spark, idx, q, k=5, nprobe=2, shortlist=10**6)
    fp2 = ann_index_probe(spark, idx, q, k=5, nprobe=2)
    assert sorted(map(tuple, pq2.collect())) == sorted(map(tuple, fp2.collect()))


def test_pq_encode_adc_reject_short_permutation(spark):
    """The r12 ADVICE fix: encode/ADC used to validate rotate against
    len(rotate) itself — a short permutation silently TRUNCATED every vector.
    Both paths must now derive the real dim from the codebooks and raise."""
    import pytest as _pytest
    from healthcare_data_pipeline_spark.operators.similarity import (
        pq_adc_topk,
        pq_encode,
        pq_train,
    )

    _, en = _opq_fixture(spark)  # dim 8
    books = pq_train(en, m=2, k=4, iters=1)
    short_perm = [1, 0, 2, 3]  # valid permutation of 0..3, but dim is 8
    with _pytest.raises(ValueError, match="permutation"):
        pq_encode(en, books, rotate=short_perm).head()
    q = en.select(F.col("vec_id").alias("query_id"), F.col("iv").alias("q_iv"))
    with _pytest.raises(ValueError, match="permutation"):
        pq_adc_topk(q, pq_encode(en, books).select("vec_id", "codes"), books,
                    rotate=short_perm).head()


def test_zero_vector_scores_minus_one_not_nan(spark, tmp_path):
    """The r12 ADVICE NaN fix: a zero reconstruction (zero-vector cell mean +
    zero residual centroid) used to produce 0/0 = NaN, which Spark orders
    GREATEST — topping the DESC shortlist and displacing real candidates.
    Zero-norm rows must score -1.0 and rank BELOW every real neighbor."""
    import math
    import os
    from healthcare_data_pipeline_spark.operators.similarity import (
        ann_index_build_pq,
        ann_index_probe_pq,
    )

    # labels are the coarse quantizer cells (int_centroids); the zero
    # vectors get their OWN cell so its mean is the zero vector and the
    # residual reconstruction is exactly zero — the 0/0 shape
    rows = [
        (i, i // 3, [float(v) for v in vec])
        for i, vec in enumerate(
            [[900, -300, 250, 700], [880, -280, 260, 690], [870, -310, 240, 710],
             [-500, 600, -450, 100], [-520, 580, -440, 90], [-510, 610, -430, 110],
             [0, 0, 0, 0], [0, 0, 0, 0]]
        )
    ]
    en = spark.createDataFrame(rows, "vec_id long, label int, iv array<double>").withColumn(
        "nrm2",
        F.aggregate(F.zip_with("iv", "iv", lambda x, y: x * y), F.lit(0.0),
                    lambda a, x: a + x),
    )
    idx = str(tmp_path / "zeroidx")
    ann_index_build_pq(en, idx)
    q = en.filter(F.col("vec_id") == 0)
    out = ann_index_probe_pq(
        spark, idx, q, k=10, nprobe=10, shortlist=10**6
    ).collect()
    assert out, "probe returned nothing"
    assert all(not math.isnan(r.cosine_sim) for r in out)
    by_id = {r.neighbor_id: r for r in out}
    for zid in (6, 7):
        if zid in by_id:
            assert by_id[zid].cosine_sim == -1.0
            assert all(
                by_id[zid].rn > r.rn for r in out if r.neighbor_id not in (6, 7)
            )
