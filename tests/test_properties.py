"""Property-based tests (hypothesis): invariants that must hold for ANY input,
not just the fixtures — reproducibility guarantees the 100 TB design rests on.

Example counts are kept small because each example runs Spark jobs; the
properties themselves are the point (the reference ships zero tests)."""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from healthcare_data_pipeline_spark.functions import xsum
from healthcare_data_pipeline_spark.operators.anonymize import anonymize, sha256_hex
from healthcare_data_pipeline_spark.operators.skew import salted_sum

_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), min_size=0, max_size=40
)


@given(values=st.lists(_text, min_size=1, max_size=8))
@_SETTINGS
def test_sha2_matches_hashlib_for_any_string(spark, values):
    """F1<->F4 parity (runnerfile.py:267,271): the distributed F.sha2 digest and
    the driver-side hashlib digest must agree for arbitrary unicode, or the
    anonymization mapping join-back silently breaks."""
    df = spark.createDataFrame([(v,) for v in values], "pii string")
    got = {r.pii for r in anonymize(df, ["pii"]).collect()}
    want = {sha256_hex(v) for v in values}
    assert got == want
    assert want == {hashlib.sha256(v.encode("utf-8")).hexdigest() for v in values}


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.decimals(allow_nan=False, allow_infinity=False,
                                                 min_value=-10**6, max_value=10**6, places=2)),
        min_size=1,
        max_size=30,
    )
)
@_SETTINGS
def test_xsum_is_partitioning_independent(spark, rows):
    """The decimal-exact sum must give identical doubles under any partitioning
    (the property that makes results hash-comparable across engines/cluster sizes)."""
    df = spark.createDataFrame([(k, float(v)) for k, v in rows], "k int, v double")
    a = df.coalesce(1).groupBy("k").agg(xsum("v", "s")).collect()
    b = df.repartition(13).groupBy("k").agg(xsum("v", "s")).collect()
    assert {(r.k, r.s) for r in a} == {(r.k, r.s) for r in b}


@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["hot", "a", "b"]), st.integers(0, 10**6)),
        min_size=1,
        max_size=40,
    ),
    n_salts=st.integers(2, 8),
)
@_SETTINGS
def test_salted_sum_equals_plain_for_any_data(spark, rows, n_salts):
    df = spark.createDataFrame(
        [(k, i, float(i % 97)) for i, (k, _) in enumerate(rows)], "k string, rid long, v double"
    )
    got = {
        r.k: (round(r.s, 9), r.n_rows)
        for r in salted_sum(df, ["k"], {"v": "s"}, salt_from="rid", n_salts=n_salts).collect()
    }
    want = {
        r.k: (round(r.s, 9), r.n)
        for r in df.groupBy("k").agg(F.sum("v").alias("s"), F.count("*").alias("n")).collect()
    }
    assert got == want


@given(
    events=st.lists(
        st.tuples(
            st.integers(1, 3),          # user_id
            st.integers(0, 50),         # ts offset (seconds) — collisions likely
            st.sampled_from(["click", "purchase"]),
            st.integers(0, 100),        # value basis
        ),
        min_size=1,
        max_size=25,
    )
)
@_SETTINGS
def test_asof_join_matches_python_reference(spark, events):
    """q28's union-and-window as-of join must match a straightforward Python
    reference (latest purchase at ts <= click.ts; ties -> purchase first,
    then max event_id) for ARBITRARY event sets, including ts collisions."""
    import datetime as dt

    from healthcare_data_pipeline_spark.queries import catalog

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(seconds=off), uid, etype, float(v), "{}")
        for i, (uid, off, etype, v) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    import os
    import tempfile

    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    got = {
        r.click_id: (r.last_purchase_ts, r.last_purchase_value)
        for r in catalog()["q28_asof_join"].fn(spark, d).collect()
    }

    want = {}
    for eid, ts, uid, etype, v, _ in rows:
        if etype != "click":
            continue
        cands = [
            (p_ts, p_eid, p_v)
            for (p_eid, p_ts, p_uid, p_etype, p_v, _) in rows
            if p_uid == uid and p_etype == "purchase" and p_ts <= ts
        ]
        if cands:
            p_ts, _, p_v = max(cands, key=lambda c: (c[0], c[1]))
            want[eid] = (p_ts, p_v)
        else:
            want[eid] = (None, None)
    assert got == want


@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["copy", "near", "fresh"]),
            st.integers(0, 4),  # which earlier doc to copy/mutate
            st.lists(st.sampled_from("alpha beta gamma delta epsilon zeta".split()),
                     min_size=0, max_size=12),
        ),
        min_size=1,
        max_size=12,
    )
)
@_SETTINGS
def test_dedup_corpus_matches_union_find(spark, docs):
    """The composed dedup front door (exact -> LSH pairs -> components ->
    canonical filter) must keep exactly the min-id survivor of every duplicate
    group for ARBITRARY corpora — including sub-3-token docs (no shingles),
    whitespace-variant exact dups, and chained near-dup clusters.  Oracle: the
    same candidate pairs fed to a driver-side union-find."""
    from healthcare_data_pipeline_spark.operators.dedup_corpus import (
        dedup_corpus,
        normalized_fingerprint,
        portable_minhash_pairs,
    )

    texts: list[str] = []
    for kind, ref, words in docs:
        if kind == "copy" and texts:
            texts.append("  " + texts[ref % len(texts)].upper() + " ")  # normalization-equal
        elif kind == "near" and texts:
            texts.append(texts[ref % len(texts)] + " zeta")
        else:
            texts.append(" ".join(words))
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")

    kept_rows = (
        df.select(normalized_fingerprint("text").alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .collect()
    )
    kept_ids = sorted(r.doc_id for r in kept_rows)
    kdf = df.join(spark.createDataFrame([(i,) for i in kept_ids], "doc_id long"), "doc_id", "left_semi")
    pairs = [(r.d1, r.d2) for r in portable_minhash_pairs(kdf).collect()]

    parent = {i: i for i in kept_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = sorted(i for i in kept_ids if find(i) == i)

    got = sorted(r.doc_id for r in dedup_corpus(df).select("doc_id").collect())
    assert got == want


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)).filter(lambda t: t[0] != t[1]),
        min_size=1,
        max_size=25,
    ),
)
@_SETTINGS
def test_connected_components_hybrid_matches_union_find(spark, edges):
    """For ANY small graph, both sides of the size gate (driver union-find and
    forced distributed label propagation) must produce the reference
    union-find's components — dedup survivor sets depend on it."""
    from healthcare_data_pipeline_spark.operators.components import connected_components

    df = spark.createDataFrame(edges, "d1 long, d2 long")

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {v: find(v) for v in parent}

    got_driver = {r.vertex: r.component for r in connected_components(df).collect()}
    got_dist = {
        r.vertex: r.component
        for r in connected_components(df, max_iter=40, driver_threshold=0).collect()
    }
    assert got_driver == want
    assert got_dist == want


@given(
    vecs=st.lists(
        st.lists(st.integers(-1_000_000, 1_000_000), min_size=4, max_size=4),
        min_size=2,
        max_size=12,
    ),
    probe=st.lists(st.integers(-3_000_000, 3_000_000), min_size=4, max_size=4),
)
@_SETTINGS
def test_sq8_codes_and_dequantize_integer_contract(spark, vecs, probe):
    """The SQ8 storage contract for ANY integer vectors (dim=4 keeps the
    Spark jobs small; the arithmetic is per-dimension so dimension count is
    irrelevant): against bounds frozen over the build set,

    - every code is an integer level in 0..255, computed by the documented
      floor rule — a pure-Python mirror must agree bit-for-bit (the property
      the DuckDB oracle generalizes);
    - dequantization lands within one level width of the (clamped) input:
      |dq - clamp(v)| <= span/255 + 1;
    - encoding is monotone per dimension (a larger component never gets a
      smaller code) — the property that makes ADC ranking meaningful;
    - out-of-range probes CLAMP to the representable extremes.
    """
    from healthcare_data_pipeline_spark.operators.similarity import (
        _SQ8_CODE_SQL,
        _SQ8_DQ_SQL,
        sq8_bounds,
    )

    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    en = spark.createDataFrame(rows, "vec_id long, iv array<double>")
    b = sq8_bounds(en).collect()[0]
    lo, hi = list(b.lo), list(b.hi)

    def py_code(v, d):
        span = max(hi[d] - lo[d], 1)
        cl = min(max(int(v), lo[d]), hi[d])
        return ((cl - lo[d]) * 255) // span

    def py_dq(c, d):
        span = hi[d] - lo[d]
        return lo[d] + (c * span + 127) // 255

    # encode the build vectors plus one arbitrary probe (exercises clamping)
    probe_row = [(len(vecs), [float(x) for x in probe])]
    allv = spark.createDataFrame(rows + probe_row, "vec_id long, iv array<double>")
    coded = allv.crossJoin(
        F.broadcast(
            spark.createDataFrame([(lo, hi)], "__lo array<bigint>, __hi array<bigint>")
        )
    ).selectExpr(
        "vec_id",
        "iv",
        _SQ8_CODE_SQL.format(iv="iv", lo="__lo", hi="__hi") + " AS qc",
        _SQ8_DQ_SQL.format(qc=_SQ8_CODE_SQL.format(iv="iv", lo="__lo", hi="__hi"), lo="__lo", hi="__hi")
        + " AS dq",
    )
    for r in coded.collect():
        for d in range(4):
            v = r.iv[d]
            assert 0 <= r.qc[d] <= 255
            assert r.qc[d] == py_code(v, d)  # bit-exact vs the Python mirror
            assert r.dq[d] == py_dq(r.qc[d], d)
            clamped = min(max(v, lo[d]), hi[d])
            span = hi[d] - lo[d]
            assert abs(r.dq[d] - clamped) <= span / 255 + 1
        # monotone per dimension across all encoded vectors
    rows_by_dim = coded.collect()
    for d in range(4):
        pairs = sorted((r.iv[d], r.qc[d]) for r in rows_by_dim)
        for (v1, c1), (v2, c2) in zip(pairs, pairs[1:]):
            assert c1 <= c2, f"dim {d}: code not monotone ({v1}->{c1}, {v2}->{c2})"


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    vecs=st.lists(
        st.lists(st.integers(min_value=-1000, max_value=1000), min_size=4, max_size=4),
        min_size=1,
        max_size=24,
    ),
    k=st.integers(min_value=1, max_value=5),
    iters=st.integers(min_value=0, max_value=3),
)
def test_kmeans_assign_matches_python_lloyd(spark, vecs, k, iters):
    """kmeans_assign == a literal python integer-Lloyd for ANY vector set,
    any k, any iteration count — including duplicate vectors, ties (broken
    toward the lowest cluster id), empty cells, and k > n."""
    from healthcare_data_pipeline_spark.operators.similarity import kmeans_assign

    dim = 4
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    en = spark.createDataFrame(rows, "vec_id long, iv array<double>").repartition(3)
    got = {
        r.vec_id: (r.cluster_id, r.dist_sq)
        for r in kmeans_assign(en, k=k, iters=iters).collect()
    }

    ids = sorted(i for i, _ in rows)
    vm = {i: [int(x) for x in v] for i, v in rows}
    cents = {j: [float(x) for x in vm[i]] for j, i in enumerate(ids[:k])}

    def assign(cents):
        out = {}
        for i in ids:
            best = min(
                sum((x - y) * (x - y) for x, y in zip(vm[i], c)) * k + j
                for j, c in cents.items()
            )
            out[i] = (int(best % k), (int(best) - int(best % k)) // k)
        return out

    def tdiv(s, n):
        return -((-s) // n) if s < 0 else s // n

    for _ in range(iters):
        a = assign(cents)
        sums, ns = {}, {}
        for i, (j, _) in a.items():
            ns[j] = ns.get(j, 0) + 1
            acc = sums.setdefault(j, [0] * dim)
            for p, x in enumerate(vm[i]):
                acc[p] += x
        cents = {j: [float(tdiv(s, ns[j])) for s in sums[j]] for j in sums}
    assert got == assign(cents)


def test_dot_unrolled_bit_identical_to_fold(spark):
    """dot_unrolled must equal the sequential fold BITWISE for every array
    length: the dim_hint fast path (unrolled left-assoc sum) on matching
    dims, the fold fallback on every other dim — a wrong hint may only cost
    speed, never a bit of the value (the similarity family's hash contract)."""
    import random
    import struct

    from healthcare_data_pipeline_spark.functions import dot_unrolled, vec_dot

    rng = random.Random(42)
    rows = []
    for i in range(200):
        d = rng.choice([64, 64, 64, 0, 1, 3, 63, 65])
        a = [rng.uniform(-1e6, 1e6) for _ in range(d)]
        b = [rng.uniform(-1e6, 1e6) for _ in range(d)]
        rows.append((i, a, b))
    df = spark.createDataFrame(rows, "id long, a array<double>, b array<double>")
    out = df.select(
        "id",
        vec_dot("a", "b").alias("f"),
        dot_unrolled("a", "b", dim_hint=64).alias("u"),
    ).collect()
    assert len(out) == 200
    for r in out:
        assert struct.pack("<d", r.f) == struct.pack("<d", r.u), r
