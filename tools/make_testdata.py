"""Deterministic synthetic testdata generator for CI.

The grading driver supplies the canonical tables under /root/testdata (see
TESTDATA.md — read-only, never regenerated here).  CI machines don't have
them, so this script synthesizes SCHEMA-COMPATIBLE stand-ins at tiny scale:
same ten tables, same column names/types (events.ts defaults to the driver's
current TIMESTAMP(MICROS) layout; ``--ts-unit ns`` emits TIMESTAMP(NANOS) to
exercise the catalog's nanos shim), similar value
domains, plus injected exact/near-duplicate documents so the dedup queries
have non-degenerate work.  The oracle test gate (tests/test_oracle_queries.py)
compares Spark vs DuckDB on whatever data SPARK_GRAFT_TEST_SF_DIR points at,
so correctness runs end-to-end in CI without the driver's files.

Usage: python tools/make_testdata.py --out ci_testdata/sf0.001 [--sf 0.001]
"""

from __future__ import annotations

import argparse
import json
import os
import random

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "PROMO", "STANDARD", "SMALL", "LARGE"]
EVENT_TYPES = ["click", "view", "signup", "purchase", "error"]
LANGS = ["en", "es", "de", "fr", "zh"]
VOCAB = (
    "spark group query row data slow small filter customer line the batch value "
    "merge join a stream sort fast key order table scan part window hash shuffle "
    "plan stage task broadcast partition column schema exact dedup near text"
).split()


def _day_ms(rng: random.Random, y0=1995, y1=2001) -> int:
    # midnight-aligned ms timestamps like the driver's o_orderdate
    day = rng.randrange((y1 - y0 + 1) * 365)
    return ((y0 - 1970) * 365 + 9 + day) * 86_400_000


def generate(out: str, sf: float, seed: int = 42, ts_unit: str = "us") -> None:
    rng = random.Random(seed)
    np_rng = np.random.default_rng(seed)
    m = sf / 0.001  # row counts below are the sf0.001 shape
    n_cust, n_supp, n_part = int(150 * m), max(10, int(10 * m)), int(200 * m)
    n_orders, n_li = int(1500 * m), int(6000 * m)
    n_events, n_docs, n_vecs = int(1000 * m), int(500 * m), int(500 * m)

    os.makedirs(out, exist_ok=True)

    def w(name: str, cols: dict, schema: pa.Schema) -> None:
        pq.write_table(pa.table(cols, schema=schema), os.path.join(out, f"{name}.parquet"))

    w(
        "region",
        {"r_regionkey": list(range(5)), "r_name": REGIONS},
        pa.schema([("r_regionkey", pa.int32()), ("r_name", pa.string())]),
    )
    w(
        "nation",
        {
            "n_nationkey": list(range(25)),
            "n_name": [f"NATION_{i}" for i in range(25)],
            "n_regionkey": [i % 5 for i in range(25)],
        },
        pa.schema(
            [("n_nationkey", pa.int32()), ("n_name", pa.string()), ("n_regionkey", pa.int32())]
        ),
    )
    w(
        "customer",
        {
            "c_custkey": list(range(1, n_cust + 1)),
            "c_name": [f"Customer#{i:09d}" for i in range(1, n_cust + 1)],
            "c_nationkey": [rng.randrange(25) for _ in range(n_cust)],
            "c_acctbal": [round(rng.uniform(-999, 9999), 2) for _ in range(n_cust)],
            "c_mktsegment": [rng.choice(SEGMENTS) for _ in range(n_cust)],
        },
        pa.schema(
            [
                ("c_custkey", pa.int64()),
                ("c_name", pa.string()),
                ("c_nationkey", pa.int32()),
                ("c_acctbal", pa.float64()),
                ("c_mktsegment", pa.string()),
            ]
        ),
    )
    w(
        "supplier",
        {
            "s_suppkey": list(range(1, n_supp + 1)),
            "s_name": [f"Supplier#{i:09d}" for i in range(1, n_supp + 1)],
            "s_nationkey": [rng.randrange(25) for _ in range(n_supp)],
            "s_acctbal": [round(rng.uniform(-999, 9999), 2) for _ in range(n_supp)],
        },
        pa.schema(
            [
                ("s_suppkey", pa.int64()),
                ("s_name", pa.string()),
                ("s_nationkey", pa.int32()),
                ("s_acctbal", pa.float64()),
            ]
        ),
    )
    w(
        "part",
        {
            "p_partkey": list(range(1, n_part + 1)),
            "p_name": [f"part {rng.choice(VOCAB)} {rng.choice(VOCAB)}" for _ in range(n_part)],
            "p_brand": [f"Brand#{rng.randrange(1, 26)}" for _ in range(n_part)],
            "p_type": [rng.choice(PTYPES) for _ in range(n_part)],
            "p_size": [rng.randrange(1, 51) for _ in range(n_part)],
            "p_retailprice": [round(rng.uniform(900, 2000), 2) for _ in range(n_part)],
        },
        pa.schema(
            [
                ("p_partkey", pa.int64()),
                ("p_name", pa.string()),
                ("p_brand", pa.string()),
                ("p_type", pa.string()),
                ("p_size", pa.int32()),
                ("p_retailprice", pa.float64()),
            ]
        ),
    )
    w(
        "orders",
        {
            "o_orderkey": list(range(1, n_orders + 1)),
            "o_custkey": [rng.randrange(1, n_cust + 1) for _ in range(n_orders)],
            "o_orderstatus": [rng.choice(["O", "F", "F", "P"]) for _ in range(n_orders)],
            "o_totalprice": [round(rng.uniform(1000, 400000), 2) for _ in range(n_orders)],
            "o_orderdate": [_day_ms(rng) * 1000 for _ in range(n_orders)],
            "o_orderpriority": [rng.choice(PRIORITIES) for _ in range(n_orders)],
        },
        pa.schema(
            [
                ("o_orderkey", pa.int64()),
                ("o_custkey", pa.int64()),
                ("o_orderstatus", pa.string()),
                ("o_totalprice", pa.float64()),
                ("o_orderdate", pa.timestamp("us")),
                ("o_orderpriority", pa.string()),
            ]
        ),
    )
    w(
        "lineitem",
        {
            "l_orderkey": [rng.randrange(1, n_orders + 1) for _ in range(n_li)],
            "l_partkey": [rng.randrange(1, n_part + 1) for _ in range(n_li)],
            "l_suppkey": [rng.randrange(1, n_supp + 1) for _ in range(n_li)],
            "l_linenumber": [rng.randrange(1, 8) for _ in range(n_li)],
            "l_quantity": [float(rng.randrange(1, 51)) for _ in range(n_li)],
            "l_extendedprice": [round(rng.uniform(900, 100000), 2) for _ in range(n_li)],
            "l_discount": [round(rng.randrange(0, 11) / 100, 2) for _ in range(n_li)],
            "l_tax": [round(rng.randrange(0, 9) / 100, 2) for _ in range(n_li)],
            "l_returnflag": [rng.choice(["R", "A", "N", "N"]) for _ in range(n_li)],
            "l_linestatus": [rng.choice(["O", "F"]) for _ in range(n_li)],
            "l_shipdate": [_day_ms(rng) * 1000 for _ in range(n_li)],
        },
        pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("l_partkey", pa.int64()),
                ("l_suppkey", pa.int64()),
                ("l_linenumber", pa.int32()),
                ("l_quantity", pa.float64()),
                ("l_extendedprice", pa.float64()),
                ("l_discount", pa.float64()),
                ("l_tax", pa.float64()),
                ("l_returnflag", pa.string()),
                ("l_linestatus", pa.string()),
                ("l_shipdate", pa.timestamp("us")),
            ]
        ),
    )
    t0 = 1_704_067_200_000_000_000  # 2024-01-01 in ns
    ts = t0
    ev_ts = []
    for _ in range(n_events):
        ts += rng.randrange(1, 1_000_000_000_000)  # up to ~17 min, ns precision
        ev_ts.append(ts)
    if ts_unit == "us":
        # the driver's current testdata layout: TIMESTAMP(MICROS) without a
        # timezone flag (reads as TIMESTAMP_NTZ); truncation matches the
        # engine's ns->us conversion so oracles agree across units
        ev_ts = [t // 1000 for t in ev_ts]
    w(
        "events",
        {
            "event_id": list(range(1, n_events + 1)),
            "ts": ev_ts,
            "user_id": [rng.randrange(1, max(2, n_events // 20)) for _ in range(n_events)],
            "event_type": [rng.choice(EVENT_TYPES) for _ in range(n_events)],
            "value": [round(rng.uniform(0, 200), 2) for _ in range(n_events)],
            "props": [json.dumps({"k": rng.randrange(100)}) for _ in range(n_events)],
        },
        pa.schema(
            [
                ("event_id", pa.int64()),
                ("ts", pa.timestamp(ts_unit)),
                ("user_id", pa.int64()),
                ("event_type", pa.string()),
                ("value", pa.float64()),
                ("props", pa.string()),
            ]
        ),
    )
    texts: list[str] = []
    for i in range(n_docs):
        r = rng.random()
        if i > 10 and r < 0.05:
            texts.append(texts[rng.randrange(len(texts))])  # exact duplicate
        elif i > 10 and r < 0.10:
            base = texts[rng.randrange(len(texts))].split()  # near duplicate
            base[rng.randrange(len(base))] = rng.choice(VOCAB)
            texts.append(" ".join(base))
        else:
            texts.append(" ".join(rng.choice(VOCAB) for _ in range(rng.randrange(12, 60))))
    # Hostile-whitespace docs (r7 judge task): pad edges and splice interior
    # runs of every ASCII whitespace char INCLUDING \x0B into a small slice,
    # and make a few of them exact duplicates AFTER normalization of earlier
    # docs — so the DuckDB oracle gate itself exercises the engine-divergent
    # edge the explicit [ \t\n\r\f\x0B] class exists for (Java \s includes
    # vertical tab, RE2 \s does not; see queries/dedup.py), instead of only
    # the pytest corpus doing so.
    hostile = ["\t", "\n", "\r", "\f", "\x0b", " \t", "\r\n "]
    for i in range(12, n_docs):
        r = rng.random()
        if r < 0.02:  # mangle in place: same normalized text, hostile shape
            texts[i] = (
                rng.choice(hostile)
                + texts[i].replace(" ", rng.choice(hostile), 3)
                + rng.choice(hostile)
            )
        elif r < 0.03:  # normalized-exact duplicate of an earlier doc
            texts[i] = (
                rng.choice(hostile)
                + texts[rng.randrange(i)].replace(" ", rng.choice(hostile))
                + rng.choice(hostile)
            )
    w(
        "documents",
        {
            "doc_id": list(range(1, n_docs + 1)),
            "text": texts,
            "lang": [rng.choice(LANGS) for _ in range(n_docs)],
            "source": [f"src{rng.randrange(5)}" for _ in range(n_docs)],
            "n_chars": [len(t) for t in texts],
        },
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("text", pa.string()),
                ("lang", pa.string()),
                ("source", pa.string()),
                ("n_chars", pa.int64()),
            ]
        ),
    )
    vecs = np_rng.standard_normal((n_vecs, 64)).astype(np.float32)
    w(
        "embeddings",
        {
            "vec_id": list(range(n_vecs)),
            "embedding": [v.tolist() for v in vecs],
            "label": [int(i % 10) for i in range(n_vecs)],
        },
        pa.schema(
            [
                ("vec_id", pa.int64()),
                ("embedding", pa.list_(pa.float32())),
                ("label", pa.int32()),
            ]
        ),
    )
    print(f"wrote 10 tables to {out} (sf={sf})")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--sf", type=float, default=0.001)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument(
        "--ts-unit",
        choices=("us", "ns"),
        default="us",
        help="events.ts parquet time unit (us = driver's current layout; "
        "ns exercises the catalog's nanos shim)",
    )
    a = ap.parse_args()
    generate(a.out, a.sf, a.seed, a.ts_unit)
