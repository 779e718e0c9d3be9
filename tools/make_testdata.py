"""Generate a seed-parameterized twin of the driver's sf0.01 testdata.

Usage: python tools/make_testdata.py <out_dir> [--seed N] [--scale X]

Purpose (VERDICT r6 item 2): every oracle pass to date ran on the same
seed-42 driver data, so a query can "pass" by accident of that one
dataset — the r4 incident was a wrong-range date filter passing
vacuously on 0 rows. Regenerating the SAME schema / domains / topology
from a DIFFERENT seed and re-running the full differential sweep rules
out seed-overfit: both engines must still agree on data neither has
seen, and row counts must stay non-vacuous.

The generator mirrors the observed seed-42 properties (measured from
/root/testdata/sf0.01 — schemas, value domains, key topology, date
ranges, doc near-dup structure, embedding isotropy), NOT its bytes:

- region/nation: fixed dimensions (names are part of the data contract).
- customer/supplier/part/orders/lineitem: TPC-H-ish star;
  orders span 1995-01-01..~2001-08 (queries assume this range — the
  vacuous-pass trap lives here), lineitem ships 1..95 days after its
  order, 1..7 lines/order.
- events: 30 days of 2024-01 arrivals, cumulative ~260 s exponential
  inter-arrival (burstiness/sessionization queries need realistic gaps),
  5 event types, 150 users, JSON props.
- documents: 30-word vocabulary, 10..99 words/doc, 5 langs / 20
  sources; ~8% of docs are near-copies of an earlier doc with 1-2
  words replaced by the 'dup' marker (drives the dedup family
  non-vacuously).
- embeddings: dim-64 float32, 10 labels, per-label centers sigma=0.05
  + per-vector noise sigma=0.12 (near-isotropic, matching the measured
  recall regime of the IVF/LSH queries).

Pure numpy + pyarrow — no Spark session, deterministic per seed.
Output is gitignored scratch (benchdata/); the committed artifact is the
sweep result ORACLE_r{N}_seed{S}.json.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["O", "F", "P"]
RETURNFLAGS = ["A", "N", "R"]
LINESTATUSES = ["O", "F"]
EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]
PART_ADJ = ["new", "small", "cold", "red", "hot", "large", "blue", "old"]
PART_NOUN = ["gizmo", "anvil", "bolt", "plate", "rod", "widget", "ring", "gear"]
PART_TYPES = ["ECONOMY", "STANDARD", "LARGE", "MEDIUM", "SMALL", "PROMO"]
LANGS = ["en", "zh", "es", "de", "fr"]
LANG_P = [0.44, 0.15, 0.15, 0.13, 0.13]
VOCAB = [
    "join", "hash", "row", "batch", "scan", "customer", "column", "filter",
    "small", "slow", "merge", "order", "vector", "line", "data", "table",
    "agg", "value", "key", "stream", "window", "spark", "a", "group",
    "part", "big", "sort", "query", "fast", "the",
]

DAY_US = 86_400_000_000


def _ts_days(base_day: str, day_offsets: np.ndarray) -> pa.Array:
    base = np.datetime64(base_day, "us").astype(np.int64)
    return pa.array(base + day_offsets.astype(np.int64) * DAY_US, pa.timestamp("us"))


def _write(out: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out, f"{name}.parquet"))
    print(f"{name}: {table.num_rows} rows")


def generate(out: str, seed: int, scale: float) -> None:
    os.makedirs(out, exist_ok=True)
    rng = np.random.RandomState(seed)
    n_cust = max(1, int(1500 * scale))
    n_supp = max(1, int(100 * scale))
    n_part = max(1, int(2000 * scale))
    n_ord = max(1, int(15000 * scale))
    n_ev = max(1, int(10000 * scale))
    n_doc = max(2, int(500 * scale))
    n_users = max(2, int(150 * scale))

    _write(out, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
    }))
    _write(out, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))
    _write(out, "customer", pa.table({
        "c_custkey": pa.array(range(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.randint(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": [SEGMENTS[i] for i in rng.randint(0, 5, n_cust)],
    }))
    _write(out, "supplier", pa.table({
        "s_suppkey": pa.array(range(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.randint(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }))
    _write(out, "part", pa.table({
        "p_partkey": pa.array(range(n_part), pa.int64()),
        "p_name": [
            f"{PART_ADJ[a]} {PART_NOUN[b]}"
            for a, b in zip(rng.randint(0, 8, n_part), rng.randint(0, 8, n_part))
        ],
        "p_brand": [f"Brand#{i}" for i in rng.randint(0, 25, n_part)],
        "p_type": [PART_TYPES[i] for i in rng.randint(0, 6, n_part)],
        "p_size": pa.array(rng.randint(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(900.0 + (np.arange(n_part) % 1000) / 10.0, 2),
    }))

    # orders 1995-01-01 .. +2404 days (~2001-08); the date DOMAIN is a
    # correctness contract — queries filter inside it (r4 vacuous trap)
    odays = rng.randint(0, 2405, n_ord)
    _write(out, "orders", pa.table({
        "o_orderkey": pa.array(range(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.randint(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": [STATUSES[i] for i in rng.randint(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": _ts_days("1995-01-01", odays),
        "o_orderpriority": [PRIORITIES[i] for i in rng.randint(0, 5, n_ord)],
    }))

    lines_per = rng.randint(1, 8, n_ord)
    lkey = np.repeat(np.arange(n_ord, dtype=np.int64), lines_per)
    n_li = int(lines_per.sum())
    lnum = np.concatenate([np.arange(1, k + 1) for k in lines_per]).astype(np.int32)
    _write(out, "lineitem", pa.table({
        "l_orderkey": pa.array(lkey, pa.int64()),
        "l_partkey": pa.array(rng.randint(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.randint(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(lnum, pa.int32()),
        "l_quantity": rng.randint(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": rng.randint(0, 11, n_li) / 100.0,
        "l_tax": rng.randint(0, 9, n_li) / 100.0,
        "l_returnflag": [RETURNFLAGS[i] for i in rng.randint(0, 3, n_li)],
        "l_linestatus": [LINESTATUSES[i] for i in rng.randint(0, 2, n_li)],
        "l_shipdate": _ts_days("1995-01-01", np.repeat(odays, lines_per) + rng.randint(1, 96, n_li)),
    }))

    # events: cumulative exponential arrivals over ~30 days of 2024-01.
    # The gap mean scales INVERSELY with row count so the time span stays
    # ~30 days at any --scale (the January-2024 domain is a contract —
    # windowed/sessionization queries assume it)
    gaps_us = rng.exponential(259_200_000.0 / scale, n_ev)  # span ≈ 30 d
    ts = np.datetime64("2024-01-01", "us").astype(np.int64) + np.cumsum(gaps_us).astype(np.int64)
    _write(out, "events", pa.table({
        "event_id": pa.array(range(n_ev), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(rng.randint(0, n_users, n_ev), pa.int64()),
        "event_type": [EVENT_TYPES[i] for i in rng.randint(0, 5, n_ev)],
        "value": np.round(10.0 ** rng.uniform(-2, 2.69, n_ev), 2),
        "props": [json.dumps({"k": int(k)}) for k in rng.randint(0, 100, n_ev)],
    }))

    # documents: ~8% near-copies of an earlier doc (1-2 words -> 'dup')
    texts: list[str] = []
    for i in range(n_doc):
        if i > 0 and rng.rand() < 0.08:
            words = texts[rng.randint(0, i)].split(" ")
            for _ in range(rng.randint(1, 3)):
                words[rng.randint(0, len(words))] = "dup"
        else:
            words = [VOCAB[w] for w in rng.randint(0, len(VOCAB), rng.randint(10, 100))]
        texts.append(" ".join(words))
    _write(out, "documents", pa.table({
        "doc_id": pa.array(range(n_doc), pa.int64()),
        "text": texts,
        "lang": [LANGS[i] for i in rng.choice(len(LANGS), n_doc, p=LANG_P)],
        "source": [f"src{i}" for i in rng.randint(0, 20, n_doc)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    labels = rng.randint(0, 10, n_doc)
    centers = rng.normal(0.0, 0.05, (10, 64))
    vecs = (centers[labels] + rng.normal(0.0, 0.12, (n_doc, 64))).astype(np.float32)
    _write(out, "embeddings", pa.table({
        "vec_id": pa.array(range(n_doc), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--scale", type=float, default=1.0, help="1.0 == sf0.01 volumes")
    a = ap.parse_args()
    generate(a.out, a.seed, a.scale)
