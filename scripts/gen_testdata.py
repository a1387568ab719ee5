#!/usr/bin/env python
"""Generate scale-factor testdata matching the driver's TESTDATA schema.

The driver ships sf0.001/0.01/0.1 read-only under /root/testdata; proving
the 10x scale step-up (VERDICT r06 item 1) needs sf1, so this regenerates
the same star schema + events/documents/embeddings tables at arbitrary sf
with the sf0.1-measured distributions (cardinality ratios, value ranges,
date windows, doc vocab/length, embedding cluster structure). Deterministic
per (sf, seed); vectorized numpy -> pyarrow, no Spark needed.

Row counts scale linearly from sf0.1 = {customer 15e4*sf, supplier 1e4*sf,
part 2e5*sf, orders 1.5e6*sf, lineitem ~4.07/order, events 1e6*sf,
documents 5e4*sf}; embeddings follow the driver's 4x-per-decade curve
(sf0.01: 500, sf0.1: 2000 -> sf1: 8000).

Usage: python scripts/gen_testdata.py --sf 1 --out /root/repo/.localdata/sf1
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "STANDARD", "LARGE", "MEDIUM", "PROMO", "SMALL"]
ADJS = ["large", "hot", "blue", "red", "small", "green"]
NOUNS = ["ring", "bolt", "widget", "gear", "gizmo"]
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
LANGS = ["en", "zh", "es", "fr", "de"]
VOCAB = (
    "the sort value hash filter big dup column order a vector part scan "
    "slow agg key window table merge join line small group spark fast "
    "customer query row stream batch data"
).split()

DAY_MS = 86_400_000


def _write(out: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def _ts_day(days: np.ndarray, epoch_day: int) -> pa.Array:
    # midnight timestamps, day resolution, stored as timestamp[us]
    return pa.array(
        ((days.astype("int64") + epoch_day) * DAY_MS * 1000),
        type=pa.timestamp("us"),
    ).cast(pa.timestamp("us"))


def generate(sf: float, out: str, seed: int = 42) -> None:
    rng = np.random.default_rng(seed)
    os.makedirs(out, exist_ok=True)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_evt = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(2000 * (4 ** np.log10(sf / 0.1)))
    n_users = int(15_000 * sf)

    # epoch days for the order-date window 1995-01-01..2001-08-01
    d0 = np.datetime64("1995-01-01").astype("datetime64[D]").astype(int)
    d1 = np.datetime64("2001-08-01").astype("datetime64[D]").astype(int)
    s1 = np.datetime64("2001-11-04").astype("datetime64[D]").astype(int)

    _write(
        out,
        "region",
        pa.table(
            {
                "r_regionkey": pa.array(range(5), pa.int32()),
                "r_name": REGIONS,
            }
        ),
    )
    _write(
        out,
        "nation",
        pa.table(
            {
                "n_nationkey": pa.array(range(25), pa.int32()),
                "n_name": [f"NATION_{i}" for i in range(25)],
                "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
            }
        ),
    )
    _write(
        out,
        "customer",
        pa.table(
            {
                "c_custkey": pa.array(range(n_cust), pa.int64()),
                "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
                "c_nationkey": pa.array(
                    rng.integers(0, 25, n_cust), pa.int32()
                ),
                "c_acctbal": np.round(rng.uniform(-999, 9999, n_cust), 2),
                "c_mktsegment": [
                    SEGMENTS[i] for i in rng.integers(0, 5, n_cust)
                ],
            }
        ),
    )
    _write(
        out,
        "supplier",
        pa.table(
            {
                "s_suppkey": pa.array(range(n_supp), pa.int64()),
                "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
                "s_nationkey": pa.array(
                    rng.integers(0, 25, n_supp), pa.int32()
                ),
                "s_acctbal": np.round(rng.uniform(-999, 9999, n_supp), 2),
            }
        ),
    )
    _write(
        out,
        "part",
        pa.table(
            {
                "p_partkey": pa.array(range(n_part), pa.int64()),
                "p_name": [
                    f"{ADJS[a]} {NOUNS[b]}"
                    for a, b in zip(
                        rng.integers(0, len(ADJS), n_part),
                        rng.integers(0, len(NOUNS), n_part),
                    )
                ],
                "p_brand": [
                    f"Brand#{i}" for i in rng.integers(1, 26, n_part)
                ],
                "p_type": [PTYPES[i] for i in rng.integers(0, 6, n_part)],
                "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
                "p_retailprice": np.round(
                    900.0 + (np.arange(n_part) % 2000) * 0.1, 2
                ),
            }
        ),
    )

    o_dates = rng.integers(d0, d1 + 1, n_ord)
    _write(
        out,
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array(range(n_ord), pa.int64()),
                "o_custkey": pa.array(
                    rng.integers(0, n_cust, n_ord), pa.int64()
                ),
                "o_orderstatus": [
                    "FOP"[i] for i in rng.integers(0, 3, n_ord)
                ],
                "o_totalprice": np.round(
                    rng.uniform(850, 560_000, n_ord), 2
                ),
                "o_orderdate": _ts_day(o_dates - d0, d0),
                "o_orderpriority": [
                    PRIORITIES[i] for i in rng.integers(0, 5, n_ord)
                ],
            }
        ),
    )

    # lineitem: ~4.07 lines/order (poisson(3.1)+1 clipped to 17)
    per_order = np.clip(rng.poisson(3.1, n_ord) + 1, 1, 17)
    l_orderkey = np.repeat(np.arange(n_ord, dtype=np.int64), per_order)
    n_li = len(l_orderkey)
    linenumber = np.concatenate([np.arange(1, k + 1) for k in per_order])
    _write(
        out,
        "lineitem",
        pa.table(
            {
                "l_orderkey": pa.array(l_orderkey, pa.int64()),
                "l_partkey": pa.array(
                    rng.integers(0, n_part, n_li), pa.int64()
                ),
                "l_suppkey": pa.array(
                    rng.integers(0, n_supp, n_li), pa.int64()
                ),
                "l_linenumber": pa.array(linenumber, pa.int32()),
                "l_quantity": rng.integers(1, 51, n_li).astype(float),
                "l_extendedprice": np.round(
                    rng.uniform(900, 105_000, n_li), 2
                ),
                "l_discount": rng.integers(0, 11, n_li) / 100.0,
                "l_tax": rng.integers(0, 9, n_li) / 100.0,
                "l_returnflag": [
                    "ANR"[i] for i in rng.integers(0, 3, n_li)
                ],
                "l_linestatus": ["FO"[i] for i in rng.integers(0, 2, n_li)],
                "l_shipdate": _ts_day(
                    rng.integers(d0 + 1, s1 + 1, n_li) - d0, d0
                ),
            }
        ),
    )

    # events: 30 days of Jan 2024, sorted timestamps with microsecond noise
    t0 = np.datetime64("2024-01-01T00:00:00").astype("datetime64[us]")
    span_us = 30 * DAY_MS * 1000
    ts = np.sort(rng.integers(0, span_us, n_evt)) + t0.astype(int)
    _write(
        out,
        "events",
        pa.table(
            {
                "event_id": pa.array(range(n_evt), pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array(
                    rng.integers(0, n_users, n_evt), pa.int64()
                ),
                "event_type": [
                    EVENT_TYPES[i] for i in rng.integers(0, 5, n_evt)
                ],
                "value": np.round(rng.uniform(0, 560, n_evt), 2),
                "props": [
                    json.dumps({"k": int(k)})
                    for k in rng.integers(0, 100, n_evt)
                ],
            }
        ),
    )

    # documents: 10-100 vocab words; ~1.5% exact dups + ~3% near-dups of
    # earlier docs (mutate 2 tokens) so the dedup operators have real work
    vocab = np.array(VOCAB)
    lengths = rng.integers(10, 101, n_doc)
    texts: list[str] = []
    for i in range(n_doc):
        r = rng.random()
        if i > 10 and r < 0.015:
            texts.append(texts[rng.integers(0, i)])
            continue
        toks = vocab[rng.integers(0, len(vocab), lengths[i])]
        if i > 10 and r < 0.045:
            base = texts[rng.integers(0, i)].split(" ")
            for _ in range(2):
                base[rng.integers(0, len(base))] = str(
                    vocab[rng.integers(0, len(vocab))]
                )
            toks = np.array(base)
        texts.append(" ".join(toks))
    _write(
        out,
        "documents",
        pa.table(
            {
                "doc_id": pa.array(range(n_doc), pa.int64()),
                "text": texts,
                "lang": [
                    LANGS[i]
                    for i in rng.choice(
                        5, n_doc, p=[0.41, 0.15, 0.15, 0.15, 0.14]
                    )
                ],
                "source": [
                    f"src{i}" for i in rng.integers(0, 20, n_doc)
                ],
                "n_chars": pa.array(
                    [len(t) for t in texts], pa.int64()
                ),
            }
        ),
    )

    # embeddings: 64-dim float32, 10 Gaussian clusters (label = cluster)
    dim, n_lab = 64, 10
    centroids = rng.normal(0, 1, (n_lab, dim))
    labels = rng.integers(0, n_lab, n_emb)
    vecs = centroids[labels] + rng.normal(0, 0.35, (n_emb, dim))
    vecs = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)).astype(
        np.float32
    )
    _write(
        out,
        "embeddings",
        pa.table(
            {
                "vec_id": pa.array(range(n_emb), pa.int64()),
                "embedding": pa.array(
                    list(vecs), pa.list_(pa.float32())
                ),
                "label": pa.array(labels, pa.int32()),
            }
        ),
    )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    print(f"generating sf={args.sf} -> {args.out}")
    generate(args.sf, args.out, args.seed)
    print("done")
