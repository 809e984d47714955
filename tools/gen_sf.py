#!/usr/bin/env python
"""Generate a scaled copy of the driver's synthetic testdata schema
(TESTDATA.md: TPC-H-ish star schema + events/documents/embeddings) for
scale-validation runs ABOVE the provided sf0.1 — the sandbox's testdata
is read-only and tops out at sf0.1, so the 10x point for SCALING.md is
produced locally with this generator.

Distributions mirror the driver data's observed shape (same schemas,
key ranges scaled linearly, same categorical mixes, same 31-word
document vocabulary, ~0.2% exact-duplicate documents, unit-norm random
embeddings, Poisson(4) lineitems per order). Absolute numbers need not
match the driver bit-for-bit: scaling exponents are always computed
between two dirs produced by THIS generator (same seed discipline), so
the generator cancels out.

Usage: python tools/gen_sf.py <sf> <outdir>   e.g. 1.0 .scratch/sf1
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
VOCAB = np.array(
    "a agg batch big column customer data dup fast filter group hash join key "
    "line merge order part query row scan slow small sort spark stream table "
    "the value vector window".split()
)
LANGS = np.array(["en", "zh", "es", "fr", "de"])
LANG_P = np.array([0.41, 0.15, 0.15, 0.15, 0.14])
SEGMENTS = np.array(["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"])
PRIORITIES = np.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"])
PTYPES = np.array(["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"])
ADJS = np.array(["large", "hot", "blue", "red", "small", "green", "dark", "light"])
NOUNS = np.array(["ring", "bolt", "screw", "nut", "gear", "plate", "rod", "cap"])
EVENT_TYPES = np.array(["view", "click", "signup", "purchase", "error"])
DAY_US = 86_400_000_000


def _write(outdir: str, name: str, table: dict) -> None:
    pq.write_table(
        pa.table(table), os.path.join(outdir, f"{name}.parquet"),
        coerce_timestamps="us", allow_truncated_timestamps=True,
    )
    n = len(next(iter(table.values())))
    print(f"  {name}: {n} rows")


def _ts_us(base: str, us: np.ndarray) -> pa.Array:
    b = np.datetime64(base, "us").astype("int64")
    return pa.array(b + us, type=pa.timestamp("us"))


def generate(sf: float, outdir: str) -> None:
    rng = np.random.default_rng(SEED)
    os.makedirs(outdir, exist_ok=True)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)

    _write(outdir, "region", {
        "r_regionkey": np.arange(5, dtype="int32"),
        "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
    })
    _write(outdir, "nation", {
        "n_nationkey": np.arange(25, dtype="int32"),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": (np.arange(25) % 5).astype("int32"),
    })
    _write(outdir, "supplier", {
        "s_suppkey": np.arange(n_supp, dtype="int64"),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": rng.integers(0, 25, n_supp).astype("int32"),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    })
    _write(outdir, "customer", {
        "c_custkey": np.arange(n_cust, dtype="int64"),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": rng.integers(0, 25, n_cust).astype("int32"),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": SEGMENTS[rng.integers(0, 5, n_cust)],
    })
    _write(outdir, "part", {
        "p_partkey": np.arange(n_part, dtype="int64"),
        "p_name": np.char.add(
            np.char.add(ADJS[rng.integers(0, 8, n_part)], " "),
            NOUNS[rng.integers(0, 8, n_part)],
        ),
        "p_brand": np.array([f"Brand#{b}" for b in rng.integers(0, 25, n_part)]),
        "p_type": PTYPES[rng.integers(0, 6, n_part)],
        "p_size": rng.integers(1, 51, n_part).astype("int32"),
        "p_retailprice": np.round(rng.uniform(900, 2100, n_part), 2),
    })

    o_date_days = rng.integers(0, 2404, n_ord)  # 1995-01-01 .. 2001-08-01
    _write(outdir, "orders", {
        "o_orderkey": np.arange(n_ord, dtype="int64"),
        "o_custkey": rng.integers(0, n_cust, n_ord),
        "o_orderstatus": np.array(["O", "P", "F"])[rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1000, 500_000, n_ord), 2),
        "o_orderdate": _ts_us("1995-01-01", o_date_days * DAY_US),
    })

    l_ord = rng.integers(0, n_ord, n_li)  # Poisson(4) lines/order incl. zeros
    l_ord = np.sort(l_ord)
    # per-order running sequence number via cumulative reset
    seq = np.arange(n_li) - np.maximum.accumulate(
        np.where(np.concatenate([[True], l_ord[1:] != l_ord[:-1]]), np.arange(n_li), 0)
    )
    linenum = (seq % 7 + 1).astype("int32")
    qty = rng.integers(1, 51, n_li).astype("float64")
    _write(outdir, "lineitem", {
        "l_orderkey": l_ord,
        "l_partkey": rng.integers(0, n_part, n_li),
        "l_suppkey": rng.integers(0, n_supp, n_li),
        "l_linenumber": linenum,
        "l_quantity": qty,
        "l_extendedprice": np.round(qty * rng.uniform(900, 2100, n_li), 2),
        "l_discount": np.round(rng.uniform(0, 0.1, n_li), 2),
        "l_tax": np.round(rng.uniform(0, 0.08, n_li), 2),
        "l_returnflag": np.array(["R", "A", "N"])[rng.integers(0, 3, n_li)],
        "l_linestatus": np.array(["O", "F"])[rng.integers(0, 2, n_li)],
        "l_shipdate": _ts_us(
            "1995-01-01", (o_date_days[l_ord] + rng.integers(1, 96, n_li)) * DAY_US
        ),
    })

    ev_us = rng.integers(0, 30 * DAY_US, n_ev)
    ks = rng.integers(0, 100, n_ev)
    _write(outdir, "events", {
        "event_id": np.arange(n_ev, dtype="int64"),
        "ts": _ts_us("2024-01-01", np.sort(ev_us)),
        "user_id": rng.integers(0, n_users, n_ev),
        "event_type": EVENT_TYPES[rng.integers(0, 5, n_ev)],
        "value": np.round(rng.exponential(50, n_ev), 2),
        "props": np.array([f'{{"k": {k}}}' for k in ks]),
    })

    lens = rng.integers(10, 101, n_doc)
    words = VOCAB[rng.integers(0, len(VOCAB), int(lens.sum()))]
    bounds = np.concatenate([[0], np.cumsum(lens)])
    texts = np.array(
        [" ".join(words[bounds[i]:bounds[i + 1]]) for i in range(n_doc)], dtype=object
    )
    dup_idx = rng.choice(n_doc, max(2, int(0.002 * n_doc)), replace=False)
    texts[dup_idx[1:]] = texts[dup_idx[0]]  # exact-duplicate cluster
    _write(outdir, "documents", {
        "doc_id": np.arange(n_doc, dtype="int64"),
        "text": texts,
        "lang": LANGS[rng.choice(5, n_doc, p=LANG_P)],
        "source": np.array([f"src{s}" for s in rng.integers(0, 20, n_doc)]),
        "n_chars": np.array([len(t) for t in texts], dtype="int64"),
    })

    vecs = rng.normal(0, 1, (n_emb, 64)).astype("float32")
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    _write(outdir, "embeddings", {
        "vec_id": np.arange(n_emb, dtype="int64"),
        "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
        "label": rng.integers(0, 10, n_emb).astype("int32"),
    })


if __name__ == "__main__":
    sf, outdir = float(sys.argv[1]), sys.argv[2]
    print(f"generating sf={sf} -> {outdir}")
    generate(sf, outdir)
