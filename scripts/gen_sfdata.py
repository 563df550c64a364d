"""Synthesize driver-shaped test tables at scale factors the sandbox
doesn't ship (the driver provides sf0.001/0.01/0.1 only; round-6's
mandate is a full-contract sweep at sf1.0 = 10x the largest shipped SF).

The correctness gate compares OUR Spark queries against OUR DuckDB
oracle SQL over the SAME parquet files, so the generator does not need
to reproduce the driver's exact rows — only the schemas (matched to the
shipped parquet byte-types), the key domains the queries filter on, and
the hazard structure that makes the dedup/ANN family interesting:

* documents: the shipped corpus is a ~30-word vocab (that small
  universe is exactly what concentrates global-min shingles and makes
  hot LSH buckets + equal-shingle-set pairs appear at scale), with ~5%
  near-dup plants (a base doc's text with the token "dup" inserted) and
  a handful of exact-copy groups. All three knobs reproduced here.
* embeddings: unit-normalized 64-dim float32 with 10 uninformative
  labels (measured: label centroids have norm ~0.06, i.e. random).
* events: 30 days of ts-sorted rows, 5 types, Zipf-free uniform users.
* TPC-H-ish star tables with the shipped value domains (dates, flags,
  priorities, segments, price ranges) so every filter keeps selectivity.

Deterministic: seed fixed, ids contiguous from 0 (several registry
queries address doc_id 0 / doc_id % k directly).

Usage:
    python scripts/gen_sfdata.py --sf 1.0 --out /root/repo/.sfdata/sf1.0
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 20240817

VOCAB = (
    "spark window merge table column vector stream value data small join "
    "filter big group hash customer sort order slow line part fast the row "
    "agg key query a scan batch"
).split()

LANGS = ["en", "de", "es", "fr", "zh"]
LANG_W = [0.40, 0.15, 0.15, 0.15, 0.15]
SOURCES = [f"src{i}" for i in range(20)]
SEGMENTS = ["AUTOMOBILE", "FURNITURE", "MACHINERY", "BUILDING", "HOUSEHOLD"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["LARGE", "ECONOMY", "SMALL", "STANDARD", "MEDIUM", "PROMO"]
PADJ = ["large", "hot", "blue", "old", "cold", "red", "green", "small"]
PNOUN = ["ring", "bolt", "plate", "screw", "cap", "disk", "rod", "pin"]
ETYPES = ["view", "click", "purchase", "signup", "error"]


def _write(out: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def gen_documents(rng: np.random.Generator, n: int) -> pa.Table:
    n_words = rng.integers(8, 109, n)
    texts = [
        " ".join(np.array(VOCAB)[rng.integers(0, len(VOCAB), k)])
        for k in n_words
    ]
    # near-dup plants: ~5% of ids get a base doc's text with 1-3 "dup"
    # tokens inserted (the shipped corpora's construction, verified by
    # strip-matching at sf0.1)
    n_plant = n // 20
    plant_ids = rng.choice(n, n_plant, replace=False)
    base_ids = rng.integers(0, n, n_plant)
    for pid, bid in zip(plant_ids, base_ids):
        if pid == bid:
            continue
        words = texts[bid].split()
        for _ in range(int(rng.integers(1, 4))):
            words.insert(int(rng.integers(0, len(words) + 1)), "dup")
        texts[pid] = " ".join(words)
    # exact-copy groups: ~0.16% of ids become byte-identical copies
    n_copy = max(n // 625, 2)
    copy_ids = rng.choice(
        np.setdiff1d(np.arange(n), plant_ids), n_copy, replace=False
    )
    copy_base = rng.integers(0, n, n_copy)
    for cid, bid in zip(copy_ids, copy_base):
        if cid != bid:
            texts[cid] = texts[bid]
    lang = rng.choice(LANGS, n, p=LANG_W)
    return pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(lang, pa.string()),
        "source": pa.array(rng.choice(SOURCES, n), pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


def gen_embeddings(rng: np.random.Generator, n: int, dim: int = 64) -> pa.Table:
    m = rng.standard_normal((n, dim)).astype(np.float32)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    return pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array(list(m), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n).astype(np.int32), pa.int32()),
    })


def gen_events(rng: np.random.Generator, n: int, n_users: int) -> pa.Table:
    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    span = np.timedelta64(30, "D") // np.timedelta64(1, "us")
    ts = np.sort(rng.integers(0, span, n))
    return pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(t0 + ts.astype("timedelta64[us]"), pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n_users, n), pa.int64()),
        "event_type": pa.array(rng.choice(ETYPES, n), pa.string()),
        "value": pa.array(
            np.round(np.minimum(rng.exponential(100.0, n), 600.0), 2), pa.float64()
        ),
        "props": pa.array(
            [f'{{"k": {k}}}' for k in rng.integers(0, 100, n)], pa.string()
        ),
    })


def gen_star(rng: np.random.Generator, out: str, sf: float) -> None:
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)

    _write(out, "region", pa.table({
        "r_regionkey": pa.array(np.arange(5, dtype=np.int32), pa.int32()),
        "r_name": pa.array(
            ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"], pa.string()
        ),
    }))
    _write(out, "nation", pa.table({
        "n_nationkey": pa.array(np.arange(25, dtype=np.int32), pa.int32()),
        "n_name": pa.array([f"NATION_{i}" for i in range(25)], pa.string()),
        "n_regionkey": pa.array((np.arange(25) % 5).astype(np.int32), pa.int32()),
    }))
    _write(out, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)], pa.string()),
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust).astype(np.int32), pa.int32()),
        "c_acctbal": pa.array(np.round(rng.uniform(-1000, 10000, n_cust), 2), pa.float64()),
        "c_mktsegment": pa.array(rng.choice(SEGMENTS, n_cust), pa.string()),
    }))
    _write(out, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)], pa.string()),
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp).astype(np.int32), pa.int32()),
        "s_acctbal": pa.array(np.round(rng.uniform(-1000, 10000, n_supp), 2), pa.float64()),
    }))
    _write(out, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": pa.array(
            [f"{a} {b}" for a, b in zip(rng.choice(PADJ, n_part), rng.choice(PNOUN, n_part))],
            pa.string(),
        ),
        "p_brand": pa.array([f"Brand#{i}" for i in rng.integers(1, 26, n_part)], pa.string()),
        "p_type": pa.array(rng.choice(PTYPES, n_part), pa.string()),
        "p_size": pa.array(rng.integers(1, 51, n_part).astype(np.int32), pa.int32()),
        "p_retailprice": pa.array(np.round(rng.uniform(900, 1000, n_part), 2), pa.float64()),
    }))

    d0 = np.datetime64("1995-01-01", "us")
    odate_days = rng.integers(0, 2405, n_ord)  # 1995-01-01 .. 2001-08-01
    odate = d0 + (odate_days * 86_400_000_000).astype("timedelta64[us]")
    _write(out, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(rng.choice(["O", "F", "P"], n_ord, p=[0.48, 0.48, 0.04]), pa.string()),
        "o_totalprice": pa.array(np.round(rng.uniform(1000, 500000, n_ord), 2), pa.float64()),
        "o_orderdate": pa.array(odate, pa.timestamp("us")),
        "o_orderpriority": pa.array(rng.choice(PRIORITIES, n_ord), pa.string()),
    }))

    nlines = rng.integers(1, 8, n_ord)
    okey = np.repeat(np.arange(n_ord), nlines)
    n_li = len(okey)
    linenum = (np.arange(n_li) - np.repeat(np.cumsum(nlines) - nlines, nlines) + 1).astype(np.int32)
    ship = (
        d0
        + (np.repeat(odate_days, nlines) * 86_400_000_000).astype("timedelta64[us]")
        + (rng.integers(1, 121, n_li) * 86_400_000_000).astype("timedelta64[us]")
    )
    _write(out, "lineitem", pa.table({
        "l_orderkey": pa.array(okey, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(linenum, pa.int32()),
        "l_quantity": pa.array(rng.integers(1, 51, n_li).astype(np.float64), pa.float64()),
        "l_extendedprice": pa.array(np.round(rng.uniform(900, 105000, n_li), 2), pa.float64()),
        "l_discount": pa.array(np.round(rng.integers(0, 11, n_li) / 100.0, 2), pa.float64()),
        "l_tax": pa.array(np.round(rng.integers(0, 9, n_li) / 100.0, 2), pa.float64()),
        "l_returnflag": pa.array(rng.choice(["A", "N", "R"], n_li), pa.string()),
        "l_linestatus": pa.array(rng.choice(["O", "F"], n_li), pa.string()),
        "l_shipdate": pa.array(ship, pa.timestamp("us")),
    }))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(SEED)
    print(f"generating sf={args.sf} -> {args.out}")
    gen_star(rng, args.out, args.sf)
    # documents/embeddings follow the driver's sub-linear document scaling
    # (sf0.1 ships 5000 docs / 2000 vectors); sf1.0 = 10x those
    _write(args.out, "documents", gen_documents(rng, int(50_000 * args.sf)))
    _write(args.out, "embeddings", gen_embeddings(rng, int(20_000 * args.sf)))
    _write(args.out, "events", gen_events(rng, int(10_000_000 * args.sf * 0.1), int(150_000 * args.sf * 0.1)))
    print("done")


if __name__ == "__main__":
    main()
