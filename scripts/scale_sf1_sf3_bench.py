"""Engine-side weak-scaling bench: the same driver-contract queries at
sf1.0 vs sf3.0 (3x documents/embeddings), min-of-2, quiet host.

The sweep ledgers (BENCH/sweep_sf1_r7.jsonl / sweep_sf3_r7.jsonl) carry
authoritative PASS/FAIL verdicts, but their spark_s timings are
single-shot and some sf3 rows overlapped the prior session's concurrent
test runs (dedup_planted_dups recorded 156.8 s there vs 30.4 s
reproduced clean — diagnosed 2026-08-18). This script is the clean
timing source for the data-scaling table in BENCH/BASELINE.md.

Usage: python scripts/scale_sf1_sf3_bench.py [--out BENCH/scale_sf1_sf3_r7.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

def _ivf_auto(spark, sf_dir):
    """Production-default IVF (n_lists auto-sized to ~sqrt(N), n_probe=4).

    The driver-gate query `knn_embeddings_ivf` pins n_lists=16,
    n_probe=8 so the DuckDB twin can restate the exact quantizer — but
    probing 8/16 lists scans half the corpus per query, so the GATE
    parameterization is quadratic in N by construction (measured 8.4x
    at 3x data). The engine's default auto-sizing keeps per-query work
    ~n_probe*sqrt(N); this entry measures that production path."""
    from pyspark.sql import functions as F

    from ferrobus_spark.operators.similarity import ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return ivf_topk(spark, emb, emb, k=3).select(
        "query_id", "neighbor_id", F.col("rank").cast("long").alias("rank")
    )


EXTRA = {"knn_embeddings_ivf_auto": _ivf_auto}

# representative scale-sensitive subset: every family that reads the
# documents/embeddings tables (the ones that grow with sf)
QUERIES = [
    "dedup_exact",
    "doc_fingerprint",
    "ngram_exact_dups",
    "dedup_planted_dups",
    "minhash_dup_pairs",
    "simhash_near_pairs",
    "incremental_dedup_planted",
    "embedding_neardup_pairs",
    "knn_embeddings_lsh",
    "knn_embeddings_ivf",
    "knn_embeddings_ivf_auto",
    "curation_curated",
]

SF_DIRS = {
    1.0: os.path.join(REPO, ".sfdata", "sf1.0"),
    3.0: os.path.join(REPO, ".sfdata", "sf3.0"),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="BENCH/scale_sf1_sf3_r7.json")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument(
        "--sfs", default=None,
        help="comma-separated scale factors (e.g. '1.0,3.0,10.0'); each "
        "must exist at .sfdata/sf{SF}. Default: 1.0,3.0",
    )
    args = ap.parse_args()

    sf_dirs = SF_DIRS
    if args.sfs:
        sf_dirs = {float(s): os.path.join(REPO, ".sfdata", f"sf{s}")
                   for s in args.sfs.split(",")}

    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    import __spark_entry__ as entry_mod
    from ferrobus_spark.session import get_spark

    spark = get_spark()
    qs = dict(entry_mod.queries())
    qs.update(EXTRA)

    sfs = sorted(sf_dirs)
    lo_sf, hi_sf = sfs[0], sfs[-1]
    data_x = hi_sf / lo_sf
    out: dict = {"metric": f"weak_scaling_sf{lo_sf}_to_sf{hi_sf}",
                 "unit": "sec", "runs_per_point": args.runs, "queries": {}}
    for name in QUERIES:
        row: dict = {}
        for sf in sfs:
            times = []
            rows = None
            for _ in range(args.runs):
                t0 = time.time()
                rows = len(qs[name](spark, sf_dirs[sf]).toPandas())
                times.append(round(time.time() - t0, 2))
            row[f"sf{sf}"] = {"sec": min(times), "runs": times, "rows": rows}
        r_lo, r_hi = row[f"sf{lo_sf}"]["sec"], row[f"sf{hi_sf}"]["sec"]
        ratio_key = f"time_ratio_{data_x:g}x_data"
        row[ratio_key] = round(r_hi / r_lo, 2) if r_lo else None
        out["queries"][name] = row
        print(f"{name:32s} " +
              " ".join(f"sf{sf}={row[f'sf{sf}']['sec']:>7.2f}s"
                       for sf in sfs) +
              f" ratio={row[ratio_key]}", flush=True)

    ratio_key = f"time_ratio_{data_x:g}x_data"
    import statistics

    # drop None ratios (zero low-sf time) and take a true median —
    # sorted()[n//2] picked the upper-middle element and raised on None
    ratios = [q[ratio_key] for q in out["queries"].values() if q[ratio_key] is not None]
    out["median_time_ratio"] = statistics.median(ratios) if ratios else None
    with open(os.path.join(REPO, args.out), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"written": args.out,
                      "median_time_ratio": out["median_time_ratio"]}))


if __name__ == "__main__":
    main()
