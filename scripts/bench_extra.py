"""Round-8 optimization harness: per-query noop-sink timing + plan capture.

NOT the official bench (bench.py is frozen). Usage:

    python scripts/bench_extra.py [--sf SF_DIR] [--queries a,b,c] \
        [--runs N] [--plans OUTDIR] [--suffix before|after]

Times each query with the noop sink (guide §1.4), labels jobs
(guide §1.5), and optionally writes ``.explain('formatted')`` output to
``plans/r08/<query>_<suffix>.txt`` for the judge's plan-diff evidence.
Prints one JSON line per query plus a total, so successive runs can be
diffed round-internally.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = [
    "tile_assign",
    "tile_histogram",
    "pip_convex",
    "knn_nearest_stop",
    "dedup_exact",
    "text_passthrough_hash",
    "minhash_dup_pairs",
    "knn_embeddings_bruteforce",
    "token_stats",
    "pricing_summary",
    "events_sessionize",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--queries", default=",".join(DEFAULT))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans", default=None, help="directory for explain output")
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    from ferrobus_spark.registry import queries
    from ferrobus_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("bench-extra", master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    qmap = queries()
    names = [q for q in args.queries.split(",") if q]

    # warm JVM + Arrow path once, same as bench.py
    qmap["tile_assign"](spark, args.sf).write.mode("overwrite").format("noop").save()

    results = {}
    for name in names:
        if name not in qmap:
            print(json.dumps({"query": name, "err": "unknown"}))
            continue
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = qmap[name](spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.plans, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(plan)
        times = []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"{name} run {i}")
            t0 = time.perf_counter()
            qmap[name](spark, args.sf).write.mode("overwrite").format("noop").save()
            times.append(round(time.perf_counter() - t0, 4))
            spark.sparkContext.setJobDescription(None)
        results[name] = min(times)
        print(json.dumps({"query": name, "min": min(times), "runs": times}))
    print(json.dumps({"total_min": round(sum(results.values()), 4), "sf": args.sf,
                      "queries": results}))
    spark.stop()


if __name__ == "__main__":
    main()
