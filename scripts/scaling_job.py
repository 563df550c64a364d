"""One scaling-bench run: the headline spatial job at a given parallelism.

Job = synthesize N pages rows (deterministic geo from row id — pure
whole-stage-codegen, no I/O bottleneck), hex-encode at res 9, PIP-filter
against the city-core polygon, per-cell count with skewed keys, force
with the noop sink. Prints one JSON line {cpus, rows, sec, rows_per_sec}.

Run in a fresh process per parallelism level so each JVM sizes its
thread pools honestly (local[8] vs local[32] ≡ N vs 4N executors).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--rows", type=int, default=20_000_000)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ferrobus_spark.registry import (
        CELL_REF_SQL,
        LAT_SQL,
        LON_SQL,
        PIP_POLY,
        convex_pip_sql,
    )
    from ferrobus_spark.session import get_spark

    spark = get_spark(
        f"scaling-{args.cpus}",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )

    def job(rows: int):
        # two-step geo projection keeps the fused stage under the JVM
        # codegen method limit (see registry.py CELL_REF_SQL note).
        # Fixed partition count at both parallelism levels: identical
        # task decomposition, only the executor-thread count varies —
        # the honest analogue of N vs 4N executors over the same input.
        pages = (
            spark.range(0, rows, 1, 128)
            .withColumnRenamed("id", "doc_id")
            .selectExpr("doc_id", f"{LON_SQL} AS lon", f"{LAT_SQL} AS lat")
        )
        return (
            pages.withColumn("cell", F.expr(CELL_REF_SQL))
            .filter(F.expr(convex_pip_sql("lon", "lat", PIP_POLY)))
            .groupBy("cell")
            .agg(F.count("*").alias("n_pages"))
        )

    # warmup on a 10% slice (JVM + codegen), then one timed run; repetition
    # happens across interleaved subprocess invocations in scaling_bench
    job(args.rows // 10).write.mode("overwrite").format("noop").save()
    t0 = time.perf_counter()
    job(args.rows).write.mode("overwrite").format("noop").save()
    best = time.perf_counter() - t0

    print(json.dumps({
        "cpus": args.cpus,
        "rows": args.rows,
        "sec": round(best, 3),
        "rows_per_sec": round(args.rows / best, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
