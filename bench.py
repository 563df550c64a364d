"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``

Each query is forced end-to-end with the noop sink (full compute, no
output cost). Throughput rows/s for the headline tile-assignment path is
also reported (the north-rule metric), plus input row counts so runs at
different scale factors are comparable.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# headline set: the north-rule spatial path + skewed agg + dedup/text/ANN
HEADLINE = [
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


def force(df) -> None:
    """Force full computation through the noop sink (no output cost)."""
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    from ferrobus_spark.registry import queries
    from ferrobus_spark.session import get_spark

    spark = get_spark("ferrobus-bench", master=f"local[{CPUS}]",
                      shuffle_partitions=int(CPUS))
    qmap = queries()
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()

    # warm the JVM + Arrow path once (session startup excluded from timings)
    qmap["tile_assign"](spark, SF_DIR).write.mode("overwrite").format("noop").save()

    # best-of-N per query: first runs pay JVM/codegen warmup that a
    # long-lived cluster job would amortize away, and this host's
    # scheduler jitter defeats best-of-2 (BENCH_r03's 3× minhash
    # artifact) — so take min over 3 runs and RECORD the spread so a
    # jittery sample is visible in the artifact instead of silently
    # inflating the headline.
    runs_per_query = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    per_query: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    for name in HEADLINE:
        if name not in qmap:
            continue
        times = []
        for _ in range(runs_per_query):
            t0 = time.perf_counter()
            force(qmap[name](spark, SF_DIR))
            times.append(round(time.perf_counter() - t0, 4))
        per_query[name] = min(times)
        spread[name] = times

    # north-rule throughput at meaningful scale: the headline spatial path
    # over 50M synthesized pages rows (deterministic geo from row id) —
    # the sf tables are too small to saturate the executor threads
    from pyspark.sql import functions as F

    from ferrobus_spark.registry import CELL_REF_SQL, LAT_SQL, LON_SQL, PIP_POLY, convex_pip_sql

    big_rows = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", 50_000_000))

    def big_job():
        return (
            spark.range(0, big_rows, 1, 128)
            .withColumnRenamed("id", "doc_id")
            .selectExpr("doc_id", f"{LON_SQL} AS lon", f"{LAT_SQL} AS lat")
            .withColumn("cell", F.expr(CELL_REF_SQL))
            .filter(F.expr(convex_pip_sql("lon", "lat", PIP_POLY)))
            .groupBy("cell")
            .agg(F.count("*").alias("n_pages"))
        )

    # one untimed warmup: the first 50M-row pass pays C2-JIT compilation of
    # the generated hex/PIP code (measured 4x slower than steady state); a
    # long-lived cluster job amortizes that away, so exclude it like the
    # per-query warmup above, then take min-of-3 timed runs
    big_job().write.mode("overwrite").format("noop").save()
    big_best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        big_job().write.mode("overwrite").format("noop").save()
        big_best = min(big_best, time.perf_counter() - t0)

    total = round(sum(per_query.values()), 4)
    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "query_runs": spread,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "rows_documents": n_docs,
        "tile_assign_rows_per_sec": (
            round(n_docs / per_query["tile_assign"], 1)
            if per_query.get("tile_assign")
            else None
        ),
        "spatial_pipeline_rows": big_rows,
        "spatial_pipeline_sec": round(big_best, 3),
        "spatial_pipeline_rows_per_sec": round(big_rows / big_best, 1),
        "cpus": int(CPUS),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
