"""Measured before/after for hub-host skew in pagerank (round-5 ask).

Synthetic power-law host graph: one mega-hub source owning a large
fraction of all edges (the realistic worst case — a boilerplate footer
link on every page of a mega-site), a Zipf-ish tail over many hosts.
Runs the SAME pagerank dataflow with salt_hot off/on (AQE enabled in
both, as in production) and prints one JSON line with wall times.

Usage: python scripts/skew_bench.py [n_edges] [hub_frac] [n_iter]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    hub_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.4
    n_iter = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    n_hub = int(n_edges * hub_frac)
    hub = spark.range(n_hub).select(
        F.lit("megahub.example.com").alias("src"),
        F.concat(F.lit("t"), (F.col("id") % 50_000).cast("string")).alias("dst"),
    )
    # Zipf-ish tail: src frequency ~ 1/rank via modulo-of-square trick
    tail = spark.range(n_edges - n_hub).select(
        F.concat(
            F.lit("h"), (F.col("id") % 100_000 * (F.col("id") % 97 + 1) % 100_000).cast("string")
        ).alias("src"),
        F.concat(F.lit("t"), ((F.col("id") * 31) % 50_000).cast("string")).alias("dst"),
    )
    edges = hub.unionByName(tail)

    from ferrobus_spark.operators.linkgraph import pagerank

    # JIT/shuffle-path warmup so neither mode pays first-run costs
    pagerank(edges.limit(200_000), n_iter=1).count()

    out = {"n_edges": n_edges, "hub_frac": hub_frac, "n_iter": n_iter}
    runs: dict[str, list[float]] = {"plain": [], "salted": []}
    tops: dict[str, list] = {}
    # interleave rounds so host jitter can't masquerade as a mode effect
    for _ in range(2):
        for label, salted in (("plain", False), ("salted", True)):
            t0 = time.time()
            ranks = pagerank(
                edges, n_iter=n_iter, salt_hot=salted, hot_threshold=0.01
            )
            top = ranks.orderBy(F.desc("rank")).limit(3).collect()
            runs[label].append(round(time.time() - t0, 2))
            tops[label] = [(r.node, round(r.rank, 8)) for r in top]
    for label in ("plain", "salted"):
        out[f"{label}_sec"] = min(runs[label])
        out[f"{label}_runs"] = runs[label]
        out[f"{label}_top"] = tops[label]
    out["speedup"] = round(out["plain_sec"] / out["salted_sec"], 3)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
