"""Curation-pipeline throughput bench at multi-million-row scale.

The sf tables top out at 5k documents — too small to say anything about
the pipeline's 100 TB shape — so this job synthesizes N Common-Crawl-
style pages (url, warc_ts, html, text) purely in codegen from
``spark.range`` (deterministic word-salad text; no external data) with
planted mess the pipeline must clean:

* every 10th page gets a URL-variant re-crawl row (upper-case scheme/
  host, :443, fragment, 3 days later) — collapsed at url_dedup;
* every 13th page is an EXACT text copy of an earlier page — collapsed
  at exact_dedup;
* every 11th page is a NEAR copy (one word swapped out of ~60) —
  collapsed at near_dedup via MinHash-LSH + connected components.

Runs the same checkpointed ``plans/curation.run_pipeline`` as the
shippable job and prints ONE JSON line with per-stage rows/s (from the
stage _METRICS.json files) plus the funnel. Usage:

    python scripts/curation_bench.py --rows 5000000 --cpus 32
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STOP = ["the", "of", "and", "to", "in", "is", "was", "for", "on", "as"]
WORDS_PER_DOC = 60


def synth_pages(spark, n_rows: int):
    """documents-shaped pages, pure codegen (no Python UDF in the synth)."""
    from pyspark.sql import functions as F

    from ferrobus_spark.sources.pages import domain_sql

    sarr = F.array(*[F.lit(w) for w in STOP])

    base = spark.range(0, n_rows, 1, 256).withColumnRenamed("id", "doc_id")
    # text seed: copies point at a target whose own seed is NOT remapped
    # (exact targets are ≡0 mod 13 — never exact sources; near targets
    # are ≡0 mod 11 and excluded from the near condition — so the copy
    # and its target render the identical word stream)
    is_exact = (F.col("doc_id") % 13 == 7) & (F.col("doc_id") >= 13)
    near = (
        (F.col("doc_id") % 11 == 5)
        & (F.col("doc_id") >= 11)
        & (F.col("doc_id") % 13 != 7)
        & (F.col("doc_id") % 13 != 0)
    )
    seed = (
        F.when(is_exact, F.col("doc_id") - 7)
        .when(near, F.col("doc_id") - 5)
        .otherwise(F.col("doc_id"))
    )

    def word(k):
        # xxhash64 for full-width diffusion — a multiplicative mix's low
        # bits alias seeds mod small powers of two and collapse the
        # corpus into a few hundred distinct texts
        mix = F.xxhash64(seed, F.lit(k))
        # every 4th word a stopword → stopword_ratio ≈ .25 (quality
        # gate); body words are 6-hex-char pseudo-words — a ~16M-word
        # universe like natural text's, NOT a small fixed vocab: with a
        # few hundred distinct words the global minimum shingles repeat
        # across most docs and MinHash band buckets grow to thousands
        # of members (sum k² candidate pairs exhausted the disk at 2M
        # rows before this was diagnosed)
        stop_w = F.element_at(sarr, F.pmod(mix, F.lit(len(STOP))).cast("int") + 1)
        body_w = F.lower(F.hex(F.pmod(mix, F.lit(16_777_216))))
        w = stop_w if k % 4 == 0 else body_w
        if k == 30:  # near-copies swap exactly one mid-document word
            w = F.when(near, F.lit("swappedword")).otherwise(w)
        return w

    text = F.concat_ws(" ", *[word(k) for k in range(WORDS_PER_DOC)])
    domain = F.expr(domain_sql("doc_id"))
    url = F.concat(F.lit("https://"), domain, F.lit("/page/"), F.col("doc_id"))
    ts = F.to_timestamp(F.lit("2024-01-01 00:00:00")) + F.make_interval(
        secs=((F.col("doc_id") * 37) % 2592000).cast("double")
    )
    html = F.encode(
        F.concat(
            F.lit("<html><head><title>Page "),
            F.col("doc_id").cast("string"),
            F.lit("</title></head><body><p>"),
            text,
            F.lit("</p></body></html>"),
        ),
        "UTF-8",
    )
    pages = base.select(
        "doc_id", url.alias("url"), ts.alias("warc_ts"),
        html.alias("html"), text.alias("text"),
    )
    recrawl = (
        pages.filter(F.col("doc_id") % 10 == 0)
        .withColumn(
            "url",
            F.concat(
                F.lit("HTTPS://"),
                F.upper(F.regexp_extract("url", r"^https://([^/]+)", 1)),
                F.lit(":443"),
                F.regexp_extract("url", r"^https://[^/]+(.*)$", 1),
                F.lit("#utm"),
            ),
        )
        .withColumn("warc_ts", F.col("warc_ts") + F.expr("INTERVAL 3 DAYS"))
        .withColumn("doc_id", F.col("doc_id") + 2 * 1_000_000_000)
    )
    return pages.unionByName(recrawl)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CURATION_ROWS", 5_000_000)))
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", 32)))
    ap.add_argument("--checkpoint-root", default=None)
    args = ap.parse_args()

    from ferrobus_spark.plans.checkpoint import pipeline_metrics
    from ferrobus_spark.plans.curation import run_curation
    from ferrobus_spark.session import get_spark

    root = args.checkpoint_root or tempfile.mkdtemp(prefix="ferrobus_curation_bench_")
    spark = get_spark("ferrobus-curation-bench", master=f"local[{args.cpus}]",
                      shuffle_partitions=4 * args.cpus)

    t0 = time.perf_counter()
    env = run_curation(spark, root, lambda s, e: synth_pages(s, args.rows))
    wall = time.perf_counter() - t0

    stages = {
        m["stage"]: {
            "rows": m["rows"],
            "wall_sec": m["wall_sec"],
            "rows_per_sec": m["rows_per_sec"],
        }
        for m in pipeline_metrics(root)
    }
    funnel = {name: stages[name]["rows"] for name in stages}
    out = {
        "metric": "curation_pipeline_rows_per_sec",
        "value": round(args.rows / wall, 1),
        "unit": "rows/s",
        "input_rows": args.rows,
        "total_wall_sec": round(wall, 2),
        "stages": stages,
        "funnel": funnel,
        "cpus": args.cpus,
    }
    print(json.dumps(out))
    spark.stop()
    if args.checkpoint_root is None:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
