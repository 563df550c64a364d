"""The shippable spark-submit job: pages → tiles → PIP → skew-safe rollup.

Run (local example, mirrors the cluster submit per the north rule):

    scripts/package.sh   # builds dist/ferrobus_spark.zip
    spark-submit --py-files dist/ferrobus_spark.zip \
        scripts/pipeline_job.py --sf-dir /root/testdata/sf0.01 \
        --checkpoint-root /tmp/ferrobus_ckpt

Every stage checkpoints with per-partition lineage + metrics
(plans/checkpoint.py), so a rerun resumes mid-pipeline. Hot hex cells
are detected with a sampled pass and salted explicitly on top of AQE
skew handling.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--checkpoint-root", default="/tmp/ferrobus_ckpt")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", 8)))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ferrobus_spark.operators.skew import heavy_hitters, salted_count
    from ferrobus_spark.plans.checkpoint import pipeline_metrics, run_pipeline
    from ferrobus_spark.registry import CELL_REF_SQL, PIP_POLY, convex_pip_sql
    from ferrobus_spark.session import get_spark
    from ferrobus_spark.sources.pages import pages_table

    spark = get_spark("ferrobus-pipeline", master=f"local[{args.cpus}]")

    def s_pages(spark, env):
        return pages_table(spark, args.sf_dir)

    def s_tiles(spark, env):
        return env["pages"].withColumn("cell", F.expr(CELL_REF_SQL))

    def s_pip(spark, env):
        return env["tiles"].filter(F.expr(convex_pip_sql("lon", "lat", PIP_POLY)))

    def s_rollup(spark, env):
        tiles = env["pip"]
        hot = heavy_hitters(tiles, "cell", threshold=0.05, sample_fraction=1.0)
        return salted_count(tiles, "cell", hot, n_salt=args.cpus, count_col="n_pages")

    def s_text_hashes(spark, env):
        # byte-identity invariant: text passthrough hash per url
        return env["pages"].select("url", F.sha2("text", 256).alias("text_sha256"))

    env = run_pipeline(
        spark,
        args.checkpoint_root,
        [
            ("pages", s_pages, []),
            ("tiles", s_tiles, ["pages"]),
            ("pip", s_pip, ["tiles"]),
            ("rollup", s_rollup, ["pip"]),
            ("text_hashes", s_text_hashes, ["pages"]),
        ],
    )
    top = env["rollup"].orderBy(F.desc("n_pages")).limit(3).collect()
    print(json.dumps({
        "stages": pipeline_metrics(args.checkpoint_root),
        "top_cells": [r.asDict() for r in top],
        "n_text_hashes": env["text_hashes"].count(),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
