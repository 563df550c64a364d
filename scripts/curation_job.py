"""Shippable training-data curation job: crawl → curated corpus.

    scripts/package.sh   # builds dist/ferrobus_spark.zip
    spark-submit --py-files dist/ferrobus_spark.zip \
        scripts/curation_job.py --sf-dir /root/testdata/sf0.01 \
        --checkpoint-root /tmp/ferrobus_curation

Stages (each checkpointed with per-partition lineage + metrics; a rerun
resumes after the last completed stage): pages → canonical urls →
url-dedup → html extraction → token/quality/language features →
exact dedup → MinHash-LSH near-dedup (connected-component clusters) →
quality-gated curated rows. Prints one JSON line with per-stage metrics
and the funnel counts.
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
    ap.add_argument("--warc-dir", default=None,
                    help="read pages from WARC files (crawl input) instead "
                         "of the parquet-derived synth")
    ap.add_argument("--checkpoint-root", default="/tmp/ferrobus_curation")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", 8)))
    ap.add_argument("--min-quality", type=float, default=0.3)
    ap.add_argument("--min-tokens", type=int, default=10)
    ap.add_argument("--archive-dir", default=None,
                    help="crawl-N incremental mode: directory holding the "
                         "archive's text_hashes/ (text_hash) and signatures/ "
                         "(id, signature) parquet tables; dedup runs "
                         "new-vs-archive only, and the batch's appendable "
                         "rows are written READY-SHAPED to "
                         "<archive-dir>/pending_append/{text_hashes,"
                         "signatures}/ — compaction is a plain file move "
                         "into the matching archive table, no "
                         "split/rename step")
    args = ap.parse_args()

    from ferrobus_spark.plans.checkpoint import pipeline_metrics
    from ferrobus_spark.plans.curation import run_curation, warc_pages_fn
    from ferrobus_spark.session import get_spark
    from ferrobus_spark.sources.pages import pages_table

    spark = get_spark("ferrobus-curation", master=f"local[{args.cpus}]")

    knobs = {"min_quality": args.min_quality, "min_tokens": args.min_tokens}
    archive_fn = None
    if args.archive_dir:
        def archive_fn(spark_):
            return {
                "text_hashes": spark_.read.parquet(f"{args.archive_dir}/text_hashes"),
                "signatures": spark_.read.parquet(f"{args.archive_dir}/signatures"),
            }

        knobs["archive_fn"] = archive_fn

    if args.warc_dir:
        # archive_fn also reserves archived ids at assignment time, so a
        # new doc id can never collide with an archived one
        s_pages = warc_pages_fn(args.warc_dir, archive_fn=archive_fn)
    else:
        def s_pages(spark_, env):
            return pages_table(spark_, args.sf_dir)

    env = run_curation(spark, args.checkpoint_root, s_pages, **knobs)
    if args.archive_dir:
        # appendable rows land NEXT TO the archive, already split into the
        # two sub-tables archive_fn reads (text_hashes: text_hash;
        # signatures: id, signature) so compaction is a plain directory
        # append of matching schemas; a separate compaction step merges
        # them in (append is not done in-place so a failed job can never
        # half-append)
        from pyspark.sql import functions as F

        pend = f"{args.archive_dir}/pending_append"
        out = env["archive_outputs"]
        out.select("text_hash").write.mode("overwrite").parquet(
            f"{pend}/text_hashes"
        )
        out.select(F.col("doc_id").alias("id"), "signature").write.mode(
            "overwrite"
        ).parquet(f"{pend}/signatures")
    funnel = {name: env[name].count() for name in (
        "pages", "url_dedup", "exact_dedup", "near_dedup", "curated",
    )}
    print(json.dumps({
        "stages": pipeline_metrics(args.checkpoint_root),
        "funnel": funnel,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
