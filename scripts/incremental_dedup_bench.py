"""Crawl-N incremental dedup vs full-union re-dedup: measured advantage.

Corpus of ``--old`` docs (the already-curated archive, signatures saved)
plus a ``--new`` crawl batch with planted cross-batch re-crawls. Compares
  full : minhash_signatures(old ∪ new) → minhash_lsh_pairs (re-pairs
         the whole corpus, recomputes every signature)
  inc  : saved old signatures + minhash_signatures(new) →
         incremental_minhash_pairs (new-driven probe join only)
and checks both report the identical new-touching pair set.

Usage: python scripts/incremental_dedup_bench.py [--old N] [--new N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def synth(spark, n, id_base, vocab=2000, words=60):
    return spark.range(n).select(
        (F.col("id") + id_base).alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.concat(
                    F.lit("w"),
                    (F.xxhash64(F.col("id") + id_base, F.lit(k)) % vocab).cast("string"),
                )
                for k in range(words)
            ],
        ).alias("text"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--old", type=int, default=500_000)
    ap.add_argument("--new", type=int, default=50_000)
    args = ap.parse_args()

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from ferrobus_spark.operators.dedup import (
        incremental_minhash_pairs,
        minhash_lsh_pairs,
        minhash_signatures,
    )

    old = synth(spark, args.old, 0)
    # new batch: half fresh, half re-crawls of old docs (id-shifted)
    fresh = synth(spark, args.new // 2, 10_000_000)
    recrawl = (
        old.limit(args.new - args.new // 2)
        .select((F.col("doc_id") + 20_000_000).alias("doc_id"), "text")
    )
    new = fresh.unionByName(recrawl)

    # archive signatures are computed once and saved (parquet), as the
    # production crawl loop would
    t0 = time.time()
    old_sigs = minhash_signatures(old).localCheckpoint()
    old_sigs.count()
    old_sig_sec = round(time.time() - t0, 2)

    t0 = time.time()
    inc = incremental_minhash_pairs(
        minhash_signatures(new), old_sigs, threshold=0.9
    )
    n_inc = inc.count()
    inc_sec = round(time.time() - t0, 2)

    t0 = time.time()
    full = minhash_lsh_pairs(
        minhash_signatures(old.unionByName(new)), threshold=0.9, n_hashes=64
    ).filter((F.col("id_a") >= 10_000_000) | (F.col("id_b") >= 10_000_000))
    n_full = full.count()
    full_sec = round(time.time() - t0, 2)

    out = {
        "old_rows": args.old,
        "new_rows": args.new,
        "old_signature_build_sec": old_sig_sec,
        "incremental_sec": inc_sec,
        "full_union_sec": full_sec,
        "speedup": round(full_sec / inc_sec, 2),
        "pairs_incremental": n_inc,
        "pairs_full_new_touching": n_full,
        "identical": n_inc == n_full,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
