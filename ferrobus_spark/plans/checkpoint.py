"""Stage checkpointing with per-partition lineage + metrics (north rule).

Production targets Iceberg snapshots; this container has no Iceberg
runtime, so the same contract is implemented on parquet directories:

  <root>/<stage>/data/            the stage output (parquet)
  <root>/<stage>/_METRICS.json    rows, partitions, wall seconds, schema
  <root>/<stage>/_LINEAGE.json    upstream stage names + per-partition
                                  row counts (spark_partition_id histogram)

A pipeline is a list of (name, fn) stages; ``run_pipeline`` skips any
stage whose metrics file already exists (resume-from-checkpoint) and
feeds each stage the materialized outputs of its upstreams, so a rerun
after a mid-pipeline failure recomputes only the remainder. Swapping
``format("parquet")`` for ``format("iceberg")`` (plus a catalog) is the
only production delta — noted here so the design intent is explicit.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

Stage = tuple[str, Callable[..., DataFrame], list[str]]  # (name, fn, upstreams)


def _paths(root: str, name: str) -> tuple[str, str, str]:
    base = os.path.join(root, name)
    return os.path.join(base, "data"), os.path.join(base, "_METRICS.json"), os.path.join(
        base, "_LINEAGE.json"
    )


def stage_is_complete(root: str, name: str) -> bool:
    _, metrics, _ = _paths(root, name)
    return os.path.exists(metrics)


def write_stage(
    spark: SparkSession, root: str, name: str, df: DataFrame, upstreams: list[str]
) -> DataFrame:
    data, metrics_p, lineage_p = _paths(root, name)
    t0 = time.perf_counter()
    df.write.mode("overwrite").parquet(data)
    wall = time.perf_counter() - t0
    out = spark.read.parquet(data)
    per_part = (
        out.groupBy(F.spark_partition_id().alias("partition"))
        .count()
        .orderBy("partition")
        .collect()
    )
    n_rows = sum(r["count"] for r in per_part)
    with open(metrics_p, "w") as f:
        json.dump(
            {
                "stage": name,
                "rows": n_rows,
                "partitions": len(per_part),
                "wall_sec": round(wall, 3),
                "rows_per_sec": round(n_rows / wall, 1) if wall > 0 else None,
                "schema": out.schema.simpleString(),
            },
            f,
        )
    with open(lineage_p, "w") as f:
        json.dump(
            {
                "stage": name,
                "upstreams": upstreams,
                "partition_rows": {str(r["partition"]): r["count"] for r in per_part},
            },
            f,
        )
    return out


def run_pipeline(
    spark: SparkSession,
    root: str,
    stages: list[Stage],
    inputs: dict[str, DataFrame] | None = None,
) -> dict[str, DataFrame]:
    """Execute stages in order, resuming past completed checkpoints.

    Each stage fn receives (spark, {name: DataFrame}) with all inputs
    and completed upstream outputs available.
    """
    os.makedirs(root, exist_ok=True)
    env: dict[str, DataFrame] = dict(inputs or {})
    for name, fn, upstreams in stages:
        data, _, _ = _paths(root, name)
        if stage_is_complete(root, name):
            env[name] = spark.read.parquet(data)
            continue
        os.makedirs(os.path.dirname(data), exist_ok=True)
        df = fn(spark, env)
        env[name] = write_stage(spark, root, name, df, upstreams)
    return env


def pipeline_metrics(root: str) -> list[dict]:
    out = []
    for name in sorted(os.listdir(root)):
        _, metrics_p, _ = _paths(root, name)
        if os.path.exists(metrics_p):
            with open(metrics_p) as f:
                out.append(json.load(f))
    return out
