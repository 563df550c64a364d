"""Bucketed tables for co-located (shuffle-free) joins.

At 100 TB, the biggest recurring cost is re-shuffling the pages table on
its hex cell for every join (PIP rollups, cell-dimension joins, kNN
candidate joins). Bucketing materializes that partitioning once:
both sides of an equi-join bucketed by the same key into the same
bucket count join with ZERO exchanges — Catalyst sees the co-location.

Parquet bucketed tables need a metastore table (saveAsTable); Spark's
local Derby metastore suffices here, Iceberg's bucket partition
transform is the production equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame, table: str, bucket_col: str, n_buckets: int = 32,
    sort_col: str | None = None,
) -> None:
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.format("parquet").saveAsTable(table)


def exchanges_in_plan(df: DataFrame) -> int:
    """Count Exchange operators in the executed plan (0 = co-located)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange")
