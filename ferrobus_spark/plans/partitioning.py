"""Partitioning helpers for CPU-bound Arrow kernels.

A parquet file is splittable only at row-group granularity, so a small
dimension table (one row group) arrives as ONE partition — and a
``mapInPandas`` kernel over it runs as a single task no matter how many
cores the cluster has. The JVM-side operators don't care (codegen work
per row is tiny) but the Arrow kernels (MinHash/SimHash signatures, LSH
bucketing, HTML parsing, cosine matmuls) are exactly the CPU-heavy path.

:func:`spread_for_kernel` round-robin-repartitions ONLY when the input
has fewer partitions than the session's parallelism. At 100 TB the
inputs already carry thousands of partitions, so this never adds a
shuffle at scale; at dim-table scale the shuffled bytes are trivial and
the kernel goes from 1 task to full-width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_for_kernel(df: DataFrame) -> DataFrame:
    """Repartition up to defaultParallelism iff under-partitioned."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
