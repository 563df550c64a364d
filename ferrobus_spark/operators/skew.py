"""Explicit skew handling: heavy-hitter detection + salting (north rule).

AQE's skew-join splitting handles post-shuffle partition skew, but a
single hot key (a dense downtown hex cell, a mega-domain) still lands
on one reducer. These helpers implement the explicit strategy:

* :func:`heavy_hitters` — one cheap sampled pass finds keys above a
  frequency threshold (the measured pass SURVEY §7 hard-part 8 asks for);
* :func:`salted_count` — two-phase aggregation with salt appended only
  to hot keys (cold keys keep single-phase map-side combine);
* :func:`salted_join` — fact-side salt + broadcast-exploded dimension
  side for joins whose key histogram is pathological.

All results are exactly equal to the unsalted equivalents — salting
only changes the physical distribution — which is asserted in tests
and lets salted variants share the plain DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def heavy_hitters(
    df: DataFrame, key: str, threshold: float = 0.01, sample_fraction: float = 0.1
) -> list:
    """Keys whose sampled frequency exceeds ``threshold`` of all rows."""
    sample = df.sample(fraction=sample_fraction, seed=42) if sample_fraction < 1.0 else df
    total = sample.count()
    if total == 0:
        return []
    hot = (
        sample.groupBy(key)
        .count()
        .filter(F.col("count") >= total * threshold)
        .select(key)
        .collect()
    )
    return [r[0] for r in hot]


def salted_count(
    df: DataFrame, key: str, hot_keys: list, n_salt: int = 16,
    count_col: str = "n",
) -> DataFrame:
    """groupBy(key).count() with hot keys salted into n_salt sub-keys.

    Phase 1 aggregates (key, salt); phase 2 re-aggregates per key. Cold
    keys take salt 0, so their phase-1 output is already final and
    phase 2 touches one row per key.
    """
    is_hot = F.col(key).isin(hot_keys) if hot_keys else F.lit(False)
    salted = df.withColumn(
        "__salt",
        F.when(is_hot, F.pmod(F.spark_partition_id(), F.lit(n_salt))).otherwise(F.lit(0)),
    )
    phase1 = salted.groupBy(key, "__salt").agg(F.count("*").alias("__c"))
    return phase1.groupBy(key).agg(F.sum("__c").alias(count_col))


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    hot_keys: list,
    n_salt: int = 16,
) -> DataFrame:
    """Inner equi-join with hot fact keys salted; dim hot rows exploded.

    The dimension side replicates each hot row n_salt times so every
    salted fact partition finds its match; cold rows join on salt 0.
    Result set is identical to ``fact.join(dim, key)``.
    """
    is_hot_f = F.col(key).isin(hot_keys) if hot_keys else F.lit(False)
    f = fact.withColumn(
        "__salt",
        F.when(is_hot_f, F.pmod(F.spark_partition_id(), F.lit(n_salt))).otherwise(F.lit(0)),
    )
    is_hot_d = F.col(key).isin(hot_keys) if hot_keys else F.lit(False)
    d = dim.withColumn(
        "__salts",
        F.when(is_hot_d, F.sequence(F.lit(0), F.lit(n_salt - 1))).otherwise(F.array(F.lit(0))),
    ).withColumn("__salt", F.explode("__salts")).drop("__salts")
    return f.join(d, [key, "__salt"]).drop("__salt")
