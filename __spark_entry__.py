"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship spatial pipeline at sf0.001;
``queries()``/``oracle_sql()`` expose every implemented operator for the
driver's DuckDB hash-compare at sf0.01. Implementation lives in
:mod:`ferrobus_spark.registry`.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: H3-style tile assignment + PIP join + per-cell rollup.

    Pages (Common-Crawl-shaped, deterministic geo) → hex cell at res 9 →
    keep pages inside the city-core polygon → per-cell page count +
    distinct-domain count. Exercises scan → codegen cell encode → spatial
    filter → skewed agg, the north-rule headline path.
    """
    from pyspark.sql import functions as F

    from ferrobus_spark.registry import CELL_REF_SQL, PIP_POLY, convex_pip_sql
    from ferrobus_spark.sources.pages import pages_table

    pages = pages_table(spark, SF_SMOKE)  # lon/lat are materialized columns
    return (
        pages.withColumn("cell", F.expr(CELL_REF_SQL))
        .filter(F.expr(convex_pip_sql("lon", "lat", PIP_POLY)))
        .groupBy("cell")
        .agg(
            F.count("*").alias("n_pages"),
            F.countDistinct("domain").alias("n_domains"),
        )
        .orderBy(F.desc("n_pages"), "cell")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from ferrobus_spark.registry import queries as _queries

    return _queries()


def oracle_sql() -> dict[str, str]:
    from ferrobus_spark.registry import oracle_sql as _oracle_sql

    return _oracle_sql()
