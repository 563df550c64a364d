"""Bucketed join co-location: zero exchanges on bucket-key equi-joins."""

import pytest
from pyspark.sql import functions as F

from ferrobus_spark.operators.bucketing import exchanges_in_plan, write_bucketed
from ferrobus_spark.registry import CELL_REF_SQL
from ferrobus_spark.sources.pages import pages_table


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        tiles = pages_table(spark, sf_dir).withColumn("cell", F.expr(CELL_REF_SQL))
        write_bucketed(
            tiles.select("doc_id", "cell", "lang"), "pages_bucketed", "cell", 8
        )
        write_bucketed(
            tiles.groupBy("cell").agg(F.count("*").alias("n")),
            "cells_bucketed", "cell", 8,
        )
        a = spark.table("pages_bucketed")
        b = spark.table("cells_bucketed")
        joined = a.join(b, "cell")
        n_ex = exchanges_in_plan(joined)
        assert n_ex == 0, f"bucketed join should be co-located, saw {n_ex} exchanges"
        # and an unbucketed equivalent DOES shuffle (sanity of the measure)
        plain = (
            tiles.select("doc_id", "cell", "lang")
            .join(tiles.groupBy("cell").agg(F.count("*").alias("n")), "cell")
        )
        assert exchanges_in_plan(plain) > 0
        # results identical
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS pages_bucketed")
        spark.sql("DROP TABLE IF EXISTS cells_bucketed")
