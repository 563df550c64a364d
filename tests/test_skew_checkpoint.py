"""Skew salting equivalence + checkpoint/resume semantics."""

import json
import os

import pytest
from pyspark.sql import functions as F

from ferrobus_spark.operators.skew import heavy_hitters, salted_count, salted_join
from ferrobus_spark.plans.checkpoint import pipeline_metrics, run_pipeline
from ferrobus_spark.registry import CELL_REF_SQL
from ferrobus_spark.sources.pages import pages_table


@pytest.fixture(scope="module")
def tiles(spark, sf_dir):
    df = pages_table(spark, sf_dir).withColumn("cell", F.expr(CELL_REF_SQL))
    df.cache().count()
    return df


def test_heavy_hitters_finds_hot_cells(tiles):
    hot = heavy_hitters(tiles, "cell", threshold=0.05, sample_fraction=1.0)
    assert len(hot) >= 1  # the downtown cluster concentrates into few cells
    counts = tiles.groupBy("cell").count().toPandas()
    top_cell = counts.sort_values("count", ascending=False).iloc[0]["cell"]
    assert top_cell in hot


def test_salted_count_equals_plain(tiles):
    hot = heavy_hitters(tiles, "cell", threshold=0.05, sample_fraction=1.0)
    plain = {
        r["cell"]: r["count"] for r in tiles.groupBy("cell").count().collect()
    }
    salted = {
        r["cell"]: r["n"] for r in salted_count(tiles, "cell", hot, n_salt=8).collect()
    }
    assert salted == plain


def test_salted_join_equals_plain(spark, tiles):
    dim = (
        tiles.select("cell").distinct()
        .withColumn("zone", F.pmod(F.col("cell"), F.lit(7)))
    )
    hot = heavy_hitters(tiles, "cell", threshold=0.05, sample_fraction=1.0)
    plain = (
        tiles.join(dim, "cell").groupBy("zone").count().orderBy("zone").collect()
    )
    salted = (
        salted_join(tiles, dim, "cell", hot, n_salt=8)
        .groupBy("zone").count().orderBy("zone").collect()
    )
    assert [r.asDict() for r in plain] == [r.asDict() for r in salted]


def test_checkpoint_resume(spark, sf_dir, tmp_path):
    root = str(tmp_path / "ckpt")
    calls = {"a": 0, "b": 0}

    def s_a(spark_, env):
        calls["a"] += 1
        return spark_.range(100).withColumnRenamed("id", "k")

    def s_b(spark_, env):
        calls["b"] += 1
        return env["a"].withColumn("v", F.col("k") * 2)

    stages = [("a", s_a, []), ("b", s_b, ["a"])]
    env1 = run_pipeline(spark, root, stages)
    assert env1["b"].count() == 100
    assert calls == {"a": 1, "b": 1}

    # full resume: nothing recomputes
    run_pipeline(spark, root, stages)
    assert calls == {"a": 1, "b": 1}

    # mid-pipeline resume: drop stage b's checkpoint → only b recomputes
    import shutil

    shutil.rmtree(os.path.join(root, "b"))
    env3 = run_pipeline(spark, root, stages)
    assert calls == {"a": 1, "b": 2}
    assert env3["b"].count() == 100

    # metrics + per-partition lineage exist and are consistent
    metrics = {m["stage"]: m for m in pipeline_metrics(root)}
    assert metrics["a"]["rows"] == 100
    with open(os.path.join(root, "b", "_LINEAGE.json")) as f:
        lineage = json.load(f)
    assert lineage["upstreams"] == ["a"]
    assert sum(int(v) for v in lineage["partition_rows"].values()) == 100


def test_checkpoint_resume_after_midwrite_crash(spark, tmp_path):
    """Chaos case (round-7 verdict item 6): a stage killed MID-WRITE
    leaves exactly 'data dir present, metrics absent' — write_stage
    writes _METRICS.json strictly after the data write returns. Resume
    must treat the stage as incomplete, never read the partial data,
    and produce the same final artifact as an uninterrupted run."""
    import shutil

    def s_a(spark_, env):
        return spark_.range(50).withColumnRenamed("id", "k")

    def s_b(spark_, env):
        return env["a"].withColumn("v", F.col("k") * 3)

    stages = [("a", s_a, []), ("b", s_b, ["a"])]

    clean_root = str(tmp_path / "clean")
    want = sorted(
        run_pipeline(spark, clean_root, stages)["b"].collect(),
        key=lambda r: r.k,
    )

    # crashed run: stage a completed, stage b died mid-write — its data
    # dir holds garbage (not even parquet) and no metrics file exists
    crash_root = str(tmp_path / "crash")
    env = run_pipeline(spark, crash_root, [stages[0]])
    assert env["a"].count() == 50
    bdir = os.path.join(crash_root, "b", "data")
    os.makedirs(bdir)
    with open(os.path.join(bdir, "part-00000.parquet"), "w") as f:
        f.write("TRUNCATED GARBAGE FROM A KILLED WRITER")

    got = sorted(
        run_pipeline(spark, crash_root, stages)["b"].collect(),
        key=lambda r: r.k,
    )
    assert got == want
    # and the recovered checkpoint is now complete + consistent
    metrics = {m["stage"]: m for m in pipeline_metrics(crash_root)}
    assert metrics["b"]["rows"] == 50
    shutil.rmtree(crash_root)


def test_connected_components_driver_equals_distributed(spark, monkeypatch):
    """The round-8 driver union-find gate must label identically to the
    distributed large-star/small-star loop (component = min node id),
    on a graph with chains, a cycle, isolated pairs, and singletons-in-
    edges."""
    import ferrobus_spark.plans.iterative as it

    edges = [
        (1, 2), (2, 3), (3, 4),          # chain -> comp 1
        (10, 11), (11, 10), (11, 12),    # dup + cycle -> comp 10
        (20, 21),                        # pair -> comp 20
        (30, 31), (31, 32), (32, 30),    # triangle -> comp 30
        (40, 5), (5, 1),                 # bridges into comp 1
    ]
    df = spark.createDataFrame(edges, "src BIGINT, dst BIGINT")

    def run():
        return sorted(
            map(tuple, it.connected_components(df).collect())
        )

    fast = run()
    monkeypatch.setattr(it, "_MAX_DRIVER_CC_EDGES", 0)
    slow = run()
    assert fast == slow
    comp = dict(fast)
    assert comp[4] == 1 and comp[40] == 1 and comp[12] == 10
    assert comp[21] == 20 and comp[32] == 30
