"""Similarity search + streaming operators."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ferrobus_spark.operators.similarity import brute_force_topk, lsh_topk


@pytest.fixture(scope="module")
def embeddings(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_bruteforce_topk_matches_numpy(spark, embeddings):
    got = brute_force_topk(spark, embeddings, embeddings, k=3).toPandas()
    pdf = embeddings.toPandas()
    ids = pdf["vec_id"].to_numpy(np.int64)
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    scores = mat @ mat.T
    for qi in range(min(50, len(ids))):
        s = scores[qi].copy()
        order = np.lexsort((ids, -s))
        exp = [int(ids[j]) for j in order if ids[j] != ids[qi]][:3]
        sub = got[got["query_id"] == ids[qi]].sort_values("rank")
        assert sub["neighbor_id"].tolist() == exp, ids[qi]


def test_bruteforce_gate_falls_back_to_ivf(spark, embeddings):
    """Above the broadcast cap the exact path must not driver-collect:
    'ivf' falls back to the distributed path, 'error' raises clearly."""
    with pytest.raises(ValueError, match="max_corpus_rows"):
        brute_force_topk(
            spark, embeddings, embeddings, k=1,
            max_corpus_rows=10, on_overflow="error",
        )
    out = brute_force_topk(
        spark, embeddings, embeddings, k=1, max_corpus_rows=10, on_overflow="ivf"
    )
    # fallback produced a full per-query result set via IVF
    assert out.select("query_id").distinct().count() == embeddings.count()


def test_route_pairs_bound():
    from ferrobus_spark.routing.products import MAX_ROUTE_PAIRS, route_pairs

    too_many = [(0, i) for i in range(MAX_ROUTE_PAIRS + 1)]
    with pytest.raises(ValueError, match="MAX_ROUTE_PAIRS"):
        route_pairs(None, None, None, None, None, too_many, 0, 3)


def test_lsh_topk_recall(spark, embeddings):
    exact = brute_force_topk(spark, embeddings, embeddings, k=1).toPandas()
    approx = lsh_topk(spark, embeddings, embeddings, k=1,
                      n_tables=16, bits_per_table=4).toPandas()
    e1 = dict(zip(exact["query_id"], exact["neighbor_id"]))
    a1 = dict(zip(approx["query_id"], approx["neighbor_id"]))
    hits = sum(1 for q, n in e1.items() if a1.get(q) == n)
    recall = hits / len(e1)
    assert recall >= 0.7, f"LSH 1-NN recall too low: {recall:.2f}"


def test_ivf_topk_recall(spark, embeddings):
    from ferrobus_spark.operators.similarity import ivf_topk

    exact = brute_force_topk(spark, embeddings, embeddings, k=1).toPandas()
    approx = ivf_topk(spark, embeddings, embeddings, k=1,
                      n_lists=16, n_probe=8).toPandas()
    e1 = dict(zip(exact["query_id"], exact["neighbor_id"]))
    a1 = dict(zip(approx["query_id"], approx["neighbor_id"]))
    hits = sum(1 for q, n in e1.items() if a1.get(q) == n)
    recall = hits / len(e1)
    assert recall >= 0.8, f"IVF 1-NN recall too low: {recall:.2f}"
    # every query must get k results (no empty probe sets)
    assert len(a1) == len(e1)


def test_streaming_windowed_counts(spark, sf_dir, tmp_path):
    import shutil

    from ferrobus_spark.streaming.events import (
        read_events_stream,
        run_available_now,
        windowed_event_counts,
    )

    src = tmp_path / "events_stream"
    src.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src / "part-0.parquet")

    stream = read_events_stream(spark, str(src))
    assert stream.isStreaming
    rows = run_available_now(windowed_event_counts(stream), "win_counts_t")

    # batch twin must agree exactly
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    exp = (
        batch.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
        .collect()
    )
    got = {(r.window_start, r.event_type): r.n_events for r in rows}
    want = {(r.window_start, r.event_type): r.n_events for r in exp}
    assert got == want


def test_stateful_first_seen(spark, sf_dir, tmp_path):
    import shutil

    from ferrobus_spark.streaming.events import (
        read_events_stream,
        run_available_now,
        stateful_first_seen,
    )

    src = tmp_path / "events_stream3"
    src.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src / "part-0.parquet")
    rows = run_available_now(
        stateful_first_seen(read_events_stream(spark, str(src))),
        "first_seen_t",
        output_mode="append",
    )
    batch = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    exp = (
        batch.sort_values(["ts", "event_id"])
        .groupby("user_id", as_index=False)
        .first()
    )
    got = {r.user_id: (r.first_ts, r.first_event_id) for r in rows}
    assert len(got) == len(exp)
    for r in exp.itertuples(index=False):
        assert got[r.user_id] == (r.ts, r.event_id), r.user_id


def test_streaming_session_windows(spark, sf_dir, tmp_path):
    import shutil

    from ferrobus_spark.streaming.events import (
        read_events_stream,
        run_available_now,
        session_windows,
    )

    src = tmp_path / "events_stream2"
    src.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src / "part-0.parquet")
    rows = run_available_now(
        session_windows(read_events_stream(spark, str(src))), "sess_t"
    )
    assert len(rows) > 0
    # session totals must cover every event exactly once
    total = sum(r.n_events for r in rows)
    assert total == spark.read.parquet(f"{sf_dir}/events.parquet").count()


def test_streaming_url_first_seen(spark, sf_dir, tmp_path):
    """Streaming crawl-frontier dedup ≡ batch min_by per canonical url:
    a re-crawl of every page under messier URLs (upper-cased host, :443,
    fragment) arrives in a LATER file; the stateful operator must emit
    one row per canonical url with the ORIGINAL fetch."""
    from pyspark.sql import functions as F

    from ferrobus_spark.functions.urls import canonical_url_col
    from ferrobus_spark.sources.pages import pages_table
    from ferrobus_spark.streaming.events import run_available_now, url_first_seen

    pages = pages_table(spark, sf_dir).select("url", "warc_ts").limit(200).localCheckpoint()
    recrawl = pages.select(
        F.concat(
            F.lit("HTTPS://"),
            F.upper(F.regexp_extract("url", r"^https://([^/]+)", 1)),
            F.lit(":443"),
            F.regexp_extract("url", r"^https://[^/]+(.*)$", 1),
            F.lit("#utm"),
        ).alias("url"),
        (F.col("warc_ts") + F.expr("INTERVAL 7 DAYS")).alias("warc_ts"),
    )
    src = tmp_path / "pages_stream"
    pages.coalesce(1).write.mode("overwrite").parquet(str(src / "f0"))
    recrawl.coalesce(1).write.mode("overwrite").parquet(str(src / "f1"))

    stream = (
        spark.readStream.schema("url STRING, warc_ts TIMESTAMP")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    got = {
        r.canon_url: (r.first_ts, r.first_url)
        for r in run_available_now(url_first_seen(stream), "url_first_seen", "append")
    }

    batch = (
        pages.unionByName(recrawl)
        .withColumn("canon_url", canonical_url_col(F.col("url")))
        .groupBy("canon_url")
        .agg(F.min(F.struct("warc_ts", "url")).alias("m"))
        .select("canon_url", F.col("m.warc_ts").alias("first_ts"), F.col("m.url").alias("first_url"))
    )
    exp = {r.canon_url: (r.first_ts, r.first_url) for r in batch.collect()}
    assert got == exp
    assert len(got) == 200  # every re-crawl collapsed onto its original
    assert all(u.startswith("https://") and "#" not in u for u in got)


def test_streaming_tile_counts(spark, sf_dir, tmp_path):
    """Streaming per-tile heat map ≡ the batch tile histogram over the
    same derived (warc_ts, cell) columns."""
    import shutil

    from ferrobus_spark.registry import CELL_REF_SQL
    from ferrobus_spark.streaming.events import (
        read_pages_stream,
        run_available_now,
        streaming_tile_counts,
    )

    src = tmp_path / "pages_stream"
    src.mkdir()
    shutil.copy(f"{sf_dir}/documents.parquet", src / "part-0.parquet")

    stream = read_pages_stream(spark, str(src))
    assert stream.isStreaming
    rows = run_available_now(streaming_tile_counts(stream), "tile_counts_t")

    # expected side comes from the BATCH pages table, not a third copy of
    # the derivation — a batch-side change now breaks this test instead
    # of silently diverging from it
    from ferrobus_spark.sources.pages import pages_table

    exp = (
        pages_table(spark, sf_dir)
        .select("warc_ts", "lon", "lat", "doc_id")
        .groupBy(F.window("warc_ts", "1 hour").alias("w"), F.expr(CELL_REF_SQL).alias("cell"))
        .agg(F.count("*").alias("n_pages"))
        .select(F.col("w.start").alias("window_start"), "cell", "n_pages")
        .collect()
    )
    got = {(r.window_start, r.cell): r.n_pages for r in rows}
    want = {(r.window_start, r.cell): r.n_pages for r in exp}
    assert got == want and len(got) > 10


def test_ivf_twin_quantizer_bit_identical():
    """The oracle's independent k-means restatement and the engine
    trainer must produce bit-identical centroids under the shared
    determinism contract — if either drifts, this fails before the
    driver gate does."""
    import numpy as np

    from ferrobus_spark.operators.similarity import train_ivf_centroids
    from ferrobus_spark.registry_ext import _ivf_centroids_twin

    rng = np.random.default_rng(99)
    X = rng.normal(size=(500, 32))
    X[7] = 0.0  # zero-norm row exercises the norm guard
    a = train_ivf_centroids(X, n_lists=8)
    b = _ivf_centroids_twin(X, n_lists=8)
    assert np.array_equal(a, b)


def test_incremental_cosine_neardup_equals_full_restricted(spark, embeddings):
    """Crawl-N embedding near-dup ≡ the full-union pair set restricted to
    new-touching pairs (planted identical copies guarantee ≥0.95 hits)."""
    from ferrobus_spark.operators.similarity import (
        cosine_neardup_pairs,
        incremental_cosine_neardup_pairs,
    )

    old = embeddings.select("vec_id", "embedding")
    new = old.filter(F.col("vec_id") % 7 == 0).withColumn(
        "vec_id", F.col("vec_id") + 500000
    )
    inc = incremental_cosine_neardup_pairs(spark, new, old, threshold=0.95).toPandas()
    full = cosine_neardup_pairs(
        spark, old.unionByName(new), threshold=0.95
    ).toPandas()
    want = {
        (r.id_a, r.id_b)
        for r in full.itertuples(index=False)
        if r.id_a >= 500000 or r.id_b >= 500000
    }
    got = {(r.id_a, r.id_b) for r in inc.itertuples(index=False)}
    assert got == want
    assert len(got) > 0
    assert all(b >= 500000 for _a, b in got)  # no old-only pair leaked


def _plan_str(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_lsh_topk_plan_shape(spark, embeddings):
    """Pin the round-6/7 ANN shape: a (table, bucket[, sub]) COGROUP
    scores each bucket block (FlatMapCoGroupsInPandas); since the
    round-7 score unification there is NO per-candidate vector
    join-back — the only joins left are the id-light hot-bucket size
    equi-joins from _sub_split. With dim supplied, no driver probe job
    is needed to build the plan."""
    from pyspark.sql import functions as F

    dim = embeddings.select(F.size("embedding")).first()[0]
    res = lsh_topk(spark, embeddings, embeddings, k=3, dim=dim)
    plan = _plan_str(res)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "FlatMapCoGroupsInPandas" in plan
    # with the guard disabled, no join operator of any kind remains
    plain = _plan_str(lsh_topk(
        spark, embeddings, embeddings, k=3, dim=dim, max_bucket_size=None
    ))
    assert "Join" not in plain


def test_ivf_topk_plan_shape(spark, embeddings):
    from ferrobus_spark.operators.similarity import ivf_topk

    res = ivf_topk(spark, embeddings, embeddings, k=3, n_lists=8, n_probe=2)
    plan = _plan_str(res)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # round-6 shape: the re-rank is a list_id COGROUP (one matmul per
    # inverted list, per-list top-k), not a candidate equi-join carrying
    # both vectors per pair — the join shape moved ~200 GB at sf1.0
    assert "FlatMapCoGroupsInPandas" in plan


def test_block_topk_chunked_merge_is_exact(spark, embeddings, monkeypatch):
    """Force the bounded-memory merge path (the round-7 OOM fix): with
    _Q_CHUNK/_C_CHUNK shrunk to single digits every cogroup task must
    run dozens of merge rounds, and the (ids, ranks) must be IDENTICAL
    to the default wide-matmul blocks — the running top-k merge is
    exact, not approximate. Cosines compare at 1e-12: chunked BLAS may
    differ in the last ulp."""
    from ferrobus_spark.operators import similarity as sim

    base_lsh = lsh_topk(spark, embeddings, embeddings, k=3, dim=64).toPandas()
    base_ivf = sim.ivf_topk(
        spark, embeddings, embeddings, k=3, n_lists=4, n_probe=4
    ).toPandas()

    monkeypatch.setattr(sim, "_Q_CHUNK", 7)
    monkeypatch.setattr(sim, "_C_CHUNK", 11)
    tiny_lsh = sim.lsh_topk(spark, embeddings, embeddings, k=3, dim=64).toPandas()
    tiny_ivf = sim.ivf_topk(
        spark, embeddings, embeddings, k=3, n_lists=4, n_probe=4
    ).toPandas()

    for base, tiny in ((base_lsh, tiny_lsh), (base_ivf, tiny_ivf)):
        b = base.sort_values(["query_id", "rank"]).reset_index(drop=True)
        t = tiny.sort_values(["query_id", "rank"]).reset_index(drop=True)
        assert b[["query_id", "neighbor_id", "rank"]].equals(
            t[["query_id", "neighbor_id", "rank"]]
        )
        assert (b["cosine"] - t["cosine"]).abs().max() < 1e-12


def test_ivf_forced_giant_list_matches_exact(spark, embeddings, monkeypatch):
    """The advisor's 100 TB hazard in miniature: n_lists=2 makes each
    inverted list ≈ corpus/2 — far wider than the (tiny, patched) chunk
    bounds — and n_probe=2 probes everything, so IVF must equal the
    brute-force exact top-k while never allocating a sims block larger
    than q_chunk × c_chunk."""
    from ferrobus_spark.operators import similarity as sim

    monkeypatch.setattr(sim, "_Q_CHUNK", 13)
    monkeypatch.setattr(sim, "_C_CHUNK", 17)
    got = (
        sim.ivf_topk(spark, embeddings, embeddings, k=3, n_lists=2, n_probe=2)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    exact = (
        brute_force_topk(spark, embeddings, embeddings, k=3)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert got[["query_id", "neighbor_id", "rank"]].equals(
        exact[["query_id", "neighbor_id", "rank"]]
    )


def test_sub_split_forced_equivalence(spark, embeddings):
    """Force _sub_split to shatter every bucket/list (caps of 3 and 5
    rows) — the salted sub-group union must reproduce the unguarded
    results exactly on (ids, ranks): top-k(group) ⊆ ∪ top-k(sub)."""
    from ferrobus_spark.operators.similarity import ivf_topk

    def key(df):
        return (
            df.sort_values(["query_id", "rank"])
            .reset_index(drop=True)[["query_id", "neighbor_id", "rank"]]
        )

    base = lsh_topk(spark, embeddings, embeddings, k=3, dim=64,
                    max_bucket_size=None).toPandas()
    split = lsh_topk(spark, embeddings, embeddings, k=3, dim=64,
                     max_bucket_size=3).toPandas()
    assert key(base).equals(key(split))

    base_i = ivf_topk(spark, embeddings, embeddings, k=3, n_lists=4,
                      n_probe=4, max_list_size=None).toPandas()
    split_i = ivf_topk(spark, embeddings, embeddings, k=3, n_lists=4,
                       n_probe=4, max_list_size=5).toPandas()
    assert key(base_i).equals(key(split_i))


def test_ivf_auto_n_lists(spark, embeddings):
    """n_lists=None sizes the quantizer from a corpus count (≈√N,
    clamped to [16, max_train//39]) instead of a fixed 16 — the
    brute_force_topk overflow fallback exercises exactly this default."""
    from ferrobus_spark.operators.similarity import ivf_topk

    n = embeddings.count()
    res = ivf_topk(spark, embeddings, embeddings, k=1, n_probe=4).toPandas()
    # every query answered, no empties from over-partitioned lists
    assert res["query_id"].nunique() == n
    assert (res["rank"] == 1).all()


def test_float64_scoring_breaks_float32_ties(spark, tmp_path):
    """Regression pin for the sf3.0 sweep finding (round 7): two corpus
    vectors one float32 ulp apart can be EXACTLY tied under float32
    cosine arithmetic (DuckDB's list_cosine_similarity on a raw
    FLOAT[] column) while float64 orders them — at sf3.0 one such
    rank-boundary pair (query 26199) made the float32 twin pick the
    wrong neighbor. The engine scores in float64 throughout
    (brute_force_topk casts via .astype(np.float64)); this test pins
    that, and pins the oracle convention that every twin scoring raw
    embeddings must CAST to DOUBLE[] first (registry_ext._knn_bf_oracle
    and siblings)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(1234)
    dim = 16
    q = rng.standard_normal(dim).astype(np.float32)
    a = rng.standard_normal(dim).astype(np.float32)
    b = a.copy()
    b[0] = np.nextafter(a[0], np.float32(np.sign(a[0]) * 1e9),
                        dtype=np.float32)
    # far-away filler so k=2 ranks are decided purely by the tie pair
    filler = -q + rng.standard_normal(dim).astype(np.float32) * 0.01

    def cos64(v):
        q64, v64 = q.astype(np.float64), v.astype(np.float64)
        return float(q64 @ v64 / (np.linalg.norm(q64) * np.linalg.norm(v64)))

    # the construction really is a float64-orderable sub-float32 tie
    assert cos64(a) != cos64(b)
    assert abs(cos64(a) - cos64(b)) < 1e-7
    winner = 1 if cos64(a) > cos64(b) else 2

    path = str(tmp_path / "tie.parquet")
    pq.write_table(pa.table({
        "vec_id": pa.array([0, 1, 2, 3], pa.int64()),
        "embedding": pa.array(
            [q.tolist(), a.tolist(), b.tolist(), filler.tolist()],
            pa.list_(pa.float32())),
    }), path)

    # engine: float64 ordering, rank 1 = the float64 winner
    df = spark.read.parquet(path)
    res = brute_force_topk(
        spark, df.filter(F.col("vec_id") == 0), df, k=2,
        max_corpus_rows=None,
    ).toPandas().sort_values("rank")
    assert res["neighbor_id"].tolist()[:2] == [winner, 3 - winner]

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{path}')")
    # raw FLOAT[] scoring is degenerate: exactly tied, cannot order
    raw = dict(con.execute("""
        SELECT c.vec_id, list_cosine_similarity(q.embedding, c.embedding)
        FROM embeddings q JOIN embeddings c
          ON q.vec_id = 0 AND c.vec_id IN (1, 2)
    """).fetchall())
    assert raw[1] == raw[2]
    # the oracle convention (CAST to DOUBLE[]) agrees with the engine
    cast = dict(con.execute("""
        SELECT c.vec_id,
               list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                      CAST(c.embedding AS DOUBLE[]))
        FROM embeddings q JOIN embeddings c
          ON q.vec_id = 0 AND c.vec_id IN (1, 2)
    """).fetchall())
    assert (cast[1] > cast[2]) == (winner == 1)
    con.close()
