"""Dedup + text-analysis operators: correctness vs brute force."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ferrobus_spark.operators.dedup import (
    _minhash,
    _shingle_hashes,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_col,
    simhash_near_pairs,
)


@pytest.fixture(scope="module")
def corpus(spark):
    base = [
        "the quick brown fox jumps over the lazy dog in the park",
        "a completely different document about spark dataframes and shuffles",
        "numerical analysis of partial differential equations on meshes",
        "cats and dogs living together in a quiet neighborhood street",
        "web scale data processing with distributed hash joins and sorts",
    ]
    rows = []
    did = 0
    for i, t in enumerate(base):
        rows.append((did, t)); did += 1
        rows.append((did, t)); did += 1                      # exact dup
        rows.append((did, t.replace("the", "teh", 1))); did += 1  # near dup
        rows.append((did, t + " extra trailing words appended here")); did += 1
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def _true_jaccard(a: str, b: str, k: int = 5) -> float:
    sa, sb = _shingle_hashes(a, k), _shingle_hashes(b, k)
    inter = len(np.intersect1d(sa, sb, assume_unique=True))
    return inter / (len(sa) + len(sb) - inter)


def test_minhash_estimates_jaccard(corpus):
    pdf = corpus.toPandas()
    sigs = {r.id: np.array(r.signature) for r in
            minhash_signatures(corpus, n_hashes=128).collect()}
    texts = dict(zip(pdf["doc_id"], pdf["text"]))
    for a, b in [(0, 1), (0, 2), (0, 3), (0, 4)]:
        est = (sigs[a] == sigs[b]).mean()
        true = _true_jaccard(texts[a], texts[b])
        assert est == pytest.approx(true, abs=0.15), (a, b)


def test_lsh_finds_all_high_jaccard_pairs(corpus):
    pdf = corpus.toPandas()
    texts = dict(zip(pdf["doc_id"], pdf["text"]))
    ids = sorted(texts)
    truth = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if _true_jaccard(texts[a], texts[b]) >= 0.6
    }
    sigs = minhash_signatures(corpus, n_hashes=128)
    got = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(sigs, n_bands=32, threshold=0.5).collect()
    }
    assert truth <= got  # recall: every true near-dup pair surfaces
    # and exact-refine confirms their true jaccard
    pairs = corpus.sparkSession.createDataFrame(
        pd.DataFrame(sorted(truth), columns=["id_a", "id_b"])
    )
    refined = ngram_jaccard_pairs(corpus, pairs).toPandas()
    for r in refined.itertuples(index=False):
        assert r.jaccard == pytest.approx(_true_jaccard(texts[r.id_a], texts[r.id_b]))


def test_simhash_exact_dups_have_zero_hamming(corpus):
    sim = {r.id: r.simhash for r in simhash_col(corpus).collect()}
    assert sim[0] == sim[1]  # identical texts → identical simhash
    pairs = simhash_near_pairs(simhash_col(corpus), max_hamming=3).toPandas()
    got = {(r.id_a, r.id_b): r.hamming for r in pairs.itertuples(index=False)}
    assert got[(0, 1)] == 0


def test_lang_id_accuracy(spark):
    from ferrobus_spark.functions.text import lang_id_udf

    samples = [
        ("en", "the cat sat on the mat and that was that for the day"),
        ("de", "der hund und die katze sind nicht das problem in der stadt"),
        ("fr", "le chat et la souris sont dans les jardins est bien"),
        ("es", "el perro y la casa de que los gatos es grande"),
    ]
    df = spark.createDataFrame(pd.DataFrame(samples, columns=["lang", "text"]))
    got = df.select("lang", lang_id_udf("text").alias("pred")).collect()
    for r in got:
        assert r.pred == r.lang, r


def test_lang_id_codegen_equals_udf(spark, corpus):
    """The JVM-side lang_id_col (the hot-path impl) is prediction-
    identical to the Arrow UDF reference on the corpus plus edge rows
    (empty, null, ties, markerless)."""
    from ferrobus_spark.functions.text import lang_id_col, lang_id_udf

    edge = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [100001, 100002, 100003, 100004],
                "text": ["", None, "the der le el il o", "zzz qqq xxx"],
            }
        )
    )
    df = corpus.select("doc_id", "text").unionByName(edge)
    out = df.select(
        "doc_id",
        lang_id_udf(F.col("text")).alias("p_udf"),
        lang_id_col(F.col("text")).alias("p_col"),
    ).collect()
    for r in out:
        assert r.p_udf == r.p_col, (r.doc_id, r.p_udf, r.p_col)


def test_lang_id_codegen_equals_udf_fuzz(spark):
    """Property fuzz of the codegen/UDF equivalence over a realistic
    alphabet (letters incl. accents, digits, punctuation, space/tab/
    newline). Exotic unicode whitespace is deliberately excluded —
    Java's and Python's \\s classes differ there (documented caveat in
    lang_id_col); within real-text characters the two implementations
    must agree exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ferrobus_spark.functions.text import lang_id_col, lang_id_udf

    alphabet = st.sampled_from(
        list("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
             "0123456789 .,;:!?'\"()- \t\néüñàçß le der el the il o de")
    )
    texts_strategy = st.lists(
        st.text(alphabet=alphabet, min_size=0, max_size=120),
        min_size=1, max_size=24,
    )

    @settings(max_examples=12, deadline=None)
    @given(texts=texts_strategy)
    def check(texts):
        df = spark.createDataFrame(
            pd.DataFrame({"i": range(len(texts)), "text": texts})
        )
        out = df.select(
            lang_id_udf(F.col("text")).alias("p_udf"),
            lang_id_col(F.col("text")).alias("p_col"),
        ).collect()
        for r in out:
            assert r.p_udf == r.p_col, (r.p_udf, r.p_col)

    check()


def test_quality_and_fingerprint_deterministic(spark, corpus):
    from ferrobus_spark.functions.text import fingerprint_udf, quality_score_col

    a = corpus.select("doc_id", quality_score_col("text").alias("q"),
                      fingerprint_udf("text").alias("fp")).toPandas()
    b = corpus.select("doc_id", quality_score_col("text").alias("q"),
                      fingerprint_udf("text").alias("fp")).toPandas()
    pd.testing.assert_frame_equal(
        a.sort_values("doc_id").reset_index(drop=True),
        b.sort_values("doc_id").reset_index(drop=True),
    )
    assert a["q"].between(0, 1).all()
    # identical texts → identical fingerprints; distinct texts → distinct
    fp = dict(zip(a["doc_id"], a["fp"]))
    assert fp[0] == fp[1]
    assert fp[0] != fp[4]


def test_hot_bucket_guard_bounds_template_blowup(spark):
    """Thousands of near-identical template docs must NOT produce a k²
    candidate cross-product (the round-4 disk-exhaustion blowup), while
    (a) byte-identical templates stay one connected component via the
    exact-signature star fallback and (b) normal planted dup pairs are
    still recovered. This is the operator-side hardening the round-4
    bench sidestepped by changing the corpus."""
    import random

    rng = random.Random(20240517)
    tmpl = "breaking news boilerplate header nav footer copyright " * 30
    rows = [(i, tmpl) for i in range(3000)]  # one giant hot bucket per band
    vocab = ("alpha bravo charlie delta echo foxtrot golf hotel india "
             "juliett kilo lima mike november oscar papa").split()
    planted = []
    for i in range(20):
        base = " ".join(rng.choice(vocab) for _ in range(300)) + f" doc{i}"
        a, b = 10000 + 2 * i, 10001 + 2 * i
        rows.append((a, base))
        rows.append((b, base + " trailing tweak"))
        planted.append((a, b))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    sigs = minhash_signatures(df)
    pairs = minhash_lsh_pairs(sigs, threshold=0.5, n_hashes=64,
                              max_bucket_size=256)
    got = pairs.toPandas()
    # bounded: 2999 star edges + all-pairs among the 40 (small-vocab, hence
    # mutually similar) planted docs — nowhere near 3000*2999/2 ≈ 4.5M
    assert len(got) < 3000 + 40 * 39 // 2
    tmpl_edges = got[(got.id_a < 3000) & (got.id_b < 3000)]
    # star from the min id reaches every other template doc → one component
    assert len(tmpl_edges) == 2999
    assert set(tmpl_edges.id_a) == {0}
    assert set(tmpl_edges.id_b) == set(range(1, 3000))
    assert (tmpl_edges_est := got[(got.id_a < 3000)]["est_jaccard"]).min() == 1.0
    found = set(map(tuple, got[["id_a", "id_b"]].itertuples(index=False)))
    missed = [p for p in planted if p not in found]
    assert not missed, f"guard lost planted dups: {missed}"
    # observability companion reports the hot buckets
    from ferrobus_spark.operators.dedup import lsh_hot_bucket_stats

    stats = lsh_hot_bucket_stats(sigs, max_bucket_size=256).toPandas()
    assert len(stats) == 16  # every band's template bucket is hot
    assert (stats.members == 3000).all()
    assert (stats.exact_groups == 1).all()


def test_hot_bucket_guard_noop_below_cap(spark):
    """With no bucket over the cap, guarded output ≡ unguarded output."""
    rng = np.random.default_rng(11)
    words = [f"w{i}" for i in range(50)]
    rows = []
    for i in range(120):
        rows.append((i, " ".join(rng.choice(words, 80))))
    for i in range(10):  # planted exact dups
        rows.append((1000 + i, rows[i][1]))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    sigs = minhash_signatures(df)
    guarded = minhash_lsh_pairs(sigs, n_hashes=64, max_bucket_size=256).toPandas()
    exact = minhash_lsh_pairs(sigs, n_hashes=64, max_bucket_size=None).toPandas()
    key = lambda d: sorted(map(tuple, d[["id_a", "id_b"]].itertuples(index=False)))
    assert key(guarded) == key(exact)
    assert len(guarded) >= 10


def test_simhash_hot_bucket_guard(spark):
    """Same template-corpus hazard as MinHash-LSH: 2000 identical docs
    must produce a bounded star, not a 2M-candidate cross-product, and
    guarded == unguarded below the cap."""
    rows = [(i, "identical boilerplate body text repeated " * 12)
            for i in range(2000)]
    rng = np.random.default_rng(5)
    words = [f"w{i}" for i in range(200)]
    for i in range(60):
        rows.append((5000 + i, " ".join(rng.choice(words, 60))))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    sim = simhash_col(df)
    got = simhash_near_pairs(sim, max_hamming=3, max_bucket_size=256).toPandas()
    tmpl = got[(got.id_a < 5000) & (got.id_b < 5000)]
    assert len(tmpl) == 1999
    assert set(tmpl.id_a) == {0}
    assert (tmpl.hamming == 0).all()
    assert len(got) < 1999 + 60 * 59 // 2

    small = spark.createDataFrame(
        pd.DataFrame(rows[2000:], columns=["doc_id", "text"])
    )
    s2 = simhash_col(small).localCheckpoint()
    key = lambda d: sorted(map(tuple, d[["id_a", "id_b", "hamming"]].itertuples(index=False)))
    assert key(simhash_near_pairs(s2, max_bucket_size=256).toPandas()) == \
           key(simhash_near_pairs(s2, max_bucket_size=None).toPandas())


def test_incremental_minhash_equals_full_restricted(spark):
    """Crawl-N dedup: incremental pairs (new vs old ∪ new) must equal the
    full-union pair set restricted to pairs touching a new doc — without
    ever forming old×old candidates."""
    from ferrobus_spark.operators.dedup import incremental_minhash_pairs

    rng = np.random.default_rng(42)
    words = [f"tok{i}" for i in range(400)]
    old_rows = [(i, " ".join(rng.choice(words, 80))) for i in range(90)]
    new_rows = []
    for j in range(10):  # cross-batch re-crawls (near-identical)
        new_rows.append((1000 + j, old_rows[j][1] + " tail"))
    for j in range(5):  # intra-batch dup pairs
        t = " ".join(rng.choice(words, 80))
        new_rows.append((1100 + 2 * j, t))
        new_rows.append((1101 + 2 * j, t))
    for j in range(15):  # fresh uniques
        new_rows.append((1200 + j, " ".join(rng.choice(words, 80)) + f" u{j}"))
    old = spark.createDataFrame(pd.DataFrame(old_rows, columns=["doc_id", "text"]))
    new = spark.createDataFrame(pd.DataFrame(new_rows, columns=["doc_id", "text"]))

    old_sigs = minhash_signatures(old)
    new_sigs = minhash_signatures(new)
    inc = incremental_minhash_pairs(new_sigs, old_sigs, threshold=0.5).toPandas()

    full = minhash_lsh_pairs(
        minhash_signatures(old.unionByName(new)), threshold=0.5, n_hashes=64
    ).toPandas()
    new_ids = {r[0] for r in new_rows}
    want = {
        (r.id_a, r.id_b, round(r.est_jaccard, 9))
        for r in full.itertuples(index=False)
        if r.id_a in new_ids or r.id_b in new_ids
    }
    got = {(r.id_a, r.id_b, round(r.est_jaccard, 9)) for r in inc.itertuples(index=False)}
    assert got == want
    assert len(got) >= 15  # all planted cross- and intra-batch dups present
    # no old-only pair leaked
    assert all(a in new_ids or b in new_ids for a, b, _ in got)


def test_incremental_minhash_hot_bucket_star(spark):
    """A template hot bucket spanning batches: 400 old + 50 new identical
    docs. The star must attach every NEW copy to the OLD group minimum
    (the keeper) and emit no old×old edges."""
    from ferrobus_spark.operators.dedup import incremental_minhash_pairs

    tmpl = "hot template body words " * 20
    old = spark.createDataFrame(
        pd.DataFrame([(i, tmpl) for i in range(400)], columns=["doc_id", "text"])
    )
    new = spark.createDataFrame(
        pd.DataFrame([(9000 + i, tmpl) for i in range(50)], columns=["doc_id", "text"])
    )
    got = incremental_minhash_pairs(
        minhash_signatures(new), minhash_signatures(old),
        threshold=0.5, max_bucket_size=256,
    ).toPandas()
    assert sorted(map(tuple, got[["id_a", "id_b"]].itertuples(index=False))) == [
        (0, 9000 + i) for i in range(50)
    ]
    assert (got.est_jaccard == 1.0).all()


def _plan_str(df):
    return df._jdf.queryExecution().executedPlan().toString()


def _assert_equi_join_plan(plan: str):
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_minhash_lsh_pairs_plan_shape(spark, monkeypatch):
    """Physical-plan pin (mirrors knn_join's in test_spatial.py): the
    AT-SCALE path — the joined fallback beyond the signature-broadcast
    gate — must stay an equi-join on (band, bucket); a refactor that
    degrades it to a cartesian/BNLJ would pass tiny-corpus value tests
    while being a 100 TB scale-killer. The gate is forced shut so the
    fallback plan is the one pinned."""
    import ferrobus_spark.operators.dedup as dd

    monkeypatch.setattr(dd, "_MAX_BROADCAST_SIGS", 0)
    sigs = spark.range(64).select(
        F.col("id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(dd.N_HASHES)),
            lambda i: F.xxhash64(F.col("id") % 7, i),
        ).alias("signature"),
    )
    plan = _plan_str(dd.minhash_lsh_pairs(sigs, n_hashes=dd.N_HASHES))
    _assert_equi_join_plan(plan)


def test_minhash_vectorized_equals_joined_path(spark, monkeypatch):
    """The round-8 vectorized scoring path (broadcast signature matrix +
    in-bucket NumPy pair generation) must be row-identical to the
    distributed join fallback, on a corpus that exercises hot buckets
    (template docs over the cap), cold near-dup pairs, AND the kernel's
    batch-straddling group carry + pair-chunk slicing (both forced tiny)."""
    import ferrobus_spark.operators.dedup as dd

    rows = []
    did = 0
    for i in range(40):  # template stratum -> hot buckets (cap forced low)
        rows.append((did, "template boilerplate page body shared verbatim")); did += 1
    for i in range(30):  # near-dup stratum
        rows.append((did, f"document number {i % 6} with mostly shared words")); did += 1
    for i in range(30):  # unique stratum
        rows.append((did, f"totally unique text {i} {i*17} {i*29} xyz{i}")); did += 1
    corpus = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    sigs = minhash_signatures(corpus)

    def run():
        return sorted(
            map(tuple, minhash_lsh_pairs(sigs, n_hashes=64, max_bucket_size=8).collect())
        )

    monkeypatch.setattr(dd, "_PAIR_CHUNK", 3)  # force chunk slicing
    vec = run()
    monkeypatch.setattr(dd, "_MAX_BROADCAST_SIGS", 0)  # force joined path
    joined = run()
    assert vec == joined
    assert len(vec) > 0


def test_incremental_minhash_pairs_plan_shape(spark, monkeypatch):
    """Pin the AT-SCALE fallback (beyond the round-8 union-side gate):
    the new-bands-drive-the-probe join must stay an equi-join."""
    import ferrobus_spark.operators.dedup as dd
    from ferrobus_spark.operators.dedup import N_HASHES

    monkeypatch.setattr(dd, "_MAX_BROADCAST_SIGS", 0)

    def sigs(lo, n, mod):
        return spark.range(lo, lo + n).select(
            F.col("id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(N_HASHES)),
                lambda i: F.xxhash64(F.col("id") % mod, i),
            ).alias("signature"),
        )

    plan = _plan_str(
        dd.incremental_minhash_pairs(sigs(1000, 32, 5), sigs(0, 64, 7), n_hashes=N_HASHES)
    )
    _assert_equi_join_plan(plan)


def test_incremental_vectorized_equals_joined_path(spark, monkeypatch):
    """The round-8 vectorized incremental path (union-side gate, is_new
    flag carried as an extra broadcast column, keeper-flag stars derived
    driver-side) must be row-identical to the asymmetric join fallback —
    including the crawl-N rules that old×old pairs never surface and
    hot-group star edges need a new member or a new keeper. Corpus:
    template stratum split across old/new (hot buckets with old AND new
    members over a tiny cap), an all-OLD template group (must emit
    nothing), cross-crawl near-dups, uniques; kernel chunking forced
    tiny."""
    import ferrobus_spark.operators.dedup as dd
    from ferrobus_spark.operators.dedup import minhash_signatures

    old_rows, new_rows = [], []
    did = 0
    for i in range(25):  # template A: old members ...
        old_rows.append((did, "template boilerplate page body shared verbatim")); did += 1
    for i in range(15):  # ... and new members (same hot group)
        new_rows.append((did, "template boilerplate page body shared verbatim")); did += 1
    for i in range(30):  # template B: ALL old — stars must not leak
        old_rows.append((did, "other template footer block repeated everywhere")); did += 1
    for i in range(20):  # near-dup stratum straddling crawls
        (old_rows if i % 2 else new_rows).append(
            (did, f"document number {i % 5} with mostly shared words")); did += 1
    for i in range(20):  # uniques
        (old_rows if i % 2 else new_rows).append(
            (did, f"totally unique text {i} {i*17} {i*29} xyz{i}")); did += 1
    old = spark.createDataFrame(pd.DataFrame(old_rows, columns=["doc_id", "text"]))
    new = spark.createDataFrame(pd.DataFrame(new_rows, columns=["doc_id", "text"]))
    old_sigs = minhash_signatures(old)
    new_sigs = minhash_signatures(new)

    def run():
        return sorted(map(tuple, dd.incremental_minhash_pairs(
            new_sigs, old_sigs, threshold=0.5, max_bucket_size=8
        ).collect()))

    monkeypatch.setattr(dd, "_PAIR_CHUNK", 3)  # force chunk slicing
    vec = run()
    monkeypatch.setattr(dd, "_MAX_BROADCAST_SIGS", 0)  # force joined path
    joined = run()
    assert vec == joined
    assert len(vec) > 0
    # old×old template-B pairs must not appear on either path
    new_ids = {r[0] for r in new_rows}
    assert all(a in new_ids or b in new_ids for a, b, _ in vec)


def test_simhash_near_pairs_plan_shape(spark, monkeypatch):
    """Pin the AT-SCALE fallback (beyond the round-8 broadcast gate):
    the chunk self-join must stay an equi-join on (chunk_idx, chunk)."""
    import ferrobus_spark.operators.dedup as dd

    monkeypatch.setattr(dd, "_MAX_BROADCAST_SIGS", 0)
    sim = spark.range(64).select(F.col("id"), F.xxhash64(F.col("id") % 9).alias("simhash"))
    plan = _plan_str(dd.simhash_near_pairs(sim))
    _assert_equi_join_plan(plan)


def test_simhash_vectorized_equals_joined_path(spark, monkeypatch):
    """The round-8 vectorized simhash path (driver hot buckets + stars,
    broadcast value array, popcount kernel) must be row-identical to the
    distributed chunk-join fallback on a corpus exercising hot buckets
    (identical template docs over a tiny cap), near-dup pairs within
    Hamming 3, uniques, AND the kernel's batch-straddling carry +
    pair-chunk slicing (forced tiny)."""
    import ferrobus_spark.operators.dedup as dd
    from ferrobus_spark.operators.dedup import simhash_col

    rows = []
    did = 0
    for i in range(40):  # template stratum -> identical simhash, hot buckets
        rows.append((did, "template boilerplate page body shared verbatim")); did += 1
    for i in range(30):  # near-dup stratum
        rows.append((did, f"document number {i % 6} with mostly shared words")); did += 1
    for i in range(30):  # unique stratum
        rows.append((did, f"totally unique text {i} {i*17} {i*29} xyz{i}")); did += 1
    corpus = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    sim = simhash_col(corpus)

    def run():
        return sorted(
            map(tuple, dd.simhash_near_pairs(sim, max_hamming=3, max_bucket_size=8).collect())
        )

    monkeypatch.setattr(dd, "_PAIR_CHUNK", 3)  # force chunk slicing
    vec = run()
    monkeypatch.setattr(dd, "_MAX_BROADCAST_SIGS", 0)  # force joined path
    joined = run()
    assert vec == joined
    assert len(vec) > 0
