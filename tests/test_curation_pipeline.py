"""End-to-end curation pipeline: funnel semantics + checkpoint resume.

Inputs are the pages table PLUS planted noise the pipeline must clean:
URL-variant re-crawls (collapse at url_dedup) and exact text copies
under new doc ids (collapse at exact/near dedup). Every stage
checkpoints; the second run must resume without recomputing.
"""

import time

import pytest
from pyspark.sql import functions as F

from ferrobus_spark.plans.curation import run_curation
from ferrobus_spark.sources.pages import pages_table


def _noisy_pages(spark, sf_dir):
    base = pages_table(spark, sf_dir).limit(300).localCheckpoint()
    # URL-variant re-crawl of every page (later fetch, messier url)
    recrawl = base.withColumn(
        "url",
        F.concat(
            F.lit("HTTPS://"),
            F.upper(F.regexp_extract("url", r"^https://([^/]+)", 1)),
            F.lit(":443"),
            F.regexp_extract("url", r"^https://[^/]+(.*)$", 1),
            F.lit("#ref"),
        ),
    ).withColumn("warc_ts", F.col("warc_ts") + F.expr("INTERVAL 3 DAYS"))
    # exact-content copies under fresh urls/doc ids (every 5th page)
    copies = (
        base.filter(F.col("doc_id") % 5 == 0)
        .withColumn("doc_id", F.col("doc_id") + 1000000)
        .withColumn("url", F.concat(F.lit("https://mirror.example.net/copy/"),
                                    F.col("doc_id").cast("string")))
    )
    return base.unionByName(recrawl).unionByName(copies)


@pytest.fixture(scope="module")
def curated_env(spark, sf_dir, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("curation_ckpt"))

    def s_pages(spark_, env):
        return _noisy_pages(spark_, sf_dir)

    t0 = time.perf_counter()
    env = run_curation(spark, root, s_pages)
    first_wall = time.perf_counter() - t0
    return root, env, first_wall, s_pages


def test_funnel_semantics(spark, sf_dir, curated_env):
    _root, env, _wall, _fn = curated_env
    n_base = 300
    # input = base + recrawl + copies
    assert env["pages"].count() == n_base + n_base + n_base // 5
    # url dedup: recrawls collapse onto base urls; copies keep their urls
    assert env["url_dedup"].count() == n_base + n_base // 5
    # the kept fetch per canonical url is the ORIGINAL (earliest) one
    assert {
        r.doc_id for r in env["url_dedup"].filter("doc_id < 1000000").collect()
    } == set(range(n_base))
    # exact dedup: each planted copy shares text with its base doc; the
    # MIN doc id (the base) is the keeper
    assert env["exact_dedup"].count() == n_base
    assert env["exact_dedup"].filter("doc_id >= 1000000").count() == 0
    # near dedup: the corpus has GENUINE near-dup clusters (word-salad
    # texts at true 5-gram Jaccard 0.93-0.99); the stage must keep the
    # minimum doc of each cluster and drop the rest — verify with an
    # independent union-find over the same LSH pairs
    from ferrobus_spark.operators.dedup import minhash_lsh_pairs, minhash_signatures

    exact = env["exact_dedup"].localCheckpoint()
    pairs = minhash_lsh_pairs(
        minhash_signatures(exact, text_col="extracted_text"), threshold=0.9
    ).select("id_a", "id_b").collect()
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs:
        ra, rb = find(int(r.id_a)), find(int(r.id_b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp: dict[int, set] = {}
    for n in list(parent):
        comp.setdefault(find(n), set()).add(n)
    expected_drop = {n for root, mem in comp.items() for n in mem if n != root}
    kept = {r.doc_id for r in env["near_dedup"].select("doc_id").collect()}
    exact_ids = {r.doc_id for r in exact.select("doc_id").collect()}
    assert kept == exact_ids - expected_drop
    assert expected_drop, "corpus should contain natural near-dup clusters"
    # curated: the gate keeps a nonempty, high-quality subset
    n_cur = env["curated"].count()
    assert 0 < n_cur <= n_base
    cols = set(env["curated"].columns)
    assert {"doc_id", "canon_url", "url", "lang_pred", "n_tokens", "quality", "text"} <= cols
    # curated text is the byte-identical extracted text of kept docs
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", F.col("text").alias("src"))
    j = env["curated"].join(docs, "doc_id")
    assert j.count() == n_cur
    assert j.filter("text <> src").count() == 0


def test_curation_from_warc_matches_parquet_input(spark, sf_dir, tmp_path_factory):
    """The production input path: pages → WARC files on disk → read_warc
    → curation pipeline. The curated output must match the parquet-input
    run row-for-row on (canon_url, text) — doc ids differ by design
    (WARC records carry none; xxhash64(url, warc_ts) is derived)."""
    from ferrobus_spark.plans.curation import warc_pages_fn
    from ferrobus_spark.sources.warc import write_warc

    base = pages_table(spark, sf_dir).limit(120).localCheckpoint()
    warc_dir = str(tmp_path_factory.mktemp("crawl_warc"))
    n = write_warc(base.select("url", "warc_ts", "html"), warc_dir, compress=True)
    assert n == 120

    root_w = str(tmp_path_factory.mktemp("curation_warc_ckpt"))
    env_w = run_curation(spark, root_w, warc_pages_fn(warc_dir))

    root_p = str(tmp_path_factory.mktemp("curation_parq_ckpt"))
    env_p = run_curation(spark, root_p, lambda s, e: base)

    # identical funnel at every stage (cluster structure is id-independent)
    for stage in ("pages", "url_dedup", "exact_dedup", "near_dedup", "curated"):
        assert env_w[stage].count() == env_p[stage].count(), stage

    # outputs agree exactly outside near-dup clusters; inside a cluster
    # the keeper is chosen by min doc_id, and WARC-derived hash ids
    # legitimately pick a different (single) member — verify the
    # disagreement is confined to clustered docs
    from ferrobus_spark.operators.dedup import minhash_lsh_pairs, minhash_signatures

    exact = env_p["exact_dedup"].localCheckpoint()
    pairs = minhash_lsh_pairs(
        minhash_signatures(exact, text_col="extracted_text"), threshold=0.9
    ).select("id_a", "id_b").collect()
    clustered_ids = {i for r in pairs for i in (int(r.id_a), int(r.id_b))}
    clustered_texts = {
        r.extracted_text
        for r in exact.filter(F.col("doc_id").isin(list(clustered_ids)))
        .select("extracted_text").collect()
    }
    got = {(r.canon_url, r.text)
           for r in env_w["curated"].select("canon_url", "text").collect()}
    exp = {(r.canon_url, r.text)
           for r in env_p["curated"].select("canon_url", "text").collect()}
    free_got = {t for t in got if t[1] not in clustered_texts}
    free_exp = {t for t in exp if t[1] not in clustered_texts}
    assert free_got == free_exp and len(free_got) > 0
    assert len(got) == len(exp)


def test_checkpoint_resume_skips_stages(spark, curated_env):
    root, env, first_wall, s_pages = curated_env
    t0 = time.perf_counter()
    env2 = run_curation(spark, root, s_pages)
    resume_wall = time.perf_counter() - t0
    # all stages complete → the rerun only re-opens parquet (no recompute)
    assert resume_wall < max(first_wall * 0.35, 10.0)
    assert env2["curated"].count() == env["curated"].count()


def test_incremental_crawl_mode(spark, sf_dir, curated_env, tmp_path_factory):
    """Crawl-2 against crawl-1's archive: byte-identical re-fetches drop
    at exact dedup, near-dups of archived docs drop at near dedup (the
    ARCHIVE wins even when the new hash id is smaller), fresh docs and
    new-only dup-cluster minima survive, and archive_outputs emits the
    appendable (doc_id, text_hash, signature) rows."""
    from ferrobus_spark.operators.dedup import minhash_signatures
    from ferrobus_spark.plans.curation import run_curation

    _root, env1, _wall, _fn = curated_env
    crawl1 = env1["curated"].localCheckpoint()

    archive = {
        "text_hashes": crawl1.select(F.md5("text").alias("text_hash")).localCheckpoint(),
        "signatures": minhash_signatures(
            crawl1, id_col="doc_id", text_col="text"
        ).localCheckpoint(),
    }

    # crawl 2: re-fetches of 40 archived docs under NEW urls (fresh hash
    # ids — some smaller than the archived ids), near-dups of 20 more,
    # 30 fresh docs, and one intra-batch duplicate pair
    base = crawl1.limit(40).select(
        (F.pmod(F.xxhash64(F.col("doc_id"), F.lit(1)), F.lit(1000000)) + 5000000).alias("doc_id"),
        F.col("text"),
    )
    # long docs + a 2-char tweak so true shingle Jaccard stays ~0.99,
    # comfortably above the 0.9 near-dup threshold
    neardup = crawl1.filter(F.length("text") > 600).limit(20).select(
        (F.pmod(F.xxhash64(F.col("doc_id"), F.lit(2)), F.lit(1000000)) + 6000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" z")).alias("text"),
    )
    fresh = spark.range(30).select(
        (F.col("id") + 7000000).alias("doc_id"),
        F.concat(
            F.lit("entirely fresh crawl-two document number "),
            F.col("id").cast("string"),
            F.lit(" with plenty of genuinely novel words about topics "),
            F.sha2(F.col("id").cast("string"), 256),
        ).alias("text"),
    )
    intra = spark.createDataFrame(
        [(8000000, "intra batch duplicate content " * 10),
         (8000001, "intra batch duplicate content " * 10)],
        "doc_id long, text string",
    )
    crawl2_docs = base.unionByName(neardup).unionByName(fresh).unionByName(intra)

    def pages2(spark_, env):
        return crawl2_docs.select(
            "doc_id",
            F.concat(F.lit("https://crawl2.example.org/p/"),
                     F.col("doc_id").cast("string")).alias("url"),
            F.to_timestamp(F.lit("2024-02-01 00:00:00")).alias("warc_ts"),
            F.encode(
                F.concat(
                    F.lit("<html><head><title>Page "),
                    F.col("doc_id").cast("string"),
                    F.lit('</title></head><body><nav><a href="/page/1">next</a>'
                          "</nav><p>"),
                    F.replace(
                        F.replace(
                            F.replace(F.col("text"), F.lit("&"), F.lit("&amp;")),
                            F.lit("<"), F.lit("&lt;"),
                        ),
                        F.lit(">"), F.lit("&gt;"),
                    ),
                    F.lit("</p></body></html>"),
                ),
                "UTF-8",
            ).alias("html"),
        )

    root2 = str(tmp_path_factory.mktemp("curation_ckpt_crawl2"))
    env2 = run_curation(
        spark, root2, pages2, archive_fn=lambda s: archive
    )

    kept = {r.doc_id for r in env2["curated"].collect()}
    # all byte-identical re-fetches dropped at exact dedup
    assert env2["exact_dedup"].filter(
        (F.col("doc_id") >= 5000000) & (F.col("doc_id") < 6000000)
    ).count() == 0
    # near-dups of archived docs dropped (archive wins regardless of id)
    assert not any(6000000 <= d < 7000000 for d in kept)
    # fresh docs survive the whole funnel
    assert sum(7000000 <= d < 8000000 for d in kept) == 30
    # intra-batch pair keeps its min
    assert 8000000 in kept and 8000001 not in kept
    # archive outputs are appendable rows for every curated doc
    out = env2["archive_outputs"]
    assert out.count() == len(kept)
    assert set(out.columns) == {"doc_id", "text_hash", "signature"}


def _keyed_pages(spark, n=10):
    rows = [
        (f"https://site-{i}.example.org/page", f"2024-01-{i + 1:02d} 00:00:00")
        for i in range(n)
    ]
    return (
        spark.createDataFrame(rows, "url string, ts string")
        .withColumn("warc_ts", F.to_timestamp("ts"))
        .drop("ts")
    )


def test_assign_doc_ids_forced_collision(spark):
    """The 10^9-record hazard, forced at toy scale: a hash seam that maps
    all 10 distinct (url, warc_ts) keys into 3 primary ids. The assigner
    must (a) give every distinct key its own id — a collision can never
    fuse two docs, (b) keep the id for same-key duplicate fetch rows,
    (c) keep the PRIMARY id on each colliding bucket's minimum key (ids
    stay a pure function of the key multiset)."""
    from ferrobus_spark.plans.curation import assign_doc_ids

    df = _keyed_pages(spark, 10)
    df = df.unionByName(df.limit(1))  # duplicate fetch of one key

    def fake_hash(cols, salt):
        if salt == 0:
            return F.pmod(F.xxhash64(*cols), F.lit(3))
        return F.xxhash64(*cols, F.lit(salt))

    out = assign_doc_ids(df, _hash=fake_hash).localCheckpoint()
    keys = out.select("url", "warc_ts", "doc_id").distinct().toPandas()
    assert keys["doc_id"].nunique() == 10
    assert (
        out.groupBy("url", "warc_ts")
        .agg(F.countDistinct("doc_id").alias("n"))
        .filter("n > 1")
        .count()
        == 0
    )
    # min-key keeper: per primary bucket, the lexicographic-min key holds
    # the primary id and everyone else was rehashed away from it
    prim = (
        df.select("url", "warc_ts")
        .distinct()
        .withColumn("prim", F.pmod(F.xxhash64("url", "warc_ts"), F.lit(3)))
        .toPandas()
        .sort_values(["url", "warc_ts"])
    )
    keepers = prim.groupby("prim").first().reset_index()  # min url per bucket
    merged = keepers.merge(keys, on=["url", "warc_ts"])
    assert (merged["doc_id"] == merged["prim"]).all()
    # determinism: a rerun assigns identical ids
    out2 = assign_doc_ids(df, _hash=fake_hash)
    assert (
        out.select("url", "warc_ts", "doc_id")
        .exceptAll(out2.select("url", "warc_ts", "doc_id"))
        .count()
        == 0
    )


def test_assign_doc_ids_reserved_archive_ids(spark):
    """Crawl-N precondition: a new doc hashing onto an ARCHIVED id must be
    rehashed (incremental_minhash_pairs requires globally unique ids), and
    non-colliding keys keep their plain xxhash64 ids."""
    from ferrobus_spark.plans.curation import assign_doc_ids

    df = _keyed_pages(spark, 6)
    primary = df.withColumn("doc_id", F.xxhash64("url", "warc_ts"))
    reserved = primary.select(F.col("doc_id").alias("id")).limit(2).localCheckpoint()
    out = assign_doc_ids(df, reserved_ids=reserved).localCheckpoint()
    assert (
        out.join(reserved.withColumnRenamed("id", "doc_id"), "doc_id", "semi").count()
        == 0
    )
    assert out.select("doc_id").distinct().count() == 6
    # untouched keys keep the primary hash
    assert (
        out.join(primary.select("url", "warc_ts", "doc_id"), ["url", "warc_ts", "doc_id"], "semi").count()
        == 4
    )


def test_assign_doc_ids_refuses_to_fuse(spark):
    """A hash that can never separate two keys must raise, not silently
    merge them into one dedup-graph node."""
    import pytest as _pytest

    from ferrobus_spark.plans.curation import assign_doc_ids

    df = _keyed_pages(spark, 3)
    with _pytest.raises(RuntimeError, match="refusing to fuse"):
        assign_doc_ids(df, _hash=lambda cols, salt: F.lit(0).cast("long"), max_rounds=2)
