"""URL canonicalization unit cases (scheme-aware ports, query sorting)."""

import pytest
from pyspark.sql import functions as F

from ferrobus_spark.functions.urls import canonical_url_col, url_host_col

CASES = [
    # https default port stripped
    ("HTTPS://Example.COM:443/Page/1#frag", "https://example.com/Page/1"),
    # http default port stripped
    ("http://example.com:80/a", "http://example.com/a"),
    # :443 on http is NOT default — kept
    ("HTTP://Example.com:443/a", "http://example.com:443/a"),
    # :80 on https is NOT default — kept
    ("https://example.com:80/a", "https://example.com:80/a"),
    # non-default port kept
    ("https://example.com:8080/a", "https://example.com:8080/a"),
    # query params byte-sorted ('A' < 'b' bytewise)
    ("https://h/p?b=2&A=1&A=0", "https://h/p?A=0&A=1&b=2"),
    # bare '?' dropped; fragment dropped
    ("https://h/p?#Section", "https://h/p"),
    # trailing slash collapsed on non-root path (no query)
    ("https://h/p/", "https://h/p"),
    # trailing slash kept when a query follows
    ("https://h/p/?b=1&a=2", "https://h/p/?a=2&b=1"),
    # path case preserved
    ("HTTPS://H/PaTh", "https://h/PaTh"),
]


@pytest.mark.parametrize("raw,want", CASES)
def test_canonical_url(spark, raw, want):
    got = (
        spark.createDataFrame([(raw,)], "u string")
        .select(canonical_url_col("u").alias("c"))
        .collect()[0]
        .c
    )
    assert got == want, raw


def test_url_host(spark):
    rows = spark.createDataFrame(
        [("HTTPS://Example.COM:8080/x",), ("http://h:80/",), ("https://plain/x",)],
        "u string",
    ).select(url_host_col("u").alias("h")).collect()
    assert [r.h for r in rows] == ["example.com", "h", "plain"]


def test_canonical_matches_duckdb_oracle_expectation(spark):
    """The registry oracle states canon literally; spot-check the Spark
    expression against the same literal expectation for each doc_id
    residue class the messy generator produces."""
    import duckdb

    from ferrobus_spark.registry import queries, oracle_sql

    # build a tiny documents frame covering the residue classes
    ids = [0, 1, 2, 3, 5, 6, 9, 10, 15, 30]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, 'x')" for i in ids)
        + ") AS t(doc_id, text)"
    )
    want = {
        int(r[0]): (r[1], r[2])
        for r in con.execute(
            oracle_sql()["url_canonicalize"] + " ORDER BY doc_id"
        ).fetchall()
    }
    import pandas as pd

    docs = spark.createDataFrame(pd.DataFrame({"doc_id": ids, "text": "x"}))
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        docs.write.mode("overwrite").parquet(f"{d}/documents.parquet")
        got = {
            int(r.doc_id): (r.canon_url, r.host)
            for r in queries()["url_canonicalize"](spark, d).collect()
        }
    assert got == want


def test_canonicalization_idempotent_fuzz(spark):
    """canon(canon(u)) == canon(u) over a seeded corpus of URL shapes —
    a canonicalizer that isn't idempotent corrupts dedup keys on
    re-crawled (already-canonical) URLs."""
    import random

    rng = random.Random(20240817)
    schemes = ["http", "HTTP", "https", "HTTPS"]
    hosts = ["Example.COM", "a.b.c", "X--y.example.ORG", "h"]
    ports = ["", ":80", ":443", ":8080"]
    paths = ["", "/", "/A/b", "/A/b/", "/p//q", "/%7Euser"]
    queries = ["", "?", "?b=2&A=1", "?z&y&x", "?a=1&a=0"]
    frags = ["", "#f", "#A/b?c"]
    urls = [
        rng.choice(schemes) + "://" + rng.choice(hosts) + rng.choice(ports)
        + rng.choice(paths) + rng.choice(queries) + rng.choice(frags)
        for _ in range(300)
    ]
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    once = canonical_url_col("u").alias("c1")
    out = df.select("u", once).select(
        "u", "c1", canonical_url_col(F.col("c1")).alias("c2")
    ).collect()
    bad = [(r.u, r.c1, r.c2) for r in out if r.c1 != r.c2]
    assert not bad, bad[:5]
