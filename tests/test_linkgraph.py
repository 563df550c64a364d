"""Link-graph ops: host edges vs manual aggregation, PageRank vs NumPy."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ferrobus_spark.operators.html_text import extract_links
from ferrobus_spark.operators.linkgraph import host_graph, pagerank, resolve_links
from ferrobus_spark.sources.pages import pages_table


@pytest.fixture(scope="module")
def resolved(spark, sf_dir):
    pages = pages_table(spark, sf_dir)
    return resolve_links(extract_links(pages), pages).localCheckpoint()


def test_relative_links_resolve_to_own_host(resolved):
    rel = resolved.filter(F.col("url").contains("/page/")).count()
    assert rel == resolved.count()
    mismatch = resolved.filter(
        ~F.col("url").startswith(F.concat(F.lit("https://"), F.col("dst_host")))
    ).count()
    assert mismatch == 0


def test_resolve_links_normalizes_and_filters(spark):
    """Protocol-relative hrefs drop; absolute hosts lowercase + port-strip."""
    links = spark.createDataFrame(
        [
            (1, 0, "//cdn.example.com/x"),          # protocol-relative: drop
            (1, 1, "https://Other.EXAMPLE.com:8443/p"),  # normalize host
            (1, 2, "/rel/path"),                     # relative: own host
            (1, 3, "mailto:x@example.com"),          # other scheme: drop
            (1, 4, "http://plain.org/q"),
        ],
        "doc_id long, link_pos int, href string",
    )
    pages = spark.createDataFrame([(1, "src.example.com")], "doc_id long, domain string")
    out = {r.url: r for r in resolve_links(links, pages).collect()}
    assert set(out) == {
        "https://Other.EXAMPLE.com:8443/p",
        "https://src.example.com/rel/path",
        "http://plain.org/q",
    }
    assert out["https://Other.EXAMPLE.com:8443/p"].dst_host == "other.example.com"
    assert out["https://src.example.com/rel/path"].dst_host == "src.example.com"
    assert out["http://plain.org/q"].dst_host == "plain.org"


def test_resolve_links_uppercase_scheme_kept(spark):
    """Mixed-case schemes (HTTP://, Https://) are absolute links too."""
    links = spark.createDataFrame(
        [
            (1, 0, "HTTP://Shouty.ORG/a"),
            (1, 1, "Https://Mixed.Example.com:443/b"),
        ],
        "doc_id long, link_pos int, href string",
    )
    pages = spark.createDataFrame([(1, "src.example.com")], "doc_id long, domain string")
    out = {r.url: r.dst_host for r in resolve_links(links, pages).collect()}
    assert out == {
        "HTTP://Shouty.ORG/a": "shouty.org",
        "Https://Mixed.Example.com:443/b": "mixed.example.com",
    }


def test_host_graph_counts(resolved):
    hg = {(r.src_host, r.dst_host): r.n_links for r in host_graph(resolved).collect()}
    manual = (
        resolved.groupBy("src_host", "dst_host").count().collect()
    )
    assert hg == {(r.src_host, r.dst_host): r["count"] for r in manual}
    # cross-domain refs make it non-diagonal
    assert any(s != d for s, d in hg)


def test_pagerank_matches_numpy(spark, resolved):
    edges = resolved.select(F.col("src_host").alias("src"), F.col("dst_host").alias("dst"))
    got = {r.node: r.rank for r in pagerank(edges, n_iter=8).collect()}

    pdf = edges.toPandas()
    hosts = sorted(set(pdf["src"]) | set(pdf["dst"]))
    idx = {h: i for i, h in enumerate(hosts)}
    n = len(hosts)
    W = np.zeros((n, n))
    for s, d in zip(pdf["src"], pdf["dst"]):
        W[idx[s], idx[d]] += 1
    out = W.sum(axis=1)
    d = 0.85
    r = np.full(n, 1.0 / n)
    for _ in range(8):
        dangling = r[out == 0].sum()
        base = (1 - d) / n + d * dangling / n
        contrib = np.zeros(n)
        nz = out > 0
        contrib = (W[nz] / out[nz, None]).T @ r[nz]
        r = base + d * contrib
    assert abs(sum(got.values()) - 1.0) < 1e-9  # mass conserved
    for h in hosts:
        assert abs(got[h] - r[idx[h]]) < 1e-9, h


def test_pagerank_salted_equals_plain(spark, resolved):
    """salt_hot=True (the production host_pagerank configuration) is
    value-identical to the plain plan — salting only changes physical
    distribution. Skewed input: one hub host owns ~70% of the edges."""
    edges = resolved.select(
        F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
    )
    hub = spark.range(400).select(
        F.lit("megahub.example.com").alias("src"),
        F.concat(F.lit("t"), (F.col("id") % 37).cast("string")).alias("dst"),
    )
    skewed = edges.unionByName(hub)
    plain = {r.node: r.rank for r in pagerank(skewed, n_iter=6).collect()}
    salted = {
        r.node: r.rank
        for r in pagerank(
            skewed, n_iter=6, salt_hot=True, hot_threshold=0.05
        ).collect()
    }
    assert plain.keys() == salted.keys()
    # value-identical up to partial-agg summation ORDER: salting changes
    # which rows meet in which partial sum, so the per-round Σcontrib can
    # land 1 ulp apart (~1e-18 here). The driver gate's nano fixed point
    # sits 9 orders above this; assert at 1e-12 relative — far below any
    # semantic difference, far above ulp noise accumulation over rounds.
    for k in plain:
        assert plain[k] == pytest.approx(salted[k], rel=1e-12), k
