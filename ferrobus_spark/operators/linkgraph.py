"""Link-graph analyses over extracted page links (web-corpus ops).

Classic Common-Crawl-scale workloads over the ``extract_links`` output:

* :func:`resolve_links` — href → absolute URL + target host (relative
  hrefs resolve against the page's own host), pure column expressions;
* :func:`host_graph` — host-level edge aggregation (src_host, dst_host,
  n_links): the input to domain-authority / spam analyses. One shuffle
  on the host pair; map-side partial agg applies.
* :func:`pagerank` — damped PageRank by iterative join/agg dataflow with
  per-round parquet materialization (``plans/iterative.materialize`` —
  see that module for why NOT localCheckpoint). Dangling mass is
  redistributed uniformly each round (the standard formulation), so
  ranks sum to 1 every iteration. Fixed iteration count → deterministic
  output, verified against a NumPy power-iteration oracle in
  tests/test_linkgraph.py.

Scale notes: each PageRank round is contribs = edges ⋈ ranks (shuffle on
src) → groupBy(dst) sum (shuffle on dst). Pre-partitioning both edges
and ranks by the join key — or bucketing the edge table
(operators/bucketing.py) — removes the per-round re-shuffle of the edge
side; AQE handles hub-node skew (the hot-domain case) via skew-join
splitting, with explicit salting available in operators/skew.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ferrobus_spark.plans.iterative import cleanup, materialize


def resolve_links(links: DataFrame, pages: DataFrame) -> DataFrame:
    """(doc_id, href) + pages(doc_id, domain) → (doc_id, src_host, dst_host, url).

    Relative hrefs inherit the linking page's host; protocol-relative
    (``//host/…``) and other schemes are dropped, like a crawler's
    frontier filter would. ``dst_host`` is normalized exactly like
    ``functions.urls.url_host_col`` — lowercased, port stripped — so
    host-graph keys can't split by case or ``:8080`` on real HTML.
    """
    src = pages.select("doc_id", F.col("domain").alias("src_host"))
    out = links.join(F.broadcast(src), "doc_id")
    # scheme match is case-insensitive (real HTML carries HTTP:// etc.)
    low = F.lower(F.col("href"))
    absolute = low.startswith("https://") | low.startswith("http://")
    relative = F.col("href").startswith("/") & ~F.col("href").startswith("//")
    host_of = F.regexp_replace(
        F.lower(F.regexp_extract("href", r"^(?i)https?://([^/?#]+)", 1)), r":\d+$", ""
    )
    return (
        out.filter(absolute | relative)
        .select(
            "doc_id",
            "src_host",
            F.when(absolute, host_of).otherwise(F.col("src_host")).alias("dst_host"),
            F.when(absolute, F.col("href"))
            .otherwise(F.concat(F.lit("https://"), F.col("src_host"), F.col("href")))
            .alias("url"),
        )
    )


def host_graph(resolved: DataFrame) -> DataFrame:
    """(src_host, dst_host, n_links) host-level edges."""
    return (
        resolved.groupBy("src_host", "dst_host")
        .agg(F.count("*").alias("n_links"))
    )


def pagerank(
    edges: DataFrame,
    n_iter: int = 10,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """→ (node, rank) after ``n_iter`` damped power iterations.

    ``edges``: directed (src, dst) pairs; parallel edges count as weight.
    rank_{t+1}(v) = (1-d)/N + d * (Σ_{u→v} rank_t(u)/outdeg(u) + dangling/N).
    """
    shared: list[str] = []  # dirs needed for the whole loop (edges/nodes/outdeg)
    rounds: list[str] = []  # superseded per-round rank dirs
    # edges are scanned EVERY round: materialize once so the upstream plan
    # (e.g. HTML parse → resolve_links) doesn't re-execute n_iter times
    e = materialize(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")), shared
    )
    nodes = materialize(
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct(),
        shared,
    )
    n = nodes.count()
    outdeg = materialize(e.groupBy("src").agg(F.count("*").alias("outdeg")), shared)

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(n_iter):
        contribs = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("outdeg")).alias("contrib"),
            )
            .groupBy("node")
            .agg(F.sum("contrib").alias("in_mass"))
        )
        # dangling nodes (no out-edges) leak their mass; redistribute
        dangling = (
            ranks.join(outdeg.withColumnRenamed("src", "node"), "node", "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("m"))
            .collect()[0]["m"]
        )
        base = (1.0 - damping) / n + damping * dangling / n
        prev_rounds, rounds = rounds, []
        ranks = materialize(
            nodes.join(contribs, "node", "left").select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("in_mass"), F.lit(0.0))
                ).alias("rank"),
            ),
            rounds,
        )
        # the write above fully consumed the previous round's parquet —
        # delete it now so disk stays O(1) across iterations
        cleanup(prev_rounds)
    cleanup(shared)
    # the final round's directory stays: it backs the returned DataFrame
    # (and doubles as the plans/checkpoint.py resume artifact)
    return ranks
