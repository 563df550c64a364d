"""Synthesize the Common-Crawl-style pages table (graft input contract).

``BASELINE.json input_hint``: columns
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.
Derived deterministically from the driver's ``documents`` parquet — no
external data. ``text`` is a byte-identical pass-through of the source
document text (the per-row invariant; verified via sha2 hash join).
Adds deterministic (lon, lat) per url with hot-cell/hot-domain skew
(see :mod:`ferrobus_spark.functions.geo`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ferrobus_spark.functions.geo import lonlat_cols

#: Zipf-ish domain pool — weights fall off harmonically via modulo bias.
_DOMAINS = [
    "example.com", "news.example.org", "blog.example.net", "shop.example.io",
    "wiki.example.edu", "forum.example.co", "docs.example.dev", "mail.example.app",
]


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def pages_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → pages(url, warc_ts, html, text, lang, lon, lat, domain)."""
    docs = load_documents(spark, sf_dir)
    h = (F.col("doc_id") * 2654435761) % 4294967296
    # harmonic-ish domain skew: doc h%64 buckets map unevenly onto 8 domains
    bucket = (h % 64).cast("int")
    domain = (
        F.when(bucket < 32, F.lit(_DOMAINS[0]))
        .when(bucket < 44, F.lit(_DOMAINS[1]))
        .when(bucket < 52, F.lit(_DOMAINS[2]))
        .when(bucket < 57, F.lit(_DOMAINS[3]))
        .when(bucket < 60, F.lit(_DOMAINS[4]))
        .when(bucket < 62, F.lit(_DOMAINS[5]))
        .when(bucket < 63, F.lit(_DOMAINS[6]))
        .otherwise(F.lit(_DOMAINS[7]))
    )
    lon, lat = lonlat_cols("doc_id")
    return docs.select(
        F.concat(F.lit("https://"), domain, F.lit("/page/"), F.col("doc_id")).alias("url"),
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(secs=(h % 2592000).cast("double"))
        ).alias("warc_ts"),
        F.encode(
            F.concat(
                F.lit("<html><head><title>Page "),
                F.col("doc_id").cast("string"),
                F.lit("</title></head><body><nav>"),
                # deterministic link structure: prev (when >0) + next page
                F.when(
                    F.col("doc_id") > 0,
                    F.concat(
                        F.lit('<a href="/page/'),
                        (F.col("doc_id") - 1).cast("string"),
                        F.lit('">prev</a>'),
                    ),
                ).otherwise(F.lit("")),
                F.lit('<a href="/page/'),
                (F.col("doc_id") + 1).cast("string"),
                F.lit('">next</a></nav><p>'),
                # entity-escape so extraction is byte-identical even if the
                # corpus ever grows markup characters
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
        F.col("text"),
        F.col("lang"),
        lon.alias("lon"),
        lat.alias("lat"),
        domain.alias("domain"),
        F.col("doc_id"),
    )
