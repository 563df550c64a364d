"""HTML parsing operators: extraction invariant, titles, links."""

import pytest

from ferrobus_spark.operators.html_text import extract_links, parse_html
from ferrobus_spark.sources.pages import pages_table


@pytest.fixture(scope="module")
def parsed(spark, sf_dir):
    return parse_html(pages_table(spark, sf_dir)).localCheckpoint()


def test_extracted_text_byte_identical(spark, sf_dir, parsed):
    """The graft per-row invariant: html -> text is lossless."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    joined = parsed.join(docs, "doc_id")
    n = joined.count()
    assert n == docs.count()
    assert joined.filter("extracted_text <> text").count() == 0


def test_titles_and_links(parsed):
    rows = parsed.orderBy("doc_id").limit(3).collect()
    for r in rows:
        assert r.title == f"Page {r.doc_id}"
        exp = ([f"/page/{r.doc_id - 1}"] if r.doc_id > 0 else []) + [f"/page/{r.doc_id + 1}"]
        got = list(r.links)
        assert got[:-1] == exp  # relative prev/next
        assert got[-1].startswith("https://")  # cross-domain ref


def test_extract_links_shape(spark, sf_dir):
    links = extract_links(pages_table(spark, sf_dir))
    assert links.columns == ["doc_id", "link_pos", "href"]
    bad = links.filter(
        "href NOT LIKE '/page/%' AND href NOT LIKE 'https://%'"
    ).count()
    assert bad == 0


def test_parser_handles_unclosed_head(spark):
    """Valid HTML5 may omit </head>; the skip stack must not swallow the
    body. Also: an unmatched </script> end tag must be a no-op."""
    df = spark.createDataFrame(
        [
            (1, bytearray(b"<html><head><title>T</title><meta charset='utf-8'>"
                          b"<body>BODY TEXT</body></html>")),
            (2, bytearray(b"<html><body></script>AFTER STRAY END</body></html>")),
            (3, bytearray(b"<head><style>a{}</style><body><nav>m</nav>OK")),
        ],
        "doc_id long, html binary",
    )
    rows = {r.doc_id: r for r in parse_html(df).collect()}
    assert rows[1].extracted_text == "BODY TEXT"
    assert rows[1].title == "T"
    assert rows[2].extracted_text == "AFTER STRAY END"
    assert rows[3].extracted_text == "OK"


def test_parser_skips_script_style_nav(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"<html><head><title>T</title><style>x{}</style></head>"
                       b"<body><script>var a;</script><nav><a href='/x'>skip</a></nav>"
                       b"BODY &amp; <b>MORE</b></body></html>"))],
        "doc_id long, html binary",
    )
    r = parse_html(df).collect()[0]
    assert r.extracted_text == "BODY & MORE"
    assert r.title == "T"
    assert list(r.links) == ["/x"]


def test_parser_survives_tag_soup(spark):
    """Hostile-input fuzz: random malformed tag soup must parse without
    raising, and content outside skip tags must never be silently lost
    (the skip stack has to re-balance whatever the nesting)."""
    import random

    rng = random.Random(20240817)
    # Dangling <script>/<style>/<title>/<!-- openers legitimately swallow
    # everything after them (HTML5 raw-text states), so skip-context
    # units appear balanced; everything else may dangle freely —
    # unmatched END tags and a bare <head> (implied-closed by <body>)
    # are exactly the desync hazards the skip stack must absorb.
    frags = [
        "<script>var a;</script>", "<style>x{}</style>", "<nav>menu</nav>",
        "<head><title>T</title></head>", "<head>",
        "</script>", "</style>", "</nav>", "</head>", "</body>", "</html>",
        "<b>", "</i>", "<a href='/x'>", "</a>", "< notatag",
        "<!doctype html>", "<!-- c -->", "&amp;", "&#65;", "TEXT",
        "plain words ", "<img src=x>",
    ]
    docs = []
    for i in range(200):
        soup = "".join(rng.choice(frags) for _ in range(rng.randint(1, 40)))
        # a sentinel OUTSIDE any skip context must always survive
        docs.append((i, bytearray((soup + "<body>SENTINEL" + str(i)).encode())))
    df = spark.createDataFrame(docs, "doc_id long, html binary")
    rows = parse_html(df).collect()
    assert len(rows) == 200
    for r in rows:
        assert f"SENTINEL{r.doc_id}" in r.extracted_text, r.doc_id
