"""HTML processing over web-page corpora (training-data pipeline ops).

The pages table carries raw ``html: binary`` (Common-Crawl shape,
BASELINE.json input_hint); these operators turn it into training-ready
columns with pure-stdlib parsing (no bs4/lxml in the container), always
Arrow-batched — the per-document Python is the parser itself, never
Spark row plumbing.

* :func:`parse_html` — one pass per page: visible body text (script/
  style/nav/head excluded), ``<title>``, and outgoing hrefs.
* :func:`extract_links` — (id, href) exploded link edges, the input to
  host-graph / PageRank-style corpus analyses.

Invariant: for pages synthesized by ``sources.pages.pages_table`` the
extracted body text is BYTE-IDENTICAL to the source document text (the
graft's per-row invariant) — enforced by the oracle-checked
``html_extract_text`` driver query and pytest.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SKIP_TAGS = {"script", "style", "nav", "noscript", "template", "head"}
_VOID = {"br", "hr", "img", "meta", "link", "input", "area", "base", "col",
         "embed", "source", "track", "wbr"}


class _PageParser(HTMLParser):
    """Single-pass text + title + link extractor.

    Skip-tag state is a STACK of tag names, not a bare counter:
    html.parser emits no implied end tags, so valid HTML5 that omits
    ``</head>`` (common in minified pages) would leave a counter
    permanently >0 and silently drop the whole body. ``<body>`` (or
    ``<html>``'s re-open) closes any open ``head`` frame, and an end tag
    with no matching open frame is ignored instead of desyncing.
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self.title_parts: list[str] = []
        self.links: list[str] = []
        self._skip_stack: list[str] = []
        self._in_title = False

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            for k, v in attrs:
                if k == "href" and v:
                    self.links.append(v)
        if tag == "body" and "head" in self._skip_stack:
            # HTML5 implies </head> before <body>
            self._skip_stack = [t for t in self._skip_stack if t != "head"]
        if tag == "title":
            self._in_title = True
        elif tag in _SKIP_TAGS and tag not in _VOID:
            self._skip_stack.append(tag)

    def handle_endtag(self, tag):
        if tag == "title":
            self._in_title = False
        elif tag in _SKIP_TAGS and tag in self._skip_stack:
            # pop the nearest matching frame; unmatched end tags are no-ops
            for i in range(len(self._skip_stack) - 1, -1, -1):
                if self._skip_stack[i] == tag:
                    del self._skip_stack[i]
                    break

    def handle_data(self, data):
        if self._in_title:
            self.title_parts.append(data)
        elif not self._skip_stack:
            self.parts.append(data)


def _parse_one(raw) -> tuple[str, str, list[str]]:
    if raw is None:
        return "", "", []
    if isinstance(raw, (bytes, bytearray)):
        raw = bytes(raw).decode("utf-8", "replace")
    p = _PageParser()
    p.feed(raw)
    p.close()
    return "".join(p.parts), "".join(p.title_parts), p.links


_PARSED_EXTRA = [
    T.StructField("extracted_text", T.StringType()),
    T.StructField("title", T.StringType()),
    T.StructField("links", T.ArrayType(T.StringType())),
]


def parse_html(
    df: DataFrame, html_col: str = "html", id_cols: tuple[str, ...] = ("doc_id",)
) -> DataFrame:
    """→ (id_cols..., extracted_text, title, links) — one parse per page."""
    schema = T.StructType(
        [df.schema[c] for c in id_cols] + _PARSED_EXTRA
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [_parse_one(h) for h in pdf[html_col]]
            out = pdf[list(id_cols)].copy()
            out["extracted_text"] = [t for t, _ti, _l in parsed]
            out["title"] = [ti for _t, ti, _l in parsed]
            out["links"] = [l for _t, _ti, l in parsed]
            yield out

    from ferrobus_spark.plans.partitioning import spread_for_kernel

    return spread_for_kernel(df.select(*id_cols, html_col)).mapInPandas(kernel, schema)


def extract_links(
    df: DataFrame, html_col: str = "html", id_cols: tuple[str, ...] = ("doc_id",)
) -> DataFrame:
    """(id_cols..., href) link edges, exploded and ordered per page."""
    parsed = parse_html(df, html_col, id_cols)
    return parsed.select(
        *id_cols, F.posexplode("links").alias("link_pos", "href")
    )
