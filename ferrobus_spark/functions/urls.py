"""URL canonicalization — pure column expressions (JVM-side, codegen).

The dedup-by-URL step of a crawl pipeline: scheme/host case-folding,
scheme-aware default-port stripping, fragment removal, empty-query
removal, query-parameter sorting, and trailing-slash normalization.
All regexp/string built-ins — no UDFs — so the canonicalization runs
inside whole-stage codegen and pushes through joins/aggregations like
any column expression.

Rules (in application order):
1. drop ``#fragment``;
2. lowercase the ``scheme://host[:port]`` prefix (path/query keep case);
3. strip the default port for the scheme only — ``:80`` iff http,
   ``:443`` iff https (``http://h:443`` keeps its NON-default port);
4. sort ``?``-query parameters byte-wise on the raw ``&``-separated
   segments (``?b=2&A=1`` → ``?A=1&b=2``); a bare ``?`` is dropped;
5. collapse one trailing ``/`` on non-root paths without a query.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_HOST = r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)"


def canonical_url_col(url) -> Column:
    url = F.col(url) if isinstance(url, str) else url
    # 1. strip fragment
    u = F.regexp_replace(url, r"#.*$", "")
    # 2. lowercase the scheme://host prefix (path/query stay case-exact)
    head = F.lower(F.regexp_extract(u, _SCHEME_HOST, 1))
    tail = F.regexp_replace(u, _SCHEME_HOST, "")
    # 3. default port, scheme-aware: :80 iff http, :443 iff https
    head = F.when(
        head.startswith("http://"), F.regexp_replace(head, r":80$", "")
    ).otherwise(head)
    head = F.when(
        head.startswith("https://"), F.regexp_replace(head, r":443$", "")
    ).otherwise(head)
    # 4. sort query params byte-wise; empty query ('?' or '?#frag') drops
    path = F.regexp_extract(tail, r"^([^?]*)", 1)
    qs = F.regexp_extract(tail, r"\?(.*)$", 1)
    tail = F.when(qs == "", path).otherwise(
        F.concat(path, F.lit("?"), F.array_join(F.array_sort(F.split(qs, "&")), "&"))
    )
    u = F.concat(head, tail)
    # 5. trailing slash on non-root paths (no query present)
    return F.regexp_replace(u, r"(://[^/?#]+/[^?#]*?)/$", r"$1")


def url_host_col(url) -> Column:
    """Lower-cased host (no port) — the host-graph / per-domain agg key."""
    url = F.col(url) if isinstance(url, str) else url
    host = F.lower(F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    return F.regexp_replace(host, r":\d+$", "")
