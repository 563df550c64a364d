"""URL canonicalization — pure column expressions (JVM-side, codegen).

The dedup-by-URL step of a crawl pipeline: scheme/host case-folding,
default-port stripping, fragment removal, empty-query removal, and
trailing-slash normalization. All regexp/string built-ins — no UDFs —
so the canonicalization runs inside whole-stage codegen and pushes
through joins/aggregations like any column expression.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_HOST = r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)"


def canonical_url_col(url) -> Column:
    """Canonical form: lower(scheme+host), drop :80/:443, #fragment and
    bare '?', collapse a trailing '/' on non-root paths."""
    url = F.col(url) if isinstance(url, str) else url
    # 1. strip fragment
    u = F.regexp_replace(url, r"#.*$", "")
    # 2. strip empty query
    u = F.regexp_replace(u, r"\?$", "")
    # 3. lowercase the scheme://host prefix (path/query stay case-exact)
    head = F.lower(F.regexp_extract(u, _SCHEME_HOST, 1))
    tail = F.regexp_replace(u, _SCHEME_HOST, "")
    # 4. default ports off the (already lowered) host
    head = F.regexp_replace(head, r":(80|443)$", "")
    u = F.concat(head, tail)
    # 5. trailing slash on non-root paths
    return F.regexp_replace(u, r"(://[^/?#]+/[^?#]*?)/$", r"$1")


def url_host_col(url) -> Column:
    """Lower-cased host (no port) — the host-graph / per-domain agg key."""
    url = F.col(url) if isinstance(url, str) else url
    host = F.lower(F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    return F.regexp_replace(host, r":\d+$", "")
