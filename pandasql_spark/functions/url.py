"""URL normalization — canonical keys for crawl dedup and per-domain
accounting. All JVM-side codegen/interpreted column expressions (no
Python): a URL and its cosmetic variants (case in scheme/host, default
ports, fragments, tracking parameters, query-parameter order) map to
ONE canonical string, so exact dedup / per-source caps / heavy-hitter
domains key on identity, not formatting accidents.

Engine-portable by construction: regexp_extract/replace + split +
array filter/sort primitives that DuckDB mirrors 1:1 (the q93 oracle
re-implements the same chain), same RE2-safe pattern discipline as
functions/pii.py.

Scope: syntactic normalization of absolute http(s) URLs. Percent-
encoding canonicalization and IDN are NOT attempted (they change
identity semantics and need tables, not regexes); a URL without an
``scheme://host`` prefix passes through with only trim + fragment
strip.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: query parameters that never affect content identity
TRACKING_PARAM_PATTERN = r"^(utm_[^=]*|gclid|fbclid|msclkid|ref)(=.*)?$"

_SCHEME_HOST = r"^([a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*)"


def url_host(col: Column | str) -> Column:
    """Lowercased host ('' for non-absolute URLs), port excluded."""
    c = F.trim(F.col(col) if isinstance(col, str) else col)
    # optional userinfo@ is skipped non-capturing: the host of
    # http://user:pw@site.com/x is site.com, not user
    return F.lower(
        F.regexp_extract(
            c, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://(?:[^/?#@]*@)?([^/?#:@]+)", 1
        )
    )


def url_normalize(col: Column | str) -> Column:
    """Canonical form: trim → drop fragment → lowercase scheme://host
    → drop default :80/:443 → empty path becomes '/' → tracking params
    dropped, remaining query params SORTED; '?' dropped when no params
    survive."""
    u = F.trim(F.col(col) if isinstance(col, str) else col)
    u = F.trim(F.regexp_replace(u, r"#.*", ""))
    scheme_host = F.regexp_extract(u, _SCHEME_HOST, 1)
    rest = F.substring(u, F.length(scheme_host) + 1, F.length(u))
    # lowercase ONLY scheme and host:port — userinfo is case-sensitive
    # credential material and must pass through untouched; and the
    # default-port strip must still fire when userinfo carries a ':'
    scheme = F.lower(
        F.regexp_extract(scheme_host, r"^([a-zA-Z][a-zA-Z0-9+.\-]*)://", 1)
    )
    userinfo = F.regexp_extract(scheme_host, r"^[^:]+://([^/?#@]*@)", 1)
    hostport = F.lower(
        F.regexp_extract(scheme_host, r"^[^:]+://(?:[^/?#@]*@)?([^/?#]*)$", 1)
    )
    hostport = (
        F.when(
            scheme == "http",
            F.regexp_replace(hostport, r"^([^:]+):80$", "$1"),
        )
        .when(
            scheme == "https",
            F.regexp_replace(hostport, r"^([^:]+):443$", "$1"),
        )
        .otherwise(hostport)
    )
    sh = F.concat(scheme, F.lit("://"), userinfo, hostport)
    path = F.regexp_replace(rest, r"\?.*$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_PATTERN),
        )
    )
    tail = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
    ).otherwise(F.lit(""))
    return F.when(scheme_host == "", u).otherwise(F.concat(sh, path, tail))
