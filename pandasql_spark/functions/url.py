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

Scope: syntactic normalization of absolute http(s) URLs, INCLUDING
RFC 3986 §6.2.2 percent-encoding normalization — decode escapes of
UNRESERVED characters (``%41``→``A``, ``%7E``→``~``) and uppercase
the hex digits of every remaining escape (``%2f``→``%2F``). Both are
table-free (``unhex``+``decode`` are JVM built-ins) and safe by
construction: no unreserved character is a delimiter, so decoding can
never change the URL's structure, and ``%25`` (the escape for ``%``
itself) is reserved so nothing is ever double-decoded. Full generic
percent-decoding and IDN remain non-goals (they change identity
semantics); a URL without a ``scheme://host`` prefix passes through
with only trim + fragment strip + percent normalization.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: query parameters that never affect content identity
TRACKING_PARAM_PATTERN = r"^(utm_[^=]*|gclid|fbclid|msclkid|ref)(=.*)?$"

_SCHEME_HOST = r"^([a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*)"

#: uppercase hex codes of RFC 3986 unreserved characters:
#: 0-9 (30-39), A-Z (41-5A), a-z (61-7A), '-' (2D) '.' (2E) '_' (5F) '~' (7E)
_UNRESERVED_HEX = r"^(3[0-9]|4[1-9A-F]|5[0-9A]|6[1-9A-F]|7[0-9A]|2[DE]|5F|7E)$"


def _pct_normalize(c: Column) -> Column:
    """RFC 3986 §6.2.2: decode percent-escapes of unreserved chars,
    uppercase the hex of the rest. Split on '%': piece 0 is literal;
    each later piece starts where an escape would. A malformed escape
    (non-hex or truncated) passes through byte-identical."""
    parts = F.split(c, "%", -1)

    def _fix(p: Column, i: Column) -> Column:
        h2 = F.upper(p.substr(F.lit(1), F.lit(2)))
        rest = p.substr(F.lit(3), F.length(p))
        return (
            F.when(i == 0, p)
            .when(
                h2.rlike(_UNRESERVED_HEX),
                F.concat(F.decode(F.unhex(h2), "UTF-8"), rest),
            )
            .when(
                h2.rlike(r"^[0-9A-F]{2}$"),
                F.concat(F.lit("%"), h2, rest),
            )
            .otherwise(F.concat(F.lit("%"), p))
        )

    return F.array_join(F.transform(parts, _fix), "")


def url_host(col: Column | str) -> Column:
    """Lowercased host ('' for non-absolute URLs), port excluded.
    Percent-normalized first so escaped host bytes (``ex%61mple.com``)
    key identically to their decoded form — hosts are the per-domain
    accounting / split key, so they must share url_normalize's
    identity semantics."""
    c = _pct_normalize(F.trim(F.col(col) if isinstance(col, str) else col))
    # optional userinfo@ is skipped non-capturing: the host of
    # http://user:pw@site.com/x is site.com, not user
    return F.lower(
        F.regexp_extract(
            c, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://(?:[^/?#@]*@)?([^/?#:@]+)", 1
        )
    )


def url_normalize(col: Column | str) -> Column:
    """Canonical form: trim → drop fragment → percent-normalize
    (decode unreserved escapes, uppercase remaining escape hex) →
    lowercase scheme://host → drop default :80/:443 → empty path
    becomes '/' → tracking params dropped, remaining query params
    SORTED; '?' dropped when no params survive. Percent normalization
    runs BEFORE component extraction so escaped scheme/host bytes
    (``htt%70://``) and escaped tracking-param names
    (``%75tm_source``) still canonicalize."""
    u = F.trim(F.col(col) if isinstance(col, str) else col)
    u = F.trim(F.regexp_replace(u, r"#.*", ""))
    u = _pct_normalize(u)
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
