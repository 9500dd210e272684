"""HTML → text extraction — the first transform a web-crawl corpus
pipeline runs. All JVM-side codegen column expressions (regexp_replace
/ replace chains), zero Python, engine-portable patterns (no
backreferences, no lookbehind — the same RE2-compatible discipline as
functions/pii.py, so a DuckDB oracle runs the identical patterns).

Linearity note: the script/style/comment patterns use lazy ``.*?``
spans under ``(?s)`` — linear for well-formed payloads; a missing
closing tag degrades to O(n·starts) scanning in a backtracking engine.
Crawl payloads are size-bounded upstream (maxPartitionBytes bounds the
batch either way), and RE2 engines (DuckDB) stay linear regardless.

Scope: tag stripping + the HTML4 core entities — the 99% path for
text mining. It is NOT a spec HTML5 parser (no tree, no CDATA
subtleties); documents needing real DOM semantics should route through
a parser behind mapInPandas like the media codecs do.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: (pattern, replacement) applied in order; all RE2-compatible
_STRIP_PATTERNS: list[tuple[str, str]] = [
    (r"(?is)<script\b[^>]*>.*?</script>", " "),
    (r"(?is)<style\b[^>]*>.*?</style>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"<[^>]+>", " "),
]

#: core entity decodes, order matters: &amp; LAST so "&amp;lt;" decodes
#: to the literal "&lt;" (one level), not "<"
_ENTITIES: list[tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def html_to_text(col: Column | str) -> Column:
    """Visible text of an HTML payload: script/style/comment blocks
    removed, every tag replaced by a space, core entities decoded,
    whitespace collapsed, trimmed."""
    out = F.col(col) if isinstance(col, str) else col
    for pat, rep in _STRIP_PATTERNS:
        out = F.regexp_replace(out, pat, rep)
    for ent, ch in _ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def html_title(col: Column | str) -> Column:
    """Contents of the first <title> element ('' when absent),
    whitespace-collapsed."""
    c = F.col(col) if isinstance(col, str) else col
    raw = F.regexp_extract(c, r"(?is)<title\b[^>]*>(.*?)</title>", 1)
    return F.trim(F.regexp_replace(raw, r"\s+", " "))


def strip_tags(col: Column | str) -> Column:
    """Tags → spaces only (keeps script/style text and raw entities);
    the cheap variant when payloads are known tag-light."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(
        F.regexp_replace(F.regexp_replace(c, r"<[^>]+>", " "), r"\s+", " ")
    )
