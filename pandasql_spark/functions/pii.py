"""PII detection and redaction — a standard pretraining-corpus
hygiene pass (emails, phone numbers, IPv4 addresses), per e.g. the
Dolma / BigScience ROOTS pipelines.

All column expressions are JVM-side (``regexp_count`` /
``regexp_replace`` inside whole-stage codegen) — a corpus-wide redact
is a zero-shuffle projection, the 100 TB plan by construction.

The patterns deliberately use only syntax with identical semantics in
Java regex (Spark) and RE2 (DuckDB oracle / Go tooling): character
classes, bounded repetition, ``\\b`` word boundaries. No lookaround,
no backreferences — RE2 lacks them, and their absence keeps matching
linear-time, which matters when a hostile document is 100 MB of
pathological input.

Reference scope note: beyond-reference training-data-pipeline surface
(the reference engine has no text hygiene operators).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Engine-portable patterns (Java regex == RE2 semantics for these).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}\b"
IPV4_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"

# Redaction order matters: emails first (an IPv4-shaped fragment can sit
# inside an email's domain; never the reverse once emails are gone).
_REDACTIONS = (
    (EMAIL_RE, "[EMAIL]"),
    (PHONE_RE, "[PHONE]"),
    (IPV4_RE, "[IP]"),
)


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def email_count(col: Column | str) -> Column:
    return F.regexp_count(_c(col), F.lit(EMAIL_RE))


def phone_count(col: Column | str) -> Column:
    return F.regexp_count(_c(col), F.lit(PHONE_RE))


def ipv4_count(col: Column | str) -> Column:
    return F.regexp_count(_c(col), F.lit(IPV4_RE))


def pii_count(col: Column | str) -> Column:
    """Total PII hits of all types, counted independently on the RAW
    text — overlapping matches each count (a dotted-quad inside an
    email's domain counts as both an email and an IP here, even though
    `redact_pii`'s email-first ordering consumes it once)."""
    return email_count(col) + phone_count(col) + ipv4_count(col)


def redact_pii(col: Column | str) -> Column:
    """Replace every email, phone number, and IPv4 literal with a typed
    placeholder token ([EMAIL] / [PHONE] / [IP])."""
    out = _c(col)
    for pat, token in _REDACTIONS:
        out = F.regexp_replace(out, pat, token)
    return out
