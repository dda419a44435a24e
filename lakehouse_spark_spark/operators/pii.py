"""PII detection and redaction for training-data pipelines.

Regex-based scanning/redaction of the classic structured PII shapes
(emails, IPv4 addresses, international-format phone numbers) as pure
built-in column expressions — ``regexp_extract_all`` for counts,
chained ``regexp_replace`` for redaction. No Python in the hot path;
runs at scan speed with zero shuffle, and column pruning means only the
text column is read.

The patterns deliberately use only the regex subset shared by Java
regex (Spark) and RE2 (DuckDB) — character classes, bounded repeats,
``\\b`` word boundaries; no lookaround, no backreferences — so every
query has an exact DuckDB oracle twin (DuckDB needs the explicit 'g'
flag for global replace; Spark replaces globally by default).

Scale note: this is the cheapest stage of a corpus pipeline — put it
BEFORE dedup/similarity so their shuffles carry redacted (often
shorter) text, and so near-dup grouping is not split by differing raw
PII in otherwise-identical boilerplate.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+\d{1,2} \d{3} \d{3} \d{4}"

# redaction order matters only in that emails must go before IPs would
# ever match inside a host part; we fix the order (email, ip, phone)
# and document it as part of the operator contract.
REDACTIONS: list[tuple[str, str]] = [
    (EMAIL_RE, "[EMAIL]"),
    (IPV4_RE, "[IP]"),
    (PHONE_RE, "[PHONE]"),
]


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def count_matches(col: Column | str, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(_c(col), F.lit(pattern), F.lit(0)))


def pii_counts(col: Column | str) -> dict[str, Column]:
    """Per-row match counts: {'n_emails': …, 'n_ipv4': …, 'n_phones': …}."""
    c = _c(col)
    return {
        "n_emails": count_matches(c, EMAIL_RE),
        "n_ipv4": count_matches(c, IPV4_RE),
        "n_phones": count_matches(c, PHONE_RE),
    }


def redact_pii(col: Column | str) -> Column:
    """Replace every PII match with its typed placeholder, in the fixed
    REDACTIONS order."""
    out = _c(col)
    for pattern, repl in REDACTIONS:
        out = F.regexp_replace(out, pattern, repl)
    return out
