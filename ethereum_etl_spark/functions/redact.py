"""PII redaction — training-corpus hygiene over webtext.

Web-crawl text carries emails, phone numbers, and IP addresses that
most training-data policies require scrubbing before use (the C4 /
RefinedWeb pipelines ship the same pass). Everything here is
``regexp_replace`` / ``regexp_count`` column expressions — JVM-side,
whole-stage codegen, zero Python — so at 100 TB redaction rides the
same scan as extraction.

The patterns are deliberately RE2-compatible (no lookarounds, no
backreferences) so the identical strings run on Spark (java.util.regex)
and DuckDB/RE2 with identical results — the oracle row proves the
replacement output bit-identical, not just the counts.

Replacement order matters and is fixed: emails first (their domains can
embed dotted digits), then IPs (a dotted quad also matches the phone
pattern), then phones.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: local@domain.tld — ASCII subset; intentionally conservative (no
#: quoted locals / IDN), matching what crawl-scrubbing passes use.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
#: dotted IPv4 quad on word boundaries (octet ranges unchecked — a
#: scrubber prefers false positives over leaked addresses)
IP_RE = r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b"
#: 9+ digit-ish runs with separators, optional leading + — covers
#: +1-415-555-0199 / (415) 555 0123 / 415.555.0199
PHONE_RE = r"\+?[0-9][0-9()\ .-]{7,}[0-9]"

#: kind -> (pattern, replacement token), in the required order
PII_KINDS: dict[str, tuple[str, str]] = {
    "email": (EMAIL_RE, "<EMAIL>"),
    "ip": (IP_RE, "<IP>"),
    "phone": (PHONE_RE, "<PHONE>"),
}


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def redact_pii(col: str | Column, kinds: tuple[str, ...] = ("email", "ip", "phone")) -> Column:
    """Text with every match of the selected kinds replaced by its
    token, applied in the canonical order regardless of the order given
    (the order is a correctness property, not a preference)."""
    out = _c(col)
    for kind in PII_KINDS:  # canonical order
        if kind in kinds:
            pat, token = PII_KINDS[kind]
            out = F.regexp_replace(out, pat, token)
    return out


def pii_counts(col: str | Column, kind: str) -> Column:
    """Number of matches of one kind BEFORE redaction (audit metric —
    lineage for the scrubbing pass)."""
    pat, _ = PII_KINDS[kind]
    return F.regexp_count(_c(col), F.lit(pat)).cast("long")
