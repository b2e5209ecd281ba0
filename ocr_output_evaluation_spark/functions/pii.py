"""PII scrubbing expressions — the redaction pass every public-web training
pipeline runs before export (emails, phone numbers, IP addresses replaced by
typed placeholder tokens).

All native regexp expressions (codegen, scan-speed at 100 TB — no Python).
Patterns are restricted to the syntax subset Java regex (Spark) and RE2
(DuckDB) interpret identically, so the whole pass is ANSI-SQL-replayable and
oracle-checked; both engines apply the SAME chain order EMAIL -> IP ->
PHONE — order is semantic, not style: the phone charset ([0-9 ().-]) would
otherwise swallow dotted IPv4 strings, and email local parts contain
digits the phone pattern could clip (parity probed both engines, round 3).

Reference analog: none (the reference scores OCR confidence); this module
is part of the training-data surface SURVEY §2.13 adds beyond it.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.column import Column

EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IP_PATTERN = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PHONE_PATTERN = r"\+?[0-9][0-9 ().-]{7,}[0-9]"

# (pattern, replacement) in the ONLY order that is overlap-safe — see module
# docstring. Keep in sync with the SQL oracle's chain.
SCRUB_CHAIN = [
    (EMAIL_PATTERN, "<EMAIL>"),
    (IP_PATTERN, "<IP>"),
    (PHONE_PATTERN, "<PHONE>"),
]


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def pii_counts(c: Column | str) -> tuple[Column, Column, Column]:
    """(n_emails, n_ips, n_phones) found in the raw text — counted BEFORE
    scrubbing, with the same overlap rule as the scrub chain (emails and
    IPs masked out before phones are counted, so a digit-dotted string is
    never double-counted as both IP and phone)."""
    t = _col(c)
    n_email = F.size(F.regexp_extract_all(t, F.lit(EMAIL_PATTERN), 0))
    after_email = F.regexp_replace(t, EMAIL_PATTERN, "<EMAIL>")
    n_ip = F.size(F.regexp_extract_all(after_email, F.lit(IP_PATTERN), 0))
    after_ip = F.regexp_replace(after_email, IP_PATTERN, "<IP>")
    n_phone = F.size(F.regexp_extract_all(after_ip, F.lit(PHONE_PATTERN), 0))
    return n_email, n_ip, n_phone


def scrub_pii(c: Column | str) -> Column:
    """Text with every email / IPv4 / phone-number span replaced by its
    placeholder token, applied in the overlap-safe chain order."""
    out = _col(c)
    for pat, rep in SCRUB_CHAIN:
        out = F.regexp_replace(out, pat, rep)
    return out
