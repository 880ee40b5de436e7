"""PII detection / scrubbing and URL extraction as Catalyst expressions.

A 100 TB training-data pipeline scrubs PII (emails, phone numbers,
IP addresses) and mines URLs before anything else touches the text.
Both are pure per-row regex work, so the whole surface stays JVM-side
(`regexp_replace` / `regexp_count` / `regexp_extract` — no Python in
the hot path, no shuffle; the scrub is a map that fuses into whatever
scan feeds it).

The patterns are written to the common subset of Java regex (Spark)
and RE2 (DuckDB oracles): no backreferences, no lookaround, explicit
character classes — so the oracle replicates matches bit-for-bit.

The reference has no text functions at all (SURVEY.md §2.4 — NOT
PRESENT); this is part of the engine's north-star extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Ordered: emails first (an email contains no phone/IP match, but the
# scrub order is part of the contract and the oracle mirrors it).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+\d{1,2} \d{3}-\d{3}-\d{4}"
IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
URL_RE = r"https?://[^\s]+"
DOMAIN_GROUP_RE = r"https?://([^/\s]+)"

EMAIL_TOKEN = "<EMAIL>"
PHONE_TOKEN = "<PHONE>"
IP_TOKEN = "<IP>"


def scrub_pii(col: Column) -> Column:
    """Replace every email, then phone, then IPv4 with a typed token.

    Three chained ``regexp_replace`` (each replaces ALL occurrences);
    Catalyst folds them into one projection — one pass over the data,
    scan-fused, zero shuffle.
    """
    out = F.regexp_replace(col, EMAIL_RE, EMAIL_TOKEN)
    out = F.regexp_replace(out, PHONE_RE, PHONE_TOKEN)
    return F.regexp_replace(out, IPV4_RE, IP_TOKEN)


def count_emails(col: Column) -> Column:
    return F.regexp_count(col, F.lit(EMAIL_RE)).cast("long")


def count_phones(col: Column) -> Column:
    return F.regexp_count(col, F.lit(PHONE_RE)).cast("long")


def count_ipv4(col: Column) -> Column:
    return F.regexp_count(col, F.lit(IPV4_RE)).cast("long")


def url_domain(col: Column) -> Column:
    """First URL's host ('' when the row has no URL) — the groupBy key
    for per-domain corpus statistics."""
    return F.regexp_extract(col, DOMAIN_GROUP_RE, 1)


def email_token(e: Column, key: str) -> Column:
    """Deterministic keyed pseudonym for one email: ``<EMAIL:`` +
    first 12 hex chars of ``sha256(key ':' email)`` + ``>``. Same
    email → same token across documents, runs and engines
    (referential integrity for downstream joins / dedup); unlinkable
    without the key. 12 hex chars = 48 bits — collision-safe for any
    realistic vault size (birthday bound ≈ 2^24 distinct emails)."""
    return F.concat(
        F.lit("<EMAIL:"),
        F.substring(F.sha2(F.concat(F.lit(key + ":"), e), 256), 1, 12),
        F.lit(">"),
    )


def tokenize_emails(col: Column, key: str) -> Column:
    """PSEUDONYMIZE (not redact) every email in the text: each match
    replaced by its :func:`email_token`. Unlike :func:`scrub_pii`'s
    blanket ``<EMAIL>``, tokenization keeps distinct identities
    distinct — corpus statistics, dedup and per-user joins still work
    on the scrubbed text, the GDPR-grade trade every training
    pipeline wants.

    Pure Catalyst: ``regexp_extract_all`` lists the matches,
    ``aggregate`` folds a literal ``replace`` over them — scan-fused,
    zero shuffle, no Python. Per-row cost is O(matches × len), and
    matches are tiny. The fold runs LONGEST MATCH FIRST: one matched
    email can be a substring of another (``a@x.com`` inside
    ``tea@x.com``), and replacing the shorter one first would corrupt
    the longer one before its own replacement runs, fusing two
    identities into one token (unit-pinned in tests/test_pii.py)."""
    emails = F.array_distinct(
        F.regexp_extract_all(col, F.lit(EMAIL_RE), F.lit(0))
    )
    longest_first = F.transform(
        F.sort_array(
            F.transform(
                emails,
                lambda e: F.struct(
                    F.length(e).alias("l"), e.alias("e")
                ),
            ),
            asc=False,
        ),
        lambda s: s["e"],
    )
    return F.aggregate(
        longest_first,
        col,
        lambda acc, e: F.replace(acc, e, email_token(e, key)),
    )
