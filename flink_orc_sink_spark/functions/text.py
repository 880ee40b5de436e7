"""Text-analysis column expressions for LLM-data pipelines.

Tokenization, shingling, hashing, language-ID, and quality-scoring —
all as pure Catalyst expressions (no Python UDFs), so they vectorize
inside whole-stage codegen and scale linearly with partitions. Each
function documents its exact semantics because the DuckDB oracles in
``__spark_entry__.py`` replicate them token-for-token.

The reference has no text operators (SURVEY.md §2.4 — NOT PRESENT);
this module is part of the north-star LLM-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the heuristic language ID.
# Deliberately short: the point is a deterministic, scalable heuristic
# (and the oracle replicates it), not linguistic accuracy.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "por"),
    "fr": ("le", "la", "de", "et", "un", "une", "est", "pour"),
    "de": ("der", "die", "das", "und", "ist", "ein", "zu", "mit"),
}


def tokens(text: Column | str) -> Column:
    """Whitespace tokens of ``lower(trim(text))``, empties removed.

    Canonical tokenization for every operator in this package:
    ``filter(split(lower(trim(text)), '\\s+'), t -> t <> '')``.
    """
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(
        F.split(F.lower(F.trim(c)), r"\s+"), lambda t: t != F.lit("")
    )


def token_count(text: Column | str) -> Column:
    """Number of whitespace tokens (the cheap length proxy an ingest
    pipeline uses before real BPE tokenization)."""
    return F.size(tokens(text))


# GPT-2-style pre-tokenizer pattern (simplified to the RE2-compatible
# subset: ordered alternation, no lookarounds): contractions, letter
# runs, digit runs, other-symbol runs — each optionally preceded by
# one space — then residual whitespace. Counting matches of this
# pattern is the standard "BPE-ish" token-budget estimate before real
# BPE merges run.
BPE_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+"


def bpe_token_count(text: Column | str) -> Column:
    """Approximate BPE token count: matches of :data:`BPE_PATTERN`
    (whitespace itself is not counted). Pure ``regexp_extract_all`` —
    JVM-side, codegen-friendly, linear in text length."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(BPE_PATTERN), 0))


def word_shingles(text: Column | str, k: int = 3) -> Column:
    """Distinct word ``k``-shingles as an array<string>.

    ``shingle_i = tokens[i..i+k-1]`` joined by single spaces; documents
    with fewer than ``k`` tokens contribute one shingle = the whole
    token sequence. Distinctness makes downstream Jaccard set-based.
    """
    toks = tokens(text)
    n = F.size(toks)
    shingled = F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
    )
    whole = F.array(F.concat_ws(" ", toks))
    return F.array_distinct(F.when(n >= k, shingled).otherwise(whole))


def hash64(c: Column | str, hex_chars: int = 15) -> Column:
    """Deterministic unsigned integer hash from the md5 hex digest.

    ``conv(substr(md5(x), 1, hex_chars), 16, 10)`` — md5 is available
    with identical output in Spark and DuckDB, so oracles can replicate
    this exactly (DuckDB: ``('0x' || substr(md5(x),1,n))::BIGINT``).
    15 hex chars = 60 bits, safely inside a signed int64.
    """
    c = F.col(c) if isinstance(c, str) else c
    return F.conv(F.substring(F.md5(c), 1, hex_chars), 16, 10).cast("long")


def hash32(c: Column | str) -> Column:
    """32-bit variant of :func:`hash64` (8 hex chars), small enough
    that ``a * h + b`` stays inside int64 for 31-bit ``a``."""
    return hash64(c, hex_chars=8)


def normalized_text(text: Column | str) -> Column:
    """Canonical form for exact-dedup fingerprinting: lowercase,
    whitespace runs collapsed to single spaces, trimmed."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def fingerprint(text: Column | str) -> Column:
    """Exact-dedup document fingerprint: md5 of :func:`normalized_text`."""
    return F.md5(normalized_text(text))


def punct_ratio(text: Column | str) -> Column:
    """Fraction of characters that are ASCII punctuation ``[.!?,;:]``."""
    c = F.col(text) if isinstance(text, str) else text
    n = F.length(c)
    punct = F.length(c) - F.length(F.regexp_replace(c, r"[.!?,;:]", ""))
    return F.when(n > 0, punct / n).otherwise(F.lit(0.0))


def stopword_hits(text: Column | str, lang: str = "en") -> Column:
    """Count of tokens that are stopwords of ``lang``."""
    words = LANG_STOPWORDS[lang]
    return F.size(
        F.filter(tokens(text), lambda t: t.isin(*[F.lit(w) for w in words]))
    )


def lang_id(text: Column | str) -> Column:
    """Heuristic language ID: argmax of per-language stopword hits,
    ties broken by language-code order, 'und' when no hits at all.

    This is the classic scalable n-gram/stopword heuristic — one pass,
    no model, pure column expressions.
    """
    hits = {lang: stopword_hits(text, lang) for lang in LANG_STOPWORDS}
    best = F.greatest(*hits.values())
    expr = F.lit("und")
    # Iterate in reverse so earlier language codes win ties.
    for lang in sorted(LANG_STOPWORDS, reverse=True):
        expr = F.when((hits[lang] > 0) & (hits[lang] == best), F.lit(lang)).otherwise(
            expr
        )
    return expr


def quality_score(text: Column | str) -> Column:
    """Composite document-quality score in [0, 1] for filter pipelines.

    score = 0.4 * min(token_count/50, 1)        (enough content)
          + 0.3 * (1 - min(punct_ratio*10, 1))  (not punctuation soup)
          + 0.3 * min(mean_word_len/8, 1)       (real words, not noise)

    Deterministic and cheap; thresholds are conventional, not learned.
    """
    tc = token_count(text).cast("double")
    c = F.col(text) if isinstance(text, str) else text
    mean_wl = F.when(tc > 0, F.length(F.trim(c)).cast("double") / tc).otherwise(
        F.lit(0.0)
    )
    return (
        F.lit(0.4) * F.least(tc / 50.0, F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - F.least(punct_ratio(text) * 10.0, F.lit(1.0)))
        + F.lit(0.3) * F.least(mean_wl / 8.0, F.lit(1.0))
    )
