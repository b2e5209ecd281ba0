"""Character n-gram expression helpers — native, no UDF.

Used by the perplexity scorer (operators/perplexity.py: the explode→join
path that replaces the reference's KenLM loop,
/root/reference/perplexity_scorer.py:138-192) and by MinHash/Jaccard dedup
shingling (operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.column import Column


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def char_ngrams(c: Column | str, n: int) -> Column:
    """ARRAY<STRING> of all overlapping char n-grams of the string.

    Empty array when length < n. Implemented as sequence(1, len-n+1) →
    transform(substring) — stays inside codegen; the array is materialized
    per row, so callers should bound text length first (F.substring) when
    only a prefix is needed (e.g. fingerprints)."""
    c = _col(c)
    return F.when(
        F.length(c) >= n,
        F.transform(
            F.sequence(F.lit(1), F.length(c) - F.lit(n - 1)),
            lambda i: c.substr(i, F.lit(n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def normalize_for_scoring(c: Column | str) -> Column:
    """Deterministic text cleanup before LM scoring — the rebuild's analog of
    the reference's keep-only-Tibetan regex + space squeeze
    (/root/reference/perplexity_scorer.py:72-79): lowercase, keep letters and
    spaces, collapse whitespace, trim."""
    c = _col(c)
    kept = F.regexp_replace(F.lower(c), r"[^\p{L} ]+", " ")
    return F.trim(F.regexp_replace(kept, r"\s+", " "))


def word_tokens(c: Column | str) -> Column:
    """ARRAY<STRING> of whitespace tokens of the normalized text (see
    normalize_for_scoring); empty array for empty/NULL-ish input (split('')
    would yield [''])."""
    t = normalize_for_scoring(c)
    return F.when(F.length(t) > 0, F.split(t, " ")).otherwise(
        F.array().cast("array<string>")
    )


def word_ngrams(c: Column | str, n: int) -> Column:
    """ARRAY<STRING> of space-joined overlapping word n-grams of the
    normalized text — the training-data decontamination / repetition-metric
    unit (the "13-gram overlap" family of published contamination checks,
    scaled down by parameter). Empty array when the text has < n tokens.
    Same codegen shape as char_ngrams: sequence → transform(slice), one
    array per row, no Python."""
    toks = word_tokens(c)
    cnt = F.size(toks) - F.lit(n - 1)
    return F.when(
        cnt >= 1,
        F.transform(
            F.sequence(F.lit(0), cnt - F.lit(1)),
            lambda i: F.array_join(F.slice(toks, i + F.lit(1), n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
