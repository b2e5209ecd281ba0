"""Published quality-filter rule packs — the Gopher rules (Rae et al. 2021,
arXiv:2112.11446 Table A1) and the C4 heuristics (Raffel et al. 2020,
arXiv:1910.10683 §2.2) as native column expressions over raw text.

Reference-repo analog: none (training-data layer, SURVEY §2.13); the
reference's quality analytics are confidence-band stats, not content rules.

Doc-level subset (the synthetic corpus has no newlines, so the papers'
line-level rules — bullet-start / ellipsis-end fractions — would be
constant here and are omitted; word-level rules are thresholded to
fixture-length texts, thresholds exposed as parameters):

- G1 word count inside [min_words, max_words]
- G2 mean word length inside [3, 10]
- G3 symbol-to-word ratio ('#' or '...') <= 0.1
- G4 >= 80% of words contain an alphabetic character
- G5 >= 2 stop words (the engine's en stop list)
- C4a no 'lorem ipsum'; C4b no '{'

Everything is codegen (split / length / regexp in the Java∩RE2 subset —
the pii.py contract) except G4's word filter, an in-row HOF over the
token array (interpreted but shuffle-free; same trade as exactsubstr's
fingerprint transform). Zero shuffles before the caller's rollup.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from .text import STOPWORDS, _word_hits

__all__ = ["rulepack_flags"]


def rulepack_flags(
    c: Column,
    min_words: int = 5,
    max_words: int = 100_000,
    lang: str = "en",
) -> dict[str, Column]:
    """{rule: BooleanColumn} — True = the document PASSES the rule.
    NULL-safe: NULL/empty text fails G1 (word count 0) and passes the
    content rules vacuously except G5 (no stop words)."""
    t = F.coalesce(c, F.lit(""))
    toks = F.when(
        F.length(F.trim(t)) > 0, F.split(F.trim(t), r"\s+")
    ).otherwise(F.array().cast("array<string>"))
    n_words = F.size(toks)
    # mean word length without a fold: non-whitespace chars / words
    n_chars = F.length(F.regexp_replace(t, r"\s", ""))
    mwl = F.when(n_words > 0, n_chars / n_words)
    n_sym = F.size(F.regexp_extract_all(t, F.lit(r"#|\.\.\."), 0))
    n_alpha_words = F.size(F.filter(toks, lambda w: w.rlike("[a-zA-Z]")))
    return {
        "g1_wordcount": (n_words >= min_words) & (n_words <= max_words),
        "g2_mean_word_len": F.coalesce((mwl >= 3.0) & (mwl <= 10.0), F.lit(False)),
        "g3_symbol_ratio": F.when(n_words > 0, n_sym / n_words <= 0.1).otherwise(
            F.lit(True)
        ),
        "g4_alpha_words": F.when(
            n_words > 0, n_alpha_words / n_words >= 0.8
        ).otherwise(F.lit(True)),
        "g5_stopwords": _word_hits(t, STOPWORDS[lang]) >= 2,
        "c4_lorem_brace": ~(
            F.lower(t).contains("lorem ipsum") | t.contains("{")
        ),
    }
