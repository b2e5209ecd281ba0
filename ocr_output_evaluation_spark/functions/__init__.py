from .valid import valid, valid_arr
from .arrays import (
    array_mean,
    array_median,
    array_percentile,
    array_stddev_samp,
)
from .ngram import char_ngrams, normalize_for_scoring
from .text import (
    bpe_ish_token_count,
    control_char_ratio,
    lang_id_scores,
    normalized_fingerprint,
    punct_ratio,
    quality_score,
    rolling_fingerprint,
    stopword_ratio,
    whitespace_token_count,
)

__all__ = [
    "valid",
    "valid_arr",
    "array_mean",
    "array_median",
    "array_percentile",
    "array_stddev_samp",
    "char_ngrams",
    "normalize_for_scoring",
    "normalized_fingerprint",
    "whitespace_token_count",
    "bpe_ish_token_count",
    "punct_ratio",
    "stopword_ratio",
    "control_char_ratio",
    "lang_id_scores",
    "quality_score",
    "rolling_fingerprint",
]
