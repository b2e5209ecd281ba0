"""Char-ngram perplexity against a reference LM table.

Replaces the reference's KenLM + SentencePiece scorer
(/root/reference/perplexity_scorer.py:138-192: per-line tokenize, log10
score, ppl = 10^(−Σscore/Σtokens)) with a char-trigram LM that is *joinable*:
``reference_lm(lang, ngram, logp)``.

Missing-value semantics preserved exactly (perplexity_scorer.py:230-243):
- no scoreable text after normalization  -> NULL   (the reference's NaN class)
- language absent from the LM            -> +inf   ("model rejection" class)
- otherwise ppl = 10^(−mean logp), unknown ngrams backed off to OOV_LOGP.

Two implementations with identical semantics (parity-tested):

1. ``perplexity_native`` — explode trigrams → broadcast hash join with the LM
   → re-aggregate per url. Zero Python; but the explode multiplies rows by
   text length, so the shuffle back to url carries ~len(text) rows/doc.
   Fine for ad-hoc SQL analytics; it is the oracle-checkable formulation.
2. ``perplexity_udf`` — scalar Arrow UDF over (text, lang) with the LM as a
   broadcast dict, initialized once per Python worker (the analog of the
   reference's per-process model cache, perplexity_scorer.py:84-135).
   O(doc) work, no row expansion, no shuffle — the 100 TB path used by the
   main pipeline.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from ..functions.ngram import char_ngrams, normalize_for_scoring

OOV_LOGP = -6.0
NGRAM_N = 3
_INF = float("inf")


# ---------------------------------------------------------------------------
# Shared pure scorer — single source of truth for the semantics.
# ---------------------------------------------------------------------------
def normalize_text_py(text: str | None) -> str:
    """Python twin of functions.ngram.normalize_for_scoring (parity-tested).

    Spark side does lower -> [^\\p{L} ]+ -> ' ' -> collapse \\s+ -> trim.
    Python re lacks \\p{L}, and the \\w-minus-digits approximation diverges
    on category No/Nl characters (superscripts, fractions, Roman numerals:
    isalnum but not \\d, yet stripped by \\p{L}). str.isalpha() is exactly
    the L* categories, so keep letters/space per char, then collapse."""
    import re

    if text is None:
        return ""
    kept = "".join(
        ch if (ch == " " or ch.isalpha()) else " " for ch in text.lower()
    )
    return re.sub(r"\s+", " ", kept).strip()


def score_ppl_py(text: str | None, lang: str | None, lm: dict) -> float | None:
    """lm: {lang: {ngram: logp}}. Returns None (NaN class), +inf (rejection),
    or the perplexity."""
    norm = normalize_text_py(text)
    if len(norm) < NGRAM_N:
        return None
    if lang not in lm:
        return _INF
    table = lm[lang]
    total = 0.0
    n = len(norm) - NGRAM_N + 1
    for i in range(n):
        total += table.get(norm[i : i + NGRAM_N], OOV_LOGP)
    return 10.0 ** (-total / n)


# ---------------------------------------------------------------------------
# LM training (corpus -> reference_lm table)
# ---------------------------------------------------------------------------
def train_char_lm(
    docs: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    n: int = NGRAM_N,
    min_count: int = 1,
) -> DataFrame:
    """Derive the reference LM table from a corpus: per-lang char-ngram
    counts with add-one smoothing, logp = log10((c+1)/(total+V)).

    The reference ships a pretrained KenLM binary
    (/root/reference/perplexity_scorer.py:84-135, HF-hub download); the
    rebuild trains the joinable LM in-engine — one explode (generator form,
    codegen) + one hash aggregation; the per-lang totals come from a window
    over the already-aggregated (small) counts frame, not a second scan.
    -> (lang, ngram, logp)."""
    from pyspark.sql import Window as W

    c = normalize_for_scoring(F.col(text_col))
    grams = (
        docs.select(F.col(lang_col).alias("lang"), c.alias("_t"))
        .filter(F.length("_t") >= n)
        .select(
            "lang",
            F.explode(F.sequence(F.lit(1), F.length("_t") - F.lit(n - 1))).alias("_i"),
            "_t",
        )
        .select("lang", F.col("_t").substr(F.col("_i"), F.lit(n)).alias("ngram"))
    )
    counts = grams.groupBy("lang", "ngram").agg(F.count(F.lit(1)).alias("c"))
    w = W.partitionBy("lang")
    total = F.sum("c").over(w)
    vocab = F.count(F.lit(1)).over(w)
    return (
        counts.withColumn("logp", F.log10((F.col("c") + 1) / (total + vocab)))
        .filter(F.col("c") >= min_count)
        .select("lang", "ngram", "logp")
    )


# ---------------------------------------------------------------------------
# Native path (explode → broadcast join → agg)
# ---------------------------------------------------------------------------
def perplexity_native(
    docs: DataFrame,
    lm: DataFrame,
    text_col: str = "extracted_text",
    lang_col: str = "lang",
    id_col: str = "url",
) -> DataFrame:
    """-> (id_col, perplexity DOUBLE). LM side is broadcast (it is a few
    thousand rows per language); the only shuffle is the re-aggregation by id,
    which AQE coalesces."""
    # coalesce: NULL text behaves like empty text (the NaN class) — without
    # this, `length(NULL) < n` is NULL and the row silently drops from BOTH
    # branches (found by the parity test).
    norm = F.coalesce(normalize_for_scoring(F.col(text_col)), F.lit(""))
    base = docs.select(
        F.col(id_col),
        F.col(lang_col).alias("_lang"),
        norm.alias("_norm"),
    )
    known_langs = lm.select("lang").distinct()
    with_known = base.join(
        F.broadcast(known_langs.withColumnRenamed("lang", "_lang").withColumn("_known", F.lit(True))),
        "_lang",
        "left",
    )
    # Class triage rows (no explode needed for them)
    no_text = F.length("_norm") < NGRAM_N
    rejected = F.col("_known").isNull()
    special = with_known.filter(no_text | rejected).select(
        id_col,
        F.when(no_text, F.lit(None).cast("double"))
        .otherwise(F.lit(_INF))
        .alias("perplexity"),
    )
    scoreable = with_known.filter(~no_text & ~rejected)
    grams = scoreable.select(
        id_col, "_lang", F.explode(char_ngrams(F.col("_norm"), NGRAM_N)).alias("ngram")
    )
    joined = grams.join(
        F.broadcast(lm.withColumnRenamed("lang", "_lang")), ["_lang", "ngram"], "left"
    )
    scored = joined.groupBy(id_col).agg(
        F.pow(
            F.lit(10.0),
            -F.sum(F.coalesce(F.col("logp"), F.lit(OOV_LOGP))) / F.count(F.lit(1)),
        ).alias("perplexity")
    )
    return scored.unionByName(special)


# ---------------------------------------------------------------------------
# Arrow-UDF path (the scale path used by plans/pipeline.py)
# ---------------------------------------------------------------------------
def make_perplexity_udf(spark, lm: DataFrame):
    """Build a pandas UDF closed over a broadcast {lang: {ngram: logp}} dict.

    Broadcast (not closure-pickled per task): the LM ships to each executor
    once (SURVEY.md UD4)."""
    lm_rows = lm.collect()
    lm_dict: dict[str, dict[str, float]] = {}
    for r in lm_rows:
        lm_dict.setdefault(r["lang"], {})[r["ngram"]] = float(r["logp"])
    bc = spark.sparkContext.broadcast(lm_dict)

    @F.pandas_udf(T.DoubleType())
    def ppl_udf(text: pd.Series, lang: pd.Series) -> pd.Series:
        table = bc.value
        out = []
        for t, lg in zip(text, lang):
            r = score_ppl_py(t, lg, table)
            out.append(math.nan if r is None else r)
        return pd.Series(out, dtype="float64")

    return ppl_udf


def with_perplexity(
    spark,
    docs: DataFrame,
    lm: DataFrame,
    text_col: str = "extracted_text",
    lang_col: str = "lang",
    out_col: str = "perplexity",
) -> DataFrame:
    """Attach perplexity via the UDF path. NOTE: the UDF returns NaN for the
    no-text class (Arrow cannot carry NULL-vs-NaN distinction out of a float
    Series cleanly), so we re-map NaN -> NULL here to keep the engine-wide
    convention (NULL = NaN class, +inf = rejection)."""
    c = F.col(out_col)
    udf = make_perplexity_udf(spark, lm)
    return docs.withColumn(out_col, udf(F.col(text_col), F.col(lang_col))).withColumn(
        out_col, F.when(F.isnan(c), F.lit(None)).otherwise(c)
    )
