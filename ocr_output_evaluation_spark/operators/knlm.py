"""X51 — interpolated Kneser-Ney bigram LM: train + perplexity, the
published standard for corpus-quality LMs (Kneser & Ney 1995; the
interpolated variant of Chen & Goodman 1999 §2.7 with fixed absolute
discount D = 0.75 — what KenLM ships and what CCNet's quality buckets
score with). Upgrades the engine's LM family beyond X13's add-one
char-trigram: absolute discounting plus CONTINUATION probabilities
(a word's unigram weight is how many distinct contexts it follows, not
its raw frequency — the correction that demotes "francisco"-style words
that are frequent but glued to one context).
Reference analog: none (the reference downloads a pretrained KenLM
binary, /root/reference/perplexity_scorer.py:84-135; the rebuild trains
in-engine like X13/X33).

    P(w | v) = max(c(v,w) - D, 0) / c(v)  +  lam(v) * Pcont(w)
    lam(v)   = D * N1+(v.) / c(v)
    Pcont(w) = N1+(.w) / N1+(..)

All inputs are exact integer count frames; the per-bigram-type log10 is
quantized to a nano BIGINT (the X39 recipe), so per-document scores are
exact integer sums — order-independent under any partial-agg schedule,
hence oracle-replayable. D = 0.75 is exactly representable in binary64,
so the discounted numerator is exact too.

Scale design: one corpus scan explodes bigram instances and immediately
collapses to the (lang, v, w) TYPE frame (map-side combined); every
derived statistic (c(v), N1+(v.), N1+(.w), N1+(..)) is an agg of that
vocabulary-scale frame, never a second scan. The nano-logp table is
vocabulary-scale and joins back onto the instance frame on (lang, v, w)
— the same aggregated-frame join shape as X13's native scorer. Nothing
is collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from ..functions.ngram import word_ngrams

D = 0.75  # absolute discount (Chen & Goodman 1999's fixed-D baseline)


def _bigram_instances(df: DataFrame, text_col: str, lang_col: str) -> DataFrame:
    """(lang, doc_id, v, w) — one row per adjacent word pair instance."""
    return df.select(
        F.col(lang_col).alias("lang"),
        "doc_id",
        F.explode(word_ngrams(F.col(text_col), 2)).alias("_g"),
    ).select(
        "lang",
        "doc_id",
        F.substring_index(F.col("_g"), " ", 1).alias("v"),
        F.substring_index(F.col("_g"), " ", -1).alias("w"),
    )


def train_kn_bigram(
    df: DataFrame, text_col: str = "text", lang_col: str = "lang"
) -> DataFrame:
    """Per-lang interpolated-KN bigram table:
    (lang, v, w, c_vw, nano_logp) with nano_logp =
    round(log10(P(w|v)) * 1e9) as BIGINT.

    The probability is spelled in one fixed association (mirrored
    operand-for-operand by the SQL oracle):

        (greatest(c_vw - 0.75, 0) / c_v)
        + ((0.75 * n1p_v / c_v) * (n1ctx_w / n_types))
    """
    types = (
        _bigram_instances(df, text_col, lang_col)
        .groupBy("lang", "v", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("c_vw"))
    )
    wl = W.partitionBy("lang")
    wv = W.partitionBy("lang", "v")
    ww = W.partitionBy("lang", "w")
    # Window aggs over the already-aggregated type frame (vocabulary-scale),
    # the train_char_lm discipline — no second corpus scan.
    enriched = (
        types.withColumn("c_v", F.sum("c_vw").over(wv))
        .withColumn("n1p_v", F.count(F.lit(1)).over(wv))
        .withColumn("n1ctx_w", F.count(F.lit(1)).over(ww))
        .withColumn("n_types", F.count(F.lit(1)).over(wl))
    )
    c = F.col
    p = (
        F.greatest(c("c_vw").cast("double") - F.lit(D), F.lit(0.0))
        / c("c_v").cast("double")
    ) + (
        (F.lit(D) * c("n1p_v").cast("double") / c("c_v").cast("double"))
        * (c("n1ctx_w").cast("double") / c("n_types").cast("double"))
    )
    return enriched.select(
        "lang",
        "v",
        "w",
        "c_vw",
        F.round(F.log10(p) * 1e9).cast("long").alias("nano_logp"),
    )


def kn_doc_scores(
    df: DataFrame,
    lm: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Per-doc KN perplexity against a trained table:
    (lang, doc_id, n_bigrams, ppl) with
    ppl = 10 ^ ( -(sum_nano / 1e9) / n_bigrams ), rounded to 2dp.

    The per-doc sum is an exact BIGINT, so the aggregation order cannot
    perturb the result. Docs with < 2 tokens have no bigram instances
    and drop out (the X13 NULL class — callers count them upstream if
    needed). Bigrams absent from ``lm`` would drop at the join; when
    scoring the training corpus itself (the X33/CCNet pattern) every
    instance is present by construction."""
    inst = _bigram_instances(df, text_col, lang_col)
    scored = inst.join(lm.select("lang", "v", "w", "nano_logp"), ["lang", "v", "w"])
    agg = scored.groupBy("lang", "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum("nano_logp").alias("_sum_nano"),
    )
    ppl = F.pow(
        F.lit(10.0),
        -(F.col("_sum_nano").cast("double") / F.lit(1e9))
        / F.col("n_bigrams").cast("double"),
    )
    return agg.select(
        "lang", "doc_id", "n_bigrams", F.round(ppl, 2).alias("ppl")
    )
