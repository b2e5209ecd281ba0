"""X50 — PMI collocation mining: rank adjacent word pairs by pointwise
mutual information, the published phrase-detection primitive (Church &
Hanks 1990; the word2vec phrase pass, Mikolov et al. 2013 §4, is the
same statistic with a discount). Training pipelines run it to mine
multi-word units for tokenizer vocabularies and to audit boilerplate
(high-PMI pairs that dominate a source are template artifacts).
Reference analog: none — rebuild-only operator.

PMI(w1, w2) = ln( p(w1 w2) / (p(w1) p(w2)) )
            = ln( (c12 * T * T) / (B * c1 * c2) )

with c12 the bigram count, c1/c2 unigram counts, T total tokens, B total
bigrams — all exact integer counts, so both engines feed ln() the same
doubles when the quotient is spelled operand-for-operand identically
(the BM25/X48 discipline; products go through DOUBLE before multiplying
so no BIGINT overflow at corpus scale).

Scale design: the corpus is scanned three times (per-doc token counts
for T/B, unigram explode, bigram explode), each collapsing immediately
through a map-side-combined count — the frames that shuffle afterwards
are VOCABULARY-scale (distinct words / distinct adjacent pairs), never
instance-scale. The unigram-count joins run pair-frame x word-frame on
the word key: aggregated-by-aggregated, the same vocabulary-scale shape
as the BPE pair-stats join (operators/bpe.py). min_count prunes the pair
frame BEFORE both joins, so the long tail of hapax bigrams (the bulk of
the distinct-pair frame under Zipf) never shuffles twice. Nothing is
collected; the totals ride along as a broadcast 1-row frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.ngram import word_ngrams, word_tokens


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 20,
) -> DataFrame:
    """Top-``top_k`` adjacent word pairs by PMI over the normalized text.

    Output: (w1, w2, c12, c1, c2, pmi) — pmi rounded to 6dp, totally
    ordered by (pmi desc, w1, w2) so the LIMIT is deterministic. Pairs
    with c12 < ``min_count`` are pruned (raw PMI is maximal for hapax
    pairs — the classic degenerate ranking the count floor exists for).
    """
    t = F.col(text_col)

    # One scan: exact instance totals (T tokens, B bigrams) as a 1-row frame.
    totals = df.select(
        F.size(word_tokens(t)).cast("long").alias("_n")
    ).agg(
        F.sum("_n").alias("tot_tokens"),
        F.sum(F.greatest(F.col("_n") - 1, F.lit(0))).alias("tot_bigrams"),
    )

    uni = (
        df.select(F.explode(word_tokens(t)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    pairs = (
        df.select(F.explode(word_ngrams(t, 2)).alias("g"))
        .select(
            F.substring_index(F.col("g"), " ", 1).alias("w1"),
            F.substring_index(F.col("g"), " ", -1).alias("w2"),
        )
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("c12"))
        .filter(F.col("c12") >= min_count)
    )

    d = F.col
    joined = (
        pairs.join(uni.select(F.col("w").alias("w1"), F.col("c").alias("c1")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c").alias("c2")), "w2")
        .join(F.broadcast(totals))
    )
    # Operand-for-operand double quotient (identical spelling in the
    # oracle SQL): ((c12 * T) * T) / ((B * c1) * c2), every factor cast
    # to DOUBLE first so the product never overflows BIGINT.
    num = (d("c12").cast("double") * d("tot_tokens").cast("double")) * d(
        "tot_tokens"
    ).cast("double")
    den = (d("tot_bigrams").cast("double") * d("c1").cast("double")) * d(
        "c2"
    ).cast("double")
    return (
        joined.select(
            "w1",
            "w2",
            "c12",
            "c1",
            "c2",
            F.round(F.log(num / den), 6).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(top_k)
    )


def llr_collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 3,
    top_k: int = 20,
) -> DataFrame:
    """X89 — top-``top_k`` adjacent word pairs by Dunning's
    log-likelihood ratio (Dunning 1993, "Accurate Methods for the
    Statistics of Surprise and Coincidence"): G² over the 2x2 bigram
    contingency table — the collocation statistic that stays calibrated
    at low counts where raw PMI degenerates (the reason NLTK/published
    phrase miners default to it). Margins are BIGRAM-based as the paper
    requires: c1 = count of bigrams with first word w1, c2 = count with
    second word w2, B = total bigrams — all derived from the FULL pair
    frame (one persisted vocabulary-scale frame fans into both margins,
    the total, and the floored candidate set; no extra corpus scan).

    G² = 2·Σ_cells k·ln(k·B/(R·C)) with 0·ln0 = 0, every cell an exact
    BIGINT and every term a per-row double expression (no cross-row
    float sums), so the 6dp ranking replays engine-exactly. Output:
    (w1, w2, c12, c1, c2, llr), total order (llr desc, w1, w2).

    Scale: identical shape to pmi_collocations — instance-scale explodes
    collapse map-side; everything that shuffles afterwards is
    vocabulary-scale; min_count prunes candidates before the joins; the
    margins join aggregated-by-aggregated on the word key.
    Reference analog: none — rebuild-only (SURVEY §2.13)."""
    t = F.col(text_col)
    pairs = (
        df.select(F.explode(word_ngrams(t, 2)).alias("g"))
        .select(
            F.substring_index(F.col("g"), " ", 1).alias("w1"),
            F.substring_index(F.col("g"), " ", -1).alias("w2"),
        )
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("c12"))
        .persist()
    )
    cf = pairs.groupBy("w1").agg(F.sum("c12").cast("long").alias("c1"))
    cs = pairs.groupBy("w2").agg(F.sum("c12").cast("long").alias("c2"))
    tot = pairs.agg(F.sum("c12").cast("long").alias("b"))
    j = (
        pairs.filter(F.col("c12") >= min_count)
        .join(cf, "w1")
        .join(cs, "w2")
        .join(F.broadcast(tot))
    )
    b = F.col("b").cast("double")

    def cell(k, r, c):
        k = k.cast("double")
        return F.when(
            k > 0, k * F.log((k * b) / (r.cast("double") * c.cast("double")))
        ).otherwise(F.lit(0.0))

    k11 = F.col("c12")
    k12 = F.col("c1") - F.col("c12")
    k21 = F.col("c2") - F.col("c12")
    k22 = F.col("b") - F.col("c1") - F.col("c2") + F.col("c12")
    r1, r2 = F.col("c1"), F.col("b") - F.col("c1")
    c1m, c2m = F.col("c2"), F.col("b") - F.col("c2")
    llr = F.lit(2.0) * (
        cell(k11, r1, c1m) + cell(k12, r1, c2m) + cell(k21, r2, c1m) + cell(k22, r2, c2m)
    )
    return (
        j.select("w1", "w2", "c12", "c1", "c2", F.round(llr, 6).alias("llr"))
        .orderBy(F.desc("llr"), "w1", "w2")
        .limit(top_k)
    )
