"""X69 — Moore-Lewis cross-entropy difference selection: the canonical
intelligent-data-selection method (Moore & Lewis 2010, "Intelligent
selection of language model training data", ACL): score every candidate
document by H_in(doc) - H_out(doc) — its per-gram cross-entropy under an
IN-DOMAIN language model minus its cross-entropy under a GENERAL
(out-of-domain) model — and keep the lowest-scoring documents. Subtracting
H_out cancels the "easy text scores well everywhere" bias that plain
in-domain perplexity ranking suffers from (the paper's central point);
this is the standard recipe for mining domain-relevant training data out
of a web-scale crawl from a small trusted seed. Differs from DSIR (X39):
DSIR sums hashed bag-of-words importance ratios (length-biased by design,
resampling semantics); Moore-Lewis is the length-NORMALIZED per-gram
cross-entropy difference over real char-ngram LMs with explicit
selection-threshold semantics.
Reference analog: none — rebuild-only operator (SURVEY §2.13); composes
the X13 LM layer (operators/perplexity.py train_char_lm).

Spark-first shape, and how it holds at 100 TB:
- both LMs train with train_char_lm: explode → map-side-combined hash agg,
  collapsing to VOCABULARY-scale frames (char-trigram vocab is bounded by
  |alphabet|^3, a few hundred k rows for any corpus size).
- the two LMs fold into ONE vocab-scale diff table
  (dn = round((logp_out - logp_in) * 1e9) as BIGINT) that broadcasts;
  grams unseen by BOTH models contribute exactly 0 (both sides back off
  to OOV_LOGP) and are represented by broadcast-join MISSES, never rows.
- scoring is ONE pass: explode_outer doc grams → BroadcastHashJoin →
  per-doc map-side-combined agg (the X39 explode_outer + coalesce recipe
  keeps gram-free docs without a corpus join-back). The corpus never
  shuffles — the only exchange carries one fixed-width row per document.
- H_in - H_out per doc = ml_nano / (1e9 * n_grams) where ml_nano is an
  ORDER-INDEPENDENT exact BIGINT sum (the X39/X60 integer nano-log
  discipline) — deterministic under any partial-agg order and replayable
  by the DuckDB oracle on operand-identical doubles.
- selection is ORDER BY + LIMIT = TakeOrderedAndProject: a size-k heap
  per partition and a driver merge, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.ngram import char_ngrams, normalize_for_scoring
from .perplexity import NGRAM_N, OOV_LOGP

__all__ = ["ml_diff_table", "moore_lewis_scores", "moore_lewis_select"]

_INF = float("inf")


def ml_diff_table(lm_in: DataFrame, lm_out: DataFrame) -> DataFrame:
    """-> (lang, ngram, _dn BIGINT): the per-gram nano-quantized
    cross-entropy-difference contribution
    dn = round((logp_out - logp_in) * 1e9), each side backed off to
    OOV_LOGP where the gram is unseen (full-outer over the two LM vocabs).
    Rows with dn == 0 are dropped — a scoring-join miss coalesces to the
    identical 0 contribution, and the broadcast stays minimal. Both inputs
    are train_char_lm frames (lang, ngram, logp); output is vocab-scale by
    construction — broadcast it."""
    i = lm_in.select(
        "lang", "ngram", F.col("logp").alias("_li")
    )
    # fresh exprIds on one side: both LMs usually derive from the SAME scan,
    # and a shared-lineage join after window aggregation trips
    # [INTERNAL_ERROR] conflicting references (CLAUDE.md; qdigest fix)
    o = lm_out.select("lang", "ngram", F.col("logp").alias("_lo"))
    o = o.toDF(*o.columns)
    d = i.join(o, ["lang", "ngram"], "full_outer")
    oov = F.lit(OOV_LOGP)
    dn = F.round(
        (F.coalesce(F.col("_lo"), oov) - F.coalesce(F.col("_li"), oov))
        * F.lit(1e9)
    ).cast("long")
    return d.select("lang", "ngram", dn.alias("_dn")).filter(F.col("_dn") != 0)


def moore_lewis_scores(
    docs: DataFrame,
    lm_in: DataFrame,
    lm_out: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    id_col: str = "doc_id",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """-> (id_col, lang, *keep_cols, n_grams, ml_nano, ml_score): the
    Moore-Lewis score per document. ml_score = H_in - H_out in log10 units
    per gram (LOWER = more in-domain); ml_nano its exact BIGINT numerator.

    Class semantics (the engine-wide perplexity convention,
    operators/perplexity.py): no scoreable text after normalization ->
    NULL; language absent from EITHER model -> +inf (unrankable — a
    missing-lang doc would otherwise score an artificially neutral 0 with
    every gram backed off on both sides); otherwise the finite score."""
    diff = ml_diff_table(lm_in, lm_out)
    diff = diff.toDF(*diff.columns)  # docs shares the LMs' scan lineage too
    norm = F.coalesce(normalize_for_scoring(F.col(text_col)), F.lit(""))
    grams = docs.select(
        F.col(id_col),
        F.col(lang_col).alias("lang"),
        *[F.col(c) for c in keep_cols],
        F.explode_outer(char_ngrams(norm, NGRAM_N)).alias("ngram"),
    )
    agg = (
        grams.join(F.broadcast(diff), ["lang", "ngram"], "left")
        .groupBy(id_col, "lang", *keep_cols)
        .agg(
            F.count("ngram").cast("long").alias("n_grams"),
            F.sum(F.coalesce(F.col("_dn"), F.lit(0)))
            .cast("long")
            .alias("ml_nano"),
        )
    )
    kin = lm_in.select("lang").distinct().withColumn("_kin", F.lit(True))
    kout = lm_out.select("lang").distinct().withColumn("_kout", F.lit(True))
    kout = kout.toDF(*kout.columns)
    out = agg.join(F.broadcast(kin), "lang", "left").join(
        F.broadcast(kout), "lang", "left"
    )
    score = (
        F.when(F.col("n_grams") == 0, F.lit(None).cast("double"))
        .when(F.col("_kin").isNull() | F.col("_kout").isNull(), F.lit(_INF))
        .otherwise(
            F.col("ml_nano").cast("double") / (F.lit(1e9) * F.col("n_grams"))
        )
    )
    return out.select(
        id_col, "lang", *keep_cols, "n_grams", "ml_nano", score.alias("ml_score")
    )


def moore_lewis_select(
    docs: DataFrame,
    lm_in: DataFrame,
    lm_out: DataFrame,
    k: int,
    text_col: str = "text",
    lang_col: str = "lang",
    id_col: str = "doc_id",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """The k most in-domain documents: ORDER BY (ml_score ASC, id ASC)
    LIMIT k — TakeOrderedAndProject, never a global sort. NULL (no-text)
    sorts last explicitly; +inf (lang rejection) sorts after every finite
    score by IEEE ordering — neither class can be selected ahead of a
    scoreable document."""
    s = moore_lewis_scores(
        docs, lm_in, lm_out, text_col, lang_col, id_col, keep_cols
    )
    return s.orderBy(
        F.col("ml_score").asc_nulls_last(), F.col(id_col).asc()
    ).limit(k)
