"""X73 — corpus n-gram diversity: distinct-n ratios and set-based
self-overlap per corpus segment. distinct-n (Li et al. 2016, "A
Diversity-Promoting Objective Function for Neural Conversation Models")
is the share of n-gram INSTANCES that are distinct TYPES — the standard
cheap mode-collapse / templated-text signal; self-overlap is the
deterministic set-based analog of self-BLEU (Zhu et al. 2018, Texygen):
per document, the fraction of its distinct n-grams that also occur in at
least one OTHER document of the corpus, averaged per segment. High
self-overlap + low distinct-n flags boilerplate-heavy segments a
training-data pipeline should dedup or downweight before mixing.
Reference analog: none — rebuild-only operator (SURVEY §2.13).

Spark-first shape, and how it holds at 100 TB:
- ONE corpus pass: explode -> map-side-combined (gram, doc, segment) hash
  agg collapsing instances to the per-doc TYPE frame (the one shuffle the
  overlap metric minimally requires). Everything else derives from that
  type frame: (segment, gram) counts for distinct-n, gram document-
  frequency for the overlap join (same key as the type frame — the join
  is co-located), per-doc and per-segment folds.
- the short-doc census reads ONLY the segment column (column pruning — no
  second text parse); n_docs_short = total docs minus gram-bearing docs.
- per-doc overlap ratios are ppm-quantized BIGINTs before the segment
  mean, so every cross-row sum is an exact integer sum —
  order-independent and DuckDB-replayable.
- documents with no n-grams (fewer than n tokens after normalization)
  carry no diversity signal and are excluded from both legs; they are
  reported in ``n_docs_short`` so the segment totals stay auditable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.ngram import word_ngrams

__all__ = ["diversity_report_frame"]


def diversity_report_frame(
    docs: DataFrame,
    n: int = 2,
    segment_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    cache: bool = True,
) -> DataFrame:
    """-> (segment, n_docs, n_docs_short, total_grams, distinct_grams,
    distinct_ratio, mean_self_overlap) per segment, word-``n``-gram units:

    - distinct_ratio    = distinct gram types / gram instances (6dp)
    - mean_self_overlap = mean over the segment's gram-bearing docs of
      |{doc's distinct grams with corpus doc-frequency >= 2}| / |{doc's
      distinct grams}| (per-doc ppm-quantized, 6dp mean)

    Document frequency counts DOCUMENTS (type-level), corpus-wide — a
    gram repeated only inside one doc does not make that doc overlap.
    Segments where no document yields an n-gram are absent from the
    output (both ratios are undefined there).

    ``cache`` persists the per-doc type frame, which fans into three plan
    branches (distinct-n counts, document frequency, the overlap join) —
    unpersisted it would replay the corpus explode per branch (the
    minhash signature-frame contract; never unpersisted here, the result
    is lazy)."""
    base = docs.select(
        F.col(id_col).alias("_id"),
        F.col(segment_col).alias("segment"),
        word_ngrams(F.col(text_col), n).alias("_gs"),
    )
    # per-doc TYPE frame with instance counts: the single corpus shuffle
    gdi = (
        base.select("_id", "segment", F.explode("_gs").alias("gram"))
        .groupBy("gram", "_id", "segment")
        .agg(F.count(F.lit(1)).cast("long").alias("_k"))
    )
    if cache:
        gdi = gdi.persist()
    seg_counts = (
        gdi.groupBy("segment", "gram")
        .agg(F.sum("_k").cast("long").alias("_c"))
        .groupBy("segment")
        .agg(
            F.sum("_c").cast("long").alias("total_grams"),
            F.count(F.lit(1)).cast("long").alias("distinct_grams"),
        )
    )
    df_docs = gdi.groupBy("gram").agg(
        F.count(F.lit(1)).cast("long").alias("_df")
    )
    per_doc = (
        gdi.join(df_docs, "gram")
        .groupBy("_id", "segment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("_n_types"),
            F.sum(F.when(F.col("_df") >= 2, 1).otherwise(0))
            .cast("long")
            .alias("_hits"),
        )
    )
    ppm = F.round(
        F.col("_hits").cast("double")
        / F.col("_n_types").cast("double")
        * F.lit(1e6)
    ).cast("long")
    seg_overlap = (
        per_doc.select("segment", ppm.alias("_ppm"))
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("_ppm").cast("long").alias("_ppm_sum"),
        )
    )
    # column-pruned scan: only segment_col is read for the total census
    totals = docs.groupBy(F.col(segment_col).alias("segment")).agg(
        F.count(F.lit(1)).cast("long").alias("_n_total")
    )
    out = seg_counts.join(seg_overlap, "segment").join(
        F.broadcast(totals), "segment"
    )
    return out.select(
        "segment",
        "n_docs",
        (F.col("_n_total") - F.col("n_docs")).alias("n_docs_short"),
        "total_grams",
        "distinct_grams",
        F.round(
            F.col("distinct_grams").cast("double")
            / F.col("total_grams").cast("double"),
            6,
        ).alias("distinct_ratio"),
        F.round(
            F.col("_ppm_sum").cast("double")
            / (F.lit(1e6) * F.col("n_docs").cast("double")),
            6,
        ).alias("mean_self_overlap"),
    )
