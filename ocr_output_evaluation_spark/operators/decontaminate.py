"""Benchmark decontamination: n-gram-overlap contamination scoring of a
training corpus against an evaluation-benchmark text set.

The published recipe (the GPT-3/Gopher/Llama "13-gram overlap" family, a
standard step in every large-scale training-data pipeline): hash every
overlapping word n-gram of the benchmark texts into a set, then score each
training document by the fraction of its distinct n-grams that appear in
that set; documents above a threshold are quarantined before training.
Reference-repo analog: none (the reference scores OCR confidence, not
training contamination) — this module is part of the training-data operator
surface SURVEY §2.13 adds beyond the reference.

Spark-first shape, and how it holds at 100 TB:
- the benchmark side is SMALL by definition (eval suites are MBs, the
  corpus is TBs): its distinct n-gram keys are computed once and
  broadcast — the corpus-side join is a BroadcastHashJoin, the corpus
  never shuffles for membership.
- the corpus side explodes to distinct (doc, gram-key) pairs and
  aggregates back to one row per doc (hits, total). That exchange carries
  one fixed-width row per document — inherent, because the OUTPUT of
  decontamination is per-document verdicts — and partial aggregation
  collapses each doc's grams map-side before the wire.
- keys are md5 prefixes here so the whole pipeline replays in ANSI SQL
  (the driver's DuckDB oracle gate); a production run swaps `_gram_key`
  to xxhash64 for 8-byte keys — the established md5-twin pattern of
  minhash_pairs_md5 / simhash_pairs_md5 (operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.ngram import word_ngrams


def _gram_key(gram):
    # md5 prefix: fixed-width, ANSI-SQL-replayable (DuckDB md5 is identical).
    # Production twin: F.xxhash64(gram) — 8-byte keys, Spark-only.
    return F.substring(F.md5(gram), 1, 16)


def benchmark_ngram_keys(
    bench: DataFrame, text_col: str, n: int = 4
) -> DataFrame:
    """-> (_gram) DISTINCT n-gram keys of the benchmark texts. Callers
    broadcast this (eval benchmarks are tiny relative to any corpus)."""
    return (
        bench.select(F.explode(word_ngrams(F.col(text_col), n)).alias("_g"))
        .select(_gram_key(F.col("_g")).alias("_gram"))
        .distinct()
    )


def contamination_scores(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 4,
) -> DataFrame:
    """Per-document contamination vs the benchmark set.

    -> (id_col, n_grams, n_hits, overlap) where n_grams counts the doc's
    DISTINCT n-grams (published checks count a repeated n-gram once),
    n_hits of them appear in the benchmark, overlap = hits/grams (NULL for
    docs with < n tokens — nothing to test, ANSI-safe guarded division).
    """
    # per-doc dedup happens IN-ROW (array_distinct before the explode), not
    # as a global distinct — saves a full (doc, gram) exchange; the only
    # corpus shuffle left is the per-doc partial-agg merge
    grams = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(word_ngrams(F.col(text_col), n))).alias("_g"),
    ).select(id_col, _gram_key(F.col("_g")).alias("_gram"))
    keys = benchmark_ngram_keys(bench, text_col, n).withColumn(
        "_hit", F.lit(1)
    )
    scored = (
        grams.join(F.broadcast(keys), "_gram", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("_hit").alias("n_hits"),
        )
    )
    # left join back so zero-gram docs (< n tokens) keep a row too
    base = docs.select(id_col)
    out = base.join(scored, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_grams"), F.lit(0)).alias("n_grams"),
        F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
        F.when(
            F.coalesce(F.col("n_grams"), F.lit(0)) > 0,
            F.col("n_hits") / F.col("n_grams"),
        ).alias("overlap"),
    )
    return out
