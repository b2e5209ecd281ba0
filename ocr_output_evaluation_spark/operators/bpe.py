"""BPE merge-pair mining — the pair-statistics inner loop of byte-pair-
encoding vocabulary training: count adjacent symbol pairs across the corpus
weighted by word frequency; the top pair is the next merge.

Reference-repo analog: none (the reference consumes OCR text, it doesn't
train tokenizers); part of the training-data operator surface SURVEY §2.13
adds beyond it.

Spark-first shape, and how it holds at 100 TB:
- word frequencies are ONE hash aggregation over exploded tokens,
  partial-aggregated map-side (repeated words collapse before the wire).
- pair statistics run over the DISTINCT-WORD frame, weighted by the word
  counts — the standard BPE-trainer optimization: the expensive explode
  scales with VOCABULARY size (stays in the millions however big the
  corpus gets), not corpus size.
- the merge ranking is a top-k with a total order (count desc, pair asc)
  → TakeOrderedAndProject, no global sort.
- pairs are generated in-row (codegen transform over a sequence of
  substr slices), all positions counted including overlaps — matching the
  common reference implementations' pair-statistics step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.ngram import word_tokens


def word_frequencies(df: DataFrame, text_col: str) -> DataFrame:
    """-> (word, wcount): corpus-wide frequency of each normalized token."""
    return (
        df.select(F.explode(word_tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wcount"))
    )


def merge_pair_counts(words: DataFrame) -> DataFrame:
    """-> (pair, total_count, n_words) over a (word, wcount) frame: each
    adjacent character pair of each distinct word, total_count = pair
    occurrences weighted by word frequency, n_words = distinct words
    containing the pair. Words shorter than 2 chars contribute nothing."""
    pairs = words.select(
        "word",
        "wcount",
        F.explode(
            F.when(
                F.length("word") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.length("word") - 1),
                    lambda i: F.substr(F.col("word"), i, F.lit(2)),
                ),
            )
        ).alias("pair"),
    )
    return pairs.groupBy("pair").agg(
        F.sum("wcount").cast("long").alias("total_count"),
        F.countDistinct("word").cast("long").alias("n_words"),
    )
