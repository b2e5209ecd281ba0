"""X74 — n-gram novelty curve: vocabulary-growth / first-occurrence
novelty over a deterministic document order. For each n-gram TYPE the
corpus position (bucket) of its FIRST occurrence is found; per bucket the
curve reports how many never-seen-before types appear, the cumulative
type count, and the novelty ratio (new types / gram instances). This is
the n-gram novelty measure of McCoy et al. 2021 ("How much do language
models copy?", RAVEN — supervised-vs-novel n-gram analysis) applied to a
corpus over its ingest order, and the empirical Heaps'-law growth curve:
a segment whose curve flattens early is saturated boilerplate (dedup
it); a curve that keeps climbing still adds vocabulary worth keeping.
Reference analog: none — rebuild-only operator (SURVEY §2.13).

Spark-first shape, and how it holds at 100 TB:
- first occurrence per type is ONE explode -> map-side-combined
  min(doc_id) hash agg (gram-TYPE-scale output, order-exact integer min).
- buckets come from the doc-id span (one 1-row min/max agg broadcast
  back via crossJoin — the established query-vector pattern), never from
  a global sort or row_number: bucket(id) = floor((id - min) * B /
  (max - min + 1)) is a pure codegen expression.
- per-bucket census (docs, instances) is a second map-side-combined agg;
  the cumulative sum runs on the BUCKET-scale frame (B rows) under a
  single-partition window — tiny by construction.
- everything is exact integers until the final 6dp ratio; no float
  crosses a partial-aggregation boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.ngram import word_ngrams

__all__ = ["novelty_curve"]


def novelty_curve(
    docs: DataFrame,
    n: int = 2,
    n_buckets: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """-> (bucket, n_docs, instances, new_types, cum_types, novelty_ratio)
    for ``n_buckets`` equal-width ``id_col`` ranges in id order:

    - new_types     = n-gram types whose corpus-wide FIRST doc falls in
      the bucket (ties broken by the id order itself: min(doc_id))
    - cum_types     = running total of new_types — the Heaps curve
    - novelty_ratio = new_types / instances (6dp), NULL for a bucket
      whose documents yield no n-grams

    Buckets with no documents are absent; the id span is taken from the
    data (one broadcast 1-row agg), so the curve is defined for any id
    distribution without a global sort."""
    base = docs.select(
        F.col(id_col).alias("_id"),
        word_ngrams(F.col(text_col), n).alias("_gs"),
    )
    span = base.agg(
        F.min("_id").alias("_mn"), F.max("_id").alias("_mx")
    )

    def bucket(c):
        width = F.col("_mx") - F.col("_mn") + F.lit(1)
        return F.least(
            F.lit(n_buckets - 1),
            F.floor(
                (c - F.col("_mn")).cast("double")
                * F.lit(float(n_buckets))
                / width.cast("double")
            ),
        ).cast("long")

    grams = base.select("_id", F.explode("_gs").alias("gram"))
    first = grams.groupBy("gram").agg(F.min("_id").alias("_first"))
    new_types = (
        first.crossJoin(F.broadcast(span))
        .groupBy(bucket(F.col("_first")).alias("bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("new_types"))
    )
    census = (
        base.select("_id", F.size("_gs").cast("long").alias("_ni"))
        .crossJoin(F.broadcast(span))
        .groupBy(bucket(F.col("_id")).alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("_ni").cast("long").alias("instances"),
        )
    )
    joined = census.join(F.broadcast(new_types), "bucket", "left").select(
        "bucket",
        "n_docs",
        "instances",
        F.coalesce(F.col("new_types"), F.lit(0)).cast("long").alias(
            "new_types"
        ),
    )
    w = Window.partitionBy().orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return joined.select(
        "bucket",
        "n_docs",
        "instances",
        "new_types",
        F.sum("new_types").over(w).cast("long").alias("cum_types"),
        F.when(
            F.col("instances") != 0,
            F.round(
                F.col("new_types").cast("double")
                / F.col("instances").cast("double"),
                6,
            ),
        ).alias("novelty_ratio"),
    )
