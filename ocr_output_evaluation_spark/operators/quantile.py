"""Exact per-group quantile thresholding without a global sort.

The quality-gate primitive ("keep the top 30% of each language by
quality score") computed EXACTLY — this engine bans approximate
percentiles anywhere a result feeds the oracle gate, and the reference's
quality analytics are exact-quantile throughout
(/root/reference/stats_calculator.py:84-88 uses np.percentile;
analyze_buckets.py:60-82 bands on exact value cuts).

Scale design — two traps avoided:

  * ``percent_rank() OVER (PARTITION BY lang ORDER BY score)`` puts each
    whole language in ONE window partition: a multi-TB single-task sort
    at 10^12 rows.
  * ``percentile(score, q)`` as an aggregate buffers the group's values;
    exact percentile aggregation is O(group) memory per key.

Instead the score is a ROUNDED (fixed-precision) value, which makes its
value domain bounded and tiny (quality scores at 6dp: <= 10^6+1 distinct
values, in practice a few thousand). Exact quantiles over a bounded
domain need only the VALUE HISTOGRAM:

  1. per-(group, score) counts — one partial-agg shuffle that collapses
     the corpus to the histogram (map-side combine does most of it);
  2. descending cumulative counts over the histogram frame (window over
     the bounded per-group value set, never the corpus);
  3. threshold = the LARGEST score whose >=-score population still
     reaches the target count (tie-inclusive: every row AT the threshold
     keeps, so re-runs are stable and the kept fraction is >= q);
  4. broadcast the (group, threshold) frame back and filter.

The only corpus-wide exchange is the histogram partial-agg; everything
ordered happens on the bounded frame. The result is bit-equal to the
naive global-sort definition, which is what the DuckDB oracle replays.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def group_quantile_thresholds(
    df: DataFrame,
    score: Column,
    keep_frac: float,
    group_col: str = "lang",
) -> DataFrame:
    """(group, threshold, n_group) — the largest score value per group
    such that rows with ``score >= threshold`` number >= ceil(keep_frac *
    n_group) (any smaller score also qualifies, so max picks the true cut). ``score`` must already be rounded to fixed precision (the
    bounded-domain contract; pass e.g. ``F.round(expr, 6)``)."""
    if not (0.0 < keep_frac <= 1.0):
        raise ValueError(f"keep_frac must be in (0, 1]: {keep_frac}")
    hist = df.groupBy(group_col, score.alias("_s")).agg(
        F.count(F.lit(1)).alias("_n")
    )
    wd = (
        W.partitionBy(group_col)
        .orderBy(F.col("_s").desc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    wg = W.partitionBy(group_col)
    h = hist.withColumn("_ge", F.sum("_n").over(wd)).withColumn(
        "_tot", F.sum("_n").over(wg)
    )
    target = F.ceil(F.lit(keep_frac) * F.col("_tot")).cast("long")
    return (
        h.filter(F.col("_ge") >= target)
        .groupBy(group_col)
        .agg(
            F.max("_s").alias("threshold"),
            F.max("_tot").alias("n_group"),
        )
    )


def quantile_gate(
    df: DataFrame,
    score: Column,
    keep_frac: float,
    group_col: str = "lang",
    score_col: str = "score",
) -> DataFrame:
    """Rows of ``df`` whose score clears the per-group exact quantile
    threshold, with ``score_col`` and ``threshold`` attached.

    Rows with a NULL ``group_col`` drop out at the threshold join (the
    oracle's USING join agrees); triage NULL groups upstream if they must
    be gated. The broadcast assumes bounded group cardinality — one
    threshold row per group."""
    scored = df.withColumn(score_col, score)
    thr = group_quantile_thresholds(scored, F.col(score_col), keep_frac, group_col)
    return scored.join(F.broadcast(thr.drop("n_group")), group_col).filter(
        F.col(score_col) >= F.col("threshold")
    )
