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
    bounded-domain contract; pass e.g. ``F.round(expr, 6)``).

    NULL-score rows never histogram: ``n_group`` and the ceil(keep_frac *
    n_group) target count SCOREABLE rows only (same contract as
    ``quantile_bucket_labels``), so NULL scores neither inflate the
    denominator nor pass the gate."""
    if not (0.0 < keep_frac <= 1.0):
        raise ValueError(f"keep_frac must be in (0, 1]: {keep_frac}")
    hist = df.filter(score.isNotNull()).groupBy(score.alias("_s"), group_col).agg(
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


def quantile_bucket_labels(
    df: DataFrame,
    score_col: str,
    cuts: tuple[float, ...] = (1.0 / 3.0, 2.0 / 3.0),
    labels: tuple[str, ...] = ("head", "middle", "tail"),
    group_col: str = "lang",
    label_col: str = "bucket",
) -> DataFrame:
    """Label every row with its per-group quantile band — the CCNet
    head/middle/tail corpus split (Wenzek et al. 2020, arXiv:1911.00359:
    Common-Crawl partitioned per language into thirds by LM perplexity,
    lower = cleaner). Generalized to any ascending ``cuts``.

    Cut k is the SMALLEST score value s in the group with
    ``#(score <= s) >= ceil(cuts[k] * n_group)`` — the ascending mirror of
    ``group_quantile_thresholds`` (same bounded-domain histogram trick: the
    only corpus exchange is the per-(group, score) partial agg; cumulative
    sums run over the bounded value frame, never the corpus; tie-inclusive,
    so re-runs are stable). ``score_col`` must be pre-rounded to fixed
    precision. Rows with NULL score or NULL group drop out (score NULLs
    never histogram; group NULLs drop at the threshold join) — triage both
    upstream if they must be bucketed. Exactly SQL-replayable.
    """
    if len(labels) != len(cuts) + 1:
        raise ValueError("need exactly one more label than cuts")
    if list(cuts) != sorted(cuts) or not all(0.0 < c < 1.0 for c in cuts):
        raise ValueError(f"cuts must be ascending and in (0, 1): {cuts}")
    hist = (
        df.filter(F.col(score_col).isNotNull())
        .groupBy(group_col, score_col)
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    wa = (
        W.partitionBy(group_col)
        .orderBy(F.col(score_col).asc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    h = hist.withColumn("_le", F.sum("_n").over(wa)).withColumn(
        "_tot", F.sum("_n").over(W.partitionBy(group_col))
    )
    thr_cols = [
        F.min(
            F.when(
                F.col("_le")
                >= F.ceil(F.lit(c) * F.col("_tot")).cast("long"),
                F.col(score_col),
            )
        ).alias(f"_cut{k}")
        for k, c in enumerate(cuts)
    ]
    thr = h.groupBy(group_col).agg(*thr_cols)
    label = F.lit(labels[-1])
    for k in range(len(cuts) - 1, -1, -1):
        label = F.when(F.col(score_col) <= F.col(f"_cut{k}"), labels[k]).otherwise(label)
    return (
        df.filter(F.col(score_col).isNotNull())
        .join(F.broadcast(thr), group_col)
        .withColumn(label_col, label)
        .drop(*[f"_cut{k}" for k in range(len(cuts))])
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
    oracle's USING join agrees) and NULL-score rows are excluded from both
    the quantile denominator and the output (``score >= threshold`` is
    never true for NULL); triage NULL groups/scores upstream if they must
    participate. The broadcast assumes bounded group cardinality — one
    threshold row per group."""
    scored = df.withColumn(score_col, score)
    thr = group_quantile_thresholds(scored, F.col(score_col), keep_frac, group_col)
    return scored.join(F.broadcast(thr.drop("n_group")), group_col).filter(
        F.col(score_col) >= F.col("threshold")
    )
