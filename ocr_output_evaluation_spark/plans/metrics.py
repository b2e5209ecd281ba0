"""Per-document and per-group quality metrics (EP1's stats layer, SURVEY.md §2.4).

doc_metrics: one row per document — confidence distribution stats computed
*inside the row* from the token_confs array (functions/arrays.py: array_sort +
aggregate expressions — no explode, no shuffle; the 10^12-doc win over the
naive explode+groupBy(url) translation), plus n-gram perplexity.

group_metrics: per-lang / per-domain rollups with salted aggregation for the
Zipf-hot domains, top-3 language pivots and confidence histograms — the
analogs of /root/reference/stats_calculator.py:73-148 + analyze_by_metadata.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions import (
    array_mean,
    array_median,
    array_percentile,
    array_stddev_samp,
    bpe_ish_token_count,
    valid_arr,
)
from ..operators.perplexity import with_perplexity

_INF = float("inf")


def doc_metrics(
    spark: SparkSession,
    extracted: DataFrame,
    confidences: DataFrame,
    lm: DataFrame,
) -> DataFrame:
    """extracted ⟕ token_confidences (equi-join on url) → per-row array stats
    + perplexity. The join shuffles both sides by url hash once; everything
    after is map-only."""
    joined = extracted.join(confidences, "url", "left")
    raw = F.col("token_confs")
    v = valid_arr(raw)
    rawd = F.transform(raw, lambda x: x.cast("double"))
    n_nan = F.size(F.filter(rawd, lambda x: x.isNotNull() & F.isnan(x)))
    n_inf = F.size(
        F.filter(rawd, lambda x: x.isNotNull() & ~F.isnan(x) & (F.abs(x) == F.lit(_INF)))
    )
    scored = with_perplexity(spark, joined, lm, text_col="extracted_text")
    return scored.select(
        "url",
        "domain",
        "lang",
        F.coalesce(F.length("extracted_text").cast("long"), F.lit(0)).alias("n_chars"),
        F.coalesce(bpe_ish_token_count(F.col("extracted_text")), F.lit(0)).alias("n_tokens"),
        F.coalesce(F.size(v), F.lit(0)).cast("long").alias("n_confs"),
        array_mean(v).alias("mean_conf"),
        array_median(v).alias("median_conf"),
        array_stddev_samp(v).alias("std_conf"),
        F.array_min(v).alias("min_conf"),
        F.array_max(v).alias("max_conf"),
        array_percentile(v, 0.10).alias("p10_conf"),
        array_percentile(v, 0.25).alias("p25_conf"),
        array_percentile(v, 0.75).alias("p75_conf"),
        array_percentile(v, 0.90).alias("p90_conf"),
        array_percentile(v, 0.95).alias("p95_conf"),
        F.size(F.filter(v, lambda x: x >= 0.9)).cast("long").alias("n_high_conf"),
        F.size(F.filter(v, lambda x: (x >= 0.7) & (x < 0.9))).cast("long").alias("n_med_conf"),
        F.size(F.filter(v, lambda x: x < 0.7)).cast("long").alias("n_low_conf"),
        F.coalesce(n_nan, F.lit(0)).cast("long").alias("n_nan_conf"),
        F.coalesce(n_inf, F.lit(0)).cast("long").alias("n_inf_conf"),
        "perplexity",
        # extraction error carried through so group rollups can count real
        # failures (without this the n_errors branch in group_metrics is dead
        # and every rollup claims zero errors)
        "error",
        "extraction_version",
    )


def group_metrics(docs: DataFrame, keys: list[str]) -> DataFrame:
    """Rollups over doc_metrics by lang/domain (A11/A12 analog). Perplexity's
    NULL-vs-inf classes are counted, then stats run on the valid subset."""
    from ..functions.valid import valid
    from ..operators.stats import moment_aggs, percentile_aggs, validity_class_aggs

    return docs.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum("n_tokens").alias("total_tokens"),
        F.avg("n_chars").alias("avg_chars"),
        F.avg(valid("mean_conf")).alias("avg_mean_conf"),
        *moment_aggs("perplexity", "ppl"),
        *percentile_aggs("perplexity", "ppl", (0.10, 0.90)),
        *validity_class_aggs("perplexity", "ppl"),
        F.count("error").alias("n_errors")
        if "error" in docs.columns
        else F.lit(0).alias("n_errors"),
    )
