from .histogram import histogram
from .salted import salted_group_stats
from .sampling import band_filter_with_fallback, deterministic_sample, per_group_sample
from .stats import (
    group_stats,
    moment_aggs,
    percentile_aggs,
    regression_aggs,
    threshold_bucket_aggs,
    validity_class_aggs,
)
from .topk import ordered_limit, top_k_per_group, top_langs_pivoted, value_counts

__all__ = [
    "histogram",
    "salted_group_stats",
    "deterministic_sample",
    "per_group_sample",
    "band_filter_with_fallback",
    "group_stats",
    "moment_aggs",
    "percentile_aggs",
    "regression_aggs",
    "threshold_bucket_aggs",
    "validity_class_aggs",
    "ordered_limit",
    "top_k_per_group",
    "top_langs_pivoted",
    "value_counts",
]
