"""Grouped statistics operators (SURVEY.md §2.4, A1-A17).

All stats are expressed as native aggregate expressions so Spark's
partial+final hash aggregation applies — the map-side combine the reference
never had (it reduced everything on the driver,
/root/reference/parallel_processor.py:288).

Exact percentiles use F.percentile (linear interpolation — matches pandas
``quantile`` at /root/reference/stats_calculator.py:82-86 and DuckDB
``quantile_cont``), NOT percentile_approx: value-identical oracle results
are part of the correctness gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.column import Column

from ..functions.valid import valid

_INF = float("inf")

PCTS = (0.10, 0.25, 0.75, 0.90, 0.95)


def moment_aggs(c: Column | str, prefix: str) -> list[Column]:
    """A1: mean/median/stddev(sample, ddof=1 — pandas .std() default,
    /root/reference/stats_calculator.py:75-79)/min/max over valid values."""
    v = valid(c)
    return [
        F.count(v).alias(f"n_{prefix}"),
        F.mean(v).alias(f"mean_{prefix}"),
        F.median(v).alias(f"median_{prefix}"),
        F.stddev_samp(v).alias(f"std_{prefix}"),
        F.min(v).alias(f"min_{prefix}"),
        F.max(v).alias(f"max_{prefix}"),
    ]


def percentile_aggs(c: Column | str, prefix: str, pcts=PCTS) -> list[Column]:
    """A2: exact percentiles (p10/p25/p75/p90/p95 per
    /root/reference/stats_calculator.py:82-86)."""
    v = valid(c)
    return [
        F.percentile(v, F.lit(p)).alias(f"p{int(p * 100)}_{prefix}") for p in pcts
    ]


def threshold_bucket_aggs(
    c: Column | str, prefix: str, hi: float = 0.9, lo: float = 0.7
) -> list[Column]:
    """A3: counts + percentages of values >= hi / [lo, hi) / < lo
    (/root/reference/stats_calculator.py:89-98)."""
    v = valid(c)
    n = F.count(v)
    n_hi = F.count(F.when(v >= hi, 1))
    n_med = F.count(F.when((v >= lo) & (v < hi), 1))
    n_lo = F.count(F.when(v < lo, 1))
    pct = lambda x: F.when(n > 0, x.cast("double") / n.cast("double") * 100.0)  # noqa: E731
    return [
        n_hi.alias(f"n_high_{prefix}"),
        n_med.alias(f"n_med_{prefix}"),
        n_lo.alias(f"n_low_{prefix}"),
        pct(n_hi).alias(f"pct_high_{prefix}"),
        pct(n_med).alias(f"pct_med_{prefix}"),
        pct(n_lo).alias(f"pct_low_{prefix}"),
    ]


def validity_class_aggs(c: Column | str, prefix: str) -> list[Column]:
    """A7: NaN-class vs inf-class counters — the two distinct missing-value
    classes of /root/reference/perplexity_scorer.py:230-243. Reads the RAW
    column (valid() would erase the distinction)."""
    raw = (F.col(c) if isinstance(c, str) else c).cast("double")
    n_nan = F.count(F.when(F.isnan(raw), 1))
    n_inf = F.count(F.when(~F.isnan(raw) & (F.abs(raw) == F.lit(_INF)), 1))
    n_all = F.count(raw) + F.count(F.when(raw.isNull(), 1))
    n_valid = F.count(valid(raw))
    return [
        n_nan.alias(f"n_nan_{prefix}"),
        n_inf.alias(f"n_inf_{prefix}"),
        n_valid.alias(f"n_valid_{prefix}"),
        F.when(n_all > 0, n_valid.cast("double") / n_all.cast("double") * 100.0).alias(
            f"pct_valid_{prefix}"
        ),
    ]


def regression_aggs(x: Column | str, y: Column | str) -> list[Column]:
    """A15/A16: Pearson correlation + least-squares slope/intercept
    (/root/reference/analyze_buckets.py:198,209-214) — closed-form aggregates,
    one pass, no iteration."""
    xv, yv = valid(x), valid(y)
    both = xv.isNotNull() & yv.isNotNull()
    xb, yb = F.when(both, xv), F.when(both, yv)
    return [
        F.corr(xb, yb).alias("pearson_r"),
        F.regr_slope(yb, xb).alias("slope"),
        F.regr_intercept(yb, xb).alias("intercept"),
        F.regr_count(yb, xb).alias("n_points"),
    ]


def group_stats(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    prefix: str | None = None,
    with_percentiles: bool = True,
    with_buckets: bool = False,
    with_validity: bool = False,
) -> DataFrame:
    """One-stop grouped stats: groupBy(keys).agg(A1[,A2][,A3][,A7])."""
    prefix = prefix or value_col
    aggs = moment_aggs(value_col, prefix)
    if with_percentiles:
        aggs += percentile_aggs(value_col, prefix)
    if with_buckets:
        aggs += threshold_bucket_aggs(value_col, prefix)
    if with_validity:
        aggs += validity_class_aggs(value_col, prefix)
    return df.groupBy(*keys).agg(*aggs)


def approx_group_stats(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    distinct_cols: list[str] | None = None,
    pcts=PCTS,
    accuracy: int = 10000,
    rsd: float = 0.02,
) -> DataFrame:
    """Sketch-based grouped stats — the 100 TB alternate to group_stats.

    Exact percentiles (F.percentile) shuffle every raw value to its group;
    at corpus scale the sketches are the default: percentile_approx
    (KLL-style, mergeable, error <= 1/accuracy of rank) and
    approx_count_distinct (HyperLogLog++, relative stddev `rsd`), both
    partial+final mergeable so map-side combine still applies.

    NOT oracle-checkable and NEVER fed to the driver gate or the manifest
    (CLAUDE.md invariant): sketch outputs are engine-specific. Accuracy is
    pinned by tolerance tests against the exact forms instead
    (tests/test_stats_parity.py)."""
    aggs = [
        F.count(F.col(value_col)).alias("n"),
        *[
            F.percentile_approx(F.col(value_col), float(p), accuracy).alias(
                f"approx_p{int(p * 100)}"
            )
            for p in pcts
        ],
    ]
    for c in distinct_cols or []:
        aggs.append(F.approx_count_distinct(F.col(c), rsd).alias(f"approx_nd_{c}"))
    return df.groupBy(*keys).agg(*aggs)
