"""Per-row statistics over ARRAY<double> columns — shuffle-free.

The reference computes per-volume stats by holding one volume's rows in a
pandas DataFrame (/root/reference/stats_calculator.py:73-99). The naive Spark
translation explodes the array and shuffles by document key — at 10^12 docs
that shuffle dominates. Since each document's values already live in one row,
every moment/percentile is computable with array expressions inside
whole-stage codegen: zero shuffle, zero Python.

Percentiles use numpy/pandas 'linear' interpolation semantics
(q = (n-1)*p; v = a[lo] + frac*(a[hi]-a[lo])) to match pandas ``quantile``
(/root/reference/stats_calculator.py:82-86) and DuckDB ``quantile_cont``.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.column import Column


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def array_mean(c: Column | str) -> Column:
    c = _col(c)
    return F.when(
        F.size(c) > 0,
        F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x) / F.size(c),
    )


def array_percentile(c: Column | str, p: float) -> Column:
    """Exact linear-interpolated percentile of a (non-empty) double array."""
    c = _col(c)
    s = F.array_sort(c)
    n = F.size(s)
    # rank index (0-based, fractional)
    q = (n.cast("double") - F.lit(1.0)) * F.lit(float(p))
    lo = F.floor(q).cast("int")
    hi = F.ceil(q).cast("int")
    frac = q - lo.cast("double")
    v_lo = F.element_at(s, lo + 1)
    v_hi = F.element_at(s, hi + 1)
    return F.when(n > 0, v_lo + frac * (v_hi - v_lo))


def array_median(c: Column | str) -> Column:
    return array_percentile(c, 0.5)


def array_stddev_samp(c: Column | str) -> Column:
    """Sample stddev (ddof=1) — pandas ``.std()`` default
    (/root/reference/stats_calculator.py:77). NULL for n < 2."""
    c = _col(c)
    n = F.size(c).cast("double")
    mean = array_mean(c)
    ssq = F.aggregate(c, F.lit(0.0), lambda acc, x: acc + (x - mean) * (x - mean))
    return F.when(n > 1, F.sqrt(ssq / (n - F.lit(1.0))))
