"""NaN / ±inf / NULL triage — the engine's single shared normalizer.

The reference runs ``astype(float64).replace([inf,-inf], nan).dropna()``
before every statistic (~20 call sites, e.g.
/root/reference/stats_calculator.py:66-68, analyze_by_metadata.py:38,45),
because it keeps NaN ("no scoreable text") and inf ("LM rejected") as
*distinct* missing-value classes (/root/reference/perplexity_scorer.py:230-243).

Spark aggregates skip NULL but *propagate* NaN, so the rebuild maps both
junk classes to NULL before any stat — exactly once, here — while validity
*counters* read the raw column (operators/stats.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.column import Column

_INF = float("inf")


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def valid(c: Column | str) -> Column:
    """NULL/NaN/±inf -> NULL; everything else cast to double.

    The cast mirrors the reference's float16->float64 overflow defense
    (/root/reference/stats_calculator.py:66-68)."""
    c = _col(c).cast("double")
    return F.when(c.isNull() | F.isnan(c) | (F.abs(c) == F.lit(_INF)), F.lit(None)).otherwise(c)


def valid_arr(c: Column | str) -> Column:
    """Element-wise valid() for ARRAY<numeric>: drop NaN/±inf/NULL elements.

    Used for per-document array stats (functions/arrays.py) so a document's
    confidence distribution is computed without exploding — no shuffle."""
    c = _col(c)
    return F.filter(
        F.transform(c, lambda x: x.cast("double")),
        lambda x: x.isNotNull() & ~F.isnan(x) & (F.abs(x) != F.lit(_INF)),
    )
