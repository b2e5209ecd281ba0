"""Range (interval) join — all (left, right) pairs per key with
``right_val - left_val`` inside ``[lower, upper]``.  The second temporal-join
shape Spark's equi-join syntax lacks (beside the as-of join,
operators/asof.py); a naive ``ON l.k = r.k AND r.v BETWEEN ...`` plans as a
per-key nested loop, O(|L|·|R|) candidates per key.

Banded-bucket form: with band width ``w = upper - lower``, a right value r
matches left values in ``[r - upper, r - lower]`` — an interval of width w —
so bucketing BOTH sides by ``div(v, w)`` means every matching pair shares
one of at most two adjacent left probe buckets (``div(lv + lower, w)`` and
``div(lv + upper, w)``).  The left side is exploded to its (distinct) probe
buckets, the join runs as a plain equi-join on (keys, bucket), and the exact
predicate filters the band edges.  Each pair emerges EXACTLY once (a right
row owns a single bucket; ``array_distinct`` keeps it at most once in the
left's probe list), replication is a fixed ≤2× on the left — not data- or
skew-dependent — and the plan is a shuffled equi-join, never a nested loop.
Reference analog: none — SURVEY §2.3 records that the reference has no
theta/range/as-of joins; this is a rebuild-only training-data-layer operator
(X35), like X21-X33.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["range_join"]


def range_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_val: str,
    right_val: str,
    lower: int,
    upper: int,
    *,
    right_prefix: str = "r_",
) -> DataFrame:
    """Inner range join: every left row paired with every right row sharing
    ``key_cols`` whose ``right_val - left_val`` lies in ``[lower, upper]``
    (integer bounds, inclusive).  Right columns (minus the keys) come back
    ``{right_prefix}``-renamed.  NULL keys/values never match (inner-join
    semantics).  Values may be negative: bucketing uses integer ``div``
    (truncation toward zero — exact at any bigint magnitude, unlike a
    double ``floor(v / w)``), and trunc-div is monotone with
    ``div(a + w, w) - div(a, w) <= 1``, so every value in the width-w match
    interval ``[lv + lower, lv + upper]`` still lands in one of the two
    probe buckets ``div(lv + lower, w)`` / ``div(lv + upper, w)`` on either
    side of zero.
    """
    if upper < lower:
        raise ValueError(f"range_join: upper {upper} < lower {lower}")
    w = max(upper - lower, 1)
    overlap = set(key_cols) & {left_val, right_val}
    if overlap:
        raise ValueError(f"range_join: key/value column overlap: {sorted(overlap)}")

    lv, rv = F.col(left_val), F.col(f"{right_prefix}{right_val}")
    r = right.select(
        *key_cols,
        *[
            F.col(c).alias(f"{right_prefix}{c}")
            for c in right.columns
            if c not in key_cols
        ],
    ).withColumn("_bkt", F.expr(f"div(`{right_prefix}{right_val}`, {w})"))
    l = left.withColumn(
        "_bkt",
        F.explode(
            F.array_distinct(
                F.array(
                    F.expr(f"div(`{left_val}` + {lower}, {w})"),
                    F.expr(f"div(`{left_val}` + {upper}, {w})"),
                )
            )
        ),
    )
    return (
        l.join(r, [*key_cols, "_bkt"])
        .filter((rv - lv >= F.lit(lower)) & (rv - lv <= F.lit(upper)))
        .drop("_bkt")
    )
