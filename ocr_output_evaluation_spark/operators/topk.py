"""Top-k operators (SURVEY.md §2.5 W1, §2.6 O1-O4, §2.4 A6/A13/A14).

Deterministic tiebreaks everywhere: the correctness gate hashes values, so
``ORDER BY cnt DESC`` alone (ties broken by partition order) would be flaky.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    k: int,
    tiebreak_cols: list[str] | None = None,
    descending: bool = True,
) -> DataFrame:
    """W1: row_number over (group, order desc, tiebreak asc) <= k.

    Spark plans this as a single shuffle by group + per-partition sort; with
    AQE, skewed groups are split. For global top-k use ``ordered_limit``
    (TakeOrderedAndProject — no full sort)."""
    oc = F.col(order_col).desc() if descending else F.col(order_col).asc()
    tb = [F.col(c).asc() for c in (tiebreak_cols or [])]
    w = W.partitionBy(*group_cols).orderBy(oc, *tb)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def top_langs_pivoted(
    df: DataFrame, group_col: str, langs_col: str, k: int = 3
) -> DataFrame:
    """A6: the reference's top-3-languages-per-volume pivot
    (/root/reference/stats_calculator.py:137-148): explode the language list,
    count per (group, lang), rank with a deterministic tiebreak (count desc,
    lang asc), and pivot ranks 1..k into ``top_lang_{i}``/``top_lang_{i}_count``
    columns via conditional aggregation (no second shuffle)."""
    counts = (
        df.select(group_col, F.explode(langs_col).alias("lang"))
        .groupBy(group_col, "lang")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = W.partitionBy(group_col).orderBy(F.col("cnt").desc(), F.col("lang").asc())
    ranked = counts.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
    aggs = []
    for i in range(1, k + 1):
        aggs.append(
            F.max(F.when(F.col("rank") == i, F.col("lang"))).alias(f"top_lang_{i}")
        )
        aggs.append(
            F.max(F.when(F.col("rank") == i, F.col("cnt"))).alias(f"top_lang_{i}_count")
        )
    return ranked.groupBy(group_col).agg(*aggs)


def ordered_limit(
    df: DataFrame, order_cols: list, n: int
) -> DataFrame:
    """O1/O2: ORDER BY ... LIMIT n — Spark executes TakeOrderedAndProject
    (per-partition heap + driver merge of n rows), never a full sort."""
    return df.orderBy(*order_cols).limit(n)


def value_counts(df: DataFrame, col: str) -> DataFrame:
    """A14: frequency distribution with pct-of-total
    (/root/reference/metadata_loader.py:160-187). The total comes from a
    window over the aggregated (small) frame, not a second scan."""
    counts = df.groupBy(col).agg(F.count(F.lit(1)).alias("cnt"))
    total = W.partitionBy()
    return counts.select(
        col,
        "cnt",
        F.round(F.col("cnt") / F.sum("cnt").over(total) * 100.0, 6).alias("pct"),
    )
