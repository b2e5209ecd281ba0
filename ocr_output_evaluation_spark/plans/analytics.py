"""The rollup/exploration layer — EP2 + EP3 analogs (SURVEY.md §3).

EP2 (/root/reference/analyze_by_metadata.py + metadata_loader.py): union the
per-system stats tables, tag literals, broadcast-left-join dimensions, bucket
with a CASE chain, roll up along categorical dimensions.

EP3 (/root/reference/explore_stats.py): register SQL views and serve canned +
ad-hoc SQL. Here the "DuckDB" is Catalyst: same SQL strings, a real
distributed optimizer underneath.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.valid import valid


def combine_and_enrich(
    stats_tables: dict[str, DataFrame],
    dims: list[tuple[DataFrame, str]],
) -> DataFrame:
    """U1 + F14 + J1: unionByName(allowMissingColumns) the per-source stats
    frames, tag each with its source literal, broadcast-left-join each
    dimension (/root/reference/metadata_loader.py:109-146)."""
    tagged = []
    for name, df in stats_tables.items():
        tagged.append(df.withColumn("source_system", F.lit(name)))
    combined = tagged[0]
    for t in tagged[1:]:
        combined = combined.unionByName(t, allowMissingColumns=True)
    for dim_df, key in dims:
        combined = combined.join(F.broadcast(dim_df), key, "left")
    return combined


def quality_bucket(col_conf: str, col_ppl: str):
    """F7: the CASE-chain bucket rule that replaces the reference's row-apply
    UDF (/root/reference/analyze_buckets.py:56-80 — df.apply(axis=1), the
    anti-pattern the rebuild eliminates)."""
    conf = valid(col_conf)
    ppl = valid(col_ppl)
    return (
        F.when(conf.isNull() | ppl.isNull(), "unscored")
        .when((conf >= 0.9) & (ppl < 1000), "high_quality")
        .when((conf >= 0.7) & (ppl < 5000), "medium_quality")
        .when((conf < 0.7) & (ppl >= 5000), "low_quality")
        .otherwise("mixed_signals")
    )


def rollup_by(
    df: DataFrame, keys: list[str], conf_col: str = "avg_mean_conf", ppl_col: str = "mean_ppl"
) -> DataFrame:
    """A11/A12: count + mean/median + p33/p66 per dimension value, ordered by
    mean perplexity (/root/reference/analyze_by_metadata.py:93-118)."""
    ppl = valid(ppl_col)
    return (
        df.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(valid(conf_col)).alias("avg_conf"),
            F.avg(ppl).alias("avg_ppl"),
            F.median(ppl).alias("median_ppl"),
            F.percentile(ppl, F.lit(0.33)).alias("p33_ppl"),
            F.percentile(ppl, F.lit(0.66)).alias("p66_ppl"),
        )
        .orderBy(F.col("avg_ppl").asc_nulls_last(), *[F.col(k) for k in keys])
    )


def pivot_matrix(
    df: DataFrame,
    row_key: str,
    col_key: str,
    value_col: str,
    min_count: int = 5,
    top_rows: int = 15,
) -> DataFrame:
    """A13: the heatmap matrix (/root/reference/visualize.py:728-750):
    groupBy(row,col) → mean + count, HAVING count >= min_count, pivot columns,
    order rows by row-mean, head top_rows."""
    cells = (
        df.groupBy(row_key, col_key)
        .agg(F.avg(valid(value_col)).alias("v"), F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
    )
    wide = cells.groupBy(row_key).pivot(col_key).agg(F.first("v"))
    data_cols = [c for c in wide.columns if c != row_key]
    row_mean = sum(F.coalesce(F.col(c), F.lit(0.0)) for c in data_cols) / F.lit(len(data_cols))
    return wide.orderBy(row_mean.asc(), F.col(row_key)).limit(top_rows)


def register_analytics_views(spark: SparkSession, tables: dict[str, str]) -> None:
    """EP3: parquet → temp views; canned SQL from explore_stats.py runs as-is
    modulo DuckDB-isms (`!= 'inf'` string coercion → `!= double('inf')`)."""
    for name, path in tables.items():
        spark.read.parquet(path).createOrReplaceTempView(name)


CANNED_SUMMARY_SQL = """
SELECT
  count(*)                                          AS n_groups,
  sum(n_docs)                                       AS total_docs,
  avg(avg_mean_conf)                                AS overall_mean_conf,
  avg(CASE WHEN mean_ppl != double('inf') THEN mean_ppl END) AS overall_mean_ppl
FROM group_metrics
"""
