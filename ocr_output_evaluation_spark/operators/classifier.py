"""In-engine quality/language classifier training — full-batch logistic
regression by a fixed number of unrolled gradient steps, entirely as
DataFrame aggregations (the GPT-3/CCNet-style "train a linear quality
filter on cheap features, apply it at scan speed" pipeline step).

Reference-repo analog: none (the reference consumes precomputed OCR
confidences); part of the training-data surface SURVEY §2.13 adds beyond it.

Spark-first shape, and how it holds at 100 TB:
- each gradient step is ONE aggregation over the feature frame — the
  per-row error terms partial-sum map-side and only k+1 scalars cross the
  wire (textbook distributed full-batch GD: the gradient is an
  all-reduce). The weight vector is a 1-row frame broadcast back; nothing
  is ever collected to the driver.
- `steps` is a fixed unroll, so the whole training run is one declarative
  plan; callers cache the feature frame so the k passes rescan columns,
  not recompute the feature expressions.
- determinism across engines: gradients are ROUNDED TO 9 DECIMALS before
  the weight update. Float addition order differs between Spark's partial
  aggregation and a sequential engine by ~1e-16 relative; the 9 dp grain
  absorbs it, so DuckDB's replay of the same unrolled steps produces
  bit-identical weights and the whole training loop is oracle-checkable
  (the float-rounding analog of the md5/xxhash64 twin pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.column import Column

GRAD_ROUND_DP = 9


def sigmoid(z: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def margin(feature_cols: list[str]) -> Column:
    """b + sum_i w{i} * x_i over a frame carrying both weights and
    features (weight columns: b, w1..wk)."""
    z = F.col("b")
    for i, c in enumerate(feature_cols, 1):
        z = z + F.col(f"w{i}") * F.col(c)
    return z


def logreg_train(
    feats: DataFrame,
    feature_cols: list[str],
    label_col: str = "y",
    lr: float = 0.5,
    steps: int = 3,
) -> DataFrame:
    """-> 1-row (b, w1..wk) weight frame after `steps` full-batch gradient
    steps from zero init on the mean log-loss gradient
    g_j = avg((sigmoid(z) - y) * x_j), each rounded to GRAD_ROUND_DP
    before the update (see module docstring)."""
    spark = feats.sparkSession
    w = spark.range(1).select(
        F.lit(0.0).alias("b"),
        *[F.lit(0.0).alias(f"w{i}") for i in range(1, len(feature_cols) + 1)],
    )
    for _ in range(steps):
        joined = feats.crossJoin(F.broadcast(w))
        err = sigmoid(margin(feature_cols)) - F.col(label_col)
        g = joined.agg(
            F.round(F.avg(err), GRAD_ROUND_DP).alias("gb"),
            *[
                F.round(F.avg(err * F.col(c)), GRAD_ROUND_DP).alias(f"g{i}")
                for i, c in enumerate(feature_cols, 1)
            ],
        )
        w = w.crossJoin(F.broadcast(g)).select(
            (F.col("b") - F.lit(lr) * F.col("gb")).alias("b"),
            *[
                (F.col(f"w{i}") - F.lit(lr) * F.col(f"g{i}")).alias(f"w{i}")
                for i in range(1, len(feature_cols) + 1)
            ],
        )
    return w


def logreg_score(
    df: DataFrame, weights: DataFrame, feature_cols: list[str]
) -> DataFrame:
    """df + (_p): predicted probability under the trained weights —
    broadcast join, scan-speed application."""
    return df.crossJoin(F.broadcast(weights)).withColumn(
        "_p", sigmoid(margin(feature_cols))
    )
