"""Corpus mixing — deterministic source-weighted downsampling to a target
mixture (the "data mixing weights" step of LLM corpus assembly: each source
gets a target share of the output corpus; over-represented sources are
down-sampled, under-represented ones kept whole).

Reference-repo analog: none (the reference evaluates a fixed corpus); part
of the training-data surface SURVEY §2.13 adds beyond it.

Spark-first shape, and how it holds at 100 TB:
- per-source counts are ONE tiny aggregation (cardinality = number of
  sources, dozens); the per-source keep-quota frame broadcasts back onto
  the corpus.
- two selection forms with identical targets:
  * exact-quota (this module's `apply_mixture`): row_number per source in
    md5 hash order, keep rank <= quota — exact output counts, fully
    ANSI-SQL-replayable (the oracle twin). The per-source window sorts
    each source's rows once; at extreme scale that sort is the cost of
    exactness.
  * threshold (production): keep rows whose 32-bit hash fraction
    < quota/count — scan-speed, no window, no shuffle beyond the count
    aggregation, output size binomially distributed around the quota.
    Same md5/xxhash64 twin split as operators/sampling.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def source_quotas(
    df: DataFrame,
    source_col: str,
    weight: F.Column,
    target_frac: float,
) -> DataFrame:
    """-> (source_col, n_docs, weight, quota): per-source keep quotas for a
    target corpus of floor(target_frac * total) documents split
    proportionally to `weight` (an expression over source_col), capped at
    each source's actual size. Tiny frame — callers broadcast it."""
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_docs"))
    counts = counts.withColumn("weight", weight)
    tot = counts.agg(
        F.sum("n_docs").alias("_total"), F.sum("weight").alias("_sum_w")
    )
    return counts.crossJoin(F.broadcast(tot)).select(
        source_col,
        "n_docs",
        "weight",
        F.least(
            F.col("n_docs"),
            F.floor(
                F.col("weight")
                / F.col("_sum_w")
                * F.floor(F.col("_total") * F.lit(target_frac))
            ),
        )
        .cast("long")
        .alias("quota"),
    )


def apply_mixture(
    df: DataFrame,
    source_col: str,
    id_col: str,
    quotas: DataFrame,
) -> DataFrame:
    """Exact-quota selection: the first `quota` documents of each source in
    md5(id) hash order (id tiebreak). Deterministic and replayable in any
    ANSI engine; see module docstring for the windowless production twin."""
    w = W.partitionBy(source_col).orderBy(
        F.md5(F.col(id_col).cast("string")), id_col
    )
    return (
        df.join(F.broadcast(quotas.select(source_col, "quota")), source_col)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= F.col("quota"))
        .drop("_rn", "quota")
    )


def temperature_quotas(
    df: DataFrame,
    source_col: str,
    alpha: float = 0.3,
    target_frac: float = 0.5,
) -> DataFrame:
    """X68 — temperature-scaled mixture quotas: the published multilingual
    sampling rule p_i ∝ n_i^alpha (exponential smoothing of source shares —
    mBERT's exponent-0.7 smoothing; XLM-R alpha=0.3, Conneau et al. 2020
    §3; mT5 alpha=0.3, Xue et al. 2021 §3.1), which boosts low-resource
    sources and caps dominant ones relative to proportional mixing
    (alpha=1 reproduces source_quotas with weight=n_docs; alpha=0 is
    uniform). -> (source_col, n_docs, raw_frac, temp_frac, quota), tiny
    frame — callers broadcast it into apply_mixture.

    Exactness discipline (the oracle gate's): weights are NANO-INTEGER
    w_i = round(n_i^alpha * 1e9) (pow parity is a proven cross-engine
    twin), the weight sum is exact BIGINT, and the quota is one integral
    division floor(w_i * budget / sum_w) computed in DECIMAL(38,0) so the
    product cannot overflow at 100 TB source counts (n_i ~ 1e12 ->
    w_i ~ 4e12, budget ~ 1e12: the BIGINT product would wrap; DECIMAL38
    holds it with 13 digits to spare). Fractions divide once at the end.
    Reference analog: none — rebuild-only operator (SURVEY §2.13)."""
    counts = df.groupBy(source_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    wn = F.round(F.pow(F.col("n_docs"), F.lit(alpha)) * F.lit(1e9)).cast("long")
    counts = counts.withColumn("_wn", wn)
    tot = counts.agg(
        F.sum("n_docs").cast("long").alias("_total"),
        F.sum("_wn").cast("long").alias("_sumw"),
    )
    return counts.crossJoin(F.broadcast(tot)).select(
        source_col,
        "n_docs",
        F.round(F.col("n_docs") / F.col("_total"), 6).alias("raw_frac"),
        F.round(F.col("_wn") / F.col("_sumw"), 6).alias("temp_frac"),
        F.least(
            F.col("n_docs"),
            F.expr(
                "CAST((CAST(_wn AS DECIMAL(38, 0))"
                f"      * CAST(FLOOR(_total * {target_frac!r}) AS DECIMAL(38, 0)))"
                "      DIV CAST(_sumw AS DECIMAL(38, 0)) AS BIGINT)"
            ),
        ).alias("quota"),
    )
