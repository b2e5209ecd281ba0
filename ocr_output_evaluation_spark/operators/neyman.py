"""X79 — Neyman-allocation stratified sampling: the optimal-allocation
rule of classical survey sampling (Neyman 1934, "On the two different
aspects of the representative method"): given a total budget of k
samples over strata h, allocate a_h proportional to N_h * sigma_h — more
samples where the stratum is bigger OR more variable — which minimizes
the variance of the stratified mean estimator. This is the principled
version of "sample 50k docs per language": a quality-audit or eval-set
builder over a 10^12-doc corpus should oversample the heterogeneous
strata, and Neyman says exactly by how much.
Reference analog: none — rebuild-only operator (SURVEY §2.13).

Exactness discipline (everything the allocation decides is INTEGER):
- the stratum weight N_h * sigma_h equals sqrt(N_h * sum(v^2) - sum(v)^2)
  EXACTLY (population sigma = sqrt(n*S2 - S1^2)/n, so the n_h factors
  cancel) — one sqrt over an exact BIGINT, micro-quantized to a BIGINT
  weight. (The BIGINT products bound value*sqrt(n) < 2^31; wider inputs
  move to DECIMAL(38,0) — documented contract.)
- the largest-remainder apportionment (Hamilton's method) runs on exact
  integers: base_h = (k * w_h) div W, remainder rank on (k * w_h) mod W
  with a stratum-name tiebreak — no float ever crosses a row boundary,
  so the allocation is order-independent and DuckDB-replayable.

Spark-first shape, and how it holds at 100 TB:
- stratum moments are ONE map-side-combined groupBy (three BIGINT cells
  per stratum); the apportionment runs on the STRATUM-scale frame under
  a single-partition window (tiny by construction).
- selection ranks each stratum by the deterministic md5 order with a
  per-stratum window; at extreme scale swap the rank for the X31
  bucket-prefix two-phase selection (same hash key, same result) — the
  allocation math above is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["neyman_allocation", "neyman_sample"]


def neyman_allocation(
    df: DataFrame,
    stratum_col: str,
    value_col: str,
    k: int,
) -> DataFrame:
    """-> (stratum, n_docs, w_micro, alloc): Neyman allocation of ``k``
    samples over the strata of ``stratum_col`` by the variability of
    INTEGER-valued ``value_col``. w_micro = round(1e6 * sqrt(n*S2 -
    S1^2)) — the exact-integer N_h*sigma_h weight; alloc by largest
    remainder (exact ties broken by stratum name). Zero-variance strata
    get weight 0 (they need one sample in theory; the caller can floor
    — documented, not silently applied). ``k`` must be >= 0; alloc can
    exceed a tiny stratum's size (selection then truncates)."""
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    v = F.col(value_col).cast("long")
    m = df.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(v).cast("long").alias("_s1"),
        F.sum(v * v).cast("long").alias("_s2"),
    )
    num = F.col("n_docs") * F.col("_s2") - F.col("_s1") * F.col("_s1")
    w_micro = F.round(F.sqrt(num.cast("double")) * F.lit(1e6)).cast("long")
    m = m.select("stratum", "n_docs", w_micro.alias("w_micro"))
    w = Window.partitionBy()  # stratum-scale frame
    tot = F.sum("w_micro").over(w)
    kw = F.lit(k) * F.col("w_micro")
    m = m.select(
        "stratum",
        "n_docs",
        "w_micro",
        F.when(tot > 0, (kw - kw % tot) / tot)
        .otherwise(F.lit(0))
        .cast("long")
        .alias("_base"),
        F.when(tot > 0, kw % tot).otherwise(F.lit(0)).cast("long").alias("_rem"),
    )
    leftover = F.lit(k) - F.sum("_base").over(w)
    rn = F.row_number().over(
        Window.partitionBy().orderBy(
            F.col("_rem").desc(), F.col("stratum").asc()
        )
    )
    m = m.select(
        "stratum",
        "n_docs",
        "w_micro",
        "_base",
        (rn <= leftover).cast("long").alias("_extra"),
        "_rem",
    )
    # a zero-weight stratum must never receive a remainder seat
    alloc = F.col("_base") + F.when(
        F.col("w_micro") > 0, F.col("_extra")
    ).otherwise(F.lit(0))
    return m.select("stratum", "n_docs", "w_micro", alloc.alias("alloc"))


def neyman_sample(
    df: DataFrame,
    stratum_col: str,
    value_col: str,
    k: int,
    id_col: str = "doc_id",
    salt: str = "ney",
) -> DataFrame:
    """The allocated sample itself: per stratum, the ``alloc`` first rows
    in the deterministic md5(``id_col`` || ':' || salt) order (truncated
    to the stratum's size when alloc exceeds it). -> original columns +
    (alloc, sample_rank)."""
    allocs = neyman_allocation(df, stratum_col, value_col, k).select(
        F.col("stratum").alias(stratum_col), "alloc"
    )
    key = F.md5(
        F.concat_ws(":", F.col(id_col).cast("string"), F.lit(salt))
    )
    rn = F.row_number().over(
        Window.partitionBy(stratum_col).orderBy(key.asc(), F.col(id_col).asc())
    )
    ranked = df.withColumn("sample_rank", rn).join(
        F.broadcast(allocs), stratum_col
    )
    return ranked.filter(F.col("sample_rank") <= F.col("alloc"))
