"""X75 — Poisson bootstrap confidence intervals: the massive-data
resampling method (Chamandy, Muralidharan, Najmi & Naidu 2012,
"Estimating uncertainty for massive data streams", Google; also the
"online bootstrap" of Oza & Russell 2001). A classical bootstrap draws n
rows WITH replacement per replicate — impossible to coordinate across a
cluster; the Poisson bootstrap replaces each row's multinomial count
with an independent Poisson(1) weight, turning every replicate into a
pure PER-ROW function that needs no global coordination: replicate r's
estimate is just a weighted aggregate. Here the Poisson draw is the
engine's deterministic (md5-hash32 + 0.5)/2^32 uniform pushed through a
truncated inverse-CDF table (no RNG — reproducible across cluster sizes
and DuckDB-replayable, the CLAUDE.md determinism rule).
Reference analog: none — rebuild-only operator (SURVEY §2.13).

Spark-first shape, and how it holds at 100 TB:
- ONE corpus pass, NO replicate explode: all R replicate weights are
  computed as per-row codegen columns and summed in a single
  map-side-combined groupBy — the shuffle carries one row per group with
  2R+2 BIGINT cells, whatever n. (The naive explode-by-R form multiplies
  the corpus R times; the column form is the published method's whole
  point — each replicate is a per-row function, so they all share the
  one scan.)
- weighted sums are exact BIGINTs (integer weights x integer values),
  so replicate estimates are deterministic exact-operand doubles under
  any partial-agg order.
- the replicate table unpivots GROUP-scale rows (R x |groups|) and the
  rank window partitions by group — tiny by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["POISSON1_CDF", "poisson_bootstrap_ci"]

# Truncated Poisson(1) inverse-CDF cutoffs: P(X <= k) for k = 0..6, 10dp
# literals shared verbatim with the oracle SQL; u >= P(<=6) draws 7 (the
# standard truncation — mass beyond 7 is ~1e-5 of a replicate).
POISSON1_CDF = (
    0.3678794412,
    0.7357588823,
    0.9196986029,
    0.9810118431,
    0.9963401532,
    0.9994058152,
    0.9999167588,
)


def _poisson_weight(u):
    w = F.lit(7)
    for k in range(len(POISSON1_CDF) - 1, -1, -1):
        w = F.when(u < F.lit(POISSON1_CDF[k]), F.lit(k)).otherwise(w)
    return w


def poisson_bootstrap_ci(
    df: DataFrame,
    value_col: str,
    group_col: str,
    id_col: str = "doc_id",
    n_replicates: int = 20,
    lo_rank: int = 2,
    hi_rank: int = 19,
    salt: str = "pb",
) -> DataFrame:
    """-> (group, n_docs, mean_value, boot_lo, boot_hi): per group, the
    exact mean of ``value_col`` (which must be INTEGER-valued — sums stay
    exact BIGINTs) and a Poisson-bootstrap interval: the ``lo_rank``-th /
    ``hi_rank``-th smallest of ``n_replicates`` weighted-mean replicate
    estimates (defaults: ranks 2 and 19 of 20 — a ~90% percentile
    interval). Replicate ties break on the replicate index, so the
    interval is a total-order statistic.

    Replicate r's weight for a row is Poisson(1) via the deterministic
    uniform md5(``id_col`` || ':' || salt || r); a replicate whose
    weights sum to zero in a group (only possible for tiny groups) is
    dropped and the ranks clamp to the surviving replicate count."""
    if not 1 <= lo_rank <= hi_rank <= n_replicates:
        raise ValueError(
            f"need 1 <= lo_rank <= hi_rank <= n_replicates, got "
            f"{lo_rank}/{hi_rank}/{n_replicates}"
        )
    v = F.col(value_col).cast("long")
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(v).cast("long").alias("_sv"),
    ]
    for r in range(n_replicates):
        h32 = F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.col(id_col).cast("string"),
                        F.lit(f"{salt}{r}"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        u = (h32.cast("double") + F.lit(0.5)) / F.lit(4294967296.0)
        w = _poisson_weight(u)
        aggs.append(F.sum(w * v).cast("long").alias(f"_s{r}"))
        aggs.append(F.sum(w).cast("long").alias(f"_c{r}"))
    g = df.groupBy(F.col(group_col).alias("group")).agg(*aggs)
    reps = g.select(
        "group",
        "n_docs",
        "_sv",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        F.col(f"_s{r}").alias("sr"),
                        F.col(f"_c{r}").alias("cr"),
                    )
                    for r in range(n_replicates)
                ]
            )
        ).alias("_rep"),
    ).select(
        "group", "n_docs", "_sv", "_rep.r", "_rep.sr", "_rep.cr"
    ).filter(F.col("cr") > 0)
    est = F.col("sr").cast("double") / F.col("cr").cast("double")
    w_rank = Window.partitionBy("group").orderBy(est.asc(), F.col("r").asc())
    ranked = reps.select(
        "group",
        "n_docs",
        "_sv",
        est.alias("_est"),
        F.row_number().over(w_rank).alias("_rn"),
        F.count(F.lit(1)).over(Window.partitionBy("group")).alias("_nr"),
    )
    lo = F.least(F.lit(lo_rank), F.col("_nr"))
    hi = F.least(F.lit(hi_rank), F.col("_nr"))
    picked = ranked.groupBy("group", "n_docs", "_sv", "_nr").agg(
        F.max(F.when(F.col("_rn") == lo, F.col("_est"))).alias("_lo"),
        F.max(F.when(F.col("_rn") == hi, F.col("_est"))).alias("_hi"),
    )
    return picked.select(
        "group",
        "n_docs",
        F.round(
            F.col("_sv").cast("double") / F.col("n_docs").cast("double"), 6
        ).alias("mean_value"),
        F.round(F.col("_lo"), 6).alias("boot_lo"),
        F.round(F.col("_hi"), 6).alias("boot_hi"),
    )
