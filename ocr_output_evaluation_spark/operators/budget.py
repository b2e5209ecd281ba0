"""Token-budget sampling: take documents, in deterministic hash order,
until a per-group token budget is filled.

The corpus-sizing primitive of a training-data build ("2T tokens total,
at most X per language"): the kept set must be (a) deterministic — no
RNG, stable across re-runs and resumes — and (b) unbiased — hash order
is a uniform permutation, so the kept prefix is a uniform sample of the
group. The reference's analog is the fixed-n stratified sample of
challenging pages (/root/reference/select_challenging_images.py:96-133);
this operator is that sample re-cut by a token budget instead of a row
count.

Scale design — the naive form is a trap. "Cumulative token sum over
(PARTITION BY lang ORDER BY md5(key))" puts an ENTIRE language in one
window partition: at 10^12 documents the 'en' partition is a single
multi-TB sort-and-scan task. The two-phase form here exploits that the
hash bucket is a PREFIX of the ordering key, so bucket-major order IS
global hash order:

  1. bucket = first 2 hex chars of md5key (256 buckets/group);
  2. per-(group, bucket) token totals — one partial-agg shuffle of a
     tiny frame (n_groups x 256 rows);
  3. running prefix over that tiny frame (window over <=256 rows per
     group — driver-scale work, stays distributed);
  4. broadcast the prefix frame back onto the corpus and take rows whose
     (bucket_prefix + intra-bucket running sum) fits the budget. The
     intra-bucket window partitions on (group, bucket) — 1/256th of a
     group per partition, and only ~1 boundary bucket per group actually
     straddles the cut.

Result: identical keep-set to the naive global window (the oracle
replays the naive form), but the widest window partition shrinks by the
bucket fan-out, and the only full-corpus exchange is the one the window
needs anyway — partitioned 256x finer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def _order_key(key: Column) -> Column:
    return F.md5(key.cast("string"))


def token_budget_take(
    df: DataFrame,
    tokens: Column,
    key: Column | str,
    budget: int | Column,
    group_col: str = "lang",
) -> DataFrame:
    """Mark each row kept/dropped under a per-``group_col`` token budget.

    Keep rule: order the group's rows by (md5(key), key); a row is kept
    iff the running token total INCLUDING the row is <= budget (classic
    take-while — a row that would overflow the budget is dropped, as is
    everything after it in hash order). Adds columns ``_tokens`` (long)
    and ``kept`` (boolean); callers filter or aggregate.

    Contract notes: rows with a NULL ``group_col`` drop out at the prefix
    join (both engines agree — the oracle's USING join does the same);
    triage NULL groups upstream if they must be budgeted. The broadcast of
    the prefix frame assumes BOUNDED group cardinality (langs, sources:
    n_groups x 256 rows); for a high-cardinality group key (e.g. domain)
    swap the broadcast hint for a plain shuffle join — the two-phase
    structure is unchanged.
    """
    key = F.col(key) if isinstance(key, str) else key
    budget = F.lit(budget) if isinstance(budget, int) else budget
    ok = _order_key(key)
    d = df.withColumn("_tokens", tokens.cast("long")).withColumn(
        "_ok", ok
    ).withColumn("_bkt", F.substring(F.col("_ok"), 1, 2))

    # Phase 2: tiny per-(group, bucket) totals frame.
    per_bucket = d.groupBy(group_col, "_bkt").agg(
        F.sum("_tokens").alias("_bkt_tokens")
    )
    # Phase 3: exclusive prefix sum over buckets in bucket order
    # (window over <=256 rows per group — bounded regardless of corpus size).
    wb = (
        W.partitionBy(group_col)
        .orderBy("_bkt")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    prefix = per_bucket.withColumn(
        "_bkt_prefix", F.coalesce(F.sum("_bkt_tokens").over(wb), F.lit(0))
    ).select(group_col, "_bkt", "_bkt_prefix")

    # Phase 4: intra-bucket running sum (inclusive), bucket-local window.
    wi = (
        W.partitionBy(group_col, "_bkt")
        .orderBy("_ok", key)
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        d.join(F.broadcast(prefix), [group_col, "_bkt"])
        .withColumn(
            "kept", F.col("_bkt_prefix") + F.sum("_tokens").over(wi) <= budget
        )
        .drop("_ok", "_bkt", "_bkt_prefix")
    )
