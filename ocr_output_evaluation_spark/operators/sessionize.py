"""Gap-based sessionization — batch twin of the streaming session window.

Beyond-reference training-pipeline operator (the reference has no event
stream): group a user's events into sessions separated by inactivity gaps
longer than ``gap``. Classic two-window formulation, fully native:

  1. lag(ts) over (user ORDER BY ts)        -> previous event time
  2. is_new_session = gap exceeded or first -> 0/1 flag
  3. sum(flag) over (user ORDER BY ts ROWS UNBOUNDED PRECEDING)
                                             -> session ordinal per user

Both windows share the same (partition, order) spec, so Spark plans ONE
shuffle + one sort; the cumulative sum is streamed over the sorted run.
Hot users are bounded by their own event counts — per-user state never
crosses executors (contrast with groupBy-collect sessionizers that
materialize a user's whole history in one task's memory as an array).

Time arithmetic is integer microseconds (unix_micros ≡ DuckDB epoch_us), so
gap comparisons and durations are exact and oracle-hash-stable — no float
epoch round-tripping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    order_tiebreak: str | None = "event_id",
) -> DataFrame:
    """Attach ``session_id`` (per-user ordinal, 1-based) to every event.

    ``order_tiebreak`` makes same-timestamp orderings deterministic (the
    oracle gate hashes values)."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    order = [us.asc()] + ([F.col(order_tiebreak).asc()] if order_tiebreak else [])
    w = W.partitionBy(user_col).orderBy(*order)
    with_us = df.withColumn("_us", us)
    prev = F.lag("_us").over(
        W.partitionBy(user_col).orderBy(
            F.col("_us").asc(),
            *([F.col(order_tiebreak).asc()] if order_tiebreak else []),
        )
    )
    gap_us = int(gap_minutes * 60_000_000)
    new_flag = F.when(prev.isNull() | ((F.col("_us") - prev) > gap_us), 1).otherwise(0)
    run = W.partitionBy(user_col).orderBy(
        F.col("_us").asc(),
        *([F.col(order_tiebreak).asc()] if order_tiebreak else []),
    ).rowsBetween(W.unboundedPreceding, W.currentRow)
    return with_us.withColumn("session_id", F.sum(new_flag).over(run))


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    order_tiebreak: str | None = "event_id",
) -> DataFrame:
    """One row per (user, session): event count, bounds (unix micros), span."""
    s = sessionize(df, user_col, ts_col, gap_minutes, order_tiebreak)
    return (
        s.groupBy(user_col, "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("_us").alias("session_start_us"),
            F.max("_us").alias("session_end_us"),
            F.round((F.max("_us") - F.min("_us")) / 1_000_000.0, 6).alias("duration_s"),
        )
    )
