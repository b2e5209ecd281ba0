"""Gap-based sessionization — batch twin of the streaming session window.

Beyond-reference training-pipeline operator (the reference has no event
stream): group a user's events into sessions separated by inactivity gaps
longer than ``gap``. Classic two-window formulation, fully native:

  1. lag(ts) over (user ORDER BY ts)        -> previous event time
  2. is_new_session = gap exceeded or first -> 0/1 flag
  3. sum(flag) over (user ORDER BY ts ROWS UNBOUNDED PRECEDING)
                                             -> session ordinal per user

Both windows share ONE (partition, order) spec object, so Spark plans a
single shuffle + sort and the cumulative sum streams over the sorted run —
and a future tiebreak change cannot desynchronize the two windows. Hot
users are bounded by their own event counts — per-user state never crosses
executors (contrast with groupBy-collect sessionizers that materialize a
user's whole history in one task's memory as an array).

Time arithmetic is integer microseconds (unix_micros ≡ DuckDB epoch_us), so
gap comparisons and durations are exact and oracle-hash-stable — no float
epoch round-tripping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

_US_COL = "_us"


def _sessionized(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_minutes: float,
    order_tiebreak: str | None,
) -> DataFrame:
    """Internal: rows + ``session_id`` + the ``_us`` working column."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    with_us = df.withColumn(_US_COL, us)
    order = [F.col(_US_COL).asc()] + (
        [F.col(order_tiebreak).asc()] if order_tiebreak else []
    )
    win = W.partitionBy(user_col).orderBy(*order)
    prev = F.lag(_US_COL).over(win)
    gap_us = int(gap_minutes * 60_000_000)
    new_flag = F.when(
        prev.isNull() | ((F.col(_US_COL) - prev) > gap_us), 1
    ).otherwise(0)
    run = win.rowsBetween(W.unboundedPreceding, W.currentRow)
    return with_us.withColumn("session_id", F.sum(new_flag).over(run))


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
    return _sessionized(df, user_col, ts_col, gap_minutes, order_tiebreak).drop(_US_COL)


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    order_tiebreak: str | None = "event_id",
) -> DataFrame:
    """One row per (user, session): event count, bounds (unix micros), span."""
    s = _sessionized(df, user_col, ts_col, gap_minutes, order_tiebreak)
    return s.groupBy(user_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(_US_COL).alias("session_start_us"),
        F.max(_US_COL).alias("session_end_us"),
        F.round((F.max(_US_COL) - F.min(_US_COL)) / 1_000_000.0, 6).alias("duration_s"),
    )
