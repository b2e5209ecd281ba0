"""As-of (temporal) join — for every left row, the single right row with the
largest right-timestamp at-or-before (or strictly-before) the left timestamp,
per key.  The classic event-attribution / point-in-time-lookup operator that
Spark's join syntax lacks (pandas has ``merge_asof``; DuckDB has native
``ASOF JOIN``, which is exactly what the oracle replays).

Implementation is the scale-correct UNION form, not a join: tag both inputs,
union them, and run ONE running ``last(payload, ignorenulls=True)`` window
per key ordered by (ts, side) — right rows sort before left rows at equal
timestamps for inclusive semantics (after them for strict), so the running
last-non-null payload at each left row IS its as-of match.  Cost profile at
100 TB: a single hash exchange on the key columns and a per-key sort; no
replication of either input, no inequality-join candidate blowup (a naive
``l.ts >= r.ts`` range join is O(|L|·|R|) per key), no per-row Python.
Reference analog: none — SURVEY §2.3 records that the reference has no
theta/range/as-of joins; this is a rebuild-only training-data-layer operator
(X34), like X21-X33.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

__all__ = ["as_of_join"]


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    payload_cols: list[str] | None = None,
    *,
    inclusive: bool = True,
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus ``{prefix}{right_ts}`` and
    ``{prefix}{c}`` for each payload column, taken atomically from the
    matched right row (NULLs when no right row precedes).

    Match rule per key group: the right row with the largest ``right_ts``
    satisfying ``right_ts <= left_ts`` (``inclusive=True``, DuckDB
    ``ASOF JOIN ... ON l.ts >= r.ts``) or ``right_ts < left_ts``
    (``inclusive=False``).  Ties among right rows at the matched timestamp
    resolve deterministically to the one with the LARGEST payload struct
    (lexicographic by ``payload_cols`` order) — pass a unique id first in
    ``payload_cols`` to pin tie-winners explicitly.

    NULL semantics: rows with a NULL key or NULL timestamp on either side
    never match anything (left ones still pass through unmatched) — filter
    upstream if they must participate.
    """
    payload_cols = list(payload_cols or [])
    bad = [c for c in payload_cols if c in left.columns]
    if bad:
        raise ValueError(f"as_of_join: payload columns {bad} collide with left columns")
    reserved = {"_t", "_side", "_pay", "_m"}
    out_names = {f"{prefix}{right_ts}", *(f"{prefix}{c}" for c in payload_cols)}
    bad = [c for c in left.columns if c in reserved or c in out_names]
    if bad:
        raise ValueError(
            f"as_of_join: left columns {bad} collide with internal names "
            f"{sorted(reserved)} or the {prefix!r}-prefixed output columns"
        )

    # Right rows carry their payload in one struct so the window propagates
    # the whole matched row atomically; left rows carry NULL.  A NULL right
    # timestamp would sort into the running frame and poison last(); drop it.
    pay = F.struct(F.col(right_ts).alias("_ts"), *[F.col(c) for c in payload_cols])
    side_right, side_left = (0, 1) if inclusive else (1, 0)
    r_ok = F.col(right_ts).isNotNull()
    for k in key_cols:
        r_ok = r_ok & F.col(k).isNotNull()
    r = (
        right.filter(r_ok)
        .select(
            *key_cols,
            F.col(right_ts).alias("_t"),
            F.lit(side_right).alias("_side"),
            pay.alias("_pay"),
            *[F.lit(None).cast(left.schema[c].dataType).alias(c)
              for c in left.columns if c not in key_cols],
        )
    )
    l = left.select(
        *key_cols,
        F.col(left_ts).alias("_t"),
        F.lit(side_left).alias("_side"),
        F.lit(None).cast(r.schema["_pay"].dataType).alias("_pay"),
        *[c for c in left.columns if c not in key_cols],
    )
    w = (
        W.partitionBy(*key_cols)
        .orderBy(F.col("_t").asc(), F.col("_side").asc(), F.col("_pay").asc_nulls_first())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    matched = (
        r.unionByName(l.select(*r.columns))
        .withColumn("_m", F.last("_pay", ignorenulls=True).over(w))
        .filter(F.col("_side") == side_left)
    )
    out: list[Column] = [F.col(c) for c in left.columns]
    out.append(F.col("_m._ts").alias(f"{prefix}{right_ts}"))
    out.extend(F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in payload_cols)
    return matched.select(*out)
