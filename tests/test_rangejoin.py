"""Range join (X35, operators/rangejoin.py): brute-force parity (exactly-once
pair emission, inclusive band edges, bucket boundaries), validation, and the
no-nested-loop plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_output_evaluation_spark.operators.rangejoin import range_join


@pytest.mark.parametrize("lower,upper", [(0, 10), (3, 3), (0, 0), (2, 7)])
def test_range_join_matches_bruteforce_exactly_once(spark, lower, upper):
    """Values chosen to land on and around div-bucket boundaries for every
    parametrized band; the multiset of emitted pairs must equal the
    brute-force set (each pair exactly once — the array_distinct guarantee)."""
    left = [(i, "a" if i % 3 else "b", v) for i, v in enumerate(
        [0, 1, 6, 7, 9, 10, 11, 13, 20, 21, 29, 30, 31, 70])]
    right = [(100 + i, "a" if i % 2 else "b", v) for i, v in enumerate(
        [0, 3, 7, 10, 12, 13, 17, 20, 23, 30, 33, 40, 73])]
    ldf = spark.createDataFrame(left, "lid long, k string, v long")
    rdf = spark.createDataFrame(right, "rid long, k string, v long")
    got = sorted(
        (r.lid, r.r_rid)
        for r in range_join(ldf, rdf, ["k"], "v", "v", lower, upper).collect()
    )
    want = sorted(
        (lid, rid)
        for lid, lk, lv in left
        for rid, rk, rv in right
        if lk == rk and lower <= rv - lv <= upper
    )
    assert got == want, (lower, upper)


@pytest.mark.parametrize("lower,upper", [(0, 10), (-7, 7), (-10, -3), (-3, -3)])
def test_range_join_negative_values_and_bands(spark, lower, upper):
    """Trunc-div bucketing with values straddling zero (pre-1970 epochs) and
    negative band bounds: brute-force parity, exactly-once emission. Pins the
    docstring claim that div's truncation toward zero still covers both probe
    buckets for negatives (monotone, endpoint buckets <=1 apart)."""
    vals = [-31, -30, -29, -21, -13, -11, -10, -9, -7, -1, 0, 1, 7, 10, 11, 30]
    left = [(i, "a" if i % 3 else "b", v) for i, v in enumerate(vals)]
    right = [(100 + i, "a" if i % 2 else "b", v) for i, v in enumerate(
        [-33, -30, -23, -17, -13, -12, -10, -7, -3, 0, 3, 7, 12, 20, 33])]
    ldf = spark.createDataFrame(left, "lid long, k string, v long")
    rdf = spark.createDataFrame(right, "rid long, k string, v long")
    got = sorted(
        (r.lid, r.r_rid)
        for r in range_join(ldf, rdf, ["k"], "v", "v", lower, upper).collect()
    )
    want = sorted(
        (lid, rid)
        for lid, lk, lv in left
        for rid, rk, rv in right
        if lk == rk and lower <= rv - lv <= upper
    )
    assert got == want, (lower, upper)


def test_range_join_nulls_and_validation(spark):
    ldf = spark.createDataFrame(
        [(0, "a", 5), (1, None, 5), (2, "a", None)], "lid long, k string, v long"
    )
    rdf = spark.createDataFrame(
        [(9, "a", 6), (8, None, 6), (7, "a", None)], "rid long, k string, v long"
    )
    got = [(r.lid, r.r_rid) for r in range_join(ldf, rdf, ["k"], "v", "v", 0, 5).collect()]
    assert got == [(0, 9)]  # NULL keys/values never match
    with pytest.raises(ValueError, match="upper"):
        range_join(ldf, rdf, ["k"], "v", "v", 5, 0)
    with pytest.raises(ValueError, match="overlap"):
        range_join(ldf, rdf, ["v"], "v", "v", 0, 5)


def test_range_join_plan_is_equi_join_not_nested_loop(spark, sf_dir):
    """The 100 TB rationale: the banded form must plan as a shuffled/broadcast
    EQUI-join on (key, bucket) — never BroadcastNestedLoopJoin or
    CartesianProduct, which is what the naive inequality join becomes."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", us.alias("c_us"), F.col("event_id").alias("click_id")
    )
    errs = e.filter(F.col("event_type") == "error").select(
        "user_id", us.alias("e_us"), "event_id"
    )
    j = range_join(clicks, errs, ["user_id"], "c_us", "e_us", 0, 43_200_000_000)
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    ), plan
    assert "_bkt" in plan  # the band bucket is a join key
