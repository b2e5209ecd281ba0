"""As-of join (X34, operators/asof.py): python-model parity, tie/strict/NULL
semantics, and the single-exchange plan shape."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from ocr_output_evaluation_spark.operators.asof import as_of_join


def _model(left, right, inclusive):
    """Reference as-of: per left row, the right row with max ts (<= or <),
    ties to the largest (ts, payload...) tuple."""
    out = {}
    for lid, k, lt in left:
        best = None
        for k2, rt, *pay in right:
            if k2 is None or rt is None or k2 != k or lt is None:
                continue
            if (rt <= lt) if inclusive else (rt < lt):
                cand = (rt, *pay)
                if best is None or cand > best:
                    best = cand
        out[lid] = best
    return out


@pytest.mark.parametrize("inclusive", [True, False])
def test_asof_matches_python_model_with_ties_and_nulls(spark, inclusive):
    left = [
        (0, "a", 10), (1, "a", 5), (2, "a", 4), (3, "b", 10), (4, "b", 3),
        (5, "c", 7),            # key with no right rows at all
        (6, "a", None),         # NULL left ts -> unmatched pass-through
        (7, None, 10),          # NULL left key -> unmatched pass-through
    ]
    right = [
        ("a", 5, 100), ("a", 5, 101),   # tie at ts=5 -> payload 101 wins
        ("a", 8, 102), ("b", 1, 103),
        ("b", 10, 104),
        (None, 1, 105),                 # NULL right key never matches
        ("a", None, 106),               # NULL right ts never matches
    ]
    ldf = spark.createDataFrame(left, "lid long, k string, ts long")
    rdf = spark.createDataFrame(right, "k string, ts long, pid long")
    got = {
        r.lid: (r.asof_ts, r.asof_pid)
        for r in as_of_join(
            ldf, rdf, ["k"], "ts", "ts", ["pid"], inclusive=inclusive
        ).collect()
    }
    assert len(got) == len(left)
    want = _model(left, right, inclusive)
    for lid, m in want.items():
        assert got[lid] == ((m[0], m[1]) if m else (None, None)), (lid, inclusive)
    # spot the semantics the parametrization is about: left ts=5 on key a
    assert got[1] == ((5, 101) if inclusive else (None, None))


def test_asof_payload_collision_raises(spark):
    df = spark.createDataFrame([(1, "a", 1)], "x long, k string, ts long")
    with pytest.raises(ValueError, match="collide"):
        as_of_join(df, df.select("k", "ts", "x"), ["k"], "ts", "ts", ["x"])


def test_asof_internal_and_output_name_collisions_raise(spark):
    """Left columns that shadow the operator's internal names (_t/_side/
    _pay/_m) or its fabricated {prefix}{col} outputs must be rejected
    upfront, not surface as duplicate-name frames downstream."""
    r = spark.createDataFrame([("a", 1, 9)], "k string, ts long, y long")
    bad_internal = spark.createDataFrame(
        [(1, "a", 1, 0)], "x long, k string, ts long, _side long"
    )
    with pytest.raises(ValueError, match="_side"):
        as_of_join(bad_internal, r, ["k"], "ts", "ts", ["y"])
    bad_output = spark.createDataFrame(
        [(1, "a", 1, 0)], "x long, k string, ts long, asof_y long"
    )
    with pytest.raises(ValueError, match="asof_y"):
        as_of_join(bad_output, r, ["k"], "ts", "ts", ["y"])


def test_asof_plan_single_exchange_no_join(spark, sf_dir):
    """The union form must cost ONE hash exchange on the key (feeding the
    window sort) and no join operator — the 100 TB rationale for not
    writing this as an inequality join."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    errs = e.filter(F.col("event_type") == "error").select("user_id", "ts", "event_id")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    j = as_of_join(errs, clicks, ["user_id"], "ts", "ts", ["click_id"])
    plan = j._jdf.queryExecution().executedPlan().toString()
    exchanges = re.findall(r"Exchange hashpartitioning\(([^,]+)", plan)
    assert exchanges == ["user_id"] or all("user_id" in x for x in exchanges)
    assert len(exchanges) == 1, plan
    assert "Join" not in plan, plan
    assert "Window" in plan


def test_asof_report_gap_signs_and_coverage(spark, sf_dir):
    """On real data: every matched gap is >= 0, match counts never exceed
    error counts, and users with clicks before their first error match."""
    from ocr_output_evaluation_spark.queries import asof_attribution_report

    rows = asof_attribution_report(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_matched <= r.n_errors
        assert r.sum_gap_us >= 0
        assert r.max_gap_us is None or r.max_gap_us >= 0
        if r.n_matched == 0:
            assert r.sum_gap_us == 0 and r.max_gap_us is None
