"""X71 rendezvous/HRW sharding: python-mirror fuzz, the minimal-movement
property (every key moved by S -> S+1 lands ON the new shard), validation
guards, and the zero-exchange assignment plan pin."""

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

import pytest

from ocr_output_evaluation_spark.operators.rendezvous import (
    MAX_SHARDS,
    rendezvous_shard,
    with_rendezvous_shard,
)

FAST = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)


def _py_shard(key, n, salt="hrw"):
    best, arg = -1, -1
    for s in range(n):
        h = hashlib.md5(f"{key}:{salt}:{s}".encode()).hexdigest()
        packed = int(h[:13], 16) * MAX_SHARDS + s
        if packed > best:
            best, arg = packed, s
    return arg


def _assign(spark, keys, n):
    d = spark.createDataFrame([(k,) for k in keys], "doc_id long")
    return {
        r.doc_id: r.shard
        for r in with_rendezvous_shard(d, "doc_id", n).collect()
    }


@given(
    keys=st.lists(st.integers(0, 10**9), min_size=1, max_size=30, unique=True),
    n=st.integers(1, 17),
)
@settings(**FAST)
def test_python_mirror_fuzz(spark, keys, n):
    got = _assign(spark, keys, n)
    assert got == {k: _py_shard(k, n) for k in keys}


def test_minimal_movement(spark):
    keys = list(range(2000))
    for n in (4, 13):
        a = _assign(spark, keys, n)
        b = _assign(spark, keys, n + 1)
        moved = [k for k in keys if a[k] != b[k]]
        # the defining HRW property: a key moves ONLY if the new shard wins
        assert all(b[k] == n for k in moved)
        # unmoved keys keep their exact assignment
        assert all(a[k] == b[k] for k in keys if k not in set(moved))
        # movement mass ~ 1/(n+1) of the corpus (loose 2x band)
        frac = len(moved) / len(keys)
        assert 0.5 / (n + 1) < frac < 2.0 / (n + 1)


def test_balance_and_range(spark):
    keys = list(range(5000))
    got = _assign(spark, keys, 8)
    counts = [0] * 8
    for v in got.values():
        assert 0 <= v < 8
        counts[v] += 1
    # md5 is uniform: every shard within a loose 2x band of the mean
    assert min(counts) > 5000 / 8 / 2 and max(counts) < 5000 / 8 * 2


def test_single_shard_and_guards(spark):
    assert set(_assign(spark, [1, 2, 3], 1).values()) == {0}
    for bad in (0, MAX_SHARDS + 1):
        with pytest.raises(ValueError):
            rendezvous_shard(F.lit(1), bad)


def test_zero_exchange_assignment_plan(spark):
    from tests.test_plans import n_shuffles, plan_of

    d = spark.range(100).select(F.col("id").alias("doc_id"))
    assigned = with_rendezvous_shard(d, "doc_id", 13)
    plan = plan_of(assigned)
    assert n_shuffles(plan) == 0  # pure in-row expression
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
