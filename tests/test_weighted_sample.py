"""X70 Efraimidis-Spirakis weighted sampling: python-mirror fuzz,
scale-invariance and monotonicity properties, weight-proportional
inclusion sanity, w<=0 exclusion, TakeOrderedAndProject plan pin."""

import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ocr_output_evaluation_spark.operators.sampling import weighted_sample_es

FAST = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)


def _clock(key, w, salt="es42"):
    h = int(hashlib.md5(f"{key}:{salt}".encode()).hexdigest()[:8], 16)
    u = (h + 0.5) / 4294967296.0
    return -math.log(u) / w


def _py_sample(rows, k):
    live = [(key, w) for key, w in rows if w > 0]
    return [
        key
        for key, _ in sorted(live, key=lambda r: (_clock(r[0], r[1]), r[0]))[:k]
    ]


def _run(spark, rows, k):
    d = spark.createDataFrame(rows, "doc_id long, w long")
    return [
        r.doc_id for r in weighted_sample_es(d, "doc_id", "w", k).collect()
    ]


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 10**6), st.integers(-2, 50)),
        min_size=1,
        max_size=40,
        unique_by=lambda r: r[0],
    ),
    k=st.integers(1, 10),
)
@settings(**FAST)
def test_python_mirror_fuzz(spark, rows, k):
    assert _run(spark, rows, k) == _py_sample(rows, k)


def test_scale_invariance_and_monotonicity(spark):
    rows = [(i, 1 + i % 7) for i in range(300)]
    base = _run(spark, rows, 20)
    # clocks all scale by 1/c under weight *= c: the sample is unchanged
    assert _run(spark, [(i, w * 64) for i, w in rows], 20) == base
    # raising one excluded row's weight can only pull it IN
    out_key = next(i for i, _ in rows if i not in set(base))
    boosted = [(i, 10**9 if i == out_key else w) for i, w in rows]
    assert out_key in _run(spark, boosted, 20)


def test_weight_proportional_inclusion(spark):
    # 2000 keys of weight 1 vs 200 keys of weight 10: equal total mass,
    # so a 200-row sample splits ~100/100 (each heavy key 10x the rate
    # of a light key). Deterministic given the fixed key space.
    rows = [(i, 1) for i in range(2000)] + [(10000 + i, 10) for i in range(200)]
    got = _run(spark, rows, 200)
    heavy = sum(1 for k in got if k >= 10000)
    assert 60 <= heavy <= 140


def test_nonpositive_weights_excluded(spark):
    rows = [(1, 5), (2, 0), (3, -4), (4, 1)]
    got = _run(spark, rows, 10)
    assert set(got) == {1, 4}


def test_take_ordered_plan(spark):
    from tests.test_plans import plan_of

    d = spark.range(100).selectExpr("id as doc_id", "1 + id % 5 as w")
    plan = plan_of(weighted_sample_es(d, "doc_id", "w", 10))
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
