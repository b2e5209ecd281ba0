"""Hypothesis fuzz for the wave-3 sampling operators: each Spark operator
is replayed by a pure-Python model on randomized small frames (duplicate
scores, zero token counts, single-row groups, extreme budgets — shapes the
fixture-based equivalence tests can't enumerate). Mirrors the extractor's
fuzz strategy (tests/test_extractor_fuzz.py)."""

import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

FAST = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


# ---------------------------------------------------------------------------
# assign_split vs python model
# ---------------------------------------------------------------------------
@settings(**FAST)
@given(
    keys=st.lists(st.integers(-(10**9), 10**9), min_size=1, max_size=50, unique=True),
    cuts=st.tuples(st.integers(1, 98), st.integers(1, 98)),
    salt=st.sampled_from(["split-v1", "s2", ""]),
)
def test_assign_split_fuzz(spark, keys, cuts, salt):
    from ocr_output_evaluation_spark.operators.splits import assign_split

    a, b = sorted(cuts)
    if a == b:
        b = a + 1
    if b >= 100:
        a, b = 33, 66
    fr = (("train", a), ("val", b - a), ("test", 100 - b))

    def model(k: int) -> str:
        bucket = int(_md5(f"{salt}:{k}")[:4], 16) % 100
        return "train" if bucket < a else ("val" if bucket < b else "test")

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {
        r.k: r.split
        for r in assign_split(df, "k", fractions=fr, salt=salt).collect()
    }
    assert got == {k: model(k) for k in keys}


# ---------------------------------------------------------------------------
# token_budget_take vs python model
# ---------------------------------------------------------------------------
@settings(**FAST)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 10**6),          # key
            st.sampled_from(["a", "b", "c"]),  # group
            st.integers(0, 60),             # token count
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[0],
    ),
    budget=st.integers(0, 400),
)
def test_token_budget_fuzz(spark, rows, budget):
    from ocr_output_evaluation_spark.operators.budget import token_budget_take

    def model() -> set:
        kept = set()
        by_group: dict = {}
        for k, g, tok in rows:
            by_group.setdefault(g, []).append((_md5(str(k)), k, tok))
        for g, items in by_group.items():
            items.sort()
            c = 0
            for _, k, tok in items:
                c += tok
                if c <= budget:
                    kept.add(k)
        return kept

    df = spark.createDataFrame(rows, "k long, lang string, tok long")
    got = {
        r.k
        for r in token_budget_take(df, F.col("tok"), "k", budget)
        .filter("kept")
        .collect()
    }
    assert got == model()


# ---------------------------------------------------------------------------
# quantile_gate vs python model
# ---------------------------------------------------------------------------
@settings(**FAST)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 10**6),             # id
            st.sampled_from(["a", "b"]),       # group
            st.integers(0, 20),                # raw score (ties likely)
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[0],
    ),
    frac=st.sampled_from([0.1, 0.25, 0.3, 0.5, 0.75, 1.0]),
)
def test_quantile_gate_fuzz(spark, rows, frac):
    from ocr_output_evaluation_spark.operators.quantile import quantile_gate

    def model() -> set:
        kept = set()
        by_group: dict = {}
        for i, g, s in rows:
            by_group.setdefault(g, []).append((i, float(s)))
        for g, items in by_group.items():
            xs = sorted((s for _, s in items), reverse=True)
            target = math.ceil(frac * len(xs))
            thr = xs[target - 1]
            kept |= {i for i, s in items if s >= thr}
        return kept

    df = spark.createDataFrame(rows, "id long, lang string, v long")
    got = {
        r.id
        for r in quantile_gate(
            df, F.round(F.col("v").cast("double"), 6), frac
        ).collect()
    }
    assert got == model()
