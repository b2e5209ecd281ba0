"""X40 SemDeDup (operators/semdedup.py): pure-Python model crosscheck of
the full deterministic k-means → within-cluster pruning chain (seed pick,
6dp quantization, tie rules, empty-cluster keep-old-centroid), planted
near-duplicate behavior, determinism, and the zero-shuffle assignment plan
pin."""

from __future__ import annotations

import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ocr_output_evaluation_spark.operators.semdedup import (
    SEED_SALT,
    kmeans_assign,
    semantic_dupes,
)

FAST = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)


def _round6(x: float) -> float:
    # Spark F.round semantics: HALF_UP away from zero (test values are
    # chosen so half-points cannot occur — see the strategy comment)
    s = -1.0 if x < 0 else 1.0
    return s * math.floor(abs(x) * 1e6 + 0.5) / 1e6


def _cos(a: list[float], b: list[float]) -> float:
    # mirror the operator's fold ORDER exactly (sequential accumulation)
    dot = 0.0
    na = 0.0
    nb = 0.0
    for x, y in zip(a, b):
        dot += x * y
    for x in a:
        na += x * x
    for y in b:
        nb += y * y
    denom = math.sqrt(na) * math.sqrt(nb)
    return -2.0 if denom == 0.0 else _round6(dot / denom)


def _model(vecs: dict[int, list[float]], k: int, iters: int, tau: float):
    """Pure-Python replay of kmeans_assign + semantic_dupes."""
    order = sorted(
        vecs, key=lambda i: (hashlib.md5(f"{SEED_SALT}{i}".encode()).hexdigest(), i)
    )
    cents = [[_round6(x) for x in vecs[i]] for i in order[:k]]
    k = len(cents)

    def nearest(v):
        cos = [_cos(v, c) for c in cents]
        best = max(cos)
        return cos.index(best) + 1, best

    for _ in range(iters):
        asg = {i: nearest(v)[0] for i, v in vecs.items()}
        for c in range(1, k + 1):
            members = [vecs[i] for i in vecs if asg[i] == c]
            if members:
                n = len(members)
                cents[c - 1] = [
                    _round6(sum(m[d] for m in members) / n)
                    for d in range(len(cents[c - 1]))
                ]
    final = {i: nearest(v) for i, v in vecs.items()}
    pruned = {
        j
        for j in vecs
        for i in vecs
        if i < j
        and final[i][0] == final[j][0]
        and _cos(vecs[i], vecs[j]) >= tau
    }
    return final, pruned


@settings(**FAST)
@given(
    data=st.dictionaries(
        st.integers(0, 30),
        # 2dp coordinates: sums/means of p/100 over n<=20 members can never
        # land on a 6dp half-point, so HALF_UP vs HALF_EVEN is moot
        st.tuples(*[st.integers(-100, 100) for _ in range(4)]),
        min_size=3,
        max_size=20,
    ),
    k=st.sampled_from([2, 3]),
)
def test_kmeans_and_pruning_match_python_model(spark, data, k):
    vecs = {i: [x / 100.0 for x in t] for i, t in data.items()}
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    asg = kmeans_assign(df, "embedding", "vec_id", k=k, iters=2)
    got = {r.vec_id: (r.cid, r.cos) for r in asg.collect()}
    got_pruned = {
        r.vec_id
        for r in semantic_dupes(asg, "embedding", "vec_id", tau=0.3).collect()
    }
    want, want_pruned = _model(vecs, k, iters=2, tau=0.3)
    assert got == want
    assert got_pruned == want_pruned


def test_planted_duplicates_pruned_keep_lowest_id(spark):
    """Three tight planted groups + noise: every group keeps exactly its
    lowest id; re-running yields the identical selection."""
    import numpy as np

    rng = np.random.default_rng(7)
    rows = []
    for g in range(3):
        center = rng.normal(size=16)
        for j in range(4):  # near-identical copies
            rows.append((g * 10 + j, (center + rng.normal(scale=1e-4, size=16)).tolist()))
    for i in range(100, 130):  # well-separated noise
        rows.append((i, rng.normal(size=16).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    asg = kmeans_assign(df, "embedding", "vec_id", k=4, iters=2)
    dup = semantic_dupes(asg, "embedding", "vec_id", tau=0.99)
    got = sorted(r.vec_id for r in dup.collect())
    # copies of each planted group share a cluster (cosine ~1 regardless of
    # centroid) and all but the lowest id are pruned
    assert got == [1, 2, 3, 11, 12, 13, 21, 22, 23]
    again = sorted(r.vec_id for r in dup.collect())
    assert got == again


def test_assignment_is_zero_shuffle_map(spark, sf_dir):
    """The Lloyd assignment the corpus-side pays per iteration must stay a
    literal-array map over the scan: no exchange, no join, no Python."""
    from tests.test_plans import n_shuffles, plan_of

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    asg = kmeans_assign(e, "embedding", "vec_id", k=4, iters=1)
    plan = plan_of(asg)
    assert n_shuffles(plan) == 0
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_semdedup_report_plan_no_python(spark, sf_dir):
    from ocr_output_evaluation_spark.queries import semdedup_report
    from tests.test_plans import plan_of

    plan = plan_of(semdedup_report(spark, sf_dir))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_np_path_parity_with_expression_form(spark):
    """kmeans_assign_np / semantic_dupes_np (the production Arrow-numpy
    path) must reproduce the expression form exactly: same seeds, same
    centroid quantization, same tie rules, same pruned set."""
    import numpy as np

    from ocr_output_evaluation_spark.operators.semdedup import (
        kmeans_assign_np,
        semantic_dupes_np,
    )

    rng = np.random.default_rng(11)
    rows = [(i, rng.normal(size=16).tolist()) for i in range(150)]
    # planted near-dups so the pruned sets are non-trivially equal
    for i in range(0, 150, 30):
        rows.append((1000 + i, (np.asarray(rows[i][1]) * 1.0000001).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    expr = kmeans_assign(df, "embedding", "vec_id", k=5, iters=2)
    nppy = kmeans_assign_np(df, "embedding", "vec_id", k=5, iters=2)
    a = {r.vec_id: (r.cid, r.cos) for r in expr.collect()}
    b = {r.vec_id: (r.cid, r.cos) for r in nppy.collect()}
    assert a == b

    d1 = {r.vec_id for r in semantic_dupes(expr, "embedding", "vec_id", 0.99).collect()}
    d2 = {r.vec_id for r in semantic_dupes_np(nppy, "embedding", "vec_id", 0.99).collect()}
    assert d1 == d2 and d1  # equal AND non-empty (planted dups found)
