"""X56 q-digest: exact python-model crosscheck of the whole
build→compress→query trajectory, the paper's rank-error and size
bounds, and merge behavior."""

import math
from collections import Counter, defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ocr_output_evaluation_spark.operators.qdigest import (
    qdigest_build,
    qdigest_merge,
    qdigest_quantiles,
)

FAST = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)


def _py_digest(values, depth, k):
    """Exact replica of qdigest_build for one group."""
    u = 1 << depth
    cnt = Counter(u + min(max(v, 0), u - 1) for v in values)
    n = sum(cnt.values())
    thr = max(n // k, 1)
    nodes = {(depth, i): c for i, c in cnt.items()}
    for lvl in range(depth, 0, -1):
        kids = defaultdict(int)
        for (l, i), c in list(nodes.items()):
            if l == lvl:
                kids[i // 2] += c
        for pid in sorted(set(kids) | {i for (l, i) in nodes if l == lvl - 1}):
            ksum = kids.get(pid, 0)
            pcnt = nodes.get((lvl - 1, pid), 0)
            if ksum > 0 and ksum + pcnt <= thr:
                for ch in (2 * pid, 2 * pid + 1):
                    nodes.pop((lvl, ch), None)
                if ksum + pcnt > 0:
                    nodes[(lvl - 1, pid)] = pcnt + ksum
    return nodes, n, thr


def _py_quantile(nodes, n, q_pct, depth):
    items = []
    for (l, i), c in nodes.items():
        span = 1 << (depth - l)
        right = (i - (1 << l) + 1) * span - 1
        items.append((right, span, i, c))
    items.sort()
    target = -(-q_pct * n // 100)  # ceil
    cum = 0
    for right, _, _, c in items:
        cum += c
        if cum >= target:
            return right
    return items[-1][0]


def _spark_digest(spark, values, depth=8, k=16):
    df = spark.createDataFrame([("g", v) for v in values], "g string, v long")
    return qdigest_build(df, "v", ["g"], depth=depth, k=k)


def test_matches_python_model_exactly(spark):
    values = [(i * 37) % 200 for i in range(800)] + [5] * 120
    dig, tot = _spark_digest(spark, values, depth=8, k=16)
    got = {(r.level, r.id): r.cnt for r in dig.collect()}
    want, n, _ = _py_digest(values, 8, 16)
    assert got == want
    q = qdigest_quantiles(dig, tot, ["g"], [10, 50, 90], depth=8)
    got_q = {r.q_pct: r.qd_value for r in q.collect()}
    assert got_q == {p: _py_quantile(want, n, p, 8) for p in (10, 50, 90)}


@settings(**FAST)
@given(
    values=st.lists(st.integers(-5, 300), min_size=1, max_size=120),
    k=st.sampled_from([4, 16, 64]),
)
def test_fuzz_trajectory_and_rank_bound(spark, values, k):
    depth = 8
    dig, tot = _spark_digest(spark, values, depth=depth, k=k)
    got = {(r.level, r.id): r.cnt for r in dig.collect()}
    want, n, _ = _py_digest(values, depth, k)
    assert got == want  # bit-identical trajectory incl. clamping
    # classical size bound: every surviving sibling pair has
    # ksum + pcnt > thr, each count unit feeds O(1) such sums, so
    # #nodes <= ~3n/thr (= 3k when n >= k) plus the root path
    thr = max(n // k, 1)
    assert len(got) <= 3 * (n // thr + 1) + 2 * depth
    # rank-error bound on the median — the paper's guarantee is TWO-SIDED
    # epsilon-approximate rank (duplicates make "count <= est" jump past
    # the target by the duplicate multiplicity, which is not an error):
    # est is not too high (few values strictly below) and not too low
    # (enough values at-or-below).
    clamped = sorted(min(max(v, 0), 255) for v in values)
    est = {
        r.q_pct: r.qd_value
        for r in qdigest_quantiles(dig, tot, ["g"], [50], depth=depth).collect()
    }[50]
    target = math.ceil(50 * n / 100)
    # every surviving internal node carries <= thr counts (the compress
    # condition), and a query point has <= depth ancestors, so the rank
    # error is <= depth * thr — with thr = max(n//k, 1) exactly as the
    # implementation clamps it (at n < k the clamp makes thr 1, NOT 0,
    # so tiny groups still compress and the n/k form understates eps)
    thr = max(n // k, 1)
    eps = depth * thr + thr + 1
    below = sum(1 for x in clamped if x < est)
    at_or_below = sum(1 for x in clamped if x <= est)
    assert below <= target - 1 + eps
    assert at_or_below >= target - eps


def test_merge_union_quantiles_within_bound(spark):
    depth, k = 8, 16
    a_vals = [(i * 7) % 120 for i in range(400)]
    b_vals = [(i * 11) % 250 for i in range(300)]
    dig_a, _ = _spark_digest(spark, a_vals, depth=depth, k=k)
    dig_b, _ = _spark_digest(spark, b_vals, depth=depth, k=k)
    merged = qdigest_merge(dig_a, dig_b, ["g"])
    # totals for the union
    import pyspark.sql.functions as F

    tot = merged.groupBy("g").agg(F.sum("cnt").cast("long").alias("n"))
    est = {
        r.q_pct: r.qd_value
        for r in qdigest_quantiles(
            merged, tot, ["g"], [25, 50, 75], depth=depth
        ).collect()
    }
    allv = sorted(a_vals + b_vals)
    n = len(allv)
    for q in (25, 50, 75):
        target = math.ceil(q * n / 100)
        # merged error adds: 2x the single-digest bound (two-sided form),
        # same depth * thr form as the fuzz test
        eps = 2 * (depth * max(n // k, 1) + max(n // k, 1) + 1)
        below = sum(1 for x in allv if x < est[q])
        at_or_below = sum(1 for x in allv if x <= est[q])
        assert below <= target - 1 + eps
        assert at_or_below >= target - eps
