"""X113 per-source Wasserstein-1 vs the pooled length distribution
(queries.wasserstein_report): exact-integer ECDF-gap mirror checked
against scipy's closed form, identical-distribution zero, mass-shift
distance = shift, KS-blind displacement sensitivity, determinism +
self-consistency invariants, plan pins. DuckDB value identity is the
oracle gate's job (ORACLE_WASSERSTEIN)."""

from __future__ import annotations

import os
import tempfile
from collections import Counter

import pandas as pd

from ocr_output_evaluation_spark.queries import wasserstein_report

SF = "/root/testdata/sf0.001"


def _mirror(rows):
    """rows: list[(source, v)] -> report dicts (exact integer arithmetic)."""
    pool = Counter(v for _, v in rows)
    vals = sorted(pool)
    nt = len(rows)
    out = []
    for s in sorted({s for s, _ in rows}):
        mine = Counter(v for src, v in rows if src == s)
        ng = sum(mine.values())
        cumg = cumt = 0
        num = 0
        for v, nxt in zip(vals, vals[1:] + [None]):
            cumg += mine.get(v, 0)
            cumt += pool[v]
            if nxt is not None:
                num += abs(cumg * nt - cumt * ng) * (nxt - v)
        out.append(
            dict(
                source=s,
                n_docs=ng,
                w1_num=num,
                w1=round(num / (ng * nt), 6),
            )
        )
    return out


def _scipy_w1(a, b):
    """Reference closed form (scipy.stats.wasserstein_distance without
    scipy): integrate |ECDF_a - ECDF_b| over the merged support."""
    vals = sorted(set(a) | set(b))
    ca = cb = 0
    tot = 0.0
    for v, nxt in zip(vals, vals[1:] + [None]):
        ca += sum(1 for x in a if x == v)
        cb += sum(1 for x in b if x == v)
        if nxt is not None:
            tot += abs(ca / len(a) - cb / len(b)) * (nxt - v)
    return tot


def _write(rows):
    tmp = tempfile.mkdtemp()
    pd.DataFrame(
        {
            "doc_id": range(len(rows)),
            "text": ["x" * v for _, v in rows],
            "lang": "en",
            "source": [s for s, _ in rows],
            "n_chars": [v for _, v in rows],
        }
    ).to_parquet(os.path.join(tmp, "documents.parquet"))
    return tmp


def _collect(spark, sf):
    return [r.asDict() for r in wasserstein_report(spark, sf).collect()]


def test_wasserstein_identical_sources_zero(spark):
    rows = [("a", v) for v in (10, 20, 30)] + [("b", v) for v in (10, 20, 30)]
    got = _collect(spark, _write(rows))
    assert got == _mirror(rows)
    assert all(r["w1_num"] == 0 and r["w1"] == 0.0 for r in got)


def test_wasserstein_shift_vs_pool(spark):
    # a at {0}, b at {100}: pool is half each, so each source is exactly
    # 50 away from the pool (scipy identity checked against the closed form)
    rows = [("a", 0)] * 5 + [("b", 100)] * 5
    got = _collect(spark, _write(rows))
    assert got == _mirror(rows)
    pool = [0] * 5 + [100] * 5
    for r, vals in zip(got, ([0] * 5, [100] * 5)):
        assert r["w1"] == round(_scipy_w1(vals, pool), 6) == 50.0


def test_wasserstein_sees_displacement_ks_misses(spark):
    # both far-shifts and near-shifts give the same KS sup-gap, but W1
    # grows with displacement: moving b twice as far doubles its W1
    near = [("a", 0)] * 5 + [("b", 10)] * 5
    far = [("a", 0)] * 5 + [("b", 20)] * 5
    g_near = _collect(spark, _write(near))
    g_far = _collect(spark, _write(far))
    assert g_near == _mirror(near) and g_far == _mirror(far)
    assert g_far[1]["w1"] == 2 * g_near[1]["w1"] > 0


def test_wasserstein_uneven_sizes_exact(spark):
    rows = [("a", 1), ("a", 3), ("a", 5), ("b", 2)]
    got = _collect(spark, _write(rows))
    assert got == _mirror(rows)
    pool = [1, 3, 5, 2]
    assert got[0]["w1"] == round(_scipy_w1([1, 3, 5], pool), 6)
    assert got[1]["w1"] == round(_scipy_w1([2], pool), 6)


def test_wasserstein_sf_determinism_and_plan(spark):
    a = _collect(spark, SF)
    assert a == _collect(spark, SF)
    assert len(a) > 1
    assert all(r["w1_num"] >= 0 and r["w1"] >= 0.0 for r in a)
    from tests.test_plans import plan_of

    plan = plan_of(wasserstein_report(spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan and "Window" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
