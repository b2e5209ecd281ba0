"""X143 binary-segmentation changepoints (queries.binseg_report): exact
python mirror over planted daily series, two-step series recovered by
root + child passes, constant child segments emit zero-magnitude
argmins at the first eligible day, short segments emit nothing,
determinism + plan pins. DuckDB value identity is the oracle gate's
job (ORACLE_BINSEG)."""

from __future__ import annotations

import os
import tempfile

import pandas as pd

from ocr_output_evaluation_spark.queries import binseg_report

SF = "/root/testdata/sf0.001"

DAY_US = 86_400_000_000
EPOCH0 = 19_700


def _seg_cp(days, cs):
    # returns (cp_day, k, cus, nd, t, lo, hi) or None for nd < 2
    nd = len(cs)
    if nd < 2:
        return None
    t = sum(cs)
    best = None
    pre = 0
    for k, (d, c) in enumerate(zip(days, cs), 1):
        pre += c
        if k >= nd:
            break
        cus = nd * pre - k * t
        key = (-abs(cus), d)
        if best is None or key < best[0]:
            best = (key, d, k, cus)
    return (best[1], best[2], best[3], nd, t, days[0], days[-1])


def _row(ty, level, seg, r):
    d, k, cus, nd, t, lo, hi = r
    return dict(
        event_type=ty,
        level=level,
        seg=seg,
        seg_lo=lo,
        seg_hi=hi,
        n_days_seg=nd,
        seg_events=t,
        cp_day=d,
        cp_k=k,
        g_scaled=cus,
        max_abs=abs(cus),
        seg_mean=round(t / nd, 6),
    )


def _mirror(series):
    span = max(len(s) for s in series.values())
    out = []
    for ty in sorted(series):
        cs = list(series[ty]) + [0] * (span - len(series[ty]))
        days = [EPOCH0 + i for i in range(span)]
        root = _seg_cp(days, cs)
        if root is None:
            continue
        out.append(_row(ty, 1, "root", root))
        cp = root[0]
        idx = cp - EPOCH0 + 1
        for seg, dd, cc in (
            ("L", days[:idx], cs[:idx]),
            ("R", days[idx:], cs[idx:]),
        ):
            r = _seg_cp(dd, cc)
            if r is not None:
                out.append(_row(ty, 2, seg, r))
    return sorted(out, key=lambda r: (r["event_type"], r["level"], r["seg"]))


def _write(series):
    tmp = tempfile.mkdtemp()
    recs = []
    eid = 0
    for ty, cs in series.items():
        for d, c in enumerate(cs):
            for i in range(c):
                recs.append(
                    dict(
                        event_id=eid,
                        ts=pd.Timestamp(
                            (EPOCH0 + d) * DAY_US + i * 1_000_000, unit="us"
                        ),
                        user_id=eid % 5,
                        event_type=ty,
                        value=1.0,
                        props="{}",
                    )
                )
                eid += 1
    df = pd.DataFrame(recs)
    df["ts"] = df["ts"].astype("datetime64[us]")
    df.to_parquet(os.path.join(tmp, "events.parquet"))
    return tmp


def _collect(spark, sf):
    return [r.asDict() for r in binseg_report(spark, sf).collect()]


def test_binseg_two_steps_recovered(spark):
    # thirds at 2 / 20 / 50: root finds the bigger jump, the child pass
    # recovers the other boundary
    series = {"view": [2] * 8 + [20] * 8 + [50] * 8}
    got = _collect(spark, _write(series))
    assert got == _mirror(series)
    by = {(r["level"], r["seg"]): r for r in got}
    root_cp = by[(1, "root")]["cp_day"] - EPOCH0
    cps = {root_cp}
    for seg in ("L", "R"):
        cps.add(by[(2, seg)]["cp_day"] - EPOCH0)
    # both true boundaries (days 7 and 15, last-of-segment convention)
    assert {7, 15} <= cps


def test_binseg_constant_children_zero(spark):
    # one clean step: root at the boundary; both children constant ->
    # all-zero cus, argmax ties broken to the first eligible day
    series = {"view": [3] * 10 + [30] * 10}
    got = _collect(spark, _write(series))
    assert got == _mirror(series)
    by = {(r["level"], r["seg"]): r for r in got}
    assert by[(1, "root")]["cp_day"] == EPOCH0 + 9
    assert by[(2, "L")]["max_abs"] == 0 and by[(2, "R")]["max_abs"] == 0
    assert by[(2, "L")]["cp_day"] == EPOCH0


def test_binseg_short_segments_skipped(spark):
    # 2-day series: root emits; cp at day 0 -> L has 1 day (skipped),
    # R has 1 day (skipped)
    series = {"view": [1, 9]}
    got = _collect(spark, _write(series))
    assert got == _mirror(series)
    assert [(r["level"], r["seg"]) for r in got] == [(1, "root")]


def test_binseg_sf_determinism_and_plan(spark):
    a = _collect(spark, SF)
    assert a == _collect(spark, SF)
    assert len(a) >= 3
    for r in a:
        assert r["seg_lo"] <= r["cp_day"] <= r["seg_hi"]
        assert r["n_days_seg"] >= 2
    from tests.test_plans import plan_of

    plan = plan_of(binseg_report(spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan and "Window" in plan
