"""X105 Kaplan-Meier / Nelson-Aalen (queries.survival_report): textbook
product-limit mirror over planted (duration, censored) sessions,
censoring reduces risk sets without death steps, everyone-dies zero
tail, determinism + monotone-survival invariants, plan pins. DuckDB
value identity is the oracle gate's job (ORACLE_SURVIVAL)."""

from __future__ import annotations

import math
import os
import tempfile

import pandas as pd

from ocr_output_evaluation_spark.queries import survival_report

SF = "/root/testdata/sf0.001"

GAP_US = 1_800_000_000


def _mirror(spec):
    """spec: list[(duration_s, censored)] -> report dicts by duration."""
    from collections import defaultdict

    d = defaultdict(lambda: [0, 0])
    for dur, cens in spec:
        d[dur][1 if cens else 0] += 1
    out = []
    total = len(spec)
    seen = 0
    lnn = nan = 0
    zf = 0
    for dur in sorted(d):
        died, cens = d[dur]
        at_risk = total - seen
        seen += died + cens
        if died > 0 and at_risk > died:
            lnn += round(1e9 * math.log((at_risk - died) / at_risk))
        nan += round(1e9 * died / at_risk)
        if died > 0 and died == at_risk:
            zf = 1
        out.append(
            dict(
                duration_s=dur,
                n_died=died,
                n_censored=cens,
                n_at_risk=at_risk,
                km_ln_nano=None if zf else lnn,
                km_survival=0.0 if zf else round(math.exp(lnn / 1e9), 6),
                na_cumhaz=round(nan / 1e9, 6),
            )
        )
    return out


def _write2(spec):
    """spec: list[(duration_s, censored)] -> events parquet. One user per
    session, two events (start, start+dur). Dead sessions end well before
    the horizon; censored sessions end within one gap of the global max
    (an anchor censored session pins the horizon)."""
    tmp = tempfile.mkdtemp()
    t0 = 1_700_000_000_000_000
    horizon = t0 + 1_000_000_000_000
    recs = []
    eid = 0
    uid = 0
    anchored = False
    for dur, cens in spec:
        if cens and not anchored:
            start = horizon - dur * 1_000_000
            anchored = True
        elif cens:
            start = horizon - dur * 1_000_000 - GAP_US // 2
        else:
            start = t0 + uid * 10 * GAP_US
        for ts_us in (start, start + dur * 1_000_000):
            recs.append(
                dict(
                    event_id=eid,
                    ts=pd.Timestamp(ts_us, unit="us"),
                    user_id=uid,
                    event_type="view",
                    value=1.0,
                    props="{}",
                )
            )
            eid += 1
        uid += 1
    assert anchored
    df = pd.DataFrame(recs)
    df["ts"] = df["ts"].astype("datetime64[us]")
    df.to_parquet(os.path.join(tmp, "events.parquet"))
    return tmp


def _collect(spark, sf):
    return [r.asDict() for r in survival_report(spark, sf).collect()]


def test_km_textbook(spark):
    # deaths at 10, 30; censored at 20 and 40: S(10)=4/5, S(30)=4/5*1/2
    spec = [(10, False), (20, True), (30, False), (40, True), (30, False)]
    got = _collect(spark, _write2(spec))
    assert got == _mirror(spec)
    by = {r["duration_s"]: r for r in got}
    assert by[10]["km_survival"] == 0.8
    assert by[20]["km_survival"] == 0.8  # censoring: no survival step
    assert by[30]["km_survival"] == round(0.8 * (1 / 3), 6)
    assert by[30]["n_at_risk"] == 3


def test_km_everyone_dies(spark):
    spec = [(5, False), (5, False), (9, False), (9, True)]
    got = _collect(spark, _write2(spec))
    assert got == _mirror(spec)
    assert got[-1]["duration_s"] == 9


def test_km_zero_tail(spark):
    # the last at-risk session dies -> survival exactly 0, ln NULL
    spec = [(3, False), (7, False), (2, True)]
    got = _collect(spark, _write2(spec))
    assert got == _mirror(spec)
    assert got[-1]["km_survival"] == 0.0 and got[-1]["km_ln_nano"] is None


def test_km_sf_determinism_and_plan(spark):
    a = _collect(spark, SF)
    assert a == _collect(spark, SF)
    surv = [r["km_survival"] for r in a]
    assert surv == sorted(surv, reverse=True), "KM must be non-increasing"
    haz = [r["na_cumhaz"] for r in a]
    assert haz == sorted(haz), "NA cumhaz must be non-decreasing"
    assert a[0]["n_at_risk"] == sum(r["n_died"] + r["n_censored"] for r in a)
    from tests.test_plans import plan_of

    plan = plan_of(survival_report(spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Window" in plan and "HashAggregate" in plan
