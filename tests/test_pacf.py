"""X149 partial autocorrelation lags 1-3 (queries.pacf_report): exact
python mirror over planted daily series (same integer deviations and
polynomial ratios), AR(1)-like geometric-decay series has pacf2~0 past
the first lag, alternating series pacf1 near -1 with the singular
guard exercised, constant series all-NULL, cross-check vs the
statsmodels-convention Durbin-Levinson recursion on the sample ACF,
determinism + plan pins. DuckDB value identity is the oracle gate's
job (ORACLE_PACF)."""

from __future__ import annotations

import os
import tempfile

import pandas as pd

from ocr_output_evaluation_spark.queries import pacf_report

SF = "/root/testdata/sf0.001"

DAY_US = 86_400_000_000
EPOCH0 = 19_700


def _mirror(series):
    span = max(len(s) for s in series.values())
    out = []
    for ty in sorted(series):
        cs = list(series[ty]) + [0] * (span - len(series[ty]))
        tt = sum(cs)
        dv = [span * c - tt for c in cs]
        d = sum(x * x for x in dv)
        xs = {}
        for h in (1, 2, 3):
            xs[h] = sum(
                dv[t] * dv[t + h] for t in range(span - h)
            ) if span > h else 0
        x1, x2, x3 = xs[1], xs[2], xs[3]
        fd = float(d)
        f1, f2, f3 = float(x1), float(x2), float(x3)
        p1 = f1 / fd if d != 0 else None
        den2 = fd * fd - f1 * f1
        p2 = (f2 * fd - f1 * f1) / den2 if d != 0 and den2 != 0 else None
        num3 = f3 * (fd * fd - f1 * f1) + f1 * f2 * f2 - 2.0 * f1 * f2 * fd + f1 * f1 * f1
        den3 = fd * fd * fd - 2.0 * f1 * f1 * fd - f2 * f2 * fd + 2.0 * f1 * f1 * f2
        p3 = num3 / den3 if d != 0 and den3 != 0 else None
        out.append(
            dict(
                event_type=ty,
                n_days=span,
                x1=x1,
                x2=x2,
                x3=x3,
                d=d,
                pacf1=round(p1, 6) if p1 is not None else None,
                pacf2=round(p2, 6) if p2 is not None else None,
                pacf3=round(p3, 6) if p3 is not None else None,
            )
        )
    return out


def _dl_pacf(r):
    # textbook Durbin-Levinson on sample ACF [r1, r2, r3]
    phi = {(1, 1): r[0]}
    prev = [r[0]]
    for k in (2, 3):
        num = r[k - 1] - sum(prev[j] * r[k - 2 - j] for j in range(k - 1))
        den = 1.0 - sum(prev[j] * r[j] for j in range(k - 1))
        pk = num / den
        cur = [prev[j] - pk * prev[k - 2 - j] for j in range(k - 1)] + [pk]
        phi[(k, k)] = pk
        prev = cur
    return phi[(1, 1)], phi[(2, 2)], phi[(3, 3)]


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
    return [r.asDict() for r in pacf_report(spark, sf).collect()]


def test_pacf_matches_durbin_levinson(spark):
    series = {"view": [3, 9, 1, 14, 2, 8, 5, 11, 4, 13, 6, 2, 9, 1, 12, 7]}
    got = _collect(spark, _write(series))
    assert got == _mirror(series)
    r = got[0]
    rs = [r["x1"] / r["d"], r["x2"] / r["d"], r["x3"] / r["d"]]
    p1, p2, p3 = _dl_pacf(rs)
    # emitted values are 6dp-rounded
    assert abs(r["pacf1"] - p1) < 1e-6
    assert abs(r["pacf2"] - p2) < 1e-6
    assert abs(r["pacf3"] - p3) < 1e-6


def test_pacf_alternating_series(spark):
    # strict alternation: r1 near -1, higher partials NULL or tiny via
    # the near-singular Toeplitz (mirror decides exactly)
    series = {"view": [1, 9] * 10}
    got = _collect(spark, _write(series))
    assert got == _mirror(series)
    assert got[0]["pacf1"] < -0.8


def test_pacf_constant_null(spark):
    series = {"view": [5] * 15}
    got = _collect(spark, _write(series))
    assert got == _mirror(series)
    r = got[0]
    assert r["d"] == 0
    assert r["pacf1"] is None and r["pacf2"] is None and r["pacf3"] is None


def test_pacf_sf_determinism_and_plan(spark):
    a = _collect(spark, SF)
    assert a == _collect(spark, SF)
    assert len(a) >= 2
    for r in a:
        for k in ("pacf1", "pacf2", "pacf3"):
            assert r[k] is None or -1.000001 <= r[k] <= 1.000001
    from tests.test_plans import plan_of

    plan = plan_of(pacf_report(spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan and "Window" in plan
