"""X101 Mann-Kendall + Theil-Sen (queries.mann_kendall_report):
brute-force pairwise mirror (S, tie-corrected 18·var, continuity-
corrected z, exact median-of-slopes), planted monotone / flat / tied
series, determinism, plan pins. DuckDB value identity is the oracle
gate's job (ORACLE_MANN_KENDALL)."""

from __future__ import annotations

import math
import os
import tempfile
from collections import Counter

import pandas as pd

from ocr_output_evaluation_spark.queries import mann_kendall_report

SF = "/root/testdata/sf0.001"


def _mirror(series):
    """series: dict[type -> list[(epoch_day, count)]] -> report dicts."""
    out = []
    for et in sorted(series):
        pts = sorted(series[et])
        n = len(pts)
        s = 0
        slopes = []
        for i in range(n):
            for j in range(i + 1, n):
                dc = pts[j][1] - pts[i][1]
                dd = pts[j][0] - pts[i][0]
                s += (dc > 0) - (dc < 0)
                slopes.append((dc / dd, dc, dd))
        slopes.sort()
        m = len(slopes)
        mid = {(m + 1) // 2, (m + 2) // 2}
        sen = round(
            sum(slopes[r - 1][0] for r in mid) / len(mid), 6
        ) if m else None
        tt = sum(
            t * (t - 1) * (2 * t + 5) for t in Counter(c for _, c in pts).values()
        )
        var18 = n * (n - 1) * (2 * n + 5) - tt
        if var18 > 0:
            sd = math.sqrt(var18 / 18.0)
            z = round((s - 1) / sd if s > 0 else (s + 1) / sd if s < 0 else 0.0, 6)
        else:
            z = 0.0 if s == 0 else None
        out.append(
            dict(
                event_type=et,
                n_days=n,
                s_stat=s,
                var18=var18,
                z_mk=z,
                sen_slope=sen,
            )
        )
    return out


def _write(series):
    """series: dict[type -> list[(epoch_day, count)]] rendered as an
    events parquet with `count` rows per day."""
    tmp = tempfile.mkdtemp()
    recs = []
    eid = 0
    for et, pts in series.items():
        for day, c in pts:
            for _ in range(c):
                recs.append(
                    dict(
                        event_id=eid,
                        ts=pd.Timestamp("1970-01-01") + pd.Timedelta(days=day, hours=3),
                        user_id=eid % 7,
                        event_type=et,
                        value=1.0,
                        props="{}",
                    )
                )
                eid += 1
    df = pd.DataFrame(recs)
    df["ts"] = df["ts"].astype("datetime64[us]")  # Spark can't read NANOS parquet
    df.to_parquet(os.path.join(tmp, "events.parquet"))
    return tmp


def _collect(spark, sf):
    return [r.asDict() for r in mann_kendall_report(spark, sf).collect()]


def test_mk_strict_trend(spark):
    up = [(d, 10 + 3 * d) for d in range(6)]
    down = [(d, 50 - 2 * d) for d in range(5)]
    got = _collect(spark, _write({"up": up, "down": down}))
    assert got == _mirror({"up": up, "down": down})
    by = {r["event_type"]: r for r in got}
    assert by["up"]["s_stat"] == 15 and by["up"]["sen_slope"] == 3.0
    assert by["down"]["s_stat"] == -10 and by["down"]["sen_slope"] == -2.0
    assert by["up"]["z_mk"] > 0 and by["down"]["z_mk"] < 0


def test_mk_flat_all_tied(spark):
    flat = [(d, 7) for d in range(5)]
    got = _collect(spark, _write({"flat": flat}))
    assert got == _mirror({"flat": flat})
    r = got[0]
    assert r["s_stat"] == 0 and r["var18"] == 0
    assert r["z_mk"] == 0.0 and r["sen_slope"] == 0.0


def test_mk_mixed_with_gaps_and_even_median(spark):
    # irregular day spacing (gaps) + an even slope count exercising the
    # two-middle average; partial ties in counts exercise the tie term
    pts = [(0, 5), (2, 9), (3, 5), (7, 12)]
    got = _collect(spark, _write({"mix": pts}))
    assert got == _mirror({"mix": pts})


def test_mk_sf_determinism_and_plan(spark):
    a = _collect(spark, SF)
    assert a == _collect(spark, SF)
    for r in a:
        n0 = r["n_days"] * (r["n_days"] - 1) // 2
        assert abs(r["s_stat"]) <= n0
        assert r["var18"] <= r["n_days"] * (r["n_days"] - 1) * (2 * r["n_days"] + 5)
    from tests.test_plans import plan_of

    plan = plan_of(mann_kendall_report(spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan and "Window" in plan
