"""X97 Benjamini-Hochberg FDR over per-source KS tests
(queries.bh_fdr_report): hand-computed python mirror (leave-one-out
ECDFs, nano p, step-up), planted drifted-source detection, step-up
(not step-down) semantics pin, determinism, plan pins. DuckDB value
identity is the oracle gate's job (ORACLE_BH_FDR)."""

from __future__ import annotations

import math
import os
import tempfile
from collections import Counter

import pandas as pd

from ocr_output_evaluation_spark.queries import bh_fdr_report

SF = "/root/testdata/sf0.001"


def _mirror(rows):
    """rows: list[(source, n_chars)] -> list of report dicts by bh_rank."""
    per = Counter(rows)
    srcs = sorted({s for s, _ in rows})
    vals = sorted({v for _, v in rows})
    tot = Counter(v for _, v in rows)
    out = []
    for s in srcs:
        cums = cuma = 0
        ns = sum(c for (src, _), c in per.items() if src == s)
        na = len(rows)
        nr = na - ns
        d_num = 0
        for v in vals:
            cums += per.get((s, v), 0)
            cuma += tot[v]
            d_num = max(d_num, abs(cums * nr - (cuma - cums) * ns))
        prod, nsum = ns * nr, ns + nr
        p = (
            min(1.0, 2.0 * math.exp(-2.0 * d_num * d_num / (prod * nsum)))
            if prod > 0
            else None
        )
        out.append(
            dict(
                source=s,
                n_src=ns,
                n_rest=nr,
                d_num=d_num,
                d_stat=round(d_num / prod, 6) if prod else None,
                p_nano=round(p * 1e9) if p is not None else None,
            )
        )
    out.sort(key=lambda r: (r["p_nano"], r["source"]))
    m = len(out)
    kmax = 0
    for k, r in enumerate(out, 1):
        r["bh_rank"] = k
        r["bh_thr_nano"] = round(k * 0.05 / m * 1e9)
        if r["p_nano"] <= r["bh_thr_nano"]:
            kmax = k
    for r in out:
        r["rejected"] = 1 if r["bh_rank"] <= kmax else 0
        r["p_value"] = round(r["p_nano"] / 1e9, 6)
        del r["p_nano"]
    return out


def _write(rows):
    tmp = tempfile.mkdtemp()
    pd.DataFrame(
        {
            "doc_id": range(len(rows)),
            "text": ["w" * n for _, n in rows],
            "lang": "en",
            "source": [s for s, _ in rows],
            "n_chars": [n for _, n in rows],
        }
    ).to_parquet(os.path.join(tmp, "documents.parquet"))
    return tmp


def _collect(spark, sf):
    return [r.asDict() for r in bh_fdr_report(spark, sf).collect()]


def test_bh_planted_drift_detected(spark):
    # 5 sources share one length mix; srcDRIFT ships uniformly longer
    # docs -> its KS p crushes to ~0 and BH must reject exactly it
    rows = []
    for s in ("srcA", "srcB", "srcC", "srcD", "srcE"):
        rows += [(s, v) for v in (100, 150, 200, 250, 300) * 8]
    rows += [("srcDRIFT", 900 + i) for i in range(40)]
    got = _collect(spark, _write(rows))
    assert got == _mirror(rows)
    rej = {r["source"] for r in got if r["rejected"]}
    assert rej == {"srcDRIFT"}


def test_bh_step_up_semantics(spark):
    # step-up: a rank below kmax is rejected even if ITS OWN p > its
    # threshold. Build 3 sources: two heavy drifts + one mild; verify
    # the rejected set is a prefix of the bh_rank order.
    rows = []
    rows += [("base1", v) for v in (100, 200) * 30]
    rows += [("base2", v) for v in (100, 200) * 30]
    rows += [("drift1", 900 + i) for i in range(30)]
    rows += [("drift2", 500 + i) for i in range(30)]
    got = _collect(spark, _write(rows))
    assert got == _mirror(rows)
    flags = [r["rejected"] for r in got]  # already ordered by bh_rank
    assert flags == sorted(flags, reverse=True), "rejections must be a prefix"


def test_bh_no_drift_no_rejections(spark):
    rows = [(s, v) for s in ("a", "b", "c") for v in (100, 200, 300) * 10]
    got = _collect(spark, _write(rows))
    assert got == _mirror(rows)
    assert all(r["rejected"] == 0 for r in got)
    assert all(r["d_num"] == 0 for r in got)  # identical mixes -> D = 0


def test_bh_sf_determinism_and_plan(spark):
    a = _collect(spark, SF)
    assert a == _collect(spark, SF)
    assert [r["bh_rank"] for r in a] == list(range(1, len(a) + 1))
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["source", "n_chars"])
    assert a == _mirror([(r.source, int(r.n_chars)) for r in docs.itertuples()])
    from tests.test_plans import plan_of

    plan = plan_of(bh_fdr_report(spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Window" in plan and "HashAggregate" in plan
