"""X108 cumulative gains / lift (queries.gains_report): exact interval-
split mirror, perfect scorer front-loads all positives, tie-straddling
value split proportionally, uniform scorer lift=1, determinism + decile
partition invariants, plan pins. DuckDB value identity is the oracle
gate's job (ORACLE_GAINS)."""

from __future__ import annotations

import os
import tempfile

import pandas as pd

from ocr_output_evaluation_spark.queries import gains_report

SF = "/root/testdata/sf0.001"


def _mirror(rows):
    """rows: list[(score, y)] -> 10 report dicts."""
    agg: dict[int, list[int]] = {}
    for s, y in rows:
        c = agg.setdefault(s, [0, 0])
        c[0] += 1
        c[1] += y
    nt = sum(v[0] for v in agg.values())
    pt = sum(v[1] for v in agg.values())
    # descending rank intervals per value
    iv = []
    hi = 0
    for s in sorted(agg, reverse=True):
        n, pos = agg[s]
        lo = hi
        hi += n
        iv.append((lo, hi, n, pos))
    out = []
    cum_docs = cum_pn = 0
    for d in range(1, 11):
        b0, b1 = (d - 1) * nt // 10, d * nt // 10
        nd = pn = 0
        for lo, hi2, n, pos in iv:
            o = max(0, min(hi2, b1) - max(lo, b0))
            nd += o
            if o > 0:
                pn += round(1e9 * pos * o / n)
        cum_docs += nd
        cum_pn += pn
        out.append(
            dict(
                decile=d,
                n_docs=nd,
                pos_nano=pn,
                cum_docs=cum_docs,
                cum_pos_nano=cum_pn,
                gain=round(cum_pn / (1e9 * pt), 6) if pt else None,
                lift=round(cum_pn * nt / (1e9 * pt * cum_docs), 6)
                if pt and cum_docs
                else None,
            )
        )
    return out


def _write(score_rows):
    tmp = tempfile.mkdtemp()
    texts, langs = [], []
    for s, y in score_rows:
        texts.append(" ".join(["the"] * s + ["zzz"] * (1000 - s)))
        langs.append("en" if y else "de")
    pd.DataFrame(
        {
            "doc_id": range(len(score_rows)),
            "text": texts,
            "lang": langs,
            "source": "src0",
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(os.path.join(tmp, "documents.parquet"))
    return tmp


def _collect(spark, sf):
    return [r.asDict() for r in gains_report(spark, sf).collect()]


def test_gains_perfect_scorer(spark):
    # 2 positives at the top of 20 docs -> decile 1 captures all: gain 1.0
    rows = [(900, 1)] * 2 + [(100, 0)] * 18
    got = _collect(spark, _write(rows))
    assert got == _mirror(rows)
    assert got[0]["gain"] == 1.0 and got[0]["lift"] == 10.0
    assert got[9]["gain"] == 1.0 and got[9]["lift"] == 1.0


def test_gains_tie_straddle_proportional(spark):
    # one value of 10 docs (3 pos) straddles deciles of a 20-doc corpus:
    # each decile gets 2 docs of it -> 0.6 positives nano-exactly
    rows = [(500, 1)] * 3 + [(500, 0)] * 7 + [(100, 0)] * 10
    got = _collect(spark, _write(rows))
    assert got == _mirror(rows)
    assert got[0]["n_docs"] == 2 and got[0]["pos_nano"] == 600_000_000


def test_gains_uniform_scorer_flat_lift(spark):
    # same score everywhere: every decile is a proportional slice -> lift 1
    rows = [(400, 1)] * 5 + [(400, 0)] * 15
    got = _collect(spark, _write(rows))
    assert got == _mirror(rows)
    assert all(r["lift"] == 1.0 for r in got)


def test_gains_sf_determinism_and_plan(spark):
    a = _collect(spark, SF)
    assert a == _collect(spark, SF)
    assert [r["decile"] for r in a] == list(range(1, 11))
    assert a[-1]["cum_docs"] == sum(r["n_docs"] for r in a)
    assert a[-1]["gain"] == 1.0  # all positives captured by decile 10
    gains = [r["gain"] for r in a]
    assert gains == sorted(gains), "gain must be non-decreasing"
    from tests.test_plans import plan_of

    plan = plan_of(gains_report(spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Window" in plan and "HashAggregate" in plan
