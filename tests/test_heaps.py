"""X134 Heaps'-law vocabulary growth (queries.heaps_law_report): exact
python mirror over planted corpora, closed-vocab corpus beta=0 with R2
NULL, single-point fit NULL-guarded, sqrt-growth corpus recovers
beta~0.5 on the doubling-checkpoint grid, determinism + plan pins.
DuckDB value identity is the oracle gate's job (ORACLE_HEAPS_LAW)."""

from __future__ import annotations

import math
import os
import re
import tempfile

import pandas as pd

from ocr_output_evaluation_spark.queries import _HEAPS_CPS, heaps_law_report

SF = "/root/testdata/sf0.001"


def _toks(text):
    t = re.sub(r"\s+", " ", re.sub(r"[^a-z ]+", " ", text.lower())).strip()
    return t.split(" ") if t else []


def _mirror(texts):
    docs = list(enumerate(texts))
    per_doc = [(i, len(_toks(s))) for i, s in docs]
    first = {}
    for i, s in docs:
        for tok in _toks(s):
            if tok not in first:
                first[tok] = i
    lo = min(i for i, _ in per_doc)
    hi = max(i for i, _ in per_doc)
    span = hi - lo + 1
    pts = []
    for cp in range(1, _HEAPS_CPS + 1):
        cut = lo + span // (2 ** (_HEAPS_CPS - cp)) - 1
        nd = sum(1 for i, _ in per_doc if i <= cut)
        ntok = sum(nt for i, nt in per_doc if i <= cut)
        v = sum(1 for fd in first.values() if fd <= cut)
        if ntok > 0 and v > 0:
            pts.append(
                dict(
                    cp=cp,
                    cut=cut,
                    n_docs_prefix=nd,
                    n_tokens=ntok,
                    v_types=v,
                    x_nano=round(math.log(ntok) * 1e9),
                    y_nano=round(math.log(v) * 1e9),
                )
            )
    m = len(pts)
    sx = sum(p["x_nano"] for p in pts)
    sy = sum(p["y_nano"] for p in pts)
    sxx = sum(p["x_nano"] ** 2 for p in pts)
    sxy = sum(p["x_nano"] * p["y_nano"] for p in pts)
    syy = sum(p["y_nano"] ** 2 for p in pts)
    mf, sxf, syf = float(m), float(sx), float(sy)
    sxxf, sxyf, syyf = float(sxx), float(sxy), float(syy)
    den = mf * sxxf - sxf * sxf
    deny = mf * syyf - syf * syf
    beta = (mf * sxyf - sxf * syf) / den if den != 0 else None
    lnk = (syf - beta * sxf) / mf / 1e9 if den != 0 else None
    r2 = (
        (mf * sxyf - sxf * syf) ** 2 / (den * deny)
        if den != 0 and deny != 0
        else None
    )
    for p in pts:
        p.update(
            n_points=m,
            beta=round(beta, 6) if beta is not None else None,
            log_k=round(lnk, 6) if lnk is not None else None,
            r2=round(r2, 6) if r2 is not None else None,
        )
    return pts


def _write(texts):
    tmp = tempfile.mkdtemp()
    pd.DataFrame(
        [
            dict(doc_id=i, text=s, lang="en", source="s0", n_chars=len(s))
            for i, s in enumerate(texts)
        ]
    ).to_parquet(os.path.join(tmp, "documents.parquet"))
    return tmp


def _collect(spark, sf):
    return [r.asDict() for r in heaps_law_report(spark, sf).collect()]


def _word(i):
    return "w" + format(i, "x").replace("0", "g").replace("1", "h").replace(
        "2", "i"
    ).replace("3", "j").replace("4", "k").replace("5", "l").replace(
        "6", "m"
    ).replace("7", "n").replace("8", "o").replace("9", "p")


def test_heaps_closed_vocab_beta_zero(spark):
    texts = ["foo foo foo"] * 64
    got = _collect(spark, _write(texts))
    assert got == _mirror(texts)
    assert got and all(r["v_types"] == 1 for r in got)
    assert got[0]["beta"] == 0.0 and got[0]["r2"] is None


def test_heaps_single_point_null_fit(spark):
    texts = ["abc def ghi"]
    got = _collect(spark, _write(texts))
    assert got == _mirror(texts)
    assert len(got) == 1 and got[0]["n_points"] == 1
    assert got[0]["beta"] is None and got[0]["log_k"] is None


def test_heaps_sqrt_growth_recovers_beta_half(spark):
    # doc i: 8 tokens, new types minted so V(prefix) ~ sqrt(N(prefix)):
    # by doc i the corpus has 8(i+1) tokens; mint types up to
    # ceil(sqrt(8(i+1))) using repeats of type floor(sqrt(8j)) per slot
    texts = []
    k = 0
    for i in range(256):
        row = []
        for _ in range(8):
            row.append(_word(int(math.isqrt(k))))
            k += 1
        texts.append(" ".join(row))
    got = _collect(spark, _write(texts))
    assert got == _mirror(texts)
    r = got[-1]
    assert 0.4 < r["beta"] < 0.6 and r["r2"] > 0.98


def test_heaps_monotone_curve_invariants(spark):
    texts = [" ".join(_word(3 * i + j) for j in range(5)) for i in range(100)]
    got = _collect(spark, _write(texts))
    assert got == _mirror(texts)
    for a, b in zip(got, got[1:]):
        assert b["n_tokens"] >= a["n_tokens"] and b["v_types"] >= a["v_types"]
        assert b["n_docs_prefix"] >= a["n_docs_prefix"]


def test_heaps_sf_determinism_and_plan(spark):
    a = _collect(spark, SF)
    assert a == _collect(spark, SF)
    assert len(a) >= 2
    assert all(r["v_types"] <= r["n_tokens"] for r in a)
    from tests.test_plans import plan_of

    plan = plan_of(heaps_law_report(spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan
