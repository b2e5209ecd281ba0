"""X136 Cronbach's alpha scorer reliability (queries.cronbach_report):
exact python mirror over planted ASCII corpora (floor(x+0.5) HALF_UP
quantization like both engines), identical-doc zero-variance NULL
guard, dead-item corpus where dropping the constant scorer raises
alpha, alpha<=1 bound, determinism + plan pins. DuckDB value identity
is the oracle gate's job (ORACLE_CRONBACH)."""

from __future__ import annotations

import math
import os
import re
import tempfile

import pandas as pd

from ocr_output_evaluation_spark.queries import cronbach_report

SF = "/root/testdata/sf0.001"

_STOP = r"\b(the|over|quick|dog|fox)\b"


def _q(x):
    return math.floor(x * 1e4 + 0.5)


def _scores(text):
    t = re.sub(r"\s+", " ", re.sub(r"[^a-z ]+", " ", text.lower())).strip()
    toks = t.split(" ") if t else []
    nt = len(toks)
    b3 = len(text)
    if nt == 0 or b3 == 0:
        return None
    a1 = len(re.findall(_STOP, t))
    a2 = len(set(toks))
    a3 = len(re.sub(r"[^a-zA-Z]", "", text))
    return (_q(a1 / nt), _q(a2 / nt), _q(a3 / b3))


def _mirror(texts):
    rows = [s for s in map(_scores, texts) if s is not None]
    n = len(rows)
    s1 = sum(r[0] for r in rows)
    s2 = sum(r[1] for r in rows)
    s3 = sum(r[2] for r in rows)
    q1 = sum(r[0] ** 2 for r in rows)
    q2 = sum(r[1] ** 2 for r in rows)
    q3 = sum(r[2] ** 2 for r in rows)
    c12 = sum(r[0] * r[1] for r in rows)
    c13 = sum(r[0] * r[2] for r in rows)
    c23 = sum(r[1] * r[2] for r in rows)
    v1 = n * q1 - s1 * s1
    v2 = n * q2 - s2 * s2
    v3 = n * q3 - s3 * s3
    cc12 = n * c12 - s1 * s2
    cc13 = n * c13 - s1 * s3
    cc23 = n * c23 - s2 * s3
    vt = v1 + v2 + v3 + 2 * (cc12 + cc13 + cc23)

    def drop(vi, vl, cil):
        den = float(vi) + float(vl) + 2.0 * float(cil)
        if den == 0:
            return None
        return round(2.0 * (1.0 - (float(vi) + float(vl)) / den), 6)

    return dict(
        n_docs=n,
        sum_stop=s1,
        sum_uniq=s2,
        sum_dens=s3,
        var_stop=round(float(v1) / (n * n), 6) if n else None,
        var_uniq=round(float(v2) / (n * n), 6) if n else None,
        var_dens=round(float(v3) / (n * n), 6) if n else None,
        var_total=round(float(vt) / (n * n), 6) if n else None,
        alpha=round(
            1.5 * (1.0 - (float(v1) + float(v2) + float(v3)) / float(vt)), 6
        )
        if float(vt) != 0
        else None,
        alpha_drop_stop=drop(v2, v3, cc23),
        alpha_drop_uniq=drop(v1, v3, cc13),
        alpha_drop_dens=drop(v1, v2, cc12),
    )


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
    return [r.asDict() for r in cronbach_report(spark, sf).collect()]


def test_cronbach_zero_variance_null(spark):
    texts = ["abc def the"] * 8
    got = _collect(spark, _write(texts))
    assert got == [_mirror(texts)]
    r = got[0]
    assert r["var_total"] == 0.0 and r["alpha"] is None


def test_cronbach_dead_item_drop_raises_alpha(spark):
    # no stopwords anywhere (stop scorer constant 0) while distinct
    # ratio and alpha density rise together across docs: dropping the
    # dead item must raise alpha
    texts = [
        "aaa aaa aaa aaa,,,,,,,,",
        "bbb ccc bbb ccc,,,,,,",
        "ddd eee fff ddd,,,,",
        "ggg hhh iii jjj,,",
        "kkk lll mmm nnn",
    ]
    got = _collect(spark, _write(texts))
    assert got == [_mirror(texts)]
    r = got[0]
    assert r["var_stop"] == 0.0
    assert r["alpha_drop_stop"] > r["alpha"]


def test_cronbach_alpha_upper_bound(spark):
    texts = [
        "the quick dog jumps over",
        "zzz yyy xxx www",
        "aaa aaa bbb, ccc ddd!",
        "the the the fox fox",
        "m n o p q r s t",
    ]
    got = _collect(spark, _write(texts))
    assert got == [_mirror(texts)]
    r = got[0]
    assert r["alpha"] is not None and r["alpha"] <= 1.0
    for k in ("alpha_drop_stop", "alpha_drop_uniq", "alpha_drop_dens"):
        assert r[k] is None or r[k] <= 1.0


def test_cronbach_sf_determinism_and_plan(spark):
    a = _collect(spark, SF)
    assert a == _collect(spark, SF)
    assert len(a) == 1 and a[0]["n_docs"] > 0
    assert a[0]["alpha"] is not None and a[0]["alpha"] <= 1.0
    from tests.test_plans import plan_of

    plan = plan_of(cronbach_report(spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan
