"""X137 Hill power-law tail index (queries.hill_tail_report): exact
python mirror over planted frequency profiles, empty-tail NULL guard,
geometric-frequency corpus recovers the closed-form alpha, term_nano of
count==x_min is exactly 0, determinism + plan pins. DuckDB value
identity is the oracle gate's job (ORACLE_HILL_TAIL)."""

from __future__ import annotations

import math
import os
import re
import tempfile

import pandas as pd

from ocr_output_evaluation_spark.queries import _HILL_XMIN, hill_tail_report

SF = "/root/testdata/sf0.001"


def _toks(text):
    t = re.sub(r"\s+", " ", re.sub(r"[^a-z ]+", " ", text.lower())).strip()
    return t.split(" ") if t else []


def _mirror(texts):
    tc = {}
    for s in texts:
        for tok in _toks(s):
            tc[tok] = tc.get(tok, 0) + 1
    fof = {}
    for c in tc.values():
        fof[c] = fof.get(c, 0) + 1
    n_types = sum(fof.values())
    n_tokens = sum(m * c for c, m in fof.items())
    tail = {c: m for c, m in fof.items() if c >= _HILL_XMIN}
    n_tail = sum(tail.values())
    ssum = sum(
        m * round(math.log(c / float(_HILL_XMIN)) * 1e9)
        for c, m in tail.items()
    )
    alpha = 1.0 + n_tail * 1e9 / ssum if ssum > 0 else None
    rows = []
    for c in sorted(tail):
        rows.append(
            dict(
                count_value=c,
                m_c=tail[c],
                term_nano=tail[c]
                * round(math.log(c / float(_HILL_XMIN)) * 1e9),
                n_tail=n_tail,
                n_types=n_types,
                n_tokens=n_tokens,
                alpha_hill=round(alpha, 6) if alpha is not None else None,
                alpha_se=round((alpha - 1.0) / math.sqrt(n_tail), 6)
                if alpha is not None and n_tail > 0
                else None,
                tail_share=round(n_tail / n_types, 6) if n_types else None,
            )
        )
    return rows


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
    return [r.asDict() for r in hill_tail_report(spark, sf).collect()]


def test_hill_empty_tail_no_rows(spark):
    # every token appears < x_min times -> empty tail, no output rows
    texts = ["aaa bbb ccc", "ddd eee fff", "aaa ggg hhh"]
    got = _collect(spark, _write(texts))
    assert got == _mirror(texts) == []


def test_hill_xmin_boundary_term_zero(spark):
    # a token at exactly x_min contributes ln(1)=0 to the tail sum but
    # counts toward n_tail
    texts = ["edge"] * _HILL_XMIN + ["busy"] * 20
    got = _collect(spark, _write(texts))
    assert got == _mirror(texts)
    by = {r["count_value"]: r for r in got}
    assert by[_HILL_XMIN]["term_nano"] == 0
    assert by[_HILL_XMIN]["n_tail"] == 2


def test_hill_geometric_profile_alpha(spark):
    # counts 5,10,20,40,80 (one token each): alpha = 1 + 5/sum(ln(2^k))
    # = 1 + 5/(10 ln 2)
    texts = []
    for i, c in enumerate((5, 10, 20, 40, 80)):
        texts.extend([f"tok{'abcde'[i]}"] * c)
    got = _collect(spark, _write([" ".join(texts[i::7]) for i in range(7)]))
    # distribute across docs without changing counts
    flat = _mirror([" ".join(texts[i::7]) for i in range(7)])
    assert got == flat
    want = 1.0 + 5.0 / (10.0 * math.log(2.0))
    assert abs(got[0]["alpha_hill"] - want) < 1e-5


def test_hill_sf_determinism_and_plan(spark):
    a = _collect(spark, SF)
    assert a == _collect(spark, SF)
    if a:
        r = a[0]
        assert r["alpha_hill"] > 1.0 and 0.0 < r["tail_share"] <= 1.0
        assert all(x["n_tail"] == r["n_tail"] for x in a)
    from tests.test_plans import plan_of

    plan = plan_of(hill_tail_report(spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan
