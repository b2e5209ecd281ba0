"""X89 Dunning log-likelihood-ratio collocations
(operators/pmi.py llr_collocations): exact python-mirror on the
sf0.001 fixture corpus, a hand-checkable planted fixture where LLR must
out-rank the hapax pairs PMI would prefer, and plan pins. DuckDB value
identity is the oracle gate's job (ORACLE_LLR_COLLOCATIONS)."""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd

from ocr_output_evaluation_spark.queries import llr_collocations_report
from tests.test_corpus_stats import _tokens

SF = "/root/testdata/sf0.001"


def _mirror(texts, min_count=3, top_k=20):
    pairs: Counter = Counter()
    for text in texts:
        toks = _tokens(text)
        for a, b in zip(toks, toks[1:]):
            pairs[(a, b)] += 1
    cf, cs = Counter(), Counter()
    for (a, b), c in pairs.items():
        cf[a] += c
        cs[b] += c
    B = sum(pairs.values())

    def cell(k, r, c):
        return k * math.log((k * B) / (r * c)) if k > 0 else 0.0

    out = []
    for (a, b), c12 in pairs.items():
        if c12 < min_count:
            continue
        c1, c2 = cf[a], cs[b]
        llr = 2.0 * (
            cell(c12, c1, c2)
            + cell(c1 - c12, c1, B - c2)
            + cell(c2 - c12, B - c1, c2)
            + cell(B - c1 - c2 + c12, B - c1, B - c2)
        )
        out.append((a, b, c12, c1, c2, round(llr, 6)))
    out.sort(key=lambda r: (-r[5], r[0], r[1]))
    return out[:top_k]


def test_llr_python_mirror(spark):
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    expected = _mirror(docs["text"].tolist())
    rows = llr_collocations_report(spark, SF).collect()
    assert [(r.w1, r.w2, r.c12, r.c1, r.c2, r.llr) for r in rows] == expected
    # G² of an observed pair is non-negative
    assert all(r.llr >= 0.0 for r in rows) and len(rows) == 20


def test_llr_prefers_systematic_over_hapax(spark, tmp_path):
    # "alpha beta" co-occurs 10/10 times alpha appears (systematic);
    # filler pairs are incidental. LLR must rank the systematic pair
    # first — the calibration property PMI lacks at low counts.
    rows = []
    for i in range(10):
        rows.append({"doc_id": i, "text": "alpha beta", "lang": "en", "source": "s"})
    for i in range(10, 40):
        a, b, c = "abcdefg"[i % 7], "hijkl"[i % 5], "mno"[i % 3]
        rows.append(
            {"doc_id": i, "lang": "en", "source": "s",
             "text": f"w{a} x{b} y{c} z{a} w{b} x{c} y{a} z{b}"}
        )
    pd.DataFrame(rows).to_parquet(tmp_path / "documents.parquet")
    out = llr_collocations_report(spark, str(tmp_path)).collect()
    assert out and (out[0].w1, out[0].w2) == ("alpha", "beta")
    expected = _mirror([r["text"] for r in rows])
    assert [(r.w1, r.w2, r.c12, r.c1, r.c2, r.llr) for r in out] == expected


def test_llr_plan(spark):
    from tests.test_plans import plan_of

    plan = plan_of(llr_collocations_report(spark, SF))
    # the full pair frame persists (fans into margins/total/candidates);
    # the total broadcasts; the LIMIT is TakeOrdered; nothing in Python
    assert "InMemoryTableScan" in plan
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
