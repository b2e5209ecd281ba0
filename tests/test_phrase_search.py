"""X88 positional-index exact phrase search
(queries.phrase_search_report): exact python-mirror counts on the
sf0.001 fixture corpus (incl. overlapping-match semantics on a planted
corpus), zero-hit row stability, determinism, plan pins. DuckDB value
identity is the oracle gate's job (ORACLE_PHRASE_SEARCH — an
independent in-row list-slice scan, no postings/joins)."""

from __future__ import annotations

from collections import defaultdict

import pandas as pd

from ocr_output_evaluation_spark.queries import PHRASE_QUERIES, phrase_search_report
from tests.test_corpus_stats import _tokens

SF = "/root/testdata/sf0.001"


def _mirror(docs: pd.DataFrame):
    out = {}
    for ph in PHRASE_QUERIES:
        p = ph.split()
        k = len(p)
        per_doc = {}
        for doc_id, text in zip(docs["doc_id"], docs["text"]):
            toks = _tokens(text)
            c = sum(1 for i in range(len(toks) - k + 1) if toks[i : i + k] == p)
            if c:
                per_doc[doc_id] = c
        if per_doc:
            top = max(per_doc.items(), key=lambda kv: (kv[1], -kv[0]))
            out[ph] = (len(per_doc), sum(per_doc.values()), top[0], top[1])
        else:
            out[ph] = (0, 0, None, None)
    return out


def test_phrase_search_python_mirror(spark):
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    expected = _mirror(docs)
    rows = phrase_search_report(spark, SF).collect()
    assert [r.phrase for r in rows] == sorted(PHRASE_QUERIES)
    for r in rows:
        assert (r.n_docs, r.n_occurrences, r.top_doc, r.top_doc_occ) == expected[
            r.phrase
        ], r.phrase
    # every queried phrase keeps its row even with zero hits
    assert len(rows) == len(PHRASE_QUERIES)


def test_phrase_overlap_semantics(spark, tmp_path):
    # "batch batch batch batch" contains "batch batch batch" TWICE
    # (token-position overlap); "x batch batch batch x" once; a doc with
    # the words scattered, zero times
    rows = [
        {"doc_id": 1, "text": "batch batch batch batch", "lang": "en", "source": "s"},
        {"doc_id": 2, "text": "x batch batch batch x", "lang": "en", "source": "s"},
        {"doc_id": 3, "text": "batch x batch x batch", "lang": "en", "source": "s"},
    ]
    pd.DataFrame(rows).to_parquet(tmp_path / "documents.parquet")
    out = {r.phrase: r for r in phrase_search_report(spark, str(tmp_path)).collect()}
    r = out["batch batch batch"]
    assert (r.n_docs, r.n_occurrences, r.top_doc, r.top_doc_occ) == (2, 3, 1, 2)


def test_phrase_search_plan_and_determinism(spark):
    from tests.test_plans import plan_of

    a = [tuple(r) for r in phrase_search_report(spark, SF).collect()]
    b = [tuple(r) for r in phrase_search_report(spark, SF).collect()]
    assert a == b
    plan = plan_of(phrase_search_report(spark, SF))
    # postings are term-filtered before any shuffle and persisted (fan
    # into per-term branches); nothing drops to Python
    assert "InMemoryTableScan" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
