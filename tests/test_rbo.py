"""X91 rank-biased overlap (queries.rbo_report): exact python-mirror of
BOTH rankings (BM25 and naive Σtf, replicated double-for-double in the
written operand order) and the truncated RBO@20 on the sf0.001 fixture,
bounds, determinism, plan pins. DuckDB value identity is the oracle
gate's job (_oracle_rbo — the BM25 CTE body + the same depth terms)."""

from __future__ import annotations

import math

import pandas as pd

from ocr_output_evaluation_spark.queries import _BM25_TERMS, rbo_report
from tests.test_corpus_stats import _tokens

SF = "/root/testdata/sf0.001"
K, P = 20, 0.9


def _mirror():
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    rows = []
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        toks = _tokens(text)
        rows.append(
            (doc_id, len(toks), [sum(1 for x in toks if x == t) for t in _BM25_TERMS])
        )
    n = len(rows)
    tot = sum(r[1] for r in rows)
    avgdl = tot / n
    dfs = [sum(1 for r in rows if r[2][i] > 0) for i in range(len(_BM25_TERMS))]
    bm_scores = []
    for doc_id, dl, tfs in rows:
        s = 0.0
        for i in range(len(_BM25_TERMS)):
            idf = math.log((n - dfs[i] + 0.5) / (dfs[i] + 0.5) + 1.0)
            s = s + idf * (tfs[i] * 2.2) / (tfs[i] + 1.2 * (0.25 + 0.75 * (dl / avgdl)))
        bm_scores.append((doc_id, round(s, 6)))
    bm_scores.sort(key=lambda r: (-r[1], r[0]))
    r1 = {doc_id: i for i, (doc_id, _) in enumerate(bm_scores[:K], 1)}
    tf_scores = sorted(
        ((doc_id, sum(tfs)) for doc_id, _, tfs in rows), key=lambda r: (-r[1], r[0])
    )
    r2 = {doc_id: i for i, (doc_id, _) in enumerate(tf_scores[:K], 1)}
    sn = 0
    a_k = 0
    for d in range(1, K + 1):
        a_d = sum(1 for x in r1 if x in r2 and r1[x] <= d and r2[x] <= d)
        if d == K:
            a_k = a_d
        sn += round(((1.0 - P) * (P ** float(d - 1)) * (a_d / d)) * 1e9)
    return a_k, round(a_k / float(K), 6), round(sn / 1e9, 6)


def test_rbo_python_mirror(spark):
    a_k, overlap, rbo = _mirror()
    rows = rbo_report(spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.k, r.p) == (K, P)
    assert (r.overlap_count_at_k, r.overlap_at_k, r.rbo) == (a_k, overlap, rbo)
    # truncated RBO@k is bounded by the identical-ranking value 1 - p^k
    assert 0.0 <= r.rbo <= (1.0 - P ** K) + 1e-9
    assert 0 <= r.overlap_count_at_k <= K


def test_rbo_determinism_and_plan(spark):
    from tests.test_plans import plan_of

    a = [tuple(r) for r in rbo_report(spark, SF).collect()]
    b = [tuple(r) for r in rbo_report(spark, SF).collect()]
    assert a == b
    plan = plan_of(rbo_report(spark, SF))
    # two TakeOrdered top-k scans; the depth comparison joins a broadcast
    # <=2k-row frame; nothing drops to Python
    assert plan.count("TakeOrderedAndProject") >= 2
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
