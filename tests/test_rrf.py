"""X94 reciprocal-rank fusion (queries.rrf_fusion_report): exact
python-mirror of all three rankers (cosine / dot / negative squared L2,
6dp-rounded with vec_id tiebreaks) and the nano-quantized RRF fold on the
sf0.001 fixture, consensus properties, determinism, plan pins. DuckDB
value identity is the oracle gate's job (ORACLE_RRF_FUSION)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from ocr_output_evaluation_spark.queries import rrf_fusion_report

SF = "/root/testdata/sf0.001"
K_LIST, K_OUT, RRF_K = 50, 10, 60


def _mirror():
    emb = pd.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = emb["vec_id"].tolist()
    mat = np.array([np.asarray(v, dtype=np.float64) for v in emb["embedding"]])
    q = mat[ids.index(0)]
    dots = mat @ q
    norms = np.sqrt((mat * mat).sum(axis=1)) * math.sqrt(float(q @ q))
    sc = [round(d / n, 6) if n != 0 else None for d, n in zip(dots, norms)]
    sd = [round(float(d), 6) for d in dots]
    sl = [-round(float(((v - q) ** 2).sum()), 6) for v in mat]

    def rank(scores):
        present = [(s, i) for s, i in zip(scores, ids) if s is not None]
        present.sort(key=lambda t: (-t[0], t[1]))
        return {i: r for r, (_, i) in enumerate(present[:K_LIST], 1)}

    r1, r2, r3 = rank(sc), rank(sd), rank(sl)
    fused = {}
    for i in set(r1) | set(r2) | set(r3):
        nano = sum(
            round(1e9 / float(RRF_K + r[i])) for r in (r1, r2, r3) if i in r
        )
        in_lists = sum(1 for r in (r1, r2, r3) if i in r)
        fused[i] = (in_lists, int(nano))
    top = sorted(fused.items(), key=lambda t: (-t[1][1], t[0]))[:K_OUT]
    return [
        (i, in_lists, nano, round(nano / 1e9, 6)) for i, (in_lists, nano) in top
    ]


def test_rrf_python_mirror(spark):
    want = _mirror()
    got = [tuple(r) for r in rrf_fusion_report(spark, SF).collect()]
    assert got == want


def test_rrf_consensus_properties(spark):
    rows = rrf_fusion_report(spark, SF).collect()
    assert len(rows) == K_OUT
    by_id = {r.vec_id: r for r in rows}
    # the query vector itself is rank 1 in all three rankers: fused first
    assert rows[0].vec_id == 0
    assert by_id[0].in_lists == 3
    assert by_id[0].rrf_nano == 3 * round(1e9 / (RRF_K + 1))
    # fused scores are sorted desc with vec_id tiebreak, all within bounds
    nanos = [r.rrf_nano for r in rows]
    assert nanos == sorted(nanos, reverse=True)
    for r in rows:
        assert 1 <= r.in_lists <= 3
        assert 0 < r.rrf_nano <= 3 * round(1e9 / (RRF_K + 1))


def test_rrf_determinism_and_plan(spark):
    from tests.test_plans import plan_of

    a = [tuple(r) for r in rrf_fusion_report(spark, SF).collect()]
    b = [tuple(r) for r in rrf_fusion_report(spark, SF).collect()]
    assert a == b
    plan = plan_of(rrf_fusion_report(spark, SF))
    # ONE persisted scoring pass feeds three TakeOrdered branches
    assert "InMemoryTableScan" in plan
    assert plan.count("TakeOrderedAndProject") >= 3
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
