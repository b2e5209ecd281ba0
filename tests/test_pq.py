"""X42 product-quantization ANN (operators/pq.py): pure-Python model
crosscheck of the full trajectory (seeds, quantized Lloyd per subspace,
encode, ADC), planted-cluster retrieval, determinism, and plan pins."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from ocr_output_evaluation_spark.operators.pq import (
    PQ_SEED_SALT,
    pq_adc_top_k,
    pq_encode,
    pq_train,
)


def _round6(x: float) -> float:
    s = -1.0 if x < 0 else 1.0
    return s * math.floor(abs(x) * 1e6 + 0.5) / 1e6


def _sq(a, b) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc += (x - y) * (x - y)
    return acc


def _model(vecs: dict[int, list[float]], m: int, k: int, dim: int, iters: int,
           query: list[float], top_k: int):
    sub = dim // m
    order = sorted(
        vecs, key=lambda i: (hashlib.md5(f"{PQ_SEED_SALT}{i}".encode()).hexdigest(), i)
    )
    seeds = [[_round6(x) for x in vecs[i]] for i in order[:k]]
    books = [[s[sp * sub : (sp + 1) * sub] for s in seeds] for sp in range(m)]

    def code(v, sp):
        d = [_round6(_sq(v[sp * sub : (sp + 1) * sub], c)) for c in books[sp]]
        return d.index(min(d))  # first minimum == smallest cid

    for _ in range(iters):
        asg = {i: [code(v, sp) for sp in range(m)] for i, v in vecs.items()}
        for sp in range(m):
            for j in range(k):
                mem = [vecs[i][sp * sub : (sp + 1) * sub]
                       for i in vecs if asg[i][sp] == j]
                if mem:
                    n = len(mem)
                    books[sp][j] = [
                        _round6(sum(v[d] for v in mem) / n) for d in range(sub)
                    ]
    codes = {i: [code(v, sp) for sp in range(m)] for i, v in vecs.items()}
    tables = [
        [_round6(_sq(query[sp * sub : (sp + 1) * sub], c)) for c in books[sp]]
        for sp in range(m)
    ]
    adc = {}
    for i, c in codes.items():
        acc = tables[0][c[0]]
        for sp in range(1, m):
            acc = acc + tables[sp][c[sp]]
        adc[i] = acc
    top = sorted(vecs, key=lambda i: (adc[i], i))[:top_k]
    return books, codes, [(i, _round6(adc[i])) for i in top]


def test_pq_matches_python_model(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    vecs = {i: [round(float(x), 2) for x in rng.normal(size=16)] for i in range(40)}
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    books = pq_train(df, "embedding", "vec_id", m=4, k=8, dim=16, iters=2)
    query = vecs[0]
    want_books, want_codes, want_top = _model(vecs, 4, 8, 16, 2, query, 10)
    assert books == want_books
    got_codes = {
        r.vec_id: [int(c) - 1 for c in r.code]
        for r in pq_encode(df, "embedding", "vec_id", books).collect()
    }
    assert got_codes == want_codes
    got_top = [
        (r.vec_id, r.adc)
        for r in pq_adc_top_k(
            pq_encode(df, "embedding", "vec_id", books), "vec_id", books, query, 10
        ).collect()
    ]
    assert got_top == want_top


def test_pq_finds_planted_cluster_and_is_deterministic(spark):
    """Query + 9 near-copies among far-away noise: quantization error is
    tiny next to the inter-cluster distance, so ADC must retrieve exactly
    the planted group; re-runs are identical."""
    import numpy as np

    rng = np.random.default_rng(5)
    center = rng.normal(size=64) * 0.5
    rows = [(i, (center + rng.normal(scale=1e-3, size=64)).tolist()) for i in range(10)]
    rows += [(100 + i, (rng.normal(size=64) * 0.5 + 5.0).tolist()) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = [float(x) for x in
         df.filter(F.col("vec_id") == 0)
         .select(F.transform("embedding", lambda x: F.round(x, 6)).alias("q"))
         .collect()[0][0]]
    books = pq_train(df, "embedding", "vec_id", m=8, k=16, dim=64, iters=2)
    codes = pq_encode(df, "embedding", "vec_id", books)
    got = [r.vec_id for r in pq_adc_top_k(codes, "vec_id", books, q, 10).collect()]
    assert sorted(got) == list(range(10))
    again = [r.vec_id for r in pq_adc_top_k(codes, "vec_id", books, q, 10).collect()]
    assert got == again


def test_pq_search_scans_codes_only(spark, sf_dir):
    """The ADC query plan must touch only (vec_id, code): no join, no
    shuffle besides the TakeOrdered, no Python, and the embedding column
    pruned out of the scan when codes are a stored table."""
    from tests.test_plans import n_nodes, plan_of, scan_sections

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    books = pq_train(e, "embedding", "vec_id", m=8, k=16, dim=64, iters=1)
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        pq_encode(e, "embedding", "vec_id", books).write.parquet(f"{d}/codes")
        codes = spark.read.parquet(f"{d}/codes")
        q = [0.0] * 64
        plan = plan_of(pq_adc_top_k(codes, "vec_id", books, q, 10))
        assert n_nodes(plan, "TakeOrderedAndProject") == 1
        assert n_nodes(plan, "SortMergeJoin") == 0
        assert n_nodes(plan, "BroadcastHashJoin") == 0
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        for sec in scan_sections(plan):
            assert "embedding" not in sec  # codes-only scan


def test_ivfpq_finds_planted_cluster_and_probes_prune(spark):
    """X43: the planted query-cluster must survive coarse routing + residual
    quantization; results come only from probed cells; probing every cell
    reproduces a superset ranking; re-runs identical."""
    import numpy as np

    from ocr_output_evaluation_spark.operators.pq import ivfpq_build, ivfpq_top_k

    rng = np.random.default_rng(9)
    center = rng.normal(size=64) * 0.5
    rows = [(i, (center + rng.normal(scale=1e-3, size=64)).tolist()) for i in range(10)]
    for g in range(4):  # far-away noise clumps
        c2 = rng.normal(size=64) * 0.5 + (g + 2) * 4.0
        rows += [(100 + g * 50 + i, (c2 + rng.normal(scale=0.1, size=64)).tolist())
                 for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = [float(x) for x in
         df.filter(F.col("vec_id") == 0)
         .select(F.transform("embedding", lambda x: F.round(x, 6)).alias("q"))
         .collect()[0][0]]
    coarse, books, codes = ivfpq_build(df, "embedding", "vec_id",
                                       n_cells=6, m=8, k=16, dim=64, iters=2)
    top = ivfpq_top_k(codes, "vec_id", coarse, books, q, n_probe=2, top_k=10)
    got = [r.vec_id for r in top.collect()]
    assert sorted(got) == list(range(10))  # exactly the planted cluster
    assert got == [r.vec_id for r in top.collect()]  # deterministic

    cells = {r.cell for r in top.collect()}
    from ocr_output_evaluation_spark.operators.pq import ivfpq_probe_cells

    probes = set(ivfpq_probe_cells(spark, coarse, q, 2))
    assert cells <= probes  # nothing outside the probed cells


def test_ivfpq_probe_is_partition_pruned(spark, sf_dir, tmp_path):
    """Codes written partitioned by cell: the probe filter must reach the
    scan as a partition filter (only probed cells read), TakeOrdered tail,
    no joins, no Python."""
    from ocr_output_evaluation_spark.operators.pq import ivfpq_build, ivfpq_top_k
    from tests.test_plans import n_nodes, plan_of

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    coarse, books, codes = ivfpq_build(e, "embedding", "vec_id",
                                       n_cells=8, m=8, k=16, dim=64, iters=1)
    out = str(tmp_path / "codes")
    codes.write.partitionBy("cell").parquet(out)
    stored = spark.read.parquet(out)
    q = [0.1] * 64
    plan = plan_of(ivfpq_top_k(stored, "vec_id", coarse, books, q, n_probe=3, top_k=10))
    assert n_nodes(plan, "TakeOrderedAndProject") == 1
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "PartitionFilters: [" in plan and "cell" in plan.split("PartitionFilters:")[1][:120]
