"""X61 k-core: brute-force crosscheck (peeling fixpoint), cascade
semantics, convergence certificate, and the report's pins."""

from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ocr_output_evaluation_spark.operators.kcore import k_core
from ocr_output_evaluation_spark.queries import kcore_report

FAST = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)


def _py_kcore(edges, k):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    while True:
        deg = {}
        for a, b in und:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {n for n, d in deg.items() if d >= k}
        nxt = {(a, b) for a, b in und if a in keep and b in keep}
        if nxt == und:
            break
        und = nxt
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    return {n: d for n, d in deg.items() if d >= k}


def _edges_df(spark, edges):
    if not edges:
        return spark.createDataFrame([], "src long, dst long")
    return spark.createDataFrame(edges, "src long, dst long")


def test_cascade_peeling(spark):
    # K4 plus a tail 3-4-5: for k=3 the tail must cascade entirely away
    # (5 falls, then 4, then 3 keeps its K4 membership degree)
    k4 = [(a, b) for a, b in combinations(range(4), 2)]
    edges = k4 + [(3, 4), (4, 5)]
    core, meta = k_core(_edges_df(spark, edges), k=3, n_rounds=6)
    got = {r.node: r.core_deg for r in core.collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}
    m = meta.collect()[0]
    assert m.n_before_last == m.n_after_last  # converged


@settings(**FAST)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 11), st.integers(0, 11)),
        min_size=0,
        max_size=30,
    ),
    k=st.integers(1, 4),
)
def test_kcore_fuzz_matches_brute_force(spark, edges, k):
    core, meta = k_core(_edges_df(spark, edges), k=k, n_rounds=12)
    got = {r.node: r.core_deg for r in core.collect()}
    assert got == _py_kcore(edges, k)
    m = meta.collect()[0]
    assert m.n_before_last == m.n_after_last  # 12 rounds suffice at n<=12


def test_report_shape_and_certificate(spark, sf_dir):
    rows = kcore_report(spark, sf_dir).collect()
    assert rows and all(r.converged == 1 for r in rows)
    assert all(r.core_deg >= 5 for r in rows)
    assert all(r.n_core == rows[0].n_core for r in rows)
    ks = [(-r.core_deg, r.node) for r in rows]
    assert ks == sorted(ks)


def test_zero_rounds_rejected(spark):
    import pytest

    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="n_rounds"):
        k_core(edges, k=1, n_rounds=0)
