"""X58 HITS: python-model crosscheck of the exact micro fixed-point
trajectory, role-separation semantics, and fuzz over random graphs."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ocr_output_evaluation_spark.operators.hits import UNIT, hits

FAST = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)


def _py_hits(nodes, edges, n_iters=4):
    h = {v: UNIT for v in nodes}
    a = {v: 0 for v in nodes}
    for _ in range(n_iters):
        araw = {v: 0 for v in nodes}
        for s, d in edges:
            araw[d] += h[s]
        am = max(max(araw.values(), default=0), 1)
        a = {v: araw[v] * UNIT // am for v in nodes}
        hraw = {v: 0 for v in nodes}
        for s, d in edges:
            hraw[s] += a[d]
        hm = max(max(hraw.values(), default=0), 1)
        h = {v: hraw[v] * UNIT // hm for v in nodes}
    return a, h


def _run(spark, nodes_py, edges_py, n_iters=4):
    nodes = spark.createDataFrame([(v,) for v in nodes_py], "node long")
    edges = (
        spark.createDataFrame(edges_py, "src long, dst long")
        if edges_py
        else spark.createDataFrame([], "src long, dst long")
    )
    return {
        r.node: (r.authority_micro, r.hub_micro)
        for r in hits(nodes, edges, n_iters=n_iters).collect()
    }


def test_role_separation(spark):
    # 0,1,2 all point at 3: 3 is the pure authority (10^6, hub 0);
    # 0-2 are pure hubs (hub 10^6, authority 0); 4 is isolated.
    got = _run(spark, list(range(5)), [(0, 3), (1, 3), (2, 3)])
    assert got[3] == (UNIT, 0)
    assert got[0] == (0, UNIT) and got[1] == (0, UNIT) and got[2] == (0, UNIT)
    assert got[4] == (0, 0)


def test_matches_python_model(spark):
    edges = [(0, 1), (0, 2), (1, 2), (3, 2), (2, 4), (4, 0), (0, 2)]
    nodes = list(range(6))
    got = _run(spark, nodes, edges)
    a, h = _py_hits(nodes, edges)
    assert got == {v: (a[v], h[v]) for v in nodes}


@settings(**FAST)
@given(
    n=st.integers(2, 10),
    edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)),
        min_size=0,
        max_size=25,
    ),
    iters=st.integers(1, 3),
)
def test_hits_fuzz_matches_python_model(spark, n, edges, iters):
    nodes = list(range(n))
    ep = [(s, d) for s, d in edges if s < n and d < n and s != d]
    got = _run(spark, nodes, ep, n_iters=iters)
    a, h = _py_hits(nodes, ep, n_iters=iters)
    assert got == {v: (a[v], h[v]) for v in nodes}


def test_zero_iterations_rejected(spark):
    import pytest

    nodes = spark.createDataFrame([(1,)], "node long")
    edges = spark.createDataFrame([(1, 1)], "src long, dst long")
    with pytest.raises(ValueError, match="n_iters"):
        hits(nodes, edges, n_iters=0)
