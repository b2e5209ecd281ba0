"""X55 degree-oriented triangle counting: brute-force crosscheck,
exactly-once enumeration, planted-structure counts, plan shape."""

import io
from contextlib import redirect_stdout
from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ocr_output_evaluation_spark.operators.triangles import (
    node_triangle_counts,
    triangle_corners,
)
from ocr_output_evaluation_spark.queries import triangle_count_report

FAST = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)


def _brute(edges):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = {n for e in und for n in e}
    tris = {
        t
        for t in combinations(sorted(nodes), 3)
        if {(t[0], t[1]), (t[0], t[2]), (t[1], t[2])} <= und
    }
    return tris


def _edges_df(spark, edges):
    if not edges:
        return spark.createDataFrame([], "src long, dst long")
    return spark.createDataFrame(edges, "src long, dst long")


def test_known_graph(spark):
    # K4 has 4 triangles; a pendant edge adds none
    k4 = [(a, b) for a, b in combinations(range(4), 2)]
    got = triangle_corners(_edges_df(spark, k4 + [(3, 9)])).collect()
    assert len(got) == 4
    # each triangle enumerated exactly once, as an unordered set
    assert {frozenset((r.x, r.y, r.z)) for r in got} == {
        frozenset(t) for t in _brute(k4)
    }
    counts = {
        r.node: r.n_tri
        for r in node_triangle_counts(_edges_df(spark, k4)).collect()
    }
    assert counts == {0: 3, 1: 3, 2: 3, 3: 3}


@settings(**FAST)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)),
        min_size=0,
        max_size=25,
    )
)
def test_triangles_fuzz_match_brute_force(spark, edges):
    # duplicates, self-loops, both orientations — the operator must see
    # through all of them to the simple undirected graph
    got = triangle_corners(_edges_df(spark, edges)).collect()
    want = _brute(edges)
    assert len(got) == len(want)  # exactly-once enumeration
    assert {frozenset((r.x, r.y, r.z)) for r in got} == {
        frozenset(t) for t in want
    }


def test_report_ring_floor_and_order(spark, sf_dir):
    rows = triangle_count_report(spark, sf_dir).collect()
    assert len(rows) == 15
    # the ring lattice alone puts every node in >= 3 triangles, so the
    # top-15 (head of the distribution) must all clear that floor
    assert all(r.n_tri >= 3 for r in rows)
    ks = [(-r.n_tri, r.node) for r in rows]
    assert ks == sorted(ks)


def test_plan_no_cartesian(spark, sf_dir):
    df = triangle_count_report(spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan  # every join is keyed
    assert "TakeOrderedAndProject" in plan
