"""X67 label propagation: brute-force synchronous-LPA crosscheck, the
two-cliques fixture, the oscillation certificate, isolated-tie and
node-id-cap guard semantics."""

from collections import Counter, defaultdict
from itertools import combinations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ocr_output_evaluation_spark.operators.labelprop import label_propagation

FAST = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)


def _py_lpa(edges, rounds):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj = defaultdict(set)
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    nodes = sorted(adj)
    labels = {n: n for n in nodes}
    changed = None
    for _ in range(rounds):
        new = {}
        for v in nodes:
            cnt = Counter(labels[u] for u in adj[v])
            new[v] = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))[0]
        changed = sum(new[v] != labels[v] for v in nodes)
        labels = new
    return labels, changed


def _run(spark, edges, rounds):
    e = spark.createDataFrame(edges, "src long, dst long")
    labels, meta = label_propagation(e, n_rounds=rounds)
    got = {r.node: r.label for r in labels.collect()}
    return got, meta.collect()[0].n_changed_last


def test_two_cliques_with_bridge_converge(spark):
    tri = lambda off: [(a + off, b + off) for a, b in combinations(range(3), 2)]
    edges = tri(0) + tri(3) + [(2, 3)]
    got, changed = _run(spark, edges, 4)
    assert got == {0: 0, 1: 0, 2: 0, 3: 2, 4: 2, 5: 2}
    assert changed == 0  # converged


def test_single_edge_oscillates_and_certificate_shows_it(spark):
    got, changed = _run(spark, [(0, 1)], 4)
    # synchronous LPA 2-cycles on a single edge: after an even number of
    # rounds labels are back to the identity, and the certificate is honest
    assert got == {0: 0, 1: 1}
    assert changed == 2  # NOT converged — pinned, not hidden


@settings(**FAST)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)),
        min_size=1,
        max_size=25,
    ),
    rounds=st.integers(1, 4),
)
def test_fuzz_matches_brute_force(spark, edges, rounds):
    want_labels, want_changed = _py_lpa(edges, rounds)
    if not want_labels:  # all self-loops -> empty graph
        return
    got, changed = _run(spark, edges, rounds)
    assert got == want_labels
    assert changed == want_changed


def test_node_id_cap_guard_raises(spark):
    e = spark.createDataFrame([(0, 1 << 32)], "src long, dst long")
    # the guard fires at the first eager localCheckpoint inside the call
    with pytest.raises(Exception, match="node ids must be < 2\\^32"):
        labels, _ = label_propagation(e, n_rounds=1)
        labels.collect()


def test_n_rounds_validation(spark):
    e = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError):
        label_propagation(e, n_rounds=0)
