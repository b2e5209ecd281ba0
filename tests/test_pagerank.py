"""X53 PageRank: python-model crosscheck (exact integer trajectory),
dangling redistribution semantics, determinism, and plan shape."""

import hashlib
import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from ocr_output_evaluation_spark.operators.pagerank import (
    TELEPORT_NANO,
    pagerank,
)
from ocr_output_evaluation_spark.queries import pagerank_report


def _py_pagerank(nodes, edges, n_iters=5):
    """Pure-python exact replica of the operator's integer arithmetic."""
    n = len(nodes)
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    ranks = {v: 10**9 for v in nodes}
    for _ in range(n_iters):
        inc = {}
        for s, d in edges:
            inc[d] = inc.get(d, 0) + ranks[s] // out[s]
        dang = sum(r for v, r in ranks.items() if v not in out)
        ranks = {
            v: TELEPORT_NANO + 85 * (inc.get(v, 0) + dang // n) // 100
            for v in nodes
        }
    return ranks


def _synth_edges(doc_ids, n):
    """The report's deterministic md5 link synthesis, in python."""
    edges = []
    for did in doc_ids:
        for j in range(1, did % 4 + 1):
            h = hashlib.md5(f"{did}:{j}".encode()).hexdigest()
            dst = int(h[:6], 16) % n
            if dst != did:
                edges.append((did, dst))
    return edges


def test_pagerank_matches_python_model(spark):
    nodes_py = list(range(40))
    edges_py = _synth_edges(nodes_py, 40)
    nodes = spark.createDataFrame([(v,) for v in nodes_py], "node long")
    edges = spark.createDataFrame(edges_py, "src long, dst long")
    got = {
        r["node"]: r["rank_nano"]
        for r in pagerank(nodes, edges, n_iters=5).collect()
    }
    want = _py_pagerank(nodes_py, edges_py, n_iters=5)
    assert got == want


def test_dangling_mass_redistributed_and_teleport_floor(spark):
    # 0 -> 1; nodes 1 and 2 are BOTH dangling (no out-edges): their
    # combined mass must come back via the dangling term, and every
    # rank is >= the teleport floor.
    nodes = spark.createDataFrame([(0,), (1,), (2,)], "node long")
    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    got = {
        r["node"]: r["rank_nano"]
        for r in pagerank(nodes, edges, n_iters=1).collect()
    }
    dang_share = 2 * 10**9 // 3
    assert got[2] == TELEPORT_NANO + 85 * dang_share // 100
    assert got[0] == TELEPORT_NANO + 85 * dang_share // 100
    assert got[1] == TELEPORT_NANO + 85 * (10**9 + dang_share) // 100
    assert all(r >= TELEPORT_NANO for r in got.values())
    # mass is conserved up to truncation loss (never created)
    assert sum(got.values()) <= 3 * 10**9


def test_in_link_magnet_outranks_leaf(spark, sf_dir):
    rows = pagerank_report(spark, sf_dir).collect()
    assert len(rows) == 20
    # the head of the ranking must be in-link-heavy: top node has more
    # in-links than the overall median node can have (>= 2 at sf0.001)
    assert rows[0]["in_deg"] >= 2
    # total order: strictly descending (rank, then node asc on ties)
    ks = [(-r["rank_nano"], r["node"]) for r in rows]
    assert ks == sorted(ks)


def test_report_deterministic(spark, sf_dir):
    a = pagerank_report(spark, sf_dir).collect()
    b = pagerank_report(spark, sf_dir).collect()
    assert a == b


def test_plan_shape(spark, sf_dir):
    df = pagerank_report(spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # no unbounded cartesian anywhere; the only nested-loop joins are the
    # sanctioned 1-row dangling-mass broadcast attaches (lineage is
    # checkpoint-truncated, so at most the final iteration's is visible)
    assert "CartesianProduct" not in plan
    # top-k tail is a TakeOrderedAndProject, not a global sort
    assert "TakeOrderedAndProject" in plan


# ---------------------------------------------------------------------------
# hypothesis fuzz: random graphs (multi-edges, dangling nodes, isolated
# nodes, empty edge sets) vs the pure-python exact-integer model
# ---------------------------------------------------------------------------
from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

FAST = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)


@settings(**FAST)
@given(
    n=st.integers(2, 12),
    edges=st.lists(
        st.tuples(st.integers(0, 11), st.integers(0, 11)),
        min_size=0,
        max_size=30,
    ),
    iters=st.integers(1, 3),
)
def test_pagerank_fuzz_matches_python_model(spark, n, edges, iters):
    nodes_py = list(range(n))
    edges_py = [(s, d) for s, d in edges if s < n and d < n and s != d]
    nodes = spark.createDataFrame([(v,) for v in nodes_py], "node long")
    if edges_py:
        e = spark.createDataFrame(edges_py, "src long, dst long")
    else:
        e = spark.createDataFrame([], "src long, dst long")
    got = {
        r["node"]: r["rank_nano"]
        for r in pagerank(nodes, e, n_iters=iters, checkpoint=False).collect()
    }
    assert got == _py_pagerank(nodes_py, edges_py, n_iters=iters)


# ---------------------------------------------------------------------------
# X59 TrustRank: python model, spam-starvation semantics, fuzz
# ---------------------------------------------------------------------------
from ocr_output_evaluation_spark.operators.pagerank import trustrank  # noqa: E402


def _py_trustrank(nodes, edges, seeds, n_iters=5):
    ns = len(seeds)
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    ranks = {v: (10**9 // ns if v in seeds else 0) for v in nodes}
    tp = (15 * 10**9) // (100 * ns)
    for _ in range(n_iters):
        inc = {}
        for s, d in edges:
            inc[d] = inc.get(d, 0) + ranks[s] // out[s]
        dang = sum(r for v, r in ranks.items() if v not in out)
        ranks = {
            v: (tp if v in seeds else 0)
            + 85 * (inc.get(v, 0) + (dang // ns if v in seeds else 0)) // 100
            for v in nodes
        }
    return ranks


def _run_tr(spark, nodes_py, edges_py, seeds_py, n_iters=5):
    nodes = spark.createDataFrame([(v,) for v in nodes_py], "node long")
    edges = (
        spark.createDataFrame(edges_py, "src long, dst long")
        if edges_py
        else spark.createDataFrame([], "src long, dst long")
    )
    seeds = spark.createDataFrame([(v,) for v in seeds_py], "node long")
    return {
        r["node"]: r["trust_nano"]
        for r in trustrank(nodes, edges, seeds, n_iters=n_iters).collect()
    }


def test_trustrank_matches_python_model(spark):
    nodes = list(range(8))
    edges = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (0, 2), (2, 3)]
    got = _run_tr(spark, nodes, edges, [0])
    assert got == _py_trustrank(nodes, edges, {0}, 5)


def test_trustrank_starves_unreachable_spam(spark):
    # 0 -> 1 trusted island; 5 <-> 6 a link farm unreachable from seeds:
    # the farm must hold EXACTLY zero trust, whatever its internal links
    got = _run_tr(spark, [0, 1, 5, 6], [(0, 1), (5, 6), (6, 5)], [0])
    assert got[5] == 0 and got[6] == 0
    assert got[0] > 0 and got[1] > 0


from hypothesis import strategies as _st  # noqa: E402


@settings(**FAST)
@given(
    n=st.integers(2, 10),
    edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)),
        min_size=0,
        max_size=25,
    ),
    seed_pick=st.integers(0, 9),
)
def test_trustrank_fuzz_matches_python_model(spark, n, edges, seed_pick):
    nodes = list(range(n))
    ep = [(s, d) for s, d in edges if s < n and d < n and s != d]
    seeds = {seed_pick % n}
    got = _run_tr(spark, nodes, ep, seeds, n_iters=3)
    assert got == _py_trustrank(nodes, ep, seeds, 3)
