"""X54 incremental LSH index maintenance: the update==rebuild invariant,
planted near-dup retrieval, the degenerate-bucket guard, and the
delta-broadcast plan shape."""

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from ocr_output_evaluation_spark.operators.lshindex import (
    lsh_index_build,
    lsh_index_probe,
    lsh_index_update,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the band plays on "
    "and the crowd watches quietly from the old wooden stands in the rain"
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_update_equals_rebuild(spark):
    """The contract: applying the delta to build(A) lands bit-identical
    to build(B) — removed, changed, added, and untouched keys all
    exercised."""
    a_rows = [(i, f"{BASE} variant {i}") for i in range(12)]
    b_rows = [
        (i, f"{BASE} variant {i}") for i in range(1, 10) if i != 5
    ] + [(5, f"{BASE} variant 5 edited"), (100, f"{BASE} fresh")]
    # vs A: 0,10,11 removed; 5 changed; 100 added; 1-4,6-9 untouched
    a, b = _docs(spark, a_rows), _docs(spark, b_rows)
    idx0, sig0 = lsh_index_build(a, "text", "doc_id")
    drop = spark.createDataFrame([(0,), (10,), (11,), (5,)], "doc_id long")
    ups = b.filter(F.col("doc_id").isin(5, 100))
    idx1, sig1 = lsh_index_update(idx0, sig0, drop, ups, "text", "doc_id")
    idx_r, sig_r = lsh_index_build(b, "text", "doc_id")
    assert sorted(map(tuple, idx1.collect())) == sorted(
        map(tuple, idx_r.collect())
    )
    assert sorted(map(tuple, sig1.collect())) == sorted(
        map(tuple, sig_r.collect())
    )


def test_probe_finds_planted_near_dup_not_unrelated(spark):
    corpus = [(1, BASE), (2, "completely different text about spark " * 4)]
    queries = [(90, BASE + " x"), (91, "nothing shares shingles here at all")]
    idx, sig = lsh_index_build(_docs(spark, corpus), "text", "doc_id")
    got = lsh_index_probe(
        idx, sig, _docs(spark, queries), "text", "doc_id"
    ).collect()
    pairs = {(r.query_id, r.index_id) for r in got}
    assert (90, 1) in pairs
    assert all(q != 91 for q, _ in pairs)
    assert all(r.est_jaccard >= 0.5 for r in got)


def test_bucket_guard_drops_boilerplate_buckets(spark):
    # 30 identical docs: every band bucket holds 30 rows; with
    # max_bucket=10 a probe of the same text must return NO pairs
    # (the guard kills the bucket before the equi-join).
    corpus = [(i, BASE) for i in range(30)]
    idx, sig = lsh_index_build(_docs(spark, corpus), "text", "doc_id")
    got = lsh_index_probe(
        idx, sig, _docs(spark, [(99, BASE)]), "text", "doc_id", max_bucket=10
    ).collect()
    assert got == []
    # and with a permissive cap the same probe matches everything
    got2 = lsh_index_probe(
        idx, sig, _docs(spark, [(99, BASE)]), "text", "doc_id", max_bucket=100
    ).collect()
    assert len(got2) == 30


def test_update_plan_broadcasts_delta(spark):
    """Removals must be broadcast anti-joins (the delta is small); the
    corpus-scale index side must not sort-merge for the drop."""
    a = _docs(spark, [(i, f"{BASE} v{i}") for i in range(8)])
    idx0, sig0 = lsh_index_build(a, "text", "doc_id")
    drop = spark.createDataFrame([(3,)], "doc_id long")
    ups = _docs(spark, [(3, f"{BASE} v3 edited")])
    idx1, _ = lsh_index_update(idx0, sig0, drop, ups, "text", "doc_id")
    buf = io.StringIO()
    with redirect_stdout(buf):
        idx1.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------------------
# hypothesis fuzz: random edit scripts (disjoint removed/changed/added id
# sets, including empty deltas and full wipes) must keep
# update(build(A), delta) == build(B) frame-identical
# ---------------------------------------------------------------------------
from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

FAST = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)


@settings(**FAST)
@given(
    n=st.integers(1, 10),
    ops=st.lists(st.sampled_from(["keep", "rm", "edit"]), min_size=1, max_size=10),
    n_add=st.integers(0, 3),
)
def test_update_equals_rebuild_fuzz(spark, n, ops, n_add):
    a_rows = [(i, f"{BASE} variant number {i}") for i in range(n)]
    b_rows, drop, ups = [], [], []
    for i, _ in enumerate(a_rows):
        op = ops[i % len(ops)]
        if op == "keep":
            b_rows.append(a_rows[i])
        elif op == "rm":
            drop.append((i,))
        else:
            row = (i, f"{BASE} variant number {i} edited")
            b_rows.append(row)
            drop.append((i,))
            ups.append(row)
    for j in range(n_add):
        row = (1000 + j, f"{BASE} fresh doc {j}")
        b_rows.append(row)
        ups.append(row)
    a = _docs(spark, a_rows)
    b = _docs(spark, b_rows) if b_rows else _docs(spark, []).limit(0)
    idx0, sig0 = lsh_index_build(a, "text", "doc_id")
    drop_df = (
        spark.createDataFrame(drop, "doc_id long")
        if drop
        else spark.createDataFrame([], "doc_id long")
    )
    ups_df = (
        _docs(spark, ups)
        if ups
        else spark.createDataFrame([], "doc_id long, text string")
    )
    idx1, sig1 = lsh_index_update(idx0, sig0, drop_df, ups_df, "text", "doc_id")
    idx_r, sig_r = lsh_index_build(b, "text", "doc_id")
    assert sorted(map(tuple, idx1.collect())) == sorted(map(tuple, idx_r.collect()))
    assert sorted(map(tuple, sig1.collect())) == sorted(map(tuple, sig_r.collect()))
