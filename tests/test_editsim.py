"""X65 edit-similarity verify (Lee et al. 2022 NearDup stage 2): exact
Python-DP crosscheck, the 0.8 dup criterion, the cap, pass-through
columns, and empty-text NULL semantics."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ocr_output_evaluation_spark.operators.dedup import edit_similarity_pairs

FAST = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[len(b)]


def _run(spark, docs, pairs, cap=500):
    d = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    p = spark.createDataFrame(pairs, "id_a long, id_b long")
    return {
        (r.id_a, r.id_b): (r.edit_dist, r.edit_sim)
        for r in edit_similarity_pairs(d, p, "text", "doc_id", cap=cap).collect()
    }


@settings(**FAST)
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["ab", "cd", "ef", "gh", "abc"]),
            min_size=0,
            max_size=12,
        ).map(" ".join),
        min_size=2,
        max_size=5,
    )
)
def test_matches_python_dp(spark, docs):
    # fixtures are lowercase-letter+space so normalization is collapse+trim,
    # which " ".join already satisfies -> the DP runs on the raw text
    pairs = [(a, b) for a in range(len(docs)) for b in range(len(docs)) if a < b]
    got = _run(spark, docs, pairs)
    for a, b in pairs:
        d = _lev(docs[a][:500], docs[b][:500])
        mx = max(len(docs[a][:500]), len(docs[b][:500]))
        want = (d, 1.0 - d / mx) if mx > 0 else (0, None)
        gd, gs = got[(a, b)]
        assert gd == want[0]
        if want[1] is None:
            assert gs is None
        else:
            assert abs(gs - want[1]) < 1e-12


def test_neardup_criterion_and_cap(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = [base, base.replace("lazy", "hazy"), "entirely different words here"]
    got = _run(spark, docs, [(0, 1), (0, 2)])
    d01, s01 = got[(0, 1)]
    assert d01 == 1 and s01 >= 0.8  # one substitution -> near-dup
    _, s02 = got[(0, 2)]
    assert s02 < 0.8
    # cap: identical 10-char prefixes, divergence beyond the cap is invisible
    long_a = "aaaaa bbbb " + "x" * 50
    long_b = "aaaaa bbbb " + "y" * 50
    capped = _run(spark, [long_a, long_b], [(0, 1)], cap=10)
    assert capped[(0, 1)] == (0, 1.0)


def test_passthrough_and_empty(spark):
    d = spark.createDataFrame(
        [(0, "some words here"), (1, ""), (2, "")],
        "doc_id long, text string",
    )
    p = spark.createDataFrame(
        [(1, 2, 0.75)], "id_a long, id_b long, score double"
    )
    rows = edit_similarity_pairs(d, p, "text", "doc_id").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.score == 0.75  # extra pairs column passes through
    assert r.edit_dist == 0 and r.edit_sim is None  # both empty -> NULL


def test_missing_id_surfaces_as_null_not_dropped(spark):
    d = spark.createDataFrame([(0, "some words")], "doc_id long, text string")
    p = spark.createDataFrame([(0, 99)], "id_a long, id_b long")
    rows = edit_similarity_pairs(d, p, "text", "doc_id").collect()
    assert len(rows) == 1  # the pair survives...
    assert rows[0].edit_dist is None and rows[0].edit_sim is None  # ...visibly
