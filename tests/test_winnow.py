"""X64 winnowing (Schleimer, Wilkerson & Aiken 2003): exact Python-mirror
crosscheck, the paper's substring-match guarantee, the boilerplate guard,
short-doc extension, and the one-exchange plan pin."""

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ocr_output_evaluation_spark.operators.winnow import (
    _POS_CAP,
    winnow_fingerprints,
    winnow_matches,
)

FAST = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)

WORDS = ["ka", "kha", "ga", "nga", "ca", "cha", "ja", "nya"]


def _py_winnow(text, k=4, w=4):
    """Exact mirror of winnow_fingerprints for ASCII lowercase-letter+space
    fixtures (where normalize_for_scoring is collapse+trim only)."""
    toks = [t for t in text.split() if t]
    nk = len(toks) - (k - 1)
    if nk < 1 or nk >= _POS_CAP:
        return set()
    combs = []
    for s in range(nk):
        h = int(
            hashlib.md5(" ".join(toks[s : s + k]).encode()).hexdigest()[:10], 16
        )
        combs.append(h * _POS_CAP + (_POS_CAP - 1 - s))
    picks = set()
    for s in range(max(nk - w, 0) + 1):
        m = min(combs[s : s + w])
        picks.add((_POS_CAP - 1 - (m % _POS_CAP), m // _POS_CAP))
    return picks


def _docs_df(spark, docs):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )


def _spark_fps(spark, docs, k=4, w=4):
    rows = winnow_fingerprints(
        _docs_df(spark, docs), "text", "doc_id", k=k, w=w
    ).collect()
    out = {}
    for r in rows:
        out.setdefault(r.doc_id, set()).add((r.pos, r.fp))
    return out


@settings(**FAST)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(WORDS), min_size=0, max_size=40).map(" ".join),
        min_size=1,
        max_size=6,
    ),
    k=st.integers(1, 5),
    w=st.integers(1, 5),
)
def test_fingerprints_match_python_mirror(spark, docs, k, w):
    got = _spark_fps(spark, docs, k=k, w=w)
    want = {i: _py_winnow(t, k=k, w=w) for i, t in enumerate(docs)}
    want = {i: s for i, s in want.items() if s}
    assert got == want


def test_substring_match_guarantee(spark):
    # the paper's §3 guarantee: any shared substring of >= w + k - 1 tokens
    # produces at least one SHARED fingerprint VALUE. k=4, w=4 -> 7 tokens.
    shared = "alpha beta gamma delta epsilon zeta eta"
    docs = [
        "one two three " + shared + " four five",
        shared + " six seven eight nine ten eleven",
    ]
    fps = _spark_fps(spark, docs)
    vals0 = {fp for _, fp in fps[0]}
    vals1 = {fp for _, fp in fps[1]}
    assert vals0 & vals1
    m = winnow_matches(
        winnow_fingerprints(_docs_df(spark, docs), "text", "doc_id"), "doc_id"
    ).collect()
    assert len(m) == 1 and m[0].n_shared >= 1


def test_short_doc_yields_global_min(spark):
    # 1..w-1 k-grams: exactly one truncated window -> the global minimum
    docs = ["aa bb cc dd ee"]  # 5 tokens, k=4 -> 2 k-grams < w=4
    fps = _spark_fps(spark, docs)
    assert len(fps[0]) == 1
    assert fps[0] == _py_winnow(docs[0])
    # below k tokens: nothing
    assert _spark_fps(spark, ["aa bb cc"]) == {}


def test_matches_brute_force_and_max_df_guard(spark):
    page = "lorem ipsum dolor sit amet consectetur adipiscing elit sed"
    # letter-only suffixes: normalize_for_scoring strips digits
    docs = [
        page + f" tail{s} unique{s} words{s} here{s} now{s}"
        for s in ("aa", "bb", "cc", "dd")
    ]
    docs.append("totally different content with no shared window at all kept")
    py = {i: {fp for _, fp in _py_winnow(t)} for i, t in enumerate(docs)}
    # brute-force expected pairs at max_df=16 (no fp hits the guard here)
    expected = {}
    ids = sorted(py)
    df_count = {}
    for i in ids:
        for fp in py[i]:
            df_count[fp] = df_count.get(fp, 0) + 1
    kept = {fp for fp, c in df_count.items() if c <= 16}
    for a in ids:
        for b in ids:
            if a < b:
                n = len(py[a] & py[b] & kept)
                if n:
                    expected[(a, b)] = n
    got = {
        (r.id_a, r.id_b): r.n_shared
        for r in winnow_matches(
            winnow_fingerprints(_docs_df(spark, docs), "text", "doc_id"), "doc_id"
        ).collect()
    }
    assert got == expected
    # max_df=3: the 4-way shared boilerplate fingerprints are excluded,
    # so cross-copy counts drop to the brute-force value under the guard
    kept3 = {fp for fp, c in df_count.items() if c <= 3}
    expected3 = {}
    for a in ids:
        for b in ids:
            if a < b:
                n = len(py[a] & py[b] & kept3)
                if n:
                    expected3[(a, b)] = n
    got3 = {
        (r.id_a, r.id_b): r.n_shared
        for r in winnow_matches(
            winnow_fingerprints(_docs_df(spark, docs), "text", "doc_id"),
            "doc_id",
            max_df=3,
        ).collect()
    }
    assert got3 == expected3


def test_density_roughly_two_over_w_plus_one(spark):
    # expected selected fraction of k-grams is 2/(w+1) (paper §4); allow wide
    # slack on a small sample but pin the order of magnitude
    def b26(n):
        s = ""
        for _ in range(4):
            s += chr(ord("a") + n % 26)
            n //= 26
        return s

    words = ["w" + b26((i * 2654435761) % 456976) for i in range(2000)]
    doc = " ".join(words)
    fps = _spark_fps(spark, [doc], k=4, w=8)
    frac = len(fps[0]) / (2000 - 3)
    assert 0.1 < frac < 0.4  # 2/(w+1) = 0.222


def test_one_exchange_plan(spark):
    from tests.test_plans import n_nodes, plan_of

    fps = winnow_fingerprints(
        _docs_df(spark, ["aa bb cc dd ee ff gg hh"]), "text", "doc_id"
    )
    plan = plan_of(fps)
    assert n_nodes(plan, "Exchange") == 1  # window + reused-partitioning dedupe


def test_validation():
    import pytest

    with pytest.raises(ValueError):
        winnow_fingerprints(None, "text", "doc_id", k=0)
    with pytest.raises(ValueError):
        winnow_fingerprints(None, "text", "doc_id", w=0)


def test_xxhash64_production_family_properties(spark):
    # the production twin can't be replayed in python (xxhash64 is
    # Spark-only) — pin its structural guarantees instead: the substring
    # match guarantee, the short-doc extension, and match symmetry
    shared = "alpha beta gamma delta epsilon zeta eta"
    docs = [
        "one two three " + shared + " four five",
        shared + " six seven eight nine ten eleven",
        "totally unrelated content without any overlap at all here",
    ]
    fps = winnow_fingerprints(
        _docs_df(spark, docs), "text", "doc_id", hash_family="xxhash64"
    )
    rows = fps.collect()
    assert all(0 <= r.fp < (1 << 40) for r in rows)
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert by_doc[0] & by_doc[1]  # the w+k-1 guarantee holds per family
    m = {(r.id_a, r.id_b): r.n_shared
         for r in winnow_matches(fps, "doc_id").collect()}
    assert (0, 1) in m and m[(0, 1)] >= 1
    assert not any(2 in p for p in m)
    # positions are hash-family-independent modulo selection: every pos is
    # a valid k-gram start
    assert all(0 <= r.pos <= 40 for r in rows)
    import pytest

    with pytest.raises(ValueError):
        winnow_fingerprints(None, "text", "doc_id", hash_family="sha1")
