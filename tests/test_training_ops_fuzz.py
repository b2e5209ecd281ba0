"""Hypothesis fuzz for the wave-3 sampling operators: each Spark operator
is replayed by a pure-Python model on randomized small frames (duplicate
scores, zero token counts, single-row groups, extreme budgets — shapes the
fixture-based equivalence tests can't enumerate). Mirrors the extractor's
fuzz strategy (tests/test_extractor_fuzz.py)."""

import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

FAST = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


# ---------------------------------------------------------------------------
# assign_split vs python model
# ---------------------------------------------------------------------------
@settings(**FAST)
@given(
    keys=st.lists(st.integers(-(10**9), 10**9), min_size=1, max_size=50, unique=True),
    cuts=st.tuples(st.integers(1, 98), st.integers(1, 98)),
    salt=st.sampled_from(["split-v1", "s2", ""]),
)
def test_assign_split_fuzz(spark, keys, cuts, salt):
    from ocr_output_evaluation_spark.operators.splits import assign_split

    a, b = sorted(cuts)
    if a == b:
        b = a + 1
    if b >= 100:
        a, b = 33, 66
    fr = (("train", a), ("val", b - a), ("test", 100 - b))

    def model(k: int) -> str:
        bucket = int(_md5(f"{salt}:{k}")[:4], 16) % 100
        return "train" if bucket < a else ("val" if bucket < b else "test")

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {
        r.k: r.split
        for r in assign_split(df, "k", fractions=fr, salt=salt).collect()
    }
    assert got == {k: model(k) for k in keys}


# ---------------------------------------------------------------------------
# token_budget_take vs python model
# ---------------------------------------------------------------------------
@settings(**FAST)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 10**6),          # key
            st.sampled_from(["a", "b", "c"]),  # group
            st.integers(0, 60),             # token count
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[0],
    ),
    budget=st.integers(0, 400),
)
def test_token_budget_fuzz(spark, rows, budget):
    from ocr_output_evaluation_spark.operators.budget import token_budget_take

    def model() -> set:
        kept = set()
        by_group: dict = {}
        for k, g, tok in rows:
            by_group.setdefault(g, []).append((_md5(str(k)), k, tok))
        for g, items in by_group.items():
            items.sort()
            c = 0
            for _, k, tok in items:
                c += tok
                if c <= budget:
                    kept.add(k)
        return kept

    df = spark.createDataFrame(rows, "k long, lang string, tok long")
    got = {
        r.k
        for r in token_budget_take(df, F.col("tok"), "k", budget)
        .filter("kept")
        .collect()
    }
    assert got == model()


# ---------------------------------------------------------------------------
# quantile_gate vs python model
# ---------------------------------------------------------------------------
@settings(**FAST)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 10**6),             # id
            st.sampled_from(["a", "b"]),       # group
            st.integers(0, 20),                # raw score (ties likely)
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[0],
    ),
    frac=st.sampled_from([0.1, 0.25, 0.3, 0.5, 0.75, 1.0]),
)
def test_quantile_gate_fuzz(spark, rows, frac):
    from ocr_output_evaluation_spark.operators.quantile import quantile_gate

    def model() -> set:
        kept = set()
        by_group: dict = {}
        for i, g, s in rows:
            by_group.setdefault(g, []).append((i, float(s)))
        for g, items in by_group.items():
            xs = sorted((s for _, s in items), reverse=True)
            target = math.ceil(frac * len(xs))
            thr = xs[target - 1]
            kept |= {i for i, s in items if s >= thr}
        return kept

    df = spark.createDataFrame(rows, "id long, lang string, v long")
    got = {
        r.id
        for r in quantile_gate(
            df, F.round(F.col("v").cast("double"), 6), frac
        ).collect()
    }
    assert got == model()


# ---------------------------------------------------------------------------
# exact_substr_dedup (X37, both modes) vs python model
# ---------------------------------------------------------------------------
@settings(**FAST)
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcde"), min_size=0, max_size=10),
        min_size=1,
        max_size=6,
    ),
    k=st.sampled_from([2, 3]),
    keep_first=st.booleans(),
)
def test_exact_substr_fuzz(spark, docs, k, keep_first):
    """Tiny alphabet + short docs force window collisions, overlapping
    spans, whole-doc wipes, sub-k docs — shapes the planted fixtures can't
    enumerate. The model reimplements the contract directly on token
    tuples (md5 fingerprints are injective here)."""
    from collections import defaultdict

    from ocr_output_evaluation_spark.operators.exactsubstr import (
        exact_substr_dedup,
    )

    texts = {i: toks for i, toks in enumerate(docs)}
    wins = [
        (d, s, tuple(toks[s : s + k]))
        for d, toks in texts.items()
        for s in range(len(toks) - k + 1)
    ]
    docs_per_fp = defaultdict(set)
    for d, _, fp in wins:
        docs_per_fp[fp].add(d)
    dup = {fp for fp, ds in docs_per_fp.items() if len(ds) >= 2}
    occ = [(d, s, fp) for d, s, fp in wins if fp in dup]
    if keep_first:
        canon: dict = {}
        for d, s, fp in occ:
            if fp not in canon or (d, s) < canon[fp]:
                canon[fp] = (d, s)
        occ = [(d, s, fp) for d, s, fp in occ if (d, s) != canon[fp]]
    covered: dict = defaultdict(set)
    for d, s, _ in occ:
        covered[d].update(range(s, s + k))
    want = {}
    for d, toks in texts.items():
        kept = [t for p, t in enumerate(toks) if p not in covered[d]]
        want[d] = (" ".join(kept), len(toks), len(toks) - len(kept))

    df = spark.createDataFrame(
        [(d, " ".join(toks)) for d, toks in texts.items()],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.text_dedup, r.n_tokens, r.n_dropped)
        for r in exact_substr_dedup(
            df, "text", "doc_id", k=k, min_docs=2, keep_first=keep_first
        ).collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# train_bpe (X36) vs python model
# ---------------------------------------------------------------------------
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(
    words=st.dictionaries(
        keys=st.text(alphabet="abc", min_size=1, max_size=6),
        values=st.integers(1, 9),
        min_size=1,
        max_size=8,
    ),
)
def test_train_bpe_fuzz(spark, words):
    """Iterative trainer vs a direct reimplementation: same recount-after-
    each-merge pair stats (weighted, overlaps), same (count desc, a, b)
    argmax, same leftmost-non-overlap fold — merge trajectory AND final
    symbol sequences must agree on every randomized vocabulary (tiny
    alphabet maximizes ties and self-overlapping pairs like (a, a))."""
    from collections import Counter

    from ocr_output_evaluation_spark.operators.bpe import train_bpe

    n_merges = 3
    seqs = {w: list(w) for w in words}
    want_merges = []
    for _ in range(n_merges):
        counts: Counter = Counter()
        for w, syms in seqs.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += words[w]
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0]
        want_merges.append(best)
        a, b = best
        for w, syms in seqs.items():
            out: list = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            seqs[w] = out

    df = spark.createDataFrame(list(words.items()), "word string, wcount long")
    trained, merges = train_bpe(df, n_merges)
    assert merges == want_merges
    got = {r.word: r.seq for r in trained.collect()}
    assert got == {w: " ".join(s) for w, s in seqs.items()}
