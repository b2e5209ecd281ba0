"""X79 Neyman-allocation stratified sampling (operators/neyman.py):
pure-Python model crosscheck (exact integer moments, weights and
largest-remainder apportionment, md5 draw order), the variance-seeking
property the rule exists for, budget conservation, zero-variance and
truncation edges, and determinism across partitioning."""

from __future__ import annotations

import hashlib
import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ocr_output_evaluation_spark.operators.neyman import (
    neyman_allocation,
    neyman_sample,
)

FAST = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)

K = 12


def _model(rows: list[tuple[int, str, int]], k: int = K):
    strata = sorted({s for _i, s, _v in rows})
    out = {}
    for s in strata:
        vs = [(i, v) for i, s2, v in rows if s2 == s]
        n, s1, s2_ = len(vs), sum(v for _i, v in vs), sum(v * v for _i, v in vs)
        out[s] = dict(
            n_docs=n,
            w_micro=int(round(math.sqrt(n * s2_ - s1 * s1) * 1e6)),
        )
    tot = sum(o["w_micro"] for o in out.values())
    if tot > 0:
        for o in out.values():
            kw = k * o["w_micro"]
            o["_base"], o["_rem"] = kw // tot, kw % tot
    else:
        for o in out.values():
            o["_base"], o["_rem"] = 0, 0
    leftover = k - sum(o["_base"] for o in out.values())
    order = sorted(out, key=lambda s: (-out[s]["_rem"], s))
    for rn, s in enumerate(order, 1):
        extra = 1 if (rn <= leftover and out[s]["w_micro"] > 0) else 0
        out[s]["alloc"] = out[s]["_base"] + extra
    # the draw: md5 order per stratum
    sel = {}
    for s in strata:
        vs = [(i, v) for i, s2, v in rows if s2 == s]
        vs.sort(key=lambda t: (hashlib.md5(f"{t[0]}:ney".encode()).hexdigest(), t[0]))
        sel[s] = vs[: out[s]["alloc"]]
    return out, sel


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, g string, v long")


@settings(**FAST)
@given(
    rows=st.dictionaries(
        st.integers(0, 300),
        st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 500)),
        min_size=1,
        max_size=25,
    ).map(lambda d: [(i, g, v) for i, (g, v) in d.items()]),
)
def test_matches_python_model(spark, rows):
    df = _df(spark, rows)
    want, want_sel = _model(rows)
    got = {
        r.stratum: r.asDict()
        for r in neyman_allocation(df, "g", "v", K).collect()
    }
    assert set(got) == set(want)
    for s, w in want.items():
        assert got[s]["n_docs"] == w["n_docs"], s
        assert got[s]["w_micro"] == w["w_micro"], s
        assert got[s]["alloc"] == w["alloc"], s
    sel = neyman_sample(df, "g", "v", K).collect()
    got_sel = {}
    for r in sel:
        got_sel.setdefault(r.g, set()).add(r.doc_id)
    for s, picks in want_sel.items():
        assert got_sel.get(s, set()) == {i for i, _v in picks}, s


def test_variance_seeking_and_conservation(spark):
    """The rule's reason to exist: equal-size strata, one volatile and
    one near-constant — the volatile stratum takes nearly the whole
    budget; total allocation == k."""
    calm = [(i, "calm", 100 + (i % 2)) for i in range(50)]
    wild = [(100 + i, "wild", (i * 97) % 1000) for i in range(50)]
    alloc = {
        r.stratum: r
        for r in neyman_allocation(_df(spark, calm + wild), "g", "v", 20).collect()
    }
    assert alloc["wild"].alloc + alloc["calm"].alloc == 20
    assert alloc["wild"].alloc >= 18
    # zero-variance stratum: weight 0, alloc 0
    flat = [(500 + i, "flat", 7) for i in range(30)]
    a2 = {
        r.stratum: r
        for r in neyman_allocation(_df(spark, wild + flat), "g", "v", 10).collect()
    }
    assert a2["flat"].w_micro == 0 and a2["flat"].alloc == 0
    assert a2["wild"].alloc == 10


def test_truncation_and_contract(spark):
    # alloc can exceed a tiny stratum: the draw truncates to its size
    tiny = [(1, "t", 0), (2, "t", 1000)]  # huge variance, 2 docs
    big = [(10 + i, "b", 50) for i in range(40)]  # zero variance
    df = _df(spark, tiny + big)
    alloc = {r.stratum: r.alloc for r in neyman_allocation(df, "g", "v", 8).collect()}
    assert alloc["t"] == 8 and alloc["b"] == 0
    sel = neyman_sample(df, "g", "v", 8).collect()
    assert {r.doc_id for r in sel} == {1, 2}  # truncated to stratum size
    with pytest.raises(ValueError, match="k must"):
        neyman_allocation(df, "g", "v", -1)


def test_determinism_across_partitioning(spark):
    rows = [(i, "ab"[i % 2], (i * 31) % 200) for i in range(80)]
    df = _df(spark, rows)
    a = sorted(map(tuple, neyman_sample(df.coalesce(1), "g", "v", K).collect()))
    b = sorted(map(tuple, neyman_sample(df.repartition(16), "g", "v", K).collect()))
    assert a == b
