"""X74 n-gram novelty curve (operators/novelty.py): pure-Python model
crosscheck (exact type/instance/first-occurrence counts), the saturation
property the curve exists for, empty-bucket/ratio edges, and plan pins
(broadcast span, no Python UDFs, no global sort in the operator)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ocr_output_evaluation_spark.operators.novelty import novelty_curve
from ocr_output_evaluation_spark.operators.perplexity import (
    normalize_text_py,
)

FAST = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)

WORDS = ["mountain", "river", "spark", "table", "query", "shuffle", "zot"]
N, B = 2, 4


def _grams(t: str) -> list[str]:
    toks = normalize_text_py(t).split()
    return [" ".join(toks[i : i + N]) for i in range(len(toks) - N + 1)]


def _model(rows: list[tuple[int, str]]):
    ids = [d for d, _t in rows]
    mn, mx = min(ids), max(ids)

    def bucket(i: int) -> int:
        return min(B - 1, int((i - mn) * float(B) / (mx - mn + 1)))

    first: dict[str, int] = {}
    for d, t in sorted(rows):
        for g in _grams(t):
            first.setdefault(g, d)
    out: dict[int, dict] = {}
    for d, t in rows:
        b = bucket(d)
        o = out.setdefault(
            b, dict(n_docs=0, instances=0, new_types=0)
        )
        o["n_docs"] += 1
        o["instances"] += len(_grams(t))
    for g, d in first.items():
        out[bucket(d)]["new_types"] += 1
    cum = 0
    for b in sorted(out):
        cum += out[b]["new_types"]
        out[b]["cum_types"] = cum
        inst = out[b]["instances"]
        out[b]["novelty_ratio"] = (
            round(out[b]["new_types"] / inst, 6) if inst else None
        )
    return out


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r.bucket: r.asDict()
        for r in novelty_curve(df, n=N, n_buckets=B).collect()
    }


@settings(**FAST)
@given(
    rows=st.dictionaries(
        st.integers(0, 40),
        st.lists(st.sampled_from(WORDS), min_size=0, max_size=8).map(
            " ".join
        ),
        min_size=1,
        max_size=15,
    ).map(lambda d: sorted(d.items())),
)
def test_matches_python_model(spark, rows):
    got, want = _run(spark, rows), _model(rows)
    assert set(got) == set(want)
    for b, w in want.items():
        g = got[b]
        for k in ("n_docs", "instances", "new_types", "cum_types"):
            assert g[k] == w[k], f"bucket {b}.{k}: {g[k]} != {w[k]}"
        if w["novelty_ratio"] is None:
            assert g["novelty_ratio"] is None
        else:
            assert abs(g["novelty_ratio"] - w["novelty_ratio"]) < 2e-6


def test_saturation_property(spark):
    """The curve's reason to exist: a corpus that repeats the same text
    after the first quarter shows all vocabulary in bucket 0 and zero
    novelty afterwards, while a corpus of fresh vocabulary keeps
    climbing."""
    rep = [(i, "mountain river spark") for i in range(8)]
    got = _run(spark, rep)
    assert got[0]["new_types"] == 2  # "mountain river", "river spark"
    assert all(got[b]["new_types"] == 0 for b in got if b > 0)
    assert got[max(got)]["cum_types"] == 2
    fresh = [(i, f"{WORDS[i]} {WORDS[i + 1]}") for i in range(6)]
    got2 = _run(spark, fresh)
    assert all(got2[b]["new_types"] > 0 for b in got2)
    cums = [got2[b]["cum_types"] for b in sorted(got2)]
    assert cums == sorted(cums) and cums[-1] == 6


def test_edges(spark):
    # gram-less bucket -> instances 0, NULL ratio, still in the census
    rows = [(0, "mountain river"), (1, "zot"), (2, ""), (3, "x1 y2")]
    got = _run(spark, rows)
    assert got[1]["instances"] == 0 and got[1]["novelty_ratio"] is None
    assert got[2]["instances"] == 0
    # doc 3: "x1 y2" normalizes to "x y" -> one bigram, first seen there
    assert got[3]["new_types"] == 1
    assert got[3]["cum_types"] == 2
    # single doc: everything lands in bucket 0
    one = _run(spark, [(7, "mountain river spark")])
    assert list(one) == [0] and one[0]["cum_types"] == 2


def test_plan_pins(spark):
    from tests.test_plans import plan_of

    rows = [(i, "mountain river spark") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    plan = plan_of(novelty_curve(df, n=N, n_buckets=B))
    # the 1-row id-span agg broadcasts into both legs
    assert "BroadcastNestedLoopJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
