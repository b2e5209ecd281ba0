"""X73 corpus n-gram diversity (operators/diversity.py): pure-Python
model crosscheck (exact type/instance counts, ppm-exact overlap means),
the boilerplate-vs-unique properties the metrics exist for, the
short-doc census, and plan pins (persisted type frame, no Python
UDFs)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ocr_output_evaluation_spark.operators.diversity import (
    diversity_report_frame,
)
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
N = 2


def _grams(t: str) -> list[str]:
    toks = normalize_text_py(t).split()
    return [
        " ".join(toks[i : i + N]) for i in range(len(toks) - N + 1)
    ]


def _model(rows: list[tuple[int, str, str]]):
    """rows = (doc_id, segment, text) -> {segment: expected row dict}."""
    per_doc = {(d, s): _grams(t) for d, s, t in rows}
    df: dict[str, set[int]] = {}
    for (d, _s), gs in per_doc.items():
        for g in set(gs):
            df.setdefault(g, set()).add(d)
    out: dict[str, dict] = {}
    segs = {s for _d, s, _t in rows}
    for s in segs:
        docs = {d: gs for (d, s2), gs in per_doc.items() if s2 == s}
        bearing = {d: gs for d, gs in docs.items() if gs}
        if not bearing:
            continue
        inst = sum(len(gs) for gs in bearing.values())
        types = {g for gs in bearing.values() for g in gs}
        ppm_sum = 0
        for d, gs in bearing.items():
            ts = set(gs)
            hits = sum(1 for g in ts if len(df[g]) >= 2)
            ppm_sum += int(round(hits / len(ts) * 1e6))
        out[s] = dict(
            n_docs=len(bearing),
            n_docs_short=len(docs) - len(bearing),
            total_grams=inst,
            distinct_grams=len(types),
            distinct_ratio=round(len(types) / inst, 6),
            mean_self_overlap=round(ppm_sum / (1e6 * len(bearing)), 6),
        )
    return out


def _run(spark, rows):
    df = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )
    return {
        r.segment: r.asDict()
        for r in diversity_report_frame(df, n=N).collect()
    }


@settings(**FAST)
@given(
    texts=st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.lists(st.sampled_from(WORDS), min_size=0, max_size=8).map(
                " ".join
            ),
        ),
        min_size=1,
        max_size=12,
    ),
)
def test_matches_python_model(spark, texts):
    rows = [(i, s, t) for i, (s, t) in enumerate(texts)]
    got, want = _run(spark, rows), _model(rows)
    assert set(got) == set(want)
    for s, w in want.items():
        g = got[s]
        for k in (
            "n_docs",
            "n_docs_short",
            "total_grams",
            "distinct_grams",
        ):
            assert g[k] == w[k], f"{s}.{k}: {g[k]} != {w[k]}"
        assert abs(g["distinct_ratio"] - w["distinct_ratio"]) < 2e-6
        assert abs(g["mean_self_overlap"] - w["mean_self_overlap"]) < 2e-6


def test_boilerplate_vs_unique(spark):
    """The metrics' reason to exist: a segment of identical documents
    scores overlap 1 and a collapsed distinct ratio; a segment of
    vocabulary-disjoint documents scores overlap 0 and ratio 1."""
    rows = [(i, "boiler", "mountain river spark table") for i in range(4)]
    # vocabulary disjoint from the boiler segment AND pairwise disjoint —
    # df is corpus-wide, so any shared bigram would count as overlap
    uniq = [
        (10, "uniq", "alpha beta"),
        (11, "uniq", "gamma delta"),
        (12, "uniq", "epsilon zeta"),
    ]
    got = _run(spark, rows + uniq)
    b, u = got["boiler"], got["uniq"]
    assert b["mean_self_overlap"] == 1.0
    assert b["distinct_ratio"] == 0.25  # 3 types / 12 instances
    assert u["mean_self_overlap"] == 0.0
    assert u["distinct_ratio"] == 1.0
    # cross-segment df: the same doc duplicated across segments overlaps
    got2 = _run(
        spark,
        [(1, "a", "mountain river"), (2, "b", "mountain river")],
    )
    assert got2["a"]["mean_self_overlap"] == 1.0
    assert got2["b"]["mean_self_overlap"] == 1.0


def test_short_doc_census(spark):
    rows = [
        (1, "a", "mountain river spark"),
        (2, "a", "zot"),  # one token -> no bigram
        (3, "a", ""),  # empty
    ]
    got = _run(spark, rows)
    assert got["a"]["n_docs"] == 1 and got["a"]["n_docs_short"] == 2
    # a segment with ONLY short docs is absent (ratios undefined)
    got2 = _run(spark, rows + [(4, "b", "zot")])
    assert "b" not in got2


def test_plan_pins(spark):
    from tests.test_plans import plan_of

    rows = [(i, "a", "mountain river spark") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = diversity_report_frame(df, n=N)
    plan = plan_of(out)
    # the per-doc type frame is persisted (fans into three branches)
    assert "InMemoryTableScan" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
