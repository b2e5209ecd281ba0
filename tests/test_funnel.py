"""X78 curation funnel (queries.curation_funnel_report): stage
monotonicity, real attrition at every stage on the fixture corpus,
benchmark members falling to decontamination, determinism, and the
fan-out persist. Value identity vs DuckDB is the oracle gate's job
(ORACLE_CURATION_FUNNEL — composed from the three proven stage
oracles)."""

from __future__ import annotations

from ocr_output_evaluation_spark.queries import curation_funnel_report

SF = "/root/testdata/sf0.001"


def test_funnel_shape_and_attrition(spark):
    rows = curation_funnel_report(spark, SF).collect()
    assert rows and [r.lang for r in rows] == sorted({r.lang for r in rows})
    tot = {
        k: sum(getattr(r, k) for r in rows)
        for k in ("n_docs", "n_quality", "n_unique", "n_clean")
    }
    # funnel monotonicity per lang AND in total
    for r in rows:
        assert r.n_docs >= r.n_quality >= r.n_unique >= r.n_clean >= 0
        assert 0.0 <= r.retention <= 1.0
    # every stage removes something on the fixture corpus: quality
    # failures are planted (doc_id % 11/13/17), the corpus carries exact
    # dups, and benchmark members (doc_id % 97) score overlap 1.0
    assert tot["n_quality"] < tot["n_docs"]
    assert tot["n_unique"] < tot["n_quality"]
    assert tot["n_clean"] < tot["n_unique"]
    assert tot["n_clean"] > 0


def test_funnel_deterministic(spark):
    a = sorted(map(tuple, curation_funnel_report(spark, SF).collect()))
    b = sorted(map(tuple, curation_funnel_report(spark, SF).collect()))
    assert a == b


def test_funnel_plan(spark):
    from tests.test_plans import plan_of

    plan = plan_of(curation_funnel_report(spark, SF))
    # the mutated frame persists (fans into flags/fingerprint/grams) and
    # the benchmark key set broadcasts into the scoring join
    assert "InMemoryTableScan" in plan
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
