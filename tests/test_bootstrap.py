"""X75 Poisson bootstrap CI (operators/bootstrap.py): pure-Python model
crosscheck (exact weighted BIGINT sums, full rank selection), the
uncertainty properties the method exists for (interval brackets the
point estimate and narrows with n on the fixed fixture), rank-clamp and
contract edges, determinism across repartition, and plan pins (no
corpus explode before the aggregate, no Python UDFs)."""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ocr_output_evaluation_spark.operators.bootstrap import (
    POISSON1_CDF,
    poisson_bootstrap_ci,
)

FAST = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)

R, LO, HI = 20, 2, 19


def _w(doc_id: int, r: int) -> int:
    h = int(
        hashlib.md5(f"{doc_id}:pb{r}".encode()).hexdigest()[:8], 16
    )
    u = (h + 0.5) / 4294967296.0
    for k, c in enumerate(POISSON1_CDF):
        if u < c:
            return k
    return 7


def _model(rows: list[tuple[int, str, int]]):
    groups = sorted({g for _i, g, _v in rows})
    out = {}
    for g in groups:
        mine = [(i, v) for i, g2, v in rows if g2 == g]
        n, sv = len(mine), sum(v for _i, v in mine)
        ests = []
        for r in range(R):
            sr = sum(_w(i, r) * v for i, v in mine)
            cr = sum(_w(i, r) for i, _v in mine)
            if cr > 0:
                ests.append((sr / cr, r))
        ests.sort()
        nr = len(ests)
        out[g] = dict(
            n_docs=n,
            mean_value=round(sv / n, 6),
            boot_lo=round(ests[min(LO, nr) - 1][0], 6),
            boot_hi=round(ests[min(HI, nr) - 1][0], 6),
        )
    return out


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, g string, v long")
    got = poisson_bootstrap_ci(
        df, value_col="v", group_col="g", id_col="doc_id"
    )
    return {r.group: r.asDict() for r in got.collect()}


@settings(**FAST)
@given(
    rows=st.dictionaries(
        st.integers(0, 500),
        st.tuples(st.sampled_from(["a", "b"]), st.integers(0, 1000)),
        min_size=1,
        max_size=25,
    ).map(lambda d: [(i, g, v) for i, (g, v) in d.items()]),
)
def test_matches_python_model(spark, rows):
    got, want = _run(spark, rows), _model(rows)
    assert set(got) == set(want)
    for g, w in want.items():
        assert got[g]["n_docs"] == w["n_docs"]
        for k in ("mean_value", "boot_lo", "boot_hi"):
            assert got[g][k] == pytest.approx(w[k], abs=2e-6), f"{g}.{k}"


def test_interval_properties(spark):
    """On a 400-row group the 90% interval must bracket the exact mean
    and be narrower than a 40-row group's interval over the same value
    distribution (deterministic fixture — no flakiness)."""
    big = [(i, "big", (i * 37) % 100) for i in range(400)]
    small = [(10_000 + i, "small", ((10_000 + i) * 37) % 100) for i in range(40)]
    got = _run(spark, big + small)
    b, s = got["big"], got["small"]
    for row in (b, s):
        assert row["boot_lo"] <= row["mean_value"] <= row["boot_hi"]
        assert row["boot_lo"] <= row["boot_hi"]
    assert (b["boot_hi"] - b["boot_lo"]) < (s["boot_hi"] - s["boot_lo"])


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, g string, v long")


def test_edges_and_contract(spark):
    # 1-row group: some replicates draw weight 0 and are dropped; the
    # surviving ones all estimate exactly v, so the interval is [v, v]
    got = _run(spark, [(1, "one", 42)])
    assert got["one"]["boot_lo"] == 42.0 and got["one"]["boot_hi"] == 42.0
    df = _df(spark, [(1, "a", 1)])
    with pytest.raises(ValueError, match="lo_rank"):
        poisson_bootstrap_ci(df, "v", "g", "doc_id", lo_rank=0)
    with pytest.raises(ValueError, match="lo_rank"):
        poisson_bootstrap_ci(df, "v", "g", "doc_id", lo_rank=5, hi_rank=3)


def test_determinism_across_partitioning(spark):
    rows = [(i, "a" if i % 3 else "b", (i * 13) % 50) for i in range(120)]
    df = _df(spark, rows)
    a = sorted(
        poisson_bootstrap_ci(df.coalesce(1), "v", "g", "doc_id").collect()
    )
    b = sorted(
        poisson_bootstrap_ci(df.repartition(16), "v", "g", "doc_id").collect()
    )
    assert a == b


def test_plan_pins(spark):
    from tests.test_plans import plan_of

    df = _df(spark, [(i, "a", i) for i in range(10)])
    plan = plan_of(poisson_bootstrap_ci(df, "v", "g", "doc_id"))
    # the replicate unpivot (Generate) must run on the AGGREGATED frame:
    # below the explode there is no further aggregate — i.e. the corpus
    # pass happens before any Generate node in the plan tree
    gen = plan.index("Generate")
    assert "HashAggregate" in plan[gen:], "explode must feed off the agg"
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
