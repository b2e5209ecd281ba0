"""X114 Apriori association rules (queries.apriori_report): exact-count
python mirror over planted baskets, perfect-implication confidence=1,
independence lift=1, negative association lift<1, duplicate events
collapse to one basket item, determinism + symmetry invariants, plan
pins. DuckDB value identity is the oracle gate's job (ORACLE_APRIORI)."""

from __future__ import annotations

import os
import tempfile
from collections import Counter
from itertools import permutations

import pandas as pd

from ocr_output_evaluation_spark.queries import apriori_report

SF = "/root/testdata/sf0.001"


def _mirror(baskets):
    """baskets: list[set[str]] -> rule dicts ordered by (a, b)."""
    n = len(baskets)
    c1 = Counter()
    for bk in baskets:
        c1.update(bk)
    c2 = Counter()
    for bk in baskets:
        for a, b in permutations(sorted(bk), 2):
            c2[(a, b)] += 1
    return [
        dict(
            antecedent=a,
            consequent=b,
            n_users=n,
            n_ab=c2[(a, b)],
            n_a=c1[a],
            n_b=c1[b],
            support=round(c2[(a, b)] / n, 6),
            confidence=round(c2[(a, b)] / c1[a], 6),
            lift=round(c2[(a, b)] * n / (c1[a] * c1[b]), 6),
        )
        for a, b in sorted(c2)
    ]


def _write(baskets, dup_last=False):
    tmp = tempfile.mkdtemp()
    recs = []
    eid = 0
    for uid, bk in enumerate(baskets):
        for ty in sorted(bk):
            reps = 3 if dup_last else 1  # repeated events must not recount
            for _ in range(reps):
                recs.append(
                    dict(
                        event_id=eid,
                        ts=pd.Timestamp(1_700_000_000_000_000 + eid * 1_000_000,
                                        unit="us"),
                        user_id=uid,
                        event_type=ty,
                        value=1.0,
                        props="{}",
                    )
                )
                eid += 1
    df = pd.DataFrame(recs)
    df["ts"] = df["ts"].astype("datetime64[us]")
    df.to_parquet(os.path.join(tmp, "events.parquet"))
    return tmp


def _collect(spark, sf):
    return [r.asDict() for r in apriori_report(spark, sf).collect()]


def test_apriori_perfect_implication(spark):
    # every 'view' basket also has 'click': view->click confidence = 1
    baskets = [{"view", "click"}] * 4 + [{"click"}] * 2
    got = _collect(spark, _write(baskets))
    assert got == _mirror(baskets)
    by = {(r["antecedent"], r["consequent"]): r for r in got}
    assert by[("view", "click")]["confidence"] == 1.0
    assert by[("click", "view")]["confidence"] == round(4 / 6, 6)


def test_apriori_independence_lift_one(spark):
    # a and b occur in half the baskets each, jointly in a quarter:
    # lift = (1/4)/(1/2 * 1/2) = 1 exactly
    baskets = [{"a", "b"}, {"a"}, {"b"}, {"c"}]
    got = _collect(spark, _write(baskets))
    assert got == _mirror(baskets)
    by = {(r["antecedent"], r["consequent"]): r for r in got}
    assert by[("a", "b")]["lift"] == 1.0 and by[("b", "a")]["lift"] == 1.0


def test_apriori_negative_association(spark):
    # a and b co-occur less than independence predicts: lift < 1
    baskets = [{"a", "b"}] + [{"a"}] * 4 + [{"b"}] * 4 + [{"c"}]
    got = _collect(spark, _write(baskets))
    assert got == _mirror(baskets)
    by = {(r["antecedent"], r["consequent"]): r for r in got}
    assert by[("a", "b")]["lift"] == 0.4  # (1/10)/(0.5*0.5)


def test_apriori_duplicate_events_one_item(spark):
    # the same type 3x in a user's stream is ONE basket item
    baskets = [{"a", "b"}, {"a"}]
    got = _collect(spark, _write(baskets, dup_last=True))
    assert got == _mirror(baskets)
    assert got[0]["n_ab"] == 1 and got[0]["n_a"] == 2


def test_apriori_sf_determinism_and_plan(spark):
    a = _collect(spark, SF)
    assert a == _collect(spark, SF)
    assert len(a) > 1
    by = {(r["antecedent"], r["consequent"]): r for r in a}
    for (x, y), r in by.items():
        assert by[(y, x)]["n_ab"] == r["n_ab"]  # pair counts symmetric
        assert abs(by[(y, x)]["lift"] - r["lift"]) <= 1e-6
        assert r["n_ab"] <= min(r["n_a"], r["n_b"]) <= r["n_users"]
    from tests.test_plans import plan_of

    plan = plan_of(apriori_report(spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan and "BroadcastHashJoin" in plan
