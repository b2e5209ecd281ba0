"""X72 DoReMi domain reweighting (operators/doremi.py): pure-Python
model crosscheck (exact integer nano parity on the domain losses, the
full multiplicative-weights trajectory), the reweighting property the
method exists for (underserved domains gain weight), conservation and
smoothing floors, the fixed-unroll contract, and plan pins (broadcast
loss table, no Python UDFs)."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ocr_output_evaluation_spark.operators.doremi import (
    OOV_NANO,
    domain_excess_losses,
    doremi_weights,
    merged_loss_table,
)
from ocr_output_evaluation_spark.operators.perplexity import (
    normalize_text_py,
    train_char_lm,
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
N_STEPS, ETA, SMOOTH = 5, 1.0, 0.01


def _grams(t: str) -> list[str]:
    n = normalize_text_py(t)
    return [n[i : i + 3] for i in range(len(n) - 2)] if len(n) >= 3 else []


def _lm(texts: list[str]) -> dict[str, float]:
    c: dict[str, int] = {}
    for t in texts:
        for g in _grams(t):
            c[g] = c.get(g, 0) + 1
    tot, vocab = sum(c.values()), len(c)
    return {g: math.log10((k + 1.0) / (tot + vocab)) for g, k in c.items()}


def _model(docs: dict[str, list[str]], proxy_domains: set[str]):
    """-> ({domain: (n_grams, proxy_nano, ref_nano, excess)},
    {domain: (w_final, w_avg)}) replaying the operator's exact integer
    discipline in plain Python."""
    proxy = _lm([t for d in proxy_domains for t in docs.get(d, [])])
    ref = _lm([t for ts in docs.values() for t in ts])
    pn = {g: int(round(-lp * 1e9)) for g, lp in proxy.items()}
    rn = {g: int(round(-lp * 1e9)) for g, lp in ref.items()}
    losses = {}
    for dom, ts in docs.items():
        gs = [g for t in ts for g in _grams(t)]
        if not gs:
            continue
        p = sum(pn.get(g, OOV_NANO) for g in gs)
        r = sum(rn.get(g, OOV_NANO) for g in gs)
        ex = round(max(0.0, (p - r) / (1e9 * len(gs))), 9)
        losses[dom] = (len(gs), p, r, ex)
    k = len(losses)
    wn = {d: int(round(1e9 / k)) for d in losses}
    mn = {d: int(round(math.exp(ETA * losses[d][3]) * 1e9)) for d in losses}
    acc = {d: 0 for d in losses}
    for _ in range(N_STEPS):
        raw = {
            d: int(round((wn[d] / 1e9) * (mn[d] / 1e9) * 1e9)) for d in losses
        }
        s = float(sum(raw.values()))
        wn = {
            d: int(round(((1 - SMOOTH) * (raw[d] / s) + SMOOTH / k) * 1e9))
            for d in losses
        }
        acc = {d: acc[d] + wn[d] for d in losses}
    weights = {
        d: (round(wn[d] / 1e9, 6), round(acc[d] / (1e9 * N_STEPS), 6))
        for d in losses
    }
    return losses, weights


def _frames(spark, docs: dict[str, list[str]], proxy_domains: set[str]):
    rows = [
        (i, dom, "en", t)
        for i, (dom, t) in enumerate(
            (d, t) for d, ts in sorted(docs.items()) for t in ts
        )
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, source string, lang string, text string"
    )
    lm_p = train_char_lm(
        df.filter(F.col("source").isin(*proxy_domains)), text_col="text"
    )
    lm_r = train_char_lm(df, text_col="text")
    return df, lm_p, lm_r


@settings(**FAST)
@given(
    docs=st.dictionaries(
        st.sampled_from(["a", "b", "c", "d"]),
        st.lists(
            st.lists(st.sampled_from(WORDS), min_size=1, max_size=6).map(
                " ".join
            ),
            min_size=1,
            max_size=4,
        ),
        min_size=2,
        max_size=4,
    ),
)
def test_matches_python_model(spark, docs):
    docs.setdefault("a", ["mountain river"])
    df, lm_p, lm_r = _frames(spark, docs, {"a"})
    losses = domain_excess_losses(
        df, lm_p, lm_r, domain_col="source"
    )
    got_l = {
        r.domain: (r.n_grams, r.proxy_nano, r.ref_nano, r.excess)
        for r in losses.collect()
    }
    want_l, want_w = _model(docs, {"a"})
    assert set(got_l) == set(want_l)
    for d, (n, p, r_, ex) in want_l.items():
        assert got_l[d][:3] == (n, p, r_), f"domain {d}"
        assert got_l[d][3] == pytest.approx(ex, abs=2e-9)
    got_w = {
        r.domain: (r.w_final, r.w_avg)
        for r in doremi_weights(losses, N_STEPS, ETA, SMOOTH).collect()
    }
    assert set(got_w) == set(want_w)
    for d, (wf, wa) in want_w.items():
        assert got_w[d][0] == pytest.approx(wf, abs=2e-6), f"domain {d}"
        assert got_w[d][1] == pytest.approx(wa, abs=2e-6), f"domain {d}"


def test_reweighting_property(spark):
    """The method's reason to exist: a domain the proxy model underserves
    (disjoint vocabulary from the proxy's training slice) must end with
    MORE than uniform weight, the well-served domain with less; weights
    stay a distribution and respect the smoothing floor."""
    docs = {
        "seed": ["mountain river mountain river"] * 3,
        "alien": ["shuffle query zot shuffle query zot"] * 3,
    }
    df, lm_p, lm_r = _frames(spark, docs, {"seed"})
    rows = doremi_weights(
        domain_excess_losses(df, lm_p, lm_r), N_STEPS, ETA, SMOOTH
    ).collect()
    w = {r.domain: r for r in rows}
    assert w["alien"].excess > 0.0
    assert w["seed"].excess == 0.0
    assert w["alien"].w_final > 0.5 > w["seed"].w_final
    assert w["alien"].w_avg > 0.5 > w["seed"].w_avg
    total = sum(r.w_final for r in rows)
    assert total == pytest.approx(1.0, abs=1e-5)
    floor = SMOOTH / len(rows)
    assert all(r.w_final >= floor - 1e-9 for r in rows)
    # zero excess everywhere -> exactly uniform at every step
    uni = doremi_weights(
        domain_excess_losses(df, lm_r, lm_r), N_STEPS, ETA, SMOOTH
    ).collect()
    for r in uni:
        assert r.w_final == pytest.approx(0.5, abs=2e-6)
        assert r.w_avg == pytest.approx(0.5, abs=2e-6)


def test_fixed_unroll_contract(spark):
    docs = {"a": ["mountain river"], "b": ["spark table"]}
    df, lm_p, lm_r = _frames(spark, docs, {"a"})
    losses = domain_excess_losses(df, lm_p, lm_r)
    with pytest.raises(ValueError, match="n_steps"):
        doremi_weights(losses, n_steps=0)


def test_merged_table_backoff(spark):
    """Grams in one vocab only carry the OOV constant on the other side;
    a join miss coalescing to (OOV, OOV) is therefore exact."""
    docs = {"a": ["mountain"], "b": ["shuffle"]}
    df, lm_p, lm_r = _frames(spark, docs, {"a"})
    tbl = {r.ngram: (r._pn, r._rn) for r in merged_loss_table(lm_p, lm_r).collect()}
    for g in _grams("shuffle"):
        assert tbl[g][0] == OOV_NANO  # proxy never saw it
        assert tbl[g][1] != OOV_NANO


def test_plan_pins(spark):
    from tests.test_plans import n_nodes, plan_of

    docs = {
        "a": ["mountain river"] * 2,
        "b": ["spark table query"] * 2,
        "c": ["shuffle zot"] * 2,
    }
    df, lm_p, lm_r = _frames(spark, docs, {"a"})
    out = doremi_weights(
        domain_excess_losses(df, lm_p, lm_r), N_STEPS, ETA, SMOOTH
    )
    plan = plan_of(out)
    # the vocab-scale loss table broadcasts into the one corpus pass
    assert n_nodes(plan, "BroadcastHashJoin") >= 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
