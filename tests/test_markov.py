"""X110 event-type Markov chain (queries.markov_report): exact-integer
python mirror of the transition matrix + nano-BIGINT power iteration,
planted two-state period-2 chain (uniform stationary), absorbing state
(all mass in one step), dangling-type renormalization, determinism +
stochasticity invariants, plan pins. DuckDB value identity is the
oracle gate's job (_oracle_markov)."""

from __future__ import annotations

import os
import tempfile
from collections import defaultdict

import pandas as pd

from ocr_output_evaluation_spark.queries import _MARKOV_ITERS, markov_report

SF = "/root/testdata/sf0.001"

NANO = 1_000_000_000


def _mirror(rows):
    """rows: list[(user_id, us, event_id, type)] -> report dicts."""
    by_user = defaultdict(list)
    for u, us, eid, ty in rows:
        by_user[u].append((us, eid, ty))
    c = defaultdict(int)
    for u in by_user:
        seq = [ty for _, _, ty in sorted(by_user[u])]
        for a, b in zip(seq, seq[1:]):
            c[(a, b)] += 1
    rt = defaultdict(int)
    for (a, _), n in c.items():
        rt[a] += n
    p = {k: (n * NANO + rt[k[0]] // 2) // rt[k[0]] for k, n in c.items()}
    types = sorted({a for a, _ in c} | {b for _, b in c})
    nt = len(types)
    pi = {t: NANO // max(nt, 1) for t in types}
    for _ in range(_MARKOV_ITERS):
        raw = {t: 0 for t in types}
        for (a, b), pn in p.items():
            raw[b] += (pi[a] * pn + NANO // 2) // NANO
        tot = sum(raw.values())
        pi = {t: (raw[t] * NANO) // tot if tot > 0 else 0 for t in types}
    return [
        dict(
            from_type=a,
            to_type=b,
            n_trans=c[(a, b)],
            p_nano=p[(a, b)],
            stat_from_nano=pi[a],
        )
        for a, b in sorted(c)
    ]


def _write(rows):
    tmp = tempfile.mkdtemp()
    recs = [
        dict(
            event_id=eid,
            ts=pd.Timestamp(us, unit="us"),
            user_id=u,
            event_type=ty,
            value=1.0,
            props="{}",
        )
        for u, us, eid, ty in rows
    ]
    df = pd.DataFrame(recs)
    df["ts"] = df["ts"].astype("datetime64[us]")
    df.to_parquet(os.path.join(tmp, "events.parquet"))
    return tmp


def _seq(user, types, t0=1_700_000_000_000_000):
    return [(user, t0 + i * 1_000_000, user * 1000 + i, ty) for i, ty in enumerate(types)]


def _collect(spark, sf):
    return [r.asDict() for r in markov_report(spark, sf).collect()]


def test_markov_period2_uniform_stationary(spark):
    # a->b and b->a only: P swaps the two states, so the uniform start is
    # exactly invariant under every iteration -> stationary 1/2, 1/2
    rows = _seq(1, ["a", "b", "a", "b", "a"]) + _seq(2, ["b", "a", "b"])
    got = _collect(spark, _write(rows))
    assert got == _mirror(rows)
    assert all(r["p_nano"] == NANO for r in got)
    assert all(r["stat_from_nano"] == NANO // 2 for r in got)


def test_markov_absorbing_state(spark):
    # a->b always, b->b always: one step moves all mass to b and keeps it
    rows = _seq(1, ["a", "b", "b", "b"]) + _seq(2, ["a", "b", "b"])
    got = _collect(spark, _write(rows))
    assert got == _mirror(rows)
    by = {(r["from_type"], r["to_type"]): r for r in got}
    assert by[("a", "b")]["stat_from_nano"] == 0
    assert by[("b", "b")]["stat_from_nano"] == NANO


def test_markov_dangling_type_renormalized(spark):
    # b has no outgoing edges: its inbound mass is lost each step and the
    # integer renormalization re-inflates the rest back to sum 1e9
    rows = _seq(1, ["a", "a", "a", "a", "b"])
    got = _collect(spark, _write(rows))
    assert got == _mirror(rows)
    by = {(r["from_type"], r["to_type"]): r for r in got}
    assert by[("a", "a")]["p_nano"] == 750_000_000
    assert by[("a", "b")]["p_nano"] == 250_000_000


def test_markov_split_probabilities_half_up(spark):
    # a emits 3 transitions: 2->b, 1->c -> p = 2/3, 1/3 half-up in nanos
    rows = _seq(1, ["a", "b"]) + _seq(2, ["a", "b"]) + _seq(3, ["a", "c"]) + _seq(
        4, ["b", "a"]
    ) + _seq(5, ["c", "a"])
    got = _collect(spark, _write(rows))
    assert got == _mirror(rows)
    by = {(r["from_type"], r["to_type"]): r for r in got}
    assert by[("a", "b")]["p_nano"] == 666_666_667  # half-up of 2/3
    assert by[("a", "c")]["p_nano"] == 333_333_333


def test_markov_sf_determinism_and_plan(spark):
    a = _collect(spark, SF)
    assert a == _collect(spark, SF)
    assert len(a) > 0
    # row-stochastic in nanos up to half-up rounding per cell
    rowsum = defaultdict(int)
    nout = defaultdict(int)
    for r in a:
        rowsum[r["from_type"]] += r["p_nano"]
        nout[r["from_type"]] += 1
    for ty, s in rowsum.items():
        assert abs(s - NANO) <= nout[ty]
    # stationary is constant per from_type and sums to ~1e9 over types
    stat = {r["from_type"]: r["stat_from_nano"] for r in a}
    assert all(v >= 0 for v in stat.values())
    from tests.test_plans import plan_of

    plan = plan_of(markov_report(spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Window" in plan and "HashAggregate" in plan
