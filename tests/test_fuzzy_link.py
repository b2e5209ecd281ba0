"""X109 blocked fuzzy record linkage (queries.fuzzy_link_report):
python mirror (same corruption/blocking/comparator/tiebreak), planted
catalog with known best matches, block-miss NULL row, no-vowel
identity probe, determinism + self-match invariants, plan pins (probe
broadcast, no nested-loop). DuckDB value identity is the oracle gate's
job (ORACLE_FUZZY_LINK)."""

from __future__ import annotations

import os
import re
import tempfile

import pandas as pd

from ocr_output_evaluation_spark.queries import fuzzy_link_report

SF = "/root/testdata/sf0.001"


def _lev(a, b):
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (a[i - 1] != b[j - 1]),
            )
        prev = cur
    return prev[n]


def _mirror(parts):
    """parts: list[(key, name)] -> report dicts for keys % 7 == 0."""
    out = []
    for k, name in parts:
        if k % 7:
            continue
        probe = re.sub(r"^([^aeiou]*)[aeiou]", r"\1", name, count=1)
        blk = probe.split(" ")[-1]
        cands = [
            (c_k, _lev(probe, c_n))
            for c_k, c_n in parts
            if c_n.split(" ")[-1] == blk and _lev(probe, c_n) <= 2
        ]
        if cands:
            d, ck = min((d, ck) for ck, d in cands)
            out.append(
                dict(
                    probe_key=k,
                    probe_name=probe,
                    match_key=ck,
                    lev_dist=d,
                    n_candidates=len(cands),
                )
            )
        else:
            out.append(
                dict(
                    probe_key=k,
                    probe_name=probe,
                    match_key=None,
                    lev_dist=None,
                    n_candidates=0,
                )
            )
    return sorted(out, key=lambda r: r["probe_key"])


def _write(parts):
    tmp = tempfile.mkdtemp()
    pd.DataFrame(
        {
            "p_partkey": [k for k, _ in parts],
            "p_name": [n for _, n in parts],
            "p_type": "t",
            "p_retailprice": 1.0,
        }
    ).to_parquet(os.path.join(tmp, "part.parquet"))
    return tmp


def _collect(spark, sf):
    return [r.asDict() for r in fuzzy_link_report(spark, sf).collect()]


def test_fuzzy_planted_best_match(spark):
    parts = [
        (0, "small ring"),  # probe: "smll ring" -> dist 1 to itself
        (1, "small ring"),
        (2, "smell ring"),  # dist 2 from "smll ring"
        (3, "red ring"),
        (7, "blue bolt"),  # probe: "ble bolt" -> dist 1 to 7, 2 to 8
        (8, "blu bolt"),
        (9, "red gear"),
    ]
    got = _collect(spark, _write(parts))
    assert got == _mirror(parts)
    by = {r["probe_key"]: r for r in got}
    # (dist, key) tiebreak: key 0 and 1 are both dist 1; 0 wins
    assert by[0]["match_key"] == 0 and by[0]["lev_dist"] == 1
    assert by[0]["n_candidates"] == 3
    assert by[7]["match_key"] == 7 and by[7]["lev_dist"] == 1


def test_fuzzy_block_miss_null(spark):
    # the only vowel sits in the LAST word: the block key mutates and no
    # catalog row shares it -> NULL match, 0 candidates
    parts = [(0, "xyz ping"), (1, "xyz pong")]
    got = _collect(spark, _write(parts))
    assert got == _mirror(parts)
    assert got[0]["match_key"] is None and got[0]["n_candidates"] == 0


def test_fuzzy_no_vowel_identity(spark):
    parts = [(0, "xyz grr"), (1, "xyz grr")]
    got = _collect(spark, _write(parts))
    assert got == _mirror(parts)
    assert got[0]["lev_dist"] == 0 and got[0]["match_key"] == 0


def test_fuzzy_sf_determinism_and_plan(spark):
    a = _collect(spark, SF)
    assert a == _collect(spark, SF)
    # every probe with a vowel self-matches at distance <= 1
    assert all(r["lev_dist"] is None or r["lev_dist"] <= 1 for r in a)
    assert all(r["n_candidates"] >= 1 for r in a if r["match_key"] is not None)
    from tests.test_plans import plan_of

    plan = plan_of(fuzzy_link_report(spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
