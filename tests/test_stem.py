"""X142 Porter-lite stem folding (queries.stem_fold_report +
functions/stem.py): rule-chain unit cases through all three mirrors
(Spark expression, python mirror, and the oracle gate covers DuckDB),
collision clustering of plural/gerund families, sort_array-forced
surface samples, fold-constant invariants, determinism + plan pins."""

from __future__ import annotations

import os
import re
import tempfile

import pandas as pd

from ocr_output_evaluation_spark.functions.stem import (
    porter_lite_py,
    porter_lite_sql,
)
from ocr_output_evaluation_spark.queries import stem_fold_report

SF = "/root/testdata/sf0.001"

CASES = {
    "caresses": "caress",
    "ponies": "poni",
    "cats": "cat",
    "caress": "caress",  # -ss kept by the [a-rt-z] class
    "running": "runn",
    "sing": "sing",  # stem would be <3 chars: kept
    "plastered": "plaster",
    "red": "red",  # stem would be <2 chars: kept
    "quickly": "quick",
    "the": "the",
    "bus": "bu",  # documented over-stem: the lite chain has no 'us' guard
}


def _toks(text):
    t = re.sub(r"\s+", " ", re.sub(r"[^a-z ]+", " ", text.lower())).strip()
    return t.split(" ") if t else []


def _mirror(texts):
    vocab = set()
    for s in texts:
        vocab.update(_toks(s))
    per = {}
    for w in vocab:
        per.setdefault(porter_lite_py(w), []).append(w)
    n_types, n_stems = len(vocab), len(per)
    rows = sorted(
        ((len(ws), st, ws) for st, ws in per.items()),
        key=lambda x: (-x[0], x[1]),
    )[:10]
    out = []
    for i, (n, st, ws) in enumerate(rows, 1):
        out.append(
            dict(
                rank=i,
                stem=st,
                n_surface=n,
                surfaces="|".join(sorted(ws)[:3]),
                n_types=n_types,
                n_stems=n_stems,
                reduction=round(1.0 - n_stems / n_types, 6),
            )
        )
    return out


def _write(texts):
    tmp = tempfile.mkdtemp()
    pd.DataFrame(
        [
            dict(doc_id=i, text=s, lang="en", source="s0", n_chars=len(s))
            for i, s in enumerate(texts)
        ]
    ).to_parquet(os.path.join(tmp, "documents.parquet"))
    return tmp


def _collect(spark, sf):
    return [r.asDict() for r in stem_fold_report(spark, sf).collect()]


def test_stem_rule_chain_units(spark):
    from pyspark.sql import functions as F

    from ocr_output_evaluation_spark.functions.stem import porter_lite

    df = spark.createDataFrame([(w,) for w in CASES], ["w"])
    got = {
        r.w: r.s
        for r in df.select("w", porter_lite(F.col("w")).alias("s")).collect()
    }
    assert got == CASES
    assert {w: porter_lite_py(w) for w in CASES} == CASES


def test_stem_sql_twin_matches_python(spark):
    import duckdb

    expr = porter_lite_sql("w")
    rows = ", ".join(f"('{w}')" for w in CASES)
    got = dict(
        duckdb.sql(
            f"SELECT w, {expr} AS s FROM (VALUES {rows}) t(w)"
        ).fetchall()
    )
    assert got == CASES


def test_stem_collision_clusters(spark):
    texts = [
        "walk walks walking walked",
        "pony ponies",
        "cat cats dress dresses",
    ]
    got = _collect(spark, _write(texts))
    assert got == _mirror(texts)
    by = {r["stem"]: r for r in got}
    assert by["walk"]["n_surface"] == 4
    assert by["walk"]["surfaces"] == "walk|walked|walking"
    assert by["cat"]["n_surface"] == 2
    assert by["dress"]["n_surface"] == 2


def test_stem_fold_constants(spark):
    # running -> "runn" stays its own stem (the lite chain has no
    # double-consonant cleanup): 5 types fold to {run, runn, jump}
    texts = ["runs run running", "jump jumps"]
    got = _collect(spark, _write(texts))
    assert got == _mirror(texts)
    r = got[0]
    assert r["n_types"] == 5 and r["n_stems"] == 3
    assert r["reduction"] == round(1 - 3 / 5, 6)


def test_stem_sf_determinism_and_plan(spark):
    a = _collect(spark, SF)
    assert a == _collect(spark, SF)
    assert len(a) == 10
    assert all(a[i]["n_surface"] >= a[i + 1]["n_surface"] for i in range(9))
    from tests.test_plans import plan_of

    plan = plan_of(stem_fold_report(spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan
