"""X47 Count-Min sketch (operators/cms.py)."""

import hashlib
import io
from collections import Counter
from contextlib import redirect_stdout

from pyspark.sql import functions as F


def _py_pos(key: str, j: int, w: int = 1024) -> int:
    return int(hashlib.md5(f"{j}:{key}".encode()).hexdigest()[:15], 16) % w


def _py_cells(stream, d=4, w=1024):
    cells = [0] * (d * w)
    for k in stream:
        for j in range(d):
            cells[j * w + _py_pos(k, j, w)] += 1
    return cells


def test_cms_matches_python_model_exactly(spark):
    """Cell-for-cell identity with an independent pure-python sketch over
    the same md5 hash family, and estimate identity for every key —
    integers, so exact, no tolerance."""
    from ocr_output_evaluation_spark.operators.cms import (
        cms_estimate,
        cms_sketch,
        collect_cms,
    )

    stream = [f"k{i % 300}" for i in range(3000)]  # heavy repetition
    df = spark.createDataFrame([(s,) for s in stream], "k string")
    cells = collect_cms(cms_sketch(df, "k"))
    assert cells == _py_cells(stream)
    want = {k: min(cells[j * 1024 + _py_pos(k, j)] for j in range(4)) for k in set(stream)}
    got = {
        r["k"]: r["est"]
        for r in df.distinct()
        .select("k", cms_estimate(F.col("k"), cells).alias("est"))
        .collect()
    }
    assert got == want


def test_cms_never_underestimates(spark):
    """The defining CMS guarantee: est >= true count for EVERY key (not
    probabilistic — collisions only ever add)."""
    from ocr_output_evaluation_spark.operators.cms import (
        cms_estimate,
        cms_sketch,
        collect_cms,
    )

    # zipf-ish deterministic stream: key i repeated (3000 // (i+1)) times
    stream = [f"w{i}" for i in range(200) for _ in range(3000 // (i + 1))]
    truth = Counter(stream)
    df = spark.createDataFrame([(s,) for s in stream], "k string")
    cells = collect_cms(cms_sketch(df, "k"))
    rows = (
        df.distinct()
        .select("k", cms_estimate(F.col("k"), cells).alias("est"))
        .collect()
    )
    n = len(stream)
    for r in rows:
        assert r["est"] >= truth[r["k"]]
        # loose sanity on the overestimate (eps = e/1024 ~ 0.27% of N)
        assert r["est"] - truth[r["k"]] <= 0.02 * n


def test_cms_merge_equals_concat(spark):
    """Mergeability: sketch(A) + sketch(B) elementwise equals the sketch
    of the concatenated stream — per-shard sketches roll up without
    re-reading data."""
    from ocr_output_evaluation_spark.operators.cms import (
        cms_merge,
        cms_sketch,
        collect_cms,
    )

    a = spark.createDataFrame([(f"k{i % 50}",) for i in range(500)], "k string")
    b = spark.createDataFrame([(f"k{i % 80}",) for i in range(800)], "k string")
    merged = collect_cms(cms_merge(cms_sketch(a, "k"), cms_sketch(b, "k")))
    whole = collect_cms(cms_sketch(a.unionAll(b), "k"))
    assert merged == whole


def test_cms_report_plan_shape(spark, sf_dir):
    """Plan pin for the 100 TB shape: the estimate leg is a pure
    expression over the exact-count frame — no join anywhere in the
    report — and the top-20 is a TakeOrderedAndProject, never a global
    sort."""
    from ocr_output_evaluation_spark.queries import cms_heavy_hitters_report

    buf = io.StringIO()
    with redirect_stdout(buf):
        cms_heavy_hitters_report(spark, sf_dir).explain("formatted")
    plan = buf.getvalue()
    assert "Join" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "pmod" in plan  # the in-row probe survived into the plan
