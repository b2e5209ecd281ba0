"""X46 HyperLogLog distinct-count sketch (operators/hll.py)."""

import hashlib
import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F


def _py_rho(s: str) -> int:
    hx = hashlib.md5(("r:" + s).encode()).hexdigest()[:15]
    nz = hx.lstrip("0")
    if not nz:
        return 61
    c = nz[0]
    clz4 = 3 if c == "1" else 2 if c in "23" else 1 if c in "4567" else 0
    return (15 - len(nz)) * 4 + clz4 + 1


def _py_estimate(keys, m=256):
    regs = {}
    for s in keys:
        b = int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % m
        regs[b] = max(regs.get(b, 0), _py_rho(s))
    # exact python-int harmonic denominator, then the SAME double ops in
    # the SAME order as hll_estimate / the DuckDB oracle
    s_int = sum(1 << (62 - r) for r in regs.values()) + (m - len(regs)) * (1 << 62)
    alpha = 0.7213 / (1.0 + 1.079 / float(m))
    raw = alpha * float(m) * float(m) * float(1 << 62) / float(s_int)
    v = m - len(regs)
    if raw <= 2.5 * float(m) and v > 0:
        import math

        return len(regs), float(m) * math.log(float(m) / float(v))
    return len(regs), raw


def test_hll_matches_python_model_exactly(spark):
    """Bit-level crosscheck vs an independent pure-python HLL over the
    same md5 hash family: registers, bucket count, and the final double
    (every float op IEEE-specified and operand-order-identical)."""
    from ocr_output_evaluation_spark.operators.hll import (
        hll_estimate,
        hll_registers,
    )

    keys = [f"key-{i}" for i in range(5000)]
    df = spark.createDataFrame([(k,) for k in keys], "k string").withColumn(
        "grp", F.lit("a")
    )
    got = hll_estimate(hll_registers(df, "k", ["grp"]), ["grp"]).collect()
    nreg, est = _py_estimate(keys)
    assert len(got) == 1
    assert got[0]["n_buckets_hit"] == nreg
    assert got[0]["n_hll"] == est  # exact double equality, not approx


def test_hll_accuracy_and_duplicate_insensitivity(spark):
    """m=256 gives ~6.5% typical error — assert a loose 15% bound on 20k
    keys; and feeding every key 3x changes nothing (max is idempotent —
    the reason HLL never needs a distinct pass)."""
    from ocr_output_evaluation_spark.operators.hll import (
        hll_estimate,
        hll_registers,
    )

    df = spark.range(20000).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("k"), F.lit("g").alias("grp")
    )
    est1 = hll_estimate(hll_registers(df, "k", ["grp"]), ["grp"]).collect()[0][
        "n_hll"
    ]
    assert abs(est1 - 20000) / 20000 < 0.15, est1
    tripled = df.unionAll(df).unionAll(df)
    est3 = hll_estimate(hll_registers(tripled, "k", ["grp"]), ["grp"]).collect()[
        0
    ]["n_hll"]
    assert est3 == est1


def test_hll_merge_equals_union(spark):
    """The mergeability contract: sketch(A) max-merged with sketch(B) is
    register-identical to sketch(A ∪ B) — what lets per-shard sketches
    roll up without re-reading data."""
    from ocr_output_evaluation_spark.operators.hll import (
        hll_merge,
        hll_registers,
    )

    a = spark.range(0, 3000).select(
        F.concat(F.lit("k"), F.col("id")).alias("k"), F.lit("g").alias("grp")
    )
    b = spark.range(2000, 6000).select(  # overlapping ranges on purpose
        F.concat(F.lit("k"), F.col("id")).alias("k"), F.lit("g").alias("grp")
    )
    merged = {
        (r["grp"], r["_bucket"]): r["_rho"]
        for r in hll_merge(
            hll_registers(a, "k", ["grp"]), hll_registers(b, "k", ["grp"])
        ).collect()
    }
    whole = {
        (r["grp"], r["_bucket"]): r["_rho"]
        for r in hll_registers(a.unionAll(b), "k", ["grp"]).collect()
    }
    assert merged == whole


def test_hll_report_plan_shape(spark, sf_dir):
    """Plan pin for the 100 TB shape: the sketch leg is hash-aggregated
    (map-side combine collapses to <= langs x 256 rows before the wire)
    and the whole report introduces no sort-merge join; the md5 bucketing
    survives as in-row expressions (pmod in the plan)."""
    from ocr_output_evaluation_spark.queries import hll_distinct_report

    buf = io.StringIO()
    with redirect_stdout(buf):
        hll_distinct_report(spark, sf_dir).explain("formatted")
    plan = buf.getvalue()
    assert "SortMergeJoin" not in plan
    assert "HashAggregate" in plan
    assert "pmod" in plan
