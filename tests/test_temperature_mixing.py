"""X68 temperature-scaled mixing quotas: exact integer-math mirror, the
alpha=1 proportional and alpha=0 uniform limits, the low-resource boost
property, and the end-to-end kept==quota pin via apply_mixture."""

from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import functions as F

from ocr_output_evaluation_spark.operators.mixing import (
    apply_mixture,
    temperature_quotas,
)


def _docs(spark, sizes):
    rows, i = [], 0
    for s, n in sizes.items():
        for _ in range(n):
            rows.append((i, s))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, source string")


def _py_quotas(sizes, alpha, frac):
    # F.round is HALF_UP — mirror with Decimal, not python's banker round
    wn = {
        s: int(
            Decimal(n**alpha * 1e9).quantize(Decimal(1), rounding=ROUND_HALF_UP)
        )
        for s, n in sizes.items()
    }
    total, sumw = sum(sizes.values()), sum(wn.values())
    budget = int(total * frac)
    return {s: min(sizes[s], wn[s] * budget // sumw) for s in sizes}


def _run(spark, sizes, alpha, frac=0.5):
    q = temperature_quotas(_docs(spark, sizes), "source", alpha, frac)
    return {r.source: r for r in q.collect()}


def test_matches_integer_mirror(spark):
    sizes = {"a": 8, "b": 1, "c": 27, "d": 100}
    got = _run(spark, sizes, 0.3)
    want = _py_quotas(sizes, 0.3, 0.5)
    assert {s: r.quota for s, r in got.items()} == want


def test_alpha_one_is_proportional_alpha_zero_is_uniform(spark):
    sizes = {"a": 40, "b": 10, "c": 50}
    got1 = _run(spark, sizes, 1.0)
    assert {s: r.quota for s, r in got1.items()} == _py_quotas(sizes, 1.0, 0.5)
    # alpha=1: temp share == raw share
    for r in got1.values():
        assert r.temp_frac == r.raw_frac
    got0 = _run(spark, sizes, 0.0)
    # alpha=0: every source gets budget/k
    assert {s: r.quota for s, r in got0.items()} == {"a": 16, "b": 10, "c": 16}


def test_low_resource_boost(spark):
    sizes = {"big": 900, "small": 100}
    got = _run(spark, sizes, 0.3)
    assert got["small"].temp_frac > got["small"].raw_frac
    assert got["big"].temp_frac < got["big"].raw_frac


def test_kept_equals_quota_end_to_end(spark):
    sizes = {"a": 12, "b": 3, "c": 7}
    d = _docs(spark, sizes)
    q = temperature_quotas(d, "source", 0.3, 0.5)
    kept = (
        apply_mixture(d, "source", "doc_id", q)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("kept"))
    )
    quotas = {r.source: r.quota for r in q.collect()}
    assert {r.source: r.kept for r in kept.collect()} == {
        s: n for s, n in quotas.items() if n > 0
    }
