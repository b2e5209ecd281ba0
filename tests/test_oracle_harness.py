"""Negative controls for the oracle gate itself: the comparators must
actually FLAG value, count, schema, and stringification drift — a gate
that can't fail is no gate (meta-test; no Spark needed)."""

import pandas as pd

from tools.check_oracle import frames_equal, strict_issues


def _df(rows, cols):
    return pd.DataFrame(rows, columns=cols)


def test_equal_frames_pass_both_levels():
    a = _df([(1, "x", 1.5), (2, "y", float("nan"))], ["k", "s", "v"])
    b = _df([(2, "y", float("nan")), (1, "x", 1.5)], ["k", "s", "v"])
    assert frames_equal(a, b) == []
    assert strict_issues(a, b) == []


def test_value_drift_flagged():
    a = _df([(1, 10)], ["k", "v"])
    b = _df([(1, 11)], ["k", "v"])
    assert frames_equal(a, b)


def test_row_count_drift_flagged():
    a = _df([(1,), (2,)], ["k"])
    b = _df([(1,)], ["k"])
    assert any("row count" in m for m in frames_equal(a, b))


def test_schema_drift_flagged():
    a = _df([(1,)], ["k"])
    b = _df([(1,)], ["kk"])
    assert any("columns differ" in m for m in frames_equal(a, b))
    assert any("columns differ" in m for m in strict_issues(a, b))


def test_strict_catches_stringified_dtype_drift():
    """The round-1 user_sessions false negative, pinned forever: equal
    VALUES but BIGINT-vs-float64 dtypes pass the lenient compare and
    must still red-flag at the driver-hash level ('1' vs '1.0')."""
    a = _df([(1,)], ["n"]).astype({"n": "int64"})
    b = _df([(1.0,)], ["n"])  # float64, as a HUGEINT->pandas cast yields
    assert frames_equal(a, b) == []  # lenient: values equal
    assert strict_issues(a, b)  # strict: stringification differs


def test_null_vs_value_flagged_strict():
    a = _df([(None,)], ["v"])
    b = _df([(0,)], ["v"])
    assert strict_issues(a, b)
