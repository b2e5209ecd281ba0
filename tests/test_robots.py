"""X62 robots-policy filter: RFC 9309 longest-match semantics, the
Allow-wins tie rule, default-allow, python-model fuzz, broadcast plan."""

import io
from contextlib import redirect_stdout

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ocr_output_evaluation_spark.functions.robots import robots_verdicts

FAST = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)


def _py_verdict(path, rules):
    """rules: list[(prefix, allow)] for the url's host."""
    best = None
    for p, a in rules:
        if path.startswith(p):
            key = (len(p), a)
            if best is None or key > best:
                best = key
    return (1, 0) if best is None else (best[1], best[0])


def _run(spark, urls, rules):
    u = spark.createDataFrame(urls, "host string, path string, uid long")
    r = (
        spark.createDataFrame(rules, "host string, prefix string, allow int")
        if rules
        else spark.createDataFrame([], "host string, prefix string, allow int")
    )
    return {
        row.uid: (row.allowed, row.rule_len)
        for row in robots_verdicts(u, r).collect()
    }


def test_rfc_semantics(spark):
    urls = [
        ("h", "/p/123", 1),  # /p/12 (allow, len 5) beats /p/1 (deny, 4)
        ("h", "/p/134", 2),  # /p/1 deny
        ("h", "/p/234", 3),  # only /p/ deny
        ("h", "/q/1", 4),  # no match -> default allow
        ("h2", "/p/134", 5),  # other host: no rules at all -> allow
        ("h", "/p/5", 6),  # equal-length tie: deny /p/5 vs allow /p/5
    ]
    rules = [
        ("h", "/p/1", 0),
        ("h", "/p/12", 1),
        ("h", "/p/", 0),
        ("h", "/p/5", 0),
        ("h", "/p/5", 1),
    ]
    got = _run(spark, urls, rules)
    assert got[1] == (1, 5)
    assert got[2] == (0, 4)
    assert got[3] == (0, 3)
    assert got[4] == (1, 0)
    assert got[5] == (1, 0)
    assert got[6] == (1, 4)  # Allow wins the equal-length tie (RFC 9309)


@settings(**FAST)
@given(
    paths=st.lists(
        st.text(alphabet="/abp12", min_size=1, max_size=6),
        min_size=1,
        max_size=8,
    ),
    rules=st.lists(
        st.tuples(
            st.text(alphabet="/abp12", min_size=1, max_size=4),
            st.integers(0, 1),
        ),
        min_size=0,
        max_size=6,
    ),
)
def test_robots_fuzz_matches_python_model(spark, paths, rules):
    urls = [("h", p, i) for i, p in enumerate(paths)]
    rdf = [("h", p, a) for p, a in rules]
    got = _run(spark, urls, rdf)
    for i, p in enumerate(paths):
        assert got[i] == _py_verdict(p, rules), (p, rules)


def test_rules_broadcast_plan(spark):
    u = spark.createDataFrame([("h", "/p/1", 1)], "host string, path string, uid long")
    r = spark.createDataFrame([("h", "/p", 0)], "host string, prefix string, allow int")
    df = robots_verdicts(u, r)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
