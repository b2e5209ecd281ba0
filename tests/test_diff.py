"""X52 corpus snapshot diff (operators/diff.py)."""


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_snapshot_diff_classifies_all_four_statuses(spark):
    from ocr_output_evaluation_spark.operators.diff import snapshot_diff

    a = _mk(
        spark,
        [
            (1, "alpha", "en"),
            (2, "bravo", "en"),
            (3, "charlie", "de"),
            (4, "delta", "en"),
        ],
    )
    b = _mk(
        spark,
        [
            (1, "alpha", "en"),      # unchanged
            (2, "bravo EDITED", "en"),  # changed (text)
            (4, "delta", "fr"),      # changed (lang)
            (5, "echo", "en"),       # added
        ],                            # 3 removed
    )
    got = {
        r.doc_id: r.status
        for r in snapshot_diff(a, b, "doc_id", ["text", "lang"]).collect()
    }
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "changed", 5: "added"}


def test_snapshot_diff_null_tagging_is_injective(spark):
    """(NULL, 'x') vs ('x', NULL) must CHANGE — a coalesce-style
    fingerprint would call them equal; ('a','') vs ('a', NULL) likewise."""
    from ocr_output_evaluation_spark.operators.diff import snapshot_diff

    a = _mk(spark, [(1, None, "x"), (2, "a", "")])
    b = _mk(spark, [(1, "x", None), (2, "a", None)])
    got = {
        r.doc_id: r.status
        for r in snapshot_diff(a, b, "doc_id", ["text", "lang"]).collect()
    }
    assert got == {1: "changed", 2: "changed"}
    # and identical NULL patterns are unchanged
    c = _mk(spark, [(3, None, None)])
    d = _mk(spark, [(3, None, None)])
    assert snapshot_diff(c, d, "doc_id", ["text", "lang"]).collect()[0].status == "unchanged"


def test_snapshot_diff_plan_is_one_join_no_extra_shuffle(spark):
    """The diff must be ONE full-outer join: each side exchanges once on
    the key and nothing else shuffles (no distinct, no window)."""
    from ocr_output_evaluation_spark.operators.diff import snapshot_diff
    from tests.test_plans import n_nodes, n_shuffles, plan_of

    a = _mk(spark, [(1, "x", "en")])
    b = _mk(spark, [(1, "x", "en")])
    plan = plan_of(snapshot_diff(a, b, "doc_id", ["text", "lang"]))
    assert n_nodes(plan, "SortMergeJoin FullOuter") + plan.count("FullOuter") >= 1
    assert n_shuffles(plan) <= 2  # one per side, nothing downstream
