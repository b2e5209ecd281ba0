"""X52 — corpus snapshot diff: classify every document across two corpus
snapshots as added / removed / changed / unchanged — the change-data-
capture primitive of incremental crawl processing (Common-Crawl-style
monthly snapshots: the delta, not the full corpus, feeds incremental
dedup / re-extraction / training refreshes).
Reference analog: none — rebuild-only operator (the reference's
resume-if-output-exists skip, analyze_confidence.py:75-80, is the
degenerate per-volume form of the same idea).

Design: ONE full-outer join on the snapshot key plus a content
fingerprint comparison — no second pass, no distinct, no window:

    added     key only in B
    removed   key only in A
    changed   key in both, fingerprint differs
    unchanged key in both, fingerprint equal

The fingerprint is md5 of the null-tagged concat of the compared columns
(oracle-replayable; production swaps xxhash64 via the established
md5-twin pattern, operators/decontaminate.py). NULL columns are tagged,
not coalesced away, so (NULL, "x") never collides with ("x", NULL) —
the separator + per-column null marker make the encoding injective for
separator-free values.

Scale design: the join shuffles each snapshot ONCE on the key — the
minimum any content diff can do. At warehouse scale both snapshots come
from the bucketed sink (S10, sources/io.py): bucketed-by-key tables
co-locate, and the full-outer join plans with ZERO exchanges (the
bucketed-join plan pin in tests/test_pipeline.py). The report output is
a per-status count frame (4 rows) + the diff frame itself for
downstream incremental passes; only changed/added rows (typically a few
percent of a monthly crawl) flow on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def content_fingerprint(cols: list[str]) -> Column:
    """md5 over a null-tagged, separator-joined encoding of ``cols``.
    DuckDB twin: md5(concat(CASE WHEN c IS NULL THEN chr(1) ELSE
    chr(2) || CAST(c AS VARCHAR) END, chr(31), ...))."""
    parts = []
    for i, c in enumerate(cols):
        if i:
            parts.append(F.lit("\x1f"))
        col = F.col(c).cast("string")
        parts.append(
            F.when(col.isNull(), F.lit("\x01")).otherwise(
                F.concat(F.lit("\x02"), col)
            )
        )
    return F.md5(F.concat(*parts))


def snapshot_diff(
    a: DataFrame,
    b: DataFrame,
    key: str,
    compare_cols: list[str],
) -> DataFrame:
    """-> (key, status, fp_a, fp_b): one row per key present in either
    snapshot, status in {added, removed, changed, unchanged}. ``a`` is
    the old snapshot, ``b`` the new one. Keys must be unique per
    snapshot (a corpus primary key); duplicate keys would cross-join at
    the key, as in any CDC diff."""
    fa = a.select(
        F.col(key), content_fingerprint(compare_cols).alias("fp_a")
    )
    fb = b.select(
        F.col(key), content_fingerprint(compare_cols).alias("fp_b")
    )
    j = fa.join(fb, key, "full_outer")
    status = (
        F.when(F.col("fp_a").isNull(), F.lit("added"))
        .when(F.col("fp_b").isNull(), F.lit("removed"))
        .when(F.col("fp_a") == F.col("fp_b"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(key, status.alias("status"), "fp_a", "fp_b")
