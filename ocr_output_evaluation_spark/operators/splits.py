"""Deterministic, leakage-safe train/val/test splitting.

The training-data-pipeline primitive every corpus build needs before
export: assign each document to a named split with (a) NO RNG — the
assignment is a pure function of a key, so re-runs, resumes, and
incremental appends land every document in the same split forever — and
(b) group-atomic assignment: keyed on a GROUP column (dedup-cluster id,
registered domain, source), every member of a group lands in the same
split, the standard defense against near-duplicate train/test leakage
(the reason GPT-3/The-Pile/RefinedWeb split on url/cluster, not on row).

Reference parity: the reference stratifies pages into named buckets by a
deterministic value rule (/root/reference/analyze_buckets.py:60-82,
select_challenging_images.py:96-133); this operator is that bucketing
re-keyed on a hash so the buckets are proportional rather than
value-banded.

Spark-first shape: the assignment is one codegen expression over the
scan — md5 of the (salted) key, first 4 hex chars as an integer, mod
100, range-compare against the cumulative fraction table. Zero shuffle,
zero UDF, no per-lang window; at 10^12 rows the split column costs the
same as any other projected expression. md5 (not xxhash64) so DuckDB
replays the identical assignment: ``('0x' || substr(md5(k), 1, 4))::BIGINT
% 100`` is bit-identical to ``F.conv(F.substring(F.md5(k), 1, 4), 16,
10) % 100``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# (name, percent) in assignment order; percents must sum to 100.
DEFAULT_FRACTIONS: tuple[tuple[str, int], ...] = (
    ("train", 80),
    ("val", 10),
    ("test", 10),
)


def split_bucket(key: Column, salt: str = "split-v1") -> Column:
    """Deterministic bucket in [0, 100) from a key column.

    Salted so independent splits of the same corpus (e.g. a re-split at a
    new version) decorrelate; 4 hex chars = 65536 raw buckets folded to
    100, so the per-bucket bias from the fold is < 0.04% of a bucket.
    """
    h = F.md5(F.concat(F.lit(salt), F.lit(":"), key.cast("string")))
    return (F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % 100).cast("int")


def assign_split(
    df: DataFrame,
    key: Column | str,
    fractions: tuple[tuple[str, int], ...] = DEFAULT_FRACTIONS,
    salt: str = "split-v1",
    out_col: str = "split",
) -> DataFrame:
    """Add ``out_col`` naming the split each row belongs to.

    ``key`` is the ATOMICITY unit: pass the row key for independent rows,
    or a group key (cluster id / domain / source) to pin whole groups to
    one split. Assignment: bucket(key) in [0,100) compared against the
    cumulative percent ranges of ``fractions`` in order.
    """
    pcts = [p for _, p in fractions]
    if sum(pcts) != 100 or any(p <= 0 for p in pcts):
        raise ValueError(f"fractions must be positive and sum to 100: {fractions}")
    key = F.col(key) if isinstance(key, str) else key
    b = split_bucket(key, salt)
    expr = None
    lo = 0
    for name, pct in fractions:
        hi = lo + pct
        cond = b < hi
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo = hi
    return df.withColumn(out_col, expr)


def oracle_split_case(
    key_sql: str,
    fractions: tuple[tuple[str, int], ...] = DEFAULT_FRACTIONS,
    salt: str = "split-v1",
) -> str:
    """The DuckDB replay of :func:`assign_split`'s expression."""
    b = (
        f"(('0x' || substr(md5('{salt}:' || CAST({key_sql} AS VARCHAR)), 1, 4))"
        f"::BIGINT % 100)"
    )
    arms = []
    lo = 0
    for name, pct in fractions:
        lo += pct
        arms.append(f"WHEN {b} < {lo} THEN '{name}'")
    return "CASE " + " ".join(arms) + " END"
