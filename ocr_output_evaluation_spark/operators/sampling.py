"""Deterministic sampling operators (SURVEY.md §2.9 R1-R3, §2.5 W2).

The reference samples with pandas ``.sample(n, random_state=42)``
(/root/reference/select_challenging_images.py:26,79-83,134-136) — exact-n and
reproducible single-process, but not distributable. The rebuild's replacement
is hash-order sampling: ORDER BY xxhash64(key, seed) LIMIT n. Exact-n,
reproducible across cluster sizes and partitionings, and executed as
TakeOrderedAndProject (per-partition heap, no full sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def deterministic_sample(df: DataFrame, key_col: str, n: int, seed: int = 42) -> DataFrame:
    """R1/R3: global exact-n seeded sample."""
    return (
        df.withColumn("_hk", F.xxhash64(F.col(key_col), F.lit(seed)))
        .orderBy("_hk")
        .limit(n)
        .drop("_hk")
    )


def per_group_sample(
    df: DataFrame, group_cols: list[str], key_col: str, n: int, seed: int = 42
) -> DataFrame:
    """R2/W2: <= n rows per group, hash-ordered (the reference's <=10 pages
    per volume, /root/reference/select_challenging_images.py:134-136)."""
    w = W.partitionBy(*group_cols).orderBy(F.xxhash64(F.col(key_col), F.lit(seed)))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )


def select_challenging_docs(
    df: DataFrame,
    group_col: str,
    key_col: str,
    score_col: str,
    lo: float,
    hi: float,
    relaxed_lo: float,
    relaxed_hi: float,
    min_band_rows: int,
    n_groups: int,
    per_group: int,
    n_final: int,
    hash_col=None,
) -> DataFrame:
    """The reference's challenging-page selection flow composed end-to-end
    (/root/reference/select_challenging_images.py): band-filter candidates by
    score with a relax fallback (:112-118), seeded sample of n_groups groups
    (:79-83), <= per_group docs per sampled group (:134-136), final subsample
    to n_final (:183-186) — every stage hash-deterministic, so the manifest is
    identical across cluster sizes and re-runs.

    ``hash_col``: callable(Column)->Column giving the sampling hash (default
    xxhash64; pass an md5-based one for DuckDB-oracle-checkable runs)."""
    hk = hash_col or (lambda c: F.xxhash64(c, F.lit(42)))
    banded = band_filter_with_fallback(
        df, score_col, lo, hi, relaxed_lo, relaxed_hi, min_band_rows
    )
    groups = (
        banded.select(group_col).distinct()
        .orderBy(hk(F.col(group_col)).asc(), F.col(group_col).asc())
        .limit(n_groups)
    )
    in_groups = banded.join(F.broadcast(groups), group_col, "inner")
    w = W.partitionBy(group_col).orderBy(hk(F.col(key_col)).asc(), F.col(key_col).asc())
    per = (
        in_groups.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= per_group)
        .drop("_rn")
    )
    return per.orderBy(hk(F.col(key_col)).asc(), F.col(key_col).asc()).limit(n_final)


def weighted_sample_es(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    salt: str = "es42",
    out_col: str = "es_key",
) -> DataFrame:
    """X70: deterministic weight-proportional sampling WITHOUT replacement —
    Efraimidis & Spirakis 2006 ("Weighted random sampling with a
    reservoir"), in the equivalent exponential-clocks form: each row draws
    e = -ln(u)/w with u a uniform pure function of the key, and the k
    SMALLEST clocks are the sample (min of exponentials with rate w picks
    proportionally to w, without replacement). u is the proven
    deterministic-uniform recipe (md5-hash32 + 0.5)/2^32 — no RNG, so the
    sample is reproducible across cluster sizes and replayable by the
    DuckDB oracle (ln parity on operand-identical doubles).

    Rows with weight <= 0 are excluded (E-S is defined for w > 0).
    Scale shape: the clock is one in-row codegen expression and the
    selection is ORDER BY + LIMIT = TakeOrderedAndProject — a size-k heap
    per partition and a driver merge, never a global sort. Reference
    analog: none — rebuild-only operator (SURVEY §2.13)."""
    key = F.col(key_col)
    h32 = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", key.cast("string"), F.lit(salt))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    u = (h32.cast("double") + F.lit(0.5)) / F.lit(4294967296.0)
    clock = -F.log(u) / F.col(weight_col).cast("double")
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn(out_col, clock)
        .orderBy(F.col(out_col).asc(), key.asc())
        .limit(k)
    )


def band_filter_with_fallback(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    relaxed_lo: float,
    relaxed_hi: float,
    min_rows: int,
) -> DataFrame:
    """P4: band filter with relax-to-wider-band fallback when too few rows
    match (/root/reference/select_challenging_images.py:112-118). The count
    is one cheap aggregate job; the chosen band is then a plain pushed-down
    filter."""
    c = F.col(col)
    n = df.filter(c.between(lo, hi)).count()
    if n >= min_rows:
        return df.filter(c.between(lo, hi))
    return df.filter(c.between(relaxed_lo, relaxed_hi))
