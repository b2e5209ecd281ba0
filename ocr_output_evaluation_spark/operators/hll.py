"""HyperLogLog distinct-count sketch (X46) — mergeable cardinality
estimation for the counts a 100 TB corpus can't afford exactly (distinct
n-grams / URLs / tokens per group).

Reference-repo analog: none (training-data layer, SURVEY §2.13). Published
algorithm: Flajolet et al. 2007 (HyperLogLog, AofA); the m=2^b register /
harmonic-mean / small-range-linear-counting form is the standard one.

Why this beats exact countDistinct at scale: exact distinct shuffles every
DISTINCT KEY (bytes ~ cardinality); the HLL register frame is m SMALL INTS
per group — a config, not the data — and the groupBy(group, bucket) max
agg is map-side-combined, so the shuffle carries at most groups×m rows of
(int, tinyint) no matter how many keys the corpus holds. Registers are
MERGEABLE (elementwise max), so per-partition / per-day sketches union
into global ones without touching raw data again — the property that makes
the sketch a storable artifact, not just a query.

Determinism / oracle story (the reason this sketch CAN sit behind the
strict value-identity gate, unlike approx_count_distinct):
- bucket and rank come from md5 (bucket = 60-bit md5 mod m; rank rho = 1 +
  leading zero BITS of an independent 60-bit md5, read off the HEX STRING:
  4 per leading '0' char + a 16-way map on the first nonzero char) — both
  engines replay them exactly. Production twin: xxhash64 (the established
  md5-twin pattern, operators/decontaminate.py).
- the harmonic denominator sum(2^-rho) is kept EXACT and order-independent
  by integer-scaling: each register contributes the BIGINT 2^(62-rho)
  (rho<=61 so the term fits a long), summed as DECIMAL(38,0) (the 256-
  register sum can reach 2^70, past BIGINT). Both engines do exact decimal
  arithmetic; only the FINAL estimate divides as double, with the operand
  order written identically on both sides (IEEE ops are bit-specified;
  the lone libm call, ln in the linear-counting branch, differs at most
  1 ulp — 8+ orders below the 6 dp report rounding).
- duplicates can't perturb anything (max is idempotent), so the input
  never needs a distinct pass — HLL reads the raw exploded stream.

This uses independent bucket/rank hashes (not the split-one-hash textbook
layout) — simpler to replay, same guarantees; the 2^32 large-range
correction is irrelevant at 60 hash bits and intentionally omitted.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

DEFAULT_B = 8  # m = 256 registers -> ~1.04/sqrt(256) = 6.5% typical error

# element_at lookup for 2^(62-rho), rho = 1..61 (F.shiftleft takes only
# int literals — CLAUDE.md).
_TERM = [1 << (62 - r) for r in range(1, 62)]


def hll_bucket(key: Column, m: int) -> Column:
    """Register index 0..m-1: 60 positive md5 bits mod m. DuckDB twin:
    ('0x' || substr(md5(key), 1, 15))::BIGINT % m."""
    h = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")
    return F.pmod(h, F.lit(m))


def hll_rho(key: Column) -> Column:
    """Rank rho = 1 + leading zero bits of an independent 60-bit md5
    ('r:' || key), read from the hex string: 4 bits per leading '0' char
    plus 3/2/1/0 for a first nonzero char of 1 / 2-3 / 4-7 / 8-f. All-zero
    hash (never at these cardinalities, but total) -> 61."""
    hx = F.substring(F.md5(F.concat(F.lit("r:"), key)), 1, 15)
    nz = F.regexp_replace(hx, "^0+", "")
    first = F.substring(nz, 1, 1)
    clz4 = (
        F.when(first == "1", 3)
        .when(first.isin("2", "3"), 2)
        .when(first.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    return F.when(F.length(nz) == 0, F.lit(61)).otherwise(
        (F.lit(15) - F.length(nz)) * 4 + clz4 + 1
    )


def hll_registers(
    df: DataFrame, key_col: str, group_cols: list[str], b: int = DEFAULT_B
) -> DataFrame:
    """-> (group_cols..., _bucket, _rho): the sketch, <= 2^b rows per
    group whatever the input cardinality. ONE map-side-combined max agg;
    duplicates in ``df`` are free (max is idempotent). Mergeable: union
    two register frames and re-apply this groupBy-max (hll_merge)."""
    m = 1 << b
    key = F.col(key_col)
    return (
        df.select(
            *group_cols,
            hll_bucket(key, m).alias("_bucket"),
            hll_rho(key).alias("_rho"),
        )
        .groupBy(*group_cols, "_bucket")
        .agg(F.max("_rho").alias("_rho"))
    )


def hll_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union of the sets two register frames summarize — elementwise max.
    The distributive property that lets per-shard sketches roll up without
    re-reading data."""
    cols = [c for c in a.columns if c != "_rho"]
    return a.unionByName(b).groupBy(*cols).agg(F.max("_rho").alias("_rho"))


def hll_estimate(regs: DataFrame, group_cols: list[str], b: int = DEFAULT_B) -> DataFrame:
    """Register frame -> (group_cols..., n_hll DOUBLE). Exact-decimal
    harmonic denominator (see module docstring), Flajolet alpha_m bias
    factor, linear-counting small-range correction (raw <= 2.5m with empty
    registers -> m*ln(m/V))."""
    m = 1 << b
    two62 = F.lit(1 << 62).cast("decimal(38,0)")
    agg = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("_nreg"),
        F.sum(
            F.element_at(F.lit(_TERM), F.col("_rho").cast("int")).cast(
                "decimal(38,0)"
            )
        ).alias("_s_hit"),
    )
    s = (
        F.col("_s_hit")
        + (F.lit(m) - F.col("_nreg")).cast("decimal(38,0)") * two62
    ).cast("double")
    # operand order mirrored verbatim in the oracle SQL — IEEE ops are
    # bit-specified, so identical order => identical doubles
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(m)))
    raw = alpha * F.lit(float(m)) * F.lit(float(m)) * F.lit(float(1 << 62)) / s
    v = F.lit(m) - F.col("_nreg")
    est = F.when(
        (raw <= F.lit(2.5) * F.lit(float(m))) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
    ).otherwise(raw)
    return agg.select(
        *group_cols,
        F.col("_nreg").cast("long").alias("n_buckets_hit"),
        est.alias("n_hll"),
    )


def _sql_rho(key_sql: str) -> str:
    """DuckDB twin of hll_rho over the given key expression."""
    hx = f"substr(md5('r:' || {key_sql}), 1, 15)"
    return (
        f"CASE WHEN length(ltrim({hx}, '0')) = 0 THEN 61 "
        f"ELSE (15 - length(ltrim({hx}, '0'))) * 4 "
        f"+ CASE substr(ltrim({hx}, '0'), 1, 1) "
        "WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2 "
        "WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1 WHEN '7' THEN 1 "
        "ELSE 0 END + 1 END"
    )


def _sql_bucket(key_sql: str, m: int) -> str:
    """DuckDB twin of hll_bucket (hash is positive, plain % == pmod)."""
    return f"('0x' || substr(md5({key_sql}), 1, 15))::BIGINT % {m}"
