"""Driver-contract query registry: every operator from SURVEY.md §2 as a
(spark, sf_dir) -> DataFrame callable plus (where SQL-expressible) an
equivalent DuckDB oracle SQL string.

Design rules (the correctness gate hashes values after sorting columns by
name, order-insensitively):
- every computed column is aliased identically in Spark and SQL;
- every float column is rounded the same way on both sides (sums of money to
  2, ratios/means/percentiles to 6) so partial-aggregation order cannot flip
  the hash;
- every LIMIT has a total deterministic ORDER BY (explicit tiebreak keys);
- sampling uses md5(cast(key as string)) hash-order — computable identically
  by both engines (xxhash64 is Spark-only, so the md5 twin is the
  oracle-checkable deterministic-sampling path; operators/sampling.py keeps
  the xxhash64 version for production use).

Reference parity notes cite /root/reference files; see SURVEY.md §2 ids
(A1..A17, P1..P7, J1..J3, W1/W2, O1..O4, U1..U3, F1..F17, R1..R3) on each
query.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from .functions.text import (
    BPE_ISH_PATTERN,
    STOPWORDS,
    bpe_ish_token_count,
    lang_id_scores,
    quality_score,
    whitespace_token_count,
)
from .functions.valid import valid
from .operators.dedup import (
    minhash_lsh_pairs,
    minhash_lsh_pairs_md5,
    ngram_jaccard_pairs,
    simhash_near_dup_pairs,
)
from .operators.histogram import histogram
from .operators.salted import salted_group_stats
from .operators.similarity import cosine_expr, lsh_top_k

_INF = float("inf")
_NAN = float("nan")


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _r(c, n=6):
    return F.round(c, n)


def _spread(df: DataFrame) -> DataFrame:
    """Hash-spread a small or unsplittable scan across all cores BEFORE
    CPU-heavy per-row expansion (n-gram transforms, explodes). A single
    parquet row group is one task however many cores exist — measured 20 s
    single-core vs ~2 s spread at sf0.1 for the n-gram reports. The
    explicit partition count pins the exchange against AQE coalescing
    (which would fold a KB-sized text shuffle back to one task); hash on
    doc_id keeps the spread deterministic. At cluster scale real inputs
    arrive in thousands of row groups and this exchange is skipped by
    construction — it guards exactly the small-file/single-row-group case.
    Results are partitioning-independent (all consumers aggregate)."""
    return df.repartition(
        df.sparkSession.sparkContext.defaultParallelism, F.col("doc_id")
    )


# ---------------------------------------------------------------------------
# TPC-H-ish relational core (scan → filter → join → agg → sort/limit)
# ---------------------------------------------------------------------------
def q1_pricing_summary(spark, sf):
    """A1/A3/A5 + P4: the classic grouped pricing rollup (partial+final hash
    agg; filter pushed to the parquet scan)."""
    l = t(spark, sf, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            _r(F.sum("l_quantity"), 2).alias("sum_qty"),
            _r(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            _r(F.sum(disc), 2).alias("sum_disc_price"),
            _r(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            _r(F.avg("l_quantity"), 6).alias("avg_qty"),
            _r(F.avg("l_extendedprice"), 6).alias("avg_price"),
            _r(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


ORACLE_Q1 = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                        AS sum_qty,
       round(sum(l_extendedprice), 2)                                   AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
       round(avg(l_quantity), 6)                                        AS avg_qty,
       round(avg(l_extendedprice), 6)                                   AS avg_price,
       round(avg(l_discount), 6)                                        AS avg_disc,
       count(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark, sf):
    """J2 + O2: 3-way equi-join, grouped revenue, global top-10 with
    deterministic tiebreak (TakeOrderedAndProject, no full sort)."""
    c = t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf, "orders").filter(F.col("o_orderdate") < "1997-03-15")
    l = t(spark, sf, "lineitem").filter(F.col("l_shipdate") > "1997-03-15")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_r(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


ORACLE_Q3 = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1997-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q5_local_supplier_volume(spark, sf):
    """J1/J2: star join with two broadcast dims (region, nation) — Catalyst
    plans broadcast hash joins; only the fact-fact join shuffles."""
    r = t(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    n = t(spark, sf, "nation")
    c = t(spark, sf, "customer")
    s = t(spark, sf, "supplier")
    o = t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    l = t(spark, sf, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(_r(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


ORACLE_Q5 = """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
"""


def q6_forecast_revenue(spark, sf):
    """P4 range/band filters + single global agg — every predicate pushed to
    the scan."""
    l = t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    )
    return l.agg(_r(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))


ORACLE_Q6 = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


# ---------------------------------------------------------------------------
# Grouped statistics (the reference's stats_calculator layer)
# ---------------------------------------------------------------------------
def group_moment_stats(spark, sf):
    """A1 + A2: per-lang moment stats + exact percentiles over documents
    (pandas-parity: stddev ddof=1, linear-interpolation quantiles —
    /root/reference/stats_calculator.py:73-86)."""
    v = valid("n_chars")
    return (
        t(spark, sf, "documents")
        .groupBy("lang")
        .agg(
            F.count(v).alias("n"),
            _r(F.mean(v)).alias("mean_nc"),
            _r(F.median(v)).alias("median_nc"),
            _r(F.stddev_samp(v)).alias("std_nc"),
            F.min(v).alias("min_nc"),
            F.max(v).alias("max_nc"),
            _r(F.percentile(v, F.lit(0.10))).alias("p10_nc"),
            _r(F.percentile(v, F.lit(0.25))).alias("p25_nc"),
            _r(F.percentile(v, F.lit(0.75))).alias("p75_nc"),
            _r(F.percentile(v, F.lit(0.90))).alias("p90_nc"),
            _r(F.percentile(v, F.lit(0.95))).alias("p95_nc"),
        )
    )


ORACLE_GROUP_MOMENT_STATS = """
SELECT lang,
       count(nc)                            AS n,
       round(avg(nc), 6)                    AS mean_nc,
       round(median(nc), 6)                 AS median_nc,
       round(stddev_samp(nc), 6)            AS std_nc,
       min(nc)                              AS min_nc,
       max(nc)                              AS max_nc,
       round(quantile_cont(nc, 0.10), 6)    AS p10_nc,
       round(quantile_cont(nc, 0.25), 6)    AS p25_nc,
       round(quantile_cont(nc, 0.75), 6)    AS p75_nc,
       round(quantile_cont(nc, 0.90), 6)    AS p90_nc,
       round(quantile_cont(nc, 0.95), 6)    AS p95_nc
FROM (SELECT lang, CAST(n_chars AS DOUBLE) AS nc FROM documents)
GROUP BY lang
"""


def threshold_buckets(spark, sf):
    """A3: threshold bucket counts + percentages per event_type
    (/root/reference/stats_calculator.py:89-98)."""
    v = valid("value")
    n = F.count(v)
    n_hi = F.count(F.when(v >= 100.0, 1))
    n_med = F.count(F.when((v >= 10.0) & (v < 100.0), 1))
    n_lo = F.count(F.when(v < 10.0, 1))
    pct = lambda x: _r(x.cast("double") / n.cast("double") * 100.0)  # noqa: E731
    return (
        t(spark, sf, "events")
        .groupBy("event_type")
        .agg(
            n.alias("n"),
            n_hi.alias("n_high"),
            n_med.alias("n_med"),
            n_lo.alias("n_low"),
            pct(n_hi).alias("pct_high"),
            pct(n_med).alias("pct_med"),
            pct(n_lo).alias("pct_low"),
        )
    )


ORACLE_THRESHOLD_BUCKETS = """
SELECT event_type,
       count(value)                                                          AS n,
       count(CASE WHEN value >= 100.0 THEN 1 END)                            AS n_high,
       count(CASE WHEN value >= 10.0 AND value < 100.0 THEN 1 END)           AS n_med,
       count(CASE WHEN value < 10.0 THEN 1 END)                              AS n_low,
       round(count(CASE WHEN value >= 100.0 THEN 1 END) * 1.0 / count(value) * 100.0, 6) AS pct_high,
       round(count(CASE WHEN value >= 10.0 AND value < 100.0 THEN 1 END) * 1.0 / count(value) * 100.0, 6) AS pct_med,
       round(count(CASE WHEN value < 10.0 THEN 1 END) * 1.0 / count(value) * 100.0, 6)   AS pct_low
FROM events
GROUP BY event_type
"""


def validity_classes(spark, sf):
    """A7 + P1: NaN-class vs inf-class counters with the reference's exact
    semantics (/root/reference/perplexity_scorer.py:230-243) — NaN and inf
    injected deterministically, stats on the valid() subset only."""
    e = t(spark, sf, "events")
    raw = (
        F.when(F.col("event_id") % 97 == 0, F.lit(_NAN))
        .when(F.col("event_id") % 101 == 0, F.lit(_INF))
        .otherwise(F.col("value"))
    )
    e = e.withColumn("v2", raw)
    c = F.col("v2")
    v = valid(c)
    n_all = F.count(F.lit(1))
    n_nan = F.count(F.when(F.isnan(c), 1))
    n_inf = F.count(F.when(~F.isnan(c) & (F.abs(c) == _INF), 1))
    n_valid = F.count(v)
    return e.groupBy("event_type").agg(
        n_all.alias("n_all"),
        n_nan.alias("n_nan"),
        n_inf.alias("n_inf"),
        n_valid.alias("n_valid"),
        _r(n_valid.cast("double") / n_all.cast("double") * 100.0).alias("pct_valid"),
        _r(F.avg(v)).alias("mean_valid"),
    )


ORACLE_VALIDITY_CLASSES = """
WITH e AS (
  SELECT event_type,
         CASE WHEN event_id % 97 = 0 THEN 'nan'::DOUBLE
              WHEN event_id % 101 = 0 THEN 'inf'::DOUBLE
              ELSE value END AS v2
  FROM events
)
SELECT event_type,
       count(*)                                           AS n_all,
       count(CASE WHEN isnan(v2) THEN 1 END)              AS n_nan,
       count(CASE WHEN NOT isnan(v2) AND isinf(v2) THEN 1 END) AS n_inf,
       count(CASE WHEN NOT isnan(v2) AND NOT isinf(v2) THEN 1 END) AS n_valid,
       round(count(CASE WHEN NOT isnan(v2) AND NOT isinf(v2) THEN 1 END) * 1.0 / count(*) * 100.0, 6) AS pct_valid,
       round(avg(CASE WHEN NOT isnan(v2) AND NOT isinf(v2) THEN v2 END), 6)  AS mean_valid
FROM e
GROUP BY event_type
"""


def top_langs_per_source(spark, sf):
    """A6/W1: top-3 langs per source pivoted into rank columns with the
    deterministic tiebreak (count desc, lang asc —
    /root/reference/stats_calculator.py:137-148)."""
    counts = (
        t(spark, sf, "documents")
        .groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = W.partitionBy("source").orderBy(F.col("cnt").desc(), F.col("lang").asc())
    ranked = counts.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 3)
    aggs = []
    for i in (1, 2, 3):
        aggs.append(F.max(F.when(F.col("rk") == i, F.col("lang"))).alias(f"top_lang_{i}"))
        aggs.append(
            F.max(F.when(F.col("rk") == i, F.col("cnt"))).alias(f"top_lang_{i}_count")
        )
    return ranked.groupBy("source").agg(*aggs)


ORACLE_TOP_LANGS = """
WITH c AS (SELECT source, lang, count(*) AS cnt FROM documents GROUP BY 1, 2),
r AS (SELECT source, lang, cnt,
             row_number() OVER (PARTITION BY source ORDER BY cnt DESC, lang ASC) AS rk
      FROM c)
SELECT source,
       max(CASE WHEN rk = 1 THEN lang END)                 AS top_lang_1,
       CAST(max(CASE WHEN rk = 1 THEN cnt END) AS BIGINT)  AS top_lang_1_count,
       max(CASE WHEN rk = 2 THEN lang END)                 AS top_lang_2,
       CAST(max(CASE WHEN rk = 2 THEN cnt END) AS BIGINT)  AS top_lang_2_count,
       max(CASE WHEN rk = 3 THEN lang END)                 AS top_lang_3,
       CAST(max(CASE WHEN rk = 3 THEN cnt END) AS BIGINT)  AS top_lang_3_count
FROM r WHERE rk <= 3
GROUP BY source
"""


def value_histogram(spark, sf):
    """A8: np.histogram-style 20-bin histogram of events.value over [0, 500]
    (/root/reference/stats_calculator.py:303-327; last bin closed)."""
    return histogram(t(spark, sf, "events"), "value", nbins=20, lo=0.0, hi=500.0)


ORACLE_HISTOGRAM = """
WITH b AS (
  SELECT least(CAST(floor((value - 0.0) / 25.0) AS INT), 19) AS bin
  FROM events
  WHERE value IS NOT NULL AND NOT isnan(value) AND NOT isinf(value)
    AND value >= 0.0 AND value <= 500.0
)
SELECT bin,
       round(0.0 + bin * 25.0, 9)       AS bin_start,
       round(0.0 + (bin + 1) * 25.0, 9) AS bin_end,
       count(*)                          AS count
FROM b GROUP BY bin
"""


def value_counts_lang(spark, sf):
    """A14: frequency distribution with pct-of-total via a window over the
    aggregated frame (/root/reference/metadata_loader.py:160-187)."""
    counts = t(spark, sf, "documents").groupBy("lang").agg(F.count(F.lit(1)).alias("cnt"))
    return counts.select(
        "lang",
        "cnt",
        F.round(F.col("cnt") / F.sum("cnt").over(W.partitionBy()) * 100.0, 6).alias("pct"),
    )


ORACLE_VALUE_COUNTS = """
WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang)
SELECT lang, cnt, round(cnt / sum(cnt) OVER () * 100.0, 6) AS pct FROM c
"""


def top_docs_by_len(spark, sf):
    """O1/O2/O4: ORDER BY ... LIMIT with explicit tiebreak —
    TakeOrderedAndProject (per-partition heap, no global sort)."""
    return (
        t(spark, sf, "documents")
        .select("doc_id", "lang", "n_chars")
        .orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
        .limit(10)
    )


ORACLE_TOP_DOCS = """
SELECT doc_id, lang, n_chars FROM documents ORDER BY n_chars DESC, doc_id LIMIT 10
"""


def corr_trend(spark, sf):
    """A15/A16: Pearson r + least-squares slope/intercept as closed-form
    aggregates (/root/reference/analyze_buckets.py:198,209-214 — one pass,
    no np.polyfit iteration)."""
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    return t(spark, sf, "lineitem").agg(
        _r(F.corr(x, y)).alias("pearson_r"),
        _r(F.regr_slope(y, x)).alias("slope"),
        _r(F.regr_intercept(y, x)).alias("intercept"),
        F.regr_count(y, x).alias("n_points"),
    )


ORACLE_CORR_TREND = """
SELECT round(corr(l_quantity, l_extendedprice), 6)           AS pearson_r,
       round(regr_slope(l_extendedprice, l_quantity), 6)     AS slope,
       round(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept,
       CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n_points
FROM lineitem
"""


def event_dow_matrix(spark, sf):
    """A13: the heatmap matrix (event_type × day-of-week mean value) via
    conditional aggregation (/root/reference/visualize.py:728-750)."""
    e = t(spark, sf, "events")
    dow = F.dayofweek("ts") - 1  # 0=Sunday, matches date_part('dow', ...)
    aggs = [
        _r(F.avg(F.when(dow == d, F.col("value")))).alias(f"d{d}") for d in range(7)
    ]
    return e.groupBy("event_type").agg(*aggs, F.count(F.lit(1)).alias("n"))


ORACLE_DOW_MATRIX = """
SELECT event_type,
       round(avg(CASE WHEN date_part('dow', ts) = 0 THEN value END), 6) AS d0,
       round(avg(CASE WHEN date_part('dow', ts) = 1 THEN value END), 6) AS d1,
       round(avg(CASE WHEN date_part('dow', ts) = 2 THEN value END), 6) AS d2,
       round(avg(CASE WHEN date_part('dow', ts) = 3 THEN value END), 6) AS d3,
       round(avg(CASE WHEN date_part('dow', ts) = 4 THEN value END), 6) AS d4,
       round(avg(CASE WHEN date_part('dow', ts) = 5 THEN value END), 6) AS d5,
       round(avg(CASE WHEN date_part('dow', ts) = 6 THEN value END), 6) AS d6,
       count(*) AS n
FROM events
GROUP BY event_type
"""


def quality_buckets(spark, sf):
    """F7: CASE-chain bucket assignment — native when-chain replacing the
    reference's row-apply UDF (/root/reference/analyze_buckets.py:56-80)."""
    d = t(spark, sf, "documents")
    bucket = (
        F.when((F.col("n_chars") >= 150) & F.col("lang").isin("en", "de"), "long_euro")
        .when(F.col("n_chars") >= 150, "long_other")
        .when(F.col("n_chars") >= 80, "medium")
        .otherwise("short")
    )
    return (
        d.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"), _r(F.avg("n_chars")).alias("avg_chars"))
    )


ORACLE_QUALITY_BUCKETS = """
SELECT CASE WHEN n_chars >= 150 AND lang IN ('en', 'de') THEN 'long_euro'
            WHEN n_chars >= 150 THEN 'long_other'
            WHEN n_chars >= 80 THEN 'medium'
            ELSE 'short' END AS bucket,
       count(*) AS n,
       round(avg(n_chars), 6) AS avg_chars
FROM documents
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Deterministic sampling (R1-R3 / W2) — md5 twin of the xxhash64 operators
# ---------------------------------------------------------------------------
def per_group_sample(spark, sf):
    """W2/R2: ≤2 docs per lang, hash-ordered (deterministic replacement for
    pandas .sample — /root/reference/select_challenging_images.py:134-136)."""
    d = t(spark, sf, "documents")
    hk = F.md5(F.col("doc_id").cast("string"))
    w = W.partitionBy("lang").orderBy(hk.asc(), F.col("doc_id").asc())
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("lang", "doc_id")
    )


ORACLE_PER_GROUP_SAMPLE = """
WITH r AS (
  SELECT lang, doc_id,
         row_number() OVER (PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents
)
SELECT lang, doc_id FROM r WHERE rn <= 2
"""


def deterministic_sample_50(spark, sf):
    """R1/R3: global exact-n seeded sample via hash-order-limit
    (/root/reference/select_challenging_images.py:79-83)."""
    d = t(spark, sf, "documents")
    hk = F.md5(F.col("doc_id").cast("string"))
    return (
        d.orderBy(hk.asc(), F.col("doc_id").asc())
        .select("doc_id", "lang", "source")
        .limit(50)
    )


ORACLE_SAMPLE_50 = """
SELECT doc_id, lang, source FROM documents
ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT 50
"""


# ---------------------------------------------------------------------------
# Set ops / union layer (U1-U3)
# ---------------------------------------------------------------------------
def union_distinct_keys(spark, sf):
    """U1/U2/U3: union of two heterogeneous projections + distinct
    (/root/reference/metadata_loader.py:143)."""
    a = t(spark, sf, "documents").select(
        F.col("lang").alias("k"), F.lit("doc_lang").alias("src")
    )
    b = t(spark, sf, "events").select(
        F.col("event_type").alias("k"), F.lit("event_type").alias("src")
    )
    return a.unionByName(b).dropDuplicates(["k", "src"])


ORACLE_UNION_DISTINCT = """
SELECT DISTINCT lang AS k, 'doc_lang' AS src FROM documents
UNION
SELECT DISTINCT event_type AS k, 'event_type' AS src FROM events
"""


# ---------------------------------------------------------------------------
# Date / JSON / window functions (rebuild extensions, SURVEY.md §2.8 note)
# ---------------------------------------------------------------------------
def events_hourly(spark, sf):
    """date_trunc event-time rollup (the warc_ts-style partition column
    analytics the rebuild adds; reference has no date functions)."""
    e = t(spark, sf, "events")
    hour = F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss")
    return (
        e.groupBy(hour.alias("hour"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), _r(F.avg("value")).alias("avg_value"))
    )


ORACLE_EVENTS_HOURLY = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       event_type, count(*) AS n, round(avg(value), 6) AS avg_value
FROM events
GROUP BY 1, 2
"""


def events_json_props(spark, sf):
    """JSON-in-string extraction (events.props) — F.get_json_object,
    ANSI-oracled by DuckDB json_extract_string."""
    e = t(spark, sf, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return e.groupBy("event_type").agg(
        F.count(k).alias("n_k"),
        _r(F.avg(k)).alias("avg_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


ORACLE_EVENTS_JSON = """
SELECT event_type,
       count(CAST(json_extract_string(props, '$.k') AS BIGINT))  AS n_k,
       round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 6) AS avg_k,
       min(CAST(json_extract_string(props, '$.k') AS BIGINT))    AS min_k,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT))    AS max_k
FROM events
GROUP BY event_type
"""


def user_sessions(spark, sf):
    """Gap-based sessionization (operators/sessionize.py): per-user sessions
    split on >30-minute inactivity gaps, one shuffle + one sort (shared
    window spec for lag + cumulative sum), integer-microsecond arithmetic."""
    from .operators.sessionize import session_stats

    e = t(spark, sf, "events")
    return session_stats(e, "user_id", "ts", gap_minutes=30.0, order_tiebreak="event_id")


ORACLE_USER_SESSIONS = """
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS us FROM events
),
flagged AS (
  SELECT user_id, event_id, us,
         CASE WHEN lag(us) OVER w IS NULL
                   OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS f
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
sess AS (
  SELECT user_id, us,
         -- CAST: DuckDB windowed sum(int) yields HUGEINT -> float64 in pandas;
         -- Spark side emits BIGINT, and the driver hash stringifies 1.0 vs 1.
         CAST(sum(f) OVER (PARTITION BY user_id ORDER BY us, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id,
       count(*)                                        AS n_events,
       min(us)                                         AS session_start_us,
       max(us)                                         AS session_end_us,
       round((max(us) - min(us)) / 1000000.0, 6)       AS duration_s
FROM sess
GROUP BY user_id, session_id
"""


def running_spend(spark, sf):
    """Frame-spec window (rows unbounded-preceding → current): per-customer
    running total — beyond-reference window coverage (SURVEY.md §2.5)."""
    o = t(spark, sf, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        _r(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


ORACLE_RUNNING_SPEND = """
SELECT o_orderkey, o_custkey,
       round(sum(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
FROM orders
"""


# ---------------------------------------------------------------------------
# Training-data ops: text analysis
# ---------------------------------------------------------------------------
def token_stats(spark, sf):
    """F1 + token counting (whitespace + BPE-ish regex) per lang — all
    native regex expressions, codegen-resident."""
    d = t(spark, sf, "documents")
    ws = whitespace_token_count(F.col("text"))
    bpe = bpe_ish_token_count(F.col("text"))
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(ws).alias("sum_ws_tokens"),
        F.sum(bpe).alias("sum_bpe_tokens"),
        _r(F.avg(ws)).alias("avg_ws_tokens"),
    )


ORACLE_TOKEN_STATS = r"""
WITH tk AS (
  SELECT lang,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS ws,
         len(regexp_extract_all(text, '[\p{L}]+|[\p{N}]+|[^\p{L}\p{N}\s]')) AS bpe
  FROM documents
)
SELECT lang, count(*) AS n_docs,
       CAST(sum(ws) AS BIGINT)  AS sum_ws_tokens,
       CAST(sum(bpe) AS BIGINT) AS sum_bpe_tokens,
       round(avg(ws), 6)        AS avg_ws_tokens
FROM tk GROUP BY lang
"""


def lang_id_report(spark, sf):
    """Language-ID heuristic (stopword-hit argmax, first-wins tiebreak) —
    prediction quality per labeled lang; pure when-chain, no UDF."""
    d = t(spark, sf, "documents")
    scores = lang_id_scores(F.col("text"))
    d = d.withColumn("pred", scores["lang_pred"])
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.when(F.col("pred") == F.col("lang"), 1)).alias("n_correct"),
        F.count(F.when(F.col("pred").isNull(), 1)).alias("n_no_signal"),
    )


def _langid_pred_sql() -> tuple[str, str]:
    """-> (hit-count select columns, argmax CASE): the DuckDB twin of
    ``lang_id_scores`` — shared by the accuracy and confusion oracles."""
    hits = {
        lang: rf"len(regexp_extract_all(lower(text), '\b({'|'.join(ws)})\b'))"
        for lang, ws in STOPWORDS.items()
    }
    langs = list(STOPWORDS)
    h = {lang: f"h_{lang}" for lang in langs}
    cols = ",\n         ".join(f"{expr} AS {h[lang]}" for lang, expr in hits.items())
    mx = f"greatest({', '.join(h.values())})"
    chain = f"CASE WHEN {mx} = 0 THEN NULL\n"
    for i, lang in enumerate(langs):
        rest = [h[o] for o in langs[i + 1 :]]
        cond = " AND ".join(f"{h[lang]} >= {r}" for r in rest) or "TRUE"
        chain += f"            WHEN {cond} THEN '{lang}'\n"
    chain += "       END"
    return cols, chain


def _oracle_lang_id() -> str:
    cols, chain = _langid_pred_sql()
    return f"""
WITH s AS (
  SELECT lang,
         {cols}
  FROM documents
), p AS (
  SELECT lang, {chain} AS pred FROM s
)
SELECT lang, count(*) AS n_docs,
       count(CASE WHEN pred = lang THEN 1 END) AS n_correct,
       count(CASE WHEN pred IS NULL THEN 1 END) AS n_no_signal
FROM p GROUP BY lang
"""


def langid_confusion_report(spark, sf):
    """Classifier evaluation for the language-ID heuristic (A20): exact
    per-class tp/fp/fn and precision/recall/F1 as parts-per-million
    integers via the half-up integral-division recipe — the confusion-
    matrix layer every evaluation engine needs beyond raw accuracy
    (lang_id_report). fp comes from the PREDICTED marginal (n_pred - tp),
    so the whole computation is two map-side-combined aggs + a 5-row
    join; NULL metrics where a denominator is zero (ANSI-guarded)."""
    d = t(spark, sf, "documents")
    p = d.withColumn("pred", lang_id_scores(F.col("text"))["lang_pred"])
    truth = p.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_true"),
        F.count(F.when(F.col("pred") == F.col("lang"), 1))
        .cast("long")
        .alias("tp"),
    )
    predf = (
        p.filter(F.col("pred").isNotNull())
        .groupBy(F.col("pred").alias("lang"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_pred"))
    )
    j = (
        truth.join(predf, "lang", "left")
        .fillna(0, ["n_pred"])
        .withColumn("fp", (F.col("n_pred") - F.col("tp")).cast("long"))
        .withColumn("fn", (F.col("n_true") - F.col("tp")).cast("long"))
    )

    def ppm(num: str, den: str):
        return F.when(
            F.expr(f"({den}) > 0"),
            F.expr(f"div(2 * ({num}) * 1000000 + ({den}), 2 * ({den}))"),
        ).cast("long")

    return j.select(
        "lang",
        "tp",
        "fp",
        "fn",
        ppm("tp", "tp + fp").alias("precision_ppm"),
        ppm("tp", "tp + fn").alias("recall_ppm"),
        ppm("2 * tp", "2 * tp + fp + fn").alias("f1_ppm"),
    ).orderBy("lang")


def _oracle_langid_confusion() -> str:
    cols, chain = _langid_pred_sql()
    ppm = (
        lambda num, den: f"CASE WHEN {den} > 0 THEN "
        f"CAST((2 * ({num}) * 1000000 + ({den})) // (2 * ({den})) AS BIGINT)"
        f" END"
    )
    return f"""
WITH s AS (
  SELECT lang,
         {cols}
  FROM documents
), p AS (
  SELECT lang, {chain} AS pred FROM s
),
truth AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_true,
         CAST(count(CASE WHEN pred = lang THEN 1 END) AS BIGINT) AS tp
  FROM p GROUP BY lang
),
predf AS (
  SELECT pred AS lang, CAST(count(*) AS BIGINT) AS n_pred
  FROM p WHERE pred IS NOT NULL GROUP BY pred
),
j AS (
  SELECT t.lang, t.tp,
         coalesce(pf.n_pred, 0) - t.tp AS fp,
         t.n_true - t.tp AS fn
  FROM truth t LEFT JOIN predf pf ON pf.lang = t.lang
)
SELECT lang, CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       CAST(fn AS BIGINT) AS fn,
       {ppm('tp', 'tp + fp')} AS precision_ppm,
       {ppm('tp', 'tp + fn')} AS recall_ppm,
       {ppm('2 * tp', '2 * tp + fp + fn')} AS f1_ppm
FROM j ORDER BY lang
"""


ORACLE_LANGID_CONFUSION = _oracle_langid_confusion()


def quality_scores(spark, sf):
    """Composite quality score (length/punct/control/stopword signals) per
    lang — the quality-analytics analog of the reference's confidence-band
    scoring, fully in codegen."""
    d = t(spark, sf, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        _r(F.avg(quality_score(F.col("text"), "en"))).alias("avg_quality"),
        _r(F.min(quality_score(F.col("text"), "en"))).alias("min_quality"),
        _r(F.max(quality_score(F.col("text"), "en"))).alias("max_quality"),
    )


_SW_EN = "|".join(STOPWORDS["en"])
ORACLE_QUALITY_SCORES = rf"""
WITH q AS (
  SELECT lang,
    round(
      least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) * 0.3
      + greatest(0.0, 1.0 - (CASE WHEN length(text) > 0
          THEN len(regexp_extract_all(text, '[\p{{P}}]')) * 1.0 / length(text)
          ELSE 0.0 END) * 4.0) * 0.2
      + greatest(0.0, 1.0 - (CASE WHEN length(text) > 0
          THEN len(regexp_extract_all(text, '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]')) * 1.0 / length(text)
          ELSE 0.0 END) * 20.0) * 0.2
      + least((CASE WHEN length(trim(text)) = 0 THEN 0.0
          ELSE len(regexp_extract_all(lower(text), '\b({_SW_EN})\b')) * 1.0
               / len(regexp_split_to_array(trim(text), '\s+')) END) * 4.0, 1.0) * 0.3
    , 6) AS score
  FROM documents
)
SELECT lang, count(*) AS n_docs,
       round(avg(score), 6) AS avg_quality,
       round(min(score), 6) AS min_quality,
       round(max(score), 6) AS max_quality
FROM q GROUP BY lang
"""


# ---------------------------------------------------------------------------
# Training-data ops: dedup
# ---------------------------------------------------------------------------
def exact_dup_stats(spark, sf):
    """Exact dedup via normalized-text fingerprint (hash-groupBy; map-side
    combine collapses dups before the shuffle)."""
    d = t(spark, sf, "documents")
    fp = F.md5(F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")))
    return d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(fp).alias("n_unique"),
        (F.count(F.lit(1)) - F.countDistinct(fp)).alias("n_dups"),
    )


ORACLE_EXACT_DUP = r"""
WITH f AS (SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp FROM documents)
SELECT count(*) AS n_docs,
       count(DISTINCT fp) AS n_unique,
       count(*) - count(DISTINCT fp) AS n_dups
FROM f
"""


def ngram_jaccard_small(spark, sf):
    """Exact n-gram Jaccard near-dup pairs over a bounded subset (shingle
    inverted-index self-join) — the verification-grade path of the dedup
    stack (operators/dedup.py)."""
    d = t(spark, sf, "documents").filter(F.col("doc_id") < 60).select("doc_id", "text")
    pairs = ngram_jaccard_pairs(d, "text", "doc_id", shingle_n=3, threshold=0.5)
    return pairs.select("id_a", "id_b", _r(F.col("jaccard")).alias("jaccard"))


ORACLE_NGRAM_JACCARD = """
WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 60),
sh AS (
  SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 3) AS sh
  FROM d, UNNEST(range(1, length(text) - 1)) AS t(i)
  WHERE length(text) >= 3
),
sizes AS (SELECT doc_id, count(*) AS nsh FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
  FROM sh a JOIN sh b USING (sh)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       round(CAST(n_common AS DOUBLE) / (sa.nsh + sb.nsh - n_common), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE CAST(n_common AS DOUBLE) / (sa.nsh + sb.nsh - n_common) >= 0.5
"""


def minhash_pairs(spark, sf):
    """MinHash+LSH near-dup candidates (xxhash64 signatures — Spark-native,
    not SQL-oracle-expressible → rows-only check)."""
    d = t(spark, sf, "documents")
    return minhash_lsh_pairs(
        d, "text", "doc_id", n_hashes=32, bands=8, jaccard_threshold=0.35
    ).select("id_a", "id_b", _r(F.col("est_jaccard")).alias("est_jaccard"))


def simhash_pairs(spark, sf):
    """SimHash near-dup pairs via 4×16-bit band join (rows-only check) —
    max_hamming=3 keeps the bands wide (16-bit keys), so bucket collision
    rates stay low at corpus scale while recall remains guaranteed."""
    d = t(spark, sf, "documents")
    return simhash_near_dup_pairs(d, "text", "doc_id", max_hamming=3)


# ---------------------------------------------------------------------------
# Training-data ops: similarity search
# ---------------------------------------------------------------------------
def embedding_topk(spark, sf):
    """Brute-force cosine top-k to a query vector (vec_id=0): dot/norm as
    native array expressions, TakeOrderedAndProject top-k."""
    e = t(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    joined = e.crossJoin(F.broadcast(q))
    cos = cosine_expr(F.col("embedding"), F.col("qv"))
    return (
        joined.select("vec_id", _r(cos).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
        .limit(10)
    )


ORACLE_EMBEDDING_TOPK = """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
p AS (
  SELECT e.vec_id,
         CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) AS x,
         CAST(q.qv[CAST(i AS INT)] AS DOUBLE)        AS y
  FROM embeddings e, q, UNNEST(range(1, len(e.embedding) + 1)) AS t(i)
),
c AS (
  SELECT vec_id, round(sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))), 6) AS cosine
  FROM p GROUP BY vec_id
)
SELECT vec_id, cosine FROM c ORDER BY cosine DESC, vec_id LIMIT 10
"""


def lsh_ann_topk(spark, sf):
    """LSH-bucketed approximate top-k (hyperplane signatures via xxhash64 —
    rows-only check; the 100 TB path that prunes the corpus pre-dot-product)."""
    e = t(spark, sf, "embeddings")
    qrow = e.filter(F.col("vec_id") == 0).select("embedding").collect()
    query = [float(x) for x in qrow[0][0]]
    out = lsh_top_k(spark, e, "embedding", "vec_id", query, k=10, multiprobe=1)
    return out.select("vec_id", _r(F.col("cosine")).alias("cosine"))


SQL_SUMMARY = """
SELECT count(*)                                         AS n_orders,
       count(DISTINCT o_custkey)                        AS n_customers,
       round(sum(o_totalprice), 2)                      AS total_spend,
       round(avg(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 6) AS avg_finished_price,
       round(min(o_totalprice), 2)                      AS min_price,
       round(max(o_totalprice), 2)                      AS max_price
FROM orders
WHERE o_orderpriority IS NOT NULL
"""


def salted_join_stats(spark, sf):
    """Salted equi-join (operators/salted.py salted_join): orders (probe,
    salt on o_orderkey) against customer replicated n_salts ways, joined on
    (custkey, salt) so a hot customer's orders spread across salt tasks —
    result invariant to the salt, so the oracle is the PLAIN join: the skew
    path's correctness is exactly this equality (same contract as
    salted_source_stats)."""
    from .operators.salted import salted_join

    o = t(spark, sf, "orders").select(
        F.col("o_custkey").alias("custkey"), "o_totalprice", "o_orderkey"
    )
    c = t(spark, sf, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_mktsegment"
    )
    j = salted_join(o, c, "custkey", salt_col="o_orderkey", n_salts=8)
    return j.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        _r(F.sum("o_totalprice"), 2).alias("total_price"),
    )


ORACLE_SALTED_JOIN = """
SELECT c_mktsegment,
       count(*)                    AS n_orders,
       round(sum(o_totalprice), 2) AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def sql_summary(spark, sf):
    """EP3/A9: the SQL exploration surface — the SAME SQL string the oracle
    runs is handed to spark.sql over registered temp views
    (/root/reference/explore_stats.py:86-128: DuckDB views → canned SQL;
    here Catalyst parses/optimizes/executes it distributed)."""
    t(spark, sf, "orders").createOrReplaceTempView("orders")
    return spark.sql(SQL_SUMMARY)


SQL_QUALITY_MATRIX = """
WITH t AS (
  SELECT percentile_cont(0.33) WITHIN GROUP (ORDER BY n_chars) AS p33,
         percentile_cont(0.66) WITHIN GROUP (ORDER BY n_chars) AS p66
  FROM documents
)
SELECT CASE WHEN d.n_chars < t.p33 THEN 'short'
            WHEN d.n_chars < t.p66 THEN 'mid'
            ELSE 'long' END AS bucket,
       count(*)                   AS n,
       round(avg(d.n_chars), 6)   AS avg_chars,
       round(min(t.p33), 6)       AS p33,
       round(min(t.p66), 6)       AS p66
FROM documents d, t
GROUP BY 1
"""


def sql_quality_matrix(spark, sf):
    """A10 + F7 as shared SQL: dataset-relative percentile_cont thresholds +
    CASE bucket counts (/root/reference/explore_stats.py:357-425) — the SAME
    string runs on Catalyst and on the DuckDB oracle."""
    t(spark, sf, "documents").createOrReplaceTempView("documents")
    return spark.sql(SQL_QUALITY_MATRIX)


def fingerprint_stats(spark, sf):
    """Document fingerprinting (rolling polynomial hash over a 128-char
    prefix) per lang: collision behavior + hash range. Scale path: the
    codegen posexplode→agg form (functions/text.rolling_fingerprints —
    interpreted-HOF fold kept only as the parity reference). Oracle: DuckDB
    recursive-CTE power table + per-char UNNEST replay
    (ORACLE_FINGERPRINT_STATS)."""
    from .functions.text import rolling_fingerprints

    d = t(spark, sf, "documents")
    fps = rolling_fingerprints(d, F.col("text"), "doc_id")
    return (
        d.select("doc_id", "lang")
        .join(fps, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("fp").alias("n_distinct_fp"),
            F.min("fp").alias("min_fp"),
            F.max("fp").alias("max_fp"),
        )
    )


# DuckDB replay of the rolling polynomial hash (functions/text.py
# rolling_fingerprint): powers of BASE mod P from a recursive CTE, per-char
# codepoint rows from UNNEST(range), fp = sum(code_i * BASE^(i-1)) mod P —
# the mod-at-each-step Spark fold and the mod-at-the-end sum agree because
# mod is a ring homomorphism and the unreduced sum stays < 2^58.
# Edge semantics matched to Spark: split('','') is [''] with ascii('') = 0,
# so empty text -> fp 0 (coalesce); NULL text -> NULL fp.
ORACLE_FINGERPRINT_STATS = """
WITH RECURSIVE pw(i, v) AS (
  SELECT 1, CAST(1 AS BIGINT)
  UNION ALL
  SELECT i + 1, (v * 131) % 2147483647 FROM pw WHERE i < 128
),
chars AS (
  SELECT doc_id, CAST(i AS INT) AS i,
         ascii(substr(substr(text, 1, 128), CAST(i AS INT), 1)) AS code
  FROM documents, UNNEST(range(1, length(substr(text, 1, 128)) + 1)) AS u(i)
  WHERE text IS NOT NULL
),
per_doc AS (
  SELECT c.doc_id, CAST(sum(c.code * pw.v) % 2147483647 AS BIGINT) AS fp_sum
  FROM chars c JOIN pw ON pw.i = c.i
  GROUP BY c.doc_id
),
fp AS (
  SELECT d.doc_id, d.lang,
         CASE WHEN d.text IS NULL THEN NULL
              ELSE coalesce(p.fp_sum, 0) END AS fp
  FROM documents d LEFT JOIN per_doc p USING (doc_id)
)
SELECT lang, count(*) AS n_docs, count(DISTINCT fp) AS n_distinct_fp,
       min(fp) AS min_fp, max(fp) AS max_fp
FROM fp GROUP BY lang
"""


def enrich_union_stats(spark, sf):
    """U1 + F14 + J1: the metadata-enrichment layer
    (/root/reference/metadata_loader.py:109-146) — two heterogeneous
    per-source frames unioned by name with missing columns NULL-filled,
    tagged with a source literal, broadcast-LEFT-joined to a dimension,
    rolled up per nation."""
    c = t(spark, sf, "customer").select(
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_mktsegment").alias("mktsegment"),
        F.lit("customer").alias("side"),
    )
    s = t(spark, sf, "supplier").select(
        F.col("s_name").alias("name"),
        F.col("s_acctbal").alias("acctbal"),
        F.col("s_nationkey").alias("nationkey"),
        F.lit("supplier").alias("side"),
    )
    combined = c.unionByName(s, allowMissingColumns=True)
    n = t(spark, sf, "nation")
    enriched = combined.join(
        F.broadcast(n), combined.nationkey == n.n_nationkey, "left"
    )
    return enriched.groupBy("n_name", "side").agg(
        F.count(F.lit(1)).alias("n_accounts"),
        _r(F.avg("acctbal")).alias("avg_acctbal"),
        F.count(F.when(F.col("mktsegment").isNull(), 1)).alias("n_missing_segment"),
    )


ORACLE_ENRICH_UNION = """
WITH combined AS (
  SELECT c_name AS name, c_acctbal AS acctbal, c_nationkey AS nationkey,
         c_mktsegment AS mktsegment, 'customer' AS side
  FROM customer
  UNION ALL
  SELECT s_name, s_acctbal, s_nationkey, NULL, 'supplier' FROM supplier
)
SELECT n_name, side,
       count(*)                                       AS n_accounts,
       round(avg(acctbal), 6)                         AS avg_acctbal,
       count(CASE WHEN mktsegment IS NULL THEN 1 END) AS n_missing_segment
FROM combined LEFT JOIN nation ON nationkey = n_nationkey
GROUP BY n_name, side
"""


def conf_scale_normalize(spark, sf):
    """P7: two-pass scale normalization — if the global max exceeds a 0-1
    range, divide by 100 (/root/reference/analyze_buckets.py:42-47). Pass 1
    is one cheap max() agg; pass 2 is a plain pushed-down projection."""
    e = t(spark, sf, "events")
    mx = e.agg(F.max("value")).collect()[0][0]
    v = (F.col("value") / 100.0) if mx is not None and mx > 1.0 else F.col("value")
    return e.withColumn("norm", v).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        _r(F.avg("norm")).alias("avg_norm"),
        _r(F.max("norm")).alias("max_norm"),
    )


ORACLE_CONF_SCALE = """
WITH mx AS (SELECT max(value) AS m FROM events),
n AS (
  SELECT event_type,
         CASE WHEN (SELECT m FROM mx) > 1.0 THEN value / 100.0 ELSE value END AS norm
  FROM events
)
SELECT event_type, count(*) AS n, round(avg(norm), 6) AS avg_norm,
       round(max(norm), 6) AS max_norm
FROM n GROUP BY event_type
"""


def order_gaps_lag(spark, sf):
    """lag/lead window (beyond-reference coverage): days since the previous
    order per customer; first order -> NULL."""
    o = t(spark, sf, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
    prev = F.lag("o_orderdate").over(w)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.datediff(F.col("o_orderdate"), prev).alias("days_since_prev"),
    )


ORACLE_ORDER_GAPS = """
SELECT o_orderkey, o_custkey,
       CAST(date_diff('day',
            lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
            o_orderdate) AS INT) AS days_since_prev
FROM orders
"""


def rollup_nation_totals(spark, sf):
    """A12 generalized: ROLLUP grouping sets over (region, nation) — the
    reference enumerates its cross-dim pairs manually
    (/root/reference/analyze_by_metadata.py:185-225); grouping sets do it in
    one pass with subtotals and a grand total."""
    c = t(spark, sf, "customer")
    n = t(spark, sf, "nation")
    r = t(spark, sf, "region")
    joined = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"), _r(F.sum("c_acctbal"), 2).alias("total_bal"))
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "n_customers",
            "total_bal",
        )
    )


ORACLE_ROLLUP_NATION = """
SELECT coalesce(r_name, 'ALL') AS region,
       coalesce(n_name, 'ALL') AS nation,
       count(*) AS n_customers,
       round(sum(c_acctbal), 2) AS total_bal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


def minhash_pairs_md5(spark, sf):
    """Banded MinHash-LSH with the md5 hash family (dedup.py
    minhash_lsh_pairs_md5) — the ORACLE-CHECKED LSH dedup path: DuckDB
    replays shingling, per-seed min-md5 signatures, band keys, the band
    self-join and the signature verification value-for-value. The xxhash64
    production path (`minhash_pairs`) stays rows-only; this variant proves
    the banded-LSH pipeline SHAPE against SQL semantics."""
    d = (
        t(spark, sf, "documents")
        .filter(F.col("doc_id") < 200)
        .select("doc_id", "text")
    )
    out = minhash_lsh_pairs_md5(
        d, "text", "doc_id", n_hashes=16, bands=4, shingle_n=5,
        jaccard_threshold=0.25,
    )
    return out.select("id_a", "id_b", _r(F.col("est_jaccard")).alias("est_jaccard"))


ORACLE_MINHASH_PAIRS_MD5 = """
WITH d AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 200 AND length(text) >= 5
),
sh AS (
  SELECT doc_id, substr(text, CAST(i AS INT), 5) AS sh
  FROM d, UNNEST(range(1, length(text) - 3)) AS t(i)
),
seeds AS (SELECT UNNEST(range(0, 16)) AS seed),
mh AS (
  SELECT doc_id, seed, min(md5(CAST(seed AS VARCHAR) || ':' || sh)) AS h
  FROM sh CROSS JOIN seeds
  GROUP BY doc_id, seed
),
bandkeys AS (
  SELECT doc_id, seed // 4 AS band,
         md5(string_agg(h, '|' ORDER BY seed)) AS bkey
  FROM mh GROUP BY doc_id, seed // 4
),
-- degenerate-bucket guard, replayed: buckets over 200 rows are dropped
good AS (
  SELECT bk.* FROM bandkeys bk
  JOIN (SELECT band, bkey, count(*) AS bn FROM bandkeys GROUP BY 1, 2) s
    ON s.band = bk.band AND s.bkey = bk.bkey
  WHERE s.bn <= 200
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM good a JOIN good b ON a.band = b.band AND a.bkey = b.bkey
  WHERE a.doc_id < b.doc_id
),
agree AS (
  SELECT c.id_a, c.id_b, sum(CASE WHEN ma.h = mb.h THEN 1 ELSE 0 END) AS n_agree
  FROM cand c
  JOIN mh ma ON ma.doc_id = c.id_a
  JOIN mh mb ON mb.doc_id = c.id_b AND mb.seed = ma.seed
  GROUP BY 1, 2
)
SELECT id_a, id_b, round(n_agree / 16.0, 6) AS est_jaccard
FROM agree
WHERE n_agree / 16.0 >= 0.25
"""


def simhash_pairs_md5(spark, sf):
    """SimHash near-dup pairs on the md5 hash family (dedup.py
    simhash_near_dup_pairs_md5) — the ORACLE-CHECKED SimHash path: DuckDB
    replays token md5s, per-bit vote sums, the 64-char bit-string
    signature, 4x16-char band candidates and the exact hamming verify.
    The xxhash64 production path (`simhash_pairs`) stays rows-only."""
    from .operators.dedup import simhash_near_dup_pairs_md5

    d = t(spark, sf, "documents").select("doc_id", "text")
    out = simhash_near_dup_pairs_md5(d, "text", "doc_id", max_hamming=3)
    return out.select("id_a", "id_b", "hamming")


ORACLE_SIMHASH_PAIRS_MD5 = r"""
WITH toks AS (
  SELECT doc_id, UNNEST(regexp_split_to_array(trim(text), '\s+')) AS tok
  FROM documents WHERE length(trim(text)) > 0
),
t2 AS (SELECT doc_id, md5(tok) AS h FROM toks WHERE length(tok) > 0),
bits AS (
  SELECT doc_id, j.j,
         CASE WHEN ((strpos('0123456789abcdef',
                            substr(h, CAST(j.j // 4 AS INT) + 1, 1)) - 1)
                    // CAST(pow(2, j.j % 4) AS INT)) % 2 = 1
              THEN 1 ELSE -1 END AS vote
  FROM t2, (SELECT UNNEST(range(0, 64)) AS j) j
),
votes AS (SELECT doc_id, j, sum(vote) AS v FROM bits GROUP BY 1, 2),
sig AS (
  SELECT doc_id,
         string_agg(CASE WHEN v > 0 THEN '1' ELSE '0' END, '' ORDER BY j) AS s
  FROM votes GROUP BY doc_id
),
bands AS (
  SELECT doc_id, b.b, substr(s, CAST(b.b * 16 AS INT) + 1, 16) AS bkey
  FROM sig, (SELECT UNNEST(range(0, 4)) AS b) b
),
-- degenerate-bucket guard, replayed: buckets over 200 rows are dropped
good AS (
  SELECT bk.* FROM bands bk
  JOIN (SELECT b, bkey, count(*) AS bn FROM bands GROUP BY 1, 2) s
    ON s.b = bk.b AND s.bkey = bk.bkey
  WHERE s.bn <= 200
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
  FROM good a JOIN good c ON a.b = c.b AND a.bkey = c.bkey
  WHERE a.doc_id < c.doc_id
),
ham AS (
  SELECT c.id_a, c.id_b,
         sum(CASE WHEN substr(sa.s, CAST(p.p AS INT), 1)
                   <> substr(sb.s, CAST(p.p AS INT), 1) THEN 1 ELSE 0 END) AS hamming
  FROM cand c
  JOIN sig sa ON sa.doc_id = c.id_a
  JOIN sig sb ON sb.doc_id = c.id_b,
  (SELECT UNNEST(range(1, 65)) AS p) p
  GROUP BY 1, 2
)
SELECT id_a, id_b, CAST(hamming AS BIGINT) AS hamming
FROM ham WHERE hamming <= 3
"""


def cube_status_priority(spark, sf):
    """CUBE grouping sets (A12's full-lattice sibling: all four subsets
    including per-priority margins, one pass) over orders status×priority.
    NULL-free grouping keys in this table, so the 'ALL' coalesce is
    unambiguous (same convention as rollup_nation_totals)."""
    o = t(spark, sf, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _r(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_price",
        )
    )


ORACLE_CUBE_STATUS_PRIORITY = """
SELECT coalesce(o_orderstatus, 'ALL')   AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*)                         AS n_orders,
       round(sum(o_totalprice), 2)      AS total_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def order_value_quartiles(spark, sf):
    """NTILE window: value quartiles of orders WITHIN each priority class
    (ntile is inherently a per-partition total order — the partitioned form
    is the scale-legal one; GLOBAL quantiles at 100 TB use the
    percentile_cont threshold path instead, A10/sql_quality_matrix).
    Unique (price, orderkey) sort makes tile assignment deterministic."""
    o = t(spark, sf, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    q = o.select(
        "o_orderpriority", F.ntile(4).over(w).alias("quartile"), "o_totalprice"
    )
    return q.groupBy("o_orderpriority", "quartile").agg(
        F.count(F.lit(1)).alias("n_orders"),
        _r(F.min("o_totalprice"), 2).alias("min_price"),
        _r(F.max("o_totalprice"), 2).alias("max_price"),
        _r(F.avg("o_totalprice")).alias("avg_price"),
    )


ORACLE_ORDER_VALUE_QUARTILES = """
WITH q AS (
  SELECT o_orderpriority,
         ntile(4) OVER (PARTITION BY o_orderpriority
                        ORDER BY o_totalprice, o_orderkey) AS quartile,
         o_totalprice
  FROM orders
)
SELECT o_orderpriority, quartile,
       count(*)                    AS n_orders,
       round(min(o_totalprice), 2) AS min_price,
       round(max(o_totalprice), 2) AS max_price,
       round(avg(o_totalprice), 6) AS avg_price
FROM q
GROUP BY o_orderpriority, quartile
"""


def supplier_name_concat(spark, sf):
    """Deterministic string aggregation: suppliers per nation as a sorted
    comma list — collect_list is order-nondeterministic across partitions,
    so the engine-wide rule is array_sort BEFORE array_join (the only
    oracle-safe and rerun-stable form)."""
    s = t(spark, sf, "supplier")
    n = t(spark, sf, "nation")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.array_join(F.array_sort(F.collect_list("s_name")), ",").alias(
                "supplier_names"
            ),
        )
    )


ORACLE_SUPPLIER_NAME_CONCAT = """
SELECT n_name,
       count(*) AS n_suppliers,
       string_agg(s_name, ',' ORDER BY s_name) AS supplier_names
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
"""


def band_filter_fallback(spark, sf):
    """P4 with relax-fallback: keep events with value in [200, 400]; if fewer
    than 500 rows match, relax to [100, 450]
    (/root/reference/select_challenging_images.py:112-118). The count probe
    is one agg job; the chosen band is a plain pushed-down filter."""
    from .operators.sampling import band_filter_with_fallback

    e = t(spark, sf, "events")
    banded = band_filter_with_fallback(e, "value", 200.0, 400.0, 100.0, 450.0, 500)
    return banded.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), _r(F.avg("value")).alias("avg_value")
    )


ORACLE_BAND_FALLBACK = """
WITH probe AS (SELECT count(*) AS n FROM events WHERE value BETWEEN 200.0 AND 400.0),
banded AS (
  SELECT * FROM events
  WHERE CASE WHEN (SELECT n FROM probe) >= 500
             THEN value BETWEEN 200.0 AND 400.0
             ELSE value BETWEEN 100.0 AND 450.0 END
)
SELECT event_type, count(*) AS n, round(avg(value), 6) AS avg_value
FROM banded GROUP BY event_type
"""


def challenging_docs(spark, sf):
    """R1+R2+R3+P4 composed: the challenging-document selection flow
    (/root/reference/select_challenging_images.py end-to-end) — band filter
    with relax fallback, seeded group sample, per-group cap, final subsample;
    md5 hash ordering so DuckDB can replay it exactly."""
    from .operators.sampling import select_challenging_docs

    d = t(spark, sf, "documents")
    out = select_challenging_docs(
        d,
        group_col="source",
        key_col="doc_id",
        score_col="n_chars",
        lo=150.0,
        hi=300.0,
        relaxed_lo=100.0,
        relaxed_hi=400.0,
        min_band_rows=100,
        n_groups=10,
        per_group=3,
        n_final=20,
        hash_col=lambda c: F.md5(c.cast("string")),
    )
    return out.select("doc_id", "source", "lang", "n_chars")


ORACLE_CHALLENGING = """
WITH probe AS (SELECT count(*) AS n FROM documents WHERE n_chars BETWEEN 150.0 AND 300.0),
banded AS (
  SELECT * FROM documents
  WHERE CASE WHEN (SELECT n FROM probe) >= 100
             THEN n_chars BETWEEN 150.0 AND 300.0
             ELSE n_chars BETWEEN 100.0 AND 400.0 END
),
groups AS (
  SELECT source FROM (SELECT DISTINCT source FROM banded)
  ORDER BY md5(source), source LIMIT 10
),
ing AS (SELECT b.* FROM banded b JOIN groups USING (source)),
per AS (
  SELECT *, row_number() OVER (
    PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM ing
)
SELECT doc_id, source, lang, n_chars FROM per
WHERE rn <= 3
ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
LIMIT 20
"""


def embedding_near_dup_report(spark, sf):
    """Embedding near-dup pairs (X5, rows-only: hyperplane signatures are
    xxhash64-derived): banded random-hyperplane LSH candidates -> exact
    cosine verify, summarized as pair count + cosine spread. Recall vs the
    exact all-pairs truth (X7) is pytest-pinned on planted clusters
    (tests/test_queries.py)."""
    from .operators.dedup import embedding_near_dup_pairs

    e = t(spark, sf, "embeddings")
    pairs = embedding_near_dup_pairs(
        e, "embedding", "vec_id", threshold=0.2, n_planes=8, n_bands=4, seed=3
    )
    return pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        _r(F.min("cosine")).alias("min_cos"),
        _r(F.max("cosine")).alias("max_cos"),
        _r(F.avg("cosine")).alias("avg_cos"),
    )


def ann_index_topk(spark, sf):
    """Materialized-index ANN (rows-only): build the bucketed LSH index once
    (operators/ann_index.py — codegen explode→agg signatures, bucketBy(sig)
    layout), then answer the top-k probe by scanning ONLY the probed buckets
    (bucket pruning pinned by tests/test_ann_index.py). Identical results to
    lsh_ann_topk by construction; the difference is the probe cost: index
    files for 13 of n buckets instead of a full-corpus signature pass."""
    import shutil
    import tempfile

    from .operators.ann_index import build_lsh_index, lsh_top_k_indexed

    e = t(spark, sf, "embeddings")
    qrow = e.filter(F.col("vec_id") == 0).select("embedding").collect()
    query = [float(x) for x in qrow[0][0]]
    base = f"{tempfile.gettempdir()}/ooe_ann_query"
    shutil.rmtree(base, ignore_errors=True)
    build_lsh_index(
        spark, e, "embedding", "vec_id", name="ooe_ann_query_idx",
        path=f"{base}/lsh", n_planes=12, seed=42, n_buckets=16,
    )
    out = lsh_top_k_indexed(spark, "ooe_ann_query_idx", query, k=10, multiprobe=1)
    return out.select(
        F.col("id").alias("vec_id"), _r(F.col("cosine")).alias("cosine")
    )


def ivf_ann_topk(spark, sf):
    """IVF-style ANN (rows-only): deterministic coarse centroids, route each
    vector to its nearest cell, probe the query's nearest cells only."""
    from .operators.similarity import ivf_top_k

    e = t(spark, sf, "embeddings")
    qrow = e.filter(F.col("vec_id") == 0).select("embedding").collect()
    query = [float(x) for x in qrow[0][0]]
    out = ivf_top_k(spark, e, "embedding", "vec_id", query, k=10, n_cells=8, n_probe=3)
    return out.select("vec_id", _r(F.col("cosine")).alias("cosine"))


# ---------------------------------------------------------------------------
# Skew handling
# ---------------------------------------------------------------------------
def salted_source_stats(spark, sf):
    """Salted two-phase aggregation (operators/salted.py) — result invariant
    to the salt, so the oracle is the PLAIN group-by: correctness of the skew
    path is exactly this equality."""
    d = t(spark, sf, "documents")
    out = salted_group_stats(d, ["source"], "n_chars", salt_col="doc_id", n_salts=16)
    return out.select(
        "source",
        F.col("n").alias("n"),
        _r(F.col("sum"), 2).alias("sum_nc"),
        _r(F.col("mean")).alias("mean_nc"),
        F.col("min").alias("min_nc"),
        F.col("max").alias("max_nc"),
        _r(F.col("var_samp")).alias("var_nc"),
        _r(F.col("std")).alias("std_nc"),
    )


ORACLE_SALTED_STATS = """
SELECT source,
       count(nc)                       AS n,
       round(sum(nc), 2)               AS sum_nc,
       round(avg(nc), 6)               AS mean_nc,
       min(nc)                         AS min_nc,
       max(nc)                         AS max_nc,
       round(var_samp(nc), 6)          AS var_nc,
       round(stddev_samp(nc), 6)       AS std_nc
FROM (SELECT source, CAST(n_chars AS DOUBLE) AS nc FROM documents)
GROUP BY source
"""


# ---------------------------------------------------------------------------
# Extraction + perplexity (fixture-backed, rows-only: the oracle cannot run
# our extractor / LM join — correctness is the byte-identity pytest gate)
# ---------------------------------------------------------------------------
def extraction_report(spark, sf):
    """The flagship pipeline stage on deterministic fixture pages: scan →
    column-pruned select → Arrow-batched extraction UDF → per-lang rollup."""
    from .extract.udf import extract_udf
    from .fixtures.generate import web_pages_df

    pages = web_pages_df(spark, 300, partitions=8)
    ex = (
        pages.select("url", "lang", "html")
        .withColumn("x", extract_udf(F.col("html")))
        .select("url", "lang", "x.*")
    )
    return ex.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.count(F.when(F.col("error").isNotNull(), 1)).alias("n_errors"),
        F.count(F.when(F.col("is_pdf"), 1)).alias("n_pdf"),
        F.sum("n_blocks_kept").alias("blocks_kept"),
        F.sum("n_blocks_dropped").alias("blocks_dropped"),
        F.countDistinct("text_sha256").alias("n_distinct_texts"),
        F.sum(F.length("extracted_text")).alias("total_chars"),
    )


def streaming_extraction_report(spark, sf):
    """Structured Streaming smoke (rows-only): fixture pages streamed through
    the incremental extraction pipeline (availableNow trigger, real
    checkpoint), then a per-lang rollup of the streamed output — proves the
    streaming twin produces the same shape as the batch path."""
    import shutil
    import tempfile

    from .fixtures.generate import web_pages_df
    from .streaming import stream_extraction

    # fixed scratch dir, wiped on entry: repeated sweeps must not accumulate
    # checkpoints/fixtures in /tmp, and a stale checkpoint against a
    # rewritten source would corrupt offsets
    base = f"{tempfile.gettempdir()}/ooe_stream_query"
    shutil.rmtree(base, ignore_errors=True)
    src, out, ckpt = f"{base}/src", f"{base}/out", f"{base}/ckpt"
    # 50 pages / 2 source files: availableNow processes everything in one
    # micro-batch. Bounded await (r1 driver run recorded NO row for this
    # query — most plausibly a hang/timeout): stop + raise instead of
    # blocking the whole driver sweep forever.
    web_pages_df(spark, 50, 2).write.mode("overwrite").parquet(src)
    q = stream_extraction(spark, src, out, ckpt)
    finished = q.awaitTermination(timeout=180)
    if not finished:
        q.stop()
        raise TimeoutError("streaming_extraction_report: stream did not finish in 180s")
    return (
        spark.read.parquet(out)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.count(F.when(F.col("error").isNotNull(), 1)).alias("n_errors"),
            F.countDistinct("text_sha256").alias("n_distinct_texts"),
        )
    )


def media_features_report(spark, sf):
    """Multimodal stack smoke (rows-only): fixture media (image/audio/video
    BINARY + typed meta) → Arrow-batched decode + byte features → per-kind
    rollup. Real codecs are stubbed (multimodal/media.py); the Spark plumbing
    — schemas, batch shapes, in-band errors — is the thing under test."""
    from .multimodal import image_features, media_df

    m = media_df(spark, 200, partitions=4)
    feats = image_features(m)
    return feats.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("error").isNotNull(), 1)).alias("n_errors"),
        _r(F.avg("byte_mean"), 4).alias("avg_byte_mean"),
        _r(F.avg("byte_std"), 4).alias("avg_byte_std"),
    )


def media_frame_sample_report(spark, sf):
    """The row-EXPANDING multimodal op (mapInPandas as a UDTF: one video in,
    k frame rows out — multimodal/media.py sample_frames) summarized per
    video-size class. Rows-only: fixture media + mapInPandas. Frame-slice
    exactness is pytest-golden (tests/test_multimodal.py)."""
    from .multimodal import media_df, sample_frames

    m = media_df(spark, 200, partitions=4)
    frames = sample_frames(m, every_k=2)
    return (
        frames.groupBy("width", "height")
        .agg(
            F.countDistinct("media_id").alias("n_videos"),
            F.count(F.lit(1)).alias("n_frames"),
            F.sum(F.length("frame")).alias("frame_bytes"),
        )
    )


def train_lm(spark, sf):
    """LM training in-engine: per-lang char-trigram add-one-smoothed log
    probabilities derived from the corpus (replaces the reference's
    downloaded pretrained model, /root/reference/perplexity_scorer.py:84-135)
    — explode → hash-agg → window totals, fully SQL-oracled."""
    from .operators.perplexity import train_char_lm

    d = t(spark, sf, "documents")
    lm = train_char_lm(d, text_col="text", lang_col="lang")
    return lm.select("lang", "ngram", _r(F.col("logp")).alias("logp"))


ORACLE_TRAIN_LM = r"""
WITH norm AS (
  SELECT lang,
         trim(regexp_replace(regexp_replace(lower(text), '[^\p{L} ]+', ' ', 'g'),
                             '\s+', ' ', 'g')) AS t
  FROM documents
),
g AS (
  SELECT lang, substr(t, CAST(i AS INT), 3) AS ngram
  FROM norm, UNNEST(range(1, length(t) - 1)) AS u(i)
  WHERE length(t) >= 3
),
c AS (SELECT lang, ngram, count(*) AS c FROM g GROUP BY 1, 2)
SELECT lang, ngram,
       round(log10((c + 1.0) / (sum(c) OVER (PARTITION BY lang)
                                + count(*) OVER (PARTITION BY lang))), 6) AS logp
FROM c
"""


def perplexity_report(spark, sf):
    """Char-ngram perplexity via the native explode→broadcast-join→agg path:
    the LM is trained in-engine from the corpus itself (train_char_lm over
    every lang except the held-out 'zh', whose docs exercise the
    model-rejection class, perplexity_scorer.py:230-243) and scoring replays
    explode→join→agg — both halves SQL-expressible, so this query is fully
    DuckDB-oracled (VERDICT r1 item 3; parity with the Arrow-UDF scorer
    stays pytest-gated on the fixture LM)."""
    from .operators.perplexity import perplexity_native, train_char_lm

    d = t(spark, sf, "documents")
    lm = train_char_lm(d.filter(F.col("lang") != "zh"), text_col="text", lang_col="lang")
    scored = perplexity_native(
        d.select("doc_id", "lang", F.col("text").alias("extracted_text")),
        lm,
        id_col="doc_id",
    )
    p = F.col("perplexity")
    return (
        d.select("doc_id", "lang")
        .join(scored, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count(F.when(p == _INF, 1)).alias("n_rejected"),
            F.count(F.when(p.isNull(), 1)).alias("n_no_text"),
            _r(F.avg(valid(p)), 4).alias("avg_ppl"),
        )
    )


# Self-contained DuckDB replay of train_char_lm (unrounded logp — the
# rounded variant is ORACLE_TRAIN_LM) + perplexity_native: per-doc trigram
# explode, left join to the LM with OOV backoff -6.0, ppl = 10^(-mean logp);
# class semantics in precedence order: no scoreable text -> NULL, lang not
# in LM ('zh' held out) -> +inf, else scored. avg_ppl averages finite values
# only (functions/valid.py semantics).
ORACLE_PERPLEXITY_REPORT = r"""
WITH norm AS (
  SELECT doc_id, lang,
         coalesce(trim(regexp_replace(regexp_replace(lower(text), '[^\p{L} ]+', ' ', 'g'),
                                      '\s+', ' ', 'g')), '') AS t
  FROM documents
),
g AS (
  SELECT lang, substr(t, CAST(i AS INT), 3) AS ngram
  FROM norm, UNNEST(range(1, length(t) - 1)) AS u(i)
  WHERE length(t) >= 3 AND lang <> 'zh'
),
c AS (SELECT lang, ngram, count(*) AS c FROM g GROUP BY 1, 2),
lm AS (
  SELECT lang, ngram,
         log10((c + 1.0) / (sum(c) OVER (PARTITION BY lang)
                            + count(*) OVER (PARTITION BY lang))) AS logp
  FROM c
),
known AS (SELECT DISTINCT lang FROM lm),
docg AS (
  SELECT n.doc_id, n.lang, substr(n.t, CAST(i AS INT), 3) AS ngram
  FROM norm n, UNNEST(range(1, length(n.t) - 1)) AS u(i)
  WHERE length(n.t) >= 3 AND n.lang IN (SELECT lang FROM known)
),
scored AS (
  SELECT d.doc_id, pow(10.0, -sum(coalesce(lm.logp, -6.0)) / count(*)) AS ppl
  FROM docg d LEFT JOIN lm ON lm.lang = d.lang AND lm.ngram = d.ngram
  GROUP BY d.doc_id
),
allrows AS (
  SELECT n.doc_id, n.lang,
         CASE WHEN length(n.t) < 3 THEN NULL
              WHEN n.lang NOT IN (SELECT lang FROM known)
                THEN CAST('infinity' AS DOUBLE)
              ELSE s.ppl END AS ppl
  FROM norm n LEFT JOIN scored s USING (doc_id)
)
SELECT lang,
       count(*) AS n_docs,
       count(CASE WHEN ppl = CAST('infinity' AS DOUBLE) THEN 1 END) AS n_rejected,
       count(CASE WHEN ppl IS NULL THEN 1 END) AS n_no_text,
       round(avg(CASE WHEN isfinite(ppl) THEN ppl END), 4) AS avg_ppl
FROM allrows
GROUP BY lang
"""


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------
def embedding_pair_topk(spark, sf):
    """All-pairs similarity: exact global top-25 most-cosine-similar vector
    pairs via the distributed block-matmul operator (applyInPandas per block
    pair, local top-k per group, TakeOrderedAndProject final). The dedup
    variant (threshold + hyperplane buckets) is operators/dedup.py:
    embedding_near_dup_pairs; this exact form is the oracle-checked baseline
    the bucketed path's recall is measured against. Reference analog:
    pairwise volume comparisons in select_challenging_images.py are
    driver-side pandas; here n^2 work is distributed."""
    from .operators.similarity import pairwise_top_k_np

    e = t(spark, sf, "embeddings")
    # n_blocks auto-scales with corpus size (block_target rows per block) —
    # the fixed n_blocks=4 this replaced measured 612x wall time for 10x
    # rows in the round-3 sf1 spot check (one straggler task doing all
    # (n/4)^2 pair work); output is exact top-k, invariant to blocking
    out = pairwise_top_k_np(e, "embedding", "vec_id", k=25)
    return out.select("id_a", "id_b", _r(F.col("cosine")).alias("cosine"))


ORACLE_EMBEDDING_PAIR_TOPK = """
WITH n AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
         sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
  FROM embeddings
  WHERE embedding IS NOT NULL
    -- same drop semantics as the Spark side (ADVICE r1): vectors whose
    -- length differs from the corpus-modal dimension never get a cosine
    AND len(embedding) = (
      SELECT len(embedding) FROM embeddings
      WHERE embedding IS NOT NULL AND len(embedding) > 0
      GROUP BY len(embedding)
      ORDER BY count(*) DESC, len(embedding) ASC LIMIT 1
    )
),
p AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         list_sum(list_transform(list_zip(a.v, b.v), t -> t[1] * t[2])) / (a.nrm * b.nrm) AS cos_raw
  FROM n a JOIN n b ON a.vec_id < b.vec_id
  WHERE a.nrm > 0 AND b.nrm > 0
)
SELECT id_a, id_b, round(cos_raw, 6) AS cosine
FROM p
ORDER BY cos_raw DESC, id_a, id_b
LIMIT 25
"""


def customers_without_orders(spark, sf):
    """Anti-join (the harness's fixture-diff primitive, SURVEY §2.3, as a
    first-class query): customers with no urgent-priority orders, rolled up
    per market segment. The anti side is the big fact table — Catalyst plans a
    broadcast/shuffled hash anti join; at 100 TB the orders side would be
    bucketed on o_custkey so the anti join is co-located."""
    c = t(spark, sf, "customer")
    o = (
        t(spark, sf, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            _r(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


ORACLE_CUSTOMERS_WITHOUT_ORDERS = """
SELECT c_mktsegment,
       count(*)                 AS n_customers,
       round(sum(c_acctbal), 2) AS total_acctbal
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
"""


def dup_clusters(spark, sf):
    """Near-dup pairs folded into duplicate CLUSTERS: n-gram Jaccard pairs
    (the oracle-checkable dedup path) -> iterative hash-min connected
    components (operators/components.py; the driver-contract's
    'iterative algorithm' case — here it IS SQL-expressible via a recursive
    CTE, so it stays oracle-checked) -> per-cluster size summary. Every doc
    in the subset lands in exactly one cluster; component id = min doc_id
    (the dedup representative)."""
    from .operators.components import component_sizes, connected_components

    d = t(spark, sf, "documents").filter(F.col("doc_id") < 60).select("doc_id", "text")
    pairs = ngram_jaccard_pairs(d, "text", "doc_id", shingle_n=3, threshold=0.5)
    comp = connected_components(
        d.select("doc_id"), pairs, node_col="doc_id", src_col="id_a", dst_col="id_b"
    )
    return component_sizes(comp)


ORACLE_DUP_CLUSTERS = """
WITH RECURSIVE
d AS (SELECT doc_id, text FROM documents WHERE doc_id < 60),
sh AS (
  SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 3) AS sh
  FROM d, UNNEST(range(1, length(text) - 1)) AS t(i)
  WHERE length(text) >= 3
),
sizes AS (SELECT doc_id, count(*) AS nsh FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
  FROM sh a JOIN sh b USING (sh)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT id_a, id_b
  FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE CAST(n_common AS DOUBLE) / (sa.nsh + sb.nsh - n_common) >= 0.5
),
edges AS (SELECT id_a AS a, id_b AS b FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
reach(a, b) AS (
  SELECT doc_id, doc_id FROM d
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
comp AS (SELECT a AS doc_id, min(b) AS component FROM reach GROUP BY a)
SELECT component, count(*) AS n_docs FROM comp GROUP BY component
"""


def training_export_summary(spark, sf):
    """The composed training-data export (plans/export.py: quality gate →
    exact-dedup window → MinHash-LSH near-dup pairs → connected-component
    collapse) run over `documents`, summarized as kept-docs per lang.
    MinHash/xxhash64 stages are Spark-native → rows-only driver check; the
    end-to-end semantics are pytest-gated on a planted-dup fixture
    (tests/test_pipeline.py)."""
    from .plans.export import training_export_plan

    d = t(spark, sf, "documents")
    stages = training_export_plan(
        d, text_col="text", url_col="doc_id", min_quality=0.2, jaccard_threshold=0.6
    )
    kept = stages["kept"]
    out = (
        kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("kept_docs"),
            _r(F.avg("quality")).alias("avg_quality"),
        )
        .orderBy("lang")
        # materialize BEFORE releasing the stage caches: the driver collects
        # the returned frame after this function exits, and unpersisting
        # first would recompute the quality gate + dedup windows uncached
        .localCheckpoint(eager=True)
    )
    for frame in stages["_persisted"]:
        frame.unpersist()
    return out


def parts_above_type_avg(spark, sf):
    """Correlated-subquery semantics ('rows above their group's average') in
    the scale-idiomatic Spark form: one window average over the group key —
    a single hash-partitioned shuffle instead of the self-join a literal
    correlated subquery decorrelates into. The oracle states the same
    predicate as a window CTE; float guard: prices compared at 1.02x the
    average, rounded columns aliased identically."""
    w = W.partitionBy("p_type")
    p = t(spark, sf, "part").withColumn("_avg", F.avg("p_retailprice").over(w))
    return (
        p.filter(F.col("p_retailprice") > 1.02 * F.col("_avg"))
        .groupBy("p_type")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            _r(F.avg("p_retailprice"), 2).alias("avg_price_above"),
        )
    )


ORACLE_PARTS_ABOVE_TYPE_AVG = """
WITH t AS (
  SELECT p_type, p_retailprice,
         avg(p_retailprice) OVER (PARTITION BY p_type) AS a
  FROM part
)
SELECT p_type,
       count(*)                     AS n_parts,
       round(avg(p_retailprice), 2) AS avg_price_above
FROM t
WHERE p_retailprice > 1.02 * a
GROUP BY p_type
"""


# ---------------------------------------------------------------------------
# Training-data ops (r3): benchmark decontamination + repetition quality
# ---------------------------------------------------------------------------
def contamination_report(spark, sf):
    """Benchmark decontamination (operators/decontaminate.py): every 97th
    document plays the held-out evaluation benchmark; each document is
    scored by the fraction of its distinct word 4-grams that appear in the
    benchmark's n-gram set (the published "13-gram overlap" contamination
    check, scaled to fixture-length texts). Per-lang report: documents
    scored, documents flagged at >=0.5 overlap (benchmark members score
    1.0 by construction — the check proving the plumbing), mean overlap.
    Keys are md5 prefixes so DuckDB replays the identical pipeline; a
    production run swaps to xxhash64 (the minhash_pairs_md5 twin pattern).
    Plan shape: benchmark keys broadcast (eval sets are tiny vs corpus),
    in-row array_distinct dedup (no global distinct exchange), one per-doc
    partial-agg shuffle — corpus never shuffles for membership."""
    from .operators.decontaminate import contamination_scores

    d = _spread(t(spark, sf, "documents"))
    bench = d.filter(F.col("doc_id") % 97 == 0)
    sc = contamination_scores(d, bench, "text", "doc_id", n=4)
    return (
        d.select("doc_id", "lang")
        .join(sc, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("n_grams") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_scored"),
            F.sum(F.when(F.col("overlap") >= 0.5, 1).otherwise(0))
            .cast("long")
            .alias("n_flagged"),
            _r(F.avg("overlap")).alias("avg_overlap"),
        )
        .orderBy("lang")
    )


ORACLE_CONTAMINATION_REPORT = r"""
WITH norm AS (
  SELECT doc_id, lang,
         coalesce(trim(regexp_replace(regexp_replace(lower(text), '[^\p{L} ]+', ' ', 'g'),
                                      '\s+', ' ', 'g')), '') AS t
  FROM documents
),
toks AS (
  SELECT doc_id, string_split(t, ' ') AS w FROM norm WHERE length(t) > 0
),
grams AS (  -- DISTINCT gram STRINGS per doc == Spark's in-row array_distinct
  SELECT DISTINCT doc_id,
         array_to_string(w[CAST(i AS INT):CAST(i + 3 AS INT)], ' ') AS gs
  FROM toks, UNNEST(range(1, len(w) - 2)) AS u(i)
  WHERE len(w) >= 4
),
keyed AS (SELECT doc_id, substr(md5(gs), 1, 16) AS g FROM grams),
bench AS (SELECT DISTINCT g FROM keyed WHERE doc_id % 97 = 0),
scored AS (
  SELECT k.doc_id,
         count(*)  AS n_grams,
         count(b.g) AS n_hits
  FROM keyed k LEFT JOIN bench b USING (g)
  GROUP BY k.doc_id
)
SELECT n.lang,
       count(*) AS n_docs,
       CAST(count(s.doc_id) AS BIGINT) AS n_scored,
       CAST(coalesce(sum(CASE WHEN s.n_hits * 1.0 / s.n_grams >= 0.5
                              THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_flagged,
       round(avg(s.n_hits * 1.0 / s.n_grams), 6) AS avg_overlap
FROM norm n LEFT JOIN scored s USING (doc_id)
GROUP BY n.lang
ORDER BY n.lang
"""


def bloom_contamination_report(spark, sf):
    """Bloom-prefiltered decontamination (X45, operators/bloom.py): the
    same contamination semantics as X21 (`contamination_report`) behind a
    scan-side Bloom bitmap cull — 10 bits/key, k=7 md5-seeded positions,
    pure-codegen bit tests, so the corpus pays NO join or shuffle for the
    ~99% of grams the bitmap rejects; only bloom survivors reach the
    exact-verify broadcast join. A Bloom prefilter cannot change results
    (no false negatives by construction; false positives die in the exact
    verify), and because positions are md5-derived DuckDB replays the
    bitmap as a position set: n_candidates / n_bloom_fp are ORACLE-PINNED
    exactly, not just the final counts. Production twin: xxhash64
    positions (the minhash_pairs_md5 pattern). Adds to X21's per-lang
    report: total bloom candidates, exact hits, and the measured
    false-positive count."""
    from .operators.bloom import bloom_contamination_scores

    d = _spread(t(spark, sf, "documents"))
    bench = d.filter(F.col("doc_id") % 97 == 0)
    sc = bloom_contamination_scores(d, bench, "text", "doc_id", n=4)
    return (
        d.select("doc_id", "lang")
        .join(sc, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("n_grams") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_scored"),
            F.sum(F.when(F.col("overlap") >= 0.5, 1).otherwise(0))
            .cast("long")
            .alias("n_flagged"),
            F.sum("n_cand").cast("long").alias("n_candidates"),
            F.sum("n_hits").cast("long").alias("n_hits"),
            (F.sum("n_cand") - F.sum("n_hits"))
            .cast("long")
            .alias("n_bloom_fp"),
            _r(F.avg("overlap")).alias("avg_overlap"),
        )
        .orderBy("lang")
    )


# The bloom layer replayed as a position SET: a bitmap bit (word w, bit b)
# is set iff some (key, seed) hashed to pos = 64*w + b, so "all k seeded
# bits set" == "all k seeded positions in the DISTINCT position set".
# m sizing mirrors operators/bloom.py bloom_m_bits exactly (integer ceil).
ORACLE_BLOOM_CONTAMINATION_REPORT = r"""
WITH norm AS (
  SELECT doc_id, lang,
         coalesce(trim(regexp_replace(regexp_replace(lower(text), '[^\p{L} ]+', ' ', 'g'),
                                      '\s+', ' ', 'g')), '') AS t
  FROM documents
),
toks AS (
  SELECT doc_id, string_split(t, ' ') AS w FROM norm WHERE length(t) > 0
),
grams AS (
  SELECT DISTINCT doc_id,
         array_to_string(w[CAST(i AS INT):CAST(i + 3 AS INT)], ' ') AS gs
  FROM toks, UNNEST(range(1, len(w) - 2)) AS u(i)
  WHERE len(w) >= 4
),
keyed AS MATERIALIZED (SELECT doc_id, substr(md5(gs), 1, 16) AS g FROM grams),
bench AS MATERIALIZED (SELECT DISTINCT g FROM keyed WHERE doc_id % 97 = 0),
mb AS (SELECT 64 * ((greatest(count(*), 1) * 10 + 63) // 64) AS m FROM bench),
positions AS MATERIALIZED (
  SELECT DISTINCT ('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || b.g), 1, 15))::BIGINT
                  % (SELECT m FROM mb) AS pos
  FROM bench b, UNNEST(range(7)) AS s(j)
),
probe AS (
  SELECT k.doc_id, k.g,
         ('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || k.g), 1, 15))::BIGINT
         % (SELECT m FROM mb) AS pos
  FROM keyed k, UNNEST(range(7)) AS s(j)
),
cand AS MATERIALIZED (
  SELECT doc_id, g
  FROM probe p LEFT JOIN positions ps ON ps.pos = p.pos
  GROUP BY doc_id, g
  HAVING count(ps.pos) = 7
),
scored AS (
  SELECT k.doc_id,
         count(*)   AS n_grams,
         count(c.g) AS n_cand,
         count(b.g) AS n_hits
  FROM keyed k
  LEFT JOIN cand  c ON c.doc_id = k.doc_id AND c.g = k.g
  LEFT JOIN bench b ON b.g = k.g
  GROUP BY k.doc_id
)
SELECT n.lang,
       count(*) AS n_docs,
       CAST(count(s.doc_id) AS BIGINT) AS n_scored,
       CAST(coalesce(sum(CASE WHEN s.n_hits * 1.0 / s.n_grams >= 0.5
                              THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_flagged,
       CAST(coalesce(sum(s.n_cand), 0) AS BIGINT) AS n_candidates,
       CAST(coalesce(sum(s.n_hits), 0) AS BIGINT) AS n_hits,
       CAST(coalesce(sum(s.n_cand - s.n_hits), 0) AS BIGINT) AS n_bloom_fp,
       round(avg(s.n_hits * 1.0 / s.n_grams), 6) AS avg_overlap
FROM norm n LEFT JOIN scored s USING (doc_id)
GROUP BY n.lang
ORDER BY n.lang
"""


def hll_distinct_report(spark, sf):
    """HyperLogLog distinct-gram cardinality per lang (X46,
    operators/hll.py) next to the exact count it approximates: the
    mergeable sketch a 100 TB corpus uses where exact countDistinct's
    shuffle (bytes ~ cardinality) is unaffordable — the HLL leg's shuffle
    is at most langs x 256 (bucket, max-rho) smallints regardless of how
    many grams exist, and duplicates are free (no distinct pass; max is
    idempotent). md5-derived bucket/rank + exact-decimal harmonic sums
    make the WHOLE estimate replayable in DuckDB, so the sketch itself
    sits behind the strict value-identity gate (unlike
    approx_count_distinct, which is fenced off it — operators/stats.py).
    The exact leg exists for the rel_err comparison column; production
    keeps only the sketch."""
    from .operators.hll import hll_estimate, hll_registers
    from .operators.decontaminate import _gram_key
    from .functions.ngram import word_ngrams

    d = _spread(t(spark, sf, "documents"))
    grams = d.select(
        "lang", F.explode(word_ngrams(F.col("text"), 4)).alias("_g")
    ).select("lang", _gram_key(F.col("_g")).alias("_gram"))
    exact = grams.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_gram_instances"),
        F.countDistinct("_gram").alias("n_exact"),
    )
    est = hll_estimate(hll_registers(grams, "_gram", ["lang"], b=8), ["lang"], b=8)
    ex = F.col("n_exact").cast("double")
    return (
        exact.join(est, "lang")
        .select(
            "lang",
            "n_gram_instances",
            "n_exact",
            "n_buckets_hit",
            _r(F.col("n_hll")).alias("n_hll"),
            F.when(F.col("n_exact") > 0, _r(F.abs(F.col("n_hll") - ex) / ex))
            .alias("rel_err"),
        )
        .orderBy("lang")
    )


# The HLL layer replayed exactly: md5 bucket/rank (operators/hll.py
# _sql_bucket/_sql_rho twins), integer 2^(62-rho) register terms summed as
# DECIMAL(38,0) (the 256-register sum passes BIGINT), and the final
# harmonic/linear-counting arithmetic written operand-for-operand as the
# Spark expression with every literal cast to DOUBLE (DuckDB parses bare
# decimal literals as DECIMAL, whose division rules differ from IEEE).
ORACLE_HLL_DISTINCT_REPORT = r"""
WITH norm AS (
  SELECT doc_id, lang,
         coalesce(trim(regexp_replace(regexp_replace(lower(text), '[^\p{L} ]+', ' ', 'g'),
                                      '\s+', ' ', 'g')), '') AS t
  FROM documents
),
toks AS (
  SELECT doc_id, lang, string_split(t, ' ') AS w FROM norm WHERE length(t) > 0
),
grams AS MATERIALIZED (
  SELECT lang,
         substr(md5(array_to_string(w[CAST(i AS INT):CAST(i + 3 AS INT)], ' ')), 1, 16) AS g
  FROM toks, UNNEST(range(1, len(w) - 2)) AS u(i)
  WHERE len(w) >= 4
),
exact AS (
  SELECT lang,
         CAST(count(*) AS BIGINT) AS n_gram_instances,
         CAST(count(DISTINCT g) AS BIGINT) AS n_exact
  FROM grams GROUP BY lang
),
regs AS (
  SELECT lang,
         ('0x' || substr(md5(g), 1, 15))::BIGINT % 256 AS b,
         max(CASE WHEN length(ltrim(substr(md5('r:' || g), 1, 15), '0')) = 0 THEN 61
             ELSE (15 - length(ltrim(substr(md5('r:' || g), 1, 15), '0'))) * 4
                  + CASE substr(ltrim(substr(md5('r:' || g), 1, 15), '0'), 1, 1)
                      WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
                      WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1 WHEN '7' THEN 1
                      ELSE 0 END + 1 END) AS r
  FROM grams GROUP BY lang, b
),
hll AS (
  SELECT lang,
         count(*) AS nreg,
         CAST(sum(CAST(1::BIGINT << (62 - r) AS DECIMAL(38,0)))
              + CAST(256 - count(*) AS DECIMAL(38,0))
                * CAST(4611686018427387904 AS DECIMAL(38,0)) AS DOUBLE) AS s
  FROM regs GROUP BY lang
),
fin AS (
  SELECT lang, nreg,
         CASE WHEN 0.7213::DOUBLE / (1.0::DOUBLE + 1.079::DOUBLE / 256.0::DOUBLE)
                   * 256.0::DOUBLE * 256.0::DOUBLE * 4611686018427387904.0::DOUBLE / s
                   <= 2.5::DOUBLE * 256.0::DOUBLE
                AND 256 - nreg > 0
              THEN 256.0::DOUBLE * ln(256.0::DOUBLE / CAST(256 - nreg AS DOUBLE))
              ELSE 0.7213::DOUBLE / (1.0::DOUBLE + 1.079::DOUBLE / 256.0::DOUBLE)
                   * 256.0::DOUBLE * 256.0::DOUBLE * 4611686018427387904.0::DOUBLE / s
              END AS est
  FROM hll
)
SELECT e.lang,
       e.n_gram_instances,
       e.n_exact,
       CAST(f.nreg AS BIGINT) AS n_buckets_hit,
       round(f.est, 6) AS n_hll,
       round(abs(f.est - CAST(e.n_exact AS DOUBLE))
             / CAST(e.n_exact AS DOUBLE), 6) AS rel_err
FROM exact e JOIN fin f USING (lang)
ORDER BY e.lang
"""


def cms_heavy_hitters_report(spark, sf):
    """Count-Min-sketch heavy hitters (X47, operators/cms.py): top-20
    tokens by SKETCH-estimated frequency next to their exact counts and
    the per-key overestimate. The sketch is a d=4 x w=1024 cell frame —
    config-bounded, built by one map-side-combined sum over the instance
    stream (the corpus never shuffles keys) — collected once and probed
    as a pure least-of-element_at expression: the estimate leg has NO
    join at all. Counts are integer sums, so the whole sketch replays
    exactly in DuckDB with no rounding anywhere. The exact leg exists for
    the overest comparison column; production keeps only the sketch.
    Total order (n_cms desc, tok asc) makes the LIMIT deterministic."""
    from .operators.cms import cms_estimate, cms_sketch, collect_cms
    from .functions.ngram import word_tokens

    d = _spread(t(spark, sf, "documents"))
    toks = d.select(F.explode(word_tokens(F.col("text"))).alias("tok"))
    cells = collect_cms(cms_sketch(toks, "tok"))
    return (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("n_exact"))
        .select(
            "tok",
            "n_exact",
            cms_estimate(F.col("tok"), cells).cast("long").alias("n_cms"),
        )
        .withColumn("overest", (F.col("n_cms") - F.col("n_exact")).cast("long"))
        .orderBy(F.desc("n_cms"), "tok")
        .limit(20)
    )


# The sketch replayed cell-for-cell: md5 positions (operators/cms.py
# cms_position twin), integer instance counts per (row, pos), min over the
# d probed cells — every value an exact integer, nothing rounded.
ORACLE_CMS_HEAVY_HITTERS = r"""
WITH norm AS (
  SELECT doc_id,
         coalesce(trim(regexp_replace(regexp_replace(lower(text), '[^\p{L} ]+', ' ', 'g'),
                                      '\s+', ' ', 'g')), '') AS t
  FROM documents
),
inst AS MATERIALIZED (
  SELECT tok FROM norm, UNNEST(string_split(t, ' ')) AS u(tok)
  WHERE length(t) > 0
),
cells AS MATERIALIZED (
  SELECT j,
         ('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || tok), 1, 15))::BIGINT % 1024 AS pos,
         count(*) AS cnt
  FROM inst, UNNEST(range(4)) AS s(j)
  GROUP BY j, pos
),
exact AS MATERIALIZED (
  SELECT tok, CAST(count(*) AS BIGINT) AS n_exact FROM inst GROUP BY tok
),
probe AS (
  SELECT e.tok, j,
         ('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || e.tok), 1, 15))::BIGINT % 1024 AS pos
  FROM exact e, UNNEST(range(4)) AS s(j)
),
est AS (
  SELECT p.tok, CAST(min(c.cnt) AS BIGINT) AS n_cms
  FROM probe p JOIN cells c ON c.j = p.j AND c.pos = p.pos
  GROUP BY p.tok
)
SELECT e.tok, e.n_exact, s.n_cms, s.n_cms - e.n_exact AS overest
FROM exact e JOIN est s USING (tok)
ORDER BY s.n_cms DESC, e.tok
LIMIT 20
"""

_BM25_TERMS = ["hash", "join", "stream", "vector"]


def bm25_search_report(spark, sf):
    """Okapi BM25 top-10 retrieval (X48, operators/bm25.py) for a fixed
    4-term query over the corpus: per-term tf and dl are IN-ROW
    expressions (no explode, no join anywhere — the only exchanges are a
    1-row stats agg and the TakeOrdered top-k), corpus statistics (N,
    total_dl, per-term df) come from ONE map-side-combined agg embedded
    back as int literals, and per-term float scores add in fixed written
    order so DuckDB replays the doubles bit-for-bit. Ordered by the
    ROUNDED score with a doc_id tiebreak — total, engine-stable."""
    from .operators.bm25 import bm25_scored

    d = _spread(t(spark, sf, "documents"))
    scored = bm25_scored(d, "text", "doc_id", _BM25_TERMS, keep_cols=["lang"])
    return (
        scored.select(
            "doc_id",
            "lang",
            "dl",
            "n_terms_matched",
            _r(F.col("_bm25")).alias("bm25"),
        )
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(10)
    )


def _oracle_bm25() -> str:
    """BM25 replayed operand-for-operand: same idf/tf/length-norm formula
    with every literal spelled identically (2.2 stays 2.2, never k1+1)
    and every intermediate cast to DOUBLE (DuckDB bare decimal literals
    are DECIMAL, whose arithmetic differs from IEEE)."""
    tfs = ",\n         ".join(
        f"coalesce(len(list_filter(tk.w, x -> x = '{t}')), 0) AS tf{i}"
        for i, t in enumerate(_BM25_TERMS)
    )
    dfs = ",\n         ".join(
        f"sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(len(_BM25_TERMS))
    )
    matched = " + ".join(
        f"(CASE WHEN b.tf{i} > 0 THEN 1 ELSE 0 END)"
        for i in range(len(_BM25_TERMS))
    )
    terms = "\n         + ".join(
        f"ln((CAST(s.n - s.df{i} AS DOUBLE) + 0.5::DOUBLE)"
        f" / (CAST(s.df{i} AS DOUBLE) + 0.5::DOUBLE) + 1.0::DOUBLE)"
        f" * (CAST(b.tf{i} AS DOUBLE) * 2.2::DOUBLE)"
        f" / (CAST(b.tf{i} AS DOUBLE) + 1.2::DOUBLE * (0.25::DOUBLE"
        f" + 0.75::DOUBLE * (CAST(b.dl AS DOUBLE)"
        f" / (CAST(s.tot AS DOUBLE) / CAST(s.n AS DOUBLE)))))"
        for i in range(len(_BM25_TERMS))
    )
    return rf"""
WITH norm AS (
  SELECT doc_id, lang,
         coalesce(trim(regexp_replace(regexp_replace(lower(text), '[^\p{{L}} ]+', ' ', 'g'),
                                      '\s+', ' ', 'g')), '') AS t
  FROM documents
),
toks AS (
  SELECT doc_id, string_split(t, ' ') AS w FROM norm WHERE length(t) > 0
),
base AS MATERIALIZED (
  SELECT n.doc_id, n.lang,
         coalesce(len(tk.w), 0) AS dl,
         {tfs}
  FROM norm n LEFT JOIN toks tk USING (doc_id)
),
stats AS (
  SELECT count(*) AS n, sum(dl) AS tot,
         {dfs}
  FROM base
),
scored AS (
  SELECT b.doc_id, b.lang,
         CAST(b.dl AS BIGINT) AS dl,
         CAST({matched} AS BIGINT) AS n_terms_matched,
         {terms} AS raw
  FROM base b, stats s
)
SELECT doc_id, lang, dl, n_terms_matched, round(raw, 6) AS bm25
FROM scored
ORDER BY round(raw, 6) DESC, doc_id
LIMIT 10
"""


def kn_perplexity_report(spark, sf):
    """Interpolated Kneser-Ney bigram LM trained in-engine, scoring its
    own training corpus (the X33/CCNet pattern), reported per lang (X51,
    operators/knlm.py): n_docs, total_bigrams, mean/min/max perplexity.
    Every count is exact; per-bigram-type log10 probabilities are nano
    BIGINTs so per-doc sums are order-independent; the per-lang mean uses
    the exact-cents half-up integral division recipe. Docs with < 2
    tokens have no bigrams and drop out (X13's NULL class)."""
    from .operators.knlm import kn_doc_scores, train_kn_bigram

    d = _spread(t(spark, sf, "documents"))
    lm = train_kn_bigram(d)
    scores = kn_doc_scores(d, lm)
    cents = F.sum(F.round(F.col("ppl") * 100).cast("long"))
    n = F.count(F.lit(1))
    return (
        scores.groupBy("lang")
        .agg(
            n.cast("long").alias("n_docs"),
            F.sum("n_bigrams").cast("long").alias("total_bigrams"),
            (
                F.expr("div(200 * sum(cast(round(ppl * 100) as long)) "
                       "+ count(1), 2 * count(1))") / 10000.0
            ).alias("mean_ppl"),
            F.min("ppl").alias("min_ppl"),
            F.max("ppl").alias("max_ppl"),
        )
        .orderBy("lang")
    )


# KN replayed exactly: the same type frame + window statistics, the
# probability spelled in the same association with every literal cast to
# DOUBLE, nano-quantized per-type log10, exact BIGINT per-doc sums, and
# the cents half-up integral mean (Spark div ≡ DuckDB //).
ORACLE_KN_PERPLEXITY_REPORT = r"""
WITH norm AS (
  SELECT doc_id, lang,
         coalesce(trim(regexp_replace(regexp_replace(lower(text), '[^\p{L} ]+', ' ', 'g'),
                                      '\s+', ' ', 'g')), '') AS t
  FROM documents
),
toks AS (
  SELECT doc_id, lang, string_split(t, ' ') AS w FROM norm WHERE length(t) > 0
),
inst AS MATERIALIZED (
  SELECT lang, doc_id, w[CAST(i AS INT)] AS v, w[CAST(i AS INT) + 1] AS w2
  FROM toks, UNNEST(range(1, len(w))) AS s(i)
),
types AS MATERIALIZED (
  SELECT lang, v, w2, CAST(count(*) AS BIGINT) AS c_vw
  FROM inst GROUP BY lang, v, w2
),
enriched AS (
  SELECT lang, v, w2, c_vw,
         CAST(sum(c_vw) OVER (PARTITION BY lang, v) AS BIGINT) AS c_v,
         CAST(count(*) OVER (PARTITION BY lang, v) AS BIGINT) AS n1p_v,
         CAST(count(*) OVER (PARTITION BY lang, w2) AS BIGINT) AS n1ctx_w,
         CAST(count(*) OVER (PARTITION BY lang) AS BIGINT) AS n_types
  FROM types
),
lm AS MATERIALIZED (
  SELECT lang, v, w2,
         CAST(round(log10(
             (greatest(CAST(c_vw AS DOUBLE) - 0.75::DOUBLE, 0.0::DOUBLE)
              / CAST(c_v AS DOUBLE))
             + ((0.75::DOUBLE * CAST(n1p_v AS DOUBLE) / CAST(c_v AS DOUBLE))
                * (CAST(n1ctx_w AS DOUBLE) / CAST(n_types AS DOUBLE)))
         ) * 1e9) AS BIGINT) AS nano_logp
  FROM enriched
),
docs AS (
  SELECT i.lang, i.doc_id,
         CAST(count(*) AS BIGINT) AS n_bigrams,
         CAST(sum(m.nano_logp) AS BIGINT) AS s_nano
  FROM inst i JOIN lm m ON m.lang = i.lang AND m.v = i.v AND m.w2 = i.w2
  GROUP BY i.lang, i.doc_id
),
scored AS (
  SELECT lang, doc_id, n_bigrams,
         round(power(10.0::DOUBLE,
                     -(CAST(s_nano AS DOUBLE) / 1e9) / CAST(n_bigrams AS DOUBLE)),
               2) AS ppl
  FROM docs
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_bigrams) AS BIGINT) AS total_bigrams,
       ((200 * CAST(sum(CAST(round(ppl * 100) AS BIGINT)) AS BIGINT)
         + count(*)) // (2 * count(*))) / 10000.0 AS mean_ppl,
       min(ppl) AS min_ppl,
       max(ppl) AS max_ppl
FROM scored
GROUP BY lang
ORDER BY lang
"""


def snapshot_diff_report(spark, sf):
    """Corpus snapshot diff (X52, operators/diff.py): snapshot B is
    derived deterministically from the documents table (doc_id % 7 == 0
    removed; % 5 == 0 of the survivors edited; % 11 == 0 re-added under
    shifted ids), then ONE full-outer join + fingerprint compare
    classifies every key. Output: per-status counts + key ranges —
    the CDC summary an incremental crawl pass starts from."""
    from .operators.diff import snapshot_diff

    a = t(spark, sf, "documents")
    did = F.col("doc_id")
    b_kept = a.filter(did % 7 != 0).withColumn(
        "text",
        F.when(did % 5 == 0, F.concat(F.col("text"), F.lit(" v2"))).otherwise(
            F.col("text")
        ),
    )
    b_new = a.filter(did % 11 == 0).select(
        (did + 1000000).alias("doc_id"),
        F.concat(F.lit("new "), F.col("text")).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    b = b_kept.unionByName(b_new)
    diff = snapshot_diff(a, b, "doc_id", ["text", "lang", "source"])
    return (
        diff.groupBy("status")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("doc_id").alias("min_key"),
            F.max("doc_id").alias("max_key"),
        )
        .orderBy("status")
    )


# The diff replayed exactly: the same derived snapshot B, the same
# null-tagged fingerprint encoding (chr(2)||value / chr(1) for NULL,
# chr(31) separators), one FULL OUTER join, the same status CASE.
ORACLE_SNAPSHOT_DIFF_REPORT = r"""
WITH a AS (
  SELECT doc_id, text, lang, source FROM documents
),
b AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END AS text,
         lang, source
  FROM documents WHERE doc_id % 7 <> 0
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, 'new ' || text AS text, lang, source
  FROM documents WHERE doc_id % 11 = 0
),
fa AS (
  SELECT doc_id,
         md5(concat(
           CASE WHEN text IS NULL THEN chr(1) ELSE chr(2) || CAST(text AS VARCHAR) END,
           chr(31),
           CASE WHEN lang IS NULL THEN chr(1) ELSE chr(2) || CAST(lang AS VARCHAR) END,
           chr(31),
           CASE WHEN source IS NULL THEN chr(1) ELSE chr(2) || CAST(source AS VARCHAR) END
         )) AS fp_a
  FROM a
),
fb AS (
  SELECT doc_id,
         md5(concat(
           CASE WHEN text IS NULL THEN chr(1) ELSE chr(2) || CAST(text AS VARCHAR) END,
           chr(31),
           CASE WHEN lang IS NULL THEN chr(1) ELSE chr(2) || CAST(lang AS VARCHAR) END,
           chr(31),
           CASE WHEN source IS NULL THEN chr(1) ELSE chr(2) || CAST(source AS VARCHAR) END
         )) AS fp_b
  FROM b
),
j AS (
  SELECT coalesce(fa.doc_id, fb.doc_id) AS doc_id,
         CASE WHEN fa.fp_a IS NULL THEN 'added'
              WHEN fb.fp_b IS NULL THEN 'removed'
              WHEN fa.fp_a = fb.fp_b THEN 'unchanged'
              ELSE 'changed' END AS status
  FROM fa FULL OUTER JOIN fb ON fa.doc_id = fb.doc_id
)
SELECT status,
       CAST(count(*) AS BIGINT) AS n,
       min(doc_id) AS min_key,
       max(doc_id) AS max_key
FROM j GROUP BY status
ORDER BY status
"""


def pagerank_report(spark, sf):
    """PageRank link-graph centrality (X53, operators/pagerank.py): a
    deterministic link graph is synthesised in-row from the documents
    table (doc_id % 4 out-links each, targets md5-derived over the
    dense 0..N-1 id space, self-loops dropped — so ~1/4 of nodes are
    dangling and exercise the redistribution path), then 5 exact
    integer nano-rank power iterations. Output: the top-20 nodes by
    final rank with their degrees — the fetch-frontier /
    sampling-weight head a crawl pipeline consumes."""
    from .operators.pagerank import pagerank

    docs = t(spark, sf, "documents")
    n = docs.count()  # 1-row query vector; doc_ids dense 0..n-1 (TESTDATA)
    did = F.col("doc_id")
    gen = docs.filter(did % 4 != 0).select(
        did.alias("src"),
        F.explode(F.sequence(F.lit(1), (did % 4).cast("int"))).alias("j"),
    )
    raw = gen.select(
        "src",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("src").cast("string"),
                            F.lit(":"),
                            F.col("j").cast("string"),
                        )
                    ),
                    1,
                    6,
                ),
                16,
                10,
            ).cast("long")
            % n
        ).alias("dst"),
    )
    edges = raw.filter(F.col("dst") != F.col("src"))
    nodes = docs.select(F.col("doc_id").alias("node"))
    ranks = pagerank(nodes, edges, n_iters=5)
    outdeg = edges.groupBy("src").agg(
        F.count(F.lit(1)).cast("long").alias("o")
    )
    indeg = edges.groupBy("dst").agg(
        F.count(F.lit(1)).cast("long").alias("i")
    )
    return (
        ranks.join(outdeg, ranks["node"] == outdeg["src"], "left")
        .join(indeg, ranks["node"] == indeg["dst"], "left")
        .select(
            "node",
            "rank_nano",
            F.coalesce(F.col("o"), F.lit(0)).cast("long").alias("out_deg"),
            F.coalesce(F.col("i"), F.lit(0)).cast("long").alias("in_deg"),
        )
        .orderBy(F.desc("rank_nano"), "node")
        .limit(20)
    )


def _pagerank_oracle(n_iters: int = 5) -> str:
    """The whole trajectory replayed: the same md5-derived edges, then
    every power iteration unrolled as MATERIALIZED CTEs (the X36/X41
    discipline) — contributions r // o, map-side-sum incoming mass,
    dangling mass redistributed div N, the exact integer damping step.
    All-BIGINT arithmetic, so the hash covers all 5 iterations."""
    parts = [
        "WITH nn AS MATERIALIZED (",
        "  SELECT CAST(count(*) AS BIGINT) AS n FROM documents",
        "),",
        "gen AS MATERIALIZED (",
        "  SELECT doc_id AS src,",
        "         unnest(generate_series(1, CAST(doc_id % 4 AS BIGINT))) AS j",
        "  FROM documents WHERE doc_id % 4 <> 0",
        "),",
        "ed AS MATERIALIZED (",
        "  SELECT src, dst FROM (",
        "    SELECT src,",
        "           ('0x' || substr(md5(CAST(src AS VARCHAR) || ':' ||",
        "             CAST(j AS VARCHAR)), 1, 6))::BIGINT",
        "             % (SELECT n FROM nn) AS dst",
        "    FROM gen",
        "  ) WHERE dst <> src",
        "),",
        "od AS MATERIALIZED (",
        "  SELECT src, CAST(count(*) AS BIGINT) AS o FROM ed GROUP BY src",
        "),",
        "r0 AS MATERIALIZED (",
        "  SELECT doc_id AS node, CAST(1000000000 AS BIGINT) AS r",
        "  FROM documents",
        "),",
    ]
    for it in range(1, n_iters + 1):
        p = it - 1
        parts += [
            f"i{it} AS MATERIALIZED (",
            f"  SELECT e.dst, CAST(sum(r.r // o.o) AS BIGINT) AS inc",
            f"  FROM ed e JOIN r{p} r ON e.src = r.node",
            f"  JOIN od o ON e.src = o.src",
            f"  GROUP BY e.dst",
            f"),",
            f"g{it} AS MATERIALIZED (",
            f"  SELECT CAST(coalesce(sum(r), 0) AS BIGINT) AS dang",
            f"  FROM r{p} WHERE node NOT IN (SELECT src FROM od)",
            f"),",
            f"r{it} AS MATERIALIZED (",
            f"  SELECT d.doc_id AS node,",
            f"         CAST(150000000 + (85 * (coalesce(i.inc, 0)",
            f"           + (SELECT dang FROM g{it}) // (SELECT n FROM nn)))",
            f"           // 100 AS BIGINT) AS r",
            f"  FROM documents d LEFT JOIN i{it} i ON d.doc_id = i.dst",
            f"),",
        ]
    parts += [
        "ideg AS MATERIALIZED (",
        "  SELECT dst, CAST(count(*) AS BIGINT) AS i FROM ed GROUP BY dst",
        ")",
        f"SELECT r.node, r.r AS rank_nano,",
        "       CAST(coalesce(o.o, 0) AS BIGINT) AS out_deg,",
        "       CAST(coalesce(i.i, 0) AS BIGINT) AS in_deg",
        f"FROM r{n_iters} r",
        "LEFT JOIN od o ON r.node = o.src",
        "LEFT JOIN ideg i ON r.node = i.dst",
        "ORDER BY rank_nano DESC, node LIMIT 20",
    ]
    return "\n".join(parts)


ORACLE_PAGERANK_REPORT = _pagerank_oracle()


def incremental_dedup_report(spark, sf):
    """Incremental LSH index maintenance (X54, operators/lshindex.py):
    snapshot B is derived from the documents table (the X52 derivation —
    %7 removed, %5 of survivors edited, %11 re-added under shifted ids),
    the X52 diff yields the delta, and the near-dup band index built
    over A is updated INCREMENTALLY (drop removed/changed ids, insert
    added/changed docs — only the delta is scanned) before the
    added/changed documents probe it for near-dup matches. Spark runs
    the incremental algebra; the DuckDB oracle implements REBUILD
    semantics directly (index == build(B)), so a hash match proves
    update(build(A), diff(A,B)) == build(B), not just a transcription.
    Output: every (query, index) match at est_jaccard >= 0.5, totally
    ordered."""
    from .operators.diff import snapshot_diff
    from .operators.lshindex import (
        lsh_index_build,
        lsh_index_probe,
        lsh_index_update,
    )

    a = t(spark, sf, "documents")
    did = F.col("doc_id")
    b_kept = a.filter(did % 7 != 0).withColumn(
        "text",
        F.when(did % 5 == 0, F.concat(F.col("text"), F.lit(" v2"))).otherwise(
            F.col("text")
        ),
    )
    b_new = a.filter(did % 11 == 0).select(
        (did + 1000000).alias("doc_id"),
        F.concat(F.lit("new "), F.col("text")).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    b = b_kept.unionByName(b_new)
    d = snapshot_diff(a, b, "doc_id", ["text"])
    drop_ids = d.filter(F.col("status").isin("removed", "changed")).select(
        "doc_id"
    )
    up_ids = d.filter(F.col("status").isin("added", "changed")).select(
        "doc_id"
    )
    upserts = b.join(F.broadcast(up_ids), "doc_id")
    index0, sigs0 = lsh_index_build(a, "text", "doc_id")
    index1, sigs1 = lsh_index_update(
        index0, sigs0, drop_ids, upserts, "text", "doc_id"
    )
    pairs = lsh_index_probe(index1, sigs1, upserts, "text", "doc_id")
    return pairs.select(
        "query_id",
        "index_id",
        F.round("est_jaccard", 6).alias("est_jaccard"),
    ).orderBy("query_id", "index_id")


# REBUILD semantics, independently: signatures/bands over the WHOLE derived
# snapshot B (never the incremental path), delta keys by direct text
# comparison, the same index-census bucket guard, agreement verify. A hash
# match against Spark's incremental run proves the maintenance invariant.
ORACLE_INCREMENTAL_DEDUP_REPORT = r"""
WITH b AS MATERIALIZED (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END AS text
  FROM documents WHERE doc_id % 7 <> 0
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, 'new ' || text AS text
  FROM documents WHERE doc_id % 11 = 0
),
qids AS MATERIALIZED (
  SELECT b.doc_id FROM b LEFT JOIN documents a ON a.doc_id = b.doc_id
  WHERE a.doc_id IS NULL OR a.text <> b.text
),
d AS (SELECT doc_id, text FROM b WHERE length(text) >= 5),
sh AS MATERIALIZED (
  SELECT doc_id, substr(text, CAST(i AS INT), 5) AS sh
  FROM d, UNNEST(range(1, length(text) - 3)) AS t(i)
),
seeds AS (SELECT UNNEST(range(0, 16)) AS seed),
mh AS MATERIALIZED (
  SELECT doc_id, seed, min(md5(CAST(seed AS VARCHAR) || ':' || sh)) AS h
  FROM sh CROSS JOIN seeds
  GROUP BY doc_id, seed
),
bandkeys AS MATERIALIZED (
  SELECT doc_id, seed // 4 AS band,
         md5(string_agg(h, '|' ORDER BY seed)) AS bkey
  FROM mh GROUP BY doc_id, seed // 4
),
good AS MATERIALIZED (
  SELECT bk.* FROM bandkeys bk
  JOIN (SELECT band, bkey, count(*) AS bn FROM bandkeys GROUP BY 1, 2) s
    ON s.band = bk.band AND s.bkey = bk.bkey
  WHERE s.bn <= 200
),
cand AS (
  SELECT DISTINCT q.doc_id AS query_id, i.doc_id AS index_id
  FROM good q
  JOIN good i ON i.band = q.band AND i.bkey = q.bkey
  JOIN qids ON qids.doc_id = q.doc_id
  WHERE i.doc_id <> q.doc_id
),
agree AS (
  SELECT c.query_id, c.index_id,
         sum(CASE WHEN mq.h = mi.h THEN 1 ELSE 0 END) AS n_agree
  FROM cand c
  JOIN mh mq ON mq.doc_id = c.query_id
  JOIN mh mi ON mi.doc_id = c.index_id AND mi.seed = mq.seed
  GROUP BY 1, 2
)
SELECT query_id, index_id, round(n_agree / 16.0, 6) AS est_jaccard
FROM agree WHERE n_agree / 16.0 >= 0.5
ORDER BY query_id, index_id
"""


def triangle_count_report(spark, sf):
    """Degree-oriented triangle counting (X55, operators/triangles.py):
    the synthetic link graph is the PageRank report's md5-derived edges
    PLUS a deterministic ring lattice (i -> i+1, i -> i+2 mod N), which
    plants one triangle per consecutive node triple — so local density
    is guaranteed non-trivial and the hash edges differentiate the head.
    Output: top-15 nodes by triangles-through (the link-ring / spam-farm
    density head), totally ordered."""
    from .operators.triangles import node_triangle_counts

    docs = t(spark, sf, "documents")
    n = docs.count()  # 1-row query vector; doc_ids dense 0..n-1 (TESTDATA)
    did = F.col("doc_id")
    gen = docs.filter(did % 4 != 0).select(
        did.alias("src"),
        F.explode(F.sequence(F.lit(1), (did % 4).cast("int"))).alias("j"),
    )
    hash_e = gen.select(
        "src",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("src").cast("string"),
                            F.lit(":"),
                            F.col("j").cast("string"),
                        )
                    ),
                    1,
                    6,
                ),
                16,
                10,
            ).cast("long")
            % n
        ).alias("dst"),
    )
    ring = docs.select(did.alias("src"), ((did + 1) % n).alias("dst")).unionAll(
        docs.select(did.alias("src"), ((did + 2) % n).alias("dst"))
    )
    counts = node_triangle_counts(hash_e.unionAll(ring))
    return counts.orderBy(F.desc("n_tri"), "node").limit(15)


# The same graph and the same orientation replayed: distinct canonical
# edges, degree census, rank = deg * 2^32 + id, wedges from the low
# corner only, closing-edge join — every triangle counted exactly once.
ORACLE_TRIANGLE_COUNT_REPORT = r"""
WITH nn AS MATERIALIZED (
  SELECT CAST(count(*) AS BIGINT) AS n FROM documents
),
gen AS (
  SELECT doc_id AS src,
         unnest(generate_series(1, CAST(doc_id % 4 AS BIGINT))) AS j
  FROM documents WHERE doc_id % 4 <> 0
),
alledges AS MATERIALIZED (
  SELECT src,
         ('0x' || substr(md5(CAST(src AS VARCHAR) || ':' ||
           CAST(j AS VARCHAR)), 1, 6))::BIGINT
           % (SELECT n FROM nn) AS dst
  FROM gen
  UNION ALL
  SELECT doc_id AS src, (doc_id + 1) % (SELECT n FROM nn) AS dst
  FROM documents
  UNION ALL
  SELECT doc_id AS src, (doc_id + 2) % (SELECT n FROM nn) AS dst
  FROM documents
),
und AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM alledges WHERE src <> dst
),
deg AS MATERIALIZED (
  SELECT nd, CAST(count(*) AS BIGINT) AS d
  FROM (SELECT a AS nd FROM und UNION ALL SELECT b AS nd FROM und)
  GROUP BY nd
),
o AS MATERIALIZED (
  SELECT CASE WHEN ra < rb THEN a ELSE b END AS u,
         CASE WHEN ra < rb THEN b ELSE a END AS v,
         CASE WHEN ra < rb THEN rb ELSE ra END AS rank_v
  FROM (
    SELECT und.a, und.b,
           da.d * 4294967296 + und.a AS ra,
           db.d * 4294967296 + und.b AS rb
    FROM und
    JOIN deg da ON da.nd = und.a
    JOIN deg db ON db.nd = und.b
  )
),
tri AS MATERIALIZED (
  SELECT w.u AS x, w.y, w.z
  FROM (
    SELECT e1.u, e1.v AS y, e2.v AS z
    FROM o e1 JOIN o e2 ON e1.u = e2.u AND e1.rank_v < e2.rank_v
  ) w
  JOIN o c ON c.u = w.y AND c.v = w.z
),
corners AS (
  SELECT x AS node FROM tri
  UNION ALL SELECT y AS node FROM tri
  UNION ALL SELECT z AS node FROM tri
)
SELECT node, CAST(count(*) AS BIGINT) AS n_tri
FROM corners GROUP BY node
ORDER BY n_tri DESC, node LIMIT 15
"""


def trustrank_report(spark, sf):
    """TrustRank (X59, operators/pagerank.py trustrank): personalized
    PageRank from the deterministic trusted seed set doc_id % 50 == 0
    over the same md5-derived link graph — the published spam-demotion
    pass (trust starves link neighborhoods unreachable from vetted
    hosts). Top-15 by trust with seed membership, totally ordered."""
    from .operators.pagerank import trustrank

    docs = t(spark, sf, "documents")
    n = docs.count()  # 1-row query vector; doc_ids dense 0..n-1 (TESTDATA)
    did = F.col("doc_id")
    gen = docs.filter(did % 4 != 0).select(
        did.alias("src"),
        F.explode(F.sequence(F.lit(1), (did % 4).cast("int"))).alias("j"),
    )
    edges = gen.select(
        "src",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("src").cast("string"),
                            F.lit(":"),
                            F.col("j").cast("string"),
                        )
                    ),
                    1,
                    6,
                ),
                16,
                10,
            ).cast("long")
            % n
        ).alias("dst"),
    ).filter(F.col("dst") != F.col("src"))
    nodes = docs.select(F.col("doc_id").alias("node"))
    seeds = docs.filter(did % 50 == 0).select(F.col("doc_id").alias("node"))
    tr = trustrank(nodes, edges, seeds, n_iters=5)
    return (
        tr.withColumn(
            "is_seed", (F.col("node") % 50 == 0).cast("int")
        )
        .orderBy(F.desc("trust_nano"), "node")
        .limit(15)
    )


def _trustrank_oracle(n_iters: int = 5) -> str:
    """Seed-personalized teleport + seeds-only dangling return, all 5
    iterations unrolled — the pagerank oracle with the trust vector."""
    parts = [
        "WITH nn AS MATERIALIZED (",
        "  SELECT CAST(count(*) AS BIGINT) AS n FROM documents",
        "),",
        "ns AS MATERIALIZED (",
        "  SELECT CAST(count(*) AS BIGINT) AS n FROM documents",
        "  WHERE doc_id % 50 = 0",
        "),",
        "gen AS MATERIALIZED (",
        "  SELECT doc_id AS src,",
        "         unnest(generate_series(1, CAST(doc_id % 4 AS BIGINT))) AS j",
        "  FROM documents WHERE doc_id % 4 <> 0",
        "),",
        "ed AS MATERIALIZED (",
        "  SELECT src, dst FROM (",
        "    SELECT src,",
        "           ('0x' || substr(md5(CAST(src AS VARCHAR) || ':' ||",
        "             CAST(j AS VARCHAR)), 1, 6))::BIGINT",
        "             % (SELECT n FROM nn) AS dst",
        "    FROM gen",
        "  ) WHERE dst <> src",
        "),",
        "od AS MATERIALIZED (",
        "  SELECT src, CAST(count(*) AS BIGINT) AS o FROM ed GROUP BY src",
        "),",
        "r0 AS MATERIALIZED (",
        "  SELECT doc_id AS node,",
        "         CAST(CASE WHEN doc_id % 50 = 0",
        "           THEN 1000000000 // (SELECT n FROM ns) ELSE 0 END",
        "           AS BIGINT) AS r",
        "  FROM documents",
        "),",
    ]
    for it in range(1, n_iters + 1):
        p = it - 1
        parts += [
            f"i{it} AS MATERIALIZED (",
            f"  SELECT e.dst, CAST(sum(r.r // o.o) AS BIGINT) AS inc",
            f"  FROM ed e JOIN r{p} r ON e.src = r.node",
            f"  JOIN od o ON e.src = o.src",
            f"  GROUP BY e.dst",
            f"),",
            f"g{it} AS MATERIALIZED (",
            f"  SELECT CAST(coalesce(sum(r), 0) AS BIGINT) AS dang",
            f"  FROM r{p} WHERE node NOT IN (SELECT src FROM od)",
            f"),",
            f"r{it} AS MATERIALIZED (",
            f"  SELECT d.doc_id AS node,",
            f"         CAST(CASE WHEN d.doc_id % 50 = 0",
            f"             THEN 15000000000 // (100 * (SELECT n FROM ns))",
            f"             ELSE 0 END",
            f"           + (85 * (coalesce(i.inc, 0)",
            f"             + CASE WHEN d.doc_id % 50 = 0",
            f"               THEN (SELECT dang FROM g{it})",
            f"                 // (SELECT n FROM ns)",
            f"               ELSE 0 END))",
            f"           // 100 AS BIGINT) AS r",
            f"  FROM documents d LEFT JOIN i{it} i ON d.doc_id = i.dst",
            f"),",
        ]
    parts += [
        "fin AS (",
        f"  SELECT node, r AS trust_nano,",
        "         CAST(CASE WHEN node % 50 = 0 THEN 1 ELSE 0 END AS INT)"
        " AS is_seed",
        f"  FROM r{n_iters}",
        ")",
        "SELECT node, trust_nano, is_seed FROM fin",
        "ORDER BY trust_nano DESC, node LIMIT 15",
    ]
    return "\n".join(parts)


ORACLE_TRUSTRANK_REPORT = _trustrank_oracle()


def hits_report(spark, sf):
    """HITS hubs & authorities (X58, operators/hits.py) over the same
    md5-derived deterministic link graph as the PageRank report: 4 exact
    max-normalized iterations in micro fixed-point; top-15 by authority
    (the endorsed-content head; the hub column separates directory-style
    nodes), totally ordered."""
    from .operators.hits import hits

    docs = t(spark, sf, "documents")
    n = docs.count()  # 1-row query vector; doc_ids dense 0..n-1 (TESTDATA)
    did = F.col("doc_id")
    gen = docs.filter(did % 4 != 0).select(
        did.alias("src"),
        F.explode(F.sequence(F.lit(1), (did % 4).cast("int"))).alias("j"),
    )
    edges = gen.select(
        "src",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("src").cast("string"),
                            F.lit(":"),
                            F.col("j").cast("string"),
                        )
                    ),
                    1,
                    6,
                ),
                16,
                10,
            ).cast("long")
            % n
        ).alias("dst"),
    ).filter(F.col("dst") != F.col("src"))
    nodes = docs.select(F.col("doc_id").alias("node"))
    return (
        hits(nodes, edges, n_iters=4)
        .orderBy(F.desc("authority_micro"), "node")
        .limit(15)
    )


def _hits_oracle(n_iters: int = 4) -> str:
    """Every half-iteration unrolled: raw sums, the 1-row max, the exact
    micro-scaled division — all BIGINT, trajectory in the hash."""
    parts = [
        "WITH nn AS MATERIALIZED (",
        "  SELECT CAST(count(*) AS BIGINT) AS n FROM documents",
        "),",
        "gen AS MATERIALIZED (",
        "  SELECT doc_id AS src,",
        "         unnest(generate_series(1, CAST(doc_id % 4 AS BIGINT))) AS j",
        "  FROM documents WHERE doc_id % 4 <> 0",
        "),",
        "ed AS MATERIALIZED (",
        "  SELECT src, dst FROM (",
        "    SELECT src,",
        "           ('0x' || substr(md5(CAST(src AS VARCHAR) || ':' ||",
        "             CAST(j AS VARCHAR)), 1, 6))::BIGINT",
        "             % (SELECT n FROM nn) AS dst",
        "    FROM gen",
        "  ) WHERE dst <> src",
        "),",
        "h0 AS MATERIALIZED (",
        "  SELECT doc_id AS node, CAST(1000000 AS BIGINT) AS h FROM documents",
        "),",
    ]
    for it in range(1, n_iters + 1):
        p = it - 1
        parts += [
            f"ar{it} AS MATERIALIZED (",
            f"  SELECT e.dst, CAST(sum(h.h) AS BIGINT) AS raw",
            f"  FROM ed e JOIN h{p} h ON e.src = h.node GROUP BY e.dst",
            f"),",
            f"am{it} AS MATERIALIZED (",
            f"  SELECT greatest(CAST(max(raw) AS BIGINT), 1) AS m FROM ar{it}",
            f"),",
            f"a{it} AS MATERIALIZED (",
            f"  SELECT d.doc_id AS node,",
            f"         CAST(coalesce(r.raw, 0) * 1000000",
            f"           // (SELECT m FROM am{it}) AS BIGINT) AS a",
            f"  FROM documents d LEFT JOIN ar{it} r ON d.doc_id = r.dst",
            f"),",
            f"hr{it} AS MATERIALIZED (",
            f"  SELECT e.src, CAST(sum(a.a) AS BIGINT) AS raw",
            f"  FROM ed e JOIN a{it} a ON e.dst = a.node GROUP BY e.src",
            f"),",
            f"hm{it} AS MATERIALIZED (",
            f"  SELECT greatest(CAST(max(raw) AS BIGINT), 1) AS m FROM hr{it}",
            f"),",
            f"h{it} AS MATERIALIZED (",
            f"  SELECT d.doc_id AS node,",
            f"         CAST(coalesce(r.raw, 0) * 1000000",
            f"           // (SELECT m FROM hm{it}) AS BIGINT) AS h",
            f"  FROM documents d LEFT JOIN hr{it} r ON d.doc_id = r.src",
            f"),",
        ]
    parts += [
        "fin AS (",
        f"  SELECT a{n_iters}.node, a{n_iters}.a AS authority_micro,",
        f"         h{n_iters}.h AS hub_micro",
        f"  FROM a{n_iters} JOIN h{n_iters} ON h{n_iters}.node = a{n_iters}.node",
        ")",
        "SELECT node, authority_micro, hub_micro FROM fin",
        "ORDER BY authority_micro DESC, node LIMIT 15",
    ]
    return "\n".join(parts)


ORACLE_HITS_REPORT = _hits_oracle()


def chunking_report(spark, sf):
    """Passage chunking (X63, operators/chunking.py): the stride grid
    (window 24, stride 16 — consecutive chunks overlap by 8 tokens) over
    documents doc_id < 40, emitting per-chunk position, token count, and
    content fingerprint — the exact frame a retrieval/pretraining corpus
    build writes out. Totally ordered; row-local, shuffle-free."""
    from .operators.chunking import chunk_documents

    docs = t(spark, sf, "documents").filter(F.col("doc_id") < 40)
    ch = chunk_documents(docs, "text", "doc_id", window=24, stride=16)
    return ch.select(
        "doc_id",
        "chunk_idx",
        "start_tok",
        "n_tokens",
        F.md5("chunk_text").alias("chunk_md5"),
    ).orderBy("doc_id", "chunk_idx")


ORACLE_CHUNKING_REPORT = r"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS toks
  FROM documents WHERE doc_id < 40
),
g AS (
  SELECT doc_id, toks, len(toks) AS n,
         unnest(generate_series(0,
           CASE WHEN len(toks) > 24
                THEN (len(toks) - 24 + 16 - 1) // 16 ELSE 0 END)) AS ci
  FROM d WHERE len(toks) > 0
),
c AS (
  SELECT doc_id,
         CAST(ci AS BIGINT) AS chunk_idx,
         CAST(ci * 16 + 1 AS BIGINT) AS start_tok,
         list_slice(toks, ci * 16 + 1, ci * 16 + 24) AS piece
  FROM g
)
SELECT doc_id, chunk_idx, start_tok,
       CAST(len(piece) AS BIGINT) AS n_tokens,
       md5(array_to_string(piece, ' ')) AS chunk_md5
FROM c ORDER BY doc_id, chunk_idx
"""


def robots_policy_report(spark, sf):
    """Robots-policy filter (X62, functions/robots.py): URLs synthesized
    deterministically from documents (host = source, path = /p/<doc_id>)
    against a planted per-host rule set exercising the RFC 9309
    longest-match semantics — every host Disallows /p/1 but Allows the
    longer /p/12, and every third host (by name length) Disallows /p/
    wholesale, so verdicts hinge on prefix-length argmax and the
    Allow-wins tie rule. Output: per-host compliance counts."""
    from .functions.robots import robots_verdicts

    docs = t(spark, sf, "documents")
    urls = docs.select(
        F.col("source").alias("host"),
        F.concat(F.lit("/p/"), F.col("doc_id").cast("string")).alias("path"),
        "doc_id",
    )
    hosts = docs.select(F.col("source").alias("host")).distinct()
    rules = (
        hosts.select("host", F.lit("/p/1").alias("prefix"), F.lit(0).alias("allow"))
        .unionByName(
            hosts.select(
                "host", F.lit("/p/12").alias("prefix"), F.lit(1).alias("allow")
            )
        )
        .unionByName(
            hosts.filter(F.length("host") % 3 == 0).select(
                "host", F.lit("/p/").alias("prefix"), F.lit(0).alias("allow")
            )
        )
    )
    v = robots_verdicts(urls, rules)
    return (
        v.groupBy("host")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_urls"),
            F.sum("allowed").cast("long").alias("n_allowed"),
            F.sum(1 - F.col("allowed")).cast("long").alias("n_denied"),
        )
        .orderBy("host")
    )


# The REP decision replayed: same synthetic urls/rules, longest-match
# via row_number (length DESC, allow DESC — the argmax-with-Allow-wins
# twin of Spark's max(struct(len, allow))), default-allow on no match.
ORACLE_ROBOTS_POLICY_REPORT = r"""
WITH urls AS MATERIALIZED (
  SELECT source AS host,
         '/p/' || CAST(doc_id AS VARCHAR) AS path,
         doc_id
  FROM documents
),
hosts AS (SELECT DISTINCT source AS host FROM documents),
rules AS MATERIALIZED (
  SELECT host, '/p/1' AS prefix, 0 AS allow FROM hosts
  UNION ALL
  SELECT host, '/p/12' AS prefix, 1 AS allow FROM hosts
  UNION ALL
  SELECT host, '/p/' AS prefix, 0 AS allow FROM hosts
  WHERE length(host) % 3 = 0
),
best AS MATERIALIZED (
  SELECT host, doc_id, l, a FROM (
    SELECT u.host, u.doc_id,
           length(r.prefix) AS l, r.allow AS a,
           row_number() OVER (
             PARTITION BY u.host, u.doc_id
             ORDER BY length(r.prefix) DESC, r.allow DESC
           ) AS rn
    FROM urls u
    JOIN rules r ON r.host = u.host AND starts_with(u.path, r.prefix)
  ) WHERE rn = 1
),
verd AS (
  SELECT u.host,
         CAST(coalesce(b.a, 1) AS INT) AS allowed
  FROM urls u LEFT JOIN best b
    ON b.host = u.host AND b.doc_id = u.doc_id
)
SELECT host,
       CAST(count(*) AS BIGINT) AS n_urls,
       CAST(sum(allowed) AS BIGINT) AS n_allowed,
       CAST(sum(1 - allowed) AS BIGINT) AS n_denied
FROM verd GROUP BY host ORDER BY host
"""


def kcore_report(spark, sf):
    """k-core decomposition (X61, operators/kcore.py) at k=5 over the
    md5+ring link graph (the X55 graph — ring guarantees degree >= 4,
    hash edges decide who clears 5, so ~6% of nodes peel with cascades):
    top-15 core nodes by in-core degree, with the core size and the
    IN-PLAN convergence certificate on every row."""
    from .operators.kcore import k_core

    docs = t(spark, sf, "documents")
    n = docs.count()  # 1-row query vector; doc_ids dense 0..n-1 (TESTDATA)
    did = F.col("doc_id")
    gen = docs.filter(did % 4 != 0).select(
        did.alias("src"),
        F.explode(F.sequence(F.lit(1), (did % 4).cast("int"))).alias("j"),
    )
    hash_e = gen.select(
        "src",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("src").cast("string"),
                            F.lit(":"),
                            F.col("j").cast("string"),
                        )
                    ),
                    1,
                    6,
                ),
                16,
                10,
            ).cast("long")
            % n
        ).alias("dst"),
    ).filter(F.col("dst") != F.col("src"))
    ring = docs.select(did.alias("src"), ((did + 1) % n).alias("dst")).unionAll(
        docs.select(did.alias("src"), ((did + 2) % n).alias("dst"))
    )
    core, meta = k_core(hash_e.unionAll(ring), k=5, n_rounds=8)
    return (
        core.crossJoin(F.broadcast(meta))
        .select(
            "node",
            "core_deg",
            F.col("n_after_last").alias("n_core"),
            (F.col("n_before_last") == F.col("n_after_last"))
            .cast("int")
            .alias("converged"),
        )
        .orderBy(F.desc("core_deg"), "node")
        .limit(15)
    )


def _kcore_oracle(k: int = 5, n_rounds: int = 8) -> str:
    """Peeling replayed: canonical undirected edges, then every round's
    (degree census, keep set, surviving edges) unrolled — deletion order
    is irrelevant to the fixpoint, so no tie-breaking is needed anywhere;
    the convergence certificate rides in the hash."""
    parts = [
        "WITH nn AS MATERIALIZED (",
        "  SELECT CAST(count(*) AS BIGINT) AS n FROM documents",
        "),",
        "gen AS (",
        "  SELECT doc_id AS src,",
        "         unnest(generate_series(1, CAST(doc_id % 4 AS BIGINT))) AS j",
        "  FROM documents WHERE doc_id % 4 <> 0",
        "),",
        "alledges AS MATERIALIZED (",
        "  SELECT src,",
        "         ('0x' || substr(md5(CAST(src AS VARCHAR) || ':' ||",
        "           CAST(j AS VARCHAR)), 1, 6))::BIGINT",
        "           % (SELECT n FROM nn) AS dst",
        "  FROM gen",
        "  UNION ALL",
        "  SELECT doc_id AS src, (doc_id + 1) % (SELECT n FROM nn) AS dst",
        "  FROM documents",
        "  UNION ALL",
        "  SELECT doc_id AS src, (doc_id + 2) % (SELECT n FROM nn) AS dst",
        "  FROM documents",
        "),",
        "e0 AS MATERIALIZED (",
        "  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b",
        "  FROM alledges WHERE src <> dst",
        "),",
    ]
    for r in range(1, n_rounds + 1):
        p = r - 1
        parts += [
            f"d{r} AS MATERIALIZED (",
            f"  SELECT node, CAST(count(*) AS BIGINT) AS d FROM (",
            f"    SELECT a AS node FROM e{p} UNION ALL SELECT b AS node FROM e{p}",
            f"  ) GROUP BY node",
            f"),",
            f"k{r} AS MATERIALIZED (SELECT node FROM d{r} WHERE d >= {k}),",
            f"e{r} AS MATERIALIZED (",
            f"  SELECT e.a, e.b FROM e{p} e",
            f"  JOIN k{r} ka ON ka.node = e.a",
            f"  JOIN k{r} kb ON kb.node = e.b",
            f"),",
        ]
    parts += [
        "fd AS MATERIALIZED (",
        f"  SELECT node, CAST(count(*) AS BIGINT) AS core_deg FROM (",
        f"    SELECT a AS node FROM e{n_rounds}",
        f"    UNION ALL SELECT b AS node FROM e{n_rounds}",
        f"  ) GROUP BY node HAVING count(*) >= {k}",
        "),",
        "meta AS (",
        f"  SELECT (SELECT CAST(count(*) AS BIGINT) FROM d{n_rounds})"
        " AS n_before,",
        "         (SELECT CAST(count(*) AS BIGINT) FROM fd) AS n_after",
        ")",
        "SELECT fd.node, fd.core_deg,",
        "       m.n_after AS n_core,",
        "       CAST(CASE WHEN m.n_before = m.n_after THEN 1 ELSE 0 END"
        " AS INT) AS converged",
        "FROM fd, meta m",
        "ORDER BY core_deg DESC, node LIMIT 15",
    ]
    return "\n".join(parts)


ORACLE_KCORE_REPORT = _kcore_oracle()


def drift_psi_report(spark, sf):
    """Distribution drift between corpus snapshots (X60): the Population
    Stability Index — the standard production drift monitor (banking
    model-risk practice; equivalent to symmetrised KL on bucketed
    distributions) — over the n_chars distribution of snapshot A
    (documents) vs the X52-derived snapshot B. Laplace +1 smoothing on
    EXACT integer counts (16 fixed-width buckets of 128 chars, clamped)
    makes every ratio an exact-integer quotient, ln enters on
    operand-identical doubles (the PMI/BM25 recipe), and per-bucket
    contributions are nano-quantized BIGINTs so the TOTAL is an exact
    order-independent integer sum. Output: one row per bucket with both
    counts, the contribution, and the grand total on every row.
    Reference analog: none (SURVEY §2.13)."""
    docs = t(spark, sf, "documents")
    did = F.col("doc_id")
    b = docs.filter(did % 7 != 0).withColumn(
        "n_chars",
        F.when(did % 5 == 0, F.col("n_chars") + 3).otherwise(F.col("n_chars")),
    ).unionByName(
        docs.filter(did % 11 == 0).select(
            (did + 1000000).alias("doc_id"),
            "text",
            "lang",
            "source",
            (F.col("n_chars") + 4).alias("n_chars"),
        ).select("doc_id", "text", "lang", "source", "n_chars")
    )
    K = 16

    def bucketed(df, name):
        clamp = "least(greatest(CAST(n_chars AS BIGINT), 0), 2047)"
        return (
            df.select(F.expr(f"div({clamp}, 128)").alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).cast("long").alias(name))
        )

    ca = bucketed(docs, "n_a")
    cb = bucketed(b, "n_b")
    na = docs.agg(F.count(F.lit(1)).cast("long").alias("na"))
    nb = b.agg(F.count(F.lit(1)).cast("long").alias("nb"))
    grid = spark.range(K).select(F.col("id").alias("bucket"))
    j = (
        grid.join(ca, "bucket", "left")
        .join(cb, "bucket", "left")
        .fillna(0, ["n_a", "n_b"])
        .crossJoin(F.broadcast(na))
        .crossJoin(F.broadcast(nb))
    )
    p = (F.col("n_a") + 1).cast("double") / (F.col("na") + K).cast("double")
    q = (F.col("n_b") + 1).cast("double") / (F.col("nb") + K).cast("double")
    ratio = ((F.col("n_a") + 1) * (F.col("nb") + K)).cast("double") / (
        (F.col("n_b") + 1) * (F.col("na") + K)
    ).cast("double")
    term = (p - q) * F.log(ratio)
    rows = j.select(
        "bucket",
        "n_a",
        "n_b",
        F.round(term * F.lit(1e9)).cast("long").alias("psi_nano"),
    )
    w = W.partitionBy()
    return (
        rows.withColumn(
            "total_psi_nano", F.sum("psi_nano").over(w).cast("long")
        )
        .orderBy("bucket")
    )


ORACLE_DRIFT_PSI_REPORT = r"""
WITH b AS MATERIALIZED (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN n_chars + 3 ELSE n_chars END AS n_chars
  FROM documents WHERE doc_id % 7 <> 0
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, n_chars + 4 AS n_chars
  FROM documents WHERE doc_id % 11 = 0
),
ca AS MATERIALIZED (
  SELECT least(greatest(CAST(n_chars AS BIGINT), 0), 2047) // 128 AS bucket,
         CAST(count(*) AS BIGINT) AS n_a
  FROM documents GROUP BY bucket
),
cb AS MATERIALIZED (
  SELECT least(greatest(CAST(n_chars AS BIGINT), 0), 2047) // 128 AS bucket,
         CAST(count(*) AS BIGINT) AS n_b
  FROM b GROUP BY bucket
),
na AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
nb AS (SELECT CAST(count(*) AS BIGINT) AS n FROM b),
grid AS (SELECT CAST(range AS BIGINT) AS bucket FROM range(16)),
j AS (
  SELECT g.bucket,
         coalesce(ca.n_a, 0) AS n_a,
         coalesce(cb.n_b, 0) AS n_b,
         (SELECT n FROM na) AS na,
         (SELECT n FROM nb) AS nb
  FROM grid g
  LEFT JOIN ca ON ca.bucket = g.bucket
  LEFT JOIN cb ON cb.bucket = g.bucket
),
rows_ AS (
  SELECT bucket, n_a, n_b,
         CAST(round((CAST(n_a + 1 AS DOUBLE) / CAST(na + 16 AS DOUBLE)
               - CAST(n_b + 1 AS DOUBLE) / CAST(nb + 16 AS DOUBLE))
             * ln(CAST((n_a + 1) * (nb + 16) AS DOUBLE)
                  / CAST((n_b + 1) * (na + 16) AS DOUBLE))
             * 1e9) AS BIGINT) AS psi_nano
  FROM j
)
SELECT bucket, n_a, n_b, psi_nano,
       CAST(sum(psi_nano) OVER () AS BIGINT) AS total_psi_nano
FROM rows_ ORDER BY bucket
"""


def streaming_quantile_report(spark, sf):
    """The third fully-oracled streaming query: per-lang n_chars leaves
    stream through the incremental q-digest census
    (streaming/pipeline.py stream_qdigest_leaves — complete-mode
    groupBy-count, state bounded by the UNIVERSE) and the final census is
    compressed + rank-queried at read time. Counts are exactly-once
    associative sums (the streaming_cms_report contract) and compression
    is a deterministic pure function of the census, so stream-then-
    compress equals the batch digest — the batch q-digest oracle replays
    the streaming computation verbatim. Output shape == the batch
    qdigest_quantile_report (incl. the exact-histogram err leg)."""
    import shutil
    import tempfile

    from .operators.qdigest import qdigest_compress, qdigest_quantiles

    Q = [10, 25, 50, 75, 90, 99]
    base = f"{tempfile.gettempdir()}/ooe_stream_qd"
    shutil.rmtree(base, ignore_errors=True)
    src, ckpt = f"{base}/src", f"{base}/ckpt"
    docs = t(spark, sf, "documents")
    docs.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    from .streaming import stream_qdigest_leaves

    try:
        spark.catalog.dropTempView("ooe_stream_qd_leaves")
    except Exception:
        pass
    q = (
        stream_qdigest_leaves(stream, "n_chars", ["lang"], depth=11)
        .writeStream.format("memory")
        .queryName("ooe_stream_qd_leaves")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout=180):
        q.stop()
        raise TimeoutError(
            "streaming_quantile_report: stream did not finish in 180s"
        )
    leaves = (
        spark.table("ooe_stream_qd_leaves")
        .withColumn("level", F.lit(11))
        .select("lang", "level", "id", "cnt")
    )
    dig, tot = qdigest_compress(leaves, ["lang"], depth=11, k=64)
    qd = qdigest_quantiles(dig, tot, ["lang"], Q, depth=11)
    cap = (1 << 11) - 1
    v = F.least(F.greatest(F.col("n_chars").cast("long"), F.lit(0)), F.lit(cap))
    hist = (
        docs.select("lang", v.alias("val"))
        .groupBy("lang", "val")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    cum_w = (
        W.partitionBy("lang")
        .orderBy("val")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    hist_cum = hist.withColumn("_cum", F.sum("c").over(cum_w))
    # exact-leg targets recomputed from docs (identical values to `tot` —
    # every doc lands on one leaf) so the two join legs have DISJOINT
    # lineages: sharing `tot` across both trips Spark's conflicting-
    # reference resolution on the window + memory-table shape
    tot2 = docs.groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("n"))
    targets = tot2.select(
        "lang",
        F.explode(F.array(*[F.lit(x) for x in Q])).alias("q_pct"),
        F.expr("div(q_pct * n + 99, 100)").cast("long").alias("_target"),
    )
    exact = (
        hist_cum.join(F.broadcast(targets), "lang")
        .filter(F.col("_cum") >= F.col("_target"))
        .groupBy("lang", "q_pct")
        .agg(F.min("val").cast("long").alias("exact_value"))
    )
    return (
        qd.join(exact, ["lang", "q_pct"])
        .select(
            "lang",
            "q_pct",
            "qd_value",
            "exact_value",
            (F.col("qd_value") - F.col("exact_value")).cast("long").alias("err"),
        )
        .orderBy("lang", "q_pct")
    )


def zorder_key_report(spark, sf):
    """Z-order layout key (X57, sources/zorder.py): the Morton
    interleave of (n_chars, doc_id) — pure unrolled bit arithmetic, the
    write-order key behind multi-dimensional file pruning. Top-20 by
    key; the layout/pruning claim itself is pytest-measured
    (tests/test_zorder.py) since file statistics aren't SQL."""
    from .sources.zorder import morton_key

    docs = t(spark, sf, "documents")
    z = morton_key(F.col("n_chars"), F.col("doc_id"), bits=12)
    return (
        docs.select("doc_id", "n_chars", z.alias("z_key"))
        .orderBy(F.desc("z_key"), "doc_id")
        .limit(20)
    )


def _zorder_oracle() -> str:
    from .sources.zorder import morton_key_sql

    return (
        "SELECT doc_id, n_chars, "
        + morton_key_sql("n_chars", "doc_id", bits=12)
        + " AS z_key\nFROM documents ORDER BY z_key DESC, doc_id LIMIT 20"
    )


ORACLE_ZORDER_KEY_REPORT = _zorder_oracle()


def qdigest_quantile_report(spark, sf):
    """q-digest quantile sketch (X56, operators/qdigest.py): per-lang
    digests over n_chars (universe [0, 2048), depth 11, k=64), queried at
    six percentiles, next to the EXACT per-lang quantiles (the X32
    bounded-domain histogram leg) and the signed error — the mergeable-
    sketch trio's quantile member, wholly integer and trajectory-
    replayable (every compression decision is an integer comparison both
    engines take identically)."""
    from .operators.qdigest import qdigest_build, qdigest_quantiles

    Q = [10, 25, 50, 75, 90, 99]
    docs = t(spark, sf, "documents")
    dig, tot = qdigest_build(docs, "n_chars", ["lang"], depth=11, k=64)
    qd = qdigest_quantiles(dig, tot, ["lang"], Q, depth=11)
    cap = (1 << 11) - 1
    v = F.least(F.greatest(F.col("n_chars").cast("long"), F.lit(0)), F.lit(cap))
    hist = (
        docs.select("lang", v.alias("val"))
        .groupBy("lang", "val")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    cum_w = (
        W.partitionBy("lang")
        .orderBy("val")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    hist_cum = hist.withColumn("_cum", F.sum("c").over(cum_w))
    targets = tot.select(
        "lang",
        F.explode(F.array(*[F.lit(q) for q in Q])).alias("q_pct"),
        F.expr("div(q_pct * n + 99, 100)").cast("long").alias("_target"),
    )
    exact = (
        hist_cum.join(F.broadcast(targets), "lang")
        .filter(F.col("_cum") >= F.col("_target"))
        .groupBy("lang", "q_pct")
        .agg(F.min("val").cast("long").alias("exact_value"))
    )
    return (
        qd.join(exact, ["lang", "q_pct"])
        .select(
            "lang",
            "q_pct",
            "qd_value",
            "exact_value",
            (F.col("qd_value") - F.col("exact_value")).cast("long").alias("err"),
        )
        .orderBy("lang", "q_pct")
    )


def _qdigest_oracle(depth: int = 11, k: int = 64) -> str:
    """The whole digest trajectory replayed: clamped leaves, per-lang
    thresholds, every bottom-up compression level unrolled as
    (kids, dec, nodes) MATERIALIZED CTE triples — each absorb decision an
    integer comparison — then the rank query and the exact histogram leg."""
    u = 1 << depth
    parts = [
        "WITH leaves AS MATERIALIZED (",
        f"  SELECT lang, {depth} AS level,",
        f"         {u} + least(greatest(CAST(n_chars AS BIGINT), 0), {u - 1})"
        "  AS id,",
        "         CAST(count(*) AS BIGINT) AS cnt",
        "  FROM documents GROUP BY 1, 2, 3",
        "),",
        "tot AS MATERIALIZED (",
        "  SELECT lang, CAST(sum(cnt) AS BIGINT) AS n FROM leaves GROUP BY lang",
        "),",
        "thr AS MATERIALIZED (",
        f"  SELECT lang, greatest(n // {k}, 1) AS t FROM tot",
        "),",
        f"n{depth} AS MATERIALIZED (SELECT lang, level, id, cnt FROM leaves),",
    ]
    for lvl in range(depth, 0, -1):
        p = lvl - 1
        parts += [
            f"k{lvl} AS MATERIALIZED (",
            f"  SELECT lang, id // 2 AS pid, CAST(sum(cnt) AS BIGINT) AS ksum",
            f"  FROM n{lvl} WHERE level = {lvl} GROUP BY lang, pid",
            f"),",
            f"d{lvl} AS MATERIALIZED (",
            f"  SELECT coalesce(kk.lang, pp.lang) AS lang,",
            f"         coalesce(kk.pid, pp.id) AS pid,",
            f"         coalesce(kk.ksum, 0) AS ksum,",
            f"         coalesce(pp.cnt, 0) AS pcnt,",
            f"         (coalesce(kk.ksum, 0) > 0 AND",
            f"          coalesce(kk.ksum, 0) + coalesce(pp.cnt, 0) <= th.t)"
            f" AS absorb",
            f"  FROM k{lvl} kk",
            f"  FULL OUTER JOIN (SELECT lang, id, cnt FROM n{lvl}"
            f" WHERE level = {p}) pp",
            f"    ON pp.lang = kk.lang AND pp.id = kk.pid",
            f"  JOIN thr th ON th.lang = coalesce(kk.lang, pp.lang)",
            f"),",
            f"n{p} AS MATERIALIZED (",
            f"  SELECT lang, level, id, cnt FROM n{lvl}"
            f" WHERE level NOT IN ({lvl}, {p})",
            f"  UNION ALL",
            f"  SELECT lang, {p} AS level, pid AS id,",
            f"         pcnt + CASE WHEN absorb THEN ksum ELSE 0 END AS cnt",
            f"  FROM d{lvl}",
            f"  WHERE pcnt + CASE WHEN absorb THEN ksum ELSE 0 END > 0",
            f"  UNION ALL",
            f"  SELECT c.lang, c.level, c.id, c.cnt FROM n{lvl} c",
            f"  JOIN d{lvl} d ON d.lang = c.lang AND d.pid = c.id // 2",
            f"  WHERE c.level = {lvl} AND NOT d.absorb",
            f"),",
        ]
    parts += [
        "dig AS MATERIALIZED (",
        "  SELECT lang, level, id, cnt,",
        f"         (1::BIGINT << ({depth} - level)) AS span,",
        f"         (id - (1::BIGINT << level) + 1) * (1::BIGINT <<"
        f" ({depth} - level)) - 1 AS r",
        "  FROM n0",
        "),",
        "cum AS MATERIALIZED (",
        "  SELECT lang, r, span, id, cnt,",
        "         CAST(sum(cnt) OVER (PARTITION BY lang ORDER BY r, span, id",
        "           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c",
        "  FROM dig",
        "),",
        "targets AS MATERIALIZED (",
        "  SELECT lang, q_pct, (q_pct * n + 99) // 100 AS target",
        "  FROM tot, UNNEST([10, 25, 50, 75, 90, 99]) AS qq(q_pct)",
        "),",
        "qd AS MATERIALIZED (",
        "  SELECT c.lang, t.q_pct, CAST(min(c.r) AS BIGINT) AS qd_value",
        "  FROM cum c JOIN targets t ON t.lang = c.lang",
        "  WHERE c.c >= t.target GROUP BY 1, 2",
        "),",
        "hist AS MATERIALIZED (",
        f"  SELECT lang, least(greatest(CAST(n_chars AS BIGINT), 0), {u - 1})"
        "  AS val,",
        "         CAST(count(*) AS BIGINT) AS c FROM documents GROUP BY 1, 2",
        "),",
        "hcum AS (",
        "  SELECT lang, val,",
        "         CAST(sum(c) OVER (PARTITION BY lang ORDER BY val",
        "           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c",
        "  FROM hist",
        "),",
        "exact AS (",
        "  SELECT h.lang, t.q_pct, CAST(min(h.val) AS BIGINT) AS exact_value",
        "  FROM hcum h JOIN targets t ON t.lang = h.lang",
        "  WHERE h.c >= t.target GROUP BY 1, 2",
        ")",
        "SELECT q.lang, CAST(q.q_pct AS INT) AS q_pct, q.qd_value,",
        "       e.exact_value,",
        "       CAST(q.qd_value - e.exact_value AS BIGINT) AS err",
        "FROM qd q JOIN exact e ON e.lang = q.lang AND e.q_pct = q.q_pct",
        "ORDER BY q.lang, q.q_pct",
    ]
    return "\n".join(parts)


ORACLE_QDIGEST_QUANTILE_REPORT = _qdigest_oracle()

# Stream-then-compress == batch build (exactly-once sums + deterministic
# compression), so the batch q-digest oracle replays the STREAMING
# quantile report verbatim — that identity is the claim under test.
ORACLE_STREAMING_QUANTILE_REPORT = ORACLE_QDIGEST_QUANTILE_REPORT


def cohort_retention_report(spark, sf):
    """Cohort retention matrix (A19): users bucketed by the DAY of their
    first event (cohort index relative to the corpus-wide first event),
    activity bucketed by weeks-since-own-first — the classic product /
    crawl-freshness retention triangle, here with every bucket an EXACT
    integer division of epoch microseconds (no calendar functions, no
    timezone semantics to diverge between engines).

    Shape: one groupBy(user) for first-events (map-side-combined min),
    a broadcast join back onto events (user-keyed — the only corpus
    shuffle), a 1-row corpus-min frame broadcast-attached, and the final
    matrix groupBy is bounded by cohorts x weeks. Scale: events shuffle
    once on user_id; everything after is user-scale then matrix-scale."""
    ev = t(spark, sf, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    wk = 7 * 86_400 * 1_000_000
    day = 86_400 * 1_000_000
    per_user = ev.select(F.col("user_id"), us.alias("_us"))
    first = per_user.groupBy("user_id").agg(F.min("_us").alias("_first"))
    g0 = first.agg(F.min("_first").alias("_g0"))
    j = per_user.join(first, "user_id").crossJoin(F.broadcast(g0))
    return (
        j.select(
            F.expr(f"div(_first - _g0, {day})").alias("cohort_day"),
            F.expr(f"div(_us - _first, {wk})").alias("active_week"),
            "user_id",
        )
        .groupBy("cohort_day", "active_week")
        .agg(F.countDistinct("user_id").cast("long").alias("n_users"))
        .orderBy("cohort_day", "active_week")
    )


ORACLE_COHORT_RETENTION_REPORT = r"""
WITH pu AS (
  SELECT user_id, epoch_us(ts) AS us FROM events
),
first AS MATERIALIZED (
  SELECT user_id, min(us) AS f FROM pu GROUP BY user_id
),
g0 AS (SELECT min(f) AS g0 FROM first)
SELECT (f.f - (SELECT g0 FROM g0)) // 86400000000 AS cohort_day,
       (pu.us - f.f) // 604800000000 AS active_week,
       CAST(count(DISTINCT pu.user_id) AS BIGINT) AS n_users
FROM pu JOIN first f ON pu.user_id = f.user_id
GROUP BY 1, 2
ORDER BY cohort_day, active_week
"""


def streaming_hll_report(spark, sf):
    """The engine's first FULLY-ORACLED streaming query: documents stream
    through the incremental HLL sketch (streaming/pipeline.py
    stream_hll_registers — complete-mode groupBy-max over the X46
    bucket/rho expressions) and the final registers feed hll_estimate.
    Because max is associative+commutative and bucket/rho are pure md5
    functions of the CONTENT, the streaming state after availableNow
    equals the batch sketch over the same rows — so a batch SQL oracle
    replays a streaming computation value-for-value (unlike the
    extraction stream, whose rows-only status is about fixture I/O, not
    determinism). Real checkpoint, bounded await, scratch wiped per call
    (the streaming_extraction_report discipline)."""
    import shutil
    import tempfile

    from .functions.ngram import word_ngrams
    from .operators.decontaminate import _gram_key
    from .operators.hll import hll_estimate
    from .streaming import stream_hll_registers

    base = f"{tempfile.gettempdir()}/ooe_stream_hll"
    shutil.rmtree(base, ignore_errors=True)
    src, ckpt = f"{base}/src", f"{base}/ckpt"
    docs = t(spark, sf, "documents")
    docs.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    grams = stream.select(
        "lang", F.explode(word_ngrams(F.col("text"), 4)).alias("_g")
    ).select("lang", _gram_key(F.col("_g")).alias("_gram"))
    try:
        spark.catalog.dropTempView("ooe_stream_hll_regs")
    except Exception:
        pass
    q = (
        stream_hll_registers(grams, "_gram", ["lang"])
        .writeStream.format("memory")
        .queryName("ooe_stream_hll_regs")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout=180):
        q.stop()
        raise TimeoutError("streaming_hll_report: stream did not finish in 180s")
    regs = spark.table("ooe_stream_hll_regs")
    return (
        hll_estimate(regs, ["lang"])
        .select("lang", "n_buckets_hit", _r(F.col("n_hll")).alias("n_hll"))
        .orderBy("lang")
    )


# The streaming sketch replayed as batch SQL: identical md5 bucket/rank,
# exact-decimal register sums, operand-identical final arithmetic — the
# regs/hll/fin chain of ORACLE_HLL_DISTINCT_REPORT without the exact legs.
ORACLE_STREAMING_HLL_REPORT = r"""
WITH norm AS (
  SELECT doc_id, lang,
         coalesce(trim(regexp_replace(regexp_replace(lower(text), '[^\p{L} ]+', ' ', 'g'),
                                      '\s+', ' ', 'g')), '') AS t
  FROM documents
),
toks AS (
  SELECT doc_id, lang, string_split(t, ' ') AS w FROM norm WHERE length(t) > 0
),
grams AS MATERIALIZED (
  SELECT lang,
         substr(md5(array_to_string(w[CAST(i AS INT):CAST(i + 3 AS INT)], ' ')), 1, 16) AS g
  FROM toks, UNNEST(range(1, len(w) - 2)) AS u(i)
  WHERE len(w) >= 4
),
regs AS (
  SELECT lang,
         ('0x' || substr(md5(g), 1, 15))::BIGINT % 256 AS b,
         max(CASE WHEN length(ltrim(substr(md5('r:' || g), 1, 15), '0')) = 0 THEN 61
             ELSE (15 - length(ltrim(substr(md5('r:' || g), 1, 15), '0'))) * 4
                  + CASE substr(ltrim(substr(md5('r:' || g), 1, 15), '0'), 1, 1)
                      WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
                      WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1 WHEN '7' THEN 1
                      ELSE 0 END + 1 END) AS r
  FROM grams GROUP BY lang, b
),
hll AS (
  SELECT lang,
         count(*) AS nreg,
         CAST(sum(CAST(1::BIGINT << (62 - r) AS DECIMAL(38,0)))
              + CAST(256 - count(*) AS DECIMAL(38,0))
                * CAST(4611686018427387904 AS DECIMAL(38,0)) AS DOUBLE) AS s
  FROM regs GROUP BY lang
),
fin AS (
  SELECT lang, nreg,
         CASE WHEN 0.7213::DOUBLE / (1.0::DOUBLE + 1.079::DOUBLE / 256.0::DOUBLE)
                   * 256.0::DOUBLE * 256.0::DOUBLE * 4611686018427387904.0::DOUBLE / s
                   <= 2.5::DOUBLE * 256.0::DOUBLE
                AND 256 - nreg > 0
              THEN 256.0::DOUBLE * ln(256.0::DOUBLE / CAST(256 - nreg AS DOUBLE))
              ELSE 0.7213::DOUBLE / (1.0::DOUBLE + 1.079::DOUBLE / 256.0::DOUBLE)
                   * 256.0::DOUBLE * 256.0::DOUBLE * 4611686018427387904.0::DOUBLE / s
              END AS est
  FROM hll
)
SELECT lang,
       CAST(nreg AS BIGINT) AS n_buckets_hit,
       round(est, 6) AS n_hll
FROM fin
ORDER BY lang
"""


def streaming_cms_report(spark, sf):
    """The second fully-oracled streaming query: document tokens stream
    through the incremental Count-Min sketch (streaming/pipeline.py
    stream_cms_cells — complete-mode groupBy-count over in-row-exploded
    (row, md5-position) probes) and the final d x w cell frame answers
    the heavy-hitter probe. Counts are associative integer sums and the
    file source + checkpoint contract counts each row exactly once, so
    the streaming state after availableNow equals the batch cms_sketch
    over the same rows — a batch SQL oracle replays the streaming
    computation value-for-value (the streaming_hll_report argument, for
    a NON-idempotent fold: HLL's max forgives replays, CMS's sum leans
    on exactly-once instead — the pair documents both halves of the
    streaming-sketch contract). Real checkpoint, bounded await, scratch
    wiped per call (the streaming_extraction_report discipline)."""
    import shutil
    import tempfile

    from .functions.ngram import word_tokens
    from .operators.cms import cms_estimate, collect_cms
    from .streaming import stream_cms_cells

    base = f"{tempfile.gettempdir()}/ooe_stream_cms"
    shutil.rmtree(base, ignore_errors=True)
    src, ckpt = f"{base}/src", f"{base}/ckpt"
    docs = t(spark, sf, "documents")
    docs.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    toks_s = stream.select(F.explode(word_tokens(F.col("text"))).alias("tok"))
    try:
        spark.catalog.dropTempView("ooe_stream_cms_cells")
    except Exception:
        pass
    q = (
        stream_cms_cells(toks_s, "tok")
        .writeStream.format("memory")
        .queryName("ooe_stream_cms_cells")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout=180):
        q.stop()
        raise TimeoutError("streaming_cms_report: stream did not finish in 180s")
    cells = collect_cms(spark.table("ooe_stream_cms_cells"))
    toks = docs.select(F.explode(word_tokens(F.col("text"))).alias("tok"))
    return (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("n_exact"))
        .select(
            "tok",
            "n_exact",
            cms_estimate(F.col("tok"), cells).cast("long").alias("n_cms"),
        )
        .withColumn("overest", (F.col("n_cms") - F.col("n_exact")).cast("long"))
        .orderBy(F.desc("n_cms"), "tok")
        .limit(20)
    )


# The streaming sketch replays as EXACTLY the batch sketch (sum is
# associative/commutative + exactly-once ingestion), so the oracle is the
# batch CMS oracle verbatim — that identity IS the claim under test.
ORACLE_STREAMING_CMS_REPORT = ORACLE_CMS_HEAVY_HITTERS


def tfidf_pair_report(spark, sf):
    """Top-15 document pairs by tf-idf cosine over the df-capped term
    space (X49, operators/tfidf.py) — the sparse/lexical sibling of the
    dense embedding cosine family, via an inverted-index postings
    self-join. Weights are nano-quantized BIGINTs so dots and norms are
    exact integer sums (order-independent → hash-exact oracle); only the
    final dot/(sqrt·sqrt) is a double, IEEE-identical on both engines.
    max_df = 70% of the corpus exercises the published stop-term lever.
    Total order (cosine desc, id_a, id_b) makes the LIMIT deterministic."""
    from .operators.tfidf import tfidf_pair_topk

    d = _spread(t(spark, sf, "documents"))
    n = d.count()
    return tfidf_pair_topk(d, "text", "doc_id", max_df=int(n * 0.7), top_k=15)


# The tf-idf layer replayed exactly: same norm/tokenize CTEs, idf as
# round(ln(N/df)*1e9) BIGINT, wq via truncating integer division (DuckDB
# // ≡ Spark div for nonnegative BIGINTs), exact integer dot/norm sums,
# and the final cosine spelled dot / (sqrt(ssa) * sqrt(ssb)).
ORACLE_TFIDF_PAIR_REPORT = r"""
WITH norm AS (
  SELECT doc_id,
         coalesce(trim(regexp_replace(regexp_replace(lower(text), '[^\p{L} ]+', ' ', 'g'),
                                      '\s+', ' ', 'g')), '') AS t
  FROM documents
),
n_docs AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
toks AS (
  SELECT doc_id, string_split(t, ' ') AS w FROM norm WHERE length(t) > 0
),
tf AS MATERIALIZED (
  SELECT doc_id, tok AS term, CAST(count(*) AS BIGINT) AS tf
  FROM toks, UNNEST(w) AS u(tok) GROUP BY doc_id, tok
),
dfreq AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
),
idf AS (
  SELECT d.term, d.df,
         CAST(round(ln(CAST(n.n AS DOUBLE) / CAST(d.df AS DOUBLE)) * 1e9)
              AS BIGINT) AS idf_n9
  FROM dfreq d CROSS JOIN n_docs n
  WHERE d.df <= (SELECT CAST(floor(CAST(n AS DOUBLE) * 0.7) AS BIGINT) FROM n_docs)
),
post AS MATERIALIZED (
  SELECT t.doc_id, t.term, i.df, (t.tf * i.idf_n9) // 10000 AS wq
  FROM tf t JOIN idf i USING (term)
  WHERE (t.tf * i.idf_n9) // 10000 > 0
),
norms AS (
  SELECT doc_id, sum(CAST(wq AS HUGEINT) * CAST(wq AS HUGEINT)) AS ss
  FROM post GROUP BY doc_id
),
dots AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(count(*) AS BIGINT) AS n_shared_terms,
         sum(CAST(a.wq AS HUGEINT) * CAST(b.wq AS HUGEINT)) AS dot_h
  FROM post a JOIN post b ON a.term = b.term AND a.doc_id < b.doc_id
  WHERE a.df >= 2
  GROUP BY a.doc_id, b.doc_id
)
SELECT d.id_a, d.id_b, d.n_shared_terms,
       CAST(d.dot_h AS DOUBLE) AS dot_q,
       round(CAST(d.dot_h AS DOUBLE)
             / (sqrt(CAST(na.ss AS DOUBLE)) * sqrt(CAST(nb.ss AS DOUBLE))),
             6) AS cosine
FROM dots d
JOIN norms na ON na.doc_id = d.id_a
JOIN norms nb ON nb.doc_id = d.id_b
ORDER BY cosine DESC, d.id_a, d.id_b
LIMIT 15
"""


def pmi_collocations_report(spark, sf):
    """Top-20 adjacent word pairs by PMI (X50, operators/pmi.py): the
    phrase-mining / boilerplate-audit statistic over the documents table.
    Every input to ln() is a ratio of exact integer counts spelled
    operand-for-operand identically in the oracle, so the doubles match
    bit-for-bit modulo 1 ulp of ln and the 6dp-rounded ranking is
    hash-exact. min_count=3 at this sf (the production default is higher;
    the floor exists to kill the hapax-pair degenerate ranking either
    way). Total order (pmi desc, w1, w2) makes the LIMIT deterministic."""
    from .operators.pmi import pmi_collocations

    d = _spread(t(spark, sf, "documents"))
    return pmi_collocations(d, "text", min_count=3, top_k=20)


# PMI replayed exactly: same norm/tokenize CTEs as the other text oracles,
# vocabulary-scale count frames, and the quotient written with the same
# association ((c12*T)*T)/((B*c1)*c2) with every factor cast to DOUBLE.
ORACLE_PMI_COLLOCATIONS = r"""
WITH norm AS (
  SELECT doc_id,
         coalesce(trim(regexp_replace(regexp_replace(lower(text), '[^\p{L} ]+', ' ', 'g'),
                                      '\s+', ' ', 'g')), '') AS t
  FROM documents
),
toks AS MATERIALIZED (
  SELECT doc_id, string_split(t, ' ') AS w FROM norm WHERE length(t) > 0
),
totals AS (
  SELECT CAST(sum(len(w)) AS BIGINT) AS tot_tokens,
         CAST(sum(greatest(len(w) - 1, 0)) AS BIGINT) AS tot_bigrams
  FROM toks
),
uni AS MATERIALIZED (
  SELECT tok AS w, CAST(count(*) AS BIGINT) AS c
  FROM toks, UNNEST(w) AS u(tok) GROUP BY tok
),
pairs AS (
  SELECT w[CAST(i AS INT)] AS w1, w[CAST(i AS INT) + 1] AS w2,
         CAST(count(*) AS BIGINT) AS c12
  FROM toks, UNNEST(range(1, len(w))) AS s(i)
  GROUP BY w1, w2
  HAVING count(*) >= 3
)
SELECT p.w1, p.w2, p.c12, u1.c AS c1, u2.c AS c2,
       round(ln(((CAST(p.c12 AS DOUBLE) * CAST(t.tot_tokens AS DOUBLE))
                 * CAST(t.tot_tokens AS DOUBLE))
                / ((CAST(t.tot_bigrams AS DOUBLE) * CAST(u1.c AS DOUBLE))
                   * CAST(u2.c AS DOUBLE))), 6) AS pmi
FROM pairs p
JOIN uni u1 ON u1.w = p.w1
JOIN uni u2 ON u2.w = p.w2
CROSS JOIN totals t
ORDER BY pmi DESC, p.w1, p.w2
LIMIT 20
"""


def repetition_report(spark, sf):
    """Gopher-style repetition quality signals, per lang: mean duplicate-
    word fraction (1 - distinct/total tokens — in-row expressions, no
    shuffle), mean top-2-gram fraction (most frequent word 2-gram's share
    of all 2-gram occurrences), mean duplicated-3-gram fraction (share of
    3-gram occurrences whose gram occurs more than once in the doc), and
    the count of docs whose top-2-gram share exceeds 0.05. The n-gram
    metrics are explode -> count per (doc, gram) -> per-doc fold — every
    gram of a doc sits in one input row, so the (doc, gram) counts finish
    map-side and the exchanges carry per-doc-gram then per-doc rows only.
    Published rationale: repeated lines/n-grams are the strongest cheap
    signal of boilerplate and degenerate text in web corpora."""
    from .functions.ngram import word_ngrams, word_tokens

    d = _spread(t(spark, sf, "documents"))
    toks = d.select(
        "doc_id",
        "lang",
        F.size(word_tokens(F.col("text"))).alias("n_tok"),
        F.size(F.array_distinct(word_tokens(F.col("text")))).alias("n_dtok"),
    ).withColumn(
        "dup_word_frac",
        F.when(
            F.col("n_tok") > 0,
            (F.col("n_tok") - F.col("n_dtok")) / F.col("n_tok"),
        ),
    )

    def gram_counts(n):
        return (
            d.select(
                "doc_id", F.explode(word_ngrams(F.col("text"), n)).alias("_g")
            )
            .groupBy("doc_id", "_g")
            .agg(F.count(F.lit(1)).alias("_c"))
        )

    top2 = (
        gram_counts(2)
        .groupBy("doc_id")
        .agg(
            F.when(
                F.sum("_c") > 0, F.max("_c") / F.sum("_c")
            ).alias("top_2gram_frac")
        )
    )
    dup3 = (
        gram_counts(3)
        .groupBy("doc_id")
        .agg(
            F.when(
                F.sum("_c") > 0,
                F.sum(F.when(F.col("_c") > 1, F.col("_c")).otherwise(0))
                / F.sum("_c"),
            ).alias("dup_3gram_frac")
        )
    )
    return (
        toks.join(top2, "doc_id", "left")
        .join(dup3, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            _r(F.avg("dup_word_frac")).alias("avg_dup_word_frac"),
            _r(F.avg("top_2gram_frac")).alias("avg_top_2gram_frac"),
            _r(F.avg("dup_3gram_frac")).alias("avg_dup_3gram_frac"),
            F.sum(F.when(F.col("top_2gram_frac") > 0.05, 1).otherwise(0))
            .cast("long")
            .alias("n_repetitive"),
        )
        .orderBy("lang")
    )


ORACLE_REPETITION_REPORT = r"""
WITH norm AS (
  SELECT doc_id, lang,
         coalesce(trim(regexp_replace(regexp_replace(lower(text), '[^\p{L} ]+', ' ', 'g'),
                                      '\s+', ' ', 'g')), '') AS t
  FROM documents
),
toks AS (
  SELECT doc_id, lang,
         CASE WHEN length(t) > 0 THEN string_split(t, ' ')
              ELSE [] END AS w
  FROM norm
),
wordstats AS (
  SELECT doc_id, lang, len(w) AS n_tok, len(list_distinct(w)) AS n_dtok,
         CASE WHEN len(w) > 0
              THEN (len(w) - len(list_distinct(w))) * 1.0 / len(w) END AS dup_word_frac
  FROM toks
),
g2 AS (
  SELECT doc_id, array_to_string(w[CAST(i AS INT):CAST(i + 1 AS INT)], ' ') AS gs
  FROM toks, UNNEST(range(1, len(w))) AS u(i)
  WHERE len(w) >= 2
),
c2 AS (SELECT doc_id, gs, count(*) AS c FROM g2 GROUP BY 1, 2),
top2 AS (
  SELECT doc_id,
         CASE WHEN sum(c) > 0 THEN max(c) * 1.0 / sum(c) END AS top_2gram_frac
  FROM c2 GROUP BY doc_id
),
g3 AS (
  SELECT doc_id, array_to_string(w[CAST(i AS INT):CAST(i + 2 AS INT)], ' ') AS gs
  FROM toks, UNNEST(range(1, len(w) - 1)) AS u(i)
  WHERE len(w) >= 3
),
c3 AS (SELECT doc_id, gs, count(*) AS c FROM g3 GROUP BY 1, 2),
dup3 AS (
  SELECT doc_id,
         CASE WHEN sum(c) > 0
              THEN sum(CASE WHEN c > 1 THEN c ELSE 0 END) * 1.0 / sum(c)
         END AS dup_3gram_frac
  FROM c3 GROUP BY doc_id
)
SELECT ws.lang,
       count(*) AS n_docs,
       round(avg(ws.dup_word_frac), 6)  AS avg_dup_word_frac,
       round(avg(t2.top_2gram_frac), 6) AS avg_top_2gram_frac,
       round(avg(d3.dup_3gram_frac), 6) AS avg_dup_3gram_frac,
       CAST(coalesce(sum(CASE WHEN t2.top_2gram_frac > 0.05 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_repetitive
FROM wordstats ws
LEFT JOIN top2 t2 USING (doc_id)
LEFT JOIN dup3 d3 USING (doc_id)
GROUP BY ws.lang
ORDER BY ws.lang
"""


def pii_scrub_report(spark, sf):
    """PII redaction pass (functions/pii.py): emails / IPv4s / phone numbers
    replaced by typed placeholders, counted per lang. The synthetic corpus
    carries no real PII, so the query PLANTS deterministic PII derived from
    doc_id (every 7th doc an email, 11th a phone, 13th an IP) before
    scrubbing — the same derivation is replayed in the oracle, so the scrub
    chain itself (patterns, overlap-safe EMAIL -> IP -> PHONE order,
    chars-removed accounting) is what the gate checks. All codegen regexp
    expressions; at 100 TB this runs at scan speed with zero shuffle before
    the per-lang fold."""
    from .functions.pii import pii_counts, scrub_pii

    d = t(spark, sf, "documents")
    did = F.col("doc_id")
    aug = F.concat(
        F.col("text"),
        F.when(
            did % 7 == 0,
            F.concat(
                F.lit(" mail user"), did.cast("string"), F.lit("@example.com")
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 11 == 0,
            F.concat(
                F.lit(" call +1-555-"),
                (F.lit(1000) + did % 9000).cast("string"),
                F.lit("-"),
                (F.lit(1000) + did % 8999).cast("string"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 13 == 0,
            F.concat(
                F.lit(" from 10."),
                (did % 256).cast("string"),
                F.lit(".0."),
                (did % 250).cast("string"),
            ),
        ).otherwise(F.lit("")),
    )
    n_email, n_ip, n_phone = pii_counts(aug)
    rows = d.select(
        "lang",
        n_email.alias("_ne"),
        n_ip.alias("_ni"),
        n_phone.alias("_np"),
        (F.length(aug) - F.length(scrub_pii(aug))).alias("_removed"),
    )
    return (
        rows.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(F.col("_ne") + F.col("_ni") + F.col("_np") > 0, 1).otherwise(0)
            )
            .cast("long")
            .alias("docs_with_pii"),
            F.sum("_ne").cast("long").alias("n_emails"),
            F.sum("_ni").cast("long").alias("n_ips"),
            F.sum("_np").cast("long").alias("n_phones"),
            _r(F.avg("_removed")).alias("avg_chars_removed"),
        )
        .orderBy("lang")
    )


ORACLE_PII_SCRUB_REPORT = r"""
WITH aug AS (
  SELECT lang,
         text
         || CASE WHEN doc_id % 7 = 0
                 THEN ' mail user' || CAST(doc_id AS VARCHAR) || '@example.com'
                 ELSE '' END
         || CASE WHEN doc_id % 11 = 0
                 THEN ' call +1-555-' || CAST(1000 + doc_id % 9000 AS VARCHAR)
                      || '-' || CAST(1000 + doc_id % 8999 AS VARCHAR)
                 ELSE '' END
         || CASE WHEN doc_id % 13 = 0
                 THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
                      || '.0.' || CAST(doc_id % 250 AS VARCHAR)
                 ELSE '' END AS t
  FROM documents
),
-- same overlap-safe chain as functions/pii.py: EMAIL -> IP -> PHONE
s1 AS (
  SELECT lang, t,
         len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS ne,
         regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
  FROM aug
),
s2 AS (
  SELECT lang, t, ne,
         len(regexp_extract_all(t1, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS ni,
         regexp_replace(t1, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g') AS t2
  FROM s1
),
s3 AS (
  SELECT lang, t, ne, ni,
         len(regexp_extract_all(t2, '\+?[0-9][0-9 ().-]{7,}[0-9]')) AS np,
         regexp_replace(t2, '\+?[0-9][0-9 ().-]{7,}[0-9]', '<PHONE>', 'g') AS t3
  FROM s2
)
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN ne + ni + np > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii,
       CAST(sum(ne) AS BIGINT) AS n_emails,
       CAST(sum(ni) AS BIGINT) AS n_ips,
       CAST(sum(np) AS BIGINT) AS n_phones,
       round(avg(length(t) - length(t3)), 6) AS avg_chars_removed
FROM s3
GROUP BY lang
ORDER BY lang
"""


def gopher_rules_report(spark, sf):
    """Published quality-filter rule packs (X38, functions/rulepacks.py):
    the Gopher doc-level rules (Rae et al. 2021 Table A1 — word count,
    mean word length, symbol ratio, alpha-word fraction, stop-word floor)
    plus C4's lorem-ipsum/curly-brace bans (Raffel et al. 2020 §2.2),
    thresholds scaled to fixture-length texts. The synthetic corpus is
    uniformly clean prose, so failure structure is PLANTED
    deterministically from doc_id (every 11th doc truncated to 3 words,
    13th given a '### ... ###' tail, 17th a 'lorem ipsum { ' prefix — the
    pii_scrub_report pattern) and replayed identically in the oracle.
    Per-lang report: docs, per-rule failure counts, docs passing all.
    Zero shuffles before the per-lang rollup; all codegen except the G4
    alpha-word filter (in-row HOF)."""
    from .functions.rulepacks import rulepack_flags

    d = t(spark, sf, "documents")
    did = F.col("doc_id")
    first3 = F.concat_ws(
        " ", F.slice(F.split(F.trim(F.col("text")), r"\s+"), 1, 3)
    )
    mut = (
        F.when(did % 11 == 0, first3)
        .when(did % 13 == 0, F.concat(F.col("text"), F.lit(" ### ... ###")))
        .when(did % 17 == 0, F.concat(F.lit("lorem ipsum { "), F.col("text")))
        .otherwise(F.col("text"))
    )
    flags = rulepack_flags(mut, min_words=5, max_words=100_000)
    base = d.select("lang", *[v.alias(k) for k, v in flags.items()])
    pass_all = F.lit(True)
    for k in flags:
        pass_all = pass_all & F.col(k)
    return (
        base.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            *[
                F.sum((~F.col(k)).cast("long")).alias(f"fail_{k}")
                for k in flags
            ],
            F.sum(pass_all.cast("long")).alias("n_pass_all"),
        )
        .orderBy("lang")
    )


ORACLE_GOPHER_RULES = rf"""
WITH mut AS (
  SELECT lang,
    CASE
      WHEN doc_id % 11 = 0 THEN array_to_string(regexp_split_to_array(trim(text), '\s+')[1:3], ' ')
      WHEN doc_id % 13 = 0 THEN text || ' ### ... ###'
      WHEN doc_id % 17 = 0 THEN 'lorem ipsum {{ ' || text
      ELSE text
    END AS t
  FROM documents
),
f AS (
  SELECT lang,
    CASE WHEN length(trim(t)) > 0 THEN len(regexp_split_to_array(trim(t), '\s+')) ELSE 0 END AS nw,
    length(regexp_replace(t, '\s', '', 'g')) AS nc,
    len(regexp_extract_all(t, '#|\.\.\.')) AS nsym,
    CASE WHEN length(trim(t)) > 0
         THEN len(list_filter(regexp_split_to_array(trim(t), '\s+'),
                              w -> regexp_matches(w, '[a-zA-Z]')))
         ELSE 0 END AS nalpha,
    len(regexp_extract_all(lower(t), '\b({_SW_EN})\b')) AS nsw,
    (contains(lower(t), 'lorem ipsum') OR contains(t, '{{')) AS banned
  FROM mut
),
g AS (
  SELECT lang,
    (nw >= 5 AND nw <= 100000) AS g1_wordcount,
    coalesce(nw > 0 AND nc * 1.0 / nw >= 3.0 AND nc * 1.0 / nw <= 10.0, FALSE) AS g2_mean_word_len,
    CASE WHEN nw > 0 THEN nsym * 1.0 / nw <= 0.1 ELSE TRUE END AS g3_symbol_ratio,
    CASE WHEN nw > 0 THEN nalpha * 1.0 / nw >= 0.8 ELSE TRUE END AS g4_alpha_words,
    (nsw >= 2) AS g5_stopwords,
    NOT banned AS c4_lorem_brace
  FROM f
)
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN NOT g1_wordcount THEN 1 ELSE 0 END) AS BIGINT) AS fail_g1_wordcount,
       CAST(sum(CASE WHEN NOT g2_mean_word_len THEN 1 ELSE 0 END) AS BIGINT) AS fail_g2_mean_word_len,
       CAST(sum(CASE WHEN NOT g3_symbol_ratio THEN 1 ELSE 0 END) AS BIGINT) AS fail_g3_symbol_ratio,
       CAST(sum(CASE WHEN NOT g4_alpha_words THEN 1 ELSE 0 END) AS BIGINT) AS fail_g4_alpha_words,
       CAST(sum(CASE WHEN NOT g5_stopwords THEN 1 ELSE 0 END) AS BIGINT) AS fail_g5_stopwords,
       CAST(sum(CASE WHEN NOT c4_lorem_brace THEN 1 ELSE 0 END) AS BIGINT) AS fail_c4_lorem_brace,
       CAST(sum(CASE WHEN g1_wordcount AND g2_mean_word_len AND g3_symbol_ratio
                      AND g4_alpha_words AND g5_stopwords AND c4_lorem_brace
                THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_all
FROM g
GROUP BY lang
ORDER BY lang
"""


def dsir_selection_report(spark, sf):
    """X39 DSIR importance resampling (operators/dsir.py — Xie et al. 2023,
    arXiv:2302.03169): select the 120 documents whose hashed-unigram/bigram
    bag-of-words distribution best matches a target corpus (here the docs
    of source 'src0' playing the held-out high-quality target), via Gumbel
    top-k over importance log-weights ln p(x) - ln q(x). 64 hash buckets at
    fixture scale (the operator default is the paper-faithful 8192); both
    LMs are fit in ONE corpus pass, weights are exact integer nano-log sums
    (order-independent under partial aggregation), and the Gumbel noise is
    a pure md5 function of doc_id — fully DuckDB-replayable, no RNG.
    Report grain lang: corpus docs, selected docs, mean selected
    log-weight, the selection's lang share vs the corpus' lang share (the
    number DSIR exists to move). Plan shape: counts pass collapses
    map-side to <= B rows; scoring pass is explode → BroadcastHashJoin
    (B-row ratio table) → per-doc partial agg; selection is a global
    TakeOrderedAndProject (no full sort); report aggs run over the tiny
    selected/ per-lang frames. Reference analog: none."""
    from .operators.dsir import dsir_select

    d = _spread(t(spark, sf, "documents"))
    sel = dsir_select(
        d, F.col("source") == "src0", "text", "doc_id", k=120, n_buckets=64
    )
    tot = W.partitionBy(F.lit(1))
    return (
        d.select("doc_id", "lang")
        .join(F.broadcast(sel.select("doc_id", "_nano")), "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count("_nano").alias("n_sel"),
            F.sum("_nano").alias("_sum_nano"),
        )
        .select(
            "lang",
            "n_docs",
            "n_sel",
            F.when(
                F.col("n_sel") > 0,
                _r(F.col("_sum_nano") / (F.col("n_sel") * F.lit(1e9))),
            ).alias("avg_logw_sel"),
            _r(F.col("n_sel") / F.sum("n_sel").over(tot)).alias("sel_share"),
            _r(F.col("n_docs") / F.sum("n_docs").over(tot)).alias(
                "corpus_share"
            ),
        )
        .orderBy("lang")
    )


ORACLE_DSIR_SELECTION = r"""
WITH norm AS (
  SELECT doc_id, lang, source,
         coalesce(trim(regexp_replace(regexp_replace(lower(text), '[^\p{L} ]+', ' ', 'g'),
                                      '\s+', ' ', 'g')), '') AS t
  FROM documents
),
toks AS (
  SELECT doc_id, source, string_split(t, ' ') AS w FROM norm WHERE length(t) > 0
),
grams AS (  -- unigram + bigram OCCURRENCES (bag-of-words: repeats count)
  SELECT doc_id, source, u.g FROM toks, UNNEST(w) AS u(g)
  UNION ALL
  SELECT doc_id, source,
         array_to_string(w[CAST(i AS INT):CAST(i + 1 AS INT)], ' ') AS g
  FROM toks, UNNEST(range(1, len(w))) AS u(i)
  WHERE len(w) >= 2
),
feats AS (
  SELECT doc_id, source = 'src0' AS is_t,
         ('0x' || substr(md5(g), 1, 8))::BIGINT % 64 AS bucket
  FROM grams
),
counts AS (
  SELECT bucket, CAST(count(*) AS BIGINT) AS raw_n,
         CAST(count(*) FILTER (WHERE is_t) AS BIGINT) AS tgt_n
  FROM feats GROUP BY bucket
),
filled AS (
  SELECT CAST(d.range AS BIGINT) AS bucket,
         coalesce(c.raw_n, 0) AS raw_n, coalesce(c.tgt_n, 0) AS tgt_n
  FROM range(64) d LEFT JOIN counts c ON c.bucket = d.range
),
tots AS (
  SELECT CAST(sum(raw_n) AS BIGINT) AS totr, CAST(sum(tgt_n) AS BIGINT) AS tott
  FROM filled
),
lm AS (  -- integer nano-log ratios: exact, order-independent doc sums
  SELECT bucket,
         CAST(round((ln((tgt_n + 1.0) / (tott + 64)) -
                     ln((raw_n + 1.0) / (totr + 64))) * 1e9) AS BIGINT) AS r
  FROM filled, tots
),
scores AS (
  SELECT f.doc_id, CAST(sum(l.r) AS BIGINT) AS nano
  FROM feats f JOIN lm l USING (bucket) GROUP BY f.doc_id
),
alldocs AS (
  SELECT n.doc_id, n.lang, coalesce(s.nano, 0) AS nano
  FROM norm n LEFT JOIN scores s USING (doc_id)
),
sel AS (  -- Gumbel top-k: deterministic md5 noise, doc_id tiebreak
  SELECT doc_id, nano
  FROM alldocs
  ORDER BY nano / 1e9 +
           (-ln(-ln((('0x' || substr(md5('dsir-sel-v1:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                     + 0.5) / 4294967296.0))) DESC,
           doc_id
  LIMIT 120
)
SELECT a.lang,
       count(*) AS n_docs,
       CAST(count(s.doc_id) AS BIGINT) AS n_sel,
       CASE WHEN count(s.doc_id) > 0
            THEN round(CAST(sum(s.nano) AS BIGINT) / (count(s.doc_id) * 1e9), 6)
       END AS avg_logw_sel,
       round(count(s.doc_id) * 1.0 / sum(count(s.doc_id)) OVER (), 6) AS sel_share,
       round(count(*) * 1.0 / sum(count(*)) OVER (), 6) AS corpus_share
FROM alldocs a LEFT JOIN sel s USING (doc_id)
GROUP BY a.lang
ORDER BY a.lang
"""


def semdedup_report(spark, sf):
    """X40 SemDeDup (operators/semdedup.py — Abbas et al. 2023,
    arXiv:2303.09540): deterministic k-means over the embeddings table
    (k=10, 3 Lloyd iterations, md5-seeded init, centroids 6dp-quantized
    each step so the iterative loop is oracle-replayable — the X29 trick),
    then within-cluster cosine pruning at tau=0.28 (one-shot
    keep-lowest-id). Report grain cluster: members, pruned members, prune
    rate, mean cosine-to-centroid — the rates computed by exact integral
    half-up division (the money-mean recipe) so no float mean ever meets a
    rounding half-point. Plan shape: per iteration, assignment is a
    ZERO-shuffle literal-array map (centroids collected — k*d rows, the
    sanctioned tiny-frame collect) and the update is one map-side-combined
    (cid, dim) mean; the pair stage joins on the cluster id so pair work
    is bounded by the largest cluster (the SemDeDup point), never
    corpus-quadratic. Reference analog: none."""
    from .operators.semdedup import kmeans_assign, semantic_dupes

    e = t(spark, sf, "embeddings")
    asg = kmeans_assign(e, "embedding", "vec_id", k=10, iters=3)
    dup = semantic_dupes(asg, "embedding", "vec_id", tau=0.28).withColumn(
        "_d", F.lit(1)
    )
    return (
        asg.join(F.broadcast(dup), "vec_id", "left")
        .groupBy("cid")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.count("_d").alias("n_pruned"),
            F.sum(F.round(F.col("cos") * 1e6).cast("long")).alias("_sc"),
        )
        .select(
            "cid",
            "n_vecs",
            "n_pruned",
            (
                F.expr("div(2*1000000*n_pruned + n_vecs, 2*n_vecs)") / 1e6
            ).alias("prune_rate"),
            (
                (
                    F.expr("div(2*(_sc + 2000000*n_vecs) + n_vecs, 2*n_vecs)")
                    - 2000000
                )
                / 1e6
            ).alias("mean_cos"),
        )
        .orderBy("cid")
    )


def _oracle_semdedup(k: int = 10, iters: int = 3, tau: float = 0.28) -> str:
    """DuckDB replay of semdedup_report: the Lloyd iterations unrolled as
    CTE chains (the X36 unrolled-trajectory pattern), cosines via the
    proven UNNEST sum(x*y) twin of ORACLE_EMBEDDING_TOPK, empty clusters
    keeping their previous centroid exactly as the operator does."""
    seed = "md5('semdedup-v1:' || CAST(vec_id AS VARCHAR))"
    parts = [
        f"""WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
cent0 AS (
  SELECT row_number() OVER (ORDER BY {seed}, vec_id) AS cid,
         list_transform(v, x -> round(x, 6)) AS cv
  FROM (SELECT vec_id, v FROM e ORDER BY {seed}, vec_id LIMIT {k})
)"""
    ]
    for i in range(1, iters + 2):  # iters updates + the final assignment
        prev = f"cent{i - 1}"
        parts.append(
            f""",
p{i} AS (
  SELECT e.vec_id, c.cid,
         e.v[CAST(t.i AS INT)] AS x, c.cv[CAST(t.i AS INT)] AS y
  FROM e, {prev} c, UNNEST(range(1, len(e.v) + 1)) AS t(i)
),
s{i} AS (
  SELECT vec_id, cid,
         coalesce(round(sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))), 6), -2.0) AS c
  FROM p{i} GROUP BY vec_id, cid
),
a{i} AS (
  SELECT vec_id, cid, c FROM s{i}
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, cid) = 1
)"""
        )
        if i <= iters:
            parts.append(
                f""",
m{i} AS (
  SELECT a.cid, t.i AS pos, round(avg(e.v[CAST(t.i AS INT)]), 6) AS m
  FROM a{i} a JOIN e USING (vec_id), UNNEST(range(1, len(e.v) + 1)) AS t(i)
  GROUP BY a.cid, t.i
),
cent{i} AS (
  SELECT cid, list(m ORDER BY pos) AS cv FROM m{i} GROUP BY cid
  UNION ALL
  SELECT c.cid, c.cv FROM {prev} c
  WHERE c.cid NOT IN (SELECT cid FROM m{i})
)"""
            )
    fin = f"a{iters + 1}"
    parts.append(
        f""",
pp AS (
  SELECT x.vec_id AS xi, y.vec_id AS yi,
         ex.v[CAST(t.i AS INT)] AS x, ey.v[CAST(t.i AS INT)] AS y
  FROM {fin} x JOIN {fin} y ON x.cid = y.cid AND x.vec_id < y.vec_id
  JOIN e ex ON ex.vec_id = x.vec_id
  JOIN e ey ON ey.vec_id = y.vec_id,
  UNNEST(range(1, len(ex.v) + 1)) AS t(i)
),
pc AS (
  SELECT xi, yi,
         coalesce(round(sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))), 6), -2.0) AS c
  FROM pp GROUP BY xi, yi
),
dup AS (SELECT DISTINCT yi AS vec_id FROM pc WHERE c >= {tau})
SELECT f.cid,
       count(*) AS n_vecs,
       CAST(count(d.vec_id) AS BIGINT) AS n_pruned,
       ((2*1000000*count(d.vec_id) + count(*)) // (2*count(*))) / 1e6 AS prune_rate,
       (((2*(CAST(sum(CAST(round(f.c*1e6) AS BIGINT)) AS BIGINT) + 2000000*count(*)) + count(*))
         // (2*count(*))) - 2000000) / 1e6 AS mean_cos
FROM {fin} f LEFT JOIN dup d USING (vec_id)
GROUP BY f.cid
ORDER BY f.cid"""
    )
    return "".join(parts)


def unigram_tokenizer_report(spark, sf):
    """X41 unigram-LM tokenizer (operators/unigram.py — Kudo 2018,
    arXiv:1804.10959, the SentencePiece unigram model in its bounded
    hard-EM form): seed vocab = top-40 weighted substrings (len 2-4) + all
    single chars, integer nano-log piece costs computed by Spark on the
    tiny vocab frame, in-row Viterbi DP over the DISTINCT-WORD frame
    (exact BIGINT scores, longest-piece tie-break), usage-recount, second
    Viterbi round; the learned word→token-count map broadcast back onto
    the corpus. Report grain lang: docs, word occurrences, unigram piece
    occurrences, pieces-per-word (exact integral half-up division).
    Plan shape: everything between the two corpus scans is
    vocabulary-scale; the DP cost table rides in the expression as a
    literal map (no join inside a round); per-doc apply is explode →
    broadcast join → partial agg. Reference analog: none."""
    from .operators.unigram import train_unigram, unigram_doc_tokens

    d = _spread(t(spark, sf, "documents"))
    seg = train_unigram(
        d, "text", max_word_len=10, piece_len=4, top_s=40, rounds=2
    )
    dt = unigram_doc_tokens(d, seg, "text", "doc_id", 10, extra_cols=("lang",))
    return (
        dt.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").cast("long").alias("word_occurrences"),
            F.sum("n_pieces").cast("long").alias("piece_occurrences"),
        )
        .select(
            "lang",
            "n_docs",
            "word_occurrences",
            "piece_occurrences",
            F.when(
                F.col("word_occurrences") > 0,
                F.expr(
                    "div(2*1000000*piece_occurrences + word_occurrences,"
                    " 2*word_occurrences)"
                )
                / 1e6,
            ).alias("pieces_per_word"),
        )
        .orderBy("lang")
    )


def _oracle_unigram(M: int = 10, L: int = 4, S: int = 40, R: int = 2) -> str:
    """DuckDB replay of unigram_tokenizer_report: both Viterbi rounds
    unrolled as per-position CTE chains (the X36/X40 trajectory pattern) —
    d{r}_{j} holds the best segmentation of every word's j-char prefix,
    built from the ≤L prior positions; row_number ORDER BY s DESC, l DESC
    mirrors the operator's array_max(struct(score, piece_len)) tie rule."""
    parts = [
        r"""WITH norm AS MATERIALIZED (
  SELECT doc_id, lang,
         coalesce(trim(regexp_replace(regexp_replace(lower(text), '[^\p{L} ]+', ' ', 'g'),
                                      '\s+', ' ', 'g')), '') AS t
  FROM documents
),
toks AS MATERIALIZED (
  SELECT doc_id, lang, substr(u.word, 1, """ + str(M) + r""") AS w
  FROM (SELECT doc_id, lang, string_split(t, ' ') AS ws FROM norm WHERE length(t) > 0),
       UNNEST(ws) AS u(word)
),
wf AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS wc FROM toks GROUP BY w),
subs AS MATERIALIZED (
  SELECT substr(w, CAST(i AS INT), CAST(l AS INT)) AS piece, CAST(sum(wc) AS BIGINT) AS cnt
  FROM wf, UNNEST(range(1, len(w) + 1)) AS t(i), UNNEST(range(2, """ + str(L + 1) + r""")) AS u(l)
  WHERE i + l - 1 <= len(w) GROUP BY 1
),
tops AS (SELECT piece, cnt FROM subs ORDER BY cnt DESC, piece LIMIT """ + str(S) + r"""),
chars AS MATERIALIZED (
  SELECT substr(w, CAST(i AS INT), 1) AS piece, CAST(sum(wc) AS BIGINT) AS cnt
  FROM wf, UNNEST(range(1, len(w) + 1)) AS t(i) GROUP BY 1
),
vocab0 AS MATERIALIZED (
  SELECT piece, cnt FROM tops
  UNION ALL
  SELECT c.piece, c.cnt FROM chars c WHERE c.piece NOT IN (SELECT piece FROM tops)
)"""
    ]
    for r in range(R):
        parts.append(
            f""",
cost{r} AS MATERIALIZED (
  SELECT piece, CAST(round(ln((cnt + 1.0) / (tv.tot + tv.v)) * 1e9) AS BIGINT) AS cost
  FROM vocab{r}, (SELECT CAST(sum(cnt) AS BIGINT) AS tot, count(*) AS v FROM vocab{r}) tv
),
d{r}_0 AS MATERIALIZED (SELECT w, wc, CAST(0 AS BIGINT) AS s, '' AS p FROM wf)"""
        )
        for j in range(1, M + 1):
            legs = "\n    UNION ALL\n".join(
                f"""    SELECT d.w, d.wc, d.s + c.cost AS s, {l} AS l,
           d.p || ' ' || substr(d.w, {j - l + 1}, {l}) AS p
    FROM d{r}_{j - l} d JOIN cost{r} c ON c.piece = substr(d.w, {j - l + 1}, {l})
    WHERE len(d.w) >= {j}"""
                for l in range(1, min(L, j) + 1)
            )
            parts.append(
                f""",
d{r}_{j} AS MATERIALIZED (
  SELECT w, wc, s, p FROM (
    SELECT q.*, row_number() OVER (PARTITION BY w ORDER BY s DESC, l DESC) AS rn
    FROM (
{legs}
    ) q
  ) WHERE rn = 1
)"""
            )
        segsel = "\n  UNION ALL\n".join(
            f"  SELECT w, wc, p FROM d{r}_{j} WHERE len(w) = {j}"
            for j in range(1, M + 1)
        )
        parts.append(
            f""",
seg{r} AS MATERIALIZED (
  SELECT w, wc, ltrim(p) AS p FROM (
{segsel}
  )
)"""
        )
        if r < R - 1:
            parts.append(
                f""",
use{r + 1} AS MATERIALIZED (
  SELECT u.piece, CAST(sum(wc) AS BIGINT) AS cnt
  FROM seg{r}, UNNEST(string_split(p, ' ')) AS u(piece) GROUP BY 1
),
vocab{r + 1} AS MATERIALIZED (
  SELECT v.piece, CAST(coalesce(u.cnt, 0) AS BIGINT) AS cnt
  FROM vocab0 v LEFT JOIN use{r + 1} u USING (piece)
)"""
            )
    parts.append(
        f""",
segF AS MATERIALIZED (SELECT w, CAST(len(string_split(p, ' ')) AS BIGINT) AS n_tokens FROM seg{R - 1}),
perdoc AS MATERIALIZED (
  SELECT t.doc_id, CAST(count(*) AS BIGINT) AS nw, CAST(sum(s.n_tokens) AS BIGINT) AS np
  FROM toks t JOIN segF s USING (w) GROUP BY t.doc_id
),
alldocs AS MATERIALIZED (
  SELECT n.doc_id, n.lang, coalesce(p.nw, 0) AS nw, coalesce(p.np, 0) AS np
  FROM norm n LEFT JOIN perdoc p USING (doc_id)
)
SELECT lang, count(*) AS n_docs,
       CAST(sum(nw) AS BIGINT) AS word_occurrences,
       CAST(sum(np) AS BIGINT) AS piece_occurrences,
       CASE WHEN sum(nw) > 0
            THEN ((2*1000000*CAST(sum(np) AS BIGINT) + CAST(sum(nw) AS BIGINT))
                  // (2*CAST(sum(nw) AS BIGINT))) / 1e6
       END AS pieces_per_word
FROM alldocs GROUP BY lang ORDER BY lang"""
    )
    return "".join(parts)


def pq_ann_topk(spark, sf):
    """X42 product-quantization ANN (operators/pq.py — Jégou et al. 2011,
    IEEE TPAMI): per-subspace k-means codebooks (m=8 subspaces × k=16
    centroids, 2 deterministic Lloyd iterations, md5 seeds, 6dp-quantized
    state), vectors encoded to 8 small ints, query answered by ADC —
    per-subspace 6dp distance-table lookups summed in subspace order.
    Top-10 ascending ADC to vec_id 0's vector, vec_id tiebreak. Plan
    shape: training is one zero-shuffle assignment map + ONE map-side
    (subspace, cid, dim) mean per iteration (all m subspaces in the same
    pass); encode is in-row; search scans the CODE column only and ends in
    a TakeOrderedAndProject. Completes the ANN family (brute-force / LSH /
    IVF / PQ). Reference analog: none."""
    from .operators.pq import pq_adc_top_k, pq_encode, pq_train

    e = t(spark, sf, "embeddings")
    # query rounded by SPARK's round (the engine the oracle twins against),
    # not python's half-even round
    qrow = (
        e.filter(F.col("vec_id") == 0)
        .select(
            F.transform(
                F.col("embedding"), lambda x: F.round(x.cast("double"), 6)
            ).alias("q")
        )
        .collect()
    )
    query = [float(x) for x in qrow[0][0]]
    books = pq_train(e, "embedding", "vec_id", m=8, k=16, dim=64, iters=2)
    codes = pq_encode(e, "embedding", "vec_id", books)
    return pq_adc_top_k(codes, "vec_id", books, query, top_k=10)


def _oracle_pq(m: int = 8, k: int = 16, dim: int = 64, iters: int = 2,
               top_k: int = 10) -> str:
    """DuckDB replay of pq_ann_topk: each subspace's Lloyd trajectory
    unrolled as MATERIALIZED CTE chains (the X40/X41 pattern), squared-L2
    via the UNNEST sum twin, empty cells keeping their previous centroid,
    the query taken as vec_id 0's 6dp-rounded vector."""
    sub = dim // m
    seed = "md5('pq-seed-v1:' || CAST(vec_id AS VARCHAR))"
    parts = [
        f"""WITH e AS MATERIALIZED (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
q AS MATERIALIZED (
  SELECT list_transform(v, x -> round(x, 6)) AS v FROM e WHERE vec_id = 0
),
seedv AS MATERIALIZED (
  SELECT row_number() OVER (ORDER BY {seed}, vec_id) AS cid,
         list_transform(v, x -> round(x, 6)) AS sv
  FROM (SELECT vec_id, v FROM e ORDER BY {seed}, vec_id LIMIT {k})
)"""
    ]
    for s in range(m):
        off = s * sub
        parts.append(
            f""",
cb{s}_0 AS MATERIALIZED (SELECT cid, sv[{off + 1}:{off + sub}] AS cv FROM seedv)"""
        )
        for it in range(1, iters + 2):  # iters updates + final assignment
            prev = f"cb{s}_{it - 1}"
            parts.append(
                f""",
a{s}_{it} AS MATERIALIZED (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, cid ASC) AS rn
    FROM (
      SELECT e.vec_id, c.cid,
             round(sum((e.v[CAST({off} + t.i AS INT)] - c.cv[CAST(t.i AS INT)])
                     * (e.v[CAST({off} + t.i AS INT)] - c.cv[CAST(t.i AS INT)])), 6) AS d
      FROM e, {prev} c, UNNEST(range(1, {sub + 1})) AS t(i)
      GROUP BY e.vec_id, c.cid
    )
  ) WHERE rn = 1
)"""
            )
            if it <= iters:
                parts.append(
                    f""",
m{s}_{it} AS MATERIALIZED (
  SELECT a.cid, t.i AS pos, round(avg(e.v[CAST({off} + t.i AS INT)]), 6) AS mean
  FROM a{s}_{it} a JOIN e USING (vec_id), UNNEST(range(1, {sub + 1})) AS t(i)
  GROUP BY a.cid, t.i
),
cb{s}_{it} AS MATERIALIZED (
  SELECT cid, list(mean ORDER BY pos) AS cv FROM m{s}_{it} GROUP BY cid
  UNION ALL
  SELECT c.cid, c.cv FROM {prev} c WHERE c.cid NOT IN (SELECT cid FROM m{s}_{it})
)"""
                )
        parts.append(
            f""",
t{s} AS MATERIALIZED (
  SELECT a.vec_id,
         round(sum((q.v[CAST({off} + t.i AS INT)] - c.cv[CAST(t.i AS INT)])
                 * (q.v[CAST({off} + t.i AS INT)] - c.cv[CAST(t.i AS INT)])), 6) AS d
  FROM a{s}_{iters + 1} a JOIN cb{s}_{iters} c USING (cid), q,
       UNNEST(range(1, {sub + 1})) AS t(i)
  GROUP BY a.vec_id
)"""
        )
    chain = " + ".join(f"t{s}.d" for s in range(m))
    joins = "\n".join(f"JOIN t{s} USING (vec_id)" for s in range(m))
    parts.append(
        f"""
SELECT vec_id, round({chain}, 6) AS adc
FROM e
{joins}
ORDER BY {chain} ASC, vec_id
LIMIT {top_k}"""
    )
    return "".join(parts)


def ivfpq_ann_topk(spark, sf):
    """X43 IVF-PQ composite ANN (operators/pq.py — the FAISS IVFPQ layout,
    Jégou et al. 2011 §IV): a coarse quantizer (deterministic Lloyd, m=1)
    routes vectors to 8 cells; RESIDUALS v − coarse[cell] are PQ-encoded
    (m=8 × k=16); the query probes its 3 nearest cells and ADC-scans their
    codes only. Probe choice is ranked BY SPARK over the literal coarse
    frame (engine-parity — no python-float rounding picks discrete
    outcomes). At scale the cell id is a partition column: probing IS
    partition pruning, and each row is m small ints — the billion-vector
    index shape; plan ends in a TakeOrderedAndProject. Fully oracle-
    replayed: coarse trajectory, residuals, all 8 residual-codebook
    trajectories, probe ranking, ADC. Reference analog: none."""
    from .operators.pq import ivfpq_build, ivfpq_top_k

    e = t(spark, sf, "embeddings")
    qrow = (
        e.filter(F.col("vec_id") == 0)
        .select(
            F.transform(
                F.col("embedding"), lambda x: F.round(x.cast("double"), 6)
            ).alias("q")
        )
        .collect()
    )
    query = [float(x) for x in qrow[0][0]]
    coarse, books, codes = ivfpq_build(
        e, "embedding", "vec_id", n_cells=8, m=8, k=16, dim=64, iters=2
    )
    return ivfpq_top_k(codes, "vec_id", coarse, books, query, n_probe=3, top_k=10)


def _oracle_ivfpq(n_cells: int = 8, m: int = 8, k: int = 16, dim: int = 64,
                  iters: int = 2, n_probe: int = 3, top_k: int = 10) -> str:
    """DuckDB replay of ivfpq_ann_topk: the coarse Lloyd chain (full-dim,
    k=n_cells), the residual construction, all m residual-codebook chains,
    the probe ranking, and the per-cell residual ADC — every CTE
    MATERIALIZED (the X41 exponential-inlining lesson)."""
    sub = dim // m
    seed = "md5('pq-seed-v1:' || CAST(vec_id AS VARCHAR))"

    def kmeans_chain(pre: str, src: str, seedcte: str, off: int, d: int,
                     kk: int, its: int) -> str:
        out = [f""",
{pre}cb_0 AS MATERIALIZED (SELECT cid, sv[{off + 1}:{off + d}] AS cv FROM {seedcte})"""]
        for it in range(1, its + 2):
            prev = f"{pre}cb_{it - 1}"
            out.append(f""",
{pre}a_{it} AS MATERIALIZED (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, cid ASC) AS rn
    FROM (
      SELECT e.vec_id, c.cid,
             round(sum((e.v[CAST({off} + t.i AS INT)] - c.cv[CAST(t.i AS INT)])
                     * (e.v[CAST({off} + t.i AS INT)] - c.cv[CAST(t.i AS INT)])), 6) AS d
      FROM {src} e, {prev} c, UNNEST(range(1, {d + 1})) AS t(i)
      GROUP BY e.vec_id, c.cid
    )
  ) WHERE rn = 1
)""")
            if it <= its:
                out.append(f""",
{pre}m_{it} AS MATERIALIZED (
  SELECT a.cid, t.i AS pos, round(avg(e.v[CAST({off} + t.i AS INT)]), 6) AS mean
  FROM {pre}a_{it} a JOIN {src} e USING (vec_id), UNNEST(range(1, {d + 1})) AS t(i)
  GROUP BY a.cid, t.i
),
{pre}cb_{it} AS MATERIALIZED (
  SELECT cid, list(mean ORDER BY pos) AS cv FROM {pre}m_{it} GROUP BY cid
  UNION ALL
  SELECT c.cid, c.cv FROM {prev} c WHERE c.cid NOT IN (SELECT cid FROM {pre}m_{it})
)""")
        return "".join(out)

    parts = [f"""WITH e AS MATERIALIZED (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
q AS MATERIALIZED (
  SELECT list_transform(v, x -> round(x, 6)) AS v FROM e WHERE vec_id = 0
),
cseedv AS MATERIALIZED (
  SELECT row_number() OVER (ORDER BY {seed}, vec_id) AS cid,
         list_transform(v, x -> round(x, 6)) AS sv
  FROM (SELECT vec_id, v FROM e ORDER BY {seed}, vec_id LIMIT {n_cells})
)"""]
    parts.append(kmeans_chain("c", "e", "cseedv", 0, dim, n_cells, iters))
    parts.append(f""",
resid AS MATERIALIZED (
  SELECT a.vec_id, list(e.v[CAST(t.i AS INT)] - c.cv[CAST(t.i AS INT)] ORDER BY t.i) AS v
  FROM ca_{iters + 1} a JOIN e USING (vec_id) JOIN ccb_{iters} c USING (cid),
       UNNEST(range(1, {dim + 1})) AS t(i)
  GROUP BY a.vec_id
),
rseedv AS MATERIALIZED (
  SELECT row_number() OVER (ORDER BY {seed}, vec_id) AS cid,
         list_transform(v, x -> round(x, 6)) AS sv
  FROM (SELECT vec_id, v FROM resid ORDER BY {seed}, vec_id LIMIT {k})
)""")
    for s in range(m):
        parts.append(
            kmeans_chain(f"r{s}", "resid", "rseedv", s * sub, sub, k, iters)
        )
    parts.append(f""",
probe AS MATERIALIZED (
  SELECT cid FROM (
    SELECT c.cid,
           round(sum((c.cv[CAST(t.i AS INT)] - q.v[CAST(t.i AS INT)])
                   * (c.cv[CAST(t.i AS INT)] - q.v[CAST(t.i AS INT)])), 6) AS d
    FROM ccb_{iters} c, q, UNNEST(range(1, {dim + 1})) AS t(i)
    GROUP BY c.cid
  ) ORDER BY d ASC, cid ASC LIMIT {n_probe}
)""")
    for s in range(m):
        off = s * sub
        parts.append(f""",
t{s} AS MATERIALIZED (
  SELECT a.vec_id,
         round(sum(((q.v[CAST({off} + t.i AS INT)] - cc.cv[CAST({off} + t.i AS INT)])
                    - c.cv[CAST(t.i AS INT)])
                 * ((q.v[CAST({off} + t.i AS INT)] - cc.cv[CAST({off} + t.i AS INT)])
                    - c.cv[CAST(t.i AS INT)])), 6) AS d
  FROM ca_{iters + 1} a
  JOIN ccb_{iters} cc ON cc.cid = a.cid
  JOIN r{s}a_{iters + 1} r2 ON r2.vec_id = a.vec_id
  JOIN r{s}cb_{iters} c ON c.cid = r2.cid, q,
       UNNEST(range(1, {sub + 1})) AS t(i)
  WHERE a.cid IN (SELECT cid FROM probe)
  GROUP BY a.vec_id
)""")
    chain = " + ".join(f"t{s}.d" for s in range(m))
    joins = "\n".join(f"JOIN t{s} USING (vec_id)" for s in range(m))
    parts.append(f"""
SELECT vec_id, a.cid AS cell, round({chain}, 6) AS adc
FROM ca_{iters + 1} a
{joins}
WHERE a.cid IN (SELECT cid FROM probe)
ORDER BY {chain} ASC, vec_id
LIMIT {top_k}""")
    return "".join(parts)


# ---------------------------------------------------------------------------
# Training-data ops (r3, wave 2): line dedup, domain caps, corpus mixing
# ---------------------------------------------------------------------------
def line_dedup_report(spark, sf):
    """Line-level dedup (operators/linededup.py — the CCNet/RefinedWeb
    boilerplate-removal pass): lines repeating >= 5 times corpus-wide are
    dropped from every document. The synthetic corpus has no newlines, so
    lines are derived deterministically (3-token windows over the
    normalized text) and the oracle replays the same derivation. Per-lang
    report: docs, total lines, lines removed, mean retained char fraction,
    docs fully emptied. Plan shape: one map-side-combined line-count
    aggregation; the banned set is the small repetition tail and joins the
    corpus as a broadcast anti-join — the corpus never shuffles for
    membership (same 100 TB shape as contamination_report)."""
    from .operators.linededup import banned_lines, doc_lines

    d = _spread(t(spark, sf, "documents"))
    lines = doc_lines(d, "text", "doc_id", line_len=3)
    banned = banned_lines(lines, min_count=5)
    kept = lines.join(F.broadcast(banned), "_line", "left_anti")
    tot = lines.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("_nl"), F.sum(F.length("_line")).alias("_tc")
    )
    kst = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("_nk"), F.sum(F.length("_line")).alias("_kc")
    )
    per_doc = (
        d.select("doc_id", "lang")
        .join(tot, "doc_id", "left")
        .join(kst, "doc_id", "left")
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.coalesce(F.sum("_nl"), F.lit(0)).cast("long").alias("total_lines"),
            (F.coalesce(F.sum("_nl"), F.lit(0)) - F.coalesce(F.sum("_nk"), F.lit(0)))
            .cast("long")
            .alias("lines_removed"),
            _r(
                F.avg(
                    F.when(
                        F.col("_tc") > 0,
                        F.coalesce(F.col("_kc"), F.lit(0)) / F.col("_tc"),
                    )
                )
            ).alias("avg_retained_frac"),
            F.sum(
                F.when(
                    (F.col("_nl") > 0) & (F.coalesce(F.col("_nk"), F.lit(0)) == 0), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_docs_emptied"),
        )
        .orderBy("lang")
    )


ORACLE_LINE_DEDUP_REPORT = r"""
WITH norm AS (
  SELECT doc_id, lang,
         coalesce(trim(regexp_replace(regexp_replace(lower(text), '[^\p{L} ]+', ' ', 'g'),
                                      '\s+', ' ', 'g')), '') AS t
  FROM documents
),
toks AS (
  SELECT doc_id, string_split(t, ' ') AS w FROM norm WHERE length(t) > 0
),
lines AS (
  SELECT doc_id,
         array_to_string(w[CAST(i * 3 + 1 AS INT):CAST(i * 3 + 3 AS INT)], ' ') AS line
  FROM toks, UNNEST(range(0, CAST(ceil(len(w) / 3.0) AS BIGINT))) AS u(i)
),
banned AS (SELECT line FROM lines GROUP BY line HAVING count(*) >= 5),
kept AS (
  SELECT l.doc_id, l.line
  FROM lines l LEFT JOIN banned b USING (line)
  WHERE b.line IS NULL
),
tot AS (
  SELECT doc_id, count(*) AS nl, sum(length(line)) AS tc FROM lines GROUP BY doc_id
),
kst AS (
  SELECT doc_id, count(*) AS nk, sum(length(line)) AS kc FROM kept GROUP BY doc_id
)
SELECT n.lang,
       count(*) AS n_docs,
       CAST(coalesce(sum(t.nl), 0) AS BIGINT) AS total_lines,
       CAST(coalesce(sum(t.nl), 0) - coalesce(sum(k.nk), 0) AS BIGINT) AS lines_removed,
       round(avg(CASE WHEN t.tc > 0 THEN coalesce(k.kc, 0) * 1.0 / t.tc END), 6) AS avg_retained_frac,
       CAST(coalesce(sum(CASE WHEN t.nl > 0 AND coalesce(k.nk, 0) = 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_docs_emptied
FROM norm n
LEFT JOIN tot t USING (doc_id)
LEFT JOIN kst k USING (doc_id)
GROUP BY n.lang
ORDER BY n.lang
"""


def exact_substr_report(spark, sf):
    """Exact-substring dedup (X37, operators/exactsubstr.py — the bounded
    ExactSubstr mode of Lee et al. 2022, arXiv:2107.06499): tokens covered
    by any 8-token window whose fingerprint appears in >= 2 distinct
    documents are cut from every document (all copies — deviation from the
    paper's keep-one recorded in the operator docstring). Per-lang report:
    docs, affected docs, token totals, dropped tokens, drop fraction.
    Plan shape: fingerprints built in-row (slice -> join -> md5 transform;
    the text never shuffles), one map-side-combined countDistinct census
    over 16-byte keys, duplicated tail + per-doc start lists broadcast
    back, span drop one in-row position filter. Production swaps md5 for
    xxhash64 (the minhash_pairs_md5 twin pattern)."""
    from .operators.exactsubstr import exact_substr_dedup

    d = _spread(t(spark, sf, "documents"))
    e = exact_substr_dedup(
        d, "text", "doc_id", k=8, min_docs=2, keep_cols=("lang",)
    )
    tt = F.col("total_tokens")
    return (
        e.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("n_dropped") > 0).cast("long")).alias("affected_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.sum("n_dropped").cast("long").alias("dropped_tokens"),
        )
        .select(
            "lang",
            "n_docs",
            "affected_docs",
            "total_tokens",
            "dropped_tokens",
            F.when(tt > 0, _r(F.col("dropped_tokens") / tt)).alias("drop_frac"),
        )
        .orderBy("lang")
    )


ORACLE_EXACT_SUBSTR_REPORT = r"""
WITH norm AS (
  SELECT doc_id, lang,
         coalesce(trim(regexp_replace(regexp_replace(lower(text), '[^\p{L} ]+', ' ', 'g'),
                                      '\s+', ' ', 'g')), '') AS t
  FROM documents
),
toks AS (
  SELECT doc_id, string_split(t, ' ') AS w FROM norm WHERE length(t) > 0
),
wins AS (
  SELECT doc_id, i AS s,
         md5(array_to_string(w[CAST(i + 1 AS INT):CAST(i + 8 AS INT)], ' ')) AS fp
  FROM toks, UNNEST(range(0, len(w) - 7)) AS r(i)
),
dup AS (SELECT fp FROM wins GROUP BY fp HAVING count(DISTINCT doc_id) >= 2),
ds AS (SELECT doc_id, s FROM wins JOIN dup USING (fp)),
pos AS (
  SELECT t.doc_id, i AS p
  FROM toks t, UNNEST(range(0, len(w))) AS r(i)
),
dropped AS (
  SELECT p.doc_id, count(*) AS nd
  FROM pos p
  WHERE EXISTS (SELECT 1 FROM ds WHERE ds.doc_id = p.doc_id
                AND p.p BETWEEN ds.s AND ds.s + 7)
  GROUP BY p.doc_id
),
per_doc AS (
  SELECT n.doc_id, n.lang,
         coalesce(len(t2.w), 0) AS n_tokens,
         coalesce(d.nd, 0) AS n_dropped
  FROM norm n
  LEFT JOIN toks t2 USING (doc_id)
  LEFT JOIN dropped d USING (doc_id)
)
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN n_dropped > 0 THEN 1 ELSE 0 END) AS BIGINT) AS affected_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(sum(n_dropped) AS BIGINT) AS dropped_tokens,
       CASE WHEN sum(n_tokens) > 0
            THEN round(sum(n_dropped) * 1.0 / sum(n_tokens), 6) END AS drop_frac
FROM per_doc
GROUP BY lang
ORDER BY lang
"""


def exact_substr_keep_one_report(spark, sf):
    """ExactSubstr in Lee et al.'s KEEP-ONE mode (keep_first=True): each
    duplicated fingerprint's canonical occurrence — the lexicographically
    smallest (doc_id, start) — survives; every other copy's span drops.
    Same per-lang columns as exact_substr_report, so the pair quantifies
    what keep-one preserves vs all-copies. The canonical-exemption frame
    is one row per duplicated fingerprint (dup-tail scale) and broadcasts;
    the oracle replays the exemption as a row_number()-over-(doc,start)
    window on the occurrence frame."""
    from .operators.exactsubstr import exact_substr_dedup

    d = _spread(t(spark, sf, "documents"))
    e = exact_substr_dedup(
        d, "text", "doc_id", k=8, min_docs=2, keep_cols=("lang",), keep_first=True
    )
    tt = F.col("total_tokens")
    return (
        e.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("n_dropped") > 0).cast("long")).alias("affected_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.sum("n_dropped").cast("long").alias("dropped_tokens"),
        )
        .select(
            "lang",
            "n_docs",
            "affected_docs",
            "total_tokens",
            "dropped_tokens",
            F.when(tt > 0, _r(F.col("dropped_tokens") / tt)).alias("drop_frac"),
        )
        .orderBy("lang")
    )


ORACLE_EXACT_SUBSTR_KEEP_ONE = r"""
WITH norm AS (
  SELECT doc_id, lang,
         coalesce(trim(regexp_replace(regexp_replace(lower(text), '[^\p{L} ]+', ' ', 'g'),
                                      '\s+', ' ', 'g')), '') AS t
  FROM documents
),
toks AS (
  SELECT doc_id, string_split(t, ' ') AS w FROM norm WHERE length(t) > 0
),
wins AS (
  SELECT doc_id, i AS s,
         md5(array_to_string(w[CAST(i + 1 AS INT):CAST(i + 8 AS INT)], ' ')) AS fp
  FROM toks, UNNEST(range(0, len(w) - 7)) AS r(i)
),
dup AS (SELECT fp FROM wins GROUP BY fp HAVING count(DISTINCT doc_id) >= 2),
occ AS (
  SELECT doc_id, s,
         row_number() OVER (PARTITION BY fp ORDER BY doc_id, s) AS rn
  FROM wins JOIN dup USING (fp)
),
ds AS (SELECT doc_id, s FROM occ WHERE rn > 1),
pos AS (
  SELECT t.doc_id, i AS p
  FROM toks t, UNNEST(range(0, len(w))) AS r(i)
),
dropped AS (
  SELECT p.doc_id, count(*) AS nd
  FROM pos p
  WHERE EXISTS (SELECT 1 FROM ds WHERE ds.doc_id = p.doc_id
                AND p.p BETWEEN ds.s AND ds.s + 7)
  GROUP BY p.doc_id
),
per_doc AS (
  SELECT n.doc_id, n.lang,
         coalesce(len(t2.w), 0) AS n_tokens,
         coalesce(d.nd, 0) AS n_dropped
  FROM norm n
  LEFT JOIN toks t2 USING (doc_id)
  LEFT JOIN dropped d USING (doc_id)
)
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN n_dropped > 0 THEN 1 ELSE 0 END) AS BIGINT) AS affected_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(sum(n_dropped) AS BIGINT) AS dropped_tokens,
       CASE WHEN sum(n_tokens) > 0
            THEN round(sum(n_dropped) * 1.0 / sum(n_tokens), 6) END AS drop_frac
FROM per_doc
GROUP BY lang
ORDER BY lang
"""


def domain_cap_report(spark, sf):
    """Per-domain document caps (functions/url.py): the crawl-pipeline rule
    "at most N documents per registered domain" (defense against
    single-site dominance), plus the URL-function surface — host /
    registered-domain extraction, path depth, tracking-parameter
    stripping. URLs are planted deterministically from (source, doc_id)
    since the corpus has none; the oracle replays the derivation. Cap = 3
    per domain in md5(doc_id) hash order (doc_id tiebreak). Per-source
    report: docs, distinct domains, kept/dropped under the cap, mean path
    depth, tracking-URL count. Plan shape: URL parsing is codegen
    scan-speed; the cap is one row_number window partitioned by domain —
    domains are many and bounded-size, so no skewed partition at scale."""
    from .functions.url import (
        strip_url_params,
        url_path_depth,
        url_registered_domain,
    )

    d = t(spark, sf, "documents")
    did = F.col("doc_id")
    url = F.concat(
        F.lit("https://www."),
        F.col("source"),
        (did % 40).cast("string"),
        F.element_at(
            F.array(F.lit(".com"), F.lit(".org"), F.lit(".net")),
            (did % 3 + 1).cast("int"),
        ),
        F.lit("/"),
        F.col("lang"),
        F.when(did % 4 == 0, F.lit("/sub")).otherwise(F.lit("")),
        F.lit("/p"),
        did.cast("string"),
        F.when(did % 5 == 0, F.lit("?utm_source=x&ref=1")).otherwise(F.lit("")),
    )
    rows = d.select("doc_id", "source", url.alias("_url")).select(
        "doc_id",
        "source",
        url_registered_domain(F.col("_url")).alias("_dom"),
        url_path_depth(F.col("_url")).alias("_depth"),
        (F.length("_url") - F.length(strip_url_params(F.col("_url")))).alias("_qlen"),
    )
    w = W.partitionBy("_dom").orderBy(F.md5(did.cast("string")), "doc_id")
    rows = rows.withColumn("_rn", F.row_number().over(w))
    return (
        rows.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("_dom").cast("long").alias("n_domains"),
            F.sum(F.when(F.col("_rn") <= 3, 1).otherwise(0))
            .cast("long")
            .alias("n_kept"),
            F.sum(F.when(F.col("_rn") > 3, 1).otherwise(0))
            .cast("long")
            .alias("n_dropped"),
            _r(F.avg("_depth")).alias("avg_path_depth"),
            F.sum(F.when(F.col("_qlen") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_tracking_urls"),
        )
        .orderBy("source")
    )


ORACLE_DOMAIN_CAP_REPORT = r"""
WITH u AS (
  SELECT doc_id, source,
         'https://www.' || source || CAST(doc_id % 40 AS VARCHAR)
         || CASE doc_id % 3 WHEN 0 THEN '.com' WHEN 1 THEN '.org' ELSE '.net' END
         || '/' || lang
         || CASE WHEN doc_id % 4 = 0 THEN '/sub' ELSE '' END
         || '/p' || CAST(doc_id AS VARCHAR)
         || CASE WHEN doc_id % 5 = 0 THEN '?utm_source=x&ref=1' ELSE '' END AS url
  FROM documents
),
p AS (
  SELECT doc_id, source, url,
         regexp_extract(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)', 1),
                        '([^.]+\.[^.]+)$', 1) AS dom,
         regexp_replace(regexp_replace(
             regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)', 1),
             '/+', '/', 'g'), '/$', '') AS np,
         length(url) - length(regexp_replace(url, '[?#].*$', '')) AS qlen
  FROM u
),
r AS (
  SELECT source,
         length(np) - length(replace(np, '/', '')) AS depth, qlen,
         dom,
         row_number() OVER (PARTITION BY dom
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM p
)
SELECT source,
       count(*) AS n_docs,
       CAST(count(DISTINCT dom) AS BIGINT) AS n_domains,
       CAST(sum(CASE WHEN rn <= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN rn > 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       round(avg(depth), 6) AS avg_path_depth,
       CAST(sum(CASE WHEN qlen > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_tracking_urls
FROM r
GROUP BY source
ORDER BY source
"""


def mixing_report(spark, sf):
    """Corpus mixing (operators/mixing.py): deterministic source-weighted
    downsampling to a target mixture — odd-numbered sources weighted 1.5,
    even 0.5, target corpus 60% of the input; each source's keep quota is
    its weight share of the target, capped at its size, filled in
    md5(doc_id) hash order (the exact-quota oracle twin; the windowless
    hash-threshold production form is documented in the module). Per-source
    report: docs, weight, quota, kept, kept fraction."""
    from .operators.mixing import apply_mixture, source_quotas

    d = t(spark, sf, "documents")
    wexpr = F.when(
        F.regexp_extract(F.col("source"), r"([0-9]+)$", 1).cast("int") % 2 == 1,
        F.lit(1.5),
    ).otherwise(F.lit(0.5))
    quotas = source_quotas(d, "source", wexpr, target_frac=0.6)
    kept = apply_mixture(d, "source", "doc_id", quotas)
    kc = kept.groupBy("source").agg(F.count(F.lit(1)).alias("_k"))
    return (
        quotas.join(kc, "source", "left")
        .select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            _r(F.col("weight")).alias("weight"),
            F.col("quota"),
            F.coalesce(F.col("_k"), F.lit(0)).cast("long").alias("n_kept"),
            _r(
                F.when(
                    F.col("n_docs") > 0,
                    F.coalesce(F.col("_k"), F.lit(0)) / F.col("n_docs"),
                )
            ).alias("kept_frac"),
        )
        .orderBy("source")
    )


ORACLE_MIXING_REPORT = r"""
WITH counts AS (
  SELECT source, count(*) AS n_docs,
         CASE WHEN CAST(regexp_extract(source, '([0-9]+)$', 1) AS INT) % 2 = 1
              THEN 1.5 ELSE 0.5 END AS weight
  FROM documents GROUP BY source
),
tot AS (SELECT sum(n_docs) AS total, sum(weight) AS sum_w FROM counts),
q AS (
  SELECT c.source, c.n_docs, c.weight,
         least(c.n_docs,
               CAST(floor(c.weight / t.sum_w * floor(t.total * 0.6)) AS BIGINT)) AS quota
  FROM counts c, tot t
),
ranked AS (
  SELECT source,
         row_number() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents
),
k AS (
  SELECT r.source, count(*) AS n_kept
  FROM ranked r JOIN q USING (source)
  WHERE r.rn <= q.quota
  GROUP BY r.source
)
SELECT q.source,
       CAST(q.n_docs AS BIGINT) AS n_docs,
       round(q.weight, 6) AS weight,
       q.quota,
       CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
       round(CASE WHEN q.n_docs > 0
                  THEN coalesce(k.n_kept, 0) * 1.0 / q.n_docs END, 6) AS kept_frac
FROM q LEFT JOIN k USING (source)
ORDER BY q.source
"""


def bpe_merge_report(spark, sf):
    """BPE merge-pair mining (operators/bpe.py): the 20 adjacent character
    pairs a byte-pair-encoding trainer would merge first — occurrences
    weighted by corpus word frequency (all positions counted, overlaps
    included, as in the common reference implementations), with the
    distinct-word support count. Total order (count desc, pair asc) makes
    the LIMIT deterministic. Plan shape: word counts collapse map-side;
    the pair explode runs over the DISTINCT-word frame, so the expensive
    stage scales with vocabulary, not corpus; the ranking is a
    TakeOrderedAndProject top-k."""
    from .operators.bpe import merge_pair_counts, word_frequencies

    d = t(spark, sf, "documents")
    words = word_frequencies(d, "text")
    return (
        merge_pair_counts(words)
        .orderBy(F.col("total_count").desc(), "pair")
        .limit(20)
    )


ORACLE_BPE_MERGE_REPORT = r"""
WITH norm AS (
  SELECT coalesce(trim(regexp_replace(regexp_replace(lower(text), '[^\p{L} ]+', ' ', 'g'),
                                      '\s+', ' ', 'g')), '') AS t
  FROM documents
),
words AS (
  SELECT tok AS word, count(*) AS wc
  FROM (SELECT string_split(t, ' ') AS w FROM norm WHERE length(t) > 0),
       UNNEST(w) AS u(tok)
  GROUP BY tok
),
pairs AS (
  SELECT substr(word, CAST(i AS INT), 2) AS pair, word, wc
  FROM words, UNNEST(range(1, length(word))) AS r(i)
)
SELECT pair,
       CAST(sum(wc) AS BIGINT) AS total_count,
       CAST(count(DISTINCT word) AS BIGINT) AS n_words
FROM pairs
GROUP BY pair
ORDER BY total_count DESC, pair
LIMIT 20
"""


_BPE_ENCODE_MERGES = 8


def bpe_encode_report(spark, sf):
    """BPE encode (X36, operators/bpe.py): ITERATIVE BPE training — pair
    stats re-counted after every merge, the real Sennrich trainer loop, 8
    merges — then the learned merges applied back to the corpus for per-lang
    BPE token counts. Every training step runs on the distinct-word frame
    (vocabulary-scale, not corpus-scale); the corpus is scanned twice (word
    mining, token map-back via broadcast vocab join). The ``merges`` column
    carries the learned rank-ordered merge list, so the oracle hash pins the
    TRAINING TRAJECTORY, not just the counts — DuckDB replays all 8
    mine→argmax→fold steps as unrolled CTEs (list_reduce twin of the
    F.aggregate fold)."""
    from .functions.ngram import word_tokens
    from .operators.bpe import bpe_vocab, train_bpe, word_frequencies

    d = t(spark, sf, "documents")
    trained, merges = train_bpe(
        word_frequencies(d, "text"), _BPE_ENCODE_MERGES
    )
    vocab = bpe_vocab(trained)
    dw = (
        d.select("lang", F.explode(word_tokens(F.col("text"))).alias("word"))
        .groupBy("lang", "word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tok = (
        dw.join(F.broadcast(vocab), "word")
        .groupBy("lang")
        .agg(
            F.sum("c").cast("long").alias("n_words"),
            F.sum(F.col("c") * F.col("n_tok")).cast("long").alias("bpe_tokens"),
        )
    )
    base = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    nw = F.coalesce(F.col("n_words"), F.lit(0).cast("long"))
    bt = F.coalesce(F.col("bpe_tokens"), F.lit(0).cast("long"))
    return (
        # per-lang frames are lang-cardinality-bounded: broadcast, don't SMJ
        base.join(F.broadcast(tok), "lang", "left")
        .select(
            "lang",
            "n_docs",
            nw.alias("n_words"),
            bt.alias("bpe_tokens"),
            F.when(nw > 0, F.round(bt / nw, 6)).alias("tokens_per_word"),
            F.lit(" ".join(a + b for a, b in merges)).alias("merges"),
        )
        .orderBy("lang")
    )


def _bpe_trainer_ctes(n_merges: int = _BPE_ENCODE_MERGES) -> str:
    """The shared unrolled-CTE replay of the full iterative BPE trainer
    (norm → words → w0 → [p/m/w]x{n} → vocab): per merge i, p{i} re-counts
    adjacent symbol pairs (weighted, overlaps included), m{i} takes the
    (count desc, a, b) argmax, w{i} applies it with the list_reduce fold —
    the exact twin of operators/bpe.py _apply_merge (list_reduce seeds the
    accumulator with the first element, matching F.aggregate's explicit
    init). Used by both the encode and the BPE-packing oracles.

    Saturation: when the vocabulary fully merges before n_merges steps,
    train_bpe breaks early keeping the vocab; here m{i} goes empty, so
    w{i} joins it LEFT ... ON TRUE (never CROSS — that would empty the
    word frame) and the NULL a/b make the fold a no-op reconstruction of
    seq. concat_ws in the merges column skips the NULL scalar subqueries,
    matching Spark's shorter merge list (pytest-pinned on a saturating
    corpus)."""
    steps = []
    for i in range(1, n_merges + 1):
        p = i - 1
        steps.append(rf"""p{i} AS (
  SELECT s[j] AS a, s[j + 1] AS b, sum(wc) AS cnt
  FROM (SELECT string_split(seq, ' ') AS s, wc FROM w{p}),
       UNNEST(range(1, len(s))) AS r(j)
  GROUP BY 1, 2
),
m{i} AS (SELECT a, b FROM p{i} ORDER BY cnt DESC, a, b LIMIT 1),
w{i} AS (
  SELECT word, wc,
         list_reduce(string_split(seq, ' '),
           (acc, x) -> CASE WHEN split_part(acc, ' ', -1) = m.a AND x = m.b
                            THEN acc || x ELSE acc || ' ' || x END) AS seq
  FROM w{p} LEFT JOIN m{i} m ON TRUE
)""")
    return rf"""norm AS (
  SELECT doc_id, lang,
         coalesce(trim(regexp_replace(regexp_replace(lower(text), '[^\p{{L}} ]+', ' ', 'g'),
                                      '\s+', ' ', 'g')), '') AS t
  FROM documents
),
words AS (
  SELECT tok AS word, count(*) AS wc
  FROM (SELECT string_split(t, ' ') AS w FROM norm WHERE length(t) > 0),
       UNNEST(w) AS u(tok)
  GROUP BY tok
),
w0 AS (SELECT word, wc, array_to_string(string_split(word, ''), ' ') AS seq FROM words),
{",".join(steps)},
vocab AS (SELECT word, CAST(len(string_split(seq, ' ')) AS BIGINT) AS n_tok FROM w{n_merges})"""


def _oracle_bpe_encode(n_merges: int = _BPE_ENCODE_MERGES) -> str:
    merge_parts = ", ".join(
        f"(SELECT a || b FROM m{i})" for i in range(1, n_merges + 1)
    )
    return rf"""
WITH {_bpe_trainer_ctes(n_merges)},
docw AS (
  SELECT lang, tok AS word, count(*) AS c
  FROM (SELECT lang, string_split(t, ' ') AS w FROM norm WHERE length(t) > 0),
       UNNEST(w) AS u(tok)
  GROUP BY lang, tok
),
tokc AS (
  SELECT lang, CAST(sum(c) AS BIGINT) AS n_words,
         CAST(sum(c * n_tok) AS BIGINT) AS bpe_tokens
  FROM docw JOIN vocab USING (word) GROUP BY lang
),
base AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
mstr AS (SELECT concat_ws(' ', {merge_parts}) AS merges)
SELECT b.lang, b.n_docs,
       coalesce(n_words, 0) AS n_words,
       coalesce(bpe_tokens, 0) AS bpe_tokens,
       CASE WHEN coalesce(n_words, 0) > 0
            THEN round(bpe_tokens * 1.0 / n_words, 6) END AS tokens_per_word,
       (SELECT merges FROM mstr) AS merges
FROM base b LEFT JOIN tokc USING (lang)
ORDER BY b.lang
"""


_WP_ENCODE_MERGES = 8


def wordpiece_encode_report(spark, sf):
    """WordPiece encode (X44, operators/bpe.py train_wordpiece): the BERT
    tokenizer's trainer — identical loop to X36's BPE except the per-step
    argmax maximizes the unigram-likelihood score count(ab)/(count(a)*
    count(b)) instead of raw pair frequency, computed as the exact BIGINT
    nano-score (cnt*10^9) div (ua*ub) so both engines pick bit-identical
    merges (positive truncating division: Spark ``div`` == DuckDB ``//``).
    The ``merges`` column pins the full 8-step training TRAJECTORY in the
    oracle hash; per-lang WordPiece token counts come from the same
    broadcast vocab map-back as X36."""
    from .functions.ngram import word_tokens
    from .operators.bpe import bpe_vocab, train_wordpiece, word_frequencies

    d = t(spark, sf, "documents")
    trained, merges = train_wordpiece(
        word_frequencies(d, "text"), _WP_ENCODE_MERGES
    )
    vocab = bpe_vocab(trained)
    dw = (
        d.select("lang", F.explode(word_tokens(F.col("text"))).alias("word"))
        .groupBy("lang", "word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tok = (
        dw.join(F.broadcast(vocab), "word")
        .groupBy("lang")
        .agg(
            F.sum("c").cast("long").alias("n_words"),
            F.sum(F.col("c") * F.col("n_tok")).cast("long").alias("wp_tokens"),
        )
    )
    base = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    nw = F.coalesce(F.col("n_words"), F.lit(0).cast("long"))
    wt = F.coalesce(F.col("wp_tokens"), F.lit(0).cast("long"))
    return (
        base.join(F.broadcast(tok), "lang", "left")
        .select(
            "lang",
            "n_docs",
            nw.alias("n_words"),
            wt.alias("wp_tokens"),
            F.when(nw > 0, F.round(wt / nw, 6)).alias("tokens_per_word"),
            F.lit(" ".join(a + b for a, b in merges)).alias("merges"),
        )
        .orderBy("lang")
    )


def _wp_trainer_ctes(n_merges: int = _WP_ENCODE_MERGES) -> str:
    """Unrolled-CTE replay of the full iterative WordPiece trainer — the
    _bpe_trainer_ctes chain plus, per merge i, a u{i} per-symbol unit
    census; m{i} ranks by the exact nano-score (cnt*10^9) // (ua*ub)
    (DuckDB sums into HUGEINT so the product can't overflow where Spark's
    ANSI mode would instead abort loudly — at oracle scale both stay well
    inside BIGINT), tie-break (a, b) asc. Saturation handling is X36's:
    empty m{i} LEFT JOIN ... ON TRUE makes the fold a no-op."""
    steps = []
    for i in range(1, n_merges + 1):
        p = i - 1
        steps.append(rf"""u{i} AS MATERIALIZED (
  SELECT tok AS s, sum(wc) AS ucnt
  FROM (SELECT string_split(seq, ' ') AS ss, wc FROM w{p}), UNNEST(ss) AS t(tok)
  GROUP BY tok
),
p{i} AS MATERIALIZED (
  SELECT s[j] AS a, s[j + 1] AS b, sum(wc) AS cnt
  FROM (SELECT string_split(seq, ' ') AS s, wc FROM w{p}),
       UNNEST(range(1, len(s))) AS r(j)
  GROUP BY 1, 2
),
m{i} AS MATERIALIZED (
  SELECT p.a, p.b FROM p{i} p
  JOIN u{i} ua ON ua.s = p.a
  JOIN u{i} ub ON ub.s = p.b
  ORDER BY (p.cnt * 1000000000) // (ua.ucnt * ub.ucnt) DESC, p.a, p.b
  LIMIT 1
),
w{i} AS MATERIALIZED (
  SELECT word, wc,
         list_reduce(string_split(seq, ' '),
           (acc, x) -> CASE WHEN split_part(acc, ' ', -1) = m.a AND x = m.b
                            THEN acc || x ELSE acc || ' ' || x END) AS seq
  FROM w{p} LEFT JOIN m{i} m ON TRUE
)""")
    return rf"""norm AS (
  SELECT doc_id, lang,
         coalesce(trim(regexp_replace(regexp_replace(lower(text), '[^\p{{L}} ]+', ' ', 'g'),
                                      '\s+', ' ', 'g')), '') AS t
  FROM documents
),
words AS (
  SELECT tok AS word, count(*) AS wc
  FROM (SELECT string_split(t, ' ') AS w FROM norm WHERE length(t) > 0),
       UNNEST(w) AS u(tok)
  GROUP BY tok
),
w0 AS (SELECT word, wc, array_to_string(string_split(word, ''), ' ') AS seq FROM words),
{",".join(steps)},
vocab AS (SELECT word, CAST(len(string_split(seq, ' ')) AS BIGINT) AS n_tok FROM w{n_merges})"""


def _oracle_wordpiece_encode(n_merges: int = _WP_ENCODE_MERGES) -> str:
    merge_parts = ", ".join(
        f"(SELECT a || b FROM m{i})" for i in range(1, n_merges + 1)
    )
    return rf"""
WITH {_wp_trainer_ctes(n_merges)},
docw AS (
  SELECT lang, tok AS word, count(*) AS c
  FROM (SELECT lang, string_split(t, ' ') AS w FROM norm WHERE length(t) > 0),
       UNNEST(w) AS u(tok)
  GROUP BY lang, tok
),
tokc AS (
  SELECT lang, CAST(sum(c) AS BIGINT) AS n_words,
         CAST(sum(c * n_tok) AS BIGINT) AS wp_tokens
  FROM docw JOIN vocab USING (word) GROUP BY lang
),
base AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
mstr AS (SELECT concat_ws(' ', {merge_parts}) AS merges)
SELECT b.lang, b.n_docs,
       coalesce(n_words, 0) AS n_words,
       coalesce(wp_tokens, 0) AS wp_tokens,
       CASE WHEN coalesce(n_words, 0) > 0
            THEN round(wp_tokens * 1.0 / n_words, 6) END AS tokens_per_word,
       (SELECT merges FROM mstr) AS merges
FROM base b LEFT JOIN tokc USING (lang)
ORDER BY b.lang
"""


def bpe_packing_report(spark, sf):
    """Sequence packing over REAL BPE token counts (X36 -> X28, closing the
    tokenizer loop VERDICT r3 item 5 asked for): the iterative trainer's
    learned vocab broadcast-joins back onto the corpus for per-document
    token counts, which then drive the sharded running-total packing
    (128-token sequences, 8 shards). Same per-shard report columns as
    packing_report — the whitespace-token twin left in place for
    comparison. The oracle replays the ENTIRE chain: 8 unrolled
    mine→argmax→fold trainer CTEs, the per-doc token map-back, then the
    md5-order cumulative packing."""
    from .functions.ngram import word_tokens
    from .operators.bpe import bpe_vocab, train_bpe, word_frequencies
    from .operators.packing import pack_sequences, packing_stats

    d = t(spark, sf, "documents")
    trained, _ = train_bpe(word_frequencies(d, "text"), _BPE_ENCODE_MERGES)
    vocab = bpe_vocab(trained)
    dw = (
        d.select("doc_id", F.explode(word_tokens(F.col("text"))).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per_doc_tok = (
        dw.join(F.broadcast(vocab), "word")
        .groupBy("doc_id")
        .agg(F.sum(F.col("c") * F.col("n_tok")).cast("long").alias("_bpe"))
    )
    per_doc = (
        d.select("doc_id")
        .join(per_doc_tok, "doc_id", "left")
        .select("doc_id", F.coalesce("_bpe", F.lit(0).cast("long")).alias("bpe_tokens"))
    )
    packed = pack_sequences(per_doc, "doc_id", F.col("bpe_tokens"), seq_len=128, n_shards=8)
    return packing_stats(packed, 128).orderBy("shard")


def _oracle_bpe_packing(n_merges: int = _BPE_ENCODE_MERGES) -> str:
    return rf"""
WITH {_bpe_trainer_ctes(n_merges)},
docw AS (
  SELECT doc_id, tok AS word, count(*) AS c
  FROM (SELECT doc_id, string_split(t, ' ') AS w FROM norm WHERE length(t) > 0),
       UNNEST(w) AS u(tok)
  GROUP BY doc_id, tok
),
doctok AS (
  SELECT doc_id, CAST(sum(c * n_tok) AS BIGINT) AS tokens
  FROM docw JOIN vocab USING (word) GROUP BY doc_id
),
tk AS (
  SELECT d.doc_id, d.doc_id % 8 AS shard, coalesce(t.tokens, 0) AS tokens
  FROM documents d LEFT JOIN doctok t USING (doc_id)
),
c AS (
  SELECT shard, tokens,
         sum(tokens) OVER (PARTITION BY shard
                           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                           ROWS UNBOUNDED PRECEDING) AS cum
  FROM tk
),
p AS (
  SELECT shard, tokens,
         tokens > 0 AND floor((cum - tokens) * 1.0 / 128) != floor((cum - 1) * 1.0 / 128) AS straddle
  FROM c
)
SELECT shard,
       count(*) AS n_docs,
       CAST(sum(tokens) AS BIGINT) AS total_tokens,
       CAST(ceil(sum(tokens) * 1.0 / 128) AS BIGINT) AS n_seqs,
       round(CASE WHEN sum(tokens) > 0
                  THEN count(*) * 1.0 / ceil(sum(tokens) * 1.0 / 128) END, 6) AS avg_docs_per_seq,
       CAST(sum(CASE WHEN straddle THEN 1 ELSE 0 END) AS BIGINT) AS n_straddle,
       round(CASE WHEN sum(tokens) > 0
                  THEN sum(tokens) * 1.0 / (ceil(sum(tokens) * 1.0 / 128) * 128) END, 6) AS fill_frac
FROM p
GROUP BY shard
ORDER BY shard
"""


def packing_report(spark, sf):
    """Sequence packing (operators/packing.py): documents concatenated in
    per-shard hash order and chunked into 128-token training sequences
    (whitespace token counts — the oracle-established twin); per-shard
    packing-efficiency report — documents, tokens, sequences produced,
    mean docs per sequence, boundary-straddling docs, fill fraction.
    Shards (doc_id % 8 here; pmod(xxhash64) in production) keep the
    running-total window parallel — no global cumsum serialization; the
    per-shard sort is the dataloader-worker unit of work."""
    from .operators.packing import pack_sequences, packing_stats

    d = t(spark, sf, "documents")
    packed = pack_sequences(
        d, "doc_id", whitespace_token_count(F.col("text")), seq_len=128, n_shards=8
    )
    return packing_stats(packed, 128).orderBy("shard")


ORACLE_PACKING_REPORT = r"""
WITH tk AS (
  SELECT doc_id, doc_id % 8 AS shard,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS tokens
  FROM documents
),
c AS (
  SELECT shard, tokens,
         sum(tokens) OVER (PARTITION BY shard
                           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                           ROWS UNBOUNDED PRECEDING) AS cum
  FROM tk
),
p AS (
  SELECT shard, tokens,
         tokens > 0 AND floor((cum - tokens) * 1.0 / 128) != floor((cum - 1) * 1.0 / 128) AS straddle
  FROM c
)
SELECT shard,
       count(*) AS n_docs,
       CAST(sum(tokens) AS BIGINT) AS total_tokens,
       CAST(ceil(sum(tokens) * 1.0 / 128) AS BIGINT) AS n_seqs,
       round(CASE WHEN sum(tokens) > 0
                  THEN count(*) * 1.0 / ceil(sum(tokens) * 1.0 / 128) END, 6) AS avg_docs_per_seq,
       CAST(sum(CASE WHEN straddle THEN 1 ELSE 0 END) AS BIGINT) AS n_straddle,
       round(CASE WHEN sum(tokens) > 0
                  THEN sum(tokens) * 1.0 / (ceil(sum(tokens) * 1.0 / 128) * 128) END, 6) AS fill_frac
FROM p
GROUP BY shard
ORDER BY shard
"""


def classifier_report(spark, sf):
    """In-engine quality/lang classifier (operators/classifier.py):
    logistic regression predicting lang=='en' from three codegen features
    (en-stopword ratio, punctuation ratio, capped length), trained by 3
    unrolled full-batch gradient steps (lr 0.5, zero init) where each step
    is one map-side-combined aggregation producing 4 scalars; only the
    final 1-row weight vector is collected (a scalar probe), so the
    feature cache can be released before the lazy report is returned
    instead of leaking cached blocks into the session per invocation.
    Gradients are rounded to 9 dp before each
    update so DuckDB's sequential replay reaches bit-identical weights and
    the ENTIRE training loop is oracle-checked. Per-lang report: docs,
    mean predicted probability, accuracy against the label, and the
    trained weights."""
    from .functions.text import punct_ratio, stopword_ratio
    from .operators.classifier import logreg_score, logreg_train

    d = t(spark, sf, "documents")
    feats = d.select(
        "lang",
        (F.col("lang") == "en").cast("double").alias("y"),
        stopword_ratio(F.col("text"), "en").alias("x1"),
        punct_ratio(F.col("text")).alias("x2"),
        F.least(F.length("text").cast("double") / F.lit(500.0), F.lit(1.0)).alias(
            "x3"
        ),
    ).cache()  # the k gradient passes rescan columns, not regex features
    try:
        # first() forces the k gradient passes against the cache; the
        # trained weights are 4 scalars, re-embedded as exact literals.
        wrow = logreg_train(feats, ["x1", "x2", "x3"], "y", lr=0.5, steps=3).first()
    finally:
        feats.unpersist()
    w = spark.range(1).select(
        *[F.lit(float(wrow[c])).alias(c) for c in ("b", "w1", "w2", "w3")]
    )
    scored = logreg_score(feats, w, ["x1", "x2", "x3"])
    correct = (
        (F.col("_p") >= 0.5) == (F.col("y") == 1.0)
    ).cast("double")
    return (
        scored.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            _r(F.avg("_p")).alias("mean_p"),
            _r(F.avg(correct)).alias("accuracy"),
            F.round(F.first("b"), 6).alias("w_bias"),
            F.round(F.first("w1"), 6).alias("w_stop"),
            F.round(F.first("w2"), 6).alias("w_punct"),
            F.round(F.first("w3"), 6).alias("w_len"),
        )
        .orderBy("lang")
    )


# the 3 gradient steps unrolled as chained CTEs — weights must land
# bit-identical to Spark's (see operators/classifier.py: 9 dp gradient
# rounding absorbs float-addition-order differences between engines)
ORACLE_CLASSIFIER_REPORT = rf"""
WITH f AS (
  SELECT lang,
         CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
         CASE WHEN length(trim(text)) = 0 THEN 0.0
              ELSE len(regexp_extract_all(lower(text), '\b({_SW_EN})\b')) * 1.0
                   / len(regexp_split_to_array(trim(text), '\s+')) END AS x1,
         CASE WHEN length(text) > 0
              THEN len(regexp_extract_all(text, '[\p{{P}}]')) * 1.0 / length(text)
              ELSE 0.0 END AS x2,
         least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) AS x3
  FROM documents
),
g1 AS (
  SELECT round(avg(1.0/(1.0+exp(-(0.0 + 0.0*x1 + 0.0*x2 + 0.0*x3))) - y), 9) AS gb,
         round(avg((1.0/(1.0+exp(-(0.0 + 0.0*x1 + 0.0*x2 + 0.0*x3))) - y) * x1), 9) AS g1,
         round(avg((1.0/(1.0+exp(-(0.0 + 0.0*x1 + 0.0*x2 + 0.0*x3))) - y) * x2), 9) AS g2,
         round(avg((1.0/(1.0+exp(-(0.0 + 0.0*x1 + 0.0*x2 + 0.0*x3))) - y) * x3), 9) AS g3
  FROM f
),
w1 AS (
  SELECT 0.0 - 0.5*gb AS b, 0.0 - 0.5*g1 AS w1, 0.0 - 0.5*g2 AS w2, 0.0 - 0.5*g3 AS w3
  FROM g1
),
g2 AS (
  SELECT round(avg(1.0/(1.0+exp(-(w.b + w.w1*x1 + w.w2*x2 + w.w3*x3))) - y), 9) AS gb,
         round(avg((1.0/(1.0+exp(-(w.b + w.w1*x1 + w.w2*x2 + w.w3*x3))) - y) * x1), 9) AS g1,
         round(avg((1.0/(1.0+exp(-(w.b + w.w1*x1 + w.w2*x2 + w.w3*x3))) - y) * x2), 9) AS g2,
         round(avg((1.0/(1.0+exp(-(w.b + w.w1*x1 + w.w2*x2 + w.w3*x3))) - y) * x3), 9) AS g3
  FROM f, w1 w
),
w2 AS (
  SELECT w.b - 0.5*g.gb AS b, w.w1 - 0.5*g.g1 AS w1, w.w2 - 0.5*g.g2 AS w2, w.w3 - 0.5*g.g3 AS w3
  FROM w1 w, g2 g
),
g3 AS (
  SELECT round(avg(1.0/(1.0+exp(-(w.b + w.w1*x1 + w.w2*x2 + w.w3*x3))) - y), 9) AS gb,
         round(avg((1.0/(1.0+exp(-(w.b + w.w1*x1 + w.w2*x2 + w.w3*x3))) - y) * x1), 9) AS g1,
         round(avg((1.0/(1.0+exp(-(w.b + w.w1*x1 + w.w2*x2 + w.w3*x3))) - y) * x2), 9) AS g2,
         round(avg((1.0/(1.0+exp(-(w.b + w.w1*x1 + w.w2*x2 + w.w3*x3))) - y) * x3), 9) AS g3
  FROM f, w2 w
),
w3 AS (
  SELECT w.b - 0.5*g.gb AS b, w.w1 - 0.5*g.g1 AS w1, w.w2 - 0.5*g.g2 AS w2, w.w3 - 0.5*g.g3 AS w3
  FROM w2 w, g3 g
)
SELECT f.lang,
       count(*) AS n_docs,
       round(avg(1.0/(1.0+exp(-(w.b + w.w1*x1 + w.w2*x2 + w.w3*x3)))), 6) AS mean_p,
       round(avg(CASE WHEN (1.0/(1.0+exp(-(w.b + w.w1*x1 + w.w2*x2 + w.w3*x3))) >= 0.5) = (y = 1.0)
                      THEN 1.0 ELSE 0.0 END), 6) AS accuracy,
       round(any_value(w.b), 6)  AS w_bias,
       round(any_value(w.w1), 6) AS w_stop,
       round(any_value(w.w2), 6) AS w_punct,
       round(any_value(w.w3), 6) AS w_len
FROM f, w3 w
GROUP BY f.lang
ORDER BY f.lang
"""


def calibration_report(spark, sf):
    """Calibration / reliability buckets + ECE for the in-engine
    classifier (A21 — pairs with A20's confusion metrics to complete the
    evaluation family): predicted probabilities micro-quantized
    (round(p*1e6) BIGINT — exact order-independent sums), hundred
    equal-width (0.01) reliability buckets (non-empty bins reported), per-bucket mean-predicted vs
    mean-label as truncating/half-up integral divisions, and the
    Expected Calibration Error (Naeini et al. 2015; Guo et al. 2017) as
    an exact weighted integer mean riding every row. Training is
    bit-identical to classifier_report (same 3 replayable gradient
    steps)."""
    from .functions.text import punct_ratio, stopword_ratio
    from .operators.classifier import logreg_score, logreg_train

    d = t(spark, sf, "documents")
    feats = d.select(
        "lang",
        (F.col("lang") == "en").cast("double").alias("y"),
        stopword_ratio(F.col("text"), "en").alias("x1"),
        punct_ratio(F.col("text")).alias("x2"),
        F.least(F.length("text").cast("double") / F.lit(500.0), F.lit(1.0)).alias(
            "x3"
        ),
    ).cache()
    try:
        wrow = logreg_train(feats, ["x1", "x2", "x3"], "y", lr=0.5, steps=3).first()
    finally:
        feats.unpersist()
    w = spark.range(1).select(
        *[F.lit(float(wrow[c])).alias(c) for c in ("b", "w1", "w2", "w3")]
    )
    scored = logreg_score(feats, w, ["x1", "x2", "x3"])
    s2 = scored.select(
        (F.col("y") == 1.0).cast("long").alias("pos"),
        F.round(F.col("_p") * F.lit(1000000.0)).cast("long").alias("pm"),
    )
    bk = (
        s2.select(
            F.least(F.expr("div(pm, 10000)"), F.lit(99)).alias("bucket"),
            "pos",
            "pm",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("pos").cast("long").alias("n_pos"),
            F.sum("pm").cast("long").alias("sum_pm"),
        )
    )
    m = (
        bk.withColumn("mean_pred_micro", F.expr("div(sum_pm, n)").cast("long"))
        .withColumn(
            "mean_label_micro",
            F.expr("div(2 * n_pos * 1000000 + n, 2 * n)").cast("long"),
        )
        .withColumn(
            "gap_micro",
            F.abs(F.col("mean_pred_micro") - F.col("mean_label_micro")).cast(
                "long"
            ),
        )
    )
    return (
        m.withColumn(
            "ece_micro",
            F.expr("div(sum(gap_micro * n) OVER (), sum(n) OVER ())").cast(
                "long"
            ),
        )
        .select(
            "bucket",
            "n",
            "n_pos",
            "mean_pred_micro",
            "mean_label_micro",
            "gap_micro",
            "ece_micro",
        )
        .orderBy("bucket")
    )


# Reuse the classifier oracle's replayable training prefix (everything
# through w3) and swap the report tail for the calibration buckets.
ORACLE_CALIBRATION_REPORT = (
    ORACLE_CLASSIFIER_REPORT.split("SELECT f.lang,")[0]
    + r""", scored AS (
  SELECT f.y,
         CAST(round(1.0/(1.0+exp(-(w.b + w.w1*x1 + w.w2*x2 + w.w3*x3)))
              * 1000000) AS BIGINT) AS pm
  FROM f, w3 w
),
bk AS (
  SELECT least(pm // 10000, 99) AS bucket,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
         CAST(sum(pm) AS BIGINT) AS sum_pm
  FROM scored GROUP BY bucket
),
m AS (
  SELECT bucket, n, n_pos,
         CAST(sum_pm // n AS BIGINT) AS mean_pred_micro,
         CAST((2 * n_pos * 1000000 + n) // (2 * n) AS BIGINT)
           AS mean_label_micro
  FROM bk
)
SELECT bucket, n, n_pos, mean_pred_micro, mean_label_micro,
       CAST(abs(mean_pred_micro - mean_label_micro) AS BIGINT) AS gap_micro,
       CAST(sum(abs(mean_pred_micro - mean_label_micro) * n) OVER ()
            // sum(n) OVER () AS BIGINT) AS ece_micro
FROM m ORDER BY bucket
"""
)


# ---------------------------------------------------------------------------
# Training-data ops (r3 wave 3): splits, token budgets, quantile gates
# ---------------------------------------------------------------------------
def split_report(spark, sf):
    """Deterministic train/val/test splitting (operators/splits.py): the
    RNG-free 80/10/10 hash split every corpus build runs before export —
    assignment is a pure md5 function of the doc key, so re-runs and
    incremental appends are stable, and keying on a GROUP column instead
    pins whole dedup-clusters/domains to one split (leakage defense;
    group-atomicity is pytest-pinned). Report grain (split, lang): doc
    count, whitespace-token sum, and each split's share of its language.
    Plan shape: the split column is one codegen expression on the scan —
    zero shuffle, zero UDF; the only exchange is the report's own
    partial-agg, and the share window runs over the tiny aggregated
    frame (n_splits x n_langs rows), never the corpus."""
    from .operators.splits import assign_split

    d = t(spark, sf, "documents")
    s = assign_split(d, F.col("doc_id"))
    agg = s.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(whitespace_token_count(F.col("text"))).alias("ws_tokens"),
    )
    wl = W.partitionBy("lang")
    return (
        agg.withColumn(
            "lang_share", _r(F.col("n_docs") / F.sum("n_docs").over(wl))
        )
        .orderBy("split", "lang")
    )


ORACLE_SPLIT_REPORT = r"""
WITH s AS (
  SELECT lang,
         CASE WHEN (('0x' || substr(md5('split-v1:' || CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100) < 80 THEN 'train'
              WHEN (('0x' || substr(md5('split-v1:' || CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100) < 90 THEN 'val'
              WHEN (('0x' || substr(md5('split-v1:' || CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100) < 100 THEN 'test'
         END AS split,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS ws
  FROM documents
)
SELECT split, lang, count(*) AS n_docs,
       CAST(sum(ws) AS BIGINT) AS ws_tokens,
       round(count(*) * 1.0 / sum(count(*)) OVER (PARTITION BY lang), 6) AS lang_share
FROM s GROUP BY split, lang
ORDER BY split, lang
"""


def token_budget_report(spark, sf):
    """Per-lang token-budget sampling (operators/budget.py): take docs in
    md5 hash order until 2000 whitespace tokens per language are filled
    (the "X tokens per language" corpus-sizing rule). Two-phase prefix
    sum: bucket = md5-prefix, per-(lang,bucket) totals (tiny frame),
    exclusive bucket prefix + intra-bucket running sum — identical keep
    set to the naive per-lang global window the oracle replays, but the
    widest window partition is 1/256th of a language, not all of it.
    Report per lang: docs seen/kept, kept tokens, budget utilization."""
    from .operators.budget import token_budget_take

    budget = 2000
    d = t(spark, sf, "documents")
    marked = token_budget_take(
        d, whitespace_token_count(F.col("text")), "doc_id", budget
    )
    kept = F.col("kept").cast("int")
    return (
        marked.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(kept).cast("long").alias("n_kept"),
            F.sum(kept * F.col("_tokens")).cast("long").alias("kept_tokens"),
            _r(F.sum(kept * F.col("_tokens")) / F.lit(budget)).alias(
                "budget_used"
            ),
        )
        .orderBy("lang")
    )


ORACLE_TOKEN_BUDGET_REPORT = r"""
WITH tk AS (
  SELECT lang, doc_id,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS ws
  FROM documents
),
cum AS (
  SELECT lang, ws,
         sum(ws) OVER (PARTITION BY lang
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                       ROWS UNBOUNDED PRECEDING) AS c
  FROM tk
)
SELECT lang, count(*) AS n_docs,
       CAST(sum(CASE WHEN c <= 2000 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN c <= 2000 THEN ws ELSE 0 END) AS BIGINT) AS kept_tokens,
       round(sum(CASE WHEN c <= 2000 THEN ws ELSE 0 END) / 2000.0, 6) AS budget_used
FROM cum GROUP BY lang
ORDER BY lang
"""


def quantile_gate_report(spark, sf):
    """Exact per-lang quantile quality gate (operators/quantile.py): keep
    the top 30% of each language by the 6dp-rounded quality score,
    computed WITHOUT a per-lang global sort — per-(lang,score) histogram
    partial-agg, descending cumulative over the bounded score domain,
    tie-inclusive threshold broadcast back. Bit-equal to the naive
    percent-rank definition the oracle replays (this engine bans
    percentile_approx on oracle paths). Report per lang: kept count,
    threshold, min/avg kept score."""
    from .operators.quantile import quantile_gate

    d = t(spark, sf, "documents")
    g = quantile_gate(d, quality_score(F.col("text"), "en"), 0.3)
    return (
        g.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            _r(F.max("threshold")).alias("threshold"),
            _r(F.min("score")).alias("min_kept_score"),
            _r(F.avg("score")).alias("avg_kept_score"),
        )
        .orderBy("lang")
    )


ORACLE_QUANTILE_GATE_REPORT = rf"""
WITH q AS (
  SELECT lang,
    round(
      least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) * 0.3
      + greatest(0.0, 1.0 - (CASE WHEN length(text) > 0
          THEN len(regexp_extract_all(text, '[\p{{P}}]')) * 1.0 / length(text)
          ELSE 0.0 END) * 4.0) * 0.2
      + greatest(0.0, 1.0 - (CASE WHEN length(text) > 0
          THEN len(regexp_extract_all(text, '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]')) * 1.0 / length(text)
          ELSE 0.0 END) * 20.0) * 0.2
      + least((CASE WHEN length(trim(text)) = 0 THEN 0.0
          ELSE len(regexp_extract_all(lower(text), '\b({_SW_EN})\b')) * 1.0
               / len(regexp_split_to_array(trim(text), '\s+')) END) * 4.0, 1.0) * 0.3
    , 6) AS score
  FROM documents
),
hist AS (SELECT lang, score, count(*) AS n FROM q
         WHERE score IS NOT NULL GROUP BY lang, score),
c AS (
  SELECT lang, score,
         sum(n) OVER (PARTITION BY lang ORDER BY score DESC
                      ROWS UNBOUNDED PRECEDING) AS ge,
         sum(n) OVER (PARTITION BY lang) AS tot
  FROM hist
),
thr AS (
  SELECT lang, max(score) AS threshold
  FROM c WHERE ge >= CAST(ceil(0.3 * tot) AS BIGINT) GROUP BY lang
)
SELECT q.lang, count(*) AS n_kept,
       round(max(t.threshold), 6) AS threshold,
       round(min(q.score), 6)     AS min_kept_score,
       round(avg(q.score), 6)     AS avg_kept_score
FROM q JOIN thr t USING (lang)
WHERE q.score >= t.threshold
GROUP BY q.lang
ORDER BY q.lang
"""


def ppl_bucket_report(spark, sf):
    """CCNet-style head/middle/tail corpus split (Wenzek et al. 2020,
    arXiv:1911.00359 §4.3: each language partitioned into thirds by LM
    perplexity, lower = cleaner = head). LM trained in-engine with 'zh'
    held out exactly as perplexity_report; rejected (+inf) and unscoreable
    (NULL) docs are excluded — the split covers the scored corpus. Tertile
    cuts are EXACT per-lang quantiles over the 2dp-rounded perplexity via
    the bounded-domain histogram (operators/quantile.py
    quantile_bucket_labels — no per-lang global sort, no percentile_approx),
    so the whole pipeline is DuckDB-replayable."""
    from .operators.perplexity import perplexity_native, train_char_lm
    from .operators.quantile import quantile_bucket_labels

    d = t(spark, sf, "documents")
    lm = train_char_lm(d.filter(F.col("lang") != "zh"), text_col="text", lang_col="lang")
    scored = perplexity_native(
        d.select("doc_id", "lang", F.col("text").alias("extracted_text")),
        lm,
        id_col="doc_id",
    )
    p = F.col("perplexity")
    fin = (
        d.select("doc_id", "lang")
        .join(scored, "doc_id")
        .filter(p.isNotNull() & (p != _INF))
        .select("lang", _r(p, 2).alias("ppl"))
    )
    lab = quantile_bucket_labels(fin, "ppl", group_col="lang")
    # avg_ppl in EXACT integer arithmetic: the quotient of a 2dp sum by a
    # count lands exactly on 4dp half-points (x.xxx75 / 3 etc.), where
    # Spark's and DuckDB's double round() legitimately disagree by 1 ulp
    # (observed at sf0.001). So: exact cents (bigint), integral half-up
    # division to 1e-4 units — round_half_up(100*cents/n) =
    # div(200*cents + n, 2n) for positives — then one exact /10000.0.
    # No double enters until the final division, so bigint holds to ~9e18
    # cents (1e12 docs x ppl 10^4 fits).
    g = lab.groupBy("lang", "bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.round(F.col("ppl") * 100).cast("long")).alias("_cents"),
        F.min("ppl").alias("min_ppl"),
        F.max("ppl").alias("max_ppl"),
    )
    return g.select(
        "lang",
        "bucket",
        "n_docs",
        (
            F.expr("div(200 * _cents + n_docs, 2 * n_docs)") / F.lit(10000.0)
        ).alias("avg_ppl"),
        "min_ppl",
        "max_ppl",
    )


# Replays the full chain: the perplexity_report LM + scoring CTEs, then the
# ascending bounded-domain histogram, tie-inclusive tertile cuts (cut k =
# smallest ppl with #(<= ppl) >= ceil(frac * n_lang); fracs written as
# (1.0/3.0)/(2.0/3.0) so both engines multiply by bit-identical doubles),
# and the head/middle/tail labeling.
ORACLE_PPL_BUCKET_REPORT = r"""
WITH norm AS (
  SELECT doc_id, lang,
         coalesce(trim(regexp_replace(regexp_replace(lower(text), '[^\p{L} ]+', ' ', 'g'),
                                      '\s+', ' ', 'g')), '') AS t
  FROM documents
),
g AS (
  SELECT lang, substr(t, CAST(i AS INT), 3) AS ngram
  FROM norm, UNNEST(range(1, length(t) - 1)) AS u(i)
  WHERE length(t) >= 3 AND lang <> 'zh'
),
c AS (SELECT lang, ngram, count(*) AS c FROM g GROUP BY 1, 2),
lm AS (
  SELECT lang, ngram,
         log10((c + 1.0) / (sum(c) OVER (PARTITION BY lang)
                            + count(*) OVER (PARTITION BY lang))) AS logp
  FROM c
),
known AS (SELECT DISTINCT lang FROM lm),
docg AS (
  SELECT n.doc_id, n.lang, substr(n.t, CAST(i AS INT), 3) AS ngram
  FROM norm n, UNNEST(range(1, length(n.t) - 1)) AS u(i)
  WHERE length(n.t) >= 3 AND n.lang IN (SELECT lang FROM known)
),
scored AS (
  SELECT d.doc_id, pow(10.0, -sum(coalesce(lm.logp, -6.0)) / count(*)) AS ppl
  FROM docg d LEFT JOIN lm ON lm.lang = d.lang AND lm.ngram = d.ngram
  GROUP BY d.doc_id
),
fin AS (
  SELECT n.lang, round(s.ppl, 2) AS ppl
  FROM norm n JOIN scored s USING (doc_id)
  WHERE length(n.t) >= 3 AND n.lang IN (SELECT lang FROM known)
),
hist AS (SELECT lang, ppl, count(*) AS n FROM fin GROUP BY 1, 2),
cum AS (
  SELECT lang, ppl,
         sum(n) OVER (PARTITION BY lang ORDER BY ppl) AS le,
         sum(n) OVER (PARTITION BY lang) AS tot
  FROM hist
),
cuts AS (
  SELECT lang,
         min(CASE WHEN le >= ceil(tot * (1.0/3.0)) THEN ppl END) AS t1,
         min(CASE WHEN le >= ceil(tot * (2.0/3.0)) THEN ppl END) AS t2
  FROM cum GROUP BY lang
),
lab AS (
  SELECT f.lang,
         CASE WHEN f.ppl <= c.t1 THEN 'head'
              WHEN f.ppl <= c.t2 THEN 'middle'
              ELSE 'tail' END AS bucket,
         f.ppl
  FROM fin f JOIN cuts c USING (lang)
)
SELECT lang, bucket, count(*) AS n_docs,
       ((200 * sum(CAST(round(ppl * 100) AS BIGINT)) + count(*))
        // (2 * count(*))) / 10000.0 AS avg_ppl,
       min(ppl) AS min_ppl, max(ppl) AS max_ppl
FROM lab GROUP BY 1, 2
"""


def asof_attribution_report(spark, sf):
    """Event attribution via as-of join (X34): every 'error' event matched
    to the same user's most recent at-or-before 'click', then per-user gap
    stats. The Spark side is the union + running last(ignorenulls) window
    (operators/asof.py — one exchange, no inequality-join blowup); the
    DuckDB oracle is the engine's NATIVE ``ASOF LEFT JOIN`` — two
    independent implementations of the same temporal-join semantics.
    Gap sums stay in exact integer microseconds (no float-order drift)."""
    from .operators.asof import as_of_join

    e = t(spark, sf, "events").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    errs = e.filter(F.col("event_type") == "error").select("user_id", "ts", "event_id")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    j = as_of_join(errs, clicks, ["user_id"], "ts", "ts", ["click_id"])
    gap = F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(
        F.col("asof_ts").cast("timestamp")
    )
    return j.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_errors"),
        F.count("asof_ts").alias("n_matched"),
        F.coalesce(F.sum(gap), F.lit(0)).cast("long").alias("sum_gap_us"),
        F.max(gap).cast("long").alias("max_gap_us"),
    )


# Independent-implementation oracle: DuckDB's native ASOF LEFT JOIN (l.ts >=
# r.ts picks the largest right ts at-or-before) vs the Spark union-window
# form. Values use only the matched TIMESTAMP (never the tie-broken payload),
# so both engines' arbitrary-tie right-row choice yields identical numbers.
ORACLE_ASOF_ATTRIBUTION = """
WITH e AS (
  SELECT * FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
err AS (SELECT user_id, ts FROM e WHERE event_type = 'error'),
clk AS (SELECT user_id, ts FROM e WHERE event_type = 'click'),
m AS (
  SELECT l.user_id, l.ts, r.ts AS cts
  FROM err l ASOF LEFT JOIN clk r
    ON l.user_id = r.user_id AND l.ts >= r.ts
)
SELECT user_id,
       count(*) AS n_errors,
       count(cts) AS n_matched,
       CAST(coalesce(sum(epoch_us(ts) - epoch_us(cts)), 0) AS BIGINT) AS sum_gap_us,
       CAST(max(epoch_us(ts) - epoch_us(cts)) AS BIGINT) AS max_gap_us
FROM m GROUP BY user_id
"""


def range_funnel_report(spark, sf):
    """Funnel analysis via range (interval) join (X35): every 'click'
    paired with the same user's 'error' events 0-12 hours LATER, per-user
    pair/coverage/delta stats (12 h window — wide enough for a multi-user
    match set at oracle scale). Spark side is the banded-bucket equi-join
    (operators/rangejoin.py — fixed <=2x left replication, never a per-key
    nested loop); the oracle is DuckDB's plain inequality join, an
    independent evaluation path. Deltas stay in exact integer
    microseconds."""
    from .operators.rangejoin import range_join

    e = t(spark, sf, "events").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", us.alias("c_us"), F.col("event_id").alias("click_id")
    )
    errs = e.filter(F.col("event_type") == "error").select(
        "user_id", us.alias("e_us"), "event_id"
    )
    j = range_join(clicks, errs, ["user_id"], "c_us", "e_us", 0, 43_200_000_000)
    return j.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.countDistinct("click_id").alias("n_clicks_followed"),
        F.countDistinct("r_event_id").alias("n_errors_preceded"),
        F.sum(F.col("r_e_us") - F.col("c_us")).alias("sum_delta_us"),
    )


# Independent-implementation oracle: a plain inequality join (fine at oracle
# scale; the Spark side exists precisely because this form is a per-key
# nested loop at corpus scale).
ORACLE_RANGE_FUNNEL = """
WITH e AS (
  SELECT * FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
clk AS (
  SELECT user_id, epoch_us(ts) AS c_us, event_id AS click_id
  FROM e WHERE event_type = 'click'
),
err AS (
  SELECT user_id, epoch_us(ts) AS e_us, event_id
  FROM e WHERE event_type = 'error'
),
p AS (
  SELECT c.user_id, c.click_id, r.event_id, r.e_us - c.c_us AS d
  FROM clk c JOIN err r
    ON c.user_id = r.user_id AND r.e_us - c.c_us BETWEEN 0 AND 43200000000
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(count(DISTINCT click_id) AS BIGINT) AS n_clicks_followed,
       CAST(count(DISTINCT event_id) AS BIGINT) AS n_errors_preceded,
       CAST(sum(d) AS BIGINT) AS sum_delta_us
FROM p GROUP BY user_id
"""


def winnow_report(spark, sf):
    """Winnowing fingerprint matches (X64, operators/winnow.py — Schleimer,
    Wilkerson & Aiken 2003 MOSS local fingerprinting): k=4-gram hashes,
    window w=4 minima (rightmost on ties), pairs ranked by DISTINCT shared
    fingerprints with the max_df=16 boilerplate guard. Top-20 pairs with
    per-doc sketch sizes and the fingerprint-Jaccard estimate; total order
    (n_shared DESC, id_a, id_b) — (id_a, id_b) is unique so the LIMIT is
    deterministic. Oracle replays the pack/min/unpack pipeline in DuckDB
    ('0x'||substr(md5,1,10) hex cast — the X30 twin at 40 bits).
    Reference analog: none — rebuild-only operator (SURVEY §2.13)."""
    from .operators.winnow import winnow_fingerprints, winnow_matches

    d = _spread(t(spark, sf, "documents"))
    # ONE dedupe + ONE persist for the whole report: the distinct value
    # frame answers both the sizes leg and the match pipeline (which
    # itself fans into three branches) — unpersisted, the k-gram window
    # scan replays per branch (minhash cache contract; never unpersisted
    # here); pre_deduped tells winnow_matches not to dedupe again
    fps = winnow_fingerprints(d, "text", "doc_id", k=4, w=4)
    vals = fps.select("doc_id", "fp").distinct().persist()
    sizes = vals.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("nfp")
    )
    m = winnow_matches(vals, "doc_id", max_df=16, pre_deduped=True)
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("nfp").alias("n_fp_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("nfp").alias("n_fp_b"))
    denom = F.col("n_fp_a") + F.col("n_fp_b") - F.col("n_shared")
    return (
        m.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            "n_shared",
            "n_fp_a",
            "n_fp_b",
            F.when(denom > 0, _r(F.col("n_shared") / denom)).alias("overlap_frac"),
        )
        .orderBy(F.desc("n_shared"), "id_a", "id_b")
        .limit(20)
    )


ORACLE_WINNOW_REPORT = r"""
WITH norm AS (
  SELECT doc_id,
         coalesce(trim(regexp_replace(regexp_replace(lower(text), '[^\p{L} ]+', ' ', 'g'),
                                      '\s+', ' ', 'g')), '') AS t
  FROM documents
),
toks AS (
  SELECT doc_id, string_split(t, ' ') AS w FROM norm WHERE length(t) > 0
),
kg AS (
  SELECT doc_id, len(w) - 3 AS nk, i AS s,
         ('0x' || substr(md5(array_to_string(w[CAST(i + 1 AS INT):CAST(i + 4 AS INT)], ' ')), 1, 10))::BIGINT
           * 1048576 + (1048575 - i) AS comb
  FROM toks, UNNEST(range(0, len(w) - 3)) AS r(i)
  WHERE len(w) - 3 >= 1 AND len(w) - 3 < 1048576
),
wm AS (
  SELECT doc_id, s, nk,
         min(comb) OVER (PARTITION BY doc_id ORDER BY s
                         ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS m
  FROM kg
),
picks AS (
  SELECT DISTINCT doc_id, CAST(m // 1048576 AS BIGINT) AS fp
  FROM wm WHERE s <= greatest(nk - 4, 0)
),
sizes AS (SELECT doc_id, count(*) AS nfp FROM picks GROUP BY doc_id),
keepfp AS (SELECT fp FROM picks GROUP BY fp HAVING count(*) <= 16),
v AS (SELECT p.doc_id, p.fp FROM picks p JOIN keepfp USING (fp)),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
  FROM v a JOIN v b ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT p.id_a, p.id_b,
       CAST(p.n_shared AS BIGINT) AS n_shared,
       CAST(sa.nfp AS BIGINT) AS n_fp_a,
       CAST(sb.nfp AS BIGINT) AS n_fp_b,
       CASE WHEN sa.nfp + sb.nfp - p.n_shared > 0
            THEN round(p.n_shared * 1.0 / (sa.nfp + sb.nfp - p.n_shared), 6) END
         AS overlap_frac
FROM pairs p
JOIN sizes sa ON sa.doc_id = p.id_a
JOIN sizes sb ON sb.doc_id = p.id_b
ORDER BY n_shared DESC, id_a, id_b
LIMIT 20
"""


def neardup_verify_report(spark, sf):
    """NearDup two-stage dedup (X65, operators/dedup.py
    edit_similarity_pairs — Lee et al. 2022 arXiv:2107.06499 §3.2): banded
    MinHash-LSH candidates (the md5 oracle family, threshold 0 = every
    banded candidate) VERIFIED by exact char-level edit similarity
    1 - lev/max(len) over 500-char normalized prefixes. Emits every
    candidate with its signature estimate and its exact verify, so the
    report doubles as a calibration table for the banding. F.levenshtein
    is codegen JVM; DuckDB levenshtein is the cross-engine twin.
    Reference analog: none — rebuild-only operator (SURVEY §2.13)."""
    from .operators.dedup import edit_similarity_pairs

    d = (
        t(spark, sf, "documents")
        .filter(F.col("doc_id") < 200)
        .select("doc_id", "text")
    )
    cand = minhash_lsh_pairs_md5(
        d, "text", "doc_id", n_hashes=16, bands=4, shingle_n=5,
        jaccard_threshold=0.0,
    )
    v = edit_similarity_pairs(
        d,
        cand.select("id_a", "id_b", _r(F.col("est_jaccard")).alias("est_jaccard")),
        "text",
        "doc_id",
        cap=500,
    )
    return v.select(
        "id_a",
        "id_b",
        "est_jaccard",
        "edit_dist",
        _r(F.col("edit_sim")).alias("edit_sim"),
    ).orderBy("id_a", "id_b")


ORACLE_NEARDUP_VERIFY = r"""
WITH d AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 200 AND length(text) >= 5
),
sh AS (
  SELECT doc_id, substr(text, CAST(i AS INT), 5) AS sh
  FROM d, UNNEST(range(1, length(text) - 3)) AS t(i)
),
seeds AS (SELECT UNNEST(range(0, 16)) AS seed),
mh AS (
  SELECT doc_id, seed, min(md5(CAST(seed AS VARCHAR) || ':' || sh)) AS h
  FROM sh CROSS JOIN seeds
  GROUP BY doc_id, seed
),
bandkeys AS (
  SELECT doc_id, seed // 4 AS band,
         md5(string_agg(h, '|' ORDER BY seed)) AS bkey
  FROM mh GROUP BY doc_id, seed // 4
),
good AS (
  SELECT bk.* FROM bandkeys bk
  JOIN (SELECT band, bkey, count(*) AS bn FROM bandkeys GROUP BY 1, 2) s
    ON s.band = bk.band AND s.bkey = bk.bkey
  WHERE s.bn <= 200
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM good a JOIN good b ON a.band = b.band AND a.bkey = b.bkey
  WHERE a.doc_id < b.doc_id
),
agree AS (
  SELECT c.id_a, c.id_b, sum(CASE WHEN ma.h = mb.h THEN 1 ELSE 0 END) AS n_agree
  FROM cand c
  JOIN mh ma ON ma.doc_id = c.id_a
  JOIN mh mb ON mb.doc_id = c.id_b AND mb.seed = ma.seed
  GROUP BY 1, 2
),
norm AS (
  SELECT doc_id,
         substr(coalesce(trim(regexp_replace(regexp_replace(lower(text), '[^\p{L} ]+', ' ', 'g'),
                                             '\s+', ' ', 'g')), ''), 1, 500) AS t
  FROM documents WHERE doc_id < 200
)
SELECT g.id_a, g.id_b,
       round(g.n_agree / 16.0, 6) AS est_jaccard,
       CAST(levenshtein(na.t, nb.t) AS BIGINT) AS edit_dist,
       CASE WHEN greatest(length(na.t), length(nb.t)) > 0
            THEN round(1.0 - levenshtein(na.t, nb.t) * 1.0
                       / greatest(length(na.t), length(nb.t)), 6) END AS edit_sim
FROM agree g
JOIN norm na ON na.doc_id = g.id_a
JOIN norm nb ON nb.doc_id = g.id_b
ORDER BY id_a, id_b
"""


def blocklist_report(spark, sf):
    """Weighted blocklist tagging (X66, operators/blocklist.py — the
    C4 badwords / RefinedWeb weighted-blocklist family): per-doc hit
    counts + weighted score against a planted 4-term list (one term never
    occurring, exercising the zero path), flagged at score >= 8; per-lang
    rollup. The 6dp mean uses the integral half-up recipe so partial-agg
    order can't flip the hash.
    Reference analog: none — rebuild-only operator (SURVEY §2.13)."""
    from .operators.blocklist import blocklist_tag

    terms = spark.createDataFrame(
        [("slow", 1), ("filter", 2), ("hash", 4), ("zebra", 8)],
        "term string, weight long",
    )
    d = _spread(t(spark, sf, "documents"))
    tagged = blocklist_tag(d, "text", "doc_id", terms, threshold=8,
                           keep_cols=("lang",))
    return (
        tagged.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("flagged").cast("long").alias("flagged_docs"),
            F.sum("n_hits").cast("long").alias("total_hits"),
            F.sum("score").cast("long").alias("_s"),
        )
        .select(
            "lang",
            "n_docs",
            "flagged_docs",
            "total_hits",
            (
                F.expr("div(2 * _s * 1000000 + n_docs, 2 * n_docs)") / F.lit(1e6)
            ).alias("mean_score"),
        )
        .orderBy("lang")
    )


ORACLE_BLOCKLIST_REPORT = r"""
WITH terms(term, w) AS (VALUES ('slow', 1), ('filter', 2), ('hash', 4), ('zebra', 8)),
norm AS (
  SELECT doc_id, lang,
         coalesce(trim(regexp_replace(regexp_replace(lower(text), '[^\p{L} ]+', ' ', 'g'),
                                      '\s+', ' ', 'g')), '') AS t
  FROM documents
),
toks AS (
  SELECT doc_id, UNNEST(string_split(t, ' ')) AS tok
  FROM norm WHERE length(t) > 0
),
hits AS (
  SELECT k.doc_id,
         count(*) AS n_hits,
         count(DISTINCT k.tok) AS n_terms,
         sum(w) AS score
  FROM toks k JOIN terms ON terms.term = k.tok
  GROUP BY 1
),
per_doc AS (
  SELECT n.doc_id, n.lang,
         coalesce(h.n_hits, 0) AS n_hits,
         coalesce(h.score, 0) AS score,
         CASE WHEN coalesce(h.score, 0) >= 8 THEN 1 ELSE 0 END AS flagged
  FROM norm n LEFT JOIN hits h USING (doc_id)
)
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(flagged) AS BIGINT) AS flagged_docs,
       CAST(sum(n_hits) AS BIGINT) AS total_hits,
       ((2 * CAST(sum(score) AS BIGINT) * 1000000 + count(*)) // (2 * count(*)))
         / 1000000.0 AS mean_score
FROM per_doc
GROUP BY lang
ORDER BY lang
"""


def labelprop_report(spark, sf):
    """Label propagation communities (X67, operators/labelprop.py —
    Raghavan et al. 2007 deterministic synchronous variant, ties to the
    smallest label) over the md5+ring link graph (the X55/X61 graph), 4
    rounds: top-15 communities by size with the in-plan changed-last-round
    convergence certificate on every row. Total order (n_members DESC,
    label) — label is unique per community row.
    Reference analog: none — rebuild-only operator (SURVEY §2.13)."""
    from .operators.labelprop import label_propagation

    docs = t(spark, sf, "documents")
    n = docs.count()  # 1-row query vector; doc_ids dense 0..n-1 (TESTDATA)
    did = F.col("doc_id")
    gen = docs.filter(did % 4 != 0).select(
        did.alias("src"),
        F.explode(F.sequence(F.lit(1), (did % 4).cast("int"))).alias("j"),
    )
    hash_e = gen.select(
        "src",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("src").cast("string"),
                            F.lit(":"),
                            F.col("j").cast("string"),
                        )
                    ),
                    1,
                    6,
                ),
                16,
                10,
            ).cast("long")
            % n
        ).alias("dst"),
    ).filter(F.col("dst") != F.col("src"))
    ring = docs.select(did.alias("src"), ((did + 1) % n).alias("dst")).unionAll(
        docs.select(did.alias("src"), ((did + 2) % n).alias("dst"))
    )
    labels, meta = label_propagation(hash_e.unionAll(ring), n_rounds=4)
    return (
        labels.groupBy("label")
        .agg(F.count(F.lit(1)).cast("long").alias("n_members"))
        .crossJoin(F.broadcast(meta))
        .select(
            F.col("label").cast("long").alias("label"),
            "n_members",
            (F.col("n_changed_last") == 0).cast("long").alias("converged"),
        )
        .orderBy(F.desc("n_members"), "label")
        .limit(15)
    )


def _labelprop_oracle(n_rounds: int = 4) -> str:
    """LPA unrolled (the X36/X53 trajectory discipline): per round a
    (tally, packed-argmax, labels) MATERIALIZED CTE triple; the tie-break
    rides in the cnt*2^32 + (2^32-1-label) pack so plain max replays
    Spark's max exactly."""
    parts = [
        "WITH nn AS MATERIALIZED (",
        "  SELECT CAST(count(*) AS BIGINT) AS n FROM documents",
        "),",
        "gen AS (",
        "  SELECT doc_id AS src,",
        "         unnest(generate_series(1, CAST(doc_id % 4 AS BIGINT))) AS j",
        "  FROM documents WHERE doc_id % 4 <> 0",
        "),",
        "alledges AS MATERIALIZED (",
        "  SELECT src,",
        "         ('0x' || substr(md5(CAST(src AS VARCHAR) || ':' ||",
        "           CAST(j AS VARCHAR)), 1, 6))::BIGINT",
        "           % (SELECT n FROM nn) AS dst",
        "  FROM gen",
        "  UNION ALL",
        "  SELECT doc_id AS src, (doc_id + 1) % (SELECT n FROM nn) AS dst",
        "  FROM documents",
        "  UNION ALL",
        "  SELECT doc_id AS src, (doc_id + 2) % (SELECT n FROM nn) AS dst",
        "  FROM documents",
        "),",
        "e0 AS MATERIALIZED (",
        "  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b",
        "  FROM alledges WHERE src <> dst",
        "),",
        "bidir AS MATERIALIZED (",
        "  SELECT a AS u, b AS v FROM e0 UNION ALL SELECT b AS u, a AS v FROM e0",
        "),",
        "l0 AS MATERIALIZED (SELECT DISTINCT u AS node, u AS label FROM bidir),",
    ]
    for r in range(1, n_rounds + 1):
        p = r - 1
        parts += [
            f"t{r} AS MATERIALIZED (",
            f"  SELECT b.u, l.label, count(*) AS c",
            f"  FROM bidir b JOIN l{p} l ON l.node = b.v",
            "  GROUP BY 1, 2",
            "),",
            f"b{r} AS MATERIALIZED (",
            "  SELECT u AS node,",
            "         4294967295 - (max(c * 4294967296 + (4294967295 - label))",
            "                       % 4294967296) AS newl",
            f"  FROM t{r} GROUP BY u",
            "),",
            f"l{r} AS MATERIALIZED (",
            f"  SELECT l.node, coalesce(b.newl, l.label) AS label",
            f"  FROM l{p} l LEFT JOIN b{r} b USING (node)",
            "),",
        ]
    last, prev = n_rounds, n_rounds - 1
    parts += [
        "ch AS MATERIALIZED (",
        f"  SELECT CAST(count(*) AS BIGINT) AS n_changed",
        f"  FROM l{last} a JOIN l{prev} p USING (node)",
        "  WHERE a.label <> p.label",
        ")",
        "SELECT CAST(label AS BIGINT) AS label,",
        "       CAST(count(*) AS BIGINT) AS n_members,",
        "       CAST(CASE WHEN (SELECT n_changed FROM ch) = 0",
        "            THEN 1 ELSE 0 END AS BIGINT) AS converged",
        f"FROM l{last}",
        "GROUP BY label",
        "ORDER BY n_members DESC, label",
        "LIMIT 15",
    ]
    return "\n".join(parts)


ORACLE_LABELPROP_REPORT = _labelprop_oracle()


def streaming_sessions_report(spark, sf):
    """Fourth fully-oracled streaming query — and the first STATEFUL
    applyInPandasWithState query under the strict gate: the watermarked
    session state machine (streaming/pipeline.py stream_sessionize, X15's
    gap semantics under continuous arrival) replayed over the events
    table. Finality makes the oracle possible: a session emits exactly
    once, when the watermark proves no event can extend it, so the
    finalized set over a finite replay EQUALS the batch gap-split — the
    user_sessions SQL (in epoch-ms, both sides floor µs -> ms
    identically) replays the whole stateful trajectory. Plumbing: all
    real events in ONE file/batch (no late-drop ambiguity — at
    production scale arrival order is the watermark contract, not a
    coalesce), then two far-future sentinel waves: the first pushes the
    watermark past every real session's extension window, the second
    gets it APPLIED (watermark lag); sentinel sessions never finalize
    and are filtered by key. Wave order is pinned by EXPLICIT file
    mtimes (os.utime, one day apart per wave) — FileStreamSource orders
    by mtime, and wall-clock write times (the sleep-pinning the pytest
    drills use) are a mtime-granularity/clock-step race the oracle gate
    must not carry."""
    import glob as _glob
    import os as _os
    import shutil
    import tempfile

    from .streaming import stream_sessionize

    base = f"{tempfile.gettempdir()}/ooe_stream_sess"
    shutil.rmtree(base, ignore_errors=True)
    src, ckpt = f"{base}/src", f"{base}/ckpt"
    e = t(spark, sf, "events").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )  # NTZ -> TIMESTAMP: watermarks reject NTZ; epoch parity per the
    # unix_micros/epoch_us twin (session tz is UTC)
    e.coalesce(1).write.mode("overwrite").parquet(src)

    def _pin_wave(wave_no: int, seen: set[str]) -> set[str]:
        files = set(_glob.glob(f"{src}/part-*.parquet"))
        for f in sorted(files - seen):
            _os.utime(f, (1_000_000_000 + 86_400 * wave_no,) * 2)
        return files

    seen = _pin_wave(0, set())
    for wave_no, day in enumerate(("2030-01-01", "2030-01-02"), start=1):
        spark.createDataFrame(
            [(-1,)], "user_id long"
        ).select(
            "user_id", F.lit(day).cast("timestamp").alias("ts")
        ).coalesce(1).write.mode("append").parquet(src)
        seen = _pin_wave(wave_no, seen)
    stream = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    name = "ooe_stream_sessions"
    try:
        spark.catalog.dropTempView(name)
    except Exception:
        pass
    q = (
        stream_sessionize(stream, "user_id", "ts", gap_minutes=30.0,
                          watermark="1 hour")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout=180):
        q.stop()
        raise TimeoutError("streaming_sessions_report: query did not finish")
    return (
        spark.table(name)
        .filter(F.col("user") != "-1")
        .select(
            F.col("user").cast("long").alias("user_id"),
            F.col("session_id").cast("long").alias("session_id"),
            F.col("n_events").cast("long").alias("n_events"),
            F.col("session_start_ms").cast("long").alias("session_start_ms"),
            F.col("session_end_ms").cast("long").alias("session_end_ms"),
        )
        .orderBy("user_id", "session_id")
    )


ORACLE_STREAMING_SESSIONS = """
WITH e AS (
  SELECT user_id, epoch_ms(ts) AS ms FROM events
),
flagged AS (
  SELECT user_id, ms,
         CASE WHEN lag(ms) OVER w IS NULL OR ms - lag(ms) OVER w > 1800000
              THEN 1 ELSE 0 END AS f
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ms)
),
sess AS (
  SELECT user_id, ms,
         CAST(sum(f) OVER (PARTITION BY user_id ORDER BY ms
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
  FROM flagged
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       sid AS session_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(min(ms) AS BIGINT) AS session_start_ms,
       CAST(max(ms) AS BIGINT) AS session_end_ms
FROM sess
GROUP BY user_id, sid
ORDER BY user_id, sid
"""


def temperature_mixing_report(spark, sf):
    """Temperature-scaled corpus mixing (X68, operators/mixing.py
    temperature_quotas — the XLM-R/mT5 p_i ∝ n_i^0.3 sampling rule) at
    target_frac=0.5, composed with the X26 exact-quota selector: per
    source, the raw and temperature shares, the integral quota, and the
    ACTUAL kept count from apply_mixture (equal to the quota by
    construction — the end-to-end pin rides in the hash).
    Reference analog: none — rebuild-only operator (SURVEY §2.13)."""
    from .operators.mixing import apply_mixture, temperature_quotas

    d = t(spark, sf, "documents").select("doc_id", "source")
    q = temperature_quotas(d, "source", alpha=0.3, target_frac=0.5)
    kept = (
        apply_mixture(d, "source", "doc_id", q)
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("long").alias("kept"))
    )
    return (
        q.join(kept, "source", "left")
        .select(
            "source",
            "n_docs",
            "raw_frac",
            "temp_frac",
            "quota",
            F.coalesce("kept", F.lit(0)).cast("long").alias("kept"),
        )
        .orderBy("source")
    )


ORACLE_TEMPERATURE_MIXING = """
WITH counts AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY source
),
wts AS (
  SELECT source, n,
         CAST(round(power(n, 0.3) * 1000000000) AS BIGINT) AS wn
  FROM counts
),
tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS total, CAST(sum(wn) AS BIGINT) AS sumw
  FROM wts
),
q AS (
  SELECT w.source, w.n, w.wn,
         least(w.n, CAST((w.wn::HUGEINT
                          * CAST(floor(t.total * 0.5) AS BIGINT))
                         // t.sumw AS BIGINT)) AS quota
  FROM wts w, tot t
),
ranked AS (
  SELECT d.source, d.doc_id,
         row_number() OVER (PARTITION BY d.source
                            ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id)
           AS rn
  FROM documents d
),
kept AS (
  SELECT r.source, CAST(count(*) AS BIGINT) AS kept
  FROM ranked r JOIN q ON q.source = r.source
  WHERE r.rn <= q.quota
  GROUP BY r.source
)
SELECT q.source, q.n AS n_docs,
       round(q.n * 1.0 / t.total, 6) AS raw_frac,
       round(q.wn * 1.0 / t.sumw, 6) AS temp_frac,
       q.quota,
       coalesce(k.kept, 0) AS kept
FROM q CROSS JOIN tot t
LEFT JOIN kept k ON k.source = q.source
ORDER BY q.source
"""


def rendezvous_shard_report(spark, sf):
    """Rendezvous/HRW sharding (X71, operators/rendezvous.py — Thaler &
    Ravishankar 1998 consistent shard assignment): every document is
    assigned at S=13 and S=14 shards by the SAME in-row hash tournament,
    and the per-shard report carries the minimal-movement property in the
    oracled values themselves: n_moved == n_to_new on every row (a moved
    key can only move TO the new shard 13), and movement totals ~1/14 of
    the corpus. Zero joins/shuffles for the assignment; one
    map-side-combined groupBy for the report. moved_frac uses the
    integral half-up 6dp recipe.
    Reference analog: none — rebuild-only operator (SURVEY §2.13)."""
    from .operators.rendezvous import rendezvous_shard

    d = _spread(t(spark, sf, "documents"))
    assigned = d.select(
        "doc_id",
        rendezvous_shard(F.col("doc_id"), 13).alias("shard"),
        rendezvous_shard(F.col("doc_id"), 14).alias("_next"),
    )
    moved = F.col("_next") != F.col("shard")
    return (
        assigned.groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(moved.cast("long")).cast("long").alias("n_moved"),
            F.sum((F.col("_next") == F.lit(13)).cast("long"))
            .cast("long")
            .alias("n_to_new"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .withColumn(
            "moved_frac",
            F.expr("div(2 * n_moved * 1000000 + n_docs, 2 * n_docs)")
            / F.lit(1e6),
        )
        .orderBy("shard")
    )


# HRW replayed exactly: the packed 52-bit score + shard-id tournament as a
# max over UNNEST(range(S)), the '0x'-cast hex->int twin, and the same
# integral half-up 6dp movement rate.
ORACLE_RENDEZVOUS_SHARD = """
WITH a13 AS (
  SELECT doc_id,
         CAST(max(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':hrw:'
                                   || CAST(s AS VARCHAR)), 1, 13))::BIGINT
                  * 1024 + s) % 1024 AS INT) AS shard
  FROM documents CROSS JOIN (SELECT UNNEST(range(13)) AS s)
  GROUP BY doc_id
),
a14 AS (
  SELECT doc_id,
         CAST(max(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':hrw:'
                                   || CAST(s AS VARCHAR)), 1, 13))::BIGINT
                  * 1024 + s) % 1024 AS INT) AS next_shard
  FROM documents CROSS JOIN (SELECT UNNEST(range(14)) AS s)
  GROUP BY doc_id
),
j AS (
  SELECT a13.doc_id, a13.shard, a14.next_shard
  FROM a13 JOIN a14 ON a14.doc_id = a13.doc_id
)
SELECT shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN next_shard <> shard THEN 1 ELSE 0 END) AS BIGINT)
         AS n_moved,
       CAST(sum(CASE WHEN next_shard = 13 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_to_new,
       min(doc_id) AS min_doc,
       max(doc_id) AS max_doc,
       ((2 * CAST(sum(CASE WHEN next_shard <> shard THEN 1 ELSE 0 END) AS BIGINT)
         * 1000000 + count(*)) // (2 * count(*))) / 1e6 AS moved_frac
FROM j
GROUP BY shard
ORDER BY shard
"""


def weighted_sample_report(spark, sf):
    """Weighted sampling without replacement (X70,
    operators/sampling.py weighted_sample_es — Efraimidis & Spirakis
    2006 in the exponential-clocks form): the 30 documents with the
    smallest deterministic clocks -ln(u)/n_chars, i.e. a
    length-proportional sample with no RNG anywhere — u is the
    (md5-hash32 + 0.5)/2^32 uniform, so the draw replays exactly in
    DuckDB (ln parity). Selection is TakeOrderedAndProject (size-30
    heap per partition), never a global sort.
    Reference analog: none — rebuild-only operator (SURVEY §2.13)."""
    from .operators.sampling import weighted_sample_es

    d = _spread(t(spark, sf, "documents")).select(
        "doc_id", "lang", "n_chars"
    )
    s = weighted_sample_es(d, "doc_id", "n_chars", 30)
    return s.select(
        "doc_id",
        "lang",
        F.col("n_chars").cast("long").alias("weight"),
        _r(F.col("es_key")).alias("es_key"),
    )


# E-S replayed exactly: the same md5 hash32 uniform, the same clock
# expression on operand-identical doubles, the same (clock, key) total
# order and LIMIT.
ORACLE_WEIGHTED_SAMPLE = """
WITH c AS (
  SELECT doc_id, lang, n_chars,
         -ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':es42'), 1, 8))::BIGINT
              + 0.5) / 4294967296.0) / CAST(n_chars AS DOUBLE) AS ekey
  FROM documents
  WHERE n_chars > 0
)
SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS weight,
       round(ekey, 6) AS es_key
FROM c
ORDER BY ekey, doc_id
LIMIT 30
"""


def moore_lewis_report(spark, sf):
    """Moore-Lewis cross-entropy difference selection (X69,
    operators/moorelewis.py — Moore & Lewis 2010): rank the English
    general pool (every source but the seed) by H_in - H_out, where the
    in-domain LM trains on the src0/src1 seed slice and the general LM on
    the pool itself (both via train_char_lm, the X13 layer), and keep the
    15 most in-domain docs. Scores are exact BIGINT nano-log sums over a
    broadcast vocab-scale diff table (one explode + BroadcastHashJoin +
    map-side-combined per-doc agg — the corpus never shuffles); selection
    is TakeOrderedAndProject on the exact-operand double, doc_id
    tiebreak. Reference analog: none — rebuild-only (SURVEY §2.13)."""
    from .operators.moorelewis import moore_lewis_select
    from .operators.perplexity import train_char_lm

    d = _spread(t(spark, sf, "documents"))
    en = d.filter(F.col("lang") == "en")
    seed = en.filter(F.col("source").isin("src0", "src1"))
    pool = en.filter(~F.col("source").isin("src0", "src1"))
    lm_in = train_char_lm(seed, text_col="text", lang_col="lang")
    lm_out = train_char_lm(pool, text_col="text", lang_col="lang")
    sel = moore_lewis_select(
        pool.select("doc_id", "lang", "source", "text"),
        lm_in,
        lm_out,
        k=15,
        keep_cols=("source",),
    )
    return sel.select(
        "doc_id",
        "source",
        "n_grams",
        "ml_nano",
        _r(F.col("ml_score")).alias("ml_score"),
    )


# Full replay: both add-one-smoothed trigram LMs (the proven
# ORACLE_TRAIN_LM spelling), the full-outer nano diff table with -6.0 OOV
# backoff on each side, the per-doc exact BIGINT sum, and the same
# (exact-operand quotient, doc_id) total order + LIMIT. log10 parity on
# operand-identical doubles is the established ln/log10 recipe.
ORACLE_MOORE_LEWIS = r"""
WITH norm AS (
  SELECT doc_id, source,
         coalesce(trim(regexp_replace(regexp_replace(lower(text), '[^\p{L} ]+', ' ', 'g'),
                                      '\s+', ' ', 'g')), '') AS t
  FROM documents
  WHERE lang = 'en'
),
seed_g AS (
  SELECT substr(t, CAST(i AS INT), 3) AS ngram
  FROM norm, UNNEST(range(1, length(t) - 1)) AS u(i)
  WHERE length(t) >= 3 AND source IN ('src0', 'src1')
),
pool_g AS (
  SELECT doc_id, substr(t, CAST(i AS INT), 3) AS ngram
  FROM norm, UNNEST(range(1, length(t) - 1)) AS u(i)
  WHERE length(t) >= 3 AND source NOT IN ('src0', 'src1')
),
cin AS (SELECT ngram, count(*) AS c FROM seed_g GROUP BY 1),
lin AS (
  SELECT ngram,
         log10((c + 1.0) / (sum(c) OVER () + count(*) OVER ())) AS lp
  FROM cin
),
cout AS (SELECT ngram, count(*) AS c FROM pool_g GROUP BY 1),
lout AS (
  SELECT ngram,
         log10((c + 1.0) / (sum(c) OVER () + count(*) OVER ())) AS lp
  FROM cout
),
diff AS (
  SELECT coalesce(i.ngram, o.ngram) AS ngram,
         CAST(round((coalesce(o.lp, -6.0) - coalesce(i.lp, -6.0)) * 1e9) AS BIGINT) AS dn
  FROM lin i FULL OUTER JOIN lout o ON i.ngram = o.ngram
),
s AS (
  SELECT g.doc_id,
         count(*) AS n_grams,
         CAST(sum(coalesce(d.dn, 0)) AS BIGINT) AS ml_nano
  FROM pool_g g LEFT JOIN diff d USING (ngram)
  GROUP BY 1
)
SELECT s.doc_id, n.source, s.n_grams, s.ml_nano,
       round(CAST(s.ml_nano AS DOUBLE) / (1e9 * s.n_grams), 6) AS ml_score
FROM s JOIN norm n USING (doc_id)
ORDER BY CAST(s.ml_nano AS DOUBLE) / (1e9 * s.n_grams), s.doc_id
LIMIT 15
"""


def doremi_report(spark, sf):
    """DoReMi domain reweighting (X72, operators/doremi.py — Xie et al.
    2023): Group-DRO multiplicative weights over the English sources.
    The "proxy" LM trains on the src0/src1 slice and the frozen
    "reference" LM on the full English corpus (both via train_char_lm,
    the X13 layer), so domains the skewed proxy underserves carry
    positive excess loss and get upweighted — the paper's update rule
    replayed exactly for 5 steps (eta=1, smoothing=0.01) from the
    uniform start, reporting the final and time-averaged weights.
    Per-domain losses are exact BIGINT nano sums over a broadcast
    vocab-scale table (one explode + BroadcastHashJoin + map-side-
    combined domain agg — the corpus never shuffles); the MW loop runs
    on the DOMAIN-scale frame with nano-integer weights (order-exact
    sums). Reference analog: none — rebuild-only (SURVEY §2.13)."""
    from .operators.doremi import domain_excess_losses, doremi_weights
    from .operators.perplexity import train_char_lm

    d = _spread(t(spark, sf, "documents")).filter(F.col("lang") == "en")
    proxy = train_char_lm(
        d.filter(F.col("source").isin("src0", "src1")),
        text_col="text",
        lang_col="lang",
    )
    ref = train_char_lm(d, text_col="text", lang_col="lang")
    losses = domain_excess_losses(d, proxy, ref)
    wts = doremi_weights(losses, n_steps=5, eta=1.0, smoothing=0.01)
    return wts.select(
        "domain",
        "n_grams",
        _r(F.col("excess")).alias("excess"),
        "w_final",
        "w_avg",
    ).orderBy("domain")


# Full replay: both add-one-smoothed trigram LMs (the proven
# ORACLE_TRAIN_LM spelling), the full-outer merged nano loss table with
# -6.0 OOV backoff per side, exact BIGINT domain sums, then the 5-step
# multiplicative-weights unroll with nano-quantized weights — every
# cross-row sum is an integer sum, every elementwise double op runs on
# operand-identical values (the established exp/ln parity recipe).
ORACLE_DOREMI = r"""
WITH norm AS (
  SELECT source,
         coalesce(trim(regexp_replace(regexp_replace(lower(text), '[^\p{L} ]+', ' ', 'g'),
                                      '\s+', ' ', 'g')), '') AS t
  FROM documents
  WHERE lang = 'en'
),
g AS (
  SELECT source, substr(t, CAST(i AS INT), 3) AS ngram
  FROM norm, UNNEST(range(1, length(t) - 1)) AS u(i)
  WHERE length(t) >= 3
),
cp AS (SELECT ngram, count(*) AS c FROM g WHERE source IN ('src0', 'src1') GROUP BY 1),
lp AS (
  SELECT ngram,
         log10((c + 1.0) / (sum(c) OVER () + count(*) OVER ())) AS l
  FROM cp
),
cr AS (SELECT ngram, count(*) AS c FROM g GROUP BY 1),
lr AS (
  SELECT ngram,
         log10((c + 1.0) / (sum(c) OVER () + count(*) OVER ())) AS l
  FROM cr
),
tbl AS (
  SELECT coalesce(p.ngram, r.ngram) AS ngram,
         CAST(round(-coalesce(p.l, -6.0) * 1e9) AS BIGINT) AS pn,
         CAST(round(-coalesce(r.l, -6.0) * 1e9) AS BIGINT) AS rn
  FROM lp p FULL OUTER JOIN lr r ON p.ngram = r.ngram
),
dl AS (
  SELECT g.source AS domain,
         CAST(count(*) AS BIGINT) AS n_grams,
         CAST(sum(coalesce(tbl.pn, 6000000000)) AS BIGINT) AS proxy_nano,
         CAST(sum(coalesce(tbl.rn, 6000000000)) AS BIGINT) AS ref_nano
  FROM g LEFT JOIN tbl USING (ngram)
  GROUP BY 1
),
e AS (
  SELECT domain, n_grams,
         round(greatest(0.0, CAST(proxy_nano - ref_nano AS DOUBLE)
                             / (CAST(n_grams AS DOUBLE) * 1e9)), 9) AS excess
  FROM dl
),
base AS (
  SELECT domain, n_grams, excess,
         CAST(round(exp(1.0 * excess) * 1e9) AS BIGINT) AS mn,
         CAST(round(1e9 / CAST(count(*) OVER () AS DOUBLE)) AS BIGINT) AS wn,
         CAST(count(*) OVER () AS DOUBLE) AS k
  FROM e
),
s1 AS (SELECT *, CAST(round((CAST(wn AS DOUBLE) / 1e9) * (CAST(mn AS DOUBLE) / 1e9) * 1e9) AS BIGINT) AS raw FROM base),
s1b AS (
  SELECT domain, n_grams, excess, mn, k,
         CAST(round((0.99 * (CAST(raw AS DOUBLE) / CAST(sum(raw) OVER () AS DOUBLE)) + 0.01 / k) * 1e9) AS BIGINT) AS wn
  FROM s1
),
s1c AS (SELECT *, wn AS acc FROM s1b),
s2 AS (SELECT *, CAST(round((CAST(wn AS DOUBLE) / 1e9) * (CAST(mn AS DOUBLE) / 1e9) * 1e9) AS BIGINT) AS raw FROM s1c),
s2b AS (
  SELECT domain, n_grams, excess, mn, k, acc,
         CAST(round((0.99 * (CAST(raw AS DOUBLE) / CAST(sum(raw) OVER () AS DOUBLE)) + 0.01 / k) * 1e9) AS BIGINT) AS wn
  FROM s2
),
s2c AS (SELECT domain, n_grams, excess, mn, k, wn, acc + wn AS acc FROM s2b),
s3 AS (SELECT *, CAST(round((CAST(wn AS DOUBLE) / 1e9) * (CAST(mn AS DOUBLE) / 1e9) * 1e9) AS BIGINT) AS raw FROM s2c),
s3b AS (
  SELECT domain, n_grams, excess, mn, k, acc,
         CAST(round((0.99 * (CAST(raw AS DOUBLE) / CAST(sum(raw) OVER () AS DOUBLE)) + 0.01 / k) * 1e9) AS BIGINT) AS wn
  FROM s3
),
s3c AS (SELECT domain, n_grams, excess, mn, k, wn, acc + wn AS acc FROM s3b),
s4 AS (SELECT *, CAST(round((CAST(wn AS DOUBLE) / 1e9) * (CAST(mn AS DOUBLE) / 1e9) * 1e9) AS BIGINT) AS raw FROM s3c),
s4b AS (
  SELECT domain, n_grams, excess, mn, k, acc,
         CAST(round((0.99 * (CAST(raw AS DOUBLE) / CAST(sum(raw) OVER () AS DOUBLE)) + 0.01 / k) * 1e9) AS BIGINT) AS wn
  FROM s4
),
s4c AS (SELECT domain, n_grams, excess, mn, k, wn, acc + wn AS acc FROM s4b),
s5 AS (SELECT *, CAST(round((CAST(wn AS DOUBLE) / 1e9) * (CAST(mn AS DOUBLE) / 1e9) * 1e9) AS BIGINT) AS raw FROM s4c),
s5b AS (
  SELECT domain, n_grams, excess, mn, k, acc,
         CAST(round((0.99 * (CAST(raw AS DOUBLE) / CAST(sum(raw) OVER () AS DOUBLE)) + 0.01 / k) * 1e9) AS BIGINT) AS wn
  FROM s5
),
s5c AS (SELECT domain, n_grams, excess, mn, k, wn, acc + wn AS acc FROM s5b)
SELECT domain, n_grams, round(excess, 6) AS excess,
       round(CAST(wn AS DOUBLE) / 1e9, 6) AS w_final,
       round(CAST(acc AS DOUBLE) / (1e9 * 5.0), 6) AS w_avg
FROM s5c
ORDER BY domain
"""


def diversity_report(spark, sf):
    """Corpus n-gram diversity (X73, operators/diversity.py — distinct-n,
    Li et al. 2016, plus a set-based self-BLEU analog, Zhu et al. 2018):
    per source, the share of word-bigram instances that are distinct
    types and the mean per-doc fraction of distinct bigrams shared with
    at least one OTHER document corpus-wide. One corpus explode collapses
    map-side to the per-doc type frame (persisted — it fans into three
    branches); document frequency joins back co-located on the gram key;
    per-doc ratios are ppm-quantized BIGINTs so the segment means are
    exact-integer sums. Reference analog: none — rebuild-only
    (SURVEY §2.13)."""
    from .operators.diversity import diversity_report_frame

    d = _spread(t(spark, sf, "documents"))
    return diversity_report_frame(d, n=2).orderBy("segment")


# Full replay: the same normalization/tokenization spelling as the other
# word-gram oracles, the per-doc type frame, corpus-wide document
# frequency, ppm-quantized per-doc ratios, exact integer segment sums.
ORACLE_DIVERSITY = r"""
WITH norm AS (
  SELECT doc_id, source,
         coalesce(trim(regexp_replace(regexp_replace(lower(text), '[^\p{L} ]+', ' ', 'g'),
                                      '\s+', ' ', 'g')), '') AS t
  FROM documents
),
tk AS (
  SELECT doc_id, source, string_split(t, ' ') AS toks
  FROM norm
  WHERE length(t) > 0
),
g AS (
  SELECT doc_id, source,
         toks[CAST(i AS INT)] || ' ' || toks[CAST(i AS INT) + 1] AS gram
  FROM tk, UNNEST(range(1, len(toks))) AS u(i)
),
gdi AS (
  SELECT gram, doc_id, source, CAST(count(*) AS BIGINT) AS k
  FROM g GROUP BY 1, 2, 3
),
segc AS (
  SELECT source,
         CAST(sum(c) AS BIGINT) AS total_grams,
         CAST(count(*) AS BIGINT) AS distinct_grams
  FROM (SELECT source, gram, sum(k) AS c FROM gdi GROUP BY 1, 2)
  GROUP BY 1
),
dfd AS (SELECT gram, CAST(count(*) AS BIGINT) AS df FROM gdi GROUP BY 1),
pd AS (
  SELECT gdi.doc_id, gdi.source,
         CAST(count(*) AS BIGINT) AS n_types,
         CAST(sum(CASE WHEN dfd.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS hits
  FROM gdi JOIN dfd USING (gram)
  GROUP BY 1, 2
),
sego AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(CAST(round(CAST(hits AS DOUBLE) / CAST(n_types AS DOUBLE) * 1e6) AS BIGINT)) AS BIGINT) AS ppm_sum
  FROM pd GROUP BY 1
),
tot AS (SELECT source, CAST(count(*) AS BIGINT) AS n_total FROM documents GROUP BY 1)
SELECT segc.source AS segment,
       sego.n_docs,
       tot.n_total - sego.n_docs AS n_docs_short,
       segc.total_grams,
       segc.distinct_grams,
       round(CAST(segc.distinct_grams AS DOUBLE) / CAST(segc.total_grams AS DOUBLE), 6) AS distinct_ratio,
       round(CAST(sego.ppm_sum AS DOUBLE) / (1e6 * CAST(sego.n_docs AS DOUBLE)), 6) AS mean_self_overlap
FROM segc
JOIN sego USING (source)
JOIN tot USING (source)
ORDER BY segment
"""


def novelty_report(spark, sf):
    """N-gram novelty curve (X74, operators/novelty.py — McCoy et al.
    2021 n-gram novelty / Heaps'-law vocabulary growth): bucket the
    corpus into 10 equal-width doc_id ranges and report, per bucket, the
    word-bigram types first seen there, the running vocabulary total,
    and the novelty ratio. First occurrence is one explode +
    map-side-combined min agg; the census reads bigram COUNTS (array
    size, no explode); buckets come from a broadcast 1-row id-span agg —
    no global sort or row_number anywhere. All integers until the final
    6dp ratio. Reference analog: none — rebuild-only (SURVEY §2.13)."""
    from .operators.novelty import novelty_curve

    d = _spread(t(spark, sf, "documents"))
    return novelty_curve(d, n=2, n_buckets=10).orderBy("bucket")


# Full replay: the same normalization/tokenization spelling, min-doc_id
# first occurrence, the identical double bucket expression on exact
# integer operands, integer census, running sum over the bucket frame.
ORACLE_NOVELTY = r"""
WITH norm AS (
  SELECT doc_id,
         coalesce(trim(regexp_replace(regexp_replace(lower(text), '[^\p{L} ]+', ' ', 'g'),
                                      '\s+', ' ', 'g')), '') AS t
  FROM documents
),
tk AS (
  SELECT doc_id, string_split(t, ' ') AS toks
  FROM norm
  WHERE length(t) > 0
),
g AS (
  SELECT doc_id,
         toks[CAST(i AS INT)] || ' ' || toks[CAST(i AS INT) + 1] AS gram
  FROM tk, UNNEST(range(1, len(toks))) AS u(i)
),
span AS (SELECT min(doc_id) AS mn, max(doc_id) AS mx FROM documents),
firstg AS (SELECT gram, min(doc_id) AS f FROM g GROUP BY 1),
nt AS (
  SELECT least(9, CAST(floor(CAST(f - mn AS DOUBLE) * 10.0
                             / CAST(mx - mn + 1 AS DOUBLE)) AS BIGINT)) AS bucket,
         CAST(count(*) AS BIGINT) AS new_types
  FROM firstg CROSS JOIN span
  GROUP BY 1
),
sz AS (
  SELECT doc_id,
         CASE WHEN length(t) = 0 THEN 0
              ELSE greatest(len(string_split(t, ' ')) - 1, 0) END AS ni
  FROM norm
),
cen AS (
  SELECT least(9, CAST(floor(CAST(doc_id - mn AS DOUBLE) * 10.0
                             / CAST(mx - mn + 1 AS DOUBLE)) AS BIGINT)) AS bucket,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(ni) AS BIGINT) AS instances
  FROM sz CROSS JOIN span
  GROUP BY 1
),
j AS (
  SELECT cen.bucket, cen.n_docs, cen.instances,
         CAST(coalesce(nt.new_types, 0) AS BIGINT) AS new_types
  FROM cen LEFT JOIN nt USING (bucket)
)
SELECT bucket, n_docs, instances, new_types,
       CAST(sum(new_types) OVER (ORDER BY bucket) AS BIGINT) AS cum_types,
       CASE WHEN instances <> 0
            THEN round(CAST(new_types AS DOUBLE) / CAST(instances AS DOUBLE), 6)
       END AS novelty_ratio
FROM j
ORDER BY bucket
"""


def boot_ci_report(spark, sf):
    """Poisson bootstrap confidence intervals (X75,
    operators/bootstrap.py — Chamandy et al. 2012): per language, the
    exact mean of n_chars plus a ~90% percentile interval from 20
    Poisson(1)-weighted replicate means (ranks 2 and 19, replicate-index
    tiebreak). All 20 replicates are per-row codegen weight columns
    summed in ONE map-side-combined pass — no replicate explode of the
    corpus, one BIGINT-cell row per language on the wire; the rank
    window runs on the 20 x |langs| replicate frame. Weights come from
    the deterministic md5-hash32 uniform through a truncated
    inverse-CDF table, so the whole draw replays in SQL. Reference
    analog: none — rebuild-only (SURVEY §2.13)."""
    from .operators.bootstrap import poisson_bootstrap_ci

    d = _spread(t(spark, sf, "documents"))
    out = poisson_bootstrap_ci(
        d, value_col="n_chars", group_col="lang", id_col="doc_id"
    )
    return out.select(
        F.col("group").alias("lang"),
        "n_docs",
        "mean_value",
        "boot_lo",
        "boot_hi",
    ).orderBy("lang")


def _oracle_boot_ci(n_replicates: int = 20, lo: int = 2, hi: int = 19) -> str:
    """Full replay, built from the operator's own CDF table: the same
    md5-hash32 uniform per (doc_id, replicate), the same truncated
    Poisson(1) inverse-CDF literals, exact BIGINT weighted sums (the
    oracle may explode replicates — DuckDB has no 100 TB to protect),
    the same (estimate, replicate) rank order and clamped rank picks."""
    from .operators.bootstrap import POISSON1_CDF

    case = (
        "CASE "
        + " ".join(
            f"WHEN u < {c!r} THEN {k}" for k, c in enumerate(POISSON1_CDF)
        )
        + " ELSE 7 END"
    )
    return f"""
WITH rep AS (
  SELECT doc_id, lang, n_chars, CAST(i AS INT) AS r
  FROM documents, UNNEST(range(0, {n_replicates})) AS t(i)
),
uu AS (
  SELECT lang, n_chars, r,
         (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':pb' || CAST(r AS VARCHAR)), 1, 8))::BIGINT
          + 0.5) / 4294967296.0 AS u
  FROM rep
),
ww AS (SELECT lang, r, n_chars, {case} AS w FROM uu),
est AS (
  SELECT lang, r,
         CAST(sum(w * n_chars) AS BIGINT) AS sr,
         CAST(sum(w) AS BIGINT) AS cr
  FROM ww GROUP BY 1, 2
),
rk AS (
  SELECT lang,
         CAST(sr AS DOUBLE) / CAST(cr AS DOUBLE) AS e,
         row_number() OVER (PARTITION BY lang
                            ORDER BY CAST(sr AS DOUBLE) / CAST(cr AS DOUBLE), r) AS rn,
         count(*) OVER (PARTITION BY lang) AS nr
  FROM est WHERE cr > 0
),
ci AS (
  SELECT lang,
         max(CASE WHEN rn = least({lo}, nr) THEN e END) AS lo_e,
         max(CASE WHEN rn = least({hi}, nr) THEN e END) AS hi_e
  FROM rk GROUP BY 1
),
base AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS sv
  FROM documents GROUP BY 1
)
SELECT base.lang, n_docs,
       round(CAST(sv AS DOUBLE) / CAST(n_docs AS DOUBLE), 6) AS mean_value,
       round(lo_e, 6) AS boot_lo,
       round(hi_e, 6) AS boot_hi
FROM base JOIN ci USING (lang)
ORDER BY base.lang
"""


def phash_dedup_report(spark, sf):
    """Perceptual-hash image near-dup (X76, multimodal/phash.py — the
    pHash.org DCT hash, Zauner 2010, the LAION-style image-dedup
    primitive) over fixture media plus a 32x32-resized TWIN of every
    image: per kind, how many images hashed, how many found their twin
    at Hamming 0 (the nearest-grid resample makes twin hashes
    bit-identical by construction — the invariance the hash exists
    for), and how many near-pairs the 8-band index returned overall.
    Rows-only: binary payloads cannot replay in SQL (the X14 boundary);
    bit-exactness is pytest-golden (tests/test_phash.py)."""
    from .multimodal import media_df, phash_images, phash_near_dup_pairs, resize_images

    m = media_df(spark, 200, partitions=4)
    sig_o = phash_images(m)
    twins = resize_images(m, 32, 32).join(
        m.select("media_id", "kind"), "media_id"
    )
    sig_t = phash_images(twins).select(
        (F.col("media_id") + F.lit(1_000_000)).alias("media_id"),
        "kind",
        "phash",
        "error",
    )
    pairs = phash_near_dup_pairs(sig_o.unionByName(sig_t), max_hamming=7)
    twin_pair = (F.col("id_b") - F.col("id_a")) == 1_000_000
    enriched = pairs.join(
        sig_o.select(F.col("media_id").alias("id_a"), "kind"), "id_a"
    )
    per_kind = enriched.groupBy("kind").agg(
        F.sum(F.when(twin_pair & (F.col("hamming") == 0), 1).otherwise(0))
        .cast("long")
        .alias("n_twin_exact"),
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
    )
    hashed = sig_o.filter(F.col("phash").isNotNull()).groupBy("kind").agg(
        F.count(F.lit(1)).cast("long").alias("n_hashed")
    )
    return (
        hashed.join(per_kind, "kind", "left")
        .select(
            "kind",
            "n_hashed",
            F.coalesce(F.col("n_twin_exact"), F.lit(0)).alias("n_twin_exact"),
            F.coalesce(F.col("n_pairs"), F.lit(0)).alias("n_pairs"),
        )
        .orderBy("kind")
    )


def link_graph_report(spark, sf):
    """Crawl link-graph extraction (X77, extract/links.py): pull <a href>
    targets out of the fixture pages' HTML over the same Arrow channel
    as the extractor, resolve them against each page's url, and roll the
    page-level edge list up per host — pages, edges, distinct targets,
    and the host's hottest hub target (max(count) with a dst-string
    tiebreak packed in one struct max). PDFs / empty / undecodable pages
    contribute no edges by contract. Rows-only: the DuckDB oracle cannot
    parse HTML (same boundary as extraction_report); href goldens and
    the python-mirror parity are pytest-gated (tests/test_links.py)."""
    from .extract.links import link_edges
    from .fixtures.generate import web_pages_df
    from .functions.url import url_host

    pages = web_pages_df(spark, 1000, 8)
    edges = link_edges(pages)
    per = edges.groupBy(
        url_host(F.col("src")).alias("host"), F.col("dst")
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    hostagg = per.groupBy("host").agg(
        F.sum("cnt").cast("long").alias("n_edges"),
        F.count(F.lit(1)).cast("long").alias("distinct_dst"),
        F.max(F.struct(F.col("cnt"), F.col("dst"))).alias("_top"),
    )
    npages = pages.groupBy(url_host(F.col("url")).alias("host")).agg(
        F.count(F.lit(1)).cast("long").alias("n_pages")
    )
    return (
        npages.join(hostagg, "host", "left")
        .select(
            "host",
            "n_pages",
            F.coalesce(F.col("n_edges"), F.lit(0)).alias("n_edges"),
            F.coalesce(F.col("distinct_dst"), F.lit(0)).alias("distinct_dst"),
            F.col("_top.cnt").alias("top_dst_cnt"),
            F.col("_top.dst").alias("top_dst"),
        )
        .orderBy("host")
    )


def curation_funnel_report(spark, sf):
    """FineWeb/RefinedWeb-style curation funnel (X78 — Penedo et al.
    2023/2024): the three canonical curation stages COMPOSED end-to-end
    with per-stage attrition counts, each stage applied to the previous
    stage's survivors: (1) Gopher/C4 quality rules (X38 rulepack, the
    gopher_rules_report planted-failure mutation so the clean synthetic
    corpus actually attrites), (2) exact dedup keeping the min-doc_id
    representative per normalized-text fingerprint (every 19th doc is
    mutated into one shared boilerplate page — the fixture corpus has no
    natural exact dups, so the dup cluster is planted like the quality
    failures), (3) 4-gram benchmark decontamination (X21, every-97th-doc
    benchmark, >= 0.5 overlap dropped — benchmark members score 1.0 and
    fall out by construction; doc 0 is both boilerplate and benchmark,
    so the boilerplate cluster's lone survivor also falls here).
    Implemented as per-doc FLAGS folded in ONE final per-lang agg — no
    stage materializes a filtered corpus copy; the mutated frame is
    persisted because it fans into the flag, fingerprint, and
    contamination branches (the winnow fan-out rule). Per-lang funnel:
    n_docs -> n_quality -> n_unique -> n_clean + retention. Reference
    analog: none — rebuild-only (SURVEY §2.13)."""
    from .functions.rulepacks import rulepack_flags
    from .operators.decontaminate import contamination_scores

    d = _spread(t(spark, sf, "documents"))
    did = F.col("doc_id")
    first3 = F.concat_ws(
        " ", F.slice(F.split(F.trim(F.col("text")), r"\s+"), 1, 3)
    )
    boiler = (
        "the quick brown fox jumps over the lazy dog and then it rests"
    )
    mut = (
        F.when(did % 19 == 0, F.lit(boiler))
        .when(did % 11 == 0, first3)
        .when(did % 13 == 0, F.concat(F.col("text"), F.lit(" ### ... ###")))
        .when(did % 17 == 0, F.concat(F.lit("lorem ipsum { "), F.col("text")))
        .otherwise(F.col("text"))
    )
    md = d.select("doc_id", "lang", mut.alias("text")).persist()
    flags = rulepack_flags(F.col("text"), min_words=5, max_words=100_000)
    pass_all = F.lit(True)
    for v in flags.values():
        pass_all = pass_all & v
    fp = F.md5(F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")))
    base = md.select(
        "doc_id", "lang", pass_all.alias("q_pass"), fp.alias("fp")
    )
    keep = (
        base.filter(F.col("q_pass"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("_keep_id"))
    )
    bench = md.filter(did % 97 == 0)
    sc = contamination_scores(md, bench, "text", "doc_id", n=4)
    full = base.join(keep, "fp", "left").join(
        sc.select("doc_id", "overlap"), "doc_id", "left"
    )
    kept = F.col("doc_id") == F.col("_keep_id")
    contaminated = F.coalesce(F.col("overlap") >= 0.5, F.lit(False))
    out = full.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.col("q_pass").cast("long")).cast("long").alias("n_quality"),
        F.sum((F.col("q_pass") & kept).cast("long"))
        .cast("long")
        .alias("n_unique"),
        F.sum((F.col("q_pass") & kept & ~contaminated).cast("long"))
        .cast("long")
        .alias("n_clean"),
    )
    return out.select(
        "lang",
        "n_docs",
        "n_quality",
        "n_unique",
        "n_clean",
        F.round(
            F.col("n_clean").cast("double") / F.col("n_docs").cast("double"),
            6,
        ).alias("retention"),
    ).orderBy("lang")


# Full replay, composed from the three proven stage oracles on the SAME
# mutated text: the gopher flag CTEs (doc_id carried), min-doc_id-per-
# fingerprint keep set over quality survivors, and the 4-gram md5-key
# contamination scorer; three-valued AND collapses to the same FALSE as
# Spark's boolean-cast sums.
ORACLE_CURATION_FUNNEL = rf"""
WITH mut AS (
  SELECT doc_id, lang,
    CASE
      WHEN doc_id % 19 = 0 THEN 'the quick brown fox jumps over the lazy dog and then it rests'
      WHEN doc_id % 11 = 0 THEN array_to_string(regexp_split_to_array(trim(text), '\s+')[1:3], ' ')
      WHEN doc_id % 13 = 0 THEN text || ' ### ... ###'
      WHEN doc_id % 17 = 0 THEN 'lorem ipsum {{ ' || text
      ELSE text
    END AS t
  FROM documents
),
f AS (
  SELECT doc_id, lang, t,
    CASE WHEN length(trim(t)) > 0 THEN len(regexp_split_to_array(trim(t), '\s+')) ELSE 0 END AS nw,
    length(regexp_replace(t, '\s', '', 'g')) AS nc,
    len(regexp_extract_all(t, '#|\.\.\.')) AS nsym,
    CASE WHEN length(trim(t)) > 0
         THEN len(list_filter(regexp_split_to_array(trim(t), '\s+'),
                              w -> regexp_matches(w, '[a-zA-Z]')))
         ELSE 0 END AS nalpha,
    len(regexp_extract_all(lower(t), '\b({_SW_EN})\b')) AS nsw,
    (contains(lower(t), 'lorem ipsum') OR contains(t, '{{')) AS banned
  FROM mut
),
base AS (
  SELECT doc_id, lang,
    ((nw >= 5 AND nw <= 100000)
     AND coalesce(nw > 0 AND nc * 1.0 / nw >= 3.0 AND nc * 1.0 / nw <= 10.0, FALSE)
     AND (CASE WHEN nw > 0 THEN nsym * 1.0 / nw <= 0.1 ELSE TRUE END)
     AND (CASE WHEN nw > 0 THEN nalpha * 1.0 / nw >= 0.8 ELSE TRUE END)
     AND (nsw >= 2)
     AND NOT banned) AS q_pass,
    md5(trim(regexp_replace(lower(t), '\s+', ' ', 'g'))) AS fp
  FROM f
),
keep AS (
  SELECT fp, min(doc_id) AS keep_id FROM base WHERE q_pass GROUP BY 1
),
norm AS (
  SELECT doc_id,
         coalesce(trim(regexp_replace(regexp_replace(lower(t), '[^\p{{L}} ]+', ' ', 'g'),
                                      '\s+', ' ', 'g')), '') AS nt
  FROM mut
),
toks AS (SELECT doc_id, string_split(nt, ' ') AS w FROM norm WHERE length(nt) > 0),
grams AS (
  SELECT DISTINCT doc_id,
         array_to_string(w[CAST(i AS INT):CAST(i + 3 AS INT)], ' ') AS gs
  FROM toks, UNNEST(range(1, len(w) - 2)) AS u(i)
  WHERE len(w) >= 4
),
keyed AS (SELECT doc_id, substr(md5(gs), 1, 16) AS gk FROM grams),
bench AS (SELECT DISTINCT gk FROM keyed WHERE doc_id % 97 = 0),
scored AS (
  SELECT k.doc_id, count(*) AS n_grams, count(b.gk) AS n_hits
  FROM keyed k LEFT JOIN bench b USING (gk)
  GROUP BY 1
),
wide AS (
  SELECT base.doc_id, base.lang, base.q_pass,
         (keep.keep_id = base.doc_id) AS kept,
         coalesce(scored.n_hits * 1.0 / scored.n_grams >= 0.5, FALSE) AS contaminated
  FROM base
  LEFT JOIN keep ON keep.fp = base.fp
  LEFT JOIN scored ON scored.doc_id = base.doc_id
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN q_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
       CAST(sum(CASE WHEN q_pass AND kept THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
       CAST(sum(CASE WHEN q_pass AND kept AND NOT contaminated THEN 1 ELSE 0 END) AS BIGINT) AS n_clean,
       round(sum(CASE WHEN q_pass AND kept AND NOT contaminated THEN 1 ELSE 0 END) * 1.0
             / count(*), 6) AS retention
FROM wide
GROUP BY lang
ORDER BY lang
"""


def neyman_sample_report(spark, sf):
    """Neyman-allocation stratified sampling (X79, operators/neyman.py —
    Neyman 1934): allocate a 60-sample audit budget over languages
    proportional to N_h*sigma_h of n_chars (the variance-minimizing
    rule), integerized by exact largest-remainder apportionment, then
    draw each stratum's quota in the deterministic md5 order. Per lang:
    stratum size, the exact-integer micro weight, the allocation, the
    drawn count, and the sample's mean n_chars. Stratum moments are one
    map-side-combined agg; the apportionment is all-integer on the
    stratum frame; the draw is a per-stratum rank window (the X31
    two-phase is the documented swap-in at extreme scale). Reference
    analog: none — rebuild-only (SURVEY §2.13)."""
    from .operators.neyman import neyman_allocation, neyman_sample

    d = _spread(t(spark, sf, "documents"))
    alloc = neyman_allocation(d, "lang", "n_chars", k=60)
    sel = neyman_sample(d, "lang", "n_chars", k=60)
    per = sel.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_sel"),
        F.sum(F.col("n_chars").cast("long")).cast("long").alias("_sc"),
    )
    out = alloc.select(
        F.col("stratum").alias("lang"), "n_docs", "w_micro", "alloc"
    ).join(per, "lang", "left")
    mean_sel = F.when(
        F.coalesce(F.col("n_sel"), F.lit(0)) > 0,
        F.round(
            F.col("_sc").cast("double") / F.col("n_sel").cast("double"), 6
        ),
    )
    return out.select(
        "lang",
        "n_docs",
        "w_micro",
        "alloc",
        F.coalesce(F.col("n_sel"), F.lit(0)).cast("long").alias("n_sel"),
        mean_sel.alias("mean_sel"),
    ).orderBy("lang")


# Full replay: exact BIGINT stratum moments, the sqrt(n*S2 - S1^2) micro
# weight on operand-identical doubles, all-integer largest-remainder
# apportionment (div/mod against the exact window total, stratum-name
# tiebreak), and the identical md5 rank order per stratum.
ORACLE_NEYMAN = """
WITH m AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS s1,
         CAST(sum(n_chars * n_chars) AS BIGINT) AS s2
  FROM documents GROUP BY 1
),
wts AS (
  SELECT lang, n_docs,
         CAST(round(sqrt(CAST(n_docs * s2 - s1 * s1 AS DOUBLE)) * 1e6) AS BIGINT) AS w_micro
  FROM m
),
ap AS (
  SELECT lang, n_docs, w_micro,
         CASE WHEN sum(w_micro) OVER () > 0
              THEN CAST((60 * w_micro - (60 * w_micro) % sum(w_micro) OVER ())
                        / sum(w_micro) OVER () AS BIGINT)
              ELSE 0 END AS base,
         CASE WHEN sum(w_micro) OVER () > 0
              THEN (60 * w_micro) % sum(w_micro) OVER ()
              ELSE 0 END AS rem
  FROM wts
),
ap2 AS (
  SELECT *, 60 - sum(base) OVER () AS leftover,
         row_number() OVER (ORDER BY rem DESC, lang ASC) AS rn
  FROM ap
),
alloc AS (
  SELECT lang, n_docs, w_micro,
         base + CASE WHEN w_micro > 0 AND rn <= leftover THEN 1 ELSE 0 END AS alloc
  FROM ap2
),
rk AS (
  SELECT doc_id, lang, n_chars,
         row_number() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR) || ':ney'), doc_id) AS sr
  FROM documents
),
sel AS (
  SELECT rk.lang, CAST(count(*) AS BIGINT) AS n_sel,
         CAST(sum(rk.n_chars) AS BIGINT) AS sc
  FROM rk JOIN alloc USING (lang)
  WHERE rk.sr <= alloc.alloc
  GROUP BY 1
)
SELECT a.lang, a.n_docs, a.w_micro, CAST(a.alloc AS BIGINT) AS alloc,
       CAST(coalesce(s.n_sel, 0) AS BIGINT) AS n_sel,
       CASE WHEN coalesce(s.n_sel, 0) > 0
            THEN round(CAST(s.sc AS DOUBLE) / CAST(s.n_sel AS DOUBLE), 6)
       END AS mean_sel
FROM alloc a LEFT JOIN sel s USING (lang)
ORDER BY a.lang
"""


def zipf_slope_report(spark, sf):
    """Zipf rank-frequency slope (X80 — Zipf 1949; the standard corpus
    health probe: natural text fits ln(freq) ~ a + s*ln(rank) with
    s ~ -1, and a collapsed or templated corpus bends away from it):
    per language, OLS slope over the top-200 word frequencies. Exactness
    discipline: ranks come from a (freq desc, word asc) row_number over
    the VOCABULARY-scale count frame; ln(rank)/ln(freq) are
    micro-quantized BIGINTs so every regression sum is an exact integer
    sum (products bounded < 2^63 for n<=200 by construction); the slope
    is one exact-operand double division, 6dp. One corpus explode with
    map-side combine; everything after runs on vocab- then lang-scale
    frames. Reference analog: none — rebuild-only (SURVEY §2.13)."""
    from .functions.ngram import word_tokens

    d = _spread(t(spark, sf, "documents"))
    toks = d.select(
        "lang", F.explode(word_tokens(F.col("text"))).alias("w")
    )
    counts = toks.groupBy("lang", "w").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    rn = F.row_number().over(
        W.partitionBy("lang").orderBy(F.col("c").desc(), F.col("w").asc())
    )
    top = counts.select("lang", "c", rn.alias("r")).filter(F.col("r") <= 200)
    x = F.round(F.log(F.col("r").cast("double")) * F.lit(1e6)).cast("long")
    y = F.round(F.log(F.col("c").cast("double")) * F.lit(1e6)).cast("long")
    s = top.select("lang", x.alias("x"), y.alias("y")).groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    num = (F.col("n_terms") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    den = (
        F.col("n_terms") * F.col("sxx") - F.col("sx") * F.col("sx")
    ).cast("double")
    slope = F.when(den != 0, F.round(num / den, 6))
    intercept = F.when(
        (den != 0) & (F.col("n_terms") > 0),
        F.round(
            (F.col("sy").cast("double") - (num / den) * F.col("sx").cast("double"))
            / (F.lit(1e6) * F.col("n_terms").cast("double")),
            6,
        ),
    )
    return s.select(
        "lang", "n_terms", slope.alias("zipf_slope"),
        intercept.alias("zipf_intercept"),
    ).orderBy("lang")


# Full replay: same tokenization, same (freq desc, word asc) rank order,
# micro-quantized ln values, exact integer regression sums, the same
# guarded exact-operand divisions.
ORACLE_ZIPF = r"""
WITH norm AS (
  SELECT lang,
         coalesce(trim(regexp_replace(regexp_replace(lower(text), '[^\p{L} ]+', ' ', 'g'),
                                      '\s+', ' ', 'g')), '') AS t
  FROM documents
),
tok AS (
  SELECT lang, u.w
  FROM norm, UNNEST(string_split(t, ' ')) AS u(w)
  WHERE length(t) > 0
),
counts AS (SELECT lang, w, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2),
top AS (
  SELECT lang, c,
         row_number() OVER (PARTITION BY lang ORDER BY c DESC, w ASC) AS r
  FROM counts
  QUALIFY r <= 200
),
q AS (
  SELECT lang,
         CAST(round(ln(CAST(r AS DOUBLE)) * 1e6) AS BIGINT) AS x,
         CAST(round(ln(CAST(c AS DOUBLE)) * 1e6) AS BIGINT) AS y
  FROM top
),
s AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_terms,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx
  FROM q GROUP BY 1
)
SELECT lang, n_terms,
       CASE WHEN (n_terms * sxx - sx * sx) <> 0
            THEN round(CAST(n_terms * sxy - sx * sy AS DOUBLE)
                       / CAST(n_terms * sxx - sx * sx AS DOUBLE), 6)
       END AS zipf_slope,
       CASE WHEN (n_terms * sxx - sx * sx) <> 0 AND n_terms > 0
            THEN round((CAST(sy AS DOUBLE)
                        - (CAST(n_terms * sxy - sx * sy AS DOUBLE)
                           / CAST(n_terms * sxx - sx * sx AS DOUBLE))
                          * CAST(sx AS DOUBLE))
                       / (1e6 * CAST(n_terms AS DOUBLE)), 6)
       END AS zipf_intercept
FROM s
ORDER BY lang
"""


def burstiness_report(spark, sf):
    """Term burstiness (X81 — Church & Gale 1995, "Poisson mixtures":
    content words are BURSTY — their per-document counts overdisperse a
    Poisson, boilerplate/function words don't; the variance-to-mean
    ratio is the classic test): over terms appearing in >= 20 documents,
    the 15 highest VMRs. With zeros included the VMR is exact integer
    arithmetic: mean = S1/n, var = (n*S2 - S1^2)/n^2, VMR = var/mean =
    (n*S2 - S1^2)/(n*S1) — one exact-operand double division per term.
    One corpus explode -> map-side-combined (term, doc) counts -> term
    moments; n (total docs) is a broadcast 1-row agg; selection is
    TakeOrderedAndProject. Reference analog: none — rebuild-only
    (SURVEY §2.13)."""
    from .functions.ngram import word_tokens

    d = _spread(t(spark, sf, "documents"))
    n_docs = d.agg(F.count(F.lit(1)).cast("long").alias("_n"))
    td = (
        d.select(F.col("doc_id"), F.explode(word_tokens(F.col("text"))).alias("w"))
        .groupBy("w", "doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    m = td.groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("c").cast("long").alias("s1"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("s2"),
    )
    m = m.filter(F.col("df") >= 20).crossJoin(F.broadcast(n_docs))
    vmr_num = (F.col("_n") * F.col("s2") - F.col("s1") * F.col("s1")).cast(
        "double"
    )
    vmr_den = (F.col("_n") * F.col("s1")).cast("double")
    vmr = vmr_num / vmr_den  # s1 >= df >= 20 > 0: ANSI-safe
    return (
        m.select(
            F.col("w").alias("term"),
            "df",
            F.col("s1").alias("n_occurrences"),
            vmr.alias("_vmr"),
        )
        .orderBy(F.col("_vmr").desc(), F.col("term").asc())
        .limit(15)
        .select("term", "df", "n_occurrences", _r(F.col("_vmr")).alias("vmr"))
    )


# Full replay: same tokenization, (term, doc) counts, exact integer
# moments, the same exact-operand VMR and (vmr desc, term asc) total
# order + LIMIT.
ORACLE_BURSTINESS = r"""
WITH norm AS (
  SELECT doc_id,
         coalesce(trim(regexp_replace(regexp_replace(lower(text), '[^\p{L} ]+', ' ', 'g'),
                                      '\s+', ' ', 'g')), '') AS t
  FROM documents
),
tok AS (
  SELECT doc_id, u.w
  FROM norm, UNNEST(string_split(t, ' ')) AS u(w)
  WHERE length(t) > 0
),
td AS (SELECT w, doc_id, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2),
m AS (
  SELECT w, CAST(count(*) AS BIGINT) AS df,
         CAST(sum(c) AS BIGINT) AS s1, CAST(sum(c * c) AS BIGINT) AS s2
  FROM td GROUP BY 1
),
n AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents)
SELECT w AS term, df, s1 AS n_occurrences,
       round(CAST(nd * s2 - s1 * s1 AS DOUBLE) / CAST(nd * s1 AS DOUBLE), 6) AS vmr
FROM m CROSS JOIN n
WHERE df >= 20
ORDER BY CAST(nd * s2 - s1 * s1 AS DOUBLE) / CAST(nd * s1 AS DOUBLE) DESC, term ASC
LIMIT 15
"""


def good_turing_report(spark, sf):
    """Good-Turing unseen-mass estimate (X82 — Good 1953; Gale & Sampson
    1995 "Simple Good-Turing": the probability mass of word types NOT yet
    seen is N1/N, and the discounted count for frequency r is
    r* = (r+1)·N_{r+1}/N_r — the standard "is this corpus saturated"
    probe, the pointwise companion to the X74 novelty curve). Per lang:
    total tokens, vocabulary, the frequency-of-frequencies head N1-N3,
    the unseen mass P0 = N1/N, the singleton discount r*_1 = 2·N2/N1,
    and the hapax share N1/V. Everything up to the final 6dp ratios is
    exact BIGINT (one explode → map-side-combined counts → vocab-scale
    freq-of-freq agg); every division is guarded and exact-operand.
    Reference analog: none — rebuild-only (SURVEY §2.13)."""
    from .functions.ngram import word_tokens

    d = _spread(t(spark, sf, "documents"))
    counts = (
        d.select("lang", F.explode(word_tokens(F.col("text"))).alias("w"))
        .groupBy("lang", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    ff = counts.groupBy("lang").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
        F.sum((F.col("c") == 1).cast("long")).cast("long").alias("n1"),
        F.sum((F.col("c") == 2).cast("long")).cast("long").alias("n2"),
        F.sum((F.col("c") == 3).cast("long")).cast("long").alias("n3"),
    )
    return ff.select(
        "lang",
        "n_tokens",
        "vocab",
        "n1",
        "n2",
        "n3",
        _r(
            F.when(
                F.col("n_tokens") > 0,
                F.col("n1").cast("double") / F.col("n_tokens").cast("double"),
            )
        ).alias("p_unseen"),
        _r(
            F.when(
                F.col("n1") > 0,
                F.lit(2.0) * F.col("n2").cast("double") / F.col("n1").cast("double"),
            )
        ).alias("r_star_1"),
        _r(
            F.when(
                F.col("vocab") > 0,
                F.col("n1").cast("double") / F.col("vocab").cast("double"),
            )
        ).alias("hapax_share"),
    ).orderBy("lang")


# Full replay: same tokenization, exact freq-of-freq integers, the same
# guarded exact-operand divisions.
ORACLE_GOOD_TURING = r"""
WITH norm AS (
  SELECT lang,
         coalesce(trim(regexp_replace(regexp_replace(lower(text), '[^\p{L} ]+', ' ', 'g'),
                                      '\s+', ' ', 'g')), '') AS t
  FROM documents
),
tok AS (
  SELECT lang, u.w
  FROM norm, UNNEST(string_split(t, ' ')) AS u(w)
  WHERE length(t) > 0
),
counts AS (SELECT lang, w, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2),
ff AS (
  SELECT lang,
         CAST(sum(c) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS vocab,
         CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         CAST(sum(CASE WHEN c = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n3
  FROM counts GROUP BY 1
)
SELECT lang, n_tokens, vocab, n1, n2, n3,
       CASE WHEN n_tokens > 0
            THEN round(CAST(n1 AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) END AS p_unseen,
       CASE WHEN n1 > 0
            THEN round(2.0 * CAST(n2 AS DOUBLE) / CAST(n1 AS DOUBLE), 6) END AS r_star_1,
       CASE WHEN vocab > 0
            THEN round(CAST(n1 AS DOUBLE) / CAST(vocab AS DOUBLE), 6) END AS hapax_share
FROM ff
ORDER BY lang
"""


def lexical_concentration_report(spark, sf):
    """Lexical concentration (X83 — Yule 1944 "characteristic K";
    Simpson 1949): repeated-token concentration of the unigram
    distribution, the scale-invariant boilerplate/templated-text signal
    (K is ~insensitive to corpus length, unlike raw TTR). Per lang:
    K = 1e4·(Σ_w c_w² − N)/N², Simpson's D = Σ_w c_w(c_w−1)/(N(N−1))
    (the probability two random token draws are the same type), and the
    type-token ratio V/N. All numerators/denominators are exact BIGINTs
    off ONE map-side-combined explode agg; final 6dp divisions guarded
    and exact-operand. Reference analog: none — rebuild-only
    (SURVEY §2.13)."""
    from .functions.ngram import word_tokens

    d = _spread(t(spark, sf, "documents"))
    counts = (
        d.select("lang", F.explode(word_tokens(F.col("text"))).alias("w"))
        .groupBy("lang", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    m = counts.groupBy("lang").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("s2"),
    )
    n = F.col("n_tokens")
    return m.select(
        "lang",
        "n_tokens",
        "vocab",
        _r(
            F.when(
                n > 0,
                F.lit(1e4)
                * (F.col("s2") - n).cast("double")
                / (n * n).cast("double"),
            )
        ).alias("yule_k"),
        _r(
            F.when(
                n > 1,
                (F.col("s2") - n).cast("double") / (n * (n - 1)).cast("double"),
            )
        ).alias("simpson_d"),
        _r(
            F.when(n > 0, F.col("vocab").cast("double") / n.cast("double"))
        ).alias("ttr"),
    ).orderBy("lang")


# Full replay: Σc(c-1) == s2 - n exactly; same guards, 6dp.
ORACLE_LEXICAL_CONCENTRATION = r"""
WITH norm AS (
  SELECT lang,
         coalesce(trim(regexp_replace(regexp_replace(lower(text), '[^\p{L} ]+', ' ', 'g'),
                                      '\s+', ' ', 'g')), '') AS t
  FROM documents
),
tok AS (
  SELECT lang, u.w
  FROM norm, UNNEST(string_split(t, ' ')) AS u(w)
  WHERE length(t) > 0
),
counts AS (SELECT lang, w, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2),
m AS (
  SELECT lang, CAST(sum(c) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS vocab,
         CAST(sum(c * c) AS BIGINT) AS s2
  FROM counts GROUP BY 1
)
SELECT lang, n_tokens, vocab,
       CASE WHEN n_tokens > 0
            THEN round(1e4 * CAST(s2 - n_tokens AS DOUBLE)
                       / CAST(n_tokens * n_tokens AS DOUBLE), 6) END AS yule_k,
       CASE WHEN n_tokens > 1
            THEN round(CAST(s2 - n_tokens AS DOUBLE)
                       / CAST(n_tokens * (n_tokens - 1) AS DOUBLE), 6) END AS simpson_d,
       CASE WHEN n_tokens > 0
            THEN round(CAST(vocab AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) END AS ttr
FROM m
ORDER BY lang
"""


def domain_concentration_report(spark, sf):
    """Domain/source concentration audit (X84 — Gini 1912 via the exact
    rank formula; Herfindahl-Hirschman index: the corpus-composition
    numbers every mixing decision starts from — is the crawl dominated
    by a handful of sources?). One row: source count, doc count, the
    Gini coefficient G = (2·Σ i·x_i − (n+1)·Σx_i)/(n·Σx_i) over doc
    counts x sorted ascending with a source-name tiebreak, HHI =
    Σx_i²/(Σx_i)², and the single largest source + share. Doc counts
    collapse map-side to the SOURCE-scale frame (~|sources| rows
    whatever corpus size); the rank window and both divisions run on
    that tiny frame — exact BIGINTs until the final guarded 6dp
    divisions. Reference analog: none — rebuild-only (SURVEY §2.13)."""
    d = t(spark, sf, "documents")
    x = d.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("x"))
    rk = F.row_number().over(W.orderBy(F.col("x").asc(), F.col("source").asc()))
    ranked = x.select("source", "x", rk.alias("i"))
    m = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_sources"),
        F.sum("x").cast("long").alias("n_docs"),
        F.sum(F.col("i") * F.col("x")).cast("long").alias("six"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.max(F.struct(F.col("x").alias("x"), F.col("source").alias("s"))).alias(
            "_top"
        ),
    )
    n, tot = F.col("n_sources"), F.col("n_docs")
    return m.select(
        "n_sources",
        "n_docs",
        _r(
            F.when(
                (n > 0) & (tot > 0),
                (F.lit(2) * F.col("six") - (n + 1) * tot).cast("double")
                / (n * tot).cast("double"),
            )
        ).alias("gini"),
        _r(
            F.when(
                tot > 0, F.col("sxx").cast("double") / (tot * tot).cast("double")
            )
        ).alias("hhi"),
        F.col("_top.s").alias("top_source"),
        _r(
            F.when(tot > 0, F.col("_top.x").cast("double") / tot.cast("double"))
        ).alias("top_share"),
    )


# Full replay: identical ascending (x, source) rank, exact integer sums,
# the same guarded divisions. max(struct) == max_by with (x, source) order.
ORACLE_DOMAIN_CONCENTRATION = r"""
WITH x AS (SELECT source, CAST(count(*) AS BIGINT) AS x FROM documents GROUP BY 1),
ranked AS (
  SELECT source, x,
         CAST(row_number() OVER (ORDER BY x ASC, source ASC) AS BIGINT) AS i
  FROM x
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n_sources,
         CAST(sum(x) AS BIGINT) AS n_docs,
         CAST(sum(i * x) AS BIGINT) AS six,
         CAST(sum(x * x) AS BIGINT) AS sxx
  FROM ranked
),
top AS (
  SELECT x AS top_x, source AS top_source
  FROM ranked ORDER BY x DESC, source DESC LIMIT 1
)
SELECT n_sources, n_docs,
       CASE WHEN n_sources > 0 AND n_docs > 0
            THEN round(CAST(2 * six - (n_sources + 1) * n_docs AS DOUBLE)
                       / CAST(n_sources * n_docs AS DOUBLE), 6) END AS gini,
       CASE WHEN n_docs > 0
            THEN round(CAST(sxx AS DOUBLE) / CAST(n_docs * n_docs AS DOUBLE), 6)
       END AS hhi,
       top_source,
       CASE WHEN n_docs > 0
            THEN round(CAST(top_x AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)
       END AS top_share
FROM m CROSS JOIN top
"""


def domain_divergence_report(spark, sf):
    """Per-source Jensen-Shannon divergence vs the corpus unigram
    distribution (X85 — Lin 1991; the outlier-domain probe behind data
    mixing and drift audits: a source whose word distribution sits far
    from the corpus is boilerplate, spam, or another register). JS(P‖Q)
    over the union support folds to per-PRESENT-word contributions plus
    a closed-form absent-mass term: for words the source contains,
    0.5·p·ln(2p/(p+q)) + 0.5·q·ln(2q/(p+q)) − 0.5·ln2·q, and the
    absent words contribute 0.5·ln2·(1 − Σ_present q) — folded as the
    +0.5·ln2 constant. Determinism: each per-word contribution is
    nano-quantized (round·1e9 → BIGINT, the X72 DoReMi discipline) so
    the per-source sum is order-independent and DuckDB-replayable; ln 2
    is a shared 16dp literal. Scale shape: the (source, word) and
    corpus word frames both derive from ONE persisted count frame (fans
    3 ways); corpus counts join on word (vocab-scale, never broadcast),
    source totals and the 1-row grand total broadcast. Sources whose
    every document is empty after normalization carry no distribution
    and are dropped. Reference analog: none — rebuild-only
    (SURVEY §2.13)."""
    from .functions.ngram import word_tokens

    LN2 = 0.6931471805599453
    d = _spread(t(spark, sf, "documents"))
    sc = (
        d.select("source", F.explode(word_tokens(F.col("text"))).alias("w"))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("cs"))
        .persist()
    )
    gc = sc.groupBy("w").agg(F.sum("cs").cast("long").alias("cg"))
    ns = sc.groupBy("source").agg(
        F.sum("cs").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
    )
    ng = sc.agg(F.sum("cs").cast("long").alias("n_corpus"))
    j = (
        sc.join(gc, "w")
        .join(F.broadcast(ns), "source")
        .crossJoin(F.broadcast(ng))
    )
    p = F.col("cs").cast("double") / F.col("n_tokens").cast("double")
    q = F.col("cg").cast("double") / F.col("n_corpus").cast("double")
    contrib = (
        F.lit(0.5) * p * F.log(F.lit(2.0) * p / (p + q))
        + F.lit(0.5) * q * F.log(F.lit(2.0) * q / (p + q))
        - F.lit(0.5) * F.lit(LN2) * q
    )
    agg = (
        j.select(
            "source",
            "n_tokens",
            "n_types",
            F.round(contrib * F.lit(1e9)).cast("long").alias("_cn"),
        )
        .groupBy("source", "n_tokens", "n_types")
        .agg(F.sum("_cn").cast("long").alias("_sn"))
    )
    js = F.col("_sn").cast("double") / F.lit(1e9) + F.lit(0.5) * F.lit(LN2)
    return agg.select(
        "source",
        "n_tokens",
        "n_types",
        _r(js).alias("js_nats"),
        _r(js / F.lit(LN2)).alias("js_norm"),
    ).orderBy("source")


# Full replay: same tokenization, the same nano-quantized per-word
# contribution expression (shared ln2 literal), order-independent BIGINT
# sums, identical final arithmetic.
ORACLE_DOMAIN_DIVERGENCE = r"""
WITH norm AS (
  SELECT source,
         coalesce(trim(regexp_replace(regexp_replace(lower(text), '[^\p{L} ]+', ' ', 'g'),
                                      '\s+', ' ', 'g')), '') AS t
  FROM documents
),
tok AS (
  SELECT source, u.w
  FROM norm, UNNEST(string_split(t, ' ')) AS u(w)
  WHERE length(t) > 0
),
sc AS (SELECT source, w, CAST(count(*) AS BIGINT) AS cs FROM tok GROUP BY 1, 2),
gc AS (SELECT w, CAST(sum(cs) AS BIGINT) AS cg FROM sc GROUP BY 1),
ns AS (SELECT source, CAST(sum(cs) AS BIGINT) AS n_tokens,
              CAST(count(*) AS BIGINT) AS n_types
       FROM sc GROUP BY 1),
ng AS (SELECT CAST(sum(cs) AS BIGINT) AS n_corpus FROM sc),
contrib AS (
  SELECT sc.source, ns.n_tokens, ns.n_types,
         CAST(round((
           0.5 * (CAST(cs AS DOUBLE) / CAST(n_tokens AS DOUBLE))
               * ln(2.0 * (CAST(cs AS DOUBLE) / CAST(n_tokens AS DOUBLE))
                    / ((CAST(cs AS DOUBLE) / CAST(n_tokens AS DOUBLE))
                       + (CAST(cg AS DOUBLE) / CAST(n_corpus AS DOUBLE))))
           + 0.5 * (CAST(cg AS DOUBLE) / CAST(n_corpus AS DOUBLE))
               * ln(2.0 * (CAST(cg AS DOUBLE) / CAST(n_corpus AS DOUBLE))
                    / ((CAST(cs AS DOUBLE) / CAST(n_tokens AS DOUBLE))
                       + (CAST(cg AS DOUBLE) / CAST(n_corpus AS DOUBLE))))
           - 0.5 * 0.6931471805599453 * (CAST(cg AS DOUBLE) / CAST(n_corpus AS DOUBLE))
         ) * 1e9) AS BIGINT) AS cn
  FROM sc JOIN gc USING (w) JOIN ns USING (source) CROSS JOIN ng
),
agg AS (
  SELECT source, n_tokens, n_types, CAST(sum(cn) AS BIGINT) AS sn
  FROM contrib GROUP BY 1, 2, 3
)
SELECT source, n_tokens, n_types,
       round(CAST(sn AS DOUBLE) / 1e9 + 0.5 * 0.6931471805599453, 6) AS js_nats,
       round((CAST(sn AS DOUBLE) / 1e9 + 0.5 * 0.6931471805599453)
             / 0.6931471805599453, 6) AS js_norm
FROM agg
ORDER BY source
"""


def readability_report(spark, sf):
    """Flesch reading ease + Flesch-Kincaid grade (X86 — Flesch 1948;
    Kincaid et al. 1975: the readability filters used for edu-style
    corpus curation). Heuristics spelled engine-replayably: words = the
    X11 word_tokens count W; syllables = runs of [aeiouy]+ in the
    normalized text floored at W (every word ≥ 1 syllable); sentences =
    runs of [.!?]+ in the RAW text floored at 1. Per doc (W > 0 only —
    readability of a wordless page is undefined):
    flesch = 206.835 − 1.015·(W/S) − 84.6·(SYL/W), fk = 0.39·(W/S) +
    11.8·(SYL/W) − 15.59, both micro-quantized BIGINT so the per-lang
    means are exact order-independent integer sums; the three counts
    are pure codegen regexp — zero shuffle before the lang agg.
    Reference analog: none — rebuild-only (SURVEY §2.13)."""
    from .functions.ngram import normalize_for_scoring, word_tokens

    d = _spread(t(spark, sf, "documents"))
    raw = F.coalesce(F.col("text"), F.lit(""))
    w = F.size(word_tokens(F.col("text"))).cast("long")
    syl = F.greatest(
        w, F.regexp_count(normalize_for_scoring(F.col("text")), F.lit("[aeiouy]+")).cast("long")
    )
    s = F.greatest(F.lit(1).cast("long"), F.regexp_count(raw, F.lit(r"[.!?]+")).cast("long"))
    wps = w.cast("double") / s.cast("double")
    spw = syl.cast("double") / w.cast("double")
    flesch = F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw
    fk = F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59)
    per = d.select(
        "lang",
        w.alias("_w"),
        F.round(flesch * F.lit(1e6)).cast("long").alias("_fm"),
        F.round(fk * F.lit(1e6)).cast("long").alias("_km"),
        F.round(wps * F.lit(1e6)).cast("long").alias("_wm"),
        F.round(spw * F.lit(1e6)).cast("long").alias("_sm"),
    ).filter(F.col("_w") > 0)
    a = per.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_fm").cast("long").alias("sf_"),
        F.sum("_km").cast("long").alias("sk_"),
        F.sum("_wm").cast("long").alias("sw_"),
        F.sum("_sm").cast("long").alias("ss_"),
    )
    n = F.col("n_docs")
    return a.select(
        "lang",
        "n_docs",
        _r(F.col("sf_").cast("double") / (F.lit(1e6) * n.cast("double"))).alias(
            "mean_flesch"
        ),
        _r(F.col("sk_").cast("double") / (F.lit(1e6) * n.cast("double"))).alias(
            "mean_fk_grade"
        ),
        _r(F.col("sw_").cast("double") / (F.lit(1e6) * n.cast("double"))).alias(
            "mean_words_per_sentence"
        ),
        _r(F.col("ss_").cast("double") / (F.lit(1e6) * n.cast("double"))).alias(
            "mean_syllables_per_word"
        ),
    ).orderBy("lang")


# Full replay: same normalization, the same three integer counts (runs
# floored identically), identical per-doc micro quantization and exact
# integer means. n_docs > 0 on every group by construction (W > 0 filter).
ORACLE_READABILITY = r"""
WITH base AS (
  SELECT lang,
         coalesce(text, '') AS raw,
         coalesce(trim(regexp_replace(regexp_replace(lower(text), '[^\p{L} ]+', ' ', 'g'),
                                      '\s+', ' ', 'g')), '') AS t
  FROM documents
),
cnt AS (
  SELECT lang,
         CASE WHEN length(t) > 0
              THEN CAST(len(string_split(t, ' ')) AS BIGINT) ELSE 0 END AS w,
         CAST(len(regexp_extract_all(t, '[aeiouy]+')) AS BIGINT) AS syl_raw,
         greatest(CAST(1 AS BIGINT),
                  CAST(len(regexp_extract_all(raw, '[.!?]+')) AS BIGINT)) AS s
  FROM base
),
per AS (
  SELECT lang, w,
         CAST(round((206.835 - 1.015 * (CAST(w AS DOUBLE) / CAST(s AS DOUBLE))
                     - 84.6 * (CAST(greatest(w, syl_raw) AS DOUBLE) / CAST(w AS DOUBLE)))
                    * 1e6) AS BIGINT) AS fm,
         CAST(round((0.39 * (CAST(w AS DOUBLE) / CAST(s AS DOUBLE))
                     + 11.8 * (CAST(greatest(w, syl_raw) AS DOUBLE) / CAST(w AS DOUBLE))
                     - 15.59) * 1e6) AS BIGINT) AS km,
         CAST(round((CAST(w AS DOUBLE) / CAST(s AS DOUBLE)) * 1e6) AS BIGINT) AS wm,
         CAST(round((CAST(greatest(w, syl_raw) AS DOUBLE) / CAST(w AS DOUBLE)) * 1e6) AS BIGINT) AS sm
  FROM cnt WHERE w > 0
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       round(CAST(sum(fm) AS DOUBLE) / (1e6 * count(*)), 6) AS mean_flesch,
       round(CAST(sum(km) AS DOUBLE) / (1e6 * count(*)), 6) AS mean_fk_grade,
       round(CAST(sum(wm) AS DOUBLE) / (1e6 * count(*)), 6) AS mean_words_per_sentence,
       round(CAST(sum(sm) AS DOUBLE) / (1e6 * count(*)), 6) AS mean_syllables_per_word
FROM per
GROUP BY lang
ORDER BY lang
"""


def pareto_frontier_report(spark, sf):
    """Pareto frontier / skyline (X87 — Börzsönyi et al. 2001 "The
    Skyline Operator"; the pareto-optimal selection idiom for data
    curation: which documents are best-in-corpus on the
    length-vs-quality tradeoff, with nothing strictly better on both?).
    Per lang over x = n_chars, y = micro-quantized en-stopword ratio: a
    doc survives iff no other doc of its lang has x'≥x AND y'≥y with one
    strict. Two-phase distributed skyline (skyline is
    partition-distributive: skyline(S) = skyline(∪ skyline(S_i))): a
    LOCAL pass windowed by (lang, 64-bucket xxhash64(doc_id)) prunes to
    per-bucket frontiers, then the GLOBAL pass re-runs the same two
    windows over the tiny survivor frame — the corpus is never globally
    sorted. The bucketing hash affects ONLY partitioning, never values
    (the result set is bucketing-invariant by distributivity), so the
    xxhash64 here stays fully oracle-checkable. Dominance via two window
    maxima per pass: m1 = max(y) over strictly-larger x (RANGE frame to
    -1 on the integer x), m2 = max(y) over same-x; survive iff y > m1
    (or none larger) and y = m2; duplicate (x, y) points are mutually
    non-dominating and both kept — exactly the NOT EXISTS semantics the
    oracle replays independently. Reference analog: none — rebuild-only
    (SURVEY §2.13)."""
    from .functions.text import stopword_ratio

    d = t(spark, sf, "documents")
    pts = d.select(
        "doc_id",
        "lang",
        F.col("n_chars").cast("long").alias("x"),
        F.round(stopword_ratio(F.col("text"), "en") * F.lit(1e6))
        .cast("long")
        .alias("y"),
    )

    def survivors(df, part_cols):
        w1 = (
            W.partitionBy(*part_cols)
            .orderBy(F.col("x").desc())
            .rangeBetween(W.unboundedPreceding, -1)
        )
        w2 = W.partitionBy(*part_cols, "x")
        return (
            df.withColumn("_m1", F.max("y").over(w1))
            .withColumn("_m2", F.max("y").over(w2))
            .filter(
                (F.col("_m1").isNull() | (F.col("_m1") < F.col("y")))
                & (F.col("_m2") <= F.col("y"))
            )
            .drop("_m1", "_m2")
        )

    local = survivors(
        pts.withColumn("_b", F.pmod(F.xxhash64(F.col("doc_id")), F.lit(64))),
        ["lang", "_b"],
    ).drop("_b")
    front = survivors(local, ["lang"])
    return front.select(
        "lang", "doc_id", F.col("x").alias("n_chars"), F.col("y").alias("stop_micro")
    ).orderBy("lang", F.col("n_chars").desc(), "doc_id")


# Independent second implementation: plain NOT EXISTS dominance — no
# windows, no bucketing — over the identical (x, y) point set.
ORACLE_PARETO_FRONTIER = rf"""
WITH pts AS (
  SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS x,
         CAST(round((CASE WHEN length(trim(text)) = 0 THEN 0.0
              ELSE len(regexp_extract_all(lower(text), '\b({_SW_EN})\b')) * 1.0
                   / len(regexp_split_to_array(trim(text), '\s+')) END) * 1e6)
              AS BIGINT) AS y
  FROM documents
)
SELECT lang, doc_id, x AS n_chars, y AS stop_micro
FROM pts p
WHERE NOT EXISTS (
  SELECT 1 FROM pts o
  WHERE o.lang = p.lang AND o.x >= p.x AND o.y >= p.y
    AND (o.x > p.x OR o.y > p.y)
)
ORDER BY lang, x DESC, doc_id
"""


PHRASE_QUERIES = ["batch batch batch", "part filter", "table hash"]


def phrase_search_report(spark, sf):
    """Exact phrase search over a positional inverted index (X88 — the
    positional-postings phrase query of classical IR, Manning et al.
    2008 ch. 2.4; the missing piece next to X46 BM25's bag-of-words
    ranking). Postings = ONE posexplode of the normalized token stream,
    FILTERED TO THE QUERY TERMS before any shuffle (the corpus never
    shuffles — only postings of the ≤6 query words do, exactly the
    selective-index access pattern); a k-word phrase is k−1 equi-joins
    on (doc_id, pos − offset); overlapping matches count (pure
    token-position semantics — "b b b b" contains "b b b" twice). Per
    phrase: matching docs, total occurrences, and the top document
    ((occ desc, doc_id) total order); zero-hit phrases keep their row
    (left join from the phrase list) so the report shape is stable.
    The filtered postings frame persists (fans into one branch per
    term occurrence across phrases). Reference analog: none —
    rebuild-only (SURVEY §2.13)."""
    from .functions.ngram import word_tokens

    d = _spread(t(spark, sf, "documents"))
    toks = d.select(
        "doc_id", F.posexplode(word_tokens(F.col("text"))).alias("pos", "w")
    )
    terms = sorted({w for p in PHRASE_QUERIES for w in p.split()})
    post = toks.filter(F.col("w").isin(terms)).persist()
    per_phrase = []
    for ph in PHRASE_QUERIES:
        ws = ph.split()
        cur = post.filter(F.col("w") == ws[0]).select("doc_id", "pos")
        for i, wd in enumerate(ws[1:], 1):
            nxt = post.filter(F.col("w") == wd).select(
                F.col("doc_id").alias("_d"), (F.col("pos") - F.lit(i)).alias("_p")
            )
            nxt = nxt.toDF(*nxt.columns)  # fresh exprIds: post self-join
            cur = cur.join(
                nxt, (cur["doc_id"] == nxt["_d"]) & (cur["pos"] == nxt["_p"])
            ).select("doc_id", "pos")
        per_phrase.append(
            cur.groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("long").alias("occ"))
            .select(F.lit(ph).alias("phrase"), "doc_id", "occ")
        )
    hits = per_phrase[0]
    for f in per_phrase[1:]:
        hits = hits.unionByName(f)
    hits = hits.persist()  # fans into the rollup and the top-doc window
    agg = hits.groupBy("phrase").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("occ").cast("long").alias("n_occurrences"),
    )
    rn = F.row_number().over(
        W.partitionBy("phrase").orderBy(F.col("occ").desc(), F.col("doc_id").asc())
    )
    best = (
        hits.select("phrase", "doc_id", "occ", rn.alias("_rn"))
        .filter(F.col("_rn") == 1)
        .select(
            "phrase",
            F.col("doc_id").alias("top_doc"),
            F.col("occ").alias("top_doc_occ"),
        )
    )
    ph_frame = spark.createDataFrame([(p,) for p in PHRASE_QUERIES], "phrase string")
    return (
        ph_frame.join(agg, "phrase", "left")
        .join(best, "phrase", "left")
        .select(
            "phrase",
            F.coalesce(F.col("n_docs"), F.lit(0)).cast("long").alias("n_docs"),
            F.coalesce(F.col("n_occurrences"), F.lit(0))
            .cast("long")
            .alias("n_occurrences"),
            "top_doc",
            "top_doc_occ",
        )
        .orderBy("phrase")
    )


# Independent second implementation: in-row token-window scan (list
# slice equality over generate_series) — no postings, no joins — over
# the identical normalized token stream; overlap semantics identical.
ORACLE_PHRASE_SEARCH = r"""
WITH norm AS (
  SELECT doc_id,
         coalesce(trim(regexp_replace(regexp_replace(lower(text), '[^\p{L} ]+', ' ', 'g'),
                                      '\s+', ' ', 'g')), '') AS t
  FROM documents
),
dt AS (
  SELECT doc_id,
         CASE WHEN length(t) > 0 THEN string_split(t, ' ')
              ELSE CAST([] AS VARCHAR[]) END AS toks
  FROM norm
),
phrases(phrase) AS (VALUES ('batch batch batch'), ('part filter'), ('table hash')),
counted AS (
  SELECT p.phrase, d.doc_id,
         CAST(len(list_filter(
           generate_series(1, len(d.toks) - len(string_split(p.phrase, ' ')) + 1),
           i -> d.toks[i : i + len(string_split(p.phrase, ' ')) - 1]
                = string_split(p.phrase, ' ')
         )) AS BIGINT) AS occ
  FROM dt d CROSS JOIN phrases p
  WHERE len(d.toks) >= len(string_split(p.phrase, ' '))
),
nz AS (SELECT * FROM counted WHERE occ > 0),
agg AS (
  SELECT phrase, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(occ) AS BIGINT) AS n_occurrences
  FROM nz GROUP BY 1
),
best AS (
  SELECT phrase, doc_id AS top_doc, occ AS top_doc_occ,
         row_number() OVER (PARTITION BY phrase ORDER BY occ DESC, doc_id ASC) AS rn
  FROM nz
)
SELECT p.phrase,
       coalesce(a.n_docs, 0) AS n_docs,
       coalesce(a.n_occurrences, 0) AS n_occurrences,
       b.top_doc, b.top_doc_occ
FROM phrases p
LEFT JOIN agg a USING (phrase)
LEFT JOIN best b ON b.phrase = p.phrase AND b.rn = 1
ORDER BY p.phrase
"""


def llr_collocations_report(spark, sf):
    """Top-20 adjacent word pairs by Dunning's log-likelihood ratio
    (X89, operators/pmi.py llr_collocations): the calibrated
    collocation statistic — G² over the exact 2x2 bigram contingency
    table with bigram-based margins, every cell an exact BIGINT, every
    ln-term a per-row double expression spelled operand-for-operand
    identically in the oracle. min_count=3 at this sf; total order
    (llr desc, w1, w2) makes the LIMIT deterministic."""
    from .operators.pmi import llr_collocations

    d = _spread(t(spark, sf, "documents"))
    return llr_collocations(d, "text", min_count=3, top_k=20)


# G² replayed exactly: same norm/tokenize CTEs, margins and total from
# the identical full pair frame, the same guarded k·ln(k·B/(R·C)) cells
# in the same association order.
ORACLE_LLR_COLLOCATIONS = r"""
WITH norm AS (
  SELECT doc_id,
         coalesce(trim(regexp_replace(regexp_replace(lower(text), '[^\p{L} ]+', ' ', 'g'),
                                      '\s+', ' ', 'g')), '') AS t
  FROM documents
),
toks AS MATERIALIZED (
  SELECT doc_id, string_split(t, ' ') AS w FROM norm WHERE length(t) > 0
),
pairs AS MATERIALIZED (
  SELECT w[CAST(i AS INT)] AS w1, w[CAST(i AS INT) + 1] AS w2,
         CAST(count(*) AS BIGINT) AS c12
  FROM toks, UNNEST(range(1, len(w))) AS s(i)
  GROUP BY w1, w2
),
cf AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM pairs GROUP BY 1),
cs AS (SELECT w2, CAST(sum(c12) AS BIGINT) AS c2 FROM pairs GROUP BY 1),
tot AS (SELECT CAST(sum(c12) AS BIGINT) AS b FROM pairs),
j AS (
  SELECT p.w1, p.w2, p.c12, cf.c1, cs.c2, t.b
  FROM pairs p JOIN cf USING (w1) JOIN cs USING (w2) CROSS JOIN tot t
  WHERE p.c12 >= 3
)
SELECT w1, w2, c12, c1, c2,
       round(2.0 * (
         (CASE WHEN c12 > 0 THEN CAST(c12 AS DOUBLE)
               * ln((CAST(c12 AS DOUBLE) * CAST(b AS DOUBLE))
                    / (CAST(c1 AS DOUBLE) * CAST(c2 AS DOUBLE))) ELSE 0.0 END)
         + (CASE WHEN c1 - c12 > 0 THEN CAST(c1 - c12 AS DOUBLE)
               * ln((CAST(c1 - c12 AS DOUBLE) * CAST(b AS DOUBLE))
                    / (CAST(c1 AS DOUBLE) * CAST(b - c2 AS DOUBLE))) ELSE 0.0 END)
         + (CASE WHEN c2 - c12 > 0 THEN CAST(c2 - c12 AS DOUBLE)
               * ln((CAST(c2 - c12 AS DOUBLE) * CAST(b AS DOUBLE))
                    / (CAST(b - c1 AS DOUBLE) * CAST(c2 AS DOUBLE))) ELSE 0.0 END)
         + (CASE WHEN b - c1 - c2 + c12 > 0 THEN CAST(b - c1 - c2 + c12 AS DOUBLE)
               * ln((CAST(b - c1 - c2 + c12 AS DOUBLE) * CAST(b AS DOUBLE))
                    / (CAST(b - c1 AS DOUBLE) * CAST(b - c2 AS DOUBLE))) ELSE 0.0 END)
       ), 6) AS llr
FROM j
ORDER BY llr DESC, w1, w2
LIMIT 20
"""


def conditional_entropy_report(spark, sf):
    """Shannon n-gram entropy + conditional bigram entropy (X90 —
    Shannon 1951 "Prediction and Entropy of Printed English"; Brown et
    al. 1992: the model-free predictability ceiling of a corpus, and a
    register/templating probe — templated text has abnormally low
    H(w₂|w₁)). Per lang over the word stream: unigram entropy H1 =
    −Σ p·log2 p, bigram entropy H2, conditional H(w₂|w₁) = H2 − H1 (the
    chain rule on the maximum-likelihood estimates), and the unigram
    perplexity 2^H1. Determinism: each vocab-row term p·log2(p) is
    nano-quantized BIGINT (the X72/X85 discipline) so per-lang sums are
    order-independent; both explodes collapse map-side to
    vocabulary-scale count frames joined with broadcast 1-row totals.
    Reference analog: none — rebuild-only (SURVEY §2.13)."""
    from .functions.ngram import word_ngrams, word_tokens

    LOG2 = 0.6931471805599453  # ln 2, shared literal with the oracle
    d = _spread(t(spark, sf, "documents"))

    def entropy_nano(counts, total_col):
        # counts: (lang, c); -> (lang, BIGINT Σ round(p*log2(p)*1e9))
        p = F.col("c").cast("double") / F.col(total_col).cast("double")
        term = p * (F.log(p) / F.lit(LOG2))
        return counts.select(
            "lang", F.round(term * F.lit(1e9)).cast("long").alias("_tn")
        ).groupBy("lang").agg(F.sum("_tn").cast("long").alias("_sn"))

    uni = (
        d.select("lang", F.explode(word_tokens(F.col("text"))).alias("g"))
        .groupBy("lang", "g")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    bi = (
        d.select("lang", F.explode(word_ngrams(F.col("text"), 2)).alias("g"))
        .groupBy("lang", "g")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    n1 = uni.groupBy("lang").agg(F.sum("c").cast("long").alias("n_tokens"))
    n2 = bi.groupBy("lang").agg(F.sum("c").cast("long").alias("n_bigrams"))
    h1 = entropy_nano(
        uni.join(F.broadcast(n1), "lang").withColumnRenamed("n_tokens", "_tot"),
        "_tot",
    ).withColumnRenamed("_sn", "_s1")
    h2 = entropy_nano(
        bi.join(F.broadcast(n2), "lang").withColumnRenamed("n_bigrams", "_tot"),
        "_tot",
    ).withColumnRenamed("_sn", "_s2")
    j = n1.join(n2, "lang").join(h1, "lang").join(h2, "lang")
    H1 = -F.col("_s1").cast("double") / F.lit(1e9)
    H2 = -F.col("_s2").cast("double") / F.lit(1e9)
    return j.select(
        "lang",
        "n_tokens",
        "n_bigrams",
        _r(H1).alias("h_unigram_bits"),
        _r(H2).alias("h_bigram_bits"),
        _r(H2 - H1).alias("h_conditional_bits"),
        _r(F.pow(F.lit(2.0), H1)).alias("unigram_perplexity"),
    ).orderBy("lang")


# Full replay: same tokenization, the same nano-quantized p·log2(p)
# vocab-row terms (shared ln2 literal), order-independent BIGINT sums,
# identical final arithmetic.
ORACLE_CONDITIONAL_ENTROPY = r"""
WITH norm AS (
  SELECT lang,
         coalesce(trim(regexp_replace(regexp_replace(lower(text), '[^\p{L} ]+', ' ', 'g'),
                                      '\s+', ' ', 'g')), '') AS t
  FROM documents
),
toks AS MATERIALIZED (
  SELECT lang, string_split(t, ' ') AS w FROM norm WHERE length(t) > 0
),
uni AS (
  SELECT lang, tok AS g, CAST(count(*) AS BIGINT) AS c
  FROM toks, UNNEST(w) AS u(tok) GROUP BY 1, 2
),
bi AS (
  SELECT lang, w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT) + 1] AS g,
         CAST(count(*) AS BIGINT) AS c
  FROM toks, UNNEST(range(1, len(w))) AS s(i)
  GROUP BY 1, 2
),
n1 AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n_tokens FROM uni GROUP BY 1),
n2 AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n_bigrams FROM bi GROUP BY 1),
h1 AS (
  SELECT u.lang, CAST(sum(CAST(round(
           (CAST(c AS DOUBLE) / CAST(n_tokens AS DOUBLE))
           * (ln(CAST(c AS DOUBLE) / CAST(n_tokens AS DOUBLE)) / 0.6931471805599453)
           * 1e9) AS BIGINT)) AS BIGINT) AS s1
  FROM uni u JOIN n1 USING (lang) GROUP BY 1
),
h2 AS (
  SELECT b.lang, CAST(sum(CAST(round(
           (CAST(c AS DOUBLE) / CAST(n_bigrams AS DOUBLE))
           * (ln(CAST(c AS DOUBLE) / CAST(n_bigrams AS DOUBLE)) / 0.6931471805599453)
           * 1e9) AS BIGINT)) AS BIGINT) AS s2
  FROM bi b JOIN n2 USING (lang) GROUP BY 1
)
SELECT lang, n_tokens, n_bigrams,
       round(-CAST(s1 AS DOUBLE) / 1e9, 6) AS h_unigram_bits,
       round(-CAST(s2 AS DOUBLE) / 1e9, 6) AS h_bigram_bits,
       round((-CAST(s2 AS DOUBLE) / 1e9) - (-CAST(s1 AS DOUBLE) / 1e9), 6)
         AS h_conditional_bits,
       round(pow(2.0, -CAST(s1 AS DOUBLE) / 1e9), 6) AS unigram_perplexity
FROM n1 JOIN n2 USING (lang) JOIN h1 USING (lang) JOIN h2 USING (lang)
ORDER BY lang
"""


def rbo_report(spark, sf):
    """Rank-biased overlap between two retrieval rankings (X91 — Webber
    et al. 2010, "A Similarity Measure for Indefinite Rankings": the
    top-weighted agreement statistic for comparing rankers; here the
    deployed ranking-robustness audit — how much does BM25's idf +
    length normalization actually change the ranking vs naive term
    frequency for the same query?). Truncated RBO@20 at p=0.9 between
    the X48 BM25 top-20 and the plain Σtf top-20 (both totally ordered
    with doc_id tiebreaks): A_d = |prefix∩prefix| at each depth d,
    RBO = Σ_{d≤k} (1−p)·p^(d−1)·A_d/d. Both rank frames are k-row after
    TakeOrdered; the depth×rank comparison, the per-depth terms
    (nano-quantized BIGINT so the 20-term float sum is
    order-independent), and the final division all run on ≤k-row
    broadcast frames — corpus cost is exactly two scan-side scoring
    passes. Reference analog: none — rebuild-only (SURVEY §2.13)."""
    from .functions.ngram import word_tokens
    from .operators.bm25 import _tf, bm25_scored

    K, P = 20, 0.9
    d = _spread(t(spark, sf, "documents"))
    scored = bm25_scored(d, "text", "doc_id", _BM25_TERMS)
    bmtop = (
        scored.select("doc_id", _r(F.col("_bm25")).alias("_s"))
        .orderBy(F.desc("_s"), "doc_id")
        .limit(K)
    )
    bm = bmtop.select(
        "doc_id",
        F.row_number()
        .over(W.orderBy(F.col("_s").desc(), F.col("doc_id").asc()))
        .alias("r1"),
    )
    toks = word_tokens(F.col("text"))
    tfsum = None
    for query_term in _BM25_TERMS:
        c = _tf(toks, query_term)
        tfsum = c if tfsum is None else tfsum + c
    nvtop = (
        d.select("doc_id", tfsum.cast("long").alias("_c"))
        .orderBy(F.desc("_c"), "doc_id")
        .limit(K)
    )
    nv = nvtop.select(
        "doc_id",
        F.row_number()
        .over(W.orderBy(F.col("_c").desc(), F.col("doc_id").asc()))
        .alias("r2"),
    )
    j = bm.join(nv, "doc_id", "full_outer")
    depths = spark.range(1, K + 1).select(F.col("id").cast("long").alias("d"))
    ad = (
        depths.join(
            F.broadcast(j),
            (F.col("r1") <= F.col("d")) & (F.col("r2") <= F.col("d")),
            "left",
        )
        .groupBy("d")
        .agg(F.count(F.col("doc_id")).cast("long").alias("a_d"))
    )
    term = (
        (F.lit(1.0) - F.lit(P))
        * F.pow(F.lit(P), (F.col("d") - F.lit(1)).cast("double"))
        * (F.col("a_d").cast("double") / F.col("d").cast("double"))
    )
    s = ad.select(
        F.round(term * F.lit(1e9)).cast("long").alias("_tn"),
        F.when(F.col("d") == K, F.col("a_d")).alias("_ak"),
    ).agg(
        F.sum("_tn").cast("long").alias("_sn"),
        F.max("_ak").cast("long").alias("a_k"),
    )
    return s.select(
        F.lit(K).cast("long").alias("k"),
        F.lit(P).cast("double").alias("p"),
        F.col("a_k").alias("overlap_count_at_k"),
        _r(F.col("a_k").cast("double") / F.lit(float(K))).alias("overlap_at_k"),
        _r(F.col("_sn").cast("double") / F.lit(1e9)).alias("rbo"),
    )


def _oracle_rbo() -> str:
    """RBO replayed on the identical rankings: the BM25 scored CTE is the
    _oracle_bm25 body verbatim (same literals/association), the naive
    ranking is Σtf over the same base frame, depths/terms use the same
    (1−p)·p^(d−1)·(A_d/d) spelling with nano-quantized per-depth terms."""
    tfs = ",\n         ".join(
        f"coalesce(len(list_filter(tk.w, x -> x = '{t}')), 0) AS tf{i}"
        for i, t in enumerate(_BM25_TERMS)
    )
    dfs = ",\n         ".join(
        f"sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(len(_BM25_TERMS))
    )
    terms = "\n         + ".join(
        f"ln((CAST(s.n - s.df{i} AS DOUBLE) + 0.5::DOUBLE)"
        f" / (CAST(s.df{i} AS DOUBLE) + 0.5::DOUBLE) + 1.0::DOUBLE)"
        f" * (CAST(b.tf{i} AS DOUBLE) * 2.2::DOUBLE)"
        f" / (CAST(b.tf{i} AS DOUBLE) + 1.2::DOUBLE * (0.25::DOUBLE"
        f" + 0.75::DOUBLE * (CAST(b.dl AS DOUBLE)"
        f" / (CAST(s.tot AS DOUBLE) / CAST(s.n AS DOUBLE)))))"
        for i in range(len(_BM25_TERMS))
    )
    tf_sum = " + ".join(f"tf{i}" for i in range(len(_BM25_TERMS)))
    return rf"""
WITH norm AS (
  SELECT doc_id,
         coalesce(trim(regexp_replace(regexp_replace(lower(text), '[^\p{{L}} ]+', ' ', 'g'),
                                      '\s+', ' ', 'g')), '') AS t
  FROM documents
),
toks AS (
  SELECT doc_id, string_split(t, ' ') AS w FROM norm WHERE length(t) > 0
),
base AS MATERIALIZED (
  SELECT n.doc_id,
         coalesce(len(tk.w), 0) AS dl,
         {tfs}
  FROM norm n LEFT JOIN toks tk USING (doc_id)
),
stats AS (
  SELECT count(*) AS n, sum(dl) AS tot,
         {dfs}
  FROM base
),
scored AS (
  SELECT b.doc_id,
         {terms} AS raw
  FROM base b, stats s
),
bmtop AS (
  SELECT doc_id, round(raw, 6) AS s FROM scored
  ORDER BY round(raw, 6) DESC, doc_id LIMIT 20
),
bm AS (
  SELECT doc_id, CAST(row_number() OVER (ORDER BY s DESC, doc_id ASC) AS BIGINT) AS r1
  FROM bmtop
),
nvtop AS (
  SELECT doc_id, CAST({tf_sum} AS BIGINT) AS c FROM base
  ORDER BY CAST({tf_sum} AS BIGINT) DESC, doc_id LIMIT 20
),
nv AS (
  SELECT doc_id, CAST(row_number() OVER (ORDER BY c DESC, doc_id ASC) AS BIGINT) AS r2
  FROM nvtop
),
j AS (
  SELECT coalesce(bm.doc_id, nv.doc_id) AS doc_id, r1, r2
  FROM bm FULL OUTER JOIN nv ON bm.doc_id = nv.doc_id
),
depths AS (SELECT CAST(u.d AS BIGINT) AS d FROM UNNEST(generate_series(1, 20)) AS u(d)),
ad AS (
  SELECT depths.d, CAST(count(j.doc_id) AS BIGINT) AS a_d
  FROM depths LEFT JOIN j ON j.r1 <= depths.d AND j.r2 <= depths.d
  GROUP BY depths.d
),
agg AS (
  SELECT CAST(sum(CAST(round(((1.0::DOUBLE - 0.9::DOUBLE)
                  * pow(0.9::DOUBLE, CAST(d - 1 AS DOUBLE))
                  * (CAST(a_d AS DOUBLE) / CAST(d AS DOUBLE))) * 1e9) AS BIGINT))
              AS BIGINT) AS sn,
         CAST(max(CASE WHEN d = 20 THEN a_d END) AS BIGINT) AS a_k
  FROM ad
)
SELECT CAST(20 AS BIGINT) AS k, CAST(0.9 AS DOUBLE) AS p,
       a_k AS overlap_count_at_k,
       round(CAST(a_k AS DOUBLE) / 20.0::DOUBLE, 6) AS overlap_at_k,
       round(CAST(sn AS DOUBLE) / 1e9, 6) AS rbo
FROM agg
"""


def ks_test_report(spark, sf, lang_a="en", lang_b="es"):
    """Two-sample Kolmogorov-Smirnov drift test (X92 — the nonparametric
    counterpart to X55's PSI drift score: is the en document-length
    distribution the same as the es one?). Exact-integer ECDFs: per-value
    counts for each group (map-side combined to the bounded n_chars
    domain), a full-outer value merge, one cumulative window over the
    distinct-value frame (the X32 bounded-domain histogram idiom — the
    window frame is |domain| rows whatever the corpus size), and
    D = max|F_a − F_b| carried as the BIGINT cross-multiple
    |cum_a·n_b − cum_b·n_a| so the sup and its argmin location are exact;
    the only floats are the final 1-row divisions and the asymptotic
    α=0.05 critical value sqrt(-ln(0.025)/2)·sqrt((n_a+n_b)/(n_a·n_b))
    (Smirnov 1948). Reference analog: none — rebuild-only (SURVEY §2.13)."""
    d = t(spark, sf, "documents").select("lang", "n_chars")
    a = (
        d.filter(F.col("lang") == lang_a)
        .groupBy("n_chars")
        .agg(F.count(F.lit(1)).cast("long").alias("_ca"))
    )
    b = (
        d.filter(F.col("lang") == lang_b)
        .groupBy("n_chars")
        .agg(F.count(F.lit(1)).cast("long").alias("_cb"))
    )
    v = a.join(b, "n_chars", "full_outer").select(
        "n_chars",
        F.coalesce("_ca", F.lit(0)).cast("long").alias("_ca"),
        F.coalesce("_cb", F.lit(0)).cast("long").alias("_cb"),
    )
    w = W.orderBy("n_chars").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = v.select(
        "n_chars",
        F.sum("_ca").over(w).cast("long").alias("_cuma"),
        F.sum("_cb").over(w).cast("long").alias("_cumb"),
    )
    # totals first (1-row broadcast), then the exact cross-multiplied gap
    tot = cum.agg(
        F.max("_cuma").cast("long").alias("n_a"),
        F.max("_cumb").cast("long").alias("n_b"),
    )
    gap = cum.crossJoin(F.broadcast(tot)).select(
        "n_a",
        "n_b",
        F.abs(F.col("_cuma") * F.col("n_b") - F.col("_cumb") * F.col("n_a"))
        .cast("long")
        .alias("_dn"),
        F.col("n_chars").cast("long").alias("_v"),
    )
    best = gap.groupBy("n_a", "n_b").agg(
        F.max(F.struct(F.col("_dn").alias("d_num"), (-F.col("_v")).alias("_nv"))).alias(
            "_m"
        )
    )
    prod = F.col("n_a") * F.col("n_b")
    d_raw = F.when(
        prod != 0, F.col("_m.d_num").cast("double") / prod.cast("double")
    )
    crit_raw = F.sqrt((-F.log(F.lit(0.025))) / F.lit(2.0)) * F.sqrt(
        (F.col("n_a") + F.col("n_b")).cast("double") / prod.cast("double")
    )
    return best.select(
        F.col("n_a"),
        F.col("n_b"),
        F.col("_m.d_num").alias("d_num"),
        (-F.col("_m._nv")).cast("long").alias("d_location"),
        _r(d_raw).alias("d_stat"),
        _r(F.when(prod != 0, crit_raw)).alias("d_crit"),
        F.when(prod != 0, (d_raw > crit_raw).cast("int"))
        .otherwise(F.lit(None).cast("int"))
        .alias("reject_h0"),
    )


ORACLE_KS_TEST = """
WITH a AS (
  SELECT n_chars, CAST(count(*) AS BIGINT) AS ca
  FROM documents WHERE lang = 'en' GROUP BY 1
),
b AS (
  SELECT n_chars, CAST(count(*) AS BIGINT) AS cb
  FROM documents WHERE lang = 'es' GROUP BY 1
),
v AS (
  SELECT coalesce(a.n_chars, b.n_chars) AS val,
         coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
  FROM a FULL OUTER JOIN b ON a.n_chars = b.n_chars
),
cum AS (
  SELECT val,
         CAST(sum(ca) OVER (ORDER BY val
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cuma,
         CAST(sum(cb) OVER (ORDER BY val
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumb
  FROM v
),
tot AS (SELECT CAST(max(cuma) AS BIGINT) AS n_a, CAST(max(cumb) AS BIGINT) AS n_b FROM cum),
best AS (
  SELECT abs(cuma * n_b - cumb * n_a) AS d_num, CAST(val AS BIGINT) AS d_location
  FROM cum, tot
  ORDER BY abs(cuma * n_b - cumb * n_a) DESC, val ASC
  LIMIT 1
)
SELECT n_a, n_b, d_num, d_location,
       round(CASE WHEN n_a * n_b <> 0
             THEN CAST(d_num AS DOUBLE) / CAST(n_a * n_b AS DOUBLE) END, 6) AS d_stat,
       round(CASE WHEN n_a * n_b <> 0
             THEN sqrt(-ln(0.025) / 2.0) * sqrt(CAST(n_a + n_b AS DOUBLE)
                  / CAST(n_a * n_b AS DOUBLE)) END, 6) AS d_crit,
       CASE WHEN n_a * n_b <> 0 THEN
         CAST(CASE WHEN CAST(d_num AS DOUBLE) / CAST(n_a * n_b AS DOUBLE)
                > sqrt(-ln(0.025) / 2.0) * sqrt(CAST(n_a + n_b AS DOUBLE)
                  / CAST(n_a * n_b AS DOUBLE))
              THEN 1 ELSE 0 END AS INT)
       END AS reject_h0
FROM best, tot
"""


def spearman_report(spark, sf):
    """Per-language Spearman rank correlation (X93 — Spearman 1904; the
    tie-corrected form via Pearson over average ranks, exactly what
    scipy.stats.spearmanr computes): does raw document length actually
    track lexical richness (distinct word types), per language? Ranks are
    EXACT integers: average rank × 2 = 2·(cum−cnt)+cnt+1 off the per-
    (lang, value) count frame (map-side combined to the bounded value
    domain; the cumulative window partitions by lang over distinct values
    only), joined back to the corpus, then ONE map-side-combined agg of
    the five BIGINT rank-moment sums — exact while 4n³ < 2^63 (n ≈ 1.3M
    docs per lang; beyond that the sums are a one-line DECIMAL(38,0)
    swap). Floats only in the final per-lang-row Pearson division.
    Reference analog: none — rebuild-only (SURVEY §2.13)."""
    from .functions.ngram import word_tokens

    d = _spread(t(spark, sf, "documents")).select(
        "lang",
        F.col("n_chars").cast("long").alias("_x"),
        F.size(F.array_distinct(word_tokens(F.col("text"))))
        .cast("long")
        .alias("_y"),
    )
    wl = W.partitionBy("lang")

    def rank2(frame, col):
        c = (
            frame.groupBy("lang", col)
            .agg(F.count(F.lit(1)).cast("long").alias("_c"))
        )
        w = wl.orderBy(col).rowsBetween(W.unboundedPreceding, W.currentRow)
        return c.select(
            "lang",
            col,
            (
                F.lit(2) * (F.sum("_c").over(w) - F.col("_c"))
                + F.col("_c")
                + F.lit(1)
            )
            .cast("long")
            .alias(f"_r{col}"),
        )

    j = d.join(rank2(d, "_x"), ["lang", "_x"]).join(rank2(d, "_y"), ["lang", "_y"])
    s = j.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_r_x").cast("long").alias("_sx"),
        F.sum("_r_y").cast("long").alias("_sy"),
        F.sum(F.col("_r_x") * F.col("_r_x")).cast("long").alias("_sxx"),
        F.sum(F.col("_r_y") * F.col("_r_y")).cast("long").alias("_syy"),
        F.sum(F.col("_r_x") * F.col("_r_y")).cast("long").alias("_sxy"),
    )
    nd = F.col("n_docs").cast("double")
    num = nd * F.col("_sxy").cast("double") - F.col("_sx").cast("double") * F.col(
        "_sy"
    ).cast("double")
    denx = nd * F.col("_sxx").cast("double") - F.col("_sx").cast("double") * F.col(
        "_sx"
    ).cast("double")
    deny = nd * F.col("_syy").cast("double") - F.col("_sy").cast("double") * F.col(
        "_sy"
    ).cast("double")
    return (
        s.select(
            "lang",
            "n_docs",
            _r(
                F.when(denx * deny > 0, num / F.sqrt(denx * deny))
            ).alias("rho_chars_types"),
        )
        .orderBy("lang")
    )


ORACLE_SPEARMAN = r"""
WITH norm AS (
  SELECT doc_id, lang, n_chars,
         coalesce(trim(regexp_replace(regexp_replace(lower(text), '[^\p{L} ]+', ' ', 'g'),
                                      '\s+', ' ', 'g')), '') AS t
  FROM documents
),
toks AS (
  SELECT doc_id, string_split(t, ' ') AS w FROM norm WHERE length(t) > 0
),
base AS MATERIALIZED (
  SELECT n.lang, CAST(n.n_chars AS BIGINT) AS x,
         CAST(coalesce(len(list_distinct(tk.w)), 0) AS BIGINT) AS y
  FROM norm n LEFT JOIN toks tk USING (doc_id)
),
cx AS (
  SELECT lang, x, CAST(count(*) AS BIGINT) AS c FROM base GROUP BY 1, 2
),
rx AS (
  SELECT lang, x,
         CAST(2 * (sum(c) OVER (PARTITION BY lang ORDER BY x
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c)
              + c + 1 AS BIGINT) AS r2x
  FROM cx
),
cy AS (
  SELECT lang, y, CAST(count(*) AS BIGINT) AS c FROM base GROUP BY 1, 2
),
ry AS (
  SELECT lang, y,
         CAST(2 * (sum(c) OVER (PARTITION BY lang ORDER BY y
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c)
              + c + 1 AS BIGINT) AS r2y
  FROM cy
),
j AS (
  SELECT b.lang, r2x, r2y
  FROM base b JOIN rx ON b.lang = rx.lang AND b.x = rx.x
              JOIN ry ON b.lang = ry.lang AND b.y = ry.y
),
s AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(r2x) AS BIGINT) AS sx, CAST(sum(r2y) AS BIGINT) AS sy,
         CAST(sum(r2x * r2x) AS BIGINT) AS sxx,
         CAST(sum(r2y * r2y) AS BIGINT) AS syy,
         CAST(sum(r2x * r2y) AS BIGINT) AS sxy
  FROM j GROUP BY 1
)
SELECT lang, n_docs,
       round(CASE WHEN (CAST(n_docs AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                     * (CAST(n_docs AS DOUBLE) * CAST(syy AS DOUBLE)
                        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
             THEN (CAST(n_docs AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  / sqrt((CAST(n_docs AS DOUBLE) * CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                         * (CAST(n_docs AS DOUBLE) * CAST(syy AS DOUBLE)
                            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
             END, 6) AS rho_chars_types
FROM s
ORDER BY lang
"""


def rrf_fusion_report(spark, sf):
    """Reciprocal-rank-fusion hybrid retrieval (X94 — Cormack, Clarke &
    Buettcher 2009: RRF(d) = Σ_rankers 1/(k₀+rank_d), k₀=60, the
    training-free rank fusion that ships in Elasticsearch/OpenSearch
    hybrid search). Three rankers over the same query vector (vec_id=0):
    cosine, raw dot product, and negative squared L2 — metric choice
    genuinely reorders under norm variation, and RRF is the canonical
    consensus. ONE persisted corpus pass computes all three 6dp scores
    (the fan-out rule — three TakeOrdered branches would otherwise
    rescan), each ranker is a k-row TakeOrdered + row_number on its
    50-row frame, the fusion full-outer-joins three ≤50-row frames, and
    each 1/(k₀+r) term is nano-quantized BIGINT so the fused sum is
    order-independent. Corpus cost: exactly one scan whatever the ranker
    count. Reference analog: none — rebuild-only (SURVEY §2.13)."""
    from .operators.similarity import cosine_expr, dot_expr

    K_LIST, K_OUT, RRF_K = 50, 10, 60
    e = t(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("_qv"))
    a, b = F.col("embedding"), F.col("_qv")
    dist2 = F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            _r(cosine_expr(a, b)).alias("_sc"),
            _r(dot_expr(a, b)).alias("_sd"),
            (-_r(dist2)).alias("_sl"),
        )
        .persist()
    )

    def ranked(col, name):
        top = (
            scored.select("vec_id", col)
            .orderBy(F.col(col).desc(), F.col("vec_id").asc())
            .limit(K_LIST)
        )
        return top.select(
            "vec_id",
            F.row_number()
            .over(W.orderBy(F.col(col).desc(), F.col("vec_id").asc()))
            .cast("long")
            .alias(name),
        )

    j = (
        ranked("_sc", "_rc")
        .join(ranked("_sd", "_rd"), ["vec_id"], "full_outer")
        .join(ranked("_sl", "_rl"), ["vec_id"], "full_outer")
    )

    def term(r):
        return F.coalesce(
            F.round(F.lit(1e9) / (F.lit(RRF_K) + F.col(r)).cast("double")).cast(
                "long"
            ),
            F.lit(0).cast("long"),
        )

    fused = j.select(
        "vec_id",
        (
            F.col("_rc").isNotNull().cast("int")
            + F.col("_rd").isNotNull().cast("int")
            + F.col("_rl").isNotNull().cast("int")
        ).alias("in_lists"),
        (term("_rc") + term("_rd") + term("_rl")).cast("long").alias("rrf_nano"),
    )
    out = fused.orderBy(F.col("rrf_nano").desc(), F.col("vec_id").asc()).limit(K_OUT)
    return out.select(
        "vec_id",
        "in_lists",
        "rrf_nano",
        _r(F.col("rrf_nano").cast("double") / F.lit(1e9)).alias("rrf"),
    )


ORACLE_RRF_FUSION = """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
p AS (
  SELECT e.vec_id,
         CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) AS x,
         CAST(q.qv[CAST(i AS INT)] AS DOUBLE)        AS y
  FROM embeddings e, q, UNNEST(range(1, len(e.embedding) + 1)) AS t(i)
),
s AS MATERIALIZED (
  SELECT vec_id,
         round(CASE WHEN sqrt(sum(x*x)) * sqrt(sum(y*y)) <> 0
               THEN sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))) END, 6) AS sc,
         round(sum(x*y), 6) AS sd,
         -round(sum((x - y) * (x - y)), 6) AS sl
  FROM p GROUP BY vec_id
),
rc AS (
  SELECT vec_id, CAST(row_number() OVER (ORDER BY sc DESC, vec_id ASC) AS BIGINT) AS r1
  FROM (SELECT vec_id, sc FROM s ORDER BY sc DESC, vec_id LIMIT 50)
),
rd AS (
  SELECT vec_id, CAST(row_number() OVER (ORDER BY sd DESC, vec_id ASC) AS BIGINT) AS r2
  FROM (SELECT vec_id, sd FROM s ORDER BY sd DESC, vec_id LIMIT 50)
),
rl AS (
  SELECT vec_id, CAST(row_number() OVER (ORDER BY sl DESC, vec_id ASC) AS BIGINT) AS r3
  FROM (SELECT vec_id, sl FROM s ORDER BY sl DESC, vec_id LIMIT 50)
),
j AS (
  SELECT coalesce(rc.vec_id, rd.vec_id, rl.vec_id) AS vec_id, r1, r2, r3
  FROM rc
  FULL OUTER JOIN rd ON rc.vec_id = rd.vec_id
  FULL OUTER JOIN rl ON coalesce(rc.vec_id, rd.vec_id) = rl.vec_id
),
fused AS (
  SELECT vec_id,
         CAST((CASE WHEN r1 IS NOT NULL THEN 1 ELSE 0 END)
            + (CASE WHEN r2 IS NOT NULL THEN 1 ELSE 0 END)
            + (CASE WHEN r3 IS NOT NULL THEN 1 ELSE 0 END) AS INT) AS in_lists,
         CAST(coalesce(CAST(round(1e9 / CAST(60 + r1 AS DOUBLE)) AS BIGINT), 0)
            + coalesce(CAST(round(1e9 / CAST(60 + r2 AS DOUBLE)) AS BIGINT), 0)
            + coalesce(CAST(round(1e9 / CAST(60 + r3 AS DOUBLE)) AS BIGINT), 0)
            AS BIGINT) AS rrf_nano
  FROM j
)
SELECT vec_id, in_lists, rrf_nano,
       round(CAST(rrf_nano AS DOUBLE) / 1e9, 6) AS rrf
FROM fused
ORDER BY rrf_nano DESC, vec_id ASC
LIMIT 10
"""


def auc_report(spark, sf):
    """Ranking evaluation for quality-filter scorers: ROC AUC via the
    tie-corrected Mann-Whitney rank-sum (X95 — Mann & Whitney 1947;
    AUC = U/(n₁n₀), Hanley & McNeil 1982 — the standard eval for the
    FastText-style quality classifiers web-corpus curation gates on).
    Three candidate scorers of "is this doc English?" are ranked against
    the lang=='en' label in ONE corpus scan: en-stopword hits per
    kilotoken, punctuation chars per kilochar, and raw length — each an
    exact BIGINT (integer `DIV`, no float quantization), so the X93
    average-rank idiom applies verbatim: per-(scorer, score) counts
    combine map-side to the bounded score domain (≤1001 values for the
    density scorers), ONE cumulative window per scorer over the
    distinct-value frame, and the positive rank sum, AUC numerator
    u2 = 2U, and tie term Σ(t³−t) all ride BIGINTs (exact while
    n³ < 2^63 — beyond ~2M rows per scorer the tie sum is a one-line
    DECIMAL(38,0) swap, the X93 caveat). Floats only in the final 3-row
    AUC division and the tie-corrected z (σ² = n₁n₀/12·((n+1) −
    Σ(t³−t)/(n(n−1)))); all-tied scorers yield σ²=0 → z NULL, single-
    class corpora yield AUC NULL (ANSI-guarded). Reference analog: none —
    rebuild-only (SURVEY §2.13)."""
    from .functions.text import STOPWORDS, _word_hits, whitespace_token_count

    d = t(spark, sf, "documents")
    toks = whitespace_token_count(F.col("text"))
    hits = _word_hits(F.col("text"), STOPWORDS["en"]).cast("long")
    nchar = F.length("text").cast("long")
    npunct = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(r"[\p{P}]"), 0)
    ).cast("long")
    base = d.select(
        (F.col("lang") == "en").cast("long").alias("_y"),
        F.when(toks > 0, hits * F.lit(1000)).otherwise(F.lit(0))
        .cast("long")
        .alias("_h1000"),
        F.greatest(toks, F.lit(1)).cast("long").alias("_toks"),
        F.when(nchar > 0, npunct * F.lit(1000)).otherwise(F.lit(0))
        .cast("long")
        .alias("_p1000"),
        F.greatest(nchar, F.lit(1)).cast("long").alias("_nc"),
        nchar.alias("_len"),
    ).select(
        "_y",
        F.expr("_h1000 DIV _toks").cast("long").alias("_ss"),
        F.expr("_p1000 DIV _nc").cast("long").alias("_sp"),
        F.col("_len").alias("_sl"),
    )
    scored = base.select(
        "_y",
        F.expr(
            "stack(3, 'len_chars', _sl, 'punct_density', _sp, "
            "'stop_density', _ss) AS (scorer, s)"
        ),
    )
    c = scored.groupBy("scorer", "s").agg(
        F.count(F.lit(1)).cast("long").alias("_cnt"),
        F.sum("_y").cast("long").alias("_pos"),
    )
    w = (
        W.partitionBy("scorer")
        .orderBy("s")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    r = c.select(
        "scorer",
        "_cnt",
        "_pos",
        (
            F.lit(2) * (F.sum("_cnt").over(w) - F.col("_cnt"))
            + F.col("_cnt")
            + F.lit(1)
        )
        .cast("long")
        .alias("_r2"),
    )
    s = r.groupBy("scorer").agg(
        F.sum("_cnt").cast("long").alias("_n"),
        F.sum("_pos").cast("long").alias("n_pos"),
        F.sum(F.col("_pos") * F.col("_r2")).cast("long").alias("_r2pos"),
        F.sum(F.col("_cnt") * F.col("_cnt") * F.col("_cnt") - F.col("_cnt"))
        .cast("long")
        .alias("_tie"),
    )
    n1 = F.col("n_pos")
    nn = F.col("_n")
    n0 = nn - n1
    u2 = (F.col("_r2pos") - n1 * (n1 + F.lit(1))).cast("long")
    prod = (n1 * n0).cast("long")
    auc = F.when(
        prod > 0, u2.cast("double") / (F.lit(2.0) * prod.cast("double"))
    )
    tie_frac = F.when(
        nn * (nn - 1) != 0,
        F.col("_tie").cast("double") / (nn * (nn - 1)).cast("double"),
    ).otherwise(F.lit(0.0))
    var = (
        prod.cast("double")
        / F.lit(12.0)
        * ((nn + F.lit(1)).cast("double") - tie_frac)
    )
    z = F.when(
        (prod > 0) & (var > 0),
        (u2.cast("double") - prod.cast("double")) / (F.lit(2.0) * F.sqrt(var)),
    )
    return s.select(
        "scorer",
        "n_pos",
        n0.cast("long").alias("n_neg"),
        u2.alias("u2"),
        _r(auc).alias("auc"),
        _r(z).alias("z_score"),
    ).orderBy("scorer")


ORACLE_AUC = rf"""
WITH feat AS (
  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
         CASE WHEN length(trim(text)) = 0 THEN CAST(0 AS BIGINT)
              ELSE CAST((len(regexp_extract_all(lower(text), '\b({_SW_EN})\b')) * 1000)
                   // len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
              END AS s_stop,
         CASE WHEN length(text) = 0 THEN CAST(0 AS BIGINT)
              ELSE CAST((len(regexp_extract_all(text, '[\p{{P}}]')) * 1000)
                   // length(text) AS BIGINT) END AS s_punct,
         CAST(length(text) AS BIGINT) AS s_len
  FROM documents
),
u AS (
  SELECT 'stop_density' AS scorer, s_stop AS s, y FROM feat
  UNION ALL SELECT 'punct_density', s_punct, y FROM feat
  UNION ALL SELECT 'len_chars', s_len, y FROM feat
),
c AS (
  SELECT scorer, s, CAST(count(*) AS BIGINT) AS cnt,
         CAST(sum(y) AS BIGINT) AS pos
  FROM u GROUP BY 1, 2
),
r AS (
  SELECT scorer, cnt, pos,
         CAST(2 * (sum(cnt) OVER (PARTITION BY scorer ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt)
              + cnt + 1 AS BIGINT) AS r2
  FROM c
),
agg AS (
  SELECT scorer, CAST(sum(cnt) AS BIGINT) AS n,
         CAST(sum(pos) AS BIGINT) AS n_pos,
         CAST(sum(pos * r2) AS BIGINT) AS r2pos,
         CAST(sum(cnt * cnt * cnt - cnt) AS BIGINT) AS tie
  FROM r GROUP BY 1
),
fin AS (
  SELECT scorer, n, n_pos, CAST(n - n_pos AS BIGINT) AS n_neg,
         CAST(r2pos - n_pos * (n_pos + 1) AS BIGINT) AS u2,
         CAST(n_pos * (n - n_pos) AS BIGINT) AS prod,
         CAST(n_pos * (n - n_pos) AS DOUBLE) / 12.0
           * (CAST(n + 1 AS DOUBLE)
              - CASE WHEN n * (n - 1) != 0
                     THEN CAST(tie AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE)
                     ELSE 0.0 END) AS var
  FROM agg
)
SELECT scorer, n_pos, n_neg, u2,
       round(CASE WHEN prod > 0
                  THEN CAST(u2 AS DOUBLE) / (2.0 * CAST(prod AS DOUBLE)) END,
             6) AS auc,
       round(CASE WHEN prod > 0 AND var > 0
                  THEN (CAST(u2 AS DOUBLE) - CAST(prod AS DOUBLE))
                       / (2.0 * sqrt(var)) END, 6) AS z_score
FROM fin
ORDER BY scorer
"""


def chi2_report(spark, sf):
    """Chi-square test of independence + Cramér's V (X96 — Pearson 1900;
    Cramér 1946 V = sqrt(χ²/(N·min(r−1,c−1)))): is document length
    distributed independently of source? The corpus-health audit behind
    source-mix decisions (a high V says some hosts systematically ship
    short/boilerplate pages). ONE map-side-combined groupBy collapses the
    corpus to the (source × length-bucket) cell frame (≤ |sources|·10
    rows; buckets = n_chars DIV 200 capped at 9); the FULL grid including
    zero-observed cells is a crossJoin of the two tiny distinct frames
    (absent cells still contribute E = R·C/N); margins R/C/N come from
    three windows over that grid (no self-join — the conflicting-refs
    trap); each cell's χ² term uses the exact BIGINT cross-multiple
    d = O·N − R·C (exact while n² < 2^63) and is nano-quantized BIGINT
    (the X72/X85 discipline) so the sum is addition-order-independent.
    The top-contribution cell ships alongside (lexicographic (term, src,
    bucket) max — the which-host-drives-it diagnostic). Floats only in
    the final 1-row divisions. Reference analog: none — rebuild-only
    (SURVEY §2.13)."""
    d = t(spark, sf, "documents").select(
        "source",
        F.least(F.expr("n_chars DIV 200"), F.lit(9)).cast("long").alias("bucket"),
    )
    cells = d.groupBy("source", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("_o")
    )
    grid = (
        cells.select("source")
        .distinct()
        .crossJoin(cells.select("bucket").distinct())
        .join(cells, ["source", "bucket"], "left")
        .select(
            "source",
            "bucket",
            F.coalesce("_o", F.lit(0)).cast("long").alias("_o"),
        )
    )
    full = grid.select(
        "source",
        "bucket",
        "_o",
        F.sum("_o").over(W.partitionBy("source")).cast("long").alias("_r"),
        F.sum("_o").over(W.partitionBy("bucket")).cast("long").alias("_c"),
        F.sum("_o").over(W.partitionBy()).cast("long").alias("_n"),
    )
    dd = (F.col("_o") * F.col("_n") - F.col("_r") * F.col("_c")).cast("long")
    denom = (
        F.col("_n").cast("double")
        * F.col("_r").cast("double")
        * F.col("_c").cast("double")
    )
    term = F.when(
        denom != 0, dd.cast("double") * dd.cast("double") / denom
    ).otherwise(F.lit(0.0))
    terms = full.select(
        "source",
        "bucket",
        "_n",
        F.round(term * F.lit(1e9)).cast("long").alias("_tn"),
    )
    agg = terms.groupBy().agg(
        F.max("_n").cast("long").alias("n_total"),
        F.countDistinct("source").cast("long").alias("n_sources"),
        F.countDistinct("bucket").cast("long").alias("n_buckets"),
        F.sum("_tn").cast("long").alias("chi2_nano"),
        F.max(
            F.struct(
                F.col("_tn").alias("t"),
                F.col("source").alias("s"),
                F.col("bucket").alias("b"),
            )
        ).alias("_top"),
    )
    mind = F.least(F.col("n_sources") - 1, F.col("n_buckets") - 1)
    chi2d = F.col("chi2_nano").cast("double") / F.lit(1e9)
    return agg.select(
        "n_total",
        "n_sources",
        "n_buckets",
        ((F.col("n_sources") - 1) * (F.col("n_buckets") - 1))
        .cast("long")
        .alias("dof"),
        "chi2_nano",
        _r(chi2d).alias("chi2"),
        _r(
            F.when(
                (F.col("n_total") > 0) & (mind > 0),
                F.sqrt(
                    chi2d
                    / (F.col("n_total").cast("double") * mind.cast("double"))
                ),
            )
        ).alias("cramers_v"),
        F.col("_top.s").alias("top_source"),
        F.col("_top.b").alias("top_bucket"),
        F.col("_top.t").alias("top_term_nano"),
    )


ORACLE_CHI2 = r"""
WITH d AS (
  SELECT source, CAST(least(n_chars // 200, 9) AS BIGINT) AS bucket
  FROM documents
),
cells AS (
  SELECT source, bucket, CAST(count(*) AS BIGINT) AS o FROM d GROUP BY 1, 2
),
grid AS (
  SELECT s.source, b.bucket, CAST(coalesce(c.o, 0) AS BIGINT) AS o
  FROM (SELECT DISTINCT source FROM cells) s
  CROSS JOIN (SELECT DISTINCT bucket FROM cells) b
  LEFT JOIN cells c ON c.source = s.source AND c.bucket = b.bucket
),
full_t AS (
  SELECT source, bucket, o,
         CAST(sum(o) OVER (PARTITION BY source) AS BIGINT) AS r,
         CAST(sum(o) OVER (PARTITION BY bucket) AS BIGINT) AS c,
         CAST(sum(o) OVER () AS BIGINT) AS n
  FROM grid
),
terms AS (
  SELECT source, bucket, n,
         CAST(round(CASE WHEN CAST(n AS DOUBLE) * CAST(r AS DOUBLE)
                              * CAST(c AS DOUBLE) != 0
               THEN CAST(o * n - r * c AS DOUBLE) * CAST(o * n - r * c AS DOUBLE)
                    / (CAST(n AS DOUBLE) * CAST(r AS DOUBLE) * CAST(c AS DOUBLE))
               ELSE 0.0 END * 1e9) AS BIGINT) AS tn
  FROM full_t
),
agg AS (
  SELECT CAST(max(n) AS BIGINT) AS n_total,
         CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
         CAST(count(DISTINCT bucket) AS BIGINT) AS n_buckets,
         CAST(sum(tn) AS BIGINT) AS chi2_nano
  FROM terms
),
top AS (
  SELECT source AS top_source, bucket AS top_bucket, tn AS top_term_nano
  FROM terms ORDER BY tn DESC, source DESC, bucket DESC LIMIT 1
)
SELECT n_total, n_sources, n_buckets,
       CAST((n_sources - 1) * (n_buckets - 1) AS BIGINT) AS dof,
       chi2_nano,
       round(CAST(chi2_nano AS DOUBLE) / 1e9, 6) AS chi2,
       round(CASE WHEN n_total > 0 AND least(n_sources - 1, n_buckets - 1) > 0
             THEN sqrt(CAST(chi2_nano AS DOUBLE) / 1e9
                  / (CAST(n_total AS DOUBLE)
                     * CAST(least(n_sources - 1, n_buckets - 1) AS DOUBLE)))
             END, 6) AS cramers_v,
       top_source, top_bucket, top_term_nano
FROM agg CROSS JOIN top
"""


def bh_fdr_report(spark, sf):
    """Benjamini-Hochberg FDR over a per-source drift-test family (X97 —
    Benjamini & Hochberg 1995 step-up at α=0.05; the multiple-comparisons
    control a per-host drift monitor needs once it runs one KS test per
    source every snapshot). Each source's n_chars distribution is KS-
    tested against the REST of the corpus (X92's exact-integer machinery,
    leave-one-out margins off ONE shared count frame): per-(source,
    value) counts combine map-side to the bounded domain, the full
    source×value grid is a crossJoin with the column-total frame, and
    ONE cumulative window per source yields BOTH ECDFs (the grid holds
    every corpus value, so the within-partition cumulative of column
    totals IS the global ECDF — no second pass); the sup numerator
    |cum_src·n_rest − cum_rest·n_src| stays BIGINT-exact. The asymptotic
    two-sided p = min(1, 2·exp(−2·D²·m)), m = n₁n₂/(n₁+n₂) (Smirnov
    1939) is nano-quantized BIGINT, and the BH step-up (rank by p_nano,
    reject ranks ≤ max{k: p_nano_k ≤ round(k·α/M·1e9)}) compares only
    those integers — engine-identical decisions, no float-boundary
    flips. Everything after the count frame rides |sources|·|domain|
    rows. Reference analog: none — rebuild-only (SURVEY §2.13)."""
    ALPHA = 0.05
    d = t(spark, sf, "documents").select("source", "n_chars")
    c = d.groupBy("source", "n_chars").agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    tot = c.groupBy("n_chars").agg(F.sum("_c").cast("long").alias("_ct"))
    grid = (
        c.select("source")
        .distinct()
        .crossJoin(tot)
        .join(c, ["source", "n_chars"], "left")
        .select(
            "source",
            "n_chars",
            F.coalesce("_c", F.lit(0)).cast("long").alias("_c"),
            "_ct",
        )
    )
    wcum = (
        W.partitionBy("source")
        .orderBy("n_chars")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wall = W.partitionBy("source")
    g = grid.select(
        "source",
        F.sum("_c").over(wcum).cast("long").alias("_cums"),
        F.sum("_ct").over(wcum).cast("long").alias("_cuma"),
        F.sum("_c").over(wall).cast("long").alias("_ns"),
        F.sum("_ct").over(wall).cast("long").alias("_na"),
    )
    d_num = F.abs(
        F.col("_cums") * (F.col("_na") - F.col("_ns"))
        - (F.col("_cuma") - F.col("_cums")) * F.col("_ns")
    ).cast("long")
    s = g.groupBy("source").agg(
        F.max("_ns").cast("long").alias("n_src"),
        (F.max("_na") - F.max("_ns")).cast("long").alias("n_rest"),
        F.max(d_num).cast("long").alias("d_num"),
    )
    prod = (F.col("n_src") * F.col("n_rest")).cast("double")
    nsum = (F.col("n_src") + F.col("n_rest")).cast("double")
    # -2*D^2*m with D = d_num/prod, m = prod/nsum -> -2*d_num^2/(prod*nsum)
    p_raw = F.when(
        (prod > 0) & (nsum > 0),
        F.least(
            F.lit(1.0),
            F.lit(2.0)
            * F.exp(
                F.lit(-2.0)
                * F.col("d_num").cast("double")
                * F.col("d_num").cast("double")
                / (prod * nsum)
            ),
        ),
    )
    pn = s.select(
        "source",
        "n_src",
        "n_rest",
        "d_num",
        _r(F.when(prod > 0, F.col("d_num").cast("double") / prod)).alias(
            "d_stat"
        ),
        F.round(p_raw * F.lit(1e9)).cast("long").alias("p_nano"),
    )
    wrank = W.orderBy(F.col("p_nano").asc(), F.col("source").asc())
    m_tests = W.partitionBy()
    ranked = pn.select(
        "*",
        F.row_number().over(wrank).cast("long").alias("bh_rank"),
        F.count(F.lit(1)).over(m_tests).cast("long").alias("_m"),
    )
    thr_nano = F.round(
        F.col("bh_rank").cast("double") * F.lit(ALPHA) / F.col("_m").cast("double")
        * F.lit(1e9)
    ).cast("long")
    flagged = ranked.select(
        "*",
        thr_nano.alias("bh_thr_nano"),
        F.when(F.col("p_nano") <= thr_nano, F.col("bh_rank")).alias("_okr"),
    )
    kmax = F.max("_okr").over(W.partitionBy())
    return (
        flagged.select(
            "source",
            "n_src",
            "n_rest",
            "d_num",
            "d_stat",
            _r(F.col("p_nano").cast("double") / F.lit(1e9)).alias("p_value"),
            "bh_rank",
            "bh_thr_nano",
            (F.col("bh_rank") <= F.coalesce(kmax, F.lit(0)))
            .cast("int")
            .alias("rejected"),
        )
        .orderBy("bh_rank")
    )


ORACLE_BH_FDR = r"""
WITH d AS (SELECT source, n_chars FROM documents),
c AS (
  SELECT source, n_chars, CAST(count(*) AS BIGINT) AS cc
  FROM d GROUP BY 1, 2
),
tot AS (
  SELECT n_chars, CAST(sum(cc) AS BIGINT) AS ct FROM c GROUP BY 1
),
grid AS (
  SELECT s.source, t.n_chars, CAST(coalesce(c.cc, 0) AS BIGINT) AS cc, t.ct
  FROM (SELECT DISTINCT source FROM c) s
  CROSS JOIN tot t
  LEFT JOIN c ON c.source = s.source AND c.n_chars = t.n_chars
),
g AS (
  SELECT source,
         CAST(sum(cc) OVER (PARTITION BY source ORDER BY n_chars
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cums,
         CAST(sum(ct) OVER (PARTITION BY source ORDER BY n_chars
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cuma,
         CAST(sum(cc) OVER (PARTITION BY source) AS BIGINT) AS ns,
         CAST(sum(ct) OVER (PARTITION BY source) AS BIGINT) AS na
  FROM grid
),
s AS (
  SELECT source, CAST(max(ns) AS BIGINT) AS n_src,
         CAST(max(na) - max(ns) AS BIGINT) AS n_rest,
         CAST(max(abs(cums * (na - ns) - (cuma - cums) * ns)) AS BIGINT) AS d_num
  FROM g GROUP BY 1
),
pn AS (
  SELECT source, n_src, n_rest, d_num,
         round(CASE WHEN n_src * n_rest > 0
               THEN CAST(d_num AS DOUBLE)
                    / (CAST(n_src AS DOUBLE) * CAST(n_rest AS DOUBLE)) END,
               6) AS d_stat,
         CAST(round(CASE WHEN n_src * n_rest > 0
              THEN least(1.0, 2.0 * exp(
                   -2.0 * CAST(d_num AS DOUBLE) * CAST(d_num AS DOUBLE)
                   / ((CAST(n_src AS DOUBLE) * CAST(n_rest AS DOUBLE))
                      * (CAST(n_src AS DOUBLE) + CAST(n_rest AS DOUBLE)))))
              END * 1e9) AS BIGINT) AS p_nano
  FROM s
),
ranked AS (
  SELECT *,
         CAST(row_number() OVER (ORDER BY p_nano ASC, source ASC) AS BIGINT)
           AS bh_rank,
         CAST(count(*) OVER () AS BIGINT) AS m
  FROM pn
),
flagged AS (
  SELECT *,
         CAST(round(CAST(bh_rank AS DOUBLE) * 0.05 / CAST(m AS DOUBLE) * 1e9)
              AS BIGINT) AS bh_thr_nano
  FROM ranked
),
km AS (
  SELECT max(CASE WHEN p_nano <= bh_thr_nano THEN bh_rank END) AS kmax
  FROM flagged
)
SELECT source, n_src, n_rest, d_num, d_stat,
       round(CAST(p_nano AS DOUBLE) / 1e9, 6) AS p_value,
       bh_rank, bh_thr_nano,
       CAST(CASE WHEN bh_rank <= coalesce(kmax, 0) THEN 1 ELSE 0 END AS INT)
         AS rejected
FROM flagged CROSS JOIN km
ORDER BY bh_rank
"""


def quantile_norm_report(spark, sf):
    """Per-source quantile normalization (X98 — Bolstad et al. 2003's
    microarray quantile normalization adapted to unequal group sizes via
    rank interpolation; the per-host score-calibration table a CCNet-style
    curator needs before cross-source selection, so a host whose pages all
    score low isn't wholesale discarded by a single global threshold).
    For each source and decile d=1..10 the within-source decile rank
    r_d = ceil(d*n_src/10) maps onto the pooled rank
    k = 1 + (r_d-1)(N-1) DIV (n_src-1) and both rank→value lookups ride
    the bounded n_chars domain: per-(source, value) counts combine
    map-side, ONE cumulative window per side turns counts into rank
    INTERVALS (value v covers ranks (cum−c, cum]), and the 10-deciles-per
    -source frame broadcast-joins into exactly one interval per lookup —
    no per-doc global sort, no quantile sketch, everything after the
    count frame rides |sources|·|domain| rows and the output is
    10·|sources|. Pure BIGINT throughout (integer DIV, ceil via
    (x+9) DIV 10) — engine-identical, no float quantization anywhere.
    Reference analog: none — rebuild-only (SURVEY §2.13)."""
    d = t(spark, sf, "documents").select("source", "n_chars")
    c = d.groupBy("source", "n_chars").agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    wsrc = (
        W.partitionBy("source")
        .orderBy("n_chars")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    sc_ = c.select(
        "source",
        "n_chars",
        "_c",
        F.sum("_c").over(wsrc).cast("long").alias("_cum_s"),
        F.sum("_c").over(W.partitionBy("source")).cast("long").alias("n_src"),
    )
    tot = c.groupBy("n_chars").agg(F.sum("_c").cast("long").alias("_ct"))
    wall = W.orderBy("n_chars").rowsBetween(W.unboundedPreceding, W.currentRow)
    pooled = tot.select(
        "n_chars",
        "_ct",
        F.sum("_ct").over(wall).cast("long").alias("_cum_a"),
        F.sum("_ct").over(W.partitionBy()).cast("long").alias("_n_all"),
    )
    dec = (
        c.groupBy("source")
        .agg(F.sum("_c").cast("long").alias("n_src"))
        .select(
            "source",
            "n_src",
            F.explode(F.sequence(F.lit(1), F.lit(10))).alias("decile"),
        )
        .select(
            "source",
            "n_src",
            F.col("decile").cast("long").alias("decile"),
        )
        .select(
            "source",
            "n_src",
            "decile",
            F.expr("(decile * n_src + 9) DIV 10").cast("long").alias("src_rank"),
        )
    )
    src_val = (
        F.broadcast(dec)
        .join(
            sc_.select(
                F.col("source").alias("_s2"), "n_chars", "_c", "_cum_s"
            ),
            (F.col("source") == F.col("_s2"))
            & (F.col("src_rank") > F.col("_cum_s") - F.col("_c"))
            & (F.col("src_rank") <= F.col("_cum_s")),
        )
        .select(
            "source",
            "n_src",
            "decile",
            "src_rank",
            F.col("n_chars").alias("src_value"),
        )
    )
    # _n_all is a per-row column on `pooled`; fold it into the decile frame
    # via a 1-row crossJoin instead of a literal so the plan stays lazy
    n_all_frame = pooled.groupBy().agg(F.max("_n_all").alias("_n_all"))
    keyed = src_val.crossJoin(F.broadcast(n_all_frame)).select(
        "*",
        F.when(
            F.col("n_src") > 1,
            F.lit(1).cast("long")
            + F.expr("(src_rank - 1) * (_n_all - 1) DIV (n_src - 1)"),
        )
        .otherwise(F.expr("(_n_all + 1) DIV 2"))
        .cast("long")
        .alias("pooled_rank"),
    )
    out = (
        F.broadcast(keyed)
        .join(
            pooled.select("n_chars", "_ct", "_cum_a"),
            (F.col("pooled_rank") > F.col("_cum_a") - F.col("_ct"))
            & (F.col("pooled_rank") <= F.col("_cum_a")),
        )
        .select(
            "source",
            "decile",
            "n_src",
            "src_rank",
            "src_value",
            "pooled_rank",
            F.col("n_chars").alias("pooled_value"),
            (F.col("n_chars") - F.col("src_value"))
            .cast("long")
            .alias("shift"),
        )
    )
    return out.orderBy("source", "decile")


def isotonic_calibration_report(spark, sf, scorer="stop_density"):
    """Isotonic-regression calibration of a quality scorer (X99 — PAV,
    Ayer et al. 1955; the minimax closed form fitted[i] = max_{j<=i}
    min_{k>=i} avg(y[j..k]), Barlow et al. 1972 §1.2; the monotone
    score→P(label) calibration step Zadrozny & Elkan 2002 apply before a
    classifier's scores gate a corpus). Scorer and label reuse X95's
    setup: en-stopword hits per kilotoken (exact BIGINT, bounded ≤1001
    values) against the lang=='en' label. Per-score (count, positives)
    combine map-side to the bounded domain; prefix sums ride ONE window
    over the m-row domain frame; the all-interval frame (j≤k, m²≤~500k
    rows — domain-bounded, scale-INVARIANT in corpus size) carries each
    interval's nano-quantized mean round(1e9·(S_k−S_{j−1})/(N_k−N_{j−1}))
    as BIGINT, a suffix-min window per j and a max groupBy per i evaluate
    the minimax, and because round() is monotone, min/max commute with
    it: the BIGINT result IS round(1e9·exact PAV fit) — engine-identical
    integers, no float-boundary flips (the pytest mirror cross-checks an
    exact-fraction pool-adjacent-violators stack). Everything after the
    count frame is corpus-size-free. The registry/oracle path scores by
    stopword density; the scale-spot drill passes scorer='len_bucket'
    (n_chars DIV 4 capped at 1000 — same bounded-domain contract) because
    the spot fixture's hex vocabulary has no English stopwords.
    Reference analog: none — rebuild-only (SURVEY §2.13)."""
    from .functions.text import STOPWORDS, _word_hits, whitespace_token_count

    d = t(spark, sf, "documents")
    if scorer == "len_bucket":
        score = F.least(
            F.expr("n_chars DIV 4").cast("long"), F.lit(1000).cast("long")
        )
        base = d.select(
            (F.col("lang") == "en").cast("long").alias("_y"),
            score.alias("score"),
        )
    else:
        toks = whitespace_token_count(F.col("text"))
        hits = _word_hits(F.col("text"), STOPWORDS["en"]).cast("long")
        base = d.select(
            (F.col("lang") == "en").cast("long").alias("_y"),
            F.when(toks > 0, hits * F.lit(1000)).otherwise(F.lit(0))
            .cast("long")
            .alias("_h1000"),
            F.greatest(toks, F.lit(1)).cast("long").alias("_toks"),
        ).select("_y", F.expr("_h1000 DIV _toks").cast("long").alias("score"))
    c = base.groupBy("score").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_y").cast("long").alias("n_pos"),
    )
    wpre = W.orderBy("score").rowsBetween(W.unboundedPreceding, W.currentRow)
    pre = c.select(
        "score",
        "n_docs",
        "n_pos",
        F.row_number().over(W.orderBy("score")).cast("long").alias("_i"),
        F.sum("n_docs").over(wpre).cast("long").alias("_nn"),
        F.sum("n_pos").over(wpre).cast("long").alias("_ss"),
    )
    lo = pre.select(
        F.col("_i").alias("_j"),
        (F.col("_nn") - F.col("n_docs")).alias("_n0"),
        (F.col("_ss") - F.col("n_pos")).alias("_s0"),
    )
    hi = pre.select(
        F.col("_i").alias("_k"), F.col("_nn").alias("_n1"), F.col("_ss").alias("_s1")
    )
    pairs = F.broadcast(lo).join(hi, F.col("_j") <= F.col("_k")).select(
        "_j",
        "_k",
        F.round(
            F.lit(1e9)
            * (F.col("_s1") - F.col("_s0")).cast("double")
            / (F.col("_n1") - F.col("_n0")).cast("double")
        )
        .cast("long")
        .alias("_avg_nano"),
    )
    wsuf = (
        W.partitionBy("_j")
        .orderBy(F.col("_k").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    minsuf = pairs.select(
        "_j",
        F.col("_k").alias("_i"),
        F.min("_avg_nano").over(wsuf).cast("long").alias("_minsuf"),
    )
    fit = minsuf.groupBy("_i").agg(
        F.max("_minsuf").cast("long").alias("iso_nano")
    )
    return (
        pre.join(fit, "_i")
        .select(
            "score",
            "n_docs",
            "n_pos",
            _r(
                F.col("n_pos").cast("double") / F.col("n_docs").cast("double")
            ).alias("raw_rate"),
            "iso_nano",
            _r(F.col("iso_nano").cast("double") / F.lit(1e9)).alias("iso_rate"),
        )
        .orderBy("score")
    )


ORACLE_ISOTONIC = rf"""
WITH base AS (
  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS _y,
         CASE WHEN length(trim(text)) = 0 THEN CAST(0 AS BIGINT)
              ELSE CAST((len(regexp_extract_all(lower(text), '\b({_SW_EN})\b')) * 1000)
                   // len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
              END AS score
  FROM documents
),
c AS (
  SELECT score, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(_y) AS BIGINT) AS n_pos
  FROM base GROUP BY score
),
pre AS (
  SELECT score, n_docs, n_pos,
         CAST(row_number() OVER (ORDER BY score) AS BIGINT) AS _i,
         CAST(sum(n_docs) OVER (ORDER BY score
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS _nn,
         CAST(sum(n_pos) OVER (ORDER BY score
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS _ss
  FROM c
),
pairs AS (
  SELECT lo._j, hi._k,
         CAST(round(1e9 * CAST(hi._s1 - lo._s0 AS DOUBLE)
              / CAST(hi._n1 - lo._n0 AS DOUBLE)) AS BIGINT) AS _avg_nano
  FROM (SELECT _i AS _j, _nn - n_docs AS _n0, _ss - n_pos AS _s0 FROM pre) lo
  JOIN (SELECT _i AS _k, _nn AS _n1, _ss AS _s1 FROM pre) hi
    ON lo._j <= hi._k
),
minsuf AS (
  SELECT _j, _k AS _i,
         CAST(min(_avg_nano) OVER (PARTITION BY _j ORDER BY _k DESC
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS _minsuf
  FROM pairs
),
fit AS (
  SELECT _i, CAST(max(_minsuf) AS BIGINT) AS iso_nano FROM minsuf GROUP BY _i
)
SELECT p.score, p.n_docs, p.n_pos,
       round(CAST(p.n_pos AS DOUBLE) / CAST(p.n_docs AS DOUBLE), 6) AS raw_rate,
       f.iso_nano,
       round(CAST(f.iso_nano AS DOUBLE) / 1e9, 6) AS iso_rate
FROM pre p JOIN fit f ON p._i = f._i
ORDER BY p.score
"""


def kendall_report(spark, sf, scorer="stop_density"):
    """Per-language Kendall tau-b ordinal association (X100 — Kendall
    1938; the tie-corrected tau-b = (C−D)/sqrt((n0−n1)(n0−n2)) of
    Kendall 1945, exactly scipy.stats.kendalltau's default): are longer
    documents stopword-denser, per language? Both variables are bounded
    ordinals (length bucket n_chars DIV 256 capped at 127; en-stopword
    per-mille DIV 8 — the X99 scorer), so the corpus collapses map-side
    to a per-(lang, x, y) cell frame and concordant/discordant pair
    counts come from 2D PREFIX SUMS over the dense per-lang index grid
    (≤128×126 cells/lang) — NEVER a pair self-join: C = Σ c·P(x−1,y−1)
    and D = Σ c·(R(x−1) − P(x−1,y)) where P is the 2D cumulative count
    and R the row-margin prefix, each unordered pair counted once at its
    larger-x cell. Everything after the first groupBy rides grid-sized
    frames whatever n; all counts BIGINT-exact (pair counts < 2^63 up to
    ~3e9 docs/lang), floats only in each lang's final division. The
    registry/oracle path scores y by stopword density; the scale-spot
    drill passes scorer='len_mod' (y = (n_chars DIV 8) mod 126 — same
    bounded-domain contract, non-degenerate on the hex-vocabulary spot
    fixture which has no English stopwords).
    Reference analog: none — rebuild-only (SURVEY §2.13)."""
    from .functions.text import STOPWORDS, _word_hits, whitespace_token_count

    d = t(spark, sf, "documents")
    xb = F.least(F.expr("n_chars DIV 256"), F.lit(127)).cast("long").alias("_x")
    if scorer == "len_mod":
        base = d.select(
            "lang", xb, F.expr("(n_chars DIV 8) % 126").cast("long").alias("_y")
        )
    else:
        toks = whitespace_token_count(F.col("text"))
        hits = _word_hits(F.col("text"), STOPWORDS["en"]).cast("long")
        base = d.select(
            "lang",
            xb,
            F.when(toks > 0, hits * F.lit(1000)).otherwise(F.lit(0))
            .cast("long")
            .alias("_h1000"),
            F.greatest(toks, F.lit(1)).cast("long").alias("_toks"),
        ).select(
            "lang", "_x", F.expr("(_h1000 DIV _toks) DIV 8").cast("long").alias("_y")
        )
    cnt = base.groupBy("lang", "_x", "_y").agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    wl = W.partitionBy("lang")
    xs = (
        cnt.select("lang", "_x")
        .distinct()
        .select("lang", "_x", F.dense_rank().over(wl.orderBy("_x")).alias("_xi"))
    )
    ys = (
        cnt.select("lang", "_y")
        .distinct()
        .select("lang", "_y", F.dense_rank().over(wl.orderBy("_y")).alias("_yi"))
    )
    g = (
        xs.join(ys, "lang")
        .join(cnt, ["lang", "_x", "_y"], "left")
        .select(
            "lang", "_xi", "_yi", F.coalesce("_c", F.lit(0)).cast("long").alias("_c0")
        )
    )
    wcol = (
        W.partitionBy("lang", "_xi")
        .orderBy("_yi")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wrow = (
        W.partitionBy("lang", "_yi")
        .orderBy("_xi")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    g = g.select("*", F.sum("_c0").over(wcol).cast("long").alias("_s1"))
    g = g.select("*", F.sum("_s1").over(wrow).cast("long").alias("_p"))
    g = g.select(
        "*",
        F.lag("_p", 1, 0)
        .over(W.partitionBy("lang", "_yi").orderBy("_xi"))
        .cast("long")
        .alias("_pdy"),
        F.sum("_c0").over(W.partitionBy("lang", "_xi")).cast("long").alias("_rt"),
        F.sum("_c0").over(W.partitionBy("lang", "_yi")).cast("long").alias("_ct"),
    )
    g = g.select(
        "*",
        F.lag("_pdy", 1, 0)
        .over(W.partitionBy("lang", "_xi").orderBy("_yi"))
        .cast("long")
        .alias("_pdd"),
        (F.sum("_rt").over(wrow) - F.col("_rt")).cast("long").alias("_pcol"),
    )
    a = g.groupBy("lang").agg(
        F.sum("_c0").cast("long").alias("n_docs"),
        F.sum(F.col("_c0") * F.col("_pdd")).cast("long").alias("concordant"),
        F.sum(F.col("_c0") * (F.col("_pcol") - F.col("_pdy")))
        .cast("long")
        .alias("discordant"),
        F.sum(
            F.when(F.col("_yi") == 1, F.expr("_rt * (_rt - 1) DIV 2")).otherwise(
                F.lit(0)
            )
        )
        .cast("long")
        .alias("ties_x"),
        F.sum(
            F.when(F.col("_xi") == 1, F.expr("_ct * (_ct - 1) DIV 2")).otherwise(
                F.lit(0)
            )
        )
        .cast("long")
        .alias("ties_y"),
    )
    n0 = F.expr("n_docs * (n_docs - 1) DIV 2").cast("long")
    dx = (n0 - F.col("ties_x")).cast("double")
    dy = (n0 - F.col("ties_y")).cast("double")
    return a.select(
        "lang",
        "n_docs",
        "concordant",
        "discordant",
        "ties_x",
        "ties_y",
        _r(
            F.when(
                dx * dy > 0,
                (F.col("concordant") - F.col("discordant")).cast("double")
                / F.sqrt(dx * dy),
            )
        ).alias("tau_b"),
    ).orderBy("lang")


ORACLE_KENDALL = rf"""
WITH base AS (
  SELECT lang,
         CAST(least(n_chars // 256, 127) AS BIGINT) AS _x,
         CASE WHEN length(trim(text)) = 0 THEN CAST(0 AS BIGINT)
              ELSE CAST((len(regexp_extract_all(lower(text), '\b({_SW_EN})\b')) * 1000)
                   // len(regexp_split_to_array(trim(text), '\s+')) // 8 AS BIGINT)
              END AS _y
  FROM documents
),
cnt AS (
  SELECT lang, _x, _y, CAST(count(*) AS BIGINT) AS _c
  FROM base GROUP BY 1, 2, 3
),
xs AS (
  SELECT lang, _x, CAST(dense_rank() OVER (PARTITION BY lang ORDER BY _x) AS BIGINT) AS _xi
  FROM (SELECT DISTINCT lang, _x FROM cnt)
),
ys AS (
  SELECT lang, _y, CAST(dense_rank() OVER (PARTITION BY lang ORDER BY _y) AS BIGINT) AS _yi
  FROM (SELECT DISTINCT lang, _y FROM cnt)
),
g0 AS (
  SELECT xs.lang, _xi, _yi, CAST(coalesce(_c, 0) AS BIGINT) AS _c0
  FROM xs JOIN ys ON xs.lang = ys.lang
  LEFT JOIN cnt ON cnt.lang = xs.lang AND cnt._x = xs._x AND cnt._y = ys._y
),
g1 AS (
  SELECT *, CAST(sum(_c0) OVER (PARTITION BY lang, _xi ORDER BY _yi
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS _s1
  FROM g0
),
g2 AS (
  SELECT *, CAST(sum(_s1) OVER (PARTITION BY lang, _yi ORDER BY _xi
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS _p
  FROM g1
),
g3 AS (
  SELECT *,
         CAST(coalesce(lag(_p) OVER (PARTITION BY lang, _yi ORDER BY _xi), 0) AS BIGINT) AS _pdy,
         CAST(sum(_c0) OVER (PARTITION BY lang, _xi) AS BIGINT) AS _rt,
         CAST(sum(_c0) OVER (PARTITION BY lang, _yi) AS BIGINT) AS _ct
  FROM g2
),
g4 AS (
  SELECT *,
         CAST(coalesce(lag(_pdy) OVER (PARTITION BY lang, _xi ORDER BY _yi), 0) AS BIGINT) AS _pdd,
         CAST(sum(_rt) OVER (PARTITION BY lang, _yi ORDER BY _xi
              ROWS UNBOUNDED PRECEDING) - _rt AS BIGINT) AS _pcol
  FROM g3
),
a AS (
  SELECT lang,
         CAST(sum(_c0) AS BIGINT) AS n_docs,
         CAST(sum(_c0 * _pdd) AS BIGINT) AS concordant,
         CAST(sum(_c0 * (_pcol - _pdy)) AS BIGINT) AS discordant,
         CAST(sum(CASE WHEN _yi = 1 THEN _rt * (_rt - 1) // 2 ELSE 0 END) AS BIGINT) AS ties_x,
         CAST(sum(CASE WHEN _xi = 1 THEN _ct * (_ct - 1) // 2 ELSE 0 END) AS BIGINT) AS ties_y
  FROM g4 GROUP BY 1
)
SELECT lang, n_docs, concordant, discordant, ties_x, ties_y,
       round(CASE WHEN CAST(n_docs * (n_docs - 1) // 2 - ties_x AS DOUBLE)
                     * CAST(n_docs * (n_docs - 1) // 2 - ties_y AS DOUBLE) > 0
             THEN CAST(concordant - discordant AS DOUBLE)
                  / sqrt(CAST(n_docs * (n_docs - 1) // 2 - ties_x AS DOUBLE)
                         * CAST(n_docs * (n_docs - 1) // 2 - ties_y AS DOUBLE))
             END, 6) AS tau_b
FROM a
ORDER BY lang
"""


def mann_kendall_report(spark, sf):
    """Per-event-type Mann-Kendall trend test + Theil-Sen slope (X101 —
    Mann 1945 / Kendall 1975 S = Σ_{i<j} sign(c_j−c_i) with the tie-
    corrected variance 18·var = n(n−1)(2n+5) − Σ t(t−1)(2t+5) and ±1
    continuity correction; Sen 1968 slope = median of pairwise slopes —
    the standard nonparametric drift monitor for a crawl's daily volume
    series). Events collapse map-side to the per-(type, epoch-day) count
    frame (bounded by |types|·|days| whatever event count); the i<j pair
    frame is day-domain-bounded (≤366²/2 per type per year) so S, the
    slope list and the tie terms all ride tiny frames. S and 18·var are
    BIGINT-exact; each pairwise slope is the IEEE division of two exact
    BIGINTs (identical in both engines) and the median is picked by
    row_number under the explicit total order (slope, dc, dd) — even
    counts average the two middle values. z uses the standard correction:
    (S−1)/σ if S>0, (S+1)/σ if S<0, exactly 0 if S=0.
    Reference analog: none — rebuild-only (SURVEY §2.13)."""
    e = t(spark, sf, "events")
    cnt = (
        e.select(
            "event_type",
            F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-01")))
            .cast("long")
            .alias("_d"),
        )
        .groupBy("event_type", "_d")
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
    )
    lo = cnt.toDF("event_type", "_d0", "_c0")
    hi = cnt.toDF("event_type", "_d1", "_c1")
    pairs = (
        F.broadcast(lo)
        .join(hi, "event_type")
        .filter(F.col("_d0") < F.col("_d1"))
        .select(
            "event_type",
            (F.col("_c1") - F.col("_c0")).cast("long").alias("_dc"),
            (F.col("_d1") - F.col("_d0")).cast("long").alias("_dd"),
        )
        .select(
            "event_type",
            "_dc",
            "_dd",
            F.signum(F.col("_dc").cast("double")).cast("long").alias("_sgn"),
            (F.col("_dc").cast("double") / F.col("_dd").cast("double")).alias(
                "_slope"
            ),
        )
    )
    wp = W.partitionBy("event_type")
    ranked = pairs.select(
        "*",
        F.row_number().over(wp.orderBy("_slope", "_dc", "_dd")).alias("_rn"),
        F.count(F.lit(1)).over(wp).cast("long").alias("_m"),
    )
    agg = ranked.groupBy("event_type").agg(
        F.sum("_sgn").cast("long").alias("s_stat"),
        _r(
            F.avg(
                F.when(
                    (F.col("_rn") == F.expr("(_m + 1) DIV 2"))
                    | (F.col("_rn") == F.expr("(_m + 2) DIV 2")),
                    F.col("_slope"),
                )
            )
        ).alias("sen_slope"),
    )
    nd = cnt.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    ties = (
        cnt.groupBy("event_type", "_c")
        .agg(F.count(F.lit(1)).cast("long").alias("_t"))
        .groupBy("event_type")
        .agg(
            F.sum(F.expr("_t * (_t - 1) * (2 * _t + 5)")).cast("long").alias("_tt")
        )
    )
    out = (
        nd.join(ties, "event_type")
        .join(agg, "event_type")
        .select(
            "event_type",
            "n_days",
            "s_stat",
            (
                F.expr("n_days * (n_days - 1) * (2 * n_days + 5)") - F.col("_tt")
            )
            .cast("long")
            .alias("var18"),
            "sen_slope",
        )
    )
    sd = F.sqrt(F.col("var18").cast("double") / F.lit(18.0))
    z = F.when(F.col("s_stat") > 0, (F.col("s_stat") - 1).cast("double") / sd).when(
        F.col("s_stat") < 0, (F.col("s_stat") + 1).cast("double") / sd
    ).otherwise(F.lit(0.0))
    return out.select(
        "event_type",
        "n_days",
        "s_stat",
        "var18",
        _r(F.when(F.col("var18") > 0, z).when(F.col("s_stat") == 0, F.lit(0.0))).alias(
            "z_mk"
        ),
        "sen_slope",
    ).orderBy("event_type")


ORACLE_MANN_KENDALL = r"""
WITH cnt AS (
  SELECT event_type,
         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS _d,
         CAST(count(*) AS BIGINT) AS _c
  FROM events GROUP BY 1, 2
),
pairs AS (
  SELECT lo.event_type,
         CAST(hi._c - lo._c AS BIGINT) AS _dc,
         CAST(hi._d - lo._d AS BIGINT) AS _dd,
         CAST(sign(hi._c - lo._c) AS BIGINT) AS _sgn,
         CAST(hi._c - lo._c AS DOUBLE) / CAST(hi._d - lo._d AS DOUBLE) AS _slope
  FROM cnt lo JOIN cnt hi
    ON lo.event_type = hi.event_type AND lo._d < hi._d
),
ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY _slope, _dc, _dd) AS _rn,
         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS _m
  FROM pairs
),
agg AS (
  SELECT event_type,
         CAST(sum(_sgn) AS BIGINT) AS s_stat,
         round(avg(CASE WHEN _rn = (_m + 1) // 2 OR _rn = (_m + 2) // 2
                        THEN _slope END), 6) AS sen_slope
  FROM ranked GROUP BY 1
),
nd AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days FROM cnt GROUP BY 1
),
ties AS (
  SELECT event_type,
         CAST(sum(_t * (_t - 1) * (2 * _t + 5)) AS BIGINT) AS _tt
  FROM (SELECT event_type, _c, CAST(count(*) AS BIGINT) AS _t
        FROM cnt GROUP BY 1, 2)
  GROUP BY 1
),
o AS (
  SELECT nd.event_type, n_days, s_stat,
         CAST(n_days * (n_days - 1) * (2 * n_days + 5) - _tt AS BIGINT) AS var18,
         sen_slope
  FROM nd JOIN ties ON nd.event_type = ties.event_type
          JOIN agg ON nd.event_type = agg.event_type
)
SELECT event_type, n_days, s_stat, var18,
       round(CASE WHEN var18 > 0 THEN
                CASE WHEN s_stat > 0
                     THEN CAST(s_stat - 1 AS DOUBLE) / sqrt(CAST(var18 AS DOUBLE) / 18.0)
                     WHEN s_stat < 0
                     THEN CAST(s_stat + 1 AS DOUBLE) / sqrt(CAST(var18 AS DOUBLE) / 18.0)
                     ELSE 0.0 END
             WHEN s_stat = 0 THEN 0.0 END, 6) AS z_mk,
       sen_slope
FROM o
ORDER BY event_type
"""


def pr_curve_report(spark, sf, scorer="stop_density"):
    """Threshold-sweep precision/recall curve + average precision (X102
    — the step-function AP = Σ_k (R_k−R_{k−1})·P_k over descending
    thresholds, exactly sklearn.metrics.average_precision_score; Davis &
    Goadrich 2006 on why PR beats ROC under class imbalance — the
    operating-point audit run before a classifier score gates a corpus).
    Scorer/label reuse X95/X99's setup (en-stopword per-mille vs the
    lang=='en' label, exact BIGINT, ≤1001-value domain). ONE corpus scan
    collapses map-side to the per-score (n, pos) frame; descending-
    cumulative windows over the ≤1001-row domain give TP/FP at every
    distinct threshold; each AP term ΔTP·TP/(TP+FP) is nano-quantized
    round(1e9·term) BIGINT so the sum is order-independent and engine-
    identical; precision/recall/F1 are per-row IEEE divisions of exact
    BIGINTs, 6dp. Everything after the count frame is corpus-size-free.
    The scale-spot drill passes scorer='len_bucket' (X99's contract —
    the hex spot fixture has no English stopwords).
    Reference analog: none — rebuild-only (SURVEY §2.13)."""
    from .functions.text import STOPWORDS, _word_hits, whitespace_token_count

    d = t(spark, sf, "documents")
    if scorer == "len_bucket":
        base = d.select(
            (F.col("lang") == "en").cast("long").alias("_y"),
            F.least(F.expr("n_chars DIV 4").cast("long"), F.lit(1000).cast("long"))
            .alias("score"),
        )
    else:
        toks = whitespace_token_count(F.col("text"))
        hits = _word_hits(F.col("text"), STOPWORDS["en"]).cast("long")
        base = d.select(
            (F.col("lang") == "en").cast("long").alias("_y"),
            F.when(toks > 0, hits * F.lit(1000)).otherwise(F.lit(0))
            .cast("long")
            .alias("_h1000"),
            F.greatest(toks, F.lit(1)).cast("long").alias("_toks"),
        ).select("_y", F.expr("_h1000 DIV _toks").cast("long").alias("score"))
    c = base.groupBy("score").agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum("_y").cast("long").alias("_pos"),
    )
    wdesc = (
        W.orderBy(F.col("score").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wall = W.partitionBy()
    g = c.select(
        "score",
        F.sum("_pos").over(wdesc).cast("long").alias("tp"),
        (F.sum("_n").over(wdesc) - F.sum("_pos").over(wdesc))
        .cast("long")
        .alias("fp"),
        F.sum("_pos").over(wall).cast("long").alias("_p"),
    )
    g = g.select(
        "*",
        (
            F.col("tp")
            - F.lag("tp", 1, 0).over(W.orderBy(F.col("score").desc()))
        )
        .cast("long")
        .alias("_dtp"),
    )
    g = g.select(
        "*",
        F.when(
            F.col("tp") + F.col("fp") > 0,
            F.round(
                F.lit(1e9)
                * F.col("_dtp").cast("double")
                * F.col("tp").cast("double")
                / (F.col("tp") + F.col("fp")).cast("double")
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("_term_nano"),
    )
    g = g.select("*", F.sum("_term_nano").over(wall).cast("long").alias("_apn"))
    pp = (F.col("tp") + F.col("fp")).cast("double")
    return g.select(
        "score",
        "tp",
        "fp",
        (F.col("_p") - F.col("tp")).cast("long").alias("fn"),
        _r(F.when(F.col("tp") + F.col("fp") > 0, F.col("tp").cast("double") / pp)).alias(
            "precision"
        ),
        _r(
            F.when(F.col("_p") > 0, F.col("tp").cast("double") / F.col("_p").cast("double"))
        ).alias("recall"),
        _r(
            F.when(
                F.lit(2) * F.col("tp") + F.col("fp") + (F.col("_p") - F.col("tp")) > 0,
                F.lit(2.0)
                * F.col("tp").cast("double")
                / (
                    F.lit(2) * F.col("tp") + F.col("fp") + (F.col("_p") - F.col("tp"))
                ).cast("double"),
            )
        ).alias("f1"),
        _r(
            F.when(
                F.col("_p") > 0,
                F.col("_apn").cast("double") / (F.lit(1e9) * F.col("_p").cast("double")),
            )
        ).alias("ap"),
    ).orderBy("score")


ORACLE_PR_CURVE = rf"""
WITH base AS (
  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS _y,
         CASE WHEN length(trim(text)) = 0 THEN CAST(0 AS BIGINT)
              ELSE CAST((len(regexp_extract_all(lower(text), '\b({_SW_EN})\b')) * 1000)
                   // len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
              END AS score
  FROM documents
),
c AS (
  SELECT score, CAST(count(*) AS BIGINT) AS _n, CAST(sum(_y) AS BIGINT) AS _pos
  FROM base GROUP BY score
),
g1 AS (
  SELECT score,
         CAST(sum(_pos) OVER (ORDER BY score DESC
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tp,
         CAST(sum(_n) OVER (ORDER BY score DESC ROWS UNBOUNDED PRECEDING)
              - sum(_pos) OVER (ORDER BY score DESC ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS fp,
         CAST(sum(_pos) OVER () AS BIGINT) AS _p
  FROM c
),
g2 AS (
  SELECT *, CAST(tp - coalesce(lag(tp) OVER (ORDER BY score DESC), 0) AS BIGINT) AS _dtp
  FROM g1
),
g3 AS (
  SELECT *,
         CASE WHEN tp + fp > 0
              THEN CAST(round(1e9 * CAST(_dtp AS DOUBLE) * CAST(tp AS DOUBLE)
                              / CAST(tp + fp AS DOUBLE)) AS BIGINT)
              ELSE 0 END AS _term_nano
  FROM g2
),
g4 AS (
  SELECT *, CAST(sum(_term_nano) OVER () AS BIGINT) AS _apn FROM g3
)
SELECT score, tp, fp, CAST(_p - tp AS BIGINT) AS fn,
       round(CASE WHEN tp + fp > 0
             THEN CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END, 6) AS precision,
       round(CASE WHEN _p > 0
             THEN CAST(tp AS DOUBLE) / CAST(_p AS DOUBLE) END, 6) AS recall,
       round(CASE WHEN 2 * tp + fp + (_p - tp) > 0
             THEN 2.0 * CAST(tp AS DOUBLE) / CAST(2 * tp + fp + (_p - tp) AS DOUBLE)
             END, 6) AS f1,
       round(CASE WHEN _p > 0
             THEN CAST(_apn AS DOUBLE) / (1e9 * CAST(_p AS DOUBLE)) END, 6) AS ap
FROM g4
ORDER BY score
"""


def brier_report(spark, sf, scorer="stop_density"):
    """Brier score + Murphy decomposition (X103 — Brier 1950 mean
    squared probability error; Murphy 1973 REL − RES + UNC split over
    forecast bins: reliability = how far each bin's observed rate sits
    from its forecast, resolution = how much the bins separate from the
    base rate, uncertainty = ō(1−ō) — the standard decomposition for
    judging a probability forecast before it gates a corpus). Forecast
    p = score/1000 with the X95/X99 en-stopword per-mille scorer vs the
    lang=='en' label; bins are the distinct forecast values (≤1001).
    N·10⁶·Brier is EXACTLY Σ_k (n_k s_k² − 2000 s_k pos_k + 10⁶ pos_k)
    — a pure-BIGINT sum off the per-score count frame (y² = y). REL/RES
    per-bin terms are IEEE doubles of exact BIGINTs, nano-quantized so
    their sums are order-independent; UNC and the decomposition gap
    (pins Brier = REL − RES + UNC to ≤ rounding noise) are 1-row
    arithmetic. Everything after the count frame is corpus-size-free.
    The scale-spot drill passes scorer='len_bucket' (X99's contract —
    the hex spot fixture has no English stopwords).
    Reference analog: none — rebuild-only (SURVEY §2.13)."""
    from .functions.text import STOPWORDS, _word_hits, whitespace_token_count

    d = t(spark, sf, "documents")
    if scorer == "len_bucket":
        base = d.select(
            (F.col("lang") == "en").cast("long").alias("_y"),
            F.least(F.expr("n_chars DIV 4").cast("long"), F.lit(1000).cast("long"))
            .alias("score"),
        )
    else:
        toks = whitespace_token_count(F.col("text"))
        hits = _word_hits(F.col("text"), STOPWORDS["en"]).cast("long")
        base = d.select(
            (F.col("lang") == "en").cast("long").alias("_y"),
            F.when(toks > 0, hits * F.lit(1000)).otherwise(F.lit(0))
            .cast("long")
            .alias("_h1000"),
            F.greatest(toks, F.lit(1)).cast("long").alias("_toks"),
        ).select("_y", F.expr("_h1000 DIV _toks").cast("long").alias("score"))
    c = base.groupBy("score").agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum("_y").cast("long").alias("_pos"),
    )
    wall = W.partitionBy()
    g = c.select(
        "*",
        F.sum("_n").over(wall).cast("long").alias("_nt"),
        F.sum("_pos").over(wall).cast("long").alias("_pt"),
    )
    obar = F.col("_pt").cast("double") / F.col("_nt").cast("double")
    rel_term = (
        (F.col("score") * F.col("_n") - F.lit(1000) * F.col("_pos")).cast("double")
        * (F.col("score") * F.col("_n") - F.lit(1000) * F.col("_pos")).cast("double")
        / (F.lit(1e6) * F.col("_n").cast("double"))
    )
    res_term = (
        F.col("_n").cast("double")
        * (F.col("_pos").cast("double") / F.col("_n").cast("double") - obar)
        * (F.col("_pos").cast("double") / F.col("_n").cast("double") - obar)
    )
    a = g.groupBy("_nt", "_pt").agg(
        F.count(F.lit(1)).cast("long").alias("n_bins"),
        F.sum(
            F.expr("_n * score * score - 2000 * score * _pos + 1000000 * _pos")
        )
        .cast("long")
        .alias("_bsum"),
        F.sum(F.round(F.lit(1e9) * rel_term).cast("long")).cast("long").alias("_reln"),
        F.sum(F.round(F.lit(1e9) * res_term).cast("long")).cast("long").alias("_resn"),
    )
    nt = F.col("_nt").cast("double")
    ob = F.col("_pt").cast("double") / nt
    brier = F.col("_bsum").cast("double") / (nt * F.lit(1e6))
    rel = F.col("_reln").cast("double") / (F.lit(1e9) * nt)
    res = F.col("_resn").cast("double") / (F.lit(1e9) * nt)
    unc = ob * (F.lit(1.0) - ob)
    return a.select(
        F.col("_nt").alias("n_docs"),
        "n_bins",
        _r(ob).alias("base_rate"),
        _r(brier).alias("brier"),
        _r(rel).alias("reliability"),
        _r(res).alias("resolution"),
        _r(unc).alias("uncertainty"),
        _r(brier - (rel - res + unc)).alias("decomp_gap"),
    )


ORACLE_BRIER = rf"""
WITH base AS (
  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS _y,
         CASE WHEN length(trim(text)) = 0 THEN CAST(0 AS BIGINT)
              ELSE CAST((len(regexp_extract_all(lower(text), '\b({_SW_EN})\b')) * 1000)
                   // len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
              END AS score
  FROM documents
),
c AS (
  SELECT score, CAST(count(*) AS BIGINT) AS _n, CAST(sum(_y) AS BIGINT) AS _pos
  FROM base GROUP BY score
),
g AS (
  SELECT *,
         CAST(sum(_n) OVER () AS BIGINT) AS _nt,
         CAST(sum(_pos) OVER () AS BIGINT) AS _pt
  FROM c
),
a AS (
  SELECT _nt, _pt,
         CAST(count(*) AS BIGINT) AS n_bins,
         CAST(sum(_n * score * score - 2000 * score * _pos + 1000000 * _pos)
              AS BIGINT) AS _bsum,
         CAST(sum(CAST(round(1e9 *
              CAST(score * _n - 1000 * _pos AS DOUBLE)
              * CAST(score * _n - 1000 * _pos AS DOUBLE)
              / (1e6 * CAST(_n AS DOUBLE))) AS BIGINT)) AS BIGINT) AS _reln,
         CAST(sum(CAST(round(1e9 * CAST(_n AS DOUBLE)
              * (CAST(_pos AS DOUBLE) / CAST(_n AS DOUBLE)
                 - CAST(_pt AS DOUBLE) / CAST(_nt AS DOUBLE))
              * (CAST(_pos AS DOUBLE) / CAST(_n AS DOUBLE)
                 - CAST(_pt AS DOUBLE) / CAST(_nt AS DOUBLE))) AS BIGINT))
              AS BIGINT) AS _resn
  FROM g GROUP BY 1, 2
)
SELECT _nt AS n_docs, n_bins,
       round(CAST(_pt AS DOUBLE) / CAST(_nt AS DOUBLE), 6) AS base_rate,
       round(CAST(_bsum AS DOUBLE) / (CAST(_nt AS DOUBLE) * 1e6), 6) AS brier,
       round(CAST(_reln AS DOUBLE) / (1e9 * CAST(_nt AS DOUBLE)), 6) AS reliability,
       round(CAST(_resn AS DOUBLE) / (1e9 * CAST(_nt AS DOUBLE)), 6) AS resolution,
       round(CAST(_pt AS DOUBLE) / CAST(_nt AS DOUBLE)
             * (1.0 - CAST(_pt AS DOUBLE) / CAST(_nt AS DOUBLE)), 6) AS uncertainty,
       round(CAST(_bsum AS DOUBLE) / (CAST(_nt AS DOUBLE) * 1e6)
             - (CAST(_reln AS DOUBLE) / (1e9 * CAST(_nt AS DOUBLE))
                - CAST(_resn AS DOUBLE) / (1e9 * CAST(_nt AS DOUBLE))
                + CAST(_pt AS DOUBLE) / CAST(_nt AS DOUBLE)
                  * (1.0 - CAST(_pt AS DOUBLE) / CAST(_nt AS DOUBLE))), 6)
       AS decomp_gap
FROM a
"""


def kruskal_report(spark, sf):
    """Kruskal-Wallis rank ANOVA across sources (X104 — Kruskal & Wallis
    1952 H = 12/(N(N+1))·Σ R_g²/n_g − 3(N+1) over average ranks, with
    the tie-correction divisor 1 − Σ(t³−t)/(N³−N): exactly
    scipy.stats.kruskal — does document length differ by source? The
    k-sample extension of X95's Mann-Whitney). NO per-row rank join:
    pooled ranks live on the bounded n_chars value domain (average-rank
    ×2 = 2(cum−c)+c+1, X93's idiom, BIGINT-exact) and each source's rank
    sum is Σ cnt_{g,v}·rank2_v off the per-(source, value) count frame —
    both frames domain-sized whatever n. R_g²/n_g is an IEEE double of
    exact BIGINTs (rank sums overflow past ~2^31.5 docs; DECIMAL swap
    documented); the tie term Σ(t³−t) is BIGINT-exact to ~2M docs/value.
    Per-source rows carry the exact rank_sum2 plus the constant H / H_tc
    columns. Reference analog: none — rebuild-only (SURVEY §2.13)."""
    d = t(spark, sf, "documents").select(
        "source", F.col("n_chars").cast("long").alias("_v")
    )
    pv = d.groupBy("_v").agg(F.count(F.lit(1)).cast("long").alias("_c"))
    wcum = W.orderBy("_v").rowsBetween(W.unboundedPreceding, W.currentRow)
    r2 = pv.select(
        "_v",
        "_c",
        (F.lit(2) * (F.sum("_c").over(wcum) - F.col("_c")) + F.col("_c") + F.lit(1))
        .cast("long")
        .alias("_r2"),
    )
    sv = d.groupBy("source", "_v").agg(F.count(F.lit(1)).cast("long").alias("_cg"))
    g = (
        sv.join(F.broadcast(r2.select("_v", "_r2")), "_v")
        .groupBy("source")
        .agg(
            F.sum("_cg").cast("long").alias("n_docs"),
            F.sum(F.col("_cg") * F.col("_r2")).cast("long").alias("rank_sum2"),
        )
    )
    tot = pv.agg(
        F.sum("_c").cast("long").alias("_nt"),
        F.sum(F.expr("_c * _c * _c - _c")).cast("long").alias("_ties"),
    )
    wall = W.partitionBy()
    g = g.crossJoin(F.broadcast(tot)).select(
        "*",
        F.sum(
            F.col("rank_sum2").cast("double")
            * F.col("rank_sum2").cast("double")
            / (F.lit(4.0) * F.col("n_docs").cast("double"))
        )
        .over(wall)
        .alias("_s"),
        F.count(F.lit(1)).over(wall).cast("long").alias("n_groups"),
    )
    nt = F.col("_nt").cast("double")
    h = F.lit(12.0) / (nt * (nt + 1)) * F.col("_s") - F.lit(3.0) * (nt + 1)
    corr = F.lit(1.0) - F.col("_ties").cast("double") / (nt * nt * nt - nt)
    return g.select(
        "source",
        "n_docs",
        "rank_sum2",
        _r(
            F.col("rank_sum2").cast("double") / (F.lit(2.0) * F.col("n_docs").cast("double"))
        ).alias("mean_rank"),
        "n_groups",
        _r(h).alias("h_stat"),
        _r(F.when(corr > 0, h / corr)).alias("h_tie_corrected"),
    ).orderBy("source")


ORACLE_KRUSKAL = r"""
WITH d AS (
  SELECT source, CAST(n_chars AS BIGINT) AS _v FROM documents
),
pv AS (
  SELECT _v, CAST(count(*) AS BIGINT) AS _c FROM d GROUP BY 1
),
r2 AS (
  SELECT _v,
         CAST(2 * (sum(_c) OVER (ORDER BY _v ROWS UNBOUNDED PRECEDING) - _c)
              + _c + 1 AS BIGINT) AS _r2
  FROM pv
),
sv AS (
  SELECT source, _v, CAST(count(*) AS BIGINT) AS _cg FROM d GROUP BY 1, 2
),
g AS (
  SELECT source, CAST(sum(_cg) AS BIGINT) AS n_docs,
         CAST(sum(_cg * _r2) AS BIGINT) AS rank_sum2
  FROM sv JOIN r2 USING (_v) GROUP BY 1
),
tot AS (
  SELECT CAST(sum(_c) AS BIGINT) AS _nt,
         CAST(sum(_c * _c * _c - _c) AS BIGINT) AS _ties
  FROM pv
),
gg AS (
  SELECT g.*, tot._nt, tot._ties,
         sum(CAST(rank_sum2 AS DOUBLE) * CAST(rank_sum2 AS DOUBLE)
             / (4.0 * CAST(n_docs AS DOUBLE))) OVER () AS _s,
         CAST(count(*) OVER () AS BIGINT) AS n_groups
  FROM g CROSS JOIN tot
)
SELECT source, n_docs, rank_sum2,
       round(CAST(rank_sum2 AS DOUBLE) / (2.0 * CAST(n_docs AS DOUBLE)), 6)
         AS mean_rank,
       n_groups,
       round(12.0 / (CAST(_nt AS DOUBLE) * (CAST(_nt AS DOUBLE) + 1)) * _s
             - 3.0 * (CAST(_nt AS DOUBLE) + 1), 6) AS h_stat,
       round(CASE WHEN 1.0 - CAST(_ties AS DOUBLE)
                       / (CAST(_nt AS DOUBLE) * CAST(_nt AS DOUBLE) * CAST(_nt AS DOUBLE)
                          - CAST(_nt AS DOUBLE)) > 0
             THEN (12.0 / (CAST(_nt AS DOUBLE) * (CAST(_nt AS DOUBLE) + 1)) * _s
                   - 3.0 * (CAST(_nt AS DOUBLE) + 1))
                  / (1.0 - CAST(_ties AS DOUBLE)
                     / (CAST(_nt AS DOUBLE) * CAST(_nt AS DOUBLE) * CAST(_nt AS DOUBLE)
                        - CAST(_nt AS DOUBLE)))
             END, 6) AS h_tie_corrected
FROM gg
ORDER BY source
"""


def survival_report(spark, sf):
    """Kaplan-Meier survival + Nelson-Aalen cumulative hazard over
    session durations (X105 — Kaplan & Meier 1958 product-limit
    S(t) = Π_{t_i≤t} (1 − d_i/n_i); Nelson 1972 / Aalen 1978
    H(t) = Σ d_i/n_i — THE estimators for right-censored durations;
    here: how long do user sessions survive, with sessions still open at
    the observation horizon right-censored). Sessions reuse
    user_sessions' exact gap-1800s semantics (lag + cumulative-sum
    windows, integer-microsecond arithmetic); a session whose last event
    lies within one gap of the global max timestamp is censored — the
    deterministic horizon rule. Durations (whole seconds, integer DIV)
    collapse map-side to a bounded domain frame; at-risk counts are ONE
    descending-cumulative window (censored-at-t at risk for deaths at t,
    the standard tie convention); per-step ln(1−d/n) and d/n are IEEE
    doubles of exact BIGINTs nano-quantized (the X97 exp/nano precedent)
    so the cumulative log-survival is an order-independent BIGINT; after
    the step where d == n survival is exactly 0 (zero-factor flag, no
    ln(0)). Reference analog: none — rebuild-only (SURVEY §2.13)."""
    e = t(spark, sf, "events").select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("_us"),
    )
    w = W.partitionBy("user_id").orderBy("_us", "event_id")
    gap = 1_800_000_000
    f = (
        F.when(
            F.lag("_us").over(w).isNull()
            | (F.col("_us") - F.lag("_us").over(w) > gap),
            1,
        )
        .otherwise(0)
        .alias("_f")
    )
    sess = (
        e.select("user_id", "_us", "event_id", f)
        .select(
            "user_id",
            "_us",
            F.sum("_f")
            .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
            .cast("long")
            .alias("_sid"),
        )
        .groupBy("user_id", "_sid")
        .agg(F.min("_us").alias("_s0"), F.max("_us").alias("_s1"))
    )
    gmax = sess.agg(F.max("_s1").alias("_gmax"))
    s = sess.crossJoin(F.broadcast(gmax)).select(
        F.expr("(_s1 - _s0) DIV 1000000").cast("long").alias("duration_s"),
        (F.col("_gmax") - F.col("_s1") < gap).cast("long").alias("_cens"),
    )
    cnt = s.groupBy("duration_s").agg(
        F.sum(F.lit(1) - F.col("_cens")).cast("long").alias("n_died"),
        F.sum("_cens").cast("long").alias("n_censored"),
    )
    wdesc = (
        W.orderBy(F.col("duration_s").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    g = cnt.select(
        "*",
        F.sum(F.col("n_died") + F.col("n_censored"))
        .over(wdesc)
        .cast("long")
        .alias("n_at_risk"),
    )
    ln_term = F.when(
        (F.col("n_died") > 0) & (F.col("n_at_risk") > F.col("n_died")),
        F.round(
            F.lit(1e9)
            * F.log(
                (F.col("n_at_risk") - F.col("n_died")).cast("double")
                / F.col("n_at_risk").cast("double")
            )
        ),
    ).otherwise(F.lit(0))
    na_term = F.round(
        F.lit(1e9) * F.col("n_died").cast("double") / F.col("n_at_risk").cast("double")
    )
    zf = F.when(
        (F.col("n_died") > 0) & (F.col("n_died") == F.col("n_at_risk")), 1
    ).otherwise(0)
    wasc = W.orderBy("duration_s").rowsBetween(W.unboundedPreceding, W.currentRow)
    g = g.select(
        "*",
        F.sum(ln_term.cast("long")).over(wasc).cast("long").alias("_lnn"),
        F.sum(na_term.cast("long")).over(wasc).cast("long").alias("_nan"),
        F.max(zf).over(wasc).alias("_zf"),
    )
    return g.select(
        "duration_s",
        "n_died",
        "n_censored",
        "n_at_risk",
        F.when(F.col("_zf") == 0, F.col("_lnn")).cast("long").alias("km_ln_nano"),
        _r(
            F.when(F.col("_zf") == 1, F.lit(0.0)).otherwise(
                F.exp(F.col("_lnn").cast("double") / F.lit(1e9))
            )
        ).alias("km_survival"),
        _r(F.col("_nan").cast("double") / F.lit(1e9)).alias("na_cumhaz"),
    ).orderBy("duration_s")


ORACLE_SURVIVAL = r"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS _us FROM events
),
flagged AS (
  SELECT user_id, _us,
         CASE WHEN lag(_us) OVER w IS NULL
                   OR _us - lag(_us) OVER w > 1800000000 THEN 1 ELSE 0 END AS _f
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY _us, event_id)
),
sess AS (
  SELECT user_id,
         CAST(sum(_f) OVER (PARTITION BY user_id ORDER BY _us
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS _sid,
         _us
  FROM flagged
),
agg AS (
  SELECT user_id, _sid, min(_us) AS _s0, max(_us) AS _s1
  FROM sess GROUP BY 1, 2
),
s AS (
  SELECT CAST((_s1 - _s0) // 1000000 AS BIGINT) AS duration_s,
         CASE WHEN (SELECT max(_s1) FROM agg) - _s1 < 1800000000
              THEN 1 ELSE 0 END AS _cens
  FROM agg
),
cnt AS (
  SELECT duration_s,
         CAST(sum(1 - _cens) AS BIGINT) AS n_died,
         CAST(sum(_cens) AS BIGINT) AS n_censored
  FROM s GROUP BY 1
),
g AS (
  SELECT *,
         CAST(sum(n_died + n_censored) OVER (ORDER BY duration_s DESC
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_at_risk
  FROM cnt
),
g2 AS (
  SELECT *,
         CAST(sum(CASE WHEN n_died > 0 AND n_at_risk > n_died
              THEN CAST(round(1e9 * ln(CAST(n_at_risk - n_died AS DOUBLE)
                                       / CAST(n_at_risk AS DOUBLE))) AS BIGINT)
              ELSE 0 END) OVER wa AS BIGINT) AS _lnn,
         CAST(sum(CAST(round(1e9 * CAST(n_died AS DOUBLE)
                             / CAST(n_at_risk AS DOUBLE)) AS BIGINT))
              OVER wa AS BIGINT) AS _nan,
         max(CASE WHEN n_died > 0 AND n_died = n_at_risk THEN 1 ELSE 0 END)
              OVER wa AS _zf
  FROM g
  WINDOW wa AS (ORDER BY duration_s ROWS UNBOUNDED PRECEDING)
)
SELECT duration_s, n_died, n_censored, n_at_risk,
       CASE WHEN _zf = 0 THEN _lnn END AS km_ln_nano,
       round(CASE WHEN _zf = 1 THEN 0.0
             ELSE exp(CAST(_lnn AS DOUBLE) / 1e9) END, 6) AS km_survival,
       round(CAST(_nan AS DOUBLE) / 1e9, 6) AS na_cumhaz
FROM g2
ORDER BY duration_s
"""


def kappa_report(spark, sf):
    """Cohen's kappa for the language-ID heuristic (X106 — Cohen 1960
    κ = (p_o − p_e)/(1 − p_e), chance-corrected agreement between the
    lang_id_scores prediction and the true lang label: the
    inter-annotator-agreement statistic quality-labeling pipelines
    report beyond raw accuracy/A20's confusion matrix). Multiclass,
    NULL predictions mapped to a literal 'und' class on both engines.
    EXACT integers end-to-end: κ = (N·Σ n_kk − Σ r_k·c_k)/(N² − Σ
    r_k·c_k) off the ≤(|langs|+1)² cell frame (map-side combined),
    row/col marginals full-outer-joined per class; the only float is
    the final 1-row division (and p_o, p_e as 6dp views of the same
    integers). Exact while N² < 2^63 (~3e9 docs; DECIMAL swap beyond).
    Reference analog: none — rebuild-only (SURVEY §2.13)."""
    d = t(spark, sf, "documents")
    p = d.select(
        "lang",
        F.coalesce(lang_id_scores(F.col("text"))["lang_pred"], F.lit("und")).alias(
            "_pred"
        ),
    )
    cell = p.groupBy("lang", "_pred").agg(F.count(F.lit(1)).cast("long").alias("_c"))
    rowm = cell.groupBy(F.col("lang").alias("_k")).agg(
        F.sum("_c").cast("long").alias("_r")
    )
    colm = cell.groupBy(F.col("_pred").alias("_k")).agg(
        F.sum("_c").cast("long").alias("_cn")
    )
    marg = (
        rowm.join(colm, "_k", "full")
        .fillna(0, ["_r", "_cn"])
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.sum(F.col("_r") * F.col("_cn")).cast("long").alias("_pe_num"),
        )
    )
    tot = cell.agg(
        F.sum("_c").cast("long").alias("n_docs"),
        F.sum(F.when(F.col("lang") == F.col("_pred"), F.col("_c")).otherwise(0))
        .cast("long")
        .alias("observed_agree"),
    )
    j = tot.crossJoin(F.broadcast(marg))
    nd = F.col("n_docs").cast("double")
    po = F.col("observed_agree").cast("double") / nd
    pe = F.col("_pe_num").cast("double") / (nd * nd)
    num = (
        F.col("n_docs") * F.col("observed_agree") - F.col("_pe_num")
    ).cast("double")
    den = (F.col("n_docs") * F.col("n_docs") - F.col("_pe_num")).cast("double")
    return j.select(
        "n_docs",
        "n_classes",
        "observed_agree",
        F.col("_pe_num").alias("expected_num"),
        _r(po).alias("p_observed"),
        _r(pe).alias("p_expected"),
        _r(F.when(den != 0, num / den)).alias("kappa"),
    )


def _oracle_kappa() -> str:
    cols, chain = _langid_pred_sql()
    return f"""
WITH s AS (
  SELECT lang,
         {cols}
  FROM documents
),
p AS (
  SELECT lang, coalesce({chain}, 'und') AS _pred FROM s
),
cell AS (
  SELECT lang, _pred, CAST(count(*) AS BIGINT) AS _c FROM p GROUP BY 1, 2
),
rowm AS (
  SELECT lang AS _k, CAST(sum(_c) AS BIGINT) AS _r FROM cell GROUP BY 1
),
colm AS (
  SELECT _pred AS _k, CAST(sum(_c) AS BIGINT) AS _cn FROM cell GROUP BY 1
),
marg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_classes,
         CAST(sum(coalesce(_r, 0) * coalesce(_cn, 0)) AS BIGINT) AS _pe_num
  FROM rowm FULL OUTER JOIN colm USING (_k)
),
tot AS (
  SELECT CAST(sum(_c) AS BIGINT) AS n_docs,
         CAST(sum(CASE WHEN lang = _pred THEN _c ELSE 0 END) AS BIGINT)
           AS observed_agree
  FROM cell
)
SELECT n_docs, n_classes, observed_agree, _pe_num AS expected_num,
       round(CAST(observed_agree AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)
         AS p_observed,
       round(CAST(_pe_num AS DOUBLE)
             / (CAST(n_docs AS DOUBLE) * CAST(n_docs AS DOUBLE)), 6) AS p_expected,
       round(CASE WHEN CAST(n_docs * n_docs - _pe_num AS DOUBLE) != 0
             THEN CAST(n_docs * observed_agree - _pe_num AS DOUBLE)
                  / CAST(n_docs * n_docs - _pe_num AS DOUBLE) END, 6) AS kappa
FROM tot CROSS JOIN marg
"""


def ca_trend_report(spark, sf):
    """Cochran-Armitage trend test (X107 — Cochran 1954 / Armitage 1955:
    is a binary rate a monotone function of an ordered category? Here:
    does the share of English documents trend with the length bucket —
    the dose-response audit for a labeled corpus). Buckets k = n_chars
    DIV 256 capped at 127 with integer scores s=k; the corpus collapses
    map-side to the per-bucket (n_k, r_k) frame. With A = Σs·r, B =
    Σs·n, C = Σs²·n (all BIGINT-exact; N·C < 2^63 to ~50M docs, DECIMAL
    swap documented): T's exact numerator is N·A − R·B and
    Z = (N·A − R·B)/sqrt(R(N−R)(N·C − B²)/N) — one double sqrt of exact
    BIGINTs at the end. Everything after the count frame is a 1-row
    computation. Reference analog: none — rebuild-only (SURVEY §2.13)."""
    d = t(spark, sf, "documents")
    base = d.select(
        (F.col("lang") == "en").cast("long").alias("_y"),
        F.least(F.expr("n_chars DIV 256"), F.lit(127)).cast("long").alias("_k"),
    )
    c = base.groupBy("_k").agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum("_y").cast("long").alias("_r"),
    )
    a = c.agg(
        F.sum("_n").cast("long").alias("n_docs"),
        F.sum("_r").cast("long").alias("n_pos"),
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.sum(F.col("_k") * F.col("_r")).cast("long").alias("s_r_sum"),
        F.sum(F.col("_k") * F.col("_n")).cast("long").alias("s_n_sum"),
        F.sum(F.col("_k") * F.col("_k") * F.col("_n")).cast("long").alias("s2_n_sum"),
    )
    tn = (
        F.col("n_docs") * F.col("s_r_sum") - F.col("n_pos") * F.col("s_n_sum")
    ).cast("long")
    var_num = (
        F.col("n_pos").cast("double")
        * (F.col("n_docs") - F.col("n_pos")).cast("double")
        * (
            F.col("n_docs") * F.col("s2_n_sum")
            - F.col("s_n_sum") * F.col("s_n_sum")
        ).cast("double")
        / F.col("n_docs").cast("double")
    )
    return a.select(
        "n_docs",
        "n_pos",
        "n_buckets",
        "s_r_sum",
        "s_n_sum",
        "s2_n_sum",
        tn.alias("t_num"),
        _r(F.when(var_num > 0, tn.cast("double") / F.sqrt(var_num))).alias("z_ca"),
    )


ORACLE_CA_TREND = r"""
WITH base AS (
  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS _y,
         CAST(least(n_chars // 256, 127) AS BIGINT) AS _k
  FROM documents
),
c AS (
  SELECT _k, CAST(count(*) AS BIGINT) AS _n, CAST(sum(_y) AS BIGINT) AS _r
  FROM base GROUP BY 1
),
a AS (
  SELECT CAST(sum(_n) AS BIGINT) AS n_docs,
         CAST(sum(_r) AS BIGINT) AS n_pos,
         CAST(count(*) AS BIGINT) AS n_buckets,
         CAST(sum(_k * _r) AS BIGINT) AS s_r_sum,
         CAST(sum(_k * _n) AS BIGINT) AS s_n_sum,
         CAST(sum(_k * _k * _n) AS BIGINT) AS s2_n_sum
  FROM c
)
SELECT n_docs, n_pos, n_buckets, s_r_sum, s_n_sum, s2_n_sum,
       CAST(n_docs * s_r_sum - n_pos * s_n_sum AS BIGINT) AS t_num,
       round(CASE WHEN CAST(n_pos AS DOUBLE) * CAST(n_docs - n_pos AS DOUBLE)
                       * CAST(n_docs * s2_n_sum - s_n_sum * s_n_sum AS DOUBLE)
                       / CAST(n_docs AS DOUBLE) > 0
             THEN CAST(n_docs * s_r_sum - n_pos * s_n_sum AS DOUBLE)
                  / sqrt(CAST(n_pos AS DOUBLE) * CAST(n_docs - n_pos AS DOUBLE)
                         * CAST(n_docs * s2_n_sum - s_n_sum * s_n_sum AS DOUBLE)
                         / CAST(n_docs AS DOUBLE))
             END, 6) AS z_ca
FROM a
"""


def gains_report(spark, sf, scorer="stop_density"):
    """Cumulative-gains / lift deciles (X108 — the gains chart + lift
    curve of classical data mining (e.g. Witten & Frank ch.5; the
    model-targeting audit: rank the corpus by a score, what share of
    positives sits in the top k/10?). Scorer/label reuse X95/X99. The
    corpus collapses map-side to the per-score (n, pos) frame; a
    descending-cumulative window gives each score value its rank
    interval (lo, hi]; decile boundaries b_d = d·N DIV 10 partition the
    rank line EXACTLY, each value's docs split across deciles by pure
    BIGINT interval overlap, and ties inside a value distribute
    positives proportionally — pos_nano = round(1e9·pos·docs_vd/n_v),
    the tie-averaging convention, nano-quantized so decile sums are
    order-independent. Gain_d = cumΣpos/(P), lift_d = gain_d·N/cumΣn —
    per-row divisions of exact BIGINTs, 6dp. The value×decile frame is
    ≤1001×10 rows whatever n. The scale-spot drill passes
    scorer='len_bucket' (X99's contract — the hex spot fixture has no
    English stopwords). Reference analog: none — rebuild-only
    (SURVEY §2.13)."""
    from .functions.text import STOPWORDS, _word_hits, whitespace_token_count

    d = t(spark, sf, "documents")
    if scorer == "len_bucket":
        base = d.select(
            (F.col("lang") == "en").cast("long").alias("_y"),
            F.least(F.expr("n_chars DIV 4").cast("long"), F.lit(1000).cast("long"))
            .alias("score"),
        )
    else:
        toks = whitespace_token_count(F.col("text"))
        hits = _word_hits(F.col("text"), STOPWORDS["en"]).cast("long")
        base = d.select(
            (F.col("lang") == "en").cast("long").alias("_y"),
            F.when(toks > 0, hits * F.lit(1000)).otherwise(F.lit(0))
            .cast("long")
            .alias("_h1000"),
            F.greatest(toks, F.lit(1)).cast("long").alias("_toks"),
        ).select("_y", F.expr("_h1000 DIV _toks").cast("long").alias("score"))
    c = base.groupBy("score").agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum("_y").cast("long").alias("_pos"),
    )
    wdesc = (
        W.orderBy(F.col("score").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wall = W.partitionBy()
    g = c.select(
        "score",
        "_n",
        "_pos",
        F.sum("_n").over(wdesc).cast("long").alias("_hi"),
        F.sum("_n").over(wall).cast("long").alias("_nt"),
        F.sum("_pos").over(wall).cast("long").alias("_pt"),
    ).select("*", (F.col("_hi") - F.col("_n")).cast("long").alias("_lo"))
    pairs = g.select(
        "*", F.explode(F.sequence(F.lit(1), F.lit(10))).alias("decile")
    ).select(
        "*",
        F.expr("(decile - 1) * _nt DIV 10").cast("long").alias("_b0"),
        F.expr("decile * _nt DIV 10").cast("long").alias("_b1"),
    )
    ov = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.col("_hi"), F.col("_b1")) - F.greatest(F.col("_lo"), F.col("_b0")),
    ).cast("long")
    pairs = pairs.select(
        "decile",
        "_nt",
        "_pt",
        ov.alias("_dv"),
        F.when(
            ov > 0,
            F.round(
                F.lit(1e9)
                * F.col("_pos").cast("double")
                * ov.cast("double")
                / F.col("_n").cast("double")
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("_pn"),
    )
    dd = pairs.groupBy("decile", "_nt", "_pt").agg(
        F.sum("_dv").cast("long").alias("n_docs"),
        F.sum("_pn").cast("long").alias("pos_nano"),
    )
    wd = W.orderBy("decile").rowsBetween(W.unboundedPreceding, W.currentRow)
    dd = dd.select(
        "*",
        F.sum("n_docs").over(wd).cast("long").alias("cum_docs"),
        F.sum("pos_nano").over(wd).cast("long").alias("cum_pos_nano"),
    )
    return dd.select(
        "decile",
        "n_docs",
        "pos_nano",
        "cum_docs",
        "cum_pos_nano",
        _r(
            F.when(
                F.col("_pt") > 0,
                F.col("cum_pos_nano").cast("double")
                / (F.lit(1e9) * F.col("_pt").cast("double")),
            )
        ).alias("gain"),
        _r(
            F.when(
                (F.col("_pt") > 0) & (F.col("cum_docs") > 0),
                F.col("cum_pos_nano").cast("double")
                * F.col("_nt").cast("double")
                / (
                    F.lit(1e9)
                    * F.col("_pt").cast("double")
                    * F.col("cum_docs").cast("double")
                ),
            )
        ).alias("lift"),
    ).orderBy("decile")


ORACLE_GAINS = rf"""
WITH base AS (
  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS _y,
         CASE WHEN length(trim(text)) = 0 THEN CAST(0 AS BIGINT)
              ELSE CAST((len(regexp_extract_all(lower(text), '\b({_SW_EN})\b')) * 1000)
                   // len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
              END AS score
  FROM documents
),
c AS (
  SELECT score, CAST(count(*) AS BIGINT) AS _n, CAST(sum(_y) AS BIGINT) AS _pos
  FROM base GROUP BY score
),
g AS (
  SELECT *,
         CAST(sum(_n) OVER (ORDER BY score DESC ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS _hi,
         CAST(sum(_n) OVER () AS BIGINT) AS _nt,
         CAST(sum(_pos) OVER () AS BIGINT) AS _pt
  FROM c
),
g2 AS (
  SELECT *, CAST(_hi - _n AS BIGINT) AS _lo FROM g
),
pairs AS (
  SELECT g2.*, d.decile,
         CAST((d.decile - 1) * _nt // 10 AS BIGINT) AS _b0,
         CAST(d.decile * _nt // 10 AS BIGINT) AS _b1
  FROM g2 CROSS JOIN (SELECT CAST(unnest(generate_series(1, 10)) AS BIGINT)
                      AS decile) d
),
ov AS (
  SELECT decile, _nt, _pt,
         CAST(greatest(0, least(_hi, _b1) - greatest(_lo, _b0)) AS BIGINT) AS _dv,
         CASE WHEN greatest(0, least(_hi, _b1) - greatest(_lo, _b0)) > 0
              THEN CAST(round(1e9 * CAST(_pos AS DOUBLE)
                   * CAST(greatest(0, least(_hi, _b1) - greatest(_lo, _b0)) AS DOUBLE)
                   / CAST(_n AS DOUBLE)) AS BIGINT)
              ELSE 0 END AS _pn
  FROM pairs
),
dd AS (
  SELECT decile, _nt, _pt,
         CAST(sum(_dv) AS BIGINT) AS n_docs,
         CAST(sum(_pn) AS BIGINT) AS pos_nano
  FROM ov GROUP BY 1, 2, 3
),
dc AS (
  SELECT *,
         CAST(sum(n_docs) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS cum_docs,
         CAST(sum(pos_nano) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS cum_pos_nano
  FROM dd
)
SELECT decile, n_docs, pos_nano, cum_docs, cum_pos_nano,
       round(CASE WHEN _pt > 0
             THEN CAST(cum_pos_nano AS DOUBLE) / (1e9 * CAST(_pt AS DOUBLE))
             END, 6) AS gain,
       round(CASE WHEN _pt > 0 AND cum_docs > 0
             THEN CAST(cum_pos_nano AS DOUBLE) * CAST(_nt AS DOUBLE)
                  / (1e9 * CAST(_pt AS DOUBLE) * CAST(cum_docs AS DOUBLE))
             END, 6) AS lift
FROM dc
ORDER BY decile
"""


def fuzzy_link_report(spark, sf):
    """Blocked fuzzy record linkage (X109 — the Fellegi & Sunter 1969
    blocking + edit-distance compare shape every entity-resolution
    pipeline uses; Christen 2012 ch.4: block to kill the n² candidate
    space, then a cheap exact comparator inside blocks). Probes are a
    deterministic corruption of every 7th part's name (first vowel
    deleted — regexp, edit distance exactly 1 when a vowel exists);
    blocking key = the UNCHANGED last name word, so candidates per probe
    are ~N/|noun-vocab| rows, NEVER the full catalog — the tiny probe
    frame broadcasts, the catalog never shuffles (the X21 membership
    idiom). Inside a block the comparator is the codegen levenshtein
    (integer, engine-identical); survivors are lev ≤ 2 and the best
    match is the deterministic (distance, partkey) struct-min. n_cands
    per probe ships as the blocking-selectivity audit column.
    Reference analog: none — rebuild-only (SURVEY §2.13)."""
    p = t(spark, sf, "part").select("p_partkey", "p_name")
    probes = p.filter(F.col("p_partkey") % 7 == 0).select(
        F.col("p_partkey").alias("probe_key"),
        F.regexp_replace(F.col("p_name"), r"^([^aeiou]*)[aeiou]", r"$1").alias(
            "probe_name"
        ),
    )
    probes = probes.select(
        "probe_key",
        "probe_name",
        F.element_at(F.split(F.col("probe_name"), " "), -1).alias("_blk"),
    )
    cat = p.select(
        F.col("p_partkey").alias("_ck"),
        F.col("p_name").alias("_cname"),
        F.element_at(F.split(F.col("p_name"), " "), -1).alias("_blk"),
    )
    cand = (
        F.broadcast(probes)
        .join(cat, "_blk")
        .select(
            "probe_key",
            "probe_name",
            "_ck",
            F.levenshtein(F.col("probe_name"), F.col("_cname")).cast("long").alias(
                "_d"
            ),
        )
        .filter(F.col("_d") <= 2)
    )
    best = cand.groupBy("probe_key", "probe_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_candidates"),
        F.min(F.struct(F.col("_d").alias("d"), F.col("_ck").alias("k"))).alias("_b"),
    )
    return (
        probes.select("probe_key", "probe_name")
        .join(best, ["probe_key", "probe_name"], "left")
        .select(
            "probe_key",
            "probe_name",
            F.col("_b.k").cast("long").alias("match_key"),
            F.col("_b.d").cast("long").alias("lev_dist"),
            F.coalesce("n_candidates", F.lit(0)).cast("long").alias("n_candidates"),
        )
        .orderBy("probe_key")
    )


ORACLE_FUZZY_LINK = r"""
WITH probes AS (
  SELECT p_partkey AS probe_key,
         regexp_replace(p_name, '^([^aeiou]*)[aeiou]', '\1') AS probe_name
  FROM part WHERE p_partkey % 7 = 0
),
pb AS (
  SELECT probe_key, probe_name,
         string_split(probe_name, ' ')[-1] AS _blk
  FROM probes
),
cat AS (
  SELECT p_partkey AS _ck, p_name AS _cname,
         string_split(p_name, ' ')[-1] AS _blk
  FROM part
),
cand AS (
  SELECT probe_key, probe_name, _ck,
         CAST(levenshtein(probe_name, _cname) AS BIGINT) AS _d
  FROM pb JOIN cat USING (_blk)
  WHERE levenshtein(probe_name, _cname) <= 2
),
ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY probe_key ORDER BY _d, _ck) AS _rn,
         CAST(count(*) OVER (PARTITION BY probe_key) AS BIGINT) AS _nc
  FROM cand
)
SELECT pb.probe_key, pb.probe_name,
       CAST(r._ck AS BIGINT) AS match_key,
       CAST(r._d AS BIGINT) AS lev_dist,
       CAST(coalesce(r._nc, 0) AS BIGINT) AS n_candidates
FROM pb LEFT JOIN (SELECT * FROM ranked WHERE _rn = 1) r USING (probe_key)
ORDER BY pb.probe_key
"""


_MARKOV_ITERS = 20


def markov_report(spark, sf):
    """Event-type Markov chain: transition matrix + stationary
    distribution (X110 — the first-order Markov model of user behavior,
    Kemeny & Snell 1960; power iteration π_{k+1} = π_k P from uniform,
    the PageRank-without-teleport special case — which page-type do
    sessions settle into?). Consecutive per-user event pairs come from
    ONE lag window (the only data-bound leg, sessionize-shaped); counts
    combine map-side to the ≤|types|² cell frame. EVERYTHING else is
    integer: p_nano = (c·1e9 + rowtot/2) DIV rowtot (half-up), and all
    {_MARKOV_ITERS} power iterations run in nano BIGINTs — each step
    π_b = Σ_a (π_a·p_ab + 5e8) DIV 1e9 then an integer renormalization
    to Σ=1e9 (also absorbs substochastic mass loss from types with no
    outgoing edges). Products π·p ≤ 1e18 < 2^63; no float enters the
    result at all, so both engines produce bit-identical BIGINTs. The
    iteration frame is |types| rows — driver-scale-free.
    Reference analog: none — rebuild-only (SURVEY §2.13)."""
    e = t(spark, sf, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("_us"),
    )
    w = W.partitionBy("user_id").orderBy("_us", "event_id")
    pairs = e.select(
        F.lag("event_type").over(w).alias("_from"), F.col("event_type").alias("_to")
    ).filter(F.col("_from").isNotNull())
    c = pairs.groupBy("_from", "_to").agg(
        F.count(F.lit(1)).cast("long").alias("n_trans")
    )
    rt = c.groupBy("_from").agg(F.sum("n_trans").cast("long").alias("_rt"))
    trans = c.join(rt, "_from").select(
        "_from",
        "_to",
        "n_trans",
        F.expr("(n_trans * 1000000000 + _rt DIV 2) DIV _rt").cast("long").alias(
            "p_nano"
        ),
    )
    types = (
        c.select(F.col("_from").alias("_t"))
        .unionAll(c.select(F.col("_to").alias("_t")))
        .distinct()
    )
    nt = types.count()  # |types| is tiny and bounded — driver-side by design
    pi = types.select("_t", F.lit(1_000_000_000 // max(nt, 1)).cast("long").alias("_pi"))
    tr = trans.select("_from", "_to", "p_nano").localCheckpoint()
    for _ in range(_MARKOV_ITERS):
        nxt = (
            pi.join(tr, pi["_t"] == tr["_from"])
            .groupBy(F.col("_to").alias("_t"))
            .agg(
                F.sum(F.expr("(_pi * p_nano + 500000000) DIV 1000000000"))
                .cast("long")
                .alias("_raw")
            )
        )
        # keep every type in the frame (types with no inbound mass -> 0)
        # localCheckpoint is load-bearing twice over: `tot` re-references the
        # nxt subtree, so without truncation the plan DOUBLES per iteration
        # (2^20 analysis blow-up); and it pins the |types|-row frame so each
        # tiny iteration job starts from materialized rows, not a replay.
        nxt = (
            types.join(nxt, "_t", "left")
            .select("_t", F.coalesce("_raw", F.lit(0)).cast("long").alias("_raw"))
            .localCheckpoint(eager=True)
        )
        tot = nxt.agg(F.sum("_raw").cast("long").alias("_tot"))
        pi = nxt.crossJoin(F.broadcast(tot)).select(
            "_t",
            F.when(
                F.col("_tot") > 0, F.expr("(_raw * 1000000000) DIV _tot")
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("_pi"),
        )
    return (
        trans.join(pi.select(F.col("_t").alias("_from"), "_pi"), "_from")
        .select(
            F.col("_from").alias("from_type"),
            F.col("_to").alias("to_type"),
            "n_trans",
            "p_nano",
            F.col("_pi").alias("stat_from_nano"),
        )
        .orderBy("from_type", "to_type")
    )


def _oracle_markov() -> str:
    its = []
    prev = "pi0"
    for k in range(1, _MARKOV_ITERS + 1):
        its.append(
            f"""raw{k} AS MATERIALIZED (
  SELECT t._t,
         CAST(coalesce(sum(({prev}._pi * tr.p_nano + 500000000) // 1000000000), 0)
              AS BIGINT) AS _raw
  FROM types t
  LEFT JOIN tr ON tr._to = t._t
  LEFT JOIN {prev} ON {prev}._t = tr._from
  GROUP BY 1
),
pi{k} AS MATERIALIZED (
  SELECT _t,
         CAST(CASE WHEN (SELECT sum(_raw) FROM raw{k}) > 0
              THEN (_raw * 1000000000) // (SELECT sum(_raw) FROM raw{k})
              ELSE 0 END AS BIGINT) AS _pi
  FROM raw{k}
)"""
        )
        prev = f"pi{k}"
    chain = ",\n".join(its)
    return f"""
WITH e AS MATERIALIZED (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS _us FROM events
),
pairs AS MATERIALIZED (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY _us, event_id)
           AS _from,
         event_type AS _to
  FROM e
),
c AS MATERIALIZED (
  SELECT _from, _to, CAST(count(*) AS BIGINT) AS n_trans
  FROM pairs WHERE _from IS NOT NULL GROUP BY 1, 2
),
rt AS MATERIALIZED (
  SELECT _from, CAST(sum(n_trans) AS BIGINT) AS _rt FROM c GROUP BY 1
),
tr AS MATERIALIZED (
  SELECT c._from, c._to, n_trans,
         CAST((n_trans * 1000000000 + _rt // 2) // _rt AS BIGINT) AS p_nano
  FROM c JOIN rt ON c._from = rt._from
),
types AS MATERIALIZED (
  SELECT DISTINCT _t FROM (SELECT _from AS _t FROM c UNION ALL
                           SELECT _to AS _t FROM c)
),
pi0 AS MATERIALIZED (
  SELECT _t,
         CAST(1000000000 // greatest((SELECT count(*) FROM types), 1)
              AS BIGINT) AS _pi
  FROM types
),
{chain}
SELECT tr._from AS from_type, tr._to AS to_type, tr.n_trans, tr.p_nano,
       CAST(p._pi AS BIGINT) AS stat_from_nano
FROM tr JOIN {prev} p ON p._t = tr._from
ORDER BY from_type, to_type
"""


def anova_report(spark, sf):
    """One-way ANOVA F across sources (X111 — Fisher 1925 variance
    decomposition SST = SSB + SSW with F = (SSB/(k−1))/(SSW/(N−k)):
    exactly scipy.stats.f_oneway — does MEAN document length differ by
    source? The parametric complement to X104's rank-based
    Kruskal-Wallis). ONE map-side-combined groupBy collapses the corpus
    to the k-row (n_g, Σv, Σv²) frame — n_chars sums BIGINT-exact to
    ~9e14 chars/source, Σv² to ~9e10 rows at 10k chars; the grand
    totals ride a broadcast crossJoin exactly like X104. SSB =
    Σ S_g²/n_g − S²/N with each S_g²/n_g an IEEE double of exact
    BIGINTs (X104's precedent, same fixed association on both engines);
    SSW = Q − Σ S_g²/n_g off the exact Σv² — never a second pass over
    the data. Per-source rows carry the exact BIGINTs plus the constant
    F / eta² columns. Reference analog: none — rebuild-only
    (SURVEY §2.13)."""
    d = t(spark, sf, "documents").select(
        "source", F.col("n_chars").cast("long").alias("_v")
    )
    g = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_v").cast("long").alias("sum_v"),
        F.sum(F.expr("_v * _v")).cast("long").alias("sum_v2"),
    )
    wall = W.partitionBy()
    g = g.select(
        "*",
        F.sum("n_docs").over(wall).cast("long").alias("_nt"),
        F.sum("sum_v").over(wall).cast("long").alias("_st"),
        F.sum("sum_v2").over(wall).cast("long").alias("_qt"),
        F.count(F.lit(1)).over(wall).cast("long").alias("n_groups"),
        F.sum(
            F.col("sum_v").cast("double")
            * F.col("sum_v").cast("double")
            / F.col("n_docs").cast("double")
        )
        .over(wall)
        .alias("_sb"),
    )
    nt = F.col("_nt").cast("double")
    st = F.col("_st").cast("double")
    ssb = F.col("_sb") - st * st / nt
    ssw = F.col("_qt").cast("double") - F.col("_sb")
    sst = F.col("_qt").cast("double") - st * st / nt
    k = F.col("n_groups").cast("double")
    f_ok = (F.col("n_groups") > 1) & (F.col("_nt") > F.col("n_groups")) & (ssw > 0)
    return g.select(
        "source",
        "n_docs",
        "sum_v",
        "sum_v2",
        _r(F.col("sum_v").cast("double") / F.col("n_docs").cast("double")).alias(
            "mean_v"
        ),
        "n_groups",
        _r(ssb).alias("ss_between"),
        _r(ssw).alias("ss_within"),
        _r(F.when(f_ok, (ssb / (k - 1)) / (ssw / (nt - k)))).alias("f_stat"),
        _r(F.when(sst > 0, ssb / sst)).alias("eta_sq"),
    ).orderBy("source")


ORACLE_ANOVA = r"""
WITH d AS (
  SELECT source, CAST(n_chars AS BIGINT) AS _v FROM documents
),
g AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(_v) AS BIGINT) AS sum_v,
         CAST(sum(_v * _v) AS BIGINT) AS sum_v2
  FROM d GROUP BY 1
),
gg AS (
  SELECT g.*,
         CAST(sum(n_docs) OVER () AS BIGINT) AS _nt,
         CAST(sum(sum_v) OVER () AS BIGINT) AS _st,
         CAST(sum(sum_v2) OVER () AS BIGINT) AS _qt,
         CAST(count(*) OVER () AS BIGINT) AS n_groups,
         sum(CAST(sum_v AS DOUBLE) * CAST(sum_v AS DOUBLE)
             / CAST(n_docs AS DOUBLE)) OVER () AS _sb
  FROM g
)
SELECT source, n_docs, sum_v, sum_v2,
       round(CAST(sum_v AS DOUBLE) / CAST(n_docs AS DOUBLE), 6) AS mean_v,
       n_groups,
       round(_sb - CAST(_st AS DOUBLE) * CAST(_st AS DOUBLE)
                   / CAST(_nt AS DOUBLE), 6) AS ss_between,
       round(CAST(_qt AS DOUBLE) - _sb, 6) AS ss_within,
       round(CASE WHEN n_groups > 1 AND _nt > n_groups
                       AND CAST(_qt AS DOUBLE) - _sb > 0
             THEN ((_sb - CAST(_st AS DOUBLE) * CAST(_st AS DOUBLE)
                          / CAST(_nt AS DOUBLE)) / (CAST(n_groups AS DOUBLE) - 1))
                  / ((CAST(_qt AS DOUBLE) - _sb)
                     / (CAST(_nt AS DOUBLE) - CAST(n_groups AS DOUBLE)))
             END, 6) AS f_stat,
       round(CASE WHEN CAST(_qt AS DOUBLE) - CAST(_st AS DOUBLE) * CAST(_st AS DOUBLE)
                       / CAST(_nt AS DOUBLE) > 0
             THEN (_sb - CAST(_st AS DOUBLE) * CAST(_st AS DOUBLE) / CAST(_nt AS DOUBLE))
                  / (CAST(_qt AS DOUBLE) - CAST(_st AS DOUBLE) * CAST(_st AS DOUBLE)
                     / CAST(_nt AS DOUBLE))
             END, 6) AS eta_sq
FROM gg
ORDER BY source
"""


def mcnemar_report(spark, sf):
    """McNemar's paired test between two English-detectors (X112 —
    McNemar 1947 χ² = (b−c)²/(b+c) on the discordant pairs, plus the
    Edwards 1948 continuity-corrected (|b−c|−1)²/(b+c): THE test for
    "is classifier A better than B on the SAME items?", Dietterich
    1998's recommendation for comparing classifiers without retraining).
    Detector A = the X106 stopword lang-ID (argmax over per-lang hit
    counts, NULL→non-en); detector B = the bare keyword heuristic
    "contains the word 'the'" — truth is lang = 'en'. ONE scan; both
    predictions and the truth are codegen expressions; the corpus
    collapses map-side to the 4-cell discordance grid. χ²/accuracies
    are IEEE doubles of exact BIGINTs (one row). Reference analog:
    none — rebuild-only (SURVEY §2.13)."""
    d = t(spark, sf, "documents")
    truth = (F.col("lang") == "en").cast("int")
    pred_a = (
        F.coalesce(lang_id_scores(F.col("text"))["lang_pred"], F.lit("und")) == "en"
    ).cast("int")
    pred_b = F.lower(F.col("text")).rlike(r"\bthe\b").cast("int")
    p = d.select(
        (pred_a == truth).cast("long").alias("_a_ok"),
        (pred_b == truth).cast("long").alias("_b_ok"),
    )
    g = p.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.col("_a_ok") * F.col("_b_ok")).cast("long").alias("n_both"),
        F.sum(F.col("_a_ok") * (1 - F.col("_b_ok"))).cast("long").alias("n_a_only"),
        F.sum((1 - F.col("_a_ok")) * F.col("_b_ok")).cast("long").alias("n_b_only"),
        F.sum((1 - F.col("_a_ok")) * (1 - F.col("_b_ok")))
        .cast("long")
        .alias("n_neither"),
    )
    b = F.col("n_a_only").cast("double")
    c = F.col("n_b_only").cast("double")
    disc = F.col("n_a_only") + F.col("n_b_only")
    return g.select(
        "n_docs",
        "n_both",
        "n_a_only",
        "n_b_only",
        "n_neither",
        _r((F.col("n_both") + F.col("n_a_only")).cast("double")
           / F.col("n_docs").cast("double")).alias("acc_a"),
        _r((F.col("n_both") + F.col("n_b_only")).cast("double")
           / F.col("n_docs").cast("double")).alias("acc_b"),
        _r(F.when(disc > 0, (b - c) * (b - c) / (b + c))).alias("chi2"),
        _r(
            F.when(
                disc > 0,
                (F.abs(b - c) - 1) * (F.abs(b - c) - 1) / (b + c),
            )
        ).alias("chi2_cc"),
    )


def _oracle_mcnemar() -> str:
    cols, chain = _langid_pred_sql()
    return f"""
WITH s AS (
  SELECT lang, text,
         {cols}
  FROM documents
),
p AS (
  SELECT CASE WHEN (CASE WHEN coalesce({chain}, 'und') = 'en' THEN 1 ELSE 0 END)
                   = (CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
              THEN 1 ELSE 0 END AS _a_ok,
         CASE WHEN (CASE WHEN regexp_matches(lower(text), '\\bthe\\b')
                         THEN 1 ELSE 0 END)
                   = (CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
              THEN 1 ELSE 0 END AS _b_ok
  FROM s
),
g AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(_a_ok * _b_ok) AS BIGINT) AS n_both,
         CAST(sum(_a_ok * (1 - _b_ok)) AS BIGINT) AS n_a_only,
         CAST(sum((1 - _a_ok) * _b_ok) AS BIGINT) AS n_b_only,
         CAST(sum((1 - _a_ok) * (1 - _b_ok)) AS BIGINT) AS n_neither
  FROM p
)
SELECT n_docs, n_both, n_a_only, n_b_only, n_neither,
       round(CAST(n_both + n_a_only AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)
         AS acc_a,
       round(CAST(n_both + n_b_only AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)
         AS acc_b,
       round(CASE WHEN n_a_only + n_b_only > 0
             THEN (CAST(n_a_only AS DOUBLE) - CAST(n_b_only AS DOUBLE))
                  * (CAST(n_a_only AS DOUBLE) - CAST(n_b_only AS DOUBLE))
                  / (CAST(n_a_only AS DOUBLE) + CAST(n_b_only AS DOUBLE))
             END, 6) AS chi2,
       round(CASE WHEN n_a_only + n_b_only > 0
             THEN (abs(CAST(n_a_only AS DOUBLE) - CAST(n_b_only AS DOUBLE)) - 1)
                  * (abs(CAST(n_a_only AS DOUBLE) - CAST(n_b_only AS DOUBLE)) - 1)
                  / (CAST(n_a_only AS DOUBLE) + CAST(n_b_only AS DOUBLE))
             END, 6) AS chi2_cc
FROM g
"""


def wasserstein_report(spark, sf):
    """Per-source 1D Wasserstein-1 (earth mover's) distance to the
    pooled length distribution (X113 — Vaserstein 1969; for 1D ECDFs
    W₁ = ∫|F_g − F_pool| dv, exactly scipy.stats.wasserstein_distance:
    the drift metric that, unlike X92's KS sup-gap, weighs HOW FAR mass
    is displaced, not just the worst crossing — the standard
    dataset-shift monitor). The corpus collapses map-side to the
    per-(source, v) and per-v count frames on the bounded n_chars
    domain; the source×domain grid (crossJoined, both sides tiny) gets
    per-source and pooled cumulative windows; each inter-value gap
    contributes |cum_g·n_t − cum_t·n_g|·(v' − v) — BIGINT-exact while
    n_g·n_t·gap·|domain| < 2^63 (~2e5 docs/source at a 10⁴-wide
    domain; DECIMAL swap documented for cluster scale). The only float
    is the final per-source division by n_g·n_t. Reference analog:
    none — rebuild-only (SURVEY §2.13)."""
    d = t(spark, sf, "documents").select(
        "source", F.col("n_chars").cast("long").alias("_v")
    )
    pv = d.groupBy("_v").agg(F.count(F.lit(1)).cast("long").alias("_ct"))
    wv = W.orderBy("_v")
    pool = pv.select(
        "_v",
        F.sum("_ct").over(wv.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("long")
        .alias("_cumt"),
        (F.lead("_v").over(wv) - F.col("_v")).alias("_gap"),
    )
    sv = d.groupBy("source", "_v").agg(F.count(F.lit(1)).cast("long").alias("_cg"))
    srcs = sv.select("source").distinct()
    grid = (
        srcs.crossJoin(F.broadcast(pool))
        .join(sv, ["source", "_v"], "left")
        .select(
            "source",
            "_v",
            "_cumt",
            "_gap",
            F.coalesce("_cg", F.lit(0)).cast("long").alias("_cg"),
        )
    )
    ws = W.partitionBy("source").orderBy("_v").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    g = grid.select(
        "source",
        "_cumt",
        "_gap",
        F.sum("_cg").over(ws).cast("long").alias("_cumg"),
    )
    ng = sv.groupBy("source").agg(F.sum("_cg").cast("long").alias("n_docs"))
    tot = pv.agg(F.sum("_ct").cast("long").alias("_nt"))
    per = (
        g.join(F.broadcast(ng), "source")
        .crossJoin(F.broadcast(tot))
        .groupBy("source")
        .agg(
            F.max("n_docs").cast("long").alias("n_docs"),
            F.max("_nt").cast("long").alias("_nt"),
            F.sum(
                F.when(
                    F.col("_gap").isNotNull(),
                    F.abs(
                        F.col("_cumg") * F.col("_nt")
                        - F.col("_cumt") * F.col("n_docs")
                    )
                    * F.col("_gap"),
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("w1_num"),
        )
    )
    return per.select(
        "source",
        "n_docs",
        "w1_num",
        _r(
            F.col("w1_num").cast("double")
            / (F.col("n_docs").cast("double") * F.col("_nt").cast("double"))
        ).alias("w1"),
    ).orderBy("source")


ORACLE_WASSERSTEIN = r"""
WITH d AS (
  SELECT source, CAST(n_chars AS BIGINT) AS _v FROM documents
),
pv AS (
  SELECT _v, CAST(count(*) AS BIGINT) AS _ct FROM d GROUP BY 1
),
pool AS (
  SELECT _v,
         CAST(sum(_ct) OVER (ORDER BY _v ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS _cumt,
         lead(_v) OVER (ORDER BY _v) - _v AS _gap
  FROM pv
),
sv AS (
  SELECT source, _v, CAST(count(*) AS BIGINT) AS _cg FROM d GROUP BY 1, 2
),
srcs AS (
  SELECT DISTINCT source FROM sv
),
grid AS (
  SELECT s.source, p._v, p._cumt, p._gap,
         CAST(coalesce(sv._cg, 0) AS BIGINT) AS _cg
  FROM srcs s CROSS JOIN pool p
  LEFT JOIN sv ON sv.source = s.source AND sv._v = p._v
),
g AS (
  SELECT source, _cumt, _gap,
         CAST(sum(_cg) OVER (PARTITION BY source ORDER BY _v
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS _cumg
  FROM grid
),
ng AS (
  SELECT source, CAST(sum(_cg) AS BIGINT) AS n_docs FROM sv GROUP BY 1
),
tot AS (
  SELECT CAST(sum(_ct) AS BIGINT) AS _nt FROM pv
),
per AS (
  SELECT g.source, CAST(max(ng.n_docs) AS BIGINT) AS n_docs,
         CAST(max(tot._nt) AS BIGINT) AS _nt,
         CAST(sum(CASE WHEN g._gap IS NOT NULL
                  THEN abs(g._cumg * tot._nt - g._cumt * ng.n_docs) * g._gap
                  ELSE 0 END) AS BIGINT) AS w1_num
  FROM g JOIN ng ON ng.source = g.source CROSS JOIN tot
  GROUP BY 1
)
SELECT source, n_docs, w1_num,
       round(CAST(w1_num AS DOUBLE)
             / (CAST(n_docs AS DOUBLE) * CAST(_nt AS DOUBLE)), 6) AS w1
FROM per
ORDER BY source
"""


def apriori_report(spark, sf):
    """Association rules over per-user event-type baskets (X114 —
    Agrawal & Srikant 1994 Apriori support/confidence + the lift of
    Brin et al. 1997: which behaviors co-occur in the same users? The
    market-basket audit, run over sessions-as-baskets). Baskets are the
    per-user DISTINCT event-type sets (ONE distinct shuffle — the only
    data-bound leg); the pair frame is a per-user self-join with
    fan-out ≤ |types|²/2 per user (bounded whatever n, never a global
    cross join); every rule A→B over the ≤|types|² ordered pairs gets
    support = n_ab/N, confidence = n_ab/n_a, lift = n_ab·N/(n_a·n_b) —
    all IEEE doubles of exact BIGINT counts. No minimum-support prune:
    the itemset lattice is |types|-bounded, so the full rule table IS
    the deterministic output. Reference analog: none — rebuild-only
    (SURVEY §2.13)."""
    b = t(spark, sf, "events").select("user_id", "event_type").distinct()
    tot = b.agg(F.count_distinct("user_id").cast("long").alias("n_users"))
    c1 = b.groupBy(F.col("event_type").alias("_i")).agg(
        F.count(F.lit(1)).cast("long").alias("_n")
    )
    lhs = b.select("user_id", F.col("event_type").alias("_a"))
    rhs = b.select("user_id", F.col("event_type").alias("_b"))
    pairs = (
        lhs.join(rhs, "user_id")
        .filter(F.col("_a") != F.col("_b"))
        .groupBy("_a", "_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
    )
    j = (
        pairs.join(F.broadcast(c1.select(F.col("_i").alias("_a"),
                                         F.col("_n").alias("n_a"))), "_a")
        .join(F.broadcast(c1.select(F.col("_i").alias("_b"),
                                    F.col("_n").alias("n_b"))), "_b")
        .crossJoin(F.broadcast(tot))
    )
    nbl = F.col("n_users").cast("double")
    return j.select(
        F.col("_a").alias("antecedent"),
        F.col("_b").alias("consequent"),
        "n_users",
        "n_ab",
        "n_a",
        "n_b",
        _r(F.col("n_ab").cast("double") / nbl).alias("support"),
        _r(F.col("n_ab").cast("double") / F.col("n_a").cast("double")).alias(
            "confidence"
        ),
        _r(
            F.col("n_ab").cast("double")
            * nbl
            / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
        ).alias("lift"),
    ).orderBy("antecedent", "consequent")


ORACLE_APRIORI = r"""
WITH b AS (
  SELECT DISTINCT user_id, event_type FROM events
),
nb AS (
  SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM b
),
c1 AS (
  SELECT event_type AS _i, CAST(count(*) AS BIGINT) AS _n FROM b GROUP BY 1
),
pairs AS (
  SELECT l.event_type AS _a, r.event_type AS _b,
         CAST(count(*) AS BIGINT) AS n_ab
  FROM b l JOIN b r ON l.user_id = r.user_id AND l.event_type <> r.event_type
  GROUP BY 1, 2
)
SELECT p._a AS antecedent, p._b AS consequent, nb.n_users,
       p.n_ab, ca._n AS n_a, cb._n AS n_b,
       round(CAST(p.n_ab AS DOUBLE) / CAST(nb.n_users AS DOUBLE), 6)
         AS support,
       round(CAST(p.n_ab AS DOUBLE) / CAST(ca._n AS DOUBLE), 6) AS confidence,
       round(CAST(p.n_ab AS DOUBLE) * CAST(nb.n_users AS DOUBLE)
             / (CAST(ca._n AS DOUBLE) * CAST(cb._n AS DOUBLE)), 6) AS lift
FROM pairs p
CROSS JOIN nb
JOIN c1 ca ON ca._i = p._a
JOIN c1 cb ON cb._i = p._b
ORDER BY antecedent, consequent
"""


def cusum_report(spark, sf):
    """CUSUM changepoint detection over per-type daily event volume
    (X115 — Page 1954 cumulative sums; the offline single-changepoint
    locator argmax_k |Σ_{i≤k}(c_i − c̄)|, the mean-shift scan statistic
    behind every crawl-volume regression monitor). Events collapse
    map-side to the (type, epoch-day) count frame; the dense day grid
    (global [min,max] span × types, both tiny, sequence+explode off a
    1-row bounds frame) zero-fills silent days so a crawl outage IS a
    shift. EVERYTHING is BIGINT: the centered prefix scaled by D is
    cus_k = D·prefix_k − k·T exactly; the changepoint is the
    row_number=1 row under the explicit (|cus| DESC, day ASC) total
    order, the always-zero k=D endpoint excluded (kept only when D=1).
    Only mean_per_day is float. Reference analog: none — rebuild-only
    (SURVEY §2.13)."""
    e = t(spark, sf, "events").select(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias("_d"),
    )
    cnt = e.groupBy("event_type", "_d").agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    bounds = e.agg(F.min("_d").alias("_lo"), F.max("_d").alias("_hi"))
    days = bounds.select(F.explode(F.sequence("_lo", "_hi")).alias("_d"))
    types = cnt.select("event_type").distinct()
    grid = (
        types.crossJoin(F.broadcast(days))
        .join(cnt, ["event_type", "_d"], "left")
        .select(
            "event_type", "_d", F.coalesce("_c", F.lit(0)).cast("long").alias("_c")
        )
    )
    wt = W.partitionBy("event_type").orderBy("_d")
    p = grid.select(
        "event_type",
        "_d",
        F.sum("_c").over(wt.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("long")
        .alias("_pre"),
        F.row_number().over(wt).cast("long").alias("_k"),
        F.count(F.lit(1)).over(W.partitionBy("event_type")).cast("long").alias("_nd"),
        F.sum("_c").over(W.partitionBy("event_type")).cast("long").alias("_T"),
    )
    cus = p.select(
        "*",
        (F.col("_nd") * F.col("_pre") - F.col("_k") * F.col("_T"))
        .cast("long")
        .alias("_cus"),
    ).filter((F.col("_k") < F.col("_nd")) | (F.col("_nd") == 1))
    pick = cus.select(
        "*",
        F.row_number()
        .over(W.partitionBy("event_type").orderBy(F.abs("_cus").desc(), F.col("_d")))
        .alias("_rnk"),
    ).filter(F.col("_rnk") == 1)
    return pick.select(
        "event_type",
        F.col("_nd").alias("n_days"),
        F.col("_T").alias("n_events"),
        F.col("_d").alias("cp_day"),
        F.col("_k").alias("cp_k"),
        F.col("_cus").alias("cusum_scaled"),
        F.abs("_cus").alias("max_abs_cusum"),
        _r(F.col("_T").cast("double") / F.col("_nd").cast("double")).alias(
            "mean_per_day"
        ),
    ).orderBy("event_type")


ORACLE_CUSUM = r"""
WITH e AS (
  SELECT event_type,
         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS _d
  FROM events
),
cnt AS (
  SELECT event_type, _d, CAST(count(*) AS BIGINT) AS _c FROM e GROUP BY 1, 2
),
bounds AS (
  SELECT min(_d) AS _lo, max(_d) AS _hi FROM e
),
days AS (
  SELECT CAST(unnest(range(_lo, _hi + 1)) AS BIGINT) AS _d FROM bounds
),
types AS (
  SELECT DISTINCT event_type FROM cnt
),
grid AS (
  SELECT ty.event_type, dy._d, CAST(coalesce(c._c, 0) AS BIGINT) AS _c
  FROM types ty CROSS JOIN days dy
  LEFT JOIN cnt c ON c.event_type = ty.event_type AND c._d = dy._d
),
p AS (
  SELECT event_type, _d,
         CAST(sum(_c) OVER (PARTITION BY event_type ORDER BY _d
                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS _pre,
         CAST(row_number() OVER (PARTITION BY event_type ORDER BY _d)
              AS BIGINT) AS _k,
         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS _nd,
         CAST(sum(_c) OVER (PARTITION BY event_type) AS BIGINT) AS _T
  FROM grid
),
cus AS (
  SELECT *, CAST(_nd * _pre - _k * _T AS BIGINT) AS _cus
  FROM p WHERE _k < _nd OR _nd = 1
),
pick AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY abs(_cus) DESC, _d) AS _rnk
  FROM cus
)
SELECT event_type, _nd AS n_days, _T AS n_events, _d AS cp_day, _k AS cp_k,
       _cus AS cusum_scaled, abs(_cus) AS max_abs_cusum,
       round(CAST(_T AS DOUBLE) / CAST(_nd AS DOUBLE), 6) AS mean_per_day
FROM pick WHERE _rnk = 1
ORDER BY event_type
"""


_ACF_MAX_LAG = 14


def acf_report(spark, sf):
    """Autocorrelation function of per-type daily event volume at lags
    1..14 (X116 — Box & Jenkins 1970 ch.2 sample ACF r_h =
    Σ(c_t−c̄)(c_{t+h}−c̄)/Σ(c_t−c̄)², the seasonality/burst fingerprint
    read before any forecast is trusted; a weekly crawl cadence shows
    as an r_7 spike). The dense zero-filled day grid is X115's; the
    mean never becomes a float: dev_t = D·c_t − T makes every product
    (D·c_t−T)(D·c_{t+h}−T) BIGINT-exact (the D² scaling cancels in the
    ratio) — exact while (D·c_max)²·D < 2^63 (~1e5 events/day/type at
    a year span; DECIMAL swap documented). Lag pairs come from ONE
    equi-join of the domain-sized grid to a fresh-exprId copy on
    (type, day+lag) — day-domain-bounded whatever n; acf = num/den is
    the only float. Emits exact num/den BIGINTs per (type, lag) for
    hash strength. Reference analog: none — rebuild-only
    (SURVEY §2.13)."""
    e = t(spark, sf, "events").select(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias("_d"),
    )
    cnt = e.groupBy("event_type", "_d").agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    bounds = e.agg(F.min("_d").alias("_lo"), F.max("_d").alias("_hi"))
    days = bounds.select(F.explode(F.sequence("_lo", "_hi")).alias("_d"))
    types = cnt.select("event_type").distinct()
    grid = (
        types.crossJoin(F.broadcast(days))
        .join(cnt, ["event_type", "_d"], "left")
        .select(
            "event_type", "_d", F.coalesce("_c", F.lit(0)).cast("long").alias("_c")
        )
    )
    wt = W.partitionBy("event_type")
    dev = grid.select(
        "event_type",
        "_d",
        (
            F.count(F.lit(1)).over(wt).cast("long") * F.col("_c")
            - F.sum("_c").over(wt).cast("long")
        )
        .cast("long")
        .alias("_dev"),
        F.count(F.lit(1)).over(wt).cast("long").alias("_nd"),
    )
    den = dev.groupBy("event_type").agg(
        F.sum(F.expr("_dev * _dev")).cast("long").alias("acf_den"),
        F.max("_nd").cast("long").alias("n_days"),
    )
    lags = spark.range(1, _ACF_MAX_LAG + 1).select(F.col("id").cast("long").alias("lag"))
    a = dev.crossJoin(F.broadcast(lags)).select(
        "event_type", "lag", (F.col("_d") + F.col("lag")).alias("_dj"), "_dev"
    )
    b = dev.toDF(*dev.columns).select(  # fresh exprIds: self-join safe
        "event_type", F.col("_d").alias("_dj"), F.col("_dev").alias("_devb")
    )
    num = (
        a.join(b, ["event_type", "_dj"])
        .groupBy("event_type", "lag")
        .agg(F.sum(F.expr("_dev * _devb")).cast("long").alias("acf_num"))
    )
    return (
        num.join(F.broadcast(den), "event_type")
        .select(
            "event_type",
            "lag",
            "n_days",
            "acf_num",
            "acf_den",
            _r(
                F.when(
                    F.col("acf_den") != 0,
                    F.col("acf_num").cast("double") / F.col("acf_den").cast("double"),
                )
            ).alias("acf"),
        )
        .orderBy("event_type", "lag")
    )


ORACLE_ACF = rf"""
WITH e AS (
  SELECT event_type,
         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS _d
  FROM events
),
cnt AS (
  SELECT event_type, _d, CAST(count(*) AS BIGINT) AS _c FROM e GROUP BY 1, 2
),
bounds AS (
  SELECT min(_d) AS _lo, max(_d) AS _hi FROM e
),
days AS (
  SELECT CAST(unnest(range(_lo, _hi + 1)) AS BIGINT) AS _d FROM bounds
),
types AS (
  SELECT DISTINCT event_type FROM cnt
),
grid AS (
  SELECT ty.event_type, dy._d, CAST(coalesce(c._c, 0) AS BIGINT) AS _c
  FROM types ty CROSS JOIN days dy
  LEFT JOIN cnt c ON c.event_type = ty.event_type AND c._d = dy._d
),
dev AS (
  SELECT event_type, _d,
         CAST(count(*) OVER (PARTITION BY event_type) * _c
              - sum(_c) OVER (PARTITION BY event_type) AS BIGINT) AS _dev,
         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS _ndays
  FROM grid
),
den AS (
  SELECT event_type, CAST(sum(_dev * _dev) AS BIGINT) AS acf_den,
         CAST(max(_ndays) AS BIGINT) AS n_days
  FROM dev GROUP BY 1
),
lags AS (
  SELECT CAST(unnest(range(1, {_ACF_MAX_LAG + 1})) AS BIGINT) AS lag
),
num AS (
  SELECT a.event_type, l.lag,
         CAST(sum(a._dev * b._dev) AS BIGINT) AS acf_num
  FROM dev a
  CROSS JOIN lags l
  JOIN dev b ON b.event_type = a.event_type AND b._d = a._d + l.lag
  GROUP BY 1, 2
)
SELECT n.event_type, n.lag, d.n_days, n.acf_num, d.acf_den,
       round(CASE WHEN d.acf_den <> 0
             THEN CAST(n.acf_num AS DOUBLE) / CAST(d.acf_den AS DOUBLE)
             END, 6) AS acf
FROM num n JOIN den d ON d.event_type = n.event_type
ORDER BY n.event_type, n.lag
"""


# log10(1 + 1/d), d = 1..9, in nanos (hardcoded so NEITHER engine computes
# a transcendental — the only way the expected distribution is bit-identical)
_BENFORD_NANO = {
    1: 301_029_996,
    2: 176_091_259,
    3: 124_938_737,
    4: 96_910_013,
    5: 79_181_246,
    6: 66_946_790,
    7: 57_991_947,
    8: 51_152_522,
    9: 45_757_491,
}


def benford_report(spark, sf):
    """Benford first-digit audit over order totals (X117 — Newcomb 1881 /
    Benford 1938 P(d) = log10(1+1/d); Nigrini 2012's χ² + MAD tests, the
    standard forensic screen for fabricated or truncated monetary data —
    synthetic uniform prices FAIL it, which is itself the audit's point
    on this corpus). Prices become exact integer cents by the repo-wide
    money-2dp rule; the first significant digit is the first character
    of the cents string (×100 preserves the leading digit — no float
    log10 whose last ULP could flip a digit across engines); the corpus
    collapses map-side to the ≤9-row digit frame, zero-filled off a
    range(1,10) grid. Expected probs are hardcoded nano literals (no
    transcendental evaluated on either engine); each χ² term and the
    MAD numerator are doubles/BIGINTs of exact integers; χ²/MAD ride a
    window over the 9-row frame. Reference analog: none — rebuild-only
    (SURVEY §2.13)."""
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    d = (
        t(spark, sf, "orders")
        .select(cents.alias("_cents"))
        .filter(F.col("_cents") > 0)
        .select(F.substring(F.col("_cents").cast("string"), 1, 1).cast("long")
                .alias("digit"))
    )
    cnt = d.groupBy("digit").agg(F.count(F.lit(1)).cast("long").alias("_n"))
    digits = spark.range(1, 10).select(F.col("id").cast("long").alias("digit"))
    p_nano = F.element_at(
        F.array(*[F.lit(_BENFORD_NANO[i]) for i in range(1, 10)]),
        F.col("digit").cast("int"),
    ).cast("long")
    g = (
        digits.join(cnt, "digit", "left")
        .select(
            "digit",
            F.coalesce("_n", F.lit(0)).cast("long").alias("n_obs"),
            p_nano.alias("p_nano"),
        )
    )
    wall = W.partitionBy()
    g = g.select(
        "*",
        F.sum("n_obs").over(wall).cast("long").alias("_nt"),
    ).select(
        "*",
        (F.col("n_obs") * F.lit(1_000_000_000) - F.col("_nt") * F.col("p_nano"))
        .cast("long")
        .alias("_dev_nano"),
    )
    term = (
        F.col("_dev_nano").cast("double")
        * F.col("_dev_nano").cast("double")
        / (F.lit(1e9) * F.col("_nt").cast("double") * F.col("p_nano").cast("double"))
    )
    return (
        g.select(
            "*",
            F.sum(term).over(wall).alias("_chi2"),
            F.sum(F.abs("_dev_nano")).over(wall).cast("long").alias("_mad_num"),
        )
        .select(
            "digit",
            "n_obs",
            "p_nano",
            F.col("_nt").alias("n_orders"),
            "_dev_nano",
            _r(F.col("n_obs").cast("double") / F.col("_nt").cast("double")).alias(
                "obs_prop"
            ),
            _r(
                F.col("_nt").cast("double") * F.col("p_nano").cast("double") / F.lit(1e9)
            ).alias("exp_count"),
            _r(F.col("_chi2")).alias("chi2"),
            _r(
                F.col("_mad_num").cast("double")
                / (F.lit(9e9) * F.col("_nt").cast("double"))
            ).alias("mad"),
        )
        .orderBy("digit")
    )


def _oracle_benford() -> str:
    arr = ", ".join(str(_BENFORD_NANO[i]) for i in range(1, 10))
    return f"""
WITH d AS (
  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR),
                     1, 1) AS BIGINT) AS digit
  FROM orders
  WHERE CAST(round(o_totalprice * 100) AS BIGINT) > 0
),
cnt AS (
  SELECT digit, CAST(count(*) AS BIGINT) AS _n FROM d GROUP BY 1
),
digits AS (
  SELECT CAST(unnest(range(1, 10)) AS BIGINT) AS digit
),
p AS (
  SELECT dd.digit, CAST(coalesce(c._n, 0) AS BIGINT) AS n_obs,
         CAST(([{arr}])[dd.digit] AS BIGINT) AS p_nano
  FROM digits dd LEFT JOIN cnt c ON c.digit = dd.digit
),
g AS (
  SELECT *, CAST(sum(n_obs) OVER () AS BIGINT) AS _nt FROM p
),
g2 AS (
  SELECT *, CAST(n_obs * 1000000000 - _nt * p_nano AS BIGINT) AS _dev_nano
  FROM g
),
g3 AS (
  SELECT *,
         sum(CAST(_dev_nano AS DOUBLE) * CAST(_dev_nano AS DOUBLE)
             / (1e9 * CAST(_nt AS DOUBLE) * CAST(p_nano AS DOUBLE))) OVER ()
           AS _chi2,
         CAST(sum(abs(_dev_nano)) OVER () AS BIGINT) AS _mad_num
  FROM g2
)
SELECT digit, n_obs, p_nano, _nt AS n_orders, _dev_nano,
       round(CAST(n_obs AS DOUBLE) / CAST(_nt AS DOUBLE), 6) AS obs_prop,
       round(CAST(_nt AS DOUBLE) * CAST(p_nano AS DOUBLE) / 1e9, 6) AS exp_count,
       round(_chi2, 6) AS chi2,
       round(CAST(_mad_num AS DOUBLE) / (9e9 * CAST(_nt AS DOUBLE)), 6) AS mad
FROM g3
ORDER BY digit
"""


def mutual_info_report(spark, sf):
    """Mutual information between language and length bucket (X118 —
    Shannon 1948 I(X;Y) = Σ p(x,y)·log2(p(x,y)/(p(x)p(y))), plus the
    Strehl & Ghosh 2002 normalized MI = I/√(H(X)H(Y)) — the
    feature-dependence audit run before stratifying or balancing a
    corpus on correlated axes; kappa (X106) needs matching label sets,
    MI doesn't). The corpus collapses map-side to the
    ≤|langs|×|buckets| cell frame (bucket = n_chars DIV 100, bounded);
    marginals broadcast back; every cell term (n_xy/N)·log2(n_xy·N/
    (n_x·n_y)) is a double of exact BIGINTs nano-quantized to a BIGINT
    (the X90 discipline) so sums are order-independent and both engines
    agree bit-for-bit. Per-lang rows carry the lang's own MI
    contribution + exact marginals; I/H(X)/H(Y)/NMI ride as constant
    columns. Reference analog: none — rebuild-only (SURVEY §2.13)."""
    LOG2 = 0.6931471805599453  # ln 2, shared literal with the oracle
    d = t(spark, sf, "documents").select(
        "lang", F.expr("CAST(n_chars AS BIGINT) DIV 100").alias("_b")
    )
    cell = d.groupBy("lang", "_b").agg(F.count(F.lit(1)).cast("long").alias("_nxy"))
    nx = cell.groupBy("lang").agg(
        F.sum("_nxy").cast("long").alias("_nx"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
    )
    ny = cell.groupBy("_b").agg(F.sum("_nxy").cast("long").alias("_ny"))
    tot = cell.agg(F.sum("_nxy").cast("long").alias("_nt"))

    def h_nano(frame, cnt_col):
        p = F.col(cnt_col).cast("double") / F.col("_nt").cast("double")
        term = p * (F.log(p) / F.lit(LOG2))
        return (
            frame.crossJoin(F.broadcast(tot))
            .select(F.round(term * F.lit(1e9)).cast("long").alias("_tn"))
            .agg((-F.sum("_tn")).cast("long").alias("_h"))
        )

    hx = h_nano(nx.select("_nx"), "_nx").withColumnRenamed("_h", "hx_nano")
    hy = h_nano(ny.select("_ny"), "_ny").withColumnRenamed("_h", "hy_nano")
    arg = (
        F.col("_nxy").cast("double") * F.col("_nt").cast("double")
        / (F.col("_nx").cast("double") * F.col("_ny").cast("double"))
    )
    term = (
        F.col("_nxy").cast("double") / F.col("_nt").cast("double")
        * (F.log(arg) / F.lit(LOG2))
    )
    parts = (
        cell.join(F.broadcast(nx), "lang")
        .join(F.broadcast(ny), "_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "_nx",
            "n_cells",
            F.round(term * F.lit(1e9)).cast("long").alias("_tn"),
        )
        .groupBy("lang")
        .agg(
            F.max("_nx").cast("long").alias("n_docs"),
            F.max("n_cells").cast("long").alias("n_cells"),
            F.sum("_tn").cast("long").alias("mi_part_nano"),
        )
    )
    wall = W.partitionBy()
    g = (
        parts.crossJoin(F.broadcast(hx))
        .crossJoin(F.broadcast(hy))
        .crossJoin(F.broadcast(tot))
        .select(
            "*",
            F.sum("mi_part_nano").over(wall).cast("long").alias("mi_nano"),
        )
    )
    mi = F.col("mi_nano").cast("double") / F.lit(1e9)
    hxd = F.col("hx_nano").cast("double") / F.lit(1e9)
    hyd = F.col("hy_nano").cast("double") / F.lit(1e9)
    return g.select(
        "lang",
        "n_docs",
        "n_cells",
        "mi_part_nano",
        "mi_nano",
        "hx_nano",
        "hy_nano",
        F.col("_nt").alias("n_total"),
        _r(mi).alias("mi_bits"),
        _r(hxd).alias("h_lang_bits"),
        _r(hyd).alias("h_bucket_bits"),
        _r(
            F.when(
                (F.col("hx_nano") > 0) & (F.col("hy_nano") > 0),
                mi / F.sqrt(hxd * hyd),
            )
        ).alias("nmi"),
    ).orderBy("lang")


ORACLE_MUTUAL_INFO = r"""
WITH d AS (
  SELECT lang, CAST(n_chars AS BIGINT) // 100 AS _b FROM documents
),
cell AS (
  SELECT lang, _b, CAST(count(*) AS BIGINT) AS _nxy FROM d GROUP BY 1, 2
),
nx AS (
  SELECT lang, CAST(sum(_nxy) AS BIGINT) AS _nx,
         CAST(count(*) AS BIGINT) AS n_cells
  FROM cell GROUP BY 1
),
ny AS (
  SELECT _b, CAST(sum(_nxy) AS BIGINT) AS _ny FROM cell GROUP BY 1
),
tot AS (
  SELECT CAST(sum(_nxy) AS BIGINT) AS _nt FROM cell
),
hx AS (
  SELECT CAST(-sum(CAST(round((CAST(_nx AS DOUBLE) / CAST(_nt AS DOUBLE))
                   * (ln(CAST(_nx AS DOUBLE) / CAST(_nt AS DOUBLE))
                      / 0.6931471805599453) * 1e9) AS BIGINT)) AS BIGINT)
           AS hx_nano
  FROM nx CROSS JOIN tot
),
hy AS (
  SELECT CAST(-sum(CAST(round((CAST(_ny AS DOUBLE) / CAST(_nt AS DOUBLE))
                   * (ln(CAST(_ny AS DOUBLE) / CAST(_nt AS DOUBLE))
                      / 0.6931471805599453) * 1e9) AS BIGINT)) AS BIGINT)
           AS hy_nano
  FROM ny CROSS JOIN tot
),
parts AS (
  SELECT c.lang, CAST(max(nx._nx) AS BIGINT) AS n_docs,
         CAST(max(nx.n_cells) AS BIGINT) AS n_cells,
         CAST(sum(CAST(round((CAST(c._nxy AS DOUBLE) / CAST(tot._nt AS DOUBLE))
              * (ln(CAST(c._nxy AS DOUBLE) * CAST(tot._nt AS DOUBLE)
                    / (CAST(nx._nx AS DOUBLE) * CAST(ny._ny AS DOUBLE)))
                 / 0.6931471805599453) * 1e9) AS BIGINT)) AS BIGINT)
           AS mi_part_nano
  FROM cell c
  JOIN nx ON nx.lang = c.lang
  JOIN ny ON ny._b = c._b
  CROSS JOIN tot
  GROUP BY 1
),
g AS (
  SELECT p.*, hx.hx_nano, hy.hy_nano, tot._nt,
         CAST(sum(mi_part_nano) OVER () AS BIGINT) AS mi_nano
  FROM parts p CROSS JOIN hx CROSS JOIN hy CROSS JOIN tot
)
SELECT lang, n_docs, n_cells, mi_part_nano, mi_nano, hx_nano, hy_nano,
       _nt AS n_total,
       round(CAST(mi_nano AS DOUBLE) / 1e9, 6) AS mi_bits,
       round(CAST(hx_nano AS DOUBLE) / 1e9, 6) AS h_lang_bits,
       round(CAST(hy_nano AS DOUBLE) / 1e9, 6) AS h_bucket_bits,
       round(CASE WHEN hx_nano > 0 AND hy_nano > 0
             THEN (CAST(mi_nano AS DOUBLE) / 1e9)
                  / sqrt((CAST(hx_nano AS DOUBLE) / 1e9)
                         * (CAST(hy_nano AS DOUBLE) / 1e9))
             END, 6) AS nmi
FROM g
ORDER BY lang
"""


def theil_report(spark, sf):
    """Theil T inequality index of document lengths with the
    between/within-source decomposition (X119 — Theil 1967; Shorrocks
    1980 proved it the additively-decomposable inequality family's
    member: T = T_between + Σ (S_g/S)·T_g exactly, unlike X84's Gini
    which does NOT decompose — "is length inequality a between-source
    mix effect or within-source spread?"). Lengths collapse map-side to
    the per-(source, v) count frame on the bounded n_chars domain;
    every term (c·v/S)·ln(v·N/S) is a double of exact BIGINTs
    nano-quantized to BIGINT (X90 discipline, v=0 contributing the
    x·ln x → 0 limit) so sums are order-independent; the emitted
    decomposition gap pins Theil's identity to nano rounding noise
    (X103's precedent). Per-source rows carry n_g/S_g/T_g plus the
    constant totals. Reference analog: none — rebuild-only
    (SURVEY §2.13)."""
    d = t(spark, sf, "documents").select(
        "source", F.col("n_chars").cast("long").alias("_v")
    )
    sv = d.groupBy("source", "_v").agg(F.count(F.lit(1)).cast("long").alias("_c"))
    ng = sv.groupBy("source").agg(
        F.sum("_c").cast("long").alias("n_docs"),
        F.sum(F.expr("_c * _v")).cast("long").alias("sum_v"),
    )
    tot = ng.agg(
        F.sum("n_docs").cast("long").alias("_nt"),
        F.sum("sum_v").cast("long").alias("_st"),
    )

    def nano(expr):
        return F.round(expr * F.lit(1e9)).cast("long")

    cells = (
        sv.join(F.broadcast(ng), "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            # within-g term: (c·v/S_g)·ln(v·n_g/S_g); v=0 -> 0 (x ln x limit)
            F.when(
                F.col("_v") > 0,
                nano(
                    F.col("_c").cast("double")
                    * F.col("_v").cast("double")
                    / F.col("sum_v").cast("double")
                    * F.log(
                        F.col("_v").cast("double")
                        * F.col("n_docs").cast("double")
                        / F.col("sum_v").cast("double")
                    )
                ),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("_tw"),
            # direct total term: (c·v/S)·ln(v·N/S)
            F.when(
                F.col("_v") > 0,
                nano(
                    F.col("_c").cast("double")
                    * F.col("_v").cast("double")
                    / F.col("_st").cast("double")
                    * F.log(
                        F.col("_v").cast("double")
                        * F.col("_nt").cast("double")
                        / F.col("_st").cast("double")
                    )
                ),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("_tt"),
        )
        .groupBy("source")
        .agg(
            F.sum("_tw").cast("long").alias("theil_within_nano"),
            F.sum("_tt").cast("long").alias("_tt_part"),
        )
    )
    g = (
        ng.join(cells, "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "*",
            # between term: (S_g/S)·ln(S_g·N/(S·n_g))
            nano(
                F.col("sum_v").cast("double")
                / F.col("_st").cast("double")
                * F.log(
                    F.col("sum_v").cast("double")
                    * F.col("_nt").cast("double")
                    / (F.col("_st").cast("double") * F.col("n_docs").cast("double"))
                )
            ).alias("_tb"),
            # income-share-weighted within: (S_g/S)·T_g off the nano T_g
            F.round(
                F.col("sum_v").cast("double")
                / F.col("_st").cast("double")
                * F.col("theil_within_nano").cast("double")
            )
            .cast("long")
            .alias("_tww"),
        )
    )
    wall = W.partitionBy()
    g = g.select(
        "*",
        F.sum("_tt_part").over(wall).cast("long").alias("theil_total_nano"),
        F.sum("_tb").over(wall).cast("long").alias("theil_between_nano"),
        F.sum("_tww").over(wall).cast("long").alias("theil_within_sum_nano"),
    )
    return g.select(
        "source",
        "n_docs",
        "sum_v",
        "theil_within_nano",
        F.col("_tb").alias("between_term_nano"),
        "theil_total_nano",
        "theil_between_nano",
        "theil_within_sum_nano",
        _r(F.col("theil_total_nano").cast("double") / F.lit(1e9)).alias("theil_total"),
        (
            _r(
                (
                    F.col("theil_total_nano")
                    - F.col("theil_between_nano")
                    - F.col("theil_within_sum_nano")
                ).cast("double")
                / F.lit(1e9)
            )
            + F.lit(0.0)  # normalize -0.0 (engines disagree on its sign)
        ).alias("decomp_gap"),
    ).orderBy("source")


ORACLE_THEIL = r"""
WITH d AS (
  SELECT source, CAST(n_chars AS BIGINT) AS _v FROM documents
),
sv AS (
  SELECT source, _v, CAST(count(*) AS BIGINT) AS _c FROM d GROUP BY 1, 2
),
ng AS (
  SELECT source, CAST(sum(_c) AS BIGINT) AS n_docs,
         CAST(sum(_c * _v) AS BIGINT) AS sum_v
  FROM sv GROUP BY 1
),
tot AS (
  SELECT CAST(sum(n_docs) AS BIGINT) AS _nt, CAST(sum(sum_v) AS BIGINT) AS _st
  FROM ng
),
cells AS (
  SELECT sv.source,
         CAST(sum(CASE WHEN sv._v > 0 THEN CAST(round(
             CAST(sv._c AS DOUBLE) * CAST(sv._v AS DOUBLE)
             / CAST(ng.sum_v AS DOUBLE)
             * ln(CAST(sv._v AS DOUBLE) * CAST(ng.n_docs AS DOUBLE)
                  / CAST(ng.sum_v AS DOUBLE)) * 1e9) AS BIGINT)
             ELSE 0 END) AS BIGINT) AS theil_within_nano,
         CAST(sum(CASE WHEN sv._v > 0 THEN CAST(round(
             CAST(sv._c AS DOUBLE) * CAST(sv._v AS DOUBLE)
             / CAST(tot._st AS DOUBLE)
             * ln(CAST(sv._v AS DOUBLE) * CAST(tot._nt AS DOUBLE)
                  / CAST(tot._st AS DOUBLE)) * 1e9) AS BIGINT)
             ELSE 0 END) AS BIGINT) AS _tt_part
  FROM sv JOIN ng ON ng.source = sv.source CROSS JOIN tot
  GROUP BY 1
),
g AS (
  SELECT ng.*, c.theil_within_nano, c._tt_part, tot._nt, tot._st,
         CAST(round(CAST(ng.sum_v AS DOUBLE) / CAST(tot._st AS DOUBLE)
              * ln(CAST(ng.sum_v AS DOUBLE) * CAST(tot._nt AS DOUBLE)
                   / (CAST(tot._st AS DOUBLE) * CAST(ng.n_docs AS DOUBLE)))
              * 1e9) AS BIGINT) AS _tb,
         CAST(round(CAST(ng.sum_v AS DOUBLE) / CAST(tot._st AS DOUBLE)
              * CAST(c.theil_within_nano AS DOUBLE)) AS BIGINT) AS _tww
  FROM ng JOIN cells c ON c.source = ng.source CROSS JOIN tot
),
g2 AS (
  SELECT *,
         CAST(sum(_tt_part) OVER () AS BIGINT) AS theil_total_nano,
         CAST(sum(_tb) OVER () AS BIGINT) AS theil_between_nano,
         CAST(sum(_tww) OVER () AS BIGINT) AS theil_within_sum_nano
  FROM g
)
SELECT source, n_docs, sum_v, theil_within_nano, _tb AS between_term_nano,
       theil_total_nano, theil_between_nano, theil_within_sum_nano,
       round(CAST(theil_total_nano AS DOUBLE) / 1e9, 6) AS theil_total,
       round(CAST(theil_total_nano - theil_between_nano
                  - theil_within_sum_nano AS DOUBLE) / 1e9, 6) + 0.0
         AS decomp_gap
FROM g2
ORDER BY source
"""


def levene_report(spark, sf):
    """Brown-Forsythe variance-homogeneity test across sources (X120 —
    Levene 1960 via the median-centered variant of Brown & Forsythe
    1974, exactly scipy.stats.levene(center='median'): do sources
    differ in length SPREAD, not just mean? The robust precondition
    check behind X111's equal-variance assumption). Per-source medians
    come off the bounded (source, v) count frame (cum window, two-middle
    ×2 idiom so med2 = v_lo + v_hi stays BIGINT); the absolute
    deviations z2 = |2v − med2| are integers, so the one-way ANOVA on z
    (the test statistic) runs on X111's exact BIGINT moment machine —
    the ×2 scaling cancels in F. ONE extra domain-frame pass over
    X111's plan; never a second corpus scan. Per-source rows carry
    exact moment BIGINTs + the constant W statistic. Reference analog:
    none — rebuild-only (SURVEY §2.13)."""
    d = t(spark, sf, "documents").select(
        "source", F.col("n_chars").cast("long").alias("_v")
    )
    sv = d.groupBy("source", "_v").agg(F.count(F.lit(1)).cast("long").alias("_c"))
    wsrc = W.partitionBy("source").orderBy("_v").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    cum = sv.select(
        "source",
        "_v",
        "_c",
        F.sum("_c").over(wsrc).cast("long").alias("_cum"),
        F.sum("_c").over(W.partitionBy("source")).cast("long").alias("_n"),
    )
    # two-middle median ×2: lo at INTEGER rank (n+1) DIV 2, hi at
    # (n+2) DIV 2 (for odd n both ranks coincide — continuous /2 would
    # wrongly push hi one value up)
    rlo = F.expr("(_n + 1) DIV 2")
    rhi = F.expr("(_n + 2) DIV 2")
    med = (
        cum.select(
            "source",
            F.when(
                (F.col("_cum") - F.col("_c") < rlo) & (rlo <= F.col("_cum")),
                F.col("_v"),
            ).alias("_lo"),
            F.when(
                (F.col("_cum") - F.col("_c") < rhi) & (rhi <= F.col("_cum")),
                F.col("_v"),
            ).alias("_hi"),
        )
        .groupBy("source")
        .agg(
            (F.max("_lo") + F.max("_hi")).cast("long").alias("med2"),
        )
    )
    z = (
        sv.join(F.broadcast(med), "source")
        .select(
            "source",
            "med2",
            "_c",
            F.abs(F.lit(2) * F.col("_v") - F.col("med2")).cast("long").alias("_z"),
        )
        .groupBy("source")
        .agg(
            F.max("med2").cast("long").alias("med2"),
            F.sum("_c").cast("long").alias("n_docs"),
            F.sum(F.expr("_c * _z")).cast("long").alias("sum_z"),
            F.sum(F.expr("_c * _z * _z")).cast("long").alias("sum_z2"),
        )
    )
    wall = W.partitionBy()
    g = z.select(
        "*",
        F.sum("n_docs").over(wall).cast("long").alias("_nt"),
        F.sum("sum_z").over(wall).cast("long").alias("_st"),
        F.sum("sum_z2").over(wall).cast("long").alias("_qt"),
        F.count(F.lit(1)).over(wall).cast("long").alias("n_groups"),
        F.sum(
            F.col("sum_z").cast("double")
            * F.col("sum_z").cast("double")
            / F.col("n_docs").cast("double")
        )
        .over(wall)
        .alias("_sb"),
    )
    nt = F.col("_nt").cast("double")
    st = F.col("_st").cast("double")
    ssb = F.col("_sb") - st * st / nt
    ssw = F.col("_qt").cast("double") - F.col("_sb")
    k = F.col("n_groups").cast("double")
    ok = (F.col("n_groups") > 1) & (F.col("_nt") > F.col("n_groups")) & (ssw > 0)
    return g.select(
        "source",
        "n_docs",
        "med2",
        "sum_z",
        "sum_z2",
        _r(
            F.col("sum_z").cast("double") / (F.lit(2.0) * F.col("n_docs").cast("double"))
        ).alias("mean_absdev"),
        "n_groups",
        _r(F.when(ok, (ssb / (k - 1)) / (ssw / (nt - k)))).alias("w_stat"),
    ).orderBy("source")


ORACLE_LEVENE = r"""
WITH d AS (
  SELECT source, CAST(n_chars AS BIGINT) AS _v FROM documents
),
sv AS (
  SELECT source, _v, CAST(count(*) AS BIGINT) AS _c FROM d GROUP BY 1, 2
),
cum AS (
  SELECT source, _v, _c,
         CAST(sum(_c) OVER (PARTITION BY source ORDER BY _v
                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS _cum,
         CAST(sum(_c) OVER (PARTITION BY source) AS BIGINT) AS _n
  FROM sv
),
med AS (
  SELECT source,
         CAST(max(CASE WHEN _cum - _c < (_n + 1) // 2
                            AND (_n + 1) // 2 <= _cum THEN _v END)
              + max(CASE WHEN _cum - _c < (_n + 2) // 2
                              AND (_n + 2) // 2 <= _cum THEN _v END)
              AS BIGINT) AS med2
  FROM cum GROUP BY 1
),
z AS (
  SELECT sv.source, CAST(max(med.med2) AS BIGINT) AS med2,
         CAST(sum(_c) AS BIGINT) AS n_docs,
         CAST(sum(_c * abs(2 * _v - med.med2)) AS BIGINT) AS sum_z,
         CAST(sum(_c * abs(2 * _v - med.med2) * abs(2 * _v - med.med2))
              AS BIGINT) AS sum_z2
  FROM sv JOIN med ON med.source = sv.source
  GROUP BY 1
),
g AS (
  SELECT z.*,
         CAST(sum(n_docs) OVER () AS BIGINT) AS _nt,
         CAST(sum(sum_z) OVER () AS BIGINT) AS _st,
         CAST(sum(sum_z2) OVER () AS BIGINT) AS _qt,
         CAST(count(*) OVER () AS BIGINT) AS n_groups,
         sum(CAST(sum_z AS DOUBLE) * CAST(sum_z AS DOUBLE)
             / CAST(n_docs AS DOUBLE)) OVER () AS _sb
  FROM z
)
SELECT source, n_docs, med2, sum_z, sum_z2,
       round(CAST(sum_z AS DOUBLE) / (2.0 * CAST(n_docs AS DOUBLE)), 6)
         AS mean_absdev,
       n_groups,
       round(CASE WHEN n_groups > 1 AND _nt > n_groups
                       AND CAST(_qt AS DOUBLE) - _sb > 0
             THEN ((_sb - CAST(_st AS DOUBLE) * CAST(_st AS DOUBLE)
                          / CAST(_nt AS DOUBLE))
                   / (CAST(n_groups AS DOUBLE) - 1))
                  / ((CAST(_qt AS DOUBLE) - _sb)
                     / (CAST(_nt AS DOUBLE) - CAST(n_groups AS DOUBLE)))
             END, 6) AS w_stat
FROM g
ORDER BY source
"""


def cochran_q_report(spark, sf):
    """Cochran's Q across three English-detectors on the same docs
    (X121 — Cochran 1950: the k-related-proportions extension of X112's
    McNemar, Q = (k−1)(k·ΣC_j² − T²)/(k·T − ΣR_i²); with k=2 it
    degenerates to McNemar's χ² exactly — do the three detectors have
    the same accuracy, accounting for per-document difficulty?).
    Detector A = the X106 stopword argmax, B = the bare '\\bthe\\b'
    keyword, C = "≥2 English stopword hits"; truth = lang='en'. ONE
    codegen scan; the corpus collapses map-side to eight BIGINTs
    (three column sums, ΣR, ΣR², the R-histogram) — Q is one float
    division of exact integers, den=0 (all-agree) guarded NULL.
    Reference analog: none — rebuild-only (SURVEY §2.13)."""
    d = t(spark, sf, "documents")
    truth = (F.col("lang") == "en").cast("int")
    s = lang_id_scores(F.col("text"))
    pa = (F.coalesce(s["lang_pred"], F.lit("und")) == "en").cast("int")
    pb = F.lower(F.col("text")).rlike(r"\bthe\b").cast("int")
    pc = (s["hits_en"] >= 2).cast("int")
    p = d.select(
        (pa == truth).cast("long").alias("_xa"),
        (pb == truth).cast("long").alias("_xb"),
        (pc == truth).cast("long").alias("_xc"),
    ).select(
        "_xa", "_xb", "_xc", (F.col("_xa") + F.col("_xb") + F.col("_xc")).alias("_r")
    )
    g = p.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_xa").cast("long").alias("c_a"),
        F.sum("_xb").cast("long").alias("c_b"),
        F.sum("_xc").cast("long").alias("c_c"),
        F.sum("_r").cast("long").alias("sum_r"),
        F.sum(F.expr("_r * _r")).cast("long").alias("sum_r2"),
        F.sum(F.when(F.col("_r") == 0, 1).otherwise(0)).cast("long").alias("n_r0"),
        F.sum(F.when(F.col("_r") == 1, 1).otherwise(0)).cast("long").alias("n_r1"),
        F.sum(F.when(F.col("_r") == 2, 1).otherwise(0)).cast("long").alias("n_r2"),
        F.sum(F.when(F.col("_r") == 3, 1).otherwise(0)).cast("long").alias("n_r3"),
    )
    num = (
        F.lit(2)
        * (
            F.lit(3)
            * (
                F.col("c_a") * F.col("c_a")
                + F.col("c_b") * F.col("c_b")
                + F.col("c_c") * F.col("c_c")
            )
            - F.col("sum_r") * F.col("sum_r")
        )
    ).cast("long")
    den = (F.lit(3) * F.col("sum_r") - F.col("sum_r2")).cast("long")
    return g.select(
        "n_docs",
        "c_a",
        "c_b",
        "c_c",
        "sum_r",
        "sum_r2",
        "n_r0",
        "n_r1",
        "n_r2",
        "n_r3",
        num.alias("q_num"),
        den.alias("q_den"),
        _r(
            F.when(den > 0, num.cast("double") / den.cast("double"))
        ).alias("q_stat"),
    )


def _oracle_cochran_q() -> str:
    cols, chain = _langid_pred_sql()
    return f"""
WITH s AS (
  SELECT lang, text,
         {cols}
  FROM documents
),
p AS (
  SELECT CASE WHEN (CASE WHEN coalesce({chain}, 'und') = 'en' THEN 1 ELSE 0 END)
                   = (CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
              THEN 1 ELSE 0 END AS _xa,
         CASE WHEN (CASE WHEN regexp_matches(lower(text), '\\bthe\\b')
                         THEN 1 ELSE 0 END)
                   = (CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
              THEN 1 ELSE 0 END AS _xb,
         CASE WHEN (CASE WHEN h_en >= 2 THEN 1 ELSE 0 END)
                   = (CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
              THEN 1 ELSE 0 END AS _xc
  FROM s
),
p2 AS (
  SELECT *, _xa + _xb + _xc AS _r FROM p
),
g AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(_xa) AS BIGINT) AS c_a,
         CAST(sum(_xb) AS BIGINT) AS c_b,
         CAST(sum(_xc) AS BIGINT) AS c_c,
         CAST(sum(_r) AS BIGINT) AS sum_r,
         CAST(sum(_r * _r) AS BIGINT) AS sum_r2,
         CAST(sum(CASE WHEN _r = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_r0,
         CAST(sum(CASE WHEN _r = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_r1,
         CAST(sum(CASE WHEN _r = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_r2,
         CAST(sum(CASE WHEN _r = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_r3
  FROM p2
)
SELECT n_docs, c_a, c_b, c_c, sum_r, sum_r2, n_r0, n_r1, n_r2, n_r3,
       CAST(2 * (3 * (c_a * c_a + c_b * c_b + c_c * c_c)
                 - sum_r * sum_r) AS BIGINT) AS q_num,
       CAST(3 * sum_r - sum_r2 AS BIGINT) AS q_den,
       round(CASE WHEN 3 * sum_r - sum_r2 > 0
             THEN CAST(2 * (3 * (c_a * c_a + c_b * c_b + c_c * c_c)
                            - sum_r * sum_r) AS DOUBLE)
                  / CAST(3 * sum_r - sum_r2 AS DOUBLE)
             END, 6) AS q_stat
FROM g
"""


def runs_test_report(spark, sf):
    """Wald-Wolfowitz runs test on per-type daily volume (X122 — Wald &
    Wolfowitz 1940: is the above/below-median day sequence random, or
    does volume cluster in runs? The model-free serial-dependence check
    that complements X116's ACF — bursts and regime shifts both shrink
    the run count below E[R] = 1 + 2n₁n₂/N). X115's dense zero-filled
    day grid; the day-domain median via X120's integer two-middle ×2
    idiom; equal-to-median days dropped (the standard tie rule, scipy's
    runstest convention); runs counted as sign-changes + 1 with ONE lag
    window over the surviving day sequence. n₁/n₂/R are exact BIGINTs;
    E[R], Var[R] and z are doubles of exact integers (one sqrt),
    degenerate n₁=0 or n₂=0 NULL-guarded. Reference analog: none —
    rebuild-only (SURVEY §2.13)."""
    e = t(spark, sf, "events").select(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias("_d"),
    )
    cnt = e.groupBy("event_type", "_d").agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    bounds = e.agg(F.min("_d").alias("_lo"), F.max("_d").alias("_hi"))
    days = bounds.select(F.explode(F.sequence("_lo", "_hi")).alias("_d"))
    types = cnt.select("event_type").distinct()
    grid = (
        types.crossJoin(F.broadcast(days))
        .join(cnt, ["event_type", "_d"], "left")
        .select(
            "event_type", "_d", F.coalesce("_c", F.lit(0)).cast("long").alias("_c")
        )
    )
    # day-domain median of the count values, X120's integer two-middle idiom
    cv = grid.groupBy("event_type", "_c").agg(
        F.count(F.lit(1)).cast("long").alias("_f")
    )
    wc = W.partitionBy("event_type").orderBy("_c").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    cum = cv.select(
        "event_type",
        "_c",
        "_f",
        F.sum("_f").over(wc).cast("long").alias("_cum"),
        F.sum("_f").over(W.partitionBy("event_type")).cast("long").alias("_n"),
    )
    rlo = F.expr("(_n + 1) DIV 2")
    rhi = F.expr("(_n + 2) DIV 2")
    med = (
        cum.select(
            "event_type",
            F.when(
                (F.col("_cum") - F.col("_f") < rlo) & (rlo <= F.col("_cum")),
                F.col("_c"),
            ).alias("_lo"),
            F.when(
                (F.col("_cum") - F.col("_f") < rhi) & (rhi <= F.col("_cum")),
                F.col("_c"),
            ).alias("_hi"),
        )
        .groupBy("event_type")
        .agg((F.max("_lo") + F.max("_hi")).cast("long").alias("med2"))
    )
    signs = (
        grid.join(F.broadcast(med), "event_type")
        .filter(F.lit(2) * F.col("_c") != F.col("med2"))
        .select(
            "event_type",
            "_d",
            "med2",
            F.when(F.lit(2) * F.col("_c") > F.col("med2"), F.lit(1))
            .otherwise(F.lit(-1))
            .alias("_s"),
        )
    )
    wd = W.partitionBy("event_type").orderBy("_d")
    runs = signs.select(
        "event_type",
        "med2",
        "_s",
        F.when(
            F.lag("_s").over(wd).isNull() | (F.lag("_s").over(wd) != F.col("_s")),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("_new_run"),
    )
    g = runs.groupBy("event_type").agg(
        F.max("med2").cast("long").alias("med2"),
        F.sum(F.when(F.col("_s") == 1, 1).otherwise(0)).cast("long").alias("n_above"),
        F.sum(F.when(F.col("_s") == -1, 1).otherwise(0))
        .cast("long")
        .alias("n_below"),
        F.sum("_new_run").cast("long").alias("n_runs"),
    )
    n1 = F.col("n_above").cast("double")
    n2 = F.col("n_below").cast("double")
    nn = n1 + n2
    e_runs = F.lit(1.0) + 2.0 * n1 * n2 / nn
    var = (
        2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2) / (nn * nn * (nn - 1.0))
    )
    ok = (F.col("n_above") > 0) & (F.col("n_below") > 0) & (nn > 1)
    return g.select(
        "event_type",
        "med2",
        "n_above",
        "n_below",
        "n_runs",
        _r(F.when(ok, e_runs)).alias("e_runs"),
        _r(F.when(ok & (var > 0), (F.col("n_runs").cast("double") - e_runs)
                  / F.sqrt(var))).alias("z"),
    ).orderBy("event_type")


ORACLE_RUNS_TEST = r"""
WITH e AS (
  SELECT event_type,
         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS _d
  FROM events
),
cnt AS (
  SELECT event_type, _d, CAST(count(*) AS BIGINT) AS _c FROM e GROUP BY 1, 2
),
bounds AS (
  SELECT min(_d) AS _lo, max(_d) AS _hi FROM e
),
days AS (
  SELECT CAST(unnest(range(_lo, _hi + 1)) AS BIGINT) AS _d FROM bounds
),
types AS (
  SELECT DISTINCT event_type FROM cnt
),
grid AS (
  SELECT ty.event_type, dy._d, CAST(coalesce(c._c, 0) AS BIGINT) AS _c
  FROM types ty CROSS JOIN days dy
  LEFT JOIN cnt c ON c.event_type = ty.event_type AND c._d = dy._d
),
cv AS (
  SELECT event_type, _c, CAST(count(*) AS BIGINT) AS _f FROM grid GROUP BY 1, 2
),
cum AS (
  SELECT event_type, _c, _f,
         CAST(sum(_f) OVER (PARTITION BY event_type ORDER BY _c
                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS _cum,
         CAST(sum(_f) OVER (PARTITION BY event_type) AS BIGINT) AS _n
  FROM cv
),
med AS (
  SELECT event_type,
         CAST(max(CASE WHEN _cum - _f < (_n + 1) // 2
                            AND (_n + 1) // 2 <= _cum THEN _c END)
              + max(CASE WHEN _cum - _f < (_n + 2) // 2
                              AND (_n + 2) // 2 <= _cum THEN _c END)
              AS BIGINT) AS med2
  FROM cum GROUP BY 1
),
signs AS (
  SELECT g.event_type, g._d, m.med2,
         CASE WHEN 2 * g._c > m.med2 THEN 1 ELSE -1 END AS _s
  FROM grid g JOIN med m ON m.event_type = g.event_type
  WHERE 2 * g._c <> m.med2
),
runs AS (
  SELECT event_type, med2, _s,
         CASE WHEN lag(_s) OVER (PARTITION BY event_type ORDER BY _d) IS NULL
                   OR lag(_s) OVER (PARTITION BY event_type ORDER BY _d) <> _s
              THEN 1 ELSE 0 END AS _new_run
  FROM signs
),
g AS (
  SELECT event_type, CAST(max(med2) AS BIGINT) AS med2,
         CAST(sum(CASE WHEN _s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
         CAST(sum(CASE WHEN _s = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
         CAST(sum(_new_run) AS BIGINT) AS n_runs
  FROM runs GROUP BY 1
)
SELECT event_type, med2, n_above, n_below, n_runs,
       round(CASE WHEN n_above > 0 AND n_below > 0 AND n_above + n_below > 1
             THEN 1.0 + 2.0 * CAST(n_above AS DOUBLE) * CAST(n_below AS DOUBLE)
                  / (CAST(n_above AS DOUBLE) + CAST(n_below AS DOUBLE))
             END, 6) AS e_runs,
       round(CASE WHEN n_above > 0 AND n_below > 0 AND n_above + n_below > 1
                  AND 2.0 * CAST(n_above AS DOUBLE) * CAST(n_below AS DOUBLE)
                      * (2.0 * CAST(n_above AS DOUBLE) * CAST(n_below AS DOUBLE)
                         - CAST(n_above AS DOUBLE) - CAST(n_below AS DOUBLE))
                      / ((CAST(n_above AS DOUBLE) + CAST(n_below AS DOUBLE))
                         * (CAST(n_above AS DOUBLE) + CAST(n_below AS DOUBLE))
                         * (CAST(n_above AS DOUBLE) + CAST(n_below AS DOUBLE)
                            - 1.0)) > 0
             THEN (CAST(n_runs AS DOUBLE)
                   - (1.0 + 2.0 * CAST(n_above AS DOUBLE)
                      * CAST(n_below AS DOUBLE)
                      / (CAST(n_above AS DOUBLE) + CAST(n_below AS DOUBLE))))
                  / sqrt(2.0 * CAST(n_above AS DOUBLE) * CAST(n_below AS DOUBLE)
                         * (2.0 * CAST(n_above AS DOUBLE)
                            * CAST(n_below AS DOUBLE)
                            - CAST(n_above AS DOUBLE) - CAST(n_below AS DOUBLE))
                         / ((CAST(n_above AS DOUBLE) + CAST(n_below AS DOUBLE))
                            * (CAST(n_above AS DOUBLE)
                               + CAST(n_below AS DOUBLE))
                            * (CAST(n_above AS DOUBLE)
                               + CAST(n_below AS DOUBLE) - 1.0)))
             END, 6) AS z
FROM g
ORDER BY event_type
"""


def url_canon_report(spark, sf):
    """Canonical-URL dedup over deterministically synthesized messy
    variants (X123 — the RFC 3986 §6 normalization subset every crawl
    frontier and URL-keyed dedup applies: fragment strip, case-fold
    scheme/host, default-port drop, dot-segment/slash collapse,
    tracking-param strip + byte-sorted query; see
    functions/urlnorm.py). Each doc synthesizes THREE messy variants of
    its URL (uppercase host + :80 + utm param / param-swap + fragment /
    dot-segment + duplicate slashes + gclid) — every 10th doc's third
    variant instead points at a genuinely different path, so canonical
    clusters are a 3/2+1 mix and the cluster-size histogram is the
    planted truth. The canonicalizer is pure codegen string exprs; the
    histogram is two map-side-combined groupBys on
    domain-bounded frames. Emits the histogram + the 5 lexicographic
    smallest canonical URLs as a spot-check (explicit total order).
    Reference analog: none — rebuild-only (SURVEY §2.13)."""
    from .functions.urlnorm import canonical_url

    d = t(spark, sf, "documents").select("doc_id")
    base = F.concat(F.lit("example"), (F.col("doc_id") % 37).cast("string"))
    pathseg = F.concat(F.lit("page"), (F.col("doc_id") % 53).cast("string"))
    v1 = F.concat(
        F.lit("HTTP://WWW."),
        F.upper(base),
        F.lit(".COM:80/a/"),
        pathseg,
        F.lit("?b=2&a=1&utm_source=feed"),
    )
    v2 = F.concat(
        F.lit("http://www."),
        base,
        F.lit(".com/a/"),
        pathseg,
        F.lit("?a=1&b=2#frag"),
    )
    v3_same = F.concat(
        F.lit("http://www."),
        base,
        F.lit(".com/a/./"),
        pathseg,
        F.lit("//?a=1&b=2&gclid=xyz"),
    )
    v3_diff = F.concat(
        F.lit("http://www."),
        base,
        F.lit(".com/other/"),
        pathseg,
        F.lit("?a=1&b=2"),
    )
    v3 = F.when(F.col("doc_id") % 10 == 0, v3_diff).otherwise(v3_same)
    urls = d.select(
        "doc_id", F.explode(F.array(v1, v2, v3)).alias("url")
    ).select("doc_id", "url", canonical_url(F.col("url")).alias("canon"))
    clusters = urls.groupBy("canon").agg(
        F.count(F.lit(1)).cast("long").alias("_sz")
    )
    hist = clusters.groupBy(F.col("_sz").alias("cluster_size")).agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters")
    )
    tot = urls.agg(
        F.count(F.lit(1)).cast("long").alias("n_urls"),
        F.count_distinct("canon").cast("long").alias("n_canonical"),
    )
    top = (
        clusters.orderBy("canon")
        .limit(5)
        # sort_array forces the join order — collect_list alone does not
        # guarantee it, and this column feeds the oracle hash
        .agg(
            F.array_join(F.sort_array(F.collect_list("canon")), "|").alias(
                "sample_canon"
            )
        )
    )
    return (
        hist.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(top))
        .select(
            "cluster_size", "n_clusters", "n_urls", "n_canonical", "sample_canon"
        )
        .orderBy("cluster_size")
    )


ORACLE_URL_CANON = r"""
WITH d AS (
  SELECT doc_id FROM documents
),
raw AS (
  SELECT doc_id, unnest([
    'HTTP://WWW.' || upper('example' || CAST(doc_id % 37 AS VARCHAR))
      || '.COM:80/a/page' || CAST(doc_id % 53 AS VARCHAR)
      || '?b=2&a=1&utm_source=feed',
    'http://www.example' || CAST(doc_id % 37 AS VARCHAR)
      || '.com/a/page' || CAST(doc_id % 53 AS VARCHAR) || '?a=1&b=2#frag',
    CASE WHEN doc_id % 10 = 0
    THEN 'http://www.example' || CAST(doc_id % 37 AS VARCHAR)
         || '.com/other/page' || CAST(doc_id % 53 AS VARCHAR) || '?a=1&b=2'
    ELSE 'http://www.example' || CAST(doc_id % 37 AS VARCHAR)
         || '.com/a/./page' || CAST(doc_id % 53 AS VARCHAR)
         || '//?a=1&b=2&gclid=xyz'
    END
  ]) AS url
  FROM d
),
s1 AS (  -- strip fragment, split scheme
  SELECT doc_id, url,
         split_part(url, '#', 1) AS u
  FROM raw
),
s2 AS (
  SELECT doc_id,
         lower(split_part(u, '://', 1)) AS scheme,
         CASE WHEN strpos(u, '://') > 0
              THEN substr(u, strpos(u, '://') + 3) ELSE '' END AS rest
  FROM s1
),
s3 AS (
  SELECT doc_id, scheme,
         split_part(split_part(rest, '/', 1), '?', 1) AS hostport,
         CASE WHEN strpos(rest, '/') > 0
              THEN substr(rest, strpos(rest, '/')) ELSE '' END AS after_host
  FROM s2
),
s4 AS (
  SELECT doc_id, scheme,
         CASE WHEN scheme = 'http'
              THEN regexp_replace(lower(hostport), ':80$', '')
              WHEN scheme = 'https'
              THEN regexp_replace(lower(hostport), ':443$', '')
              ELSE lower(hostport) END AS host,
         split_part(after_host, '?', 1) AS path,
         CASE WHEN strpos(after_host, '?') > 0
              THEN substr(after_host, strpos(after_host, '?') + 1)
              ELSE '' END AS query
  FROM s3
),
s5 AS (
  SELECT doc_id, scheme, host,
         CASE WHEN regexp_replace(regexp_replace(regexp_replace(
                     regexp_replace(path, '/\./', '/', 'g'),
                     '/\./', '/', 'g'), '/{2,}', '/', 'g'), '/$', '') = ''
              THEN '/'
              ELSE regexp_replace(regexp_replace(regexp_replace(
                     regexp_replace(path, '/\./', '/', 'g'),
                     '/\./', '/', 'g'), '/{2,}', '/', 'g'), '/$', '')
         END AS p,
         list_aggregate(
           list_sort(list_filter(string_split(query, '&'),
             x -> x <> '' AND NOT starts_with(lower(x), 'utm_')
                  AND NOT starts_with(lower(x), 'fbclid')
                  AND NOT starts_with(lower(x), 'gclid'))),
           'string_agg', '&') AS q
  FROM s4
),
canon AS (
  SELECT doc_id,
         scheme || '://' || host || p
           || CASE WHEN q IS NOT NULL AND q <> '' THEN '?' || q ELSE '' END
           AS canon
  FROM s5
),
clusters AS (
  SELECT canon, CAST(count(*) AS BIGINT) AS _sz FROM canon GROUP BY 1
),
hist AS (
  SELECT _sz AS cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
  FROM clusters GROUP BY 1
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_urls,
         CAST(count(DISTINCT canon) AS BIGINT) AS n_canonical
  FROM canon
),
top AS (
  SELECT string_agg(canon, '|' ORDER BY canon) AS sample_canon
  FROM (SELECT canon FROM clusters ORDER BY canon LIMIT 5)
)
SELECT cluster_size, n_clusters, n_urls, n_canonical, sample_canon
FROM hist CROSS JOIN tot CROSS JOIN top
ORDER BY cluster_size
"""


_HAAR_LEVELS = 5  # 32-slot dyadic analysis window


def haar_report(spark, sf):
    """Haar wavelet energy decomposition of per-type daily volume (X124
    — Haar 1910 via Mallat 1989's pyramid: at which TIME SCALE does
    crawl volume fluctuate? Day-to-day jitter loads level 1, weekly
    cadence levels 2-3, regime drift the coarse levels — the
    multi-resolution complement to X116's single-lag ACF). Analysis
    window = the first 32 days of the span, zero-padded past the span
    end (fixed dyadic window, documented; X115's grid supplies the
    dense zero-filled slots). The UNNORMALIZED Haar pyramid keeps
    everything BIGINT: a'_i = a_{2i}+a_{2i+1}, d_i = a_{2i}−a_{2i+1},
    energy_k = Σ d² exact (the 2^k normalization is a per-level
    constant, folded into the float share column only); each of the 5
    unrolled levels is a map-side-combined groupBy on a ≤16-row/type
    frame, localCheckpointed so the energy taps don't re-derive the
    scan 2^5 times. Reference analog: none — rebuild-only
    (SURVEY §2.13)."""
    e = t(spark, sf, "events").select(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias("_d"),
    )
    cnt = e.groupBy("event_type", "_d").agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    lo = e.agg(F.min("_d").alias("_lo"))
    slots = lo.select(
        F.explode(F.sequence(F.lit(0), F.lit(31))).alias("_s"), "_lo"
    ).select("_s", (F.col("_lo") + F.col("_s")).alias("_d"))
    types = cnt.select("event_type").distinct()
    level = (
        types.crossJoin(F.broadcast(slots))
        .join(cnt, ["event_type", "_d"], "left")
        .select(
            "event_type",
            "_s",
            F.coalesce("_c", F.lit(0)).cast("long").alias("_a"),
        )
        .localCheckpoint(eager=True)
    )
    energies = []
    for k in range(1, _HAAR_LEVELS + 1):
        nxt = (
            level.groupBy("event_type", F.expr("_s DIV 2").alias("_s2"))
            .agg(
                F.sum("_a").cast("long").alias("_a"),
                F.sum(
                    F.when(F.expr("_s % 2 = 0"), F.col("_a")).otherwise(-F.col("_a"))
                )
                .cast("long")
                .alias("_dv"),
            )
            .select("event_type", F.col("_s2").alias("_s"), "_a", "_dv")
            .localCheckpoint(eager=True)
        )
        energies.append(
            nxt.groupBy("event_type").agg(
                F.lit(k).cast("long").alias("level"),
                F.sum(F.expr("_dv * _dv")).cast("long").alias("energy"),
            )
        )
        level = nxt
    total = level.select(
        "event_type", F.col("_a").cast("long").alias("window_total")
    )
    alle = energies[0]
    for x in energies[1:]:
        alle = alle.unionAll(x)
    g = alle.join(F.broadcast(total), "event_type").select(
        "*",
        F.sum("energy")
        .over(W.partitionBy("event_type"))
        .cast("long")
        .alias("_etot"),
    )
    return g.select(
        "event_type",
        "level",
        "energy",
        "window_total",
        _r(
            F.when(
                F.col("_etot") > 0,
                F.col("energy").cast("double") / F.col("_etot").cast("double"),
            )
        ).alias("energy_share"),
    ).orderBy("event_type", "level")


def _oracle_haar() -> str:
    lvls = []
    prev = "lvl0"
    for k in range(1, _HAAR_LEVELS + 1):
        lvls.append(
            f"""lvl{k} AS MATERIALIZED (
  SELECT event_type, _s // 2 AS _s,
         CAST(sum(_a) AS BIGINT) AS _a,
         CAST(sum(CASE WHEN _s % 2 = 0 THEN _a ELSE -_a END) AS BIGINT) AS _dv
  FROM {prev} GROUP BY 1, 2
)"""
        )
        prev = f"lvl{k}"
    chain = ",\n".join(lvls)
    energy_union = "\nUNION ALL\n".join(
        f"SELECT event_type, CAST({k} AS BIGINT) AS level, "
        f"CAST(sum(_dv * _dv) AS BIGINT) AS energy FROM lvl{k} GROUP BY 1"
        for k in range(1, _HAAR_LEVELS + 1)
    )
    return f"""
WITH e AS MATERIALIZED (
  SELECT event_type,
         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS _d
  FROM events
),
cnt AS MATERIALIZED (
  SELECT event_type, _d, CAST(count(*) AS BIGINT) AS _c FROM e GROUP BY 1, 2
),
lo AS (
  SELECT min(_d) AS _lo FROM e
),
slots AS (
  SELECT CAST(unnest(range(0, 32)) AS BIGINT) AS _s
),
lvl0 AS MATERIALIZED (
  SELECT ty.event_type, s._s,
         CAST(coalesce(c._c, 0) AS BIGINT) AS _a
  FROM (SELECT DISTINCT event_type FROM cnt) ty
  CROSS JOIN slots s
  CROSS JOIN lo
  LEFT JOIN cnt c ON c.event_type = ty.event_type AND c._d = lo._lo + s._s
),
{chain},
en AS MATERIALIZED (
{energy_union}
),
total AS (
  SELECT event_type, CAST(_a AS BIGINT) AS window_total FROM lvl{_HAAR_LEVELS}
),
g AS (
  SELECT en.*, t.window_total,
         CAST(sum(energy) OVER (PARTITION BY en.event_type) AS BIGINT) AS _etot
  FROM en JOIN total t ON t.event_type = en.event_type
)
SELECT event_type, level, energy, window_total,
       round(CASE WHEN _etot > 0
             THEN CAST(energy AS DOUBLE) / CAST(_etot AS DOUBLE) END, 6)
         AS energy_share
FROM g
ORDER BY event_type, level
"""


def vocab_overlap_report(spark, sf):
    r"""Cross-source vocabulary-overlap matrix (X125 — Jaccard 1912
    |A∩B|/|A∪B| + the Szymkiewicz-Simpson overlap coefficient
    |A∩B|/min(|A\|,|B|) between per-source vocabularies: the corpus-mix
    audit run before blending sources — near-duplicate source FEEDS
    show up as overlap ≈ 1 long before document-level dedup fires;
    X85's JS divergence compares length SHAPES, this compares the
    actual words). Vocabularies are per-source DISTINCT normalized
    tokens (one explode + distinct — the only data-bound legs);
    intersections come from a token-keyed self-join whose fan-out per
    token is ≤ |sources| (never a global cross join); sizes broadcast
    back onto the ≤|sources|²/2 ordered-pair frame. All counts exact
    BIGINTs; Jaccard/overlap are final float divisions. Reference
    analog: none — rebuild-only (SURVEY §2.13)."""
    from .functions.ngram import word_tokens

    d = _spread(t(spark, sf, "documents"))
    tok = (
        d.select("source", F.explode(word_tokens(F.col("text"))).alias("_t"))
        .distinct()
    )
    sizes = tok.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("_v"))
    a = tok.select(F.col("source").alias("_sa"), "_t")
    b = tok.toDF(*tok.columns).select(F.col("source").alias("_sb"), "_t")
    inter = (
        a.join(b, "_t")
        .filter(F.col("_sa") < F.col("_sb"))
        .groupBy("_sa", "_sb")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    j = (
        inter.join(
            F.broadcast(sizes.select(F.col("source").alias("_sa"),
                                     F.col("_v").alias("v_a"))),
            "_sa",
        )
        .join(
            F.broadcast(sizes.select(F.col("source").alias("_sb"),
                                     F.col("_v").alias("v_b"))),
            "_sb",
        )
    )
    union = F.col("v_a") + F.col("v_b") - F.col("n_common")
    return j.select(
        F.col("_sa").alias("source_a"),
        F.col("_sb").alias("source_b"),
        "v_a",
        "v_b",
        "n_common",
        _r(F.col("n_common").cast("double") / union.cast("double")).alias("jaccard"),
        _r(
            F.col("n_common").cast("double")
            / F.least("v_a", "v_b").cast("double")
        ).alias("overlap_coef"),
    ).orderBy("source_a", "source_b")


ORACLE_VOCAB_OVERLAP = r"""
WITH tok AS (
  SELECT DISTINCT source, _t
  FROM (
    SELECT source,
           unnest(string_split(
             trim(regexp_replace(regexp_replace(lower(text), '[^\p{L} ]+',
                                                ' ', 'g'),
                                 '\s+', ' ', 'g')), ' ')) AS _t
    FROM documents
  )
  WHERE _t <> ''
),
sizes AS (
  SELECT source, CAST(count(*) AS BIGINT) AS _v FROM tok GROUP BY 1
),
inter AS (
  SELECT a.source AS _sa, b.source AS _sb, CAST(count(*) AS BIGINT) AS n_common
  FROM tok a JOIN tok b ON a._t = b._t AND a.source < b.source
  GROUP BY 1, 2
)
SELECT i._sa AS source_a, i._sb AS source_b,
       sa._v AS v_a, sb._v AS v_b, i.n_common,
       round(CAST(i.n_common AS DOUBLE)
             / CAST(sa._v + sb._v - i.n_common AS DOUBLE), 6) AS jaccard,
       round(CAST(i.n_common AS DOUBLE)
             / CAST(least(sa._v, sb._v) AS DOUBLE), 6) AS overlap_coef
FROM inter i
JOIN sizes sa ON sa.source = i._sa
JOIN sizes sb ON sb.source = i._sb
ORDER BY source_a, source_b
"""


def ols_trend_report(spark, sf):
    """OLS daily-volume trend per event type (X126 — Gauss/Legendre
    least squares with Pearson's R²: the parametric drift line
    complementing X101's robust Theil-Sen — slope agreement between the
    two is itself an outlier audit). X115's dense zero-filled day grid;
    x = day index 1..D, y = count; the scatter moments S_xx = nΣx²−
    (Σx)², S_xy = nΣxy−ΣxΣy, S_yy = nΣy²−(Σy)² are pure-BIGINT
    combinations of map-side-combined sums (exact while n·Σxy < 2^63 —
    ~6e8 events/day/type at a year span); slope = S_xy/S_xx,
    intercept = (Σy − slope·Σx)/n and R² = S_xy²/(S_xx·S_yy) are the
    only floats, zero-variance degenerates NULL-guarded. Exact moment
    BIGINTs emitted per type for hash strength. Reference analog:
    none — rebuild-only (SURVEY §2.13)."""
    e = t(spark, sf, "events").select(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias("_d"),
    )
    cnt = e.groupBy("event_type", "_d").agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    bounds = e.agg(F.min("_d").alias("_lo"), F.max("_d").alias("_hi"))
    days = bounds.select(
        F.explode(F.sequence("_lo", "_hi")).alias("_d"), "_lo"
    ).select("_d", (F.col("_d") - F.col("_lo") + 1).cast("long").alias("_x"))
    types = cnt.select("event_type").distinct()
    grid = (
        types.crossJoin(F.broadcast(days))
        .join(cnt, ["event_type", "_d"], "left")
        .select(
            "event_type",
            "_x",
            F.coalesce("_c", F.lit(0)).cast("long").alias("_y"),
        )
    )
    g = grid.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("_x").cast("long").alias("_sx"),
        F.sum("_y").cast("long").alias("_sy"),
        F.sum(F.expr("_x * _x")).cast("long").alias("_sxx"),
        F.sum(F.expr("_x * _y")).cast("long").alias("_sxy"),
        F.sum(F.expr("_y * _y")).cast("long").alias("_syy"),
    )
    sxx = (F.col("n_days") * F.col("_sxx") - F.col("_sx") * F.col("_sx")).cast("long")
    sxy = (F.col("n_days") * F.col("_sxy") - F.col("_sx") * F.col("_sy")).cast("long")
    syy = (F.col("n_days") * F.col("_syy") - F.col("_sy") * F.col("_sy")).cast("long")
    g = g.select("*", sxx.alias("s_xx"), sxy.alias("s_xy"), syy.alias("s_yy"))
    slope = F.col("s_xy").cast("double") / F.col("s_xx").cast("double")
    return g.select(
        "event_type",
        "n_days",
        F.col("_sy").alias("n_events"),
        "s_xx",
        "s_xy",
        "s_yy",
        _r(F.when(F.col("s_xx") > 0, slope)).alias("slope_per_day"),
        _r(
            F.when(
                F.col("s_xx") > 0,
                (F.col("_sy").cast("double") - slope * F.col("_sx").cast("double"))
                / F.col("n_days").cast("double"),
            )
        ).alias("intercept"),
        _r(
            F.when(
                (F.col("s_xx") > 0) & (F.col("s_yy") > 0),
                F.col("s_xy").cast("double")
                * F.col("s_xy").cast("double")
                / (F.col("s_xx").cast("double") * F.col("s_yy").cast("double")),
            )
        ).alias("r2"),
    ).orderBy("event_type")


ORACLE_OLS_TREND = r"""
WITH e AS (
  SELECT event_type,
         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS _d
  FROM events
),
cnt AS (
  SELECT event_type, _d, CAST(count(*) AS BIGINT) AS _c FROM e GROUP BY 1, 2
),
bounds AS (
  SELECT min(_d) AS _lo, max(_d) AS _hi FROM e
),
days AS (
  SELECT CAST(unnest(range(_lo, _hi + 1)) AS BIGINT) AS _d,
         CAST(unnest(range(_lo, _hi + 1)) - _lo + 1 AS BIGINT) AS _x
  FROM bounds
),
grid AS (
  SELECT ty.event_type, dy._x, CAST(coalesce(c._c, 0) AS BIGINT) AS _y
  FROM (SELECT DISTINCT event_type FROM cnt) ty
  CROSS JOIN days dy
  LEFT JOIN cnt c ON c.event_type = ty.event_type AND c._d = dy._d
),
g AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_days,
         CAST(sum(_x) AS BIGINT) AS _sx,
         CAST(sum(_y) AS BIGINT) AS _sy,
         CAST(sum(_x * _x) AS BIGINT) AS _sxx,
         CAST(sum(_x * _y) AS BIGINT) AS _sxy,
         CAST(sum(_y * _y) AS BIGINT) AS _syy
  FROM grid GROUP BY 1
),
m AS (
  SELECT *,
         CAST(n_days * _sxx - _sx * _sx AS BIGINT) AS s_xx,
         CAST(n_days * _sxy - _sx * _sy AS BIGINT) AS s_xy,
         CAST(n_days * _syy - _sy * _sy AS BIGINT) AS s_yy
  FROM g
)
SELECT event_type, n_days, _sy AS n_events, s_xx, s_xy, s_yy,
       round(CASE WHEN s_xx > 0
             THEN CAST(s_xy AS DOUBLE) / CAST(s_xx AS DOUBLE) END, 6)
         AS slope_per_day,
       round(CASE WHEN s_xx > 0
             THEN (CAST(_sy AS DOUBLE)
                   - (CAST(s_xy AS DOUBLE) / CAST(s_xx AS DOUBLE))
                     * CAST(_sx AS DOUBLE)) / CAST(n_days AS DOUBLE)
             END, 6) AS intercept,
       round(CASE WHEN s_xx > 0 AND s_yy > 0
             THEN CAST(s_xy AS DOUBLE) * CAST(s_xy AS DOUBLE)
                  / (CAST(s_xx AS DOUBLE) * CAST(s_yy AS DOUBLE))
             END, 6) AS r2
FROM m
ORDER BY event_type
"""


def durbin_watson_report(spark, sf):
    """Durbin-Watson residual autocorrelation after the X126 OLS trend
    (X127 — Durbin & Watson 1950 d = Σ(e_t−e_{t−1})²/Σe_t²: does the
    trend line LEAVE serial structure in the residuals? d≈2 white,
    d→0 positive autocorrelation (the line is missing a slow regime),
    d→4 alternation — the diagnostic that says whether X126's fit can
    be trusted at all). Same dense day grid + BIGINT scatter moments
    as X126; residuals e_t = y_t − (a + b·x_t) are doubles of exact
    BIGINTs (identical formula both engines); both quadratic sums are
    micro-quantized to BIGINTs per day row (X90's discipline at 1e6 —
    e² ~ 1e6·count² stays far under 2^63) so the 2 sums are
    order-independent; d is one float division. Emits the exact micro
    sums per type. Reference analog: none — rebuild-only
    (SURVEY §2.13)."""
    e = t(spark, sf, "events").select(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias("_d"),
    )
    cnt = e.groupBy("event_type", "_d").agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    bounds = e.agg(F.min("_d").alias("_lo"), F.max("_d").alias("_hi"))
    days = bounds.select(
        F.explode(F.sequence("_lo", "_hi")).alias("_d"), "_lo"
    ).select("_d", (F.col("_d") - F.col("_lo") + 1).cast("long").alias("_x"))
    types = cnt.select("event_type").distinct()
    grid = (
        types.crossJoin(F.broadcast(days))
        .join(cnt, ["event_type", "_d"], "left")
        .select(
            "event_type",
            "_x",
            F.coalesce("_c", F.lit(0)).cast("long").alias("_y"),
        )
    )
    m = grid.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("_x").cast("long").alias("_sx"),
        F.sum("_y").cast("long").alias("_sy"),
        F.sum(F.expr("_x * _x")).cast("long").alias("_sxx"),
        F.sum(F.expr("_x * _y")).cast("long").alias("_sxy"),
    )
    m = m.select(
        "event_type",
        "n_days",
        "_sx",
        "_sy",
        (F.col("n_days") * F.col("_sxx") - F.col("_sx") * F.col("_sx"))
        .cast("long")
        .alias("s_xx"),
        (F.col("n_days") * F.col("_sxy") - F.col("_sx") * F.col("_sy"))
        .cast("long")
        .alias("s_xy"),
    )
    slope = F.col("s_xy").cast("double") / F.col("s_xx").cast("double")
    intercept = (
        F.col("_sy").cast("double") - slope * F.col("_sx").cast("double")
    ) / F.col("n_days").cast("double")
    res = (
        grid.join(F.broadcast(m), "event_type")
        .filter(F.col("s_xx") > 0)
        .select(
            "event_type",
            "_x",
            (F.col("_y").cast("double") - (intercept + slope * F.col("_x").cast("double")))
            .alias("_e"),
        )
    )
    wd = W.partitionBy("event_type").orderBy("_x")
    q = res.select(
        "event_type",
        F.round(F.col("_e") * F.col("_e") * F.lit(1e6)).cast("long").alias("_e2"),
        F.when(
            F.lag("_e").over(wd).isNotNull(),
            F.round(
                (F.col("_e") - F.lag("_e").over(wd))
                * (F.col("_e") - F.lag("_e").over(wd))
                * F.lit(1e6)
            ).cast("long"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("_d2"),
    )
    g = q.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("_e2").cast("long").alias("sse_micro"),
        F.sum("_d2").cast("long").alias("ssd_micro"),
    )
    return g.select(
        "event_type",
        "n_days",
        "sse_micro",
        "ssd_micro",
        _r(
            F.when(
                F.col("sse_micro") > 0,
                F.col("ssd_micro").cast("double") / F.col("sse_micro").cast("double"),
            )
        ).alias("dw"),
    ).orderBy("event_type")


ORACLE_DURBIN_WATSON = r"""
WITH e AS (
  SELECT event_type,
         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS _d
  FROM events
),
cnt AS (
  SELECT event_type, _d, CAST(count(*) AS BIGINT) AS _c FROM e GROUP BY 1, 2
),
bounds AS (
  SELECT min(_d) AS _lo, max(_d) AS _hi FROM e
),
days AS (
  SELECT CAST(unnest(range(_lo, _hi + 1)) AS BIGINT) AS _d,
         CAST(unnest(range(_lo, _hi + 1)) - _lo + 1 AS BIGINT) AS _x
  FROM bounds
),
grid AS (
  SELECT ty.event_type, dy._x, CAST(coalesce(c._c, 0) AS BIGINT) AS _y
  FROM (SELECT DISTINCT event_type FROM cnt) ty
  CROSS JOIN days dy
  LEFT JOIN cnt c ON c.event_type = ty.event_type AND c._d = dy._d
),
m AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_days,
         CAST(sum(_x) AS BIGINT) AS _sx,
         CAST(sum(_y) AS BIGINT) AS _sy,
         CAST(count(*) * sum(_x * _x) - sum(_x) * sum(_x) AS BIGINT) AS s_xx,
         CAST(count(*) * sum(_x * _y) - sum(_x) * sum(_y) AS BIGINT) AS s_xy
  FROM grid GROUP BY 1
),
res AS (
  SELECT g.event_type, g._x,
         CAST(g._y AS DOUBLE)
           - ((CAST(m._sy AS DOUBLE)
               - (CAST(m.s_xy AS DOUBLE) / CAST(m.s_xx AS DOUBLE))
                 * CAST(m._sx AS DOUBLE)) / CAST(m.n_days AS DOUBLE)
              + (CAST(m.s_xy AS DOUBLE) / CAST(m.s_xx AS DOUBLE))
                * CAST(g._x AS DOUBLE)) AS _e
  FROM grid g JOIN m ON m.event_type = g.event_type
  WHERE m.s_xx > 0
),
q AS (
  SELECT event_type,
         CAST(round(_e * _e * 1e6) AS BIGINT) AS _e2,
         CASE WHEN lag(_e) OVER (PARTITION BY event_type ORDER BY _x) IS NULL
              THEN 0
              ELSE CAST(round((_e - lag(_e) OVER (PARTITION BY event_type
                                                  ORDER BY _x))
                              * (_e - lag(_e) OVER (PARTITION BY event_type
                                                    ORDER BY _x)) * 1e6)
                        AS BIGINT) END AS _d2
  FROM res
),
g AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
         CAST(sum(_e2) AS BIGINT) AS sse_micro,
         CAST(sum(_d2) AS BIGINT) AS ssd_micro
  FROM q GROUP BY 1
)
SELECT event_type, n_days, sse_micro, ssd_micro,
       round(CASE WHEN sse_micro > 0
             THEN CAST(ssd_micro AS DOUBLE) / CAST(sse_micro AS DOUBLE) END, 6)
         AS dw
FROM g
ORDER BY event_type
"""


def tfidf_top_report(spark, sf):
    """TF-IDF top-5 terms per source (X128 — Spärck Jones 1972 idf with
    source-level documents: which words CHARACTERIZE each feed? The
    corpus descriptor printed at the top of every dataset card; X89's
    LLR finds collocations WITHIN text, this ranks terms ACROSS
    sources). tf = per-(source, token) counts off the normalized token
    stream (one explode, the only data-bound leg); df = #sources
    containing the token, idf = ln(S/df) nano-quantized off exact
    BIGINTs (X90 discipline — idf of an everywhere-token is EXACTLY 0
    so ubiquitous words can never rank); score = tf·idf_nano stays
    BIGINT; top-5 per source by the explicit (score DESC, token ASC)
    total order. Reference analog: none — rebuild-only (SURVEY
    §2.13)."""
    from .functions.ngram import word_tokens

    d = _spread(t(spark, sf, "documents"))
    tf = (
        d.select("source", F.explode(word_tokens(F.col("text"))).alias("_t"))
        .groupBy("source", "_t")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    df_ = tf.groupBy("_t").agg(F.count(F.lit(1)).cast("long").alias("df"))
    ns = tf.select("source").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("_ns")
    )
    idf = df_.crossJoin(F.broadcast(ns)).select(
        "_t",
        "df",
        F.round(
            F.log(F.col("_ns").cast("double") / F.col("df").cast("double"))
            * F.lit(1e9)
        )
        .cast("long")
        .alias("idf_nano"),
    )
    scored = tf.join(idf, "_t").select(
        "source",
        "_t",
        "tf",
        "df",
        "idf_nano",
        (F.col("tf") * F.col("idf_nano")).cast("long").alias("score_nano"),
    )
    wr = W.partitionBy("source").orderBy(
        F.col("score_nano").desc(), F.col("_t")
    )
    return (
        scored.select("*", F.row_number().over(wr).alias("rank"))
        .filter(F.col("rank") <= 5)
        .select(
            "source",
            "rank",
            F.col("_t").alias("token"),
            "tf",
            "df",
            "idf_nano",
            "score_nano",
        )
        .orderBy("source", "rank")
    )


ORACLE_TFIDF_TOP = r"""
WITH tok AS (
  SELECT source,
         unnest(string_split(
           trim(regexp_replace(regexp_replace(lower(text), '[^\p{L} ]+',
                                              ' ', 'g'),
                               '\s+', ' ', 'g')), ' ')) AS _t
  FROM documents
),
tf AS (
  SELECT source, _t, CAST(count(*) AS BIGINT) AS tf
  FROM tok WHERE _t <> '' GROUP BY 1, 2
),
df AS (
  SELECT _t, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
),
ns AS (
  SELECT CAST(count(DISTINCT source) AS BIGINT) AS _ns FROM tf
),
idf AS (
  SELECT _t, df,
         CAST(round(ln(CAST(_ns AS DOUBLE) / CAST(df AS DOUBLE)) * 1e9)
              AS BIGINT) AS idf_nano
  FROM df CROSS JOIN ns
),
scored AS (
  SELECT tf.source, tf._t, tf.tf, idf.df, idf.idf_nano,
         CAST(tf.tf * idf.idf_nano AS BIGINT) AS score_nano
  FROM tf JOIN idf ON idf._t = tf._t
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY source
                               ORDER BY score_nano DESC, _t) AS rank
  FROM scored
)
SELECT source, rank, _t AS token, tf, df, idf_nano, score_nano
FROM ranked WHERE rank <= 5
ORDER BY source, rank
"""


ORACLE_QUANTILE_NORM = r"""
WITH c AS (
  SELECT source, n_chars, CAST(count(*) AS BIGINT) AS _c
  FROM documents GROUP BY 1, 2
),
sc AS (
  SELECT source, n_chars, _c,
         CAST(sum(_c) OVER (PARTITION BY source ORDER BY n_chars
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS _cum_s
  FROM c
),
pooled AS (
  SELECT n_chars, CAST(sum(_c) AS BIGINT) AS _ct,
         CAST(sum(sum(_c)) OVER (ORDER BY n_chars
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS _cum_a
  FROM c GROUP BY n_chars
),
n_all AS (SELECT CAST(count(*) AS BIGINT) AS _n_all FROM documents),
dec AS (
  SELECT s.source, s.n_src, CAST(d.decile AS BIGINT) AS decile,
         CAST((d.decile * s.n_src + 9) // 10 AS BIGINT) AS src_rank
  FROM (SELECT source, CAST(sum(_c) AS BIGINT) AS n_src
        FROM c GROUP BY source) s
  CROSS JOIN (SELECT unnest(range(1, 11)) AS decile) d
),
src_val AS (
  SELECT dec.source, dec.n_src, dec.decile, dec.src_rank,
         sc.n_chars AS src_value
  FROM dec JOIN sc ON sc.source = dec.source
   AND dec.src_rank > sc._cum_s - sc._c AND dec.src_rank <= sc._cum_s
),
keyed AS (
  SELECT sv.*, CASE WHEN sv.n_src > 1
           THEN 1 + (sv.src_rank - 1) * (na._n_all - 1) // (sv.n_src - 1)
           ELSE (na._n_all + 1) // 2 END AS pooled_rank
  FROM src_val sv CROSS JOIN n_all na
)
SELECT k.source, k.decile, k.n_src, k.src_rank, k.src_value,
       CAST(k.pooled_rank AS BIGINT) AS pooled_rank,
       p.n_chars AS pooled_value,
       CAST(p.n_chars - k.src_value AS BIGINT) AS shift
FROM keyed k JOIN pooled p
  ON k.pooled_rank > p._cum_a - p._ct AND k.pooled_rank <= p._cum_a
ORDER BY source, decile
"""


def cvm_test_report(spark, sf, lang_a="en", lang_b="es"):
    """Two-sample Cramér-von Mises drift test (X129 — Cramér 1928 /
    von Mises 1931 via Anderson 1962's two-sample form: T =
    n_a·n_b/N² · Σ_z (F_a(z) − F_b(z))² over every combined
    observation z). The INTEGRATED-squared-gap companion to X92's KS
    sup-gap on the same en-vs-es length question: KS sees only the
    single worst ECDF gap, T accumulates every gap, so it catches
    broad shape drift (tails, dispersion) that a one-point crossing
    hides from KS. Same bounded-domain machinery as X92: per-value
    counts map-side combine to the n_chars domain, one full-outer
    merge + cumulative window over the distinct-value frame; the gap
    is carried as the exact BIGINT cross-multiple diff = cum_a·n_b −
    cum_b·n_a and each term w·diff² (w = combined multiplicity at the
    value) is summed in DECIMAL(38,0) — exact and order-independent
    while N·(n_a·n_b)² < 10^38 (~10^9 docs per lang; beyond that the
    one-line swap is summing diff²·w/2^20 doubles of exact integers).
    T = S/(n_a·n_b·N²) is the only float; the α=0.05 decision uses
    the asymptotic limiting-distribution critical value 0.461
    (Anderson & Darling 1952 table 2). Degenerate one-sided inputs
    (n_a·n_b = 0) are NULL-guarded. Reference analog: none —
    rebuild-only (SURVEY §2.13)."""
    d = t(spark, sf, "documents").select("lang", "n_chars")
    a = (
        d.filter(F.col("lang") == lang_a)
        .groupBy("n_chars")
        .agg(F.count(F.lit(1)).cast("long").alias("_ca"))
    )
    b = (
        d.filter(F.col("lang") == lang_b)
        .groupBy("n_chars")
        .agg(F.count(F.lit(1)).cast("long").alias("_cb"))
    )
    v = a.join(b, "n_chars", "full_outer").select(
        "n_chars",
        F.coalesce("_ca", F.lit(0)).cast("long").alias("_ca"),
        F.coalesce("_cb", F.lit(0)).cast("long").alias("_cb"),
    )
    w = W.orderBy("n_chars").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = v.select(
        "n_chars",
        (F.col("_ca") + F.col("_cb")).cast("long").alias("_w"),
        F.sum("_ca").over(w).cast("long").alias("_cuma"),
        F.sum("_cb").over(w).cast("long").alias("_cumb"),
    )
    tot = cum.agg(
        F.max("_cuma").cast("long").alias("n_a"),
        F.max("_cumb").cast("long").alias("n_b"),
        F.count(F.lit(1)).cast("long").alias("n_vals"),
    )
    diff = (
        F.col("_cuma") * F.col("n_b") - F.col("_cumb") * F.col("n_a")
    ).cast("decimal(18,0)")
    terms = cum.crossJoin(F.broadcast(tot)).select(
        "n_a",
        "n_b",
        "n_vals",
        (F.col("_w").cast("decimal(18,0)") * diff * diff).alias("_t"),
    )
    g = terms.groupBy("n_a", "n_b", "n_vals").agg(
        F.sum("_t").cast("decimal(38,0)").alias("_s")
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    nn = na + nb
    ok = F.col("n_a") * F.col("n_b") != 0
    t_raw = F.col("_s").cast("double") / (na * nb * nn * nn)
    return g.select(
        "n_a",
        "n_b",
        "n_vals",
        F.col("_s").cast("string").alias("s_exact"),
        _r(F.when(ok, t_raw)).alias("t_stat"),
        F.when(ok, (t_raw > 0.461).cast("int"))
        .otherwise(F.lit(None).cast("int"))
        .alias("reject_h0"),
    )


ORACLE_CVM_TEST = """
WITH a AS (
  SELECT n_chars, CAST(count(*) AS BIGINT) AS ca
  FROM documents WHERE lang = 'en' GROUP BY 1
),
b AS (
  SELECT n_chars, CAST(count(*) AS BIGINT) AS cb
  FROM documents WHERE lang = 'es' GROUP BY 1
),
v AS (
  SELECT coalesce(a.n_chars, b.n_chars) AS val,
         coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
  FROM a FULL OUTER JOIN b ON a.n_chars = b.n_chars
),
cum AS (
  SELECT val, CAST(ca + cb AS BIGINT) AS w,
         CAST(sum(ca) OVER (ORDER BY val
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cuma,
         CAST(sum(cb) OVER (ORDER BY val
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumb
  FROM v
),
tot AS (
  SELECT CAST(max(cuma) AS BIGINT) AS n_a, CAST(max(cumb) AS BIGINT) AS n_b,
         CAST(count(*) AS BIGINT) AS n_vals
  FROM cum
),
g AS (
  SELECT n_a, n_b, n_vals,
         sum(CAST(w AS HUGEINT)
             * CAST(cuma * n_b - cumb * n_a AS HUGEINT)
             * CAST(cuma * n_b - cumb * n_a AS HUGEINT)) AS s
  FROM cum CROSS JOIN tot
  GROUP BY 1, 2, 3
)
SELECT n_a, n_b, n_vals, CAST(s AS VARCHAR) AS s_exact,
       round(CASE WHEN n_a * n_b <> 0
             THEN CAST(s AS DOUBLE)
                  / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
                     * CAST(n_a + n_b AS DOUBLE) * CAST(n_a + n_b AS DOUBLE))
             END, 6) AS t_stat,
       CASE WHEN n_a * n_b <> 0 THEN
         CAST(CASE WHEN CAST(s AS DOUBLE)
                  / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
                     * CAST(n_a + n_b AS DOUBLE) * CAST(n_a + n_b AS DOUBLE))
                > 0.461 THEN 1 ELSE 0 END AS INT)
       END AS reject_h0
FROM g
"""


def friedman_report(spark, sf):
    r"""Friedman rank test + Kendall's W across three per-document
    quality scorers (X130 — Friedman 1937 with the Conover 1999 tie
    correction; W = χ²/(n(k−1)), Kendall & Babington Smith 1939): do
    the scorers ORDER the same documents differently, blocking on the
    document? The k-related-samples extension of X121's Cochran Q from
    binary detectors to ordinal scorers — the audit run before fusing
    quality signals (X94 RRF) or training on one of them (X48). Blocks
    = documents, treatments = k=3 scorers on comparable [0,1] scales:
    en-stopword ratio a₁/n_tok, distinct-token ratio a₂/n_tok (both
    over the X90-normalized token stream), raw ASCII-alpha density
    a₃/len(text). Within-block average ranks are EXACT half-integers
    carried as 2r ∈ {2..6} via cross-multiplied rational comparisons
    (a_i·den_j vs a_j·den_i — no float ever ranks); ONE codegen scan
    collapses map-side to five BIGINTs (n, ΣR_j as Σ2r, Σ(2r)²); with
    k(k+1)²=48, χ² = (k−1)(ΣS_j² − 48n²)/(A₄ − 48n) is one float
    division of exact integers (all-tied A₄=48n NULL-guarded), the
    α=0.05 cut the χ²₍₂₎ literal 5.991464547107979. Zero-token /
    empty-text blocks are dropped (no rankable triple). Reference
    analog: none — rebuild-only (SURVEY §2.13)."""
    from .functions.ngram import normalize_for_scoring

    d = _spread(t(spark, sf, "documents"))
    nt_ = normalize_for_scoring(F.col("text"))
    toks = F.when(F.length(nt_) > 0, F.split(nt_, " ")).otherwise(
        F.array().cast("array<string>")
    )
    pat = r"\b(" + "|".join(STOPWORDS["en"]) + r")\b"
    base = d.select(
        F.size(F.regexp_extract_all(nt_, F.lit(pat), 0))
        .cast("long")
        .alias("a1"),
        F.size(F.array_distinct(toks)).cast("long").alias("a2"),
        F.size(toks).cast("long").alias("nt"),
        F.length(F.regexp_replace("text", "[^a-zA-Z]", ""))
        .cast("long")
        .alias("a3"),
        F.length("text").cast("long").alias("b3"),
    ).filter((F.col("nt") > 0) & (F.col("b3") > 0))
    # cross-multiplied rational scores: s1=a1/nt, s2=a2/nt, s3=a3/b3
    s1, s2 = F.col("a1"), F.col("a2")  # shared denominator nt
    x13, x31 = F.col("a1") * F.col("b3"), F.col("a3") * F.col("nt")
    x23, x32 = F.col("a2") * F.col("b3"), F.col("a3") * F.col("nt")

    def _r2(lt1, eq1, lt2, eq2):
        return (
            F.lit(2)
            + 2 * (lt1.cast("long") + lt2.cast("long"))
            + eq1.cast("long")
            + eq2.cast("long")
        )

    ranked = base.select(
        _r2(s2 < s1, s2 == s1, x31 < x13, x31 == x13).alias("r2_1"),
        _r2(s1 < s2, s1 == s2, x32 < x23, x32 == x23).alias("r2_2"),
        _r2(x13 < x31, x13 == x31, x23 < x32, x23 == x32).alias("r2_3"),
    )
    g = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("r2_1").cast("long").alias("r2sum_stop"),
        F.sum("r2_2").cast("long").alias("r2sum_uniq"),
        F.sum("r2_3").cast("long").alias("r2sum_alpha"),
        F.sum(
            F.col("r2_1") * F.col("r2_1")
            + F.col("r2_2") * F.col("r2_2")
            + F.col("r2_3") * F.col("r2_3")
        )
        .cast("long")
        .alias("a4"),
    )
    n = F.col("n_docs")
    ssq = (
        F.col("r2sum_stop") * F.col("r2sum_stop")
        + F.col("r2sum_uniq") * F.col("r2sum_uniq")
        + F.col("r2sum_alpha") * F.col("r2sum_alpha")
    )
    den = F.col("a4") - 48 * n
    chi2 = F.when(
        den != 0,
        F.lit(2.0) * (ssq - 48 * n * n).cast("double") / den.cast("double"),
    )
    crit = 5.991464547107979
    return g.select(
        "n_docs",
        "r2sum_stop",
        "r2sum_uniq",
        "r2sum_alpha",
        "a4",
        _r(
            F.when(n > 0, F.col("r2sum_stop").cast("double") / (2 * n).cast("double"))
        ).alias("mean_rank_stop"),
        _r(
            F.when(n > 0, F.col("r2sum_uniq").cast("double") / (2 * n).cast("double"))
        ).alias("mean_rank_uniq"),
        _r(
            F.when(n > 0, F.col("r2sum_alpha").cast("double") / (2 * n).cast("double"))
        ).alias("mean_rank_alpha"),
        _r(chi2).alias("chi2_f"),
        _r(F.when(n > 0, chi2 / (2 * n).cast("double"))).alias("kendall_w"),
        F.when(den != 0, (chi2 > crit).cast("int"))
        .otherwise(F.lit(None).cast("int"))
        .alias("reject_h0"),
    )


ORACLE_FRIEDMAN = r"""
WITH base AS (
  SELECT len(regexp_extract_all(t, '\b(the|over|quick|dog|fox)\b')) AS a1,
         len(list_distinct(string_split(t, ' '))) AS a2,
         len(string_split(t, ' ')) AS nt,
         length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS a3,
         length(text) AS b3
  FROM (
    SELECT text,
           coalesce(trim(regexp_replace(regexp_replace(lower(text),
                    '[^\p{L} ]+', ' ', 'g'), '\s+', ' ', 'g')), '') AS t
    FROM documents
  )
  WHERE length(coalesce(trim(regexp_replace(regexp_replace(lower(text),
               '[^\p{L} ]+', ' ', 'g'), '\s+', ' ', 'g')), '')) > 0
    AND length(text) > 0
),
ranked AS (
  SELECT
    2 + 2*((CASE WHEN a2 < a1 THEN 1 ELSE 0 END)
         + (CASE WHEN a3*nt < a1*b3 THEN 1 ELSE 0 END))
      + (CASE WHEN a2 = a1 THEN 1 ELSE 0 END)
      + (CASE WHEN a3*nt = a1*b3 THEN 1 ELSE 0 END) AS r2_1,
    2 + 2*((CASE WHEN a1 < a2 THEN 1 ELSE 0 END)
         + (CASE WHEN a3*nt < a2*b3 THEN 1 ELSE 0 END))
      + (CASE WHEN a1 = a2 THEN 1 ELSE 0 END)
      + (CASE WHEN a3*nt = a2*b3 THEN 1 ELSE 0 END) AS r2_2,
    2 + 2*((CASE WHEN a1*b3 < a3*nt THEN 1 ELSE 0 END)
         + (CASE WHEN a2*b3 < a3*nt THEN 1 ELSE 0 END))
      + (CASE WHEN a1*b3 = a3*nt THEN 1 ELSE 0 END)
      + (CASE WHEN a2*b3 = a3*nt THEN 1 ELSE 0 END) AS r2_3
  FROM base
),
g AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(r2_1) AS BIGINT) AS r2sum_stop,
         CAST(sum(r2_2) AS BIGINT) AS r2sum_uniq,
         CAST(sum(r2_3) AS BIGINT) AS r2sum_alpha,
         CAST(sum(r2_1*r2_1 + r2_2*r2_2 + r2_3*r2_3) AS BIGINT) AS a4
  FROM ranked
)
SELECT n_docs, r2sum_stop, r2sum_uniq, r2sum_alpha, a4,
       round(CASE WHEN n_docs > 0 THEN CAST(r2sum_stop AS DOUBLE)
             / CAST(2*n_docs AS DOUBLE) END, 6) AS mean_rank_stop,
       round(CASE WHEN n_docs > 0 THEN CAST(r2sum_uniq AS DOUBLE)
             / CAST(2*n_docs AS DOUBLE) END, 6) AS mean_rank_uniq,
       round(CASE WHEN n_docs > 0 THEN CAST(r2sum_alpha AS DOUBLE)
             / CAST(2*n_docs AS DOUBLE) END, 6) AS mean_rank_alpha,
       round(CASE WHEN (a4 - 48*n_docs) <> 0
             THEN 2.0 * CAST(r2sum_stop*r2sum_stop + r2sum_uniq*r2sum_uniq
                  + r2sum_alpha*r2sum_alpha - 48*n_docs*n_docs AS DOUBLE)
                  / CAST((a4 - 48*n_docs) AS DOUBLE) END, 6) AS chi2_f,
       round(CASE WHEN (a4 - 48*n_docs) <> 0
             THEN 2.0 * CAST(r2sum_stop*r2sum_stop + r2sum_uniq*r2sum_uniq
                  + r2sum_alpha*r2sum_alpha - 48*n_docs*n_docs AS DOUBLE)
                  / CAST((a4 - 48*n_docs) AS DOUBLE)
                  / CAST(2*n_docs AS DOUBLE) END, 6) AS kendall_w,
       CASE WHEN (a4 - 48*n_docs) <> 0 THEN
         CAST(CASE WHEN 2.0 * CAST(r2sum_stop*r2sum_stop
                  + r2sum_uniq*r2sum_uniq + r2sum_alpha*r2sum_alpha
                  - 48*n_docs*n_docs AS DOUBLE)
                  / CAST((a4 - 48*n_docs) AS DOUBLE)
                > 5.991464547107979 THEN 1 ELSE 0 END AS INT)
       END AS reject_h0
FROM g
"""


def kmv_distinct_report(spark, sf, k=64):
    """KMV (k-minimum-values) distinct-count sketch per source + the
    merged union sketch (X131 — Bar-Yossef et al. 2002 with the Beyer
    et al. 2007 unbiased estimator D̂ = (k−1)/U₍ₖ₎): the ORDER-STATISTIC
    distinct sketch complementing X40's HLL — same question, different
    machinery (HLL keeps 2^p max-rank registers, KMV keeps the k
    smallest hashes; KMV unions by a trivial merge-and-truncate and
    supports intersection estimates HLL cannot). Deterministic 60-bit
    hash h = conv(md5(token)[:15], 16, 10) over the per-source DISTINCT
    normalized-token frame (one explode + distinct, the only data-bound
    legs — X125's vocabulary scale); the k-th order statistic via ONE
    rank window per source on that vocab-scale frame; sketches with
    n ≤ k hold the whole set, so the estimate is exactly n (kth_hash
    NULL). The '__union__' row runs the same code path on the global
    distinct-token frame — identical to merging the per-source sketches
    because the union's k smallest hashes each live in some source's k
    smallest (the KMV mergeability identity; at cluster scale the merge
    is a k-list truncate per executor, no rescan). est and rel_err are
    the only floats. Reference analog: none — rebuild-only (SURVEY
    §2.13)."""
    from .functions.ngram import word_tokens

    d = _spread(t(spark, sf, "documents"))
    per_src = (
        d.select("source", F.explode(word_tokens(F.col("text"))).alias("_t"))
        .distinct()
    )
    both = per_src.unionByName(
        per_src.select(F.lit("__union__").alias("source"), "_t").distinct()
    )
    hashed = both.select(
        "source",
        "_t",
        F.conv(F.substring(F.md5("_t"), 1, 15), 16, 10)
        .cast("long")
        .alias("_h"),
    )
    wr = W.partitionBy("source").orderBy("_h", "_t")
    ranked = hashed.select(
        "source",
        "_h",
        F.row_number().over(wr).alias("_r"),
        F.count(F.lit(1))
        .over(W.partitionBy("source"))
        .cast("long")
        .alias("n_exact"),
    )
    kth = ranked.filter(F.col("_r") == k).select(
        "source", F.col("_h").alias("kth_hash")
    )
    g = (
        ranked.groupBy("source", "n_exact")
        .agg(F.lit(1).alias("_x"))
        .join(kth, "source", "left")
    )
    two60 = F.lit(1152921504606846976.0)
    est = F.when(
        F.col("n_exact") <= k, F.col("n_exact").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * two60 / F.col("kth_hash").cast("double")
    )
    return g.select(
        "source",
        "n_exact",
        F.least(F.lit(k).cast("long"), F.col("n_exact")).alias("k_used"),
        F.when(F.col("n_exact") > k, F.col("kth_hash"))
        .cast("long")
        .alias("kth_hash"),
        _r(est).alias("est"),
        _r(
            F.when(
                F.col("n_exact") > 0,
                (est - F.col("n_exact").cast("double"))
                / F.col("n_exact").cast("double"),
            )
        ).alias("rel_err"),
    ).orderBy("source")


ORACLE_KMV_DISTINCT = r"""
WITH norm AS (
  SELECT source,
         coalesce(trim(regexp_replace(regexp_replace(lower(text),
                  '[^\p{L} ]+', ' ', 'g'), '\s+', ' ', 'g')), '') AS t
  FROM documents
),
per_src AS (
  SELECT DISTINCT source, UNNEST(string_split(t, ' ')) AS tok
  FROM norm WHERE length(t) > 0
),
allsrc AS (
  SELECT source, tok FROM per_src
  UNION ALL
  SELECT DISTINCT '__union__' AS source, tok FROM per_src
),
hashed AS (
  SELECT source, tok,
         ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h
  FROM allsrc
),
ranked AS (
  SELECT source, h,
         row_number() OVER (PARTITION BY source ORDER BY h, tok) AS r,
         CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n_exact
  FROM hashed
),
kth AS (
  SELECT source, h AS kth_hash FROM ranked WHERE r = 64
),
g AS (
  SELECT DISTINCT ranked.source, n_exact, kth.kth_hash
  FROM ranked LEFT JOIN kth ON kth.source = ranked.source
),
est AS (
  SELECT source, n_exact,
         CASE WHEN n_exact <= 64 THEN CAST(n_exact AS DOUBLE)
              ELSE 63.0 * 1152921504606846976.0 / CAST(kth_hash AS DOUBLE)
         END AS e,
         kth_hash
  FROM g
)
SELECT source, n_exact,
       CAST(least(64, n_exact) AS BIGINT) AS k_used,
       CAST(CASE WHEN n_exact > 64 THEN kth_hash END AS BIGINT) AS kth_hash,
       round(e, 6) AS est,
       round(CASE WHEN n_exact > 0
             THEN (e - CAST(n_exact AS DOUBLE)) / CAST(n_exact AS DOUBLE)
             END, 6) AS rel_err
FROM est
ORDER BY source
"""


# X132: 32-tap adjusted-EWMA weights (1-λ)^j, λ=0.2, micro-quantized to
# shared integer literals so BOTH engines run pure-integer tap sums (the
# X117 hardcoded-literal discipline — neither engine ever evaluates the
# power). 0.8^32 ≈ 8e-4: <0.1% truncation, the windowed-EWMA standard.
_EWMA_TAPS = 32
_EWMA_W = tuple(int(round(1e6 * 0.8**j)) for j in range(_EWMA_TAPS))


def ewma_chart_report(spark, sf):
    """EWMA control chart over per-type daily event volume (X132 —
    Roberts 1959; the small-persistent-shift detector complementing
    X115's offline CUSUM argmax: CUSUM locates ONE retrospective
    changepoint, the EWMA chart flags EVERY day the smoothed level
    leaves the control band, the monitoring view). X115's dense
    zero-filled day grid; the adjusted EWMA (pandas ewm adjust=True
    semantics) z_t = Σ_j w_j·x_{t−j} / Σ_j w_j over the 32 micro-
    quantized taps w_j = round(1e6·0.8^j) — numerator A and partial-
    window denominator B are exact BIGINTs via 32 unrolled lag() terms
    in ONE day-ordered window (the grid is dense, so lag j IS day
    t−j); per-type moments (n, S=Σx, Q=Σx²) ride the same window
    partition. With λ=0.2, L=3 the classic asymptotic band
    μ ± L·σ·sqrt(λ/(2−λ)) collapses to EXACTLY μ ± σ, so the alarm
    test (z−μ)² > σ² cross-multiplies to (A·n − S·B)² > (nQ−S²)·B²
    — the left diff is BIGINT-exact (documented bound: |A·n| < 2^63
    up to ~2e8 events/day/type at a 1000-day span), both sides then
    compared as identically-computed IEEE doubles (square/products
    only — deterministic on both engines). A constant series has
    A·n−S·B = 0, never alarming, so no variance guard is needed.
    Reference analog: none — rebuild-only (SURVEY §2.13)."""
    e = t(spark, sf, "events").select(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias("_d"),
    )
    cnt = e.groupBy("event_type", "_d").agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    bounds = e.agg(F.min("_d").alias("_lo"), F.max("_d").alias("_hi"))
    days = bounds.select(F.explode(F.sequence("_lo", "_hi")).alias("_d"))
    types = cnt.select("event_type").distinct()
    grid = (
        types.crossJoin(F.broadcast(days))
        .join(cnt, ["event_type", "_d"], "left")
        .select(
            "event_type", "_d", F.coalesce("_c", F.lit(0)).cast("long").alias("_c")
        )
    )
    wd = W.partitionBy("event_type").orderBy("_d")
    wp = W.partitionBy("event_type")
    lags = [F.lag("_c", j).over(wd) for j in range(_EWMA_TAPS)]
    num = sum(
        (F.coalesce(lg, F.lit(0)) * F.lit(wj) for lg, wj in zip(lags, _EWMA_W)),
        F.lit(0),
    ).cast("long")
    den = sum(
        (
            F.when(lg.isNotNull(), F.lit(wj)).otherwise(F.lit(0))
            for lg, wj in zip(lags, _EWMA_W)
        ),
        F.lit(0),
    ).cast("long")
    z = grid.select(
        "event_type",
        "_d",
        num.alias("_a"),
        den.alias("_b"),
        F.count(F.lit(1)).over(wp).cast("long").alias("_n"),
        F.sum("_c").over(wp).cast("long").alias("_s"),
        F.sum(F.col("_c") * F.col("_c")).over(wp).cast("long").alias("_q"),
    )
    dlt = (F.col("_a") * F.col("_n") - F.col("_s") * F.col("_b")).cast("long")
    vv = (F.col("_n") * F.col("_q") - F.col("_s") * F.col("_s")).cast("long")
    alarm = (dlt.cast("double") * dlt.cast("double")) > (
        vv.cast("double") * F.col("_b").cast("double") * F.col("_b").cast("double")
    )
    flagged = z.select(
        "event_type",
        "_d",
        "_a",
        "_b",
        "_n",
        "_s",
        "_q",
        alarm.cast("int").alias("_alarm"),
    )
    g = flagged.groupBy("event_type").agg(
        F.max("_n").cast("long").alias("n_days"),
        F.max("_s").alias("_s"),
        F.max("_q").alias("_q"),
        F.sum("_alarm").cast("long").alias("n_alarms"),
        F.min(F.when(F.col("_alarm") == 1, F.col("_d")))
        .cast("long")
        .alias("first_alarm_day"),
        F.max(F.struct(F.col("_d"), F.col("_a"), F.col("_b"))).alias("_last"),
    )
    n = F.col("n_days")
    mu = F.col("_s").cast("double") / n.cast("double")
    var = (n * F.col("_q") - F.col("_s") * F.col("_s")).cast("double") / (
        n * n
    ).cast("double")
    return g.select(
        "event_type",
        "n_days",
        _r(mu).alias("mu"),
        _r(F.sqrt(var)).alias("sigma"),
        F.col("_last._a").alias("z_last_num"),
        F.col("_last._b").alias("z_last_den"),
        _r(F.col("_last._a").cast("double") / F.col("_last._b").cast("double")).alias(
            "z_last"
        ),
        "n_alarms",
        "first_alarm_day",
    ).orderBy("event_type")


def _ewma_oracle() -> str:
    taps_num = " + ".join(
        f"coalesce(lag(_c, {j}) OVER w, 0) * {wj}"
        for j, wj in enumerate(_EWMA_W)
    )
    taps_den = " + ".join(
        f"CASE WHEN lag(_c, {j}) OVER w IS NOT NULL THEN {wj} ELSE 0 END"
        for j, wj in enumerate(_EWMA_W)
    )
    return f"""
WITH e AS (
  SELECT event_type,
         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS _d
  FROM events
),
cnt AS (
  SELECT event_type, _d, CAST(count(*) AS BIGINT) AS _c FROM e GROUP BY 1, 2
),
bounds AS (SELECT min(_d) AS _lo, max(_d) AS _hi FROM e),
days AS (
  SELECT CAST(unnest(range(_lo, _hi + 1)) AS BIGINT) AS _d FROM bounds
),
types AS (SELECT DISTINCT event_type FROM cnt),
grid AS (
  SELECT ty.event_type, dy._d, CAST(coalesce(c._c, 0) AS BIGINT) AS _c
  FROM types ty CROSS JOIN days dy
  LEFT JOIN cnt c ON c.event_type = ty.event_type AND c._d = dy._d
),
z AS (
  SELECT event_type, _d,
         CAST({taps_num} AS BIGINT) AS _a,
         CAST({taps_den} AS BIGINT) AS _b,
         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS _n,
         CAST(sum(_c) OVER (PARTITION BY event_type) AS BIGINT) AS _s,
         CAST(sum(_c * _c) OVER (PARTITION BY event_type) AS BIGINT) AS _q
  FROM grid
  WINDOW w AS (PARTITION BY event_type ORDER BY _d)
),
flagged AS (
  SELECT event_type, _d, _a, _b, _n, _s, _q,
         CASE WHEN CAST(_a * _n - _s * _b AS DOUBLE)
                   * CAST(_a * _n - _s * _b AS DOUBLE)
                 > CAST(_n * _q - _s * _s AS DOUBLE)
                   * CAST(_b AS DOUBLE) * CAST(_b AS DOUBLE)
              THEN 1 ELSE 0 END AS _alarm
  FROM z
),
last_day AS (
  SELECT event_type, _a AS z_last_num, _b AS z_last_den
  FROM (SELECT event_type, _a, _b,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY _d DESC) AS rr
        FROM flagged)
  WHERE rr = 1
),
g AS (
  SELECT f.event_type,
         CAST(max(f._n) AS BIGINT) AS n_days,
         max(f._s) AS _s, max(f._q) AS _q,
         CAST(sum(f._alarm) AS BIGINT) AS n_alarms,
         CAST(min(CASE WHEN f._alarm = 1 THEN f._d END) AS BIGINT)
           AS first_alarm_day
  FROM flagged f GROUP BY 1
)
SELECT g.event_type, g.n_days,
       round(CAST(g._s AS DOUBLE) / CAST(g.n_days AS DOUBLE), 6) AS mu,
       round(sqrt(CAST(g.n_days * g._q - g._s * g._s AS DOUBLE)
             / CAST(g.n_days * g.n_days AS DOUBLE)), 6) AS sigma,
       ld.z_last_num, ld.z_last_den,
       round(CAST(ld.z_last_num AS DOUBLE) / CAST(ld.z_last_den AS DOUBLE), 6)
         AS z_last,
       g.n_alarms, g.first_alarm_day
FROM g JOIN last_day ld ON ld.event_type = g.event_type
ORDER BY g.event_type
"""


ORACLE_EWMA_CHART = _ewma_oracle()


def dow_seasonality_report(spark, sf):
    """Day-of-week seasonal decomposition + seasonality strength per
    event type (X133 — the classical-decomposition seasonal means of
    Kendall & Stuart vol.3 with Hyndman & Athanasopoulos' (fpp3 §4.5)
    strength-of-seasonality F_s = max(0, 1 − Var(R)/Var(detrended)):
    does crawl volume carry a weekly cadence, and HOW MUCH of the
    variance does it explain? The calendar-aligned complement to
    X116's ACF (which sees lag-7 correlation but not the per-weekday
    profile) and X124's Haar pyramid (dyadic scales straddle 7).
    X115's dense zero-filled day grid; dow = (epoch_day + 3) % 7
    (0 = Monday — pure integer arithmetic, no calendar functions, so
    both engines agree by construction); per-(type, dow) sums and the
    grand mean stay exact BIGINT rationals; the residual
    r_t = (c_t·n_d − S_d)/n_d and deviation (c_t·n − S)/n are doubles
    of exact integers with their squares micro-quantized (×1e6, X127
    discipline) so both quadratic sums aggregate order-independently;
    F_s is one float off the two micro sums, constant series
    (SSD = 0) NULL-guarded. Emits one row per (type, dow) with the
    per-type strength as a constant column (X118's
    contributions+constants shape). Reference analog: none —
    rebuild-only (SURVEY §2.13)."""
    e = t(spark, sf, "events").select(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias("_d"),
    )
    cnt = e.groupBy("event_type", "_d").agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    bounds = e.agg(F.min("_d").alias("_lo"), F.max("_d").alias("_hi"))
    days = bounds.select(F.explode(F.sequence("_lo", "_hi")).alias("_d"))
    types = cnt.select("event_type").distinct()
    grid = (
        types.crossJoin(F.broadcast(days))
        .join(cnt, ["event_type", "_d"], "left")
        .select(
            "event_type",
            "_d",
            F.coalesce("_c", F.lit(0)).cast("long").alias("_c"),
            ((F.col("_d") + 3) % 7).cast("long").alias("dow"),
        )
    )
    dstat = grid.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).cast("long").alias("n_days_dow"),
        F.sum("_c").cast("long").alias("sum_dow"),
    )
    tstat = grid.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("_c").cast("long").alias("_s"),
    )
    joined = (
        grid.join(F.broadcast(dstat), ["event_type", "dow"])
        .join(F.broadcast(tstat), "event_type")
    )
    resid = (
        F.col("_c") * F.col("n_days_dow") - F.col("sum_dow")
    ).cast("double") / F.col("n_days_dow").cast("double")
    dev = (F.col("_c") * F.col("n_days") - F.col("_s")).cast("double") / F.col(
        "n_days"
    ).cast("double")
    ssq = joined.groupBy("event_type").agg(
        F.sum(F.round(resid * resid * F.lit(1e6)).cast("long"))
        .cast("long")
        .alias("ssr_micro"),
        F.sum(F.round(dev * dev * F.lit(1e6)).cast("long"))
        .cast("long")
        .alias("ssd_micro"),
    )
    strength = F.when(
        F.col("ssd_micro") > 0,
        F.greatest(
            F.lit(0.0),
            F.lit(1.0)
            - F.col("ssr_micro").cast("double") / F.col("ssd_micro").cast("double"),
        ),
    )
    out = (
        dstat.join(F.broadcast(tstat), "event_type")
        .join(F.broadcast(ssq), "event_type")
    )
    dow_mean = F.col("sum_dow").cast("double") / F.col("n_days_dow").cast("double")
    grand = F.col("_s").cast("double") / F.col("n_days").cast("double")
    return out.select(
        "event_type",
        "dow",
        "n_days_dow",
        "sum_dow",
        _r(dow_mean).alias("dow_mean"),
        _r(dow_mean - grand).alias("seasonal"),
        "ssr_micro",
        "ssd_micro",
        _r(strength).alias("strength"),
    ).orderBy("event_type", "dow")


ORACLE_DOW_SEASONALITY = """
WITH e AS (
  SELECT event_type,
         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS _d
  FROM events
),
cnt AS (
  SELECT event_type, _d, CAST(count(*) AS BIGINT) AS _c FROM e GROUP BY 1, 2
),
bounds AS (SELECT min(_d) AS _lo, max(_d) AS _hi FROM e),
days AS (
  SELECT CAST(unnest(range(_lo, _hi + 1)) AS BIGINT) AS _d FROM bounds
),
types AS (SELECT DISTINCT event_type FROM cnt),
grid AS (
  SELECT ty.event_type, dy._d, CAST(coalesce(c._c, 0) AS BIGINT) AS _c,
         CAST((dy._d + 3) % 7 AS BIGINT) AS dow
  FROM types ty CROSS JOIN days dy
  LEFT JOIN cnt c ON c.event_type = ty.event_type AND c._d = dy._d
),
dstat AS (
  SELECT event_type, dow, CAST(count(*) AS BIGINT) AS n_days_dow,
         CAST(sum(_c) AS BIGINT) AS sum_dow
  FROM grid GROUP BY 1, 2
),
tstat AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
         CAST(sum(_c) AS BIGINT) AS _s
  FROM grid GROUP BY 1
),
ssq AS (
  SELECT g.event_type,
         CAST(sum(CAST(round(CAST(g._c * d.n_days_dow - d.sum_dow AS DOUBLE)
                  / CAST(d.n_days_dow AS DOUBLE)
                  * (CAST(g._c * d.n_days_dow - d.sum_dow AS DOUBLE)
                     / CAST(d.n_days_dow AS DOUBLE)) * 1e6) AS BIGINT))
              AS BIGINT) AS ssr_micro,
         CAST(sum(CAST(round(CAST(g._c * t.n_days - t._s AS DOUBLE)
                  / CAST(t.n_days AS DOUBLE)
                  * (CAST(g._c * t.n_days - t._s AS DOUBLE)
                     / CAST(t.n_days AS DOUBLE)) * 1e6) AS BIGINT))
              AS BIGINT) AS ssd_micro
  FROM grid g
  JOIN dstat d ON d.event_type = g.event_type AND d.dow = g.dow
  JOIN tstat t ON t.event_type = g.event_type
  GROUP BY 1
)
SELECT d.event_type, d.dow, d.n_days_dow, d.sum_dow,
       round(CAST(d.sum_dow AS DOUBLE) / CAST(d.n_days_dow AS DOUBLE), 6)
         AS dow_mean,
       round(CAST(d.sum_dow AS DOUBLE) / CAST(d.n_days_dow AS DOUBLE)
             - CAST(t._s AS DOUBLE) / CAST(t.n_days AS DOUBLE), 6) AS seasonal,
       q.ssr_micro, q.ssd_micro,
       round(CASE WHEN q.ssd_micro > 0
             THEN greatest(0.0, 1.0 - CAST(q.ssr_micro AS DOUBLE)
                  / CAST(q.ssd_micro AS DOUBLE)) END, 6) AS strength
FROM dstat d
JOIN tstat t ON t.event_type = d.event_type
JOIN ssq q ON q.event_type = d.event_type
ORDER BY d.event_type, d.dow
"""


_HEAPS_CPS = 16  # doubling prefix-fraction checkpoints (2^(i-16) of the span)


def heaps_law_report(spark, sf):
    """Heaps'-law vocabulary-growth fit V = K·N^β (X134 — Herdan 1960 /
    Heaps 1978): how fast does the corpus keep minting NEW word types?
    The growth-side companion to X80's Zipf slope (the two exponents
    are duals under the power-law tail) and the capacity input to
    every vocab-size decision (X44-X47 tokenizers). β ≈ 0.5-0.8 for
    natural text; β → 1 flags boilerplate/ID-like token streams.
    NO data-wide sort: prefixes are doc_id-VALUE cuts at 16 doubling
    span fractions c_i = lo + span DIV 2^(16−i) − 1 (exact integer
    arithmetic off the 1-row bounds frame — roughly-geometric prefix
    sizes under any near-uniform id density, and V/N are EXACT for
    whatever prefix each cut defines). Per-token first_doc = min(doc_id)
    off one explode (vocab-scale); V(c)/N(c)/docs(c) via ≤16× fan-out
    joins of the vocab-/doc-count frames against the broadcast
    checkpoint frame (map-side combined to ≤16 rows — the token stream
    itself is never replicated). ln N, ln V are nano-quantized off
    exact BIGINTs (X90 discipline); the ≤16-point OLS runs its moment
    sums in DECIMAL(38,0)/HUGEINT (xy products overflow BIGINT at
    nano scale), β/lnK/R² the only floats, degenerate single-distinct-x
    and zero-variance-y cases NULL-guarded. Emits the checkpoint curve
    rows with the fit as constant columns (X118's shape). Reference
    analog: none — rebuild-only (SURVEY §2.13)."""
    from .functions.ngram import word_tokens

    d = _spread(t(spark, sf, "documents"))
    base = d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        word_tokens(F.col("text")).alias("_toks"),
    )
    per_doc = base.select(
        "doc_id", F.size("_toks").cast("long").alias("_nt")
    )
    first = (
        base.select("doc_id", F.explode("_toks").alias("_t"))
        .groupBy("_t")
        .agg(F.min("doc_id").cast("long").alias("_fd"))
    )
    bounds = per_doc.agg(
        F.min("doc_id").alias("_lo"), F.max("doc_id").alias("_hi")
    )
    cps = bounds.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).cast("long").alias("cp"),
                        (
                            F.col("_lo")
                            + F.expr(
                                f"(_hi - _lo + 1) DIV {2 ** (_HEAPS_CPS - i)}"
                            )
                            - F.lit(1)
                        )
                        .cast("long")
                        .alias("cut"),
                    )
                    for i in range(1, _HEAPS_CPS + 1)
                ]
            )
        ).alias("_s")
    ).select("_s.cp", "_s.cut")
    nn = (
        per_doc.crossJoin(F.broadcast(cps))
        .filter(F.col("doc_id") <= F.col("cut"))
        .groupBy("cp", "cut")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs_prefix"),
            F.sum("_nt").cast("long").alias("n_tokens"),
        )
    )
    vv = (
        first.crossJoin(F.broadcast(cps))
        .filter(F.col("_fd") <= F.col("cut"))
        .groupBy("cp")
        .agg(F.count(F.lit(1)).cast("long").alias("v_types"))
    )
    pts = (
        nn.join(vv, "cp")
        .filter((F.col("n_tokens") > 0) & (F.col("v_types") > 0))
        .select(
            "cp",
            "cut",
            "n_docs_prefix",
            "n_tokens",
            "v_types",
            F.round(F.log(F.col("n_tokens").cast("double")) * F.lit(1e9))
            .cast("long")
            .alias("x_nano"),
            F.round(F.log(F.col("v_types").cast("double")) * F.lit(1e9))
            .cast("long")
            .alias("y_nano"),
        )
    )
    dx = F.col("x_nano").cast("decimal(18,0)")
    dy = F.col("y_nano").cast("decimal(18,0)")
    mom = pts.agg(
        F.count(F.lit(1)).cast("long").alias("_m"),
        F.sum(dx).cast("decimal(38,0)").alias("_sx"),
        F.sum(dy).cast("decimal(38,0)").alias("_sy"),
        F.sum(dx * dx).cast("decimal(38,0)").alias("_sxx"),
        F.sum(dx * dy).cast("decimal(38,0)").alias("_sxy"),
        F.sum(dy * dy).cast("decimal(38,0)").alias("_syy"),
    )
    m = F.col("_m").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    sxx = F.col("_sxx").cast("double")
    sxy = F.col("_sxy").cast("double")
    syy = F.col("_syy").cast("double")
    den = m * sxx - sx * sx
    deny = m * syy - sy * sy
    beta = F.when(den != 0, (m * sxy - sx * sy) / den)
    lnk = F.when(den != 0, (sy - beta * sx) / m / F.lit(1e9))
    r2 = F.when(
        (den != 0) & (deny != 0),
        (m * sxy - sx * sy) * (m * sxy - sx * sy) / (den * deny),
    )
    fit = mom.select(
        F.col("_m").alias("n_points"),
        _r(beta).alias("beta"),
        _r(lnk).alias("log_k"),
        _r(r2).alias("r2"),
    )
    return (
        pts.crossJoin(F.broadcast(fit))
        .select(
            "cp",
            "cut",
            "n_docs_prefix",
            "n_tokens",
            "v_types",
            "x_nano",
            "y_nano",
            "n_points",
            "beta",
            "log_k",
            "r2",
        )
        .orderBy("cp")
    )


ORACLE_HEAPS_LAW = rf"""
WITH norm AS (
  SELECT doc_id,
         coalesce(trim(regexp_replace(regexp_replace(lower(text),
                  '[^\p{{L}} ]+', ' ', 'g'), '\s+', ' ', 'g')), '') AS t
  FROM documents
),
per_doc AS (
  SELECT doc_id,
         CASE WHEN length(t) > 0
              THEN CAST(len(string_split(t, ' ')) AS BIGINT)
              ELSE 0 END AS _nt
  FROM norm
),
first AS (
  SELECT tok AS _t, CAST(min(doc_id) AS BIGINT) AS _fd
  FROM (SELECT doc_id, UNNEST(string_split(t, ' ')) AS tok
        FROM norm WHERE length(t) > 0)
  GROUP BY 1
),
bounds AS (
  SELECT CAST(min(doc_id) AS BIGINT) AS _lo,
         CAST(max(doc_id) AS BIGINT) AS _hi
  FROM per_doc
),
cps AS (
  SELECT CAST(i AS BIGINT) AS cp,
         CAST(_lo + (_hi - _lo + 1) // CAST(pow(2, {_HEAPS_CPS} - i) AS BIGINT)
              - 1 AS BIGINT) AS cut
  FROM bounds, UNNEST(range(1, {_HEAPS_CPS} + 1)) AS u(i)
),
nn AS (
  SELECT cp, cut, CAST(count(*) AS BIGINT) AS n_docs_prefix,
         CAST(sum(_nt) AS BIGINT) AS n_tokens
  FROM per_doc CROSS JOIN cps
  WHERE doc_id <= cut GROUP BY 1, 2
),
vv AS (
  SELECT cp, CAST(count(*) AS BIGINT) AS v_types
  FROM first CROSS JOIN cps
  WHERE _fd <= cut GROUP BY 1
),
pts AS (
  SELECT nn.cp, nn.cut, nn.n_docs_prefix, nn.n_tokens, vv.v_types,
         CAST(round(ln(CAST(nn.n_tokens AS DOUBLE)) * 1e9) AS BIGINT) AS x_nano,
         CAST(round(ln(CAST(vv.v_types AS DOUBLE)) * 1e9) AS BIGINT) AS y_nano
  FROM nn JOIN vv ON vv.cp = nn.cp
  WHERE nn.n_tokens > 0 AND vv.v_types > 0
),
mom AS (
  SELECT CAST(count(*) AS BIGINT) AS _m,
         sum(CAST(x_nano AS HUGEINT)) AS _sx,
         sum(CAST(y_nano AS HUGEINT)) AS _sy,
         sum(CAST(x_nano AS HUGEINT) * CAST(x_nano AS HUGEINT)) AS _sxx,
         sum(CAST(x_nano AS HUGEINT) * CAST(y_nano AS HUGEINT)) AS _sxy,
         sum(CAST(y_nano AS HUGEINT) * CAST(y_nano AS HUGEINT)) AS _syy
  FROM pts
),
fit AS (
  SELECT _m AS n_points,
         CAST(_m AS DOUBLE) AS m, CAST(_sx AS DOUBLE) AS sx,
         CAST(_sy AS DOUBLE) AS sy, CAST(_sxx AS DOUBLE) AS sxx,
         CAST(_sxy AS DOUBLE) AS sxy, CAST(_syy AS DOUBLE) AS syy
  FROM mom
)
SELECT p.cp, p.cut, p.n_docs_prefix, p.n_tokens, p.v_types,
       p.x_nano, p.y_nano, f.n_points,
       round(CASE WHEN f.m * f.sxx - f.sx * f.sx <> 0
             THEN (f.m * f.sxy - f.sx * f.sy)
                  / (f.m * f.sxx - f.sx * f.sx) END, 6) AS beta,
       round(CASE WHEN f.m * f.sxx - f.sx * f.sx <> 0
             THEN (f.sy - (f.m * f.sxy - f.sx * f.sy)
                   / (f.m * f.sxx - f.sx * f.sx) * f.sx) / f.m / 1e9
             END, 6) AS log_k,
       round(CASE WHEN f.m * f.sxx - f.sx * f.sx <> 0
                   AND f.m * f.syy - f.sy * f.sy <> 0
             THEN (f.m * f.sxy - f.sx * f.sy) * (f.m * f.sxy - f.sx * f.sy)
                  / ((f.m * f.sxx - f.sx * f.sx)
                     * (f.m * f.syy - f.sy * f.sy)) END, 6) AS r2
FROM pts p CROSS JOIN fit f
ORDER BY p.cp
"""


def hellinger_report(spark, sf):
    """Per-source Hellinger distance + Bhattacharyya coefficient vs the
    pooled length distribution (X135 — Hellinger 1909; Bhattacharyya
    1943 BC = Σ√(p·q), H = √(1−BC), D_B = −ln BC): which feeds deviate
    from the corpus-wide length shape, on a PROPER METRIC bounded in
    [0,1]? The geometry-side member of the drift family — X85's JS is
    an f-divergence (no triangle inequality in raw form), X113's W₁ is
    displacement-sensitive, X92/X129's KS/CvM are ECDF gaps; Hellinger
    is the one that is simultaneously a true metric, bounded, and
    mass-overlap-interpretable (BC is the overlap integral). Counts
    collapse map-side to the bounded (source, n_chars) frame; pooled
    per-value counts broadcast back onto it; each term
    √(c_s(v)·c(v)) is one sqrt of an exact BIGINT product
    nano-quantized (X90 discipline) so the per-source sums are
    order-independent; BC = Σterm/(1e9·√(n_s·n)) and H/D_B are the
    only floats, the disjoint-support BC=0 case NULL-guards D_B (BC
    cannot exceed 1 except by nano noise — clamped with least()).
    Reference analog: none — rebuild-only (SURVEY §2.13)."""
    d = t(spark, sf, "documents").select("source", "n_chars")
    cs = d.groupBy("source", "n_chars").agg(
        F.count(F.lit(1)).cast("long").alias("_cs")
    )
    pooled = d.groupBy("n_chars").agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    ns = cs.groupBy("source").agg(F.sum("_cs").cast("long").alias("n_docs"))
    ntot = pooled.agg(F.sum("_c").cast("long").alias("_n"))
    terms = cs.join(F.broadcast(pooled), "n_chars").select(
        "source",
        F.round(F.sqrt((F.col("_cs") * F.col("_c")).cast("double")) * F.lit(1e9))
        .cast("long")
        .alias("_t"),
    )
    g = (
        terms.groupBy("source")
        .agg(F.sum("_t").cast("long").alias("bc_nano_sum"))
        .join(F.broadcast(ns), "source")
        .crossJoin(F.broadcast(ntot))
    )
    bc = F.least(
        F.lit(1.0),
        F.col("bc_nano_sum").cast("double")
        / (F.lit(1e9) * F.sqrt((F.col("n_docs") * F.col("_n")).cast("double"))),
    )
    return g.select(
        "source",
        "n_docs",
        "bc_nano_sum",
        _r(bc).alias("bhattacharyya_coef"),
        _r(F.sqrt(F.greatest(F.lit(0.0), F.lit(1.0) - bc))).alias("hellinger"),
        _r(F.when(bc > 0, -F.log(bc))).alias("bhattacharyya_dist"),
    ).orderBy("source")


ORACLE_HELLINGER = """
WITH cs AS (
  SELECT source, n_chars, CAST(count(*) AS BIGINT) AS _cs
  FROM documents GROUP BY 1, 2
),
pooled AS (
  SELECT n_chars, CAST(count(*) AS BIGINT) AS _c
  FROM documents GROUP BY 1
),
ns AS (
  SELECT source, CAST(sum(_cs) AS BIGINT) AS n_docs FROM cs GROUP BY 1
),
ntot AS (SELECT CAST(sum(_c) AS BIGINT) AS _n FROM pooled),
terms AS (
  SELECT cs.source,
         CAST(round(sqrt(CAST(cs._cs * p._c AS DOUBLE)) * 1e9) AS BIGINT) AS _t
  FROM cs JOIN pooled p ON p.n_chars = cs.n_chars
),
g AS (
  SELECT t.source, CAST(sum(t._t) AS BIGINT) AS bc_nano_sum
  FROM terms t GROUP BY 1
),
j AS (
  SELECT g.source, ns.n_docs, g.bc_nano_sum,
         least(1.0, CAST(g.bc_nano_sum AS DOUBLE)
               / (1e9 * sqrt(CAST(ns.n_docs * nt._n AS DOUBLE)))) AS bc
  FROM g JOIN ns ON ns.source = g.source CROSS JOIN ntot nt
)
SELECT source, n_docs, bc_nano_sum,
       round(bc, 6) AS bhattacharyya_coef,
       round(sqrt(greatest(0.0, 1.0 - bc)), 6) AS hellinger,
       round(CASE WHEN bc > 0 THEN -ln(bc) END, 6) AS bhattacharyya_dist
FROM j
ORDER BY source
"""


def cronbach_report(spark, sf):
    """Cronbach's α internal-consistency reliability across the three
    quality scorers + alpha-if-item-deleted diagnostics (X136 —
    Cronbach 1951; the tau-equivalent reliability ρ_T). X130's
    Friedman asks whether the scorers ORDER documents differently;
    Cronbach asks the complementary psychometric question — do they
    COVARY as measurements of one underlying "quality" construct
    (α ≥ 0.7 = conventionally fusable as a single scale; a higher
    α when an item is DROPPED flags that scorer as measuring
    something else). Same three scorers as X130 (en-stopword ratio,
    distinct-token ratio, raw alpha density), each quantized to an
    exact 1e4-grid integer (round(1e4·num/den) — doubles of exact
    integers, identical both engines); ONE codegen scan collapses
    map-side to eleven BIGINTs (n, three ΣS_j, three ΣQ_j, ΣT, ΣQ_T,
    three cross sums ΣC_il); the variance/covariance numerators
    n·Q − S² combine in DECIMAL(38,0)/HUGEINT (n·Q overflows BIGINT
    past ~500k docs at the 1e4 grid) and α = k/(k−1)·(1 − Σv_j/v_T),
    α_drop_j = 2·(1 − (v_i+v_l)/(v_i+v_l+2cov_il)) are the only
    floats, zero-variance denominators NULL-guarded. Unrankable
    blocks (0 tokens / empty text) dropped as in X130. Reference
    analog: none — rebuild-only (SURVEY §2.13)."""
    from .functions.ngram import normalize_for_scoring

    d = _spread(t(spark, sf, "documents"))
    nt_ = normalize_for_scoring(F.col("text"))
    toks = F.when(F.length(nt_) > 0, F.split(nt_, " ")).otherwise(
        F.array().cast("array<string>")
    )
    pat = r"\b(" + "|".join(STOPWORDS["en"]) + r")\b"
    base = d.select(
        F.size(F.regexp_extract_all(nt_, F.lit(pat), 0))
        .cast("long")
        .alias("a1"),
        F.size(F.array_distinct(toks)).cast("long").alias("a2"),
        F.size(toks).cast("long").alias("nt"),
        F.length(F.regexp_replace("text", "[^a-zA-Z]", ""))
        .cast("long")
        .alias("a3"),
        F.length("text").cast("long").alias("b3"),
    ).filter((F.col("nt") > 0) & (F.col("b3") > 0))
    q = base.select(
        F.round(F.col("a1").cast("double") / F.col("nt").cast("double") * 1e4)
        .cast("long")
        .alias("s1"),
        F.round(F.col("a2").cast("double") / F.col("nt").cast("double") * 1e4)
        .cast("long")
        .alias("s2"),
        F.round(F.col("a3").cast("double") / F.col("b3").cast("double") * 1e4)
        .cast("long")
        .alias("s3"),
    )
    g = q.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("s1").cast("long").alias("sum_stop"),
        F.sum("s2").cast("long").alias("sum_uniq"),
        F.sum("s3").cast("long").alias("sum_dens"),
        F.sum(F.col("s1") * F.col("s1")).cast("long").alias("_q1"),
        F.sum(F.col("s2") * F.col("s2")).cast("long").alias("_q2"),
        F.sum(F.col("s3") * F.col("s3")).cast("long").alias("_q3"),
        F.sum(F.col("s1") * F.col("s2")).cast("long").alias("_c12"),
        F.sum(F.col("s1") * F.col("s3")).cast("long").alias("_c13"),
        F.sum(F.col("s2") * F.col("s3")).cast("long").alias("_c23"),
    )

    def dec(c):
        return c.cast("decimal(38,0)")

    n = dec(F.col("n_docs"))
    v1 = n * dec(F.col("_q1")) - dec(F.col("sum_stop")) * dec(F.col("sum_stop"))
    v2 = n * dec(F.col("_q2")) - dec(F.col("sum_uniq")) * dec(F.col("sum_uniq"))
    v3 = n * dec(F.col("_q3")) - dec(F.col("sum_dens")) * dec(F.col("sum_dens"))
    c12 = n * dec(F.col("_c12")) - dec(F.col("sum_stop")) * dec(F.col("sum_uniq"))
    c13 = n * dec(F.col("_c13")) - dec(F.col("sum_stop")) * dec(F.col("sum_dens"))
    c23 = n * dec(F.col("_c23")) - dec(F.col("sum_uniq")) * dec(F.col("sum_dens"))
    vt = v1 + v2 + v3 + 2 * (c12 + c13 + c23)
    nn2 = (F.col("n_docs") * F.col("n_docs")).cast("double")

    def fv(x):
        return x.cast("double")

    alpha = F.when(fv(vt) != 0, F.lit(1.5) * (F.lit(1.0) - (fv(v1) + fv(v2) + fv(v3)) / fv(vt)))

    def drop(vi, vl, cil):
        den2 = fv(vi) + fv(vl) + 2.0 * fv(cil)
        return F.when(den2 != 0, F.lit(2.0) * (F.lit(1.0) - (fv(vi) + fv(vl)) / den2))

    return g.select(
        "n_docs",
        "sum_stop",
        "sum_uniq",
        "sum_dens",
        _r(F.when(n > 0, fv(v1) / nn2)).alias("var_stop"),
        _r(F.when(n > 0, fv(v2) / nn2)).alias("var_uniq"),
        _r(F.when(n > 0, fv(v3) / nn2)).alias("var_dens"),
        _r(F.when(n > 0, fv(vt) / nn2)).alias("var_total"),
        _r(alpha).alias("alpha"),
        _r(drop(v2, v3, c23)).alias("alpha_drop_stop"),
        _r(drop(v1, v3, c13)).alias("alpha_drop_uniq"),
        _r(drop(v1, v2, c12)).alias("alpha_drop_dens"),
    )


ORACLE_CRONBACH = r"""
WITH base AS (
  SELECT len(regexp_extract_all(t, '\b(the|over|quick|dog|fox)\b')) AS a1,
         len(list_distinct(string_split(t, ' '))) AS a2,
         len(string_split(t, ' ')) AS nt,
         length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS a3,
         length(text) AS b3
  FROM (
    SELECT text,
           coalesce(trim(regexp_replace(regexp_replace(lower(text),
                    '[^\p{L} ]+', ' ', 'g'), '\s+', ' ', 'g')), '') AS t
    FROM documents
  )
  WHERE length(coalesce(trim(regexp_replace(regexp_replace(lower(text),
               '[^\p{L} ]+', ' ', 'g'), '\s+', ' ', 'g')), '')) > 0
    AND length(text) > 0
),
q AS (
  SELECT CAST(round(CAST(a1 AS DOUBLE) / CAST(nt AS DOUBLE) * 1e4) AS BIGINT) AS s1,
         CAST(round(CAST(a2 AS DOUBLE) / CAST(nt AS DOUBLE) * 1e4) AS BIGINT) AS s2,
         CAST(round(CAST(a3 AS DOUBLE) / CAST(b3 AS DOUBLE) * 1e4) AS BIGINT) AS s3
  FROM base
),
g AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(s1) AS BIGINT) AS sum_stop,
         CAST(sum(s2) AS BIGINT) AS sum_uniq,
         CAST(sum(s3) AS BIGINT) AS sum_dens,
         CAST(sum(s1*s1) AS BIGINT) AS _q1,
         CAST(sum(s2*s2) AS BIGINT) AS _q2,
         CAST(sum(s3*s3) AS BIGINT) AS _q3,
         CAST(sum(s1*s2) AS BIGINT) AS _c12,
         CAST(sum(s1*s3) AS BIGINT) AS _c13,
         CAST(sum(s2*s3) AS BIGINT) AS _c23
  FROM q
),
v AS (
  SELECT *,
         CAST(n_docs AS HUGEINT) * _q1 - CAST(sum_stop AS HUGEINT) * sum_stop AS v1,
         CAST(n_docs AS HUGEINT) * _q2 - CAST(sum_uniq AS HUGEINT) * sum_uniq AS v2,
         CAST(n_docs AS HUGEINT) * _q3 - CAST(sum_dens AS HUGEINT) * sum_dens AS v3,
         CAST(n_docs AS HUGEINT) * _c12 - CAST(sum_stop AS HUGEINT) * sum_uniq AS c12,
         CAST(n_docs AS HUGEINT) * _c13 - CAST(sum_stop AS HUGEINT) * sum_dens AS c13,
         CAST(n_docs AS HUGEINT) * _c23 - CAST(sum_uniq AS HUGEINT) * sum_dens AS c23
  FROM g
),
w AS (
  SELECT *, v1 + v2 + v3 + 2 * (c12 + c13 + c23) AS vt FROM v
)
SELECT n_docs, sum_stop, sum_uniq, sum_dens,
       round(CASE WHEN n_docs > 0 THEN CAST(v1 AS DOUBLE)
             / CAST(n_docs * n_docs AS DOUBLE) END, 6) AS var_stop,
       round(CASE WHEN n_docs > 0 THEN CAST(v2 AS DOUBLE)
             / CAST(n_docs * n_docs AS DOUBLE) END, 6) AS var_uniq,
       round(CASE WHEN n_docs > 0 THEN CAST(v3 AS DOUBLE)
             / CAST(n_docs * n_docs AS DOUBLE) END, 6) AS var_dens,
       round(CASE WHEN n_docs > 0 THEN CAST(vt AS DOUBLE)
             / CAST(n_docs * n_docs AS DOUBLE) END, 6) AS var_total,
       round(CASE WHEN CAST(vt AS DOUBLE) <> 0
             THEN 1.5 * (1.0 - (CAST(v1 AS DOUBLE) + CAST(v2 AS DOUBLE)
                  + CAST(v3 AS DOUBLE)) / CAST(vt AS DOUBLE)) END, 6) AS alpha,
       round(CASE WHEN CAST(v2 AS DOUBLE) + CAST(v3 AS DOUBLE)
                       + 2.0 * CAST(c23 AS DOUBLE) <> 0
             THEN 2.0 * (1.0 - (CAST(v2 AS DOUBLE) + CAST(v3 AS DOUBLE))
                  / (CAST(v2 AS DOUBLE) + CAST(v3 AS DOUBLE)
                     + 2.0 * CAST(c23 AS DOUBLE))) END, 6) AS alpha_drop_stop,
       round(CASE WHEN CAST(v1 AS DOUBLE) + CAST(v3 AS DOUBLE)
                       + 2.0 * CAST(c13 AS DOUBLE) <> 0
             THEN 2.0 * (1.0 - (CAST(v1 AS DOUBLE) + CAST(v3 AS DOUBLE))
                  / (CAST(v1 AS DOUBLE) + CAST(v3 AS DOUBLE)
                     + 2.0 * CAST(c13 AS DOUBLE))) END, 6) AS alpha_drop_uniq,
       round(CASE WHEN CAST(v1 AS DOUBLE) + CAST(v2 AS DOUBLE)
                       + 2.0 * CAST(c12 AS DOUBLE) <> 0
             THEN 2.0 * (1.0 - (CAST(v1 AS DOUBLE) + CAST(v2 AS DOUBLE))
                  / (CAST(v1 AS DOUBLE) + CAST(v2 AS DOUBLE)
                     + 2.0 * CAST(c12 AS DOUBLE))) END, 6) AS alpha_drop_dens
FROM w
"""


_HILL_XMIN = 5  # tail threshold: tokens with count >= 5


def hill_tail_report(spark, sf):
    """Hill / power-law tail-index MLE over the token-frequency
    distribution (X137 — Hill 1975; the continuous MLE popularized for
    corpora by Clauset, Shalizi & Newman 2009 §3.1: α̂ = 1 + n/Σln(x/x_min),
    with the standard error (α̂−1)/√n): the MAXIMUM-LIKELIHOOD exponent
    complementing X80's Zipf log-log REGRESSION slope — CSN09's central
    warning is that the regression estimator is biased on heavy tails,
    so disagreement between the two is itself a fit audit. One explode
    to the vocab-scale token-count frame (the only data-bound leg),
    collapsed further to the freq-of-freq frame (m_c tokens at count c
    — X82 Good-Turing's shape); each tail term m_c·ln(c/x_min) is
    nano-quantized off exact BIGINTs (X90 discipline) so the sum is
    order-independent; α̂, its SE and the tail share are the only
    floats; an empty tail (no token reaches x_min=5) NULL-guards
    everything. Emits the tail freq-of-freq rows with the fit as
    constant columns (X118's shape). Reference analog: none —
    rebuild-only (SURVEY §2.13)."""
    from .functions.ngram import word_tokens

    d = _spread(t(spark, sf, "documents"))
    tc = (
        d.select(F.explode(word_tokens(F.col("text"))).alias("_t"))
        .groupBy("_t")
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
    )
    fof = tc.groupBy("_c").agg(F.count(F.lit(1)).cast("long").alias("m_c"))
    tot = fof.agg(
        F.sum("m_c").cast("long").alias("n_types"),
        F.sum(F.col("m_c") * F.col("_c")).cast("long").alias("n_tokens"),
    )
    tail = fof.filter(F.col("_c") >= _HILL_XMIN).select(
        F.col("_c").alias("count_value"),
        "m_c",
        (
            F.col("m_c")
            * F.round(
                F.log(F.col("_c").cast("double") / F.lit(float(_HILL_XMIN)))
                * F.lit(1e9)
            ).cast("long")
        )
        .cast("long")
        .alias("term_nano"),
    )
    agg = tail.agg(
        F.sum("m_c").cast("long").alias("n_tail"),
        F.sum("term_nano").cast("long").alias("sum_log_nano"),
    )
    a = F.when(
        F.col("sum_log_nano") > 0,
        F.lit(1.0)
        + F.col("n_tail").cast("double") * F.lit(1e9)
        / F.col("sum_log_nano").cast("double"),
    )
    fit = agg.crossJoin(F.broadcast(tot)).select(
        "n_tail",
        "sum_log_nano",
        "n_types",
        "n_tokens",
        _r(a).alias("alpha_hill"),
        _r(
            F.when(
                (F.col("sum_log_nano") > 0) & (F.col("n_tail") > 0),
                (a - F.lit(1.0)) / F.sqrt(F.col("n_tail").cast("double")),
            )
        ).alias("alpha_se"),
        _r(
            F.when(
                F.col("n_types") > 0,
                F.col("n_tail").cast("double") / F.col("n_types").cast("double"),
            )
        ).alias("tail_share"),
    )
    return (
        tail.crossJoin(F.broadcast(fit))
        .select(
            "count_value",
            "m_c",
            "term_nano",
            "n_tail",
            "n_types",
            "n_tokens",
            "alpha_hill",
            "alpha_se",
            "tail_share",
        )
        .orderBy("count_value")
    )


ORACLE_HILL_TAIL = rf"""
WITH norm AS (
  SELECT coalesce(trim(regexp_replace(regexp_replace(lower(text),
                  '[^\p{{L}} ]+', ' ', 'g'), '\s+', ' ', 'g')), '') AS t
  FROM documents
),
tc AS (
  SELECT tok AS _t, CAST(count(*) AS BIGINT) AS _c
  FROM (SELECT UNNEST(string_split(t, ' ')) AS tok
        FROM norm WHERE length(t) > 0)
  GROUP BY 1
),
fof AS (
  SELECT _c, CAST(count(*) AS BIGINT) AS m_c FROM tc GROUP BY 1
),
tot AS (
  SELECT CAST(sum(m_c) AS BIGINT) AS n_types,
         CAST(sum(m_c * _c) AS BIGINT) AS n_tokens
  FROM fof
),
tail AS (
  SELECT _c AS count_value, m_c,
         CAST(m_c * CAST(round(ln(CAST(_c AS DOUBLE)
              / {float(_HILL_XMIN)}) * 1e9) AS BIGINT) AS BIGINT) AS term_nano
  FROM fof WHERE _c >= {_HILL_XMIN}
),
agg AS (
  SELECT CAST(coalesce(sum(m_c), 0) AS BIGINT) AS n_tail,
         CAST(coalesce(sum(term_nano), 0) AS BIGINT) AS sum_log_nano
  FROM tail
),
fit AS (
  SELECT a.n_tail, a.sum_log_nano, t.n_types, t.n_tokens,
         CASE WHEN a.sum_log_nano > 0
              THEN 1.0 + CAST(a.n_tail AS DOUBLE) * 1e9
                   / CAST(a.sum_log_nano AS DOUBLE) END AS alpha_raw
  FROM agg a CROSS JOIN tot t
)
SELECT tl.count_value, tl.m_c, tl.term_nano,
       f.n_tail, f.n_types, f.n_tokens,
       round(f.alpha_raw, 6) AS alpha_hill,
       round(CASE WHEN f.sum_log_nano > 0 AND f.n_tail > 0
             THEN (f.alpha_raw - 1.0) / sqrt(CAST(f.n_tail AS DOUBLE))
             END, 6) AS alpha_se,
       round(CASE WHEN f.n_types > 0
             THEN CAST(f.n_tail AS DOUBLE) / CAST(f.n_types AS DOUBLE)
             END, 6) AS tail_share
FROM tail tl CROSS JOIN fit f
ORDER BY tl.count_value
"""


def mood_median_report(spark, sf):
    """Mood's median test across sources (X138 — Mood 1950 §16.4; the
    2×k chi-square on above/below-the-grand-median counts, exactly
    scipy.stats.median_test with its default ties='below'): do the
    sources share a MEDIAN length? The maximally-robust member of the
    k-sample location family — X111's ANOVA assumes normal+equal-var,
    X104's Kruskal-Wallis uses full ranks (more power, more
    assumptions), Mood's test survives any monotone distortion and
    arbitrary outliers because it keeps ONE bit per document. Grand
    median via X120's integer two-middle ×2 idiom on the pooled
    bounded-domain count frame (one unpartitioned window over distinct
    values only); ties at the median count as 'below' (scipy default,
    documented); per-source O_above/O_below are exact BIGINTs off the
    same (source, value) frame; each source's χ² contribution
    (O·N − n_s·M)²/(N·n_s·M) is a double of exact integers
    nano-quantized (X90 discipline) so the k-term sum is
    order-independent; one-sided degenerate marginals (all mass above
    or below) NULL-guard χ². Emits per-source rows with χ²/df as
    constant columns (X118's shape). Reference analog: none —
    rebuild-only (SURVEY §2.13)."""
    d = t(spark, sf, "documents").select("source", "n_chars")
    cell = d.groupBy("source", "n_chars").agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    pooled = cell.groupBy("n_chars").agg(F.sum("_c").cast("long").alias("_cp"))
    wc = W.orderBy("n_chars").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = pooled.select(
        "n_chars",
        "_cp",
        F.sum("_cp").over(wc).cast("long").alias("_cum"),
        F.sum("_cp").over(W.partitionBy()).cast("long").alias("_n"),
    )
    rlo = F.expr("(_n + 1) DIV 2")
    rhi = F.expr("(_n + 2) DIV 2")
    med = cum.select(
        F.when(
            (F.col("_cum") - F.col("_cp") < rlo) & (rlo <= F.col("_cum")),
            F.col("n_chars"),
        ).alias("_lo"),
        F.when(
            (F.col("_cum") - F.col("_cp") < rhi) & (rhi <= F.col("_cum")),
            F.col("n_chars"),
        ).alias("_hi"),
    ).agg((F.max("_lo") + F.max("_hi")).cast("long").alias("med2"))
    src = (
        cell.crossJoin(F.broadcast(med))
        .groupBy("source", "med2")
        .agg(
            F.sum(F.when(F.lit(2) * F.col("n_chars") > F.col("med2"), F.col("_c")))
            .cast("long")
            .alias("_oa"),
            F.sum(
                F.when(F.lit(2) * F.col("n_chars") <= F.col("med2"), F.col("_c"))
            )
            .cast("long")
            .alias("_ob"),
        )
        .select(
            "source",
            "med2",
            F.coalesce("_oa", F.lit(0)).cast("long").alias("n_above"),
            F.coalesce("_ob", F.lit(0)).cast("long").alias("n_below"),
        )
    )
    marg = src.agg(
        F.sum("n_above").cast("long").alias("_ta"),
        F.sum("n_below").cast("long").alias("_tb"),
        F.count(F.lit(1)).cast("long").alias("_k"),
    )
    j = src.crossJoin(F.broadcast(marg))
    ns = (F.col("n_above") + F.col("n_below")).cast("long")
    nn = (F.col("_ta") + F.col("_tb")).cast("long")
    da = (F.col("n_above") * nn - ns * F.col("_ta")).cast("double")
    db = (F.col("n_below") * nn - ns * F.col("_tb")).cast("double")
    dena = nn.cast("double") * ns.cast("double") * F.col("_ta").cast("double")
    denb = nn.cast("double") * ns.cast("double") * F.col("_tb").cast("double")
    ok = (F.col("_ta") > 0) & (F.col("_tb") > 0)
    term = F.when(ok, F.round((da * da / dena + db * db / denb) * F.lit(1e9)))
    rows = j.select(
        "source",
        "med2",
        "n_above",
        "n_below",
        _r(
            F.when(
                nn > 0,
                ns.cast("double") * F.col("_ta").cast("double") / nn.cast("double"),
            )
        ).alias("expected_above"),
        term.cast("long").alias("term_nano"),
        F.col("_k").alias("n_sources"),
        nn.alias("n_total"),
    )
    chi = rows.agg(
        F.sum("term_nano").cast("long").alias("_chi_nano"),
        F.max("n_sources").alias("_k2"),
    ).select(
        _r(F.col("_chi_nano").cast("double") / F.lit(1e9)).alias("chi2"),
        (F.col("_k2") - 1).cast("long").alias("df"),
    )
    return (
        rows.crossJoin(F.broadcast(chi))
        .select(
            "source",
            "med2",
            "n_above",
            "n_below",
            "expected_above",
            "term_nano",
            "n_sources",
            "n_total",
            "chi2",
            "df",
        )
        .orderBy("source")
    )


ORACLE_MOOD_MEDIAN = """
WITH cell AS (
  SELECT source, n_chars, CAST(count(*) AS BIGINT) AS _c
  FROM documents GROUP BY 1, 2
),
pooled AS (
  SELECT n_chars, CAST(sum(_c) AS BIGINT) AS _cp FROM cell GROUP BY 1
),
cum AS (
  SELECT n_chars, _cp,
         CAST(sum(_cp) OVER (ORDER BY n_chars
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS _cum,
         CAST(sum(_cp) OVER () AS BIGINT) AS _n
  FROM pooled
),
med AS (
  SELECT CAST(max(CASE WHEN _cum - _cp < (_n + 1) // 2
                        AND (_n + 1) // 2 <= _cum THEN n_chars END)
              + max(CASE WHEN _cum - _cp < (_n + 2) // 2
                          AND (_n + 2) // 2 <= _cum THEN n_chars END)
              AS BIGINT) AS med2
  FROM cum
),
src AS (
  SELECT c.source, m.med2,
         CAST(coalesce(sum(CASE WHEN 2 * c.n_chars > m.med2
                                THEN c._c END), 0) AS BIGINT) AS n_above,
         CAST(coalesce(sum(CASE WHEN 2 * c.n_chars <= m.med2
                                THEN c._c END), 0) AS BIGINT) AS n_below
  FROM cell c CROSS JOIN med m
  GROUP BY 1, 2
),
marg AS (
  SELECT CAST(sum(n_above) AS BIGINT) AS _ta,
         CAST(sum(n_below) AS BIGINT) AS _tb,
         CAST(count(*) AS BIGINT) AS _k
  FROM src
),
rows_ AS (
  SELECT s.source, s.med2, s.n_above, s.n_below,
         round(CASE WHEN m._ta + m._tb > 0
               THEN CAST(s.n_above + s.n_below AS DOUBLE)
                    * CAST(m._ta AS DOUBLE)
                    / CAST(m._ta + m._tb AS DOUBLE) END, 6) AS expected_above,
         CASE WHEN m._ta > 0 AND m._tb > 0 THEN
           CAST(round((CAST(s.n_above * (m._ta + m._tb)
                       - (s.n_above + s.n_below) * m._ta AS DOUBLE)
                       * CAST(s.n_above * (m._ta + m._tb)
                       - (s.n_above + s.n_below) * m._ta AS DOUBLE)
                       / (CAST(m._ta + m._tb AS DOUBLE)
                          * CAST(s.n_above + s.n_below AS DOUBLE)
                          * CAST(m._ta AS DOUBLE))
                     + CAST(s.n_below * (m._ta + m._tb)
                       - (s.n_above + s.n_below) * m._tb AS DOUBLE)
                       * CAST(s.n_below * (m._ta + m._tb)
                       - (s.n_above + s.n_below) * m._tb AS DOUBLE)
                       / (CAST(m._ta + m._tb AS DOUBLE)
                          * CAST(s.n_above + s.n_below AS DOUBLE)
                          * CAST(m._tb AS DOUBLE))) * 1e9) AS BIGINT)
         END AS term_nano,
         m._k AS n_sources,
         CAST(m._ta + m._tb AS BIGINT) AS n_total
  FROM src s CROSS JOIN marg m
),
chi AS (
  SELECT round(CAST(sum(term_nano) AS DOUBLE) / 1e9, 6) AS chi2,
         CAST(max(n_sources) - 1 AS BIGINT) AS df
  FROM rows_
)
SELECT r.source, r.med2, r.n_above, r.n_below, r.expected_above,
       r.term_nano, r.n_sources, r.n_total, c.chi2, c.df
FROM rows_ r CROSS JOIN chi c
ORDER BY r.source
"""


# X139: R/S window sizes and their hardcoded nano ln literals (X117
# discipline — neither engine evaluates ln on the x side of the fit).
_HURST_SIZES = (8, 16, 32)
_HURST_LN = {n: int(round(1e9 * math.log(n))) for n in _HURST_SIZES}


def hurst_rs_report(spark, sf):
    """Hurst rescaled-range exponent over per-type daily volume (X139 —
    Hurst 1951 via the Mandelbrot & Wallis 1969 block R/S estimator):
    is crawl volume PERSISTENT (H>0.5 — trends feed on themselves, the
    long-memory signature X116's short-lag ACF cannot separate from a
    regime shift), anti-persistent (H<0.5) or a memoryless walk
    (H≈0.5)? X115's dense zero-filled day grid ×3 dyadic window sizes
    {8,16,32} anchored at the span start (incomplete tail blocks
    dropped); within each block the cumulative deviation rides the
    X115 scaled-integer trick D_i = n·prefix_i − i·S_b (exact BIGINT,
    D_n = 0 by construction), R_scaled = max D − min D stays exact,
    and R/S = R_scaled/√(n·Q_b − S_b²) is one sqrt of exact integers
    per block, nano-quantized (X90) so the per-size block average is
    order-independent; zero-variance blocks dropped. H = OLS slope of
    ln(mean R/S) on ln n over the ≤3 size points — x-side lns are
    hardcoded nano literals, y-side nano-quantized, moments in
    DECIMAL(38,0)/HUGEINT; single-point types NULL-guarded. Emits the
    (type, size) curve with per-type H constants. Reference analog:
    none — rebuild-only (SURVEY §2.13)."""
    e = t(spark, sf, "events").select(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias("_d"),
    )
    cnt = e.groupBy("event_type", "_d").agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    bounds = e.agg(F.min("_d").alias("_lo"), F.max("_d").alias("_hi"))
    days = bounds.select(
        F.explode(F.sequence("_lo", "_hi")).alias("_d"), F.col("_lo")
    )
    types = cnt.select("event_type").distinct()
    grid = (
        types.crossJoin(F.broadcast(days))
        .join(cnt, ["event_type", "_d"], "left")
        .select(
            "event_type",
            "_d",
            (F.col("_d") - F.col("_lo")).cast("long").alias("_i"),
            F.coalesce("_c", F.lit(0)).cast("long").alias("_c"),
        )
    )
    sized = grid.select(
        "*",
        F.explode(
            F.array(*[F.lit(n).cast("long") for n in _HURST_SIZES])
        ).alias("size"),
    ).withColumn("blk", F.expr("_i DIV size"))
    wb = W.partitionBy("event_type", "size", "blk")
    wo = wb.orderBy("_d")
    rows = sized.select(
        "event_type",
        "size",
        "blk",
        F.row_number().over(wo).cast("long").alias("_pos"),
        F.sum("_c").over(wo.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("long")
        .alias("_pref"),
        F.sum("_c").over(wb).cast("long").alias("_sb"),
        F.sum(F.col("_c") * F.col("_c")).over(wb).cast("long").alias("_qb"),
        F.count(F.lit(1)).over(wb).cast("long").alias("_cnt"),
    ).filter(F.col("_cnt") == F.col("size"))
    dd = (F.col("size") * F.col("_pref") - F.col("_pos") * F.col("_sb")).cast(
        "long"
    )
    blocks = (
        rows.select("event_type", "size", "blk", "_sb", "_qb", dd.alias("_dd"))
        .groupBy("event_type", "size", "blk")
        .agg(
            (F.max("_dd") - F.min("_dd")).cast("long").alias("_r"),
            (F.max("size") * F.max("_qb") - F.max("_sb") * F.max("_sb"))
            .cast("long")
            .alias("_vn"),
        )
        .filter(F.col("_vn") > 0)
        .select(
            "event_type",
            "size",
            F.round(
                F.col("_r").cast("double")
                / F.sqrt(F.col("_vn").cast("double"))
                * F.lit(1e9)
            )
            .cast("long")
            .alias("_rs_nano"),
        )
    )
    per_size = blocks.groupBy("event_type", "size").agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.sum("_rs_nano").cast("long").alias("sum_rs_nano"),
    )
    mean_rs = F.col("sum_rs_nano").cast("double") / (
        F.lit(1e9) * F.col("n_blocks").cast("double")
    )
    xmap = F.when(F.col("size") == _HURST_SIZES[0], F.lit(_HURST_LN[8]))
    xmap = xmap.when(F.col("size") == _HURST_SIZES[1], F.lit(_HURST_LN[16]))
    xmap = xmap.when(F.col("size") == _HURST_SIZES[2], F.lit(_HURST_LN[32]))
    pts = per_size.select(
        "event_type",
        "size",
        "n_blocks",
        "sum_rs_nano",
        _r(mean_rs).alias("mean_rs"),
        xmap.cast("long").alias("x_nano"),
        F.round(F.log(mean_rs) * F.lit(1e9)).cast("long").alias("y_nano"),
    )
    dx = F.col("x_nano").cast("decimal(18,0)")
    dy = F.col("y_nano").cast("decimal(18,0)")
    mom = pts.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.sum(dx).cast("decimal(38,0)").alias("_sx"),
        F.sum(dy).cast("decimal(38,0)").alias("_sy"),
        F.sum(dx * dx).cast("decimal(38,0)").alias("_sxx"),
        F.sum(dx * dy).cast("decimal(38,0)").alias("_sxy"),
    )
    m = F.col("n_points").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    sxx = F.col("_sxx").cast("double")
    sxy = F.col("_sxy").cast("double")
    den = m * sxx - sx * sx
    fit = mom.select(
        "event_type",
        "n_points",
        _r(F.when(den != 0, (m * sxy - sx * sy) / den)).alias("hurst_h"),
    )
    return (
        pts.join(F.broadcast(fit), "event_type")
        .select(
            "event_type",
            "size",
            "n_blocks",
            "sum_rs_nano",
            "mean_rs",
            "x_nano",
            "y_nano",
            "n_points",
            "hurst_h",
        )
        .orderBy("event_type", "size")
    )


def _hurst_oracle() -> str:
    xcase = " ".join(
        f"WHEN {n} THEN {_HURST_LN[n]}" for n in _HURST_SIZES
    )
    sizes = ", ".join(str(n) for n in _HURST_SIZES)
    return f"""
WITH e AS (
  SELECT event_type,
         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS _d
  FROM events
),
cnt AS (
  SELECT event_type, _d, CAST(count(*) AS BIGINT) AS _c FROM e GROUP BY 1, 2
),
bounds AS (SELECT min(_d) AS _lo, max(_d) AS _hi FROM e),
days AS (
  SELECT CAST(unnest(range(_lo, _hi + 1)) AS BIGINT) AS _d, _lo FROM bounds
),
types AS (SELECT DISTINCT event_type FROM cnt),
grid AS (
  SELECT ty.event_type, dy._d, CAST(dy._d - dy._lo AS BIGINT) AS _i,
         CAST(coalesce(c._c, 0) AS BIGINT) AS _c
  FROM types ty CROSS JOIN days dy
  LEFT JOIN cnt c ON c.event_type = ty.event_type AND c._d = dy._d
),
sized AS (
  SELECT g.*, CAST(s.size AS BIGINT) AS size, g._i // s.size AS blk
  FROM grid g CROSS JOIN (SELECT unnest([{sizes}]) AS size) s
),
rows_ AS (
  SELECT event_type, size, blk,
         CAST(row_number() OVER w AS BIGINT) AS _pos,
         CAST(sum(_c) OVER (PARTITION BY event_type, size, blk ORDER BY _d
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS _pref,
         CAST(sum(_c) OVER wb AS BIGINT) AS _sb,
         CAST(sum(_c * _c) OVER wb AS BIGINT) AS _qb,
         CAST(count(*) OVER wb AS BIGINT) AS _cnt
  FROM sized
  WINDOW w AS (PARTITION BY event_type, size, blk ORDER BY _d),
         wb AS (PARTITION BY event_type, size, blk)
),
blocks AS (
  SELECT event_type, size, blk,
         CAST(max(size * _pref - _pos * _sb)
              - min(size * _pref - _pos * _sb) AS BIGINT) AS _r,
         CAST(max(size) * max(_qb) - max(_sb) * max(_sb) AS BIGINT) AS _vn
  FROM rows_ WHERE _cnt = size
  GROUP BY 1, 2, 3
),
rsn AS (
  SELECT event_type, size,
         CAST(round(CAST(_r AS DOUBLE) / sqrt(CAST(_vn AS DOUBLE)) * 1e9)
              AS BIGINT) AS _rs_nano
  FROM blocks WHERE _vn > 0
),
per_size AS (
  SELECT event_type, size, CAST(count(*) AS BIGINT) AS n_blocks,
         CAST(sum(_rs_nano) AS BIGINT) AS sum_rs_nano
  FROM rsn GROUP BY 1, 2
),
pts AS (
  SELECT event_type, size, n_blocks, sum_rs_nano,
         round(CAST(sum_rs_nano AS DOUBLE)
               / (1e9 * CAST(n_blocks AS DOUBLE)), 6) AS mean_rs,
         CAST(CASE size {xcase} END AS BIGINT) AS x_nano,
         CAST(round(ln(CAST(sum_rs_nano AS DOUBLE)
              / (1e9 * CAST(n_blocks AS DOUBLE))) * 1e9) AS BIGINT) AS y_nano
  FROM per_size
),
mom AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_points,
         sum(CAST(x_nano AS HUGEINT)) AS _sx,
         sum(CAST(y_nano AS HUGEINT)) AS _sy,
         sum(CAST(x_nano AS HUGEINT) * CAST(x_nano AS HUGEINT)) AS _sxx,
         sum(CAST(x_nano AS HUGEINT) * CAST(y_nano AS HUGEINT)) AS _sxy
  FROM pts GROUP BY 1
),
fit AS (
  SELECT event_type, n_points,
         round(CASE WHEN CAST(n_points AS DOUBLE) * CAST(_sxx AS DOUBLE)
                         - CAST(_sx AS DOUBLE) * CAST(_sx AS DOUBLE) <> 0
               THEN (CAST(n_points AS DOUBLE) * CAST(_sxy AS DOUBLE)
                     - CAST(_sx AS DOUBLE) * CAST(_sy AS DOUBLE))
                    / (CAST(n_points AS DOUBLE) * CAST(_sxx AS DOUBLE)
                       - CAST(_sx AS DOUBLE) * CAST(_sx AS DOUBLE))
               END, 6) AS hurst_h
  FROM mom
)
SELECT p.event_type, p.size, p.n_blocks, p.sum_rs_nano, p.mean_rs,
       p.x_nano, p.y_nano, f.n_points, f.hurst_h
FROM pts p JOIN fit f ON f.event_type = p.event_type
ORDER BY p.event_type, p.size
"""


ORACLE_HURST_RS = _hurst_oracle()


def ad_test_report(spark, sf, lang_a="en", lang_b="es"):
    """Two-sample Anderson-Darling statistic (X140 — Anderson & Darling
    1952 via Pettitt 1976's two-sample form: A² = (N/nm)·Σ_j
    (F_a−F_b)²/(H(1−H)) over the combined order statistics, H the
    pooled ECDF). Completes the ECDF drift trio on the en-vs-es length
    question: X92's KS sees the single worst gap, X129's CvM
    integrates all gaps EQUALLY, AD's 1/(H(1−H)) weight blows up at
    the DISTRIBUTION TAILS — the member that catches tail drift
    (truncation, contamination by extreme lengths) the other two
    underweight. Same bounded-domain machinery: per-value counts,
    full-outer merge, one cumulative window; the per-value A²
    contribution reduces algebraically to w·diff²/(n·m·cum·(N−cum))
    (diff = cum_a·n_b − cum_b·n_a, all BIGINT-exact) — an O(1)
    summand computed as a double of exact integers and nano-quantized
    (X90 discipline) so the sum is order-independent; the
    pooled-maximum block (cum = N, H = 1) is excluded exactly as the
    formula requires; A² = nano_sum/1e9, one-sided inputs
    NULL-guarded. No decision column: the two-sample AD null
    distribution is sample-size-dependent (Scholz & Stephens 1987) —
    A² is emitted as a comparable effect size, the X92/X129 reject
    flags carry the α=0.05 decisions. Reference analog: none —
    rebuild-only (SURVEY §2.13)."""
    d = t(spark, sf, "documents").select("lang", "n_chars")
    a = (
        d.filter(F.col("lang") == lang_a)
        .groupBy("n_chars")
        .agg(F.count(F.lit(1)).cast("long").alias("_ca"))
    )
    b = (
        d.filter(F.col("lang") == lang_b)
        .groupBy("n_chars")
        .agg(F.count(F.lit(1)).cast("long").alias("_cb"))
    )
    v = a.join(b, "n_chars", "full_outer").select(
        "n_chars",
        F.coalesce("_ca", F.lit(0)).cast("long").alias("_ca"),
        F.coalesce("_cb", F.lit(0)).cast("long").alias("_cb"),
    )
    w = W.orderBy("n_chars").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = v.select(
        "n_chars",
        (F.col("_ca") + F.col("_cb")).cast("long").alias("_w"),
        F.sum("_ca").over(w).cast("long").alias("_cuma"),
        F.sum("_cb").over(w).cast("long").alias("_cumb"),
    )
    tot = cum.agg(
        F.max("_cuma").cast("long").alias("n_a"),
        F.max("_cumb").cast("long").alias("n_b"),
        F.count(F.lit(1)).cast("long").alias("n_vals"),
    )
    j = cum.crossJoin(F.broadcast(tot))
    nn = (F.col("n_a") + F.col("n_b")).cast("long")
    cc = (F.col("_cuma") + F.col("_cumb")).cast("long")
    diff = (F.col("_cuma") * F.col("n_b") - F.col("_cumb") * F.col("n_a")).cast(
        "long"
    )
    ok = (F.col("n_a") > 0) & (F.col("n_b") > 0)
    # per-value A² contribution, algebraically reduced:
    # w·diff²/(n·m·cum·(N−cum)) — O(1) summands, nano-exact
    term = F.when(
        ok,
        F.col("_w").cast("double")
        * diff.cast("double")
        * diff.cast("double")
        / (
            F.col("n_a").cast("double")
            * F.col("n_b").cast("double")
            * cc.cast("double")
            * (nn - cc).cast("double")
        ),
    ).otherwise(F.lit(0.0))
    g = j.filter(cc < nn).groupBy("n_a", "n_b", "n_vals").agg(
        F.sum(F.round(term * F.lit(1e9)).cast("long"))
        .cast("long")
        .alias("sum_nano"),
        F.count(F.lit(1)).cast("long").alias("n_terms"),
    )
    return g.select(
        "n_a",
        "n_b",
        "n_vals",
        "n_terms",
        "sum_nano",
        _r(
            F.when(ok, F.col("sum_nano").cast("double") / F.lit(1e9))
        ).alias("a2_stat"),
    )


ORACLE_AD_TEST = """
WITH a AS (
  SELECT n_chars, CAST(count(*) AS BIGINT) AS ca
  FROM documents WHERE lang = 'en' GROUP BY 1
),
b AS (
  SELECT n_chars, CAST(count(*) AS BIGINT) AS cb
  FROM documents WHERE lang = 'es' GROUP BY 1
),
v AS (
  SELECT coalesce(a.n_chars, b.n_chars) AS val,
         coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
  FROM a FULL OUTER JOIN b ON a.n_chars = b.n_chars
),
cum AS (
  SELECT val, CAST(ca + cb AS BIGINT) AS w,
         CAST(sum(ca) OVER (ORDER BY val
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cuma,
         CAST(sum(cb) OVER (ORDER BY val
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumb
  FROM v
),
tot AS (
  SELECT CAST(max(cuma) AS BIGINT) AS n_a, CAST(max(cumb) AS BIGINT) AS n_b,
         CAST(count(*) AS BIGINT) AS n_vals
  FROM cum
),
g AS (
  SELECT n_a, n_b, n_vals,
         CAST(sum(CAST(round(CASE WHEN n_a > 0 AND n_b > 0
              THEN CAST(w AS DOUBLE)
                   * CAST(cuma * n_b - cumb * n_a AS DOUBLE)
                   * CAST(cuma * n_b - cumb * n_a AS DOUBLE)
                   / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
                      * CAST(cuma + cumb AS DOUBLE)
                      * CAST(n_a + n_b - cuma - cumb AS DOUBLE))
              ELSE 0.0 END * 1e9) AS BIGINT)) AS BIGINT) AS sum_nano,
         CAST(count(*) AS BIGINT) AS n_terms
  FROM cum CROSS JOIN tot
  WHERE cuma + cumb < n_a + n_b
  GROUP BY 1, 2, 3
)
SELECT n_a, n_b, n_vals, n_terms, sum_nano,
       round(CASE WHEN n_a > 0 AND n_b > 0
             THEN CAST(sum_nano AS DOUBLE) / 1e9 END, 6) AS a2_stat
FROM g
"""


_DELTA_WORDS = 30  # most-frequent-word panel size


def burrows_delta_report(spark, sf):
    """Burrows' Delta stylometric distance between source pairs (X141 —
    Burrows 2002, the standard authorship-attribution distance;
    Δ(s,t) = mean_w |z_s(w) − z_t(w)| over the M most frequent corpus
    words, z = per-word cross-source standardization): which feeds
    share a WRITING STYLE? Function-word profiles survive topic
    change, so Delta clusters template/boilerplate families that
    X125's vocabulary Jaccard (topic-driven) and X85's length JS
    (shape-driven) both miss — the standard pre-mixing provenance
    audit. One explode to the vocab-scale count frame (the only
    data-bound leg); the M=30 panel under the explicit (count DESC,
    token ASC) total order; per-source relative frequencies on the
    DENSE source×panel grid (zeros included — a missing function word
    IS a style signal) micro-quantized (×1e6) off exact BIGINTs;
    per-word cross-source moments stay BIGINT (Σf² bounded by K·10¹²);
    |z_s−z_t| = |f_s−f_t|·K/√(K·Σf²−(Σf)²) is one sqrt of exact
    integers per (pair, word), nano-quantized for an order-independent
    pair sum; all-sources-equal words (V=0) dropped, documented. Emits
    ordered pairs with Δ, the shared panel size and each pair's top
    contributing word. Reference analog: none — rebuild-only (SURVEY
    §2.13)."""
    from .functions.ngram import word_tokens

    d = _spread(t(spark, sf, "documents"))
    tc = (
        d.select("source", F.explode(word_tokens(F.col("text"))).alias("_t"))
        .groupBy("source", "_t")
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
    )
    totals = tc.groupBy("source").agg(F.sum("_c").cast("long").alias("_tt"))
    corpus = tc.groupBy("_t").agg(F.sum("_c").cast("long").alias("_cc"))
    panel = (
        corpus.orderBy(F.col("_cc").desc(), F.col("_t"))
        .limit(_DELTA_WORDS)
        .select("_t")
    )
    grid = (
        totals.crossJoin(F.broadcast(panel))
        .join(tc, ["source", "_t"], "left")
        .select(
            "source",
            "_t",
            "_tt",
            F.coalesce("_c", F.lit(0)).cast("long").alias("_c"),
        )
    )
    freq = grid.select(
        "source",
        "_t",
        F.round(F.col("_c").cast("double") / F.col("_tt").cast("double") * 1e6)
        .cast("long")
        .alias("_f"),
    )
    wstat = freq.groupBy("_t").agg(
        F.count(F.lit(1)).cast("long").alias("_k"),
        F.sum("_f").cast("long").alias("_sf"),
        F.sum(F.col("_f") * F.col("_f")).cast("long").alias("_qf"),
    ).withColumn(
        "_v", (F.col("_k") * F.col("_qf") - F.col("_sf") * F.col("_sf")).cast("long")
    ).filter(F.col("_v") > 0)
    fa = freq.toDF("source_a", "_t", "_fa")
    fb = freq.toDF("source_b", "_t", "_fb")
    pairs = (
        fa.join(fb, "_t")
        .filter(F.col("source_a") < F.col("source_b"))
        .join(F.broadcast(wstat.select("_t", "_k", "_v")), "_t")
        .select(
            "source_a",
            "source_b",
            "_t",
            F.round(
                F.abs(F.col("_fa") - F.col("_fb")).cast("double")
                * F.col("_k").cast("double")
                / F.sqrt(F.col("_v").cast("double"))
                * F.lit(1e9)
            )
            .cast("long")
            .alias("_z_nano"),
        )
    )
    g = pairs.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum("_z_nano").cast("long").alias("sum_z_nano"),
        F.max(F.struct(F.col("_z_nano"), F.col("_t"))).alias("_top"),
    )
    return g.select(
        "source_a",
        "source_b",
        "n_words",
        "sum_z_nano",
        _r(
            F.col("sum_z_nano").cast("double")
            / (F.lit(1e9) * F.col("n_words").cast("double"))
        ).alias("delta"),
        F.col("_top._t").alias("top_word"),
        F.col("_top._z_nano").alias("top_z_nano"),
    ).orderBy("source_a", "source_b")


ORACLE_BURROWS_DELTA = rf"""
WITH norm AS (
  SELECT source,
         coalesce(trim(regexp_replace(regexp_replace(lower(text),
                  '[^\p{{L}} ]+', ' ', 'g'), '\s+', ' ', 'g')), '') AS t
  FROM documents
),
tc AS (
  SELECT source, tok AS _t, CAST(count(*) AS BIGINT) AS _c
  FROM (SELECT source, UNNEST(string_split(t, ' ')) AS tok
        FROM norm WHERE length(t) > 0)
  GROUP BY 1, 2
),
totals AS (
  SELECT source, CAST(sum(_c) AS BIGINT) AS _tt FROM tc GROUP BY 1
),
panel AS (
  SELECT _t FROM (
    SELECT _t, CAST(sum(_c) AS BIGINT) AS _cc FROM tc GROUP BY 1
  ) ORDER BY _cc DESC, _t LIMIT {_DELTA_WORDS}
),
grid AS (
  SELECT s.source, p._t, s._tt, CAST(coalesce(tc._c, 0) AS BIGINT) AS _c
  FROM totals s CROSS JOIN panel p
  LEFT JOIN tc ON tc.source = s.source AND tc._t = p._t
),
freq AS (
  SELECT source, _t,
         CAST(round(CAST(_c AS DOUBLE) / CAST(_tt AS DOUBLE) * 1e6)
              AS BIGINT) AS _f
  FROM grid
),
wstat AS (
  SELECT _t, CAST(count(*) AS BIGINT) AS _k,
         CAST(sum(_f) AS BIGINT) AS _sf,
         CAST(sum(_f * _f) AS BIGINT) AS _qf
  FROM freq GROUP BY 1
),
wv AS (
  SELECT _t, _k, CAST(_k * _qf - _sf * _sf AS BIGINT) AS _v
  FROM wstat WHERE _k * _qf - _sf * _sf > 0
),
pairs AS (
  SELECT fa.source AS source_a, fb.source AS source_b, fa._t,
         CAST(round(CAST(abs(fa._f - fb._f) AS DOUBLE)
              * CAST(w._k AS DOUBLE) / sqrt(CAST(w._v AS DOUBLE)) * 1e9)
              AS BIGINT) AS _z_nano
  FROM freq fa
  JOIN freq fb ON fb._t = fa._t AND fa.source < fb.source
  JOIN wv w ON w._t = fa._t
),
g AS (
  SELECT source_a, source_b,
         CAST(count(*) AS BIGINT) AS n_words,
         CAST(sum(_z_nano) AS BIGINT) AS sum_z_nano,
         max({{'z': _z_nano, 't': _t}}) AS _top
  FROM pairs GROUP BY 1, 2
)
SELECT source_a, source_b, n_words, sum_z_nano,
       round(CAST(sum_z_nano AS DOUBLE)
             / (1e9 * CAST(n_words AS DOUBLE)), 6) AS delta,
       _top.t AS top_word,
       CAST(_top.z AS BIGINT) AS top_z_nano
FROM g
ORDER BY source_a, source_b
"""


def stem_fold_report(spark, sf):
    """Porter-lite stem folding + collision audit (X142 — the Porter
    1980 step-1 subset in functions/stem.py, chosen to be replayable
    byte-identically by Java regex AND RE2, i.e. no lookarounds): how
    much does suffix stripping FOLD the vocabulary, and which stems
    absorb the most surface forms? The vocabulary-normalization
    companion to X44-X47's subword tokenizers (stemming folds
    morphology where BPE splits it) and the input-size estimate for
    stem-keyed indexes (X72 BM25). One explode + distinct to the
    vocab-scale token frame (the only data-bound leg); the 6-rule
    regexp chain is pure codegen string work on that frame; top-10
    collision stems under the explicit (n_surface DESC, stem ASC)
    total order with a sort_array-forced 3-surface sample
    (collect_list order alone is NOT deterministic — the X123 pin);
    global fold constants (n_types, n_stems, reduction) attached to
    every row. Reference analog: none — rebuild-only (SURVEY §2.13)."""
    from .functions.ngram import word_tokens
    from .functions.stem import porter_lite

    d = _spread(t(spark, sf, "documents"))
    vocab = (
        d.select(F.explode(word_tokens(F.col("text"))).alias("_t"))
        .distinct()
        .select("_t", porter_lite(F.col("_t")).alias("stem"))
    )
    per_stem = vocab.groupBy("stem").agg(
        F.count(F.lit(1)).cast("long").alias("n_surface"),
        F.array_join(
            F.slice(F.sort_array(F.collect_list("_t")), 1, 3), "|"
        ).alias("surfaces"),
    )
    tot = per_stem.agg(
        F.sum("n_surface").cast("long").alias("n_types"),
        F.count(F.lit(1)).cast("long").alias("n_stems"),
    )
    top = (
        per_stem.orderBy(F.col("n_surface").desc(), F.col("stem"))
        .limit(10)
        .withColumn(
            "rank",
            F.row_number().over(
                W.orderBy(F.col("n_surface").desc(), F.col("stem"))
            ),
        )
    )
    return (
        top.crossJoin(F.broadcast(tot))
        .select(
            "rank",
            "stem",
            "n_surface",
            "surfaces",
            "n_types",
            "n_stems",
            _r(
                F.when(
                    F.col("n_types") > 0,
                    F.lit(1.0)
                    - F.col("n_stems").cast("double")
                    / F.col("n_types").cast("double"),
                )
            ).alias("reduction"),
        )
        .orderBy("rank")
    )


def _stem_fold_oracle() -> str:
    from .functions.stem import porter_lite_sql

    return rf"""
WITH norm AS (
  SELECT coalesce(trim(regexp_replace(regexp_replace(lower(text),
                  '[^\p{{L}} ]+', ' ', 'g'), '\s+', ' ', 'g')), '') AS t
  FROM documents
),
vocab AS (
  SELECT DISTINCT tok AS _t
  FROM (SELECT UNNEST(string_split(t, ' ')) AS tok
        FROM norm WHERE length(t) > 0)
),
stemmed AS (
  SELECT _t, {porter_lite_sql("_t")} AS stem FROM vocab
),
per_stem AS (
  SELECT stem, CAST(count(*) AS BIGINT) AS n_surface,
         array_to_string(list_sort(list(_t))[1:3], '|') AS surfaces
  FROM stemmed GROUP BY 1
),
tot AS (
  SELECT CAST(sum(n_surface) AS BIGINT) AS n_types,
         CAST(count(*) AS BIGINT) AS n_stems
  FROM per_stem
),
top AS (
  SELECT *, CAST(row_number() OVER (ORDER BY n_surface DESC, stem)
                 AS BIGINT) AS rank
  FROM per_stem
  ORDER BY n_surface DESC, stem LIMIT 10
)
SELECT CAST(rank AS INT) AS rank, stem, n_surface, surfaces,
       t.n_types, t.n_stems,
       round(CASE WHEN t.n_types > 0
             THEN 1.0 - CAST(t.n_stems AS DOUBLE)
                  / CAST(t.n_types AS DOUBLE) END, 6) AS reduction
FROM top CROSS JOIN tot t
ORDER BY rank
"""


ORACLE_STEM_FOLD = _stem_fold_oracle()


def binseg_report(spark, sf):
    """Binary-segmentation changepoint detection, two levels (X143 —
    Scott & Knott 1974 / Vostrikova 1981: recursively re-run the CUSUM
    scan inside each segment the previous split created — the standard
    multi-changepoint extension of X115's single-argmax, locating up
    to THREE mean shifts per event type where X115 stops at one).
    X115's dense zero-filled day grid; each pass is the identical
    exact-BIGINT machine — segment-local scaled centered prefix
    cus_k = D_seg·prefix_k − k·T_seg, argmax under the explicit
    (|cus| DESC, day ASC) total order with the always-zero k=D
    endpoint excluded — run once on the root span and once on the two
    child segments the root changepoint induces (days ≤ cp → 'L',
    else 'R'); segments shorter than 2 days emit no row (nothing to
    locate). The only float is the per-segment mean. One extra
    grid-scale pass per level, never a rescan of the raw events.
    Reference analog: none — rebuild-only (SURVEY §2.13)."""
    e = t(spark, sf, "events").select(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias("_d"),
    )
    cnt = e.groupBy("event_type", "_d").agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    bounds = e.agg(F.min("_d").alias("_lo"), F.max("_d").alias("_hi"))
    days = bounds.select(F.explode(F.sequence("_lo", "_hi")).alias("_d"))
    types = cnt.select("event_type").distinct()
    grid = (
        types.crossJoin(F.broadcast(days))
        .join(cnt, ["event_type", "_d"], "left")
        .select(
            "event_type", "_d", F.coalesce("_c", F.lit(0)).cast("long").alias("_c")
        )
    )

    def _pass(segdf, level):
        wo = W.partitionBy("event_type", "seg").orderBy("_d")
        wp = W.partitionBy("event_type", "seg")
        p = segdf.select(
            "event_type",
            "seg",
            "_d",
            F.sum("_c")
            .over(wo.rowsBetween(W.unboundedPreceding, W.currentRow))
            .cast("long")
            .alias("_pre"),
            F.row_number().over(wo).cast("long").alias("_k"),
            F.count(F.lit(1)).over(wp).cast("long").alias("_nd"),
            F.sum("_c").over(wp).cast("long").alias("_t"),
            F.min("_d").over(wp).cast("long").alias("seg_lo"),
            F.max("_d").over(wp).cast("long").alias("seg_hi"),
        )
        cus = p.select(
            "*",
            (F.col("_nd") * F.col("_pre") - F.col("_k") * F.col("_t"))
            .cast("long")
            .alias("_cus"),
        ).filter((F.col("_k") < F.col("_nd")) & (F.col("_nd") >= 2))
        return (
            cus.select(
                "*",
                F.row_number()
                .over(
                    W.partitionBy("event_type", "seg").orderBy(
                        F.abs("_cus").desc(), F.col("_d")
                    )
                )
                .alias("_rnk"),
            )
            .filter(F.col("_rnk") == 1)
            .select(
                "event_type",
                F.lit(level).cast("int").alias("level"),
                "seg",
                "seg_lo",
                "seg_hi",
                F.col("_nd").alias("n_days_seg"),
                F.col("_t").alias("seg_events"),
                F.col("_d").alias("cp_day"),
                F.col("_k").alias("cp_k"),
                F.col("_cus").alias("g_scaled"),
                F.abs("_cus").cast("long").alias("max_abs"),
                _r(F.col("_t").cast("double") / F.col("_nd").cast("double")).alias(
                    "seg_mean"
                ),
            )
        )

    root = _pass(grid.withColumn("seg", F.lit("root")), 1)
    split = grid.join(
        F.broadcast(root.select("event_type", F.col("cp_day").alias("_cp"))),
        "event_type",
    ).select(
        "event_type",
        "_d",
        "_c",
        F.when(F.col("_d") <= F.col("_cp"), F.lit("L"))
        .otherwise(F.lit("R"))
        .alias("seg"),
    )
    children = _pass(split, 2)
    return root.unionByName(children).orderBy("event_type", "level", "seg")


ORACLE_BINSEG = """
WITH e AS (
  SELECT event_type,
         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS _d
  FROM events
),
cnt AS (
  SELECT event_type, _d, CAST(count(*) AS BIGINT) AS _c FROM e GROUP BY 1, 2
),
bounds AS (SELECT min(_d) AS _lo, max(_d) AS _hi FROM e),
days AS (
  SELECT CAST(unnest(range(_lo, _hi + 1)) AS BIGINT) AS _d FROM bounds
),
types AS (SELECT DISTINCT event_type FROM cnt),
grid AS (
  SELECT ty.event_type, dy._d, CAST(coalesce(c._c, 0) AS BIGINT) AS _c
  FROM types ty CROSS JOIN days dy
  LEFT JOIN cnt c ON c.event_type = ty.event_type AND c._d = dy._d
),
p1 AS (
  SELECT event_type, 'root' AS seg, _d, _c,
         CAST(sum(_c) OVER (PARTITION BY event_type ORDER BY _d
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS _pre,
         CAST(row_number() OVER (PARTITION BY event_type ORDER BY _d)
              AS BIGINT) AS _k,
         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS _nd,
         CAST(sum(_c) OVER (PARTITION BY event_type) AS BIGINT) AS _t,
         CAST(min(_d) OVER (PARTITION BY event_type) AS BIGINT) AS seg_lo,
         CAST(max(_d) OVER (PARTITION BY event_type) AS BIGINT) AS seg_hi
  FROM grid
),
c1 AS (
  SELECT *, CAST(_nd * _pre - _k * _t AS BIGINT) AS _cus
  FROM p1 WHERE _k < _nd AND _nd >= 2
),
r1 AS (
  SELECT *, row_number() OVER (PARTITION BY event_type, seg
            ORDER BY abs(_cus) DESC, _d) AS _rnk
  FROM c1
),
root AS (
  SELECT event_type, CAST(1 AS INT) AS level, seg, seg_lo, seg_hi,
         _nd AS n_days_seg, _t AS seg_events, _d AS cp_day, _k AS cp_k,
         _cus AS g_scaled, CAST(abs(_cus) AS BIGINT) AS max_abs,
         round(CAST(_t AS DOUBLE) / CAST(_nd AS DOUBLE), 6) AS seg_mean
  FROM r1 WHERE _rnk = 1
),
split AS (
  SELECT g.event_type, g._d, g._c,
         CASE WHEN g._d <= r.cp_day THEN 'L' ELSE 'R' END AS seg
  FROM grid g JOIN root r ON r.event_type = g.event_type
),
p2 AS (
  SELECT event_type, seg, _d, _c,
         CAST(sum(_c) OVER (PARTITION BY event_type, seg ORDER BY _d
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS _pre,
         CAST(row_number() OVER (PARTITION BY event_type, seg ORDER BY _d)
              AS BIGINT) AS _k,
         CAST(count(*) OVER (PARTITION BY event_type, seg) AS BIGINT) AS _nd,
         CAST(sum(_c) OVER (PARTITION BY event_type, seg) AS BIGINT) AS _t,
         CAST(min(_d) OVER (PARTITION BY event_type, seg) AS BIGINT) AS seg_lo,
         CAST(max(_d) OVER (PARTITION BY event_type, seg) AS BIGINT) AS seg_hi
  FROM split
),
c2 AS (
  SELECT *, CAST(_nd * _pre - _k * _t AS BIGINT) AS _cus
  FROM p2 WHERE _k < _nd AND _nd >= 2
),
r2 AS (
  SELECT *, row_number() OVER (PARTITION BY event_type, seg
            ORDER BY abs(_cus) DESC, _d) AS _rnk
  FROM c2
),
children AS (
  SELECT event_type, CAST(2 AS INT) AS level, seg, seg_lo, seg_hi,
         _nd AS n_days_seg, _t AS seg_events, _d AS cp_day, _k AS cp_k,
         _cus AS g_scaled, CAST(abs(_cus) AS BIGINT) AS max_abs,
         round(CAST(_t AS DOUBLE) / CAST(_nd AS DOUBLE), 6) AS seg_mean
  FROM r2 WHERE _rnk = 1
)
SELECT * FROM root
UNION ALL
SELECT * FROM children
ORDER BY event_type, level, seg
"""


def yule_k_report(spark, sf):
    """Lexical-repetition constants per language (X144 — Yule 1944's
    characteristic K = 10⁴·(S₂−N)/N², Simpson 1949's D =
    (S₂−N)/(N(N−1)), Herdan 1960's C = lnV/lnN, plus hapax/dis
    legomena shares): the LENGTH-ROBUST repetitiveness fingerprints —
    K and D are (asymptotically) invariant under corpus-size change
    where raw TTR is not, so they compare languages/feeds of very
    different sizes honestly (the cross-lang companion to X83's
    within-corpus concentration and X134's growth exponent).
    Everything rides the per-lang freq-of-freq frame (m_c types at
    count c — one explode + two map-side-combined groupBys, the
    explode being the only data-bound leg): N = Σm·c, V = Σm,
    S₂ = Σm·c², m₁, m₂ all exact BIGINT; K/D are single float
    divisions of exact integers (N ≤ 1 NULL-guards D, N = 0 guards
    all); C is the ratio of two X90-nano-quantized logs (lnN = 0 at
    the single-token corpus NULL-guarded). Reference analog: none —
    rebuild-only (SURVEY §2.13)."""
    from .functions.ngram import word_tokens

    d = _spread(t(spark, sf, "documents"))
    tc = (
        d.select("lang", F.explode(word_tokens(F.col("text"))).alias("_t"))
        .groupBy("lang", "_t")
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
    )
    fof = tc.groupBy("lang", "_c").agg(
        F.count(F.lit(1)).cast("long").alias("_m")
    )
    g = fof.groupBy("lang").agg(
        F.sum(F.col("_m") * F.col("_c")).cast("long").alias("n_tokens"),
        F.sum("_m").cast("long").alias("v_types"),
        F.sum(F.col("_m") * F.col("_c") * F.col("_c")).cast("long").alias("s2"),
        F.sum(F.when(F.col("_c") == 1, F.col("_m"))).cast("long").alias("_m1"),
        F.sum(F.when(F.col("_c") == 2, F.col("_m"))).cast("long").alias("_m2"),
    )
    n = F.col("n_tokens")
    v = F.col("v_types")
    nd = n.cast("double")
    ln_n = F.round(F.log(nd) * F.lit(1e9)).cast("long")
    ln_v = F.round(F.log(v.cast("double")) * F.lit(1e9)).cast("long")
    return g.select(
        "lang",
        "n_tokens",
        "v_types",
        "s2",
        F.coalesce("_m1", F.lit(0)).cast("long").alias("hapax"),
        F.coalesce("_m2", F.lit(0)).cast("long").alias("dis"),
        _r(
            F.when(n > 0, F.lit(1e4) * (F.col("s2") - n).cast("double") / (nd * nd))
        ).alias("yule_k"),
        _r(
            F.when(
                n > 1,
                (F.col("s2") - n).cast("double") / (nd * (nd - F.lit(1.0))),
            )
        ).alias("simpson_d"),
        _r(
            F.when((n > 1) & (v > 0), ln_v.cast("double") / ln_n.cast("double"))
        ).alias("herdan_c"),
        _r(
            F.when(v > 0, F.coalesce("_m1", F.lit(0)).cast("double") / v.cast("double"))
        ).alias("hapax_share"),
        _r(
            F.when(v > 0, F.coalesce("_m2", F.lit(0)).cast("double") / v.cast("double"))
        ).alias("dis_share"),
    ).orderBy("lang")


ORACLE_YULE_K = r"""
WITH norm AS (
  SELECT lang,
         coalesce(trim(regexp_replace(regexp_replace(lower(text),
                  '[^\p{L} ]+', ' ', 'g'), '\s+', ' ', 'g')), '') AS t
  FROM documents
),
tc AS (
  SELECT lang, tok AS _t, CAST(count(*) AS BIGINT) AS _c
  FROM (SELECT lang, UNNEST(string_split(t, ' ')) AS tok
        FROM norm WHERE length(t) > 0)
  GROUP BY 1, 2
),
fof AS (
  SELECT lang, _c, CAST(count(*) AS BIGINT) AS _m FROM tc GROUP BY 1, 2
),
g AS (
  SELECT lang,
         CAST(sum(_m * _c) AS BIGINT) AS n_tokens,
         CAST(sum(_m) AS BIGINT) AS v_types,
         CAST(sum(_m * _c * _c) AS BIGINT) AS s2,
         CAST(coalesce(sum(CASE WHEN _c = 1 THEN _m END), 0) AS BIGINT) AS hapax,
         CAST(coalesce(sum(CASE WHEN _c = 2 THEN _m END), 0) AS BIGINT) AS dis
  FROM fof GROUP BY 1
)
SELECT lang, n_tokens, v_types, s2, hapax, dis,
       round(CASE WHEN n_tokens > 0
             THEN 1e4 * CAST(s2 - n_tokens AS DOUBLE)
                  / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE))
             END, 6) AS yule_k,
       round(CASE WHEN n_tokens > 1
             THEN CAST(s2 - n_tokens AS DOUBLE)
                  / (CAST(n_tokens AS DOUBLE) * (CAST(n_tokens AS DOUBLE) - 1.0))
             END, 6) AS simpson_d,
       round(CASE WHEN n_tokens > 1 AND v_types > 0
             THEN CAST(CAST(round(ln(CAST(v_types AS DOUBLE)) * 1e9) AS BIGINT)
                       AS DOUBLE)
                  / CAST(CAST(round(ln(CAST(n_tokens AS DOUBLE)) * 1e9) AS BIGINT)
                         AS DOUBLE)
             END, 6) AS herdan_c,
       round(CASE WHEN v_types > 0
             THEN CAST(hapax AS DOUBLE) / CAST(v_types AS DOUBLE) END, 6)
         AS hapax_share,
       round(CASE WHEN v_types > 0
             THEN CAST(dis AS DOUBLE) / CAST(v_types AS DOUBLE) END, 6)
         AS dis_share
FROM g
ORDER BY lang
"""


_DP_WORDS = 20  # dispersion panel: most frequent corpus words


def dispersion_report(spark, sf):
    """Gries' DP word dispersion across sources (X145 — Gries 2008
    "Dispersions and adjusted frequencies in corpora": DP_w =
    ½·Σ_i |v_i − s_i| with v the word's proportion distribution over
    corpus parts and s the part-size proportions, plus the
    DP_norm = DP/(1 − min s) normalization): is a word's frequency
    CORPUS-WIDE or an artifact of one feed? The corpus-linguistics
    dispersion audit complementing X128's TF-IDF (which asks what
    characterizes a source; DP asks the inverse — which "frequent"
    words are actually evenly earned). A raw frequency with high DP
    is exactly the word a stopword list or LM vocabulary should NOT
    trust. One explode to the (source, token) count frame; the
    M=20 panel under the explicit (count DESC, token ASC) total
    order; the DENSE source×panel grid includes zero counts (absence
    from a big part is the signal); the deviation sum stays an exact
    BIGINT numerator Σ|c_{i,w}·T − T_i·C_w| (exact while N² < 2^63,
    ~3e9 tokens — the one-line swap past that is DECIMAL(38,0));
    DP/DP_norm are single float divisions. Reference analog: none —
    rebuild-only (SURVEY §2.13)."""
    from .functions.ngram import word_tokens

    d = _spread(t(spark, sf, "documents"))
    tc = (
        d.select("source", F.explode(word_tokens(F.col("text"))).alias("_t"))
        .groupBy("source", "_t")
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
    )
    parts = tc.groupBy("source").agg(F.sum("_c").cast("long").alias("_ti"))
    tot = parts.agg(
        F.sum("_ti").cast("long").alias("_tt"),
        F.min("_ti").cast("long").alias("_tmin"),
    )
    corpus = tc.groupBy("_t").agg(F.sum("_c").cast("long").alias("c_total"))
    panel = (
        corpus.orderBy(F.col("c_total").desc(), F.col("_t"))
        .limit(_DP_WORDS)
        .select("_t", "c_total")
    )
    grid = (
        parts.crossJoin(F.broadcast(panel))
        .join(tc, ["source", "_t"], "left")
        .select(
            "source",
            "_t",
            "c_total",
            "_ti",
            F.coalesce("_c", F.lit(0)).cast("long").alias("_c"),
        )
    )
    dev = grid.crossJoin(F.broadcast(tot)).select(
        "_t",
        "c_total",
        "_tt",
        "_tmin",
        F.abs(F.col("_c") * F.col("_tt") - F.col("_ti") * F.col("c_total"))
        .cast("long")
        .alias("_nd"),
    )
    g = dev.groupBy("_t", "c_total", "_tt", "_tmin").agg(
        F.sum("_nd").cast("long").alias("nd_exact"),
        F.count(F.lit(1)).cast("long").alias("n_parts"),
    )
    dp = F.col("nd_exact").cast("double") / (
        F.lit(2.0) * F.col("c_total").cast("double") * F.col("_tt").cast("double")
    )
    smin = F.col("_tmin").cast("double") / F.col("_tt").cast("double")
    return g.select(
        F.col("_t").alias("word"),
        "c_total",
        "n_parts",
        "nd_exact",
        _r(dp).alias("dp"),
        _r(
            F.when(F.col("_tmin") < F.col("_tt"), dp / (F.lit(1.0) - smin))
        ).alias("dp_norm"),
    ).orderBy("word")


ORACLE_DISPERSION = rf"""
WITH norm AS (
  SELECT source,
         coalesce(trim(regexp_replace(regexp_replace(lower(text),
                  '[^\p{{L}} ]+', ' ', 'g'), '\s+', ' ', 'g')), '') AS t
  FROM documents
),
tc AS (
  SELECT source, tok AS _t, CAST(count(*) AS BIGINT) AS _c
  FROM (SELECT source, UNNEST(string_split(t, ' ')) AS tok
        FROM norm WHERE length(t) > 0)
  GROUP BY 1, 2
),
parts AS (
  SELECT source, CAST(sum(_c) AS BIGINT) AS _ti FROM tc GROUP BY 1
),
tot AS (
  SELECT CAST(sum(_ti) AS BIGINT) AS _tt, CAST(min(_ti) AS BIGINT) AS _tmin
  FROM parts
),
panel AS (
  SELECT _t, CAST(sum(_c) AS BIGINT) AS c_total
  FROM tc GROUP BY 1
  ORDER BY c_total DESC, _t LIMIT {_DP_WORDS}
),
grid AS (
  SELECT p.source, w._t, w.c_total, p._ti,
         CAST(coalesce(tc._c, 0) AS BIGINT) AS _c
  FROM parts p CROSS JOIN panel w
  LEFT JOIN tc ON tc.source = p.source AND tc._t = w._t
),
g AS (
  SELECT g._t, g.c_total, t._tt, t._tmin,
         CAST(sum(abs(g._c * t._tt - g._ti * g.c_total)) AS BIGINT)
           AS nd_exact,
         CAST(count(*) AS BIGINT) AS n_parts
  FROM grid g CROSS JOIN tot t
  GROUP BY 1, 2, 3, 4
)
SELECT _t AS word, c_total, n_parts, nd_exact,
       round(CAST(nd_exact AS DOUBLE)
             / (2.0 * CAST(c_total AS DOUBLE) * CAST(_tt AS DOUBLE)), 6)
         AS dp,
       round(CASE WHEN _tmin < _tt
             THEN CAST(nd_exact AS DOUBLE)
                  / (2.0 * CAST(c_total AS DOUBLE) * CAST(_tt AS DOUBLE))
                  / (1.0 - CAST(_tmin AS DOUBLE) / CAST(_tt AS DOUBLE))
             END, 6) AS dp_norm
FROM g
ORDER BY word
"""


def tukey_fences_report(spark, sf):
    """Tukey-fences outlier audit per source (X146 — Tukey 1977's
    boxplot rule: flag values outside [Q1 − 1.5·IQR, Q3 + 1.5·IQR]):
    how many documents per feed are LENGTH outliers, and where do the
    whiskers sit? The per-source robust-range audit complementing
    X120/X138's median-side tests and the pre-filter every length-cap
    decision (X27 gopher rules) consults. Quartiles are TYPE-1
    (inverse-ECDF) order statistics — the smallest value whose
    cumulative population reaches ceil(k·n/4), tie-inclusive, via one
    cumulative window over the bounded (source, n_chars) count frame
    (the X33 tertile idiom generalized) — so Q1/Q3 are exact BIGINTs
    from the value domain, no interpolation; the 1.5·IQR fences
    cross-multiply to the exact ×2 integer comparison 2v < 2·Q1 −
    3·IQR (and mirror above), so outlier counts are exact; the only
    floats are the 6dp shares. Reference analog: none — rebuild-only
    (SURVEY §2.13)."""
    d = t(spark, sf, "documents").select("source", "n_chars")
    cell = d.groupBy("source", "n_chars").agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    ws = W.partitionBy("source").orderBy("n_chars").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    cum = cell.select(
        "source",
        "n_chars",
        "_c",
        F.sum("_c").over(ws).cast("long").alias("_cum"),
        F.sum("_c").over(W.partitionBy("source")).cast("long").alias("_n"),
    )
    q1r = F.expr("CAST(ceil(_n / 4.0) AS BIGINT)")
    q3r = F.expr("CAST(ceil(3 * _n / 4.0) AS BIGINT)")
    qs = (
        cum.select(
            "source",
            F.when(
                (F.col("_cum") - F.col("_c") < q1r) & (q1r <= F.col("_cum")),
                F.col("n_chars"),
            ).alias("_q1"),
            F.when(
                (F.col("_cum") - F.col("_c") < q3r) & (q3r <= F.col("_cum")),
                F.col("n_chars"),
            ).alias("_q3"),
        )
        .groupBy("source")
        .agg(
            F.max("_q1").cast("long").alias("q1"),
            F.max("_q3").cast("long").alias("q3"),
        )
    )
    j = cell.join(F.broadcast(qs), "source")
    iqr = F.col("q3") - F.col("q1")
    low = F.lit(2) * F.col("n_chars") < F.lit(2) * F.col("q1") - F.lit(3) * iqr
    high = F.lit(2) * F.col("n_chars") > F.lit(2) * F.col("q3") + F.lit(3) * iqr
    g = j.groupBy("source", "q1", "q3").agg(
        F.sum("_c").cast("long").alias("n_docs"),
        F.min("n_chars").cast("long").alias("min_chars"),
        F.max("n_chars").cast("long").alias("max_chars"),
        F.sum(F.when(low, F.col("_c"))).cast("long").alias("_nlo"),
        F.sum(F.when(high, F.col("_c"))).cast("long").alias("_nhi"),
    )
    nlo = F.coalesce("_nlo", F.lit(0)).cast("long")
    nhi = F.coalesce("_nhi", F.lit(0)).cast("long")
    return g.select(
        "source",
        "n_docs",
        "min_chars",
        "q1",
        "q3",
        "max_chars",
        (F.col("q3") - F.col("q1")).cast("long").alias("iqr"),
        nlo.alias("n_low_outliers"),
        nhi.alias("n_high_outliers"),
        _r(
            F.when(
                F.col("n_docs") > 0,
                (nlo + nhi).cast("double") / F.col("n_docs").cast("double"),
            )
        ).alias("outlier_share"),
    ).orderBy("source")


ORACLE_TUKEY_FENCES = """
WITH cell AS (
  SELECT source, n_chars, CAST(count(*) AS BIGINT) AS _c
  FROM documents GROUP BY 1, 2
),
cum AS (
  SELECT source, n_chars, _c,
         CAST(sum(_c) OVER (PARTITION BY source ORDER BY n_chars
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS _cum,
         CAST(sum(_c) OVER (PARTITION BY source) AS BIGINT) AS _n
  FROM cell
),
qs AS (
  SELECT source,
         CAST(max(CASE WHEN _cum - _c < CAST(ceil(_n / 4.0) AS BIGINT)
                        AND CAST(ceil(_n / 4.0) AS BIGINT) <= _cum
                       THEN n_chars END) AS BIGINT) AS q1,
         CAST(max(CASE WHEN _cum - _c < CAST(ceil(3 * _n / 4.0) AS BIGINT)
                        AND CAST(ceil(3 * _n / 4.0) AS BIGINT) <= _cum
                       THEN n_chars END) AS BIGINT) AS q3
  FROM cum GROUP BY 1
),
g AS (
  SELECT c.source, q.q1, q.q3,
         CAST(sum(c._c) AS BIGINT) AS n_docs,
         CAST(min(c.n_chars) AS BIGINT) AS min_chars,
         CAST(max(c.n_chars) AS BIGINT) AS max_chars,
         CAST(coalesce(sum(CASE WHEN 2 * c.n_chars
                                     < 2 * q.q1 - 3 * (q.q3 - q.q1)
                                THEN c._c END), 0) AS BIGINT) AS nlo,
         CAST(coalesce(sum(CASE WHEN 2 * c.n_chars
                                     > 2 * q.q3 + 3 * (q.q3 - q.q1)
                                THEN c._c END), 0) AS BIGINT) AS nhi
  FROM cell c JOIN qs q ON q.source = c.source
  GROUP BY 1, 2, 3
)
SELECT source, n_docs, min_chars, q1, q3, max_chars,
       CAST(q3 - q1 AS BIGINT) AS iqr,
       nlo AS n_low_outliers, nhi AS n_high_outliers,
       round(CASE WHEN n_docs > 0
             THEN CAST(nlo + nhi AS DOUBLE) / CAST(n_docs AS DOUBLE)
             END, 6) AS outlier_share
FROM g
ORDER BY source
"""


def boxcox_report(spark, sf):
    """Box-Cox power-transform selection over document lengths (X147 —
    Box & Cox 1964: pick λ maximizing the profile log-likelihood
    LL(λ) = −(n/2)·ln σ̂²_λ + (λ−1)·Σln x over the grid
    λ ∈ {−1, −0.5, 0, 0.5, 1}): which power transform makes the
    length distribution most Gaussian? The normalization diagnostic
    upstream of every z-score consumer (X141's Delta, X93's moment
    machinery) — heavy-tailed web lengths usually elect λ ≤ 0 (log),
    and an elected λ = 1 is itself evidence the tail is already tame.
    Every transform is written WITHOUT pow(): v−1, 2(√v−1), ln v,
    2(1−1/√v), 1−1/v — sqrt/ln/division on doubles of exact integers,
    identical both engines. The value domain is bounded, so each
    (λ, v) pair gets one nano-quantized y (X90); S = Σc·y_nano stays
    BIGINT, Q = Σc·y_nano² runs in DECIMAL(38,0)/HUGEINT; LL is a
    double of the exact moments with the shared Σc·ln v nano leg;
    zero-variance grids NULL out. Emits the λ grid with the argmax
    (LL DESC, λ ASC) as constant columns; v ≤ 0 rows are excluded by
    construction (n_chars ≥ 1 filter, documented). Reference analog:
    none — rebuild-only (SURVEY §2.13)."""
    d = t(spark, sf, "documents").select("n_chars").filter(F.col("n_chars") >= 1)
    cell = d.groupBy("n_chars").agg(F.count(F.lit(1)).cast("long").alias("_c"))
    lam = F.explode(
        F.array(*[F.lit(x) for x in (-1.0, -0.5, 0.0, 0.5, 1.0)])
    ).alias("lam")
    vd = F.col("n_chars").cast("double")
    y = (
        F.when(F.col("lam") == -1.0, F.lit(1.0) - F.lit(1.0) / vd)
        .when(F.col("lam") == -0.5, F.lit(2.0) * (F.lit(1.0) - F.lit(1.0) / F.sqrt(vd)))
        .when(F.col("lam") == 0.0, F.log(vd))
        .when(F.col("lam") == 0.5, F.lit(2.0) * (F.sqrt(vd) - F.lit(1.0)))
        .otherwise(vd - F.lit(1.0))
    )
    e = cell.select("n_chars", "_c", lam).select(
        "lam",
        "_c",
        F.round(y * F.lit(1e9)).cast("long").alias("_y"),
        F.round(F.log(vd) * F.lit(1e9)).cast("long").alias("_lnv"),
    )
    g = e.groupBy("lam").agg(
        F.sum("_c").cast("long").alias("n_docs"),
        F.sum(F.col("_c") * F.col("_y")).cast("long").alias("s_nano"),
        F.sum(
            F.col("_c").cast("decimal(18,0)")
            * F.col("_y").cast("decimal(18,0)")
            * F.col("_y").cast("decimal(18,0)")
        )
        .cast("decimal(38,0)")
        .alias("_q"),
        F.sum(F.col("_c") * F.col("_lnv")).cast("long").alias("_l"),
    )
    n = F.col("n_docs").cast("double")
    var = (
        n * F.col("_q").cast("double")
        - F.col("s_nano").cast("double") * F.col("s_nano").cast("double")
    ) / (n * n) / F.lit(1e18)
    ll = F.when(
        var > 0,
        -n / F.lit(2.0) * F.log(var)
        + (F.col("lam") - F.lit(1.0)) * F.col("_l").cast("double") / F.lit(1e9),
    )
    pts = g.select(
        "lam",
        "n_docs",
        "s_nano",
        _r(ll).alias("ll"),
        ll.alias("_ll_raw"),
    )
    best = pts.filter(F.col("_ll_raw").isNotNull()).agg(
        F.max(F.struct(F.col("_ll_raw"), (-F.col("lam")).alias("_nl"))).alias("_b")
    ).select(
        (-F.col("_b._nl")).alias("best_lambda"),
        _r(F.col("_b._ll_raw")).alias("best_ll"),
    )
    return (
        pts.drop("_ll_raw")
        .crossJoin(F.broadcast(best))
        .orderBy("lam")
    )


ORACLE_BOXCOX = """
WITH cell AS (
  SELECT n_chars, CAST(count(*) AS BIGINT) AS _c
  FROM documents WHERE n_chars >= 1 GROUP BY 1
),
lams AS (SELECT CAST(UNNEST([-1.0, -0.5, 0.0, 0.5, 1.0]) AS DOUBLE) AS lam),
e AS (
  SELECT l.lam, c._c,
         CAST(round(CASE
           WHEN l.lam = -1.0 THEN 1.0 - 1.0 / CAST(c.n_chars AS DOUBLE)
           WHEN l.lam = -0.5 THEN 2.0 * (1.0 - 1.0 / sqrt(CAST(c.n_chars AS DOUBLE)))
           WHEN l.lam = 0.0 THEN ln(CAST(c.n_chars AS DOUBLE))
           WHEN l.lam = 0.5 THEN 2.0 * (sqrt(CAST(c.n_chars AS DOUBLE)) - 1.0)
           ELSE CAST(c.n_chars AS DOUBLE) - 1.0 END * 1e9) AS BIGINT) AS _y,
         CAST(round(ln(CAST(c.n_chars AS DOUBLE)) * 1e9) AS BIGINT) AS _lnv
  FROM cell c CROSS JOIN lams l
),
g AS (
  SELECT lam, CAST(sum(_c) AS BIGINT) AS n_docs,
         CAST(sum(_c * _y) AS BIGINT) AS s_nano,
         sum(CAST(_c AS HUGEINT) * CAST(_y AS HUGEINT) * CAST(_y AS HUGEINT))
           AS _q,
         CAST(sum(_c * _lnv) AS BIGINT) AS _l
  FROM e GROUP BY 1
),
pts AS (
  SELECT lam, n_docs, s_nano,
         CASE WHEN (CAST(n_docs AS DOUBLE) * CAST(_q AS DOUBLE)
                    - CAST(s_nano AS DOUBLE) * CAST(s_nano AS DOUBLE))
                   / (CAST(n_docs AS DOUBLE) * CAST(n_docs AS DOUBLE)) / 1e18
                   > 0
              THEN -CAST(n_docs AS DOUBLE) / 2.0
                   * ln((CAST(n_docs AS DOUBLE) * CAST(_q AS DOUBLE)
                         - CAST(s_nano AS DOUBLE) * CAST(s_nano AS DOUBLE))
                        / (CAST(n_docs AS DOUBLE) * CAST(n_docs AS DOUBLE))
                        / 1e18)
                   + (lam - 1.0) * CAST(_l AS DOUBLE) / 1e9
         END AS _ll_raw
  FROM g
),
best AS (
  SELECT -((max({'l': _ll_raw, 'nl': -lam})).nl) AS best_lambda,
         round((max({'l': _ll_raw, 'nl': -lam})).l, 6) AS best_ll
  FROM pts WHERE _ll_raw IS NOT NULL
)
SELECT p.lam, p.n_docs, p.s_nano, round(p._ll_raw, 6) AS ll,
       b.best_lambda, b.best_ll
FROM pts p CROSS JOIN best b
ORDER BY p.lam
"""


_CCF_MAX_LAG = 7


def ccf_leadlag_report(spark, sf):
    """Cross-correlation lead-lag detection between event-type pairs
    (X148 — Box & Jenkins 1970 ch.11 sample CCF r_ab(h) over per-type
    daily volume, lags −7..+7): does one event type LEAD another —
    do signups chase views by two days? The PAIRWISE extension of
    X116's single-series ACF and the temporal complement to X114's
    same-basket association rules. X115's dense zero-filled day grid;
    deviations ride the X116 D-scaled integer trick dev = D·c − T
    (exact BIGINT, the D² cancels in the ratio); per (pair, lag) the
    product sum Σ dev_a(t)·dev_b(t+h) over the overlap (standard CCF
    truncation) and the per-type Σdev² run in DECIMAL(38,0)/HUGEINT
    (dev² overflows BIGINT at ~2e8 events/day); r(h) = num/√(q_a·q_b)
    is the only float. The per-pair best lag needs NO float compare:
    within a pair every lag shares the denominator, so argmax |r| =
    argmax |num| — an exact decimal comparison under the explicit
    (|num| DESC, |h| ASC, h ASC) total order. num is emitted as a
    string (exact, beyond BIGINT range at scale). Zero-variance types
    NULL their ratios. Reference analog: none — rebuild-only (SURVEY
    §2.13)."""
    e = t(spark, sf, "events").select(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias("_d"),
    )
    cnt = e.groupBy("event_type", "_d").agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    bounds = e.agg(F.min("_d").alias("_lo"), F.max("_d").alias("_hi"))
    days = bounds.select(F.explode(F.sequence("_lo", "_hi")).alias("_d"))
    types = cnt.select("event_type").distinct()
    grid = (
        types.crossJoin(F.broadcast(days))
        .join(cnt, ["event_type", "_d"], "left")
        .select(
            "event_type", "_d", F.coalesce("_c", F.lit(0)).cast("long").alias("_c")
        )
    )
    wp = W.partitionBy("event_type")
    dev = grid.select(
        "event_type",
        "_d",
        (
            F.count(F.lit(1)).over(wp) * F.col("_c") - F.sum("_c").over(wp)
        )
        .cast("long")
        .alias("_dev"),
    )
    q = dev.groupBy("event_type").agg(
        F.sum(F.col("_dev").cast("decimal(18,0)") * F.col("_dev").cast("decimal(18,0)"))
        .cast("decimal(38,0)")
        .alias("_q")
    )
    lags = F.explode(
        F.sequence(F.lit(-_CCF_MAX_LAG), F.lit(_CCF_MAX_LAG))
    ).alias("lag")
    la = dev.toDF("type_a", "_d", "_deva").select(
        "type_a", "_d", "_deva", lags
    )
    rb = dev.toDF("type_b", "_db", "_devb")
    pairs = (
        la.join(rb, F.col("_db") == F.col("_d") + F.col("lag"))
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b", "lag")
        .agg(
            F.sum(
                F.col("_deva").cast("decimal(18,0)")
                * F.col("_devb").cast("decimal(18,0)")
            )
            .cast("decimal(38,0)")
            .alias("_num"),
            F.count(F.lit(1)).cast("long").alias("n_overlap"),
        )
    )
    j = (
        pairs.join(
            F.broadcast(q.toDF("type_a", "_qa")), "type_a"
        ).join(F.broadcast(q.toDF("type_b", "_qb")), "type_b")
    )
    ccf = F.when(
        (F.col("_qa") > 0) & (F.col("_qb") > 0),
        F.col("_num").cast("double")
        / (
            F.sqrt(F.col("_qa").cast("double"))
            * F.sqrt(F.col("_qb").cast("double"))
        ),
    )
    rows = j.select(
        "type_a",
        "type_b",
        F.col("lag").cast("long").alias("lag"),
        "n_overlap",
        F.col("_num").cast("string").alias("num_exact"),
        _r(ccf).alias("ccf"),
        F.abs(F.col("_num")).alias("_absnum"),
        ccf.alias("_ccf_raw"),
    )
    best = rows.groupBy("type_a", "type_b").agg(
        F.max(
            F.struct(
                F.col("_absnum"),
                (-F.abs(F.col("lag"))).alias("_nal"),
                (-F.col("lag")).alias("_nl"),
                F.col("_ccf_raw").alias("_cr"),
            )
        ).alias("_b")
    ).select(
        "type_a",
        "type_b",
        (-F.col("_b._nl")).cast("long").alias("best_lag"),
        _r(F.col("_b._cr")).alias("best_ccf"),
    )
    return (
        rows.drop("_absnum", "_ccf_raw")
        .join(F.broadcast(best), ["type_a", "type_b"])
        .orderBy("type_a", "type_b", "lag")
    )


ORACLE_CCF_LEADLAG = f"""
WITH e AS (
  SELECT event_type,
         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS _d
  FROM events
),
cnt AS (
  SELECT event_type, _d, CAST(count(*) AS BIGINT) AS _c FROM e GROUP BY 1, 2
),
bounds AS (SELECT min(_d) AS _lo, max(_d) AS _hi FROM e),
days AS (
  SELECT CAST(unnest(range(_lo, _hi + 1)) AS BIGINT) AS _d FROM bounds
),
types AS (SELECT DISTINCT event_type FROM cnt),
grid AS (
  SELECT ty.event_type, dy._d, CAST(coalesce(c._c, 0) AS BIGINT) AS _c
  FROM types ty CROSS JOIN days dy
  LEFT JOIN cnt c ON c.event_type = ty.event_type AND c._d = dy._d
),
dev AS (
  SELECT event_type, _d,
         CAST(count(*) OVER (PARTITION BY event_type) * _c
              - sum(_c) OVER (PARTITION BY event_type) AS BIGINT) AS _dev
  FROM grid
),
q AS (
  SELECT event_type,
         sum(CAST(_dev AS HUGEINT) * CAST(_dev AS HUGEINT)) AS _q
  FROM dev GROUP BY 1
),
lags AS (
  SELECT CAST(unnest(range(-{_CCF_MAX_LAG}, {_CCF_MAX_LAG} + 1)) AS BIGINT)
    AS lag
),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, l.lag,
         sum(CAST(a._dev AS HUGEINT) * CAST(b._dev AS HUGEINT)) AS _num,
         CAST(count(*) AS BIGINT) AS n_overlap
  FROM dev a CROSS JOIN lags l
  JOIN dev b ON b._d = a._d + l.lag AND a.event_type < b.event_type
  GROUP BY 1, 2, 3
),
rows_ AS (
  SELECT p.type_a, p.type_b, p.lag, p.n_overlap,
         CAST(p._num AS VARCHAR) AS num_exact,
         CASE WHEN qa._q > 0 AND qb._q > 0
              THEN CAST(p._num AS DOUBLE)
                   / (sqrt(CAST(qa._q AS DOUBLE)) * sqrt(CAST(qb._q AS DOUBLE)))
         END AS _ccf_raw,
         abs(p._num) AS _absnum
  FROM pairs p
  JOIN q qa ON qa.event_type = p.type_a
  JOIN q qb ON qb.event_type = p.type_b
),
best AS (
  SELECT type_a, type_b,
         -((max({{'a': _absnum, 'nal': -abs(lag), 'nl': -lag,
                 'cr': _ccf_raw}})).nl) AS best_lag,
         round((max({{'a': _absnum, 'nal': -abs(lag), 'nl': -lag,
                     'cr': _ccf_raw}})).cr, 6) AS best_ccf
  FROM rows_ GROUP BY 1, 2
)
SELECT r.type_a, r.type_b, r.lag, r.n_overlap, r.num_exact,
       round(r._ccf_raw, 6) AS ccf,
       CAST(b.best_lag AS BIGINT) AS best_lag, b.best_ccf
FROM rows_ r
JOIN best b ON b.type_a = r.type_a AND b.type_b = r.type_b
ORDER BY r.type_a, r.type_b, r.lag
"""


def pacf_report(spark, sf):
    """Partial autocorrelation of per-type daily volume, lags 1-3
    (X149 — the Durbin 1960 / Levinson recursion in its determinant
    closed forms: φ₁₁ = r₁, φ₂₂ = (r₂−r₁²)/(1−r₁²), φ₃₃ via the
    3×3 Toeplitz Cramer ratio): WHICH AR order explains the volume
    series? The ACF (X116) of an AR(1) decays at every lag — the
    PACF cuts off exactly past the true order, so this is the
    order-selection companion every Box-Jenkins identification step
    pairs with X116. Same exact machinery: X115's dense day grid,
    X116's D-scaled integer deviations, one equi-join for the three
    lag numerators — x₁..x₃ and the shared denominator d are exact
    BIGINTs, and because every r_h = x_h/d shares d, each φ is a
    ratio of small integer POLYNOMIALS in (x, d): φ₂₂ =
    (x₂d−x₁²)/(d²−x₁²), φ₃₃ = (x₃(d²−x₁²)+x₁x₂²−2x₁x₂d+x₁³)
    /(d³−2x₁²d−x₂²d+2x₁²x₂). The cubes pass BIGINT (~10⁵ events/day
    at a year span) so both engines evaluate them as identical
    doubles of exact integers; d=0, |r₁|=1 and singular-Toeplitz
    denominators NULL-guard their φ. Reference analog: none —
    rebuild-only (SURVEY §2.13)."""
    e = t(spark, sf, "events").select(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias("_d"),
    )
    cnt = e.groupBy("event_type", "_d").agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    bounds = e.agg(F.min("_d").alias("_lo"), F.max("_d").alias("_hi"))
    days = bounds.select(F.explode(F.sequence("_lo", "_hi")).alias("_d"))
    types = cnt.select("event_type").distinct()
    grid = (
        types.crossJoin(F.broadcast(days))
        .join(cnt, ["event_type", "_d"], "left")
        .select(
            "event_type", "_d", F.coalesce("_c", F.lit(0)).cast("long").alias("_c")
        )
    )
    wt = W.partitionBy("event_type")
    dev = grid.select(
        "event_type",
        "_d",
        (
            F.count(F.lit(1)).over(wt).cast("long") * F.col("_c")
            - F.sum("_c").over(wt).cast("long")
        )
        .cast("long")
        .alias("_dev"),
        F.count(F.lit(1)).over(wt).cast("long").alias("_nd"),
    )
    den = dev.groupBy("event_type").agg(
        F.sum(F.expr("_dev * _dev")).cast("long").alias("d"),
        F.max("_nd").cast("long").alias("n_days"),
    )
    lags = spark.range(1, 4).select(F.col("id").cast("long").alias("lag"))
    a = dev.crossJoin(F.broadcast(lags)).select(
        "event_type", "lag", (F.col("_d") + F.col("lag")).alias("_dj"), "_dev"
    )
    b = dev.toDF(*dev.columns).select(
        "event_type", F.col("_d").alias("_dj"), F.col("_dev").alias("_devb")
    )
    num = (
        a.join(b, ["event_type", "_dj"])
        .groupBy("event_type", "lag")
        .agg(F.sum(F.expr("_dev * _devb")).cast("long").alias("x"))
    )
    wide = (
        num.groupBy("event_type")
        .pivot("lag", [1, 2, 3])
        .agg(F.first("x"))
        .toDF("event_type", "x1", "x2", "x3")
        .join(F.broadcast(den), "event_type")
        .select(
            "event_type",
            "n_days",
            F.coalesce("x1", F.lit(0)).cast("long").alias("x1"),
            F.coalesce("x2", F.lit(0)).cast("long").alias("x2"),
            F.coalesce("x3", F.lit(0)).cast("long").alias("x3"),
            "d",
        )
    )
    x1 = F.col("x1").cast("double")
    x2 = F.col("x2").cast("double")
    x3 = F.col("x3").cast("double")
    dd = F.col("d").cast("double")
    p1 = F.when(F.col("d") != 0, x1 / dd)
    den2 = dd * dd - x1 * x1
    p2 = F.when((F.col("d") != 0) & (den2 != 0), (x2 * dd - x1 * x1) / den2)
    num3 = x3 * (dd * dd - x1 * x1) + x1 * x2 * x2 - 2.0 * x1 * x2 * dd + x1 * x1 * x1
    den3 = dd * dd * dd - 2.0 * x1 * x1 * dd - x2 * x2 * dd + 2.0 * x1 * x1 * x2
    p3 = F.when((F.col("d") != 0) & (den3 != 0), num3 / den3)
    return wide.select(
        "event_type",
        "n_days",
        "x1",
        "x2",
        "x3",
        "d",
        _r(p1).alias("pacf1"),
        _r(p2).alias("pacf2"),
        _r(p3).alias("pacf3"),
    ).orderBy("event_type")


ORACLE_PACF = """
WITH e AS (
  SELECT event_type,
         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS _d
  FROM events
),
cnt AS (
  SELECT event_type, _d, CAST(count(*) AS BIGINT) AS _c FROM e GROUP BY 1, 2
),
bounds AS (SELECT min(_d) AS _lo, max(_d) AS _hi FROM e),
days AS (
  SELECT CAST(unnest(range(_lo, _hi + 1)) AS BIGINT) AS _d FROM bounds
),
types AS (SELECT DISTINCT event_type FROM cnt),
grid AS (
  SELECT ty.event_type, dy._d, CAST(coalesce(c._c, 0) AS BIGINT) AS _c
  FROM types ty CROSS JOIN days dy
  LEFT JOIN cnt c ON c.event_type = ty.event_type AND c._d = dy._d
),
dev AS (
  SELECT event_type, _d,
         CAST(count(*) OVER (PARTITION BY event_type) * _c
              - sum(_c) OVER (PARTITION BY event_type) AS BIGINT) AS _dev,
         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS _nd
  FROM grid
),
den AS (
  SELECT event_type, CAST(sum(_dev * _dev) AS BIGINT) AS d,
         CAST(max(_nd) AS BIGINT) AS n_days
  FROM dev GROUP BY 1
),
num AS (
  SELECT a.event_type, l.lag, CAST(sum(a._dev * b._dev) AS BIGINT) AS x
  FROM dev a
  CROSS JOIN (SELECT CAST(unnest(range(1, 4)) AS BIGINT) AS lag) l
  JOIN dev b ON b.event_type = a.event_type AND b._d = a._d + l.lag
  GROUP BY 1, 2
),
wide AS (
  SELECT d.event_type, d.n_days,
         CAST(coalesce(max(CASE WHEN n.lag = 1 THEN n.x END), 0) AS BIGINT) AS x1,
         CAST(coalesce(max(CASE WHEN n.lag = 2 THEN n.x END), 0) AS BIGINT) AS x2,
         CAST(coalesce(max(CASE WHEN n.lag = 3 THEN n.x END), 0) AS BIGINT) AS x3,
         d.d
  FROM den d LEFT JOIN num n ON n.event_type = d.event_type
  GROUP BY 1, 2, 6
)
SELECT event_type, n_days, x1, x2, x3, d,
       round(CASE WHEN d <> 0
             THEN CAST(x1 AS DOUBLE) / CAST(d AS DOUBLE) END, 6) AS pacf1,
       round(CASE WHEN d <> 0 AND CAST(d AS DOUBLE) * CAST(d AS DOUBLE)
                  - CAST(x1 AS DOUBLE) * CAST(x1 AS DOUBLE) <> 0
             THEN (CAST(x2 AS DOUBLE) * CAST(d AS DOUBLE)
                   - CAST(x1 AS DOUBLE) * CAST(x1 AS DOUBLE))
                  / (CAST(d AS DOUBLE) * CAST(d AS DOUBLE)
                     - CAST(x1 AS DOUBLE) * CAST(x1 AS DOUBLE))
             END, 6) AS pacf2,
       round(CASE WHEN d <> 0
                  AND CAST(d AS DOUBLE) * CAST(d AS DOUBLE) * CAST(d AS DOUBLE)
                      - 2.0 * CAST(x1 AS DOUBLE) * CAST(x1 AS DOUBLE)
                        * CAST(d AS DOUBLE)
                      - CAST(x2 AS DOUBLE) * CAST(x2 AS DOUBLE)
                        * CAST(d AS DOUBLE)
                      + 2.0 * CAST(x1 AS DOUBLE) * CAST(x1 AS DOUBLE)
                        * CAST(x2 AS DOUBLE) <> 0
             THEN (CAST(x3 AS DOUBLE)
                   * (CAST(d AS DOUBLE) * CAST(d AS DOUBLE)
                      - CAST(x1 AS DOUBLE) * CAST(x1 AS DOUBLE))
                   + CAST(x1 AS DOUBLE) * CAST(x2 AS DOUBLE)
                     * CAST(x2 AS DOUBLE)
                   - 2.0 * CAST(x1 AS DOUBLE) * CAST(x2 AS DOUBLE)
                     * CAST(d AS DOUBLE)
                   + CAST(x1 AS DOUBLE) * CAST(x1 AS DOUBLE)
                     * CAST(x1 AS DOUBLE))
                  / (CAST(d AS DOUBLE) * CAST(d AS DOUBLE) * CAST(d AS DOUBLE)
                     - 2.0 * CAST(x1 AS DOUBLE) * CAST(x1 AS DOUBLE)
                       * CAST(d AS DOUBLE)
                     - CAST(x2 AS DOUBLE) * CAST(x2 AS DOUBLE)
                       * CAST(d AS DOUBLE)
                     + 2.0 * CAST(x1 AS DOUBLE) * CAST(x1 AS DOUBLE)
                       * CAST(x2 AS DOUBLE))
             END, 6) AS pacf3
FROM wide
ORDER BY event_type
"""


def dataset_card_report(spark, sf):
    """One-row dataset card (X150 — the composite release summary every
    published corpus ships, in the Gebru et al. 2021 "Datasheets for
    Datasets" spirit): corpus size (docs/tokens/types), provenance
    breadth (sources, langs, the top lang and its exact share under an
    explicit total order), exact duplicate rate (md5 of the
    X123-normalized text — the X6 fingerprint idiom), and the pooled
    type-1 length quartiles (X146's integer order statistics, no
    interpolation). Deliberately a COMPOSITION of the engine's
    established exact idioms in one query — the capstone entry that a
    release pipeline runs last, and a regression canary across five
    subsystems at once (token stream, fingerprints, bounded-domain
    order statistics, groupBys, argmax ordering). Every count is an
    exact BIGINT; the only floats are the 6dp shares/means. One corpus
    scan feeds the token/fingerprint legs; the quartile leg rides the
    bounded (n_chars) count frame. Reference analog: the per-volume
    stats row (/root/reference/parallel_processor.py:79-86) writ
    corpus-wide. (SURVEY §2.13)."""
    from .functions.ngram import normalize_for_scoring, word_tokens

    d = _spread(t(spark, sf, "documents"))
    nt_ = normalize_for_scoring(F.col("text"))
    base = d.select(
        "source",
        "lang",
        "n_chars",
        F.size(word_tokens(F.col("text"))).cast("long").alias("_ntok"),
        F.md5(nt_).alias("_fp"),
    )
    core = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("source").cast("long").alias("n_sources"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.sum("_ntok").cast("long").alias("n_tokens"),
        F.countDistinct("_fp").cast("long").alias("n_unique_texts"),
    )
    vocab = (
        d.select(F.explode(word_tokens(F.col("text"))).alias("_t"))
        .agg(F.countDistinct("_t").cast("long").alias("v_types"))
    )
    lang_top = (
        base.groupBy("lang")
        .agg(F.count(F.lit(1)).cast("long").alias("_lc"))
        .orderBy(F.col("_lc").desc(), F.col("lang"))
        .limit(1)
        .select(
            F.col("lang").alias("top_lang"), F.col("_lc").alias("top_lang_docs")
        )
    )
    cell = base.groupBy("n_chars").agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    wc = W.orderBy("n_chars").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = cell.select(
        "n_chars",
        "_c",
        F.sum("_c").over(wc).cast("long").alias("_cum"),
        F.sum("_c").over(W.partitionBy()).cast("long").alias("_n"),
    )

    def qsel(k):
        r = F.expr(f"CAST(ceil({k} * _n / 4.0) AS BIGINT)")
        return F.max(
            F.when(
                (F.col("_cum") - F.col("_c") < r) & (r <= F.col("_cum")),
                F.col("n_chars"),
            )
        ).cast("long")

    quart = cum.agg(
        qsel(1).alias("len_q1"), qsel(2).alias("len_q2"), qsel(3).alias("len_q3")
    )
    j = (
        core.crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(lang_top))
        .crossJoin(F.broadcast(quart))
    )
    nd = F.col("n_docs").cast("double")
    return j.select(
        "n_docs",
        "n_sources",
        "n_langs",
        "n_tokens",
        "v_types",
        "n_unique_texts",
        (F.col("n_docs") - F.col("n_unique_texts")).cast("long").alias("n_exact_dups"),
        _r(
            F.when(
                F.col("n_docs") > 0,
                (F.col("n_docs") - F.col("n_unique_texts")).cast("double") / nd,
            )
        ).alias("dup_rate"),
        "top_lang",
        "top_lang_docs",
        _r(
            F.when(F.col("n_docs") > 0, F.col("top_lang_docs").cast("double") / nd)
        ).alias("top_lang_share"),
        _r(
            F.when(F.col("n_docs") > 0, F.col("n_tokens").cast("double") / nd)
        ).alias("mean_tokens_per_doc"),
        "len_q1",
        "len_q2",
        "len_q3",
    )


ORACLE_DATASET_CARD = r"""
WITH norm AS (
  SELECT source, lang, n_chars,
         coalesce(trim(regexp_replace(regexp_replace(lower(text),
                  '[^\p{L} ]+', ' ', 'g'), '\s+', ' ', 'g')), '') AS t
  FROM documents
),
base AS (
  SELECT source, lang, n_chars,
         CASE WHEN length(t) > 0
              THEN CAST(len(string_split(t, ' ')) AS BIGINT) ELSE 0 END AS _ntok,
         md5(t) AS _fp
  FROM norm
),
core AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
         CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
         CAST(sum(_ntok) AS BIGINT) AS n_tokens,
         CAST(count(DISTINCT _fp) AS BIGINT) AS n_unique_texts
  FROM base
),
vocab AS (
  SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v_types
  FROM (SELECT UNNEST(string_split(t, ' ')) AS tok
        FROM norm WHERE length(t) > 0)
),
lang_top AS (
  SELECT lang AS top_lang, CAST(count(*) AS BIGINT) AS top_lang_docs
  FROM base GROUP BY 1 ORDER BY count(*) DESC, lang LIMIT 1
),
cell AS (
  SELECT n_chars, CAST(count(*) AS BIGINT) AS _c FROM base GROUP BY 1
),
cum AS (
  SELECT n_chars, _c,
         CAST(sum(_c) OVER (ORDER BY n_chars
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS _cum,
         CAST(sum(_c) OVER () AS BIGINT) AS _n
  FROM cell
),
quart AS (
  SELECT
    CAST(max(CASE WHEN _cum - _c < CAST(ceil(1 * _n / 4.0) AS BIGINT)
                   AND CAST(ceil(1 * _n / 4.0) AS BIGINT) <= _cum
                  THEN n_chars END) AS BIGINT) AS len_q1,
    CAST(max(CASE WHEN _cum - _c < CAST(ceil(2 * _n / 4.0) AS BIGINT)
                   AND CAST(ceil(2 * _n / 4.0) AS BIGINT) <= _cum
                  THEN n_chars END) AS BIGINT) AS len_q2,
    CAST(max(CASE WHEN _cum - _c < CAST(ceil(3 * _n / 4.0) AS BIGINT)
                   AND CAST(ceil(3 * _n / 4.0) AS BIGINT) <= _cum
                  THEN n_chars END) AS BIGINT) AS len_q3
  FROM cum
)
SELECT c.n_docs, c.n_sources, c.n_langs, c.n_tokens, v.v_types,
       c.n_unique_texts,
       CAST(c.n_docs - c.n_unique_texts AS BIGINT) AS n_exact_dups,
       round(CASE WHEN c.n_docs > 0
             THEN CAST(c.n_docs - c.n_unique_texts AS DOUBLE)
                  / CAST(c.n_docs AS DOUBLE) END, 6) AS dup_rate,
       lt.top_lang, lt.top_lang_docs,
       round(CASE WHEN c.n_docs > 0
             THEN CAST(lt.top_lang_docs AS DOUBLE)
                  / CAST(c.n_docs AS DOUBLE) END, 6) AS top_lang_share,
       round(CASE WHEN c.n_docs > 0
             THEN CAST(c.n_tokens AS DOUBLE)
                  / CAST(c.n_docs AS DOUBLE) END, 6) AS mean_tokens_per_doc,
       q.len_q1, q.len_q2, q.len_q3
FROM core c CROSS JOIN vocab v CROSS JOIN lang_top lt CROSS JOIN quart q
"""


# Registry order IS the driver contract: the correctness driver records only the
# FIRST 50 entries each round.  Alternation policy (VERDICT r2 item 1, executed
# every round since): the tail entries rotate back into the window next round,
# so every entry gets a driver row at least every other round.
# r5 rotation (EXECUTED at round start, per the plan recorded in r4):
#   - slots 0-10: the eleven born-in-tail r4 late additions (qdigest …
#     calibration) — first-ever driver rows;
#   - next: queries NEW in r5 (driver row in their birth round), inserted
#     as they land, each demoting the last stalwart into the overflow tail;
#   - remaining slots: r3-recorded stalwarts (oldest driver rows first);
#   - tail: the 50 r4-recorded entries + an explicitly-documented overflow
#     block (window 50, registry 111 — the every-other-round guarantee
#     bends this round; see the overflow comment inside the dict).
# NEVER insert a new query mid-dict outside the marked insertion point.
# r6 rotation plan (for whoever runs the next round): swap the 50-entry
# r4-recorded tail block (embedding_pair_topk .. triangle_count_report)
# into slots 0-49 and demote the r5-recorded window; NOTE the
# born-r5-late local-strict-only block has since grown to X104-X148
# (kruskal_report .. ccf_leadlag_report) — those 45 entries have never
# held a driver row and take priority over twice-recorded entries in
# any future window; the r5-demoted
# stalwarts (salted_source_stats .. lang_id_report, plus the late-r5
# positional demotions — each X72-X85 insertion pushed one more window
# stalwart into the overflow. The X102 insertion exhausted the window's
# stalwart supply (the r5-new block + the 11 r4-late entries now fill all
# 50 slots), so from X102 on each insertion instead swaps a window
# ROWS-ONLY entry into the overflow — a rows-only driver row certifies
# less than a fully-oracled hash row, and the swapped entries keep their
# pytest + local-strict evidence: phash_dedup_report (r5d X102 swap),
# link_graph_report (r5d X103 swap). Demotions to date:
# asof_attribution_report (r5d X101 insertion),
# quantile_gate_report (r5d X100 insertion),
# ppl_bucket_report (r5d X99 insertion),
# range_funnel_report (r5d X98 insertion),
# bpe_merge_report (r5d X97 insertion),
# line_dedup_report (r5d X96 insertion),
# contamination_report (r5d X95 insertion),
# repetition_report (r5d X94 insertion),
# domain_cap_report (r5d X93 insertion),
# pii_scrub_report (r5d X92 insertion),
# mixing_report, classifier_report,
# split_report, token_budget_report,
# user_sessions, packing_report,
# quality_buckets, value_counts_lang,
# order_value_quartiles, cube_status_priority, supplier_name_concat,
# minhash_pairs_md5, events_json_props, running_spend, quality_scores,
# streaming_extraction_report, customers_without_orders, dup_clusters,
# parts_above_type_avg, extraction_report) take priority over the
# 11-entry overflow block, whose members are 3 rounds unrecorded by
# then and MUST be included before any twice-recorded entry.
QUERIES = {
    # -- r5 rotation, slots 0-10: the eleven born-in-tail r4 late additions
    #    (qdigest … calibration) — their first-ever driver rows; born-round
    #    rows were impossible (the r4 window was frozen at r3-tail + r4-new) --
    "qdigest_quantile_report": qdigest_quantile_report,
    "zorder_key_report": zorder_key_report,
    "hits_report": hits_report,
    "trustrank_report": trustrank_report,
    "streaming_quantile_report": streaming_quantile_report,
    "drift_psi_report": drift_psi_report,
    "kcore_report": kcore_report,
    "robots_policy_report": robots_policy_report,
    "chunking_report": chunking_report,
    "langid_confusion_report": langid_confusion_report,
    "calibration_report": calibration_report,
    # -- new in r5 land HERE (driver row in their birth round); each insertion
    #    demotes the LAST stalwart below into the overflow tail --
    "winnow_report": winnow_report,
    "neardup_verify_report": neardup_verify_report,
    "blocklist_report": blocklist_report,
    "labelprop_report": labelprop_report,
    "streaming_sessions_report": streaming_sessions_report,
    "temperature_mixing_report": temperature_mixing_report,
    "rendezvous_shard_report": rendezvous_shard_report,
    "weighted_sample_report": weighted_sample_report,
    "moore_lewis_report": moore_lewis_report,
    "doremi_report": doremi_report,
    "diversity_report": diversity_report,
    "novelty_report": novelty_report,
    "boot_ci_report": boot_ci_report,
    "curation_funnel_report": curation_funnel_report,
    "neyman_sample_report": neyman_sample_report,
    "zipf_slope_report": zipf_slope_report,
    "burstiness_report": burstiness_report,
    "good_turing_report": good_turing_report,
    "lexical_concentration_report": lexical_concentration_report,
    "domain_concentration_report": domain_concentration_report,
    "domain_divergence_report": domain_divergence_report,
    "readability_report": readability_report,
    "pareto_frontier_report": pareto_frontier_report,
    "phrase_search_report": phrase_search_report,
    "llr_collocations_report": llr_collocations_report,
    "conditional_entropy_report": conditional_entropy_report,
    "rbo_report": rbo_report,
    "ks_test_report": ks_test_report,
    "spearman_report": spearman_report,
    "rrf_fusion_report": rrf_fusion_report,
    "auc_report": auc_report,
    "chi2_report": chi2_report,
    "bh_fdr_report": bh_fdr_report,
    "quantile_norm_report": quantile_norm_report,
    "isotonic_calibration_report": isotonic_calibration_report,
    "kendall_report": kendall_report,
    "mann_kendall_report": mann_kendall_report,
    "pr_curve_report": pr_curve_report,
    "brier_report": brier_report,
    # -- slots 11-49: r3-recorded stalwarts whose last driver row is two
    #    rounds old — the oldest rows in the registry --
    "asof_attribution_report": asof_attribution_report,
    "quantile_gate_report": quantile_gate_report,
    "ppl_bucket_report": ppl_bucket_report,
    "range_funnel_report": range_funnel_report,
    "bpe_merge_report": bpe_merge_report,
    "line_dedup_report": line_dedup_report,
    "contamination_report": contamination_report,
    "repetition_report": repetition_report,
    "domain_cap_report": domain_cap_report,
    "pii_scrub_report": pii_scrub_report,
    "mixing_report": mixing_report,
    "classifier_report": classifier_report,
    "split_report": split_report,
    "token_budget_report": token_budget_report,
    "user_sessions": user_sessions,
    "packing_report": packing_report,
    "quality_buckets": quality_buckets,
    "value_counts_lang": value_counts_lang,
    "order_value_quartiles": order_value_quartiles,
    "cube_status_priority": cube_status_priority,
    "supplier_name_concat": supplier_name_concat,
    "minhash_pairs_md5": minhash_pairs_md5,
    "events_json_props": events_json_props,
    "running_spend": running_spend,
    "quality_scores": quality_scores,
    "streaming_extraction_report": streaming_extraction_report,
    "customers_without_orders": customers_without_orders,
    "dup_clusters": dup_clusters,
    "parts_above_type_avg": parts_above_type_avg,
    "extraction_report": extraction_report,
    # -- rows-only entries swapped out of the window by late-r5 insertions
    #    (see the rotation comment): pytest + local-strict evidence only --
    "phash_dedup_report": phash_dedup_report,  # rows-only: binary payloads
    "link_graph_report": link_graph_report,  # rows-only: HTML inputs
    # -- born-r5-late, local-strict-only: the window is 50 fully-oracled
    #    entries with no expendable slot left; these carry pytest + the
    #    round-end `check_oracle --strict` full-registry run as evidence --
    "kruskal_report": kruskal_report,
    "survival_report": survival_report,
    "kappa_report": kappa_report,
    "ca_trend_report": ca_trend_report,
    "gains_report": gains_report,
    "fuzzy_link_report": fuzzy_link_report,
    "markov_report": markov_report,
    "anova_report": anova_report,
    "mcnemar_report": mcnemar_report,
    "wasserstein_report": wasserstein_report,
    "apriori_report": apriori_report,
    "cusum_report": cusum_report,
    "acf_report": acf_report,
    "benford_report": benford_report,
    "mutual_info_report": mutual_info_report,
    "theil_report": theil_report,
    "levene_report": levene_report,
    "cochran_q_report": cochran_q_report,
    "runs_test_report": runs_test_report,
    "url_canon_report": url_canon_report,
    "haar_report": haar_report,
    "vocab_overlap_report": vocab_overlap_report,
    "ols_trend_report": ols_trend_report,
    "durbin_watson_report": durbin_watson_report,
    "tfidf_top_report": tfidf_top_report,
    "cvm_test_report": cvm_test_report,
    "friedman_report": friedman_report,
    "kmv_distinct_report": kmv_distinct_report,
    "ewma_chart_report": ewma_chart_report,
    "dow_seasonality_report": dow_seasonality_report,
    "heaps_law_report": heaps_law_report,
    "hellinger_report": hellinger_report,
    "cronbach_report": cronbach_report,
    "hill_tail_report": hill_tail_report,
    "mood_median_report": mood_median_report,
    "hurst_rs_report": hurst_rs_report,
    "ad_test_report": ad_test_report,
    "burrows_delta_report": burrows_delta_report,
    "stem_fold_report": stem_fold_report,
    "binseg_report": binseg_report,
    "yule_k_report": yule_k_report,
    "dispersion_report": dispersion_report,
    "tukey_fences_report": tukey_fences_report,
    "boxcox_report": boxcox_report,
    "ccf_leadlag_report": ccf_leadlag_report,
    "pacf_report": pacf_report,
    "dataset_card_report": dataset_card_report,
    # -- tail: the 50 r4-recorded entries sitting out one round --
    "embedding_pair_topk": embedding_pair_topk,
    "band_filter_fallback": band_filter_fallback,
    "challenging_docs": challenging_docs,
    "ivf_ann_topk": ivf_ann_topk,
    "ann_index_topk": ann_index_topk,
    "embedding_near_dup_report": embedding_near_dup_report,
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier_volume": q5_local_supplier_volume,
    "q6_forecast_revenue": q6_forecast_revenue,
    "top_docs_by_len": top_docs_by_len,
    "corr_trend": corr_trend,
    "per_group_sample": per_group_sample,
    "deterministic_sample_50": deterministic_sample_50,
    "union_distinct_keys": union_distinct_keys,
    "events_hourly": events_hourly,
    "conf_scale_normalize": conf_scale_normalize,
    "order_gaps_lag": order_gaps_lag,
    "rollup_nation_totals": rollup_nation_totals,
    "group_moment_stats": group_moment_stats,
    "threshold_buckets": threshold_buckets,
    "validity_classes": validity_classes,
    "top_langs_per_source": top_langs_per_source,
    "value_histogram": value_histogram,
    "event_dow_matrix": event_dow_matrix,
    "bpe_encode_report": bpe_encode_report,
    "exact_substr_report": exact_substr_report,
    "bpe_packing_report": bpe_packing_report,
    "exact_substr_keep_one_report": exact_substr_keep_one_report,
    "gopher_rules_report": gopher_rules_report,
    "dsir_selection_report": dsir_selection_report,
    "semdedup_report": semdedup_report,
    "unigram_tokenizer_report": unigram_tokenizer_report,
    "pq_ann_topk": pq_ann_topk,
    "ivfpq_ann_topk": ivfpq_ann_topk,
    "wordpiece_encode_report": wordpiece_encode_report,
    "bloom_contamination_report": bloom_contamination_report,
    "hll_distinct_report": hll_distinct_report,
    "cms_heavy_hitters_report": cms_heavy_hitters_report,
    "bm25_search_report": bm25_search_report,
    "pmi_collocations_report": pmi_collocations_report,
    "tfidf_pair_report": tfidf_pair_report,
    "kn_perplexity_report": kn_perplexity_report,
    "streaming_hll_report": streaming_hll_report,
    "snapshot_diff_report": snapshot_diff_report,
    "pagerank_report": pagerank_report,
    "streaming_cms_report": streaming_cms_report,
    "incremental_dedup_report": incremental_dedup_report,
    "cohort_retention_report": cohort_retention_report,
    "triangle_count_report": triangle_count_report,
    # -- overflow (the every-other-round guarantee bends: 50-slot window,
    #    111 entries): eleven r3-recorded entries stay tail-side, chosen
    #    because their driver rows are the least informative —
    #    training_export/media_*/minhash_pairs/simhash_pairs/lsh_ann_topk
    #    are rows-only (no_oracle) with pytest goldens and in-window md5
    #    twins; salted_join_stats shares the salting family with in-window
    #    salted_source_stats; sql_summary/sql_quality_matrix are SQL
    #    passthrough views; fingerprint_stats/enrich_union_stats are
    #    unchanged two-round-green aggs. All re-verified by
    #    `tools/check_oracle.py --strict` (full registry) this round.
    #    r5-new insertions demote stalwarts here (newest demotion first);
    #    each demoted entry is r3-recorded + two-round-green + locally
    #    strict-verified this round. --
    "train_lm": train_lm,
    "perplexity_report": perplexity_report,
    "token_stats": token_stats,
    "lang_id_report": lang_id_report,
    "exact_dup_stats": exact_dup_stats,
    "ngram_jaccard_small": ngram_jaccard_small,
    "simhash_pairs_md5": simhash_pairs_md5,
    "embedding_topk": embedding_topk,
    "salted_source_stats": salted_source_stats,
    "training_export_summary": training_export_summary,
    "media_features_report": media_features_report,
    "media_frame_sample_report": media_frame_sample_report,
    "minhash_pairs": minhash_pairs,
    "simhash_pairs": simhash_pairs,
    "lsh_ann_topk": lsh_ann_topk,
    "salted_join_stats": salted_join_stats,
    "sql_summary": sql_summary,
    "sql_quality_matrix": sql_quality_matrix,
    "fingerprint_stats": fingerprint_stats,
    "enrich_union_stats": enrich_union_stats,
}

ORACLES = {
    "contamination_report": ORACLE_CONTAMINATION_REPORT,
    "bloom_contamination_report": ORACLE_BLOOM_CONTAMINATION_REPORT,
    "hll_distinct_report": ORACLE_HLL_DISTINCT_REPORT,
    "cms_heavy_hitters_report": ORACLE_CMS_HEAVY_HITTERS,
    "bm25_search_report": _oracle_bm25(),
    "pmi_collocations_report": ORACLE_PMI_COLLOCATIONS,
    "tfidf_pair_report": ORACLE_TFIDF_PAIR_REPORT,
    "kn_perplexity_report": ORACLE_KN_PERPLEXITY_REPORT,
    "streaming_hll_report": ORACLE_STREAMING_HLL_REPORT,
    "snapshot_diff_report": ORACLE_SNAPSHOT_DIFF_REPORT,
    "pagerank_report": ORACLE_PAGERANK_REPORT,
    "streaming_cms_report": ORACLE_STREAMING_CMS_REPORT,
    "incremental_dedup_report": ORACLE_INCREMENTAL_DEDUP_REPORT,
    "cohort_retention_report": ORACLE_COHORT_RETENTION_REPORT,
    "triangle_count_report": ORACLE_TRIANGLE_COUNT_REPORT,
    "qdigest_quantile_report": ORACLE_QDIGEST_QUANTILE_REPORT,
    "zorder_key_report": ORACLE_ZORDER_KEY_REPORT,
    "hits_report": ORACLE_HITS_REPORT,
    "trustrank_report": ORACLE_TRUSTRANK_REPORT,
    "streaming_quantile_report": ORACLE_STREAMING_QUANTILE_REPORT,
    "drift_psi_report": ORACLE_DRIFT_PSI_REPORT,
    "kcore_report": ORACLE_KCORE_REPORT,
    "robots_policy_report": ORACLE_ROBOTS_POLICY_REPORT,
    "chunking_report": ORACLE_CHUNKING_REPORT,
    "langid_confusion_report": ORACLE_LANGID_CONFUSION,
    "calibration_report": ORACLE_CALIBRATION_REPORT,
    "winnow_report": ORACLE_WINNOW_REPORT,
    "neardup_verify_report": ORACLE_NEARDUP_VERIFY,
    "blocklist_report": ORACLE_BLOCKLIST_REPORT,
    "labelprop_report": ORACLE_LABELPROP_REPORT,
    "streaming_sessions_report": ORACLE_STREAMING_SESSIONS,
    "temperature_mixing_report": ORACLE_TEMPERATURE_MIXING,
    "rendezvous_shard_report": ORACLE_RENDEZVOUS_SHARD,
    "weighted_sample_report": ORACLE_WEIGHTED_SAMPLE,
    "moore_lewis_report": ORACLE_MOORE_LEWIS,
    "doremi_report": ORACLE_DOREMI,
    "diversity_report": ORACLE_DIVERSITY,
    "novelty_report": ORACLE_NOVELTY,
    "boot_ci_report": _oracle_boot_ci(),
    "curation_funnel_report": ORACLE_CURATION_FUNNEL,
    "neyman_sample_report": ORACLE_NEYMAN,
    "zipf_slope_report": ORACLE_ZIPF,
    "burstiness_report": ORACLE_BURSTINESS,
    "good_turing_report": ORACLE_GOOD_TURING,
    "lexical_concentration_report": ORACLE_LEXICAL_CONCENTRATION,
    "domain_concentration_report": ORACLE_DOMAIN_CONCENTRATION,
    "domain_divergence_report": ORACLE_DOMAIN_DIVERGENCE,
    "readability_report": ORACLE_READABILITY,
    "pareto_frontier_report": ORACLE_PARETO_FRONTIER,
    "phrase_search_report": ORACLE_PHRASE_SEARCH,
    "llr_collocations_report": ORACLE_LLR_COLLOCATIONS,
    "conditional_entropy_report": ORACLE_CONDITIONAL_ENTROPY,
    "rbo_report": _oracle_rbo(),
    "ks_test_report": ORACLE_KS_TEST,
    "spearman_report": ORACLE_SPEARMAN,
    "rrf_fusion_report": ORACLE_RRF_FUSION,
    "auc_report": ORACLE_AUC,
    "chi2_report": ORACLE_CHI2,
    "bh_fdr_report": ORACLE_BH_FDR,
    "quantile_norm_report": ORACLE_QUANTILE_NORM,
    "isotonic_calibration_report": ORACLE_ISOTONIC,
    "kendall_report": ORACLE_KENDALL,
    "mann_kendall_report": ORACLE_MANN_KENDALL,
    "pr_curve_report": ORACLE_PR_CURVE,
    "brier_report": ORACLE_BRIER,
    "kruskal_report": ORACLE_KRUSKAL,
    "survival_report": ORACLE_SURVIVAL,
    "kappa_report": _oracle_kappa(),
    "ca_trend_report": ORACLE_CA_TREND,
    "gains_report": ORACLE_GAINS,
    "fuzzy_link_report": ORACLE_FUZZY_LINK,
    "markov_report": _oracle_markov(),
    "anova_report": ORACLE_ANOVA,
    "mcnemar_report": _oracle_mcnemar(),
    "wasserstein_report": ORACLE_WASSERSTEIN,
    "apriori_report": ORACLE_APRIORI,
    "cusum_report": ORACLE_CUSUM,
    "acf_report": ORACLE_ACF,
    "benford_report": _oracle_benford(),
    "mutual_info_report": ORACLE_MUTUAL_INFO,
    "theil_report": ORACLE_THEIL,
    "levene_report": ORACLE_LEVENE,
    "cochran_q_report": _oracle_cochran_q(),
    "runs_test_report": ORACLE_RUNS_TEST,
    "url_canon_report": ORACLE_URL_CANON,
    "haar_report": _oracle_haar(),
    "vocab_overlap_report": ORACLE_VOCAB_OVERLAP,
    "ols_trend_report": ORACLE_OLS_TREND,
    "durbin_watson_report": ORACLE_DURBIN_WATSON,
    "tfidf_top_report": ORACLE_TFIDF_TOP,
    "cvm_test_report": ORACLE_CVM_TEST,
    "friedman_report": ORACLE_FRIEDMAN,
    "kmv_distinct_report": ORACLE_KMV_DISTINCT,
    "ewma_chart_report": ORACLE_EWMA_CHART,
    "dow_seasonality_report": ORACLE_DOW_SEASONALITY,
    "heaps_law_report": ORACLE_HEAPS_LAW,
    "hellinger_report": ORACLE_HELLINGER,
    "cronbach_report": ORACLE_CRONBACH,
    "hill_tail_report": ORACLE_HILL_TAIL,
    "mood_median_report": ORACLE_MOOD_MEDIAN,
    "hurst_rs_report": ORACLE_HURST_RS,
    "ad_test_report": ORACLE_AD_TEST,
    "burrows_delta_report": ORACLE_BURROWS_DELTA,
    "stem_fold_report": ORACLE_STEM_FOLD,
    "binseg_report": ORACLE_BINSEG,
    "yule_k_report": ORACLE_YULE_K,
    "dispersion_report": ORACLE_DISPERSION,
    "tukey_fences_report": ORACLE_TUKEY_FENCES,
    "boxcox_report": ORACLE_BOXCOX,
    "ccf_leadlag_report": ORACLE_CCF_LEADLAG,
    "pacf_report": ORACLE_PACF,
    "dataset_card_report": ORACLE_DATASET_CARD,
    "repetition_report": ORACLE_REPETITION_REPORT,
    "pii_scrub_report": ORACLE_PII_SCRUB_REPORT,
    "line_dedup_report": ORACLE_LINE_DEDUP_REPORT,
    "domain_cap_report": ORACLE_DOMAIN_CAP_REPORT,
    "mixing_report": ORACLE_MIXING_REPORT,
    "bpe_merge_report": ORACLE_BPE_MERGE_REPORT,
    "bpe_encode_report": _oracle_bpe_encode(),
    "wordpiece_encode_report": _oracle_wordpiece_encode(),
    "exact_substr_report": ORACLE_EXACT_SUBSTR_REPORT,
    "bpe_packing_report": _oracle_bpe_packing(),
    "exact_substr_keep_one_report": ORACLE_EXACT_SUBSTR_KEEP_ONE,
    "gopher_rules_report": ORACLE_GOPHER_RULES,
    "dsir_selection_report": ORACLE_DSIR_SELECTION,
    "semdedup_report": _oracle_semdedup(),
    "unigram_tokenizer_report": _oracle_unigram(),
    "pq_ann_topk": _oracle_pq(),
    "ivfpq_ann_topk": _oracle_ivfpq(),
    "packing_report": ORACLE_PACKING_REPORT,
    "classifier_report": ORACLE_CLASSIFIER_REPORT,
    "split_report": ORACLE_SPLIT_REPORT,
    "token_budget_report": ORACLE_TOKEN_BUDGET_REPORT,
    "quantile_gate_report": ORACLE_QUANTILE_GATE_REPORT,
    "ppl_bucket_report": ORACLE_PPL_BUCKET_REPORT,
    "asof_attribution_report": ORACLE_ASOF_ATTRIBUTION,
    "range_funnel_report": ORACLE_RANGE_FUNNEL,
    "q1_pricing_summary": ORACLE_Q1,
    "q3_shipping_priority": ORACLE_Q3,
    "q5_local_supplier_volume": ORACLE_Q5,
    "q6_forecast_revenue": ORACLE_Q6,
    "group_moment_stats": ORACLE_GROUP_MOMENT_STATS,
    "threshold_buckets": ORACLE_THRESHOLD_BUCKETS,
    "validity_classes": ORACLE_VALIDITY_CLASSES,
    "top_langs_per_source": ORACLE_TOP_LANGS,
    "value_histogram": ORACLE_HISTOGRAM,
    "value_counts_lang": ORACLE_VALUE_COUNTS,
    "top_docs_by_len": ORACLE_TOP_DOCS,
    "corr_trend": ORACLE_CORR_TREND,
    "event_dow_matrix": ORACLE_DOW_MATRIX,
    "quality_buckets": ORACLE_QUALITY_BUCKETS,
    "per_group_sample": ORACLE_PER_GROUP_SAMPLE,
    "deterministic_sample_50": ORACLE_SAMPLE_50,
    "union_distinct_keys": ORACLE_UNION_DISTINCT,
    "events_hourly": ORACLE_EVENTS_HOURLY,
    "events_json_props": ORACLE_EVENTS_JSON,
    "running_spend": ORACLE_RUNNING_SPEND,
    "user_sessions": ORACLE_USER_SESSIONS,
    "token_stats": ORACLE_TOKEN_STATS,
    "lang_id_report": _oracle_lang_id(),
    "quality_scores": ORACLE_QUALITY_SCORES,
    "exact_dup_stats": ORACLE_EXACT_DUP,
    "ngram_jaccard_small": ORACLE_NGRAM_JACCARD,
    "minhash_pairs_md5": ORACLE_MINHASH_PAIRS_MD5,
    "simhash_pairs_md5": ORACLE_SIMHASH_PAIRS_MD5,
    "embedding_topk": ORACLE_EMBEDDING_TOPK,
    "salted_source_stats": ORACLE_SALTED_STATS,
    "salted_join_stats": ORACLE_SALTED_JOIN,
    "sql_summary": SQL_SUMMARY,
    "sql_quality_matrix": SQL_QUALITY_MATRIX,
    "enrich_union_stats": ORACLE_ENRICH_UNION,
    "conf_scale_normalize": ORACLE_CONF_SCALE,
    "order_gaps_lag": ORACLE_ORDER_GAPS,
    "rollup_nation_totals": ORACLE_ROLLUP_NATION,
    "cube_status_priority": ORACLE_CUBE_STATUS_PRIORITY,
    "order_value_quartiles": ORACLE_ORDER_VALUE_QUARTILES,
    "supplier_name_concat": ORACLE_SUPPLIER_NAME_CONCAT,
    "band_filter_fallback": ORACLE_BAND_FALLBACK,
    "challenging_docs": ORACLE_CHALLENGING,
    "train_lm": ORACLE_TRAIN_LM,
    "perplexity_report": ORACLE_PERPLEXITY_REPORT,
    "fingerprint_stats": ORACLE_FINGERPRINT_STATS,
    "embedding_pair_topk": ORACLE_EMBEDDING_PAIR_TOPK,
    "customers_without_orders": ORACLE_CUSTOMERS_WITHOUT_ORDERS,
    "dup_clusters": ORACLE_DUP_CLUSTERS,
    "parts_above_type_avg": ORACLE_PARTS_ABOVE_TYPE_AVG,
    # minhash_pairs / simhash_pairs / lsh_ann_topk: xxhash64-based — Spark-only,
    # rows-only check. extraction_report: fixture+UDF pipeline —
    # byte-identity is pytest-gated instead.
}
