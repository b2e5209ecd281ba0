"""Count-Min sketch (X47) — fixed-size frequency summaries and heavy-
hitter estimation for streams/corpora whose key space is too large to
count exactly (token frequencies, URL hits, gram counts at 100 TB).

Reference-repo analog: none (training-data layer, SURVEY §2.13).
Published algorithm: Cormode & Muthukrishnan 2005 (J. Algorithms) — d
hash rows × w counters; every key instance increments one cell per row;
a key's estimate is the MIN over its d cells. Guarantees: never an
underestimate; overestimate <= eps*N (eps = e/w) with probability
1 - delta (delta = e^-d).

Spark-first shape, and how it holds at 100 TB:
- BUILD: the instance stream explodes to d (row, position) pairs and
  collapses through ONE map-side-combined sum agg to <= d*w rows — a
  CONFIG-bounded frame (4 KB-scale), not data-bounded; the corpus never
  shuffles keys, only pre-combined (row, pos, partial-count) cells.
- PROBE: the cell frame collects once (bounded by d*w — the sanctioned
  tiny-frame closure, same as IVF centroids / the bloom bitmap) and
  re-enters as a literal array; a key's estimate is least() of d
  element_at lookups — pure codegen, zero joins.
- MERGE: sketches over shards/days add ELEMENTWISE (counts are sums), so
  partial sketches roll up without re-reading data (cms_merge).
- counts are integer sums — order-independent and exactly replayable, so
  the sketch sits behind the strict DuckDB value-identity gate with no
  rounding tricks at all. Positions are md5-derived (production twin:
  xxhash64 — the established md5-twin pattern, operators/decontaminate.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

DEFAULT_D = 4  # rows: delta = e^-4 ~ 1.8%
DEFAULT_W = 1024  # counters per row: eps = e/1024 ~ 0.27% of N


def cms_position(key: Column, j: int, w: int) -> Column:
    """Row-j counter index of a key: 60 positive md5 bits mod w. DuckDB
    twin: ('0x' || substr(md5(j || ':' || key), 1, 15))::BIGINT % w."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{j}:"), key)), 1, 15), 16, 10
    ).cast("long")
    return F.pmod(h, F.lit(w))


def cms_sketch(
    df: DataFrame,
    key_col: str,
    d: int = DEFAULT_D,
    w: int = DEFAULT_W,
) -> DataFrame:
    """Instance stream -> (_row, _pos, _cnt): the sketch, <= d*w rows
    whatever the input. One union of d selects over the same scan, ONE
    map-side-combined sum agg."""
    from functools import reduce

    key = F.col(key_col)
    parts = [
        df.select(
            F.lit(j).alias("_row"),
            cms_position(key, j, w).alias("_pos"),
        )
        for j in range(d)
    ]
    return (
        reduce(DataFrame.unionAll, parts)
        .groupBy("_row", "_pos")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Sketch of the concatenated streams — elementwise sum. The
    distributive property that lets per-shard sketches roll up."""
    return (
        a.unionByName(b).groupBy("_row", "_pos").agg(F.sum("_cnt").alias("_cnt"))
    )


def collect_cms(sketch: DataFrame, d: int = DEFAULT_D, w: int = DEFAULT_W) -> list[int]:
    """Sketch frame -> flat row-major list (row j, pos p at j*w + p),
    zeros for untouched cells. Bounded by d*w (config, not data)."""
    cells = [0] * (d * w)
    for r in sketch.collect():
        cells[r["_row"] * w + r["_pos"]] = r["_cnt"]
    return cells


def cms_estimate(
    key: Column, cells: list[int], d: int = DEFAULT_D, w: int = DEFAULT_W
) -> Column:
    """Point-estimate expression: least() of the key's d cells out of the
    literal sketch — pure codegen, no join, no shuffle. Never below the
    true count; above it by at most ~(e/w)*N w.h.p."""
    arr = F.lit(cells)
    return F.least(
        *[
            F.element_at(
                arr, (F.lit(j * w) + cms_position(key, j, w) + 1).cast("int")
            )
            for j in range(d)
        ]
    )
