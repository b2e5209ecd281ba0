"""X55 — triangle counting with degree orientation: the classic
distributed-graph statistic (clustering coefficient, spam-farm and
link-ring detection in web graphs) computed with the published
last-reducer fix (Suri & Vassilvitskii 2011, WWW — "node-iterator++";
also Cohen 2009): orient every undirected edge from its lower-ranked to
its higher-ranked endpoint, rank = (degree, id), and enumerate wedges
only from each edge's LOW end.
Reference analog: none — rebuild-only operator (the reference has no
graph surface; with X8 components and X53 PageRank this completes the
web-graph trio: membership, importance, local density).

Why orientation is the whole scale story: the naive wedge join fans out
quadratically in the hottest node's degree (a 10^6-degree hub alone
yields 10^12 wedges — the "curse of the last reducer"). Oriented by
(degree, id), every node's OUT-degree is bounded by O(sqrt(m)) on any
graph, so total wedge count is O(m^{3/2}) worst-case and each triangle
is enumerated exactly once (from its lowest-ranked corner). Ranks pack
into one BIGINT (deg * 2^32 + id — exact for ids/degrees < 2^31), so
the orientation and the wedge ordering are pure integer comparisons,
identical in DuckDB.

Spark shape: canonicalize+distinct (one shuffle), a degree census
(map-side-combined), two broadcast-or-hash joins to attach endpoint
ranks, the wedge self-join on the low endpoint, and a final equi-join
of wedge (b, c) against the oriented edge set. No cartesian anywhere;
every join is keyed. At 100 TB the oriented-edge frame is the only
corpus-scale shuffle operand, and bucketing it by the low endpoint
(S10) co-locates the wedge join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_RANK_BASE = 4294967296  # 2^32: rank = deg * 2^32 + id, exact for < 2^31


def canonical_edges(edges: DataFrame) -> DataFrame:
    """(src, dst) directed multigraph -> distinct undirected (a, b) with
    a < b, self-loops dropped."""
    return (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def oriented_edges(und: DataFrame) -> DataFrame:
    """Undirected (a, b) -> (u, v, rank_v) oriented low-rank -> high-rank,
    rank = deg * 2^32 + id."""
    deg = (
        und.select(F.col("a").alias("n"))
        .unionAll(und.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    da = deg.select(F.col("n").alias("a"), F.col("d").alias("_da"))
    db = deg.select(F.col("n").alias("b"), F.col("d").alias("_db"))
    j = und.join(da, "a").join(db, "b")
    ra = F.col("_da") * _RANK_BASE + F.col("a")
    rb = F.col("_db") * _RANK_BASE + F.col("b")
    return j.select(
        F.when(ra < rb, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(ra < rb, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(ra < rb, rb).otherwise(ra).alias("rank_v"),
    )


def triangle_corners(edges: DataFrame) -> DataFrame:
    """-> (x, y, z): one row per triangle in the undirected simple graph
    underlying ``edges``, each enumerated exactly once from its
    lowest-ranked corner (x = wedge pivot; (y, z) the closing edge in
    rank order)."""
    o = oriented_edges(canonical_edges(edges)).persist()
    e1 = o.select(F.col("u"), F.col("v").alias("y"), F.col("rank_v").alias("_r1"))
    e2 = o.select(F.col("u"), F.col("v").alias("z"), F.col("rank_v").alias("_r2"))
    wedge = e1.join(e2, "u").filter(F.col("_r1") < F.col("_r2"))
    close = o.select(F.col("u").alias("y"), F.col("v").alias("z"))
    return wedge.join(close, ["y", "z"]).select(
        F.col("u").alias("x"), "y", "z"
    )


def node_triangle_counts(edges: DataFrame) -> DataFrame:
    """-> (node, n_tri): triangles through each node (each triangle
    credits its three corners once)."""
    tri = triangle_corners(edges)
    corners = (
        tri.select(F.col("x").alias("node"))
        .unionAll(tri.select(F.col("y").alias("node")))
        .unionAll(tri.select(F.col("z").alias("node")))
    )
    return corners.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("n_tri")
    )
