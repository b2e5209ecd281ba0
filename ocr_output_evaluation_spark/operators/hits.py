"""X58 — HITS hubs & authorities (Kleinberg 1999, JACM): the other
classical link-analysis fixpoint — authorities are pages good hubs point
TO, hubs are pages that point to good authorities. Web pipelines use the
pair to separate directory/link-farm pages (high hub, low authority)
from endorsed content (high authority); with X53's PageRank this
completes the canon (global importance vs role separation).
Reference analog: none — rebuild-only operator (SURVEY §2.13).

Exact-arithmetic design: scores live in MICRO units (10^6 fixed-point).
Each half-iteration is
    a_raw(v) = sum_{u->v} h(u)        (edge join + map-side-combined agg)
    a(v)     = div(a_raw * 10^6, max(a_raw))   — the paper's max-norm,
as truncating integer division (Spark ``div`` == DuckDB ``//`` on
non-negative BIGINTs), then symmetrically for hubs over the same edges.
Normalizing by the MAX instead of the L2 norm keeps the fixpoint
rescaling-equivalent (HITS scores are defined up to scale) while every
intermediate stays an exact BIGINT — a_raw <= n * 10^6, and the scaled
product a_raw * 10^6 <= n * 10^12 fits BIGINT for n up to ~9 * 10^6
nodes; past that, swap the scaling leg to DECIMAL(38,0) (the X46
exact-decimal recipe) — the sums themselves are already safe.

Scale shape per iteration (the PageRank discipline, X53): one edge-scale
join + map-side-combined groupBy per half, a 1-row max frame broadcast
back (keyless BNLJ attach — the sanctioned pattern), node-scale
rejoins, lineage truncated by localCheckpoint. Nothing is collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

UNIT = 1_000_000  # micro fixed-point


def hits(
    nodes: DataFrame,
    edges: DataFrame,
    n_iters: int = 4,
    node_col: str = "node",
    checkpoint: bool = True,
) -> DataFrame:
    """-> (node, authority_micro, hub_micro): ``n_iters`` exact
    max-normalized HITS iterations over ``edges(src, dst)``. Nodes with
    no in-edges get authority 0; nodes with no out-edges get hub 0;
    multi-edges carry multiplicity (as in the adjacency-matrix form).
    ``n_iters`` must be >= 1 (the fixed-unroll contract — zero
    iterations would leave authorities undefined)."""
    if n_iters < 1:
        raise ValueError(f"n_iters must be >= 1, got {n_iters}")
    nn = nodes.select(F.col(node_col).alias("node"))
    hubs = nn.select("node", F.lit(UNIT).cast("long").alias("h"))
    auths = None
    for _ in range(n_iters):
        araw = (
            edges.join(hubs, edges["src"] == hubs["node"])
            .groupBy("dst")
            .agg(F.sum("h").cast("long").alias("_raw"))
        )
        amax = araw.agg(
            F.greatest(F.max("_raw"), F.lit(1)).cast("long").alias("_m")
        )
        auths = (
            nn.join(araw, nn["node"] == araw["dst"], "left")
            .crossJoin(F.broadcast(amax))
            .select(
                "node",
                F.expr(f"div(coalesce(_raw, 0L) * {UNIT}, _m)")
                .cast("long")
                .alias("a"),
            )
        )
        if checkpoint:
            auths = auths.localCheckpoint()
        hraw = (
            edges.join(auths, edges["dst"] == auths["node"])
            .groupBy("src")
            .agg(F.sum("a").cast("long").alias("_raw"))
        )
        hmax = hraw.agg(
            F.greatest(F.max("_raw"), F.lit(1)).cast("long").alias("_m")
        )
        hubs = (
            nn.join(hraw, nn["node"] == hraw["src"], "left")
            .crossJoin(F.broadcast(hmax))
            .select(
                "node",
                F.expr(f"div(coalesce(_raw, 0L) * {UNIT}, _m)")
                .cast("long")
                .alias("h"),
            )
        )
        if checkpoint:
            hubs = hubs.localCheckpoint()
    return (
        nn.join(auths.select(F.col("node").alias("_an"), "a"),
                nn["node"] == F.col("_an"), "left")
        .join(hubs.select(F.col("node").alias("_hn"), "h"),
              nn["node"] == F.col("_hn"), "left")
        .select(
            "node",
            F.coalesce(F.col("a"), F.lit(0)).cast("long").alias("authority_micro"),
            F.coalesce(F.col("h"), F.lit(0)).cast("long").alias("hub_micro"),
        )
    )
