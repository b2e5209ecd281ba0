"""X61 — k-core decomposition (Seidman 1983, "Network structure and
minimum degree"): the maximal subgraph in which every node has degree
>= k — the standard dense-subgraph signal for web graphs (link-farm /
mutual-admiration cores survive peeling; organically-linked pages fall
out), and the classical first step of community/spam analysis next to
PageRank-style importance (X53/X59) and triangle density (X55).
Reference analog: none — rebuild-only operator (SURVEY §2.13).

Algorithm: iterative peeling — repeatedly delete every node whose
CURRENT degree is < k; the fixpoint is exactly the k-core (order of
deletion is irrelevant, which is what makes the operator deterministic
and oracle-replayable without any tie-breaking). Each round is

    degree census over surviving edges  (map-side-combined count)
    survivors = nodes with deg >= k     (filter)
    edges     = edges with BOTH endpoints surviving (two semi-joins)

— all edge-scale keyed joins, no cartesian, localCheckpoint truncating
lineage per round (the X53 iterative discipline). Peeling converges in
at most |V| rounds but in practice a handful; the operator runs a FIXED
``n_rounds`` unroll (the oracle-replayable form — data-dependent loop
exits cannot be expressed in one SQL statement) and returns a
``converged`` flag computed IN-PLAN (final round removed nothing), so a
graph that needed more rounds is visible in the result and pinned by
tests, never silently wrong.

At 100 TB: each round shuffles the (shrinking) edge set on its
endpoints; bucketing edges by src (S10) makes the semi-joins
co-partitioned, and rounds after the first touch only the surviving
fraction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def k_core(
    edges: DataFrame,
    k: int,
    n_rounds: int = 8,
    checkpoint: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """-> (core_nodes, meta): ``core_nodes`` = (node, core_deg) the
    surviving nodes with their degree inside the core after
    ``n_rounds`` peeling rounds over the undirected simple graph under
    ``edges(src, dst)``; ``meta`` = 1-row (n_before_last, n_after_last)
    whose equality certifies convergence (the caller derives
    ``converged``). Self-loops dropped; parallel edges collapse.
    ``n_rounds`` must be >= 1 (the fixed-unroll contract — zero rounds
    would leave the convergence certificate undefined)."""
    if n_rounds < 1:
        raise ValueError(f"n_rounds must be >= 1, got {n_rounds}")
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    if checkpoint:
        und = und.localCheckpoint()
    prev_count_frame = None
    for _ in range(n_rounds):
        deg = (
            und.select(F.col("a").alias("node"))
            .unionAll(und.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).cast("long").alias("d"))
        )
        keep = deg.filter(F.col("d") >= k).select("node")
        prev_count_frame = deg.agg(
            F.count(F.lit(1)).cast("long").alias("n_before_last")
        )
        und = (
            und.join(keep.withColumnRenamed("node", "a"), "a", "leftsemi")
            .join(keep.withColumnRenamed("node", "b"), "b", "leftsemi")
            .select("a", "b")
        )
        if checkpoint:
            und = und.localCheckpoint()
    final_deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("core_deg"))
        .filter(F.col("core_deg") >= k)
    )
    meta = prev_count_frame.crossJoin(
        final_deg.agg(F.count(F.lit(1)).cast("long").alias("n_after_last"))
    )
    return final_deg, meta
