"""X67 — label propagation communities (Raghavan, Albert & Kumara 2007,
"Near linear time algorithm to detect community structures in large-scale
networks", Phys. Rev. E 76): every node adopts the label held by the
MAJORITY of its neighbors, iterated; label islands that survive are the
communities. The standard near-linear community detector for web graphs
(mirror farms, topic clusters, boilerplate rings) next to k-core density
(X61), PageRank importance (X53/X59) and triangle clustering (X55).
Reference analog: none — rebuild-only operator (SURVEY §2.13).

Determinism (the paper's random tie-break and asynchronous schedule are
replaced by the published deterministic variant used by parallel
implementations, e.g. GraphFrames/Pregel LPA): SYNCHRONOUS rounds from
label(v) = v, ties broken to the SMALLEST label — (count, -label) packed
into ONE BIGINT (cnt * 2^32 + (2^32-1 - label)) so a plain MAX is
"max count, min label on ties" (the X55/X64 pack-the-tiebreak
discipline; labels are node ids, validated < 2^32). Synchronous LPA can
2-cycle on bipartite-ish structure instead of converging — the operator
runs the oracle-replayable FIXED ``n_rounds`` unroll and returns the
IN-PLAN certificate (labels changed in the last round), so oscillation
is visible and pinned, never silent (the X61 contract).

Per round, Spark-first:
    neighbor labels  = edges ⋈ labels on dst     (edge-scale hash join)
    label tallies    = groupBy(src, label) count (map-side combined)
    argmax           = groupBy(src) max(packed)  (reuses the (src,label)
                       partitioning's src prefix... one more exchange on
                       src; rows are node-scale after the tally)
    next labels      = nodes LEFT JOIN argmax, coalesce (isolated nodes
                       keep their label)
localCheckpoint truncates lineage per round (the X53/X61 discipline).

At 100 TB: each round's big shuffle is the edge⋈label join keyed on node
ids; bucketing edges by dst (S10) co-partitions it. Tallies and argmax
frames are node-scale. No step is quadratic in degree or labels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_LBL_CAP = 1 << 32

__all__ = ["label_propagation"]


def label_propagation(
    edges: DataFrame,
    n_rounds: int = 4,
    checkpoint: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """-> (labels, meta): ``labels`` = (node, label) after ``n_rounds``
    synchronous majority-label rounds over the undirected simple graph of
    ``edges(src, dst)`` (self-loops dropped, parallel edges collapsed,
    every endpoint a node); ``meta`` = 1-row (n_changed_last,) — 0
    certifies a fixpoint. Node ids must be in [0, 2^32) (the tie-break
    pack); violations raise at run time via an assert_true guard on the
    initial label projection."""
    if n_rounds < 1:
        raise ValueError(f"n_rounds must be >= 1, got {n_rounds}")
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    both = und.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        und.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    if checkpoint:
        both = both.localCheckpoint()
    nodes = both.select(F.col("u").alias("node")).distinct()
    # ANSI guard: assert_true raises on the first node id that would wrap
    # the tie-break pack; on success it is NULL and the label is the id.
    guard = F.assert_true(
        F.col("node") < F.lit(_LBL_CAP),
        F.lit("label_propagation: node ids must be < 2^32 (tie-break pack)"),
    )
    labels = nodes.select(
        "node",
        (F.col("node") + F.coalesce(guard.cast("long"), F.lit(0))).alias("label"),
    )
    n_changed = None
    for _ in range(n_rounds):
        tally = (
            both.join(
                labels.select(F.col("node").alias("v"), "label"), "v"
            )
            .groupBy("u", "label")
            .agg(F.count(F.lit(1)).alias("_c"))
        )
        # the count factor shares the pack's headroom: _c < 2^31 keeps
        # _c * 2^32 + label inside BIGINT. A node with >= 2^31
        # same-labeled neighbors raises loudly (same contract as the
        # node-id guard) instead of ANSI-aborting with a cryptic overflow.
        c_ok = F.col("_c") + F.coalesce(
            F.assert_true(
                F.col("_c") < F.lit(1 << 31),
                F.lit("label_propagation: neighbor-label count >= 2^31 "
                      "(tie-break pack headroom)"),
            ).cast("long"),
            F.lit(0),
        )
        best = (
            tally.groupBy("u")
            .agg(
                F.max(
                    c_ok * F.lit(_LBL_CAP)
                    + (F.lit(_LBL_CAP - 1) - F.col("label"))
                ).alias("_m")
            )
            .select(
                F.col("u").alias("node"),
                (F.lit(_LBL_CAP - 1) - F.pmod("_m", F.lit(_LBL_CAP)))
                .cast("long")
                .alias("_new"),
            )
        )
        nxt = labels.join(best, "node", "left").select(
            "node", F.coalesce("_new", "label").alias("label")
        )
        n_changed = (
            nxt.join(
                labels.withColumnRenamed("label", "_old"), "node"
            )
            .filter(F.col("label") != F.col("_old"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_changed_last"))
        )
        labels = nxt
        if checkpoint:
            labels = labels.localCheckpoint()
    return labels, n_changed
