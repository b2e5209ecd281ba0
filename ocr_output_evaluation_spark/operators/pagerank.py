"""X53 — PageRank link-graph centrality: the canonical iterative
web-corpus ranking (Page et al. 1999; Common Crawl publishes exactly
this as its host-level webgraph ranks), used by crawl pipelines to
prioritise fetch frontiers, weight training-data sampling toward
reputable hosts, and demote link-farm spam.
Reference analog: none — rebuild-only operator (the reference has no
graph surface; X8's connected components is the only other iterative
graph op in this engine and PageRank completes the pair:
membership vs. importance).

Semantics (damping d = 0.85, the published constant):

    r_0(v)    = 1.0                          (per-node normalisation)
    r_t+1(v)  = (1-d) + d * ( sum_{u->v} r_t(u)/out(u)  +  D_t / N )

where D_t is the total rank mass sitting on dangling nodes (out(u)=0),
redistributed uniformly — the standard dangling-node correction, so
total mass stays ~N instead of leaking each step.

Exact-arithmetic design (the X39/X29 quantize-the-loop-state recipe):
ranks are BIGINT *nano* units (r_0 = 10^9), every per-edge contribution
is the truncating integer division ``r div out`` (Spark ``div`` ==
DuckDB ``//`` for non-negative BIGINTs), incoming mass is an
order-independent BIGINT sum, and the damping step is
``150_000_000 + div(85 * (inc + div(D, N)), 100)`` — no float ever
enters, so both engines replay the whole trajectory bit-identically
and the unrolled-CTE oracle hashes every iteration.

Scale design (the 100 TB shape): per iteration the work is exactly
  (1) edges ⋈ ranks on src        — the edge-scale shuffle any
      distributed PageRank pays (Pregel's message send),
  (2) groupBy dst sum             — map-side-combined (partial sums
      collapse per task before the exchange),
  (3) nodes ⟕ incoming            — node-scale,
  (4) a 1-row dangling-mass frame broadcast back (keyless
      BroadcastNestedLoopJoin attach — the sanctioned 1-row pattern).
Nothing is ever collected but N (a count) and nothing node- or
edge-scale replicates. ``edges`` is pre-joined with out-degrees ONCE
and persisted, so iterations reuse the same frame; ``localCheckpoint``
truncates the growing lineage each step (the X36 iterative-fold
discipline — without it the plan tree doubles per iteration). On a
real cluster, pre-partitioning edges by ``src`` and ranks by ``node``
(or writing both through the S10 bucketed sink) makes (1) a
co-partitioned join with no exchange on the ranks side.

BIGINT headroom: total mass is ~N * 10^9 nano, so per-node sums stay
far under 2^63 for N up to ~10^9; past that, swap the incoming sum to
DECIMAL(38,0) (the X46 exact-decimal register-sum recipe) — the
per-edge term is still BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DAMPING_NANO_NUM = 85  # d = 0.85 as the exact integer pair 85/100
TELEPORT_NANO = 150_000_000  # (1-d) * 10^9, exact


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    n_iters: int = 5,
    node_col: str = "node",
    checkpoint: bool = True,
) -> DataFrame:
    """-> (node, rank_nano BIGINT): ``n_iters`` exact power iterations
    over ``edges(src, dst)``. Multi-edges are honoured (each parallel
    edge carries its own share); self-loops should be filtered by the
    caller. ``nodes`` must hold every node id once (rows of ``edges``
    pointing outside ``nodes`` leak their mass — standard PageRank on a
    closed graph assumes dst ⊆ nodes)."""
    n_total = nodes.count()  # 1-row query vector (sanctioned collect)
    outdeg = edges.groupBy("src").agg(
        F.count(F.lit(1)).cast("long").alias("o")
    )
    # Pre-join out-degrees once; every iteration reuses this frame.
    ej = edges.join(outdeg, "src").persist()
    ranks = nodes.select(
        F.col(node_col).alias("node"), F.lit(10**9).cast("long").alias("r")
    )
    for _ in range(n_iters):
        contrib = ej.join(ranks, ej["src"] == ranks["node"]).select(
            F.col("dst"), F.expr("div(r, o)").alias("c")
        )
        inc = contrib.groupBy("dst").agg(F.sum("c").cast("long").alias("inc"))
        dang = (
            ranks.join(outdeg, ranks["node"] == outdeg["src"], "left_anti")
            .agg(F.coalesce(F.sum("r"), F.lit(0)).cast("long").alias("dang"))
        )
        ranks = (
            nodes.select(F.col(node_col).alias("node"))
            .join(inc, F.col("node") == inc["dst"], "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                (
                    F.lit(TELEPORT_NANO)
                    + F.expr(
                        f"div({DAMPING_NANO_NUM} * (coalesce(inc, 0L)"
                        f" + div(dang, {n_total}L)), 100)"
                    )
                ).cast("long").alias("r"),
            )
        )
        if checkpoint:
            ranks = ranks.localCheckpoint()
    ej.unpersist()
    return ranks.select("node", F.col("r").alias("rank_nano"))


def trustrank(
    nodes: DataFrame,
    edges: DataFrame,
    seeds: DataFrame,
    n_iters: int = 5,
    node_col: str = "node",
    checkpoint: bool = True,
) -> DataFrame:
    """X59 — TrustRank (Gyöngyi, Garcia-Molina & Pedersen 2004, VLDB):
    personalized PageRank whose teleport vector is a TRUSTED SEED SET —
    the published spam-demotion pass for web corpora (trust flows out of
    vetted hosts along links; link farms unreachable from seeds starve).
    Reference analog: none — rebuild-only (SURVEY §2.13).

    Same exact-integer discipline as :func:`pagerank`, with ONE unit of
    total mass (10^9 nano) so seed-set size doesn't change scale:

        r_0(v)   = div(10^9, |S|) for v in S else 0
        r_t+1(v) = [v in S] * div(15 * 10^9, 100 * |S|)
                   + div(85 * (inc_v + [v in S] * div(D_t, |S|)), 100)

    — teleport AND dangling mass return to the seeds only (the paper's
    static trust vector). Per-iteration work is identical to PageRank's
    (edge-scale join, map-side-combined sum, node-scale rejoin, 1-row
    dangling broadcast); the seed frame is broadcast (small by
    construction — a vetted list)."""
    n_seeds = seeds.count()  # 1-row query vector (sanctioned collect)
    if n_seeds == 0:
        raise ValueError("trustrank: empty seed set")
    sd = F.broadcast(seeds.select(F.col(seeds.columns[0]).alias("node")))
    outdeg = edges.groupBy("src").agg(
        F.count(F.lit(1)).cast("long").alias("o")
    )
    ej = edges.join(outdeg, "src").persist()
    is_seed = F.col("_s").isNotNull()
    nodes_tag = (
        nodes.select(F.col(node_col).alias("node"))
        .join(sd.withColumn("_s", F.lit(1)), "node", "left")
    )
    ranks = nodes_tag.select(
        "node",
        F.when(is_seed, F.lit(10**9 // n_seeds)).otherwise(F.lit(0))
        .cast("long")
        .alias("r"),
    )
    teleport = (15 * 10**9) // (100 * n_seeds)
    for _ in range(n_iters):
        contrib = ej.join(ranks, ej["src"] == ranks["node"]).select(
            F.col("dst"), F.expr("div(r, o)").alias("c")
        )
        inc = contrib.groupBy("dst").agg(F.sum("c").cast("long").alias("inc"))
        dang = (
            ranks.join(outdeg, ranks["node"] == outdeg["src"], "left_anti")
            .agg(F.coalesce(F.sum("r"), F.lit(0)).cast("long").alias("dang"))
        )
        ranks = (
            nodes_tag.join(inc, F.col("node") == inc["dst"], "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                (
                    F.when(is_seed, F.lit(teleport)).otherwise(F.lit(0))
                    + F.expr(
                        f"div({DAMPING_NANO_NUM} * (coalesce(inc, 0L)"
                        f" + if(_s is not null, div(dang, {n_seeds}L), 0L))"
                        f", 100)"
                    )
                ).cast("long").alias("r"),
            )
        )
        if checkpoint:
            ranks = ranks.localCheckpoint()
    ej.unpersist()
    return ranks.select("node", F.col("r").alias("trust_nano"))
