"""X56 — q-digest quantile sketch: the bounded-size, MERGEABLE quantile
summary (Shrivastava et al. 2004, SenSys; Agarwal et al. 2012 classify
it as the canonical mergeable quantile sketch) — completing the
engine's mergeable-sketch trio: HLL (X46, distinct counts), Count-Min
(X47, frequencies), q-digest (quantiles). Exact per-group quantiles
(X32) shuffle a histogram bounded by the DOMAIN; the q-digest bounds
state by the CONFIG (<= ~3k tree nodes) whatever the domain or volume,
and per-shard/per-day digests roll up by count-union + recompression
without re-reading data.
Reference analog: none (training-data layer, SURVEY §2.13).

Structure: counts on nodes of the complete binary tree over the clamped
integer universe [0, 2^depth). BUILD maps each value to its leaf
(2^depth + v) and collapses through ONE map-side-combined count agg —
the corpus never shuffles raw values, only <= groups x 2^depth
(bucket, partial-count) cells, and in practice only the nonzero tail.
COMPRESSION is the paper's bottom-up pass made deterministic and
engine-replayable: level by level, a parent absorbs BOTH children iff
children_sum + parent_count <= floor(N/k) (all-integer comparison, so
Spark and DuckDB take bit-identical decisions); absorbing coarsens
counts upward exactly the way the paper's property-2 restoration does.
Every level touches only the config-bounded node frame — the loop is
sketch-scale, never data-scale (the X36 vocabulary-scale discipline).
QUERY sorts surviving nodes by (right endpoint, span, id) and takes the
first prefix whose cumulative count reaches ceil(q*N/100) — the
standard rank query, as one window over the tiny digest.

Guarantee (paper): rank error <= depth/k * N per query; size <= 3k
nodes (+ the root path). Merge = unionByName + groupBy-sum on
(group, level, id) + recompress — error adds, size re-bounds.

All counts, thresholds, endpoints, and rank targets are BIGINTs;
nothing floats, so the whole build→compress→query trajectory sits
behind the strict DuckDB value-identity gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

DEPTH_DEFAULT = 11  # universe [0, 2048)
# compression factor: rank error <= depth/k (~17% worst-case at 64; observed
# errors run far smaller) and size <= ~3k nodes. Smaller k = smaller digest,
# looser bound; at k=256 near-uniform data with leaf counts ~ N/k barely
# compresses (thr too tight), so 64 is the demonstrative default.
K_DEFAULT = 64


def qdigest_build(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    depth: int = DEPTH_DEFAULT,
    k: int = K_DEFAULT,
) -> tuple[DataFrame, DataFrame]:
    """-> (digest, totals): digest = (group..., level, id, cnt) surviving
    tree nodes (heap numbering, root id 1, leaves [2^depth, 2^{depth+1}));
    totals = (group..., n). Values clamp into [0, 2^depth). Each
    compression level is one groupBy + two joins on the config-bounded
    node frame, localCheckpoint-truncated (the iterative-fold
    discipline)."""
    cap = (1 << depth) - 1
    v = F.col(value_col).cast("long")
    clamped = F.least(F.greatest(v, F.lit(0)), F.lit(cap))
    leaves = (
        df.select(*group_cols, (F.lit(1 << depth) + clamped).alias("id"))
        .groupBy(*group_cols, "id")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .withColumn("level", F.lit(depth))
        .select(*group_cols, "level", "id", "cnt")
    )
    return qdigest_compress(leaves, group_cols, depth=depth, k=k)


def qdigest_compress(
    leaves: DataFrame,
    group_cols: list[str],
    depth: int = DEPTH_DEFAULT,
    k: int = K_DEFAULT,
) -> tuple[DataFrame, DataFrame]:
    """Compress a pre-built leaf census (group..., level, id, cnt) — a
    deterministic pure function of (leaves, N, k), shared by the batch
    build and the streaming leaf census (streaming/pipeline.py
    stream_qdigest_leaves), so stream-then-compress equals batch build
    exactly."""
    totals = leaves.groupBy(*group_cols).agg(
        F.sum("cnt").cast("long").alias("n")
    )
    thr = totals.select(
        *group_cols,
        F.greatest(F.expr("div(n, %d)" % k), F.lit(1)).cast("long").alias("_thr"),
    )
    nodes = leaves.localCheckpoint()
    for lvl in range(depth, 0, -1):
        cur = nodes.filter(F.col("level") == lvl)
        par = nodes.filter(F.col("level") == lvl - 1)
        others = nodes.filter(~F.col("level").isin(lvl, lvl - 1))
        kids = cur.groupBy(*group_cols, F.expr("div(id, 2)").alias("_pid")).agg(
            F.sum("cnt").cast("long").alias("_ksum")
        )
        pare = par.select(
            *group_cols, F.col("id").alias("_pid"), F.col("cnt").alias("_pcnt")
        )
        dec = (
            kids.join(pare, [*group_cols, "_pid"], "full_outer")
            .fillna(0, ["_ksum", "_pcnt"])
            .join(F.broadcast(thr), group_cols)
            .withColumn(
                "_absorb",
                (F.col("_ksum") > 0)
                & ((F.col("_ksum") + F.col("_pcnt")) <= F.col("_thr")),
            )
        )
        new_par = dec.select(
            *group_cols,
            F.lit(lvl - 1).alias("level"),
            F.col("_pid").alias("id"),
            (
                F.col("_pcnt")
                + F.when(F.col("_absorb"), F.col("_ksum")).otherwise(F.lit(0))
            ).cast("long").alias("cnt"),
        ).filter(F.col("cnt") > 0)
        # kids survive only under a NOT-absorbed parent slot: leftsemi on
        # (group, parent id)
        nk = dec.filter(~F.col("_absorb")).select(*group_cols, "_pid")
        kept_kids = cur.withColumn("_pid", F.expr("div(id, 2)")).join(
            F.broadcast(nk), [*group_cols, "_pid"], "leftsemi"
        ).drop("_pid")
        # coalesce: the per-level three-way union would otherwise grow the
        # partition count by ~2 join-widths per level (hundreds of empty
        # tasks by level 0); the node frame is sketch-scale, 8 is plenty
        nodes = (
            others.unionByName(new_par)
            .unionByName(kept_kids)
            .coalesce(8)
            .localCheckpoint()
        )
    return nodes, totals


def qdigest_merge(a: DataFrame, b: DataFrame, group_cols: list[str]) -> DataFrame:
    """Count-union of two digests (recompress with qdigest_compress if the
    size bound matters; quantile queries work on the raw union too)."""
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "level", "id")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def qdigest_quantiles(
    digest: DataFrame,
    totals: DataFrame,
    group_cols: list[str],
    q_pcts: list[int],
    depth: int = DEPTH_DEFAULT,
) -> DataFrame:
    """-> (group..., q_pct, qd_value): the paper's rank query — nodes
    sorted by (right endpoint, span, id), first prefix reaching
    ceil(q*N/100). One window + one broadcast join on sketch-scale
    frames."""
    scale_map = F.create_map(
        *[
            x
            for lv in range(depth + 1)
            for x in (F.lit(lv), F.lit(1 << (depth - lv)))
        ]
    )
    span = F.element_at(scale_map, F.col("level"))
    # right endpoint: (id - 2^level + 1) * span - 1; 2^level = (2^depth)/span
    # (shiftleft takes int literals only — CLAUDE.md — hence the map)
    two_level = F.expr("div(%d, _span)" % (1 << depth))
    cum_w = (
        W.partitionBy(*group_cols)
        .orderBy(F.col("_right").asc(), F.col("_span").asc(), F.col("id").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    with_right = (
        digest.withColumn("_span", span)
        .withColumn(
            "_right",
            (F.col("id") - two_level + F.lit(1)) * F.col("_span") - F.lit(1),
        )
        .withColumn("_cum", F.sum("cnt").over(cum_w))
    )
    targets = totals.select(
        *group_cols,
        F.explode(F.array(*[F.lit(q) for q in q_pcts])).alias("q_pct"),
        F.col("n"),
    ).select(
        *group_cols,
        "q_pct",
        F.expr("div(q_pct * n + 99, 100)").cast("long").alias("_target"),
    )
    # digest and totals may share one source lineage (e.g. both derived
    # from a streamed leaf census); a join of window output against
    # shared attribute ids trips Spark's conflicting-reference
    # resolution. toDF re-aliases every column with FRESH exprIds, making
    # the broadcast side lineage-independent.
    targets = targets.toDF(*targets.columns)
    j = with_right.join(F.broadcast(targets), group_cols).filter(
        F.col("_cum") >= F.col("_target")
    )
    return j.groupBy(*group_cols, "q_pct").agg(
        F.min("_right").cast("long").alias("qd_value")
    )
