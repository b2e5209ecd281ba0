"""SemDeDup: semantic deduplication of an embedding corpus — k-means
clustering followed by within-cluster cosine pruning.

The published recipe (Abbas et al. 2023, "SemDeDup: Data-efficient learning
at web-scale through semantic deduplication", arXiv:2303.09540): cluster the
embedding space with k-means, then inside each cluster mark all but one of
every group of semantically-near-identical points (pairwise cosine above a
threshold) for removal — the clusters bound the pair space, so the quadratic
dedup work is per-cluster instead of corpus-wide. Reference-repo analog:
none — part of the training-data operator surface SURVEY §2.13 adds.

Spark-first shape, and how it holds at 100 TB:
- Lloyd iterations keep the corpus flat: the k×d centroid frame is COLLECTED
  per step (a tiny frame by construction — the sanctioned centroid/plane
  collect, cf. operators/similarity.py IVF) and re-enters the plan as
  LITERAL arrays, so assignment is a zero-shuffle map over the scan; the
  update step is one posexplode → map-side-combined (cid, dim) mean — the
  only exchange per iteration, carrying k×d rows after partial agg.
- the pair stage self-joins ONLY within clusters (the SemDeDup point): pair
  count is bounded by the largest cluster, not the corpus. A skewed/huge
  cluster is the known failure mode — production splits it by a salt on the
  join key or caps cluster size (the X20 salting pattern); at fixture scale
  k clusters of ~n/k rows each keep it trivially bounded.
- determinism end-to-end (no RNG, DuckDB-replayable): seeds are the k
  vectors of smallest md5(salt||id); every centroid coordinate is rounded
  to 6dp after each mean (so both engines restart each iteration from
  bit-identical centroids — the X29 quantize-the-loop-state trick);
  cosines are rounded to 6dp before every comparison, ties broken by
  centroid id / vector id.
- the per-row k-way cosine is an interpreted higher-order-function
  expression (fine at verification scale, exactly SQL-replayable); a
  production run swaps the assignment map to the Arrow-numpy path
  (similarity.brute_force_top_k_np's batch matmul) — same results, the
  expression form stays as the oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .similarity import cosine_expr

SEED_SALT = "semdedup-v1:"


def _as_double(vec):
    return F.transform(vec, lambda x: x.cast("double"))


def _round_vec(vec, dp: int = 6):
    return F.transform(vec, lambda x: F.round(x.cast("double"), dp))


def seed_centroids(
    vecs: DataFrame, vec_col: str, id_col: str, k: int
) -> list[list[float]]:
    """Deterministic k-means seeds: the k vectors with smallest
    md5(SEED_SALT||id) (a fixed pseudo-random draw — no RNG), coordinates
    rounded to 6dp. Returns driver-side lists (k×d — tiny)."""
    h = F.md5(F.concat(F.lit(SEED_SALT), F.col(id_col).cast("string")))
    rows = (
        vecs.select(_round_vec(F.col(vec_col)).alias("_v"), h.alias("_h"), id_col)
        .orderBy("_h", id_col)
        .limit(k)
        .collect()
    )
    return [[float(x) for x in r._v] for r in rows]


def _nearest(vec_col, centroids: list[list[float]]):
    """(cid, cos) of the nearest centroid: per-centroid 6dp-rounded cosine
    against literal arrays, argmax via array_position(array_max) — first
    match wins, so ties resolve to the smallest cid (the chained-F.when
    argmax is the known 2^n expression-tree trap; see CLAUDE.md)."""
    cos = [
        F.coalesce(
            F.round(
                cosine_expr(vec_col, F.array(*[F.lit(float(x)) for x in cv])), 6
            ),
            F.lit(-2.0),  # zero-norm vectors: rank below every real cosine
        )
        for cv in centroids
    ]
    arr = F.array(*cos)
    best = F.array_max(arr)
    return F.array_position(arr, best).cast("long"), best


def kmeans_assign(
    vecs: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 10,
    iters: int = 3,
) -> DataFrame:
    """Deterministic Lloyd k-means over cosine similarity.

    -> (id_col, vec_col, cid, cos) the final assignment (cid in 1..k; cos =
    6dp cosine to the assigned centroid). Each iteration: assignment is a
    zero-shuffle literal-array map; the update is one map-side-combined
    (cid, dim) mean, rounded to 6dp and collected (k×d rows) to seed the
    next step's literals."""
    cents = seed_centroids(vecs, vec_col, id_col, k)
    k = len(cents)  # fewer rows than k: every vector is its own seed
    base = vecs.select(id_col, _as_double(F.col(vec_col)).alias(vec_col))
    for _ in range(iters):
        cid, _cos = _nearest(F.col(vec_col), cents)
        asg = base.withColumn("cid", cid)
        means = (
            asg.select("cid", F.posexplode(F.col(vec_col)).alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.round(F.avg("x"), 6).alias("m"))
            .collect()
        )
        by_cid: dict[int, dict[int, float]] = {}
        for r in means:
            by_cid.setdefault(r.cid, {})[r.pos] = r.m
        # clusters that captured no vectors keep their previous centroid
        cents = [
            [by_cid[c + 1][p] for p in sorted(by_cid[c + 1])]
            if (c + 1) in by_cid
            else cents[c]
            for c in range(k)
        ]
    cid, cos = _nearest(F.col(vec_col), cents)
    return base.withColumn("cid", cid).withColumn("cos", cos)


def semantic_dupes(
    asg: DataFrame, vec_col: str, id_col: str, tau: float
) -> DataFrame:
    """-> (id_col,) DISTINCT vectors marked as semantic duplicates: v is
    pruned iff some lower-id u in the SAME cluster has 6dp cosine(u, v) >=
    tau (the deterministic one-shot keep-lowest-id variant of SemDeDup's
    within-cluster pruning; the join key is the cluster id, so pair work is
    bounded by the largest cluster, never corpus-quadratic)."""
    x = asg.select(
        F.col("cid"), F.col(id_col).alias("_xi"), F.col(vec_col).alias("_xv")
    )
    y = asg.select(
        F.col("cid"), F.col(id_col).alias("_yi"), F.col(vec_col).alias("_yv")
    )
    pair_cos = F.coalesce(
        F.round(cosine_expr(F.col("_xv"), F.col("_yv")), 6), F.lit(-2.0)
    )
    return (
        x.join(y, "cid")
        .filter(F.col("_xi") < F.col("_yi"))
        .filter(pair_cos >= tau)
        .select(F.col("_yi").alias(id_col))
        .distinct()
    )


# ---------------------------------------------------------------------------
# Arrow-numpy production path (the scale twin of the expression form above,
# cf. similarity.brute_force_top_k / brute_force_top_k_np): identical seeds,
# quantization, and tie rules — parity is pytest-pinned. At n×k assignment
# scale the batched BLAS matmul replaces n×k interpreted HOF cosines; the
# expression form stays as the DuckDB-oracle contract.
# ---------------------------------------------------------------------------
def _round6_np(a):
    """Vectorized HALF_UP 6dp rounding (numpy's round is half-even; Spark's
    F.round is half-up — identical on everything but exact 6dp half-points,
    which the parity tests never generate and real cosines never hit)."""
    import numpy as np

    return np.copysign(np.floor(np.abs(a) * 1e6 + 0.5), a) / 1e6


def _assign_np(base: DataFrame, vec_col: str, id_col: str, cents) -> DataFrame:
    import numpy as np
    import pandas as pd

    C = np.asarray(cents, dtype=np.float64)  # k×d, in the task closure
    nc = np.sqrt((C * C).sum(1))  # k

    def gen(batches):
        for pdf in batches:
            X = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            nx = np.sqrt((X * X).sum(1))
            denom = nx[:, None] * nc[None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = np.where(denom > 0.0, (X @ C.T) / denom, -2.0)
            cosr = _round6_np(cos)
            cid = cosr.argmax(1)  # first max → smallest cid (ties as expr form)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    vec_col: pdf[vec_col],
                    "cid": cid + 1,
                    "cos": cosr[np.arange(len(cosr)), cid],
                }
            )

    return base.mapInPandas(
        gen, f"{id_col} long, {vec_col} array<double>, cid long, cos double"
    )


def kmeans_assign_np(
    vecs: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 10,
    iters: int = 3,
) -> DataFrame:
    """Arrow-numpy twin of :func:`kmeans_assign` — same result, batched
    matmul assignment instead of n×k interpreted cosine expressions. Use
    this at production scale (k grows with n to hold cluster size
    constant — the SemDeDup regime — so assignment is n×k flops, which
    BLAS makes cheap and the expression form does not)."""
    cents = seed_centroids(vecs, vec_col, id_col, k)
    k = len(cents)
    base = vecs.select(id_col, _as_double(F.col(vec_col)).alias(vec_col))
    for _ in range(iters):
        asg = _assign_np(base, vec_col, id_col, cents)
        # identical F.round as the expression path — centroid quantization
        # must be bit-equal between the two forms for parity to hold
        means = (
            asg.select("cid", F.posexplode(F.col(vec_col)).alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.round(F.avg("x"), 6).alias("m"))
            .collect()
        )
        by_cid: dict[int, dict[int, float]] = {}
        for r in means:
            by_cid.setdefault(r.cid, {})[r.pos] = r.m
        cents = [
            [by_cid[c + 1][p] for p in sorted(by_cid[c + 1])]
            if (c + 1) in by_cid
            else cents[c]
            for c in range(k)
        ]
    return _assign_np(base, vec_col, id_col, cents)


def semantic_dupes_np(
    asg: DataFrame, vec_col: str, id_col: str, tau: float
) -> DataFrame:
    """Arrow-numpy twin of :func:`semantic_dupes`: per-cluster Gram-matrix
    pruning via applyInPandas (one task per cluster; memory is c² doubles
    for cluster size c — production holds c ~constant by scaling k, and a
    skewed giant cluster is split by salt before this stage, the X20
    pattern)."""
    import numpy as np
    import pandas as pd

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        X = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
        n = np.sqrt((X * X).sum(1))
        denom = n[:, None] * n[None, :]
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = np.where(denom > 0.0, (X @ X.T) / denom, -2.0)
        keep_mask = np.triu(_round6_np(cos) >= tau, 1).any(0)
        return pd.DataFrame({id_col: pdf[id_col].to_numpy()[keep_mask]})

    return asg.select("cid", id_col, vec_col).groupBy("cid").applyInPandas(
        prune, f"{id_col} long"
    )
