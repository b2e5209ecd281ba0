"""Materialized ANN indexes — build once, probe many (VERDICT r1 item 4).

The one-shot forms (similarity.py lsh_top_k / ivf_top_k) recompute
signatures or centroid routing over the ENTIRE corpus for every query; at
100 TB an ANN query must instead probe a persisted layout whose physical
organization lets the scan skip everything outside the probed buckets.
Reference analog: the reference has no vector search at all (its nearest
neighbor is driver-side pandas over per-volume stats,
select_challenging_images.py:56-100); this layer is rebuild-only
(SURVEY.md §2.13 X6).

Two index layouts, exercising Spark's two pruning mechanisms:

- **LSH index** (``build_lsh_index``): hyperplane signatures computed via
  the codegen explode→agg path (similarity.hyperplane_signatures), written
  as a BUCKETED table on ``sig`` (sources/io.write_bucketed_table). A probe
  filters ``sig IN (bucket set)`` — Catalyst's bucket pruning restricts the
  scan to matching buckets (`SelectedBucketsCount: x out of n` in the scan
  node, pinned by tests/test_ann_index.py), so file IO scales with
  n_probed/n_buckets of the corpus, not the corpus.
- **IVF index** (``build_ivf_index``): deterministic coarse centroids +
  nearest-centroid routing, written PARTITIONED BY ``cell`` — a probe's
  ``cell IN (probe set)`` is directory-level partition pruning
  (`PartitionFilters` in the scan; zero bytes read outside probed cells).
  The (tiny) centroid table is parquet beside the index, so probes never
  touch the corpus to find their cells.

Both builds are one corpus pass; both probes read only index files. Rebuild
cadence is the caller's tradeoff (index staleness vs build cost) — the
build is deterministic, so an incremental rebuild writes identical bytes
for unchanged inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.io import write_bucketed_table
from .similarity import (
    brute_force_top_k,
    hyperplane_signatures,
    probe_cells,
    query_bucket,
    route_to_cells,
    sample_centroids,
)


# ---------------------------------------------------------------------------
# LSH (bucketed on signature)
# ---------------------------------------------------------------------------
def build_lsh_index(
    spark: SparkSession,
    df: DataFrame,
    vec_col: str,
    id_col: str,
    name: str,
    path: str,
    n_planes: int = 12,
    seed: int = 42,
    n_buckets: int = 16,
) -> None:
    """One corpus pass: codegen signatures, join back to the vectors, write
    a bucketed table (id, sig, vec) bucketed+sorted on sig. NULL/empty
    vectors are excluded (no searchable direction)."""
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")).filter(
        F.col("vec").isNotNull() & (F.size("vec") > 0)
    )
    sigs = (
        hyperplane_signatures(base, "vec", "id", n_planes=n_planes, seed=seed)
        .withColumnRenamed("_id", "id")
        .withColumnRenamed("_sig", "sig")
    )
    idx = base.join(sigs, "id")
    write_bucketed_table(idx, name, ["sig"], n_buckets, path, sort_cols=["sig"])


def lsh_top_k_indexed(
    spark: SparkSession,
    index_name: str,
    query: list[float],
    k: int = 10,
    n_planes: int = 12,
    seed: int = 42,
    multiprobe: int = 1,
) -> DataFrame:
    """Probe the materialized LSH index: bucket set = query signature plus
    single-bit flips (multiprobe), exact cosine top-k over only those
    buckets. n_planes/seed MUST match the build (they define the signature
    space); the probe itself never touches the corpus.

    Spark's DisableUnnecessaryBucketedScan rule (autoBucketedScan, default
    on) downgrades a filter-only scan of a bucketed table to a plain file
    scan because no exchange is avoided — which silently DISCARDS bucket
    pruning and makes the probe read every bucket (measured: no
    SelectedBucketsCount in the plan). Pruning is the entire point of this
    index, so the engine disables autoBucketedScan as a SESSION default
    (session.get_spark — uniform plans regardless of query order); the set
    here is a safety net for externally-built sessions. It is idempotent
    and matches the session default, so it never changes an in-engine
    session's behavior mid-stream."""
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    qb = query_bucket(spark, query, n_planes, seed)
    buckets = {qb}
    if multiprobe > 0:
        for j in range(n_planes):
            buckets.add(qb ^ (1 << j))
    idx = spark.table(index_name)
    cand = idx.filter(F.col("sig").isin([int(b) for b in sorted(buckets)]))
    return brute_force_top_k(cand, "vec", "id", query, k)


# ---------------------------------------------------------------------------
# IVF (partitioned on cell)
# ---------------------------------------------------------------------------
def build_ivf_index(
    spark: SparkSession,
    df: DataFrame,
    vec_col: str,
    id_col: str,
    path: str,
    n_cells: int = 16,
    seed: int = 42,
) -> None:
    """One corpus pass: deterministic centroids, nearest-centroid routing,
    write ``{path}/index`` partitioned by cell + ``{path}/centroids``.
    Unroutable vectors — NULL/empty, zero-norm, wrong-dim (NULL ``_cell``
    from route_to_cells) — are excluded entirely: they have no searchable
    direction and would otherwise land in a NULL-cell partition no probe
    ever reads (review r2 + r2-b)."""
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")).filter(
        F.col("vec").isNotNull() & (F.size("vec") > 0)
    )
    cents = sample_centroids(base, "vec", "id", n_cells, seed)
    routed = (
        route_to_cells(base, "vec", cents)
        .filter(F.col("_cell").isNotNull())
        .select("id", "vec", F.col("_cell").alias("cell"))
    )
    routed.write.mode("overwrite").partitionBy("cell").parquet(f"{path}/index")
    spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(cents)],
        "cell int, centroid array<double>",
    ).write.mode("overwrite").parquet(f"{path}/centroids")


def ivf_top_k_indexed(
    spark: SparkSession,
    path: str,
    query: list[float],
    k: int = 10,
    n_probe: int = 4,
) -> DataFrame:
    """Probe the materialized IVF index: nearest cells from the tiny
    centroid table (driver-side), then exact cosine top-k over only the
    probed partitions — `cell IN (...)` prunes directories before any file
    is opened."""
    cents_rows = sorted(
        spark.read.parquet(f"{path}/centroids").collect(), key=lambda r: r.cell
    )
    cents = [list(r.centroid) for r in cents_rows]
    probe = probe_cells(cents, query, n_probe)
    idx = spark.read.parquet(f"{path}/index").filter(F.col("cell").isin(probe))
    return brute_force_top_k(idx, "vec", "id", query, k)
