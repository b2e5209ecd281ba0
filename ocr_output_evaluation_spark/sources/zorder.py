"""X57 — Z-order (Morton) data layout: multi-dimensional clustering for
scan pruning, the primitive behind Delta/Iceberg ``OPTIMIZE ZORDER BY``
(Morton 1966; the database use is classic — e.g. Orenstein & Merrett
1984). A table range-sorted on ONE column prunes parquet files/row-groups
only for predicates on that column; interleaving the bits of two (or
more) columns into one Morton key and range-writing on it gives every
interleaved column locally-tight min/max file statistics, so a
conjunctive box predicate prunes on ALL of them — the layout lever that
turns a 100 TB full scan into a perimeter-sized one. No engine change,
no index: just the write order.
Reference analog: none (the reference reads whole volumes; layout is a
rebuild-only, warehouse-scale concern — SURVEY §2.13).

The key is pure unrolled bit arithmetic (shiftleft/shiftright take only
LITERAL shift amounts in Spark — CLAUDE.md — so the interleave unrolls
in Python at build time into 2·bits codegen ops), values clamped to
[0, 2^bits); it is therefore exactly replayable in DuckDB (same >> <<
& | semantics on BIGINTs) and sits behind the strict oracle gate.

``cluster_by_zorder`` writes deterministic equal-width key ranges
(file = z·n_files div 2^(2·bits)) rather than ``repartitionByRange``
(whose boundaries come from sampling — banned on deterministic paths
by CLAUDE.md). Equal-width is the right choice for the bounded,
near-uniform key space the clamp produces; skewed dimensions should be
rank-transformed first (any monotone per-column transform preserves
the pruning property).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F

BITS_DEFAULT = 12  # per-dimension resolution: key space [0, 2^24)


def morton_key(c1: Column, c2: Column, bits: int = BITS_DEFAULT) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer
    columns (clamped into [0, 2^bits)): c1 occupies even bit positions,
    c2 odd. DuckDB twin: the same unrolled (x >> i & 1) << 2i terms
    OR-summed; generate with ``morton_key_sql``."""
    cap = (1 << bits) - 1
    a = F.least(F.greatest(c1.cast("long"), F.lit(0)), F.lit(cap))
    b = F.least(F.greatest(c2.cast("long"), F.lit(0)), F.lit(cap))
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return reduce(lambda x, y: x + y, terms).cast("long")


def morton_key_sql(e1: str, e2: str, bits: int = BITS_DEFAULT) -> str:
    """The DuckDB twin expression for ``morton_key`` over SQL
    expressions ``e1``/``e2`` (each clamped the same way)."""
    cap = (1 << bits) - 1
    a = f"least(greatest(CAST({e1} AS BIGINT), 0), {cap})"
    b = f"least(greatest(CAST({e2} AS BIGINT), 0), {cap})"
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def cluster_by_zorder(
    df: DataFrame,
    c1: str,
    c2: str,
    path: str,
    n_files: int = 16,
    bits: int = BITS_DEFAULT,
) -> None:
    """Write ``df`` clustered into ``n_files`` equal-width Morton-key
    ranges (deterministic — no sampled range boundaries), one directory
    partition per range (``z_bucket=K``), rows key-sorted within files.
    ``partitionBy`` — not ``repartition(n, bucket)`` — because hash
    placement would COLLIDE distant key ranges into shared files and
    wreck their min/max stats; with directory partitioning a data file
    never mixes buckets, so every interleaved column gets locally-tight
    per-file statistics and box predicates on (c1, c2) prune on both
    dimensions. Readers see ``z_bucket`` back as a partition column —
    predicates on it additionally get DIRECTORY-level pruning for free."""
    z = morton_key(F.col(c1), F.col(c2), bits)
    span = 1 << (2 * bits)
    (
        df.withColumn("_z", z)
        .withColumn("z_bucket", F.expr(f"div(_z * {n_files}, {span})"))
        .repartition(n_files, F.col("z_bucket"))
        .sortWithinPartitions("z_bucket", "_z")
        .drop("_z")
        .write.partitionBy("z_bucket")
        .mode("overwrite")
        .parquet(path)
    )
