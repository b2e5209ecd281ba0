"""X71 — rendezvous (highest-random-weight) sharding: the consistent
shard-assignment rule of Thaler & Ravishankar 1998 (HRW hashing), the
standard answer to "write 10^12 documents into S output shards so that
changing S moves only the minimum number of keys". Mod-based splits (X30)
remap ~everything when S changes; HRW moves exactly the keys whose new
shard wins the hash tournament — by construction those all land ON the
new shard, so resharding S -> S+1 touches ~1/(S+1) of the corpus and
nothing else. Used for output bucketing, sticky routing of hosts to
fetcher/executor groups, and cache-affinity assignment.
Reference analog: none — rebuild-only operator (SURVEY §2.13).

Spark-first shape, and how it holds at 100 TB:
- the whole assignment is ONE in-row codegen expression (an array of S
  md5+conv scores folded with array_max) — zero joins, zero shuffles,
  embarrassingly row-parallel; any report aggregation downstream is the
  usual map-side-combined groupBy.
- O(S) hashes per row is the classical HRW trade and is fine for the
  shard counts this operator contracts (S <= 1024); beyond that the
  published fix is the rendezvous skeleton tree, out of scope here.
- determinism: the 52-bit score and the shard id pack into ONE BIGINT
  (score * 1024 + s) so plain max IS "max score, ties to the larger
  shard id" — the X55/X64 pack-the-tiebreak discipline, replayable
  cross-engine with the '0x'-cast twin (no struct comparison semantics).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["rendezvous_score", "rendezvous_shard", "with_rendezvous_shard"]

MAX_SHARDS = 1024  # pack = score * 1024 + s must stay in int64 (52+10 bits)


def rendezvous_score(key: Column, shard: int, salt: str = "hrw") -> Column:
    """Packed tournament entry for one (key, shard) pair: the top 52 bits
    of md5(key:salt:shard) as the score, the shard id in the low 10 bits.
    max() over these IS the HRW argmax with ties to the larger shard."""
    h = F.md5(
        F.concat_ws(
            ":", key.cast("string"), F.lit(salt), F.lit(str(shard))
        )
    )
    score = F.conv(F.substring(h, 1, 13), 16, 10).cast("long")
    return score * MAX_SHARDS + F.lit(shard)


def rendezvous_shard(key: Column, n_shards: int, salt: str = "hrw") -> Column:
    """-> int shard in [0, n_shards): the HRW winner for ``key``. One
    in-row expression (no join, no shuffle)."""
    if not 1 <= n_shards <= MAX_SHARDS:
        raise ValueError(
            f"n_shards must be in 1..{MAX_SHARDS}, got {n_shards}"
        )
    packed = F.array_max(
        F.array(*[rendezvous_score(key, s, salt) for s in range(n_shards)])
    )
    return (packed % MAX_SHARDS).cast("int")


def with_rendezvous_shard(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    out_col: str = "shard",
    salt: str = "hrw",
) -> DataFrame:
    """Attach the HRW shard assignment as ``out_col``."""
    return df.withColumn(
        out_col, rendezvous_shard(F.col(key_col), n_shards, salt)
    )
