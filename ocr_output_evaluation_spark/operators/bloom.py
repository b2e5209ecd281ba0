"""Bloom-filter membership prefilter (X45) — the scan-side cull for
set-membership passes (decontamination, banned-line/URL lists, reference-
corpus dedup) when the reference side is large.

Reference-repo analog: none (training-data layer, SURVEY §2.13).

Why a Bloom layer when X21 already broadcasts the key set: a broadcast
HASH TABLE costs tens of bytes per key on every executor; the Bloom bitmap
costs ~10 BITS per key (25-50x smaller) and the probe is a pure in-row
expression — no join, no shuffle, nothing but a Filter above the scan. At
10^8-gram reference sets the hash-relation stops fitting executor memory
long before the bitmap does; and when even the exact verify can't
broadcast (reference-corpus-vs-corpus dedup), the bitmap still broadcasts
while only the tiny bloom-surviving fraction shuffles for exact
verification. A Bloom prefilter CANNOT change results: no false negatives
by construction, false positives removed by the exact verify — so
composed operators stay value-identical to their exact forms (and the
oracle gate checks exactly that).

Spark-first shape, and how it holds at 100 TB:
- BUILD: k seeded positions per key over the (small) reference frame,
  folded to <= m/64 bitmap words by ONE map-side-combined bit_or agg; the
  word frame collects once (bounded by m — a config, not the data) and
  re-enters as a literal array (the sanctioned tiny-frame closure, same
  as IVF centroids / PQ codebooks).
- PROBE: k codegen bit tests against the literal bitmap — zero shuffle,
  zero join, evaluated scan-side so Catalyst can collapse it into the
  same WholeStageCodegen span as the scan projection.
- positions are md5-derived ((0x || substr(md5('j:'||key),1,15)) % m — 60
  positive bits), so DuckDB replays the bitmap as a position SET and the
  strict oracle gate pins the CANDIDATE population exactly, not just the
  final counts. Production twin: xxhash64(j, key) positions, 8-byte one
  pass — the established md5-twin pattern (operators/decontaminate.py).
- sizing: bits_per_key=10, k=7 is the classic optimum (~0.8% fpp); the
  literal-bitmap form suits reference sets up to ~10^7 keys (~16 MB
  bitmap). Beyond that, shard the reference and apply per-shard bitmaps
  in sequence, or drop to the X21 broadcast join.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F

# element_at lookup table for 1L << b (b = 0..63); bit 63 is the long sign
# bit, so its mask is the negative-most long. F.shiftleft takes only int
# literal shift amounts (CLAUDE.md), hence the table.
_POW2 = [1 << b for b in range(63)] + [-(1 << 63)]

DEFAULT_BITS_PER_KEY = 10
DEFAULT_K = 7


def bloom_m_bits(n_keys: int, bits_per_key: int = DEFAULT_BITS_PER_KEY) -> int:
    """Bitmap size in bits: bits_per_key per key, rounded up to whole
    64-bit words, never empty."""
    return 64 * max(1, -(-(max(n_keys, 1) * bits_per_key) // 64))


def _bloom_pos(key: Column, j: int, m_bits: int) -> Column:
    """Position of seed j for a key: 60 positive md5 bits mod m. DuckDB
    twin: ('0x' || substr(md5(j || ':' || key), 1, 15))::BIGINT % m."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{j}:"), key)), 1, 15), 16, 10
    ).cast("long")
    return F.pmod(h, F.lit(m_bits))


def build_bloom_bitmap(
    keys: DataFrame, col: str, m_bits: int, k: int = DEFAULT_K
) -> list[int]:
    """-> m_bits/64 longs with bit pos%64 of word pos//64 set for every
    seeded position of every key. One union of k tiny selects, one
    map-side-combined bit_or agg, one bounded collect."""
    parts = [
        keys.select(_bloom_pos(F.col(col), j, m_bits).alias("_pos"))
        for j in range(k)
    ]
    words = (
        reduce(DataFrame.unionAll, parts)
        .select(
            F.shiftright(F.col("_pos"), 6).alias("_w"),
            F.element_at(
                F.lit(_POW2),
                (F.col("_pos").bitwiseAND(F.lit(63)) + 1).cast("int"),
            ).alias("_m"),
        )
        .groupBy("_w")
        .agg(F.bit_or("_m").alias("_bits"))
        .collect()
    )
    bitmap = [0] * (m_bits // 64)
    for r in words:
        bitmap[r["_w"]] = r["_bits"]
    return bitmap


def bloom_might_contain(
    key: Column, bitmap: list[int], m_bits: int, k: int = DEFAULT_K
) -> Column:
    """True iff every seeded bit of ``key`` is set — the pure-expression
    probe (k codegen bit tests, no join, no shuffle). False positives at
    the configured fpp; never false negatives for keys the bitmap was
    built over."""
    bm = F.lit(bitmap)
    checks = []
    for j in range(k):
        pos = _bloom_pos(key, j, m_bits)
        word = F.element_at(bm, (F.shiftright(pos, 6) + 1).cast("int"))
        mask = F.element_at(
            F.lit(_POW2), (pos.bitwiseAND(F.lit(63)) + 1).cast("int")
        )
        checks.append(word.bitwiseAND(mask) != 0)
    return reduce(lambda a, b: a & b, checks)


def bloom_contamination_scores(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 4,
    bits_per_key: int = DEFAULT_BITS_PER_KEY,
    k: int = DEFAULT_K,
) -> DataFrame:
    """X21's contamination scoring behind the Bloom prefilter — value-
    identical output plus the candidate column the bloom layer adds:

    -> (id_col, n_grams, n_cand, n_hits, overlap) where n_grams counts
    the doc's DISTINCT n-grams (computed IN-ROW — the exploded frame
    never re-aggregates for the total), n_cand of them pass the bloom
    bitmap (candidates = hits + false positives; md5 positions, so the
    oracle pins this count exactly), n_hits survive the exact verify
    against the true key set, overlap = hits/grams (NULL when no grams).

    Only bloom survivors reach the exact-verify broadcast join — the
    corpus-side cull is a scan-side Filter, and the corpus never shuffles
    for membership (one per-doc partial-agg merge, as X21).
    """
    from ..functions.ngram import word_ngrams
    from .decontaminate import _gram_key, benchmark_ngram_keys

    keys = benchmark_ngram_keys(bench, text_col, n)
    m_bits = bloom_m_bits(keys.count(), bits_per_key)
    bitmap = build_bloom_bitmap(keys, "_gram", m_bits, k)

    cand = (
        docs.select(
            F.col(id_col),
            F.explode(
                F.array_distinct(word_ngrams(F.col(text_col), n))
            ).alias("_g"),
        )
        .select(id_col, _gram_key(F.col("_g")).alias("_gram"))
        .where(bloom_might_contain(F.col("_gram"), bitmap, m_bits, k))
    )
    scored = (
        cand.join(
            F.broadcast(keys.withColumn("_hit", F.lit(1))), "_gram", "left"
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_cand"),
            F.count("_hit").alias("n_hits"),
        )
    )
    base = docs.select(
        F.col(id_col),
        F.size(F.array_distinct(word_ngrams(F.col(text_col), n)))
        .cast("long")
        .alias("n_grams"),
    )
    return base.join(scored, id_col, "left").select(
        id_col,
        "n_grams",
        F.coalesce(F.col("n_cand"), F.lit(0).cast("long")).alias("n_cand"),
        F.coalesce(F.col("n_hits"), F.lit(0).cast("long")).alias("n_hits"),
        F.when(
            F.col("n_grams") > 0,
            F.coalesce(F.col("n_hits"), F.lit(0).cast("long"))
            / F.col("n_grams"),
        ).alias("overlap"),
    )
