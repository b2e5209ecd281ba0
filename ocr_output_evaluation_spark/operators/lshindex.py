"""X54 — incremental MinHash-LSH index maintenance: keep a persisted
near-dup band index current across corpus snapshots by applying only the
DELTA (X52's diff), and answer near-dup probes for new/changed documents
against the updated index — without ever re-scanning the old corpus.
Reference analog: none — rebuild-only operator (the training-data layer,
SURVEY §2.13; the published context is the monthly-crawl dedup flow:
each Common-Crawl snapshot is deduplicated against everything already
ingested, and at 100 TB the only affordable shape is
delta-vs-persisted-index, never corpus-vs-corpus).

The index is two frames, both deterministic functions of the corpus:
  band rows  (band, bkey, _id)   — the LSH routing table
  sig store  (_id, _mh0.._mhk)   — signatures for candidate verification
Both use the md5 hash family of ``minhash_lsh_pairs_md5``
(operators/dedup.py) so every maintenance step sits behind the strict
DuckDB value-identity gate; the production swap to xxhash64 is the
established md5-twin pattern.

The maintenance invariant — THE correctness contract — is

    update(build(A), diff(A, B))  ==  build(B)

i.e. incremental application of removed/changed/added keys lands on
bit-identical frames to a full rebuild. The report's oracle exploits
this: DuckDB implements the REBUILD semantics directly (an independent
second implementation), while Spark runs the incremental path — a hash
match proves the incremental algebra, not just its transcription.

Scale design (the 100 TB shape):
- build runs once per corpus generation; after that every step is
  DELTA-scale: removals are broadcast anti-joins on the (few-percent)
  delta ids, insertions shingle/hash only the delta documents.
- the probe shuffles only the delta's band rows; the index side stays
  put — written through the bucketed sink (S10) keyed on (band, bkey),
  the probe equi-join plans exchange-free on the index side, and the
  degenerate-bucket guard (bucket census > max_bucket) keeps
  boilerplate buckets from going quadratic, exactly as in the batch
  LSH operator.
- the verify leg joins candidates to the sig store on _id — delta-scale
  rows against a bucketed-by-_id store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _md5_sigs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int,
    shingle_n: int,
) -> DataFrame:
    """-> (_id, _mh0.._mh{n-1}): per-seed min of md5('seed:shingle') via
    the codegen explode → map-side-combined min-agg path (the
    minhash_signatures discipline; docs shorter than one shingle drop)."""
    c = F.col(text_col)
    sh = (
        df.filter(F.length(c) >= shingle_n)
        .select(
            F.col(id_col).alias("_id"),
            F.explode(
                F.sequence(F.lit(1), F.length(c) - F.lit(shingle_n - 1))
            ).alias("_i"),
            c.alias("_t"),
        )
        .select(
            "_id", F.col("_t").substr(F.col("_i"), F.lit(shingle_n)).alias("_sh")
        )
    )
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("_sh")))).alias(f"_mh{i}")
        for i in range(n_hashes)
    ]
    return sh.groupBy("_id").agg(*aggs)


def _band_rows(sigs: DataFrame, n_hashes: int, bands: int) -> DataFrame:
    """Sig frame -> (band, bkey, _id): one md5 band key per band over the
    '|'-joined member hashes (seed order == band-slice order)."""
    rows_per_band = n_hashes // bands
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        "|",
                        *[
                            F.col(f"_mh{i}")
                            for i in range(
                                b * rows_per_band, (b + 1) * rows_per_band
                            )
                        ],
                    )
                ).alias("bkey"),
            )
            for b in range(bands)
        ]
    )
    return sigs.select("_id", F.explode(band_structs).alias("bk")).select(
        F.col("bk.band").alias("band"), F.col("bk.bkey").alias("bkey"), "_id"
    )


def lsh_index_build(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 5,
) -> tuple[DataFrame, DataFrame]:
    """-> (band_rows, sig_store) over the full corpus — the once-per-
    generation pass; everything after it is delta-scale."""
    sigs = _md5_sigs(df, text_col, id_col, n_hashes, shingle_n)
    return _band_rows(sigs, n_hashes, bands), sigs


def lsh_index_update(
    index: DataFrame,
    sigs: DataFrame,
    drop_ids: DataFrame,
    upserts: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 5,
) -> tuple[DataFrame, DataFrame]:
    """Apply a snapshot delta: ``drop_ids`` (one id column — the diff's
    removed + changed keys) leave both frames via broadcast anti-joins;
    ``upserts`` (the delta documents — added + changed) are
    shingled/hashed and unioned in. Only the delta is ever scanned;
    satisfies update(build(A), diff(A,B)) == build(B)."""
    rm = F.broadcast(drop_ids.select(F.col(drop_ids.columns[0]).alias("_id")))
    nb, ns = lsh_index_build(
        upserts, text_col, id_col, n_hashes, bands, shingle_n
    )
    # reselect: the USING-style anti-join moves _id first; keep the
    # build()'s column order so update==rebuild holds frame-for-frame
    kept = index.join(rm, "_id", "left_anti").select("band", "bkey", "_id")
    return (
        kept.unionByName(nb),
        sigs.join(rm, "_id", "left_anti").select(*ns.columns).unionByName(ns),
    )


def lsh_index_probe(
    index: DataFrame,
    sigs: DataFrame,
    queries: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 5,
    jaccard_threshold: float = 0.5,
    max_bucket: int = 200,
) -> DataFrame:
    """-> (query_id, index_id, est_jaccard): near-dup matches of each
    query document against the index (self-matches excluded — a query
    already present in the index skips its own rows). The degenerate-
    bucket guard censuses the INDEX: a query band row whose bucket holds
    more than ``max_bucket`` index rows is dropped before the equi-join,
    so boilerplate buckets cannot go quadratic. est_jaccard is the
    signature agreement fraction, threshold-filtered, exactly as in the
    batch ``minhash_lsh_pairs_md5``."""
    qsigs = _md5_sigs(queries, text_col, id_col, n_hashes, shingle_n)
    qb = _band_rows(qsigs, n_hashes, bands)
    sizes = index.groupBy("band", "bkey").agg(F.count(F.lit(1)).alias("bn"))
    bad = sizes.filter(F.col("bn") > max_bucket).select("band", "bkey")
    qb = qb.join(F.broadcast(bad), ["band", "bkey"], "left_anti")
    ib = index.select("band", "bkey", F.col("_id").alias("_iid"))
    cand = (
        qb.join(ib, ["band", "bkey"])
        .filter(F.col("_iid") != F.col("_id"))
        .select(F.col("_id").alias("query_id"), F.col("_iid").alias("index_id"))
        .dropDuplicates(["query_id", "index_id"])
    )
    agree = sum(
        F.when(F.col(f"_q{i}") == F.col(f"_x{i}"), 1).otherwise(0)
        for i in range(n_hashes)
    )
    qs = qsigs.select(
        F.col("_id").alias("query_id"),
        *[F.col(f"_mh{i}").alias(f"_q{i}") for i in range(n_hashes)],
    )
    xs = sigs.select(
        F.col("_id").alias("index_id"),
        *[F.col(f"_mh{i}").alias(f"_x{i}") for i in range(n_hashes)],
    )
    return (
        cand.join(qs, "query_id")
        .join(xs, "index_id")
        .withColumn(
            "est_jaccard", agree.cast("double") / F.lit(float(n_hashes))
        )
        .filter(F.col("est_jaccard") >= jaccard_threshold)
        .select("query_id", "index_id", "est_jaccard")
    )
