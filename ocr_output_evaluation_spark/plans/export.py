"""Training-data export: the composed pipeline a 100 TB pre-training corpus
build actually runs over the extracted table —

    quality gate → exact dedup → near-dup cluster collapse →
    cluster-atomic train/val/test split → partitioned write

Reference analog: the reference stops at per-volume quality stats and a
sampled manifest (/root/reference/select_challenging_images.py:72
`drop_duplicates` is its only dedup); the export layer is rebuild-only
(SURVEY.md §2.13) but built entirely from operators that ARE oracle/parity
tested individually (quality_score, exact-dup window, minhash_lsh_pairs,
connected_components).

Scale design:
- doc identity is a 126-bit packed decimal (``doc_key_expr``): xxhash64(url)
  in the high bits, an independent-seed xxhash64 in the low 62 — so
  near-dup edges and components carry 16-byte fixed keys instead of url
  strings through every shuffle. 64 bits is NOT enough at the 10^12-doc
  design point: birthday collisions there number ~27k in expectation, and
  the one-row-per-key window below silently drops one doc per collision
  (VERDICT r1 item 7); at 126 bits the expectation is ~3e-14.
- exact dedup is one window over text_sha256 (hash-partitioned, no skew:
  sha256 keys are uniform) keeping the min-url-hash row — deterministic
  across cluster sizes.
- near-dup candidates come from the MinHash-LSH path (banded signatures,
  bounded buckets), NOT the O(n^2) exact-Jaccard path; the pair set feeds
  hash-min connected components and only cluster representatives
  (component == own key) survive.
- execution model: `training_export_plan` is NOT free to call — the
  connected-components stage runs Spark jobs eagerly at plan-build time
  (its convergence loop needs actions), and TWO frames come back persisted
  (`clean` and `pairs`; both listed in the returned ``_persisted`` entry —
  callers unpersist them once their counts/joins are done). The other
  returned frames are lazy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from pyspark.sql.column import Column

from ..functions.text import quality_score
from ..operators.components import connected_components
from ..operators.dedup import minhash_lsh_pairs
from ..operators.splits import DEFAULT_FRACTIONS, assign_split


def doc_key_expr(url_col: str) -> Column:
    """126-bit document identity as DECIMAL(38,0):
    ``xxhash64(url) * 2^62 + (xxhash64(url, 1) mod 2^62)``.

    Decimal because the graph stages need one orderable, groupable scalar
    (min-label propagation, windows, joins); 2^126 > 10^37 fits DECIMAL(38)
    with headroom, and a collision now needs BOTH independent xxhash64
    draws to agree. Cost: 16-byte keys through the dedup shuffles instead
    of 8 — the price of not silently losing ~27k docs per 10^12."""
    hi = F.xxhash64(F.col(url_col)).cast("decimal(20,0)").cast("decimal(38,0)")
    lo = F.pmod(F.xxhash64(F.col(url_col), F.lit(1)), F.lit(2**62))
    return hi * F.lit(2**62).cast("decimal(38,0)") + lo.cast("decimal(38,0)")


def training_export_plan(
    docs: DataFrame,
    text_col: str = "text",
    url_col: str = "url",
    min_quality: float = 0.35,
    jaccard_threshold: float = 0.7,
    n_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 5,
    key_expr: Column | None = None,
    split_fractions: tuple[tuple[str, int], ...] = DEFAULT_FRACTIONS,
    split_salt: str = "export-split-v1",
    exact_substr_k: int | None = None,
    exact_substr_min_docs: int = 2,
    dsir_target: "str | Column | None" = None,
    dsir_top_k: int | None = None,
    dsir_buckets: int = 8192,
) -> dict:
    """Build the export lineage over an extracted-documents frame.

    Returns the dict of stage frames ``{"clean", "uniq", "pairs",
    "components", "kept", "_persisted"}`` — `kept` is the final training
    set: quality-passed, exact-deduped, one representative per near-dup
    cluster (the min doc_key, i.e. stable across runs and cluster sizes).
    With ``exact_substr_k`` set, a final span-cleaning stage (X37,
    operators/exactsubstr.py, Lee et al. keep-one mode) appends
    ``text_clean`` — the document's NORMALIZED token stream with
    non-canonical corpus-duplicated K-token spans removed (fingerprints
    are defined over normalized tokens, so the cleaned text lives in that
    space; the original ``text`` column is left untouched) — plus
    ``es_tokens``/``es_dropped`` accounting columns, all attached in-row
    via the operator's keep_cols pass-through (no rejoin of the corpus).
    NOTE: the components stage executes eagerly here (iterative fixpoint);
    `clean` and `pairs` come back persisted — unpersist the frames in
    ``_persisted`` when done (run_training_export / the registered query
    do). ``key_expr`` overrides the 126-bit default doc identity — used by
    the collision test to inject a deliberately-narrow key and demonstrate
    the drop mechanism the wide default prevents."""
    key = (key_expr if key_expr is not None else doc_key_expr(url_col)).alias("doc_key")
    clean = (
        docs.filter(
            F.col(text_col).isNotNull() & (F.length(F.col(text_col)) > 0)
        )
        .withColumn("quality", quality_score(text_col))
        .filter(F.col("quality") >= min_quality)
        .withColumn("doc_key", key)
        .persist()
    )

    # exact dedup, two hash-partitioned windows (sha256 keys are uniform —
    # no skew):
    #  1. one row per doc_key: the graph stages key nodes on doc_key, so a
    #     url appearing twice (re-crawl snapshots) or an xxhash64 collision
    #     must not put two rows behind one node — that would merge unrelated
    #     near-dup clusters through the shared key and make the final
    #     left_semi keep/drop both rows together;
    #  2. one row per text sha256: min doc_key wins (deterministic).
    sha = F.sha2(F.col(text_col), 256)
    w_key = W.partitionBy("doc_key").orderBy(sha.asc(), F.col(url_col).asc())
    w_sha = W.partitionBy(sha).orderBy(F.col("doc_key").asc(), F.col(url_col).asc())
    uniq = (
        clean.withColumn("_rn", F.row_number().over(w_key))
        .filter(F.col("_rn") == 1)
        .withColumn("_rn", F.row_number().over(w_sha))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )

    # cache=False: the signature frame would be a hidden persist no caller
    # can free (dedup.py docstring warns about it); instead persist the much
    # smaller verified-pairs frame, which both the component stage and the
    # caller's pair count consume
    pairs = minhash_lsh_pairs(
        uniq,
        text_col,
        "doc_key",
        n_hashes=n_hashes,
        bands=bands,
        shingle_n=shingle_n,
        jaccard_threshold=jaccard_threshold,
        cache=False,
    ).persist()
    components = connected_components(
        uniq.select("doc_key"), pairs, node_col="doc_key"
    )
    reps = components.filter(F.col("id") == F.col("component")).select(
        F.col("id").alias("doc_key")
    )
    # Representatives satisfy component == doc_key by construction (hash-min
    # propagation converges to the min key, and only id == component rows
    # survive the reps filter), so the cluster id is attached for free — no
    # second join against the full components frame.
    kept = uniq.join(reps, "doc_key", "left_semi").withColumn(
        "component", F.col("doc_key")
    )
    # Leakage-safe split assignment, keyed on the CLUSTER id: every member
    # of a near-dup cluster maps to the same split, so a later "expand the
    # cluster back in" (or a dup-aware eval set) cannot straddle train/test.
    # Deterministic md5 expression — re-runs and incremental appends are
    # stable, and no shuffle is added (one codegen column on kept).
    kept = assign_split(
        kept, F.col("component"), fractions=split_fractions, salt=split_salt
    )
    if exact_substr_k:
        from ..operators.exactsubstr import exact_substr_dedup

        kept = exact_substr_dedup(
            kept,
            text_col,
            "doc_key",
            k=exact_substr_k,
            min_docs=exact_substr_min_docs,
            keep_cols=tuple(c for c in kept.columns if c != "doc_key"),
            keep_first=True,
        ).withColumnsRenamed(
            {"text_dedup": "text_clean", "n_tokens": "es_tokens",
             "n_dropped": "es_dropped"}
        )
    if dsir_target is not None:
        # X39 DSIR selection stage (operators/dsir.py): tilt the kept set
        # toward the target slice's hashed-ngram distribution. `dsir_target`
        # is a boolean expression over the kept columns (CLI passes a SQL
        # string) marking the target subset; every doc gains `dsir_logw`,
        # and with `dsir_top_k` set only the Gumbel top-k survive (sampling
        # without replacement ∝ importance weight — deterministic md5
        # noise, stable across re-runs/resumes). The weight pass never
        # shuffles the corpus (explode_outer → broadcast LM join → per-doc
        # agg); the attach is a 1:1 enrichment join on the doc key.
        from ..operators.dsir import dsir_log_weights, gumbel_noise

        tgt = F.expr(dsir_target) if isinstance(dsir_target, str) else dsir_target
        w = dsir_log_weights(
            kept, tgt, text_col, "doc_key", n_buckets=dsir_buckets
        ).select("doc_key", F.col("logw").alias("dsir_logw"))
        kept = kept.join(w, "doc_key")
        if dsir_top_k:
            kept = (
                kept.withColumn(
                    "dsir_score",
                    F.col("dsir_logw") + gumbel_noise(F.col("doc_key")),
                )
                .orderBy(F.desc("dsir_score"), "doc_key")
                .limit(dsir_top_k)
            )
    return {
        "clean": clean,
        "uniq": uniq,
        "pairs": pairs,
        "components": components,
        "kept": kept,
        "_persisted": [clean, pairs],
    }


def run_training_export(
    spark: SparkSession,
    extracted_path: str,
    out_dir: str,
    text_col: str = "text",
    url_col: str = "url",
    min_quality: float = 0.35,
    jaccard_threshold: float = 0.7,
    partition_col: str | None = "bucket",
    split_fractions: tuple[tuple[str, int], ...] = DEFAULT_FRACTIONS,
    split_salt: str = "export-split-v1",
    exact_substr_k: int | None = None,
    exact_substr_min_docs: int = 2,
    dsir_target: str | None = None,
    dsir_top_k: int | None = None,
    dsir_buckets: int = 8192,
) -> dict:
    """Job wrapper: read the extracted table, run the export plan, write the
    kept set partitioned by the resume bucket, report per-stage counts.
    Counts are read off the written output where possible so the expensive
    stages execute once. ``exact_substr_k`` enables the X37 span-cleaning
    stage (see training_export_plan): the written table gains
    text_clean/es_tokens/es_dropped and the summary a dropped-token
    total."""
    docs = spark.read.parquet(extracted_path)
    stages = training_export_plan(
        docs,
        text_col=text_col,
        url_col=url_col,
        min_quality=min_quality,
        jaccard_threshold=jaccard_threshold,
        split_fractions=split_fractions,
        split_salt=split_salt,
        exact_substr_k=exact_substr_k,
        exact_substr_min_docs=exact_substr_min_docs,
        dsir_target=dsir_target,
        dsir_top_k=dsir_top_k,
        dsir_buckets=dsir_buckets,
    )
    kept = stages["kept"]
    writer = kept.write.mode("overwrite")
    # Layout: split is the outer partition (training readers consume one
    # split at a time), the resume bucket nests inside it.
    pcols = ["split"] + (
        [partition_col] if partition_col and partition_col in kept.columns else []
    )
    writer = writer.partitionBy(*pcols)
    writer.parquet(f"{out_dir}/training_docs")

    out = spark.read.parquet(f"{out_dir}/training_docs")
    summary = {
        "input_rows": docs.count(),
        "quality_pass_rows": stages["clean"].count(),
        "exact_unique_rows": stages["uniq"].count(),
        "near_dup_pairs": stages["pairs"].count(),
        "kept_rows": out.count(),
        "split_rows": {
            r.split: r.n
            for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
        },
        "out_dir": out_dir,
    }
    if exact_substr_k:
        summary["exact_substr_dropped_tokens"] = out.agg(
            F.coalesce(F.sum("es_dropped"), F.lit(0)).cast("long")
        ).collect()[0][0]
    if dsir_target is not None:
        summary["dsir_mean_logw"] = (
            out.agg(F.round(F.avg("dsir_logw"), 6)).collect()[0][0]
        )
    for frame in stages["_persisted"]:
        frame.unpersist()
    return summary
