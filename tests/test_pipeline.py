"""Pipeline tests: resumable bucketed extraction (SURVEY.md §5.2(4)) and the
doc/group metrics layer end-to-end on fixture data."""

import pytest
from pyspark.sql import functions as F

from ocr_output_evaluation_spark.fixtures.generate import (
    reference_lm_pdf,
    token_confidences_row,
    web_pages_df,
)
from ocr_output_evaluation_spark.plans.pipeline import run_extraction
from ocr_output_evaluation_spark.schema import REFERENCE_LM, TOKEN_CONFIDENCES

N = 400
N_BUCKETS = 8


@pytest.fixture(scope="module")
def source_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("pipe") / "web_pages.parquet")
    web_pages_df(spark, N, partitions=4).write.parquet(p)
    return p


class TestResume:
    def test_kill_and_resume_matches_clean_run(self, spark, source_path, tmp_path_factory):
        base = tmp_path_factory.mktemp("runs")
        clean_out = str(base / "clean_out")
        clean_mf = str(base / "clean_mf")
        r = run_extraction(spark, source_path, clean_out, clean_mf, n_buckets=N_BUCKETS)
        assert r["row_count"] == N and len(r["processed_buckets"]) == N_BUCKETS

        # "crash" after 3 buckets, then resume
        part_out = str(base / "part_out")
        part_mf = str(base / "part_mf")
        r1 = run_extraction(
            spark, source_path, part_out, part_mf, n_buckets=N_BUCKETS, max_buckets=3
        )
        assert len(r1["processed_buckets"]) == 3 and r1["skipped_buckets"] == []
        r2 = run_extraction(spark, source_path, part_out, part_mf, n_buckets=N_BUCKETS)
        assert r2["skipped_buckets"] == r1["processed_buckets"]
        assert len(r2["processed_buckets"]) == N_BUCKETS - 3

        # resumed output identical to clean output (url -> sha)
        a = {
            (x.url): (x.text_sha256, x.error, x.bucket)
            for x in spark.read.parquet(clean_out).collect()
        }
        b = {
            (x.url): (x.text_sha256, x.error, x.bucket)
            for x in spark.read.parquet(part_out).collect()
        }
        assert a == b

        # third run: everything skipped, nothing reprocessed
        r3 = run_extraction(spark, source_path, part_out, part_mf, n_buckets=N_BUCKETS)
        assert r3["processed_buckets"] == [] and len(r3["skipped_buckets"]) == N_BUCKETS

    def test_manifest_lineage_columns(self, spark, source_path, tmp_path_factory):
        base = tmp_path_factory.mktemp("lineage")
        out, mf = str(base / "out"), str(base / "mf")
        r = run_extraction(spark, source_path, out, mf, n_buckets=4)
        m = spark.read.parquet(mf)
        rows = m.collect()
        assert len(rows) == 4
        for row in rows:
            assert row.source_snapshot_id == f"{source_path}#nb=4"
            assert row.extraction_version == r["extraction_version"]
            assert row.status == "done" and row.finished_at is not None
        assert m.agg(F.sum("row_count")).collect()[0][0] == N


class TestVersionedResume:
    def test_changed_extraction_version_reprocesses(self, spark, source_path, tmp_path_factory):
        """The manifest keys completion on (snapshot, extraction_version): a
        version bump must invalidate every bucket (SURVEY.md §7 lineage)."""
        from ocr_output_evaluation_spark.sources.manifest import completed_buckets

        base = tmp_path_factory.mktemp("ver")
        out, mf = str(base / "out"), str(base / "mf")
        r = run_extraction(spark, source_path, out, mf, n_buckets=4)
        snap = f"{source_path}#nb=4"
        assert sorted(completed_buckets(spark, mf, snap, r["extraction_version"])) == [0, 1, 2, 3]
        assert completed_buckets(spark, mf, snap, "deadbeef0000") == []
        assert completed_buckets(spark, mf, "other-snapshot", r["extraction_version"]) == []


class TestMetricsLayer:
    def test_doc_and_group_metrics(self, spark, source_path, tmp_path_factory):
        from ocr_output_evaluation_spark.plans.metrics import doc_metrics, group_metrics

        base = tmp_path_factory.mktemp("metrics")
        out, mf = str(base / "out"), str(base / "mf")
        run_extraction(spark, source_path, out, mf, n_buckets=4)
        extracted = spark.read.parquet(out)

        confs = spark.createDataFrame(
            [token_confidences_row(i) for i in range(N)], schema=TOKEN_CONFIDENCES
        )
        lm = spark.createDataFrame(reference_lm_pdf(), schema=REFERENCE_LM)
        dm = doc_metrics(spark, extracted, confs, lm)
        rows = dm.collect()
        assert len(rows) == N
        ok = [r for r in rows if r.n_confs and r.n_confs > 1]
        assert ok, "expected docs with confidence arrays"
        for r in ok[:50]:
            assert 0.0 <= r.mean_conf <= 1.0
            assert r.min_conf <= r.median_conf <= r.max_conf
            assert r.p10_conf <= r.p25_conf <= r.p75_conf <= r.p90_conf <= r.p95_conf
            assert r.n_high_conf + r.n_med_conf + r.n_low_conf == r.n_confs
        # perplexity classes present: scored docs and NULL (error docs)
        assert any(r.perplexity is not None for r in rows)
        assert any(r.perplexity is None for r in rows)

        gm = group_metrics(dm, ["lang"]).collect()
        assert 0 < len(gm) <= 5
        assert sum(r.n_docs for r in gm) == N

    def test_run_quality_pipeline_end_to_end(self, spark, source_path, tmp_path_factory):
        """The full EP1 chain: extraction -> doc_metrics -> lang/domain
        rollups + CSV twins, resumable (second invocation skips extraction)."""
        import os

        from ocr_output_evaluation_spark.plans.pipeline import run_quality_pipeline

        base = tmp_path_factory.mktemp("full")
        confs_p = str(base / "confs.parquet")
        lm_p = str(base / "lm.parquet")
        spark.createDataFrame(
            [token_confidences_row(i) for i in range(N)], schema=TOKEN_CONFIDENCES
        ).write.parquet(confs_p)
        spark.createDataFrame(reference_lm_pdf(), schema=REFERENCE_LM).write.parquet(lm_p)

        out = str(base / "out")
        r = run_quality_pipeline(spark, source_path, confs_p, lm_p, out, n_buckets=4)
        assert r["row_count"] == N
        assert r["doc_metrics_rows"] == N
        assert set(r["group_metrics_rows"]) == {"lang", "domain"}
        assert 0 < r["group_metrics_rows"]["lang"] <= 5
        gm = spark.read.parquet(f"{out}/group_metrics_lang")
        assert gm.agg(F.sum("n_docs")).collect()[0][0] == N
        csv_dir = f"{out}/group_metrics_lang_csv"
        assert any(f.endswith(".csv") for f in os.listdir(csv_dir))

        # resume: extraction is skipped, metrics recomputed idempotently
        r2 = run_quality_pipeline(spark, source_path, confs_p, lm_p, out, n_buckets=4)
        assert r2["processed_buckets"] == [] and len(r2["skipped_buckets"]) == 4
        assert r2["doc_metrics_rows"] == N

    def test_no_python_in_group_plan(self, spark, source_path, tmp_path_factory):
        """group_metrics over doc_metrics parquet must be pure JVM (no
        BatchEvalPython / ArrowEvalPython nodes) — the no-per-row-Python
        invariant for the analytics layer."""
        from ocr_output_evaluation_spark.plans.metrics import group_metrics

        base = tmp_path_factory.mktemp("plan")
        out, mf = str(base / "out"), str(base / "mf")
        run_extraction(spark, source_path, out, mf, n_buckets=4)
        # materialize doc_metrics-like frame WITHOUT the udf (perplexity from disk)
        extracted = spark.read.parquet(out).withColumn(
            "n_chars", F.coalesce(F.length("extracted_text").cast("long"), F.lit(0))
        ).withColumn("n_tokens", F.lit(1).cast("long")).withColumn(
            "mean_conf", F.rand(7)
        ).withColumn("perplexity", F.rand(11) * 1000)
        plan = group_metrics(extracted, ["lang"])._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan


def test_training_export_collapses_exact_and_near_dups(spark, tmp_path):
    """Composed export: junk filtered by the quality gate, exact dups keep
    one representative, near-dup cluster keeps the min-doc_key member,
    unique docs pass through; output written partitioned and counted."""
    from pyspark.sql import functions as F

    from ocr_output_evaluation_spark.plans.export import run_training_export

    base = (
        "the quick brown fox jumps over the lazy dog and then walks down to "
        "the river where it finds a small boat with a red sail and a wooden "
        "oar that somebody left behind on the muddy bank near the old mill"
    )
    near_base = (
        "in the village by the mountain the baker wakes before dawn to heat "
        "the stone oven and knead the dough for the market where the farmers "
        "arrive with carts of apples and the children watch the pigeons"
    )
    near_a = near_base + " yesterday evening"
    near_b = near_base + " yesterday morning"
    uniq_text = (
        "completely different content about spark physical plans and the "
        "cost of a shuffle exchange when the build side of a join would fit "
        "in a broadcast and the optimizer statistics are stale or missing"
    )
    rows = [
        ("http://a.example/1", base, 0),       # exact-dup group
        ("http://a.example/2", base, 0),
        ("http://b.example/1", near_a, 1),     # near-dup pair (distinct base:
        ("http://b.example/2", near_b, 1),     #  must not near-match group a)
        ("http://c.example/1", uniq_text, 0),  # unique
        ("http://d.example/1", "!!!???!!!..,,;;;!!!", 1),  # junk -> quality gate
        ("http://e.example/1", None, 0),       # null text
    ]
    df = spark.createDataFrame(rows, "url string, text string, bucket int")
    src = str(tmp_path / "extracted")
    df.write.partitionBy("bucket").parquet(src)

    summary = run_training_export(
        spark, src, str(tmp_path / "out"), min_quality=0.35, jaccard_threshold=0.6
    )
    assert summary["input_rows"] == 7
    assert summary["quality_pass_rows"] == 5   # junk + null dropped
    assert summary["exact_unique_rows"] == 4   # exact-dup pair collapsed
    assert summary["near_dup_pairs"] == 1      # the near pair (exact pair already merged)
    assert summary["kept_rows"] == 3           # one per cluster + unique

    out = spark.read.parquet(str(tmp_path / "out" / "training_docs"))
    kept_urls = {r.url for r in out.select("url").collect()}
    # representatives are min doc_key per cluster — recompute, don't hardcode
    def min_key(urls):
        from ocr_output_evaluation_spark.plans.export import doc_key_expr

        kd = {
            r.url: r.k
            for r in spark.createDataFrame([(u,) for u in urls], "url string")
            .select("url", doc_key_expr("url").alias("k"))
            .collect()
        }
        return min(urls, key=lambda u: (kd[u], u))

    assert kept_urls == {
        min_key(["http://a.example/1", "http://a.example/2"]),
        min_key(["http://b.example/1", "http://b.example/2"]),
        "http://c.example/1",
    }
    assert "bucket" in out.columns  # partition column survived the write


def test_training_export_same_url_different_text_keeps_one(spark, tmp_path):
    """Review regression: doc identity is doc_key_expr(url), so two rows
    sharing a url (re-crawl snapshots with different text) must collapse to
    ONE graph node before the near-dup stages — not merge clusters or
    double-keep through the left_semi."""
    from ocr_output_evaluation_spark.plans.export import run_training_export

    t1 = (
        "first snapshot of the page with a long enough body of text to pass "
        "the quality gate including plenty of common stopwords that the "
        "scorer wants to see in a natural language document overall"
    )
    t2 = t1.replace("first", "second").replace("overall", "entirely")
    rows = [("http://same.example/page", t1, 0), ("http://same.example/page", t2, 0)]
    df = spark.createDataFrame(rows, "url string, text string, bucket int")
    src = str(tmp_path / "extracted")
    df.write.partitionBy("bucket").parquet(src)

    summary = run_training_export(
        spark, src, str(tmp_path / "out"), min_quality=0.35, jaccard_threshold=0.6
    )
    assert summary["quality_pass_rows"] == 2
    assert summary["exact_unique_rows"] == 1  # one row per doc_key survives
    assert summary["kept_rows"] == 1


def test_doc_key_collision_resistance(spark):
    """VERDICT r1 item 7: 64-bit xxhash64(url) keys collide ~27k times at
    10^12 docs and the one-row-per-key window silently drops one doc per
    collision. (a) demonstrate the drop mechanism by injecting a
    deliberately-narrow key; (b) show the 126-bit default key separates
    docs the narrow key conflates and packs both independent hashes."""
    from pyspark.sql import functions as F

    from ocr_output_evaluation_spark.plans.export import (
        doc_key_expr,
        training_export_plan,
    )

    # fully distinct texts (no shared shingles) so the near-dup stage cannot
    # legitimately merge anything — only key collisions can lose docs here
    rows = [
        (
            f"http://site.example/{i}",
            " ".join(f"tok{i}x{j}" for j in range(60)),
            0,
        )
        for i in range(8)
    ]
    df = spark.createDataFrame(rows, "url string, text string, bucket int")

    # (a) a 1-bit key conflates distinct urls -> the per-key window provably
    # drops docs (this IS the old failure mode, shrunk to test scale)
    narrow = training_export_plan(
        df, url_col="url", min_quality=0.2, jaccard_threshold=0.95,
        key_expr=F.pmod(F.xxhash64(F.col("url")), F.lit(2)).cast("long"),
    )
    n_narrow = narrow["uniq"].count()
    for f in narrow["_persisted"]:
        f.unpersist()
    assert n_narrow == 2  # 8 distinct docs crushed onto 2 keys -> 6 dropped

    # (b) the default 126-bit key keeps every distinct url
    wide = training_export_plan(
        df, url_col="url", min_quality=0.2, jaccard_threshold=0.95
    )
    n_wide = wide["uniq"].count()
    kept = wide["kept"].count()
    for f in wide["_persisted"]:
        f.unpersist()
    assert n_wide == 8 and kept == 8

    # (c) key structure: DECIMAL(38,0) packing hi*2^62 + lo with independent
    # seeds — reconstructable, so neither half is dead weight
    probe = (
        spark.createDataFrame([(u,) for u, _, _ in rows], "url string")
        .select(
            doc_key_expr("url").alias("k"),
            F.xxhash64(F.col("url")).alias("h1"),
            F.pmod(F.xxhash64(F.col("url"), F.lit(1)), F.lit(2**62)).alias("h2"),
        )
        .collect()
    )
    assert len({r.k for r in probe}) == 8
    for r in probe:
        assert int(r.k) == int(r.h1) * 2**62 + int(r.h2)


def test_training_export_split_is_cluster_atomic_and_partitioned(spark, tmp_path):
    """The export's split column: keyed on the cluster id (== the kept
    representative's doc_key), deterministic across runs, assignment
    matching assign_split's md5 rule exactly, and the output laid out
    partitioned by split (outer) then bucket."""
    import os

    from pyspark.sql import functions as F

    from ocr_output_evaluation_spark.operators.splits import assign_split
    from ocr_output_evaluation_spark.plans.export import run_training_export

    # 30 fully distinct docs (disjoint shingle sets, as in the collision
    # test): every doc is its own cluster representative.
    rows = [
        (
            f"http://s{i}.example/p",
            "the and with for that this from "  # stopwords for the quality gate
            + " ".join(f"tok{i}x{j}" for j in range(50)),
            i % 2,
        )
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "url string, text string, bucket int")
    src = str(tmp_path / "extracted")
    df.write.partitionBy("bucket").parquet(src)

    summary = run_training_export(
        spark, src, str(tmp_path / "out"), min_quality=0.2, jaccard_threshold=0.9
    )
    assert summary["kept_rows"] == 30
    assert sum(summary["split_rows"].values()) == 30
    assert set(summary["split_rows"]) <= {"train", "val", "test"}

    out = spark.read.parquet(str(tmp_path / "out" / "training_docs"))
    # assignment == assign_split(component) with the export salt, re-derived
    want = {
        r.component: r.s
        for r in assign_split(
            out.select("component"), F.col("component"),
            salt="export-split-v1", out_col="s",
        ).collect()
    }
    got = {r.component: r.split for r in out.select("component", "split").collect()}
    assert got == want
    # representatives carry component == doc_key
    assert out.filter(F.col("component") != F.col("doc_key")).count() == 0
    # physical layout: split is the outer partition directory, bucket nested
    base = str(tmp_path / "out" / "training_docs")
    split_dirs = {d for d in os.listdir(base) if d.startswith("split=")}
    assert split_dirs and all(
        any(x.startswith("bucket=") for x in os.listdir(os.path.join(base, d)))
        for d in split_dirs
    )
    # determinism: a second run lands every doc in the same split
    summary2 = run_training_export(
        spark, src, str(tmp_path / "out2"), min_quality=0.2, jaccard_threshold=0.9
    )
    out2 = spark.read.parquet(str(tmp_path / "out2" / "training_docs"))
    got2 = {r.component: r.split for r in out2.select("component", "split").collect()}
    assert got2 == got and summary2["split_rows"] == summary["split_rows"]


def test_training_export_exact_substr_stage(spark):
    """Optional X37 span-cleaning stage in the export plan: with
    exact_substr_k set, kept docs gain text_clean/es_tokens/es_dropped
    attached in-row (keep-one mode: the canonical copy of a duplicated
    span survives, later copies lose it; the original text column is
    untouched)."""
    from pyspark.sql import functions as F

    from ocr_output_evaluation_spark.plans.export import training_export_plan

    shared = "alpha beta gamma"  # 3-token span planted in two distinct docs
    rows = [
        (
            "http://a.example/1",
            shared + " " + " ".join(f"ax{j} bx{j} cx{j}" for j in range(20)),
            0,
        ),
        (
            "http://b.example/2",
            " ".join(f"dx{j} ex{j} fx{j}" for j in range(20)) + " " + shared,
            0,
        ),
        ("http://c.example/3", " ".join(f"gx{j} hx{j}" for j in range(30)), 0),
    ]
    df = spark.createDataFrame(rows, "url string, text string, bucket int")
    plan = training_export_plan(
        df, min_quality=0.2, jaccard_threshold=0.95, exact_substr_k=3
    )
    kept = plan["kept"]
    assert {"text_clean", "es_tokens", "es_dropped", "text"} <= set(kept.columns)
    got = {r.url: r for r in kept.collect()}
    for f in plan["_persisted"]:
        f.unpersist()
    assert len(got) == 3
    # exactly ONE of the two span-sharing docs lost the 3 tokens (keep-one);
    # the unrelated doc lost nothing; the original text column is intact
    drops = sorted(r.es_dropped for r in got.values())
    assert drops == [0, 0, 3]
    originals = {u: t for u, t, _ in rows}
    for u, r in got.items():
        assert r.text == originals[u]
        if r.es_dropped == 3:
            assert "alpha" not in r.text_clean and "beta" not in r.text_clean


def test_run_training_export_forwards_exact_substr(spark, tmp_path):
    """The job wrapper exposes the span-cleaning stage: the written table
    carries text_clean/es_tokens/es_dropped and the summary the dropped-
    token total (review finding: the option existed only on the plan)."""
    from ocr_output_evaluation_spark.plans.export import run_training_export

    shared = "alpha beta gamma"
    rows = [
        ("http://a.example/1",
         shared + " " + " ".join(f"ax{j} bx{j} cx{j}" for j in range(20)), 0),
        ("http://b.example/2",
         " ".join(f"dx{j} ex{j} fx{j}" for j in range(20)) + " " + shared, 0),
    ]
    df = spark.createDataFrame(rows, "url string, text string, bucket int")
    src = str(tmp_path / "extracted")
    df.write.partitionBy("bucket").parquet(src)
    summary = run_training_export(
        spark, src, str(tmp_path / "out"),
        min_quality=0.2, jaccard_threshold=0.95, exact_substr_k=3,
    )
    assert summary["exact_substr_dropped_tokens"] == 3  # keep-one: one copy
    out = spark.read.parquet(str(tmp_path / "out") + "/training_docs")
    assert {"text_clean", "es_tokens", "es_dropped"} <= set(out.columns)


def test_run_training_export_dsir_selection(spark, tmp_path):
    """X39 as an export stage: with dsir_target set every kept doc gains
    dsir_logw; with dsir_top_k the Gumbel top-k survive, target-like docs
    over-represented, and re-runs select the identical set."""
    from ocr_output_evaluation_spark.plans.export import run_training_export

    rows = []
    en_vocab = [f"en{w}" for w in range(20)]
    de_vocab = [f"de{w}" for w in range(20)]
    for i in range(60):
        vocab = en_vocab if i % 3 == 0 else de_vocab
        # shared style vocabulary + per-doc unique markers: a strong
        # distribution signal that still survives exact AND near dedup
        toks = [
            vocab[(i * 7 + j * (3 + i % 5)) % 20] if j % 5 else f"u{i}x{j}"
            for j in range(30)
        ]
        rows.append((f"http://d.example/{i}", " ".join(toks),
                     "en" if i % 3 == 0 else "de", 0))
    df = spark.createDataFrame(rows, "url string, text string, lang string, bucket int")
    src = str(tmp_path / "extracted")
    df.write.partitionBy("bucket").parquet(src)

    kw = dict(
        min_quality=0.0, jaccard_threshold=0.95,
        dsir_target="lang = 'en'", dsir_top_k=15, dsir_buckets=64,
    )
    summary = run_training_export(spark, src, str(tmp_path / "out"), **kw)
    out = spark.read.parquet(str(tmp_path / "out") + "/training_docs")
    assert {"dsir_logw", "dsir_score"} <= set(out.columns)
    assert summary["kept_rows"] == 15
    assert summary["dsir_mean_logw"] is not None
    # the en/'quick brown fox' style is 1/3 of the corpus but dominates the
    # selection (that is what the stage is for)
    n_en = out.filter(out.lang == "en").count()
    assert n_en >= 12, f"only {n_en}/15 selected docs match the target style"

    summary2 = run_training_export(spark, src, str(tmp_path / "out2"), **kw)
    a = sorted(r.url for r in out.select("url").collect())
    out2 = spark.read.parquet(str(tmp_path / "out2") + "/training_docs")
    b = sorted(r.url for r in out2.select("url").collect())
    assert a == b and summary2["kept_rows"] == 15
