"""Structured Streaming layer: incremental extraction (byte-identity per
micro-batch + checkpoint resume), watermarked windowed aggregation, and the
custom stateful running-totals operator.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_output_evaluation_spark.extract import extract_document
from ocr_output_evaluation_spark.fixtures.generate import web_pages_df, web_pages_pdf
from ocr_output_evaluation_spark.streaming import (
    read_web_pages_stream,
    running_lang_totals,
    stream_extraction,
    windowed_lang_counts,
)

N1, N2 = 120, 60


@pytest.fixture(scope="module")
def source_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stream_src"))
    web_pages_df(spark, N1, 4).write.mode("append").parquet(d)
    return d


def test_stream_extraction_byte_identity_and_resume(spark, source_dir, tmp_path):
    out = str(tmp_path / "extracted")
    ckpt = str(tmp_path / "ckpt")
    q = stream_extraction(spark, source_dir, out, ckpt)
    q.awaitTermination()

    got = {r.url: r.text_sha256 for r in spark.read.parquet(out).collect()}
    want = {
        row.url: extract_document(row.html).text_sha256
        for _, row in web_pages_pdf(N1).iterrows()
    }
    assert got == want, "streamed extraction not byte-identical to golden"

    # New files arrive in the same dir; restart from the same checkpoint ->
    # ONLY the new rows are processed and appended (offset resume, no dups).
    web_pages_df(spark, N2, 2).write.mode("append").parquet(source_dir)
    q2 = stream_extraction(spark, source_dir, out, ckpt)
    q2.awaitTermination()
    rows = spark.read.parquet(out).collect()
    assert len(rows) == N1 + N2  # no reprocessing of the first batch
    assert len({r.url for r in rows}) == N1  # second batch = same seeded urls


def test_windowed_lang_counts_matches_batch(spark, source_dir, tmp_path):
    stream = windowed_lang_counts(read_web_pages_stream(spark, source_dir), "1 hour")
    q = (
        stream.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.window_start, r.lang): (r.n_pages, r.raw_chars)
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    batch = (
        spark.read.parquet(source_dir)
        .groupBy(F.window("warc_ts", "1 hour").alias("win"), "lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length(F.coalesce("text", F.lit("")))).alias("c"),
        )
        .select(F.col("win.start").alias("ws"), "lang", "n", "c")
        .collect()
    )
    want = {(r.ws, r.lang): (r.n, r.c) for r in batch}
    # availableNow + append emits only watermark-closed windows; every
    # emitted window must match the batch rollup exactly, and most windows
    # must have been emitted (watermark = 2h holds back only the tail).
    assert got
    for k, v in got.items():
        assert want[k] == v
    assert len(got) >= len(want) - 3


def test_running_lang_totals_stateful(spark, source_dir, tmp_path):
    stream = running_lang_totals(read_web_pages_stream(spark, source_dir))
    q = (
        stream.writeStream.format("memory")
        .queryName("run_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM run_totals").collect()
    # last emitted total per lang == batch ground truth
    final = {}
    for r in rows:
        prev = final.get(r.lang)
        if prev is None or r.total_pages >= prev[0]:
            final[r.lang] = (r.total_pages, r.total_chars)
    batch = (
        spark.read.parquet(source_dir)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length(F.coalesce("text", F.lit("")))).alias("c"),
        )
        .collect()
    )
    want = {r.lang: (r.n, r.c) for r in batch}
    assert final == want


def test_stream_dedup_within_watermark(spark, tmp_path):
    """Watermarked streaming exact dedup: same extracted content arriving
    under different urls within the watermark collapses to one row; error
    rows (NULL sha) all pass through (url-fallback dedup key)."""
    from datetime import datetime

    from ocr_output_evaluation_spark.schema import WEB_PAGES
    from ocr_output_evaluation_spark.streaming import stream_dedup_extraction

    pdf = web_pages_pdf(8)
    good = pdf[pdf.html.map(lambda h: h is not None and len(h) > 200)].reset_index(drop=True)
    html_a, html_b = bytes(good.iloc[0].html), bytes(good.iloc[1].html)
    t0 = datetime(2024, 5, 1, 12, 0, 0)
    t1 = datetime(2024, 5, 1, 12, 30, 0)  # within the 2h watermark of t0
    rows = [
        ("http://dup.example/1", t0, html_a, None, "en"),
        ("http://dup.example/2", t0, html_a, None, "en"),   # same content
        ("http://dup.example/3", t1, html_a, None, "en"),   # same, 30min later
        ("http://uniq.example/1", t0, html_b, None, "en"),
        ("http://err.example/1", t0, b"", None, "en"),      # error rows: both
        ("http://err.example/2", t0, b"", None, "en"),      # must survive
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, WEB_PAGES).coalesce(1).write.parquet(src)

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = stream_dedup_extraction(spark, src, out, ckpt)
    q.awaitTermination()

    res = spark.read.parquet(out).collect()
    ok = [r for r in res if r.error is None]
    errs = [r for r in res if r.error is not None]
    assert len(errs) == 2, "error rows must not collapse on NULL sha"
    shas = [r.text_sha256 for r in ok]
    assert len(shas) == len(set(shas)) == 2  # html_a once, html_b once
    assert all(u.startswith(("http://dup.", "http://uniq.")) for u in {r.url for r in ok})


def test_stream_dedup_state_survives_restart(spark, tmp_path):
    """Dedup state lives in the checkpoint: a duplicate of batch-1 content
    arriving after a RESTART (same event-time horizon) must still be
    dropped — exactly-once dedup across stream restarts."""
    from datetime import datetime

    from ocr_output_evaluation_spark.schema import WEB_PAGES
    from ocr_output_evaluation_spark.streaming import stream_dedup_extraction

    pdf = web_pages_pdf(8)
    good = pdf[pdf.html.map(lambda h: h is not None and len(h) > 200)].reset_index(drop=True)
    html_a = bytes(good.iloc[0].html)
    t0 = datetime(2024, 5, 1, 12, 0, 0)
    t1 = datetime(2024, 5, 1, 12, 45, 0)  # later but within the 2h watermark

    src = str(tmp_path / "src")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    spark.createDataFrame(
        [("http://r.example/1", t0, html_a, None, "en")], WEB_PAGES
    ).coalesce(1).write.mode("append").parquet(src)
    q = stream_dedup_extraction(spark, src, out, ckpt)
    q.awaitTermination()
    assert spark.read.parquet(out).count() == 1

    # restart: same content, new url, new file — state must remember the sha
    spark.createDataFrame(
        [("http://r.example/2", t1, html_a, None, "en")], WEB_PAGES
    ).coalesce(1).write.mode("append").parquet(src)
    q2 = stream_dedup_extraction(spark, src, out, ckpt)
    q2.awaitTermination()
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 1 and rows[0].url == "http://r.example/1"


def test_stream_static_enrichment_join(spark, source_dir, tmp_path):
    """Stream-static join: each micro-batch enriches against a batch dim
    table with NO streaming state; unmatched rows keep NULL enrichment."""
    from ocr_output_evaluation_spark.streaming import enrich_stream_with_dim

    dim = spark.createDataFrame(
        [("en", "latin"), ("de", "latin"), ("zh", "cjk")], "lang string, script string"
    )
    stream = read_web_pages_stream(spark, source_dir)
    enriched = enrich_stream_with_dim(
        stream.select("url", "lang"), dim, on="lang"
    )
    q = (
        enriched.writeStream.format("memory")
        .queryName("enriched_pages")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM enriched_pages").collect()
    # N.B. source_dir is module-scoped and the resume test appends a second
    # batch with re-seeded urls — enrichment must preserve EVERY stream row
    # (left join), so only compare against the batch row count, not url
    # uniqueness
    n_src = spark.read.parquet(source_dir).count()
    assert len(rows) == n_src and len(rows) > 0
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, set()).add(r.script)
    assert by_lang["en"] == {"latin"} and by_lang["zh"] == {"cjk"}
    # langs absent from the dim (fr/es/bo fixtures) survive with NULL script
    missing = set(by_lang) - {"en", "de", "zh"}
    assert missing and all(by_lang[m] == {None} for m in missing)


def test_stream_kill_midway_then_resume_exactly_once(spark, tmp_path):
    """VERDICT r2 item 7: the offset-exact resume drill at the kill level —
    stop the query mid-run (after the first committed micro-batch of
    several), restart from the same checkpoint, and assert the final output
    equals the batch extractor's golden exactly: no dupes, no gaps, and the
    resumed run reads ONLY the rows the killed run had not committed."""
    import time

    src = str(tmp_path / "src")
    out = str(tmp_path / "extracted")
    ckpt = str(tmp_path / "ckpt")
    n = 96
    web_pages_df(spark, n, 8).write.mode("append").parquet(src)  # 8 files

    # one file per micro-batch -> up to 8 batches; stop at the first commit
    q = stream_extraction(spark, src, out, ckpt, max_files_per_trigger=1)
    deadline = time.time() + 180
    while time.time() < deadline and not q.recentProgress:
        time.sleep(0.05)
    q.stop()
    q.awaitTermination()

    # the parquet file-sink's _spark_metadata log exposes only COMMITTED
    # batches to batch reads — the partial output must be duplicate-free
    # and a subset of the corpus (an in-flight batch leaves no visible rows)
    try:
        part = spark.read.parquet(out).collect()
    except Exception:
        part = []  # stop landed before the first commit — still a valid drill
    assert len({r.url for r in part}) == len(part) <= n

    q2 = stream_extraction(spark, src, out, ckpt, max_files_per_trigger=1)
    q2.awaitTermination()
    rows = spark.read.parquet(out).collect()

    want = {
        row.url: extract_document(row.html).text_sha256
        for _, row in web_pages_pdf(n).iterrows()
    }
    got = {r.url: r.text_sha256 for r in rows}
    assert len(rows) == n, f"dupes or gaps after resume: {len(rows)} != {n}"
    assert got == want, "resumed output not byte-identical to batch golden"

    # offset-exactness at the input level: the resume read exactly the
    # complement of what the killed run committed
    resumed_in = sum(int(p["numInputRows"]) for p in q2.recentProgress)
    assert resumed_in == n - len(part), (resumed_in, len(part))


def test_stream_as_of_join_out_of_order_matches_batch(spark, tmp_path):
    """VERDICT r3 item 8: the watermarked stream-stream as-of drill.
    Events and revisions arrive across micro-batches (two independent file
    sources, one per stream) with event-time order deliberately violated —
    earlier-ts rows land in later batches, inside the 1h watermark.
    Emission is watermark-final, keys without further input flush via
    EventTimeTimeout, and the final output must equal the batch as_of_join
    (X34) on the same sentinel-free data exactly."""
    import time as _time
    from datetime import datetime

    from ocr_output_evaluation_spark.operators.asof import as_of_join
    from ocr_output_evaluation_spark.streaming import stream_as_of_join

    B = lambda h, m: datetime(2024, 5, 1, h, m, 0)  # noqa: E731
    L_SCHEMA = "key string, ts timestamp, left_id long"
    R_SCHEMA = "key string, ts timestamp, value string"
    left_waves = [
        [("k1", B(12, 20), 2), ("k2", B(12, 15), 4)],          # later ts first
        [("k1", B(12, 5), 1), ("k1", B(11, 55), 3), ("k2", B(12, 9), 5)],
    ]
    right_waves = [
        [("k1", B(12, 0), "r1a")],
        # out-of-order, including a NULL-valued revision: it must
        # participate in matching exactly like the batch operator (id4 at
        # 12:15 matches ts 12:12 with a NULL value, not the older r2a)
        [("k1", B(12, 20), "r1b"), ("k2", B(12, 10), "r2a"),
         ("k2", B(12, 12), None)],
        # sentinels: push the watermark past every real event, then one more
        # batch so the advanced watermark is applied — k1 flushes by input,
        # k2 (no further input in the final batch) by event-time timeout
        [("k1", B(14, 30), "SENTINEL"), ("k2", B(14, 30), "SENTINEL")],
        [("k1", B(14, 31), "SENTINEL")],
    ]
    lsrc, rsrc = str(tmp_path / "lsrc"), str(tmp_path / "rsrc")
    for i in range(max(len(left_waves), len(right_waves))):
        if i < len(left_waves):
            spark.createDataFrame(left_waves[i], L_SCHEMA).coalesce(1).write.mode(
                "append"
            ).parquet(lsrc)
        if i < len(right_waves):
            spark.createDataFrame(right_waves[i], R_SCHEMA).coalesce(1).write.mode(
                "append"
            ).parquet(rsrc)
        _time.sleep(1.1)  # distinct mtimes -> file-source arrival order

    left = (
        spark.readStream.schema(L_SCHEMA).option("maxFilesPerTrigger", 1).parquet(lsrc)
    )
    # sentinels flow THROUGH the operator: filtering them upstream would
    # strip them before the watermark node and the watermark would never
    # advance. They're inert — far-future right revisions that match no
    # left event — and only exist to push the watermark past the real data.
    right = (
        spark.readStream.schema(R_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(rsrc)
    )
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        stream_as_of_join(left, right, watermark="1 hour")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.key, r.left_id, r.ts, r.asof_ts, r.asof_value)
        for r in spark.read.parquet(out_dir).collect()
    }

    lb = spark.createDataFrame([r for w in left_waves for r in w], L_SCHEMA)
    rb = spark.createDataFrame(
        [r for w in right_waves for r in w if r[2] != "SENTINEL"], R_SCHEMA
    )
    want = {
        (r.key, r.left_id, r.ts, r.asof_ts, r.asof_value)
        for r in as_of_join(lb, rb, ["key"], "ts", "ts", ["value"]).collect()
    }
    assert len(got) == 5 and got == want
    # spot the semantics: id1 -> r1a, id2 -> r1b (inclusive tie at 12:20),
    # id4 -> the NEWER NULL-valued revision at 12:12, id3/id5 -> unmatched
    by_id = {lid: (ats, v) for _, lid, _, ats, v in got}
    assert by_id == {
        1: (B(12, 0), "r1a"),
        2: (B(12, 20), "r1b"),
        3: (None, None),
        4: (B(12, 12), None),
        5: (None, None),
    }


def test_stream_as_of_join_integer_keys_coerce(spark, tmp_path):
    """Non-string keys must not crash at Arrow output conversion: the
    operator casts key to string (and id to long) at intake — pin with a
    bigint key, the exact shape asof_attribution_report's user_id has."""
    import time as _time
    from datetime import datetime

    from ocr_output_evaluation_spark.streaming import stream_as_of_join

    B = lambda h, m: datetime(2024, 5, 1, h, m, 0)  # noqa: E731
    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    spark.createDataFrame(
        [(7, B(12, 10), 1)], "key long, ts timestamp, left_id long"
    ).coalesce(1).write.parquet(lsrc)
    for i, w in enumerate(
        [[(7, B(12, 0), "v1")], [(7, B(14, 0), "S")], [(7, B(14, 1), "S")]]
    ):
        spark.createDataFrame(w, "key long, ts timestamp, value string").coalesce(
            1
        ).write.mode("append").parquet(rsrc)
        _time.sleep(1.1)
    left = spark.readStream.schema("key long, ts timestamp, left_id long").parquet(lsrc)
    right = (
        spark.readStream.schema("key long, ts timestamp, value string")
        .option("maxFilesPerTrigger", 1)
        .parquet(rsrc)
    )
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        stream_as_of_join(left, right, watermark="1 hour")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.read.parquet(out_dir).collect()
    assert [(r.key, r.left_id, r.asof_value) for r in rows] == [("7", 1, "v1")]


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
        HealthCheck.data_too_large,
    ],
)
@given(
    lefts=st.lists(
        st.tuples(st.sampled_from("ab"), st.integers(0, 59)),
        min_size=1, max_size=8,
    ),
    rights=st.lists(
        st.tuples(
            st.sampled_from("ab"),
            st.integers(0, 59),
            st.one_of(st.none(), st.sampled_from(["v1", "v2", "v3"])),
        ),
        min_size=0, max_size=8,
    ),
    split=st.integers(0, 7),
)
def test_stream_as_of_join_fuzz_matches_batch(spark, tmp_path_factory, lefts, rights, split):
    """Randomized stream-vs-batch as-of parity: arbitrary key/ts multisets
    (duplicate timestamps, NULL revision values, ties) split across two
    arrival waves, flushed by sentinels + timeout — the multiset of
    emitted rows must equal the batch as_of_join exactly."""
    import time as _time
    from datetime import datetime, timedelta

    from ocr_output_evaluation_spark.operators.asof import as_of_join
    from ocr_output_evaluation_spark.streaming import stream_as_of_join

    tmp = tmp_path_factory.mktemp("asof_fuzz")
    base = datetime(2024, 5, 1, 12, 0, 0)
    lrows = [(k, base + timedelta(minutes=m), i) for i, (k, m) in enumerate(lefts)]
    rrows = [(k, base + timedelta(minutes=m), v) for k, m, v in rights]
    sent = base + timedelta(hours=3)
    lsrc, rsrc = str(tmp / "l"), str(tmp / "r")
    lw = [lrows[:split], lrows[split:]]
    rw = [
        rrows[: len(rrows) // 2],
        rrows[len(rrows) // 2:],
        [("a", sent, "S"), ("b", sent, "S")],
        [("a", sent + timedelta(minutes=1), "S")],
    ]
    L, R = "key string, ts timestamp, left_id long", "key string, ts timestamp, value string"
    for i in range(4):
        if i < len(lw) and lw[i]:
            spark.createDataFrame(lw[i], L).coalesce(1).write.mode("append").parquet(lsrc)
        if rw[i]:
            spark.createDataFrame(rw[i], R).coalesce(1).write.mode("append").parquet(rsrc)
        _time.sleep(1.05)
    left = spark.readStream.schema(L).option("maxFilesPerTrigger", 1).parquet(lsrc)
    right = spark.readStream.schema(R).option("maxFilesPerTrigger", 1).parquet(rsrc)
    q = (
        stream_as_of_join(left, right, watermark="1 hour")
        .writeStream.format("parquet")
        .option("path", str(tmp / "out"))
        .option("checkpointLocation", str(tmp / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r.key, r.left_id, r.ts, r.asof_ts, r.asof_value)
        for r in spark.read.parquet(str(tmp / "out")).collect()
    )
    lb = spark.createDataFrame(lrows, L)
    rb = spark.createDataFrame([r for r in rrows], R) if rrows else spark.createDataFrame([], R)
    want = sorted(
        (r.key, r.left_id, r.ts, r.asof_ts, r.asof_value)
        for r in as_of_join(lb, rb, ["key"], "ts", "ts", ["value"]).collect()
    )
    assert got == want


def test_stream_hll_registers_match_batch_and_resume(spark, tmp_path):
    """Streaming HLL (complete-mode groupBy-max) must equal the batch
    sketch over everything seen so far — after the first wave, AND after a
    checkpoint restart over appended files (max is associative/commutative,
    so incremental state == batch union). Estimates then agree exactly."""
    from ocr_output_evaluation_spark.operators.hll import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )
    from ocr_output_evaluation_spark.streaming import stream_hll_registers

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    rows1 = [(f"u{i % 800}", f"g{i % 3}") for i in range(3000)]
    rows2 = [(f"v{i % 500}", f"g{i % 3}") for i in range(2000)]
    spark.createDataFrame(rows1, "k string, g string").write.mode("append").parquet(src)

    def run_wave(name):
        stream = spark.readStream.schema("k string, g string").parquet(src)
        q = (
            stream_hll_registers(stream, "k", ["g"])
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {
            (r.g, r._bucket): r._rho
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        }

    def batch_regs(df):
        return {
            (r.g, r._bucket): r._rho
            for r in hll_registers(df, "k", ["g"]).collect()
        }

    d1 = spark.createDataFrame(rows1, "k string, g string")
    got1 = run_wave("hll_wave1")
    assert got1 == batch_regs(d1)

    # New files arrive; restart from the SAME checkpoint: only the new
    # rows are read, yet complete-mode state equals the batch union.
    spark.createDataFrame(rows2, "k string, g string").write.mode("append").parquet(src)
    d12 = d1.unionByName(spark.createDataFrame(rows2, "k string, g string"))
    got2 = run_wave("hll_wave2")
    assert got2 == batch_regs(d12)

    # Mergeability (the per-day artifact story): sketch(part1) merged with
    # sketch(part2) == sketch(union) == the streaming state.
    d2 = spark.createDataFrame(rows2, "k string, g string")
    merged = {
        (r.g, r._bucket): r._rho
        for r in hll_merge(
            hll_registers(d1, "k", ["g"]), hll_registers(d2, "k", ["g"])
        ).collect()
    }
    assert merged == got2

    # And the estimates derived from identical registers are identical.
    est_stream = spark.createDataFrame(
        [(g, b, r) for (g, b), r in got2.items()], "g string, _bucket long, _rho int"
    )
    e1 = {r.g: r.n_hll for r in hll_estimate(est_stream, ["g"]).collect()}
    e2 = {r.g: r.n_hll for r in hll_estimate(hll_registers(d12, "k", ["g"]), ["g"]).collect()}
    assert e1 == e2


def test_stream_cms_cells_match_batch_and_resume(spark, tmp_path):
    """Streaming CMS (complete-mode groupBy-count over in-row probes)
    must equal the batch sketch over everything seen so far — after the
    first wave, AND after a checkpoint restart over appended files (sum
    is associative/commutative and the checkpoint guarantees each row
    counts exactly once — the non-idempotent half of the streaming-
    sketch contract, vs HLL's replay-forgiving max)."""
    from ocr_output_evaluation_spark.operators.cms import cms_merge, cms_sketch
    from ocr_output_evaluation_spark.streaming import stream_cms_cells

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    rows1 = [(f"u{i % 90}",) for i in range(1500)]
    rows2 = [(f"v{i % 60}",) for i in range(900)]
    spark.createDataFrame(rows1, "k string").write.mode("append").parquet(src)

    def run_wave(name):
        stream = spark.readStream.schema("k string").parquet(src)
        q = (
            stream_cms_cells(stream, "k", d=4, w=64)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {
            (r._row, r._pos): r._cnt
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        }

    def batch_cells(df):
        return {
            (r._row, r._pos): r._cnt
            for r in cms_sketch(df, "k", d=4, w=64).collect()
        }

    d1 = spark.createDataFrame(rows1, "k string")
    got1 = run_wave("cms_wave1")
    assert got1 == batch_cells(d1)

    # New files arrive; restart from the SAME checkpoint: only the new
    # rows are read, yet the complete-mode cells equal the batch union —
    # nothing double-counted across the restart.
    spark.createDataFrame(rows2, "k string").write.mode("append").parquet(src)
    d2 = spark.createDataFrame(rows2, "k string")
    d12 = d1.unionByName(d2)
    got2 = run_wave("cms_wave2")
    assert got2 == batch_cells(d12)

    # Mergeability: sketch(part1) + sketch(part2) elementwise ==
    # sketch(union) == the streaming state.
    merged = {
        (r._row, r._pos): r._cnt
        for r in cms_merge(
            cms_sketch(d1, "k", d=4, w=64), cms_sketch(d2, "k", d=4, w=64)
        ).collect()
    }
    assert merged == got2


def test_stream_sessionize_out_of_order_matches_batch(spark, tmp_path):
    """Streaming gap-sessionization drill: events arrive across
    micro-batches with event-time order violated inside the 1h watermark
    (including a duplicate timestamp). Sessions emit append-mode exactly
    once, when the watermark proves no event can extend them; users with
    no further input flush via EventTimeTimeout; ordinals/counts/bounds
    must equal the batch session_stats (X15, oracle-checked via
    user_sessions) on the same sentinel-free data."""
    import time as _time
    from datetime import datetime

    from ocr_output_evaluation_spark.operators.sessionize import session_stats
    from ocr_output_evaluation_spark.streaming import stream_sessionize

    B = lambda h, m: datetime(2024, 5, 1, h, m, 0)  # noqa: E731
    SCHEMA = "user_id string, ts timestamp"
    waves = [
        [("u1", B(12, 10))],
        [("u1", B(12, 0)), ("u2", B(12, 5))],     # out-of-order vs 12:10
        [("u1", B(13, 40)), ("u1", B(13, 30)), ("u2", B(12, 5))],  # dup ts
        [("u1", B(13, 50)), ("u2", B(14, 0))],
        # sentinel user: pushes the watermark past every real session's
        # extension window (17:00 > 14:30); its own session stays pending
        [("zz", B(18, 0))],
        [("zz", B(18, 1))],  # one more batch so the watermark is APPLIED
    ]
    src = str(tmp_path / "src")
    for w in waves:
        spark.createDataFrame(w, SCHEMA).coalesce(1).write.mode("append").parquet(src)
        _time.sleep(1.1)

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    )
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        stream_sessionize(stream, gap_minutes=30.0, watermark="1 hour")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.user, r.session_id, r.n_events, r.session_start_ms, r.session_end_ms)
        for r in spark.read.parquet(out_dir).collect()
        if r.user != "zz"
    }

    real = [r for w in waves for r in w if r[0] != "zz"]
    batch = session_stats(
        spark.createDataFrame(real, SCHEMA), order_tiebreak=None
    )
    want = {
        (
            r.user_id,
            r.session_id,
            r.n_events,
            r.session_start_us // 1000,
            r.session_end_us // 1000,
        )
        for r in batch.collect()
    }
    assert got == want
    # spot the semantics: u1 has two sessions (2 then 3 events), u2 two
    # (the duplicate-ts pair, then a singleton)
    by_user = {}
    for u, sid, n, s, e in sorted(got):
        by_user.setdefault(u, []).append((sid, n))
    assert by_user == {"u1": [(1, 2), (2, 3)], "u2": [(1, 2), (2, 1)]}


def test_stream_sessionize_checkpoint_resume(spark, tmp_path):
    """Kill/resume for the session state machine: run availableNow over
    the first waves, then append later waves and RESTART from the same
    checkpoint. The restored state must carry both the pending event
    buffer and the emitted-ordinal counter — the union of both runs'
    emissions equals the batch session_stats, with no duplicate or
    re-numbered sessions."""
    import time as _time
    from datetime import datetime

    from ocr_output_evaluation_spark.operators.sessionize import session_stats
    from ocr_output_evaluation_spark.streaming import stream_sessionize

    B = lambda h, m: datetime(2024, 5, 1, h, m, 0)  # noqa: E731
    SCHEMA = "user_id string, ts timestamp"
    src = str(tmp_path / "src")
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def run():
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            stream_sessionize(stream, gap_minutes=30.0, watermark="1 hour")
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    waves1 = [
        [("u1", B(12, 0)), ("u1", B(12, 10))],
        # sentinel pushes wm to 14:00 > 12:40: session 1 finalizes in run 1
        [("zz", B(15, 0))],
        [("zz", B(15, 1))],
    ]
    for w in waves1:
        spark.createDataFrame(w, SCHEMA).coalesce(1).write.mode("append").parquet(src)
        _time.sleep(1.1)
    run()
    first = [
        (r.user, r.session_id) for r in spark.read.parquet(out_dir).collect()
        if r.user != "zz"
    ]
    assert first == [("u1", 1)]

    # new events AFTER the restart: u1's second session must get ordinal 2
    # (counter restored from state), and only the new files are read
    waves2 = [
        [("u1", B(16, 0)), ("u1", B(16, 5))],
        [("zz", B(19, 0))],
        [("zz", B(19, 1))],
    ]
    for w in waves2:
        spark.createDataFrame(w, SCHEMA).coalesce(1).write.mode("append").parquet(src)
        _time.sleep(1.1)
    run()
    got = {
        (r.user, r.session_id, r.n_events, r.session_start_ms, r.session_end_ms)
        for r in spark.read.parquet(out_dir).collect()
        if r.user != "zz"
    }
    real = [r for w in waves1 + waves2 for r in w if r[0] != "zz"]
    want = {
        (
            r.user_id,
            r.session_id,
            r.n_events,
            r.session_start_us // 1000,
            r.session_end_us // 1000,
        )
        for r in session_stats(
            spark.createDataFrame(real, SCHEMA), order_tiebreak=None
        ).collect()
    }
    assert got == want
    assert {s for _, s, *_ in got} == {1, 2}


def test_stream_qdigest_leaves_match_batch_and_resume(spark, tmp_path):
    """Streaming q-digest leaf census: equals the batch census after the
    first wave AND after a checkpoint restart over appended files; and
    because compression is a deterministic pure function of the census,
    compressing the streamed state yields the batch digest exactly."""
    from pyspark.sql import functions as F

    from ocr_output_evaluation_spark.operators.qdigest import (
        qdigest_build,
        qdigest_compress,
    )
    from ocr_output_evaluation_spark.streaming import stream_qdigest_leaves

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    rows1 = [(f"g{i % 2}", (i * 13) % 300) for i in range(1200)]
    rows2 = [(f"g{i % 2}", (i * 7) % 500) for i in range(800)]
    SCHEMA = "g string, v long"
    spark.createDataFrame(rows1, SCHEMA).write.mode("append").parquet(src)

    def run_wave(name):
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        q = (
            stream_qdigest_leaves(stream, "v", ["g"], depth=9)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.table(name)

    def batch_leaves(df):
        cap = (1 << 9) - 1
        v = F.least(F.greatest(F.col("v"), F.lit(0)), F.lit(cap))
        return (
            df.select("g", (F.lit(1 << 9) + v).alias("id"))
            .groupBy("g", "id")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        )

    d1 = spark.createDataFrame(rows1, SCHEMA)
    got1 = run_wave("qd_wave1")
    assert {(r.g, r.id): r.cnt for r in got1.collect()} == {
        (r.g, r.id): r.cnt for r in batch_leaves(d1).collect()
    }

    spark.createDataFrame(rows2, SCHEMA).write.mode("append").parquet(src)
    d12 = d1.unionByName(spark.createDataFrame(rows2, SCHEMA))
    got2 = run_wave("qd_wave2")
    assert {(r.g, r.id): r.cnt for r in got2.collect()} == {
        (r.g, r.id): r.cnt for r in batch_leaves(d12).collect()
    }

    # compress the streamed census -> must equal the batch-built digest
    leaves = got2.withColumn("level", F.lit(9)).select("g", "level", "id", "cnt")
    dig_s, _ = qdigest_compress(leaves, ["g"], depth=9, k=16)
    dig_b, _ = qdigest_build(d12, "v", ["g"], depth=9, k=16)
    assert sorted(map(tuple, dig_s.collect())) == sorted(
        map(tuple, dig_b.collect())
    )
