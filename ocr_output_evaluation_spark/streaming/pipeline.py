"""Structured Streaming layer.

The reference is purely batch (SURVEY.md §2.11) — this module is the
rebuild's forward extension: the SAME extraction UDF and schemas run as an
incremental pipeline, because at 10^12-document scale "the crawl" is not a
static table but an arriving feed. Design mirrors the batch pipeline
(plans/pipeline.py):

- file-source streaming over the web_pages layout (new parquet files under a
  directory = new micro-batch; an Iceberg/Kafka source is a one-line swap),
- the identical Arrow-batched ``extract_udf`` (byte-identity therefore holds
  per micro-batch by construction),
- event-time analytics on ``warc_ts`` with watermarking for late data,
- a custom stateful operator via ``applyInPandasWithState`` (running
  per-lang totals) — the streaming analog of the checkpoint-manifest resume
  counters,
- ``trigger(availableNow=True)`` everywhere in tests: process-everything-
  then-stop gives deterministic, CI-friendly runs with real checkpoints.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..extract.udf import domain_of, extract_udf
from ..schema import WEB_PAGES


def read_web_pages_stream(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int = 8
) -> DataFrame:
    """File-source stream over a web_pages parquet directory. Streaming scans
    require an explicit schema (no inference) — ours is fixed anyway.
    ``max_files_per_trigger`` bounds micro-batch size (and is what the
    kill/resume drill uses to force multiple batches over a small fixture)."""
    return (
        spark.readStream.schema(WEB_PAGES)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )


def stream_extraction(
    spark: SparkSession,
    source_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int = 8,
):
    """Incremental extraction: stream-in pages → prune columns → extract →
    append extracted rows to parquet. The checkpoint dir carries source
    offsets, so a restart resumes exactly after the last committed batch —
    the streaming twin of the batch manifest (sources/manifest.py)."""
    pages = read_web_pages_stream(spark, source_dir, max_files_per_trigger)
    extracted = (
        pages.select("url", "warc_ts", "lang", "html")
        .withColumn("x", extract_udf(F.col("html")))
        .select(
            "url",
            domain_of("url").alias("domain"),
            "warc_ts",
            "lang",
            F.col("x.extracted_text").alias("extracted_text"),
            F.col("x.text_sha256").alias("text_sha256"),
            F.col("x.is_pdf").alias("is_pdf"),
            F.col("x.error").alias("error"),
        )
    )
    writer = (
        extracted.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def dedup_within_watermark(
    extracted: DataFrame,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup: drop arriving documents whose extracted text
    (sha256) was already seen within the event-time watermark.

    Scale design: a plain streaming ``dropDuplicates`` would grow its state
    forever at crawl scale; ``dropDuplicatesWithinWatermark`` bounds state to
    the watermark horizon — the right contract for a crawl feed, where
    same-content re-fetches cluster in time. Cross-horizon (historical)
    dedup stays the batch export's job (plans/export.py), exactly like the
    manifest-vs-checkpoint split between the batch and streaming pipelines.

    Error rows carry a NULL text_sha256; deduping on NULL would collapse
    every failed extraction into one surviving row, so the dedup key falls
    back to (url, warc_ts) for them — i.e. error rows dedup per url+fetch
    within the watermark rather than passing a flood of identical retries.
    The url is NULL-guarded (ADVICE r1): `concat` is NULL-absorbing, and an
    unguarded NULL url would collapse every NULL-url error row into one.
    With the guard, NULL-url errors still dedup per warc_ts; rows NULL in
    BOTH url and warc_ts are indistinguishable to any streaming key — the
    source contract (schema.WEB_PAGES) requires url NOT NULL upstream."""
    keyed = extracted.withColumn(
        "_dedup_key",
        F.coalesce(
            F.col("text_sha256"),
            F.concat(
                F.lit("err:"),
                F.coalesce(F.col("url"), F.lit("\0nourl")),
                F.lit(":"),
                F.coalesce(F.col("warc_ts").cast("string"), F.lit("\0nots")),
            ),
        ),
    )
    return (
        keyed.withWatermark("warc_ts", watermark)
        .dropDuplicatesWithinWatermark(["_dedup_key"])
        .drop("_dedup_key")
    )


def stream_dedup_extraction(
    spark: SparkSession,
    source_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    watermark: str = "2 hours",
    available_now: bool = True,
):
    """Incremental extract-and-dedup: the stream_extraction plan with the
    watermarked exact-dedup stage before the sink — the streaming twin of
    the export pipeline's exact-dedup window."""
    pages = read_web_pages_stream(spark, source_dir)
    extracted = (
        pages.select("url", "warc_ts", "lang", "html")
        .withColumn("x", extract_udf(F.col("html")))
        .select(
            "url",
            domain_of("url").alias("domain"),
            "warc_ts",
            "lang",
            F.col("x.extracted_text").alias("extracted_text"),
            F.col("x.text_sha256").alias("text_sha256"),
            F.col("x.is_pdf").alias("is_pdf"),
            F.col("x.error").alias("error"),
        )
    )
    deduped = dedup_within_watermark(extracted, watermark=watermark)
    writer = (
        deduped.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_lang_counts(
    pages: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Event-time windowed rollup with late-data handling: tumbling windows
    over ``warc_ts``, watermarked so state for closed windows is dropped —
    the streaming twin of the per-lang batch rollups (A11)."""
    return (
        pages.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("win"), "lang")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum(F.length(F.coalesce("text", F.lit("")))).alias("raw_chars"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "lang",
            "n_pages",
            "raw_chars",
        )
    )


def enrich_stream_with_dim(stream: DataFrame, dim: DataFrame, on: str) -> DataFrame:
    """Stream-static enrichment join: each micro-batch of the stream joins
    the (batch) dimension table — Spark plans this as a per-batch join with
    NO streaming state (the static side is re-scanned/broadcast per batch,
    so dim updates between batches are picked up). The streaming twin of
    the batch metadata-enrichment layer (J1 / metadata_loader.py:109-146).
    Left join: pages with no dim row keep NULL enrichment — the stream must
    never drop rows because a dimension is incomplete."""
    return stream.join(F.broadcast(dim), on, "left")


RUNNING_TOTALS_OUTPUT = T.StructType(
    [
        T.StructField("lang", T.StringType(), False),
        T.StructField("batch_pages", T.LongType(), False),
        T.StructField("total_pages", T.LongType(), False),
        T.StructField("total_chars", T.LongType(), False),
    ]
)

RUNNING_TOTALS_STATE = T.StructType(
    [
        T.StructField("total_pages", T.LongType(), False),
        T.StructField("total_chars", T.LongType(), False),
    ]
)


def _update_running_totals(key, pdf_iter, state: GroupState):
    """Per-lang cumulative counters carried in explicit group state. The
    per-batch work is vectorized pandas; state holds two longs per key, so
    state size is bounded by the lang cardinality — safe at any scale."""
    (lang,) = key
    batch_pages = 0
    batch_chars = 0
    for pdf in pdf_iter:
        batch_pages += len(pdf)
        batch_chars += int(pdf["n_chars"].fillna(0).sum())
    if state.exists:
        total_pages, total_chars = state.get
    else:
        total_pages, total_chars = 0, 0
    total_pages += batch_pages
    total_chars += batch_chars
    state.update((total_pages, total_chars))
    yield pd.DataFrame(
        [
            {
                "lang": lang,
                "batch_pages": batch_pages,
                "total_pages": total_pages,
                "total_chars": total_chars,
            }
        ]
    )


def running_lang_totals(pages: DataFrame) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): running per-lang
    page/char totals across micro-batches."""
    prepared = pages.select(
        "lang", F.length(F.coalesce("text", F.lit(""))).cast("long").alias("n_chars")
    )
    return prepared.groupBy("lang").applyInPandasWithState(
        _update_running_totals,
        outputStructType=RUNNING_TOTALS_OUTPUT,
        stateStructType=RUNNING_TOTALS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming as-of join (the watermark-bounded twin of operators/asof.py X34)
# ---------------------------------------------------------------------------
ASOF_STREAM_OUTPUT = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("left_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("asof_ts", T.TimestampType(), True),
        T.StructField("asof_value", T.StringType(), True),
    ]
)

# Buffered, not-yet-final rows per key: pending left events (ts, id) and
# right revisions (ts, value), all timestamps in epoch-ms.
ASOF_STREAM_STATE = T.StructType(
    [
        T.StructField("l_ts", T.ArrayType(T.LongType()), False),
        T.StructField("l_id", T.ArrayType(T.LongType()), False),
        T.StructField("r_ts", T.ArrayType(T.LongType()), False),
        T.StructField("r_val", T.ArrayType(T.StringType()), False),
    ]
)


def _ms(series: pd.Series) -> list[int]:
    return (series.astype("int64") // 1_000_000).tolist()


def _rank(rv: tuple) -> tuple:
    """Right-revision order: (ts, value) with a NULL value ranking below
    any non-NULL — operators/asof.py's (ts, payload)-struct asc-nulls-first
    tie-break, so the max is the batch operator's match."""
    return (rv[0], rv[1] is not None, rv[1] or "")


def _asof_stream_update(key, pdf_iter, state: GroupState):
    """Per-key as-of state machine. A left event is EMITTED (append-mode
    final) only once the event-time watermark is STRICTLY past its
    timestamp — Spark's late filter drops only rows strictly below the
    watermark, so a right revision AT the watermark can still arrive; with
    strict emission every right at-or-before an emitted left (rt <= ts
    < wm) is provably un-arrivable and the match is final. Until then the
    left buffers. Right revisions at-or-below the watermark are pruned
    down to the single best (_rank-max) one, which any future left still
    needs; so state per key is bounded by the rows inside the watermark
    horizon plus one. Matching is inclusive (right_ts <= left_ts), ties on
    right_ts resolve by _rank (NULL payload values participate, ranking
    below non-NULL) — exactly operators/asof.py as_of_join's semantics,
    which the parity test replays."""
    (k,) = key
    if state.exists:
        l_ts, l_id, r_ts, r_val = (list(x) for x in state.get)
    else:
        l_ts, l_id, r_ts, r_val = [], [], [], []
    for pdf in pdf_iter:
        pdf = pdf[pdf["ts"].notna()]
        lefts = pdf[(pdf["side"] == 0) & pdf["left_id"].notna()]
        rights = pdf[pdf["side"] == 1]
        l_ts += _ms(lefts["ts"]); l_id += [int(v) for v in lefts["left_id"]]
        r_ts += _ms(rights["ts"])
        r_val += [None if pd.isna(v) else str(v) for v in rights["value"]]
    wm = state.getCurrentWatermarkMs()

    out_rows = []
    keep_ts, keep_id = [], []
    rights_sorted = sorted(zip(r_ts, r_val), key=_rank)
    for ts, lid in sorted(zip(l_ts, l_id)):
        if ts < wm:
            match = max(((rt, rv) for rt, rv in rights_sorted if rt <= ts),
                        key=_rank, default=None)
            out_rows.append(
                {
                    "key": k,
                    "left_id": lid,
                    "ts": pd.Timestamp(ts, unit="ms"),
                    "asof_ts": pd.Timestamp(match[0], unit="ms") if match else pd.NaT,
                    "asof_value": match[1] if match else None,
                }
            )
        else:
            keep_ts.append(ts); keep_id.append(lid)

    # prune rights: everything at-or-above the watermark, plus the single
    # best strictly-below it (still the as-of candidate for every
    # pending/future left, all of which have ts >= wm)
    live = [(rt, rv) for rt, rv in rights_sorted if rt >= wm]
    past = [(rt, rv) for rt, rv in rights_sorted if rt < wm]
    if past:
        live = [max(past, key=_rank)] + live
    if keep_ts or live:
        state.update((keep_ts, keep_id, [rt for rt, _ in live], [rv for _, rv in live]))
        if keep_ts:
            # wake this key when the watermark passes its oldest pending
            # left, even if no further input arrives for it
            state.setTimeoutTimestamp(max(min(keep_ts), wm + 1))
    else:
        state.remove()
    if out_rows:
        yield pd.DataFrame(out_rows)


def stream_as_of_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "key",
    left_ts: str = "ts",
    id_col: str = "left_id",
    right_ts: str = "ts",
    value_col: str = "value",
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked stream-stream as-of join: every left event attributed to
    the right revision with the largest timestamp at-or-before its own, per
    key — X34's batch semantics under continuous arrival.

    The two streams UNION (side-tagged) under one event-time watermark and
    group by key into applyInPandasWithState — the streaming twin of the
    batch operator's union+window form: one stateful exchange on the key,
    no stream-stream join operator (Spark's native stream-stream joins
    cannot express "latest at-or-before" without an unbounded range
    condition). Emission is append-mode and watermark-final (strictly:
    ts < watermark, since the engine's late filter only drops rows
    strictly below it); rows later than the watermark are dropped by that
    filter, and per-key state is bounded by the watermark horizon
    (buffered lefts + rights inside it + one pruned best right).
    EventTimeTimeout wakes keys whose pending lefts become final without
    new input. Timestamps are handled at epoch-ms resolution. Output
    coercions: ``key`` comes back as string, ``left_id`` as long,
    ``value`` as string (cast at intake — any castable input types work);
    NULL right values participate in matching exactly as in the batch
    operator (asof_ts set, asof_value NULL)."""
    l = left.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(left_ts).alias("ts"),
        F.lit(0).alias("side"),
        F.col(id_col).cast("long").alias("left_id"),
        F.lit(None).cast("string").alias("value"),
    )
    r = right.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(right_ts).alias("ts"),
        F.lit(1).alias("side"),
        F.lit(None).cast("long").alias("left_id"),
        F.col(value_col).cast("string").alias("value"),
    )
    u = l.unionByName(r).withWatermark("ts", watermark)
    return u.groupBy("key").applyInPandasWithState(
        _asof_stream_update,
        outputStructType=ASOF_STREAM_OUTPUT,
        stateStructType=ASOF_STREAM_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def stream_qdigest_leaves(
    stream: DataFrame,
    value_col: str,
    group_cols: list[str],
    depth: int = 11,
):
    """Streaming q-digest LEAF census (the X56 sketch over a feed): the
    clamped leaf-id expression feeds a complete-mode groupBy-count, so
    per-group state is bounded by the UNIVERSE (<= 2^depth rows — config,
    not data) whatever the stream's volume. Counts are
    associative+commutative sums with exactly-once ingestion (the
    stream_cms_cells contract), so the streaming census equals the batch
    leaf census over the union of inputs — and because q-digest
    COMPRESSION is a deterministic pure function of (leaves, N, k)
    (operators/qdigest.py), compressing the streamed census at read time
    yields exactly the batch digest: streaming quantiles whose whole
    trajectory replays as batch SQL. Third member of the fully-oracled
    streaming-sketch family (HLL: idempotent max; CMS: exactly-once sum;
    q-digest: exactly-once sum + deterministic post-fold)."""
    cap = (1 << depth) - 1
    v = F.col(value_col).cast("long")
    clamped = F.least(F.greatest(v, F.lit(0)), F.lit(cap))
    return (
        stream.select(
            *group_cols, (F.lit(1 << depth) + clamped).alias("id")
        )
        .groupBy(*group_cols, "id")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


SESSION_STREAM_OUTPUT = T.StructType(
    [
        T.StructField("user", T.StringType(), False),
        T.StructField("session_id", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("session_start_ms", T.LongType(), False),
        T.StructField("session_end_ms", T.LongType(), False),
    ]
)

# Per-user state: sessions emitted so far (the next ordinal base) and the
# pending (not-yet-final) event-time buffer in epoch-ms.
SESSION_STREAM_STATE = T.StructType(
    [
        T.StructField("n_emitted", T.LongType(), False),
        T.StructField("pending_ms", T.ArrayType(T.LongType()), False),
    ]
)

_SESSION_GAP_MS = 30 * 60 * 1000  # default 30-min inactivity gap


def _sessionize_stream_update(gap_ms: int):
    """Build the per-user session state machine (gap closed over).

    Finality argument: a session with last event L is emitted once the
    watermark is STRICTLY past L + gap. Any event that could extend or
    merge into it would need ts <= L + gap < wm, and the engine's late
    filter drops rows strictly below the watermark — so emitted sessions
    are provably final (the stream_as_of_join argument, applied to the
    gap predicate). Sessions finalize in time order per user (session
    k+1 starts > session k's last + gap), so a monotone per-user ordinal
    counter reproduces the batch operator's 1-based session_id. Pending
    state per user is bounded by the events inside the watermark horizon
    plus one open session — never the user's history."""

    def update(key, pdf_iter, state: GroupState):
        (user,) = key
        if state.exists:
            n_emitted, pending = state.get
            pending = list(pending)
        else:
            n_emitted, pending = 0, []
        for pdf in pdf_iter:
            pdf = pdf[pdf["ts"].notna()]
            pending += _ms(pdf["ts"])
        wm = state.getCurrentWatermarkMs()
        pending.sort()
        # split the buffer into gap-separated sessions
        sessions: list[list[int]] = []
        for ts in pending:
            if sessions and ts - sessions[-1][-1] <= gap_ms:
                sessions[-1].append(ts)
            else:
                sessions.append([ts])
        out, keep = [], []
        for s in sessions:
            if keep or s[-1] + gap_ms >= wm:
                keep += s  # not final yet (or after a non-final one)
            else:
                n_emitted += 1
                out.append(
                    {
                        "user": user,
                        "session_id": n_emitted,
                        "n_events": len(s),
                        "session_start_ms": s[0],
                        "session_end_ms": s[-1],
                    }
                )
        if keep:
            state.update((n_emitted, keep))
            # wake when the watermark can finalize the oldest open session
            first_last = next(
                s[-1] for s in sessions if s and s[-1] + gap_ms >= wm
            )
            state.setTimeoutTimestamp(max(first_last + gap_ms + 1, wm + 1))
        elif n_emitted:
            state.update((n_emitted, []))
        else:
            state.remove()
        if out:
            yield pd.DataFrame(out)

    return update


def stream_sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked streaming sessionization — X15's gap-session semantics
    under continuous arrival: one row per FINALIZED (user, session) with
    ordinal, event count, and epoch-ms bounds, append-mode (a session
    emits exactly once, when the watermark proves no event can extend
    it). The streaming twin of operators/sessionize.py session_stats,
    pytest-pinned equal to it on out-of-order drills; per-user state is
    watermark-bounded (the buffered horizon + one open session), so hot
    users cannot grow state with their history. ``user`` is cast to
    string at intake (any castable key type works)."""
    ev = events.select(
        F.col(user_col).cast("string").alias("user"),
        F.col(ts_col).alias("ts"),
    ).withWatermark("ts", watermark)
    return ev.groupBy("user").applyInPandasWithState(
        _sessionize_stream_update(int(gap_minutes * 60_000)),
        outputStructType=SESSION_STREAM_OUTPUT,
        stateStructType=SESSION_STREAM_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def stream_warc_extraction(
    spark: SparkSession,
    crawl_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Continuous crawl-to-text: new WARC archives landing in ``crawl_dir``
    stream through the per-archive parser (sources/warc.py
    read_warc_stream) and the SAME Arrow extraction UDF as the batch
    pipeline — byte-identity per micro-batch by construction — into an
    append-mode parquet sink with checkpoint resume (an already-processed
    archive is never re-read). Corrupt archives pass through as in-band
    rows (NULL url, warc_error set) so the crawl feed never kills the
    query; filter on warc_error downstream."""
    from ..sources.warc import read_warc_stream

    recs = read_warc_stream(spark, crawl_dir, max_files_per_trigger)
    ok = recs.filter(F.col("warc_error").isNull() & F.col("url").isNotNull())
    extracted = (
        ok.withColumn("x", extract_udf(F.col("html")))
        .select(
            "url",
            domain_of("url").alias("domain"),
            "warc_ts",
            "http_status",
            F.col("x.extracted_text").alias("extracted_text"),
            F.col("x.text_sha256").alias("text_sha256"),
            F.col("x.is_pdf").alias("is_pdf"),
            F.col("x.error").alias("error"),
            F.col("warc_file"),
        )
    )
    writer = (
        extracted.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_hll_registers(
    stream: DataFrame, key_col: str, group_cols: list[str], b: int = 8
) -> DataFrame:
    """Streaming HyperLogLog registers (the X46 sketch over a feed): the
    identical bucket/rho expressions feed a streaming groupBy-max, so the
    register frame is maintained INCREMENTALLY — at most groups x 2^b
    state rows whatever the stream's cardinality, and max is idempotent,
    so replayed/duplicate inputs cannot perturb the sketch. Because max
    is associative+commutative, the streaming state after any sequence of
    micro-batches equals the batch sketch over the union of the inputs
    (pinned against operators/hll.py in tests/test_streaming.py), and a
    checkpoint restart resumes the registers exactly. Complete/update
    output mode; the frame is config-bounded, so a complete-mode sink is
    cheap. This is the streaming twin of hll_registers — per-day sketch
    artifacts and the live feed merge via hll_merge without re-reading
    either side."""
    from ..operators.hll import hll_bucket, hll_rho

    m = 1 << b
    key = F.col(key_col)
    return (
        stream.select(
            *group_cols,
            hll_bucket(key, m).alias("_bucket"),
            hll_rho(key).alias("_rho"),
        )
        .groupBy(*group_cols, "_bucket")
        .agg(F.max("_rho").alias("_rho"))
    )


def stream_cms_cells(stream: DataFrame, key_col: str, d: int = 4, w: int = 1024):
    """Streaming Count-Min cells (the X47 sketch over a feed): each key
    instance expands IN-ROW to its d (row, position) probes — one
    explode of a d-element struct array, NOT a d-way self-union of the
    source (the self-union starvation trap, tests/test_streaming.py) —
    and a streaming groupBy-count maintains the cell frame
    incrementally: at most d*w state rows (config-bounded, ~4 KB)
    whatever the stream's volume. Counts are associative+commutative
    sums, so the streaming state after any sequence of micro-batches
    equals the batch cms_sketch over the union of the inputs; unlike
    HLL's idempotent max, SUM does need each row counted exactly once —
    which the file source + checkpoint contract provides (offsets
    committed per batch; a restart from the same checkpoint reads only
    unseen files — pinned by the resume drill). Complete output mode;
    the frame is config-bounded, so a complete-mode sink is cheap.
    Streaming twin of operators/cms.py cms_sketch; per-day sketch
    artifacts and the live feed roll up via cms_merge (elementwise sum)
    without re-reading either side."""
    from ..operators.cms import cms_position

    key = F.col(key_col)
    pairs = F.array(
        *[
            F.struct(
                F.lit(j).alias("_row"), cms_position(key, j, w).alias("_pos")
            )
            for j in range(d)
        ]
    )
    return (
        stream.select(F.explode(pairs).alias("_p"))
        .select("_p._row", "_p._pos")
        .groupBy("_row", "_pos")
        .agg(F.count(F.lit(1)).cast("long").alias("_cnt"))
    )
