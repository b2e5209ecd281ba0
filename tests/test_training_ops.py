"""Line-level dedup, URL functions, corpus mixing (r3 wave-2 training-data
ops). The report queries are DuckDB-oracle-checked end-to-end by the driver;
these tests pin operator semantics on planted fixtures plus the broadcast
plan shape."""

from pyspark.sql import functions as F


def test_drop_duplicate_lines_planted(spark):
    from ocr_output_evaluation_spark.operators.linededup import (
        drop_duplicate_lines,
    )

    # line_len=2, min_count=3: "aa bb" appears in docs 1,2,3 -> banned;
    # every other line is unique.
    docs = spark.createDataFrame(
        [
            (1, "aa bb cc dd"),
            (2, "aa bb ee ff"),
            (3, "aa bb gg"),
            (4, "hh ii jj kk"),
            (5, ""),  # no tokens -> NULL text_dedup
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.text_dedup, r.n_lines, r.n_kept)
        for r in drop_duplicate_lines(
            docs, "text", "doc_id", min_count=3, line_len=2
        ).collect()
    }
    assert got[1] == ("cc dd", 2, 1)
    assert got[2] == ("ee ff", 2, 1)
    assert got[3] == ("gg", 2, 1)  # trailing partial line survives
    assert got[4] == ("hh ii jj kk", 2, 2)
    assert got[5] == (None, 0, 0)


def test_drop_duplicate_lines_preserves_order(spark):
    """Reassembly must restore original line order even though collect_list
    order is undefined — the sort_array(struct(pos, line)) pin."""
    from ocr_output_evaluation_spark.operators.linededup import (
        drop_duplicate_lines,
    )

    # 40 distinct 2-token lines (letters only — normalize_for_scoring strips digits)
    def tok(i):
        return chr(97 + i // 26) + chr(97 + i % 26)

    text = " ".join(f"{tok(2 * i)} {tok(2 * i + 1)}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, text)], "doc_id long, text string"
    ).repartition(8)
    [r] = drop_duplicate_lines(
        docs, "text", "doc_id", min_count=2, line_len=2
    ).collect()
    assert r.text_dedup == text and r.n_kept == 40


def test_line_dedup_banned_set_broadcasts(spark, sf_dir):
    """Plan pin for the 100 TB shape: banned-line removal is a broadcast
    anti-join — the corpus never shuffles for membership."""
    import io
    from contextlib import redirect_stdout

    from ocr_output_evaluation_spark.queries import line_dedup_report

    buf = io.StringIO()
    with redirect_stdout(buf):
        line_dedup_report(spark, sf_dir).explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_bpe_encode_map_back_broadcasts(spark, sf_dir):
    """Plan pin: the learned vocab joins back onto the corpus's exploded
    words as a BROADCAST hash join (vocabulary-scale build side) — the
    corpus never sort-merge-shuffles against the vocab."""
    import io
    from contextlib import redirect_stdout

    from ocr_output_evaluation_spark.queries import bpe_encode_report

    buf = io.StringIO()
    with redirect_stdout(buf):
        bpe_encode_report(spark, sf_dir).explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_exact_substr_dedup_planted(spark):
    """ExactSubstr (X37) on a hand-built fixture, k=3 min_docs=2: the one
    cross-doc window ('a b c' in d1@0 and d2@2) is cut from BOTH docs
    (all-copies contract), within-doc-only repetition survives (min_docs
    counts DISTINCT docs), sub-k docs pass through, fully-duplicated docs
    empty to ''."""
    from ocr_output_evaluation_spark.operators.exactsubstr import (
        exact_substr_dedup,
    )

    df = spark.createDataFrame(
        [
            (1, "a b c d e f"),   # window 'a b c' at 0 -> drop pos 0-2
            (2, "x y a b c z"),   # window 'a b c' at 2 -> drop pos 2-4
            (3, "p q r s"),       # untouched
            (4, "m m m m m"),     # repeats only within itself -> untouched
            (5, "a b"),           # < k tokens: no windows
            (6, "a b c"),         # fully duplicated (with 1, 2, 7) -> ''
            (7, "a b c"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.text_dedup, r.n_tokens, r.n_dropped)
        for r in exact_substr_dedup(df, "text", "doc_id", k=3, min_docs=2).collect()
    }
    assert got == {
        1: ("d e f", 6, 3),
        2: ("x y z", 6, 3),
        3: ("p q r s", 4, 0),
        4: ("m m m m m", 5, 0),
        5: ("a b", 2, 0),
        6: ("", 3, 3),
        7: ("", 3, 3),
    }


def test_exact_substr_keep_first_canonical_survives(spark):
    """Lee et al. keep-one mode (keep_first=True): the lexicographically
    first (doc, start) occurrence of each duplicated fingerprint keeps its
    span — doc 1 (canonical for 'a b c') survives intact while docs 2/6/7
    still lose their copies; doc 8's two occurrences ('a b c a b c') are
    both non-canonical (the canonical lives in doc 1), so it loses both."""
    from ocr_output_evaluation_spark.operators.exactsubstr import (
        exact_substr_dedup,
    )

    df = spark.createDataFrame(
        [
            (1, "a b c d e f"),   # canonical (1, 0) for 'a b c' -> intact
            (2, "x y a b c z"),   # non-canonical copy -> drops pos 2-4
            (6, "a b c"),
            (7, "a b c"),
            (8, "a b c a b c"),   # two non-canonical copies -> all dropped
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.text_dedup, r.n_dropped)
        for r in exact_substr_dedup(
            df, "text", "doc_id", k=3, min_docs=2, keep_first=True
        ).collect()
    }
    assert got == {
        1: ("a b c d e f", 0),
        2: ("x y z", 3),
        6: ("", 3),
        7: ("", 3),
        8: ("", 6),
    }


def test_exact_substr_overlapping_spans_union(spark):
    """Overlapping duplicated windows drop the UNION of their covered
    positions: d1/d2 share 'a b c d' => windows 'a b c'@0 and 'b c d'@1 in
    both, covering pos 0-3 as one span."""
    from ocr_output_evaluation_spark.operators.exactsubstr import (
        exact_substr_dedup,
    )

    df = spark.createDataFrame(
        [(1, "a b c d x"), (2, "y a b c d")], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.text_dedup, r.n_dropped)
        for r in exact_substr_dedup(df, "text", "doc_id", k=3, min_docs=2).collect()
    }
    assert got == {1: ("x", 4), 2: ("y", 4)}


def test_exact_substr_corpus_never_shuffles_for_membership(spark, sf_dir):
    """Plan pin for the 100 TB shape: the duplicated tail and the per-doc
    start lists come back as BROADCAST joins; no sort-merge join anywhere —
    the corpus text never shuffles for membership."""
    import io
    from contextlib import redirect_stdout

    from ocr_output_evaluation_spark.queries import exact_substr_report

    buf = io.StringIO()
    with redirect_stdout(buf):
        exact_substr_report(spark, sf_dir).explain("formatted")
    plan = buf.getvalue()
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_url_functions(spark):
    from ocr_output_evaluation_spark.functions.url import (
        strip_url_params,
        url_host,
        url_path_depth,
        url_registered_domain,
    )

    df = spark.createDataFrame(
        [
            ("https://www.a.example.com/x/y/z?utm=1#frag",),
            ("http://example.org",),
            ("https://single/",),
            ("not a url",),
            ("https://h.io//a///b/",),  # duplicate + trailing slashes
        ],
        "u string",
    )
    rows = df.select(
        url_host("u").alias("h"),
        url_registered_domain("u").alias("d"),
        url_path_depth("u").alias("p"),
        strip_url_params("u").alias("s"),
    ).collect()
    assert rows[0].h == "www.a.example.com" and rows[0].d == "example.com"
    assert rows[0].p == 3 and rows[0].s == "https://www.a.example.com/x/y/z"
    assert rows[1].h == "example.org" and rows[1].d == "example.org"
    assert rows[1].p == 0
    assert rows[2].h == "single" and rows[2].d == "single" and rows[2].p == 0
    assert rows[3].h == "" and rows[3].d == "" and rows[3].p == 0
    assert rows[4].p == 2  # //a///b/ normalizes to /a/b


def test_mixture_quotas_and_selection(spark):
    from ocr_output_evaluation_spark.operators.mixing import (
        apply_mixture,
        source_quotas,
    )

    # 100 docs: 80 from 'big' (weight 1), 20 from 'small' (weight 3);
    # target 50% of 100 = 50, shares 1/4 vs 3/4 -> quotas 12 and
    # min(20, 37) = 20.
    rows = [(i, "big" if i < 80 else "small") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    wexpr = F.when(F.col("source") == "small", F.lit(3.0)).otherwise(F.lit(1.0))
    q = {
        r.source: (r.n_docs, r.quota)
        for r in source_quotas(df, "source", wexpr, 0.5).collect()
    }
    assert q == {"big": (80, 12), "small": (20, 20)}

    kept = apply_mixture(df, "source", "doc_id", source_quotas(df, "source", wexpr, 0.5))
    by_src = {
        r.source: r.n
        for r in kept.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert by_src == {"big": 12, "small": 20}
    # determinism: same call twice -> identical doc_id sets
    a = sorted(r.doc_id for r in kept.collect())
    b = sorted(
        r.doc_id
        for r in apply_mixture(
            df, "source", "doc_id", source_quotas(df, "source", wexpr, 0.5)
        ).collect()
    )
    assert a == b


def test_bpe_merge_pair_counts_planted(spark):
    """merge_pair_counts on a hand-computed fixture: weighting by word
    frequency, overlap positions counted, <2-char words contribute nothing."""
    from ocr_output_evaluation_spark.operators.bpe import merge_pair_counts

    words = spark.createDataFrame(
        [("abab", 3), ("ba", 2), ("a", 5)], "word string, wcount long"
    )
    got = {
        r.pair: (r.total_count, r.n_words)
        for r in merge_pair_counts(words).collect()
    }
    # "abab": pairs ab(2x), ba(1x) each weighted 3; "ba": ba weighted 2
    assert got["ab"] == (6, 1)
    assert got["ba"] == (5, 2)
    assert "a" not in got and len(got) == 2


def test_train_bpe_sennrich_example_hand_traced(spark):
    """Iterative BPE training on the classic Sennrich corpus (low x5,
    lower x2, newest x6, widest x3), 8 merges hand-traced on paper:

      step1 es/st tie at 9 -> 'es' on (a asc); step2 (es,t)=9; step3 lo/ow
      tie at 7 -> 'lo'; step4 (lo,w)=7; step5 three-way tie at 6
      (e,w)/(n,e)/(w,est) -> 'ew'; step6 (ew,est)/(n,ew) tie -> (ew,est);
      step7 (n,ewest)=6; step8 (d,est)/(i,d)/(w,i) tie at 3 -> (d,est).

    Pins argmax recount-after-each-merge semantics, the deterministic
    (count desc, a, b) tie-break, leftmost-non-overlap application, and
    the final per-word token counts the encode map-back consumes."""
    from ocr_output_evaluation_spark.operators.bpe import (
        bpe_vocab,
        train_bpe,
    )

    words = spark.createDataFrame(
        [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)],
        "word string, wcount long",
    )
    trained, merges = train_bpe(words, 8)
    assert merges == [
        ("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"),
        ("e", "w"), ("ew", "est"), ("n", "ewest"), ("d", "est"),
    ]
    seqs = {r.word: r.seq for r in trained.collect()}
    assert seqs == {
        "low": "low",
        "lower": "low e r",
        "newest": "newest",
        "widest": "w i dest",
    }
    toks = {r.word: r.n_tok for r in bpe_vocab(trained).collect()}
    assert toks == {"low": 1, "lower": 3, "newest": 1, "widest": 3}


def test_train_bpe_single_char_and_overlap(spark):
    """Single-symbol words survive every fold untouched and stop
    contributing pairs; overlapping identical pairs merge leftmost-first
    ('l l l l' + (l,l) -> 'll ll')."""
    from ocr_output_evaluation_spark.operators.bpe import train_bpe

    words = spark.createDataFrame(
        [("llll", 4), ("x", 9)], "word string, wcount long"
    )
    trained, merges = train_bpe(words, 2)
    assert merges == [("l", "l"), ("ll", "ll")]
    seqs = {r.word: r.seq for r in trained.collect()}
    assert seqs == {"llll": "llll", "x": "x"}


def test_pack_sequences_planted(spark):
    """pack_sequences on one shard with hand-replayed md5 order: sequence
    index = floor(exclusive-cumsum / L), straddle flags at boundaries,
    zero-token docs occupy nothing."""
    import hashlib

    from ocr_output_evaluation_spark.operators.packing import (
        pack_sequences,
        packing_stats,
    )

    toks = {1: 6, 2: 7, 3: 0, 4: 10, 5: 3}
    docs = spark.createDataFrame(
        [(i, " ".join("w" * 1 for _ in range(n)) if n else "") for i, n in toks.items()],
        "doc_id long, text string",
    )
    from ocr_output_evaluation_spark.functions.text import whitespace_token_count

    packed = pack_sequences(
        docs, "doc_id", whitespace_token_count(F.col("text")), 10, 1
    )
    got = {r.doc_id: (r._tokens, r._seq, r._straddle) for r in packed.collect()}

    order = sorted(toks, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    cum = 0
    for i in order:
        excl = cum
        cum += toks[i]
        seq = excl // 10
        straddle = toks[i] > 0 and excl // 10 != (cum - 1) // 10
        assert got[i] == (toks[i], seq, straddle), (i, got[i], (toks[i], seq, straddle))

    [s] = packing_stats(packed, 10).collect()
    assert s.n_docs == 5 and s.total_tokens == 26 and s.n_seqs == 3
    assert abs(s.fill_frac - 26 / 30) < 1e-6  # fill_frac is rounded to 6dp


def test_logreg_train_matches_numpy(spark):
    """logreg_train's unrolled GD (9 dp gradient rounding) must match a
    sequential numpy replay exactly, and the learned boundary must separate
    a planted separable fixture."""
    import numpy as np

    from ocr_output_evaluation_spark.operators.classifier import (
        logreg_score,
        logreg_train,
    )

    rng = [(i, 1.0 if i % 2 == 0 else 0.0) for i in range(200)]
    rows = [
        # centered separable feature: y=1 at x ~ +0.3, y=0 at x ~ -0.3
        # (deterministic jitter) — separable by sign with zero bias, which
        # a few full-batch steps CAN reach (the bias moves slowly on a
        # balanced fixture)
        (i, y, 0.3 + (i % 7 - 3) * 0.01 if y else -0.3 + (i % 7 - 3) * 0.01)
        for i, y in rng
    ]
    df = spark.createDataFrame(rows, "doc_id long, y double, x1 double")
    w = logreg_train(df, ["x1"], "y", lr=1.0, steps=4).collect()[0]

    xs = np.array([r[2] for r in rows])
    ys = np.array([r[1] for r in rows])
    b = w1 = 0.0
    for _ in range(4):
        p = 1.0 / (1.0 + np.exp(-(b + w1 * xs)))
        gb = round(float(np.mean(p - ys)), 9)
        g1 = round(float(np.mean((p - ys) * xs)), 9)
        b, w1 = b - 1.0 * gb, w1 - 1.0 * g1
    assert abs(w.b - b) < 1e-12 and abs(w.w1 - w1) < 1e-12

    scored = logreg_score(
        df, logreg_train(df, ["x1"], "y", lr=1.0, steps=4), ["x1"]
    )
    acc = scored.selectExpr(
        "avg(CASE WHEN (_p >= 0.5) = (y = 1.0) THEN 1.0 ELSE 0.0 END) a"
    ).collect()[0].a
    assert acc == 1.0  # separable fixture -> the boundary must separate it


def test_bpe_oracle_saturating_vocab_parity(spark, tmp_path):
    """Saturating corpus (fully merged in 2 < 8 steps): train_bpe breaks
    early keeping the vocab; the oracle's empty m{i} CTEs must become
    fold no-ops (LEFT JOIN ON TRUE), NOT empty the word frame — Spark and
    DuckDB must agree row-for-row including the shortened merges string."""
    import duckdb

    from ocr_output_evaluation_spark.queries import (
        _oracle_bpe_encode,
        bpe_encode_report,
    )

    rows = [(1, "ab ab", "en"), (2, "cd", "de")]
    d = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    ).coalesce(1).write.parquet(d + "/documents.parquet")
    got = {tuple(r) for r in bpe_encode_report(spark, d).collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet/*.parquet'")
    want = {tuple(r) for r in con.execute(_oracle_bpe_encode()).fetchall()}
    assert got == want
    merges = {r[-1] for r in got}
    assert merges == {"ab cd"}  # 2 learned merges, not 8; both rows agree
    assert {(r[0], r[3]) for r in got} == {("en", 2), ("de", 1)}  # fully merged


def test_rulepack_flags_planted(spark):
    """Gopher/C4 rule pack (X38) on hand-built docs: each rule fails on
    exactly the doc built to fail it and passes elsewhere."""
    from ocr_output_evaluation_spark.functions.rulepacks import rulepack_flags

    rows = [
        (0, "the quick dog runs over the lazy fox today fine"),  # passes all
        (1, "the dog"),                                 # G1: 2 words < 5
        (2, "of am in at to is be we it up"),           # G2: mwl 2.0 < 3; G5
        (3, "the quick dog ### ... ### ### over fox"),  # G3: 4 syms / 9 words
        (4, "the 11 22 33 44 55 66 77 dog fox"),        # G4: 3/10 alpha < 0.8
        (5, "alpha beta gamma delta epsilon"),          # G5: 0 stop words
        (6, "the quick dog lorem ipsum over the fox"),  # C4
        (7, None),                                      # NULL: fails G1+G5
    ]
    df = spark.createDataFrame(rows, "i long, t string")
    flags = rulepack_flags(F.col("t"))
    got = {r.i: r for r in df.select("i", *[v.alias(k) for k, v in flags.items()]).collect()}
    assert got[0].g1_wordcount and got[0].g2_mean_word_len and got[0].g3_symbol_ratio
    assert got[0].g4_alpha_words and got[0].g5_stopwords and got[0].c4_lorem_brace
    assert not got[1].g1_wordcount
    assert not got[2].g2_mean_word_len and not got[2].g5_stopwords
    assert not got[3].g3_symbol_ratio and got[3].g1_wordcount
    assert not got[4].g4_alpha_words
    assert not got[5].g5_stopwords and got[5].g4_alpha_words
    assert not got[6].c4_lorem_brace and got[6].g5_stopwords
    assert not got[7].g1_wordcount and not got[7].g5_stopwords
    assert got[7].g3_symbol_ratio and got[7].g4_alpha_words and got[7].c4_lorem_brace


def test_gopher_rules_single_exchange(spark, sf_dir):
    """Plan pin (X38): the rule flags are scan-side expressions — exactly
    one shuffle in the whole report (the per-lang rollup)."""
    import io
    from contextlib import redirect_stdout

    from ocr_output_evaluation_spark.queries import gopher_rules_report

    buf = io.StringIO()
    with redirect_stdout(buf):
        gopher_rules_report(spark, sf_dir).explain("formatted")
    import re

    plan = buf.getvalue()
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchanges <= 2, plan  # hash rollup exchange + orderBy range
    assert "Join" not in plan


# ---------------------------------------------------------------------------
# X44 WordPiece trainer
# ---------------------------------------------------------------------------
def _wp_model(words: list[tuple[str, int]], n_merges: int):
    """Pure-python replay of operators/bpe.py train_wordpiece: per step,
    weighted unit census + weighted adjacent-pair counts over the current
    segmentation, argmax of the quantized BIGINT nano-score
    (cnt*10^9)//(ua*ub) with (a, b) asc tie-break, leftmost-non-overlap
    merge application (append-without-separator fold twin)."""
    seqs = {w: list(w) for w, _ in words}
    wc = dict(words)
    merges = []
    for _ in range(n_merges):
        units: dict[str, int] = {}
        pairs: dict[tuple[str, str], int] = {}
        for w, seq in seqs.items():
            for s in seq:
                units[s] = units.get(s, 0) + wc[w]
            for a, b in zip(seq, seq[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + wc[w]
        if not pairs:
            break
        best = min(
            pairs,
            key=lambda p: (-(pairs[p] * 10**9 // (units[p[0]] * units[p[1]])),
                           p[0], p[1]),
        )
        merges.append(best)
        a, b = best
        for w, seq in seqs.items():
            out = [seq[0]]
            for x in seq[1:]:
                if out[-1] == a and x == b:
                    out[-1] = out[-1] + x
                else:
                    out.append(x)
            seqs[w] = out
    return merges, {w: " ".join(s) for w, s in seqs.items()}


def test_train_wordpiece_cohesion_beats_frequency(spark):
    """The defining WordPiece-vs-BPE divergence, hand-traced: pair (a,q)
    is most FREQUENT (cnt 40) but its units are promiscuous
    (u_a=50, u_q=80 -> score 40e9/4000 = 1e7); pair (x,y) is rare (cnt 3)
    but perfectly cohesive (u_x=u_y=3 -> score 3e9/9 ~ 3.3e8). BPE merges
    (a,q) first; WordPiece must merge (x,y) first."""
    from ocr_output_evaluation_spark.operators.bpe import (
        train_bpe,
        train_wordpiece,
    )

    words = spark.createDataFrame(
        [("ab", 10), ("aq", 40), ("bq", 40), ("xy", 3)],
        "word string, wcount long",
    )
    _, wp = train_wordpiece(words, 2)
    _, bp = train_bpe(words, 2)
    assert wp[0] == ("x", "y")
    assert bp[0] == ("a", "q")
    assert wp == [("x", "y"), ("a", "q")]


def test_train_wordpiece_python_model_replay(spark):
    """Full-trajectory parity vs the pure-python model on the Sennrich
    corpus: every merge (8 steps of census -> nano-score argmax -> fold)
    and every final segmentation identical. First merge hand-checked:
    (i,d) cnt=3 u_i=3 u_d=3 -> score 3.33e8 beats (e,s) cnt=9 u_e=17
    u_s=9 -> 5.88e7 — cohesion over frequency again."""
    from ocr_output_evaluation_spark.operators.bpe import train_wordpiece

    corpus = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    words = spark.createDataFrame(corpus, "word string, wcount long")
    trained, merges = train_wordpiece(words, 8)
    exp_merges, exp_seqs = _wp_model(corpus, 8)
    assert merges[0] == ("i", "d")
    assert merges == exp_merges
    assert {r.word: r.seq for r in trained.collect()} == exp_seqs


def test_wordpiece_encode_map_back_broadcasts(spark, sf_dir):
    """Plan pin (X44): like X36 — the learned vocab and the per-step unit
    census join as BROADCAST hash joins; nothing corpus-scale ever
    sort-merge-shuffles."""
    import io
    from contextlib import redirect_stdout

    from ocr_output_evaluation_spark.queries import wordpiece_encode_report

    buf = io.StringIO()
    with redirect_stdout(buf):
        wordpiece_encode_report(spark, sf_dir).explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
