"""X80 Zipf slope + X81 term burstiness + X82 Good-Turing + X83 lexical
concentration (queries.zipf_slope_report / burstiness_report /
good_turing_report / lexical_concentration_report): exact python-mirror
value identity on the sf0.001 fixture corpus, shape/ordering contracts,
determinism, and no-Python plan pins. DuckDB value identity is the
oracle gate's job (ORACLE_ZIPF / ORACLE_BURSTINESS / ORACLE_GOOD_TURING
/ ORACLE_LEXICAL_CONCENTRATION)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pandas as pd

from ocr_output_evaluation_spark.queries import (
    burstiness_report,
    conditional_entropy_report,
    good_turing_report,
    lexical_concentration_report,
    zipf_slope_report,
)

SF = "/root/testdata/sf0.001"


def _tokens(text) -> list[str]:
    """Python mirror of functions.ngram.word_tokens: lowercase, keep
    Unicode letters and spaces (str.isalpha == \\p{L}), collapse runs,
    trim, whitespace-split; [] for empty."""
    if text is None:
        return []
    kept = "".join(ch if (ch.isalpha() or ch == " ") else " " for ch in text.lower())
    t = " ".join(kept.split())
    return t.split(" ") if t else []


def _docs() -> pd.DataFrame:
    return pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "lang", "text"])


def test_zipf_python_mirror(spark):
    docs = _docs()
    per_lang: dict[str, Counter] = defaultdict(Counter)
    for lang, text in zip(docs["lang"], docs["text"]):
        per_lang[lang].update(_tokens(text))
    expected = {}
    for lang, counts in per_lang.items():
        top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:200]
        n = len(top)
        xs = [round(math.log(r) * 1e6) for r in range(1, n + 1)]
        ys = [round(math.log(c) * 1e6) for _, c in top]
        sx, sy = sum(xs), sum(ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx = sum(x * x for x in xs)
        num, den = n * sxy - sx * sy, n * sxx - sx * sx
        slope = round(num / den, 6) if den else None
        intercept = round((sy - (num / den) * sx) / (1e6 * n), 6) if den and n else None
        expected[lang] = (n, slope, intercept)
    rows = zipf_slope_report(spark, SF).collect()
    assert [r.lang for r in rows] == sorted(expected)
    for r in rows:
        n, slope, intercept = expected[r.lang]
        assert (r.n_terms, r.zipf_slope, r.zipf_intercept) == (n, slope, intercept)
        # natural-ish text: frequency falls with rank
        assert r.zipf_slope < 0
        assert 0 < r.n_terms <= 200


def test_burstiness_python_mirror(spark):
    docs = _docs()
    td: Counter = Counter()
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        for w in _tokens(text):
            td[(w, doc_id)] += 1
    m: dict[str, list[int]] = defaultdict(lambda: [0, 0, 0])  # df, s1, s2
    for (w, _), c in td.items():
        agg = m[w]
        agg[0] += 1
        agg[1] += c
        agg[2] += c * c
    n = len(docs)
    cand = [
        (w, df, s1, (n * s2 - s1 * s1) / (n * s1))
        for w, (df, s1, s2) in m.items()
        if df >= 20
    ]
    cand.sort(key=lambda r: (-r[3], r[0]))
    expected = [(w, df, s1, round(v, 6)) for w, df, s1, v in cand[:15]]
    rows = burstiness_report(spark, SF).collect()
    assert [(r.term, r.df, r.n_occurrences, r.vmr) for r in rows] == expected
    # VMR ordering is already pinned by the mirror; sanity: bursty > 0
    assert all(r.vmr > 0 for r in rows) and len(rows) == 15


def _lang_counts() -> dict[str, Counter]:
    docs = _docs()
    per_lang: dict[str, Counter] = defaultdict(Counter)
    for lang, text in zip(docs["lang"], docs["text"]):
        per_lang[lang].update(_tokens(text))
    return per_lang


def test_good_turing_python_mirror(spark):
    expected = {}
    for lang, counts in _lang_counts().items():
        n = sum(counts.values())
        v = len(counts)
        n1 = sum(1 for c in counts.values() if c == 1)
        n2 = sum(1 for c in counts.values() if c == 2)
        n3 = sum(1 for c in counts.values() if c == 3)
        expected[lang] = (
            n, v, n1, n2, n3,
            round(n1 / n, 6) if n else None,
            round(2.0 * n2 / n1, 6) if n1 else None,
            round(n1 / v, 6) if v else None,
        )
    rows = good_turing_report(spark, SF).collect()
    assert [r.lang for r in rows] == sorted(expected)
    for r in rows:
        got = (r.n_tokens, r.vocab, r.n1, r.n2, r.n3,
               r.p_unseen, r.r_star_1, r.hapax_share)
        assert got == expected[r.lang]
        # frequency-of-frequencies sanity: head classes are subsets of vocab
        assert r.n1 + r.n2 + r.n3 <= r.vocab
        assert 0.0 <= r.p_unseen <= 1.0 and 0.0 <= r.hapax_share <= 1.0


def test_lexical_concentration_python_mirror(spark):
    expected = {}
    for lang, counts in _lang_counts().items():
        n = sum(counts.values())
        v = len(counts)
        s2 = sum(c * c for c in counts.values())
        expected[lang] = (
            n, v,
            round(1e4 * (s2 - n) / (n * n), 6) if n else None,
            round((s2 - n) / (n * (n - 1)), 6) if n > 1 else None,
            round(v / n, 6) if n else None,
        )
    rows = lexical_concentration_report(spark, SF).collect()
    assert [r.lang for r in rows] == sorted(expected)
    for r in rows:
        assert (r.n_tokens, r.vocab, r.yule_k, r.simpson_d, r.ttr) == expected[r.lang]
        # repeated-draw probability and TTR live in (0, 1]; K positive on
        # any corpus with at least one repeated token
        assert 0.0 <= r.simpson_d < 1.0 and 0.0 < r.ttr <= 1.0 and r.yule_k >= 0.0


def test_conditional_entropy_python_mirror(spark):
    LN2 = 0.6931471805599453
    docs = _docs()
    uni: dict[str, Counter] = defaultdict(Counter)
    bi: dict[str, Counter] = defaultdict(Counter)
    for lang, text in zip(docs["lang"], docs["text"]):
        toks = _tokens(text)
        uni[lang].update(toks)
        bi[lang].update(f"{a} {b}" for a, b in zip(toks, toks[1:]))

    def h_nano(counts: Counter) -> int:
        n = sum(counts.values())
        return sum(
            round((c / n) * (math.log(c / n) / LN2) * 1e9) for c in counts.values()
        )

    expected = {}
    for lang in uni:
        n1, n2 = sum(uni[lang].values()), sum(bi[lang].values())
        h1 = -h_nano(uni[lang]) / 1e9
        h2 = -h_nano(bi[lang]) / 1e9
        expected[lang] = (
            n1, n2, round(h1, 6), round(h2, 6), round(h2 - h1, 6),
            round(2.0 ** h1, 6),
        )
    rows = conditional_entropy_report(spark, SF).collect()
    assert [r.lang for r in rows] == sorted(expected)
    for r in rows:
        got = (r.n_tokens, r.n_bigrams, r.h_unigram_bits, r.h_bigram_bits,
               r.h_conditional_bits, r.unigram_perplexity)
        assert got == expected[r.lang]
        # information-theoretic sanity: 0 <= H(w2|w1) <= H(w1) (conditioning
        # never increases entropy under the ML estimates), perplexity >= 1
        assert -1e-6 <= r.h_conditional_bits <= r.h_unigram_bits + 1e-6
        assert r.unigram_perplexity >= 1.0


def test_corpus_stats_deterministic(spark):
    a = [tuple(r) for r in zipf_slope_report(spark, SF).collect()]
    b = [tuple(r) for r in zipf_slope_report(spark, SF).collect()]
    assert a == b
    c = [tuple(r) for r in burstiness_report(spark, SF).collect()]
    d = [tuple(r) for r in burstiness_report(spark, SF).collect()]
    assert c == d


def test_corpus_stats_plans(spark):
    from tests.test_plans import plan_of

    for q in (
        zipf_slope_report,
        burstiness_report,
        good_turing_report,
        lexical_concentration_report,
        conditional_entropy_report,
    ):
        plan = plan_of(q(spark, SF))
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        # the corpus explode is map-side combined before any exchange
        assert "partial_count" in plan or "HashAggregate" in plan
