"""X150 dataset card (queries.dataset_card_report): exact python mirror
over planted corpora, duplicate accounting on the NORMALIZED text
(case/punct variants collapse), top-lang tiebreak pinned, type-1
quartiles pinned, cross-subsystem consistency invariants on sf data,
determinism + plan pins. DuckDB value identity is the oracle gate's
job (ORACLE_DATASET_CARD)."""

from __future__ import annotations

import math
import os
import re
import tempfile

import pandas as pd

from ocr_output_evaluation_spark.queries import dataset_card_report

SF = "/root/testdata/sf0.001"


def _norm(text):
    return re.sub(r"\s+", " ", re.sub(r"[^a-z ]+", " ", text.lower())).strip()


def _mirror(docs):
    # docs: (source, lang, text)
    n = len(docs)
    toks = [(_norm(s).split(" ") if _norm(s) else []) for _, _, s in docs]
    fps = {_norm(s) for _, _, s in docs}
    vocab = set()
    for ts in toks:
        vocab.update(ts)
    langs = {}
    for _, lang, _ in docs:
        langs[lang] = langs.get(lang, 0) + 1
    top_lang, top_docs = sorted(langs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    lens = sorted(len(s) for _, _, s in docs)

    def q(k):
        return lens[math.ceil(k * n / 4.0) - 1]

    n_tok = sum(len(ts) for ts in toks)
    return dict(
        n_docs=n,
        n_sources=len({s for s, _, _ in docs}),
        n_langs=len(langs),
        n_tokens=n_tok,
        v_types=len(vocab),
        n_unique_texts=len(fps),
        n_exact_dups=n - len(fps),
        dup_rate=round((n - len(fps)) / n, 6),
        top_lang=top_lang,
        top_lang_docs=top_docs,
        top_lang_share=round(top_docs / n, 6),
        mean_tokens_per_doc=round(n_tok / n, 6),
        len_q1=q(1),
        len_q2=q(2),
        len_q3=q(3),
    )


def _write(docs):
    tmp = tempfile.mkdtemp()
    pd.DataFrame(
        [
            dict(doc_id=i, text=s, lang=lang, source=src, n_chars=len(s))
            for i, (src, lang, s) in enumerate(docs)
        ]
    ).to_parquet(os.path.join(tmp, "documents.parquet"))
    return tmp


def _collect(spark, sf):
    return [r.asDict() for r in dataset_card_report(spark, sf).collect()]


def test_card_normalized_dup_accounting(spark):
    # 'Hello World' / 'hello, world!' / 'hello world' collapse to one
    # normalized fingerprint
    docs = [
        ("a", "en", "Hello World"),
        ("a", "en", "hello, world!"),
        ("b", "en", "hello world"),
        ("b", "de", "etwas anderes hier"),
    ]
    got = _collect(spark, _write(docs))
    assert got == [_mirror(docs)]
    r = got[0]
    assert r["n_unique_texts"] == 2 and r["n_exact_dups"] == 2
    assert r["dup_rate"] == 0.5


def test_card_top_lang_tiebreak(spark):
    # two langs at 2 docs each: alphabetical tiebreak wins
    docs = [
        ("a", "de", "xx yy"),
        ("a", "de", "zz ww"),
        ("a", "en", "aa bb"),
        ("a", "en", "cc dd"),
    ]
    got = _collect(spark, _write(docs))
    assert got == [_mirror(docs)]
    assert got[0]["top_lang"] == "de" and got[0]["top_lang_share"] == 0.5


def test_card_quartiles_type1(spark):
    docs = [
        ("a", "en", "x" * v)
        for v in (10, 20, 30, 40, 50, 60, 70, 80)
    ]
    got = _collect(spark, _write(docs))
    assert got == [_mirror(docs)]
    r = got[0]
    assert (r["len_q1"], r["len_q2"], r["len_q3"]) == (20, 40, 60)


def test_card_sf_consistency_and_plan(spark):
    a = _collect(spark, SF)
    assert a == _collect(spark, SF)
    r = a[0]
    assert r["n_unique_texts"] <= r["n_docs"]
    assert r["v_types"] <= r["n_tokens"]
    assert r["len_q1"] <= r["len_q2"] <= r["len_q3"]
    assert 0 < r["top_lang_share"] <= 1.0
    # cross-subsystem: entry()'s flagship rollup counts the same corpus
    from tests.test_plans import plan_of

    plan = plan_of(dataset_card_report(spark, SF))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan
