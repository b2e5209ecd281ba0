"""Deterministic synthetic fixtures (FIXTURES.md) — seeded, no external data.

Every field of every row is a pure function of (seed, row_index) via sha256,
so the same table can be generated single-process (pytest golden) or
partition-parallel (bench scale, mapInPandas over spark.range) and be
bit-identical. This mirrors how the engine itself guarantees byte-identical
extraction (one pure function, two execution modes).
"""

from __future__ import annotations

import hashlib
import math
import struct
from datetime import datetime, timedelta, timezone

import pandas as pd

SEED = "ooe-fixtures-v1"

# ~50 domains, Zipf-skewed: a handful of hot domains absorb ~30% of rows
# to exercise salting / AQE skew handling (FIXTURES.md §1).
DOMAINS = [f"site{i:02d}.example.{tld}" for i, tld in enumerate(
    ["com", "org", "net", "io", "dev"] * 10
)]
LANGS = ["bo", "en", "zh", "de", "fr"]

# Per-lang fixed vocab — disjoint word sets so char-ngram perplexity and
# language-ID heuristics are meaningful (FIXTURES.md §1).
VOCAB = {
    "en": "the quick brown fox jumps over lazy dog river stone light cloud "
          "garden window market bridge winter summer letter".split(),
    "de": "der schnelle braune fuchs springt uber faulen hund fluss stein "
          "licht wolke garten fenster markt brucke winter sommer brief".split(),
    "fr": "le renard brun rapide saute pardessus chien paresseux riviere "
          "pierre lumiere nuage jardin fenetre marche pont hiver ete lettre".split(),
    "zh": "shan shui feng yue tian di ren he chuan mu huo tu jin shui lin "
          "sen yun yu xue dian".split(),
    "bo": "ri chu lung zla nam sa mi dang gru shing me tog ser nya tsho "
          "gangs khang yig sprin".split(),
}
BOILER = "home about contact login subscribe privacy terms sitemap archive tags".split()


def _h(*parts) -> bytes:
    return hashlib.sha256((SEED + ":" + ":".join(str(p) for p in parts)).encode()).digest()


def _hint(*parts) -> int:
    """Deterministic 64-bit uint from the seed and parts."""
    return struct.unpack(">Q", _h(*parts)[:8])[0]


def _zipf_domain(i: int) -> str:
    # Inverse-CDF over 1/rank weights — heavy head, long tail.
    n = len(DOMAINS)
    harm = sum(1.0 / r for r in range(1, n + 1))
    u = (_hint(i, "dom") % 10**9) / 10**9 * harm
    acc = 0.0
    for r in range(1, n + 1):
        acc += 1.0 / r
        if u <= acc:
            return DOMAINS[r - 1]
    return DOMAINS[-1]


def _lang_for_domain(domain: str) -> str:
    return LANGS[_hint("langof", domain) % len(LANGS)]


def _words(lang: str, i: int, tag: str, n: int) -> str:
    vocab = VOCAB[lang]
    return " ".join(vocab[_hint(i, tag, k) % len(vocab)] for k in range(n))


def _main_blocks(lang: str, i: int) -> list[str]:
    n_blocks = 1 + _hint(i, "nb") % 5
    blocks = []
    for b in range(n_blocks):
        n_words = 8 + _hint(i, "bw", b) % 40
        blocks.append(_words(lang, i, f"mc{b}", n_words))
    return blocks


def _linkfarm(i: int, tag: str, n_links: int) -> str:
    links = "".join(
        f'<a href="/x{k}">{BOILER[_hint(i, tag, k) % len(BOILER)]}</a> '
        for k in range(n_links)
    )
    return links


def make_html(i: int, lang: str) -> bytes:
    """Templated page: nav + link-farm boilerplate, 1-5 main blocks, footer."""
    blocks = _main_blocks(lang, i)
    body = [
        "<html><head><title>page %d</title><script>var x=1;</script></head><body>" % i,
        "<nav>%s</nav>" % _linkfarm(i, "nav", 8),
        '<div class="promo">%s</div>' % _linkfarm(i, "promo", 12),
    ]
    for b, blk in enumerate(blocks):
        tag = ("p", "article", "section")[_hint(i, "btag", b) % 3]
        body.append(f"<{tag}>{blk}</{tag}>")
        if b == 0 and _hint(i, "h1") % 3 == 0:
            body.append("<h2>%s</h2>" % _words(lang, i, "head", 3))
    body.append("<aside>%s</aside>" % _linkfarm(i, "aside", 6))
    body.append("<footer>copyright %s</footer>" % _linkfarm(i, "foot", 5))
    body.append("</body></html>")
    return "\n".join(body).encode("utf-8")


def make_pdf(i: int, lang: str) -> bytes:
    """Minimal text-object PDF the pure extractor can parse."""
    blocks = _main_blocks(lang, i)
    streams = "".join(
        "BT /F1 12 Tf 72 %d Td (%s) Tj ET\n" % (700 - 20 * b, blk.replace("(", r"\(").replace(")", r"\)"))
        for b, blk in enumerate(blocks)
    )
    return (
        "%%PDF-1.4\n1 0 obj << /Type /Catalog >> endobj\n"
        "2 0 obj << /Length %d >> stream\n%s\nendstream endobj\n"
        "trailer << /Root 1 0 R >>\n%%%%EOF" % (len(streams), streams)
    ).encode("utf-8")


_EPOCH = datetime(2025, 1, 1, tzinfo=timezone.utc)


def web_page_row(i: int) -> dict:
    """One deterministic web_pages row. Row classes (FIXTURES.md §1):
    ~5% PDF, ~2% malformed (invalid utf-8 / truncated pdf), ~1% empty html."""
    domain = _zipf_domain(i)
    lang = _lang_for_domain(domain)
    url = f"https://{domain}/p/{_h(i, 'path').hex()[:16]}"
    ts = _EPOCH + timedelta(seconds=(_hint(i, "ts") % (30 * 86400)))
    cls = _hint(i, "cls") % 100
    if cls < 1:
        html: bytes | None = b""
    elif cls < 3:
        if cls == 1:
            html = b"<html><body><p>" + b"\xff\xfe broken " + b"\x80" * 5 + b"</p>"
        else:
            html = make_pdf(i, lang)[:-20]  # truncated PDF, no %%EOF
    elif cls < 8:
        html = make_pdf(i, lang)
    else:
        html = make_html(i, lang)
    raw_text = _words(lang, i, "rawtext", 12) if _hint(i, "hasraw") % 4 else None
    return {
        "url": url,
        "warc_ts": ts.replace(tzinfo=None),
        "html": html,
        "text": raw_text,
        "lang": lang,
    }


def web_pages_pdf(n: int, start: int = 0) -> pd.DataFrame:
    rows = [web_page_row(i) for i in range(start, start + n)]
    return pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])


def token_confidences_row(i: int) -> dict:
    """Seeded per-doc confidence arrays with ~2% NaN and rare +inf sentinels,
    float16-quantized (analog of /root/reference/stats_calculator.py:66-68)."""
    import numpy as np

    url = f"https://{_zipf_domain(i)}/p/{_h(i, 'path').hex()[:16]}"
    n_tok = 5 + _hint(i, "ntok") % 60
    vals = []
    for k in range(n_tok):
        r = _hint(i, "conf", k) % 10**6 / 10**6
        if _hint(i, "confnan", k) % 50 == 0:
            vals.append(float("nan"))
        elif _hint(i, "confinf", k) % 400 == 0:
            vals.append(float("inf"))
        else:
            # Beta-ish shape toward high confidence
            vals.append(float(np.float16(0.4 + 0.6 * math.sqrt(r))))
    return {"url": url, "token_confs": vals}


def token_confidences_pdf(n: int) -> pd.DataFrame:
    return pd.DataFrame([token_confidences_row(i) for i in range(n)])


def reference_lm_pdf() -> pd.DataFrame:
    """Char-trigram LM per lang from the fixed vocab corpus, log10 add-one
    smoothed (replaces KenLM, /root/reference/perplexity_scorer.py:84-135)."""
    rows = []
    for lang, vocab in VOCAB.items():
        corpus = " ".join(vocab * 20)
        counts: dict[str, int] = {}
        for j in range(len(corpus) - 2):
            g = corpus[j : j + 3]
            counts[g] = counts.get(g, 0) + 1
        total = sum(counts.values())
        v = len(counts)
        for g, c in sorted(counts.items()):
            rows.append({"lang": lang, "ngram": g, "logp": math.log10((c + 1) / (total + v))})
    return pd.DataFrame(rows, columns=["lang", "ngram", "logp"])


def domains_dim_pdf() -> pd.DataFrame:
    """~10% of domains deliberately missing to exercise left-join NULLs."""
    cats = ["news", "blog", "shop", "forum", "docs"]
    countries = ["us", "de", "fr", "cn", "in"]
    rows = []
    for d in DOMAINS:
        if _hint("dimmiss", d) % 10 == 0:
            continue
        rows.append(
            {
                "domain": d,
                "category": cats[_hint("cat", d) % len(cats)],
                "country": countries[_hint("cty", d) % len(countries)],
            }
        )
    return pd.DataFrame(rows, columns=["domain", "category", "country"])


def langs_dim_pdf() -> pd.DataFrame:
    data = [
        ("bo", "tibetan", "sino-tibetan"),
        ("en", "latin", "indo-european"),
        ("zh", "latin", "sino-tibetan"),  # pinyin in fixtures
        ("de", "latin", "indo-european"),
        ("fr", "latin", "indo-european"),
    ]
    return pd.DataFrame(data, columns=["lang", "script", "family"])


# ---------------------------------------------------------------------------
# Spark-side distributed generation (bench scale): same per-row function,
# partition-parallel via mapInPandas over spark.range — no driver bottleneck.
# ---------------------------------------------------------------------------
def web_pages_df(spark, n: int, partitions: int = 32):
    from ..schema import WEB_PAGES

    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame(
                [web_page_row(int(i)) for i in pdf["id"]],
                columns=["url", "warc_ts", "html", "text", "lang"],
            )

    return spark.range(0, n, 1, partitions).mapInPandas(gen, schema=WEB_PAGES)


def write_fixture_set(spark, out_dir: str, n_pages: int, partitions: int = 32) -> None:
    """Materialize the full fixture set as parquet under out_dir."""
    from ..schema import REFERENCE_LM, TOKEN_CONFIDENCES

    web_pages_df(spark, n_pages, partitions).write.mode("overwrite").parquet(
        f"{out_dir}/web_pages.parquet"
    )

    def gen_confs(batches):
        for pdf in batches:
            yield pd.DataFrame(
                [token_confidences_row(int(i)) for i in pdf["id"]],
                columns=["url", "token_confs"],
            )

    spark.range(0, n_pages, 1, partitions).mapInPandas(
        gen_confs, schema=TOKEN_CONFIDENCES
    ).write.mode("overwrite").parquet(f"{out_dir}/token_confidences.parquet")
    spark.createDataFrame(reference_lm_pdf(), schema=REFERENCE_LM).write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/reference_lm.parquet")
    spark.createDataFrame(domains_dim_pdf()).write.mode("overwrite").parquet(
        f"{out_dir}/domains_dim.parquet"
    )
    spark.createDataFrame(langs_dim_pdf()).write.mode("overwrite").parquet(
        f"{out_dir}/langs_dim.parquet"
    )
