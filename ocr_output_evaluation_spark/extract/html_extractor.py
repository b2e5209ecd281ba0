"""Main-content extraction from HTML bytes — the pure-Python core.

This is the rebuild's analog of the reference's text-preprocessing region
(/root/reference/perplexity_scorer.py:44-81: unicode normalization + a
"keep only the content script" regex). Here the content signal is structural:
a DOM walk (stdlib html.parser) segments the page into blocks, and
readability/trafilatura-style heuristics — text density and link density —
classify each block as main content or boilerplate.

DESIGN INVARIANT (the north rule): this module is a *pure function of the
input bytes*. The Spark pandas UDF (extract/udf.py) calls exactly this code,
so distributed output is byte-identical to the single-process golden output
by construction. No wall-clock, no RNG, no environment reads, no library
whose output could drift between processes.
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass
from html import unescape as _html_unescape

EXTRACTOR_VERSION_SALT = "ooe-spark-extractor"

# Tags whose entire subtree is boilerplate by construction.
_DROP_SUBTREE = frozenset(
    {"script", "style", "noscript", "template", "svg", "head",
     "nav", "header", "footer", "aside", "form", "button", "iframe"}
)
# Tags that delimit a candidate text block.
_BLOCK_TAGS = frozenset(
    {"p", "article", "section", "main", "div", "li", "td", "th",
     "pre", "blockquote", "h1", "h2", "h3", "h4", "h5", "h6",
     "figcaption", "summary", "dd", "dt"}
)
_HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})

# Classification thresholds (fixed; part of the extraction version).
MIN_BLOCK_CHARS = 25
MIN_HEADING_CHARS = 10
MAX_LINK_DENSITY = 1.0 / 3.0


@dataclass
class ExtractionResult:
    text: str | None
    n_blocks_kept: int
    n_blocks_dropped: int
    is_pdf: bool
    error: str | None

    @property
    def text_sha256(self) -> str | None:
        if self.text is None:
            return None
        return hashlib.sha256(self.text.encode("utf-8")).hexdigest()


class _Block:
    __slots__ = ("tag", "chars", "link_chars")

    def __init__(self, tag: str) -> None:
        self.tag = tag
        self.chars: list[str] = []
        self.link_chars = 0


# Tokenizer: start tags begin strictly with "<letter" (whitespace after "<"
# makes it literal text — `i < j` in prose must not swallow content); end
# tags tolerate "</ letter" whitespace like html.parser does.
_TAG_NAME = re.compile(r"<(?:(/)\s*([a-zA-Z][a-zA-Z0-9:-]*)|([a-zA-Z][a-zA-Z0-9:-]*))")
_RAWTEXT_CLOSE = {
    t: re.compile(rf"</\s*{t}", re.IGNORECASE) for t in ("script", "style")
}


class _BlockParser:
    """Single-pass DOM walk that accumulates (text, link-text) per block.

    Hand-rolled tokenizer (find('<') + one small regex per tag) instead of
    stdlib html.parser: same event stream on the corpus, ~4x less CPU —
    html.parser spent 96% of extraction time in per-tag regex machinery
    (profiled; this UDF is the engine's dominant cost at scale). Raw-text
    elements (script/style) skip straight to their close tag, so '<' '>'
    inside code never fabricate tags. Known simplification vs html.parser:
    a literal '>' inside a quoted attribute value ends the tag early."""

    def __init__(self) -> None:
        self.blocks: list[tuple[str, str, int]] = []  # (tag, text, link_chars)
        self._drop_depth = 0
        self._drop_open: dict[str, int] = {}  # open count per drop tag
        self._anchor_depth = 0
        self._stack: list[_Block] = [_Block("body")]

    def feed(self, doc: str) -> None:
        i, n = 0, len(doc)
        find = doc.find
        handle_data = self.handle_data
        while i < n:
            lt = find("<", i)
            if lt < 0:
                handle_data(doc[i:])
                break
            if lt > i:
                handle_data(doc[i:lt])
            m = _TAG_NAME.match(doc, lt)
            if m is None:
                # comment / doctype / PI / stray "<"
                if doc.startswith("<!--", lt):
                    # search from lt+2 so the degenerate comments "<!-->" and
                    # "<!--->" terminate on their own overlapping "-->"
                    # (HTML5 abruptly-closed comments) instead of swallowing
                    # the rest of the document
                    end = find("-->", lt + 2)
                    i = n if end < 0 else end + 3
                elif doc.startswith("<!", lt) or doc.startswith("<?", lt):
                    end = find(">", lt + 2)
                    i = n if end < 0 else end + 1
                else:
                    handle_data("<")
                    i = lt + 1
                continue
            gt = find(">", m.end())
            if gt < 0:
                break  # truncated trailing tag: discard like a buffered parser
            tag = (m.group(2) or m.group(3)).lower()
            if m.group(1):
                self.handle_endtag(tag)
            else:
                # Trailing "/" policy: for HTML elements the self-closing
                # flag officially means nothing, and checking doc[gt-1]=='/'
                # misfires on unquoted attribute values ending in "/" (e.g.
                # <a href=https://x.com/>) — so ordinary tags are ALWAYS
                # treated as plain start tags (the anchor must open for
                # link-density tracking). Drop-subtree tags are the
                # exception: "<iframe .../>"/"<svg .../>"/"<script/>" must
                # be an EMPTY dropped subtree, because opening a drop region
                # that never closes would silently discard the rest of the
                # document — the safer reading for either interpretation of
                # the trailing slash.
                if doc[gt - 1] == "/" and tag in _DROP_SUBTREE:
                    i = gt + 1
                    continue
                self.handle_starttag(tag, None)
                closer = _RAWTEXT_CLOSE.get(tag)
                if closer is not None:
                    # raw-text element: content is never markup
                    cm = closer.search(doc, gt + 1)
                    if cm is None:
                        i = n
                        continue
                    close_gt = find(">", cm.end())
                    self.handle_endtag(tag)
                    i = n if close_gt < 0 else close_gt + 1
                    continue
            i = gt + 1

    # -- block lifecycle ---------------------------------------------------
    def _flush(self, block: _Block) -> None:
        raw = "".join(block.chars)
        # Whitespace normalization: split/join collapses every whitespace run
        # to a single space and trims — deterministic across platforms.
        text = " ".join(raw.split())
        if text:
            self.blocks.append((block.tag, text, block.link_chars))

    def handle_starttag(self, tag: str, attrs) -> None:  # noqa: ANN001
        if tag in _DROP_SUBTREE:
            self._drop_depth += 1
            self._drop_open[tag] = self._drop_open.get(tag, 0) + 1
            return
        if self._drop_depth:
            return
        if tag == "a":
            self._anchor_depth += 1
        if tag in _BLOCK_TAGS:
            self._stack.append(_Block(tag))
        elif tag == "br":
            self._stack[-1].chars.append(" ")

    def handle_endtag(self, tag: str) -> None:
        if tag in _DROP_SUBTREE:
            # Only unwind a drop this tag actually opened: a stray </footer>
            # inside an open <nav> must not cancel the nav's drop and leak
            # its boilerplate into the extracted text.
            if self._drop_open.get(tag, 0) > 0:
                self._drop_open[tag] -= 1
                self._drop_depth -= 1
            return
        if self._drop_depth:
            return
        if tag == "a" and self._anchor_depth:
            self._anchor_depth -= 1
            return
        if tag in _BLOCK_TAGS:
            # Close the innermost open block of this tag (tolerates misnesting).
            for i in range(len(self._stack) - 1, 0, -1):
                if self._stack[i].tag == tag:
                    for blk in self._stack[i:]:
                        self._flush(blk)
                    del self._stack[i:]
                    break

    def handle_data(self, data: str) -> None:
        if self._drop_depth or not data:
            return
        if "&" in data:
            # charref decoding (the convert_charrefs behavior), paid only on
            # segments that actually contain an ampersand
            data = _html_unescape(data)
        blk = self._stack[-1]
        blk.chars.append(data)
        if self._anchor_depth:
            # Count link text at normalized weight (whitespace-collapsed length).
            blk.link_chars += len(" ".join(data.split()))

    def close(self) -> None:
        while len(self._stack) > 1:
            self._flush(self._stack.pop())
        self._flush(self._stack[0])
        self._stack = [_Block("body")]


def _classify(tag: str, text: str, link_chars: int) -> bool:
    """True if the block is main content."""
    n = len(text)
    if tag in _HEADING_TAGS:
        return n >= MIN_HEADING_CHARS and link_chars == 0
    if n < MIN_BLOCK_CHARS:
        return False
    return (link_chars / n) <= MAX_LINK_DENSITY


def extract_html(html_bytes: bytes) -> ExtractionResult:
    """HTML branch: decode, walk, classify, join kept blocks with newlines."""
    try:
        doc = html_bytes.decode("utf-8", errors="strict")
    except UnicodeDecodeError:
        return ExtractionResult(None, 0, 0, False, "decode-error")
    parser = _BlockParser()
    try:
        parser.feed(doc)
        parser.close()
    except Exception:  # html.parser almost never raises; isolate anyway (D3)
        return ExtractionResult(None, 0, 0, False, "parse-error")
    kept: list[str] = []
    dropped = 0
    for tag, text, link_chars in parser.blocks:
        if _classify(tag, text, link_chars):
            kept.append(text)
        else:
            dropped += 1
    return ExtractionResult("\n".join(kept), len(kept), dropped, False, None)


def extract_document(html_bytes: bytes | None) -> ExtractionResult:
    """Dispatch: empty / PDF / HTML. Pure function of the bytes.

    Total by contract (D3 failure isolation): any unexpected exception from
    either branch becomes an in-band error row — one corrupt payload must
    never abort a task that holds thousands of good documents."""
    from .pdf_extractor import extract_pdf  # local import: keep module load cheap

    if html_bytes is None or len(html_bytes) == 0:
        return ExtractionResult(None, 0, 0, False, "empty-input")
    is_pdf = html_bytes[:5] == b"%PDF-"
    try:
        if is_pdf:
            return extract_pdf(html_bytes)
        return extract_html(html_bytes)
    except Exception as e:  # noqa: BLE001 - the isolation boundary
        return ExtractionResult(None, 0, 0, is_pdf, f"internal-error: {type(e).__name__}")


def extraction_version() -> str:
    """Hash of the extractor source — carried in the manifest so a resumed run
    refuses to mix outputs from different extractor versions (SURVEY.md §7)."""
    import inspect
    import sys

    from . import pdf_extractor

    src = inspect.getsource(sys.modules[__name__]) + inspect.getsource(pdf_extractor)
    h = hashlib.sha256((EXTRACTOR_VERSION_SALT + src).encode("utf-8")).hexdigest()
    return h[:12]
