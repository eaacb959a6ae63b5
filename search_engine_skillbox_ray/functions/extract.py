"""HTML visible-text extraction with Jsoup ``body().text()`` semantics (M1).

The reference extracts page text with ``doc.body().text()``
(/root/reference/src/main/java/searchengine/utils/PageIndexingUtils.java:42-44)
and stores THAT string as the page content. BASELINE.json's per-row
invariant is byte-identical extracted text per url, so this module
re-implements Jsoup's ``Element.text()`` normalization rules exactly:

* Text-node whitespace runs — space, ``\\t``, ``\\n``, ``\\f``, ``\\r`` and
  U+00A0 (``&nbsp;``, Jsoup ``StringUtil.isActuallyWhitespace``) — collapse
  to one ASCII space; leading whitespace after an existing space is dropped.
* Invisible characters U+200B (zero-width space) and U+00AD (soft hyphen)
  are removed (Jsoup ``StringUtil.isInvisibleChar``).
* Entering a block-level element or ``<br>`` appends one space when the
  accumulator is non-empty and does not already end in a space (Jsoup
  ``Element.text`` head rule).
* Leaving a block-level element appends one space only when the very next
  sibling node is a text node (Jsoup tail rule) — streamed here as a
  "pending boundary" committed at the next character-data event and
  cancelled by any start tag or non-block end tag.
* ``<script>``/``<style>`` bodies are data nodes in Jsoup and never appear
  in ``text()``; ``<title>`` lives in ``<head>`` and is likewise excluded.
* ``<pre>``/``<textarea>`` subtrees preserve whitespace verbatim
  (Jsoup ``TextNode.getWholeText`` path).
* The final string is trimmed like Java ``String.trim()`` (code points
  <= U+0020 only — NOT Python ``str.strip()``, which would also eat
  U+00A0 surviving verbatim inside ``<pre>``).

Entities are decoded before normalization (``&nbsp;`` -> U+00A0 -> space).
Bytes are decoded by BOM, then a ``<meta charset>`` sniff over the head of
the document, else UTF-8 with replacement.
"""

from __future__ import annotations

import codecs
import re
from html.parser import HTMLParser

import pyarrow as pa

# Jsoup Tag.java blockTags (the isBlock set), minus head-only tags we never
# see as body content.  html/head/body included: entering body is a boundary.
BLOCK_TAGS = frozenset(
    """html body frameset section nav aside hgroup header footer p h1 h2 h3
    h4 h5 h6 ul ol pre div blockquote hr address figure figcaption form
    fieldset ins del dl dt dd li table caption thead tfoot tbody colgroup
    col tr th td video audio canvas details menu plaintext template article
    main svg math center dir applet marquee map area noscript
    """.split()
)

# rcdata/rawtext containers whose character data must never reach text().
_SKIP_CONTENT = frozenset({"script", "style", "title"})
_PRESERVE_WS = frozenset({"pre", "textarea"})

_WS = frozenset(" \t\n\f\r\u00a0")
_INVISIBLE = frozenset("\u200b\u00ad")
# vectorized forms of the per-char loop (C-speed; semantics identical \u2014
# invisibles never reset the whitespace state, so deleting them first
# then collapsing runs gives the same bytes)
_INVISIBLE_DEL = {0x200B: None, 0x00AD: None}
_WS_RUN_RE = re.compile("[ \t\n\f\r\u00a0]+")

_VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class _JsoupTextParser(HTMLParser):
    """Streaming re-implementation of Jsoup Element.text() accumulation."""

    CDATA_CONTENT_ELEMENTS = ("script", "style")

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self.last_white = True  # accumulator empty => suppress leading ws
        self.skip_depth = 0  # inside script/style/title
        self.pre_depth = 0  # inside pre/textarea
        self.pending_block_tail = False  # Jsoup tail rule

    # -- helpers -------------------------------------------------------
    def _boundary_space(self) -> None:
        if self.skip_depth:
            return
        if self.parts and not self.last_white:
            self.parts.append(" ")
            self.last_white = True

    # -- tag events ----------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:  # noqa: ANN001
        self.pending_block_tail = False
        if tag in _SKIP_CONTENT:
            # script/style run in html.parser CDATA mode (data keeps
            # arriving via handle_data until the close tag); title does
            # not, so its children may emit tag events — skip_depth
            # suppresses both data and boundary spaces either way.
            self.skip_depth += 1
        if tag in _PRESERVE_WS:
            self.pre_depth += 1
        if tag == "br" or tag in BLOCK_TAGS:
            self._boundary_space()
        if tag in _VOID_TAGS:
            # void elements never produce an endtag event from html.parser
            # when written without a slash; undo container bookkeeping.
            if tag in _SKIP_CONTENT:
                self.skip_depth = max(0, self.skip_depth - 1)

    def handle_startendtag(self, tag: str, attrs) -> None:  # noqa: ANN001
        self.pending_block_tail = False
        if tag == "br" or tag in BLOCK_TAGS:
            self._boundary_space()
        if tag in BLOCK_TAGS and tag != "br":
            self.pending_block_tail = True

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_CONTENT:
            self.skip_depth = max(0, self.skip_depth - 1)
        if tag in _PRESERVE_WS:
            self.pre_depth = max(0, self.pre_depth - 1)
        # Jsoup tail rule: a space after a block element only if the next
        # sibling is a TextNode.  Arm on block close; disarm on any tag.
        self.pending_block_tail = tag in BLOCK_TAGS

    # -- character data ------------------------------------------------
    def handle_data(self, data: str) -> None:
        if self.skip_depth:
            return
        if self.pending_block_tail:
            self._boundary_space()
            self.pending_block_tail = False
        if not data:
            return
        if self.pre_depth:
            self.parts.append(data)
            self.last_white = data[-1] in _WS
            return
        if "​" in data or "­" in data:
            data = data.translate(_INVISIBLE_DEL)
        s = _WS_RUN_RE.sub(" ", data)
        if s and s[0] == " " and self.last_white:
            s = s[1:]
        if s:
            self.parts.append(s)
            self.last_white = s[-1] == " "

    def result(self) -> str:
        text = "".join(self.parts)
        # Java String.trim(): strip only code points <= U+0020.
        start, end = 0, len(text)
        while start < end and text[start] <= "\x20":
            start += 1
        while end > start and text[end - 1] <= "\x20":
            end -= 1
        return text[start:end]


_META_CHARSET_RE = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([a-zA-Z0-9_\-]+)""", re.IGNORECASE
)


def decode_html(raw: bytes) -> str:
    """Decode HTML bytes: BOM, then <meta charset> sniff, else UTF-8."""
    if raw.startswith(codecs.BOM_UTF8):
        return raw[len(codecs.BOM_UTF8):].decode("utf-8", errors="replace")
    if raw.startswith(codecs.BOM_UTF16_LE) or raw.startswith(codecs.BOM_UTF16_BE):
        return raw.decode("utf-16", errors="replace")
    m = _META_CHARSET_RE.search(raw[:2048])
    if m:
        enc = m.group(1).decode("ascii", errors="replace").lower()
        try:
            return raw.decode(enc, errors="replace")
        except (LookupError, ValueError):
            pass
    return raw.decode("utf-8", errors="replace")


def extract_text(html: str | bytes) -> str:
    """Jsoup ``body().text()`` of an HTML document (see module docstring)."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = decode_html(bytes(html))
    parser = _JsoupTextParser()
    try:
        parser.feed(html)
        parser.close()
    except Exception:
        # Jsoup never throws on malformed HTML; keep whatever accumulated.
        pass
    return parser.result()


def extract_text_batch(batch: pa.Table, html_col: str = "html", out_col: str = "text") -> pa.Table:
    """``map_batches`` body: add/replace ``out_col`` with extracted text.

    Stateless task stage — per-document HTML parsing is inherently
    row-wise CPU work; the batch wrapper keeps Arrow in/out so upstream
    and downstream stages stay zero-copy.
    """
    col = batch.column(html_col)
    texts = pa.array(
        [extract_text(v) if v is not None else "" for v in col.to_pylist()],
        type=pa.string(),
    )
    if out_col in batch.column_names:
        batch = batch.drop_columns([out_col])
    return batch.append_column(out_col, texts)
