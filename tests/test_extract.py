"""Extraction byte-identity gate (SURVEY §5.1, BASELINE per-row invariant)."""

from search_engine_skillbox_ray.functions.extract import decode_html, extract_text
from search_engine_skillbox_ray.sources.fixtures import generate_pages_table

# Hand-derived golden corpus pinning Jsoup body().text() semantics.
GOLDEN = [
    # entity decoding
    ("<body><p>Hello &amp; world</p></body>", "Hello & world"),
    ("<body>&lt;tag&gt; &quot;q&quot; &#65;</body>", '<tag> "q" A'),
    # U+00A0 collapse (Jsoup isActuallyWhitespace)
    ("<body>a&nbsp;b</body>", "a b"),
    ("<body>a&nbsp;&nbsp;&nbsp;b</body>", "a b"),
    ("<body>a   b</body>", "a b"),
    # whitespace runs
    ("<body>  a \t\n b \r\n</body>", "a b"),
    # invisible chars dropped
    ("<body>x​y­z</body>", "xyz"),
    # block boundary spacing
    ("<body><div>one</div><div>two</div></body>", "one two"),
    ("<body>one<div>two</div>three</body>", "one two three"),
    ("<body><p>a</p><p>b</p></body>", "a b"),
    ("<body><ul><li>alpha</li><li>beta</li></ul></body>", "alpha beta"),
    ("<body><table><tr><td>c1</td><td>c2</td></tr></table></body>", "c1 c2"),
    # inline tags add no space
    ("<body>a<b>b</b>c</body>", "abc"),
    ("<body><span>in</span><span>line</span></body>", "inline"),
    ("<body><b>bold</b> then <i>italic</i></body>", "bold then italic"),
    # Jsoup tail rule: space after block only when next sibling is text
    ("<body><div>a</div>b</body>", "a b"),
    ("<body><div>a</div><b>c</b></body>", "ac"),
    ("<body><div>a</div> <b>c</b></body>", "a c"),
    ("<body><p><div>a</div></p>b</body>", "a b"),
    ("<body><div>a</div><div></div>b</body>", "a b"),
    # br is a space, not a newline
    ("<body>line1<br>line2<br/>line3</body>", "line1 line2 line3"),
    # scripts/styles excluded (data nodes)
    ("<body><script>var x = '<b>hi</b>';</script>visible</body>", "visible"),
    ("<body><style>p{color:red}</style>styled</body>", "styled"),
    ("<body>a<script>\nif (x < 3) y();\n</script>b</body>", "ab"),
    # head/title excluded
    ("<html><head><title>The Title</title></head><body>content</body></html>", "content"),
    # no body tag: content still extracted (parser-inserted body)
    ("<p>no body tag</p>", "no body tag"),
    ("plain text only", "plain text only"),
    ("", ""),
    ("<html><head><title>t</title></head></html>", ""),
    # pre preserves whitespace
    ("<body><pre>  a\n  b </pre></body>", "a\n  b"),
    ("<body>x<pre>\ta\tb</pre>y</body>", "x \ta\tb y"),
    # nested inline within block
    ("<body><p>a <b>deep <i>nest</i></b> out</p></body>", "a deep nest out"),
    # digits and punctuation are ordinary text
    ("<body>num 42 x9y split-word</body>", "num 42 x9y split-word"),
    # Cyrillic / mixed script
    ("<body><p>Привет мир</p><p>mixed текст</p></body>", "Привет мир mixed текст"),
    # empty blocks between text
    ("<body>a<div></div><div></div>b</body>", "a b"),
    # attributes never leak
    ('<body><a href="https://x.example/#y" title="tip">link</a></body>', "link"),
    # comments excluded
    ("<body>a<!-- hidden -->b</body>", "ab"),
    # h-tags are blocks
    ("<body><h1>Head</h1>para</body>", "Head para"),
    # trailing/leading trim is Java trim (<= U+0020)
    ("<body>\n  trimmed  \n</body>", "trimmed"),
    # textarea preserves whitespace and IS included (rcdata text node)
    ("<body><textarea>a  b</textarea></body>", "a  b"),
    # deeply nested blocks: one space per boundary run
    ("<body><div><div><div>deep</div></div></div>tail</body>", "deep tail"),
    # definition lists and blockquote are block-level
    ("<body><dl><dt>term</dt><dd>def</dd></dl></body>", "term def"),
    ("<body>a<blockquote>quoted</blockquote>b</body>", "a quoted b"),
    # hr contributes only a boundary
    ("<body>a<hr>b</body>", "a b"),
    # numeric + hex character references
    ("<body>&#x41;&#66;&#1087;</body>", "ABп"),
    # entity for nbsp at string edges trims away
    ("<body>&nbsp;edge&nbsp;</body>", "edge"),
    # mixed inline/block alternation
    # p tail: next sibling is an Element, not a TextNode → no space
    ("<body><span>a</span><p>b</p><span>c</span></body>", "a bc"),
    # li nested lists
    ("<body><ul><li>a<ul><li>b</li></ul></li><li>c</li></ul></body>", "a b c"),
    # tag soup: unclosed tags don't break accumulation
    ("<body><p>open<p>next<div>x</body>", "open next x"),
    # attributes containing angle-ish content
    ('<body><img src="x.png" alt="ignored text">after</body>', "after"),
    # table with caption and headers
    ("<body><table><caption>cap</caption><tr><th>h</th></tr><tr><td>v</td></tr></table></body>", "cap h v"),
    # empty inline elements contribute nothing
    ("<body>a<b></b><i></i>b</body>", "ab"),
    # whitespace-only text between blocks collapses into the boundary
    ("<body><p>a</p>   \n  <p>b</p></body>", "a b"),
    # uppercase tags are normalized by the parser
    ("<BODY><P>Caps</P><DIV>tags</DIV></BODY>", "Caps tags"),
    # br at string start produces no leading space
    ("<body><br>lead</body>", "lead"),
]


def test_golden_corpus():
    for html, expected in GOLDEN:
        got = extract_text(html)
        assert got == expected, f"{html!r}: {got!r} != {expected!r}"


def test_golden_corpus_bytes_utf8():
    for html, expected in GOLDEN:
        assert extract_text(html.encode("utf-8")) == expected


def test_charset_sniff_cp1251():
    raw = '<html><head><meta charset="windows-1251"></head><body>Привет</body></html>'.encode("cp1251")
    assert extract_text(raw) == "Привет"


def test_charset_bom_utf8():
    raw = b"\xef\xbb\xbf<body>bom</body>"
    assert extract_text(raw) == "bom"


def test_charset_default_utf8():
    assert decode_html("мир".encode("utf-8")) == "мир"


def test_fixture_generator_self_consistent():
    """The generator's golden `text` column equals our extraction — the
    per-row byte-identity invariant over the synthetic corpus."""
    tbl = generate_pages_table(300, n_sites=3, seed=7)
    for url, html, text in zip(
        tbl["url"].to_pylist(), tbl["html"].to_pylist(), tbl["text"].to_pylist()
    ):
        assert extract_text(html) == text, url
