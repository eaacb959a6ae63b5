"""M4-M6, M10-M12 conformance (SURVEY §5.6)."""

from search_engine_skillbox_ray.functions.snippets import extract_title, generate_snippet
from search_engine_skillbox_ray.functions.urls import (
    build_full_url,
    extract_path,
    extract_site_name,
    normalize_url,
)


def test_normalize_url():
    # UrlUtils.java:16-34: strip #fragment, www. after scheme, ONE trailing /
    assert normalize_url("https://www.example.com/a/#sec") == "https://example.com/a"
    assert normalize_url("http://www.example.com/") == "http://example.com"
    assert normalize_url("https://example.com/a//") == "https://example.com/a/"
    assert normalize_url("https://example.com#x") == "https://example.com"
    assert normalize_url("https://sub.www.example.com/") == "https://sub.www.example.com"


def test_extract_path():
    assert extract_path("https://www.example.com/a/b", "https://example.com") == "/a/b"
    assert extract_path("https://example.com", "https://example.com") == "/"
    assert extract_path("https://other.com/x", "https://example.com") == "https://other.com/x"


def test_extract_site_name():
    # UrlUtils.java:43-60: host minus www., first dot-label, capitalized
    assert extract_site_name("https://www.lenta.ru/news") == "Lenta"
    assert extract_site_name("http://skillbox.ru") == "Skillbox"


def test_build_full_url():
    # SearchServiceImpl.java:209-237
    assert build_full_url("https://a.com", "/x") == "https://a.com/x"
    assert build_full_url("https://a.com/", "/x") == "https://a.com/x"
    assert build_full_url("https://a.com", "x") == "https://a.com/x"
    assert build_full_url("https://a.com", "") == "https://a.com/"
    assert build_full_url("https://a.com", "https://b.com/y") == "https://b.com/y"


def test_extract_title():
    # M10 (SearchServiceImpl.java:240-251): text prefix, NOT html <title>
    assert extract_title("short text", "/p") == "short text"
    assert extract_title("", "/p") == "/p"
    assert extract_title(None, "/p") == "/p"
    long = "word " * 40  # 200 chars
    t = extract_title(long, "/p")
    assert t.endswith("...") and len(t) <= 123
    # truncated exactly at last space before 120
    assert t == long.strip()[:120][: long[:120].rfind(" ")] + "..."
    # no space past index 10 → raw 120-char cut, no ellipsis
    blob = "a" * 200
    assert extract_title(blob, "/p") == "a" * 120


def test_snippet_basic_window():
    # M12 (SnippetService.java:17-86)
    text = "alpha beta gamma delta " * 20
    s = generate_snippet(text, ["gamma"])
    assert "<b>gamma</b>" in s
    assert len(s) <= 303 + 6  # 300 + "..." with edge markers


def test_snippet_two_segments_max():
    text = ("x " * 100) + "first " + ("y " * 100) + "second " + ("z " * 100)
    s = generate_snippet(text, ["first", "second", "x"])
    # only the first two query words produce segments
    assert "<b>first</b>" in s and "<b>second</b>" in s
    assert " ... " in s


def test_snippet_fallback_no_match():
    text = "plain words only here " * 30
    s = generate_snippet(text, ["absent"])
    assert s.endswith("...") and len(s) <= 303
    assert s.startswith("plain words")


def test_snippet_substring_match_word_boundary_highlight():
    # indexOf finds substring matches, but highlight needs \b boundaries
    s = generate_snippet("the catalog entry", ["cat"])
    # window found via substring 'cat' in 'catalog', but no whole-word match
    assert "<b>" not in s


def test_snippet_case_insensitive_highlight_preserves_case():
    s = generate_snippet("The Merge wins", ["merge"])
    assert "<b>Merge</b>" in s


def test_snippet_blank():
    assert generate_snippet("", ["a"]) == ""
    assert generate_snippet(None, ["a"]) == ""


def test_snippet_duplicate_words_deduped():
    s = generate_snippet("only one window here", ["window", "Window", " window "])
    assert s.count("<b>window</b>") == 1


def test_extract_links_m7_semantics():
    # UrlUtils.java:62-107: skip empty/javascript:/mailto:/#, absolutize,
    # normalize, in-site filter, dedup (first occurrence)
    from search_engine_skillbox_ray.functions.links import extract_links

    html = """
    <body>
      <a href="/p/1">one</a>
      <a href="p/2#frag">two</a>
      <a href="https://www.site0.example/p/3/">three-www-slash</a>
      <a href="https://other.example/x">external</a>
      <a href="javascript:void(0)">js</a>
      <a href="mailto:a@b.c">mail</a>
      <a href="#">hash</a>
      <a href="">empty</a>
      <a href="/p/1">dup</a>
    </body>"""
    links = extract_links(html, "https://site0.example/start", "https://site0.example")
    assert links == [
        "https://site0.example/p/1",
        "https://site0.example/p/2",
        "https://site0.example/p/3",
    ]


def test_extract_links_ds(ray_session):
    import ray.data as rd

    from search_engine_skillbox_ray.functions.links import extract_links_ds
    from search_engine_skillbox_ray.sources.fixtures import generate_pages_table
    from search_engine_skillbox_ray.sources.pages import derive_sites

    import pyarrow as pa

    tbl = pa.table(
        {
            "url": ["https://site0.example/a", "https://site0.example/b"],
            "html": [
                b'<body><a href="/b">b</a><a href="https://ext.example/x">out</a></body>',
                b'<body><a href="/a">a</a><a href="/a#top">same</a></body>',
            ],
        }
    )
    pages = rd.from_arrow(tbl)
    sites = derive_sites(pages)
    graph = extract_links_ds(pages, sites).to_pandas()
    got = {tuple(r) for r in graph[["src_url", "dst_url"]].itertuples(index=False)}
    assert got == {
        ("https://site0.example/a", "https://site0.example/b"),
        ("https://site0.example/b", "https://site0.example/a"),
    }
