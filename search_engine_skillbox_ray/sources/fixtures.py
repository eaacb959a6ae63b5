"""Deterministic synthetic Common-Crawl-style pages fixtures (FIXTURES.md §1).

Seeded generator producing the engine's primary input shape per
BASELINE.json ``input_hint``: ``pages(url, warc_ts, html:binary, text,
lang)`` — where ``text`` is the expected Jsoup ``body().text()``
extraction of ``html``, doubling as the golden value for the
byte-identity gate. No external data; byte-identical for a given seed.

Exercises: url normalization variants (www., trailing /, #fragment),
duplicate (site, path) rows with different warc_ts (keep-latest dedup),
entities (&amp;, &nbsp;), script/style exclusion, <br> and nested blocks,
digits-as-separators, Cyrillic+Latin mixed vocabulary with a Zipf head
(salting path), and a few no-body pages.
"""

from __future__ import annotations

import datetime as _dt
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_LAT_SYLL = ["ba", "den", "tor", "mi", "lus", "ka", "ver", "no", "sil", "te", "gra", "pon", "zu", "mar", "fel", "qui"]
_CYR_SYLL = ["ра", "бо", "та", "ве", "сло", "ми", "до", "кни", "га", "пе", "ре", "во", "ли", "стра", "ни", "ца"]

_BASE_TS = _dt.datetime(2026, 1, 1, 0, 0, 0)


def make_vocab(size: int = 2000, seed: int = 42) -> list[str]:
    rng = np.random.default_rng(seed)
    vocab: set[str] = set()
    out: list[str] = []
    while len(out) < size:
        if rng.random() < 0.7:
            syll = _LAT_SYLL
        else:
            syll = _CYR_SYLL
        w = "".join(rng.choice(syll) for _ in range(int(rng.integers(2, 5))))
        if w not in vocab:
            vocab.add(w)
            out.append(w)
    return out


def zipf_probs(n: int, s: float = 1.1) -> np.ndarray:
    ranks = np.arange(1, n + 1, dtype=np.float64)
    p = 1.0 / ranks**s
    return p / p.sum()


_EDGE_CASES: list[tuple[str, str]] = [
    # (html body inner, expected text) — hand-derived Jsoup semantics
    ("<p>Hello &amp; world</p>", "Hello & world"),
    ("<p>a&nbsp;&nbsp;b</p>", "a b"),
    ("<div>one<div>two</div>three</div>", "one two three"),
    ("line1<br>line2<br/>line3", "line1 line2 line3"),
    ("<p>keep</p><script>var drop = 1;</script><p>this</p>", "keep this"),
    ("<style>p {color: red}</style><p>styled</p>", "styled"),
    ("<span>in</span><span>line</span>", "inline"),
    ("<b>bold</b> then <i>italic</i>", "bold then italic"),
    ("num 42 x9y split", "num 42 x9y split"),
    ("<ul><li>alpha</li><li>beta</li></ul>", "alpha beta"),
    ("  \n\t spaced   out \r\n", "spaced out"),
    ("<pre>  pre\n  formatted </pre>after", "pre\n  formatted after"),
    ("<p>Привет мир</p><p>mixed текст</p>", "Привет мир mixed текст"),
    ("<div>a</div><b>c</b>", "ac"),
    ("<div>a</div> <b>c</b>", "a c"),
    ("", ""),
]


def generate_pages_table(
    n_pages: int,
    n_sites: int = 3,
    seed: int = 42,
    dup_fraction: float = 0.05,
    vocab_size: int = 2000,
    mean_words: int = 150,
    path_offset: int = 0,
) -> pa.Table:
    rng = np.random.default_rng(seed)
    vocab = np.array(make_vocab(vocab_size, seed))
    probs = zipf_probs(vocab_size)

    urls: list[str] = []
    htmls: list[bytes] = []
    texts: list[str] = []
    ts: list[_dt.datetime] = []
    langs: list[str] = []

    n_edge = min(len(_EDGE_CASES), n_pages // 10)
    row = 0

    def add(url: str, html: str, text: str, lang: str) -> None:
        nonlocal row
        urls.append(url)
        htmls.append(html.encode("utf-8"))
        texts.append(text)
        ts.append(_BASE_TS + _dt.timedelta(seconds=row))
        langs.append(lang)
        row += 1

    for i, (inner, expected) in enumerate(_EDGE_CASES[:n_edge]):
        url = f"https://site0.example/edge/{path_offset + i}"
        add(url, f"<html><head><title>edge {i}</title></head><body>{inner}</body></html>", expected, "en")

    i = 0
    while row < n_pages:
        site = int(rng.integers(0, n_sites))
        # url normalization variants (UrlUtils.java:16-34)
        variant = int(rng.integers(0, 10))
        base = f"https://site{site}.example"
        path = f"/p/{path_offset + i}"
        if variant == 0:
            url = f"https://www.site{site}.example{path}"
        elif variant == 1:
            url = f"{base}{path}/"
        elif variant == 2:
            url = f"{base}{path}#frag{i}"
        else:
            url = f"{base}{path}"

        n_words = max(5, int(rng.normal(mean_words, mean_words / 3)))
        words = rng.choice(vocab, size=n_words, p=probs)
        paras = []
        k = 0
        while k < n_words:
            plen = min(n_words - k, int(rng.integers(15, 60)))
            paras.append(" ".join(words[k: k + plen]))
            k += plen
        body = "".join(f"<p>{p}</p>" for p in paras)
        deco = int(rng.integers(0, 8))
        if deco == 0:
            body = "<script>function f(){return 1;}</script>" + body
        elif deco == 1:
            body = body + "<style>.x{display:none}</style>"
        expected = " ".join(" ".join(p.split()) for p in paras)
        # in-site nav links → a non-trivial link graph for M7 operators
        nav_parts = []
        if i > 0:
            nav_parts.append(f'<a href="/p/{path_offset + i - 1}">prev</a>')
        nav_parts.append(f'<a href="/p/{path_offset + i + 1}">next</a>')
        body = body + '<div class="nav">' + " ".join(nav_parts) + "</div>"
        expected = expected + (" prev next" if i > 0 else " next")
        lang = "ru" if rng.random() < 0.3 else "en"
        html = f"<html><head><title>page {i}</title></head><body>{body}</body></html>"
        add(url, html, expected, lang)

        # keep-latest duplicates: same (site, path), later warc_ts, new text
        if rng.random() < dup_fraction and row < n_pages:
            words2 = rng.choice(vocab, size=max(5, n_words // 2), p=probs)
            text2 = " ".join(words2)
            html2 = f"<html><head><title>page {i} v2</title></head><body><p>{text2}</p></body></html>"
            add(url, html2, text2, lang)
        i += 1

    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def write_pages_parquet(
    out_dir: str | Path,
    n_pages: int,
    n_sites: int = 3,
    seed: int = 42,
    shard_rows: int = 50_000,
    **kw,
) -> Path:
    """Write (cached) sharded pages parquet; returns the directory.

    Sharded so Ray gets read parallelism; each shard generated with a
    derived seed — deterministic and independent of shard count choice
    only via (seed, shard index), so keep shard_rows fixed per corpus.
    """
    out_dir = Path(out_dir)
    marker = out_dir / f".complete-{n_pages}-{n_sites}-{seed}-{shard_rows}"
    if marker.exists():
        return out_dir
    if out_dir.exists():
        import shutil

        shutil.rmtree(out_dir)
    out_dir.mkdir(parents=True)
    shard = 0
    remaining = n_pages
    while remaining > 0:
        n = min(shard_rows, remaining)
        tbl = generate_pages_table(
            n, n_sites=n_sites, seed=seed + 1000 * shard, path_offset=shard * shard_rows, **kw
        )
        pq.write_table(tbl, out_dir / f"pages-{shard:04d}.parquet")
        remaining -= n
        shard += 1
    marker.touch()
    return out_dir
