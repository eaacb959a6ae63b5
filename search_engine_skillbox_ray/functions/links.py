"""Link extraction + in-site frontier filter (M7).

Reference: /root/reference/src/main/java/searchengine/utils/UrlUtils.java:62-107
(``crawlLinks``) + link selection ``doc.select("a[href]")`` at
service/IndexingServiceImpl.java:336. The live BFS frontier is out of
scope for the Parquet corpus (BASELINE input_hint), but the SEMANTICS
survive as a corpus-prep / link-graph operator:

* collect ``a[href]`` values from the raw HTML;
* skip empty, ``javascript:``, ``mailto:`` and bare ``#``;
* absolutize against the page url (Jsoup ``absUrl``);
* normalize (M4);
* keep only urls prefixed by the page's normalized site root;
* de-duplicate per page (the visited-set becomes a groupby at scale).

``extract_links_ds`` exposes it as a Dataset stage producing the in-site
link graph ``(src_url, dst_url)`` — the input to frontier discovery,
PageRank-ish scoring, or crawl-completeness checks.
"""

from __future__ import annotations

from html.parser import HTMLParser
from urllib.parse import urljoin

import pyarrow as pa

from .extract import decode_html
from .urls import normalize_url


class _HrefCollector(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.hrefs: list[str] = []

    def handle_starttag(self, tag: str, attrs) -> None:  # noqa: ANN001
        if tag == "a":
            for name, value in attrs:
                if name == "href" and value is not None:
                    self.hrefs.append(value)


def extract_links(html: str | bytes, page_url: str, site_url: str) -> list[str]:
    """In-site outgoing links of one page, normalized, first-occurrence
    de-duplicated (crawlLinks semantics)."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = decode_html(bytes(html))
    parser = _HrefCollector()
    try:
        parser.feed(html)
        parser.close()
    except Exception:
        pass
    site_norm = normalize_url(site_url)
    out: list[str] = []
    seen: set[str] = set()
    for href in parser.hrefs:
        if not href or href.startswith("javascript:") or href.startswith("mailto:") or href == "#":
            continue
        abs_url = urljoin(page_url, href)
        if not abs_url or abs_url == "#":
            continue
        nu = normalize_url(abs_url)
        if not nu.startswith(site_norm):
            continue  # внешняя ссылка — skipped like the reference
        if nu not in seen:
            seen.add(nu)
            out.append(nu)
    return out


def extract_links_batch(batch: pa.Table, sites: list[dict]) -> pa.Table:
    """map_batches body → exploded (src_url, dst_url) link-graph rows."""
    from .urls import site_of_url

    site_urls = [s["url"] for s in sites]
    srcs: list[str] = []
    dsts: list[str] = []
    for url, html in zip(batch.column("url").to_pylist(), batch.column("html").to_pylist()):
        sid = site_of_url(url, site_urls)
        if sid < 0 or html is None:
            continue
        for dst in extract_links(html, url, site_urls[sid]):
            srcs.append(normalize_url(url))
            dsts.append(dst)
    return pa.table(
        {"src_url": pa.array(srcs, pa.string()), "dst_url": pa.array(dsts, pa.string())}
    )


def extract_links_ds(pages, sites: list[dict]):
    """pages Dataset → in-site link graph (src_url, dst_url)."""
    return pages.map_batches(
        lambda b: extract_links_batch(b, sites), batch_format="pyarrow"
    )
