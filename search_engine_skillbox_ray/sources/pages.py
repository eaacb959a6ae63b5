"""Sources + corpus prep: Common-Crawl-style pages → deduped docs table.

Replaces the reference's live crawl (S1/S2, /root/reference/src/main/java/
searchengine/utils/PageIndexingUtils.java:35-40 and service/
IndexingServiceImpl.java:287-320) with a Parquet source per BASELINE.json
``input_hint``: ``pages(url, warc_ts, html:binary, text, lang)``.

Prep pipeline (all streaming, no full materialization):

1. ``PreparePages`` map_batches: normalize url (M4), site_id by root
   prefix (broadcast tiny site list — J1-style lookup, no shuffle),
   path (M5), extract text from ``html`` (M1) — extraction happens
   BEFORE the dedup shuffle so the exchange carries extracted text,
   not raw HTML (5-10× smaller payload);
2. keep-latest dedup on ``(site_id, path)`` by ``warc_ts`` — D1/D2
   semantics (model/PageEntity.java:8-9 unique constraint +
   utils/PageIndexingUtils.java:46-55 upsert; visited-set D2 at
   service/IndexingServiceImpl.java:288-292). Hash-shuffle groupby
   replaces the in-memory visited set; ties broken (warc_ts desc,
   url asc) for determinism;
3. docID assignment (deterministic url hash) + doc_len (token count).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from ..functions.extract import extract_text
from ..functions.urls import normalize_url
from ..stages.tokenizer import assign_doc_ids, token_counts

DOCS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("site_id", pa.int32()),
        ("url", pa.string()),
        ("path", pa.string()),
        ("text", pa.string()),
        ("doc_len", pa.int32()),
        ("lang", pa.string()),
    ]
)


def read_pages(path: str, columns: list[str] | None = None) -> rd.Dataset:
    """Column-pruned Parquet read of the pages corpus."""
    return rd.read_parquet(path, columns=columns)


def derive_sites(pages: rd.Dataset) -> list[dict]:
    """Derive the site dimension from page urls: one site per scheme://host
    (www-stripped). Small result — stand-in for the reference's YAML site
    config (S2, application.yml:11-16)."""
    import pyarrow.compute as pc

    def roots(batch: pa.Table) -> pa.Table:
        vals = {(_root_of(u)) for u in batch.column("url").to_pylist() if u}
        return pa.table({"root": pa.array(sorted(vals), type=pa.string())})

    uniq = sorted(pages.select_columns(["url"]).map_batches(roots, batch_format="pyarrow").unique("root"))
    from ..functions.urls import extract_site_name

    return [
        {"site_id": i, "url": r, "name": extract_site_name(r)} for i, r in enumerate(uniq)
    ]


def _root_of(url: str) -> str:
    u = normalize_url(url)
    for scheme in ("http://", "https://"):
        if u.startswith(scheme):
            rest = u[len(scheme):]
            return scheme + rest.split("/", 1)[0]
    return u.split("/", 1)[0]


class PreparePages:
    """Stage 1 of corpus prep (see module docstring). ``sites_ref`` is a
    ``ray.put`` handle to the site list — fetched once per actor."""

    def __init__(self, sites_ref, html_col: str = "html", use_text_col: bool = False) -> None:
        sites = ray.get(sites_ref) if not isinstance(sites_ref, list) else sites_ref
        self.site_urls = [normalize_url(s["url"]) for s in sites]
        self.site_ids = [int(s["site_id"]) for s in sites]
        self.html_col = html_col
        self.use_text_col = use_text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = [normalize_url(u) for u in batch.column("url").to_pylist()]
        site_ids = np.full(len(urls), -1, dtype=np.int32)
        paths = []
        for i, u in enumerate(urls):
            sid, spath = -1, u
            for j, root in enumerate(self.site_urls):
                if u.startswith(root):
                    sid = self.site_ids[j]
                    p = u[len(root):]
                    spath = p if p else "/"
                    break
            site_ids[i] = sid
            paths.append(spath)

        if self.use_text_col and "text" in batch.column_names:
            texts = batch.column("text").to_pylist()
        else:
            texts = [extract_text(h) if h is not None else "" for h in batch.column(self.html_col).to_pylist()]

        cols: dict[str, pa.Array] = {
            "url": pa.array(urls, type=pa.string()),
            "site_id": pa.array(site_ids, type=pa.int32()),
            "path": pa.array(paths, type=pa.string()),
            "text": pa.array(texts, type=pa.string()),
        }
        for extra in ("warc_ts", "lang"):
            if extra in batch.column_names:
                cols[extra] = batch.column(extra)
        return pa.table(cols)


def _keep_latest_bucket(bucket: "pd.DataFrame") -> "pd.DataFrame":
    """Vectorized keep-latest over a whole hash bucket of (site, path)
    keys: sort (warc_ts desc, url asc) then drop_duplicates keeps the
    winner per key — one pandas call for thousands of keys."""
    import pandas as pd  # noqa: F401

    by = ["warc_ts", "url"] if "warc_ts" in bucket.columns else ["url"]
    asc = [False, True] if "warc_ts" in bucket.columns else [True]
    return bucket.sort_values(by, ascending=asc, kind="mergesort").drop_duplicates(
        ["site_id", "path"], keep="first"
    )


def finalize_docs(batch: pa.Table) -> pa.Table:
    """doc_id + doc_len; projects to DOCS_SCHEMA."""
    doc_ids = assign_doc_ids(batch.column("url"))
    doc_len = token_counts(batch.column("text"))
    lang = (
        batch.column("lang")
        if "lang" in batch.column_names
        else pa.array([""] * len(batch), type=pa.string())
    )
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, type=pa.int64()),
            "site_id": batch.column("site_id"),
            "url": batch.column("url"),
            "path": batch.column("path"),
            "text": batch.column("text"),
            "doc_len": pa.array(doc_len, type=pa.int32()),
            "lang": lang,
        }
    )


def prepare_docs(
    pages: rd.Dataset,
    sites: list[dict],
    *,
    dedup: bool = True,
    use_text_col: bool = False,
    concurrency: int | tuple[int, int] = (1, 8),
) -> rd.Dataset:
    """pages → docs Dataset (see module docstring). Lazy / streaming."""
    from ..stages.grouping import bucketed_group_apply

    sites_ref = ray.put(sites)
    ds = pages.map_batches(
        PreparePages,
        fn_constructor_args=(sites_ref,),
        fn_constructor_kwargs={"use_text_col": use_text_col},
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    if dedup:
        ds = bucketed_group_apply(ds, ["site_id", "path"], _keep_latest_bucket, n_buckets=64)
    return ds.map_batches(finalize_docs, batch_format="pyarrow")


def docs_from_documents(documents: rd.Dataset, sources: list[str]) -> rd.Dataset:
    """Adapter: the driver's ``documents(doc_id, text, lang, source,
    n_chars)`` testdata table → docs schema. ``source`` plays the site
    role (sorted order defines site_id, deterministic)."""
    src_to_id = {s: i for i, s in enumerate(sorted(sources))}

    def conv(batch: pa.Table) -> pa.Table:
        srcs = batch.column("source").to_pylist()
        site_ids = np.fromiter((src_to_id[s] for s in srcs), dtype=np.int32, count=len(srcs))
        doc_ids = batch.column("doc_id")
        paths = pa.array([f"/doc/{d}" for d in doc_ids.to_pylist()], type=pa.string())
        urls = pa.array(
            [f"https://{s}.example/doc/{d}" for s, d in zip(srcs, doc_ids.to_pylist())],
            type=pa.string(),
        )
        return pa.table(
            {
                "doc_id": doc_ids,
                "site_id": pa.array(site_ids, type=pa.int32()),
                "url": urls,
                "path": paths,
                "text": batch.column("text"),
                "doc_len": pa.array(token_counts(batch.column("text")), type=pa.int32()),
                "lang": batch.column("lang"),
            }
        )

    return documents.map_batches(conv, batch_format="pyarrow")


def sites_for_sources(sources: list[str]) -> list[dict]:
    return [
        {"site_id": i, "url": f"https://{s}.example", "name": s.capitalize()}
        for i, s in enumerate(sorted(sources))
    ]
