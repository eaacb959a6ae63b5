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

from pathlib import Path

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


def read_pages(path: str, columns: list[str] | None = None, fmt: str = "parquet") -> rd.Dataset:
    """Read the pages corpus; Parquet (column-pruned) is the primary
    format per BASELINE input_hint, JSONL/CSV accepted for interop
    (their readers cannot prune columns — project after the read)."""
    if fmt == "parquet":
        return rd.read_parquet(path, columns=columns)
    if fmt in ("json", "jsonl"):
        ds = rd.read_json(path)
    elif fmt == "csv":
        ds = rd.read_csv(path)
    else:
        raise ValueError(f"unsupported pages format: {fmt}")
    return ds.select_columns(columns) if columns else ds


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
    """Stage 1 of corpus prep (see module docstring) — a STATELESS task
    stage (SURVEY §7.2 maps M1 extraction to tasks, not actors): the
    instance carries only the tiny site list, pickled per task; elastic
    task scheduling lets extraction share CPUs with the tokenizer actor
    pool inside the fused build job instead of deadlocking on pool
    reservations."""

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


def compute_dup_winners(
    pages: rd.Dataset | str, sites: list[dict], n_buckets: int = 64
) -> dict[tuple[int, str], tuple[int, str]]:
    """Key-only dedup prepass: → {(site_id, path): (winner_ts_us, winner_url)}
    for keys that appear MORE THAN ONCE.

    Reads only (url, warc_ts) — column-pruned, no html/text ever enters
    this shuffle — and returns a driver-side winner map for just the
    conflicted keys, which the main extraction pass applies as a
    broadcast filter. This keeps the corpus-sized text stream entirely
    shuffle-free: the only all-to-all in docs prep moves a few bytes per
    page. Scale assumption (documented): conflicted keys are a small
    fraction of the corpus (true for crawl snapshots); if they were not,
    swap the exact map for a Bloom filter of dup keys + the grouped
    keep-latest path.
    """
    from ..stages.grouping import bucketed_group_apply

    if isinstance(pages, str):
        # explicit pruned read: Ray's select_columns does NOT push the
        # projection into the Parquet scan — columns= does
        import pyarrow.parquet as _pq

        have = _pq.read_schema(next(iter(sorted(Path(pages).glob("*.parquet"))))).names
        cols = [c for c in ("url", "warc_ts") if c in have]
        pages = rd.read_parquet(pages, columns=cols)
    else:
        cols = [c for c in ("url", "warc_ts") if c in pages.schema().names]
    norm_roots = [(int(s["site_id"]), normalize_url(s["url"])) for s in sites]

    def keys_batch(batch: pa.Table) -> pa.Table:
        urls = [normalize_url(u) for u in batch.column("url").to_pylist()]
        site_ids = np.full(len(urls), -1, dtype=np.int32)
        paths = []
        for i, u in enumerate(urls):
            spath = u
            for sid, root in norm_roots:
                if u.startswith(root):
                    site_ids[i] = sid
                    p = u[len(root):]
                    spath = p if p else "/"
                    break
            paths.append(spath)
        out = {
            "site_id": pa.array(site_ids, pa.int32()),
            "path": pa.array(paths, pa.string()),
            "url": pa.array(urls, pa.string()),
        }
        if "warc_ts" in batch.column_names:
            out["ts_us"] = pa.compute.cast(batch.column("warc_ts"), pa.int64())
        else:
            out["ts_us"] = pa.array(np.zeros(len(urls), dtype=np.int64))
        return pa.table(out)

    def dup_winners_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        dup_mask = bucket.duplicated(["site_id", "path"], keep=False)
        dups = bucket[dup_mask]
        if not len(dups):
            # dtypes MUST match the non-empty branch — mismatched empty
            # frames force Ray into schema-re-inference slow paths
            return pd.DataFrame(
                {
                    "site_id": np.array([], dtype=np.int32),
                    "path": pd.Series([], dtype=object),
                    "ts_us": np.array([], dtype=np.int64),
                    "url": pd.Series([], dtype=object),
                }
            )
        return (
            dups.sort_values(["ts_us", "url"], ascending=[False, True], kind="mergesort")
            .drop_duplicates(["site_id", "path"], keep="first")[["site_id", "path", "ts_us", "url"]]
        )

    keys = pages.map_batches(keys_batch, batch_format="pyarrow")

    # Driver fast path: the key table is tiny relative to the corpus
    # (~40 B/page); below the threshold, collect it and find winners with
    # one vectorized pandas pass — no shuffle at all. The bucketed
    # shuffle path below is the >5M-page (cluster) shape.
    n_rows_est = pages.count()
    if n_rows_est <= 5_000_000:
        tables = [t for t in (ray.get(r) for r in keys.to_arrow_refs()) if len(t)]
        if not tables:
            return {}
        kdf = pa.concat_tables(tables).to_pandas()
        winners_df = dup_winners_bucket(kdf)
        return {
            (int(r.site_id), r.path): (int(r.ts_us), r.url)
            for r in winners_df.itertuples()
        }

    winners = bucketed_group_apply(keys, ["site_id", "path"], dup_winners_bucket, n_buckets=n_buckets)
    out: dict[tuple[int, str], tuple[int, str]] = {}
    for row in winners.take_all():
        out[(int(row["site_id"]), row["path"])] = (int(row["ts_us"]), row["url"])
    return out


def apply_dup_filter(batch: pa.Table, winners: dict) -> pa.Table:
    """Keep rows that are not conflicted, or ARE their key's winner."""
    if not winners:
        return batch
    site_ids = batch.column("site_id").to_pylist()
    paths = batch.column("path").to_pylist()
    urls = batch.column("url").to_pylist()
    if "warc_ts" in batch.column_names:
        ts = pa.compute.cast(batch.column("warc_ts"), pa.int64()).to_pylist()
    else:
        ts = [0] * len(urls)
    keep = np.ones(len(urls), dtype=bool)
    for i, (sid, p) in enumerate(zip(site_ids, paths)):
        w = winners.get((sid, p))
        if w is not None and (ts[i], urls[i]) != w:
            keep[i] = False
    return batch.filter(pa.array(keep))


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
    pages_path: str | None = None,
    drop_unmatched: bool = True,
) -> rd.Dataset:
    """pages → docs Dataset (see module docstring). Lazy / streaming.

    Pass ``pages_path`` when the dataset came from Parquet: the dedup
    key prepass then re-reads ONLY (url, warc_ts) — a column-pruned
    scan — instead of decoding the html column a second time."""
    winners_ref = None
    if dedup:
        # key-only prepass (no text in the shuffle), then broadcast filter
        winners = compute_dup_winners(pages_path or pages, sites)
        winners_ref = ray.put(winners)
    prep = PreparePages(sites, use_text_col=use_text_col)
    ds = pages.map_batches(prep, batch_format="pyarrow")
    if drop_unmatched:
        # reference crawler never indexes pages outside the configured
        # sites (IndexingServiceImpl.java:183-195 url-prefix match)
        import pyarrow.compute as _pc

        ds = ds.map_batches(
            lambda t: t.filter(_pc.greater_equal(t["site_id"], 0)),
            batch_format="pyarrow",
        )
    if dedup and winners_ref is not None:

        def filt(batch: pa.Table, _ref=[winners_ref]) -> pa.Table:
            w = ray.get(_ref[0])
            return apply_dup_filter(batch, w)

        ds = ds.map_batches(filt, batch_format="pyarrow")
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
