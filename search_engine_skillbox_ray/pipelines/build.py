"""End-to-end index build pipeline (SURVEY §7.1 steps 2-6).

Ray-Data-first restatement of the reference crawl+index lifecycle
(/root/reference/src/main/java/searchengine/service/IndexingServiceImpl.java:
42-78, 287-343 — 4 crawl threads writing row-at-a-time into MySQL):

  read_parquet(pages) → PreparePages (extract, M1) → keep-latest dedup
  → finalize (docID, doc_len) → write docs/ → TokenizeExplode actor pool
  (M2/M3) → AssignPartitions (bucket + Zipf salt) → groupby(bucket, salt)
  encode partials → groupby(bucket) merge + atomic segment write.

Everything before a sink is lazy; the streaming executor pipelines the
stages with backpressure. The driver never materializes the corpus —
only vocabulary-sized and bucket-count-sized results.

Resume: per-partition markers (state/manifest.py); completed buckets are
filtered out BEFORE the shuffle.
"""

from __future__ import annotations

import json
import shutil
import time
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from ..sources.pages import DOCS_SCHEMA, docs_from_documents, prepare_docs, sites_for_sources
from ..stages.postings import BucketSegmentWriter, encode_partial_group
from ..stages.tokenizer import TokenizeExplode
from ..state.manifest import BuildManifest, atomic_write_json, fingerprint_inputs


@dataclass
class BuildConfig:
    n_buckets: int = 16
    block_size: int = 128
    # Zipf-head salting: a term whose estimated df exceeds the threshold is
    # split into ceil(df_est / salt_target) salted partitions (SURVEY §7.3).
    heavy_df_threshold: int = 100_000
    salt_target: int = 50_000
    max_salts: int = 64
    sample_fraction: float = 0.02
    sample_max_docs: int = 20_000
    tokenize_concurrency: tuple[int, int] | int = (1, 16)
    tokenize_batch_size: int = 1024
    prep_concurrency: tuple[int, int] | int = (1, 16)
    dedup: bool = True
    use_text_col: bool = False
    extra_fingerprint: dict = field(default_factory=dict)

    def params(self) -> dict:
        return {
            "n_buckets": self.n_buckets,
            "block_size": self.block_size,
            "heavy_df_threshold": self.heavy_df_threshold,
            "salt_target": self.salt_target,
            "dedup": self.dedup,
            "use_text_col": self.use_text_col,
            **self.extra_fingerprint,
        }


@dataclass
class BuildResult:
    index_dir: str
    n_docs: int
    n_postings: int
    n_terms: int
    n_buckets_built: int
    n_buckets_skipped: int
    seconds: float
    stats: dict


def estimate_heavy_terms(docs: rd.Dataset, cfg: BuildConfig) -> dict[str, int]:
    """Sampled df estimate → {term: n_salts} for Zipf-head terms only.

    Sampling (seeded, deterministic for a fixed block layout) keeps the
    prepass from re-reading the corpus; salting is a performance hint, so
    an approximate df is fine — correctness never depends on it (the
    merge step is salt-agnostic).
    """
    if cfg.sample_fraction <= 0:
        return {}
    sample = docs.random_sample(cfg.sample_fraction, seed=42).limit(cfg.sample_max_docs)
    exploded = sample.map_batches(
        TokenizeExplode, batch_format="pyarrow", concurrency=(1, 2), batch_size=cfg.tokenize_batch_size
    )
    df_tbl = exploded.groupby("term").count()
    pdf = df_tbl.to_pandas()  # vocabulary-of-sample sized
    if not len(pdf):
        return {}
    scale = 1.0 / max(cfg.sample_fraction, 1e-9)
    est = pdf["count()"].to_numpy() * scale
    heavy = pdf["term"].to_numpy()[est > cfg.heavy_df_threshold]
    est_h = est[est > cfg.heavy_df_threshold]
    return {
        t: int(min(cfg.max_salts, max(2, np.ceil(e / cfg.salt_target))))
        for t, e in zip(heavy, est_h)
    }


def build_index_from_docs(
    docs: rd.Dataset,
    index_dir: str | Path,
    sites: list[dict],
    cfg: BuildConfig | None = None,
    *,
    input_token: str = "",
) -> BuildResult:
    """Build the inverted index from a docs-schema Dataset.

    ``input_token`` feeds the resume fingerprint — pass something that
    identifies the input (e.g. the source parquet path); builds with a
    different token invalidate each other's partition markers.
    """
    cfg = cfg or BuildConfig()
    t0 = time.perf_counter()
    index_dir = Path(index_dir)
    index_dir.mkdir(parents=True, exist_ok=True)
    fp = fingerprint_inputs([], {"input": input_token, **cfg.params()})
    manifest = BuildManifest(index_dir, fp)

    # Fast path: everything already built for this fingerprint → no Ray
    # jobs at all (callers re-entering for the same input, e.g. query
    # helpers sharing one index, pay nothing).
    done_early = manifest.completed_buckets()
    stats_path = index_dir / "stats.json"
    if (
        manifest.docs_done()
        and len(done_early) == cfg.n_buckets
        and stats_path.exists()
    ):
        stats = json.loads(stats_path.read_text())
        mf = json.loads((index_dir / "manifest.json").read_text()) if (index_dir / "manifest.json").exists() else {}
        metrics = mf.get("metrics", {})
        return BuildResult(
            index_dir=str(index_dir),
            n_docs=int(stats["n_docs"]),
            n_postings=int(metrics.get("n_postings", 0)),
            n_terms=int(metrics.get("n_terms", 0)),
            n_buckets_built=0,
            n_buckets_skipped=len(done_early),
            seconds=time.perf_counter() - t0,
            stats=stats,
        )

    docs_dir = index_dir / "docs"
    if not manifest.docs_done():
        if docs_dir.exists():
            shutil.rmtree(docs_dir)
        docs.write_parquet(str(docs_dir))
        manifest.mark_docs_done({"dir": "docs"})

    docs_on_disk = rd.read_parquet(str(docs_dir))

    # -- corpus statistics (A3/A7): tiny grouped aggregates ------------
    def _doc_stats(batch: pa.Table) -> pa.Table:
        indexed = pc.cast(pc.greater(batch["doc_len"], 0), pa.int64())
        return pa.table(
            {
                "site_id": batch["site_id"],
                "one": pa.array(np.ones(len(batch), dtype=np.int64)),
                "indexed": indexed,
                "doc_len64": pc.cast(batch["doc_len"], pa.int64()),
            }
        )

    stats_pdf = (
        docs_on_disk.select_columns(["site_id", "doc_len"])
        .map_batches(_doc_stats, batch_format="pyarrow")
        .groupby("site_id")
        .sum(["one", "indexed", "doc_len64"])
        .to_pandas()
    )
    site_stats = {
        int(r["site_id"]): {
            "n_docs": int(r["sum(one)"]),
            "n_docs_indexed": int(r["sum(indexed)"]),
            "sum_doc_len": int(r["sum(doc_len64)"]),
        }
        for _, r in stats_pdf.iterrows()
    }
    n_docs = sum(s["n_docs"] for s in site_stats.values())
    stats = {
        "sites": sites,
        "site_stats": site_stats,
        "n_docs": n_docs,
        "n_docs_indexed": sum(s["n_docs_indexed"] for s in site_stats.values()),
        "sum_doc_len": sum(s["sum_doc_len"] for s in site_stats.values()),
        "n_buckets": cfg.n_buckets,
        "block_size": cfg.block_size,
    }
    atomic_write_json(index_dir / "stats.json", stats)

    # -- salting prepass ------------------------------------------------
    heavy = estimate_heavy_terms(docs_on_disk.select_columns(["doc_id", "site_id", "text"]), cfg)
    heavy_ref = [ray.put(heavy)]  # list-wrapped: keep the ref un-inlined

    # -- the wide step ---------------------------------------------------
    done = manifest.completed_buckets()
    exploded = docs_on_disk.select_columns(["doc_id", "site_id", "text"]).map_batches(
        TokenizeExplode,
        fn_constructor_kwargs={"n_buckets": cfg.n_buckets, "heavy_ref": heavy_ref},
        batch_format="pyarrow",
        concurrency=cfg.tokenize_concurrency,
        batch_size=cfg.tokenize_batch_size,
    )
    if done:
        done_arr = pa.array(sorted(done), type=pa.int32())
        exploded = exploded.map_batches(
            lambda t, d=done_arr: t.filter(pc.invert(pc.is_in(t["bucket"], value_set=d))),
            batch_format="pyarrow",
        )

    partials = exploded.groupby(["bucket", "salt"]).map_groups(
        encode_partial_group, batch_format="pyarrow"
    )
    writer = BucketSegmentWriter(str(manifest.postings_dir), fp)

    def write_bucket(group: pa.Table) -> pa.Table:
        return writer(group)

    results = partials.groupby("bucket").map_groups(write_bucket, batch_format="pyarrow")
    res_tbl = results.to_pandas()  # one row per bucket — tiny

    seconds = time.perf_counter() - t0
    n_terms = int(res_tbl["n_terms"].sum()) if len(res_tbl) else 0
    n_postings = int(res_tbl["n_postings"].sum()) if len(res_tbl) else 0
    manifest.write_final(
        {
            "stats": stats,
            "heavy_terms": {k: int(v) for k, v in heavy.items()},
            "buckets_built": sorted(int(b) for b in res_tbl["bucket"]) if len(res_tbl) else [],
            "buckets_skipped": sorted(done),
            "metrics": {
                "n_docs": n_docs,
                "n_terms": n_terms,
                "n_postings": n_postings,
                "build_seconds": seconds,
                "docs_per_sec": (n_docs / seconds) if seconds > 0 else None,
            },
        }
    )
    return BuildResult(
        index_dir=str(index_dir),
        n_docs=n_docs,
        n_postings=n_postings,
        n_terms=n_terms,
        n_buckets_built=len(res_tbl),
        n_buckets_skipped=len(done),
        seconds=seconds,
        stats=stats,
    )


def build_index_from_pages(
    pages: rd.Dataset,
    index_dir: str | Path,
    sites: list[dict],
    cfg: BuildConfig | None = None,
    *,
    input_token: str = "",
) -> BuildResult:
    cfg = cfg or BuildConfig()
    docs = prepare_docs(
        pages,
        sites,
        dedup=cfg.dedup,
        use_text_col=cfg.use_text_col,
        concurrency=cfg.prep_concurrency,
    )
    return build_index_from_docs(docs, index_dir, sites, cfg, input_token=input_token)


def build_index_from_documents_table(
    documents: rd.Dataset,
    index_dir: str | Path,
    cfg: BuildConfig | None = None,
    *,
    input_token: str = "",
) -> BuildResult:
    """Build over the driver's testdata ``documents`` table (source≙site)."""
    sources = sorted(documents.unique("source"))
    sites = sites_for_sources(sources)
    docs = docs_from_documents(documents, sources)
    return build_index_from_docs(docs, index_dir, sites, cfg, input_token=input_token)
