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
import os
import shutil
import time
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data as rd

from ..sources.pages import DOCS_SCHEMA, docs_from_documents, prepare_docs, sites_for_sources
from ..stages.postings import BucketSegmentWriter, WriteDocsShard, merge_segment_rows
from ..stages.tokenizer import TokenizeExplode
from ..state.manifest import BuildManifest, atomic_write_json, fingerprint_inputs


# bump when on-disk layout or id/hash semantics change — invalidates
# resume markers of indexes built by older code
INDEX_FORMAT_VERSION = 2

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
    # larger combiner batches → longer (term, site) runs → fewer partial
    # rows in the shuffle (~30% lighter exchange at 2k-row input blocks)
    tokenize_batch_size: int = 4096
    prep_concurrency: tuple[int, int] | int = (1, 16)
    dedup: bool = True
    use_text_col: bool = False
    # two-level merge: pre-merge partials per (bucket, salt) before the
    # final bucket merge. OFF by default: the single-level merge handles
    # salted partials correctly; enable at extreme scale where one
    # bucket's partials exceed a worker's heap
    two_level_merge: bool = False
    # coalesce map-output blocks before the groupby shuffle. None (the
    # measured default) skips the extra all-to-all barrier — at 192k
    # pages / 16 CPUs the repartition COST ~14s of wall against a
    # sort-groupby that handles ~150 map blocks fine. Set an int when
    # the map stage emits thousands of tiny blocks (sort's partition
    # matrix grows with input block count)
    coalesce_blocks: int | None = None  # 0 → auto (max(32, n_buckets))
    # ST1 morphology model: path to a lemma_model.json built by
    # functions/lemmatize.build_lemma_model. Tokenizer actors load it
    # once each in __init__; build_index copies it into the index dir
    # so SearchEngine applies the SAME map to query terms.
    lemma_model: str | None = None
    extra_fingerprint: dict = field(default_factory=dict)

    def params(self) -> dict:
        return {
            "format_version": INDEX_FORMAT_VERSION,
            "n_buckets": self.n_buckets,
            "block_size": self.block_size,
            "heavy_df_threshold": self.heavy_df_threshold,
            "salt_target": self.salt_target,
            "dedup": self.dedup,
            "use_text_col": self.use_text_col,
            # fingerprint the model CONTENT, not its path: a changed
            # rule table must invalidate resume markers
            "lemma_model_hash": (
                None
                if self.lemma_model is None
                else __import__("hashlib").md5(
                    Path(self.lemma_model).read_bytes()
                ).hexdigest()
            ),
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


def estimate_heavy_terms_from_dir(docs_dir: Path, n_total_docs: int, cfg: BuildConfig) -> dict[str, int]:
    """Sampled df estimate → {term: n_salts} for Zipf-head terms only.

    Driver-side: reads a deterministic subset of the docs shards
    (column-pruned to ``text``) and counts per-term document frequency
    with Arrow kernels — no Ray job, no extra pass over the corpus.
    Salting is a performance hint, so an approximate df is fine —
    correctness never depends on it (the merge step is salt-agnostic).
    At cluster scale this becomes a handful of shard reads on the
    driver; the shard subset is fixed by sorted order, so the estimate
    is deterministic across runs and cluster sizes.
    """
    import pyarrow.parquet as pq

    from ..stages.tokenizer import token_lists

    if cfg.sample_fraction <= 0:
        return {}
    files = sorted(p for p in Path(docs_dir).glob("*.parquet"))
    if not files:
        return {}
    want_docs = min(cfg.sample_max_docs, max(256, int(n_total_docs * cfg.sample_fraction)))
    sampled = 0
    term_df: dict[str, int] = {}
    for f in files:
        if sampled >= want_docs:
            break
        tbl = pq.read_table(f, columns=["text"])
        take = min(len(tbl), want_docs - sampled)
        lists = token_lists(tbl["text"].slice(0, take))
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        for row in lists.to_pylist():
            for t in set(row):
                if t:
                    term_df[t] = term_df.get(t, 0) + 1
        sampled += take
    if sampled == 0:
        return {}
    scale = n_total_docs / sampled
    out: dict[str, int] = {}
    for t, df in term_df.items():
        est = df * scale
        if est > cfg.heavy_df_threshold:
            out[t] = int(min(cfg.max_salts, max(2, np.ceil(est / cfg.salt_target))))
    return out


def _heavy_from_texts(texts: list[str], n_total_docs: int, cfg: BuildConfig) -> dict[str, int]:
    """{term: n_salts} from a driver-side text sample (see estimate_heavy_terms_from_dir)."""
    from ..stages.tokenizer import token_lists

    if not texts:
        return {}
    lists = token_lists(pa.array(texts, pa.string()))
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    term_df: dict[str, int] = {}
    for row in lists.to_pylist():
        for t in set(row):
            if t:
                term_df[t] = term_df.get(t, 0) + 1
    scale = max(1.0, n_total_docs / len(texts))
    out: dict[str, int] = {}
    for t, df in term_df.items():
        est = df * scale
        if est > cfg.heavy_df_threshold:
            out[t] = int(min(cfg.max_salts, max(2, np.ceil(est / cfg.salt_target))))
    return out


def _sample_texts(docs: rd.Dataset, sample_source: str | None, want: int) -> list[str]:
    """Deterministic text sample for the salting estimate.

    Prefer reading the first sorted shards of ``sample_source`` (a
    Parquet path with a text column) — block-order independent, so the
    8- and 32-CPU scaling runs salt identically. Fall back to
    ``docs.limit()`` (order depends on block arrival; salting is
    perf-only, so correctness is unaffected)."""
    if sample_source:
        import pyarrow.parquet as pq

        files = sorted(Path(sample_source).glob("*.parquet"))
        texts: list[str] = []
        for f in files:
            if len(texts) >= want:
                break
            schema = pq.read_schema(f)
            if "text" in schema.names:
                texts.extend(pq.read_table(f, columns=["text"])["text"].to_pylist())
            else:
                break
        if texts:
            return texts[:want]
    if docs is None:
        return []
    return [r["text"] for r in docs.limit(want).take_all()]


def _discover_input_files(*candidates: str | None) -> list[str]:
    """Best-effort input file list for the resume fingerprint: the
    parquet files under the first candidate that is an existing path."""
    for c in candidates:
        if not c:
            continue
        p = Path(c)
        if p.is_dir():
            files = sorted(str(f) for f in p.glob("*.parquet"))
            if files:
                return files
        elif p.is_file():
            return [str(p)]
    return []


def build_index_from_docs(
    docs: rd.Dataset,
    index_dir: str | Path,
    sites: list[dict],
    cfg: BuildConfig | None = None,
    *,
    input_token: str = "",
    n_docs_hint: int | None = None,
    sample_source: str | None = None,
    input_files: list[str | Path] | None = None,
    heavy_precomputed=None,  # dict, or an ObjectRef resolving to one
    stats_extra=None,
) -> BuildResult:
    """Build the inverted index from a docs-schema Dataset.

    ``input_token`` feeds the resume fingerprint — pass something that
    identifies the input (e.g. the source parquet path); builds with a
    different token invalidate each other's partition markers.
    ``input_files`` (or, when absent, the parquet files found under
    ``sample_source``/``input_token`` if either is a path) are hashed by
    (path, size, mtime) so CHANGED source data invalidates stale resume
    markers instead of silently reusing them.
    """
    cfg = cfg or BuildConfig()
    t0 = time.perf_counter()
    index_dir = Path(index_dir)
    index_dir.mkdir(parents=True, exist_ok=True)
    fp_files = [str(f) for f in (input_files or _discover_input_files(sample_source, input_token))]
    fp = fingerprint_inputs(fp_files, {"input": input_token, **cfg.params()})
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

    phases: dict[str, float] = {}
    t_ph = time.perf_counter()

    def _mark(name: str) -> None:
        nonlocal t_ph
        phases[name] = round(time.perf_counter() - t_ph, 3)
        t_ph = time.perf_counter()

    # An actual (re)build supersedes any update log from a previous
    # index lifetime: stale tombstones / kill map / delta segments must
    # not overlay the fresh segments (docIDs may even be reassigned).
    # The fast path above returns BEFORE this, so "already built, then
    # mutated" indexes keep their updates.
    if (index_dir / "tombstones.json").exists():
        (index_dir / "tombstones.json").unlink()
    if (index_dir / "postings_delta").exists():
        shutil.rmtree(index_dir / "postings_delta")
    if cfg.lemma_model is None and (index_dir / "lemma_model.json").exists():
        # rebuild without a model must not leave the old one behind —
        # the engine would keep lemmatizing queries against raw postings
        (index_dir / "lemma_model.json").unlink()

    docs_dir = index_dir / "docs"
    docs_already = manifest.docs_done()
    done = manifest.completed_buckets()
    import pyarrow.parquet as pq

    # -- salting estimate (driver-side sample, no extra corpus pass) ----
    heavy_is_ref = heavy_precomputed is not None and not isinstance(heavy_precomputed, dict)
    if heavy_precomputed is not None:
        # an ObjectRef is passed straight into the tokenizer actors
        # (resolved in their __init__) — the driver never blocks on it
        heavy = heavy_precomputed
        if not docs_already and docs_dir.exists():
            shutil.rmtree(docs_dir)
    elif docs_already:
        n_known = sum(pq.read_metadata(f).num_rows for f in Path(docs_dir).glob("*.parquet"))
        heavy = estimate_heavy_terms_from_dir(docs_dir, n_known, cfg)
    else:
        if docs_dir.exists():
            shutil.rmtree(docs_dir)
        want = min(cfg.sample_max_docs, max(256, int((n_docs_hint or 50_000) * cfg.sample_fraction)))
        texts = _sample_texts(docs, sample_source, want)
        heavy = _heavy_from_texts(texts, n_docs_hint or len(texts), cfg)
    if heavy_is_ref:
        if cfg.two_level_merge:
            heavy = ray.get(heavy)  # needed driver-side only for this mode
            heavy_is_ref = False
            heavy_ref = [ray.put(heavy)]
        else:
            heavy_ref = [heavy]
    else:
        heavy_ref = [ray.put(heavy)]  # list-wrapped: keep the ref un-inlined
    _mark("heavy_sample")

    # -- THE build job: one fused streaming pipeline --------------------
    # (docs shard sink is a pass-through stage, so extraction, persisting
    # the docs table, tokenization+combining, the partial shuffle and the
    # segment merge all overlap under backpressure — no barrier, no
    # re-read of the corpus)
    tok_kwargs = {
        "n_buckets": cfg.n_buckets,
        "heavy_ref": heavy_ref,
        "emit_partials": True,
    }
    if cfg.lemma_model is not None:
        # persist the model INTO the index (self-contained artifact: the
        # query engine and any rebuild read the index's own copy) and
        # point the tokenizer actors at that copy
        model_copy = index_dir / "lemma_model.json"
        if Path(cfg.lemma_model).resolve() != model_copy.resolve():
            shutil.copyfile(cfg.lemma_model, model_copy)
        tok_kwargs["lemma_model"] = str(model_copy)
    if docs_already:
        partials = rd.read_parquet(
            str(docs_dir), columns=["doc_id", "site_id", "text"]
        ).map_batches(
            TokenizeExplode,
            fn_constructor_kwargs=tok_kwargs,
            batch_format="pyarrow",
            concurrency=cfg.tokenize_concurrency,
            batch_size=cfg.tokenize_batch_size,
        )
    else:
        shard_writer = WriteDocsShard(str(docs_dir))
        # NOTE: no batch_size here — Ray fuses this whole map chain into
        # the tokenizer actor pool, so the FIRST stage's batch size sets
        # the task granularity of the entire fused operator; block-sized
        # batches keep parallelism at the input block count
        partials = docs.map_batches(
            shard_writer, batch_format="pyarrow"
        ).map_batches(
            TokenizeExplode,
            fn_constructor_kwargs=tok_kwargs,
            batch_format="pyarrow",
            concurrency=cfg.tokenize_concurrency,
            batch_size=cfg.tokenize_batch_size,
        )
    if done:
        done_arr = pa.array(sorted(done), type=pa.int32())
        partials = partials.map_batches(
            lambda t, d=done_arr: t.filter(pc.invert(pc.is_in(t["bucket"], value_set=d))),
            batch_format="pyarrow",
        )

    # coalesce the many small map-output blocks — groupby cost scales
    # with block count (see stages/grouping.py note)
    if cfg.coalesce_blocks is not None:
        n_coal = cfg.coalesce_blocks or max(32, cfg.n_buckets)
        partials = partials.repartition(n_coal)

    if cfg.two_level_merge and heavy and not heavy_is_ref:
        # pre-merge partials per (bucket, salt) so no single reduce task
        # ever holds a Zipf-head term's full posting list (SURVEY §7.4)
        partials = partials.groupby(["bucket", "salt"]).map_groups(
            lambda g: merge_segment_rows(g, out_salt=-2), batch_format="pyarrow"
        )

    writer = BucketSegmentWriter(str(manifest.postings_dir), fp)

    def write_bucket(group: pa.Table) -> pa.Table:
        return writer(group)

    results = partials.groupby("bucket").map_groups(write_bucket, batch_format="pyarrow")
    res_tbl = results.to_pandas()  # one row per bucket — tiny
    try:
        stream_stats = results.stats()
    except Exception:
        stream_stats = ""
    if not docs_already:
        docs_dir.mkdir(parents=True, exist_ok=True)
        if not any(docs_dir.glob("*.parquet")):
            # empty corpus: persist an empty docs shard so the stats
            # pass and the query engine have a readable table
            from ..sources.pages import DOCS_SCHEMA

            pq.write_table(DOCS_SCHEMA.empty_table(), docs_dir / "docs-empty.parquet")
        manifest.mark_docs_done({"dir": "docs"})
    _mark("stream_job")

    # -- corpus statistics (A3/A7) from the persisted docs table --------
    # Small-corpus fast path: two columns fit the driver; the Ray
    # aggregate below is the beyond-driver-memory shape.
    n_docs_on_disk = sum(
        pq.read_metadata(f).num_rows for f in Path(docs_dir).glob("*.parquet")
    )
    from ..config import DRIVER_FASTPATH_ROWS

    if n_docs_on_disk <= DRIVER_FASTPATH_ROWS:
        import pandas as pd

        tbl = pq.read_table(docs_dir, columns=["doc_id", "site_id", "doc_len"])
        ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
        if len(np.unique(ids)) != len(ids):
            raise RuntimeError(
                "duplicate doc_id in docs shards — likely a retried "
                "WriteDocsShard task re-batched differently; remove "
                f"{docs_dir} and rebuild"
            )
        pdf = tbl.to_pandas()
        grouped = pdf.groupby("site_id")["doc_len"].agg(["size", "sum"])
        indexed = pdf[pdf["doc_len"] > 0].groupby("site_id")["doc_len"].size()
        stats_pdf = pd.DataFrame(
            {
                "site_id": grouped.index,
                "sum(one)": grouped["size"].to_numpy(),
                "sum(indexed)": indexed.reindex(grouped.index).fillna(0).to_numpy(),
                "sum(doc_len64)": grouped["sum"].to_numpy(),
            }
        )
    else:
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
            rd.read_parquet(str(docs_dir), columns=["site_id", "doc_len"])
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
        **((stats_extra() if callable(stats_extra) else stats_extra) or {}),
    }
    atomic_write_json(index_dir / "stats.json", stats)
    _mark("stats")

    seconds = time.perf_counter() - t0
    n_terms = int(res_tbl["n_terms"].sum()) if len(res_tbl) else 0
    n_postings = int(res_tbl["n_postings"].sum()) if len(res_tbl) else 0
    manifest.write_final(
        {
            "stats": stats,
            "heavy_terms": {
                k: int(v)
                for k, v in (ray.get(heavy) if heavy_is_ref else heavy).items()
            },
            "buckets_built": sorted(int(b) for b in res_tbl["bucket"]) if len(res_tbl) else [],
            "buckets_skipped": sorted(done),
            "metrics": {
                "phases": phases,
                "stream_stats": stream_stats,
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
    pages_path: str | None = None,
) -> BuildResult:
    cfg = cfg or BuildConfig()
    n_hint = None
    if pages_path:
        import pyarrow.parquet as pq

        n_hint = sum(
            pq.read_metadata(f).num_rows for f in Path(pages_path).glob("*.parquet")
        ) or None

    # overlap the two serial driver prefixes: the Zipf-head sampling
    # estimate runs as a Ray task WHILE the dedup key prepass scans —
    # neither blocks the other (both are seconds of pure-serial time
    # that otherwise subtract from scaling efficiency)
    heavy_future = None
    if pages_path and cfg.sample_fraction > 0:
        want = min(cfg.sample_max_docs, max(256, int((n_hint or 50_000) * cfg.sample_fraction)))

        @ray.remote(num_cpus=1)
        def _heavy_task(src: str, want_docs: int, n_total: int, cfg_: BuildConfig) -> dict:
            texts = _sample_texts(None, src, want_docs)
            return _heavy_from_texts(texts, n_total, cfg_)

        heavy_future = _heavy_task.remote(pages_path, want, n_hint or want, cfg)

    meta: dict = {}
    docs = prepare_docs(
        pages,
        sites,
        dedup=cfg.dedup,
        use_text_col=cfg.use_text_col,
        concurrency=cfg.prep_concurrency,
        pages_path=pages_path,
        meta_out=meta,
    )

    if "prepass_refs" in meta:
        # overlapped prepass: the scheme/next-id metadata resolves AFTER
        # the stream job (by which point the prepass finished long ago)
        fut_small, fut_urls = meta.pop("prepass_refs")

        def _resolve_extra() -> dict:
            urls_arr = ray.get(fut_urls)
            if urls_arr is None:
                return {"doc_id_scheme": "hash"}
            return {"doc_id_scheme": "dense", "next_doc_id": len(urls_arr)}

        res = build_index_from_docs(
            docs, index_dir, sites, cfg, input_token=input_token,
            n_docs_hint=n_hint, sample_source=pages_path,
            heavy_precomputed=heavy_future,
            stats_extra=_resolve_extra,
        )
        # exact-duplicate ties were dropped in-stream; re-add exactly one
        # resolved row per tied key through the delta path (rare — crawl
        # artifacts; deterministic content-fingerprint winner)
        winners, tied = ray.get(fut_small)
        if tied and res.n_buckets_built > 0:
            from ..sources.pages import resolve_tied_rows
            from ..state.updater import IndexUpdater

            rows = resolve_tied_rows(
                pages_path, winners, tied, sites, use_text_col=cfg.use_text_col
            )
            upd = IndexUpdater(index_dir)
            order = sorted(range(len(rows)), key=lambda i: rows.column("url")[i].as_py())
            for i in order:
                upd.index_page(
                    rows.column("url")[i].as_py(), text=rows.column("text")[i].as_py()
                )
            upd.compact()
            stats = json.loads((Path(index_dir) / "stats.json").read_text())
            res = BuildResult(
                index_dir=res.index_dir, n_docs=int(stats["n_docs"]),
                n_postings=res.n_postings, n_terms=res.n_terms,
                n_buckets_built=res.n_buckets_built,
                n_buckets_skipped=res.n_buckets_skipped,
                seconds=res.seconds, stats=stats,
            )
        return res

    return build_index_from_docs(
        docs, index_dir, sites, cfg, input_token=input_token,
        n_docs_hint=n_hint, sample_source=pages_path,
        heavy_precomputed=heavy_future,
        stats_extra=meta,
    )


def build_index_from_documents_table(
    documents: rd.Dataset,
    index_dir: str | Path,
    cfg: BuildConfig | None = None,
    *,
    input_token: str = "",
    sources: list[str] | None = None,
) -> BuildResult:
    """Build over the driver's testdata ``documents`` table (source≙site).

    ``sources`` overrides the site catalog — required for shard-parallel
    builds (`merge_indexes`): each shard must be built against the GLOBAL
    source list so site ids agree across shards even when a shard happens
    to miss a source entirely."""
    if sources is None:
        sources = sorted(documents.unique("source"))
    sites = sites_for_sources(sources)
    docs = docs_from_documents(documents, sources)
    # fingerprint exactly the documents table when input_token is its dir
    in_files = None
    if input_token and (Path(input_token) / "documents.parquet").is_file():
        in_files = [str(Path(input_token) / "documents.parquet")]
    return build_index_from_docs(
        docs, index_dir, sites, cfg, input_token=input_token, input_files=in_files
    )


def write_recency_priors(
    index_dir: str | Path,
    out_dir: str | Path,
    *,
    now_us: int,
    half_life_days: float = 30.0,
) -> int:
    """Static freshness priors from the index's own doc store: for every
    doc with a crawl timestamp (``ts_us``, projected from the input
    table's ``warc_ts`` at prepare time), write

        prior(doc) = half_life / (half_life + age_days)

    as a (doc_id, prior) Parquet directory the engine loads via
    ``SearchEngine(prior_path=...)``. Rational decay, not exp(): pure
    +,*,/ in float64 is bit-identical between numpy and any SQL oracle,
    while libm exp() may differ in the last ulp.

    Distributed: one Ray Data pass over the doc shards, column-pruned to
    (doc_id, ts_us); docs without ts_us are skipped (engine defaults
    their prior to 1.0). Output is one file per input block, so a
    256-node build writes priors shard-parallel next to its doc shards.
    Returns the number of prior rows written. ``now_us`` is explicit —
    priors are a build artifact stamped with their as-of time, never a
    hidden wall-clock read."""
    import pyarrow.parquet as _pq

    idx = Path(index_dir)
    files = [
        str(f)
        for pat in ("docs-*.parquet", "delta-seg-*.parquet", "delta-[0-9]*.parquet")
        for f in sorted((idx / "docs").glob(pat))
    ]
    # delta shards from the updater carry no crawl time — skip them
    # (their docs default to prior 1.0 in the engine); fail loud only
    # when NOTHING has a timestamp
    files = [f for f in files if "ts_us" in _pq.read_schema(f).names]
    if not files:
        raise ValueError(
            f"{idx}/docs has no ts_us column — build the index from a pages "
            "table with warc_ts, or supply priors from another source"
        )
    out = Path(out_dir)
    if out.exists():
        shutil.rmtree(out)
    out.mkdir(parents=True)
    hl = float(half_life_days)

    def prior_batch(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = t["ts_us"].to_numpy(zero_copy_only=False).astype(np.float64)
        age_days = np.maximum(0.0, (float(now_us) - ts) / 86_400e6)
        return pa.table(
            {"doc_id": ids, "prior": hl / (hl + age_days)}
        )

    ds = rd.read_parquet(files, columns=["doc_id", "ts_us"])
    ds = ds.map_batches(prior_batch, batch_format="pyarrow")
    ds.write_parquet(str(out))
    return sum(_pq.read_metadata(f).num_rows for f in out.glob("*.parquet"))


def merge_indexes(dirs, out_dir: str | Path) -> dict:
    """Merge k (>=2) independently-built indexes over DISJOINT doc sets
    into one — shard-parallel index construction (build each corpus
    shard where its data lives, merge segments after), the way large
    engines scale indexing beyond one job. Posting rows re-merge with
    the same vectorized ``merge_segment_rows`` kernel the builder uses
    for salted partials (bulk decode -> lexsort -> bulk re-encode);
    doc-store shards are copied file-wise (content-hashed names — no
    collisions); stats are exact sums. Requires equal
    n_buckets/block_size and identical site tables (shards of one
    corpus); duplicate doc ids across shards are an upstream error and
    fail loudly inside the merge kernel.

    Scale shape: one Ray task per bucket (the bucket IS the unit of
    physical parallelism; each task touches only its k segment files),
    driver work is stats-sized. LSM state (deltas/tombstones) must be
    compacted away before merging — raises otherwise."""
    srcs = [Path(d) for d in dirs]
    if len(srcs) < 2:
        raise ValueError("merge_indexes needs at least two source indexes")
    out = Path(out_dir)
    stats_all = [json.loads((d / "stats.json").read_text()) for d in srcs]
    s0 = stats_all[0]
    for d, s in zip(srcs[1:], stats_all[1:]):
        if s["n_buckets"] != s0["n_buckets"] or s["block_size"] != s0["block_size"]:
            raise ValueError("merge requires equal n_buckets and block_size")
        if s["sites"] != s0["sites"]:
            raise ValueError(
                "merge requires identical site tables (same corpus sharded)"
            )
    for d in srcs:
        if (d / "tombstones.json").exists() or (d / "postings_delta").exists():
            raise ValueError(f"{d}: compact LSM state before merging")
    nb = int(s0["n_buckets"])
    (out / "postings").mkdir(parents=True, exist_ok=True)
    (out / "docs").mkdir(parents=True, exist_ok=True)

    @ray.remote
    def merge_bucket(bucket: int) -> int:
        files = [d / "postings" / f"bucket={bucket:05d}.parquet" for d in srcs]
        parts = [pq.read_table(f) for f in files if f.exists()]
        if not parts:
            return 0
        merged = merge_segment_rows(pa.concat_tables(parts), out_salt=-1)
        final = out / "postings" / f"bucket={bucket:05d}.parquet"
        tmp = out / "postings" / f"bucket={bucket:05d}.parquet.tmp"
        pq.write_table(merged, tmp, row_group_size=4096)
        os.replace(tmp, final)
        return len(merged)

    n_terms = sum(ray.get([merge_bucket.remote(i) for i in range(nb)]))

    for src in srcs:
        for f in sorted((src / "docs").glob("*.parquet")):
            dst = out / "docs" / f.name
            if not dst.exists():
                shutil.copy2(f, dst)

    site_stats: dict[str, dict] = {}
    for s in stats_all:
        for k, v in s.get("site_stats", {}).items():
            acc = site_stats.setdefault(
                k, {"n_docs": 0, "n_docs_indexed": 0, "sum_doc_len": 0}
            )
            for f in acc:
                acc[f] += int(v.get(f, 0))
    stats = {
        "block_size": s0["block_size"],
        "n_buckets": nb,
        "n_docs": sum(int(s["n_docs"]) for s in stats_all),
        "n_docs_indexed": sum(int(s["n_docs_indexed"]) for s in stats_all),
        "sum_doc_len": sum(int(s["sum_doc_len"]) for s in stats_all),
        "sites": s0["sites"],
        "site_stats": site_stats,
    }
    atomic_write_json(out / "stats.json", stats)
    atomic_write_json(
        out / "manifest.json",
        {"merged_from": [str(d) for d in srcs], "n_terms_rows": n_terms},
    )
    atomic_write_json(out / "docs.done.json", {"dir": "docs", "merged": True})
    return {"n_term_rows": n_terms, "n_docs": stats["n_docs"]}
