"""Single-page re-index: the delta-segment + tombstone path (§3.2).

Reference flow (/root/reference/src/main/java/searchengine/service/
IndexingServiceImpl.java:137-161): match url to a configured site
(:163-173, error when outside the config), delete the existing page —
decrementing lemma frequencies and deleting its index rows in place
(S5, utils/PageIndexingUtils.java:46-71) — then fetch/extract/save/index
the page (:197-208; discovered links counted but NOT followed).

Immutable segments cannot be decremented in place, so the rebuild uses
the standard log-structured (LSM) design (SURVEY §2.1 S5 mapping):

* tombstones.json — ``doc_ids``: docIDs whose BASE postings/doc rows
  are dead; ``kill``: docID → min_live_seq — postings for that docID in
  any delta SEGMENT with seq < min_live_seq are dead too (a killed id is
  always also tombstoned, so base liveness stays the simple set test);
* docs/delta-<docid>.parquet — single-page replacement doc row (one
  file per docID: a re-re-index overwrites, never duplicates);
* postings_delta/doc-<docid>.parquet — that doc's posting payload rows
  (df=1 lists in SEGMENT_SCHEMA), always live (the per-doc log is
  mutable: a replacement deletes/overwrites the file);
* postings_delta/seg-<seq>-<sig>.parquet + docs/delta-seg-<seq>-<sig>
  .parquet — MICRO-BATCH delta segments from ``index_pages``: partial
  posting lists (many docs per list) and their doc rows, written by
  distributed Ray tasks, live iff seq >= kill.get(doc_id, 0);
* ``compact()`` folds deltas+tombstones back into the base segments
  (vectorized per-bucket re-encode) and clears the logs — at cluster
  scale this maps over buckets as Ray tasks; the sandbox loops.

stats.json is kept consistent (N, per-site counts, sum_doc_len,
next_doc_id, next_delta_seq) so idf and BM25 see the updated corpus
immediately.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.extract import extract_text
from ..functions.urls import extract_path, normalize_url
from ..stages.codec import decode_posting_list, encode_posting_list
from ..stages.postings import SEGMENT_SCHEMA, _rows_to_table, merge_segment_rows
from ..stages.tokenizer import assign_doc_ids, term_bucket, token_counts
from ..state.manifest import atomic_write_json, read_json


def _write_segment_batch(
    batch: pa.Table, *, index_dir: str, seq: int, n_buckets: int, map_ref
) -> pa.Table:
    """Task-stage for ``IndexUpdater.index_pages``: per input batch,
    attach docIDs from the broadcast url→id map, write one docs part and
    one partial-postings part (SEGMENT_SCHEMA, the build's combiner
    encoding) under ``tmp-`` names — the driver renames them live only
    after the kill map is persisted. Content-hash filenames make task
    retries overwrite their own output instead of duplicating it.

    Runs as plain Ray tasks (NOT an actor pool): the per-batch state is
    one local ``ray.get`` of the id map plus a free ``TokenizeExplode``
    construction, while an actor pool would pay fresh-process startup +
    autoscale ramp on EVERY micro-batch call — measured ~4.5 s of a
    ~7 s 8k-page ingest. Tasks reuse the session's warm workers."""
    import hashlib

    import ray

    from ..sources.pages import DOCS_SCHEMA
    from ..stages.tokenizer import TokenizeExplode

    ref = map_ref[0] if isinstance(map_ref, (list, tuple)) else map_ref
    url_to_id: dict[str, int] = ray.get(ref) if not isinstance(ref, dict) else ref
    idx_dir = Path(index_dir)
    seq = int(seq)

    urls = batch.column("url").to_pylist()
    ids = np.array([url_to_id.get(u, -1) for u in urls], np.int64)
    keep = ids >= 0  # drops unmatched-site rows and any non-winners
    if not keep.all():
        batch = batch.filter(pa.array(keep))
        ids = ids[keep]
    if not len(batch):
        return pa.table({"n_docs": pa.array([], pa.int64())})
    batch = batch.set_column(
        batch.schema.get_field_index("doc_id"), "doc_id", pa.array(ids, pa.int64())
    )
    sig = hashlib.md5(
        f"{urls[0]}|{urls[-1]}|{len(batch)}".encode()
    ).hexdigest()[:16]

    docs_tbl = batch.select(DOCS_SCHEMA.names).cast(DOCS_SCHEMA)
    docs_dir = idx_dir / "docs"
    tmp = docs_dir / f"tmp-delta-seg-{seq:06d}-{sig}.parquet.tmp"
    # 128-row groups match the base doc store: the engine's locator
    # hydrates per row group, so delta shards pay the same ~1 ms
    # per-miss decode instead of a whole-file decode
    pq.write_table(docs_tbl, tmp, compression="zstd", row_group_size=128)
    os.replace(tmp, docs_dir / f"tmp-delta-seg-{seq:06d}-{sig}.parquet")

    partials = TokenizeExplode(n_buckets=n_buckets, emit_partials=True)(batch)
    pdir = idx_dir / "postings_delta"
    ptmp = pdir / f"tmp-seg-{seq:06d}-{sig}.parquet.tmp"
    pq.write_table(partials, ptmp)
    os.replace(ptmp, pdir / f"tmp-seg-{seq:06d}-{sig}.parquet")
    return pa.table({"n_docs": pa.array([len(batch)], pa.int64())})


class IndexUpdater:
    """Mutating facade over one index directory."""

    def __init__(self, index_dir: str | Path) -> None:
        self.index_dir = Path(index_dir)
        self.stats_path = self.index_dir / "stats.json"
        self.stats = json.loads(self.stats_path.read_text())
        self.delta_docs_dir = self.index_dir / "docs"
        self.delta_postings_dir = self.index_dir / "postings_delta"
        self.delta_postings_dir.mkdir(exist_ok=True)
        self.tombstones_path = self.index_dir / "tombstones.json"

    # ------------------------------------------------------------------
    def _tombstones(self) -> set[int]:
        data = read_json(self.tombstones_path) or {}
        return set(data.get("doc_ids", []))

    def _kill_map(self) -> dict[int, int]:
        """docID → min_live_seq (delta-SEGMENT postings below it are dead)."""
        data = read_json(self.tombstones_path) or {}
        return {int(k): int(v) for k, v in (data.get("kill") or {}).items()}

    def _write_tombstones(self, tombs: set[int], kill: dict[int, int] | None = None) -> None:
        if kill is None:
            kill = self._kill_map()
        atomic_write_json(
            self.tombstones_path,
            {
                "doc_ids": sorted(tombs),
                "kill": {str(k): int(v) for k, v in sorted(kill.items())},
            },
        )

    def _next_delta_seq(self) -> int:
        return int(self.stats.get("next_delta_seq", 1))

    def _site_for(self, norm_url: str) -> dict | None:
        for s in self.stats["sites"]:
            if norm_url.startswith(normalize_url(s["url"])):
                return s
        return None

    def _delta_doc_ids(self) -> set[int]:
        return {
            int(f.stem.split("-", 1)[1])
            for f in self.delta_docs_dir.glob("delta-[0-9]*.parquet")
        }

    def _live_docs_for_keys(
        self, keys: set[tuple[int, str]]
    ) -> dict[tuple[int, str], list[dict]]:
        """Live doc rows per (site_id, path) key — base, micro-batch
        delta segments and per-doc deltas, each with its own liveness
        rule (module docstring). One predicate-filtered scan per file
        category; newer rows shadow older ones per docID.

        The scan RESULT is micro-batch-key-scoped (small by contract);
        the scan INPUT is the whole doc store. Below
        ``DRIVER_FASTPATH_ROWS`` base docs the driver scans locally with
        predicate pushdown; above it the base-shard scan runs as a Ray
        Data job (``read_parquet(filter=...)`` fanned over the shard
        files) so a 100 TB doc store's key resolve is cluster IO, not a
        driver loop. Delta layers stay driver-scanned — compaction keeps
        them micro-batch-scale."""
        import pyarrow.dataset as pads

        from ..config import DRIVER_FASTPATH_ROWS

        if not keys:
            return {}
        tombs = self._tombstones()
        kill = self._kill_map()
        paths = sorted({p for _, p in keys})
        cols = ["doc_id", "site_id", "path", "doc_len"]
        flt = pads.field("path").isin(pa.array(paths, pa.string()))
        out: dict[tuple[int, str], dict[int, dict]] = {}
        n_base = int(self.stats.get("next_doc_id", 0)) or sum(
            int(s.get("pages", 0)) for s in self.stats.get("sites", [])
        )

        def _rows(files: list) -> list[dict]:
            if n_base > DRIVER_FASTPATH_ROWS and len(files) > 1:
                import ray.data as rd

                ds = rd.read_parquet(
                    [str(f) for f in files], columns=cols, filter=flt
                )
                return ds.take_all()  # keys-scoped → micro-batch-sized
            return (
                pads.dataset([str(f) for f in files], format="parquet")
                .to_table(columns=cols, filter=flt)
                .to_pylist()
            )

        def _scan(files: list, live_fn) -> None:
            if not files:
                return
            for r in _rows(files):
                key = (int(r["site_id"]), r["path"])
                if key not in keys:
                    continue
                did = int(r["doc_id"])
                if live_fn(did):
                    out.setdefault(key, {})[did] = r

        _scan(sorted(self.delta_docs_dir.glob("docs-*.parquet")),
              lambda d: d not in tombs)
        for f in sorted(self.delta_docs_dir.glob("delta-seg-*.parquet")):
            seq = int(f.name.split("-")[2])
            _scan([f], lambda d, s=seq: kill.get(d, 0) <= s)
        _scan(sorted(self.delta_docs_dir.glob("delta-[0-9]*.parquet")),
              lambda d: True)
        return {k: list(v.values()) for k, v in out.items()}

    def _find_existing(self, site_id: int, path: str) -> list[dict]:
        """Live doc rows with this (site, path) — base + deltas."""
        return self._live_docs_for_keys({(site_id, path)}).get((site_id, path), [])

    # ------------------------------------------------------------------
    def index_page(
        self,
        url: str,
        html: bytes | str | None = None,
        text: str | None = None,
        lang: str = "",
    ) -> dict:
        """Re-index one page; SimpleResponse-shaped dict (dto/SimpleResponse.java)."""
        try:
            nu = normalize_url(url)
            site = self._site_for(nu)
            if site is None:
                # reference: findSiteConfig throws "Сайт не найден в конфиге"
                return {"result": False, "error": f"Сайт не найден в конфиге: {url}"}
            site_id = int(site["site_id"])
            path = extract_path(url, site["url"])
            if text is None:
                text = extract_text(html) if html is not None else ""

            doc_len = int(token_counts(pa.array([text], pa.string()))[0])

            # docID: reuse the live doc's id at this (site, path) —
            # re-index must not mint a new identity (reference upsert
            # semantics). New pages: dense scheme allocates the next
            # sequential id (persisted in stats.json); hash-id indexes
            # keep the deterministic url hash.
            existing = self._find_existing(site_id, path)
            if existing:
                doc_id = int(min(int(o["doc_id"]) for o in existing))
            elif self.stats.get("doc_id_scheme") == "dense":
                doc_id = int(self.stats.get("next_doc_id", 0))
                self.stats["next_doc_id"] = doc_id + 1
            else:
                doc_id = int(assign_doc_ids([nu])[0])

            # deletePageIfExists: tombstone every live doc at this
            # (site, path). Tombstones kill BASE postings; the kill map
            # (docID → next_delta_seq) kills any micro-batch SEGMENT
            # postings written so far; an old doc's PER-DOC delta
            # postings are deleted here directly (that log is mutable),
            # so per-doc delta files are live by construction.
            tombs = self._tombstones()
            kill = self._kill_map()
            removed = []
            for old in existing:
                oid = int(old["doc_id"])
                tombs.add(oid)
                kill[oid] = self._next_delta_seq()
                removed.append(old)
                (self.delta_postings_dir / f"doc-{oid}.parquet").unlink(missing_ok=True)
                if oid != doc_id:
                    # replaced by a DIFFERENT docID: its delta doc row
                    # must not shadow anything anymore
                    (self.delta_docs_dir / f"delta-{oid}.parquet").unlink(missing_ok=True)
            self._write_tombstones(tombs, kill)

            # delta doc row (overwrites any previous delta for this docID)
            row = pa.table(
                {
                    "doc_id": pa.array([doc_id], pa.int64()),
                    "site_id": pa.array([site_id], pa.int32()),
                    "url": pa.array([nu], pa.string()),
                    "path": pa.array([path], pa.string()),
                    "text": pa.array([text], pa.string()),
                    "doc_len": pa.array([doc_len], pa.int32()),
                    "lang": pa.array([lang], pa.string()),
                }
            )
            tmp = self.delta_docs_dir / f"delta-{doc_id}.parquet.tmp"
            final = self.delta_docs_dir / f"delta-{doc_id}.parquet"
            pq.write_table(row, tmp)
            os.replace(tmp, final)

            # delta postings: one df=1 payload row per term
            from ..functions.tokenize import term_frequencies, tokenize

            counts = term_frequencies(tokenize(text))
            n_buckets = int(self.stats["n_buckets"])
            rows: dict[str, list] = {n: [] for n in SEGMENT_SCHEMA.names}
            terms = sorted(counts)
            buckets = term_bucket(terms, n_buckets) if terms else []
            for t, bkt in zip(terms, buckets):
                payload = encode_posting_list(
                    np.array([doc_id], np.int64), np.array([counts[t]], np.int64)
                )
                rows["bucket"].append(int(bkt))
                rows["site_id"].append(site_id)
                rows["term"].append(t)
                rows["salt"].append(-1)
                for k in ("df", "cf", "doc_gaps", "tf_bytes", "block_last_doc",
                          "block_max_tf", "block_gap_offset", "block_tf_offset"):
                    rows[k].append(payload[k])
            dtmp = self.delta_postings_dir / f"doc-{doc_id}.parquet.tmp"
            dfinal = self.delta_postings_dir / f"doc-{doc_id}.parquet"
            pq.write_table(_rows_to_table(rows), dtmp)
            os.replace(dtmp, dfinal)

            # stats: remove old docs, add the new one
            ss = self.stats["site_stats"]
            key = site_id if site_id in ss else str(site_id)
            entry = ss.setdefault(key, {"n_docs": 0, "n_docs_indexed": 0, "sum_doc_len": 0})
            for old in removed:
                entry["n_docs"] -= 1
                if old["doc_len"] > 0:
                    entry["n_docs_indexed"] -= 1
                entry["sum_doc_len"] -= int(old["doc_len"])
            entry["n_docs"] += 1
            if doc_len > 0:
                entry["n_docs_indexed"] += 1
            entry["sum_doc_len"] += doc_len
            for agg in ("n_docs", "n_docs_indexed", "sum_doc_len"):
                self.stats[agg] = sum(int(s[agg]) for s in ss.values())
            atomic_write_json(self.stats_path, self.stats)
            return {"result": True, "error": None}
        except Exception as ex:  # reference catch-all → SimpleResponse(false, ...)
            return {"result": False, "error": f"Internal error: {ex}"}

    # ------------------------------------------------------------------
    def index_pages(
        self,
        pages,
        *,
        concurrency: int | tuple[int, int] | None = None,
        batch_size: int = 512,
    ) -> dict:
        """Micro-batch streaming ingestion: upsert MANY pages in one call
        as ONE sequence-numbered LSM delta segment.

        Batched form of the reference's per-page upsert
        (service/IndexingServiceImpl.java:137-161: delete existing page →
        extract → save → index), re-expressed Ray-Data-first: extraction,
        tokenization and posting encoding run as ``map_batches`` over the
        input Dataset (the expensive work is distributed and vectorized —
        the same ``TokenizeExplode`` combiner the full build uses), and
        each Ray task writes its doc/posting part files directly
        (content-hash names → idempotent under retries). Only the KEY
        table (url, site_id, path, doc_len — no text) is collected on the
        driver to resolve upsert identities, which bounds the micro-batch
        size, not the corpus: a 100 TB index absorbs a stream of bounded
        micro-batches, each a fresh delta segment, with ``compact()``
        folding segments down on whatever cadence the operator picks.

        ``pages``: a ``ray.data.Dataset`` (or pyarrow Table / pandas
        DataFrame / list of dicts) with ``url`` and ``text`` (or ``html``)
        columns, optionally ``lang``.

        Commit protocol (crash-safe, documented loss window identical to
        the reference's delete-then-reindex): (1) distributed job writes
        ``tmp-`` part files; (2) driver persists tombstones+kill map
        (old versions die); (3) driver renames parts live and bumps
        stats. A crash between (2) and (3) loses the in-flight batch —
        exactly the reference's window — and never double-scores.
        """
        import ray
        import ray.data as rd

        import pandas as pd

        if isinstance(pages, pa.Table):
            pages = rd.from_arrow(pages)
        elif isinstance(pages, pd.DataFrame):
            pages = rd.from_pandas(pages)
        elif isinstance(pages, list):
            pages = rd.from_items(pages)

        # fan the micro-batch out to ~one block per `batch_size` rows:
        # a table-sized input arrives as ONE block well under
        # target_max_block_size, and Ray Data schedules one TASK per
        # block regardless of `batch_size` — without this split the
        # whole prepare+tokenize+write chain ran serially on one core
        # (measured: the 8k-page ingest job showed "1 tasks executed")
        pages = pages.materialize()  # micro-batch: bounded by contract
        n_in = pages.count()
        target_blocks = max(1, -(-n_in // max(1, batch_size)))
        if pages.num_blocks() < target_blocks:
            pages = pages.repartition(target_blocks).materialize()

        sites = [
            {"site_id": int(s["site_id"]), "url": s["url"],
             "norm": normalize_url(s["url"])}
            for s in self.stats["sites"]
        ]

        def prepare(batch: pa.Table) -> pa.Table:
            from ..functions.extract import extract_text

            urls = batch.column("url").to_pylist()
            if "text" in batch.column_names:
                texts = batch.column("text").to_pylist()
            else:
                texts = [extract_text(h) for h in batch.column("html").to_pylist()]
            langs = (
                batch.column("lang").to_pylist()
                if "lang" in batch.column_names
                else [""] * len(urls)
            )
            norm = [normalize_url(u) for u in urls]
            site_ids = np.full(len(urls), -1, np.int32)
            paths = [""] * len(urls)
            for s in sites:  # config order = match priority (_site_for parity)
                for i, u in enumerate(norm):
                    if site_ids[i] == -1 and u.startswith(s["norm"]):
                        site_ids[i] = s["site_id"]
                        paths[i] = extract_path(u, s["url"])
            text_arr = pa.array(texts, pa.string())
            return pa.table(
                {
                    "doc_id": pa.array(np.zeros(len(urls), np.int64)),
                    "site_id": pa.array(site_ids, pa.int32()),
                    "url": pa.array(norm, pa.string()),
                    "path": pa.array(paths, pa.string()),
                    "text": text_arr,
                    "doc_len": pa.array(token_counts(text_arr) if len(urls) else [], pa.int32()),
                    "lang": pa.array(langs, pa.string()),
                }
            )

        prep = pages.map_batches(
            prepare, batch_format="pyarrow", batch_size=batch_size
        ).materialize()  # micro-batch: bounded by contract, safe to pin

        keys = prep.select_columns(["url", "site_id", "path", "doc_len"]).to_pandas()
        n_unmatched = int((keys["site_id"] < 0).sum())
        keys = keys[keys["site_id"] >= 0]

        # in-batch duplicate keys: deterministic winner = max (doc_len,
        # fingerprint) per url — same-key rows collapse to exactly one
        if keys["url"].duplicated().any():

            def _dedup_group(g: pa.Table) -> pa.Table:
                import hashlib as _h

                if len(g) <= 1:
                    return g
                best, best_key = 0, None
                for i in range(len(g)):
                    k = (int(g["doc_len"][i].as_py()),
                         _h.md5(g["text"][i].as_py().encode()).hexdigest())
                    if best_key is None or k > best_key:
                        best, best_key = i, k
                return g.slice(best, 1)

            prep = prep.groupby("url").map_groups(
                _dedup_group, batch_format="pyarrow"
            ).materialize()
            keys = prep.select_columns(
                ["url", "site_id", "path", "doc_len"]
            ).to_pandas()
            keys = keys[keys["site_id"] >= 0]

        if not len(keys):
            return {"result": True, "error": None, "n_pages": 0,
                    "n_new": 0, "n_replaced": 0, "n_unmatched": n_unmatched}

        # ---- resolve upsert identities (driver; key columns only) ----
        key_set = {(int(s), p) for s, p in zip(keys["site_id"], keys["path"])}
        live = self._live_docs_for_keys(key_set)
        seq = self._next_delta_seq()
        tombs = self._tombstones()
        kill = self._kill_map()
        url_to_id: dict[str, int] = {}
        removed: list[dict] = []
        new_urls: list[str] = []
        for url, sid, path in zip(keys["url"], keys["site_id"], keys["path"]):
            old = live.get((int(sid), path), [])
            if old:
                url_to_id[url] = int(min(int(o["doc_id"]) for o in old))
                for o in old:
                    oid = int(o["doc_id"])
                    tombs.add(oid)
                    kill[oid] = seq
                    removed.append(o)
                    (self.delta_postings_dir / f"doc-{oid}.parquet").unlink(missing_ok=True)
                    if oid != url_to_id[url]:
                        (self.delta_docs_dir / f"delta-{oid}.parquet").unlink(missing_ok=True)
            else:
                new_urls.append(url)
        if new_urls:
            if self.stats.get("doc_id_scheme") == "dense":
                base = int(self.stats.get("next_doc_id", 0))
                for i, u in enumerate(sorted(new_urls)):  # deterministic
                    url_to_id[u] = base + i
                self.stats["next_doc_id"] = base + len(new_urls)
            else:
                ids = assign_doc_ids(sorted(new_urls))
                for u, d in zip(sorted(new_urls), ids):
                    url_to_id[u] = int(d)

        # ---- distributed write of the delta segment (tmp- parts) -----
        # task-based (warm workers), NOT an actor pool: see
        # _write_segment_batch docstring; `concurrency` caps task
        # parallelism when a caller passes an int.
        map_ref = [ray.put(url_to_id)]
        n_buckets = int(self.stats["n_buckets"])
        written = prep.map_batches(
            _write_segment_batch,
            fn_kwargs=dict(
                index_dir=str(self.index_dir),
                seq=seq,
                n_buckets=n_buckets,
                map_ref=map_ref,
            ),
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency if isinstance(concurrency, int) else None,
        ).to_pandas()
        n_written = int(written["n_docs"].sum()) if len(written) else 0

        # retry-safety guard (WriteDocsShard caveat): a retried task that
        # re-batched differently leaves stale tmp parts — row counts
        # across tmp doc parts must equal the winner-key count exactly
        tmp_rows = sum(
            pq.read_metadata(f).num_rows
            for f in self.delta_docs_dir.glob(f"tmp-delta-seg-{seq:06d}-*.parquet")
        )
        if tmp_rows != len(keys):
            for d, pat in ((self.delta_postings_dir, f"tmp-seg-{seq:06d}-*"),
                           (self.delta_docs_dir, f"tmp-delta-seg-{seq:06d}-*")):
                for f in d.glob(pat):
                    f.unlink(missing_ok=True)
            raise RuntimeError(
                f"index_pages: tmp part rows {tmp_rows} != winners {len(keys)}; "
                "stale retry output detected, micro-batch aborted cleanly"
            )

        # ---- commit: kill olds, then rename parts live, then stats ---
        self._write_tombstones(tombs, kill)
        for d, pat in ((self.delta_postings_dir, f"tmp-seg-{seq:06d}-*.parquet"),
                       (self.delta_docs_dir, f"tmp-delta-seg-{seq:06d}-*.parquet")):
            for f in sorted(d.glob(pat)):
                os.replace(f, d / f.name[len("tmp-"):])

        ss = self.stats["site_stats"]
        for old in removed:
            sid = int(old["site_id"])
            key = sid if sid in ss else str(sid)
            entry = ss.setdefault(key, {"n_docs": 0, "n_docs_indexed": 0, "sum_doc_len": 0})
            entry["n_docs"] -= 1
            if int(old["doc_len"]) > 0:
                entry["n_docs_indexed"] -= 1
            entry["sum_doc_len"] -= int(old["doc_len"])
        for sid_v, dl in zip(keys["site_id"], keys["doc_len"]):
            sid = int(sid_v)
            key = sid if sid in ss else str(sid)
            entry = ss.setdefault(key, {"n_docs": 0, "n_docs_indexed": 0, "sum_doc_len": 0})
            entry["n_docs"] += 1
            if int(dl) > 0:
                entry["n_docs_indexed"] += 1
            entry["sum_doc_len"] += int(dl)
        for agg in ("n_docs", "n_docs_indexed", "sum_doc_len"):
            self.stats[agg] = sum(int(s[agg]) for s in ss.values())
        self.stats["next_delta_seq"] = seq + 1
        atomic_write_json(self.stats_path, self.stats)
        return {
            "result": True,
            "error": None,
            "n_pages": n_written,
            "n_new": len(new_urls),
            "n_replaced": len({int(o["doc_id"]) for o in removed}),
            "n_unmatched": n_unmatched,
            "delta_seq": seq,
        }

    # ------------------------------------------------------------------
    def _refresh_bucket_marker(self, bkt: int, table: pa.Table) -> None:
        """Rewrite the bucket's lineage marker after compaction so
        ``statistics()`` (which sums marker counts) stays consistent.
        The build fingerprint is preserved (existing marker, else
        manifest.json) — a delta-created bucket belongs to the same
        build lineage as its siblings."""
        marker = self.index_dir / "postings" / f"bucket={bkt:05d}.done.json"
        existing = read_json(marker) or {}
        fp = existing.get("fingerprint")
        if fp is None:
            mf = read_json(self.index_dir / "manifest.json") or {}
            fp = mf.get("fingerprint", "delta")
        sids, cnts = np.unique(
            table["site_id"].to_numpy(zero_copy_only=False), return_counts=True
        )
        n_postings = int(pa.compute.sum(table["df"]).as_py() or 0)
        terms = table["term"].to_pylist()
        atomic_write_json(
            marker,
            {
                "fingerprint": fp,
                "bucket": bkt,
                "file": f"bucket={bkt:05d}.parquet",
                "n_terms": len(table),
                "n_unique_terms": len(set(terms)),
                "n_postings": n_postings,
                "lemmas_by_site": {int(s): int(c) for s, c in zip(sids, cnts)},
            },
        )

    def compact(self) -> dict:
        """Fold delta postings into the base segments and purge
        tombstoned docIDs from base posting lists. Per-bucket vectorized
        re-encode; sandbox loops the buckets driver-side (cluster scale:
        one Ray task per bucket).

        Tombstones stay recorded after compaction: the base DOC rows of
        dead pages remain on disk (immutable shards), and the tombstone
        set is what keeps ``_find_existing``/stats from resurrecting
        them. Their base POSTINGS are gone after this call, so the
        query-path tombstone filter becomes a no-op."""
        import pyarrow.compute as pc

        # sweep orphan tmp- parts from ingest jobs that died before
        # commit (never renamed live, so never visible — just disk junk)
        for d, pat in ((self.delta_postings_dir, "tmp-seg-*"),
                       (self.delta_docs_dir, "tmp-delta-seg-*")):
            for f in d.glob(pat):
                f.unlink(missing_ok=True)

        tombs = self._tombstones()
        kill = self._kill_map()
        tomb_arr = np.array(sorted(tombs), dtype=np.int64)
        # delta sources: per-doc files (seq None, always live) and
        # micro-batch segments (seq from filename, kill-filtered)
        delta_files = sorted(self.delta_postings_dir.glob("doc-*.parquet"))
        seg_files = sorted(self.delta_postings_dir.glob("seg-*.parquet"))
        by_bucket: dict[int, list[tuple[int | None, pa.Table]]] = {}
        for seq, f in [(None, f) for f in delta_files] + [
            (int(f.name.split("-")[1]), f) for f in seg_files
        ]:
            t = pq.read_table(f)
            for bkt in set(t.column("bucket").to_pylist()):
                by_bucket.setdefault(int(bkt), []).append(
                    (seq, t.filter(pc.equal(t.column("bucket"), bkt)))
                )

        def _dead_for_seq(seq: int) -> np.ndarray:
            return np.array(sorted(d for d, v in kill.items() if v > seq), np.int64)

        postings_dir = self.index_dir / "postings"
        touched = 0
        folded_live: set[int] = set()

        def _rewrite_bucket(
            bkt: int, base: pa.Table | None, deltas: list[tuple[int | None, pa.Table]]
        ) -> None:
            out_rows: dict[str, list] = {n: [] for n in SEGMENT_SCHEMA.names}

            def _add(r: dict, d: np.ndarray, tf: np.ndarray) -> None:
                if d.size == 0:
                    return
                payload = encode_posting_list(d, tf)
                out_rows["bucket"].append(bkt)
                out_rows["site_id"].append(r["site_id"])
                out_rows["term"].append(r["term"])
                out_rows["salt"].append(0)
                for k in ("df", "cf", "doc_gaps", "tf_bytes", "block_last_doc",
                          "block_max_tf", "block_gap_offset", "block_tf_offset"):
                    out_rows[k].append(payload[k])

            if base is not None:
                for r in base.to_pylist():  # tombstones filter BASE lists only
                    d, tf = decode_posting_list(r)
                    if tomb_arr.size:
                        keep = ~np.isin(d, tomb_arr)
                        d, tf = d[keep], tf[keep]
                    _add(r, d, tf)
            for seq, part in deltas:
                dead = _dead_for_seq(seq) if (seq is not None and kill) else None
                for r in part.to_pylist():
                    d, tf = decode_posting_list(r)
                    if dead is not None and dead.size and d.size:
                        keep = ~np.isin(d, dead)
                        d, tf = d[keep], tf[keep]
                    if d.size:
                        folded_live.update(d.tolist())
                    _add(r, d, tf)
            rebuilt = merge_segment_rows(_rows_to_table(out_rows), out_salt=-1)
            seg_file = postings_dir / f"bucket={bkt:05d}.parquet"
            tmpf = seg_file.with_suffix(".parquet.tmp")
            pq.write_table(rebuilt, tmpf, row_group_size=4096)
            os.replace(tmpf, seg_file)
            self._refresh_bucket_marker(bkt, rebuilt)

        for seg_file in sorted(postings_dir.glob("bucket=*.parquet")):
            bkt = int(seg_file.stem.split("=")[1])
            deltas = by_bucket.pop(bkt, [])
            if not deltas and not tombs:
                continue
            _rewrite_bucket(bkt, pq.read_table(seg_file), deltas)
            touched += 1

        # delta-only buckets: terms hashing to a bucket that had no base
        # segment get a NEW segment file — without this, their postings
        # would be silently dropped when the delta log is cleared below
        for bkt, deltas in sorted(by_bucket.items()):
            _rewrite_bucket(bkt, None, deltas)
            touched += 1

        # ids folded in from deltas are live again in BASE — lift their
        # tombstones so the query-path filter doesn't kill them. Kill-map
        # entries survive ONLY for ids that stay dead (their lingering
        # delta-seg DOC rows must not resurrect in _live_docs_for_keys);
        # ids replaced-to-empty keep tombstone+kill, by design.
        folded: set[int] = set(folded_live)
        for f in delta_files:
            try:
                folded.add(int(f.stem.split("-", 1)[1]))
            except ValueError:
                pass
            f.unlink(missing_ok=True)
        for f in seg_files:
            f.unlink(missing_ok=True)
        if folded or kill:
            tombs -= folded
            self._write_tombstones(tombs, {d: v for d, v in kill.items() if d in tombs})
        return {"result": True, "buckets_rewritten": touched}
