"""Single-page re-index: the delta-segment + tombstone path (§3.2).

Reference flow (/root/reference/src/main/java/searchengine/service/
IndexingServiceImpl.java:137-161): match url to a configured site
(:163-173, error when outside the config), delete the existing page —
decrementing lemma frequencies and deleting its index rows in place
(S5, utils/PageIndexingUtils.java:46-71) — then fetch/extract/save/index
the page (:197-208; discovered links counted but NOT followed).

Immutable segments cannot be decremented in place, so the rebuild uses
the standard log-structured design (SURVEY §2.1 S5 mapping):

* tombstones.json — docIDs whose BASE postings/doc rows are dead;
* docs/delta-<docid>.parquet — the replacement doc row (one file per
  docID: a re-re-index overwrites, never duplicates);
* postings_delta/doc-<docid>.parquet — the doc's posting payload rows
  (df=1 lists in SEGMENT_SCHEMA), loaded by the engine and merged over
  the (tombstone-filtered) base lists at query time;
* ``compact()`` folds deltas+tombstones back into the base segments
  (vectorized per-bucket re-encode) and clears the logs — at cluster
  scale this maps over buckets as Ray tasks; the sandbox loops.

stats.json is kept consistent (N, per-site counts, sum_doc_len) so idf
and BM25 see the updated corpus immediately.
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

    def _write_tombstones(self, tombs: set[int]) -> None:
        atomic_write_json(self.tombstones_path, {"doc_ids": sorted(tombs)})

    def _site_for(self, norm_url: str) -> dict | None:
        for s in self.stats["sites"]:
            if norm_url.startswith(normalize_url(s["url"])):
                return s
        return None

    def _delta_doc_ids(self) -> set[int]:
        return {
            int(f.stem.split("-", 1)[1])
            for f in self.delta_docs_dir.glob("delta-*.parquet")
        }

    def _find_existing(self, site_id: int, path: str) -> list[dict]:
        """Live doc rows with this (site, path) — base + deltas.

        A doc is live iff it has a delta doc file (the newest upsert
        always rewrites it) OR it is not tombstoned — a tombstoned id
        WITH a delta file is the re-indexed-same-url case, where the
        tombstone kills only the base postings."""
        import pyarrow.dataset as pads

        tombs = self._tombstones()
        delta_ids = self._delta_doc_ids()
        ds = pads.dataset(self.delta_docs_dir, format="parquet")
        tbl = ds.to_table(
            columns=["doc_id", "site_id", "path", "doc_len"],
            filter=(pads.field("site_id") == site_id) & (pads.field("path") == path),
        )
        seen: dict[int, dict] = {}
        for r in tbl.to_pylist():
            did = int(r["doc_id"])
            if did in delta_ids or did not in tombs:
                seen[did] = r  # delta row (read later) shadows base row
        return list(seen.values())

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
            # (site, path). Tombstones kill BASE postings only; an old
            # doc's DELTA postings are deleted here directly (the delta
            # log is mutable), so delta files are live by construction.
            tombs = self._tombstones()
            removed = []
            for old in existing:
                oid = int(old["doc_id"])
                tombs.add(oid)
                removed.append(old)
                (self.delta_postings_dir / f"doc-{oid}.parquet").unlink(missing_ok=True)
                if oid != doc_id:
                    # replaced by a DIFFERENT docID: its delta doc row
                    # must not shadow anything anymore
                    (self.delta_docs_dir / f"delta-{oid}.parquet").unlink(missing_ok=True)
            self._write_tombstones(tombs)

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
            key = str(site_id) if str(site_id) in ss else site_id
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

        tombs = self._tombstones()
        tomb_arr = np.array(sorted(tombs), dtype=np.int64)
        delta_files = sorted(self.delta_postings_dir.glob("doc-*.parquet"))
        by_bucket: dict[int, list[pa.Table]] = {}
        for f in delta_files:
            t = pq.read_table(f)
            for bkt in set(t.column("bucket").to_pylist()):
                by_bucket.setdefault(int(bkt), []).append(
                    t.filter(pc.equal(t.column("bucket"), bkt))
                )

        postings_dir = self.index_dir / "postings"
        touched = 0

        def _rewrite_bucket(bkt: int, base: pa.Table | None, deltas: list[pa.Table]) -> None:
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
            for part in deltas:  # delta lists are live as-is
                for r in part.to_pylist():
                    d, tf = decode_posting_list(r)
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
        # tombstones so the query-path filter doesn't kill them
        folded: set[int] = set()
        for f in delta_files:
            try:
                folded.add(int(f.stem.split("-", 1)[1]))
            except ValueError:
                pass
            f.unlink(missing_ok=True)
        if folded:
            self._write_tombstones(tombs - folded)
        return {"result": True, "buckets_rewritten": touched}
