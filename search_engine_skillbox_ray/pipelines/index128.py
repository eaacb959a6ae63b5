"""End-to-end 128-bit-docID index path (the 10^12-doc hash-id frame).

Dense int64 docIDs (the default build) need a coordinated id-assignment
pass; at a true 10^12-doc deployment the alternative is a DERIVED docID
— md5(url) → 128 bits, assigned independently on every worker with no
exchange and ~1e-15 collision odds (codec.py "128-bit ids" discusses
why 64 bits are NOT enough there). This module closes the loop the
codec (``encode_posting_list_128``) and query layer (``stages/
wand128``) left open: a distributed BUILD producing persisted 128-bit
segments from a documents table, and a SERVE function running block-max
top-k directly over them.

Scale shape mirrors the main build: tokenize-explode inside
``map_batches`` (per-batch (term, doc, tf) rows, the combiner), ONE
hash exchange on the term bucket, per-bucket vectorized encode to
atomic parquet segments (tmp + rename; manifest-gated resume). Query
reads only the probed term's bucket file (Parquet predicate pushdown)
and maps the top-k (hi, lo) hits back to doc ids via a filtered docmap
read — never a corpus scan.

Reference semantics source: scoring is SearchServiceImpl.java:129-160
(tf·idf over OR-matched pages); the 128-bit id layout is this rebuild's
scale extension (SURVEY §2 has no counterpart).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

from ..functions.hashing import md5_u64
from ..stages.codec import (
    assign_doc_ids_128,
    encode_posting_list_128,
)
from ..stages.postings import (
    SEGMENT_SCHEMA_128,
    posting_row_128_from_storage,
    posting_row_128_to_storage,
)

_U64 = 1 << 64


def _doc_urls(batch: pa.Table) -> list[str]:
    """The adapter's url plan (sources/pages.py docs_from_documents):
    the 128-bit docID hashes this exact string."""
    return [
        f"https://{s}.example/doc/{d}"
        for s, d in zip(
            batch.column("source").to_pylist(), batch.column("doc_id").to_pylist()
        )
    ]


def _signed(a: np.ndarray) -> np.ndarray:
    return a.astype(np.uint64).view(np.int64)


def build_index_128(
    documents: rd.Dataset,
    out_dir: str,
    n_buckets: int = 8,
    input_token: str | None = None,
) -> dict:
    """documents(doc_id, source, text) → ``out_dir`` with
    ``bucket=NNN.parquet`` 128-bit segments (SEGMENT_SCHEMA_128),
    ``docmap.parquet`` (doc_hi, doc_lo, doc_id) and ``manifest.json``.
    Rebuilds are skipped when the manifest's input_token matches."""
    out = Path(out_dir)
    man = out / "manifest.json"
    if man.exists():
        try:
            m = json.loads(man.read_text())
            if (
                input_token is not None
                and m.get("input_token") == input_token
                and m.get("version") == 2
            ):
                return m
        except Exception:
            pass
    out.mkdir(parents=True, exist_ok=True)
    for stale in list(out.glob("bucket=*.parquet")) + list(out.glob("*.tmp")):
        stale.unlink()

    def explode(batch: pa.Table) -> pa.Table:
        """ONE tokenize + md5 pass emits BOTH row kinds: per-(doc, term)
        posting rows (bucket ≥ 0) and per-doc docmap sentinel rows
        (bucket = -1, term = "", tf = doc_len, doc_id set) — the docmap
        no longer costs a second full corpus scan."""
        from ..functions.hashing import flat_nonempty_tokens

        empty = pa.table(
            {
                "bucket": pa.array([], pa.int32()),
                "term": pa.array([], pa.string()),
                "hi": pa.array([], pa.int64()),
                "lo": pa.array([], pa.int64()),
                "tf": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
            }
        )
        hi, lo = assign_doc_ids_128(_doc_urls(batch))
        toks, parents, counts = flat_nonempty_tokens(batch.column("text"))
        if not len(toks):
            return empty
        # per-(doc, term) tf via one dictionary-encode + unique pass
        denc = toks.dictionary_encode()
        codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nv = len(denc.dictionary)
        key = parents * np.int64(nv) + codes
        ukey, tf = np.unique(key, return_counts=True)
        up = (ukey // nv).astype(np.int64)
        uc = (ukey % nv).astype(np.int64)
        terms = denc.dictionary.take(pa.array(uc))
        bucket = (md5_u64(terms.to_pylist()) % np.uint64(n_buckets)).astype(np.int32)
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        keep = counts > 0  # N counts indexed docs only (A3)
        n_doc = int(keep.sum())
        return pa.table(
            {
                "bucket": pa.array(
                    np.concatenate([bucket, np.full(n_doc, -1, np.int32)])
                ),
                "term": pa.concat_arrays(
                    [terms.combine_chunks() if isinstance(terms, pa.ChunkedArray) else terms,
                     pa.array([""] * n_doc, pa.string())]
                ),
                "hi": pa.array(
                    np.concatenate([_signed(hi[up]), _signed(hi[keep])])
                ),
                "lo": pa.array(
                    np.concatenate([_signed(lo[up]), _signed(lo[keep])])
                ),
                "tf": pa.array(
                    np.concatenate([tf.astype(np.int64), counts[keep].astype(np.int64)])
                ),
                "doc_id": pa.array(
                    np.concatenate(
                        [np.full(len(up), -1, np.int64), doc_ids[keep].astype(np.int64)]
                    )
                ),
            }
        )

    parts = documents.select_columns(["doc_id", "source", "text"]).map_batches(
        explode, batch_format="pyarrow"
    ).materialize()

    def write_bucket(group: pd.DataFrame) -> pd.DataFrame:
        b = int(group["bucket"].iloc[0])
        rows: dict[str, list] = {name: [] for name in SEGMENT_SCHEMA_128.names}
        for term, g in group.groupby("term", sort=True):
            payload = encode_posting_list_128(
                g["hi"].to_numpy(np.int64).view(np.uint64),
                g["lo"].to_numpy(np.int64).view(np.uint64),
                g["tf"].to_numpy(np.int64),
            )
            srow = posting_row_128_to_storage(payload)
            rows["bucket"].append(b)
            rows["site_id"].append(0)
            rows["term"].append(term)
            rows["salt"].append(0)
            for c in (
                "df", "cf", "doc_gaps", "tf_bytes", "block_last_doc_hi",
                "block_last_doc_lo", "block_max_tf", "block_gap_offset",
                "block_tf_offset",
            ):
                rows[c].append(srow[c])
        tbl = pa.table(
            {n: pa.array(rows[n], SEGMENT_SCHEMA_128.field(n).type) for n in SEGMENT_SCHEMA_128.names}
        )
        tmp = out / f"bucket={b:05d}.parquet.tmp"
        pq.write_table(tbl, tmp, compression="zstd")
        tmp.rename(out / f"bucket={b:05d}.parquet")
        return pd.DataFrame({"bucket": [b], "n_terms": [len(tbl)]})

    seg_rows = parts.filter(expr="bucket >= 0")
    manifest_rows = (
        seg_rows.groupby("bucket").map_groups(write_bucket, batch_format="pandas").to_pandas()
    )

    dm = parts.filter(expr="bucket < 0").map_batches(
        lambda t: pa.table(
            {
                "doc_hi": t["hi"],
                "doc_lo": t["lo"],
                "doc_id": t["doc_id"],
                "doc_len": t["tf"],
            }
        ),
        batch_format="pyarrow",
    )
    dm_tbl = pa.concat_tables(ray_get_all(dm))
    tmp = out / "docmap.parquet.tmp"
    pq.write_table(dm_tbl, tmp, compression="zstd")
    tmp.rename(out / "docmap.parquet")

    m = {
        "version": 2,  # v2: docmap carries doc_len (BM25 serving)
        "input_token": input_token,
        "n_buckets": int(n_buckets),
        "n_docs_indexed": int(len(dm_tbl)),
        "n_terms": int(manifest_rows["n_terms"].sum()),
        "sum_doc_len": int(dm_tbl["doc_len"].to_numpy().sum()),
        "min_doc_len": int(dm_tbl["doc_len"].to_numpy().min()) if len(dm_tbl) else 0,
    }
    mt = out / "manifest.json.tmp"
    mt.write_text(json.dumps(m))
    mt.rename(man)
    return m


def ray_get_all(ds: rd.Dataset) -> list[pa.Table]:
    """Materialize a SMALL dataset's blocks as arrow tables (the docmap
    is ~24 B/doc; at cluster scale this becomes write_parquet sharding —
    kept driver-side here because the single docmap file is what the
    filtered query-time read probes)."""
    import ray

    return [t if isinstance(t, pa.Table) else pa.Table.from_pandas(t)
            for t in ray.get(ds.to_arrow_refs())]


def topk_128(
    index_dir: str,
    query: str,
    k: int = 10,
    mode: str = "or",
    scorer: str = "tfidf",
    k1: float = 1.2,
    b: float = 0.75,
) -> pd.DataFrame:
    """Top-k over the persisted 128-bit segments → (doc_id, rank, score
    float64 r6). ``scorer="tfidf"`` (Σ tf·idf) or ``"bm25"`` (k1, b; doc
    lengths from the docmap, block bounds via the admissible global
    min-dl). Ties: score desc, 128-bit docID asc (== md5-hex ascending,
    which a SQL mirror reproduces with ``ORDER BY score DESC,
    md5(url)``). Reads ONLY the query terms' bucket files."""
    from ..functions.tokenize import query_lemmas
    from ..stages.wand128 import (
        topk_conjunctive_bmw_128,
        topk_disjunctive_maxscore_128,
    )

    out = Path(index_dir)
    m = json.loads((out / "manifest.json").read_text())
    n_total = int(m["n_docs_indexed"])
    lemmas = query_lemmas(query)
    empty = pd.DataFrame(
        {
            "doc_id": pd.Series([], dtype="int64"),
            "rank": pd.Series([], dtype="int64"),
            "score": pd.Series([], dtype="float64"),
        }
    )
    if not lemmas or n_total <= 0:
        return empty
    import math

    term_rows: list[tuple[dict, float]] = []
    for t in lemmas:
        # NB: named bkt, not b — `b` is the BM25 length-normalization
        # parameter read by the weight closure below
        bkt = int(md5_u64([t])[0] % np.uint64(m["n_buckets"]))
        f = out / f"bucket={bkt:05d}.parquet"
        df_count = 0
        row = None
        if f.exists():
            tbl = pq.read_table(f, filters=[("term", "==", t)])
            if len(tbl):
                merged = [posting_row_128_from_storage(r) for r in tbl.to_pylist()]
                row = merged[0]
                if len(merged) > 1:
                    from ..stages.codec import merge_posting_payloads_128

                    row = merge_posting_payloads_128(merged)
                df_count = int(row["df"])
        idf = math.log((n_total + 1) / (df_count + 1))
        if row is not None:
            term_rows.append((row, idf))
        elif mode == "and":
            return empty  # a lemma with no postings empties the AND

    if not term_rows:
        return empty

    if scorer == "bm25":
        # doc lengths keyed by the 128-bit id; the whole docmap is
        # ~32 B/doc (at cluster scale each query actor holds its shard)
        dmt = pq.read_table(
            out / "docmap.parquet", columns=["doc_hi", "doc_lo", "doc_len"]
        )
        dl_lut = {
            (int(h) % _U64, int(l) % _U64): float(d)
            for h, l, d in zip(
                dmt["doc_hi"].to_pylist(),
                dmt["doc_lo"].to_pylist(),
                dmt["doc_len"].to_pylist(),
            )
        }
        avgdl = max(1.0, float(m["sum_doc_len"]) / max(1, n_total))
        min_dl = float(m.get("min_doc_len", 0))

        def weight(tfs: np.ndarray, idf: float, docs=None) -> np.ndarray:
            t = tfs.astype(np.float64)
            if docs is None:  # bound: dl → global min (admissible)
                denom = t + k1 * (1.0 - b + b * min_dl / avgdl)
            else:
                hi_a, lo_a = docs
                dl = np.array(
                    [
                        dl_lut[(int(h), int(l))]
                        for h, l in zip(hi_a.tolist(), lo_a.tolist())
                    ],
                    np.float64,
                )
                denom = t + k1 * (1.0 - b + b * dl / avgdl)
            return idf * (t * (k1 + 1.0)) / denom

    else:

        def weight(tfs: np.ndarray, idf: float, _docs=None) -> np.ndarray:
            return tfs.astype(np.float64) * idf

    fn = topk_conjunctive_bmw_128 if mode == "and" else topk_disjunctive_maxscore_128
    docs, scores = fn(term_rows, k, weight)
    if not docs:
        return empty
    # (hi, lo) → doc_id via the docmap (filtered read: only the hit rows'
    # row groups decode)
    want_hi = [h - _U64 if h >= (1 << 63) else h for h, _ in docs]
    dm = pq.read_table(
        out / "docmap.parquet", filters=[("doc_hi", "in", list(set(want_hi)))]
    )
    lut = {
        (int(h) % _U64, int(l) % _U64): int(d)
        for h, l, d in zip(
            dm["doc_hi"].to_pylist(), dm["doc_lo"].to_pylist(), dm["doc_id"].to_pylist()
        )
    }
    ids = [lut[(h, l)] for h, l in docs]
    return pd.DataFrame(
        {
            "doc_id": np.asarray(ids, np.int64),
            "rank": np.arange(1, len(ids) + 1, dtype=np.int64),
            "score": np.round(scores, 6),
        }
    )
