"""Percolation — stored-query alerting over a document stream.

The inverse of search: a registered set of standing queries (saved
searches, content alerts, routing rules) is matched against every NEW
document as it arrives, emitting (query_id, doc_id) for each hit. The
reference engine's multi-word semantics are AND (every query lemma must
appear in the page — service/SearchServiceImpl.java:96-116 intersects
the per-lemma page sets); percolation applies the same rule per stored
query.

Ray-Data-first shape: the query set is the STATE — compiled once per
actor in ``__init__`` (ST-pattern: never per batch) — and the corpus
streams through ``map_batches`` shuffle-free. At cluster scale the
query set is the small broadcast side (thousands of alerts vs billions
of docs); fan-out is bounded by matches, never by |queries| × |docs|.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..functions.tokenize import query_lemmas

_EMPTY = pa.table(
    {
        "query_id": pa.array([], pa.int64()),
        "doc_id": pa.array([], pa.int64()),
    }
)


class PercolateBatch:
    """Actor-pool stage: compile the stored queries once, then match
    each Arrow batch fully vectorized — distinct (doc, term) pairs via
    one dictionary encode, per-query-term membership via searchsorted
    over the sorted pair keys, AND-fold across the query's terms."""

    def __init__(self, queries: list[str]) -> None:
        # query_id = position in the registered list; lemmas distinct
        # per query (D3 — duplicate words in a saved search are one
        # condition)
        self.compiled: list[tuple[int, list[str]]] = [
            (qid, query_lemmas(q)) for qid, q in enumerate(queries)
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.hashing import flat_nonempty_tokens

        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        toks, parents, _ = flat_nonempty_tokens(batch.column("text"))
        if not len(toks):
            return _EMPTY
        denc = toks.dictionary_encode()
        codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = {t: i for i, t in enumerate(denc.dictionary.to_pylist())}
        nv = np.int64(len(vocab))
        pair_keys = np.unique(parents.astype(np.int64) * nv + codes)
        n_rows = np.int64(len(batch))

        out_q: list[np.ndarray] = []
        out_d: list[np.ndarray] = []
        for qid, lemmas in self.compiled:
            if not lemmas:
                continue
            hit = np.ones(int(n_rows), dtype=bool)
            for t in lemmas:
                code = vocab.get(t)
                if code is None:
                    hit[:] = False
                    break
                # membership of (row, code) in the sorted distinct pairs
                probe = np.arange(n_rows, dtype=np.int64) * nv + code
                idx = np.searchsorted(pair_keys, probe)
                idx = np.clip(idx, 0, pair_keys.size - 1)
                hit &= pair_keys[idx] == probe
            rows = np.flatnonzero(hit)
            if rows.size:
                out_q.append(np.full(rows.size, qid, np.int64))
                out_d.append(doc_ids[rows])
        if not out_q:
            return _EMPTY
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "doc_id": pa.array(np.concatenate(out_d), pa.int64()),
            }
        )


def percolate_ds(
    documents: rd.Dataset, queries: list[str], *, concurrency=(1, 4)
) -> rd.Dataset:
    """→ (query_id, doc_id): every (stored query, document) AND-match.
    Queries compile once per worker process (cached-kernel tasks,
    stages/taskpool.py); documents stream through one shuffle-free
    pass.  ``concurrency`` is accepted for API compatibility."""
    from ..stages.taskpool import cached_kernel_map

    return cached_kernel_map(
        documents.select_columns(["doc_id", "text"]), PercolateBatch,
        {"queries": tuple(queries)},
    )
