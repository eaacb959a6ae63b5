"""SemDeDup — semantic deduplication over an embedding column.

Abbas et al. 2023 (arXiv:2303.09540): k-means-cluster the embedding
space so that near-duplicates land in the same cluster, then inside
each cluster compute pairwise cosine similarities and drop every item
that is too similar to another item of the cluster. The pairwise step
never crosses clusters, so the quadratic cost is bounded per cluster
and the whole pass is embarrassingly parallel across clusters — the
paper's own scaling knob is ``n_clusters`` (grow it with the corpus so
per-cluster membership stays bounded).

Determinism contract (mirrors the reference implementation's
triangular-max rule, with ascending ``vec_id`` as the intra-cluster
order instead of centroid distance — any fixed order is valid per the
paper, and ids make the rule SQL-expressible):

    drop(d)  ⇔  ∃ e in cluster(d) with e.vec_id < d.vec_id
                and round(cos(e, d), 6) ≥ threshold

Note this is NOT greedy-against-kept: a dropped item still shadows
later items (exactly what ``torch.triu`` max-per-column does in the
paper's released code). Comparison happens on the 6-decimal-rounded
cosine so the DuckDB oracle (`NOT EXISTS` over within-cluster pairs)
agrees bit for bit.

Scale shape: centroids train once on the deterministic smallest-id
sample (`ann.deterministic_train_vectors`) and broadcast via
``ray.put``; assignment is one batched matmul per block; the
per-cluster pass is a hash-bucketed ``groupby().map_groups`` whose
exchange carries (id, vector, cluster) — no text, no pair explosion.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from ..functions.vectors import embedding_vectors
from ..stages.grouping import bucketed_group_apply
from .ann import _kmeans_lite, deterministic_train_vectors


def assign_clusters(
    embeddings: rd.Dataset,
    *,
    n_clusters: int = 8,
    train_sample: int = 2048,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> rd.Dataset:
    """(id, vector, cluster) — seeded k-means coarse assignment, same
    training recipe as the IVF index (min-id sample, ``_kmeans_lite``);
    argmin ties resolve to the smallest cluster id (numpy first-min ==
    the oracle's ``ORDER BY dist, c``)."""
    sample = deterministic_train_vectors(
        embeddings, train_sample, id_col=id_col, vec_col=vec_col
    )
    cents = _kmeans_lite(sample, n_clusters, seed=seed)
    cents_ref = [ray.put(cents)]

    def assign(batch: pa.Table) -> pa.Table:
        vecs = embedding_vectors(batch.column(vec_col))
        if not len(vecs):
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    vec_col: batch.column(vec_col),
                    "cluster": pa.array([], pa.int64()),
                }
            )
        c = ray.get(cents_ref[0])
        d = ((vecs[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        cl = d.argmin(axis=1).astype(np.int64)
        return pa.table(
            {
                id_col: batch.column(id_col),
                vec_col: batch.column(vec_col),
                "cluster": pa.array(cl),
            }
        )

    return embeddings.map_batches(assign, batch_format="pyarrow", batch_size=4096)


def semdedup_keep(
    embeddings: rd.Dataset,
    *,
    n_clusters: int = 8,
    train_sample: int = 2048,
    seed: int = 42,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> rd.Dataset:
    """Per-vector SemDeDup verdict: ``(vec_id, cluster, keep)`` with
    ``keep`` ∈ {0, 1} (BIGINT for oracle-hash stability). See module
    docstring for the exact drop rule.

    The per-cluster similarity pass materializes one cluster at a time
    inside ``map_groups``; the row-chunked triangular scan bounds the
    similarity matrix to ``chunk × cluster_size`` so a hub cluster
    costs memory linear in its size, not quadratic."""

    assigned = assign_clusters(
        embeddings,
        n_clusters=n_clusters,
        train_sample=train_sample,
        seed=seed,
        id_col=id_col,
        vec_col=vec_col,
    )

    def per_cluster(grp: pd.DataFrame) -> pd.DataFrame:
        ids_out, cl_out, keep_out = [], [], []
        for cl, g in grp.groupby("cluster", sort=False):
            ids = g[id_col].to_numpy(np.int64)
            vecs = np.asarray(list(g[vec_col]), dtype=np.float64)
            order = np.argsort(ids)
            ids, vecs = ids[order], vecs[order]
            vn = vecs / np.maximum(
                np.linalg.norm(vecs, axis=1, keepdims=True), 1e-300
            )
            n = len(ids)
            drop = np.zeros(n, dtype=bool)
            # chunked upper-triangle scan: rows i compare only against
            # earlier rows [0, i) — memory is chunk×n, not n×n
            chunk = 2048
            for lo in range(1, n, chunk):
                hi = min(lo + chunk, n)
                sims = np.round(vn[lo:hi] @ vn[:hi].T, 6)
                # mask out self and later-id columns per row
                col = np.arange(hi)
                row = np.arange(lo, hi)
                earlier = col[None, :] < row[:, None]
                drop[lo:hi] = ((sims >= threshold) & earlier).any(axis=1)
            ids_out.append(ids)
            cl_out.append(np.full(n, cl, np.int64))
            keep_out.append((~drop).astype(np.int64))
        if not ids_out:
            return pd.DataFrame(
                {
                    id_col: np.array([], np.int64),
                    "cluster": np.array([], np.int64),
                    "keep": np.array([], np.int64),
                }
            )
        return pd.DataFrame(
            {
                id_col: np.concatenate(ids_out),
                "cluster": np.concatenate(cl_out),
                "keep": np.concatenate(keep_out),
            }
        )

    return bucketed_group_apply(
        assigned, ["cluster"], per_cluster, n_buckets=max(8, min(64, n_clusters))
    )
