"""Persisted, partitioned ANN index (the 100 TB serving story).

Round-1 ANN operators re-scanned (and re-signed / re-trained over) the
full embedding corpus on EVERY query call. This module writes the
bucketed layout ONCE — a build-time Ray job with a lineage manifest,
exactly like the posting segments — and serves top-k by reading only
the probed partitions:

* LSH index — random-hyperplane signature per vector (seeded planes →
  reproducible across runs/cluster sizes); one Parquet partition file
  per bucket key, written atomically via a groupby(bucket) writer.
  ``AnnIndex.topk`` computes the query's probe set (exact signature +
  1-bit + 2-bit flips, same semantics as ``ann.lsh_topk``) and reads ≤
  n_probes partition files.
* IVF index — k-means coarse quantizer trained on a seeded sample
  (driver-side, tiny); one partition per inverted list; queries probe
  the ``n_probe`` nearest lists.

Partitioning assumption (documented per the operator contract): the
bucket/list id is the ONE shuffle key; at cluster scale partitions are
directories of many files and the probe read is a partition-pruned
``read_parquet`` instead of single files. Recall equals the scan-based
operators' (same candidate rule) and is tested against brute force.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

from ..functions.vectors import embedding_vectors
from ..state.manifest import atomic_write_json, fingerprint_inputs, read_json
from .ann import _kmeans_lite, _plane_signatures, deterministic_train_vectors


def _clear_stale_partitions(index_dir: Path, key_col: str) -> None:
    """A rebuild (fingerprint mismatch) rewrites every live partition,
    but a partition whose key gets NO vectors under the new parameters
    would otherwise linger from the old layout and pollute probes.
    Tombstones and delete markers refer to the OLD corpus — a rebuild
    drops them too (same invalidation rule as the positional index)."""
    for f in index_dir.glob(f"{key_col}=*.parquet"):
        f.unlink()
    for f in index_dir.glob(f"{key_col}=*.parquet.tmp"):
        f.unlink()
    for f in index_dir.glob("ann_tombstone-*.parquet"):
        f.unlink()
    for f in index_dir.glob("ann_delete.*.json"):
        f.unlink()
    for f in index_dir.glob("ann_append.*.json"):
        f.unlink()


def _ann_delta_seq(f: Path) -> int:
    return int(f.name.rsplit("delta-", 1)[1].split(".")[0])


def _ann_base_seq(f: Path) -> int:
    """LSM seq a base partition is current through: −1 for a fresh
    build, else the max folded seq recorded (atomically, inside the
    parquet file) by compaction — the posindex discipline."""
    meta = pq.read_schema(f).metadata or {}
    return int(meta.get(b"base_seq", b"-1"))


def _ann_next_seq(out: Path) -> int:
    seqs = [
        int(f.name.split("-", 1)[1].split(".")[0])
        for f in out.glob("ann_tombstone-*.parquet")
    ] + [_ann_delta_seq(f) for f in out.glob("*=*.delta-*.parquet")]
    return max(seqs) + 1 if seqs else 0


def _ann_tombstones(out: Path) -> list[tuple[int, np.ndarray]]:
    tombs = []
    for f in sorted(out.glob("ann_tombstone-*.parquet")):
        seq = int(f.name.split("-", 1)[1].split(".")[0])
        ids = pq.read_table(f, columns=["vec_id"]).column("vec_id").to_numpy()
        tombs.append((seq, np.unique(ids.astype(np.int64))))
    return tombs


def _ann_dead_union(tombs, seg_seq: int):
    """Tombstoned ids that apply to a segment written at ``seg_seq`` —
    only deletes issued AFTER it kill its rows, so delete→re-append
    keeps the re-added vector."""
    rel = [a for s, a in (tombs or []) if s > seg_seq]
    if not rel:
        return None
    return rel[0] if len(rel) == 1 else np.unique(np.concatenate(rel))


def delete_vectors(index_dir: str | Path, vec_ids, input_token: str | None = None) -> dict:
    """Tombstone-delete vectors from a persisted ANN index: one kill-set
    parquet (atomic tmp+rename) sharing the LSM seq counter with append
    deltas, so a delete→re-append keeps the re-added vector. Probes
    filter per SEGMENT seq at read time; ``compact_ann_index`` folds
    the kill set. Same-token re-deletes are skipped (marker file)."""
    import hashlib as _hl

    out = Path(index_dir)
    if input_token is not None:
        marker = out / f"ann_delete.{_hl.md5(input_token.encode()).hexdigest()[:10]}.json"
        if marker.exists():
            return json.loads(marker.read_text())
    ids = np.unique(np.asarray(list(vec_ids), dtype=np.int64))
    seq = _ann_next_seq(out)
    tmp = out / f"ann_tombstone-{seq:04d}.parquet.tmp"
    pq.write_table(pa.table({"vec_id": pa.array(ids, pa.int64())}), tmp)
    os.replace(tmp, out / f"ann_tombstone-{seq:04d}.parquet")
    res = {"seq": seq, "n_tombstoned": int(len(ids))}
    if input_token is not None:
        mt = Path(str(marker) + ".tmp")
        mt.write_text(json.dumps(res))
        os.replace(mt, marker)
    return res


def _dead_vec_ids(index_dir: Path) -> np.ndarray:
    """Flat union of all live tombstoned ids (introspection; the read
    path filters per segment seq via ``_ann_dead_union``)."""
    tombs = _ann_tombstones(index_dir)
    if not tombs:
        return np.empty(0, np.int64)
    return np.unique(np.concatenate([a for _, a in tombs]))


def append_vectors(
    index_dir: str | Path,
    embeddings: rd.Dataset,
    input_token: str | None = None,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """LSM-style micro-batch vector ingest: key the NEW vectors with the
    index's FROZEN quantizer (the seeded hyperplanes for LSH, the
    persisted centroids for IVF — standard frozen-codebook streaming
    insert) and write one DELTA file per touched partition
    (``key=NNNNN.delta-SSSS.parquet``, atomic tmp+rename). vec_ids must
    be new — the caller's versioning contract, as everywhere in this
    repo's LSM paths. Probes merge base + deltas per partition;
    ``compact_ann_index`` folds them. Same-token re-appends are
    skipped (marker)."""
    import hashlib as _hl

    out = Path(index_dir)
    mf = read_json(out / "ann_manifest.json")
    if not mf:
        raise FileNotFoundError(f"no ann_manifest.json under {index_dir}")
    if input_token is not None:
        marker = out / f"ann_append.{_hl.md5(input_token.encode()).hexdigest()[:10]}.json"
        if marker.exists():
            return json.loads(marker.read_text())
    seq = _ann_next_seq(out)
    kind = mf["kind"]
    key_col = "bucket" if kind == "lsh" else "list"
    dim = int(mf["dim"])
    if kind == "lsh":
        rng = np.random.default_rng(int(mf["seed"]))
        planes = rng.standard_normal((dim, int(mf["n_planes"])))
        cents = None
    else:
        planes = None
        cents = np.load(out / "centroids.npy")

    def tag(batch: pa.Table) -> pa.Table:
        vecs = embedding_vectors(batch.column(vec_col))
        if kind == "lsh":
            keys = _plane_signatures(vecs, planes)
        else:
            d = ((vecs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            keys = d.argmin(axis=1).astype(np.int64)
        norms = np.linalg.norm(vecs, axis=1)
        return pa.table(
            {
                key_col: pa.array(np.asarray(keys, np.int64), pa.int64()),
                "vec_id": batch.column(id_col),
                "embedding": batch.column(vec_col),
                "norm": pa.array(norms, pa.float64()),
            }
        )

    def write_delta(group: pd.DataFrame) -> pd.DataFrame:
        if not len(group):
            return pd.DataFrame({key_col: np.array([], np.int64), "n": np.array([], np.int64)})
        key = int(group[key_col].iloc[0])
        tbl = pa.Table.from_pandas(
            group.sort_values("vec_id").reset_index(drop=True), preserve_index=False
        )
        final = out / f"{key_col}={key:05d}.delta-{seq:04d}.parquet"
        tmp = Path(str(final) + ".tmp")
        pq.write_table(tbl, tmp)
        os.replace(tmp, final)
        return pd.DataFrame({key_col: [key], "n": [len(group)]})

    res_df = (
        embeddings.map_batches(tag, batch_format="pyarrow")
        .groupby(key_col)
        .map_groups(write_delta, batch_format="pandas")
        .to_pandas()
    )
    res = {
        "seq": seq,
        "n_partitions_touched": int(len(res_df)),
        "n_vectors": int(res_df["n"].sum()) if len(res_df) else 0,
    }
    if input_token is not None:
        mt = Path(str(marker) + ".tmp")
        mt.write_text(json.dumps(res))
        os.replace(mt, marker)
    return res


def compact_ann_index(index_dir: str | Path) -> dict:
    """Fold every delta file and live tombstone into its base partition
    (one Ray task per partition — independent bucket/list shards), then
    drop deltas and tombstones. Probe results identical before and
    after (tested); crash-safe via tmp+rename with the fold seq
    recorded INSIDE each base file (a crash between renames and
    tombstone unlink must not re-kill vectors re-appended after the
    tombstone — the posindex discipline)."""
    import ray

    out = Path(index_dir)
    tombs = _ann_tombstones(out)
    mf = read_json(out / "ann_manifest.json")
    key_col = "bucket" if mf.get("kind") == "lsh" else "list"
    deltas = list(out.glob(f"{key_col}=*.delta-*.parquet"))
    touched = {f.name.split(".")[0] for f in deltas}
    if tombs:
        touched |= {
            f.name.split(".")[0]
            for f in out.glob(f"{key_col}=*.parquet")
            if "delta-" not in f.name
        }
    touched = sorted(touched)
    if not touched:
        return {"n_partitions_compacted": 0}
    all_seqs = [_ann_delta_seq(f) for f in deltas] + [s for s, _ in tombs]
    fold_seq = max(all_seqs) if all_seqs else None

    @ray.remote
    def fold(prefix: str) -> int:
        base = out / f"{prefix}.parquet"
        segs: list[tuple[pa.Table, int]] = []
        if base.exists():
            segs.append((pq.read_table(base), _ann_base_seq(base)))
        for f in sorted(out.glob(f"{prefix}.delta-*.parquet")):
            segs.append((pq.read_table(f), _ann_delta_seq(f)))
        kept = []
        for tbl, seg_seq in segs:
            dead = _ann_dead_union(tombs, seg_seq)
            if dead is not None and len(tbl):
                ids = tbl.column("vec_id").to_numpy(zero_copy_only=False)
                keep = ~np.isin(ids, dead)
                if not keep.all():
                    tbl = tbl.filter(pa.array(keep))
            if len(tbl):
                kept.append(tbl)
        merged = pa.concat_tables(kept) if kept else None
        if merged is not None and len(merged):
            ids = merged.column("vec_id").to_numpy(zero_copy_only=False)
            # duplicates only from a compaction interrupted between base
            # rename and delta unlink — keep the first (base) copy
            order = np.argsort(ids, kind="stable")
            sids = ids[order]
            keep = np.empty(len(sids), dtype=bool)
            keep[0] = True
            np.not_equal(sids[1:], sids[:-1], out=keep[1:])
            merged = merged.take(pa.array(order[keep]))
        else:
            merged = None
        if merged is None:
            merged = pa.table(
                {
                    key_col: pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "embedding": pa.array([], pa.list_(pa.float32())),
                    "norm": pa.array([], pa.float64()),
                }
            )
        if fold_seq is not None:
            merged = merged.replace_schema_metadata(
                {b"base_seq": str(fold_seq).encode()}
            )
        tmp = Path(str(base) + ".tmp")
        pq.write_table(merged, tmp)
        os.replace(tmp, base)
        for f in sorted(out.glob(f"{prefix}.delta-*.parquet")):
            f.unlink()
        return len(merged)

    counts = ray.get([fold.remote(p) for p in touched])
    for f in out.glob("ann_tombstone-*.parquet"):
        f.unlink()
    return {"n_partitions_compacted": len(touched), "n_rows": int(sum(counts))}


def _partition_writer(index_dir: Path, key_col: str):
    """map_groups body: write one partition file per key, atomically."""

    def write_group(group: pd.DataFrame) -> pd.DataFrame:
        if not len(group):
            return pd.DataFrame({key_col: np.array([], np.int64), "n": np.array([], np.int64)})
        key = int(group[key_col].iloc[0])
        tbl = pa.Table.from_pandas(
            group.sort_values("vec_id").reset_index(drop=True), preserve_index=False
        )
        final = index_dir / f"{key_col}={key:05d}.parquet"
        tmp = index_dir / f"{key_col}={key:05d}.parquet.tmp"
        pq.write_table(tbl, tmp)
        os.replace(tmp, final)
        return pd.DataFrame({key_col: [key], "n": [len(group)]})

    return write_group


def build_lsh_index(
    embeddings: rd.Dataset,
    index_dir: str | Path,
    *,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    input_token: str = "",
    input_files: list[str] | None = None,
) -> dict:
    """Write the hyperplane-bucketed layout once; resumable (manifest
    fingerprint short-circuits an identical rebuild; ``input_files``
    stats invalidate it when the source data changes)."""
    index_dir = Path(index_dir)
    index_dir.mkdir(parents=True, exist_ok=True)
    params = {"kind": "lsh", "n_planes": n_planes, "seed": seed, "input": input_token}
    fp = fingerprint_inputs(input_files or [], params)
    mf = read_json(index_dir / "ann_manifest.json")
    if mf and mf.get("fingerprint") == fp:
        return mf
    _clear_stale_partitions(index_dir, "bucket")

    def tag(batch: pa.Table) -> pa.Table:
        vecs = embedding_vectors(batch.column(vec_col))
        dim = vecs.shape[1]
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((dim, n_planes))
        keys = _plane_signatures(vecs, planes)
        norms = np.linalg.norm(vecs, axis=1)
        return pa.table(
            {
                "bucket": pa.array(keys, pa.int64()),
                "vec_id": batch.column(id_col),
                "embedding": batch.column(vec_col),
                "norm": pa.array(norms, pa.float64()),
            }
        )

    tagged = embeddings.map_batches(tag, batch_format="pyarrow")
    res = (
        tagged.groupby("bucket")
        .map_groups(_partition_writer(index_dir, "bucket"), batch_format="pandas")
        .to_pandas()
    )
    # dim from any partition file (one-row read)
    first = sorted(index_dir.glob("bucket=*.parquet"))[0]
    sample = pq.read_table(first, columns=["embedding"]).column("embedding")
    dim = len(sample[0])
    manifest = {
        "fingerprint": fp,
        **params,
        "dim": int(dim),
        "n_vectors": int(res["n"].sum()) if len(res) else 0,
        "n_partitions": int(len(res)),
    }
    atomic_write_json(index_dir / "ann_manifest.json", manifest)
    return manifest


def build_ivf_index(
    embeddings: rd.Dataset,
    index_dir: str | Path,
    *,
    n_lists: int = 16,
    train_sample: int = 2048,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    input_token: str = "",
    input_files: list[str] | None = None,
) -> dict:
    """Train the coarse quantizer once (seeded sample), persist the
    centroids + one partition per inverted list."""
    index_dir = Path(index_dir)
    index_dir.mkdir(parents=True, exist_ok=True)
    params = {
        "kind": "ivf", "n_lists": n_lists, "train_sample": train_sample,
        "seed": seed, "input": input_token,
        # training sample = the train_sample SMALLEST vec_ids (block-order
        # independent; a limit().take_all() sample was only as reproducible
        # as Ray's scheduling)
        "train_order": "min_vec_id",
    }
    fp = fingerprint_inputs(input_files or [], params)
    mf = read_json(index_dir / "ann_manifest.json")
    if mf and mf.get("fingerprint") == fp:
        return mf
    _clear_stale_partitions(index_dir, "list")

    sample = deterministic_train_vectors(
        embeddings, train_sample, id_col=id_col, vec_col=vec_col
    )
    cents = _kmeans_lite(sample, n_lists, seed=seed)
    np.save(index_dir / "centroids.npy", cents)

    def tag(batch: pa.Table) -> pa.Table:
        vecs = embedding_vectors(batch.column(vec_col))
        d = ((vecs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        lists = d.argmin(axis=1).astype(np.int64)
        norms = np.linalg.norm(vecs, axis=1)
        return pa.table(
            {
                "list": pa.array(lists, pa.int64()),
                "vec_id": batch.column(id_col),
                "embedding": batch.column(vec_col),
                "norm": pa.array(norms, pa.float64()),
            }
        )

    tagged = embeddings.map_batches(tag, batch_format="pyarrow")
    res = (
        tagged.groupby("list")
        .map_groups(_partition_writer(index_dir, "list"), batch_format="pandas")
        .to_pandas()
    )
    manifest = {
        "fingerprint": fp,
        **params,
        "dim": int(cents.shape[1]),
        "n_vectors": int(res["n"].sum()) if len(res) else 0,
        "n_partitions": int(len(res)),
    }
    atomic_write_json(index_dir / "ann_manifest.json", manifest)
    return manifest


class AnnIndex:
    """Query facade over a persisted ANN index directory. Reads ONLY the
    probed partition files per call (``last_files_read`` records them —
    asserted in tests)."""

    def __init__(self, index_dir: str | Path) -> None:
        self.index_dir = Path(index_dir)
        self.manifest = read_json(self.index_dir / "ann_manifest.json")
        if not self.manifest:
            raise FileNotFoundError(f"no ann_manifest.json under {index_dir}")
        self.kind = self.manifest["kind"]
        self.dim = int(self.manifest["dim"])
        if self.kind == "lsh":
            rng = np.random.default_rng(int(self.manifest["seed"]))
            self.planes = rng.standard_normal((self.dim, int(self.manifest["n_planes"])))
        else:
            self.cents = np.load(self.index_dir / "centroids.npy")
        # LSM state: seq-ordered tombstones (filtered per segment at
        # every probe read) until compact_ann_index folds them
        self.tombs = _ann_tombstones(self.index_dir)
        self.dead = _dead_vec_ids(self.index_dir)
        self.last_files_read: list[str] = []

    # -- probe-set construction (mirrors ann.lsh_topk exactly) ---------
    def _lsh_probes(self, qsigs: np.ndarray, n_probes: int) -> list[set[int]]:
        n_planes = int(self.manifest["n_planes"])
        probe_sets: list[set[int]] = []
        for s in qsigs:
            probes = {int(s)}
            for bit in range(n_planes):
                if len(probes) >= n_probes:
                    break
                probes.add(int(s) ^ (1 << bit))
            for b1 in range(n_planes):
                for b2 in range(b1 + 1, n_planes):
                    if len(probes) >= n_probes:
                        break
                    probes.add(int(s) ^ (1 << b1) ^ (1 << b2))
            probe_sets.append(probes)
        return probe_sets

    def _read_partitions(self, key_col: str, keys: list[int]) -> pa.Table | None:
        """Base + LSM delta files per probed key, each filtered by the
        tombstones that postdate it (a tombstone kills only rows written
        before it, so delete→re-append keeps the re-added vector)."""
        tables = []
        self.last_files_read = []
        for key in sorted(keys):
            base = self.index_dir / f"{key_col}={key:05d}.parquet"
            segs: list[tuple[Path, int]] = []
            if base.exists():
                segs.append((base, _ann_base_seq(base)))
            for f in sorted(self.index_dir.glob(f"{key_col}={key:05d}.delta-*.parquet")):
                segs.append((f, _ann_delta_seq(f)))
            for f, seg_seq in segs:
                tbl = pq.read_table(f)
                self.last_files_read.append(f.name)
                dead = _ann_dead_union(self.tombs, seg_seq)
                if dead is not None and len(tbl):
                    ids = tbl.column("vec_id").to_numpy(zero_copy_only=False)
                    keep = ~np.isin(ids, dead)
                    if not keep.all():
                        tbl = tbl.filter(pa.array(keep))
                if len(tbl):
                    tables.append(tbl)
        if not tables:
            return None
        part = pa.concat_tables(tables)
        if len(part):
            ids = part.column("vec_id").to_numpy(zero_copy_only=False)
            # duplicates only from a compaction interrupted between base
            # rename and delta unlink — keep the first (base) copy
            if len(np.unique(ids)) != len(ids):
                order = np.argsort(ids, kind="stable")
                sids = ids[order]
                keep = np.empty(len(sids), dtype=bool)
                keep[0] = True
                np.not_equal(sids[1:], sids[:-1], out=keep[1:])
                part = part.take(pa.array(np.sort(order[keep])))
        return part

    def topk(
        self, queries: np.ndarray, k: int = 10, *, n_probes: int = 9, n_probe: int = 4
    ) -> pa.Table:
        """→ (query_id, rank, vec_id, cosine[r6]) with deterministic
        (cosine desc, vec_id asc) ties — same contract as the scan ops."""
        queries = np.asarray(queries, dtype=np.float64)
        if self.kind == "lsh":
            qsigs = _plane_signatures(queries, self.planes)
            probe_sets = self._lsh_probes(qsigs, n_probes)
            wanted = sorted(set().union(*probe_sets)) if probe_sets else []
            part = self._read_partitions("bucket", wanted)
            key_of_row = "bucket"
        else:
            qd = ((queries[:, None, :] - self.cents[None, :, :]) ** 2).sum(axis=2)
            # stable: distance ties resolve to the smallest list id
            # (mirrored by the SQL oracle's ORDER BY dist, list)
            probe_lists = np.argsort(qd, axis=1, kind="stable")[:, : min(n_probe, len(self.cents))]
            probe_sets = [set(row.tolist()) for row in probe_lists]
            wanted = sorted(set().union(*probe_sets)) if probe_sets else []
            part = self._read_partitions("list", wanted)
            key_of_row = "list"

        out = {"query_id": [], "rank": [], "vec_id": [], "cosine": []}
        if part is not None and len(part):
            vecs = embedding_vectors(part.column("embedding"))
            ids = part.column("vec_id").to_numpy(zero_copy_only=False)
            keys = part.column(key_of_row).to_numpy(zero_copy_only=False)
            norms = part.column("norm").to_numpy(zero_copy_only=False)
            vn = vecs / np.maximum(norms[:, None], 1e-300)
            qn = queries / np.maximum(
                np.linalg.norm(queries, axis=1, keepdims=True), 1e-300
            )
            sims = qn @ vn.T
            for qi, probes in enumerate(probe_sets):
                cand = np.fromiter((kk in probes for kk in keys), dtype=bool, count=len(keys))
                if not cand.any():
                    continue
                row = sims[qi][cand]
                cids = ids[cand]
                idx = np.lexsort((cids, -row))[: min(k, row.size)]
                for rank, j in enumerate(idx):
                    out["query_id"].append(qi)
                    out["rank"].append(rank)
                    out["vec_id"].append(int(cids[j]))
                    out["cosine"].append(round(float(row[j]), 6))
        return pa.table(
            {
                "query_id": pa.array(out["query_id"], pa.int32()),
                "rank": pa.array(out["rank"], pa.int32()),
                "vec_id": pa.array(out["vec_id"], pa.int64()),
                "cosine": pa.array(out["cosine"], pa.float64()),
            }
        )
