"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale shapes (100 TB framing):
* exact — hash the content in a map_batches pass, shuffle only
  (hash, doc_id); survivors = min doc_id per hash. Text never enters
  the exchange.
* MinHash-LSH — shingle→signature per batch (vectorized universal
  hashing), explode to (band_id, band_hash, doc_id) rows, ONE groupby
  on the band key; candidate pairs verified by signature-estimated
  Jaccard. No pairwise pass outside LSH buckets.
* SimHash — 64-bit weighted fingerprint per doc; near-dup candidates
  via 4×16-bit band blocking (Hamming ≤ 3 ⇒ some band equal).
* n-gram Jaccard — exact verify of candidate pairs inside buckets.
* embedding-cosine — random-hyperplane LSH bucketing, exact cosine
  verify within buckets.
All emit candidate-pair / survivor tables, never materialize the corpus.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ..stages.tokenizer import token_lists

_MERSENNE = (1 << 61) - 1


# ---------------------------------------------------------------- exact
def _content_hash_stage(batch: pa.Table, text_col: str, id_col: str) -> pa.Table:
    texts = batch.column(text_col).to_pylist()
    hashes = [hashlib.md5((t or "").encode("utf-8")).hexdigest() for t in texts]
    return pa.table(
        {
            id_col: batch.column(id_col),
            "content_hash": pa.array(hashes, type=pa.string()),
        }
    )


def exact_dedup(documents: rd.Dataset, text_col: str = "text", id_col: str = "doc_id") -> rd.Dataset:
    """→ (doc_id, n_copies): the surviving (minimum) doc_id per distinct
    content, with its duplicate count. D1-exact semantics generalized
    from the reference's (site,path) upsert dedup."""
    from ..stages.grouping import bucketed_group_apply

    hashed = documents.map_batches(
        lambda b: _content_hash_stage(b, text_col, id_col), batch_format="pyarrow"
    )

    def keep_min_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        out = (
            bucket.groupby("content_hash", sort=False)[id_col]
            .agg(["min", "size"])
            .reset_index(drop=True)
            .rename(columns={"min": id_col, "size": "n_copies"})
        )
        out[id_col] = out[id_col].astype("int64")
        out["n_copies"] = out["n_copies"].astype("int64")
        return out

    return bucketed_group_apply(hashed, ["content_hash"], keep_min_bucket, n_buckets=64)



def _dedup_pair_rows(pairs: rd.Dataset, cols: list[str]) -> rd.Dataset:
    """Same pair can surface from several LSH bands/buckets — keep one.
    Hash-bucketed + vectorized drop_duplicates (no per-pair groups)."""
    from ..stages.grouping import bucketed_group_apply

    return bucketed_group_apply(
        pairs, cols, lambda b: b.drop_duplicates(cols), n_buckets=32
    )


# ------------------------------------------------------------- minhash
class MinHashSignatures:
    """Actor stage: text → MinHash signature over word shingles.

    Universal hashing h_i(x) = (a_i·x + b_i) mod p over 61-bit shingle
    hashes; (a, b) drawn once per actor from a fixed seed so signatures
    are deterministic across runs and cluster sizes."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 3, seed: int = 42) -> None:
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.k = shingle_k

    def _shingle_hashes(self, tokens: list[str]) -> np.ndarray:
        if len(tokens) < self.k:
            shingles = [" ".join(tokens)] if tokens else []
        else:
            shingles = [" ".join(tokens[i: i + self.k]) for i in range(len(tokens) - self.k + 1)]
        if not shingles:
            return np.empty(0, dtype=np.uint64)
        h = pd.util.hash_array(np.asarray(shingles, dtype=object), categorize=False)
        return (h % np.uint64(_MERSENNE)).astype(np.uint64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        lists = token_lists(batch.column("text"))
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        sigs = np.full((len(batch), self.num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
        for i, row in enumerate(lists.to_pylist()):
            x = self._shingle_hashes([t for t in row if t])
            if x.size == 0:
                continue
            # (P, S) = a[:,None]*x[None,:] + b → min over shingles
            vals = (self.a[:, None] * x[None, :] + self.b[:, None]) % np.uint64(_MERSENNE)
            sigs[i] = vals.min(axis=1)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "signature": pa.array(list(sigs.astype(np.int64)), type=pa.list_(pa.int64())),
            }
        )


def minhash_lsh_pairs(
    documents: rd.Dataset,
    *,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.6,
    seed: int = 42,
) -> rd.Dataset:
    """→ candidate near-duplicate pairs (doc_a < doc_b, est_jaccard ≥
    threshold), estimated from signature agreement. Pipeline:
    signatures (actor pool) → band explode → groupby(band) → pairs →
    signature-verify (the signatures travel with the rows, no second
    corpus pass)."""
    rows_per_band = num_perm // bands
    sigs = documents.map_batches(
        MinHashSignatures,
        fn_constructor_kwargs={"num_perm": num_perm, "shingle_k": shingle_k, "seed": seed},
        batch_format="pyarrow",
        concurrency=(1, 8),
    )

    def explode_with_sig(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        sig_rows = batch.column("signature").to_pylist()
        n = len(doc_ids)
        cols = {"band_id": [], "band_hash": [], "doc_id": [], "signature": []}
        for i in range(n):
            row = np.asarray(sig_rows[i], dtype=np.int64)
            for b in range(bands):
                seg = row[b * rows_per_band: (b + 1) * rows_per_band]
                bh = int.from_bytes(hashlib.md5(seg.tobytes()).digest()[:8], "little") >> 1
                cols["band_id"].append(b)
                cols["band_hash"].append(bh)
                cols["doc_id"].append(int(doc_ids[i]))
                cols["signature"].append(sig_rows[i])
        return pa.table(
            {
                "band_id": pa.array(cols["band_id"], pa.int32()),
                "band_hash": pa.array(cols["band_hash"], pa.int64()),
                "doc_id": pa.array(cols["doc_id"], pa.int64()),
                "signature": pa.array(cols["signature"], pa.list_(pa.int64())),
            }
        )

    exploded = sigs.map_batches(explode_with_sig, batch_format="pyarrow")

    def bucket_pairs(bucket: pd.DataFrame) -> pd.DataFrame:
        a_out, b_out, j_out = [], [], []
        for _, grp in bucket.groupby(["band_id", "band_hash"], sort=False):
            if len(grp) < 2:
                continue
            ids = grp["doc_id"].to_numpy(np.int64)
            sig = np.asarray(list(grp["signature"]), dtype=np.int64)
            order = np.argsort(ids)
            ids, sig = ids[order], sig[order]
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    if ids[i] == ids[j]:
                        continue
                    est = float((sig[i] == sig[j]).mean())
                    if est >= threshold:
                        a_out.append(int(ids[i]))
                        b_out.append(int(ids[j]))
                        j_out.append(round(est, 6))
        return pd.DataFrame(
            {"doc_a": np.array(a_out, np.int64), "doc_b": np.array(b_out, np.int64),
             "est_jaccard": np.array(j_out, np.float64)}
        )

    from ..stages.grouping import bucketed_group_apply

    pairs = bucketed_group_apply(exploded, ["band_id", "band_hash"], bucket_pairs, n_buckets=32)
    return _dedup_pair_rows(pairs, ["doc_a", "doc_b"])


# -------------------------------------------------------------- simhash
def simhash_stage(batch: pa.Table, seed: int = 42) -> pa.Table:
    """64-bit SimHash per doc: sign-sum of term-hash bit vectors weighted
    by tf. Deterministic (pd.util.hash_array term hashing)."""
    lists = token_lists(batch.column("text"))
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    out = np.zeros(len(batch), dtype=np.uint64)
    for i, row in enumerate(lists.to_pylist()):
        toks = [t for t in row if t]
        if not toks:
            continue
        uniq, counts = np.unique(np.asarray(toks, dtype=object), return_counts=True)
        h = pd.util.hash_array(uniq, categorize=False)
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
        acc = ((bits * 2 - 1) * counts[:, None]).sum(axis=0)
        bits_pos = np.flatnonzero(acc > 0).astype(np.uint64)
        val = np.uint64(0)
        for bpos in bits_pos:
            val |= np.uint64(1) << bpos
        out[i] = val
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "simhash": pa.array(out.astype(np.int64) & np.int64(0x7FFF_FFFF_FFFF_FFFF), type=pa.int64()),
        }
    )


def simhash_ds(documents: rd.Dataset) -> rd.Dataset:
    return documents.map_batches(simhash_stage, batch_format="pyarrow")


def simhash_near_pairs(documents: rd.Dataset, max_hamming: int = 3) -> rd.Dataset:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming, found via
    4×16-bit band blocking (pigeonhole: ≤3 differing bits ⇒ ≥1 equal band)."""
    sh = simhash_ds(documents)

    def explode_bands(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        hs = batch.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        n = len(ids)
        band_id = np.tile(np.arange(4, dtype=np.int32), n)
        band_val = np.empty(4 * n, dtype=np.int64)
        for b in range(4):
            band_val[b::4] = ((hs >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
        return pa.table(
            {
                "band_id": pa.array(band_id),
                "band_val": pa.array(band_val),
                "doc_id": pa.array(np.repeat(ids, 4), type=pa.int64()),
                "simhash": pa.array(np.repeat(hs.astype(np.int64), 4), type=pa.int64()),
            }
        )

    exploded = sh.map_batches(explode_bands, batch_format="pyarrow")

    def bucket_pairs(bucket: pd.DataFrame) -> pd.DataFrame:
        a_out, b_out, d_out = [], [], []
        for _, grp in bucket.groupby(["band_id", "band_val"], sort=False):
            if len(grp) < 2:
                continue
            ids = grp["doc_id"].to_numpy(np.int64)
            hs = grp["simhash"].to_numpy(np.int64).astype(np.uint64)
            order = np.argsort(ids)
            ids, hs = ids[order], hs[order]
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    if ids[i] == ids[j]:
                        continue
                    d = int(bin(int(hs[i]) ^ int(hs[j])).count("1"))
                    if d <= max_hamming:
                        a_out.append(int(ids[i]))
                        b_out.append(int(ids[j]))
                        d_out.append(d)
        return pd.DataFrame(
            {"doc_a": np.array(a_out, np.int64), "doc_b": np.array(b_out, np.int64),
             "hamming": np.array(d_out, np.int64)}
        )

    from ..stages.grouping import bucketed_group_apply

    pairs = bucketed_group_apply(exploded, ["band_id", "band_val"], bucket_pairs, n_buckets=32)
    return _dedup_pair_rows(pairs, ["doc_a", "doc_b"])


# ------------------------------------------------------ n-gram jaccard
def ngram_jaccard_pairs(
    documents: rd.Dataset, *, n: int = 3, threshold: float = 0.5, bucket_sample: int = 4
) -> rd.Dataset:
    """Exact word-n-gram Jaccard near-dup pairs. Candidates come from
    shared MIN-n-gram buckets (each doc keys on its ``bucket_sample``
    smallest n-gram hashes — a deterministic 'cheap LSH'); exact Jaccard
    is verified inside the bucket from the n-gram hash sets carried on
    the rows."""

    def to_ngrams(batch: pa.Table) -> pa.Table:
        lists = token_lists(batch.column("text"))
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        out = {"bucket": [], "doc_id": [], "grams": []}
        for i, row in enumerate(lists.to_pylist()):
            toks = [t for t in row if t]
            grams = (
                [" ".join(toks[k: k + n]) for k in range(len(toks) - n + 1)]
                if len(toks) >= n
                else ([" ".join(toks)] if toks else [])
            )
            if not grams:
                continue
            gh = np.unique(
                (pd.util.hash_array(np.asarray(grams, dtype=object), categorize=False) % np.uint64(_MERSENNE)).astype(np.int64)
            )
            for b in np.sort(gh)[:bucket_sample]:
                out["bucket"].append(int(b))
                out["doc_id"].append(int(ids[i]))
                out["grams"].append(gh.tolist())
        return pa.table(
            {
                "bucket": pa.array(out["bucket"], pa.int64()),
                "doc_id": pa.array(out["doc_id"], pa.int64()),
                "grams": pa.array(out["grams"], pa.list_(pa.int64())),
            }
        )

    exploded = documents.map_batches(to_ngrams, batch_format="pyarrow")

    def bucket_pairs(bucket: pd.DataFrame) -> pd.DataFrame:
        a_out, b_out, j_out = [], [], []
        for _, grp in bucket.groupby("bucket", sort=False):
            if len(grp) < 2:
                continue
            ids = grp["doc_id"].to_numpy(np.int64)
            grams = list(grp["grams"])
            order = np.argsort(ids)
            for x in range(len(order)):
                for y in range(x + 1, len(order)):
                    i, j = order[x], order[y]
                    if ids[i] == ids[j]:
                        continue
                    s1, s2 = set(grams[i]), set(grams[j])
                    jac = len(s1 & s2) / len(s1 | s2) if (s1 or s2) else 0.0
                    if jac >= threshold:
                        a_out.append(int(ids[i]))
                        b_out.append(int(ids[j]))
                        j_out.append(round(jac, 6))
        return pd.DataFrame(
            {"doc_a": np.array(a_out, np.int64), "doc_b": np.array(b_out, np.int64),
             "jaccard": np.array(j_out, np.float64)}
        )

    from ..stages.grouping import bucketed_group_apply

    pairs = bucketed_group_apply(exploded, ["bucket"], bucket_pairs, n_buckets=32)
    return _dedup_pair_rows(pairs, ["doc_a", "doc_b"])


# ------------------------------------------- embedding cosine near-dup
def embedding_near_pairs(
    embeddings: rd.Dataset,
    *,
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> rd.Dataset:
    """Embedding near-duplicate pairs (cosine ≥ threshold) via
    random-hyperplane LSH bucketing + exact in-bucket verify (float64).
    High thresholds ⇒ near-identical sign patterns ⇒ same bucket with
    high probability; n_planes trades recall vs bucket size."""

    def bucketize(batch: pa.Table) -> pa.Table:
        vecs = np.asarray(batch.column(vec_col).to_pylist(), dtype=np.float64)
        dim = vecs.shape[1] if vecs.ndim == 2 else 0
        rng = np.random.default_rng(seed)  # same planes every batch
        planes = rng.standard_normal((dim, n_planes))
        signs = (vecs @ planes) > 0
        keys = np.zeros(len(vecs), dtype=np.int64)
        for p in range(n_planes):
            keys |= signs[:, p].astype(np.int64) << p
        norms = np.linalg.norm(vecs, axis=1)
        return pa.table(
            {
                "bucket": pa.array(keys),
                id_col: batch.column(id_col),
                vec_col: batch.column(vec_col),
                "norm": pa.array(norms),
            }
        )

    bucketed = embeddings.map_batches(bucketize, batch_format="pyarrow")

    def bucket_pairs(bucket: pd.DataFrame) -> pd.DataFrame:
        a_out, b_out, c_out = [], [], []
        for _, grp in bucket.groupby("bucket", sort=False):
            if len(grp) < 2:
                continue
            ids = grp[id_col].to_numpy(np.int64)
            vecs = np.asarray(list(grp[vec_col]), dtype=np.float64)
            norms = grp["norm"].to_numpy(np.float64)
            order = np.argsort(ids)
            ids, vecs, norms = ids[order], vecs[order], norms[order]
            sims = (vecs @ vecs.T) / np.maximum(np.outer(norms, norms), 1e-300)
            ii, jj = np.triu_indices(len(ids), k=1)
            good = sims[ii, jj] >= threshold
            for i, j, s in zip(ii[good], jj[good], sims[ii, jj][good]):
                a_out.append(int(ids[i]))
                b_out.append(int(ids[j]))
                c_out.append(round(float(s), 6))
        return pd.DataFrame(
            {"vec_a": np.array(a_out, np.int64), "vec_b": np.array(b_out, np.int64),
             "cosine": np.array(c_out, np.float64)}
        )

    from ..stages.grouping import bucketed_group_apply

    pairs = bucketed_group_apply(bucketed, ["bucket"], bucket_pairs, n_buckets=32)
    return _dedup_pair_rows(pairs, ["vec_a", "vec_b"])
