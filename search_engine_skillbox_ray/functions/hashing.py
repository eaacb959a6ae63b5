"""Portable content hashing: md5-derived 64-bit hashes + n-gram combines.

Every near-dup operator (MinHash, SimHash, n-gram Jaccard) hashes terms
and n-grams through THESE functions, chosen so the exact same values are
computable in ANSI-ish SQL (DuckDB) for hard oracle checks:

* ``md5_u64(s)``  ==  DuckDB ``md5_number_lower(s)``
  (= little-endian uint64 of the LAST 8 bytes of the md5 digest);
* ``combine3(h1,h2,h3)``  ==
  ``((h1*K1) % 2^64 + (h2*K2) % 2^64 + (h3*K3) % 2^64) % 2^64``
  with the fixed odd constants below (all < 2^62 so each product fits
  DuckDB's HUGEINT);
* gram/shingle hash = ``combine % MERSENNE61``.

numpy uint64 arithmetic wraps mod 2^64, which is exactly the SQL
formula's modulus — both sides agree bit-for-bit.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MERSENNE61 = (1 << 61) - 1

# fixed odd multipliers < 2^62 (HUGEINT-safe in the SQL mirror)
K1 = 0x27D4EB2F165667C5
K2 = 0x165667B19E3779F9
K3 = 0x2545F4914F6CDD1D
_KS = (K1, K2, K3)


def _k_for(j: int) -> int:
    """Position multiplier j (0-based); j>=3 derives deterministically
    (only k=3 grams have a SQL mirror — larger k is engine-only)."""
    if j < 3:
        return _KS[j]
    k = _KS[j % 3]
    for _ in range(j // 3):
        k = (k * 0x9E3779B97F4A7C15) & ((1 << 62) - 1) | 1
    return k


def mod_mersenne61(x: np.ndarray) -> np.ndarray:
    """Exact ``x % (2**61 - 1)`` for uint64 arrays without integer
    division (numpy's uint64 ``%`` divides per element — measured ~20×
    slower than this on shingle-scale arrays): write x = hi·2⁶¹ + lo,
    then x ≡ hi + lo (mod M); hi ≤ 7 so one conditional subtract
    normalizes the sum. Bit-identical to ``%`` (property-tested)."""
    m = np.uint64(MERSENNE61)
    r = (x >> np.uint64(61)) + (x & m)
    return np.where(r >= m, r - m, r)


def md5_u64(values: list[str] | np.ndarray) -> np.ndarray:
    """uint64 per string == DuckDB ``md5_number_lower``."""
    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        d = hashlib.md5(v.encode("utf-8")).digest()
        out[i] = int.from_bytes(d[8:16], "little")
    return out


class TokenHasher:
    """md5_u64 over arrow string arrays, amortized: hashes are computed
    once per DISTINCT value (dictionary-encode) and cached across
    batches — actor-pool state (__init__ once per actor)."""

    def __init__(self) -> None:
        self._cache: dict[str, int] = {}

    def hash_tokens(self, tokens: pa.Array) -> np.ndarray:
        if isinstance(tokens, pa.ChunkedArray):
            tokens = tokens.combine_chunks()
        dict_arr = tokens.dictionary_encode()
        codes = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniq = dict_arr.dictionary.to_pylist()
        hu = np.empty(len(uniq), dtype=np.uint64)
        for i, u in enumerate(uniq):
            h = self._cache.get(u)
            if h is None:
                h = int.from_bytes(hashlib.md5(u.encode("utf-8")).digest()[8:16], "little")
                self._cache[u] = h
            hu[i] = h
        return hu[codes]


def gram_hashes(
    token_hashes: np.ndarray, lengths: np.ndarray, k: int = 3
) -> tuple[np.ndarray, np.ndarray]:
    """k-gram combined hashes over per-doc token-hash runs (vectorized).

    ``token_hashes`` is the concatenation of every doc's token hashes
    (uint64), ``lengths`` the per-doc token counts. Returns
    (gram_hash mod MERSENNE61 as uint64, parent_doc_index) for every
    valid gram — docs with < k tokens produce none (callers apply the
    joined-string fallback to those).
    """
    h = np.asarray(token_hashes, dtype=np.uint64)
    lengths = np.asarray(lengths, dtype=np.int64)
    n = h.size
    n_grams_per_doc = np.maximum(lengths - k + 1, 0)
    if n == 0 or not n_grams_per_doc.any():
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    starts = np.cumsum(lengths) - lengths
    parents = np.repeat(np.arange(lengths.size), lengths)
    idx_in_doc = np.arange(n) - starts[parents]
    valid = idx_in_doc <= lengths[parents] - k
    acc = np.zeros(n, dtype=np.uint64)
    for j in range(k):
        kj = np.uint64(_k_for(j))
        # shifted view, zero-padded at the tail (invalid slots masked out)
        shifted = np.zeros(n, dtype=np.uint64)
        shifted[: n - j] = h[j:]
        acc += shifted * kj  # uint64 wrap == mod 2^64
    grams = mod_mersenne61(acc[valid])
    return grams, parents[valid]


def joined_fallback_hash(tokens: list[str]) -> int:
    """Hash for a doc with < k tokens: md5_u64 of the space-joined token
    string, mod MERSENNE61 — SQL: md5_number_lower(array_to_string(toks,
    ' ')) % 2305843009213693951."""
    d = hashlib.md5(" ".join(tokens).encode("utf-8")).digest()
    return int.from_bytes(d[8:16], "little") % MERSENNE61


def flat_nonempty_tokens(texts) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """Shared preamble of the near-dup stages: M2-tokenize a text column
    and return (flat nonempty tokens, parent row index per token,
    per-row token counts)."""
    import pyarrow.compute as pc

    from ..stages.tokenizer import token_lists

    lists = token_lists(texts)
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    flat = lists.flatten()
    lengths = lists.value_lengths().to_numpy(zero_copy_only=False).astype(np.int64)
    parents = np.repeat(np.arange(lengths.size), lengths)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    toks = flat.filter(pa.array(keep))
    parents = parents[keep]
    counts = np.bincount(parents, minlength=lengths.size).astype(np.int64)
    return toks, parents, counts
