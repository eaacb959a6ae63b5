"""Zero-copy embedding-column access shared by the ANN / near-dup ops.

``list<float>`` columns with a fixed dimension are contiguous in Arrow:
``flatten().to_numpy().reshape(n, dim)`` is a zero-copy view (then one
float32→float64 cast) — replacing the per-row ``to_pylist()`` conversion
that dominated the round-1 ANN profiles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def embedding_vectors(col) -> np.ndarray:
    """Fixed-dim list<float> column → (n, dim) float64 matrix."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), np.float64)
    flat = col.flatten().to_numpy(zero_copy_only=False)
    dim = flat.size // n
    return flat.reshape(n, dim).astype(np.float64)


def int_list_matrix(col, width: int) -> np.ndarray:
    """Fixed-width list<int64> column (e.g. minhash signatures) →
    (n, width) int64 matrix via the same zero-copy flatten path."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if len(col) == 0:
        return np.empty((0, width), np.int64)
    flat = col.flatten().to_numpy(zero_copy_only=False)
    return flat.reshape(-1, width).astype(np.int64, copy=False)
