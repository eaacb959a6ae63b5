"""Bucketed group-apply: the shuffle pattern for per-key logic at scale.

``groupby(key).map_groups(fn)`` pays a Python dispatch per GROUP — ruinous
when keys are fine-grained (one group per url, per content-hash, per
candidate pair). The fix used across this engine: shuffle on
``bucket = hash(key) % B`` instead, then run ONE vectorized function per
bucket that handles all its key-groups with pandas/numpy. Semantics are
identical (same keys co-locate); the per-group Python cost collapses into
a per-bucket call. B is the reduce parallelism knob: big enough that a
bucket fits a worker's heap, small enough that per-bucket overhead
amortizes (sandbox default 64; thousands at cluster scale).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


def add_hash_bucket(
    batch: pa.Table, key_cols: list[str], n_buckets: int, col: str = "__bucket"
) -> pa.Table:
    """Stable hash bucket over the concatenated key columns."""
    n = len(batch)
    if n == 0:
        return batch.append_column(col, pa.array([], pa.int32()))
    parts = []
    for c in key_cols:
        arr = batch.column(c)
        parts.append(np.asarray([str(v) for v in arr.to_pylist()], dtype=object))
    if len(parts) == 1:
        joined = parts[0]
    else:
        joined = parts[0]
        for p in parts[1:]:
            joined = np.char.add(np.char.add(joined.astype(str), "\x00"), p.astype(str)).astype(object)
    h = pd.util.hash_array(joined)
    return batch.append_column(col, pa.array((h % np.uint64(n_buckets)).astype(np.int32)))


def bucketed_group_apply(
    ds: rd.Dataset,
    key_cols: list[str],
    per_bucket_fn: Callable[[pd.DataFrame], pd.DataFrame],
    *,
    n_buckets: int = 64,
) -> rd.Dataset:
    """Hash-shuffle on the keys, then ``per_bucket_fn`` once per bucket
    (a pandas DataFrame containing every row of every key in the bucket;
    the ``__bucket`` helper column is already dropped)."""

    def tag(batch: pa.Table) -> pa.Table:
        return add_hash_bucket(batch, key_cols, n_buckets)

    def apply(group: pd.DataFrame) -> pd.DataFrame:
        if "__bucket" in group.columns:
            group = group.drop(columns="__bucket")
        return per_bucket_fn(group)

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(apply, batch_format="pandas")
    )
