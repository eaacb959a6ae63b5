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
    cols = [batch.column(c).to_pylist() for c in key_cols]
    if len(cols) == 1:
        joined = np.asarray([str(v) for v in cols[0]], dtype=object)
    else:
        joined = np.asarray(
            ["\x00".join(str(v) for v in row) for row in zip(*cols)], dtype=object
        )
    h = pd.util.hash_array(joined, categorize=False)
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

    # Ray's sort-based groupby cost grows with INPUT BLOCK COUNT (the
    # partition matrix), not just bytes — coalesce the typically tiny
    # tagged blocks before the shuffle (measured 288 blocks: 7.4s vs 32
    # blocks: 0.4s on identical 192k-row data).
    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .repartition(max(32, n_buckets))
        .groupby("__bucket")
        .map_groups(apply, batch_format="pandas")
    )
