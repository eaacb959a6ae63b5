"""Task-based map_batches with a per-worker-process cached kernel.

Ray reuses worker processes across tasks, so a deterministic, cheaply
constructed kernel object (seeded hash constants, compiled regexes, a
token-hash cache) built once per process stays warm across batches AND
across pipelines — the same amortization an actor pool provides, without
paying a fresh actor-process spawn + package import (~1.2 s measured)
on every pipeline that uses the stage.  Measured on the sf0.1 MinHash
signature stage: 0.47 s warm as cached tasks vs 1.71 s as a fresh
``concurrency=(1, 8)`` actor pool.

The cache must be reached through the IMPORTED module at call time
(``import ... as _tp; _tp._KERNEL_CACHE``): cloudpickle serializes the
nested ``kernel_fn`` by value with its own captured globals, so a bare
module-global reference would deserialize into a per-closure dict and
silently reduce the cache to per-pipeline scope (empirically verified —
the constructor re-ran per pipeline before this binding).

Use this ONLY for kernels whose state is deterministic from the
constructor kwargs (seeded constants and pure caches): task scheduling
must not be able to change results.  Heavyweight state that should be
sharded or explicitly bounded per slot (lemmatizer models, segment
caches, index shards) stays on actor pools.
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa
import ray.data as rd

# per-worker-process kernel instances, keyed by (class, kwargs)
_KERNEL_CACHE: dict = {}


def cached_kernel_map(
    ds: rd.Dataset,
    cls: type,
    kwargs: dict[str, Any] | None = None,
    *,
    batch_format: str = "pyarrow",
    batch_size: int | None = None,
) -> rd.Dataset:
    """``ds.map_batches(cls(**kwargs).__call__)`` as plain tasks over
    warm workers, constructing ``cls`` once per worker process.

    ``kwargs`` values must be hashable (they form the cache key); pass
    stages that hold ``ray.put`` handles or other per-run state through
    an actor pool instead."""
    kwargs = kwargs or {}
    key = (cls.__module__, cls.__qualname__, tuple(sorted(kwargs.items())))

    def kernel_fn(batch: pa.Table, _key=key, _cls=cls, _kw=tuple(sorted(kwargs.items()))):
        # resolve the cache through the worker's imported module — see
        # the module docstring for why a bare global won't do
        from search_engine_skillbox_ray.stages import taskpool as _tp

        kern = _tp._KERNEL_CACHE.get(_key)
        if kern is None:
            kern = _cls(**dict(_kw))
            _tp._KERNEL_CACHE[_key] = kern
        return kern(batch)

    mb_kwargs: dict[str, Any] = {"batch_format": batch_format}
    if batch_size is not None:
        mb_kwargs["batch_size"] = batch_size
    return ds.map_batches(kernel_fn, **mb_kwargs)
