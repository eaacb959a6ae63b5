"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
``media_type`` and metadata; decode / feature-extract / resize /
frame-sample are actor-pool ``map_batches`` stages. The decode libraries
(PIL/ffmpeg/librosa) are NOT in this container, so the codec boundary is
STUBBED exactly as the task prescribes: if a real library import fails,
the stage either raises ``NotImplementedError`` (strict mode) or runs a
deterministic fake decoder over a self-describing fixture byte format —
while all the Ray-side plumbing (schema, batch sizing for large binary
rows, actor signature, output layout) is real and tested.

Fixture byte format (deterministic, produced by ``make_media_table``):
  magic ``SESM`` | u8 kind (0=image,1=audio,2=video) | u16 w | u16 h |
  u16 channels/frames | payload bytes (seeded).
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

import ray.data as rd

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),  # "image" | "audio" | "video"
        ("payload", pa.binary()),
        ("source_url", pa.string()),
    ]
)

_MAGIC = b"SESM"
_KINDS = {"image": 0, "audio": 1, "video": 2}
_KINDS_INV = {v: k for k, v in _KINDS.items()}


def make_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media fixture rows (see module docstring)."""
    rng = np.random.default_rng(seed)
    ids, kinds, payloads, urls = [], [], [], []
    for i in range(n):
        kind = int(rng.integers(0, 3))
        w = int(rng.integers(8, 64))
        h = int(rng.integers(8, 64))
        c = int(rng.integers(1, 5)) if kind != 2 else int(rng.integers(2, 12))
        body = rng.integers(0, 256, size=w * h, dtype=np.uint8).tobytes()
        payloads.append(_MAGIC + struct.pack("<BHHH", kind, w, h, c) + body)
        ids.append(i)
        kinds.append(_KINDS_INV[kind])
        urls.append(f"https://media.example/{i}")
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "media_type": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "source_url": pa.array(urls, pa.string()),
        }
    )


def _parse_header(buf: bytes) -> tuple[int, int, int, int, bytes]:
    if not buf.startswith(_MAGIC):
        raise ValueError("not a SESM fixture payload")
    kind, w, h, c = struct.unpack("<BHHH", buf[4:11])
    return kind, w, h, c, buf[11:]


class DecodeMedia:
    """Actor-pool decode stage.

    strict=True → require the real decoder (PIL for images) and raise
    ``NotImplementedError`` when absent (this container). strict=False →
    deterministic fake decode of the fixture format. Output: typed
    metadata + a small feature vector (byte-histogram projection), the
    layout a real embedding model would produce.

    Scale note: binary rows are large → callers must pass a SMALL
    ``batch_size`` (default 32 here) so batch × concurrency fits the
    worker heap; this is the knob, not block size.
    """

    def __init__(self, strict: bool = False, feature_dim: int = 16) -> None:
        self.feature_dim = feature_dim
        self.pil = None
        try:  # the real path, absent in this container
            from PIL import Image  # noqa: F401

            self.pil = Image
        except ImportError:
            if strict:
                raise NotImplementedError(
                    "real media decoding requires PIL/ffmpeg, not available in this environment"
                )

    _EMPTY = pa.table(
        {
            "media_id": pa.array([], pa.int64()),
            "media_type": pa.array([], pa.string()),
            "width": pa.array([], pa.int32()),
            "height": pa.array([], pa.int32()),
            "n_channels": pa.array([], pa.int32()),
            "n_bytes": pa.array([], pa.int64()),
            "feature": pa.array([], pa.list_(pa.float64())),
        }
    )

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return self._EMPTY
        # zero-copy views over the batch's binary column: one flat byte
        # buffer + per-row offsets — no per-row Python bytes objects
        arr = batch.column("payload").combine_chunks()
        bufs = arr.buffers()
        off = np.frombuffer(bufs[1], np.int32)[arr.offset : arr.offset + n + 1].astype(np.int64)
        data = np.frombuffer(bufs[2], np.uint8)
        starts, ends = off[:-1], off[1:]
        # vectorized header parse + magic check (little-endian u8/u16s)
        for k, m in enumerate(_MAGIC):
            if not np.all(data[starts + k] == m):
                raise ValueError("not a SESM fixture payload")
        u16 = lambda p: data[p].astype(np.int32) | (data[p + 1].astype(np.int32) << 8)
        w, h, c = u16(starts + 5), u16(starts + 7), u16(starts + 9)
        # ONE `% dim` pass over the slice's byte range, then a small
        # per-row bincount over buffer VIEWS — no per-byte int64
        # row-index/position intermediates (those allocations dominated
        # the fully-flat variant at large batch sizes)
        base = int(off[0])
        mods = data[base : int(off[-1])] % np.uint8(self.feature_dim)
        bs, be = starts + 11 - base, ends - base
        hist = np.empty((n, self.feature_dim), np.float64)
        for i in range(n):
            hist[i] = np.bincount(mods[bs[i] : be[i]], minlength=self.feature_dim)
        feat = np.round(hist / np.maximum(1.0, hist.sum(axis=1, keepdims=True)), 6)
        feat_col = pa.ListArray.from_arrays(
            pa.array(np.arange(n + 1, dtype=np.int32) * self.feature_dim, pa.int32()),
            pa.array(feat.reshape(-1), pa.float64()),
        )
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "media_type": batch.column("media_type"),
                "width": pa.array(w, pa.int32()),
                "height": pa.array(h, pa.int32()),
                "n_channels": pa.array(c, pa.int32()),
                "n_bytes": pa.array(ends - starts, pa.int64()),
                "feature": feat_col,
            }
        )


class FrameSample:
    """Video frame-sampling stage: keep every k-th 'frame' (fixed-size
    chunks of the payload in the fixture format). Real path would call
    ffmpeg; plumbing (explode one row per sampled frame) is real."""

    def __init__(self, every_k: int = 2, frame_bytes: int = 64) -> None:
        self.every_k = every_k
        self.frame_bytes = frame_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"media_id": [], "frame_idx": [], "frame": []}
        for mid, mtype, payload in zip(
            batch.column("media_id").to_pylist(),
            batch.column("media_type").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            if mtype != "video":
                continue
            _, _, _, _, body = _parse_header(payload)
            n_frames = max(1, len(body) // self.frame_bytes)
            for f in range(0, n_frames, self.every_k):
                out["media_id"].append(mid)
                out["frame_idx"].append(f)
                out["frame"].append(body[f * self.frame_bytes: (f + 1) * self.frame_bytes])
        return pa.table(
            {
                "media_id": pa.array(out["media_id"], pa.int64()),
                "frame_idx": pa.array(out["frame_idx"], pa.int32()),
                "frame": pa.array(out["frame"], pa.binary()),
            }
        )


def decode_media_ds(media: rd.Dataset, *, strict: bool = False, concurrency=None) -> rd.Dataset:
    """Decode stage as cached-kernel tasks (stages/taskpool.py): the
    stub codec table is deterministic ctor state.  With REAL codecs an
    actor pool with per-slot library handles is the right shape — flip
    back when PIL/ffmpeg exist.  ``concurrency`` kept for API compat."""
    from ..stages.taskpool import cached_kernel_map

    return cached_kernel_map(
        media, DecodeMedia, {"strict": strict}, batch_size=32
    )  # small batches: binary payload rows


def frame_sample_ds(media: rd.Dataset, every_k: int = 2, concurrency=None) -> rd.Dataset:
    from ..stages.taskpool import cached_kernel_map

    return cached_kernel_map(media, FrameSample, {"every_k": every_k}, batch_size=32)


def make_media_table_with_dups(
    n: int, seed: int = 42, exact_every: int = 7, near_every: int = 11
) -> pa.Table:
    """The media fixture plus planted duplicates: an EXACT byte copy of
    row i (new id n+i) for i % exact_every == 0, and a NEAR copy (first
    three body bytes bumped by one — a tiny perceptual perturbation)
    with id 2n+i for i % near_every == 0."""
    base = make_media_table(n, seed)
    ids = base.column("media_id").to_pylist()
    kinds = base.column("media_type").to_pylist()
    payloads = base.column("payload").to_pylist()
    urls = base.column("source_url").to_pylist()
    for i in range(0, n, exact_every):
        ids.append(n + i)
        kinds.append(kinds[i])
        payloads.append(payloads[i])
        urls.append(f"https://media.example/copy/{i}")
    for i in range(0, n, near_every):
        b = bytearray(payloads[i])
        for k in range(11, 14):
            b[k] = (b[k] + 1) % 256
        ids.append(2 * n + i)
        kinds.append(kinds[i])
        payloads.append(bytes(b))
        urls.append(f"https://media.example/near/{i}")
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "media_type": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "source_url": pa.array(urls, pa.string()),
        }
    )


def media_dedup_ds(media: rd.Dataset) -> rd.Dataset:
    """Exact binary dedup over media payloads: → (media_id, digest,
    keep) with keep = 1 on the smallest media_id of each md5 group.

    Scale shape: the payload is hashed where it lives; only the slim
    (digest, media_id) rows enter the digest-bucketed exchange — binary
    bytes never shuffle. Hashing is per-row by nature (md5 of one blob)
    but runs the C md5 over zero-copy buffer views."""
    import hashlib

    import pandas as pd

    from ..stages.grouping import bucketed_group_apply

    def sig(batch: pa.Table) -> pa.Table:
        n = len(batch)
        arr = batch.column("payload").combine_chunks()
        bufs = arr.buffers()
        off = np.frombuffer(bufs[1], np.int32)[arr.offset : arr.offset + n + 1].astype(np.int64)
        data = np.frombuffer(bufs[2], np.uint8)
        digests = [
            hashlib.md5(data[off[i] : off[i + 1]].tobytes()).hexdigest()
            for i in range(n)
        ]
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "digest": pa.array(digests, pa.string()),
            }
        )

    slim = media.map_batches(sig, batch_format="pyarrow", batch_size=64)

    def per_group(grp: "pd.DataFrame") -> "pd.DataFrame":
        keep = grp.groupby("digest")["media_id"].transform("min") == grp["media_id"]
        out = grp.copy()
        out["keep"] = keep.astype(np.int64)
        return out

    return bucketed_group_apply(slim, ["digest"], per_group, n_buckets=16)


def media_fingerprint_ds(media: rd.Dataset, dim: int = 16) -> rd.Dataset:
    """Perceptual fingerprint per payload: the CENTERED, L2-normalized
    byte-mod-``dim`` histogram of the body, rounded to 6 decimals —
    random payloads land near-orthogonal (measured max cos ≈ 0.81)
    while small perturbations stay ≥ 0.999. → (media_id, embedding),
    ready for the generic embedding near-dup / ANN operators."""

    def stage(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return pa.table(
                {
                    "media_id": pa.array([], pa.int64()),
                    "embedding": pa.array([], pa.list_(pa.float64())),
                }
            )
        arr = batch.column("payload").combine_chunks()
        bufs = arr.buffers()
        off = np.frombuffer(bufs[1], np.int32)[arr.offset : arr.offset + n + 1].astype(np.int64)
        data = np.frombuffer(bufs[2], np.uint8)
        base = int(off[0])
        mods = data[base : int(off[-1])] % np.uint8(dim)
        bs, be = off[:-1] + 11 - base, off[1:] - base
        vec = np.empty((n, dim), np.float64)
        for i in range(n):
            h = np.bincount(mods[bs[i] : be[i]], minlength=dim).astype(np.float64)
            c = h - h.mean()
            vec[i] = np.round(c / max(np.linalg.norm(c), 1e-300), 6)
        col = pa.ListArray.from_arrays(
            pa.array(np.arange(n + 1, dtype=np.int32) * dim, pa.int32()),
            pa.array(vec.reshape(-1), pa.float64()),
        )
        return pa.table({"media_id": batch.column("media_id"), "embedding": col})

    return media.map_batches(stage, batch_format="pyarrow", batch_size=32)


def media_near_pairs_ds(
    media: rd.Dataset,
    *,
    threshold: float = 0.99,
    n_planes: int = 4,
    seed: int = 42,
) -> rd.Dataset:
    """Perceptual near-duplicate media pairs: centered-histogram
    fingerprints through the generic hyperplane-LSH + in-bucket verify
    operator (`dedup.embedding_near_pairs`) — exact-copy pairs score
    cos 1.0, tiny perturbations ≈ 0.999, unrelated payloads ≤ ~0.81."""
    from .dedup import embedding_near_pairs

    return embedding_near_pairs(
        media_fingerprint_ds(media),
        threshold=threshold,
        n_planes=n_planes,
        seed=seed,
        id_col="media_id",
        vec_col="embedding",
    )
