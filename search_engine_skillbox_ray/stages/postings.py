"""Posting-segment construction: the wide (shuffle) step of the build.

Replaces the reference's row-at-a-time MySQL sink (S4,
/root/reference/src/main/java/searchengine/utils/PageIndexingUtils.java:128-159
— 1 SELECT + 1 UPSERT per distinct lemma + 1 INSERT per (page, lemma))
with a salted groupby over exploded ``(site_id, doc_id, term, tf)`` rows:

  groupby (bucket, salt) → ``encode_partial_group``: per (site_id, term)
  sort docIDs, delta+varbyte encode, block-max metadata → one compact
  partial-segment row; then groupby (bucket) → ``BucketSegmentWriter``:
  merge salted partials, sort by (term, site_id), atomically write one
  Parquet segment per bucket + a lineage marker.

Scale notes (100 TB framing):
* the FIRST shuffle moves only ``(site_id, doc_id, term, tf)`` — text
  never enters the exchange; the SECOND moves already-compressed partial
  segments, orders of magnitude smaller;
* Zipf-head terms are salted (``AssignPartitions``) so no single reduce
  task receives a corpus-sized group; merging re-blocks block-max
  metadata (SURVEY §7.4);
* bucket count is the unit of reduce parallelism AND of resume — size it
  so one bucket's postings fit a worker heap (sandbox default 16;
  thousands at cluster scale).
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .codec import BLOCK_SIZE, encode_posting_lists_bulk

SEGMENT_SCHEMA = pa.schema(
    [
        ("bucket", pa.int32()),
        ("site_id", pa.int32()),
        ("term", pa.string()),
        ("salt", pa.int32()),
        ("df", pa.int64()),
        ("cf", pa.int64()),
        ("doc_gaps", pa.binary()),
        ("tf_bytes", pa.binary()),
        ("block_last_doc", pa.list_(pa.int64())),
        ("block_max_tf", pa.list_(pa.int32())),
        ("block_gap_offset", pa.list_(pa.int32())),
        ("block_tf_offset", pa.list_(pa.int32())),
    ]
)


# 128-bit docID segment layout (the hash-id fallback's 10^12-doc scale
# path, codec.py "128-bit ids" section): the docID is TWO uint64
# columns; block metadata carries (hi, lo) last-doc pairs. uint64 is
# stored as int64 bit patterns (Parquet/Arrow-native), reinterpreted by
# the codec via .view/astype on read.
SEGMENT_SCHEMA_128 = pa.schema(
    [
        ("bucket", pa.int32()),
        ("site_id", pa.int32()),
        ("term", pa.string()),
        ("salt", pa.int32()),
        ("df", pa.int64()),
        ("cf", pa.int64()),
        ("doc_gaps", pa.binary()),
        ("tf_bytes", pa.binary()),
        ("block_last_doc_hi", pa.list_(pa.int64())),
        ("block_last_doc_lo", pa.list_(pa.int64())),
        ("block_max_tf", pa.list_(pa.int32())),
        ("block_gap_offset", pa.list_(pa.int32())),
        ("block_tf_offset", pa.list_(pa.int32())),
    ]
)


_U64 = 1 << 64


def posting_row_128_to_storage(payload: dict) -> dict:
    """Codec payload (uint64-valued block lasts) → storage row: the
    (hi, lo) lasts are reinterpreted as int64 two's-complement bit
    patterns for the Arrow/Parquet int64 columns."""
    out = dict(payload)
    for c in ("block_last_doc_hi", "block_last_doc_lo"):
        out[c] = [v - _U64 if v >= (1 << 63) else v for v in payload[c]]
    return out


def posting_row_128_from_storage(row: dict) -> dict:
    """Inverse of :func:`posting_row_128_to_storage`."""
    out = dict(row)
    for c in ("block_last_doc_hi", "block_last_doc_lo"):
        out[c] = [v + _U64 if v < 0 else v for v in row[c]]
    return out


def _rows_to_table(rows: dict[str, list]) -> pa.Table:
    return pa.table(
        {name: pa.array(rows[name], type=SEGMENT_SCHEMA.field(name).type) for name in SEGMENT_SCHEMA.names}
    )


def merge_segment_rows(group: pa.Table, out_salt: int = -1) -> pa.Table:
    """Vectorized merge of partial-segment rows: all (term, site_id) runs
    in one pass — bulk varbyte decode (segmented cumsum), global lexsort,
    bulk re-encode. Handles any number of partials per run (per-batch
    combiner output and/or salted partials); a duplicate docID within a
    run is an error (would mean dedup/docID failure upstream)."""
    from .codec import decode_partial_rows

    if not len(group):
        return _rows_to_table({n: [] for n in SEGMENT_SCHEMA.names})
    group = group.sort_by([("term", "ascending"), ("site_id", "ascending")])
    terms = np.asarray(group.column("term").to_pylist(), dtype=object)
    site_ids = group.column("site_id").to_numpy(zero_copy_only=False)
    buckets = group.column("bucket").to_numpy(zero_copy_only=False)
    dfs = group.column("df").to_numpy(zero_copy_only=False)
    n = len(group)
    new_run = np.ones(n, dtype=bool)
    new_run[1:] = (terms[1:] != terms[:-1]) | (site_ids[1:] != site_ids[:-1])
    run_id_per_row = np.cumsum(new_run) - 1
    n_runs = int(run_id_per_row[-1]) + 1
    run_starts = np.flatnonzero(new_run)

    # (no single-partial shortcut: partial rows ship WITHOUT block-max
    # metadata — the merge always re-encodes, which also re-blocks)
    from .codec import concat_binary_column

    doc_ids, tfs = decode_partial_rows(
        dfs,
        concat_binary_column(group.column("doc_gaps")),
        concat_binary_column(group.column("tf_bytes")),
    )
    posting_run = np.repeat(run_id_per_row, dfs)
    order = np.lexsort((doc_ids, posting_run))
    doc_ids, tfs, posting_run = doc_ids[order], tfs[order], posting_run[order]
    lengths = np.bincount(posting_run, minlength=n_runs)
    payloads = encode_posting_lists_bulk(doc_ids, tfs, lengths, block_size=BLOCK_SIZE)

    rows: dict[str, list] = {}
    rows["bucket"] = buckets[run_starts].tolist()
    rows["site_id"] = site_ids[run_starts].tolist()
    rows["term"] = terms[run_starts].tolist()
    rows["salt"] = [out_salt] * n_runs
    for k in ("df", "cf", "doc_gaps", "tf_bytes", "block_last_doc",
              "block_max_tf", "block_gap_offset", "block_tf_offset"):
        rows[k] = [p[k] for p in payloads]
    return _rows_to_table(rows)


class WriteDocsShard:
    """Pass-through stage that persists each docs batch as a Parquet
    shard (atomic tmp+rename) while the SAME stream continues into
    tokenization — fusing the docs sink into the build pipeline removes
    a materialization barrier and a full re-read of the corpus.

    Shard names derive from batch content (md5 of first/last url + row
    count), so a retried task overwrites its own file instead of
    duplicating rows. Caveat (documented): if a retry re-batches
    differently, stale shards could linger — the build validates the
    final docs row count against the corpus stats and falls back to a
    clean rewrite on mismatch."""

    def __init__(self, docs_dir: str) -> None:
        self.docs_dir = Path(docs_dir)
        self.docs_dir.mkdir(parents=True, exist_ok=True)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib

        if len(batch):
            urls = batch.column("url")
            sig = hashlib.md5(
                f"{urls[0].as_py()}|{urls[-1].as_py()}|{len(batch)}".encode()
            ).hexdigest()[:16]
            final = self.docs_dir / f"docs-{sig}.parquet"
            tmp = self.docs_dir / f"docs-{sig}.parquet.tmp"
            # zstd: ~40% smaller text shards at equal write time — the
            # docs sink is the largest disk stream of the build.
            # 128-row groups: top-k hydration decodes per-group (the
            # engine's doc locator), so small groups cut the per-hit
            # decode cost (measured 2.9 ms at 512 rows → 1.0 ms at 128;
            # 64 hits the reader-overhead floor) for ~10% more file
            # bytes, while full scans stay row-group-amortized
            pq.write_table(batch, tmp, compression="zstd", row_group_size=128)
            os.replace(tmp, final)
        return batch


class BucketSegmentWriter:
    """map_groups actor over groupby(bucket): merge salted partials and
    write the bucket's immutable segment file atomically (write temp +
    ``os.replace``) plus its lineage marker — retries cannot double-write
    (SURVEY §4 'idempotent segment writes')."""

    def __init__(self, postings_dir: str, fingerprint: str) -> None:
        self.postings_dir = Path(postings_dir)
        self.fingerprint = fingerprint

    def __call__(self, group: pa.Table) -> pa.Table:
        from ..state.manifest import atomic_write_json

        if not len(group):
            return pa.table({"bucket": pa.array([], pa.int32()),
                             "n_terms": pa.array([], pa.int64()),
                             "n_postings": pa.array([], pa.int64())})
        bucket = int(group.column("bucket")[0].as_py())
        table = merge_segment_rows(group, out_salt=-1)
        n_postings = int(pa.compute.sum(table["df"]).as_py() or 0)
        sids, cnts = np.unique(
            table["site_id"].to_numpy(zero_copy_only=False), return_counts=True
        )
        lemmas_by_site = {int(s): int(c) for s, c in zip(sids, cnts)}
        final = self.postings_dir / f"bucket={bucket:05d}.parquet"
        tmp = self.postings_dir / f"bucket={bucket:05d}.parquet.tmp"
        pq.write_table(table, tmp, row_group_size=4096)
        os.replace(tmp, final)
        atomic_write_json(
            self.postings_dir / f"bucket={bucket:05d}.done.json",
            {
                "fingerprint": self.fingerprint,
                "bucket": bucket,
                "file": final.name,
                "n_terms": len(table),
                # terms hash to exactly one bucket, so per-bucket distinct
                # counts SUM to the global vocabulary size — no scan needed
                "n_unique_terms": len(set(table["term"].to_pylist())),
                "n_postings": n_postings,
                "lemmas_by_site": lemmas_by_site,
            },
        )
        return pa.table(
            {
                "bucket": pa.array([bucket], pa.int32()),
                "n_terms": pa.array([len(table)], pa.int64()),
                "n_postings": pa.array([n_postings], pa.int64()),
            }
        )

