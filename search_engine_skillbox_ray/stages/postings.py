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
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from .codec import BLOCK_SIZE, encode_posting_lists_bulk, merge_posting_payloads

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


def _rows_to_table(rows: dict[str, list]) -> pa.Table:
    return pa.table(
        {name: pa.array(rows[name], type=SEGMENT_SCHEMA.field(name).type) for name in SEGMENT_SCHEMA.names}
    )


def encode_partial_group(group: pa.Table) -> pa.Table:
    """map_groups body over groupby(bucket, salt): encode every
    (site_id, term) run into partial-segment rows in ONE vectorized pass
    (sort by (term, site_id, doc_id) → run-length boundaries → bulk
    varbyte; no per-term Python loop)."""
    if not len(group):
        return _rows_to_table({n: [] for n in SEGMENT_SCHEMA.names})
    df = group.select(["bucket", "salt", "site_id", "term", "doc_id", "tf"]).to_pandas()
    bucket = int(df["bucket"].iloc[0])
    salt = int(df["salt"].iloc[0])
    df = df.sort_values(["term", "site_id", "doc_id"], kind="mergesort")
    terms = df["term"].to_numpy()
    site_ids = df["site_id"].to_numpy(np.int32)
    doc_ids = df["doc_id"].to_numpy(np.int64)
    tfs = df["tf"].to_numpy(np.int64)

    new_run = np.ones(len(df), dtype=bool)
    new_run[1:] = (terms[1:] != terms[:-1]) | (site_ids[1:] != site_ids[:-1])
    run_starts = np.flatnonzero(new_run)
    run_ends = np.append(run_starts[1:], len(df))
    lengths = run_ends - run_starts

    payloads = encode_posting_lists_bulk(doc_ids, tfs, lengths, block_size=BLOCK_SIZE)
    rows: dict[str, list] = {n: [] for n in SEGMENT_SCHEMA.names}
    rows["bucket"] = [bucket] * len(payloads)
    rows["salt"] = [salt] * len(payloads)
    rows["site_id"] = site_ids[run_starts].tolist()
    rows["term"] = terms[run_starts].tolist()
    for k in ("df", "cf", "doc_gaps", "tf_bytes", "block_last_doc",
              "block_max_tf", "block_gap_offset", "block_tf_offset"):
        rows[k] = [p[k] for p in payloads]
    return _rows_to_table(rows)


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
        # deterministic order regardless of partial arrival order; term-major
        # so Parquet row-group stats prune term lookups at query time
        group = group.sort_by(
            [("term", "ascending"), ("site_id", "ascending"), ("salt", "ascending")]
        )
        terms = np.asarray(group.column("term").to_pylist(), dtype=object)
        site_ids = group.column("site_id").to_numpy(zero_copy_only=False)
        n = len(group)
        new_run = np.ones(n, dtype=bool)
        new_run[1:] = (terms[1:] != terms[:-1]) | (site_ids[1:] != site_ids[:-1])
        run_starts = np.flatnonzero(new_run)
        run_lens = np.diff(np.append(run_starts, n))

        if (run_lens == 1).all():
            # fast path: nothing was salted — partials ARE the segments
            table = group.drop_columns(["salt"]).add_column(
                3, "salt", pa.array(np.full(n, -1, dtype=np.int32))
            )
            table = table.select(SEGMENT_SCHEMA.names)
        else:
            keep_mask = np.zeros(n, dtype=bool)
            keep_mask[run_starts[run_lens == 1]] = True
            passthrough = group.filter(pa.array(keep_mask))
            rows = passthrough.to_pydict()
            salted_idx = run_starts[run_lens > 1]
            salted_lens = run_lens[run_lens > 1]
            gl = group.to_pylist()
            for s, ln in zip(salted_idx, salted_lens):
                payload = merge_posting_payloads(gl[s: s + ln], block_size=BLOCK_SIZE)
                rows["bucket"].append(bucket)
                rows["site_id"].append(int(site_ids[s]))
                rows["term"].append(terms[s])
                rows["salt"].append(-1)
                for k in ("df", "cf", "doc_gaps", "tf_bytes", "block_last_doc",
                          "block_max_tf", "block_gap_offset", "block_tf_offset"):
                    rows[k].append(payload[k])
            rows["salt"] = [-1] * len(rows["salt"])
            table = _rows_to_table(rows)
            table = table.sort_by([("term", "ascending"), ("site_id", "ascending")])
        n_postings = int(pa.compute.sum(table["df"]).as_py() or 0)
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
                "n_postings": n_postings,
            },
        )
        return pa.table(
            {
                "bucket": pa.array([bucket], pa.int32()),
                "n_terms": pa.array([len(table)], pa.int64()),
                "n_postings": pa.array([n_postings], pa.int64()),
            }
        )
