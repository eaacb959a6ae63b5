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

from .codec import BLOCK_SIZE, encode_posting_list, merge_posting_payloads

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
    """map_groups body over groupby(bucket, salt): encode each
    (site_id, term) run into one partial-segment row."""
    if not len(group):
        return _rows_to_table({n: [] for n in SEGMENT_SCHEMA.names})
    df = group.select(["bucket", "salt", "site_id", "term", "doc_id", "tf"]).to_pandas()
    bucket = int(df["bucket"].iloc[0])
    salt = int(df["salt"].iloc[0])
    rows: dict[str, list] = {n: [] for n in SEGMENT_SCHEMA.names}
    for (site_id, term), sub in df.groupby(["site_id", "term"], sort=False):
        payload = encode_posting_list(
            sub["doc_id"].to_numpy(np.int64), sub["tf"].to_numpy(np.int64), block_size=BLOCK_SIZE
        )
        rows["bucket"].append(bucket)
        rows["site_id"].append(int(site_id))
        rows["term"].append(term)
        rows["salt"].append(salt)
        for k in ("df", "cf", "doc_gaps", "tf_bytes", "block_last_doc",
                  "block_max_tf", "block_gap_offset", "block_tf_offset"):
            rows[k].append(payload[k])
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
        gdf = group.to_pandas()
        bucket = int(gdf["bucket"].iloc[0])

        merged: dict[str, list] = {n: [] for n in SEGMENT_SCHEMA.names}
        # deterministic order regardless of partial arrival order; term-major
        # so Parquet row-group stats prune term lookups at query time
        gdf = gdf.sort_values(["term", "site_id", "salt"], kind="mergesort")
        for (term, site_id), sub in gdf.groupby(["term", "site_id"], sort=True):
            if len(sub) == 1:
                payload = {k: sub[k].iloc[0] for k in (
                    "df", "cf", "doc_gaps", "tf_bytes", "block_last_doc",
                    "block_max_tf", "block_gap_offset", "block_tf_offset")}
                payload = {k: (list(v) if isinstance(v, np.ndarray) else v) for k, v in payload.items()}
            else:
                payload = merge_posting_payloads(sub.to_dict("records"), block_size=BLOCK_SIZE)
            merged["bucket"].append(bucket)
            merged["site_id"].append(int(site_id))
            merged["term"].append(term)
            merged["salt"].append(-1)  # merged segment: salt retired
            for k in ("df", "cf", "doc_gaps", "tf_bytes", "block_last_doc",
                      "block_max_tf", "block_gap_offset", "block_tf_offset"):
                merged[k].append(payload[k])

        table = _rows_to_table(merged)
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
