"""Quality-gated corpus export: the ACTION step of the cleaning
pipeline — filter documents on the quality/repetition signals, write
the survivors as partitioned Parquet with per-partition completion
markers, report per-partition counts.

Scale shape (the north-star's resumable-output rule):

* the filter runs inside the scan (``repetition_stage`` signals joined
  per batch — no second pass, no shuffle for the predicate);
* output is partitioned by the key (one directory per source), each
  partition written atomically (tmp + rename) with a ``.done.json``
  lineage marker holding its row count and the input token — a
  re-run skips finished partitions, so an interrupted 100 TB export
  resumes without recomputation;
* the per-partition counts come from the SAME exchange that routes
  rows to their partition writer — no extra aggregate job.

Reference: the reference persists cleaned pages to MySQL `page`
(IndexingServiceImpl.java:322-334); this is that sink rebuilt as a
declarative filtered Parquet export.
"""

from __future__ import annotations

import json
from pathlib import Path

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd


def export_quality_corpus(
    documents: rd.Dataset,
    out_dir: str,
    min_tokens: int = 30,
    max_dup_bigram_frac: float = 0.12,
    input_token: str | None = None,
) -> pd.DataFrame:
    """Filter ``documents`` to rows with ``n_tokens >= min_tokens`` and
    ``dup_bigram_frac <= max_dup_bigram_frac`` (Gopher-style gates),
    write one Parquet partition per source under ``out_dir``, and
    return (source, n_docs) per written partition.

    Partitions whose ``.done.json`` marker matches ``input_token`` are
    skipped (resume); counts are then read from the marker, not the
    data."""
    from ..stages.grouping import bucketed_group_apply
    from .textstats import repetition_stage

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    def gate(batch: pa.Table) -> pa.Table:
        rep = repetition_stage(batch)
        keep = (
            rep["n_tokens"].to_numpy(zero_copy_only=False) >= min_tokens
        ) & (
            rep["dup_bigram_frac"].to_numpy(zero_copy_only=False)
            <= max_dup_bigram_frac
        )
        return batch.filter(pa.array(keep))

    kept = documents.map_batches(gate, batch_format="pyarrow")

    def write_partition(group: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for s, g in group.groupby("source", sort=False):
            part = out / f"source={s}"
            marker = part / ".done.json"
            # resume ONLY on an explicit matching token — with no token
            # there is nothing tying the marker to this input, so a
            # changed corpus must rewrite (stale-skip would silently
            # return the previous export's data)
            if marker.exists() and input_token is not None:
                try:
                    m = json.loads(marker.read_text())
                    if m.get("input_token") == input_token:
                        outs.append({"source": s, "n_docs": int(m["n_docs"])})
                        continue
                except Exception:
                    pass
            part.mkdir(parents=True, exist_ok=True)
            g = g.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
            tmp = part / "part-0.parquet.tmp"
            pq.write_table(pa.Table.from_pandas(g, preserve_index=False), tmp, compression="zstd")
            tmp.rename(part / "part-0.parquet")
            mt = part / ".done.json.tmp"
            mt.write_text(json.dumps({"input_token": input_token, "n_docs": int(len(g))}))
            mt.rename(marker)
            outs.append({"source": s, "n_docs": int(len(g))})
        res = pd.DataFrame(outs)
        res["n_docs"] = res["n_docs"].astype("int64")
        return res

    counts = bucketed_group_apply(kept, ["source"], write_partition, n_buckets=32)
    df = counts.to_pandas()
    if "source" not in df.columns:  # everything filtered: empty, schemaless
        df = pd.DataFrame(
            {"source": pd.Series([], dtype=object),
             "n_docs": pd.Series([], dtype="int64")}
        )
    df = df.sort_values("source").reset_index(drop=True)
    # partitions for sources absent from THIS corpus are stale leftovers
    # of an earlier export into the same dir — remove them so consumers
    # globbing out_dir/source=*/ see exactly this run's partitions
    import shutil

    current = set(df["source"])
    for part in out.glob("source=*"):
        if part.is_dir() and part.name.split("=", 1)[1] not in current:
            shutil.rmtree(part, ignore_errors=True)
    return df
