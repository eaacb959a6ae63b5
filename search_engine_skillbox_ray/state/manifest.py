"""Per-partition lineage manifest → resumable index builds.

The reference has no checkpoint/resume at all (stop marks sites FAILED and
restart re-crawls, /root/reference/src/main/java/searchengine/service/
IndexingServiceImpl.java:116-135); its de-facto idempotency is the page
upsert (utils/PageIndexingUtils.java:73-91). The rebuild replaces that
with explicit per-partition lineage (north_rule: "resumable from
checkpoint with per-partition lineage + metrics"):

* every completed partition (the docs table, each postings bucket) gets a
  small ``*.done.json`` marker written ATOMICALLY (tmp + ``os.replace``)
  next to its output, recording the build fingerprint, output files and
  row counts;
* the fingerprint hashes the input file list (path, size, mtime) plus the
  build parameters, so a changed input or config invalidates stale
  markers instead of silently reusing them;
* on resume, completed buckets are filtered out BEFORE the shuffle, so
  no recomputation and no re-shuffle of finished partitions;
* ``manifest.json`` is the aggregated human-readable view written at the
  end of a successful build (plus build metrics).
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from pathlib import Path
from typing import Any


def fingerprint_inputs(paths: list[str | Path], params: dict[str, Any]) -> str:
    """Stable hash of input files (path,size,mtime) + build params."""
    h = hashlib.sha256()
    for p in sorted(str(p) for p in paths):
        st = os.stat(p)
        h.update(f"{p}|{st.st_size}|{int(st.st_mtime)}".encode())
    h.update(json.dumps(params, sort_keys=True, default=str).encode())
    return h.hexdigest()[:16]


def atomic_write_json(path: str | Path, payload: dict) -> None:
    path = Path(path)
    tmp = path.with_suffix(path.suffix + ".tmp")
    tmp.write_text(json.dumps(payload, indent=1, sort_keys=True))
    os.replace(tmp, path)


def read_json(path: str | Path) -> dict | None:
    try:
        return json.loads(Path(path).read_text())
    except (OSError, ValueError):
        return None


class BuildManifest:
    """Driver-side view over the marker files of one index directory."""

    def __init__(self, index_dir: str | Path, fingerprint: str) -> None:
        self.index_dir = Path(index_dir)
        self.fingerprint = fingerprint
        self.postings_dir = self.index_dir / "postings"
        self.postings_dir.mkdir(parents=True, exist_ok=True)

    # -- docs step -----------------------------------------------------
    def docs_marker(self) -> Path:
        return self.index_dir / "docs.done.json"

    def docs_done(self) -> bool:
        m = read_json(self.docs_marker())
        return bool(m) and m.get("fingerprint") == self.fingerprint

    def mark_docs_done(self, info: dict) -> None:
        atomic_write_json(self.docs_marker(), {"fingerprint": self.fingerprint, "ts": time.time(), **info})

    # -- postings buckets ----------------------------------------------
    def bucket_marker(self, bucket: int) -> Path:
        return self.postings_dir / f"bucket={bucket:05d}.done.json"

    def completed_buckets(self) -> set[int]:
        done: set[int] = set()
        for p in self.postings_dir.glob("bucket=*.done.json"):
            m = read_json(p)
            if m and m.get("fingerprint") == self.fingerprint:
                done.add(int(m["bucket"]))
        return done

    def write_final(self, payload: dict) -> None:
        atomic_write_json(self.index_dir / "manifest.json", {"fingerprint": self.fingerprint, **payload})
