"""Per-partition resume semantics (SURVEY §5.7, north_rule 'resumable
from checkpoint with per-partition lineage'): interrupted builds must
not recompute committed partitions, and the resumed index must be
identical to an uninterrupted build."""

import hashlib
import json
import os
from pathlib import Path

import pytest

import search_engine_skillbox_ray as ses
from search_engine_skillbox_ray.pipelines.build import BuildConfig, build_index_from_pages
from search_engine_skillbox_ray.sources.fixtures import generate_pages_table
from search_engine_skillbox_ray.sources.pages import derive_sites


def _cfg():
    return BuildConfig(n_buckets=6, sample_fraction=0, tokenize_concurrency=(1, 2))


def _file_hashes(idx: Path) -> dict[str, str]:
    out = {}
    for f in sorted((idx / "postings").glob("bucket=*.parquet")):
        out[f.name] = hashlib.md5(f.read_bytes()).hexdigest()
    return out


@pytest.fixture()
def pages_and_sites(ray_session):
    import ray.data as rd

    tbl = generate_pages_table(150, n_sites=2, seed=17)
    pages = rd.from_arrow(tbl)
    return pages, derive_sites(pages)


def test_full_resume_noop(pages_and_sites, tmp_path):
    pages, sites = pages_and_sites
    idx = tmp_path / "idx"
    r1 = build_index_from_pages(pages, idx, sites, _cfg(), input_token="resume-a")
    mtimes = {f: os.path.getmtime(f) for f in (idx / "postings").glob("*.parquet")}
    r2 = build_index_from_pages(pages, idx, sites, _cfg(), input_token="resume-a")
    assert r2.n_buckets_built == 0 and r2.n_buckets_skipped == r1.n_buckets_built
    assert mtimes == {f: os.path.getmtime(f) for f in mtimes}
    assert r2.seconds < r1.seconds / 5  # fast path, no Ray jobs


def test_interrupted_build_resumes_only_missing(pages_and_sites, tmp_path):
    pages, sites = pages_and_sites
    idx = tmp_path / "idx"
    build_index_from_pages(pages, idx, sites, _cfg(), input_token="resume-b")
    full_hashes = _file_hashes(idx)

    # simulate a crash after 4 of 6 bucket partitions committed: remove
    # two segments + their lineage markers
    killed = ["bucket=00001", "bucket=00004"]
    for k in killed:
        (idx / "postings" / f"{k}.parquet").unlink()
        (idx / "postings" / f"{k}.done.json").unlink()
    survivors_mtime = {
        f: os.path.getmtime(f)
        for f in (idx / "postings").glob("*.parquet")
    }

    r = build_index_from_pages(pages, idx, sites, _cfg(), input_token="resume-b")
    assert r.n_buckets_built == 2 and r.n_buckets_skipped == 4

    # committed partitions untouched
    for f, m in survivors_mtime.items():
        assert os.path.getmtime(f) == m, f
    # resumed output byte-identical to the uninterrupted build
    assert _file_hashes(idx) == full_hashes

    eng = ses.SearchEngine(str(idx))
    assert eng.statistics()["statistics"]["total"]["pages"] == r.n_docs


def test_fingerprint_invalidates_stale_markers(pages_and_sites, tmp_path):
    pages, sites = pages_and_sites
    idx = tmp_path / "idx"
    build_index_from_pages(pages, idx, sites, _cfg(), input_token="input-v1")
    # a build with a different input token must NOT trust old markers
    r = build_index_from_pages(pages, idx, sites, _cfg(), input_token="input-v2")
    assert r.n_buckets_skipped == 0 and r.n_buckets_built == 6


def test_manifest_records_lineage(pages_and_sites, tmp_path):
    pages, sites = pages_and_sites
    idx = tmp_path / "idx"
    build_index_from_pages(pages, idx, sites, _cfg(), input_token="lineage")
    mf = json.loads((idx / "manifest.json").read_text())
    assert set(mf["buckets_built"]) == set(range(6))
    assert mf["metrics"]["n_docs"] > 0 and mf["metrics"]["n_postings"] > 0
    marker = json.loads((idx / "postings" / "bucket=00000.done.json").read_text())
    assert {"fingerprint", "bucket", "file", "n_terms", "n_postings"} <= set(marker)


def test_two_level_merge_identical_segments(ray_session, tmp_path):
    """Extreme Zipf head (a term in EVERY doc): the salted two-level merge
    must produce byte-identical segments to the single-level merge."""
    import pyarrow as pa

    import ray.data as rd

    n = 300
    rows = {
        "url": [f"https://s.example/p/{i}" for i in range(n)],
        "html": [
            f"<body>everydoc shared{i % 7} unique{i} word{i % 31}</body>".encode()
            for i in range(n)
        ],
    }
    pages_tbl = pa.table(rows)
    sites = derive_sites(rd.from_arrow(pages_tbl))

    def cfg(two_level):
        return BuildConfig(
            n_buckets=4, heavy_df_threshold=10, salt_target=10, max_salts=8,
            sample_fraction=1.0, sample_max_docs=10_000,
            tokenize_concurrency=(1, 2), two_level_merge=two_level,
        )

    idx1, idx2 = tmp_path / "one", tmp_path / "two"
    build_index_from_pages(rd.from_arrow(pages_tbl), idx1, sites, cfg(False), input_token="t1")
    build_index_from_pages(rd.from_arrow(pages_tbl), idx2, sites, cfg(True), input_token="t1")

    import json
    mf = json.loads((idx2 / "manifest.json").read_text())
    assert mf["heavy_terms"], "head term should be salted"
    h1, h2 = _file_hashes(idx1), _file_hashes(idx2)
    assert h1 == h2

    eng = ses.SearchEngine(str(idx2))
    d, s, _ = eng.search_scores("everydoc")
    assert d.size == n  # the head term matches every doc


def test_build_from_jsonl_source(ray_session, tmp_path):
    """Interop: the same build over a JSONL pages export (S1 source
    flexibility) produces a working index."""
    import base64
    import json as _json

    from search_engine_skillbox_ray.sources.pages import read_pages

    rows = [
        {"url": f"https://j.example/p/{i}",
         "html": f"<body>jsondoc number{i} shared words</body>"}
        for i in range(30)
    ]
    src = tmp_path / "pages.jsonl"
    src.write_text("\n".join(_json.dumps(r) for r in rows))
    pages = read_pages(str(src), fmt="json")
    sites = derive_sites(pages)
    idx = tmp_path / "idx"
    build_index_from_pages(
        pages, idx, sites,
        BuildConfig(n_buckets=2, sample_fraction=0, tokenize_concurrency=(1, 2)),
        input_token="jsonl",
    )
    eng = ses.SearchEngine(str(idx))
    assert eng.search_scores("jsondoc")[0].size == 30


def test_build_deterministic_across_parallelism(pages_and_sites, tmp_path):
    """Segment bytes must not depend on execution parallelism or batch
    boundaries (SURVEY §7.4 'determinism under parallelism')."""
    pages, sites = pages_and_sites
    a, b = tmp_path / "a", tmp_path / "b"
    build_index_from_pages(
        pages, a, sites,
        BuildConfig(n_buckets=6, sample_fraction=0, tokenize_concurrency=1,
                    tokenize_batch_size=32),
        input_token="det",
    )
    build_index_from_pages(
        pages, b, sites,
        BuildConfig(n_buckets=6, sample_fraction=0, tokenize_concurrency=(1, 4),
                    tokenize_batch_size=512),
        input_token="det",
    )
    assert _file_hashes(a) == _file_hashes(b)
