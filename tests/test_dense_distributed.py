"""Distributed dense docID assignment (cluster-scale path).

Above the driver fast-path threshold, ``prepare_docs`` builds the
(url, doc_id) map with a distributed sorted-rank (one key-only shuffle,
one row-count per block on the driver) and hash-joins it onto the docs
stream via ``Dataset.join``. Ids — and therefore posting segments —
must be IDENTICAL to the driver fast path at any threshold.
"""

import hashlib
import json
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

import search_engine_skillbox_ray as ses
from search_engine_skillbox_ray.sources.fixtures import write_pages_parquet
from search_engine_skillbox_ray.sources.pages import build_dense_id_map, derive_sites

from .conftest import requires_solo_ray


def _seg_hashes(idx: Path) -> dict[str, str]:
    return {
        f.name: hashlib.md5(f.read_bytes()).hexdigest()
        for f in sorted((idx / "postings").glob("bucket=*.parquet"))
    }


def _build(pages_dir: Path, idx: Path):
    pages = rd.read_parquet(str(pages_dir))
    sites = derive_sites(rd.read_parquet(str(pages_dir), columns=["url"]))
    cfg = ses.BuildConfig(
        n_buckets=4, sample_fraction=0, tokenize_concurrency=(1, 2)
    )
    res = ses.build_index_from_pages(
        pages, idx, sites, cfg, input_token=str(idx), pages_path=str(pages_dir)
    )
    return res, sites


def test_id_map_matches_fastpath_ranks(ray_session, tmp_path):
    pages_dir = write_pages_parquet(
        tmp_path / "pages", 300, n_sites=2, seed=23, shard_rows=60, dup_fraction=0.1
    )
    from search_engine_skillbox_ray.functions.urls import normalize_url

    raw = pq.read_table(pages_dir, columns=["url"])["url"].to_pylist()
    expect = {u: i for i, u in enumerate(sorted({normalize_url(u) for u in raw}))}

    id_map, total = build_dense_id_map(str(pages_dir))
    rows = id_map.take_all()
    assert total == len(expect) == len(rows)
    got = {r["url"]: r["doc_id"] for r in rows}
    assert got == expect


@requires_solo_ray
def test_distributed_build_byte_identical_to_fastpath(ray_session, tmp_path, monkeypatch):
    pages_dir = write_pages_parquet(
        tmp_path / "pages", 400, n_sites=2, seed=11, shard_rows=100, dup_fraction=0.15
    )
    res_a, _ = _build(pages_dir, tmp_path / "idx_a")
    stats_a = json.loads((tmp_path / "idx_a" / "stats.json").read_text())
    assert stats_a["doc_id_scheme"] == "dense"

    from search_engine_skillbox_ray import config

    monkeypatch.setattr(config, "DRIVER_FASTPATH_ROWS", 10)
    res_b, _ = _build(pages_dir, tmp_path / "idx_b")
    stats_b = json.loads((tmp_path / "idx_b" / "stats.json").read_text())
    assert stats_b["doc_id_scheme"] == "dense"
    assert stats_b.get("dense_id_path") == "distributed"
    assert stats_b["next_doc_id"] == stats_a["next_doc_id"]
    assert res_b.n_docs == res_a.n_docs

    ha, hb = _seg_hashes(tmp_path / "idx_a"), _seg_hashes(tmp_path / "idx_b")
    assert ha and ha == hb

    # docs tables carry the same (doc_id, url) assignment
    da = pq.read_table(tmp_path / "idx_a" / "docs", columns=["doc_id", "url"])
    db = pq.read_table(tmp_path / "idx_b" / "docs", columns=["doc_id", "url"])
    pairs = lambda t: sorted(zip(t["doc_id"].to_pylist(), t["url"].to_pylist()))
    assert pairs(da) == pairs(db)

    # and the engines agree end-to-end
    term = pq.read_table(
        sorted((tmp_path / "idx_a" / "postings").glob("bucket=*.parquet"))[0],
        columns=["term"],
    )["term"][0].as_py()
    ea = ses.SearchEngine(str(tmp_path / "idx_a"))
    eb = ses.SearchEngine(str(tmp_path / "idx_b"))
    ia, sa, _ = ea.search_scores(term)
    ib, sb, _ = eb.search_scores(term)
    assert ia.tolist() == ib.tolist()
    assert sa.tolist() == sb.tolist()


def test_distributed_path_empty_corpus(ray_session, tmp_path):
    empty = pa.table(
        {
            "url": pa.array([], pa.string()),
            "warc_ts": pa.array([], pa.timestamp("us")),
            "html": pa.array([], pa.binary()),
        }
    )
    d = tmp_path / "pages"
    d.mkdir()
    pq.write_table(empty, d / "part-0.parquet")
    id_map, total = build_dense_id_map(str(d))
    assert total == 0
    assert id_map.count() == 0
