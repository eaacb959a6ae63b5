"""Dense docID scheme: 0..N-1 over sorted distinct normalized urls,
sequential allocation for single-page updates, hash fallback intact."""

import json
from pathlib import Path

import pyarrow as pa
import pytest

import search_engine_skillbox_ray as ses
from search_engine_skillbox_ray.pipelines.build import BuildConfig, build_index_from_pages
from search_engine_skillbox_ray.sources.fixtures import generate_pages_table
from search_engine_skillbox_ray.sources.pages import derive_sites
from search_engine_skillbox_ray.state.updater import IndexUpdater


@pytest.fixture()
def built(ray_session, tmp_path):
    import ray.data as rd

    tbl = generate_pages_table(80, n_sites=2, seed=19)
    pages = rd.from_arrow(tbl)
    sites = derive_sites(pages)
    idx = tmp_path / "idx"
    build_index_from_pages(
        pages, idx, sites,
        BuildConfig(n_buckets=4, sample_fraction=0, tokenize_concurrency=(1, 2)),
        input_token="dense-test",
    )
    return str(idx), sites, tbl


def test_ids_are_dense(built):
    idx, _, tbl = built
    import numpy as np
    import pyarrow.parquet as pq

    from search_engine_skillbox_ray.functions.urls import normalize_url

    stats = json.loads((Path(idx) / "stats.json").read_text())
    assert stats["doc_id_scheme"] == "dense"
    n_urls = len({normalize_url(u) for u in tbl["url"].to_pylist()})
    assert stats["next_doc_id"] == n_urls

    ids = pq.read_table(Path(idx) / "docs", columns=["doc_id"])["doc_id"].to_numpy(
        zero_copy_only=False
    )
    assert ids.min() >= 0 and ids.max() < n_urls
    assert len(np.unique(ids)) == len(ids)


def test_updater_allocates_sequential_ids(built):
    idx, sites, _ = built
    stats0 = json.loads((Path(idx) / "stats.json").read_text())
    nxt = stats0["next_doc_id"]
    upd = IndexUpdater(idx)
    assert upd.index_page(f"{sites[0]['url']}/fresh/one", text="aaa bbb")["result"]
    assert upd.index_page(f"{sites[0]['url']}/fresh/two", text="ccc ddd")["result"]
    stats1 = json.loads((Path(idx) / "stats.json").read_text())
    assert stats1["next_doc_id"] == nxt + 2

    # re-index of an existing path REUSES its id (no new identity)
    eng = ses.SearchEngine(idx)
    d1, _, _ = eng.search_scores("aaa")
    assert upd.index_page(f"{sites[0]['url']}/fresh/one", text="aaa changed")["result"]
    eng.reload_updates()
    d2, _, _ = eng.search_scores("aaa")
    assert d1.tolist() == d2.tolist()
    stats2 = json.loads((Path(idx) / "stats.json").read_text())
    assert stats2["next_doc_id"] == nxt + 2  # no allocation on re-index
