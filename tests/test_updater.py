"""Single-page re-index (delta+tombstone) semantics vs the reference's
deletePageIfExists + indexSinglePage flow (§3.2), plus compaction."""

import numpy as np
import pytest

import search_engine_skillbox_ray as ses
from search_engine_skillbox_ray.pipelines.build import BuildConfig, build_index_from_pages
from search_engine_skillbox_ray.sources.fixtures import generate_pages_table
from search_engine_skillbox_ray.sources.pages import derive_sites
from search_engine_skillbox_ray.state.updater import IndexUpdater


@pytest.fixture()
def built(ray_session, tmp_path):
    import ray.data as rd

    tbl = generate_pages_table(120, n_sites=2, seed=31)
    pages = rd.from_arrow(tbl)
    sites = derive_sites(pages)
    idx = tmp_path / "idx"
    build_index_from_pages(
        pages, idx, sites,
        BuildConfig(n_buckets=4, sample_fraction=0, tokenize_concurrency=(1, 2)),
        input_token="updater-test",
    )
    return str(idx), sites


def test_index_new_page_searchable(built):
    idx, sites = built
    upd = IndexUpdater(idx)
    url = f"{sites[0]['url']}/new/unique-page"
    r = upd.index_page(url, text="zanzibar quokka zanzibar special words here")
    assert r == {"result": True, "error": None}

    eng = ses.SearchEngine(idx)
    d, s, _ = eng.search_scores("zanzibar")
    assert d.size == 1
    resp = eng.search("zanzibar")
    assert resp["count"] == 1
    assert resp["data"][0]["uri"].endswith("/new/unique-page")
    # tf=2 for zanzibar on the only matching doc
    docs, tfs, df = eng.term_postings("zanzibar")
    assert df == 1 and tfs[0] == 2


def test_reindex_replaces_old_content(built):
    idx, sites = built
    upd = IndexUpdater(idx)
    url = f"{sites[0]['url']}/replace/me"
    assert upd.index_page(url, text="oldword apple")["result"] is True
    eng = ses.SearchEngine(idx)
    assert eng.search_scores("oldword")[0].size == 1

    # re-index same path with new content — no duplicates (reference
    # QA item: indexPage doesn't duplicate)
    assert upd.index_page(url, text="newword banana")["result"] is True
    eng.reload_updates()
    assert eng.search_scores("oldword")[0].size == 0
    d, _, _ = eng.search_scores("newword")
    assert d.size == 1
    resp = eng.search("newword")
    assert resp["count"] == 1 and "newword" in resp["data"][0]["snippet"]


def test_outside_config_error(built):
    idx, _ = built
    upd = IndexUpdater(idx)
    r = upd.index_page("https://not-configured.example/x", text="zz")
    assert r["result"] is False
    assert "не найден в конфиге" in r["error"]


def test_stats_follow_updates(built):
    idx, sites = built
    upd = IndexUpdater(idx)
    eng0 = ses.SearchEngine(idx)
    n0 = eng0.stats["n_docs"]
    upd.index_page(f"{sites[0]['url']}/stat/one", text="words here now")
    eng1 = ses.SearchEngine(idx)
    assert eng1.stats["n_docs"] == n0 + 1
    # replacement should not change counts further
    upd.index_page(f"{sites[0]['url']}/stat/one", text="other words")
    eng2 = ses.SearchEngine(idx)
    assert eng2.stats["n_docs"] == n0 + 1


def test_compaction_preserves_results(built):
    idx, sites = built
    upd = IndexUpdater(idx)
    url = f"{sites[1]['url']}/compact/target"
    upd.index_page(url, text="first version compactcheck")
    upd.index_page(url, text="second version compactcheck revised")

    eng = ses.SearchEngine(idx)
    before = {
        "compactcheck": eng.search_scores("compactcheck")[0].tolist(),
        "revised": eng.search_scores("revised")[0].tolist(),
        "first": eng.search_scores("first")[0].tolist(),
    }
    assert len(before["compactcheck"]) == 1 and len(before["revised"]) == 1

    r = upd.compact()
    assert r["result"] is True

    eng2 = ses.SearchEngine(idx)
    # delta postings folded in; tombstones persist but are no-ops for
    # the query path (base postings of dead docs are purged)
    assert not eng2._delta_terms
    for q, docs in before.items():
        assert eng2.search_scores(q)[0].tolist() == docs, q
    resp = eng2.search("revised")
    assert resp["count"] == 1 and resp["data"][0]["uri"].endswith("/compact/target")


def test_service_facade_lifecycle(ray_session, tmp_path):
    """API-surface semantics (§2.11): start/stop/indexPage/search/statistics."""
    import ray.data as rd

    from search_engine_skillbox_ray.pipelines.build import BuildConfig
    from search_engine_skillbox_ray.state.service import SearchEngineService

    tbl = generate_pages_table(100, n_sites=2, seed=41)
    pages = rd.from_arrow(tbl)
    sites = derive_sites(pages)
    svc = SearchEngineService(
        tmp_path / "idx",
        sites,
        BuildConfig(n_buckets=4, sample_fraction=0, tokenize_concurrency=(1, 2)),
    )
    # stop when not running → result true (IndexingServiceImpl.java:84-87)
    assert svc.stop_indexing()["result"] is True
    assert svc.start_indexing(pages, input_token="svc")["result"] is True
    st = svc.statistics()["statistics"]
    assert st["total"]["pages"] > 0 and st["total"]["indexing"] is False
    assert svc.search("").get("result") is False  # blank query quirk
    r = svc.index_page(f"{sites[0]['url']}/svc/new", text="svcspecial token here")
    assert r["result"] is True
    resp = svc.search("svcspecial")
    assert resp["count"] == 1
    # outside config (IndexingServiceImpl.java:168-173)
    assert svc.index_page("https://elsewhere.example/z", text="x")["result"] is False
