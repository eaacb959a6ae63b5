"""Micro-batch streaming ingestion (``IndexUpdater.index_pages``): the
LSM delta-segment layer. Semantics under test: batched upsert parity with
a from-scratch rebuild over the union corpus, interleaving with the
single-page path, kill-map correctness across replacement chains, and
compaction folding every layer down losslessly."""

import numpy as np
import pyarrow as pa
import pytest

import search_engine_skillbox_ray as ses
from search_engine_skillbox_ray.pipelines.build import BuildConfig, build_index_from_pages
from search_engine_skillbox_ray.sources.fixtures import generate_pages_table
from search_engine_skillbox_ray.sources.pages import derive_sites
from search_engine_skillbox_ray.state.updater import IndexUpdater

CFG = dict(n_buckets=4, sample_fraction=0, tokenize_concurrency=(1, 2))


def _build(tmp_path, tbl, name="idx"):
    import ray.data as rd

    pages = rd.from_arrow(tbl)
    sites = derive_sites(pages)
    idx = tmp_path / name
    build_index_from_pages(pages, idx, sites, BuildConfig(**CFG), input_token=name)
    return str(idx), sites


def _live_tf(engine) -> set[tuple[int, str, str, int]]:
    """(site_id, path, term, tf) set for the engine's LIVE posting view —
    docID-namespace-independent, so incremental and rebuilt indexes
    compare directly."""
    dump = engine.dump_doc_term_tf()
    ids = np.unique(dump["doc_id"].to_numpy(zero_copy_only=False))
    rows = engine._hydrate(ids)
    out = set()
    for did, term, tf in zip(
        dump["doc_id"].to_pylist(), dump["term"].to_pylist(), dump["tf"].to_pylist()
    ):
        r = rows[int(did)]
        out.add((int(r["site_id"]), r["path"], term, int(tf)))
    return out


@pytest.fixture()
def base(ray_session, tmp_path):
    tbl = generate_pages_table(80, n_sites=2, seed=61, dup_fraction=0)
    idx, sites = _build(tmp_path, tbl, "base")
    return idx, sites, tbl, tmp_path


def test_ingest_new_pages_matches_rebuild(base):
    idx, sites, tbl, tmp_path = base
    more = generate_pages_table(40, n_sites=2, seed=62, dup_fraction=0, path_offset=500)

    import ray.data as rd

    r = IndexUpdater(idx).index_pages(rd.from_arrow(more))
    assert r["result"] is True and r["n_new"] > 0 and r["n_replaced"] == 0

    eng = ses.SearchEngine(idx)
    union = pa.concat_tables([tbl, more])
    ridx, _ = _build(tmp_path, union, "rebuilt")
    ref = ses.SearchEngine(ridx)
    assert _live_tf(eng) == _live_tf(ref)
    # stats coherent with the rebuilt corpus
    assert eng.stats["n_docs"] == ref.stats["n_docs"]
    assert eng.stats["sum_doc_len"] == ref.stats["sum_doc_len"]


def test_ingest_replacements_and_compact(base):
    idx, sites, tbl, tmp_path = base
    # replace an existing page and add a new one, via a plain arrow table
    url_old = tbl["url"][0].as_py()
    upd = IndexUpdater(idx)
    batch = pa.table(
        {
            "url": pa.array([url_old, f"{sites[0]['url']}/fresh/1"], pa.string()),
            "text": pa.array(
                ["replacement xylophone content", "brandnew quixotic page"], pa.string()
            ),
        }
    )
    r = upd.index_pages(batch)
    assert r["result"] is True and r["n_replaced"] >= 1 and r["n_new"] == 1

    eng = ses.SearchEngine(idx)
    d, _, _ = eng.search_scores("xylophone")
    assert d.size == 1
    assert eng.search_scores("quixotic")[0].size == 1
    before = _live_tf(eng)

    # compact folds the segment; results identical, logs cleared
    assert upd.compact()["result"] is True
    eng2 = ses.SearchEngine(idx)
    assert _live_tf(eng2) == before
    assert not list((eng2.index_dir / "postings_delta").glob("seg-*.parquet"))
    assert eng2.search_scores("xylophone")[0].size == 1
    # replaced content is NOT resurrected by compaction
    assert _count_path_live(upd, sites, url_old) == 1


def _count_path_live(upd, sites, url):
    from search_engine_skillbox_ray.functions.urls import extract_path, normalize_url

    nu = normalize_url(url)
    site = next(s for s in sites if nu.startswith(normalize_url(s["url"])))
    path = extract_path(url, site["url"])
    return len(upd._find_existing(int(site["site_id"]), path))


def test_replacement_chain_seg_then_page_then_seg(base):
    """index_pages → index_page → index_pages on the same url: each layer
    kills the previous one; exactly one live version at every step."""
    idx, sites, tbl, tmp_path = base
    upd = IndexUpdater(idx)
    url = f"{sites[1]['url']}/chain/1"

    assert upd.index_pages([{"url": url, "text": "versionone alpha"}])["result"]
    eng = ses.SearchEngine(idx)
    assert eng.search_scores("versionone")[0].size == 1

    assert upd.index_page(url, text="versiontwo beta")["result"]
    eng.reload_updates()
    assert eng.search_scores("versionone")[0].size == 0
    assert eng.search_scores("versiontwo")[0].size == 1

    assert upd.index_pages([{"url": url, "text": "versionthree gamma"}])["result"]
    eng.reload_updates()
    assert eng.search_scores("versiontwo")[0].size == 0
    d, _, _ = eng.search_scores("versionthree")
    assert d.size == 1
    # pruned path agrees with exhaustive after the chain
    td, _ = eng.topk("versionthree", k=5)
    assert set(td.tolist()) == set(d.tolist())

    # compact mid-chain state, then replace once more
    assert upd.compact()["result"]
    eng.reload_updates()
    assert eng.search_scores("versionthree")[0].size == 1
    assert upd.index_pages([{"url": url, "text": "versionfour delta"}])["result"]
    eng.reload_updates()
    assert eng.search_scores("versionthree")[0].size == 0
    assert eng.search_scores("versionfour")[0].size == 1


def test_duplicate_keys_in_one_batch_keep_one(base):
    idx, sites, tbl, tmp_path = base
    upd = IndexUpdater(idx)
    url = f"{sites[0]['url']}/dup/batch"
    rows = [
        {"url": url, "text": "short"},
        {"url": url + "/", "text": "much longer duplicate winner content"},
    ]
    r = upd.index_pages(rows)
    assert r["result"] is True and r["n_new"] == 1
    eng = ses.SearchEngine(idx)
    assert eng.search_scores("winner")[0].size == 1
    assert eng.search_scores("short")[0].size == 0
    assert _count_path_live(upd, sites, url) == 1


def test_unmatched_site_counted_not_ingested(base):
    idx, sites, tbl, tmp_path = base
    r = IndexUpdater(idx).index_pages(
        [{"url": "https://elsewhere.invalid/x", "text": "orphan words"}]
    )
    assert r["result"] is True and r["n_pages"] == 0 and r["n_unmatched"] == 1
    eng = ses.SearchEngine(idx)
    assert eng.search_scores("orphan")[0].size == 0


def test_memory_light_hydrate_sees_deltas(base):
    idx, sites, tbl, tmp_path = base
    upd = IndexUpdater(idx)
    url = tbl["url"][3].as_py()
    assert upd.index_pages([{"url": url, "text": "lighthydrate replacement body"}])["result"]
    eng = ses.SearchEngine(idx, docs_in_memory=False)
    resp = eng.search("lighthydrate")
    assert resp["count"] == 1
    assert "lighthydrate" in resp["data"][0]["snippet"].replace("<b>", "").replace("</b>", "")


def test_service_facade_and_statistics(base):
    idx, sites, tbl, tmp_path = base
    svc = ses.SearchEngineService(idx, sites)
    pages_before = svc.statistics()["statistics"]["total"]["pages"]
    r = svc.index_pages([
        {"url": f"{sites[0]['url']}/svc/a", "text": "serviceingest one"},
        {"url": f"{sites[1]['url']}/svc/b", "text": "serviceingest two"},
    ])
    assert r["result"] is True and r["n_new"] == 2
    stats = svc.statistics()
    assert stats["statistics"]["total"]["pages"] == pages_before + 2
    assert svc.search("serviceingest")["count"] == 2
    assert svc.compact()["result"] is True
    assert svc.search("serviceingest")["count"] == 2


def test_rebuild_clears_update_log(base):
    """A from-scratch rebuild over a mutated index dir must not overlay
    the PREVIOUS lifetime's tombstones/delta segments onto the fresh
    segments (docIDs get reassigned — stale deltas would corrupt)."""
    import ray.data as rd

    idx, sites, tbl, tmp_path = base
    upd = IndexUpdater(idx)
    assert upd.index_pages([{"url": f"{sites[0]['url']}/stale/1", "text": "staleword here"}])["result"]
    assert upd.index_page(f"{sites[0]['url']}/stale/2", text="otherstale word")["result"]

    tbl2 = generate_pages_table(60, n_sites=2, seed=77, dup_fraction=0)
    pages = rd.from_arrow(tbl2)
    build_index_from_pages(
        pages, idx, derive_sites(pages), BuildConfig(**CFG), input_token="rebuild-v2"
    )
    eng = ses.SearchEngine(idx)
    assert eng._tombstones.size == 0 and not eng._delta_terms and not eng._kill
    assert eng.search_scores("staleword")[0].size == 0
    # fresh index matches a clean-dir build of the same table
    ridx, _ = _build(tmp_path, tbl2, "clean-v2")
    assert _live_tf(eng) == _live_tf(ses.SearchEngine(ridx))


def test_bm25_doc_len_after_ingest(base):
    """BM25 uses delta doc lengths: a replaced doc's new (shorter) length
    must flow into the score, not the stale base length."""
    idx, sites, tbl, tmp_path = base
    upd = IndexUpdater(idx)
    url = tbl["url"][5].as_py()
    assert upd.index_pages([{"url": url, "text": "bmtoken"}])["result"]
    eng = ses.SearchEngine(idx, scorer="bm25")
    d, s, _ = eng.search_scores("bmtoken")
    assert d.size == 1
    dl = eng._doc_len_lookup(d)
    assert dl[0] == 1.0


def test_memory_light_hydrate_matches_in_memory_and_survives_compact(base):
    """The doc locator (targeted row-group reads) must return exactly the
    in-memory store's rows, and must be rebuilt after compact() rewrites
    the base shards (reload_updates drops it)."""
    import glob

    import pyarrow.parquet as pq

    idx, sites, tbl, tmp_path = base
    seg = sorted(glob.glob(f"{idx}/postings/bucket=*.parquet"))[0]
    terms = pq.read_table(seg, columns=["term", "df"])
    qterms = [
        t for t, _ in sorted(
            zip(terms["term"].to_pylist(), terms["df"].to_pylist()),
            key=lambda x: -x[1],
        )[:5]
    ]
    light = ses.SearchEngine(idx, docs_in_memory=False)
    heavy = ses.SearchEngine(idx, docs_in_memory=True)
    for q in qterms:
        assert light.search(q, limit=10) == heavy.search(q, limit=10)

    upd = IndexUpdater(idx)
    url = tbl["url"][7].as_py()
    assert upd.index_pages([{"url": url, "text": "compactprobe fresh body"}])["result"]
    upd.compact()
    light.reload_updates()
    heavy.reload_updates()
    resp = light.search("compactprobe")
    assert resp["count"] == 1 and "compactprobe" in resp["data"][0]["snippet"].replace(
        "<b>", ""
    ).replace("</b>", "")
    for q in qterms:
        assert light.search(q, limit=10) == heavy.search(q, limit=10)


def test_key_resolve_distributed_matches_driver(ray_session, tmp_path, monkeypatch):
    """Above DRIVER_FASTPATH_ROWS the upsert key resolve scans the base
    doc shards as a Ray Data job instead of a driver-side pushdown scan;
    the resolved identities — hence the whole ingest outcome — must be
    identical."""
    import shutil

    import ray.data as rd

    tbl = generate_pages_table(120, n_sites=2, seed=77, dup_fraction=0)
    # multiple input blocks → multiple docs shard files (the docs sink
    # writes one shard per fused-operator batch)
    pages = rd.from_arrow(tbl).repartition(4)
    sites = derive_sites(pages)
    idx_a = tmp_path / "a"
    build_index_from_pages(
        pages, idx_a, sites,
        BuildConfig(n_buckets=4, sample_fraction=0, tokenize_concurrency=(1, 2),
                    tokenize_batch_size=32),
        input_token="multi-shard",
    )
    assert len(list((idx_a / "docs").glob("docs-*.parquet"))) > 1
    idx_b = tmp_path / "b"
    shutil.copytree(idx_a, idx_b)

    # mixed micro-batch: replace 3 existing pages, add 2 new ones
    batch = pa.table({
        "url": pa.array(
            [tbl["url"][i].as_py() for i in range(3)]
            + ["https://site0.example/p/90001", "https://site1.example/p/90002"]
        ),
        "text": pa.array([f"replaced fresh content number {i} words" for i in range(5)]),
    })

    from search_engine_skillbox_ray import config

    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(config, "DRIVER_FASTPATH_ROWS", 0)
        r_dist = IndexUpdater(str(idx_a)).index_pages(rd.from_arrow(batch))
    r_drv = IndexUpdater(str(idx_b)).index_pages(rd.from_arrow(batch))
    assert r_dist == r_drv
    assert r_dist["n_replaced"] == 3 and r_dist["n_new"] == 2
    ea, eb = ses.SearchEngine(str(idx_a)), ses.SearchEngine(str(idx_b))
    assert _live_tf(ea) == _live_tf(eb)
    assert ea.stats["n_docs"] == eb.stats["n_docs"]


def test_doc_rowgroup_lru_parity_and_bounds(base):
    """The memory-light hydration LRU returns identical results hot,
    cold, evicting (1-byte ceiling → nothing cached) and repeated; the
    byte accounting respects the ceiling."""
    import glob

    import pyarrow.parquet as pq

    idx, sites, tbl, tmp_path = base
    seg = sorted(glob.glob(f"{idx}/postings/bucket=*.parquet"))[0]
    terms = pq.read_table(seg, columns=["term", "df"])
    qterms = [
        t for t, _ in sorted(
            zip(terms["term"].to_pylist(), terms["df"].to_pylist()),
            key=lambda x: -x[1],
        )[:8]
    ]
    heavy = ses.SearchEngine(idx, docs_in_memory=True)
    expected = {q: heavy.search(q, limit=10) for q in qterms}

    cached = ses.SearchEngine(idx, docs_in_memory=False)
    for _ in range(2):  # second pass is all cache hits
        for q in qterms:
            assert cached.search(q, limit=10) == expected[q]
    assert len(cached._rg_cache) > 0
    assert cached._rg_cache_bytes <= cached.rg_cache_max_bytes
    assert cached._rg_cache_bytes == sum(t.nbytes for t in cached._rg_cache.values())

    uncached = ses.SearchEngine(idx, docs_in_memory=False)
    uncached.rg_cache_max_bytes = 0  # every group bigger than the ceiling
    for q in qterms:
        assert uncached.search(q, limit=10) == expected[q]
    assert len(uncached._rg_cache) == 0

    # reload drops the cache (compact() may rewrite base shards)
    cached.reload_updates()
    assert len(cached._rg_cache) == 0 and cached._rg_cache_bytes == 0
