"""Exact-duplicate (same url + same warc_ts) dedup semantics.

Regression for the winner-filter hole: rows byte-equal on the dedup
winner tuple all survived — same-batch duplicates doubled tf counts,
cross-batch duplicates aborted the build with duplicate doc_ids. The
reference's (site, path) upsert keeps exactly one row
(/root/reference/src/main/java/searchengine/model/PageEntity.java:8-9).
"""

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from search_engine_skillbox_ray.pipelines.build import BuildConfig, build_index_from_pages
from search_engine_skillbox_ray.sources.pages import (
    compute_dup_winners,
    derive_sites,
    prepare_docs,
)

_TS = dt.datetime(2026, 1, 1)


def _pages_with_exact_dups() -> pa.Table:
    """3 distinct pages; one url appears 3× with the SAME warc_ts (an
    exact-duplicate crawl artifact), another 2× with distinct ts."""
    rows = [
        ("https://s.example/a", _TS, "alpha beta gamma"),
        ("https://s.example/a", _TS, "alpha beta gamma"),          # exact dup
        ("https://s.example/a", _TS, "alpha beta gamma"),          # exact dup
        ("https://s.example/b", _TS, "delta epsilon"),
        ("https://s.example/b", _TS + dt.timedelta(seconds=5), "delta zeta newer"),
        ("https://s.example/c", _TS, "eta theta"),
    ]
    return pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "html": pa.array([b""] * len(rows), pa.binary()),
            "text": pa.array([r[2] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
        }
    )


def test_winner_prepass_reports_ties(ray_session, tmp_path):
    import ray.data as rd

    tbl = _pages_with_exact_dups()
    pages = rd.from_arrow(tbl)
    sites = derive_sites(pages)
    winners, tied, urls = compute_dup_winners(pages, sites)
    assert (0, "/a") in winners and (0, "/b") in winners
    assert list(tied) == [(0, "/a")]
    assert tied[(0, "/a")] == ["https://s.example/a"]
    assert urls == ["https://s.example/a", "https://s.example/b", "https://s.example/c"]


@pytest.mark.parametrize("with_path", [True, False])
def test_exact_dups_keep_exactly_one(ray_session, tmp_path, with_path):
    """No duplicate rows may survive corpus prep. With a re-readable
    source (pages_path) the overlapped prepass DROPS tied keys from the
    stream entirely (the build re-adds one resolved row via the delta
    path — covered below); the grouped-shuffle fallback keeps exactly
    one winner inline."""
    import ray.data as rd

    tbl = _pages_with_exact_dups()
    pages_path = None
    if with_path:
        d = tmp_path / "pages"
        d.mkdir()
        pq.write_table(tbl, d / "pages-0000.parquet")
        pages_path = str(d)
        pages = rd.read_parquet(pages_path)
    else:
        pages = rd.from_arrow(tbl)
    sites = derive_sites(pages)
    docs = prepare_docs(
        pages, sites, dedup=True, use_text_col=True, pages_path=pages_path
    ).to_pandas()
    if with_path:
        assert sorted(docs["path"]) == ["/b", "/c"]  # tied key deferred to delta
    else:
        assert sorted(docs["path"]) == ["/a", "/b", "/c"]
    assert len(docs) == len(set(docs["doc_id"]))
    # keep-latest still holds for the distinct-ts key
    assert docs.set_index("path").loc["/b", "text"] == "delta zeta newer"


def test_build_survives_exact_dups_and_tf_not_doubled(ray_session, tmp_path):
    import ray.data as rd

    import search_engine_skillbox_ray as ses

    tbl = _pages_with_exact_dups()
    d = tmp_path / "pages"
    d.mkdir()
    pq.write_table(tbl, d / "pages-0000.parquet")
    pages = rd.read_parquet(str(d))
    sites = derive_sites(pages)
    idx = tmp_path / "idx"
    res = build_index_from_pages(
        pages, idx, sites,
        BuildConfig(
            n_buckets=4, sample_fraction=0, tokenize_concurrency=(1, 2),
            use_text_col=True,
        ),
        input_token="tie-build", pages_path=str(d),
    )
    assert res.n_docs == 3
    eng = ses.SearchEngine(str(idx))
    docs, tfs, df = eng.term_postings("alpha")
    assert df == 1 and tfs[0] == 1, "tf doubled by surviving duplicate rows"
    # the tied page is fully searchable and hydrates (delta-path re-add)
    resp = eng.search("alpha")
    assert resp["count"] == 1 and resp["data"][0]["uri"].endswith("/a")


def test_fingerprint_invalidates_on_input_change(ray_session, tmp_path):
    """Changed source data at the same path must invalidate resume
    markers (regression: fingerprint hashed only the path string)."""
    import ray.data as rd

    import search_engine_skillbox_ray as ses

    d = tmp_path / "pages"
    d.mkdir()
    pq.write_table(_pages_with_exact_dups(), d / "pages-0000.parquet")
    idx = tmp_path / "idx"
    cfg = BuildConfig(
        n_buckets=4, sample_fraction=0, tokenize_concurrency=(1, 2), use_text_col=True
    )
    pages = rd.read_parquet(str(d))
    sites = derive_sites(pages)
    build_index_from_pages(pages, idx, sites, cfg, input_token=str(d), pages_path=str(d))
    eng = ses.SearchEngine(str(idx))
    assert eng.search_scores("theta")[0].size == 1

    # rewrite the shard: /c now says "iota kappa" instead of "eta theta"
    import os
    import time

    tbl2 = _pages_with_exact_dups().to_pandas()
    tbl2.loc[tbl2["url"] == "https://s.example/c", "text"] = "iota kappa"
    time.sleep(1.1)  # ensure a new mtime second
    pq.write_table(pa.Table.from_pandas(tbl2, preserve_index=False), d / "pages-0000.parquet")
    os.utime(d / "pages-0000.parquet")

    pages2 = rd.read_parquet(str(d))
    build_index_from_pages(pages2, idx, sites, cfg, input_token=str(d), pages_path=str(d))
    eng2 = ses.SearchEngine(str(idx))
    assert eng2.search_scores("theta")[0].size == 0, "stale index silently reused"
    assert eng2.search_scores("iota")[0].size == 1
