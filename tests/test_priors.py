"""Static doc-prior serving (the pagerank/freshness slot of web
ranking): crawl time rides the doc store (``ts_us`` from the input's
``warc_ts``), ``write_recency_priors`` derives a rational-decay prior
table from the index's OWN shards, and the engine multiplies scores by
the prior post-retrieval (docs absent from the table score 1.0)."""

import numpy as np
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import pytest

import search_engine_skillbox_ray as ses
from search_engine_skillbox_ray.pipelines.build import (
    BuildConfig,
    build_index_from_pages,
    write_recency_priors,
)
from search_engine_skillbox_ray.sources.fixtures import generate_pages_table
from search_engine_skillbox_ray.sources.pages import derive_sites

N_PAGES = 240
HALF_LIFE = 30.0


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    import ray.data as rd

    tbl = generate_pages_table(N_PAGES, n_sites=3, seed=7, dup_fraction=0.05)
    pages = rd.from_arrow(tbl)
    sites = derive_sites(pages)
    idx = tmp_path_factory.mktemp("idx_priors")
    cfg = BuildConfig(
        n_buckets=4,
        tokenize_concurrency=(1, 2),
        prep_concurrency=(1, 2),
    )
    build_index_from_pages(pages, idx, sites, cfg, input_token="priors-test")
    return str(idx), tmp_path_factory


def _probe_queries(index_dir):
    """Three queries of mid-df terms read from the index's own segments
    (the fixture vocabulary is Zipf-headed; hardcoded words either miss
    or hit the reference common-word drop)."""
    import pathlib

    import pyarrow.compute as pc

    terms, dfs = [], []
    for f in sorted(pathlib.Path(index_dir, "postings").glob("bucket=*.parquet")):
        t = pq.read_table(f, columns=["term", "df", "site_id"])
        t = t.filter(pc.equal(t["site_id"], -1)) if -1 in t["site_id"].to_pylist() else t
        terms += t["term"].to_pylist()
        dfs += t["df"].to_pylist()
    mid = sorted(
        (t for t, d in zip(terms, dfs) if 3 <= d <= N_PAGES // 3), key=str
    )
    assert len(mid) >= 6, "fixture vocabulary too small for probe queries"
    return [" ".join(mid[0:3]), " ".join(mid[3:6]), mid[0] + " " + mid[-1]]


def _docs_ts(index_dir):
    files = sorted(str(f) for f in __import__("pathlib").Path(index_dir, "docs").glob("docs-*.parquet"))
    t = pads.dataset(files, format="parquet").to_table(columns=["doc_id", "ts_us"])
    return (
        t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64),
        t["ts_us"].to_numpy(zero_copy_only=False).astype(np.float64),
    )


def test_docs_shards_carry_crawl_time(built):
    idx, _ = built
    files = sorted(__import__("pathlib").Path(idx, "docs").glob("docs-*.parquet"))
    assert files
    for f in files:
        assert "ts_us" in pq.read_schema(f).names
    ids, ts = _docs_ts(idx)
    assert ids.size > 0 and (ts > 0).all()


def test_recency_priors_rerank_exactly(built):
    """Engine-with-priors == engine-without × manually recomputed prior
    per doc, for every candidate — and the ordering follows the boosted
    scores."""
    idx, tmp = built
    ids, ts = _docs_ts(idx)
    now_us = int(ts.max()) + 86_400_000_000  # 1 day after the newest crawl
    out = tmp.mktemp("priors")
    n = write_recency_priors(idx, out, now_us=now_us, half_life_days=HALF_LIFE)
    assert n == ids.size

    base = ses.SearchEngine(idx, scorer="bm25", float32_scores=False)
    boosted = ses.SearchEngine(
        idx, scorer="bm25", float32_scores=False, prior_path=str(out)
    )
    age_days = np.maximum(0.0, (float(now_us) - ts) / 86_400e6)
    prior_by_id = dict(zip(ids.tolist(), (HALF_LIFE / (HALF_LIFE + age_days)).tolist()))

    checked = 0
    for q in _probe_queries(idx):
        d0, s0, _ = base.search_scores(q)
        d1, s1, _ = boosted.search_scores(q)
        assert set(d0.tolist()) == set(d1.tolist())
        m0 = dict(zip(d0.tolist(), s0.tolist()))
        for d, s in zip(d1.tolist(), s1.tolist()):
            assert s == m0[d] * prior_by_id[d]
        # boosted output is sorted by (boosted score desc, doc_id)
        order = np.lexsort((d1, -s1))
        assert (order == np.arange(d1.size)).all()
        checked += d1.size
    assert checked > 0


def test_missing_docs_default_prior_one(built, tmp_path):
    """A priors table covering only half the docs leaves the rest at
    exactly the unboosted score."""
    import pyarrow as pa

    idx, _ = built
    ids, ts = _docs_ts(idx)
    keep = ids[ids % 2 == 0]
    pq.write_table(
        pa.table({"doc_id": keep, "prior": np.full(keep.size, 0.25)}),
        tmp_path / "p.parquet",
    )
    base = ses.SearchEngine(idx, scorer="bm25", float32_scores=False)
    boosted = ses.SearchEngine(
        idx, scorer="bm25", float32_scores=False, prior_path=str(tmp_path / "p.parquet")
    )
    q = _probe_queries(idx)[0]
    d0, s0, _ = base.search_scores(q)
    d1, s1, _ = boosted.search_scores(q)
    m0 = dict(zip(d0.tolist(), s0.tolist()))
    assert d1.size
    for d, s in zip(d1.tolist(), s1.tolist()):
        assert s == m0[d] * (0.25 if d % 2 == 0 else 1.0)
