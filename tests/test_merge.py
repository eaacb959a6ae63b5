"""k-way shard-parallel index merge: building k disjoint shards against
the GLOBAL site catalog and merging must reproduce the whole-corpus
index exactly — search scores, corpus statistics, df/cf."""

import json
import shutil

import numpy as np
import pyarrow.compute as pc
import pytest

import search_engine_skillbox_ray as ses
from search_engine_skillbox_ray.pipelines.build import merge_indexes
from search_engine_skillbox_ray.state.engine import SearchEngine

SF = "/root/testdata/sf0.001"
K = 3


@pytest.fixture(scope="module")
def merged_vs_whole(ray_session, tmp_path_factory):
    import ray.data as rd

    docs = rd.read_parquet(f"{SF}/documents.parquet")
    sources = sorted(docs.unique("source"))
    root = tmp_path_factory.mktemp("merge3")
    cfg = ses.BuildConfig(n_buckets=4, tokenize_concurrency=(1, 2),
                          prep_concurrency=(1, 2))

    whole = str(root / "whole")
    ses.build_index_from_documents_table(docs, whole, cfg, input_token="m3-whole",
                                         sources=sources)
    shards = []
    for p in range(K):
        d = str(root / f"shard{p}")
        part = docs.map_batches(
            lambda t, p=p: t.filter(
                pc.equal(pc.subtract(t.column("doc_id"),
                                     pc.multiply(pc.divide(t.column("doc_id"), K), K)), p)
            ),
            batch_format="pyarrow",
        )
        ses.build_index_from_documents_table(part, d, cfg, input_token=f"m3-{p}",
                                             sources=sources)
        shards.append(d)
    merged = str(root / "merged")
    shutil.rmtree(merged, ignore_errors=True)
    res = merge_indexes(shards, merged)
    return whole, merged, res


def test_kway_merge_stats_exact(merged_vs_whole):
    whole, merged, res = merged_vs_whole
    sw = json.loads(open(f"{whole}/stats.json").read())
    sm = json.loads(open(f"{merged}/stats.json").read())
    for k in ("n_docs", "n_docs_indexed", "sum_doc_len", "sites", "site_stats"):
        assert sm[k] == sw[k], k
    assert res["n_docs"] == sw["n_docs"]


def test_kway_merge_search_identical(merged_vs_whole):
    whole, merged, _ = merged_vs_whole
    ew = SearchEngine(whole, float32_scores=False)
    em = SearchEngine(merged, float32_scores=False)
    for q in ("merge batch fast", "scan", "row column"):
        dw, sw, _ = ew.search_scores(q)
        dm, sm, _ = em.search_scores(q)
        assert np.array_equal(dw, dm)
        assert np.array_equal(sw, sm)


def test_merge_rejects_mismatched_shards(merged_vs_whole, tmp_path):
    whole, merged, _ = merged_vs_whole
    with pytest.raises(ValueError, match="at least two"):
        merge_indexes([whole], str(tmp_path / "x"))
