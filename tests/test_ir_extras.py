"""Property tests for the session-9 IR widening: fielded BM25F must
prefer lead-field hits, CORI must route to the shard that has the
terms, and JM smoothing must preserve tf monotonicity."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _docs_table(texts):
    return pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array([f"src{i % 2}" for i in range(len(texts))], pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def test_bm25f_lead_beats_body(ray_session):
    """Same tf, same length: the doc with the query term in the LEAD
    field must outscore the doc with it buried in the body."""
    import ray.data as rd

    from search_engine_skillbox_ray.pipelines.textstats import bm25f_scores_ds

    filler = " ".join(["pad"] * 40)
    texts = [
        "merge " + filler,            # term at position 0 → lead
        filler + " merge",            # term at position 40 → body
        " ".join(["other"] * 41),     # no match
    ]
    out = (
        bm25f_scores_ds(rd.from_arrow(_docs_table(texts)), "merge", lead_len=8)
        .to_pandas()
        .set_index("doc_id")["score"]
    )
    assert set(out.index) == {0, 1}
    assert out[0] > out[1] > 0


def test_cori_routes_to_matching_shard(ray_session):
    """Docs containing the query live in shard 1 only (odd doc_ids) —
    shard 1 must rank first with n_terms = 1."""
    import ray.data as rd

    from search_engine_skillbox_ray.pipelines.textstats import cori_shard_scores

    texts = []
    for i in range(16):
        texts.append("merge target here" if i % 2 == 1 else "plain filler words")
    out = cori_shard_scores(
        rd.from_arrow(_docs_table(texts)), "merge", n_shards=2
    )
    assert list(out["shard"])[0] == 1
    top = out.iloc[0]
    assert top["n_terms"] == 1
    assert out.iloc[1]["n_terms"] == 0
    assert top["score"] > out.iloc[1]["score"]


def test_jm_tf_monotonic(ray_session, tmp_path):
    """Equal-length docs: more query-term occurrences → higher JM score."""
    import ray.data as rd

    import search_engine_skillbox_ray as ses
    from search_engine_skillbox_ray.pipelines.build import (
        build_index_from_documents_table,
    )
    from search_engine_skillbox_ray.state.engine import SearchEngine

    texts = [
        "merge merge merge pad pad pad",
        "merge merge pad pad pad pad",
        "merge pad pad pad pad pad",
        "other filler words here now too",
    ]
    d = str(tmp_path / "jm_idx")
    build_index_from_documents_table(
        rd.from_arrow(_docs_table(texts)), d, input_token="jm-test"
    )
    eng = SearchEngine(d, float32_scores=False)
    docs, scores = eng.search_jm_scores("merge", lam=0.5)
    s = dict(zip(docs.tolist(), scores.tolist()))
    assert set(s) == {0, 1, 2}
    assert s[0] > s[1] > s[2]
