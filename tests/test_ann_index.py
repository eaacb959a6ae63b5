"""Persisted partitioned ANN index: build-once layout, probe-only reads,
parity with the scan-based operators (SURVEY training-data extensions;
the round-1 gap: every ANN call re-scanned and re-signed the corpus)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def emb(ray_session):
    import ray.data as rd

    return rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")


@pytest.fixture(scope="module")
def queries(emb):
    rows = emb.filter(expr="vec_id < 5").take_all()
    rows.sort(key=lambda r: r["vec_id"])
    return np.asarray([r["embedding"] for r in rows], dtype=np.float64)


def test_lsh_index_matches_scan_operator(emb, queries, tmp_path_factory):
    from search_engine_skillbox_ray.pipelines.ann import lsh_topk
    from search_engine_skillbox_ray.pipelines.ann_index import AnnIndex, build_lsh_index

    d = tmp_path_factory.mktemp("lsh_idx")
    mf = build_lsh_index(emb, d, n_planes=4, seed=42, input_token="t")
    assert mf["n_vectors"] == emb.count()

    idx = AnnIndex(d)
    got = idx.topk(queries, k=10, n_probes=11).to_pandas()
    want = lsh_topk(emb, queries, k=10, n_planes=4, n_probes=11).to_pandas()
    # identical semantics: same probe rule, same rerank, same ties
    assert got.values.tolist() == want.values.tolist()


def test_lsh_index_reads_only_probed_partitions(emb, queries, tmp_path_factory):
    from search_engine_skillbox_ray.pipelines.ann_index import AnnIndex, build_lsh_index

    d = tmp_path_factory.mktemp("lsh_idx2")
    build_lsh_index(emb, d, n_planes=4, seed=42, input_token="t")
    idx = AnnIndex(d)
    one = queries[:1]
    idx.topk(one, k=10, n_probes=3)
    assert 0 < len(idx.last_files_read) <= 3, idx.last_files_read
    total = len(list(d.glob("bucket=*.parquet")))
    assert total > 3  # pruning is real, not reading-everything


def test_lsh_index_rebuild_short_circuits(emb, tmp_path_factory):
    from search_engine_skillbox_ray.pipelines.ann_index import build_lsh_index

    d = tmp_path_factory.mktemp("lsh_idx3")
    m1 = build_lsh_index(emb, d, n_planes=4, seed=42, input_token="t")
    files = sorted(d.glob("bucket=*.parquet"))
    mtimes = [f.stat().st_mtime_ns for f in files]
    m2 = build_lsh_index(emb, d, n_planes=4, seed=42, input_token="t")
    assert m2["fingerprint"] == m1["fingerprint"]
    assert [f.stat().st_mtime_ns for f in files] == mtimes, "rebuild rewrote partitions"


def test_ivf_index_recall_and_pruning(emb, queries, tmp_path_factory):
    from search_engine_skillbox_ray.pipelines.ann import brute_force_topk
    from search_engine_skillbox_ray.pipelines.ann_index import AnnIndex, build_ivf_index

    d = tmp_path_factory.mktemp("ivf_idx")
    mf = build_ivf_index(emb, d, n_lists=8, seed=42, input_token="t")
    assert mf["n_vectors"] == emb.count()
    idx = AnnIndex(d)
    got = idx.topk(queries, k=10, n_probe=4).to_pandas()
    assert len(idx.last_files_read) <= 8  # union over 5 queries, ≤ n_lists
    idx.topk(queries[:1], k=10, n_probe=2)
    assert len(idx.last_files_read) <= 2

    exact = brute_force_topk(emb, queries, k=10).to_pandas()
    recalls = []
    for qi in range(len(queries)):
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        a = set(got[got["query_id"] == qi]["vec_id"])
        recalls.append(len(e & a) / max(1, len(e)))
    assert np.mean(recalls) >= 0.5, recalls

    got2 = idx.topk(queries, k=10, n_probe=4).to_pandas()
    assert got.values.tolist() == got2.values.tolist()  # deterministic


def test_lsh_delete_and_compaction(emb, queries, tmp_path_factory):
    """Tombstone deletes: killed vectors vanish from probes at read
    time; compaction folds the kill set into the partitions with
    identical results and drops the tombstones; a rebuild clears
    stale tombstones."""
    from pathlib import Path

    from search_engine_skillbox_ray.pipelines.ann_index import (
        AnnIndex,
        build_lsh_index,
        compact_ann_index,
        delete_vectors,
    )

    d = tmp_path_factory.mktemp("lsh_del")
    build_lsh_index(emb, d, n_planes=4, seed=42, input_token="t-del")
    ids = np.array([r["vec_id"] for r in emb.select_columns(["vec_id"]).take_all()])
    odd = ids[ids % 2 == 1]
    r = delete_vectors(d, odd, input_token="kill-odd")
    assert r["n_tombstoned"] == len(np.unique(odd))
    # same-token re-delete is a no-op marker hit
    assert delete_vectors(d, odd, input_token="kill-odd") == r

    idx = AnnIndex(d)
    got = idx.topk(queries, k=10, n_probes=11).to_pandas()
    assert len(got) and (got["vec_id"].to_numpy() % 2 == 0).all()

    # ground truth: an index built over only the even vectors
    even_emb = emb.filter(lambda r: r["vec_id"] % 2 == 0)
    d2 = tmp_path_factory.mktemp("lsh_even")
    build_lsh_index(even_emb, d2, n_planes=4, seed=42, input_token="t-even")
    want = AnnIndex(d2).topk(queries, k=10, n_probes=11).to_pandas()
    assert got.values.tolist() == want.values.tolist()

    # compaction: identical results, tombstones gone, files filtered
    compact_ann_index(d)
    assert not list(Path(d).glob("ann_tombstone-*.parquet"))
    idx2 = AnnIndex(d)
    assert idx2.dead.size == 0
    got2 = idx2.topk(queries, k=10, n_probes=11).to_pandas()
    assert got2.values.tolist() == want.values.tolist()
    # idempotent re-run
    assert compact_ann_index(d) == {"n_partitions_compacted": 0}

    # a rebuild (new fingerprint) clears tombstones and markers
    delete_vectors(d, ids[ids % 4 == 0], input_token="kill-quads")
    build_lsh_index(emb, d, n_planes=4, seed=42, input_token="t-del-2")
    assert not list(Path(d).glob("ann_tombstone-*.parquet"))
    assert not list(Path(d).glob("ann_delete.*.json"))
    got3 = AnnIndex(d).topk(queries, k=10, n_probes=11).to_pandas()
    full = AnnIndex(d).topk(queries, k=10, n_probes=11).to_pandas()
    assert got3.values.tolist() == full.values.tolist()


def test_lsh_lsm_append_delete_readd(emb, queries, tmp_path_factory):
    """Full LSM lifecycle on the ANN index: even-build + odd-append ==
    whole build; delete -> re-append keeps the re-added vectors (seq
    semantics); compaction folds deltas AND tombstones with identical
    probes and base_seq recorded."""
    from pathlib import Path

    from search_engine_skillbox_ray.pipelines.ann_index import (
        AnnIndex,
        append_vectors,
        build_lsh_index,
        compact_ann_index,
        delete_vectors,
    )

    full = tmp_path_factory.mktemp("lsm_full")
    build_lsh_index(emb, full, n_planes=4, seed=42, input_token="f")
    want = AnnIndex(full).topk(queries, k=10, n_probes=11).to_pandas()

    half = tmp_path_factory.mktemp("lsm_half")
    even = emb.filter(lambda r: r["vec_id"] % 2 == 0)
    odd = emb.filter(lambda r: r["vec_id"] % 2 == 1)
    build_lsh_index(even, half, n_planes=4, seed=42, input_token="h")
    r = append_vectors(half, odd, input_token="h2")
    assert r["n_vectors"] == odd.count()
    # same-token re-append is a marker no-op
    assert append_vectors(half, odd, input_token="h2") == r
    got = AnnIndex(half).topk(queries, k=10, n_probes=11).to_pandas()
    assert got.values.tolist() == want.values.tolist()

    # delete all odd, re-append them: the re-added rows stay live
    ids = np.array([x["vec_id"] for x in emb.select_columns(["vec_id"]).take_all()])
    delete_vectors(half, ids[ids % 2 == 1], input_token="kill-odd")
    append_vectors(half, odd, input_token="h3")
    got2 = AnnIndex(half).topk(queries, k=10, n_probes=11).to_pandas()
    assert got2.values.tolist() == want.values.tolist()

    compact_ann_index(half)
    assert not list(Path(half).glob("*delta*"))
    assert not list(Path(half).glob("ann_tombstone-*.parquet"))
    got3 = AnnIndex(half).topk(queries, k=10, n_probes=11).to_pandas()
    assert got3.values.tolist() == want.values.tolist()


def test_ivf_lsm_append_and_delete(emb, queries, tmp_path_factory):
    """IVF streaming insert with the FROZEN persisted centroids: an
    appended vector is immediately retrievable (its own query returns
    it at rank 0, cosine 1.0), a tombstone kills it again, and
    compaction folds both."""
    import pyarrow.compute as pc_

    from search_engine_skillbox_ray.pipelines.ann_index import (
        AnnIndex,
        append_vectors,
        build_ivf_index,
        compact_ann_index,
        delete_vectors,
    )

    d = tmp_path_factory.mktemp("ivf_lsm")
    build_ivf_index(emb, d, n_lists=8, seed=42, input_token="t")
    shifted = emb.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("vec_id"),
            "vec_id",
            pc_.add(t.column("vec_id"), 100000),
        ),
        batch_format="pyarrow",
    )
    r = append_vectors(d, shifted, input_token="x")
    assert r["n_vectors"] == emb.count()
    idx = AnnIndex(d)
    got = idx.topk(queries, k=4, n_probe=8).to_pandas()
    # each query vector now exists twice (original + shifted copy):
    # both must surface with cosine 1.0 before anything else
    for qi in range(len(queries)):
        top2 = got[got["query_id"] == qi].head(2)
        assert set(top2["vec_id"]) == {qi, qi + 100000}
        assert (top2["cosine"] == 1.0).all()

    delete_vectors(d, [qi + 100000 for qi in range(len(queries))], input_token="k")
    got2 = AnnIndex(d).topk(queries, k=4, n_probe=8).to_pandas()
    assert not (set(got2["vec_id"]) & {qi + 100000 for qi in range(len(queries))})

    compact_ann_index(d)
    got3 = AnnIndex(d).topk(queries, k=4, n_probe=8).to_pandas()
    assert got3.values.tolist() == got2.values.tolist()
