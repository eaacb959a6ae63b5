"""Persisted MinHash signature index: build lineage, LSM appends,
ingest-probe parity with the one-shot snapshot operator."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def mh_corpus(ray_session):
    """Letters-only docs with planted cross-parity near-dups."""
    import ray.data as rd

    rng = np.random.default_rng(21)
    letters = "abcdefghijklmnopqrstuvwxyz"
    vocab = [a + b + c for a in letters[:7] for b in letters[:7] for c in letters[:7]][:150]
    rows = []
    for i in range(60):
        words = rng.choice(vocab, size=25, replace=True).tolist()
        rows.append({"doc_id": 2 * i, "text": " ".join(words)})          # even: indexed
        if i % 4 == 0:  # odd near-dup of the even doc
            rows.append({"doc_id": 2 * i + 1, "text": " ".join(words) + " tail"})
        else:
            extra = rng.choice(vocab, size=25, replace=True).tolist()
            rows.append({"doc_id": 2 * i + 1, "text": " ".join(extra)})
    return rd.from_items(rows).repartition(4)


def _split(ds, fn):
    import pyarrow.compute as pc

    return ds.map_batches(
        lambda t: t.filter(fn(pc, t)), batch_format="pyarrow"
    )


def test_minhash_index_lifecycle(mh_corpus, tmp_path):
    """build(%4==0) + append(%4==2) probed with odds == the one-shot
    cross-parity snapshot pairs; appends are idempotent per token;
    same-fingerprint rebuilds short-circuit."""
    from search_engine_skillbox_ray.pipelines.dedup import near_dup_vs_snapshot
    from search_engine_skillbox_ray.pipelines.dedup_index import (
        append_minhash_index,
        build_minhash_index,
        query_minhash_index,
    )

    ev0 = _split(mh_corpus, lambda pc, t: pc.equal(pc.bit_wise_and(t.column("doc_id"), 3), 0))
    ev2 = _split(mh_corpus, lambda pc, t: pc.equal(pc.bit_wise_and(t.column("doc_id"), 3), 2))
    odd = _split(mh_corpus, lambda pc, t: pc.equal(pc.bit_wise_and(t.column("doc_id"), 1), 1))
    ev = _split(mh_corpus, lambda pc, t: pc.equal(pc.bit_wise_and(t.column("doc_id"), 1), 0))

    d = tmp_path / "mhidx"
    m = build_minhash_index(ev0, d, input_token="ev0")
    assert m["n_docs"] == ev0.count()
    # same fingerprint → no rebuild (manifest returned as-is)
    assert build_minhash_index(ev0, d, input_token="ev0") == m

    r = append_minhash_index(d, ev2, input_token="ev2")
    assert r["n_docs_appended"] == ev2.count()
    assert append_minhash_index(d, ev2, input_token="ev2") == r  # idempotent

    got = (
        query_minhash_index(d, odd, threshold=0.5)
        .to_pandas()
        .sort_values(["indexed_doc_id", "query_doc_id"])
        .reset_index(drop=True)
    )
    ref = (
        near_dup_vs_snapshot(odd, ev, threshold=0.5)
        .to_pandas()
        .rename(columns={"snapshot_doc_id": "indexed_doc_id",
                         "current_doc_id": "query_doc_id"})
        .sort_values(["indexed_doc_id", "query_doc_id"])
        .reset_index(drop=True)
    )
    assert len(got) > 0
    assert got.equals(ref[["indexed_doc_id", "query_doc_id", "est_jaccard"]])

    # the forced-distributed probe path yields the identical pair set
    from search_engine_skillbox_ray import config as _config

    orig_gate = _config.DRIVER_FASTPATH_ROWS
    try:
        _config.DRIVER_FASTPATH_ROWS = 0
        dist = (
            query_minhash_index(d, odd, threshold=0.5)
            .to_pandas()
            .sort_values(["indexed_doc_id", "query_doc_id"])
            .reset_index(drop=True)
        )
    finally:
        _config.DRIVER_FASTPATH_ROWS = orig_gate
    assert dist.equals(got)
    # every planted (2i, 2i+1) near-dup with i % 4 == 0 is found
    planted = {(2 * i, 2 * i + 1) for i in range(60) if i % 4 == 0}
    found = set(zip(got["indexed_doc_id"], got["query_doc_id"]))
    assert planted <= found


def test_minhash_index_probe_is_partition_pruned(mh_corpus, tmp_path):
    """A single-doc probe touches only the band partitions its own band
    hashes land in — never the whole layout."""
    from search_engine_skillbox_ray.pipelines.dedup_index import (
        _band_rows_from_sigs,
        _partition_files,
        _SignStage,
        build_minhash_index,
    )

    d = tmp_path / "mhidx_prune"
    m = build_minhash_index(mh_corpus, d, input_token="all")
    one = mh_corpus.limit(1).to_arrow_refs()
    import ray

    batch = ray.get(one[0])
    stage = _SignStage(int(m["num_perm"]), int(m["shingle_k"]), int(m["seed"]))
    bands = _band_rows_from_sigs(stage(batch), int(m["bands"]), int(m["n_band_parts"]))
    probe_parts = sorted(set(bands.column("part").to_pylist()))
    probed = _partition_files(d, "part", probe_parts)
    all_parts = list(d.glob("part=*.parquet"))
    assert len(probe_parts) <= int(m["bands"])
    assert 0 < len(probed) < len(all_parts)


def test_minhash_index_delete_and_compact(mh_corpus, tmp_path):
    """Tombstones drop pairs of deleted indexed docs at probe time; a
    delete→re-append keeps the re-added doc (seq ordering); compaction
    folds the LSM away with identical results."""
    from search_engine_skillbox_ray.pipelines.dedup_index import (
        append_minhash_index,
        build_minhash_index,
        compact_minhash_index,
        delete_from_minhash_index,
        query_minhash_index,
    )

    odd = _split(mh_corpus, lambda pc, t: pc.equal(pc.bit_wise_and(t.column("doc_id"), 1), 1))
    ev = _split(mh_corpus, lambda pc, t: pc.equal(pc.bit_wise_and(t.column("doc_id"), 1), 0))

    d = tmp_path / "mhidx_del"
    build_minhash_index(ev, d, input_token="ev")
    before = query_minhash_index(d, odd, threshold=0.5).to_pandas()
    assert len(before) > 0
    victims = sorted(set(before["indexed_doc_id"]))[:2]
    delete_from_minhash_index(d, victims, input_token="del2")
    after = query_minhash_index(d, odd, threshold=0.5).to_pandas()
    assert set(after["indexed_doc_id"]).isdisjoint(victims)
    exp = before[~before["indexed_doc_id"].isin(victims)].reset_index(drop=True)
    got = after.sort_values(["indexed_doc_id", "query_doc_id"]).reset_index(drop=True)
    assert got.equals(exp.sort_values(["indexed_doc_id", "query_doc_id"]).reset_index(drop=True))

    # delete → re-append: the re-added doc is live again
    readd = _split(
        mh_corpus,
        lambda pc, t, v=victims[0]: pc.equal(t.column("doc_id"), v),
    )
    append_minhash_index(d, readd, input_token="readd")
    re = query_minhash_index(d, odd, threshold=0.5).to_pandas()
    assert victims[0] in set(re["indexed_doc_id"])
    assert victims[1] not in set(re["indexed_doc_id"])

    # compaction: identical answers, LSM state gone
    compact_minhash_index(d)
    assert not list(d.glob("*=*.delta-*.parquet"))
    assert not list(d.glob("mh_tombstone-*.parquet"))
    post = query_minhash_index(d, odd, threshold=0.5).to_pandas()
    cols = ["indexed_doc_id", "query_doc_id"]
    assert post.sort_values(cols).reset_index(drop=True).equals(
        re.sort_values(cols).reset_index(drop=True)
    )


def test_minhash_index_rebuild_clears_tombstones(mh_corpus, tmp_path):
    """A rebuild (new fingerprint) must invalidate tombstones and delete
    markers too: stale seq>=1 tombstones would otherwise kill docs in the
    fresh seq -1 base, and a reused delete token would become a no-op."""
    from search_engine_skillbox_ray.pipelines.dedup_index import (
        build_minhash_index,
        delete_from_minhash_index,
        query_minhash_index,
    )

    odd = _split(mh_corpus, lambda pc, t: pc.equal(pc.bit_wise_and(t.column("doc_id"), 1), 1))
    ev = _split(mh_corpus, lambda pc, t: pc.equal(pc.bit_wise_and(t.column("doc_id"), 1), 0))

    d = tmp_path / "mhidx_rebuild"
    build_minhash_index(ev, d, input_token="v1")
    before = query_minhash_index(d, odd, threshold=0.5).to_pandas()
    victim = sorted(set(before["indexed_doc_id"]))[0]
    delete_from_minhash_index(d, [victim], input_token="delA")
    assert victim not in set(
        query_minhash_index(d, odd, threshold=0.5).to_pandas()["indexed_doc_id"]
    )

    # rebuild with a new fingerprint: the old delete must NOT survive
    build_minhash_index(ev, d, input_token="v2")
    assert not list(d.glob("mh_tombstone-*.parquet"))
    assert not list(d.glob("mh_delete.*.json"))
    fresh = query_minhash_index(d, odd, threshold=0.5).to_pandas()
    assert victim in set(fresh["indexed_doc_id"])

    # ... and reusing the same delete token is a real delete again
    delete_from_minhash_index(d, [victim], input_token="delA")
    again = query_minhash_index(d, odd, threshold=0.5).to_pandas()
    assert victim not in set(again["indexed_doc_id"])


def test_minhash_index_interrupted_compaction(mh_corpus, tmp_path):
    """Crash between the per-partition folds and the tombstone unlink:
    surviving tombstones must not re-apply to already-folded bases (the
    folded-through seq is stamped in the base parquet footer), so a doc
    re-appended after a delete stays live across the interruption and
    the re-run."""
    import shutil

    from search_engine_skillbox_ray.pipelines.dedup_index import (
        append_minhash_index,
        build_minhash_index,
        compact_minhash_index,
        delete_from_minhash_index,
        query_minhash_index,
    )

    odd = _split(mh_corpus, lambda pc, t: pc.equal(pc.bit_wise_and(t.column("doc_id"), 1), 1))
    ev = _split(mh_corpus, lambda pc, t: pc.equal(pc.bit_wise_and(t.column("doc_id"), 1), 0))

    d = tmp_path / "mhidx_crash"
    build_minhash_index(ev, d, input_token="ev")
    base = query_minhash_index(d, odd, threshold=0.5).to_pandas()
    victim = sorted(set(base["indexed_doc_id"]))[0]
    delete_from_minhash_index(d, [victim], input_token="del")
    readd = _split(mh_corpus, lambda pc, t, v=victim: pc.equal(t.column("doc_id"), v))
    append_minhash_index(d, readd, input_token="readd")
    live = query_minhash_index(d, odd, threshold=0.5).to_pandas()
    assert victim in set(live["indexed_doc_id"])

    # snapshot the tombstones, compact, then restore them — exactly the
    # on-disk state after a crash before the final unlink
    stash = tmp_path / "tombstash"
    stash.mkdir()
    saved = [shutil.copy2(f, stash / f.name) for f in d.glob("mh_tombstone-*.parquet")]
    assert saved
    compact_minhash_index(d)
    for f in stash.iterdir():
        shutil.copy2(f, d / f.name)

    cols = ["indexed_doc_id", "query_doc_id"]
    crashed = query_minhash_index(d, odd, threshold=0.5).to_pandas()
    assert victim in set(crashed["indexed_doc_id"])
    assert crashed.sort_values(cols).reset_index(drop=True).equals(
        live.sort_values(cols).reset_index(drop=True)
    )

    # the re-run spends the survivors and changes nothing
    compact_minhash_index(d)
    assert not list(d.glob("mh_tombstone-*.parquet"))
    rerun = query_minhash_index(d, odd, threshold=0.5).to_pandas()
    assert rerun.sort_values(cols).reset_index(drop=True).equals(
        live.sort_values(cols).reset_index(drop=True)
    )
