"""Posting codec round-trip + block-max consistency + merge determinism
(SURVEY §5.3-§5.4), property-based via hypothesis."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_skillbox_ray.stages.codec import (
    decode_block,
    decode_posting_list,
    encode_posting_list,
    merge_posting_payloads,
    varbyte_decode,
    varbyte_encode,
)

doc_sets = st.lists(
    st.integers(min_value=0, max_value=2**40), min_size=1, max_size=2000, unique=True
)


@given(doc_sets)
@settings(max_examples=60, deadline=None)
def test_varbyte_roundtrip(vals):
    arr = np.array(sorted(vals), dtype=np.int64)
    enc = varbyte_encode(arr)
    dec = varbyte_decode(enc, count=len(arr))
    assert np.array_equal(dec.astype(np.int64), arr)


def test_varbyte_large_values():
    arr = np.array([0, 1, 2**62, 2**63 - 1], dtype=np.uint64)
    assert np.array_equal(varbyte_decode(varbyte_encode(arr), count=4), arr)


@given(doc_sets, st.integers(min_value=1, max_value=10))
@settings(max_examples=40, deadline=None)
def test_posting_roundtrip_and_blocks(vals, seed):
    rng = np.random.default_rng(seed)
    docs = np.array(vals, dtype=np.int64)
    tfs = rng.integers(1, 10_000, size=len(docs))
    row = encode_posting_list(docs, tfs)
    d, t = decode_posting_list(row)
    order = np.argsort(docs, kind="stable")
    assert np.array_equal(d, docs[order])
    assert np.array_equal(t, tfs[order])
    assert row["df"] == len(docs)
    assert row["cf"] == int(tfs.sum())
    # block-max metadata consistent with full decode
    sorted_docs, sorted_tfs = docs[order], tfs[order]
    for b in range(len(row["block_last_doc"])):
        s, e = b * 128, min(len(docs), (b + 1) * 128)
        assert row["block_last_doc"][b] == sorted_docs[e - 1]
        assert row["block_max_tf"][b] == sorted_tfs[s:e].max()
        db, tb = decode_block(row, b)
        assert np.array_equal(db, sorted_docs[s:e])
        assert np.array_equal(tb, sorted_tfs[s:e])


@given(doc_sets, st.integers(min_value=2, max_value=7), st.integers(min_value=0, max_value=99))
@settings(max_examples=40, deadline=None)
def test_merge_determinism_any_partition_order(vals, n_salts, seed):
    """Same docs split by any salt scheme, merged in any order → identical
    segment bytes (SURVEY §5.4)."""
    rng = np.random.default_rng(seed)
    docs = np.array(vals, dtype=np.int64)
    tfs = rng.integers(1, 1000, size=len(docs))
    reference = encode_posting_list(docs, tfs)

    salts = rng.integers(0, n_salts, size=len(docs))
    parts = [
        encode_posting_list(docs[salts == s], tfs[salts == s])
        for s in range(n_salts)
        if (salts == s).any()
    ]
    rng.shuffle(parts)
    merged = merge_posting_payloads(parts)
    for key in ("df", "cf", "doc_gaps", "tf_bytes", "block_last_doc", "block_max_tf"):
        assert merged[key] == reference[key], key


def test_duplicate_docid_rejected():
    import pytest

    with pytest.raises(ValueError):
        encode_posting_list(np.array([1, 1]), np.array([1, 2]))
