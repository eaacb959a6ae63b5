"""CDC merge semantics: last-writer-wins per key, upsert-on-missing,
delete, delete→re-insert ordering, untouched passthrough — plus the
multi-version-per-batch pre-reduce."""

import numpy as np
import pandas as pd
import pyarrow as pa

SF = "/root/testdata/sf0.001"


def _merged(snapshot_df, changes_df, **kw):
    import ray.data as rd

    from search_engine_skillbox_ray.pipelines.cdc import cdc_apply

    out = cdc_apply(
        rd.from_pandas(snapshot_df), rd.from_pandas(changes_df), **kw
    ).to_pandas()
    if "doc_id" not in out.columns:  # fully-empty merge → schemaless blocks
        return pd.DataFrame({"doc_id": [], "text": []})
    return out.sort_values("doc_id").reset_index(drop=True)


def test_cdc_planted_scenarios(ray_session):
    snap = pd.DataFrame(
        {
            "doc_id": np.array([1, 2, 3, 4], np.int64),
            "text": ["a", "b", "c", "d"],
        }
    )
    chg = pd.DataFrame(
        {
            "doc_id": np.array([2, 3, 3, 5, 4, 4], np.int64),
            "text": ["B", None, "C2", "E", None, "D4"],
            "seq": np.array([1, 2, 3, 4, 5, 6], np.int64),
            "op": np.array([0, 1, 0, 0, 1, 0], np.int64),
        }
    )
    out = _merged(snap, chg, n_buckets=8)
    # 1 untouched; 2 updated; 3 deleted then re-inserted (seq 3 > 2);
    # 5 inserted; 4 deleted then re-upserted at seq 6
    assert out.doc_id.tolist() == [1, 2, 3, 4, 5]
    assert out.text.tolist() == ["a", "B", "C2", "D4", "E"]


def test_cdc_delete_wins_when_latest(ray_session):
    snap = pd.DataFrame({"doc_id": np.array([7], np.int64), "text": ["x"]})
    chg = pd.DataFrame(
        {
            "doc_id": np.array([7, 7], np.int64),
            "text": ["y", None],
            "seq": np.array([1, 2], np.int64),
            "op": np.array([0, 1], np.int64),
        }
    )
    out = _merged(snap, chg, n_buckets=4)
    assert len(out) == 0


def test_cdc_matches_pandas_reference(ray_session):
    """Random-ish (but deterministic) stream vs a plain pandas replay."""
    rng = np.random.RandomState(11)
    keys = np.arange(200, dtype=np.int64)
    snap = pd.DataFrame({"doc_id": keys, "text": [f"s{k}" for k in keys]})
    n = 600
    ck = rng.randint(0, 260, n).astype(np.int64)  # some keys miss snapshot
    ops = (rng.rand(n) < 0.25).astype(np.int64)
    chg = pd.DataFrame(
        {
            "doc_id": ck,
            "text": [f"v{i}" for i in range(n)],
            "seq": np.arange(1, n + 1, dtype=np.int64),
            "op": ops,
        }
    )
    out = _merged(snap, chg, n_buckets=16)

    state = {int(k): f"s{k}" for k in keys}
    for i in range(n):
        k = int(ck[i])
        if ops[i] == 1:
            state.pop(k, None)
        else:
            state[k] = f"v{i}"
    exp = pd.DataFrame(
        sorted(state.items()), columns=["doc_id", "text"]
    ).astype({"doc_id": np.int64})
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)


def test_cdc_document_changes_fixture_invariants(ray_session):
    """The driver fixture: every %5==0 doc is deleted unless re-inserted
    by %10==0 (which sets lang='re'); %4==1 docs get the +1000 bump
    unless a later op touched them."""
    import ray.data as rd

    from search_engine_skillbox_ray.pipelines.cdc import (
        cdc_apply,
        derive_document_changes,
    )

    docs = rd.read_parquet(f"{SF}/documents.parquet")
    snap, chg = derive_document_changes(docs)
    out = cdc_apply(snap, chg, key="doc_id").to_pandas()
    src = pd.read_parquet(f"{SF}/documents.parquet")
    ids = set(out.doc_id)

    for d in src.doc_id:
        d = int(d)
        if d % 10 == 0:
            assert d in ids
            assert out.set_index("doc_id").loc[d, "lang"] == "re"
        elif d % 5 == 0:
            assert d not in ids
        else:
            assert d in ids
    bumped = out.set_index("doc_id")
    base = src.set_index("doc_id")
    for d in src.doc_id:
        d = int(d)
        if d % 4 == 1 and d % 5 != 0 and d % 3 != 2:
            assert bumped.loc[d, "n_chars"] == base.loc[d, "n_chars"] + 1000
