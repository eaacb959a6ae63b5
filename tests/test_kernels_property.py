"""Property tests for the session-5 pure-numpy kernels: batch
Levenshtein vs the textbook DP, and the vectorized ordered-adjacency
kernel vs a per-doc reference loop — random inputs via hypothesis."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


def _lev_ref(a: str, b: str) -> int:
    D = list(range(len(b) + 1))
    for i in range(1, len(a) + 1):
        prev, D[0] = D[0], i
        for j in range(1, len(b) + 1):
            cur = D[j]
            D[j] = min(D[j] + 1, D[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return D[len(b)]


words = st.text(
    alphabet=st.sampled_from("abcдёж💡"), min_size=0, max_size=12
)


@settings(max_examples=60, deadline=None)
@given(st.lists(words, min_size=1, max_size=20), words)
def test_levenshtein_batch_property(terms, q):
    from search_engine_skillbox_ray.pipelines.textstats import _levenshtein_batch

    arr = np.asarray(terms, dtype="U")
    lens = np.array([len(t) for t in terms], np.int64)
    got = _levenshtein_batch(arr, lens, q).tolist()
    assert got == [_lev_ref(q, t) for t in terms]


posting = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=40),  # doc id
        st.lists(st.integers(min_value=0, max_value=60), min_size=1, max_size=8),
    ),
    min_size=0,
    max_size=15,
)


def _to_post(rows):
    by_doc: dict[int, set] = {}
    for d, ps in rows:
        by_doc.setdefault(d, set()).update(ps)
    docs = np.array(sorted(by_doc), np.int64)
    cnts = np.array([len(by_doc[d]) for d in docs.tolist()], np.int64)
    flat = (
        np.concatenate([np.sort(np.fromiter(by_doc[d], np.int64)) for d in docs.tolist()])
        if len(docs)
        else np.empty(0, np.int64)
    )
    return docs, cnts, flat


@settings(max_examples=60, deadline=None)
@given(posting, posting)
def test_ordered_adjacency_property(rows_a, rows_b):
    from search_engine_skillbox_ray.pipelines.posindex import _ordered_adjacency

    pa_ = _to_post(rows_a)
    pb_ = _to_post(rows_b)
    if not pa_[0].size or not pb_[0].size:
        got_d, got_c = _ordered_adjacency(pa_, pb_) if pa_[0].size and pb_[0].size else (
            np.empty(0, np.int64), np.empty(0, np.int64))
        assert got_d.size == 0
        return
    got_d, got_c = _ordered_adjacency(pa_, pb_)
    # reference: per-doc set membership
    da, ca, fa = pa_
    db, cb, fb = pb_
    offs_a = np.cumsum(ca) - ca
    offs_b = np.cumsum(cb) - cb
    exp = {}
    for d in np.intersect1d(da, db).tolist():
        ia = int(np.searchsorted(da, d)); ib = int(np.searchsorted(db, d))
        sa = fa[offs_a[ia]: offs_a[ia] + ca[ia]]
        sb = set(fb[offs_b[ib]: offs_b[ib] + cb[ib]].tolist())
        n = sum(1 for p in sa.tolist() if p + 1 in sb)
        if n:
            exp[d] = n
    assert dict(zip(got_d.tolist(), got_c.tolist())) == exp
