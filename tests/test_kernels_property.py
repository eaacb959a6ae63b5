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


@st.composite
def _docs_strategy(draw):
    vocab = ["a", "b", "c", "ab", "ba", "cc"]
    n_docs = draw(st.integers(1, 5))
    return [
        " ".join(
            draw(st.lists(st.sampled_from(vocab), min_size=0, max_size=12))
        )
        for _ in range(n_docs)
    ]


@settings(max_examples=40, deadline=None)
@given(_docs_strategy())
def test_textrank_fixed_point_property(texts):
    """Vectorized batch TextRank kernel == a per-doc pure-Python
    reference of the same integer recurrence (random tiny corpora,
    including empty docs, single-token docs and repeated tokens)."""
    import pyarrow as pa

    from search_engine_skillbox_ray.functions.tokenize import tokenize

    SCALE, ITERS, TOPK = 1_000_000, 8, 5
    BASE = (15 * SCALE) // 100

    # ---- reference: per-doc dict/loop implementation ----
    want: list[tuple[int, str, int]] = []
    for doc_id, text in enumerate(texts):
        toks = tokenize(text)
        if not toks:
            continue
        nodes = sorted(set(toks))
        w: dict[tuple[str, str], int] = {}
        for x, y in zip(toks, toks[1:]):
            if x != y:
                k = (min(x, y), max(x, y))
                w[k] = w.get(k, 0) + 1
        out_w: dict[str, int] = {}
        for (x, y), c in w.items():
            out_w[x] = out_w.get(x, 0) + c
            out_w[y] = out_w.get(y, 0) + c
        s = {t: SCALE for t in nodes}
        for _ in range(ITERS):
            s2 = {}
            for v in nodes:
                acc = 0
                for (x, y), c in w.items():
                    if y == v:
                        acc += (c * s[x]) // out_w[x]
                    if x == v:
                        acc += (c * s[y]) // out_w[y]
                s2[v] = BASE + (85 * acc) // 100
            s = s2
        ranked = sorted(nodes, key=lambda t: (-s[t], t))[:TOPK]
        want += [(doc_id, t, s[t]) for t in ranked]

    # ---- kernel under test, run directly on one Arrow batch ----
    from search_engine_skillbox_ray.pipelines.textstats import textrank_batch

    tbl = pa.table(
        {"doc_id": list(range(len(texts))), "text": pa.array(texts, pa.string())}
    )
    got_tbl = textrank_batch(tbl, n_iters=ITERS, topk=TOPK)
    got = sorted(
        zip(
            got_tbl["doc_id"].to_pylist(),
            got_tbl["term"].to_pylist(),
            got_tbl["score"].to_pylist(),
        )
    )
    assert got == sorted(want)
