"""Block-max WAND / MaxScore top-k pruning over compressed segments.

The reference scores every page matching any query lemma and sorts
(/root/reference/src/main/java/searchengine/service/SearchServiceImpl.java:
139-160 + :51). For web-scale posting lists that is O(Σ df); the
north-star asks for block-max WAND pruning instead: skip whole 128-doc
blocks whose score upper bound (Σ block_max_tf·idf over live terms)
cannot reach the current top-k threshold.

Two entry points over already-loaded posting payloads
(:mod:`..stages.codec` rows):

* ``topk_disjunctive_maxscore`` — OR semantics (the reference default):
  terms are split into essential / non-essential by cumulative max
  contribution vs the threshold (MaxScore); candidates come only from
  essential lists, non-essential lists contribute via docID probes, and
  whole blocks of the probe lists are skipped with the block-max bound.
* ``topk_conjunctive_bmw`` — AND semantics: classic block-max WAND
  pivoting on the sorted docID frontier.

Both return EXACTLY the same (docID, score) top-k set as exhaustive
scoring with the same scorer — pruning only skips work that provably
cannot enter the top-k (ties broken (score desc, docID asc) like the
engine). Tested for equivalence against the exact path.

Scorer model: per-term weight(tf) must be monotone in tf with upper
bound weight(block_max_tf) — true for TF-IDF (tf·idf) and BM25.
"""

from __future__ import annotations

import heapq
from typing import Callable

import numpy as np

from .codec import decode_block

# cumulative count of block decodes (profiling/pruning tests; the
# counter is process-local and never read in the hot path)
BLOCKS_DECODED = 0


class _TermCursor:
    __slots__ = ("row", "idf", "n_blocks", "block", "docs", "tfs", "pos",
                 "block_bounds", "max_weight")

    def __init__(self, row: dict, idf: float, bound_fn: Callable[..., np.ndarray]):
        self.row = row
        self.idf = idf
        self.n_blocks = len(row["block_last_doc"])
        self.block = -1
        self.docs = np.empty(0, np.int64)
        self.tfs = np.empty(0, np.int64)
        self.pos = 0
        if self.n_blocks:
            # ONE vectorized bound pass per list, cached: the bound may
            # use per-block docID ranges (BM25's min-doc_len bound)
            self.block_bounds = bound_fn(
                np.asarray(row["block_max_tf"], dtype=np.int64), idf,
                np.asarray(row["block_last_doc"], dtype=np.int64),
            ).astype(np.float64)
            self.max_weight = float(self.block_bounds.max())
        else:
            self.block_bounds = np.empty(0, np.float64)
            self.max_weight = 0.0

    def _load_block(self, b: int) -> None:
        global BLOCKS_DECODED
        BLOCKS_DECODED += 1
        self.docs, self.tfs = decode_block(self.row, b)
        self.block = b
        self.pos = 0

    def block_of_doc(self, doc: int) -> int:
        """First block whose last_doc >= doc; n_blocks when exhausted."""
        lasts = self.row["block_last_doc"]
        lo, hi = max(self.block, 0), self.n_blocks
        while lo < hi:
            mid = (lo + hi) // 2
            if lasts[mid] < doc:
                lo = mid + 1
            else:
                hi = mid
        return lo

    def block_max_weight(self, b: int) -> float:
        return float(self.block_bounds[b])

    def seek(self, doc: int) -> tuple[int, int] | None:
        """Advance to first posting with docID >= doc → (docID, tf)."""
        b = self.block_of_doc(doc)
        if b >= self.n_blocks:
            return None
        if b != self.block:
            self._load_block(b)
            self.pos = 0
        i = int(np.searchsorted(self.docs, doc, side="left"))
        if i >= self.docs.size:  # doc > all in block (can't happen: last>=doc)
            return None
        self.pos = i
        return int(self.docs[i]), int(self.tfs[i])


def _topk_push(heap: list, k: int, score: float, doc: int) -> None:
    # min-heap of (score, -doc): tie-break (score desc, doc asc) means a
    # candidate replaces an equal-score entry with LARGER doc id
    item = (score, -doc)
    if len(heap) < k:
        heapq.heappush(heap, item)
    elif item > heap[0]:
        heapq.heapreplace(heap, item)


def _heap_threshold(heap: list, k: int) -> float:
    return heap[0][0] if len(heap) >= k else -np.inf


def _finalize(heap: list) -> tuple[np.ndarray, np.ndarray]:
    items = sorted(heap, key=lambda x: (-x[0], -x[1]))  # score desc, doc asc
    docs = np.array([-d for _, d in items], dtype=np.int64)
    scores = np.array([s for s, _ in items], dtype=np.float64)
    return docs, scores


def topk_conjunctive_bmw(
    term_rows: list[tuple[dict, float]],
    k: int,
    weight_fn: Callable[..., np.ndarray],
    bound_fn: Callable[[np.ndarray, float], np.ndarray] | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """AND-mode block-max WAND. ``term_rows`` = [(payload_row, idf)].

    ``weight_fn(tfs, idf, doc_ids)`` is the exact per-posting score;
    ``bound_fn(tfs, idf, block_lasts)`` a per-block upper bound
    (defaults to weight_fn without docs — correct for TF-IDF; BM25
    passes its min-doc_len-per-block bound)."""
    bound_fn = bound_fn or (lambda tfs, idf, block_lasts=None: weight_fn(tfs, idf, None))
    if not term_rows or any(r["df"] == 0 for r, _ in term_rows):
        return np.empty(0, np.int64), np.empty(0, np.float64)
    cursors = [_TermCursor(r, idf, bound_fn) for r, idf in term_rows]
    heap: list = []
    doc = 0
    while True:
        # decode-free pre-check: bound the frontier from block METADATA
        # (block_of_doc is a binary search over block_last — no decode).
        # When Σ block bounds at `doc` can't reach the threshold, no doc
        # up to the shallowest block boundary can either — jump past it
        # without decoding a single block.
        threshold = _heap_threshold(heap, k)
        if threshold > -np.inf:
            ub0 = 0.0
            min_last = None
            for c in cursors:
                b = c.block_of_doc(doc)
                if b >= c.n_blocks:
                    return _finalize(heap)
                ub0 += c.block_bounds[b]
                bl = int(c.row["block_last_doc"][b])
                if min_last is None or bl < min_last:
                    min_last = bl
            if ub0 < threshold:
                doc = min_last + 1
                continue
        # conjunctive frontier: align all cursors on the same doc
        aligned = True
        max_doc = doc
        states = []
        for c in cursors:
            s = c.seek(max_doc)
            if s is None:
                return _finalize(heap)
            states.append(s)
            if s[0] > max_doc:
                max_doc = s[0]
        for c, s in zip(cursors, states):
            if s[0] != max_doc:
                aligned = False
        if not aligned:
            doc = max_doc
            continue
        # block-max upper bound check before full scoring
        ub = 0.0
        for c in cursors:
            b = c.block_of_doc(max_doc)
            ub += c.block_max_weight(b)
        if ub >= _heap_threshold(heap, k):
            score = 0.0
            for c in cursors:
                s = c.seek(max_doc)
                score += float(
                    weight_fn(np.asarray([s[1]], np.int64), c.idf,
                              np.asarray([max_doc], np.int64))[0]
                )
            _topk_push(heap, k, score, max_doc)
        doc = max_doc + 1


def topk_disjunctive_maxscore(
    term_rows: list[tuple[dict, float]],
    k: int,
    weight_fn: Callable[..., np.ndarray],
    bound_fn: Callable[[np.ndarray, float], np.ndarray] | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """OR-mode MaxScore with block-max probes.

    Terms sorted by max_weight; the largest lists whose cumulative
    max_weight can't alone reach the threshold become non-essential —
    they are only PROBED at candidate docIDs (block-skipped), never
    iterated. Exact same top-k as exhaustive OR scoring."""
    bound_fn = bound_fn or (lambda tfs, idf, block_lasts=None: weight_fn(tfs, idf, None))
    rows = [(r, idf) for r, idf in term_rows if r["df"] > 0]
    if not rows:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    cursors = sorted(
        (_TermCursor(r, idf, bound_fn) for r, idf in rows), key=lambda c: c.max_weight
    )
    # prefix sums of max weights (ascending order)
    prefix = np.cumsum([c.max_weight for c in cursors])
    heap: list = []

    n = len(cursors)
    first_essential = 0  # cursors[first_essential:] are essential
    positions: list[tuple[int, int] | None] = [c.seek(0) for c in cursors]

    while True:
        threshold = _heap_threshold(heap, k)
        # update essential split: non-essential prefix has Σ max_weight <= threshold
        fe = 0
        while fe < n - 1 and prefix[fe] < threshold:
            fe += 1
        first_essential = fe
        # candidate = min current doc among essential cursors
        cand = None
        for ci in range(first_essential, n):
            p = positions[ci]
            if p is not None and (cand is None or p[0] < cand):
                cand = p[0]
        if cand is None:
            return _finalize(heap)
        # score candidate: essential terms at cand + probe non-essential,
        # aborting early when the remaining upper bound can't reach
        score = 0.0
        cand_arr = np.asarray([cand], np.int64)
        for ci in range(first_essential, n):
            p = positions[ci]
            if p is not None and p[0] == cand:
                score += float(weight_fn(np.asarray([p[1]], np.int64), cursors[ci].idf, cand_arr)[0])
        for ci in range(first_essential - 1, -1, -1):
            # abort with the remaining upper bound — this term's share is
            # its BLOCK bound at cand (a binary search over block_last,
            # no decode), not the whole-list max: tighter, so probes die
            # before the block-decoding seek
            c = cursors[ci]
            prev = float(prefix[ci - 1]) if ci > 0 else 0.0
            blk = c.block_of_doc(cand)
            contrib = float(c.block_bounds[blk]) if blk < c.n_blocks else 0.0
            if score + prev + contrib < threshold:
                score = None  # cannot make it
                break
            p = c.seek(cand)
            if p is not None and p[0] == cand:
                score += float(weight_fn(np.asarray([p[1]], np.int64), c.idf, cand_arr)[0])
        if score is not None:
            _topk_push(heap, k, score, cand)
        # advance essential cursors sitting on cand
        for ci in range(first_essential, n):
            p = positions[ci]
            if p is not None and p[0] == cand:
                positions[ci] = cursors[ci].seek(cand + 1)
