"""Tokenize-and-explode stage (M2+M3) and deterministic docID assignment.

``TokenizeExplode`` is the ST1 actor-pool slot
(/root/reference/src/main/java/searchengine/service/MorphologyServiceImpl.java:9-20):
today's "lemmatizer" is a compiled RE2 split executed by Arrow kernels,
but the stage is a callable CLASS for ``map_batches(..., concurrency=N)``
so a real morphology model would load once per actor in ``__init__``.

Per batch (zero-copy Arrow in/out):
  ``utf8_lower`` → ``split_pattern_regex('[^\\p{L}]+')`` → explode with
  parent row ids → drop empty tokens → Arrow ``group_by`` count per
  (site_id, doc_id, term) → rows ``(site_id, doc_id, term, tf)``.
This replaces PageIndexingUtils.java:119-126 (countLemmaFrequency) and the
per-row ``search_index`` inserts at :128-159 with one vectorized pass.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.tokenize import RE2_NON_LETTER_SPLIT

EXPLODED_SCHEMA = pa.schema(
    [
        ("site_id", pa.int32()),
        ("doc_id", pa.int64()),
        ("term", pa.string()),
        ("tf", pa.int32()),
    ]
)


def assign_doc_ids(urls: pa.Array | pa.ChunkedArray | list[str]) -> np.ndarray:
    """Deterministic 63-bit HASH docID from the normalized url (SURVEY
    §7.1.4) — the any-scale fallback scheme. The build prefers DENSE ids
    (``dense_doc_id_map``) whenever the url set fits the driver: hash
    ids spread docs over 2^63, making posting delta gaps ~6-7 varbyte
    bytes; dense ids cut that to 1-2 (measured 10× smaller segments).

    ``pandas.util.hash_array`` (SipHash-ish with a fixed key) is stable
    across processes, machines and cluster sizes — required for merge
    determinism and rank parity. 63 bits keeps docIDs non-negative
    int64. NOTE at a true 10^12-doc deployment collisions become likely
    (~5e4 expected); the build exposes ``validate_doc_ids`` and the
    scale path is the 128-bit (hi, lo) docID implemented in
    ``stages/codec.py`` ("128-bit ids": ``assign_doc_ids_128`` +
    128-bit gap codec + ``SEGMENT_SCHEMA_128``) — collision odds
    ~1e-15 at 10^12 docs; the engine adopts it by switching cursor
    comparisons to (hi, lo) pairs.
    """
    if isinstance(urls, (pa.Array, pa.ChunkedArray)):
        urls = urls.to_pylist()
    h = pd.util.hash_array(np.asarray(urls, dtype=object), categorize=False)
    return (h & np.uint64(0x7FFF_FFFF_FFFF_FFFF)).astype(np.int64)


def dense_doc_id_map(norm_urls) -> dict[str, int]:
    """Deterministic DENSE docIDs: sorted distinct normalized urls →
    0..N-1. Dense ids make posting-list delta gaps ~log2(N/df) bits
    instead of ~(63 - log2 df) for hash ids — ~3 fewer varbyte bytes
    per posting and proportionally faster decode. Parallelism- and
    run-independent (pure function of the url set)."""
    uniq = sorted(set(norm_urls))
    return {u: i for i, u in enumerate(uniq)}


def token_lists(texts: pa.ChunkedArray | pa.Array) -> pa.Array:
    """lower + RE2 non-letter split → list<string> (may contain '')."""
    lowered = pc.utf8_lower(texts)
    return pc.split_pattern_regex(lowered, pattern=RE2_NON_LETTER_SPLIT)


def token_counts(texts: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Per-row token count (doc_len) with the same split semantics."""
    lists = token_lists(texts)
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    flat = lists.flatten()
    nonempty = pc.cast(pc.not_equal(flat, ""), pa.int64())
    lengths = lists.value_lengths().to_numpy(zero_copy_only=False)
    # prefix-sum the nonempty indicator, then diff at list boundaries
    csum = np.concatenate(([0], np.cumsum(nonempty.to_numpy(zero_copy_only=False))))
    ends = np.cumsum(lengths)
    starts = ends - lengths
    return (csum[ends] - csum[starts]).astype(np.int64)


class TokenizeExplode:
    """Actor-pool stage: docs batches → exploded (site_id, doc_id, term, tf).

    When ``n_buckets`` is given the stage also assigns the shuffle keys
    (bucket, salt) — fused here so one actor pool serves both duties and
    a 4-CPU session can't deadlock on pool reservations. ``heavy_ref``
    is ``[ray.put(dict)]`` (wrapped in a list so Ray does not inline the
    ref): term → number of salts for Zipf-head terms; fetched once per
    actor from the local object store."""

    def __init__(
        self,
        text_col: str = "text",
        doc_id_col: str = "doc_id",
        site_col: str = "site_id",
        n_buckets: int | None = None,
        heavy_ref=None,
        emit_partials: bool = False,
        lemma_model: str | None = None,
    ) -> None:
        self.text_col = text_col
        self.doc_id_col = doc_id_col
        self.site_col = site_col
        self.n_buckets = n_buckets
        # ST1 morphology slot: when a model path is given, each actor
        # loads the lemma model ONCE here (functions/lemmatize.py) and
        # every batch's tokens are mapped surface form → lemma before
        # counting, so tf/df/cf aggregate over LEMMAS (two forms sharing
        # a lemma merge their postings).
        self.lemmatizer = None
        if lemma_model is not None:
            from ..functions.lemmatize import DictLemmatizer

            self.lemmatizer = DictLemmatizer(lemma_model)
        # emit_partials: combine inside the map stage — encode one partial
        # posting list per (term, site) per batch, so the shuffle moves
        # compressed segments (~2-4 B/posting) instead of exploded rows
        # (~30 B/posting incl. the repeated term string). THE combiner
        # pattern for the wide step (ray_guide "Aggregation at scale").
        self.emit_partials = emit_partials
        self.heavy: dict[str, int] = {}
        if heavy_ref:
            import ray

            ref = heavy_ref[0] if isinstance(heavy_ref, (list, tuple)) else heavy_ref
            self.heavy = ray.get(ref) if not isinstance(ref, dict) else ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        lists = token_lists(batch.column(self.text_col))
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        flat = lists.flatten()
        lengths = lists.value_lengths().to_numpy(zero_copy_only=False).astype(np.int64)
        parents = np.repeat(np.arange(len(batch), dtype=np.int64), lengths)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        terms = flat.filter(pa.array(keep))
        parents = parents[keep]
        if self.lemmatizer is not None:
            terms = self.lemmatizer.lemmatize(terms)

        doc_ids = batch.column(self.doc_id_col).to_numpy(zero_copy_only=False)[parents]
        if self.site_col in batch.column_names:
            site_ids = batch.column(self.site_col).to_numpy(zero_copy_only=False)[parents]
        else:
            site_ids = np.zeros(len(parents), dtype=np.int32)

        pairs = pa.table(
            {
                "site_id": pa.array(site_ids, type=pa.int32()),
                "doc_id": pa.array(doc_ids, type=pa.int64()),
                "term": terms,
            }
        )
        counted = pairs.group_by(["site_id", "doc_id", "term"]).aggregate([([], "count_all")])
        out = pa.table(
            {
                "site_id": counted["site_id"],
                "doc_id": counted["doc_id"],
                "term": counted["term"],
                "tf": pc.cast(counted["count_all"], pa.int32()),
            }
        )
        if self.n_buckets is not None:
            if self.emit_partials:
                return _encode_batch_partials(out, self.n_buckets, self.heavy)
            out = _add_partition_keys(out, self.n_buckets, self.heavy)
        return out


def term_bucket(terms: pa.Array | pa.ChunkedArray | list[str], n_buckets: int) -> np.ndarray:
    """Stable hash bucket per term — the ONE partitioning key reused by
    the posting shuffle, the segment layout and query-time lookup."""
    if isinstance(terms, (pa.Array, pa.ChunkedArray)):
        terms = terms.to_pylist()
    h = pd.util.hash_array(np.asarray(terms, dtype=object), categorize=False)
    return (h % np.uint64(n_buckets)).astype(np.int32)


def _encode_batch_partials(counted: pa.Table, n_buckets: int, heavy: dict[str, int]) -> pa.Table:
    """Per-batch combiner: (site_id, doc_id, term, tf) rows → one encoded
    partial-segment row per (term, site_id) run (SEGMENT_SCHEMA).

    salt: 0 for ordinary terms; for Zipf-head terms (``heavy``) the
    PARTIAL gets ``first_doc % S`` so a later two-level merge can spread
    a head term's partials over S reduce tasks before the final
    per-bucket concat (the skew story survives the combiner)."""
    from .postings import SEGMENT_SCHEMA, _rows_to_table
    from .codec import BLOCK_SIZE, encode_posting_lists_bulk

    if not len(counted):
        return _rows_to_table({n: [] for n in SEGMENT_SCHEMA.names})
    # group rows into (term, site) runs without a string sort: Arrow
    # dictionary-encode gives integer term codes (C++), then one numpy
    # lexsort — run ORDER within the batch is irrelevant (the bucket
    # merge re-sorts terms), only contiguity matters
    term_col = counted.column("term")
    if isinstance(term_col, pa.ChunkedArray):
        term_col = term_col.combine_chunks()
    dict_arr = term_col.dictionary_encode()
    codes = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    dictionary = np.asarray(dict_arr.dictionary.to_pylist(), dtype=object)
    site_all = counted.column("site_id").to_numpy(zero_copy_only=False)
    doc_all = counted.column("doc_id").to_numpy(zero_copy_only=False)
    tf_all = counted.column("tf").to_numpy(zero_copy_only=False)
    order = np.lexsort((doc_all, site_all, codes))
    codes = codes[order]
    site_ids = site_all[order].astype(np.int32)
    doc_ids = doc_all[order].astype(np.int64)
    tfs = tf_all[order].astype(np.int64)
    n = codes.size
    new_run = np.ones(n, dtype=bool)
    new_run[1:] = (codes[1:] != codes[:-1]) | (site_ids[1:] != site_ids[:-1])
    run_starts = np.flatnonzero(new_run)
    lengths = np.diff(np.append(run_starts, n))
    terms = dictionary[codes]

    payloads = encode_posting_lists_bulk(doc_ids, tfs, lengths, block_size=BLOCK_SIZE)
    run_terms = terms[run_starts]
    bucket = term_bucket(run_terms.tolist(), n_buckets)
    salt = np.zeros(len(run_starts), dtype=np.int32)
    if heavy:
        n_salts = np.fromiter((heavy.get(t, 1) for t in run_terms), dtype=np.int64, count=len(run_terms))
        hv = n_salts > 1
        if hv.any():
            salt[hv] = (doc_ids[run_starts[hv]] % n_salts[hv]).astype(np.int32)
    rows: dict[str, list] = {
        "bucket": bucket.tolist(),
        "site_id": site_ids[run_starts].tolist(),
        "term": run_terms.tolist(),
        "salt": salt.tolist(),
    }
    for k in ("df", "cf", "doc_gaps", "tf_bytes"):
        rows[k] = [p[k] for p in payloads]
    # block-max metadata is RECOMPUTED by the bucket merge — shipping it
    # with every partial only fattens the shuffle; emit empty lists
    empty: list = [[]] * len(payloads)
    for k in ("block_last_doc", "block_max_tf", "block_gap_offset", "block_tf_offset"):
        rows[k] = empty
    return _rows_to_table(rows)


def _add_partition_keys(batch: pa.Table, n_buckets: int, heavy: dict[str, int]) -> pa.Table:
    """Add (bucket, salt) shuffle keys to exploded rows.

    ``heavy`` maps term → number of salts S (>1 only for Zipf-head
    terms). salt = doc_id % S keeps each docID in exactly one salted
    partition, which is what makes the partial-segment merge a plain
    concat (SURVEY §7.3).
    """
    terms = batch.column("term").to_pylist()
    bucket = term_bucket(terms, n_buckets)
    salt = np.zeros(len(terms), dtype=np.int32)
    if heavy:
        n_salts = np.fromiter((heavy.get(t, 1) for t in terms), dtype=np.int64, count=len(terms))
        salted = n_salts > 1
        if salted.any():
            doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
            salt[salted] = (doc_ids[salted] % n_salts[salted]).astype(np.int32)
    out = batch.append_column("bucket", pa.array(bucket, type=pa.int32()))
    return out.append_column("salt", pa.array(salt, type=pa.int32()))
