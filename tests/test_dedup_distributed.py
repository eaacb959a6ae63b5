"""Distributed (cluster-scale) near-dup verify paths.

Above ``DRIVER_FASTPATH_ROWS`` the MinHash-LSH and n-gram Jaccard
pipelines must NOT collect corpus-sized side tables on the driver:
signatures / gram sets stay Datasets and candidates hash-join against
them (``Dataset.join``). SimHash's local-vs-exchange probe must decide
from block metadata. All three distributed paths are forced here with
a zeroed threshold and must produce the IDENTICAL result set as the
driver fast path.
"""

import numpy as np
import pytest
import ray.data as rd

from search_engine_skillbox_ray import config
from search_engine_skillbox_ray.pipelines.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_pairs,
)

from .conftest import requires_solo_ray




@pytest.fixture(scope="module")
def corpus(ray_session):
    """Synthetic docs with planted exact/near/far duplicates across
    multiple blocks (override_num_blocks>1 so joins/exchanges see a
    real multi-block layout)."""
    rng = np.random.default_rng(7)
    vocab = [f"w{i:03d}" for i in range(120)]
    rows = []
    for i in range(80):
        words = rng.choice(vocab, size=30, replace=True).tolist()
        rows.append({"doc_id": i, "text": " ".join(words)})
        if i % 5 == 0:  # exact dup
            rows.append({"doc_id": 1000 + i, "text": " ".join(words)})
        if i % 7 == 0:  # near dup: one word appended
            rows.append({"doc_id": 2000 + i, "text": " ".join(words) + " tail"})
    rows.append({"doc_id": 3000, "text": ""})  # empty doc
    rows.append({"doc_id": 3001, "text": "ab cd"})  # shorter than shingle k
    rows.append({"doc_id": 3002, "text": "ab cd"})  # its exact dup
    return rd.from_items(rows).repartition(6)


def _pair_frame(ds, cols):
    df = ds.to_pandas()
    return (
        df[list(cols)]
        .sort_values(list(cols[:2]))
        .reset_index(drop=True)
    )


@requires_solo_ray
def test_minhash_distributed_matches_fastpath(corpus, monkeypatch):
    fast = _pair_frame(
        minhash_lsh_pairs(corpus, threshold=0.4), ("doc_a", "doc_b", "est_jaccard")
    )
    monkeypatch.setattr(config, "DRIVER_FASTPATH_ROWS", 0)
    dist = _pair_frame(
        minhash_lsh_pairs(corpus, threshold=0.4), ("doc_a", "doc_b", "est_jaccard")
    )
    assert len(fast) > 0
    assert fast.equals(dist)


@requires_solo_ray
def test_ngram_distributed_matches_fastpath(corpus, monkeypatch):
    fast = _pair_frame(
        ngram_jaccard_pairs(corpus, threshold=0.4), ("doc_a", "doc_b", "jaccard")
    )
    monkeypatch.setattr(config, "DRIVER_FASTPATH_ROWS", 0)
    dist = _pair_frame(
        ngram_jaccard_pairs(corpus, threshold=0.4), ("doc_a", "doc_b", "jaccard")
    )
    assert len(fast) > 0
    assert fast.equals(dist)


@requires_solo_ray
def test_containment_distributed_matches_fastpath(monkeypatch, ray_session):
    """Letters-only vocab (the module `corpus` fixture's w001-style
    tokens collapse to one gram under the \\P{L}+ tokenizer, and a
    df=N gram is rightly excluded by the df cap)."""
    from search_engine_skillbox_ray.pipelines.dedup import containment_pairs

    rng = np.random.default_rng(11)
    letters = "abcdefghijklmnopqrstuvwxyz"
    vocab = [a + b + c for a in letters[:8] for b in letters[:8] for c in letters[:8]][:120]
    rows = []
    for i in range(80):
        words = rng.choice(vocab, size=30, replace=True).tolist()
        rows.append({"doc_id": i, "text": " ".join(words)})
        if i % 5 == 0:  # exact dup
            rows.append({"doc_id": 1000 + i, "text": " ".join(words)})
        if i % 7 == 0:  # contained: first half quoted inside new filler
            filler = rng.choice(vocab, size=40, replace=True).tolist()
            rows.append({"doc_id": 2000 + i,
                         "text": " ".join(filler[:20] + words[:15] + filler[20:])})
    corpus = rd.from_items(rows).repartition(6)

    fast = _pair_frame(
        containment_pairs(corpus, threshold=0.5), ("doc_a", "doc_b", "containment")
    )
    monkeypatch.setattr(config, "DRIVER_FASTPATH_ROWS", 0)
    dist = _pair_frame(
        containment_pairs(corpus, threshold=0.5), ("doc_a", "doc_b", "containment")
    )
    assert len(fast) > 0
    assert fast.equals(dist)


def test_simhash_distributed_matches_fastpath(corpus, monkeypatch):
    fast = _pair_frame(
        simhash_near_pairs(corpus, max_hamming=3), ("doc_a", "doc_b", "hamming")
    )
    monkeypatch.setattr(config, "DRIVER_FASTPATH_ROWS", 0)
    dist = _pair_frame(
        simhash_near_pairs(corpus, max_hamming=3), ("doc_a", "doc_b", "hamming")
    )
    assert len(fast) > 0
    assert fast.equals(dist)


def test_simhash_duplicate_doc_id_rows_absorbed(ray_session):
    """A duplicated doc_id row must not yield duplicate or self pairs
    (documented unique-doc_id hardening)."""
    rows = [
        {"doc_id": 1, "text": "alpha beta gamma delta"},
        {"doc_id": 1, "text": "alpha beta gamma delta"},
        {"doc_id": 2, "text": "alpha beta gamma delta"},
    ]
    out = simhash_near_pairs(rd.from_items(rows), max_hamming=3).to_pandas()
    assert len(out) == 1
    assert (int(out["doc_a"][0]), int(out["doc_b"][0])) == (1, 2)


@requires_solo_ray
def test_cross_source_pairs_both_paths(corpus, monkeypatch):
    """Leakage matrix: broadcast fast path == hash-join distributed
    path; counts consistent with the raw pair set."""
    import pandas as pd

    from search_engine_skillbox_ray.pipelines.dedup import cross_source_pairs

    docs = corpus.map_batches(
        lambda t: t.append_column(
            "source",
            __import__("pyarrow").array(
                ["s" + str(d % 3) for d in t["doc_id"].to_pylist()]
            ),
        ),
        batch_format="pyarrow",
    )
    pairs = minhash_lsh_pairs(docs, threshold=0.5)

    def run():
        return (
            cross_source_pairs(docs, pairs)
            .to_pandas()
            .sort_values(["src_a", "src_b"])
            .reset_index(drop=True)
        )

    fast = run()
    monkeypatch.setattr(config, "DRIVER_FASTPATH_ROWS", 0)
    dist = run()
    assert fast.equals(dist)
    # totals match the pair count; src_a <= src_b always
    assert int(fast["n_pairs"].sum()) == pairs.count() > 0
    assert (fast["src_a"] <= fast["src_b"]).all()


@requires_solo_ray
def test_near_dup_vs_snapshot_both_paths(corpus, monkeypatch):
    """Planted snapshot/current near-dups surface oriented
    (snapshot, current); within-side pairs excluded; broadcast and
    hash-join paths identical."""
    from search_engine_skillbox_ray.pipelines.dedup import near_dup_vs_snapshot

    # corpus doc_ids are unique; split by parity: even = snapshot
    import pyarrow.compute as pc_

    current = corpus.map_batches(
        lambda t: t.filter(pc_.equal(pc_.bit_wise_and(t.column("doc_id"), 1), 1)),
        batch_format="pyarrow",
    )
    snapshot = corpus.map_batches(
        lambda t: t.filter(pc_.equal(pc_.bit_wise_and(t.column("doc_id"), 1), 0)),
        batch_format="pyarrow",
    )

    def run():
        return (
            near_dup_vs_snapshot(current, snapshot, threshold=0.5)
            .to_pandas()
            .sort_values(["snapshot_doc_id", "current_doc_id"])
            .reset_index(drop=True)
        )

    fast = run()
    monkeypatch.setattr(config, "DRIVER_FASTPATH_ROWS", 0)
    dist = run()
    assert fast.equals(dist)
    assert (fast["snapshot_doc_id"] % 2 == 0).all()
    assert (fast["current_doc_id"] % 2 == 1).all()


@requires_solo_ray
def test_contrastive_negatives_both_paths(monkeypatch, ray_session):
    """Hard negatives: anchors are exactly the docs with a positive;
    no near-dup ever appears as a negative; ≤ k per anchor; the
    forced-distributed path yields the identical set."""
    from search_engine_skillbox_ray.pipelines.dedup import (
        contrastive_negatives,
        minhash_lsh_pairs,
    )

    rng = np.random.default_rng(31)
    letters = "abcdefghijklmnop"
    vocab = [a + b + c for a in letters for b in letters for c in letters][:300]
    rows = []
    for i in range(50):
        words = rng.choice(vocab[:150], size=25, replace=True).tolist()
        rows.append({"doc_id": 3 * i, "text": " ".join(words)})
        if i % 3 == 0:
            # near-dup positive partner → 3i becomes an anchor
            rows.append({"doc_id": 3 * i + 1, "text": " ".join(words) + " tail"})
            # weakly related: copies a contiguous RUN of the anchor's
            # words (shared rare shingles, df=2) but est stays < 0.5
            mix = words[:12] + rng.choice(vocab[150:], size=20, replace=True).tolist()
            rows.append({"doc_id": 3 * i + 2, "text": " ".join(mix)})
    corpus = rd.from_items(rows).repartition(4)

    out = contrastive_negatives(corpus, k=2, threshold=0.5).to_pandas()
    assert len(out) > 0
    pos = minhash_lsh_pairs(corpus, threshold=0.5).to_pandas()
    pos_set = {tuple(sorted(p)) for p in zip(pos["doc_a"], pos["doc_b"])}
    pos_docs = {d for p in pos_set for d in p}
    assert set(out["anchor_doc_id"]) <= pos_docs
    for a, n in zip(out["anchor_doc_id"], out["neg_doc_id"]):
        assert tuple(sorted((a, n))) not in pos_set
    assert out.groupby("anchor_doc_id").size().max() <= 2
    assert (out.groupby("anchor_doc_id")["rank"].min() == 1).all()

    cols = ["anchor_doc_id", "neg_doc_id", "rank"]
    fast = out.sort_values(cols).reset_index(drop=True)
    monkeypatch.setattr(config, "DRIVER_FASTPATH_ROWS", 0)
    dist = contrastive_negatives(corpus, k=2, threshold=0.5).to_pandas()
    assert dist.sort_values(cols).reset_index(drop=True).equals(fast)


@requires_solo_ray
def test_duplicated_doc_id_input_same_pair_set(corpus, monkeypatch):
    """Precondition hardening (round-3 VERDICT/ADVICE): feeding the pair
    generators an input where some doc_ids appear TWICE (identical text —
    a re-ingested doc) yields the identical pair set as the unique input,
    on both the driver fast path and the forced-distributed path."""
    import pyarrow as pa

    def with_dupes(ds):
        def dup_some(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            mask = pc.equal(pc.bit_wise_and(batch.column("doc_id"), 3), 0)
            return pa.concat_tables([batch, batch.filter(mask)])

        return ds.map_batches(dup_some, batch_format="pyarrow").repartition(7)

    duped = with_dupes(corpus)

    for gen, cols in (
        (lambda d: minhash_lsh_pairs(d, threshold=0.4), ("doc_a", "doc_b", "est_jaccard")),
        (lambda d: ngram_jaccard_pairs(d, threshold=0.4), ("doc_a", "doc_b", "jaccard")),
    ):
        clean = _pair_frame(gen(corpus), cols)
        assert len(clean) > 0
        assert _pair_frame(gen(duped), cols).equals(clean)
        monkeypatch.setattr(config, "DRIVER_FASTPATH_ROWS", 0)
        try:
            assert _pair_frame(gen(duped), cols).equals(clean)
        finally:
            monkeypatch.undo()


def _boiler_reference(rows, w, min_df):
    """Plain-Python oracle for boilerplate_strip."""
    from search_engine_skillbox_ray.functions.tokenize import tokenize

    segs = {}
    per_doc = {}
    for r in rows:
        toks = tokenize(r["text"])
        dsegs = [
            " ".join(toks[i : i + w]) for i in range(0, len(toks), w)
        ]
        per_doc[r["doc_id"]] = dsegs
        for s in set(dsegs):
            segs.setdefault(s, set()).add(r["doc_id"])
    flagged = {s for s, d in segs.items() if len(d) >= min_df}
    out = {}
    for did, dsegs in per_doc.items():
        kept = [s for s in dsegs if s not in flagged]
        out[did] = (
            len(dsegs),
            sum(1 for s in dsegs if s in flagged),
            " ".join(kept),
        )
    return out


def _boiler_frame(ds):
    df = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    return df[["doc_id", "n_segs", "n_removed", "text_clean"]]


@pytest.mark.parametrize("force_distributed", [False, True])
def test_boilerplate_strip_paths(corpus, monkeypatch, force_distributed):
    from search_engine_skillbox_ray.pipelines.dedup import boilerplate_strip

    if force_distributed:
        monkeypatch.setattr(config, "DRIVER_FASTPATH_ROWS", 0)
    w, min_df = 8, 2
    got = _boiler_frame(boilerplate_strip(corpus, w=w, min_df=min_df, n_buckets=8))
    rows = corpus.take_all()
    ref = _boiler_reference(rows, w, min_df)
    assert len(got) == len(ref)
    assert got["doc_id"].tolist() == sorted(ref)
    for _, r in got.iterrows():
        n_segs, n_removed, text_clean = ref[r["doc_id"]]
        assert r["n_segs"] == n_segs, r["doc_id"]
        assert r["n_removed"] == n_removed, r["doc_id"]
        assert r["text_clean"] == text_clean, r["doc_id"]
    # the planted exact dups MUST be fully stripped (all segments shared)
    dup_ids = [r["doc_id"] for r in rows if r["doc_id"] >= 1000 and r["doc_id"] < 2000]
    stripped = got.set_index("doc_id")
    for did in dup_ids:
        assert stripped.loc[did, "n_removed"] == stripped.loc[did, "n_segs"]
        assert stripped.loc[did, "text_clean"] == ""
    # and non-duplicated docs keep text: at least one doc survives intact
    assert (got["n_removed"] == 0).any()


def test_bloom_supersets_exact_decontaminate(ray_session):
    """Bloom hits must be a superset of exact hits per doc (no false
    negatives), and totals must agree with the exact operator."""
    import ray.data as rd

    from search_engine_skillbox_ray.pipelines.dedup import (
        bloom_decontaminate_stats,
        decontaminate_stats,
    )

    SF = "/root/testdata/sf0.001"
    docs = rd.read_parquet(f"{SF}/documents.parquet")
    probes = [
        "small big order scan fast sort a value stream",
        "merge group part scan row value column batch",
    ]
    exact = decontaminate_stats(docs, probes, k=5).to_pandas().set_index("doc_id")
    bloom = (
        bloom_decontaminate_stats(docs, probes, k=5, m_bits=8192, k_hash=3)
        .to_pandas()
        .set_index("doc_id")
    )
    assert (exact["n_windows"] == bloom.loc[exact.index, "n_windows"]).all()
    assert (
        bloom.loc[exact.index, "n_bloom_hits"] >= exact["n_hit_windows"]
    ).all()


@requires_solo_ray
def test_sweep_distributed_matches_fastpath(corpus, monkeypatch):
    """dedup_threshold_sweep's distributed path (per-batch threshold
    histograms + per-doc max-est fold) must equal the gated driver
    collect row for row."""
    from search_engine_skillbox_ray.pipelines.dedup import dedup_threshold_sweep

    fast = dedup_threshold_sweep(corpus).reset_index(drop=True)
    monkeypatch.setattr(config, "DRIVER_FASTPATH_ROWS", 0)
    dist = dedup_threshold_sweep(corpus).reset_index(drop=True)
    assert fast["n_pairs"].sum() > 0
    assert fast.equals(dist)


@requires_solo_ray
def test_calibration_distributed_matches_fastpath(corpus, monkeypatch):
    """minhash_calibration's distributed path (pair ⨝ packed gram sets
    ×2, per-batch decile combiner, ≤11-row groupby) must equal the
    gated local resolve."""
    from search_engine_skillbox_ray.pipelines.dedup import minhash_calibration

    fast = minhash_calibration(corpus).reset_index(drop=True)
    monkeypatch.setattr(config, "DRIVER_FASTPATH_ROWS", 0)
    dist = minhash_calibration(corpus).reset_index(drop=True)
    assert fast["n_pairs"].sum() > 0
    assert fast.equals(dist)
