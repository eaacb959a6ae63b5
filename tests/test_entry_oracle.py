"""Mini-driver harness: run every ``queries()`` entry at sf0.001 and
compare against ``oracle_sql()`` via DuckDB the way the driver does —
row count, schema (column names/dtypes), order-insensitive values."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _to_pandas(result):
    import pyarrow as pa

    import ray.data as rd

    if isinstance(result, rd.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = np.round(df[c].astype(np.float64), 6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    import importlib
    import os
    import sys

    sys.path.insert(0, "/root/repo")
    # the IVF oracle derives its centroid VALUES from the driver's sf
    # dir (default sf0.01) — point it at the sf this harness runs
    os.environ["SES_ORACLE_SF_DIR"] = SF_DIR
    yield importlib.import_module("__ray_entry__")
    os.environ.pop("SES_ORACLE_SF_DIR", None)


def test_entry_smoke(entry_mod):
    out = entry_mod.entry()
    df = _to_pandas(out)
    assert df is not None and len(df) >= 0
    if len(df):
        assert {"uri", "title", "snippet", "relevance"} <= set(df.columns)


def test_oracle_keys_subset(entry_mod):
    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(os_) >= 15  # broad oracle coverage


@pytest.mark.parametrize("name", [
    "doc_term_tf", "term_df", "term_cf", "corpus_stats", "term_idf",
    "search_disjunctive", "search_conjunctive", "search_site_scoped",
    "search_bm25", "search_count", "stats_by_source", "dedup_exact",
    "token_count", "quality", "fingerprint", "ann_cosine_topk",
    "events_window", "events_hopping", "sessionize", "docs_with_source_stats",
    "search_pruned_topk",
    # hard oracles for the (previously rows-only) near-dup / LSH / batch
    # operators — md5-derived hashing is replicated in SQL bit-for-bit
    "minhash_sigs", "minhash_pairs", "simhash", "simhash_near_pairs",
    "ngram_jaccard_pairs", "embedding_near_pairs", "ann_lsh_topk",
    "batch_search", "langid", "link_graph", "streaming_ingest",
    "hll_distinct_tokens",
    # round 3: the last three rows-only queries gained hard oracles
    "ann_ivf_topk", "media_decode", "media_frames",
    # round 3: graph operators (fixed-point PageRank, near-dup clusters)
    "pagerank", "dedup_clusters",
    # round 3: contamination probe (exact phrase-occurrence scan)
    "phrase_scan",
    # round 3: substring-level dup spans, deterministic sampling,
    # per-source top-k terms, exact doc-length quantiles
    "dup_spans", "sample_hash", "top_terms_per_source", "doclen_quantiles",
    # round 3: as-of (previous-row) join over the events stream
    "events_asof",
    # round 3: range join (follow-within-window funnel primitive)
    "events_follow",
    # round 4: O3 parity — ORDER BY SUM(rank) DESC, global + site-scoped
    "search_sum_tf", "search_sum_tf_site",
    # round 4: PII count+redact scrub (RE2 parity, injected fixtures)
    "pii_scrub",
    # round 3: BPE-ish pre-token counting (RE2 parity with DuckDB)
    "token_count_bpe",
    # round 3: Gopher-shape repetition signals, global bigram counts,
    # deterministic stratified (bottom-k-per-source) sampling
    "repetition", "term_bigrams", "stratified_sample",
    # round 3: index-native related-document retrieval (tfidf dot)
    "more_like_this",
    # round 3: anchor-text aggregation, incremental-snapshot anti-join
    "anchor_terms", "snapshot_delta",
    # round 3: end-to-end 128-bit-docID index build + block-max serve
    "search_128bit",
    # round 3: quality-gated resumable corpus export (sink + counts)
    "corpus_export",
    # round 3: tf-idf keyword extraction, per-label embedding centroids
    "doc_keywords", "label_centroids",
    # round 3: bigram PMI collocations, nearest-centroid confusion
    "bigram_pmi", "centroid_confusion",
    # round 3: positional index (phrase search served from the index)
    "phrase_index",
    # round 3: BM25 over the persisted 128-bit index
    "search_128bit_bm25",
    # round 3: proximity (slop) query from the positional index
    "proximity",
    # round 3: per-source Jensen-Shannon vocabulary drift
    "source_divergence",
    # round 3: cross-source near-dup leakage matrix
    "cross_source_pairs",
    # round 3: behavioral Markov transition counts
    "event_transitions",
    # round 3: multi-term NEAR query over the positional index
    "near_search",
    # round 3: fuzzy (MinHash) snapshot delta
    "near_dup_vs_snapshot",
    # round 3: positional-index LSM ingest (build half + append half)
    "phrase_index_ingest",
    # round 3: 128-bit index LSM ingest
    "search_128bit_ingest",
    # round 3: positional-index LSM delete (tombstones)
    "phrase_index_delete",
    # round 3: phrase-boosted ranking from the positional index
    "search_phrase_boost",
    # round 3: benchmark decontamination (broadcast probe windows)
    "decontaminate",
    # round 3: deterministic sequence packing (distributed prefix scan)
    "pack_sequences",
    # round 3: unigram-LM surprisal quality score
    "lm_doc_score",
    # round 3: overlapping token-window chunking (RAG prep)
    "doc_chunks",
    # round 3: Boolean AND-NOT retrieval
    "search_not",
    # round 3: 128-bit index LSM delete (tombstones + docmap filtering)
    "search_128bit_delete",
    # round 3: link-graph degree profile + bibliographic coupling
    "link_degrees", "coupling_pairs",
    # round 3: winnowing (MOSS) fingerprints
    "winnow_fingerprints",
    # round 3: adaptive length gate + int8 embedding quantization
    "length_gate", "quantize_embeddings",
    # round 3: global rank scan + per-source bigram diversity
    "doc_rank", "source_diversity",
    # round 3: reproducible splits + source-mix resampling
    "dataset_splits", "source_mix",
    # round 3: product-quantization codes
    "pq_codes",
    # round 3: per-doc token entropy
    "token_entropy",
    # round 3: fixed-point HITS hubs/authorities
    "hits",
    # round 3: PQ-ADC approximate top-k
    "pq_topk",
    # round 3: exact distinct users per window
    "window_users",
    # round 3: count-min sketch frequency estimates
    "cms_counts",
    # round 3: bigram-LM coherence score
    "bigram_lm_score",
    # round 3: sequential-dependence-model BM25 (phrase-aware ranking)
    "search_sdm_bm25",
    # round 3: edit-distance query correction ("did you mean")
    "spell_suggest",
    # round 3: type-ahead prefix completion
    "complete_prefix",
    # round 3: pseudo-relevance-feedback query expansion (RM1)
    "prf_expansion",
    # round 3: impact-ordered champion lists from the index segments
    "champion_lists",
    # round 3: SDM ranking after LSM tombstone deletes
    "search_sdm_delete",
    # round 3: windowed (skip-gram) co-occurrence counts
    "term_cooc",
    # round 3: ANN tombstone deletes over the persisted LSH index
    "ann_lsh_delete",
    # round 3: ANN LSM ingest (even build + odd delta append)
    "ann_lsh_ingest",
    # round 3: reciprocal-rank fusion of tf-idf and BM25 rankings
    "search_rrf",
    # round 3: greedy MMR diversification (unrolled SQL mirror)
    "mmr_diversify",
    # round 3: quality-aware near-dup curation (keep longest per cluster)
    "dedup_keep_best",
    # round 3: asymmetric (containment) near-dup pairs
    "containment_pairs",
    # round 3: champion lists under live LSM deltas + tombstones
    "champion_lists_lsm",
    # round 3: ordered funnel (earliest-completion chaining)
    "funnel_counts",
    # round 3: longest duplicated-window run (contiguity signal)
    "dup_span_runs",
    # round 3: triangle counts of the near-dup pair graph
    "dup_triangles",
    # round 3: embedding covariance (distributed Gram pass)
    "embedding_covariance",
    # round 3: champion-list serving (|q|·k posting touches)
    "search_champion",
    # round 3: persisted MinHash index ingest probe
    "dedup_index_query",
    # round 3: MinHash index tombstone deletes
    "dedup_index_delete",
    # round 3: z-normalized composite curation score
    "curation_score",
    # round 3: faceted search + spell-corrected search
    "search_facets", "search_corrected",
    # round 3: hybrid BM25 ⊕ dense-cosine RRF retrieval
    "search_hybrid",
    # round 3: hard-negative mining for contrastive training
    "contrastive_negatives",
    # round 4: ST1 morphology model (stateful lemmatizer in the
    # tokenizer actor slot; df = doc-set union across surface forms)
    "doc_term_tf_lemma", "term_df_lemma", "search_lemma",
    # round 4: C4/RefinedWeb-style boilerplate segment removal (corpus
    # rewrite: cleaned text export)
    "boilerplate_strip",
    # round 4: static doc-prior serving slot (freshness-decayed BM25)
    "search_recency",
    # round 4: wildcard prefix retrieval (vocab expansion + disjunctive)
    "search_prefix",
    # round 4: CCNet-style per-source head/middle/tail quality tertiles
    "ccnet_buckets",
    # round 4: host-crowding collapse (top-k results per site)
    "search_collapse",
    # round 4: TextRank keywords (integer-fixed-point PageRank per doc)
    "textrank_keywords",
    # round 4: percolation (stored-query alerting, AND semantics)
    "percolate",
    # round 4: explain (per-term tf/idf score breakdown)
    "search_explain",
    # round 4: serving-surface widening
    "search_msm",
    "search_suffix",
    "search_fuzzy",
    "search_after",
    "search_synonyms",
    "significant_terms",
    "term_vectors",
    "search_smart",
    "segment_stats",
    "phrase_index_asof",
    "search_boolean",
    "vocab_growth",
    "source_leakage",
    "retention_cohorts",
    "search_ql",
    "fertility_stats",
    "index_merge",
    "semdedup",
    "dsir_weights",
    "weighted_sample",
    "rel_pricing",
    "rel_ship_priority",
    "complete_context",
    "heavy_hitters",
    "rel_region_revenue",
    "cosine_text_pairs",
    "media_dedup",
    "media_near_pairs",
    "user_ewma",
    "zipf_fit",
    "rel_order_priority",
    "index_merge_ingest",
    "events_range_join",
    "user_moving_avg",
    "nb_classify",
    "dq_checks",
    "rel_rollup",
    "sif_embeddings",
    "rel_revenue_filter",
    "search_passages",
    "value_outliers",
    "window_quantiles",
    "rel_enrich",
    "json_props_stats",
    "rel_top_parts",
    "jsonl_roundtrip",
    "csv_roundtrip",
    "partitioned_export",
    "rel_supplier_nations",
    # round 4 session 9: Q13/Q11/Q22-shaped relational probes
    "rel_custdist", "rel_value_parts", "rel_idle_customers",
    # round 4 session 9: CDC MERGE INTO (last-writer-wins fold)
    "cdc_merge",
    # round 4 session 9: Adamic-Adar link prediction (wedge exchange)
    "link_predict",
    # round 4 session 9: IR evaluation (MRR / NDCG@k, synthetic qrels)
    "search_eval",
    # round 4 session 9: Q10/Q18/Q17/Q19/Q14/Q16-shaped relational probes
    "rel_returned_items", "rel_big_orders", "rel_small_qty",
    "rel_brackets", "rel_promo_share", "rel_supplier_variety",
    # round 4 session 9: IR serving + curation widening — JM-smoothed
    # QL, LTR feature export, fielded BM25F, CORI shard selection,
    # stopword generation, mixture planning, CUBE grouping sets
    "search_ql_jm", "ltr_features", "search_bm25f", "shard_selection",
    "stopword_candidates", "mixture_plan", "rel_cube",
    # round 4 session 9: Q7/Q15-shaped relational probes
    "rel_nation_trade", "rel_top_supplier",
    # round 4 session 9: anchor-text ranking, result-set date histogram,
    # k-means inertia (clustering-drift monitor)
    "search_anchor", "search_date_histogram", "kmeans_inertia",
    # round 4 session 9: Q8-shaped market share + personalized PageRank
    "rel_market_share", "link_ppr",
    # round 4 session 9: windowed leaders + normalization rewrite
    "window_leaders", "normalize_text",
    # round 4 session 9: clarity QPP + PSI drift monitor
    "query_clarity", "psi_drift",
    # round 4 session 9: dedup threshold calibration sweep
    "dedup_sweep",
    # round 4 session 9: Bloom-filter decontamination (bitset broadcast)
    "bloom_decontaminate",
    # round 4 session 9: RM3 interpolated feedback + crawl prioritization
    "prf_rm3", "crawl_priority",
    # round 4 session 9: robust median/MAD outlier gate
    "value_mad",
    # round 4 session 9: infix wildcard + vocabulary df histogram
    "search_infix", "df_histogram",
    # round 4 session 9: term burstiness (Church-Gale VMR)
    "term_burstiness",
    # round 4 session 9: Katz centrality (attenuated all-walks)
    "link_katz",
    # round 4 session 9: MinHash estimator calibration (est vs exact)
    "minhash_calibration",
    # round 5: tokenizer fertility + UniMax waterfill plan + the
    # composed curation funnel (quality -> exact -> near-dup -> decon)
    "source_fertility", "unimax_plan", "curation_pipeline",
    # round 4 session 9: RFM customer segmentation (exact quartiles)
    "rel_rfm",
    # round 4 session 9: discount elasticity + per-source length quartiles
    "rel_discount_elasticity", "source_quality_summary",
])
def test_query_matches_oracle(entry_mod, con, name):
    ray_df = _normalize(_to_pandas(entry_mod.queries()[name](SF_DIR)))
    ora_df = _normalize(con.execute(entry_mod.oracle_sql()[name]).fetchdf())
    assert list(ray_df.columns) == list(ora_df.columns), (
        f"{name} columns {list(ray_df.columns)} != {list(ora_df.columns)}"
    )
    assert len(ray_df) == len(ora_df), f"{name} rows {len(ray_df)} != {len(ora_df)}"
    for c in ray_df.columns:
        a, b = ray_df[c].to_numpy(), ora_df[c].to_numpy()
        if a.dtype.kind == "f":
            assert np.allclose(a, b, atol=1e-6, rtol=0, equal_nan=True), f"{name}.{c}"
        else:
            assert (a == b).all(), f"{name}.{c}"


def test_every_query_has_an_oracle(entry_mod):
    """Round 3: zero rows-only queries — every queries() entry carries
    DuckDB-equivalent SQL."""
    assert set(entry_mod.oracle_sql()) == set(entry_mod.queries())


def test_harness_parametrization_is_complete(entry_mod):
    """Round 5: the oracle harness must cover the WHOLE registry — a
    new queries() entry that skips the parametrize list above fails
    here instead of silently going unchecked."""
    import re

    src = open(__file__).read()
    m = re.search(
        r'@pytest\.mark\.parametrize\("name", \[(.*?)\]\)\n'
        r"def test_query_matches_oracle", src, re.S,
    )
    names = set(re.findall(r'"([^"]+)"', m.group(1)))
    missing = set(entry_mod.queries()) - names
    assert not missing, f"registry entries absent from the harness: {sorted(missing)}"
