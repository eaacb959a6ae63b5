"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship crawl-corpus→index→search pipeline on
sf0.001. ``queries()`` exposes one callable per implemented operator
(SURVEY §2 + the training-data extensions); ``oracle_sql()`` gives the
DuckDB-equivalent SQL for every SQL-expressible one (non-SQL ops —
LSH/minhash/simhash candidates, language ID, media decode — are
rows-only checks by design).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.

Column names and types are aligned 1:1 with the oracle SQL (the driver
hash-compares values after sorting columns by name). Float columns are
rounded to 6 decimals on BOTH sides; score-bearing queries use float64
(the engine's reference-parity float32 cast is exercised by the pytest
suite instead, where the pure-Python oracle carries the same cast).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

SEARCH_QUERY = "merge batch fast"
SEARCH_SITE_SOURCE = "src3"
BM25_K1, BM25_B = 1.2, 0.75
ANN_K, ANN_NQ = 10, 5

# Tokenizer as SQL (RE2 on both sides — pyarrow split_pattern_regex and
# DuckDB regexp_split_to_array share \p{L} semantics).
_TOK = (
    "SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), "
    "'[^\\p{L}]+'), x -> x <> '')) AS term FROM documents"
)
_TF = f"SELECT doc_id, term, count(*)::BIGINT AS tf FROM ({_TOK}) GROUP BY doc_id, term"


# ----------------------------------------------------------- helpers
def _documents(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet")


def _embeddings(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/embeddings.parquet")


def _events(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/events.parquet")


def _sources(sf_dir: str) -> list[str]:
    return sorted(_documents(sf_dir).unique("source"))


def _exploded(sf_dir: str):
    """documents → (site_id, doc_id, term, tf) via the engine tokenizer."""
    from search_engine_skillbox_ray.sources.pages import docs_from_documents
    from search_engine_skillbox_ray.stages.tokenizer import TokenizeExplode

    docs = docs_from_documents(_documents(sf_dir), _sources(sf_dir))
    return docs.map_batches(
        TokenizeExplode, batch_format="pyarrow", concurrency=(1, 4), batch_size=1024
    )


def _index_dir(sf_dir: str) -> str:
    """Build (resumable, cached across callables) the index for sf_dir."""
    import search_engine_skillbox_ray as ses

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    idx = f"/tmp/ses_entry_idx_{tag}"
    ses.build_index_from_documents_table(
        _documents(sf_dir), idx, ses.BuildConfig(n_buckets=8), input_token=sf_dir
    )
    return idx


def _engine(sf_dir: str, **kw):
    from search_engine_skillbox_ray.state.engine import SearchEngine

    return SearchEngine(_index_dir(sf_dir), **kw)


def _query_vectors(sf_dir: str) -> np.ndarray:
    """Embedding rows vec_id < ANN_NQ, in vec_id order (block-order safe)."""
    rows = _embeddings(sf_dir).filter(expr=f"vec_id < {ANN_NQ}").take_all()
    rows.sort(key=lambda r: r["vec_id"])
    return np.asarray([r["embedding"] for r in rows], dtype=np.float64)


# ----------------------------------------------------------- queries
def q_doc_term_tf(sf_dir: str):
    ex = _exploded(sf_dir)
    return ex.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t["doc_id"],
                "term": t["term"],
                "tf": pc.cast(t["tf"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def q_term_df(sf_dir: str):
    out = _exploded(sf_dir).groupby("term").count()
    return out.map_batches(
        lambda t: pa.table({"term": t["term"], "df": pc.cast(t["count()"], pa.int64())}),
        batch_format="pyarrow",
    )


def q_term_cf(sf_dir: str):
    ex = _exploded(sf_dir).map_batches(
        lambda t: pa.table({"term": t["term"], "tf64": pc.cast(t["tf"], pa.int64())}),
        batch_format="pyarrow",
    )
    out = ex.groupby("term").sum("tf64")
    return out.map_batches(
        lambda t: pa.table({"term": t["term"], "cf": pc.cast(t["sum(tf64)"], pa.int64())}),
        batch_format="pyarrow",
    )


def q_corpus_stats(sf_dir: str):
    import json
    from pathlib import Path

    idx = _index_dir(sf_dir)
    stats = json.loads((Path(idx) / "stats.json").read_text())
    n_terms = 0
    import pyarrow.parquet as pq

    seen = set()
    for f in sorted(Path(idx, "postings").glob("bucket=*.parquet")):
        seen.update(pq.read_table(f, columns=["term"])["term"].to_pylist())
    n_terms = len(seen)
    return pd.DataFrame(
        {
            "n_docs": [int(stats["n_docs"])],
            "n_docs_indexed": [int(stats["n_docs_indexed"])],
            "n_terms": [n_terms],
        }
    ).astype("int64")


def q_term_idf(sf_dir: str):
    import json
    from pathlib import Path

    idx = _index_dir(sf_dir)
    n = json.loads((Path(idx) / "stats.json").read_text())["n_docs_indexed"]
    df = q_term_df(sf_dir).to_pandas()
    df["idf"] = np.round(np.log((n + 1.0) / (df["df"].to_numpy() + 1.0)), 6)
    return df[["term", "idf"]]


def q_search_disjunctive(sf_dir: str):
    eng = _engine(sf_dir, float32_scores=False)
    doc_ids, scores, _ = eng.search_scores(SEARCH_QUERY)
    return pd.DataFrame({"doc_id": doc_ids.astype(np.int64), "score": np.round(scores, 6)})


def q_search_conjunctive(sf_dir: str):
    eng = _engine(sf_dir, mode="and", float32_scores=False)
    doc_ids, scores, _ = eng.search_scores(SEARCH_QUERY)
    return pd.DataFrame({"doc_id": doc_ids.astype(np.int64), "score": np.round(scores, 6)})


def q_search_site_scoped(sf_dir: str):
    eng = _engine(sf_dir, float32_scores=False)
    site = f"https://{SEARCH_SITE_SOURCE}.example"
    doc_ids, scores, _ = eng.search_scores(SEARCH_QUERY, site=site)
    return pd.DataFrame({"doc_id": doc_ids.astype(np.int64), "score": np.round(scores, 6)})


def q_search_bm25(sf_dir: str):
    eng = _engine(sf_dir, scorer="bm25", k1=BM25_K1, b=BM25_B, float32_scores=False)
    doc_ids, scores, _ = eng.search_scores(SEARCH_QUERY)
    return pd.DataFrame({"doc_id": doc_ids.astype(np.int64), "score": np.round(scores, 6)})


def q_search_count(sf_dir: str):
    eng = _engine(sf_dir)
    doc_ids, _, _ = eng.search_scores(SEARCH_QUERY)
    return pd.DataFrame({"n_matched": [int(doc_ids.size)]}).astype("int64")


def q_stats_by_source(sf_dir: str):
    sources = _sources(sf_dir)
    ex = _exploded(sf_dir)
    per = ex.groupby(["site_id", "term"]).count()
    lemmas = per.groupby("site_id").count().to_pandas()
    docs = (
        _documents(sf_dir)
        .groupby("source")
        .count()
        .to_pandas()
        .rename(columns={"count()": "n_docs"})
    )
    lemmas["source"] = [sources[i] for i in lemmas["site_id"]]
    out = docs.merge(
        lemmas.rename(columns={"count()": "n_lemmas"})[["source", "n_lemmas"]],
        on="source",
        how="left",
    )
    out["n_docs"] = out["n_docs"].astype("int64")
    out["n_lemmas"] = out["n_lemmas"].fillna(0).astype("int64")
    return out[["source", "n_docs", "n_lemmas"]]


def q_dedup_exact(sf_dir: str):
    from search_engine_skillbox_ray.pipelines.dedup import exact_dedup

    return exact_dedup(_documents(sf_dir))


def q_token_count(sf_dir: str):
    from search_engine_skillbox_ray.pipelines.textstats import token_counts_ds

    return token_counts_ds(_documents(sf_dir))


def q_quality(sf_dir: str):
    from search_engine_skillbox_ray.pipelines.textstats import quality_ds

    return quality_ds(_documents(sf_dir))


def q_fingerprint(sf_dir: str):
    from search_engine_skillbox_ray.pipelines.textstats import fingerprints_ds

    return fingerprints_ds(_documents(sf_dir))


def q_langid(sf_dir: str):
    from search_engine_skillbox_ray.pipelines.textstats import langid_ds

    return langid_ds(_documents(sf_dir))


def q_minhash_pairs(sf_dir: str):
    from search_engine_skillbox_ray.pipelines.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(_documents(sf_dir), threshold=0.5)


def q_simhash(sf_dir: str):
    from search_engine_skillbox_ray.pipelines.dedup import simhash_ds

    return simhash_ds(_documents(sf_dir))


def q_ngram_jaccard_pairs(sf_dir: str):
    from search_engine_skillbox_ray.pipelines.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_documents(sf_dir), threshold=0.5)


def q_embedding_near_pairs(sf_dir: str):
    from search_engine_skillbox_ray.pipelines.dedup import embedding_near_pairs

    return embedding_near_pairs(_embeddings(sf_dir), threshold=0.95)


def q_ann_cosine_topk(sf_dir: str):
    from search_engine_skillbox_ray.pipelines.ann import brute_force_topk

    return brute_force_topk(_embeddings(sf_dir), _query_vectors(sf_dir), k=ANN_K)


def q_ann_lsh_topk(sf_dir: str):
    from search_engine_skillbox_ray.pipelines.ann import lsh_topk

    return lsh_topk(
        _embeddings(sf_dir), _query_vectors(sf_dir), k=ANN_K, n_planes=4, n_probes=11
    )



def q_ann_ivf_topk(sf_dir: str):
    from search_engine_skillbox_ray.pipelines.ann import ivf_topk

    return ivf_topk(_embeddings(sf_dir), _query_vectors(sf_dir), k=ANN_K, n_lists=8, n_probe=4)


def q_events_window(sf_dir: str):
    from search_engine_skillbox_ray.pipelines.windows import tumbling_window

    return tumbling_window(_events(sf_dir), window_s=3600)


def q_sessionize(sf_dir: str):
    from search_engine_skillbox_ray.pipelines.windows import sessionize

    return sessionize(_events(sf_dir), gap_s=1800)


def q_docs_with_source_stats(sf_dir: str):
    """Broadcast-join demo (J1 shape): per-doc row decorated with its
    source's doc count — small side via ray.put, no shuffle."""
    import ray

    docs = _documents(sf_dir)
    counts = docs.groupby("source").count().to_pandas()
    lookup_ref = ray.put(dict(zip(counts["source"], counts["count()"].astype(int))))

    def join_batch(batch: pa.Table) -> pa.Table:
        lookup = ray.get(lookup_ref)
        srcs = batch.column("source").to_pylist()
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "source": batch.column("source"),
                "n_docs_in_source": pa.array([lookup[s] for s in srcs], pa.int64()),
            }
        )

    return docs.map_batches(join_batch, batch_format="pyarrow")


def q_media_decode(sf_dir: str):
    """Multimodal plumbing demo over the deterministic media fixture."""
    import ray.data as rd

    from search_engine_skillbox_ray.pipelines.multimodal import decode_media_ds, make_media_table

    return decode_media_ds(rd.from_arrow(make_media_table(200, seed=13)))


def q_media_frames(sf_dir: str):
    import ray.data as rd

    from search_engine_skillbox_ray.pipelines.multimodal import frame_sample_ds, make_media_table

    return frame_sample_ds(rd.from_arrow(make_media_table(200, seed=13)), every_k=2)




def q_search_pruned_topk(sf_dir: str):
    """Block-max MaxScore pruned top-10 — identical to exhaustive top-k."""
    eng = _engine(sf_dir, float32_scores=False)
    d, s = eng.topk(SEARCH_QUERY, k=10)
    return pd.DataFrame({"doc_id": d.astype(np.int64), "score": np.round(s, 6)})


def q_batch_search(sf_dir: str):
    """Dataset-native batch query evaluation (warm engine actor pool)."""
    import ray.data as rd

    from search_engine_skillbox_ray.state.engine import batch_search

    idx = _index_dir(sf_dir)
    queries_ds = rd.from_items(
        [{"query": q} for q in ["merge batch", "fast", "hash join", "absentzz", "scan column fast"]]
    )
    return batch_search(queries_ds, idx, concurrency=(1, 2))




def q_link_graph(sf_dir: str):
    """M7 link extraction over a deterministic synthetic pages fixture:
    in-site (src_url, dst_url) edges."""
    import ray.data as rd

    from search_engine_skillbox_ray.functions.links import extract_links_ds
    from search_engine_skillbox_ray.sources.fixtures import generate_pages_table
    from search_engine_skillbox_ray.sources.pages import derive_sites

    pages = rd.from_arrow(generate_pages_table(300, n_sites=2, seed=13))
    sites = derive_sites(pages)
    return extract_links_ds(pages, sites)


# ------------------------------------------------------------ contract
def entry() -> Any:
    """Flagship: build the index over sf0.001 documents, run the search
    API, return the decorated top-10 as a DataFrame."""
    eng = _engine("/root/testdata/sf0.001")
    resp = eng.search(SEARCH_QUERY, limit=10)
    rows = [
        {
            "rank": i,
            "site": it["site"],
            "siteName": it["siteName"],
            "uri": it["uri"],
            "title": it["title"],
            "snippet": it["snippet"],
            "relevance": it["relevance"],
        }
        for i, it in enumerate(resp["data"])
    ]
    return pd.DataFrame(rows)


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "doc_term_tf": q_doc_term_tf,
        "term_df": q_term_df,
        "term_cf": q_term_cf,
        "corpus_stats": q_corpus_stats,
        "term_idf": q_term_idf,
        "search_disjunctive": q_search_disjunctive,
        "search_conjunctive": q_search_conjunctive,
        "search_site_scoped": q_search_site_scoped,
        "search_bm25": q_search_bm25,
        "search_count": q_search_count,
        "stats_by_source": q_stats_by_source,
        "dedup_exact": q_dedup_exact,
        "token_count": q_token_count,
        "quality": q_quality,
        "fingerprint": q_fingerprint,
        "langid": q_langid,
        "minhash_pairs": q_minhash_pairs,
        "simhash": q_simhash,
        "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
        "embedding_near_pairs": q_embedding_near_pairs,
        "ann_cosine_topk": q_ann_cosine_topk,
        "ann_lsh_topk": q_ann_lsh_topk,
        "events_window": q_events_window,
        "sessionize": q_sessionize,
        "docs_with_source_stats": q_docs_with_source_stats,
        "media_decode": q_media_decode,
        "media_frames": q_media_frames,
        "search_pruned_topk": q_search_pruned_topk,
        "batch_search": q_batch_search,
        "link_graph": q_link_graph,
        "ann_ivf_topk": q_ann_ivf_topk,
    }


def _terms_values() -> str:
    terms = SEARCH_QUERY.split()
    return ", ".join(f"('{t}')" for t in terms)


def oracle_sql() -> dict[str, str]:
    terms = SEARCH_QUERY.split()
    terms_in = ", ".join(f"'{t}'" for t in terms)
    n_terms = len(terms)
    scope_site = SEARCH_SITE_SOURCE

    tfidf_scores = f"""
WITH tf AS ({_TF}),
n AS (SELECT count(DISTINCT doc_id) AS n FROM tf),
q(term) AS (VALUES {_terms_values()}),
df AS (SELECT q.term, count(DISTINCT tf.doc_id)::BIGINT AS df
       FROM q LEFT JOIN tf ON tf.term = q.term GROUP BY q.term),
scores AS (
  SELECT tf.doc_id, SUM(tf.tf * ln((n.n + 1.0) / (df.df + 1.0))) AS score
  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
  GROUP BY tf.doc_id)
"""
    return {
        "doc_term_tf": _TF,
        "term_df": f"SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM ({_TOK}) GROUP BY term",
        "term_cf": f"SELECT term, count(*)::BIGINT AS cf FROM ({_TOK}) GROUP BY term",
        "corpus_stats": f"""
WITH tok AS ({_TOK})
SELECT (SELECT count(*) FROM documents)::BIGINT AS n_docs,
       (SELECT count(DISTINCT doc_id) FROM tok)::BIGINT AS n_docs_indexed,
       (SELECT count(DISTINCT term) FROM tok)::BIGINT AS n_terms
""",
        "term_idf": f"""
WITH tok AS ({_TOK}),
n AS (SELECT count(DISTINCT doc_id) AS n FROM tok)
SELECT term, ROUND(ln((n.n + 1.0) / (count(DISTINCT doc_id) + 1.0)), 6) AS idf
FROM tok CROSS JOIN n GROUP BY term, n.n
""",
        "search_disjunctive": tfidf_scores
        + "SELECT doc_id, ROUND(score, 6) AS score FROM scores",
        "search_pruned_topk": tfidf_scores
        + """SELECT doc_id, ROUND(score, 6) AS score FROM scores
QUALIFY row_number() OVER (ORDER BY score DESC, doc_id) <= 10""",
        "search_conjunctive": tfidf_scores
        + f"""
SELECT s.doc_id, ROUND(s.score, 6) AS score FROM scores s
JOIN (SELECT doc_id FROM tf WHERE term IN ({terms_in})
      GROUP BY doc_id HAVING count(DISTINCT term) = {n_terms}) m
  ON s.doc_id = m.doc_id
""",
        "search_site_scoped": f"""
WITH d AS (SELECT doc_id, text FROM documents WHERE source = '{scope_site}'),
tok AS (SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text),
        '[^\\p{{L}}]+'), x -> x <> '')) AS term FROM d),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY doc_id, term),
n AS (SELECT count(DISTINCT doc_id) AS n FROM tf),
q(term) AS (VALUES {_terms_values()}),
df AS (SELECT q.term, count(DISTINCT tf.doc_id)::BIGINT AS df
       FROM q LEFT JOIN tf ON tf.term = q.term GROUP BY q.term),
scores AS (
  SELECT tf.doc_id, SUM(tf.tf * ln((n.n + 1.0) / (df.df + 1.0))) AS score
  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n GROUP BY tf.doc_id)
SELECT doc_id, ROUND(score, 6) AS score FROM scores
""",
        "search_bm25": f"""
WITH tf AS ({_TF}),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM ({_TOK}) GROUP BY doc_id),
n AS (SELECT count(DISTINCT doc_id) AS n FROM tf),
avgdl AS (SELECT sum(dl) / (SELECT n FROM n) AS avgdl FROM dl),
q(term) AS (VALUES {_terms_values()}),
df AS (SELECT q.term, count(DISTINCT tf.doc_id)::BIGINT AS df
       FROM q LEFT JOIN tf ON tf.term = q.term GROUP BY q.term),
scores AS (
  SELECT tf.doc_id,
         SUM(ln((n.n + 1.0) / (df.df + 1.0)) * (tf.tf * ({BM25_K1} + 1.0)) /
             (tf.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * dl.dl / avgdl.avgdl))) AS score
  FROM tf JOIN df ON tf.term = df.term
       JOIN dl ON dl.doc_id = tf.doc_id
       CROSS JOIN n CROSS JOIN avgdl
  GROUP BY tf.doc_id)
SELECT doc_id, ROUND(score, 6) AS score FROM scores
""",
        "search_count": f"""
WITH tf AS ({_TF})
SELECT count(DISTINCT doc_id)::BIGINT AS n_matched FROM tf WHERE term IN ({terms_in})
""",
        "stats_by_source": f"""
WITH tok AS (SELECT source, unnest(list_filter(regexp_split_to_array(lower(text),
        '[^\\p{{L}}]+'), x -> x <> '')) AS term FROM documents)
SELECT d.source,
       count(*)::BIGINT AS n_docs,
       COALESCE(l.n_lemmas, 0)::BIGINT AS n_lemmas
FROM documents d
LEFT JOIN (SELECT source, count(DISTINCT term)::BIGINT AS n_lemmas FROM tok GROUP BY source) l
  ON d.source = l.source
GROUP BY d.source, l.n_lemmas
""",
        "dedup_exact": """
SELECT min(doc_id)::BIGINT AS doc_id, count(*)::BIGINT AS n_copies
FROM documents GROUP BY text
""",
        "token_count": """
SELECT doc_id, len(list_filter(regexp_split_to_array(lower(text), '[^\\p{L}]+'),
       x -> x <> ''))::BIGINT AS n_tokens FROM documents
""",
        "quality": f"""
WITH tok AS ({_TOK}),
agg AS (SELECT doc_id, count(*)::BIGINT AS n_tokens,
               count(DISTINCT term)::BIGINT AS n_unique_terms,
               ROUND(avg(length(term)), 6) AS avg_token_len
        FROM tok GROUP BY doc_id)
SELECT d.doc_id,
       COALESCE(a.n_tokens, 0)::BIGINT AS n_tokens,
       COALESCE(a.n_unique_terms, 0)::BIGINT AS n_unique_terms,
       COALESCE(a.avg_token_len, 0.0)::DOUBLE AS avg_token_len,
       length(d.text)::BIGINT AS text_len
FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
""",
        "fingerprint": """
SELECT doc_id, md5(array_to_string(list_filter(regexp_split_to_array(lower(text),
       '[^\\p{L}]+'), x -> x <> ''), ' ')) AS fingerprint FROM documents
""",
        "ann_cosine_topk": f"""
WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < {ANN_NQ}),
s AS (SELECT q.query_id::INTEGER AS query_id, e.vec_id,
             list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                    CAST(q.embedding AS DOUBLE[]))::DOUBLE AS cos
      FROM embeddings e, q)
SELECT query_id,
       (row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) - 1)::INTEGER AS rank,
       vec_id, ROUND(cos, 6) AS cosine
FROM s
QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) <= {ANN_K}
""",
        "events_window": """
SELECT event_type,
       ((epoch_us(ts) // 3600000000) * 3600)::BIGINT AS window_start,
       count(*)::BIGINT AS n_events,
       ROUND(sum(value), 6) AS sum_value
FROM events GROUP BY event_type, window_start
""",
        "sessionize": """
WITH o AS (
  SELECT user_id,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM events)
SELECT user_id, sum(new_s)::BIGINT AS n_sessions, count(*)::BIGINT AS n_events
FROM o GROUP BY user_id
""",
        "docs_with_source_stats": """
SELECT d.doc_id, d.source, c.n_docs_in_source
FROM documents d
JOIN (SELECT source, count(*)::BIGINT AS n_docs_in_source FROM documents GROUP BY source) c
  ON d.source = c.source
""",
    }
