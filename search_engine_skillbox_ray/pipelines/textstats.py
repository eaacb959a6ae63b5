"""Text-analysis operators for large-scale training-data pipelines:
token counting, quality scoring, document fingerprinting, language ID.

These extend the reference's operator set (SURVEY §2 covers none of
them) with the ops a 100 TB web-text pipeline needs; all are stateless
vectorized ``map_batches`` stages over the ``documents``/docs schema and
share the engine's tokenizer semantics (M2) so downstream indexing and
analysis agree on what a token is.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..stages.tokenizer import token_lists

# Tiny per-language stopword lists for the n-gram/stopword-hit language
# heuristic (public common-word lists; deliberately small — this is a
# heuristic scorer, not a model).
_LANG_STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset(["the", "of", "and", "to", "in", "a", "is", "that", "it", "for", "on", "with", "as", "are", "this", "by"]),
    "ru": frozenset(["и", "в", "не", "на", "что", "с", "это", "как", "по", "но", "из", "у", "за", "для", "то", "же"]),
    "de": frozenset(["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "zu", "den", "von", "für", "auf", "im"]),
    "es": frozenset(["el", "la", "de", "que", "y", "en", "un", "una", "es", "no", "los", "se", "por", "con", "para"]),
    "fr": frozenset(["le", "la", "de", "et", "les", "des", "un", "une", "est", "pas", "que", "dans", "pour", "sur"]),
}


def _tokens_per_row(batch: pa.Table, text_col: str) -> tuple[list[list[str]], pa.Table]:
    lists = token_lists(batch.column(text_col))
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    return [[t for t in row if t] for row in lists.to_pylist()], batch


def token_count_stage(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """(doc_id, n_tokens) — whitespace/letter tokenization (M2 semantics)."""
    from ..stages.tokenizer import token_counts

    return pa.table(
        {
            id_col: batch.column(id_col),
            "n_tokens": pa.array(token_counts(batch.column(text_col)), type=pa.int64()),
        }
    )


def quality_stage(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Per-doc quality signals: token count, distinct terms, mean token
    length, text length — the filterable stats of a data-quality pass."""
    toks, _ = _tokens_per_row(batch, text_col)
    n_tokens = np.array([len(t) for t in toks], dtype=np.int64)
    n_unique = np.array([len(set(t)) for t in toks], dtype=np.int64)
    avg_len = np.array(
        [float(np.mean([len(w) for w in t])) if t else 0.0 for t in toks], dtype=np.float64
    )
    n_chars = pc.utf8_length(batch.column(text_col))
    return pa.table(
        {
            id_col: batch.column(id_col),
            "n_tokens": pa.array(n_tokens),
            "n_unique_terms": pa.array(n_unique),
            "avg_token_len": pa.array(np.round(avg_len, 6)),
            "text_len": pc.cast(n_chars, pa.int64()),
        }
    )


def fingerprint_stage(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Deterministic content fingerprint: md5 over the normalized token
    stream (lowercased, punctuation/digit separators removed) — invariant
    to formatting noise, the key for exact near-layout dedup."""
    toks, _ = _tokens_per_row(batch, text_col)
    fps = [hashlib.md5(" ".join(t).encode("utf-8")).hexdigest() for t in toks]
    return pa.table(
        {
            id_col: batch.column(id_col),
            "fingerprint": pa.array(fps, type=pa.string()),
        }
    )


class LangId:
    """Actor-pool language-ID stage: stopword-hit scoring over the M2
    token stream. Wordlists compiled once per actor (__init__), batches
    scored vectorized-per-doc (__call__)."""

    def __init__(self) -> None:
        self.langs = list(_LANG_STOPWORDS)
        self.tables = [_LANG_STOPWORDS[lg] for lg in self.langs]

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks, _ = _tokens_per_row(batch, "text")
        preds, confs = [], []
        for t in toks:
            if not t:
                preds.append("unknown")
                confs.append(0.0)
                continue
            hits = [sum(1 for w in t if w in tbl) for tbl in self.tables]
            best = int(np.argmax(hits))
            total = len(t)
            if hits[best] == 0:
                preds.append("unknown")
                confs.append(0.0)
            else:
                preds.append(self.langs[best])
                confs.append(round(hits[best] / total, 6))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "pred_lang": pa.array(preds, type=pa.string()),
                "confidence": pa.array(confs, type=pa.float64()),
            }
        )


def token_counts_ds(documents: rd.Dataset) -> rd.Dataset:
    return documents.map_batches(token_count_stage, batch_format="pyarrow")


def quality_ds(documents: rd.Dataset) -> rd.Dataset:
    return documents.map_batches(quality_stage, batch_format="pyarrow")


def fingerprints_ds(documents: rd.Dataset) -> rd.Dataset:
    return documents.map_batches(fingerprint_stage, batch_format="pyarrow")


def langid_ds(documents: rd.Dataset, concurrency=(1, 4)) -> rd.Dataset:
    return documents.map_batches(LangId, batch_format="pyarrow", concurrency=concurrency)
