"""Pure-Python oracle implementing SearchServiceImpl's exact math.

Independent, dict-based re-derivation of the reference scoring
(/root/reference/src/main/java/searchengine/service/SearchServiceImpl.java):
idf = ln((N+1)/(df+1)) (:133), score = Σ tf·idf accumulated in double,
cast to float32 per page (:146, :151-160), OR retrieval (every page with
>=1 query lemma), pagination clamps (:162-166). Used by the rank-parity
tests (SURVEY §5.5); ties compared as sets because the reference tie
order is unspecified (:51).
"""

from __future__ import annotations

import math

import numpy as np

from search_engine_skillbox_ray.functions.tokenize import query_lemmas, tokenize


class OracleIndex:
    def __init__(self, docs: list[dict]):
        """docs: [{doc_id, site, text}] — site is the site url string."""
        self.tf: dict[str, dict[int, int]] = {}
        self.doc_site: dict[int, str] = {}
        for d in docs:
            counts: dict[str, int] = {}
            for t in tokenize(d["text"]):
                counts[t] = counts.get(t, 0) + 1
            self.doc_site[d["doc_id"]] = d["site"]
            for t, c in counts.items():
                self.tf.setdefault(t, {})[d["doc_id"]] = c
        # N counts only docs having >=1 index row (A3)
        self.indexed_docs = {doc for post in self.tf.values() for doc in post}

    def _scope(self, site: str | None):
        if site is None or not site.strip():
            return None
        return site

    def search(self, query: str, site: str | None = None) -> tuple[dict[int, float], int]:
        """→ ({doc_id: float32 score}, N). Empty dict when no match."""
        lemmas = query_lemmas(query)
        if not lemmas:
            return {}, 0
        scope = self._scope(site)
        in_scope = (
            self.indexed_docs
            if scope is None
            else {d for d in self.indexed_docs if self.doc_site[d] == scope}
        )
        n_total = len(in_scope)
        if n_total <= 0:
            return {}, 0
        df = {
            lm: sum(1 for d in self.tf.get(lm, {}) if d in in_scope) for lm in lemmas
        }
        idf = {lm: math.log((n_total + 1) / (df[lm] + 1)) for lm in lemmas}
        page_scores: dict[int, float] = {}
        for lm in lemmas:
            for d, tf in self.tf.get(lm, {}).items():
                if d in in_scope:
                    page_scores[d] = page_scores.get(d, 0.0) + tf * idf[lm]
        return {d: float(np.float32(s)) for d, s in page_scores.items()}, n_total

    def topk_tie_groups(self, query: str, site: str | None = None) -> list[set[int]]:
        """Result list partitioned into equal-score groups, score desc."""
        scores, _ = self.search(query, site)
        groups: dict[float, set[int]] = {}
        for d, s in scores.items():
            groups.setdefault(s, set()).add(d)
        return [groups[s] for s in sorted(groups, reverse=True)]
