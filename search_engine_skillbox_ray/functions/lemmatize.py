"""Dictionary + suffix-rule lemmatizer — the ST1 "real morphology model".

The reference's MorphologyServiceImpl
(/root/reference/src/main/java/searchengine/service/MorphologyServiceImpl.java:17-19)
is lowercase+split, so engine parity never NEEDED a model; this module
proves the extension surface the stage was designed for: a genuinely
STATEFUL lemmatizer whose model artifact is

  * built once (``build_lemma_model`` → one JSON file: an irregular-form
    exception dict + an ordered suffix-rule table),
  * loaded once per actor in ``__init__`` (``DictLemmatizer``) — never
    per batch,
  * applied vectorized: the batch's term array is dictionary-encoded
    (Arrow C++), only the UNIQUE forms go through the rule engine
    (memoized across batches, so a Zipf vocabulary costs ~nothing after
    warmup), and the result is re-broadcast with one ``take``.

Semantics (deterministic, SQL-mirrorable — ``lemma_sql_expr`` emits the
exact DuckDB expression for the oracle):

  lemma(form) = exceptions[form]                      if form in exceptions
              = apply FIRST matching suffix rule      (suffix, repl, min_form_len)
              = form                                  if no rule matches

Rules match on the full surface form's length (``len(form) >= min_len``
AND ``form.endswith(suffix)``); replacement is
``form[:-len(suffix)] + repl``. A rule with ``repl == suffix`` is a stop
rule (keeps the form, blocks later rules) — e.g. ``-ss`` blocking ``-s``.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pyarrow as pa

# Irregular forms. ``row`` → ``line`` makes two distinct surface forms
# share one lemma, so a lemma index genuinely merges posting lists
# (df = |docs(row) ∪ docs(line)|, cf = cf(row) + cf(line)) — the
# interesting aggregation case a pure suffix-stripper wouldn't hit on
# the synthetic corpus vocabulary.
DEFAULT_EXCEPTIONS: dict[str, str] = {
    "data": "datum",
    "row": "line",
    "children": "child",
    "men": "man",
    "women": "woman",
    "is": "be",
    "was": "be",
    "were": "be",
}

# (suffix, replacement, min_form_len) — first match wins.
DEFAULT_RULES: list[tuple[str, str, int]] = [
    ("sses", "ss", 5),
    ("ies", "y", 5),
    ("ing", "", 6),
    ("ed", "", 5),
    ("er", "", 5),
    ("ss", "ss", 0),  # stop rule: keep -ss words, block the -s rule
    ("s", "", 4),
]

MODEL_FILENAME = "lemma_model.json"


def build_lemma_model(
    path: str | Path,
    exceptions: dict[str, str] | None = None,
    rules: list[tuple[str, str, int]] | None = None,
) -> str:
    """Write the model artifact (atomic tmp+rename). Returns the path."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    model = {
        "version": 1,
        "exceptions": dict(DEFAULT_EXCEPTIONS if exceptions is None else exceptions),
        "rules": [list(r) for r in (DEFAULT_RULES if rules is None else rules)],
    }
    tmp = path.with_suffix(path.suffix + ".tmp")
    tmp.write_text(json.dumps(model, sort_keys=True))
    tmp.replace(path)
    return str(path)


def load_lemma_model(path: str | Path) -> tuple[dict[str, str], list[tuple[str, str, int]]]:
    model = json.loads(Path(path).read_text())
    rules = [(s, r, int(m)) for s, r, m in model["rules"]]
    return dict(model["exceptions"]), rules


def lemmatize_form(
    form: str,
    exceptions: dict[str, str],
    rules: list[tuple[str, str, int]],
) -> str:
    """Scalar reference implementation (the property-test oracle)."""
    hit = exceptions.get(form)
    if hit is not None:
        return hit
    for suffix, repl, min_len in rules:
        if len(form) >= min_len and form.endswith(suffix):
            return form[: len(form) - len(suffix)] + repl
    return form


class DictLemmatizer:
    """Stateful model: load once (``__init__``), apply per batch.

    Pass the model PATH into ``map_batches(Cls, fn_constructor_kwargs=
    {"lemma_model": path})`` so every actor loads its own copy from
    (shared) storage — the model is a file, not a pickled closure, which
    is what a real pymorphy/spaCy artifact would look like on a cluster.
    """

    def __init__(self, model_path: str | Path) -> None:
        self.exceptions, self.rules = load_lemma_model(model_path)
        # memo of surface form → lemma, grows to vocabulary size only
        self._memo: dict[str, str] = dict(self.exceptions)

    def lemmatize_unique(self, forms: np.ndarray) -> np.ndarray:
        memo = self._memo
        exceptions, rules = self.exceptions, self.rules
        out = np.empty(len(forms), dtype=object)
        for i, f in enumerate(forms):
            hit = memo.get(f)
            if hit is None:
                hit = lemmatize_form(f, exceptions, rules)
                memo[f] = hit
            out[i] = hit
        return out

    def lemmatize(self, terms: pa.Array | pa.ChunkedArray) -> pa.Array:
        """Vectorized: rule engine touches only the batch's UNIQUE forms."""
        if isinstance(terms, pa.ChunkedArray):
            terms = terms.combine_chunks()
        if len(terms) == 0:
            return pa.array([], type=pa.string())
        enc = terms.dictionary_encode()
        uniq = np.asarray(enc.dictionary.to_pylist(), dtype=object)
        lemmas = pa.array(self.lemmatize_unique(uniq), type=pa.string())
        return lemmas.take(enc.indices)

    def lemmatize_list(self, forms: list[str]) -> list[str]:
        return list(self.lemmatize_unique(np.asarray(forms, dtype=object)))


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def lemma_sql_expr(
    col: str,
    exceptions: dict[str, str] | None = None,
    rules: list[tuple[str, str, int]] | None = None,
) -> str:
    """DuckDB expression computing lemma(``col``) with IDENTICAL
    semantics — generated from the same tables, so the oracle can't
    drift from the Python model."""
    exceptions = DEFAULT_EXCEPTIONS if exceptions is None else exceptions
    rules = DEFAULT_RULES if rules is None else rules
    branches: list[str] = []
    for form in sorted(exceptions):
        branches.append(
            f"WHEN {col} = {_sql_quote(form)} THEN {_sql_quote(exceptions[form])}"
        )
    for suffix, repl, min_len in rules:
        cond = f"len({col}) >= {max(min_len, len(suffix))} AND suffix({col}, {_sql_quote(suffix)})"
        if repl:
            val = f"substr({col}, 1, len({col}) - {len(suffix)}) || {_sql_quote(repl)}"
        else:
            val = f"substr({col}, 1, len({col}) - {len(suffix)})"
        if repl == suffix:  # stop rule
            val = col
        branches.append(f"WHEN {cond} THEN {val}")
    return "CASE " + " ".join(branches) + f" ELSE {col} END"
