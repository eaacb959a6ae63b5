"""Tokenization / "lemmatization" with reference parity (M2/M3/M8/M9).

Reference semantics
(/root/reference/src/main/java/searchengine/service/MorphologyServiceImpl.java:12-20):
``text.toLowerCase().split("\\P{L}+")`` then drop blanks — lowercase,
split on runs of NON-LETTERS (digits and punctuation are separators),
keep duplicates in order. Despite the name there is no stemming and no
stopword removal.

Two implementations with identical results on the supported alphabets:

* ``tokenize`` — scalar Python path for the query layer (driver-side).
* Arrow-kernel path used by the pipeline stages
  (:mod:`search_engine_skillbox_ray.stages.tokenizer`): RE2 pattern
  ``[^\\p{L}]+`` via ``pyarrow.compute.split_pattern_regex`` after
  ``utf8_lower`` — RE2's ``\\p{L}`` is exactly Java's ``\\p{L}``
  (Unicode categories Lu/Ll/Lt/Lm/Lo).

The Python ``re`` approximation ``[^\\W\\d_]`` matches Java ``\\p{L}``
for all Latin/Cyrillic/CJK letters; it additionally admits Nl/No
characters (e.g. Roman-numeral code points), which the golden tests
exclude — documented deviation, irrelevant for web text.

Query-side helpers mirror SearchServiceImpl:

* ``query_tokens`` (M8, SearchServiceImpl.java:187-193): split query on
  ``\\s+``, strip chars not in ``[\\p{L}\\p{Nd}]``, drop empties —
  KEEPS digits, unlike the lemmatizer.
* ``query_lemmas`` (M9, SearchServiceImpl.java:73-79): lemmatize the
  query then order-preserving distinct.
"""

from __future__ import annotations

import re
from collections import Counter

# Letters only: word chars minus digits minus underscore (see module doc).
_LETTER_RUN_RE = re.compile(r"[^\W\d_]+", re.UNICODE)
# M8: keep letters and decimal digits inside whitespace-split tokens.
_NON_WORD_CHAR_RE = re.compile(r"[^\W_]+", re.UNICODE)
_WS_SPLIT_RE = re.compile(r"\s+")

# RE2 pattern for the Arrow-kernel path (pyarrow / DuckDB share RE2).
RE2_NON_LETTER_SPLIT = r"[^\p{L}]+"


def tokenize(text: str) -> list[str]:
    """M2: lowercase + split on non-letter runs; duplicates kept in order."""
    if not text:
        return []
    return _LETTER_RUN_RE.findall(text.lower())


def term_frequencies(tokens: list[str]) -> dict[str, int]:
    """M3 (PageIndexingUtils.java:119-126): occurrence count per lemma."""
    return dict(Counter(tokens))


def query_lemmas(query: str) -> list[str]:
    """M9: lemmatize then order-preserving distinct (trim/lower implied)."""
    return list(dict.fromkeys(tokenize(query.strip())))


def query_tokens(query: str) -> list[str]:
    """M8: whitespace-split, strip non-[letter,digit] chars, drop empties.

    Used for snippet highlighting — keeps digits, unlike ``tokenize``.
    """
    out: list[str] = []
    for raw in _WS_SPLIT_RE.split(query.strip()):
        kept = "".join(_NON_WORD_CHAR_RE.findall(raw))
        if kept:
            out.append(kept)
    return out
