"""Tokenizer parity with MorphologyServiceImpl (SURVEY §5.2) and the
Arrow-kernel path equivalence (the pipeline must match the scalar path)."""

import pyarrow as pa

from search_engine_skillbox_ray.functions.tokenize import (
    query_lemmas,
    query_tokens,
    term_frequencies,
    tokenize,
)
from search_engine_skillbox_ray.stages.tokenizer import token_counts, token_lists

CASES = [
    # Java: text.toLowerCase().split("\\P{L}+"), blanks dropped, dups kept
    ("Hello World", ["hello", "world"]),
    ("Hello, world!", ["hello", "world"]),
    ("a1b2c", ["a", "b", "c"]),  # digits are separators
    ("2024 год", ["год"]),
    ("ПрИвЕт МиР", ["привет", "мир"]),
    ("word word word", ["word", "word", "word"]),  # duplicates kept
    ("...leading", ["leading"]),
    ("trailing...", ["trailing"]),
    ("", []),
    ("   ", []),
    ("12345", []),
    ("under_score", ["under", "score"]),  # _ is a non-letter
    ("mixedТекстlatin", ["mixedтекстlatin"]),  # no script splitting
    ("don't", ["don", "t"]),
]


def test_tokenize_cases():
    for text, expected in CASES:
        assert tokenize(text) == expected, text


def test_arrow_kernel_parity():
    """RE2 [^\\p{L}]+ split path must equal the scalar path."""
    texts = [c[0] for c in CASES] + ["Ещё один ТЕСТ 42 here"]
    arr = pa.array(texts, pa.string())
    lists = token_lists(arr)
    for text, toks in zip(texts, lists.to_pylist()):
        assert [t for t in toks if t] == tokenize(text), text


def test_token_counts():
    texts = [c[0] for c in CASES]
    counts = token_counts(pa.array(texts, pa.string()))
    assert list(counts) == [len(tokenize(t)) for t in texts]


def test_term_frequencies():
    assert term_frequencies(tokenize("a b a c a b")) == {"a": 3, "b": 2, "c": 1}


def test_query_lemmas_distinct_ordered():
    # M9: distinct preserving first occurrence (SearchServiceImpl.java:73-79)
    assert query_lemmas("Data data MERGE data") == ["data", "merge"]
    assert query_lemmas("") == []
    assert query_lemmas("42 77") == []


def test_query_tokens_keep_digits():
    # M8 keeps digits, unlike the lemmatizer (SearchServiceImpl.java:187-193)
    assert query_tokens("win 42 times!") == ["win", "42", "times"]
    assert query_tokens("x-9,y") == ["x9y"]
    assert query_tokens("   ") == []


def test_doc_id_hash_value_determinism():
    """docIDs must depend ONLY on the url, not on batch context —
    regression for pandas hash_array(categorize=True), which hashes
    factorize codes and is NOT value-deterministic across arrays."""
    import numpy as np

    from search_engine_skillbox_ray.stages.tokenizer import assign_doc_ids, term_bucket

    a = assign_doc_ids(["https://x/a", "https://x/b"])
    b = assign_doc_ids(["https://x/b", "https://zzz/q", "https://x/a", "https://dup/d"])
    assert a[0] == b[2] and a[1] == b[0]
    t1 = term_bucket(["hello", "zzz"], 64)
    t2 = term_bucket(["other", "hello", "more", "words"], 64)
    assert t1[0] == t2[1]


def test_arrow_vs_python_tokenizer_property():
    """Property-style: RE2 kernel path ≡ Python re path over random
    strings from the supported alphabets (letters Latin+Cyrillic, digits,
    punctuation, whitespace)."""
    import numpy as np
    import pyarrow as pa

    from hypothesis import given, settings
    from hypothesis import strategies as st

    alphabet = st.sampled_from(list("abcXYZйцуЁёÄöß0123456789 .,-_!?/\t\n'\"«»"))

    @given(st.lists(st.text(alphabet=alphabet, max_size=40), min_size=1, max_size=20))
    @settings(max_examples=60, deadline=None)
    def check(texts):
        arr = pa.array(texts, pa.string())
        lists = token_lists(arr)
        for text, toks in zip(texts, lists.to_pylist()):
            assert [t for t in toks if t] == tokenize(text), repr(text)

    check()


def test_mod_mersenne61_equals_modulo_property():
    """The division-free Mersenne reduction must be bit-identical to
    uint64 ``%`` over the full value range (oracle SQL depends on it)."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from search_engine_skillbox_ray.functions.hashing import MERSENNE61, mod_mersenne61

    m = np.uint64(MERSENNE61)
    edges = np.array(
        [0, 1, MERSENNE61 - 1, MERSENNE61, MERSENNE61 + 1,
         2**61, 2**62, 2**63, 2**64 - 1],
        dtype=np.uint64,
    )
    assert (mod_mersenne61(edges) == edges % m).all()

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), min_size=1, max_size=64))
    def check(vals):
        x = np.array(vals, dtype=np.uint64)
        assert (mod_mersenne61(x) == x % m).all()

    check()
