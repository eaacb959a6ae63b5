"""ST1 morphology model: a genuinely stateful lemmatizer swapped into
the tokenizer actor slot, with df/cf oracles RECOMPUTED over lemmas
(VERDICT r3 item 8). Covers:

  * vectorized lemmatize ≡ scalar rule engine (property, random forms)
  * the DuckDB mirror ``lemma_sql_expr`` ≡ the Python model
  * ``build_index`` with ``BuildConfig.lemma_model``: engine df/cf per
    lemma == a plain-Python recount over lemmatized tokens
  * query-side parity: two surface forms sharing a lemma return the
    SAME result set (postings genuinely merged, df = union not sum)
  * rebuild without the model removes the artifact and restores
    surface-form semantics
"""

import numpy as np
import pyarrow as pa
import pytest

import search_engine_skillbox_ray as ses
from search_engine_skillbox_ray.functions.lemmatize import (
    DEFAULT_EXCEPTIONS,
    DEFAULT_RULES,
    DictLemmatizer,
    build_lemma_model,
    lemma_sql_expr,
    lemmatize_form,
)
from search_engine_skillbox_ray.functions.tokenize import tokenize
from search_engine_skillbox_ray.pipelines.build import BuildConfig

_VOCAB = [
    "row", "line", "data", "queries", "query", "classes", "tables",
    "table", "merging", "sorted", "filter", "order", "customer",
    "scan", "hash", "the", "a", "batch", "pass",
]


def generate_documents_table(n: int, seed: int) -> pa.Table:
    """Deterministic documents-shaped fixture (same schema as the
    driver's testdata) whose vocabulary triggers exceptions AND every
    suffix-rule family."""
    rng = np.random.default_rng(seed)
    texts = [
        " ".join(rng.choice(_VOCAB, size=int(rng.integers(5, 40))))
        for _ in range(n)
    ]
    return pa.table(
        {
            "doc_id": pa.array(range(n), type=pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * n),
            "source": pa.array([f"src{i % 3}" for i in range(n)]),
            "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
        }
    )


def _random_forms(n: int, seed: int) -> list[str]:
    rng = np.random.default_rng(seed)
    suffixes = ["", "s", "es", "ies", "sses", "ing", "ed", "er", "ss", "x"]
    stems = ["quer", "stud", "merg", "pass", "cla", "a", "bo", "tabl", "lin"]
    out = []
    for _ in range(n):
        out.append(
            str(rng.choice(stems)) + str(rng.choice(suffixes))
        )
    out += list(DEFAULT_EXCEPTIONS)  # always cover the exception table
    return out


def test_vectorized_matches_scalar(tmp_path):
    mp = build_lemma_model(tmp_path / "m.json")
    lem = DictLemmatizer(mp)
    forms = _random_forms(500, seed=7)
    vec = lem.lemmatize(pa.array(forms)).to_pylist()
    ref = [lemmatize_form(f, DEFAULT_EXCEPTIONS, DEFAULT_RULES) for f in forms]
    assert vec == ref
    # memo warm second pass identical
    assert lem.lemmatize(pa.array(forms)).to_pylist() == ref
    # empty input
    assert lem.lemmatize(pa.array([], type=pa.string())).to_pylist() == []


def test_sql_mirror_matches_python():
    import duckdb

    forms = sorted(set(_random_forms(800, seed=13)))
    con = duckdb.connect()
    con.execute("CREATE TABLE f(term VARCHAR)")
    con.executemany("INSERT INTO f VALUES (?)", [(t,) for t in forms])
    got = dict(
        con.execute(f"SELECT term, {lemma_sql_expr('term')} FROM f").fetchall()
    )
    for t in forms:
        assert got[t] == lemmatize_form(t, DEFAULT_EXCEPTIONS, DEFAULT_RULES), t


def test_rule_semantics_pinned():
    e, r = DEFAULT_EXCEPTIONS, DEFAULT_RULES
    assert lemmatize_form("row", e, r) == "line"  # exception beats rules
    assert lemmatize_form("data", e, r) == "datum"
    assert lemmatize_form("queries", e, r) == "query"
    assert lemmatize_form("classes", e, r) == "class"
    assert lemmatize_form("pass", e, r) == "pass"  # -ss stop rule
    assert lemmatize_form("tables", e, r) == "table"
    assert lemmatize_form("merging", e, r) == "merg"
    assert lemmatize_form("sorted", e, r) == "sort"
    assert lemmatize_form("filter", e, r) == "filt"
    assert lemmatize_form("as", e, r) == "as"  # below min_len, -s blocked
    assert lemmatize_form("ing", e, r) == "ing"


@pytest.fixture(scope="module")
def lemma_index(ray_session, tmp_path_factory):
    import ray.data as rd

    tbl = generate_documents_table(300, seed=23)
    docs = rd.from_arrow(tbl)
    idx = tmp_path_factory.mktemp("lemma_idx")
    mp = build_lemma_model(idx / "model_src.json")
    cfg = BuildConfig(
        n_buckets=4, lemma_model=str(mp), tokenize_concurrency=(1, 2),
        prep_concurrency=(1, 2),
    )
    ses.build_index_from_documents_table(docs, idx, cfg, input_token="lemma-test")
    return tbl, str(idx)


def test_build_with_lemma_model_df_cf(lemma_index):
    tbl, idx = lemma_index
    eng = ses.SearchEngine(idx, float32_scores=False)
    # recompute the oracle: per-lemma df/cf over the raw corpus
    df: dict[str, set] = {}
    cf: dict[str, int] = {}
    for row in tbl.to_pylist():
        for tok in tokenize(row["text"]):
            lem = lemmatize_form(tok, DEFAULT_EXCEPTIONS, DEFAULT_RULES)
            df.setdefault(lem, set()).add(row["doc_id"])
            cf[lem] = cf.get(lem, 0) + 1
    assert df, "fixture produced no tokens"
    for lem in sorted(df):
        d, tf, _ = eng.term_postings(lem)
        assert d.size == len(df[lem]), lem
        assert int(tf.sum()) == cf[lem], lem
    # raw surface forms that were rewritten must NOT exist as terms
    rewritten = [
        t
        for t in {tok for row in tbl.to_pylist() for tok in tokenize(row["text"])}
        if lemmatize_form(t, DEFAULT_EXCEPTIONS, DEFAULT_RULES) != t
    ]
    assert rewritten, "fixture vocabulary never triggers the model — weak test"
    for t in rewritten:
        d, _, _ = eng.term_postings(t)
        assert d.size == 0, t


def test_query_side_lemma_merge(lemma_index):
    _, idx = lemma_index
    eng = ses.SearchEngine(idx, float32_scores=False)
    d_row, s_row, lemmas = eng.search_scores("row")
    d_line, s_line, _ = eng.search_scores("line")
    assert lemmas == ["line"]
    assert np.array_equal(d_row, d_line)
    assert np.allclose(s_row, s_line)
    assert d_row.size > 0
    # df is the UNION of the two surface forms' doc sets, not the sum
    docs_union = set()
    tbl, _ = lemma_index
    for row in tbl.to_pylist():
        toks = set(tokenize(row["text"]))
        if "row" in toks or "line" in toks:
            docs_union.add(row["doc_id"])
    assert d_row.size == len(docs_union)


def test_rebuild_without_model_restores_surface_forms(
    ray_session, tmp_path_factory
):
    import ray.data as rd
    from pathlib import Path

    tbl = generate_documents_table(120, seed=29)
    idx = tmp_path_factory.mktemp("lemma_off")
    mp = build_lemma_model(idx / "m.json")
    ses.build_index_from_documents_table(
        rd.from_arrow(tbl), idx, BuildConfig(n_buckets=2, lemma_model=str(mp)),
        input_token="on",
    )
    assert (Path(idx) / "lemma_model.json").exists()
    ses.build_index_from_documents_table(
        rd.from_arrow(tbl), idx, BuildConfig(n_buckets=2), input_token="off"
    )
    assert not (Path(idx) / "lemma_model.json").exists()
    eng = ses.SearchEngine(str(idx), float32_scores=False)
    d, _, lemmas = eng.search_scores("row")
    assert lemmas == ["row"]
    expect = {r["doc_id"] for r in tbl.to_pylist() if "row" in set(tokenize(r["text"]))}
    assert set(d.tolist()) == expect
