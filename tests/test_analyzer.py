"""Tokenizer golden streams + triple-table correctness (SURVEY.md §5.1)."""

import pyarrow as pa

from onestools_eventlog_ray.functions.analyzer import (doc_term_table,
                                                       tokenize_array,
                                                       tokenize_py)

GOLDEN = [
    ("def foo_bar(x): return x + 1", ["def", "foo_bar", "x", "return", "x", "1"]),
    ("Hello, WORLD!!", ["hello", "world"]),
    ("", []),
    ("   \t\n ", []),
    ("a;;b--c__d", ["a", "b", "c__d"]),
    ("CamelCase stays camelcase", ["camelcase", "stays", "camelcase"]),
    ("x1 2y _z", ["x1", "2y", "_z"]),
]


def test_golden_token_streams():
    arr = pa.array([s for s, _ in GOLDEN])
    got = tokenize_array(arr).to_pylist()
    for (s, want), g in zip(GOLDEN, got):
        assert g == want, s
        assert tokenize_py(s) == want, s  # py + arrow tokenizers agree


def test_tokenizers_agree_on_synth():
    from onestools_eventlog_ray import synth
    tbl = synth.generate_corpus(30, seed=7)
    arrow_toks = tokenize_array(tbl["content"]).to_pylist()
    for text, at in zip(tbl["content"].to_pylist(), arrow_toks):
        assert at == tokenize_py(text)


def test_doc_term_table_counts():
    docs = pa.array([100, 200, 300])
    content = pa.array(["a b a c", "", "b b b"])
    triples, stats = doc_term_table(docs, content)
    t = {(r["term"], r["doc_id"]): (r["tf"], r["dl"])
         for r in triples.to_pylist()}
    assert t == {("a", 100): (2, 4), ("b", 100): (1, 4), ("c", 100): (1, 4),
                 ("b", 300): (3, 3)}
    s = {r["doc_id"]: (r["n_tokens"], r["n_distinct_terms"])
         for r in stats.to_pylist()}
    assert s == {100: (4, 3), 200: (0, 0), 300: (3, 1)}
