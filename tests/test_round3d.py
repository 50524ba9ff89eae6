"""Round-3 session-4 operators: ES query-DSL parity (must_not,
more_like_this, prefix/fuzzy dictionary scans, facet aggregation,
significant_terms) and training-data text ops (denylist redaction,
unigram-LM scoring).

Brute-force parity checks only — oracle-SQL parity runs through
tools/check_oracle.py and the driver gate."""

import collections
import hashlib
import math
import os
import re

import numpy as np
import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _tok(text):
    return [t for t in re.split(r"[^a-z0-9_]+", text.lower()) if t]


@pytest.fixture(scope="module")
def docs_tbl():
    return pq.read_table(os.path.join(SF_DIR, "documents.parquet"))


@pytest.fixture(scope="module")
def index_dir():
    import __ray_entry__ as em
    return em._ensure_index(SF_DIR)


def _docs_ds():
    import ray.data
    return ray.data.read_parquet(os.path.join(SF_DIR, "documents.parquet"))


# ---------------------------------------------------------------------------
# fuzzy expansion
# ---------------------------------------------------------------------------

def _lev(a, b):
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                     prev + (ca != cb))
    return dp[-1]


@pytest.mark.parametrize("q", ["past", "spark", "stram", "a", "window"])
def test_fuzzy_expand_matches_bruteforce(index_dir, docs_tbl, q):
    from onestools_eventlog_ray.pipelines.query import fuzzy_expand
    vocab = collections.Counter()
    for t in docs_tbl["text"].to_pylist():
        vocab.update(_tok(t))
    expect = sorted(t for t in vocab if _lev(q, t) <= 1)
    got = sorted(r["term"] for r in fuzzy_expand(index_dir, q).take_all())
    assert got == expect


def test_lev_le1_helper_agrees_with_dp():
    from onestools_eventlog_ray.pipelines.query import _lev_le1
    words = ["", "a", "ab", "abc", "abd", "bbc", "abcd", "acbd", "xabc",
             "abcx", "axbc", "abc_", "zzz"]
    for a in words:
        for b in words:
            assert _lev_le1(a, b) == (_lev(a, b) <= 1), (a, b)


# ---------------------------------------------------------------------------
# must_not / facets
# ---------------------------------------------------------------------------

def test_search_not_excludes_negative_postings(index_dir, docs_tbl):
    from onestools_eventlog_ray.pipelines.query import SearchEngine
    eng = SearchEngine(index_dir)
    with_neg = {d for d, t in zip(docs_tbl["doc_id"].to_pylist(),
                                  docs_tbl["text"].to_pylist())
                if "vector" in _tok(t)}
    hits = eng.search_not(["spark"], ["vector"], k=10_000)
    assert hits, "query should match something"
    assert not ({d for d, _ in hits} & with_neg)
    # positive-term scores unchanged by the exclusion
    base = dict(eng.search(["spark"], k=10_000))
    for d, s in hits:
        assert s == base[d]


def test_facet_counts_bruteforce(index_dir, docs_tbl):
    from onestools_eventlog_ray.pipelines.query import facet_counts
    expect = collections.Counter()
    for d, t, lg, src in zip(docs_tbl["doc_id"].to_pylist(),
                             docs_tbl["text"].to_pylist(),
                             docs_tbl["lang"].to_pylist(),
                             docs_tbl["source"].to_pylist()):
        if "spark" in _tok(t):
            expect[(lg, src)] += 1
    got = {(r["lang"], r["source"]): r["n_docs"]
           for r in facet_counts(index_dir, "spark").take_all()}
    assert got == dict(expect)


def test_facet_counts_unknown_term_is_empty(index_dir):
    from onestools_eventlog_ray.pipelines.query import facet_counts
    assert facet_counts(index_dir, "zzz_no_such_term").take_all() == []


# ---------------------------------------------------------------------------
# redaction / LM scoring / significant terms
# ---------------------------------------------------------------------------

def test_redact_terms_bruteforce(docs_tbl):
    from onestools_eventlog_ray.pipelines.text import redact_terms
    from onestools_eventlog_ray.sources.corpus import DOCUMENTS_SPEC
    deny = {"the", "a", "big"}
    rows = redact_terms(_docs_ds(), DOCUMENTS_SPEC).take_all()
    got = {r["doc_id"]: r for r in rows}
    for d, t in zip(docs_tbl["doc_id"].to_pylist(),
                    docs_tbl["text"].to_pylist()):
        toks = _tok(t)
        kept = [x for x in toks if x not in deny]
        r = got[d]
        assert r["n_redacted"] == len(toks) - len(kept)
        assert r["n_kept"] == len(kept)
        assert r["scrubbed_md5"] == hashlib.md5(
            " ".join(kept).encode()).hexdigest()


def test_lm_scores_bruteforce(docs_tbl):
    from onestools_eventlog_ray.pipelines.text import lm_scores
    from onestools_eventlog_ray.sources.corpus import DOCUMENTS_SPEC
    cf = collections.Counter()
    for t in docs_tbl["text"].to_pylist():
        cf.update(_tok(t))
    total = sum(cf.values())
    lp = {w: int(math.floor(math.log(c / total) * 1_000_000 + 0.5))
          for w, c in cf.items()}
    got = {r["doc_id"]: r for r in
           lm_scores(_docs_ds(), DOCUMENTS_SPEC).take_all()}
    for d, t in zip(docs_tbl["doc_id"].to_pylist(),
                    docs_tbl["text"].to_pylist()):
        toks = _tok(t)
        assert got[d]["dl"] == len(toks)
        assert got[d]["sum_lp_e6"] == sum(lp[w] for w in toks)


def test_significant_terms_bruteforce(docs_tbl):
    from onestools_eventlog_ray.pipelines.text import significant_terms
    from onestools_eventlog_ray.sources.corpus import DOCUMENTS_SPEC
    df = collections.Counter()
    dfg = collections.Counter()
    n_docs = docs_tbl.num_rows
    n_fg = 0
    for t, lg in zip(docs_tbl["text"].to_pylist(),
                     docs_tbl["lang"].to_pylist()):
        toks = set(_tok(t))
        df.update(toks)
        if lg == "de":
            n_fg += 1
            dfg.update(toks)
    rows = [(w, dfg[w], df[w],
             (2 * dfg[w] * n_docs * 1_000_000 + n_fg * df[w])
             // (2 * n_fg * df[w]))
            for w in df if dfg[w] >= 5]
    rows.sort(key=lambda r: (-r[3], -r[1], r[0]))
    got = significant_terms(_docs_ds(), DOCUMENTS_SPEC,
                            fg_col="lang", fg_value="de").take_all()
    assert [(r["term"], r["df_fg"], r["df"], r["lift_e6"])
            for r in got] == rows[:10]


def test_mlt_terms_are_source_docs_terms(index_dir, docs_tbl):
    from onestools_eventlog_ray.pipelines.query import SearchEngine
    eng = SearchEngine(index_dir)
    src = docs_tbl["doc_id"][0].as_py()
    terms, hits = eng.more_like_this(src, n_terms=5, k=20)
    src_toks = set(_tok(docs_tbl["text"][0].as_py()))
    assert set(terms) <= src_toks and len(terms) == min(5, len(src_toks))
    assert all(d != src for d, _ in hits)
