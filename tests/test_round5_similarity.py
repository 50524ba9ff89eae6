"""Round-5 ES similarity-module swaps (SearchEngine.search_lm):
LM Dirichlet, LM Jelinek-Mercer and DFI ranked from the SAME postings
as BM25, per-term e6 fixed-point (integer-exact, order-safe).

Tests compare the engine against an independent pure-Python
brute-force over a tiny planted corpus (tokenizer replicated inline),
so the contract holds independently of the DuckDB oracle sweep."""

import math
import re

import numpy as np
import pyarrow as pa
import pytest

TOK = re.compile(r"[^a-z0-9_]+")
TERMS = ["spark", "vector", "window"]

TEXTS = [
    "spark spark spark window fast engine",
    "vector vector window on the grid today",
    "spark and vector and window all three here",
    "nothing relevant in this one at all",
    "window",                                   # dl=1 edge
    "spark " * 20 + "tail",                     # heavy tf
]


def _brute(similarity, mu=2000.0, lam=0.1):
    docs = [[t for t in TOK.split(s.lower()) if t] for s in TEXTS]
    T = sum(len(d) for d in docs)
    cf = {q: sum(d.count(q) for d in docs) for q in TERMS}
    out = {}
    for i, d in enumerate(docs):
        dl = len(d)
        s = 0
        for q in TERMS:
            tf = d.count(q)
            if tf == 0 or cf[q] == 0:
                continue
            p = cf[q] / T
            if similarity == "lm_dirichlet":
                val = math.log(1.0 + tf / (mu * p)) \
                    + math.log(mu / (dl + mu))
            elif similarity == "lm_jm":
                val = math.log(1.0 + ((1.0 - lam) / lam) * (tf / dl) / p)
            else:                                # dfi
                e = (dl * cf[q]) / T
                val = (tf - e) / math.sqrt(e)
            s += max(0, int(math.floor(val * 1_000_000 + 0.5)))
        if any(q in d for q in TERMS):
            out[i + 1] = s
    return sorted(out.items(), key=lambda kv: (-kv[1], kv[0]))


@pytest.fixture(scope="module")
def lm_engine(ray_session, tmp_path_factory):
    import pyarrow.parquet as pq

    from onestools_eventlog_ray.config import EngineConfig
    from onestools_eventlog_ray.pipelines.build import build_index
    from onestools_eventlog_ray.pipelines.query import SearchEngine
    from onestools_eventlog_ray.sources.corpus import DOCUMENTS_SPEC

    root = tmp_path_factory.mktemp("simswap")
    corpus = str(root / "docs.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(1, len(TEXTS) + 1), pa.int64()),
        "text": pa.array(TEXTS),
        "lang": pa.array(["en"] * len(TEXTS)),
        "source": pa.array(["t"] * len(TEXTS)),
        "n_chars": pa.array([len(t) for t in TEXTS], pa.int64()),
    }), corpus)
    idx = str(root / "idx")
    build_index(corpus, idx, spec=DOCUMENTS_SPEC,
                cfg=EngineConfig(num_partitions=4))
    return SearchEngine(idx)


@pytest.mark.parametrize("similarity", ["lm_dirichlet", "lm_jm", "dfi"])
def test_search_lm_matches_brute_force(lm_engine, similarity):
    expect = _brute(similarity)
    got = lm_engine.search_lm(TERMS, k=10, similarity=similarity)
    assert got == expect


def test_search_lm_bounded_k(lm_engine):
    expect = _brute("lm_dirichlet")[:2]
    assert lm_engine.search_lm(TERMS, k=2) == expect


def test_search_lm_missing_term_and_unknown_model(lm_engine):
    assert lm_engine.search_lm(["zzz_absent"], k=5) == []
    with pytest.raises(ValueError):
        lm_engine.search_lm(TERMS, similarity="bm42")


def test_search_lm_dirichlet_clamps_long_doc(lm_engine):
    # doc 5 ("window", dl=1) scores ln(1+1/(mu p)) + ln(mu/(1+mu));
    # a doc with tf=1 of a common term and huge dl would clamp to 0 —
    # assert no negative score ever escapes
    for sim in ["lm_dirichlet", "lm_jm", "dfi"]:
        assert all(s >= 0 for _, s in lm_engine.search_lm(TERMS, 10, sim))
