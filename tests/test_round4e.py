"""Round-4e: ES JSON query-DSL front end — clause-by-clause score
equivalence against the engine primitives."""

import numpy as np
import pytest

import ray

from onestools_eventlog_ray import synth
from onestools_eventlog_ray.config import EngineConfig
from onestools_eventlog_ray.functions import codec
from onestools_eventlog_ray.pipelines.build import build_index
from onestools_eventlog_ray.pipelines.dsl import DslError, es_search, _parse
from onestools_eventlog_ray.pipelines.query import (SearchEngine,
                                                    search_dsl,
                                                    search_pinned)


@pytest.fixture(scope="module")
def eng(tmp_path_factory):
    root = tmp_path_factory.mktemp("dsl")
    corpus = str(root / "corpus")
    index = str(root / "index")
    synth.write_corpus(corpus, n_docs=400, seed=17)
    build_index(corpus, index, cfg=EngineConfig(num_partitions=4))
    return SearchEngine(index)


def _pairs(tbl):
    return list(zip(tbl["doc_id"].to_pylist(),
                    tbl["score_e6"].to_pylist()))


def _e6(hits):
    return [(d, int(np.floor(s * 1_000_000 + 0.5))) for d, s in hits]


def test_dsl_match_equals_search(eng):
    out = es_search(eng, {"match": {"content": "def import"}}, k=10)
    assert _pairs(out) == _e6(eng.search(["def", "import"], 10))


def test_dsl_match_boost(eng):
    out = es_search(eng, {"match": {"content": {"query": "def import",
                                                "boost": 2.0}}}, k=10)
    exp = search_dsl(eng, ["def", "import"],
                     boosts={"def": 2.0, "import": 2.0}, k=10)
    assert _pairs(out) == _e6(exp)


def test_dsl_bool_must_gates_ranking(eng):
    q = {"bool": {"must": [{"match": {"content": "def"}}],
                  "should": [{"match": {"content": "import"}}]}}
    out = es_search(eng, q, k=10)
    loaded = eng.load_terms(["def"])
    allowed = codec.decode_posting(loaded["def"][1]).doc_ids
    exp = eng.search(["def", "import"], 10,
                     allowed=np.asarray(allowed, dtype=np.int64))
    assert _pairs(out) == _e6(exp)


def test_dsl_bool_must_not(eng):
    q = {"bool": {"should": [{"match": {"content": "def import"}}],
                  "must_not": [{"match": {"content": "return"}}]}}
    out = es_search(eng, q, k=10)
    loaded = eng.load_terms(["return"])
    exc = codec.decode_posting(loaded["return"][1]).doc_ids
    exp = eng.search(["def", "import"], 10,
                     excluded=np.asarray(exc, dtype=np.int64))
    assert _pairs(out) == _e6(exp)
    assert not set(d for d, _ in _pairs(out)) & set(exc.tolist())


def test_dsl_filter_equals_search_filtered(eng):
    lang = eng.fetch_docs([eng.search(["def"], 1)[0][0]],
                          columns=["doc_id", "lang"])["lang"][0].as_py()
    q = {"bool": {"should": [{"match": {"content": "def import"}}],
                  "filter": [{"term": {"lang": lang}}]}}
    out = es_search(eng, q, k=10)
    exp = eng.search_filtered(["def", "import"], {"lang": lang}, 10)
    assert _pairs(out) == _e6(exp)


def test_dsl_range_filter(eng):
    q = {"bool": {"should": [{"match": {"content": "def"}}],
                  "filter": [{"range": {"n_tokens": {"gte": 0,
                                                     "lte": 1 << 60}}}]}}
    # unconstrained range == plain search (every doc passes)
    out = es_search(eng, q, k=10)
    exp = eng.search_filtered(["def"], {"n_tokens": (0, 1 << 60)}, 10)
    assert _pairs(out) == _e6(exp)


def test_dsl_dis_max(eng):
    q = {"dis_max": {"queries": [{"match": {"content": "def"}},
                                 {"match": {"content": "import"}}],
                     "tie_breaker": 0.3}}
    out = es_search(eng, q, k=10)
    exp = search_dsl(eng, ["def", "import"],
                     boosts={"def": 1.0, "import": 1.0},
                     mode="max", tie_breaker=0.3, k=10)
    assert _pairs(out) == _e6(exp)


def test_dsl_pinned(eng):
    organic = eng.search(["def", "import"], 6)
    pins = [organic[3][0], organic[0][0]]
    q = {"pinned": {"ids": pins,
                    "organic": {"match": {"content": "def import"}}}}
    out = es_search(eng, q, k=10)
    exp = search_pinned(eng, ["def", "import"], pins, k=10)
    assert _pairs(out) == list(zip(exp["doc_id"].to_pylist(),
                                   exp["score_e6"].to_pylist()))


def test_dsl_msm(eng):
    q = {"bool": {"should": [{"match": {"content": "def import"}}],
                  "minimum_should_match": 2}}
    out = es_search(eng, q, k=10)
    exp = search_dsl(eng, ["def", "import"], minimum_should_match=2,
                     k=10)
    assert _pairs(out) == _e6(exp)


def test_dsl_rejects_unknown(eng):
    with pytest.raises(DslError):
        _parse({"knn": {"field": "v"}})
    with pytest.raises(DslError):
        _parse({"match": {"a": "x", "b": "y"}})
