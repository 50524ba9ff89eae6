"""Round-5 session-4: full Lucene query_string — parser shapes, boolean
matching, Lucene PhraseQuery scoring, boost distribution, error modes."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

TEXTS = ["spark table hash join", "table hash value spark",
         "value dup spark", "table value", "spark value extra",
         "hash table value"]
LANGS = ["de", "de", "de", "en", "de", "de"]


@pytest.fixture(scope="module")
def qs_index(ray_session, tmp_path_factory):
    from onestools_eventlog_ray.config import EngineConfig
    from onestools_eventlog_ray.pipelines.build import build_index
    from onestools_eventlog_ray.pipelines.phrase import (
        PhraseEngine, build_position_index)
    from onestools_eventlog_ray.pipelines.query import SearchEngine
    from onestools_eventlog_ray.sources.corpus import DOCUMENTS_SPEC
    tmp = tmp_path_factory.mktemp("qs")
    corpus = str(tmp / "c.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(1, len(TEXTS) + 1), pa.int64()),
        "text": pa.array(TEXTS),
        "lang": pa.array(LANGS),
        "source": pa.array(["w"] * len(TEXTS)),
        "n_chars": pa.array([len(t) for t in TEXTS], pa.int64()),
    }), corpus)
    ix = str(tmp / "ix")
    build_index(corpus, ix, spec=DOCUMENTS_SPEC,
                cfg=EngineConfig(num_partitions=4))
    build_position_index(corpus, ix, spec=DOCUMENTS_SPEC,
                         cfg=EngineConfig(num_partitions=4))
    return SearchEngine(ix), PhraseEngine(ix)


def test_parser_precedence_and_fields():
    from onestools_eventlog_ray.pipelines.dsl import parse_query_string
    ast = parse_query_string("a AND b OR c")
    # AND binds tighter: (a AND b) OR c
    assert ast[0] == "or" and ast[1][0][0] == "and"
    ast = parse_query_string('lang:de AND "x y"^3')
    assert ast[1][0] == ("term", "lang", "de", 1.0)
    assert ast[1][1] == ("phrase", "text", ["x", "y"], 3.0)


def test_parser_boost_distributes_over_groups():
    from onestools_eventlog_ray.pipelines.dsl import parse_query_string
    ast = parse_query_string("(a OR b)^2")
    assert ast == ("or", [("term", "text", "a", 2.0),
                          ("term", "text", "b", 2.0)])


def test_parser_default_operator():
    from onestools_eventlog_ray.pipelines.dsl import parse_query_string
    assert parse_query_string("a b")[0] == "or"
    assert parse_query_string("a b", default_operator="and")[0] == "and"
    # explicit NOT via adjacency is an AND even under default OR
    ast = parse_query_string("a NOT b")
    assert ast[0] == "and" and ast[1][1][0] == "not"


def test_parser_errors():
    from onestools_eventlog_ray.pipelines.dsl import (DslError,
                                                      parse_query_string)
    with pytest.raises(DslError):
        parse_query_string("(a OR b")
    with pytest.raises(DslError):
        parse_query_string("badfield:x")
    with pytest.raises((DslError, ValueError)):
        parse_query_string('a ^x')


def test_qs_phrase_and_filter_exact(qs_index):
    from onestools_eventlog_ray.pipelines.dsl import query_string_search
    eng, peng = qs_index
    t = query_string_search(
        eng, '(spark OR "table hash"^2) AND value AND NOT dup AND lang:de',
        k=10, peng=peng)
    got = list(zip(t["doc_id"].to_pylist(), t["score_e6"].to_pylist()))
    # brute force over the same corpus: leaf order spark, phrase, value
    from onestools_eventlog_ray.functions.bm25 import idf
    exp = []
    toks = [x.split() for x in TEXTS]
    dls = [len(x) for x in toks]
    N = len(TEXTS)
    avgdl = sum(dls) / N

    def df(term):
        return sum(term in x for x in toks)

    for i in range(N):
        pf = sum(1 for j in range(len(toks[i]) - 1)
                 if toks[i][j:j + 2] == ["table", "hash"])
        if LANGS[i] != "de" or "dup" in toks[i] or "value" not in toks[i]:
            continue
        if not ("spark" in toks[i] or pf):
            continue
        s = 0.0
        for term, boost in (("spark", 1.0), ("value", 1.0)):
            tf = toks[i].count(term)
            if tf:
                s += boost * idf(N, df(term)) * tf * 2.2 / (
                    tf + 1.2 * (0.25 + 0.75 * dls[i] / avgdl))
        if pf:
            s += 2.0 * (idf(N, df("table")) + idf(N, df("hash"))) \
                * pf * 2.2 / (pf + 1.2 * (0.25 + 0.75 * dls[i] / avgdl))
        exp.append((i + 1, int(np.floor(s * 1_000_000 + 0.5))))
    exp.sort(key=lambda x: (-x[1], x[0]))
    assert got == exp and len(got) == 2


def test_qs_or_branch_still_scores(qs_index):
    # doc matching via one OR branch still collects the other branch's
    # score when it also contains that term (Lucene BooleanScorer)
    from onestools_eventlog_ray.pipelines.dsl import query_string_search
    eng, peng = qs_index
    both = query_string_search(eng, "spark OR extra", k=10, peng=peng)
    only = query_string_search(eng, "spark", k=10, peng=peng)
    d5_both = dict(zip(both["doc_id"].to_pylist(),
                       both["score_e6"].to_pylist()))[5]
    d5_only = dict(zip(only["doc_id"].to_pylist(),
                       only["score_e6"].to_pylist()))[5]
    assert d5_both > d5_only


def test_qs_metadata_only_branch_zero_score(qs_index):
    from onestools_eventlog_ray.pipelines.dsl import query_string_search
    eng, peng = qs_index
    t = query_string_search(eng, "lang:en", k=10, peng=peng)
    assert t["doc_id"].to_pylist() == [4]
    assert t["score_e6"].to_pylist() == [0]


def test_qs_pure_not_rejected(qs_index):
    from onestools_eventlog_ray.pipelines.dsl import (DslError,
                                                      query_string_search)
    eng, peng = qs_index
    with pytest.raises(DslError):
        query_string_search(eng, "NOT spark AND NOT value", k=5, peng=peng)
    with pytest.raises(DslError):
        query_string_search(eng, "spark OR NOT value", k=5, peng=peng)
