"""Round-5: ES _msearch — N queries sharing one posting-load pass.
Asserts per-query identity with individual search() calls and that the
union load warms the term cache (no further shard reads per query)."""
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def ms_index(ray_session, tmp_path_factory):
    from onestools_eventlog_ray.config import EngineConfig
    from onestools_eventlog_ray.pipelines.build import build_index
    from onestools_eventlog_ray.sources.corpus import DOCUMENTS_SPEC

    root = tmp_path_factory.mktemp("msearch")
    corpus = str(root / "docs.parquet")
    texts = [
        "spark vector window spark",
        "vector window and more vector",
        "spark alone in this one",
        "window window window",
        "nothing relevant here",
        "spark vector",
    ]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * len(texts)),
        "source": pa.array(["t"] * len(texts)),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), corpus)
    idx = str(root / "idx")
    build_index(corpus, idx, spec=DOCUMENTS_SPEC, cfg=EngineConfig())
    return idx


def test_msearch_matches_individual_searches(ms_index):
    from onestools_eventlog_ray.pipelines.query import SearchEngine, msearch
    queries = [["spark", "vector", "window"], ["spark"],
               ["vector", "window"], ["absentterm"]]
    eng = SearchEngine(ms_index)
    got = msearch(eng, queries, k=3).to_pandas()
    fresh = SearchEngine(ms_index)
    for qi, terms in enumerate(queries):
        hits = fresh.search(terms, k=3, tie="e6")
        sub = got[got.query_id == qi].reset_index(drop=True)
        assert list(sub.doc_id) == [d for d, _ in hits]
        assert list(sub["rank"]) == list(range(1, len(hits) + 1))
        for e6, (_, s) in zip(sub.score_e6, hits):
            assert e6 == int(s * 1e6 + 0.5)


def test_msearch_single_load_pass(ms_index):
    """After the union load, per-query scoring must not touch parquet
    again: every queried term is already in the term cache."""
    from onestools_eventlog_ray.pipelines.query import SearchEngine, msearch

    eng = SearchEngine(ms_index)
    calls = []
    orig = eng.load_terms

    def spy(terms):
        calls.append(sorted(terms))
        return orig(terms)

    eng.load_terms = spy
    queries = [["spark", "vector"], ["window"], ["spark", "window"]]
    msearch(eng, queries, k=2)
    # one explicit union load; later loads may be issued by search()
    # but must be full cache hits (every term already cached)
    assert calls[0] == ["spark", "vector", "window"]
    cached = set(eng._cache.keys())
    for c in calls[1:]:
        assert set(c) <= cached
