"""The explicit partition exchange (stages/exchange.py) must produce
byte-equivalent shards to the Dataset groupby path — same postings,
same manifest semantics, same query results."""

import pytest

from onestools_eventlog_ray import synth
from onestools_eventlog_ray.config import EngineConfig
from onestools_eventlog_ray.pipelines.build import build_index
from onestools_eventlog_ray.pipelines.query import SearchEngine
from tests.test_salt_equivalence import _load_all_postings


@pytest.fixture(scope="module")
def both_impls(tmp_path_factory, small_corpus_dir):
    hot = {t: 3 for t in ["def", "the", "license", "return"]}  # force salting
    dirs = {}
    for impl in ("raydata", "exchange"):
        d = str(tmp_path_factory.mktemp(f"idx_{impl}"))
        cfg = EngineConfig(num_partitions=8, postings_impl=impl)
        build_index(small_corpus_dir, d, cfg=cfg, hot_terms=hot)
        dirs[impl] = d
    return dirs


def test_shards_identical(both_impls):
    a = _load_all_postings(both_impls["raydata"])
    b = _load_all_postings(both_impls["exchange"])
    assert a.keys() == b.keys()
    for term in a:
        assert a[term] == b[term], term


def test_query_results_identical(both_impls, small_corpus):
    ea = SearchEngine(both_impls["raydata"])
    eb = SearchEngine(both_impls["exchange"])
    for q in synth.reference_queries(small_corpus, n_queries=25):
        assert ea.search(q["terms"], q["k"]) == eb.search(q["terms"], q["k"])


def test_exchange_resume(tmp_path, small_corpus_dir):
    import os
    from onestools_eventlog_ray.state import checkpoint as ckpt
    cfg = EngineConfig(num_partitions=8, postings_impl="exchange")
    index_dir = str(tmp_path / "idx")
    r1 = build_index(small_corpus_dir, index_dir, cfg=cfg)
    before = _load_all_postings(index_dir)
    for pid in (1, 4):
        os.remove(ckpt.record_path(index_dir, pid))
        shard = os.path.join(index_dir, "shards", f"part-{pid:05d}.parquet")
        if os.path.exists(shard):
            os.remove(shard)
    r2 = build_index(small_corpus_dir, index_dir, cfg=cfg)
    assert r2["resumed_partitions"] == 6
    assert _load_all_postings(index_dir) == before


def test_single_pass_combined_equivalent(tmp_path_factory, small_corpus_dir, small_corpus):
    """The single-pass combined build (fixed-range salting, re-encoded
    small postings) must produce postings EQUAL to the two-pass builds."""
    d_combined = str(tmp_path_factory.mktemp("idx_combined"))
    d_twopass = str(tmp_path_factory.mktemp("idx_twopass"))
    build_index(small_corpus_dir, d_combined,
                cfg=EngineConfig(num_partitions=8, single_pass=True,
                                 salt_ranges=8))
    build_index(small_corpus_dir, d_twopass,
                cfg=EngineConfig(num_partitions=8, single_pass=False))
    a = _load_all_postings(d_combined)
    b = _load_all_postings(d_twopass)
    assert a.keys() == b.keys()
    for term in a:
        assert a[term] == b[term], term
    ea, eb = SearchEngine(d_combined), SearchEngine(d_twopass)
    for q in synth.reference_queries(small_corpus, n_queries=20):
        ra = ea.search(q["terms"], q["k"])
        assert ra == eb.search(q["terms"], q["k"])
        assert ra == ea.search_wand(q["terms"], q["k"])
