"""End-to-end golden run (SURVEY.md §5.2-5.3): synthetic corpus ->
build_index -> reference query set -> rank-identical to the brute-force
oracle; per-row content sha256 invariant; WAND == TAAT; Ray batch-query
stage == driver-side scorer.
"""

import glob

import numpy as np
import pyarrow.parquet as pq
import pytest

from onestools_eventlog_ray import synth
from onestools_eventlog_ray.config import EngineConfig
from onestools_eventlog_ray.functions.bm25 import BruteForceBM25
from onestools_eventlog_ray.functions.hashing import doc_id_from_keys
from onestools_eventlog_ray.pipelines.build import build_index, docstore_path
from onestools_eventlog_ray.pipelines.query import SearchEngine, score_queries

CFG = EngineConfig(num_partitions=8, tokenize_batch_size=128)


@pytest.fixture(scope="module")
def built(tmp_path_factory, small_corpus_dir):
    index_dir = str(tmp_path_factory.mktemp("index"))
    report = build_index(small_corpus_dir, index_dir, cfg=CFG)
    return index_dir, report


@pytest.fixture(scope="module")
def oracle(small_corpus):
    ids = doc_id_from_keys(small_corpus["repo"], small_corpus["path"],
                           small_corpus["commit"]).to_pylist()
    return BruteForceBM25(ids, small_corpus["content"].to_pylist())


def test_build_report(built, small_corpus):
    _, report = built
    assert report["n_docs"] == small_corpus.num_rows
    assert report["num_partitions"] == CFG.num_partitions
    assert report["files_per_sec"] > 0


def test_sha256_per_row_invariant(built, small_corpus):
    """input_hint invariant: docstore sha256 == recomputation on raw input."""
    import hashlib
    index_dir, _ = built
    files = glob.glob(docstore_path(index_dir) + "/*.parquet")
    store = pq.read_table(files, columns=["doc_id", "content", "content_sha256"])
    assert store.num_rows == small_corpus.num_rows
    expected = {}
    ids = doc_id_from_keys(small_corpus["repo"], small_corpus["path"],
                           small_corpus["commit"]).to_pylist()
    for i, text in zip(ids, small_corpus["content"].to_pylist()):
        expected[i] = hashlib.sha256(text.encode()).hexdigest()
    for doc_id, content, sha in zip(store["doc_id"].to_pylist(),
                                    store["content"].to_pylist(),
                                    store["content_sha256"].to_pylist()):
        assert sha == expected[doc_id]
        assert hashlib.sha256(content.encode()).hexdigest() == sha


def test_df_and_stats_match_oracle(built, oracle):
    index_dir, report = built
    assert report["n_docs"] == oracle.N
    assert abs(report["avgdl"] - oracle.avgdl) < 1e-9
    eng = SearchEngine(index_dir)
    for term in ["def", "the", "license", "v000000000000_nope"]:
        hit = eng.load_terms([term]).get(term)
        assert (hit[0] if hit else 0) == oracle.df(term)


def test_topk_rank_identical_to_oracle(built, small_corpus, oracle):
    index_dir, _ = built
    eng = SearchEngine(index_dir)
    queries = synth.reference_queries(small_corpus, n_queries=50)
    for q in queries:
        want = oracle.search(q["terms"], q["k"])
        got = eng.search(q["terms"], q["k"])
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (_, gs), (_, ws) in zip(got, want):
            assert gs == pytest.approx(ws, rel=1e-9)


def test_wand_equals_taat(built, small_corpus):
    index_dir, _ = built
    eng = SearchEngine(index_dir)
    queries = synth.reference_queries(small_corpus, n_queries=50)
    for q in queries:
        taat = eng.search(q["terms"], q["k"])
        wand = eng.search_wand(q["terms"], q["k"])
        assert [d for d, _ in wand] == [d for d, _ in taat], q
        for (_, ws), (_, ts) in zip(wand, taat):
            assert ws == ts  # bit-identical accumulation order


def test_ray_batch_query_stage(built, small_corpus, oracle):
    index_dir, _ = built
    queries = synth.reference_queries(small_corpus, n_queries=12)
    out = score_queries(index_dir, queries, concurrency=(1, 2)).take_all()
    by_q: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    for q in queries:
        want = oracle.search(q["terms"], q["k"])
        got = by_q.get(q["query_id"], [])
        assert [d for d, _ in got] == [d for d, _ in want]


def test_ray_batch_query_stage_tasks_impl(built, small_corpus, oracle):
    """Stateless-task scorer (per-worker engine cache) == actor pool."""
    index_dir, _ = built
    queries = synth.reference_queries(small_corpus, n_queries=12)
    out = score_queries(index_dir, queries, impl="tasks").take_all()
    by_q: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    eng = SearchEngine(index_dir)
    for q in queries:
        want = oracle.search(q["terms"], q["k"])
        got = by_q.get(q["query_id"], [])
        assert [d for d, _ in got] == [d for d, _ in want]
        # bit-identical to the driver-side engine (same code path)
        assert got == eng.search(q["terms"], q["k"])


def test_zero_hit_query(built):
    index_dir, _ = built
    eng = SearchEngine(index_dir)
    assert eng.search(["zzz_nohit_0"], 10) == []
    assert eng.search_wand(["zzz_nohit_0"], 10) == []
