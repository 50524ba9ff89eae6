"""Round-5: ES 8.14 retriever tree — generic N-child reciprocal-rank
fusion (``rrf_fuse``) plus the 3-way bm25 + knn + sparse_vector tree
(``retriever_tree``) checked against a brute-force fold at sf0.001."""

import numpy as np
import pytest

from onestools_eventlog_ray.pipelines.hybrid import rrf_fuse

SF_DIR = "/root/testdata/sf0.001"


def test_rrf_fuse_two_children_hand_computed():
    t = rrf_fuse({"a": {7: 1, 5: 2}, "b": {5: 1, 9: 2}}, k=10, c=60)
    # 5: 1e9//62 + 1e9//61 ; 7: 1e9//61 ; 9: 1e9//62
    want = {5: 10**9 // 62 + 10**9 // 61, 7: 10**9 // 61, 9: 10**9 // 62}
    assert t["doc_id"].to_pylist() == [5, 7, 9]
    assert t["rrf_e9"].to_pylist() == [want[5], want[7], want[9]]
    assert t["a_rank"].to_pylist() == [2, 1, None]
    assert t["b_rank"].to_pylist() == [1, None, 2]
    assert t["rank"].to_pylist() == [1, 2, 3]


def test_rrf_fuse_tie_breaks_on_doc_id():
    t = rrf_fuse({"a": {3: 1, 1: 2}, "b": {1: 1, 3: 2}}, k=10)
    # identical fused scores -> doc_id ascending
    assert t["doc_id"].to_pylist() == [1, 3]
    assert t["rrf_e9"].to_pylist()[0] == t["rrf_e9"].to_pylist()[1]


def test_rrf_fuse_k_cut_and_empty():
    t = rrf_fuse({"a": {i: i for i in range(1, 30)}}, k=5)
    assert t.num_rows == 5
    assert rrf_fuse({}, k=5).num_rows == 0
    assert rrf_fuse({"a": {}}, k=5).num_rows == 0


@pytest.fixture(scope="module")
def tree_result(ray_session, tmp_path_factory):
    import ray.data
    from onestools_eventlog_ray.pipelines.hybrid import retriever_tree
    from onestools_eventlog_ray.pipelines.query import SearchEngine
    from onestools_eventlog_ray.pipelines.sparse import SparseEngine
    import __ray_entry__ as E
    idx = E._ensure_impacts(SF_DIR)
    emb = ray.data.read_parquet(SF_DIR + "/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    eng, sp = SearchEngine(idx), SparseEngine(idx)
    t = retriever_tree(eng, sp, emb, E._BM25_TERMS, E._SPARSE_QW,
                       query_vec_id=0, k=10, window=50)
    return t, eng, sp, emb


def test_retriever_tree_equals_brute_fold(tree_result):
    from onestools_eventlog_ray.pipelines.hybrid import (bm25_ranks,
                                                         knn_ranks)
    import __ray_entry__ as E
    t, eng, sp, emb = tree_result
    comp = {
        "bm25": bm25_ranks(eng, E._BM25_TERMS, 50),
        "knn": knn_ranks(emb, 0, 50),
        "sparse": {int(d): r for r, (d, _) in
                   enumerate(sp.search(E._SPARSE_QW, k=50), 1)},
    }
    scores = {}
    for m in comp.values():
        for d, r in m.items():
            scores[d] = scores.get(d, 0) + 10**9 // (60 + r)
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert t["doc_id"].to_pylist() == [d for d, _ in want]
    assert t["rrf_e9"].to_pylist() == [s for _, s in want]
    assert t.column_names == ["rank", "doc_id", "rrf_e9",
                              "bm25_rank", "knn_rank", "sparse_rank"]


def test_retriever_tree_children_really_contribute(tree_result):
    """Each child must place at least one doc in the fused top-10 rank
    columns — guards against a silently-empty component."""
    t = tree_result[0]
    for col in ("bm25_rank", "knn_rank", "sparse_rank"):
        assert any(v is not None for v in t[col].to_pylist()), col
