"""Round-5: ColBERT-style late-interaction MaxSim with the symbolic
trigram-Jaccard kernel — kernel unit tests + brute-force parity of the
streaming scorer and the expansion type table on the synthetic corpus."""

import collections

import numpy as np
import pytest

from onestools_eventlog_ray.functions.analyzer import tokenize_py
from onestools_eventlog_ray.pipelines.lateinteraction import (
    MaxSimScorer, maxsim_topk, query_term_expansions, trigram_jaccard_e6,
    trigrams)

Q = ["vectors", "windowed", "streaming"]


def test_trigram_kernel_hand_values():
    assert trigrams("abc") == frozenset({"abc"})
    assert trigrams("ab") == frozenset({"ab"})
    assert trigrams("abcd") == frozenset({"abc", "bcd"})
    # vectors {vec,ect,cto,tor,ors} vs vector {vec,ect,cto,tor}
    assert trigram_jaccard_e6("vectors", "vector") == 1_000_000 * 4 // 5
    assert trigram_jaccard_e6("vectors", "vectors") == 1_000_000
    assert trigram_jaccard_e6("vectors", "window") == 0
    assert trigram_jaccard_e6("ab", "ab") == 1_000_000  # short-term path


def _brute(corpus, query_terms, k=10):
    from onestools_eventlog_ray.sources.corpus import CODE_CORPUS_SPEC
    from onestools_eventlog_ray.stages.normalize import add_doc_id
    b = add_doc_id(corpus, CODE_CORPUS_SPEC)
    scores = {}
    for did, text in zip(b["doc_id"].to_pylist(), b["content"].to_pylist()):
        types = set(tokenize_py(text))
        s = sum(max((trigram_jaccard_e6(qt, t) for t in types), default=0)
                for qt in query_terms)
        if s > 0:
            scores[did] = s
    return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


def test_maxsim_topk_matches_brute_force(ray_session, small_corpus,
                                         small_corpus_dir):
    t = maxsim_topk(small_corpus_dir, Q, k=10)
    want = _brute(small_corpus, Q, k=10)
    assert list(zip(t["doc_id"].to_pylist(),
                    t["maxsim_e6"].to_pylist())) == want
    assert t["rank"].to_pylist() == list(range(1, len(want) + 1))


def test_maxsim_exact_token_dominates(ray_session, small_corpus,
                                      small_corpus_dir):
    """A query term that IS a corpus token scores 1e6 for every doc
    containing it — soft matches never outrank an exact match."""
    t = maxsim_topk(small_corpus_dir, ["import"], k=5)
    assert t.num_rows == 5
    assert all(s == 1_000_000 for s in t["maxsim_e6"].to_pylist())


def test_scorer_batch_split_invariance(small_corpus):
    """MaxSim over one batch == concatenation of per-slice batches —
    the docs-are-batch-disjoint contract."""
    from onestools_eventlog_ray.config import EngineConfig
    from onestools_eventlog_ray.sources.corpus import CODE_CORPUS_SPEC
    sc = MaxSimScorer(Q, CODE_CORPUS_SPEC,
                      EngineConfig().token_split_pattern)
    whole = sc(small_corpus).to_pydict()
    parts = collections.defaultdict(int)
    for lo in range(0, small_corpus.num_rows, 37):
        p = sc(small_corpus.slice(lo, 37)).to_pydict()
        for d, s in zip(p["doc_id"], p["maxsim_e6"]):
            assert parts[d] == 0          # each doc in exactly one slice
            parts[d] = s
    assert dict(zip(whole["doc_id"], whole["maxsim_e6"])) == dict(parts)
    assert len(sc._sim_cache) > 0         # type memo actually populated


def test_expansions_match_brute_force(ray_session, small_corpus,
                                      small_corpus_dir):
    t = query_term_expansions(small_corpus_dir, Q).to_pydict()
    vocab = set()
    from onestools_eventlog_ray.sources.corpus import CODE_CORPUS_SPEC
    from onestools_eventlog_ray.stages.normalize import add_doc_id
    for text in add_doc_id(small_corpus,
                           CODE_CORPUS_SPEC)["content"].to_pylist():
        vocab.update(tokenize_py(text))
    want = sorted((qt, v, trigram_jaccard_e6(qt, v))
                  for v in vocab for qt in Q
                  if trigram_jaccard_e6(qt, v) >= 1)
    got = sorted(zip(t["qterm"], t["term"], t["sim_e6"]))
    assert got == want and len(got) > 0


def test_rerank_by_maxsim_two_stage(ray_session, small_corpus_dir,
                                    tmp_path):
    """Reranked result must (a) be a subset of the first-stage window,
    (b) be ordered by (maxsim desc, first-stage rank asc), (c) match a
    brute-force rescoring of the window."""
    from onestools_eventlog_ray.config import EngineConfig
    from onestools_eventlog_ray.functions.analyzer import tokenize_py
    from onestools_eventlog_ray.pipelines.build import build_index
    from onestools_eventlog_ray.pipelines.lateinteraction import (
        rerank_by_maxsim, trigram_jaccard_e6)
    from onestools_eventlog_ray.pipelines.query import SearchEngine
    idx = str(tmp_path / "rrk")
    build_index(small_corpus_dir, idx, cfg=EngineConfig(num_partitions=8))
    eng = SearchEngine(idx)
    qterms = ["defs", "importing"]
    t = rerank_by_maxsim(eng, ["def", "import"], qterms, k=10, window=25)
    window = eng.search(["def", "import"], k=25, tie="e6")
    wids = [int(d) for d, _ in window]
    fr = {d: r for r, d in enumerate(wids, 1)}
    assert set(t["doc_id"].to_pylist()) <= set(wids)
    docs = eng.fetch_docs(wids, columns=["doc_id", "content"])
    want = []
    for did, text in zip(docs["doc_id"].to_pylist(),
                         docs["content"].to_pylist()):
        types = set(tokenize_py(text))
        s = sum(max((trigram_jaccard_e6(qt, x) for x in types), default=0)
                for qt in qterms)
        want.append((did, s))
    want.sort(key=lambda x: (-x[1], fr[x[0]]))
    want = want[:10]
    assert list(zip(t["doc_id"].to_pylist(),
                    t["maxsim_e6"].to_pylist())) == want
    assert t["first_stage_rank"].to_pylist() == [fr[d] for d, _ in want]


def test_maxsim_indexed_rank_identical_to_scan(ray_session,
                                               small_corpus_dir,
                                               tmp_path):
    """The df-bounded indexed path must be rank-identical to the
    zero-index streaming scan — the factorization contract."""
    from onestools_eventlog_ray.config import EngineConfig
    from onestools_eventlog_ray.pipelines.build import build_index
    from onestools_eventlog_ray.pipelines.lateinteraction import \
        maxsim_topk_indexed
    from onestools_eventlog_ray.pipelines.query import SearchEngine
    idx = str(tmp_path / "msi")
    build_index(small_corpus_dir, idx, cfg=EngineConfig(num_partitions=8))
    qterms = ["defs", "importing", "classy"]
    scan = maxsim_topk(small_corpus_dir, qterms, k=10)
    indexed = maxsim_topk_indexed(SearchEngine(idx), qterms, k=10)
    assert indexed.equals(scan)
    # no kernel hits at all -> empty, both paths
    assert maxsim_topk_indexed(SearchEngine(idx),
                               ["zzzqqq"], k=5).num_rows == 0
