"""Round-5 batch J: token-budget allocator + shard-balance audit."""

import numpy as np
import pyarrow as pa
import pytest


def _docs(texts, sources, ids=None):
    n = len(texts)
    return pa.table({
        "doc_id": pa.array(ids or list(range(n)), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * n),
        "source": pa.array(sources, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


def test_token_budget_plan_cap_and_shortfall(ray_session):
    import ray.data
    from onestools_eventlog_ray.pipelines.mix import token_budget_plan
    from onestools_eventlog_ray.sources.corpus import DOCUMENTS_SPEC
    # source a: 2 tokens, source b: 10 tokens; budget 40, cap 4 epochs
    # desired = 20 each; a caps at 4 epochs -> 8 tokens, shortfall 12;
    # b takes 2 epochs exactly -> 20 tokens, shortfall 0
    tbl = _docs(["x y", "a b c d e a b c d e"], ["a", "b"])
    rep = token_budget_plan(ray.data.from_arrow(tbl), budget_tokens=40,
                            spec=DOCUMENTS_SPEC, max_epochs=4)
    got = {r["source"]: r for r in rep.to_pylist()}
    a, b = got["a"], got["b"]
    assert a["n_tokens"] == 2 and b["n_tokens"] == 10
    assert a["desired_tokens"] == b["desired_tokens"] == 20
    assert a["epochs_e6"] == 4_000_000          # capped
    assert a["allocated_tokens"] == 8 and a["shortfall"] == 12
    assert b["epochs_e6"] == 2_000_000
    assert b["allocated_tokens"] == 20 and b["shortfall"] == 0


def test_token_budget_plan_empty_source(ray_session):
    import ray.data
    from onestools_eventlog_ray.pipelines.mix import token_budget_plan
    from onestools_eventlog_ray.sources.corpus import DOCUMENTS_SPEC
    tbl = _docs(["x y z", ""], ["a", "empty"])
    rep = token_budget_plan(ray.data.from_arrow(tbl), budget_tokens=10,
                            spec=DOCUMENTS_SPEC, max_epochs=2)
    got = {r["source"]: r for r in rep.to_pylist()}
    assert got["empty"]["epochs_e6"] == 0
    assert got["empty"]["allocated_tokens"] == 0
    assert got["empty"]["shortfall"] == got["empty"]["desired_tokens"]


def test_shard_balance_report(ray_session):
    import ray.data
    from onestools_eventlog_ray.pipelines.serving import \
        shard_balance_report
    # ids chosen so shard 0 holds 3 docs, shard 1 holds 1, shards 2/3
    # empty (n_shards=4); total=4 -> ceil cap 1 -> shard 0 moves 2
    tbl = _docs(["a b", "c", "d e f", "g"], ["s"] * 4,
                ids=[0, 4, 8, 1])
    rep = shard_balance_report(ray.data.from_arrow(tbl), n_shards=4)
    rows = {r["shard"]: r for r in rep.to_pylist()}
    assert rows[0]["n_docs"] == 3 and rows[0]["n_tokens"] == 6
    assert rows[1]["n_docs"] == 1 and rows[1]["n_tokens"] == 1
    assert rows[2]["n_docs"] == 0 and rows[3]["n_docs"] == 0
    assert rows[0]["fill_e6"] == 3_000_000      # 3x the uniform ideal
    assert rows[0]["moves"] == 2
    assert rows[1]["moves"] == 0
    # moves never exceed the docs above a perfectly-balanced ceiling
    assert sum(r["moves"] for r in rows.values()) == 2


def test_shard_balance_partition_invariance(ray_session):
    import ray.data
    from onestools_eventlog_ray.pipelines.serving import \
        shard_balance_report
    rng = np.random.RandomState(11)
    texts = ["w%d x" % i for i in range(100)]
    tbl = _docs(texts, ["s"] * 100,
                ids=rng.permutation(1000)[:100].tolist())
    r1 = shard_balance_report(ray.data.from_arrow(tbl).repartition(1),
                              n_shards=8).to_pylist()
    r2 = shard_balance_report(ray.data.from_arrow(tbl).repartition(9),
                              n_shards=8).to_pylist()
    assert r1 == r2
    assert sum(r["n_docs"] for r in r1) == 100


def test_ib_ll_similarity_brute_force(ray_session, small_corpus_dir,
                                      tmp_path):
    """IB(LL, lambda_df, H2) ranks identically to a brute-force numpy
    recomputation from raw tokens, and differs from BM25's ranking
    criterion (it is a genuinely distinct model)."""
    import numpy as np
    from collections import Counter
    import pyarrow.parquet as pq
    from onestools_eventlog_ray.config import EngineConfig
    from onestools_eventlog_ray.functions.analyzer import tokenize_py
    from onestools_eventlog_ray.pipelines.build import build_index
    from onestools_eventlog_ray.pipelines.query import SearchEngine
    from onestools_eventlog_ray.sources.corpus import CODE_CORPUS_SPEC
    from onestools_eventlog_ray.stages.normalize import add_doc_id
    idx = str(tmp_path / "ibidx")
    build_index(small_corpus_dir, idx, cfg=EngineConfig(num_partitions=8))
    eng = SearchEngine(idx)
    terms = ["def", "import"]
    got = eng.search_lm(terms, k=10, similarity="ib_ll")

    raw = add_doc_id(pq.read_table(small_corpus_dir + "/part-00000.parquet"),
                     CODE_CORPUS_SPEC)
    docs = {did: tokenize_py(t) for did, t in
            zip(raw["doc_id"].to_pylist(), raw["content"].to_pylist())}
    N = len(docs)
    avgdl = sum(len(v) for v in docs.values()) / N
    scores = Counter()
    for t in terms:
        df = sum(1 for v in docs.values() if t in v)
        lam = (df + 1.0) / (N + 1.0)
        for did, toks in docs.items():
            tf = toks.count(t)
            if tf:
                tfn = tf * np.log2(1.0 + avgdl / len(toks))
                v = np.log((tfn + lam) / lam)
                scores[did] += max(int(np.floor(v * 1e6 + 0.5)), 0)
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert got == [(int(d), int(s)) for d, s in want]
