"""Round-5: intervals (ordered, max_gaps) query + deterministic
per-epoch shuffle order."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def iv_engine(ray_session, tmp_path_factory):
    import pyarrow.parquet as pq
    from onestools_eventlog_ray.config import EngineConfig
    from onestools_eventlog_ray.pipelines.build import build_index
    from onestools_eventlog_ray.pipelines.phrase import (
        PhraseEngine, build_position_index)
    from onestools_eventlog_ray.sources.corpus import DOCUMENTS_SPEC
    root = tmp_path_factory.mktemp("intervals")
    corpus = str(root / "docs.parquet")
    texts = [
        "alpha beta gamma",                  # 1: in order, 0 gaps
        "alpha x beta y gamma",              # 2: in order, 2 gaps
        "gamma beta alpha",                  # 3: wrong order -> no match
        "alpha beta x x x x x gamma",        # 4: 5 gaps
        "beta gamma alpha beta gamma",       # 5: alpha@2 beta@3 gamma@4
        "alpha gamma",                       # 6: beta missing
    ]
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * 6),
        "source": pa.array(["t"] * 6),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), corpus)
    idx = str(root / "idx")
    cfg = EngineConfig(num_partitions=4)
    build_index(corpus, idx, spec=DOCUMENTS_SPEC, cfg=cfg)
    build_position_index([corpus], idx, spec=DOCUMENTS_SPEC, cfg=cfg)
    return PhraseEngine(idx)


def test_intervals_ordered_gaps(iv_engine):
    from onestools_eventlog_ray.pipelines.phrase import intervals_ordered
    got = intervals_ordered(iv_engine, ["alpha", "beta", "gamma"],
                            max_gaps=10)
    assert got == [(1, 0), (5, 0), (2, 2), (4, 5)]
    # tightening the budget drops the loose matches
    got = intervals_ordered(iv_engine, ["alpha", "beta", "gamma"],
                            max_gaps=1)
    assert got == [(1, 0), (5, 0)]
    # order is required: gamma then beta then alpha exists only in doc 3
    # (doc 5 has no alpha after its second beta)
    got = intervals_ordered(iv_engine, ["gamma", "beta", "alpha"],
                            max_gaps=10)
    assert got == [(3, 0)]


def test_intervals_missing_term(iv_engine):
    from onestools_eventlog_ray.pipelines.phrase import intervals_ordered
    assert intervals_ordered(iv_engine, ["alpha", "zz"], max_gaps=99) == []
    with pytest.raises(ValueError):
        intervals_ordered(iv_engine, ["alpha"])


def test_intervals_duplicate_term(iv_engine):
    from onestools_eventlog_ray.pipelines.phrase import intervals_ordered
    # beta ... beta needs two distinct positions -> only doc 5
    got = intervals_ordered(iv_engine, ["beta", "beta"], max_gaps=5)
    assert got == [(5, 2)]


def test_epoch_shuffle_is_permutation_and_differs(ray_session):
    import ray.data
    from onestools_eventlog_ray.functions.fasthash import md5_lower64_one
    from onestools_eventlog_ray.pipelines import text as T
    from onestools_eventlog_ray.sources.corpus import DOCUMENTS_SPEC
    from onestools_eventlog_ray.stages.normalize import add_doc_id
    texts = [f"doc number {i} body words w{i}" for i in range(120)]
    docs = pa.table({
        "doc_id": pa.array(list(range(120)), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * 120),
        "source": pa.array(["t"] * 120),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    out = T.epoch_shuffle(ray.data.from_arrow(docs).repartition(5),
                          DOCUMENTS_SPEC, epochs=2).to_pandas()
    assert len(out) == 240
    for ep in (0, 1):
        sub = out[out["epoch"] == ep]
        assert sorted(sub["rank"]) == list(range(120))   # a permutation
    # the two epochs are different orders
    o0 = out[out["epoch"] == 0].sort_values("rank")["doc_id"].tolist()
    o1 = out[out["epoch"] == 1].sort_values("rank")["doc_id"].tolist()
    assert o0 != o1
    assert sorted(o0) == sorted(o1)
    # rank really is the sorted-hash position (spot-check epoch 0)
    b = add_doc_id(docs, DOCUMENTS_SPEC)
    ids = b["doc_id"].to_pylist()
    keys = {d: md5_lower64_one(f"e0:{d}") >> 1 for d in ids}
    want = [d for d, _ in sorted(keys.items(), key=lambda kv: (kv[1],
                                                               kv[0]))]
    assert o0 == want
