"""Round-5 ES-surface additions: span_first (positions sidecar),
has_child / has_parent (parent-child join field), diversified_sampler.

Each test builds tiny planted inputs where the expected output is
computable by hand, so the contract is asserted independently of the
DuckDB oracle sweep (which covers the real tables)."""

import numpy as np
import pyarrow as pa
import pytest


# ---------------------------------------------------------------------------
# span_first
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def pos_index(ray_session, tmp_path_factory):
    import pyarrow.parquet as pq

    from onestools_eventlog_ray.config import EngineConfig
    from onestools_eventlog_ray.pipelines.build import build_index
    from onestools_eventlog_ray.pipelines.phrase import (
        PhraseEngine, build_position_index)
    from onestools_eventlog_ray.sources.corpus import DOCUMENTS_SPEC

    root = tmp_path_factory.mktemp("spanfirst")
    corpus = str(root / "docs.parquet")
    texts = [
        "spark runs fast today ok",          # spark at pos 0
        "the big spark spark engine",        # spark at 2, 3
        "one two three four spark",          # spark at 4 (end=5 > 3)
        "no match here at all",              # none
    ]
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * 4),
        "source": pa.array(["t"] * 4),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), corpus)
    idx = str(root / "idx")
    cfg = EngineConfig(num_partitions=4)
    build_index(corpus, idx, spec=DOCUMENTS_SPEC, cfg=cfg)
    build_position_index([corpus], idx, spec=DOCUMENTS_SPEC, cfg=cfg)
    return PhraseEngine(idx)


def test_span_first_basic(pos_index):
    from onestools_eventlog_ray.pipelines.phrase import span_first
    # end=3: spans ending at token 3 or earlier, i.e. 0-based pos <= 2
    assert span_first(pos_index, "spark", end=3) == [(1, 1), (2, 1)]
    # end=4 admits doc 2's second occurrence (pos 3 -> span end 4)
    assert span_first(pos_index, "spark", end=4) == [(1, 1), (2, 2)]
    # end large enough admits doc 3 too
    assert span_first(pos_index, "spark", end=5) == [(1, 1), (2, 2), (3, 1)]
    assert span_first(pos_index, "absent", end=10) == []


# ---------------------------------------------------------------------------
# has_child / has_parent
# ---------------------------------------------------------------------------

@pytest.fixture()
def family(ray_session):
    import ray.data
    customer = pa.table({
        "c_custkey": pa.array([1, 2, 3], pa.int64()),
        "c_name": pa.array(["a", "b", "c"]),
        "c_mktsegment": pa.array(["BUILDING", "AUTO", "BUILDING"]),
        "c_acctbal": pa.array([9000.0, 9999.0, 4000.0], pa.float64()),
    })
    orders = ray.data.from_arrow(pa.table({
        "o_orderkey": pa.array([10, 11, 12, 13, 14, 15], pa.int64()),
        "o_custkey": pa.array([1, 1, 2, 2, 2, 3], pa.int64()),
        "o_orderpriority": pa.array(["1-URGENT", "1-URGENT", "1-URGENT",
                                     "5-LOW", "1-URGENT", "1-URGENT"]),
        "o_totalprice": pa.array([10.0, 20.005, 100.0, 7.0, 1.0, 50.0],
                                 pa.float64()),
    }))
    return customer, orders


def test_has_child_sum_and_min_children(family):
    from onestools_eventlog_ray.pipelines.relational import has_child_topk
    customer, orders = family
    out = has_child_topk(orders, customer, priority="1-URGENT",
                         min_children=2, k=10)
    rows = list(zip(out["rank"].to_pylist(), out["c_custkey"].to_pylist(),
                    out["c_name"].to_pylist(),
                    out["score_cents"].to_pylist(),
                    out["n_children"].to_pylist()))
    # cust 2: 100.0 + 1.0 urgent = 10100 cents, n=2 (the 5-LOW child is
    # excluded); cust 1: 10.0 + 20.005 -> 1000 + 2001 = 3001 cents, n=2;
    # cust 3 has only one urgent child -> dropped by min_children
    assert rows == [(1, 2, "b", 10100, 2), (2, 1, "a", 3001, 2)]


def test_has_parent_scores_by_parent(family):
    from onestools_eventlog_ray.pipelines.relational import has_parent_orders
    customer, orders = family
    out = has_parent_orders(orders, customer, segment="BUILDING",
                            min_bal=5000.0, k=10)
    # matching parent: cust 1 only (cust 2 wrong segment, cust 3 low bal)
    assert out["o_orderkey"].to_pylist() == [10, 11]
    assert out["parent_bal_cents"].to_pylist() == [900000, 900000]
    assert out["rank"].to_pylist() == [1, 2]


def test_has_parent_k_cuts(family):
    from onestools_eventlog_ray.pipelines.relational import has_parent_orders
    customer, orders = family
    out = has_parent_orders(orders, customer, segment="BUILDING",
                            min_bal=5000.0, k=1)
    assert out["o_orderkey"].to_pylist() == [10]


# ---------------------------------------------------------------------------
# diversified_sampler
# ---------------------------------------------------------------------------

def test_diversified_sampler_cap_and_limit(ray_session):
    import ray.data

    from onestools_eventlog_ray.pipelines.relational import \
        diversified_sample_stats
    # source s1 has FIVE high-scoring docs but only its top-2 may enter;
    # the sample (size 3) is then s1's top-2 + s2's best
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(range(1, 9)), pa.int64()),
        "source": pa.array(["s1"] * 5 + ["s2"] * 3),
        "lang": pa.array(["en", "en", "de", "de", "en", "fr", "fr", "en"]),
        "n_chars": pa.array([100, 90, 80, 70, 60, 50, 40, 30], pa.int64()),
    }))
    out = diversified_sample_stats(docs, max_per_source=2, sample_size=3)
    got = {(r["lang"], r["n_docs"], r["sum_chars"])
           for r in out.to_pylist()}
    # selected: doc1 (en,100), doc2 (en,90) from s1; doc6 (fr,50) from s2
    assert got == {("en", 2, 190), ("fr", 1, 50)}


def test_diversified_sampler_matches_capped_scan(ray_session):
    """The distributed per-source-top-m plan equals the literal
    best-first capped scan on a random-ish (but fixed-seed) table."""
    import ray.data

    from onestools_eventlog_ray.pipelines.relational import \
        diversified_sample_stats
    rng = np.random.RandomState(7)
    n = 300
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "source": pa.array([f"s{int(x)}" for x in rng.randint(0, 7, n)]),
        "lang": pa.array([f"l{int(x)}" for x in rng.randint(0, 4, n)]),
        "n_chars": pa.array(rng.randint(0, 50, n).astype(np.int64)),
    })
    out = diversified_sample_stats(ray.data.from_arrow(tbl),
                                   max_per_source=3, sample_size=50)
    # literal ES semantics: scan best-first, cap 3 per source, stop at 50
    rows = sorted(zip(tbl["n_chars"].to_pylist(), tbl["doc_id"].to_pylist(),
                      tbl["source"].to_pylist(), tbl["lang"].to_pylist()),
                  key=lambda r: (-r[0], r[1]))
    seen: dict = {}
    sel = []
    for nc, did, src, lang in rows:
        if len(sel) == 50:
            break
        if seen.get(src, 0) < 3:
            seen[src] = seen.get(src, 0) + 1
            sel.append((lang, nc))
    want = {}
    for lang, nc in sel:
        a = want.setdefault(lang, [0, 0])
        a[0] += 1
        a[1] += nc
    got = {r["lang"]: [r["n_docs"], r["sum_chars"]]
           for r in out.to_pylist()}
    assert got == want
