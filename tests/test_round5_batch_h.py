"""Round-5 batch H: match_bool_prefix, filters agg + other_bucket,
stats_bucket/max_bucket pipeline aggs, deterministic DP noise."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def bp_engine(ray_session, tmp_path_factory):
    import pyarrow.parquet as pq
    from onestools_eventlog_ray.config import EngineConfig
    from onestools_eventlog_ray.pipelines.build import build_index
    from onestools_eventlog_ray.pipelines.query import SearchEngine
    from onestools_eventlog_ray.sources.corpus import DOCUMENTS_SPEC
    root = tmp_path_factory.mktemp("boolpfx")
    corpus = str(root / "docs.parquet")
    texts = [
        "join merge alpha",     # 1: both term clauses, no prefix match
        "join sample",          # 2: one term + prefix (sample)
        "scan solo",            # 3: prefix only (scan, solo)
        "nothing here",         # 4: no clause matches
        "merge sigma",          # 5: one term + prefix (sigma)
    ]
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * 5),
        "source": pa.array(["t"] * 5),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), corpus)
    idx = str(root / "idx")
    build_index(corpus, idx, spec=DOCUMENTS_SPEC,
                cfg=EngineConfig(num_partitions=4))
    return SearchEngine(idx)


def test_bool_prefix_combines_clauses(bp_engine):
    eng = bp_engine
    hits = dict(eng.search_bool_prefix(["join", "merge"], "s", k=10))
    plain = dict(eng.search(["join", "merge"], k=10))
    # doc 4 matches nothing
    assert set(hits) == {1, 2, 3, 5}
    # doc 3: prefix-only -> constant score exactly 1.0
    assert hits[3] == pytest.approx(1.0)
    # doc 1: terms only -> plain BM25, no prefix bonus
    assert hits[1] == pytest.approx(plain[1])
    # docs 2/5: BM25 + 1.0
    assert hits[2] == pytest.approx(plain[2] + 1.0)
    assert hits[5] == pytest.approx(plain[5] + 1.0)


def test_bool_prefix_max_expansions(bp_engine):
    # dictionary s-terms sorted: sample, scan, sigma, solo
    # cap=1 -> only 'sample' expands -> doc 3 loses 'scan'/'solo',
    # doc 5 loses 'sigma'
    hits = dict(bp_engine.search_bool_prefix(["join", "merge"], "s",
                                             k=10, max_expansions=1))
    plain = dict(bp_engine.search(["join", "merge"], k=10))
    assert 3 not in hits
    assert hits[5] == pytest.approx(plain[5])      # no bonus anymore
    assert hits[2] == pytest.approx(plain[2] + 1.0)  # sample still in


def test_bool_prefix_edge_cases(bp_engine):
    # prefix with no expansions -> pure BM25
    assert dict(bp_engine.search_bool_prefix(["join"], "zz", k=10)) == \
        dict(bp_engine.search(["join"], k=10))
    # no terms -> constant-score prefix-only search
    hits = bp_engine.search_bool_prefix([], "s", k=10)
    assert {d for d, _ in hits} == {2, 3, 5}
    assert all(s == pytest.approx(1.0) for _, s in hits)
    # nothing at all
    assert bp_engine.search_bool_prefix([], "zz") == []


def test_filters_agg_overlap_and_other(ray_session):
    import ray.data
    from onestools_eventlog_ray.pipelines.relational import \
        filters_agg_report
    D = 86_400_000_000
    sat = 2 * D          # 1970-01-03, a Saturday
    mon = 4 * D          # 1970-01-05, a Monday
    rows = [
        ("click", 200.0, sat),   # clicks + big + weekend (overlap x3)
        ("view",   50.0, mon),   # none -> _other_
        ("click",  10.0, mon),   # clicks only
        ("error", 500.0, mon),   # big only
    ]
    tbl = pa.table({
        "event_type": pa.array([r[0] for r in rows], pa.string()),
        "value": pa.array([r[1] for r in rows], pa.float64()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
    })
    rep = filters_agg_report(ray.data.from_arrow(tbl))
    got = {r["bucket"]: (r["n_events"], r["sum_value_e6"])
           for r in rep.to_pylist()}
    assert got["clicks"] == (2, 210_000_000)
    assert got["big"] == (2, 700_000_000)
    assert got["weekend"] == (1, 200_000_000)
    assert got["_other_"] == (1, 50_000_000)
    # overlapping buckets: totals exceed row count by design
    assert sum(v[0] for v in got.values()) == 6 > len(rows)


def test_revenue_stats_bucket(ray_session):
    import ray.data
    from onestools_eventlog_ray.pipelines.relational import \
        revenue_stats_bucket
    import datetime as dt
    rows = [  # (date, price) -> Jan: 10+20 = 30, Feb: 5, Mar: 30 (TIE)
        (dt.datetime(2024, 1, 1), 10.0), (dt.datetime(2024, 1, 20), 20.0),
        (dt.datetime(2024, 2, 2), 5.0), (dt.datetime(2024, 3, 3), 30.0),
    ]
    tbl = pa.table({
        "o_orderdate": pa.array([r[0] for r in rows], pa.timestamp("us")),
        "o_totalprice": pa.array([r[1] for r in rows], pa.float64()),
    })
    rep = revenue_stats_bucket(ray.data.from_arrow(tbl)).to_pylist()[0]
    assert rep["n_buckets"] == 3
    assert rep["min_rev_e2"] == 500
    assert rep["max_rev_e2"] == 3000
    assert rep["sum_rev_e2"] == 6500
    assert rep["avg_rev_e2"] == 6500 // 3
    # Jan and Mar tie at 3000 -> the EARLIEST bucket wins (the pinned
    # deterministic max_bucket tie rule)
    assert rep["max_epoch_month"] == (2024 - 1970) * 12 + 0  # January


def test_dp_noisy_counts_deterministic(ray_session):
    import ray.data
    from onestools_eventlog_ray.pipelines.relational import dp_noisy_counts
    tbl = pa.table({"event_type": pa.array(
        ["a"] * 10 + ["b"] * 5, pa.string())})
    r1 = dp_noisy_counts(ray.data.from_arrow(tbl), epsilon=1.0).to_pylist()
    r2 = dp_noisy_counts(ray.data.from_arrow(tbl).repartition(3),
                         epsilon=1.0).to_pylist()
    assert r1 == r2                       # hash noise: run-invariant
    by = {r["event_type"]: r for r in r1}
    assert by["a"]["n_true"] == 10 and by["b"]["n_true"] == 5
    # noisy = true + noise at e6 precision (within the rounding ulp)
    for r in r1:
        assert abs(r["n_noisy_e6"] - (r["n_true"] * 1_000_000
                                      + r["noise_e6"])) <= 1
    # epsilon scales the noise magnitude
    r_low = dp_noisy_counts(ray.data.from_arrow(tbl),
                            epsilon=0.1).to_pylist()
    for a, b in zip(r1, r_low):
        assert abs(b["noise_e6"]) == pytest.approx(
            10 * abs(a["noise_e6"]), abs=5)
