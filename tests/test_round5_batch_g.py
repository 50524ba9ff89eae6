"""Round-5 batch G: span_containing/span_within, AMS F2 sketch,
allowed-lateness windows, cumulative new users."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def span_engine(ray_session, tmp_path_factory):
    import pyarrow.parquet as pq
    from onestools_eventlog_ray.config import EngineConfig
    from onestools_eventlog_ray.pipelines.build import build_index
    from onestools_eventlog_ray.pipelines.phrase import (
        PhraseEngine, build_position_index)
    from onestools_eventlog_ray.sources.corpus import DOCUMENTS_SPEC
    root = tmp_path_factory.mktemp("spanwc")
    corpus = str(root / "docs.parquet")
    texts = [
        "alpha join omega",            # 1: span a..o contains join
        "alpha x y omega",             # 2: span, no join inside
        "alpha join join omega",       # 3: two joins inside one span
        "join alpha omega",            # 4: join OUTSIDE the span
        "alpha omega join",            # 5: join outside (after)
        "omega alpha",                 # 6: wrong order, no span
        "alpha x x x x x x omega",     # 7: gap 6 > slop, no span
        "alpha join omega alpha omega",  # 8: two spans, first has join
    ]
    pq.write_table(pa.table({
        "doc_id": pa.array(list(range(1, len(texts) + 1)), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * len(texts)),
        "source": pa.array(["t"] * len(texts)),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), corpus)
    idx = str(root / "idx")
    cfg = EngineConfig(num_partitions=4)
    build_index(corpus, idx, spec=DOCUMENTS_SPEC, cfg=cfg)
    build_position_index([corpus], idx, spec=DOCUMENTS_SPEC, cfg=cfg)
    return PhraseEngine(idx)


def test_span_containing(span_engine):
    from onestools_eventlog_ray.pipelines.phrase import span_containing
    got = span_containing(span_engine, ("alpha", "omega"), "join", slop=5)
    # doc1: 1 span w/ join; doc3: 1 span w/ 2 joins (still 1 span);
    # doc8: spans (0,2), (0,4), (3,4) — the first TWO contain join@1
    # (ES enumerates every (a,b) pair within slop, not just minimal);
    # docs 2/4/5/6/7: none
    assert got == [(1, 1), (3, 1), (8, 2)]


def test_span_within(span_engine):
    from onestools_eventlog_ray.pipelines.phrase import span_within
    got = span_within(span_engine, "join", ("alpha", "omega"), slop=5)
    # doc3 has TWO join occurrences inside the span (within counts
    # occurrences, containing counts spans — the asymmetry under test)
    assert got == [(1, 1), (3, 2), (8, 1)]


def test_span_within_boundary_slop(span_engine):
    from onestools_eventlog_ray.pipelines.phrase import (span_containing,
                                                         span_within)
    # slop=6 admits doc7's alpha......omega span but it has no join
    assert (7, 1) not in span_containing(
        span_engine, ("alpha", "omega"), "join", slop=6)
    # slop=0 -> only adjacent pairs; none of the spans contain a term
    assert span_within(span_engine, "join", ("alpha", "omega"),
                       slop=0) == []


def test_ams_f2_exact_small(ray_session):
    """On a tiny corpus the exact F2 column must equal the hand sum,
    Z rows must be integers consistent with the gate columns."""
    import ray.data
    from onestools_eventlog_ray.pipelines.sketch import ams_f2_report
    from onestools_eventlog_ray.sources.corpus import DOCUMENTS_SPEC
    texts = ["a a b", "b c", "a"]
    # counts: a=3, b=2, c=1 -> F2 = 9 + 4 + 1 = 14
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * 3),
        "source": pa.array(["t"] * 3),
        "n_chars": pa.array([5, 3, 1], pa.int64()),
    }))
    rep = ams_f2_report(ds, DOCUMENTS_SPEC, n_rows=9).to_pylist()[0]
    assert rep["f2_exact"] == 14
    assert rep["n_rows"] == 9
    unit = 1  # exact // 1e6 == 0 -> max(1, .) == 1
    assert rep["mean_rel_err_e6"] == abs(rep["est_f2"] - 14) // unit
    assert rep["med_rel_err_e6"] == abs(rep["med_f2"] - 14) // unit


def test_ams_f2_partition_invariance(ray_session):
    """Linear sketch: the Z fold (and so the whole report) must be
    identical whatever the batch/partition split."""
    import ray.data
    from onestools_eventlog_ray.pipelines.sketch import ams_f2_report
    from onestools_eventlog_ray.sources.corpus import DOCUMENTS_SPEC
    rng = np.random.RandomState(3)
    words = ["w%d" % i for i in range(50)]
    texts = [" ".join(rng.choice(words, rng.randint(1, 30)))
             for _ in range(200)]
    tbl = pa.table({
        "doc_id": pa.array(list(range(200)), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * 200),
        "source": pa.array(["t"] * 200),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    r1 = ams_f2_report(ray.data.from_arrow(tbl).repartition(1),
                       DOCUMENTS_SPEC).to_pylist()
    r2 = ams_f2_report(ray.data.from_arrow(tbl).repartition(13),
                       DOCUMENTS_SPEC).to_pylist()
    assert r1 == r2
    # the estimator should be in the right ballpark on 200 docs
    rep = r1[0]
    assert rep["est_f2"] > 0
    assert rep["mean_rel_err_e6"] <= 1_500_000  # the shipped gate


def test_window_allowed_lateness_semantics(ray_session):
    import ray.data
    from onestools_eventlog_ray.pipelines.streaming import \
        window_counts_allowed_lateness
    H = 3_600_000_000
    base = (1_700_000_000_000_000 // (6 * H)) * (6 * H)  # window-aligned
    # arrival = event_id order; craft watermark progression:
    #   e0 ts=base+1h          -> pmax=-inf          on time (w0)
    #   e1 ts=base+30h         -> pmax=base+1h       on time (w5)
    #   e2 ts=base+2h (w0)     -> pmax=base+30h > w0end+allow(12h) -> drop
    #   e3 ts=base+26h (w4)    -> pmax=base+30hends w4 end=base+30h -> on time
    #   e4 ts=base+17h (w2)    -> w2 end=base+18h < pmax=base+30h
    #                             <= end+allow=base+30h -> late update
    ts = [base + 1 * H, base + 30 * H, base + 2 * H, base + 26 * H,
          base + 17 * H]
    tbl = pa.table({
        "event_id": pa.array(list(range(5)), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
    })
    rep = window_counts_allowed_lateness(
        ray.data.from_arrow(tbl), window_s=6 * 3600,
        allowed_lateness_s=12 * 3600, range_bits=2)
    got = {r["window_start_us"]: (r["n_on_time"], r["n_late_update"],
                                  r["n_dropped"])
           for r in rep.to_pylist()}
    assert got[base] == (1, 0, 1)            # e0 on time, e2 dropped
    assert got[base + 30 * H] == (1, 0, 0)   # e1 on time (w5=30-36h)
    assert got[base + 24 * H] == (1, 0, 0)   # e3 on time (w4=24-30h,
    #   pmax=base+30h == w4 end -> still on time, boundary inclusive)
    assert got[base + 12 * H] == (0, 1, 0)   # e4 late update (w2=12-18h)


def test_cumulative_new_users(ray_session):
    import ray.data
    from onestools_eventlog_ray.pipelines.streaming import \
        cumulative_new_users
    D = 86_400_000_000
    base = 1_700_000_000_000_000
    rows = [  # (user, ts)
        (1, base), (2, base + 1), (1, base + D),        # day0: u1,u2
        (3, base + D), (2, base + 2 * D),               # day1: u3
        (4, base + 2 * D),                              # day2: u4
    ]
    tbl = pa.table({
        "user_id": pa.array([u for u, _ in rows], pa.int64()),
        "ts": pa.array([t for _, t in rows], pa.timestamp("us")),
        "event_id": pa.array(list(range(len(rows))), pa.int64()),
    })
    rep = cumulative_new_users(ray.data.from_arrow(tbl), bucket_s=86400)
    assert rep.to_pylist() == [
        {"bucket_start_us": (base // D) * D, "n_new_users": 2,
         "cum_users": 2},
        {"bucket_start_us": (base // D) * D + D, "n_new_users": 1,
         "cum_users": 3},
        {"bucket_start_us": (base // D) * D + 2 * D, "n_new_users": 1,
         "cum_users": 4},
    ]
