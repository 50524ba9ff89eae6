"""Round-5 batch F: watermark late-events audit (distributed running
max over arrival order) + ES function_score gauss decay."""

import numpy as np
import pyarrow as pa
import pytest


def _events_table(ts_list, types=None):
    n = len(ts_list)
    return pa.table({
        "event_id": pa.array(list(range(n)), pa.int64()),
        "ts": pa.array(ts_list, pa.timestamp("us")),
        "event_type": pa.array(types or ["e"] * n, pa.string()),
    })


def _np_reference(arr, eid, t_us, et, wm_s):
    """O(n log n) single-process reference: prefix max strictly before
    each event in (arr, eid) order."""
    order = np.lexsort((eid, arr))
    t_o = np.asarray(t_us)[order]
    pmax = np.empty(t_o.size, dtype=np.int64)
    pmax[0] = -(1 << 62)
    np.maximum.accumulate(t_o[:-1], out=pmax[1:])
    np.maximum(pmax[1:], pmax[0], out=pmax[1:])
    late_by = pmax - t_o
    is_late = late_by > wm_s * 1_000_000
    out = {}
    et_o = np.asarray(et)[order]
    for ty in sorted(set(et)):
        m = et_o == ty
        lb = np.where(is_late[m], late_by[m], 0)
        out[ty] = (int(m.sum()), int(is_late[m].sum()),
                   int(lb.max() // 1_000_000) if m.any() else 0)
    return out


def test_late_events_basic(ray_session):
    import ray.data
    from onestools_eventlog_ray.pipelines.streaming import late_events_report
    base = 1_700_000_000_000_000  # epoch µs
    h = 3_600_000_000
    # arrival = event_id order; event 3 is 5 h older than the max seen
    ts = [base, base + h, base + 5 * h, base + 0 * h, base + 6 * h]
    tbl = _events_table(ts, ["a", "a", "b", "b", "a"])
    ds = ray.data.from_arrow(tbl)
    rep = late_events_report(ds, watermark_s=4 * 3600, range_bits=2)
    got = {r["event_type"]: (r["n_events"], r["n_late"], r["max_lateness_s"])
           for r in rep.to_pylist()}
    # event 3 (type b, ts=base) arrives after max ts base+5h -> 5 h late
    assert got == {"a": (3, 0, 0), "b": (2, 1, 5 * 3600)}


def test_late_events_first_event_not_late(ray_session):
    """Regression: INT64_MIN seed must not wrap to a positive lateness
    for the first event in arrival order."""
    import ray.data
    from onestools_eventlog_ray.pipelines.streaming import late_events_report
    tbl = _events_table([1_700_000_000_000_000])
    rep = late_events_report(ray.data.from_arrow(tbl), watermark_s=0)
    r = rep.to_pylist()[0]
    assert (r["n_late"], r["max_lateness_s"]) == (0, 0)


def test_late_events_matches_reference_random_arrival(ray_session):
    """Distributed range-scan == single-process reference on a planted
    shuffled-arrival corpus, across range_bits (partitioning must not
    change the answer)."""
    import ray.data
    from onestools_eventlog_ray.pipelines.streaming import late_events_report
    rng = np.random.RandomState(7)
    n = 500
    base = 1_700_000_000_000_000
    t_us = base + rng.randint(0, 30 * 86400, n).astype(np.int64) * 1_000_000
    arr = rng.permutation(n).astype(np.int64) * 1000003  # sparse arrival keys
    et = [["x", "y", "z"][i % 3] for i in range(n)]
    tbl = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(t_us, pa.timestamp("us")),
        "event_type": pa.array(et, pa.string()),
        "arr": pa.array(arr, pa.int64()),
    })
    want = _np_reference(arr, np.arange(n), t_us, et, wm_s=86400)
    for rb in (0, 3, 6):
        rep = late_events_report(
            ray.data.from_arrow(tbl).repartition(7),
            watermark_s=86400, range_bits=rb, arrival_col="arr")
        got = {r["event_type"]: (r["n_events"], r["n_late"],
                                 r["max_lateness_s"])
               for r in rep.to_pylist()}
        assert got == want, f"range_bits={rb}"


@pytest.fixture(scope="module")
def gauss_engine(ray_session, tmp_path_factory):
    import pyarrow.parquet as pq
    from onestools_eventlog_ray.config import EngineConfig
    from onestools_eventlog_ray.pipelines.build import build_index
    from onestools_eventlog_ray.pipelines.query import SearchEngine
    from onestools_eventlog_ray.sources.corpus import DOCUMENTS_SPEC
    root = tmp_path_factory.mktemp("gauss")
    corpus = str(root / "docs.parquet")
    texts = ["join merge", "join merge", "join merge", "nothing here"]
    n_chars = [500, 700, 100, 500]  # doc 1 sits exactly at the origin
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * 4),
        "source": pa.array(["t"] * 4),
        "n_chars": pa.array(n_chars, pa.int64()),
    }), corpus)
    idx = str(root / "idx")
    build_index(corpus, idx, spec=DOCUMENTS_SPEC,
                cfg=EngineConfig(num_partitions=4))
    return SearchEngine(idx)


def test_gauss_decay_multiplicative(gauss_engine):
    eng = gauss_engine
    plain = dict(eng.search(["join", "merge"], k=10))
    hits = eng.search_gauss_decay(["join", "merge"], field="n_chars",
                                  origin=500.0, scale=200.0, decay=0.5,
                                  k=10)
    got = dict(hits)
    assert set(got) == {1, 2, 3}
    # doc 1 at the origin: multiplier exactly 1
    assert got[1] == pytest.approx(plain[1])
    # doc 2 at distance 200 = scale: multiplier exactly decay
    assert got[2] == pytest.approx(plain[2] * 0.5)
    # doc 3 at distance 400 = 2*scale: decay^4
    assert got[3] == pytest.approx(plain[3] * 0.5 ** 4)
    # origin doc ranks first (all three share the same BM25 base)
    assert hits[0][0] == 1


def test_gauss_decay_empty(gauss_engine):
    assert gauss_engine.search_gauss_decay(["nosuchterm"]) == []
