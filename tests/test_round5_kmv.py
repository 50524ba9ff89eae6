"""Round-5: KMV / theta sketches — distinct counting with set
operations.  Planted events cover the exact path (universe < k), the
estimating path, and the merge-of-partials == direct-fold identity."""

import numpy as np
import pyarrow as pa
import pytest


def _events(n_users: int, types: list[str], hours=None) -> pa.Table:
    rows_u, rows_t, rows_ts = [], [], []
    import datetime
    for t in types:
        for u in range(n_users):
            for h in (hours or [u % 24]):
                rows_u.append(u)
                rows_t.append(t)
                rows_ts.append(datetime.datetime(2024, 1, 1, h, 0, 0))
    n = len(rows_u)
    return pa.table({
        "ts": pa.array(rows_ts, pa.timestamp("us")),
        "user_id": pa.array(rows_u, pa.int64()),
        "event_type": pa.array(rows_t, pa.string()),
    })


def test_kmv_exact_path(ray_session):
    import ray.data
    from onestools_eventlog_ray.pipelines import sketch
    ev = ray.data.from_arrow(_events(10, ["a"]))  # 10 cells < k
    t = sketch.kmv_distinct_cells(ev, k=64).to_pandas()
    assert t["n_exact"].tolist() == [10]
    assert t["est"].tolist() == [10]          # exact path: est == exact
    assert t["theta"].tolist() == [(1 << 63) - 1]
    assert t["within"].tolist() == [1]


def test_kmv_estimating_path(ray_session):
    import ray.data
    from onestools_eventlog_ray.pipelines import sketch
    # 500 users x 3 hours = 1500 cells >> k=64
    ev = ray.data.from_arrow(_events(500, ["a"], hours=[1, 2, 3]))
    t = sketch.kmv_distinct_cells(ev, k=64).to_pandas()
    n, est = int(t["n_exact"][0]), int(t["est"][0])
    assert n == 1500
    assert est != n                            # genuinely estimating
    assert (est - n) ** 2 * 62 <= 9 * n ** 2   # inside the 3-sigma gate
    assert t["within"].tolist() == [1]


def test_kmv_merge_of_partials_equals_direct(ray_session):
    """Folding per-batch k-min partials must equal the k-min of the
    full distinct set — the mergeability property."""
    import ray.data
    from onestools_eventlog_ray.functions.fasthash import md5_lower64
    from onestools_eventlog_ray.pipelines import sketch
    tbl = _events(300, ["a"], hours=[5, 6])
    ev = ray.data.from_arrow(tbl).repartition(7)   # force many batches
    theta, kept = sketch.kmv_sketch_of(ev, "a", k=32)
    cells = (tbl["user_id"].to_numpy(zero_copy_only=False) * 24
             + np.array([ts.hour for ts in tbl["ts"].to_pylist()]))
    h = np.asarray(
        md5_lower64(pa.array([str(c) for c in cells])),
        dtype=np.uint64) >> np.uint64(1)
    want_theta, want_kept = sketch._kmv_fold(h.astype(np.int64), 32)
    assert theta == want_theta
    assert np.array_equal(np.sort(kept), np.sort(want_kept))


def test_theta_set_ops_disjoint_and_identical(ray_session):
    import ray.data
    from onestools_eventlog_ray.pipelines import sketch
    # identical sets -> jaccard 1, intersection == union
    ev = ray.data.from_arrow(_events(40, ["a", "b"]))
    r = sketch.theta_intersection_report(ev, "a", "b", k=64).to_pandas()
    assert r["exact_intersection"][0] == r["exact_union"][0] == 40
    assert r["est_intersection"][0] == 40      # exact path (40 < k)
    assert r["jaccard_est_e6"][0] == 1_000_000
    assert r["within_intersection"][0] == 1
    # disjoint sets -> intersection 0
    t1 = _events(30, ["a"])
    t2raw = _events(30, ["b"])
    t2 = pa.table({
        "ts": t2raw["ts"],
        "user_id": pa.array(
            (t2raw["user_id"].to_numpy(zero_copy_only=False)
             + 1000).tolist(), pa.int64()),
        "event_type": t2raw["event_type"],
    })
    ev = ray.data.from_arrow(pa.concat_tables([t1, t2]))
    r = sketch.theta_intersection_report(ev, "a", "b", k=64).to_pandas()
    assert r["exact_intersection"][0] == 0
    assert r["est_intersection"][0] == 0
    assert r["exact_union"][0] == 60


def test_theta_estimating_overlap(ray_session):
    import ray.data
    from onestools_eventlog_ray.pipelines import sketch
    # a: users 0..599, b: users 300..899 -> 50% overlap, both >> k
    a = _events(600, ["a"], hours=[4])
    braw = _events(600, ["b"], hours=[4])
    b = pa.table({
        "ts": braw["ts"],
        "user_id": pa.array(
            (braw["user_id"].to_numpy(zero_copy_only=False)
             + 300).tolist(), pa.int64()),
        "event_type": braw["event_type"],
    })
    ev = ray.data.from_arrow(pa.concat_tables([a, b]))
    r = sketch.theta_intersection_report(ev, "a", "b", k=64).to_pandas()
    assert r["exact_intersection"][0] == 300
    assert r["exact_union"][0] == 900
    assert r["within_intersection"][0] == 1
    assert r["within_union"][0] == 1
    # estimate is live, not a copy of exact
    assert r["est_union"][0] != r["exact_union"][0]
