"""Round-5: ES rate agg (calendar-month buckets, unit=day) and
percentiles_bucket over daily histogram counts — planted calendars
exercise month-length normalization, leap February, zero-filled month
gaps, and the exact interpolation arithmetic."""

import datetime

import numpy as np
import pyarrow as pa

from onestools_eventlog_ray.pipelines.streaming import (
    date_histogram_month_rate, percentiles_bucket_daily)


def _ev(days_counts):
    ts = []
    for day, cnt in days_counts:
        ts.extend([datetime.datetime.combine(day, datetime.time(12))] * cnt)
    return pa.table({"ts": pa.array(ts, pa.timestamp("us"))})


def test_month_rate_normalizes_by_month_length(ray_session):
    import ray.data
    # 62 events in Jan (31d), 58 in Feb 2024 (leap: 29d)
    ev = _ev([(datetime.date(2024, 1, 1), 30),
              (datetime.date(2024, 1, 31), 32),
              (datetime.date(2024, 2, 29), 58)])
    t = date_histogram_month_rate(
        ray.data.from_arrow(ev).repartition(3)).to_pydict()
    jan = (datetime.date(2024, 1, 1) - datetime.date(1970, 1, 1)).days
    feb = (datetime.date(2024, 2, 1) - datetime.date(1970, 1, 1)).days
    assert t["month_start_day"] == [jan, feb]
    assert t["n_events"] == [62, 58]
    assert t["days_in_month"] == [31, 29]
    assert t["rate_per_day_e6"] == [1_000_000 * 62 // 31,
                                    1_000_000 * 58 // 29]


def test_month_rate_zero_fills_gap_months(ray_session):
    import ray.data
    ev = _ev([(datetime.date(2024, 1, 10), 5),
              (datetime.date(2024, 3, 10), 7)])   # February silent
    t = date_histogram_month_rate(ray.data.from_arrow(ev)).to_pydict()
    assert t["n_events"] == [5, 0, 7]
    assert t["days_in_month"] == [31, 29, 31]
    assert t["rate_per_day_e6"][1] == 0


def test_percentiles_bucket_exact_interpolation(ray_session):
    import ray.data
    # five consecutive days with counts 1..5 -> sorted v = [1,2,3,4,5]
    ev = _ev([(datetime.date(2024, 1, 1 + i), i + 1) for i in range(5)])
    t = percentiles_bucket_daily(ray.data.from_arrow(ev),
                                 pcts_e2=(0, 50, 75, 100)).to_pydict()
    v = np.array([1, 2, 3, 4, 5], dtype=float)

    def ref(q):
        idx = (q / 100.0) * 4
        lo = int(np.floor(idx))
        hi = min(lo + 1, 4)
        val = v[lo] + (v[hi] - v[lo]) * (idx - lo)
        return int(np.floor(val * 1_000_000 + 0.5))

    assert t["q_e2"] == [0, 50, 75, 100]
    assert t["value_e6"] == [ref(0), ref(50), ref(75), ref(100)]
    assert t["value_e6"][1] == 3_000_000          # median of 1..5
    assert t["value_e6"][2] == 4_000_000          # p75 lands on 4.0


def test_percentiles_bucket_counts_zero_filled_days(ray_session):
    import ray.data
    # events on day 1 and day 5 only -> three zero buckets in between
    ev = _ev([(datetime.date(2024, 1, 1), 4),
              (datetime.date(2024, 1, 5), 4)])
    t = percentiles_bucket_daily(ray.data.from_arrow(ev),
                                 pcts_e2=(50,)).to_pydict()
    # sorted buckets [0,0,0,4,4] -> median 0
    assert t["value_e6"] == [0]


def test_change_point_planted_step(ray_session):
    """10 days at 2/day then 10 days at 20/day -> change point at the
    first high day, means 2.0 vs 20.0 exactly."""
    import ray.data
    from onestools_eventlog_ray.pipelines.streaming import \
        date_histogram_change_point
    days = [(datetime.date(2024, 1, 1 + i), 2) for i in range(10)] + \
           [(datetime.date(2024, 1, 11 + i), 20) for i in range(10)]
    t = date_histogram_change_point(
        ray.data.from_arrow(_ev(days)).repartition(4)).to_pydict()
    d11 = (datetime.date(2024, 1, 11) - datetime.date(1970, 1, 1)).days
    assert t["change_day"] == [d11]
    assert t["mean_before_e6"] == [2_000_000]
    assert t["mean_after_e6"] == [20_000_000]
    assert t["stat_e6"] == [18_000_000]
    assert t["n_before"] == [10] and t["n_after"] == [10]


def test_change_point_flat_series_ties_earliest(ray_session):
    import ray.data
    from onestools_eventlog_ray.pipelines.streaming import \
        date_histogram_change_point
    days = [(datetime.date(2024, 1, 1 + i), 5) for i in range(6)]
    t = date_histogram_change_point(
        ray.data.from_arrow(_ev(days))).to_pydict()
    # all splits give stat 0 -> earliest split day (Jan 2) wins
    d2 = (datetime.date(2024, 1, 2) - datetime.date(1970, 1, 1)).days
    assert t["change_day"] == [d2] and t["stat_e6"] == [0]


def test_bucket_sort_top_days(ray_session):
    import ray.data
    from onestools_eventlog_ray.pipelines.streaming import \
        date_histogram_bucket_sort
    days = [(datetime.date(2024, 1, 1), 3), (datetime.date(2024, 1, 2), 9),
            (datetime.date(2024, 1, 3), 9), (datetime.date(2024, 1, 5), 1)]
    t = date_histogram_bucket_sort(
        ray.data.from_arrow(_ev(days)), k=3).to_pydict()
    base = (datetime.date(2024, 1, 1)
            - datetime.date(1970, 1, 1)).days
    # counts [3,9,9,0,1] -> top3 = day2(9), day3(9), day1(3); tie day asc
    assert t["epoch_day"] == [base + 1, base + 2, base]
    assert t["n_events"] == [9, 9, 3]


def test_moving_max_trailing_window(ray_session):
    import ray.data
    from onestools_eventlog_ray.pipelines.streaming import \
        date_histogram_moving_max
    days = [(datetime.date(2024, 1, 1 + i), c)
            for i, c in enumerate([5, 1, 1, 7, 2])]
    t = date_histogram_moving_max(
        ray.data.from_arrow(_ev(days)), window=2).to_pydict()
    assert t["n_events"] == [5, 1, 1, 7, 2]
    assert t["wmax_events"] == [5, 5, 1, 7, 7]   # trailing pairs
