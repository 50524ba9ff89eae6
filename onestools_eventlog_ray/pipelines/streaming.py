"""Stream-shaped operators over the ``events`` table.

The reference is a live log tailer whose only window is a time-based
flush (SURVEY.md §2.10 W2: reading-timeout -> TriggerBatch,
``/root/reference/OneSTools.EventLog.Exporter.Core/EventLogExporter.cs:122-151``)
and whose sinks bucket rows by event-time
(``ElasticSearch/ElasticSearchStorage.cs:293-320``).  Ray Data is a
batch engine with no watermarks, so per the engine's streaming model the
events table is treated as an ordered, partitioned log: windows are
``groupby(key)`` + vectorized window-key math; sessions are
``groupby(key).map_groups`` over ts-sorted groups (the ordering
assumption: each group is sorted in-task before use, so input order is
irrelevant).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count, Max, Min

US = 1_000_000


def rate_spikes(ds: ray.data.Dataset, window_us: int = 3_600_000_000,
                z: int = 3) -> pa.Table:
    """Event-rate spike detection over the ZERO-FILLED hourly grid —
    the monitoring alarm next to ``date_histogram`` (which hours ran
    z-sigma hot?).  Exact integers throughout: with H grid hours,
    S = sum counts, Q = sum counts^2, hour h spikes iff

        H*c_h > S  AND  (H*c_h - S)^2 > z^2 * (H*Q - S^2)

    (the one-sided z-score test cross-multiplied free of division;
    driver math in Python bigints, oracle in HUGEINT).  The fold is
    (hour, n) partials -> bounded groupby; the grid fill is O(hours)
    on the driver.  -> (window_start_us, n_events, is_spike) per grid
    hour."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        h, c = np.unique(ts // window_us, return_counts=True)
        return pa.table({"h": pa.array(h, pa.int64()),
                         "n_p": pa.array(c.astype(np.int64), pa.int64())})

    rows = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("h").aggregate(Sum("n_p", alias_name="n")).take_all()
    if not rows:
        return pa.table({"window_start_us": pa.array([], pa.int64()),
                         "n_events": pa.array([], pa.int64()),
                         "is_spike": pa.array([], pa.int64())})
    by_h = {int(r["h"]): int(r["n"]) for r in rows}
    lo, hi = min(by_h), max(by_h)
    hours = list(range(lo, hi + 1))
    n = [by_h.get(h, 0) for h in hours]
    H, S, Q = len(hours), sum(n), sum(c * c for c in n)
    var_num = H * Q - S * S                       # H^2 * variance
    spike = [1 if (H * c > S and
                   (H * c - S) ** 2 > z * z * var_num) else 0
             for c in n]
    return pa.table({
        "window_start_us": pa.array([h * window_us for h in hours],
                                    pa.int64()),
        "n_events": pa.array(n, pa.int64()),
        "is_spike": pa.array(spike, pa.int64()),
    })


def tumbling_window_counts(ds: ray.data.Dataset, window_s: int = 3600
                           ) -> ray.data.Dataset:
    """Per (user_id, tumbling window): event count + exact min/max value.
    Window key = epoch_us // window_us (integer math — oracle-exact).
    -> (user_id, window_start_us, n_events, min_value, max_value)."""
    w_us = window_s * US

    def add_window(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": batch["user_id"],
            "window_start_us": pa.array((ts // w_us) * w_us, pa.int64()),
            "value": batch["value"],
        })

    return ds.map_batches(add_window, batch_format="pyarrow") \
             .groupby(["user_id", "window_start_us"]) \
             .aggregate(Count(alias_name="n_events"),
                        Min("value", alias_name="min_value"),
                        Max("value", alias_name="max_value"))


def sliding_window_counts(ds: ray.data.Dataset, window_s: int = 3600,
                          slide_s: int = 900) -> ray.data.Dataset:
    """Per (user_id, SLIDING window): event count.  Each event belongs
    to ``window_s / slide_s`` overlapping windows; the assignment is a
    vectorized fan-out (np.repeat/tile — one row per (event, window))
    followed by the same small groupby as the tumbling case.  Integer
    window keys -> oracle-exact.
    -> (user_id, window_start_us, n_events)."""
    assert window_s % slide_s == 0, "window must be a multiple of slide"
    k = window_s // slide_s
    s_us = slide_s * US

    def fan_out(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        base = (ts // s_us) * s_us
        # windows starting at base, base - s, ..., base - (k-1)*s all
        # contain ts (window length = k * s)
        offs = (np.arange(k, dtype=np.int64) * s_us)
        starts = (base[:, None] - offs[None, :]).reshape(-1)
        uid = batch["user_id"]
        if isinstance(uid, pa.ChunkedArray):
            uid = uid.combine_chunks()
        take = pa.array(np.repeat(np.arange(len(ts), dtype=np.int64), k))
        return pa.table({
            "user_id": uid.take(take),
            "window_start_us": pa.array(starts, pa.int64()),
        })

    return ds.map_batches(fan_out, batch_format="pyarrow") \
             .groupby(["user_id", "window_start_us"]) \
             .aggregate(Count(alias_name="n_events"))


def sessionize(ds: ray.data.Dataset, gap_s: int = 1800) -> ray.data.Dataset:
    """Session windows per user: a session ends after ``gap_s`` of
    inactivity (the classic gaps-and-islands computation, done per user
    group over the ts-sorted group — the stateful-window pattern).
    -> (user_id, session_start_us, session_end_us, n_events)."""
    gap_us = gap_s * US

    def sessions(g: pa.Table) -> pa.Table:
        # Arrow/numpy end-to-end (round-2 verdict: this was the engine's
        # only pandas stage).  reduceat on session boundaries replaces the
        # per-group pandas groupby — one pass, no per-session Python.
        ts = np.sort(g["ts"].to_numpy(zero_copy_only=False).astype(np.int64))
        if ts.size == 0:
            return pa.table({"user_id": g["user_id"].slice(0, 0),
                             "session_start_us": pa.array([], pa.int64()),
                             "session_end_us": pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64())})
        new_session = np.empty(ts.size, dtype=bool)
        new_session[0] = True
        np.greater(np.diff(ts), gap_us, out=new_session[1:])
        starts = np.flatnonzero(new_session)
        ends = np.append(starts[1:], ts.size) - 1
        uid = g["user_id"]
        if isinstance(uid, pa.ChunkedArray):
            uid = uid.combine_chunks()
        return pa.table({
            "user_id": uid.take(pa.array(np.zeros(starts.size, np.int64))),
            "session_start_us": pa.array(ts[starts], pa.int64()),
            "session_end_us": pa.array(ts[ends], pa.int64()),
            "n_events": pa.array((ends - starts + 1).astype(np.int64),
                                 pa.int64()),
        })

    return ds.groupby("user_id").map_groups(sessions, batch_format="pyarrow")


def window_distinct_users(ds: ray.data.Dataset, window_s: int = 21600
                          ) -> ray.data.Dataset:
    """Distinct users per tumbling window — the DAU/HAU-style
    cardinality companion of ``tumbling_window_counts`` (which counts
    events; unique actors is the metric dashboards actually chart).
    Exact: per-batch (window, user) dedup partials, one groupby on the
    composite key dedups globally, then a bounded per-window count —
    the ``hll_users_by_type`` registers are the sketch swap when exact
    windows get too wide.  -> (window_start_us, n_users)."""
    from ray.data.aggregate import Count
    w_us = window_s * US

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        uid = batch["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        w = (ts // w_us) * w_us
        u = np.unique(np.stack([w, uid], axis=1), axis=0)
        return pa.table({"window_start_us": pa.array(u[:, 0], pa.int64()),
                         "user_id": pa.array(u[:, 1], pa.int64())})

    dedup = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["window_start_us", "user_id"]) \
        .aggregate(Count(alias_name="_c"))

    def drop(batch: pa.Table) -> pa.Table:
        return batch.select(["window_start_us"])

    return dedup.map_batches(drop, batch_format="pyarrow") \
        .groupby("window_start_us").aggregate(Count(alias_name="n_users"))


def top_sessions(ds: ray.data.Dataset, gap_s: int = 1800,
                 k: int = 10) -> pa.Table:
    """Highest-VALUE sessions corpus-wide — the "whale session" view a
    revenue dashboard leads with: :func:`sessionize`'s gaps-and-islands
    windows carrying exact e6 value sums, ranked globally.  Two-stage
    selection: each user's group emits only its local top-k sessions,
    so the driver merge sees O(users x k) rows, never every session.
    Value sums use reduceat over ts-sorted e6 ints (tie order within a
    timestamp can't change session membership or sums).
    -> (rnk, user_id, session_start_us, n_events, value_e6), top-k by
    (value desc, user asc, start asc)."""
    gap_us = gap_s * US

    def sessions(g: pa.Table) -> pa.Table:
        ts = g["ts"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = np.floor(g["value"].to_numpy(zero_copy_only=False)
                     .astype(np.float64) * 1_000_000 + 0.5) \
            .astype(np.int64)
        order = np.argsort(ts, kind="stable")
        ts, v = ts[order], v[order]
        if ts.size == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "session_start_us": pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64()),
                             "value_e6": pa.array([], pa.int64())})
        new_session = np.empty(ts.size, dtype=bool)
        new_session[0] = True
        np.greater(np.diff(ts), gap_us, out=new_session[1:])
        starts = np.flatnonzero(new_session)
        ends = np.append(starts[1:], ts.size) - 1
        val = np.add.reduceat(v, starts)
        n = (ends - starts + 1).astype(np.int64)
        top = np.lexsort((ts[starts], -val))[:k]     # local top-k
        uid = int(g["user_id"][0].as_py())
        return pa.table({
            "user_id": pa.array(np.full(top.size, uid), pa.int64()),
            "session_start_us": pa.array(ts[starts][top], pa.int64()),
            "n_events": pa.array(n[top], pa.int64()),
            "value_e6": pa.array(val[top], pa.int64()),
        })

    rows = ds.groupby("user_id").map_groups(
        sessions, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: (-int(r["value_e6"]), int(r["user_id"]),
                             int(r["session_start_us"])))
    rows = rows[:k]
    return pa.table({
        "rnk": pa.array(range(1, len(rows) + 1), pa.int64()),
        "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
        "session_start_us": pa.array([r["session_start_us"]
                                      for r in rows], pa.int64()),
        "n_events": pa.array([r["n_events"] for r in rows], pa.int64()),
        "value_e6": pa.array([r["value_e6"] for r in rows], pa.int64()),
    })


def interarrival_stats(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Per-user inter-arrival statistics — the LAG/LEAD window-function
    family member (gap = ts - lag(ts) over user-ordered events; the
    reference's event streams are exactly such per-source time series).

    Per-user group: sort timestamps, diff — the gap MULTISET (and so
    every sum/count/mean over it) is invariant to how equal timestamps
    tie-break, so no secondary sort key is needed and the SQL oracle may
    order by ts alone.  avg is exact integer floor-division (both sides
    compute sum_us // n).  -> (user_id, n_gaps, sum_gap_us, avg_gap_us)
    for users with >= 2 events, one row per user."""

    def gaps(g: pa.Table) -> pa.Table:
        empty = pa.table({"user_id": pa.array([], pa.int64()),
                          "n_gaps": pa.array([], pa.int64()),
                          "sum_gap_us": pa.array([], pa.int64()),
                          "avg_gap_us": pa.array([], pa.int64())})
        ts = np.sort(g["ts"].to_numpy(zero_copy_only=False).astype(np.int64))
        if ts.size < 2:
            return empty
        d = np.diff(ts)
        uid = int(g["user_id"][0].as_py())
        s = int(d.sum())
        return pa.table({
            "user_id": pa.array([uid], pa.int64()),
            "n_gaps": pa.array([d.size], pa.int64()),
            "sum_gap_us": pa.array([s], pa.int64()),
            "avg_gap_us": pa.array([s // d.size], pa.int64()),
        })

    return ds.groupby("user_id").map_groups(gaps, batch_format="pyarrow")


def date_histogram_filled(ds: ray.data.Dataset) -> pa.Table:
    """ES ``date_histogram`` with calendar-day buckets and
    ``min_doc_count=0`` zero-fill between the first and last bucket
    (ES emits EMPTY buckets inside the extended bounds — a plain
    groupby cannot).  -> (epoch_day, n_events), contiguous days.

    Scale shape: per-batch integer-day partial counts fold through one
    tiny groupby (bucket count = day span, not event count); the
    zero-fill runs on the folded result, which is bounded by the time
    span — never by the data."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        days, counts = np.unique(us // (86_400 * US), return_counts=True)
        return pa.table({"epoch_day": pa.array(days, pa.int64()),
                         "n_p": pa.array(counts.astype(np.int64),
                                         pa.int64())})

    folded = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("epoch_day").aggregate(Sum("n_p", alias_name="n")) \
        .take_all()
    if not folded:
        return pa.table({"epoch_day": pa.array([], pa.int64()),
                         "n_events": pa.array([], pa.int64())})
    by_day = {int(r["epoch_day"]): int(r["n"]) for r in folded}
    lo, hi = min(by_day), max(by_day)
    days = np.arange(lo, hi + 1, dtype=np.int64)
    return pa.table({
        "epoch_day": pa.array(days, pa.int64()),
        "n_events": pa.array([by_day.get(int(d), 0) for d in days],
                             pa.int64()),
    })


def date_histogram_cumulative(ds: ray.data.Dataset) -> pa.Table:
    """ES PIPELINE aggregations over the date_histogram:
    ``cumulative_sum`` and ``derivative`` computed on the (tiny,
    span-bounded) folded bucket table — exactly where ES computes them:
    on the reduced agg result, never on the raw stream.  The first
    bucket's derivative is null (ES emits none for it).
    -> (epoch_day, n_events, cum_events, delta_events)."""
    base = date_histogram_filled(ds)
    n = base["n_events"].to_numpy(zero_copy_only=False).astype(np.int64)
    cum = np.cumsum(n, dtype=np.int64)
    delta = np.empty(n.size, dtype=object)
    delta[1:] = (n[1:] - n[:-1]).tolist()
    if n.size:
        delta[0] = None
    return pa.table({
        "epoch_day": base["epoch_day"],
        "n_events": base["n_events"],
        "cum_events": pa.array(cum, pa.int64()),
        "delta_events": pa.array(delta.tolist(), pa.int64()),
    })


def funnel_counts(ds: ray.data.Dataset, first: str = "click",
                  second: str = "purchase",
                  within_s: int = 3600) -> pa.Table:
    """Two-step FUNNEL: of the users whose stream contains ``first``,
    how many performed ``second`` within ``within_s`` after their FIRST
    ``first`` — the conversion query every event-analytics store ships
    (and a per-source stateful pass over exactly the reference's event
    streams).  One groupby(user) pass; each group folds to three bits,
    so the reduce moves O(n_users) tiny rows.
    -> one row (n_users, n_first, n_converted)."""
    from ray.data.aggregate import Sum
    w_us = within_s * US

    def per_user(g: pa.Table) -> pa.Table:
        ts = g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        et = g["event_type"].to_numpy(zero_copy_only=False)
        first_ts = ts[et == first]
        has_first = first_ts.size > 0
        conv = False
        if has_first:
            t0 = int(first_ts.min())
            sec = ts[et == second]
            conv = bool(((sec > t0) & (sec <= t0 + w_us)).any())
        return pa.table({
            "u_p": pa.array([1], pa.int64()),
            "f_p": pa.array([int(has_first)], pa.int64()),
            "c_p": pa.array([int(conv)], pa.int64()),
        })

    agg = ds.groupby("user_id").map_groups(per_user,
                                           batch_format="pyarrow") \
        .aggregate(Sum("u_p", alias_name="n_users"),
                   Sum("f_p", alias_name="n_first"),
                   Sum("c_p", alias_name="n_converted"))
    return pa.table({
        "n_users": pa.array([int(agg["n_users"] or 0)], pa.int64()),
        "n_first": pa.array([int(agg["n_first"] or 0)], pa.int64()),
        "n_converted": pa.array([int(agg["n_converted"] or 0)], pa.int64()),
    })


def retention_cohorts(ds: ray.data.Dataset,
                      horizon_days: int = 7) -> ray.data.Dataset:
    """COHORT RETENTION: group users by their first-activity day, count
    how many were active again exactly ``horizon_days`` later (classic
    D7 retention).  Per-user fold to (cohort_day, retained) — one bit
    per user — then a tiny per-cohort sum.
    -> (cohort_day, n_users, n_retained) by cohort_day."""
    from ray.data.aggregate import Sum
    day_us = 86_400 * US

    def per_user(g: pa.Table) -> pa.Table:
        days = np.unique(g["ts"].cast(pa.int64())
                         .to_numpy(zero_copy_only=False) // day_us)
        cohort = int(days[0])
        ret = int(np.searchsorted(days, cohort + horizon_days) < days.size
                  and days[np.searchsorted(days, cohort + horizon_days)]
                  == cohort + horizon_days)
        return pa.table({
            "cohort_day": pa.array([cohort], pa.int64()),
            "n_p": pa.array([1], pa.int64()),
            "r_p": pa.array([ret], pa.int64()),
        })

    return ds.groupby("user_id").map_groups(per_user,
                                            batch_format="pyarrow") \
        .groupby("cohort_day") \
        .aggregate(Sum("n_p", alias_name="n_users"),
                   Sum("r_p", alias_name="n_retained")) \
        .sort("cohort_day")


def user_event_paths(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Ordered STRING_AGG per user: the user's event-type sequence
    joined by '>' in (ts, event_id) order — the path-analysis export
    (and SQL's ``string_agg(... ORDER BY ...)``, an ordered aggregate
    the Dataset API lacks).  -> (user_id, n_events, path)."""

    def per_user(g: pa.Table) -> pa.Table:
        ts = g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        et = g["event_type"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        return pa.table({
            "user_id": pa.array([int(g["user_id"][0].as_py())], pa.int64()),
            "n_events": pa.array([ts.size], pa.int64()),
            "path": pa.array([">".join(et[order])], pa.string()),
        })

    return ds.groupby("user_id").map_groups(per_user,
                                            batch_format="pyarrow") \
        .sort("user_id")


def event_transitions(ds: ray.data.Dataset) -> ray.data.Dataset:
    """First-order Markov transition counts: consecutive event-type
    pairs per user in (ts, event_id) order, folded globally — the
    behavioral path-mining table (and the event-stream sibling of the
    corpus bigram fold).  Per-user group sorts locally and emits its
    (a, b, n) partials; a tiny groupby sums them.
    -> (prev_type, next_type, n) sorted."""
    from ray.data.aggregate import Sum

    def per_user(g: pa.Table) -> pa.Table:
        ts = g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        et = g["event_type"].to_numpy(zero_copy_only=False)
        if ts.size < 2:
            return pa.table({"prev_type": pa.array([], pa.string()),
                             "next_type": pa.array([], pa.string()),
                             "n_p": pa.array([], pa.int64())})
        order = np.lexsort((eid, ts))
        seq = et[order]
        t = pa.table({"prev_type": pa.array(seq[:-1]),
                      "next_type": pa.array(seq[1:])})
        g2 = t.group_by(["prev_type", "next_type"]) \
            .aggregate([([], "count_all")])
        return pa.table({"prev_type": g2["prev_type"],
                         "next_type": g2["next_type"],
                         "n_p": g2["count_all"].cast(pa.int64())})

    return ds.groupby("user_id").map_groups(per_user,
                                            batch_format="pyarrow") \
        .groupby(["prev_type", "next_type"]) \
        .aggregate(Sum("n_p", alias_name="n")) \
        .sort(["prev_type", "next_type"])


def date_histogram_moving_avg(ds: ray.data.Dataset,
                              window: int = 3) -> pa.Table:
    """ES ``moving_avg`` / ``moving_fn`` pipeline aggregation: a
    trailing ``window``-bucket average over the zero-filled
    date_histogram.  Like every ES pipeline agg it runs on the REDUCED
    bucket table (span-bounded), never on the raw stream — the heavy
    fold is :func:`date_histogram_filled`.

    Exact integer semantics so the oracle hashes match:
    ``ma_e6 = floor(window_sum * 1e6 / window_count)`` with
    ``window_count = min(i + 1, window)`` (ES emits partial windows at
    the head).  -> (epoch_day, n_events, ma_e6)."""
    base = date_histogram_filled(ds)
    n = base["n_events"].to_numpy(zero_copy_only=False).astype(np.int64)
    cum = np.concatenate([[0], np.cumsum(n, dtype=np.int64)])
    i = np.arange(n.size, dtype=np.int64)
    lo = np.maximum(i + 1 - window, 0)
    wsum = cum[i + 1] - cum[lo]
    wcnt = i + 1 - lo
    ma = wsum * 1_000_000 // np.maximum(wcnt, 1)
    return pa.table({
        "epoch_day": base["epoch_day"],
        "n_events": base["n_events"],
        "ma_e6": pa.array(ma, pa.int64()),
    })


def event_trigrams(ds: ray.data.Dataset, k: int = 20) -> pa.Table:
    """Sequential-pattern mining one level past the Markov table:
    per-user ordered event-type TRIGRAMS, folded globally, top-``k`` by
    (count desc, types asc) — the 3-step behavioral paths a funnel
    designer mines for.  Same shape as :func:`event_transitions`: each
    user group sorts locally in (ts, event_id) order and emits its
    trigram partials; the global fold is type-cardinality^3-bounded.
    -> (t1, t2, t3, n)."""
    from ray.data.aggregate import Sum

    def per_user(g: pa.Table) -> pa.Table:
        ts = g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        et = g["event_type"].to_numpy(zero_copy_only=False)
        if ts.size < 3:
            return pa.schema([("t1", pa.string()), ("t2", pa.string()),
                              ("t3", pa.string()),
                              ("n_p", pa.int64())]).empty_table()
        order = np.lexsort((eid, ts))
        seq = et[order]
        t = pa.table({"t1": pa.array(seq[:-2]),
                      "t2": pa.array(seq[1:-1]),
                      "t3": pa.array(seq[2:])})
        g2 = t.group_by(["t1", "t2", "t3"]).aggregate([([], "count_all")])
        return pa.table({"t1": g2["t1"], "t2": g2["t2"], "t3": g2["t3"],
                         "n_p": g2["count_all"].cast(pa.int64())})

    folded = ds.groupby("user_id").map_groups(per_user,
                                              batch_format="pyarrow") \
        .groupby(["t1", "t2", "t3"]).aggregate(Sum("n_p", alias_name="n")) \
        .take_all()
    rows = sorted(((-int(r["n"]), str(r["t1"]), str(r["t2"]),
                    str(r["t3"])) for r in folded))[:k]
    return pa.table({
        "t1": pa.array([r[1] for r in rows], pa.string()),
        "t2": pa.array([r[2] for r in rows], pa.string()),
        "t3": pa.array([r[3] for r in rows], pa.string()),
        "n": pa.array([-r[0] for r in rows], pa.int64()),
    })


def funnel_timed(ds: ray.data.Dataset, first: str = "click",
                 second: str = "purchase",
                 window_us: int = 3_600_000_000) -> pa.Table:
    """Time-bounded conversion funnel: users whose FIRST ``first`` event
    is followed by a ``second`` event within ``window_us`` — the
    attribution-window refinement of the plain funnel (a purchase a
    week later doesn't convert the click).

    Per-user ``map_groups``: one searchsorted from the first trigger
    into the sorted ``second`` timestamps; the fold is three counters.
    -> one row (n_users_first, n_converted, conv_e6)."""
    from ray.data.aggregate import Sum

    def per_user(g: pa.Table) -> pa.Table:
        ts = g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        et = g["event_type"].to_numpy(zero_copy_only=False)
        t1 = ts[et == first]
        has_first = int(t1.size > 0)
        conv = 0
        if has_first:
            t0 = int(t1.min())
            t2 = np.sort(ts[et == second])
            j = np.searchsorted(t2, t0, side="right")
            conv = int(j < t2.size and t2[j] <= t0 + window_us)
        return pa.table({"f_p": pa.array([has_first], pa.int64()),
                         "c_p": pa.array([conv], pa.int64())})

    agg = ds.select_columns(["user_id", "ts", "event_type"]) \
        .groupby("user_id").map_groups(per_user, batch_format="pyarrow") \
        .aggregate(Sum("f_p", alias_name="nf"),
                   Sum("c_p", alias_name="nc"))
    nf = int(agg["sum(f_p)"] if "sum(f_p)" in agg else agg["nf"])
    nc = int(agg["sum(c_p)"] if "sum(c_p)" in agg else agg["nc"])
    return pa.table({
        "n_users_first": pa.array([nf], pa.int64()),
        "n_converted": pa.array([nc], pa.int64()),
        "conv_e6": pa.array([nc * 10 ** 6 // nf if nf else 0],
                            pa.int64()),
    })


def event_debounce(ds: ray.data.Dataset,
                   gap_us: int = 3_600_000_000) -> ray.data.Dataset:
    """Trailing-debounce dedup of an event stream: per (user, type), an
    event is a DUPLICATE if it follows the previous event of that key
    by less than ``gap_us`` (repeated clicks, retry storms) — the
    stream-hygiene pass before funnel/retention math.

    Per-key ``map_groups`` sorts locally and diffs timestamps; the fold
    is key-cardinality-sized.  -> (event_type, n_events, n_kept,
    n_dropped) aggregated per type across users."""
    from ray.data.aggregate import Sum

    def per_key(g: pa.Table) -> pa.Table:
        ts = np.sort(g["ts"].cast(pa.int64())
                     .to_numpy(zero_copy_only=False))
        n = ts.size
        kept = 1 + int((np.diff(ts) >= gap_us).sum()) if n else 0
        return pa.table({
            "event_type": pa.array([g["event_type"][0].as_py()],
                                   pa.string()),
            "n_p": pa.array([n], pa.int64()),
            "k_p": pa.array([kept], pa.int64()),
        })

    def add_dropped(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.schema([("event_type", pa.string()),
                              ("n_events", pa.int64()),
                              ("n_kept", pa.int64()),
                              ("n_dropped", pa.int64())]).empty_table()
        ne = t["n_events"].to_numpy(zero_copy_only=False).astype(np.int64)
        nk = t["n_kept"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "event_type": t["event_type"],
            "n_events": pa.array(ne, pa.int64()),
            "n_kept": pa.array(nk, pa.int64()),
            "n_dropped": pa.array(ne - nk, pa.int64()),
        })

    return ds.select_columns(["user_id", "event_type", "ts"]) \
        .groupby(["user_id", "event_type"]) \
        .map_groups(per_key, batch_format="pyarrow") \
        .groupby("event_type") \
        .aggregate(Sum("n_p", alias_name="n_events"),
                   Sum("k_p", alias_name="n_kept")) \
        .map_batches(add_dropped, batch_format="pyarrow") \
        .sort("event_type")


def value_trend_by_type(events: ray.data.Dataset) -> ray.data.Dataset:
    """Per-type linear trend (exact integer least squares): the slope
    of value vs time in e3-value-units per DAY — the drift detector a
    metrics pipeline alerts on.  Time quantizes to epoch days and
    values to e3, so all second-moment sums fit int64 and the slope
    ``(nΣty − ΣtΣy) * 1e6 // (nΣtt − (Σt)²)`` is bit-exact (bigint
    finalize; trunc toward zero like the oracle).

    One streaming pass of per-type Acero partials; type-cardinality
    shuffle.  -> (event_type, n, slope_e6_per_day)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        td = (ts // 86_400_000_000).astype(np.int64)
        v = np.floor(batch["value"].to_numpy(zero_copy_only=False)
                     .astype(np.float64) * 1000 + 0.5).astype(np.int64)
        t = pa.table({
            "event_type": batch["event_type"],
            "one": pa.array(np.ones(td.size, np.int64)),
            "st": pa.array(td, pa.int64()),
            "sy": pa.array(v, pa.int64()),
            "sty": pa.array(td * v, pa.int64()),
            "stt": pa.array(td * td, pa.int64()),
        }).group_by("event_type").aggregate(
            [("one", "sum"), ("st", "sum"), ("sy", "sum"),
             ("sty", "sum"), ("stt", "sum")])
        return t.rename_columns(["event_type", "n_p", "st_p", "sy_p",
                                 "sty_p", "stt_p"])

    folded = events.select_columns(["event_type", "ts", "value"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("event_type").aggregate(
            Sum("n_p", alias_name="n"), Sum("st_p", alias_name="st"),
            Sum("sy_p", alias_name="sy"), Sum("sty_p", alias_name="sty"),
            Sum("stt_p", alias_name="stt"))

    def finalize(batch: pa.Table) -> pa.Table:
        out = {"event_type": [], "n": [], "slope_e6_per_day": []}
        for r in batch.to_pylist():
            n, st, sy = int(r["n"]), int(r["st"]), int(r["sy"])
            sty, stt = int(r["sty"]), int(r["stt"])
            num = (n * sty - st * sy) * 10 ** 6
            den = n * stt - st * st
            q = abs(num) // den if den else 0
            out["event_type"].append(r["event_type"])
            out["n"].append(n)
            out["slope_e6_per_day"].append(-q if num < 0 and den else q)
        return pa.table({
            "event_type": pa.array(out["event_type"], pa.string()),
            "n": pa.array(out["n"], pa.int64()),
            "slope_e6_per_day": pa.array(out["slope_e6_per_day"],
                                         pa.int64()),
        })

    return folded.map_batches(finalize, batch_format="pyarrow") \
        .sort("event_type")


def user_growth(ds: ray.data.Dataset) -> pa.Table:
    """Cumulative-adoption curve: per epoch day, how many users were
    seen for the FIRST time and the running total — the growth chart
    every product dashboard opens with, computed without replaying the
    stream per day (the event-stream sibling of the Heaps-law fold).

    One distributed Min fold (user -> first day, user-cardinality
    rows); the cumulative sum runs over the tiny day table.
    -> (epoch_day, n_new_users, cum_users)."""
    from ray.data.aggregate import Min

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        td = (ts // 86_400_000_000).astype(np.int64)
        t = pa.table({"user_id": batch["user_id"],
                      "d": pa.array(td, pa.int64())})
        g = t.group_by("user_id").aggregate([("d", "min")])
        return g.rename_columns(["user_id", "fd_p"])

    folded = ds.select_columns(["user_id", "ts"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("user_id").aggregate(Min("fd_p", alias_name="first_day")) \
        .take_all()
    days = np.sort(np.asarray([int(r["first_day"]) for r in folded],
                              dtype=np.int64))
    uq, counts = np.unique(days, return_counts=True)
    cum = np.cumsum(counts, dtype=np.int64)
    return pa.table({
        "epoch_day": pa.array(uq, pa.int64()),
        "n_new_users": pa.array(counts.astype(np.int64), pa.int64()),
        "cum_users": pa.array(cum, pa.int64()),
    })


def dow_pivot(ds: ray.data.Dataset) -> pa.Table:
    """Pivoted weekly profile: event counts per (type, day-of-week) as
    ONE WIDE ROW per type (dow_0=Monday .. dow_6=Sunday) — the pivot
    shape a BI layer consumes directly.  Day-of-week is exact integer
    calendar math on epoch days ((d + 3) % 7 maps 1970-01-01/Thursday
    to 3).  The fold is (type x 7)-sized; the pivot runs on that tiny
    table.  -> (event_type, dow_0..dow_6)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        dow = ((ts // 86_400_000_000 + 3) % 7).astype(np.int64)
        t = pa.table({"event_type": batch["event_type"],
                      "dow": pa.array(dow, pa.int64())})
        g = t.group_by(["event_type", "dow"]).aggregate([([], "count_all")])
        return g.rename_columns(["event_type", "dow", "n_p"])

    folded = ds.select_columns(["event_type", "ts"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["event_type", "dow"]).aggregate(Sum("n_p",
                                                      alias_name="n")) \
        .take_all()
    grid: dict[str, list[int]] = {}
    for r in folded:
        grid.setdefault(str(r["event_type"]), [0] * 7)[int(r["dow"])] = \
            int(r["n"])
    types = sorted(grid)
    cols = {"event_type": pa.array(types, pa.string())}
    for d in range(7):
        cols[f"dow_{d}"] = pa.array([grid[t][d] for t in types],
                                    pa.int64())
    return pa.table(cols)


def peak_hour_by_type(ds: ray.data.Dataset) -> pa.Table:
    """Peak-load detection: for each event type, the hour-of-day with the
    most events (ties -> earliest hour) — the capacity-planning number.
    Hour is exact integer math; the fold is (type x 24)-sized.
    -> (event_type, peak_hour, n_events)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        hr = ((ts // 3_600_000_000) % 24).astype(np.int64)
        t = pa.table({"event_type": batch["event_type"],
                      "hour": pa.array(hr, pa.int64())})
        g = t.group_by(["event_type", "hour"]).aggregate([([],
                                                           "count_all")])
        return g.rename_columns(["event_type", "hour", "n_p"])

    folded = ds.select_columns(["event_type", "ts"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["event_type", "hour"]).aggregate(Sum("n_p",
                                                       alias_name="n")) \
        .take_all()
    best: dict[str, tuple[int, int]] = {}
    for r in folded:
        et = str(r["event_type"])
        cand = (-int(r["n"]), int(r["hour"]))
        if et not in best or cand < best[et]:
            best[et] = cand
    types = sorted(best)
    return pa.table({
        "event_type": pa.array(types, pa.string()),
        "peak_hour": pa.array([best[t][1] for t in types], pa.int64()),
        "n_events": pa.array([-best[t][0] for t in types], pa.int64()),
    })


def user_activity_percentiles(ds: ray.data.Dataset,
                              pcts: tuple[int, ...] = (50, 90, 99)
                              ) -> pa.Table:
    """Events-per-user distribution percentiles (exact, discrete): the
    activity-skew view that decides per-user group sizing (a p99 user
    1000x the median is the mega-group a sessionize cap must handle).

    Per-user counts fold distributed; the percentile cut runs on the
    count-of-counts histogram (bounded by the distinct activity
    levels, not the user count).  Rank convention =
    ``percentile_disc``: value at 1-indexed rank ``ceil(p*n/100)``.
    -> (pct, events_per_user)."""
    from ray.data.aggregate import Count as RCount, Sum as RSum

    per_user = ds.select_columns(["user_id"]) \
        .groupby("user_id").aggregate(RCount(alias_name="n_ev"))

    def hist(batch: pa.Table) -> pa.Table:
        n = batch["n_ev"].to_numpy(zero_copy_only=False).astype(np.int64)
        uq, c = np.unique(n, return_counts=True)
        return pa.table({"n_ev": pa.array(uq, pa.int64()),
                         "c_p": pa.array(c.astype(np.int64), pa.int64())})

    folded = per_user.map_batches(hist, batch_format="pyarrow") \
        .groupby("n_ev").aggregate(RSum("c_p", alias_name="c")) \
        .take_all()
    folded.sort(key=lambda r: int(r["n_ev"]))
    vals = np.asarray([int(r["n_ev"]) for r in folded], dtype=np.int64)
    cnt = np.asarray([int(r["c"]) for r in folded], dtype=np.int64)
    cum = np.cumsum(cnt)
    n_users = int(cum[-1]) if cum.size else 0
    out_p, out_v = [], []
    for p in pcts:
        if not n_users:
            continue
        rank = -(-p * n_users // 100)          # ceil(p*n/100), 1-indexed
        out_p.append(int(p))
        out_v.append(int(vals[np.searchsorted(cum, rank)]))
    return pa.table({"pct": pa.array(out_p, pa.int64()),
                     "events_per_user": pa.array(out_v, pa.int64())})


def date_histogram_moving_pcts(ds: ray.data.Dataset, window: int = 7,
                               qs: tuple[int, ...] = (50, 90)) -> pa.Table:
    """ES ``moving_percentiles`` pipeline aggregation: exact trailing
    ``window``-bucket percentiles of the zero-filled date_histogram
    (partial head windows included, like every ES pipeline agg).

    Discrete percentile rule (pinned so the oracle can reproduce it):
    ``p_q = sorted(window)[ceil(q/100 * len) - 1]`` — the classic
    nearest-rank definition.  Runs on the REDUCED bucket table
    (span-bounded, the heavy fold is :func:`date_histogram_filled`).
    -> (epoch_day, n_events, p{q}...) ascending."""
    base = date_histogram_filled(ds)
    n = base["n_events"].to_numpy(zero_copy_only=False).astype(np.int64)
    out: dict[int, np.ndarray] = {q: np.zeros(n.size, dtype=np.int64)
                                  for q in qs}
    for i in range(n.size):
        w = np.sort(n[max(0, i + 1 - window):i + 1])
        for q in qs:
            idx = max(int(np.ceil(q / 100.0 * w.size)) - 1, 0)
            out[q][i] = w[idx]
    cols = {"epoch_day": base["epoch_day"], "n_events": base["n_events"]}
    for q in qs:
        cols[f"p{q}"] = pa.array(out[q], pa.int64())
    return pa.table(cols)


#: the ES auto_date_histogram rounding ladder (µs): 1h, 6h, 1d, 7d, 30d.
AUTO_HIST_LADDER_US = (3_600 * US, 21_600 * US, 86_400 * US,
                       604_800 * US, 2_592_000 * US)


def auto_date_histogram(ds: ray.data.Dataset,
                        target_buckets: int = 20) -> pa.Table:
    """ES ``auto_date_histogram``: the engine PICKS the calendar
    interval — the smallest rung of the rounding ladder whose bucket
    count fits ``target_buckets`` — instead of the caller guessing one.

    Two cheap passes: a min/max fold over ``ts`` only (column-pruned)
    decides the interval with pure integer arithmetic
    (``hi // iv - lo // iv + 1 <= target``), then the standard
    per-batch partial count + tiny groupby at that interval.  Both
    decisions are exact integers -> SQL-reproducible.
    -> (interval_us, bucket, n_events) non-empty buckets, bucket asc."""
    from ray.data.aggregate import Max as RMax, Min as RMin, Sum

    def mm_partial(batch: pa.Table) -> pa.Table:
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"lo": pa.array([int(us.min())], pa.int64()),
                         "hi": pa.array([int(us.max())], pa.int64())})

    lo, hi = None, None
    for b in ds.select_columns(["ts"]) \
            .map_batches(mm_partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        blo = int(pc.min(b["lo"]).as_py())
        bhi = int(pc.max(b["hi"]).as_py())
        lo = blo if lo is None else min(lo, blo)
        hi = bhi if hi is None else max(hi, bhi)
    if lo is None:
        return pa.table({"interval_us": pa.array([], pa.int64()),
                         "bucket": pa.array([], pa.int64()),
                         "n_events": pa.array([], pa.int64())})
    iv = AUTO_HIST_LADDER_US[-1]
    for cand in AUTO_HIST_LADDER_US:
        if hi // cand - lo // cand + 1 <= target_buckets:
            iv = cand
            break

    def partial(batch: pa.Table) -> pa.Table:
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        bk, counts = np.unique(us // iv, return_counts=True)
        return pa.table({"bucket": pa.array(bk, pa.int64()),
                         "n_p": pa.array(counts.astype(np.int64),
                                         pa.int64())})

    folded = ds.select_columns(["ts"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("bucket").aggregate(Sum("n_p", alias_name="n_events")) \
        .sort("bucket").take_all()
    return pa.table({
        "interval_us": pa.array([iv] * len(folded), pa.int64()),
        "bucket": pa.array([int(r["bucket"]) for r in folded], pa.int64()),
        "n_events": pa.array([int(r["n_events"]) for r in folded],
                             pa.int64()),
    })


def date_histogram_serial_diff(ds: ray.data.Dataset,
                               lag: int = 7) -> pa.Table:
    """ES ``serial_diff`` pipeline aggregation: n(t) - n(t-lag) over the
    zero-filled daily histogram — lag 7 removes weekly seasonality so
    trend shifts stand out.  Computed where ES computes it: on the
    span-bounded folded bucket table; the first ``lag`` buckets emit
    NULL exactly like ES.  -> (epoch_day, n_events, diff_events)."""
    base = date_histogram_filled(ds)
    n = base["n_events"].to_numpy(zero_copy_only=False).astype(np.int64)
    diff = np.empty(n.size, dtype=object)
    if n.size > lag:
        diff[lag:] = (n[lag:] - n[:-lag]).tolist()
    return pa.table({
        "epoch_day": base["epoch_day"],
        "n_events": base["n_events"],
        "diff_events": pa.array(diff.tolist(), pa.int64()),
    })


def date_histogram_ewma(ds: ray.data.Dataset,
                        alpha_e6: int = 300_000) -> pa.Table:
    """ES ``moving_fn`` with the builtin ``MovingFunctions.ewma``:
    exponentially-weighted moving average of the zero-filled daily
    histogram, s_t = alpha*x_t + (1-alpha)*s_{t-1} with s_0 = x_0.
    Computed on the span-bounded folded buckets like every pipeline
    agg.  The float recursion is written in its expanded weighted-sum
    form (sum over j of alpha(1-alpha)^(t-j) x_j, oldest term first,
    plus the (1-alpha)^t x_0 seed) so the SQL oracle can reproduce the
    identical operation order with a window sum — bucket count is
    span-bounded, the O(span^2) oracle form is fine.
    -> (epoch_day, n_events, ewma_e6)."""
    base = date_histogram_filled(ds)
    n = base["n_events"].to_numpy(zero_copy_only=False).astype(np.int64)
    alpha = alpha_e6 / 1_000_000.0
    out = np.zeros(n.size, dtype=np.float64)
    for t in range(n.size):                    # span-bounded (~days), not data
        acc = (1.0 - alpha) ** t * n[0]
        for j in range(1, t + 1):
            acc += alpha * (1.0 - alpha) ** (t - j) * n[j]
        out[t] = acc
    return pa.table({
        "epoch_day": base["epoch_day"],
        "n_events": base["n_events"],
        "ewma_e6": pa.array(np.floor(out * 1_000_000 + 0.5)
                            .astype(np.int64), pa.int64()),
    })


def cep_no_interruption(ds: ray.data.Dataset, first: str = "click",
                        second: str = "purchase",
                        blocker: str = "error") -> pa.Table:
    """CEP ABSENCE pattern — "A then B with no C between" (the
    complex-event-processing shape funnels can't express: a funnel
    counts A->B, this REJECTS the pair when a blocker interrupts):
    for every ``second`` event, the pattern matches iff the most recent
    ``first`` event by the same user precedes it with no ``blocker``
    in between.  The purchase-after-click-without-error conversion a
    checkout team alarms on.

    Distributed like every per-user window here: ``groupby(user)``
    ``map_groups`` with a fully vectorized in-group pass — sort by
    (ts, event_id), one ``np.maximum.accumulate`` per role tracks the
    most recent first/blocker position, match = last_first >
    last_blocker.  Each group emits ONE narrow partial row; the final
    fold sums tiny per-user rows.  -> one row (n_second, n_matched,
    n_users_matched, match_rate_e6)."""
    def per_user(g: pa.Table) -> pa.Table:
        ts = g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        et = g["event_type"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        et = et[order]
        pos = np.arange(1, et.size + 1, dtype=np.int64)
        lf = np.maximum.accumulate(np.where(et == first, pos, 0))
        lb = np.maximum.accumulate(np.where(et == blocker, pos, 0))
        is_second = et == second
        matched = is_second & (lf > 0) & (lf > lb)
        return pa.table({
            "n_second_p": pa.array([int(is_second.sum())], pa.int64()),
            "n_matched_p": pa.array([int(matched.sum())], pa.int64()),
            "has_match": pa.array([int(matched.any())], pa.int64()),
        })

    parts = ds.select_columns(["user_id", "ts", "event_id", "event_type"])         .groupby("user_id").map_groups(per_user, batch_format="pyarrow")
    n_second = n_matched = n_users = 0
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=None):
        n_second += int(pc.sum(b["n_second_p"]).as_py() or 0)
        n_matched += int(pc.sum(b["n_matched_p"]).as_py() or 0)
        n_users += int(pc.sum(b["has_match"]).as_py() or 0)
    return pa.table({
        "n_second": pa.array([n_second], pa.int64()),
        "n_matched": pa.array([n_matched], pa.int64()),
        "n_users_matched": pa.array([n_users], pa.int64()),
        "match_rate_e6": pa.array(
            [n_matched * 1_000_000 // n_second if n_second else 0],
            pa.int64()),
    })


def _watermark_scan(ds: ray.data.Dataset, arrival_col: str,
                    range_bits: int, extra_cols: list[str],
                    fold) -> ray.data.Dataset:
    """Shared distributed RUNNING-MAX-over-arrival-order primitive —
    the same ordered-scan shape as ``chunk_assignments`` /
    ``epoch_shuffle`` but with data-dependent bounds.  Arrival order is
    the total order ``(arrival_col, event_id)``.

    One tiny aggregate finds the arrival-key span, which splits into
    2^``range_bits`` contiguous ranges; pass 1 folds per-range max
    event time (tiny), the driver exclusive-prefix-maxes them into
    per-range incoming watermarks (O(2^range_bits) driver state);
    pass 2 cummaxes inside each range on top of its incoming value and
    calls ``fold(group_sorted, pmax)`` — ``group_sorted`` the
    arrival-ordered group table, ``pmax`` the max event time STRICTLY
    BEFORE each row (the Flink/Beam watermark at its arrival).  No
    global sort, nothing O(events) on the driver.  -> Dataset of
    ``fold`` partials."""
    import ray
    from ray.data.aggregate import Max as _Max, Min as _Min

    stats = ds.select_columns([arrival_col]).aggregate(
        _Min(arrival_col), _Max(arrival_col))
    lo = int(stats[f"min({arrival_col})"])
    hi = int(stats[f"max({arrival_col})"])
    n_ranges = 1 << range_bits
    span = max(1, (hi - lo + n_ranges) // n_ranges)

    def rng_partial(batch: pa.Table) -> pa.Table:
        arr = batch[arrival_col].to_numpy(zero_copy_only=False)
        t = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        r = (arr - lo) // span
        keys, inv = np.unique(r, return_inverse=True)
        mx = np.full(keys.size, np.iinfo(np.int64).min, dtype=np.int64)
        np.maximum.at(mx, inv, t)
        return pa.table({"r": pa.array(keys, pa.int64()),
                         "mx_p": pa.array(mx, pa.int64())})

    folded = ds.select_columns([arrival_col, "ts"]) \
        .map_batches(rng_partial, batch_format="pyarrow") \
        .groupby("r").aggregate(_Max("mx_p", alias_name="mx")).take_all()
    by_r = dict(sorted((int(x["r"]), int(x["mx"])) for x in folded))
    incoming: dict[int, int] = {}
    # seed far below any epoch-µs timestamp but safe from int64 wrap in
    # ``pmax - t`` (INT64_MIN - t would overflow to a huge positive
    # "lateness" for the first event in arrival order)
    acc = -(1 << 62)
    for r, mx in by_r.items():
        incoming[r] = acc
        acc = max(acc, mx)
    inc_ref = ray.put(incoming)

    def scan(group: pa.Table) -> pa.Table:
        inc = ray.get(inc_ref)
        arr = group[arrival_col].to_numpy(zero_copy_only=False)
        eid = group["event_id"].to_numpy(zero_copy_only=False)
        t = group["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, arr))
        t_o = t[order]
        base = inc[int((arr[order[0]] - lo) // span)]
        # prefix max STRICTLY BEFORE each event, seeded by the incoming
        # watermark of this range
        pmax = np.empty(t_o.size, dtype=np.int64)
        pmax[0] = base
        np.maximum.accumulate(t_o[:-1], out=pmax[1:])
        np.maximum(pmax[1:], base, out=pmax[1:])
        return fold(group.take(pa.array(order, pa.int64())), pmax)

    cols = ["event_id", "ts"] + [c for c in extra_cols
                                 if c not in ("event_id", "ts")]
    if arrival_col not in cols:
        cols.append(arrival_col)
    return ds.select_columns(cols) \
        .add_column("r", lambda df: (df[arrival_col] - lo) // span) \
        .groupby("r").map_groups(scan, batch_format="pyarrow")


def late_events_report(ds: ray.data.Dataset,
                       watermark_s: int = 6 * 3600,
                       range_bits: int = 6,
                       arrival_col: str = "event_id") -> pa.Table:
    """Watermark / LATE-DATA audit — the out-of-orderness report a
    streaming pipeline needs before choosing window allowed-lateness:
    taking ``(arrival_col, event_id)`` as ARRIVAL order and ``ts`` as
    event time, an event is late iff the maximum event time seen
    strictly before it exceeds its own by more than ``watermark_s``
    (Flink/Beam watermark semantics: it would have been dropped or
    side-outputted).  Built on :func:`_watermark_scan`; per-type
    lateness partials fold on the driver (O(n_types) rows).

    -> (event_type, n_events, n_late, max_lateness_s) by type."""
    wm_us = int(watermark_s) * 1_000_000

    def fold(group: pa.Table, pmax: np.ndarray) -> pa.Table:
        t_o = group["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        et_o = group["event_type"].to_numpy(zero_copy_only=False)
        late_by = pmax - t_o
        is_late = late_by > wm_us
        types, inv = np.unique(et_o, return_inverse=True)
        n_ev = np.bincount(inv, minlength=types.size)
        n_late = np.zeros(types.size, dtype=np.int64)
        np.add.at(n_late, inv, is_late.astype(np.int64))
        mx_late = np.zeros(types.size, dtype=np.int64)
        np.maximum.at(mx_late, inv,
                      np.where(is_late, late_by, 0))
        return pa.table({
            "event_type": pa.array(types, pa.string()),
            "n_events_p": pa.array(n_ev.astype(np.int64), pa.int64()),
            "n_late_p": pa.array(n_late, pa.int64()),
            "mx_p": pa.array(mx_late, pa.int64()),
        })

    parts = _watermark_scan(ds, arrival_col, range_bits,
                            ["event_type"], fold)
    agg: dict[str, list[int]] = {}
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=None):
        for ty, ne, nl, mx in zip(b["event_type"].to_pylist(),
                                  b["n_events_p"].to_pylist(),
                                  b["n_late_p"].to_pylist(),
                                  b["mx_p"].to_pylist()):
            cur = agg.setdefault(ty, [0, 0, 0])
            cur[0] += ne
            cur[1] += nl
            cur[2] = max(cur[2], mx)
    types = sorted(agg)
    return pa.table({
        "event_type": pa.array(types, pa.string()),
        "n_events": pa.array([agg[t][0] for t in types], pa.int64()),
        "n_late": pa.array([agg[t][1] for t in types], pa.int64()),
        "max_lateness_s": pa.array([agg[t][2] // 1_000_000
                                    for t in types], pa.int64()),
    })


def window_counts_allowed_lateness(ds: ray.data.Dataset,
                                   window_s: int = 6 * 3600,
                                   allowed_lateness_s: int = 24 * 3600,
                                   range_bits: int = 6,
                                   arrival_col: str = "event_id"
                                   ) -> pa.Table:
    """Tumbling event-time windows WITH ALLOWED LATENESS and a side
    output — the full Flink window-lifecycle accounting: at an event's
    arrival the watermark is the max event time seen strictly before it
    (:func:`_watermark_scan`); the event is ON TIME if the watermark
    has not yet passed its window end, a LATE UPDATE if the watermark
    passed the end but not end + ``allowed_lateness_s`` (the window
    re-fires), and DROPPED to the side output beyond that.

    Window partials fold inside each range task and again on the
    driver (O(n_windows) rows; windows are a time histogram, never
    O(events)).  -> (window_start_us, n_on_time, n_late_update,
    n_dropped) by window_start_us."""
    win_us = int(window_s) * 1_000_000
    allow_us = int(allowed_lateness_s) * 1_000_000

    def fold(group: pa.Table, pmax: np.ndarray) -> pa.Table:
        t_o = group["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        wstart = (t_o // win_us) * win_us
        wend = wstart + win_us
        late_update = (pmax > wend) & (pmax <= wend + allow_us)
        dropped = pmax > wend + allow_us
        keys, inv = np.unique(wstart, return_inverse=True)
        n_all = np.bincount(inv, minlength=keys.size).astype(np.int64)
        n_lu = np.zeros(keys.size, dtype=np.int64)
        np.add.at(n_lu, inv, late_update.astype(np.int64))
        n_dr = np.zeros(keys.size, dtype=np.int64)
        np.add.at(n_dr, inv, dropped.astype(np.int64))
        return pa.table({
            "w": pa.array(keys, pa.int64()),
            "n_on_p": pa.array(n_all - n_lu - n_dr, pa.int64()),
            "n_lu_p": pa.array(n_lu, pa.int64()),
            "n_dr_p": pa.array(n_dr, pa.int64()),
        })

    parts = _watermark_scan(ds, arrival_col, range_bits, [], fold)
    agg: dict[int, list[int]] = {}
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=None):
        for w, on, lu, dr in zip(b["w"].to_pylist(), b["n_on_p"].to_pylist(),
                                 b["n_lu_p"].to_pylist(),
                                 b["n_dr_p"].to_pylist()):
            cur = agg.setdefault(w, [0, 0, 0])
            cur[0] += on
            cur[1] += lu
            cur[2] += dr
    ws = sorted(agg)
    return pa.table({
        "window_start_us": pa.array(ws, pa.int64()),
        "n_on_time": pa.array([agg[w][0] for w in ws], pa.int64()),
        "n_late_update": pa.array([agg[w][1] for w in ws], pa.int64()),
        "n_dropped": pa.array([agg[w][2] for w in ws], pa.int64()),
    })


def cumulative_new_users(ds: ray.data.Dataset, bucket_s: int = 86400
                         ) -> pa.Table:
    """ES ``cumulative_cardinality`` pipeline aggregation: per time
    bucket, how many users appear for the FIRST time, plus the running
    total of distinct users ever seen — the user-growth curve a
    cardinality agg alone cannot give (dedup must happen across
    buckets, not within).

    Distributed shape: ``groupby(user_id).min(ts)`` (narrow rows, the
    only shuffle) -> per-bucket first-seen histogram inside
    ``map_batches`` -> tiny driver cumsum over O(n_buckets) rows.
    -> (bucket_start_us, n_new_users, cum_users) by bucket."""
    from ray.data.aggregate import Min as _Min

    bucket_us = int(bucket_s) * 1_000_000

    def to_us(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"],
            "t": batch["ts"].cast(pa.int64()),
        })

    first_seen = ds.select_columns(["user_id", "ts"]) \
        .map_batches(to_us, batch_format="pyarrow") \
        .groupby("user_id").aggregate(_Min("t", alias_name="first_t"))

    def hist(batch: pa.Table) -> pa.Table:
        t = batch["first_t"].to_numpy(zero_copy_only=False)
        b = (t // bucket_us) * bucket_us
        keys, cnt = np.unique(b, return_counts=True)
        return pa.table({"b": pa.array(keys, pa.int64()),
                         "n_p": pa.array(cnt.astype(np.int64), pa.int64())})

    agg: dict[int, int] = {}
    for tb in first_seen.map_batches(hist, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        for b, n in zip(tb["b"].to_pylist(), tb["n_p"].to_pylist()):
            agg[b] = agg.get(b, 0) + n
    buckets = sorted(agg)
    news = [agg[b] for b in buckets]
    cums = np.cumsum(news)
    return pa.table({
        "bucket_start_us": pa.array(buckets, pa.int64()),
        "n_new_users": pa.array(news, pa.int64()),
        "cum_users": pa.array(cums.astype(np.int64), pa.int64()),
    })


def cep_kleene_plus(ds: ray.data.Dataset, first: str = "click",
                    middle: str = "view", last: str = "purchase"
                    ) -> ray.data.Dataset:
    """CEP KLEENE-PLUS pattern — ``A B+ C`` with STRICT contiguity
    (MATCH_RECOGNIZE ``PATTERN (A B+ C)`` / FlinkCEP ``oneOrMore``):
    in a user's event stream ordered by (ts, event_id), a match is a
    ``first`` event immediately followed by one or more ``middle``
    events and then a ``last`` event — the browse-run-to-purchase
    shape (click, >= 1 views, purchase, nothing else in between).

    Same distributed shape as the other CEP operators here:
    ``groupby(user)`` + one vectorized in-group pass — the index of
    each event's NEXT non-``middle`` event comes from one
    ``searchsorted`` against the non-middle positions, so a match is
    ``et[i] == A  and  nxt[i] > i+1  and  et[nxt[i]] == C`` and the
    B-run length is ``nxt[i] - i - 1``; no Python loop over events.

    -> (user_id, n_matches, sum_runlen, max_runlen), matching users
    only, by user_id."""
    def per_user(g: pa.Table) -> pa.Table:
        ts = g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        et = g["event_type"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        et = et[order]
        n = et.size
        nonb = np.flatnonzero(et != middle)
        # next strictly-after non-middle position for every index
        nxt_idx = np.searchsorted(nonb, np.arange(n), side="right")
        has = nxt_idx < nonb.size
        nxt = np.where(has, nonb[np.minimum(nxt_idx, nonb.size - 1)], -1)
        match = (et == first) & has & (nxt > np.arange(n) + 1)
        match &= np.where(match, et[np.maximum(nxt, 0)] == last, False)
        if not match.any():
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "n_matches": pa.array([], pa.int64()),
                             "sum_runlen": pa.array([], pa.int64()),
                             "max_runlen": pa.array([], pa.int64())})
        runs = (nxt - np.arange(n) - 1)[match]
        return pa.table({
            "user_id": pa.array([int(g["user_id"][0].as_py())],
                                pa.int64()),
            "n_matches": pa.array([int(match.sum())], pa.int64()),
            "sum_runlen": pa.array([int(runs.sum())], pa.int64()),
            "max_runlen": pa.array([int(runs.max())], pa.int64()),
        })

    return ds.select_columns(["user_id", "ts", "event_id", "event_type"]) \
        .groupby("user_id").map_groups(per_user, batch_format="pyarrow") \
        .sort("user_id")


def date_histogram_bucket_script(ds: ray.data.Dataset,
                                 num_type: str = "purchase",
                                 den_type: str = "click",
                                 min_den: int = 10) -> pa.Table:
    """ES ``bucket_script`` + ``bucket_selector`` pipeline aggs in one
    daily histogram: per day, count the numerator and denominator event
    types, derive ``ratio_e6 = n_num * 1e6 // n_den`` (the
    ``bucket_script``), and keep only buckets with ``n_den >= min_den``
    (the ``bucket_selector``) — the canonical conversion-rate-per-day
    dashboard panel.

    100-TB shape: per-batch (day, type) partial counts fold through one
    tiny groupby; full rows never shuffle.  The ratio is a floor-e6
    integer, so DuckDB reproduces it exactly.
    -> (epoch_day, n_den, n_num, ratio_e6), epoch_day asc."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = us // 86_400_000_000
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        out_day, out_num, out_den = [], [], []
        for m, col in ((et == num_type, "num"), (et == den_type, "den")):
            dk, counts = np.unique(day[m], return_counts=True)
            for d, c in zip(dk.tolist(), counts.tolist()):
                out_day.append(d)
                out_num.append(c if col == "num" else 0)
                out_den.append(c if col == "den" else 0)
        return pa.table({"epoch_day": pa.array(out_day, pa.int64()),
                         "num_p": pa.array(out_num, pa.int64()),
                         "den_p": pa.array(out_den, pa.int64())})

    folded = ds.select_columns(["ts", "event_type"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("epoch_day") \
        .aggregate(Sum("num_p", alias_name="n_num"),
                   Sum("den_p", alias_name="n_den")) \
        .sort("epoch_day").take_all()
    days, nn, nd, ratio = [], [], [], []
    for r in folded:
        den = int(r["n_den"])
        if den < min_den:
            continue
        days.append(int(r["epoch_day"]))
        nn.append(int(r["n_num"]))
        nd.append(den)
        ratio.append(int(r["n_num"]) * 1_000_000 // den)
    return pa.table({
        "epoch_day": pa.array(days, pa.int64()),
        "n_den": pa.array(nd, pa.int64()),
        "n_num": pa.array(nn, pa.int64()),
        "ratio_e6": pa.array(ratio, pa.int64()),
    })


def date_histogram_month_rate(ds: ray.data.Dataset) -> pa.Table:
    """ES ``rate`` aggregation inside a calendar-month
    ``date_histogram`` with ``unit: day``: the bucket's event count
    normalized by the actual day length of that calendar month
    (28/29/30/31) — rate_per_day_e6 = floor(n * 1e6 / days_in_month).

    Folds the span-bounded daily bucket table (one tiny groupby — the
    same partial/fold shape as every pipeline agg here) up to months
    on the driver.  -> (month_start_day, n_events, days_in_month,
    rate_per_day_e6), month_start_day = epoch days of the month's
    first day."""
    import datetime
    base = date_histogram_filled(ds)
    days = base["epoch_day"].to_numpy(zero_copy_only=False)
    n = base["n_events"].to_numpy(zero_copy_only=False)
    months: dict[int, int] = {}
    for d, c in zip(days, n):
        dt = datetime.date(1970, 1, 1) + datetime.timedelta(days=int(d))
        first = dt.replace(day=1)
        months[(first - datetime.date(1970, 1, 1)).days] = \
            months.get((first - datetime.date(1970, 1, 1)).days, 0) + int(c)
    import calendar
    rows = []
    for m0 in sorted(months):
        dt = datetime.date(1970, 1, 1) + datetime.timedelta(days=m0)
        dim = calendar.monthrange(dt.year, dt.month)[1]
        cnt = months[m0]
        rows.append((m0, cnt, dim, 1_000_000 * cnt // dim))
    return pa.table({
        "month_start_day": pa.array([r[0] for r in rows], pa.int64()),
        "n_events": pa.array([r[1] for r in rows], pa.int64()),
        "days_in_month": pa.array([r[2] for r in rows], pa.int64()),
        "rate_per_day_e6": pa.array([r[3] for r in rows], pa.int64()),
    })


def percentiles_bucket_daily(ds: ray.data.Dataset,
                             pcts_e2: tuple = (50, 90, 99)) -> pa.Table:
    """ES ``percentiles_bucket`` pipeline agg over the daily
    date_histogram counts: exact linear-interpolated percentiles of
    the (span-bounded) bucket values, computed where ES computes them
    — on the folded bucket table, never on the raw stream.

    The interpolation is written as v_lo + (v_hi - v_lo) * frac with
    idx = (q/100) * (nbuckets - 1) in float64, then e6-floored — the
    SQL oracle repeats the identical op order, so both sides are
    bit-equal.  -> (q_e2, value_e6)."""
    base = date_histogram_filled(ds)
    v = np.sort(base["n_events"].to_numpy(zero_copy_only=False)
                .astype(np.int64))
    out = []
    for q in pcts_e2:
        idx = (q / 100.0) * (v.size - 1)
        lo = int(np.floor(idx))
        hi = min(lo + 1, v.size - 1)
        frac = idx - lo
        val = float(v[lo]) + (float(v[hi]) - float(v[lo])) * frac
        out.append((int(q), int(np.floor(val * 1_000_000 + 0.5))))
    return pa.table({
        "q_e2": pa.array([o[0] for o in out], pa.int64()),
        "value_e6": pa.array([o[1] for o in out], pa.int64()),
    })


def date_histogram_normalize(ds: ray.data.Dataset) -> pa.Table:
    """ES ``normalize`` pipeline agg, methods ``percent_of_sum`` and
    ``rescale_0_1``, over the zero-filled daily histogram — both as
    pure-integer e6 floors (n*1e6//total, (n-min)*1e6//(max-min)) so
    the oracle is bit-exact.  Computed on the span-bounded folded
    bucket table like every pipeline agg.
    -> (epoch_day, n_events, pct_of_sum_e6, rescaled_e6)."""
    base = date_histogram_filled(ds)
    n = base["n_events"].to_numpy(zero_copy_only=False).astype(np.int64)
    total = int(n.sum())
    lo, hi = int(n.min()), int(n.max())
    pct = (n * 1_000_000) // total if total else np.zeros_like(n)
    if hi > lo:
        resc = ((n - lo) * 1_000_000) // (hi - lo)
    else:
        resc = np.zeros_like(n)
    return pa.table({
        "epoch_day": base["epoch_day"],
        "n_events": base["n_events"],
        "pct_of_sum_e6": pa.array(pct, pa.int64()),
        "rescaled_e6": pa.array(resc, pa.int64()),
    })


def date_histogram_change_point(ds: ray.data.Dataset) -> pa.Table:
    """ES ``change_point`` agg over the zero-filled daily histogram:
    the split maximizing the mean shift between the two segments —
    stat_e6(t) = |1e6*S_before//t - 1e6*S_after//(n-t)| over every
    candidate split t (all pure-integer floors, so the SQL oracle is
    bit-exact); tie-break earliest day.  Like every pipeline agg, the
    scan runs on the span-bounded folded bucket table, never the raw
    stream.  -> one row (change_day, stat_e6, mean_before_e6,
    mean_after_e6, n_before, n_after)."""
    base = date_histogram_filled(ds)
    days = base["epoch_day"].to_numpy(zero_copy_only=False)
    n = base["n_events"].to_numpy(zero_copy_only=False).astype(np.int64)
    cnt = n.size
    if cnt < 2:
        return pa.table({"change_day": pa.array([], pa.int64()),
                         "stat_e6": pa.array([], pa.int64()),
                         "mean_before_e6": pa.array([], pa.int64()),
                         "mean_after_e6": pa.array([], pa.int64()),
                         "n_before": pa.array([], pa.int64()),
                         "n_after": pa.array([], pa.int64())})
    cum = np.cumsum(n)
    tot = int(cum[-1])
    t = np.arange(1, cnt, dtype=np.int64)          # split sizes
    mb = (1_000_000 * cum[:-1]) // t
    ma = (1_000_000 * (tot - cum[:-1])) // (cnt - t)
    stat = np.abs(mb - ma)
    best = int(np.argmax(stat))                    # ties -> earliest
    return pa.table({
        "change_day": pa.array([int(days[best + 1])], pa.int64()),
        "stat_e6": pa.array([int(stat[best])], pa.int64()),
        "mean_before_e6": pa.array([int(mb[best])], pa.int64()),
        "mean_after_e6": pa.array([int(ma[best])], pa.int64()),
        "n_before": pa.array([int(t[best])], pa.int64()),
        "n_after": pa.array([int(cnt - t[best])], pa.int64()),
    })


def date_histogram_bucket_sort(ds: ray.data.Dataset, k: int = 5,
                               frm: int = 0) -> pa.Table:
    """ES ``bucket_sort`` pipeline agg: reorder + truncate the parent
    date_histogram's buckets by a metric — top-``k`` busiest days
    (count desc, day asc) with optional ``from`` offset, computed on
    the span-bounded folded bucket table exactly where ES runs it.
    -> (epoch_day, n_events) in bucket-sort order."""
    base = date_histogram_filled(ds)
    days = base["epoch_day"].to_numpy(zero_copy_only=False)
    n = base["n_events"].to_numpy(zero_copy_only=False)
    order = np.lexsort((days, -n))[frm:frm + k]
    return pa.table({
        "epoch_day": pa.array(days[order], pa.int64()),
        "n_events": pa.array(n[order], pa.int64()),
    })


def date_histogram_moving_max(ds: ray.data.Dataset,
                              window: int = 7) -> pa.Table:
    """ES ``moving_fn`` with ``MovingFunctions.max``: trailing-window
    maximum of the zero-filled daily counts (window = the ``window``
    buckets ENDING at each bucket, ES's shift=default semantics over
    [t-window+1, t]); the first buckets use the shorter prefix, like
    MovingFunctions over a partial window.
    -> (epoch_day, n_events, wmax_events)."""
    base = date_histogram_filled(ds)
    n = base["n_events"].to_numpy(zero_copy_only=False).astype(np.int64)
    wmax = np.empty(n.size, dtype=np.int64)
    for t in range(n.size):                  # span-bounded, not data
        wmax[t] = n[max(0, t - window + 1):t + 1].max() if n.size else 0
    return pa.table({
        "epoch_day": base["epoch_day"],
        "n_events": base["n_events"],
        "wmax_events": pa.array(wmax, pa.int64()),
    })
