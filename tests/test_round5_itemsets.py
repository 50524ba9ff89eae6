"""Round-5: ES frequent_item_sets (distributed Apriori, sizes 1-3)
and the normalize pipeline agg — planted baskets with hand-computed
supports plus a randomized brute-force parity sweep."""

import datetime
import itertools

import numpy as np
import pyarrow as pa
import pytest

from onestools_eventlog_ray.pipelines.relational import frequent_item_sets
from onestools_eventlog_ray.pipelines.streaming import \
    date_histogram_normalize


def _events_from_baskets(baskets):
    """baskets: list of (user, day, [items]) -> events table (each item
    twice, to prove per-basket dedup)."""
    ts, uid, et = [], [], []
    for user, day, items in baskets:
        for it in items:
            for _ in range(2):
                ts.append(datetime.datetime(2024, 1, day, 9))
                uid.append(user)
                et.append(it)
    return pa.table({"ts": pa.array(ts, pa.timestamp("us")),
                     "user_id": pa.array(uid, pa.int64()),
                     "event_type": pa.array(et, pa.string())})


def _brute(baskets, frac_e6=100_000):
    sets = [frozenset(i) for _, _, i in baskets]
    thr = -(-frac_e6 * len(sets) // 1_000_000)
    out = {}
    items = sorted(set().union(*sets))
    for size in (1, 2, 3):
        for combo in itertools.combinations(items, size):
            sup = sum(1 for s in sets if set(combo) <= s)
            if sup >= thr:
                out[combo] = sup
    return out


def _as_dict(t):
    out = {}
    for r in t.to_pylist():
        key = tuple(x for x in (r["item_a"], r["item_b"], r["item_c"])
                    if x is not None)
        assert len(key) == r["set_size"]
        out[key] = r["support"]
    return out


def test_itemsets_hand_planted(ray_session):
    import ray.data
    baskets = [(1, 1, ["a", "b", "c"]),
               (1, 2, ["a", "b"]),
               (2, 1, ["a", "b", "c"]),
               (2, 2, ["a", "c"]),
               (3, 1, ["b", "c"]),
               (3, 2, ["d"])]          # 6 baskets, thr = ceil(0.6) = 1
    ev = ray.data.from_arrow(_events_from_baskets(baskets)).repartition(3)
    got = _as_dict(frequent_item_sets(ev))
    assert got[("a",)] == 4 and got[("d",)] == 1
    assert got[("a", "b")] == 3 and got[("a", "c")] == 3
    assert got[("b", "c")] == 3
    assert got[("a", "b", "c")] == 2
    assert got == _brute(baskets)


def test_itemsets_threshold_prunes(ray_session):
    import ray.data
    baskets = [(u, 1, ["x", "y"]) for u in range(9)] + \
              [(9, 1, ["x", "z"])]     # 10 baskets
    ev = ray.data.from_arrow(_events_from_baskets(baskets))
    # 50% support: z (1/10) and (x,z) must be pruned
    got = _as_dict(frequent_item_sets(ev, support_frac_e6=500_000))
    assert got == {("x",): 10, ("y",): 9, ("x", "y"): 9}


def test_itemsets_randomized_brute_parity(ray_session):
    import ray.data
    rng = np.random.default_rng(11)
    items = list("abcdef")
    baskets = []
    for u in range(40):
        for day in (1, 2, 3):
            k = int(rng.integers(1, 6))
            picks = sorted(rng.choice(items, size=k, replace=False))
            baskets.append((u, day, list(picks)))
    ev = ray.data.from_arrow(_events_from_baskets(baskets)).repartition(5)
    got = _as_dict(frequent_item_sets(ev, support_frac_e6=150_000))
    assert got == _brute(baskets, 150_000)


def test_normalize_agg_integer_exact(ray_session):
    import ray.data
    # days with counts 2, 0(gap), 6 -> total 8, min 0, max 6
    ts = ([datetime.datetime(2024, 1, 1, 5)] * 2
          + [datetime.datetime(2024, 1, 3, 5)] * 6)
    ev = ray.data.from_arrow(
        pa.table({"ts": pa.array(ts, pa.timestamp("us"))}))
    t = date_histogram_normalize(ev).to_pydict()
    assert t["n_events"] == [2, 0, 6]
    assert t["pct_of_sum_e6"] == [2 * 10**6 // 8, 0, 6 * 10**6 // 8]
    assert t["rescaled_e6"] == [2 * 10**6 // 6, 0, 10**6]
