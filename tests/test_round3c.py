"""Round-3 session-3 operators: big-big repartition equi-join, SQL
window-function family (row_number/ntile/percent_rank), exact grouped
Pearson correlation, benchmark decontamination.

Each test checks the distributed pipeline against an independent
brute-force (pure-Python/numpy) computation — the oracle-parity SQL
check runs separately through tools/check_oracle.py and the driver."""

import collections
import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_tbl():
    return pq.read_table(os.path.join(SF_DIR, "events.parquet"))


def _ds(name, columns=None):
    import ray.data
    return ray.data.read_parquet(os.path.join(SF_DIR, f"{name}.parquet"),
                                 columns=columns)


# ---------------------------------------------------------------------------
# equi_join
# ---------------------------------------------------------------------------

def test_equi_join_bruteforce():
    """Generic tagged-union equi-join == per-key cartesian product."""
    from onestools_eventlog_ray.pipelines.relational import equi_join
    li = pq.read_table(os.path.join(SF_DIR, "lineitem.parquet"),
                       columns=["l_orderkey", "l_linenumber"])
    orders = pq.read_table(os.path.join(SF_DIR, "orders.parquet"),
                           columns=["o_orderkey", "o_orderpriority"])
    got = equi_join(_ds("lineitem", ["l_orderkey", "l_linenumber"]),
                    _ds("orders", ["o_orderkey", "o_orderpriority"]),
                    "l_orderkey", "o_orderkey",
                    ["l_linenumber"], ["o_orderpriority"]).to_pandas()
    prio = dict(zip(orders["o_orderkey"].to_pylist(),
                    orders["o_orderpriority"].to_pylist()))
    want = sorted((k, ln, prio[k])
                  for k, ln in zip(li["l_orderkey"].to_pylist(),
                                   li["l_linenumber"].to_pylist())
                  if k in prio)
    got_rows = sorted(zip(got["key"], got["l_linenumber"],
                          got["o_orderpriority"]))
    assert [tuple(map(lambda x: x if isinstance(x, str) else int(x), r))
            for r in got_rows] == want


def test_equi_join_unmatched_keys_dropped():
    """Inner semantics: keys present on only one side emit nothing."""
    import ray.data
    from onestools_eventlog_ray.pipelines.relational import equi_join
    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 1, 2, 3], pa.int64()),
        "a": pa.array([10, 11, 20, 30], pa.int64())}))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 3, 3, 4], pa.int64()),
        "b": pa.array([100, 300, 301, 400], pa.int64())}))
    got = sorted(map(tuple, equi_join(left, right, "k", "k", ["a"], ["b"])
                     .to_pandas()[["key", "a", "b"]].itertuples(index=False)))
    assert got == [(1, 10, 100), (1, 11, 100), (3, 30, 300), (3, 30, 301)]


def test_order_revenue_join_bruteforce():
    from onestools_eventlog_ray.pipelines.relational import order_revenue_join
    li = pq.read_table(os.path.join(SF_DIR, "lineitem.parquet"))
    orders = pq.read_table(os.path.join(SF_DIR, "orders.parquet"))
    prio = dict(zip(orders["o_orderkey"].to_pylist(),
                    orders["o_orderpriority"].to_pylist()))
    want_rev = collections.Counter()
    want_n = collections.Counter()
    for k, p, d in zip(li["l_orderkey"].to_pylist(),
                       li["l_extendedprice"].to_pylist(),
                       li["l_discount"].to_pylist()):
        if k not in prio:
            continue
        cents = int(math.floor(p * 100 + 0.5))
        bp = int(math.floor(d * 10_000 + 0.5))
        want_rev[prio[k]] += cents * (10_000 - bp)
        want_n[prio[k]] += 1
    got = order_revenue_join(
        _ds("lineitem", ["l_orderkey", "l_extendedprice", "l_discount"]),
        _ds("orders", ["o_orderkey", "o_orderpriority"])).to_pandas()
    assert dict(zip(got["o_orderpriority"], got["revenue_e6"])) == want_rev
    assert dict(zip(got["o_orderpriority"], got["n_items"])) == want_n


# ---------------------------------------------------------------------------
# window ranks
# ---------------------------------------------------------------------------

def _ntile_sql(n: int, k: int) -> list[int]:
    """DuckDB NTILE semantics: first n%k buckets get ceil(n/k) rows."""
    big, base = n % k, n // k
    out = []
    for b in range(k):
        size = base + 1 if b < big else base
        out.extend([b + 1] * size)
    return out[:n]


def test_order_rank_window_bruteforce():
    from onestools_eventlog_ray.pipelines.relational import order_rank_window
    orders = pq.read_table(os.path.join(SF_DIR, "orders.parquet"))
    got = order_rank_window(
        _ds("orders", ["o_custkey", "o_orderkey", "o_totalprice"]),
        tiles=4).to_pandas()
    assert len(got) == orders.num_rows
    by_cust = collections.defaultdict(list)
    for c, o, p in zip(orders["o_custkey"].to_pylist(),
                       orders["o_orderkey"].to_pylist(),
                       orders["o_totalprice"].to_pylist()):
        by_cust[c].append((-int(math.floor(p * 100 + 0.5)), o))
    got_idx = got.set_index(["o_custkey", "o_orderkey"])
    for c, rows in list(by_cust.items())[:50]:
        rows.sort()
        n = len(rows)
        tiles = _ntile_sql(n, 4)
        for i, (_, o) in enumerate(rows):
            r = got_idx.loc[(c, o)]
            assert int(r["rnk"]) == i + 1
            assert int(r["ntile4"]) == tiles[i]
            pct = i / (n - 1) if n > 1 else 0.0
            assert int(r["pct_rank_e6"]) == int(
                math.floor(pct * 1_000_000 + 0.5))


# ---------------------------------------------------------------------------
# correlation
# ---------------------------------------------------------------------------

def test_corr_value_k_bruteforce(events_tbl):
    import re
    from onestools_eventlog_ray.pipelines.relational import (
        corr_value_k_by_type)
    got = corr_value_k_by_type(
        _ds("events", ["event_type", "value", "props"]))
    got = {t: (n, c) for t, n, c in zip(got["event_type"].to_pylist(),
                                        got["n"].to_pylist(),
                                        got["corr_e6"].to_pylist())}
    moments = collections.defaultdict(lambda: [0, 0, 0, 0, 0, 0])
    for et, v, props in zip(events_tbl["event_type"].to_pylist(),
                            events_tbl["value"].to_pylist(),
                            events_tbl["props"].to_pylist()):
        m = re.search(r'"k": ([0-9]+)', props)
        if not m:
            continue
        x = int(math.floor(v * 100 + 0.5))
        y = int(m.group(1))
        acc = moments[et]
        acc[0] += 1
        acc[1] += x
        acc[2] += y
        acc[3] += x * x
        acc[4] += x * y
        acc[5] += y * y
    assert set(got) == set(moments)
    for et, (n, sx, sy, sxx, sxy, syy) in moments.items():
        da, db = n * sxx - sx * sx, n * syy - sy * sy
        r = 0.0 if da == 0 or db == 0 else \
            float(n * sxy - sx * sy) / math.sqrt(float(da)) \
            / math.sqrt(float(db))
        assert got[et] == (n, int(math.floor(r * 1_000_000 + 0.5)))
        assert abs(got[et][1]) <= 1_000_000


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------

def test_decontaminate_bruteforce():
    from onestools_eventlog_ray.functions.analyzer import tokenize_py
    from onestools_eventlog_ray.pipelines.dedup import decontaminate
    docs = pq.read_table(os.path.join(SF_DIR, "documents.parquet"))

    def shingles(toks, k=3):
        if not toks:
            return set()
        if len(toks) < k:
            return {"\x1f".join(toks)}
        return {"\x1f".join(toks[i:i + k]) for i in
                range(len(toks) - k + 1)}

    bench = set()
    per_doc = {}
    for doc_id, txt in zip(docs["doc_id"].to_pylist(),
                           docs["text"].to_pylist()):
        sh = shingles(tokenize_py(txt))
        if doc_id % 20 == 0:
            bench |= sh
        else:
            per_doc[doc_id] = sh
    want = {d: (len(sh), len(sh & bench)) for d, sh in per_doc.items()
            if sh & bench}
    got = decontaminate(
        _ds("documents"), k=3, bench_mod=20).to_pandas()
    got_map = {int(d): (int(t), int(h)) for d, t, h in
               zip(got["doc_id"], got["n_tri"], got["n_hit"])}
    assert got_map == want
    assert all(d % 20 != 0 for d in got_map)


def test_decontaminate_no_benchmark_overlap_is_empty():
    """A corpus whose non-benchmark docs share nothing with the
    benchmark slice flags no one."""
    import ray.data
    from onestools_eventlog_ray.pipelines.dedup import decontaminate
    from onestools_eventlog_ray.sources.corpus import CorpusSpec
    tbl = pa.table({
        "doc_id": pa.array([0, 1, 2, 20], pa.int64()),
        "text": pa.array(["alpha beta gamma delta",
                          "one two three four five",
                          "six seven eight nine",
                          "epsilon zeta eta theta"], pa.string()),
    })
    spec = CorpusSpec(content_col="text", id_col="doc_id", meta_cols=())
    got = decontaminate(ray.data.from_arrow(tbl), spec,
                        k=3, bench_mod=20).to_pandas()
    assert len(got) == 0
