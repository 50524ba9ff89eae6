"""Round-4 session-6 brute-force tests: TPC-H Q7 (bilateral nation
volume), Q8 (national market share), Q13 (customer order-count
distribution incl. zero-order customers)."""
import os
from collections import Counter, defaultdict

import numpy as np
import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.001"


def _sf(t):
    return os.path.join(SF_DIR, f"{t}.parquet")


def _rev_e4(price, disc):
    return (int(np.floor(price * 100 + 0.5))
            * int(np.floor((1.0 - disc) * 100 + 0.5)))


def test_q7_nation_volume_bruteforce():
    # sf0.001's supplier set yields ZERO cross-nation pairs (verified
    # via DuckDB) — run this one at sf0.01 so the assert is non-vacuous.
    import ray.data
    from onestools_eventlog_ray.pipelines.relational import q7_nation_volume

    _sf = lambda t: os.path.join("/root/testdata/sf0.01", f"{t}.parquet")
    nation = pq.read_table(_sf("nation")).to_pylist()
    nk = {r["n_name"]: r["n_nationkey"] for r in nation}
    nname = {r["n_nationkey"]: r["n_name"] for r in nation}
    supp = dict(zip(*[pq.read_table(_sf("supplier"))[c].to_pylist()
                      for c in ("s_suppkey", "s_nationkey")]))
    cust = dict(zip(*[pq.read_table(_sf("customer"))[c].to_pylist()
                      for c in ("c_custkey", "c_nationkey")]))
    o2c = dict(zip(*[pq.read_table(_sf("orders"))[c].to_pylist()
                     for c in ("o_orderkey", "o_custkey")]))
    li = pq.read_table(_sf("lineitem"))
    pair = {nk["NATION_1"], nk["NATION_2"]}
    want = Counter()
    for ok, sk, sd, pr, dc in zip(li["l_orderkey"].to_pylist(),
                                  li["l_suppkey"].to_pylist(),
                                  li["l_shipdate"].to_pylist(),
                                  li["l_extendedprice"].to_pylist(),
                                  li["l_discount"].to_pylist()):
        sn, cn = supp[sk], cust[o2c[ok]]
        if sn in pair and cn in pair and sn != cn \
                and 1995 <= sd.year <= 2001:
            want[(nname[sn], nname[cn], sd.year)] += _rev_e4(pr, dc)

    out = q7_nation_volume(
        ray.data.read_parquet(_sf("lineitem")),
        ray.data.read_parquet(_sf("orders")),
        ray.data.read_parquet(_sf("customer")),
        pq.read_table(_sf("supplier")), pq.read_table(_sf("nation")),
        nation1="NATION_1", nation2="NATION_2").to_pylist()
    got = {(r["supp_nation"], r["cust_nation"], r["l_year"]):
           r["revenue_e4"] for r in out}
    assert got == {k: v for k, v in want.items() if v}
    keys = [(r["supp_nation"], r["cust_nation"], r["l_year"]) for r in out]
    assert keys == sorted(keys)


def test_q8_market_share_bruteforce():
    import ray.data
    from onestools_eventlog_ray.pipelines.relational import q8_market_share

    nation = pq.read_table(_sf("nation")).to_pylist()
    region = {r["r_regionkey"]: r["r_name"]
              for r in pq.read_table(_sf("region")).to_pylist()}
    in_region = {r["n_nationkey"] for r in nation
                 if region[r["n_regionkey"]] == "ASIA"}
    target = {r["n_nationkey"] for r in nation if r["n_name"] == "NATION_3"}
    supp = dict(zip(*[pq.read_table(_sf("supplier"))[c].to_pylist()
                      for c in ("s_suppkey", "s_nationkey")]))
    cust = dict(zip(*[pq.read_table(_sf("customer"))[c].to_pylist()
                      for c in ("c_custkey", "c_nationkey")]))
    promo = {r["p_partkey"]
             for r in pq.read_table(_sf("part")).to_pylist()
             if r["p_type"] == "PROMO"}
    od = pq.read_table(_sf("orders"))
    o_meta = {ok: (cust[ck], dt.year) for ok, ck, dt in
              zip(od["o_orderkey"].to_pylist(),
                  od["o_custkey"].to_pylist(),
                  od["o_orderdate"].to_pylist())}
    li = pq.read_table(_sf("lineitem"))
    tot, tg = defaultdict(int), defaultdict(int)
    for ok, pk, sk, pr, dc in zip(li["l_orderkey"].to_pylist(),
                                  li["l_partkey"].to_pylist(),
                                  li["l_suppkey"].to_pylist(),
                                  li["l_extendedprice"].to_pylist(),
                                  li["l_discount"].to_pylist()):
        cn, yr = o_meta[ok]
        if pk in promo and cn in in_region:
            r = _rev_e4(pr, dc)
            tot[yr] += r
            if supp[sk] in target:
                tg[yr] += r

    out = q8_market_share(
        ray.data.read_parquet(_sf("lineitem")),
        ray.data.read_parquet(_sf("orders")),
        ray.data.read_parquet(_sf("customer")),
        pq.read_table(_sf("part")), pq.read_table(_sf("supplier")),
        pq.read_table(_sf("nation")), pq.read_table(_sf("region")),
        region_name="ASIA", target_nation="NATION_3",
        p_type="PROMO").to_pylist()
    assert [r["o_year"] for r in out] == sorted(y for y in tot if tot[y])
    for r in out:
        y = r["o_year"]
        assert r["rev_total_e4"] == tot[y]
        assert r["rev_target_e4"] == tg[y]
        assert r["share_e6"] == tg[y] * 1_000_000 // tot[y]
        assert 0 <= r["share_e6"] <= 1_000_000


def test_q13_customer_distribution_bruteforce():
    import ray.data
    from onestools_eventlog_ray.pipelines.relational import \
        q13_order_distribution

    cust = pq.read_table(_sf("customer"))["c_custkey"].to_pylist()
    ords = pq.read_table(_sf("orders"))["o_custkey"].to_pylist()
    per_cust = Counter(ords)
    counts = Counter(per_cust.get(c, 0) for c in cust)
    want = sorted(counts.items(), key=lambda kv: (-kv[1], -kv[0]))

    out = q13_order_distribution(
        ray.data.read_parquet(_sf("customer")),
        ray.data.read_parquet(_sf("orders"))).to_pylist()
    assert [(r["c_count"], r["custdist"]) for r in out] == want
    # every customer accounted for exactly once
    assert sum(r["custdist"] for r in out) == len(cust)
