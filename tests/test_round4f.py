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


def test_q17_small_qty_revenue_bruteforce():
    import ray.data
    from onestools_eventlog_ray.pipelines.relational import \
        q17_small_qty_revenue

    part = pq.read_table(_sf("part"))
    brand_parts = {p for p, b in zip(part["p_partkey"].to_pylist(),
                                     part["p_brand"].to_pylist())
                   if b == "Brand#13"}
    li = pq.read_table(_sf("lineitem"))
    rows = [(pk, int(np.floor(q + 0.5)), int(np.floor(pr * 100 + 0.5)))
            for pk, q, pr in zip(li["l_partkey"].to_pylist(),
                                 li["l_quantity"].to_pylist(),
                                 li["l_extendedprice"].to_pylist())
            if pk in brand_parts]
    sum_q, cnt = Counter(), Counter()
    for pk, q, _ in rows:
        sum_q[pk] += q
        cnt[pk] += 1
    kept = [(pk, q, p) for pk, q, p in rows
            if 5 * q * cnt[pk] < sum_q[pk]]

    out = q17_small_qty_revenue(
        ray.data.read_parquet(_sf("lineitem")),
        pq.read_table(_sf("part")), brand="Brand#13").to_pylist()
    assert len(out) == 1
    assert out[0]["p_brand"] == "Brand#13"
    assert out[0]["n_lineitems"] == len(kept)
    assert out[0]["total_price_e2"] == sum(p for _, _, p in kept)
    assert rows, "brand prune selected nothing — test is vacuous"


def test_q22_idle_balances_bruteforce():
    import ray.data
    from onestools_eventlog_ray.pipelines.relational import \
        q22_idle_balances

    cu = pq.read_table(_sf("customer"))
    bal = {ck: int(np.floor(b * 100 + 0.5)) for ck, b in
           zip(cu["c_custkey"].to_pylist(), cu["c_acctbal"].to_pylist())}
    nat = dict(zip(cu["c_custkey"].to_pylist(),
                   cu["c_nationkey"].to_pylist()))
    pos = [b for b in bal.values() if b > 0]
    s, n = sum(pos), len(pos)
    has_ord = set(pq.read_table(_sf("orders"))["o_custkey"].to_pylist())
    per_nat = defaultdict(lambda: [0, 0])
    for ck, b in bal.items():
        if b * n > s and ck not in has_ord:
            per_nat[nat[ck]][0] += 1
            per_nat[nat[ck]][1] += b

    out = q22_idle_balances(
        ray.data.read_parquet(_sf("customer")),
        ray.data.read_parquet(_sf("orders"))).to_pylist()
    got = {r["c_nationkey"]: (r["numcust"], r["totacctbal_e2"])
           for r in out}
    assert got == {k: tuple(v) for k, v in per_nat.items()}
    assert [r["c_nationkey"] for r in out] \
        == sorted(r["c_nationkey"] for r in out)


def test_q22_idle_balances_planted(tmp_path):
    # the synthetic TPC-H tables have (almost) no zero-order customers,
    # so the anti-join arm is vacuous there — plant one directly.
    import pyarrow as pa
    import ray.data
    from onestools_eventlog_ray.pipelines.relational import \
        q22_idle_balances

    cust = pa.table({
        "c_custkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "c_nationkey": pa.array([0, 0, 1, 1, 1], pa.int64()),
        # e2 balances: 100.00, 900.00, 900.00, 10.00, -50.00
        "c_acctbal": pa.array([100.0, 900.0, 900.0, 10.0, -50.0]),
    })
    orders = pa.table({
        "o_custkey": pa.array([1, 1, 3], pa.int64()),
        "o_orderkey": pa.array([10, 11, 12], pa.int64()),
    })
    pq.write_table(cust, str(tmp_path / "customer.parquet"))
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    # mean positive bal = (100+900+900+10)/4 = 477.50; eligible: 2, 3
    # (bal 900 > mean); of those only cust 2 has NO orders -> nation 0.
    out = q22_idle_balances(
        ray.data.read_parquet(str(tmp_path / "customer.parquet")),
        ray.data.read_parquet(str(tmp_path / "orders.parquet"))) \
        .to_pylist()
    assert out == [{"c_nationkey": 0, "numcust": 1,
                    "totacctbal_e2": 90000}]


def test_top_metrics_bruteforce():
    import ray.data
    from onestools_eventlog_ray.pipelines.relational import top_metrics

    t = pq.read_table(_sf("documents"),
                      columns=["doc_id", "lang", "n_chars"])
    best = {}
    for d, l, n in zip(t["doc_id"].to_pylist(), t["lang"].to_pylist(),
                       t["n_chars"].to_pylist()):
        cur = best.get(l)
        if cur is None or (-n, d) < (-cur[1], cur[0]):
            best[l] = (d, n)
    out = top_metrics(
        ray.data.read_parquet(_sf("documents"),
                              columns=["doc_id", "lang", "n_chars"]),
        by="lang", sort_col="n_chars", metric_cols=("doc_id",)) \
        .to_pylist()
    assert {r["lang"]: (r["doc_id"], r["n_chars"]) for r in out} == best
    assert [r["lang"] for r in out] == sorted(best)


def test_adjacency_matrix_planted(tmp_path):
    import pyarrow as pa
    import ray
    from onestools_eventlog_ray.config import EngineConfig
    from onestools_eventlog_ray.pipelines.build import build_index
    from onestools_eventlog_ray.pipelines.query import \
        adjacency_matrix_named

    docs = pa.table({
        "doc_id": pa.array(list(range(6)), pa.int64()),
        "text": pa.array(["x y", "x", "y z", "x y z", "q", "z"],
                         pa.string()),
        "lang": pa.array(["en"] * 6, pa.string()),
        "source": pa.array(["s"] * 6, pa.string()),
        "n_chars": pa.array([3, 1, 3, 5, 1, 1], pa.int64()),
    })
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    pq.write_table(docs, str(corpus / "part-0.parquet"))
    from onestools_eventlog_ray.sources.corpus import DOCUMENTS_SPEC
    build_index(str(corpus), str(tmp_path / "idx"),
                cfg=EngineConfig(num_partitions=4), spec=DOCUMENTS_SPEC)
    out = adjacency_matrix_named(str(tmp_path / "idx"),
                                 {"a": "x", "b": "y", "c": "z",
                                  "d": "missing"}).to_pylist()
    got = {r["key"]: r["n_docs"] for r in out}
    # x:3 y:3 z:3, x&y:2 x&z:1 y&z:2; 'missing' and its pairs omitted
    assert got == {"a": 3, "b": 3, "c": 3,
                   "a&b": 2, "a&c": 1, "b&c": 2}
    assert [r["key"] for r in out] == sorted(got)


def _tok(text):
    import re
    return [t for t in re.split(r"[^a-z0-9_]+", text.lower()) if t]


def test_kn_count_of_counts_bruteforce():
    import ray.data
    from onestools_eventlog_ray.pipelines.text import kn_count_of_counts
    from onestools_eventlog_ray.sources.corpus import DOCUMENTS_SPEC

    t = pq.read_table(_sf("documents"))
    cnt = Counter()
    for txt in t["text"].to_pylist():
        toks = _tok(txt)
        for a, b in zip(toks, toks[1:]):
            cnt[(a, b)] += 1
    want = Counter(min(n, 8) for n in cnt.values())

    out = kn_count_of_counts(
        ray.data.read_parquet(_sf("documents")), DOCUMENTS_SPEC,
        cap=8).to_pylist()
    assert {r["r"]: r["n_bigrams"] for r in out} == dict(want)
    assert [r["r"] for r in out] == sorted(want)
    assert 1 in want and want[1] > 0   # N_1 must exist for KN discounts


def test_moving_pcts_bruteforce():
    import ray.data
    from onestools_eventlog_ray.pipelines.streaming import \
        date_histogram_moving_pcts

    ev = pq.read_table(_sf("events"), columns=["ts"])
    days = [int(ts.timestamp() * 1_000_000) // 86_400_000_000
            for ts in ev["ts"].to_pylist()]
    per_day = Counter(days)
    lo, hi = min(per_day), max(per_day)
    series = [per_day.get(d, 0) for d in range(lo, hi + 1)]

    out = date_histogram_moving_pcts(
        ray.data.read_parquet(_sf("events"), columns=["ts"]),
        window=7, qs=(50, 90)).to_pylist()
    assert len(out) == len(series)
    for i, r in enumerate(out):
        w = sorted(series[max(0, i - 6):i + 1])
        assert r["epoch_day"] == lo + i
        assert r["n_events"] == series[i]
        for q, col in ((50, "p50"), (90, "p90")):
            idx = max(int(np.ceil(q / 100 * len(w))) - 1, 0)
            assert r[col] == w[idx], (i, q)
    # p90 dominates p50 everywhere
    assert all(r["p90"] >= r["p50"] for r in out)


def test_tfidf_pair_mining_bruteforce():
    import ray.data
    from onestools_eventlog_ray.pipelines.text import tfidf_pair_mining
    from onestools_eventlog_ray.sources.corpus import DOCUMENTS_SPEC

    t = pq.read_table(_sf("documents"))
    docs = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    n_docs = len(docs)
    tf = {d: Counter(_tok(txt)) for d, txt in docs.items()}
    df = Counter()
    for c in tf.values():
        df.update(c.keys())
    rare = {w for w, d in df.items() if 2 <= d <= 380}
    weights = {d: {w: int(np.floor(c[w] * np.log(n_docs / df[w]) * 1000
                                   + 0.5))
                   for w in c if w in rare}
               for d, c in tf.items()}
    dots = Counter()
    ids = sorted(weights)
    for a_i, a in enumerate(ids):
        wa = weights[a]
        if not wa:
            continue
        for b in ids[a_i + 1:]:
            s = sum(wv * weights[b].get(wk, 0) for wk, wv in wa.items())
            if s:
                dots[(a, b)] += s
    want = sorted(((-d, i, j) for (i, j), d in dots.items()))[:20]

    out = tfidf_pair_mining(ray.data.read_parquet(_sf("documents")),
                            DOCUMENTS_SPEC, df_cap=380, k=20).to_pylist()
    assert [(-r["dot_e6"], r["doc_i"], r["doc_j"]) for r in out] == want
    assert want, "no rare-term pairs at sf0.001 — test vacuous"
