"""Round-5: CEP Kleene-plus (A B+ C strict contiguity) and bounded
k-core peeling over a planted pair graph."""

import datetime

import numpy as np
import pyarrow as pa
import pytest


def _stream(user_seqs: dict[int, list[str]]) -> pa.Table:
    uid, ts, eid, et = [], [], [], []
    n = 0
    for u, seq in user_seqs.items():
        for i, t in enumerate(seq):
            uid.append(u)
            ts.append(datetime.datetime(2024, 1, 1) +
                      datetime.timedelta(minutes=i))
            eid.append(n)
            et.append(t)
            n += 1
    return pa.table({
        "user_id": pa.array(uid, pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "event_id": pa.array(eid, pa.int64()),
        "event_type": pa.array(et, pa.string()),
    })


def test_cep_kleene_plus_planted(ray_session):
    import ray.data
    from onestools_eventlog_ray.pipelines.streaming import cep_kleene_plus
    ev = _stream({
        # one match, run length 2
        1: ["click", "view", "view", "purchase"],
        # NO match: zero views between (strict contiguity, B+ needs >=1)
        2: ["click", "purchase"],
        # NO match: blocked by an error inside the run
        3: ["click", "view", "error", "view", "purchase"],
        # two matches: lengths 1 and 3
        4: ["click", "view", "purchase", "click", "view", "view",
            "view", "purchase", "signup"],
        # NO match: run ends at stream end (no C)
        5: ["click", "view", "view"],
        # NO match: starts with view (no A)
        6: ["view", "view", "purchase"],
    })
    out = cep_kleene_plus(ray.data.from_arrow(ev)).to_pandas()
    assert out["user_id"].tolist() == [1, 4]
    assert out["n_matches"].tolist() == [1, 2]
    assert out["sum_runlen"].tolist() == [2, 4]
    assert out["max_runlen"].tolist() == [2, 3]


def test_cep_kleene_order_is_ts_then_event_id(ray_session):
    import ray.data
    from onestools_eventlog_ray.pipelines.streaming import cep_kleene_plus
    t0 = datetime.datetime(2024, 1, 1)
    # same timestamp: event_id breaks the tie -> click, view, purchase
    ev = pa.table({
        "user_id": pa.array([7, 7, 7], pa.int64()),
        "ts": pa.array([t0, t0, t0], pa.timestamp("us")),
        "event_id": pa.array([2, 1, 3], pa.int64()),
        "event_type": pa.array(["view", "click", "purchase"]),
    })
    out = cep_kleene_plus(ray.data.from_arrow(ev)).to_pandas()
    assert out["n_matches"].tolist() == [1]
    assert out["sum_runlen"].tolist() == [1]


def _docs(texts: list[str]) -> pa.Table:
    return pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * len(texts)),
        "source": pa.array(["t"] * len(texts)),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


def test_kcore_peels_pendant_chain(ray_session):
    """A triangle of near-identical docs survives the 2-core; a pendant
    near-dup hanging off it (degree 1) is peeled away."""
    import ray.data
    from onestools_eventlog_ray.pipelines import dedup

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon")
    tri = [base + " one", base + " two", base + " three"]
    pendant = [base + " one x0 x1 x2 x3 x4 x5 x6 x7 x8 x9 y0 y1 y2 y3"]
    noise = [f"completely different text number {i} with its own words "
             f"qq{i} ww{i} ee{i} rr{i} tt{i} yy{i} uu{i} ii{i}"
             for i in range(6)]
    docs = _docs(tri + pendant + noise)
    ds = ray.data.from_arrow(docs)
    # sanity: the pendant really pairs with exactly one triangle member
    pairs = dedup.minhash_verified_pairs(
        ds, min_jaccard=0.2).to_pandas()
    deg = {}
    for _, r in pairs.iterrows():
        deg[r["doc_a"]] = deg.get(r["doc_a"], 0) + 1
        deg[r["doc_b"]] = deg.get(r["doc_b"], 0) + 1
    assert 1 in deg.values()          # a pendant exists
    core = dedup.kcore_report(ds, k=2, rounds=4,
                              min_jaccard=0.2).to_pandas()
    # the 2-core is exactly the triangle: 3 nodes, all degree 2
    assert len(core) == 3
    assert core["degree"].tolist() == [2, 2, 2]
    assert set(core["doc_id"]) < set(
        pairs["doc_a"].tolist() + pairs["doc_b"].tolist())


def test_kcore_empty_graph(ray_session):
    import ray.data
    from onestools_eventlog_ray.pipelines import dedup
    docs = _docs([f"unique text {i} aa{i} bb{i} cc{i} dd{i} ee{i} ff{i}"
                  for i in range(5)])
    core = dedup.kcore_report(ray.data.from_arrow(docs), k=2,
                              rounds=4, min_jaccard=0.2)
    assert core.num_rows == 0
