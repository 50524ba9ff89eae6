"""Round-4c additions: ExactSubstr-style duplicated-span dedup
(Lee et al. 2021) — removal spans + corpus-savings rollup."""

import numpy as np
import pyarrow as pa

import ray
import ray.data

from onestools_eventlog_ray.pipelines import dedup
from onestools_eventlog_ray.pipelines.dedup import (
    _shingle_pos, exact_substr_spans, exact_substr_savings)
from onestools_eventlog_ray.sources.corpus import CorpusSpec


SPEC = CorpusSpec(content_col="text", id_col="doc_id",
                  key_cols=("doc_id",), meta_cols=("source",))

BOILER = "alpha bravo charlie delta echo foxtrot golf hotel"   # 8 tokens


def _docs() -> pa.Table:
    """Planted corpus: docs 0/1 share an 8-token boilerplate block
    (at token offsets 2 and 0), doc 2 shares a LONGER 10-token block
    with doc 3 (overlapping 8-grams must merge into one span), doc 4
    is unique, doc 5 is too short to hold any 8-gram."""
    long_block = BOILER + " india juliet"                       # 10 tokens
    rows = [
        (0, "zz yy " + BOILER + " qq rr", "s0"),
        (1, BOILER + " mm nn oo pp", "s0"),
        (2, "aa " + long_block + " bb", "s1"),
        (3, long_block + " cc dd ee", "s1"),
        (4, "one two three four five six seven eight nine ten", "s1"),
        (5, "tiny doc here", "s0"),
    ]
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "source": pa.array([r[2] for r in rows], pa.string()),
    })


def test_shingle_pos_positions():
    toks = pa.array([["a", "b", "c", "d"], ["x"], []],
                    pa.list_(pa.string()))
    g, par, pos = _shingle_pos(toks, 2)
    assert g.to_pylist() == ["a\x1fb", "b\x1fc", "c\x1fd"]
    assert par.tolist() == [0, 0, 0]
    assert pos.tolist() == [0, 1, 2]


def test_exact_substr_spans_planted():
    ds = ray.data.from_arrow(_docs())
    out = exact_substr_spans(ds, SPEC, k=8, min_docs=2)
    got = [tuple(r.values()) for r in out.to_pylist()]
    # doc 0: boilerplate at tokens [2, 10); doc 1 at [0, 8);
    # docs 2/3: the 10-token block = three overlapping 8-grams merged
    # into ONE maximal span ([1, 11) in doc 2, [0, 10) in doc 3).
    assert got == [
        (0, 2, 10, 8),
        (1, 0, 8, 8),
        (2, 1, 11, 10),
        (3, 0, 10, 10),
    ]


def test_exact_substr_spans_split_batches():
    # same corpus split across 4 blocks: pass-A distinct-doc partials
    # must still sum exactly (each doc lives in exactly one batch)
    ds = ray.data.from_arrow(_docs()).repartition(4)
    out = exact_substr_spans(ds, SPEC, k=8, min_docs=2)
    assert out.num_rows == 4
    assert out["span_tokens"].to_pylist() == [8, 8, 10, 10]


def test_exact_substr_savings_rollup():
    ds = ray.data.from_arrow(_docs())
    out = exact_substr_savings(ds, SPEC, k=8, min_docs=2, by="source")
    rows = {r["source"]: r for r in out.to_pylist()}
    # s0: docs 0 (12 tok, 8 dup) + 1 (12 tok, 8 dup) + 5 (3 tok, 0)
    assert rows["s0"]["n_tokens"] == 27
    assert rows["s0"]["dup_tokens"] == 16
    # s1: docs 2 (12 tok, 10 dup) + 3 (13 tok, 10 dup) + 4 (10 tok, 0)
    assert rows["s1"]["n_tokens"] == 35
    assert rows["s1"]["dup_tokens"] == 20
    for r in rows.values():
        assert r["dup_share_e6"] == r["dup_tokens"] * 10**6 // r["n_tokens"]


def test_exact_substr_no_dups():
    t = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["one two three four five six seven eight",
                          "nine ten eleven twelve thirteen fourteen "
                          "fifteen sixteen"], pa.string()),
        "source": pa.array(["s0", "s0"], pa.string()),
    })
    ds = ray.data.from_arrow(t)
    out = exact_substr_spans(ds, SPEC, k=8, min_docs=2)
    assert out.num_rows == 0
    assert out.schema == dedup._SPAN_SCHEMA
    sav = exact_substr_savings(ds, SPEC, k=8, min_docs=2, by="source")
    assert sav["dup_tokens"].to_pylist() == [0]
    assert sav["n_tokens"].to_pylist() == [16]


def test_exact_substr_gap_exactly_k_merges():
    # two hits k apart cover adjacent ranges -> one contiguous span
    blk = "p1 p2 p3 p4 p5 p6 p7 p8"
    mid = "m1 m2 m3 m4 m5 m6 m7 m8"
    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        # doc 0: blk at 0 and at 16 (gap 16 > 8: two spans) plus mid at 8
        # (adjacent to both: all three merge into ONE [0, 24) span)
        "text": pa.array([f"{blk} {mid} {blk}", blk, mid], pa.string()),
        "source": pa.array(["s0", "s0", "s0"], pa.string()),
    })
    ds = ray.data.from_arrow(t)
    out = exact_substr_spans(ds, SPEC, k=8, min_docs=2)
    by_doc = {}
    for r in out.to_pylist():
        by_doc.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"]))
    assert by_doc[0] == [(0, 24)]
    assert by_doc[1] == [(0, 8)]
    assert by_doc[2] == [(0, 8)]


# ---------------------------------------------------------------------------
# exact_substr_clean
# ---------------------------------------------------------------------------

def test_exact_substr_clean_planted():
    ds = ray.data.from_arrow(_docs())
    out = dedup.exact_substr_clean(ds, SPEC, k=8, min_docs=2)
    rows = {r["doc_id"]: r for r in out.to_pylist()}
    assert sorted(rows) == [0, 1, 2, 3]
    assert rows[0]["clean_text"] == "zz yy qq rr"
    assert rows[0]["n_tokens"] == 12 and rows[0]["n_removed"] == 8
    assert rows[1]["clean_text"] == "mm nn oo pp"
    assert rows[2]["clean_text"] == "aa bb"
    assert rows[2]["n_removed"] == 10
    assert rows[3]["clean_text"] == "cc dd ee"


def test_exact_substr_clean_fully_covered_doc():
    # two identical docs: every position covered -> clean_text == ""
    txt = "q1 q2 q3 q4 q5 q6 q7 q8 q9"
    t = pa.table({"doc_id": pa.array([7, 8], pa.int64()),
                  "text": pa.array([txt, txt], pa.string()),
                  "source": pa.array(["s0", "s0"], pa.string())})
    out = dedup.exact_substr_clean(ray.data.from_arrow(t), SPEC,
                                   k=8, min_docs=2)
    rows = out.to_pylist()
    assert [r["doc_id"] for r in rows] == [7, 8]
    for r in rows:
        assert r["clean_text"] == ""
        assert r["n_removed"] == 9 and r["n_tokens"] == 9


# ---------------------------------------------------------------------------
# string_stats / boxplot / logreg_step
# ---------------------------------------------------------------------------

def test_string_stats_by_group_exact():
    from onestools_eventlog_ray.pipelines import relational
    t = pa.table({"lang": pa.array(["en", "en", "de"], pa.string()),
                  "text": pa.array(["aab", "b", "zzzz"], pa.string())})
    out = relational.string_stats_by_group(
        ray.data.from_arrow(t), key="lang", col="text")
    rows = {r["lang"]: r for r in out.to_pylist()}
    assert rows["de"]["n"] == 1
    assert rows["de"]["min_len"] == rows["de"]["max_len"] == 4
    assert rows["de"]["entropy_e6"] == 0          # single char: p=1
    en = rows["en"]
    assert (en["n"], en["min_len"], en["max_len"]) == (2, 1, 3)
    assert en["avg_len_e6"] == 2_000_000
    # chars over group: a:2, b:2 -> entropy = 1 bit exactly
    assert en["entropy_e6"] == 1_000_000


def test_value_boxplot_exact():
    from onestools_eventlog_ray.pipelines import relational
    vals = [1.0, 2.0, 3.0, 4.0, 100.0]
    t = pa.table({"event_type": pa.array(["x"] * 5, pa.string()),
                  "value": pa.array(vals, pa.float64())})
    out = relational.value_boxplot_by_type(
        ray.data.from_arrow(t)).take_all()
    r = out[0]
    # sorted e6: [1M, 2M, 3M, 4M, 100M]; disc idx (p*5+99)//100-1
    assert (r["q1_e6"], r["q2_e6"], r["q3_e6"]) == (2_000_000, 3_000_000,
                                                    4_000_000)
    assert r["iqr_e6"] == 2_000_000
    assert r["lo_fence_e6"] == -1_000_000
    assert r["hi_fence_e6"] == 7_000_000
    assert r["n_outliers"] == 1


def test_logreg_step_exact():
    from onestools_eventlog_ray.pipelines import similarity
    t = pa.table({
        "embedding": pa.array([[1.0, -2.0], [0.5, 4.0]],
                              pa.list_(pa.float32())),
        "label": pa.array([1, 0], pa.int32()),
    })
    out = similarity.logreg_step(ray.data.from_arrow(t))
    rows = {r["dim"]: r for r in out.to_pylist()}
    # dim0: 1*(0.5-1)=-0.5 -> floor(-499999.5) = -500000; 0.5*0.5 -> 250000
    assert rows[0]["grad_e6"] == -500000 + 250000
    # dim1: -2*(-0.5)=1.0 -> 1e6; 4*0.5=2.0 -> 2e6
    assert rows[1]["grad_e6"] == 3_000_000
    assert rows[0]["n"] == rows[1]["n"] == 2


# ---------------------------------------------------------------------------
# q4 / rfm / dau_mau / l_diversity / pinned
# ---------------------------------------------------------------------------

def _ts(day: int, hour: int = 0) -> int:
    return (day * 24 + hour) * 3_600_000_000


def test_q4_order_priority_exists_semantics():
    from onestools_eventlog_ray.pipelines import relational
    od = pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_orderdate": pa.array([_ts(0), _ts(0), _ts(0)],
                                pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT", "1-URGENT", "2-HIGH"],
                                    pa.string()),
    })
    li = pa.table({
        # order 1: two late lines (counted ONCE); order 2: on-time only;
        # order 3: one late line
        "l_orderkey": pa.array([1, 1, 2, 3], pa.int64()),
        "l_shipdate": pa.array([_ts(31), _ts(40), _ts(5), _ts(30)],
                               pa.timestamp("us")),
    })
    out = relational.q4_order_priority(
        ray.data.from_arrow(li), ray.data.from_arrow(od), lag_days=30)
    assert out.to_pydict() == {"o_orderpriority": ["1-URGENT", "2-HIGH"],
                               "n_orders": [1, 1]}


def test_rfm_segments_ntile_and_rollup():
    from onestools_eventlog_ray.pipelines import relational
    # 5 users, distinct metrics: user i purchases (i+1) times on day i
    # with value 10*(i+1) -> every metric ranks users identically
    uids, tss, vals = [], [], []
    for i in range(5):
        for _ in range(i + 1):
            uids.append(i)
            tss.append(_ts(i))
            vals.append(10.0 * (i + 1))
    t = pa.table({
        "ts": pa.array(tss, pa.timestamp("us")),
        "user_id": pa.array(uids, pa.int64()),
        "event_type": pa.array(["purchase"] * len(uids), pa.string()),
        "value": pa.array(vals, pa.float64()),
    })
    out = relational.rfm_segments(ray.data.from_arrow(t), "purchase",
                                  n_tiles=5)
    rows = {r["rfm_code"]: r for r in out.to_pylist()}
    # r is DESC (tile 1 = most recent); f/m are ASC (tile 1 = lowest):
    # user 4 -> r1 f5 m5 = 155 ... user 0 -> r5 f1 m1 = 511
    assert set(rows) == {155, 244, 333, 422, 511}
    assert all(r["n_users"] == 1 for r in rows.values())
    assert rows[155]["m_sum_e6"] == 5 * 50_000_000


def test_dau_mau_two_months():
    from onestools_eventlog_ray.pipelines import relational
    # Jan 1970: user 0 active day 0 and 1; user 1 active day 0
    # Feb 1970 (day 31): user 0 active once
    t = pa.table({
        "ts": pa.array([_ts(0), _ts(0, 5), _ts(1), _ts(0), _ts(31)],
                       pa.timestamp("us")),
        "user_id": pa.array([0, 0, 0, 1, 0], pa.int64()),
    })
    out = relational.dau_mau_stickiness(ray.data.from_arrow(t))
    rows = {r["month"]: r for r in out.to_pylist()}
    jan, feb = rows[0], rows[31]
    assert (jan["n_days"], jan["mau"], jan["dau_sum"]) == (2, 2, 3)
    assert jan["stickiness_e6"] == 3 * 10**6 // 4
    assert (feb["n_days"], feb["mau"], feb["dau_sum"]) == (1, 1, 1)
    assert feb["stickiness_e6"] == 10**6


def test_l_diversity_report():
    from onestools_eventlog_ray.pipelines import relational
    t = pa.table({
        "source": pa.array(["a", "a", "a", "b"], pa.string()),
        "lang": pa.array(["en", "de", "en", "fr"], pa.string()),
    })
    out = relational.l_diversity_report(ray.data.from_arrow(t),
                                        "source", "lang")
    assert out.to_pydict() == {"source": ["a", "b"],
                               "n_rows": [3, 1],
                               "l_distinct": [2, 1]}


def test_search_pinned(tmp_path):
    from onestools_eventlog_ray import synth
    from onestools_eventlog_ray.config import EngineConfig
    from onestools_eventlog_ray.pipelines.build import build_index
    from onestools_eventlog_ray.pipelines.query import (SearchEngine,
                                                        search_pinned,
                                                        score_docs)
    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "index")
    synth.write_corpus(corpus, n_docs=300, seed=11)
    build_index(corpus, index, cfg=EngineConfig(num_partitions=4))
    eng = SearchEngine(index)
    organic = eng.search(["def", "import"], 12)
    assert len(organic) >= 12
    # pin the 5th and 2nd organic docs, in that order
    pins = [organic[4][0], organic[1][0]]
    out = search_pinned(eng, ["def", "import"], pins, k=10)
    rows = out.to_pylist()
    assert [r["doc_id"] for r in rows[:2]] == pins
    assert [r["pinned"] for r in rows] == [1, 1] + [0] * 8
    # pinned scores are the organic scores, bit-exact
    sc = score_docs(eng, ["def", "import"], pins)
    assert rows[0]["score_e6"] == int(np.floor(sc[pins[0]] * 1e6 + 0.5))
    exp_org = [d for d, _ in organic if d not in set(pins)][:8]
    assert [r["doc_id"] for r in rows[2:]] == exp_org
    # a pinned doc matching NO query term scores 0 but still ranks first
    out2 = search_pinned(eng, ["def"], [organic[0][0]], k=5)
    assert out2["rank"].to_pylist()[0] == 1
