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
