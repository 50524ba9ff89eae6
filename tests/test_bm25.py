"""BM25 math vs hand-computed scores (SURVEY.md §5.1)."""

import math

from onestools_eventlog_ray.functions.bm25 import BruteForceBM25, idf, term_weight


def test_idf_formula():
    assert math.isclose(idf(100, 10), math.log(1 + (100 - 10 + 0.5) / 10.5))


def test_hand_computed_score():
    # corpus: d0="x x y", d1="x z", d2="z z z z"
    docs = ["x x y", "x z", "z z z z"]
    o = BruteForceBM25([0, 1, 2], docs, k1=1.2, b=0.75)
    assert o.N == 3 and o.avgdl == 3.0
    # query "x": df=2, idf=ln(1+1.5/2.5)
    idf_x = math.log(1 + (3 - 2 + 0.5) / 2.5)
    # d0: tf=2, dl=3 -> w = idf * 2*2.2/(2 + 1.2*(1-0.75+0.75*3/3))
    w0 = idf_x * 2 * 2.2 / (2 + 1.2 * (0.25 + 0.75))
    w1 = idf_x * 1 * 2.2 / (1 + 1.2 * (0.25 + 0.75 * 2 / 3))
    got = dict(o.search(["x"], 10))
    assert math.isclose(got[0], w0, rel_tol=1e-12)
    assert math.isclose(got[1], w1, rel_tol=1e-12)


def test_tie_break_doc_id_asc():
    docs = ["q w", "q w", "q w"]   # identical docs -> identical scores
    o = BruteForceBM25([5, 3, 9], docs)
    res = o.search(["q"], 3)
    assert [d for d, _ in res] == [3, 5, 9]
    assert len({s for _, s in res}) == 1


def test_multi_term_sum_and_k():
    docs = ["alpha beta", "alpha alpha", "beta", "gamma"]
    o = BruteForceBM25([0, 1, 2, 3], docs)
    res = o.search(["alpha", "beta"], 2)
    assert len(res) == 2
    full = o.search(["alpha", "beta"], 10)
    assert res == full[:2]
    # zero-hit terms contribute nothing
    assert o.search(["alpha", "beta", "zzz"], 10) == full
