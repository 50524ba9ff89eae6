"""Round-5 coverage: C4/Gopher quality-filter features + funnel, the
deterministic FIM transform, ES top_hits / bucket_script aggs, and the
DFR I(n)L2 similarity — each checked against a brute-force Python
re-implementation on a tiny planted corpus."""
import hashlib
import math
import re

import numpy as np
import pyarrow as pa
import pytest

from onestools_eventlog_ray.sources.corpus import DOCUMENTS_SPEC

TEXTS = [
    "the quick brown fox jumps over the lazy dog. it was fast!\n"
    "short line\n"
    "a much longer line that keeps going with many words in it ok?",
    "def f(x):\n    return x + 1\n\n# comment line\nprint(f(2))",
    "one\ntwo\nthree",
    "### heading ... with ellipsis ... and #hash tags everywhere ...",
    "word " * 50,
    "",
]
LANGS = ["en", "py", "en", "md", "en", "en"]


def _docs_table():
    return pa.table({
        "doc_id": pa.array(range(1, len(TEXTS) + 1), pa.int64()),
        "text": pa.array(TEXTS),
        "lang": pa.array(LANGS),
        "source": pa.array(["t"] * len(TEXTS)),
        "n_chars": pa.array([len(t) for t in TEXTS], pa.int64()),
    })


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data
    return ray.data.from_arrow(_docs_table())


def test_line_quality_filters_brute(docs_ds):
    from onestools_eventlog_ray.pipelines.text import line_quality_filters
    got = {r["doc_id"]: r for r in
           line_quality_filters(docs_ds, DOCUMENTS_SPEC).take_all()}
    for i, t in enumerate(TEXTS):
        lines = t.split("\n")
        n_lines = len(lines)
        max_len = max(len(x) for x in lines)
        char_sum = sum(len(x) for x in lines)
        punct = sum(1 for x in lines if re.search(r"[.!?]$", x))
        total = len(t)
        alnum = len(re.findall(r"[a-zA-Z0-9]", t))
        n_words = len(re.findall(r"\S+", t))
        r = got[i + 1]
        assert r["n_lines"] == n_lines
        assert r["max_line_len"] == max_len
        assert r["mean_line_len_e6"] == char_sum * 1_000_000 // n_lines
        assert r["punct_line_frac_e6"] == punct * 1_000_000 // n_lines
        assert r["alnum_frac_e6"] == (
            alnum * 1_000_000 // total if total else 0)
        assert r["n_words"] == n_words


def test_quality_funnel_brute(docs_ds):
    from onestools_eventlog_ray.pipelines.text import (
        QUALITY_FUNNEL_STAGES, quality_funnel)
    t = quality_funnel(docs_ds, DOCUMENTS_SPEC)
    got = dict(zip(t["stage"].to_pylist(), t["n_docs"].to_pylist()))
    assert list(t["stage"].to_pylist()) == list(QUALITY_FUNNEL_STAGES)

    counts = [0] * 6
    for txt in TEXTS:
        n_words = len(re.findall(r"\S+", txt))
        nonws = len(txt) - len(re.findall(r"\s", txt))
        n_sym = len(re.findall(r"#", txt)) + len(re.findall(r"\.\.\.", txt))
        n_alpha = len(re.findall(r"\S*[a-zA-Z]\S*", txt))
        mll = max(len(x) for x in txt.split("\n"))
        conds = [True,
                 10 <= n_words <= 100_000,
                 3 * n_words <= nonws <= 10 * n_words,
                 n_sym * 10 <= n_words,
                 n_alpha * 10 >= n_words * 8,
                 mll <= 2000]
        ok = True
        for i, c in enumerate(conds):
            ok = ok and c
            counts[i] += ok
    for stage, want in zip(QUALITY_FUNNEL_STAGES, counts):
        assert got[stage] == want, stage
    # funnel is monotone non-increasing
    vals = [got[s] for s in QUALITY_FUNNEL_STAGES]
    assert all(a >= b for a, b in zip(vals, vals[1:]))


def test_fim_split_brute(docs_ds):
    from onestools_eventlog_ray.pipelines.text import fim_split
    got = {r["doc_id"]: r for r in
           fim_split(docs_ds, DOCUMENTS_SPEC).take_all()}
    for i, t in enumerate(TEXTS):
        L = len(t)
        h = [int.from_bytes(hashlib.md5(
                (t + "\x1f" + salt).encode()).digest()[8:16], "little")
             % (L + 1) for salt in ("fim1", "fim2")]
        lo, hi = min(h), max(h)
        r = got[i + 1]
        assert (r["n_prefix"], r["n_middle"], r["n_suffix"]) == \
            (lo, hi - lo, L - hi)
        psm = t[:lo] + "\x1e" + t[hi:] + "\x1e" + t[lo:hi]
        assert r["psm_md5"] == hashlib.md5(psm.encode()).hexdigest()
        # segments reassemble to the original doc
        assert t[:lo] + t[lo:hi] + t[hi:] == t


def test_top_hits_by_lang_brute(docs_ds):
    from onestools_eventlog_ray.pipelines.text import top_hits_by_lang
    rows = top_hits_by_lang(docs_ds, k=2, spec=DOCUMENTS_SPEC).take_all()
    got = sorted((r["lang"], r["rank"], r["doc_id"], r["n_chars"])
                 for r in rows)
    want = []
    for lg in set(LANGS):
        docs = sorted(((len(TEXTS[i]), i + 1) for i in range(len(TEXTS))
                       if LANGS[i] == lg), key=lambda x: (-x[0], x[1]))[:2]
        want += [(lg, rank + 1, did, nch)
                 for rank, (nch, did) in enumerate(docs)]
    assert got == sorted(want)


def test_date_histogram_bucket_script_brute(ray_session):
    import ray.data
    from onestools_eventlog_ray.pipelines.streaming import (
        date_histogram_bucket_script)
    # 3 days: day0 = 12 clicks / 5 purchases, day1 = 9 clicks (dropped by
    # the selector), day2 = 10 clicks / 0 purchases
    us = []
    types = []
    day_us = 86_400_000_000
    for day, (n_click, n_buy) in enumerate([(12, 5), (9, 4), (10, 0)]):
        us += [day * day_us + k for k in range(n_click)]
        types += ["click"] * n_click
        us += [day * day_us + 500 + k for k in range(n_buy)]
        types += ["purchase"] * n_buy
    ds = ray.data.from_arrow(pa.table({
        "ts": pa.array(us, pa.timestamp("us")),
        "event_type": pa.array(types),
    }))
    t = date_histogram_bucket_script(ds, min_den=10)
    assert t["epoch_day"].to_pylist() == [0, 2]
    assert t["n_den"].to_pylist() == [12, 10]
    assert t["n_num"].to_pylist() == [5, 0]
    assert t["ratio_e6"].to_pylist() == [5 * 1_000_000 // 12, 0]


TERMS = ["fox", "line", "word"]


def test_dfr_inl2_brute(ray_session, tmp_path_factory):
    import pyarrow.parquet as pq

    from onestools_eventlog_ray.config import EngineConfig
    from onestools_eventlog_ray.pipelines.build import build_index
    from onestools_eventlog_ray.pipelines.query import SearchEngine

    root = tmp_path_factory.mktemp("dfr")
    corpus = str(root / "docs.parquet")
    pq.write_table(_docs_table(), corpus)
    idx = str(root / "idx")
    build_index(corpus, idx, spec=DOCUMENTS_SPEC,
                cfg=EngineConfig(num_partitions=4))
    eng = SearchEngine(idx)

    toks = [re.findall(r"[a-z0-9_]+", t.lower()) for t in TEXTS]
    n_docs = len(TEXTS)
    avgdl = sum(len(d) for d in toks) / n_docs
    expect = {}
    for i, d in enumerate(toks):
        s = 0
        for q in TERMS:
            tf = d.count(q)
            if not tf:
                continue
            df = sum(1 for dd in toks if q in dd)
            tfn = tf * math.log2(1 + avgdl / len(d))
            val = tfn / (tfn + 1) * math.log2((n_docs + 1) / (df + 0.5))
            s += max(0, int(math.floor(val * 1_000_000 + 0.5)))
        if any(q in d for q in TERMS):
            expect[i + 1] = s
    want = sorted(expect.items(), key=lambda kv: (-kv[1], kv[0]))
    assert eng.search_lm(TERMS, k=10, similarity="dfr_inl2") == want


def test_line_dedup_clean_planted(ray_session):
    import hashlib as _h

    import ray.data
    from onestools_eventlog_ray.pipelines.dedup import line_dedup_clean
    docs = [
        "keep me\nBOILER\nunique a",     # BOILER in docs 1+2 -> removed
        "BOILER\nunique b\nBOILER",      # both occurrences removed
        "solo\nsolo\nsolo",              # repeats WITHIN one doc only:
                                         # 1 distinct doc -> kept
    ]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(docs),
        "lang": pa.array(["en"] * 3),
        "source": pa.array(["t"] * 3),
        "n_chars": pa.array([len(t) for t in docs], pa.int64()),
    }))
    got = {r["doc_id"]: r for r in
           line_dedup_clean(ds, min_docs=2).take_all()}
    assert (got[1]["n_lines"], got[1]["n_removed"]) == (3, 1)
    assert got[1]["clean_md5"] == _h.md5(
        "keep me\nunique a".encode()).hexdigest()
    assert (got[2]["n_lines"], got[2]["n_removed"]) == (3, 2)
    assert got[2]["clean_md5"] == _h.md5("unique b".encode()).hexdigest()
    assert (got[3]["n_lines"], got[3]["n_removed"]) == (3, 0)
    assert got[3]["clean_md5"] == _h.md5(docs[2].encode()).hexdigest()


def test_mg_heavy_hitters_bound(ray_session):
    import ray.data
    from onestools_eventlog_ray.pipelines.sketch import mg_heavy_hitters
    # planted zipf-ish corpus: "hot" dominates, long tail of singletons
    docs = []
    for i in range(40):
        body = ["hot"] * 20 + ["warm"] * 5 + [f"tail{i}_{j}"
                                              for j in range(30)]
        docs.append(" ".join(body))
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(1, 41), pa.int64()),
        "text": pa.array(docs),
        "lang": pa.array(["en"] * 40),
        "source": pa.array(["t"] * 40),
        "n_chars": pa.array([len(t) for t in docs], pa.int64()),
    }))
    out = mg_heavy_hitters(ds, n_partitions=4, n_counters=8, top=5)
    rows = {r["term"]: r for r in out.to_pylist()}
    # the true heavy hitters surface, estimates bracket the truth
    assert out["term"].to_pylist()[0] == "hot"
    assert rows["hot"]["true_n"] == 800
    for r in rows.values():
        assert r["est_n"] <= r["true_n"] <= r["est_n"] + r["err_bound"]
        assert r["within"] == 1


def test_terms_set_matches_planted(ray_session, tmp_path_factory):
    import pyarrow.parquet as pq

    from onestools_eventlog_ray.config import EngineConfig
    from onestools_eventlog_ray.pipelines.build import build_index
    from onestools_eventlog_ray.pipelines.query import SearchEngine

    texts = ["spark vector window",      # doc 1: 3 matched, msm 2 -> in
             "spark vector window",      # doc 2: 3 matched, msm 3 -> in
             "spark",                    # doc 3: 1 matched, msm 1 -> in
             "spark vector",             # doc 4: 2 matched, msm 2 -> in
             "vector",                   # doc 5: 1 matched, msm 3 -> out
             "nothing here"]             # doc 6: 0 matched -> out
    root = tmp_path_factory.mktemp("tset")
    corpus = str(root / "docs.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(1, 7), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * 6),
        "source": pa.array(["t"] * 6),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), corpus)
    idx = str(root / "idx")
    build_index(corpus, idx, spec=DOCUMENTS_SPEC,
                cfg=EngineConfig(num_partitions=2))
    eng = SearchEngine(idx)
    got = eng.terms_set_matches(["spark", "vector", "window"], k=20,
                                msm_mod=3)
    # msm(doc) = 1 + doc_id % 3: doc1->2, doc2->3, doc3->1, doc4->2,
    # doc5->3, doc6->1
    assert got == [(1, 3, 2), (2, 3, 3), (4, 2, 2), (3, 1, 1)]


def test_search_synonyms_planted(ray_session, tmp_path_factory):
    import math

    import pyarrow.parquet as pq

    from onestools_eventlog_ray.config import EngineConfig
    from onestools_eventlog_ray.pipelines.build import build_index
    from onestools_eventlog_ray.pipelines.query import SearchEngine

    texts = ["spark engine", "fast engine", "spark fast engine",
             "window pane glass", "nothing"]
    root = tmp_path_factory.mktemp("syn")
    corpus = str(root / "docs.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(1, 6), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * 5),
        "source": pa.array(["t"] * 5),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), corpus)
    idx = str(root / "idx")
    build_index(corpus, idx, spec=DOCUMENTS_SPEC,
                cfg=EngineConfig(num_partitions=2))
    eng = SearchEngine(idx)

    toks = [t.split() for t in texts]
    N, avgdl = 5, sum(len(d) for d in toks) / 5

    def brute(groups):
        out = {}
        for g in groups:
            per_doc = {}
            for i, d in enumerate(toks):
                tf = sum(d.count(t) for t in g)
                if tf:
                    per_doc[i + 1] = tf
            df = len(per_doc)
            for doc, tf in per_doc.items():
                dl = len(toks[doc - 1])
                w = math.log(1 + (N - df + 0.5) / (df + 0.5)) \
                    * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
                e6 = max(0, int(math.floor(w * 1_000_000 + 0.5)))
                out[doc] = out.get(doc, 0) + e6
        return sorted(out.items(), key=lambda kv: (-kv[1], kv[0]))

    # merged group: docs 1-3 all match {spark,fast} as ONE term (df=3);
    # doc 3 has tf=2
    groups = [["spark", "fast"], ["window", "absent_zzz"]]
    assert eng.search_synonyms(groups, k=10) == brute(groups)
    # a group whose every surface is absent contributes nothing
    assert eng.search_synonyms([["absent_zzz", "missing_qqq"]], k=5) == []
    # single-surface group == plain term scoring
    assert eng.search_synonyms([["window"]], k=5) == brute([["window"]])


def test_word_dropout_planted(ray_session):
    import hashlib as _h

    import ray.data
    from onestools_eventlog_ray.pipelines.text import word_dropout
    docs = ["alpha beta gamma delta", "  spaced   out  words ", ""]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([7, 8, 9], pa.int64()),
        "text": pa.array(docs),
        "lang": pa.array(["en"] * 3),
        "source": pa.array(["t"] * 3),
        "n_chars": pa.array([len(t) for t in docs], pa.int64()),
    }))
    got = {r["doc_id"]: r for r in
           word_dropout(ds, rate_mod=10).take_all()}
    for did, txt in zip([7, 8, 9], docs):
        words = re.findall(r"\S+", txt)
        kept = []
        n_drop = 0
        for i, w in enumerate(words):
            h = int.from_bytes(_h.md5(
                f"{did}:{i}:{w}".encode()).digest()[8:16], "little")
            if h % 10 == 0:
                n_drop += 1
            else:
                kept.append(w)
        r = got[did]
        assert r["n_tokens"] == len(words)
        assert r["n_dropped"] == n_drop
        assert r["kept_md5"] == _h.md5(" ".join(kept).encode()).hexdigest()
