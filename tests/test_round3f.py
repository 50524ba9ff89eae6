"""Round-3 session-6 brute-force tests: extended_stats, moving_avg
pipeline agg, completion suggester (and later session-6 operators)."""
import os
import re
from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _tok(text):
    return [t for t in re.split(r"[^a-z0-9_]+", text.lower()) if t]


@pytest.fixture(scope="module")
def docs_tbl():
    return pq.read_table(os.path.join(SF_DIR, "documents.parquet"))


@pytest.fixture(scope="module")
def index_dir():
    import __ray_entry__ as em
    return em._ensure_index(SF_DIR)


def test_extended_stats_bruteforce(docs_tbl):
    import ray.data
    from onestools_eventlog_ray.pipelines.relational import (
        extended_stats_by_group)
    out = extended_stats_by_group(
        ray.data.from_arrow(docs_tbl), key="lang", col="n_chars")
    rows = {r["lang"]: r for r in out.to_pylist()}
    langs = docs_tbl["lang"].to_pylist()
    nchars = docs_tbl["n_chars"].to_pylist()
    by_lang = {}
    for la, v in zip(langs, nchars):
        by_lang.setdefault(la, []).append(v)
    assert set(rows) == set(by_lang)
    for la, vals in by_lang.items():
        r = rows[la]
        n, s, s2 = len(vals), sum(vals), sum(v * v for v in vals)
        assert (r["n"], r["sum_v"], r["min_v"], r["max_v"], r["sum_sq"]) \
            == (n, s, min(vals), max(vals), s2)
        assert r["avg_e6"] == s * 10**6 // n
        assert r["var_e6"] == (n * s2 - s * s) * 10**6 // (n * n)
    # order: lang asc
    assert out["lang"].to_pylist() == sorted(by_lang)


def test_moving_avg_bruteforce():
    import ray.data
    from onestools_eventlog_ray.pipelines.streaming import (
        date_histogram_filled, date_histogram_moving_avg)
    ev = ray.data.read_parquet(os.path.join(SF_DIR, "events.parquet"),
                               columns=["ts"])
    base = date_histogram_filled(ev)
    out = date_histogram_moving_avg(ev, window=3)
    n = base["n_events"].to_pylist()
    ma = out["ma_e6"].to_pylist()
    assert out["n_events"].to_pylist() == n
    for i in range(len(n)):
        w = n[max(0, i - 2):i + 1]
        assert ma[i] == sum(w) * 10**6 // len(w), i


def test_moving_avg_partial_head_window():
    """First bucket's MA is its own value; second averages two."""
    import ray.data
    from onestools_eventlog_ray.pipelines.streaming import (
        date_histogram_moving_avg)
    US_DAY = 86_400 * 1_000_000
    ts = ([0] * 4) + [US_DAY] * 2 + [3 * US_DAY]  # day 2 empty (zero-fill)
    tbl = pa.table({"ts": pa.array(ts, pa.timestamp("us"))})
    out = date_histogram_moving_avg(ray.data.from_arrow(tbl), window=3)
    assert out["epoch_day"].to_pylist() == [0, 1, 2, 3]
    assert out["n_events"].to_pylist() == [4, 2, 0, 1]
    assert out["ma_e6"].to_pylist() == [
        4_000_000, 3_000_000, 2_000_000, 1_000_000]


def test_suggest_terms_bruteforce(index_dir, docs_tbl):
    from onestools_eventlog_ray.pipelines.query import suggest_terms
    out = suggest_terms(index_dir, "s", k=5)
    df = Counter()
    for text in docs_tbl["text"].to_pylist():
        for t in set(_tok(text)):
            if t.startswith("s"):
                df[t] += 1
    want = sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    got = list(zip(out["term"].to_pylist(), out["df"].to_pylist()))
    assert got == want
    assert out["rank"].to_pylist() == list(range(1, len(want) + 1))


def test_suggest_terms_no_match(index_dir):
    from onestools_eventlog_ray.pipelines.query import suggest_terms
    out = suggest_terms(index_dir, "zzz", k=5)
    assert out.num_rows == 0


def _bm25_scores(docs_tbl, terms):
    from onestools_eventlog_ray.functions.bm25 import BruteForceBM25
    bf = BruteForceBM25(docs_tbl["doc_id"].to_pylist(),
                        docs_tbl["text"].to_pylist())
    return dict(bf.search(terms, k=10**9))


def test_boosting_demotes_not_excludes(index_dir, docs_tbl):
    from onestools_eventlog_ray.pipelines.query import SearchEngine
    eng = SearchEngine(index_dir)
    base = _bm25_scores(docs_tbl, ["spark", "window"])
    neg_docs = {d for d, txt in zip(docs_tbl["doc_id"].to_pylist(),
                                    docs_tbl["text"].to_pylist())
                if "vector" in _tok(txt)}
    want = {d: s * 0.5 if d in neg_docs else s for d, s in base.items()}
    got = eng.search_boosting(["spark", "window"], ["vector"],
                              negative_boost=0.5, k=10**9)
    assert {d: s for d, s in got} == pytest.approx(want)
    # demoted docs are present (soft), unlike search_not (hard)
    hard = {d for d, _ in eng.search_not(["spark", "window"], ["vector"],
                                         k=10**9)}
    assert neg_docs & {d for d, _ in got}
    assert not (neg_docs & hard)


def test_function_score_field_factor(index_dir, docs_tbl):
    from onestools_eventlog_ray.pipelines.query import SearchEngine
    eng = SearchEngine(index_dir)
    base = _bm25_scores(docs_tbl, ["join", "merge"])
    nch = dict(zip(docs_tbl["doc_id"].to_pylist(),
                   docs_tbl["n_chars"].to_pylist()))
    want = {d: s * nch[d] for d, s in base.items()}
    got = dict(eng.search_function_score(["join", "merge"],
                                         field="n_chars", k=10**9))
    assert got == pytest.approx(want)


def test_training_mix_report_bruteforce(docs_tbl):
    import ray.data
    from onestools_eventlog_ray.pipelines.mix import training_mix_report
    from onestools_eventlog_ray.sources.corpus import DOCUMENTS_SPEC

    out = training_mix_report(ray.data.from_arrow(docs_tbl),
                              DOCUMENTS_SPEC, langs=("en", "de"),
                              min_chars=120, k=3, bench_mod=20)
    rows = {r["stage"]: (r["n_docs"], r["n_tokens"])
            for r in out.to_pylist()}
    assert out["stage_id"].to_pylist() == [0, 1, 2, 3, 4]

    ids = docs_tbl["doc_id"].to_pylist()
    texts = docs_tbl["text"].to_pylist()
    langs = docs_tbl["lang"].to_pylist()
    nch = docs_tbl["n_chars"].to_pylist()
    ntok = {d: len(_tok(t)) for d, t in zip(ids, texts)}

    assert rows["all"] == (len(ids), sum(ntok.values()))
    s1 = [d for d, la in zip(ids, langs) if la in ("en", "de")]
    assert rows["lang"] == (len(s1), sum(ntok[d] for d in s1))
    s2 = [d for d, la, n in zip(ids, langs, nch)
          if la in ("en", "de") and n >= 120]
    assert rows["length"] == (len(s2), sum(ntok[d] for d in s2))

    # exact dedup: min doc_id per identical text among survivors
    text_of = dict(zip(ids, texts))
    best = {}
    for d in s2:
        t = text_of[d]
        if t not in best or d < best[t]:
            best[t] = d
    s3 = sorted(best.values())
    assert rows["exact_dedup"] == (len(s3), sum(ntok[d] for d in s3))

    # decontamination: benchmark slice doc_id%20==0; flag any doc
    # sharing a 3-shingle with it
    def shingles(toks, k=3):
        if not toks:
            return set()
        if len(toks) < k:
            return {"\x1f".join(toks)}
        return {"\x1f".join(toks[i:i + k])
                for i in range(len(toks) - k + 1)}

    sh = {d: shingles(_tok(text_of[d])) for d in ids}
    bench = set().union(*(sh[d] for d in ids if d % 20 == 0)) \
        if any(d % 20 == 0 for d in ids) else set()
    s4 = [d for d in s3 if d % 20 != 0 and not (sh[d] & bench)]
    assert rows["decontaminated"] == (len(s4), sum(ntok[d] for d in s4))
