"""Exact prefix-filtered set-similarity join (`dedup.jaccard_join_pairs`).

Contract under test: 100% recall at the e6-rounded threshold — every
doc pair whose distinct-5-shingle Jaccard rounds to >= t*1e6 is
returned with the exact jaccard_e6, none below, independent of the
global shingle order (hot-last vs plain hash) used for prefix cutting.
"""

import os

import numpy as np
import pyarrow as pa
import pytest

SF_DIR = "/root/testdata/sf0.001"
SEP = "\x1f"


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data
    return ray.data.read_parquet(os.path.join(SF_DIR, "documents.parquet"))


def _brute_pairs(tbl, k: int, min_jaccard: float) -> list:
    """Reference all-pairs jaccard over string shingle sets (the oracle
    semantics: <k tokens -> one whole-doc shingle, empty -> no pairs)."""
    from onestools_eventlog_ray.functions.analyzer import tokenize_py
    e6 = int(np.floor(min_jaccard * 1_000_000 + 0.5))
    sets = {}
    for doc_id, txt in zip(tbl["doc_id"].to_pylist(),
                           tbl["text"].to_pylist()):
        toks = tokenize_py(txt)
        if not toks:
            continue
        if len(toks) < k:
            sets[doc_id] = {SEP.join(toks)}
        else:
            sets[doc_id] = {SEP.join(toks[i:i + k])
                            for i in range(len(toks) - k + 1)}
    ids = sorted(sets)
    out = []
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if union == 0:
                continue
            j6 = int(np.floor(inter / union * 1_000_000 + 0.5))
            if j6 >= e6:
                out.append((a, b, j6))
    return sorted(out)


def _run_join(ds, **kw) -> list:
    from onestools_eventlog_ray.pipelines.dedup import jaccard_join_pairs
    rows = jaccard_join_pairs(ds, **kw).take_all()
    return sorted((r["doc_a"], r["doc_b"], r["jaccard_e6"]) for r in rows)


def test_join_matches_bruteforce(docs_ds):
    import pyarrow.parquet as pq
    tbl = pq.read_table(os.path.join(SF_DIR, "documents.parquet"))
    want = _brute_pairs(tbl, k=5, min_jaccard=0.5)
    got = _run_join(docs_ds, shingle_k=5, min_jaccard=0.5)
    assert len(want) > 0          # planted near-dups exist in testdata
    assert got == want


def test_join_order_invariant(docs_ds):
    base = _run_join(docs_ds, shingle_k=5, min_jaccard=0.5)
    hot = _run_join(docs_ds, shingle_k=5, min_jaccard=0.5,
                    hot_shingles=64)
    sampled = _run_join(docs_ds, shingle_k=5, min_jaccard=0.5,
                        hot_shingles=16, hot_sample_mod=3)
    assert base == hot == sampled


def test_join_superset_of_lsh_verified(docs_ds):
    """The exact join at threshold t contains every LSH-verified pair at
    the same (k, t) with the identical jaccard_e6 — LSH may miss pairs
    (banding is probabilistic), the join may not."""
    from onestools_eventlog_ray.pipelines.dedup import minhash_verified_pairs
    lsh = {(r["doc_a"], r["doc_b"]): r["jaccard_e6"]
           for r in minhash_verified_pairs(
               docs_ds, shingle_k=5, min_jaccard=0.5).take_all()}
    join = {(a, b): j for a, b, j
            in _run_join(docs_ds, shingle_k=5, min_jaccard=0.5)}
    assert lsh            # sanity: LSH found something
    for pair, j6 in lsh.items():
        assert join.get(pair) == j6
    assert set(lsh) <= set(join)


def test_join_edge_docs(ray_session):
    """Empty docs never pair; <k-token docs join on the whole-doc
    shingle; exact duplicates score 1000000."""
    import ray.data
    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array(["", "tiny doc", "tiny doc",
                          "alpha beta gamma delta epsilon zeta",
                          "alpha beta gamma delta epsilon zeta"]),
    })
    got = _run_join(ray.data.from_arrow(tbl), shingle_k=5, min_jaccard=0.5)
    assert got == [(2, 3, 1_000_000), (4, 5, 1_000_000)]


def test_join_no_pairs_below_threshold(ray_session):
    import ray.data
    tbl = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["one two three four five six",
                          "seven eight nine ten eleven twelve"]),
    })
    assert _run_join(ray.data.from_arrow(tbl),
                     shingle_k=5, min_jaccard=0.5) == []
