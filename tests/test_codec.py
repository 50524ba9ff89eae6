"""Posting codec round-trip + concat-merge properties (SURVEY.md §5.1)."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from onestools_eventlog_ray.functions import codec


def test_varint_roundtrip_edges():
    v = np.array([0, 1, 127, 128, 16383, 16384, 2**32, 2**62], dtype=np.uint64)
    assert (codec.varint_decode(codec.varint_encode(v)) == v).all()


@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=300))
@settings(max_examples=50, deadline=None)
def test_varint_roundtrip_property(vals):
    v = np.asarray(vals, dtype=np.uint64)
    out = codec.varint_decode(codec.varint_encode(v))
    assert out.size == v.size and (out == v).all()


@given(st.sets(st.integers(min_value=0, max_value=2**62), min_size=1, max_size=500),
       st.integers(min_value=1, max_value=200))
@settings(max_examples=30, deadline=None)
def test_posting_roundtrip_property(ids_set, block_size):
    ids = np.sort(np.fromiter(ids_set, dtype=np.int64))
    rng = np.random.default_rng(0)
    tfs = rng.integers(1, 100, size=ids.size)
    dls = rng.integers(1, 3000, size=ids.size)
    blob = codec.encode_posting(ids, tfs, dls, block_size=block_size)
    p = codec.decode_posting(blob)
    assert (p.doc_ids == ids).all() and (p.tfs == tfs).all() and (p.dls == dls).all()


def test_unsorted_rejected():
    with pytest.raises(ValueError):
        codec.encode_posting(np.array([3, 1]), np.array([1, 1]), np.array([5, 5]))


def test_decode_block_matches_full():
    rng = np.random.default_rng(1)
    ids = np.unique(rng.integers(0, 2**40, size=1000))
    tfs = rng.integers(1, 9, size=ids.size)
    dls = rng.integers(10, 500, size=ids.size)
    blob = codec.encode_posting(ids, tfs, dls, block_size=64)
    full = codec.decode_posting(blob)
    headers, n, _ = codec.read_header(blob)
    off = 0
    for bi in range(headers.size):
        p = codec.decode_block(blob, bi)
        c = p.doc_ids.size
        assert (p.doc_ids == full.doc_ids[off:off + c]).all()
        assert (p.tfs == full.tfs[off:off + c]).all()
        off += c
    assert off == n


def test_concat_equals_single_encode():
    """Salted-run merge invariant: encode(parts) spliced == encode(whole)."""
    rng = np.random.default_rng(2)
    ids = np.unique(rng.integers(0, 2**50, size=2000))
    tfs = rng.integers(1, 20, size=ids.size)
    dls = rng.integers(5, 800, size=ids.size)
    whole = codec.encode_posting(ids, tfs, dls, block_size=128)
    cuts = [0, 300, 301, 1500, ids.size]
    parts = [codec.encode_posting(ids[a:b], tfs[a:b], dls[a:b], block_size=128)
             for a, b in zip(cuts[:-1], cuts[1:])]
    spliced = codec.concat_postings(parts)
    w, s = codec.decode_posting(whole), codec.decode_posting(spliced)
    assert (w.doc_ids == s.doc_ids).all() and (w.tfs == s.tfs).all() \
        and (w.dls == s.dls).all()


def test_concat_rejects_overlap():
    a = codec.encode_posting(np.array([1, 5]), np.array([1, 1]),
                             np.array([3, 3]))
    b = codec.encode_posting(np.array([2, 9]), np.array([1, 1]),
                             np.array([3, 3]))
    with pytest.raises(ValueError):
        codec.concat_postings([a, b])


def test_block_max_is_upper_bound():
    rng = np.random.default_rng(3)
    ids = np.unique(rng.integers(0, 2**30, size=500))
    tfs = rng.integers(1, 50, size=ids.size)
    dls = rng.integers(1, 2000, size=ids.size)
    avgdl, k1, b = 220.0, 1.2, 0.75
    blob = codec.encode_posting(ids, tfs, dls, block_size=32)
    idf = 2.5
    bounds = codec.block_max_scores(blob, idf, avgdl, k1, b)
    headers, _, _ = codec.read_header(blob)
    off = 0
    for bi in range(headers.size):
        p = codec.decode_block(blob, bi)
        w = idf * codec.bm25_impact(p.tfs, p.dls, avgdl, k1, b)
        assert (w <= bounds[bi] + 0.0).all()
        off += p.doc_ids.size
