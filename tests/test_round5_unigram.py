"""Round-5: Unigram-LM (SentencePiece) tokenizer — forward-backward
E-step checked against EXHAUSTIVE segmentation enumeration, Viterbi
against exhaustive argmax, bit-reproducibility under repartitioning,
and end-to-end fertility on the synthetic corpus."""

import itertools
import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from onestools_eventlog_ray.pipelines.unigram import (
    E9, forward_backward_counts, learn_unigram, seed_vocab,
    viterbi_segment, apply_unigram)


def _all_segmentations(word, pieces, max_len):
    """Every segmentation of word into known pieces (exhaustive)."""
    if not word:
        yield []
        return
    for l in range(1, min(len(word), max_len) + 1):
        if word[:l] in pieces:
            for rest in _all_segmentations(word[l:], pieces, max_len):
                yield [word[:l]] + rest


def test_forward_backward_equals_exhaustive():
    probs = {"a": 0.3, "b": 0.2, "ab": 0.25, "ba": 0.15, "aba": 0.1}
    word, freq = "abab", 7
    segs = list(_all_segmentations(word, probs, 3))
    assert segs                                   # lattice non-trivial
    z = sum(math.prod(probs[p] for p in s) for s in segs)
    # per-SPAN expectations (the module quantizes each span occurrence
    # to e9 before summing — sum-of-floors, not floor-of-sum)
    span_e = {}
    for s in segs:
        w = math.prod(probs[p] for p in s) / z
        pos = 0
        for p in s:
            span_e[(pos, pos + len(p))] = \
                span_e.get((pos, pos + len(p)), 0.0) + freq * w
            pos += len(p)
    want = {}
    for (i, j), e in span_e.items():
        p = word[i:j]
        want[p] = want.get(p, 0) + int(math.floor(e * E9 + 0.5))
    got = forward_backward_counts(word, freq, probs, 3)
    assert got == want


def test_forward_backward_unreachable_word():
    assert forward_backward_counts("xyz", 5, {"a": 1.0}, 3) == {}


def test_viterbi_equals_exhaustive_argmax():
    logp = {"a": math.log(0.3), "b": math.log(0.2),
            "ab": math.log(0.25), "ba": math.log(0.15),
            "aba": math.log(0.1), "bab": math.log(0.05)}
    for word in ("abab", "aab", "babab", "a", "bb"):
        segs = list(_all_segmentations(word, logp, 3))
        if not segs:
            continue
        best = max(segs, key=lambda s: sum(logp[p] for p in s))
        got = viterbi_segment(word, logp, 3)
        assert math.isclose(sum(logp[p] for p in got),
                            sum(logp[p] for p in best))


def test_viterbi_unknown_char_fallback():
    logp = {"a": math.log(0.5)}
    assert viterbi_segment("axa", logp, 3) == ["a", "x", "a"]


def test_seed_vocab_weighted_and_capped(ray_session):
    types = pa.table({"term": ["abc", "ab"], "n": [10, 1]})
    singles, multi = seed_vocab(types, max_piece_len=3, seed_max=2)
    assert singles == ["a", "b", "c"]
    # "ab" weight 11 > "abc" 10 > "bc" 10 (tie w/ abc -> abc first asc)
    assert multi == ["ab", "abc"]


@pytest.fixture(scope="module")
def learned(ray_session):
    import ray.data
    docs = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet")
    return docs, learn_unigram(docs, vocab_size=96, iters=2)


def test_learn_recovers_real_words(learned):
    _, pieces = learned
    multi = pieces.filter(
        pc.equal(pieces["is_single"], False))["piece"].to_pylist()
    # the synthetic corpus's actual vocabulary must dominate the vocab
    assert {"scan", "column", "window", "vector"} <= set(multi)


def test_learn_bit_reproducible_under_partitioning(learned, ray_session):
    import ray.data
    docs, pieces = learned
    again = learn_unigram(docs.repartition(7), vocab_size=96, iters=2)
    assert pieces.equals(again)     # integer-quantized E-step => exact


def test_apply_fertility_sane(learned):
    docs, pieces = learned
    t = apply_unigram(docs, pieces).to_pydict()
    assert t["n_unk_chars"] == [0]
    # whole-word pieces dominate -> fertility close to 1, always >= 1
    assert 1_000_000 <= t["fertility_e6"][0] < 1_500_000
    assert t["n_pieces"][0] >= t["n_word_tokens"][0] > 0
