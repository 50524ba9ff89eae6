"""Round-5: distributed BPE tokenizer training (learn_bpe over the
word-type table) + apply_bpe encoding — each checked against a naive
full-recount reference implementation on a planted corpus."""
import re
from collections import Counter

import pyarrow as pa
import pytest

from onestools_eventlog_ray.sources.corpus import DOCUMENTS_SPEC

TEXTS = [
    "low lower lowest low low newer newest new",
    "wider wide widest new newer lower",
    "low low low lowest newer wider wide wide",
    "the lower the newer the wider",
    "",
]


def _docs_table():
    return pa.table({
        "doc_id": pa.array(range(1, len(TEXTS) + 1), pa.int64()),
        "text": pa.array(TEXTS, pa.string()),
        "lang": pa.array(["en"] * len(TEXTS), pa.string()),
        "source": pa.array(["t"] * len(TEXTS), pa.string()),
        "n_chars": pa.array([len(t) for t in TEXTS], pa.int64()),
    })


def _naive_tokens(s):
    return [t for t in re.split(r"[^a-z0-9_]+", s.lower()) if t]


def _naive_learn(texts, n_merges, end="</w>"):
    """Full-recount BPE reference (Sennrich alg. verbatim, no incremental
    pair-count bookkeeping, no word-type dictionary optimization)."""
    vocab = Counter()
    for t in texts:
        vocab.update(_naive_tokens(t))
    segs = {w: tuple(list(w) + [end]) for w in vocab}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, f in vocab.items():
            s = segs[w]
            for a, b in zip(s, s[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        (la, rb), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((la, rb, cnt))
        for w in vocab:
            s = list(segs[w])
            out = []
            j = 0
            while j < len(s):
                if j + 1 < len(s) and s[j] == la and s[j + 1] == rb:
                    out.append(la + rb)
                    j += 2
                else:
                    out.append(s[j])
                    j += 1
            segs[w] = tuple(out)
    return merges, segs


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data
    return ray.data.from_arrow(_docs_table())


def test_learn_bpe_matches_naive(docs_ds):
    from onestools_eventlog_ray.pipelines.text import learn_bpe
    got = learn_bpe(docs_ds, DOCUMENTS_SPEC, n_merges=12)
    want, _ = _naive_learn(TEXTS, 12)
    assert len(got) == len(want)
    for i, (la, rb, cnt) in enumerate(want):
        assert got["left"][i].as_py() == la
        assert got["right"][i].as_py() == rb
        assert got["merged"][i].as_py() == la + rb
        assert got["n"][i].as_py() == cnt
        assert got["rank"][i].as_py() == i


def test_learn_bpe_deterministic(docs_ds):
    from onestools_eventlog_ray.pipelines.text import learn_bpe
    a = learn_bpe(docs_ds, DOCUMENTS_SPEC, n_merges=8)
    b = learn_bpe(docs_ds, DOCUMENTS_SPEC, n_merges=8)
    assert a.equals(b)


def test_learn_bpe_max_types_cutoff(docs_ds):
    """max_types keeps the most frequent word types: with the cutoff at 3
    the merges come from {low, new(er)...} top types only — recompute the
    naive reference over the same truncated dict."""
    from onestools_eventlog_ray.pipelines.text import (_bpe_merge_loop,
                                                       learn_bpe,
                                                       word_type_counts)
    wt = word_type_counts(docs_ds, DOCUMENTS_SPEC, max_types=3)
    vocab = Counter()
    for t in TEXTS:
        vocab.update(_naive_tokens(t))
    top3 = sorted(vocab.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert list(zip(wt["term"].to_pylist(), wt["n"].to_pylist())) == top3
    got = learn_bpe(docs_ds, DOCUMENTS_SPEC, n_merges=5, max_types=3)
    want = _bpe_merge_loop(top3, 5)
    assert [tuple(r) for r in zip(got["left"].to_pylist(),
                                  got["right"].to_pylist(),
                                  got["n"].to_pylist())] == want


def test_apply_bpe_matches_naive(docs_ds):
    from onestools_eventlog_ray.pipelines.text import apply_bpe, learn_bpe
    merges = learn_bpe(docs_ds, DOCUMENTS_SPEC, n_merges=10)
    out = apply_bpe(docs_ds, merges, DOCUMENTS_SPEC).to_pandas() \
        .set_index("doc_id").sort_index()
    _, segs = _naive_learn(TEXTS, 10)
    for i, t in enumerate(TEXTS, start=1):
        toks = _naive_tokens(t)
        n_sub = sum(len(segs[w]) for w in toks)
        n_chr = sum(len(w) for w in toks)
        assert out.loc[i, "n_tokens"] == len(toks)
        assert out.loc[i, "n_subwords"] == n_sub
        want_ratio = (n_chr * 1_000_000) // n_sub if n_sub else 0
        assert out.loc[i, "chars_per_subword_e6"] == want_ratio


def test_apply_bpe_encode_order():
    """BPE inference applies the LOWEST-RANK merge first, not leftmost:
    with merges [(e,r),(l,o),(lo,w)] the word 'lower' becomes
    l o w e r</w> -> (er last char pair is (r,</w>)) ... check against a
    hand-computed segmentation."""
    from onestools_eventlog_ray.pipelines.text import _bpe_encode_type
    ranks = {("e", "r"): 0, ("l", "o"): 1, ("lo", "w"): 2,
             ("r", "</w>"): 3, ("er", "</w>"): 4}
    assert _bpe_encode_type("lower", ranks) == ["low", "er</w>"]
    assert _bpe_encode_type("lo", ranks) == ["lo", "</w>"]
    assert _bpe_encode_type("", ranks) == ["</w>"]
