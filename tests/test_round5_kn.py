"""Round-5: interpolated Kneser-Ney bigram probabilities vs a
brute-force reference on a planted corpus."""
import re
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

from onestools_eventlog_ray.sources.corpus import DOCUMENTS_SPEC

TEXTS = [
    "the cat sat on the mat",
    "the cat ran and the dog sat",
    "a dog sat on a mat",
    "the cat the cat the cat",
]


def _toks(s):
    return [t for t in re.split(r"[^a-z0-9_]+", s.lower()) if t]


def _ref_kn(texts, k, d=0.75):
    cnt = Counter()
    for t in texts:
        ws = _toks(t)
        cnt.update(zip(ws, ws[1:]))
    c1 = Counter()
    n1pl = Counter()
    n1pr = Counter()
    for (w1, w2), n in cnt.items():
        c1[w1] += n
        n1pl[w1] += 1
        n1pr[w2] += 1
    tot = len(cnt)
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    out = []
    for (w1, w2), n in top:
        pkn = max(n - d, 0.0) / c1[w1] + (d * n1pl[w1] / c1[w1]) \
            * (n1pr[w2] / tot)
        out.append((w1, w2, n, int(np.floor(pkn * 1e9 + 0.5))))
    return out


def test_kn_bigram_probs_matches_bruteforce(ray_session):
    import ray.data

    from onestools_eventlog_ray.pipelines.text import kn_bigram_probs
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(1, len(TEXTS) + 1), pa.int64()),
        "text": pa.array(TEXTS, pa.string()),
        "lang": pa.array(["en"] * len(TEXTS), pa.string()),
        "source": pa.array(["t"] * len(TEXTS), pa.string()),
        "n_chars": pa.array([len(t) for t in TEXTS], pa.int64()),
    }))
    got = kn_bigram_probs(ds, DOCUMENTS_SPEC, k=8)
    want = _ref_kn(TEXTS, 8)
    assert len(got) == len(want)
    for i, (w1, w2, n, e9) in enumerate(want):
        assert got["w1"][i].as_py() == w1
        assert got["w2"][i].as_py() == w2
        assert got["n"][i].as_py() == n
        assert got["pkn_e9"][i].as_py() == e9


def test_kn_probs_sum_below_one(ray_session):
    """For a fixed left context the discounted + continuation mass must
    stay a valid (sub-)distribution: P_KN(w2|w1) in (0, 1]."""
    import ray.data

    from onestools_eventlog_ray.pipelines.text import kn_bigram_probs
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(1, len(TEXTS) + 1), pa.int64()),
        "text": pa.array(TEXTS, pa.string()),
        "lang": pa.array(["en"] * len(TEXTS), pa.string()),
        "source": pa.array(["t"] * len(TEXTS), pa.string()),
        "n_chars": pa.array([len(t) for t in TEXTS], pa.int64()),
    }))
    got = kn_bigram_probs(ds, DOCUMENTS_SPEC, k=50)
    e9 = got["pkn_e9"].to_numpy(zero_copy_only=False)
    assert (e9 > 0).all() and (e9 <= 1_000_000_000).all()
