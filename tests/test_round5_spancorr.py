"""Round-5: deterministic T5-style span corruption — engine output
must equal a per-doc brute-force reference (sentinel numbering, byte
witnesses) across batch layouts, including empty and ragged docs."""

import hashlib

import numpy as np
import pyarrow as pa


def _brute(doc_id: int, textv: str, span_len=3, pct=15):
    from onestools_eventlog_ray.functions.fasthash import md5_lower64_one
    words = textv.split()

    def corr(g):
        return md5_lower64_one(f"{doc_id}:g:{g}") % 100 < pct

    inputs, targets, k, nm, ns = [], [], 0, 0, 0
    for i, w in enumerate(words):
        g = i // span_len
        if corr(g):
            nm += 1
            if i % span_len == 0:
                inputs.append(f"<extra_id_{k}>")
                targets.append(f"<extra_id_{k}>")
                k += 1
                ns += 1
            targets.append(w)
        else:
            inputs.append(w)
    targets.append(f"<extra_id_{k}>")
    return (len(words), ns, nm,
            hashlib.md5(" ".join(inputs).encode()).hexdigest(),
            hashlib.md5(" ".join(targets).encode()).hexdigest())


def test_span_corruption_matches_bruteforce(ray_session):
    import ray.data
    from onestools_eventlog_ray.pipelines import text as T
    from onestools_eventlog_ray.sources.corpus import DOCUMENTS_SPEC
    from onestools_eventlog_ray.stages.normalize import add_doc_id

    rng = np.random.RandomState(11)
    texts = [" ".join(f"w{rng.randint(60)}"
                      for _ in range(rng.randint(0, 30)))
             for _ in range(150)]
    texts += ["", "   ", "one", "a  b   c d"]      # ragged edges
    docs = pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * len(texts)),
        "source": pa.array(["t"] * len(texts)),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    out = T.span_corruption(
        ray.data.from_arrow(docs).repartition(6)).to_pandas()
    b = add_doc_id(docs, DOCUMENTS_SPEC)
    want = {did: _brute(did, tv)
            for did, tv in zip(b["doc_id"].to_pylist(), texts)}
    assert len(out) == len(texts)
    n_spans_total = 0
    for _, r in out.iterrows():
        w = want[r["doc_id"]]
        got = (r["n_tokens"], r["n_spans"], r["n_masked"],
               r["inputs_md5"], r["targets_md5"])
        assert tuple(got) == w, r["doc_id"]
        n_spans_total += w[1]
    assert n_spans_total > 0          # the corruption path really fired


def test_span_corruption_empty_doc_witnesses(ray_session):
    import ray.data
    from onestools_eventlog_ray.pipelines import text as T
    docs = pa.table({
        "doc_id": pa.array([9], pa.int64()),
        "text": pa.array([""]),
        "lang": pa.array(["en"]),
        "source": pa.array(["t"]),
        "n_chars": pa.array([0], pa.int64()),
    })
    out = T.span_corruption(ray.data.from_arrow(docs)).to_pandas()
    assert out["n_tokens"].tolist() == [0]
    assert out["inputs_md5"][0] == hashlib.md5(b"").hexdigest()
    assert out["targets_md5"][0] == \
        hashlib.md5(b"<extra_id_0>").hexdigest()
