"""Deduplication pipelines — exact, MinHash+LSH, SimHash.

The reference's only dedup is key-based last-write-wins on dictionary
entries (SURVEY.md §2.8 D2, ``/root/reference/OneSTools.EventLog/LgfReader.cs:64-67``)
and id-based exactly-once on resume (D3).  A training-data engine needs
content-level dedup at corpus scale; all variants below follow the same
Ray-Data shape: vectorized per-batch signature computation ->
``groupby`` on the signature/bucket key (the only shuffle, over narrow
signature rows — never content) -> per-group resolution.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data
from ray.data.aggregate import Count, Min

from onestools_eventlog_ray.functions.analyzer import tokenize_array
from onestools_eventlog_ray.functions.hashing import md5_hex
from onestools_eventlog_ray.sources.corpus import CorpusSpec, DOCUMENTS_SPEC
from onestools_eventlog_ray.stages.normalize import add_doc_id

_MERSENNE = (1 << 61) - 1


def exact_dedup(ds: ray.data.Dataset,
                spec: CorpusSpec = DOCUMENTS_SPEC) -> ray.data.Dataset:
    """Exact content dedup: hash-partition by md5(content), keep the
    smallest doc_id per group.  -> (content_md5, rep_doc_id, n_dups).

    Only (md5, doc_id) rows enter the shuffle; content stays columnar in
    the scan stage."""

    def sig(batch: pa.Table) -> pa.Table:
        b = add_doc_id(batch, spec)
        return pa.table({"content_md5": md5_hex(b["content"]),
                         "doc_id": b["doc_id"]})

    return ds.map_batches(sig, batch_format="pyarrow") \
             .groupby("content_md5") \
             .aggregate(Min("doc_id", alias_name="rep_doc_id"),
                        Count(alias_name="n_dups"))


def _shingle_hashes(tokens: list[str], k: int) -> np.ndarray:
    """64-bit hashes of the doc's k-token shingles (unique)."""
    if len(tokens) < k:
        joined = ["\x1f".join(tokens)] if tokens else []
    else:
        joined = ["\x1f".join(tokens[i:i + k]) for i in range(len(tokens) - k + 1)]
    out = {int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(),
                          "big") & ((1 << 61) - 1)
           for s in joined}
    return np.fromiter(out, dtype=np.uint64, count=len(out))


def _minhash_params(num_perm: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


class MinHasher:
    """Actor-pool stage: permutation parameters built once per actor
    (ST1 pattern); per batch emits (band_id, band_hash, doc_id) rows —
    the LSH bucket keys for the candidate groupby."""

    def __init__(self, spec: CorpusSpec, shingle_k: int = 5,
                 num_perm: int = 64, bands: int = 16, seed: int = 42):
        assert num_perm % bands == 0
        self.spec = spec
        self.k = shingle_k
        self.num_perm = num_perm
        self.bands = bands
        self.rows = num_perm // bands
        self.a, self.b = _minhash_params(num_perm, seed)

    def signature(self, tokens: list[str]) -> np.ndarray:
        sh = _shingle_hashes(tokens, self.k)
        if sh.size == 0:
            return np.full(self.num_perm, _MERSENNE, dtype=np.uint64)
        # (num_perm, n_shingles) universal hashing, min over shingles
        vals = (np.multiply.outer(self.a, sh) + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        b = add_doc_id(batch, self.spec)
        toks = tokenize_array(b["content"]).to_pylist()
        ids = b["doc_id"].to_pylist()
        band_ids, band_hashes, doc_ids = [], [], []
        for doc_id, ts in zip(ids, toks):
            sig = self.signature(ts)
            for band in range(self.bands):
                seg = sig[band * self.rows:(band + 1) * self.rows]
                h = hashlib.blake2b(seg.tobytes(), digest_size=8).digest()
                band_ids.append(band)
                band_hashes.append(int.from_bytes(h, "big") >> 1)
                doc_ids.append(doc_id)
        return pa.table({
            "band_id": pa.array(band_ids, pa.int32()),
            "band_hash": pa.array(band_hashes, pa.int64()),
            "doc_id": pa.array(doc_ids, pa.int64()),
        })


def minhash_lsh_groups(ds: ray.data.Dataset,
                       spec: CorpusSpec = DOCUMENTS_SPEC,
                       shingle_k: int = 5, num_perm: int = 64,
                       bands: int = 16, concurrency=(1, 4)) -> ray.data.Dataset:
    """Near-dup candidate buckets: docs sharing any LSH band bucket.
    -> (band_id, band_hash, n_docs, min_doc_id) for buckets with >= 2 docs."""
    sigs = ds.map_batches(MinHasher, batch_format="pyarrow",
                          concurrency=concurrency,
                          fn_constructor_kwargs=dict(
                              spec=spec, shingle_k=shingle_k,
                              num_perm=num_perm, bands=bands))
    buckets = sigs.groupby(["band_id", "band_hash"]).aggregate(
        Count(alias_name="n_docs"), Min("doc_id", alias_name="min_doc_id"))

    def only_collisions(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.filter(pc.greater_equal(t["n_docs"], 2))

    return buckets.map_batches(only_collisions, batch_format="pyarrow")


def minhash_dedup_pairs(ds: ray.data.Dataset,
                        spec: CorpusSpec = DOCUMENTS_SPEC,
                        shingle_k: int = 5, num_perm: int = 64,
                        bands: int = 16, verify_jaccard: float | None = 0.7,
                        concurrency=(1, 4)) -> ray.data.Dataset:
    """Candidate near-dup PAIRS from LSH buckets, optionally verified by
    exact shingle-set Jaccard (second content pass restricted to
    candidate doc_ids broadcast as a filter set).
    -> (doc_a, doc_b[, jaccard]) with doc_a < doc_b, unique."""
    import ray

    def pairs_from_bucket(group: pa.Table) -> pa.Table:
        ids = sorted(set(group["doc_id"].to_pylist()))
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
        return pa.table({"doc_a": pa.array(a, pa.int64()),
                         "doc_b": pa.array(b, pa.int64())})

    sigs = ds.map_batches(MinHasher, batch_format="pyarrow",
                          concurrency=concurrency,
                          fn_constructor_kwargs=dict(
                              spec=spec, shingle_k=shingle_k,
                              num_perm=num_perm, bands=bands))
    pairs = sigs.groupby(["band_id", "band_hash"]) \
                .map_groups(pairs_from_bucket, batch_format="pyarrow") \
                .groupby(["doc_a", "doc_b"]).aggregate(Count(alias_name="n_bands"))
    if verify_jaccard is None:
        return pairs
    cand = pairs.take_all()
    if not cand:
        return ray.data.from_arrow(pa.table({
            "doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64())}))
    cand_ids = {int(r["doc_a"]) for r in cand} | {int(r["doc_b"]) for r in cand}
    ids_ref = ray.put(cand_ids)

    class ShingleFetch:
        def __init__(self):
            self.wanted = ray.get(ids_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            b = add_doc_id(batch, spec)
            keep = np.isin(b["doc_id"].to_numpy(zero_copy_only=False),
                           np.fromiter(self.wanted, dtype=np.int64))
            b = b.filter(pa.array(keep))
            toks = tokenize_array(b["content"]).to_pylist()
            return pa.table({
                "doc_id": b["doc_id"],
                "shingles": pa.array(
                    [ _shingle_hashes(t, shingle_k).tolist() for t in toks],
                    pa.list_(pa.uint64())),
            })

    sh_rows = ds.map_batches(ShingleFetch, batch_format="pyarrow",
                             concurrency=concurrency).take_all()
    sh = {int(r["doc_id"]): set(r["shingles"]) for r in sh_rows}
    out_a, out_b, out_j = [], [], []
    for r in cand:
        a, b = int(r["doc_a"]), int(r["doc_b"])
        sa, sb = sh.get(a, set()), sh.get(b, set())
        union = len(sa | sb)
        j = (len(sa & sb) / union) if union else 0.0
        if j >= verify_jaccard:
            out_a.append(a)
            out_b.append(b)
            out_j.append(j)
    return ray.data.from_arrow(pa.table({
        "doc_a": pa.array(out_a, pa.int64()),
        "doc_b": pa.array(out_b, pa.int64()),
        "jaccard": pa.array(out_j, pa.float64())}))


def ngram_jaccard_pairs(ds: ray.data.Dataset,
                        spec: CorpusSpec = DOCUMENTS_SPEC,
                        n: int = 3, max_doc_id: int | None = None,
                        top_k: int | None = None) -> pa.Table:
    """Exact token-n-gram Jaccard for all doc pairs (optionally bounded
    to doc_id < max_doc_id): the verification primitive behind
    MinHash-LSH.  Shingles are JOINED TOKEN STRINGS (``a|b|c``) so the
    result is string-exact against a SQL oracle.
    -> (doc_a, doc_b, jaccard) sorted by (jaccard desc, doc_a, doc_b).

    Shingle sets are computed distributed (map_batches); the pairwise
    O(n^2) comparison happens on the collected shingle sets — use the
    MinHash-LSH pipeline to restrict candidates first at scale."""
    import ray

    def shingles(batch: pa.Table) -> pa.Table:
        b = add_doc_id(batch, spec)
        if max_doc_id is not None:
            ids = b["doc_id"].to_numpy(zero_copy_only=False)
            b = b.filter(pa.array(ids < max_doc_id))
        toks = tokenize_array(b["content"]).to_pylist()
        out = []
        for ts in toks:
            out.append(sorted({"|".join(ts[i:i + n])
                               for i in range(len(ts) - n + 1)}))
        return pa.table({"doc_id": b["doc_id"],
                         "shingles": pa.array(out, pa.list_(pa.string()))})

    rows = ds.map_batches(shingles, batch_format="pyarrow").take_all()
    sets = {int(r["doc_id"]): set(r["shingles"]) for r in rows}
    ids = sorted(sets)
    da, db, jac = [], [], []
    for i, a in enumerate(ids):
        for b_ in ids[i + 1:]:
            u = len(sets[a] | sets[b_])
            j = (len(sets[a] & sets[b_]) / u) if u else 0.0
            da.append(a)
            db.append(b_)
            jac.append(j)
    order = sorted(range(len(jac)), key=lambda i: (-jac[i], da[i], db[i]))
    if top_k is not None:
        order = order[:top_k]
    return pa.table({
        "doc_a": pa.array([da[i] for i in order], pa.int64()),
        "doc_b": pa.array([db[i] for i in order], pa.int64()),
        "jaccard": pa.array([jac[i] for i in order], pa.float64()),
    })


class SimHasher:
    """64-bit SimHash per doc (token-unigram features, tf-weighted)."""

    def __init__(self, spec: CorpusSpec = DOCUMENTS_SPEC):
        self.spec = spec

    def __call__(self, batch: pa.Table) -> pa.Table:
        b = add_doc_id(batch, self.spec)
        toks = tokenize_array(b["content"]).to_pylist()
        out = np.empty(len(toks), dtype=np.int64)
        bits = np.arange(64, dtype=np.uint64)
        for i, ts in enumerate(toks):
            if not ts:
                out[i] = 0
                continue
            hs = np.fromiter(
                (int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8)
                                .digest(), "big") for t in ts),
                dtype=np.uint64, count=len(ts))
            bitmat = ((hs[:, None] >> bits) & np.uint64(1)).astype(np.int64)
            v = np.where(bitmat.sum(axis=0) * 2 >= len(ts), 1, 0).astype(np.uint64)
            # keep all 64 bits; reinterpret the uint64 as int64 for Arrow
            out[i] = int((v << bits).sum(dtype=np.uint64).astype(np.int64))
        return pa.table({"doc_id": b["doc_id"],
                         "simhash": pa.array(out, pa.int64())})


def simhash_signatures(ds: ray.data.Dataset,
                       spec: CorpusSpec = DOCUMENTS_SPEC,
                       concurrency=(1, 4)) -> ray.data.Dataset:
    return ds.map_batches(SimHasher, batch_format="pyarrow",
                          concurrency=concurrency,
                          fn_constructor_kwargs=dict(spec=spec))
