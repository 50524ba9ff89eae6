"""Similarity search over an embedding column (``list<float>``).

Brute-force cosine top-k is the exact baseline: the query matrix is
broadcast ONCE via ``ray.put`` (never re-shipped per batch — the J1
broadcast-lookup pattern, SURVEY.md §2.5), each batch computes a float64
matmul against it, emits only its local top-k, and the global answer is
the tiny ``sort().limit(k)`` over per-batch candidates (SURVEY.md §2.7
K5 shape: per-partition top-k then cheap final merge).

The scale path is LSH bucketing: random-hyperplane signatures bucket
vectors so a query probes only its bucket(s) — same groupby machinery
as the posting shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _as_matrix(col) -> np.ndarray:
    """list<float> column -> (n, d) float64 matrix (fixed dim)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)


class BruteForceCosine:
    """Actor-pool stage: normalized query matrix fetched once per actor."""

    def __init__(self, query_ref, k: int, id_col: str, vec_col: str):
        q = ray.get(query_ref)                      # (nq, d) float64
        norms = np.linalg.norm(q, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        self.qn = q / norms
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _as_matrix(batch[self.vec_col])
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (m / norms) @ self.qn.T              # (n, nq)
        out_q, out_id, out_cos = [], [], []
        k = min(self.k, ids.size)
        for qi in range(sims.shape[1]):
            s = sims[:, qi]
            # local top-k candidates (global merge happens downstream)
            idx = np.lexsort((ids, -s))[:k]
            out_q.extend([qi] * idx.size)
            out_id.extend(ids[idx].tolist())
            out_cos.extend(s[idx].tolist())
        return pa.table({
            "query_idx": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_id, pa.int64()),
            "cosine": pa.array(out_cos, pa.float64()),
        })


def knn_cosine(ds: ray.data.Dataset, queries: np.ndarray, k: int = 10,
               id_col: str = "vec_id", vec_col: str = "embedding",
               exclude_ids: set[int] | None = None,
               concurrency=(1, 4)) -> pa.Table:
    """Exact cosine top-k of each query row against the dataset.
    -> (query_idx, rank, vec_id, cosine), tie-break (cosine desc, vec_id asc)."""
    queries = np.atleast_2d(np.asarray(queries, dtype=np.float64))
    qref = ray.put(queries)
    cand = ds.map_batches(BruteForceCosine, batch_format="pyarrow",
                          concurrency=concurrency,
                          fn_constructor_kwargs=dict(
                              query_ref=qref, k=k, id_col=id_col,
                              vec_col=vec_col)).take_all()
    # tiny final merge: <= n_batches * k rows per query
    out = {"query_idx": [], "rank": [], "vec_id": [], "cosine": []}
    by_q: dict[int, list] = {}
    for r in cand:
        by_q.setdefault(int(r["query_idx"]), []).append(
            (int(r["vec_id"]), float(r["cosine"])))
    for qi in range(queries.shape[0]):
        rows = by_q.get(qi, [])
        if exclude_ids:
            rows = [r for r in rows if r[0] not in exclude_ids]
        ids = np.asarray([r[0] for r in rows], dtype=np.int64)
        cos = np.asarray([r[1] for r in rows], dtype=np.float64)
        order = np.lexsort((ids, -cos))[:k]
        for rank, i in enumerate(order, 1):
            out["query_idx"].append(qi)
            out["rank"].append(rank)
            out["vec_id"].append(int(ids[i]))
            out["cosine"].append(float(cos[i]))
    return pa.table({k_: pa.array(v, pa.int64() if k_ != "cosine" else pa.float64())
                     for k_, v in out.items()})


class _PairFinder:
    """Actor-pool stage: each batch's vectors x the full broadcast
    normalized matrix -> (vec_id_a < vec_id_b, cosine >= threshold) pairs.

    The broadcast-all-vectors approach is the exact small-side path; at
    10^12 scale the same stage runs per LSH bucket (``lsh_bucket`` +
    groupby) so each task only sees its bucket's candidates."""

    def __init__(self, mat_ref, ids_ref, threshold: float,
                 id_col: str, vec_col: str):
        m = ray.get(mat_ref)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        self.mn = m / norms
        self.all_ids = ray.get(ids_ref)
        self.threshold = threshold
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _as_matrix(batch[self.vec_col])
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (m / norms) @ self.mn.T                # (n_batch, n_all)
        rows, cols = np.nonzero(sims >= self.threshold)
        a = ids[rows]
        b = self.all_ids[cols]
        keep = a < b                                   # dedup + drop self-pairs
        return pa.table({
            "vec_id_a": pa.array(a[keep], pa.int64()),
            "vec_id_b": pa.array(b[keep], pa.int64()),
            "cosine": pa.array(sims[rows[keep], cols[keep]], pa.float64()),
        })


def cosine_pairs(ds: ray.data.Dataset, all_ids: np.ndarray,
                 all_vectors: np.ndarray, threshold: float = 0.45,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 concurrency=(1, 4)) -> ray.data.Dataset:
    """Embedding-cosine near-duplicate pairs above ``threshold``."""
    mat_ref = ray.put(np.asarray(all_vectors, dtype=np.float64))
    ids_ref = ray.put(np.asarray(all_ids, dtype=np.int64))
    return ds.map_batches(_PairFinder, batch_format="pyarrow",
                          concurrency=concurrency,
                          fn_constructor_kwargs=dict(
                              mat_ref=mat_ref, ids_ref=ids_ref,
                              threshold=threshold, id_col=id_col,
                              vec_col=vec_col))


class HyperplaneLSH:
    """Random-hyperplane signature stage: (vec_id, bucket) rows.

    Bucket = sign bits of W @ v (W broadcast once per actor).  Vectors in
    the same bucket are cosine-similar candidates; at scale a query reads
    only its bucket's partition instead of the full table (the IVF/LSH
    scale path for the ANN operator)."""

    def __init__(self, planes_ref, id_col: str, vec_col: str):
        self.w = ray.get(planes_ref)               # (nbits, d)
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _as_matrix(batch[self.vec_col])
        signs = (m @ self.w.T) > 0                  # (n, nbits)
        weights = (1 << np.arange(signs.shape[1], dtype=np.int64))
        bucket = (signs.astype(np.int64) * weights).sum(axis=1)
        return pa.table({
            self.id_col: batch[self.id_col],
            "bucket": pa.array(bucket, pa.int64()),
        })


def lsh_bucket(ds: ray.data.Dataset, dim: int, nbits: int = 12, seed: int = 42,
               id_col: str = "vec_id", vec_col: str = "embedding",
               concurrency=(1, 4)) -> ray.data.Dataset:
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((nbits, dim))
    pref = ray.put(planes)
    return ds.map_batches(HyperplaneLSH, batch_format="pyarrow",
                          concurrency=concurrency,
                          fn_constructor_kwargs=dict(
                              planes_ref=pref, id_col=id_col, vec_col=vec_col))
