"""Doc-sharded scatter-gather serving — an index larger than one node.

The bench's replicated-searcher pool (one full-index engine per actor)
is the right shape while the index fits a node; at 100 TB it does not.
The ES deployment the reference delegates to
(``/root/reference/OneSTools.EventLog.Exporter.Core/ElasticSearch/
ElasticSearchStorage.cs``) solves this with DOC-sharded data nodes and
a two-phase query (``dfs_query_then_fetch``): gather per-shard term
statistics, compute GLOBAL idf, score every shard locally under the
global stats, merge per-shard top-k.  Shards hold disjoint documents,
so a document's full score is computed entirely on its own shard and
the union of per-shard top-k provably contains the global top-k — the
merge is EXACT, not approximate.

This module provides that deployment shape on Ray:

* :func:`route_corpus_shards` — ONE streaming hash-route pass corpus ->
  ``n_shards`` sub-corpus dirs (deterministic ``doc_id % n``; immutable
  content-named part files committed tmp->rename, a ``_MANIFEST.json``
  success marker gates re-routes — the ``export_training_shards``
  contract without the tokenize).
* :func:`build_sharded_index` — one independent index build per
  sub-corpus under ``root/gen-%04d``: deliberately the generational
  layout, so the single-process :class:`~.incremental.GenerationalEngine`
  over the SAME deployment is the in-process oracle for the tier.
* :class:`ShardedSearchTier` — one ``@ray.remote`` worker per shard
  (its own :class:`~.query.SearchEngine`), two-phase exact BM25.
  Float exactness: scoring is terms-major within the owning shard, the
  same accumulation order as ``SearchEngine.search`` /
  ``GenerationalEngine.search``, so per-doc float64 scores are
  bit-identical to a single-index build over the union of the docs.

Scale shape: phase 1 ships O(len(terms)) ints per shard; phase 2 ships
O(k) (id, score) pairs per shard; the driver merges O(shards * k) rows.
Nothing corpus-sized moves at query time, and each worker's resident
set is one shard — the deployment grows by adding shards, not by
growing a node.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from onestools_eventlog_ray.config import EngineConfig
from onestools_eventlog_ray.functions import codec
from onestools_eventlog_ray.functions.bm25 import idf as idf_fn, pick_topk
from onestools_eventlog_ray.sources.corpus import (CODE_CORPUS_SPEC,
                                                   CorpusSpec,
                                                   read_parquet_clean)
from onestools_eventlog_ray.stages.normalize import add_doc_id


def route_corpus_shards(corpus_paths, out_dir: str, n_shards: int,
                        spec: CorpusSpec = CODE_CORPUS_SPEC) -> dict:
    """Hash-route a corpus into ``n_shards`` sub-corpus directories
    (``out_dir/shard-%05d/``) in ONE streaming pass.

    Routing key is the deterministic content-keyed ``doc_id % n_shards``
    — stable across runs, retries and parallelism, so a re-route lands
    every document on the same shard.  Each routed slice of each input
    batch becomes its own immutable part file named by the md5 of its
    sorted doc_ids (idempotent under Ray task retries).  A completed
    route writes ``_MANIFEST.json`` and later calls return it verbatim
    (batch boundaries are not stable across runs, so re-routing a
    finished output could duplicate rows in differently-split parts).
    -> {"n_shards": n, "n_docs": total, "per_shard": [counts]}."""
    import hashlib

    marker = os.path.join(out_dir, "_MANIFEST.json")
    if os.path.exists(marker):
        with open(marker) as fh:
            return json.load(fh)
    for i in range(n_shards):
        os.makedirs(os.path.join(out_dir, f"shard-{i:05d}"), exist_ok=True)

    def route(batch: pa.Table) -> pa.Table:
        ids = add_doc_id(batch, spec)["doc_id"].to_numpy(
            zero_copy_only=False)
        shard = (ids % n_shards).astype(np.int64)
        counts = np.zeros(n_shards, dtype=np.int64)
        for s in np.unique(shard):
            sub = batch.filter(pa.array(shard == s))
            sub_ids = np.sort(ids[shard == s])
            name = hashlib.md5(
                f"{sub.num_rows}:".encode()
                + ",".join(map(str, sub_ids)).encode()).hexdigest()
            dst = os.path.join(out_dir, f"shard-{int(s):05d}",
                               f"part-{name[:16]}.parquet")
            if not os.path.exists(dst):
                tmp = dst + ".tmp"
                pq.write_table(sub, tmp)
                os.replace(tmp, dst)
            counts[int(s)] = sub.num_rows
        return pa.table({"shard": pa.array(np.arange(n_shards)),
                         "n": pa.array(counts)})

    ds = corpus_paths if isinstance(corpus_paths, ray.data.Dataset) \
        else read_parquet_clean(corpus_paths)
    partials = ds.map_batches(route, batch_format="pyarrow").to_pandas()
    per_shard = partials.groupby("shard")["n"].sum()
    rec = {"n_shards": n_shards,
           "n_docs": int(per_shard.sum()),
           "per_shard": [int(per_shard.get(i, 0)) for i in range(n_shards)]}
    tmp = marker + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(rec, fh)
    os.replace(tmp, marker)
    return rec


def build_sharded_index(corpus_paths, index_root: str, n_shards: int,
                        spec: CorpusSpec = CODE_CORPUS_SPEC,
                        cfg: EngineConfig = EngineConfig()) -> dict:
    """Build a doc-sharded deployment: route the corpus, then run one
    independent index build per sub-corpus under ``index_root/gen-%04d``
    (the generational layout, so ``GenerationalEngine(index_root)`` is
    the in-process oracle for :class:`ShardedSearchTier` and the whole
    add/delete/compact lifecycle applies per shard unchanged).  Each
    build is itself resumable; re-running skips finished shards.
    -> {"n_shards", "n_docs", "shard_dirs"}."""
    from onestools_eventlog_ray.pipelines.build import build_index

    shards_dir = os.path.join(index_root, "_shard_corpus")
    rec = route_corpus_shards(corpus_paths, shards_dir, n_shards, spec)
    shard_dirs = []
    for i in range(n_shards):
        gen_dir = os.path.join(index_root, f"gen-{i:04d}")
        build_index(os.path.join(shards_dir, f"shard-{i:05d}"),
                    gen_dir, spec=spec, cfg=cfg)
        shard_dirs.append(gen_dir)
    return {"n_shards": n_shards, "n_docs": rec["n_docs"],
            "shard_dirs": shard_dirs}


@ray.remote(num_cpus=1)
class ShardWorker:
    """One data node: a :class:`SearchEngine` over one doc-shard.

    ``extra_deleted``: deployment-level tombstones (the index root's),
    unioned with the shard's own — the same rule GenerationalEngine
    applies in-process."""

    def __init__(self, gen_dir: str, extra_deleted=None):
        from onestools_eventlog_ray.pipelines.query import SearchEngine
        self.eng = SearchEngine(gen_dir)
        if extra_deleted is not None and len(extra_deleted):
            self.eng.deleted = np.unique(np.concatenate(
                [self.eng.deleted, np.asarray(extra_deleted, np.int64)]))

    def stats(self) -> tuple[int, float]:
        return int(self.eng.N), float(self.eng.avgdl * self.eng.N)

    def local_df(self, terms: list) -> dict:
        """Phase 1 (the DFS of dfs_query_then_fetch): per-term local df."""
        return {t: int(df)
                for t, (df, _) in self.eng.load_terms(terms).items()}

    def score_topk(self, terms: list, idf_map: dict, avgdl: float,
                   k: int, tie: str,
                   method: str = "taat") -> tuple[np.ndarray, np.ndarray]:
        """Phase 2: score this shard's postings under the injected
        GLOBAL (idf, avgdl); local top-k cut under the same total order
        the merge uses, so the union of shard top-k contains the global
        top-k.  ``method="wand"`` swaps the exhaustive TAAT for
        block-max WAND (same cursors the monolithic engine uses, fed
        the global stats) — identical results, block-skipping cost."""
        eng = self.eng
        uniq = sorted(set(terms))
        loaded = eng.load_terms(uniq)
        if method == "wand":
            from onestools_eventlog_ray.pipelines.query import (
                _PostingCursor, wand_topk)
            iters = [_PostingCursor(blob, idf_map[t], avgdl, eng.k1, eng.b)
                     for t, (_df, blob) in loaded.items() if t in idf_map]
            hits = wand_topk(iters, k, tie=tie,
                             deleted=eng.deleted if eng.deleted.size
                             else None)
            return (np.asarray([d for d, _ in hits], np.int64),
                    np.asarray([s for _, s in hits], np.float64))
        ids_parts, w_parts = [], []
        for t in uniq:
            if t not in loaded or t not in idf_map:
                continue
            _df, blob = loaded[t]
            post = codec.decode_posting(blob)
            w = idf_map[t] * codec.bm25_impact(post.tfs, post.dls, avgdl,
                                               eng.k1, eng.b)
            ids_parts.append(post.doc_ids)
            w_parts.append(w)
        if not ids_parts:
            return (np.empty(0, np.int64), np.empty(0, np.float64))
        all_ids = np.concatenate(ids_parts)
        all_w = np.concatenate(w_parts)
        uids, inverse = np.unique(all_ids, return_inverse=True)
        scores = np.zeros(uids.size, dtype=np.float64)
        np.add.at(scores, inverse, all_w)
        if eng.deleted.size:
            live = ~np.isin(uids, eng.deleted)
            uids, scores = uids[live], scores[live]
        idx = pick_topk(tie)(scores, uids, k)
        return (uids[idx].astype(np.int64), scores[idx])


class ShardedSearchTier:
    """Scatter-gather search over a doc-sharded deployment.

    Query cost at the driver: O(terms) down + O(shards * k) up — never
    O(matches).  Exact BM25 (scores AND ranks) vs a single index over
    the union of the shards; asserted against GenerationalEngine and a
    monolithic build in tests.

    ``replicas``: ES-style shard replicas — each shard gets that many
    interchangeable :class:`ShardWorker` actors (same immutable shard
    files, so any replica answers exactly).  Queries pick a replica
    round-robin; a dead replica fails over to the next one, and a shard
    whose replicas ALL died is respawned from the index files — the
    serving analog of the reference sink's infinite retry with node
    rotation (``ElasticSearchStorage.cs:95-149``) and of ES reallocating
    a lost shard from disk.  Failover is exact, not degraded: shards are
    disjoint, so the retried call returns the same rows any replica
    would.

    ``worker_cpus``: CPU reservation per shard worker (1.0 on a real
    cluster — one data node core per shard; fractional when shards ×
    replicas oversubscribe a small machine, e.g. tests — serving
    workers are idle between queries, so actor creation must not
    deadlock waiting for whole cores that scoring never pins)."""

    def __init__(self, index_root: str, replicas: int = 1,
                 worker_cpus: float = 1.0):
        from onestools_eventlog_ray.pipelines.incremental import \
            list_generations
        from onestools_eventlog_ray.state.tombstones import load_tombstones
        self.gen_dirs = list_generations(index_root)
        if not self.gen_dirs:
            raise FileNotFoundError(f"no shards under {index_root}")
        if replicas < 1:
            raise ValueError("replicas must be >= 1")
        self._root_del = load_tombstones(index_root)
        self._worker_cpus = worker_cpus
        self.replica_groups = [
            [self._spawn(d) for _ in range(replicas)]
            for d in self.gen_dirs]
        # kept for introspection/back-compat: the current primary per shard
        self.workers = [g[0] for g in self.replica_groups]
        self._rr = 0
        st = self._scatter(range(len(self.gen_dirs)), "stats",
                           lambda si: ())
        self.N = sum(n for n, _ in st)
        total_tokens = sum(tt for _, tt in st)
        self.avgdl = total_tokens / self.N if self.N else 0.0
        # per-shard-df cache: df changes only when the index changes,
        # and the tier is snapshot-consistent by construction (workers
        # hold engines loaded at tier start — rebuild the tier after
        # index updates), so repeated queries on seen terms skip
        # phase 1 entirely (ES caches field statistics the same way).
        # Keeping PER-SHARD dfs (not just the sum) also prunes phase 2:
        # a shard with df=0 for every query term cannot contribute.
        self._df_cache: dict[str, np.ndarray] = {}

    # ---- replica pick / failover -------------------------------------

    def _spawn(self, gen_dir: str):
        return ShardWorker.options(num_cpus=self._worker_cpus).remote(
            gen_dir, self._root_del)

    def _pick(self, si: int):
        """Round-robin replica choice for shard ``si`` (one shared
        counter — per-shard counters buy nothing since shards are
        scattered together)."""
        grp = self.replica_groups[si]
        self._rr += 1
        return grp[self._rr % len(grp)]

    def _failover_call(self, si: int, picked, method: str, args: tuple):
        """Shard ``si``'s picked replica died mid-call: rotate through
        the remaining replicas; if every replica is gone, respawn one
        from the shard's immutable index files and retry on it."""
        grp = self.replica_groups[si]
        rest = [w for w in grp if w is not picked]
        last: Exception | None = None
        for w in rest:
            try:
                return ray.get(getattr(w, method).remote(*args))
            except ray.exceptions.RayActorError as e:
                last = e
        fresh = self._spawn(self.gen_dirs[si])
        self.replica_groups[si] = [fresh]
        self.workers[si] = fresh
        try:
            return ray.get(getattr(fresh, method).remote(*args))
        except ray.exceptions.RayActorError:
            raise last if last is not None else RuntimeError(
                f"shard {si}: respawned worker died immediately")

    def _scatter(self, shard_idxs, method: str, args_fn) -> list:
        """Fan ``method`` out to one replica of each listed shard in
        parallel; gather per-future so one dead replica fails over
        without poisoning the whole gather."""
        futs = []
        for si in shard_idxs:
            w = self._pick(si)
            futs.append((si, w, getattr(w, method).remote(*args_fn(si))))
        out = []
        for si, w, f in futs:
            try:
                out.append(ray.get(f))
            except ray.exceptions.RayActorError:
                out.append(self._failover_call(si, w, method, args_fn(si)))
        return out

    # ---- query -------------------------------------------------------

    def search(self, terms: list[str], k: int = 10,
               tie: str = "float",
               method: str = "taat") -> list[tuple[int, float]]:
        uniq = sorted(set(terms))
        missing = [t for t in uniq if t not in self._df_cache]
        if missing:
            dfs = self._scatter(range(len(self.gen_dirs)), "local_df",
                                lambda si: (missing,))
            for t in missing:
                self._df_cache[t] = np.array(
                    [d.get(t, 0) for d in dfs], dtype=np.int64)
        idf_map = {t: float(idf_fn(self.N, int(self._df_cache[t].sum())))
                   for t in uniq if self._df_cache[t].sum()}
        if not idf_map:
            return []
        # shard pruning: only shards holding at least one query term
        live = np.zeros(len(self.gen_dirs), dtype=bool)
        for t in idf_map:
            live |= self._df_cache[t] > 0
        parts = self._scatter(
            np.flatnonzero(live).tolist(), "score_topk",
            lambda si: (uniq, idf_map, self.avgdl, k, tie, method))
        ids = np.concatenate([p[0] for p in parts])
        scores = np.concatenate([p[1] for p in parts])
        idx = pick_topk(tie)(scores, ids, k)
        return [(int(ids[i]), float(scores[i])) for i in idx]

    def shutdown(self) -> None:
        for grp in self.replica_groups:
            for w in grp:
                ray.kill(w)
        self.replica_groups = []
        self.workers = []


@ray.remote(num_cpus=1, max_concurrency=16)
class TierRouter:
    """Coordinating node (the ES role of the same name): owns one
    :class:`ShardedSearchTier` and serves whole queries as a SINGLE
    remote call, so the two-phase scatter-gather fan-out runs inside
    this actor's process, not on the client's.

    Measured motivation: with the driver doing the fan-out, 4 tier
    replicas at 32 clients served no more QPS than 1 tier at 8 clients
    (92 -> 97) — every scatter's submit/gather serialized on the one
    client process.  Routing through coordinator actors restores the
    scaling, exactly as ES scales by adding coordinating nodes.
    ``max_concurrency=16``: queries interleave on the router's thread
    pool while their shard RPCs are in flight (each thread blocks only
    itself on its ``ray.get``)."""

    def __init__(self, index_root: str, replicas: int = 1,
                 worker_cpus: float = 1.0):
        self.tier = ShardedSearchTier(index_root, replicas=replicas,
                                      worker_cpus=worker_cpus)

    def warm(self, terms: list) -> int:
        return len(self.tier.search(sorted(set(terms)), 10, tie="e6"))

    def search(self, terms: list, k: int = 10,
               tie: str = "float") -> list:
        return self.tier.search(terms, k, tie)


def shard_balance_report(ds: "ray.data.Dataset", n_shards: int = 8
                         ) -> "pa.Table":
    """Shard-placement audit for the doc-sharded serving tier: per
    shard (the same content-keyed ``doc_id % n_shards`` route as
    :func:`route_corpus_shards`), doc and token counts, the shard's
    e6 fill ratio vs the uniform ideal, and the rebalance plan —
    ``moves`` = docs above the ceil(total/n_shards) ceiling that a
    rebalancer would relocate (ES disk-watermark shard balancing, made
    deterministic).  Narrow-row fold: (shard, n_docs, n_tokens)
    partials per batch, O(n_shards) rows after the groupby.
    -> (shard, n_docs, n_tokens, fill_e6, moves) by shard."""
    import numpy as _np
    import pyarrow as _pa
    from ray.data.aggregate import Sum as _Sum

    from onestools_eventlog_ray.pipelines.mix import _n_tokens

    def partial(batch: "pa.Table") -> "pa.Table":
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        nt = _n_tokens(batch["text"])
        shard = (ids % n_shards).astype(_np.int64)
        keys, inv = _np.unique(shard, return_inverse=True)
        nd = _np.bincount(inv, minlength=keys.size).astype(_np.int64)
        ts = _np.zeros(keys.size, dtype=_np.int64)
        _np.add.at(ts, inv, nt)
        return _pa.table({"shard": _pa.array(keys, _pa.int64()),
                          "nd_p": _pa.array(nd, _pa.int64()),
                          "nt_p": _pa.array(ts, _pa.int64())})

    rows = ds.select_columns(["doc_id", "text"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("shard") \
        .aggregate(_Sum("nd_p", alias_name="n_docs"),
                   _Sum("nt_p", alias_name="n_tokens")).take_all()
    by = {int(r["shard"]): (int(r["n_docs"]), int(r["n_tokens"]))
          for r in rows}
    shards = list(range(n_shards))
    nd = _np.array([by.get(s, (0, 0))[0] for s in shards], dtype=_np.int64)
    nt = _np.array([by.get(s, (0, 0))[1] for s in shards], dtype=_np.int64)
    total = int(nd.sum())
    ceil_cap = -(-total // n_shards) if total else 0
    fill = nd * 1_000_000 * n_shards // max(total, 1)
    moves = _np.maximum(nd - ceil_cap, 0)
    return _pa.table({
        "shard": _pa.array(shards, _pa.int64()),
        "n_docs": _pa.array(nd, _pa.int64()),
        "n_tokens": _pa.array(nt, _pa.int64()),
        "fill_e6": _pa.array(fill, _pa.int64()),
        "moves": _pa.array(moves, _pa.int64()),
    })
