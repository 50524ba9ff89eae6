"""Incremental (generational) indexing — the batch analog of the
reference's live tailing.

The reference follows a growing log: a FileSystemWatcher wakes the
reader when new LGP files appear (SURVEY.md §2.10 W1,
``/root/reference/OneSTools.EventLog/EventLogReader.cs:156-173``) and the
stored position makes restarts incremental.  Our batch equivalent:
**new documents arrive as a new GENERATION** — a self-contained index
(own docstore, shards, manifest, stats) built by the normal pipeline
under ``<root>/gen-NNNN``.  No existing shard is rewritten (append-only,
like the reference's sinks), and a crashed generation build resumes via
its own partition manifest.

Query-time the generations compose EXACTLY: BM25 needs global N, avgdl
and df, all of which are sums over generations; postings store raw
(tf, dl) so per-doc weights are recomputed under the global stats —
the merged engine is therefore rank-identical to a single full build
(tests/test_incremental.py proves it against the brute-force oracle).
Codec v3 stores raw (max_tf, min_dl) block extrema, so block-max WAND
bounds are computed at query time under the GLOBAL avgdl — the
generational engine supports both TAAT and WAND (identical results),
with no stale-bound hazard as avgdl drifts across generations.
"""

from __future__ import annotations

import os
import re

import numpy as np

from onestools_eventlog_ray.config import EngineConfig
from onestools_eventlog_ray.functions import codec
from onestools_eventlog_ray.functions.bm25 import (idf as idf_fn, pick_topk,
                                                   topk_order)
from onestools_eventlog_ray.pipelines.build import build_index
from onestools_eventlog_ray.pipelines.query import SearchEngine
from onestools_eventlog_ray.sources.corpus import CorpusSpec, CODE_CORPUS_SPEC

_GEN_RE = re.compile(r"^gen-(\d{4})$")


def list_generations(index_root: str) -> list[str]:
    if not os.path.isdir(index_root):
        return []
    gens = [d for d in os.listdir(index_root) if _GEN_RE.match(d)]
    return [os.path.join(index_root, d) for d in sorted(gens)]


def add_generation(corpus_paths, index_root: str,
                   spec: CorpusSpec = CODE_CORPUS_SPEC,
                   cfg: EngineConfig = EngineConfig()) -> dict:
    """Index a new batch of documents as the next generation.  Returns the
    build report (with ``generation_dir``).  Re-running after a crash
    resumes the LAST generation via its partition manifest (same lineage
    rules as a full build)."""
    gens = list_generations(index_root)
    if gens:
        last = gens[-1]
        # an incomplete last generation (missing stats or partitions) is
        # resumed in place rather than leaving a hole
        try:
            from onestools_eventlog_ray.state import checkpoint as ckpt
            st = ckpt.read_stats(last)
            complete = len(ckpt.done_partitions(last, st["fingerprint"])) \
                >= st.get("num_partitions", cfg.num_partitions)
        except Exception:
            complete = False
        next_id = len(gens) if complete else len(gens) - 1
    else:
        next_id = 0
    gen_dir = os.path.join(index_root, f"gen-{next_id:04d}")
    report = build_index(corpus_paths, gen_dir, spec=spec, cfg=cfg)
    report["generation_dir"] = gen_dir
    return report


class CorpusWatcher:
    """Event-driven continuous ingestion — closes the reference's live
    tailing surface (SURVEY.md §2.10 W1,
    ``/root/reference/OneSTools.EventLog/EventLogReader.cs:156-173``: a
    FileSystemWatcher wakes the reader when new LGP files appear).  The
    engine's analog watches a corpus DIRECTORY and indexes every new
    parquet partition file as the next generation automatically:

        w = CorpusWatcher(corpus_dir, index_root)
        w.sync()              # one round: new files -> add_generation
        w.watch(interval_s=5) # poll loop (the wakeup signal)

    Exactly-once per file: the per-file signature set (name, size,
    mtime) is persisted ATOMICALLY to ``<index_root>/watch_state.json``
    only AFTER a generation build succeeds, so a crash mid-build leaves
    the files pending and the next sync resumes the same (incomplete)
    generation via its partition manifest (:func:`add_generation`'s
    resume rule).  Partition files are append-only by contract — a file
    whose size/mtime CHANGES after being indexed would silently
    duplicate its old documents, so it raises by default
    (``on_modified='error'``); ``'ignore'`` skips it with a report note.
    """

    def __init__(self, corpus_dir: str, index_root: str,
                 spec: CorpusSpec = CODE_CORPUS_SPEC,
                 cfg: EngineConfig = EngineConfig(),
                 on_modified: str = "error"):
        if on_modified not in ("error", "ignore"):
            raise ValueError(f"unknown on_modified {on_modified!r}")
        self.corpus_dir = corpus_dir
        self.index_root = index_root
        self.spec = spec
        self.cfg = cfg
        self.on_modified = on_modified
        self._state_path = os.path.join(index_root, "watch_state.json")

    # -- state ------------------------------------------------------------
    def _read_state(self) -> dict:
        import json
        try:
            with open(self._state_path) as f:
                return json.load(f)
        except FileNotFoundError:
            return {"files": {}}

    def _file_sig(self, path: str) -> str:
        st = os.stat(path)
        return f"{st.st_size}:{st.st_mtime_ns}"

    def pending(self) -> tuple[list[str], list[str]]:
        """-> (new files to index, already-indexed files that changed)."""
        state = self._read_state()["files"]
        new, modified = [], []
        for name in sorted(os.listdir(self.corpus_dir)):
            if not name.endswith((".parquet", ".pq")):
                continue
            p = os.path.join(self.corpus_dir, name)
            sig = self._file_sig(p)
            if name not in state:
                new.append(p)
            elif state[name] != sig:
                modified.append(p)
        return new, modified

    # -- rounds -----------------------------------------------------------
    def sync(self) -> dict:
        """One reconciliation round; builds at most one new generation."""
        import json
        from onestools_eventlog_ray.state.checkpoint import atomic_write_text
        new, modified = self.pending()
        if modified and self.on_modified == "error":
            raise ValueError(
                f"already-indexed corpus files changed in place: "
                f"{[os.path.basename(p) for p in modified]} — partition "
                "files are append-only; write new files instead")
        if not new:
            return {"generation_dir": None, "indexed_files": [],
                    "modified_ignored": [os.path.basename(p)
                                         for p in modified]}
        rep = add_generation(new, self.index_root,
                             spec=self.spec, cfg=self.cfg)
        state = self._read_state()
        for p in new:
            state["files"][os.path.basename(p)] = self._file_sig(p)
        atomic_write_text(self._state_path, json.dumps(state, indent=1))
        return {**rep,
                "indexed_files": [os.path.basename(p) for p in new],
                "modified_ignored": [os.path.basename(p)
                                     for p in modified]}

    def sync_with_alerts(self, rules: dict[str, list[str]]) -> dict:
        """ES WATCHER analog — one reconciliation round PLUS saved-search
        alerting over ONLY the newly ingested partition files: which
        alert rules (bool-must term sets, the ``text.percolate``
        contract) did the new documents trigger?  The percolation
        streams just the new files once with the rules broadcast — cost
        is independent of index size, the shape an alerting hook needs
        at any scale.  Returns the ``sync()`` report plus ``alerts``
        (a (doc_id, query_name) pyarrow table, sorted)."""
        import pyarrow as pa
        from onestools_eventlog_ray.pipelines.text import percolate
        from onestools_eventlog_ray.sources.corpus import \
            read_parquet_clean
        rep = self.sync()
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "query_name": pa.array([], pa.string())})
        if not rep.get("indexed_files") or not rules:
            return {**rep, "alerts": empty}
        paths = [os.path.join(self.corpus_dir, n)
                 for n in rep["indexed_files"]]
        ds = read_parquet_clean(paths)
        alerts = percolate(ds, rules, self.spec).to_pandas()
        if len(alerts) == 0:
            return {**rep, "alerts": empty}
        alerts = alerts.sort_values(["query_name", "doc_id"]) \
            .reset_index(drop=True)
        return {**rep, "alerts": pa.Table.from_pandas(
            alerts, preserve_index=False)}

    def watch(self, interval_s: float = 5.0,
              max_rounds: int | None = None,
              backend: str = "auto") -> list[dict]:
        """Wakeup loop around :meth:`sync`; returns the non-noop reports.

        ``backend="inotify"`` (or ``"auto"`` on Linux) is EVENT-driven —
        the reference's ``FileSystemWatcher`` + ``ManualResetEvent``
        shape (``EventLogReader.cs:156-173``): the loop blocks on the
        directory's inotify fd and a completed corpus file triggers the
        next reconciliation within milliseconds, with ``interval_s`` as
        the fallback heartbeat (changes that bypass inotify — network
        mounts — still reconcile once per interval, exactly why the
        reference keeps its timer too).  ``backend="poll"`` is the plain
        sleep loop for platforms without inotify."""
        import time
        from onestools_eventlog_ray.functions.inotify import (
            Inotify, inotify_available)
        if backend not in ("auto", "inotify", "poll"):
            raise ValueError(f"unknown watch backend {backend!r}")
        use_events = backend == "inotify" or (
            backend == "auto" and inotify_available(self.corpus_dir))
        ino = Inotify(self.corpus_dir) if use_events else None
        try:
            out = []
            n = 0
            while max_rounds is None or n < max_rounds:
                rep = self.sync()
                if rep.get("indexed_files"):
                    out.append(rep)
                n += 1
                if max_rounds is None or n < max_rounds:
                    if ino is not None:
                        ino.wait(interval_s)     # event OR heartbeat
                    else:
                        time.sleep(interval_s)
            return out
        finally:
            if ino is not None:
                ino.close()


def compact_generations(index_root: str, out_dir: str,
                        cfg: EngineConfig = EngineConfig()) -> dict:
    """Merge all generations into ONE fresh index (the ES force-merge
    analog): the generations' docstores — which carry the full content —
    ARE a valid corpus (``doc_id`` + ``content`` columns), so compaction
    is simply ``build_index`` over their union.  The compacted index is
    rank-identical to the generational engine (both equal a single full
    build over the union of documents — proved in tests), with
    single-index query cost (one shard probe per term instead of one
    per generation)."""
    import glob
    from onestools_eventlog_ray.state import checkpoint as ckpt
    gens = list_generations(index_root)
    if not gens:
        raise FileNotFoundError(f"no generations under {index_root}")
    part_files = sorted(f for g in gens for f in
                        glob.glob(os.path.join(g, "docstore", "*.parquet")))
    # carry the generations' OWN spec through compaction: meta columns
    # survive (search_filtered / fetch_docs keep working on the compacted
    # index), and a content-less docstore fails EARLY instead of crashing
    # mid-build (round-2 ADVICE, low)
    gen_stats = ckpt.read_stats(gens[0])
    gen_cfg = gen_stats.get("config", {})
    if not gen_cfg.get("store_content", True):
        raise ValueError(
            f"generations under {index_root} were built with "
            "store_content=False: their docstores carry no content column, "
            "so they cannot be re-indexed by compaction")
    meta_cols = tuple(gen_stats.get("spec", {}).get("meta_cols", ()))
    spec = CorpusSpec(content_col="content", id_col="doc_id",
                      key_cols=("doc_id",), meta_cols=meta_cols)
    # compaction PHYSICALLY drops tombstoned docs (the segment-merge
    # analog of ES soft-deletes): root + per-generation tombstones are
    # excluded at the read, and the compacted index carries none
    from onestools_eventlog_ray.state.tombstones import load_tombstones
    deleted = np.unique(np.concatenate(
        [load_tombstones(index_root)] + [load_tombstones(g) for g in gens]))
    report = build_index(part_files, out_dir, spec=spec, cfg=cfg,
                         exclude_doc_ids=deleted if deleted.size else None)
    report["n_generations"] = len(gens)
    report["n_deleted_dropped"] = int(deleted.size)
    return report


class GenerationalSearchEngine:
    """Exact BM25 over all generations combined (global N/avgdl/df)."""

    def __init__(self, index_root: str):
        from onestools_eventlog_ray.state.tombstones import load_tombstones
        self.gen_dirs = list_generations(index_root)
        if not self.gen_dirs:
            raise FileNotFoundError(f"no generations under {index_root}")
        self.engines = [SearchEngine(d) for d in self.gen_dirs]
        # root-level tombstones apply across ALL generations (a delete of
        # a doc indexed in any generation), unioned with each generation's
        # own tombstones (already loaded by its SearchEngine)
        root_del = load_tombstones(index_root)
        per_gen = [e.deleted for e in self.engines if e.deleted.size]
        self.deleted = np.unique(np.concatenate([root_del] + per_gen)) \
            if per_gen or root_del.size else root_del
        self.N = sum(e.N for e in self.engines)
        total_tokens = sum(e.avgdl * e.N for e in self.engines)
        self.avgdl = total_tokens / self.N if self.N else 0.0
        e0 = self.engines[0]
        self.k1, self.b = e0.k1, e0.b

    def df(self, term: str) -> int:
        total = 0
        for e in self.engines:
            hit = e.load_terms([term]).get(term)
            if hit:
                total += hit[0]
        return total

    def search(self, terms: list[str], k: int = 10,
               tie: str = "float") -> list[tuple[int, float]]:
        """TAAT over all generations; identical semantics (and identical
        float64 accumulation order: sorted terms major, generations minor)
        to a single-index build over the union of the documents."""
        uniq = sorted(set(terms))
        per_gen = [e.load_terms(uniq) for e in self.engines]
        ids_parts, w_parts = [], []
        for t in uniq:
            hits = [(g, per_gen[g][t]) for g in range(len(self.engines))
                    if t in per_gen[g]]
            if not hits:
                continue
            df_global = sum(df for (_, (df, _)) in hits)
            idf_t = idf_fn(self.N, df_global)
            for g, (_df, blob) in hits:
                post = codec.decode_posting(blob)
                w = idf_t * codec.bm25_impact(post.tfs, post.dls, self.avgdl,
                                              self.k1, self.b)
                ids_parts.append(post.doc_ids)
                w_parts.append(w)
        if not ids_parts:
            return []
        all_ids = np.concatenate(ids_parts)
        all_w = np.concatenate(w_parts)
        uids, inverse = np.unique(all_ids, return_inverse=True)
        scores = np.zeros(uids.size, dtype=np.float64)
        np.add.at(scores, inverse, all_w)
        if self.deleted.size:
            live = ~np.isin(uids, self.deleted)
            uids, scores = uids[live], scores[live]
        idx = pick_topk(tie)(scores, uids, k)
        return [(int(uids[i]), float(scores[i])) for i in idx]

    def search_wand(self, terms: list[str], k: int = 10,
                    tie: str = "float") -> list[tuple[int, float]]:
        """Block-max WAND across generations: one cursor per
        (term, generation) with idf from the GLOBAL df and bounds from
        the v3 (max_tf, min_dl) extrema under the GLOBAL avgdl.
        Generations hold disjoint doc_ids, so a doc appears in at most
        one cursor per term and the accumulation order (terms major,
        generations minor) matches :meth:`search` — results identical."""
        from onestools_eventlog_ray.pipelines.query import (_PostingCursor,
                                                            wand_topk)
        uniq = sorted(set(terms))
        per_gen = [e.load_terms(uniq) for e in self.engines]
        iters = []
        for t in uniq:
            hits = [(g, per_gen[g][t]) for g in range(len(self.engines))
                    if t in per_gen[g]]
            if not hits:
                continue
            df_global = sum(df for (_, (df, _)) in hits)
            idf_t = idf_fn(self.N, df_global)
            for _g, (_df, blob) in hits:
                iters.append(_PostingCursor(blob, idf_t, self.avgdl,
                                            self.k1, self.b))
        return wand_topk(iters, k, tie=tie,
                         deleted=self.deleted if self.deleted.size else None)


def reindex(src_index: str, out_dir: str, where: dict | None = None,
            cfg: EngineConfig = EngineConfig()) -> dict:
    """ES ``_reindex`` (optionally with a query): build a NEW index from
    a source index's docstore, keeping only documents that match the
    metadata predicate.  ``where`` uses the :meth:`SearchEngine.
    search_filtered` convention — scalar = equality, ``(lo, hi)`` tuple
    = inclusive range — and is pushed down to the parquet read as a
    ``pyarrow.dataset`` filter expression (nothing non-matching leaves
    storage); source tombstones are honored via the same pushdown.
    The new index carries its OWN stats (N/avgdl/df of the subset),
    exactly like a real ES reindex-into-smaller-index."""
    import pyarrow.dataset as pads
    from onestools_eventlog_ray.state import checkpoint as ckpt
    from onestools_eventlog_ray.state.tombstones import load_tombstones
    import glob
    src_stats = ckpt.read_stats(src_index)
    if not src_stats.get("config", {}).get("store_content", True):
        raise ValueError(f"{src_index} was built with store_content=False: "
                         "its docstore cannot be reindexed")
    meta_cols = tuple(src_stats.get("spec", {}).get("meta_cols", ()))
    spec = CorpusSpec(content_col="content", id_col="doc_id",
                      key_cols=("doc_id",), meta_cols=meta_cols)
    expr = None
    sig_parts = []
    for c, v in sorted((where or {}).items()):
        if c != "doc_id" and c not in meta_cols:
            raise KeyError(f"predicate column {c!r} not in docstore "
                           f"meta columns {meta_cols}")
        if isinstance(v, tuple):
            e = (pads.field(c) >= v[0]) & (pads.field(c) <= v[1])
            sig_parts.append(f"{c}in[{v[0]},{v[1]}]")
        else:
            e = pads.field(c) == v
            sig_parts.append(f"{c}={v}")
        expr = e if expr is None else expr & e
    part_files = sorted(glob.glob(os.path.join(src_index, "docstore",
                                               "*.parquet")))
    if not part_files:
        raise FileNotFoundError(f"no docstore under {src_index}")
    deleted = load_tombstones(src_index)
    report = build_index(part_files, out_dir, spec=spec, cfg=cfg,
                         exclude_doc_ids=deleted if deleted.size else None,
                         row_filter=expr,
                         row_filter_sig=";".join(sig_parts) or "all")
    report["src_index"] = src_index
    return report


def index_diff(index_a: str, index_b: str) -> ray.data.Dataset:
    """Docstore reconciliation between two indexes (ES snapshot-diff /
    reindex audit): for every doc_id in either index, whether it was
    ``removed`` (A only), ``added`` (B only), ``changed`` (both,
    content sha differs) or ``same``.  The audit a reindex-with-query
    or compaction run publishes.

    Distributed tagged-union co-group over the two docstores — only
    (doc_id, sha) rows shuffle, content stays columnar in the scans.
    -> (doc_id, status)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data
    from ray.data.aggregate import Max

    def tag(side: str):
        def fn(batch: pa.Table) -> pa.Table:
            sha = batch["content_sha256"]
            null = pa.nulls(batch.num_rows, pa.string())
            return pa.table({
                "doc_id": batch["doc_id"],
                "sha_a": sha if side == "a" else null,
                "sha_b": sha if side == "b" else null,
            })
        return fn

    a = ray.data.read_parquet(os.path.join(index_a, "docstore"),
                              columns=["doc_id", "content_sha256"]) \
        .map_batches(tag("a"), batch_format="pyarrow")
    b = ray.data.read_parquet(os.path.join(index_b, "docstore"),
                              columns=["doc_id", "content_sha256"]) \
        .map_batches(tag("b"), batch_format="pyarrow")
    folded = a.union(b).groupby("doc_id").aggregate(
        Max("sha_a", alias_name="sha_a"), Max("sha_b", alias_name="sha_b"))

    def status(batch: pa.Table) -> pa.Table:
        ha = batch["sha_a"].to_numpy(zero_copy_only=False)
        hb = batch["sha_b"].to_numpy(zero_copy_only=False)
        st = np.where(pc.is_null(batch["sha_b"]).to_numpy(
                          zero_copy_only=False), "removed",
             np.where(pc.is_null(batch["sha_a"]).to_numpy(
                          zero_copy_only=False), "added",
             np.where(ha == hb, "same", "changed")))
        return pa.table({"doc_id": batch["doc_id"],
                         "status": pa.array(st.astype(object),
                                            pa.string())})

    return folded.map_batches(status, batch_format="pyarrow")


def shrink_index(src_index: str, out_dir: str, factor: int = 2) -> dict:
    """ES ``_shrink``: reduce the shard count of an index WITHOUT
    rebuilding — the target shard count must divide the source count
    (the same constraint ES imposes), because the term routing
    ``md5(term) % P`` is compatible: ``h % P == r`` implies
    ``h % (P/f) == r % (P/f)``, so new shard ``j`` is exactly the
    merge of old shards ``{r : r % P' == j}`` and every query keeps
    probing the right (now bigger) shard.

    Per new shard, one Ray task reads its ``factor`` source part files
    (terms are disjoint across them by construction), re-sorts by term
    (K4 invariant) and writes atomically — O(index size / P') per task,
    embarrassingly parallel, no shuffle.  The docstore and manifest are
    HARDLINKED (copy fallback), like ES shrink hardlinks Lucene
    segments; corpus stats (N, avgdl, df) are unchanged so every BM25
    score is bit-identical to the source index (rank identity proven in
    tests/test_round4h.py).  Positions shards merge the same way.

    Reference parity: the original's index-lifecycle management keeps
    ES storage bounded (ElasticSearchStorage.cs index templates /
    rollover); shrink is the missing-shard-count half of that story."""
    import shutil
    import ray
    from onestools_eventlog_ray.state import checkpoint as ckpt

    stats = ckpt.read_stats(src_index)
    P = int(stats["num_partitions"])
    if factor < 1 or P % factor:
        raise ValueError(f"factor {factor} must divide num_partitions {P}")
    P2 = P // factor
    os.makedirs(os.path.join(out_dir, "shards"), exist_ok=True)

    @ray.remote
    def merge_group(kind: str, j: int, srcs: list[str], dst: str) -> int:
        import pyarrow as pa_
        import pyarrow.parquet as pq_
        tbls = [pq_.read_table(s) for s in srcs if os.path.exists(s)]
        if not tbls:
            return 0
        t = pa_.concat_tables(tbls)
        order = (["term", "doc_id"] if kind == "pos" else ["term"])
        t = t.sort_by([(c, "ascending") for c in order])
        tmp = dst + ".tmp"
        pq_.write_table(t, tmp)
        os.replace(tmp, dst)
        return t.num_rows

    jobs = []
    for j in range(P2):
        srcs = [os.path.join(src_index, "shards", f"part-{r:05d}.parquet")
                for r in range(j, P, P2)]
        dst = os.path.join(out_dir, "shards", f"part-{j:05d}.parquet")
        jobs.append(merge_group.remote("shard", j, srcs, dst))

    pos_src = os.path.join(src_index, "positions")
    pos_rows = []
    if os.path.isdir(pos_src):
        os.makedirs(os.path.join(out_dir, "positions"), exist_ok=True)
        for j in range(P2):
            srcs = [os.path.join(pos_src, f"pos-{r:05d}.parquet")
                    for r in range(j, P, P2)]
            dst = os.path.join(out_dir, "positions", f"pos-{j:05d}.parquet")
            pos_rows.append(merge_group.remote("pos", j, srcs, dst))

    def _link_tree(sub: str) -> None:
        src = os.path.join(src_index, sub)
        if not os.path.isdir(src):
            return
        for root, _dirs, names in os.walk(src):
            rel = os.path.relpath(root, src_index)
            dst = os.path.join(out_dir, rel)
            os.makedirs(dst, exist_ok=True)
            for name in names:
                s, d = os.path.join(root, name), os.path.join(dst, name)
                if os.path.exists(d):
                    continue
                try:
                    os.link(s, d)
                except OSError:
                    shutil.copy2(s, d)

    # ann/ buckets are hyperplane-partitioned — independent of the term
    # shard count — so they ride shard-count changes unchanged, like the
    # docstore (round-5 lifecycle matrix)
    for sub in ("docstore", "manifest", "tombstones", "ann"):
        _link_tree(sub)

    n_postings = int(sum(ray.get(jobs)))
    new_stats = dict(stats)
    new_stats["num_partitions"] = P2
    new_stats["config"] = dict(stats.get("config", {}),
                               num_partitions=P2)
    new_stats["shrunk_from"] = {"src_index": src_index,
                                "num_partitions": P, "factor": factor}
    ckpt.write_stats(out_dir, new_stats)

    if pos_rows:
        import json
        meta_p = os.path.join(pos_src, "_meta.json")
        meta = json.load(open(meta_p)) if os.path.exists(meta_p) else {}
        total = int(sum(ray.get(pos_rows)))
        meta.update(num_partitions=P2, n_shards=P2, n_rows=total)
        with open(os.path.join(out_dir, "positions", "_meta.json"),
                  "w") as fh:
            json.dump(meta, fh)
    return {"num_partitions": P2, "n_postings_rows": n_postings,
            "factor": factor}


def split_index(src_index: str, out_dir: str, factor: int = 2) -> dict:
    """ES ``_split``: MULTIPLY the shard count of an index without
    rebuilding — the exact inverse of :func:`shrink_index`.  Every term
    in old shard ``r`` satisfies ``md5(term) % P == r``, so under the
    new count ``f*P`` it can only land in one of the ``f`` shards
    ``{r, r+P, ..., r+(f-1)P}``; one Ray task per OLD shard recomputes
    the vectorized term hash at the new modulus and scatters its rows
    into those ``f`` files (terms stay disjoint and sorted, K4).  No
    shuffle, O(shard) per task; docstore/manifest hardlinked; stats
    unchanged -> BM25 bit-identity, like shrink.  ES uses the same
    trick (routing-space subdivision) to split without reindexing."""
    import shutil
    import ray
    from onestools_eventlog_ray.state import checkpoint as ckpt

    stats = ckpt.read_stats(src_index)
    P = int(stats["num_partitions"])
    if factor < 1:
        raise ValueError(f"factor must be >= 1, got {factor}")
    P2 = P * factor
    os.makedirs(os.path.join(out_dir, "shards"), exist_ok=True)

    @ray.remote
    def scatter_shard(kind: str, src: str, r: int,
                      dst_tpl: str) -> int:
        import numpy as np_
        import pyarrow as pa_
        import pyarrow.parquet as pq_
        from onestools_eventlog_ray.functions.hashing import term_partition
        if not os.path.exists(src):
            return 0
        t = pq_.read_table(src)
        if not t.num_rows:
            return 0
        pk = term_partition(t["term"].combine_chunks(), P2)
        total = 0
        for j in sorted(set(pk.tolist())):
            assert j % P == r, (j, P, r)   # routing congruence invariant
            sub = t.filter(pa_.array(pk == j))
            order = (["term", "doc_id"] if kind == "pos" else ["term"])
            sub = sub.sort_by([(c, "ascending") for c in order])
            dst = dst_tpl.format(j=j)
            tmp = dst + ".tmp"
            pq_.write_table(sub, tmp)
            os.replace(tmp, dst)
            total += sub.num_rows
        return total

    jobs = []
    for r in range(P):
        src = os.path.join(src_index, "shards", f"part-{r:05d}.parquet")
        jobs.append(scatter_shard.remote(
            "shard", src, r,
            os.path.join(out_dir, "shards", "part-{j:05d}.parquet")))

    pos_src = os.path.join(src_index, "positions")
    pos_rows = []
    if os.path.isdir(pos_src):
        os.makedirs(os.path.join(out_dir, "positions"), exist_ok=True)
        for r in range(P):
            src = os.path.join(pos_src, f"pos-{r:05d}.parquet")
            pos_rows.append(scatter_shard.remote(
                "pos", src, r,
                os.path.join(out_dir, "positions", "pos-{j:05d}.parquet")))

    def _link_tree(sub: str) -> None:
        src = os.path.join(src_index, sub)
        if not os.path.isdir(src):
            return
        for root, _dirs, names in os.walk(src):
            rel = os.path.relpath(root, src_index)
            dst = os.path.join(out_dir, rel)
            os.makedirs(dst, exist_ok=True)
            for name in names:
                s, d = os.path.join(root, name), os.path.join(dst, name)
                if os.path.exists(d):
                    continue
                try:
                    os.link(s, d)
                except OSError:
                    shutil.copy2(s, d)

    # ann/ buckets are hyperplane-partitioned — independent of the term
    # shard count — so they ride shard-count changes unchanged, like the
    # docstore (round-5 lifecycle matrix)
    for sub in ("docstore", "manifest", "tombstones", "ann"):
        _link_tree(sub)

    n_postings = int(sum(ray.get(jobs)))
    new_stats = dict(stats)
    new_stats["num_partitions"] = P2
    new_stats["config"] = dict(stats.get("config", {}), num_partitions=P2)
    new_stats["split_from"] = {"src_index": src_index,
                               "num_partitions": P, "factor": factor}
    ckpt.write_stats(out_dir, new_stats)

    if pos_rows:
        import json
        meta_p = os.path.join(pos_src, "_meta.json")
        meta = json.load(open(meta_p)) if os.path.exists(meta_p) else {}
        total = int(sum(ray.get(pos_rows)))
        meta.update(num_partitions=P2,
                    n_shards=len([f for f in os.listdir(
                        os.path.join(out_dir, "positions"))
                        if f.startswith("pos-")]),
                    n_rows=total)
        with open(os.path.join(out_dir, "positions", "_meta.json"),
                  "w") as fh:
            json.dump(meta, fh)
    return {"num_partitions": P2, "n_postings_rows": n_postings,
            "factor": factor}


def snapshot_index(src_index: str, snap_dir: str) -> dict:
    """ES ``_snapshot``: capture a restorable copy of an index with an
    INTEGRITY MANIFEST — every file hardlinked (copy fallback) into the
    snapshot plus a ``_snapshot.json`` recording per-file size and
    sha256, so restores can verify nothing rotted in cold storage
    (exactly what ES snapshot repositories store per segment file).
    Hardlinks make the snapshot O(#files) regardless of index size —
    safe because every index file is immutable once written (atomic
    tmp+rename everywhere in this repo).

    Reference parity: the original relies on ES's own snapshot
    lifecycle for the exported indexes; this is that half of the
    story for the native engine."""
    import hashlib
    import json
    import shutil
    if os.path.exists(os.path.join(snap_dir, "_snapshot.json")):
        with open(os.path.join(snap_dir, "_snapshot.json")) as fh:
            return json.load(fh)
    files = {}
    for root, _dirs, names in os.walk(src_index):
        for name in sorted(names):
            p = os.path.join(root, name)
            rel = os.path.relpath(p, src_index)
            h = hashlib.sha256()
            with open(p, "rb") as fh:
                for chunk in iter(lambda: fh.read(1 << 20), b""):
                    h.update(chunk)
            files[rel] = {"bytes": os.path.getsize(p),
                          "sha256": h.hexdigest()}
            dst = os.path.join(snap_dir, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            if not os.path.exists(dst):
                try:
                    os.link(p, dst)
                except OSError:
                    shutil.copy2(p, dst)
    manifest = {"src_index": src_index, "n_files": len(files),
                "files": files}
    tmp = os.path.join(snap_dir, "_snapshot.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1)
    os.replace(tmp, os.path.join(snap_dir, "_snapshot.json"))
    return manifest


class SnapshotCorruptError(RuntimeError):
    pass


def restore_index(snap_dir: str, dst_index: str,
                  verify: bool = True) -> dict:
    """ES ``_restore``: materialize a snapshot as a serveable index.
    With ``verify`` every file is re-hashed against the snapshot
    manifest FIRST and a mismatch raises :class:`SnapshotCorruptError`
    naming the bad file — restoring a silently-corrupt index is the
    one failure mode a snapshot system must never have."""
    import hashlib
    import json
    import shutil
    with open(os.path.join(snap_dir, "_snapshot.json")) as fh:
        manifest = json.load(fh)
    if verify:
        for rel, meta in sorted(manifest["files"].items()):
            p = os.path.join(snap_dir, rel)
            if not os.path.exists(p):
                raise SnapshotCorruptError(f"missing file {rel}")
            h = hashlib.sha256()
            with open(p, "rb") as fh:
                for chunk in iter(lambda: fh.read(1 << 20), b""):
                    h.update(chunk)
            if h.hexdigest() != meta["sha256"]:
                raise SnapshotCorruptError(f"sha mismatch {rel}")
    for rel in sorted(manifest["files"]):
        src = os.path.join(snap_dir, rel)
        dst = os.path.join(dst_index, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        if not os.path.exists(dst):
            try:
                os.link(src, dst)
            except OSError:
                shutil.copy2(src, dst)
    return {"n_files": manifest["n_files"], "verified": bool(verify)}


def update_by_query(src_index: str, out_dir: str,
                    match_terms: list[str],
                    append_token: str = "updatedmarker",
                    set_meta: dict[str, str] | None = None,
                    cfg: EngineConfig = EngineConfig()) -> dict:
    """ES ``_update_by_query`` (batch analog — ES itself documents the
    API as "reindex in place"): every live document whose text contains
    ALL ``match_terms`` is rewritten by the script (append
    ``append_token`` to the text, set the ``set_meta`` fields) and the
    index is rebuilt so the POSTINGS reflect the update — the marker
    token becomes searchable, exactly like ES reindexing the matched
    docs with a new ``_version``.

    Streaming shape: one column-pruned pass over the source docstore
    (tombstones honored via the same pushdown as :func:`reindex`), the
    match evaluated per batch with the vectorized tokenizer (no
    postings round-trip, no driver materialization), the rewritten
    corpus written as partitioned parquet, then the normal distributed
    build.  -> build report + ``n_updated``."""
    import glob

    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from onestools_eventlog_ray.functions.analyzer import tokenize_array
    from onestools_eventlog_ray.state import checkpoint as ckpt
    from onestools_eventlog_ray.state.tombstones import load_tombstones

    src_stats = ckpt.read_stats(src_index)
    if not src_stats.get("config", {}).get("store_content", True):
        raise ValueError(f"{src_index} was built with store_content=False")
    meta_cols = tuple(src_stats.get("spec", {}).get("meta_cols", ()))
    spec = CorpusSpec(content_col="content", id_col="doc_id",
                      key_cols=("doc_id",), meta_cols=meta_cols)
    part_files = sorted(glob.glob(os.path.join(src_index, "docstore",
                                               "*.parquet")))
    if not part_files:
        raise FileNotFoundError(f"no docstore under {src_index}")
    deleted = load_tombstones(src_index)
    terms = sorted(set(match_terms))
    metas = dict(set_meta or {})
    for c in metas:
        if c not in meta_cols:
            raise KeyError(f"set_meta column {c!r} not in docstore "
                           f"meta columns {meta_cols}")

    def script(batch: pa.Table) -> pa.Table:
        if deleted.size:
            live = ~np.isin(batch["doc_id"].to_numpy(zero_copy_only=False),
                            deleted)
            batch = batch.filter(pa.array(live))
        if batch.num_rows == 0:
            return batch.append_column("n_upd_p",
                                       pa.array([], pa.int64()))
        toks = tokenize_array(batch["content"])
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offs = toks.offsets.to_numpy(zero_copy_only=False)
        flat = toks.flatten()
        mask = np.ones(batch.num_rows, dtype=bool)
        counts = np.diff(offs)
        for t in terms:
            eq = pc.equal(flat, t).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            hits = np.add.reduceat(eq, offs[:-1]) if eq.size else \
                np.zeros(batch.num_rows, dtype=np.int64)
            hits[counts == 0] = 0       # reduceat artifact on empty rows
            mask &= hits > 0
        amask = pa.array(mask)
        content = batch["content"]
        if isinstance(content, pa.ChunkedArray):
            content = content.combine_chunks()
        sep = pa.array([" " + append_token] * batch.num_rows,
                       content.type)
        updated = pc.binary_join_element_wise(content, sep, "")
        cols = {"doc_id": batch["doc_id"],
                "content": pc.if_else(amask, updated, content)}
        for c in meta_cols:
            col = batch[c]
            if c in metas:
                col = pc.if_else(amask, pa.scalar(metas[c]), col)
            cols[c] = col
        return pa.table(cols)

    corpus_dir = out_dir.rstrip("/") + "_corpus"
    if os.path.isdir(corpus_dir):      # half-written corpus from a crash
        import shutil                  # would duplicate rows on append
        shutil.rmtree(corpus_dir)
    os.makedirs(corpus_dir, exist_ok=True)
    ray.data.read_parquet(part_files) \
        .map_batches(script, batch_format="pyarrow") \
        .write_parquet(corpus_dir)
    files = sorted(glob.glob(os.path.join(corpus_dir, "*.parquet")))
    report = build_index(files, out_dir, spec=spec, cfg=cfg)
    # n_updated read back from the built postings: the marker's df IS
    # the number of rewritten docs (pick a token absent from the
    # corpus; one shard-pruned term lookup, no extra corpus pass)
    hit = SearchEngine(out_dir).load_terms([append_token]) \
        .get(append_token)
    report["n_updated"] = int(hit[0]) if hit else 0
    report["src_index"] = src_index
    return report
