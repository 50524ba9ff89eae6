"""Index build pipeline — the engine's equivalent of the reference's
export lifecycle (``/root/reference/OneSTools.EventLog.Exporter.Core/EventLogExporter.cs:96-156``):

    read_parquet(corpus)
      -> map_batches(PrepareDocs)        [docstore + sha256 + n_tokens]
      -> write_parquet(docstore)                                   pass A
    corpus stats rollup (N, avgdl, fingerprint)  [partial-agg, no shuffle]
    hot-term detection on a deterministic doc_id sample            pass H
    read_parquet(corpus, content only)
      -> map_batches(TripleEmitter)      [(term, doc_id, tf, dl)]
      -> map_batches(AssignShard)        [pkey/salt/gkey, resume filter]
      -> groupby(gkey).map_groups(encode_runs)      [THE shuffle, salted]
      -> groupby(pkey).map_groups(merge_and_write)  [blob-sized shuffle]
      -> per-partition checkpoint records                          pass B

Every stage streams; nothing materializes the corpus.  Resume skips
partitions recorded ``done`` with a matching corpus fingerprint BEFORE
the shuffle, so a rerun after failure moves only the remaining data.
"""

from __future__ import annotations

import math
import os
import time

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Sum

from onestools_eventlog_ray.config import EngineConfig
from onestools_eventlog_ray.sources.corpus import CorpusSpec, CODE_CORPUS_SPEC, read_corpus
from onestools_eventlog_ray.stages.normalize import PrepareDocs, add_doc_id
from onestools_eventlog_ray.stages.tokenize import TripleEmitter
from onestools_eventlog_ray.stages.postings import (AssignShard, make_encode_runs,
                                                    make_merge_and_write)
from onestools_eventlog_ray.stages import stats as stats_mod
from onestools_eventlog_ray.state import checkpoint as ckpt

HOT_SAMPLE_TARGET_DOCS = 50_000


def _pool_size() -> int:
    ncpu = int(ray.cluster_resources().get("CPU", 4))
    return max(2, ncpu - 1)


def docstore_path(index_dir: str) -> str:
    return os.path.join(index_dir, "docstore")


def _input_signature(corpus_paths) -> str:
    """Cheap corpus identity (paths + sizes + mtimes) guarding docstore reuse."""
    import hashlib
    paths = [corpus_paths] if isinstance(corpus_paths, str) else list(corpus_paths)
    h = hashlib.blake2b(digest_size=8)
    for p in sorted(paths):
        if os.path.isdir(p):
            for name in sorted(os.listdir(p)):
                fp = os.path.join(p, name)
                st = os.stat(fp)
                h.update(f"{fp}:{st.st_size}:{st.st_mtime_ns}".encode())
        elif os.path.exists(p):
            st = os.stat(p)
            h.update(f"{p}:{st.st_size}:{st.st_mtime_ns}".encode())
    return h.hexdigest()


def detect_hot_terms(corpus_paths, spec: CorpusSpec, cfg: EngineConfig,
                     n_docs: int) -> dict[str, int]:
    """Estimate per-term df on a deterministic doc_id-hash sample and size
    the salt fan-out for terms whose projected df exceeds the threshold.

    Salting needs only a good ESTIMATE (any assignment merges correctly —
    see stages/postings.py); exact df/cf are computed from the merged
    postings themselves.
    """
    if n_docs <= cfg.salt_threshold:
        return {}
    m = max(1, n_docs // HOT_SAMPLE_TARGET_DOCS)

    def sample_triples(batch: pa.Table) -> pa.Table:
        import numpy as np
        b = add_doc_id(batch, spec)
        if m > 1:
            ids = b["doc_id"].to_numpy(zero_copy_only=False)
            b = b.filter(pa.array(ids % m == 0))
        from onestools_eventlog_ray.functions.analyzer import doc_term_table
        triples, _ = doc_term_table(b["doc_id"], b["content"], cfg.token_split_pattern)
        # partial df per term within the batch
        return triples.group_by("term").aggregate([("doc_id", "count")]) \
                      .rename_columns(["term", "df_part"])

    ds = read_corpus(corpus_paths, spec, with_meta=False)
    df_ds = ds.map_batches(sample_triples, batch_format="pyarrow",
                           batch_size=cfg.tokenize_batch_size)
    agg = df_ds.groupby("term").aggregate(Sum("df_part", alias_name="df_est"))
    thr = max(1, cfg.salt_threshold // m)
    hot_rows = agg.map_batches(
        lambda t: t.filter(pc.greater(t["df_est"], thr)),
        batch_format="pyarrow").take_all()
    hot: dict[str, int] = {}
    for r in hot_rows:
        df_est = int(r["df_est"]) * m
        n_salts = min(cfg.max_salts, math.ceil(df_est / cfg.salt_target_run))
        if n_salts > 1:
            hot[r["term"]] = n_salts
    return hot


def build_index(corpus_paths, index_dir: str,
                spec: CorpusSpec = CODE_CORPUS_SPEC,
                cfg: EngineConfig = EngineConfig(),
                hot_terms: dict[str, int] | None = None) -> dict:
    """Build (or resume) the full-text index. Returns a build report dict."""
    t_start = time.monotonic()
    os.makedirs(index_dir, exist_ok=True)
    pool = cfg.tokenize_concurrency or _pool_size()

    # ---- pass A: docstore + per-row invariants --------------------------
    dstore = docstore_path(index_dir)
    # the marker makes a completed docstore pass skippable on resume,
    # like the reference skipping already-exported positions
    done_marker = os.path.join(dstore, "_DOCSTORE_DONE")
    marker_text = (f"pattern={cfg.token_split_pattern} "
                   f"store_content={cfg.store_content} "
                   f"input={_input_signature(corpus_paths)}")
    reuse_docstore = (os.path.exists(done_marker)
                      and open(done_marker).read() == marker_text)
    t0 = time.monotonic()
    if not reuse_docstore:
        ds = read_corpus(corpus_paths, spec)
        ds = ds.map_batches(PrepareDocs, batch_format="pyarrow",
                            batch_size=cfg.tokenize_batch_size,
                            concurrency=(1, pool),
                            fn_constructor_kwargs=dict(
                                spec=spec, token_split_pattern=cfg.token_split_pattern,
                                store_content=cfg.store_content))
        os.makedirs(dstore, exist_ok=True)
        ds.write_parquet(dstore)
        ckpt.atomic_write_text(done_marker, marker_text)
    t_docstore = time.monotonic() - t0

    # ---- corpus stats (partial-agg rollup over 3 narrow columns) --------
    t0 = time.monotonic()
    stats = stats_mod.corpus_stats_from_docstore(dstore)
    fingerprint = stats["fingerprint"]
    t_stats = time.monotonic() - t0

    # ---- resume check ---------------------------------------------------
    P = cfg.num_partitions
    done = ckpt.done_partitions(index_dir, fingerprint)
    done = {p for p in done if p < P}

    t_hot = t_build = 0.0
    hot = hot_terms if hot_terms is not None else {}
    if len(done) < P:
        # ---- pass H: hot-term detection for skew salting ----------------
        if hot_terms is None:
            t0 = time.monotonic()
            hot = detect_hot_terms(corpus_paths, spec, cfg, stats["n_docs"])
            t_hot = time.monotonic() - t0
        hot_ref = ray.put(hot)

        # ---- pass B: triples -> salted shuffle -> shards ----------------
        t0 = time.monotonic()
        id_space_max = max(stats["max_doc_id"], 0)
        ds = read_corpus(corpus_paths, spec, with_meta=False)
        triples = ds.map_batches(TripleEmitter, batch_format="pyarrow",
                                 batch_size=cfg.tokenize_batch_size,
                                 concurrency=(1, pool),
                                 fn_constructor_kwargs=dict(
                                     spec=spec,
                                     token_split_pattern=cfg.token_split_pattern))
        keyed = triples.map_batches(AssignShard, batch_format="pyarrow",
                                    batch_size=cfg.triple_batch_size,
                                    concurrency=(1, pool),
                                    fn_constructor_kwargs=dict(
                                        hot_ref=hot_ref, num_partitions=P,
                                        id_space_max=id_space_max,
                                        done_pkeys=frozenset(done)))
        runs = keyed.groupby("gkey").map_groups(
            make_encode_runs(stats["avgdl"], cfg.bm25.k1, cfg.bm25.b,
                             cfg.block_size),
            batch_format="pyarrow")
        merged = runs.groupby("pkey").map_groups(
            make_merge_and_write(index_dir, fingerprint),
            batch_format="pyarrow")
        part_rows = merged.take_all()   # <= P tiny rows
        t_build = time.monotonic() - t0

        # empty partitions (no terms hash there) still get a checkpoint record
        built = {int(r["partition_id"]) for r in part_rows} | done
        for pid in range(P):
            if pid not in built:
                ckpt.write_record(index_dir, ckpt.PartitionRecord(
                    partition_id=pid, input_fingerprint=fingerprint,
                    output_path="", n_terms=0, n_postings=0,
                    build_wall_s=0.0, status="done"))

    # ---- commit stats manifest -----------------------------------------
    ckpt.write_stats(index_dir, {
        **stats,
        "num_partitions": P,
        "config": cfg.to_dict(),
        "hot_terms": hot,
        "spec": {"content_col": spec.content_col, "id_col": spec.id_col,
                 "key_cols": list(spec.key_cols), "meta_cols": list(spec.meta_cols)},
    })
    wall = time.monotonic() - t_start
    n_docs = stats["n_docs"]
    return {
        "n_docs": n_docs, "total_tokens": stats["total_tokens"],
        "avgdl": stats["avgdl"], "fingerprint": fingerprint,
        "num_partitions": P, "n_hot_terms": len(hot),
        "resumed_partitions": len(done),
        "wall_s": wall, "docstore_s": t_docstore, "stats_s": t_stats,
        "hot_detect_s": t_hot, "postings_s": t_build,
        "files_per_sec": n_docs / wall if wall > 0 else 0.0,
    }
