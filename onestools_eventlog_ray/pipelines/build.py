"""Index build pipeline — the engine's equivalent of the reference's
export lifecycle (``/root/reference/OneSTools.EventLog.Exporter.Core/EventLogExporter.cs:96-156``):

    read_parquet(corpus)
      -> map_batches(DocstoreSink)  [docstore part files + sha256 +
            per-batch stats/hot-candidate partials — fused sink]   pass A
    fold partials -> N, avgdl, fingerprint, hot-term salt fan-out
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

import ray
import ray.data

from onestools_eventlog_ray.config import EngineConfig
from onestools_eventlog_ray.sources.corpus import CorpusSpec, CODE_CORPUS_SPEC, read_corpus
from onestools_eventlog_ray.stages.normalize import docstore_sink
from onestools_eventlog_ray.stages.tokenize import emit_triples
from onestools_eventlog_ray.stages.postings import (assign_shard, make_encode_runs,
                                                    make_merge_and_write)
from onestools_eventlog_ray.stages import stats as stats_mod
from onestools_eventlog_ray.state import checkpoint as ckpt


#: canonical definition lives in state/checkpoint.py (stamped into every
#: stats manifest and validated by every reader); re-exported here for
#: the docstore marker and external callers.
LAYOUT_VERSION = ckpt.LAYOUT_VERSION


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


def _estimate_corpus_rows(corpus_paths, max_footers: int = 256) -> int | None:
    """Metadata-only row estimate for salt-fan-out sizing: sample up to
    ``max_footers`` parquet footers evenly and extrapolate by file count.
    Never reads data pages; returns None when the corpus isn't local
    parquet files (jsonl, globs we can't enumerate).  Only used to pick
    the salt fan-out, where a 2x error is harmless (any fan-out is
    correct — tests/test_salt_equivalence)."""
    import pyarrow.parquet as pq
    paths = [corpus_paths] if isinstance(corpus_paths, str) else list(corpus_paths)
    files: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            for name in sorted(os.listdir(p)):
                if name.endswith((".parquet", ".pq")):
                    files.append(os.path.join(p, name))
        elif os.path.isfile(p) and p.endswith((".parquet", ".pq")):
            files.append(p)
        else:
            return None
    if not files:
        return None
    step = max(1, len(files) // max_footers)
    sample = files[::step][:max_footers]
    try:
        rows = sum(pq.ParquetFile(f).metadata.num_rows for f in sample)
    except Exception:
        return None
    return int(rows * (len(files) / len(sample)))


def build_index(corpus_paths, index_dir: str,
                spec: CorpusSpec = CODE_CORPUS_SPEC,
                cfg: EngineConfig = EngineConfig(),
                hot_terms: dict[str, int] | None = None,
                exclude_doc_ids=None,
                row_filter=None, row_filter_sig: str = "",
                corpus_fmt: str = "parquet") -> dict:
    """Build (or resume) the full-text index. Returns a build report dict.

    ``exclude_doc_ids``: optional id array dropped AT THE READ (parquet
    filter pushdown) — the physical-delete path compaction uses to drop
    tombstoned documents.  Requires ``spec.id_col`` (a pre-existing id
    column the reader can filter on).

    ``row_filter``: optional ``pyarrow.dataset`` Expression pushed to the
    corpus read (the ES ``_reindex``-with-query path); callers MUST pass
    a stable ``row_filter_sig`` describing it, since Expressions have no
    canonical serialization — the signature keys the resume marker so a
    rebuilt filter invalidates stale docstores."""
    t_start = time.monotonic()
    os.makedirs(index_dir, exist_ok=True)

    read_kwargs: dict = {}
    excl_sig = ""
    if corpus_fmt != "parquet":
        # jsonl etc. have no pushdown layer; filters require parquet
        if row_filter is not None or exclude_doc_ids is not None:
            raise ValueError("row_filter/exclude_doc_ids require a "
                             "parquet corpus (pushdown)")
        read_kwargs["fmt"] = corpus_fmt
        excl_sig = f" fmt={corpus_fmt}"
    if row_filter is not None:
        if not row_filter_sig:
            raise ValueError("row_filter requires row_filter_sig")
        read_kwargs["filter"] = row_filter
        excl_sig = f" flt={row_filter_sig}"
        # fail loudly on an all-filtered corpus: Ray yields SCHEMA-LESS
        # empty blocks for fully-pruned reads, which would crash deep in
        # the map pass with an opaque KeyError; an empty index is also
        # semantically broken (avgdl/idf undefined)
        import ray.data as _rd
        probe = _rd.read_parquet(corpus_paths,
                                 columns=spec.read_cols(with_content=False),
                                 filter=row_filter).limit(1).take_all()
        if not probe:
            raise ValueError(
                f"row_filter {row_filter_sig!r} matches no documents; "
                "refusing to build an empty index")
    if exclude_doc_ids is not None:
        import numpy as np
        excl = np.unique(np.asarray(list(exclude_doc_ids), dtype=np.int64))
        if excl.size:
            if not spec.id_col:
                raise ValueError("exclude_doc_ids requires a CorpusSpec "
                                 "with a pre-existing id column")
            import pyarrow.dataset as pads
            not_deleted = ~pads.field(spec.id_col).isin(excl.tolist())
            read_kwargs["filter"] = (read_kwargs["filter"] & not_deleted
                                     if "filter" in read_kwargs
                                     else not_deleted)
            import hashlib
            excl_sig += " excl=" + hashlib.blake2b(
                excl.tobytes(), digest_size=8).hexdigest()

    # ---- pass A: docstore + per-row invariants --------------------------
    dstore = docstore_path(index_dir)
    # the marker makes a completed docstore pass skippable on resume,
    # like the reference skipping already-exported positions
    done_marker = os.path.join(dstore, "_DOCSTORE_DONE")
    marker_text = (f"layout={LAYOUT_VERSION} "
                   f"pattern={cfg.token_split_pattern} "
                   f"store_content={cfg.store_content} "
                   f"input={_input_signature(corpus_paths)}{excl_sig}")
    reuse_docstore = (os.path.exists(done_marker)
                      and open(done_marker).read() == marker_text)
    t0 = time.monotonic()
    df_est: dict[str, int] = {}
    P = cfg.num_partitions

    # ---- single-pass combined build (exchange impl, full builds) --------
    # ONE corpus read produces docstore + stats + shards; skew handled by
    # prepass-free fixed-range salting (stages/exchange.py).  Resume and
    # non-exchange impls take the two-pass path below.
    if not reuse_docstore:
        # No (valid) docstore marker means this is a FULL (re)build of a
        # new/changed corpus: any surviving shards/ + manifest/ belong to
        # the previous corpus.  Wipe them, or partitions that are empty
        # in the new build would leave stale shard files that
        # SearchEngine.load_terms still reads (round-1 ADVICE, medium:
        # queries returned doc_ids of deleted documents after an
        # in-place rebuild).
        # positions/ and ann/ sidecars hold doc_ids of the SAME previous
        # corpus — wipe them too, or PhraseEngine/AnnIndex serve stale
        # docs after an in-place rebuild (round-2 ADVICE, medium).
        import shutil
        for p in (os.path.join(index_dir, "shards"),
                  os.path.join(index_dir, "positions"),
                  os.path.join(index_dir, "ann"),
                  ckpt.manifest_dir(index_dir)):
            if os.path.isdir(p):
                shutil.rmtree(p)

    if (not reuse_docstore and cfg.single_pass
            and cfg.postings_impl == "exchange" and hot_terms is None):
        import shutil
        from onestools_eventlog_ray.stages.exchange import \
            build_combined_exchange
        if os.path.isdir(dstore):
            shutil.rmtree(dstore)
        os.makedirs(dstore, exist_ok=True)
        ds = read_corpus(corpus_paths, spec, **read_kwargs)
        n_est = (_estimate_corpus_rows(corpus_paths)
                 if corpus_fmt == "parquet" else None)
        part_rows, stats = build_combined_exchange(ds, spec, cfg,
                                                   index_dir, dstore,
                                                   n_docs_est=n_est)
        fingerprint = stats["fingerprint"]
        built = {int(r["partition_id"]) for r in part_rows}
        for pid in range(P):
            if pid not in built:
                ckpt.write_record(index_dir, ckpt.PartitionRecord(
                    partition_id=pid, input_fingerprint=fingerprint,
                    output_path="", n_terms=0, n_postings=0,
                    build_wall_s=0.0, status="done"))
        ckpt.write_stats(index_dir, {
            **stats, "num_partitions": P, "config": cfg.to_dict(),
            "df_est_hot_candidates": {}, "hot_terms": {},
            "salting": f"fixed-range:{stats.get('salt_ranges_used', cfg.salt_ranges)}",
            "spec": {"content_col": spec.content_col, "id_col": spec.id_col,
                     "key_cols": list(spec.key_cols),
                     "meta_cols": list(spec.meta_cols)},
        })
        ckpt.atomic_write_text(done_marker, marker_text)
        wall = time.monotonic() - t_start
        n_docs = stats["n_docs"]
        return {
            "n_docs": n_docs, "total_tokens": stats["total_tokens"],
            "avgdl": stats["avgdl"], "fingerprint": fingerprint,
            "num_partitions": P, "n_hot_terms": 0,
            "resumed_partitions": 0,
            "wall_s": wall, "docstore_s": 0.0, "stats_s": 0.0,
            "hot_detect_s": 0.0, "postings_s": wall,
            "phases": stats.get("phase_wall_s", {}),
            "single_pass": True,
            "salt_ranges": stats.get("salt_ranges_used", cfg.salt_ranges),
            "files_per_sec": n_docs / wall if wall > 0 else 0.0,
        }

    if not reuse_docstore:
        # fused pass: write docstore part files + emit stats/hot partials
        # (one corpus read instead of write + stats-read + hot-sample).
        # No (valid) marker means any existing part files are leftovers of
        # an interrupted pass or a different corpus — wipe, or the rerun
        # would leave duplicate/stale docs beside the fresh files.
        import shutil
        if os.path.isdir(dstore):
            shutil.rmtree(dstore)
        os.makedirs(dstore, exist_ok=True)
        ds = read_corpus(corpus_paths, spec, **read_kwargs)
        partials = ds.map_batches(docstore_sink, batch_format="pyarrow",
                                  batch_size=cfg.tokenize_batch_size,
                                  fn_kwargs=dict(
                                      spec=spec,
                                      token_split_pattern=cfg.token_split_pattern,
                                      store_content=cfg.store_content,
                                      docstore_dir=dstore)).take_all()
        stats = stats_mod.fold_stats(partials)
        df_est = stats_mod.fold_hot_candidates(partials)
        ckpt.write_stats(index_dir, {**stats, "df_est_hot_candidates": df_est,
                                     "num_partitions": cfg.num_partitions,
                                     "config": cfg.to_dict()})
        ckpt.atomic_write_text(done_marker, marker_text)
    else:
        try:
            prior = ckpt.read_stats(index_dir)
            stats = {k: prior[k] for k in
                     ("n_docs", "total_tokens", "avgdl", "max_doc_id",
                      "fingerprint")}
            df_est = prior.get("df_est_hot_candidates", {})
        except (FileNotFoundError, KeyError):
            # docstore exists but stats manifest lost: recompute the
            # rollup from the docstore's narrow columns (same doc_id-mixed
            # rollup as the build sinks, so the fingerprint — and therefore
            # partition-record resume — survives the manifest loss), then
            # re-persist it so the next run reads instead of recomputing.
            stats = stats_mod.corpus_stats_from_docstore(dstore)
            df_est = {}
            ckpt.write_stats(index_dir, {
                **stats, "df_est_hot_candidates": df_est,
                "num_partitions": cfg.num_partitions,
                "config": cfg.to_dict()})
    fingerprint = stats["fingerprint"]
    t_docstore = time.monotonic() - t0
    t_stats = 0.0

    # ---- resume check ---------------------------------------------------
    done = ckpt.done_partitions(index_dir, fingerprint)
    done = {p for p in done if p < P}

    t_hot = t_build = 0.0
    if hot_terms is not None:
        hot = hot_terms
    else:
        # salt fan-out from the pass-A df estimates (SURVEY.md §4 'Skew')
        hot = {}
        for t, d in df_est.items():
            if d > cfg.salt_threshold:
                n_salts = min(cfg.max_salts,
                              math.ceil(d / cfg.salt_target_run))
                if n_salts > 1:
                    hot[t] = n_salts
    if len(done) < P:
        # ---- pass B: triples -> salted shuffle -> shards ----------------
        t0 = time.monotonic()
        id_space_max = max(stats["max_doc_id"], 0)
        ds = read_corpus(corpus_paths, spec, with_meta=False, **read_kwargs)
        if cfg.postings_impl == "exchange":
            from onestools_eventlog_ray.stages.exchange import \
                build_postings_exchange
            part_rows = build_postings_exchange(
                ds, spec, cfg, {**stats, "fingerprint": fingerprint},
                hot, index_dir, frozenset(done))
        else:
            hot_ref = ray.put(hot)
            triples = ds.map_batches(emit_triples, batch_format="pyarrow",
                                     batch_size=cfg.tokenize_batch_size,
                                     fn_kwargs=dict(
                                         spec=spec,
                                         token_split_pattern=cfg.token_split_pattern))
            keyed = triples.map_batches(assign_shard, batch_format="pyarrow",
                                        batch_size=cfg.triple_batch_size,
                                        fn_kwargs=dict(
                                            hot_ref=hot_ref, num_partitions=P,
                                            id_space_max=id_space_max,
                                            done_pkeys=frozenset(done)))
            runs = keyed.groupby("gkey").map_groups(
                make_encode_runs(cfg.block_size),
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
        "df_est_hot_candidates": df_est,
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
