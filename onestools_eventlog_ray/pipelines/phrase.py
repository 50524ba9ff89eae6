"""Positional (phrase) index — the ES ``text``-field phrase-match
capability the round-1 engine lacked (reference surface:
``ElasticSearchStorage.cs:217-236`` — ES analyzed fields store positions
and support match_phrase; SURVEY.md §2.7 K5 family).

Design: a POSITIONS SIDECAR next to the BM25 index rather than a codec
change — per (term, doc) the token positions are stored as a parquet
``list<int32>`` column in term-hash-partitioned shard files:

    tokenize -> Acero group_by(doc, term) with a "list" aggregate on
    the token position -> groupby(pkey = blake2b(term) % P)
    -> map_groups: sort (term, doc_id), write pos-{pkey}.parquet

Phrase query = the classic positional intersection: S = pos(t_0);
S = (S + 1) ∩ pos(t_i) for each following term; |S| = occurrence count.
A query touches ONLY the shards its terms hash to (same pruning rule as
the BM25 shards), with a parquet ``term IN`` row filter.

Scale shape: the shuffle payload is (term, doc_id, positions) — heavier
than the BM25 triple shuffle by the positions column, which is why this
is an OPT-IN second pass instead of baggage on every build.  Everything
streams; shards are immutable and atomically written.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from onestools_eventlog_ray.config import EngineConfig
from onestools_eventlog_ray.functions.analyzer import tokenize_array
from onestools_eventlog_ray.functions.hashing import (term_partition,
                                                      term_partition_one)
from onestools_eventlog_ray.sources.corpus import (CorpusSpec,
                                                   CODE_CORPUS_SPEC,
                                                   read_corpus)
from onestools_eventlog_ray.stages.normalize import add_doc_id
from onestools_eventlog_ray.state.checkpoint import atomic_write_bytes


def emit_positions(batch: pa.Table, *, spec: CorpusSpec,
                   num_partitions: int) -> pa.Table:
    """corpus batch -> (pkey, term, doc_id, positions) rows, one per
    (doc, term).  Positions are 0-based token indices; the per-group
    list aggregation happens inside Arrow's Acero (no Python rows)."""
    from onestools_eventlog_ray.functions.runtime import pin_worker_threads
    pin_worker_threads()
    b = add_doc_id(batch, spec)
    toks = tokenize_array(b["content"])
    flat = toks.flatten()
    parents = pc.list_parent_indices(toks)
    offsets = np.asarray(toks.offsets.to_numpy(zero_copy_only=False),
                         dtype=np.int64)
    par_np = parents.to_numpy(zero_copy_only=False).astype(np.int64)
    pos = (np.arange(par_np.size, dtype=np.int64)
           - offsets[:-1][par_np]).astype(np.int32)
    pairs = pa.table({"parent": parents, "term": flat,
                      "pos": pa.array(pos, pa.int32())})
    agg = pairs.group_by(["parent", "term"]).aggregate([("pos", "list")])
    doc_ids = pc.take(b["doc_id"], agg["parent"])
    term_col = agg["term"]
    if isinstance(term_col, pa.ChunkedArray):
        term_col = term_col.combine_chunks()
    d = term_col.dictionary_encode()
    idx = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    pkey = term_partition(d.dictionary.to_pylist(), num_partitions)[idx]
    return pa.table({
        "pkey": pa.array(pkey.astype(np.int32), pa.int32()),
        "term": term_col,
        "doc_id": doc_ids,
        "positions": agg["pos_list"],
    })


def _write_pos_shard(index_dir: str):
    def fn(group: pa.Table) -> pa.Table:
        pkey = int(group["pkey"][0].as_py())
        group = group.sort_by([("term", "ascending"), ("doc_id", "ascending")])
        path = os.path.join(index_dir, "positions", f"pos-{pkey:05d}.parquet")
        atomic_write_bytes(path, lambda tmp: pq.write_table(
            group.drop_columns(["pkey"]), tmp))
        return pa.table({"pkey": pa.array([pkey], pa.int64()),
                         "n_rows": pa.array([group.num_rows], pa.int64())})
    return fn


def build_position_index(corpus_paths, index_dir: str,
                         spec: CorpusSpec = CODE_CORPUS_SPEC,
                         cfg: EngineConfig = EngineConfig()) -> dict:
    """Build the positions sidecar under ``<index_dir>/positions``."""
    import json
    ds = read_corpus(corpus_paths, spec, with_meta=False)
    rows = ds.map_batches(emit_positions, batch_format="pyarrow",
                          fn_kwargs=dict(spec=spec,
                                         num_partitions=cfg.num_partitions)) \
        .groupby("pkey").map_groups(_write_pos_shard(index_dir),
                                    batch_format="pyarrow").take_all()
    meta = {"num_partitions": cfg.num_partitions, "n_shards": len(rows),
            "n_rows": int(sum(r["n_rows"] for r in rows))}
    atomic_write_bytes(os.path.join(index_dir, "positions", "_meta.json"),
                       lambda tmp: open(tmp, "w").write(json.dumps(meta)))
    return meta


class PhraseEngine:
    """Phrase matching over the positions sidecar (shard-pruned reads)."""

    def __init__(self, index_dir: str, num_partitions: int | None = None):
        import glob
        import json
        from onestools_eventlog_ray.state import checkpoint as ckpt
        self.pos_dir = os.path.join(index_dir, "positions")
        # when the sidecar lives next to a BM25 index, enforce the same
        # layout-version gate as SearchEngine (round-2 ADVICE)
        if os.path.exists(ckpt.stats_path(index_dir)):
            ckpt.check_layout(ckpt.read_stats(index_dir), index_dir)
        if num_partitions is None:
            # the positions sidecar records ITS OWN partition count —
            # it may differ from the BM25 index's
            meta_path = os.path.join(self.pos_dir, "_meta.json")
            if os.path.exists(meta_path):
                with open(meta_path) as f:
                    num_partitions = json.load(f)["num_partitions"]
            else:
                shards = glob.glob(os.path.join(self.pos_dir,
                                                "pos-*.parquet"))
                if not shards:
                    raise FileNotFoundError(
                        f"no position shards in {self.pos_dir}")
                num_partitions = max(int(os.path.basename(s)[4:9])
                                     for s in shards) + 1
        self.P = int(num_partitions)

    def _load(self, terms: list[str]) -> dict[str, dict[int, np.ndarray]]:
        """term -> {doc_id -> sorted int32 positions} (pruned shard reads)."""
        by_shard: dict[int, list[str]] = {}
        for t in terms:
            by_shard.setdefault(term_partition_one(t, self.P), []).append(t)
        out: dict[str, dict[int, np.ndarray]] = {t: {} for t in terms}
        for pkey, ts in by_shard.items():
            path = os.path.join(self.pos_dir, f"pos-{pkey:05d}.parquet")
            if not os.path.exists(path):
                continue
            tbl = pq.read_table(path, filters=[("term", "in", ts)])
            for term, doc, posl in zip(tbl["term"].to_pylist(),
                                       tbl["doc_id"].to_pylist(),
                                       tbl["positions"].to_pylist()):
                out[term][int(doc)] = np.asarray(posl, dtype=np.int64)
        return out

    def search_phrase(self, phrase_terms: list[str]) -> list[tuple[int, int]]:
        """-> [(doc_id, n_matches)] for docs containing the EXACT token
        sequence, (n_matches desc, doc_id asc).  Classic positional
        intersection: S = pos(t0); S = (S+1) ∩ pos(t_i)."""
        if not phrase_terms:
            return []
        loaded = self._load(phrase_terms)
        first = loaded[phrase_terms[0]]
        cands = set(first)
        for t in phrase_terms[1:]:
            cands &= set(loaded[t])
        hits: list[tuple[int, int]] = []
        for doc in cands:
            s = first[doc]
            for t in phrase_terms[1:]:
                if s.size == 0:
                    break
                s = s[np.isin(s + 1, loaded[t][doc])] + 1
            if s.size:
                hits.append((doc, int(s.size)))
        hits.sort(key=lambda h: (-h[1], h[0]))
        return hits
