"""Posting-build stages: shard/salt assignment, run encoding, salted-run merge.

THE wide operation of the engine (SURVEY.md §2.6 A1, §7.3): the
``groupby`` that co-locates each term's (doc_id, tf, dl) rows.  Zipf-hot
terms (``def``, ``the``, license boilerplate) have df ≈ N, so a naive
``groupby(term)`` would put a whole-corpus-sized group on one task — the
skew called out by the north_rule.  Handling:

- every triple gets ``pkey = blake2b(term) % P`` (its final shard);
- a HOT term (estimated df > salt_threshold) is additionally split into
  ``n_salts`` runs by **doc_id range** (``salt = doc_id // range_width``)
  and its build-group key ``gkey`` becomes ``hash(term, salt) % G`` so
  the runs land on different tasks;
- each run is encoded independently into the block codec; because salts
  are doc_id RANGES, a term's runs cover disjoint ascending id ranges,
  so the final merge (grouped by ``pkey``) is a header splice
  (``codec.concat_postings``) — no decode/re-encode of hot terms.

Equivalence of salted and unsalted builds is property-tested
(tests/test_salt_equivalence.py).
"""

from __future__ import annotations

import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from onestools_eventlog_ray.functions import codec
from onestools_eventlog_ray.functions.hashing import term_partition
from onestools_eventlog_ray.state import checkpoint as ckpt

RUN_SCHEMA = pa.schema([
    ("pkey", pa.int32()),
    ("term", pa.string()),
    ("salt", pa.int32()),
    ("df_run", pa.int64()),
    ("cf_run", pa.int64()),
    ("blob", pa.large_binary()),
])


def compute_keys(uniq: list[str], idx: np.ndarray, doc_ids: np.ndarray,
                 hot: dict[str, int], P: int, id_space_max: int
                 ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Shared key computation: per-row (pkey, salt, gkey) from the batch's
    dictionary-encoded terms.  pkey = blake2b(term) % P; hot terms get a
    doc_id-RANGE salt and gkey = blake2b(term#salt) % P so their runs
    build on different tasks (cold terms: salt 0, gkey == pkey)."""
    upkey = term_partition(uniq, P)
    pkey = upkey[idx].astype(np.int32)
    salt = np.zeros(idx.size, dtype=np.int32)
    gkey = pkey.copy()
    if hot:
        width_cache: dict[int, int] = {}
        for u_i, t in enumerate(uniq):
            s = hot.get(t)
            if not s or s <= 1:
                continue
            rows = np.flatnonzero(idx == u_i)
            width = width_cache.setdefault(s, (max(id_space_max, 0) // s) + 1)
            tsalt = (doc_ids[rows] // width).astype(np.int32)
            salt[rows] = tsalt
            usalts = np.unique(tsalt)
            gk = term_partition([f"{t}#{v}" for v in usalts], P)
            gkey[rows] = gk[np.searchsorted(usalts, tsalt)].astype(np.int32)
    return pkey, salt, gkey


class AssignShard:
    """triples -> triples + (pkey, salt, gkey).

    Stateful actor-pool stage: the hot-term map ``{term: n_salts}`` is
    broadcast once via ``ray.put`` and fetched once per actor in
    ``__init__`` (broadcast-small-side lookup — the J1 pattern,
    ``/root/reference/OneSTools.EventLog/LgfReader.cs:102-115``), never
    re-shipped per batch.  Term hashing runs over the batch's UNIQUE
    terms via dictionary encoding, not per row.
    """

    def __init__(self, hot_ref, num_partitions: int, id_space_max: int,
                 done_pkeys: frozenset[int] = frozenset()):
        import ray
        self.hot: dict[str, int] = ray.get(hot_ref) if hot_ref is not None else {}
        self.P = num_partitions
        self.id_space_max = max(int(id_space_max), 0)
        self.done = done_pkeys

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("pkey", pa.array([], pa.int32())) \
                        .append_column("salt", pa.array([], pa.int32())) \
                        .append_column("gkey", pa.array([], pa.int32()))
        term_col = batch["term"]
        if isinstance(term_col, pa.ChunkedArray):
            term_col = term_col.combine_chunks()
        dict_arr = term_col.dictionary_encode()
        uniq = dict_arr.dictionary.to_pylist()
        idx = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        pkey, salt, gkey = compute_keys(uniq, idx, doc_ids, self.hot,
                                        self.P, self.id_space_max)
        out = batch.append_column("pkey", pa.array(pkey, pa.int32())) \
                   .append_column("salt", pa.array(salt, pa.int32())) \
                   .append_column("gkey", pa.array(gkey, pa.int32()))
        if self.done:
            keep = ~np.isin(pkey, np.fromiter(self.done, dtype=np.int32))
            out = out.filter(pa.array(keep))
        return out


def assign_shard(batch: pa.Table, *, hot_ref, num_partitions: int,
                 id_space_max: int, done_pkeys: frozenset[int]) -> pa.Table:
    """Stateless-task form of :class:`AssignShard`: the broadcast hot map
    is a ``ray.put`` ref fetched with a local object-store hit per task
    (cached in the worker's plasma client after the first fetch)."""
    import ray
    hot = ray.get(hot_ref) if hot_ref is not None else {}
    stage = AssignShard.__new__(AssignShard)
    stage.hot = hot
    stage.P = num_partitions
    stage.id_space_max = max(int(id_space_max), 0)
    stage.done = done_pkeys
    return stage(batch)


def make_encode_runs(block_size: int):
    """map_groups(fn) over ``gkey``: encode every (term, salt) run in the
    group.  Codec v3 stores (max_tf, min_dl) block bounds, so encoding
    needs NO corpus stats — encode tasks never wait on the stats fold."""

    def encode_runs(group: pa.Table) -> pa.Table:
        from onestools_eventlog_ray.functions.runtime import \
            pin_worker_threads
        pin_worker_threads()
        n = group.num_rows
        if n == 0:
            return RUN_SCHEMA.empty_table()
        term_col = group["term"]
        if isinstance(term_col, pa.ChunkedArray):
            term_col = term_col.combine_chunks()
        d = term_col.dictionary_encode()
        tidx = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        terms = d.dictionary.to_pylist()
        doc_ids = group["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        tfs = group["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
        dls = group["dl"].to_numpy(zero_copy_only=False).astype(np.int64)
        salts = group["salt"].to_numpy(zero_copy_only=False).astype(np.int64)
        pkeys = group["pkey"].to_numpy(zero_copy_only=False).astype(np.int64)

        order = np.lexsort((doc_ids, salts, tidx))
        tidx, doc_ids, tfs, dls, salts, pkeys = \
            (a[order] for a in (tidx, doc_ids, tfs, dls, salts, pkeys))
        # run boundaries on (term, salt)
        change = np.empty(tidx.size, dtype=bool)
        change[0] = True
        np.logical_or(np.diff(tidx) != 0, np.diff(salts) != 0, out=change[1:])
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], tidx.size)

        blobs = codec.encode_run_group(starts, doc_ids, tfs, dls, block_size)
        return pa.table({
            "pkey": pa.array(pkeys[starts].astype(np.int32), pa.int32()),
            "term": pa.array([terms[i] for i in tidx[starts]], pa.string()),
            "salt": pa.array(salts[starts].astype(np.int32), pa.int32()),
            "df_run": pa.array((ends - starts).astype(np.int64), pa.int64()),
            "cf_run": pa.array(np.add.reduceat(tfs, starts).astype(np.int64),
                               pa.int64()),
            "blob": pa.array(blobs, pa.large_binary()),
        }, schema=RUN_SCHEMA)

    return encode_runs


def make_merge_and_write(index_dir: str, fingerprint: str,
                         reencode_block_size: int | None = None):
    """map_groups(fn) over ``pkey``: splice each term's salted runs into one
    posting, write the shard parquet atomically, emit the checkpoint
    record (lineage + metrics) for the partition.

    ``reencode_block_size`` enables re-encoding a term's runs into one
    fresh posting when the term is SMALL but fragmented (metadata bloat
    from universal fixed-range salting: min(df, S) runs each with their
    own block headers); large terms still merge by zero-copy header
    splice."""

    def merge_and_write(group: pa.Table) -> pa.Table:
        from onestools_eventlog_ray.functions.runtime import \
            pin_worker_threads
        pin_worker_threads()
        t0 = time.monotonic()
        pkey = int(group["pkey"][0].as_py())
        term_col = group["term"]
        if isinstance(term_col, pa.ChunkedArray):
            term_col = term_col.combine_chunks()
        d = term_col.dictionary_encode()
        tidx = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        terms = d.dictionary.to_pylist()
        salts = group["salt"].to_numpy(zero_copy_only=False).astype(np.int64)
        dfr = group["df_run"].to_numpy(zero_copy_only=False)
        cfr = group["cf_run"].to_numpy(zero_copy_only=False)
        blobs = group["blob"].to_pylist()

        order = np.lexsort((salts, tidx))
        change = np.empty(tidx.size, dtype=bool)
        if tidx.size:
            change[0] = True
            change[1:] = np.diff(tidx[order]) != 0
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], tidx.size)

        out_terms, out_df, out_cf = [], [], []
        out_blob: list[bytes | None] = []
        re_idx: list[int] = []          # positions to fill from the batch re-encode
        re_ids, re_tfs, re_dls, re_starts = [], [], [], []
        re_pos = 0
        for s, e in zip(starts, ends):
            rows = order[s:e]
            df_total = int(dfr[rows].sum())
            out_terms.append(terms[tidx[rows[0]]])
            out_df.append(df_total)
            out_cf.append(int(cfr[rows].sum()))
            run_blobs = [blobs[r] for r in rows]
            if (reencode_block_size is not None and len(run_blobs) > 1
                    and df_total < 64 * reencode_block_size):
                # small fragmented posting (universal range salting):
                # queue it for ONE batched vectorized re-encode below
                ps = [codec.decode_posting(rb) for rb in run_blobs]
                ids = np.concatenate([p.doc_ids for p in ps])
                o = np.argsort(ids, kind="stable")
                re_ids.append(ids[o])
                re_tfs.append(np.concatenate([p.tfs for p in ps])[o])
                re_dls.append(np.concatenate([p.dls for p in ps])[o])
                re_starts.append(re_pos)
                re_pos += ids.size
                re_idx.append(len(out_blob))
                out_blob.append(None)
            else:
                # salts ascending == doc_id ranges ascending -> header splice
                out_blob.append(codec.concat_postings(run_blobs))
        if re_idx:
            rebuilt = codec.encode_run_group(
                np.asarray(re_starts, dtype=np.int64),
                np.concatenate(re_ids), np.concatenate(re_tfs),
                np.concatenate(re_dls), reencode_block_size)
            for pos, blob in zip(re_idx, rebuilt):
                out_blob[pos] = blob

        torder = np.argsort(np.asarray(out_terms, dtype=object), kind="stable")
        shard = pa.table({
            "term": pa.array([out_terms[i] for i in torder], pa.string()),
            "df": pa.array([out_df[i] for i in torder], pa.int64()),
            "cf": pa.array([out_cf[i] for i in torder], pa.int64()),
            "posting": pa.array([out_blob[i] for i in torder], pa.large_binary()),
        })
        shard_path = os.path.join(index_dir, "shards", f"part-{pkey:05d}.parquet")
        ckpt.atomic_write_bytes(shard_path, lambda tmp: pq.write_table(shard, tmp))
        rec = ckpt.PartitionRecord(
            partition_id=pkey, input_fingerprint=fingerprint,
            output_path=shard_path, n_terms=shard.num_rows,
            n_postings=int(sum(out_df)),
            build_wall_s=time.monotonic() - t0, status="done")
        ckpt.write_record(index_dir, rec)
        return pa.table({
            "partition_id": pa.array([pkey], pa.int64()),
            "n_terms": pa.array([shard.num_rows], pa.int64()),
            "n_postings": pa.array([rec.n_postings], pa.int64()),
            "build_wall_s": pa.array([rec.build_wall_s], pa.float64()),
        })

    return merge_and_write
