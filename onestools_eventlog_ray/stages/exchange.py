"""Explicit partition exchange for the posting build — the raw-Ray
escape hatch.

Pass B's wide operation is a *partition exchange on a small integer
key*, not an ordering problem: ``encode_runs`` re-sorts every group by
``(term, salt, doc_id)`` anyway, so the sort Ray Data's
``groupby().map_groups`` performs is redundant work, and its
CPU-count-independent overhead (boundary sampling + two barriers +
chunk-metadata bookkeeping) measured ~9 s per pass regardless of 8 or
32 CPUs — the strong-scaling ceiling of the Dataset path.

This module implements the same dataflow as a textbook two-level
map/reduce exchange with raw ``@ray.remote`` tasks (the documented
last-resort of the build guidelines — used ONLY here, where the Dataset
API's implementation was measured inadequate; everything else in the
engine stays on the Dataset API):

    corpus block --(task: tokenize+assign+split by gkey)--> G sub-tables
    gkey g       --(task: concat + lexsort + encode runs,
                     split runs by pkey)-->                 P sub-tables
    pkey p       --(task: concat + splice salted runs +
                     write shard + checkpoint record)-->    manifest row

Partitioning assumptions (document per guidelines): ``gkey``/``pkey``
are blake2b-hash partitions in [0, P); hot terms are doc_id-RANGE
salted so a term's runs concatenate sorted (see stages/postings.py).
Output equivalence with the Dataset path is asserted in
tests/test_exchange.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from onestools_eventlog_ray.stages import postings as post_mod
from onestools_eventlog_ray.stages.tokenize import emit_triples


def _split_by_key(table: pa.Table, key: str, num_partitions: int) -> list[pa.Table]:
    """Split one table into ``num_partitions`` sub-tables by an int key
    column — one pass: sort indices by key, slice at boundaries."""
    if table.num_rows == 0:
        return [table] * num_partitions
    keys = table[key].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(keys, kind="stable")
    sorted_keys = keys[order]
    bounds = np.searchsorted(sorted_keys, np.arange(num_partitions + 1))
    taken = table.take(pa.array(order))
    return [taken.slice(int(bounds[g]), int(bounds[g + 1] - bounds[g]))
            for g in range(num_partitions)]


@ray.remote
def _map_partition(spec, pattern: str, hot: dict[str, int],
                   num_partitions: int, num_groups: int, id_space_max: int,
                   done_pkeys: frozenset, *blocks: pa.Table) -> list[pa.Table]:
    """corpus blocks -> triples -> keys -> ``num_groups`` sub-tables.

    The build-group fan ``num_groups`` is independent of the shard count
    P: groups only need to (a) outnumber the CPUs and (b) bound group
    size; using ~2xCPUs instead of P cuts the exchange's small-object
    count (tasks x returns) at low CPU counts."""
    keyed_parts = []
    for block in blocks:
        triples = emit_triples(block, spec=spec, token_split_pattern=pattern)
        if triples.num_rows == 0:
            continue
        term_col = triples["term"]
        if isinstance(term_col, pa.ChunkedArray):
            term_col = term_col.combine_chunks()
        d = term_col.dictionary_encode()
        idx = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        doc_ids = triples["doc_id"].to_numpy(zero_copy_only=False)
        pkey, _salt, gkey = post_mod.compute_keys(
            d.dictionary.to_pylist(), idx, doc_ids.astype(np.int64),
            hot, num_partitions, id_space_max)
        keep = ~np.isin(pkey, np.fromiter(done_pkeys, dtype=np.int32)) \
            if done_pkeys else None
        # slim exchange payload: dictionary-encoded term + the three data
        # columns; pkey/salt are recomputed at the encode side (cheaper to
        # recompute per unique term than to ship 12 bytes per row)
        slim = pa.table({
            "term": d,
            "doc_id": triples["doc_id"],
            "tf": triples["tf"],
            "dl": triples["dl"],
            "gkey": pa.array(gkey % num_groups, pa.int32()),
        })
        if keep is not None:
            slim = slim.filter(pa.array(keep))
        keyed_parts.append(slim)
    if not keyed_parts:
        empty = pa.table({
            "term": pa.array([], pa.string()).dictionary_encode(),
            "doc_id": pa.array([], pa.int64()),
            "tf": pa.array([], pa.int32()),
            "dl": pa.array([], pa.int32()),
            "gkey": pa.array([], pa.int32()),
        })
        return [empty.drop_columns(["gkey"])] * num_groups
    keyed = pa.concat_tables(keyed_parts, promote_options="default") \
        if len(keyed_parts) > 1 else keyed_parts[0]
    parts = _split_by_key(keyed, "gkey", num_groups)
    return [p.drop_columns(["gkey"]) for p in parts]


@ray.remote
def _encode_partition(avgdl: float, k1: float, b: float, block_size: int,
                      num_partitions: int, hot: dict[str, int],
                      id_space_max: int, *parts: pa.Table) -> list[pa.Table]:
    """all of one gkey's triples -> encoded (term, salt) runs -> P
    sub-tables of runs (one per pkey) for the merge exchange.

    Rebuilds the (pkey, salt) columns the run encoder expects from the
    slim exchange payload (term dictionary + doc_id)."""
    parts = [p for p in parts if p.num_rows]
    if not parts:
        empty = post_mod.RUN_SCHEMA.empty_table()
        return [empty] * num_partitions
    group = pa.concat_tables(parts, promote_options="default").combine_chunks()
    term_col = group["term"]
    if isinstance(term_col, pa.ChunkedArray):
        term_col = term_col.combine_chunks()
    if pa.types.is_dictionary(term_col.type):
        term_plain = term_col.cast(pa.string())
    else:
        term_plain = term_col
    d = term_plain.dictionary_encode()
    idx = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    doc_ids = group["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    pkey, salt, _gkey = post_mod.compute_keys(
        d.dictionary.to_pylist(), idx, doc_ids, hot,
        num_partitions, id_space_max)
    full = pa.table({
        "term": term_plain,
        "doc_id": group["doc_id"],
        "tf": group["tf"],
        "dl": group["dl"],
        "pkey": pa.array(pkey, pa.int32()),
        "salt": pa.array(salt, pa.int32()),
    })
    runs = post_mod.make_encode_runs(avgdl, k1, b, block_size)(full)
    return _split_by_key(runs, "pkey", num_partitions)


@ray.remote
def _merge_partition(index_dir: str, fingerprint: str,
                     *parts: pa.Table) -> dict:
    """all of one pkey's runs -> spliced postings -> shard + checkpoint."""
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return {}
    group = pa.concat_tables(parts).combine_chunks()
    out = post_mod.make_merge_and_write(index_dir, fingerprint)(group)
    return out.to_pylist()[0]


def build_postings_exchange(corpus_ds, spec, cfg, stats: dict,
                            hot: dict[str, int], index_dir: str,
                            done_pkeys: frozenset) -> list[dict]:
    """Run pass B via the explicit exchange.  ``corpus_ds`` is the
    column-pruned corpus Dataset; its blocks are consumed as object refs
    (zero extra copy — the read stage still streams through Ray Data).
    Returns the per-partition manifest rows."""
    P = cfg.num_partitions
    ncpu = int(ray.cluster_resources().get("CPU", 4))
    G = int(min(P, max(8, 2 * ncpu)))     # build-group fan (see _map_partition)

    # Stream the (lazy) column-pruned read: only block REFS reach the
    # driver, and map tasks launch as soon as their blocks exist, so the
    # read and the tokenize/partition phase overlap.
    map_out = []
    pending: list = []
    for bundle in corpus_ds.iter_internal_ref_bundles():
        pending.extend(bundle.block_refs)
        while len(pending) >= 2:
            map_out.append(_map_partition.options(num_returns=G).remote(
                spec, cfg.token_split_pattern, hot, P, G,
                stats["max_doc_id"], done_pkeys, *pending[:2]))
            pending = pending[2:]
    if pending:
        map_out.append(_map_partition.options(num_returns=G).remote(
            spec, cfg.token_split_pattern, hot, P, G,
            stats["max_doc_id"], done_pkeys, *pending))

    # transpose: encode task g consumes column g of the map outputs
    enc_out = [
        _encode_partition.options(num_returns=P).remote(
            stats["avgdl"], cfg.bm25.k1, cfg.bm25.b, cfg.block_size, P,
            hot, stats["max_doc_id"], *[m[g] for m in map_out])
        for g in range(G)
    ]
    merge_refs = [
        _merge_partition.remote(index_dir, stats["fingerprint"],
                                *[e[p] for e in enc_out])
        for p in range(P) if p not in done_pkeys
    ]
    rows = ray.get(merge_refs)
    return [r for r in rows if r]
