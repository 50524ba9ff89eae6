"""Deterministic sampling pipelines — the subsetting operators a
training-data pipeline runs before expensive stages (dedup verify,
model scoring, human eval).

Sampling at 100 TB must be (a) deterministic (re-runs and resumed runs
pick the SAME sample), (b) content/order independent (no RNG state, no
``random_shuffle`` all-to-all), and (c) embarrassingly parallel.  Both
operators here key off an md5 hash of the row's primary key, so they
are pure per-batch filters — zero shuffle for the Bernoulli sample, and
a per-group top-n (partial per batch, tiny groupby of survivors) for
the stratified sample.  Mirrors the reference's deterministic
file-ordering/succession guarantees (SURVEY.md §2.7 K3) applied to row
selection.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from onestools_eventlog_ray.functions.fasthash import md5_lower64


def _key_hash63(ids: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """int64 hash of the decimal string of an id column — the same
    expression a SQL oracle writes as
    ``md5_number_lower(CAST(id AS VARCHAR)) >> 1``."""
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    strs = pc.cast(ids, pa.string())
    return (md5_lower64(strs) >> np.uint64(1)).astype(np.int64)


def sample_by_hash(ds: ray.data.Dataset, id_col: str,
                   pct: int = 10, mod: int = 100,
                   columns: tuple[str, ...] = ()) -> ray.data.Dataset:
    """Deterministic Bernoulli sample: keep rows whose key hash lands in
    the first ``pct`` of ``mod`` buckets.  -> input columns + ``bucket``.

    A pure vectorized filter — each batch is independent, nothing
    shuffles, and the SAME rows survive on any cluster size, block
    layout or retry (unlike ``Dataset.random_sample``)."""

    def fn(batch: pa.Table) -> pa.Table:
        from onestools_eventlog_ray.functions.runtime import pin_worker_threads
        pin_worker_threads()
        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        bucket = (md5_lower64(pc.cast(ids, pa.string()))
                  % np.uint64(mod)).astype(np.int64)
        keep = bucket < pct
        cols = list(columns) or [c for c in batch.column_names]
        out = batch.select(cols).filter(pa.array(keep))
        return out.append_column("bucket",
                                 pa.array(bucket[keep], pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow")


def stratified_sample(ds: ray.data.Dataset, group_col: str, id_col: str,
                      n: int = 5) -> ray.data.Dataset:
    """Deterministic per-group sample: the ``n`` rows of each group with
    the smallest (key hash, id) — i.e. ``row_number() OVER (PARTITION BY
    group ORDER BY h, id) <= n``.  -> (group, id, h).

    Scale shape: each batch keeps at most ``n`` candidates per group it
    sees (vectorized lexsort + run ranks), so the groupby that picks the
    global winners moves O(n_groups * n * n_batches) tiny rows — never
    the data."""

    def partial(batch: pa.Table) -> pa.Table:
        from onestools_eventlog_ray.functions.runtime import pin_worker_threads
        pin_worker_threads()
        h = _key_hash63(batch[id_col])
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        grp = batch[group_col]
        if isinstance(grp, pa.ChunkedArray):
            grp = grp.combine_chunks()
        codes = grp.dictionary_encode()
        gi = codes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, h, gi))
        sg = gi[order]
        new_g = np.empty(sg.size, dtype=bool)
        if sg.size:
            new_g[0] = True
            new_g[1:] = sg[1:] != sg[:-1]
        rank = np.arange(sg.size) - np.maximum.accumulate(
            np.where(new_g, np.arange(sg.size), 0))
        keep = order[rank < n]
        return pa.table({
            group_col: pc.take(grp, pa.array(keep)),
            id_col: pa.array(ids[keep], pa.int64()),
            "h": pa.array(h[keep], pa.int64()),
        })

    def final(group: pa.Table) -> pa.Table:
        t = group.sort_by([("h", "ascending"), (id_col, "ascending")])
        return t.slice(0, n)

    # The partial output is bounded (<= n rows per group per batch), so
    # coalescing it into one block before the final merge costs nothing
    # and avoids empty sort partitions (groups < partitions emits
    # schema-less empty blocks).  With a huge group count, drop the
    # repartition and let the groupby shuffle normally.
    return ds.map_batches(partial, batch_format="pyarrow") \
             .repartition(1) \
             .groupby(group_col) \
             .map_groups(final, batch_format="pyarrow")


def balanced_sample(ds: ray.data.Dataset, group_col: str, id_col: str,
                    target: int = 40) -> ray.data.Dataset:
    """Deterministic DOMAIN-BALANCING downsample: keep each row with
    probability ``target / n_group`` via the exact integer test
    ``key_hash mod n_group < target`` — the source-equalization step a
    training-data mix runs so one huge domain cannot drown the others
    (every group lands at ~``target`` rows in expectation; groups already
    at or under ``target`` keep everything, since hash mod n < n).

    Scale shape: pass 1 folds per-batch group counts to a tiny
    (group, n) table (one small groupby — group cardinality is domain
    count, not corpus size); pass 2 broadcasts that dict into a pure
    vectorized per-batch filter.  No corpus shuffle; exact integers only
    (no float rate), so the DuckDB oracle reproduces row membership
    bit-for-bit.  -> input columns, filtered."""
    from ray.data.aggregate import Sum

    def count_partial(batch: pa.Table) -> pa.Table:
        g = batch[group_col]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        t = pa.table({"g": g})
        gc = t.group_by("g").aggregate([([], "count_all")])
        return pa.table({group_col: gc["g"],
                         "n_p": gc["count_all"].cast(pa.int64())})

    counts = ds.map_batches(count_partial, batch_format="pyarrow") \
        .groupby(group_col).aggregate(Sum("n_p", alias_name="n")).take_all()
    n_by_group = {r[group_col]: int(r["n"]) for r in counts}
    import ray
    ref = ray.put(n_by_group)

    def filt(batch: pa.Table, *, counts_ref=ref, tgt=target) -> pa.Table:
        from onestools_eventlog_ray.functions.runtime import pin_worker_threads
        pin_worker_threads()
        nbg = ray.get(counts_ref)
        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        h = md5_lower64(pc.cast(ids, pa.string()))        # uint64
        g = batch[group_col]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        codes = g.dictionary_encode()
        dict_vals = codes.dictionary.to_pylist()
        mods = np.asarray([max(nbg.get(v, 1), 1) for v in dict_vals],
                          dtype=np.uint64)
        gi = codes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (h % mods[gi]) < np.uint64(tgt)
        return batch.filter(pa.array(keep))

    return ds.map_batches(filt, batch_format="pyarrow")


def importance_sample(ds: ray.data.Dataset, id_col: str = "doc_id",
                      weight_col: str = "n_chars",
                      full_weight_at: int = 600,
                      salt: str = "is") -> ray.data.Dataset:
    """Deterministic IMPORTANCE sampling: keep each row with its OWN
    acceptance probability ``w = min(1, value / full_weight_at)`` —
    the quality/length-weighted Bernoulli downsampler a training-mix
    builder runs (DSIR-style: low-value docs survive at reduced rate
    instead of a hard cut, so the tail stays represented).

    RNG-free and retry-stable like every sampler here: accept iff
    ``md5_lower64(f"{salt}:{id}") % 1e6 < w_e6`` — the same row gets
    the same verdict on every run, every retry, every cluster size,
    and the whole decision is one integer compare the SQL oracle
    reproduces exactly.  Zero shuffle, pure batch filter.
    -> kept rows (id, weight value, w_e6, h_mod)."""
    prefix = f"{salt}:"

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        keyed = pc.binary_join_element_wise(
            pa.array([prefix] * len(ids), pa.string()),
            pc.cast(ids, pa.string()), "")
        h = (md5_lower64(keyed) % np.uint64(1_000_000)).astype(np.int64)
        v = batch[weight_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        w = np.minimum(np.int64(1_000_000),
                       v * np.int64(1_000_000) // full_weight_at)
        keep = h < w
        t = batch.select([id_col, weight_col]).filter(pa.array(keep))
        return t.append_column(
            "w_e6", pa.array(w[keep], pa.int64())).append_column(
            "h_mod", pa.array(h[keep], pa.int64()))

    return ds.select_columns([id_col, weight_col]) \
        .map_batches(fn, batch_format="pyarrow")
