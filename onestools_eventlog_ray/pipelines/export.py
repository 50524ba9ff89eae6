"""Resumable partitioned-output sink — the generic export side of the
engine (the reference's bulk sinks S7/S9 write to ES/ClickHouse; batch
exports at 100 TB write partition-per-key parquet directories instead).

Design (the brief's resumable-output contract):
- one DIRECTORY per partition key value, one immutable part file inside,
  committed tmp -> atomic rename, then a ``_SUCCESS`` marker carrying
  the row count;
- a re-run SKIPS every partition whose marker exists — a failed run
  resumes by rebuilding only the missing partitions (same contract as
  the index build's per-partition manifest);
- never one giant file: each partition writes independently, so the
  output is object-store friendly and the export parallelizes per key.

Partition keys are assumed bounded-cardinality (event types, dates,
tenants).  For unbounded keys, bucket by ``hash(key) % N`` first — the
sink itself is key-agnostic.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data


def _safe(v) -> str:
    s = str(v)
    return "".join(c if c.isalnum() or c in "-_." else "_" for c in s) \
        or "_empty"


def export_partitioned(ds: ray.data.Dataset, out_dir: str,
                       key: str) -> pa.Table:
    """Write ``ds`` as ``out_dir/<key>=<value>/part-0.parquet`` with a
    per-partition ``_SUCCESS`` marker; partitions whose marker already
    exists are SKIPPED (resume).  -> manifest (partition, n_rows,
    skipped) sorted by partition value."""
    os.makedirs(out_dir, exist_ok=True)

    def write_group(g: pa.Table) -> pa.Table:
        val = g[key][0].as_py()
        pdir = os.path.join(out_dir, f"{key}={_safe(val)}")
        marker = os.path.join(pdir, "_SUCCESS")
        if os.path.exists(marker):
            with open(marker) as f:
                n = json.load(f)["n_rows"]
            return pa.table({"partition": pa.array([str(val)], pa.string()),
                             "n_rows": pa.array([int(n)], pa.int64()),
                             "skipped": pa.array([True], pa.bool_())})
        os.makedirs(pdir, exist_ok=True)
        tmp = os.path.join(pdir, ".part-0.parquet.tmp")
        pq.write_table(g, tmp)
        os.replace(tmp, os.path.join(pdir, "part-0.parquet"))
        mtmp = marker + ".tmp"
        with open(mtmp, "w") as f:
            json.dump({"n_rows": g.num_rows}, f)
        os.replace(mtmp, marker)
        return pa.table({"partition": pa.array([str(val)], pa.string()),
                         "n_rows": pa.array([g.num_rows], pa.int64()),
                         "skipped": pa.array([False], pa.bool_())})

    rows = ds.groupby(key).map_groups(write_group,
                                      batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: r["partition"])
    return pa.table({
        "partition": pa.array([r["partition"] for r in rows], pa.string()),
        "n_rows": pa.array([r["n_rows"] for r in rows], pa.int64()),
        "skipped": pa.array([r["skipped"] for r in rows], pa.bool_()),
    })


def export_training_shards(ds: "ray.data.Dataset", out_dir: str,
                           n_shards: int = 8,
                           spec=None) -> "pa.Table":
    """WebDataset-style TRAINING SHARD export: the bridge between the
    curated corpus and a training loader — docs are routed to
    ``n_shards`` shard DIRECTORIES by the deterministic id hash (same
    verdict on every run/retry), each routed batch written as its own
    immutable content-named part file (tmp + atomic rename, idempotent
    under Ray task retries), and the returned MANIFEST carries
    per-shard (n_docs, n_tokens, min/max doc_id) so the loader can
    size epochs and resume per shard without opening files.

    Scale shape: ONE tokenize+route+write pass — no groupby of content
    at all (a per-shard map_groups would materialize 1/n_shards of the
    corpus in one task; writing part-per-batch inside the shard dir
    keeps every task O(batch)); only the narrow (shard, doc_id, n_tok)
    rows reach the manifest fold.  A loader reads ``shard-K/*.parquet``
    — the shard is a directory, exactly like this engine's docstore.
    -> manifest (shard, n_docs, n_tokens, min_doc_id, max_doc_id)."""
    import hashlib
    import os
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc_
    import pyarrow.parquet as pq
    import ray.data
    from ray.data.aggregate import Count, Max, Min, Sum
    from onestools_eventlog_ray.functions.analyzer import tokenize_array
    from onestools_eventlog_ray.functions.fasthash import md5_lower64
    from onestools_eventlog_ray.sources.corpus import DOCUMENTS_SPEC
    from onestools_eventlog_ray.stages.normalize import add_doc_id

    spec = spec or DOCUMENTS_SPEC
    # completed-export marker: batch boundaries are not guaranteed
    # stable across runs, so a finished export must not re-route (it
    # could lay down differently-split duplicate parts) — the manifest
    # file IS the _SUCCESS marker, and re-export returns it verbatim
    import json
    marker = os.path.join(out_dir, "_MANIFEST.json")
    if os.path.exists(marker):
        with open(marker) as fh:
            rec = json.load(fh)
        return pa.table({c: pa.array(rec[c], pa.int64())
                         for c in ("shard", "n_docs", "n_tokens",
                                   "min_doc_id", "max_doc_id")})
    for k in range(n_shards):
        os.makedirs(os.path.join(out_dir, f"shard-{k:05d}"), exist_ok=True)

    def route_and_write(batch: pa.Table) -> pa.Table:
        b = add_doc_id(batch, spec)
        toks = tokenize_array(b["content"])
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        ids = b["doc_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        keyed = pc_.binary_join_element_wise(
            pa.array(["shard:"] * len(ids), pa.string()),
            pc_.cast(ids, pa.string()), "")
        shard = (md5_lower64(keyed) % np.uint64(n_shards)).astype(np.int64)
        nt = np.asarray(toks.value_lengths(), dtype=np.int64)
        full = pa.table({
            "shard": pa.array(shard, pa.int64()),
            "doc_id": ids,
            "n_tok": pa.array(nt, pa.int64()),
            "content": b["content"],
        })
        for k in np.unique(shard).tolist():
            sub = full.filter(pa.array(shard == k))                 .select(["doc_id", "n_tok", "content"]).sort_by("doc_id")
            # content-named part: a retried task rewrites the SAME file
            sig = hashlib.md5(
                sub["doc_id"].to_string().encode()).hexdigest()[:16]
            path = os.path.join(out_dir, f"shard-{int(k):05d}",
                                f"part-{sig}.parquet")
            if not os.path.exists(path):             # resumable skip
                tmp = path + f".tmp-{os.getpid()}"
                pq.write_table(sub, tmp)
                os.replace(tmp, path)
        return full.select(["shard", "doc_id", "n_tok"])

    manifest = ds.map_batches(route_and_write, batch_format="pyarrow")         .groupby("shard").aggregate(
            Count(alias_name="n_docs"),
            Sum("n_tok", alias_name="n_tokens"),
            Min("doc_id", alias_name="min_doc_id"),
            Max("doc_id", alias_name="max_doc_id"))         .sort("shard").take_all()
    out = pa.table({
        c: pa.array([int(r[c]) for r in manifest], pa.int64())
        for c in ("shard", "n_docs", "n_tokens", "min_doc_id",
                  "max_doc_id")})
    tmp = marker + f".tmp-{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump({c: out[c].to_pylist() for c in out.column_names}, fh)
    os.replace(tmp, marker)
    return out
