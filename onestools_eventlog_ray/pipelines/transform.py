"""Materialized rollup transforms with checkpointed incremental update
— the ES "transform" (continuous pivot) API re-expressed Ray-Data-first.

ES transforms continuously maintain an entity-centric rollup index from
an event stream (the reference feeds the same dashboards by re-querying
ClickHouse/ES aggregations on every refresh,
``ElasticSearchStorage.cs:200-236``).  Here the rollup is a directory of
MERGEABLE per-generation partial parquet files plus a tiny JSON
manifest: the initial build folds the settled events once, every
increment folds ONLY the new rows into one more partial file, and reads
fold the (groups x generations)-sized partials — never the raw events
again.  All statistics are exact integers (count / e6-quantized sum /
min / max), so an incremental build is bit-identical to a from-scratch
rebuild at any split of the input (the engine-wide exactly-once shape:
``tests/test_round4d.py`` proves increment == rebuild).

Scale: each generation's partial table has one row per group — the raw
events shuffle once per ingest batch, partials are O(groups).  A
failed increment leaves no partial behind (atomic tmp+rename), so the
caller just re-runs it.
"""

from __future__ import annotations

import json
import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data
from ray.data.aggregate import Max, Min, Sum

from onestools_eventlog_ray.state.checkpoint import atomic_write_text

_BIG = 1 << 62

_PARTIAL_SCHEMA = pa.schema([("group_key", pa.string()),
                             ("n", pa.int64()),
                             ("sum_e6", pa.int64()),
                             ("min_e6", pa.int64()),
                             ("max_e6", pa.int64())])


def _fold_events(events: ray.data.Dataset, group_col: str,
                 value_col: str) -> pa.Table:
    """events -> one exact partial row per group (the mergeable unit)."""

    def partial(batch: pa.Table) -> pa.Table:
        v = batch[value_col].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        e6 = np.floor(v * 1_000_000 + 0.5).astype(np.int64)
        t = pa.table({"group_key": batch[group_col].cast(pa.string()),
                      "v": pa.array(e6, pa.int64())})
        g = t.group_by("group_key").aggregate(
            [("v", "sum"), ("v", "min"), ("v", "max"),
             ([], "count_all")])
        return pa.table({"group_key": g["group_key"],
                         "n_p": g["count_all"].cast(pa.int64()),
                         "sum_p": g["v_sum"].cast(pa.int64()),
                         "min_p": g["v_min"].cast(pa.int64()),
                         "max_p": g["v_max"].cast(pa.int64())})

    rows = events.map_batches(partial, batch_format="pyarrow") \
        .groupby("group_key") \
        .aggregate(Sum("n_p", alias_name="n"),
                   Sum("sum_p", alias_name="sum_e6"),
                   Min("min_p", alias_name="min_e6"),
                   Max("max_p", alias_name="max_e6")).take_all()
    rows.sort(key=lambda r: str(r["group_key"]))
    return pa.table({
        "group_key": pa.array([str(r["group_key"]) for r in rows],
                              pa.string()),
        "n": pa.array([int(r["n"]) for r in rows], pa.int64()),
        "sum_e6": pa.array([int(r["sum_e6"]) for r in rows], pa.int64()),
        "min_e6": pa.array([int(r["min_e6"]) for r in rows], pa.int64()),
        "max_e6": pa.array([int(r["max_e6"]) for r in rows], pa.int64()),
    })


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "transform.json")


def _write_partial(out_dir: str, tbl: pa.Table, gen: int) -> str:
    name = f"gen-{gen:04d}.parquet"
    tmp = os.path.join(out_dir, f".tmp-{uuid.uuid4().hex}.parquet")
    pq.write_table(tbl.cast(_PARTIAL_SCHEMA), tmp)
    os.replace(tmp, os.path.join(out_dir, name))
    return name


def write_transform(out_dir: str, events: ray.data.Dataset,
                    group_col: str, value_col: str) -> dict:
    """Initial build: fold the settled events into generation 0."""
    os.makedirs(out_dir, exist_ok=True)
    tbl = _fold_events(events, group_col, value_col)
    name = _write_partial(out_dir, tbl, 0)
    man = {"group_col": group_col, "value_col": value_col,
           "generations": [name]}
    atomic_write_text(_manifest_path(out_dir), json.dumps(man))
    return man


def update_transform(out_dir: str, new_events: ray.data.Dataset) -> dict:
    """Incremental ingest: fold ONLY the new rows into one more
    generation partial — the settled rollup is never re-read."""
    man = json.loads(open(_manifest_path(out_dir)).read())
    tbl = _fold_events(new_events, man["group_col"], man["value_col"])
    name = _write_partial(out_dir, tbl, len(man["generations"]))
    man["generations"].append(name)
    atomic_write_text(_manifest_path(out_dir), json.dumps(man))
    return man


def read_transform(out_dir: str) -> pa.Table:
    """Serve the rollup: fold all generation partials (O(groups x
    generations) rows; compaction = rewrite as one generation).
    -> (group_key, n, sum_e6, min_e6, max_e6, avg_e6) sorted."""
    man = json.loads(open(_manifest_path(out_dir)).read())
    parts = [pq.read_table(os.path.join(out_dir, g))
             for g in man["generations"]]
    t = pa.concat_tables(parts)
    g = t.group_by("group_key").aggregate(
        [("n", "sum"), ("sum_e6", "sum"), ("min_e6", "min"),
         ("max_e6", "max")])
    order = pc.sort_indices(g["group_key"])
    keys = g["group_key"].take(order)
    n = g["n_sum"].cast(pa.int64()).take(order)
    s = g["sum_e6_sum"].cast(pa.int64()).take(order)
    avg = pa.array([int(sv) // max(1, int(nv))
                    for sv, nv in zip(s.to_pylist(), n.to_pylist())],
                   pa.int64())
    return pa.table({"group_key": keys, "n": n, "sum_e6": s,
                     "min_e6": g["min_e6_min"].cast(pa.int64())
                     .take(order),
                     "max_e6": g["max_e6_max"].cast(pa.int64())
                     .take(order),
                     "avg_e6": avg})


def compact_transform(out_dir: str) -> dict:
    """Rewrite all generations as one (serving stays identical)."""
    rolled = read_transform(out_dir)
    man = json.loads(open(_manifest_path(out_dir)).read())
    tbl = rolled.select(["group_key", "n", "sum_e6", "min_e6",
                         "max_e6"])
    name = _write_partial(out_dir, tbl, 0)
    for g in man["generations"]:
        if g != name:
            os.unlink(os.path.join(out_dir, g))
    man["generations"] = [name]
    atomic_write_text(_manifest_path(out_dir), json.dumps(man))
    return man
