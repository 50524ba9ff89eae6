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
