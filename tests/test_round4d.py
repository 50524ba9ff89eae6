"""Round-4d: materialized rollup transforms (ES transform API) —
incremental == rebuild, compaction identity, atomicity."""

import os

import pyarrow as pa
import pytest

import ray
import ray.data

from onestools_eventlog_ray.pipelines import transform


def _events(ids, types, values) -> ray.data.Dataset:
    return ray.data.from_arrow(pa.table({
        "event_id": pa.array(ids, pa.int64()),
        "event_type": pa.array(types, pa.string()),
        "value": pa.array(values, pa.float64()),
    }))


def test_transform_incremental_equals_rebuild(tmp_path):
    full = _events([0, 1, 2, 3, 4],
                   ["a", "b", "a", "b", "a"],
                   [1.5, 2.0, 3.25, 4.0, 0.5])
    d_full = str(tmp_path / "full")
    transform.write_transform(d_full, full, "event_type", "value")
    one_shot = transform.read_transform(d_full)

    d_inc = str(tmp_path / "inc")
    transform.write_transform(
        d_inc, _events([0, 1], ["a", "b"], [1.5, 2.0]),
        "event_type", "value")
    transform.update_transform(
        d_inc, _events([2, 3], ["a", "b"], [3.25, 4.0]))
    transform.update_transform(d_inc, _events([4], ["a"], [0.5]))
    inc = transform.read_transform(d_inc)
    assert inc.equals(one_shot)
    rows = {r["group_key"]: r for r in inc.to_pylist()}
    assert rows["a"]["n"] == 3
    assert rows["a"]["sum_e6"] == 5_250_000
    assert rows["a"]["min_e6"] == 500_000
    assert rows["a"]["max_e6"] == 3_250_000
    assert rows["a"]["avg_e6"] == 1_750_000
    # three generation partials on disk before compaction
    assert len([f for f in os.listdir(d_inc)
                if f.endswith(".parquet")]) == 3


def test_transform_new_group_in_increment(tmp_path):
    d = str(tmp_path / "t")
    transform.write_transform(d, _events([0], ["a"], [1.0]),
                              "event_type", "value")
    transform.update_transform(d, _events([1], ["zzz"], [7.0]))
    rows = {r["group_key"]: r for r in
            transform.read_transform(d).to_pylist()}
    assert set(rows) == {"a", "zzz"}
    assert rows["zzz"]["n"] == 1 and rows["zzz"]["sum_e6"] == 7_000_000


def test_transform_compaction_identity(tmp_path):
    d = str(tmp_path / "t")
    transform.write_transform(d, _events([0, 1], ["a", "b"], [1.0, 2.0]),
                              "event_type", "value")
    transform.update_transform(d, _events([2], ["a"], [5.0]))
    before = transform.read_transform(d)
    transform.compact_transform(d)
    after = transform.read_transform(d)
    assert after.equals(before)
    assert len([f for f in os.listdir(d)
                if f.endswith(".parquet")]) == 1
    # serving keeps working for further increments after compaction
    transform.update_transform(d, _events([3], ["b"], [1.0]))
    rows = {r["group_key"]: r for r in
            transform.read_transform(d).to_pylist()}
    assert rows["b"]["n"] == 2 and rows["b"]["sum_e6"] == 3_000_000


def test_transform_no_tmp_left_behind(tmp_path):
    d = str(tmp_path / "t")
    transform.write_transform(d, _events([0], ["a"], [1.0]),
                              "event_type", "value")
    assert not [f for f in os.listdir(d) if f.startswith(".tmp-")]
