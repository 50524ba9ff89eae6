"""The Ray-2.49 empty-bundle schema shim (functions/raycompat.py):
zero-row zero-column shuffle bundles must NOT log schema divergence,
while GENUINE schema divergence must still warn."""

import logging

import pyarrow as pa
import pytest

import ray.data

import onestools_eventlog_ray  # noqa: F401 — installs the shim on import


class _Capture(logging.Handler):
    def __init__(self):
        super().__init__(level=logging.WARNING)
        self.records = []

    def emit(self, record):
        self.records.append(record.getMessage())


@pytest.fixture()
def captured_executor_warnings():
    from ray.data._internal.execution import streaming_executor_state as ses
    h = _Capture()
    ses.logger.addHandler(h)
    try:
        yield h.records
    finally:
        ses.logger.removeHandler(h)


def test_empty_shuffle_bundles_do_not_warn(ray_session, captured_executor_warnings):
    # 3 groups over 32 partitions -> Ray's sort-aggregate emits ~29
    # zero-row zero-column bundles; before the shim this warned per op.
    t = pa.table({"k": ["a", "b", "c"] * 100, "v": list(range(300))})
    ds = ray.data.from_arrow(t).repartition(32)
    from ray.data.aggregate import Count
    rows = ds.groupby("k").aggregate(Count(alias_name="n")).take_all()
    assert {r["k"]: r["n"] for r in rows} == {"a": 100, "b": 100, "c": 100}

    def per_group(g: pa.Table) -> pa.Table:
        return pa.table({"k": g["k"][:1],
                         "n": pa.array([g.num_rows], pa.int64())})

    ds.groupby("k").map_groups(per_group, batch_format="pyarrow").take_all()
    assert not [m for m in captured_executor_warnings
                if "different schema" in m], captured_executor_warnings


def test_real_schema_divergence_still_warns(ray_session, captured_executor_warnings):
    t = pa.table({"k": list(range(64))})

    def diverge(batch: pa.Table) -> pa.Table:
        # non-empty outputs under two different column names
        name = "a" if int(batch["k"][0].as_py()) < 32 else "b"
        return pa.table({name: batch["k"]})

    ray.data.from_arrow(t).repartition(8) \
        .map_batches(diverge, batch_format="pyarrow").take_all()
    assert [m for m in captured_executor_warnings if "different schema" in m]
