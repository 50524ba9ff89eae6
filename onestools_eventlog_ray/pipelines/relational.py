"""Relational operators over the auxiliary tables — the grouping /
ordering / recovery capabilities of the reference expressed as Ray Data
aggregates.

- ``grouped_counts`` generalizes the reference's time-bucket batch
  grouping (SURVEY.md §2.6 A1,
  ``/root/reference/OneSTools.EventLog.Exporter.Core/ElasticSearch/ElasticSearchStorage.cs:293-320``).
- ``top1_recovery`` is the reference's checkpoint-recovery query
  (SURVEY.md §2.7 K1/K2: global top-1 by id,
  ``ElasticSearchStorage.cs:63-77``) as a distributed max-aggregate.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data
from ray.data.aggregate import Count, Max, Min, Sum


def grouped_counts(ds: ray.data.Dataset, keys: list[str],
                   count_alias: str = "n") -> ray.data.Dataset:
    """groupby(keys) -> count per group."""
    return ds.groupby(keys).aggregate(Count(alias_name=count_alias))


def events_by_type(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Per event_type: row count + exact (order-independent) min/max value."""
    return ds.groupby("event_type").aggregate(
        Count(alias_name="n_events"),
        Min("value", alias_name="min_value"),
        Max("value", alias_name="max_value"))


def lineitem_qty_by_flag(ds: ray.data.Dataset) -> ray.data.Dataset:
    """TPC-H-Q1-shaped aggregate (integral l_quantity -> exact sums)."""

    def to_int_qty(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            "l_returnflag": batch["l_returnflag"],
            "l_linestatus": batch["l_linestatus"],
            "qty": pc.cast(batch["l_quantity"], pa.int64()),
        })

    return ds.map_batches(to_int_qty, batch_format="pyarrow") \
             .groupby(["l_returnflag", "l_linestatus"]) \
             .aggregate(Sum("qty", alias_name="sum_qty"), Count(alias_name="n"))


def top1_recovery(ds: ray.data.Dataset, id_col: str = "doc_id") -> pa.Table:
    """Checkpoint-position recovery: (max_id, n_rows) as one row."""
    res = ds.aggregate(Max(id_col, alias_name="max_id"),
                       Count(alias_name="n_rows"))
    return pa.table({"max_id": pa.array([res["max_id"]], pa.int64()),
                     "n_rows": pa.array([res["n_rows"]], pa.int64())})
