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

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

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


EVENT_TYPE_LABELS = {
    # static code->label decode, the M6-M9 pattern of the reference
    # (4..70-entry enum maps, /root/reference/OneSTools.EventLog/LgpReader.cs:222-368)
    "click": "User click",
    "view": "Page view",
    "purchase": "Purchase completed",
    "signup": "Account created",
    "error": "Client error",
}


def events_label_decode_counts(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Vectorized small-dictionary decode (pc.index_in + take — no Python
    per row) then count per decoded label; unknown codes fall back to the
    raw code (the reference's identity-fallback semantics)."""
    import pyarrow.compute as pc
    codes = pa.array(list(EVENT_TYPE_LABELS))
    labels = pa.array(list(EVENT_TYPE_LABELS.values()))

    def decode(batch: pa.Table) -> pa.Table:
        idx = pc.index_in(batch["event_type"], value_set=codes)
        decoded = pc.take(labels, idx)
        decoded = pc.if_else(pc.is_null(decoded), batch["event_type"], decoded)
        return pa.table({"event_label": decoded})

    return ds.map_batches(decode, batch_format="pyarrow") \
             .groupby("event_label").aggregate(Count(alias_name="n"))


def top_events_by_value(ds: ray.data.Dataset, k: int = 10) -> pa.Table:
    """Global top-k by (value desc, event_id asc) via ds.sort().limit()
    — the K1/K2 recovery-query shape as a distributed sort."""
    rows = ds.sort(["value", "event_id"], descending=[True, False]) \
             .limit(k).take_all()
    return pa.table({
        "event_id": pa.array([r["event_id"] for r in rows], pa.int64()),
        "value": pa.array([r["value"] for r in rows], pa.float64()),
    })


def top1_recovery(ds: ray.data.Dataset, id_col: str = "doc_id") -> pa.Table:
    """Checkpoint-position recovery: (max_id, n_rows) as one row."""
    res = ds.aggregate(Max(id_col, alias_name="max_id"),
                       Count(alias_name="n_rows"))
    return pa.table({"max_id": pa.array([res["max_id"]], pa.int64()),
                     "n_rows": pa.array([res["n_rows"]], pa.int64())})


def orders_by_nation(orders: ray.data.Dataset, customer: pa.Table,
                     nation: pa.Table) -> ray.data.Dataset:
    """Broadcast equi-join (J1/J2): the small side (customer -> nation
    name, ~N_cust rows) is shipped ONCE via ``ray.put`` and looked up
    vectorized per batch (``pc.index_in`` + ``take``) — orders, the big
    side, never shuffles for the join; only (nation, partial-agg) rows
    enter the final small groupby.

    -> (n_name, n_orders, total_cents); prices aggregated as exact
    cents so the result is hash-stable vs the SQL oracle."""
    import numpy as np
    import pyarrow.compute as pc
    import ray
    nat_names = {int(k): v for k, v in zip(
        nation["n_nationkey"].to_pylist(), nation["n_name"].to_pylist())}
    cust_nation = pa.table({
        "custkey": customer["c_custkey"],
        "n_name": pa.array([nat_names[int(k)] for k in
                            customer["c_nationkey"].to_pylist()], pa.string()),
    })
    side_ref = ray.put(cust_nation)

    def join_and_partial(batch: pa.Table) -> pa.Table:
        side = ray.get(side_ref)
        idx = pc.index_in(batch["o_custkey"], value_set=side["custkey"])
        n_name = pc.take(side["n_name"].combine_chunks()
                         if isinstance(side["n_name"], pa.ChunkedArray)
                         else side["n_name"], idx)
        cents = np.floor(batch["o_totalprice"].to_numpy(zero_copy_only=False)
                         .astype(np.float64) * 100 + 0.5).astype(np.int64)
        part = pa.table({"n_name": n_name,
                         "cents": pa.array(cents, pa.int64())}) \
            .group_by("n_name").aggregate([("cents", "sum"),
                                           ("cents", "count")])
        return part.rename_columns(["n_name", "cents_p", "cnt_p"])

    return orders.map_batches(join_and_partial, batch_format="pyarrow") \
        .groupby("n_name") \
        .aggregate(Sum("cnt_p", alias_name="n_orders"),
                   Sum("cents_p", alias_name="total_cents"))


def topk_orders_per_cust(orders: ray.data.Dataset, k: int = 3
                         ) -> ray.data.Dataset:
    """Windowed per-group top-k (row_number <= k per customer): the
    grouped analog of the K1/K2 recovery sort, expressed as
    ``groupby(custkey).map_groups`` with a vectorized in-group sort.
    Ranked on exact CENTS so ordering is oracle-stable."""
    import numpy as np

    def topk(group: pa.Table) -> pa.Table:
        cents = np.floor(group["o_totalprice"].to_numpy(zero_copy_only=False)
                         .astype(np.float64) * 100 + 0.5).astype(np.int64)
        keys = group["o_orderkey"].to_numpy(zero_copy_only=False)
        order = np.lexsort((keys, -cents))[:k]
        return pa.table({
            "o_custkey": pa.array(
                group["o_custkey"].to_numpy(zero_copy_only=False)[order],
                pa.int64()),
            "rank": pa.array(np.arange(1, order.size + 1), pa.int64()),
            "o_orderkey": pa.array(keys[order], pa.int64()),
            "price_cents": pa.array(cents[order], pa.int64()),
        })

    return orders.groupby("o_custkey").map_groups(topk,
                                                  batch_format="pyarrow")


def has_child_topk(orders: ray.data.Dataset, customer: pa.Table,
                   priority: str = "1-URGENT", min_children: int = 2,
                   k: int = 10) -> pa.Table:
    """ES parent-child join field, ``has_child`` query with
    ``score_mode=sum`` and ``min_children`` — parents (customers) ranked
    by the SUM of their matching children's scores (orders whose
    ``o_orderpriority`` equals ``priority``; child score = exact price
    cents, the deterministic analog of a relevance score).  The join
    capability the reference gets for free from ES mappings
    (``ElasticSearchStorage.cs:200-236`` index templates).

    100-TB shape: children partial-aggregate INSIDE ``map_batches``
    (filter + per-batch custkey fold), so only narrow
    (custkey, cents, n) rows reach the one small groupby; parents never
    shuffle — names attach to the k-row result from the broadcast-sized
    customer table on the driver.

    -> (rank, c_custkey, c_name, score_cents, n_children) top-k by
    (score desc, custkey asc), parents with >= min_children matches.
    """

    def partial(batch: pa.Table) -> pa.Table:
        m = pc.equal(batch["o_orderpriority"], priority)
        b = batch.filter(m)
        cents = np.floor(b["o_totalprice"].to_numpy(zero_copy_only=False)
                         .astype(np.float64) * 100 + 0.5).astype(np.int64)
        part = pa.table({"o_custkey": b["o_custkey"],
                         "cents": pa.array(cents, pa.int64())}) \
            .group_by("o_custkey").aggregate([("cents", "sum"),
                                              ("cents", "count")])
        return part.rename_columns(["o_custkey", "cents_p", "n_p"])

    agg = orders.map_batches(partial, batch_format="pyarrow") \
        .groupby("o_custkey") \
        .aggregate(Sum("cents_p", alias_name="score_cents"),
                   Sum("n_p", alias_name="n_children"))

    def gate(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater_equal(batch["n_children"],
                                             min_children))

    rows = agg.map_batches(gate, batch_format="pyarrow") \
        .sort(["score_cents", "o_custkey"], descending=[True, False]) \
        .limit(k).take_all()
    names = {int(ck): nm for ck, nm in zip(
        customer["c_custkey"].to_pylist(), customer["c_name"].to_pylist())}
    return pa.table({
        "rank": pa.array(range(1, len(rows) + 1), pa.int64()),
        "c_custkey": pa.array([r["o_custkey"] for r in rows], pa.int64()),
        "c_name": pa.array([names[int(r["o_custkey"])] for r in rows],
                           pa.string()),
        "score_cents": pa.array([r["score_cents"] for r in rows],
                                pa.int64()),
        "n_children": pa.array([r["n_children"] for r in rows], pa.int64()),
    })


def has_parent_orders(orders: ray.data.Dataset, customer: pa.Table,
                      segment: str = "BUILDING", min_bal: float = 5000.0,
                      k: int = 10) -> pa.Table:
    """ES ``has_parent`` query with ``score=true`` — children (orders)
    returned when their parent (customer) matches a predicate
    (``c_mktsegment = segment AND c_acctbal > min_bal``), each child
    scored by the PARENT's score (exact acctbal cents).

    100-TB shape: the matching-parent map (custkey -> bal cents) is the
    small side, shipped ONCE via ``ray.put``; orders stream through one
    vectorized semi-join + score-attach pass and only the global top-k
    sort sees the (already filtered) survivors.

    -> (rank, o_orderkey, o_custkey, parent_bal_cents) top-k by
    (parent bal desc, orderkey asc)."""
    import ray
    keep = pc.and_(pc.equal(customer["c_mktsegment"], segment),
                   pc.greater(customer["c_acctbal"], min_bal))
    par = customer.filter(keep)
    bal_cents = np.floor(par["c_acctbal"].to_numpy(zero_copy_only=False)
                         .astype(np.float64) * 100 + 0.5).astype(np.int64)
    side_ref = ray.put(pa.table({
        "custkey": par["c_custkey"],
        "bal_cents": pa.array(bal_cents, pa.int64())}))

    def semi(batch: pa.Table) -> pa.Table:
        side = ray.get(side_ref)
        idx = pc.index_in(batch["o_custkey"], value_set=side["custkey"])
        m = pc.is_valid(idx)
        b = batch.filter(m)
        bc = pc.take(side["bal_cents"].combine_chunks()
                     if isinstance(side["bal_cents"], pa.ChunkedArray)
                     else side["bal_cents"], idx.filter(m))
        return pa.table({"o_orderkey": b["o_orderkey"],
                         "o_custkey": b["o_custkey"],
                         "parent_bal_cents": bc})

    rows = orders.map_batches(semi, batch_format="pyarrow") \
        .sort(["parent_bal_cents", "o_orderkey"],
              descending=[True, False]).limit(k).take_all()
    return pa.table({
        "rank": pa.array(range(1, len(rows) + 1), pa.int64()),
        "o_orderkey": pa.array([r["o_orderkey"] for r in rows], pa.int64()),
        "o_custkey": pa.array([r["o_custkey"] for r in rows], pa.int64()),
        "parent_bal_cents": pa.array([r["parent_bal_cents"] for r in rows],
                                     pa.int64()),
    })


def diversified_sample_stats(docs: ray.data.Dataset,
                             max_per_source: int = 3,
                             sample_size: int = 50) -> pa.Table:
    """ES ``diversified_sampler`` aggregation (deterministic analog):
    scan documents best-first (score = ``n_chars`` desc, doc_id asc —
    the rank_feature-style score), select at most ``max_per_source``
    docs per ``source``, stop at ``sample_size``; then run the sub-agg
    (per-lang doc count + char sum) over the sample.

    Selection identity that makes this distributed-exact: a doc chosen
    by the capped best-first scan is necessarily among its source's
    global top-``max_per_source`` (its better same-source docs are
    scanned earlier and consume the cap first), so candidates = per-
    source top-m — a per-batch partial top-m followed by one
    ``groupby(source)`` over m-row partials — and applying the cap to
    the candidate union is a no-op, leaving plain
    "order by score, limit sample_size".  Only n_sources x m rows ever
    reach the driver.

    -> (lang, n_docs, sum_chars) over the sample, lang asc."""

    def topm(group: pa.Table) -> pa.Table:
        nc = group["n_chars"].to_numpy(zero_copy_only=False)
        ids = group["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -nc))[:max_per_source]
        return group.take(pa.array(order, pa.int64())) \
            .select(["doc_id", "source", "lang", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        # per-batch per-source top-m: narrows each batch to <= m rows
        # per source before the (tiny) source groupby
        out = []
        src = batch["source"]
        for s in pc.unique(src).to_pylist():
            out.append(topm(batch.filter(pc.equal(src, s))))
        return pa.concat_tables(out) if out else batch.select(
            ["doc_id", "source", "lang", "n_chars"])

    cands = docs.map_batches(partial, batch_format="pyarrow") \
        .groupby("source").map_groups(topm, batch_format="pyarrow") \
        .take_all()
    nc = np.array([r["n_chars"] for r in cands], dtype=np.int64)
    ids = np.array([r["doc_id"] for r in cands], dtype=np.int64)
    sel = np.lexsort((ids, -nc))[:sample_size]
    langs = np.array([cands[i]["lang"] for i in sel])
    chars = nc[sel]
    ul = np.unique(langs)
    return pa.table({
        "lang": pa.array(ul.tolist(), pa.string()),
        "n_docs": pa.array([int((langs == g).sum()) for g in ul],
                           pa.int64()),
        "sum_chars": pa.array([int(chars[langs == g].sum()) for g in ul],
                              pa.int64()),
    })


def distinct_users_by_type(events: ray.data.Dataset) -> ray.data.Dataset:
    """Exact COUNT(DISTINCT user_id) per event_type: per-batch local
    dedupe (Acero group_by) -> composite-key dedupe shuffle -> tiny
    per-type count.  Only unique (type, user) pairs ever shuffle."""

    def local_pairs(batch: pa.Table) -> pa.Table:
        return pa.table({"event_type": batch["event_type"],
                         "user_id": batch["user_id"]}) \
            .group_by(["event_type", "user_id"]).aggregate([])

    deduped = events.map_batches(local_pairs, batch_format="pyarrow") \
        .groupby(["event_type", "user_id"]).aggregate(Count(alias_name="_c"))

    def drop(batch: pa.Table) -> pa.Table:
        return batch.select(["event_type"])

    return deduped.map_batches(drop, batch_format="pyarrow") \
        .groupby("event_type").aggregate(Count(alias_name="n_users"))


def median_value_by_type(events: ray.data.Dataset) -> ray.data.Dataset:
    """Exact lower-median of ``value`` per event_type (the deterministic
    element at sorted position (n-1)//2) — an order-statistic aggregate
    the Dataset API lacks, expressed as ``groupby.map_groups``.
    -> (event_type, n, median_e6)."""
    import numpy as np

    def med(group: pa.Table) -> pa.Table:
        v = np.sort(group["value"].to_numpy(zero_copy_only=False)
                    .astype(np.float64))
        m = v[(v.size - 1) // 2]
        return pa.table({
            "event_type": pa.array([group["event_type"][0].as_py()],
                                   pa.string()),
            "n": pa.array([v.size], pa.int64()),
            "median_e6": pa.array(
                [int(np.floor(m * 1_000_000 + 0.5))], pa.int64()),
        })

    return events.groupby("event_type").map_groups(med,
                                                   batch_format="pyarrow")


def asof_join_events(events: ray.data.Dataset,
                     left_type: str = "click",
                     right_type: str = "purchase") -> ray.data.Dataset:
    """AS-OF join — each ``left_type`` event joined to the most recent
    ``right_type`` event of the SAME user with ``right.ts <= left.ts``
    (the classic event-attribution / point-in-time lookup Ray Data has
    no primitive for; custom-operator family of the build guidelines).

    Implementation = tagged-union co-group: both sides project to
    narrow (user_id, ts_us, event_id, side) rows, ONE shuffle on
    user_id, and each group task runs a vectorized ``np.searchsorted``
    of left timestamps into the sorted right timeline.  Partitioning
    assumption: one user's rows fit one task (same as sessionize).

    Right-side ties on (user, ts) resolve to the max event_id — the
    right timeline is sorted by (ts, event_id) so searchsorted's
    last-at-ts is deterministic (the oracle dedupes the same way).
    -> (event_id, user_id, ts_us, r_event_id, r_ts_us), inner semantics
    (lefts with no prior right are dropped).
    """
    import numpy as np
    import pyarrow.compute as pc

    def project(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64())
        et = batch["event_type"]
        side = pc.if_else(pc.equal(et, left_type), 0,
                          pc.if_else(pc.equal(et, right_type), 1, -1))
        out = pa.table({
            "user_id": batch["user_id"],
            "ts_us": ts,
            "event_id": batch["event_id"],
            "side": pc.cast(side, pa.int8()),
        })
        return out.filter(pc.not_equal(out["side"], -1))

    def join_group(g: pa.Table) -> pa.Table:
        empty = pa.table({
            "event_id": pa.array([], pa.int64()),
            "user_id": pa.array([], pa.int64()),
            "ts_us": pa.array([], pa.int64()),
            "r_event_id": pa.array([], pa.int64()),
            "r_ts_us": pa.array([], pa.int64()),
        })
        side = g["side"].to_numpy(zero_copy_only=False)
        ts = g["ts_us"].to_numpy(zero_copy_only=False).astype(np.int64)
        eid = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lmask = side == 0
        rmask = side == 1
        if not lmask.any() or not rmask.any():
            return empty
        rts, rid = ts[rmask], eid[rmask]
        ro = np.lexsort((rid, rts))            # ties -> max event_id last
        rts, rid = rts[ro], rid[ro]
        lts, lid = ts[lmask], eid[lmask]
        pos = np.searchsorted(rts, lts, side="right") - 1
        keep = pos >= 0
        if not keep.any():
            return empty
        uid = int(g["user_id"][0].as_py())
        n = int(keep.sum())
        return pa.table({
            "event_id": pa.array(lid[keep], pa.int64()),
            "user_id": pa.array(np.full(n, uid, dtype=np.int64), pa.int64()),
            "ts_us": pa.array(lts[keep], pa.int64()),
            "r_event_id": pa.array(rid[pos[keep]], pa.int64()),
            "r_ts_us": pa.array(rts[pos[keep]], pa.int64()),
        })

    return events.map_batches(project, batch_format="pyarrow") \
                 .groupby("user_id") \
                 .map_groups(join_group, batch_format="pyarrow")


def value_histogram(events: ray.data.Dataset,
                    bin_width: float = 5.0) -> ray.data.Dataset:
    """Mergeable fixed-width histogram of ``value`` per event_type:
    -> (event_type, bin, n) with bin = floor(value / bin_width).

    The distribution-sketch member of the aggregate family (HLL =
    distinct, CM = frequency, Bloom = membership, histogram =
    quantiles): each batch folds its rows into local (type, bin)
    counts via one Acero group_by, so the shuffle moves only
    O(types x bins) partial rows per batch — approximate quantiles at
    100 TB for the cost of a tiny groupby (``histogram_quantile``
    answers them from the bins)."""
    import numpy as np

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        v = batch["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        bins = np.floor(v / bin_width).astype(np.int64)
        t = pa.table({"event_type": batch["event_type"],
                      "bin": pa.array(bins, pa.int64())})
        agg = t.group_by(["event_type", "bin"]).aggregate([("bin", "count")])
        return agg.rename_columns(["event_type", "bin", "n_p"])

    return events.map_batches(partial, batch_format="pyarrow") \
                 .groupby(["event_type", "bin"]) \
                 .aggregate(Sum("n_p", alias_name="n"))


def histogram_quantile(hist: pa.Table, event_type: str, q: float,
                       bin_width: float = 5.0) -> float:
    """Approximate quantile from the histogram: the left edge of the
    bin containing the value at sorted position floor(q * (n-1)) — the
    same element an exact lower-quantile picks, so the error is
    strictly < bin_width."""
    import numpy as np
    et = hist["event_type"].to_numpy(zero_copy_only=False)
    sel = et == event_type
    bins = hist["bin"].to_numpy(zero_copy_only=False)[sel]
    ns = hist["n"].to_numpy(zero_copy_only=False)[sel]
    order = np.argsort(bins)
    bins, ns = bins[order], ns[order]
    cum = np.cumsum(ns)
    pos = int(q * (cum[-1] - 1))           # 0-based rank of the target
    return float(bins[np.searchsorted(cum, pos, side="right")] * bin_width)


def json_field_stats(events: ray.data.Dataset,
                     field: str = "k") -> ray.data.Dataset:
    """Semi-structured field extraction at scale — the reference's
    nested free-text/property parse (SURVEY.md §2.2 M5: recursive
    flatten of 1C's nested event properties) as a vectorized RE2
    extraction over a JSON string column, then a per-type aggregate:
    -> (event_type, n_with_field, sum_v, min_v, max_v).

    ``pc.extract_regex`` runs the same RE2 pattern DuckDB's
    ``regexp_extract`` runs, so the parse is oracle-exact without a
    JSON library in the hot path (a real json decoder slots into the
    same batch fn)."""
    import numpy as np
    import pyarrow.compute as pc
    pattern = f'"{field}": (?P<v>[0-9]+)'

    def partial(batch: pa.Table) -> pa.Table:
        props = batch["props"]
        if isinstance(props, pa.ChunkedArray):
            props = props.combine_chunks()
        m = pc.extract_regex(props, pattern=pattern)
        v = pc.cast(pc.struct_field(m, "v"), pa.int64())
        t = pa.table({"event_type": batch["event_type"], "v": v}) \
            .filter(pc.is_valid(v))
        agg = t.group_by("event_type").aggregate(
            [("v", "count"), ("v", "sum"), ("v", "min"), ("v", "max")])
        return agg.rename_columns(["event_type", "n_p", "sum_p",
                                   "min_p", "max_p"])

    return events.map_batches(partial, batch_format="pyarrow") \
        .groupby("event_type") \
        .aggregate(Sum("n_p", alias_name="n_with_field"),
                   Sum("sum_p", alias_name="sum_v"),
                   Min("min_p", alias_name="min_v"),
                   Max("max_p", alias_name="max_v"))


def events_by_localdate(events: ray.data.Dataset,
                        tz_offset_s: int = 3 * 3600) -> ray.data.Dataset:
    """Per-type counts by LOCAL civil date — the reference's
    date-parse + timezone surface (SURVEY.md §2.2 M3: 1C event times
    are wall-clock shifted to a configured zone before bucketing):
    shift epoch micros by a fixed zone offset, floor to the civil day,
    render ISO 'YYYY-MM-DD'.  -> (event_type, local_date, n).

    The day arithmetic is integer (no float), the date RENDERING goes
    through numpy's proleptic-Gregorian datetime64 — bit-identical to
    SQL's ``DATE '1970-01-01' + n days``."""
    import numpy as np

    US_PER_DAY = 86_400_000_000

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        ts = batch["ts"]
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        us = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
        days = (us + tz_offset_s * 1_000_000) // US_PER_DAY
        dates = np.datetime_as_string(
            days.astype("datetime64[D]"), unit="D")
        t = pa.table({"event_type": batch["event_type"],
                      "local_date": pa.array(dates, pa.string())})
        agg = t.group_by(["event_type", "local_date"]).aggregate(
            [("local_date", "count")])
        return agg.rename_columns(["event_type", "local_date", "n_p"])

    return events.map_batches(partial, batch_format="pyarrow") \
        .groupby(["event_type", "local_date"]) \
        .aggregate(Sum("n_p", alias_name="n"))


def json_flatten(ds: ray.data.Dataset, col: str = "props",
                 id_col: str = "event_id") -> ray.data.Dataset:
    """RECURSIVE tagged-structure flatten — the engine counterpart of the
    reference's nested-collection decode (``GetData``,
    ``/root/reference/OneSTools.EventLog/LgpReader.cs:178-220``, which
    recurses into nested ``P`` collections; round-3 verdict missing #3).

    Each JSON document in ``col`` is walked to arbitrary depth and every
    SCALAR leaf becomes one row ``(id, path, value)``:

    - ``path`` uses JSONPath syntax (``$.a.b[0].c``), matching DuckDB's
      ``json_extract`` paths so the oracle can recompute it with a
      recursive CTE;
    - ``value`` is the leaf re-rendered as JSON text (strings keep their
      quotes) — the exact text ``CAST(json AS VARCHAR)`` produces;
    - JSON ``null`` leaves are omitted (they carry no value; DuckDB's
      ``json_extract`` returns SQL NULL for them).

    Per-row recursion is inherent to nested JSON (no fixed schema to
    vectorize over); the stage is still a streaming batch transform —
    rows never leave their batch, output is narrow (id, path, value).
    Malformed/NULL documents contribute no rows."""
    import json

    schema = pa.schema([(id_col, pa.int64()), ("path", pa.string()),
                        ("value", pa.string())])

    def flatten(batch: pa.Table) -> pa.Table:
        ids_out: list[int] = []
        paths: list[str] = []
        vals: list[str] = []
        for rid, s in zip(batch[id_col].to_pylist(),
                          batch[col].to_pylist()):
            if s is None:
                continue
            try:
                root = json.loads(s)
            except ValueError:
                continue
            stack = [("$", root)]
            while stack:
                path, node = stack.pop()
                if isinstance(node, dict):
                    for k, v in node.items():
                        stack.append((f"{path}.{k}", v))
                elif isinstance(node, list):
                    for j, v in enumerate(node):
                        stack.append((f"{path}[{j}]", v))
                elif node is None:
                    continue
                else:
                    ids_out.append(rid)
                    paths.append(path)
                    vals.append(json.dumps(node, separators=(",", ":")))
        return pa.table({id_col: pa.array(ids_out, pa.int64()),
                         "path": pa.array(paths, pa.string()),
                         "value": pa.array(vals, pa.string())},
                        schema=schema)

    return ds.map_batches(flatten, batch_format="pyarrow")


def conversion_lag_histogram(events: ray.data.Dataset,
                             bucket_us: int = 600_000_000
                             ) -> ray.data.Dataset:
    """Time-to-convert distribution: each PURCHASE as-of-joined to the
    user's most recent CLICK, the lag bucketed into 10-minute bins —
    the funnel-latency view next to ``funnel_window`` (which only
    counts a fixed window; this shows the whole curve).  Rides the
    :func:`asof_join_events` co-group; the histogram fold is bounded by
    the lag range.  -> (bin, n) where bin = lag // bucket_us."""
    from ray.data.aggregate import Sum as RSum

    j = asof_join_events(events, left_type="purchase",
                         right_type="click")

    def partial(batch: pa.Table) -> pa.Table:
        lag = (batch["ts_us"].to_numpy(zero_copy_only=False)
               - batch["r_ts_us"].to_numpy(zero_copy_only=False))
        b, c = np.unique(lag // bucket_us, return_counts=True)
        return pa.table({"bin": pa.array(b, pa.int64()),
                         "n_p": pa.array(c.astype(np.int64), pa.int64())})

    return j.map_batches(partial, batch_format="pyarrow") \
        .groupby("bin").aggregate(RSum("n_p", alias_name="n"))


def monthly_revenue(orders: ray.data.Dataset) -> ray.data.Dataset:
    """Calendar revenue series over the orders fact — month buckets via
    integer months-since-epoch (numpy ``datetime64[M]`` == DuckDB
    ``(year-1970)*12 + month-1``), exact e2 revenue sums; the TPC-H
    lane's missing date series (running_revenue is per-customer).
    -> (epoch_month, n_orders, revenue_e2)."""
    from ray.data.aggregate import Count, Sum as RSum

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["o_orderdate"].cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        months = ts.astype("datetime64[us]").astype("datetime64[M]") \
            .astype(np.int64)
        price = batch["o_totalprice"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return pa.table({
            "epoch_month": pa.array(months, pa.int64()),
            "r_p": pa.array(np.floor(price * 100 + 0.5).astype(np.int64),
                            pa.int64()),
        })

    return orders.select_columns(["o_orderdate", "o_totalprice"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("epoch_month") \
        .aggregate(Count(alias_name="n_orders"),
                   RSum("r_p", alias_name="revenue_e2"))


def user_ltv_pcts(events: ray.data.Dataset,
                  pcts: tuple[int, ...] = (25, 50, 75, 90, 99),
                  convert_type: str = "purchase") -> pa.Table:
    """Lifetime-value distribution: exact percentiles of per-user
    purchase-value totals (users with >= 1 purchase) — the monetization
    skew readout next to ``revenue_pareto``'s concentration curve.
    One narrow per-user e6 fold (bounded by user count, the
    ``user_activity_pcts`` convention), percentile_disc index math of
    ``price_percentiles``.  -> (pct, ltv_e6) plus the user count."""
    from ray.data.aggregate import Sum as RSum

    def partial(batch: pa.Table) -> pa.Table:
        m = pc.equal(batch["event_type"], convert_type) \
            .to_numpy(zero_copy_only=False)
        v = batch["value"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        e6 = np.floor(v * 1_000_000 + 0.5).astype(np.int64)
        t = pa.table({"user_id": batch["user_id"],
                      "v_p": pa.array(e6, pa.int64())})
        return t.filter(pa.array(m))

    rows = events.map_batches(partial, batch_format="pyarrow") \
        .groupby("user_id").aggregate(RSum("v_p", alias_name="ltv")) \
        .take_all()
    ltv = np.sort(np.asarray([int(r["ltv"]) for r in rows],
                             dtype=np.int64))
    n = ltv.size
    return pa.table({
        "pct": pa.array(list(pcts), pa.int64()),
        "n_users": pa.array([n] * len(pcts), pa.int64()),
        "ltv_e6": pa.array([int(ltv[(p * n + 99) // 100 - 1])
                            if n else 0 for p in pcts], pa.int64()),
    })


def revenue_pareto(orders: ray.data.Dataset,
                   pcts: tuple[int, ...] = (1, 5, 10, 20)) -> pa.Table:
    """Customer revenue CONCENTRATION (the Pareto / whale curve): the
    exact share of total revenue held by the top p% of customers, for
    several p.  One groupby fold to per-customer e2 revenue (narrow —
    customers are orders-of-magnitude fewer than orders; the same
    bounded-aggregate convention as ``user_activity_pcts``), ranked by
    (revenue desc, custkey asc), top-``ceil(p*n/100)`` summed.
    -> (pct, n_top, share_e6)."""
    from ray.data.aggregate import Sum as RSum

    def partial(batch: pa.Table) -> pa.Table:
        price = batch["o_totalprice"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        e2 = np.floor(price * 100 + 0.5).astype(np.int64)
        return pa.table({"o_custkey": batch["o_custkey"],
                         "r_p": pa.array(e2, pa.int64())})

    rows = orders.select_columns(["o_custkey", "o_totalprice"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("o_custkey").aggregate(RSum("r_p", alias_name="rev")) \
        .take_all()
    rev = np.asarray(sorted((int(r["rev"]), -int(r["o_custkey"]))
                            for r in rows))[::-1]
    vals = rev[:, 0] if rev.size else np.empty(0, dtype=np.int64)
    total = max(int(vals.sum()), 1)
    n = vals.size
    cum = np.concatenate([[0], np.cumsum(vals, dtype=np.int64)])
    out_p, out_n, out_s = [], [], []
    for p in pcts:
        n_top = (p * n + 99) // 100
        out_p.append(p)
        out_n.append(n_top)
        out_s.append(int(cum[n_top]) * 1_000_000 // total)
    return pa.table({
        "pct": pa.array(out_p, pa.int64()),
        "n_top": pa.array(out_n, pa.int64()),
        "share_e6": pa.array(out_s, pa.int64()),
    })


def cohort_retention(events: ray.data.Dataset,
                     week_us: int = 7 * 86_400_000_000) -> ray.data.Dataset:
    """Cohort retention MATRIX — the full BI view ``retention_d7`` is
    one cell of: users grouped by first-seen week (cohort), counted in
    every later week they return (age = activity week - cohort week).
    ONE shuffle on user_id; each user's group folds to its distinct
    (cohort, age) cells, then a bounded (cohorts x ages) count fold.
    -> (cohort_week, age_weeks, n_users)."""
    from ray.data.aggregate import Sum as RSum

    def project(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"user_id": batch["user_id"],
                         "week": pa.array(ts // week_us, pa.int64())})

    def per_user(group: pa.Table) -> pa.Table:
        w = np.unique(group["week"].to_numpy(zero_copy_only=False))
        cohort = int(w[0])
        return pa.table({
            "cohort_week": pa.array(np.full(w.size, cohort), pa.int64()),
            "age_weeks": pa.array(w - cohort, pa.int64()),
            "n_p": pa.array(np.ones(w.size, dtype=np.int64), pa.int64()),
        })

    return events.map_batches(project, batch_format="pyarrow") \
        .groupby("user_id").map_groups(per_user, batch_format="pyarrow") \
        .groupby(["cohort_week", "age_weeks"]) \
        .aggregate(RSum("n_p", alias_name="n_users"))


def props_schema_profile(ds: ray.data.Dataset, col: str = "props",
                         id_col: str = "event_id") -> pa.Table:
    """Semi-structured SCHEMA INFERENCE over a JSON column — the
    profiling pass a lakehouse runs before promoting JSON blobs to
    typed columns: per generalized JSONPath (array indices collapsed to
    ``[*]``) and leaf type, occurrence and distinct-value counts.
    Built on :func:`json_flatten`'s (id, path, value) rows: one
    type-classify transform, then two narrow folds (occurrences; and a
    distinct-first dedup groupby so distinct counting never ships
    values to the driver).  -> (path, vtype, n, n_distinct) sorted."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    def classify(batch: pa.Table) -> pa.Table:
        gpath = pc.replace_substring_regex(batch["path"], r"\[\d+\]",
                                           "[*]")
        v = batch["value"]
        is_str = pc.starts_with(v, '"')
        is_bool = pc.is_in(v, value_set=pa.array(["true", "false"]))
        vtype = pc.if_else(is_str, "string",
                           pc.if_else(is_bool, "bool", "number"))
        return pa.table({"path": gpath, "vtype": vtype, "value": v})

    rows = json_flatten(ds, col, id_col).map_batches(
        classify, batch_format="pyarrow").materialize()
    totals = rows.groupby(["path", "vtype"]) \
        .aggregate(Count(alias_name="n")).take_all()
    dedup1 = rows.groupby(["path", "vtype", "value"]) \
        .aggregate(Count(alias_name="_c"))

    def drop_val(batch: pa.Table) -> pa.Table:
        return batch.select(["path", "vtype"])

    dcounts = dedup1.map_batches(drop_val, batch_format="pyarrow") \
        .groupby(["path", "vtype"]) \
        .aggregate(Count(alias_name="n_distinct")).take_all()
    nd = {(r["path"], r["vtype"]): int(r["n_distinct"]) for r in dcounts}
    out = sorted(((r["path"], r["vtype"], int(r["n"]),
                   nd[(r["path"], r["vtype"])]) for r in totals))
    return pa.table({
        "path": pa.array([r[0] for r in out], pa.string()),
        "vtype": pa.array([r[1] for r in out], pa.string()),
        "n": pa.array([r[2] for r in out], pa.int64()),
        "n_distinct": pa.array([r[3] for r in out], pa.int64()),
    })


def zone_transitions(zone: str, start_year: int = 1970,
                     end_year: int = 2036) -> list[tuple[int, int]]:
    """UTC-offset transition table for a named IANA zone:
    sorted ``[(utc_instant_us, offset_seconds)]`` with the initial offset
    at index 0 — the broadcastable small-side "dimension" behind
    DST-correct local-date bucketing (the reference's NodaTime
    ``InZoneLeniently``, ``DateTimeZoneExtensions.cs:8-11``, resolves
    zones the same way: a precomputed transition list, not per-row API
    calls).

    Derived from ``zoneinfo`` WITHOUT private attrs: probe the offset
    every 6 hours (no real zone transitions twice within 6 h), then
    binary-search each change down to the exact second."""
    from datetime import datetime, timezone
    from zoneinfo import ZoneInfo

    tz = ZoneInfo(zone)

    def off(sec: int) -> int:
        return int(datetime.fromtimestamp(sec, tz).utcoffset().total_seconds())

    t0 = int(datetime(start_year, 1, 1, tzinfo=timezone.utc).timestamp())
    t1 = int(datetime(end_year, 1, 1, tzinfo=timezone.utc).timestamp())
    STEP = 6 * 3600
    out = [(t0 * 1_000_000, off(t0))]
    prev_t, prev_o = t0, out[0][1]
    for t in range(t0 + STEP, t1 + STEP, STEP):
        o = off(t)
        if o != prev_o:
            lo, hi = prev_t, t          # first second with the new offset
            while lo + 1 < hi:
                mid = (lo + hi) // 2
                if off(mid) == prev_o:
                    lo = mid
                else:
                    hi = mid
            out.append((hi * 1_000_000, o))
            prev_o = o
        prev_t = t
    return out


def events_by_localdate_tz(events: ray.data.Dataset,
                           zone: str = "America/New_York",
                           transitions: list[tuple[int, int]] | None = None
                           ) -> ray.data.Dataset:
    """DST-correct :func:`events_by_localdate`: per-type counts by the
    LOCAL civil date of a real IANA zone (round-3 verdict missing #2 —
    the fixed-offset variant buckets ~2 h/year of events into the wrong
    local day across DST changes).

    The zone's transition table (a few hundred (instant, offset) pairs)
    is the broadcast small side; each batch does ONE ``searchsorted``
    against the transition instants to pick every row's offset —
    vectorized, no per-row zone math.  -> (event_type, local_date, n).
    """
    import numpy as np

    trans = transitions if transitions is not None else zone_transitions(zone)
    trans_us = np.asarray([t for t, _ in trans], dtype=np.int64)
    offs_us = np.asarray([o for _, o in trans], dtype=np.int64) * 1_000_000
    US_PER_DAY = 86_400_000_000

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"]
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        us = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
        idx = np.clip(np.searchsorted(trans_us, us, side="right") - 1,
                      0, trans_us.size - 1)
        days = (us + offs_us[idx]) // US_PER_DAY
        dates = np.datetime_as_string(days.astype("datetime64[D]"), unit="D")
        t = pa.table({"event_type": batch["event_type"],
                      "local_date": pa.array(dates, pa.string())})
        agg = t.group_by(["event_type", "local_date"]).aggregate(
            [("local_date", "count")])
        return agg.rename_columns(["event_type", "local_date", "n_p"])

    return events.map_batches(partial, batch_format="pyarrow") \
        .groupby(["event_type", "local_date"]) \
        .aggregate(Sum("n_p", alias_name="n"))


def interval_join_counts(events: ray.data.Dataset,
                         left_type: str = "purchase",
                         right_type: str = "click",
                         window_s: int = 1800) -> ray.data.Dataset:
    """INTERVAL join — for each ``left_type`` event, the number of
    ``right_type`` events of the SAME user inside the trailing window
    ``(ts - window, ts]`` (attribution counting; the sibling of
    :func:`asof_join_events` where the predicate is a RANGE, another
    join Ray Data has no primitive for).

    Same tagged-union co-group shape: narrow projected rows, ONE
    shuffle on user_id, then a vectorized two-``searchsorted`` count of
    the window per group — left rows with zero matches are KEPT (left
    semantics).  -> (event_id, user_id, ts_us, n_right)."""
    import numpy as np
    import pyarrow.compute as pc

    w_us = window_s * 1_000_000

    def project(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64())
        et = batch["event_type"]
        side = pc.if_else(pc.equal(et, left_type), 0,
                          pc.if_else(pc.equal(et, right_type), 1, -1))
        out = pa.table({
            "user_id": batch["user_id"],
            "ts_us": ts,
            "event_id": batch["event_id"],
            "side": pc.cast(side, pa.int8()),
        })
        return out.filter(pc.not_equal(out["side"], -1))

    def count_group(g: pa.Table) -> pa.Table:
        side = g["side"].to_numpy(zero_copy_only=False)
        ts = g["ts_us"].to_numpy(zero_copy_only=False).astype(np.int64)
        eid = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lmask = side == 0
        if not lmask.any():
            return pa.table({"event_id": pa.array([], pa.int64()),
                             "user_id": pa.array([], pa.int64()),
                             "ts_us": pa.array([], pa.int64()),
                             "n_right": pa.array([], pa.int64())})
        rts = np.sort(ts[side == 1])
        lts, lid = ts[lmask], eid[lmask]
        lo = np.searchsorted(rts, lts - w_us, side="right")
        hi = np.searchsorted(rts, lts, side="right")
        uid = int(g["user_id"][0].as_py())
        return pa.table({
            "event_id": pa.array(lid, pa.int64()),
            "user_id": pa.array(np.full(lid.size, uid, dtype=np.int64),
                                pa.int64()),
            "ts_us": pa.array(lts, pa.int64()),
            "n_right": pa.array((hi - lo).astype(np.int64), pa.int64()),
        })

    return events.map_batches(project, batch_format="pyarrow") \
                 .groupby("user_id") \
                 .map_groups(count_group, batch_format="pyarrow")


def equi_join(left: ray.data.Dataset, right: ray.data.Dataset,
              left_key: str, right_key: str,
              left_cols: list[str], right_cols: list[str],
              key_alias: str = "key") -> ray.data.Dataset:
    """Distributed big-big INNER equi-join — the general repartition join
    (both sides too large to broadcast; completes the join family next to
    the broadcast join ``orders_by_nation``, :func:`asof_join_events` and
    :func:`interval_join_counts`).

    Shape = tagged-union co-group, the same single-shuffle pattern as the
    as-of join: each side projects to narrow (key, side, carried cols)
    rows where the other side's columns are typed nulls, the union
    shuffles ONCE on the key, and each group task emits the in-group
    cross product vectorized (np.repeat × np.tile + pc.take).

    Partitioning assumption: one key's rows fit one task (true for
    orderkey-like keys with bounded fan-in; a pathological hot key needs
    the salted-broadcast variant instead).  Carried columns stay as
    narrow as the caller projects them — content-sized payloads should
    join on ids and fetch payloads afterwards."""
    import pyarrow.compute as pc

    l_types = dict(zip(left.schema().names, left.schema().types))
    r_types = dict(zip(right.schema().names, right.schema().types))
    key_type = l_types[left_key]
    out_cols = ([(c, l_types[c], 0) for c in left_cols]
                + [(c, r_types[c], 1) for c in right_cols])

    def project(side_id: int, key_col: str):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cols: dict[str, pa.Array | pa.ChunkedArray] = {
                key_alias: batch[key_col].cast(key_type),
                "side": pa.array(np.full(n, side_id, np.int8), pa.int8()),
            }
            for name, typ, owner in out_cols:
                cols[name] = (batch[name] if owner == side_id
                              else pa.nulls(n, typ))
            return pa.table(cols)
        return fn

    tagged = left.map_batches(project(0, left_key),
                              batch_format="pyarrow") \
        .union(right.map_batches(project(1, right_key),
                                 batch_format="pyarrow"))

    empty = pa.schema([pa.field(key_alias, key_type)]
                      + [pa.field(n, t) for n, t, _ in out_cols])

    def join_group(g: pa.Table) -> pa.Table:
        side = g["side"].to_numpy(zero_copy_only=False)
        li = np.flatnonzero(side == 0)
        ri = np.flatnonzero(side == 1)
        if li.size == 0 or ri.size == 0:
            return empty.empty_table()
        lrep = np.repeat(li, ri.size)
        rtile = np.tile(ri, li.size)
        cols = {key_alias: pc.take(g[key_alias], pa.array(lrep))}
        for name, _, owner in out_cols:
            idx = lrep if owner == 0 else rtile
            cols[name] = pc.take(g[name], pa.array(idx))
        return pa.table(cols)

    return tagged.groupby(key_alias).map_groups(join_group,
                                                batch_format="pyarrow")


def order_revenue_join(lineitem: ray.data.Dataset,
                       orders: ray.data.Dataset) -> ray.data.Dataset:
    """Revenue per order priority via the big-big repartition join:
    lineitem ⋈ orders on orderkey (NEITHER side broadcast), then a small
    per-priority aggregate.  Revenue is exact fixed-point:
    rev_e6 = price_cents * (10000 - discount_bp) — int64-safe to ~10^5
    rows/order-priority-partition per 2^63 bound at TPC-H price ranges.
    -> (o_orderpriority, n_items, revenue_e6)."""
    import pyarrow.compute as pc

    def narrow_line(batch: pa.Table) -> pa.Table:
        price = batch["l_extendedprice"] \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        disc = batch["l_discount"] \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        cents = np.floor(price * 100 + 0.5).astype(np.int64)
        bp = np.floor(disc * 10_000 + 0.5).astype(np.int64)
        return pa.table({
            "l_orderkey": batch["l_orderkey"],
            "rev_e6": pa.array(cents * (10_000 - bp), pa.int64()),
        })

    def narrow_orders(batch: pa.Table) -> pa.Table:
        return batch.select(["o_orderkey", "o_orderpriority"])

    joined = equi_join(
        lineitem.map_batches(narrow_line, batch_format="pyarrow"),
        orders.map_batches(narrow_orders, batch_format="pyarrow"),
        "l_orderkey", "o_orderkey", ["rev_e6"], ["o_orderpriority"])

    def partial(batch: pa.Table) -> pa.Table:
        agg = pa.table({"o_orderpriority": batch["o_orderpriority"],
                        "rev_e6": batch["rev_e6"]}) \
            .group_by("o_orderpriority") \
            .aggregate([("rev_e6", "sum"), ("rev_e6", "count")])
        return agg.rename_columns(["o_orderpriority", "rev_p", "n_p"])

    return joined.map_batches(partial, batch_format="pyarrow") \
        .groupby("o_orderpriority") \
        .aggregate(Sum("n_p", alias_name="n_items"),
                   Sum("rev_p", alias_name="revenue_e6"))


def order_rank_window(orders: ray.data.Dataset,
                      tiles: int = 4) -> ray.data.Dataset:
    """SQL window functions per group — row_number / ntile(k) /
    percent_rank over (PARTITION BY custkey ORDER BY cents DESC,
    orderkey ASC), the ranking family the Dataset API lacks, expressed
    as ``groupby(custkey).map_groups`` with a fully vectorized in-group
    computation (one lexsort, integer ntile arithmetic, one IEEE
    division for percent_rank — both sides compute (rank-1)/(n-1) on the
    same ints so the e6 fixed-point matches DuckDB bit-for-bit).

    ntile reproduces the SQL semantics exactly: the first n % k buckets
    get ceil(n/k) rows, the rest floor(n/k).
    -> (o_custkey, o_orderkey, rnk, ntile{k}, pct_rank_e6)."""

    def rank_group(g: pa.Table) -> pa.Table:
        cents = np.floor(g["o_totalprice"].to_numpy(zero_copy_only=False)
                         .astype(np.float64) * 100 + 0.5).astype(np.int64)
        keys = g["o_orderkey"].to_numpy(zero_copy_only=False)
        order = np.lexsort((keys, -cents))
        n = order.size
        i = np.arange(n, dtype=np.int64)
        big, base = n % tiles, n // tiles
        if base == 0:
            tile = i
        else:
            cut = big * (base + 1)
            tile = np.where(i < cut, i // (base + 1),
                            big + (i - cut) // base)
        pct = i.astype(np.float64) / (n - 1) if n > 1 \
            else np.zeros(1, np.float64)
        return pa.table({
            "o_custkey": pa.array(
                g["o_custkey"].to_numpy(zero_copy_only=False)[order],
                pa.int64()),
            "o_orderkey": pa.array(keys[order], pa.int64()),
            "rnk": pa.array(i + 1, pa.int64()),
            f"ntile{tiles}": pa.array(tile + 1, pa.int64()),
            "pct_rank_e6": pa.array(
                np.floor(pct * 1_000_000 + 0.5).astype(np.int64),
                pa.int64()),
        })

    return orders.groupby("o_custkey").map_groups(rank_group,
                                                  batch_format="pyarrow")


def corr_value_k_by_type(events: ray.data.Dataset) -> pa.Table:
    """Exact Pearson correlation per event_type between ``value`` (as
    cents) and the JSON property ``k`` (RE2-extracted) — the two-pass-
    free moment aggregate: each batch folds (n, Σx, Σy, Σxx, Σxy, Σyy)
    locally (ints, exact), ONE tiny groupby merges partials, and the
    final r is computed from arbitrary-precision Python ints cast to
    float64 in the same op order DuckDB uses (HUGEINT -> DOUBLE ->
    x/sqrt(da)/sqrt(db)), so corr_e6 matches the oracle bit-for-bit.
    -> (event_type, n, corr_e6)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum as RSum

    pattern = '"k": (?P<v>[0-9]+)'

    def partial(batch: pa.Table) -> pa.Table:
        props = batch["props"]
        if isinstance(props, pa.ChunkedArray):
            props = props.combine_chunks()
        m = pc.extract_regex(props, pattern=pattern)
        arr = pc.cast(pc.struct_field(m, "v"), pa.int64())
        valid = pc.is_valid(arr).to_numpy(zero_copy_only=False)
        yv = arr.fill_null(0).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        x = np.floor(batch["value"].to_numpy(zero_copy_only=False)
                     .astype(np.float64) * 100 + 0.5).astype(np.int64)
        x = np.where(valid, x, 0)
        t = pa.table({
            "event_type": batch["event_type"],
            "one": pa.array(valid.astype(np.int64), pa.int64()),
            "x": pa.array(x, pa.int64()),
            "y": pa.array(yv, pa.int64()),
            "xx": pa.array(np.where(valid, x * x, 0), pa.int64()),
            "xy": pa.array(np.where(valid, x * yv, 0), pa.int64()),
            "yy": pa.array(np.where(valid, yv * yv, 0), pa.int64()),
        })
        agg = t.group_by("event_type").aggregate(
            [("one", "sum"), ("x", "sum"), ("y", "sum"),
             ("xx", "sum"), ("xy", "sum"), ("yy", "sum")])
        return agg.rename_columns(
            ["event_type", "n_p", "sx_p", "sy_p", "sxx_p", "sxy_p",
             "syy_p"])

    folded = events.map_batches(partial, batch_format="pyarrow") \
        .groupby("event_type") \
        .aggregate(RSum("n_p", alias_name="n"),
                   RSum("sx_p", alias_name="sx"),
                   RSum("sy_p", alias_name="sy"),
                   RSum("sxx_p", alias_name="sxx"),
                   RSum("sxy_p", alias_name="sxy"),
                   RSum("syy_p", alias_name="syy")) \
        .take_all()                       # <= n_event_types rows

    types, ns, corr = [], [], []
    for row in sorted(folded, key=lambda r: r["event_type"]):
        n, sx, sy = int(row["n"]), int(row["sx"]), int(row["sy"])
        sxx, sxy, syy = int(row["sxx"]), int(row["sxy"]), int(row["syy"])
        num = n * sxy - sx * sy           # exact Python ints (no overflow)
        da, db = n * sxx - sx * sx, n * syy - sy * sy
        r = 0.0 if da == 0 or db == 0 else \
            float(num) / np.sqrt(float(da)) / np.sqrt(float(db))
        types.append(row["event_type"])
        ns.append(n)
        corr.append(int(np.floor(r * 1_000_000 + 0.5)))
    return pa.table({"event_type": pa.array(types, pa.string()),
                     "n": pa.array(ns, pa.int64()),
                     "corr_e6": pa.array(corr, pa.int64())})


def source_lang_rollup(docs: ray.data.Dataset) -> ray.data.Dataset:
    """GROUPING-SETS / ROLLUP aggregate over documents metadata:
    (source, lang), (source), and the grand total in ONE result, the
    multi-level reporting aggregate SQL's ROLLUP produces.  Rolled-up
    positions carry the sentinel 'ALL' (the oracle COALESCEs its NULLs
    to the same sentinel).  -> (source, lang, n_docs, sum_chars).

    Shape: one distributed partial fold to the FINEST level (only
    (source, lang, partials) rows shuffle), then the coarser levels are
    derived from the finest result inside one final task — the rollup
    costs one small groupby, not three corpus passes."""

    def partial(batch: pa.Table) -> pa.Table:
        agg = pa.table({"source": batch["source"], "lang": batch["lang"],
                        "n_chars": batch["n_chars"]}) \
            .group_by(["source", "lang"]) \
            .aggregate([("n_chars", "count"), ("n_chars", "sum")])
        return agg.rename_columns(["source", "lang", "n_p", "chars_p"])

    finest = docs.map_batches(partial, batch_format="pyarrow") \
        .groupby(["source", "lang"]) \
        .aggregate(Sum("n_p", alias_name="n_docs"),
                   Sum("chars_p", alias_name="sum_chars"))

    def rollup(batch: pa.Table) -> pa.Table:
        bysrc = batch.group_by("source").aggregate(
            [("n_docs", "sum"), ("sum_chars", "sum")]) \
            .rename_columns(["source", "n_docs", "sum_chars"])
        n1 = bysrc.num_rows
        lvl1 = pa.table({
            "source": bysrc["source"], 
            "lang": pa.array(["ALL"] * n1, pa.string()),
            "n_docs": bysrc["n_docs"], "sum_chars": bysrc["sum_chars"]})
        import pyarrow.compute as pc
        lvl0 = pa.table({
            "source": pa.array(["ALL"], pa.string()),
            "lang": pa.array(["ALL"], pa.string()),
            "n_docs": pa.array([pc.sum(batch["n_docs"]).as_py() or 0],
                               pa.int64()),
            "sum_chars": pa.array([pc.sum(batch["sum_chars"]).as_py() or 0],
                                  pa.int64())})
        lvl2 = batch.select(["source", "lang", "n_docs", "sum_chars"])
        return pa.concat_tables([lvl2, lvl1, lvl0])

    # repartition(1): the finest level is O(sources × langs) rows — one
    # task derives the coarser levels (and kills empty-partition blocks)
    return finest.repartition(1).map_batches(rollup, batch_format="pyarrow")


def customer_activity(customer: ray.data.Dataset,
                      events: ray.data.Dataset) -> ray.data.Dataset:
    """LEFT OUTER join customer -> per-user event counts (zeros kept) —
    the outer member of the join family (broadcast / as-of / interval /
    inner repartition / left+anti).  Mirrors the reference's
    tenant-activity view (``ExportersManager.cs`` decides per-tenant
    work from a presence lookup).

    Scale shape: NO per-key ``map_groups``.  Events pre-aggregate to
    (user_id, n_p) per batch (combiner), customers project to
    (key, seg, 0); the tagged union shuffles ONCE and a vectorized
    sort-aggregate folds each key to ``Max(seg)`` (exactly one customer
    row per key carries the segment; event rows carry null, which Max
    skips) + ``Sum(n_p)``.  Event keys with no customer row surface with
    seg=null and are dropped (left semantics).
    -> (c_custkey, c_mktsegment, n_events) sorted by c_custkey."""
    import pyarrow.compute as pc

    def proj_cust(batch: pa.Table) -> pa.Table:
        return pa.table({
            "key": batch["c_custkey"].cast(pa.int64()),
            "seg": batch["c_mktsegment"],
            "n_p": pa.array(np.zeros(batch.num_rows, np.int64), pa.int64()),
        })

    def proj_events(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keys, counts = np.unique(uid, return_counts=True)
        return pa.table({
            "key": pa.array(keys, pa.int64()),
            "seg": pa.nulls(keys.size, pa.string()),
            "n_p": pa.array(counts.astype(np.int64), pa.int64()),
        })

    tagged = customer.map_batches(proj_cust, batch_format="pyarrow") \
        .union(events.map_batches(proj_events, batch_format="pyarrow"))
    agg = tagged.groupby("key").aggregate(
        Max("seg", alias_name="c_mktsegment"),
        Sum("n_p", alias_name="n_events"))

    def finish(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch["c_mktsegment"]))
        return pa.table({
            "c_custkey": batch["key"],
            "c_mktsegment": batch["c_mktsegment"],
            "n_events": batch["n_events"].cast(pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow") \
        .sort("c_custkey")


def segment_activity(customer: ray.data.Dataset,
                     events: ray.data.Dataset) -> pa.Table:
    """Anti-join rollup: per market segment, how many customers have
    NO event activity (NOT EXISTS) vs some — the semi/anti-join pair
    folded to a small table.  Reuses :func:`customer_activity`'s
    single-shuffle left join, then one partial count fold on
    (segment, active) — nothing corpus-sized reaches the driver.
    -> (c_mktsegment, n_customers, n_active, n_inactive) by segment."""
    import pyarrow.compute as pc
    per_cust = customer_activity(customer, events)

    def partial(batch: pa.Table) -> pa.Table:
        active = pc.greater(batch["n_events"], 0)
        seg = batch["c_mktsegment"]
        act = active.combine_chunks() if isinstance(active, pa.ChunkedArray) \
            else active
        t = pa.table({"seg": seg, "a": act})
        g = t.group_by(["seg", "a"]).aggregate([([], "count_all")])
        return pa.table({
            "c_mktsegment": g["seg"],
            "a": g["a"],
            "n_p": g["count_all"].cast(pa.int64()),
        })

    folded = per_cust.map_batches(partial, batch_format="pyarrow") \
        .groupby(["c_mktsegment", "a"]) \
        .aggregate(Sum("n_p", alias_name="n")).take_all()
    segs = sorted({r["c_mktsegment"] for r in folded})
    n_all = {s: 0 for s in segs}
    n_act = {s: 0 for s in segs}
    for r in folded:
        n_all[r["c_mktsegment"]] += int(r["n"])
        if r["a"]:
            n_act[r["c_mktsegment"]] += int(r["n"])
    return pa.table({
        "c_mktsegment": pa.array(segs, pa.string()),
        "n_customers": pa.array([n_all[s] for s in segs], pa.int64()),
        "n_active": pa.array([n_act[s] for s in segs], pa.int64()),
        "n_inactive": pa.array([n_all[s] - n_act[s] for s in segs],
                               pa.int64()),
    })


def price_percentiles(lineitem: ray.data.Dataset,
                      pcts: tuple[int, ...] = (25, 50, 75, 90)
                      ) -> ray.data.Dataset:
    """Exact per-group percentile_disc (the ES ``percentiles`` agg, but
    exact instead of t-digest): for each l_returnflag, the discrete
    p25/p50/p75/p90 of l_extendedprice.  percentile_disc picks an
    EXISTING value — index ``ceil(q*n) - 1`` over the sorted group,
    computed in exact integers (``(p*n + 99) // 100 - 1``) so the SQL
    oracle agrees bit-for-bit with no float-boundary risk.
    -> (l_returnflag, n, p25_e6, p50_e6, p75_e6, p90_e6)."""

    def pct(group: pa.Table) -> pa.Table:
        v = np.sort(group["l_extendedprice"]
                    .to_numpy(zero_copy_only=False).astype(np.float64))
        n = v.size
        cols = {
            "l_returnflag": pa.array([group["l_returnflag"][0].as_py()],
                                     pa.string()),
            "n": pa.array([n], pa.int64()),
        }
        for p in pcts:
            idx = (p * n + 99) // 100 - 1
            cols[f"p{p}_e6"] = pa.array(
                [int(np.floor(v[idx] * 1_000_000 + 0.5))], pa.int64())
        return pa.table(cols)

    return lineitem.groupby("l_returnflag").map_groups(
        pct, batch_format="pyarrow")


def q3_top_revenue(customer: ray.data.Dataset, orders: ray.data.Dataset,
                   lineitem: ray.data.Dataset, segment: str = "BUILDING",
                   cutoff_us: int = 0, k: int = 10) -> pa.Table:
    """TPC-H-Q3-shaped three-way join composition: customers of one
    market segment x orders placed before the cutoff x lineitems shipped
    after it, revenue per order, top-k.  Exercises the engine's whole
    join toolbox in ONE pipeline: broadcast semi-filter (customer keys
    -> orders), per-batch partial aggregation (lineitem revenue folds
    BEFORE the shuffle), and the tagged-union co-group (orders +
    revenue partials meet in one key shuffle; inner semantics fall out
    of null/zero drops).

    Revenue is EXACT: price and discount are 2-decimal values, so
    ``round(price*100) * round((1-disc)*100)`` is an integer e4 amount —
    sums are order-free and bit-identical to the SQL oracle.
    -> (o_orderkey, revenue_e4, o_orderdate_us) top-k by
    (revenue desc, orderkey asc)."""
    import pyarrow.compute as pc
    import ray

    # broadcast semi-filter: segment custkeys ship once (at 100 TB with
    # ~1/5 of all customers in a segment, swap for the tagged co-group —
    # same downstream shape; this is the J1/J2 small-side path)
    ckeys = np.sort(np.concatenate([
        b["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        for b in customer.filter(
            expr=f"c_mktsegment == '{segment}'")
        .select_columns(["c_custkey"])
        .iter_batches(batch_format="pyarrow", batch_size=None)] or
        [np.empty(0, np.int64)]))
    ckeys_ref = ray.put(ckeys)

    def proj_orders(batch: pa.Table) -> pa.Table:
        keys = ray.get(ckeys_ref)
        okey = batch["o_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ckey = batch["o_custkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        odate = batch["o_orderdate"].cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        m = (odate < cutoff_us) & np.isin(ckey, keys)
        return pa.table({
            "key": pa.array(okey[m], pa.int64()),
            "odate": pa.array(odate[m], pa.int64()),
            "rev_p": pa.array(np.zeros(int(m.sum()), np.int64), pa.int64()),
        })

    def proj_line(batch: pa.Table) -> pa.Table:
        okey = batch["l_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ship = batch["l_shipdate"].cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        m = ship > cutoff_us
        rev = (np.floor(price[m] * 100 + 0.5).astype(np.int64)
               * np.floor((1.0 - disc[m]) * 100 + 0.5).astype(np.int64))
        keys, inv = np.unique(okey[m], return_inverse=True)
        part = np.zeros(keys.size, dtype=np.int64)
        np.add.at(part, inv, rev)
        return pa.table({
            "key": pa.array(keys, pa.int64()),
            "odate": pa.nulls(keys.size, pa.int64()),
            "rev_p": pa.array(part, pa.int64()),
        })

    tagged = orders.map_batches(proj_orders, batch_format="pyarrow") \
        .union(lineitem.map_batches(proj_line, batch_format="pyarrow"))
    agg = tagged.groupby("key").aggregate(
        Max("odate", alias_name="o_orderdate_us"),
        Sum("rev_p", alias_name="revenue_e4"))

    def local_topk(batch: pa.Table) -> pa.Table:
        # inner semantics: need BOTH an order row (odate non-null) and
        # revenue > 0 (at least one qualifying lineitem)
        m = pc.and_(pc.is_valid(batch["o_orderdate_us"]),
                    pc.greater(batch["revenue_e4"], 0))
        t = batch.filter(m)
        rev = t["revenue_e4"].to_numpy(zero_copy_only=False).astype(np.int64)
        keys = t["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((keys, -rev))[:k]
        return pa.table({
            "o_orderkey": pa.array(keys[order], pa.int64()),
            "revenue_e4": pa.array(rev[order], pa.int64()),
            "o_orderdate_us": pa.array(
                t["o_orderdate_us"].to_numpy(zero_copy_only=False)
                .astype(np.int64)[order], pa.int64()),
        })

    cand = agg.map_batches(local_topk, batch_format="pyarrow").take_all()
    rev = np.asarray([r["revenue_e4"] for r in cand], dtype=np.int64)
    keys = np.asarray([r["o_orderkey"] for r in cand], dtype=np.int64)
    order = np.lexsort((keys, -rev))[:k]
    return pa.table({
        "o_orderkey": pa.array(keys[order], pa.int64()),
        "revenue_e4": pa.array(rev[order], pa.int64()),
        "o_orderdate_us": pa.array(
            np.asarray([r["o_orderdate_us"] for r in cand],
                       dtype=np.int64)[order], pa.int64()),
    })


def composite_agg(ds: ray.data.Dataset, keys: list[str],
                  after: tuple | None = None, size: int = 10) -> pa.Table:
    """ES ``composite`` aggregation: deterministic key-ordered buckets
    with ``after``-key cursor pagination — the agg-side sibling of
    search_after (resumable full exports of a grouped result).  Buckets
    strictly AFTER the cursor tuple in lexicographic key order.

    Shape: per-batch partial counts (combiner) -> one groupby over
    bucket-cardinality rows -> ordered cursor cut.  The folded bucket
    table is cardinality-sized; a truly unbounded key space would page
    the FOLD itself by key range (same cursor, pushed into the read
    predicate).  -> (keys..., n_rows) page of ``size``."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select(keys).group_by(keys).aggregate([([], "count_all")])
        return g.rename_columns(keys + ["n_p"])

    folded = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(keys).aggregate(Sum("n_p", alias_name="n_rows")) \
        .take_all()
    rows = sorted(((tuple(r[c] for c in keys), int(r["n_rows"]))
                   for r in folded))
    if after is not None:
        rows = [r for r in rows if r[0] > tuple(after)]
    rows = rows[:size]
    cols = {c: pa.array([r[0][i] for r in rows])
            for i, c in enumerate(keys)}
    cols["n_rows"] = pa.array([r[1] for r in rows], pa.int64())
    return pa.table(cols)


def source_lang_cube(docs: ray.data.Dataset) -> ray.data.Dataset:
    """GROUP BY CUBE(source, lang): all FOUR grouping sets —
    (source, lang), (source), (lang), () — derived from ONE distributed
    finest-level fold (the ROLLUP's missing (lang) level costs one more
    tiny local group_by, never another corpus pass).  Sentinel 'ALL' in
    rolled-up positions.  -> (source, lang, n_docs, sum_chars)."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        agg = pa.table({"source": batch["source"], "lang": batch["lang"],
                        "n_chars": batch["n_chars"]}) \
            .group_by(["source", "lang"]) \
            .aggregate([("n_chars", "count"), ("n_chars", "sum")])
        return agg.rename_columns(["source", "lang", "n_p", "chars_p"])

    finest = docs.map_batches(partial, batch_format="pyarrow") \
        .groupby(["source", "lang"]) \
        .aggregate(Sum("n_p", alias_name="n_docs"),
                   Sum("chars_p", alias_name="sum_chars"))

    def cube(batch: pa.Table) -> pa.Table:
        def lvl(keys: list[str]) -> pa.Table:
            if keys:
                g = batch.group_by(keys).aggregate(
                    [("n_docs", "sum"), ("sum_chars", "sum")]) \
                    .rename_columns(keys + ["n_docs", "sum_chars"])
            else:
                g = pa.table({
                    "n_docs": pa.array(
                        [pc.sum(batch["n_docs"]).as_py() or 0], pa.int64()),
                    "sum_chars": pa.array(
                        [pc.sum(batch["sum_chars"]).as_py() or 0],
                        pa.int64())})
            n = g.num_rows
            cols = {
                "source": g["source"] if "source" in keys
                else pa.array(["ALL"] * n, pa.string()),
                "lang": g["lang"] if "lang" in keys
                else pa.array(["ALL"] * n, pa.string()),
                "n_docs": g["n_docs"].cast(pa.int64()),
                "sum_chars": g["sum_chars"].cast(pa.int64()),
            }
            return pa.table(cols)

        return pa.concat_tables([lvl(["source", "lang"]), lvl(["source"]),
                                 lvl(["lang"]), lvl([])])

    return finest.repartition(1).map_batches(cube, batch_format="pyarrow") \
        .sort(["source", "lang"])


_PROFILE_NONE_MIN = 1 << 62
_PROFILE_NONE_MAX = -(1 << 62)


def profile_table(ds: ray.data.Dataset, columns: list[str],
                  numeric_cols: tuple[str, ...] = ()) -> pa.Table:
    """Data-quality PROFILE: per column, row count, null count, EXACT
    distinct count, and (numeric columns) e6 min/max — the first pass
    every ingestion pipeline runs over a new table.

    One streaming pass: each batch emits tiny per-column partials
    (n, nulls, min, max) plus the batch's DISTINCT md5-hashed values as
    narrow (col, h) rows; one groupby-distinct fold counts them.  The
    md5-of-string-cast hashing makes the distinct count type-agnostic
    AND exactly SQL-reproducible.  At 10^12 rows swap the exact
    distinct fold for the HLL sketch (same pipeline shape, documented
    trade).  -> (column, n, n_nulls, n_distinct, min_e6, max_e6)."""
    import pyarrow.compute as pc
    from onestools_eventlog_ray.functions.fasthash import md5_lower64
    from ray.data.aggregate import Max as RMax, Min as RMin, Sum as RSum

    def partials(batch: pa.Table) -> pa.Table:
        rows = {"column": [], "n_p": [], "null_p": [],
                "min_p": [], "max_p": []}
        for c in columns:
            col = batch[c]
            rows["column"].append(c)
            rows["n_p"].append(batch.num_rows)
            rows["null_p"].append(col.null_count)
            # non-numeric / all-null partials use int SENTINELS instead of
            # nulls: a null min_p would make Ray's Min aggregate emit a
            # null-TYPED column for some output partitions (schema
            # divergence warnings); sentinels keep every block int64 and
            # are mapped back to NULL in the final table below
            if c in numeric_cols:
                v = col.cast(pa.float64())
                mn, mx = pc.min(v).as_py(), pc.max(v).as_py()
                rows["min_p"].append(
                    _PROFILE_NONE_MIN if mn is None
                    else int(np.floor(mn * 1_000_000 + 0.5)))
                rows["max_p"].append(
                    _PROFILE_NONE_MAX if mx is None
                    else int(np.floor(mx * 1_000_000 + 0.5)))
            else:
                rows["min_p"].append(_PROFILE_NONE_MIN)
                rows["max_p"].append(_PROFILE_NONE_MAX)
        return pa.table({
            "column": pa.array(rows["column"], pa.string()),
            "n_p": pa.array(rows["n_p"], pa.int64()),
            "null_p": pa.array(rows["null_p"], pa.int64()),
            "min_p": pa.array(rows["min_p"], pa.int64()),
            "max_p": pa.array(rows["max_p"], pa.int64()),
        })

    def distinct_partial(batch: pa.Table) -> pa.Table:
        cols_out, hs_out = [], []
        for c in columns:
            col = batch[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            valid = col.drop_null()
            if len(valid) == 0:
                continue
            h = np.unique(md5_lower64(
                pc.cast(valid, pa.string())).astype(np.int64))
            cols_out.append(np.full(h.size, columns.index(c), np.int64))
            hs_out.append(h)
        if not cols_out:
            return pa.table({"ci": pa.array([], pa.int64()),
                             "h": pa.array([], pa.int64())})
        return pa.table({
            "ci": pa.array(np.concatenate(cols_out), pa.int64()),
            "h": pa.array(np.concatenate(hs_out), pa.int64()),
        })

    base = ds.map_batches(partials, batch_format="pyarrow") \
        .groupby("column") \
        .aggregate(RSum("n_p", alias_name="n"),
                   RSum("null_p", alias_name="n_nulls"),
                   RMin("min_p", alias_name="min_e6"),
                   RMax("max_p", alias_name="max_e6")).take_all()
    dist = ds.map_batches(distinct_partial, batch_format="pyarrow") \
        .groupby(["ci", "h"]).count() \
        .groupby("ci").count().take_all()
    n_dist = {columns[int(r["ci"])]: int(r["count()"]) for r in dist}
    by_col = {r["column"]: r for r in base}
    return pa.table({
        "column": pa.array(columns, pa.string()),
        "n": pa.array([by_col[c]["n"] for c in columns], pa.int64()),
        "n_nulls": pa.array([by_col[c]["n_nulls"] for c in columns],
                            pa.int64()),
        "n_distinct": pa.array([n_dist.get(c, 0) for c in columns],
                               pa.int64()),
        "min_e6": pa.array([None if by_col[c]["min_e6"] == _PROFILE_NONE_MIN
                            else by_col[c]["min_e6"] for c in columns],
                           pa.int64()),
        "max_e6": pa.array([None if by_col[c]["max_e6"] == _PROFILE_NONE_MAX
                            else by_col[c]["max_e6"] for c in columns],
                           pa.int64()),
    })


def extended_stats_by_group(ds: ray.data.Dataset, key: str = "lang",
                            col: str = "n_chars") -> pa.Table:
    """ES ``extended_stats`` aggregation (count / sum / min / max /
    sum_of_squares / avg / variance) per ``key`` over an integer metric
    column — the metric bundle the reference's dashboards read off the
    ES index in one agg request
    (``/root/reference/OneSTools.EventLog.Exporter.Core/ElasticSearch/ElasticSearchStorage.cs:200-236``
    serves the same surface).

    Exactness: every partial is an int64 sum (per-batch Acero group_by),
    the fold is order-free integer addition, and avg/variance finalize
    in arbitrary-precision Python ints on the group-count-sized result:
    ``avg_e6   = sum * 1e6 // n``
    ``var_e6   = (n * sum_sq - sum**2) * 1e6 // n**2``  (population
    variance; numerator is the integer second moment identity, so no
    float cancellation at any scale).  Scale shape: the corpus never
    shuffles — only one tiny partial row per (batch, group)."""

    def partials(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        v = batch[col].cast(pa.int64())
        t = pa.table({key: batch[key], "v": v,
                      "v2": pc.multiply_checked(v, v)})
        agg = t.group_by(key).aggregate(
            [("v", "count"), ("v", "sum"), ("v2", "sum"),
             ("v", "min"), ("v", "max")])
        return agg.rename_columns(
            [key, "n_p", "sum_p", "sumsq_p", "min_p", "max_p"])

    folded = ds.map_batches(partials, batch_format="pyarrow") \
        .groupby(key) \
        .aggregate(Sum("n_p", alias_name="n"),
                   Sum("sum_p", alias_name="sum_v"),
                   Sum("sumsq_p", alias_name="sum_sq"),
                   Min("min_p", alias_name="min_v"),
                   Max("max_p", alias_name="max_v")).take_all()
    folded.sort(key=lambda r: r[key])
    E6 = 1_000_000
    avg, var = [], []
    for r in folded:
        n, s, s2 = int(r["n"]), int(r["sum_v"]), int(r["sum_sq"])
        avg.append(s * E6 // n)
        var.append((n * s2 - s * s) * E6 // (n * n))
    return pa.table({
        key: pa.array([r[key] for r in folded], pa.string()),
        "n": pa.array([int(r["n"]) for r in folded], pa.int64()),
        "sum_v": pa.array([int(r["sum_v"]) for r in folded], pa.int64()),
        "min_v": pa.array([int(r["min_v"]) for r in folded], pa.int64()),
        "max_v": pa.array([int(r["max_v"]) for r in folded], pa.int64()),
        "sum_sq": pa.array([int(r["sum_sq"]) for r in folded], pa.int64()),
        "avg_e6": pa.array(avg, pa.int64()),
        "var_e6": pa.array(var, pa.int64()),
    })


def q6_revenue(lineitem: ray.data.Dataset,
               date_lo_us: int = 0, date_hi_us: int = 0,
               disc_lo_e2: int = 5, disc_hi_e2: int = 7,
               max_qty: float = 24.0) -> pa.Table:
    """TPC-H-Q6-shaped forecast-revenue scan: one streaming pass over
    lineitem with a date-range + discount-band + quantity predicate,
    folding ``sum(price * discount)`` as EXACT e4 integers
    (``floor(price*100+.5) * floor(disc*100+.5)`` — 2-decimal money, so
    the sum is order-free and bit-identical to the SQL oracle).  The
    canonical predicate-pushdown aggregate: no shuffle, no groupby,
    per-batch partials fold to one row.  -> (revenue_e4, n_rows)."""

    def partial(batch: pa.Table) -> pa.Table:
        ship = batch["l_shipdate"].cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        de2 = np.floor(disc * 100 + 0.5).astype(np.int64)
        m = ((ship >= date_lo_us) & (ship < date_hi_us)
             & (de2 >= disc_lo_e2) & (de2 <= disc_hi_e2)
             & (qty < max_qty))
        pe2 = np.floor(price[m] * 100 + 0.5).astype(np.int64)
        return pa.table({
            "rev_p": pa.array([int((pe2 * de2[m]).sum())], pa.int64()),
            "n_p": pa.array([int(m.sum())], pa.int64()),
        })

    agg = lineitem.map_batches(partial, batch_format="pyarrow") \
        .sum(["rev_p", "n_p"])
    return pa.table({
        "revenue_e4": pa.array([int(agg["sum(rev_p)"])], pa.int64()),
        "n_rows": pa.array([int(agg["sum(n_p)"])], pa.int64()),
    })


def running_revenue(orders: ray.data.Dataset) -> ray.data.Dataset:
    """Per-customer running order total (cumulative window function):
    for every order, the sum of that customer's order prices up to and
    including it, ordered by (o_orderdate, o_orderkey).  The partition
    key is the customer, so ``groupby(custkey).map_groups`` gives each
    task one customer's orders to sort + prefix-sum locally — the
    standard distributed PARTITION BY window shape (a single mega-key
    is the documented skew limit, same as sessionize).  Prices fold as
    exact e2 integers.  -> (o_custkey, o_orderkey, cum_price_e2)."""

    def proj(batch: pa.Table) -> pa.Table:
        price = batch["o_totalprice"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return pa.table({
            "o_custkey": batch["o_custkey"].cast(pa.int64()),
            "o_orderkey": batch["o_orderkey"].cast(pa.int64()),
            "odate": batch["o_orderdate"].cast(pa.int64()),
            "pe2": pa.array(np.floor(price * 100 + 0.5).astype(np.int64),
                            pa.int64()),
        })

    def cum(g: pa.Table) -> pa.Table:
        okey = g["o_orderkey"].to_numpy(zero_copy_only=False)
        odate = g["odate"].to_numpy(zero_copy_only=False)
        pe2 = g["pe2"].to_numpy(zero_copy_only=False)
        order = np.lexsort((okey, odate))
        return pa.table({
            "o_custkey": g["o_custkey"].take(pa.array(order)),
            "o_orderkey": pa.array(okey[order], pa.int64()),
            "cum_price_e2": pa.array(np.cumsum(pe2[order]), pa.int64()),
        })

    return orders.map_batches(proj, batch_format="pyarrow") \
        .groupby("o_custkey").map_groups(cum, batch_format="pyarrow")


def weighted_avg_price(lineitem: ray.data.Dataset) -> ray.data.Dataset:
    """ES ``weighted_avg`` aggregation shape: per return flag, the
    quantity-weighted average extended price.  Per-batch Acero partials
    (sum(price_e2 * qty_e2), sum(qty_e2)) -> flag-keyed fold ->
    ``wavg_e6 = 1e4 * sum(p*q) // sum(q)`` — all integers, floor both
    sides.  -> (l_returnflag, n, wavg_e6) sorted by flag."""
    from ray.data.aggregate import Sum as RSum

    def partial(batch: pa.Table) -> pa.Table:
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        pe2 = np.floor(price * 100 + 0.5).astype(np.int64)
        qe2 = np.floor(qty * 100 + 0.5).astype(np.int64)
        g = pa.table({"l_returnflag": batch["l_returnflag"],
                      "pq": pa.array(pe2 * qe2, pa.int64()),
                      "q": pa.array(qe2, pa.int64())}) \
            .group_by("l_returnflag") \
            .aggregate([("pq", "sum"), ("q", "sum"), ([], "count_all")])
        return pa.table({"l_returnflag": g["l_returnflag"],
                         "pq_p": g["pq_sum"].cast(pa.int64()),
                         "q_p": g["q_sum"].cast(pa.int64()),
                         "n_row": g["count_all"].cast(pa.int64())})

    folded = lineitem.map_batches(partial, batch_format="pyarrow") \
        .groupby("l_returnflag") \
        .aggregate(RSum("pq_p", alias_name="pq"),
                   RSum("q_p", alias_name="q"),
                   RSum("n_row", alias_name="n"))

    def finish(batch: pa.Table) -> pa.Table:
        pq = batch["pq"].to_numpy(zero_copy_only=False).astype(np.int64)
        q = batch["q"].to_numpy(zero_copy_only=False).astype(np.int64)
        # unbounded Python ints: 1e4 * sum(p*q) overflows int64 at scale
        # (group count is tiny here, the loop is over GROUPS not rows)
        wavg = np.asarray([10_000 * int(a) // int(b) if b else 0
                           for a, b in zip(pq, q)], dtype=np.int64)
        return pa.table({"l_returnflag": batch["l_returnflag"],
                         "n": batch["n"].cast(pa.int64()),
                         "wavg_e6": pa.array(wavg, pa.int64())})

    # repartition(1): the fold is a handful of flag groups; one block in
    # the final sort avoids empty-partition schema warnings
    return folded.map_batches(finish, batch_format="pyarrow") \
        .repartition(1).sort("l_returnflag")


def q5_region_revenue(customer: ray.data.Dataset, orders: ray.data.Dataset,
                      lineitem: ray.data.Dataset, supplier: pa.Table,
                      nation: pa.Table, region: pa.Table,
                      region_name: str = "ASIA") -> pa.Table:
    """TPC-H-Q5-shaped five-way join: revenue per nation from lineitems
    whose SUPPLIER sits in the same nation as the ordering CUSTOMER,
    customers restricted to one region.  Join plan (the multi-join
    toolbox in one pipeline):

    - region x nation x supplier are broadcast lookups (tiny dims);
      the customer->nationkey map is broadcast too (documented
      small-side assumption — at 10^9 customers swap for a key-salted
      co-group, downstream shape unchanged);
    - orders stream -> (orderkey, c_nat) rows for in-region customers;
      lineitem stream -> per-(orderkey) revenue partials PIVOTED into
      one column per nation (25 fixed TPC-H nations), so the
      same-nation match after the single orderkey shuffle is a
      vectorized column-take, never a per-group Python loop;
    - one tagged-union ``groupby(orderkey)`` co-group, then a tiny
      per-nation fold.

    Revenue is exact e4: ``floor(price*100+.5) * floor((1-disc)*100+.5)``.
    -> (n_name, revenue_e4) by (revenue desc, name asc)."""
    import pyarrow.compute as pc
    import ray

    n_nat = nation.num_rows
    rkeys = {r["r_regionkey"]: r["r_name"] for r in region.to_pylist()}
    nat_name = {int(r["n_nationkey"]): r["n_name"]
                for r in nation.to_pylist()}
    in_region = {int(r["n_nationkey"]) for r in nation.to_pylist()
                 if rkeys[r["n_regionkey"]] == region_name}
    supp_nat = np.full(
        int(max(r["s_suppkey"] for r in supplier.to_pylist())) + 1, -1,
        dtype=np.int64)
    for r in supplier.to_pylist():
        supp_nat[int(r["s_suppkey"])] = int(r["s_nationkey"])

    cust_nat: dict[int, int] = {}
    for b in customer.select_columns(["c_custkey", "c_nationkey"]) \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        ck = b["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        nk = b["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = np.isin(nk, np.asarray(sorted(in_region), dtype=np.int64))
        cust_nat.update(zip(ck[m].tolist(), nk[m].tolist()))
    cust_keys = np.asarray(sorted(cust_nat), dtype=np.int64)
    cust_vals = np.asarray([cust_nat[k] for k in cust_keys], dtype=np.int64)
    cref = ray.put((cust_keys, cust_vals))
    sref = ray.put(supp_nat)

    rev_cols = [f"rev_{j}" for j in range(n_nat)]

    def proj_orders(batch: pa.Table) -> pa.Table:
        keys, vals = ray.get(cref)
        okey = batch["o_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ckey = batch["o_custkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if keys.size:
            pos = np.searchsorted(keys, ckey)
            pos[pos >= keys.size] = 0
            m = keys[pos] == ckey
        else:
            pos = np.zeros(ckey.size, dtype=np.int64)
            m = np.zeros(ckey.size, dtype=bool)
        cols = {"key": pa.array(okey[m], pa.int64()),
                "c_nat": pa.array(vals[pos[m]], pa.int64())}
        for c in rev_cols:
            cols[c] = pa.array(np.zeros(int(m.sum()), np.int64), pa.int64())
        return pa.table(cols)

    def proj_line(batch: pa.Table) -> pa.Table:
        snat = ray.get(sref)
        okey = batch["l_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        skey = batch["l_suppkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        rev = (np.floor(price * 100 + 0.5).astype(np.int64)
               * np.floor((1.0 - disc) * 100 + 0.5).astype(np.int64))
        sn = snat[skey]
        keys, inv = np.unique(okey, return_inverse=True)
        pivot = np.zeros((keys.size, n_nat), dtype=np.int64)
        np.add.at(pivot, (inv, sn), rev)
        cols = {"key": pa.array(keys, pa.int64()),
                "c_nat": pa.nulls(keys.size, pa.int64())}
        for j, c in enumerate(rev_cols):
            cols[c] = pa.array(pivot[:, j], pa.int64())
        return pa.table(cols)

    tagged = orders.map_batches(proj_orders, batch_format="pyarrow") \
        .union(lineitem.map_batches(proj_line, batch_format="pyarrow"))
    agg = tagged.groupby("key").aggregate(
        Max("c_nat", alias_name="c_nat"),
        *[Sum(c, alias_name=c) for c in rev_cols])

    def finish(batch: pa.Table) -> pa.Table:
        m = pc.is_valid(batch["c_nat"])
        t = batch.filter(m)
        if not t.num_rows:
            return pa.table({"c_nat": pa.array([], pa.int64()),
                             "rev_p": pa.array([], pa.int64())})
        cn = t["c_nat"].to_numpy(zero_copy_only=False).astype(np.int64)
        pivot = np.stack([t[c].to_numpy(zero_copy_only=False)
                          .astype(np.int64) for c in rev_cols], axis=1)
        rev = pivot[np.arange(cn.size), cn]       # same-nation match
        keys, inv = np.unique(cn, return_inverse=True)
        part = np.zeros(keys.size, dtype=np.int64)
        np.add.at(part, inv, rev)
        nz = part > 0
        return pa.table({"c_nat": pa.array(keys[nz], pa.int64()),
                         "rev_p": pa.array(part[nz], pa.int64())})

    parts = agg.map_batches(finish, batch_format="pyarrow").take_all()
    acc: dict[int, int] = {}
    for r in parts:
        acc[int(r["c_nat"])] = acc.get(int(r["c_nat"]), 0) + int(r["rev_p"])
    rows = sorted(((nat_name[k], v) for k, v in acc.items()),
                  key=lambda x: (-x[1], x[0]))
    return pa.table({
        "n_name": pa.array([r[0] for r in rows], pa.string()),
        "revenue_e4": pa.array([r[1] for r in rows], pa.int64()),
    })


def outlier_events(events: ray.data.Dataset,
                   z: float = 3.0) -> ray.data.Dataset:
    """Per-type z-score outliers (the anomaly gate of a data-quality
    pipeline): events whose value is more than ``z`` population
    standard deviations from their type's mean.  Two streaming passes:
    exact integer (n, sum, sumsq) per type over e3-quantized values ->
    tiny broadcast -> vectorized flag.  The comparison squares both
    sides — ``(n*v - s)^2 > z^2 * (n*s2 - s*s)`` — with the float ops
    mirrored EXACTLY by the SQL oracle (each side is a single product
    of exactly-cast integers, no summation-order hazard).
    -> (event_id, event_type, value_e3)."""
    import ray
    from ray.data.aggregate import Sum as RSum

    def partial(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        ve3 = np.floor(v * 1000 + 0.5).astype(np.int64)
        g = pa.table({"event_type": batch["event_type"],
                      "s": pa.array(ve3, pa.int64()),
                      "s2": pa.array(ve3 * ve3, pa.int64())}) \
            .group_by("event_type") \
            .aggregate([("s", "sum"), ("s2", "sum"), ([], "count_all")])
        return pa.table({"event_type": g["event_type"],
                         "n_p": g["count_all"].cast(pa.int64()),
                         "s_p": g["s_sum"].cast(pa.int64()),
                         "s2_p": g["s2_sum"].cast(pa.int64())})

    stats = events.map_batches(partial, batch_format="pyarrow") \
        .groupby("event_type") \
        .aggregate(RSum("n_p", alias_name="n"),
                   RSum("s_p", alias_name="s"),
                   RSum("s2_p", alias_name="s2")).take_all()
    smap = {r["event_type"]: (int(r["n"]), int(r["s"]), int(r["s2"]))
            for r in stats}
    sref = ray.put(smap)
    z2 = float(z) * float(z)

    def flag(batch: pa.Table) -> pa.Table:
        sm = ray.get(sref)
        types = sorted(sm)
        n_t = np.asarray([sm[t][0] for t in types], dtype=np.int64)
        s_t = np.asarray([sm[t][1] for t in types], dtype=np.int64)
        s2_t = np.asarray([sm[t][2] for t in types], dtype=np.int64)
        idx = pc.index_in(batch["event_type"],
                          value_set=pa.array(types, pa.string())) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch["value"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        ve3 = np.floor(v * 1000 + 0.5).astype(np.int64)
        n, s, s2 = n_t[idx], s_t[idx], s2_t[idx]
        a = (n * ve3 - s).astype(np.float64)
        rhs = z2 * (n.astype(np.float64) * s2.astype(np.float64)
                    - s.astype(np.float64) * s.astype(np.float64))
        keep = pa.array(a * a > rhs)
        return pa.table({
            "event_id": batch["event_id"].filter(keep),
            "event_type": batch["event_type"].filter(keep),
            "value_e3": pa.array(ve3[keep.to_numpy(
                zero_copy_only=False)], pa.int64()),
        })

    return events.map_batches(flag, batch_format="pyarrow")


def drift_histogram(events: ray.data.Dataset, type_a: str = "click",
                    type_b: str = "view", bin_width_e3: int = 40_000,
                    n_bins: int = 10) -> pa.Table:
    """Distribution-drift report between two event types: fixed-width
    value histograms side by side with per-bin share deltas (the L1 /
    total-variation drift check run between data snapshots).  One
    streaming pass of fixed-size integer partials; everything exact
    ints (shares are ``count*1e6 // total``).
    -> (bin, n_a, n_b, pa_e6, pb_e6, d_e6), all ``n_bins`` rows."""

    def partial(batch: pa.Table) -> pa.Table:
        et = batch["event_type"]
        v = batch["value"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        ve3 = np.floor(v * 1000 + 0.5).astype(np.int64)
        bins = np.minimum(ve3 // bin_width_e3, n_bins - 1)
        out = {}
        for name, t in (("a", type_a), ("b", type_b)):
            m = pc.equal(et, t).to_numpy(zero_copy_only=False)
            out[f"n_{name}"] = np.bincount(bins[m], minlength=n_bins) \
                .astype(np.int64)
        return pa.table({
            "bin": pa.array(np.arange(n_bins), pa.int64()),
            "na_p": pa.array(out["n_a"], pa.int64()),
            "nb_p": pa.array(out["n_b"], pa.int64()),
        })

    rows = events.map_batches(partial, batch_format="pyarrow") \
        .groupby("bin").aggregate(Sum("na_p", alias_name="n_a"),
                                  Sum("nb_p", alias_name="n_b")) \
        .take_all()
    rows.sort(key=lambda r: r["bin"])
    na = np.asarray([r["n_a"] for r in rows], dtype=np.int64)
    nb = np.asarray([r["n_b"] for r in rows], dtype=np.int64)
    ta, tb = max(int(na.sum()), 1), max(int(nb.sum()), 1)
    pa_ = na * 1_000_000 // ta
    pb_ = nb * 1_000_000 // tb
    return pa.table({
        "bin": pa.array(np.arange(n_bins), pa.int64()),
        "n_a": pa.array(na, pa.int64()),
        "n_b": pa.array(nb, pa.int64()),
        "pa_e6": pa.array(pa_, pa.int64()),
        "pb_e6": pa.array(pb_, pa.int64()),
        "d_e6": pa.array(np.abs(pa_ - pb_), pa.int64()),
    })


def ks_drift(events: ray.data.Dataset, type_a: str = "click",
             type_b: str = "view") -> pa.Table:
    """Exact two-sample Kolmogorov-Smirnov distance between the value
    distributions of two event types — the principled upgrade of
    ``drift_histogram``'s per-bin L1 (KS is binning-free and is the
    standard snapshot-drift test).  Both sides compare the SAME
    e6-quantized variable, so the statistic is exact integer math
    end-to-end: D = d_num / (n_a * n_b) with
    ``d_num = max_x |cumA(x) * n_b - cumB(x) * n_a|``.

    Shape: per-batch (v_e6, side-count) partials -> groupby(v_e6) sum
    (the shuffle is bounded by DISTINCT quantized values, same bound as
    ``value_histogram``); the distinct-value table folds on the driver
    with one cumulative pass.  For an open-ended value domain at the
    100-TB target, swap the driver fold for the range-offset prefix
    pass of ``text.chunk_assignments`` (top value bits -> contiguous
    ranges) — the statistic is a max over prefix sums, which that
    two-pass scan computes without materializing the value table.
    -> one row (n_a, n_b, d_num, d_e6)."""

    def partial(batch: pa.Table) -> pa.Table:
        et = batch["event_type"]
        v = batch["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        ve6 = np.floor(v * 1_000_000 + 0.5).astype(np.int64)
        out = []
        for side, t in (("a", type_a), ("b", type_b)):
            m = pc.equal(et, t).to_numpy(zero_copy_only=False)
            u, c = np.unique(ve6[m], return_counts=True)
            out.append((u, c))
        (ua, ca), (ub, cb) = out
        v_all = np.union1d(ua, ub)
        ca_full = np.zeros(v_all.size, dtype=np.int64)
        cb_full = np.zeros(v_all.size, dtype=np.int64)
        ca_full[np.searchsorted(v_all, ua)] = ca
        cb_full[np.searchsorted(v_all, ub)] = cb
        return pa.table({"v": pa.array(v_all, pa.int64()),
                         "ca_p": pa.array(ca_full, pa.int64()),
                         "cb_p": pa.array(cb_full, pa.int64())})

    return _ks_finalize(events.map_batches(partial,
                                           batch_format="pyarrow"))


def _ks_finalize(parts: ray.data.Dataset) -> pa.Table:
    """(v, ca_p, cb_p) partials -> the one-row KS report (shared by
    every two-sample split of the drift family)."""
    rows = parts.groupby("v").aggregate(Sum("ca_p", alias_name="ca"),
                                        Sum("cb_p", alias_name="cb")) \
        .take_all()
    rows.sort(key=lambda r: r["v"])
    ca = np.asarray([r["ca"] for r in rows], dtype=np.int64)
    cb = np.asarray([r["cb"] for r in rows], dtype=np.int64)
    n_a, n_b = int(ca.sum()), int(cb.sum())
    if n_a == 0 or n_b == 0:
        d_num = 0
    else:
        d_num = int(np.max(np.abs(np.cumsum(ca) * n_b
                                  - np.cumsum(cb) * n_a)))
    d_e6 = d_num * 1_000_000 // (n_a * n_b) if n_a and n_b else 0
    return pa.table({
        "n_a": pa.array([n_a], pa.int64()),
        "n_b": pa.array([n_b], pa.int64()),
        "d_num": pa.array([d_num], pa.int64()),
        "d_e6": pa.array([d_e6], pa.int64()),
    })


def ab_test_report(events: ray.data.Dataset,
                   convert_type: str = "purchase") -> ray.data.Dataset:
    """A/B experiment readout with hash-based assignment — variant =
    ``user_id % 2`` (the deterministic bucketing an experimentation
    layer uses), conversion = "user produced >= 1 ``convert_type``
    event".  Per variant: distinct users, converted users and the exact
    e6 conversion rate.  ONE shuffle on user_id (narrow (user, flag)
    rows — the per-user dedup), then a 2-row variant fold; pair with
    ``lang_source_chi2``'s integer test for significance.
    -> (variant, n_users, n_converted, conv_e6)."""
    from ray.data.aggregate import Max as RMax

    def project(batch: pa.Table) -> pa.Table:
        conv = pc.cast(pc.equal(batch["event_type"], convert_type),
                       pa.int64())
        return pa.table({"user_id": batch["user_id"], "conv": conv})

    per_user = events.map_batches(project, batch_format="pyarrow") \
        .groupby("user_id").aggregate(RMax("conv", alias_name="converted"))

    def variant_partial(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        conv = batch["converted"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        out = {"variant": [], "users_p": [], "conv_p": []}
        for v in (0, 1):
            m = (uid % 2) == v
            out["variant"].append(v)
            out["users_p"].append(int(m.sum()))
            out["conv_p"].append(int(conv[m].sum()))
        return pa.table({k: pa.array(vv, pa.int64())
                         for k, vv in out.items()})

    def finalize(batch: pa.Table) -> pa.Table:
        nu = batch["n_users"].to_numpy(zero_copy_only=False)
        nc = batch["n_converted"].to_numpy(zero_copy_only=False)
        e6 = np.where(nu > 0, nc * 1_000_000 // np.maximum(nu, 1), 0)
        return batch.append_column("conv_e6", pa.array(e6, pa.int64()))

    return per_user.map_batches(variant_partial, batch_format="pyarrow") \
        .groupby("variant").aggregate(Sum("users_p", alias_name="n_users"),
                                      Sum("conv_p",
                                          alias_name="n_converted")) \
        .map_batches(finalize, batch_format="pyarrow")


def ks_weekend_drift(events: ray.data.Dataset,
                     event_type: str = "purchase") -> pa.Table:
    """Two-sample KS between WEEKDAY and WEEKEND value distributions of
    one event type — the calendar-composed member of the drift family
    (does behavior shift on weekends?).  Side assignment is the exact
    epoch-day math of ``dow_pivot`` ((d + 3) % 7, 0 = Monday; weekend =
    5,6); the fold and the statistic are shared with ``ks_drift``
    (e6-quantized, exact integers end-to-end)."""

    def partial(batch: pa.Table) -> pa.Table:
        m = pc.equal(batch["event_type"], event_type) \
            .to_numpy(zero_copy_only=False)
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = batch["value"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        ve6 = np.floor(v * 1_000_000 + 0.5).astype(np.int64)
        dow = ((ts // 86_400_000_000 + 3) % 7).astype(np.int64)
        wkend = dow >= 5
        out = []
        for side_mask in (m & ~wkend, m & wkend):       # a=weekday
            u, c = np.unique(ve6[side_mask], return_counts=True)
            out.append((u, c))
        (ua, ca), (ub, cb) = out
        v_all = np.union1d(ua, ub)
        ca_full = np.zeros(v_all.size, dtype=np.int64)
        cb_full = np.zeros(v_all.size, dtype=np.int64)
        ca_full[np.searchsorted(v_all, ua)] = ca
        cb_full[np.searchsorted(v_all, ub)] = cb
        return pa.table({"v": pa.array(v_all, pa.int64()),
                         "ca_p": pa.array(ca_full, pa.int64()),
                         "cb_p": pa.array(cb_full, pa.int64())})

    return _ks_finalize(events.map_batches(partial,
                                           batch_format="pyarrow"))


def _cell_counts(docs: ray.data.Dataset, col_a: str = "lang",
                 col_b: str = "source") -> list[dict]:
    """Exact (col_a, col_b) contingency cells: per-batch dictionary-
    encoded integer-key partials, one bounded groupby — the shuffle
    moves cells, never rows.  Shared by ``lang_source_chi2`` and
    ``k_anonymity_report``."""

    def partial(batch: pa.Table) -> pa.Table:
        la = batch[col_a].combine_chunks().dictionary_encode()
        so = batch[col_b].combine_chunks().dictionary_encode()
        lc = la.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        sc = so.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ns = max(len(so.dictionary), 1)
        u, c = np.unique(lc * ns + sc, return_counts=True)
        return pa.table({
            col_a: la.dictionary.take(pa.array(u // ns, pa.int64())),
            col_b: so.dictionary.take(pa.array(u % ns, pa.int64())),
            "n_p": pa.array(c.astype(np.int64), pa.int64()),
        })

    rows = docs.map_batches(partial, batch_format="pyarrow") \
        .groupby([col_a, col_b]) \
        .aggregate(Sum("n_p", alias_name="o")).take_all()
    rows.sort(key=lambda r: (r[col_a], r[col_b]))
    return rows


def k_anonymity_report(docs: ray.data.Dataset, k: int = 10,
                       col_a: str = "lang", col_b: str = "source"
                       ) -> pa.Table:
    """k-anonymity audit over the (lang, source) quasi-identifier pair —
    the governance gate next to ``pii_scrub``: how many equivalence
    classes (cells) are smaller than k, and how many rows sit in them
    (re-identification risk before the corpus ships).  Exact cell
    counts, O(cells) driver fold.
    -> one row (k, n_cells, n_small_cells, rows_at_risk)."""
    rows = _cell_counts(docs, col_a, col_b)
    small = [int(r["o"]) for r in rows if int(r["o"]) < k]
    return pa.table({
        "k": pa.array([k], pa.int64()),
        "n_cells": pa.array([len(rows)], pa.int64()),
        "n_small_cells": pa.array([len(small)], pa.int64()),
        "rows_at_risk": pa.array([sum(small)], pa.int64()),
    })


def lang_source_chi2(docs: ray.data.Dataset) -> pa.Table:
    """Pearson chi-square contingency table between ``lang`` and
    ``source`` — "is language independent of feed?", the categorical
    counterpart of ``ks_drift`` in the statistical-test family.  All
    integer math: with o = observed cell count, r/c = row/col totals,
    T = grand total, each cell contributes
    ``(o*T - r*c)^2 / (r*c*T)`` to the statistic; both engine and
    oracle emit the e6-floored per-cell term, so the comparison is
    exact (Python ints on the driver side are arbitrary-precision; the
    oracle uses HUGEINT).  The shuffle moves only (lang, source, n)
    partials — cells are the product of two bounded enums, so the
    driver fold is O(cells) at any corpus size.
    -> (lang, source, o, chi2_term_e6) per observed cell."""
    rows = _cell_counts(docs, "lang", "source")
    r_tot: dict[str, int] = {}
    c_tot: dict[str, int] = {}
    total = 0
    for r in rows:
        o = int(r["o"])
        r_tot[r["lang"]] = r_tot.get(r["lang"], 0) + o
        c_tot[r["source"]] = c_tot.get(r["source"], 0) + o
        total += o
    terms = []
    for r in rows:
        o, rt, ct = int(r["o"]), r_tot[r["lang"]], c_tot[r["source"]]
        num = (o * total - rt * ct) ** 2 * 1_000_000     # python bigint
        terms.append(num // (rt * ct * total))
    return pa.table({
        "lang": pa.array([r["lang"] for r in rows], pa.string()),
        "source": pa.array([r["source"] for r in rows], pa.string()),
        "o": pa.array([int(r["o"]) for r in rows], pa.int64()),
        "chi2_term_e6": pa.array(terms, pa.int64()),
    })


def value_ntile_by_type(events: ray.data.Dataset, n_tiles: int = 4
                        ) -> ray.data.Dataset:
    """Distributed ``NTILE(k) OVER (PARTITION BY event_type ORDER BY
    value, event_id)`` — the windowed quartile/decile assignment the
    Dataset API lacks (completes the window family next to
    ``order_rank_window`` / ``running_revenue``).  SQL NTILE semantics
    exactly: the first ``n % k`` tiles hold ``ceil(n/k)`` rows.

    ONE shuffle on event_type, each group ranked by a vectorized
    lexsort.  Partitioning assumption (same as ``median_value_by_type``
    / ``sessionize``): event_type is a bounded enum so one type fits a
    task; for a high-cardinality partition key at the 100-TB target,
    range-partition each type by value and fold per-range row counts
    into rank offsets (the ``chunk_assignments`` two-pass scan) instead
    of one task per type.  Tie-break on event_id keeps the assignment
    deterministic.  -> (event_id, event_type, tile), tile in 1..k."""
    k = n_tiles

    def tiles(group: pa.Table) -> pa.Table:
        v = group["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        eid = group["event_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        n = v.size
        order = np.lexsort((eid, v))
        ranks = np.empty(n, dtype=np.int64)
        ranks[order] = np.arange(n, dtype=np.int64)
        base, rem = divmod(n, k)
        big = rem * (base + 1)
        if base == 0:                       # n < k: one row per tile
            tile = ranks
        else:
            tile = np.where(ranks < big, ranks // (base + 1),
                            rem + (ranks - big) // base)
        return pa.table({
            "event_id": group["event_id"],
            "event_type": group["event_type"],
            "tile": pa.array(tile + 1, pa.int64()),
        })

    return events.groupby("event_type").map_groups(
        tiles, batch_format="pyarrow")


def value_cume_dist_by_type(events: ray.data.Dataset
                            ) -> ray.data.Dataset:
    """Distributed ``CUME_DIST() OVER (PARTITION BY event_type ORDER BY
    value)`` — the tie-aware companion of ``value_ntile_by_type``
    (NTILE splits ties arbitrarily by the tie-break; CUME_DIST gives
    every tied row the SAME share: #rows with value <= mine / n).
    Exact: e6-floored on integer counts; one shuffle on event_type,
    vectorized searchsorted per group (same bounded-enum partitioning
    assumption as ``median_value_by_type``).
    -> (event_id, event_type, cume_e6)."""

    def cume(group: pa.Table) -> pa.Table:
        v = group["value"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        n = v.size
        sv = np.sort(v)
        le = np.searchsorted(sv, v, side="right").astype(np.int64)
        return pa.table({
            "event_id": group["event_id"],
            "event_type": group["event_type"],
            "cume_e6": pa.array(le * 1_000_000 // n, pa.int64()),
        })

    return events.groupby("event_type").map_groups(
        cume, batch_format="pyarrow")


def percentile_ranks(events: ray.data.Dataset,
                     values_e3: tuple[int, ...] = (50_000, 100_000,
                                                   200_000)) -> pa.Table:
    """ES ``percentile_ranks`` aggregation: for each probe value, the
    share of events (per type) with value <= probe.  One streaming pass
    of fixed-width integer partials (types x probes counts), exact
    floor shares.  -> (event_type, value_e3, rank_e6) by (type, value)."""
    from ray.data.aggregate import Sum as RSum

    probes = np.asarray(sorted(values_e3), dtype=np.int64)

    def partial(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        ve3 = np.floor(v * 1000 + 0.5).astype(np.int64)
        cols = {"event_type": batch["event_type"],
                "one": pa.array(np.ones(ve3.size, np.int64), pa.int64())}
        for j, p in enumerate(probes):
            cols[f"le_{j}"] = pa.array((ve3 <= p).astype(np.int64),
                                       pa.int64())
        aggs = [("one", "sum")] + [(f"le_{j}", "sum")
                                   for j in range(probes.size)]
        t = pa.table(cols).group_by("event_type").aggregate(aggs)
        out = {"event_type": t["event_type"],
               "n_p": t["one_sum"].cast(pa.int64())}
        for j in range(probes.size):
            out[f"c{j}_p"] = t[f"le_{j}_sum"].cast(pa.int64())
        return pa.table(out)

    rows = events.map_batches(partial, batch_format="pyarrow") \
        .groupby("event_type") \
        .aggregate(RSum("n_p", alias_name="n"),
                   *[RSum(f"c{j}_p", alias_name=f"c{j}")
                     for j in range(probes.size)]) \
        .take_all()
    rows.sort(key=lambda r: r["event_type"])
    out_t, out_v, out_r = [], [], []
    for r in rows:
        n = max(int(r["n"]), 1)
        for j, p in enumerate(probes):
            out_t.append(r["event_type"])
            out_v.append(int(p))
            out_r.append(int(r[f"c{j}"]) * 1_000_000 // n)
    return pa.table({
        "event_type": pa.array(out_t, pa.string()),
        "value_e3": pa.array(out_v, pa.int64()),
        "rank_e6": pa.array(out_r, pa.int64()),
    })


def _trunc_div(num: int, den: int) -> int:
    """Integer division truncating toward zero — DuckDB's `//` on
    integers (Python's `//` floors, which differs for negatives)."""
    q = abs(num) // abs(den)
    return -q if (num < 0) != (den < 0) else q


#: (column, fixed-point scale) of the lineitem measure fields the
#: covariance matrix runs over — e2 for the 2-decimal money columns.
MATRIX_FIELDS = (("l_quantity", 1), ("l_extendedprice", 100),
                 ("l_discount", 100))


def matrix_stats(lineitem: ray.data.Dataset,
                 fields=MATRIX_FIELDS) -> pa.Table:
    """ES ``matrix_stats`` aggregation: exact n / mean / covariance for
    every (unordered) pair of numeric fields, diagonal included (the
    diagonal's covariance IS the variance).  One streaming pass of
    per-batch integer partials; the only shuffle is a
    #pairs-row groupby.

    Exactness at any scale: per-element products fit int64 (price_e2
    <= ~1.05e7, square <= ~1.1e14), but their SUM does not at 10^8+
    rows — so each batch splits its dot product into (hi, lo) base-1e9
    limbs that are folded independently (hi < 1.1e5/row, lo < 1e9/row;
    both sums stay safely inside int64 past 10^12 rows) and recombined
    into arbitrary-precision Python ints only at the tiny finalize.
    ``cov = (n*dot - sa*sb) / n^2`` in e6 fixed point, truncated toward
    zero exactly like the DuckDB oracle's HUGEINT division.
    -> (field_a, field_b, n, mean_a_e6, mean_b_e6, cov_e6)."""
    from ray.data.aggregate import Sum as RSum

    cols = [c for c, _ in fields]
    pairs = [(i, j) for i in range(len(fields))
             for j in range(i, len(fields))]
    LIMB = np.int64(1_000_000_000)

    def partial(batch: pa.Table) -> pa.Table:
        vals = []
        for c, scale in fields:
            v = batch[c].to_numpy(zero_copy_only=False).astype(np.float64)
            vals.append(np.floor(v * scale + 0.5).astype(np.int64))
        n = len(batch)
        rows = {"pair": [], "n_p": [], "sa_p": [], "sb_p": [],
                "hi_p": [], "lo_p": []}
        for p, (i, j) in enumerate(pairs):
            prod = vals[i] * vals[j]
            rows["pair"].append(p)
            rows["n_p"].append(n)
            rows["sa_p"].append(int(vals[i].sum()))
            rows["sb_p"].append(int(vals[j].sum()))
            rows["hi_p"].append(int((prod // LIMB).sum()))
            rows["lo_p"].append(int((prod % LIMB).sum()))
        return pa.table({k: pa.array(v, pa.int64())
                         for k, v in rows.items()})

    folded = lineitem.select_columns(cols) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("pair").aggregate(
            RSum("n_p", alias_name="n"), RSum("sa_p", alias_name="sa"),
            RSum("sb_p", alias_name="sb"), RSum("hi_p", alias_name="hi"),
            RSum("lo_p", alias_name="lo")).take_all()
    by_pair = {int(r["pair"]): r for r in folded}
    out = {"field_a": [], "field_b": [], "n": [], "mean_a_e6": [],
           "mean_b_e6": [], "cov_e6": []}
    for p, (i, j) in enumerate(pairs):
        r = by_pair[p]
        n = int(r["n"])
        sa, sb = int(r["sa"]), int(r["sb"])
        dot = int(r["hi"]) * int(LIMB) + int(r["lo"])
        out["field_a"].append(cols[i])
        out["field_b"].append(cols[j])
        out["n"].append(n)
        out["mean_a_e6"].append(_trunc_div(sa * 10**6, n))
        out["mean_b_e6"].append(_trunc_div(sb * 10**6, n))
        out["cov_e6"].append(_trunc_div((n * dot - sa * sb) * 10**6,
                                        n * n))
    return pa.table({
        "field_a": pa.array(out["field_a"], pa.string()),
        "field_b": pa.array(out["field_b"], pa.string()),
        "n": pa.array(out["n"], pa.int64()),
        "mean_a_e6": pa.array(out["mean_a_e6"], pa.int64()),
        "mean_b_e6": pa.array(out["mean_b_e6"], pa.int64()),
        "cov_e6": pa.array(out["cov_e6"], pa.int64()),
    })


def mad_value_by_type(events: ray.data.Dataset) -> ray.data.Dataset:
    """ES ``median_absolute_deviation`` aggregation, EXACT (ES ships an
    approximate TDigest; a digest's merge order is nondeterministic
    across cluster sizes, so the exact histogram fold is both stronger
    and the only bit-reproducible choice).  Median convention = lower
    median (the element at sorted position ceil(n/2), 1-indexed) —
    DuckDB's ``percentile_disc(0.5)``, same as
    :func:`median_value_by_type`.

    Scale shape: values quantize to e3 ints, so the corpus folds to a
    per-(type, value_e3) count histogram — the shuffle carries distinct
    quantized values, bounded by the value RANGE (fixed), not the row
    count.  Each type's median and MAD then come from one vectorized
    weighted-order-statistic pass over its histogram.
    -> (event_type, n, median_e3, mad_e3)."""

    def pre(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "event_type": batch["event_type"],
            "ve3": pa.array(np.floor(v * 1000 + 0.5).astype(np.int64),
                            pa.int64()),
        }).group_by(["event_type", "ve3"]).aggregate([([], "count_all")]) \
            .rename_columns(["event_type", "ve3", "c_p"])

    hist = events.select_columns(["event_type", "value"]) \
        .map_batches(pre, batch_format="pyarrow") \
        .groupby(["event_type", "ve3"]).aggregate(Sum("c_p", alias_name="c"))

    def finalize(group: pa.Table) -> pa.Table:
        ve3 = group["ve3"].to_numpy(zero_copy_only=False)
        c = group["c"].to_numpy(zero_copy_only=False)
        o = np.argsort(ve3, kind="stable")
        ve3, c = ve3[o], c[o]
        n = int(c.sum())

        def lower_median(vals: np.ndarray, cnts: np.ndarray) -> int:
            cum = np.cumsum(cnts)
            k = (n - 1) // 2 + 1                 # 1-indexed rank ceil(n/2)
            return int(vals[np.searchsorted(cum, k)])

        med = lower_median(ve3, c)
        dev = np.abs(ve3 - med)
        od = np.argsort(dev, kind="stable")
        dev, dc = dev[od], c[od]
        # merge duplicate deviations (a value below and above the median
        # can be equidistant) so searchsorted sees a proper histogram
        uq, inv = np.unique(dev, return_inverse=True)
        dcm = np.zeros(uq.size, dtype=np.int64)
        np.add.at(dcm, inv, dc)
        mad = lower_median(uq, dcm)
        return pa.table({
            "event_type": pa.array([group["event_type"][0].as_py()],
                                   pa.string()),
            "n": pa.array([n], pa.int64()),
            "median_e3": pa.array([med], pa.int64()),
            "mad_e3": pa.array([mad], pa.int64()),
        })

    return hist.groupby("event_type").map_groups(finalize,
                                                 batch_format="pyarrow")


def q10_returned_revenue(customer: ray.data.Dataset,
                         orders: ray.data.Dataset,
                         lineitem: ray.data.Dataset,
                         nation: ray.data.Dataset,
                         k: int = 20) -> pa.Table:
    """TPC-H-Q10-shaped returned-item report: revenue lost to returns
    per customer, top-``k``, with customer + nation dimensions.  The
    join chain is the mirror of Q3: lineitem revenue partials fold
    per ORDER before the first shuffle, the orderkey co-group attaches
    o_custkey, a second custkey fold produces per-customer totals, and
    the two dimension tables are fetched only for the k winners
    (key-pruned read — never a corpus-sized dim shuffle).

    Revenue is exact e4 ints (``round(price*100) * round((1-d)*100)``),
    so every fold is order-free and bit-identical to the SQL oracle.
    -> (c_custkey, c_name, n_name, revenue_e4) by (revenue desc,
    custkey asc)."""
    import pyarrow.compute as pc

    def proj_line(batch: pa.Table) -> pa.Table:
        m = pc.equal(batch["l_returnflag"], "R")
        t = batch.filter(m)
        okey = t["l_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        price = t["l_extendedprice"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        disc = t["l_discount"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        rev = (np.floor(price * 100 + 0.5).astype(np.int64)
               * np.floor((1.0 - disc) * 100 + 0.5).astype(np.int64))
        keys, inv = np.unique(okey, return_inverse=True)
        part = np.zeros(keys.size, dtype=np.int64)
        np.add.at(part, inv, rev)
        return pa.table({
            "key": pa.array(keys, pa.int64()),
            "ckey": pa.nulls(keys.size, pa.int64()),
            "rev_p": pa.array(part, pa.int64()),
        })

    def proj_orders(batch: pa.Table) -> pa.Table:
        return pa.table({
            "key": batch["o_orderkey"].cast(pa.int64()),
            "ckey": batch["o_custkey"].cast(pa.int64()),
            "rev_p": pa.array(np.zeros(batch.num_rows, np.int64),
                              pa.int64()),
        })

    tagged = lineitem.select_columns(
        ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"]) \
        .map_batches(proj_line, batch_format="pyarrow") \
        .union(orders.select_columns(["o_orderkey", "o_custkey"])
               .map_batches(proj_orders, batch_format="pyarrow"))
    per_order = tagged.groupby("key").aggregate(
        Max("ckey", alias_name="ckey"),
        Sum("rev_p", alias_name="rev"))

    def proj_cust(batch: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(batch["ckey"]),
                    pc.greater(batch["rev"], 0))
        t = batch.filter(m)
        return pa.table({"ckey": t["ckey"].cast(pa.int64()),
                         "rev_p": t["rev"].cast(pa.int64())})

    per_cust = per_order.map_batches(proj_cust, batch_format="pyarrow") \
        .groupby("ckey").aggregate(Sum("rev_p", alias_name="revenue_e4"))

    def local_topk(batch: pa.Table) -> pa.Table:
        rev = batch["revenue_e4"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        keys = batch["ckey"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((keys, -rev))[:k]
        return pa.table({"ckey": pa.array(keys[order], pa.int64()),
                         "revenue_e4": pa.array(rev[order], pa.int64())})

    cand = per_cust.map_batches(local_topk, batch_format="pyarrow") \
        .take_all()
    rev = np.asarray([r["revenue_e4"] for r in cand], dtype=np.int64)
    keys = np.asarray([r["ckey"] for r in cand], dtype=np.int64)
    order = np.lexsort((keys, -rev))[:k]
    keys, rev = keys[order], rev[order]

    # dimension fetch for the k winners only
    kl = ", ".join(str(int(x)) for x in keys) or "-1"
    cust = customer.filter(expr=f"c_custkey in [{kl}]") \
        .select_columns(["c_custkey", "c_name", "c_nationkey"]).take_all()
    cmeta = {int(r["c_custkey"]): (r["c_name"], int(r["c_nationkey"]))
             for r in cust}
    nmap = {int(r["n_nationkey"]): r["n_name"]
            for r in nation.select_columns(["n_nationkey", "n_name"])
            .take_all()}
    return pa.table({
        "c_custkey": pa.array(keys, pa.int64()),
        "c_name": pa.array([cmeta[int(c)][0] for c in keys], pa.string()),
        "n_name": pa.array([nmap[cmeta[int(c)][1]] for c in keys],
                           pa.string()),
        "revenue_e4": pa.array(rev, pa.int64()),
    })


def part_cooccurrence(lineitem: ray.data.Dataset, k: int = 20) -> pa.Table:
    """Market-basket mining on the fact table (collaborative-filtering
    prep): part pairs most often bought together in the SAME order,
    top-``k`` by (count desc, part_a asc, part_b asc).

    Per-batch the (order, part) incidence folds locally to distinct
    pairs per order; only (part_a, part_b, n) partials shuffle —
    bounded by the co-occurring pair vocabulary, never the line count.
    A degenerate mega-order would need the same cap treatment as the
    LSH buckets (orders are small by schema: few lines each)."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        okey = batch["l_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        pkey = batch["l_partkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        # distinct (order, part), sorted by order then part
        key = np.unique(okey * (np.int64(1) << 32) + pkey)
        o = (key >> 32).astype(np.int64)
        p = (key & ((np.int64(1) << 32) - 1)).astype(np.int64)
        # all intra-order pairs (parts sorted asc within an order)
        da, db = [], []
        starts = np.concatenate([[0], np.flatnonzero(np.diff(o)) + 1,
                                 [o.size]])
        for s0, s1 in zip(starts[:-1], starts[1:]):
            g = p[s0:s1]
            if g.size > 1:
                iu, ju = np.triu_indices(g.size, 1)
                da.append(g[iu])
                db.append(g[ju])
        if not da:
            return pa.schema([("part_a", pa.int64()),
                              ("part_b", pa.int64()),
                              ("n_p", pa.int64())]).empty_table()
        t = pa.table({"part_a": pa.array(np.concatenate(da), pa.int64()),
                      "part_b": pa.array(np.concatenate(db), pa.int64())})
        g2 = t.group_by(["part_a", "part_b"]).aggregate([([], "count_all")])
        return pa.table({"part_a": g2["part_a"], "part_b": g2["part_b"],
                         "n_p": g2["count_all"].cast(pa.int64())})

    # co-group lines by ORDER first so intra-order pairs are complete
    # even when an order's lines span input blocks
    def per_order(group: pa.Table) -> pa.Table:
        return partial(group)

    folded = lineitem.select_columns(["l_orderkey", "l_partkey"]) \
        .groupby("l_orderkey").map_groups(per_order,
                                          batch_format="pyarrow") \
        .groupby(["part_a", "part_b"]).aggregate(Sum("n_p",
                                                     alias_name="n")) \
        .take_all()
    rows = sorted(((-int(r["n"]), int(r["part_a"]), int(r["part_b"])))
                  for r in folded)[:k]
    return pa.table({
        "part_a": pa.array([r[1] for r in rows], pa.int64()),
        "part_b": pa.array([r[2] for r in rows], pa.int64()),
        "n": pa.array([-r[0] for r in rows], pa.int64()),
    })


def supplier_share(lineitem: ray.data.Dataset,
                   supplier: ray.data.Dataset,
                   nation: ray.data.Dataset, k: int = 3) -> pa.Table:
    """Window-share report: per nation, each supplier's exact revenue,
    its e6 share of the nation total, and its rank — the
    percent-of-total window function over a broadcast-dimension join.
    Top-``k`` suppliers per nation by (revenue desc, suppkey asc).

    Revenue folds per supplier inside each batch (exact e4 ints)
    BEFORE the supplier-count-sized shuffle; nation names attach from a
    broadcast dict.  -> (n_name, rank, s_suppkey, revenue_e4,
    share_e6)."""
    import pyarrow.compute as pc
    import ray

    smeta = {int(r["s_suppkey"]): int(r["s_nationkey"])
             for r in supplier.select_columns(
                 ["s_suppkey", "s_nationkey"]).take_all()}
    nname = {int(r["n_nationkey"]): str(r["n_name"])
             for r in nation.select_columns(
                 ["n_nationkey", "n_name"]).take_all()}
    sref = ray.put(smeta)

    def partial(batch: pa.Table) -> pa.Table:
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        rev = (np.floor(price * 100 + 0.5).astype(np.int64)
               * np.floor((1.0 - disc) * 100 + 0.5).astype(np.int64))
        keys, inv = np.unique(sk, return_inverse=True)
        part = np.zeros(keys.size, dtype=np.int64)
        np.add.at(part, inv, rev)
        return pa.table({"s_suppkey": pa.array(keys, pa.int64()),
                         "rev_p": pa.array(part, pa.int64())})

    folded = lineitem.select_columns(
        ["l_suppkey", "l_extendedprice", "l_discount"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("s_suppkey").aggregate(Sum("rev_p",
                                            alias_name="revenue_e4")) \
        .take_all()
    by_nation: dict[int, list] = {}
    for r in folded:
        s = int(r["s_suppkey"])
        by_nation.setdefault(smeta[s], []).append((s,
                                                   int(r["revenue_e4"])))
    out = {"n_name": [], "rank": [], "s_suppkey": [], "revenue_e4": [],
           "share_e6": []}
    for nk in sorted(by_nation, key=lambda x: nname[x]):
        rows = by_nation[nk]
        total = sum(rv for _, rv in rows)
        rows.sort(key=lambda x: (-x[1], x[0]))
        for rank, (s, rv) in enumerate(rows[:k], 1):
            out["n_name"].append(nname[nk])
            out["rank"].append(rank)
            out["s_suppkey"].append(s)
            out["revenue_e4"].append(rv)
            out["share_e6"].append(rv * 10 ** 6 // total if total else 0)
    return pa.table({
        "n_name": pa.array(out["n_name"], pa.string()),
        "rank": pa.array(out["rank"], pa.int64()),
        "s_suppkey": pa.array(out["s_suppkey"], pa.int64()),
        "revenue_e4": pa.array(out["revenue_e4"], pa.int64()),
        "share_e6": pa.array(out["share_e6"], pa.int64()),
    })


def sorted_head(events: ray.data.Dataset, k: int = 20) -> pa.Table:
    """Distributed global sort capability check: the top-``k`` events by
    (value_e3 desc, event_id asc) taken from a FULL ``Dataset.sort``
    (range-partitioned shuffle), not a local top-k — proving the
    engine's wide sort produces a true global order (the per-block
    boundaries are verified by tests; the oracle checks the head).

    Values quantize to e3 ints before sorting so ordering is exact.
    -> (rank, event_id, value_e3)."""
    import pyarrow.compute as pc

    def quant(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return pa.table({
            "event_id": batch["event_id"].cast(pa.int64()),
            "neg_value_e3": pa.array(
                -np.floor(v * 1000 + 0.5).astype(np.int64), pa.int64()),
        })

    head = events.select_columns(["event_id", "value"]) \
        .map_batches(quant, batch_format="pyarrow") \
        .sort(["neg_value_e3", "event_id"]).limit(k).take_all()
    return pa.table({
        "rank": pa.array(np.arange(1, len(head) + 1), pa.int64()),
        "event_id": pa.array([r["event_id"] for r in head], pa.int64()),
        "value_e3": pa.array([-r["neg_value_e3"] for r in head],
                             pa.int64()),
    })


def time_weighted_avg(events: ray.data.Dataset) -> ray.data.Dataset:
    """Time-weighted average per event type — each event's value holds
    until the type's NEXT event, weighted by that interval (the metric
    a gauge/telemetry pipeline reports; a plain mean over-weights
    bursts).  The last event of a type carries no interval.

    Exact integers end to end: values quantize to e3, intervals are
    microsecond deltas, the per-type fold sums ``v_e3 * dt_us`` in
    python bigints (the product exceeds int64 by design).  Per-type
    ``map_groups`` sorts locally in (ts, event_id) order.
    -> (event_type, n_intervals, twa_e3 = Σv·dt // Σdt)."""

    def per_type(g: pa.Table) -> pa.Table:
        ts = g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        v = g["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.lexsort((eid, ts))
        ts, v = ts[order], v[order]
        ve3 = np.floor(v * 1000 + 0.5).astype(np.int64)
        et = g["event_type"][0].as_py()
        if ts.size < 2:
            return pa.table({"event_type": pa.array([et], pa.string()),
                             "n_intervals": pa.array([0], pa.int64()),
                             "twa_e3": pa.array([0], pa.int64())})
        dt = np.diff(ts)
        num = sum(int(a) * int(b) for a, b in zip(ve3[:-1], dt))
        den = int(dt.sum())
        return pa.table({
            "event_type": pa.array([et], pa.string()),
            "n_intervals": pa.array([int(dt.size)], pa.int64()),
            "twa_e3": pa.array([num // den if den else 0], pa.int64()),
        })

    return events.select_columns(["event_type", "ts", "event_id",
                                  "value"]) \
        .groupby("event_type").map_groups(per_type,
                                          batch_format="pyarrow")


def trimmed_mean_by_type(events: ray.data.Dataset,
                         trim_pct: int = 10) -> ray.data.Dataset:
    """Robust mean: per event type, the mean of values after dropping
    the lowest and highest ``trim_pct`` percent (count =
    ``n * trim_pct // 100`` from each side) — the outlier-immune
    aggregate a metrics pipeline prefers over the raw mean.

    Same scale shape as the exact MAD: values quantize to e3 and fold
    to a per-(type, value) count histogram (shuffle bounded by the
    value range); the trim + mean run on each type's histogram with
    one weighted pass.  -> (event_type, n, n_trimmed_each,
    tmean_e3 = Σkept // n_kept)."""
    from ray.data.aggregate import Sum as RSum
    import pyarrow.compute as pc

    def pre(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return pa.table({
            "event_type": batch["event_type"],
            "ve3": pa.array(np.floor(v * 1000 + 0.5).astype(np.int64),
                            pa.int64()),
        }).group_by(["event_type", "ve3"]).aggregate([([], "count_all")]) \
            .rename_columns(["event_type", "ve3", "c_p"])

    hist = events.select_columns(["event_type", "value"]) \
        .map_batches(pre, batch_format="pyarrow") \
        .groupby(["event_type", "ve3"]).aggregate(RSum("c_p",
                                                       alias_name="c"))

    def finalize(group: pa.Table) -> pa.Table:
        ve3 = group["ve3"].to_numpy(zero_copy_only=False)
        c = group["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.argsort(ve3, kind="stable")
        ve3, c = ve3[o], c[o]
        n = int(c.sum())
        t = n * trim_pct // 100
        # drop t from each side of the weighted sorted multiset
        cum = np.cumsum(c)
        lo_keep = np.maximum(cum - t, 0)            # kept count up to i
        kept = np.minimum(lo_keep, n - 2 * t) \
            - np.maximum(np.concatenate([[0], cum[:-1]]) - t, 0)
        kept = np.clip(kept, 0, None)
        s = sum(int(a) * int(b) for a, b in zip(ve3, kept))
        nk = n - 2 * t
        return pa.table({
            "event_type": pa.array([group["event_type"][0].as_py()],
                                   pa.string()),
            "n": pa.array([n], pa.int64()),
            "n_trimmed_each": pa.array([t], pa.int64()),
            "tmean_e3": pa.array([s // nk if nk > 0 else 0], pa.int64()),
        })

    return hist.groupby("event_type").map_groups(finalize,
                                                 batch_format="pyarrow")


def q19_revenue(lineitem: ray.data.Dataset, part: ray.data.Dataset,
                clauses: tuple = (("Brand#12", 1, 5, 1, 11),
                                  ("Brand#23", 1, 10, 10, 20),
                                  ("Brand#34", 1, 15, 20, 30))
                ) -> pa.Table:
    """TPC-H-Q19-shaped discounted revenue under a DISJUNCTION of
    brand/size/quantity clauses — the complex-predicate fact scan
    (reference ``TPC-H Q19``; adapted to this schema's columns: brand +
    size ranges on the part side, quantity ranges on the fact side).

    Same J1 broadcast shape as :func:`q14_promo_share`: the part
    dimension ships once as sorted keys + a per-clause eligibility
    BITMASK (clauses are one byte per part), each fact batch folds one
    exact-e4 revenue partial, the driver adds the partials.
    -> one row (n_matched, revenue_e4)."""
    import ray

    rows = part.select_columns(["p_partkey", "p_brand", "p_size"]) \
        .take_all()
    keys = np.asarray([int(r["p_partkey"]) for r in rows], dtype=np.int64)
    brand = np.asarray([str(r["p_brand"]) for r in rows])
    size = np.asarray([int(r["p_size"]) for r in rows], dtype=np.int64)
    elig = np.zeros(keys.size, dtype=np.int64)
    for ci, (b, slo, shi, _, _) in enumerate(clauses):
        elig |= ((brand == b) & (size >= slo) & (size <= shi)) << ci
    order = np.argsort(keys)
    bref = ray.put((keys[order], elig[order],
                    tuple((qlo, qhi) for _, _, _, qlo, qhi in clauses)))

    def partial(batch: pa.Table) -> pa.Table:
        pk, el, qr = ray.get(bref)
        part_k = batch["l_partkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        pos = np.searchsorted(pk, part_k)
        np.clip(pos, 0, pk.size - 1, out=pos)
        found = pk[pos] == part_k
        e = np.where(found, el[pos], 0)
        hit = np.zeros(part_k.size, dtype=bool)
        for ci, (qlo, qhi) in enumerate(qr):
            hit |= ((e >> ci) & 1).astype(bool) \
                & (qty >= qlo) & (qty <= qhi)
        rev = (np.floor(price * 100 + 0.5).astype(np.int64)
               * np.floor((1.0 - disc) * 100 + 0.5).astype(np.int64))
        return pa.table({
            "n_p": pa.array([int(hit.sum())], pa.int64()),
            "rev_p": pa.array([int(rev[hit].sum())], pa.int64()),
        })

    rows2 = lineitem.select_columns(
        ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"]) \
        .map_batches(partial, batch_format="pyarrow").take_all()
    return pa.table({
        "n_matched": pa.array([sum(int(r["n_p"]) for r in rows2)],
                              pa.int64()),
        "revenue_e4": pa.array([sum(int(r["rev_p"]) for r in rows2)],
                               pa.int64()),
    })


def q14_promo_share(lineitem: ray.data.Dataset,
                    part: ray.data.Dataset,
                    promo_prefix: str = "PROMO") -> pa.Table:
    """TPC-H-Q14-shaped promotion share: the fraction of total revenue
    from parts whose ``p_type`` starts with ``promo_prefix`` — the
    broadcast-dimension fact scan with a conditional aggregate.

    The part dimension ships once via ``ray.put`` as a sorted key array
    + boolean flag (J1 broadcast, never a fact-sized shuffle); each
    batch folds (promo_rev, total_rev) exact-e4 partials; the driver
    adds two numbers.  -> one row (promo_rev_e4, total_rev_e4,
    promo_share_e6 = promo * 1e6 // total)."""
    import pyarrow.compute as pc
    import ray

    rows = part.select_columns(["p_partkey", "p_type"]).take_all()
    keys = np.asarray([int(r["p_partkey"]) for r in rows], dtype=np.int64)
    promo = np.asarray([str(r["p_type"]).startswith(promo_prefix)
                        for r in rows], dtype=bool)
    order = np.argsort(keys)
    bref = ray.put((keys[order], promo[order]))

    def partial(batch: pa.Table) -> pa.Table:
        pk, fl = ray.get(bref)
        part_k = batch["l_partkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        rev = (np.floor(price * 100 + 0.5).astype(np.int64)
               * np.floor((1.0 - disc) * 100 + 0.5).astype(np.int64))
        pos = np.searchsorted(pk, part_k)
        np.clip(pos, 0, pk.size - 1, out=pos)
        is_promo = (pk[pos] == part_k) & fl[pos]
        return pa.table({
            "promo_p": pa.array([int(rev[is_promo].sum())], pa.int64()),
            "total_p": pa.array([int(rev.sum())], pa.int64()),
        })

    agg = lineitem.select_columns(
        ["l_partkey", "l_extendedprice", "l_discount"]) \
        .map_batches(partial, batch_format="pyarrow").take_all()
    promo_rev = sum(int(r["promo_p"]) for r in agg)
    total_rev = sum(int(r["total_p"]) for r in agg)
    return pa.table({
        "promo_rev_e4": pa.array([promo_rev], pa.int64()),
        "total_rev_e4": pa.array([total_rev], pa.int64()),
        "promo_share_e6": pa.array(
            [promo_rev * 10 ** 6 // total_rev if total_rev else 0],
            pa.int64()),
    })


def q18_volume_customers(lineitem: ray.data.Dataset,
                         orders: ray.data.Dataset,
                         min_qty: int = 150, k: int = 20) -> pa.Table:
    """TPC-H-Q18-shaped large-volume-order report: orders whose total
    quantity exceeds ``min_qty``, with their customer, top-``k`` by
    (total_qty desc, orderkey asc) — the HAVING-on-a-fact-fold join.

    Lineitem quantity folds per order inside each batch before the
    orderkey co-group (tagged union with the orders projection, same
    shape as Q3/Q10); only qualifying orders reach the driver.
    -> (o_orderkey, o_custkey, total_qty)."""
    import pyarrow.compute as pc

    def proj_line(batch: pa.Table) -> pa.Table:
        okey = batch["l_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        q = np.floor(qty + 0.5).astype(np.int64)
        keys, inv = np.unique(okey, return_inverse=True)
        part = np.zeros(keys.size, dtype=np.int64)
        np.add.at(part, inv, q)
        return pa.table({
            "key": pa.array(keys, pa.int64()),
            "ckey": pa.nulls(keys.size, pa.int64()),
            "qty_p": pa.array(part, pa.int64()),
        })

    def proj_orders(batch: pa.Table) -> pa.Table:
        return pa.table({
            "key": batch["o_orderkey"].cast(pa.int64()),
            "ckey": batch["o_custkey"].cast(pa.int64()),
            "qty_p": pa.array(np.zeros(batch.num_rows, np.int64),
                              pa.int64()),
        })

    tagged = lineitem.select_columns(["l_orderkey", "l_quantity"]) \
        .map_batches(proj_line, batch_format="pyarrow") \
        .union(orders.select_columns(["o_orderkey", "o_custkey"])
               .map_batches(proj_orders, batch_format="pyarrow"))
    agg = tagged.groupby("key").aggregate(
        Max("ckey", alias_name="ckey"),
        Sum("qty_p", alias_name="total_qty"))

    def qualify(batch: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(batch["ckey"]),
                    pc.greater(batch["total_qty"], min_qty))
        return batch.filter(m)

    cand = agg.map_batches(qualify, batch_format="pyarrow").take_all()
    rows = sorted(((-int(r["total_qty"]), int(r["key"]), int(r["ckey"]))
                   for r in cand))[:k]
    return pa.table({
        "o_orderkey": pa.array([r[1] for r in rows], pa.int64()),
        "o_custkey": pa.array([r[2] for r in rows], pa.int64()),
        "total_qty": pa.array([-r[0] for r in rows], pa.int64()),
    })


def q1_pricing_summary(lineitem: ray.data.Dataset) -> ray.data.Dataset:
    """The full TPC-H Q1 pricing summary (the canonical scan-heavy
    aggregate): per (returnflag, linestatus) — sum_qty, sum base /
    discounted / charged price, the three averages and the row count,
    all in exact fixed-point integers so every value is bit-identical
    to the oracle (qty e0, price e2, disc_price e4, charge e6;
    averages = trunc(sum * 1e6 / n)).

    One streaming pass of per-batch Acero partials; the shuffle carries
    flag-cardinality rows.  -> (l_returnflag, l_linestatus, sum_qty,
    sum_base_e2, sum_disc_e4, sum_charge_e6, avg_qty_e6, avg_price_e6,
    avg_disc_e6, n_rows)."""
    from ray.data.aggregate import Sum as RSum

    def partial(batch: pa.Table) -> pa.Table:
        qty = np.floor(batch["l_quantity"].to_numpy(zero_copy_only=False)
                       .astype(np.float64) + 0.5).astype(np.int64)
        p2 = np.floor(batch["l_extendedprice"]
                      .to_numpy(zero_copy_only=False).astype(np.float64)
                      * 100 + 0.5).astype(np.int64)
        d2 = np.floor(batch["l_discount"].to_numpy(zero_copy_only=False)
                      .astype(np.float64) * 100 + 0.5).astype(np.int64)
        t2 = np.floor(batch["l_tax"].to_numpy(zero_copy_only=False)
                      .astype(np.float64) * 100 + 0.5).astype(np.int64)
        disc4 = p2 * (100 - d2)                      # e4, < 1.1e11
        # charge e6 = p2 * (100-d2) * (100+t2); split into base-1e9
        # limbs so the SUM stays int64-safe at any row count
        charge6 = disc4 * (100 + t2)
        LIMB = np.int64(1_000_000_000)
        t = pa.table({
            "l_returnflag": batch["l_returnflag"],
            "l_linestatus": batch["l_linestatus"],
            "q": pa.array(qty, pa.int64()),
            "b2": pa.array(p2, pa.int64()),
            "d4_hi": pa.array(disc4 // LIMB, pa.int64()),
            "d4_lo": pa.array(disc4 % LIMB, pa.int64()),
            "c6_hi": pa.array(charge6 // LIMB, pa.int64()),
            "c6_lo": pa.array(charge6 % LIMB, pa.int64()),
            "dd": pa.array(d2, pa.int64()),
            "one": pa.array(np.ones(len(qty), np.int64)),
        })
        return t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("q", "sum"), ("b2", "sum"), ("d4_hi", "sum"),
             ("d4_lo", "sum"), ("c6_hi", "sum"), ("c6_lo", "sum"),
             ("dd", "sum"), ("one", "sum")]) \
            .rename_columns(["l_returnflag", "l_linestatus", "q_p", "b_p",
                             "dh_p", "dl_p", "ch_p", "cl_p", "dd_p",
                             "n_p"])

    folded = lineitem.select_columns(
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
         "l_discount", "l_tax"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["l_returnflag", "l_linestatus"]).aggregate(
            RSum("q_p", alias_name="q"), RSum("b_p", alias_name="b"),
            RSum("dh_p", alias_name="dh"), RSum("dl_p", alias_name="dl"),
            RSum("ch_p", alias_name="ch"), RSum("cl_p", alias_name="cl"),
            RSum("dd_p", alias_name="dd"), RSum("n_p", alias_name="n"))

    def finalize(batch: pa.Table) -> pa.Table:
        LIMB = 10 ** 9
        out = {"l_returnflag": [], "l_linestatus": [], "sum_qty": [],
               "sum_base_e2": [], "sum_disc_e4": [], "sum_charge_e6": [],
               "avg_qty_e6": [], "avg_price_e6": [], "avg_disc_e6": [],
               "n_rows": []}
        for r in batch.to_pylist():
            n = int(r["n"])
            d4 = int(r["dh"]) * LIMB + int(r["dl"])
            c6 = int(r["ch"]) * LIMB + int(r["cl"])
            out["l_returnflag"].append(r["l_returnflag"])
            out["l_linestatus"].append(r["l_linestatus"])
            out["sum_qty"].append(int(r["q"]))
            out["sum_base_e2"].append(int(r["b"]))
            out["sum_disc_e4"].append(d4)
            out["sum_charge_e6"].append(c6)
            out["avg_qty_e6"].append(int(r["q"]) * 10 ** 6 // n)
            out["avg_price_e6"].append(int(r["b"]) * 10 ** 4 // n)
            out["avg_disc_e6"].append(int(r["dd"]) * 10 ** 4 // n)
            out["n_rows"].append(n)
        return pa.table({
            "l_returnflag": pa.array(out["l_returnflag"], pa.string()),
            "l_linestatus": pa.array(out["l_linestatus"], pa.string()),
            **{k: pa.array(out[k], pa.int64()) for k in
               ("sum_qty", "sum_base_e2", "sum_disc_e4", "sum_charge_e6",
                "avg_qty_e6", "avg_price_e6", "avg_disc_e6", "n_rows")},
        })

    return folded.map_batches(finalize, batch_format="pyarrow") \
        .sort(["l_returnflag", "l_linestatus"])


def value_mode_by_type(events: ray.data.Dataset) -> ray.data.Dataset:
    """Exact MODE per event type (most frequent e3-quantized value,
    ties -> smallest value) — the aggregate SQL calls ``mode()`` and
    approximate engines sketch; here it falls out of the same
    value-range-bounded histogram fold as the exact median/MAD.
    -> (event_type, mode_e3, n_occurrences)."""
    from ray.data.aggregate import Sum as RSum
    import pyarrow.compute as pc

    def pre(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return pa.table({
            "event_type": batch["event_type"],
            "ve3": pa.array(np.floor(v * 1000 + 0.5).astype(np.int64),
                            pa.int64()),
        }).group_by(["event_type", "ve3"]).aggregate([([], "count_all")]) \
            .rename_columns(["event_type", "ve3", "c_p"])

    hist = events.select_columns(["event_type", "value"]) \
        .map_batches(pre, batch_format="pyarrow") \
        .groupby(["event_type", "ve3"]).aggregate(RSum("c_p",
                                                       alias_name="c"))

    def finalize(group: pa.Table) -> pa.Table:
        ve3 = group["ve3"].to_numpy(zero_copy_only=False)
        c = group["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        i = np.lexsort((ve3, -c))[0]
        return pa.table({
            "event_type": pa.array([group["event_type"][0].as_py()],
                                   pa.string()),
            "mode_e3": pa.array([int(ve3[i])], pa.int64()),
            "n_occurrences": pa.array([int(c[i])], pa.int64()),
        })

    return hist.groupby("event_type").map_groups(finalize,
                                                 batch_format="pyarrow")


def value_lag1_cov(events: ray.data.Dataset) -> ray.data.Dataset:
    """Lag-1 autocovariance of the value series per event type (in
    (ts, event_id) order): bursty/sticky metrics show positive lag-1
    covariance, alternating ones negative — the stationarity probe
    before alerting on :func:`value_trend_by_type`'s slope.

    Exact integers: consecutive e3-value pairs fold to Σa, Σb, Σab
    (python bigints at the finalize); cov = trunc((mΣab − ΣaΣb)/m²)
    over the m = n-1 pairs.  Per-type ``map_groups`` local sort.
    -> (event_type, n_pairs, lag1_cov_e6)."""

    def per_type(g: pa.Table) -> pa.Table:
        ts = g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        v = np.floor(g["value"].to_numpy(zero_copy_only=False)
                     .astype(np.float64) * 1000 + 0.5).astype(np.int64)
        et = g["event_type"][0].as_py()
        order = np.lexsort((eid, ts))
        v = v[order]
        if v.size < 2:
            return pa.table({"event_type": pa.array([et], pa.string()),
                             "n_pairs": pa.array([0], pa.int64()),
                             "lag1_cov_e6": pa.array([0], pa.int64())})
        a, b = v[:-1], v[1:]
        m = int(a.size)
        sa, sb = int(a.sum()), int(b.sum())
        sab = sum(int(x) * int(y) for x, y in zip(a, b))
        num = (m * sab - sa * sb) * 10 ** 6
        den = m * m
        q = abs(num) // den
        return pa.table({
            "event_type": pa.array([et], pa.string()),
            "n_pairs": pa.array([m], pa.int64()),
            "lag1_cov_e6": pa.array([-q if num < 0 else q], pa.int64()),
        })

    return events.select_columns(["event_type", "ts", "event_id",
                                  "value"]) \
        .groupby("event_type").map_groups(per_type,
                                          batch_format="pyarrow")


def string_stats_by_group(ds: ray.data.Dataset, key: str = "lang",
                          col: str = "text") -> pa.Table:
    """ES ``string_stats`` aggregation (with ``show_distribution``'s
    entropy) per ``key`` over a text column: doc count, min/max/avg
    length and the Shannon entropy of the group's aggregated CHARACTER
    distribution — the quick text-health probe ES serves off the index
    (the reference's dashboards read the same per-field stats surface,
    ``ElasticSearchStorage.cs:200-236``).

    One corpus pass, fully vectorized: each batch folds a per-group
    256-bin byte histogram with ONE ``np.bincount`` over the string
    column's raw UTF-8 buffer (documents are ASCII, so bytes ==
    characters; multi-byte corpora would switch this to a codepoint
    dictionary), plus per-group length stats — emitted as a tagged
    union (byte rows carry counts; one byte=-1 marker row per group
    carries n/min/max with neutral elements elsewhere) so ONE
    (key, byte) groupby folds both exactly.  Entropy finalizes on the
    driver over <= 256 values per group as order-free e6-rounded
    per-char contributions ``sum_c floor(-p_c*log2(p_c)*1e6 + 0.5)``
    (p_c exact rationals), so the SQL oracle matches bit-for-bit.
    -> (key, n, min_len, max_len, avg_len_e6, entropy_e6)."""
    BIG = 1 << 62

    def partial(batch: pa.Table) -> pa.Table:
        s = pc.fill_null(batch[col].cast(pa.string()), "")
        s = s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s
        keys = batch[key].to_numpy(zero_copy_only=False).astype(str)
        uk, inv = np.unique(keys, return_inverse=True)
        offs = np.frombuffer(s.buffers()[1], np.int32)[
            s.offset: s.offset + len(s) + 1]
        data = np.frombuffer(s.buffers()[2], np.uint8)[offs[0]:offs[-1]]
        row_bytes = np.diff(offs).astype(np.int64)
        parent = np.repeat(inv, row_bytes)
        hist = np.bincount(parent * 256 + data.astype(np.int64),
                           minlength=uk.size * 256).reshape(uk.size, 256)
        gi_nz, byte_nz = np.nonzero(hist)
        n_g = np.bincount(inv, minlength=uk.size).astype(np.int64)
        mn_g = np.full(uk.size, BIG, dtype=np.int64)
        mx_g = np.full(uk.size, -1, dtype=np.int64)
        np.minimum.at(mn_g, inv, row_bytes)
        np.maximum.at(mx_g, inv, row_bytes)
        gk = np.concatenate([gi_nz, np.arange(uk.size)])
        return pa.table({
            key: pa.array(uk[gk], pa.string()),
            "byte": pa.array(np.concatenate(
                [byte_nz, np.full(uk.size, -1)]).astype(np.int64),
                pa.int64()),
            "cnt_p": pa.array(np.concatenate(
                [hist[gi_nz, byte_nz], np.zeros(uk.size, np.int64)])
                .astype(np.int64), pa.int64()),
            "n_p": pa.array(np.concatenate(
                [np.zeros(gi_nz.size, np.int64), n_g]), pa.int64()),
            "mn_p": pa.array(np.concatenate(
                [np.full(gi_nz.size, BIG, np.int64), mn_g]), pa.int64()),
            "mx_p": pa.array(np.concatenate(
                [np.full(gi_nz.size, -1, np.int64), mx_g]), pa.int64()),
        })

    folded = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby([key, "byte"]) \
        .aggregate(Sum("cnt_p", alias_name="cnt"),
                   Sum("n_p", alias_name="n"),
                   Min("mn_p", alias_name="mn"),
                   Max("mx_p", alias_name="mx")).take_all()
    groups: dict[str, dict] = {}
    for r in folded:
        g = groups.setdefault(str(r[key]),
                              {"chars": {}, "n": 0, "mn": BIG, "mx": -1,
                               "total": 0})
        b = int(r["byte"])
        if b < 0:
            g["n"] = int(r["n"])
            g["mn"] = int(r["mn"])
            g["mx"] = int(r["mx"])
        else:
            g["chars"][b] = int(r["cnt"])
            g["total"] += int(r["cnt"])
    keys_sorted = sorted(groups)
    ent = []
    for kval in keys_sorted:
        g = groups[kval]
        tot = g["total"]
        e = 0
        for b in sorted(g["chars"]):
            p = g["chars"][b] / tot
            e += int(np.floor(-p * np.log2(p) * 1_000_000 + 0.5))
        ent.append(e)
    # ASCII corpus: total bytes == total chars, so avg length folds
    # straight off the histogram mass (no separate length-sum channel)
    avg = [groups[kv]["total"] * 1_000_000 // max(1, groups[kv]["n"])
           for kv in keys_sorted]
    return pa.table({
        key: pa.array(keys_sorted, pa.string()),
        "n": pa.array([groups[kv]["n"] for kv in keys_sorted], pa.int64()),
        "min_len": pa.array([groups[kv]["mn"] for kv in keys_sorted],
                            pa.int64()),
        "max_len": pa.array([groups[kv]["mx"] for kv in keys_sorted],
                            pa.int64()),
        "avg_len_e6": pa.array(avg, pa.int64()),
        "entropy_e6": pa.array(ent, pa.int64()),
    })


def value_boxplot_by_type(events: ray.data.Dataset) -> ray.data.Dataset:
    """ES ``boxplot`` aggregation per event_type over ``value``: exact
    q1/q2/q3 (percentile_disc over e6-quantized values — ES's TDigest
    is approximate; exact is strictly stronger and SQL-checkable), the
    IQR, Tukey fences at 1.5x IQR and the outlier count outside them.
    Integer-exact end to end: values quantize to e6 BEFORE the
    percentile pick, fences use ``(3*iqr)//2`` with iqr >= 0 so Python
    and DuckDB division agree.  Scale: one event_type shuffle; each
    group sorts in one task (exact percentiles need the sort — the
    100-TB swap is a per-batch t-digest partial fold).
    -> (event_type, n, q1_e6, q2_e6, q3_e6, iqr_e6, lo_fence_e6,
        hi_fence_e6, n_outliers)."""

    def box(group: pa.Table) -> pa.Table:
        v = group["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        q = np.sort(np.floor(v * 1_000_000 + 0.5).astype(np.int64))
        n = q.size
        def disc(p: int) -> int:
            return int(q[(p * n + 99) // 100 - 1])
        q1, q2, q3 = disc(25), disc(50), disc(75)
        iqr = q3 - q1
        lo = q1 - (3 * iqr) // 2
        hi = q3 + (3 * iqr) // 2
        n_out = int(((q < lo) | (q > hi)).sum())
        return pa.table({
            "event_type": pa.array([group["event_type"][0].as_py()],
                                   pa.string()),
            "n": pa.array([n], pa.int64()),
            "q1_e6": pa.array([q1], pa.int64()),
            "q2_e6": pa.array([q2], pa.int64()),
            "q3_e6": pa.array([q3], pa.int64()),
            "iqr_e6": pa.array([iqr], pa.int64()),
            "lo_fence_e6": pa.array([lo], pa.int64()),
            "hi_fence_e6": pa.array([hi], pa.int64()),
            "n_outliers": pa.array([n_out], pa.int64()),
        })

    return events.select_columns(["event_type", "value"]) \
        .groupby("event_type").map_groups(box, batch_format="pyarrow")


def q4_order_priority(lineitem: ray.data.Dataset,
                      orders: ray.data.Dataset,
                      lag_days: int = 30) -> pa.Table:
    """TPC-H-Q4-shaped EXISTS semi-join: count orders per
    o_orderpriority having at least one lineitem shipped >= lag_days
    after the order date (the schema has no commit/receipt dates, so
    "late shipment" stands in for Q4's commit<receipt predicate —
    same join/aggregation shape).  Plan: big-big :func:`equi_join`
    (narrow projections), vectorized date filter, per-batch distinct
    (orderkey, priority), global pair dedup, tiny priority fold —
    orders and lineitem each shuffle once as narrow rows.
    -> (o_orderpriority, n_orders) sorted by priority."""
    from ray.data.aggregate import Sum as RSum

    lag_us = lag_days * 86_400_000_000
    li = lineitem.select_columns(["l_orderkey", "l_shipdate"])
    od = orders.select_columns(["o_orderkey", "o_orderdate",
                                "o_orderpriority"])
    joined = equi_join(li, od, "l_orderkey", "o_orderkey",
                       ["l_shipdate"],
                       ["o_orderdate", "o_orderpriority"],
                       key_alias="okey")

    def late_pairs(batch: pa.Table) -> pa.Table:
        ship = batch["l_shipdate"].cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        odate = batch["o_orderdate"].cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        m = ship >= odate + lag_us
        t = pa.table({"okey": batch["okey"].filter(pa.array(m)),
                      "pri": batch["o_orderpriority"]
                      .filter(pa.array(m))})
        return t.group_by(["okey", "pri"]).aggregate([]) \
            if t.num_rows else t

    pairs = joined.map_batches(late_pairs, batch_format="pyarrow") \
        .groupby(["okey", "pri"]).count()

    def pri_partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("pri").aggregate([([], "count_all")])
        return pa.table({"pri": g["pri"],
                         "n_p": g["count_all"].cast(pa.int64())})

    folded = pairs.map_batches(pri_partial, batch_format="pyarrow") \
        .groupby("pri").aggregate(RSum("n_p", alias_name="n_orders")) \
        .take_all()
    folded.sort(key=lambda r: str(r["pri"]))
    return pa.table({
        "o_orderpriority": pa.array([str(r["pri"]) for r in folded],
                                    pa.string()),
        "n_orders": pa.array([int(r["n_orders"]) for r in folded],
                             pa.int64()),
    })


def rfm_segments(events: ray.data.Dataset,
                 event_type: str = "purchase",
                 n_tiles: int = 5) -> pa.Table:
    """RFM customer segmentation over purchase events: per user,
    recency (latest purchase day), frequency (count) and monetary
    (exact e6 value sum) fold distributedly (one user_id shuffle of
    narrow partials); each metric is then NTILE'd (SQL semantics,
    tie-broken by user_id; recency ordered DESC so tile 1 = most
    recent) and users roll up by the 3-digit R*100+F*10+M code.
    Finalize runs on the per-user result — at the 100-TB target the
    tile thresholds come from a quantile sketch instead and the
    rollup stays distributed (documented swap, same outputs).
    -> (rfm_code, n_users, m_sum_e6) sorted by code."""
    from ray.data.aggregate import Count, Max, Sum as RSum

    def partial(batch: pa.Table) -> pa.Table:
        m = pc.equal(batch["event_type"], event_type)
        b = batch.filter(m)
        v = b["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        ve6 = np.floor(v * 1_000_000 + 0.5).astype(np.int64)
        day = (b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
               // 86_400_000_000)
        t = pa.table({"user_id": b["user_id"].cast(pa.int64()),
                      "day": pa.array(day, pa.int64()),
                      "v": pa.array(ve6, pa.int64())})
        g = t.group_by("user_id").aggregate(
            [("day", "max"), ("v", "sum"), ([], "count_all")])
        return pa.table({"user_id": g["user_id"],
                         "r_p": g["day_max"].cast(pa.int64()),
                         "m_p": g["v_sum"].cast(pa.int64()),
                         "f_p": g["count_all"].cast(pa.int64())})

    folded = events.map_batches(partial, batch_format="pyarrow") \
        .groupby("user_id").aggregate(
            Max("r_p", alias_name="r_day"),
            RSum("f_p", alias_name="f"),
            RSum("m_p", alias_name="m_e6")).take_all()
    if not folded:
        return pa.table({"rfm_code": pa.array([], pa.int64()),
                         "n_users": pa.array([], pa.int64()),
                         "m_sum_e6": pa.array([], pa.int64())})
    uid = np.array([int(r["user_id"]) for r in folded], np.int64)
    r_day = np.array([int(r["r_day"]) for r in folded], np.int64)
    f = np.array([int(r["f"]) for r in folded], np.int64)
    m = np.array([int(r["m_e6"]) for r in folded], np.int64)
    n = uid.size

    def ntile(keys: np.ndarray, desc: bool) -> np.ndarray:
        order = np.lexsort((uid, -keys if desc else keys))
        ranks = np.empty(n, dtype=np.int64)
        ranks[order] = np.arange(n, dtype=np.int64)
        base, rem = divmod(n, n_tiles)
        if base == 0:
            return ranks + 1
        big = rem * (base + 1)
        return np.where(ranks < big, ranks // (base + 1),
                        rem + (ranks - big) // base) + 1

    code = ntile(r_day, True) * 100 + ntile(f, False) * 10 \
        + ntile(m, False)
    codes, inv = np.unique(code, return_inverse=True)
    n_users = np.bincount(inv).astype(np.int64)
    m_sum = np.zeros(codes.size, dtype=np.int64)
    np.add.at(m_sum, inv, m)
    return pa.table({"rfm_code": pa.array(codes, pa.int64()),
                     "n_users": pa.array(n_users, pa.int64()),
                     "m_sum_e6": pa.array(m_sum, pa.int64())})


def dau_mau_stickiness(events: ray.data.Dataset) -> pa.Table:
    """DAU/MAU stickiness per calendar month: sum of daily distinct
    users / (active days x monthly distinct users), exact integers.
    One narrow distinct-pair shuffle: per-batch distinct
    (month, day, user) triples (exact across batches after the global
    pair groupby), then day counts and month-distinct folds.
    -> (month, n_days, mau, dau_sum, stickiness_e6) by month;
    month is the epoch-day of the month's first day."""
    from ray.data.aggregate import Sum as RSum

    def triples(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = ts // 86_400_000_000
        # month key = epoch-day of the month start, numpy datetime math
        days = day.astype("datetime64[D]")
        mstart = days.astype("datetime64[M]").astype("datetime64[D]") \
            .astype(np.int64)
        t = pa.table({"month": pa.array(mstart, pa.int64()),
                      "day": pa.array(day, pa.int64()),
                      "user_id": batch["user_id"].cast(pa.int64())})
        return t.group_by(["month", "day", "user_id"]).aggregate([])

    pairs = events.select_columns(["ts", "user_id"]) \
        .map_batches(triples, batch_format="pyarrow") \
        .groupby(["month", "day", "user_id"]).count()

    def fold(batch: pa.Table) -> pa.Table:
        # batch rows are globally-distinct triples
        g = batch.group_by(["month", "day"]).aggregate([([], "count_all")])
        mu = batch.group_by(["month", "user_id"]).aggregate([])
        return pa.table({
            "month": pa.concat_arrays(
                [g["month"].combine_chunks(),
                 mu["month"].combine_chunks()]),
            "kind": pa.array([0] * g.num_rows + [1] * mu.num_rows,
                             pa.int64()),
            "key": pa.concat_arrays(
                [g["day"].combine_chunks(),
                 mu["user_id"].combine_chunks()]),
            "cnt": pa.concat_arrays(
                [g["count_all"].cast(pa.int64()).combine_chunks(),
                 pa.array([1] * mu.num_rows, pa.int64())]),
        })

    # (month, 0, day) rows need a cnt SUM across batches (a day's users
    # can straddle pair blocks); (month, 1, user) rows dedup by key.
    folded = pairs.map_batches(fold, batch_format="pyarrow") \
        .groupby(["month", "kind", "key"]) \
        .aggregate(RSum("cnt", alias_name="n")).take_all()
    agg: dict[int, dict] = {}
    for r in folded:
        g = agg.setdefault(int(r["month"]),
                           {"days": 0, "dau_sum": 0, "mau": 0})
        if int(r["kind"]) == 0:
            g["days"] += 1
            g["dau_sum"] += int(r["n"])
        else:
            g["mau"] += 1
    months = sorted(agg)
    return pa.table({
        "month": pa.array(months, pa.int64()),
        "n_days": pa.array([agg[m]["days"] for m in months], pa.int64()),
        "mau": pa.array([agg[m]["mau"] for m in months], pa.int64()),
        "dau_sum": pa.array([agg[m]["dau_sum"] for m in months],
                            pa.int64()),
        "stickiness_e6": pa.array(
            [agg[m]["dau_sum"] * 10 ** 6
             // max(1, agg[m]["days"] * agg[m]["mau"])
             for m in months], pa.int64()),
    })


def l_diversity_report(docs: ray.data.Dataset,
                       quasi: str = "source",
                       sensitive: str = "lang") -> pa.Table:
    """l-diversity audit (the companion to ``k_anonymity``): per
    quasi-identifier cell, row count and the number of DISTINCT
    sensitive values — a cell with l=1 lets an attacker who locates a
    row in it read the sensitive attribute outright.  Narrow
    (quasi, sensitive) pair partials; content never shuffles.
    -> (quasi, n_rows, l_distinct) sorted by quasi."""
    from ray.data.aggregate import Sum as RSum

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([quasi, sensitive])
        g = t.group_by([quasi, sensitive]).aggregate([([], "count_all")])
        return pa.table({quasi: g[quasi], "s": g[sensitive],
                         "n_p": g["count_all"].cast(pa.int64())})

    folded = docs.map_batches(partial, batch_format="pyarrow") \
        .groupby([quasi, "s"]).aggregate(RSum("n_p", alias_name="n")) \
        .take_all()
    agg: dict[str, list[int]] = {}
    for r in folded:
        a = agg.setdefault(str(r[quasi]), [0, 0])
        a[0] += int(r["n"])
        a[1] += 1
    keys = sorted(agg)
    return pa.table({
        quasi: pa.array(keys, pa.string()),
        "n_rows": pa.array([agg[k][0] for k in keys], pa.int64()),
        "l_distinct": pa.array([agg[k][1] for k in keys], pa.int64()),
    })


def q7_nation_volume(lineitem: ray.data.Dataset, orders: ray.data.Dataset,
                     customer: ray.data.Dataset, supplier: pa.Table,
                     nation: pa.Table, nation1: str = "NATION_1",
                     nation2: str = "NATION_2", year_lo: int = 1995,
                     year_hi: int = 2001) -> pa.Table:
    """TPC-H-Q7-shaped bilateral shipping volume: revenue between two
    nations (supplier in one, ordering customer in the other, both
    directions) per ship year.  Same co-group plan as
    ``q5_region_revenue`` — the only large-large exchange is ONE
    ``groupby(orderkey)`` over pivoted partials:

    - supplier->nation and the two-nation customer map are broadcast
      (tiny / documented small-side; at 10^9 customers swap the cust
      map for a key-salted co-group, downstream unchanged);
    - lineitem partials pivot revenue into (2 supplier slots x year)
      columns so the direction match after the shuffle is a vectorized
      column-take, never per-group Python.

    Revenue exact e4.  -> (supp_nation, cust_nation, l_year,
    revenue_e4) ordered by the three keys."""
    import ray

    nat_key = {r["n_name"]: int(r["n_nationkey"]) for r in nation.to_pylist()}
    nk1, nk2 = nat_key[nation1], nat_key[nation2]
    years = list(range(year_lo, year_hi + 1))
    n_y = len(years)

    supp_slot = np.full(
        int(max(r["s_suppkey"] for r in supplier.to_pylist())) + 1, -1,
        dtype=np.int64)
    for r in supplier.to_pylist():
        nk = int(r["s_nationkey"])
        if nk == nk1:
            supp_slot[int(r["s_suppkey"])] = 0
        elif nk == nk2:
            supp_slot[int(r["s_suppkey"])] = 1

    cust_nat: dict[int, int] = {}
    for b in customer.select_columns(["c_custkey", "c_nationkey"]) \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        ck = b["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        nk = b["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = (nk == nk1) | (nk == nk2)
        cust_nat.update(zip(ck[m].tolist(),
                            np.where(nk[m] == nk1, 0, 1).tolist()))
    cust_keys = np.asarray(sorted(cust_nat), dtype=np.int64)
    cust_vals = np.asarray([cust_nat[k] for k in cust_keys], dtype=np.int64)
    cref = ray.put((cust_keys, cust_vals))
    sref = ray.put(supp_slot)

    rev_cols = [f"rev_{s}_{y}" for s in (0, 1) for y in years]

    def proj_orders(batch: pa.Table) -> pa.Table:
        keys, vals = ray.get(cref)
        okey = batch["o_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ckey = batch["o_custkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if keys.size:
            pos = np.searchsorted(keys, ckey)
            pos[pos >= keys.size] = 0
            m = keys[pos] == ckey
        else:
            pos = np.zeros(ckey.size, dtype=np.int64)
            m = np.zeros(ckey.size, dtype=bool)
        cols = {"key": pa.array(okey[m], pa.int64()),
                "c_slot": pa.array(vals[pos[m]], pa.int64())}
        for c in rev_cols:
            cols[c] = pa.array(np.zeros(int(m.sum()), np.int64), pa.int64())
        return pa.table(cols)

    def proj_line(batch: pa.Table) -> pa.Table:
        slot = ray.get(sref)
        okey = batch["l_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        skey = batch["l_suppkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        yr = pc.year(batch["l_shipdate"]).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        ss = np.where(skey < slot.size, slot[np.minimum(skey, slot.size - 1)],
                      -1)
        m = (ss >= 0) & (yr >= years[0]) & (yr <= years[-1])
        okey, ss, yr = okey[m], ss[m], yr[m]
        rev = (np.floor(price[m] * 100 + 0.5).astype(np.int64)
               * np.floor((1.0 - disc[m]) * 100 + 0.5).astype(np.int64))
        col = ss * n_y + (yr - years[0])
        keys, inv = np.unique(okey, return_inverse=True)
        pivot = np.zeros((keys.size, 2 * n_y), dtype=np.int64)
        np.add.at(pivot, (inv, col), rev)
        cols = {"key": pa.array(keys, pa.int64()),
                "c_slot": pa.nulls(keys.size, pa.int64())}
        for j, c in enumerate(rev_cols):
            cols[c] = pa.array(pivot[:, j], pa.int64())
        return pa.table(cols)

    tagged = orders.map_batches(proj_orders, batch_format="pyarrow") \
        .union(lineitem.map_batches(proj_line, batch_format="pyarrow"))
    agg = tagged.groupby("key").aggregate(
        Max("c_slot", alias_name="c_slot"),
        *[Sum(c, alias_name=c) for c in rev_cols])

    names = {0: nation1, 1: nation2}
    # (supp_slot, cust_slot, year) accumulator: only opposite-slot pairs.
    acc = np.zeros((2, n_y), dtype=np.int64)   # row = supp slot

    def finish(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_valid(batch["c_slot"]))
        if not t.num_rows:
            return pa.table({"s": pa.array([], pa.int64()),
                             "y": pa.array([], pa.int64()),
                             "r": pa.array([], pa.int64())})
        cs = t["c_slot"].to_numpy(zero_copy_only=False).astype(np.int64)
        pivot = np.stack([t[c].to_numpy(zero_copy_only=False)
                          .astype(np.int64) for c in rev_cols], axis=1)
        pivot = pivot.reshape(-1, 2, n_y)
        out_s, out_y, out_r = [], [], []
        for supp in (0, 1):
            rows = pivot[cs == 1 - supp, supp, :]   # cust is the OTHER slot
            if rows.size:
                part = rows.sum(axis=0)
                nz = np.nonzero(part)[0]
                out_s.extend([supp] * nz.size)
                out_y.extend((nz + years[0]).tolist())
                out_r.extend(part[nz].tolist())
        return pa.table({"s": pa.array(out_s, pa.int64()),
                         "y": pa.array(out_y, pa.int64()),
                         "r": pa.array(out_r, pa.int64())})

    for b in agg.map_batches(finish, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        s = b["s"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = b["y"].to_numpy(zero_copy_only=False).astype(np.int64)
        r = b["r"].to_numpy(zero_copy_only=False).astype(np.int64)
        np.add.at(acc, (s, y - years[0]), r)

    out = {"supp_nation": [], "cust_nation": [], "l_year": [],
           "revenue_e4": []}
    for supp in sorted((0, 1), key=lambda s: names[s]):
        for j, y in enumerate(years):
            if acc[supp, j]:
                out["supp_nation"].append(names[supp])
                out["cust_nation"].append(names[1 - supp])
                out["l_year"].append(y)
                out["revenue_e4"].append(int(acc[supp, j]))
    return pa.table({"supp_nation": pa.array(out["supp_nation"], pa.string()),
                     "cust_nation": pa.array(out["cust_nation"], pa.string()),
                     "l_year": pa.array(out["l_year"], pa.int64()),
                     "revenue_e4": pa.array(out["revenue_e4"], pa.int64())})


def q8_market_share(lineitem: ray.data.Dataset, orders: ray.data.Dataset,
                    customer: ray.data.Dataset, part: pa.Table,
                    supplier: pa.Table, nation: pa.Table, region: pa.Table,
                    region_name: str = "ASIA",
                    target_nation: str = "NATION_3",
                    p_type: str = "PROMO") -> pa.Table:
    """TPC-H-Q8-shaped national market share: among orders placed by
    customers in one region for parts of one type, the share of
    revenue supplied by one target nation, per ORDER year.

    Plan: part-of-type ids, supplier->target flag and in-region
    customer keys broadcast (documented small sides — the part id set
    becomes a Bloom filter at 10^9 parts, same downstream shape);
    lineitem folds per-order (rev_total, rev_target) e4 partials;
    orders tag (orderkey, year) for in-region customers; ONE orderkey
    co-group, then a tiny per-year fold.  Share is exact integer e6
    (floor of rev_target*1e6 / rev_total, Python bigint — no float).
    -> (o_year, rev_total_e4, rev_target_e4, share_e6) by year."""
    import ray

    rkeys = {r["r_regionkey"]: r["r_name"] for r in region.to_pylist()}
    in_region = {int(r["n_nationkey"]) for r in nation.to_pylist()
                 if rkeys[r["n_regionkey"]] == region_name}
    target_nk = {r["n_name"]: int(r["n_nationkey"])
                 for r in nation.to_pylist()}[target_nation]

    type_parts = np.asarray(sorted(
        int(r["p_partkey"]) for r in part.to_pylist()
        if r["p_type"] == p_type), dtype=np.int64)
    supp_target = np.zeros(
        int(max(r["s_suppkey"] for r in supplier.to_pylist())) + 1,
        dtype=bool)
    for r in supplier.to_pylist():
        if int(r["s_nationkey"]) == target_nk:
            supp_target[int(r["s_suppkey"])] = True

    cust_keys: list[np.ndarray] = []
    for b in customer.select_columns(["c_custkey", "c_nationkey"]) \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        ck = b["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        nk = b["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        cust_keys.append(ck[np.isin(nk, np.asarray(sorted(in_region),
                                                   dtype=np.int64))])
    ckeys = np.sort(np.concatenate(cust_keys)) if cust_keys \
        else np.array([], dtype=np.int64)
    cref = ray.put(ckeys)
    pref = ray.put(type_parts)
    sref = ray.put(supp_target)

    def proj_orders(batch: pa.Table) -> pa.Table:
        keys = ray.get(cref)
        okey = batch["o_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ckey = batch["o_custkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        yr = pc.year(batch["o_orderdate"]).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if keys.size:
            pos = np.searchsorted(keys, ckey)
            pos[pos >= keys.size] = 0
            m = keys[pos] == ckey
        else:
            m = np.zeros(ckey.size, dtype=bool)
        n = int(m.sum())
        return pa.table({"key": pa.array(okey[m], pa.int64()),
                         "o_year": pa.array(yr[m], pa.int64()),
                         "rev_total": pa.array(np.zeros(n, np.int64)),
                         "rev_target": pa.array(np.zeros(n, np.int64))})

    def proj_line(batch: pa.Table) -> pa.Table:
        parts = ray.get(pref)
        st = ray.get(sref)
        okey = batch["l_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        pkey = batch["l_partkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        skey = batch["l_suppkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if parts.size:
            pos = np.searchsorted(parts, pkey)
            pos[pos >= parts.size] = 0
            m = parts[pos] == pkey
        else:
            m = np.zeros(pkey.size, dtype=bool)
        okey, skey = okey[m], skey[m]
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)[m]
        disc = batch["l_discount"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)[m]
        rev = (np.floor(price * 100 + 0.5).astype(np.int64)
               * np.floor((1.0 - disc) * 100 + 0.5).astype(np.int64))
        tgt = np.where(skey < st.size, st[np.minimum(skey, st.size - 1)],
                       False)
        keys, inv = np.unique(okey, return_inverse=True)
        tot = np.zeros(keys.size, dtype=np.int64)
        tg = np.zeros(keys.size, dtype=np.int64)
        np.add.at(tot, inv, rev)
        np.add.at(tg, inv[tgt], rev[tgt])
        return pa.table({"key": pa.array(keys, pa.int64()),
                         "o_year": pa.nulls(keys.size, pa.int64()),
                         "rev_total": pa.array(tot, pa.int64()),
                         "rev_target": pa.array(tg, pa.int64())})

    tagged = orders.map_batches(proj_orders, batch_format="pyarrow") \
        .union(lineitem.map_batches(proj_line, batch_format="pyarrow"))
    agg = tagged.groupby("key").aggregate(
        Max("o_year", alias_name="o_year"),
        Sum("rev_total", alias_name="rev_total"),
        Sum("rev_target", alias_name="rev_target"))

    def finish(batch: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(batch["o_year"]),
                    pc.greater(pc.coalesce(batch["rev_total"], 0), 0))
        t = batch.filter(m)
        if not t.num_rows:
            return pa.table({"o_year": pa.array([], pa.int64()),
                             "tot": pa.array([], pa.int64()),
                             "tg": pa.array([], pa.int64())})
        yr = t["o_year"].to_numpy(zero_copy_only=False).astype(np.int64)
        tot = t["rev_total"].to_numpy(zero_copy_only=False).astype(np.int64)
        tg = t["rev_target"].to_numpy(zero_copy_only=False).astype(np.int64)
        keys, inv = np.unique(yr, return_inverse=True)
        ptot = np.zeros(keys.size, dtype=np.int64)
        ptg = np.zeros(keys.size, dtype=np.int64)
        np.add.at(ptot, inv, tot)
        np.add.at(ptg, inv, tg)
        return pa.table({"o_year": pa.array(keys, pa.int64()),
                         "tot": pa.array(ptot, pa.int64()),
                         "tg": pa.array(ptg, pa.int64())})

    acc: dict[int, list[int]] = {}
    for b in agg.map_batches(finish, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        for y, tot, tg in zip(b["o_year"].to_pylist(),
                              b["tot"].to_pylist(), b["tg"].to_pylist()):
            a = acc.setdefault(int(y), [0, 0])
            a[0] += int(tot)
            a[1] += int(tg)
    years = sorted(acc)
    return pa.table({
        "o_year": pa.array(years, pa.int64()),
        "rev_total_e4": pa.array([acc[y][0] for y in years], pa.int64()),
        "rev_target_e4": pa.array([acc[y][1] for y in years], pa.int64()),
        "share_e6": pa.array([acc[y][1] * 1_000_000 // acc[y][0]
                              for y in years], pa.int64()),
    })


def q13_order_distribution(customer: ray.data.Dataset,
                           orders: ray.data.Dataset) -> pa.Table:
    """TPC-H-Q13-shaped customer order-count distribution INCLUDING
    zero-order customers (the LEFT-JOIN shape): tagged union of
    (custkey, one order) and (custkey, customer marker) rows, ONE
    custkey groupby -> per-customer count gated on the marker (order
    rows with no customer row are dropped, mirroring the LEFT side),
    then a tiny count-of-counts fold.  Narrow int rows only.
    -> (c_count, custdist) by (custdist desc, c_count desc)."""

    def proj_orders(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({"key": batch["o_custkey"].cast(pa.int64()),
                         "n_ord": pa.array(np.ones(n, np.int64)),
                         "is_cust": pa.array(np.zeros(n, np.int64))})

    def proj_cust(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({"key": batch["c_custkey"].cast(pa.int64()),
                         "n_ord": pa.array(np.zeros(n, np.int64)),
                         "is_cust": pa.array(np.ones(n, np.int64))})

    tagged = orders.select_columns(["o_custkey"]) \
        .map_batches(proj_orders, batch_format="pyarrow") \
        .union(customer.select_columns(["c_custkey"])
               .map_batches(proj_cust, batch_format="pyarrow"))
    per_cust = tagged.groupby("key").aggregate(
        Sum("n_ord", alias_name="c_count"),
        Max("is_cust", alias_name="is_cust"))

    def hist(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["is_cust"], 1))
        cc = t["c_count"].to_numpy(zero_copy_only=False).astype(np.int64)
        keys, counts = np.unique(cc, return_counts=True)
        return pa.table({"c_count": pa.array(keys, pa.int64()),
                         "n_p": pa.array(counts.astype(np.int64))})

    acc: dict[int, int] = {}
    for b in per_cust.map_batches(hist, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        for k, v in zip(b["c_count"].to_pylist(), b["n_p"].to_pylist()):
            acc[int(k)] = acc.get(int(k), 0) + int(v)
    rows = sorted(acc.items(), key=lambda kv: (-kv[1], -kv[0]))
    return pa.table({"c_count": pa.array([r[0] for r in rows], pa.int64()),
                     "custdist": pa.array([r[1] for r in rows], pa.int64())})


def q17_small_qty_revenue(lineitem: ray.data.Dataset, part: pa.Table,
                          brand: str = "Brand#13") -> pa.Table:
    """TPC-H-Q17-shaped correlated-average predicate: total revenue of
    lineitems for one brand's parts whose quantity is below 20% of that
    PART's average quantity.  The correlated subquery becomes a
    two-pass plan: pass 1 folds per-part (sum_qty, count) over the
    brand-pruned lineitems (bounded by the brand's part count — tiny),
    the driver broadcasts it; pass 2 re-streams the pruned lineitems
    and applies the EXACT integer predicate ``5*qty*cnt < sum_qty``
    (no float average anywhere).  -> one row
    (p_brand, n_lineitems, total_price_e2)."""
    import ray

    brand_parts = np.asarray(sorted(
        int(r["p_partkey"]) for r in part.to_pylist()
        if r["p_brand"] == brand), dtype=np.int64)
    pref = ray.put(brand_parts)

    def prune(batch: pa.Table) -> pa.Table:
        parts = ray.get(pref)
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if parts.size:
            pos = np.searchsorted(parts, pk)
            pos[pos >= parts.size] = 0
            m = parts[pos] == pk
        else:
            m = np.zeros(pk.size, dtype=bool)
        t = batch.filter(pa.array(m))
        q = np.floor(t["l_quantity"].to_numpy(zero_copy_only=False)
                     .astype(np.float64) + 0.5).astype(np.int64)
        p = np.floor(t["l_extendedprice"].to_numpy(zero_copy_only=False)
                     .astype(np.float64) * 100 + 0.5).astype(np.int64)
        return pa.table({"pk": t["l_partkey"].cast(pa.int64()),
                         "q": pa.array(q, pa.int64()),
                         "p_e2": pa.array(p, pa.int64())})

    pruned = lineitem.select_columns(
        ["l_partkey", "l_quantity", "l_extendedprice"]) \
        .map_batches(prune, batch_format="pyarrow").materialize()

    stats = pruned.groupby("pk").aggregate(
        Sum("q", alias_name="sum_q"), Count(alias_name="cnt")).take_all()
    sum_q = {int(r["pk"]): int(r["sum_q"]) for r in stats}
    cnt = {int(r["pk"]): int(r["cnt"]) for r in stats}
    keys = np.asarray(sorted(sum_q), dtype=np.int64)
    sref = ray.put((keys,
                    np.asarray([sum_q[k] for k in keys], dtype=np.int64),
                    np.asarray([cnt[k] for k in keys], dtype=np.int64)))

    def below(batch: pa.Table) -> pa.Table:
        keys, sq, ct = ray.get(sref)
        pk = batch["pk"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(keys, pk)
        q = batch["q"].to_numpy(zero_copy_only=False)
        p = batch["p_e2"].to_numpy(zero_copy_only=False)
        m = 5 * q * ct[pos] < sq[pos]
        return pa.table({"n_p": pa.array([int(m.sum())], pa.int64()),
                         "p_p": pa.array([int(p[m].sum())], pa.int64())})

    n_rows, total = 0, 0
    if keys.size:
        for b in pruned.map_batches(below, batch_format="pyarrow") \
                .iter_batches(batch_format="pyarrow", batch_size=None):
            n_rows += int(pc.sum(b["n_p"]).as_py() or 0)
            total += int(pc.sum(b["p_p"]).as_py() or 0)
    return pa.table({"p_brand": pa.array([brand], pa.string()),
                     "n_lineitems": pa.array([n_rows], pa.int64()),
                     "total_price_e2": pa.array([total], pa.int64())})


def q22_idle_balances(customer: ray.data.Dataset,
                      orders: ray.data.Dataset) -> pa.Table:
    """TPC-H-Q22-shaped anti-join: customers with an account balance
    above the mean POSITIVE balance who have placed NO orders, counted
    per nation.  Exact integer mean predicate (``bal*n > sum``, e2
    fixed point); the anti-join is the q13 tagged union — one custkey
    groupby of narrow rows, order rows only flip a marker.
    -> (c_nationkey, numcust, totacctbal_e2) by nation."""
    from ray.data.aggregate import Count as RCount

    def bal_partial(batch: pa.Table) -> pa.Table:
        bal = np.floor(batch["c_acctbal"].to_numpy(zero_copy_only=False)
                       .astype(np.float64) * 100 + 0.5).astype(np.int64)
        m = bal > 0
        return pa.table({"s_p": pa.array([int(bal[m].sum())], pa.int64()),
                         "n_p": pa.array([int(m.sum())], pa.int64())})

    s_pos, n_pos = 0, 0
    for b in customer.select_columns(["c_acctbal"]) \
            .map_batches(bal_partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        s_pos += int(pc.sum(b["s_p"]).as_py() or 0)
        n_pos += int(pc.sum(b["n_p"]).as_py() or 0)

    def proj_cust(batch: pa.Table) -> pa.Table:
        bal = np.floor(batch["c_acctbal"].to_numpy(zero_copy_only=False)
                       .astype(np.float64) * 100 + 0.5).astype(np.int64)
        keep = bal * n_pos > s_pos
        t = batch.filter(pa.array(keep))
        n = t.num_rows
        return pa.table({"key": t["c_custkey"].cast(pa.int64()),
                         "nat": t["c_nationkey"].cast(pa.int64()),
                         "bal": pa.array(bal[keep], pa.int64()),
                         "has_ord": pa.array(np.zeros(n, np.int64))})

    def proj_orders(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({"key": batch["o_custkey"].cast(pa.int64()),
                         "nat": pa.nulls(n, pa.int64()),
                         "bal": pa.nulls(n, pa.int64()),
                         "has_ord": pa.array(np.ones(n, np.int64))})

    tagged = customer.select_columns(
        ["c_custkey", "c_nationkey", "c_acctbal"]) \
        .map_batches(proj_cust, batch_format="pyarrow") \
        .union(orders.select_columns(["o_custkey"])
               .map_batches(proj_orders, batch_format="pyarrow"))
    per_cust = tagged.groupby("key").aggregate(
        Max("nat", alias_name="nat"), Max("bal", alias_name="bal"),
        Max("has_ord", alias_name="has_ord"))

    def nat_partial(batch: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(batch["nat"]), pc.equal(batch["has_ord"], 0))
        t = batch.filter(m)
        nat = t["nat"].to_numpy(zero_copy_only=False).astype(np.int64)
        bal = t["bal"].to_numpy(zero_copy_only=False).astype(np.int64)
        keys, inv = np.unique(nat, return_inverse=True)
        cnt = np.zeros(keys.size, dtype=np.int64)
        tot = np.zeros(keys.size, dtype=np.int64)
        np.add.at(cnt, inv, 1)
        np.add.at(tot, inv, bal)
        return pa.table({"nat": pa.array(keys, pa.int64()),
                         "c_p": pa.array(cnt, pa.int64()),
                         "b_p": pa.array(tot, pa.int64())})

    acc: dict[int, list[int]] = {}
    for b in per_cust.map_batches(nat_partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        for nat, c, t_ in zip(b["nat"].to_pylist(), b["c_p"].to_pylist(),
                              b["b_p"].to_pylist()):
            a = acc.setdefault(int(nat), [0, 0])
            a[0] += int(c)
            a[1] += int(t_)
    nats = sorted(acc)
    return pa.table({
        "c_nationkey": pa.array(nats, pa.int64()),
        "numcust": pa.array([acc[n][0] for n in nats], pa.int64()),
        "totacctbal_e2": pa.array([acc[n][1] for n in nats], pa.int64()),
    })


def top_metrics(ds: ray.data.Dataset, by: str = "lang",
                sort_col: str = "n_chars",
                metric_cols: tuple[str, ...] = ("doc_id",)) -> pa.Table:
    """ES ``top_metrics`` aggregation: per ``by`` bucket, the metric
    columns from the single row with the LARGEST ``sort_col``
    (deterministic tie-break: smallest first metric column — ES leaves
    ties to shard order; we pin them so every cluster size agrees).

    Per-batch partial keeps one candidate row per bucket (vectorized
    lexsort cut), then a tiny groupby over <=|buckets| rows per batch
    picks the global winner — O(buckets) shuffle, never the table.
    -> (by, sort_col, *metric_cols) sorted by ``by``."""
    cols = [by, sort_col, *metric_cols]
    tie = metric_cols[0]

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select(cols)
        if not t.num_rows:
            return t
        key = t[by].to_numpy(zero_copy_only=False)
        sv = t[sort_col].to_numpy(zero_copy_only=False)
        tv = t[tie].to_numpy(zero_copy_only=False)
        # order: by bucket, sort_col DESC, tie ASC -> first row per bucket
        order = np.lexsort((tv, -sv, key))
        first = np.ones(order.size, dtype=bool)
        first[1:] = key[order][1:] != key[order][:-1]
        return t.take(pa.array(order[first], pa.int64()))

    def pick(group: pa.Table) -> pa.Table:
        sv = group[sort_col].to_numpy(zero_copy_only=False)
        tv = group[tie].to_numpy(zero_copy_only=False)
        best = np.lexsort((tv, -sv))[0]
        return group.take(pa.array([best], pa.int64()))

    out = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(by).map_groups(pick, batch_format="pyarrow") \
        .take_all()
    out.sort(key=lambda r: r[by])

    def _typed(c):
        vals = [r[c] for r in out]
        if vals and isinstance(vals[0], str):
            return pa.array(vals, pa.string())
        return pa.array([int(v) for v in vals], pa.int64())

    return pa.table({c: _typed(c) for c in cols})


def q15_top_supplier(lineitem: ray.data.Dataset, supplier: pa.Table,
                     date_lo: str = "1996-01-01",
                     date_hi: str = "1996-04-01") -> pa.Table:
    """TPC-H-Q15-shaped top supplier: the supplier(s) with the MAXIMUM
    total revenue over a ship-date quarter (ties all kept, like the
    view-based original).  One distributed pass: per-batch partials
    pre-aggregate revenue by ``l_suppkey`` (np.add.at fold), ONE
    groupby over supplier-cardinality narrow rows, and the max-pick +
    name join happen on the per-supplier result — the small side of
    every TPC-H schema (suppliers = docs/10^4; at 10^12 lineitems the
    shuffled rows are still only O(n_suppliers x n_blocks) partials).

    Revenue exact e4 (price e2 x (1-disc) e2, reference Q1/Q5 house
    convention).  -> (s_suppkey, s_name, total_revenue_e4) for the max
    revenue, ordered by s_suppkey."""
    lo = np.datetime64(date_lo).astype("datetime64[D]").astype(np.int64)
    hi = np.datetime64(date_hi).astype("datetime64[D]").astype(np.int64)

    def partial(batch: pa.Table) -> pa.Table:
        day = batch["l_shipdate"].cast(pa.date32()) \
            .to_numpy(zero_copy_only=False).astype("datetime64[D]") \
            .astype(np.int64)
        m = (day >= lo) & (day < hi)
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)[m]
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)[m]
        disc = batch["l_discount"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)[m]
        rev = (np.floor(price * 100 + 0.5).astype(np.int64)
               * np.floor((1.0 - disc) * 100 + 0.5).astype(np.int64))
        keys, inv = np.unique(sk, return_inverse=True)
        tot = np.zeros(keys.size, dtype=np.int64)
        np.add.at(tot, inv, rev)
        return pa.table({"key": pa.array(keys, pa.int64()),
                         "rev": pa.array(tot, pa.int64())})

    per_supp = lineitem.select_columns(
        ["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("key").aggregate(Sum("rev", alias_name="total_revenue_e4"))

    rows = per_supp.take_all()            # supplier-cardinality result
    if not rows:
        return pa.table({"s_suppkey": pa.array([], pa.int64()),
                         "s_name": pa.array([], pa.string()),
                         "total_revenue_e4": pa.array([], pa.int64())})
    best = max(int(r["total_revenue_e4"]) for r in rows)
    names = {int(r["s_suppkey"]): r["s_name"] for r in supplier.to_pylist()}
    top = sorted(int(r["key"]) for r in rows
                 if int(r["total_revenue_e4"]) == best)
    return pa.table({
        "s_suppkey": pa.array(top, pa.int64()),
        "s_name": pa.array([names[k] for k in top], pa.string()),
        "total_revenue_e4": pa.array([best] * len(top), pa.int64()),
    })


def q12_priority_by_flag(lineitem: ray.data.Dataset,
                         orders: ray.data.Dataset,
                         year_lo: int = 1996,
                         year_hi: int = 1997) -> pa.Table:
    """TPC-H-Q12-shaped priority split: for lineitems shipped inside a
    year window, how many belong to HIGH-priority orders (1-URGENT /
    2-HIGH) vs low, per ``l_returnflag`` (standing in for the
    reference's l_shipmode, absent from this corpus).  The Q12 plan
    shape is preserved exactly: the orders->lineitem equi-join is the
    q7/q13 tagged union — orders rows carry an ``is_high`` marker,
    lineitem partials pivot per-flag counts into columns, ONE
    groupby(orderkey) over narrow int64 rows co-groups them, and the
    conditional count is a vectorized post-fold.  Nothing wide ever
    shuffles.  -> (l_returnflag, high_line_count, low_line_count)
    ordered by flag."""
    flags = ["A", "N", "R"]
    cnt_cols = [f"c_{f}" for f in flags]

    def proj_orders(batch: pa.Table) -> pa.Table:
        pri = batch["o_orderpriority"].to_numpy(zero_copy_only=False)
        hi = np.asarray([p.startswith(("1-", "2-")) for p in pri],
                        dtype=np.int64)
        cols = {"key": batch["o_orderkey"].cast(pa.int64()),
                "is_high": pa.array(hi, pa.int64())}
        for c in cnt_cols:
            cols[c] = pa.array(np.zeros(batch.num_rows, np.int64))
        return pa.table(cols)

    def proj_line(batch: pa.Table) -> pa.Table:
        yr = pc.year(batch["l_shipdate"]).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        m = (yr >= year_lo) & (yr <= year_hi)
        t = batch.filter(pa.array(m))
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        fl = t["l_returnflag"].to_numpy(zero_copy_only=False)
        slot = np.full(fl.size, -1, dtype=np.int64)
        for j, f in enumerate(flags):
            slot[fl == f] = j
        keep = slot >= 0
        ok, slot = ok[keep], slot[keep]
        keys, inv = np.unique(ok, return_inverse=True)
        pivot = np.zeros((keys.size, len(flags)), dtype=np.int64)
        np.add.at(pivot, (inv, slot), 1)
        cols = {"key": pa.array(keys, pa.int64()),
                "is_high": pa.nulls(keys.size, pa.int64())}
        for j, c in enumerate(cnt_cols):
            cols[c] = pa.array(pivot[:, j], pa.int64())
        return pa.table(cols)

    tagged = orders.select_columns(["o_orderkey", "o_orderpriority"]) \
        .map_batches(proj_orders, batch_format="pyarrow") \
        .union(lineitem.select_columns(
            ["l_orderkey", "l_shipdate", "l_returnflag"])
            .map_batches(proj_line, batch_format="pyarrow"))
    agg = tagged.groupby("key").aggregate(
        Max("is_high", alias_name="is_high"),
        *[Sum(c, alias_name=c) for c in cnt_cols])

    hi_acc = np.zeros(len(flags), dtype=np.int64)
    lo_acc = np.zeros(len(flags), dtype=np.int64)
    for b in agg.iter_batches(batch_format="pyarrow", batch_size=None):
        ih = b["is_high"].to_numpy(zero_copy_only=False).astype(np.int64)
        for j, c in enumerate(cnt_cols):
            v = b[c].to_numpy(zero_copy_only=False).astype(np.int64)
            hi_acc[j] += int(v[ih == 1].sum())
            lo_acc[j] += int(v[ih == 0].sum())
    nz = (hi_acc + lo_acc) > 0          # SQL GROUP BY emits no empty group
    return pa.table({
        "l_returnflag": pa.array([f for f, k in zip(flags, nz) if k],
                                 pa.string()),
        "high_line_count": pa.array(hi_acc[nz], pa.int64()),
        "low_line_count": pa.array(lo_acc[nz], pa.int64()),
    })


def value_ttest(events: ray.data.Dataset, type_a: str = "purchase",
                type_b: str = "click") -> pa.Table:
    """ES ``t_test`` aggregation (heteroscedastic / Welch): is the mean
    ``value`` of one event type significantly different from another's?
    Returns the full inference row — per-side n / mean, Welch t
    statistic and the Satterthwaite degrees of freedom — as e6
    integers.

    Exact mergeable partials: each batch folds (n, sum, sum_sq) per
    side with values quantized e3 FIRST (int64-safe to ~10^7 rows at
    |value|<=10^3; swap to e2 or per-partition hugeint folds beyond),
    so the distributed sum is order-free; the float t/df math runs once
    on the driver from the exact integer moments, mirrored verbatim by
    the SQL oracle.  One streaming pass, no shuffle at all — the fold
    output is a single 6-int row per batch."""
    cols = ["n_a", "s_a", "q_a", "n_b", "s_b", "q_b"]

    def partial(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        v3 = np.floor(batch["value"].to_numpy(zero_copy_only=False)
                      .astype(np.float64) * 1_000 + 0.5).astype(np.int64)
        out = []
        for t in (type_a, type_b):
            m = et == t
            x = v3[m]
            out += [int(m.sum()), int(x.sum()), int((x * x).sum())]
        return pa.table({c: pa.array([out[i]], pa.int64())
                         for i, c in enumerate(cols)})

    acc = dict.fromkeys(cols, 0)
    for b in events.select_columns(["event_type", "value"]) \
            .map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        for c in cols:
            acc[c] += int(pc.sum(b[c]).as_py() or 0)

    na, sa, qa = acc["n_a"], acc["s_a"], acc["q_a"]
    nb, sb, qb = acc["n_b"], acc["s_b"], acc["q_b"]
    if na < 2 or nb < 2:
        t_e6 = df_e6 = 0
    else:
        # float chain written as cast-to-double-then-divide so the SQL
        # oracle (CAST(x AS DOUBLE) / y) is bit-identical even when the
        # integer moments exceed 2^53
        m1 = float(sa) / float(na)
        m2 = float(sb) / float(nb)
        v1 = float(na * qa - sa * sa) / float(na * (na - 1))
        v2 = float(nb * qb - sb * sb) / float(nb * (nb - 1))
        se1 = v1 / na
        se2 = v2 / nb
        t = (m1 - m2) / np.sqrt(se1 + se2)
        df = ((se1 + se2) * (se1 + se2)
              / (se1 * se1 / (na - 1) + se2 * se2 / (nb - 1)))
        t_e6 = int(np.floor(t * 1_000_000 + 0.5))
        df_e6 = int(np.floor(df * 1_000_000 + 0.5))
    return pa.table({
        "type_a": pa.array([type_a], pa.string()),
        "type_b": pa.array([type_b], pa.string()),
        "n_a": pa.array([na], pa.int64()),
        "n_b": pa.array([nb], pa.int64()),
        "mean_a_e6": pa.array([sa * 1_000 // na if na else 0], pa.int64()),
        "mean_b_e6": pa.array([sb * 1_000 // nb if nb else 0], pa.int64()),
        "t_e6": pa.array([t_e6], pa.int64()),
        "df_e6": pa.array([df_e6], pa.int64()),
    })


# ---------------------------------------------------------------------------
# round 5: the six remaining TPC-H plan shapes (Q2/Q9/Q11/Q16/Q20/Q21),
# adapted to this corpus (no partsupp table: p_retailprice stands in for
# ps_supplycost, lineitem participation for ps_availqty — same house
# convention as q12's returnflag-for-shipmode)
# ---------------------------------------------------------------------------

def _in_sorted(keys: np.ndarray, vals: np.ndarray) -> np.ndarray:
    """Vectorized membership mask: vals[i] in sorted ``keys``."""
    if keys.size == 0:
        return np.zeros(vals.size, dtype=bool)
    pos = np.searchsorted(keys, vals)
    pos[pos >= keys.size] = 0
    return keys[pos] == vals


def _pos_sorted(keys: np.ndarray, vals: np.ndarray) -> np.ndarray:
    """Positions of vals in sorted keys (caller guarantees membership)."""
    return np.searchsorted(keys, vals)


def q2_min_cost_supplier(lineitem: ray.data.Dataset, part: pa.Table,
                         supplier: pa.Table, nation: pa.Table,
                         region: pa.Table, size: int = 15,
                         ptype: str = "STANDARD",
                         region_name: str = "ASIA",
                         k: int = 100) -> pa.Table:
    """TPC-H-Q2-shaped min-cost supplier: for every part of one size and
    type, the region supplier(s) offering the MINIMUM observed unit
    price (min lineitem ``l_extendedprice`` stands in for the absent
    ``ps_supplycost``).  The correlated min subquery becomes the house
    two-level fold: per-batch (part, supplier) min partials -> ONE
    narrow ``groupby([pk, sk]).Min`` -> per-part min pick + dimension
    join on the dimension-sized result.  Both filters are broadcast
    sorted-key masks (part set and region-supplier set), so the
    lineitem stream is pruned before anything shuffles.

    -> (s_acctbal_e2, s_name, n_name, p_partkey, p_name, min_price_e2)
    ordered by (s_acctbal_e2 desc, n_name, s_name, p_partkey), top k —
    the reference's ORDER/LIMIT 100 (ref Program.cs-era Q2 shape)."""
    import ray

    part_rows = part.to_pylist()
    pk_keep = np.asarray(sorted(
        int(r["p_partkey"]) for r in part_rows
        if int(r["p_size"]) == size and r["p_type"] == ptype),
        dtype=np.int64)
    p_name = {int(r["p_partkey"]): r["p_name"] for r in part_rows}

    rk = {int(r["r_regionkey"]) for r in region.to_pylist()
          if r["r_name"] == region_name}
    nat = {int(r["n_nationkey"]): r["n_name"] for r in nation.to_pylist()
           if int(r["n_regionkey"]) in rk}
    srows = [r for r in supplier.to_pylist()
             if int(r["s_nationkey"]) in nat]
    sk_keep = np.asarray(sorted(int(r["s_suppkey"]) for r in srows),
                         dtype=np.int64)
    s_attr = {int(r["s_suppkey"]):
              (int(np.floor(float(r["s_acctbal"]) * 100 + 0.5)),
               r["s_name"], nat[int(r["s_nationkey"])]) for r in srows}
    pref = ray.put((pk_keep, sk_keep))

    def partial(batch: pa.Table) -> pa.Table:
        pks, sks = ray.get(pref)
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        m = _in_sorted(pks, pk) & _in_sorted(sks, sk)
        price = np.floor(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False)
            .astype(np.float64)[m] * 100 + 0.5).astype(np.int64)
        pk, sk = pk[m], sk[m]
        pair = pk * 1_000_000 + sk          # suppkey < 1e6 by schema
        keys, inv = np.unique(pair, return_inverse=True)
        mins = np.full(keys.size, np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(mins, inv, price)
        return pa.table({"pk": pa.array(keys // 1_000_000, pa.int64()),
                         "sk": pa.array(keys % 1_000_000, pa.int64()),
                         "min_p": pa.array(mins, pa.int64())})

    rows = lineitem.select_columns(
        ["l_partkey", "l_suppkey", "l_extendedprice"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["pk", "sk"]) \
        .aggregate(Min("min_p", alias_name="min_price_e2")).take_all()

    best: dict[int, int] = {}
    for r in rows:
        p, v = int(r["pk"]), int(r["min_price_e2"])
        if p not in best or v < best[p]:
            best[p] = v
    out = []
    for r in rows:
        p, s, v = int(r["pk"]), int(r["sk"]), int(r["min_price_e2"])
        if v == best[p]:
            bal, sname, nname = s_attr[s]
            out.append((bal, sname, nname, p, p_name[p], v))
    out.sort(key=lambda t: (-t[0], t[2], t[1], t[3]))
    out = out[:k]
    return pa.table({
        "s_acctbal_e2": pa.array([t[0] for t in out], pa.int64()),
        "s_name": pa.array([t[1] for t in out], pa.string()),
        "n_name": pa.array([t[2] for t in out], pa.string()),
        "p_partkey": pa.array([t[3] for t in out], pa.int64()),
        "p_name": pa.array([t[4] for t in out], pa.string()),
        "min_price_e2": pa.array([t[5] for t in out], pa.int64()),
    })


def q9_product_profit(lineitem: ray.data.Dataset, orders: ray.data.Dataset,
                      part: pa.Table, supplier: pa.Table, nation: pa.Table,
                      name_prefix: str = "red", year_lo: int = 1995,
                      year_hi: int = 2001) -> pa.Table:
    """TPC-H-Q9-shaped product-type profit: per (supplier nation, order
    year), the profit on parts whose name starts with a prefix, where
    ``profit_e4 = price_e2*(100-disc_e2) - qty*retail_e2*100``
    (``p_retailprice`` stands in for the absent ``ps_supplycost``).

    The lineitem-orders join is the q7 pivoted co-group: lineitem
    partials pivot (profit, count) into one column pair per nation
    slot keyed by orderkey; orders rows carry the order YEAR; ONE
    ``groupby(orderkey)`` folds both sides, and a second tiny groupby
    rolls (year, nation) up.  Part prices and supplier->nation are
    broadcast sorted-key lookups.  Groups with zero contributing
    lineitems are dropped (count pivot), matching SQL GROUP BY.

    -> (n_name, o_year, profit_e4) ordered by (n_name asc, o_year
    desc)."""
    import ray

    pk_rows = [(int(r["p_partkey"]),
                int(np.floor(float(r["p_retailprice"]) * 100 + 0.5)))
               for r in part.to_pylist()
               if r["p_name"].startswith(name_prefix)]
    pk_rows.sort()
    pks = np.asarray([p for p, _ in pk_rows], dtype=np.int64)
    retail = np.asarray([c for _, c in pk_rows], dtype=np.int64)

    nk_sorted = sorted(int(r["n_nationkey"]) for r in nation.to_pylist())
    slot_of = {nk: i for i, nk in enumerate(nk_sorted)}
    names = {r["n_name"]: slot_of[int(r["n_nationkey"])]
             for r in nation.to_pylist()}
    n_slots = len(nk_sorted)
    supp_slot = np.full(
        int(max(r["s_suppkey"] for r in supplier.to_pylist())) + 1, -1,
        dtype=np.int64)
    for r in supplier.to_pylist():
        supp_slot[int(r["s_suppkey"])] = slot_of[int(r["s_nationkey"])]
    bref = ray.put((pks, retail, supp_slot))

    prof_cols = [f"prof_{i}" for i in range(n_slots)]
    cnt_cols = [f"cnt_{i}" for i in range(n_slots)]

    def proj_orders(batch: pa.Table) -> pa.Table:
        okey = batch["o_orderkey"].cast(pa.int64())
        yr = pc.year(batch["o_orderdate"]).cast(pa.int64())
        n = batch.num_rows
        cols = {"key": okey, "o_year": yr}
        zero = pa.array(np.zeros(n, np.int64), pa.int64())
        for c in prof_cols + cnt_cols:
            cols[c] = zero
        return pa.table(cols)

    def proj_line(batch: pa.Table) -> pa.Table:
        pks, retail, slot = ray.get(bref)
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        m = _in_sorted(pks, pk) & (sk < slot.size)
        okey = batch["l_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)[m]
        ss = slot[sk[m]]
        price = np.floor(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False)
            .astype(np.float64)[m] * 100 + 0.5).astype(np.int64)
        disc2 = np.floor(
            (1.0 - batch["l_discount"].to_numpy(zero_copy_only=False)
             .astype(np.float64)[m]) * 100 + 0.5).astype(np.int64)
        qty = np.floor(
            batch["l_quantity"].to_numpy(zero_copy_only=False)
            .astype(np.float64)[m] + 0.5).astype(np.int64)
        profit = price * disc2 - qty * retail[_pos_sorted(pks, pk[m])] * 100
        keys, inv = np.unique(okey, return_inverse=True)
        pv = np.zeros((keys.size, n_slots), dtype=np.int64)
        cv = np.zeros((keys.size, n_slots), dtype=np.int64)
        np.add.at(pv, (inv, ss), profit)
        np.add.at(cv, (inv, ss), 1)
        cols = {"key": pa.array(keys, pa.int64()),
                "o_year": pa.nulls(keys.size, pa.int64())}
        for i, c in enumerate(prof_cols):
            cols[c] = pa.array(pv[:, i], pa.int64())
        for i, c in enumerate(cnt_cols):
            cols[c] = pa.array(cv[:, i], pa.int64())
        return pa.table(cols)

    folded = orders.select_columns(["o_orderkey", "o_orderdate"]) \
        .map_batches(proj_orders, batch_format="pyarrow") \
        .union(lineitem.select_columns(
            ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
             "l_extendedprice", "l_discount"])
            .map_batches(proj_line, batch_format="pyarrow")) \
        .groupby("key") \
        .aggregate(Max("o_year", alias_name="yr"),
                   *[Sum(c, alias_name=c) for c in prof_cols],
                   *[Sum(c, alias_name=c) for c in cnt_cols])

    def rollup(batch: pa.Table) -> pa.Table:
        yr = batch["yr"].to_numpy(zero_copy_only=False)
        ok = ~np.isnan(yr.astype(np.float64))
        yr = yr[ok].astype(np.int64)
        out_y, out_s, out_p, out_c = [], [], [], []
        for i in range(n_slots):
            pv = batch[prof_cols[i]].to_numpy(zero_copy_only=False)[ok]
            cv = batch[cnt_cols[i]].to_numpy(zero_copy_only=False)[ok]
            nz = cv > 0
            ys, inv = np.unique(yr[nz], return_inverse=True)
            ps = np.zeros(ys.size, dtype=np.int64)
            cs = np.zeros(ys.size, dtype=np.int64)
            np.add.at(ps, inv, pv[nz])
            np.add.at(cs, inv, cv[nz])
            out_y += ys.tolist()
            out_s += [i] * ys.size
            out_p += ps.tolist()
            out_c += cs.tolist()
        return pa.table({"o_year": pa.array(out_y, pa.int64()),
                         "slot": pa.array(out_s, pa.int64()),
                         "p_p": pa.array(out_p, pa.int64()),
                         "c_p": pa.array(out_c, pa.int64())})

    rows = folded.map_batches(rollup, batch_format="pyarrow") \
        .groupby(["o_year", "slot"]) \
        .aggregate(Sum("p_p", alias_name="profit_e4"),
                   Sum("c_p", alias_name="cnt")).take_all()
    agg = {(int(r["slot"]), int(r["o_year"])): int(r["profit_e4"])
           for r in rows if int(r["cnt"]) > 0
           and year_lo <= int(r["o_year"]) <= year_hi}
    slot_name = sorted(names.items())           # n_name asc
    out_n, out_y, out_p = [], [], []
    for nname, slot in slot_name:
        yrs = sorted((y for s, y in agg if s == slot), reverse=True)
        for y in yrs:
            out_n.append(nname)
            out_y.append(y)
            out_p.append(agg[(slot, y)])
    return pa.table({"n_name": pa.array(out_n, pa.string()),
                     "o_year": pa.array(out_y, pa.int64()),
                     "profit_e4": pa.array(out_p, pa.int64())})


def q11_important_parts(lineitem: ray.data.Dataset, supplier: pa.Table,
                        nation: pa.Table, nation_name: str = "NATION_1",
                        frac_num: int = 1, frac_den: int = 500
                        ) -> pa.Table:
    """TPC-H-Q11-shaped important stock: parts whose traded value from
    one nation's suppliers exceeds ``frac_num/frac_den`` of the
    nation's total (lineitem revenue e4 stands in for the absent
    ``ps_supplycost*ps_availqty``).  The HAVING > scalar-subquery shape
    survives exactly: per-batch per-part partials -> ONE narrow
    ``groupby(pk).Sum`` (part-cardinality) -> the global total and the
    strict integer threshold ``value*den > total*num`` on the driver —
    no float division anywhere.

    -> (p_partkey, value_e4) ordered by (value_e4 desc, p_partkey)."""
    import ray

    nk = {int(r["n_nationkey"]) for r in nation.to_pylist()
          if r["n_name"] == nation_name}
    sk_keep = np.asarray(sorted(
        int(r["s_suppkey"]) for r in supplier.to_pylist()
        if int(r["s_nationkey"]) in nk), dtype=np.int64)
    sref = ray.put(sk_keep)

    def partial(batch: pa.Table) -> pa.Table:
        sks = ray.get(sref)
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        m = _in_sorted(sks, sk)
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)[m]
        price = np.floor(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False)
            .astype(np.float64)[m] * 100 + 0.5).astype(np.int64)
        disc2 = np.floor(
            (1.0 - batch["l_discount"].to_numpy(zero_copy_only=False)
             .astype(np.float64)[m]) * 100 + 0.5).astype(np.int64)
        val = price * disc2
        keys, inv = np.unique(pk, return_inverse=True)
        tot = np.zeros(keys.size, dtype=np.int64)
        np.add.at(tot, inv, val)
        return pa.table({"pk": pa.array(keys, pa.int64()),
                         "v": pa.array(tot, pa.int64())})

    rows = lineitem.select_columns(
        ["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("pk").aggregate(Sum("v", alias_name="value_e4")) \
        .take_all()
    total = sum(int(r["value_e4"]) for r in rows)
    keep = sorted(((int(r["value_e4"]), int(r["pk"])) for r in rows
                   if int(r["value_e4"]) * frac_den > total * frac_num),
                  key=lambda t: (-t[0], t[1]))
    return pa.table({
        "p_partkey": pa.array([p for _, p in keep], pa.int64()),
        "value_e4": pa.array([v for v, _ in keep], pa.int64()),
    })


def q16_supplier_part_counts(lineitem: ray.data.Dataset, part: pa.Table,
                             supplier: pa.Table,
                             excl_brand: str = "Brand#1",
                             excl_type: str = "PROMO",
                             sizes: tuple = (1, 5, 10, 15, 20, 25, 30, 35)
                             ) -> pa.Table:
    """TPC-H-Q16-shaped supplier/part relationship: distinct suppliers
    per (brand, type, size) over the filtered part families, excluding
    "complaint" suppliers (``s_acctbal < 0`` stands in for the
    reference's comment-pattern NOT IN subquery).  Distinctness is the
    two-level narrow fold: per-batch unique (family, supplier) codes ->
    ``groupby([bts, sk])`` dedups globally -> per-batch family partials
    -> one tiny ``groupby(bts)`` counts.  Nothing wider than two int64
    columns ever shuffles.

    -> (p_brand, p_type, p_size, supplier_cnt) ordered by
    (supplier_cnt desc, p_brand, p_type, p_size)."""
    import ray

    size_set = set(int(s) for s in sizes)
    fam: dict[tuple, int] = {}
    fam_of_pk: dict[int, int] = {}
    for r in part.to_pylist():
        key = (r["p_brand"], r["p_type"], int(r["p_size"]))
        if (r["p_brand"] == excl_brand or r["p_type"] == excl_type
                or key[2] not in size_set):
            continue
        fam_of_pk[int(r["p_partkey"])] = fam.setdefault(key, len(fam))
    fams = [k for k, _ in sorted(fam.items(), key=lambda kv: kv[1])]
    pks = np.asarray(sorted(fam_of_pk), dtype=np.int64)
    fam_arr = np.asarray([fam_of_pk[p] for p in pks], dtype=np.int64)
    bad_sk = np.asarray(sorted(
        int(r["s_suppkey"]) for r in supplier.to_pylist()
        if float(r["s_acctbal"]) < 0), dtype=np.int64)
    bref = ray.put((pks, fam_arr, bad_sk))

    def partial(batch: pa.Table) -> pa.Table:
        pks, fam_arr, bad = ray.get(bref)
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        m = _in_sorted(pks, pk) & ~_in_sorted(bad, sk)
        bts = fam_arr[_pos_sorted(pks, pk[m])]
        pair = np.unique(bts * 1_000_000 + sk[m])
        return pa.table({"bts": pa.array(pair // 1_000_000, pa.int64()),
                         "sk": pa.array(pair % 1_000_000, pa.int64())})

    distinct = lineitem.select_columns(["l_partkey", "l_suppkey"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["bts", "sk"]).aggregate(Count(alias_name="_c"))

    def fold(batch: pa.Table) -> pa.Table:
        bts = batch["bts"].to_numpy(zero_copy_only=False)
        keys, counts = np.unique(bts, return_counts=True)
        return pa.table({"bts": pa.array(keys, pa.int64()),
                         "c": pa.array(counts, pa.int64())})

    rows = distinct.map_batches(fold, batch_format="pyarrow") \
        .groupby("bts").aggregate(Sum("c", alias_name="supplier_cnt")) \
        .take_all()
    out = sorted(((int(r["supplier_cnt"]),) + fams[int(r["bts"])]
                  for r in rows), key=lambda t: (-t[0], t[1], t[2], t[3]))
    return pa.table({
        "p_brand": pa.array([t[1] for t in out], pa.string()),
        "p_type": pa.array([t[2] for t in out], pa.string()),
        "p_size": pa.array([t[3] for t in out], pa.int64()),
        "supplier_cnt": pa.array([t[0] for t in out], pa.int64()),
    })


def q20_promotion_suppliers(lineitem: ray.data.Dataset, part: pa.Table,
                            supplier: pa.Table, nation: pa.Table,
                            name_prefix: str = "red", year: int = 1996,
                            nation_name: str = "NATION_1") -> pa.Table:
    """TPC-H-Q20-shaped promotion candidates: suppliers in one nation
    who, for SOME part with a given name prefix, shipped strictly more
    than that part's per-supplier average quantity in the year (the
    above-average correlated comparison stands in for the absent
    ``ps_availqty > 0.5 * sum(l_quantity)``).  Q20's nested-subquery
    shape becomes the q17 two-pass: per-(part, supplier) qty fold
    (ONE narrow groupby), per-part totals + supplier counts derived
    from it, then the exact integer qualifier ``qty * n_supp >
    total_qty`` — no float average.

    -> (s_suppkey, s_name) ordered by s_name."""
    import ray

    pks = np.asarray(sorted(
        int(r["p_partkey"]) for r in part.to_pylist()
        if r["p_name"].startswith(name_prefix)), dtype=np.int64)
    pref = ray.put(pks)

    def partial(batch: pa.Table) -> pa.Table:
        pks = ray.get(pref)
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        yr = pc.year(batch["l_shipdate"]).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        m = _in_sorted(pks, pk) & (yr == year)
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)[m]
        qty = np.floor(batch["l_quantity"].to_numpy(zero_copy_only=False)
                       .astype(np.float64)[m] + 0.5).astype(np.int64)
        pair = pk[m] * 1_000_000 + sk
        keys, inv = np.unique(pair, return_inverse=True)
        tot = np.zeros(keys.size, dtype=np.int64)
        np.add.at(tot, inv, qty)
        return pa.table({"pk": pa.array(keys // 1_000_000, pa.int64()),
                         "sk": pa.array(keys % 1_000_000, pa.int64()),
                         "q": pa.array(tot, pa.int64())})

    pairs = lineitem.select_columns(
        ["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["pk", "sk"]).aggregate(Sum("q", alias_name="qty")) \
        .take_all()

    tot_q: dict[int, int] = {}
    n_sup: dict[int, int] = {}
    for r in pairs:
        p = int(r["pk"])
        tot_q[p] = tot_q.get(p, 0) + int(r["qty"])
        n_sup[p] = n_sup.get(p, 0) + 1
    nk = {int(r["n_nationkey"]) for r in nation.to_pylist()
          if r["n_name"] == nation_name}
    s_name = {int(r["s_suppkey"]): r["s_name"]
              for r in supplier.to_pylist()
              if int(r["s_nationkey"]) in nk}
    qual = sorted({int(r["sk"]) for r in pairs
                   if int(r["sk"]) in s_name
                   and int(r["qty"]) * n_sup[int(r["pk"])]
                   > tot_q[int(r["pk"])]})
    qual.sort(key=lambda s: (s_name[s], s))
    return pa.table({
        "s_suppkey": pa.array(qual, pa.int64()),
        "s_name": pa.array([s_name[s] for s in qual], pa.string()),
    })


def q21_waiting_suppliers(lineitem: ray.data.Dataset,
                          orders: ray.data.Dataset, supplier: pa.Table,
                          nation: pa.Table,
                          nation_name: str = "NATION_1",
                          late_days: int = 90, k: int = 100) -> pa.Table:
    """TPC-H-Q21-shaped waiting suppliers: for finalized ('F') orders,
    count per supplier the orders where that supplier was the ONLY late
    one among >= 2 distinct suppliers (``l_shipdate > o_orderdate +
    late_days`` stands in for the absent receipt-vs-commit lateness).
    The EXISTS / NOT-EXISTS pair becomes one tagged-union co-group on
    orderkey (orders rows carry the order date; lineitem rows carry
    (supplier, ship day)), with the per-order verdict fully vectorized
    inside each group task; the survivor stream is supplier-cardinality
    narrow rows.

    -> (s_suppkey, s_name, numwait) ordered by (numwait desc, s_name),
    top k — the reference's ORDER BY/LIMIT 100."""
    day_us = 86_400_000_000

    def proj_orders(batch: pa.Table) -> pa.Table:
        st = batch["o_orderstatus"].to_numpy(zero_copy_only=False)
        m = st == "F"
        t = batch.filter(pa.array(m))
        oday = t["o_orderdate"].cast(pa.int64()) \
            .to_numpy(zero_copy_only=False) // day_us
        return pa.table({
            "key": t["o_orderkey"].cast(pa.int64()),
            "sk": pa.array(np.full(t.num_rows, -1, np.int64), pa.int64()),
            "day": pa.array(oday, pa.int64())})

    def proj_line(batch: pa.Table) -> pa.Table:
        shipday = batch["l_shipdate"].cast(pa.int64()) \
            .to_numpy(zero_copy_only=False) // day_us
        return pa.table({
            "key": batch["l_orderkey"].cast(pa.int64()),
            "sk": batch["l_suppkey"].cast(pa.int64()),
            "day": pa.array(shipday, pa.int64())})

    tagged = orders.select_columns(
        ["o_orderkey", "o_orderstatus", "o_orderdate"]) \
        .map_batches(proj_orders, batch_format="pyarrow") \
        .union(lineitem.select_columns(
            ["l_orderkey", "l_suppkey", "l_shipdate"])
            .map_batches(proj_line, batch_format="pyarrow"))

    def per_order(g: pa.Table) -> pa.Table:
        sk = g["sk"].to_numpy(zero_copy_only=False)
        day = g["day"].to_numpy(zero_copy_only=False)
        om = sk == -1
        if not om.any():                      # non-'F' order: no row
            return pa.table({"sk": pa.array([], pa.int64())})
        oday = int(day[om][0])
        lsk, lday = sk[~om], day[~om]
        supps = np.unique(lsk)
        if supps.size < 2:
            return pa.table({"sk": pa.array([], pa.int64())})
        late = np.unique(lsk[lday > oday + late_days])
        if late.size != 1:
            return pa.table({"sk": pa.array([], pa.int64())})
        return pa.table({"sk": pa.array(late, pa.int64())})

    counted = tagged.groupby("key") \
        .map_groups(per_order, batch_format="pyarrow") \
        .groupby("sk").aggregate(Count(alias_name="numwait")).take_all()

    nk = {int(r["n_nationkey"]) for r in nation.to_pylist()
          if r["n_name"] == nation_name}
    s_name = {int(r["s_suppkey"]): r["s_name"]
              for r in supplier.to_pylist()
              if int(r["s_nationkey"]) in nk}
    out = sorted(((int(r["numwait"]), s_name[int(r["sk"])], int(r["sk"]))
                  for r in counted if int(r["sk"]) in s_name),
                 key=lambda t: (-t[0], t[1], t[2]))[:k]
    return pa.table({
        "s_suppkey": pa.array([t[2] for t in out], pa.int64()),
        "s_name": pa.array([t[1] for t in out], pa.string()),
        "numwait": pa.array([t[0] for t in out], pa.int64()),
    })


def filters_agg_report(ds: ray.data.Dataset) -> pa.Table:
    """ES ``filters`` aggregation with ``other_bucket``: NAMED filter
    buckets evaluated independently over the event stream (a doc can
    land in several — unlike ``terms``, buckets may overlap) plus the
    ``_other_`` bucket for docs matching none.  Buckets here: clicks
    (event_type='click'), big (value > 100), weekend (Sat/Sun).

    One vectorized mask pass per batch folds counts + e6 value sums
    into a fixed four-row partial; the shuffle moves 4 rows per batch.
    -> (bucket, n_events, sum_value_e6) by bucket."""
    from ray.data.aggregate import Sum as RSum

    names = ["big", "clicks", "weekend", "_other_"]

    def partial(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        v = batch["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        t = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        # 1970-01-01 was a Thursday; with Monday=0 indexing,
        # dow = (epoch_day + 3) % 7 and Sat/Sun are 5/6
        dow = ((t // 86_400_000_000) + 3) % 7
        v_e6 = np.floor(v * 1_000_000 + 0.5).astype(np.int64)
        masks = {
            "clicks": et == "click",
            "big": v > 100.0,
            "weekend": (dow == 5) | (dow == 6),
        }
        masks["_other_"] = ~(masks["clicks"] | masks["big"]
                             | masks["weekend"])
        return pa.table({
            "bucket": pa.array(names, pa.string()),
            "n_p": pa.array([int(masks[n].sum()) for n in names],
                            pa.int64()),
            "s_p": pa.array([int(v_e6[masks[n]].sum()) for n in names],
                            pa.int64()),
        })

    out = ds.select_columns(["event_type", "value", "ts"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("bucket") \
        .aggregate(RSum("n_p", alias_name="n_events"),
                   RSum("s_p", alias_name="sum_value_e6")) \
        .sort("bucket").take_all()
    return pa.table({
        "bucket": pa.array([r["bucket"] for r in out], pa.string()),
        "n_events": pa.array([int(r["n_events"]) for r in out], pa.int64()),
        "sum_value_e6": pa.array([int(r["sum_value_e6"]) for r in out],
                                 pa.int64()),
    })


def revenue_stats_bucket(orders: ray.data.Dataset) -> pa.Table:
    """ES ``stats_bucket`` + ``max_bucket`` pipeline aggregations over
    the monthly-revenue date histogram: min/max/sum/avg of the bucket
    metric across buckets, plus WHICH bucket holds the max (earliest
    month on ties — ES reports all keys, we pin the deterministic
    first).  The histogram is the existing distributed fold
    (:func:`monthly_revenue`); the pipeline stage is an O(n_buckets)
    driver pass, exactly like ES computes sibling aggs on the
    coordinating node.  -> one row."""
    rows = sorted((int(r["epoch_month"]), int(r["revenue_e2"]))
                  for r in monthly_revenue(orders).take_all())
    revs = [r for _, r in rows]
    n = len(rows)
    mx = max(revs)
    max_month = next(m for m, r in rows if r == mx)
    return pa.table({
        "n_buckets": pa.array([n], pa.int64()),
        "min_rev_e2": pa.array([min(revs)], pa.int64()),
        "max_rev_e2": pa.array([mx], pa.int64()),
        "sum_rev_e2": pa.array([sum(revs)], pa.int64()),
        "avg_rev_e2": pa.array([sum(revs) // n], pa.int64()),
        "max_epoch_month": pa.array([max_month], pa.int64()),
    })


def dp_noisy_counts(ds: ray.data.Dataset, epsilon: float = 1.0
                    ) -> pa.Table:
    """Differential-privacy-SHAPED histogram release (demo of the
    mechanism, not a privacy claim — the true counts ride along for
    the oracle check): per event_type, count + Laplace(1/epsilon)
    noise drawn DETERMINISTICALLY from the type's md5 hash via the
    inverse CDF — u = (md5 >> 1)/2^63, v = u - 1/2, noise =
    -(1/eps)*sign(v)*ln(1 - 2|v|) — so the release is reproducible
    and exactly SQL-checkable (same float expression on both sides).
    A production release would use a fresh secret seed per epoch;
    the pipeline shape (tiny per-type fold + constant-time noise) is
    identical.  -> (event_type, n_true, noise_e6, n_noisy_e6)."""
    from ray.data.aggregate import Count

    from onestools_eventlog_ray.functions.fasthash import md5_lower64

    rows = sorted((str(r["event_type"]), int(r["count()"]))
                  for r in ds.groupby("event_type")
                             .aggregate(Count()).take_all())
    types = [t for t, _ in rows]
    n = np.array([c for _, c in rows], dtype=np.float64)
    salted = pa.array([f"dp:{t}" for t in types], pa.string())
    h = (md5_lower64(salted) >> np.uint64(1)).astype(np.float64)
    u = h / 9223372036854775808.0
    v = u - 0.5
    b = 1.0 / float(epsilon)
    noise = -b * np.sign(v) * np.log(1.0 - 2.0 * np.abs(v))
    return pa.table({
        "event_type": pa.array(types, pa.string()),
        "n_true": pa.array(n.astype(np.int64), pa.int64()),
        "noise_e6": pa.array(np.floor(noise * 1_000_000 + 0.5)
                             .astype(np.int64), pa.int64()),
        "n_noisy_e6": pa.array(np.floor((n + noise) * 1_000_000 + 0.5)
                               .astype(np.int64), pa.int64()),
    })


def scripted_metric_variance(ds: ray.data.Dataset) -> pa.Table:
    """ES ``scripted_metric`` aggregation — the map / combine / reduce
    contract — instantiated with the canonical script: exact population
    VARIANCE of ``value`` per ``event_type``.

    Faithful to the ES phase model AND integer-exact: the map script
    runs per batch (per shard in ES) and folds ``value`` into fixed-size
    integer partials; ``combine`` is the per-type groupby over those
    partials; ``reduce`` runs on the coordinating node (driver) over a
    handful of rows with arbitrary-precision Python ints.  The int64
    overflow trap in sum-of-squares (v_e6^2 reaches 1e18) is dodged by
    the split representation v_e6 = a*2^20 + b, accumulating
    (sum a^2, sum a*b, sum b^2) — each int64-safe per batch — and
    recombining exactly in the reduce: sum v6^2 = Sa2*2^40 + 2*Sab*2^20
    + Sb2.  var_e6 = (n*sum(v6^2) - sum(v6)^2) // (n^2 * 1e6) exactly as
    the HUGEINT SQL oracle computes it.
    -> (event_type, n_events, mean_e6, var_e6) ordered by event_type."""

    def map_script(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        v = batch["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        v6 = np.floor(v * 1_000_000 + 0.5).astype(np.int64)
        a, b = v6 >> 20, v6 & ((1 << 20) - 1)
        out = {"event_type": [], "n_p": [], "s_p": [],
               "a2_p": [], "ab_p": [], "b2_p": []}
        for t in np.unique(et):
            m = et == t
            out["event_type"].append(str(t))
            out["n_p"].append(int(m.sum()))
            out["s_p"].append(int(v6[m].sum()))
            out["a2_p"].append(int((a[m] * a[m]).sum()))
            out["ab_p"].append(int((a[m] * b[m]).sum()))
            out["b2_p"].append(int((b[m] * b[m]).sum()))
        return pa.table({k: pa.array(vv, pa.string() if k == "event_type"
                                     else pa.int64())
                         for k, vv in out.items()})

    def reduce_script(group: pa.Table) -> pa.Table:
        n = sum(group["n_p"].to_pylist())
        s = sum(group["s_p"].to_pylist())
        sq = (sum(group["a2_p"].to_pylist()) * (1 << 40)
              + 2 * sum(group["ab_p"].to_pylist()) * (1 << 20)
              + sum(group["b2_p"].to_pylist()))
        return pa.table({
            "event_type": pa.array([group["event_type"][0].as_py()],
                                   pa.string()),
            "n_events": pa.array([n], pa.int64()),
            "mean_e6": pa.array([s // n], pa.int64()),
            "var_e6": pa.array([(n * sq - s * s)
                                // (n * n * 1_000_000)], pa.int64()),
        })

    out = (ds.select_columns(["event_type", "value"])
           .map_batches(map_script, batch_format="pyarrow")
           .groupby("event_type")
           .map_groups(reduce_script, batch_format="pyarrow")
           .take_all())
    rows = sorted(out, key=lambda r: r["event_type"])
    return pa.table({
        "event_type": pa.array([r["event_type"] for r in rows]),
        "n_events": pa.array([r["n_events"] for r in rows], pa.int64()),
        "mean_e6": pa.array([r["mean_e6"] for r in rows], pa.int64()),
        "var_e6": pa.array([r["var_e6"] for r in rows], pa.int64()),
    })


def frequent_item_sets(events: ray.data.Dataset,
                       support_frac_e6: int = 100_000,
                       max_items_per_basket: int = 64) -> pa.Table:
    """ES 8.4 ``frequent_item_sets`` aggregation: itemsets of size 1-3
    over (user, day) baskets of event types, with relative support
    ``>= ceil(support_frac_e6/1e6 * n_baskets)`` — a distributed
    Apriori.

    Scale shape: ONE shuffle total.  Baskets are co-grouped once
    (groupby basket id -> distinct items per basket) and MATERIALIZED
    (one short row per basket); the three Apriori levels are then
    broadcast-pruned streaming counts over that cached table:
    F1 = frequent items (type-table fold), F2 = pairs restricted to F1
    (vectorized triu per basket), F3 = triples whose three sub-pairs
    all sit in the broadcast F2 adjacency matrix (downward closure —
    the pruning that makes level 3 affordable).  Baskets are capped at
    ``max_items_per_basket`` items (same degenerate-group treatment as
    the LSH buckets); the cap is a no-op here (items = event types).

    -> (set_size, item_a, item_b, item_c, support), NULL-padded,
    sorted by (set_size, item_a, item_b, item_c)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    US_DAY = 86_400_000_000

    def to_basket_rows(batch: pa.Table) -> pa.Table:
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        bid = uid.astype(np.int64) * 1_000_000 + us // US_DAY
        return pa.table({"bid": pa.array(bid, pa.int64()),
                         "item": batch["event_type"]})

    def per_basket(group: pa.Table) -> pa.Table:
        items = sorted(set(group["item"].to_pylist()))[
            :max_items_per_basket]
        return pa.table({
            "bid": pa.array([int(group["bid"][0].as_py())], pa.int64()),
            "items": pa.array([items], pa.list_(pa.string()))})

    baskets = (events.select_columns(["ts", "user_id", "event_type"])
               .map_batches(to_basket_rows, batch_format="pyarrow")
               .groupby("bid")
               .map_groups(per_basket, batch_format="pyarrow")
               .materialize())
    n_baskets = baskets.count()
    thr = -(-support_frac_e6 * n_baskets // 1_000_000)  # ceil

    def count_items(batch: pa.Table) -> pa.Table:
        flat = batch["items"].combine_chunks().flatten()
        g = pa.table({"item": flat}).group_by("item") \
            .aggregate([([], "count_all")])
        return pa.table({"item": g["item"],
                         "n_p": g["count_all"].cast(pa.int64())})

    f1_rows = (baskets.map_batches(count_items, batch_format="pyarrow")
               .groupby("item").aggregate(Sum("n_p", alias_name="n"))
               .take_all())
    f1 = {r["item"]: int(r["n"]) for r in f1_rows if int(r["n"]) >= thr}
    vocab = sorted(f1)                       # broadcast: tiny type table
    code = {t: i for i, t in enumerate(vocab)}

    def codes_per_basket(batch):
        """list<string> items -> list of sorted F1 code arrays."""
        out = []
        for lst in batch["items"].to_pylist():
            cs = sorted(code[t] for t in lst if t in code)
            out.append(np.asarray(cs, dtype=np.int64))
        return out

    def count_pairs(batch: pa.Table) -> pa.Table:
        da, db = [], []
        for g in codes_per_basket(batch):
            if g.size > 1:
                iu, ju = np.triu_indices(g.size, 1)
                da.append(g[iu])
                db.append(g[ju])
        if not da:
            return pa.schema([("a", pa.int64()), ("b", pa.int64()),
                              ("n_p", pa.int64())]).empty_table()
        t = pa.table({"a": pa.array(np.concatenate(da), pa.int64()),
                      "b": pa.array(np.concatenate(db), pa.int64())})
        g2 = t.group_by(["a", "b"]).aggregate([([], "count_all")])
        return pa.table({"a": g2["a"], "b": g2["b"],
                         "n_p": g2["count_all"].cast(pa.int64())})

    f2_rows = (baskets.map_batches(count_pairs, batch_format="pyarrow")
               .groupby(["a", "b"]).aggregate(Sum("n_p", alias_name="n"))
               .take_all())
    f2 = {(int(r["a"]), int(r["b"])): int(r["n"])
          for r in f2_rows if int(r["n"]) >= thr}
    V = len(vocab)
    adj = np.zeros((V, V), dtype=bool)
    for (a, b) in f2:
        adj[a, b] = True

    def count_triples(batch: pa.Table) -> pa.Table:
        ta, tb, tc = [], [], []
        for g in codes_per_basket(batch):
            m = g.size
            if m < 3:
                continue
            for i in range(m - 2):          # baskets are cap-bounded
                for j in range(i + 1, m - 1):
                    if not adj[g[i], g[j]]:
                        continue            # downward-closure prune
                    for l in range(j + 1, m):
                        if adj[g[i], g[l]] and adj[g[j], g[l]]:
                            ta.append(g[i])
                            tb.append(g[j])
                            tc.append(g[l])
        if not ta:
            return pa.schema([("a", pa.int64()), ("b", pa.int64()),
                              ("c", pa.int64()),
                              ("n_p", pa.int64())]).empty_table()
        t = pa.table({"a": pa.array(ta, pa.int64()),
                      "b": pa.array(tb, pa.int64()),
                      "c": pa.array(tc, pa.int64())})
        g3 = t.group_by(["a", "b", "c"]).aggregate([([], "count_all")])
        return pa.table({"a": g3["a"], "b": g3["b"], "c": g3["c"],
                         "n_p": g3["count_all"].cast(pa.int64())})

    f3_rows = (baskets.map_batches(count_triples, batch_format="pyarrow")
               .groupby(["a", "b", "c"])
               .aggregate(Sum("n_p", alias_name="n"))
               .take_all())
    f3 = {(int(r["a"]), int(r["b"]), int(r["c"])): int(r["n"])
          for r in f3_rows if int(r["n"]) >= thr}

    rows = []
    for t, n in f1.items():
        rows.append((1, t, None, None, n))
    for (a, b), n in f2.items():
        rows.append((2, vocab[a], vocab[b], None, n))
    for (a, b, c), n in f3.items():
        rows.append((3, vocab[a], vocab[b], vocab[c], n))
    rows.sort(key=lambda r: (r[0], r[1], r[2] or "", r[3] or ""))
    return pa.table({
        "set_size": pa.array([r[0] for r in rows], pa.int64()),
        "item_a": pa.array([r[1] for r in rows], pa.string()),
        "item_b": pa.array([r[2] for r in rows], pa.string()),
        "item_c": pa.array([r[3] for r in rows], pa.string()),
        "support": pa.array([r[4] for r in rows], pa.int64()),
    })
