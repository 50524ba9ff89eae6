"""Mergeable sketches as distributed aggregates — HyperLogLog
count-distinct over the term stream.

The canonical "pre-aggregate inside map_batches, tiny groupby of
partials" shape at its purest: a sketch is a SMALL mergeable state
(here 2^b max-registers), so each batch folds its rows into a partial
sketch locally and the shuffle moves only (bucket, rho) rows — never
terms.  At 100 TB the exchange for a corpus-wide distinct-term count is
O(2^b x n_batches) rows regardless of data size.

md5-based and EXACTLY oracle-checkable (the registers, not just the
estimate): bucket = md5_64(term) & (m-1); rho = 1 + count-trailing-
zeros(h >> b) (55 if the suffix is zero) — both reproduced in SQL with
``w & -w`` + exact ``log2`` of a power of two.  Estimation error is the
standard ~1.04/sqrt(m); the driver check compares the deterministic
register table, the pytest checks the estimate against the exact count.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data
from ray.data.aggregate import Max

from onestools_eventlog_ray.functions.analyzer import tokenize_array
from onestools_eventlog_ray.functions.fasthash import md5_lower64
from onestools_eventlog_ray.sources.corpus import CorpusSpec, DOCUMENTS_SPEC


def _registers_of(hashes: np.ndarray, b: int) -> tuple[np.ndarray, np.ndarray]:
    """uint64 hashes -> (bucket, rho) per value, vectorized."""
    m = np.uint64((1 << b) - 1)
    bucket = (hashes & m).astype(np.int64)
    w = hashes >> np.uint64(b)
    lsb = (w & (~w + np.uint64(1))).astype(np.float64)     # w & -w
    rho = np.where(w == 0, np.int64(64 - b + 1),
                   1 + np.log2(np.maximum(lsb, 1.0)).astype(np.int64))
    return bucket, rho.astype(np.int64)


def hll_term_registers(ds: ray.data.Dataset,
                       spec: CorpusSpec = DOCUMENTS_SPEC,
                       b: int = 10) -> ray.data.Dataset:
    """Distinct-term HLL registers: -> (bucket, max_rho), only buckets
    that received at least one term (sparse).  Per batch: hash the
    UNIQUE terms (dictionary encode + md5 kernel), local max per
    bucket; global merge is a 2^b-row groupby of partials."""

    def partial(batch: pa.Table) -> pa.Table:
        from onestools_eventlog_ray.functions.runtime import pin_worker_threads
        pin_worker_threads()
        toks = tokenize_array(batch[spec.content_col])
        flat = toks.flatten()
        if len(flat) == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "rho_p": pa.array([], pa.int64())})
        uniq = flat.dictionary_encode().dictionary
        h = md5_lower64(uniq)
        bucket, rho = _registers_of(h, b)
        regs = np.zeros(1 << b, dtype=np.int64)
        np.maximum.at(regs, bucket, rho)
        nz = np.flatnonzero(regs)
        return pa.table({"bucket": pa.array(nz, pa.int64()),
                         "rho_p": pa.array(regs[nz], pa.int64())})

    return ds.map_batches(partial, batch_format="pyarrow") \
             .groupby("bucket").aggregate(Max("rho_p", alias_name="max_rho"))


def hll_users_by_type(events: ray.data.Dataset, b: int = 8
                      ) -> ray.data.Dataset:
    """GROUPED HyperLogLog — distinct-user registers PER event type
    (the per-key count-distinct a funnel dashboard asks for at a scale
    where exact ``groupby(type).agg(count_distinct)`` would shuffle
    every (type, user) pair).  Same register math as
    ``hll_term_registers`` keyed by (event_type, bucket): each batch
    folds its rows into one partial register set per type it saw, so
    the shuffle moves at most ``n_types x 2^b`` rows per batch — never
    user ids.  Hash = md5_64(CAST(user_id AS VARCHAR)), so the register
    table is deterministic and oracle-exact; ``hll_estimate`` over one
    type's rows gives the usual ~1.04/sqrt(m) estimate (pytest checks
    it against the exact distinct count from ``distinct_users_by_type``
    semantics).  -> (event_type, bucket, max_rho) sparse."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        from onestools_eventlog_ray.functions.runtime import \
            pin_worker_threads
        pin_worker_threads()
        if batch.num_rows == 0:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "bucket": pa.array([], pa.int64()),
                             "rho_p": pa.array([], pa.int64())})
        h = md5_lower64(pc.cast(batch["user_id"], pa.string()))
        bucket, rho = _registers_of(h, b)
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        types, codes = np.unique(et, return_inverse=True)
        m = 1 << b
        # one dense (n_types x m) max fold — types are bounded (enum)
        regs = np.zeros(types.size * m, dtype=np.int64)
        np.maximum.at(regs, codes * m + bucket, rho)
        nz = np.flatnonzero(regs)
        return pa.table({
            "event_type": pa.array(types[nz // m], pa.string()),
            "bucket": pa.array(nz % m, pa.int64()),
            "rho_p": pa.array(regs[nz], pa.int64()),
        })

    return events.map_batches(partial, batch_format="pyarrow") \
        .groupby(["event_type", "bucket"]) \
        .aggregate(Max("rho_p", alias_name="max_rho"))


def hll_estimate(registers: dict[int, int] | pa.Table, b: int = 10) -> float:
    """Standard HLL estimate (with the small-range linear-counting
    correction) from a (bucket -> max_rho) register table."""
    m = 1 << b
    regs = np.zeros(m, dtype=np.int64)
    if isinstance(registers, pa.Table):
        regs[registers["bucket"].to_numpy(zero_copy_only=False)] = \
            registers["max_rho"].to_numpy(zero_copy_only=False)
    else:
        for k, v in registers.items():
            regs[k] = v
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)            # linear counting
    return float(est)


def cm_term_registers(ds: ray.data.Dataset,
                      spec: CorpusSpec = DOCUMENTS_SPEC,
                      depth: int = 4, width: int = 1024
                      ) -> ray.data.Dataset:
    """Count-Min sketch of the TERM FREQUENCY stream (heavy-hitter /
    point-frequency queries at any scale): depth x width counters,
    row i counter ``md5_64("cm{i}:" + term) % width`` summed over every
    token occurrence.

    Same mergeable-sketch shape as HLL: each batch folds its whole
    token stream into a local (depth x width) partial with one
    ``np.add.at`` per row over the batch's UNIQUE terms, and the
    shuffle moves only nonzero (row_id, col_id, n) entries — at most
    depth*width per batch, regardless of batch size.  Registers are
    md5-deterministic, so the full counter table is exactly
    SQL-checkable; ``cm_estimate`` answers point queries (min over
    rows, the standard CM upper-bound estimate)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        from onestools_eventlog_ray.functions.runtime import \
            pin_worker_threads
        pin_worker_threads()
        from onestools_eventlog_ray.stages.normalize import add_doc_id
        b = add_doc_id(batch, spec)
        toks = tokenize_array(b["content"])
        flat = toks.flatten()
        rows_out = {"row_id": [], "col_id": [], "n": []}
        if len(flat):
            d = flat.dictionary_encode()
            idx = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            tf = np.bincount(idx, minlength=len(d.dictionary)).astype(np.int64)
            uniq = d.dictionary
            import pyarrow.compute as pc
            for i in range(depth):
                salted = pc.binary_join_element_wise(
                    pa.array([f"cm{i}:"] * len(uniq), pa.string()),
                    uniq.cast(pa.string()), "")
                col = (md5_lower64(salted) % np.uint64(width)).astype(np.int64)
                counters = np.zeros(width, dtype=np.int64)
                np.add.at(counters, col, tf)
                nz = np.flatnonzero(counters)
                rows_out["row_id"].extend([i] * nz.size)
                rows_out["col_id"].extend(nz.tolist())
                rows_out["n"].extend(counters[nz].tolist())
        return pa.table({
            "row_id": pa.array(rows_out["row_id"], pa.int64()),
            "col_id": pa.array(rows_out["col_id"], pa.int64()),
            "n": pa.array(rows_out["n"], pa.int64()),
        })

    return ds.map_batches(partial, batch_format="pyarrow") \
             .groupby(["row_id", "col_id"]) \
             .aggregate(Sum("n", alias_name="n"))


def bloom_term_bits(ds: ray.data.Dataset,
                    spec: CorpusSpec = DOCUMENTS_SPEC,
                    m: int = 16384, k: int = 4) -> ray.data.Dataset:
    """Bloom-filter membership sketch of the corpus's distinct-term set:
    ``k`` md5 hash functions over ``m`` bits, returned as the sorted set
    of SET bit indices -> (bit_idx,).

    Third member of the mergeable-sketch family (HLL = distinct count,
    CM = frequency, Bloom = membership): each batch folds its unique
    terms into a local bit set (<= m rows regardless of batch size), and
    the merge is a bit-set union — a groupby over at most m keys.  Two
    corpora's sketches OR together, so a 100 TB run unions per-shard
    sketches without touching terms again.  Registers are
    md5-deterministic: bit ``i`` of term t = md5_64("bf{i}:" + t) % m,
    exactly reproducible in SQL."""
    from ray.data.aggregate import Count

    def partial(batch: pa.Table) -> pa.Table:
        from onestools_eventlog_ray.functions.runtime import pin_worker_threads
        pin_worker_threads()
        import pyarrow.compute as pc
        toks = tokenize_array(batch[spec.content_col])
        flat = toks.flatten()
        if not len(flat):
            return pa.table({"bit_idx": pa.array([], pa.int64())})
        uniq = flat.dictionary_encode().dictionary
        bits = []
        for i in range(k):
            salted = pc.binary_join_element_wise(
                pa.array([f"bf{i}:"] * len(uniq), pa.string()),
                uniq.cast(pa.string()), "")
            bits.append((md5_lower64(salted) % np.uint64(m)).astype(np.int64))
        out = np.unique(np.concatenate(bits))
        return pa.table({"bit_idx": pa.array(out, pa.int64())})

    return ds.map_batches(partial, batch_format="pyarrow") \
             .groupby("bit_idx").aggregate(Count(alias_name="_n")) \
             .select_columns(["bit_idx"])


def bloom_might_contain(bits: pa.Table | np.ndarray, term: str,
                        m: int = 16384, k: int = 4) -> bool:
    """Standard Bloom membership probe: True iff ALL k bits of ``term``
    are set (no false negatives; false-positive rate ~(1-e^{-kn/m})^k)."""
    from onestools_eventlog_ray.functions.fasthash import md5_lower64_one
    if isinstance(bits, pa.Table):
        bits = bits["bit_idx"].to_numpy(zero_copy_only=False)
    bitset = np.zeros(m, dtype=bool)
    bitset[np.asarray(bits, dtype=np.int64)] = True
    return all(bitset[md5_lower64_one(f"bf{i}:{term}") % m]
               for i in range(k))


def cm_estimate(registers: pa.Table, term: str, depth: int = 4,
                width: int = 1024) -> int:
    """Point-frequency upper bound for one term: min over rows of its
    counter (the standard CM query)."""
    from onestools_eventlog_ray.functions.fasthash import md5_lower64_one
    rows = registers["row_id"].to_numpy(zero_copy_only=False)
    cols = registers["col_id"].to_numpy(zero_copy_only=False)
    ns = registers["n"].to_numpy(zero_copy_only=False)
    est = None
    for i in range(depth):
        c = md5_lower64_one(f"cm{i}:{term}") % width
        hit = ns[(rows == i) & (cols == c)]
        v = int(hit[0]) if hit.size else 0
        est = v if est is None else min(est, v)
    return int(est or 0)


def cm_error_report(ds: ray.data.Dataset,
                    spec: CorpusSpec = DOCUMENTS_SPEC,
                    depth: int = 4, width: int = 1024,
                    k: int = 10) -> pa.Table:
    """Sketch calibration (the Count-Min sibling of the MinHash
    confusion report): for the top-``k`` terms by exact cf, the CM
    point estimate next to the truth and the overcount — the
    depth/width adequacy check before trusting the sketch at stream
    scale (CM never undercounts, so ``overcount >= 0`` by
    construction and the report proves it).

    Both halves are distributed folds (registers + term_stats); the
    comparison runs on k rows.  -> (term, cf_exact, cf_est, overcount)
    by (cf_exact desc, term asc)."""
    from onestools_eventlog_ray.pipelines.text import term_stats

    registers = pa.Table.from_pylist(
        cm_term_registers(ds, spec, depth=depth, width=width).take_all())
    stats = term_stats(ds, spec).take_all()
    ranked = sorted(((-int(r["cf"]), str(r["term"])) for r in stats))[:k]
    out = {"term": [], "cf_exact": [], "cf_est": [], "overcount": []}
    for ncf, t in ranked:
        est = cm_estimate(registers, t, depth=depth, width=width)
        out["term"].append(t)
        out["cf_exact"].append(-ncf)
        out["cf_est"].append(est)
        out["overcount"].append(est + ncf)
    return pa.table({
        "term": pa.array(out["term"], pa.string()),
        "cf_exact": pa.array(out["cf_exact"], pa.int64()),
        "cf_est": pa.array(out["cf_est"], pa.int64()),
        "overcount": pa.array(out["overcount"], pa.int64()),
    })


def _hdr_bucket(v1: np.ndarray) -> np.ndarray:
    """HDR-histogram bucket id for positive int64 values: identity below
    8, then 8 log2 sub-buckets per octave — ALL integer except the
    power-of-2-exact ``floor(log2)`` (IEEE log2 of 2^k is exactly k, so
    the floor can never mis-bucket; every other step is bit math the
    SQL oracle mirrors verbatim)."""
    v1 = np.asarray(v1, dtype=np.int64)
    m = np.zeros(v1.size, dtype=np.int64)
    big = v1 >= 8
    m[big] = np.floor(np.log2(v1[big])).astype(np.int64)
    out = v1.copy()
    shift = m[big] - 3
    out[big] = 8 * shift + (v1[big] >> shift)
    return out


def _hdr_lower(bk: np.ndarray) -> np.ndarray:
    """Inverse: bucket id -> lower bound of its value range (v1 space)."""
    bk = np.asarray(bk, dtype=np.int64)
    out = bk.copy()
    big = bk >= 8
    m = bk[big] // 8 + 2                     # b in [8(m-2), 8(m-2)+7]
    sub = bk[big] % 8 + 8
    out[big] = sub << (m - 3)
    return out


def hdr_value_sketch(events: ray.data.Dataset,
                     col: str = "value") -> pa.Table:
    """Mergeable HDR-histogram sketch of a float column (e3-quantized):
    THE scale path for percentiles — exact percentiles of 10^12 rows
    need a full sort (all-to-all over everything); this is one
    partial-count pass folding into <=~230 bucket registers per block,
    merged by integer addition, with a guaranteed <=1/8 relative error
    from the 8-per-octave sub-bucketing.  Same mergeable-register
    shape as the HLL/CM sketches above.  -> (bucket, n) bucket asc."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        v1 = np.floor(batch[col].to_numpy(zero_copy_only=False)
                      .astype(np.float64) * 1_000 + 0.5).astype(np.int64) + 1
        bk, cnt = np.unique(_hdr_bucket(v1), return_counts=True)
        return pa.table({"bucket": pa.array(bk, pa.int64()),
                         "n_p": pa.array(cnt.astype(np.int64), pa.int64())})

    folded = events.select_columns([col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("bucket").aggregate(Sum("n_p", alias_name="n")) \
        .sort("bucket").take_all()
    return pa.table({
        "bucket": pa.array([int(r["bucket"]) for r in folded], pa.int64()),
        "n": pa.array([int(r["n"]) for r in folded], pa.int64()),
    })


def hdr_quantiles(events: ray.data.Dataset, col: str = "value",
                  qs: tuple[int, ...] = (50, 90, 95, 99)) -> pa.Table:
    """Quantile estimates from the HDR sketch: for each q, the lower
    bound (e3 units) of the first bucket whose cumulative count reaches
    ``ceil(q * n / 100)`` — deterministic integers end to end.
    -> (q, rank, bucket, est_e3)."""
    sk = hdr_value_sketch(events, col)
    bk = sk["bucket"].to_numpy(zero_copy_only=False)
    n = sk["n"].to_numpy(zero_copy_only=False)
    cum = np.cumsum(n)
    total = int(cum[-1]) if cum.size else 0
    rows = {"q": [], "rank": [], "bucket": [], "est_e3": []}
    for q in qs:
        rank = (q * total + 99) // 100
        i = int(np.searchsorted(cum, rank))
        b = int(bk[i]) if i < bk.size else int(bk[-1])
        rows["q"].append(q)
        rows["rank"].append(rank)
        rows["bucket"].append(b)
        rows["est_e3"].append(int(_hdr_lower(np.asarray([b]))[0]) - 1)
    return pa.table({k: pa.array(v, pa.int64()) for k, v in rows.items()})


def hdr_quantile_error(events: ray.data.Dataset,
                       col: str = "value",
                       qs: tuple[int, ...] = (50, 90, 95, 99)) -> pa.Table:
    """Calibration gate for the HDR sketch (house rule: every estimator
    ships with its measured adequacy): sketch estimate vs the EXACT
    quantile (from a value-cardinality-bounded (v_e3, count) fold —
    calibration-only, the sketch itself never needs it), with the
    relative error as e6.  The 8-sub-bucket design bound is 1/8; the
    report shows the measured error per q.
    -> (q, est_e3, exact_e3, rel_err_e6)."""
    from ray.data.aggregate import Sum

    est = hdr_quantiles(events, col, qs)

    def partial(batch: pa.Table) -> pa.Table:
        v = np.floor(batch[col].to_numpy(zero_copy_only=False)
                     .astype(np.float64) * 1_000 + 0.5).astype(np.int64)
        uv, cnt = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(uv, pa.int64()),
                         "c_p": pa.array(cnt.astype(np.int64), pa.int64())})

    folded = events.select_columns([col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("v").aggregate(Sum("c_p", alias_name="c")) \
        .sort("v").take_all()
    vals = np.asarray([int(r["v"]) for r in folded], dtype=np.int64)
    cum = np.cumsum(np.asarray([int(r["c"]) for r in folded],
                               dtype=np.int64))
    total = int(cum[-1]) if cum.size else 0
    rows = {"q": [], "est_e3": [], "exact_e3": [], "rel_err_e6": []}
    for q, e3 in zip(est["q"].to_pylist(), est["est_e3"].to_pylist()):
        rank = (q * total + 99) // 100
        i = int(np.searchsorted(cum, rank))
        exact = int(vals[i]) if i < vals.size else int(vals[-1])
        err = abs(e3 - exact) * 1_000_000 // exact if exact else 0
        rows["q"].append(q)
        rows["est_e3"].append(e3)
        rows["exact_e3"].append(exact)
        rows["rel_err_e6"].append(err)
    return pa.table({k: pa.array(v, pa.int64()) for k, v in rows.items()})


def hdr_percentile_ranks(events: ray.data.Dataset,
                         values: tuple[float, ...] = (50.0, 100.0, 200.0),
                         col: str = "value") -> pa.Table:
    """ES ``percentile_ranks`` on the HDR sketch (the inverse of
    :func:`hdr_quantiles`): for each probe value, the estimated share
    of rows with value <= probe — counted as every bucket strictly
    below the probe's bucket plus the probe's own bucket (<=1/8
    relative value error by construction, same integer math as the
    forward direction).  -> (probe_e3, bucket, n_le, rank_pct_e6)."""
    sk = hdr_value_sketch(events, col)
    bk = sk["bucket"].to_numpy(zero_copy_only=False)
    n = sk["n"].to_numpy(zero_copy_only=False)
    cum = np.cumsum(n)
    total = int(cum[-1]) if cum.size else 0
    probes_e3 = [int(np.floor(v * 1_000 + 0.5)) for v in values]
    pb = _hdr_bucket(np.asarray(probes_e3, dtype=np.int64) + 1)
    rows = {"probe_e3": [], "bucket": [], "n_le": [], "rank_pct_e6": []}
    for p3, b in zip(probes_e3, pb.tolist()):
        i = int(np.searchsorted(bk, b, side="right"))
        n_le = int(cum[i - 1]) if i else 0
        rows["probe_e3"].append(p3)
        rows["bucket"].append(int(b))
        rows["n_le"].append(n_le)
        rows["rank_pct_e6"].append(n_le * 1_000_000 // total
                                   if total else 0)
    return pa.table({k: pa.array(v, pa.int64()) for k, v in rows.items()})


def mg_heavy_hitters(ds: ray.data.Dataset,
                     spec: CorpusSpec = DOCUMENTS_SPEC,
                     n_partitions: int = 8, n_counters: int = 32,
                     top: int = 10) -> pa.Table:
    """Misra-Gries heavy hitters as a mergeable summary (Agarwal et al.,
    "Mergeable Summaries", PODS'12): each of ``n_partitions``
    deterministic partitions (``doc_id % P`` — batch-layout-independent,
    unlike per-block summaries) compresses its EXACT term counts to at
    most ``n_counters`` counters by subtracting the (k+1)-th largest
    count ``d_p`` from every counter and dropping the non-positives.
    Merging is counter addition, so ``est(t) = sum_p max(c_pt - d_p, 0)``
    and every true count is bracketed by ``est <= true <= est +
    sum_p d_p`` — the shipped ``err_bound``, checked row-by-row in the
    output like the other estimators in this module (``within``).

    100-TB shape: one (p, term, count) groupby over per-batch partials
    (the A3 pattern), per-partition compression inside ``map_groups``
    (each group is one partition's term histogram), and only the
    <= P * (k+1) surviving counters + the exact counts of the reported
    top terms reach the driver.

    -> (term, est_n, err_bound, true_n, within) ordered by
    (est_n desc, term asc), top ``top``."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum as RSum
    from onestools_eventlog_ray.functions.analyzer import doc_term_table
    from onestools_eventlog_ray.stages.normalize import add_doc_id

    def partial(batch: pa.Table) -> pa.Table:
        b = add_doc_id(batch, spec)
        triples, _ = doc_term_table(b["doc_id"], b["content"])
        p = pa.array(triples["doc_id"].to_numpy(zero_copy_only=False)
                     % n_partitions, pa.int64())
        t = pa.table({"p": p, "term": triples["term"],
                      "tf": triples["tf"]})
        return t.group_by(["p", "term"]).aggregate([("tf", "sum")]) \
            .rename_columns(["p", "term", "c_p"])

    counts = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["p", "term"]) \
        .aggregate(RSum("c_p", alias_name="c")).materialize()

    def compress(g: pa.Table) -> pa.Table:
        c = g["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        terms = g["term"].to_numpy(zero_copy_only=False)
        order = np.lexsort((terms, -c))
        d = int(c[order[n_counters]]) if c.size > n_counters else 0
        est = c - d
        keep = est > 0
        n = int(keep.sum())
        return pa.table({
            "term": pa.array(terms[keep]),
            "est_p": pa.array(est[keep], pa.int64()),
            "d_p": pa.array(np.full(n, d, np.int64), pa.int64()),
            "is_head": pa.array(
                np.arange(n) == 0, pa.bool_()),   # one d row per part
        })

    summary = counts.groupby("p") \
        .map_groups(compress, batch_format="pyarrow").take_all()
    bound = sum(int(r["d_p"]) for r in summary if r["is_head"])
    est: dict[str, int] = {}
    for r in summary:
        est[r["term"]] = est.get(r["term"], 0) + int(r["est_p"])
    heads = sorted(est.items(), key=lambda kv: (-kv[1], kv[0]))[:top]
    head_terms = sorted(t for t, _ in heads)

    def true_partial(batch: pa.Table) -> pa.Table:
        m = pc.is_in(batch["term"],
                     value_set=pa.array(head_terms, pa.string()))
        t = batch.filter(m)
        return pa.table({"term": t["term"], "c": t["c"]})

    true_rows = counts.map_batches(true_partial, batch_format="pyarrow") \
        .groupby("term").aggregate(RSum("c", alias_name="true_n")) \
        .take_all()
    true_n = {r["term"]: int(r["true_n"]) for r in true_rows}
    return pa.table({
        "term": pa.array([t for t, _ in heads], pa.string()),
        "est_n": pa.array([e for _, e in heads], pa.int64()),
        "err_bound": pa.array([bound] * len(heads), pa.int64()),
        "true_n": pa.array([true_n[t] for t, _ in heads], pa.int64()),
        "within": pa.array(
            [1 if e <= true_n[t] <= e + bound else 0
             for t, e in heads], pa.int64()),
    })


# ---------------------------------------------------------------------------
# KMV / theta sketches — distinct counting with set operations
# ---------------------------------------------------------------------------

_HASH_SPACE = 1 << 63        # exclusive upper bound of the 63-bit hash space
# exact-path theta: 2^63 - 1 fits int64, and |S| * 2^63 // (2^63 - 1)
# == |S| for any realistic |S| — the estimator degrades to exact
_THETA_EXACT = (1 << 63) - 1


def _cell_hashes(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(event_type, 63-bit md5 hash of the activity cell) per row.
    Cell = user_id * 24 + hour(ts) — one distinct value per (user, hour
    of day); the universe a KMV sketch counts here."""
    import pyarrow.compute as pc
    hour = pc.hour(batch["ts"]).cast(pa.int64())
    cell = pc.add(pc.multiply(batch["user_id"], 24), hour)
    h = (md5_lower64(pc.cast(cell, pa.string())) >> np.uint64(1)) \
        .astype(np.int64)
    return batch["event_type"].to_numpy(zero_copy_only=False), h


def _kmv_fold(hashes: np.ndarray, k: int) -> tuple[int, np.ndarray]:
    """(theta, retained set) of the KMV(k) sketch over DISTINCT hashes:
    theta = k-th smallest (1-indexed) when estimating, else the full
    hash space; retained = values strictly below theta."""
    u = np.unique(hashes)
    if u.size < k:
        return _THETA_EXACT, u
    theta = int(u[k - 1])
    return theta, u[:k - 1]


def kmv_distinct_cells(events: ray.data.Dataset, k: int = 256
                       ) -> pa.Table:
    """KMV (k-minimum-values / bottom-k theta) distinct-count sketch per
    event type over the (user, hour-of-day) activity cells, WITH its
    error gate — the mergeable distinct counter whose sketches also
    support set operations (see :func:`theta_intersection_report`).

    Estimator (Bar-Yossef et al. 2002 / Beyer et al. 2007): keep the k
    smallest distinct 63-bit hashes; ``est = |S| * 2^63 // theta`` where
    ``theta`` = the k-th smallest and ``S`` = values strictly below it
    (the formula degrades to the EXACT count when the universe is
    smaller than k, because theta becomes the full hash space).

    100-TB shape: each batch emits at most k rows per type it saw (its
    local k-min of distinct hashes) — the mergeable partial; one tiny
    ``groupby(event_type)`` folds partials (merge = k-min of the
    union).  The exact count used by the gate is a calibration-time
    distinct fold over the same narrow (type, hash) rows — convention
    shared with ``cm_error_report`` / ``hdr_quantile_error``.

    Gate: ``(est - exact)^2 * (k - 2) <= 9 * exact^2`` — the
    3-standard-deviation band of the KMV relative error 1/sqrt(k-2),
    in exact integer math.

    -> (event_type, k, n_exact, theta, est, within) by event_type.

    (The mergeable per-batch k-min partial path is
    :func:`kmv_sketch_of`; a test asserts folding those partials yields
    the same (theta, S) as the direct k-min this report computes.)"""

    def finalize(g: pa.Table) -> pa.Table:
        t = g["event_type"][0].as_py()
        hashes = g["h"].to_numpy(zero_copy_only=False)
        theta, kept = _kmv_fold(hashes, k)
        n_exact = int(np.unique(hashes).size)
        est = int(kept.size) * _HASH_SPACE // theta
        within = 1 if (est - n_exact) ** 2 * (k - 2) <= 9 * n_exact ** 2 \
            else 0
        return pa.table({
            "event_type": pa.array([t], pa.string()),
            "k": pa.array([k], pa.int64()),
            "n_exact": pa.array([n_exact], pa.int64()),
            "theta": pa.array([theta], pa.int64()),
            "est": pa.array([est], pa.int64()),
            "within": pa.array([within], pa.int64()),
        })

    # exact gate needs the true distinct set, so the fold consumes the
    # UNCAPPED distinct rows (calibration convention); the capped
    # partial above is the pure-sketch path exercised by tests
    def full_rows(batch: pa.Table) -> pa.Table:
        from onestools_eventlog_ray.functions.runtime import \
            pin_worker_threads
        pin_worker_threads()
        if batch.num_rows == 0:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "h": pa.array([], pa.int64())})
        et, h = _cell_hashes(batch)
        keys = pa.table({"event_type": pa.array(et, pa.string()),
                         "h": pa.array(h, pa.int64())})
        import pyarrow.compute as pc
        return keys.group_by(["event_type", "h"]).aggregate([]) \
            if keys.num_rows else keys

    rows = events.map_batches(full_rows, batch_format="pyarrow")
    out = rows.groupby("event_type").map_groups(
        finalize, batch_format="pyarrow").to_pandas()
    out = out.sort_values("event_type").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def kmv_sketch_of(events: ray.data.Dataset, event_type: str, k: int
                  ) -> tuple[int, np.ndarray]:
    """Driver-side KMV(k) sketch of one event type's activity cells:
    fold the per-batch k-min partials (<= k rows each) — the mergeable
    path, no full distinct set materializes."""

    def partial(batch: pa.Table) -> pa.Table:
        from onestools_eventlog_ray.functions.runtime import \
            pin_worker_threads
        pin_worker_threads()
        import pyarrow.compute as pc
        b = batch.filter(pc.equal(batch["event_type"], event_type))
        if b.num_rows == 0:
            return pa.table({"h": pa.array([], pa.int64())})
        _, h = _cell_hashes(b)
        return pa.table({"h": pa.array(np.unique(h)[:k], pa.int64())})

    parts = events.map_batches(partial, batch_format="pyarrow").take_all()
    hashes = np.array([r["h"] for r in parts], dtype=np.int64)
    return _kmv_fold(hashes, k)


def theta_intersection_report(events: ray.data.Dataset, type_a: str,
                              type_b: str, k: int = 64) -> pa.Table:
    """Theta-sketch SET OPERATIONS (union / intersection a-la Apache
    DataSketches): estimate |A ∩ B| and |A ∪ B| of two event types'
    distinct activity-cell sets from their KMV(k) sketches alone, gated
    against the exact counts.

    * union:        theta_u = min(theta_a, theta_b);
                    S_u = {h ∈ S_a ∪ S_b : h < theta_u};
                    est = |S_u| * 2^63 // theta_u
    * intersection: same theta_u; S_i = S_a ∩ S_b below theta_u.

    Exact sets never ship: sketches fold from per-batch k-min partials;
    the exact gate counts come from one narrow (hash -> seen-in-a /
    seen-in-b flag) groupby.  Error gates use the union-scaled
    3-sigma band ``(est - exact)^2 * (k - 2) <= 9 * exact_union^2``
    (theta intersection error scales with the UNION size).

    -> one row (k, exact_a, exact_b, exact_intersection, exact_union,
    est_a, est_b, est_intersection, est_union, jaccard_exact_e6,
    jaccard_est_e6, within_intersection, within_union)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Max as RMax

    theta_a, sa = kmv_sketch_of(events, type_a, k)
    theta_b, sb = kmv_sketch_of(events, type_b, k)
    theta_u = min(theta_a, theta_b)
    s_a = sa[sa < theta_u]
    s_b = sb[sb < theta_u]
    s_i = np.intersect1d(s_a, s_b, assume_unique=True)
    s_u = np.union1d(s_a, s_b)
    est_a = int(sa.size) * _HASH_SPACE // theta_a
    est_b = int(sb.size) * _HASH_SPACE // theta_b
    est_i = int(s_i.size) * _HASH_SPACE // theta_u
    est_u = int(s_u.size) * _HASH_SPACE // theta_u

    def flags(batch: pa.Table) -> pa.Table:
        from onestools_eventlog_ray.functions.runtime import \
            pin_worker_threads
        pin_worker_threads()
        b = batch.filter(pc.is_in(batch["event_type"],
                                  pa.array([type_a, type_b])))
        if b.num_rows == 0:
            return pa.table({"h": pa.array([], pa.int64()),
                             "in_a": pa.array([], pa.int64()),
                             "in_b": pa.array([], pa.int64())})
        et, h = _cell_hashes(b)
        t = pa.table({
            "h": pa.array(h, pa.int64()),
            "in_a": pa.array((et == type_a).astype(np.int64), pa.int64()),
            "in_b": pa.array((et == type_b).astype(np.int64), pa.int64()),
        })
        g = t.group_by("h").aggregate([("in_a", "max"), ("in_b", "max")])
        return g.select(["h", "in_a_max", "in_b_max"]) \
            .rename_columns(["h", "in_a", "in_b"])

    folded = events.map_batches(flags, batch_format="pyarrow") \
        .groupby("h").aggregate(RMax("in_a", alias_name="a"),
                                RMax("in_b", alias_name="b"))

    def tally(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        return pa.table({
            "na": pa.array([int(a.sum())], pa.int64()),
            "nb": pa.array([int(b.sum())], pa.int64()),
            "ni": pa.array([int((a & b).sum())], pa.int64()),
            "nu": pa.array([batch.num_rows], pa.int64()),
        })

    tt = folded.map_batches(tally, batch_format="pyarrow").to_pandas()
    exact_a, exact_b = int(tt["na"].sum()), int(tt["nb"].sum())
    exact_i, exact_u = int(tt["ni"].sum()), int(tt["nu"].sum())

    def gate(est: int, exact: int) -> int:
        return 1 if (est - exact) ** 2 * (k - 2) <= 9 * exact_u ** 2 else 0

    jx = exact_i * 1_000_000 // exact_u if exact_u else 0
    je = est_i * 1_000_000 // est_u if est_u else 0
    return pa.table({
        "k": pa.array([k], pa.int64()),
        "exact_a": pa.array([exact_a], pa.int64()),
        "exact_b": pa.array([exact_b], pa.int64()),
        "exact_intersection": pa.array([exact_i], pa.int64()),
        "exact_union": pa.array([exact_u], pa.int64()),
        "est_a": pa.array([est_a], pa.int64()),
        "est_b": pa.array([est_b], pa.int64()),
        "est_intersection": pa.array([est_i], pa.int64()),
        "est_union": pa.array([est_u], pa.int64()),
        "jaccard_exact_e6": pa.array([jx], pa.int64()),
        "jaccard_est_e6": pa.array([je], pa.int64()),
        "within_intersection": pa.array([gate(est_i, exact_i)], pa.int64()),
        "within_union": pa.array([gate(est_u, exact_u)], pa.int64()),
    })


def ams_f2_report(ds: ray.data.Dataset,
                  spec: CorpusSpec = DOCUMENTS_SPEC,
                  n_rows: int = 9) -> pa.Table:
    """AMS (Alon-Matias-Szegedy) F2 sketch — the second frequency
    moment of the term stream, the classic join-size / skew estimator
    (self-join size of the postings on term): ``n_rows`` independent
    ±1 four-wise-ish hashes s_i(t) = 1 - 2*bit1(md5("ams{i}:" + t)),
    each row keeps the single counter Z_i = sum_t s_i(t)*cf(t); each
    X_i = Z_i^2 is an unbiased F2 estimate with Var <= 2*F2^2, so the
    row-mean has relative std <= sqrt(2/n_rows).

    Linear sketch => perfectly mergeable: each batch folds its token
    stream into ``n_rows`` integers (one np.add.at over unique terms),
    the shuffle moves n_rows rows per batch, the driver sees n_rows
    totals — O(1) state at any corpus size.  Signs are md5-determined
    and counts exact integers, so Z_i is integer-exact and the whole
    report (including the exact-F2 comparison, a vocab-bounded fold
    over term_stats) is SQL-reproducible bit for bit.

    -> one row: (n_rows, est_f2 = mean of X_i via integer floor-div,
    med_f2 = lower median of X_i, f2_exact, mean_rel_err_e6,
    med_rel_err_e6, within_gate) — the error gate every estimator in
    this module ships."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from onestools_eventlog_ray.pipelines.text import term_stats

    R = int(n_rows)

    def partial(batch: pa.Table) -> pa.Table:
        from onestools_eventlog_ray.functions.runtime import \
            pin_worker_threads
        pin_worker_threads()
        from onestools_eventlog_ray.stages.normalize import add_doc_id
        b = add_doc_id(batch, spec)
        toks = tokenize_array(b["content"])
        flat = toks.flatten()
        zs = np.zeros(R, dtype=np.int64)
        if len(flat):
            d = flat.dictionary_encode()
            idx = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            tf = np.bincount(idx, minlength=len(d.dictionary)).astype(np.int64)
            uniq = d.dictionary
            for i in range(R):
                salted = pc.binary_join_element_wise(
                    pa.array([f"ams{i}:"] * len(uniq), pa.string()),
                    uniq.cast(pa.string()), "")
                bit = ((md5_lower64(salted) >> np.uint64(1))
                       & np.uint64(1)).astype(np.int64)
                sgn = 1 - 2 * bit
                zs[i] = int((sgn * tf).sum())
        return pa.table({"row_id": pa.array(np.arange(R), pa.int64()),
                         "z_p": pa.array(zs, pa.int64())})

    folded = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("row_id").aggregate(Sum("z_p", alias_name="z")).take_all()
    xs = sorted(int(r["z"]) ** 2 for r in folded)
    est = sum(xs) // R
    med = xs[R // 2]  # lower median (ORDER BY x LIMIT 1 OFFSET R//2)

    # exact F2: vocab-bounded distributed fold over term_stats
    f2_parts = term_stats(ds, spec).map_batches(
        lambda b: pa.table({"p": pa.array(
            [int((b["cf"].to_numpy(zero_copy_only=False).astype(object)
                  ** 2).sum())], pa.int64())}),
        batch_format="pyarrow").take_all()
    exact = sum(int(r["p"]) for r in f2_parts)

    unit = max(1, exact // 1_000_000)   # int64-safe relative error
    mean_err = abs(est - exact) // unit
    med_err = abs(med - exact) // unit
    return pa.table({
        "n_rows": pa.array([R], pa.int64()),
        "est_f2": pa.array([est], pa.int64()),
        "med_f2": pa.array([med], pa.int64()),
        "f2_exact": pa.array([exact], pa.int64()),
        "mean_rel_err_e6": pa.array([mean_err], pa.int64()),
        "med_rel_err_e6": pa.array([med_err], pa.int64()),
        "within_gate": pa.array(
            [1 if mean_err <= 1_500_000 else 0], pa.int64()),
    })
