"""End-to-end training-data preparation funnel.

``training_mix_report`` chains the canonical LLM-corpus cleaning stages
— language filter, length/quality cut, exact dedup, benchmark
decontamination — over ONE corpus and reports per-stage surviving
document and token counts: the go/no-go dashboard every large-scale
data pipeline runs before training.  It is the composition proof for
this engine: each stage is the already-oracle-checked primitive
(``docs_filter_lang`` / ``exact_dedup`` / ``decontaminate``) wired
end-to-end the way a real user would wire them.

Scale shape (per 100 TB contract):
- stage counts are per-batch integer partials folded to ONE row each —
  the corpus never leaves the scan stage for s0–s2;
- exact dedup shuffles only (md5, doc_id, n_tok) narrow rows for the
  docs that SURVIVE the cheap filters (filter-before-shuffle ordering);
- decontamination broadcasts the benchmark n-gram set once via
  ``ray.put`` and re-flags only non-benchmark docs (two streaming
  passes, same as :func:`..dedup.decontaminate`);
- the contaminated-id set crossing back to the survivor filter is
  bounded by the contamination rate, not the corpus (documented
  broadcast assumption, like every small-side join in this repo).

The reference's analog is its skip-mask + dedup-on-key ingestion chain
(``/root/reference/OneSTools.EventLog.Exporter.Manager/ExportersManager.cs:101-111``,
``ElasticSearchStorage.cs:293-320``) — here generalized to the
content-level hygiene a training corpus needs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Min

from onestools_eventlog_ray.functions.analyzer import tokenize_array
from onestools_eventlog_ray.functions.fasthash import md5_hex_fast
from onestools_eventlog_ray.pipelines.dedup import decontaminate
from onestools_eventlog_ray.sources.corpus import DOCUMENTS_SPEC, CorpusSpec


def _n_tokens(content: pa.ChunkedArray | pa.Array) -> np.ndarray:
    toks = tokenize_array(content)
    offs = np.asarray(toks.offsets.to_numpy(zero_copy_only=False),
                      dtype=np.int64)
    if offs.size and offs[0]:
        offs = offs - offs[0]
    return np.diff(offs)


def training_mix_report(ds: ray.data.Dataset,
                        spec: CorpusSpec = DOCUMENTS_SPEC,
                        langs: tuple[str, ...] = ("en", "de"),
                        min_chars: int = 120,
                        k: int = 3,
                        bench_mod: int = 20) -> pa.Table:
    """-> (stage_id, stage, n_docs, n_tokens), one row per funnel stage:

    0 ``all``            every document
    1 ``lang``           lang in ``langs``
    2 ``length``         + n_chars >= ``min_chars``
    3 ``exact_dedup``    + smallest doc_id per identical content
    4 ``decontaminated`` + not in the benchmark slice (doc_id %
                           ``bench_mod`` == 0) and sharing NO k-token
                           shingle with it

    Token counts use the canonical analyzer; duplicates share content,
    so the survivor's n_tokens is the group Min (constant per group)."""

    lang_set = pa.array(list(langs), pa.string())

    def stage_partials(batch: pa.Table) -> pa.Table:
        n_tok = _n_tokens(batch[spec.content_col])
        ok1 = pc.is_in(batch["lang"], value_set=lang_set) \
            .to_numpy(zero_copy_only=False)
        nch = batch["n_chars"].to_numpy(zero_copy_only=False)
        ok2 = ok1 & (nch >= min_chars)
        return pa.table({
            "n0": pa.array([batch.num_rows], pa.int64()),
            "t0": pa.array([int(n_tok.sum())], pa.int64()),
            "n1": pa.array([int(ok1.sum())], pa.int64()),
            "t1": pa.array([int(n_tok[ok1].sum())], pa.int64()),
            "n2": pa.array([int(ok2.sum())], pa.int64()),
            "t2": pa.array([int(n_tok[ok2].sum())], pa.int64()),
        })

    def survivors_in(batch: pa.Table) -> pa.Table:
        n_tok = _n_tokens(batch[spec.content_col])
        ok = pc.and_(
            pc.is_in(batch["lang"], value_set=lang_set),
            pc.greater_equal(batch["n_chars"], min_chars))
        kept = batch.filter(ok)
        mask = ok.to_numpy(zero_copy_only=False)
        return pa.table({
            "h": md5_hex_fast(kept[spec.content_col]),
            "doc_id": pc.cast(kept[spec.id_col], pa.int64()),
            "n_tok": pa.array(n_tok[mask], pa.int64()),
        })

    # s0-s2: one streaming scan, one tiny fold
    parts = ds.map_batches(stage_partials, batch_format="pyarrow") \
        .sum(["n0", "t0", "n1", "t1", "n2", "t2"])
    c = {k_: int(v) for k_, v in parts.items()}

    # s3: filter-before-shuffle exact dedup over the survivors
    survivors = ds.map_batches(survivors_in, batch_format="pyarrow") \
        .groupby("h") \
        .aggregate(Min("doc_id", alias_name="doc_id"),
                   Min("n_tok", alias_name="n_tok"))

    # s4: drop the benchmark slice + contaminated docs.  s3 and s4
    # counts fold in the SAME pass so the dedup shuffle runs once.
    flagged = decontaminate(ds, spec, k=k, bench_mod=bench_mod)
    flagged_ids = np.sort(np.asarray(
        [r["doc_id"] for r in flagged.select_columns(["doc_id"])
         .take_all()], dtype=np.int64))
    flagged_ref = ray.put(flagged_ids)

    def s34_partials(batch: pa.Table) -> pa.Table:
        bad = ray.get(flagged_ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        n_tok = batch["n_tok"].to_numpy(zero_copy_only=False)
        keep = (ids % bench_mod != 0) & ~np.isin(ids, bad)
        return pa.table({
            "n3": pa.array([ids.size], pa.int64()),
            "t3": pa.array([int(n_tok.sum())], pa.int64()),
            "n4": pa.array([int(keep.sum())], pa.int64()),
            "t4": pa.array([int(n_tok[keep].sum())], pa.int64()),
        })

    s34 = survivors.map_batches(s34_partials, batch_format="pyarrow") \
        .sum(["n3", "t3", "n4", "t4"]) or {}

    def g(d, key):
        return int(d.get(key, 0)) if isinstance(d, dict) else 0

    return pa.table({
        "stage_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "stage": pa.array(["all", "lang", "length", "exact_dedup",
                           "decontaminated"], pa.string()),
        "n_docs": pa.array([c["sum(n0)"], c["sum(n1)"], c["sum(n2)"],
                            g(s34, "sum(n3)"), g(s34, "sum(n4)")],
                           pa.int64()),
        "n_tokens": pa.array([c["sum(t0)"], c["sum(t1)"], c["sum(t2)"],
                              g(s34, "sum(t3)"), g(s34, "sum(t4)")],
                             pa.int64()),
    })


def mix_weights(ds: ray.data.Dataset,
                spec: CorpusSpec = DOCUMENTS_SPEC,
                by: str = "source") -> pa.Table:
    """Domain-mixing weights: per ``by`` group (source/domain), doc and
    token counts, the group's token share, and the per-doc sampling
    weight that would rebalance the mix to UNIFORM token share across
    groups (``weight > 1`` = upsample, ``< 1`` = downsample) — the
    mixture table a training run feeds its sampler (DoReMi/The-Pile
    style domain reweighting, with uniform as the target here so the
    whole computation stays exact integer math).

    One streaming pass: per-batch Acero (group, n_docs, n_tokens)
    partials -> tiny ``groupby`` fold (group count is the number of
    DOMAINS, never corpus-sized).  ``share_e6 = tokens*1e6 // total``;
    ``weight_e6 = total*1e6 // (n_groups * tokens)`` — floor both
    sides, 0 for an empty group.  -> (by, n_docs, n_tokens, share_e6,
    weight_e6) sorted by group."""
    from ray.data.aggregate import Sum as RSum

    def partial(batch: pa.Table) -> pa.Table:
        n_tok = _n_tokens(batch[spec.content_col])
        g = pa.table({by: batch[by],
                      "nt": pa.array(n_tok, pa.int64())}) \
            .group_by(by).aggregate([("nt", "sum"), ([], "count_all")])
        return pa.table({by: g[by],
                         "n_docs_p": g["count_all"].cast(pa.int64()),
                         "n_tokens_p": g["nt_sum"].cast(pa.int64())})

    folded = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(by).aggregate(RSum("n_docs_p", alias_name="n_docs"),
                               RSum("n_tokens_p", alias_name="n_tokens")) \
        .take_all()
    folded.sort(key=lambda r: r[by])
    groups = [r[by] for r in folded]
    nd = np.asarray([r["n_docs"] for r in folded], dtype=np.int64)
    nt = np.asarray([r["n_tokens"] for r in folded], dtype=np.int64)
    total = int(nt.sum())
    ng = len(groups)
    share = nt * 1_000_000 // max(total, 1)
    weight = np.zeros(ng, dtype=np.int64)
    nz = nt > 0
    weight[nz] = total * 1_000_000 // (ng * nt[nz])
    return pa.table({
        by: pa.array(groups, pa.string()),
        "n_docs": pa.array(nd, pa.int64()),
        "n_tokens": pa.array(nt, pa.int64()),
        "share_e6": pa.array(share, pa.int64()),
        "weight_e6": pa.array(weight, pa.int64()),
    })


def split_by_group(ds: ray.data.Dataset,
                   spec: CorpusSpec = DOCUMENTS_SPEC,
                   by: str = "source") -> pa.Table:
    """Leakage-free train/val/test split: every GROUP (source/domain)
    lands wholly in one split, assigned by a deterministic hash of the
    group key — ``(md5_lower64(key) >> 1) % 10`` -> 0-7 train, 8 val,
    9 test (the 80/10/10 split a training pipeline cuts WITHOUT
    letting near-identical in-domain docs straddle train and eval).
    Same streaming per-group fold as :func:`mix_weights`; the split
    assignment happens on the tiny group table.
    -> (split, n_groups, n_docs, n_tokens) by split name."""
    from ray.data.aggregate import Sum as RSum
    from onestools_eventlog_ray.functions.fasthash import md5_lower64

    def partial(batch: pa.Table) -> pa.Table:
        n_tok = _n_tokens(batch[spec.content_col])
        g = pa.table({by: batch[by],
                      "nt": pa.array(n_tok, pa.int64())}) \
            .group_by(by).aggregate([("nt", "sum"), ([], "count_all")])
        return pa.table({by: g[by],
                         "n_docs_p": g["count_all"].cast(pa.int64()),
                         "n_tokens_p": g["nt_sum"].cast(pa.int64())})

    rows = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(by).aggregate(RSum("n_docs_p", alias_name="n_docs"),
                               RSum("n_tokens_p", alias_name="n_tokens")) \
        .take_all()
    keys = pa.array([r[by] for r in rows], pa.string())
    h10 = ((md5_lower64(keys) >> np.uint64(1))
           % np.uint64(10)).astype(np.int64)
    split = np.where(h10 < 8, "train", np.where(h10 == 8, "val", "test"))
    out: dict[str, list[int]] = {}
    for i, r in enumerate(rows):
        acc = out.setdefault(str(split[i]), [0, 0, 0])
        acc[0] += 1
        acc[1] += int(r["n_docs"])
        acc[2] += int(r["n_tokens"])
    names = sorted(out)
    return pa.table({
        "split": pa.array(names, pa.string()),
        "n_groups": pa.array([out[s][0] for s in names], pa.int64()),
        "n_docs": pa.array([out[s][1] for s in names], pa.int64()),
        "n_tokens": pa.array([out[s][2] for s in names], pa.int64()),
    })


def leakage_safe_split(ds: ray.data.Dataset,
                       spec: CorpusSpec = DOCUMENTS_SPEC,
                       min_jaccard: float = 0.2,
                       **minhash_kwargs) -> pa.Table:
    """CLUSTER-level leakage guard — the split a pretraining pipeline
    actually needs: :func:`split_by_group` keeps whole *domains*
    together, but near-duplicate documents CROSS domains (mirrors,
    forks, quotes), and any one landing in train while its twin lands
    in eval silently inflates benchmark scores.  Here every verified
    near-dup cluster (``dedup.dedup_clusters``) is assigned to one
    split by the hash of its representative id; singleton docs hash
    their own doc_id.  Same deterministic 80/10/10 rule as
    ``split_by_group``: ``(md5_lower64(str(key)) >> 1) % 10``.

    Scale shape: the expensive part is the distributed verified-pairs
    pipeline; the cluster map that broadcasts is O(clustered docs) —
    the near-dup subset, orders of magnitude under the corpus.
    -> (split, n_docs, n_clustered_docs, n_tokens)."""
    from onestools_eventlog_ray.functions.fasthash import md5_lower64
    from onestools_eventlog_ray.pipelines.dedup import dedup_clusters

    clusters = dedup_clusters(ds, spec, min_jaccard=min_jaccard,
                              **minhash_kwargs)
    cl_ids = clusters["doc_id"].to_numpy(zero_copy_only=False)
    cl_rep = clusters["rep_id"].to_numpy(zero_copy_only=False)
    order = np.argsort(cl_ids)
    cmap_ref = ray.put((cl_ids[order], cl_rep[order]))

    def assign(batch: pa.Table) -> pa.Table:
        from onestools_eventlog_ray.stages.normalize import add_doc_id
        b = add_doc_id(batch, spec)
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        cids, creps = ray.get(cmap_ref)
        pos = np.searchsorted(cids, ids)
        pos_c = np.clip(pos, 0, max(cids.size - 1, 0))
        in_cluster = (cids.size > 0) & (cids[pos_c] == ids)
        key = np.where(in_cluster, creps[pos_c] if cids.size else ids, ids)
        key_str = pc.cast(pa.array(key.astype(np.int64)), pa.string())
        h10 = ((md5_lower64(key_str) >> np.uint64(1))
               % np.uint64(10)).astype(np.int64)
        split = np.where(h10 < 8, "train",
                         np.where(h10 == 8, "val", "test"))
        n_tok = _n_tokens(b["content"])
        t = pa.table({"split": pa.array(split, pa.string()),
                      "clustered": pa.array(in_cluster.astype(np.int64)),
                      "nt": pa.array(n_tok, pa.int64())})
        g = t.group_by("split").aggregate(
            [("clustered", "sum"), ("nt", "sum"), ([], "count_all")])
        return pa.table({"split": g["split"],
                         "n_docs_p": g["count_all"].cast(pa.int64()),
                         "n_clustered_p": g["clustered_sum"].cast(pa.int64()),
                         "n_tokens_p": g["nt_sum"].cast(pa.int64())})

    rows = ds.map_batches(assign, batch_format="pyarrow").take_all()
    out: dict[str, list[int]] = {}
    for r in rows:
        acc = out.setdefault(r["split"], [0, 0, 0])
        acc[0] += int(r["n_docs_p"])
        acc[1] += int(r["n_clustered_p"])
        acc[2] += int(r["n_tokens_p"])
    names = sorted(out)
    return pa.table({
        "split": pa.array(names, pa.string()),
        "n_docs": pa.array([out[s][0] for s in names], pa.int64()),
        "n_clustered_docs": pa.array([out[s][1] for s in names], pa.int64()),
        "n_tokens": pa.array([out[s][2] for s in names], pa.int64()),
    })


def mix_weights_temperature(ds: ray.data.Dataset,
                            spec: CorpusSpec = DOCUMENTS_SPEC,
                            by: str = "source") -> pa.Table:
    """Temperature-scaled domain mixture (T=2, the Gopher/mT5 sampling
    rule): target share ∝ sqrt(raw token share), which upsamples small
    domains less aggressively than the uniform target of
    :func:`mix_weights`.  Exactness: each group's ``sqrt(n_tokens)`` is
    a correctly-rounded IEEE double of an exact int, e6-rounded FIRST
    (``s = floor(sqrt(nt)*1e6+0.5)``), so the cross-group sums are
    order-free ints; the final ratios use arbitrary-precision ints
    (they overflow int64 by design — HUGEINT on the oracle side).

    Same one-pass group fold as :func:`mix_weights`.
    -> (by, n_tokens, sqrt_e6, target_share_e6, weight_e6)."""
    from ray.data.aggregate import Sum as RSum

    def partial(batch: pa.Table) -> pa.Table:
        n_tok = _n_tokens(batch[spec.content_col])
        g = pa.table({by: batch[by],
                      "nt": pa.array(n_tok, pa.int64())}) \
            .group_by(by).aggregate([("nt", "sum")])
        return pa.table({by: g[by],
                         "n_tokens_p": g["nt_sum"].cast(pa.int64())})

    folded = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(by).aggregate(RSum("n_tokens_p", alias_name="n_tokens")) \
        .take_all()
    folded.sort(key=lambda r: r[by])
    groups = [r[by] for r in folded]
    nt = [int(r["n_tokens"]) for r in folded]
    total = sum(nt)
    s = [int(np.floor(np.sqrt(np.float64(x)) * 1_000_000 + 0.5))
         for x in nt]
    ssum = sum(s)
    target = [x * 10 ** 6 // ssum if ssum else 0 for x in s]
    weight = [(x * total * 10 ** 6) // (ssum * n) if n else 0
              for x, n in zip(s, nt)]
    return pa.table({
        by: pa.array(groups, pa.string()),
        "n_tokens": pa.array(nt, pa.int64()),
        "sqrt_e6": pa.array(s, pa.int64()),
        "target_share_e6": pa.array(target, pa.int64()),
        "weight_e6": pa.array(weight, pa.int64()),
    })


def source_entropy(ds: ray.data.Dataset,
                   spec: CorpusSpec = DOCUMENTS_SPEC,
                   by: str = "source") -> ray.data.Dataset:
    """Vocabulary-diversity report: per domain, Shannon entropy of its
    term distribution (plus token/term counts) — low entropy flags
    template/boilerplate domains a mixture should downweight.

    Exactness: each term's contribution ``-p·log2(p)`` is e9-rounded
    FIRST, so the per-domain sum is an order-free integer (the same
    round-then-sum rule as ``lm_scores``).  Shuffle carries
    (domain, term, n) rows — vocabulary x domains, never the token
    stream.  -> (by, n_tokens, n_terms, entropy_e9)."""
    from ray.data.aggregate import Sum as RSum
    from onestools_eventlog_ray.functions.analyzer import tokenize_array

    def partial(batch: pa.Table) -> pa.Table:
        toks = tokenize_array(batch[spec.content_col])
        flat = toks.flatten()
        dl = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        src = np.repeat(np.asarray(batch[by].to_pylist(), dtype=object),
                        dl)
        t = pa.table({by: pa.array(src, pa.string()),
                      "term": flat.cast(pa.string())})
        g = t.group_by([by, "term"]).aggregate([([], "count_all")])
        return pa.table({by: g[by], "term": g["term"],
                         "n_p": g["count_all"].cast(pa.int64())})

    folded = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby([by, "term"]).aggregate(RSum("n_p", alias_name="n"))

    def finalize(group: pa.Table) -> pa.Table:
        n = group["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        total = int(n.sum())
        p = n.astype(np.float64) / np.float64(total)
        contrib = np.floor((-1_000_000_000.0 * p) * np.log2(p) + 0.5) \
            .astype(np.int64)
        return pa.table({
            by: pa.array([group[by][0].as_py()], pa.string()),
            "n_tokens": pa.array([total], pa.int64()),
            "n_terms": pa.array([int(n.size)], pa.int64()),
            "entropy_e9": pa.array([int(contrib.sum())], pa.int64()),
        })

    return folded.groupby(by).map_groups(finalize, batch_format="pyarrow")


def token_budget_plan(ds: ray.data.Dataset,
                      budget_tokens: int,
                      spec: CorpusSpec = DOCUMENTS_SPEC,
                      by: str = "source",
                      max_epochs: int = 4) -> pa.Table:
    """Token-budget ALLOCATOR — the Chinchilla-style data-planning
    table: given a training budget of ``budget_tokens`` and a UNIFORM
    target share per ``by`` group, how many (fractional) epochs of each
    source fit under the ``max_epochs`` repetition cap, how many tokens
    that actually draws, and the shortfall the cap leaves unfilled —
    the planner a data team runs before mixing a corpus into a run.

    All integer math (e6 fixed-point epochs, floor division both
    sides), over the same one-pass per-group token fold as
    :func:`mix_weights`.  -> (by, n_tokens, desired_tokens, epochs_e6,
    allocated_tokens, shortfall) sorted by group."""
    from ray.data.aggregate import Sum as RSum

    def partial(batch: pa.Table) -> pa.Table:
        n_tok = _n_tokens(batch[spec.content_col])
        g = pa.table({by: batch[by],
                      "nt": pa.array(n_tok, pa.int64())}) \
            .group_by(by).aggregate([("nt", "sum")])
        return pa.table({by: g[by],
                         "n_tokens_p": g["nt_sum"].cast(pa.int64())})

    folded = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(by).aggregate(RSum("n_tokens_p", alias_name="n_tokens")) \
        .take_all()
    folded.sort(key=lambda r: r[by])
    groups = [r[by] for r in folded]
    nt = np.asarray([r["n_tokens"] for r in folded], dtype=np.int64)
    ng = len(groups)
    desired = int(budget_tokens) // max(ng, 1)
    cap_e6 = int(max_epochs) * 1_000_000
    epochs = np.zeros(ng, dtype=np.int64)
    nz = nt > 0
    epochs[nz] = np.minimum(cap_e6, desired * 1_000_000 // nt[nz])
    allocated = epochs * nt // 1_000_000
    return pa.table({
        by: pa.array(groups, pa.string()),
        "n_tokens": pa.array(nt, pa.int64()),
        "desired_tokens": pa.array([desired] * ng, pa.int64()),
        "epochs_e6": pa.array(epochs, pa.int64()),
        "allocated_tokens": pa.array(allocated, pa.int64()),
        "shortfall": pa.array(desired - allocated, pa.int64()),
    })
