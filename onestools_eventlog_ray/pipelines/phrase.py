"""Positional (phrase) index — the ES ``text``-field phrase-match
capability the round-1 engine lacked (reference surface:
``ElasticSearchStorage.cs:217-236`` — ES analyzed fields store positions
and support match_phrase; SURVEY.md §2.7 K5 family).

Design: a POSITIONS SIDECAR next to the BM25 index rather than a codec
change — per (term, doc) the token positions are stored as a parquet
``list<int32>`` column in term-hash-partitioned shard files:

    tokenize -> Acero group_by(doc, term) with a "list" aggregate on
    the token position -> groupby(pkey = blake2b(term) % P)
    -> map_groups: sort (term, doc_id), write pos-{pkey}.parquet

Phrase query = the classic positional intersection: S = pos(t_0);
S = (S + 1) ∩ pos(t_i) for each following term; |S| = occurrence count.
A query touches ONLY the shards its terms hash to (same pruning rule as
the BM25 shards), with a parquet ``term IN`` row filter.

Scale shape: the shuffle payload is (term, doc_id, positions) — heavier
than the BM25 triple shuffle by the positions column, which is why this
is an OPT-IN second pass instead of baggage on every build.  Everything
streams; shards are immutable and atomically written.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from onestools_eventlog_ray.config import EngineConfig
from onestools_eventlog_ray.functions.analyzer import tokenize_array
from onestools_eventlog_ray.functions.hashing import (term_partition,
                                                      term_partition_one)
from onestools_eventlog_ray.sources.corpus import (CorpusSpec,
                                                   CODE_CORPUS_SPEC,
                                                   read_corpus)
from onestools_eventlog_ray.stages.normalize import add_doc_id
from onestools_eventlog_ray.state.checkpoint import atomic_write_bytes


def emit_positions(batch: pa.Table, *, spec: CorpusSpec,
                   num_partitions: int) -> pa.Table:
    """corpus batch -> (pkey, term, doc_id, positions) rows, one per
    (doc, term).  Positions are 0-based token indices; the per-group
    list aggregation happens inside Arrow's Acero (no Python rows)."""
    from onestools_eventlog_ray.functions.runtime import pin_worker_threads
    pin_worker_threads()
    b = add_doc_id(batch, spec)
    toks = tokenize_array(b["content"])
    flat = toks.flatten()
    parents = pc.list_parent_indices(toks)
    offsets = np.asarray(toks.offsets.to_numpy(zero_copy_only=False),
                         dtype=np.int64)
    par_np = parents.to_numpy(zero_copy_only=False).astype(np.int64)
    pos = (np.arange(par_np.size, dtype=np.int64)
           - offsets[:-1][par_np]).astype(np.int32)
    pairs = pa.table({"parent": parents, "term": flat,
                      "pos": pa.array(pos, pa.int32())})
    agg = pairs.group_by(["parent", "term"]).aggregate([("pos", "list")])
    doc_ids = pc.take(b["doc_id"], agg["parent"])
    term_col = agg["term"]
    if isinstance(term_col, pa.ChunkedArray):
        term_col = term_col.combine_chunks()
    d = term_col.dictionary_encode()
    idx = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    pkey = term_partition(d.dictionary.to_pylist(), num_partitions)[idx]
    return pa.table({
        "pkey": pa.array(pkey.astype(np.int32), pa.int32()),
        "term": term_col,
        "doc_id": doc_ids,
        "positions": agg["pos_list"],
    })


def _write_pos_shard(index_dir: str):
    def fn(group: pa.Table) -> pa.Table:
        pkey = int(group["pkey"][0].as_py())
        group = group.sort_by([("term", "ascending"), ("doc_id", "ascending")])
        path = os.path.join(index_dir, "positions", f"pos-{pkey:05d}.parquet")
        atomic_write_bytes(path, lambda tmp: pq.write_table(
            group.drop_columns(["pkey"]), tmp))
        return pa.table({"pkey": pa.array([pkey], pa.int64()),
                         "n_rows": pa.array([group.num_rows], pa.int64())})
    return fn


def build_position_index(corpus_paths, index_dir: str,
                         spec: CorpusSpec = CODE_CORPUS_SPEC,
                         cfg: EngineConfig = EngineConfig()) -> dict:
    """Build the positions sidecar under ``<index_dir>/positions``."""
    import json
    ds = read_corpus(corpus_paths, spec, with_meta=False)
    rows = ds.map_batches(emit_positions, batch_format="pyarrow",
                          fn_kwargs=dict(spec=spec,
                                         num_partitions=cfg.num_partitions)) \
        .groupby("pkey").map_groups(_write_pos_shard(index_dir),
                                    batch_format="pyarrow").take_all()
    meta = {"num_partitions": cfg.num_partitions, "n_shards": len(rows),
            "n_rows": int(sum(r["n_rows"] for r in rows))}
    atomic_write_bytes(os.path.join(index_dir, "positions", "_meta.json"),
                       lambda tmp: open(tmp, "w").write(json.dumps(meta)))
    return meta


class PhraseEngine:
    """Phrase matching over the positions sidecar (shard-pruned reads)."""

    def __init__(self, index_dir: str, num_partitions: int | None = None):
        import glob
        import json
        from onestools_eventlog_ray.state import checkpoint as ckpt
        self.pos_dir = os.path.join(index_dir, "positions")
        # when the sidecar lives next to a BM25 index, enforce the same
        # layout-version gate as SearchEngine (round-2 ADVICE)
        if os.path.exists(ckpt.stats_path(index_dir)):
            ckpt.check_layout(ckpt.read_stats(index_dir), index_dir)
        # tombstones mask every phrase/span path exactly like
        # SearchEngine's result paths (ES soft-delete semantics): the
        # filter sits in _load_flat, so every downstream positional op
        # (phrase, span_near, span_not, proximity rerank) inherits it
        # (round-5 lifecycle-matrix gap: deleted docs kept matching
        # phrases until compaction dropped them physically)
        from onestools_eventlog_ray.state.tombstones import load_tombstones
        self.deleted = load_tombstones(index_dir)
        if num_partitions is None:
            # the positions sidecar records ITS OWN partition count —
            # it may differ from the BM25 index's
            meta_path = os.path.join(self.pos_dir, "_meta.json")
            if os.path.exists(meta_path):
                with open(meta_path) as f:
                    num_partitions = json.load(f)["num_partitions"]
            else:
                shards = glob.glob(os.path.join(self.pos_dir,
                                                "pos-*.parquet"))
                if not shards:
                    raise FileNotFoundError(
                        f"no position shards in {self.pos_dir}")
                num_partitions = max(int(os.path.basename(s)[4:9])
                                     for s in shards) + 1
        self.P = int(num_partitions)

    def _load_flat(self, terms: list[str]
                   ) -> dict[str, tuple[np.ndarray, np.ndarray]]:
        """term -> (doc_id repeated per position, position) flat int64
        arrays — pruned shard reads, NO per-row Python (the round-2
        verdict's weak spot: the old loader built df-sized
        ``{doc -> list}`` dicts via ``to_pylist``)."""
        by_shard: dict[int, list[str]] = {}
        for t in set(terms):
            by_shard.setdefault(term_partition_one(t, self.P), []).append(t)
        empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
        out: dict[str, tuple[np.ndarray, np.ndarray]] = \
            {t: empty for t in terms}
        for pkey, ts in by_shard.items():
            path = os.path.join(self.pos_dir, f"pos-{pkey:05d}.parquet")
            if not os.path.exists(path):
                continue
            tbl = pq.read_table(path, filters=[("term", "in", ts)])
            for t in ts:
                sub = tbl.filter(pc.equal(tbl["term"], t))
                if sub.num_rows == 0:
                    continue
                posl = sub["positions"]
                if isinstance(posl, pa.ChunkedArray):
                    posl = posl.combine_chunks()
                offs = np.asarray(posl.offsets.to_numpy(zero_copy_only=False),
                                  dtype=np.int64)
                offs = offs - offs[0]
                flat = posl.flatten().to_numpy(zero_copy_only=False) \
                    .astype(np.int64)
                docs = sub["doc_id"].to_numpy(zero_copy_only=False) \
                    .astype(np.int64)
                docs = np.repeat(docs, np.diff(offs))
                if self.deleted.size:
                    live = ~np.isin(docs, self.deleted)
                    docs, flat = docs[live], flat[live]
                out[t] = (docs, flat)
        return out

    def search_phrase(self, phrase_terms: list[str]) -> list[tuple[int, int]]:
        """-> [(doc_id, n_matches)] for docs containing the EXACT token
        sequence, (n_matches desc, doc_id asc).

        Fully vectorized positional intersection: each term's (doc, pos)
        pairs become integer keys ``dense_doc_idx * 2^32 + (pos - j)``
        (dense index over the first term's docs keeps keys in int64);
        the phrase occurrences are the running ``np.intersect1d`` of the
        per-term key sets — no per-candidate-doc Python loop."""
        if not phrase_terms:
            return []
        loaded = self._load_flat(phrase_terms)
        d0 = np.unique(loaded[phrase_terms[0]][0])
        if d0.size == 0:
            return []
        C = np.int64(1) << np.int64(32)          # positions < 2^32
        keys: np.ndarray | None = None
        for j, t in enumerate(phrase_terms):
            docs, pos = loaded[t]
            didx = np.searchsorted(d0, docs)
            np.clip(didx, 0, d0.size - 1, out=didx)
            valid = (d0[didx] == docs) & (pos >= j)
            kj = didx[valid] * C + (pos[valid] - j)
            keys = kj if keys is None \
                else np.intersect1d(keys, kj, assume_unique=True)
            if keys.size == 0:
                return []
        uidx, counts = np.unique(keys // C, return_counts=True)
        order = np.lexsort((d0[uidx], -counts))
        return [(int(d0[uidx[i]]), int(counts[i])) for i in order]


# ---------------------------------------------------------------------------
# distributed phrase serving (same pattern as query.score_queries)
# ---------------------------------------------------------------------------

#: per-worker-process engine cache — stateless tasks reuse prestarted
#: workers, so the sidecar metadata/shard state is loaded once per
#: worker without an actor pool's spin-up (see pipelines/query.py).
_PHRASE_CACHE: dict[str, "PhraseEngine"] = {}


def _phrase_batch(batch: pa.Table, *, index_dir: str) -> pa.Table:
    from onestools_eventlog_ray.functions.runtime import pin_worker_threads
    pin_worker_threads()
    # staleness guard (mirror of query._engine_for): an in-place sidecar
    # rebuild rewrites the positions dir and a delete appends tombstone
    # part files (phrase results mask them since round 5), so key on
    # both listings
    from onestools_eventlog_ray.state.tombstones import tombstone_dir
    pos_dir = os.path.join(index_dir, "positions")
    td = tombstone_dir(index_dir)
    ver = (tuple(sorted(os.listdir(pos_dir)))
           if os.path.isdir(pos_dir) else (),
           tuple(sorted(os.listdir(td))) if os.path.isdir(td) else ())
    eng = _PHRASE_CACHE.get(index_dir)
    if eng is None or getattr(eng, "_cache_ver", None) != ver:
        eng = PhraseEngine(index_dir)
        eng._cache_ver = ver
        _PHRASE_CACHE[index_dir] = eng
    qids, docs, matches = [], [], []
    for qid, terms in zip(batch["query_id"].to_pylist(),
                          batch["terms"].to_pylist()):
        for doc, n in eng.search_phrase(list(terms)):
            qids.append(qid)
            docs.append(doc)
            matches.append(n)
    return pa.table({
        "query_id": pa.array(qids, pa.int64()),
        "doc_id": pa.array(docs, pa.int64()),
        "n_matches": pa.array(matches, pa.int64()),
    })


def score_phrase_queries(index_dir: str, queries, batch_size: int = 8):
    """Phrase query batch served from a distributed map_batches stage:
    queries = list[{"query_id", "terms"}] or a Dataset -> Dataset of
    (query_id, doc_id, n_matches)."""
    import ray.data
    if not isinstance(queries, ray.data.Dataset):
        queries = ray.data.from_items(
            [{"query_id": q["query_id"], "terms": list(q["terms"])}
             for q in queries])
    return queries.map_batches(_phrase_batch, batch_format="pyarrow",
                               batch_size=batch_size,
                               fn_kwargs=dict(index_dir=index_dir))


def expand_prefix(pos_dir_index: str, prefix: str,
                  max_expansions: int = 50) -> list[str]:
    """Dictionary terms of the POSITIONS sidecar starting with
    ``prefix`` (sorted, capped at ``max_expansions`` — ES
    match_phrase_prefix semantics).  Range filter pushed to the parquet
    read; position lists pruned by the column projection."""
    import glob
    if not prefix:
        return []
    upper = prefix[:-1] + chr(ord(prefix[-1]) + 1)
    found: set[str] = set()
    for path in sorted(glob.glob(os.path.join(pos_dir_index, "positions",
                                              "pos-*.parquet"))):
        tbl = pq.read_table(path, columns=["term"],
                            filters=[("term", ">=", prefix),
                                     ("term", "<", upper)])
        found.update(tbl["term"].to_pylist())
    return sorted(found)[:max_expansions]


def search_phrase_prefix(eng: PhraseEngine, index_dir: str,
                         phrase_terms: list[str], prefix: str,
                         max_expansions: int = 50) -> list[tuple[int, int]]:
    """ES ``match_phrase_prefix``: the exact token sequence
    ``phrase_terms`` immediately followed by ANY dictionary term starting
    with ``prefix``.  -> [(doc_id, n_matches)], (n desc, doc_id asc).

    Same vectorized key-intersection as :meth:`PhraseEngine.search_phrase`
    for the fixed slots; the prefix slot contributes the UNION of its
    expansions' (doc, pos) keys (np.unique over the concatenation —
    overlapping expansions can't double-count a position)."""
    if not phrase_terms:
        return []
    expansions = expand_prefix(index_dir, prefix, max_expansions)
    if not expansions:
        return []
    loaded = eng._load_flat(list(phrase_terms) + expansions)
    d0 = np.unique(loaded[phrase_terms[0]][0])
    if d0.size == 0:
        return []
    C = np.int64(1) << np.int64(32)
    keys: np.ndarray | None = None
    for j, t in enumerate(phrase_terms):
        docs, pos = loaded[t]
        didx = np.searchsorted(d0, docs)
        np.clip(didx, 0, d0.size - 1, out=didx)
        valid = (d0[didx] == docs) & (pos >= j)
        kj = didx[valid] * C + (pos[valid] - j)
        keys = kj if keys is None \
            else np.intersect1d(keys, kj, assume_unique=True)
        if keys.size == 0:
            return []
    j = len(phrase_terms)
    parts = []
    for t in expansions:
        docs, pos = loaded[t]
        didx = np.searchsorted(d0, docs)
        np.clip(didx, 0, d0.size - 1, out=didx)
        valid = (d0[didx] == docs) & (pos >= j)
        parts.append(didx[valid] * C + (pos[valid] - j))
    last = np.unique(np.concatenate(parts)) if parts \
        else np.empty(0, dtype=np.int64)
    keys = np.intersect1d(keys, last, assume_unique=True)
    if keys.size == 0:
        return []
    uidx, counts = np.unique(keys // C, return_counts=True)
    order = np.lexsort((d0[uidx], -counts))
    return [(int(d0[uidx[i]]), int(counts[i])) for i in order]


def span_near(eng: PhraseEngine, term_a: str, term_b: str,
              slop: int = 3) -> list[tuple[int, int]]:
    """ES ``span_near`` (unordered, two clauses): documents where
    ``term_a`` and ``term_b`` occur within ``slop`` token positions of
    each other, with the doc's MINIMUM distance — proximity ranking
    over the same positions sidecar as exact phrase, no corpus scan.

    Vectorized per term pair: both (doc, pos) streams are already
    doc-major; for each doc present in both, the min |pa - pb| comes
    from one ``searchsorted`` of a's positions into b's (nearest
    neighbor under merge order) — no per-position Python.
    -> [(doc_id, min_dist)] with min_dist <= slop, (dist asc, doc asc)."""
    loaded = eng._load_flat([term_a, term_b])
    da, pa_ = loaded[term_a]
    db, pb_ = loaded[term_b]
    if da.size == 0 or db.size == 0:
        return []
    C = np.int64(1) << np.int64(32)
    ka = np.sort(da * C + pa_)
    kb = np.sort(db * C + pb_)
    # for each a-key, nearest b-key by insertion point; distance is valid
    # only when the neighbor belongs to the SAME doc
    idx = np.searchsorted(kb, ka)
    best = np.full(ka.size, np.int64(1) << 40, dtype=np.int64)
    for nb in (np.clip(idx - 1, 0, kb.size - 1),
               np.clip(idx, 0, kb.size - 1)):
        same = (kb[nb] // C) == (ka // C)
        d = np.abs(kb[nb] - ka)
        np.minimum(best, np.where(same, d, np.int64(1) << 40), out=best)
    docs = ka // C
    order = np.argsort(docs, kind="stable")
    ud, first = np.unique(docs[order], return_index=True)
    mins = np.minimum.reduceat(best[order], first)
    keep = mins <= slop
    out = sorted(zip(mins[keep].tolist(), ud[keep].tolist()))
    return [(int(d), int(m)) for m, d in out]


def intervals_ordered(eng: PhraseEngine, terms: list[str],
                      max_gaps: int = 4) -> list[tuple[int, int]]:
    """Lucene/ES ``intervals`` query, ``match`` rule with
    ``ordered: true`` + ``max_gaps``: documents containing ALL query
    terms in the given order within a window that has at most
    ``max_gaps`` other tokens inside it.  A doc's score here is its
    MINIMAL achievable gap count ``min(p_n - p_1 - (n-1))`` over
    ordered position tuples ``p_1 < p_2 < ... < p_n``.

    Vectorized greedy chain (optimal: for a fixed start, taking the
    smallest valid next position at every level minimizes the end):
    every level is ONE ``searchsorted`` of the current chain keys into
    the next term's sorted (doc*2^32 + pos) keys, so the scan is
    O(sum tf · log tf) with no per-doc Python.  Positions come from
    the same shard-pruned sidecar reads as exact phrase.
    -> [(doc_id, min_gaps)] with min_gaps <= max_gaps,
    (gaps asc, doc asc)."""
    if len(terms) < 2:
        raise ValueError("intervals_ordered needs at least two terms")
    loaded = eng._load_flat(list(terms))
    C = np.int64(1) << np.int64(32)
    keys = {}
    for t in set(terms):
        d, p = loaded[t]
        if d.size == 0:
            return []
        keys[t] = np.sort(d * C + p)
    cur = keys[terms[0]]
    start = cur.copy()
    for t in terms[1:]:
        nxt_keys = keys[t]
        idx = np.searchsorted(nxt_keys, cur, side="right")
        valid = idx < nxt_keys.size
        nxt = nxt_keys[np.minimum(idx, nxt_keys.size - 1)]
        ok = valid & ((nxt // C) == (cur // C))
        cur, start = nxt[ok], start[ok]
        if cur.size == 0:
            return []
    gaps = (cur - start) - np.int64(len(terms) - 1)
    docs = start // C
    order = np.argsort(docs, kind="stable")
    ud, first = np.unique(docs[order], return_index=True)
    mins = np.minimum.reduceat(gaps[order], first)
    keep = mins <= max_gaps
    out = sorted(zip(mins[keep].tolist(), ud[keep].tolist()))
    return [(int(d), int(g)) for g, d in out]


def proximity_rerank(eng, peng: "PhraseEngine", terms: list[str],
                     window_k: int = 50, k: int = 10) -> pa.Table:
    """Proximity reranking — the classic two-phase IR pattern ES
    expresses as a rescore-with-span query: BM25 retrieves the top
    ``window_k`` candidates, then the positional sidecar reranks them
    by the MINIMUM token window containing all query terms (docs
    missing a term keep their BM25 order after every complete match).

    Cost shape: phase 1 is the normal df-bounded scorer; phase 2 reads
    positions for |terms| terms (shard-pruned) and restricts them to
    the window_k candidate docs BEFORE any per-doc work, so the
    min-window scan touches O(window_k · tf) positions, never the
    corpus.  -> (rank, doc_id, win_len nullable, score_e6) top-k by
    (win_len asc NULLS LAST, score_e6 desc, doc_id asc)."""
    hits = eng.search(terms, k=1 << 62)
    ids = np.asarray([d for d, _ in hits], dtype=np.int64)
    e6 = np.floor(np.asarray([s for _, s in hits], dtype=np.float64)
                  * 1_000_000 + 0.5).astype(np.int64)
    order = np.lexsort((ids, -e6))[:window_k]
    ids, e6 = ids[order], e6[order]

    loaded = peng._load_flat(list(dict.fromkeys(terms)))
    # per candidate doc: merged (position, term_type) lists
    per_doc: dict[int, list[tuple[int, int]]] = {int(d): [] for d in ids}
    n_types = len(set(terms))
    for ti, t in enumerate(dict.fromkeys(terms)):
        docs, pos = loaded[t]
        m = np.isin(docs, ids)
        for d, p in zip(docs[m].tolist(), pos[m].tolist()):
            per_doc[d].append((p, ti))

    def min_window(evts: list[tuple[int, int]]) -> int | None:
        evts.sort()
        need = n_types
        have: dict[int, int] = {}
        best = None
        lo = 0
        for hi, (p, t) in enumerate(evts):
            have[t] = have.get(t, 0) + 1
            while len(have) == need:
                w = p - evts[lo][0] + 1
                best = w if best is None else min(best, w)
                tl = evts[lo][1]
                have[tl] -= 1
                if not have[tl]:
                    del have[tl]
                lo += 1
        return best

    wins = [min_window(per_doc[int(d)]) for d in ids]
    key = sorted(range(ids.size),
                 key=lambda i: (wins[i] is None,
                                wins[i] if wins[i] is not None else 0,
                                -int(e6[i]), int(ids[i])))[:k]
    return pa.table({
        "rank": pa.array(np.arange(1, len(key) + 1), pa.int64()),
        "doc_id": pa.array([int(ids[i]) for i in key], pa.int64()),
        "win_len": pa.array([wins[i] for i in key], pa.int64()),
        "score_e6": pa.array([int(e6[i]) for i in key], pa.int64()),
    })


def span_not(eng: PhraseEngine, include: tuple[str, str], exclude: str,
             pre: int = 0, post: int = 0) -> list[tuple[int, int]]:
    """ES ``span_not``: matches of the include PHRASE (two adjacent
    tokens) whose span, widened by ``pre`` tokens left and ``post``
    tokens right, does NOT overlap any occurrence of ``exclude`` —
    "match 'table hash' but not when 'scan' sits next to it".  The
    negative-context filter no bool must_not can express (must_not
    drops the whole DOC; span_not drops the individual MATCH).

    Fully vectorized over the positions sidecar: phrase matches come
    from one searchsorted of a-keys+1 into b-keys (doc*2^32+pos
    composite, the :func:`span_near` encoding); the exclusion test is
    two searchsorteds of the widened window bounds into the exclude
    keys — window clamped at the doc start so it can never leak into
    the previous doc's key range, and it cannot reach the next doc
    because positions << 2^32.  O(df) work, no corpus scan.
    -> [(doc_id, n_kept)] for docs with a surviving match, doc asc."""
    a, b = include
    loaded = eng._load_flat([a, b, exclude])
    da, ppa = loaded[a]
    db, ppb = loaded[b]
    dc, ppc = loaded[exclude]
    if da.size == 0 or db.size == 0:
        return []
    C = np.int64(1) << np.int64(32)
    ka = np.sort(da * C + ppa)
    kb = np.sort(db * C + ppb)
    idx = np.searchsorted(kb, ka + 1)
    ok = (idx < kb.size)
    ok &= kb[np.minimum(idx, kb.size - 1)] == ka + 1
    mk = ka[ok]                          # phrase match at (doc, p)
    if mk.size == 0:
        return []
    kc = np.sort(dc * C + ppc)
    docs = mk // C
    p = mk % C
    lo = docs * C + np.maximum(p - pre, 0)
    hi = docs * C + (p + 1 + post)
    i_lo = np.searchsorted(kc, lo, side="left")
    i_hi = np.searchsorted(kc, hi, side="right")
    kept = mk[~(i_hi > i_lo)]
    ud, cnt = np.unique(kept // C, return_counts=True)
    return [(int(d), int(n)) for d, n in zip(ud.tolist(), cnt.tolist())]


def span_first(eng: "PhraseEngine", term: str, end: int
               ) -> list[tuple[int, int]]:
    """ES ``span_first``: occurrences of ``term`` whose span ends at or
    before token position ``end`` — "match only near the start of the
    field" (title-ish matching without a separate field).  For a
    single-term span at 0-based position p the span end is p+1, so the
    gate is ``p + 1 <= end``.

    One df-bounded sidecar read (shard-pruned like every positional
    op), one vectorized mask, one ``np.unique`` fold — no corpus scan.
    -> [(doc_id, n_matches)] for docs with >=1 early occurrence, doc
    asc.  n_matches counts only the qualifying occurrences (ES scores
    the doc by its matching spans; the count is the deterministic
    integer analog)."""
    docs, pos = eng._load_flat([term])[term]
    if docs.size == 0:
        return []
    keep = pos + 1 <= end
    ud, cnt = np.unique(docs[keep], return_counts=True)
    return [(int(d), int(n)) for d, n in zip(ud.tolist(), cnt.tolist())]


def _big_spans(eng: "PhraseEngine", big: tuple[str, str], slop: int
               ) -> tuple[np.ndarray, np.ndarray]:
    """Enumerate ES ``span_near(in_order=true)`` spans for a two-term
    big query: pairs (pa, pb) with ``b`` at pb, ``a`` at pa, and
    ``pa < pb <= pa + slop + 1`` (slop = max intervening tokens).
    Composite doc*2^32+pos keys make the whole enumeration three
    searchsorteds + one ranges-expansion — O(df_a + df_b + n_spans),
    no per-doc loop.  -> (start_keys, end_keys), parallel arrays."""
    a, b = big
    loaded = eng._load_flat([a, b])
    da, ppa = loaded[a]
    db, ppb = loaded[b]
    if da.size == 0 or db.size == 0:
        return (np.empty(0, np.int64),) * 2
    C = np.int64(1) << np.int64(32)
    ka = np.sort(da * C + ppa)
    kb = np.sort(db * C + ppb)
    i_lo = np.searchsorted(kb, ka + 1, side="left")
    i_hi = np.searchsorted(kb, ka + np.int64(slop) + 1, side="right")
    cnt = i_hi - i_lo
    total = int(cnt.sum())
    if total == 0:
        return (np.empty(0, np.int64),) * 2
    # flatten the [i_lo, i_hi) ranges: classic vectorized ragged expand
    starts = np.repeat(ka, cnt)
    base = np.repeat(i_lo, cnt)
    off = np.arange(total) - np.repeat(np.cumsum(cnt) - cnt, cnt)
    ends = kb[base + off]
    return starts, ends


def span_containing(eng: "PhraseEngine", big: tuple[str, str],
                    little: str, slop: int = 3) -> list[tuple[int, int]]:
    """ES ``span_containing``: BIG spans (ordered two-term span_near
    within ``slop``) that contain >=1 occurrence of the LITTLE term,
    boundaries inclusive — "a..b windows that mention c".  The
    containment test is two searchsorteds of the span bounds into the
    little keys.  -> [(doc_id, n_spans)] doc asc."""
    starts, ends = _big_spans(eng, big, slop)
    if starts.size == 0:
        return []
    dc, ppc = eng._load_flat([little])[little]
    if dc.size == 0:
        return []
    C = np.int64(1) << np.int64(32)
    kc = np.sort(dc * C + ppc)
    jl = np.searchsorted(kc, starts, side="left")
    jh = np.searchsorted(kc, ends, side="right")
    kept = starts[jh > jl]
    if kept.size == 0:
        return []
    ud, cnt = np.unique(kept // C, return_counts=True)
    return [(int(d), int(n)) for d, n in zip(ud.tolist(), cnt.tolist())]


def span_within(eng: "PhraseEngine", little: str, big: tuple[str, str],
                slop: int = 3) -> list[tuple[int, int]]:
    """ES ``span_within``: LITTLE-term occurrences that sit inside at
    least one BIG span (same span_near big query, boundaries
    inclusive).  Coverage is computed with a difference array over the
    sorted little keys — each span adds +1/-1 at its searchsorted
    bounds, one cumsum marks every covered occurrence; fully
    vectorized whatever the span/occurrence overlap structure.
    -> [(doc_id, n_matches)] doc asc."""
    starts, ends = _big_spans(eng, big, slop)
    dc, ppc = eng._load_flat([little])[little]
    if starts.size == 0 or dc.size == 0:
        return []
    C = np.int64(1) << np.int64(32)
    kc = np.sort(dc * C + ppc)
    jl = np.searchsorted(kc, starts, side="left")
    jh = np.searchsorted(kc, ends, side="right")
    delta = np.zeros(kc.size + 1, dtype=np.int64)
    np.add.at(delta, jl, 1)
    np.add.at(delta, jh, -1)
    covered = np.cumsum(delta[:-1]) > 0
    if not covered.any():
        return []
    ud, cnt = np.unique(kc[covered] // C, return_counts=True)
    return [(int(d), int(n)) for d, n in zip(ud.tolist(), cnt.tolist())]
