"""Multi-field BM25 — per-field postings with per-field boosts.

The reference's search surface is THREE analyzed text fields
(``comment``, ``data``, ``dataPresentation`` —
``/root/reference/OneSTools.EventLog.Exporter.Core/ElasticSearch/ElasticSearchStorage.cs:217,227,231``);
ES keeps one inverted index PER FIELD and combines per-field scores.
Same design here: each field is built as its own index under
``<root>/field-<name>`` (own postings, own df/avgdl — field statistics
are per-field in ES/Lucene too), and the query-time score is

    score(doc) = sum_f boost_f * BM25_f(doc)

Per-field accumulation order is deterministic (fields ascending, then
the engine's sorted-term TAAT), so results are exactly reproducible by
a SQL oracle computing the same per-field BM25 and weighted sum.

Scale shape: fields build independently (one corpus read each — they
could share a read, but field builds are embarrassingly parallel and
resume independently per field), and a query probes only the shards its
terms hash to in each field's index, exactly like the single-field path.
"""

from __future__ import annotations

import os

import numpy as np

from onestools_eventlog_ray.config import EngineConfig
from onestools_eventlog_ray.functions.bm25 import topk_order
from onestools_eventlog_ray.pipelines.build import build_index
from onestools_eventlog_ray.pipelines.query import SearchEngine
from onestools_eventlog_ray.sources.corpus import CorpusSpec


def field_dir(root: str, field: str) -> str:
    return os.path.join(root, f"field-{field}")


def build_multifield_index(corpus_paths, root: str, fields: list[str],
                           id_col: str = "doc_id",
                           cfg: EngineConfig = EngineConfig()) -> dict:
    """One index per analyzed field.  Returns {field: build report}."""
    reports = {}
    for f in fields:
        spec = CorpusSpec(content_col=f, id_col=id_col, key_cols=(id_col,),
                          meta_cols=())
        reports[f] = build_index(corpus_paths, field_dir(root, f),
                                 spec=spec, cfg=cfg)
    return reports


class MultiFieldEngine:
    """BM25 over several analyzed fields with per-field boosts:
    ``boosts = {"text": 1.0, "source": 2.0}``.  Tombstones of each
    field index apply (they share doc_ids)."""

    def __init__(self, root: str, boosts: dict[str, float]):
        self.boosts = dict(boosts)
        self.engines = {f: SearchEngine(field_dir(root, f))
                        for f in sorted(boosts)}

    def search(self, terms: list[str], k: int = 10) -> list[tuple[int, float]]:
        """-> [(doc_id, combined score)], (score desc, doc_id asc).
        A doc matching in ANY field is a candidate (ES multi_match /
        bool-should semantics)."""
        ids_parts, w_parts = [], []
        for f in sorted(self.engines):           # deterministic field order
            hits = self.engines[f].search(terms, k=1 << 62)
            if hits:
                ids_parts.append(np.asarray([d for d, _ in hits],
                                            dtype=np.int64))
                w_parts.append(self.boosts[f] *
                               np.asarray([s for _, s in hits],
                                          dtype=np.float64))
        if not ids_parts:
            return []
        all_ids = np.concatenate(ids_parts)
        all_w = np.concatenate(w_parts)
        uids, inverse = np.unique(all_ids, return_inverse=True)
        scores = np.zeros(uids.size, dtype=np.float64)
        np.add.at(scores, inverse, all_w)
        idx = topk_order(scores, uids, k)
        return [(int(uids[i]), float(scores[i])) for i in idx]


def search_best_fields(eng: MultiFieldEngine, terms: list[str],
                       k: int = 10,
                       tie_breaker: float = 0.0) -> list[tuple[int, float]]:
    """ES ``multi_match`` type=best_fields: per doc,

        score = max_f (boost_f * bm25_f)
              + tie_breaker * (sum_f boost_f * bm25_f - max_f ...)

    — dis_max ACROSS FIELDS (the cross-field sibling of
    :func:`onestools_eventlog_ray.pipelines.query.search_dsl`'s
    per-term dis_max).  Same per-field posting reads as
    :meth:`MultiFieldEngine.search`; the max/sum fold is one
    np.maximum.at / np.add.at pass.  Deterministic field order keeps
    float sums oracle-reproducible."""
    ids_parts, w_parts = [], []
    for f in sorted(eng.engines):
        hits = eng.engines[f].search(terms, k=1 << 62)
        if hits:
            ids_parts.append(np.asarray([d for d, _ in hits],
                                        dtype=np.int64))
            w_parts.append(eng.boosts[f] *
                           np.asarray([s for _, s in hits],
                                      dtype=np.float64))
    if not ids_parts:
        return []
    all_ids = np.concatenate(ids_parts)
    all_w = np.concatenate(w_parts)
    uids, inverse = np.unique(all_ids, return_inverse=True)
    sums = np.zeros(uids.size, dtype=np.float64)
    np.add.at(sums, inverse, all_w)
    maxs = np.full(uids.size, -np.inf, dtype=np.float64)
    np.maximum.at(maxs, inverse, all_w)
    scores = maxs + tie_breaker * (sums - maxs)
    idx = topk_order(scores, uids, k)
    return [(int(uids[i]), float(scores[i])) for i in idx]
