"""Tokenize stage — documents in, (term, doc_id, tf, dl) triples out.

The hot map stage of the index build (SURVEY.md §7.1 step 3).  Shipped
as a callable class so it runs as an actor pool
(``map_batches(TripleEmitter, concurrency=N)``): per-actor setup (spec,
pattern) happens once in ``__init__`` — the ST1 pattern of the
reference's per-worker LGF dictionary cache
(``/root/reference/OneSTools.EventLog/LgfReader.cs:18-25``).  The body is
Arrow kernels + Acero group_by only.
"""

from __future__ import annotations

import pyarrow as pa

from onestools_eventlog_ray.functions.analyzer import doc_term_table
from onestools_eventlog_ray.sources.corpus import CorpusSpec
from onestools_eventlog_ray.stages.normalize import add_doc_id


class TripleEmitter:
    def __init__(self, spec: CorpusSpec, token_split_pattern: str):
        self.spec = spec
        self.pattern = token_split_pattern

    def __call__(self, batch: pa.Table) -> pa.Table:
        b = add_doc_id(batch, self.spec)
        triples, _stats = doc_term_table(b["doc_id"], b["content"], self.pattern)
        return triples


def emit_triples(batch: pa.Table, *, spec: CorpusSpec,
                 token_split_pattern: str) -> pa.Table:
    """Stateless-task form of :class:`TripleEmitter`.

    There is no heavy per-worker state here (the pattern is a string), so
    plain tasks beat an actor pool: they reuse Ray's prestarted worker
    processes across ALL stages instead of paying a pool spin-up per
    stage — measured ~5s of fixed wall per pool on this workload."""
    b = add_doc_id(batch, spec)
    triples, _ = doc_term_table(b["doc_id"], b["content"], token_split_pattern)
    return triples
