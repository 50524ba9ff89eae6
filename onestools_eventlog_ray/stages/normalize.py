"""Docstore preparation stage — normalize + hash + id-assign.

The analog of the reference's parse/normalize projection
(``/root/reference/OneSTools.EventLog/LgpReader.cs:102-176``) plus its
serial id assignment (``EventLogReader.cs:105-106``), re-expressed as a
stateless vectorized ``map_batches`` transform: Arrow batch in, docstore
batch out, no cross-batch state, so Ray can run any number of copies in
parallel with deterministic output.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from onestools_eventlog_ray.functions.analyzer import tokenize_array
from onestools_eventlog_ray.functions.hashing import doc_id_from_keys, sha256_hex
from onestools_eventlog_ray.sources.corpus import CorpusSpec


class PrepareDocs:
    """batch(corpus) -> batch(docstore): doc_id + content_sha256 + n_tokens.

    ``content_sha256`` is the per-row audit invariant (``input_hint``);
    ``n_tokens`` feeds the corpus-stats rollup (N, avgdl) without keeping
    token payloads around.
    """

    def __init__(self, spec: CorpusSpec, token_split_pattern: str,
                 store_content: bool = True):
        self.spec = spec
        self.pattern = token_split_pattern
        self.store_content = store_content

    def __call__(self, batch: pa.Table) -> pa.Table:
        spec = self.spec
        content = batch[spec.content_col]
        if spec.id_col:
            doc_id = pc.cast(batch[spec.id_col], pa.int64())
        else:
            doc_id = doc_id_from_keys(*[batch[c] for c in spec.key_cols])
        toks = tokenize_array(content, self.pattern)
        n_tokens = pc.cast(pc.list_value_length(toks), pa.int64())
        cols: dict[str, pa.Array | pa.ChunkedArray] = {"doc_id": doc_id}
        for c in spec.meta_cols:
            cols[c] = batch[c]
        cols["n_tokens"] = n_tokens
        cols["content_sha256"] = sha256_hex(content)
        if self.store_content:
            cols["content"] = content
        return pa.table(cols)


def add_doc_id(batch: pa.Table, spec: CorpusSpec) -> pa.Table:
    """Lightweight variant for the tokenize pass: only (doc_id, content)."""
    if spec.id_col:
        doc_id = pc.cast(batch[spec.id_col], pa.int64())
    else:
        doc_id = doc_id_from_keys(*[batch[c] for c in spec.key_cols])
    return pa.table({"doc_id": doc_id, "content": batch[spec.content_col]})
