"""Vectorized code tokenizer / analyzer.

The analog of the reference's bracket-block lexer + ``GetData`` flatten
(``/root/reference/OneSTools.EventLog/LgpReader.cs:178-220``): raw text
in, a normalized token stream out.  Unlike the reference (one record at
a time on a single thread) everything here operates on whole Arrow
arrays via RE2 kernels in ``pyarrow.compute`` — no Python loop over rows
in the hot path.

Canonical tokenization (MUST match the DuckDB oracle and the brute-force
NumPy oracle bit-for-bit on ASCII input):

    tokens(s) = [t for t in re.split(r"[^a-z0-9_]+", s.lower()) if t]
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

DEFAULT_SPLIT_PATTERN = r"[^a-z0-9_]+"

# Small stopword set used by the quality-scoring pipeline (pipelines/text.py).
STOPWORDS = ("a", "the", "and", "of", "to", "in", "is", "it")


def tokenize_array(content: pa.ChunkedArray | pa.Array,
                   pattern: str = DEFAULT_SPLIT_PATTERN) -> pa.ListArray:
    """text column -> list<string> of lowercase tokens, empties removed.

    Fully vectorized: utf8_lower + split_pattern_regex are RE2 kernels.
    Empty tokens (produced by leading/trailing/adjacent separators and by
    empty documents) are filtered out list-element-wise.
    """
    if isinstance(content, pa.ChunkedArray):
        content = content.combine_chunks()
    toks = pc.split_pattern_regex(pc.utf8_lower(content), pattern=pattern)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    # Drop "" elements while preserving list structure: rebuild offsets
    # from per-list counts of non-empty values.
    flat = toks.flatten()
    keep = pc.not_equal(flat, "")
    parents = pc.list_parent_indices(toks)
    kept_parents = parents.filter(keep)
    counts = np.zeros(len(toks), dtype=np.int64)
    if len(kept_parents):
        np.add.at(counts, kept_parents.to_numpy(zero_copy_only=False), 1)
    offsets = np.zeros(len(toks) + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    return pa.LargeListArray.from_arrays(pa.array(offsets, type=pa.int64()),
                                         flat.filter(keep))


def tokenize_py(text: str, pattern: str = DEFAULT_SPLIT_PATTERN) -> list[str]:
    """Reference single-string tokenizer (oracles / tests only — not a hot path)."""
    return [t for t in re.split(pattern, text.lower()) if t]


def doc_term_table(doc_ids: pa.Array | pa.ChunkedArray,
                   content: pa.Array | pa.ChunkedArray,
                   pattern: str = DEFAULT_SPLIT_PATTERN) -> tuple[pa.Table, pa.Table]:
    """One batch of documents -> ((term, doc_id, tf, dl) triples, per-doc stats).

    The triple table is the input of the posting-build shuffle (SURVEY.md
    §2.6 A1/A3); the stats table ``(doc_id, n_tokens, n_distinct_terms)``
    feeds the docstore and corpus-stats aggregate.

    The tf count hashes each distinct token string ONCE
    (``dictionary_encode``) and then counts integer (doc, token) keys
    with a single ``np.unique`` sort — measured 1.75x faster per doc
    than Acero's ``group_by(parent, term)``, which re-hashes the string
    for every occurrence.  This is the hottest kernel of the build's
    map phase, so the constant matters at any scale.
    """
    if isinstance(doc_ids, pa.ChunkedArray):
        doc_ids = doc_ids.combine_chunks()
    toks = tokenize_array(content, pattern)
    flat = toks.flatten()

    # dl (token count) per doc, including empty docs (dl = 0).
    dl_np = np.asarray(pc.list_value_length(toks).to_numpy(zero_copy_only=False),
                       dtype=np.int64)
    d = flat.dictionary_encode()
    idx = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    V = np.int64(max(len(d.dictionary), 1))
    parent = np.repeat(np.arange(dl_np.size, dtype=np.int64), dl_np)
    # composite int key is safe: parent < 2^31 (batch rows), V < 2^31
    # (distinct tokens in one batch), so parent * V + idx < 2^62
    uk, counts = np.unique(parent * V + idx, return_counts=True)
    up, ut = uk // V, uk % V

    triples = pa.table({
        "term": pc.take(d.dictionary, pa.array(ut)),
        "doc_id": pc.take(doc_ids, pa.array(up)),
        "tf": pa.array(counts.astype(np.int32), pa.int32()),
        "dl": pa.array(dl_np[up].astype(np.int32), pa.int32()),
    })
    stats = pa.table({
        "doc_id": doc_ids,
        "n_tokens": pa.array(dl_np, type=pa.int64()),
        "n_distinct_terms": pa.array(
            np.bincount(up, minlength=dl_np.size).astype(np.int64)
            if uk.size else np.zeros(dl_np.size, dtype=np.int64),
            type=pa.int64()),
    })
    return triples, stats
