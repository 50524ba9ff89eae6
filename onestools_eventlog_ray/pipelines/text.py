"""Text-analysis pipelines over a corpus Dataset — the training-data-prep
operator family (language ID, quality scoring, token counting, term
statistics, fingerprinting).

These generalize the reference's per-record normalizers/decoders
(SURVEY.md §2.2 M5-M9: free-text flatten + static dictionary decodes)
into corpus-scale batch transforms: every function is a vectorized
``map_batches`` over Arrow batches, aggregations use the
partial-then-small-groupby pattern (no full-row shuffles).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Sum

from onestools_eventlog_ray.functions.analyzer import (STOPWORDS,
                                                       tokenize_array)
from onestools_eventlog_ray.sources.corpus import CorpusSpec, DOCUMENTS_SPEC
from onestools_eventlog_ray.stages.normalize import add_doc_id

# Tiny per-language stopword profiles for the n-gram/stopword language-ID
# heuristic (deterministic, no model download).
LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "for", "with"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "des", "dans", "pour"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "de", "en", "para"},
    "zh": set(),   # no latin stopwords -> matched by elimination
}


def doc_token_stats(ds: ray.data.Dataset,
                    spec: CorpusSpec = DOCUMENTS_SPEC) -> ray.data.Dataset:
    """Per-doc token counts: (doc_id, n_tokens, n_distinct_terms)."""

    def fn(batch: pa.Table) -> pa.Table:
        from onestools_eventlog_ray.functions.analyzer import doc_term_table
        b = add_doc_id(batch, spec)
        _, stats = doc_term_table(b["doc_id"], b["content"])
        return stats

    return ds.map_batches(fn, batch_format="pyarrow")


def term_stats(ds: ray.data.Dataset,
               spec: CorpusSpec = DOCUMENTS_SPEC) -> ray.data.Dataset:
    """Global (term, df, cf) — partial per-batch df/cf then a small
    groupby over the partials (SURVEY.md §2.6 A3 pattern)."""

    def partial(batch: pa.Table) -> pa.Table:
        from onestools_eventlog_ray.functions.analyzer import doc_term_table
        b = add_doc_id(batch, spec)
        triples, _ = doc_term_table(b["doc_id"], b["content"])
        agg = triples.group_by("term").aggregate([("doc_id", "count"),
                                                  ("tf", "sum")])
        return agg.rename_columns(["term", "df_p", "cf_p"])

    return ds.map_batches(partial, batch_format="pyarrow") \
             .groupby("term") \
             .aggregate(Sum("df_p", alias_name="df"), Sum("cf_p", alias_name="cf"))


def corpus_summary(ds: ray.data.Dataset,
                   spec: CorpusSpec = DOCUMENTS_SPEC) -> pa.Table:
    """One row: (n_docs, total_tokens, avgdl)."""

    def partial(batch: pa.Table) -> pa.Table:
        toks = tokenize_array(batch[spec.content_col])
        n_tok = pc.list_value_length(toks)
        return pa.table({
            "n_docs_p": pa.array([batch.num_rows], pa.int64()),
            "tok_p": pa.array([pc.sum(n_tok).as_py() or 0], pa.int64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    n = sum(p["n_docs_p"] for p in parts)
    tok = sum(p["tok_p"] for p in parts)
    return pa.table({
        "n_docs": pa.array([n], pa.int64()),
        "total_tokens": pa.array([tok], pa.int64()),
        "avgdl": pa.array([tok / n if n else 0.0], pa.float64()),
    })


def quality_scores(ds: ray.data.Dataset,
                   spec: CorpusSpec = DOCUMENTS_SPEC,
                   stopwords: tuple[str, ...] = STOPWORDS) -> ray.data.Dataset:
    """Per-doc quality features: token count, stopword count, mean token
    length scaled by 1e6 (exact integer — hash-stable vs a SQL oracle)."""
    stopset = list(stopwords)

    def fn(batch: pa.Table) -> pa.Table:
        b = add_doc_id(batch, spec)
        toks = tokenize_array(b["content"])
        flat = toks.flatten()
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        n = len(toks)
        n_tokens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        is_stop = pc.is_in(flat, value_set=pa.array(stopset)).to_numpy(zero_copy_only=False)
        lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
        n_stop = np.zeros(n, dtype=np.int64)
        char_sum = np.zeros(n, dtype=np.int64)
        if parents.size:
            np.add.at(n_stop, parents, is_stop.astype(np.int64))
            np.add.at(char_sum, parents, lens)
        # mean token length * 1e6, floor -> exact integer both here and in SQL
        mean_len_e6 = np.zeros(n, dtype=np.int64)
        nz = n_tokens > 0
        mean_len_e6[nz] = (char_sum[nz] * 1_000_000) // n_tokens[nz]
        return pa.table({
            "doc_id": b["doc_id"],
            "n_tokens": pa.array(n_tokens, pa.int64()),
            "n_stopwords": pa.array(n_stop, pa.int64()),
            "mean_token_len_e6": pa.array(mean_len_e6, pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def language_id(ds: ray.data.Dataset,
                spec: CorpusSpec = DOCUMENTS_SPEC) -> ray.data.Dataset:
    """Stopword-profile language-ID heuristic: argmax over per-language
    stopword hit counts (ties / zero hits -> 'und').  Deterministic, no
    external model; a real fastText-style model would slot into the same
    actor-pool stage."""
    profiles = {k: pa.array(sorted(v)) for k, v in LANG_PROFILES.items() if v}

    def fn(batch: pa.Table) -> pa.Table:
        b = add_doc_id(batch, spec)
        toks = tokenize_array(b["content"])
        flat = toks.flatten()
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        n = len(toks)
        langs = sorted(profiles)
        hits = np.zeros((n, len(langs)), dtype=np.int64)
        for j, lang in enumerate(langs):
            m = pc.is_in(flat, value_set=profiles[lang]).to_numpy(zero_copy_only=False)
            if parents.size:
                np.add.at(hits[:, j], parents, m.astype(np.int64))
        best = np.argmax(hits, axis=1)
        best_hits = hits[np.arange(n), best]
        pred = np.where(best_hits > 0, np.asarray(langs, dtype=object)[best], "und")
        return pa.table({
            "doc_id": b["doc_id"],
            "pred_lang": pa.array(pred, pa.string()),
            "stopword_hits": pa.array(best_hits, pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


# GPT2-shaped pretokenizer (RE2-compatible subset: no lookahead), used for
# token-budget estimation in training-data prep.  Both pyarrow and DuckDB
# run RE2, so counts are oracle-exact.
BPE_PRETOKEN_PATTERN = r"'[a-z]+| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def token_counts_bpe(ds: ray.data.Dataset,
                     spec: CorpusSpec = DOCUMENTS_SPEC) -> ray.data.Dataset:
    """Per-doc token counts under two tokenizers: whitespace words and a
    BPE-ish pretokenizer regex — the 'how many LLM tokens is this corpus'
    estimator.  -> (doc_id, n_ws_tokens, n_bpe_pretokens)."""

    def fn(batch: pa.Table) -> pa.Table:
        b = add_doc_id(batch, spec)
        content = b["content"]
        if isinstance(content, pa.ChunkedArray):
            content = content.combine_chunks()
        n_ws = pc.cast(pc.count_substring_regex(content, pattern=r"\S+"),
                       pa.int64())
        n_bpe = pc.cast(pc.count_substring_regex(
            content, pattern=BPE_PRETOKEN_PATTERN), pa.int64())
        return pa.table({"doc_id": b["doc_id"],
                         "n_ws_tokens": n_ws,
                         "n_bpe_pretokens": n_bpe})

    return ds.map_batches(fn, batch_format="pyarrow")


def repetition_scores(ds: ray.data.Dataset,
                      spec: CorpusSpec = DOCUMENTS_SPEC) -> ray.data.Dataset:
    """Per-doc Gopher-style repetition signals for quality filtering:
    (doc_id, n_tokens, dup_token_frac_e6, top_bigram_frac_e6).

    - ``dup_token_frac`` = (n_tokens - n_distinct) / n_tokens — the
      fraction of the doc that is repeated vocabulary.
    - ``top_bigram_frac`` = count of the most frequent bigram divided by
      the doc's bigram count — boilerplate/template detector.

    Both are exact integers (floor(x * 1e6)), fully vectorized per
    batch: dictionary-encoded tokens, run-length counting over a
    lexsort of (doc, bigram) — no Python rows, no shuffle at all
    (embarrassingly parallel per batch, docs never span batches)."""

    def fn(batch: pa.Table) -> pa.Table:
        from onestools_eventlog_ray.functions.runtime import pin_worker_threads
        pin_worker_threads()
        b = add_doc_id(batch, spec)
        toks = tokenize_array(b["content"])
        n = len(toks)
        dl = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
               .astype(np.int64)
        d = toks.flatten().dictionary_encode()
        idx = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        parent = np.repeat(np.arange(n, dtype=np.int64), dl)

        # distinct tokens per doc: unique (parent, token) pairs.
        n_distinct = np.zeros(n, dtype=np.int64)
        if idx.size:
            key = parent * np.int64(len(d.dictionary)) + idx
            uniq_parents = parent[np.unique(key, return_index=True)[1]]
            np.add.at(n_distinct, uniq_parents, 1)

        # most-frequent-bigram count per doc: sort (doc, a, b) windows
        # that do not cross a doc boundary, then run-length count.
        top = np.zeros(n, dtype=np.int64)
        if idx.size >= 2:
            same = parent[:-1] == parent[1:]
            bp, ia, ib = parent[:-1][same], idx[:-1][same], idx[1:][same]
            if bp.size:
                order = np.lexsort((ib, ia, bp))
                sb, sa, sp = ib[order], ia[order], bp[order]
                new_run = np.empty(sp.size, dtype=bool)
                new_run[0] = True
                new_run[1:] = (sp[1:] != sp[:-1]) | (sa[1:] != sa[:-1]) \
                              | (sb[1:] != sb[:-1])
                starts = np.flatnonzero(new_run)
                runlen = np.diff(np.append(starts, sp.size))
                np.maximum.at(top, sp[starts], runlen)

        dup_e6 = np.zeros(n, dtype=np.int64)
        nz = dl > 0
        dup_e6[nz] = ((dl[nz] - n_distinct[nz]) * 1_000_000) // dl[nz]
        big_e6 = np.zeros(n, dtype=np.int64)
        nb = dl >= 2
        big_e6[nb] = (top[nb] * 1_000_000) // (dl[nb] - 1)
        return pa.table({
            "doc_id": b["doc_id"],
            "n_tokens": pa.array(dl, pa.int64()),
            "dup_token_frac_e6": pa.array(dup_e6, pa.int64()),
            "top_bigram_frac_e6": pa.array(big_e6, pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def tfidf_topk(ds: ray.data.Dataset,
               spec: CorpusSpec = DOCUMENTS_SPEC,
               k: int = 3) -> ray.data.Dataset:
    """Per-doc top-k TF-IDF terms: (doc_id, term, tfidf_e6), ranked on
    the ROUNDED integer score (ties broken by term asc) so the ranking
    is bit-stable against a SQL oracle.

    idf = ln((N + 1) / (df + 1)) comes from the ``term_stats``
    partial-fold and is BROADCAST once via ``ray.put`` (vocab << corpus
    — the standard small-side lookup; were the vocab itself huge, this
    becomes a shuffle join on term).  The per-doc top-k is computed
    inside each batch (docs never span batches): lexsort + run ranks,
    no global sort."""
    import ray

    stats = term_stats(ds, spec).to_pandas()
    n_docs = ds.count()
    idf = np.log((n_docs + 1.0) / (stats["df"].to_numpy().astype(np.float64)
                                   + 1.0))
    lookup_ref = ray.put((pa.array(stats["term"].to_numpy(), pa.string()), idf))

    def fn(batch: pa.Table) -> pa.Table:
        from onestools_eventlog_ray.functions.analyzer import doc_term_table
        from onestools_eventlog_ray.functions.runtime import pin_worker_threads
        pin_worker_threads()
        terms_arr, idf_arr = ray.get(lookup_ref)
        b = add_doc_id(batch, spec)
        triples, _ = doc_term_table(b["doc_id"], b["content"])
        if not triples.num_rows:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "term": pa.array([], pa.string()),
                             "tfidf_e6": pa.array([], pa.int64())})
        pos = pc.index_in(triples["term"], value_set=terms_arr) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
        tf = triples["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        e6 = np.floor(tf * idf_arr[pos] * 1_000_000 + 0.5).astype(np.int64)
        doc = triples["doc_id"].to_numpy(zero_copy_only=False)
        terms_np = np.asarray(triples["term"].to_pylist(), dtype=np.str_)
        order = np.lexsort((terms_np, -e6, doc))
        sd = doc[order]
        new_doc = np.empty(sd.size, dtype=bool)
        new_doc[0] = True
        new_doc[1:] = sd[1:] != sd[:-1]
        rank = np.arange(sd.size) - np.maximum.accumulate(
            np.where(new_doc, np.arange(sd.size), 0))
        keep = order[rank < k]
        return pa.table({
            "doc_id": pa.array(doc[keep], pa.int64()),
            "term": pa.array(terms_np[keep], pa.string()),
            "tfidf_e6": pa.array(e6[keep], pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def hashed_doc_vectors(ds: ray.data.Dataset,
                       spec: CorpusSpec = DOCUMENTS_SPEC,
                       dim: int = 64) -> ray.data.Dataset:
    """Feature-hashing (hashing-trick) document vectors — the
    fixed-width featurization a training pipeline uses when the vocab
    is unbounded: every term contributes ``sign * tf`` to coordinate
    ``md5_64('hv:' + term) % dim`` with sign drawn from the next hash
    bit, so NO vocabulary table exists anywhere (unlike TF-IDF's
    broadcast idf).  -> sparse nonzero (doc_id, dim, v) int64 rows.

    Exact integers, embarrassingly parallel (docs never span batches),
    zero shuffle; two shards' vectors add coordinate-wise, so the
    operator is also the mergeable featurizer for streaming corpora."""
    from onestools_eventlog_ray.functions.fasthash import md5_lower64
    nbits = int(np.log2(dim))
    assert (1 << nbits) == dim, "dim must be a power of two"

    def fn(batch: pa.Table) -> pa.Table:
        from onestools_eventlog_ray.functions.analyzer import doc_term_table
        from onestools_eventlog_ray.functions.runtime import pin_worker_threads
        pin_worker_threads()
        b = add_doc_id(batch, spec)
        triples, _ = doc_term_table(b["doc_id"], b["content"])
        if not triples.num_rows:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "dim": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64())})
        term = triples["term"]
        if isinstance(term, pa.ChunkedArray):
            term = term.combine_chunks()
        salted = pc.binary_join_element_wise(
            pa.array(["hv:"] * len(term), pa.string()), term, "")
        h = md5_lower64(salted)
        j = (h % np.uint64(dim)).astype(np.int64)
        sign = (((h >> np.uint64(nbits)) & np.uint64(1)).astype(np.int64)
                * 2 - 1)
        tf = triples["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
        doc = triples["doc_id"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(doc, return_inverse=True)
        acc = np.zeros((uniq.size, dim), dtype=np.int64)
        np.add.at(acc, (inv, j), sign * tf)
        di, dj = np.nonzero(acc)
        return pa.table({
            "doc_id": pa.array(uniq[di], pa.int64()),
            "dim": pa.array(dj.astype(np.int64), pa.int64()),
            "v": pa.array(acc[di, dj], pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def rolling_fingerprint(ds: ray.data.Dataset,
                        spec: CorpusSpec = DOCUMENTS_SPEC,
                        base: int = 1_000_003) -> ray.data.Dataset:
    """Per-doc polynomial rolling-hash document fingerprint over the token
    stream (Rabin-Karp, exact mod 2^61-1): (doc_id, fingerprint).

    Vectorized end-to-end: md5 token hashes over the batch's UNIQUE
    tokens (dictionary encode + DuckDB kernel), then one power-sum
    ``mulmod``/``reduceat`` pass per batch — no per-token Python (the
    round-1 slowest-per-byte stage).  Exactly reproduced by the DuckDB
    oracle's ``list_reduce`` left-fold (same arithmetic mod p)."""
    from onestools_eventlog_ray.functions.fasthash import (MERSENNE61,
                                                           md5_lower64,
                                                           poly_hash_p61)

    def fn(batch: pa.Table) -> pa.Table:
        b = add_doc_id(batch, spec)
        toks = tokenize_array(b["content"])
        offsets = np.asarray(toks.offsets.to_numpy(zero_copy_only=False),
                             dtype=np.int64)
        flat = toks.flatten()
        if len(flat):
            d = flat.dictionary_encode()
            uh = md5_lower64(d.dictionary) % MERSENNE61
            idx = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            fps = poly_hash_p61(uh[idx], offsets, base).astype(np.int64)
        else:
            fps = np.zeros(offsets.size - 1, dtype=np.int64)
        return pa.table({"doc_id": b["doc_id"],
                         "fingerprint": pa.array(fps, pa.int64())})

    return ds.map_batches(fn, batch_format="pyarrow")


def bigram_stats(ds: ray.data.Dataset,
                 spec: CorpusSpec = DOCUMENTS_SPEC) -> ray.data.Dataset:
    """Corpus-wide bigram counts -> (bigram, n) — the count table a
    count-based language model / collocation miner starts from (term
    unigram stats are :func:`term_stats`).

    Partial-then-fold: each batch builds its local bigram counts with
    ONE Arrow join kernel + Acero group_by (windows never cross doc
    boundaries), so only unique (bigram, partial-count) rows shuffle —
    at 100 TB the exchange is bounded by the bigram vocabulary per
    batch, not the token stream."""

    def partial(batch: pa.Table) -> pa.Table:
        from onestools_eventlog_ray.functions.runtime import pin_worker_threads
        pin_worker_threads()
        toks = tokenize_array(batch[spec.content_col])
        flat = toks.flatten()
        n_flat = len(flat)
        if n_flat < 2:
            return pa.table({"bigram": pa.array([], pa.string()),
                             "n_p": pa.array([], pa.int64())})
        dl = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
               .astype(np.int64)
        parent = np.repeat(np.arange(dl.size, dtype=np.int64), dl)
        same = parent[:-1] == parent[1:]
        w = n_flat - 1
        joined = pc.binary_join_element_wise(
            flat.slice(0, w), flat.slice(1, w),
            pa.scalar(" ", flat.type))   # sep type must match (large_)string
        t = pa.table({"bigram": joined.filter(pa.array(same))})
        agg = t.group_by("bigram").aggregate([("bigram", "count")])
        return agg.rename_columns(["bigram", "n_p"])

    return ds.map_batches(partial, batch_format="pyarrow") \
             .groupby("bigram").aggregate(Sum("n_p", alias_name="n"))


def redact_terms(ds: ray.data.Dataset,
                 spec: CorpusSpec = DOCUMENTS_SPEC,
                 deny: tuple[str, ...] = ("the", "a", "big")) -> ray.data.Dataset:
    """Denylist redaction — the C4-style cleaning step (drop banned
    terms, keep the rest in order): per doc (doc_id, n_redacted, n_kept,
    scrubbed_md5) where scrubbed = kept tokens joined by ' '.

    Fully vectorized, zero shuffle: tokenize (RE2), one ``is_in`` mask
    against the deny set, offsets rebuilt by cumsum (no reduceat
    zero-length hazard), ``binary_join`` reassembles the scrubbed text
    and the md5 comes from the DuckDB kernel (``fasthash``) — no Python
    per row.  The md5 makes the redaction auditable byte-for-byte
    against the oracle without shipping the scrubbed corpus."""
    deny_arr = pa.array(sorted(set(deny)), pa.string())

    def fn(batch: pa.Table) -> pa.Table:
        from onestools_eventlog_ray.functions.fasthash import md5_hex_fast
        b = add_doc_id(batch, spec)
        toks = tokenize_array(b["content"])
        flat = toks.flatten()
        offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offsets = offsets - offsets[0]          # rebase (sliced-input safety)
        keep = pc.invert(pc.is_in(flat, value_set=deny_arr))
        keep_np = keep.to_numpy(zero_copy_only=False)
        cs = np.concatenate([[0], np.cumsum(keep_np, dtype=np.int64)])
        kept_per_doc = cs[offsets[1:]] - cs[offsets[:-1]]
        total_per_doc = np.diff(offsets)
        new_offsets = np.concatenate([[0], np.cumsum(kept_per_doc)])
        kept_list = pa.ListArray.from_arrays(
            pa.array(new_offsets, pa.int32()), flat.filter(keep))
        scrubbed = pc.binary_join(kept_list, " ")
        return pa.table({
            "doc_id": b["doc_id"],
            "n_redacted": pa.array(total_per_doc - kept_per_doc, pa.int64()),
            "n_kept": pa.array(kept_per_doc, pa.int64()),
            "scrubbed_md5": md5_hex_fast(scrubbed),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def lm_scores(ds: ray.data.Dataset,
              spec: CorpusSpec = DOCUMENTS_SPEC,
              extra_cols: tuple[str, ...] = ()) -> ray.data.Dataset:
    """Unigram language-model quality score (the CCNet/KenLM-style
    perplexity filter, exact and model-free): per doc
    (doc_id, dl, sum_lp_e6) where sum_lp_e6 = Σ_token
    round(ln(cf_token / total_tokens) · 1e6) as an INTEGER sum — each
    token's log-probability is rounded to e6 fixed-point FIRST, so the
    per-doc sum is order-independent and bit-identical to the SQL
    oracle (the float-summation-order hazard is designed out, same as
    ``label_centroids``).

    Two passes: the ``term_stats`` partial-fold (vocab-sized result)
    broadcast once via ``ray.put``, then one streaming scoring pass
    (``index_in`` + cumsum — no shuffle)."""
    import ray

    stats = term_stats(ds, spec).to_pandas()
    total = int(stats["cf"].sum())
    lp_e6 = np.floor(
        np.log(stats["cf"].to_numpy().astype(np.float64) / total)
        * 1_000_000 + 0.5).astype(np.int64)
    lookup_ref = ray.put((pa.array(stats["term"], pa.string()), lp_e6))

    def fn(batch: pa.Table) -> pa.Table:
        terms_arr, lp_arr = ray.get(lookup_ref)
        b = add_doc_id(batch, spec)
        toks = tokenize_array(b["content"])
        flat = toks.flatten()
        offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offsets = offsets - offsets[0]
        pos = pc.index_in(flat, value_set=terms_arr) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        tok_lp = lp_arr[pos]
        cs = np.concatenate([[0], np.cumsum(tok_lp, dtype=np.int64)])
        cols = {
            "doc_id": b["doc_id"],
            "dl": pa.array(np.diff(offsets), pa.int64()),
            "sum_lp_e6": pa.array(cs[offsets[1:]] - cs[offsets[:-1]],
                                  pa.int64()),
        }
        for c in extra_cols:
            cols[c] = batch[c]      # carried from the RAW batch (meta col)
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")


def training_data_card(ds: ray.data.Dataset,
                       spec: CorpusSpec = DOCUMENTS_SPEC) -> pa.Table:
    """One-row DATA CARD ("datasheet for datasets"): the headline facts
    a training-data release publishes — docs, tokens, vocabulary size,
    language/source counts, exact-duplicate rate and mean document
    length, all exact integers.  Composes the engine's own folds: one
    tokenize pass for tokens/vocab (vocab-bounded partials), one
    md5 fold for the dup rate, tiny distinct folds for the enums.
    -> (n_docs, total_tokens, vocab, n_langs, n_sources,
        dup_rate_e6, mean_dl_e6)."""
    from ray.data.aggregate import Count
    from onestools_eventlog_ray.pipelines.dedup import exact_dedup

    ts = term_stats(ds, spec).to_pandas()          # vocab-bounded
    vocab = len(ts)
    total_tokens = int(ts["cf"].sum())
    n_groups = exact_dedup(ds, spec).count()
    n_docs = ds.count()
    n_langs = ds.select_columns(["lang"]).groupby("lang") \
        .aggregate(Count(alias_name="_c")).count()
    n_sources = ds.select_columns(["source"]).groupby("source") \
        .aggregate(Count(alias_name="_c")).count()
    dup_rate = (n_docs - n_groups) * 1_000_000 // max(n_docs, 1)
    return pa.table({
        "n_docs": pa.array([n_docs], pa.int64()),
        "total_tokens": pa.array([total_tokens], pa.int64()),
        "vocab": pa.array([vocab], pa.int64()),
        "n_langs": pa.array([n_langs], pa.int64()),
        "n_sources": pa.array([n_sources], pa.int64()),
        "dup_rate_e6": pa.array([dup_rate], pa.int64()),
        "mean_dl_e6": pa.array([total_tokens * 1_000_000
                                // max(n_docs, 1)], pa.int64()),
    })


def doclen_pcts_by_lang(ds: ray.data.Dataset,
                        spec: CorpusSpec = DOCUMENTS_SPEC,
                        pcts: tuple[int, ...] = (25, 50, 75, 90)
                        ) -> ray.data.Dataset:
    """Per-language document-length percentiles (exact
    ``percentile_disc`` over token counts) — the length-filter
    calibration a per-language quality gate reads (one global threshold
    over-filters verbose languages).  Narrow (lang, dl) rows shuffle
    once on lang; the per-group pick is the integer index
    ``(p*n + 99) // 100 - 1`` of ``price_percentiles``.
    -> (lang, n_docs, p25, p50, p75, p90)."""

    def project(batch: pa.Table) -> pa.Table:
        toks = tokenize_array(batch[spec.content_col])
        import pyarrow.compute as pc
        return pa.table({
            "lang": batch["lang"],
            "dl": pc.list_value_length(toks).cast(pa.int64()),
        })

    def pct(group: pa.Table) -> pa.Table:
        v = np.sort(group["dl"].to_numpy(zero_copy_only=False)
                    .astype(np.int64))
        n = v.size
        cols = {"lang": pa.array([group["lang"][0].as_py()], pa.string()),
                "n_docs": pa.array([n], pa.int64())}
        for p in pcts:
            cols[f"p{p}"] = pa.array(
                [int(v[(p * n + 99) // 100 - 1])], pa.int64())
        return pa.table(cols)

    return ds.map_batches(project, batch_format="pyarrow") \
        .groupby("lang").map_groups(pct, batch_format="pyarrow")


def term_burstiness(ds: ray.data.Dataset,
                    spec: CorpusSpec = DOCUMENTS_SPEC,
                    min_df: int = 5, k: int = 20) -> pa.Table:
    """Church-Gale burstiness: cf/df per term — terms that cluster
    inside few documents (burst >> 1) are topical/templated, terms near
    1 are function words; the corpus-linguistics diagnostic next to
    ``term_skew`` and ``zipf_coverage``.  One ``term_stats`` fold
    (vocab-bounded), exact ``burst_e6 = cf*1e6 // df``, top-k by
    (burst desc, term asc).  -> (term, df, cf, burst_e6)."""
    rows = term_stats(ds, spec).to_pandas()
    rows = rows[rows["df"] >= min_df].copy()
    rows["burst_e6"] = rows["cf"].astype("int64") * 1_000_000 \
        // rows["df"].astype("int64")
    rows = rows.sort_values(["burst_e6", "term"],
                            ascending=[False, True]).head(k)
    return pa.table({
        "term": pa.array(rows["term"].tolist(), pa.string()),
        "df": pa.array(rows["df"].astype("int64").tolist(), pa.int64()),
        "cf": pa.array(rows["cf"].astype("int64").tolist(), pa.int64()),
        "burst_e6": pa.array(rows["burst_e6"].tolist(), pa.int64()),
    })


def hardest_examples(ds: ray.data.Dataset,
                     spec: CorpusSpec = DOCUMENTS_SPEC,
                     k: int = 5) -> ray.data.Dataset:
    """Per-language bottom-k documents by mean unigram log-probability —
    the "hardest / most-surprising examples" selection of a curriculum
    or quality-audit loop (the doc-level argmin companion of
    ``curriculum``'s 3-way difficulty cut).  Exactness: the per-doc mean
    is ``trunc_div(sum_lp_e6, dl)`` (DuckDB ``//`` truncates toward zero
    on negatives — floor division would diverge on every doc), ties
    break on doc_id.

    Scale shape: TWO-stage selection — each batch keeps only its local
    bottom-k per language, so the shuffle moves O(n_batches x langs x k)
    rows into the final per-language merge, never the corpus.
    -> (lang, rnk, doc_id, dl, sum_lp_e6, mean_lp_e6), k rows per lang."""
    scores = lm_scores(ds, spec, extra_cols=("lang",))

    def local_bottomk(batch: pa.Table) -> pa.Table:
        dl = batch["dl"].to_numpy(zero_copy_only=False)
        keep = dl > 0
        t = batch.filter(pa.array(keep))
        if t.num_rows == 0:
            return pa.table({"lang": pa.array([], pa.string()),
                             "doc_id": pa.array([], pa.int64()),
                             "dl": pa.array([], pa.int64()),
                             "sum_lp_e6": pa.array([], pa.int64()),
                             "mean_lp_e6": pa.array([], pa.int64())})
        mean = _trunc_div(
            t["sum_lp_e6"].to_numpy(zero_copy_only=False).astype(np.int64),
            t["dl"].to_numpy(zero_copy_only=False).astype(np.int64))
        t = t.append_column("mean_lp_e6", pa.array(mean, pa.int64()))
        la = t["lang"].to_numpy(zero_copy_only=False)
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        parts = []
        for lang in np.unique(la):
            m = np.flatnonzero(la == lang)
            order = np.lexsort((doc[m], mean[m]))[:k]
            parts.append(t.take(pa.array(m[order], pa.int64())))
        out = pa.concat_tables(parts)
        return out.select(["lang", "doc_id", "dl", "sum_lp_e6",
                           "mean_lp_e6"])

    def final(group: pa.Table) -> pa.Table:
        mean = group["mean_lp_e6"].to_numpy(zero_copy_only=False)
        doc = group["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, mean))[:k]
        g = group.take(pa.array(order, pa.int64()))
        return pa.table({
            "lang": g["lang"],
            "rnk": pa.array(np.arange(1, g.num_rows + 1), pa.int64()),
            "doc_id": g["doc_id"],
            "dl": g["dl"],
            "sum_lp_e6": g["sum_lp_e6"],
            "mean_lp_e6": g["mean_lp_e6"],
        })

    return scores.map_batches(local_bottomk, batch_format="pyarrow") \
        .groupby("lang").map_groups(final, batch_format="pyarrow")


def significant_terms(ds: ray.data.Dataset,
                      spec: CorpusSpec = DOCUMENTS_SPEC,
                      fg_col: str = "lang", fg_value: str = "de",
                      min_df_fg: int = 5, k: int = 10,
                      fg_doc_ids=None) -> ray.data.Dataset:
    """ES ``significant_terms`` aggregation: terms over-represented in a
    FOREGROUND slice (``fg_col == fg_value``) vs the whole corpus,
    scored by exact-integer lift
    ``(df_fg / n_fg) / (df / n_docs)`` in e6 fixed-point (round-half-up
    computed entirely in int64 — no float division anywhere, so the
    ranking is bit-identical to the SQL oracle).

    ONE corpus pass: each batch emits per-term partial (df, df_fg)
    counts plus a sentinel row carrying the batch's (n_docs, n_fg);
    only vocab-sized partials shuffle.  -> top-k
    (term, df_fg, df, lift_e6) by (lift desc, df_fg desc, term asc).

    ``fg_doc_ids`` (an int64 id array) replaces the column predicate
    with an explicit foreground doc set — e.g. the docs matching a
    query term (the "related searches" use: postings give the
    df-bounded foreground, broadcast once via ``ray.put``)."""
    import ray
    _SENT = "\x00__docs__"
    fg_ref = ray.put(pa.array(fg_doc_ids, pa.int64())) \
        if fg_doc_ids is not None else None

    def partial(batch: pa.Table) -> pa.Table:
        from onestools_eventlog_ray.functions.analyzer import doc_term_table
        b = add_doc_id(batch, spec)
        triples, _ = doc_term_table(b["doc_id"], b["content"])
        if fg_ref is not None:
            fg_mask = pc.is_in(b["doc_id"], value_set=ray.get(fg_ref))
        else:
            fg_mask = pc.equal(batch[fg_col], fg_value)
        fg_ids = pa.table({"doc_id": batch[spec.id_col or "doc_id"]}) \
            .filter(fg_mask)["doc_id"]
        in_fg = pc.is_in(triples["doc_id"], value_set=fg_ids.combine_chunks())
        agg = pa.table({
            "term": triples["term"],
            "one": pa.array(np.ones(triples.num_rows, np.int64)),
            "fg": pc.cast(in_fg, pa.int64()),
        }).group_by("term").aggregate([("one", "sum"), ("fg", "sum")])
        agg = agg.rename_columns(["term", "df_p", "fg_p"])
        sent = pa.table({
            "term": pa.array([_SENT], pa.string()),
            "df_p": pa.array([batch.num_rows], pa.int64()),
            "fg_p": pa.array([int(pc.sum(pc.cast(fg_mask, pa.int64())).as_py()
                                  or 0)], pa.int64()),
        })
        return pa.concat_tables([agg, sent])

    folded = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("term") \
        .aggregate(Sum("df_p", alias_name="df"),
                   Sum("fg_p", alias_name="df_fg"))

    def finalize(batch: pa.Table) -> pa.Table:
        terms = np.asarray(batch["term"].to_pylist(), dtype=object)
        df = batch["df"].to_numpy(zero_copy_only=False).astype(np.int64)
        dfg = batch["df_fg"].to_numpy(zero_copy_only=False).astype(np.int64)
        sent = terms == _SENT
        n_docs = int(df[sent][0])
        n_fg = int(dfg[sent][0])
        m = (~sent) & (dfg >= min_df_fg) & (df > 0)
        terms, df, dfg = terms[m], df[m], dfg[m]
        # round-half-up of (dfg*n_docs)/(n_fg*df) * 1e6, pure int64
        num = 2 * dfg * n_docs * 1_000_000 + n_fg * df
        lift = num // (2 * n_fg * df)
        t_np = terms.astype(np.str_)
        order = np.lexsort((t_np, -dfg, -lift))[:k]
        return pa.table({
            "term": pa.array(terms[order], pa.string()),
            "df_fg": pa.array(dfg[order], pa.int64()),
            "df": pa.array(df[order], pa.int64()),
            "lift_e6": pa.array(lift[order], pa.int64()),
        })

    # the fold is vocab-sized: one final task ranks it
    return folded.repartition(1).map_batches(finalize, batch_format="pyarrow")


def doclen_histogram(ds: ray.data.Dataset,
                     spec: CorpusSpec = DOCUMENTS_SPEC,
                     bin_width: int = 32) -> ray.data.Dataset:
    """Document token-length histogram: (bin_lo, n_docs) with
    ``bin_lo = (n_tokens // bin_width) * bin_width`` — the length-
    distribution profile every corpus-curation pass starts from (and the
    input to length-based quality cuts).  Empty docs land in bin 0.

    Mergeable by construction: per-batch (bin, count) partials (one
    np.unique over integer bins) then a tiny groupby-sum over
    ~n_bins * n_batches rows — the corpus never shuffles."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        from onestools_eventlog_ray.functions.analyzer import doc_term_table
        from onestools_eventlog_ray.functions.runtime import pin_worker_threads
        pin_worker_threads()
        b = add_doc_id(batch, spec)
        _, stats = doc_term_table(b["doc_id"], b["content"])
        dl = stats["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
        bins, counts = np.unique((dl // bin_width) * bin_width,
                                 return_counts=True)
        return pa.table({"bin_lo": pa.array(bins, pa.int64()),
                         "n_p": pa.array(counts.astype(np.int64), pa.int64())})

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("bin_lo").aggregate(Sum("n_p", alias_name="n_docs")) \
        .sort("bin_lo")


def chunk_assignments(ds: ray.data.Dataset,
                      spec: CorpusSpec = DOCUMENTS_SPEC,
                      budget: int = 2048, range_bits: int = 6
                      ) -> ray.data.Dataset:
    """GPT-style concat-and-chunk sequence packing: documents are laid
    end-to-end in doc_id order and cut every ``budget`` tokens; each doc
    is assigned the chunk its FIRST token lands in
    (``chunk_id = exclusive_prefix_sum(n_tokens) // budget``) — the
    sequence-packing step of a pretraining data pipeline.

    This is a distributed ORDERED PREFIX SUM (scan), a primitive the
    Dataset API lacks: doc_ids are uniform 63-bit hashes, so their top
    ``range_bits`` bits split the id space into equal ranges that are
    also CONTIGUOUS in the global order.  Pass 1 folds per-range token
    totals (tiny — 2^range_bits rows); the driver exclusive-scans those
    into per-range offsets and broadcasts them; pass 2 sorts each range
    locally and adds its offset.  One corpus tokenize (materialized
    narrow (doc_id, n) rows), one tiny fold, one bounded-group shuffle.
    -> (doc_id, chunk_id) — bit-identical to the SQL window
    ``sum(n) OVER (ORDER BY doc_id ROWS ... 1 PRECEDING) // budget``."""
    import ray
    shift = 63 - range_bits

    def per_doc(batch: pa.Table) -> pa.Table:
        from onestools_eventlog_ray.functions.analyzer import doc_term_table
        b = add_doc_id(batch, spec)
        _, stats = doc_term_table(b["doc_id"], b["content"])
        doc = stats["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "doc_id": stats["doc_id"],
            "n": stats["n_tokens"].cast(pa.int64()),
            "r": pa.array(doc >> shift, pa.int64()),
        })

    narrow = ds.map_batches(per_doc, batch_format="pyarrow").materialize()

    def range_partial(batch: pa.Table) -> pa.Table:
        r = batch["r"].to_numpy(zero_copy_only=False)
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        keys, inv = np.unique(r, return_inverse=True)
        tot = np.zeros(keys.size, dtype=np.int64)
        np.add.at(tot, inv, n)
        return pa.table({"r": pa.array(keys, pa.int64()),
                         "tot_p": pa.array(tot, pa.int64())})

    from ray.data.aggregate import Sum
    folded = narrow.map_batches(range_partial, batch_format="pyarrow") \
        .groupby("r").aggregate(Sum("tot_p", alias_name="tot")).take_all()
    by_r = dict(sorted((int(x["r"]), int(x["tot"])) for x in folded))
    offsets, acc = {}, 0
    for r, tot in by_r.items():
        offsets[r] = acc
        acc += tot
    off_ref = ray.put(offsets)

    def assign(group: pa.Table) -> pa.Table:
        offs = ray.get(off_ref)
        doc = group["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = group["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(doc, kind="stable")
        cum = np.concatenate([[0], np.cumsum(n[order], dtype=np.int64)[:-1]])
        cum += offs.get(int(doc[order[0]]) >> shift, 0) if doc.size else 0
        chunk = cum // budget
        inv = np.empty_like(order)
        inv[order] = np.arange(order.size)
        return pa.table({
            "doc_id": group["doc_id"],
            "chunk_id": pa.array(chunk[inv], pa.int64()),
        })

    return narrow.groupby("r").map_groups(assign, batch_format="pyarrow")


def _trunc_div(a: np.ndarray, b: np.ndarray | int) -> np.ndarray:
    """Integer division truncating toward zero — DuckDB ``//`` semantics
    (``-9 // 2 = -4`` there, while numpy/Python floor to -5)."""
    a = np.asarray(a, dtype=np.int64)
    return np.where(a >= 0, a // b, -((-a) // b)).astype(np.int64)


def quality_filter_counts(ds: ray.data.Dataset,
                          spec: CorpusSpec = DOCUMENTS_SPEC,
                          by: str = "lang", pct: int = 75) -> pa.Table:
    """Two-stage dependent pipeline: keep only docs whose unigram-LM
    quality (mean token log-prob, e6 fixed point, trunc-div) is at or
    above the corpus's EXACT ``pct``-th percentile, then count the
    survivors per ``by`` — the CCNet-style 'keep the head of the
    perplexity distribution' cut.

    The threshold is the exact order statistic, computed WITHOUT a
    global sort: per-batch (score, count) partials fold to a
    distinct-value table (bounded by score cardinality; at 10^12 docs
    swap in the mergeable histogram sketch for an approximate cut —
    same pipeline shape), the driver walks the cumulative counts to the
    percentile_disc index, and the broadcast threshold gates a final
    streaming count.  -> (by, n_kept) sorted."""
    import ray
    from ray.data.aggregate import Sum

    lm = lm_scores(ds, spec, extra_cols=(by,)).materialize()

    def qscore(batch: pa.Table) -> pa.Table:
        dl = batch["dl"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = dl > 0
        s = batch["sum_lp_e6"].to_numpy(zero_copy_only=False)[keep]
        q = _trunc_div(s, dl[keep])
        return pa.table({by: batch[by].filter(pa.array(keep)),
                         "q": pa.array(q, pa.int64())})

    scored = lm.map_batches(qscore, batch_format="pyarrow").materialize()

    def val_partial(batch: pa.Table) -> pa.Table:
        vals, counts = np.unique(
            batch["q"].to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table({"q": pa.array(vals, pa.int64()),
                         "c_p": pa.array(counts.astype(np.int64),
                                         pa.int64())})

    folded = scored.map_batches(val_partial, batch_format="pyarrow") \
        .groupby("q").aggregate(Sum("c_p", alias_name="c")).take_all()
    pairs = sorted((int(r["q"]), int(r["c"])) for r in folded)
    n = sum(c for _, c in pairs)
    k = (pct * n + 99) // 100            # 1-based percentile_disc index
    acc = 0
    thr = pairs[-1][0] if pairs else 0
    for v, c in pairs:
        acc += c
        if acc >= k:
            thr = v
            break

    def count_kept(batch: pa.Table) -> pa.Table:
        keep = batch["q"].to_numpy(zero_copy_only=False) >= thr
        sub = batch.filter(pa.array(keep)).select([by])
        g = sub.group_by(by).aggregate([([], "count_all")])
        return pa.table({by: g[by],
                         "n_p": g["count_all"].cast(pa.int64())})

    return scored.map_batches(count_kept, batch_format="pyarrow") \
        .groupby(by).aggregate(Sum("n_p", alias_name="n_kept")).sort(by)


def bigram_coherence(ds: ray.data.Dataset,
                     spec: CorpusSpec = DOCUMENTS_SPEC) -> ray.data.Dataset:
    """Count-based bigram LM scoring (the KenLM-shaped quality signal
    one tier above :func:`lm_scores`'s unigram model): per doc the mean
    add-one-smoothed conditional probability of its token transitions,

        p(b|a) = (c(ab) + 1) / (c(a) + V)

    in EXACT e6 fixed point (each transition's probability is an
    integer ``(c_ab+1)*1e6 // (c_a+V)`` before summing, so the per-doc
    mean is order-free and bit-identical to the SQL oracle).

    Two passes: the bigram + unigram count fold (vocabulary-sized
    result) broadcast once via ``ray.put`` — bounded-vocab corpora
    (code, logs) fit comfortably; an open-vocabulary web corpus swaps
    the broadcast for a hash-partitioned join of the SAME partials —
    then one streaming scoring pass (two ``index_in`` lookups + segment
    sums, no shuffle).  -> (doc_id, n_bigrams, coherence_e6), dl>=2
    docs only."""
    import ray

    big = bigram_stats(ds, spec).to_pandas()
    uni = term_stats(ds, spec).to_pandas()
    V = len(uni)
    lookup_ref = ray.put((
        pa.array(big["bigram"], pa.string()),
        big["n"].to_numpy().astype(np.int64),
        pa.array(uni["term"], pa.string()),
        uni["cf"].to_numpy().astype(np.int64),
    ))

    def fn(batch: pa.Table) -> pa.Table:
        from onestools_eventlog_ray.functions.runtime import pin_worker_threads
        pin_worker_threads()
        bg_arr, bg_n, t_arr, t_cf = ray.get(lookup_ref)
        b = add_doc_id(batch, spec)
        toks = tokenize_array(b["content"])
        flat = toks.flatten()
        n_flat = len(flat)
        dl = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
               .astype(np.int64)
        keep_doc = dl >= 2
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "n_bigrams": pa.array([], pa.int64()),
                          "coherence_e6": pa.array([], pa.int64())})
        if n_flat < 2 or not keep_doc.any():
            return empty
        parent = np.repeat(np.arange(dl.size, dtype=np.int64), dl)
        same = parent[:-1] == parent[1:]
        w = n_flat - 1
        joined = pc.binary_join_element_wise(
            flat.slice(0, w), flat.slice(1, w),
            pa.scalar(" ", flat.type))   # sep type must match (large_)string
        bsel = pa.array(same)
        bigrams = joined.filter(bsel)
        firsts = flat.slice(0, w).filter(bsel)
        bparent = parent[:-1][same]
        c_ab = bg_n[pc.index_in(bigrams, value_set=bg_arr)
                    .to_numpy(zero_copy_only=False).astype(np.int64)]
        c_a = t_cf[pc.index_in(firsts, value_set=t_arr)
                   .to_numpy(zero_copy_only=False).astype(np.int64)]
        p_e6 = ((c_ab + 1) * 1_000_000) // (c_a + V)
        sums = np.zeros(dl.size, dtype=np.int64)
        np.add.at(sums, bparent, p_e6)
        nb = dl - 1
        doc = b["doc_id"].to_numpy(zero_copy_only=False)[keep_doc]
        return pa.table({
            "doc_id": pa.array(doc, pa.int64()),
            "n_bigrams": pa.array(nb[keep_doc], pa.int64()),
            "coherence_e6": pa.array(sums[keep_doc] // nb[keep_doc],
                                     pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def winnowed_fingerprints(ds: ray.data.Dataset,
                          spec: CorpusSpec = DOCUMENTS_SPEC,
                          k: int = 4, w: int = 5,
                          base: int = 1_000_003) -> ray.data.Dataset:
    """Winnowing (the MOSS robust-fingerprint scheme): per doc, the
    DISTINCT minima of every ``w``-window over the doc's ``k``-gram
    rolling hashes — the guarantee-bearing subset of
    :func:`rolling_fingerprint`'s single whole-doc hash (any shared
    substring of length >= w+k-1 yields a shared selected fingerprint).
    Docs with fewer than ``w`` k-grams select their single global min;
    docs with < ``k`` tokens emit nothing.

    Vectorized end-to-end: exact mod-(2^61-1) k-gram hashes from k
    shifted views (k-1 ``mulmod`` passes), sliding-window minima from
    ``sliding_window_view`` with cross-doc windows masked, per-doc
    distinct via one (parent, value) unique.  No shuffle; the summary
    ``(n_grams, n_selected, sel_sum = Σ distinct minima mod p)`` keeps
    the output narrow while staying bit-checkable against the SQL
    window-function oracle.  -> (doc_id, n_grams, n_selected, sel_sum).
    """
    from onestools_eventlog_ray.functions.fasthash import (MERSENNE61,
                                                           md5_lower64,
                                                           mulmod_p61)

    def fn(batch: pa.Table) -> pa.Table:
        from onestools_eventlog_ray.functions.runtime import pin_worker_threads
        pin_worker_threads()
        b = add_doc_id(batch, spec)
        toks = tokenize_array(b["content"])
        offsets = np.asarray(toks.offsets.to_numpy(zero_copy_only=False),
                             dtype=np.int64)
        offsets = offsets - offsets[0]
        dl = np.diff(offsets)
        doc_ids = b["doc_id"].to_numpy(zero_copy_only=False)
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "n_grams": pa.array([], pa.int64()),
                          "n_selected": pa.array([], pa.int64()),
                          "sel_sum": pa.array([], pa.int64())})
        flat = toks.flatten()
        if len(flat) < k or not (dl >= k).any():
            return empty
        d = flat.dictionary_encode()
        uh = md5_lower64(d.dictionary) % MERSENNE61
        idx = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        th = uh[idx]                                   # token hashes < p
        n_flat = th.size
        # k-gram hash at flat position g: poly fold of th[g..g+k-1]
        ng_flat = n_flat - k + 1
        hg = th[:ng_flat].copy()
        for j in range(1, k):
            hg = (mulmod_p61(hg, base) + th[j:j + ng_flat]) % MERSENNE61
        parent = np.repeat(np.arange(dl.size, dtype=np.int64), dl)
        gram_ok = parent[:ng_flat] == parent[k - 1:k - 1 + ng_flat]
        # full w-windows entirely inside one doc
        sel_parent_parts, sel_val_parts = [], []
        if ng_flat >= w:
            win = np.lib.stride_tricks.sliding_window_view(hg, w)
            full = (parent[:win.shape[0]]
                    == parent[w + k - 2:w + k - 2 + win.shape[0]])
            if full.any():
                sel_val_parts.append(win[full].min(axis=1))
                sel_parent_parts.append(parent[:win.shape[0]][full])
        # small docs (k <= dl < w + k - 1): single global-min window
        n_grams_doc = np.maximum(dl - k + 1, 0)
        small = (n_grams_doc >= 1) & (n_grams_doc < w)
        if small.any():
            gram_parent = parent[:ng_flat][gram_ok]
            gram_vals = hg[gram_ok]
            # grams are already parent-ordered (flat token order); one
            # reduceat over per-parent run starts = per-doc global min
            upar, first = np.unique(gram_parent, return_index=True)
            if upar.size:
                mins_all = np.minimum.reduceat(gram_vals, first)
                m = small[upar]
                sel_val_parts.append(mins_all[m])
                sel_parent_parts.append(upar[m])
        if not sel_val_parts:
            return empty
        sp = np.concatenate(sel_parent_parts).astype(np.int64)
        # mulmod works in uint64; values are < 2^61 so int64 is lossless
        # (mixing dtypes in np.stack would promote to float64 and corrupt)
        sv = np.concatenate(sel_val_parts).astype(np.int64)
        pairs = np.unique(np.stack([sp, sv], axis=1), axis=0)
        up, counts = np.unique(pairs[:, 0], return_counts=True)
        cuts = np.concatenate([[0], np.cumsum(counts)])
        vals = pairs[:, 1]
        # int(MERSENNE61): a Python-int % np.uint64 silently promotes to
        # float64 and corrupts the low bits of 61-bit sums
        p_int = int(MERSENNE61)
        sel_sum = np.asarray(
            [int(np.sum(vals[cuts[i]:cuts[i + 1]], dtype=object)) % p_int
             for i in range(up.size)], dtype=np.int64)
        return pa.table({
            "doc_id": pa.array(doc_ids[up], pa.int64()),
            "n_grams": pa.array(n_grams_doc[up], pa.int64()),
            "n_selected": pa.array(counts.astype(np.int64), pa.int64()),
            "sel_sum": pa.array(sel_sum, pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def substring_scan(ds: ray.data.Dataset, needle: str,
                   spec: CorpusSpec = DOCUMENTS_SPEC) -> ray.data.Dataset:
    """Raw SUBSTRING search over document bodies (ES ``wildcard`` /
    ``*infix*`` on an unanalyzed field — matches ACROSS token
    boundaries, which no inverted-index query can): a streaming
    full-scan filter with a vectorized Arrow kernel per batch, counting
    occurrences per matching doc.  ES executes exactly this shape (a
    doc-values scan) for leading-wildcard queries; at 100 TB it is an
    honest column-pruned corpus scan with no shuffle at all.
    -> (doc_id, n_occurrences) for docs with >= 1 match."""

    def fn(batch: pa.Table) -> pa.Table:
        b = add_doc_id(batch, spec)
        content = b["content"]
        if isinstance(content, pa.ChunkedArray):
            content = content.combine_chunks()
        n = pc.cast(pc.count_substring(content, pattern=needle), pa.int64())
        keep = pc.greater(n, 0)
        return pa.table({
            "doc_id": b["doc_id"].filter(keep),
            "n_occurrences": n.filter(keep),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def bigram_lift_topk(ds: ray.data.Dataset,
                     spec: CorpusSpec = DOCUMENTS_SPEC,
                     min_count: int = 5, k: int = 20) -> pa.Table:
    """Collocation mining by exact-integer LIFT (the PMI ranking without
    the float log): for bigrams with count >= ``min_count``,

        lift_e6 = (c(ab) * total_unigrams * 1e6) // (c(a) * c(b))

    — monotone in PMI, computed entirely in integers so the ranking is
    bit-identical to the SQL oracle.  Reuses the bigram/unigram partial
    folds (vocabulary-sized); the top-k cut runs on the folded table.
    -> (bigram, n, lift_e6) by (lift desc, n desc, bigram asc)."""
    big = bigram_stats(ds, spec).to_pandas()
    uni = term_stats(ds, spec).to_pandas()
    total = int(uni["cf"].sum())
    cf = dict(zip(uni["term"], uni["cf"].astype(int)))
    big = big[big["n"] >= min_count]
    rows = []
    for bg, n in zip(big["bigram"], big["n"].astype(int)):
        a, b = bg.split(" ", 1)
        lift = (n * total * 1_000_000) // (cf[a] * cf[b])
        rows.append((bg, n, lift))
    rows.sort(key=lambda r: (-r[2], -r[1], r[0]))
    rows = rows[:k]
    return pa.table({
        "bigram": pa.array([r[0] for r in rows], pa.string()),
        "n": pa.array([r[1] for r in rows], pa.int64()),
        "lift_e6": pa.array([r[2] for r in rows], pa.int64()),
    })


def percolate(ds: ray.data.Dataset, queries: dict[str, list[str]],
              spec: CorpusSpec = DOCUMENTS_SPEC) -> ray.data.Dataset:
    """ES PERCOLATOR (reverse search): the stored QUERIES are the index,
    each incoming document is matched against all of them — the alerting
    / routing primitive (which saved searches does this doc trigger?).
    A doc matches a query when it contains ALL the query's terms
    (bool-must).

    The query set is small by construction (alert rules): broadcast
    once; per batch, ONE ``is_in`` mask per distinct query term and an
    integer per-(doc, query) hit-count fold — vectorized, no shuffle,
    corpus streams through once.  -> (doc_id, query_name) match pairs.
    """
    import ray
    qnames = sorted(queries)
    def _norm(rule):
        # list[str] = bool-must; {"must": [...], "must_not": [...]} adds
        # exclusions ("password" but not "test" — the alert-rule shape)
        if isinstance(rule, dict):
            return (sorted(set(rule.get("must", ()))),
                    sorted(set(rule.get("must_not", ()))))
        return (sorted(set(rule)), [])

    qterms = {q: _norm(queries[q]) for q in qnames}
    ref = ray.put(qterms)

    def fn(batch: pa.Table) -> pa.Table:
        qt = ray.get(ref)
        b = add_doc_id(batch, spec)
        toks = tokenize_array(b["content"])
        flat = toks.flatten()
        parents = pc.list_parent_indices(toks) \
            .to_numpy(zero_copy_only=False)
        n = len(toks)
        doc = b["doc_id"].to_numpy(zero_copy_only=False)

        def seen_mask(t: str) -> np.ndarray:
            m = pc.equal(flat, t).to_numpy(zero_copy_only=False)
            seen = np.zeros(n, dtype=bool)
            if parents.size:
                np.logical_or.at(seen, parents, m)
            return seen

        out_d, out_q = [], []
        for qname in sorted(qt):
            terms, excl = qt[qname]
            hit = np.zeros(n, dtype=np.int64)
            for t in terms:
                hit += seen_mask(t)
            matched = hit == len(terms)
            for t in excl:
                matched &= ~seen_mask(t)
            out_d.append(doc[matched])
            out_q.extend([qname] * int(matched.sum()))
        return pa.table({
            "doc_id": pa.array(np.concatenate(out_d) if out_d
                               else np.empty(0, np.int64), pa.int64()),
            "query_name": pa.array(out_q, pa.string()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def top_terms_per_lang(ds: ray.data.Dataset,
                       spec: CorpusSpec = DOCUMENTS_SPEC,
                       k: int = 5) -> ray.data.Dataset:
    """Grouped heavy-hitters: the top ``k`` terms by occurrence count
    WITHIN each lang (the per-domain vocabulary profile a corpus-mix
    report shows).  Two-level fold: per-batch (lang, term, n) partials
    (Acero group_by — only the batch vocabulary shuffles), a tiny
    groupby sum, then a per-lang top-k cut.
    -> (lang, rank, term, n) by (lang, rank)."""
    from ray.data.aggregate import Sum as RSum

    def partial(batch: pa.Table) -> pa.Table:
        toks = tokenize_array(batch[spec.content_col])
        flat = toks.flatten()
        parents = pc.list_parent_indices(toks)
        lang = batch["lang"]
        if isinstance(lang, pa.ChunkedArray):
            lang = lang.combine_chunks()
        t = pa.table({"lang": lang.take(parents), "term": flat})
        g = t.group_by(["lang", "term"]).aggregate([([], "count_all")])
        return pa.table({"lang": g["lang"], "term": g["term"],
                         "n_p": g["count_all"].cast(pa.int64())})

    folded = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["lang", "term"]).aggregate(RSum("n_p", alias_name="n"))

    def topk(g: pa.Table) -> pa.Table:
        n = g["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        terms = g["term"].to_numpy(zero_copy_only=False)
        order = np.lexsort((terms, -n))[:k]
        return pa.table({
            "lang": pa.array([g["lang"][0].as_py()] * order.size,
                             pa.string()),
            "rank": pa.array(np.arange(1, order.size + 1), pa.int64()),
            "term": pa.array(terms[order], pa.string()),
            "n": pa.array(n[order], pa.int64()),
        })

    return folded.groupby("lang").map_groups(topk, batch_format="pyarrow") \
        .sort(["lang", "rank"])


def oov_stats(ds: ray.data.Dataset,
              spec: CorpusSpec = DOCUMENTS_SPEC,
              vocab_size: int = 10,
              by: str = "lang") -> pa.Table:
    """Tokenizer-vocabulary coverage: fix the vocabulary to the top
    ``vocab_size`` terms by collection frequency (ties cf desc, term
    asc — the deterministic stand-in for a trained tokenizer's vocab),
    then report per-``by``-group token counts, out-of-vocabulary token
    counts and the OOV rate — the coverage check run before committing
    a tokenizer to a corpus mix.

    Two streaming passes: the :func:`term_stats` fold (vocabulary-sized
    shuffle) -> tiny top-V cut -> ``ray.put`` broadcast -> per-batch
    vectorized ``pc.is_in`` + Acero group partials -> group-count fold.
    ``oov_e6 = n_oov * 1e6 // n_tokens``.
    -> (by, n_tokens, n_oov, oov_e6) sorted by group."""
    import ray
    from ray.data.aggregate import Sum as RSum

    ts = term_stats(ds, spec).take_all()
    ts.sort(key=lambda r: (-int(r["cf"]), r["term"]))
    vocab = pa.array([r["term"] for r in ts[:vocab_size]], pa.string())
    vref = ray.put(vocab)

    def partial(batch: pa.Table) -> pa.Table:
        v = ray.get(vref)
        toks = tokenize_array(batch[spec.content_col])
        flat = toks.flatten()
        parents = pc.list_parent_indices(toks)
        grp = batch[by]
        if isinstance(grp, pa.ChunkedArray):
            grp = grp.combine_chunks()
        oov = pc.invert(pc.is_in(flat, value_set=v))
        t = pa.table({
            by: grp.take(parents),
            "one": pa.array(np.ones(len(flat), np.int64), pa.int64()),
            "oov": pa.array(oov.to_numpy(zero_copy_only=False)
                            .astype(np.int64), pa.int64()),
        }).group_by(by).aggregate([("one", "sum"), ("oov", "sum")])
        return pa.table({by: t[by],
                         "nt_p": t["one_sum"].cast(pa.int64()),
                         "no_p": t["oov_sum"].cast(pa.int64())})

    rows = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(by).aggregate(RSum("nt_p", alias_name="n_tokens"),
                               RSum("no_p", alias_name="n_oov")) \
        .take_all()
    rows.sort(key=lambda r: r[by])
    nt = np.asarray([r["n_tokens"] for r in rows], dtype=np.int64)
    no = np.asarray([r["n_oov"] for r in rows], dtype=np.int64)
    return pa.table({
        by: pa.array([r[by] for r in rows], pa.string()),
        "n_tokens": pa.array(nt, pa.int64()),
        "n_oov": pa.array(no, pa.int64()),
        "oov_e6": pa.array(no * 1_000_000 // np.maximum(nt, 1), pa.int64()),
    })


def dsir_weights(ds: ray.data.Dataset,
                 spec: CorpusSpec = DOCUMENTS_SPEC,
                 target_col: str = "lang", target_value: str = "en",
                 n_buckets: int = 1024) -> ray.data.Dataset:
    """DSIR importance weights (Xie et al. 2023): score every document
    by how much its hashed-unigram profile looks like a TARGET slice
    (``target_col == target_value``) relative to the raw corpus — the
    importance-resampling selector a training-data pipeline uses to
    up-sample in-domain text.

    Feature space: token -> ``md5_lower64(token) % n_buckets`` (the
    same DuckDB-mirrorable md5 family as the sketches).  Bucket
    distributions use add-one smoothing; each bucket's log ratio
    ``ln((tgt_b+1)(R+B) / ((T+B)(raw_b+1)))`` is rounded to e6 FIRST,
    so the per-doc integer sum is order-free and bit-identical to the
    SQL oracle (same design as ``lm_scores``).  Exactness bound: the
    smoothed products must stay < 2^53 for the int->double cast to be
    exact — holds to ~10^15 tokens.

    Scale shape: pass 1 folds per-batch bucket-count partials
    (``n_buckets`` rows per batch) through one tiny groupby; the e6
    log-ratio LUT broadcasts via ``ray.put``; pass 2 streams the
    corpus once (no shuffle).  Zero-token docs are dropped (mirrors
    the oracle's join semantics).
    -> (doc_id, dl, weight_e6)."""
    import ray
    from onestools_eventlog_ray.functions.fasthash import md5_lower64

    def partial(batch: pa.Table) -> pa.Table:
        b = add_doc_id(batch, spec)
        toks = tokenize_array(b["content"])
        flat = toks.flatten()
        offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offsets = offsets - offsets[0]
        bk = (md5_lower64(flat) % np.uint64(n_buckets)).astype(np.int64)
        doc_tgt = pc.equal(batch[target_col], pa.scalar(target_value)) \
            .to_numpy(zero_copy_only=False)
        tok_tgt = np.repeat(doc_tgt, np.diff(offsets))
        raw = np.bincount(bk, minlength=n_buckets)
        tgt = np.bincount(bk[tok_tgt], minlength=n_buckets)
        return pa.table({
            "bucket": pa.array(np.arange(n_buckets, dtype=np.int64)),
            "raw_p": pa.array(raw.astype(np.int64), pa.int64()),
            "tgt_p": pa.array(tgt.astype(np.int64), pa.int64()),
        })

    folded = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("bucket").aggregate(Sum("raw_p", alias_name="raw"),
                                     Sum("tgt_p", alias_name="tgt")) \
        .take_all()
    raw = np.zeros(n_buckets, dtype=np.int64)
    tgt = np.zeros(n_buckets, dtype=np.int64)
    for r in folded:
        raw[int(r["bucket"])] = int(r["raw"])
        tgt[int(r["bucket"])] = int(r["tgt"])
    R, T = int(raw.sum()), int(tgt.sum())
    num = (tgt + 1) * (R + n_buckets)
    den = (T + n_buckets) * (raw + 1)
    lr_e6 = np.floor(np.log(num.astype(np.float64) / den.astype(np.float64))
                     * 1_000_000 + 0.5).astype(np.int64)
    lut_ref = ray.put(lr_e6)

    def score(batch: pa.Table) -> pa.Table:
        lut = ray.get(lut_ref)
        b = add_doc_id(batch, spec)
        toks = tokenize_array(b["content"])
        flat = toks.flatten()
        offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offsets = offsets - offsets[0]
        bk = (md5_lower64(flat) % np.uint64(n_buckets)).astype(np.int64)
        cs = np.concatenate([[0], np.cumsum(lut[bk], dtype=np.int64)])
        dl = np.diff(offsets)
        out = pa.table({
            "doc_id": b["doc_id"],
            "dl": pa.array(dl, pa.int64()),
            "weight_e6": pa.array(cs[offsets[1:]] - cs[offsets[:-1]],
                                  pa.int64()),
        })
        return out.filter(pa.array(dl > 0, pa.bool_()))

    return ds.map_batches(score, batch_format="pyarrow")


def bpe_pair_counts(ds: ray.data.Dataset,
                    spec: CorpusSpec = DOCUMENTS_SPEC,
                    k: int = 20) -> ray.data.Dataset:
    """The first BPE merge-learning step (Sennrich et al. 2016):
    corpus-wide counts of adjacent CHARACTER pairs inside analyzer
    tokens, top-``k`` by (count desc, pair asc) — iterating this (count
    pairs -> merge the argmax -> recount) trains a tokenizer; one step
    is the distributed primitive.

    Vectorized: each batch joins its tokens with a ``\\n`` sentinel
    (one C-level ``binary_join`` + one join), takes adjacent byte
    pairs from the flat uint8 view, masks pairs touching the sentinel,
    and folds to a <= 65536-bucket count vector — only (pair, count)
    rows shuffle, the groupby is alphabet^2-sized regardless of corpus
    size.  Tokens are single-byte ``[a-z0-9_]`` by analyzer
    construction."""

    def partial(batch: pa.Table) -> pa.Table:
        b = add_doc_id(batch, spec)
        toks = tokenize_array(b["content"])
        per_doc = pc.binary_join(toks, "\n")
        s = "\n".join(per_doc.to_pylist())
        buf = np.frombuffer(s.encode("utf-8"), np.uint8)
        if buf.size < 2:
            return pa.table({"pair": pa.array([], pa.string()),
                             "n_p": pa.array([], pa.int64())})
        a, c = buf[:-1], buf[1:]
        m = (a != 0x0A) & (c != 0x0A)
        codes = a[m].astype(np.int64) * 256 + c[m]
        counts = np.bincount(codes, minlength=65536)
        nz = np.flatnonzero(counts)
        pairs = [chr(int(p) >> 8) + chr(int(p) & 0xFF) for p in nz]
        return pa.table({"pair": pa.array(pairs, pa.string()),
                         "n_p": pa.array(counts[nz], pa.int64())})

    folded = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("pair").aggregate(Sum("n_p", alias_name="n"))

    def topk(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        pairs = np.asarray(batch["pair"].to_pylist(), dtype=np.str_)
        order = np.lexsort((pairs, -n))[:k]
        return pa.table({"pair": pa.array(pairs[order], pa.string()),
                         "n": pa.array(n[order], pa.int64())})

    return folded.repartition(1).map_batches(topk, batch_format="pyarrow")


def rag_chunks(ds: ray.data.Dataset,
               spec: CorpusSpec = DOCUMENTS_SPEC,
               size: int = 32, stride: int = 16,
               max_chunks: int = 64) -> ray.data.Dataset:
    """Sliding-window token chunking — the retrieval-corpus prep step
    (RAG / passage indexing): split every document into ``size``-token
    windows advancing by ``stride`` (the final short window is kept),
    fingerprinting each chunk so downstream dedup/indexing can key on
    it without re-shipping text.

    Vectorized per chunk INDEX, not per chunk: iteration ``c`` slices
    all docs at once (``pc.list_slice`` + ``binary_join``) and drops
    docs already exhausted, so the batch does ``O(max chunks/doc)``
    Arrow kernel calls regardless of row count.  One streaming pass, no
    shuffle.  -> (doc_id, chunk_id, n_tokens, chunk_h) where chunk_h =
    ``md5_lower64(tokens joined by ' ') >> 1``."""
    from onestools_eventlog_ray.functions.fasthash import md5_lower64

    def fn(batch: pa.Table) -> pa.Table:
        b = add_doc_id(batch, spec)
        toks = tokenize_array(b["content"])
        dl = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sep = pa.scalar(" ", toks.type.value_type)
        parts = []
        for c in range(max_chunks):
            start = c * stride
            alive = dl > start
            if not alive.any():
                break
            sl = pc.list_slice(toks, start, start + size)
            joined = pc.binary_join(sl, sep)
            keep = pa.array(alive)
            h = (md5_lower64(joined.filter(keep))
                 >> np.uint64(1)).astype(np.int64)
            parts.append(pa.table({
                "doc_id": b["doc_id"].filter(keep),
                "chunk_id": pa.array(
                    np.full(int(alive.sum()), c, dtype=np.int64)),
                "n_tokens": pa.array(
                    np.minimum(size, dl[alive] - start), pa.int64()),
                "chunk_h": pa.array(h, pa.int64()),
            }))
        if not parts:
            return pa.schema([("doc_id", pa.int64()),
                              ("chunk_id", pa.int64()),
                              ("n_tokens", pa.int64()),
                              ("chunk_h", pa.int64())]).empty_table()
        return pa.concat_tables(parts)

    return ds.map_batches(fn, batch_format="pyarrow")


def langid_trained(ds: ray.data.Dataset,
                   spec: CorpusSpec = DOCUMENTS_SPEC,
                   label_col: str = "lang", holdout_mod: int = 5,
                   profile_k: int = 20) -> pa.Table:
    """TRAINED language identification — the train/infer loop of a
    fastText-style classifier, model-free and exact: learn per-language
    character-trigram profiles from a deterministic training split
    (``doc_id % holdout_mod != 0``), then classify the held-out docs by
    distinct-trigram overlap with each profile.

    Pass 1 folds per-batch (lang, trigram, n) partials (alphabet^3-
    bounded); the driver cuts top-``profile_k`` trigrams per language
    (count desc, trigram asc — ascii code order == lexicographic) and
    broadcasts the tiny profile matrix.  Pass 2 streams the holdout
    docs, scoring all languages per doc with one ``isin`` + bincount —
    no shuffle.  Prediction tie-break: (overlap desc, lang asc), all
    languages scored (zero overlap included), bit-identical to the SQL
    oracle.  -> (doc_id, pred_lang, score)."""
    import ray
    from ray.data.aggregate import Sum as RSum

    def tri_codes(batch: pa.Table):
        """-> (doc_idx int64[], codes int64[]) trigram codes per doc."""
        toks = tokenize_array(batch[spec.content_col])
        per_doc = pc.binary_join(toks, pa.scalar("\n",
                                                 toks.type.value_type))
        lens = pc.binary_length(per_doc).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        s = "\n".join(per_doc.to_pylist())
        buf = np.frombuffer(s.encode("utf-8"), np.uint8)
        # byte -> owning doc (docs joined by one extra \n each)
        doc_of = np.repeat(np.arange(lens.size, dtype=np.int64), lens + 1)
        doc_of = doc_of[:buf.size]
        if buf.size < 3:
            return (np.empty(0, np.int64), np.empty(0, np.int64))
        a, b2, c = buf[:-2], buf[1:-1], buf[2:]
        m = (a != 0x0A) & (b2 != 0x0A) & (c != 0x0A)
        codes = (a[m].astype(np.int64) << 16) | (b2[m].astype(np.int64)
                                                 << 8) | c[m]
        return doc_of[:-2][m], codes

    def train_partial(batch: pa.Table) -> pa.Table:
        b = add_doc_id(batch, spec)
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        train = ids % holdout_mod != 0
        t = batch.filter(pa.array(train))
        if not t.num_rows:
            return pa.schema([("lang", pa.string()), ("tri", pa.int64()),
                              ("n_p", pa.int64())]).empty_table()
        doc_of, codes = tri_codes(t)
        langs = np.asarray(t[label_col].to_pylist(), dtype=object)
        uq, inv = np.unique(langs, return_inverse=True)
        key = inv[doc_of] * (1 << 24) + codes
        ku, kc = np.unique(key, return_counts=True)
        return pa.table({
            "lang": pa.array(uq[(ku >> 24)], pa.string()),
            "tri": pa.array((ku & ((1 << 24) - 1)).astype(np.int64)),
            "n_p": pa.array(kc.astype(np.int64), pa.int64()),
        })

    folded = ds.map_batches(train_partial, batch_format="pyarrow") \
        .groupby(["lang", "tri"]).aggregate(RSum("n_p", alias_name="n")) \
        .take_all()
    by_lang: dict[str, list] = {}
    for r in folded:
        by_lang.setdefault(str(r["lang"]), []).append(
            (-int(r["n"]), int(r["tri"])))
    langs = sorted(by_lang)
    profiles = {}
    for lg in langs:
        rows = sorted(by_lang[lg])[:profile_k]
        profiles[lg] = np.asarray(sorted(t for _, t in rows),
                                  dtype=np.int64)
    prof_ref = ray.put((langs, profiles))

    def infer(batch: pa.Table) -> pa.Table:
        lgs, prof = ray.get(prof_ref)
        b = add_doc_id(batch, spec)
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        hold = ids % holdout_mod == 0
        t = batch.filter(pa.array(hold))
        hid = ids[hold]
        n = hid.size
        if not n:
            return pa.schema([("doc_id", pa.int64()),
                              ("pred_lang", pa.string()),
                              ("score", pa.int64())]).empty_table()
        doc_of, codes = tri_codes(t)
        dk = np.unique(doc_of * (1 << 24) + codes)
        ddoc = (dk >> 24).astype(np.int64)
        dcode = (dk & ((1 << 24) - 1)).astype(np.int64)
        scores = np.zeros((n, len(lgs)), dtype=np.int64)
        for li, lg in enumerate(lgs):
            hit = np.isin(dcode, prof[lg])
            np.add.at(scores[:, li], ddoc[hit], 1)
        best = np.argmax(scores, axis=1)        # first max = lang asc
        return pa.table({
            "doc_id": pa.array(hid, pa.int64()),
            "pred_lang": pa.array([lgs[i] for i in best], pa.string()),
            "score": pa.array(scores[np.arange(n), best], pa.int64()),
        })

    return ds.map_batches(infer, batch_format="pyarrow")


def shared_chunk_pairs(ds: ray.data.Dataset,
                       spec: CorpusSpec = DOCUMENTS_SPEC,
                       size: int = 32, stride: int = 16,
                       min_shared: int = 1,
                       bucket_cap: int = 512) -> ray.data.Dataset:
    """Passage-level duplicate detection (the C4/RefinedWeb span-dedup
    shape): doc pairs sharing at least ``min_shared`` DISTINCT
    ``size``-token window fingerprints.  Catches copied passages that
    whole-doc MinHash dilutes away.

    Composition of :func:`rag_chunks` + the bucketed-pair pattern: only
    (chunk_h, doc_id) rows shuffle; each ``groupby(chunk_h)`` task
    emits its in-bucket doc pairs (chunk-split above ``bucket_cap``,
    same cap rule as the MinHash verify); a final pair-keyed fold
    counts distinct shared fingerprints.
    -> (doc_a < doc_b, n_shared)."""

    chunks = rag_chunks(ds, spec, size=size, stride=stride)

    def pairs_in_bucket(group: pa.Table) -> pa.Table:
        ids = np.unique(group["doc_id"].to_numpy(zero_copy_only=False)
                        .astype(np.int64))
        n = ids.size
        if n < 2:
            return pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()),
                              ("n_p", pa.int64())]).empty_table()
        da, db = [], []
        for c0 in range(0, n, bucket_cap):
            c1 = min(c0 + bucket_cap, n)
            iu, ju = np.triu_indices(c1 - c0, 1)
            da.append(ids[c0:c1][iu])
            db.append(ids[c0:c1][ju])
        a = np.concatenate(da)
        b = np.concatenate(db)
        return pa.table({"doc_a": pa.array(a, pa.int64()),
                         "doc_b": pa.array(b, pa.int64()),
                         "n_p": pa.array(np.ones(a.size, np.int64))})

    folded = chunks.groupby("chunk_h") \
        .map_groups(pairs_in_bucket, batch_format="pyarrow") \
        .groupby(["doc_a", "doc_b"]).aggregate(Sum("n_p",
                                                   alias_name="n_shared"))

    def support(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater_equal(batch["n_shared"],
                                             min_shared))

    return folded.map_batches(support, batch_format="pyarrow")


def frequent_term_pairs(ds: ray.data.Dataset,
                        spec: CorpusSpec = DOCUMENTS_SPEC,
                        min_support: int = 100) -> ray.data.Dataset:
    """Frequent-itemset mining at level 2 (market-basket over documents):
    every unordered TERM pair co-occurring in >= ``min_support`` docs.

    Each batch builds its boolean doc×vocab incidence matrix once and
    gets ALL pair counts from a single ``M.T @ M`` integer matmul — no
    per-doc pair loop; only nonzero (term_a < term_b, count) partials
    shuffle.  Assumes the per-batch vocabulary fits memory (true for
    code/token corpora); at open-web vocabulary scale, apriori-prune
    first (count singles, keep terms with df >= min_support) — the
    filter composes as one extra :func:`term_stats` broadcast."""

    def partial(batch: pa.Table) -> pa.Table:
        from onestools_eventlog_ray.functions.analyzer import doc_term_table
        b = add_doc_id(batch, spec)
        triples, _ = doc_term_table(b["doc_id"], b["content"])
        schema = pa.schema([("term_a", pa.string()),
                            ("term_b", pa.string()),
                            ("n_p", pa.int64())])
        if not triples.num_rows:
            return schema.empty_table()
        terms = triples["term"]
        if isinstance(terms, pa.ChunkedArray):
            terms = terms.combine_chunks()
        enc = terms.dictionary_encode()
        vocab = np.asarray(enc.dictionary.to_pylist(), dtype=object)
        tcode = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vorder = np.argsort(vocab.astype(np.str_), kind="stable")
        rank_of = np.empty(vorder.size, dtype=np.int64)
        rank_of[vorder] = np.arange(vorder.size)
        tcode = rank_of[tcode]                       # lexicographic codes
        vocab = vocab[vorder]
        docs = triples["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        _, dcode = np.unique(docs, return_inverse=True)
        m = np.zeros((int(dcode.max()) + 1, vocab.size), dtype=np.int64)
        m[dcode, tcode] = 1
        co = m.T @ m
        iu, ju = np.nonzero(np.triu(co, 1))
        return pa.table({
            "term_a": pa.array(vocab[iu], pa.string()),
            "term_b": pa.array(vocab[ju], pa.string()),
            "n_p": pa.array(co[iu, ju], pa.int64()),
        })

    folded = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["term_a", "term_b"]) \
        .aggregate(Sum("n_p", alias_name="n_docs"))

    def support(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater_equal(batch["n_docs"], min_support))

    return folded.map_batches(support, batch_format="pyarrow")


#: default weak-supervision rule sets: presence-voting keyword labeling
#: functions (the Snorkel pattern, deterministic and model-free).
WEAK_POS_TERMS = ("fast", "small")
WEAK_NEG_TERMS = ("slow", "dup")


def weak_labels(ds: ray.data.Dataset,
                spec: CorpusSpec = DOCUMENTS_SPEC,
                pos_terms: tuple[str, ...] = WEAK_POS_TERMS,
                neg_terms: tuple[str, ...] = WEAK_NEG_TERMS
                ) -> ray.data.Dataset:
    """Programmatic weak supervision (the Snorkel labeling-function
    pattern): each rule term votes by PRESENCE in the doc; majority of
    positive vs negative votes labels the doc, ties (including 0-0)
    abstain.  The cheap label pass that bootstraps a classifier's
    training set over an unlabeled corpus.

    One streaming pass, all set-membership kernels; no shuffle.
    -> (doc_id, n_pos, n_neg, label in {'pos','neg','abstain'})."""
    pos = pa.array(sorted(set(pos_terms)))
    neg = pa.array(sorted(set(neg_terms)))

    def fn(batch: pa.Table) -> pa.Table:
        from onestools_eventlog_ray.functions.analyzer import doc_term_table
        b = add_doc_id(batch, spec)
        triples, _ = doc_term_table(b["doc_id"], b["content"])
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        tdoc = triples["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        row_of = {int(d): i for i, d in enumerate(ids)}
        rows = np.asarray([row_of[int(d)] for d in tdoc], dtype=np.int64)
        n = ids.size
        npos = np.zeros(n, dtype=np.int64)
        nneg = np.zeros(n, dtype=np.int64)
        terms = triples["term"]
        if isinstance(terms, pa.ChunkedArray):
            terms = terms.combine_chunks()
        mp = pc.is_in(terms, value_set=pos).to_numpy(zero_copy_only=False)
        mn = pc.is_in(terms, value_set=neg).to_numpy(zero_copy_only=False)
        if rows.size:
            np.add.at(npos, rows, mp.astype(np.int64))
            np.add.at(nneg, rows, mn.astype(np.int64))
        label = np.where(npos > nneg, "pos",
                         np.where(nneg > npos, "neg", "abstain"))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_pos": pa.array(npos, pa.int64()),
            "n_neg": pa.array(nneg, pa.int64()),
            "label": pa.array(label.astype(object), pa.string()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def curriculum_phases(ds: ray.data.Dataset,
                      spec: CorpusSpec = DOCUMENTS_SPEC,
                      n_phases: int = 3) -> pa.Table:
    """Curriculum ordering for training: score each doc's difficulty as
    its mean token rarity (``Σ idf_e6(token) // n_tokens`` — exact
    ints, occurrences weighted) and cut the corpus into ``n_phases``
    equal-count phases by exact order statistics (phase 0 = easiest /
    most common vocabulary).  Zero-token docs are excluded.

    Two streaming passes around a vocab-sized broadcast (same shape as
    ``lm_scores``); the phase thresholds are exact rank statistics over
    the per-doc score list (one int64 per doc on the driver — at
    10^12 docs swap for the histogram-quantile cut, same convention as
    ``value_histogram``).  -> (doc_id, difficulty_e6, phase)."""
    import ray

    stats = term_stats(ds, spec).to_pandas()
    n_docs_total = ds.count()
    df = stats["df"].to_numpy().astype(np.float64)
    idf_e6 = np.floor(np.log(1 + (n_docs_total - df + 0.5) / (df + 0.5))
                      * 1_000_000 + 0.5).astype(np.int64)
    lut_ref = ray.put((pa.array(stats["term"], pa.string()), idf_e6))

    def score(batch: pa.Table) -> pa.Table:
        terms_arr, lut = ray.get(lut_ref)
        b = add_doc_id(batch, spec)
        toks = tokenize_array(b["content"])
        flat = toks.flatten()
        offsets = toks.offsets.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        offsets = offsets - offsets[0]
        pos = pc.index_in(flat, value_set=terms_arr) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        cs = np.concatenate([[0], np.cumsum(lut[pos], dtype=np.int64)])
        dl = np.diff(offsets)
        tot = cs[offsets[1:]] - cs[offsets[:-1]]
        keep = dl > 0
        return pa.table({
            "doc_id": b["doc_id"].filter(pa.array(keep)),
            "difficulty_e6": pa.array(tot[keep] // dl[keep], pa.int64()),
        })

    scored = ds.map_batches(score, batch_format="pyarrow").take_all()
    ids = np.asarray([r["doc_id"] for r in scored], dtype=np.int64)
    diff = np.asarray([r["difficulty_e6"] for r in scored],
                      dtype=np.int64)
    s = np.sort(diff)
    n = s.size
    # threshold p = value at 1-indexed rank ceil(p*n/n_phases)
    thresholds = [int(s[-(-(p + 1) * n // n_phases) - 1])
                  for p in range(n_phases - 1)]
    phase = np.zeros(n, dtype=np.int64)
    for t in thresholds:
        phase += (diff > t).astype(np.int64)
    order = np.argsort(ids, kind="stable")
    return pa.table({
        "doc_id": pa.array(ids[order], pa.int64()),
        "difficulty_e6": pa.array(diff[order], pa.int64()),
        "phase": pa.array(phase[order], pa.int64()),
    })


def langid_agreement(ds: ray.data.Dataset,
                     spec: CorpusSpec = DOCUMENTS_SPEC,
                     label_col: str = "lang") -> pa.Table:
    """Annotator-agreement report between the stopword language-ID
    heuristic (:func:`language_id`) and the labeled ``lang`` column:
    the full confusion matrix plus Cohen's kappa — the number that says
    whether a cheap labeling heuristic is usable for filtering.

    kappa is computed EXACTLY in integers over the confusion counts:
    ``kappa_e6 = trunc((n·agree − Σ row·col) · 1e6 / (n² − Σ row·col))``
    (trunc toward zero = DuckDB ``//``).  The confusion fold is
    label-cardinality-sized; one corpus pass.
    -> (pred_lang, true_lang, n_docs) rows plus a sentinel row
    ('__kappa__', '__kappa__', kappa_e6)."""
    from ray.data.aggregate import Sum as RSum

    def fn(batch: pa.Table) -> pa.Table:
        return pa.table({
            "pred_lang": language_id_batch(batch, spec),
            "true_lang": batch[label_col],
            "n_p": pa.array(np.ones(batch.num_rows, np.int64)),
        })

    folded = ds.map_batches(fn, batch_format="pyarrow") \
        .groupby(["pred_lang", "true_lang"]) \
        .aggregate(RSum("n_p", alias_name="n_docs")).take_all()
    rows = sorted(((str(r["pred_lang"]), str(r["true_lang"]),
                    int(r["n_docs"])) for r in folded))
    n = sum(c for _, _, c in rows)
    agree = sum(c for p, t, c in rows if p == t)
    labels = sorted({p for p, _, _ in rows} | {t for _, t, _ in rows})
    rsum = {lb: sum(c for p, _, c in rows if p == lb) for lb in labels}
    csum = {lb: sum(c for _, t, c in rows if t == lb) for lb in labels}
    pe_num = sum(rsum[lb] * csum[lb] for lb in labels)
    num = (n * agree - pe_num) * 10 ** 6
    den = n * n - pe_num
    q = abs(num) // den if den else 0
    kappa = -q if num < 0 else q
    rows.append(("__kappa__", "__kappa__", int(kappa)))
    return pa.table({
        "pred_lang": pa.array([r[0] for r in rows], pa.string()),
        "true_lang": pa.array([r[1] for r in rows], pa.string()),
        "n_docs": pa.array([r[2] for r in rows], pa.int64()),
    })


def language_id_batch(batch: pa.Table,
                      spec: CorpusSpec = DOCUMENTS_SPEC) -> pa.Array:
    """Batch-local form of :func:`language_id`'s prediction (shared by
    the agreement report so both stay in lock-step)."""
    profiles = {k: pa.array(sorted(v)) for k, v in LANG_PROFILES.items()
                if v}
    b = add_doc_id(batch, spec)
    toks = tokenize_array(b["content"])
    flat = toks.flatten()
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    n = len(toks)
    langs = sorted(profiles)
    hits = np.zeros((n, len(langs)), dtype=np.int64)
    for j, lang in enumerate(langs):
        m = pc.is_in(flat, value_set=profiles[lang]) \
            .to_numpy(zero_copy_only=False)
        if parents.size:
            np.add.at(hits[:, j], parents, m.astype(np.int64))
    best = np.argmax(hits, axis=1)
    best_hits = hits[np.arange(n), best]
    pred = np.where(best_hits > 0,
                    np.asarray(langs, dtype=object)[best], "und")
    return pa.array(pred.astype(object), pa.string())


def vocab_coverage(ds: ray.data.Dataset,
                   spec: CorpusSpec = DOCUMENTS_SPEC,
                   ks: tuple[int, ...] = (1, 10, 100, 1000)
                   ) -> pa.Table:
    """Zipf head coverage: the fraction of the token stream covered by
    the top-``k`` most frequent terms, for several ``k`` — the
    tokenizer-budget diagnostic (how much of the corpus a k-entry
    vocabulary explains).  Terms rank by (cf desc, term asc).

    One :func:`term_stats` fold; the rank cut runs on the vocab-sized
    table (at open-web vocabulary scale use the distributed two-level
    top-k of ``term_topk`` for the same cut).
    -> (k, covered_cf, coverage_e6)."""
    stats = term_stats(ds, spec).take_all()
    cf = np.asarray([int(r["cf"]) for r in stats], dtype=np.int64)
    terms = np.asarray([str(r["term"]) for r in stats], dtype=np.str_)
    total = int(cf.sum())
    order = np.lexsort((terms, -cf))
    csum = np.concatenate([[0], np.cumsum(cf[order], dtype=np.int64)])
    out_k, out_c, out_e = [], [], []
    for k in ks:
        c = int(csum[min(k, cf.size)])
        out_k.append(int(k))
        out_c.append(c)
        out_e.append(c * 10 ** 6 // total if total else 0)
    return pa.table({
        "k": pa.array(out_k, pa.int64()),
        "covered_cf": pa.array(out_c, pa.int64()),
        "coverage_e6": pa.array(out_e, pa.int64()),
    })


def shuffle_skew_report(ds: ray.data.Dataset,
                        spec: CorpusSpec = DOCUMENTS_SPEC,
                        k: int = 10) -> pa.Table:
    """Key-skew diagnosis for the posting-build shuffle: the top-``k``
    heaviest terms by cf, each with its exact e6 share of the token
    stream and the hot/mean ratio ``skew_e6 = cf * n_terms * 1e6 //
    total`` (1e6 = perfectly uniform) — the number that justifies (or
    retires) the salted exchange for a given corpus.

    One ``term_stats`` fold; the report cut is vocab-sized.
    -> (rank, term, cf, share_e6, skew_e6)."""
    stats = term_stats(ds, spec).take_all()
    cf = np.asarray([int(r["cf"]) for r in stats], dtype=np.int64)
    terms = np.asarray([str(r["term"]) for r in stats], dtype=np.str_)
    total = int(cf.sum())
    nt = cf.size
    order = np.lexsort((terms, -cf))[:k]
    return pa.table({
        "rank": pa.array(np.arange(1, order.size + 1), pa.int64()),
        "term": pa.array(terms[order], pa.string()),
        "cf": pa.array(cf[order], pa.int64()),
        "share_e6": pa.array(cf[order] * 10 ** 6 // max(total, 1),
                             pa.int64()),
        "skew_e6": pa.array(cf[order] * nt * 10 ** 6 // max(total, 1),
                            pa.int64()),
    })


def vocab_growth(ds: ray.data.Dataset,
                 spec: CorpusSpec = DOCUMENTS_SPEC,
                 cutoffs: tuple[int, ...] = (50, 100, 200, 400)
                 ) -> pa.Table:
    """Heaps-law vocabulary-growth curve: distinct vocabulary size
    after ingesting the first N docs (in doc_id order), for several N —
    the diagnostic that predicts dictionary memory at 10^12 files.

    One pass + one vocab-sized fold: each term's FIRST document
    (min doc_id) is a distributed ``Min`` aggregate; the curve is then
    a cumulative count over the tiny (term, first_doc) table — the
    stream never replays per cutoff.  Cutoffs are doc-id thresholds
    (the first N docs = doc_id < Nth-smallest id; with dense ids they
    coincide).  -> (n_docs, vocab_size)."""
    from ray.data.aggregate import Min as RMin

    def partial(batch: pa.Table) -> pa.Table:
        from onestools_eventlog_ray.functions.analyzer import doc_term_table
        b = add_doc_id(batch, spec)
        triples, _ = doc_term_table(b["doc_id"], b["content"])
        g = triples.select(["term", "doc_id"]).group_by("term") \
            .aggregate([("doc_id", "min")])
        return g.rename_columns(["term", "fd_p"])

    folded = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("term").aggregate(RMin("fd_p", alias_name="first_doc")) \
        .take_all()
    first = np.sort(np.asarray([int(r["first_doc"]) for r in folded],
                               dtype=np.int64))
    # Nth-smallest doc id = the id threshold for "first N docs"
    all_ids = np.sort(np.asarray(
        [r["doc_id"] for r in
         ds.select_columns([spec.id_col or "doc_id"]).take_all()],
        dtype=np.int64))
    out_n, out_v = [], []
    for n in cutoffs:
        if n <= 0 or n > all_ids.size:
            continue
        thr = int(all_ids[n - 1])
        out_n.append(int(n))
        out_v.append(int(np.searchsorted(first, thr, side="right")))
    return pa.table({"n_docs": pa.array(out_n, pa.int64()),
                     "vocab_size": pa.array(out_v, pa.int64())})


def len_vocab_corr(ds: ray.data.Dataset,
                   spec: CorpusSpec = DOCUMENTS_SPEC) -> pa.Table:
    """Corpus-shape diagnostic: the exact covariance between document
    LENGTH (tokens) and VOCABULARY (distinct terms) — near-linear means
    natural text, saturating means templated/repetitive docs (the
    Heaps exponent's per-doc cousin).

    Same hi/lo-limb integer-partial fold as ``matrix_stats`` (products
    fit int64 per row; limb sums stay safe past 10^12 docs); one
    streaming pass, one 1-row shuffle.  -> (n_docs, mean_dl_e6,
    mean_dt_e6, cov_e6, var_dl_e6, var_dt_e6); cov/var use the
    population formula trunc((n·Σxy − ΣxΣy) / n²)."""
    from ray.data.aggregate import Sum as RSum
    LIMB = np.int64(1_000_000_000)

    def partial(batch: pa.Table) -> pa.Table:
        from onestools_eventlog_ray.functions.analyzer import doc_term_table
        b = add_doc_id(batch, spec)
        _, stats = doc_term_table(b["doc_id"], b["content"])
        dl = stats["n_tokens"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        dt = stats["n_distinct_terms"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        prods = {"xy": dl * dt, "xx": dl * dl, "yy": dt * dt}
        cols = {"n_p": pa.array([len(dl)], pa.int64()),
                "sx_p": pa.array([int(dl.sum())], pa.int64()),
                "sy_p": pa.array([int(dt.sum())], pa.int64())}
        for k, v in prods.items():
            cols[f"{k}h_p"] = pa.array([int((v // LIMB).sum())], pa.int64())
            cols[f"{k}l_p"] = pa.array([int((v % LIMB).sum())], pa.int64())
        return pa.table(cols)

    names = ["n", "sx", "sy", "xyh", "xyl", "xxh", "xxl", "yyh", "yyl"]
    folded = ds.map_batches(partial, batch_format="pyarrow").aggregate(
        *[RSum(f"{nm}_p", alias_name=nm) for nm in names])
    n = int(folded["n"])
    sx, sy = int(folded["sx"]), int(folded["sy"])
    L = int(LIMB)
    xy = int(folded["xyh"]) * L + int(folded["xyl"])
    xx = int(folded["xxh"]) * L + int(folded["xxl"])
    yy = int(folded["yyh"]) * L + int(folded["yyl"])

    def trunc(a: int, b: int) -> int:
        q = abs(a) // b
        return -q if a < 0 else q

    return pa.table({
        "n_docs": pa.array([n], pa.int64()),
        "mean_dl_e6": pa.array([trunc(sx * 10 ** 6, n)], pa.int64()),
        "mean_dt_e6": pa.array([trunc(sy * 10 ** 6, n)], pa.int64()),
        "cov_e6": pa.array([trunc((n * xy - sx * sy) * 10 ** 6, n * n)],
                           pa.int64()),
        "var_dl_e6": pa.array([trunc((n * xx - sx * sx) * 10 ** 6, n * n)],
                              pa.int64()),
        "var_dt_e6": pa.array([trunc((n * yy - sy * sy) * 10 ** 6, n * n)],
                              pa.int64()),
    })


def stopword_share_by_lang(ds: ray.data.Dataset,
                           spec: CorpusSpec = DOCUMENTS_SPEC) -> pa.Table:
    """Per-language stopword density: the e6 share of tokens that are
    (English-profile) stopwords, by labeled lang — the quality-filter
    calibration view (a stopword-ratio threshold tuned on 'en' will
    misfire on other languages; this table shows by how much).

    One streaming pass of (lang, n_stop, n_tokens) partials; fold is
    language-cardinality-sized.  -> (lang, n_tokens, n_stop,
    stop_share_e6) by lang."""
    from ray.data.aggregate import Sum as RSum
    stop = pa.array(sorted(STOPWORDS))

    def partial(batch: pa.Table) -> pa.Table:
        toks = tokenize_array(batch[spec.content_col])
        flat = toks.flatten()
        dl = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        lang = np.repeat(np.asarray(batch["lang"].to_pylist(),
                                    dtype=object), dl)
        isstop = pc.is_in(flat, value_set=stop) \
            .to_numpy(zero_copy_only=False)
        t = pa.table({"lang": pa.array(lang, pa.string()),
                      "s": pa.array(isstop.astype(np.int64), pa.int64()),
                      "one": pa.array(np.ones(lang.size, np.int64))})
        g = t.group_by("lang").aggregate([("s", "sum"), ("one", "sum")])
        return g.rename_columns(["lang", "s_p", "n_p"])

    folded = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("lang").aggregate(RSum("s_p", alias_name="n_stop"),
                                   RSum("n_p", alias_name="n_tokens")) \
        .take_all()
    folded.sort(key=lambda r: r["lang"])
    return pa.table({
        "lang": pa.array([r["lang"] for r in folded], pa.string()),
        "n_tokens": pa.array([int(r["n_tokens"]) for r in folded],
                             pa.int64()),
        "n_stop": pa.array([int(r["n_stop"]) for r in folded],
                           pa.int64()),
        "stop_share_e6": pa.array(
            [int(r["n_stop"]) * 10 ** 6 // int(r["n_tokens"])
             if int(r["n_tokens"]) else 0 for r in folded], pa.int64()),
    })


def lang_fertility(ds: ray.data.Dataset,
                   spec: CorpusSpec = DOCUMENTS_SPEC,
                   lang_col: str = "lang",
                   chars_col: str = "n_chars") -> pa.Table:
    """Tokenizer fertility by language: characters per token, the metric
    that sizes a tokenizer's efficiency across languages before a
    pretraining run (high fertility = the language pays more sequence
    positions per unit of text).  One partial-per-batch pass (lang,
    sum_chars, sum_tokens) + a tiny driver fold — zero shuffles.
    -> (lang, n_docs, sum_chars, sum_tokens, fertility_e6) with
    fertility_e6 = trunc(sum_chars * 1e6 / sum_tokens)."""
    from onestools_eventlog_ray.functions.analyzer import doc_term_table

    def partial(batch: pa.Table) -> pa.Table:
        b = add_doc_id(batch, spec)
        _, stats = doc_term_table(b["doc_id"], b["content"])
        t = pa.table({
            "lang": batch[lang_col],
            "chars": pc.cast(batch[chars_col], pa.int64()),
            "toks": stats["n_tokens"],
        })
        agg = t.group_by("lang").aggregate(
            [("chars", "sum"), ("toks", "sum"), ("lang", "count")])
        return agg.rename_columns(["lang", "chars_p", "toks_p", "n_p"])

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    agg: dict[str, list[int]] = {}
    for r in rows:
        g = agg.setdefault(r["lang"], [0, 0, 0])
        g[0] += int(r["n_p"])
        g[1] += int(r["chars_p"])
        g[2] += int(r["toks_p"])
    keys = sorted(agg)
    return pa.table({
        "lang": pa.array(keys, pa.string()),
        "n_docs": pa.array([agg[k][0] for k in keys], pa.int64()),
        "sum_chars": pa.array([agg[k][1] for k in keys], pa.int64()),
        "sum_tokens": pa.array([agg[k][2] for k in keys], pa.int64()),
        "fertility_e6": pa.array(
            [agg[k][1] * 1_000_000 // agg[k][2] if agg[k][2] else None
             for k in keys], pa.int64()),
    })


#: (kind, RE2 pattern, replacement) — applied IN ORDER (email first so
#: its digits can't be re-matched by the phone pattern; both pyarrow and
#: DuckDB use RE2, so the oracle replicates the scrub byte-for-byte).
DEFAULT_PII_PATTERNS = (
    ("email", r"[a-zA-Z0-9._%+\-]+@[a-zA-Z0-9.\-]+\.[a-zA-Z]{2,}",
     "<EMAIL>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+[0-9][0-9 ()\-]{6,14}[0-9]", "<PHONE>"),
)


def pii_scrub(ds: ray.data.Dataset,
              spec: CorpusSpec = DOCUMENTS_SPEC,
              patterns=DEFAULT_PII_PATTERNS,
              keep_cols: tuple[str, ...] = ()) -> ray.data.Dataset:
    """PII redaction — the compliance pass every LLM training-data
    pipeline runs before text leaves the ingest boundary.  Each pattern
    is counted then replaced SEQUENTIALLY on the running text (so later
    patterns see earlier redactions; the oracle nests ``regexp_replace``
    in the same order).  Fully vectorized: one RE2 count + one RE2
    replace kernel per pattern per batch, zero shuffles, content never
    leaves its scan task.

    -> (doc_id, *keep_cols, n_<kind>... per-doc match counts, text
    [scrubbed]).  Swap ``patterns`` for an org's ruleset; a model-based
    NER scrubber slots in as an actor-pool stage like
    ``stages/multimodal.MediaFeatureExtractor``."""

    def scrub(batch: pa.Table) -> pa.Table:
        b = add_doc_id(batch, spec)
        txt = b["content"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        cols: dict = {"doc_id": b["doc_id"]}
        for c in keep_cols:
            cols[c] = batch[c]     # add_doc_id projects to (doc_id, content)
        for kind, pat, rep in patterns:
            cols[f"n_{kind}"] = pc.cast(
                pc.count_substring_regex(txt, pat), pa.int64())
            txt = pc.replace_substring_regex(txt, pat, rep)
        cols["text"] = txt
        return pa.table(cols)

    return ds.map_batches(scrub, batch_format="pyarrow")


def pii_scrub_report(ds: ray.data.Dataset,
                     spec: CorpusSpec = DOCUMENTS_SPEC,
                     patterns=DEFAULT_PII_PATTERNS,
                     by: str = "source") -> ray.data.Dataset:
    """Per-``by``-group scrub audit: doc count, per-kind match totals,
    and an order-free XOR digest of the SCRUBBED text (doc_id-keyed
    sha256 prefixes, the :func:`corpus_digest` rollup) — proving to the
    oracle that the redacted bytes, not just the counts, are identical.
    -> (source, n_docs, n_<kind>..., digest_hi32, digest_lo32)."""
    from onestools_eventlog_ray.functions.fasthash import sha256_hex_fast
    from onestools_eventlog_ray.functions.hashing import hex_prefix64

    scrubbed = pii_scrub(ds, spec, patterns, keep_cols=(by,))
    kinds = [k for k, _, _ in patterns]

    def partial(batch: pa.Table) -> pa.Table:
        h = hex_prefix64(sha256_hex_fast(batch["text"]))
        ids = batch["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64).view(np.uint64)
        t = pa.table({
            by: batch[by],
            "n_docs_p": pa.array(np.ones(batch.num_rows, np.int64)),
            **{f"n_{k}_p": batch[f"n_{k}"] for k in kinds},
            "dg": pa.array((h ^ ids).view(np.int64), pa.int64()),
        })
        # per-batch combine: sum counts, xor digests per group
        out: dict = {by: [], "n_docs_p": []}
        for k in kinds:
            out[f"n_{k}_p"] = []
        out["dg_p"] = []
        tt = t.sort_by(by)
        keys = tt[by].to_numpy(zero_copy_only=False)
        bounds = np.flatnonzero(np.concatenate(
            ([True], keys[1:] != keys[:-1], [True])))
        dgs = tt["dg"].to_numpy(zero_copy_only=False).view(np.uint64)
        for i in range(bounds.size - 1):
            s, e = bounds[i], bounds[i + 1]
            out[by].append(keys[s])
            out["n_docs_p"].append(int(e - s))
            for k in kinds:
                out[f"n_{k}_p"].append(int(
                    tt[f"n_{k}_p"].to_numpy(zero_copy_only=False)[s:e].sum()))
            out["dg_p"].append(np.int64(
                np.bitwise_xor.reduce(dgs[s:e]).view(np.int64)))
        return pa.table({by: pa.array(out[by]),
                         "n_docs_p": pa.array(out["n_docs_p"], pa.int64()),
                         **{f"n_{k}_p": pa.array(out[f"n_{k}_p"], pa.int64())
                            for k in kinds},
                         "dg_p": pa.array(out["dg_p"], pa.int64())})

    partials = scrubbed.map_batches(partial, batch_format="pyarrow")
    rows = partials.take_all()
    agg: dict[str, dict] = {}
    for r in rows:
        g = agg.setdefault(r[by], {"n_docs": 0, "dg": np.uint64(0),
                                   **{f"n_{k}": 0 for k in kinds}})
        g["n_docs"] += r["n_docs_p"]
        for k in kinds:
            g[f"n_{k}"] += r[f"n_{k}_p"]
        g["dg"] ^= np.int64(r["dg_p"]).view(np.uint64)
    keys = sorted(agg)
    tbl = pa.table({
        by: pa.array(keys, pa.string()),
        "n_docs": pa.array([agg[k]["n_docs"] for k in keys], pa.int64()),
        **{f"n_{kind}": pa.array([agg[k][f"n_{kind}"] for k in keys],
                                 pa.int64()) for kind in kinds},
        "digest_hi32": pa.array([int(agg[k]["dg"] >> np.uint64(32))
                                 for k in keys], pa.int64()),
        "digest_lo32": pa.array([int(agg[k]["dg"] & np.uint64(0xFFFFFFFF))
                                 for k in keys], pa.int64()),
    })
    return ray.data.from_arrow(tbl)


def corpus_digest(ds: ray.data.Dataset,
                  spec: CorpusSpec = DOCUMENTS_SPEC) -> pa.Table:
    """Whole-corpus integrity fingerprint: XOR of every document's
    64-bit sha256 prefix, keyed with its doc_id so duplicate contents
    cannot cancel — the one-number audit that two sites compare after
    a transfer (the corpus-level rollup of the per-row
    ``content_sha256`` invariant the docstore stores).

    XOR is commutative/associative, so per-batch partials fold
    order-free across any cluster size or retry; the shuffle is one
    row per batch.  -> (n_docs, digest_hi32, digest_lo32) — the 64-bit
    XOR split into two int32-safe halves (signed-int64 columns)."""
    from onestools_eventlog_ray.functions.fasthash import sha256_hex_fast

    def partial(batch: pa.Table) -> pa.Table:
        b = add_doc_id(batch, spec)
        hexes = sha256_hex_fast(b["content"])
        pre = pc.utf8_slice_codeunits(hexes, 0, 16)
        h = np.array([int(x, 16) for x in pre.to_pylist()],
                     dtype=np.uint64)
        ids = b["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64).view(np.uint64)
        mixed = h ^ ids
        acc = np.uint64(0)
        for v in mixed:
            acc ^= v
        return pa.table({
            "n_p": pa.array([batch.num_rows], pa.int64()),
            "hi_p": pa.array([int(acc >> np.uint64(32))], pa.int64()),
            "lo_p": pa.array([int(acc & np.uint64(0xFFFFFFFF))],
                             pa.int64()),
        })

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    n = sum(int(r["n_p"]) for r in rows)
    hi = lo = 0
    for r in rows:
        hi ^= int(r["hi_p"])
        lo ^= int(r["lo_p"])
    return pa.table({
        "n_docs": pa.array([n], pa.int64()),
        "digest_hi32": pa.array([hi], pa.int64()),
        "digest_lo32": pa.array([lo], pa.int64()),
    })


def term_len_histogram(ds: ray.data.Dataset,
                       spec: CorpusSpec = DOCUMENTS_SPEC) -> pa.Table:
    """Tokenizer diagnostics: distribution of TERM LENGTHS over the
    dictionary (distinct terms) and over the token stream (weighted by
    cf) — short-heavy streams mean the analyzer is splitting too
    aggressively; the input to vocabulary-budget decisions together
    with :func:`vocab_coverage`.

    One ``term_stats`` fold; the histogram cut is vocab-sized.
    -> (term_len, n_terms, total_cf) ascending."""
    stats = term_stats(ds, spec).take_all()
    out: dict[int, list[int]] = {}
    for r in stats:
        k = len(str(r["term"]))
        a = out.setdefault(k, [0, 0])
        a[0] += 1
        a[1] += int(r["cf"])
    keys = sorted(out)
    return pa.table({
        "term_len": pa.array(keys, pa.int64()),
        "n_terms": pa.array([out[k][0] for k in keys], pa.int64()),
        "total_cf": pa.array([out[k][1] for k in keys], pa.int64()),
    })


def source_overlap(ds: ray.data.Dataset,
                   spec: CorpusSpec = DOCUMENTS_SPEC,
                   by: str = "source", min_jaccard_e6: int = 0
                   ) -> pa.Table:
    """Domain cartography: vocabulary Jaccard between every pair of
    ``by`` groups — near-identical vocabularies flag mirror/syndicated
    feeds before any content-level dedup runs.

    One (group, term)-distinct fold (vocabulary x groups rows); the
    pairwise overlap runs on the folded per-group term sets via one
    sorted-id intersection per pair (groups are few; at open-web
    vocabulary scale swap the exact sets for per-group MinHash
    signatures — same downstream shape).
    -> (src_a < src_b, n_common, jaccard_e6)."""
    from ray.data.aggregate import Count as RCount

    def partial(batch: pa.Table) -> pa.Table:
        toks = tokenize_array(batch[spec.content_col])
        flat = toks.flatten()
        dl = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        src = np.repeat(np.asarray(batch[by].to_pylist(), dtype=object),
                        dl)
        t = pa.table({by: pa.array(src, pa.string()),
                      "term": flat.cast(pa.string())})
        return t.group_by([by, "term"]) \
            .aggregate([([], "count_all")]).select([by, "term"])

    folded = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby([by, "term"]).aggregate(RCount(alias_name="c")) \
        .take_all()
    sets: dict[str, set] = {}
    for r in folded:
        sets.setdefault(str(r[by]), set()).add(str(r["term"]))
    keys = sorted(sets)
    out = {"src_a": [], "src_b": [], "n_common": [], "jaccard_e6": []}
    for i, a in enumerate(keys):
        for b in keys[i + 1:]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            j = inter * 10 ** 6 // union if union else 0
            if j >= min_jaccard_e6:
                out["src_a"].append(a)
                out["src_b"].append(b)
                out["n_common"].append(inter)
                out["jaccard_e6"].append(j)
    return pa.table({
        "src_a": pa.array(out["src_a"], pa.string()),
        "src_b": pa.array(out["src_b"], pa.string()),
        "n_common": pa.array(out["n_common"], pa.int64()),
        "jaccard_e6": pa.array(out["jaccard_e6"], pa.int64()),
    })


def kn_count_of_counts(ds: ray.data.Dataset,
                       spec: CorpusSpec = DOCUMENTS_SPEC,
                       cap: int = 8) -> pa.Table:
    """Kneser-Ney discount statistics: the bigram count-of-counts table
    N_r = |{bigram : count(bigram) = r}| for r = 1..cap (the top row is
    ``>= cap``), the numbers the KN/Good-Turing discounts D1/D2/D3+ are
    estimated from (Chen & Goodman 1998 needs N_1..N_4).

    Two bounded folds: :func:`bigram_stats` (vocabulary-bounded bigram
    exchange) then a per-batch clipped histogram -> tiny (<= cap rows)
    fold — the count table itself never materializes anywhere.
    -> (r, n_bigrams) ascending r."""
    counts = bigram_stats(ds, spec)

    def hist(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        r = np.minimum(n, cap)
        keys, cnt = np.unique(r, return_counts=True)
        return pa.table({"r": pa.array(keys, pa.int64()),
                         "n_p": pa.array(cnt.astype(np.int64), pa.int64())})

    acc: dict[int, int] = {}
    for b in counts.map_batches(hist, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        for k, v in zip(b["r"].to_pylist(), b["n_p"].to_pylist()):
            acc[int(k)] = acc.get(int(k), 0) + int(v)
    rs = sorted(acc)
    return pa.table({"r": pa.array(rs, pa.int64()),
                     "n_bigrams": pa.array([acc[r] for r in rs],
                                           pa.int64())})


def tfidf_pair_mining(ds: ray.data.Dataset,
                      spec: CorpusSpec = DOCUMENTS_SPEC,
                      df_cap: int = 20, k: int = 20) -> pa.Table:
    """Similar-document pair mining through the inverted occurrence
    lists (the index-based doc-doc similarity self-join): top-``k``
    doc pairs by tf-idf dot product accumulated over RARE terms only
    (2 <= df <= ``df_cap``).

    The df cap is the explicit skew bound that makes the self-join
    scale: a term of df d yields d(d-1)/2 pair partials, so capping df
    bounds per-term work at df_cap^2 while hot terms — which carry
    near-zero idf anyway — never enter the exchange.  Plan: one
    :func:`term_stats` fold -> broadcast rare-term (term -> df) dict;
    one corpus pass emits (term, doc_id, w_e3) rows with
    ``w_e3 = floor(tf * ln(N/df) * 1e3 + 0.5)`` (int64-safe products);
    ``groupby(term)`` emits in-term pairs; ``groupby(i, j)`` folds the
    dot.  The rare-term dict broadcast is O(rare vocab) — at open-web
    vocab swap it for the tagged-union term co-group (df rows union
    triple rows, weight computed inside the group), identical output.
    -> (doc_i, doc_j, dot_e6) by (dot desc, i, j)."""
    import ray
    from ray.data.aggregate import Sum as RSum

    n_docs = ds.count()
    stats = term_stats(ds, spec)

    def rare_only(batch: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(batch["df"], 2),
                    pc.less_equal(batch["df"], df_cap))
        t = batch.filter(m)
        return pa.table({"term": t["term"], "df": t["df"].cast(pa.int64())})

    rare = {}
    for b in stats.map_batches(rare_only, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        rare.update(zip(b["term"].to_pylist(),
                        (int(x) for x in b["df"].to_pylist())))
    terms = sorted(rare)
    ln_arr = np.log(n_docs / np.asarray([rare[t] for t in terms],
                                        dtype=np.float64))
    rref = ray.put((pa.array(terms, pa.string()), ln_arr))

    def weights(batch: pa.Table) -> pa.Table:
        from onestools_eventlog_ray.functions.analyzer import doc_term_table
        terms_pa, ln = ray.get(rref)
        b = add_doc_id(batch, spec)
        triples, _ = doc_term_table(b["doc_id"], b["content"])
        idx = pc.index_in(triples["term"], value_set=terms_pa)
        keep = pc.is_valid(idx)
        t = triples.filter(keep)
        pos = idx.filter(keep).to_numpy(zero_copy_only=False).astype(np.int64)
        tf = t["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        w = np.floor(tf * ln[pos] * 1_000 + 0.5).astype(np.int64)
        return pa.table({"term": t["term"], "doc_id": t["doc_id"],
                         "w": pa.array(w, pa.int64())})

    def in_term_pairs(group: pa.Table) -> pa.Table:
        doc = group["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = group["w"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(doc, kind="stable")
        doc, w = doc[order], w[order]
        n = doc.size
        if n < 2:
            return pa.table({"i": pa.array([], pa.int64()),
                             "j": pa.array([], pa.int64()),
                             "d_p": pa.array([], pa.int64())})
        iu, ju = np.triu_indices(n, 1)
        return pa.table({"i": pa.array(doc[iu], pa.int64()),
                         "j": pa.array(doc[ju], pa.int64()),
                         "d_p": pa.array(w[iu] * w[ju], pa.int64())})

    dots = ds.map_batches(weights, batch_format="pyarrow") \
        .groupby("term").map_groups(in_term_pairs,
                                    batch_format="pyarrow") \
        .groupby(["i", "j"]).aggregate(RSum("d_p", alias_name="dot_e6"))

    def topk_partial(batch: pa.Table) -> pa.Table:
        d = batch["dot_e6"].to_numpy(zero_copy_only=False).astype(np.int64)
        i = batch["i"].to_numpy(zero_copy_only=False).astype(np.int64)
        j = batch["j"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((j, i, -d))[:k]
        return batch.take(pa.array(order, pa.int64()))

    top: list[tuple[int, int, int]] = []
    for b in dots.map_batches(topk_partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        for i, j, d in zip(b["i"].to_pylist(), b["j"].to_pylist(),
                           b["dot_e6"].to_pylist()):
            top.append((-int(d), int(i), int(j)))
    top.sort()
    top = top[:k]
    return pa.table({
        "doc_i": pa.array([t[1] for t in top], pa.int64()),
        "doc_j": pa.array([t[2] for t in top], pa.int64()),
        "dot_e6": pa.array([-t[0] for t in top], pa.int64()),
    })


def categorize_text(ds: ray.data.Dataset, spec: CorpusSpec = DOCUMENTS_SPEC,
                    n_tokens: int = 6, k: int = 15) -> pa.Table:
    """ES ``categorize_text`` aggregation, deterministic flavor: group
    documents by their MESSAGE TEMPLATE — lowercase, digit runs
    collapsed to ``#``, first ``n_tokens`` tokens joined — and return
    the ``k`` largest categories.  The log-template mining every
    observability stack runs (and the template-spam detector an
    LLM-data pipeline runs over web text: giant categories = generated
    boilerplate).

    Fully vectorized: Arrow regex kernels normalize, a numpy
    offsets fold keeps the first ``n_tokens`` non-empty tokens per doc,
    ``pc.binary_join`` re-joins — no Python row loop.  Per-batch Arrow
    group_by partials -> ONE groupby over (template) narrow rows ->
    per-block top-k partials -> driver merges <= k x n_blocks rows
    (never the full category table).  -> (template, n_docs,
    example_doc_id = min) ordered by n_docs desc, template asc."""
    from ray.data.aggregate import Min

    def partial(batch: pa.Table) -> pa.Table:
        batch = add_doc_id(batch, spec)      # -> (doc_id, content)
        norm = pc.replace_substring_regex(
            pc.utf8_lower(batch["content"]), "[0-9]+", "#")
        toks = pc.split_pattern_regex(norm, "[^a-z_#]+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten().to_numpy(zero_copy_only=False)
        lens = np.asarray(toks.value_lengths(), dtype=np.int64)
        parents = np.repeat(np.arange(lens.size, dtype=np.int64), lens)
        keep = flat != ""
        p, f = parents[keep], flat[keep]
        # rank within parent, vectorized: index - start_of_parent_run
        if p.size:
            starts = np.flatnonzero(np.r_[True, np.diff(p) != 0])
            runs = np.diff(np.r_[starts, p.size])
            rank = np.arange(p.size) - np.repeat(starts, runs)
            keep2 = rank < n_tokens
            p, f = p[keep2], f[keep2]
        counts = np.zeros(lens.size, dtype=np.int64)
        if p.size:
            np.add.at(counts, p, 1)
        offsets = np.r_[0, np.cumsum(counts)]
        lists = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(f, pa.string()))
        tpl = pc.binary_join(lists, " ")
        t = pa.table({"template": tpl, "doc_id": batch["doc_id"]})
        g = t.group_by("template").aggregate(
            [("doc_id", "count"), ("doc_id", "min")])
        return g.rename_columns(["template", "n_p", "ex_p"])

    folded = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("template").aggregate(
            Sum("n_p", alias_name="n_docs"),
            Min("ex_p", alias_name="example_doc_id"))

    def block_topk(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        n = t["n_docs"].to_numpy(zero_copy_only=False)
        tpl = t["template"].to_numpy(zero_copy_only=False)
        idx = np.lexsort((tpl, -n))[:k]
        return t.take(pa.array(np.sort(idx), pa.int64()))

    rows = folded.map_batches(block_topk, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: (-int(r["n_docs"]), r["template"]))
    rows = rows[:k]
    return pa.table({
        "template": pa.array([r["template"] for r in rows], pa.string()),
        "n_docs": pa.array([int(r["n_docs"]) for r in rows], pa.int64()),
        "example_doc_id": pa.array([int(r["example_doc_id"]) for r in rows],
                                   pa.int64()),
    })


def entropy_scores(ds: ray.data.Dataset,
                   spec: CorpusSpec = DOCUMENTS_SPEC) -> ray.data.Dataset:
    """Shannon-entropy quality scores, the C4/Gopher-family filter the
    length/punct ratios miss: CHARACTER entropy (low = repeated filler,
    base64 blobs sit high, natural text ~4 bits) and TOKEN entropy
    (low = the same words over and over — template spam that passes a
    length cut).  H = ln(n) - sum(c_i ln c_i)/n from exact counts, e6
    ints; empty docs -> 0.

    Zero shuffle, one batch pass; the char fold is a numpy bincount
    over the flat UTF-8 view per doc (offsets from the Arrow buffers),
    the token fold reuses the vectorized tokenizer + per-doc unique
    counts.  -> (doc_id, n_chars_h, char_entropy_e6, n_tokens_h,
    token_entropy_e6)."""
    def fn(batch: pa.Table) -> pa.Table:
        batch = add_doc_id(batch, spec)
        content = batch["content"]
        if isinstance(content, pa.ChunkedArray):
            content = content.combine_chunks()
        n = batch.num_rows

        def entropy_from(keys: np.ndarray, parents: np.ndarray,
                         width: int) -> tuple[np.ndarray, np.ndarray]:
            # keys = parent*width + symbol (doc-major composite); per-doc
            # totals + per-(doc,symbol) counts in two vectorized folds
            totals = np.zeros(n, dtype=np.int64)
            np.add.at(totals, parents, 1)
            uk, cnt = np.unique(keys, return_counts=True)
            ud = (uk // width).astype(np.int64)
            c = cnt.astype(np.float64)
            ssum = np.zeros(n, dtype=np.float64)
            np.add.at(ssum, ud, c * np.log(c))
            h = np.zeros(n, dtype=np.float64)
            m = totals > 0
            tf = totals[m].astype(np.float64)
            h[m] = np.log(tf) - ssum[m] / tf
            return totals, np.floor(h * 1_000_000 + 0.5).astype(np.int64)

        # chars: flat UTF-8 bytes + per-doc byte lengths from the Arrow
        # offsets (large_string offsets are int64)
        buf = np.frombuffer(content.buffers()[2], dtype=np.uint8)             if content.buffers()[2] is not None else np.empty(0, np.uint8)
        off = np.frombuffer(
            content.buffers()[1],
            dtype=np.int64 if pa.types.is_large_string(content.type)
            else np.int32)[content.offset:content.offset + n + 1]             .astype(np.int64)
        blens = np.diff(off)
        cparents = np.repeat(np.arange(n, dtype=np.int64), blens)
        ckeys = cparents * 256 + buf[off[0]:off[-1]].astype(np.int64)
        nc, ce = entropy_from(ckeys, cparents, 256)

        # tokens: vectorized tokenizer, vocab factorized once per batch
        toks = tokenize_array(content)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        tlens = np.asarray(toks.value_lengths(), dtype=np.int64)
        tparents = np.repeat(np.arange(n, dtype=np.int64), tlens)
        flat = toks.flatten().to_numpy(zero_copy_only=False)
        if flat.size:
            _vocab, tid = np.unique(flat, return_inverse=True)
            tkeys = tparents * np.int64(_vocab.size) + tid
            nt, te = entropy_from(tkeys, tparents, int(_vocab.size))
        else:
            nt = np.zeros(n, dtype=np.int64)
            te = np.zeros(n, dtype=np.int64)
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_chars_h": pa.array(nc, pa.int64()),
            "char_entropy_e6": pa.array(ce, pa.int64()),
            "n_tokens_h": pa.array(nt, pa.int64()),
            "token_entropy_e6": pa.array(te, pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def source_unigram_kl(ds: ray.data.Dataset,
                      spec: CorpusSpec = DOCUMENTS_SPEC,
                      by: str = "source") -> pa.Table:
    """Distribution-shift report: KL(source || corpus) over unigram
    term distributions, per source — the drift metric a training-mix
    curator watches when one feed starts injecting boilerplate (its KL
    jumps) or goes stale.  KL = sum_t p_t ln(p_t / q_t) with p from the
    source, q from the whole corpus; terms absent from a source
    contribute 0 (p=0); q covers every term by construction.

    One (term, source) count fold — narrow rows, partial-aggregated
    per batch before the groupby — then the KL sum runs over the
    folded vocabulary table (vocab-bounded, never corpus-bounded),
    term-ascending for a deterministic float fold.  -> (source, n_tok,
    kl_e6) source asc."""
    from ray.data.aggregate import Sum as RSum

    def partial(batch: pa.Table) -> pa.Table:
        batch2 = add_doc_id(batch, spec)
        toks = tokenize_array(batch2["content"])
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lens = np.asarray(toks.value_lengths(), dtype=np.int64)
        src = batch[by].to_numpy(zero_copy_only=False)
        flat_src = np.repeat(src, lens)
        flat_term = toks.flatten().to_numpy(zero_copy_only=False)
        t = pa.table({"term": pa.array(flat_term, pa.string()),
                      "source": pa.array(flat_src, pa.string())})
        g = t.group_by(["term", "source"]).aggregate([("term", "count")])
        return g.rename_columns(["term", "source", "c_p"])

    folded = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["term", "source"]).aggregate(
            RSum("c_p", alias_name="c")).take_all()
    if not folded:
        return pa.table({"source": pa.array([], pa.string()),
                         "n_tok": pa.array([], pa.int64()),
                         "kl_e6": pa.array([], pa.int64())})
    # vocab-bounded driver fold, term-ascending for determinism
    folded.sort(key=lambda r: (r["term"], r["source"]))
    tot_term: dict[str, int] = {}
    tot_src: dict[str, int] = {}
    for r in folded:
        tot_term[r["term"]] = tot_term.get(r["term"], 0) + int(r["c"])
        tot_src[r["source"]] = tot_src.get(r["source"], 0) + int(r["c"])
    n_corpus = sum(tot_src.values())
    kl: dict[str, float] = {s: 0.0 for s in tot_src}
    for r in folded:
        s, t, c = r["source"], r["term"], int(r["c"])
        p = c / tot_src[s]
        q = tot_term[t] / n_corpus
        kl[s] += p * np.log(p / q)
    srcs = sorted(tot_src)
    return pa.table({
        "source": pa.array(srcs, pa.string()),
        "n_tok": pa.array([tot_src[s] for s in srcs], pa.int64()),
        "kl_e6": pa.array([int(np.floor(kl[s] * 1_000_000 + 0.5))
                           for s in srcs], pa.int64()),
    })


def context_window_packing(ds: ray.data.Dataset,
                           spec: CorpusSpec = DOCUMENTS_SPEC,
                           capacity: int = 2048) -> pa.Table:
    """Sequence PACKING for LLM training (the GPT-style concat-and-cut
    prep): all docs are conceptually concatenated in doc_id order and
    cut into fixed ``capacity``-token context windows; each doc gets
    its global token offset and the window span it lands in —
    (start_tok, first_bin, last_bin, offset_in_first).  Downstream,
    window ``i`` is assembled from exactly the docs with
    first_bin <= i <= last_bin — a deterministic shard-local gather.

    Shape: one tokenize pass emits narrow (doc_id, n_tok) partials; the
    exclusive prefix sum streams doc-id-sorted batches through the
    driver with a vectorized per-batch cumsum + carry (rows are 16
    bytes/doc and never materialize at once).  At 10^12 docs swap the
    driver stream for the standard two-phase scan: per-partition token
    totals (tiny) -> exclusive offsets broadcast -> per-partition local
    cumsum; everything downstream is unchanged."""
    def counts(batch: pa.Table) -> pa.Table:
        b = add_doc_id(batch, spec)
        toks = tokenize_array(b["content"])
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        return pa.table({
            "doc_id": b["doc_id"],
            "n_tok": pa.array(np.asarray(toks.value_lengths(),
                                         dtype=np.int64), pa.int64()),
        })

    sorted_ds = ds.map_batches(counts, batch_format="pyarrow") \
        .sort("doc_id")
    ids_parts, nt_parts, st_parts = [], [], []
    carry = 0
    for b in sorted_ds.iter_batches(batch_format="pyarrow",
                                    batch_size=None):
        nt = b["n_tok"].to_numpy(zero_copy_only=False).astype(np.int64)
        start = carry + np.concatenate(([0], np.cumsum(nt)[:-1]))
        carry += int(nt.sum())
        ids_parts.append(b["doc_id"].to_numpy(zero_copy_only=False)
                         .astype(np.int64))
        nt_parts.append(nt)
        st_parts.append(start)
    if not ids_parts:
        return pa.table({c: pa.array([], pa.int64())
                         for c in ("doc_id", "n_tok", "start_tok",
                                   "first_bin", "last_bin",
                                   "offset_in_first")})
    ids = np.concatenate(ids_parts)
    nt = np.concatenate(nt_parts)
    st = np.concatenate(st_parts)
    end = st + np.maximum(nt, 1) - 1          # empty docs live in one bin
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "n_tok": pa.array(nt, pa.int64()),
        "start_tok": pa.array(st, pa.int64()),
        "first_bin": pa.array(st // capacity, pa.int64()),
        "last_bin": pa.array(end // capacity, pa.int64()),
        "offset_in_first": pa.array(st % capacity, pa.int64()),
    })


def terms_agg_approx(ds: ray.data.Dataset,
                     spec: CorpusSpec = DOCUMENTS_SPEC,
                     n_shards: int = 4, shard_size: int = 12,
                     k: int = 10) -> pa.Table:
    """ES ``terms`` aggregation EXACTLY as ES computes it on a sharded
    index — each shard returns only its local top ``shard_size`` terms,
    the coordinator sums them and reports
    ``doc_count_error_upper_bound`` per term (the sum of the last
    returned count from every shard that did NOT return the term) —
    plus the true count and whether the bound actually contains it.
    The mechanism every distributed top-k inherits its accuracy
    story from, made measurable (the house calibration-gate pattern).

    Shards are the deterministic id hash (md5 % n_shards), NOT Ray
    block boundaries, so the result is run-stable and SQL-exact.  One
    (shard, term) count fold -> per-shard top-S (tiny) -> coordinator
    merge on <= n_shards*shard_size candidate rows.
    -> (term, est_count, err_bound, true_count, within_bound) top-k by
    est desc, term asc."""
    from ray.data.aggregate import Sum as RSum
    from onestools_eventlog_ray.functions.fasthash import md5_lower64

    def partial(batch: pa.Table) -> pa.Table:
        b = add_doc_id(batch, spec)
        toks = tokenize_array(b["content"])
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        ids = b["doc_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        keyed = pc.binary_join_element_wise(
            pa.array(["ta:"] * len(ids), pa.string()),
            pc.cast(ids, pa.string()), "")
        shard = (md5_lower64(keyed) % np.uint64(n_shards)).astype(np.int64)
        lens = np.asarray(toks.value_lengths(), dtype=np.int64)
        t = pa.table({
            "shard": pa.array(np.repeat(shard, lens), pa.int64()),
            "term": pa.array(toks.flatten()
                             .to_numpy(zero_copy_only=False), pa.string()),
        })
        g = t.group_by(["shard", "term"]).aggregate([("term", "count")])
        return g.rename_columns(["shard", "term", "c_p"])

    folded = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["shard", "term"]).aggregate(
            RSum("c_p", alias_name="c")).take_all()
    # coordinator merge: vocab-bounded rows
    by_shard: dict[int, list[tuple[int, str]]] = {}
    true_cnt: dict[str, int] = {}
    for r in folded:
        by_shard.setdefault(int(r["shard"]), []).append(
            (int(r["c"]), str(r["term"])))
        true_cnt[str(r["term"])] = true_cnt.get(str(r["term"]), 0) \
            + int(r["c"])
    est: dict[str, int] = {}
    returned: dict[int, set] = {}
    last_c: dict[int, int] = {}
    for s, rows in by_shard.items():
        rows.sort(key=lambda x: (-x[0], x[1]))
        top = rows[:shard_size]
        returned[s] = {t for _, t in top}
        last_c[s] = top[-1][0] if len(rows) >= shard_size else 0
        for c, t in top:
            est[t] = est.get(t, 0) + c
    out = sorted(est.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    terms = [t for t, _ in out]
    bounds = [sum(last_c[s] for s in by_shard if t not in returned[s])
              for t in terms]
    return pa.table({
        "term": pa.array(terms, pa.string()),
        "est_count": pa.array([est[t] for t in terms], pa.int64()),
        "err_bound": pa.array(bounds, pa.int64()),
        "true_count": pa.array([true_cnt[t] for t in terms], pa.int64()),
        "within_bound": pa.array(
            [1 if est[t] <= true_cnt[t] <= est[t] + b else 0
             for t, b in zip(terms, bounds)], pa.int64()),
    })


# ---------------------------------------------------------------------------
# round 5: C4/Gopher/StarCoder-style document quality filters + FIM transform
# ---------------------------------------------------------------------------

def line_quality_filters(ds: ray.data.Dataset,
                         spec: CorpusSpec = DOCUMENTS_SPEC
                         ) -> ray.data.Dataset:
    """Per-doc line/character quality features — the C4/Gopher/StarCoder
    pre-training filter inputs (max line length, mean line length,
    terminal-punctuation line fraction, alphanumeric character fraction,
    whitespace-word count).  All fractions are floor-e6 integers so the
    DuckDB oracle is bit-exact; every regex is RE2 on BOTH sides
    (pyarrow ``count_substring_regex`` == DuckDB ``regexp_extract_all``).

    100-TB shape: one vectorized ``map_batches`` pass, no shuffle; the
    output is a narrow feature table suitable as the left side of a
    filter predicate pushed into the next read.

    -> (doc_id, n_lines, max_line_len, mean_line_len_e6,
        punct_line_frac_e6, alnum_frac_e6, n_words)
    """

    def fn(batch: pa.Table) -> pa.Table:
        b = add_doc_id(batch, spec)
        content = b["content"]
        if isinstance(content, pa.ChunkedArray):
            content = content.combine_chunks()
        n = len(content)
        lines = pc.split_pattern(content, "\n")
        n_lines = pc.list_value_length(lines).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = lines.flatten()
        parents = pc.list_parent_indices(lines).to_numpy(
            zero_copy_only=False)
        lens = pc.utf8_length(flat).to_numpy(
            zero_copy_only=False).astype(np.int64)
        max_len = np.zeros(n, dtype=np.int64)
        char_sum = np.zeros(n, dtype=np.int64)
        punct = np.zeros(n, dtype=np.int64)
        if parents.size:
            np.maximum.at(max_len, parents, lens)
            np.add.at(char_sum, parents, lens)
            is_punct = pc.match_substring_regex(
                flat, r"[.!?]$").to_numpy(zero_copy_only=False)
            np.add.at(punct, parents, is_punct.astype(np.int64))
        total = pc.utf8_length(content).to_numpy(
            zero_copy_only=False).astype(np.int64)
        alnum = pc.count_substring_regex(
            content, pattern="[a-zA-Z0-9]").to_numpy(
            zero_copy_only=False).astype(np.int64)
        n_words = pc.count_substring_regex(
            content, pattern=r"\S+").to_numpy(
            zero_copy_only=False).astype(np.int64)
        alnum_frac = np.zeros(n, dtype=np.int64)
        nz = total > 0
        alnum_frac[nz] = (alnum[nz] * 1_000_000) // total[nz]
        return pa.table({
            "doc_id": b["doc_id"],
            "n_lines": pa.array(n_lines, pa.int64()),
            "max_line_len": pa.array(max_len, pa.int64()),
            "mean_line_len_e6": pa.array(
                (char_sum * 1_000_000) // n_lines, pa.int64()),
            "punct_line_frac_e6": pa.array(
                (punct * 1_000_000) // n_lines, pa.int64()),
            "alnum_frac_e6": pa.array(alnum_frac, pa.int64()),
            "n_words": pa.array(n_words, pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


# (stage key, human label) in application order — Gopher/C4-flavoured
# document-level rules, integer cross-multiplied so no floats exist.
QUALITY_FUNNEL_STAGES = (
    "s0_total",
    "s1_word_count",       # 10 <= n_words <= 100000
    "s2_mean_word_len",    # 3.0 <= mean word length <= 10.0
    "s3_symbol_ratio",     # (#-chars + '...' runs) <= 0.1 * n_words
    "s4_alpha_words",      # >= 80% of words contain a letter
    "s5_max_line_len",     # max line length <= 2000 chars
)


def quality_funnel(ds: ray.data.Dataset,
                   spec: CorpusSpec = DOCUMENTS_SPEC) -> pa.Table:
    """Sequential Gopher/C4-style quality-filter funnel: how many docs
    survive each cumulative stage (the standard pre-training-data audit
    chart).  All thresholds are exact integer cross-multiplications
    (e.g. mean word length in [3,10] <-> 3*n_words <= nonws_chars <=
    10*n_words), so the DuckDB oracle matches bit-for-bit.

    100-TB shape: per-batch boolean masks fold to ONE 6-int row per
    batch; the driver sums a handful of partials — no shuffle, no
    per-doc rows leaving the workers.

    -> (stage, n_docs) — one row per funnel stage, application order.
    """

    def partial(batch: pa.Table) -> pa.Table:
        content = batch[spec.content_col]
        if isinstance(content, pa.ChunkedArray):
            content = content.combine_chunks()
        n_words = pc.count_substring_regex(
            content, pattern=r"\S+").to_numpy(
            zero_copy_only=False).astype(np.int64)
        total = pc.utf8_length(content).to_numpy(
            zero_copy_only=False).astype(np.int64)
        n_ws = pc.count_substring_regex(
            content, pattern=r"\s").to_numpy(
            zero_copy_only=False).astype(np.int64)
        nonws = total - n_ws
        n_hash = pc.count_substring_regex(
            content, pattern="#").to_numpy(
            zero_copy_only=False).astype(np.int64)
        n_ell = pc.count_substring_regex(
            content, pattern=r"\.\.\.").to_numpy(
            zero_copy_only=False).astype(np.int64)
        n_alpha_w = pc.count_substring_regex(
            content, pattern=r"\S*[a-zA-Z]\S*").to_numpy(
            zero_copy_only=False).astype(np.int64)
        lines = pc.split_pattern(content, "\n")
        flat = lines.flatten()
        parents = pc.list_parent_indices(lines).to_numpy(
            zero_copy_only=False)
        lens = pc.utf8_length(flat).to_numpy(
            zero_copy_only=False).astype(np.int64)
        max_len = np.zeros(len(content), dtype=np.int64)
        if parents.size:
            np.maximum.at(max_len, parents, lens)

        m = np.ones(len(content), dtype=bool)
        counts = [int(m.sum())]
        m &= (n_words >= 10) & (n_words <= 100_000)
        counts.append(int(m.sum()))
        m &= (3 * n_words <= nonws) & (nonws <= 10 * n_words)
        counts.append(int(m.sum()))
        m &= (n_hash + n_ell) * 10 <= n_words
        counts.append(int(m.sum()))
        m &= n_alpha_w * 10 >= n_words * 8
        counts.append(int(m.sum()))
        m &= max_len <= 2000
        counts.append(int(m.sum()))
        return pa.table({f"c{i}": pa.array([c], pa.int64())
                         for i, c in enumerate(counts)})

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    sums = [sum(int(p[f"c{i}"]) for p in parts)
            for i in range(len(QUALITY_FUNNEL_STAGES))]
    return pa.table({
        "stage": pa.array(list(QUALITY_FUNNEL_STAGES), pa.string()),
        "n_docs": pa.array(sums, pa.int64()),
    })


def fim_split(ds: ray.data.Dataset,
              spec: CorpusSpec = DOCUMENTS_SPEC) -> ray.data.Dataset:
    """Deterministic fill-in-the-middle (FIM) transform (Bavarian et al.
    2022): each doc is split at two hash-derived cut points into
    (prefix, middle, suffix) and re-emitted in PSM order.  Cut points are
    ``md5_lower64(text + '\\x1f' + salt) % (len+1)`` so the transform is
    RNG-free, retry-stable and oracle-reproducible; the output carries
    the three segment lengths plus the md5 of the PSM-reordered document
    (prefix || RS || suffix || RS || middle) as the content witness.

    100-TB shape: one map_batches pass; hashing dominates (DuckDB-kernel
    vectorized md5), the per-row codepoint slicing is the same O(bytes)
    as the hash.  -> (doc_id, n_prefix, n_middle, n_suffix, psm_md5).
    """
    from onestools_eventlog_ray.functions.fasthash import (md5_hex_fast,
                                                           md5_lower64)

    def fn(batch: pa.Table) -> pa.Table:
        b = add_doc_id(batch, spec)
        content = b["content"]
        if isinstance(content, pa.ChunkedArray):
            content = content.combine_chunks()
        texts = content.to_pylist()
        h1 = md5_lower64(
            pc.binary_join_element_wise(
                content, pa.scalar("fim1", type=content.type),
                pa.scalar("\x1f", type=content.type)))
        h2 = md5_lower64(
            pc.binary_join_element_wise(
                content, pa.scalar("fim2", type=content.type),
                pa.scalar("\x1f", type=content.type)))
        lens = np.asarray([len(t) for t in texts], dtype=np.uint64)
        c1 = (h1 % (lens + 1)).astype(np.int64)
        c2 = (h2 % (lens + 1)).astype(np.int64)
        lo = np.minimum(c1, c2)
        hi = np.maximum(c1, c2)
        psm = [t[:a] + "\x1e" + t[b_:] + "\x1e" + t[a:b_]
               for t, a, b_ in zip(texts, lo.tolist(), hi.tolist())]
        return pa.table({
            "doc_id": b["doc_id"],
            "n_prefix": pa.array(lo, pa.int64()),
            "n_middle": pa.array(hi - lo, pa.int64()),
            "n_suffix": pa.array(lens.astype(np.int64) - hi, pa.int64()),
            "psm_md5": md5_hex_fast(psm),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def top_hits_by_lang(ds: ray.data.Dataset, k: int = 3,
                     spec: CorpusSpec = DOCUMENTS_SPEC) -> ray.data.Dataset:
    """ES ``top_hits`` sub-aggregation under a ``terms`` agg: the top-k
    documents per language bucket ranked by (n_chars desc, doc_id asc).

    100-TB shape: per-batch LOCAL top-k per lang (narrow rows), then one
    small groupby over <= k*n_langs rows per batch — the big side never
    shuffles whole documents.  -> (lang, rank, doc_id, n_chars)."""

    def local(batch: pa.Table) -> pa.Table:
        b = add_doc_id(batch, spec)
        t = pa.table({"lang": batch["lang"], "doc_id": b["doc_id"],
                      "n_chars": pc.cast(batch["n_chars"], pa.int64())})
        langs = t["lang"].to_numpy(zero_copy_only=False)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        nch = t["n_chars"].to_numpy(zero_copy_only=False)
        keep = np.zeros(len(t), dtype=bool)
        for lg in np.unique(langs):
            idx = np.flatnonzero(langs == lg)
            order = np.lexsort((ids[idx], -nch[idx]))[:k]
            keep[idx[order]] = True
        return t.filter(pa.array(keep))

    def topk(group: pa.Table) -> pa.Table:
        ids = group["doc_id"].to_numpy(zero_copy_only=False)
        nch = group["n_chars"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -nch))[:k]
        return pa.table({
            "lang": pa.array(
                group["lang"].to_numpy(zero_copy_only=False)[order]),
            "rank": pa.array(np.arange(1, order.size + 1), pa.int64()),
            "doc_id": pa.array(ids[order], pa.int64()),
            "n_chars": pa.array(nch[order], pa.int64()),
        })

    return ds.map_batches(local, batch_format="pyarrow") \
             .groupby("lang").map_groups(topk, batch_format="pyarrow")


def word_dropout(ds: ray.data.Dataset,
                 spec: CorpusSpec = DOCUMENTS_SPEC,
                 rate_mod: int = 10) -> ray.data.Dataset:
    """Deterministic word-dropout augmentation (the classic robustness /
    denoising-pretraining transform): token ``i`` of a doc is dropped
    when ``md5_lower64(f"{doc_id}:{i}:{token}") % rate_mod == 0`` — an
    expected 1/rate_mod dropout that is RNG-free, retry-stable and
    reproduced exactly by the SQL oracle.  Tokens are the whitespace
    words (``\\S+``), the survivor text is re-joined with single spaces
    and witnessed by md5.

    100-TB shape: one map_batches pass; the per-token hash is the
    vectorized DuckDB-kernel md5, string rebuild is O(bytes).
    -> (doc_id, n_tokens, n_dropped, kept_md5)."""
    from onestools_eventlog_ray.functions.fasthash import (md5_hex_fast,
                                                           md5_lower64)

    def fn(batch: pa.Table) -> pa.Table:
        b = add_doc_id(batch, spec)
        content = b["content"]
        if isinstance(content, pa.ChunkedArray):
            content = content.combine_chunks()
        doc_ids = b["doc_id"].to_numpy(zero_copy_only=False)
        n = len(content)
        toks = pc.split_pattern_regex(content, r"\s+")
        flat = toks.flatten()
        nonempty = pc.not_equal(flat, "")
        flat_parents = pc.list_parent_indices(toks).to_numpy(
            zero_copy_only=False)
        keep0 = nonempty.to_numpy(zero_copy_only=False)
        words = flat.filter(nonempty)
        parents = flat_parents[keep0]
        n_tokens = np.zeros(n, dtype=np.int64)
        np.add.at(n_tokens, parents, 1)
        # within-doc token index (tokens are emitted in doc order)
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(n_tokens, out=offsets[1:])
        idx = np.arange(parents.size, dtype=np.int64) - offsets[parents]
        key = pc.binary_join_element_wise(
            pa.array(doc_ids[parents].astype(str), pa.string()),
            pa.array(idx.astype(str), pa.string()),
            pc.cast(words, pa.string()),
            pa.scalar(":", pa.string()))
        dropped = md5_lower64(key) % np.uint64(rate_mod) == 0
        n_dropped = np.zeros(n, dtype=np.int64)
        np.add.at(n_dropped, parents, dropped.astype(np.int64))
        kept_words = words.filter(pa.array(~dropped)).to_pylist()
        outs, start = [], 0
        for d in range(n):
            cnt = int(n_tokens[d] - n_dropped[d])
            outs.append(" ".join(kept_words[start:start + cnt]))
            start += cnt
        return pa.table({
            "doc_id": b["doc_id"],
            "n_tokens": pa.array(n_tokens, pa.int64()),
            "n_dropped": pa.array(n_dropped, pa.int64()),
            "kept_md5": md5_hex_fast(outs),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def span_corruption(ds: ray.data.Dataset,
                    spec: CorpusSpec = DOCUMENTS_SPEC,
                    span_len: int = 3, noise_pct: int = 15
                    ) -> ray.data.Dataset:
    """Deterministic T5-style SPAN CORRUPTION (Raffel et al. 2020): the
    denoising-pretraining transform that masks contiguous token spans
    and emits (inputs with sentinels, targets that restore the spans).

    SQL-exact determinism: tokens (whitespace words) are grouped into
    fixed spans ``g = i // span_len``; span g of a doc is corrupted iff
    ``md5_lower64(f"{doc_id}:g:{g}") % 100 < noise_pct`` — an expected
    ``noise_pct``% token mask with mean span length ``span_len``,
    RNG-free and retry-stable.  Corrupted span K (0-based, in doc
    order) is replaced in the INPUTS by the single token
    ``<extra_id_K>``; the TARGETS are ``<extra_id_0> span0 tokens
    <extra_id_1> span1 tokens ... <extra_id_n>`` with the closing
    sentinel always present (T5 convention — a doc with nothing
    corrupted has targets ``<extra_id_0>``).  Both strings are
    witnessed by md5 so the oracle verifies the BYTES, not just counts.

    100-TB shape: one map_batches pass, vectorized hashing (DuckDB md5
    kernel) + numpy span bookkeeping; only the per-doc join is a
    Python loop (same shape as :func:`word_dropout`).
    -> (doc_id, n_tokens, n_spans, n_masked, inputs_md5, targets_md5)."""
    from onestools_eventlog_ray.functions.fasthash import (md5_hex_fast,
                                                           md5_lower64)

    def fn(batch: pa.Table) -> pa.Table:
        b = add_doc_id(batch, spec)
        content = b["content"]
        if isinstance(content, pa.ChunkedArray):
            content = content.combine_chunks()
        doc_ids = b["doc_id"].to_numpy(zero_copy_only=False)
        n = len(content)
        toks = pc.split_pattern_regex(content, r"\s+")
        flat = toks.flatten()
        nonempty = pc.not_equal(flat, "")
        flat_parents = pc.list_parent_indices(toks).to_numpy(
            zero_copy_only=False)
        keep0 = nonempty.to_numpy(zero_copy_only=False)
        words = np.asarray(flat.filter(nonempty).to_pylist(), dtype=object)
        parents = flat_parents[keep0]
        n_tokens = np.zeros(n, dtype=np.int64)
        np.add.at(n_tokens, parents, 1)
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(n_tokens, out=offsets[1:])
        idx = np.arange(parents.size, dtype=np.int64) - offsets[parents]
        g = idx // span_len
        key = pc.binary_join_element_wise(
            pa.array(doc_ids[parents].astype(str), pa.string()),
            pa.array(["g"] * parents.size, pa.string()),
            pa.array(g.astype(str), pa.string()),
            pa.scalar(":", pa.string()))
        corr = (md5_lower64(key) % np.uint64(100)
                < np.uint64(noise_pct))
        gstart = (idx % span_len) == 0            # first token of span
        corr_gs = (corr & gstart).astype(np.int64)
        cum = np.cumsum(corr_gs)
        exc = np.concatenate([[0], cum])          # exclusive prefix
        doc_base = exc[offsets[parents]]          # corrupted spans before doc
        # K of each token's span (valid where corr): inclusive count at
        # the token minus the doc base minus the span's own start mark
        k_tok = cum - doc_base - corr.astype(np.int64)
        n_spans = np.zeros(n, dtype=np.int64)
        np.add.at(n_spans, parents, corr_gs)
        n_masked = np.zeros(n, dtype=np.int64)
        np.add.at(n_masked, parents, corr.astype(np.int64))
        sent = np.array([f"<extra_id_{k}>" for k in k_tok], dtype=object)
        # inputs: uncorrupted words, sentinels at corrupted span starts
        in_keep = ~corr | (corr & gstart)
        in_tok = np.where(corr, sent, words)[in_keep]
        in_par = parents[in_keep]
        # targets: sentinel before each corrupted span, then its words
        tg_words = words[corr]
        tg_wpar = parents[corr]
        tg_sent = sent[corr & gstart]
        tg_spar = parents[corr & gstart]
        inputs, targets = [], []
        i_in = np.zeros(n + 1, dtype=np.int64)
        np.add.at(i_in[1:], in_par, 1)
        np.cumsum(i_in, out=i_in)
        # per-doc assembly (targets interleave sentinel + span words in
        # token order — rebuild by walking the doc's corrupted tokens)
        w_off = np.zeros(n + 1, dtype=np.int64)
        np.add.at(w_off[1:], tg_wpar, 1)
        np.cumsum(w_off, out=w_off)
        s_off = np.zeros(n + 1, dtype=np.int64)
        np.add.at(s_off[1:], tg_spar, 1)
        np.cumsum(s_off, out=s_off)
        corr_idx = idx[corr]
        for d in range(n):
            inputs.append(" ".join(in_tok[i_in[d]:i_in[d + 1]]))
            parts_t = []
            si = s_off[d]
            for j in range(w_off[d], w_off[d + 1]):
                if corr_idx[j] % span_len == 0:
                    parts_t.append(tg_sent[si])
                    si += 1
                parts_t.append(tg_words[j])
            parts_t.append(f"<extra_id_{int(n_spans[d])}>")
            targets.append(" ".join(parts_t))
        return pa.table({
            "doc_id": b["doc_id"],
            "n_tokens": pa.array(n_tokens, pa.int64()),
            "n_spans": pa.array(n_spans, pa.int64()),
            "n_masked": pa.array(n_masked, pa.int64()),
            "inputs_md5": md5_hex_fast(inputs),
            "targets_md5": md5_hex_fast(targets),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def epoch_shuffle(ds: ray.data.Dataset,
                  spec: CorpusSpec = DOCUMENTS_SPEC,
                  epochs: int = 2, range_bits: int = 6
                  ) -> ray.data.Dataset:
    """Deterministic PER-EPOCH training order: every epoch gets its own
    full permutation of the corpus — rank of doc d in epoch e is the
    position of ``md5_lower64(f"e{e}:{d}") >> 1`` in that epoch's
    sorted key order.  RNG-free and retry-stable (the property a
    resumable multi-epoch dataloader needs: any worker can recompute
    any doc's position without coordination), and a different order
    every epoch, unlike a single static shuffle.

    Distributed ordered-rank assignment — the same scan primitive as
    :func:`chunk_assignments`: shuffle keys are uniform 63-bit hashes,
    so their top ``range_bits`` bits split the key space into ranges
    contiguous in the global order.  Pass 1 folds per-(epoch, range)
    doc counts (tiny); the driver exclusive-scans them into offsets;
    pass 2 sorts each range locally and adds its offset.  No global
    sort of the corpus.

    -> (epoch, doc_id, rank) — rank 0-based within epoch, bit-identical
    to SQL ``row_number() OVER (PARTITION BY epoch ORDER BY h, doc_id)
    - 1``."""
    import ray
    from ray.data.aggregate import Sum as _Sum
    from onestools_eventlog_ray.functions.fasthash import md5_lower64

    shift = 63 - range_bits

    def per_doc(batch: pa.Table) -> pa.Table:
        b = add_doc_id(batch, spec)
        doc = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        out_e, out_d, out_h = [], [], []
        for ep in range(epochs):
            key = pa.array([f"e{ep}:{d}" for d in doc], pa.string())
            h = (md5_lower64(key) >> np.uint64(1)).astype(np.int64)
            out_e.append(np.full(doc.size, ep, dtype=np.int64))
            out_d.append(doc)
            out_h.append(h)
        return pa.table({
            "epoch": pa.array(np.concatenate(out_e), pa.int64()),
            "doc_id": pa.array(np.concatenate(out_d), pa.int64()),
            "h": pa.array(np.concatenate(out_h), pa.int64()),
        })

    narrow = ds.map_batches(per_doc, batch_format="pyarrow") \
        .add_column("r", lambda df: df["h"] // (1 << shift)) \
        .materialize()

    def range_partial(batch: pa.Table) -> pa.Table:
        e = batch["epoch"].to_numpy(zero_copy_only=False)
        r = batch["r"].to_numpy(zero_copy_only=False)
        key = e * (np.int64(1) << np.int64(range_bits + 1)) + r
        keys, cnt = np.unique(key, return_counts=True)
        return pa.table({"k": pa.array(keys, pa.int64()),
                         "n_p": pa.array(cnt, pa.int64())})

    folded = narrow.map_batches(range_partial, batch_format="pyarrow") \
        .groupby("k").aggregate(_Sum("n_p", alias_name="n")).take_all()
    span = np.int64(1) << np.int64(range_bits + 1)
    offsets: dict[int, int] = {}
    acc_by_epoch: dict[int, int] = {}
    for row in sorted(folded, key=lambda x: int(x["k"])):
        kk = int(row["k"])
        ep = kk // int(span)
        offsets[kk] = acc_by_epoch.get(ep, 0)
        acc_by_epoch[ep] = offsets[kk] + int(row["n"])
    off_ref = ray.put(offsets)

    def assign(group: pa.Table) -> pa.Table:
        offs = ray.get(off_ref)
        e = group["epoch"].to_numpy(zero_copy_only=False)
        d = group["doc_id"].to_numpy(zero_copy_only=False)
        h = group["h"].to_numpy(zero_copy_only=False)
        r = group["r"].to_numpy(zero_copy_only=False)
        base = offs[int(e[0]) * int(span) + int(r[0])]
        order = np.lexsort((d, h))
        rank = np.empty(d.size, dtype=np.int64)
        rank[order] = base + np.arange(d.size, dtype=np.int64)
        return pa.table({
            "epoch": pa.array(e, pa.int64()),
            "doc_id": pa.array(d, pa.int64()),
            "rank": pa.array(rank, pa.int64()),
        })

    return narrow.groupby(["epoch", "r"]) \
        .map_groups(assign, batch_format="pyarrow") \
        .sort(["epoch", "rank"])


# ---------------------------------------------------------------------------
# BPE tokenizer TRAINING (iterative merge learning) + application
# ---------------------------------------------------------------------------

def word_type_counts(ds: ray.data.Dataset,
                     spec: CorpusSpec = DOCUMENTS_SPEC,
                     max_types: int | None = None) -> "pa.Table":
    """Corpus-wide word-TYPE frequency table (term, n) — the distributed
    half of BPE training (Sennrich et al. 2016: learn merges from the
    word-frequency dictionary, not the raw corpus).

    Scale shape: per-batch dictionary-encode + bincount partials, then a
    ``groupby(term).Sum`` — only (term, count) rows shuffle and the
    result is VOCABULARY-sized, independent of corpus size (Heaps' law:
    ~millions of types at 100 TB, a driver-safe table).  ``max_types``
    caps the dictionary to the most frequent types (count desc, term
    asc), the standard frequency-cutoff used by BPE trainers."""

    def partial(batch: pa.Table) -> pa.Table:
        from onestools_eventlog_ray.functions.runtime import \
            pin_worker_threads
        pin_worker_threads()
        b = add_doc_id(batch, spec)
        toks = tokenize_array(b["content"])
        d = toks.flatten().dictionary_encode()
        idx = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        if idx.size == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             "n_p": pa.array([], pa.int64())})
        counts = np.bincount(idx, minlength=len(d.dictionary))
        return pa.table({"term": d.dictionary,
                         "n_p": pa.array(counts, pa.int64())})

    folded = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("term").aggregate(Sum("n_p", alias_name="n"))
    rows = folded.take_all()  # vocabulary-bounded (see docstring)
    terms = np.asarray([r["term"] for r in rows], dtype=np.str_)
    n = np.asarray([int(r["n"]) for r in rows], dtype=np.int64)
    order = np.lexsort((terms, -n))
    if max_types is not None:
        order = order[:max_types]
    return pa.table({"term": pa.array(terms[order], pa.string()),
                     "n": pa.array(n[order], pa.int64())})


def _bpe_merge_loop(types: list[tuple[str, int]], n_merges: int,
                    end_token: str = "</w>") -> list[tuple[str, str, int]]:
    """The classic BPE merge loop over a word-TYPE frequency dict
    (driver-side by design: input is vocabulary-bounded, each iteration
    touches only the types containing the merged pair).  Deterministic
    tie-break: (count desc, left asc, right asc).
    Returns [(left, right, pair_count), ...] in merge order."""
    from collections import Counter, defaultdict
    segs: list[list[str]] = [list(w) + [end_token] for w, _ in types]
    freqs = [int(f) for _, f in types]
    pair_counts: Counter = Counter()
    where: defaultdict = defaultdict(set)  # pair -> set of type indices
    for i, s in enumerate(segs):
        f = freqs[i]
        for a, b in zip(s, s[1:]):
            pair_counts[(a, b)] += f
            where[(a, b)].add(i)
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (la, rb), cnt = best
        if cnt <= 0:
            break
        merges.append((la, rb, cnt))
        merged = la + rb
        for i in sorted(where[(la, rb)]):
            s = segs[i]
            f = freqs[i]
            out: list[str] = []
            j = 0
            while j < len(s):
                if j + 1 < len(s) and s[j] == la and s[j + 1] == rb:
                    prev = out[-1] if out else None
                    nxt = s[j + 2] if j + 2 < len(s) else None
                    pair_counts[(la, rb)] -= f
                    if prev is not None:
                        pair_counts[(prev, la)] -= f
                        if pair_counts[(prev, la)] <= 0:
                            pair_counts.pop((prev, la), None)
                        pair_counts[(prev, merged)] += f
                        where[(prev, merged)].add(i)
                    if nxt is not None:
                        pair_counts[(rb, nxt)] -= f
                        if pair_counts[(rb, nxt)] <= 0:
                            pair_counts.pop((rb, nxt), None)
                        pair_counts[(merged, nxt)] += f
                        where[(merged, nxt)].add(i)
                    out.append(merged)
                    j += 2
                else:
                    out.append(s[j])
                    j += 1
            segs[i] = out
        pair_counts.pop((la, rb), None)
        where.pop((la, rb), None)
    return merges


def learn_bpe(ds: ray.data.Dataset,
              spec: CorpusSpec = DOCUMENTS_SPEC,
              n_merges: int = 30,
              max_types: int | None = 50_000,
              end_token: str = "</w>") -> "pa.Table":
    """Train a BPE tokenizer on the corpus (Sennrich et al. 2016):
    distributed word-type frequency table (:func:`word_type_counts` —
    the only pass over the data), then the exact merge loop over the
    vocabulary-sized dict.  -> (rank, left, right, merged, n) in merge
    order; ``n`` is the corpus-wide count of the pair at merge time.

    100-TB story: the corpus is touched ONCE by a streaming
    map_batches + a (term,count) groupby whose output obeys Heaps' law;
    the iterative part runs over word TYPES (bounded by ``max_types``),
    never over tokens — this is how subword-nmt/fastBPE scale and the
    reason no per-iteration corpus pass exists.  Iterating pair counts
    over the full corpus per merge (the naive reading of
    ``bpe_pair_counts``) would be O(n_merges x corpus) and is
    deliberately avoided."""
    wt = word_type_counts(ds, spec, max_types=max_types)
    types = list(zip(wt["term"].to_pylist(),
                     wt["n"].to_pylist()))
    merges = _bpe_merge_loop(types, n_merges, end_token=end_token)
    return pa.table({
        "rank": pa.array(range(len(merges)), pa.int64()),
        "left": pa.array([m[0] for m in merges], pa.string()),
        "right": pa.array([m[1] for m in merges], pa.string()),
        "merged": pa.array([m[0] + m[1] for m in merges], pa.string()),
        "n": pa.array([m[2] for m in merges], pa.int64()),
    })


def _bpe_encode_type(word: str, ranks: dict[tuple[str, str], int],
                     end_token: str = "</w>") -> list[str]:
    """Encode ONE word type with a learned merge table (lowest-rank
    merge first — the standard BPE inference order)."""
    s = list(word) + [end_token]
    while len(s) > 1:
        best_rank, best_j = None, -1
        for j in range(len(s) - 1):
            r = ranks.get((s[j], s[j + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_j = r, j
        if best_rank is None:
            break
        s[best_j:best_j + 2] = [s[best_j] + s[best_j + 1]]
    return s


def apply_bpe(ds: ray.data.Dataset, merges: "pa.Table",
              spec: CorpusSpec = DOCUMENTS_SPEC,
              end_token: str = "</w>") -> ray.data.Dataset:
    """Tokenize the corpus with a LEARNED merge table: per doc, the
    subword count and compression ratio vs raw characters.
    -> (doc_id, n_tokens, n_subwords, chars_per_subword_e6).

    Scale shape: the merge table is broadcast once (``ray.put``); each
    batch dictionary-encodes its tokens and encodes only the DISTINCT
    word types (cached per worker process across batches — the per-type
    LRU is exactly the reference's per-worker dictionary-cache pattern,
    ST1), then scatters type subword-lengths back through the dictionary
    indices.  No shuffle; one streaming pass."""
    ranks = {(l_, r_): i for i, (l_, r_) in
             enumerate(zip(merges["left"].to_pylist(),
                           merges["right"].to_pylist()))}
    ranks_ref = ray.put((ranks, end_token))

    def fn(batch: pa.Table) -> pa.Table:
        from onestools_eventlog_ray.functions.runtime import \
            pin_worker_threads
        pin_worker_threads()
        cache_key = ("bpe_apply", ranks_ref.hex())
        cached = _BPE_TYPE_CACHE.get(cache_key)
        if cached is None:
            rk, endt = ray.get(ranks_ref)
            cached = {"ranks": rk, "end": endt, "lens": {}}
            _BPE_TYPE_CACHE.clear()
            _BPE_TYPE_CACHE[cache_key] = cached
        rk, endt, lens = cached["ranks"], cached["end"], cached["lens"]
        b = add_doc_id(batch, spec)
        toks = tokenize_array(b["content"])
        n = len(toks)
        dl = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
               .astype(np.int64)
        d = toks.flatten().dictionary_encode()
        idx = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        type_lens = np.empty(len(d.dictionary), dtype=np.int64)
        type_chars = np.empty(len(d.dictionary), dtype=np.int64)
        for ti, t in enumerate(d.dictionary.to_pylist()):
            got = lens.get(t)
            if got is None:
                got = (len(_bpe_encode_type(t, rk, endt)), len(t))
                lens[t] = got
            type_lens[ti] = got[0]
            type_chars[ti] = got[1]
        parent = np.repeat(np.arange(n, dtype=np.int64), dl)
        n_sub = np.zeros(n, dtype=np.int64)
        n_chr = np.zeros(n, dtype=np.int64)
        if idx.size:
            np.add.at(n_sub, parent, type_lens[idx])
            np.add.at(n_chr, parent, type_chars[idx])
        ratio = np.zeros(n, dtype=np.int64)
        nz = n_sub > 0
        ratio[nz] = (n_chr[nz] * 1_000_000) // n_sub[nz]
        return pa.table({
            "doc_id": b["doc_id"],
            "n_tokens": pa.array(dl, pa.int64()),
            "n_subwords": pa.array(n_sub, pa.int64()),
            "chars_per_subword_e6": pa.array(ratio, pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


_BPE_TYPE_CACHE: dict = {}


def kn_bigram_probs(ds: ray.data.Dataset,
                    spec: CorpusSpec = DOCUMENTS_SPEC,
                    k: int = 20, discount: float = 0.75) -> "pa.Table":
    """Interpolated Kneser-Ney bigram probabilities (Chen & Goodman
    1998) for the corpus's top-``k`` bigrams — the n-gram-LM training
    step count-based data pipelines end in:

        P_KN(w2|w1) = max(c(w1 w2) - D, 0) / c(w1 .)
                      + (D * N1+(w1 .) / c(w1 .)) * N1+(. w2) / N1+(..)

    Scale shape: everything derives from :func:`bigram_stats`'s
    vocabulary-bounded (bigram, n) exchange — two further groupbys over
    that TYPE table (per-w1 totals + left-type counts, per-w2 right-type
    counts) and a distributed row count; the token stream is read once
    and only type rows ever shuffle.  The driver touches O(k) bigrams
    plus their O(k) context rows (filtered server-side by broadcast key
    sets).  -> (w1, w2, n, pkn_e9), (n desc, w1, w2) — float ops ordered
    exactly as the DuckDB oracle's expression, then floor-e9."""
    from ray.data.aggregate import Count as _Count
    from ray.data.aggregate import Sum as _Sum

    def split(batch: pa.Table) -> pa.Table:
        parts = pc.split_pattern(batch["bigram"], " ")
        return pa.table({
            "w1": pc.list_element(parts, 0),
            "w2": pc.list_element(parts, 1),
            "n": batch["n"],
        })

    bg = bigram_stats(ds, spec).map_batches(split, batch_format="pyarrow")
    n_types = bg.count()

    def local_topk(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        w1 = np.asarray(batch["w1"].to_pylist(), dtype=np.str_)
        w2 = np.asarray(batch["w2"].to_pylist(), dtype=np.str_)
        order = np.lexsort((w2, w1, -n))[:k]
        return pa.table({"w1": pa.array(w1[order], pa.string()),
                         "w2": pa.array(w2[order], pa.string()),
                         "n": pa.array(n[order], pa.int64())})

    rows = bg.map_batches(local_topk, batch_format="pyarrow") \
        .repartition(1) \
        .map_batches(local_topk, batch_format="pyarrow").take_all()
    top = pa.table({
        "w1": pa.array([r["w1"] for r in rows], pa.string()),
        "w2": pa.array([r["w2"] for r in rows], pa.string()),
        "n": pa.array([int(r["n"]) for r in rows], pa.int64()),
    })
    w1_keys = set(top["w1"].to_pylist())
    w2_keys = set(top["w2"].to_pylist())
    w1_ref = ray.put(w1_keys)
    w2_ref = ray.put(w2_keys)

    def keep_w1(batch: pa.Table) -> pa.Table:
        keys = ray.get(w1_ref)
        mask = pa.array([w in keys for w in batch["w1"].to_pylist()])
        return batch.filter(mask)

    def keep_w2(batch: pa.Table) -> pa.Table:
        keys = ray.get(w2_ref)
        mask = pa.array([w in keys for w in batch["w2"].to_pylist()])
        return batch.filter(mask)

    per1 = {r["w1"]: (int(r["c1"]), int(r["n1pl"])) for r in
            bg.map_batches(keep_w1, batch_format="pyarrow")
            .groupby("w1").aggregate(_Sum("n", alias_name="c1"),
                                     _Count(alias_name="n1pl"))
            .take_all()}
    per2 = {r["w2"]: int(r["n1pr"]) for r in
            bg.map_batches(keep_w2, batch_format="pyarrow")
            .groupby("w2").aggregate(_Count(alias_name="n1pr"))
            .take_all()}
    w1s = top["w1"].to_pylist()
    w2s = top["w2"].to_pylist()
    ns = top["n"].to_pylist()
    e9 = []
    for w1, w2, n in zip(w1s, w2s, ns):
        c1, n1pl = per1[w1]
        n1pr = per2[w2]
        # exact float-op order of the DuckDB oracle expression
        pkn = max(n - discount, 0.0) / c1 \
            + (discount * n1pl / c1) * (n1pr / n_types)
        e9.append(int(np.floor(pkn * 1_000_000_000 + 0.5)))
    return pa.table({
        "w1": pa.array(w1s, pa.string()),
        "w2": pa.array(w2s, pa.string()),
        "n": pa.array(ns, pa.int64()),
        "pkn_e9": pa.array(e9, pa.int64()),
    })


def multi_terms_agg(ds: ray.data.Dataset, size: int = 10) -> pa.Table:
    """ES ``multi_terms`` aggregation: terms buckets keyed by a COMPOUND
    key — here ``(lang, source)`` — ordered by doc count desc with the
    compound key ascending as tie-break, truncated to ``size`` buckets,
    each bucket carrying a sub-metric (sum of ``n_chars``).  The agg the
    reference's users reach for when one ``terms`` dimension is not
    enough (ES docs: multi_terms = terms over a composite key with
    proper cross-shard doc-count ordering).

    100-TB shape: one vectorized per-batch partial fold (``(lang,
    source)`` pair counts + n_chars sums — the shuffle moves a few rows
    per batch, never documents), a small groupby over the bounded
    lang x source key space, driver-side top-``size`` cut.
    -> (rank, lang, source, doc_count, sum_nchars)."""

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"lang": batch["lang"], "source": batch["source"],
                      "n_chars": pc.cast(batch["n_chars"], pa.int64())})
        g = t.group_by(["lang", "source"]).aggregate(
            [("n_chars", "sum"), ("lang", "count")])
        return pa.table({
            "lang": g["lang"], "source": g["source"],
            "c_p": pc.cast(g["lang_count"], pa.int64()),
            "s_p": g["n_chars_sum"],
        })

    folded = (ds.select_columns(["lang", "source", "n_chars"])
              .map_batches(partial, batch_format="pyarrow")
              .groupby(["lang", "source"])
              .aggregate(Sum("c_p", alias_name="doc_count"),
                         Sum("s_p", alias_name="sum_nchars"))
              .take_all())
    rows = sorted(folded, key=lambda r: (-r["doc_count"], r["lang"],
                                         r["source"]))[:size]
    return pa.table({
        "rank": pa.array(range(1, len(rows) + 1), pa.int64()),
        "lang": pa.array([r["lang"] for r in rows], pa.string()),
        "source": pa.array([r["source"] for r in rows], pa.string()),
        "doc_count": pa.array([int(r["doc_count"]) for r in rows],
                              pa.int64()),
        "sum_nchars": pa.array([int(r["sum_nchars"]) for r in rows],
                               pa.int64()),
    })


def runtime_field_terms(ds: ray.data.Dataset,
                        bucket_width: int = 200) -> pa.Table:
    """ES RUNTIME FIELDS (runtime mappings): a field that does not exist
    in the index is defined by a script AT QUERY TIME and then used by a
    ``terms`` aggregation as if it were indexed.  Script here:
    ``emit((doc['n_chars'].value / width) * width)`` — the size bucket —
    aggregated with doc_count + an exact integer mean of n_chars.

    The engine analog of ES's per-shard script execution: the derived
    column materializes only inside ``map_batches`` (vectorized integer
    division — never written to storage, exactly the runtime-field
    contract), partial (count, sum) folds per batch, small groupby on
    the bounded bucket space, integer-division mean so the SQL oracle
    reproduces values bit-exactly.
    -> (size_bucket, doc_count, avg_nchars_e6) ordered by size_bucket."""

    def partial(batch: pa.Table) -> pa.Table:
        nch = pc.cast(batch["n_chars"], pa.int64())
        bucket = pc.multiply(pc.divide(nch, bucket_width), bucket_width)
        t = pa.table({"size_bucket": bucket, "n_chars": nch})
        g = t.group_by("size_bucket").aggregate(
            [("n_chars", "sum"), ("n_chars", "count")])
        return pa.table({
            "size_bucket": g["size_bucket"],
            "c_p": pc.cast(g["n_chars_count"], pa.int64()),
            "s_p": g["n_chars_sum"],
        })

    folded = (ds.select_columns(["n_chars"])
              .map_batches(partial, batch_format="pyarrow")
              .groupby("size_bucket")
              .aggregate(Sum("c_p", alias_name="doc_count"),
                         Sum("s_p", alias_name="sum_nchars"))
              .take_all())
    rows = sorted(folded, key=lambda r: int(r["size_bucket"]))
    return pa.table({
        "size_bucket": pa.array([int(r["size_bucket"]) for r in rows],
                                pa.int64()),
        "doc_count": pa.array([int(r["doc_count"]) for r in rows],
                              pa.int64()),
        "avg_nchars_e6": pa.array(
            [int(r["sum_nchars"]) * 1_000_000 // int(r["doc_count"])
             for r in rows], pa.int64()),
    })
