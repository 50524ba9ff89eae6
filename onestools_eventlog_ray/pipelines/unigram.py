"""Unigram-LM subword tokenizer (SentencePiece, Kudo 2018) — the
second major tokenizer family next to BPE (``text.learn_bpe``),
trained distributed over the word-TYPE table.

Pipeline (every stage vocabulary-bounded, never token-bounded):

1. **Word types** — ``text.word_type_counts``: one groupby, (term, n)
   rows only; Heaps' law keeps this driver-safe at any corpus size.
2. **Seed vocabulary** — substring counting as ``map_batches`` partials
   over the type table + one (piece)-keyed fold; top ``seed_max``
   multi-char substrings by (weighted freq desc, piece asc) plus ALL
   single characters (so every word stays segmentable).
3. **EM** — fixed ``iters`` rounds.  E-step: forward-backward over each
   word type (a TYPE loop inside ``map_batches``, piece probabilities
   broadcast via ``ray.put``), emitting expected piece counts
   **quantized to int64 e9 per (type, piece) BEFORE the shuffle** — the
   same fixed-point trick as the BM25 oracles: integer partial sums are
   addition-order independent, so training is bit-reproducible under
   any partitioning.  M-step: probabilities from the folded integer
   counts (piece-bounded, driver).
4. **Prune** — keep all single chars + the top ``vocab_size - |chars|``
   multi-char pieces by (e9 count desc, piece asc).
5. **Apply** — Viterbi best segmentation per word TYPE (per-worker memo
   cache, the ST1 pattern), deterministic tie-break (smallest split
   point wins on exact float ties); corpus fertility folds as integer
   partials.

Reference parity: the reference ships rows to ElasticSearch whose
analyzers do the tokenization (`/root/reference/OneSTools.EventLog.Exporter.Core/
ElasticSearch/ElasticSearchStorage.cs:217-236`); a training-data
engine needs the tokenizers themselves.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

import ray.data

from onestools_eventlog_ray.sources.corpus import (CorpusSpec,
                                                   DOCUMENTS_SPEC)

E9 = 1_000_000_000


# ----------------------------------------------------------- seeding

def _substring_partial(max_piece_len: int):
    def fn(batch: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for term, n in zip(batch["term"].to_pylist(),
                           batch["n"].to_pylist()):
            L = len(term)
            for i in range(L):
                for j in range(i + 1, min(L, i + max_piece_len) + 1):
                    p = term[i:j]
                    counts[p] = counts.get(p, 0) + n
        ks = sorted(counts)
        return pa.table({"piece": pa.array(ks, pa.string()),
                         "n_p": pa.array([counts[k] for k in ks],
                                         pa.int64())})
    return fn


def seed_vocab(types: pa.Table, max_piece_len: int = 6,
               seed_max: int = 2000) -> tuple[list[str], list[str]]:
    """-> (single_chars, multi_pieces): all characters of the type
    table plus the top ``seed_max`` multi-char substrings by
    (freq-weighted count desc, piece asc)."""
    from ray.data.aggregate import Sum
    folded = (ray.data.from_arrow(types)
              .map_batches(_substring_partial(max_piece_len),
                           batch_format="pyarrow")
              .groupby("piece").aggregate(Sum("n_p", alias_name="n"))
              .take_all())
    singles = sorted({r["piece"] for r in folded if len(r["piece"]) == 1})
    multi = [(r["piece"], int(r["n"])) for r in folded
             if len(r["piece"]) > 1]
    multi.sort(key=lambda kv: (-kv[1], kv[0]))
    return singles, [p for p, _ in multi[:seed_max]]


# ---------------------------------------------------------------- EM

def forward_backward_counts(word: str, freq: int,
                            probs: dict[str, float],
                            max_piece_len: int) -> dict[str, int]:
    """Expected piece counts of one word type under the current model,
    e9-quantized per piece occurrence — the E-step unit.  Exact
    forward-backward over the segmentation lattice."""
    n = len(word)
    alpha = [0.0] * (n + 1)
    alpha[0] = 1.0
    for i in range(1, n + 1):
        a = 0.0
        for j in range(max(0, i - max_piece_len), i):
            p = probs.get(word[j:i])
            if p:
                a += alpha[j] * p
        alpha[i] = a
    if alpha[n] <= 0.0:
        return {}
    beta = [0.0] * (n + 1)
    beta[n] = 1.0
    for i in range(n - 1, -1, -1):
        b = 0.0
        for j in range(i + 1, min(n, i + max_piece_len) + 1):
            p = probs.get(word[i:j])
            if p:
                b += p * beta[j]
        beta[i] = b
    z = alpha[n]
    out: dict[str, int] = {}
    for i in range(n):
        for j in range(i + 1, min(n, i + max_piece_len) + 1):
            piece = word[i:j]
            p = probs.get(piece)
            if p:
                e = freq * (alpha[i] * p * beta[j] / z)
                c = int(math.floor(e * E9 + 0.5))
                if c:
                    out[piece] = out.get(piece, 0) + c
    return out


def _estep_partial(probs_ref, max_piece_len: int):
    def fn(batch: pa.Table) -> pa.Table:
        import ray
        probs = ray.get(probs_ref) if not isinstance(probs_ref, dict) \
            else probs_ref
        counts: dict[str, int] = {}
        for term, n in zip(batch["term"].to_pylist(),
                           batch["n"].to_pylist()):
            for piece, c in forward_backward_counts(
                    term, int(n), probs, max_piece_len).items():
                counts[piece] = counts.get(piece, 0) + c
        ks = sorted(counts)
        return pa.table({"piece": pa.array(ks, pa.string()),
                         "c_p": pa.array([counts[k] for k in ks],
                                         pa.int64())})
    return fn


def learn_unigram(ds: ray.data.Dataset,
                  spec: CorpusSpec = DOCUMENTS_SPEC,
                  vocab_size: int = 512, iters: int = 2,
                  max_piece_len: int = 6, seed_max: int = 2000,
                  max_types: int | None = None) -> pa.Table:
    """Train the unigram LM.  -> (piece, is_single, count_e9,
    logprob_e9) sorted by (is_single desc, count_e9 desc, piece asc) —
    integer outputs, bit-reproducible under any partitioning."""
    import ray
    from ray.data.aggregate import Sum
    from onestools_eventlog_ray.pipelines.text import word_type_counts
    types = word_type_counts(ds, spec, max_types=max_types)
    singles, multi = seed_vocab(types, max_piece_len, seed_max)
    pieces = list(singles) + multi
    probs = {p: 1.0 / len(pieces) for p in pieces}
    type_ds = ray.data.from_arrow(types)
    counts: dict[str, int] = {}
    for _ in range(iters):
        ref = ray.put(probs)
        folded = (type_ds
                  .map_batches(_estep_partial(ref, max_piece_len),
                               batch_format="pyarrow")
                  .groupby("piece").aggregate(Sum("c_p", alias_name="c"))
                  .take_all())
        counts = {r["piece"]: int(r["c"]) for r in folded}
        total = sum(counts.values())
        if not total:
            raise ValueError("EM degenerated: zero expected counts")
        probs = {p: c / total for p, c in counts.items() if c > 0}
        # singles must survive every iteration (coverage guarantee)
        floor_p = 1.0 / (2.0 * total)
        for s in singles:
            probs.setdefault(s, floor_p)
    kept_multi = sorted(
        ((p, c) for p, c in counts.items()
         if len(p) > 1 and c > 0),
        key=lambda kv: (-kv[1], kv[0]))[:max(0, vocab_size - len(singles))]
    rows = [(s, True, counts.get(s, 0)) for s in singles] + \
           [(p, False, c) for p, c in kept_multi]
    total = sum(c for _, _, c in rows) or 1
    out = []
    for p, is_single, c in rows:
        prob = c / total if c else 1.0 / (2.0 * total)
        out.append((p, is_single, c,
                    int(math.floor(math.log(prob) * E9 + 0.5))))
    out.sort(key=lambda r: (-r[1], -r[2], r[0]))
    return pa.table({
        "piece": pa.array([r[0] for r in out], pa.string()),
        "is_single": pa.array([r[1] for r in out], pa.bool_()),
        "count_e9": pa.array([r[2] for r in out], pa.int64()),
        "logprob_e9": pa.array([r[3] for r in out], pa.int64()),
    })


# ------------------------------------------------------------- apply

def viterbi_segment(word: str, logp: dict[str, float],
                    max_piece_len: int = 6) -> list[str]:
    """Best segmentation under the unigram model; unknown characters
    fall back to a very low-probability UNK char piece.  Deterministic
    tie-break: on exact float score ties, the SMALLEST split point
    (longest final piece) wins — fixed iteration order, strict >."""
    n = len(word)
    NEG = -1e18
    best = [NEG] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0.0
    for i in range(1, n + 1):
        for j in range(max(0, i - max_piece_len), i):
            if best[j] <= NEG:
                continue
            lp = logp.get(word[j:i])
            if lp is None:
                lp = -40.0 if i - j == 1 else None   # UNK single char
            if lp is None:
                continue
            s = best[j] + lp
            if s > best[i]:
                best[i] = s
                back[i] = j
    out = []
    i = n
    while i > 0:
        j = back[i]
        out.append(word[j:i])
        i = j
    return out[::-1]


class UnigramApplier:
    """Actor-pool stage: documents -> per-batch (n_words, n_pieces,
    n_unk_chars) integer partials, with a per-worker word-type
    segmentation memo cache."""

    def __init__(self, pieces: dict[str, float], spec: CorpusSpec,
                 max_piece_len: int = 6):
        self.logp = pieces
        self.spec = spec
        self.maxlen = max_piece_len
        self.known = set(p for p in pieces if len(p) == 1)
        self._memo: dict[str, tuple[int, int]] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        from onestools_eventlog_ray.functions.analyzer import tokenize_array
        from onestools_eventlog_ray.stages.normalize import add_doc_id
        b = add_doc_id(batch, self.spec)
        toks = tokenize_array(b["content"])
        flat = toks.flatten()
        d = flat.dictionary_encode()
        idx = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        reps = np.bincount(idx, minlength=len(d.dictionary)) \
            if idx.size else np.zeros(0, np.int64)
        n_words = int(idx.size)
        n_pieces = 0
        n_unk = 0
        for code, term in enumerate(d.dictionary.to_pylist()):
            hit = self._memo.get(term)
            if hit is None:
                seg = viterbi_segment(term, self.logp, self.maxlen)
                unk = sum(1 for ch in term if ch not in self.known)
                hit = (len(seg), unk)
                self._memo[term] = hit
            n_pieces += hit[0] * int(reps[code])
            n_unk += hit[1] * int(reps[code])
        return pa.table({"n_words": pa.array([n_words], pa.int64()),
                         "n_pieces": pa.array([n_pieces], pa.int64()),
                         "n_unk": pa.array([n_unk], pa.int64())})


def apply_unigram(ds: ray.data.Dataset, pieces: pa.Table,
                  spec: CorpusSpec = DOCUMENTS_SPEC,
                  max_piece_len: int = 6) -> pa.Table:
    """Segment the corpus with a learned piece table and fold fertility
    stats.  -> one row (n_word_tokens, n_pieces, fertility_e6,
    n_unk_chars)."""
    logp = {p: v / E9 for p, v in
            zip(pieces["piece"].to_pylist(),
                pieces["logprob_e9"].to_pylist())}
    parts = ds.map_batches(
        UnigramApplier, batch_format="pyarrow", concurrency=(1, 8),
        fn_constructor_kwargs=dict(pieces=logp, spec=spec,
                                   max_piece_len=max_piece_len)
    ).take_all()
    n_words = sum(r["n_words"] for r in parts)
    n_pieces = sum(r["n_pieces"] for r in parts)
    n_unk = sum(r["n_unk"] for r in parts)
    fert = (n_pieces * 1_000_000) // n_words if n_words else 0
    return pa.table({
        "n_word_tokens": pa.array([n_words], pa.int64()),
        "n_pieces": pa.array([n_pieces], pa.int64()),
        "fertility_e6": pa.array([fert], pa.int64()),
        "n_unk_chars": pa.array([n_unk], pa.int64()),
    })
