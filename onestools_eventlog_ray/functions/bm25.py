"""BM25 scoring math + brute-force in-memory oracle.

The reference delegates ranking to ElasticSearch's BM25 over analyzed
``text`` fields (``/root/reference/OneSTools.EventLog.Exporter.Core/ElasticSearch/ElasticSearchStorage.cs:217,227,231``);
here it is explicit.  Formula (Lucene/ES practical BM25):

    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
    w(t, d)     = idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))
    score(d, q) = sum over distinct query terms t of w(t, d)

Determinism contract (SURVEY.md §7.4): float64 everywhere, per-document
accumulation iterates query terms in SORTED UNIQUE term order, ties
broken ``(score desc, doc_id asc)`` — the engine scorer and this oracle
follow the identical order, so ranks are reproducible across runs and
parallelism levels.
"""

from __future__ import annotations

import numpy as np

from onestools_eventlog_ray.functions.analyzer import tokenize_py


def idf(N: int, df: np.ndarray | int | float) -> np.ndarray | float:
    df = np.asarray(df, dtype=np.float64)
    out = np.log(1.0 + (N - df + 0.5) / (df + 0.5))
    return float(out) if out.ndim == 0 else out


def term_weight(tf, dl, idf_val: float, avgdl: float, k1: float, b: float):
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    return idf_val * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def topk_order(scores: np.ndarray, doc_ids: np.ndarray, k: int) -> np.ndarray:
    """Indices of the top-k rows under (score desc, doc_id asc)."""
    order = np.lexsort((doc_ids, -scores))
    return order[:k]


def topk_order_e6(scores: np.ndarray, doc_ids: np.ndarray,
                  k: int) -> np.ndarray:
    """Indices of the top-k rows under (round(score*1e6) desc, doc_id
    asc) — the integer key every SQL oracle ranks on, so FP-last-bit
    differences between engine and oracle cannot flip ranks.

    Tie-safe bounded selection: an O(n) ``np.partition`` finds the kth
    quantized score, only the k-plus-ties candidates (``e6 >= kth``)
    are lexsorted, and exactly k survive.  Callers therefore receive
    O(k) hits — never the full df-bounded match list (the round-4
    verdict's last driver-materialization shape)."""
    e6 = np.floor(np.asarray(scores, dtype=np.float64)
                  * 1_000_000.0 + 0.5).astype(np.int64)
    ids = np.asarray(doc_ids)
    n = e6.size
    if 0 < k < n:
        kth = np.partition(e6, n - k)[n - k]
        cand = np.flatnonzero(e6 >= kth)        # k + ties at the kth score
    else:
        cand = np.arange(n)
    order = cand[np.lexsort((ids[cand], -e6[cand]))]
    return order[:k]


def pick_topk(tie: str):
    """Selection function for a ``tie`` mode: ``"float"`` -> raw float64
    order (engine-native), ``"e6"`` -> oracle-exact quantized order."""
    if tie == "e6":
        return topk_order_e6
    if tie == "float":
        return topk_order
    raise ValueError(f"unknown tie mode {tie!r} (use 'float' or 'e6')")


class BruteForceBM25:
    """Plain-NumPy oracle over an in-memory corpus (no Ray).

    Mirrors the reference's operational validation (rows in the sink
    reconciled against parsed source rows, ``/root/reference/README.md:225-231``):
    the distributed engine's top-k must be rank-identical to this.
    """

    def __init__(self, doc_ids: list[int], contents: list[str],
                 k1: float = 1.2, b: float = 0.75):
        self.k1, self.b = k1, b
        self.doc_ids = np.asarray(doc_ids, dtype=np.int64)
        order = np.argsort(self.doc_ids, kind="stable")
        self.doc_ids = self.doc_ids[order]
        self.tf: dict[str, dict[int, int]] = {}
        self.dl = np.zeros(len(contents), dtype=np.int64)
        for pos, i in enumerate(order):
            toks = tokenize_py(contents[i])
            self.dl[pos] = len(toks)
            for t in toks:
                self.tf.setdefault(t, {})[int(self.doc_ids[pos])] = \
                    self.tf.get(t, {}).get(int(self.doc_ids[pos]), 0) + 1
        self.N = len(contents)
        self.avgdl = float(self.dl.sum()) / self.N if self.N else 0.0
        self._dl_of = dict(zip(self.doc_ids.tolist(), self.dl.tolist()))

    def df(self, term: str) -> int:
        return len(self.tf.get(term, {}))

    def search(self, terms: list[str], k: int = 10) -> list[tuple[int, float]]:
        """-> [(doc_id, score)] of length <= k, (score desc, doc_id asc)."""
        acc: dict[int, float] = {}
        for t in sorted(set(terms)):
            post = self.tf.get(t)
            if not post:
                continue
            idf_t = idf(self.N, len(post))
            for d in sorted(post):
                w = term_weight(post[d], self._dl_of[d], idf_t,
                                self.avgdl, self.k1, self.b)
                acc[d] = acc.get(d, 0.0) + float(w)
        if not acc:
            return []
        ids = np.fromiter(acc.keys(), dtype=np.int64)
        scs = np.fromiter(acc.values(), dtype=np.float64)
        idx = topk_order(scs, ids, k)
        return [(int(ids[i]), float(scs[i])) for i in idx]
