"""ES JSON query-DSL front end — the request format the reference's
users actually write against ElasticSearch (the reference ships rows
and lets users query ES with JSON DSL; this module lets those requests
run against this engine unchanged).

Supported node grammar (one scoring pass, df-bounded throughout):

    {"match":  {<text_field>: "free text" | {"query": str, "boost": f}}}
    {"term":   {<meta_field>: value}}                    # filter context
    {"range":  {<meta_field>: {"gte": lo, "lte": hi}}}   # filter context
    {"bool":   {"must": [match...], "should": [match...],
                "must_not": [match...], "filter": [term|range...],
                "minimum_should_match": int}}
    {"dis_max": {"queries": [match...], "tie_breaker": f}}
    {"pinned": {"ids": [int...], "organic": <node>}}

Semantics map 1:1 onto the engine's primitives:

* scoring terms + boosts       -> ``search_dsl`` (one TAAT pass)
* ``must`` text clauses        -> required containment: the posting
  doc_id intersection of the must terms gates the ranking (df-bounded
  ``np.intersect1d`` — never a corpus scan)
* ``must_not`` text clauses    -> posting doc_id union, excluded
* ``filter`` clauses           -> metadata predicate, applied with the
  same descending-score verify-refill as ``search_filtered`` (nothing
  O(corpus) materializes; chunks fetch only doc_id + predicate columns)
* ``pinned``                   -> promoted ids first (organic scores
  via ``score_docs``), organic fill excludes them

Scores are bit-identical to calling the primitives directly
(``tests/test_round4e.py`` asserts equivalence clause by clause).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from onestools_eventlog_ray.functions import codec
from onestools_eventlog_ray.functions.analyzer import tokenize_py
from onestools_eventlog_ray.pipelines.query import (SearchEngine,
                                                    score_docs,
                                                    search_dsl)


class DslError(ValueError):
    pass


def _match_terms(body: dict) -> tuple[list[str], float]:
    """{field: "text"} or {field: {"query": ..., "boost": b}}."""
    if len(body) != 1:
        raise DslError("match takes exactly one field")
    (field, spec), = body.items()
    if isinstance(spec, dict):
        text, boost = spec["query"], float(spec.get("boost", 1.0))
    else:
        text, boost = spec, 1.0
    return tokenize_py(str(text)), boost


def _parse(node: dict) -> dict:
    """Normalize any supported node into one flat execution plan."""
    if len(node) != 1:
        raise DslError("a query node has exactly one key")
    (kind, body), = node.items()
    plan = {"terms": [], "boosts": {}, "msm": 1, "mode": "sum",
            "tie_breaker": 0.0, "must_terms": [], "must_not_terms": [],
            "where": {}, "pinned": []}
    if kind == "match":
        terms, boost = _match_terms(body)
        plan["terms"] = terms
        if boost != 1.0:
            plan["boosts"] = {t: boost for t in terms}
        return plan
    if kind == "dis_max":
        for q in body["queries"]:
            terms, boost = _match_terms(q["match"])
            plan["terms"].extend(terms)
            for t in terms:
                plan["boosts"][t] = boost
        plan["mode"] = "max"
        plan["tie_breaker"] = float(body.get("tie_breaker", 0.0))
        return plan
    if kind == "pinned":
        plan = _parse(body["organic"])
        plan["pinned"] = [int(d) for d in body["ids"]]
        return plan
    if kind == "bool":
        for q in body.get("must", []):
            terms, boost = _match_terms(q["match"])
            plan["must_terms"].extend(terms)
            plan["terms"].extend(terms)
            if boost != 1.0:
                for t in terms:
                    plan["boosts"][t] = boost
        for q in body.get("should", []):
            terms, boost = _match_terms(q["match"])
            plan["terms"].extend(terms)
            if boost != 1.0:
                for t in terms:
                    plan["boosts"][t] = boost
        for q in body.get("must_not", []):
            terms, _ = _match_terms(q["match"])
            plan["must_not_terms"].extend(terms)
        for q in body.get("filter", []):
            (fk, fb), = q.items()
            if fk == "term":
                (c, v), = fb.items()
                plan["where"][c] = v
            elif fk == "range":
                (c, r), = fb.items()
                plan["where"][c] = (r["gte"], r["lte"])
            else:
                raise DslError(f"unsupported filter clause: {fk}")
        # ES default: msm applies to should only when must is absent
        plan["msm"] = int(body.get(
            "minimum_should_match",
            1 if not body.get("must") else 0)) or 0
        plan["msm"] = max(plan["msm"], 0)
        return plan
    raise DslError(f"unsupported query kind: {kind}")


def _posting_ids(eng: SearchEngine, terms: list[str]) -> list[np.ndarray]:
    loaded = eng.load_terms(sorted(set(terms)))
    out = []
    for t in sorted(set(terms)):
        hit = loaded.get(t)
        out.append(codec.decode_posting(hit[1]).doc_ids
                   if hit is not None else np.empty(0, np.int64))
    return out

def es_search(eng: SearchEngine, query: dict, k: int = 10) -> pa.Table:
    """Execute one ES-DSL query -> (rank, doc_id, score_e6)."""
    plan = _parse(query)
    pins = plan["pinned"][:k]
    organic_k = k - len(pins)
    # one TAAT pass over all scoring terms, full df-bounded ranking
    msm = plan["msm"] if plan["msm"] > 0 else 1
    ranked = search_dsl(eng, plan["terms"], k=1 << 62,
                        boosts=plan["boosts"] or None,
                        minimum_should_match=msm,
                        mode=plan["mode"],
                        tie_breaker=plan["tie_breaker"]) \
        if plan["terms"] else []
    ids = np.array([d for d, _ in ranked], dtype=np.int64)
    keep = np.ones(ids.size, dtype=bool)
    if plan["must_terms"]:
        allowed = None
        for post in _posting_ids(eng, plan["must_terms"]):
            allowed = post if allowed is None \
                else np.intersect1d(allowed, post, assume_unique=True)
        keep &= np.isin(ids, allowed)
    if plan["must_not_terms"]:
        exc = np.unique(np.concatenate(
            _posting_ids(eng, plan["must_not_terms"])
            or [np.empty(0, np.int64)]))
        keep &= ~np.isin(ids, exc)
    if pins:
        keep &= ~np.isin(ids, np.array(pins, dtype=np.int64))
    ranked = [h for h, m in zip(ranked, keep) if m]
    # filter context: descending-score verify refill, predicate columns only
    where = plan["where"]
    hits: list[tuple[int, float]] = []
    if where:
        chunk, c0 = max(4 * organic_k, 64), 0
        while c0 < len(ranked) and len(hits) < organic_k:
            part = ranked[c0:c0 + chunk]
            c0 += chunk
            chunk *= 4
            tbl = eng.fetch_docs([d for d, _ in part],
                                 columns=["doc_id"] + list(where))
            ok: set = set()
            if tbl.num_rows:
                mask = None
                for c, v in where.items():
                    m = (pc.and_(pc.greater_equal(tbl[c], v[0]),
                                 pc.less_equal(tbl[c], v[1]))
                         if isinstance(v, tuple) else pc.equal(tbl[c], v))
                    mask = m if mask is None else pc.and_(mask, m)
                ok = set(tbl.filter(mask)["doc_id"].to_pylist())
            hits.extend(h for h in part if h[0] in ok)
        hits = hits[:organic_k]
    else:
        hits = ranked[:organic_k]
    sc = score_docs(eng, plan["terms"], pins) if pins else {}
    all_ids = pins + [d for d, _ in hits]
    scores = [sc[d] for d in pins] + [s for _, s in hits]
    return pa.table({
        "rank": pa.array(range(1, len(all_ids) + 1), pa.int64()),
        "doc_id": pa.array(all_ids, pa.int64()),
        "score_e6": pa.array(
            [int(np.floor(s * 1_000_000 + 0.5)) for s in scores],
            pa.int64()),
    })
