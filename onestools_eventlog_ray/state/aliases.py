"""Index aliases — the ES ``_aliases`` API analog.

An alias is a level of indirection between a serving name and a
physical index directory, stored as one JSON file per alias under a
registry directory.  The whole point is the ATOMIC flip: the
zero-downtime reindex pattern (build ``idx_v2`` next to ``idx_v1``,
then ``flip_alias('prod', idx_v2)``) swaps every future reader in one
``os.replace`` — readers see either the old or the new index, never a
torn state.  The reference gets this for free from ElasticSearch's
alias actions (its exporter writes to a configured index name that ops
re-points); here it is explicit and crash-safe.

Writes are tmp + ``os.replace`` (the same atomic-commit contract as
every manifest in ``state/``); a flip records the previous target so
``rollback_alias`` can undo a bad deploy.  At 100 TB the registry
lives on the shared filesystem / object store next to the indexes —
one tiny JSON read per engine construction, nothing per query.
"""

from __future__ import annotations

import json
import os

_SUFFIX = ".alias.json"


def _path(registry_dir: str, name: str) -> str:
    safe = "".join(c if c.isalnum() or c in "-_" else "_" for c in name)
    return os.path.join(registry_dir, safe + _SUFFIX)


def put_alias(registry_dir: str, name: str, index_dir: str) -> dict:
    """Create or re-point an alias.  Validates the target serves (stats
    manifest + layout gate) BEFORE the flip — an alias can never point
    at a half-built index.  Atomic: tmp + rename."""
    from onestools_eventlog_ray.state import checkpoint as ckpt
    stats = ckpt.read_stats(index_dir)       # raises if incomplete
    ckpt.check_layout(stats, index_dir)
    os.makedirs(registry_dir, exist_ok=True)
    p = _path(registry_dir, name)
    prev = None
    if os.path.exists(p):
        with open(p) as f:
            prev = json.load(f)["index_dir"]
    rec = {"alias": name, "index_dir": os.path.abspath(index_dir),
           "previous": prev}
    tmp = p + f".tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(rec, f)
    os.replace(tmp, p)
    return rec


# the flip IS a put — named for the reindex-swap intent
flip_alias = put_alias


def resolve_alias(registry_dir: str, name: str) -> str:
    """Alias -> physical index dir (raises KeyError if absent)."""
    p = _path(registry_dir, name)
    if not os.path.exists(p):
        raise KeyError(f"no alias '{name}' in {registry_dir}")
    with open(p) as f:
        return json.load(f)["index_dir"]


def rollback_alias(registry_dir: str, name: str) -> str:
    """Re-point an alias at its recorded previous target (the undo of
    one flip).  Raises if there is no previous target."""
    p = _path(registry_dir, name)
    with open(p) as f:
        rec = json.load(f)
    if not rec.get("previous"):
        raise ValueError(f"alias '{name}' has no previous target")
    return put_alias(registry_dir, name, rec["previous"])["index_dir"]


def delete_alias(registry_dir: str, name: str) -> bool:
    p = _path(registry_dir, name)
    if os.path.exists(p):
        os.unlink(p)
        return True
    return False


def list_aliases(registry_dir: str):
    """-> (alias, index_dir, previous) table, alias asc — the
    ``GET _cat/aliases`` analog."""
    import pyarrow as pa
    rows = []
    if os.path.isdir(registry_dir):
        for entry in sorted(os.listdir(registry_dir)):
            if entry.endswith(_SUFFIX):
                with open(os.path.join(registry_dir, entry)) as f:
                    rows.append(json.load(f))
    return pa.table({
        "alias": pa.array([r["alias"] for r in rows], pa.string()),
        "index_dir": pa.array([r["index_dir"] for r in rows], pa.string()),
        "previous": pa.array([r.get("previous") for r in rows],
                             pa.string()),
    })


def engine_for_alias(registry_dir: str, name: str):
    """Construct a ``SearchEngine`` through the alias indirection —
    the serving-path entry point."""
    from onestools_eventlog_ray.pipelines.query import SearchEngine
    return SearchEngine(resolve_alias(registry_dir, name))
