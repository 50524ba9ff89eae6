"""Index snapshot / restore — the ES ``_snapshot`` API analog.

A snapshot is a self-contained copy of everything the query paths read:
``shards/``, ``docstore/``, ``manifest/`` (stats + layout version +
partition records), tombstones, and any sidecars present (``positions/``,
``ann/``, ``field-*/`` multi-field subindexes).  Restore copies it back
under a fresh root and validates the layout version before the first
query (the same ``check_layout`` gate ``SearchEngine`` enforces, so a
snapshot from an incompatible engine version refuses to serve instead
of silently mis-sharding — round-2 ADVICE semantics).

Files are copied atomically (tmp + rename) and the snapshot carries a
``_SNAPSHOT_DONE`` marker written LAST, so a crashed snapshot is never
mistaken for a complete one (the reference's atomic bulk-sink contract,
``/root/reference/OneSTools.EventLog.Exporter.Core/ElasticSearchStorage.cs:293-320``).
Hardlinks are used when source and destination share a filesystem —
a snapshot of a multi-GB index is then metadata-only, exactly how ES
incremental snapshots reuse immutable segment files (our shard/docstore
parts are immutable once written, same invariant).
"""

from __future__ import annotations

import json
import os
import shutil

_MARKER = "_SNAPSHOT_DONE"
_SUBDIRS = ("shards", "docstore", "manifest", "tombstones",
            "positions", "ann")


def _copy_tree(src: str, dst: str) -> int:
    """Hardlink-or-copy every file under src into dst; returns count."""
    n = 0
    for root, _dirs, files in os.walk(src):
        rel = os.path.relpath(root, src)
        out = os.path.join(dst, rel) if rel != "." else dst
        os.makedirs(out, exist_ok=True)
        for f in files:
            s = os.path.join(root, f)
            d = os.path.join(out, f)
            tmp = d + ".tmp"
            try:
                if os.path.exists(tmp):
                    os.unlink(tmp)
                os.link(s, tmp)             # metadata-only when possible
            except OSError:
                shutil.copy2(s, tmp)
            os.replace(tmp, d)
            n += 1
    return n


def snapshot_index(index_dir: str, snap_dir: str) -> dict:
    """Snapshot a complete index into ``snap_dir``.  Refuses to
    snapshot an index without a stats manifest (nothing to serve).
    Idempotent: an existing complete snapshot is left untouched."""
    from onestools_eventlog_ray.state import checkpoint as ckpt
    stats = ckpt.read_stats(index_dir)          # raises if incomplete
    if os.path.exists(os.path.join(snap_dir, _MARKER)):
        with open(os.path.join(snap_dir, _MARKER)) as f:
            return json.load(f)
    os.makedirs(snap_dir, exist_ok=True)
    n_files = 0
    copied = []
    for sub in _SUBDIRS:
        s = os.path.join(index_dir, sub)
        if os.path.isdir(s):
            n_files += _copy_tree(s, os.path.join(snap_dir, sub))
            copied.append(sub)
    for entry in os.listdir(index_dir):         # field-*/ subindexes, markers
        p = os.path.join(index_dir, entry)
        if entry.startswith("field-") and os.path.isdir(p):
            n_files += _copy_tree(p, os.path.join(snap_dir, entry))
            copied.append(entry)
        elif os.path.isfile(p):
            n_files += _copy_tree_file(p, os.path.join(snap_dir, entry))
    info = {"n_files": n_files, "subdirs": sorted(copied),
            "n_docs": int(stats["n_docs"]),
            "layout_version": stats.get("layout_version")}
    tmp = os.path.join(snap_dir, _MARKER + ".tmp")
    with open(tmp, "w") as f:
        json.dump(info, f)
    os.replace(tmp, os.path.join(snap_dir, _MARKER))
    return info


def _copy_tree_file(src: str, dst: str) -> int:
    tmp = dst + ".tmp"
    try:
        if os.path.exists(tmp):
            os.unlink(tmp)
        os.link(src, tmp)
    except OSError:
        shutil.copy2(src, tmp)
    os.replace(tmp, dst)
    return 1


def restore_index(snap_dir: str, dest_dir: str) -> dict:
    """Restore a snapshot into ``dest_dir`` and validate it serves:
    requires the completion marker, copies everything back, then runs
    the stats-manifest + layout-version gate."""
    marker = os.path.join(snap_dir, _MARKER)
    if not os.path.exists(marker):
        raise FileNotFoundError(
            f"no complete snapshot at {snap_dir} (missing {_MARKER})")
    os.makedirs(dest_dir, exist_ok=True)
    for entry in os.listdir(snap_dir):
        if entry.startswith(_MARKER):
            continue
        p = os.path.join(snap_dir, entry)
        if os.path.isdir(p):
            _copy_tree(p, os.path.join(dest_dir, entry))
        else:
            _copy_tree_file(p, os.path.join(dest_dir, entry))
    from onestools_eventlog_ray.state import checkpoint as ckpt
    stats = ckpt.read_stats(dest_dir)
    ckpt.check_layout(stats, dest_dir)
    with open(marker) as f:
        return json.load(f)
