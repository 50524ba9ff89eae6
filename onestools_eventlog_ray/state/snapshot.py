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


# ---------------------------------------------------------------------------
# Snapshot REPOSITORY: content-addressed blob pool + named snapshots
# (the ES `_snapshot` repository format — incremental across generations)
# ---------------------------------------------------------------------------

_REPO_SNAPDIR = "snapshots"
_REPO_BLOBDIR = "blobs"


def _sha256_file(path: str, bufsize: int = 1 << 20) -> str:
    import hashlib
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            chunk = f.read(bufsize)
            if not chunk:
                break
            h.update(chunk)
    return h.hexdigest()


def _index_files(index_dir: str):
    """Every file the query paths read, as (relpath, abspath), sorted —
    the same walk set snapshot_index copies."""
    out = []
    for sub in _SUBDIRS:
        s = os.path.join(index_dir, sub)
        if os.path.isdir(s):
            for root, _d, files in os.walk(s):
                for f in sorted(files):
                    p = os.path.join(root, f)
                    out.append((os.path.relpath(p, index_dir), p))
    for entry in sorted(os.listdir(index_dir)):
        p = os.path.join(index_dir, entry)
        if entry.startswith("field-") and os.path.isdir(p):
            for root, _d, files in os.walk(p):
                for f in sorted(files):
                    q = os.path.join(root, f)
                    out.append((os.path.relpath(q, index_dir), q))
        elif os.path.isfile(p):
            out.append((entry, p))
    return sorted(out)


def snapshot_to_repo(index_dir: str, repo_dir: str, snap_name: str) -> dict:
    """Snapshot an index into a content-addressed REPOSITORY — the ES
    incremental-snapshot model: blobs are stored once per distinct file
    content (``blobs/<aa>/<sha256>``), a named manifest lists
    (relpath, sha, size), and a later snapshot of a mutated index
    re-uploads ONLY the blobs the mutation created (our shard/docstore
    parts are immutable once written, so generational adds / tombstone
    writes / compactions touch a small file set; everything else is
    manifest-only reuse).

    100-TB story: each data node would hash+upload its own shard files
    (the walk is per-file and stateless — trivially a map_batches over
    the file list); the driver writes only the manifest.  Blob writes
    are tmp + atomic rename and content-keyed, hence idempotent under
    retries and concurrent snapshots.  Returns
    {n_files, n_bytes, n_blobs_new, n_blobs_reused}."""
    from onestools_eventlog_ray.state import checkpoint as ckpt
    stats = ckpt.read_stats(index_dir)          # refuse incomplete index
    snaps = os.path.join(repo_dir, _REPO_SNAPDIR)
    blobs = os.path.join(repo_dir, _REPO_BLOBDIR)
    os.makedirs(snaps, exist_ok=True)
    os.makedirs(blobs, exist_ok=True)
    man_path = os.path.join(snaps, snap_name + ".json")
    if os.path.exists(man_path):                # idempotent re-snapshot
        with open(man_path) as f:
            return json.load(f)["summary"]
    files, new, reused, total = [], 0, 0, 0
    for rel, path in _index_files(index_dir):
        sha = _sha256_file(path)
        size = os.path.getsize(path)
        bdir = os.path.join(blobs, sha[:2])
        bpath = os.path.join(bdir, sha)
        if os.path.exists(bpath):
            reused += 1
        else:
            os.makedirs(bdir, exist_ok=True)
            tmp = bpath + f".tmp.{os.getpid()}"
            try:
                os.link(path, tmp)
            except OSError:
                shutil.copy2(path, tmp)
            os.replace(tmp, bpath)
            new += 1
        files.append({"path": rel, "sha": sha, "size": size})
        total += size
    summary = {"snap_name": snap_name, "n_files": len(files),
               "n_bytes": total, "n_blobs_new": new,
               "n_blobs_reused": reused,
               "n_docs": int(stats["n_docs"]),
               "layout_version": stats.get("layout_version")}
    tmp = man_path + f".tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump({"summary": summary, "files": files}, f)
    os.replace(tmp, man_path)                   # manifest commit = done
    return summary


def restore_from_repo(repo_dir: str, snap_name: str, dest_dir: str) -> dict:
    """Materialize a named repository snapshot into ``dest_dir`` with
    per-file sha256 integrity verification, then run the layout gate
    before it may serve (a corrupt or cross-version blob refuses,
    never mis-serves)."""
    man_path = os.path.join(repo_dir, _REPO_SNAPDIR, snap_name + ".json")
    if not os.path.exists(man_path):
        raise FileNotFoundError(f"no snapshot '{snap_name}' in {repo_dir}")
    with open(man_path) as f:
        man = json.load(f)
    blobs = os.path.join(repo_dir, _REPO_BLOBDIR)
    for ent in man["files"]:
        bpath = os.path.join(blobs, ent["sha"][:2], ent["sha"])
        got = _sha256_file(bpath)
        if got != ent["sha"]:
            raise IOError(f"blob corrupt for {ent['path']}: "
                          f"{got} != {ent['sha']}")
        dst = os.path.join(dest_dir, ent["path"])
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        _copy_tree_file(bpath, dst)
    from onestools_eventlog_ray.state import checkpoint as ckpt
    stats = ckpt.read_stats(dest_dir)
    ckpt.check_layout(stats, dest_dir)
    return man["summary"]


def delete_repo_snapshot(repo_dir: str, snap_name: str) -> dict:
    """Delete a named snapshot and garbage-collect blobs no OTHER
    snapshot references (the ES delete-with-safe-GC contract: blob
    liveness is the union of all remaining manifests)."""
    snaps = os.path.join(repo_dir, _REPO_SNAPDIR)
    man_path = os.path.join(snaps, snap_name + ".json")
    if not os.path.exists(man_path):
        raise FileNotFoundError(f"no snapshot '{snap_name}' in {repo_dir}")
    with open(man_path) as f:
        dead = {e["sha"] for e in json.load(f)["files"]}
    os.unlink(man_path)                          # snapshot gone FIRST
    live: set[str] = set()
    for entry in os.listdir(snaps):
        if entry.endswith(".json"):
            with open(os.path.join(snaps, entry)) as f:
                live.update(e["sha"] for e in json.load(f)["files"])
    removed = 0
    for sha in sorted(dead - live):
        bpath = os.path.join(repo_dir, _REPO_BLOBDIR, sha[:2], sha)
        if os.path.exists(bpath):
            os.unlink(bpath)
            removed += 1
    return {"deleted": snap_name, "blobs_removed": removed,
            "blobs_kept": len(dead & live)}


def repo_report(repo_dir: str):
    """Per-snapshot repository accounting table: files, logical bytes,
    blobs newly uploaded vs reused at snapshot time — the dashboard
    behind ES ``GET _snapshot/<repo>/_all``.
    -> (snap_name, n_files, n_bytes, n_blobs_new, n_blobs_reused)."""
    import pyarrow as pa
    snaps = os.path.join(repo_dir, _REPO_SNAPDIR)
    rows = []
    if os.path.isdir(snaps):
        for entry in sorted(os.listdir(snaps)):
            if entry.endswith(".json"):
                with open(os.path.join(snaps, entry)) as f:
                    rows.append(json.load(f)["summary"])
    return pa.table({
        "snap_name": pa.array([r["snap_name"] for r in rows], pa.string()),
        "n_files": pa.array([r["n_files"] for r in rows], pa.int64()),
        "n_bytes": pa.array([r["n_bytes"] for r in rows], pa.int64()),
        "n_blobs_new": pa.array([r["n_blobs_new"] for r in rows],
                                pa.int64()),
        "n_blobs_reused": pa.array([r["n_blobs_reused"] for r in rows],
                                   pa.int64()),
    })
