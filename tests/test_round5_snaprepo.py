"""Round-5: content-addressed snapshot repository (ES incremental
snapshots): blob reuse across generations, integrity-verified restore,
delete with safe garbage collection."""
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture()
def idx(ray_session, tmp_path):
    from onestools_eventlog_ray.config import EngineConfig
    from onestools_eventlog_ray.pipelines.build import build_index
    from onestools_eventlog_ray.sources.corpus import DOCUMENTS_SPEC

    corpus = str(tmp_path / "docs.parquet")
    texts = [f"spark vector doc number {i} with shared words" for i in
             range(20)]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(1, 21), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * 20),
        "source": pa.array(["t"] * 20),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), corpus)
    d = str(tmp_path / "idx")
    build_index(corpus, d, spec=DOCUMENTS_SPEC, cfg=EngineConfig())
    return d


def _blob_count(repo):
    n = 0
    for root, _d, files in os.walk(os.path.join(repo, "blobs")):
        n += len(files)
    return n


def test_repo_incremental_reuse_and_restore(idx, tmp_path):
    from onestools_eventlog_ray.pipelines.query import SearchEngine
    from onestools_eventlog_ray.state.snapshot import (repo_report,
                                                       restore_from_repo,
                                                       snapshot_to_repo)
    from onestools_eventlog_ray.state.tombstones import delete_docs

    repo = str(tmp_path / "repo")
    s1 = snapshot_to_repo(idx, repo, "s1")
    assert s1["n_blobs_new"] == s1["n_files"] and s1["n_blobs_reused"] == 0
    # idempotent re-snapshot returns the stored summary, writes nothing
    assert snapshot_to_repo(idx, repo, "s1") == s1
    before = _blob_count(repo)

    base_hits = SearchEngine(idx).search(["spark"], k=5, tie="e6")
    victim = base_hits[0][0]
    delete_docs(idx, [victim])                  # mutates tombstones only

    s2 = snapshot_to_repo(idx, repo, "s2")
    assert s2["n_blobs_reused"] >= s1["n_files"] - 2   # almost all reused
    assert 1 <= s2["n_blobs_new"] <= 2                 # the tombstone file
    assert _blob_count(repo) == before + s2["n_blobs_new"]

    r1 = str(tmp_path / "r1")
    r2 = str(tmp_path / "r2")
    restore_from_repo(repo, "s1", r1)
    restore_from_repo(repo, "s2", r2)
    assert SearchEngine(r1).search(["spark"], k=5, tie="e6") == base_hits
    got2 = SearchEngine(r2).search(["spark"], k=5, tie="e6")
    assert victim not in [d for d, _ in got2]

    rep = repo_report(repo).to_pandas().set_index("snap_name")
    assert rep.loc["s1", "n_blobs_new"] == s1["n_blobs_new"]
    assert rep.loc["s2", "n_blobs_reused"] == s2["n_blobs_reused"]


def test_repo_delete_gc_keeps_shared_blobs(idx, tmp_path):
    from onestools_eventlog_ray.state.snapshot import (delete_repo_snapshot,
                                                       restore_from_repo,
                                                       snapshot_to_repo)
    from onestools_eventlog_ray.state.tombstones import delete_docs

    repo = str(tmp_path / "repo")
    s1 = snapshot_to_repo(idx, repo, "s1")
    delete_docs(idx, [1])
    s2 = snapshot_to_repo(idx, repo, "s2")

    gone = delete_repo_snapshot(repo, "s1")
    # only the blobs unique to s1 (the pre-delete tombstone state, if
    # any file differed) are removed; everything shared with s2 stays
    assert gone["blobs_kept"] >= s1["n_files"] - 2
    dest = str(tmp_path / "r2")
    restore_from_repo(repo, "s2", dest)         # still verifies sha-exact

    gone2 = delete_repo_snapshot(repo, "s2")
    assert gone2["blobs_removed"] == s2["n_blobs_new"] + gone["blobs_kept"]
    assert _blob_count(repo) == 0


def test_repo_corrupt_blob_refuses(idx, tmp_path):
    from onestools_eventlog_ray.state.snapshot import (restore_from_repo,
                                                       snapshot_to_repo)
    repo = str(tmp_path / "repo")
    snapshot_to_repo(idx, repo, "s1")
    # corrupt one blob
    broot = os.path.join(repo, "blobs")
    first = None
    for root, _d, files in os.walk(broot):
        for f in files:
            first = os.path.join(root, f)
            break
        if first:
            break
    os.chmod(first, 0o644)
    with open(first, "r+b") as f:
        f.seek(0)
        b = f.read(1)
        f.seek(0)
        f.write(bytes([b[0] ^ 0xFF]))
    with pytest.raises(IOError):
        restore_from_repo(repo, "s1", str(tmp_path / "r"))
