"""Multi-corpus manager — the orchestration plane.

The reference runs one exporter pipeline per tenant database, discovered
by parsing a cluster registry file and filtering it through regex mask
templates; registry changes are diffed to start/stop pipelines
(``/root/reference/OneSTools.EventLog.Exporter.Manager/ExportersManager.cs:110-221``,
``ClstWatcher.cs:46-90`` — SURVEY.md §3.2, §2.1 S6, §2.3 F3, §2.8 D1).

Here the registry is a JSON file listing corpora; ``sync_registry``
diffs it against the managed state (a JSON state file — the analog of
the ``_runExporters`` dict, ST6) and builds / refreshes / retires
indexes accordingly.  Each corpus build is the normal resumable
``build_index`` (so a crashed sync just reruns), and a corpus whose
input signature changed is rebuilt as a refresh.

Registry entry::

    {"name": "my-corpus", "corpus": "/data/corpus-a",
     "index_root": "/indexes/corpus-a", "enabled": true}

plus an optional top-level ``mask`` regex: only entries whose name
matches are managed (the reference's template mask semi-join).
"""

from __future__ import annotations

import json
import os
import re
import time

from onestools_eventlog_ray.config import EngineConfig
from onestools_eventlog_ray.pipelines.build import build_index, _input_signature
from onestools_eventlog_ray.sources.corpus import CorpusSpec, CODE_CORPUS_SPEC
from onestools_eventlog_ray.state.checkpoint import atomic_write_text


def read_registry(path: str) -> dict:
    with open(path) as f:
        reg = json.load(f)
    if isinstance(reg, list):            # bare list shorthand
        reg = {"corpora": reg}
    return reg


def _state_path(registry_path: str) -> str:
    return registry_path + ".state.json"


def read_state(registry_path: str) -> dict:
    try:
        with open(_state_path(registry_path)) as f:
            return json.load(f)
    except FileNotFoundError:
        return {"managed": {}}


def _defuse_fsspec_http_import_race() -> None:
    """Ray Data's path resolver lazily does ``from
    fsspec.implementations.http import HTTPFileSystem`` and catches only
    ``ModuleNotFoundError``.  With aiohttp absent, two driver threads
    resolving paths simultaneously can race the module init: the loser
    sees a half-initialized module and gets a plain ``ImportError``
    that ESCAPES Ray's handler (observed in parallel manager builds).
    Pre-register a minimal stand-in module so the import always
    succeeds atomically; Ray's isinstance check then returns False —
    the same outcome as the ModuleNotFoundError path."""
    import sys
    import types
    name = "fsspec.implementations.http"
    if name in sys.modules:
        return
    try:
        __import__(name)
    except ImportError:
        # ONLY the missing/racing-dependency case (ModuleNotFoundError is
        # a subclass): any other exception is a genuine bug and must
        # propagate instead of silently disabling HTTP filesystem support
        # process-wide (round-2 ADVICE, low)
        import logging
        logging.getLogger(__name__).info(
            "fsspec.implementations.http unavailable (aiohttp missing?): "
            "installing inert stand-in module")
        mod = types.ModuleType(name)

        class HTTPFileSystem:          # sentinel; never instantiated
            pass

        mod.HTTPFileSystem = HTTPFileSystem
        sys.modules[name] = mod


def sync_registry(registry_path: str,
                  spec: CorpusSpec = CODE_CORPUS_SPEC,
                  cfg: EngineConfig = EngineConfig(),
                  max_parallel: int = 1) -> dict:
    """One reconciliation round: registry ∖ state diff -> build new /
    refresh changed / retire removed.  Returns the action report.

    ``max_parallel`` > 1 runs that many corpus builds CONCURRENTLY from
    driver threads (the reference runs one exporter pipeline per tenant
    in parallel, ``ExportersManager.cs:110-221``).  Builds share the
    one Ray scheduler, which interleaves their tasks; each build's
    state (index dir, manifest) is fully independent, and a failed
    build leaves its own resumable manifest without affecting others.
    Useful when corpora are small relative to the cluster — one big
    build already saturates it alone."""
    reg = read_registry(registry_path)
    mask = re.compile(reg.get("mask", ".*"))
    state = read_state(registry_path)
    managed: dict[str, dict] = state.get("managed", {})

    wanted = {e["name"]: e for e in reg.get("corpora", [])
              if e.get("enabled", True) and mask.search(e["name"])}

    report = {"built": [], "refreshed": [], "unchanged": [],
              "retired": [], "skipped_by_mask": [
                  e["name"] for e in reg.get("corpora", [])
                  if not mask.search(e["name"])]}

    todo: list[tuple[str, dict, str, dict | None]] = []
    for name, entry in wanted.items():
        sig = _input_signature(entry["corpus"])
        prior = managed.get(name)
        if prior and prior.get("input_signature") == sig:
            report["unchanged"].append(name)
            continue
        todo.append((name, entry, sig, prior))

    def run_one(item):
        name, entry, sig, prior = item
        rep = build_index(entry["corpus"], entry["index_root"],
                          spec=spec, cfg=cfg)
        return name, entry, sig, prior, rep

    if max_parallel > 1 and len(todo) > 1:
        from concurrent.futures import ThreadPoolExecutor
        _defuse_fsspec_http_import_race()
        with ThreadPoolExecutor(max_workers=max_parallel) as pool:
            results = list(pool.map(run_one, todo))
    else:
        results = [run_one(t) for t in todo]

    for name, entry, sig, prior, rep in results:
        managed[name] = {
            "corpus": entry["corpus"],
            "index_root": entry["index_root"],
            "input_signature": sig,
            "fingerprint": rep["fingerprint"],
            "n_docs": rep["n_docs"],
            "last_build_unix": time.time(),
        }
        report["refreshed" if prior else "built"].append(name)

    for name in list(managed):
        if name not in wanted:
            managed[name]["retired"] = True
            report["retired"].append(name)
            del managed[name]

    atomic_write_text(_state_path(registry_path),
                      json.dumps({"managed": managed}, indent=1))
    return report


def watch_registry(registry_path: str, interval_s: float = 30.0,
                   max_rounds: int | None = None, **kw) -> list[dict]:
    """Poll-based analog of the reference's registry FileSystemWatcher:
    re-sync whenever the registry file changes (or every round)."""
    rounds = []
    last_mtime = None
    n = 0
    while max_rounds is None or n < max_rounds:
        mtime = os.stat(registry_path).st_mtime_ns
        if mtime != last_mtime:
            rounds.append(sync_registry(registry_path, **kw))
            last_mtime = mtime
        n += 1
        if max_rounds is None or n < max_rounds:
            time.sleep(interval_s)
    return rounds
