"""Scaling decomposition probe — isolates single-node HARDWARE
contention from SOFTWARE (scheduling/barrier) overhead in the 8-vs-32
CPU strong-scaling measurement.

The build's map phase (tokenize + Acero tf groupby + sha256) is
embarrassingly parallel with zero shared state; any per-document CPU
inflation when 32 copies run co-located instead of 8 is memory-bandwidth
/ L3 contention of the shared host — a single-node artifact that does
not exist on a real N-node vs 4N-node cluster, where each node brings
its own memory system.

For each level K in (8, 32) this script (in a FRESH subprocess):
  ray.init(num_cpus=K); submit the identical map workload as raw tasks
  (~8k docs each) over the same corpus; each task reports its document
  count and its PROCESS CPU time (time.process_time, covering the
  Arrow/NumPy work).  Reports per-doc CPU and wall.

Outputs one JSON line:
  cpu_inflation_32v8   = per_doc_cpu_32 / per_doc_cpu_8 (hardware term)
  raw_map_efficiency   = (wall8 / wall32) / 4
  sw_map_efficiency    = raw_map_efficiency * cpu_inflation_32v8
                         (what the software layer alone would deliver
                          if 32 cores had 4x the memory systems)

Usage:  python tools/scaling_probe.py [n_docs]          (driver)
        python tools/scaling_probe.py --level K n_docs  (subprocess)
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = (_REPO + os.pathsep +
                            os.environ.get("PYTHONPATH", "")).rstrip(os.pathsep)


def run_level(ncpu: int, n_docs: int) -> dict:
    import ray
    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    from onestools_eventlog_ray.synth import write_corpus
    corpus = f"/tmp/oel_bench_corpus/n{n_docs}_s42"
    write_corpus(corpus, n_docs=n_docs, seed=42)

    @ray.remote
    def probe(*blocks):
        import pyarrow as pa
        from onestools_eventlog_ray.functions.runtime import pin_worker_threads
        pin_worker_threads()
        from onestools_eventlog_ray.functions.analyzer import doc_term_table
        from onestools_eventlog_ray.functions.hashing import sha256_hex
        from onestools_eventlog_ray.stages.normalize import add_doc_id
        from onestools_eventlog_ray.sources.corpus import CODE_CORPUS_SPEC
        t0 = time.process_time()
        n = 0
        for block in blocks:
            b = add_doc_id(block, CODE_CORPUS_SPEC)
            triples, stats = doc_term_table(b["doc_id"], b["content"])
            sha = sha256_hex(b["content"])
            n += block.num_rows
            del triples, stats, sha
        return n, time.process_time() - t0

    # warm workers (imports) before timing
    ray.get([probe.remote() for _ in range(ncpu)])

    import ray.data
    ds = ray.data.read_parquet(corpus)
    t0 = time.monotonic()          # wall INCLUDES the streamed read +
    refs = []                      # submission (part of the map phase)
    pending, rows = [], 0
    for bundle in ds.iter_internal_ref_bundles():
        for block_ref, meta in zip(bundle.block_refs, bundle.metadata):
            pending.append(block_ref)
            rows += meta.num_rows or 0
            if rows >= 8000:
                refs.append(probe.remote(*pending))
                pending, rows = [], 0
    if pending:
        refs.append(probe.remote(*pending))
    out = ray.get(refs)
    wall = time.monotonic() - t0
    ray.shutdown()
    total_docs = sum(n for n, _ in out)
    total_cpu = sum(c for _, c in out)
    return {"ncpu": ncpu, "wall_s": round(wall, 3),
            "cpu_s": round(total_cpu, 3), "n_docs": total_docs,
            "per_doc_cpu_us": round(total_cpu / total_docs * 1e6, 2)}


def main():
    if "--level" in sys.argv:
        i = sys.argv.index("--level")
        print(json.dumps(run_level(int(sys.argv[i + 1]),
                                   int(sys.argv[i + 2]))))
        return
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    trials = int(os.environ.get("OEL_PROBE_TRIALS", "3"))
    lo, hi = (int(x) for x in
              os.environ.get("OEL_SCALING_LEVELS", "8,32").split(","))
    best: dict[int, dict] = {}
    levels = (1, lo, hi)
    for _t in range(trials):
        for k in levels:
            # per-doc CPU is scale-free: the (slow) solo level uses a
            # quarter corpus to keep the probe's wall reasonable
            nd = max(100_000, n_docs // 4) if k == 1 else n_docs
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--level", str(k), str(nd)],
                capture_output=True, text=True, check=True, cwd=_REPO)
            r = json.loads(out.stdout.strip().splitlines()[-1])
            if k not in best or r["wall_s"] < best[k]["wall_s"]:
                best[k] = r
    infl = best[hi]["per_doc_cpu_us"] / best[lo]["per_doc_cpu_us"]
    raw_eff = (best[lo]["wall_s"] / best[hi]["wall_s"]) / (hi / lo)
    print(json.dumps({
        "metric": "map_phase_scaling_decomposition",
        "n_docs": n_docs,
        "levels": {str(k): best[k] for k in levels},
        "level_pair": [lo, hi],
        # per-doc CPU inflation = pure memory-system contention (the
        # kernels are single-threaded: CPU/wall ratio 1.0 measured solo)
        "cpu_inflation_lo_v1": round(best[lo]["per_doc_cpu_us"]
                                     / best[1]["per_doc_cpu_us"], 3),
        f"cpu_inflation_{hi}v{lo}": round(infl, 3),
        # even PERFECT software cannot beat this on one box: the same
        # work costs infl x more CPU when `hi` cores share the memory bus
        "hardware_efficiency_cap": round(1.0 / infl, 3),
        "hardware_efficiency_cap_8to32": round(1.0 / infl, 3)
            if (lo, hi) == (8, 32) else None,       # legacy alias
        "raw_map_efficiency": round(raw_eff, 3),
        "sw_map_efficiency": round(raw_eff * infl, 3),
    }))


if __name__ == "__main__":
    main()
