"""Worker-side runtime pinning.

Ray budgets ONE logical CPU per task, but PyArrow's internal thread
pool defaults to every core on the host — so an 8-CPU ``ray.init``
actually burns ~13 effective cores through Acero/compute kernels
(measured: 165 s process-CPU over 13 s wall across 8 workers).  That
silently oversubscribes the machine, and it wrecks the N-vs-4N scaling
proxy: the low-CPU level borrows proportionally more hidden cores than
the high one, so measured efficiency understates the engine.

``pin_worker_threads()`` caps Arrow's compute/IO pools at 1 thread for
this process; every CPU-heavy stage calls it once (cheap, idempotent).
The driver process is intentionally NOT pinned.
"""

from __future__ import annotations

_PINNED = False


def pin_worker_threads(n: int = 1) -> None:
    global _PINNED
    if _PINNED:
        return
    import pyarrow as pa
    pa.set_cpu_count(n)
    pa.set_io_thread_count(max(n, 1))
    _PINNED = True
