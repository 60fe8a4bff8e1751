"""Per-worker-process tuning.

Ray schedules one task per CPU, but pyarrow's compute kernels default
to an internal thread pool sized to ALL cores — 32 concurrent tasks ×
32-thread pools oversubscribes the node catastrophically (measured: the
canonicalize tail ran 2× slower at 32 CPUs than at 8).  Every stage
function calls ``ensure_worker_tuned()`` once per process to pin Arrow
(and NumPy/BLAS via env, set by Ray already) to a single thread; Ray
owns the parallelism.
"""

from __future__ import annotations

_TUNED = False


def ensure_worker_tuned() -> None:
    global _TUNED
    if _TUNED:
        return
    import pyarrow as pa

    try:
        pa.set_cpu_count(1)
        pa.set_io_thread_count(2)
    except Exception:
        pass
    _TUNED = True
