"""Driver-side runtime knobs.

``task_num_cpus`` is the logical-CPU claim per memory-bound task
(annotation, sketching).  It is a SCHEDULING argument — evaluated on
the driver when the pipeline is built, so a plain module global works;
worker processes never read it.  Default 1 (one task per core).  Raise
to 2 on nodes whose delivered memory bandwidth saturates below the
vCPU count — bench.py's bandwidth probe measures and sets this
automatically; see BASELINE.md session-5 forensics for the failure
mode it guards against (32-way slower than 16-way on an
oversubscribed hypervisor).
"""

from __future__ import annotations

_TASK_NUM_CPUS = 1


def task_num_cpus() -> int:
    return _TASK_NUM_CPUS


def set_task_num_cpus(n: int) -> None:
    global _TASK_NUM_CPUS
    _TASK_NUM_CPUS = max(1, int(n))
