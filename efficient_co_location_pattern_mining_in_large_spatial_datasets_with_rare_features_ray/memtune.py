"""Per-process allocator tuning for fault-expensive hosts.

On this engine's target hosts (VM sandboxes and cloud nodes alike),
first-touch minor page faults are far more expensive than the arithmetic
they enable -- measured here at 50-100us per 4 KiB fault (a Firecracker-
style VMM services them in userspace), versus ~12 ms to FILL the same
80 MB from warm pages. glibc's default M_MMAP_THRESHOLD (128 KiB) sends
every numpy scratch buffer to mmap/munmap, so EVERY task in a
long-lived Ray worker re-faults its entire working set: a vectorized
kernel that computes for 20 ms spends 500 ms in the kernel. Raising the
mmap threshold and the trim threshold keeps freed buffers in the arena,
so a worker's steady-state tasks allocate from warm pages.

OPT-IN: tuning only applies when ``CLPM_MEMTUNE`` is set in the
environment (bench.py sets it; Ray workers inherit the driver's env on
a locally started cluster, and multi-node deployments set it in the
worker env). The hook is *invoked* once per process at package import
(Ray workers import the package when they deserialize our task
functions -- the only point we can reach every worker process), but
without the env var it is a no-op, so merely importing the package
never mutates a host application's allocator state. Idempotent, no-op
on non-glibc platforms. Bounded: the arena retains at most the worker's
high-water scratch mark (a few hundred MB for the mining kernels), the
same memory the task would have touched anyway.

pyarrow's pool (jemalloc here) is handled separately: its default
10 s dirty-page decay already reuses pages across back-to-back tasks;
``jemalloc_set_decay_ms(-1)`` pins that behavior where available.
"""

from __future__ import annotations

import ctypes
import ctypes.util

_M_TRIM_THRESHOLD = -1
_M_TOP_PAD = -2
_M_MMAP_THRESHOLD = -3

_done = False


def tune(force: bool = False) -> None:
    """Raise glibc malloc thresholds + pin jemalloc decay (idempotent).
    No-op unless CLPM_MEMTUNE is set (opt-in) or ``force=True``."""
    global _done
    if _done:
        return
    import os

    if not force and not os.environ.get("CLPM_MEMTUNE"):
        return  # opt-in only: never mutate allocator state as an import side effect
    _done = True
    try:
        libc = ctypes.CDLL(None)
        # numpy block buffers run tens of MB: keep them off mmap entirely
        libc.mallopt(_M_MMAP_THRESHOLD, 1 << 30)
        # retain freed top-of-heap up to 256 MB instead of returning it
        libc.mallopt(_M_TRIM_THRESHOLD, 256 << 20)
        # grow the heap in 64 MB steps to amortize brk faults
        libc.mallopt(_M_TOP_PAD, 64 << 20)
    except Exception:
        pass  # non-glibc / restricted environment: defaults apply
    try:
        import pyarrow as pa

        pa.jemalloc_set_decay_ms(-1)
    except Exception:
        pass
