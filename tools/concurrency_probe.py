"""Engine-independent concurrency-inflation probe.

N worker processes each run an IDENTICAL, fixed-size, memory-bound
kernel mix (sorted-array probe + gather + sort over 64 MB arrays --
the same primitive mix as the mining engine's hot kernels). On hardware
that scales, per-process time is constant in N; on this sandbox's
single socket the per-process time inflates with concurrency because
all workers share one memory bus (plus documented hypervisor steal).

The ratio med(N=4)/med(N=16) is the HARDWARE's own 4 -> 16 scaling
efficiency ceiling for bandwidth-bound work: a perfectly parallel
engine cannot measure above it on such kernels. Used as evidence in
BASELINE.md's scaling section. Run: python tools/concurrency_probe.py
"""

from __future__ import annotations

import multiprocessing as mp
import os
import sys
import time


def work(q):
    os.environ["CLPM_MEMTUNE"] = "1"
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray  # noqa: F401,E501 (memtune)
    import numpy as np

    rng = np.random.default_rng(0)
    keys = np.sort(rng.integers(0, 1 << 40, size=8_000_000))
    q_arr = rng.integers(0, 1 << 40, size=8_000_000)
    buf = np.empty(8_000_000, np.int64)
    buf.fill(1)  # pre-fault the arena (isolate bandwidth from VMM faults)
    t0 = time.perf_counter()
    for _ in range(3):
        pos = np.searchsorted(keys, q_arr)        # random-access probe
        buf = keys[np.minimum(pos, len(keys) - 1)]  # gather
        _ = np.sort(q_arr)                        # sort
    q.put(time.perf_counter() - t0)


def main():
    meds = {}
    for n in (2, 4, 8, 16):
        qq = mp.Queue()
        ps = [mp.Process(target=work, args=(qq,)) for _ in range(n)]
        [p.start() for p in ps]
        times = sorted(qq.get() for _ in ps)
        [p.join() for p in ps]
        meds[n] = times[n // 2]
        print(f"n={n:2d} per-proc med={meds[n]:.2f}s max={times[-1]:.2f}s")
        time.sleep(5)
    print(f"hardware 2->8 efficiency ceiling:  {meds[2] / meds[8]:.2f}")
    print(f"hardware 4->16 efficiency ceiling: {meds[4] / meds[16]:.2f}")


if __name__ == "__main__":
    main()
