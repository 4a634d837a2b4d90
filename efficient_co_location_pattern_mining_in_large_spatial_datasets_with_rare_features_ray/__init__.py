"""Ray-Data-native co-location pattern mining engine (rare-feature WPI).

A from-scratch distributed implementation of the ordered-NR-tree / WPI
co-location mining algorithm (Yang et al., KAIS 63:1365-1395, 2021) on
Ray Data, with the same query semantics as the single-threaded C++
reference (see SURVEY.md for the operator inventory and file:line
citations into /root/reference).

Layout:
    config       -- MiningConfig dataclass (reference include/config.h:20-46)
    canonical    -- canonical feature order + prevalence math (delta/RI/PR/WPI)
    oracle       -- pure-Python serial reference oracle (conformance gate)
    sources/     -- image-table fixtures, codecs, geotag projection, readers
    stages/      -- grid join, star build, subtree mining (the 3 shuffles)
    functions/   -- vectorized text/dedup/similarity kernels
    pipelines/   -- end-to-end Dataset pipelines
    state/       -- checkpoint manifests, broadcast helpers
"""

from . import memtune as _memtune
from .config import MiningConfig
from .canonical import FeatureContext

# Opt-in allocator tuning for fault-expensive hosts: no-op unless
# CLPM_MEMTUNE is set in the env (bench.py sets it). Invoked at import
# because Ray worker processes import this package when deserializing
# task functions -- the one hook that reaches every worker. See memtune.py.
_memtune.tune()

__all__ = ["MiningConfig", "FeatureContext"]
