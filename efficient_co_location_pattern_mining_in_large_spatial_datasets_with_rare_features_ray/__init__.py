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

_memtune.tune()  # once per process; see memtune.py (fault-expensive hosts)

__all__ = ["MiningConfig", "FeatureContext"]
