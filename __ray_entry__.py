"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in the library) calls ray.init()/ray.shutdown().

* ``entry()``      -- flagship co-location mining pipeline on sf0.001.
* ``queries()``    -- one callable per implemented operator/pipeline
                      (SURVEY.md sec. 2 + training-data ops), taking sf_dir.
* ``oracle_sql()`` -- exact DuckDB SQL for every SQL-expressible query
                      (same column names; iterative/heuristic ops omitted
                      -> rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines import (
    queries as _colo_q,
)


def entry() -> Any:
    """Flagship: full rare-feature WPI co-location mining over the
    deterministic spatial projection of sf0.001 events (read ->
    distance join -> ordered stars -> per-subtree level loop)."""
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.config import (
        MiningConfig,
    )
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines import (
        colocation,
    )
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.sources.instances import (
        instances_from_events,
    )

    inst = instances_from_events("/root/testdata/sf0.001")
    # sf0.001 is sparse (1k points / 1e6 area): widen d so patterns exist
    run = colocation.mine(
        inst, MiningConfig(neighbor_distance=20.0, min_prevalence=0.15)
    )
    return run.patterns


def queries() -> dict[str, Callable[[str], Any]]:
    out: dict[str, Callable[[str], Any]] = {}
    out.update(_colo_q.COLO_QUERIES)
    out.update(_colo_q.SPATIAL_QUERIES)
    out.update(_colo_q.DATA_QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(_colo_q.COLO_SQL)
    out.update(_colo_q.SPATIAL_SQL)
    out.update(_colo_q.DATA_SQL)
    return out
