"""The driver's flagship oracle (sql_patterns_full, unrolled k<=3
apriori SQL) must equal the engine at a parameter point where k=3
patterns actually EXIST -- proving the k3 level is exercised, not
vacuous -- and at the driver's own (d, mp)."""

import duckdb
import pytest

from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.config import (
    MiningConfig,
)
from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines import (
    colocation,
)
from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines.queries import (
    _patterns_out,
    sql_patterns_full,
)
from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.sources.instances import (
    instances_from_events,
)

SF_DIR = "/root/testdata/sf0.001"


def _duck(sql: str):
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'")
    return con.sql(sql).df()


@pytest.mark.parametrize("d,mp,mode", [
    (40.0, 0.15, "subtree"),       # 10 k2 + 10 k3 patterns
    (40.0, 0.15, "coordinated"),
    (20.0, 0.15, "subtree"),       # k2-only point (k3 level must be empty)
])
def test_flagship_sql_matches_engine(ray_session, d, mp, mode):
    inst = instances_from_events(SF_DIR)
    cfg = MiningConfig(neighbor_distance=d, min_prevalence=mp)
    run = (colocation.mine if mode == "subtree" else colocation.mine_coordinated)(inst, cfg)
    got = _patterns_out(run.patterns_table()).to_pandas()
    want = _duck(sql_patterns_full(d, mp)).sort_values(
        ["k", "pattern"]).reset_index(drop=True)
    if d == 40.0:
        assert (want["k"] == 3).sum() == 10  # the k3 level is live
    assert len(got) == len(want)
    for col in ("pattern", "k", "n_rows"):
        assert got[col].tolist() == want[col].tolist()
    for col in ("wpi", "pi"):
        assert (got[col] - want[col]).abs().max() < 1e-8
