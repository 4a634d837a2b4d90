"""The distributed distance join must produce exactly the brute-force
pair set (inclusive <=, cross-type only), each pair exactly once,
for any tile size."""

import numpy as np
import pytest

from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.config import (
    MiningConfig,
)
from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.oracle import (
    brute_force_pairs,
)
from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines.colocation import (
    from_numpy,
)
from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.sources.fixtures import (
    clustered_instances,
    sample_tiny,
)
from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.stages.pairs import (
    neighbor_pairs,
)


def pairs_from_engine(ids, feats, x, y, d, tile_cells):
    ds = from_numpy(ids, feats, x, y, parallelism=4)
    cfg = MiningConfig(neighbor_distance=d, tile_cells=tile_cells)
    rows = neighbor_pairs(ds, cfg).take_all()
    got = [(r["a_id"], r["b_id"]) for r in rows]
    assert len(got) == len(set(got)), "duplicate pairs emitted"
    return set(got)


@pytest.mark.parametrize("tile_cells", [1, 2, 3, 16])
def test_pairs_match_bruteforce_sample(ray_session, tile_cells):
    ids, feats, x, y = sample_tiny()
    want = brute_force_pairs(ids, feats, x, y, 5.0)
    assert pairs_from_engine(ids, feats, x, y, 5.0, tile_cells) == want


@pytest.mark.parametrize("d", [3.0, 9.5, 25.0])
def test_pairs_match_bruteforce_clustered(ray_session, d):
    ids, feats, x, y = clustered_instances(800, seed=5)
    want = brute_force_pairs(ids, feats, x, y, d)
    assert pairs_from_engine(ids, feats, x, y, d, 4) == want


def test_points_on_cell_and_tile_boundaries(ray_session):
    """Points at exact cell-size multiples (the reference's latent
    out-of-bounds case, src/spatial_index.cpp:63-72) and on tile seams."""
    d, T = 2.0, 2
    xs, ys, ids, feats = [], [], [], []
    k = 0
    for gx in range(6):
        for gy in range(6):
            k += 1
            ids.append(f"P{k}"); feats.append("A" if (gx + gy) % 2 else "B")
            xs.append(gx * d); ys.append(gy * d)  # exactly on cell corners
    ids = np.array(ids, dtype=object); feats = np.array(feats, dtype=object)
    xs = np.array(xs); ys = np.array(ys)
    want = brute_force_pairs(ids, feats, xs, ys, d)
    assert pairs_from_engine(ids, feats, xs, ys, d, T) == want
