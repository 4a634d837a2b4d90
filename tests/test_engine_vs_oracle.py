"""Conformance gate: the Ray Data engine must equal the serial oracle
exactly -- pattern sets, WPI/PI values, and row-instance counts -- on
every fixture, and be invariant to row order / partition count / tile
size (SURVEY.md sec. 5 property tests)."""

import numpy as np
import pytest

from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.config import (
    MiningConfig,
)
from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.oracle import (
    mine_serial,
    pattern_set,
)
from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines.colocation import (
    from_numpy,
    mine,
)
from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.sources.fixtures import (
    clustered_instances,
    rare_feature_fixture,
    sample_tiny,
)


def assert_engine_matches_oracle(
    ids, feats, x, y, d, mp, tile_cells=4, parallelism=4, shuffle_seed=None
):
    oracle = mine_serial(ids, feats, x, y, d, mp, use_lemma3=False)
    if shuffle_seed is not None:
        rng = np.random.default_rng(shuffle_seed)
        perm = rng.permutation(len(ids))
        ids, feats, x, y = ids[perm], feats[perm], x[perm], y[perm]
    ds = from_numpy(ids, feats, x, y, parallelism=parallelism)
    run = mine(ds, MiningConfig(neighbor_distance=d, min_prevalence=mp, tile_cells=tile_cells))
    assert run.pattern_set() == pattern_set(oracle)
    t = run.patterns_table()
    om = {r["pattern"]: r for r in oracle["patterns"]}
    for i in range(t.num_rows):
        pat = tuple(t["pattern"][i].as_py().split(","))
        o = om[pat]
        assert abs(o["wpi"] - t["wpi"][i].as_py()) < 1e-12, pat
        assert abs(o["pi"] - t["pi"][i].as_py()) < 1e-12, pat
        assert o["n_rows"] == t["n_rows"][i].as_py(), pat


@pytest.mark.parametrize("d,mp", [(5.0, 0.6), (2.0, 0.3), (3.0, 0.4)])
def test_sample_tiny(ray_session, d, mp):
    ids, feats, x, y = sample_tiny()
    assert_engine_matches_oracle(ids, feats, x, y, d, mp)


def test_rare_feature(ray_session):
    ids, feats, x, y = rare_feature_fixture()
    assert_engine_matches_oracle(ids, feats, x, y, 5.0, 0.3)


def test_clustered_mid(ray_session):
    ids, feats, x, y = clustered_instances(1500, seed=3)
    assert_engine_matches_oracle(ids, feats, x, y, 10.0, 0.25, tile_cells=8)


@pytest.mark.parametrize("tile_cells", [1, 2, 7, 64])
def test_tile_size_invariance(ray_session, tile_cells):
    ids, feats, x, y = clustered_instances(600, seed=11)
    assert_engine_matches_oracle(ids, feats, x, y, 12.0, 0.3, tile_cells=tile_cells)


@pytest.mark.parametrize("parallelism", [1, 3, 16])
def test_partition_count_invariance(ray_session, parallelism):
    ids, feats, x, y = clustered_instances(600, seed=11)
    assert_engine_matches_oracle(
        ids, feats, x, y, 12.0, 0.3, parallelism=parallelism
    )


@pytest.mark.parametrize("seed", [1, 2])
def test_row_order_invariance(ray_session, seed):
    ids, feats, x, y = clustered_instances(600, seed=11)
    assert_engine_matches_oracle(
        ids, feats, x, y, 12.0, 0.3, shuffle_seed=seed
    )


def test_empty_and_single_feature(ray_session):
    # single feature: no cross-type pairs -> no patterns
    ids = np.array(["A1", "A2"], dtype=object)
    feats = np.array(["A", "A"], dtype=object)
    x = np.array([0.0, 1.0]); y = np.array([0.0, 0.0])
    ds = from_numpy(ids, feats, x, y, parallelism=1)
    run = mine(ds, MiningConfig(neighbor_distance=5.0, min_prevalence=0.1))
    assert run.pattern_set() == set()


def test_pi_measure_mode(ray_session):
    """measure='pi' (classic participation index) is the documented
    extension point; check it prunes rare patterns WPI keeps."""
    ids, feats, x, y = rare_feature_fixture()
    o_wpi = mine_serial(ids, feats, x, y, 5.0, 0.9, use_lemma3=False)
    o_pi = mine_serial(ids, feats, x, y, 5.0, 0.9, use_lemma3=False, measure="pi")
    ds = from_numpy(ids, feats, x, y, parallelism=2)
    run = mine(ds, MiningConfig(neighbor_distance=5.0, min_prevalence=0.9, measure="pi"))
    assert run.pattern_set() == pattern_set(o_pi)
    assert pattern_set(o_wpi) != pattern_set(o_pi)


def test_deep_branch_split_equality(ray_session):
    """branch_split_rows=1 forces EVERY branch with >=2 prevalent thirds
    to split again at the third feature (nested sub-branch tasks); the
    pattern table must be identical to the inline level loop's."""
    ids, feats, x, y = clustered_instances(800, seed=7)
    ds = from_numpy(ids, feats, x, y, parallelism=4)
    inline = mine(
        ds,
        MiningConfig(
            neighbor_distance=10.0, min_prevalence=0.25, branch_split_rows=0
        ),
    )
    ds2 = from_numpy(ids, feats, x, y, parallelism=4)
    deep = mine(
        ds2,
        MiningConfig(
            neighbor_distance=10.0, min_prevalence=0.25, branch_split_rows=1
        ),
    )
    assert inline.patterns_table().equals(deep.patterns_table())
    assert deep.patterns_table()["k"].to_pylist().count(4) > 0  # k>=4 exercised


def test_branch_split_off_equality(ray_session):
    """branch_split=False falls back to one task per subtree (row-format
    stars); both decompositions must produce identical tables."""
    ids, feats, x, y = clustered_instances(800, seed=7)
    ds = from_numpy(ids, feats, x, y, parallelism=4)
    on = mine(ds, MiningConfig(neighbor_distance=10.0, min_prevalence=0.25))
    ds2 = from_numpy(ids, feats, x, y, parallelism=4)
    off = mine(
        ds2,
        MiningConfig(
            neighbor_distance=10.0, min_prevalence=0.25, branch_split=False
        ),
    )
    assert on.patterns_table().equals(off.patterns_table())
    assert on.patterns_table().num_rows > 0
