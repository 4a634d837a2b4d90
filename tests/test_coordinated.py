"""Salted / coordinated mining mode: exact oracle parity (including
Lemma 3, which the subtree mode cannot use), shard-count invariance,
and checkpoint resume."""

import json
import os

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
    mine_coordinated,
)
from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.sources.fixtures import (
    clustered_instances,
    rare_feature_fixture,
    sample_tiny,
)


def run_and_compare(ids, feats, x, y, d, mp, lemma3, n_shards, work_dir=None):
    oracle = mine_serial(ids, feats, x, y, d, mp, use_lemma3=lemma3)
    ds = from_numpy(ids, feats, x, y, parallelism=4)
    run = mine_coordinated(
        ds,
        MiningConfig(neighbor_distance=d, min_prevalence=mp, use_lemma3=lemma3),
        n_shards=n_shards,
        work_dir=work_dir,
    )
    assert run.pattern_set() == pattern_set(oracle)
    t = run.patterns_table()
    om = {r["pattern"]: r for r in oracle["patterns"]}
    for i in range(t.num_rows):
        pat = tuple(t["pattern"][i].as_py().split(","))
        o = om[pat]
        assert abs(o["wpi"] - t["wpi"][i].as_py()) < 1e-12
        assert o["n_rows"] == t["n_rows"][i].as_py()
    return run


@pytest.mark.parametrize("lemma3", [False, True])
def test_sample_parity(ray_session, lemma3):
    ids, feats, x, y = sample_tiny()
    run_and_compare(ids, feats, x, y, 3.0, 0.4, lemma3, n_shards=3)


def test_rare_fixture_with_lemma3(ray_session):
    ids, feats, x, y = rare_feature_fixture()
    run_and_compare(ids, feats, x, y, 5.0, 0.3, True, n_shards=7)


@pytest.mark.parametrize("n_shards", [1, 2, 5, 16])
def test_shard_count_invariance(ray_session, n_shards):
    ids, feats, x, y = clustered_instances(700, seed=9)
    run_and_compare(ids, feats, x, y, 10.0, 0.3, False, n_shards=n_shards)


def test_checkpoint_resume(ray_session, tmp_path):
    """Second run with the same work_dir must skip the join+star stages
    (manifest hit) and produce identical output; a corrupted/partial
    checkpoint (no manifest) is rebuilt from scratch."""
    ids, feats, x, y = clustered_instances(500, seed=4)
    wd = str(tmp_path / "ckpt")
    run1 = run_and_compare(ids, feats, x, y, 10.0, 0.3, False, 4, work_dir=wd)
    stage = os.path.join(wd, "shard_stars")
    manifest = os.path.join(stage, "_MANIFEST.json")
    assert os.path.exists(manifest)
    stamp = os.path.getmtime(manifest)
    # resume: same inputs -> stage skipped (manifest untouched)
    run2 = run_and_compare(ids, feats, x, y, 10.0, 0.3, False, 4, work_dir=wd)
    assert os.path.getmtime(manifest) == stamp
    assert run1.pattern_set() == run2.pattern_set()
    # simulate a crash mid-write: manifest missing -> stage recomputed
    os.remove(manifest)
    run3 = run_and_compare(ids, feats, x, y, 10.0, 0.3, False, 4, work_dir=wd)
    assert os.path.exists(manifest)
    assert run3.pattern_set() == run1.pattern_set()
    # config change invalidates the fingerprint -> recompute, not reuse
    with open(manifest) as f:
        m = json.load(f)
    assert m["fingerprint"]["d"] == 10.0


@pytest.mark.parametrize("seed", [0, 1])
def test_modes_agree_on_random_data(ray_session, seed):
    """The two distributed modes (subtree-partitioned, root-sharded) must
    emit identical pattern tables on arbitrary inputs."""
    import numpy as np

    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines.colocation import (
        mine,
    )

    rng = np.random.default_rng(seed)
    n = 800
    feats = rng.choice([f"F{i}" for i in range(9)], size=n,
                       p=np.array([20, 14, 12, 11, 11, 11, 9, 7, 5]) / 100)
    ids = np.array([f"{f}_{i}" for i, f in enumerate(feats)], dtype=object)
    x = rng.integers(0, 300, size=n).astype(float)
    y = rng.integers(0, 300, size=n).astype(float)
    ds = from_numpy(ids, feats.astype(object), x, y, parallelism=4)
    cfg = MiningConfig(neighbor_distance=12.0, min_prevalence=0.25)
    a = mine(ds, cfg).patterns_table()
    b = mine_coordinated(ds, cfg, n_shards=13).patterns_table()
    cols = ["pattern", "k", "wpi", "pi", "n_rows"]
    assert a.select(cols).to_pydict() == b.select(cols).to_pydict()


def test_flagship_checkpoint_resume(ray_session, tmp_path):
    """Task-graph (flagship) checkpoint/resume: the star exchange and the
    per-root pattern partitions are fingerprinted parquet; a rerun skips
    completed stages/roots; a kill mid-mining (simulated by deleting a
    subset of root pattern partitions) resumes to identical output; a
    min_prevalence change REUSES the geometry (star) checkpoint."""
    import shutil

    ids, feats, x, y = clustered_instances(500, seed=4)
    ds = from_numpy(ids, feats, x, y, parallelism=4)
    cfg = MiningConfig(neighbor_distance=10.0, min_prevalence=0.3)
    baseline = mine(ds, cfg).patterns_table()

    wd = str(tmp_path / "flag_ckpt")
    run1 = mine(ds, cfg, work_dir=wd)
    assert run1.patterns_table().equals(baseline)
    star_manifest = os.path.join(wd, "star_keys", "_MANIFEST.json")
    assert os.path.exists(star_manifest)
    stamp = os.path.getmtime(star_manifest)
    root_dirs = sorted(
        d for d in os.listdir(os.path.join(wd, "patterns"))
        if d.startswith("root=")
    )
    assert root_dirs

    # full resume: everything read back, star manifest untouched
    run2 = mine(ds, cfg, work_dir=wd)
    assert run2.patterns_table().equals(baseline)
    assert os.path.getmtime(star_manifest) == stamp

    # kill mid-mining: drop some root partitions -> only those re-mine
    for d in root_dirs[: max(1, len(root_dirs) // 2)]:
        shutil.rmtree(os.path.join(wd, "patterns", d))
    run3 = mine(ds, cfg, work_dir=wd)
    assert run3.patterns_table().equals(baseline)
    assert os.path.getmtime(star_manifest) == stamp  # stars never rebuilt

    # threshold change: geometry checkpoint reused, patterns recomputed
    cfg2 = MiningConfig(neighbor_distance=10.0, min_prevalence=0.5)
    want2 = mine(ds, cfg2).patterns_table()
    run4 = mine(ds, cfg2, work_dir=wd)
    assert run4.patterns_table().equals(want2)
    assert os.path.getmtime(star_manifest) == stamp

    # kill mid-star-build: no manifest -> stage rebuilt from scratch
    os.remove(star_manifest)
    run5 = mine(ds, cfg, work_dir=wd)
    assert run5.patterns_table().equals(baseline)
    assert os.path.exists(star_manifest)
