"""Conformance on the reference's OWN bundled datasets.

The committed goldens (goldens/*.parquet, regenerate with
``python tools/make_goldens.py``) pin the serial oracle's exact output
on /root/reference/data at the reference's config defaults
(config/config.txt: neighbor_distance=160, min_prevalence=0.15). Both
distributed modes must reproduce them bit-exactly (after the same
9-digit rounding the driver queries apply).
"""

import os

import pyarrow.parquet as pq
import pytest

from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.config import (
    MiningConfig,
)
from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines import (
    colocation,
)
from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.sources.instances import (
    read_instances_csv,
)

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "goldens")
LASVEGAS = "/root/reference/data/LasVegas_x_y_alphabet_version_03_2.csv"
SAMPLE = "/root/reference/data/sample_data.csv"
XY_VARIANT = "/root/reference/data/5k_15f_50k.csv"


def _golden(name):
    return pq.read_table(os.path.join(GOLDEN_DIR, f"{name}.parquet"))


def _assert_matches_golden(run, golden):
    t = run.patterns_table().sort_by([("k", "ascending"), ("pattern", "ascending")])
    got = {
        t["pattern"][i].as_py(): (
            t["k"][i].as_py(),
            round(t["wpi"][i].as_py(), 9),
            round(t["pi"][i].as_py(), 9),
            t["n_rows"][i].as_py(),
        )
        for i in range(t.num_rows)
    }
    want = {
        golden["pattern"][i].as_py(): (
            golden["k"][i].as_py(),
            golden["wpi"][i].as_py(),
            golden["pi"][i].as_py(),
            golden["n_rows"][i].as_py(),
        )
        for i in range(golden.num_rows)
    }
    assert set(got) == set(want), (
        f"pattern sets differ: +{set(got) - set(want)} -{set(want) - set(got)}"
    )
    for p, g in got.items():
        w = want[p]
        assert g[0] == w[0] and g[3] == w[3], (p, g, w)
        assert abs(g[1] - w[1]) < 1e-8 and abs(g[2] - w[2]) < 1e-8, (p, g, w)


@pytest.mark.parametrize("mode", ["subtree", "coordinated"])
def test_sample_data_golden(ray_session, mode):
    inst = read_instances_csv(SAMPLE)
    cfg = MiningConfig(neighbor_distance=3.0, min_prevalence=0.30)
    run = (colocation.mine if mode == "subtree" else colocation.mine_coordinated)(inst, cfg)
    _assert_matches_golden(run, _golden("sample_d3_mp030"))


@pytest.mark.parametrize("mode", ["subtree", "coordinated"])
def test_lasvegas_golden(ray_session, mode):
    """End-to-end mine of the reference's primary dataset (22,724 rows,
    17 features) at its config defaults; 513 prevalent patterns up to
    k=6, pinned exactly."""
    inst = read_instances_csv(LASVEGAS)
    cfg = MiningConfig(neighbor_distance=160.0, min_prevalence=0.15)
    run = (colocation.mine if mode == "subtree" else colocation.mine_coordinated)(inst, cfg)
    golden = _golden("lasvegas_d160_mp015")
    assert golden.num_rows == 513
    _assert_matches_golden(run, golden)


def test_xy_header_variant(ray_session):
    """data/5k_15f_50k.csv uses X,Y headers -- the reference's own loader
    (hardcoded LocX/LocY, src/data_loader.cpp:20-36) cannot read it; this
    engine accepts both."""
    ds = read_instances_csv(XY_VARIANT)
    assert ds.count() == 50000
    t = ds.take(2)
    assert t[0]["instance_id"] == "A1"
    assert {"instance_id", "feature", "x", "y"} == set(t[0].keys())
    assert isinstance(t[0]["x"], float)
