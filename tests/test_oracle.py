"""Oracle self-consistency: hand-checked values on the F1 sample geometry
(mirror of reference data/sample_data.csv) and the reference's edge
branches (FIXTURES.md F4)."""

import math

import numpy as np
import pytest

from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.canonical import (
    FeatureContext,
    calculate_delta,
    rare_intensity,
)
from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.oracle import (
    brute_force_pairs,
    mine_serial,
    pattern_set,
)
from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.sources.fixtures import (
    rare_feature_fixture,
    sample_tiny,
)


def test_canonical_order_and_delta():
    ids, feats, x, y = sample_tiny()
    ctx = FeatureContext({"A": 5, "B": 4, "C": 4, "D": 3})
    # count asc, lex tiebreak (B before C at count 4)
    assert ctx.order == ["D", "B", "C", "A"]
    # delta by hand: pairs (D,B),(D,C),(D,A),(B,C),(B,A),(C,A)
    # = 4/3 + 4/3 + 5/3 + 4/4 + 5/4 + 5/4 ; * 2/(4*3)
    expect = (4 / 3 + 4 / 3 + 5 / 3 + 1.0 + 1.25 + 1.25) * (2 / 12)
    assert math.isclose(ctx.delta, expect, rel_tol=1e-12)


def test_delta_one_feature_is_zero():
    assert calculate_delta(["A"], {"A": 10}) == 0.0


def test_rare_intensity_guards():
    counts = {"A": 10, "B": 2}
    # delta <= 1e-9 -> 0 (reference src/utils.cpp:205)
    assert rare_intensity("A", ("B", "A"), counts, 0.0) == 0.0
    # feature not in pattern -> 0
    assert rare_intensity("Z", ("B", "A"), counts, 1.0) == 0.0
    # v = 10/2 = 5 -> exp(-(4^2)/(2*delta^2))
    got = rare_intensity("A", ("B", "A"), counts, 2.0)
    assert math.isclose(got, math.exp(-16 / 8.0), rel_tol=1e-12)
    # f_min itself has v=1 -> RI=1
    assert rare_intensity("B", ("B", "A"), counts, 2.0) == 1.0


def test_inclusive_distance_and_cross_type_pairs():
    ids = np.array(["M1", "N1", "M2"], dtype=object)
    feats = np.array(["M", "N", "M"], dtype=object)
    x = np.array([0.0, 5.0, 3.0])
    y = np.array([0.0, 0.0, 0.0])
    pairs = brute_force_pairs(ids, feats, x, y, 5.0)
    assert ("M1", "N1") in pairs  # exactly at distance d (inclusive <=)
    assert ("M1", "M2") not in pairs  # same feature never pairs
    assert ("M2", "N1") in pairs


def test_sample_tiny_golden():
    """Frozen golden outputs for the F1 geometry at the reference defaults
    (include/config.h:42-44: d=5.0, min_prev=0.6)."""
    ids, feats, x, y = sample_tiny()
    r = mine_serial(ids, feats, x, y, 5.0, 0.6)
    assert pattern_set(r) == {
        ("B", "A"), ("B", "C"), ("C", "A"), ("D", "A"), ("D", "C"),
        ("B", "C", "A"), ("D", "C", "A"),
    }
    by_pat = {rec["pattern"]: rec for rec in r["patterns"]}
    assert by_pat[("C", "A")]["n_rows"] == 10
    assert by_pat[("B", "C", "A")]["n_rows"] == 17
    assert math.isclose(by_pat[("B", "A")]["wpi"], 0.75, rel_tol=1e-12)
    assert len(r["pairs"]) == 48


@pytest.mark.parametrize("d,mp", [(5.0, 0.6), (2.0, 0.3), (3.0, 0.4)])
def test_lemma3_is_pure_pruning_on_fixtures(d, mp):
    ids, feats, x, y = sample_tiny()
    on = mine_serial(ids, feats, x, y, d, mp, use_lemma3=True)
    off = mine_serial(ids, feats, x, y, d, mp, use_lemma3=False)
    assert pattern_set(on) == pattern_set(off)


def test_rare_feature_wpi_vs_pi():
    ids, feats, x, y = rare_feature_fixture()
    r = mine_serial(ids, feats, x, y, 5.0, 0.3)
    assert ("R", "Z") in pattern_set(r)
    rec = next(p for p in r["patterns"] if p["pattern"] == ("R", "Z"))
    # WPI boosts the rare pattern above its raw PI
    assert rec["wpi"] > rec["pi"]
    # the exact-distance M11/N11 pair must be present
    assert ("M11", "N11") in r["pairs"]
