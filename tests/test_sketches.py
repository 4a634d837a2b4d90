"""HyperLogLog mergeable cardinality sketch."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines.sketches import (
    hll_distinct,
)


def _fixture(seed: int, n: int = 20_000, card: int = 3_000) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "key": np.array(["a", "b", "c"], object)[rng.integers(0, 3, n)],
            "id": rng.integers(0, card, n).astype(np.int64),
        }
    )


@pytest.mark.parametrize("seed", [1, 42])
def test_hll_within_error_bound(ray_session, seed):
    df = _fixture(seed)
    got = (
        hll_distinct(ray.data.from_pandas(df).repartition(6), "key", "id")
        .to_pandas()
        .set_index("key")["est"]
    )
    exact = df.groupby("key")["id"].nunique()
    for k in exact.index:
        rel = abs(got[k] - exact[k]) / exact[k]
        assert rel < 0.08, (k, got[k], exact[k])  # ~2.5 sigma at m=1024


def test_hll_partition_invariant(ray_session):
    """Registers max-merge associatively: the estimate is identical for
    any block split of the same rows."""
    df = _fixture(7)
    outs = []
    for parts in (1, 3, 11):
        outs.append(
            hll_distinct(
                ray.data.from_pandas(df).repartition(parts), "key", "id"
            )
            .to_pandas()
            .sort_values("key")
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])
    pd.testing.assert_frame_equal(outs[0], outs[2])


def test_hll_small_range_exactish(ray_session):
    """Linear-counting regime: tiny cardinalities are near-exact."""
    df = pd.DataFrame({"key": ["x"] * 100,
                       "id": np.arange(50, dtype=np.int64).repeat(2)})
    got = hll_distinct(ray.data.from_pandas(df), "key", "id").to_pandas()
    assert abs(int(got["est"].iloc[0]) - 50) <= 2


# ------------------------------- log-histogram quantile sketch


def _qfixture(seed: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "key": rng.choice(["a", "b", "c"], 5000),
        "value": np.round(rng.lognormal(3.0, 1.2, 5000), 2) + 0.01,
    })


def test_quantile_sketch_error_bound(ray_session):
    """Estimate is the lower bin bound: est <= true < est*(1+1/32)."""
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines.sketches import (
        log_histogram_quantiles,
    )

    df = _qfixture(3)
    got = (
        log_histogram_quantiles(
            ray.data.from_pandas(df).repartition(4), "key", "value"
        )
        .to_pandas().set_index("key")
    )
    for k, grp in df.groupby("key"):
        v = np.sort(np.floor(grp["value"].to_numpy() * 100 + 0.5) / 100.0)
        for q, col in ((0.5, "p50"), (0.95, "p95"), (0.99, "p99")):
            true = v[int(np.ceil(q * len(v))) - 1]
            est = got.loc[k, col]
            assert est <= true + 1e-9, (k, col, est, true)
            assert true < est * (1 + 1 / 32) + 0.02, (k, col, est, true)


def test_quantile_sketch_partition_invariant(ray_session):
    """Bin counts merge by addition: identical output for any split."""
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines.sketches import (
        log_histogram_quantiles,
    )

    df = _qfixture(11)
    outs = [
        log_histogram_quantiles(
            ray.data.from_pandas(df).repartition(p), "key", "value"
        ).to_pandas().sort_values("key").reset_index(drop=True)
        for p in (1, 7)
    ]
    pd.testing.assert_frame_equal(outs[0], outs[1])


# ----------------------------------- Count-Min frequency sketch


def test_cm_overestimate_only_and_bounded(ray_session):
    """CM never underestimates, and the excess stays within a loose
    multiple of the expected collision mass N/W."""
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines.sketches import (
        CM_W,
        cm_frequencies,
    )

    rng = np.random.default_rng(5)
    keys = rng.zipf(1.5, 20000).astype(np.int64) % 500
    df = pd.DataFrame({"k": keys.astype(str)})
    qs = [str(i) for i in range(25)]
    got = cm_frequencies(
        ray.data.from_pandas(df).repartition(5), "k", qs
    ).set_index("k")["est"]
    exact = df["k"].value_counts()
    n = len(df)
    for q in qs:
        true = int(exact.get(q, 0))
        est = int(got[q])
        assert est >= true, (q, est, true)
        assert est - true <= 8 * n // CM_W + 4, (q, est, true)


def test_cm_partition_invariant(ray_session):
    """Cells merge by addition: identical estimates for any split."""
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines.sketches import (
        cm_frequencies,
    )

    rng = np.random.default_rng(9)
    df = pd.DataFrame({"k": rng.integers(0, 200, 5000).astype(str)})
    qs = [str(i) for i in range(10)]
    outs = [
        cm_frequencies(
            ray.data.from_pandas(df).repartition(p), "k", qs
        )
        for p in (1, 6)
    ]
    pd.testing.assert_frame_equal(outs[0], outs[1])
