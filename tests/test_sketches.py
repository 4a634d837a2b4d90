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
