"""Grouped top-k: exactness vs pandas, tie determinism, invariance
under block structure (the partial prune must never change results)."""

import numpy as np
import pandas as pd
import pyarrow as pa

from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines import (
    rank,
)


def _expected(df: pd.DataFrame, k: int) -> pd.DataFrame:
    out = (
        df.sort_values(["v", "id"], ascending=[False, True])
        .groupby("g", sort=False)
        .head(k)
    )
    return out.sort_values(["g", "id"]).reset_index(drop=True)


def _run(df: pd.DataFrame, k: int, n_blocks: int) -> pd.DataFrame:
    import ray.data

    t = pa.Table.from_pandas(df, preserve_index=False)
    step = max(1, t.num_rows // n_blocks)
    parts = [t.slice(o, step) for o in range(0, t.num_rows, step)]
    got = rank.grouped_topk(
        ray.data.from_arrow(parts), ["g"], "v", k=k, tie_col="id"
    ).to_pandas()
    return got.sort_values(["g", "id"]).reset_index(drop=True)


def test_grouped_topk_matches_pandas_any_blocking(ray_session):
    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c", "d"], 200),
            "v": rng.integers(0, 50, 200),  # many ties
            "id": np.arange(200, dtype=np.int64),
        }
    )
    want = _expected(df, 3)
    for n_blocks in (1, 4, 16):
        got = _run(df, 3, n_blocks)
        pd.testing.assert_frame_equal(
            got[["g", "v", "id"]], want[["g", "v", "id"]]
        )


def test_grouped_topk_small_groups(ray_session):
    df = pd.DataFrame(
        {"g": ["x", "y"], "v": [1, 2], "id": np.array([0, 1], np.int64)}
    )
    got = _run(df, 5, 2)  # k larger than the groups: every row survives
    assert len(got) == 2


def test_topk_query_registered():
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines import (
        queries,
    )

    assert "docs_topk_per_source" in queries.DATA_QUERIES
    assert "docs_topk_per_source" in queries.DATA_SQL


def test_grouped_topk_keeps_null_group(ray_session):
    import ray.data

    t = pa.table(
        {
            "g": pa.array(["a", None, None, "a", None]),
            "v": pa.array([5, 9, 7, 1, 3], pa.int64()),
            "id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        }
    )
    got = rank.grouped_topk(
        ray.data.from_arrow(t), ["g"], "v", k=2, tie_col="id"
    ).to_pandas()
    # SQL PARTITION BY keeps a NULL partition: top-2 of the null group
    null_rows = got[got["g"].isna()]
    assert sorted(null_rows["id"]) == [1, 2]
