import numpy as np
import pandas as pd
import pytest
import ray.data

from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines.stats import (
    histogram,
)

SF_DIR = "/root/testdata/sf0.001"


def test_histogram_matches_pandas(ray_session):
    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "x": np.round(rng.uniform(-50, 50, 5000), 2),
        "w": rng.integers(1, 9, 5000).astype(np.float64),
    })
    got = histogram(
        ray.data.from_pandas(df).repartition(6), "x", 10.0, weight_col="w"
    )
    bins = np.floor(df["x"].to_numpy() / 10.0).astype(np.int64)
    want = (
        pd.DataFrame({"bin": bins, "n": 1, "wsum": df["w"]})
        .groupby("bin", sort=True).sum().reset_index()
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # negative values land in negative bins (floor, not trunc)
    assert got["bin"].min() == -5


def test_histogram_no_weight_and_contract(ray_session):
    df = pd.DataFrame({"x": [0.0, 0.5, 1.0, 1.5]})
    got = histogram(ray.data.from_pandas(df), "x", 1.0)
    assert list(got["bin"]) == [0, 1] and list(got["n"]) == [2, 2]
    assert "wsum" not in got.columns
    with pytest.raises(ValueError, match="bin_width"):
        histogram(ray.data.from_pandas(df), "x", 0.0)


def test_top_building_orders_vs_duckdb(ray_session):
    """The TPC-H-Q3-shaped composite (broadcast join -> shuffle join ->
    keyed aggregate -> pruned global top-k) against DuckDB on sf0.001."""
    import duckdb

    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines.queries import (
        SQL_TOP_BUILDING_ORDERS,
        q_top_building_orders,
    )

    got = q_top_building_orders(SF_DIR).reset_index(drop=True)
    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    want = con.execute(SQL_TOP_BUILDING_ORDERS).df()
    want["o_orderdate"] = want["o_orderdate"].astype(got["o_orderdate"].dtype)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
