"""Grouped top-k: exactness vs pandas, tie determinism, invariance
under block structure (the partial prune must never change results)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

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


def test_events_rolling_matches_pandas(ray_session):
    """Window family (rn / lag / rolling max) vs pandas groupby.rolling
    on a random keyed log with duplicate timestamps."""
    import ray.data

    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines.queries import (
        ROLL_WINDOW,
        q_events_rolling,
    )

    rng = np.random.default_rng(3)
    n = 500
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 9, n).astype(np.int64),
            # coarse ts -> plenty of (user, ts) duplicates for the
            # (ts, event_id) tie-break
            "ts": np.datetime64("2024-01-01", "us")
            + rng.integers(0, 50, n).astype("timedelta64[s]").astype(
                "timedelta64[us]"
            ),
            "value": np.round(rng.uniform(0, 100, n), 2),
            "event_type": "x",
            "props": "",
        }
    )
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        df.to_parquet(f"{td}/events.parquet")
        got = (
            q_events_rolling(td)
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
    w = (
        df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        .reset_index(drop=True)
    )
    g = w.groupby("user_id", sort=False)
    w["rn"] = g.cumcount() + 1
    w["prev_value"] = g["value"].shift(1).fillna(0.0)
    w["roll_max"] = (
        g["value"].rolling(ROLL_WINDOW, min_periods=1).max().to_numpy()
    )
    want = (
        w[["event_id", "user_id", "ts", "rn", "prev_value", "roll_max"]]
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_docs_median_chars_exact(ray_session):
    """Grouped discrete median from the distributed count histogram ==
    numpy's positional definition (DuckDB quantile_disc: element at
    cumulative count >= ceil(n/2)), odd and even group sizes, ties."""
    import tempfile

    import ray.data

    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines.queries import (
        q_docs_median_chars,
    )

    rng = np.random.default_rng(5)
    rows = []
    for src, size in [("a", 101), ("b", 100), ("c", 1), ("d", 2)]:
        for v in rng.integers(0, 12, size):  # heavy ties
            rows.append((src, int(v)))
    df = pd.DataFrame(rows, columns=["source", "n_chars"])
    df["doc_id"] = np.arange(len(df), dtype=np.int64)
    df["text"] = ""
    df["lang"] = "en"
    with tempfile.TemporaryDirectory() as td:
        df.to_parquet(f"{td}/documents.parquet")
        got = (
            q_docs_median_chars(td)
            .to_pandas()
            .sort_values("source")
            .reset_index(drop=True)
        )
    want_rows = []
    for src, grp in df.groupby("source"):
        v = np.sort(grp["n_chars"].to_numpy())
        want_rows.append((src, int(v[(len(v) + 1) // 2 - 1])))
    want = pd.DataFrame(want_rows, columns=["source", "median_chars"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_events_distinct_users_exact(ray_session):
    import tempfile

    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines.queries import (
        q_events_distinct_users,
    )

    rng = np.random.default_rng(9)
    n = 2000
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": np.datetime64("2024-01-01", "us"),
            "user_id": rng.integers(0, 40, n).astype(np.int64),
            "event_type": rng.choice(["a", "b", "c"], n),
            "value": 0.0,
            "props": "",
        }
    )
    with tempfile.TemporaryDirectory() as td:
        df.to_parquet(f"{td}/events.parquet")
        got = (
            q_events_distinct_users(td)
            .to_pandas()
            .sort_values("event_type")
            .reset_index(drop=True)
        )
    want = (
        df.groupby("event_type")["user_id"].nunique().rename("n_users")
        .reset_index()
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_global_rank_matches_pandas(ray_session):
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines.rank import (
        global_rank,
    )

    rng = np.random.default_rng(11)
    # planted duplicate values across blocks to exercise the tie-break
    vals = np.round(rng.uniform(-100, 100, 3000), 1)
    df = pd.DataFrame({
        "v": vals, "id": rng.permutation(3000).astype(np.int64)
    })
    got = (
        global_rank(
            ray.data.from_pandas(df).repartition(7), "v", "id",
            rank_col="r", n_buckets=16,
        )
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    want = df.copy()
    want["r"] = (
        want.sort_values(["v", "id"]).reset_index().index.to_numpy()
    )
    want = want.sort_values(["v", "id"], kind="stable")
    want["r"] = np.arange(1, len(want) + 1, dtype=np.int64)
    want = want.sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["v", "id", "r"]], want[["v", "id", "r"]])

    # descending: rank 1 = largest value
    got_d = (
        global_rank(
            ray.data.from_pandas(df).repartition(7), "v", "id",
            rank_col="r", n_buckets=16, descending=True,
        )
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    want_d = df.sort_values(["v", "id"], ascending=[False, True],
                            kind="stable").copy()
    want_d["r"] = np.arange(1, len(want_d) + 1, dtype=np.int64)
    want_d = want_d.sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got_d[["v", "id", "r"]], want_d[["v", "id", "r"]]
    )


def test_global_rank_constant_column(ray_session):
    """All-equal order values: one bucket, pure tie-break ordering."""
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines.rank import (
        global_rank,
    )

    df = pd.DataFrame({
        "v": np.zeros(50), "id": np.arange(49, -1, -1, dtype=np.int64)
    })
    got = (
        global_rank(ray.data.from_pandas(df).repartition(3), "v", "id",
                    rank_col="r", n_buckets=8)
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    assert (got["r"].to_numpy() == got["id"].to_numpy() + 1).all()
