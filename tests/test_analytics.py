"""Full outer join, set ops, rollup/pivot/JSON analytics operators."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines.joins import (
    hash_join,
)
from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines.setops import (
    key_except,
    key_intersect,
)


def _join_fixture(seed: int):
    """Left/right with unmatched keys on BOTH sides and many-to-many
    multiplicity on the shared keys."""
    rng = np.random.default_rng(seed)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 60, 500).astype(np.int64),  # keys 0..59
            "lv": np.arange(500, dtype=np.int64),
        }
    )
    right = pd.DataFrame(
        {
            "rk": rng.integers(30, 90, 400).astype(np.int64),  # keys 30..89
            "rv": np.arange(400, dtype=np.int64) * 10,
        }
    )
    return left, right


def _pandas_full(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
    out = left.merge(right, left_on="k", right_on="rk", how="outer")
    return (
        out[["k", "lv", "rk", "rv"]]
        .sort_values(["k", "lv", "rk", "rv"], na_position="last")
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("seed", [3, 11])
def test_hash_join_full_outer(ray_session, seed):
    left, right = _join_fixture(seed)
    got = (
        hash_join(
            ray.data.from_pandas(left).repartition(5),
            ray.data.from_pandas(right).repartition(3),
            key="k",
            right_key="rk",
            right_columns=["rk", "rv"],
            how="full",
            n_buckets=8,
        )
        .to_pandas()
        .sort_values(["k", "lv", "rk", "rv"], na_position="last")
        .reset_index(drop=True)
    )
    want = _pandas_full(left, right)
    assert len(got) == len(want)
    # NULL-bearing int columns come back float64; compare as floats
    for c in ["k", "lv", "rk", "rv"]:
        np.testing.assert_array_equal(
            got[c].to_numpy(np.float64), want[c].to_numpy(np.float64)
        )
    # both directions of unmatched rows survived
    assert got["k"].isna().any() and got["rk"].isna().any()


def test_hash_join_full_equals_inner_plus_outer_halves(ray_session):
    """full == inner + left-only + right-only row counts."""
    left, right = _join_fixture(5)
    kw = dict(key="k", right_key="rk", n_buckets=8)
    n_inner = hash_join(
        ray.data.from_pandas(left), ray.data.from_pandas(right),
        right_columns=["rv"], **kw
    ).count()
    n_left_only = hash_join(
        ray.data.from_pandas(left), ray.data.from_pandas(right),
        right_columns=[], how="anti", **kw
    ).count()
    n_right_only = hash_join(
        ray.data.from_pandas(right), ray.data.from_pandas(left),
        key="rk", right_columns=[], right_key="k", how="anti", n_buckets=8
    ).count()
    n_full = hash_join(
        ray.data.from_pandas(left), ray.data.from_pandas(right),
        right_columns=["rk", "rv"], how="full", **kw
    ).count()
    assert n_full == n_inner + n_left_only + n_right_only


def test_key_intersect_and_except(ray_session):
    rng = np.random.default_rng(9)
    # duplicates on both sides: set ops are over DISTINCT keys
    a = pd.DataFrame({"id": rng.choice(np.arange(0, 40), 300).astype(np.int64)})
    b = pd.DataFrame({"id": rng.choice(np.arange(25, 70), 300).astype(np.int64)})
    da = ray.data.from_pandas(a).repartition(4)
    db = ray.data.from_pandas(b).repartition(3)
    sa, sb = set(a["id"]), set(b["id"])
    got_i = sorted(
        key_intersect(da, db, "id", n_buckets=8).to_pandas()["id"]
    )
    got_e = sorted(key_except(da, db, "id", n_buckets=8).to_pandas()["id"])
    assert got_i == sorted(sa & sb)
    assert got_e == sorted(sa - sb)


def test_key_intersect_disjoint_empty(ray_session):
    a = ray.data.from_pandas(pd.DataFrame({"id": np.arange(10, dtype=np.int64)}))
    b = ray.data.from_pandas(
        pd.DataFrame({"id": np.arange(100, 110, dtype=np.int64)})
    )
    ds = key_intersect(a, b, "id", n_buckets=4)
    assert ds.count() == 0
    # schema survives emptiness (typed zero-row blocks end-to-end)
    assert ds.schema().names == ["id"]


def test_setops_noninteger_key_raises(ray_session):
    a = ray.data.from_pandas(pd.DataFrame({"id": ["x", "y"]}))
    with pytest.raises(Exception, match="integer-typed"):
        key_intersect(a, a, "id").materialize()


def test_revenue_rollup_grains(tmp_path, ray_session):
    """Rollup grains are self-consistent: finest sums to per-flag sums
    to the grand total."""
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines.analytics import (
        q_revenue_rollup,
    )

    out = q_revenue_rollup("/root/testdata/sf0.001")
    finest = out[(out["l_returnflag"] != "ALL") & (out["l_linestatus"] != "ALL")]
    per_flag = out[(out["l_returnflag"] != "ALL") & (out["l_linestatus"] == "ALL")]
    total = out[(out["l_returnflag"] == "ALL")]
    assert len(total) == 1
    assert finest["revenue_e4"].sum() == total["revenue_e4"].iloc[0]
    assert per_flag["revenue_e4"].sum() == total["revenue_e4"].iloc[0]
    assert finest["n_rows"].sum() == total["n_rows"].iloc[0]
    for flag, grp in finest.groupby("l_returnflag"):
        row = per_flag[per_flag["l_returnflag"] == flag]
        assert grp["revenue_e4"].sum() == row["revenue_e4"].iloc[0]


def _string_key_fixture(seed: int):
    rng = np.random.default_rng(seed)
    domains = np.array([f"site{i}.example" for i in range(30)], object)
    left = pd.DataFrame(
        {
            "url_host": domains[rng.integers(0, 30, 400)],
            "lv": np.arange(400, dtype=np.int64),
        }
    )
    right = pd.DataFrame(
        {
            # keys 15..44: partial overlap, unmatched on both sides
            "host": np.array(
                [f"site{i}.example" for i in range(15, 45)], object
            )[rng.integers(0, 30, 200)],
            "rv": np.arange(200, dtype=np.int64),
        }
    )
    return left, right


@pytest.mark.parametrize("seed", [2, 19])
def test_hash_join_string_keys(ray_session, seed):
    left, right = _string_key_fixture(seed)
    got = (
        hash_join(
            ray.data.from_pandas(left).repartition(4),
            ray.data.from_pandas(right).repartition(3),
            key="url_host",
            right_key="host",
            right_columns=["rv"],
            n_buckets=8,
        )
        .to_pandas()
        .sort_values(["url_host", "lv", "rv"])
        .reset_index(drop=True)
    )
    want = (
        left.merge(right, left_on="url_host", right_on="host")[
            ["url_host", "lv", "rv"]
        ]
        .sort_values(["url_host", "lv", "rv"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_hash_join_string_keys_anti_left(ray_session):
    left, right = _string_key_fixture(7)
    da = ray.data.from_pandas(left)
    db = ray.data.from_pandas(right)
    anti = hash_join(
        da, db, key="url_host", right_columns=[], right_key="host",
        how="anti", n_buckets=8,
    ).to_pandas()
    want_anti = left[~left["url_host"].isin(set(right["host"]))]
    assert sorted(anti["lv"]) == sorted(want_anti["lv"])
    n_left = hash_join(
        da, db, key="url_host", right_columns=["rv"], right_key="host",
        how="left", n_buckets=8,
    ).count()
    want_left = left.merge(
        right, left_on="url_host", right_on="host", how="left"
    )
    assert n_left == len(want_left)


def test_lineitem_pricing_vs_duckdb(ray_session):
    """Q1-shape pricing summary is bit-exact vs the SQL restatement
    (integer-unit sums, identical IEEE divisions)."""
    import duckdb

    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines.analytics import (
        SQL_LINEITEM_PRICING,
        q_lineitem_pricing,
    )

    sf = "/root/testdata/sf0.001"
    got = q_lineitem_pricing(sf).sort_values(
        ["l_returnflag", "l_linestatus"]
    ).reset_index(drop=True)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW lineitem AS SELECT * FROM '{sf}/lineitem.parquet'")
    want = con.sql(SQL_LINEITEM_PRICING).df().sort_values(
        ["l_returnflag", "l_linestatus"]
    ).reset_index(drop=True)
    assert list(got.columns) == list(want.columns)
    for c in got.columns:
        if got[c].dtype == object:
            assert got[c].tolist() == want[c].tolist()
        else:
            # bit-exact: integer sums + identical single divisions
            assert np.array_equal(
                got[c].to_numpy(), want[c].to_numpy()
            ), c


def test_events_hopping_window_membership(ray_session):
    """Every event lands in exactly two hopping windows and the
    per-window sums partition-invariantly match a hand aggregate."""
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines.analytics import (
        HOP_US,
        HOP_WINDOW_US,
        q_events_hopping,
    )

    sf = "/root/testdata/sf0.001"
    got = q_events_hopping(sf).to_pandas()
    ev = pd.read_parquet(
        f"{sf}/events.parquet", columns=["event_type", "ts", "value"]
    )
    # total replicated mass = 2x the input
    assert got["n_events"].sum() == 2 * len(ev)
    # hand-check one window: count events with ws <= t < ws + width
    row = got.sort_values(["event_type", "window_start_us"]).iloc[5]
    us = ev["ts"].to_numpy("datetime64[us]").astype(np.int64)
    m = (
        (ev["event_type"] == row["event_type"]).to_numpy()
        & (us >= row["window_start_us"])
        & (us < row["window_start_us"] + HOP_WINDOW_US)
    )
    assert int(m.sum()) == int(row["n_events"])
    v_c = np.floor(ev["value"].to_numpy(np.float64) * 100 + 0.5)
    assert float(v_c[m].sum() / 100.0) == float(row["sum_value"])
    # window starts are hop-aligned
    assert (got["window_start_us"].to_numpy() % HOP_US == 0).all()


def test_doc_scrub_counts(ray_session):
    """Regex scrub: clean length + match count agree with a direct
    re.sub/findall pass over the same docs."""
    import re

    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines.analytics import (
        SCRUB_PATTERN,
        q_doc_scrub,
    )

    sf = "/root/testdata/sf0.001"
    got = q_doc_scrub(sf).to_pandas().sort_values("doc_id").reset_index(
        drop=True
    )
    docs = pd.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id", "text"]).sort_values(
        "doc_id"
    ).reset_index(drop=True)
    pat = re.compile(SCRUB_PATTERN)
    assert got["doc_id"].tolist() == docs["doc_id"].tolist()
    assert got["n_redacted"].tolist() == [
        len(pat.findall(t)) for t in docs["text"]
    ]
    assert got["clean_chars"].tolist() == [
        len(pat.sub("", t)) for t in docs["text"]
    ]
    assert got["n_redacted"].sum() > 0  # the pattern actually fires


def test_embed_centroids_partition_invariant_and_exact(ray_session):
    """Centroid partials merge exactly: identical output at any split,
    and the per-label mean matches a direct numpy mean."""
    import duckdb

    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines.analytics import (
        q_embed_centroids,
    )

    sf = "/root/testdata/sf0.001"
    got = q_embed_centroids(sf).to_pandas().sort_values(
        ["label", "pos"]
    ).reset_index(drop=True)
    emb = pd.read_parquet(f"{sf}/embeddings.parquet")
    for lab, grp in emb.groupby("label"):
        mat = np.stack(grp["embedding"].to_numpy()).astype(np.float64)
        want = np.round(mat.mean(0), 6)
        mine = got[got["label"] == lab].sort_values("pos")[
            "centroid"
        ].to_numpy()
        assert np.allclose(mine, want, atol=2e-6), lab


def test_orders_price_zscore_properties(ray_session):
    """z-scores have ~0 mean / ~1 std and match a direct computation."""
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines.analytics import (
        q_orders_price_zscore,
    )

    sf = "/root/testdata/sf0.001"
    got = q_orders_price_zscore(sf).to_pandas().sort_values(
        "o_orderkey"
    ).reset_index(drop=True)
    o = pd.read_parquet(f"{sf}/orders.parquet").sort_values(
        "o_orderkey"
    ).reset_index(drop=True)
    c = np.floor(o["o_totalprice"].to_numpy() * 100 + 0.5)
    want = np.round((c - c.mean()) / c.std(), 6)  # population std
    assert np.allclose(got["z"].to_numpy(), want, atol=2e-6)
    assert abs(got["z"].mean()) < 1e-6
    assert abs(got["z"].std(ddof=0) - 1.0) < 1e-6


def test_user_churn_statuses(ray_session):
    """Snapshot diff: status derivation matches direct set algebra on
    the two day-slices."""
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines.analytics import (
        CHURN_DAY_A,
        CHURN_DAY_B,
        q_user_churn,
    )

    sf = "/root/testdata/sf0.01"
    got = q_user_churn(sf).to_pandas()
    ev = pd.read_parquet(f"{sf}/events.parquet", columns=["user_id", "ts"])
    days = ev["ts"].dt.date.astype(str)
    a = set(ev.loc[days == CHURN_DAY_A, "user_id"])
    b = set(ev.loc[days == CHURN_DAY_B, "user_id"])
    m = got.set_index("user_id")["status"]
    assert set(m.index) == a | b
    assert set(m[m == "retained"].index) == a & b
    assert set(m[m == "dropped"].index) == a - b
    assert set(m[m == "added"].index) == b - a
    assert len(a - b) > 0 and len(b - a) > 0  # the diff is non-trivial
