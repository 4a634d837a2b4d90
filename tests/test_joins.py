import numpy as np
import pandas as pd
import pytest
import ray.data

from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines.joins import (
    asof_join,
)


def _fixture(seed: int, n_left: int = 400, n_right: int = 300):
    rng = np.random.default_rng(seed)
    t0 = np.datetime64("2024-01-01", "us")
    left = pd.DataFrame(
        {
            "event_id": np.arange(n_left, dtype=np.int64),
            "user_id": rng.integers(0, 12, n_left),
            "ts": t0 + rng.integers(0, 10**9, n_left).astype("timedelta64[us]"),
        }
    )
    right = pd.DataFrame(
        {
            "event_id": np.arange(10_000, 10_000 + n_right, dtype=np.int64),
            "user_id": rng.integers(0, 12, n_right),
            "ts": t0 + rng.integers(0, 10**9, n_right).astype("timedelta64[us]"),
            "value": np.round(rng.uniform(0, 100, n_right), 2),
        }
    )
    # duplicate-ts collisions to exercise the (ts, id) tie-break
    dup = right.iloc[:20].copy()
    dup["event_id"] += 50_000
    dup["value"] += 1000.0
    right = pd.concat([right, dup], ignore_index=True)
    return left, right


def _pandas_asof(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
    r = right.sort_values(["ts", "event_id"], kind="stable")
    out = pd.merge_asof(
        left.sort_values("ts", kind="stable"),
        r.rename(columns={"ts": "asof_ts", "value": "asof_value"})[
            ["user_id", "asof_ts", "asof_value"]
        ],
        left_on="ts",
        right_on="asof_ts",
        by="user_id",
        direction="backward",
        allow_exact_matches=True,
    )
    out = out.dropna(subset=["asof_value"])
    return out[["event_id", "user_id", "ts", "asof_ts", "asof_value"]]


@pytest.mark.parametrize("seed", [7, 23])
def test_asof_join_matches_pandas(ray_session, seed):
    left, right = _fixture(seed)
    got = (
        asof_join(
            ray.data.from_pandas(left).repartition(5),
            ray.data.from_pandas(right).repartition(4),
        )
        .to_pandas()
        .sort_values(["event_id"])
        .reset_index(drop=True)
    )
    want = (
        _pandas_asof(left, right).sort_values(["event_id"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_asof_join_no_right_rows_for_key(ray_session):
    left = pd.DataFrame(
        {
            "event_id": np.array([1, 2], np.int64),
            "user_id": np.array([5, 6], np.int64),
            "ts": pd.to_datetime(["2024-01-02", "2024-01-03"]),
        }
    )
    right = pd.DataFrame(
        {
            "event_id": np.array([9], np.int64),
            "user_id": np.array([5], np.int64),
            "ts": pd.to_datetime(["2024-01-01"]),
            "value": np.array([3.5]),
        }
    )
    got = asof_join(
        ray.data.from_pandas(left), ray.data.from_pandas(right)
    ).to_pandas()
    # user 6 has no right rows -> dropped (inner as-of); user 5 matches
    assert got["event_id"].tolist() == [1]
    assert got["asof_value"].tolist() == [3.5]


def test_broadcast_join_enrichment(ray_session):
    """Broadcast equi-join: inner semantics, multi-shard probe path,
    typed string/numeric right columns, duplicate-key rejection."""
    import pandas as pd
    import pyarrow as pa

    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines.joins import (
        broadcast_join,
    )

    left = ray.data.from_pandas(pd.DataFrame({
        "k": [1, 2, 3, 5, 7, 2, 99],
        "v": [10.0, 20.0, 30.0, 50.0, 70.0, 21.0, 990.0],
    })).repartition(3)
    right = ray.data.from_pandas(pd.DataFrame({
        "rk": [1, 2, 3, 5, 7, 8],
        "name": ["a", "b", "c", "e", "g", "h"],
        "grp": [100, 200, 300, 500, 700, 800],
    }))
    # max_per_shard=2 forces the multi-shard residue path
    out = broadcast_join(
        left, right, key="k", right_columns=["name", "grp"],
        right_key="rk", max_per_shard=2,
    ).to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    assert out["k"].tolist() == [1, 2, 2, 3, 5, 7]  # 99 dropped (inner)
    assert out["name"].tolist() == ["a", "b", "b", "c", "e", "g"]
    assert out["grp"].tolist() == [100, 200, 200, 300, 500, 700]
    assert out["v"].tolist() == [10.0, 20.0, 21.0, 30.0, 50.0, 70.0]

    # duplicate right keys violate the dimension contract
    dup = ray.data.from_pandas(pd.DataFrame(
        {"rk": [1, 1], "name": ["a", "b"], "grp": [1, 2]}))
    with pytest.raises(ValueError, match="duplicate"):
        broadcast_join(left, dup, key="k",
                       right_columns=["name", "grp"], right_key="rk")


def test_broadcast_join_string_keys(ray_session):
    """STRING-key broadcast join: hash probe + exact string verify,
    multi-shard path, misses dropped, dtype-mismatch rejection."""
    import pandas as pd

    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines.joins import (
        broadcast_join,
    )

    left = ray.data.from_pandas(pd.DataFrame({
        "src": ["cc", "wiki", "arxiv", "cc", "github", "nope"],
        "v": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0],
    })).repartition(2)
    right = ray.data.from_pandas(pd.DataFrame({
        "source": ["arxiv", "cc", "github", "wiki", "books"],
        "tier": np.array([2, 0, 1, 1, 2], np.int64),
        "label": ["paper", "crawl", "code", "ref", "book"],
    }))
    out = broadcast_join(
        left, right, key="src", right_columns=["tier", "label"],
        right_key="source", max_per_shard=2,
    ).to_pandas().sort_values("v").reset_index(drop=True)
    assert out["src"].tolist() == ["cc", "wiki", "arxiv", "cc", "github"]
    assert out["tier"].tolist() == [0, 1, 2, 0, 1]
    assert out["label"].tolist() == ["crawl", "ref", "paper", "crawl", "code"]

    # duplicate right string keys violate the dimension contract
    dup = ray.data.from_pandas(pd.DataFrame(
        {"source": ["cc", "cc"], "tier": np.array([0, 1], np.int64),
         "label": ["a", "b"]}))
    with pytest.raises(ValueError, match="duplicate"):
        broadcast_join(left, dup, key="src",
                       right_columns=["tier", "label"], right_key="source")

    # left integer vs right string key is a loud error, not a silent
    # miss (the mismatch surfaces from inside Ray tasks, so match on
    # the message text rather than the wrapped exception type)
    ileft = ray.data.from_pandas(pd.DataFrame(
        {"src": np.array([1, 2], np.int64), "v": [1.0, 2.0]}))
    with pytest.raises(Exception, match="dtype mismatch"):
        broadcast_join(
            ileft, right, key="src", right_columns=["tier"],
            right_key="source",
        ).to_pandas()

    # float keys (an int key column that picked up NULLs) reject loudly
    fright = ray.data.from_pandas(pd.DataFrame(
        {"source": [1.5, 2.5], "tier": np.array([0, 1], np.int64)}))
    with pytest.raises(TypeError, match="integer- or"):
        broadcast_join(left, fright, key="src",
                       right_columns=["tier"], right_key="source")


@pytest.mark.parametrize("seed", [11, 42])
def test_hash_join_matches_pandas_merge(ray_session, seed):
    """Shuffle equi-join vs pandas merge: many-to-many expansion,
    unmatched rows on both sides dropped, multi-bucket exchange."""
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines.joins import (
        hash_join,
    )

    rng = np.random.default_rng(seed)
    left = pd.DataFrame({
        "k": rng.integers(0, 50, 600).astype(np.int64),
        "lv": np.round(rng.uniform(0, 10, 600), 3),
        "tag": rng.choice(["x", "y", "z"], 600),
    })
    right = pd.DataFrame({
        # keys 25..74: half overlap, duplicates on both sides
        "rk": rng.integers(25, 75, 200).astype(np.int64),
        "rv": rng.integers(0, 1000, 200).astype(np.int64),
        "rname": rng.choice(["p", "q"], 200),
    })
    got = (
        hash_join(
            ray.data.from_pandas(left).repartition(5),
            ray.data.from_pandas(right).repartition(3),
            key="k", right_columns=["rv", "rname"], right_key="rk",
            n_buckets=7,
        )
        .to_pandas()
        .sort_values(["k", "lv", "rv", "rname"], kind="stable")
        .reset_index(drop=True)
    )
    want = (
        left.merge(right, left_on="k", right_on="rk")[
            ["k", "lv", "tag", "rv", "rname"]
        ]
        .sort_values(["k", "lv", "rv", "rname"], kind="stable")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_hash_join_contracts(ray_session):
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines.joins import (
        hash_join,
    )

    left = ray.data.from_pandas(pd.DataFrame(
        {"k": np.array([1, 2], np.int64), "rv": [1.0, 2.0]}))
    right = ray.data.from_pandas(pd.DataFrame(
        {"k": np.array([1], np.int64), "rv": [9.0]}))
    # right column colliding with a left column raises in the probe
    with pytest.raises(Exception, match="collision"):
        hash_join(left, right, key="k", right_columns=["rv"]).to_pandas()

    # float key rejected (int and string are the supported domains)
    fleft = ray.data.from_pandas(pd.DataFrame(
        {"k": np.array([1.5, 2.5]), "v": [1, 2]}))
    with pytest.raises(Exception, match="integer- or string-typed"):
        hash_join(fleft, right, key="k", right_columns=["rv"]).to_pandas()

    # mixed-type keys (string left, int right) fail loudly in the probe
    sleft = ray.data.from_pandas(pd.DataFrame({"k": ["a", "b"], "v": [1, 2]}))
    with pytest.raises(Exception, match="dtype mismatch"):
        hash_join(sleft, right, key="k", right_columns=["rv"]).to_pandas()

    # disjoint keys -> typed empty result with the joined schema
    far = ray.data.from_pandas(pd.DataFrame(
        {"k": np.array([100], np.int64), "extra": [5.5]}))
    out = hash_join(left, far, key="k", right_columns=["extra"], n_buckets=4)
    assert out.count() == 0
    # every bucket block keeps the joined schema (typed empty tables);
    # Ray's to_pandas drops columns on an all-empty dataset, so assert
    # on the Dataset schema
    assert out.schema().names == ["k", "rv", "extra"]


def _brute_range(points: pd.DataFrame, iv: pd.DataFrame) -> pd.DataFrame:
    out = points.merge(iv, how="cross")
    out = out[(out["lo"] <= out["v"]) & (out["v"] <= out["hi"])]
    return out[["pid", "v", "band"]]


@pytest.mark.parametrize("seed,n_tiles", [(3, None), (11, 1), (11, 5), (29, 64)])
def test_range_join_matches_brute_force(ray_session, seed, n_tiles):
    """Tile-partitioned interval join == the O(n*m) cross-filter, at
    auto tiling and forced tile counts (1 tile = one big probe; more
    tiles than distinct values = heavy replication) — every matching
    pair appears exactly once regardless of the tiling."""
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines.joins import (
        range_join,
    )

    rng = np.random.default_rng(seed)
    points = pd.DataFrame({
        "pid": np.arange(500, dtype=np.int64),
        "v": np.round(rng.uniform(0, 1000, 500), 3),
    })
    lo = rng.uniform(-50, 1000, 120)  # some bands start below the domain
    iv = pd.DataFrame({
        "lo": lo,
        "hi": lo + rng.uniform(0, 80, 120),
        "band": np.arange(120, dtype=np.int64),
    })
    got = (
        range_join(
            ray.data.from_pandas(points).repartition(4),
            ray.data.from_pandas(iv).repartition(3),
            value_col="v", lo_col="lo", hi_col="hi",
            interval_cols=["band"], n_tiles=n_tiles,
        )
        .to_pandas()[["pid", "v", "band"]]
        .sort_values(["pid", "band"], kind="stable")
        .reset_index(drop=True)
    )
    want = (
        _brute_range(points, iv)
        .sort_values(["pid", "band"], kind="stable")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_range_join_inclusive_bounds_and_contracts(ray_session):
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines.joins import (
        range_join,
    )

    # lo == v and v == hi both match (SQL BETWEEN); outside-domain and
    # inverted (lo > hi) intervals match nothing
    points = ray.data.from_pandas(pd.DataFrame(
        {"pid": np.array([0, 1, 2], np.int64), "v": [10.0, 20.0, 30.0]}))
    iv = ray.data.from_pandas(pd.DataFrame({
        "lo": [10.0, 25.0, 500.0, 30.0],
        "hi": [20.0, 30.0, 600.0, 10.0],
        "band": np.array([0, 1, 2, 3], np.int64),
    }))
    got = (
        range_join(points, iv, "v", "lo", "hi", ["band"], n_tiles=2)
        .to_pandas()
        .sort_values(["pid", "band"])
        .reset_index(drop=True)
    )
    assert list(zip(got["pid"], got["band"])) == [
        (0, 0), (1, 0), (2, 1)
    ]

    # interval column colliding with a point column raises at execution
    # (task-side check: a driver-side schema() probe would force a
    # limit(1) execution wave — see range_join's NOTE)
    with pytest.raises(Exception, match="collision"):
        range_join(points, iv.map_batches(
            lambda df: df.rename(columns={"band": "v"}),
            batch_format="pandas"), "v", "lo", "hi", ["v"]).materialize()


def test_range_join_explicit_bounds(ray_session):
    """bounds=(pmin, pmax) skips the min/max metadata pass; results are
    identical, and points outside the supplied bounds still match
    correctly (clamped into the edge tiles)."""
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines.joins import (
        range_join,
    )

    points = pd.DataFrame({
        "pid": np.arange(6, dtype=np.int64),
        # -5 and 105 fall OUTSIDE the supplied bounds
        "v": [-5.0, 10.0, 40.0, 60.0, 90.0, 105.0],
    })
    iv = pd.DataFrame({
        "lo": [-10.0, 35.0, 100.0],
        "hi": [12.0, 65.0, 110.0],
        "band": np.array([0, 1, 2], np.int64),
    })
    got = (
        range_join(
            ray.data.from_pandas(points), ray.data.from_pandas(iv),
            "v", "lo", "hi", ["band"], n_tiles=4, bounds=(0.0, 100.0),
        )
        .to_pandas().sort_values(["pid", "band"]).reset_index(drop=True)
    )
    want = (
        _brute_range(points.rename(columns={}), iv)
        .sort_values(["pid", "band"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["pid", "v", "band"]], want, check_dtype=False
    )


def test_hash_join_modes_match_pandas(ray_session):
    """semi/anti/left variants vs pandas on the same skewed fixture:
    semi+anti partition the left exactly, left keeps unmatched rows
    with real NULLs (not sentinels)."""
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines.joins import (
        hash_join,
    )

    rng = np.random.default_rng(20260819)
    left = pd.DataFrame({
        "k": rng.integers(0, 60, 500).astype(np.int64),
        "lv": np.arange(500, dtype=np.int64),
    })
    right = pd.DataFrame({
        "rk": rng.integers(30, 90, 150).astype(np.int64),
        "rv": np.round(rng.uniform(0, 5, 150), 3),
    })
    L = ray.data.from_pandas(left).repartition(4)
    R = ray.data.from_pandas(right).repartition(3)
    matched_keys = set(right["rk"])

    semi = hash_join(L, R, key="k", right_columns=[], right_key="rk",
                     how="semi", n_buckets=5).to_pandas()
    want_semi = left[left["k"].isin(matched_keys)]
    pd.testing.assert_frame_equal(
        semi.sort_values("lv").reset_index(drop=True),
        want_semi.sort_values("lv").reset_index(drop=True),
        check_dtype=False,
    )

    anti = hash_join(L, R, key="k", right_columns=[], right_key="rk",
                     how="anti", n_buckets=5).to_pandas()
    want_anti = left[~left["k"].isin(matched_keys)]
    pd.testing.assert_frame_equal(
        anti.sort_values("lv").reset_index(drop=True),
        want_anti.sort_values("lv").reset_index(drop=True),
        check_dtype=False,
    )
    # semi + anti partition the left exactly
    assert len(semi) + len(anti) == len(left)

    lj = hash_join(L, R, key="k", right_columns=["rv"], right_key="rk",
                   how="left", n_buckets=5).to_pandas()
    want_lj = left.merge(
        right.rename(columns={"rk": "k"}), on="k", how="left"
    )
    srt = ["lv", "rv"]
    pd.testing.assert_frame_equal(
        lj.sort_values(srt).reset_index(drop=True),
        want_lj.sort_values(srt).reset_index(drop=True),
        check_dtype=False,
    )
    # unmatched rows carry actual nulls
    assert lj["rv"].isna().sum() == len(want_anti)

    with pytest.raises(ValueError, match="how="):
        hash_join(L, R, key="k", right_columns=[], how="outer")


def test_hash_join_left_empty_right_side(ray_session):
    """LEFT join against a right side whose buckets are all empty:
    every left row survives with a typed NULL column."""
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines.joins import (
        hash_join,
    )

    left = ray.data.from_pandas(pd.DataFrame(
        {"k": np.array([1, 2, 3], np.int64), "v": [1.0, 2.0, 3.0]}))
    right = ray.data.from_pandas(pd.DataFrame(
        {"k": np.array([99], np.int64), "rv": [7.5]}))
    out = hash_join(left, right, key="k", right_columns=["rv"],
                    how="left", n_buckets=4).to_pandas()
    assert len(out) == 3
    assert out["rv"].isna().all()


@pytest.mark.parametrize("how", ["inner", "left", "semi", "anti"])
def test_hash_join_salted_hot_key(ray_session, how):
    """n_salt splits a planted hot key (80% of the left side) across
    sub-buckets; results are identical to the unsalted join for every
    supported mode, and how='full' rejects salting loudly."""
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines.joins import (
        hash_join,
    )

    rng = np.random.default_rng(7)
    hot = np.full(800, 42, np.int64)
    cold = rng.integers(0, 60, 200).astype(np.int64)
    left = pd.DataFrame({
        "k": np.concatenate([hot, cold]),
        "lv": np.arange(1000, dtype=np.int64),
    })
    right = pd.DataFrame({
        "rk": rng.integers(0, 80, 150).astype(np.int64),
        "rv": np.arange(150, dtype=np.int64),
    })
    # ensure the hot key matches (multiplicity 3 on the right)
    right.loc[:2, "rk"] = 42

    def run(n_salt):
        cols = [] if how in ("semi", "anti") else ["rv"]
        out = hash_join(
            ray.data.from_pandas(left).repartition(4),
            ray.data.from_pandas(right).repartition(2),
            key="k", right_key="rk", right_columns=cols,
            how=how, n_buckets=8, n_salt=n_salt,
        ).to_pandas()
        sort_cols = [c for c in ("k", "lv", "rv") if c in out.columns]
        return out.sort_values(sort_cols).reset_index(drop=True)

    base, salted = run(1), run(8)
    pd.testing.assert_frame_equal(base, salted)
    if how == "inner":
        # hot key fully expanded: left multiplicity x right multiplicity
        n_l42 = int((left["k"] == 42).sum())
        n_r42 = int((right["rk"] == 42).sum())
        assert n_l42 >= 800 and n_r42 >= 3
        assert (base["k"] == 42).sum() == n_l42 * n_r42

    with pytest.raises(ValueError, match="full"):
        hash_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right),
            key="k", right_key="rk", right_columns=["rv"],
            how="full", n_salt=2,
        )


def test_broadcast_join_left_outer(ray_session):
    """how='left': unmatched big-side rows survive with real Arrow
    NULLs in the right columns, for both int and string keys."""
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines.joins import (
        broadcast_join,
    )

    left = ray.data.from_pandas(pd.DataFrame({
        "k": np.array([1, 2, 99, 3], np.int64),
        "v": [10.0, 20.0, 990.0, 30.0],
    })).repartition(2)
    right = ray.data.from_pandas(pd.DataFrame({
        "rk": np.array([1, 2, 3], np.int64),
        "name": ["a", "b", "c"],
        "grp": np.array([100, 200, 300], np.int64),
    }))
    out = broadcast_join(
        left, right, key="k", right_columns=["name", "grp"],
        right_key="rk", how="left", max_per_shard=2,
    ).to_pandas().sort_values("k").reset_index(drop=True)
    assert out["k"].tolist() == [1, 2, 3, 99]
    assert out["name"].tolist()[:3] == ["a", "b", "c"]
    assert pd.isna(out["name"].iloc[3])
    assert pd.isna(out["grp"].iloc[3])
    assert out["grp"].iloc[:3].tolist() == [100, 200, 300]

    # string keys: the hash-verify miss path must also null, not drop
    sleft = ray.data.from_pandas(pd.DataFrame({
        "src": ["cc", "nope", "wiki"], "v": [1.0, 2.0, 3.0]}))
    sright = ray.data.from_pandas(pd.DataFrame({
        "source": ["cc", "wiki"], "tier": np.array([0, 1], np.int64)}))
    got = broadcast_join(
        sleft, sright, key="src", right_columns=["tier"],
        right_key="source", how="left",
    ).to_pandas().sort_values("v").reset_index(drop=True)
    assert got["src"].tolist() == ["cc", "nope", "wiki"]
    assert got["tier"].iloc[0] == 0 and got["tier"].iloc[2] == 1
    assert pd.isna(got["tier"].iloc[1])

    with pytest.raises(ValueError, match="how"):
        broadcast_join(sleft, sright, key="src", right_columns=["tier"],
                       right_key="source", how="full")


@pytest.mark.parametrize("how", ["inner", "semi"])
def test_hash_join_bloom_prefilter(ray_session, how):
    """Bloom prefilter: identical results to the plain join (no false
    negatives) on a selective join where most left keys are unmatched;
    unsupported modes reject loudly."""
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines.joins import (
        hash_join,
    )

    rng = np.random.default_rng(13)
    left = pd.DataFrame({
        "k": rng.integers(0, 100_000, 3000).astype(np.int64),
        "lv": np.arange(3000, dtype=np.int64),
    })
    right = pd.DataFrame({  # tiny curated subset: ~97% left miss rate
        "rk": rng.integers(0, 100_000, 80).astype(np.int64),
        "rv": np.arange(80, dtype=np.int64),
    })

    def run(bloom):
        cols = [] if how == "semi" else ["rv"]
        out = hash_join(
            ray.data.from_pandas(left).repartition(4),
            ray.data.from_pandas(right).repartition(2),
            key="k", right_key="rk", right_columns=cols,
            how=how, n_buckets=8, bloom_prefilter=bloom,
            bloom_bits=1 << 12,
        ).to_pandas()
        sort_cols = [c for c in ("k", "lv", "rv") if c in out.columns]
        return out.sort_values(sort_cols).reset_index(drop=True)

    pd.testing.assert_frame_equal(run(False), run(True))

    # string keys through the same bloom path
    sl = pd.DataFrame({"k": [f"u{i}" for i in range(500)],
                       "lv": np.arange(500, dtype=np.int64)})
    sr = pd.DataFrame({"rk": ["u3", "u77", "u411", "zzz"],
                       "rv": np.arange(4, dtype=np.int64)})
    cols = [] if how == "semi" else ["rv"]
    a = hash_join(ray.data.from_pandas(sl), ray.data.from_pandas(sr),
                  key="k", right_key="rk", right_columns=cols, how=how,
                  bloom_prefilter=True).to_pandas().sort_values("lv")
    b = hash_join(ray.data.from_pandas(sl), ray.data.from_pandas(sr),
                  key="k", right_key="rk", right_columns=cols,
                  how=how).to_pandas().sort_values("lv")
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))

    with pytest.raises(ValueError, match="bloom"):
        hash_join(ray.data.from_pandas(left), ray.data.from_pandas(right),
                  key="k", right_key="rk", right_columns=["rv"],
                  how="left", bloom_prefilter=True)


def test_hash_join_mixed_int_widths_negative_keys(ray_session):
    """int32 left vs int64 right with negative keys: the bucket hash
    widens to int64 first, so the same key value always meets itself
    (hash_array hashes raw byte width — unwidened, int32 -5 and int64
    -5 would land in different buckets and silently drop matches)."""
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines.joins import (
        hash_join,
    )

    left = pd.DataFrame({
        "k": np.array([-5, -1, 3, -7, 2], np.int32),
        "lv": np.arange(5, dtype=np.int64),
    })
    right = pd.DataFrame({
        "rk": np.array([-5, -7, 2, 9], np.int64),
        "rv": np.arange(4, dtype=np.int64),
    })
    got = hash_join(
        ray.data.from_pandas(left), ray.data.from_pandas(right),
        key="k", right_key="rk", right_columns=["rv"],
        n_buckets=8,
    ).to_pandas().sort_values("lv").reset_index(drop=True)
    assert got["k"].tolist() == [-5, -7, 2]
    assert got["rv"].tolist() == [0, 1, 2]

    # and through the bloom prefilter (same widening in the probe hash)
    got_b = hash_join(
        ray.data.from_pandas(left), ray.data.from_pandas(right),
        key="k", right_key="rk", right_columns=["rv"],
        n_buckets=8, bloom_prefilter=True,
    ).to_pandas().sort_values("lv").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, got_b)
