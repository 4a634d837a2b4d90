"""Per-partition resumable parquet sink."""

import json
import os
import shutil

import numpy as np
import pandas as pd
import ray.data

from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.sinks import (
    _PART_MANIFEST,
    finished_partitions,
    resumable_write_partitioned,
)


def _fixture():
    rng = np.random.default_rng(17)
    return pd.DataFrame(
        {
            "shard": rng.integers(0, 5, 500).astype(np.int64),
            "x": np.arange(500, dtype=np.int64),
        }
    )


def _read_back(out_dir: str) -> pd.DataFrame:
    df = ray.data.read_parquet(out_dir).to_pandas()
    # hive partition columns come back last (and as strings)
    df["shard"] = df["shard"].astype(np.int64)
    return df[["shard", "x"]].sort_values(["shard", "x"]).reset_index(drop=True)


def test_write_then_full_resume_skips_everything(tmp_path, ray_session):
    df = _fixture()
    out = str(tmp_path / "out")
    r1 = resumable_write_partitioned(
        ray.data.from_pandas(df).repartition(4), out, "shard"
    )
    assert r1["written"] == ["0", "1", "2", "3", "4"] and r1["skipped"] == []
    got = _read_back(out)
    pd.testing.assert_frame_equal(
        got, df.sort_values(["shard", "x"]).reset_index(drop=True)
    )
    # rerun: nothing to do
    r2 = resumable_write_partitioned(
        ray.data.from_pandas(df).repartition(4), out, "shard"
    )
    assert r2["written"] == [] and r2["skipped"] == ["0", "1", "2", "3", "4"]
    pd.testing.assert_frame_equal(_read_back(out), got)


def test_crash_resume_rewrites_only_missing(tmp_path, ray_session):
    """Simulate a crash: one partition partial (no manifest), one
    missing entirely. Resume rewrites exactly those two."""
    df = _fixture()
    out = str(tmp_path / "out")
    resumable_write_partitioned(ray.data.from_pandas(df), out, "shard")

    # shard=2 'crashed mid-write': drop its manifest (partial dir)
    os.remove(os.path.join(out, "shard=2", _PART_MANIFEST))
    # shard=4 never started
    shutil.rmtree(os.path.join(out, "shard=4"))
    assert finished_partitions(out, "shard") == {"0", "1", "3"}

    # finished partitions must not be touched by the resume
    mtimes = {
        s: os.path.getmtime(os.path.join(out, f"shard={s}", _PART_MANIFEST))
        for s in ("0", "1", "3")
    }
    r = resumable_write_partitioned(ray.data.from_pandas(df), out, "shard")
    assert r["written"] == ["2", "4"] and r["skipped"] == ["0", "1", "3"]
    for s, m in mtimes.items():
        assert os.path.getmtime(
            os.path.join(out, f"shard={s}", _PART_MANIFEST)
        ) == m
    # read-back is exact (no double-counted rows from the partial dir)
    pd.testing.assert_frame_equal(
        _read_back(out), df.sort_values(["shard", "x"]).reset_index(drop=True)
    )


def test_manifest_payload(tmp_path, ray_session):
    df = _fixture().head(50)
    out = str(tmp_path / "out")
    resumable_write_partitioned(ray.data.from_pandas(df), out, "shard")
    with open(os.path.join(out, "shard=0", _PART_MANIFEST)) as f:
        assert json.load(f)["partition"] == "0"
