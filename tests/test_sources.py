"""Source readers: the reference CSV layout, config-file parsing, the
events projection, and the report sink."""

import json
import os

import numpy as np
import pytest

from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.config import (
    MiningConfig,
    load_config_file,
)
from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines.colocation import (
    from_numpy,
    mine,
    write_results,
)
from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.sources.fixtures import (
    sample_tiny,
)
from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.sources.instances import (
    instances_from_events,
    read_instances_csv,
)


def test_read_reference_csv_layout(ray_session, tmp_path):
    """Feature,Instance,LocX,LocY (+ ignored extra column, like the
    bundled LasVegas file's Checkin -- SURVEY.md S1)."""
    p = tmp_path / "pts.csv"
    p.write_text(
        "Feature,Instance,LocX,LocY,Checkin\n"
        "A,1,9,8,5\n"
        "A,2,3.5,4,6\n"
        "B,1,6,3,7\n"
    )
    rows = sorted(
        read_instances_csv(str(p)).take_all(), key=lambda r: r["instance_id"]
    )
    assert [r["instance_id"] for r in rows] == ["A1", "A2", "B1"]
    assert rows[1]["x"] == 3.5 and rows[1]["feature"] == "A"
    assert "Checkin" not in rows[0]


def test_config_file_parsing(tmp_path):
    p = tmp_path / "config.txt"
    p.write_text(
        "# comment\n"
        "neighbor_distance=160\n"
        "min_prevalence=0.15\n"
        "min_cond_prob=0.5\n"
        "unknown_key=zzz\n"
        "dataset_path=data/foo.csv\n"
    )
    cfg = load_config_file(str(p))
    assert cfg.neighbor_distance == 160.0
    assert cfg.min_prevalence == 0.15
    assert cfg.extra["dataset_path"] == "data/foo.csv"
    # missing file -> defaults (reference src/config.cpp:24-27)
    d = load_config_file(str(tmp_path / "nope.txt"))
    assert d.neighbor_distance == 5.0 and d.min_prevalence == 0.6


def test_events_projection_deterministic(ray_session):
    a = instances_from_events("/root/testdata/sf0.001").take_all()
    b = instances_from_events("/root/testdata/sf0.001").take_all()
    assert sorted(r["instance_id"] for r in a) == sorted(
        r["instance_id"] for r in b
    )
    r0 = next(r for r in a if r["instance_id"] == "7")
    assert r0["x"] == (7 * 7919) % 1000


def test_report_sink(ray_session, tmp_path):
    ids, feats, x, y = sample_tiny()
    run = mine(
        from_numpy(ids, feats, x, y, parallelism=2),
        MiningConfig(neighbor_distance=5.0, min_prevalence=0.6),
    )
    out = str(tmp_path / "results")
    report = write_results(run, out)
    assert report["pattern_count"] == 7
    assert report["min_prevalence"] == 0.6
    with open(os.path.join(out, "report.json")) as f:
        assert json.load(f)["pattern_count"] == 7
    import glob

    assert glob.glob(os.path.join(out, "patterns", "*.parquet"))


def test_read_documents_jsonl(ray_session, tmp_path):
    """JSONL ingest: multi-shard + gzip shards read into the same
    documents-shaped Dataset the parquet path yields, with projection
    applied right after parse."""
    import gzip
    import json

    import pandas as pd

    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.sources.jsonl import (
        read_documents_jsonl,
    )

    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet").head(60)
    recs = docs.to_dict("records")
    p1 = tmp_path / "shard-000.jsonl"
    p2 = tmp_path / "shard-001.jsonl.gz"
    with open(p1, "w") as f:
        for r in recs[:30]:
            f.write(json.dumps(r) + "\n")
    with gzip.open(p2, "wt") as f:
        for r in recs[30:]:
            f.write(json.dumps(r) + "\n")

    got = (
        read_documents_jsonl(str(tmp_path), columns=["doc_id", "text", "source"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = docs[["doc_id", "text", "source"]].sort_values(
        "doc_id"
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # the JSONL rows feed the existing pipelines unchanged
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines.dedup import (
        exact_dedup,
    )

    ds = read_documents_jsonl(str(p1), columns=["doc_id", "text"])
    assert exact_dedup(ds).count() <= 30
