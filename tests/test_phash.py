"""Perceptual-hash operators: hash stability under lossy re-encode,
band-LSH near-dup recall/precision on planted duplicates, registry
wiring."""

import numpy as np
import pyarrow as pa
import pytest

from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines import (
    multimodal,
)
from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.sources.image_codec import (
    decode_jpeg,
    deterministic_pixels,
    encode_jpeg,
    encode_png,
)
from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.sources.images import (
    IMAGE_SCHEMA,
)


def _ham(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def test_phash_stable_under_jpeg_reencode():
    for i in range(20):
        px = deterministic_pixels(f"PH{i}", 16, 16)
        p1 = multimodal.phash64_pixels(px)
        p2 = multimodal.phash64_pixels(decode_jpeg(encode_jpeg(px)))
        assert _ham(p1, p2) <= 7  # inside the default LSH guarantee


def test_phash_separates_unrelated():
    hashes = [
        multimodal.phash64_pixels(deterministic_pixels(f"U{i}", 16, 16))
        for i in range(20)
    ]
    for i in range(len(hashes)):
        for j in range(i + 1, len(hashes)):
            assert _ham(hashes[i], hashes[j]) > 7


def test_phash_shape_invariance():
    # hash is defined on the 32x32 resample: any input shape works
    px = deterministic_pixels("SH", 13, 9)
    assert 0 <= multimodal.phash64_pixels(px) < (1 << 63)


def _planted_table(n_base: int, n_dups: int) -> pa.Table:
    rows = {k: [] for k in IMAGE_SCHEMA.names}

    def add(iid, px, fmt):
        rows["image_id"].append(iid)
        rows["bytes"].append(encode_png(px) if fmt == "png" else encode_jpeg(px))
        rows["w"].append(px.shape[1])
        rows["h"].append(px.shape[0])
        rows["fmt"].append(fmt)
        rows["caption"].append(f"{iid} at 0.000 0.000")
        rows["phash"].append(0)

    for i in range(n_base):
        iid = f"P{i:03d}"
        px = deterministic_pixels(iid, 16, 16)
        add(iid, px, "png")
        if i < n_dups:
            add(iid + "~j", px, "jpeg")
    return pa.table(rows, schema=IMAGE_SCHEMA)


def test_phash_neardup_finds_exactly_planted_pairs(ray_session):
    import ray.data

    t = _planted_table(64, 16)
    parts = [t.slice(o, 32) for o in range(0, t.num_rows, 32)]
    res = multimodal.phash_neardup(
        ray.data.from_arrow(parts), n_parts=8
    ).to_pandas()
    got = set(zip(res["id_a"], res["id_b"]))
    want = {(f"P{i:03d}", f"P{i:03d}~j") for i in range(16)}
    assert got == want
    assert (res["hamming"] <= 7).all()


def test_image_phash_deterministic(ray_session):
    import ray.data

    t = _planted_table(16, 0)
    a = multimodal.image_phash(ray.data.from_arrow(t)).to_pandas()
    b = multimodal.image_phash(ray.data.from_arrow(t)).to_pandas()
    a = a.sort_values("image_id").reset_index(drop=True)
    b = b.sort_values("image_id").reset_index(drop=True)
    assert a.equals(b)
    assert a["phash64"].dtype == np.int64


def test_phash_queries_registered():
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines import (
        queries,
    )

    assert "image_phash" in queries.DATA_QUERIES
    assert "image_phash_neardup" in queries.DATA_QUERIES
    assert "image_stats" in queries.DATA_QUERIES and "image_stats" in queries.DATA_SQL
    # goldens are committed, so the SQL oracles must be installed
    assert "image_phash" in queries.DATA_SQL
    assert "image_phash_neardup" in queries.DATA_SQL
    assert "GOLDEN_INPUT_MISMATCH" in queries.DATA_SQL["image_phash"]


def test_phash_neardup_param_validation(ray_session):
    import ray.data

    ds = ray.data.from_arrow(_planted_table(4, 0))
    with pytest.raises(ValueError):
        multimodal.phash_neardup(ds, max_hamming=10, n_bands=8).count()
    with pytest.raises(ValueError):
        multimodal.phash_neardup(ds, max_hamming=40).count()
    # explicit radius with auto bands: picks a band count that keeps
    # the pigeonhole guarantee (here 16 bands for <= 15)
    res = multimodal.phash_neardup(ds, max_hamming=12, n_parts=4)
    assert res.count() == 0  # unrelated fixture images stay apart


def test_image_resize_query_registered():
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines import (
        queries,
    )

    assert "image_resize" in queries.DATA_QUERIES
    assert "image_resize" in queries.DATA_SQL
