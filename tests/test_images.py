"""Codec round-trips, per-row invariants, geotag projection, and the
flagship image-table mining pipeline vs the oracle."""

import numpy as np
import pytest

from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.config import (
    MiningConfig,
)
from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.oracle import (
    mine_serial,
    pattern_set,
)
from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines import (
    multimodal,
)
from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.sources import (
    geotag as geotag_mod,
)
from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.sources.image_codec import (
    decode_jpeg,
    decode_png,
    deterministic_pixels,
    encode_jpeg,
    encode_png,
    psnr,
)
from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.sources.images import (
    build_image_table,
    pack_phash,
    write_image_fixture,
)


def test_png_roundtrip_exact():
    px = deterministic_pixels("X1", 8, 8)
    assert np.array_equal(decode_png(encode_png(px)), px)


def test_jpeg_lossy_psnr():
    px = deterministic_pixels("X2", 16, 16)
    data = encode_jpeg(px)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"  # real JFIF
    out = decode_jpeg(data)
    db = psnr(out, px)
    assert 40.0 <= db < 60.0  # genuinely lossy but above the invariant bar
    assert not np.array_equal(out, px)


def test_unknown_format_stub_raises():
    with pytest.raises(NotImplementedError):
        from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.sources.image_codec import (
            decode,
        )

        decode(b"xxxx", "webp")
    with pytest.raises(NotImplementedError):
        multimodal.sample_video_frames()


def test_phash_packs_coordinates():
    ph = pack_phash(123.456, 78.9)
    x, y = geotag_mod.unpack_phash(np.array([ph]))
    assert x[0] == 123.456 and y[0] == 78.9


@pytest.fixture(scope="module")
def image_fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgtable")
    return write_image_fixture(str(d), n=1200, n_features=10, seed=5, shards=4)


def test_invariant_checker_passes(ray_session, image_fixture_dir):
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.sources.images import (
        read_image_table,
    )

    images = read_image_table(image_fixture_dir)
    res = geotag_mod.check_invariants(images, concurrency=2)
    rows = res.take_all()
    assert all(r["invariant_ok"] for r in rows)
    jpeg_rows = [r for r in rows if r["fmt"] == "jpeg"]
    assert jpeg_rows and all(r["psnr_db"] >= 40.0 for r in jpeg_rows)


def test_invariant_checker_catches_corruption(ray_session):
    import ray.data

    ids = np.array(["F01A1"], dtype=object)
    t = build_image_table(ids, np.array(["F01"], dtype=object),
                          np.array([1.0]), np.array([2.0]))
    # corrupt the phash so the caption<->phash invariant fails
    t = t.set_column(6, "phash", __import__("pyarrow").array([12345], "int64"))
    ds = ray.data.from_arrow(t)
    import pytest as _pytest

    with _pytest.raises(Exception):
        geotag_mod.check_invariants(ds, concurrency=1).take_all()


def test_decode_stats_and_resize(ray_session, image_fixture_dir):
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.sources.images import (
        read_image_table,
    )

    images = read_image_table(image_fixture_dir).limit(64)
    stats = multimodal.decode_stats(images, concurrency=2).take_all()
    assert len(stats) == 64
    assert all(0 <= r["mean_r"] <= 255 for r in stats)
    small = multimodal.resize_images(images, target=4, concurrency=2).take_all()
    assert all(r["w"] == 4 and r["h"] == 4 and r["fmt"] == "png" for r in small)
    assert all(r["caption"] for r in small)


def test_flagship_image_mining_matches_oracle(ray_session, image_fixture_dir):
    """geotag -> mine on the image table == serial oracle on the decoded
    geometry (the caption/phash round trip must not perturb results)."""
    import pyarrow.parquet as pq
    import glob

    parts = [pq.read_table(p) for p in sorted(
        glob.glob(image_fixture_dir + "/part-*.parquet"))]
    import pyarrow as pa

    t = pa.concat_tables(parts)
    ph = np.array(t["phash"].to_pylist())
    x, y = geotag_mod.unpack_phash(ph)
    feats = np.array([c.split()[0] for c in t["caption"].to_pylist()], dtype=object)
    ids = np.array(t["image_id"].to_pylist(), dtype=object)

    cfg = MiningConfig(neighbor_distance=8.0, min_prevalence=0.25)
    oracle = mine_serial(ids, feats, x, y, 8.0, 0.25, use_lemma3=False)
    run = multimodal.mine_image_table(image_fixture_dir, cfg,
                                      verify_invariants=True)
    assert run.pattern_set() == pattern_set(oracle)
    assert len(pattern_set(oracle)) > 0  # fixture must actually have patterns


def test_read_image_table_lance_branch(ray_session, monkeypatch):
    """The Lance read path is gated behind a tested capability probe:
    without the wheel the probe is False (parquet fallback — every other
    test exercises it); with the probe forced True, read_image_table
    must route to ray.data.read_lance with the pruned column list."""
    import ray.data

    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.sources import (
        images,
    )

    assert images.lance_available() is False  # sandbox has no lance wheel

    calls = {}

    def fake_read_lance(path, columns=None):
        calls["path"] = path
        calls["columns"] = columns
        return "LANCE_DS"

    monkeypatch.setattr(images, "lance_available", lambda: True)
    monkeypatch.setattr(ray.data, "read_lance", fake_read_lance)
    out = images.read_image_table("/tmp/imgs.lance", columns=["image_id"])
    assert out == "LANCE_DS"
    assert calls == {"path": "/tmp/imgs.lance", "columns": ["image_id"]}
