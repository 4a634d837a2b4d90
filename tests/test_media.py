"""Audio (RIFF/WAVE PCM16) and video (MJPEG) path tests: from-spec codec
round-trips, malformed-stream errors, hand-computed features, and the
distributed actor-pool pipelines end-to-end."""

import struct

import numpy as np
import pandas as pd
import pytest
import ray.data

from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.sources.wav import (
    decode_wav,
    encode_wav,
)
from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.sources.mjpeg import (
    split_mjpeg,
)
from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.sources.image_codec import (
    decode,
    deterministic_pixels,
    encode_jpeg,
)


def test_wav_roundtrip_mono_and_stereo():
    rng = np.random.default_rng(5)
    mono = rng.integers(-30000, 30000, 777).astype(np.int16)
    s, rate = decode_wav(encode_wav(mono, 8000))
    assert rate == 8000 and s.shape == (777, 1)
    np.testing.assert_array_equal(s[:, 0], mono)

    stereo = rng.integers(-30000, 30000, (400, 2)).astype(np.int16)
    s2, rate2 = decode_wav(encode_wav(stereo, 44100))
    assert rate2 == 44100 and s2.shape == (400, 2)
    np.testing.assert_array_equal(s2, stereo)


def test_wav_skips_unknown_chunks_and_rejects_malformed():
    x = np.arange(-50, 50, dtype=np.int16)
    blob = encode_wav(x, 16000)
    # splice an unknown LIST chunk between fmt and data: still decodes
    fmt_end = blob.index(b"data")
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd size + pad
    spliced = blob[:fmt_end] + extra + blob[fmt_end:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    s, rate = decode_wav(spliced)
    np.testing.assert_array_equal(s[:, 0], x)

    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"nope")
    with pytest.raises(ValueError, match="overruns"):
        decode_wav(blob[:-3])  # truncated data chunk
    # non-PCM format code rejected loudly
    bad = bytearray(blob)
    off = blob.index(b"fmt ") + 8
    struct.pack_into("<H", bad, off, 3)  # IEEE float
    with pytest.raises(ValueError, match="unsupported"):
        decode_wav(bytes(bad))
    with pytest.raises(TypeError, match="int16"):
        encode_wav(x.astype(np.float64), 8000)


def test_wav_feature_math(ray_session):
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines.multimodal import (
        extract_audio_features,
    )
    import pyarrow as pa

    # square wave +-1000: rms exactly 1000, zc = n-1, peak 1000
    sq = (np.tile([1000, -1000], 50)).astype(np.int16)
    # constant 700: rms 700, zero crossings 0
    const = np.full(80, 700, np.int16)
    t = pa.table({
        "clip_id": pa.array(["sq", "const"], pa.string()),
        "bytes": pa.array(
            [encode_wav(sq, 8000), encode_wav(const, 8000)], pa.binary()),
    })
    out = (
        extract_audio_features(ray.data.from_arrow(t), concurrency=1)
        .to_pandas().set_index("clip_id")
    )
    assert out.loc["sq", "rms"] == 1000.0
    assert out.loc["sq", "zero_crossings"] == 99
    assert out.loc["sq", "peak"] == 1000
    assert out.loc["const", "rms"] == 700.0
    assert out.loc["const", "zero_crossings"] == 0
    assert out.loc["const", "duration_s"] == 80 / 8000
    assert out.loc["const", "n_samples"] == 80


def _frames(n, key="k"):
    return [
        encode_jpeg(deterministic_pixels(f"{key}{j}", 16, 16)) for j in range(n)
    ]


def test_mjpeg_split_exact_and_errors():
    frames = _frames(4)
    got = split_mjpeg(b"".join(frames))
    assert got == frames
    for f in got:
        px = decode(f, "jpeg")
        assert px.shape == (16, 16, 3)

    with pytest.raises(ValueError, match="SOI"):
        split_mjpeg(b"\x00\x01" + b"".join(frames))
    with pytest.raises(ValueError):
        split_mjpeg(b"".join(frames)[:-4])  # truncated final frame
    with pytest.raises(ValueError, match="short"):
        split_mjpeg(b"\xff\xd8")


def test_mjpeg_frame_sampling_pipeline(ray_session):
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines.multimodal import (
        mjpeg_frame_stats,
    )
    import pyarrow as pa

    t = pa.table({
        "clip_id": pa.array(["c5", "c3"], pa.string()),
        "bytes": pa.array(
            [b"".join(_frames(5, "a")), b"".join(_frames(3, "b"))],
            pa.binary()),
    })
    out = (
        mjpeg_frame_stats(ray.data.from_arrow(t), every_k=2, concurrency=1)
        .to_pandas().sort_values(["clip_id", "frame_idx"])
    )
    # every 2nd frame: 5 frames -> 0,2,4; 3 frames -> 0,2
    assert out[out["clip_id"] == "c5"]["frame_idx"].tolist() == [0, 2, 4]
    assert out[out["clip_id"] == "c3"]["frame_idx"].tolist() == [0, 2]
    assert (out[out["clip_id"] == "c5"]["n_frames"] == 5).all()
    assert (out["w"] == 16).all() and (out["h"] == 16).all()
    # stats come from the real decoded pixels
    first = out[(out["clip_id"] == "c5") & (out["frame_idx"] == 0)]
    px = decode(_frames(5, "a")[0], "jpeg")
    assert first["mean_gray"].iloc[0] == round(float(px.astype(np.float64).mean()), 6)
