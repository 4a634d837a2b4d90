"""Baseline JFIF codec (sources/jpeg.py): bitstream structure, round
trips across shapes/qualities, spec-table sanity, legacy-blob fallback.

No Ray needed — pure codec tests.
"""

import numpy as np
import pytest

from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.sources import (
    jpeg as J,
)
from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.sources.image_codec import (
    decode,
    decode_jpeg,
    deterministic_pixels,
    psnr,
)


def test_dct_is_orthonormal():
    rng = np.random.default_rng(7)
    b = rng.uniform(-128, 127, (6, 8, 8))
    assert np.abs(J._idct(J._fdct(b)) - b).max() < 1e-9
    # Parseval: energy preserved
    f = J._fdct(b)
    assert np.allclose((b**2).sum(), (f**2).sum())


def test_constant_image_roundtrips_near_exact():
    # a flat block is DC-only: quality-98 DC quant step is 1 -> lossless
    px = np.full((24, 16, 3), 97, np.uint8)
    out = J.decode_jpeg(J.encode_jpeg(px))
    assert out.shape == px.shape
    assert psnr(out, px) == float("inf")


@pytest.mark.parametrize("h,w", [(8, 8), (16, 16), (11, 13), (64, 48), (1, 33), (9, 8)])
def test_roundtrip_psnr_all_shapes(h, w):
    px = deterministic_pixels(f"T{h}x{w}", w, h)
    out = J.decode_jpeg(J.encode_jpeg(px))
    assert out.shape == (h, w, 3)
    assert psnr(out, px) >= 40.0


def test_quality_monotone():
    px = deterministic_pixels("QM", 16, 16)
    dbs = [
        psnr(J.decode_jpeg(J.encode_jpeg(px, quality=q)), px)
        for q in (75, 90, 98)
    ]
    assert dbs[0] < dbs[1] < dbs[2]


def test_marker_structure_and_dht_emitted():
    data = J.encode_jpeg(deterministic_pixels("MK", 8, 8))
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    # all four Huffman tables and both quant tables are in the stream,
    # so any spec-compliant external decoder can decode it
    assert data.count(b"\xff\xc4") >= 4
    assert data.count(b"\xff\xdb") >= 2
    assert b"JFIF\x00" in data and b"\xff\xc0" in data and b"\xff\xda" in data


def test_encode_deterministic():
    px = deterministic_pixels("DET", 16, 16)
    assert J.encode_jpeg(px) == J.encode_jpeg(px)


def test_annex_k_tables_shape():
    # canonical-code construction must consume every symbol exactly once
    for bits, vals in [
        (J.DC_LUMA_BITS, J.DC_LUMA_VALS),
        (J.DC_CHROMA_BITS, J.DC_CHROMA_VALS),
        (J.AC_LUMA_BITS, J.AC_LUMA_VALS),
        (J.AC_CHROMA_BITS, J.AC_CHROMA_VALS),
    ]:
        assert sum(bits) == len(vals)
        codes = J._canonical_codes(bits, vals)
        assert len(codes) == len(vals)
        # prefix-free: no code is a prefix of another
        as_strings = [
            format(c, f"0{ln}b") for c, ln in codes.values()
        ]
        for a in as_strings:
            assert sum(1 for b in as_strings if b.startswith(a)) == 1
    assert sorted(J.ZIGZAG.tolist()) == list(range(64))


def test_truncated_and_garbage_rejected():
    data = J.encode_jpeg(deterministic_pixels("TR", 8, 8))
    with pytest.raises(ValueError):
        J.decode_jpeg(b"not a jpeg")
    with pytest.raises(Exception):
        J.decode_jpeg(data[:20])  # header only, no SOF/SOS
    # stream ending in a bare 0xFF must raise ValueError (not IndexError)
    with pytest.raises(ValueError, match="truncated"):
        J.decode_jpeg(b"\xff\xd8\xff")
    with pytest.raises(ValueError, match="truncated"):
        J.decode_jpeg(b"\xff\xd8\xff\xff\xff")  # fill bytes then EOF


def test_encode_rejects_malformed_input_loudly():
    # explicit ValueError (not assert) even under python -O
    with pytest.raises(ValueError, match="uint8"):
        J.encode_jpeg(np.zeros((8, 8, 3), np.float64))
    with pytest.raises((ValueError, Exception)):
        J.encode_jpeg(np.zeros((8, 8, 4), np.uint8))


def test_legacy_fakejpg_blobs_still_decode():
    # fixture dirs written by earlier rounds hold FAKEJPG1 payloads;
    # decode_jpeg sniffs the magic and falls back
    import struct
    import zlib

    px = deterministic_pixels("LG", 8, 8)
    q = (px.astype(np.int32) // 4).astype(np.uint8)
    legacy = b"FAKEJPG1" + struct.pack(">II", 8, 8) + zlib.compress(q.tobytes(), 6)
    out = decode_jpeg(legacy)
    assert out.shape == (8, 8, 3)
    assert psnr(out, px) >= 40.0
    assert decode(legacy, "jpeg").shape == (8, 8, 3)


def test_zrl_and_eob_paths():
    # sparse high-frequency content exercises ZRL (16-zero runs) and EOB
    px = np.zeros((8, 8, 3), np.uint8)
    px[7, 7] = 255  # single hot pixel -> long zero runs in zigzag
    out = J.decode_jpeg(J.encode_jpeg(px, quality=50))
    assert out.shape == (8, 8, 3)


def test_fill_bytes_and_rst_markers_tolerated():
    # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
    px = deterministic_pixels("FB", 8, 8)
    data = J.encode_jpeg(px)
    sof = data.index(b"\xff\xc0")
    padded = data[:sof] + b"\xff\xff" + data[sof:]
    assert psnr(J.decode_jpeg(padded), px) >= 40.0


def test_invalid_ac_symbol_message():
    # guard in the scan loop: a run/size symbol with size 0 that is not
    # EOB/ZRL must raise a decode error, not a negative-shift crash
    luts = (
        [0x30] * (1 << 16),  # dsym: always "size 0, run 3" -> invalid
        [2] * (1 << 16),
        [0x30] * (1 << 16),
        [2] * (1 << 16),
    )
    with pytest.raises(ValueError):
        J._decode_scan(b"\x00" * 8, [luts, luts, luts], 1)
