"""Minimal self-contained image codecs for the Lance-schema fixture.

The sandbox has no PIL/libjpeg, so both codecs are pure-numpy
implementations of the public specs:

* ``png``  -- a real, spec-compliant PNG encoder/decoder (8-bit RGB,
  filter type 0, zlib) written against the public PNG spec. Lossless:
  the per-row invariant is byte-exact pixel equality.
* ``jpeg`` -- a real baseline JFIF codec (:mod:`.jpeg` — ITU T.81
  baseline sequential, 4:4:4, Annex-K tables, default quality 98 ->
  PSNR ~43 dB on the fixture content), replacing rounds 1-3's
  ``FAKEJPG1`` stand-in so the PSNR >= 40 dB invariant path
  (BASELINE.json input_hint) runs against a genuine JPEG bitstream.
  ``decode_jpeg`` still sniffs and decodes legacy ``FAKEJPG1`` blobs so
  fixture directories written by earlier rounds remain readable.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from . import jpeg as _jfif

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_FAKEJPG_MAGIC = b"FAKEJPG1"
_JPEG_QUANT = 4  # legacy stub quant step (decode-only support kept)
JPEG_QUALITY = 98  # min PSNR ~42.5 dB on fixture content: margin over 40


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> PNG bytes (color type 2, bit depth 8, filter 0)."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), pixels.reshape(h, w * 3)], axis=1
    ).tobytes()
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, 3) uint8. Supports what encode_png emits
    (8-bit RGB, filter 0 per scanline); rejects anything else loudly."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    idat = b""
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack(">I", data[pos + 8 + ln : pos + 12 + ln])
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if (depth, ctype, interlace) != (8, 2, 0):
                raise NotImplementedError("only 8-bit RGB non-interlaced")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    rows = raw.reshape(h, 1 + w * 3)
    if not (rows[:, 0] == 0).all():
        raise NotImplementedError("only filter type 0")
    return rows[:, 1:].reshape(h, w, 3).copy()


def encode_jpeg(pixels: np.ndarray, quality: int = JPEG_QUALITY) -> bytes:
    """Real baseline JFIF encode (see :mod:`.jpeg`). Deterministic."""
    return _jfif.encode_jpeg(pixels, quality=quality)


def decode_jpeg(data: bytes) -> np.ndarray:
    if data[:2] == b"\xff\xd8":
        return _jfif.decode_jpeg(data)
    if data[:8] == _FAKEJPG_MAGIC:  # legacy round-1..3 stub blobs
        w, h = struct.unpack(">II", data[8:16])
        q = np.frombuffer(zlib.decompress(data[16:]), dtype=np.uint8)
        px = q.astype(np.int32) * _JPEG_QUANT + _JPEG_QUANT // 2
        return np.clip(px, 0, 255).astype(np.uint8).reshape(h, w, 3)
    raise ValueError("not a JPEG (no SOI marker or legacy magic)")


def decode(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return decode_png(data)
    if fmt == "jpeg":
        return decode_jpeg(data)
    raise NotImplementedError(
        f"decode for fmt={fmt!r} requires an external codec (stubbed; "
        "see module docstring)"
    )


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


def deterministic_pixels(image_id: str, w: int, h: int) -> np.ndarray:
    """Seeded per-id pixel content (crc32-keyed PCG64): the generator the
    invariant check regenerates against."""
    seed = zlib.crc32(image_id.encode("utf-8"))
    rng = np.random.default_rng(seed)
    # smooth-ish gradient + noise so quantization loss is realistic
    gx = np.linspace(0, 255, w, dtype=np.float64)[None, :, None]
    gy = np.linspace(0, 255, h, dtype=np.float64)[:, None, None]
    base = (gx + gy) / 2.0
    noise = rng.uniform(-40, 40, size=(h, w, 3))
    return np.clip(base + noise, 0, 255).astype(np.uint8)
