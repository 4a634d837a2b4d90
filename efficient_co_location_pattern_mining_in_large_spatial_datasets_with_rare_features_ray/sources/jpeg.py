"""Pure-numpy baseline JPEG (JFIF) encoder/decoder.

A real ITU-T T.81 baseline-sequential codec written from the public
spec — replaces the round-1..3 ``FAKEJPG1`` stand-in so the north-rule
per-row invariant (decoded-pixel PSNR >= 40 dB for lossy formats) is
exercised against a genuine JPEG bitstream:

* encoder: RGB -> JFIF YCbCr (T.871), 4:4:4 sampling (one 8x8 block per
  component per MCU — valid baseline, highest fidelity), edge-replicated
  padding to 8-multiples, vectorized 8x8 DCT over all blocks at once
  (``tensordot``), Annex-K quantization tables scaled by the libjpeg
  quality formula, zigzag, DC DPCM + AC run-length, Annex-K canonical
  Huffman tables, byte-stuffed entropy segment, SOI/APP0/DQT/SOF0/DHT/
  SOS/EOI marker structure.
* decoder: marker parser (reads DQT/SOF0/DHT/SOS from the stream — it
  decodes any baseline 8-bit 3-component 4:4:4 JPEG, not just our own
  output), 16-bit-peek LUT Huffman decode (numpy lookup tables built
  once per table and cached), buffered bit reader with 0xFF00
  unstuffing, then vectorized dequant + inverse zigzag + IDCT per
  component and YCbCr -> RGB.

Entropy coding is per-coefficient Python by necessity (bit-serial
format), but the loop touches only nonzero coefficients; everything
before/after it is numpy over all blocks of the image at once.

No code here derives from /root/reference (the reference has no image
codec at all — images enter this engine via BASELINE.json's input_hint
schema); sources are the public T.81/T.871 specs.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------- tables

#: zigzag scan: ZIGZAG[k] = natural (row-major) index of zigzag position k
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
_UNZIGZAG = np.argsort(ZIGZAG)  # natural index -> zigzag position

#: Annex K.1 luminance quantization table (natural order)
Q_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)

#: Annex K.2 chrominance quantization table (natural order)
Q_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K.3 typical Huffman tables: (bits[1..16] code counts, symbol list)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# 8x8 DCT-II basis: D[u, x] = c(u)/2 * cos((2x+1) u pi / 16)
_x = np.arange(8)
_D = np.cos((2 * _x[None, :] + 1) * _x[:, None] * np.pi / 16.0) / 2.0
_D[0, :] *= 1.0 / np.sqrt(2.0)


def quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """Annex K tables scaled by the libjpeg quality formula (public)."""
    q = max(1, min(100, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for tbl in (Q_LUMA, Q_CHROMA):
        t = (tbl * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int64))
    return out[0], out[1]


# ---------------------------------------------------- canonical Huffman


def _canonical_codes(bits: list[int], vals: list[int]):
    """(code, length) per symbol value, per T.81 Annex C."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


_LUT_CACHE: dict[tuple, tuple[list, list]] = {}


def _decode_lut_lists(bits: tuple[int, ...], vals: tuple[int, ...]):
    """16-bit-peek lookup tables: for every 16-bit window, the decoded
    symbol and its code length. Built once per distinct table (numpy
    slice-fill), cached as plain Python lists — scalar list indexing is
    ~3x faster than numpy scalar indexing in the bit-serial loop."""
    key = (bits, vals)
    hit = _LUT_CACHE.get(key)
    if hit is not None:
        return hit
    sym = np.full(1 << 16, -1, dtype=np.int16)
    ln = np.zeros(1 << 16, dtype=np.int8)
    codes = _canonical_codes(list(bits), list(vals))
    for value, (code, length) in codes.items():
        lo = code << (16 - length)
        hi = lo + (1 << (16 - length))
        sym[lo:hi] = value
        ln[lo:hi] = length
    hit = (sym.tolist(), ln.tolist())
    _LUT_CACHE[key] = hit
    return hit


# ------------------------------------------------------------- bit I/O


class _BitWriter:
    """MSB-first bit accumulator with JPEG 0xFF byte stuffing."""

    __slots__ = ("out", "acc", "n")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.n -= 8
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits (F.1.2.3)
        return bytes(self.out)


# --------------------------------------------------------- color / DCT


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 RGB -> float64 YCbCr per JFIF (T.871)."""
    p = px.astype(np.float64)
    r, g, b = p[..., 0], p[..., 1], p[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) float, H/W multiples of 8 -> (n_blocks, 8, 8) raster order."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )


def _from_blocks(blocks: np.ndarray, h8: int, w8: int) -> np.ndarray:
    return (
        blocks.reshape(h8 // 8, w8 // 8, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(h8, w8)
    )


def _fdct(blocks: np.ndarray) -> np.ndarray:
    """Vectorized 2-D DCT-II over (n, 8, 8): D @ b @ D^T."""
    return _D @ blocks @ _D.T


def _idct(coefs: np.ndarray) -> np.ndarray:
    return _D.T @ coefs @ _D


# -------------------------------------------------------------- encoder


def _encode_block(
    w: _BitWriter,
    zz: np.ndarray,
    pred: int,
    dc_codes: dict,
    ac_codes: dict,
) -> int:
    """Entropy-code one zigzagged quantized block; returns its DC value."""
    dc = int(zz[0])
    diff = dc - pred
    s = abs(diff).bit_length()  # JPEG magnitude category
    code, ln = dc_codes[s]
    w.write(code, ln)
    if s:
        w.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    nz = (np.nonzero(zz[1:])[0] + 1).tolist()  # zigzag positions of ACs
    prev = 0
    for k in nz:
        run = k - prev - 1
        while run >= 16:
            code, ln = ac_codes[0xF0]  # ZRL
            w.write(code, ln)
            run -= 16
        v = int(zz[k])
        s = abs(v).bit_length()
        code, ln = ac_codes[(run << 4) | s]
        w.write(code, ln)
        w.write(v if v >= 0 else v + (1 << s) - 1, s)
        prev = k
    if not nz or nz[-1] != 63:
        code, ln = ac_codes[0x00]  # EOB
        w.write(code, ln)
    return dc


def _dht_segment(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
    payload = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + (len(payload) + 2).to_bytes(2, "big") + payload


def _dqt_segment(tq: int, table: np.ndarray) -> bytes:
    payload = bytes([tq]) + bytes(int(v) for v in table[ZIGZAG])
    return b"\xff\xdb" + (len(payload) + 2).to_bytes(2, "big") + payload


#: encoder-side constants built once at import: canonical code dicts and
#: the fixed DHT marker block (the four Annex-K tables never change)
_ENCODER_CODES = (
    _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS),
    _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS),
    _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS),
    _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS),
)
_DHT_BLOCK = (
    _dht_segment(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    + _dht_segment(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    + _dht_segment(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
    + _dht_segment(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
)
_HEADER_CACHE: dict[int, tuple[np.ndarray, np.ndarray, bytes]] = {}


def _quality_header(quality: int) -> tuple[np.ndarray, np.ndarray, bytes]:
    """(luma table, chroma table, DQT marker bytes) cached per quality."""
    hit = _HEADER_CACHE.get(quality)
    if hit is None:
        ql, qc = quality_tables(quality)
        hit = (ql, qc, _dqt_segment(0, ql) + _dqt_segment(1, qc))
        _HEADER_CACHE[quality] = hit
    return hit


def encode_jpeg(pixels: np.ndarray, quality: int = 98) -> bytes:
    """(h, w, 3) uint8 RGB -> baseline JFIF bytes (4:4:4)."""
    h, w, c = pixels.shape
    if c != 3 or pixels.dtype != np.uint8:
        # explicit raise (not assert): malformed input must fail loudly
        # even under `python -O`, never emit a corrupt bitstream
        raise ValueError(
            f"encode_jpeg needs (h, w, 3) uint8 RGB, got shape "
            f"{pixels.shape} dtype {pixels.dtype}"
        )
    ql, qc, dqt = _quality_header(quality)
    # pad to 8-multiples with edge replication (decoder crops via SOF dims)
    h8, w8 = (h + 7) & ~7, (w + 7) & ~7
    padded = np.pad(pixels, ((0, h8 - h), (0, w8 - w), (0, 0)), mode="edge")
    ycc = _rgb_to_ycbcr(padded) - 128.0

    zz_per_comp = []
    for ci in range(3):
        coefs = _fdct(_to_blocks(ycc[..., ci]))
        q = (ql if ci == 0 else qc).astype(np.float64).reshape(8, 8)
        quant = np.round(coefs / q).astype(np.int64)
        zz_per_comp.append(quant.reshape(-1, 64)[:, ZIGZAG])

    dc_l, ac_l, dc_c, ac_c = _ENCODER_CODES

    bw = _BitWriter()
    preds = [0, 0, 0]
    n_mcus = zz_per_comp[0].shape[0]
    for m in range(n_mcus):  # 4:4:4 -> MCU = one block per component
        preds[0] = _encode_block(bw, zz_per_comp[0][m], preds[0], dc_l, ac_l)
        preds[1] = _encode_block(bw, zz_per_comp[1][m], preds[1], dc_c, ac_c)
        preds[2] = _encode_block(bw, zz_per_comp[2][m], preds[2], dc_c, ac_c)
    scan = bw.flush()

    app0 = b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof = (
        b"\xff\xc0"
        + (8 + 3 * 3).to_bytes(2, "big")
        + bytes([8])
        + h.to_bytes(2, "big")
        + w.to_bytes(2, "big")
        + bytes([3])
        + bytes([1, 0x11, 0])  # Y:  id 1, 1x1 sampling, quant table 0
        + bytes([2, 0x11, 1])  # Cb: id 2, 1x1, quant table 1
        + bytes([3, 0x11, 1])  # Cr
    )
    sos = (
        b"\xff\xda"
        + (6 + 2 * 3).to_bytes(2, "big")
        + bytes([3])
        + bytes([1, 0x00])  # Y uses DC table 0 / AC table 0
        + bytes([2, 0x11])  # Cb uses DC 1 / AC 1
        + bytes([3, 0x11])
        + bytes([0, 63, 0])  # Ss, Se, Ah/Al (baseline full scan)
    )
    return (
        b"\xff\xd8" + app0 + dqt + sof + _DHT_BLOCK + sos + scan + b"\xff\xd9"
    )


# -------------------------------------------------------------- decoder

def _decode_scan(scan: bytes, comp_luts: list, n_mcus: int) -> list[np.ndarray]:
    """Fused entropy decode of a whole interleaved 4:4:4 scan: one
    function with local-integer bit state (no per-symbol method calls).
    Returns three (n_mcus, 64) int64 arrays of zigzag coefficients."""
    out = [[0] * (n_mcus * 64) for _ in range(3)]
    d = scan
    dn = len(d)
    acc = 0  # bit accumulator, top `nb` bits valid
    nb = 0
    ip = 0  # next byte index (reads past the end pad with 1-bits)
    preds = [0, 0, 0]
    for m in range(n_mcus):
        base = m * 64
        for ci in range(3):
            dsym, dln, asym, aln = comp_luts[ci]
            o = out[ci]
            while nb < 16:
                acc = (acc << 8) | (d[ip] if ip < dn else 0xFF)
                ip += 1
                nb += 8
            p = (acc >> (nb - 16)) & 0xFFFF
            s = dsym[p]
            if s < 0:
                raise ValueError("invalid DC Huffman code")
            nb -= dln[p]
            if s:
                while nb < s:
                    acc = (acc << 8) | (d[ip] if ip < dn else 0xFF)
                    ip += 1
                    nb += 8
                v = (acc >> (nb - s)) & ((1 << s) - 1)
                nb -= s
                if v < (1 << (s - 1)):
                    v -= (1 << s) - 1
            else:
                v = 0
            dc = preds[ci] + v
            preds[ci] = dc
            o[base] = dc
            acc &= (1 << nb) - 1
            k = 1
            while k < 64:
                while nb < 16:
                    acc = (acc << 8) | (d[ip] if ip < dn else 0xFF)
                    ip += 1
                    nb += 8
                p = (acc >> (nb - 16)) & 0xFFFF
                rs = asym[p]
                if rs < 0:
                    raise ValueError("invalid AC Huffman code")
                nb -= aln[p]
                if rs == 0x00:  # EOB
                    break
                if rs == 0xF0:  # ZRL
                    k += 16
                    acc &= (1 << nb) - 1
                    continue
                size = rs & 0x0F
                if size == 0:  # only EOB (0x00) / ZRL (0xF0) may carry 0
                    raise ValueError(f"invalid AC run/size symbol {rs:#04x}")
                k += rs >> 4
                if k > 63:
                    raise ValueError("AC run past end of block")
                while nb < size:
                    acc = (acc << 8) | (d[ip] if ip < dn else 0xFF)
                    ip += 1
                    nb += 8
                v = (acc >> (nb - size)) & ((1 << size) - 1)
                nb -= size
                if v < (1 << (size - 1)):
                    v -= (1 << size) - 1
                o[base + k] = v
                k += 1
                acc &= (1 << nb) - 1
            acc &= (1 << nb) - 1
    return [np.array(o, dtype=np.int64).reshape(n_mcus, 64) for o in out]


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> (h, w, 3) uint8 RGB. Supports 8-bit,
    3-component, 1x1-sampled (4:4:4) scans — what :func:`encode_jpeg`
    emits; rejects anything else loudly."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], tuple[tuple, tuple]] = {}
    h = w = None
    comp_q: list[int] = []
    comp_h: list[tuple[int, int]] = []
    scan = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        # spec-legal fill bytes: any number of 0xFF may pad before the
        # marker id (T.81 B.1.1.2)
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 1 >= len(data):
            raise ValueError("truncated JPEG (stream ends mid-marker)")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:
            continue  # TEM / RSTn / stray SOI: standalone, no length field
        (seglen,) = (int.from_bytes(data[pos : pos + 2], "big"),)
        payload = data[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(payload):
                pq, tq = payload[i] >> 4, payload[i] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                tbl = np.frombuffer(
                    payload[i + 1 : i + 65], dtype=np.uint8
                ).astype(np.int64)
                nat = np.empty(64, dtype=np.int64)
                nat[ZIGZAG] = tbl  # stored zigzag -> natural
                qtables[tq] = nat
                i += 65
        elif marker == 0xC0:  # SOF0 baseline
            if payload[0] != 8:
                raise NotImplementedError("only 8-bit precision")
            h = int.from_bytes(payload[1:3], "big")
            w = int.from_bytes(payload[3:5], "big")
            nc = payload[5]
            if nc != 3:
                raise NotImplementedError("only 3-component JPEG")
            for ci in range(nc):
                cid, samp, tq = payload[6 + 3 * ci : 9 + 3 * ci]
                if samp != 0x11:
                    raise NotImplementedError("only 4:4:4 sampling")
                comp_q.append(tq)
        elif marker in (0xC1, 0xC2, 0xC3):
            raise NotImplementedError("only baseline sequential (SOF0)")
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(payload):
                tc, th = payload[i] >> 4, payload[i] & 0x0F
                bits = tuple(payload[i + 1 : i + 17])
                n = sum(bits)
                vals = tuple(payload[i + 17 : i + 17 + n])
                htables[(tc, th)] = (bits, vals)
                i += 17 + n
        elif marker == 0xDD:  # DRI
            if int.from_bytes(payload, "big") != 0:
                raise NotImplementedError("restart intervals")
        elif marker == 0xDA:  # SOS
            ns = payload[0]
            for ci in range(ns):
                cid, tt = payload[1 + 2 * ci : 3 + 2 * ci]
                comp_h.append((tt >> 4, tt & 0x0F))
            # entropy segment runs to the next real marker (unstuff FF00)
            end = pos
            while end < len(data) - 1:
                if data[end] == 0xFF and data[end + 1] not in (0x00,):
                    break
                end += 1
            scan = data[pos:end].replace(b"\xff\x00", b"\xff")
            pos = end
        # APPn/COM and anything else: skipped via seglen
    if h is None or scan is None:
        raise ValueError("truncated JPEG (no SOF/SOS)")

    h8, w8 = (h + 7) & ~7, (w + 7) & ~7
    n_mcus = (h8 // 8) * (w8 // 8)
    comp_luts = [
        _decode_lut_lists(*htables[(0, comp_h[ci][0])])
        + _decode_lut_lists(*htables[(1, comp_h[ci][1])])
        for ci in range(3)
    ]
    zz = _decode_scan(scan, comp_luts, n_mcus)

    planes = []
    for ci in range(3):
        nat = zz[ci][:, _UNZIGZAG]  # zigzag order -> natural order
        q = qtables[comp_q[ci]].astype(np.float64)
        blocks = _idct((nat * q).reshape(-1, 8, 8))
        planes.append(_from_blocks(blocks, h8, w8)[:h, :w])
    ycc = np.stack(planes, axis=-1) + 128.0
    return _ycbcr_to_rgb(ycc)
