"""Pure-numpy RIFF/WAVE PCM codec, written from the public format spec
(Microsoft/IBM RIFF 1991; the canonical WAVEFORMAT layout used by every
`.wav` file): "RIFF" + size + "WAVE", then a chunk stream containing at
least a ``fmt `` chunk (PCM layout: audio_format=1, channels,
sample_rate, byte_rate, block_align, bits_per_sample) and a ``data``
chunk of little-endian interleaved samples. This gives the engine a REAL
audio path in a container with no audio libraries — same rationale as
the from-spec PNG/JPEG codecs (sources/image_codec.py, sources/jpeg.py).

Scope (honestly bounded, mirrors the JPEG codec's capability guards):
16-bit PCM only — the dominant uncompressed interchange format; other
encodings (float32, ADPCM, mu-law) raise a clear ValueError rather than
mis-decoding. Unknown chunks (LIST/INFO/fact/cue) are skipped per spec
(chunks are word-aligned: odd sizes carry one pad byte)."""

from __future__ import annotations

import struct

import numpy as np

_FMT_PCM = 1


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode int16 samples — shape ``(n,)`` mono or ``(n, channels)``
    interleaved — as a minimal canonical RIFF/WAVE PCM stream."""
    s = np.asarray(samples)
    if s.dtype != np.int16:
        raise TypeError(f"encode_wav wants int16 samples, got {s.dtype}")
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2:
        raise ValueError(f"samples must be (n,) or (n, channels), got {s.shape}")
    n, ch = s.shape
    data = s.astype("<i2").tobytes()  # interleaved little-endian
    block_align = ch * 2
    fmt = struct.pack(
        "<HHIIHH", _FMT_PCM, ch, sample_rate,
        sample_rate * block_align, block_align, 16,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a RIFF/WAVE PCM16 stream. Returns ``(samples, rate)`` with
    samples shaped ``(n, channels)`` int16. Walks the chunk stream
    (skipping unknown chunks, honoring odd-size pad bytes) and raises
    ValueError on truncation, a missing fmt/data chunk, or a non-PCM16
    encoding."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    fmt = None
    raw = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        pos += 8
        if pos + size > len(data):
            raise ValueError(f"truncated WAV: chunk {cid!r} overruns stream")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("truncated WAV fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", data, pos)
        elif cid == b"data":
            raw = data[pos:pos + size]
        pos += size + (size & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise ValueError("WAV stream missing fmt or data chunk")
    audio_format, ch, rate, _byte_rate, _block_align, bits = fmt
    if audio_format != _FMT_PCM or bits != 16:
        raise ValueError(
            f"unsupported WAV encoding (format={audio_format}, bits={bits}); "
            "this codec implements 16-bit PCM"
        )
    if ch < 1:
        raise ValueError("WAV fmt chunk declares zero channels")
    if len(raw) % (2 * ch):
        raise ValueError("WAV data chunk is not a whole number of frames")
    s = np.frombuffer(raw, dtype="<i2").reshape(-1, ch)
    return s.astype(np.int16, copy=False), int(rate)
