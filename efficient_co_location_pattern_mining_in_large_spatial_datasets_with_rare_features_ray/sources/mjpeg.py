"""Motion-JPEG (MJPEG) demuxer: a video stream stored as concatenated
JFIF frames — the classic IP-camera / AVI-MJPG payload layout and the
one video container expressible from public knowledge with the codecs
available here (the from-spec baseline JPEG codec, sources/jpeg.py).

Frame splitting is STRUCTURAL, not a byte-pair scan: each frame is
walked marker segment by marker segment (lengths from the headers, so a
stray ``FF D9`` inside a COM/APPn/table payload cannot end a frame
early), and the entropy-coded scan data is skipped by jumping between
``0xFF`` positions (vectorized, no per-byte Python) honoring the escape
rules of ITU-T T.81 §B.1.1.5: ``FF 00`` is a stuffed data byte and
``FF D0-D7`` a restart marker; any other ``FF xx`` ends the scan."""

from __future__ import annotations

import numpy as np


def _frame_end(data: bytes, ffpos: np.ndarray, start: int) -> int:
    """Byte offset one past the EOI of the frame starting at ``start``."""
    n = len(data)
    if data[start:start + 2] != b"\xff\xd8":
        raise ValueError(f"MJPEG: expected SOI at byte {start}")
    pos = start + 2
    while True:
        if pos + 2 > n:
            raise ValueError("MJPEG: truncated frame (stream ends mid-marker)")
        if data[pos] != 0xFF:
            raise ValueError(f"MJPEG: expected marker at byte {pos}")
        m = data[pos + 1]
        if m == 0xFF:  # fill byte, marker follows
            pos += 1
            continue
        pos += 2
        if m == 0xD9:  # EOI
            return pos
        if m == 0x01 or 0xD0 <= m <= 0xD7:  # standalone markers
            continue
        if pos + 2 > n:
            raise ValueError("MJPEG: truncated segment length")
        seglen = (data[pos] << 8) | data[pos + 1]
        if seglen < 2:
            raise ValueError("MJPEG: invalid segment length")
        pos += seglen
        if m == 0xDA:  # SOS: skip entropy data FF-position to FF-position
            i = int(np.searchsorted(ffpos, pos))
            while True:
                if i >= len(ffpos):
                    raise ValueError("MJPEG: unterminated entropy scan")
                p = int(ffpos[i])
                if p + 1 >= n:
                    raise ValueError("MJPEG: truncated entropy scan")
                nxt = data[p + 1]
                if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                    i += 1  # stuffed byte / restart marker: still in scan
                    continue
                pos = p  # a real marker (EOI, next SOS, DNL...) ends the scan
                break


def split_mjpeg(data: bytes) -> list[bytes]:
    """Split a concatenated-JFIF stream into its frames. Raises
    ValueError on garbage between frames, an unterminated final frame,
    or an empty stream."""
    if len(data) < 4:
        raise ValueError("not an MJPEG stream (too short)")
    b = np.frombuffer(data, dtype=np.uint8)
    ffpos = np.flatnonzero(b == 0xFF)
    frames: list[bytes] = []
    pos = 0
    while pos < len(data):
        end = _frame_end(data, ffpos, pos)
        frames.append(data[pos:end])
        pos = end
    if not frames:
        raise ValueError("MJPEG stream holds no frames")
    return frames
