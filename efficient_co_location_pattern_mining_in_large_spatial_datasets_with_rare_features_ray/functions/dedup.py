"""Deduplication kernels: MinHash, SimHash, banding.

Batch-shaped, seed-fixed, process-stable (crc32/np, never Python's
salted hash()). The Dataset pipelines around them live in
``pipelines/dedup.py``.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np

from .text import char_shingles, md5_64

MINHASH_PERMS = 128
# 16 bands x 8 rows: the LSH S-curve threshold (1/b)^(1/r) = 0.707 sits ON
# the default verify threshold 0.7, so candidate volume stays ~ true-positive
# volume even in corpora with high baseline similarity (32x4 put the knee at
# 0.42 and drowned the verifier in candidates). Recall: ~0.9999 at j=0.9,
# ~0.8 at j=0.75.
MINHASH_BANDS = 16
_MERSENNE = (1 << 61) - 1


def _perm_params(n: int = MINHASH_PERMS, seed: int = 1234567):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=n, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, size=n, dtype=np.int64)
    return a, b


_A, _B = _perm_params()


def minhash_signature(text: str, k: int = 5) -> np.ndarray:
    """128-perm MinHash over crc32 char-5-shingles. uint64 signature."""
    sh = char_shingles(text, k)
    if not sh:
        return np.full(MINHASH_PERMS, np.iinfo(np.int64).max, dtype=np.int64)
    x = np.fromiter(sh, dtype=np.int64, count=len(sh))
    # h_i(x) = (a_i * x + b_i) mod p, vectorized over shingles x perms
    v = (x[None, :] * _A[:, None] + _B[:, None]) % _MERSENNE
    return v.min(axis=1)


def band_hashes(sig: np.ndarray, bands: int = MINHASH_BANDS) -> np.ndarray:
    """Hash each band of the signature to one stable int64 bucket key."""
    rows = len(sig) // bands
    out = np.empty(bands, dtype=np.int64)
    for b in range(bands):
        chunk = sig[b * rows : (b + 1) * rows].tobytes()
        out[b] = int.from_bytes(
            hashlib.blake2b(chunk, digest_size=8).digest(), "big", signed=True
        )
    return out


def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens, majority vote per bit.
    Token hash = first 8 bytes of md5 (functions/text.md5_64) so the
    whole signature is exactly restatable in the DuckDB oracle
    (queries.py SQL_SIMHASH). Returns signed int64."""
    acc = np.zeros(64, dtype=np.int64)
    for tok in text.lower().split():
        h = md5_64(tok)
        bits = (np.uint64(h) >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits == 1, 1, -1)
    val = 0
    for i in range(64):
        if acc[i] > 0:
            val |= 1 << i
    return val - (1 << 64) if val >= (1 << 63) else val


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def content_hash(text: str) -> str:
    return hashlib.sha256(text.encode("utf-8")).hexdigest()


def crc_bucket(text: str, n_buckets: int) -> int:
    return zlib.crc32(text.encode("utf-8")) % n_buckets
