"""Deduplication kernels: MinHash, SimHash, banding.

Batch-shaped, seed-fixed, process-stable (crc32/np, never Python's
salted hash()). The Dataset pipelines around them live in
``pipelines/dedup.py``.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np

from .text import char_shingles, char_shingles_str, md5_64

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


def mulmod_mersenne61(a: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Exact (a * x) mod (2^61 - 1) for uint64 operands < 2^61,
    vectorized without 128-bit ints: 32-bit limb split plus the Mersenne
    reductions 2^64 = 2^3 and m*2^32 = (m >> 29) + (m & (2^29-1)) << 32
    (all mod p). Matches arbitrary-precision HUGEINT math bit-for-bit --
    the property the DuckDB oracle relies on."""
    p = np.uint64(_MERSENNE)
    a = a.astype(np.uint64)
    x = x.astype(np.uint64)
    m32 = np.uint64(0xFFFFFFFF)
    a1, a0 = a >> np.uint64(32), a & m32
    x1, x0 = x >> np.uint64(32), x & m32
    hi = (a1 * x1) % p                      # coefficient of 2^64 == 2^3
    mid = (a1 * x0 + a0 * x1) % p           # coefficient of 2^32
    lo = (a0 * x0) % p
    t_hi = (hi << np.uint64(3)) % p
    t_mid = ((mid >> np.uint64(29)) + ((mid & np.uint64((1 << 29) - 1)) << np.uint64(32))) % p
    return (t_hi + t_mid + lo) % p


def hashed_shingles(text: str, k: int = 5) -> np.ndarray:
    """md5_64-hashed lowercased character k-shingles, reduced mod
    (2^61 - 1) -- identical to the DuckDB expression
    md5-hex-prefix :: UBIGINT % p over substr windows."""
    out = {md5_64(s) % _MERSENNE for s in char_shingles_str(text, k)}
    return np.fromiter(out, np.uint64, len(out)) if out else np.empty(0, np.uint64)


def minhash_signature(text: str, k: int = 5) -> np.ndarray:
    """128-perm MinHash over md5-hashed char-5-shingles; every operation
    is exact mod-(2^61-1) arithmetic so the signature (and the LSH
    banding built on it) is restatable in ANSI SQL. int64 signature;
    empty text -> all int64-max sentinel."""
    x = hashed_shingles(text, k)
    if not x.size:
        return np.full(MINHASH_PERMS, np.iinfo(np.int64).max, dtype=np.int64)
    # h_i(x) = (a_i * x + b_i) mod p, vectorized over shingles x perms
    v = mulmod_mersenne61(
        np.repeat(_A.astype(np.uint64), x.size),
        np.tile(x, MINHASH_PERMS),
    ).reshape(MINHASH_PERMS, x.size)
    v = (v + _B.astype(np.uint64)[:, None]) % np.uint64(_MERSENNE)
    return v.min(axis=1).astype(np.int64)


BAND_HASH_MUL = 1000003


def band_hashes(sig: np.ndarray, bands: int = MINHASH_BANDS) -> np.ndarray:
    """Hash each band of the signature to one stable int64 bucket key:
    ordered polynomial fold h = (h * 1000003 + v) mod (2^61 - 1) over
    the band's rows -- SQL-restatable via list_reduce (python-int fold:
    values < 2^63 so exact)."""
    rows = len(sig) // bands
    out = np.empty(bands, dtype=np.int64)
    for b in range(bands):
        h = 0
        for v in sig[b * rows : (b + 1) * rows].tolist():
            h = (h * BAND_HASH_MUL + v) % _MERSENNE
        out[b] = h
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
