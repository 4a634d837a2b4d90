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


def _concat_aranges(counts: np.ndarray) -> np.ndarray:
    """concatenate([arange(c) for c in counts]) without a Python loop."""
    counts = np.asarray(counts, np.int64)
    total = int(counts.sum())
    if not total:
        return np.empty(0, np.int64)
    ends = np.cumsum(counts)
    out = np.arange(total, dtype=np.int64)
    return out - np.repeat(ends - counts, counts)


def hashed_shingles_batch(
    texts, k: int = 5
) -> tuple[np.ndarray, np.ndarray]:
    """Batched ``hashed_shingles``: per-doc sorted distinct md5-mod-p
    shingle values for a whole batch at once. Returns ``(vals, offsets)``
    with doc i's values at ``vals[offsets[i]:offsets[i+1]]`` --
    value-identical to ``np.sort(hashed_shingles(texts[i], k))``.

    This removes the round-3 hot path (one Python hashlib call per
    (doc, shingle) INCIDENCE): char windows are extracted as numpy
    strides over the utf-32 codepoints, deduped across the batch, md5'd
    once per DISTINCT shingle, and gathered back. SQL-oracle parity is
    untouched because the per-shingle hash value is bit-identical."""
    n = len(texts)
    lows = [str(t).lower() for t in texts]
    doc_parts: list[np.ndarray] = []
    val_parts: list[np.ndarray] = []

    long_ids = [i for i, s in enumerate(lows) if len(s) >= k]
    if long_ids:
        lens = np.asarray([len(lows[i]) for i in long_ids], np.int64)
        offs = np.concatenate([[0], np.cumsum(lens)])
        big = np.frombuffer(
            "".join(lows[i] for i in long_ids).encode("utf-32-le"),
            np.uint32,
        )
        wc = lens - k + 1
        starts = np.repeat(offs[:-1], wc) + _concat_aranges(wc)
        win = np.lib.stride_tricks.sliding_window_view(big, k)[starts]
        voids = (
            np.ascontiguousarray(win).view(np.dtype((np.void, 4 * k))).ravel()
        )
        uniq, inv = np.unique(voids, return_inverse=True)
        uh = np.fromiter(
            (
                md5_64(v.tobytes().decode("utf-32-le")) % _MERSENNE
                for v in uniq
            ),
            np.uint64,
            len(uniq),
        )
        doc_parts.append(np.repeat(np.asarray(long_ids, np.int64), wc))
        val_parts.append(uh[inv])
    shorts = [(i, lows[i]) for i in range(n) if 0 < len(lows[i]) < k]
    if shorts:
        sv: dict[str, int] = {}
        for _, s in shorts:
            if s not in sv:
                sv[s] = md5_64(s) % _MERSENNE
        doc_parts.append(np.asarray([i for i, _ in shorts], np.int64))
        val_parts.append(np.asarray([sv[s] for _, s in shorts], np.uint64))
    offsets = np.zeros(n + 1, np.int64)
    if not doc_parts:
        return np.empty(0, np.uint64), offsets
    docs = np.concatenate(doc_parts)
    vals = np.concatenate(val_parts)
    order = np.lexsort((vals, docs))
    docs, vals = docs[order], vals[order]
    # per-doc value dedupe (set semantics; also collapses rare mod-p ties)
    keep = np.ones(len(docs), bool)
    keep[1:] = (docs[1:] != docs[:-1]) | (vals[1:] != vals[:-1])
    docs, vals = docs[keep], vals[keep]
    offsets[1:] = np.cumsum(np.bincount(docs, minlength=n))
    return vals, offsets


def minhash_signatures_batch(texts, k: int = 5) -> np.ndarray:
    """(n_docs, MINHASH_PERMS) int64 -- value-identical to
    ``minhash_signature(text)`` per row. The permutation values are
    computed once per DISTINCT shingle hash in the batch, then
    min-reduced per doc with one chunked ``minimum.reduceat`` (no
    per-doc Python, no per-incidence hashing)."""
    n = len(texts)
    vals, offsets = hashed_shingles_batch(texts, k)
    out = np.full((n, MINHASH_PERMS), np.iinfo(np.int64).max, np.int64)
    if not len(vals):
        return out
    dv = np.unique(vals)
    nd = len(dv)
    hv = mulmod_mersenne61(
        np.repeat(_A.astype(np.uint64), nd), np.tile(dv, MINHASH_PERMS)
    ).reshape(MINHASH_PERMS, nd)
    hv = (hv + _B.astype(np.uint64)[:, None]) % np.uint64(_MERSENNE)
    codes = np.searchsorted(dv, vals)
    counts = np.diff(offsets)
    nz = np.flatnonzero(counts)  # docs with >= 1 shingle
    csum = np.concatenate([[0], np.cumsum(counts[nz])])
    CHUNK = 65536  # incidences per gather: PERMS x CHUNK x 8B = 64 MB
    i = 0
    while i < len(nz):
        j = i + 1
        while j < len(nz) and csum[j + 1] - csum[i] <= CHUNK:
            j += 1
        sel = nz[i:j]
        lo, hi = int(offsets[sel[0]]), int(offsets[sel[-1] + 1])
        g = hv[:, codes[lo:hi]]
        starts = (offsets[sel] - lo).astype(np.int64)
        out[sel] = (
            np.minimum.reduceat(g, starts, axis=1).T.astype(np.int64)
        )
        i = j
    return out


def band_hashes_batch(
    sigs: np.ndarray, bands: int = MINHASH_BANDS
) -> np.ndarray:
    """(n_docs, bands) int64 -- vectorized Horner fold over each band's
    rows, identical to ``band_hashes(sig)`` per row."""
    n, perms = sigs.shape
    rows = perms // bands
    v = sigs.reshape(n * bands, rows).astype(np.uint64)
    p = np.uint64(_MERSENNE)
    mul = np.uint64(BAND_HASH_MUL)
    h = np.zeros(n * bands, np.uint64)
    for r in range(rows):
        # (h*MUL % p + v) % p == (h*MUL + v) % p since v's contribution
        # is taken mod p in the same step; sum < 2^61 + 2^63 < 2^64
        h = (mulmod_mersenne61(h, mul) + v[:, r]) % p
    return h.astype(np.int64).reshape(n, bands)


def simhash64_batch(texts) -> np.ndarray:
    """(n_docs,) int64 -- value-identical to ``simhash64(text)`` per
    row. md5 runs once per DISTINCT token in the batch; the per-bit
    majority vote is one chunked ``add.reduceat`` over token incidences
    (multiplicity preserved, matching the scalar loop)."""
    n = len(texts)
    toks: list[str] = []
    counts = np.zeros(n, np.int64)
    for i, t in enumerate(texts):
        ts = str(t).lower().split()
        counts[i] = len(ts)
        toks.extend(ts)
    out = np.zeros(n, np.int64)
    if not toks:
        return out
    import pandas as pd

    codes, uniques = pd.factorize(np.asarray(toks, object), sort=False)
    uh = np.fromiter((md5_64(u) for u in uniques), np.uint64, len(uniques))
    bits = (
        (uh[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
        & np.uint64(1)
    ).astype(np.int8)
    contrib = (2 * bits - 1).astype(np.int32)  # +1 / -1 per bit
    offsets = np.concatenate([[0], np.cumsum(counts)])
    nz = np.flatnonzero(counts)
    csum = np.concatenate([[0], np.cumsum(counts[nz])])
    shifts = np.arange(64, dtype=np.uint64)
    CHUNK = 262144  # incidences per gather: CHUNK x 64 x 4B = 64 MB
    i = 0
    while i < len(nz):
        j = i + 1
        while j < len(nz) and csum[j + 1] - csum[i] <= CHUNK:
            j += 1
        sel = nz[i:j]
        lo, hi = int(offsets[sel[0]]), int(offsets[sel[-1] + 1])
        g = contrib[codes[lo:hi]]
        starts = (offsets[sel] - lo).astype(np.int64)
        acc = np.add.reduceat(g.astype(np.int64), starts, axis=0)
        vals = ((acc > 0).astype(np.uint64) << shifts[None, :]).sum(
            axis=1, dtype=np.uint64
        )
        out[sel] = vals.view(np.int64)
        i = j
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
