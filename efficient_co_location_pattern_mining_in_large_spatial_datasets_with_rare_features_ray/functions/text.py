"""Vectorized text-analysis kernels (language-ID, quality, tokens,
fingerprints).

Every function is batch-shaped (pandas Series / numpy in, numpy out) so
it can run inside ``map_batches`` without per-row Python in the hot
path. The quality/token metrics are specified to be *exactly*
reproducible in ANSI SQL (the DuckDB oracle re-states the same
formulas); langid and fingerprinting are heuristic/iterative and are
covered by unit tests instead.
"""

from __future__ import annotations

import hashlib
import re
import zlib

import numpy as np
import pandas as pd

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "on", "for", "with")
PUNCT_CLASS = r"[.,!?;:]"
BPE_TOKEN_RE = r"[\w]+|[^\w\s]"

_WS = re.compile(r"\s+")
_PUNCT = re.compile(PUNCT_CLASS)
_BPE = re.compile(BPE_TOKEN_RE)

# tiny per-language stopword profiles for the heuristic language id
_LANG_PROFILES: dict[str, frozenset[str]] = {
    "en": frozenset("the and of to in is that it for on with as was at by".split()),
    "es": frozenset("el la de que y en un ser se no por con para como su".split()),
    "de": frozenset("der die und in den von zu das mit sich des auf ist".split()),
    "fr": frozenset("le la de et les des en un du une que est pour qui".split()),
}


def quality_metrics(texts: pd.Series) -> pd.DataFrame:
    """n_chars / n_words / avg_word_len / punct_ratio / stop_ratio /
    quality_score -- all SQL-reproducible (see queries.py SQL)."""
    n_chars = texts.str.len().to_numpy(np.int64)
    words = texts.str.split()
    n_words = words.str.len().to_numpy(np.int64)
    nospace = texts.str.replace(_WS, "", regex=True).str.len().to_numpy(np.int64)
    punct = texts.str.count(_PUNCT).to_numpy(np.int64)
    # vectorized stopword count: explode the token lists once and test
    # membership in C (same exact semantics as the former per-row loop:
    # whitespace tokens, lowercased, exact match)
    ex = words.reset_index(drop=True).explode()
    stops = (
        ex.str.lower()
        .isin(STOPWORDS)
        .groupby(level=0)
        .sum()
        .reindex(range(len(texts)), fill_value=0)
        .to_numpy(np.int64)
    )
    nw = np.maximum(n_words, 1).astype(np.float64)
    avg_word_len = np.round(nospace / nw, 6)
    punct_ratio = np.round(punct / np.maximum(n_chars, 1), 6)
    stop_ratio = np.round(stops / nw, 6)
    score = 1.0 / (
        1.0
        + np.exp(
            -(
                0.02 * n_words
                + 5.0 * stop_ratio
                - 10.0 * punct_ratio
                - 0.2 * np.abs(avg_word_len - 5.0)
            )
        )
    )
    return pd.DataFrame(
        {
            "n_chars": n_chars,
            "n_words": n_words,
            "avg_word_len": avg_word_len,
            "punct_ratio": punct_ratio,
            "stop_ratio": stop_ratio,
            "quality_score": np.round(score, 6),
        }
    )


def token_counts(texts: pd.Series) -> pd.DataFrame:
    """Whitespace token count + BPE-ish regex token count."""
    return pd.DataFrame(
        {
            "n_tokens_ws": texts.str.split().str.len().to_numpy(np.int64),
            "n_tokens_bpe": texts.str.findall(_BPE).str.len().to_numpy(np.int64),
        }
    )


def lang_id(texts: pd.Series) -> np.ndarray:
    """Heuristic language id: argmax of per-language stopword hit counts
    with deterministic tiebreak (profile order), 'und' when no profile
    scores. A real model would slot into the same actor stage."""
    n = len(texts)
    toks = texts.str.lower().str.split()
    lens = toks.str.len().fillna(0).to_numpy(np.int64)
    langs = list(_LANG_PROFILES)
    scores = np.zeros((n, len(langs)), np.int64)
    if lens.sum() > 0:
        nz = lens > 0
        flat = pd.Series(np.concatenate(toks.to_numpy()[nz]))
        doc_of = np.repeat(np.flatnonzero(nz), lens[nz])
        # one vectorized isin + bincount per profile (4 profiles), not a
        # Python loop per row: counts OCCURRENCES, same as the original
        for j, lang in enumerate(langs):
            hit = flat.isin(_LANG_PROFILES[lang]).to_numpy()
            scores[:, j] = np.bincount(doc_of[hit], minlength=n)
    # argmax takes the FIRST max -> profile-order tie-break, 'und' when
    # no profile scores (both exactly the original per-row semantics)
    best = np.argmax(scores, axis=1)
    out = np.array(langs, dtype=object)[best]
    out[scores.max(axis=1) == 0] = "und"
    return out


def md5_64(token: str) -> int:
    """First 8 bytes of md5, big-endian unsigned -- the one 64-bit token
    hash both this engine and the DuckDB oracle can compute
    (``CAST(concat('0x', substr(md5(t),1,16)) AS UBIGINT)``)."""
    return int.from_bytes(hashlib.md5(token.encode("utf-8")).digest()[:8], "big")


FINGERPRINT_MOD = (1 << 61) - 1
FINGERPRINT_MUL = 1000003


def fingerprint(texts: pd.Series) -> np.ndarray:
    """Order-sensitive rolling document hash over whitespace tokens:
    h = (h * 1000003 + md5_64(token)) mod (2^61 - 1). Deterministic
    across processes (unlike Python's salted hash()) and exactly
    restatable in SQL via list_reduce (queries.py SQL_FINGERPRINTS)."""
    out = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        h = 0
        for tok in t.split():
            h = (h * FINGERPRINT_MUL + md5_64(tok)) % FINGERPRINT_MOD
        out[i] = h
    return out


def char_shingles(text: str, k: int = 5) -> set[int]:
    """crc32-hashed character k-shingles (lowercased)."""
    s = text.lower()
    if len(s) < k:
        return {zlib.crc32(s.encode("utf-8"))} if s else set()
    enc = s.encode("utf-8")
    # byte-shingles of the utf-8 encoding (ascii corpus: == char shingles)
    return {zlib.crc32(enc[i : i + k]) for i in range(len(enc) - k + 1)}


def char_shingles_str(text: str, k: int = 3) -> set[str]:
    """UNhashed character k-shingles (lowercased) -- collision-free, and
    identical to DuckDB ``substr`` windows, so exact-Jaccard pipelines
    built on these are SQL-oracle-able. A text shorter than k yields the
    whole text as its single shingle; empty text yields the empty set."""
    s = text.lower()
    if len(s) < k:
        return {s} if s else set()
    return {s[i : i + k] for i in range(len(s) - k + 1)}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    u = len(a | b)
    return len(a & b) / u if u else 0.0
