"""Pure-Python/NumPy serial oracle -- the conformance gate.

Reimplements the complete serial reference pipeline
(src/main.cpp:31-122: load -> grid distance join -> counts -> ordered
stars -> NR-tree -> level loop -> report) in ~150 lines on top of
``mining_core``, with every reference quirk preserved (inclusive
distance src/spatial_index.cpp:83, cross-type-only pairs, ordered
direction ties src/neighborhood_mgr.cpp:28, Lemma-3 IEEE behavior,
epsilon weight branch src/miner.cpp:401-408). Tests assert the Ray Data
engine's outputs equal this oracle's exactly.
"""

from __future__ import annotations

import numpy as np

from .canonical import FeatureContext
from .mining_core import mine_local


def brute_force_pairs(
    ids: np.ndarray, feats: np.ndarray, x: np.ndarray, y: np.ndarray, d: float
) -> set[tuple[str, str]]:
    """All unordered cross-type pairs with euclidean distance <= d
    (inclusive, src/spatial_index.cpp:83). O(n^2); fixtures only.
    Returned as a set of (id_a, id_b) with id_a < id_b lexicographically."""
    n = len(ids)
    d2 = float(d) * float(d)
    out: set[tuple[str, str]] = set()
    xx = x.astype(np.float64)
    yy = y.astype(np.float64)
    for i in range(n):
        dx = xx[i + 1 :] - xx[i]
        dy = yy[i + 1 :] - yy[i]
        close = (dx * dx + dy * dy) <= d2
        for j in np.nonzero(close)[0]:
            jj = i + 1 + j
            if feats[i] != feats[jj]:
                a, b = str(ids[i]), str(ids[jj])
                out.add((a, b) if a < b else (b, a))
    return out


def cell_assign(
    x: np.ndarray, y: np.ndarray, d: float, origin: tuple[float, float]
) -> tuple[np.ndarray, np.ndarray]:
    """Grid cell ids, cell size = d, floor((p - origin)/d)
    (src/spatial_index.cpp:63-72 without its out-of-bounds edge bug)."""
    cx = np.floor((np.asarray(x, np.float64) - origin[0]) / d).astype(np.int64)
    cy = np.floor((np.asarray(y, np.float64) - origin[1]) / d).astype(np.int64)
    return cx, cy


def build_star_index(
    ids: list[str],
    feats: list[str],
    pairs: set[tuple[str, str]],
    ctx: FeatureContext,
) -> tuple[dict[tuple[int, str], np.ndarray], dict[str, int]]:
    """Ordered star index from undirected pairs: for pair (a, b) each
    direction is kept iff ``is_ordered(center_feat, nbr_feat)``
    (src/neighborhood_mgr.cpp:42-87). Returns ({(center_idx, nbr_feat) ->
    sorted unique idx array}, id -> idx)."""
    id_to_idx = {s: i for i, s in enumerate(ids)}
    feat_of = {s: f for s, f in zip(ids, feats)}
    tmp: dict[tuple[int, str], list[int]] = {}
    for a, b in pairs:
        fa, fb = feat_of[a], feat_of[b]
        if ctx.is_ordered(fa, fb):
            tmp.setdefault((id_to_idx[a], fb), []).append(id_to_idx[b])
        if ctx.is_ordered(fb, fa):
            tmp.setdefault((id_to_idx[b], fa), []).append(id_to_idx[a])
    index = {
        k: np.unique(np.asarray(v, dtype=np.int32)) for k, v in tmp.items()
    }
    return index, id_to_idx


def mine_serial(
    ids,
    feats,
    x,
    y,
    neighbor_distance: float,
    min_prev: float,
    use_lemma3: bool = True,
    measure: str = "wpi",
) -> dict:
    """End-to-end serial oracle. Returns dict with ``patterns`` (list of
    records sorted by (k, pattern)), ``ctx``, ``pairs``."""
    ids = [str(s) for s in ids]
    feats = [str(s) for s in feats]
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    counts: dict[str, int] = {}
    for f in feats:
        counts[f] = counts.get(f, 0) + 1
    ctx = FeatureContext(counts)
    pairs = brute_force_pairs(
        np.asarray(ids, dtype=object), np.asarray(feats, dtype=object), x, y,
        neighbor_distance,
    )
    index, id_to_idx = build_star_index(ids, feats, pairs, ctx)
    t1: dict[str, list[int]] = {}
    for s, f in zip(ids, feats):
        t1.setdefault(f, []).append(id_to_idx[s])
    t1_arr = {f: np.asarray(v, dtype=np.int32) for f, v in t1.items()}
    recs = mine_local(
        index, t1_arr, ctx, min_prev,
        roots=None, use_lemma3=use_lemma3, measure=measure,
    )
    recs.sort(key=lambda r: (r["k"], r["pattern"]))
    return {"patterns": recs, "ctx": ctx, "pairs": pairs}


def pattern_set(result: dict) -> set[tuple[str, ...]]:
    return {r["pattern"] for r in result["patterns"]}
