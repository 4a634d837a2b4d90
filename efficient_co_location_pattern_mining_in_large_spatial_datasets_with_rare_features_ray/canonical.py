"""Canonical feature order and prevalence measures.

The reference derives *every* ordering decision from the global
feature-count map: features sort ascending by instance count with a
lexicographic tiebreak (src/utils.cpp:64-87), the ordered-neighbor
direction uses the same comparison (src/neighborhood_mgr.cpp:20-30), and
delta / RI / WPI are pure functions of the counts
(src/utils.cpp:93-143,198-245; src/miner.cpp:382-430).

This module is shared verbatim by the serial oracle and every
distributed stage (broadcast as a small picklable object), so all
workers agree on one data-dependent canonical order.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from .config import EPSILON_DELTA, EPSILON_SMALL


def canonical_key(counts: dict[str, int]):
    """Sort key: count ascending, then lexicographic (src/utils.cpp:79-84)."""
    return lambda f: (counts.get(f, 0), f)


@dataclass
class FeatureContext:
    """Broadcast-able global feature metadata: counts, canonical order, delta."""

    counts: dict[str, int]
    order: list[str] = field(init=False)       # canonical order (count asc, lex)
    rank: dict[str, int] = field(init=False)   # feature -> position in order
    delta: float = field(init=False)

    def __post_init__(self):
        self.order = sorted(self.counts, key=canonical_key(self.counts))
        self.rank = {f: i for i, f in enumerate(self.order)}
        self.delta = calculate_delta(self.order, self.counts)

    def is_ordered(self, center_feat: str, nbr_feat: str) -> bool:
        """Ordered-neighbor direction (src/neighborhood_mgr.cpp:20-30):
        keep nbr in center's star iff count(center) < count(nbr), ties by
        ``center <= nbr`` lexicographically."""
        nc, nn = self.counts[center_feat], self.counts[nbr_feat]
        if nc != nn:
            return nc < nn
        return center_feat <= nbr_feat

    def sort_pattern(self, features) -> tuple[str, ...]:
        return tuple(sorted(features, key=canonical_key(self.counts)))

    def rare_intensity(self, feature: str, pattern) -> float:
        return rare_intensity(feature, pattern, self.counts, self.delta)

    def wpr_weight(self, feature: str, pattern) -> float:
        """selectPrevColocations weight: 1/RI when RI > eps, else 0
        (src/miner.cpp:401-408 -- deviates from the paper's w = 1/RI)."""
        ri = self.rare_intensity(feature, pattern)
        return 1.0 / ri if ri > EPSILON_SMALL else 0.0


def calculate_delta(sorted_features: list[str], counts: dict[str, int]) -> float:
    """delta = 2/(m(m-1)) * sum_{i<j} count[f_j]/count[f_i] over the
    canonically sorted feature list (src/utils.cpp:93-143; paper Def. 1
    Eq. 2). m < 2 -> 0."""
    m = len(sorted_features)
    if m < 2:
        return 0.0
    c = [float(counts.get(f, 0)) for f in sorted_features]
    s = 0.0
    for i in range(m):
        denom = c[i] if c[i] != 0.0 else EPSILON_SMALL
        for j in range(i + 1, m):
            s += c[j] / denom
    return (2.0 / (m * (m - 1.0))) * s


def rare_intensity(feature: str, pattern, counts: dict[str, int], delta: float) -> float:
    """RI(f, C) = exp(-(v-1)^2 / (2 delta^2)), v = num(f)/num(f_min in C)
    (src/utils.cpp:198-245; paper Defs. 2-3 Eqs. 3-5). Guards mirror the
    reference: delta <= 1e-9 -> 0; f not in C -> 0; min count <= 0 -> 0."""
    if delta <= EPSILON_DELTA:
        return 0.0
    if feature not in pattern:
        return 0.0
    min_count = min(counts.get(f, 0) for f in pattern)
    if min_count <= 0:
        return 0.0
    v = counts.get(feature, 0) / float(min_count)
    return math.exp(-((v - 1.0) ** 2) / (2.0 * delta * delta))


def select_metrics(
    pattern,
    slot_distinct: list[int],
    ctx: FeatureContext,
) -> dict:
    """PR/PI/WPR/WPI for one candidate given per-slot distinct participant
    counts (numerators of src/utils.cpp:147-193). Mirrors
    selectPrevColocations (src/miner.cpp:382-430): WPI = min_f PR*weight
    with the epsilon weight branch; PI = min_f PR."""
    prs, wprs = [], []
    for i, f in enumerate(pattern):
        total = ctx.counts.get(f, 0)
        pr = (slot_distinct[i] / float(total)) if total > 0 else 0.0
        prs.append(pr)
        wprs.append(pr * ctx.wpr_weight(f, pattern))
    return {
        "prs": prs,
        "pi": min(prs) if prs else 0.0,
        "wpi": min(wprs) if wprs else 0.0,
    }
