"""Deterministic fixture datasets (FIXTURES.md F1-F4).

Raw spatial instance tables mirroring the shapes of the reference's
bundled CSV corpus (data/sample_data.csv, LasVegas, 5k_15f_50k) -- all
synthesized locally, seed-fixed, no external data. The image+caption
fixture (Lance-schema table) lives in ``sources/images.py``.
"""

from __future__ import annotations

import numpy as np

# F1 -- exact geometry of the reference's data/sample_data.csv (16 rows,
# 4 features; counts D:3 < B:4 < C:4 < A:5).
_SAMPLE = [
    ("A", 1, 9.0, 8.0), ("A", 2, 3.0, 4.0), ("A", 3, 7.0, 4.0),
    ("A", 4, 6.0, 1.0), ("A", 5, 7.0, 7.0),
    ("B", 1, 6.0, 3.0), ("B", 2, 2.0, 10.0), ("B", 3, 5.0, 7.0),
    ("B", 4, 9.5, 10.0),
    ("C", 1, 5.0, 4.0), ("C", 2, 8.0, 9.5), ("C", 3, 8.0, 3.0),
    ("C", 4, 1.0, 3.0),
    ("D", 1, 6.0, 5.0), ("D", 2, 1.0, 5.0), ("D", 3, 4.0, 2.0),
]


def sample_tiny():
    """F1 golden_tiny: (ids, feats, x, y) numpy arrays."""
    ids = np.array([f"{f}{n}" for f, n, _, _ in _SAMPLE], dtype=object)
    feats = np.array([f for f, _, _, _ in _SAMPLE], dtype=object)
    x = np.array([r[2] for r in _SAMPLE], dtype=np.float64)
    y = np.array([r[3] for r in _SAMPLE], dtype=np.float64)
    return ids, feats, x, y


def clustered_instances(
    n: int,
    feature_counts: dict[str, int] | None = None,
    extent: tuple[float, float] = (1000.0, 1000.0),
    n_clusters: int = 40,
    cluster_sigma: float = 8.0,
    seed: int = 7,
):
    """F2/F3-style generator: features with a given (possibly skewed)
    count profile, points drawn around shared cluster centers so real
    co-location patterns exist. Deterministic for fixed arguments."""
    rng = np.random.default_rng(seed)
    if feature_counts is None:
        n_feat = 12
        labels = [chr(ord("A") + i) for i in range(n_feat)]
        w = rng.dirichlet(np.ones(n_feat) * 2.0)
        feature_counts = {
            lab: max(1, int(round(wi * n))) for lab, wi in zip(labels, w)
        }
    centers = rng.uniform(0, 1, size=(n_clusters, 2)) * np.array(extent)
    ids, feats, xs, ys = [], [], [], []
    for lab in sorted(feature_counts):
        cnt = feature_counts[lab]
        which = rng.integers(0, n_clusters, size=cnt)
        pts = centers[which] + rng.normal(0, cluster_sigma, size=(cnt, 2))
        pts = np.clip(pts, 0, np.array(extent))
        for i in range(cnt):
            ids.append(f"{lab}{i + 1}")
            feats.append(lab)
            xs.append(pts[i, 0])
            ys.append(pts[i, 1])
    return (
        np.array(ids, dtype=object),
        np.array(feats, dtype=object),
        np.round(np.array(xs, np.float64), 3),
        np.round(np.array(ys, np.float64), 3),
    )


def rare_feature_fixture():
    """F4: one very rare feature R (3 instances) embedded inside a dense
    common feature Z (60 instances) plus a mid feature M; exercises the
    WPI-vs-PI divergence (paper Example 2) and count-tie ordering."""
    rng = np.random.default_rng(99)
    ids, feats, xs, ys = [], [], [], []
    # rare: 3 points at known spots
    rare_pts = [(50.0, 50.0), (150.0, 50.0), (100.0, 150.0)]
    for i, (px, py) in enumerate(rare_pts):
        ids.append(f"R{i + 1}"); feats.append("R"); xs.append(px); ys.append(py)
    # common Z: 20 around each rare point (within d=5) + scatter
    k = 0
    for px, py in rare_pts:
        for _ in range(15):
            k += 1
            ids.append(f"Z{k}"); feats.append("Z")
            xs.append(px + rng.uniform(-3, 3)); ys.append(py + rng.uniform(-3, 3))
    for _ in range(15):
        k += 1
        ids.append(f"Z{k}"); feats.append("Z")
        xs.append(rng.uniform(0, 200)); ys.append(rng.uniform(0, 200))
    # mid feature M: ties with another mid feature N in count (lex tiebreak path)
    for i in range(10):
        ids.append(f"M{i + 1}"); feats.append("M")
        xs.append(rng.uniform(0, 200)); ys.append(rng.uniform(0, 200))
    for i in range(10):
        ids.append(f"N{i + 1}"); feats.append("N")
        xs.append(rng.uniform(0, 200)); ys.append(rng.uniform(0, 200))
    # one pair at exactly distance d=5 (inclusive <= check)
    ids.append("M11"); feats.append("M"); xs.append(300.0); ys.append(300.0)
    ids.append("N11"); feats.append("N"); xs.append(305.0); ys.append(300.0)
    return (
        np.array(ids, dtype=object),
        np.array(feats, dtype=object),
        np.round(np.array(xs, np.float64), 3),
        np.round(np.array(ys, np.float64), 3),
    )
