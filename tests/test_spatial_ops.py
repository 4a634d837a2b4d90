"""Spatial utility operators: kNN vs brute force, general-polygon PIP
vs a direct check, raster round trip, quadkey hierarchy."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines.colocation import (
    from_numpy,
)
from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.sources.fixtures import (
    clustered_instances,
)
from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.stages.spatial_ops import (
    cells_to_boxes,
    knn,
    point_in_polygon,
    quadkey,
    rasterize,
    tag_polygons,
)


@pytest.fixture(scope="module")
def points():
    return clustered_instances(400, seed=21, extent=(500.0, 500.0))


def test_knn_matches_bruteforce(ray_session, points):
    ids, feats, x, y = points
    inst = from_numpy(ids, feats, x, y, parallelism=3)
    qids = [str(ids[i]) for i in (0, 37, 250)]
    qdf = ray.data.from_items(
        [
            {"query_id": str(ids[i]), "x": float(x[i]), "y": float(y[i])}
            for i in (0, 37, 250)
        ]
    )
    got = knn(inst, qdf, k=6, tile=40.0).take_all()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["nbr_id"], r["dist"]))
    for qi in (0, 37, 250):
        dx = x - x[qi]
        dy = y - y[qi]
        d = np.sqrt(dx * dx + dy * dy)
        order = sorted(range(len(ids)), key=lambda j: (d[j], ids[j]))[:6]
        want = [(rank + 1, str(ids[j]), round(float(d[j]), 6))
                for rank, j in enumerate(order)]
        assert sorted(by_q[str(ids[qi])]) == want


def test_knn_ring_escalation_sparse(ray_session):
    """A query whose first ring holds < k points must escalate rings and
    still return the exact global kNN (the far cluster)."""
    ids = np.array([f"P{i}" for i in range(8)], dtype=object)
    feats = np.array(["A"] * 8, dtype=object)
    # query point isolated at origin; 7 points in a far cluster at ~900
    x = np.array([0.0, 900, 901, 902, 903, 904, 905, 906])
    y = np.array([0.0, 900, 901, 902, 903, 904, 905, 906])
    inst = from_numpy(ids, feats, x, y, parallelism=2)
    qdf = ray.data.from_items([{"query_id": "P0", "x": 0.0, "y": 0.0}])
    got = knn(inst, qdf, k=4, tile=50.0).take_all()
    assert [r["nbr_id"] for r in sorted(got, key=lambda r: r["rank"])] == [
        "P0", "P1", "P2", "P3"
    ]


def test_point_in_polygon_general():
    # non-convex polygon (arrow shape)
    poly = [(0.0, 0.0), (4.0, 0.0), (2.0, 2.0), (4.0, 4.0), (0.0, 4.0)]
    xs = np.array([1.0, 3.5, 2.9, -1.0, 3.0])
    ys = np.array([2.0, 2.0, 0.5, 2.0, 3.9])
    got = point_in_polygon(xs, ys, poly)
    # (3.5, 2.0) is inside the notch -> outside the polygon
    assert got.tolist() == [True, False, True, False, True]


def test_tag_polygons_first_match(ray_session, points):
    ids, feats, x, y = points
    inst = from_numpy(ids, feats, x, y, parallelism=2)
    polys = {
        "tri": [(0.5, 0.5), (400.5, 0.5), (0.5, 400.5)],
        "all": [(-1.0, -1.0), (501.0, -1.0), (501.0, 501.0), (-1.0, 501.0)],
    }
    rows = tag_polygons(inst, polys).take_all()
    tags = {r["instance_id"]: r["polygon"] for r in rows}
    for i in range(len(ids)):
        in_tri = point_in_polygon(
            np.array([x[i]]), np.array([y[i]]), polys["tri"]
        )[0]
        assert tags[str(ids[i])] == ("tri" if in_tri else "all")


def test_raster_roundtrip(ray_session, points):
    ids, feats, x, y = points
    inst = from_numpy(ids, feats, x, y, parallelism=2)
    r = rasterize(inst, 100.0)
    rows = r.take_all()
    assert sum(row["n"] for row in rows) == len(ids)
    for row in rows:
        assert row["cell_x"] * 100.0 <= row["mean_x"] < (row["cell_x"] + 1) * 100.0
    boxes = cells_to_boxes(rasterize(inst, 100.0), 100.0).take_all()
    assert len(boxes) == len(rows)
    assert all(b["x_max"] - b["x_min"] == 100.0 for b in boxes)


def test_quadkey_hierarchy():
    cx = np.array([0, 1, 2, 3, 7], np.int64)
    cy = np.array([0, 1, 1, 2, 5], np.int64)
    q3 = quadkey(cx, cy, 3)
    q2 = quadkey(cx >> 1, cy >> 1, 2)
    # parent relation: level-(L-1) key of the parent cell == key >> 2
    assert np.array_equal(q3 >> 2, q2)
    # distinct cells -> distinct keys at sufficient level
    assert len(set(q3.tolist())) == 5


# ------------------------------------------------------------- DBSCAN


def _dbscan_oracle(df, eps, min_pts):
    """Brute-force single-process DBSCAN with the engine's label
    convention: cluster = min core id in the core-core component,
    border = min cluster among core neighbors, noise = -1."""
    ids = df["instance_id"].to_numpy(np.int64)
    x = df["x"].to_numpy(np.float64)
    y = df["y"].to_numpy(np.float64)
    n = len(ids)
    d2 = (x[:, None] - x[None, :]) ** 2 + (y[:, None] - y[None, :]) ** 2
    adj = (d2 <= eps * eps) & ~np.eye(n, dtype=bool)
    deg = adj.sum(1)
    is_core = deg + 1 >= min_pts
    # union-find over core-core edges
    parent = {int(i): int(i) for i in ids[is_core]}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    ci = np.flatnonzero(is_core)
    for ii in ci:
        for jj in ci:
            if ii < jj and adj[ii, jj]:
                ra, rb = find(int(ids[ii])), find(int(ids[jj]))
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    cluster = np.full(n, -1, np.int64)
    for ii in ci:
        cluster[ii] = find(int(ids[ii]))
    for ii in np.flatnonzero(~is_core):
        nbr_cores = [find(int(ids[jj])) for jj in np.flatnonzero(adj[ii])
                     if is_core[jj]]
        if nbr_cores:
            cluster[ii] = min(nbr_cores)
    return pd.DataFrame({"instance_id": ids, "cluster": cluster,
                         "is_core": is_core})


@pytest.mark.parametrize("parts", [1, 5])
def test_dbscan_matches_bruteforce(ray_session, parts):
    """Planted blobs + bridge border point + noise: engine DBSCAN ==
    brute-force oracle, invariant to partitioning."""
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.stages.spatial_ops import (
        dbscan,
    )

    rng = np.random.default_rng(17)
    blob1 = rng.normal(10, 1.0, (25, 2))
    blob2 = rng.normal(40, 1.5, (30, 2))
    noise = rng.uniform(60, 100, (15, 2))
    border = np.array([[13.5, 10.0]])  # near blob1's edge
    pts = np.vstack([blob1, blob2, noise, border])
    df = pd.DataFrame({
        "instance_id": np.arange(len(pts), dtype=np.int64) + 100,
        "feature": np.array(["a", "b"])[np.arange(len(pts)) % 2],
        "x": pts[:, 0], "y": pts[:, 1],
    })
    eps, min_pts = 2.5, 4
    got = (
        dbscan(ray.data.from_pandas(df).repartition(parts), eps, min_pts,
               n_buckets=8)
        .to_pandas().sort_values("instance_id").reset_index(drop=True)
    )
    want = _dbscan_oracle(df, eps, min_pts).sort_values(
        "instance_id"
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the fixture really exercises all three roles
    assert (want["cluster"] == -1).sum() >= 10
    assert want["is_core"].sum() >= 30
    assert len(set(want.loc[want["cluster"] >= 0, "cluster"])) >= 2


def test_dbscan_no_cores_all_noise(ray_session):
    """min_pts above any degree: everything is noise, nothing raises
    on the empty core exchange."""
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.stages.spatial_ops import (
        dbscan,
    )

    df = pd.DataFrame({
        "instance_id": np.arange(6, dtype=np.int64),
        "feature": ["a"] * 6,
        "x": np.linspace(0, 500, 6), "y": np.zeros(6),
    })
    got = dbscan(ray.data.from_pandas(df), eps=2.0, min_pts=3).to_pandas()
    assert (got["cluster"] == -1).all()
    assert (~got["is_core"]).all()
