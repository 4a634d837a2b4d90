"""Spatial utility operators (north-rule surface): kNN, point-in-polygon,
rasterize, hierarchical cell ids.

These are the service operators a tiling engine exposes around the
mining core. The kNN/PIP stages are stateful actor pools: the index is
built ONCE per actor in __init__ from a broadcast reference
(``ray.put``), then every batch is answered vectorized. At 10^12-row
scale the broadcast side becomes a partition-aligned index (one actor
pool per spatial partition, queries routed by cell) -- same actor
signature, different routing; documented here, demonstrated in the
broadcast regime the testdata fits.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset


class GridKNN:
    """Actor-pool kNN: grid-hash index over the broadcast point set,
    expanding-ring search per query batch (vectorized per ring)."""

    def __init__(self, points_ref, cell: float, k: int):
        ids, xs, ys = ray.get(points_ref)
        self.ids = ids
        self.xy = np.stack([xs, ys], axis=1)
        self.cell = float(cell)
        self.k = int(k)
        cx = np.floor(xs / self.cell).astype(np.int64)
        cy = np.floor(ys / self.cell).astype(np.int64)
        self.index: dict[tuple[int, int], np.ndarray] = {}
        order = np.lexsort((cy, cx))
        key = np.stack([cx[order], cy[order]], axis=1)
        if len(order):
            change = np.nonzero(np.any(np.diff(key, axis=0) != 0, axis=1))[0] + 1
            for grp in np.split(order, change):
                self.index[(int(cx[grp[0]]), int(cy[grp[0]]))] = grp

    def _candidates(self, qx: float, qy: float, ring: int) -> np.ndarray:
        cx, cy = int(np.floor(qx / self.cell)), int(np.floor(qy / self.cell))
        out = []
        for dx in range(-ring, ring + 1):
            for dy in range(-ring, ring + 1):
                grp = self.index.get((cx + dx, cy + dy))
                if grp is not None:
                    out.append(grp)
        return np.concatenate(out) if out else np.empty(0, np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids = batch["query_id"].to_numpy(zero_copy_only=False)
        qx = batch["x"].to_numpy(zero_copy_only=False)
        qy = batch["y"].to_numpy(zero_copy_only=False)
        out_q, out_n, out_d, out_r = [], [], [], []
        for i in range(len(qids)):
            ring = 1
            while True:
                cand = self._candidates(qx[i], qy[i], ring)
                # ring is sufficient once k found AND the k-th distance is
                # covered by the searched radius (ring*cell)
                if cand.size >= self.k:
                    dx = self.xy[cand, 0] - qx[i]
                    dy = self.xy[cand, 1] - qy[i]
                    d = np.sqrt(dx * dx + dy * dy)  # sqrt(dx^2+dy^2), not
                    # hypot: bit-identical to the SQL oracle's formula
                    kth = np.partition(d, self.k - 1)[self.k - 1]
                    if kth <= ring * self.cell or cand.size == len(self.ids):
                        break
                elif cand.size == len(self.ids):
                    dx = self.xy[cand, 0] - qx[i]
                    dy = self.xy[cand, 1] - qy[i]
                    d = np.sqrt(dx * dx + dy * dy)
                    break
                ring += 1
            kk = min(self.k, cand.size)
            # deterministic order: (distance, id)
            sel = sorted(range(cand.size), key=lambda j: (d[j], self.ids[cand[j]]))[:kk]
            for rank, j in enumerate(sel):
                out_q.append(qids[i])
                out_n.append(self.ids[cand[j]])
                out_d.append(round(float(d[j]), 6))
                out_r.append(rank + 1)
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.string()),
                "nbr_id": pa.array(out_n, pa.string()),
                "dist": pa.array(out_d, pa.float64()),
                "rank": pa.array(out_r, pa.int32()),
            }
        )


def knn(
    instances: Dataset,
    queries: Dataset,
    k: int = 5,
    cell: float = 50.0,
    concurrency: int = 2,
) -> Dataset:
    """queries(query_id, x, y) -> (query_id, nbr_id, dist, rank<=k).
    The point set is broadcast once (ray.put) and indexed once per actor."""
    pts = instances.to_pandas()
    ref = ray.put(
        (
            pts["instance_id"].to_numpy(dtype=object),
            pts["x"].to_numpy(np.float64),
            pts["y"].to_numpy(np.float64),
        )
    )
    return queries.map_batches(
        GridKNN,
        fn_constructor_kwargs={"points_ref": ref, "cell": cell, "k": k},
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=concurrency,
        num_cpus=1,
    )


def point_in_polygon(points_x: np.ndarray, points_y: np.ndarray,
                     poly: list[tuple[float, float]]) -> np.ndarray:
    """Vectorized even-odd ray casting (general simple polygons)."""
    x = np.asarray(points_x, np.float64)
    y = np.asarray(points_y, np.float64)
    inside = np.zeros(len(x), dtype=bool)
    n = len(poly)
    for i in range(n):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % n]
        span = ((y1 > y) != (y2 > y))
        # horizontal edges (y2==y1) have span==False everywhere; suppress
        # the vacuous divide-by-zero instead of branching
        with np.errstate(divide="ignore", invalid="ignore"):
            crosses = span & (x < (x2 - x1) * (y - y1) / (y2 - y1) + x1)
        inside ^= crosses
    return inside


class PolygonTagger:
    """Actor-pool stage: tag each point with the FIRST polygon containing
    it ('' when none). Polygons are broadcast; ray-cast per batch."""

    def __init__(self, polys_ref):
        self.polys: dict[str, list[tuple[float, float]]] = ray.get(polys_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        x = batch["x"].to_numpy(zero_copy_only=False)
        y = batch["y"].to_numpy(zero_copy_only=False)
        tag = np.full(len(x), "", dtype=object)
        untagged = np.ones(len(x), dtype=bool)
        for name, poly in self.polys.items():
            if not untagged.any():
                break
            hit = point_in_polygon(x, y, poly) & untagged
            tag[hit] = name
            untagged &= ~hit
        return pa.table(
            {
                "instance_id": batch["instance_id"],
                "polygon": pa.array(tag, pa.string()),
            }
        )


def tag_polygons(
    instances: Dataset,
    polygons: dict[str, list[tuple[float, float]]],
    concurrency: int = 2,
) -> Dataset:
    ref = ray.put(polygons)
    return instances.map_batches(
        PolygonTagger,
        fn_constructor_kwargs={"polys_ref": ref},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=concurrency,
        num_cpus=1,
    )


def rasterize(instances: Dataset, cell: float,
              origin: tuple[float, float] = (0.0, 0.0)) -> Dataset:
    """Vector -> raster: per-cell point count + mean position. Partial
    per-batch aggregation before the tiny cell groupby."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cx = np.floor((df["x"].to_numpy() - origin[0]) / cell).astype(np.int64)
        cy = np.floor((df["y"].to_numpy() - origin[1]) / cell).astype(np.int64)
        g = pd.DataFrame(
            {"cell_x": cx, "cell_y": cy, "n": 1,
             "sx": df["x"].to_numpy(), "sy": df["y"].to_numpy()}
        ).groupby(["cell_x", "cell_y"], sort=False).sum().reset_index()
        return g

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["cell_x", "cell_y"], sort=False).sum().reset_index()
        g["mean_x"] = np.round(g["sx"] / g["n"], 6)
        g["mean_y"] = np.round(g["sy"] / g["n"], 6)
        return g[["cell_x", "cell_y", "n", "mean_x", "mean_y"]]

    return (
        instances.map_batches(partial, batch_format="pandas")
        .groupby(["cell_x", "cell_y"])
        .map_groups(merge, batch_format="pandas")
    )


def cells_to_boxes(raster: Dataset, cell: float,
                   origin: tuple[float, float] = (0.0, 0.0)) -> Dataset:
    """Raster -> vector: each occupied cell becomes its bounding box
    (x_min, y_min, x_max, y_max) -- the inverse projection."""

    def fn(t: pa.Table) -> pa.Table:
        cx = t["cell_x"].to_numpy(zero_copy_only=False).astype(np.float64)
        cy = t["cell_y"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "cell_x": t["cell_x"],
                "cell_y": t["cell_y"],
                "x_min": pa.array(origin[0] + cx * cell),
                "y_min": pa.array(origin[1] + cy * cell),
                "x_max": pa.array(origin[0] + (cx + 1) * cell),
                "y_max": pa.array(origin[1] + (cy + 1) * cell),
            }
        )

    return raster.map_batches(fn, batch_format="pyarrow")


def quadkey(cx: np.ndarray, cy: np.ndarray, level: int) -> np.ndarray:
    """Hierarchical cell id (quadtree bit-interleave of the cell coords,
    the H3/S2-style parent/child relation for a square grid): the level-L
    parent of a cell is its quadkey >> 2(L0-L). Vectorized int64."""
    x = np.asarray(cx, np.int64)
    y = np.asarray(cy, np.int64)
    out = np.zeros(len(x), np.int64)
    for b in range(level):
        out |= ((x >> b) & 1) << (2 * b)
        out |= ((y >> b) & 1) << (2 * b + 1)
    return out
