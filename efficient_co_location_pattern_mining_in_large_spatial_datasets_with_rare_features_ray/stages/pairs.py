"""Grid-partitioned spatial distance self-join (neighbor pairs).

The engine's first shuffle: groupby(tile) -> vectorized half-
neighborhood pair kernel per tile. Semantics match the reference's
findNeighborPair (src/spatial_index.cpp:43-114): unordered cross-type
pairs with euclidean distance <= d (inclusive, :83,:102), each pair
emitted exactly once (half-neighborhood offsets (0,1),(1,-1),(1,0),(1,1)
plus i<j within a cell).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from ..config import MiningConfig
from .grid import assign_cells, global_origin, replicate_to_tiles

_HALF_OFFSETS = ((0, 1), (1, -1), (1, 0), (1, 1))

PAIR_SCHEMA = pa.schema(
    [
        ("a_id", pa.string()),
        ("a_feature", pa.string()),
        ("b_id", pa.string()),
        ("b_feature", pa.string()),
    ]
)


def _pair_kernel(t: pa.Table, d: float) -> pa.Table:
    """All qualifying pairs within one exchange bucket (home points +
    halo, possibly MANY tiles -- cells are keyed by (tile, cell) so
    co-bucketed tiles cannot see each other's replicas). Loops over home
    cells (small, side=d) with numpy distance math inside; pair order
    within the output is canonicalized a_id < b_id so the pair table is
    deterministic under any partitioning. Ids may be strings (reference
    layout) or int64 dictionary codes (the salted path); output id dtype
    follows the input."""
    ids = t["instance_id"].to_numpy(zero_copy_only=False)
    feats = t["feature"].to_numpy(zero_copy_only=False)
    xs = t["x"].to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
    ys = t["y"].to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
    cx = t["cell_x"].to_numpy(zero_copy_only=False)
    cy = t["cell_y"].to_numpy(zero_copy_only=False)
    tl = t["tile"].to_numpy(zero_copy_only=False)
    home = t["home"].to_numpy(zero_copy_only=False).astype(bool, copy=False)
    d2 = float(d) * float(d)

    # bucket rows by (tile, cell)
    order = np.lexsort((cy, cx, tl))
    cells: dict[tuple[int, int, int], np.ndarray] = {}
    if len(order):
        key = np.stack([tl[order], cx[order], cy[order]], axis=1)
        change = np.nonzero(np.any(np.diff(key, axis=0) != 0, axis=1))[0] + 1
        for grp in np.split(order, change):
            r0 = grp[0]
            cells[(int(tl[r0]), int(cx[r0]), int(cy[r0]))] = grp

    ai: list[np.ndarray] = []
    bi: list[np.ndarray] = []

    def emit(ii: np.ndarray, jj: np.ndarray):
        dx = xs[ii] - xs[jj]
        dy = ys[ii] - ys[jj]
        ok = (dx * dx + dy * dy <= d2) & (feats[ii] != feats[jj])
        if ok.any():
            ai.append(ii[ok])
            bi.append(jj[ok])

    for (ctl, ccx, ccy), grp in cells.items():
        hgrp = grp[home[grp]]
        if hgrp.size == 0:
            continue  # pure-halo cell: its pairs belong to another tile
        # within-cell pairs i<j (home cell contains only home points)
        if hgrp.size > 1:
            iu, ju = np.triu_indices(hgrp.size, k=1)
            emit(hgrp[iu], hgrp[ju])
        # half-neighborhood cross-cell pairs
        for ox, oy in _HALF_OFFSETS:
            other = cells.get((ctl, ccx + ox, ccy + oy))
            if other is None:
                continue
            ii = np.repeat(hgrp, other.size)
            jj = np.tile(other, hgrp.size)
            emit(ii, jj)

    id_type = pa.int64() if np.issubdtype(ids.dtype, np.integer) else pa.string()
    if not ai:
        return pa.table(
            {
                "a_id": pa.array([], id_type),
                "a_feature": pa.array([], pa.string()),
                "b_id": pa.array([], id_type),
                "b_feature": pa.array([], pa.string()),
            }
        )
    a = np.concatenate(ai)
    b = np.concatenate(bi)
    swap = ids[a] > ids[b]
    a2 = np.where(swap, b, a)
    b2 = np.where(swap, a, b)
    return pa.table(
        {
            "a_id": pa.array(ids[a2], type=id_type),
            "a_feature": pa.array(feats[a2], type=pa.string()),
            "b_id": pa.array(ids[b2], type=id_type),
            "b_feature": pa.array(feats[b2], type=pa.string()),
        }
    )


def neighbor_pairs(
    instances: Dataset,
    cfg: MiningConfig,
    origin: tuple[float, float] | None = None,
) -> Dataset:
    """instances(instance_id, feature, x, y) -> pairs(a_id, a_feature,
    b_id, b_feature), one row per unordered qualifying pair.

    The exchange is the static split (stages/exchange.py) over
    ``hash(tile) % star_buckets``, not ``groupby("tile")``: the sort
    shuffle's boundary sampling and per-tile group bookkeeping dominated
    the stage (it also created one Ray group per tile -- thousands of
    groups); the kernel partitions by (tile, cell) internally so
    co-bucketed tiles stay isolated."""
    from .exchange import static_group_exchange
    from .stars import _stable_bucket

    d = cfg.cell_size()
    if origin is None:
        origin = cfg.grid_origin or global_origin(instances)
    ds = assign_cells(instances, d, origin)
    ds = replicate_to_tiles(ds, cfg.tile_cells)
    n_buckets = cfg.star_buckets

    def add_bucket(t: pa.Table) -> pa.Table:
        tiles = t["tile"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "bucket", pa.array(_stable_bucket(tiles, n_buckets), pa.int64())
        )

    ds = ds.map_batches(add_bucket, batch_format="pyarrow")
    return static_group_exchange(
        ds, "bucket", n_buckets, lambda t: _pair_kernel(t, d)
    )
