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


def _pair_kernel(t: pa.Table, d: float, cross_type: bool = True) -> pa.Table:
    """All qualifying pairs within one exchange bucket (home points +
    halo, possibly MANY tiles -- cells are keyed by (tile, cell) so
    co-bucketed tiles cannot see each other's replicas). Fully
    vectorized: cells pack into one int64 key (local tile code | cell_x
    | cell_y), the four half-neighborhood offsets become key arithmetic
    + one searchsorted each, and candidate expansion is div/mod index
    math over run products -- no per-cell Python (the per-cell loop
    version was the biggest pre-mine stage at ~56 s CPU on the 1.6M
    fixture; it remains below as the fallback for coordinate ranges
    that cannot pack). Pair order is canonicalized a_id < b_id so the
    pair table is deterministic under any partitioning. Ids may be
    strings (reference layout) or int64 dictionary codes; output id
    dtype follows the input."""
    n = t.num_rows
    cx = t["cell_x"].to_numpy(zero_copy_only=False)
    cy = t["cell_y"].to_numpy(zero_copy_only=False)
    # packed-key guards: cell coords fit 22 bits (+2 offset covers the
    # -1 halo), local tile count fits 18 bits
    if n and (
        cx.max() + 4 >= (1 << 22) or cy.max() + 4 >= (1 << 22)
        or cx.min() < -2 or cy.min() < -2
    ):
        return _pair_kernel_cells(t, d, cross_type)
    tl = t["tile"].to_numpy(zero_copy_only=False)
    tu, tinv = (np.empty(0, np.int64), np.empty(0, np.int64)) if not n else (
        np.unique(tl, return_inverse=True)
    )
    if len(tu) >= (1 << 18):
        return _pair_kernel_cells(t, d, cross_type)

    ids = t["instance_id"].to_numpy(zero_copy_only=False)
    feats = t["feature"].to_numpy(zero_copy_only=False)
    xs = t["x"].to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
    ys = t["y"].to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
    home = t["home"].to_numpy(zero_copy_only=False).astype(bool, copy=False)
    d2 = float(d) * float(d)
    id_type = pa.int64() if np.issubdtype(ids.dtype, np.integer) else pa.string()

    def empty_out() -> pa.Table:
        return pa.table(
            {
                "a_id": pa.array([], id_type),
                "a_feature": pa.array([], pa.string()),
                "b_id": pa.array([], id_type),
                "b_feature": pa.array([], pa.string()),
            }
        )

    if n == 0:
        return empty_out()

    key = (
        tinv.astype(np.int64) * np.int64(1 << 44)
        + (cx.astype(np.int64) + 2) * np.int64(1 << 22)
        + (cy.astype(np.int64) + 2)
    )
    order = np.argsort(key)
    k_o = key[order]
    # everything below works in sorted coordinates
    ids_o = ids[order]
    xs_o = xs[order]
    ys_o = ys[order]
    home_o = home[order]
    fcodes = pd.factorize(feats, sort=False)[0][order]  # int compare, not str

    starts = np.concatenate([[0], np.flatnonzero(k_o[1:] != k_o[:-1]) + 1])
    lens = np.diff(np.append(starts, n))
    cell_key = k_o[starts]

    # home rows grouped by cell (hpos ascending keeps cell grouping)
    hpos = np.flatnonzero(home_o)
    hcnt = np.add.reduceat(home_o.astype(np.int64), starts)
    hcell_starts = np.concatenate([[0], np.cumsum(hcnt)])

    cand_a: list[np.ndarray] = []
    cand_b: list[np.ndarray] = []

    # within-cell pairs (home only; halo replicas never share a home
    # cell): vectorized per distinct home-count (triu broadcast over all
    # cells of that count)
    for L in np.unique(hcnt[hcnt >= 2]):
        S = hcell_starts[:-1][hcnt == L]
        iu, ju = np.triu_indices(int(L), 1)
        cand_a.append(hpos[(S[:, None] + iu[None, :]).ravel()])
        cand_b.append(hpos[(S[:, None] + ju[None, :]).ravel()])

    # half-neighborhood cross-cell pairs: offset = key arithmetic
    hmask_c = hcnt > 0
    hkeys = cell_key[hmask_c]
    h_start = hcell_starts[:-1][hmask_c]
    h_len = hcnt[hmask_c]
    for ox, oy in _HALF_OFFSETS:
        target = hkeys + np.int64(ox) * np.int64(1 << 22) + np.int64(oy)
        pos = np.searchsorted(cell_key, target)
        pos_c = np.minimum(pos, len(cell_key) - 1)
        found = cell_key[pos_c] == target
        if not found.any():
            continue
        hs = h_start[found]
        hl = h_len[found]
        os_ = starts[pos_c[found]]
        ol = lens[pos_c[found]]
        tot = hl * ol
        T = int(tot.sum())
        if T == 0:
            continue
        csum = np.cumsum(tot) - tot
        j = np.arange(T, dtype=np.int64) - np.repeat(csum, tot)
        ol_r = np.repeat(ol, tot)
        cand_a.append(hpos[np.repeat(hs, tot) + j // ol_r])
        cand_b.append(np.repeat(os_, tot) + j % ol_r)

    if not cand_a:
        return empty_out()
    a = np.concatenate(cand_a)
    b = np.concatenate(cand_b)
    dx = xs_o[a] - xs_o[b]
    dy = ys_o[a] - ys_o[b]
    ok = dx * dx + dy * dy <= d2
    if cross_type:  # reference semantics; DBSCAN wants all-type pairs
        ok &= fcodes[a] != fcodes[b]
    a = a[ok]
    b = b[ok]
    if not len(a):
        return empty_out()
    swap = ids_o[a] > ids_o[b]
    a2 = np.where(swap, b, a)
    b2 = np.where(swap, a, b)
    feats_o = feats[order]
    return pa.table(
        {
            "a_id": pa.array(ids_o[a2], type=id_type),
            "a_feature": pa.array(feats_o[a2], type=pa.string()),
            "b_id": pa.array(ids_o[b2], type=id_type),
            "b_feature": pa.array(feats_o[b2], type=pa.string()),
        }
    )


def _pair_kernel_cells(t: pa.Table, d: float, cross_type: bool = True) -> pa.Table:
    """Per-cell loop fallback (identical semantics to ``_pair_kernel``)
    for inputs whose tile/cell coordinate ranges exceed the packed-key
    bounds."""
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
        ok = dx * dx + dy * dy <= d2
        if cross_type:
            ok &= feats[ii] != feats[jj]
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
    cross_type: bool = True,
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
    n_buckets = cfg.resolved_star_buckets()

    def add_bucket(t: pa.Table) -> pa.Table:
        tiles = t["tile"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "bucket", pa.array(_stable_bucket(tiles, n_buckets), pa.int64())
        )

    ds = ds.map_batches(add_bucket, batch_format="pyarrow")
    return static_group_exchange(
        ds, "bucket", n_buckets, lambda t: _pair_kernel(t, d, cross_type)
    )
