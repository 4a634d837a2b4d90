"""Grid cell / tile assignment with halo replication.

Replaces the reference's in-memory uniform grid
(src/spatial_index.cpp:43-114) with a two-level scheme designed for
shuffles: points get a *cell* (side = neighbor_distance, like the
reference) and cells are grouped into *tiles* of ``tile_cells x
tile_cells`` cells. The pair join shuffles by tile, so a point is
replicated only when it sits on a tile's low-x / low-y boundary --
replication factor ~ 1 + 2/tile_cells instead of the 5x a per-cell halo
would cost. The reference's out-of-bounds edge bug at exact-multiple
extents (src/spatial_index.cpp:63-72) is not reproduced; cell ids are
plain ``floor((p - origin)/d)`` over int64.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Min


def global_origin(ds: Dataset) -> tuple[float, float]:
    """Global (min x, min y) scan, one pass (reference scans serially at
    src/spatial_index.cpp:52-61)."""
    agg = ds.aggregate(Min("x"), Min("y"))
    return float(agg["min(x)"]), float(agg["min(y)"])


def cell_columns(t: pa.Table, d: float, origin: tuple[float, float]) -> pa.Table:
    """Append int64 ``cell_x, cell_y`` columns to one table."""
    ox, oy = origin
    cx = pc.floor(pc.divide(pc.subtract(t["x"], ox), d)).cast(pa.int64())
    cy = pc.floor(pc.divide(pc.subtract(t["y"], oy), d)).cast(pa.int64())
    return t.append_column("cell_x", cx).append_column("cell_y", cy)


def assign_cells(ds: Dataset, d: float, origin: tuple[float, float]) -> Dataset:
    """Append int64 ``cell_x, cell_y`` columns (vectorized Arrow)."""
    return ds.map_batches(
        lambda t: cell_columns(t, d, origin), batch_format="pyarrow"
    )


def tile_id(tx: np.ndarray, ty: np.ndarray) -> np.ndarray:
    """Pack tile coords into one int64 key ((tx+1) allows the -1 halo tile)."""
    return (tx.astype(np.int64) + 1) * np.int64(1 << 31) + (ty.astype(np.int64) + 1)


def replicate_to_tiles(ds: Dataset, tile_cells: int) -> Dataset:
    """Emit each point to its home tile plus the <=3 halo tiles that the
    half-neighborhood pair scan needs (derivation: a home cell c consults
    cells c + {(0,0),(0,1),(1,-1),(1,0),(1,1)}; inverting, a point in
    cell q is halo for the tiles left of / below its own when q is on the
    tile's low-x or low-y cell boundary). Adds ``tile`` (int64) and
    ``home`` (bool)."""
    return ds.map_batches(
        lambda t: replicate_table(t, tile_cells), batch_format="pyarrow"
    )


def replicate_table(t: pa.Table, tile_cells: int) -> pa.Table:
    """Halo replication for one table (see replicate_to_tiles)."""
    T = int(tile_cells)

    def fn(t: pa.Table) -> pa.Table:
        cx = t["cell_x"].to_numpy(zero_copy_only=False)
        cy = t["cell_y"].to_numpy(zero_copy_only=False)
        tx, lx = np.divmod(cx, T)
        ty, ly = np.divmod(cy, T)
        n = len(cx)
        take: list[np.ndarray] = [np.arange(n)]
        tiles: list[np.ndarray] = [tile_id(tx, ty)]
        homes: list[np.ndarray] = [np.ones(n, dtype=bool)]
        specs = [
            (ly == 0, 0, -1),                    # consulted via (0,1) from tile below
            (lx == 0, -1, 0),                    # via (1,0)/(1,1)/(1,-1) from tile left
            ((lx == 0) & (ly == 0), -1, -1),     # via (1,1) from lower-left tile
            ((lx == 0) & (ly == T - 1), -1, 1),  # via (1,-1) from upper-left tile
            ((lx > 0) & (ly == T - 1), 0, 1),    # via (1,-1) from tile above
        ]
        for mask, dtx, dty in specs:
            idx = np.nonzero(mask)[0]
            if idx.size:
                take.append(idx)
                tiles.append(tile_id(tx[idx] + dtx, ty[idx] + dty))
                homes.append(np.zeros(idx.size, dtype=bool))
        take_all = np.concatenate(take)
        out = t.take(pa.array(take_all))
        out = out.append_column("tile", pa.array(np.concatenate(tiles)))
        out = out.append_column("home", pa.array(np.concatenate(homes)))
        return out

    return fn(t)
