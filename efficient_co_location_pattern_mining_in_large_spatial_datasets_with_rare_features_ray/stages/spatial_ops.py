"""Spatial utility operators (north-rule surface): kNN, point-in-polygon,
rasterize, hierarchical cell ids.

These are the service operators a tiling engine exposes around the
mining core. kNN is TILE-ROUTED: points hash-partition by coarse tile
and queries replicate only to the tiles of their current search ring
(ring doubles until the k-th distance is provably covered) -- the point
set is never broadcast. PIP is a stateful actor pool: the (genuinely
small) polygon set is broadcast once per actor via ``ray.put`` and every
batch is ray-cast vectorized.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset


def _knn_local_topk(k: int):
    """Per-tile kernel for the routed kNN: the group holds this tile
    bucket's POINT rows (kind=0) and the QUERY rows routed to its tiles
    (kind=1); each query scans only its target tile's points,
    vectorized, and emits that tile's top-k candidates."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"query_id": np.empty(0, object), "nbr_id": np.empty(0, object),
             "dist": np.empty(0, np.float64)}
        )
        if df.empty:
            return empty
        out_q, out_n, out_d = [], [], []
        for _, sub in df.groupby(["tx", "ty"], sort=False):
            pts = sub[sub["kind"] == 0]
            qs = sub[sub["kind"] == 1]
            if pts.empty or qs.empty:
                continue
            px = pts["x"].to_numpy(np.float64)
            py = pts["y"].to_numpy(np.float64)
            pid = pts["sid"].to_numpy(object)
            for qid, qx, qy in zip(qs["sid"], qs["x"], qs["y"]):
                dx = px - qx
                dy = py - qy
                d = np.sqrt(dx * dx + dy * dy)  # matches the SQL formula
                kk = min(k, len(d))
                sel = np.argpartition(d, kk - 1)[:kk] if kk < len(d) else np.arange(len(d))
                out_q.extend([qid] * len(sel))
                out_n.extend(pid[sel].tolist())
                out_d.extend(d[sel].tolist())
        if not out_q:
            return empty
        return pd.DataFrame(
            {"query_id": np.asarray(out_q, object),
             "nbr_id": np.asarray(out_n, object),
             "dist": np.asarray(out_d, np.float64)}
        )

    return fn


def knn(
    instances: Dataset,
    queries: Dataset,
    k: int = 5,
    tile: float = 250.0,
    n_buckets: int = 32,
) -> Dataset:
    """Exact kNN via TILE-ROUTED search with ring escalation -- the
    point set is never broadcast or driver-materialized (kNN at
    10^12-point scale).

    Points are hash-partitioned by coarse tile. Each query (queries are
    the small side by contract -- they form the routing table) is
    replicated to the tiles within its current search ring; a bucketed
    groupby computes per-tile top-k candidates against ONLY those
    tiles' points. A query is resolved when its k-th candidate distance
    is <= the distance to the searched region's boundary (no outside
    point can beat it) or when the region covers the data bbox;
    unresolved queries escalate the ring (doubling) and re-route.

    Output (query_id, nbr_id, dist, rank<=k), dist rounded to 6,
    deterministic (dist, nbr_id) tie order."""
    qdf = queries.to_pandas()
    out_schema = {
        "query_id": pa.array([], pa.string()), "nbr_id": pa.array([], pa.string()),
        "dist": pa.array([], pa.float64()), "rank": pa.array([], pa.int32()),
    }
    if qdf.empty:
        return ray.data.from_arrow(pa.table(out_schema))

    # data bbox via Dataset aggregates (for the coverage stop rule);
    # an empty point set yields None aggregates -> no neighbors exist
    from ray.data.aggregate import Max, Min

    bbox = instances.aggregate(Min("x"), Max("x"), Min("y"), Max("y"))
    if bbox is None or bbox.get("min(x)") is None:
        return ray.data.from_arrow(pa.table(out_schema))
    xmin, xmax = bbox["min(x)"], bbox["max(x)"]
    ymin, ymax = bbox["min(y)"], bbox["max(y)"]

    def tag_points(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "tx": np.floor(df["x"].to_numpy(np.float64) / tile).astype(np.int64),
                "ty": np.floor(df["y"].to_numpy(np.float64) / tile).astype(np.int64),
                "kind": np.zeros(len(df), np.int8),
                "sid": df["instance_id"].to_numpy(object),
                "x": df["x"].to_numpy(np.float64),
                "y": df["y"].to_numpy(np.float64),
            }
        )

    pts = instances.map_batches(tag_points, batch_format="pandas").materialize()

    pending = qdf.rename(columns={"query_id": "sid"})[["sid", "x", "y"]]
    results: list[pd.DataFrame] = []
    ring = 1
    while len(pending):
        qx = pending["x"].to_numpy(np.float64)
        qy = pending["y"].to_numpy(np.float64)
        htx = np.floor(qx / tile).astype(np.int64)
        hty = np.floor(qy / tile).astype(np.int64)
        # vectorized replica construction: each pending query fans out to
        # its (2r+1)^2 ring tiles in one repeat/tile pass
        offs = np.arange(-ring, ring + 1, dtype=np.int64)
        ddx = np.repeat(offs, len(offs))
        ddy = np.tile(offs, len(offs))
        m = len(ddx)
        rep = pd.DataFrame(
            {
                "tx": np.repeat(htx, m) + np.tile(ddx, len(pending)),
                "ty": np.repeat(hty, m) + np.tile(ddy, len(pending)),
                "kind": np.ones(m * len(pending), np.int8),
                "sid": np.repeat(pending["sid"].to_numpy(object), m),
                "x": np.repeat(qx, m),
                "y": np.repeat(qy, m),
            }
        )
        # semi-join points to the ROUTED tiles before the exchange: the
        # routed tile-key set is tiny (|pending| x ring tiles, deduped),
        # broadcast once via ray.put; only points inside some query's
        # current ring enter the union+groupby (round 2 re-shuffled the
        # ENTIRE point set every ring escalation)
        tile_keys = np.unique(
            (rep["tx"].to_numpy(np.int64) << np.int64(32))
            ^ (rep["ty"].to_numpy(np.int64) & np.int64(0xFFFFFFFF))
        )
        keys_ref = ray.put(tile_keys)

        def keep_routed(df: pd.DataFrame, _ref=keys_ref) -> pd.DataFrame:
            ks = ray.get(_ref)
            if not len(df) or not len(ks):
                return df.iloc[:0]
            key = (
                (df["tx"].to_numpy(np.int64) << np.int64(32))
                ^ (df["ty"].to_numpy(np.int64) & np.int64(0xFFFFFFFF))
            )
            pos = np.minimum(np.searchsorted(ks, key), len(ks) - 1)
            return df[ks[pos] == key]

        routed = pts.map_batches(keep_routed, batch_format="pandas")
        cand = (
            routed.union(ray.data.from_pandas(rep))
            .map_batches(
                lambda df: df.assign(
                    tb=(df["tx"].to_numpy(np.int64) * 1000003
                        + df["ty"].to_numpy(np.int64)) % n_buckets
                ),
                batch_format="pandas",
            )
            .groupby("tb")
            .map_groups(_knn_local_topk(k), batch_format="pandas")
            .to_pandas()
        )
        # searched square per query: [ (h-r)T , (h+r+1)T )
        sx_lo = (htx - ring) * tile
        sx_hi = (htx + ring + 1) * tile
        sy_lo = (hty - ring) * tile
        sy_hi = (hty + ring + 1) * tile
        boundary = np.minimum.reduce(
            [qx - sx_lo, sx_hi - qx, qy - sy_lo, sy_hi - qy]
        )
        covers_bbox = (
            (sx_lo <= xmin) & (sx_hi > xmax) & (sy_lo <= ymin) & (sy_hi > ymax)
        )
        # one groupby pass instead of a per-query boolean filter over the
        # full candidate frame (O(|pending| x |candidates|) per ring)
        by_query = (
            dict(tuple(cand.groupby("query_id", sort=False)))
            if len(cand) else {}
        )
        _no_cand = cand.iloc[:0]
        still = []
        for i, sid in enumerate(pending["sid"]):
            sub = by_query.get(sid, _no_cand)
            sub = sub.sort_values(
                ["dist", "nbr_id"], kind="stable").head(k)
            kth = sub["dist"].iloc[-1] if len(sub) >= k else np.inf
            if kth <= boundary[i] or covers_bbox[i]:
                sub = sub.copy()
                sub["rank"] = np.arange(1, len(sub) + 1, dtype=np.int32)
                results.append(sub)
            else:
                still.append(i)
        pending = pending.iloc[still]
        ring *= 2
    out = (
        pd.concat(results, ignore_index=True)
        if results
        else pd.DataFrame({c: [] for c in ("query_id", "nbr_id", "dist", "rank")})
    )
    out["dist"] = np.round(out["dist"].to_numpy(np.float64), 6)
    out = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    return ray.data.from_arrow(
        pa.table(
            {
                "query_id": pa.array(out["query_id"].astype(str), pa.string()),
                "nbr_id": pa.array(out["nbr_id"].astype(str), pa.string()),
                "dist": pa.array(out["dist"].to_numpy(np.float64), pa.float64()),
                "rank": pa.array(out["rank"].to_numpy(np.int32), pa.int32()),
            }
        )
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


def dbscan(
    instances: Dataset,
    eps: float,
    min_pts: int,
    n_buckets: int = 64,
) -> Dataset:
    """Distributed grid-based DBSCAN over (instance_id: int64, feature,
    x, y) points: (instance_id, cluster, is_core) where ``cluster`` is
    the component's smallest CORE id (deterministic labels, no run
    dependence), border points adopt the smallest cluster among their
    core neighbors, and noise gets cluster = -1.

    Ray-Data-first plan — every stage is machinery the engine already
    scales:

    1. eps-pairs via the mining path's grid distance self-join
       (stages/pairs.neighbor_pairs with ``cross_type=False`` — DBSCAN
       ignores feature types), tile+halo partitioning, no all-pairs;
    2. degrees via per-batch partials -> keyed sum (a point is core iff
       |eps-neighbors| + 1 >= min_pts, i.e. the point itself counts);
    3. core-core edges via two bucketed semi-joins (pipelines/
       joins.hash_join how='semi' — only the key column ships);
    4. connected components of the core graph via distributed min-label
       propagation (pipelines/corpus.neardup_components — two bucketed
       exchanges per round over the core graph only);
    5. border attachment: one more semi/inner join pass assigns each
       non-core point the MIN root among its core neighbors.

    Partitioning assumptions: per-tile pair volume is the grid join's
    (density-bounded); the label-propagation graph is the CORE subgraph
    (dense blobs collapse to few labels quickly — rounds ~ graph
    diameter)."""
    import pyarrow as pa

    from ..pipelines.corpus import neardup_components
    from ..pipelines.joins import hash_join
    from ..config import MiningConfig

    cfg = MiningConfig(neighbor_distance=float(eps))
    pairs = neighbor_pairs_all = None
    from .pairs import neighbor_pairs

    pairs = neighbor_pairs(instances, cfg, cross_type=False).select_columns(
        ["a_id", "b_id"]
    )

    # ids must be int64 (the component machinery's contract)
    def to_edges(t: pa.Table) -> pa.Table:
        a = t["a_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"a": pa.array(a), "b": pa.array(b)})

    edges = pairs.map_batches(to_edges, batch_format="pyarrow").materialize()

    # 2. degrees -> core flags (per-batch partials, one keyed sum)
    def deg_partial(t: pa.Table) -> pa.Table:
        both = np.concatenate([
            t["a"].to_numpy(zero_copy_only=False),
            t["b"].to_numpy(zero_copy_only=False),
        ])
        n, c = np.unique(both, return_counts=True)
        return pa.table({"node": pa.array(n, pa.int64()),
                         "deg": pa.array(c.astype(np.int64))})

    def deg_merge(df):
        g = df.groupby("node", sort=False)["deg"].sum().reset_index()
        g["deg"] = g["deg"].astype(np.int64)
        return g

    deg = (
        edges.map_batches(deg_partial, batch_format="pyarrow")
        .groupby("node")
        .map_groups(deg_merge, batch_format="pandas")
    )
    core = deg.filter(expr=f"deg >= {int(min_pts) - 1}").select_columns(
        ["node"]
    ).materialize()

    if core.count() == 0:
        # sparse data / high min_pts: no cores -> everything is noise
        # (a schema-less empty exchange side cannot be co-grouped)
        def all_noise(t: pa.Table) -> pa.Table:
            ids = t["instance_id"].to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            return pa.table({
                "instance_id": pa.array(ids),
                "cluster": pa.array(np.full(len(ids), -1, np.int64)),
                "is_core": pa.array(np.zeros(len(ids), bool)),
            })

        return instances.select_columns(["instance_id"]).map_batches(
            all_noise, batch_format="pyarrow"
        )

    # 3. core-core edges: two semi-joins; only the key column moves
    cc = hash_join(edges, core, key="a", right_key="node",
                   right_columns=[], how="semi", n_buckets=n_buckets)
    cc = hash_join(cc, core, key="b", right_key="node",
                   right_columns=[], how="semi", n_buckets=n_buckets)

    # 4. components of the core graph (isolated cores self-root below)
    comp = neardup_components(cc, n_buckets=n_buckets)  # (node, root)

    core_roots = hash_join(
        core, comp, key="node", right_columns=["root"], how="left",
        n_buckets=n_buckets,
    ).map_batches(
        lambda t: pa.table({
            "core_id": t["node"],
            "cluster": pa.array(np.where(
                np.asarray(t["root"].is_null()),
                t["node"].to_numpy(zero_copy_only=False),
                t["root"].to_numpy(zero_copy_only=False),
            ).astype(np.int64)),
        }),
        batch_format="pyarrow",
    ).materialize()

    # 5. border attachment: directed edges INTO core endpoints carry the
    # core's cluster to the other endpoint; min per node. Core points
    # also hear their own cluster (guard below keeps theirs).
    def both_dirs(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        return pa.table({
            "node": pa.array(np.concatenate([a, b]), pa.int64()),
            "nbr": pa.array(np.concatenate([b, a]), pa.int64()),
        })

    heard = hash_join(
        edges.map_batches(both_dirs, batch_format="pyarrow"),
        core_roots, key="nbr", right_key="core_id",
        right_columns=["cluster"], how="inner", n_buckets=n_buckets,
    )

    def min_partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame({
            "node": t["node"].to_numpy(zero_copy_only=False),
            "cluster": t["cluster"].to_numpy(zero_copy_only=False),
        })
        g = df.groupby("node", sort=False)["cluster"].min().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    border_lab = (
        heard.map_batches(min_partial, batch_format="pyarrow")
        .groupby("node")
        .map_groups(
            lambda df: df.groupby("node", sort=False)["cluster"]
            .min().reset_index(),
            batch_format="pandas",
        )
    )

    # assemble: every instance LEFT-joins its core label, then its
    # heard-min label; core keeps its own, border takes the min heard,
    # the rest are noise (-1)
    base = instances.select_columns(["instance_id"])
    lab = hash_join(base, core_roots, key="instance_id",
                    right_key="core_id", right_columns=["cluster"],
                    how="left", n_buckets=n_buckets)
    lab = hash_join(
        lab.map_batches(
            lambda t: t.rename_columns(["instance_id", "core_cluster"]),
            batch_format="pyarrow",
        ),
        border_lab, key="instance_id", right_key="node",
        right_columns=["cluster"], how="left", n_buckets=n_buckets,
    )

    def finish(t: pa.Table) -> pa.Table:
        cc_ = t["core_cluster"].to_numpy(zero_copy_only=False)
        hb = t["cluster"].to_numpy(zero_copy_only=False)
        is_core = ~np.asarray(t["core_cluster"].is_null())
        out = np.where(
            is_core, np.nan_to_num(cc_, nan=-1),
            np.where(np.asarray(t["cluster"].is_null()),
                     -1.0, np.nan_to_num(hb, nan=-1)),
        ).astype(np.int64)
        return pa.table({
            "instance_id": t["instance_id"],
            "cluster": pa.array(out),
            "is_core": pa.array(is_core),
        })

    return lab.map_batches(finish, batch_format="pyarrow")
