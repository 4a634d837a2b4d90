"""Per-subtree mining (paper Alg. 3) -- the engine's third shuffle.

``groupby(subtree)`` co-locates every star an ordered NR-subtree needs;
inside the group a plain dict index ``(center_idx, feature) -> sorted
int32 ids`` replaces the reference's 4-level pointer-tree linear walk
(src/miner.cpp:219-260) with O(1) lookups, and ``mining_core.mine_local``
runs the complete Algorithm-1 level loop locally with P1 = {root}
(Lemma 2 on, Lemma 3 off per paper sec. 5.2). Only tiny pattern-stat rows
leave the group; row-instance tables never shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from ..canonical import FeatureContext
from ..config import MiningConfig
from ..mining_core import mine_local

def _task_timing(name: str):
    """Env-gated per-task span logging (CLPM_TASK_TIMING=1): returns a
    finish callback printing one parseable line. The dashboard/state API
    is unavailable on minimal Ray builds, so wall-clock attribution of
    the mining graph's stages comes from these lines (used for the
    per-stage evidence in BASELINE.md)."""
    import os
    import time

    if not os.environ.get("CLPM_TASK_TIMING"):
        return lambda: None
    t0 = time.time()

    def done():
        print(f"TASKSPAN {name} {t0:.3f} {time.time():.3f}")

    return done


@ray.remote
def _gather_pattern_tables(*items):
    """Fan-in task: concatenate branch outputs into ONE pattern table.
    Args are branch-task refs resolved by the raylet (C++ path) -- the
    driver then fetches a single object instead of paying per-object
    ray.get overhead on hundreds of tiny tables (measured ~2-3 s of
    driver time at 319 branches). Deep-split branches return nested
    [sub_refs..., table] lists; those few refs are resolved here."""
    tables: list = []
    pending: list = []

    def absorb(x):
        if isinstance(x, list):
            for y in x:
                absorb(y)
        elif isinstance(x, ray.ObjectRef):
            pending.append(x)
        elif x.num_rows:
            tables.append(x)

    for it in items:
        absorb(it)
    while pending:
        batch, pending = pending, []
        for x in ray.get(batch):
            absorb(x)
    if not tables:
        return PATTERN_SCHEMA.empty_table()
    return pa.concat_tables(tables).combine_chunks()


def resolve_pattern_results(items) -> list:
    """Flatten a mix of pattern tables, ObjectRefs and nested lists to a
    flat table list. Branch tasks may return [sub_task_refs..., table]
    when they split at the third feature, so resolution is a worklist,
    not a single ray.get."""
    import ray as _ray

    tables: list = []
    pending: list = []

    def absorb(x):
        if isinstance(x, list):
            for y in x:
                absorb(y)
        elif isinstance(x, _ray.ObjectRef):
            pending.append(x)
        else:
            tables.append(x)

    import os
    import time as _t

    _dbg = os.environ.get("CLPM_TASK_TIMING")
    absorb(items)
    while pending:
        batch, pending = pending, []
        t0 = _t.perf_counter()
        got = _ray.get(batch)
        if _dbg:
            print(
                f"RESOLVE n={len(batch)} get_s={_t.perf_counter() - t0:.2f}",
                flush=True,
            )
        for x in got:
            absorb(x)
    return tables


PATTERN_SCHEMA = pa.schema(
    [
        ("pattern", pa.string()),       # comma-joined canonical feature list
        ("k", pa.int32()),
        ("root", pa.string()),          # rarest feature = subtree key
        ("wpi", pa.float64()),
        ("pi", pa.float64()),
        ("n_rows", pa.int64()),         # row-instance count |T(C)|
        ("prs", pa.list_(pa.float64())),  # per-slot participation ratios
    ]
)


def _group_csr(batch: pa.Table, ctx: FeatureContext, root: str):
    """Star rows of ONE subtree -> (StarCSR index, sorted distinct
    root-feature center codes). Factored so the branch-split path builds
    the index exactly once per subtree (prep task) and shares it with
    every branch miner through the object store."""
    from ..mining_core import StarCSR

    center_ids = batch["center_id"].to_numpy(zero_copy_only=False)
    nbr_col = batch["nbr_ids"].combine_chunks()
    if isinstance(nbr_col, pa.ChunkedArray):  # single chunk after combine
        nbr_col = nbr_col.chunk(0)
    offsets = nbr_col.offsets.to_numpy()
    flat_ids = nbr_col.values.to_numpy(zero_copy_only=False)

    # ids arrive as dense global int32 dictionary codes
    # (encode_instance_ids + the star builder's cast): use them directly
    # -- no per-group factorize pass, and the packed-key index stays safe
    # because n_codes < 2^31 (StarCSR guards this). Features arrive as
    # int16 canonical ranks; names come from the broadcast ctx.order.
    feat_names = np.asarray(ctx.order, object)
    nbr_codes = batch["nbr_feature"].to_numpy(zero_copy_only=False)

    # per-feature CSR star index built in one vectorized pass (neighbor
    # lists are unique by construction: one row per (center, nbr_feat)
    # over the deduped pair set)
    index = StarCSR.from_rows(
        center_ids, (nbr_codes, feat_names), offsets, flat_ids
    )

    # T1 for the root: distinct root-feature centers present in this group
    root_rank = ctx.rank[root]
    center_feats = batch["center_feature"].to_numpy(zero_copy_only=False)
    root_centers = np.unique(center_ids[center_feats == root_rank]).astype(
        np.int32
    )
    return index, root_centers


def _records_table(recs: list[dict], root: str) -> pa.Table:
    if not recs:
        return PATTERN_SCHEMA.empty_table()
    return pa.Table.from_arrays(
        [
            pa.array([",".join(r["pattern"]) for r in recs], pa.string()),
            pa.array([r["k"] for r in recs], pa.int32()),
            pa.array([root] * len(recs), pa.string()),
            pa.array([r["wpi"] for r in recs], pa.float64()),
            pa.array([r["pi"] for r in recs], pa.float64()),
            pa.array([r["n_rows"] for r in recs], pa.int64()),
            pa.array([r["prs"] for r in recs], pa.list_(pa.float64())),
        ],
        schema=PATTERN_SCHEMA,
    )


def _mine_group(
    batch: pa.Table, ctx: FeatureContext, min_prev: float, measure: str,
    root: str | None = None,
) -> pa.Table:
    if root is None:
        root = ctx.order[int(batch["subtree"][0].as_py())]
    index, root_centers = _group_csr(batch, ctx, root)
    recs = mine_local(
        index, {root: root_centers}, ctx, min_prev, roots=[root],
        use_lemma3=False, measure=measure,
    )
    return _records_table(recs, root)


@ray.remote
def _mine_subtree_task(
    ctx: FeatureContext, min_prev: float, measure: str, root: str, *slices
) -> pa.Table:
    parts = [s for s in slices if s is not None and s.num_rows]
    if not parts:
        return PATTERN_SCHEMA.empty_table()
    return _mine_group(
        pa.concat_tables(parts).combine_chunks(), ctx, min_prev, measure,
        root=root,
    )


@ray.remote
def _mine_branch_task(
    ctx: FeatureContext, min_prev: float, measure: str, root: str,
    second: str, state, box=None, split_rows: int = 0,
):
    """Branch-split phase 2: mine the (root, second) branch (k >= 3)
    against the shared subtree index (spawned by the prep task, one per
    prevalent second feature).

    When the branch's exact k=3 tables exceed ``split_rows`` rows, the
    level loop splits AGAIN at the third feature: one
    ``_mine_subbranch_task`` per prevalent (root, second, third) prefix,
    reading the shared index zero-copy via ``box`` (the un-resolved
    state ref). Without this the heaviest branch is one task bounding
    the whole job's tail. Returns either a pattern table, or a list of
    sub-task refs plus this branch's k=3 table (the driver resolves
    recursively: resolve_pattern_results)."""
    from ..mining_core import (
        continue_branch,
        mine_branch_level,
        prefix_table,
    )

    _done = _task_timing(f"branch:{root}:{second}")
    index, root_centers, seconds = state
    t12 = prefix_table(root_centers, (root, second), index)
    if t12 is None:
        _done()
        return PATTERN_SCHEMA.empty_table()
    recs3, prevalent3, tables3 = mine_branch_level(
        index, t12, ctx, min_prev, (root, second), seconds, measure
    )
    if not prevalent3:
        _done()
        return _records_table(recs3, root)
    total_rows = sum(int(t.shape[0]) for t in tables3.values())
    import os as _os

    if _os.environ.get("CLPM_TASK_TIMING") and total_rows > 100_000:
        print(f"BRANCHROWS {root}:{second} k3_rows={total_rows}", flush=True)
    if (
        not split_rows or box is None or len(prevalent3) < 2
        or total_rows < split_rows
    ):
        recs = recs3 + continue_branch(
            index, ctx, min_prev, measure, tables3, prevalent3, 3,
            branch_depth=1,
        )
        _done()
        return _records_table(recs, root)
    thirds = [p[2] for p in prevalent3]
    # largest sub-branches first so the tail packs with small tasks
    order = sorted(
        prevalent3, key=lambda p: -int(tables3[p].shape[0])
    )
    subs = [
        _mine_subbranch_task.remote(
            ctx, min_prev, measure, p, thirds,
            ray.put(tables3[p]), box,
        )
        for p in order
    ]
    # fan this branch's sub-tables into ONE gather whose args the raylet
    # resolves natively -- the top-level gather then sees one ref per
    # split branch instead of paying per-object ray.get overhead on
    # every sub-branch output
    _done()
    return [
        _gather_pattern_tables.remote(*subs),
        _records_table(recs3, root),
    ]


@ray.remote
def _mine_subbranch_task(
    ctx: FeatureContext, min_prev: float, measure: str,
    prefix3: tuple[str, ...], thirds: list[str], t13, box,
) -> pa.Table:
    """Deep-split phase 3: mine ONE (root, second, third) sub-branch
    (k >= 4). Same exactness argument as mine_branch, one level deeper:
    k=4 candidates prefix3+(g,) need g in the prevalent THIRDS of the
    parent branch (apriori-gen joins share the first k-2 = 2 features,
    both of which are this branch's (root, second)); the subsets
    dropping second or third are cross-branch and skipped
    (branch_depth=2) -- lost prunes only, never lost/spurious patterns."""
    from ..mining_core import continue_branch, mine_branch_level

    root = prefix3[0]
    _done = _task_timing(f"subbranch:{':'.join(prefix3)}")
    index, _root_centers, _seconds = ray.get(box[0])
    recs, prevalent, tables = mine_branch_level(
        index, t13, ctx, min_prev, prefix3, thirds, measure
    )
    if prevalent:
        recs += continue_branch(
            index, ctx, min_prev, measure, tables, prevalent, 4,
            branch_depth=2,
        )
    _done()
    return _records_table(recs, root)


@ray.remote
def _scan_meta_group(*blocks):
    """One meta-scan task per block GROUP: per-feature counts + grid
    origin partials. Replaces the former per-block code-and-scan wave
    (the id coding moved into _inst_block_slices, so the source table is
    never copied to plasma a second time)."""
    import pandas as pd
    import pyarrow.compute as pc

    counts: dict = {}
    ox, oy = None, None
    for t in blocks:
        if isinstance(t, pd.DataFrame):  # defensive: pandas block
            t = pa.Table.from_pandas(t, preserve_index=False)
        if not t.num_rows:
            continue
        vc = t["feature"].combine_chunks().value_counts()
        for f, n in zip(
            vc.field("values").to_pylist(), vc.field("counts").to_pylist()
        ):
            counts[f] = counts.get(f, 0) + int(n)
        mx = pc.min(t["x"]).as_py()
        my = pc.min(t["y"]).as_py()
        ox = mx if ox is None else min(ox, mx)
        oy = my if oy is None else min(oy, my)
    return counts, ox, oy


def _group_blocks(blocks: list[tuple]) -> list[list[tuple]]:
    """Group (ref, num_rows) blocks to ~2 tasks per cpu so downstream
    exchange tasks resolve tens of slice objects, not hundreds (224
    blocks x 64 returns measured as ~1 s of arg-resolution latency per
    exchange wave)."""
    import ray as _ray

    n_groups = max(1, min(
        len(blocks), 2 * int(_ray.cluster_resources().get("CPU", 8))
    ))
    per = (len(blocks) + n_groups - 1) // n_groups
    return [blocks[i: i + per] for i in range(0, len(blocks), per)]


def scan_meta_blocks(blocks: list[tuple]) -> tuple[dict, tuple]:
    """Feature-count map + global (min x, min y) over materialized
    blocks: one grouped task wave, partials merged on the driver."""
    metas = ray.get(
        [_scan_meta_group.remote(*[r for r, _ in g]) for g in _group_blocks(blocks)]
    )
    counts: dict = {}
    ox, oy = float("inf"), float("inf")
    for cts, mx, my in metas:
        for f, n in cts.items():
            counts[f] = counts.get(f, 0) + int(n)
        if mx is not None:
            ox = min(ox, mx)
            oy = min(oy, my)
    return counts, (ox, oy)


@ray.remote
def _inst_block_slices(
    d: float, origin: tuple[float, float], tile_cells: int,
    n_buckets: int, offsets: tuple, *blocks,
):
    """A group of source instance blocks -> positional int64 id codes
    (offsets precomputed on the driver from block metadata) ->
    cell/tile/halo/bucket columns -> per-bucket slices (num_returns).
    Fuses what used to be a separate encode wave plus a three-stage
    Dataset job into ONE task per block group, so the pair join starts
    the moment the source blocks exist and the table is written to
    plasma exactly once (as slices)."""
    import pandas as pd

    from .grid import cell_columns, replicate_table
    from .stars import _stable_bucket

    _done = _task_timing("inst")
    coded = []
    for t, off in zip(blocks, offsets):
        if isinstance(t, pd.DataFrame):  # defensive: pandas block
            t = pa.Table.from_pandas(t, preserve_index=False)
        cols = {
            "instance_id": pa.array(
                np.arange(off, off + t.num_rows, dtype=np.int64), pa.int64()
            )
        }
        for name in t.column_names:
            if name != "instance_id":
                cols[name] = t[name]
        coded.append(pa.table(cols))
    t = (
        coded[0] if len(coded) == 1
        else pa.concat_tables(coded).combine_chunks()
    )
    t = cell_columns(t, d, origin)
    t = replicate_table(t, tile_cells)
    tiles = t["tile"].to_numpy(zero_copy_only=False)
    codes = _stable_bucket(tiles, n_buckets)
    order = np.argsort(codes, kind="stable")
    t = t.append_column("bucket", pa.array(codes, pa.int64())).take(
        pa.array(order)
    )
    bounds = np.searchsorted(codes[order], np.arange(n_buckets + 1))
    outs = [
        t.slice(int(bounds[i]), int(n))
        if (n := bounds[i + 1] - bounds[i]) else None
        for i in range(n_buckets)
    ]
    _done()
    return tuple(outs) if n_buckets > 1 else outs[0]


@ray.remote
def _pairs_to_edge_slices(rank: dict, n_buckets: int, d: float, *inst_slices):
    """One pair-exchange bucket: instance slices -> qualifying pairs ->
    directed keyed edges, pre-sliced by STAR bucket (num_returns) so the
    star builders fetch only their own rows. The pair table never
    materializes as a standalone dataset on this path."""
    from .pairs import _pair_kernel
    from .stars import edge_table

    _done = _task_timing("pairs")
    none_row = tuple([None] * n_buckets) if n_buckets > 1 else None
    parts = [s for s in inst_slices if s is not None and s.num_rows]
    if not parts:
        return none_row
    pairs = _pair_kernel(pa.concat_tables(parts).combine_chunks(), d)
    if pairs.num_rows == 0:
        return none_row
    edges = edge_table(pairs, rank, n_buckets)
    codes = edges["bucket"].to_numpy(zero_copy_only=False)
    order = np.argsort(codes, kind="stable")
    edges = edges.take(pa.array(order))
    codes = codes[order]
    bounds = np.searchsorted(codes, np.arange(n_buckets + 1))
    outs = [
        edges.slice(int(bounds[i]), int(n))
        if (n := bounds[i + 1] - bounds[i]) else None
        for i in range(n_buckets)
    ]
    _done()
    return tuple(outs) if n_buckets > 1 else outs[0]


@ray.remote
def _build_key_slices(n_feats: int, n_codes: int, *edge_slices):
    """One star bucket in the COMPACT key format: edge slices ->
    (grp, key) rows (stars.edge_key_segments), pre-sliced by subtree
    (num_returns) for the prep tasks. Plasma write happens exactly once
    and every downstream read is two flat int columns."""
    from .stars import edge_key_segments

    _done = _task_timing("stars")
    parts = [s for s in edge_slices if s is not None and s.num_rows]
    if not parts:
        return tuple([None] * n_feats) if n_feats > 1 else None
    t = edge_key_segments(
        pa.concat_tables(parts).combine_chunks(), n_feats, n_codes
    )
    if t.num_rows == 0:
        return tuple([None] * n_feats) if n_feats > 1 else None
    grp = t["grp"].to_numpy(zero_copy_only=False)
    bounds = np.searchsorted(grp, np.arange(n_feats + 1) * (n_feats + 1))
    outs = [
        t.slice(int(bounds[i]), int(n))
        if (n := bounds[i + 1] - bounds[i]) else None
        for i in range(n_feats)
    ]
    _done()
    return tuple(outs) if n_feats > 1 else outs[0]


def _csr_from_key_slices(
    parts: list[pa.Table], ctx: FeatureContext, root: str, n_codes: int
):
    """Per-subtree (grp, key) slices -> (StarCSR, root centers).

    Each slice arrives sorted by grp; one pass counts per-feature
    segment sizes, one scatter concatenates each feature's keys into its
    destination range, and one in-place sort per feature finishes the
    CSR (cen/offsets derive from the sorted packed keys by division).
    Replaces the row-format lexsort + range-gather build whose random
    access was ~6x inflated under 16-way DRAM contention."""
    from ..mining_core import StarCSR

    nf = len(ctx.order)
    w = nf + 1
    base = ctx.rank[root] * w
    # per-slice segment bounds for the w local groups (nbr features + T1)
    seg_bounds = []
    sizes = np.zeros(w, np.int64)
    for t in parts:
        grp = t["grp"].to_numpy(zero_copy_only=False)
        b = np.searchsorted(grp, np.arange(base, base + w + 1))
        seg_bounds.append(b)
        sizes += b[1:] - b[:-1]
    offs_dst = np.concatenate([[0], np.cumsum(sizes)])
    total = int(offs_dst[-1])
    merged = np.empty(total, np.int64)
    cursor = offs_dst[:-1].copy()
    for t, b in zip(parts, seg_bounds):
        keys = t["key"].to_numpy(zero_copy_only=False)
        for g in range(w):
            n = int(b[g + 1] - b[g])
            if n:
                merged[cursor[g]: cursor[g] + n] = keys[b[g]: b[g + 1]]
                cursor[g] += n
    by_feat: dict = {}
    for g in range(nf):
        seg = merged[offs_dst[g]: offs_dst[g + 1]]
        if not len(seg):
            continue
        seg.sort()
        cen_all = seg // n_codes
        if len(cen_all) > 1:
            starts = np.concatenate(
                [[0], np.flatnonzero(cen_all[1:] != cen_all[:-1]) + 1]
            )
        else:
            starts = np.zeros(1, np.int64)
        by_feat[ctx.order[g]] = (
            cen_all[starts],
            np.append(starts, len(seg)).astype(np.int64),
            seg,
        )
    # T1 entries are disjoint across bucket slices (centers are
    # hash-partitioned), so concatenation alone is already distinct;
    # sort anyway: expansion row order follows T1 order, and sorted
    # centers keep every downstream CSR probe sequential (measured ~2x
    # on the branch miners vs hash-interleaved order)
    t1 = merged[offs_dst[nf]: offs_dst[nf + 1]]
    t1.sort()
    return StarCSR(by_feat, n_codes), t1.astype(np.int32)


def _prep_key_subtree_body(
    ctx: FeatureContext, min_prev: float, measure: str, root: str,
    n_codes: int, parts_list, split_rows: int = 0,
):
    """Shared body of the prep task (live-graph and resume variants):
    build the CSR index once, run the exact k=2 level, then SUBMIT the
    branch tasks from here -- one per PREVALENT second feature -- and
    return (branch_refs, k2_table).

    Nested submission, not driver-side: scheduled from the driver, the
    branch flood of early subtrees starved later preps of worker slots
    (measured: 39 preps holding 9 s of work spread over 12 s because
    ready branches jumped the queue), and the driver had to schedule a
    no-op branch task for every NON-prevalent second since prevalence is
    only known here. The shared index is put once; branch miners read it
    zero-copy from the object store."""
    from ..mining_core import mine_k2

    _done = _task_timing(f"prep:{root}")
    parts = [s for s in parts_list if s is not None and s.num_rows]
    if not parts:
        _done()
        return [], PATTERN_SCHEMA.empty_table()
    index, root_centers = _csr_from_key_slices(parts, ctx, root, n_codes)
    if not len(root_centers):
        return [], PATTERN_SCHEMA.empty_table()
    recs2, seconds = mine_k2(index, root_centers, ctx, min_prev, root, measure)
    if not seconds:
        return [], _records_table(recs2, root)
    state_ref = ray.put((index, root_centers, seconds))
    # spawn largest branches first (k2 row count is a free size proxy)
    # so the job tail packs with small tasks instead of ending on a
    # late-started heavy branch
    size_of = {r["pattern"][1]: r["n_rows"] for r in recs2}
    branches = [
        _mine_branch_task.remote(
            ctx, min_prev, measure, root, g, state_ref,
            [state_ref], split_rows,
        )
        for g in sorted(seconds, key=lambda g: -size_of.get(g, 0))
    ]
    _done()
    return branches, _records_table(recs2, root)


@ray.remote(num_returns=2)
def _prep_key_subtree_task(
    ctx: FeatureContext, min_prev: float, measure: str, root: str,
    n_codes: int, split_rows: int, *slices,
):
    """Branch-split phase 1 over the compact key format (see
    _prep_key_subtree_body)."""
    return _prep_key_subtree_body(
        ctx, min_prev, measure, root, n_codes, slices, split_rows
    )


@ray.remote
def _build_star_slices(n_feats: int, *edge_slices):
    """One star bucket: edge slices -> star table (already sorted by
    subtree rank) -> per-subtree slices (num_returns), handed straight
    to the subtree miners. Fusing the split into the build task means
    the 57M-row star table is written to plasma exactly once."""
    from .stars import _build_bucket_stars

    parts = [s for s in edge_slices if s is not None and s.num_rows]
    if not parts:
        return tuple([None] * n_feats) if n_feats > 1 else None
    t = _build_bucket_stars(pa.concat_tables(parts).combine_chunks())
    if t.num_rows == 0:
        return tuple([None] * n_feats) if n_feats > 1 else None
    codes = t["subtree"].to_numpy(zero_copy_only=False)
    bounds = np.searchsorted(codes, np.arange(n_feats + 1))
    outs = [
        t.slice(int(bounds[i]), int(n))
        if (n := bounds[i + 1] - bounds[i]) else None
        for i in range(n_feats)
    ]
    return tuple(outs) if n_feats > 1 else outs[0]


@ray.remote
def _write_root_star_slices(root_dir: str, *slices) -> int:
    """Checkpoint one subtree's star key slices: one parquet file per
    non-empty bucket slice (file = slice so the resume path hands the
    prep task the same per-bucket parts, preserving both the sorted-by-
    grp invariant and the T1-disjointness across parts)."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(root_dir, exist_ok=True)
    n = 0
    for i, s in enumerate(slices):
        if s is not None and s.num_rows:
            pq.write_table(s, f"{root_dir}/bucket_{i:05d}.parquet")
            n += s.num_rows
    return n


@ray.remote
def _read_root_star_slices(root_dir: str) -> list:
    """Load one subtree's checkpointed star slices (file = original
    bucket slice)."""
    import glob

    import pyarrow.parquet as pq

    return [pq.read_table(p) for p in sorted(glob.glob(f"{root_dir}/bucket_*.parquet"))]


@ray.remote(num_returns=2)
def _prep_key_subtree_from_ckpt(
    ctx: FeatureContext, min_prev: float, measure: str, root: str,
    n_codes: int, split_rows: int, slices_list: list,
):
    """Resume-path prep: same as _prep_key_subtree_task but over slices
    loaded from the star checkpoint (list arg instead of *refs)."""
    return _prep_key_subtree_body(
        ctx, min_prev, measure, root, n_codes, slices_list, split_rows
    )


def mine_task_graph(
    blocks: list[tuple],
    ctx: FeatureContext,
    cfg: MiningConfig,
    origin: tuple[float, float],
    n_codes: int | None = None,
) -> list:
    """The flagship mining path as ONE barrier-free task graph:

        source blocks (id coding + cell/tile/bucket columns in-task)
          -> split by pair bucket            (static exchange slices)
          -> pair kernel + edge emit         (one task per pair bucket,
                                              output pre-sliced by star bucket)
          -> star build                      (one task per star bucket,
                                              output pre-sliced by subtree)
          -> Algorithm-1 level loop          (one task per subtree)

    Raw tasks rather than chained Datasets because each stage is a
    static multi-way exchange (num_returns routing) that the Dataset API
    cannot express without a sort shuffle, and because Dataset
    materialize() barriers between stages serialized the pipeline: with
    direct object handoff a subtree miner starts the moment its last
    star slice exists, while other buckets are still building (the
    rarest-feature straggler overlaps the star/pair work instead of
    waiting behind a global barrier). Returns the per-subtree pattern
    table refs (PATTERN_SCHEMA)."""
    import ray as _ray

    if n_codes is None:  # instance codes are positional -> count = max+1
        n_codes = int(sum(ctx.counts.values()))
    star_grids, nb = _build_star_grids(blocks, ctx, cfg, origin, n_codes)
    feats = list(ctx.order)
    nf = len(feats)
    ctx_ref = _ray.put(ctx)
    tasks = []
    if cfg.branch_split:
        # two-phase branch split: without it the rarest feature's
        # subtree is ONE task bounding the whole job's tail (measured
        # ~20 s of a ~40 s 16-cpu run on the 1.6M fixture). Each prep
        # returns (branch_refs, k2_table) -- see _prep_key_subtree_body
        # for why branches are spawned from inside the prep. The
        # last-ranked feature roots no pattern (k=2 needs a larger-rank
        # partner); skipped.
        for fi, f in enumerate(feats[:-1]):
            slices = [star_grids[s][fi] for s in range(nb)]
            branches, k2 = _prep_key_subtree_task.options(
                num_returns=2
            ).remote(
                ctx_ref, cfg.min_prevalence, cfg.measure, f, n_codes,
                cfg.resolved_branch_split_rows(), *slices
            )
            tasks.append(branches)
            tasks.append(k2)
        return tasks
    for fi, f in enumerate(feats):
        slices = [star_grids[s][fi] for s in range(nb)]
        tasks.append(
            _mine_subtree_task.remote(
                ctx_ref, cfg.min_prevalence, cfg.measure, f, *slices
            )
        )
    return tasks


def _build_star_grids(
    blocks: list[tuple],
    ctx: FeatureContext,
    cfg: MiningConfig,
    origin: tuple[float, float],
    n_codes: int,
):
    """The first half of the task graph (source blocks -> id coding +
    pair buckets -> edge slices -> per-subtree star slices). ``blocks``
    is the (ref, num_rows) list from sharded.materialized_blocks; id
    code offsets derive from the metadata row counts, so coding happens
    INSIDE the first task wave (no separate encode wave, no second
    plasma copy of the source table). Returns (star_grids, n_buckets)
    where star_grids[bucket][subtree] is a slice ref."""
    import ray as _ray

    d = cfg.cell_size()
    nb = cfg.resolved_star_buckets(n_rows=int(sum(ctx.counts.values())))

    # cell assignment + tile/halo replication + bucket + slice happen in
    # ONE task per source block GROUP: the former encode wave plus three
    # map_batches + materialize Dataset jobs added whole-pipeline
    # barriers and ~1-2 s of fixed latency each.
    offsets = np.concatenate([[0], np.cumsum([n for _, n in blocks])])
    groups = _group_blocks(
        [(r, int(o)) for (r, _), o in zip(blocks, offsets[:-1])]
    )
    inst_grids = [
        _inst_block_slices.options(num_returns=nb).remote(
            d, origin, cfg.tile_cells, nb,
            tuple(o for _, o in grp), *[r for r, _ in grp],
        )
        for grp in groups
    ]
    if nb == 1:
        inst_grids = [[g] for g in inst_grids]
    rank_ref = _ray.put(dict(ctx.rank))
    edge_grids = [
        _pairs_to_edge_slices.options(num_returns=nb).remote(
            rank_ref, nb, d,
            *[inst_grids[b][i] for b in range(len(inst_grids))],
        )
        for i in range(nb)
    ]
    if nb == 1:
        edge_grids = [[g] for g in edge_grids]
    feats = list(ctx.order)
    nf = len(feats)
    builder = _build_key_slices if cfg.branch_split else _build_star_slices
    extra = (n_codes,) if cfg.branch_split else ()
    star_grids = [
        builder.options(num_returns=nf).remote(
            nf, *extra, *[edge_grids[p][s] for p in range(nb)]
        )
        for s in range(nb)
    ]
    if nf == 1:
        star_grids = [[g] for g in star_grids]
    return star_grids, nb


def mine_task_graph_checkpointed(
    blocks: list[tuple],
    ctx: FeatureContext,
    cfg: MiningConfig,
    origin: tuple[float, float],
    n_codes: int,
    work_dir: str,
) -> list[pa.Table]:
    """Flagship path with per-stage / per-partition checkpoints
    (north rule: resumable with per-partition lineage):

    * ``<work_dir>/star_keys/root=<fi>/bucket_*.parquet`` -- the star
      exchange's output, one partition directory per subtree, one file
      per original bucket slice. Fingerprinted on the GEOMETRY inputs
      only (d, tile_cells, feature counts, origin, n_codes) so a
      min_prevalence / measure re-run reuses the expensive join+star
      stages untouched.
    * ``<work_dir>/patterns/root=<fi>/patterns.parquet`` -- each
      subtree's mined pattern rows, marked complete per root.

    A rerun after a mid-job kill skips the encode/pair/star stages when
    the star manifest matches and mines only the roots whose pattern
    partition is missing; completed roots are read back from parquet.
    Requires the compact-key format (cfg.branch_split)."""
    import os

    import ray as _ray

    from ..state.checkpoint import is_complete, mark_complete

    if not cfg.branch_split:
        raise ValueError(
            "checkpointed flagship mining requires branch_split=True "
            "(the compact key star format); use mine_coordinated(work_dir=...) "
            "for the salted mode's checkpoint"
        )
    feats = list(ctx.order)
    nf = len(feats)
    roots = feats[:-1]  # last-ranked feature roots no pattern
    stars_dir = os.path.join(work_dir, "star_keys")
    pat_dir = os.path.join(work_dir, "patterns")
    fp_stars = {
        "d": cfg.neighbor_distance,
        "tile_cells": cfg.tile_cells,
        "counts": sorted(ctx.counts.items()),
        "origin": [origin[0], origin[1]],
        "n_codes": n_codes,
        "layout": "key-v1",
    }
    fp_pat = {
        **fp_stars, "min_prev": cfg.min_prevalence, "measure": cfg.measure
    }

    if not is_complete(stars_dir, fp_stars):
        import shutil

        if os.path.isdir(stars_dir):  # partial write from a killed run
            shutil.rmtree(stars_dir)
        star_grids, nb = _build_star_grids(blocks, ctx, cfg, origin, n_codes)
        ray.get(
            [
                _write_root_star_slices.remote(
                    os.path.join(stars_dir, f"root={fi}"),
                    *[star_grids[s][fi] for s in range(nb)],
                )
                for fi in range(len(roots))
            ]
        )
        mark_complete(stars_dir, fp_stars)

    import pyarrow.parquet as pq

    ctx_ref = _ray.put(ctx)
    tables: list[pa.Table] = []
    pending = []
    for fi, f in enumerate(roots):
        rdir = os.path.join(pat_dir, f"root={fi}")
        if is_complete(rdir, fp_pat):
            tables.append(
                pq.read_table(os.path.join(rdir, "patterns.parquet"))
                .cast(PATTERN_SCHEMA)  # normalize list-child field names
            )
            continue
        slices_list = _read_root_star_slices.remote(
            os.path.join(stars_dir, f"root={fi}")
        )
        branches, k2 = _prep_key_subtree_from_ckpt.options(
            num_returns=2
        ).remote(
            ctx_ref, cfg.min_prevalence, cfg.measure, f, n_codes,
            cfg.resolved_branch_split_rows(), slices_list
        )
        pending.append((rdir, branches, k2))
    for rdir, branches_ref, k2_ref in pending:
        parts = [ray.get(k2_ref)] + resolve_pattern_results(
            ray.get(branches_ref)
        )
        parts = [t for t in parts if t.num_rows]
        t = (
            pa.concat_tables(parts).combine_chunks()
            if parts else PATTERN_SCHEMA.empty_table()
        )
        os.makedirs(rdir, exist_ok=True)
        pq.write_table(t, os.path.join(rdir, "patterns.parquet"))
        mark_complete(rdir, fp_pat)
        tables.append(t)
    return tables
