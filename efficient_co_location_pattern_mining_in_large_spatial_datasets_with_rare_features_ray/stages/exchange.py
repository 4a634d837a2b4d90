"""Static bucket exchange -- the skew-proof replacement for
``groupby(int key).map_groups`` over SMALL key spaces.

Ray Data's groupby is a sort-based shuffle whose range-boundary sampling
degenerates when the key space is tiny (n_features subtrees, a few
hundred hash buckets): measured on this engine's 1.6M-row fixture at 16
cpus, the two groupby exchanges of the mining path (tile pair join +
star buckets) spent ~90 s in shuffle machinery while ALL real compute in
those stages summed to ~9 s. With the key already a dense int bucket in
``[0, n_parts)`` the exchange needs no boundary sampling and no sort:

1. one parallel task per materialized block slices it by bucket
   (``num_returns`` separate objects -- a single argsort over an int
   column, zero-copy slices);
2. one task per bucket fetches only its own slices, concatenates, and
   applies the group function.

Linear work, deterministic placement, skew bounded only by the bucket
hash. This is the same exchange shape ``stages/mining.py`` uses for the
per-subtree split (where it replaced a 40-60 s shuffle) and
``stages/sharded.py`` for shard loads, factored out for reuse.

The exchange runs EAGERLY (it materializes its input); the result is
returned as a Dataset over the output object refs, so downstream stages
keep streaming. Empty buckets are shipped as zero-row slices, keeping
the input schema end-to-end -- the group function must map an empty
input to its (correctly typed) empty output.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset


@ray.remote
def _split_by_key(t, key: str, n: int):
    """Slice one block into n sub-tables by its int bucket column
    (values must lie in [0, n)). Returns zero-row slices for empty
    buckets so every downstream task sees the input schema. Ray emits
    EMPTY upstream blocks untransformed (the producing UDF never runs),
    so a block may lack the key column entirely -> all-None row."""
    import os
    import time as _time

    import pandas as pd

    _t0 = _time.perf_counter()

    if isinstance(t, pd.DataFrame):  # defensive: upstream pandas block
        t = pa.Table.from_pandas(t, preserve_index=False)
    if key not in t.column_names:
        return tuple([None] * n) if n > 1 else None
    codes = t[key].to_numpy(zero_copy_only=False)
    if len(codes) > 1 and not np.all(codes[1:] >= codes[:-1]):
        order = np.argsort(codes, kind="stable")
        t = t.take(pa.array(order))
        codes = codes[order]
    bounds = np.searchsorted(codes, np.arange(n + 1))
    outs = [
        t.slice(int(bounds[i]), int(bounds[i + 1] - bounds[i]))
        for i in range(n)
    ]
    if os.environ.get("CLPM_TASK_TIMING"):
        print(
            f"SPLITTASK rows={t.num_rows} s={_time.perf_counter() - _t0:.2f} "
            f"at={_time.time() % 1000:.1f}",
            flush=True,
        )
    return tuple(outs) if n > 1 else outs[0]


def _run_group(
    fn: Callable[[pa.Table], pa.Table], empty_schema, slices
) -> pa.Table:
    parts = [s for s in slices if s is not None and s.num_rows]
    if not parts:
        # all-empty bucket: a zero-row slice keeps the input schema, and
        # fn must map an empty input to its correctly-typed empty output
        # (the documented contract). If every input block was a
        # schema-less empty pass-through, return the caller-declared
        # output schema -- or, absent one, mirror Ray's own empty-block
        # behavior (column-less empty table).
        parts = [s for s in slices if s is not None][:1]
        if not parts:
            return (
                empty_schema.empty_table() if empty_schema is not None
                else pa.table({})
            )
    return fn(pa.concat_tables(parts).combine_chunks())


@ray.remote
def _apply_group(
    fn: Callable[[pa.Table], pa.Table], empty_schema, *slices
) -> pa.Table:
    return _run_group(fn, empty_schema, slices)


@ray.remote(num_returns=2)
def _apply_group_counted(
    fn: Callable[[pa.Table], pa.Table], empty_schema, *slices
):
    t = _run_group(fn, empty_schema, slices)
    return t, t.num_rows


def static_group_exchange(
    ds: Dataset,
    key: str,
    n_parts: int,
    fn: Callable[[pa.Table], pa.Table],
    empty_schema: pa.Schema | None = None,
    drop_empty: bool = False,
) -> Dataset:
    """``ds.groupby(key).map_groups(fn)`` semantics for an int bucket
    column ``key`` with values in ``[0, n_parts)``, executed as a static
    split exchange (see module docstring). ``fn`` receives one Arrow
    table per bucket (all rows of that bucket, POSSIBLY ZERO-ROW --
    unlike groupby().map_groups, empty buckets do invoke fn, which must
    map an empty input to its correctly-typed empty output). When every
    upstream block lacked the key column entirely (schema-less empty
    pass-throughs), the bucket output is ``empty_schema.empty_table()``
    if given, else a column-less empty table.

    ``drop_empty=True`` removes zero-row bucket outputs from the result
    Dataset (each group task returns its row count as a second object,
    so no extra task wave): downstream stages see no empty blocks at
    all -- no pass-through schema-mix warnings, no wasted tasks. It
    BARRIERS on all group tasks finishing, so keep it off in
    latency-critical chains that want the next stage to start on the
    first finished bucket."""
    refs = ds.materialize().to_arrow_refs()
    if not refs:
        raise ValueError("static exchange over an empty dataset")
    grids = [
        _split_by_key.options(num_returns=n_parts).remote(r, key, n_parts)
        for r in refs
    ]
    if n_parts == 1:  # num_returns=1 yields a bare ref
        grids = [[g] for g in grids]
    fn_ref = ray.put(fn)
    import ray.data as rd

    if drop_empty:
        outs = [
            _apply_group_counted.remote(
                fn_ref, empty_schema, *[grids[b][i] for b in range(len(grids))]
            )
            for i in range(n_parts)
        ]
        counts = ray.get([c for _, c in outs])
        tasks = [t for (t, _), n in zip(outs, counts) if n > 0]
        if not tasks:  # keep one typed empty block so the result has a schema
            tasks = [outs[0][0]]
        return rd.from_arrow_refs(tasks)

    tasks = [
        _apply_group.remote(
            fn_ref, empty_schema, *[grids[b][i] for b in range(len(grids))]
        )
        for i in range(n_parts)
    ]
    return rd.from_arrow_refs(tasks)


@ray.remote
def _apply_cogroup(fn, schema_l, schema_r, n_l: int, *slices) -> pa.Table:
    """One bucket of a TWO-sided exchange: the first ``n_l`` slices are
    the left side's, the rest the right's. fn(left_table, right_table)."""
    ls = [s for s in slices[:n_l] if s is not None and s.num_rows]
    rs = [s for s in slices[n_l:] if s is not None and s.num_rows]
    tl = (
        pa.concat_tables(ls).combine_chunks() if ls
        else schema_l.empty_table()
    )
    tr = (
        pa.concat_tables(rs).combine_chunks() if rs
        else schema_r.empty_table()
    )
    return fn(tl, tr)


def static_cogroup_exchange(
    left: Dataset,
    right: Dataset,
    key: str,
    n_parts: int,
    fn: Callable[[pa.Table, pa.Table], pa.Table],
) -> Dataset:
    """Co-grouped two-Dataset exchange: both sides carry an int bucket
    column ``key`` (values in ``[0, n_parts)``); every bucket task
    receives ALL left rows and ALL right rows of its bucket as two Arrow
    tables. This is the join/cogroup counterpart of
    ``static_group_exchange`` -- same linear split (one task per block,
    ``num_returns`` zero-copy slices), same deterministic placement, one
    exchange for both inputs instead of a tagged union (no null-padding
    the narrower side into a common schema, no per-row side flags).
    Either side of a bucket may be empty; fn gets a correctly-typed
    zero-row table for it."""
    lmat = left.materialize()
    rmat = right.materialize()
    schema_l = lmat.schema().base_schema
    schema_r = rmat.schema().base_schema
    lrefs = lmat.to_arrow_refs()
    rrefs = rmat.to_arrow_refs()
    grids = [
        _split_by_key.options(num_returns=n_parts).remote(r, key, n_parts)
        for r in (*lrefs, *rrefs)
    ]
    if n_parts == 1:
        grids = [[g] for g in grids]
    n_l = len(lrefs)
    fn_ref = ray.put(fn)
    import ray.data as rd

    tasks = [
        _apply_cogroup.remote(
            fn_ref, schema_l, schema_r, n_l,
            *[grids[b][i] for b in range(len(grids))],
        )
        for i in range(n_parts)
    ]
    return rd.from_arrow_refs(tasks)


def _split_table(t: pa.Table, key: str, n: int) -> tuple:
    """Sort-and-slice one table into n zero-copy sub-tables by its int
    key column (values in [0, n)) -- the local core of _split_by_key."""
    codes = t[key].to_numpy(zero_copy_only=False)
    if len(codes) > 1 and not np.all(codes[1:] >= codes[:-1]):
        order = np.argsort(codes, kind="stable")
        t = t.take(pa.array(order))
        codes = codes[order]
    bounds = np.searchsorted(codes, np.arange(n + 1))
    return tuple(
        t.slice(int(bounds[i]), int(bounds[i + 1] - bounds[i]))
        for i in range(n)
    )


@ray.remote
def _apply_group_split(
    fn, empty_schema, out_key: str, n_out: int, *slices
):
    import os
    import time as _time

    _t0 = _time.perf_counter()
    t = _run_group(fn, empty_schema, slices)
    _t1 = _time.perf_counter()
    if n_out == 1:
        return t
    if out_key not in t.column_names:  # schema-less empty pass-through
        empty = (
            empty_schema.empty_table() if empty_schema is not None
            else pa.table({})
        )
        return tuple(empty for _ in range(n_out))
    out = _split_table(t, out_key, n_out)
    if os.environ.get("CLPM_TASK_TIMING"):
        print(
            f"GROUPTASK rows={t.num_rows} fn_s={_t1 - _t0:.2f} "
            f"split_s={_time.perf_counter() - _t1:.2f} at={_time.time() % 1000:.1f}",
            flush=True,
        )
    return out


def static_group_exchange_split(
    ds: Dataset,
    key: str,
    n_parts: int,
    fn: Callable[[pa.Table], pa.Table],
    out_key: str,
    n_out: int,
    empty_schema: pa.Schema | None = None,
) -> list[list["ray.ObjectRef"]]:
    """``static_group_exchange`` fused with a split of each group's
    OUTPUT by ``out_key`` (int values in [0, n_out)): every group task
    returns ``n_out`` zero-copy sub-tables via ``num_returns``, so a
    downstream owner of one ``out_key`` range fetches exactly its rows.
    Returns ``grid[bucket][out]`` object refs (not a Dataset) -- one
    task wave and one plasma round trip fewer than exchanging into a
    Dataset and re-splitting it (measured: the separate split wave cost
    seconds of scheduling + full-table object churn per mining job)."""
    refs = ds.materialize().to_arrow_refs()
    if not refs:
        raise ValueError("static exchange over an empty dataset")
    grids = [
        _split_by_key.options(num_returns=n_parts).remote(r, key, n_parts)
        for r in refs
    ]
    if n_parts == 1:
        grids = [[g] for g in grids]
    fn_ref = ray.put(fn)
    out = [
        _apply_group_split.options(num_returns=n_out if n_out > 1 else 1).remote(
            fn_ref, empty_schema, out_key, n_out,
            *[grids[b][i] for b in range(len(grids))],
        )
        for i in range(n_parts)
    ]
    return [[g] if n_out == 1 else list(g) for g in out]
