"""Grouped top-k (rank / window-function family).

The scale-correct shape: a PARTIAL top-k inside every block first (each
block can contribute at most k rows per group to the shuffle — the
combiner pattern), then one groupby.map_groups for the exact per-group
answer. The shuffle moves O(groups * k * blocks) rows instead of the
whole table, so a "top 3 documents per domain" over a crawl shuffles
candidate rows only.

Ties are broken deterministically by ``tie_col`` ascending so results
are independent of block structure and task order.
"""

from __future__ import annotations

import pandas as pd

from ray.data import Dataset


def grouped_topk(
    ds: Dataset,
    group_cols: list[str],
    order_col: str,
    k: int,
    tie_col: str,
    descending: bool = True,
) -> Dataset:
    """Top ``k`` rows per group by ``order_col`` (desc by default),
    ties by ``tie_col`` ascending."""
    by = [order_col, tie_col]
    asc = [not descending, True]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df
        return (
            df.sort_values(by, ascending=asc)
            # dropna=False: null group keys form their own group, like
            # SQL's PARTITION BY (Ray's groupby keeps them too)
            .groupby(group_cols, sort=False, dropna=False)
            .head(k)
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(by, ascending=asc).head(k)

    pruned = ds.map_batches(partial, batch_format="pandas")
    return pruned.groupby(group_cols).map_groups(final, batch_format="pandas")


def global_rank(
    ds: Dataset,
    order_col: str,
    tie_col: str,
    rank_col: str = "rank",
    n_buckets: int = 64,
    descending: bool = False,
) -> Dataset:
    """Global ROW_NUMBER() OVER (ORDER BY order_col [DESC], tie_col):
    every row gets its exact 1-based position in the total order,
    without any single task ever seeing the whole table.

    Plan — the classic distributed order-by:

    1. one tiny pass computes min/max of ``order_col`` (per-block
       partials, driver folds 2 numbers per block);
    2. rows are RANGE-partitioned by value into ``n_buckets`` contiguous
       buckets (``floor((x - min) / width)``, one map_batches);
    3. a second tiny pass counts rows per bucket (per-block bincount
       partials; the driver folds an ``n_buckets``-long vector) and
       exclusive-cumsums the counts into global bucket OFFSETS;
    4. one static group exchange sorts each bucket locally
       (argsort on (order, tie)) and writes
       ``rank = offset[bucket] + local position`` — exact, deterministic
       (ties broken by ``tie_col`` ascending), independent of block
       structure.

    Only the exchange moves data (once); the two stat passes move a few
    numbers per block. Partitioning assumption (custom-operator
    contract): one bucket fits in a task — buckets are VALUE ranges, so
    a heavily skewed distribution concentrates rows in few buckets;
    raise ``n_buckets`` (offsets stay driver-tiny) or pre-transform the
    value (log/quantile) for pathological skew."""
    import numpy as np
    import pyarrow as pa

    from ..stages.exchange import static_group_exchange

    p = ds.select_columns([order_col, tie_col]).materialize()

    def minmax(t: pa.Table) -> pd.DataFrame:
        x = t[order_col].to_numpy(zero_copy_only=False)
        if not len(x):
            return pd.DataFrame({"lo": [], "hi": []})
        return pd.DataFrame({"lo": [float(np.min(x))],
                             "hi": [float(np.max(x))]})

    mm = p.map_batches(minmax, batch_format="pyarrow").to_pandas()
    lo, hi = float(mm["lo"].min()), float(mm["hi"].max())
    width = (hi - lo) / n_buckets or 1.0  # constant column -> one bucket

    def assign(t: pa.Table) -> pa.Table:
        x = t[order_col].to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.clip(
            np.floor((x - lo) / width).astype(np.int64), 0, n_buckets - 1
        )
        if descending:
            b = (n_buckets - 1) - b
        return t.append_column("__rb", pa.array(b, pa.int64()))

    b = p.map_batches(assign, batch_format="pyarrow")

    def counts(t: pa.Table) -> pd.DataFrame:
        c = np.bincount(
            t["__rb"].to_numpy(zero_copy_only=False), minlength=n_buckets
        )
        return pd.DataFrame({"b": np.arange(n_buckets), "c": c})

    cnt = b.map_batches(counts, batch_format="pyarrow").to_pandas()
    per_bucket = (
        cnt.groupby("b", sort=True)["c"].sum().to_numpy(np.int64)
    )
    offsets = np.concatenate([[0], np.cumsum(per_bucket)[:-1]])

    def rank_bucket(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return t.drop_columns(["__rb"]).append_column(
                rank_col, pa.array([], pa.int64())
            )
        bucket = int(t["__rb"][0].as_py())
        x = t[order_col].to_numpy(zero_copy_only=False)
        tie = t[tie_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((tie, -x if descending else x))
        rank = np.empty(t.num_rows, np.int64)
        rank[order] = offsets[bucket] + 1 + np.arange(t.num_rows)
        return t.drop_columns(["__rb"]).append_column(
            rank_col, pa.array(rank, pa.int64())
        )

    return static_group_exchange(b, "__rb", n_buckets, rank_bucket)
