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
