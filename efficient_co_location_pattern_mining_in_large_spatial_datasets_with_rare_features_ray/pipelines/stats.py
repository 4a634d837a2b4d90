"""Distributed descriptive statistics: fixed-width histograms (binned
aggregates) over numeric columns.

The reference engine has no statistics operators (its aggregates are the
mining measures); this family belongs to the large-scale training-data
additions (feature/label distribution audits, length histograms before
tokenizer budgeting, score binning for quality-threshold sweeps).

Shape: MERGEABLE partial aggregation — every ``map_batches`` task folds
its batch into at most ``n_bins`` partial rows (one np.add.at pass, no
Python loop), so only ``blocks x n_bins`` tiny rows ever move; the final
combine is a driver-side groupby over that bounded frame. No shuffle is
spent: a histogram at 100 TB still ships kilobytes per block, because
the partial size depends on the BIN space, not the row count. (Contract:
``bin_width`` must keep the bin space bounded — a width that yields
millions of bins should be pre-bucketed coarser first.)

Bin rule: ``bin = floor(x / bin_width)`` as one IEEE double division +
floor — bit-identical to the SQL restatement ``FLOOR(x / w)``, so the
oracle hash-matches without tolerance.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ray.data import Dataset


def histogram(
    ds: Dataset,
    col: str,
    bin_width: float,
    weight_col: str | None = None,
) -> pd.DataFrame:
    """Fixed-width histogram of ``ds[col]``: one row per occupied bin
    with ``bin`` (= floor(value / bin_width)), ``n`` (row count) and —
    when ``weight_col`` is given — ``wsum`` (sum of the weight column
    per bin; exact when weights are integral, as quantity-like columns
    are).

    Returns a small pandas frame (<= n_bins rows) sorted by bin; the
    heavy pass is fully distributed (see module docstring)."""
    if bin_width <= 0:
        raise ValueError(f"histogram bin_width must be > 0, got {bin_width}")
    cols = [col] + ([weight_col] if weight_col else [])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = df[col].to_numpy(np.float64)
        bins = np.floor(x / bin_width).astype(np.int64)
        uniq, inv = np.unique(bins, return_inverse=True)
        n = np.zeros(len(uniq), np.int64)
        np.add.at(n, inv, 1)
        out = {"bin": uniq, "n": n}
        if weight_col:
            w = np.zeros(len(uniq), np.float64)
            np.add.at(w, inv, df[weight_col].to_numpy(np.float64))
            out["wsum"] = w
        return pd.DataFrame(out)

    parts = ds.select_columns(cols).map_batches(
        partial, batch_format="pandas"
    ).to_pandas()  # bounded: blocks x n_bins partial rows
    agg = {"n": ("n", "sum")}
    if weight_col:
        agg["wsum"] = ("wsum", "sum")
    g = parts.groupby("bin", sort=True).agg(**agg).reset_index()
    g["n"] = g["n"].astype(np.int64)
    return g
