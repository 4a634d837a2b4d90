"""Size-2 pattern metrics as a pure Dataset aggregation.

Computes, for every feature pair with at least one qualifying neighbor
pair, the full size-2 prevalence metrics (n_rows, per-slot distinct
participants, PI, WPI) -- SQL-expressible, so this pipeline has an exact
DuckDB oracle in the driver correctness gate. Semantics per
src/utils.cpp:147-193 (PR), src/miner.cpp:382-430 (WPI select).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from ..canonical import FeatureContext
from ..config import MiningConfig
from ..stages.pairs import neighbor_pairs

K2_SCHEMA = pa.schema(
    [
        ("pattern", pa.string()),
        ("k", pa.int32()),
        ("n_rows", pa.int64()),
        ("pi", pa.float64()),
        ("wpi", pa.float64()),
    ]
)


def k2_metrics(
    instances: Dataset, cfg: MiningConfig, ctx: FeatureContext
) -> pa.Table:
    """All size-2 patterns with exact metrics (not thresholded --
    thresholding is a trivial filter and keeping all rows makes the
    oracle comparison robust to borderline float flips)."""
    pairs = neighbor_pairs(instances, cfg)
    counts = dict(ctx.counts)

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        ca = df["a_feature"].map(counts)
        cb = df["b_feature"].map(counts)
        a_first = (ca < cb) | ((ca == cb) & (df["a_feature"] <= df["b_feature"]))
        return pd.DataFrame(
            {
                "f1": df["a_feature"].where(a_first, df["b_feature"]),
                "f2": df["b_feature"].where(a_first, df["a_feature"]),
                "id1": df["a_id"].where(a_first, df["b_id"]),
                "id2": df["b_id"].where(a_first, df["a_id"]),
            }
        )

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "f1": [df["f1"].iloc[0]],
                "f2": [df["f2"].iloc[0]],
                "n_rows": [len(df)],
                "d1": [df["id1"].nunique()],
                "d2": [df["id2"].nunique()],
            }
        )

    rows = (
        pairs.map_batches(canon, batch_format="pandas")
        .groupby(["f1", "f2"])
        .map_groups(agg, batch_format="pandas")
        .take_all()
    )
    out = {k: [] for k in K2_SCHEMA.names}
    for r in sorted(rows, key=lambda r: (r["f1"], r["f2"])):
        pat = (r["f1"], r["f2"])
        pr1 = r["d1"] / counts[r["f1"]]
        pr2 = r["d2"] / counts[r["f2"]]
        w1 = ctx.wpr_weight(r["f1"], pat)
        w2 = ctx.wpr_weight(r["f2"], pat)
        out["pattern"].append(",".join(pat))
        out["k"].append(2)
        out["n_rows"].append(int(r["n_rows"]))
        out["pi"].append(float(np.round(min(pr1, pr2), 9)))
        out["wpi"].append(float(np.round(min(pr1 * w1, pr2 * w2), 9)))
    return pa.table(out, schema=K2_SCHEMA)
