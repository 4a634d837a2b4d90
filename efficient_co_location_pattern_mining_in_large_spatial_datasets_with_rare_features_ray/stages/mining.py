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

from ray.data import Dataset

from ..canonical import FeatureContext
from ..config import MiningConfig
from ..mining_core import mine_local

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


def _mine_group(
    batch: pa.Table, ctx: FeatureContext, min_prev: float, measure: str
) -> pa.Table:
    root = batch["subtree"][0].as_py()
    center_ids = batch["center_id"].to_numpy(zero_copy_only=False)
    center_feats = batch["center_feature"].to_numpy(zero_copy_only=False)
    nbr_feats = batch["nbr_feature"].to_numpy(zero_copy_only=False)
    nbr_col = batch["nbr_ids"].combine_chunks()
    if isinstance(nbr_col, pa.ChunkedArray):  # single chunk after combine
        nbr_col = nbr_col.chunk(0)
    offsets = nbr_col.offsets.to_numpy()
    flat_ids = nbr_col.values.to_numpy(zero_copy_only=False)

    # local integer ids over every instance mentioned: one C-speed
    # factorize, no per-element Python loop
    import pandas as pd

    codes, _ = pd.factorize(np.concatenate([center_ids, flat_ids]), sort=False)
    center_idx = codes[: len(center_ids)].astype(np.int64)
    flat_idx = codes[len(center_ids):].astype(np.int32)

    # neighbor lists are unique by construction (one row per (center,
    # nbr_feat) over the deduped pair set) -> slice views suffice
    index: dict[tuple[int, str], np.ndarray] = {}
    for r in range(len(center_ids)):
        lo, hi = offsets[r], offsets[r + 1]
        index[(int(center_idx[r]), nbr_feats[r])] = flat_idx[lo:hi]

    # T1 for the root: distinct root-feature centers present in this group
    root_centers = np.unique(center_idx[center_feats == root]).astype(np.int32)
    t1 = {root: root_centers}

    recs = mine_local(
        index, t1, ctx, min_prev, roots=[root], use_lemma3=False,
        measure=measure,
    )
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


def mine_subtrees(
    stars: Dataset, ctx: FeatureContext, cfg: MiningConfig
) -> Dataset:
    """stars -> prevalent-pattern table, mined independently per subtree.

    Partitioning note (SURVEY.md sec. 7.4): the rarest feature's subtree is
    the largest group; with many features the groups balance, with few
    features parallelism is bounded by the feature count. Hot-subtree
    salting (shard centers by hash + exact distinct-PR merge) is the
    documented scale path and a planned extension.
    """
    return stars.groupby("subtree").map_groups(
        lambda b: _mine_group(b, ctx, cfg.min_prevalence, cfg.measure),
        batch_format="pyarrow",
    )
