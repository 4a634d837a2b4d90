"""Ordered star neighborhoods + subtree replication keys (paper Alg. 2).

Second shuffle. Replaces the reference's O(pairs x stars) linear-scan
star builder (src/neighborhood_mgr.cpp:42-87) and its pointer NR-tree
(src/NRTree.cpp:15-77) with:

1. a stateless vectorized ``map_batches`` that emits, per undirected
   pair, the ordered directed edge(s) (``is_ordered`` of
   src/neighborhood_mgr.cpp:20-30) *twice* -- once keyed by the edge's
   center (its star entry) and once keyed by the neighbor (a *subtree
   hint*: the neighbor must be replicated into the center-feature's
   subtree, paper Alg. 2's Reduce split);
2. a ``groupby(bucket)`` over a stable hash of the key instance --
   NOT per-instance groups: each bucket holds many instances and the
   star/list building inside is vectorized pandas, so group overhead is
   O(buckets), not O(instances);
3. per instance: star rows exploded once per subtree key
   (``subtree_feature``), giving the mining shuffle its partition key.

Output schema: (subtree, center_id, center_feature, nbr_feature,
nbr_ids) -- id columns are int64 dictionary codes when the caller
encoded instance ids (mine() does), else raw strings.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from ..canonical import FeatureContext
from ..config import MiningConfig

def _stable_bucket(keys: pd.Series, n_buckets: int) -> np.ndarray:
    """Deterministic cross-process hash bucket (pandas hash_array uses a
    fixed key; python's hash() is salted per process and must not be
    used). Integer keys take the vectorized int64 fast path."""
    arr = keys.to_numpy()
    if not np.issubdtype(arr.dtype, np.integer):
        arr = keys.to_numpy(dtype=object)
    return (
        pd.util.hash_array(arr, categorize=False) % np.uint64(n_buckets)
    ).astype(np.int64)


def directed_keyed_edges(
    pairs: Dataset, ctx: FeatureContext, n_buckets: int
) -> Dataset:
    """pairs -> rows keyed by the instance the row informs:
    kind=0: star edge   (key=center, feat, other_feat=nbr feature, other=nbr id)
    kind=1: subtree hint (key=nbr, feat, other_feat=center feature)"""
    counts = dict(ctx.counts)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        ca = df["a_feature"].map(counts)
        cb = df["b_feature"].map(counts)
        # ordered direction a->b (b in a's star): count(a)<count(b), lex tie
        a_keeps_b = (ca < cb) | ((ca == cb) & (df["a_feature"] <= df["b_feature"]))
        # pairs are cross-type so exactly one direction holds; emit center c,
        # neighbor o for the kept direction
        c_id = df["a_id"].where(a_keeps_b, df["b_id"])
        c_f = df["a_feature"].where(a_keeps_b, df["b_feature"])
        o_id = df["b_id"].where(a_keeps_b, df["a_id"])
        o_f = df["b_feature"].where(a_keeps_b, df["a_feature"])
        star = pd.DataFrame(
            {"key": c_id, "feat": c_f, "other_feat": o_f, "other": o_id,
             "kind": np.int8(0)}
        )
        hint = pd.DataFrame(
            {"key": o_id, "feat": o_f, "other_feat": c_f, "other": "",
             "kind": np.int8(1)}
        )
        out = pd.concat([star, hint], ignore_index=True)
        out["bucket"] = _stable_bucket(out["key"], n_buckets)
        return out

    return pairs.map_batches(fn, batch_format="pandas")


def _build_bucket_stars(df: pd.DataFrame) -> pa.Table:
    """Vectorized star + subtree-key construction for every instance whose
    key hashes into this bucket, exploded per subtree key."""
    star = df[df["kind"] == 0]
    hint = df[df["kind"] == 1]

    # star lists per (key, feat, other_feat)
    lists = (
        star.groupby(["key", "feat", "other_feat"], sort=False)["other"]
        .agg(list)
        .reset_index()
    )
    # subtree keys per instance = own feature + distinct hint features
    own = pd.concat(
        [
            star[["key", "feat"]].drop_duplicates(),
            hint[["key", "feat"]].drop_duplicates(),
        ]
    ).drop_duplicates()
    own = own.rename(columns={"feat": "subtree_feat"})
    own["subtree"] = own["subtree_feat"]
    extra = hint[["key", "other_feat"]].drop_duplicates()
    extra = extra.rename(columns={"other_feat": "subtree"})
    subtrees = pd.concat(
        [own[["key", "subtree"]], extra[["key", "subtree"]]]
    ).drop_duplicates()

    # explode: star rows x subtree keys (inner join on key). Id dtype
    # follows the input: int64 dictionary codes (mine() encodes ids
    # first) or raw strings.
    out = lists.merge(subtrees, on="key", how="inner")
    int_ids = np.issubdtype(df["key"].to_numpy().dtype, np.integer)
    id_t = pa.int64() if int_ids else pa.string()
    schema = pa.schema(
        [
            ("subtree", pa.string()),
            ("center_id", id_t),
            ("center_feature", pa.string()),
            ("nbr_feature", pa.string()),
            ("nbr_ids", pa.list_(id_t)),
        ]
    )
    if out.empty:
        return schema.empty_table()
    return pa.Table.from_arrays(
        [
            pa.array(out["subtree"], type=pa.string()),
            pa.array(out["key"], type=id_t),
            pa.array(out["feat"], type=pa.string()),
            pa.array(out["other_feat"], type=pa.string()),
            pa.array(out["other"].tolist(), type=pa.list_(id_t)),
        ],
        schema=schema,
    )


def build_stars(
    pairs: Dataset, ctx: FeatureContext, cfg: MiningConfig
) -> Dataset:
    edges = directed_keyed_edges(pairs, ctx, cfg.star_buckets)
    return edges.groupby("bucket").map_groups(
        _build_bucket_stars, batch_format="pandas"
    )


def ordered_edges(pairs: Dataset, ctx: FeatureContext) -> Dataset:
    """Directed star edges only (no subtree machinery): one row per
    ordered pair (center keeps nbr per src/neighborhood_mgr.cpp:20-30).
    Columns: center_id, center_feature, nbr_id, nbr_feature."""
    counts = dict(ctx.counts)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        ca = df["a_feature"].map(counts)
        cb = df["b_feature"].map(counts)
        a_keeps_b = (ca < cb) | ((ca == cb) & (df["a_feature"] <= df["b_feature"]))
        return pd.DataFrame(
            {
                "center_id": df["a_id"].where(a_keeps_b, df["b_id"]),
                "center_feature": df["a_feature"].where(a_keeps_b, df["b_feature"]),
                "nbr_id": df["b_id"].where(a_keeps_b, df["a_id"]),
                "nbr_feature": df["b_feature"].where(a_keeps_b, df["a_feature"]),
            }
        )

    return pairs.map_batches(fn, batch_format="pandas")
