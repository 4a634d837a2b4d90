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
        # sentinel matching the id dtype keeps the column int64 end-to-end
        # when ids are dictionary codes (object-dtype mixing measured as a
        # major star-build cost)
        fill = -1 if pd.api.types.is_integer_dtype(df["a_id"]) else ""
        hint = pd.DataFrame(
            {"key": o_id, "feat": o_f, "other_feat": c_f, "other": fill,
             "kind": np.int8(1)}
        )
        hint["other"] = hint["other"].astype(star["other"].dtype, copy=False)
        out = pd.concat([star, hint], ignore_index=True)
        out["bucket"] = _stable_bucket(out["key"], n_buckets)
        return out

    return pairs.map_batches(fn, batch_format="pandas")


def _build_bucket_stars(df: pd.DataFrame) -> pa.Table:
    """Star + subtree-key construction for every instance whose key
    hashes into this bucket, exploded per subtree key.

    Int-id fast path (the mine() pipeline always dictionary-encodes ids
    first): one lexsort defines the (key, feat, other_feat) neighbor-list
    runs, lists become an Arrow ListArray straight from run offsets, the
    list x subtree explosion is a searchsorted run join, and every
    feature string is gathered from the factorized dictionary with C++
    take -- no Python list objects anywhere (the round-2 pandas
    ``agg(list)`` + ``tolist()`` round-trip dominated the star stage).
    Output rows are sorted by subtree (lexicographic), which lets the
    mining split stage slice blocks zero-copy instead of re-sorting.
    """
    kind = df["kind"].to_numpy()
    int_ids = np.issubdtype(df["key"].to_numpy().dtype, np.integer)
    if int_ids:
        return _build_bucket_stars_int(df, kind)
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


def _build_bucket_stars_int(df: pd.DataFrame, kind: np.ndarray) -> pa.Table:
    """Int-id fast path of ``_build_bucket_stars`` (see its docstring)."""
    from ..mining_core import _range_gather

    smask = kind == 0
    key_all = df["key"].to_numpy(np.int64)
    fcodes, funiq = pd.factorize(
        pd.concat([df["feat"], df["other_feat"]], ignore_index=True),
        sort=False,
    )
    nf = len(funiq)
    n_all = len(df)
    f_codes = fcodes[:n_all].astype(np.int64)
    of_codes = fcodes[n_all:].astype(np.int64)

    key_s = key_all[smask]
    schema = pa.schema(
        [
            ("subtree", pa.string()),
            ("center_id", pa.int64()),
            ("center_feature", pa.string()),
            ("nbr_feature", pa.string()),
            ("nbr_ids", pa.list_(pa.int64())),
        ]
    )
    if key_s.size == 0:
        return schema.empty_table()
    sf = f_codes[smask]
    sof = of_codes[smask]
    other_s = df["other"].to_numpy()[smask].astype(np.int64, copy=False)
    hmask = ~smask
    hkey = key_all[hmask]
    hf = f_codes[hmask]
    hof = of_codes[hmask]

    # neighbor-list runs: one lexsort by (key, feat, other_feat)
    order = np.lexsort((sof, sf, key_s))
    k_o = key_s[order]
    f_o = sf[order]
    of_o = sof[order]
    v_o = other_s[order]
    if len(k_o) > 1:
        change = (
            (k_o[1:] != k_o[:-1]) | (f_o[1:] != f_o[:-1])
            | (of_o[1:] != of_o[:-1])
        )
        starts = np.concatenate([[0], np.flatnonzero(change) + 1])
    else:
        starts = np.zeros(1, np.int64)
    offsets = np.append(starts, len(k_o))
    lk = k_o[starts]
    lf = f_o[starts]
    lof = of_o[starts]

    # subtree keys per instance: own feature (star + hint rows) plus the
    # hint's center feature, deduped via packed (key * nf + code) ints
    st = np.unique(np.concatenate([lk * nf + lf, hkey * nf + hf,
                                   hkey * nf + hof]))
    st_key = st // nf
    st_code = st % nf

    # explode: every list run repeated once per subtree of its key
    # (both sides sorted by key -> a searchsorted run join)
    lo = np.searchsorted(st_key, lk, "left")
    hi = np.searchsorted(st_key, lk, "right")
    cnt = hi - lo
    rep = np.repeat(np.arange(len(lk), dtype=np.int64), cnt)
    sub_codes = st_code[_range_gather(lo, cnt)]

    # order output by subtree string rank so downstream splits need no sort
    rank = np.empty(nf, np.int64)
    rank[np.argsort(funiq.astype("U"))] = np.arange(nf)
    out_order = np.argsort(rank[sub_codes], kind="stable")
    rep = rep[out_order]
    sub_codes = sub_codes[out_order]

    fstr = pa.array([str(x) for x in funiq], pa.string())
    idx32 = pa.array(offsets, pa.int32())
    lists = pa.ListArray.from_arrays(idx32, pa.array(v_o, pa.int64()))
    return pa.Table.from_arrays(
        [
            fstr.take(pa.array(sub_codes)),
            pa.array(lk[rep], pa.int64()),
            fstr.take(pa.array(lf[rep])),
            fstr.take(pa.array(lof[rep])),
            lists.take(pa.array(rep)),
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
