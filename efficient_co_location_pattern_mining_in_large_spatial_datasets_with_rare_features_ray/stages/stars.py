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
nbr_ids). Feature columns are int16 CANONICAL RANKS (ctx.rank -- every
worker derives the same order from the broadcast feature-count map) and
id columns are int32 dictionary codes when the caller encoded instance
ids (mine() does; int64 when codes exceed 2^31, raw strings otherwise).
Compact fixed-width columns matter at scale: the star table is the
job's largest intermediate, and string feature labels tripled its bytes
through the mining exchange in round 2.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from ..canonical import FeatureContext
from ..config import MiningConfig

def _stable_bucket(keys, n_buckets: int) -> np.ndarray:
    """Deterministic cross-process hash bucket (pandas hash_array uses a
    fixed key; python's hash() is salted per process and must not be
    used). Integer keys take the vectorized int64 fast path."""
    arr = keys.to_numpy() if isinstance(keys, pd.Series) else np.asarray(keys)
    if not np.issubdtype(arr.dtype, np.integer):
        arr = np.asarray(arr, dtype=object)
    return (
        pd.util.hash_array(arr, categorize=False) % np.uint64(n_buckets)
    ).astype(np.int64)


def _rank_codes(col: pa.ChunkedArray | pa.Array, rank: dict) -> np.ndarray:
    """String feature column -> int16 canonical ranks via its dictionary
    (rank-maps only the distinct values, not every row)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    enc = arr.dictionary_encode()
    lut = np.array(
        [rank[v] for v in enc.dictionary.to_pylist()], np.int16
    ) if len(enc.dictionary) else np.empty(0, np.int16)
    return lut[enc.indices.to_numpy(zero_copy_only=False)]


def edge_table(t: pa.Table, rank: dict, n_buckets: int) -> pa.Table:
    """One pair block -> directed keyed edge rows:
    kind=0: star edge   (key=center, feat, other_feat=nbr feature, other=nbr id)
    kind=1: subtree hint (key=nbr, feat, other_feat=center feature)

    Features travel as int16 canonical ranks; the rank comparison IS the
    ordered-direction predicate (count asc, lex tie -- canonical.py)."""
    ra = _rank_codes(t["a_feature"], rank)
    rb = _rank_codes(t["b_feature"], rank)
    ia = t["a_id"].to_numpy(zero_copy_only=False)
    ib = t["b_id"].to_numpy(zero_copy_only=False)
    # ordered direction a->b (b in a's star): rank(a) < rank(b)
    a_keeps_b = ra < rb
    # pairs are cross-type so exactly one direction holds; emit center c,
    # neighbor o for the kept direction
    c_id = np.where(a_keeps_b, ia, ib)
    c_f = np.where(a_keeps_b, ra, rb).astype(np.int16)
    o_id = np.where(a_keeps_b, ib, ia)
    o_f = np.where(a_keeps_b, rb, ra).astype(np.int16)
    # sentinel matching the id dtype keeps the column int-typed
    # end-to-end when ids are dictionary codes (object-dtype mixing
    # measured as a major star-build cost)
    int_ids = np.issubdtype(np.asarray(ia).dtype, np.integer)
    fill = np.full(
        len(o_id), -1, dtype=c_id.dtype
    ) if int_ids else np.full(len(o_id), "", dtype=object)
    id_t = pa.from_numpy_dtype(c_id.dtype) if int_ids else pa.string()
    key = np.concatenate([c_id, o_id])
    return pa.table(
        {
            "key": pa.array(key, id_t),
            "feat": pa.array(np.concatenate([c_f, o_f]), pa.int16()),
            "other_feat": pa.array(np.concatenate([o_f, c_f]), pa.int16()),
            "other": pa.array(np.concatenate([o_id, fill]), id_t),
            "kind": pa.array(
                np.repeat(np.array([0, 1], np.int8), len(c_id)), pa.int8()
            ),
            "bucket": pa.array(_stable_bucket(key, n_buckets), pa.int64()),
        }
    )


def directed_keyed_edges(
    pairs: Dataset, ctx: FeatureContext, n_buckets: int
) -> Dataset:
    """Dataset wrapper over ``edge_table`` (Arrow-native blocks; the
    exchange slices them zero-copy)."""
    rank = dict(ctx.rank)
    return pairs.map_batches(
        lambda t: edge_table(t, rank, n_buckets), batch_format="pyarrow"
    )


def _build_bucket_stars(t: pa.Table) -> pa.Table:
    """Star + subtree-key construction for every instance whose key
    hashes into this bucket, exploded per subtree key.

    Fully vectorized: one lexsort defines the (key, feat, other_feat)
    neighbor-list runs, lists become an Arrow ListArray straight from
    run offsets, and the list x subtree explosion is a searchsorted run
    join -- no Python list objects anywhere (the round-2 pandas
    ``agg(list)`` + ``tolist()`` round-trip dominated the star stage).
    Features are int16 canonical ranks throughout; ids are emitted as
    int32 when they fit (dictionary codes always do below 2^31).
    Output rows are sorted by subtree rank, which lets the mining split
    stage slice blocks zero-copy instead of re-sorting. String ids
    (non-encoded callers) are factorized locally and decoded on output.
    """
    from ..mining_core import _range_gather

    kind = t["kind"].to_numpy(zero_copy_only=False)
    smask = kind == 0
    key_raw = t["key"].to_numpy(zero_copy_only=False)
    int_ids = np.issubdtype(key_raw.dtype, np.integer)
    if int_ids:
        key_all = key_raw.astype(np.int64, copy=False)
        other_all = (
            t["other"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        )
        id_uniq = None
    else:
        # local string-id interning; decoded back on output
        other_obj = t["other"].to_numpy(zero_copy_only=False)
        codes, id_uniq = pd.factorize(
            np.concatenate([key_raw, other_obj]), sort=False
        )
        key_all = codes[: len(key_raw)].astype(np.int64)
        other_all = codes[len(key_raw):].astype(np.int64)
    f_all = t["feat"].to_numpy(zero_copy_only=False).astype(np.int16, copy=False)
    of_all = (
        t["other_feat"].to_numpy(zero_copy_only=False).astype(np.int16, copy=False)
    )
    nf = int(max(f_all.max(initial=-1), of_all.max(initial=-1))) + 1

    key_s = key_all[smask]
    if int_ids:
        # fixed job-wide dtype (blocks must agree): the mining core
        # requires dense codes < 2^31 anyway (StarCSR packing guard)
        if max(key_all.max(initial=-1), other_all.max(initial=-1)) >= (1 << 31):
            raise ValueError(
                "instance id codes must be dense int32 (< 2^31); "
                "re-encode ids before building stars"
            )
        id_t = pa.int32()
    else:
        id_t = pa.string()
    schema = pa.schema(
        [
            ("subtree", pa.int16()),
            ("center_id", id_t),
            ("center_feature", pa.int16()),
            ("nbr_feature", pa.int16()),
            ("nbr_ids", pa.list_(id_t)),
        ]
    )
    if key_s.size == 0:
        return schema.empty_table()
    sf = f_all[smask].astype(np.int64)
    sof = of_all[smask].astype(np.int64)
    other_s = other_all[smask]
    hmask = ~smask
    hkey = key_all[hmask]
    hf = f_all[hmask].astype(np.int64)
    hof = of_all[hmask].astype(np.int64)

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
    # hint's center feature, deduped via packed (key * nf + rank) ints
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

    # order output by subtree rank so downstream splits need no sort
    out_order = np.argsort(sub_codes, kind="stable")
    rep = rep[out_order]
    sub_codes = sub_codes[out_order]

    if int_ids:
        np_id = np.int32 if id_t == pa.int32() else np.int64
        vals_arr = pa.array(v_o.astype(np_id, copy=False), id_t)
        center_arr = pa.array(lk[rep].astype(np_id, copy=False), id_t)
    else:
        vals_arr = pa.array(id_uniq[v_o], id_t)
        center_arr = pa.array(id_uniq[lk[rep]], id_t)
    lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), vals_arr)
    return pa.Table.from_arrays(
        [
            pa.array(sub_codes.astype(np.int16), pa.int16()),
            center_arr,
            pa.array(lf[rep].astype(np.int16), pa.int16()),
            pa.array(lof[rep].astype(np.int16), pa.int16()),
            lists.take(pa.array(rep)),
        ],
        schema=schema,
    )


def build_stars(
    pairs: Dataset, ctx: FeatureContext, cfg: MiningConfig
) -> Dataset:
    """Edges -> per-bucket star tables via the static split exchange
    (stages/exchange.py): ``groupby("bucket")`` is a sort-based shuffle
    whose boundary sampling degenerates on the small bucket key space --
    measured 90 s of shuffle machinery against ~9 s of real compute for
    this stage pair at 1.6M rows / 16 cpus."""
    from .exchange import static_group_exchange

    edges = directed_keyed_edges(pairs, ctx, cfg.star_buckets)
    return static_group_exchange(
        edges, "bucket", cfg.star_buckets, _build_bucket_stars
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
