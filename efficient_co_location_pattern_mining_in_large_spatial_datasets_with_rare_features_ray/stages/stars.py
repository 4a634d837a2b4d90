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
    used). Integer keys take the vectorized int64 fast path — WIDENED
    to int64 first, because hash_array hashes the raw byte width (int32
    -5 and int64 -5 hash differently), and a join's two sides may carry
    the same key at different widths."""
    arr = keys.to_numpy() if isinstance(keys, pd.Series) else np.asarray(keys)
    if np.issubdtype(arr.dtype, np.integer):
        arr = arr.astype(np.int64, copy=False)
    else:
        arr = np.asarray(arr, dtype=object)
    return (
        pd.util.hash_array(arr, categorize=False) % np.uint64(n_buckets)
    ).astype(np.int64)


def dict_take(s: pd.Series, mapping: dict) -> np.ndarray:
    """Vectorized dict lookup over a low-cardinality pandas column:
    factorize once per batch, map only the DISTINCT values through the
    Python dict, then one np.take for the rows — replaces the per-row
    Python-level ``Series.map(dict)`` in the hot pair stages. Raises
    KeyError on a value missing from ``mapping`` (louder than map's
    silent NaN)."""
    codes, uniq = pd.factorize(s.to_numpy(object), sort=False)
    lut = np.fromiter((mapping[u] for u in uniq), np.int64, len(uniq))
    return lut[codes]


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
    if int_ids and c_id.dtype != np.int32 and len(c_id):
        # dense dictionary codes are < 2^31 by job contract (the StarCSR
        # packing guard raises downstream otherwise): int32 halves the
        # edge exchange's id bytes — the largest shuffle of the mining
        # job. Value-checked so an (already-invalid) overflowing job
        # still reaches the clear downstream error instead of wrapping.
        if (
            min(c_id.min(), o_id.min()) >= 0
            and max(c_id.max(), o_id.max()) < (1 << 31)
        ):
            c_id = c_id.astype(np.int32)
            o_id = o_id.astype(np.int32)
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


def edge_key_segments(t: pa.Table, nf: int, n_codes: int) -> pa.Table:
    """One bucket's directed edges -> the mining path's COMPACT star
    format: rows ``(grp: int16, key: int64)`` where

        grp = subtree * (nf + 1) + nbr_feature_rank   (star entry)
        grp = subtree * (nf + 1) + nf                 (T1 entry: key = center)
        key = center_code * n_codes + neighbor_code

    sorted by grp (subtree-major), so the per-subtree split slices
    zero-copy and the miner's prep rebuilds each feature's CSR segment
    with one scatter + one in-place sort -- no per-row schema, no list
    arrays, no lexsort downstream. This is the same information as
    ``_build_bucket_stars``' row format (semantics: reference NR-tree
    construction, src/spatial_index.cpp:88-153) at ~10 bytes per
    neighbor entry with radix-friendly small-int grouping; measured to
    cut the mining phase's DRAM traffic enough to matter at 16
    concurrent workers (the row format's prep re-sort was 6x inflated
    under memory-bandwidth saturation). Requires int-coded ids
    (encode_and_scan upstream); the row format stays for the Dataset
    star queries and the sharded mode."""
    from ..mining_core import _range_gather

    kind = t["kind"].to_numpy(zero_copy_only=False)
    smask = kind == 0
    key_all = t["key"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    f_all = t["feat"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    of_all = (
        t["other_feat"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    )
    # grp max = nf*(nf+1)+nf; int16 covers <= 180 features, else widen
    # (every bucket derives the same nf, so block schemas agree)
    grp_t = pa.int16() if nf * (nf + 2) < (1 << 15) else pa.int32()
    grp_np = np.int16 if grp_t == pa.int16() else np.int32
    out_schema = pa.schema([("grp", grp_t), ("key", pa.int64())])
    key_s = key_all[smask]
    if key_s.size == 0:
        return out_schema.empty_table()
    other_s = (
        t["other"].to_numpy(zero_copy_only=False)[smask]
        .astype(np.int64, copy=False)
    )
    sf = f_all[smask]
    sof = of_all[smask]
    hkey = key_all[~smask]
    hf = f_all[~smask]
    hof = of_all[~smask]

    import os as _os
    import time as _time
    _tr = [] if _os.environ.get("CLPM_STAR_TIMING") else None
    if _tr is not None:
        import resource as _res
        _ru0 = _res.getrusage(_res.RUSAGE_SELF)
    _t0 = _time.perf_counter()

    def _mark(label):
        nonlocal _t0
        if _tr is not None:
            t1 = _time.perf_counter()
            _tr.append((label, t1 - _t0))
            _t0 = t1

    # subtree set per center: own feature plus every smaller-rank hint
    # partner feature (reference subtree membership, the kind=1 rows)
    st = np.unique(
        np.concatenate([key_s * nf + sf, hkey * nf + hf, hkey * nf + hof])
    )
    st_key = st // nf
    st_code = st % nf
    _mark("st_unique")

    # explode every star edge once per subtree of its center
    # (both sides sorted by center -> searchsorted run join)
    order = np.argsort(key_s)  # quicksort; stability irrelevant (rows unique)
    k_o = key_s[order]
    _mark("edge_sort")
    lo = np.searchsorted(st_key, k_o, "left")
    cnt = np.searchsorted(st_key, k_o, "right") - lo
    rep = np.repeat(np.arange(len(k_o), dtype=np.int64), cnt)
    sub = st_code[_range_gather(lo, cnt)]
    edge_keys = (k_o * n_codes + other_s[order])[rep]
    grp = sub * (nf + 1) + sof[order][rep]
    _mark("explode")

    # T1 entries: distinct centers per own-feature subtree (key = center)
    own = np.unique(key_s * np.int64(nf) + sf)
    t1_grp = (own % nf) * (nf + 1) + nf
    t1_keys = own // nf

    grp = np.concatenate([grp, t1_grp])
    keys = np.concatenate([edge_keys, t1_keys])
    _mark("t1")
    order2 = np.argsort(grp, kind="stable")  # radix: tiny int key space
    _mark("grp_sort")
    out = pa.Table.from_arrays(
        [
            pa.array(grp[order2].astype(grp_np), grp_t),
            pa.array(keys[order2], pa.int64()),
        ],
        schema=out_schema,
    )
    _mark("emit")
    if _tr is not None:
        _ru1 = _res.getrusage(_res.RUSAGE_SELF)
        print(
            "STARTIMING " + " ".join(f"{k}={v:.3f}" for k, v in _tr)
            + f" utime={_ru1.ru_utime - _ru0.ru_utime:.3f}"
            + f" stime={_ru1.ru_stime - _ru0.ru_stime:.3f}"
            + f" minflt={_ru1.ru_minflt - _ru0.ru_minflt}"
            + f" nivcsw={_ru1.ru_nivcsw - _ru0.ru_nivcsw}"
        )
    return out


def build_stars(
    pairs: Dataset, ctx: FeatureContext, cfg: MiningConfig
) -> Dataset:
    """Edges -> per-bucket star tables via the static split exchange
    (stages/exchange.py): ``groupby("bucket")`` is a sort-based shuffle
    whose boundary sampling degenerates on the small bucket key space --
    measured 90 s of shuffle machinery against ~9 s of real compute for
    this stage pair at 1.6M rows / 16 cpus."""
    from .exchange import static_group_exchange

    nb = cfg.resolved_star_buckets()
    edges = directed_keyed_edges(pairs, ctx, nb)
    return static_group_exchange(edges, "bucket", nb, _build_bucket_stars)


def ordered_edges(pairs: Dataset, ctx: FeatureContext) -> Dataset:
    """Directed star edges only (no subtree machinery): one row per
    ordered pair (center keeps nbr per src/neighborhood_mgr.cpp:20-30).
    Columns: center_id, center_feature, nbr_id, nbr_feature."""
    counts = dict(ctx.counts)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        ca = dict_take(df["a_feature"], counts)
        cb = dict_take(df["b_feature"], counts)
        a_keeps_b = (ca < cb) | (
            (ca == cb)
            & (df["a_feature"].to_numpy(object)
               <= df["b_feature"].to_numpy(object))
        )
        return pd.DataFrame(
            {
                "center_id": df["a_id"].where(a_keeps_b, df["b_id"]),
                "center_feature": df["a_feature"].where(a_keeps_b, df["b_feature"]),
                "nbr_id": df["b_id"].where(a_keeps_b, df["a_id"]),
                "nbr_feature": df["b_feature"].where(a_keeps_b, df["a_feature"]),
            }
        )

    return pairs.map_batches(fn, batch_format="pandas")
