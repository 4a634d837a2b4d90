"""Joins over keyed tables, Ray-Data-first: broadcast equi-join for
small-dimension enrichment and an as-of join over keyed event logs.

The reference engine has no temporal joins (its tables are static
spatial instances); this operator belongs to the large-scale
training-data family the engine adds on top (clickstream feature
attachment, label as-of lookup, point-in-time joins for feature
stores).

Shape: for every LEFT row, attach the latest RIGHT row of the same key
with ``right.ts <= left.ts`` (ties on ts broken by the largest right
``tie`` column -- a deterministic total order). Implemented as ONE hash
shuffle: both sides are projected to a common tagged schema and
unioned, then ``groupby(key).map_groups`` co-groups them and a
vectorized ``searchsorted`` over the ts-sorted right side finds every
match at once. No driver materialization, no per-row Python.

Partitioning assumption (documented per the custom-operator contract):
all rows of ONE key must fit in a single task -- true for user-keyed
event logs (a user's history is bounded); a pathological hot key would
need the same salt-and-merge treatment the mining path's salted mode
applies (split the key, take per-salt partial maxima, merge the
per-salt winners with one more tiny shuffle).

Semantics are inner as-of: left rows with no matching right row are
dropped (the SQL restatement is a CROSS JOIN LATERAL ... LIMIT 1).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

_SIDE_LEFT = np.int8(0)
_SIDE_RIGHT = np.int8(1)

BROADCAST_SHARD_ROWS = 1_000_000  # dimension rows per broadcast shard


def broadcast_join(
    left: Dataset,
    small_right: Dataset,
    key: str,
    right_columns: list[str],
    right_key: str | None = None,
    max_per_shard: int = BROADCAST_SHARD_ROWS,
    how: str = "inner",
) -> Dataset:
    """Equi-join of a big Dataset against a SMALL dimension table
    (metadata enrichment: orders x customer, events x user profile) with
    NO shuffle of the big side — the most common pipeline step a
    groupby-based join would turn into a needless all-to-all exchange.

    The right side is collected once (contract: dimension-sized — fits
    the driver; the BIG side must be ``left``), sharded by key residue
    class into ``<= max_per_shard``-row plasma objects (``ray.put``
    once, same sharding scheme as dedup.shard_candidate_ids: no single
    all-rows object at any scale), and every left ``map_batches`` task
    probes only the shards its keys hit with one sorted searchsorted
    per shard. Plasma objects are fetched node-local once per worker,
    never re-shipped per batch.

    ``key`` may be integer- or STRING-typed (string keys probe by the
    stable 64-bit hash with an exact string-equality verify at matched
    positions — collisions can only cause a verified miss, never a
    false match; two right keys sharing a hash raise loudly at build)
    and must be UNIQUE on the right (dimension contract; duplicate
    right keys raise); ``right_key`` names the right side's key column
    when it differs (o_custkey vs c_custkey). ``how="inner"`` (default)
    drops left rows with no match; ``how="left"`` keeps them with real
    SQL NULLs in the right columns (Arrow null-masked arrays, no
    sentinels). Right columns are appended after the left columns; name
    collisions raise."""
    import ray as _ray

    if how not in ("inner", "left"):
        raise ValueError(f"broadcast_join how={how!r}")
    rk = right_key or key
    rt = small_right.select_columns([rk] + list(right_columns)).to_pandas()
    rkeys_raw = rt[rk].to_numpy()
    str_key = not np.issubdtype(rkeys_raw.dtype, np.integer)
    if str_key and rkeys_raw.dtype != object:
        # a float key column is usually an int key that picked up NULLs
        # on the way in (parquet promotes) — reject loudly rather than
        # join on float/object equality and mask the upstream data bug
        raise TypeError(
            f"broadcast_join key {key!r} must be integer- or "
            f"string-typed (right side is {rkeys_raw.dtype})"
        )
    if str_key:
        # probe on the stable hash; keep the strings for the verify
        rkeys = pd.util.hash_array(
            np.asarray(rkeys_raw, dtype=object), categorize=False
        ).view(np.int64)
    else:
        rkeys = rkeys_raw.astype(np.int64)
    if str_key and len(set(rkeys_raw)) != len(rkeys_raw):
        raise ValueError(
            f"duplicate right-side keys in broadcast_join on {key!r} "
            "(dimension contract: unique keys)"
        )
    order = np.argsort(rkeys, kind="stable")
    rkeys = rkeys[order]
    if len(rkeys) > 1 and (rkeys[1:] == rkeys[:-1]).any():
        raise ValueError(
            f"duplicate right-side keys in broadcast_join on {key!r} "
            + ("(64-bit hash collision among unique string keys)"
               if str_key else "(dimension contract: unique keys)")
        )
    shard_cols = list(right_columns)
    rvals = {c: rt[c].to_numpy()[order] for c in right_columns}
    if str_key:
        # the verify strings ride in the shards beside the payload
        rvals["__bj_key_str"] = np.asarray(rkeys_raw, dtype=object)[order]
        shard_cols.append("__bj_key_str")
    # tiny per-column type info for the probe closure (the probe must
    # NOT capture rkeys/rvals — only the shard refs)
    rdtypes = {c: rvals[c].dtype for c in right_columns}
    rtypes = {
        c: (pa.string() if rdtypes[c] == object
            else pa.from_numpy_dtype(rdtypes[c]))
        for c in right_columns
    }

    n_sh = max(1, -(-len(rkeys) // max_per_shard))
    mod = rkeys % np.int64(n_sh)
    shard_refs = []
    for s in range(n_sh):
        sel = mod == s  # residue slices of a sorted array stay sorted
        shard_refs.append(
            _ray.put(
                (
                    np.ascontiguousarray(rkeys[sel]),
                    {c: rvals[c][sel] for c in shard_cols},
                )
            )
        )

    def probe(t: pa.Table) -> pa.Table:
        for c in right_columns:
            if c in t.column_names:
                raise ValueError(f"column collision in broadcast_join: {c!r}")
        k_raw = t[key].to_numpy(zero_copy_only=False)
        if str_key:
            if k_raw.dtype != object:
                raise TypeError(
                    f"broadcast_join key dtype mismatch on {key!r}: "
                    f"left {k_raw.dtype} vs right string"
                )
            k = pd.util.hash_array(
                np.asarray(k_raw, dtype=object), categorize=False
            ).view(np.int64)
        elif not np.issubdtype(k_raw.dtype, np.integer):
            raise TypeError(
                f"broadcast_join key dtype mismatch on {key!r}: "
                f"left {k_raw.dtype} vs right integer"
            )
        else:
            k = k_raw.astype(np.int64)
        hit = np.zeros(len(k), bool)
        gather = np.zeros(len(k), np.int64)  # index into the hit shard
        shard_id = np.zeros(len(k), np.int32)
        km = k % np.int64(n_sh)
        shards = {}
        for s in np.unique(km):
            keys_s, vals_s = _ray.get(shard_refs[int(s)])
            shards[int(s)] = vals_s
            if not len(keys_s):
                continue
            sel = km == s
            d = k[sel]
            pos = np.minimum(np.searchsorted(keys_s, d), len(keys_s) - 1)
            ok = keys_s[pos] == d
            idx = np.flatnonzero(sel)
            hit[idx[ok]] = True
            gather[idx[ok]] = pos[ok]
            shard_id[idx[ok]] = s
        if str_key and hit.any():
            # exact verify: a hash match against a DIFFERENT string is a
            # collision-induced false hit — demote it to a miss (misses
            # impossible otherwise: build raised on right-side hash dups)
            hidx = np.flatnonzero(hit)
            ver = np.empty(len(hidx), object)
            hs, hg = shard_id[hidx], gather[hidx]
            for s in np.unique(hs):
                m = hs == s
                ver[m] = shards[int(s)]["__bj_key_str"][hg[m]]
            bad = np.asarray(k_raw, dtype=object)[hidx] != ver
            hit[hidx[bad]] = False
        if how == "inner":
            out = t.filter(pa.array(hit))
            h_gather = gather[hit]
            h_shard = shard_id[hit]
            null_mask = None
        else:
            # left join: every row survives; misses get Arrow nulls
            out = t
            h_gather = gather
            h_shard = shard_id
            null_mask = ~hit
        # gather only at HIT positions (a missed row's shard_id may name
        # a shard this task never fetched); misses sit under the null
        # mask in left mode and were filtered out in inner mode
        hit_rows = (
            np.flatnonzero(hit) if null_mask is not None
            else np.arange(out.num_rows, dtype=np.int64)
        )
        hs, hg = h_shard[hit_rows], h_gather[hit_rows]
        for c in right_columns:
            col = np.zeros(out.num_rows, dtype=rdtypes[c])
            for s in np.unique(hs):
                m = hs == s
                col[hit_rows[m]] = shards[int(s)][c][hg[m]]
            out = out.append_column(
                c, pa.array(col, type=rtypes[c], mask=null_mask)
            )
        return out

    return left.map_batches(probe, batch_format="pyarrow")


def _bloom_probe_positions(
    keys: np.ndarray, n_bits: int
) -> tuple[np.ndarray, np.ndarray]:
    """Two stable probe positions per key (the 64-bit hash's low and
    high halves mod the bitmap size — independent enough at the 2-probe
    false-positive rates this prefilter targets). Integer keys widen to
    int64 first: hash_array hashes the raw byte width, and the two join
    sides may carry the same key at different widths."""
    if np.issubdtype(keys.dtype, np.integer):
        keys = keys.astype(np.int64, copy=False)
    else:
        keys = np.asarray(keys, dtype=object)
    h = pd.util.hash_array(keys, categorize=False)
    m = np.uint64(n_bits)
    return (h % m).astype(np.int64), ((h >> np.uint64(32)) % m).astype(
        np.int64
    )


def _bloom_filter_left(
    left: Dataset, right: Dataset, key: str, rk: str, n_bits: int
) -> Dataset:
    """Build a Bloom bitmap of the right side's keys (per-batch packed
    partials OR'd on the driver) and drop left rows that provably have
    no match. 2 probes, no false negatives."""
    import ray as _ray

    n_words = -(-n_bits // 64)

    def partial(t: pa.Table) -> pa.Table:
        words = np.zeros(n_words, np.uint64)
        k = t[rk].to_numpy(zero_copy_only=False)
        if len(k):
            for pos in _bloom_probe_positions(k, n_bits):
                np.bitwise_or.at(
                    words, pos // 64,
                    np.uint64(1) << (pos % 64).astype(np.uint64),
                )
        return pa.table({"bloom": pa.array([words.tobytes()], pa.binary())})

    bitmap = np.zeros(n_words, np.uint64)
    for part in right.select_columns([rk]).map_batches(
        partial, batch_format="pyarrow"
    ).take_all():
        bitmap |= np.frombuffer(part["bloom"], np.uint64)
    ref = _ray.put(bitmap)

    def keep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        bm = _ray.get(ref)
        k = t[key].to_numpy(zero_copy_only=False)
        p1, p2 = _bloom_probe_positions(k, n_bits)
        one = np.uint64(1)
        hit = (
            (bm[p1 // 64] >> (p1 % 64).astype(np.uint64)) & one
        ).astype(bool) & (
            (bm[p2 // 64] >> (p2 % 64).astype(np.uint64)) & one
        ).astype(bool)
        return t.filter(pa.array(hit))

    return left.map_batches(keep, batch_format="pyarrow")


def hash_join(
    left: Dataset,
    right: Dataset,
    key: str,
    right_columns: list[str],
    right_key: str | None = None,
    n_buckets: int = 64,
    how: str = "inner",
    n_salt: int = 1,
    bloom_prefilter: bool = False,
    bloom_bits: int = 1 << 23,
) -> Dataset:
    """Equi-join of two LARGE Datasets — the shuffle counterpart of
    ``broadcast_join`` for when neither side is dimension-sized
    (fact x fact: lineitem x orders, events x labels).

    ``how`` selects the variant, all sharing the one exchange plan:

    * ``"inner"`` (default): matched pairs, many-to-many expansion.
    * ``"left"``: every left row survives; unmatched rows carry NULL
      right columns (SQL LEFT OUTER JOIN).
    * ``"semi"``: left rows with >= 1 match, LEFT COLUMNS ONLY, no
      expansion (SQL WHERE EXISTS) — ``right_columns`` may be empty.
    * ``"anti"``: left rows with 0 matches, left columns only
      (SQL WHERE NOT EXISTS).
    * ``"full"``: left-join output PLUS unmatched right rows with NULL
      left columns (SQL FULL OUTER JOIN). Include ``right_key`` in
      ``right_columns`` when the caller needs the right key visible on
      right-only rows (the left key column is NULL there).

    Both sides are hash-bucketed on the key (ONE static split exchange
    each — ``stages/exchange.static_cogroup_exchange`` — not Ray's
    sort-based groupby shuffle, whose boundary sampling degenerates on
    small key spaces) and every bucket task probes its left rows against
    its right rows with one sort + two searchsorteds + a range gather:
    fully vectorized many-to-many expansion, no per-row Python, no
    driver materialization of either side. Semi/anti move NO right
    payload columns through the exchange — only the key column ships.

    Partitioning assumption (custom-operator contract): one BUCKET (not
    one key) must fit in a task — with the default 64 buckets that is
    ~1/64th of each side, and ``n_buckets`` scales with input size. A
    pathological hot KEY still lands in one bucket; pass ``n_salt > 1``
    to split it: left rows round-robin across ``n_salt`` sub-buckets of
    their hash bucket (deterministic in-batch position, so a retried
    task reproduces its output) and right rows REPLICATE to all
    ``n_salt`` sub-buckets — every left row still meets every matching
    right row exactly once, per-task left volume shrinks ~n_salt x, and
    the cost is n_salt x replication of the (smaller) right side.
    Supported for inner/left/semi/anti; ``how="full"`` raises (its
    unmatched-RIGHT detection is per-bucket, and a replicated right row
    would be emitted once per salt).

    ``key`` may be integer-typed (crawl/warehouse fact keys) OR
    string-typed (urls, domains, source names): string keys bucket by
    the same stable hash and are dictionary-encoded per bucket against
    one sorted vocab, so the probe is the identical int searchsorted
    path with exact string equality (no hash false positives). Right
    keys may repeat (many-to-many expands). Right columns are appended
    after the left columns; collisions raise.

    ``bloom_prefilter=True`` (inner/semi only — the modes where an
    unmatched left row contributes nothing) drops left rows whose key
    is provably absent from the right side BEFORE the exchange: one
    extra pass over the right KEY column builds per-batch
    ``bloom_bits``-bit bitmap partials that OR together (driver sees
    blocks x bits/8 bytes, independent of key cardinality; the OR is a
    tree-reducible upgrade at extreme block counts), the bitmap is
    ``ray.put`` once, and every left batch tests 2 hash probes per row.
    No false negatives (a dropped row truly had no match); false
    positives just ride the exchange as before. The win: for a
    selective join (most left keys unmatched — log enrichment against
    a curated subset), the LEFT side's shuffle volume shrinks by the
    miss rate."""
    from ..mining_core import _range_gather
    from ..stages.exchange import static_cogroup_exchange
    from ..stages.stars import _stable_bucket

    if how not in ("inner", "left", "semi", "anti", "full"):
        raise ValueError(f"hash_join how={how!r}")
    n_salt = int(n_salt)
    if n_salt < 1:
        raise ValueError(f"hash_join n_salt={n_salt}")
    if n_salt > 1 and how == "full":
        raise ValueError(
            "hash_join n_salt > 1 is not supported for how='full': "
            "unmatched-right detection is per-bucket and replicated "
            "right rows would be emitted once per salt"
        )
    if bloom_prefilter and how not in ("inner", "semi"):
        raise ValueError(
            f"hash_join bloom_prefilter requires how='inner'/'semi' "
            f"(how={how!r} must keep unmatched left rows)"
        )
    if bloom_prefilter and int(bloom_bits) < 64:
        raise ValueError(f"hash_join bloom_bits={bloom_bits} (< 64)")
    if how in ("semi", "anti"):
        right_columns = []  # membership only: don't ship right payload
    rk = right_key or key
    right = right.select_columns(
        list(dict.fromkeys([rk] + list(right_columns)))
    )

    if bloom_prefilter:
        left = _bloom_filter_left(left, right, key, rk, int(bloom_bits))

    def add_bucket(col: str, replicate: bool):
        def fn(t: pa.Table) -> pa.Table:
            k = t[col].to_numpy(zero_copy_only=False)
            if not (
                np.issubdtype(k.dtype, np.integer) or k.dtype == object
            ):
                raise TypeError(
                    f"hash_join key {col!r} must be integer- or "
                    f"string-typed"
                )
            base = _stable_bucket(k, n_buckets)
            if n_salt == 1:
                bucket = base
            elif replicate:
                # right side: one copy per salt, so every left sub-bucket
                # of this hash bucket sees the full matching right set
                rep = np.repeat(
                    np.arange(t.num_rows, dtype=np.int64), n_salt
                )
                t = t.take(pa.array(rep))
                bucket = np.repeat(base, n_salt) * n_salt + np.tile(
                    np.arange(n_salt, dtype=np.int64), len(base)
                )
            else:
                # left side: round-robin by in-batch position — splits a
                # hot key evenly, deterministic per block (task retries
                # reproduce their output)
                bucket = base * n_salt + (
                    np.arange(len(base), dtype=np.int64) % n_salt
                )
            return t.append_column("__jb", pa.array(bucket, pa.int64()))
        return fn

    lb = left.map_batches(add_bucket(key, False), batch_format="pyarrow")
    rb = right.map_batches(add_bucket(rk, True), batch_format="pyarrow")

    def probe(tl: pa.Table, tr: pa.Table) -> pa.Table:
        tl = tl.drop_columns(["__jb"])
        tr = tr.drop_columns(["__jb"])
        for c in right_columns:
            if c in tl.column_names:
                raise ValueError(f"column collision in hash_join: {c!r}")
        lk_raw = tl[key].to_numpy(zero_copy_only=False)
        rk_raw = tr[rk].to_numpy(zero_copy_only=False)
        l_int = np.issubdtype(lk_raw.dtype, np.integer)
        r_int = np.issubdtype(rk_raw.dtype, np.integer)
        # dtype comes from the Arrow schema, so the check is reliable
        # even for a bucket whose slice of one side is zero rows
        if l_int != r_int:
            raise TypeError(
                f"hash_join key dtype mismatch: left {lk_raw.dtype} "
                f"vs right {rk_raw.dtype}"
            )
        if l_int:
            lk = lk_raw.astype(np.int64, copy=False)
            rkv = rk_raw.astype(np.int64, copy=False)
        else:
            # string keys: dictionary-encode WITHIN the bucket (both
            # sides against one sorted vocab) so the probe below stays
            # the same int searchsorted path — exact string equality,
            # no hash false positives
            vocab = np.unique(np.concatenate([lk_raw, rk_raw]))
            lk = np.searchsorted(vocab, lk_raw).astype(np.int64)
            rkv = np.searchsorted(vocab, rk_raw).astype(np.int64)
        order = np.argsort(rkv, kind="stable")  # stable: right row order
        rs = rkv[order]
        lo = np.searchsorted(rs, lk, "left")
        cnt = np.searchsorted(rs, lk, "right") - lo
        if how == "semi":
            return tl.filter(pa.array(cnt > 0))
        if how == "anti":
            return tl.filter(pa.array(cnt == 0))
        if how in ("left", "full"):
            # unmatched left rows survive once, with a NULL gather index
            # (Arrow take() maps null indices to null output values)
            cnt_out = np.maximum(cnt, 1)
            rep = np.repeat(np.arange(len(lk), dtype=np.int64), cnt_out)
            gather = order[_range_gather(lo, np.where(cnt > 0, cnt, 0))]
            matched = np.repeat(cnt > 0, cnt_out)
            full = np.zeros(len(rep), np.int64)
            full[matched] = gather
            idx = pa.array(full, pa.int64(), mask=~matched)
            out = tl.take(pa.array(rep))
            for c in right_columns:
                out = out.append_column(c, tr[c].combine_chunks().take(idx))
            if how == "full":
                # plus unmatched RIGHT rows (NULL left columns) — both
                # sides of the bucket are already local, so right-side
                # survival costs one extra searchsorted, no new exchange
                lks = np.sort(lk)
                r_unm = (
                    np.searchsorted(lks, rkv, "right")
                    - np.searchsorted(lks, rkv, "left")
                ) == 0
                m = int(r_unm.sum())
                if m:
                    nul = pa.array(
                        np.zeros(m, np.int64), pa.int64(),
                        mask=np.ones(m, bool),
                    )
                    extra = tl.take(nul)  # all-NULL left columns, typed
                    trm = tr.filter(pa.array(r_unm))
                    for c in right_columns:
                        extra = extra.append_column(
                            c, trm[c].combine_chunks()
                        )
                    out = pa.concat_tables([out, extra])
            return out
        rep = np.repeat(np.arange(len(lk), dtype=np.int64), cnt)
        gather = order[_range_gather(lo, cnt)]
        out = tl.take(pa.array(rep))
        for c in right_columns:
            out = out.append_column(c, tr[c].combine_chunks().take(pa.array(gather)))
        return out

    return static_cogroup_exchange(lb, rb, "__jb", n_buckets * n_salt, probe)


def asof_join(
    left: Dataset,
    right: Dataset,
    key: str = "user_id",
    ts: str = "ts",
    left_id: str = "event_id",
    right_value: str = "value",
    right_tie: str = "event_id",
) -> Dataset:
    """Inner as-of join of two keyed, timestamped Datasets.

    Output columns: ``left_id, key, ts, asof_ts, asof_value`` where
    (asof_ts, asof_value) come from the latest right row at-or-before
    the left row's ts for the same key.
    """

    def tag_left(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                key: df[key],
                ts: df[ts],
                "id": df[left_id].astype(np.int64),
                "val": np.zeros(len(df), np.float64),
                "side": np.full(len(df), _SIDE_LEFT),
            }
        )

    def tag_right(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                key: df[key],
                ts: df[ts],
                "id": df[right_tie].astype(np.int64),
                "val": df[right_value].astype(np.float64),
                "side": np.full(len(df), _SIDE_RIGHT),
            }
        )

    tagged = left.map_batches(tag_left, batch_format="pandas").union(
        right.map_batches(tag_right, batch_format="pandas")
    )

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        mask = df["side"].to_numpy() == _SIDE_RIGHT
        lf = df[~mask]
        rt = df[mask].sort_values([ts, "id"], kind="stable")
        out_cols = {
            left_id: np.empty(0, np.int64),
            key: lf[key].iloc[:0],
            ts: lf[ts].iloc[:0],
            "asof_ts": rt[ts].iloc[:0],
            "asof_value": np.empty(0, np.float64),
        }
        if len(lf) == 0 or len(rt) == 0:
            return pd.DataFrame(out_cols)
        rts = rt[ts].to_numpy()
        lts = lf[ts].to_numpy()
        # side="right" lands after every equal ts; -1 = the LAST right row
        # with ts <= left ts. rt is (ts, id)-sorted, so equal-ts ties
        # resolve to the largest id -- same total order as the SQL's
        # ORDER BY ts DESC, id DESC LIMIT 1.
        idx = np.searchsorted(rts, lts, side="right") - 1
        found = idx >= 0
        take = idx[found]
        return pd.DataFrame(
            {
                left_id: lf["id"].to_numpy(np.int64)[found],
                key: lf[key].to_numpy()[found],
                ts: lts[found],
                "asof_ts": rts[take],
                "asof_value": rt["val"].to_numpy(np.float64)[take],
            }
        )

    return tagged.groupby(key).map_groups(per_key, batch_format="pandas")


def range_join(
    points: Dataset,
    intervals: Dataset,
    value_col: str,
    lo_col: str,
    hi_col: str,
    interval_cols: list[str],
    n_tiles: int | None = None,
    max_tiles: int = 4096,
    bounds: tuple[float, float] | None = None,
) -> Dataset:
    """Inner range (interval) join of two LARGE Datasets on the non-equi
    predicate ``lo <= value <= hi`` (inclusive both ends, the SQL
    BETWEEN): every point row is paired with every interval row whose
    band contains its value. Stabbing windows over event streams,
    shipdate-in-order-window scans, price-band tagging -- the join shape
    an equi-join engine cannot express.

    Ray-Data-first plan (the 1-D analogue of the mining path's grid
    distance join, stages/grid.py): ONE small metadata aggregate
    computes the point domain ``[pmin, pmax]`` and the mean interval
    length; the domain splits into equi-width tiles (width ~= the mean
    interval length, so the average interval replicates to ~2 tiles and
    a tile's candidate prefix stays short); intervals flat-map-replicate
    to every tile they overlap, points route to exactly ONE tile, and a
    static co-group exchange (stages/exchange.py -- no sort-based
    shuffle, no boundary sampling) probes each tile with one argsort +
    one searchsorted + a range-gather: candidates per point are the
    lo-sorted prefix ``lo <= v``, then a vectorized ``hi >= v`` mask
    keeps true matches. A (point, interval) match meets in exactly one
    task -- the point's home tile -- so no pair dedup is needed.

    Partitioning assumptions (custom-operator contract):
    * one TILE must fit in a task (equi-width tiles; heavily skewed
      point values concentrate in one tile -- raise ``n_tiles`` or
      pre-scale the value like the salted mining mode salts hot roots);
    * probe work per tile is O(points x intervals-with-lo<=v), bounded
      by tile width ~= interval length; intervals much longer than the
      tile width only add replication (linear), never probe cost.

    ``value/lo/hi`` must be numeric (cast timestamps to int64 epoch
    units first). Intervals entirely outside the point domain are
    dropped at the replication step (they can match nothing). Interval
    columns are appended after the point columns; collisions raise.
    Pass ``bounds=(pmin, pmax)`` covering the point domain to skip the
    min/max pass over the (big) point side — the scale path when the
    domain is known (epoch range of a crawl, a fixed price scale);
    points outside supplied bounds are clamped into the edge tiles,
    which stays correct (only tile balance suffers)."""
    from ..stages.exchange import static_cogroup_exchange

    # NOTE: the interval-column collision check runs inside route_points
    # (task side). A driver-side points.schema() would force Ray Data to
    # execute the lazy pipeline with limit(1) just to learn the column
    # names — an extra execution wave, and the limit-triggered task
    # cancellation has been observed to trip a Ray core ref-count fatal
    # (reference_count.cc) that kills the whole driver process.

    # metadata passes as per-batch PARTIALS + a driver merge of one tiny
    # row per block (no shuffle, no sort -- Dataset.aggregate's generic
    # path costs a full exchange, ~10x this on small inputs)
    def _minmax_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"mn": pa.array([], pa.float64()),
                             "mx": pa.array([], pa.float64())})
        v = t[value_col].to_numpy(zero_copy_only=False)
        return pa.table({"mn": pa.array([float(np.min(v))]),
                         "mx": pa.array([float(np.max(v))])})

    def _len_partial(t: pa.Table) -> pa.Table:
        lo = t[lo_col].to_numpy(zero_copy_only=False).astype(np.float64)
        hi = t[hi_col].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({"s": pa.array([float(np.sum(hi - lo))]),
                         "n": pa.array([t.num_rows])})

    if bounds is not None:
        pmin, pmax = float(bounds[0]), float(bounds[1])
    else:
        parts = points.map_batches(
            _minmax_partial, batch_format="pyarrow"
        ).take_all()
        if not parts:
            raise ValueError("range_join: empty point side")
        pmin = min(p["mn"] for p in parts)
        pmax = max(p["mx"] for p in parts)
    span = pmax - pmin
    if n_tiles is None:
        lens = intervals.map_batches(
            _len_partial, batch_format="pyarrow"
        ).take_all()
        n_iv = sum(p["n"] for p in lens)
        ilen = (sum(p["s"] for p in lens) / n_iv) if n_iv else span
        width = max(float(ilen), span / max_tiles, 1e-300)
        n_tiles = max(1, min(max_tiles, int(span / width) + 1))
    n_tiles = int(n_tiles)
    w = span / n_tiles if span > 0 else 1.0

    def tile_of(v: np.ndarray) -> np.ndarray:
        t = np.floor((v - pmin) / w).astype(np.int64)
        return np.clip(t, 0, n_tiles - 1)

    def route_points(t: pa.Table) -> pa.Table:
        bad = [c for c in interval_cols if c in t.column_names]
        if bad:
            raise ValueError(f"column collision in range_join: {bad}")
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        return t.append_column("__tile", pa.array(tile_of(v), pa.int64()))

    def replicate_intervals(t: pa.Table) -> pa.Table:
        lo = t[lo_col].to_numpy(zero_copy_only=False).astype(np.float64)
        hi = t[hi_col].to_numpy(zero_copy_only=False).astype(np.float64)
        keep = (hi >= pmin) & (lo <= pmax) & (lo <= hi)
        t = t.filter(pa.array(keep))
        if t.num_rows == 0:
            return t.append_column("__tile", pa.array([], pa.int64()))
        t0 = tile_of(np.maximum(lo[keep], pmin))
        t1 = tile_of(np.minimum(hi[keep], pmax))
        cnt = t1 - t0 + 1
        from ..mining_core import _range_gather

        rep = np.repeat(np.arange(t.num_rows, dtype=np.int64), cnt)
        tiles = _range_gather(t0, cnt)  # t0[i] .. t1[i] per interval
        out = t.take(pa.array(rep))
        return out.append_column("__tile", pa.array(tiles, pa.int64()))

    pts = points.map_batches(route_points, batch_format="pyarrow")
    ivs = intervals.select_columns(
        list(dict.fromkeys([lo_col, hi_col, *interval_cols]))
    ).map_batches(replicate_intervals, batch_format="pyarrow")

    from ..mining_core import _range_gather

    def probe(tp: pa.Table, ti: pa.Table) -> pa.Table:
        tp = tp.drop_columns(["__tile"])
        ti = ti.drop_columns(["__tile"])
        v = tp[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        lo = ti[lo_col].to_numpy(zero_copy_only=False).astype(np.float64)
        hi = ti[hi_col].to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.argsort(lo, kind="stable")
        lo_s, hi_s = lo[order], hi[order]
        cnt = np.searchsorted(lo_s, v, side="right")
        rep = np.repeat(np.arange(len(v), dtype=np.int64), cnt)
        cand = _range_gather(np.zeros(len(v), np.int64), cnt)
        ok = hi_s[cand] >= v[rep]
        out = tp.take(pa.array(rep[ok]))
        gather = pa.array(order[cand[ok]])
        for c in interval_cols:
            out = out.append_column(c, ti[c].combine_chunks().take(gather))
        return out

    return static_cogroup_exchange(pts, ivs, "__tile", n_tiles, probe)
