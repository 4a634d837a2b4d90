"""Root-instance-sharded (salted) mining -- the skew-free scale path.

The subtree decomposition (stages/mining.py) partitions by the rarest
feature, so its largest group is data-dependent (SURVEY.md sec. 7.4: the
rarest feature's subtree dominates; with very few features -- e.g. 5
event types -- parallelism is capped at the feature count). This module
removes both limits by *salting on the root instance*:

* every row instance I of any pattern has a root o1 = I[0]; rows with
  different roots never interact during expansion (genTableInstance only
  consults stars of I's members, all of which are ordered neighbors of
  o1 -- src/miner.cpp:312-379);
* therefore shard key = stable_hash(o1) % n_shards balances perfectly
  for ANY feature distribution;
* star(o) is replicated to shard(o) (o as root) and to shard(c) for
  every ordered in-neighbor c of o (o as member of a row rooted at c) --
  the exact analogue of the subtree-hint replication of paper Alg. 2;
* prevalence (PR distinct counts) is global, so shards cannot threshold
  locally: a driver-coordinated level loop aggregates per-(pattern,
  slot) distinct participants across shards each level, then broadcasts
  P_k. The sync also restores FULL serial parity: Lemma 3
  (src/miner.cpp:185-205) is exact here because the driver holds every
  PI of the previous level (the per-subtree mode must disable it).

Shard inputs are written as one parquet directory per shard -- that
checkpoint is the resume point (state/checkpoint.py) and the actor
load path.

The whole path is INT-NATIVE: instance ids are dictionary-encoded once
into dense global int64 codes (``encode_instance_ids``, a sort-rank
pass), so stars ship ``list<int64>`` instead of strings, shard hashing
and the per-level distinct-participant exchange are vectorized int64
ops, and reducers dedupe a single packed (key<<32 | id) int64 array
with one ``np.unique``. The in-actor arrays use int32 (codes are dense,
so this holds to 2^31 instances; widen to int64 beyond that).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset

from ..canonical import FeatureContext, select_metrics
from ..functions.dedup import _concat_aranges
from ..mining_core import expand_tables, gen_candidates
from .stars import _stable_bucket

SHARD_STAR_SCHEMA = pa.schema(
    [
        ("shard", pa.int32()),
        ("center_id", pa.int64()),
        ("center_feature", pa.string()),
        ("nbr_feature", pa.string()),
        ("nbr_ids", pa.list_(pa.int64())),
    ]
)


def shard_of(ids: pd.Series | np.ndarray, n_shards: int) -> np.ndarray:
    arr = ids.to_numpy() if isinstance(ids, pd.Series) else ids
    if not np.issubdtype(arr.dtype, np.integer):
        arr = np.asarray(arr, dtype=object)
    return (
        pd.util.hash_array(arr, categorize=False) % np.uint64(n_shards)
    ).astype(np.int32)


def materialized_blocks(ds) -> list[tuple]:
    """(block ref, num_rows) pairs of a materialized Dataset, taken from
    the executor's own block metadata -- no per-block row-count task
    wave (that wave was one extra scheduling round trip of fixed cost on
    every mining job). Blocks are raw (Arrow on every path this engine
    builds; consumers convert defensively)."""
    mat = ds.materialize()
    out: list[tuple] = []
    for bundle in mat.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            out.append((ref, meta.num_rows))
    if any(n is None for _, n in out):  # metadata gap: count with tasks

        @ray.remote
        def _nrows(t) -> int:
            return len(t) if not hasattr(t, "num_rows") else t.num_rows

        ns = ray.get([_nrows.remote(r) for r, n in out if n is None])
        it = iter(ns)
        out = [(r, n if n is not None else next(it)) for r, n in out]
    return out


def encode_and_scan(instances) -> tuple["Dataset", dict, tuple[float, float]]:
    """``encode_instance_ids`` fused with the metadata scan: ONE pass
    over the materialized source blocks assigns positional int64 codes
    AND computes the per-block feature counts + (min x, min y) partials
    (num_returns=2 per block). Saves a whole Dataset job per mining run
    -- the separate scan_metadata pass was ~2-5 s of fixed overhead on
    jobs whose parallel work is tens of seconds. Block row counts come
    from executor metadata (materialized_blocks), not a task wave."""

    @ray.remote(num_returns=2)
    def _code_and_scan(t, offset: int):
        import pyarrow.compute as pc

        if isinstance(t, pd.DataFrame):  # defensive: pandas block
            t = pa.Table.from_pandas(t, preserve_index=False)
        cols = {
            "instance_id": pa.array(
                np.arange(offset, offset + t.num_rows, dtype=np.int64),
                pa.int64(),
            )
        }
        for name in t.column_names:
            if name != "instance_id":
                cols[name] = t[name]
        coded = pa.table(cols)
        if t.num_rows:
            vc = t["feature"].combine_chunks().value_counts()
            counts = dict(zip(
                vc.field("values").to_pylist(),
                vc.field("counts").to_pylist(),
            ))
            meta = (counts, pc.min(t["x"]).as_py(), pc.min(t["y"]).as_py())
        else:
            meta = ({}, None, None)
        return coded, meta

    blocks = materialized_blocks(instances)
    offsets = np.concatenate([[0], np.cumsum([n for _, n in blocks])])
    coded, metas = [], []
    for (r, _), o in zip(blocks, offsets[:-1]):
        c, m = _code_and_scan.remote(r, int(o))
        coded.append(c)
        metas.append(m)
    counts: dict[str, int] = {}
    ox, oy = float("inf"), float("inf")
    for cts, mx, my in ray.get(metas):
        for f, n in cts.items():
            counts[f] = counts.get(f, 0) + int(n)
        if mx is not None:
            ox = min(ox, mx)
            oy = min(oy, my)
    import ray.data as _rd

    return _rd.from_arrow_refs(coded), counts, (ox, oy)


def encode_instance_ids(instances) -> "Dataset":
    """Dictionary-encode instance_id to dense global int64 codes: block
    b's rows get codes block_offset(b) + arange (one materialize + a
    map per block, NO shuffle -- any global bijection works because the
    codes are the ONLY instance identity the mining paths ever touch;
    patterns carry no instance ids, so nothing is decoded back and
    nothing outside one job ever compares codes). Input rows are assumed
    id-unique (reference semantics), which makes position a bijection.
    The materialized coded blocks also serve the metadata scan and the
    pair join, so the source is read exactly once per job."""

    @ray.remote
    def _code_block(t, offset: int) -> pa.Table:
        if isinstance(t, pd.DataFrame):  # defensive: pandas block
            t = pa.Table.from_pandas(t, preserve_index=False)
        cols = {
            "instance_id": pa.array(
                np.arange(offset, offset + t.num_rows, dtype=np.int64),
                pa.int64(),
            )
        }
        for name in t.column_names:
            if name != "instance_id":
                cols[name] = t[name]
        return pa.table(cols)

    blocks = materialized_blocks(instances)
    offsets = np.concatenate([[0], np.cumsum([n for _, n in blocks])])
    coded = [
        _code_block.remote(r, int(o))
        for (r, _), o in zip(blocks, offsets[:-1])
    ]
    import ray.data as _rd

    return _rd.from_arrow_refs(coded)


def directed_keyed_edges_sharded(
    pairs: Dataset, ctx: FeatureContext, n_buckets: int
) -> Dataset:
    """Like stars.directed_keyed_edges but the subtree hint carries the
    in-neighbor center ID (needed to compute its shard)."""
    counts = dict(ctx.counts)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        from .stars import dict_take

        ca = dict_take(df["a_feature"], counts)
        cb = dict_take(df["b_feature"], counts)
        a_keeps_b = (ca < cb) | (
            (ca == cb)
            & (df["a_feature"].to_numpy(object)
               <= df["b_feature"].to_numpy(object))
        )
        c_id = df["a_id"].where(a_keeps_b, df["b_id"])
        c_f = df["a_feature"].where(a_keeps_b, df["b_feature"])
        o_id = df["b_id"].where(a_keeps_b, df["a_id"])
        o_f = df["b_feature"].where(a_keeps_b, df["a_feature"])
        star = pd.DataFrame(
            {"key": c_id, "feat": c_f, "other_feat": o_f, "other": o_id,
             "kind": np.int8(0)}
        )
        hint = pd.DataFrame(
            {"key": o_id, "feat": o_f, "other_feat": c_f, "other": c_id,
             "kind": np.int8(1)}
        )
        out = pd.concat([star, hint], ignore_index=True)
        out["bucket"] = _stable_bucket(out["key"], n_buckets)
        return out

    return pairs.map_batches(fn, batch_format="pandas")


def _per_bucket_shard_stars(ctx: FeatureContext, n_shards: int):
    """Group function for the star-bucket exchange: star lists + target
    shards for one bucket's directed edges (SHARD_STAR_SCHEMA rows).
    Fully vectorized: lexsort -> run boundaries -> one ListArray (the
    round-2..4 ``groupby(...).agg(list)`` built a Python list PER STAR
    -- the largest single cost of the salted prep at bench scale), and
    the per-key shard replication is a searchsorted + repeat gather."""

    def per_bucket(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        star = df[df["kind"] == 0]
        if not len(star):
            return SHARD_STAR_SCHEMA.empty_table()
        hint = df[df["kind"] == 1]
        key = star["key"].to_numpy(np.int64)
        oth = star["other"].to_numpy(np.int64)
        fcode, funiq = pd.factorize(star["feat"].to_numpy(object), sort=False)
        ocode, ouniq = pd.factorize(
            star["other_feat"].to_numpy(object), sort=False
        )
        order = np.lexsort((ocode, fcode, key))
        key, oth = key[order], oth[order]
        fcode, ocode = fcode[order], ocode[order]
        # run = one (key, feat, other_feat) star list
        chg = (
            (key[1:] != key[:-1])
            | (fcode[1:] != fcode[:-1])
            | (ocode[1:] != ocode[:-1])
        )
        starts = np.concatenate(([0], np.flatnonzero(chg) + 1))
        n_runs = len(starts)
        run_key = key[starts]
        run_f = fcode[starts]
        run_o = ocode[starts]
        lists = pa.ListArray.from_arrays(
            pa.array(np.append(starts, len(key)).astype(np.int32)),
            pa.array(oth, pa.int64()),
        )
        # target shards per key: own shard + shards of in-neighbor
        # centers, deduped via one unique over packed (key, shard)
        own_keys = np.unique(run_key)
        tk_parts = [own_keys]
        ts_parts = [shard_of(own_keys, n_shards).astype(np.int64)]
        if len(hint):
            hk = hint["key"].to_numpy(np.int64)
            tk_parts.append(hk)
            ts_parts.append(
                shard_of(hint["other"].to_numpy(np.int64), n_shards)
                .astype(np.int64)
            )
        packed = np.unique(
            np.concatenate(tk_parts) * np.int64(n_shards)
            + np.concatenate(ts_parts)
        )
        tkeys = packed // n_shards
        tshard = (packed % n_shards).astype(np.int32)
        # keep only targets whose key has star runs in this bucket
        # (a hint key with no star rows here contributes nothing)
        pos = np.searchsorted(own_keys, tkeys)
        pos = np.minimum(pos, len(own_keys) - 1)
        ok = own_keys[pos] == tkeys
        tkeys, tshard = tkeys[ok], tshard[ok]
        if not len(tkeys):
            return SHARD_STAR_SCHEMA.empty_table()
        # replicate each key's runs once per target shard: runs are
        # key-contiguous, so a searchsorted pair gives each target its
        # run range, expanded by one repeat + concatenated aranges
        run_lo = np.searchsorted(run_key, tkeys, side="left")
        run_hi = np.searchsorted(run_key, tkeys, side="right")
        cnt = run_hi - run_lo
        idx = np.repeat(run_lo, cnt) + _concat_aranges(cnt)
        out_shard = np.repeat(tshard, cnt)
        fdict = pa.array(np.asarray(funiq, object), pa.string())
        odict = pa.array(np.asarray(ouniq, object), pa.string())
        take = pa.array(idx.astype(np.int64))
        return pa.Table.from_arrays(
            [
                pa.array(out_shard, pa.int32()),
                pa.array(run_key[idx], pa.int64()),
                pa.DictionaryArray.from_arrays(
                    pa.array(run_f[idx].astype(np.int32)), fdict
                ).cast(pa.string()),
                pa.DictionaryArray.from_arrays(
                    pa.array(run_o[idx].astype(np.int32)), odict
                ).cast(pa.string()),
                lists.take(take),
            ],
            schema=SHARD_STAR_SCHEMA,
        )

    return per_bucket


def build_shard_stars(
    pairs: Dataset, ctx: FeatureContext, n_shards: int, n_buckets: int = 128
) -> Dataset:
    """Star rows exploded per target shard (SHARD_STAR_SCHEMA). The
    bucket exchange is the static split (stages/exchange.py), not a
    sort-based groupby -- same degenerate-key-space reasoning as
    stages/stars.build_stars."""
    from .exchange import static_group_exchange

    edges = directed_keyed_edges_sharded(pairs, ctx, n_buckets)
    return static_group_exchange(
        edges, "bucket", n_buckets, _per_bucket_shard_stars(ctx, n_shards),
        empty_schema=SHARD_STAR_SCHEMA,
    )


def build_shard_star_grid(
    pairs: Dataset, ctx: FeatureContext, n_shards: int, n_buckets: int = 128
) -> list[list]:
    """In-memory fast path of build_shard_stars: the star-bucket group
    tasks split their own output by shard (``num_returns=n_shards``), so
    each ShardMiner fetches exactly its rows -- no intermediate star
    Dataset, no separate split_block wave. Returns grid[bucket][shard]
    object refs. The parquet-checkpoint path keeps build_shard_stars."""
    from .exchange import static_group_exchange_split

    edges = directed_keyed_edges_sharded(pairs, ctx, n_buckets)
    fn = _per_bucket_shard_stars(ctx, n_shards)
    return static_group_exchange_split(
        edges, "bucket", n_buckets, fn, "shard", n_shards,
        empty_schema=SHARD_STAR_SCHEMA,
    )


MAX_K = 64  # slot-id packing factor (pattern size never approaches this)


@ray.remote
class ShardMiner:
    """Holds the star index and row-instance tables for one or more
    shards across the level-synchronized loop (state survives between
    expand() calls -- 'stateful stage = actor'). One actor usually owns
    several shards: actor processes are expensive to start, shard
    hashing is what balances the work."""

    def __init__(self, ctx: FeatureContext, shards: list[int], n_shards: int):
        self.ctx = ctx
        self.shards = list(shards)
        self.n_shards = n_shards
        self.index: dict[tuple[int, str], np.ndarray] = {}
        self.tables: dict[tuple[str, ...], np.ndarray] = {}
        import os

        if os.environ.get("CLPM_MEMTUNE"):
            # Fresh actor process: pre-fault a slice of allocator arena
            # NOW, while actor creation overlaps the star-build Dataset
            # job. This host services first-touch page faults at
            # 50-100us per 4 KiB page (see memtune.py); without this the
            # first _build/expand pays seconds of kernel time that the
            # long-lived workers of a real cluster never see (the bench
            # warmup wave only reaches Ray's task workers, not actors).
            # Sized to the actor's share of the DATA (~5 KB of peak
            # allocator churn per owned instance row, calibrated on the
            # 400k-row bench fixture; clamp 16 MB..1 GB): the VMM
            # services faults with limited concurrency, so over-warming
            # N actors serializes into tens of seconds of wall -- a
            # fixed 128 MB floor across 32 actors measured ~50 s on a
            # 12 s job -- while under-warming re-exposes the fault cost
            # inside the first _build/expand.
            share = len(self.shards) / max(n_shards, 1)
            rows_total = sum(ctx.counts.values())
            n_bytes = min(max(int(share * rows_total * 5000), 16 << 20),
                          1 << 30)
            buf = np.empty(n_bytes // 8, np.int64)
            buf.fill(1)
            del buf

    def load(self, star_dir: str) -> int:
        """Read this actor's shard partitions (parquet checkpoint path)."""
        import glob

        import pyarrow.parquet as pq

        parts = []
        for s in self.shards:
            parts.extend(sorted(glob.glob(f"{star_dir}/shard={s}/*.parquet")))
        if not parts:
            return 0
        return self._build(pa.concat_tables([pq.read_table(p) for p in parts]))

    def load_refs(self, refs: list) -> int:
        """In-memory path: scan the shared star blocks (zero-copy plasma
        reads on one node) and keep only this actor's shards. Multi-node
        deployments should prefer the partitioned-parquet path, which
        reads only the owned partitions."""
        own = list(set(self.shards))
        kept = []
        for ref in refs:
            t = ray.get(ref)
            if isinstance(t, pd.DataFrame):  # groupby stages emit pandas blocks
                if t.empty or "shard" not in t.columns:
                    continue
                t = pa.Table.from_pandas(t, schema=SHARD_STAR_SCHEMA,
                                         preserve_index=False)
            if t.num_rows == 0 or "shard" not in t.column_names:
                continue
            mask = np.isin(t["shard"].to_numpy(zero_copy_only=False), own)
            if mask.any():
                kept.append(t.filter(pa.array(mask)))
        if not kept:
            return 0
        return self._build(pa.concat_tables(kept))

    def load_split(self, sub_refs: list) -> dict:
        """Load pre-split sub-tables (one per (block, owned shard)) --
        each actor fetches ONLY its own rows; the splitting pass ran
        once, in parallel, inside the star-exchange group tasks
        (exchange.static_group_exchange_split)."""
        import time as _time

        _t0 = _time.perf_counter()
        kept = [t for t in ray.get(list(sub_refs)) if t.num_rows]
        _t1 = _time.perf_counter()
        if not kept:
            return {"rows": 0, "fetch_s": round(_t1 - _t0, 3), "build_s": 0.0}
        n = self._build(pa.concat_tables(kept))
        return {
            "rows": n,
            "fetch_s": round(_t1 - _t0, 3),
            "build_s": round(_time.perf_counter() - _t1, 3),
        }

    def _build(self, t: pa.Table) -> int:
        """Build the star index + T1 WITHOUT materializing Python string
        arrays: both feature columns are Arrow-dictionary-encoded to int
        codes (one C pass each), so the per-actor allocation churn is a
        handful of int arrays -- on fault-expensive hosts the object-
        string version spent tens of seconds in first-touch page faults
        for ~1.4M PyObjects per column (see memtune.py)."""
        from ..mining_core import StarCSR

        center_ids = t["center_id"].to_numpy(zero_copy_only=False)
        cf = t["center_feature"].combine_chunks().dictionary_encode()
        nf = t["nbr_feature"].combine_chunks().dictionary_encode()
        nf_codes = nf.indices.to_numpy(zero_copy_only=False)
        nf_uniq = np.asarray(nf.dictionary.to_pylist(), dtype=object)
        col = t["nbr_ids"].combine_chunks()
        if isinstance(col, pa.ChunkedArray):
            col = col.chunk(0)
        offsets = col.offsets.to_numpy()
        flat = col.values.to_numpy(zero_copy_only=False).astype(np.int32)
        cidx = np.asarray(center_ids, np.int64)
        # per-feature CSR star index, one vectorized pass; duplicate
        # (center, nbr_feat) rows from multi-shard replication collapse
        # to their (identical) first copy inside from_rows
        self.index = StarCSR.from_rows(cidx, (nf_codes, nf_uniq), offsets, flat)
        # T1: roots owned by this actor's shards, deduped + grouped by
        # feature -- int-only (packed feat_code<<42 | center) unique pass
        root_mask = np.isin(
            shard_of(cidx, self.n_shards), np.asarray(self.shards, np.int32)
        )
        cf_codes = cf.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        packed = np.unique(
            (cf_codes[root_mask] << np.int64(42)) | cidx[root_mask]
        )
        feat_of = packed >> np.int64(42)
        cen = (packed & np.int64((1 << 42) - 1)).astype(np.int32)
        bounds = np.searchsorted(feat_of, np.arange(len(cf.dictionary) + 1))
        cf_uniq = cf.dictionary.to_pylist()
        self.tables = {
            (cf_uniq[f],): cen[bounds[f]: bounds[f + 1]].reshape(-1, 1)
            for f in range(len(cf_uniq))
            if bounds[f + 1] > bounds[f]
        }
        return int(len(cidx))

    def expand_partitioned(
        self, candidates: list[tuple[str, ...]], n_reducers: int
    ) -> list:
        """Like expand(), but the distinct-participant payload is hash-
        partitioned by instance id into n_reducers object refs so the
        exact-distinct union runs as a parallel reduce (no sketches, no
        driver loop over raw ids). Keys are globally consistent ints
        (candidate_index * MAX_K + slot -- every shard receives the same
        candidates list), so reducers need no key translation. The
        payload is ONE packed int64 array per reducer (key << 32 | id):
        global dense codes make the exchange a vectorized int op."""
        import time as _time

        _t0 = _time.perf_counter()
        new_tables = expand_tables(candidates, self.tables, self.index)
        _t1 = _time.perf_counter()
        counts: dict[int, int] = {}
        root_dist: dict[int, int] = {}
        cand_index = {c: j for j, c in enumerate(candidates)}
        # per-(candidate, slot) np.unique: the slices are small and
        # cache-resident, so ~10^4 tiny sorts beat one global sort over
        # the concatenated packed array (microbenchmarked 3.0 s vs
        # 5.7-8.2 s per actor at 16M rows) AND they shrink the shipped
        # payload before the plasma puts. Reducer assignment is a RANGE
        # partition of the dense id space (codes are positional ->
        # uniform): each sorted unique-id chunk is cut by ONE
        # searchsorted -- no hash array, no concatenated packed array,
        # no boolean-mask gathers. The hash version allocated ~6 full-
        # payload temporaries per level; on fault-expensive hosts that
        # measured 20 s/actor of first-touch kernel time at the peak
        # level (50-100us per 4 KiB page, see memtune.py).
        candidates = list(candidates)
        n_codes = max(int(sum(self.ctx.counts.values())), 1)
        bounds_ids = (
            np.arange(1, n_reducers, dtype=np.int64) * n_codes
        ) // n_reducers
        per_red: list[list[np.ndarray]] = [[] for _ in range(n_reducers)]
        for cand, rows in new_tables.items():
            j = cand_index[cand]
            counts[j] = int(rows.shape[0])
            # slot 0 is the ROOT instance: roots are disjoint across shards
            # by construction, so the local distinct count sums exactly --
            # no ids shipped for the root slot
            root_dist[j] = int(np.unique(rows[:, 0]).size)
            for i in range(1, rows.shape[1]):
                ids = np.unique(rows[:, i]).astype(np.int64)  # sorted
                packed = (np.int64(j * MAX_K + i) << np.int64(32)) | ids
                cuts = np.searchsorted(ids, bounds_ids)
                prev = 0
                for r in range(n_reducers):
                    nxt = int(cuts[r]) if r < n_reducers - 1 else len(ids)
                    if nxt > prev:
                        per_red[r].append(packed[prev:nxt])
                    prev = nxt
        self.tables = new_tables
        _t2 = _time.perf_counter()
        empty = np.empty(0, np.int64)
        refs = [
            ray.put(np.concatenate(chunks) if chunks else empty)
            for chunks in per_red
        ]
        timings = {
            "expand_s": round(_t1 - _t0, 3),
            "partition_s": round(_time.perf_counter() - _t1, 3),
            "unique_s": round(_t2 - _t1, 3),
            "put_s": round(_time.perf_counter() - _t2, 3),
            "n_rows": int(sum(counts.values())),
        }
        # counts ship as int64 array pairs, not dicts: at thousands of
        # candidates x 32 actors the dict pickling + driver-side Python
        # merge loops were a measurable slice of every level barrier
        cj = np.fromiter(counts.keys(), np.int64, len(counts))
        cn = np.fromiter(counts.values(), np.int64, len(counts))
        rj = np.fromiter(root_dist.keys(), np.int64, len(root_dist))
        rn = np.fromiter(root_dist.values(), np.int64, len(root_dist))
        return [refs, (cj, cn), (rj, rn), timings]

    def prune_tables(self, keep: list[tuple[str, ...]]) -> None:
        keep_set = set(keep)
        self.tables = {p: t for p, t in self.tables.items() if p in keep_set}



def _reduce_distinct_arrays(parts) -> dict:
    """Exact per-key distinct count over this reducer's id range: one
    np.unique over the packed (key << 32 | id) int64 arrays, then a
    boundary count over the (already sorted) survivors. No strings, no
    pandas, no second sort."""
    parts = [p for p in parts if p.size]
    if not parts:
        return {}
    u = np.unique(np.concatenate(parts) if len(parts) > 1 else parts[0])
    keys = u >> np.int64(32)
    cut = np.flatnonzero(keys[1:] != keys[:-1]) + 1
    starts = np.concatenate(([0], cut))
    ends = np.concatenate((cut, [len(keys)]))
    return dict(zip(keys[starts].tolist(), (ends - starts).tolist()))


@ray.remote
def reduce_distinct(*parts) -> dict:
    return _reduce_distinct_arrays(parts)


def coordinated_level_loop(
    actors: list,
    ctx: FeatureContext,
    min_prev: float,
    use_lemma3: bool,
    measure: str = "wpi",
) -> list[dict]:
    """The driver side of the salted mode: per level, fan expand() out to
    every shard, union distinct participants (exact, no sketches), apply
    the reference's select + Lemma-2/3 filters globally.

    On pipelining the level barrier: level k's expansion CANNOT start
    before level k-1's distinct reduce completes -- its candidate set
    is gen_candidates(P_{k-1}) and P_{k-1} is decided by the reduced
    distinct counts (and Lemma 3 additionally needs every PI of level
    k-1). What CAN overlap already does: the reduce futures launch
    before the driver's row/root count sums, prune_tables() is
    fire-and-forget, and the reduce fan-in runs as n_red parallel
    tasks. The leftover serial slice is the driver-side select loop
    (~ms per level); speculative expansion of not-yet-selected
    candidates would trade exactness guarantees for < 2 s per job."""
    import os as _os
    import time as _time

    _timing = _os.environ.get("CLPM_TASK_TIMING")
    all_feats = ctx.order
    candidates = [
        (a, b)
        for ai, a in enumerate(all_feats)
        for b in all_feats[ai + 1 :]
    ]
    results: list[dict] = []
    prev_prevalent: list[tuple[str, ...]] = []
    prev_pi: dict[tuple[str, ...], float] = {}
    k = 2
    while candidates:
        if k > 2:
            prev_set = set(prev_prevalent)
            kept = []
            for cand in candidates:
                valid = True
                for drop in range(len(cand)):
                    subset = cand[:drop] + cand[drop + 1 :]
                    if drop != 0:
                        if subset not in prev_set:
                            valid = False
                            break
                    elif use_lemma3:
                        ri = ctx.rare_intensity(cand[-1], cand)
                        w = (1.0 / ri) if ri != 0.0 else math.inf
                        bound = prev_pi.get(subset, 0.0) * w  # NaN-safe: 0*inf
                        if bound < min_prev:
                            valid = False
                            break
                if valid:
                    kept.append(cand)
            candidates = kept
            if not candidates:
                break
        # MANY SMALL reducers, not one per cpu: per-reducer concat+sort
        # buffers must stay inside the task workers' warm allocator
        # arenas (~tens of MB) -- at 4 cpus a payload/4-sized reducer
        # buffer re-faulted fresh pages at 50-100us each and one level's
        # reduce measured 11-18 s vs ~1 s of actual sort (memtune.py).
        # Extra reducers just queue as waves on the same warm workers;
        # capped at 64 because every actor ray.puts one partition per
        # reducer per level (128 reducers x 32 actors measured ~0.4 s of
        # puts per level on a small job).
        n_red = max(8, min(4 * len(actors), 64))
        _t_lvl = _time.perf_counter()
        # broadcast the candidate list once (plasma), not once per actor
        cand_ref = ray.put(candidates)
        outs = ray.get(
            [a.expand_partitioned.remote(cand_ref, n_red) for a in actors]
        )
        _t_exp = _time.perf_counter()
        # exact distinct, reduced in parallel: reducer r sees only the ids
        # in its range, across all shards (no sketches). Launched FIRST
        # so they overlap the driver-side count sums.
        red_futs = [
            reduce_distinct.remote(*[refs[r] for refs, *_ in outs])
            for r in range(n_red)
        ]
        row_counts = np.zeros(len(candidates), np.int64)
        root_counts = np.zeros(len(candidates), np.int64)
        for _, (cj, cn), (rj, rn), _tm in outs:
            np.add.at(row_counts, cj, cn)
            np.add.at(root_counts, rj, rn)
        red_results = ray.get(red_futs)
        if _timing:
            exps = sorted(tm["expand_s"] for *_x, tm in outs)
            parts_s = sorted(tm["partition_s"] for *_x, tm in outs)
            print(
                f"LEVEL k={k} ncand={len(candidates)} "
                f"expand_wall={_t_exp - _t_lvl:.2f} "
                f"reduce_wall={_time.perf_counter() - _t_exp:.2f} "
                f"expand_max={exps[-1]:.2f} expand_med={exps[len(exps)//2]:.2f} "
                f"part_max={parts_s[-1]:.2f} part_med={parts_s[len(parts_s)//2]:.2f} "
                f"uniq_med={sorted(tm['unique_s'] for *_x, tm in outs)[len(outs)//2]:.2f} "
                f"put_med={sorted(tm['put_s'] for *_x, tm in outs)[len(outs)//2]:.2f} "
                f"rows={sum(tm['n_rows'] for *_x, tm in outs)}",
                flush=True,
            )
        dist_counts: dict[int, int] = {}
        for rr in red_results:
            for key, n in rr.items():
                dist_counts[key] = dist_counts.get(key, 0) + n

        mk = MAX_K
        prev_prevalent = []
        prev_pi = {}
        for j, cand in enumerate(candidates):
            nrows = int(row_counts[j])
            dist = [int(root_counts[j])] + [
                dist_counts.get(j * mk + i, 0) for i in range(1, len(cand))
            ]
            m = select_metrics(cand, dist, ctx)
            prev_pi[cand] = m["pi"]
            score = m["wpi"] if measure == "wpi" else m["pi"]
            if score >= min_prev:
                prev_prevalent.append(cand)
                results.append(
                    {"pattern": cand, "k": k, "wpi": m["wpi"], "pi": m["pi"],
                     "prs": m["prs"], "n_rows": nrows}
                )
        if not prev_prevalent:
            break
        # drop non-prevalent tables on the actors (the next level only
        # expands prefixes from P_k -- same invariant as src/miner.cpp:94
        # where only gen_candidates' prefixes are ever looked up)
        for a in actors:
            a.prune_tables.remote(prev_prevalent)
        candidates = gen_candidates(prev_prevalent, ctx)
        k += 1
    return results
