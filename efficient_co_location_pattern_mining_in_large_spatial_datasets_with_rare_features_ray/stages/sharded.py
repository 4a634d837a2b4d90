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
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset

from ..canonical import FeatureContext, select_metrics
from ..mining_core import expand_tables, gen_candidates
from .stars import _stable_bucket

SHARD_STAR_SCHEMA = pa.schema(
    [
        ("shard", pa.int32()),
        ("center_id", pa.string()),
        ("center_feature", pa.string()),
        ("nbr_feature", pa.string()),
        ("nbr_ids", pa.list_(pa.string())),
    ]
)


def shard_of(ids: pd.Series | np.ndarray, n_shards: int) -> np.ndarray:
    arr = ids.to_numpy(dtype=object) if isinstance(ids, pd.Series) else ids
    return (
        pd.util.hash_array(arr, categorize=False) % np.uint64(n_shards)
    ).astype(np.int32)


def directed_keyed_edges_sharded(
    pairs: Dataset, ctx: FeatureContext, n_buckets: int
) -> Dataset:
    """Like stars.directed_keyed_edges but the subtree hint carries the
    in-neighbor center ID (needed to compute its shard)."""
    counts = dict(ctx.counts)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        ca = df["a_feature"].map(counts)
        cb = df["b_feature"].map(counts)
        a_keeps_b = (ca < cb) | ((ca == cb) & (df["a_feature"] <= df["b_feature"]))
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


def build_shard_stars(
    pairs: Dataset, ctx: FeatureContext, n_shards: int, n_buckets: int = 128
) -> Dataset:
    """Star rows exploded per target shard (SHARD_STAR_SCHEMA)."""
    edges = directed_keyed_edges_sharded(pairs, ctx, n_buckets)

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        star = df[df["kind"] == 0]
        hint = df[df["kind"] == 1]
        lists = (
            star.groupby(["key", "feat", "other_feat"], sort=False)["other"]
            .agg(list)
            .reset_index()
        )
        if lists.empty:
            return SHARD_STAR_SCHEMA.empty_table()
        # target shards per key: own shard + shards of in-neighbor centers
        own = star[["key"]].drop_duplicates().copy()
        own["shard"] = shard_of(own["key"], n_shards)
        inn = hint[["key", "other"]].copy()
        inn["shard"] = shard_of(inn["other"], n_shards)
        targets = pd.concat(
            [own[["key", "shard"]], inn[["key", "shard"]]]
        ).drop_duplicates()
        out = lists.merge(targets, on="key", how="inner")
        if out.empty:
            return SHARD_STAR_SCHEMA.empty_table()
        return pa.Table.from_arrays(
            [
                pa.array(out["shard"].to_numpy(np.int32), pa.int32()),
                pa.array(out["key"], pa.string()),
                pa.array(out["feat"], pa.string()),
                pa.array(out["other_feat"], pa.string()),
                pa.array(out["other"].tolist(), pa.list_(pa.string())),
            ],
            schema=SHARD_STAR_SCHEMA,
        )

    return edges.groupby("bucket").map_groups(per_bucket, batch_format="pandas")


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
        self.ids: np.ndarray | None = None

    def load(self, star_dir: str) -> int:
        """Read this actor's shard partitions and build the local index
        + T1 (roots = instances hashed to any owned shard). A star
        replicated into two owned shards collapses to one index entry."""
        import glob

        import pyarrow.parquet as pq

        parts = []
        for s in self.shards:
            parts.extend(sorted(glob.glob(f"{star_dir}/shard={s}/*.parquet")))
        if not parts:
            self.ids = np.empty(0, dtype=object)
            return 0
        t = pa.concat_tables([pq.read_table(p) for p in parts])
        center_ids = t["center_id"].to_numpy(zero_copy_only=False)
        center_feats = t["center_feature"].to_numpy(zero_copy_only=False)
        nbr_feats = t["nbr_feature"].to_numpy(zero_copy_only=False)
        col = t["nbr_ids"].combine_chunks()
        if isinstance(col, pa.ChunkedArray):
            col = col.chunk(0)
        offsets = col.offsets.to_numpy()
        flat = col.values.to_numpy(zero_copy_only=False)
        all_ids = np.unique(np.concatenate([center_ids, flat]))
        idx_of = {s: i for i, s in enumerate(all_ids)}
        self.ids = all_ids
        cidx = np.fromiter((idx_of[s] for s in center_ids), np.int64,
                           count=len(center_ids))
        fidx = np.fromiter((idx_of[s] for s in flat), np.int32, count=len(flat))
        for r in range(len(center_ids)):
            lo, hi = offsets[r], offsets[r + 1]
            self.index[(int(cidx[r]), nbr_feats[r])] = np.unique(fidx[lo:hi])
        # T1: roots owned by this actor's shards, grouped by feature
        root_mask = np.isin(
            shard_of(center_ids, self.n_shards), np.asarray(self.shards, np.int32)
        )
        t1: dict[str, list[int]] = {}
        seen: set[int] = set()
        for i in np.nonzero(root_mask)[0]:
            li = int(cidx[i])
            if li not in seen:
                seen.add(li)
                t1.setdefault(center_feats[i], []).append(li)
        self.tables = {
            (f,): np.asarray(v, np.int32).reshape(-1, 1) for f, v in t1.items()
        }
        return int(len(center_ids))

    def expand(self, candidates: list[tuple[str, ...]]) -> dict:
        """genTableInstance for this level over local roots; returns
        per-candidate (slot -> distinct participant GLOBAL ids, row count)."""
        new_tables = expand_tables(candidates, self.tables, self.index)
        out: dict[tuple[str, ...], tuple[list[np.ndarray], int]] = {}
        for cand, rows in new_tables.items():
            slots = [self.ids[np.unique(rows[:, i])] for i in range(rows.shape[1])]
            out[cand] = (slots, int(rows.shape[0]))
        self.tables = new_tables
        return out

    def prune_tables(self, keep: list[tuple[str, ...]]) -> None:
        keep_set = set(keep)
        self.tables = {p: t for p, t in self.tables.items() if p in keep_set}


def coordinated_level_loop(
    actors: list,
    ctx: FeatureContext,
    min_prev: float,
    use_lemma3: bool,
    measure: str = "wpi",
) -> list[dict]:
    """The driver side of the salted mode: per level, fan expand() out to
    every shard, union distinct participants (exact, no sketches), apply
    the reference's select + Lemma-2/3 filters globally."""
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
        shard_outs = ray.get([a.expand.remote(candidates) for a in actors])
        # exact distinct union across shards, per (pattern, slot)
        merged: dict[tuple[str, ...], tuple[list[set], int]] = {}
        for so in shard_outs:
            for cand, (slots, nrows) in so.items():
                if cand not in merged:
                    merged[cand] = ([set() for _ in cand], 0)
                msets, mn = merged[cand]
                for i, ids in enumerate(slots):
                    msets[i].update(ids.tolist())
                merged[cand] = (msets, mn + nrows)
        prev_prevalent = []
        prev_pi = {}
        for cand in candidates:
            msets, nrows = merged.get(cand, ([set() for _ in cand], 0))
            dist = [len(s) for s in msets]
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
        candidates = gen_candidates(prev_prevalent, ctx)
        k += 1
    return results
