"""Size-2 pattern metrics as a pure Dataset aggregation.

Computes, for every feature pair with at least one qualifying neighbor
pair, the full size-2 prevalence metrics (n_rows, per-slot distinct
participants, PI, WPI) -- SQL-expressible, so this pipeline has an exact
DuckDB oracle in the driver correctness gate. Semantics per
src/utils.cpp:147-193 (PR), src/miner.cpp:382-430 (WPI select).

Shuffle shape: ids are dictionary-encoded once, then ONE map_batches
pass per pair block emits (a) tiny per-batch (pair, n_rows) partial
counts and (b) per-batch-deduped packed ``(pair_slot_key << 32 | id)``
int64 participant rows hash-bucketed BY INSTANCE ID. The only exchange
is the uniform bucket groupby; per bucket one np.unique yields partial
distinct counts, which sum exactly across buckets (an id lands in one
bucket only). The round-2 version shuffled every raw pair row on an
m^2-value (f1, f2) sort key -- Ray's range-boundary sampling degenerates
on tiny key spaces and one hot feature pair landed on a single task
doing exact nunique alone (measured: nearly as slow as full mining).
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

_PARTIAL_SCHEMA = pa.schema(
    [
        ("kind", pa.int8()),    # 0 = n_rows partial, 1 = packed participant
        ("bucket", pa.int64()),
        ("a", pa.int64()),      # kind 0: pair code | kind 1: packed key<<32|id
        ("b", pa.int64()),      # kind 0: partial row count | kind 1: unused
    ]
)

_N_BUCKETS = 64


def k2_metrics(
    instances: Dataset, cfg: MiningConfig, ctx: FeatureContext
) -> pa.Table:
    """All size-2 patterns with exact metrics (not thresholded --
    thresholding is a trivial filter and keeping all rows makes the
    oracle comparison robust to borderline float flips)."""
    from ..stages.sharded import encode_instance_ids

    # dense int codes: the distinct-participant exchange ships packed
    # int64s; codes never surface in the output so any bijection works
    instances = encode_instance_ids(instances)
    pairs = neighbor_pairs(instances, cfg)
    nf = len(ctx.order)
    rank = dict(ctx.rank)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        from ..stages.stars import dict_take

        ra = dict_take(df["a_feature"], rank)
        rb = dict_take(df["b_feature"], rank)
        ia = df["a_id"].to_numpy(np.int64)
        ib = df["b_id"].to_numpy(np.int64)
        a_first = ra < rb  # rank order IS the canonical (count asc, lex) order
        r1 = np.where(a_first, ra, rb)
        r2 = np.where(a_first, rb, ra)
        id1 = np.where(a_first, ia, ib)
        id2 = np.where(a_first, ib, ia)
        pcode = r1 * nf + r2
        uc, cnts = np.unique(pcode, return_counts=True)
        head = pd.DataFrame(
            {"kind": np.int8(0), "bucket": uc % _N_BUCKETS, "a": uc, "b": cnts}
        )
        packed = np.unique(
            np.concatenate(
                [(pcode * 2) << np.int64(32) | id1,
                 (pcode * 2 + 1) << np.int64(32) | id2]
            )
        )
        body = pd.DataFrame(
            {
                "kind": np.int8(1),
                "bucket": (packed & np.int64(0xFFFFFFFF)) % _N_BUCKETS,
                "a": packed,
                "b": np.int64(0),
            }
        )
        return pd.concat([head, body], ignore_index=True)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        res = []
        k0 = df[df["kind"] == 0]
        if len(k0):
            g = k0.groupby("a", sort=False)["b"].sum()
            res.append(
                pd.DataFrame(
                    {"key": g.index.to_numpy(np.int64), "kind": np.int8(0),
                     "val": g.to_numpy(np.int64)}
                )
            )
        k1 = df[df["kind"] == 1]
        if len(k1):
            u = np.unique(k1["a"].to_numpy(np.int64))
            keys, cnts = np.unique(u >> np.int64(32), return_counts=True)
            res.append(
                pd.DataFrame({"key": keys, "kind": np.int8(1), "val": cnts})
            )
        if not res:
            return pd.DataFrame(
                {"key": pd.Series(dtype=np.int64),
                 "kind": pd.Series(dtype=np.int8),
                 "val": pd.Series(dtype=np.int64)}
            )
        return pd.concat(res, ignore_index=True)

    # tiny result: <= n_buckets * (pairs + 2*pairs) rows of 3 ints.
    # static split exchange, not groupby("bucket"): the sort shuffle's
    # boundary sampling is pure overhead on a dense 64-value int key
    from ..stages.exchange import static_group_exchange

    partials = pairs.map_batches(partial, batch_format="pandas")
    rows = static_group_exchange(
        partials, "bucket", _N_BUCKETS,
        lambda t: pa.Table.from_pandas(
            per_bucket(t.to_pandas()), preserve_index=False
        ),
    ).take_all()
    n_rows: dict[int, int] = {}
    dist: dict[int, int] = {}
    for r in rows:
        if r["kind"] == 0:
            n_rows[r["key"]] = n_rows.get(r["key"], 0) + int(r["val"])
        else:
            dist[r["key"]] = dist.get(r["key"], 0) + int(r["val"])

    counts = dict(ctx.counts)
    out = {k: [] for k in K2_SCHEMA.names}
    for pcode in sorted(n_rows):
        f1 = ctx.order[pcode // nf]
        f2 = ctx.order[pcode % nf]
        pat = (f1, f2)
        pr1 = dist.get(pcode * 2, 0) / counts[f1]
        pr2 = dist.get(pcode * 2 + 1, 0) / counts[f2]
        w1 = ctx.wpr_weight(f1, pat)
        w2 = ctx.wpr_weight(f2, pat)
        out["pattern"].append(",".join(pat))
        out["k"].append(2)
        out["n_rows"].append(int(n_rows[pcode]))
        out["pi"].append(float(np.round(min(pr1, pr2), 9)))
        out["wpi"].append(float(np.round(min(pr1 * w1, pr2 * w2), 9)))
    t = pa.table(out, schema=K2_SCHEMA)
    return t.sort_by("pattern") if t.num_rows else t
