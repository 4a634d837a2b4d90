"""Distributed SQL set operations (INTERSECT / EXCEPT) over a key
column.

The reference engine has no set operators; a training-data pipeline
uses them constantly (users present in both cohorts, ids seen in crawl
A but not crawl B, held-out ids to exclude). Both ops share one plan:

    per-batch DISTINCT partial            -- map_batches (np.unique)
      -> bucket by stable key hash        -- one static cogroup exchange
      -> per-bucket sorted-set kernel     -- np.intersect1d / set-diff

Only DISTINCT keys move through the exchange (the cardinality
pre-aggregate — raw rows never ship), and a key lives in exactly one
bucket, so the per-bucket kernels are exact and independent. Skew is
bounded by the key-hash bucket, not by any data distribution.

Keys must be integer-typed (crawl/warehouse ids are); the result is a
Dataset of one ``key``-named column, distinct, unordered.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from ..stages.exchange import static_cogroup_exchange
from ..stages.stars import _stable_bucket


def _distinct_bucketed(ds: Dataset, key: str, n_buckets: int) -> Dataset:
    """Per-batch distinct + bucket assignment (the pre-shuffle combine:
    a batch's duplicate keys collapse before anything ships)."""

    def fn(t: pa.Table) -> pa.Table:
        k = t[key].to_numpy(zero_copy_only=False)
        if not np.issubdtype(k.dtype, np.integer):
            raise TypeError(f"set op key {key!r} must be integer-typed")
        u = np.unique(k.astype(np.int64, copy=False))
        return pa.table(
            {
                key: pa.array(u, pa.int64()),
                "__sb": pa.array(_stable_bucket(u, n_buckets), pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def _set_op(
    a: Dataset, b: Dataset, key: str, n_buckets: int, op: str
) -> Dataset:
    ab = _distinct_bucketed(a, key, n_buckets)
    bb = _distinct_bucketed(b, key, n_buckets)

    def kernel(ta: pa.Table, tb: pa.Table) -> pa.Table:
        # per-batch partials of one side may still overlap each other:
        # re-unique inside the bucket before the set kernel
        ka = np.unique(ta[key].to_numpy(zero_copy_only=False))
        kb = np.unique(tb[key].to_numpy(zero_copy_only=False))
        if op == "intersect":
            out = np.intersect1d(ka, kb, assume_unique=True)
        else:  # except
            out = ka[~np.isin(ka, kb, assume_unique=True)]
        return pa.table({key: pa.array(out, pa.int64())})

    return static_cogroup_exchange(ab, bb, "__sb", n_buckets, kernel)


def key_intersect(
    a: Dataset, b: Dataset, key: str, n_buckets: int = 64
) -> Dataset:
    """SQL ``SELECT key FROM a INTERSECT SELECT key FROM b``."""
    return _set_op(a, b, key, n_buckets, "intersect")


def key_except(
    a: Dataset, b: Dataset, key: str, n_buckets: int = 64
) -> Dataset:
    """SQL ``SELECT key FROM a EXCEPT SELECT key FROM b``."""
    return _set_op(a, b, key, n_buckets, "except")
