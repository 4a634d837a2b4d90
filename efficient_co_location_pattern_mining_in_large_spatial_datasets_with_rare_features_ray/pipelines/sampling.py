"""Deterministic stratified sampling — the mixture-weighting step of a
training-data pipeline (down/up-weight each source/domain before
tokenization).

Sampling must be DETERMINISTIC at 100 TB: a resumed or re-run job has to
pick the exact same rows, and two pipelines sampling the same corpus
must agree without coordination. So membership is a pure function of
the row, not of an RNG stream: keep a row iff

    md5_32(str(id) || '|' || strata) % 100  <  rate(strata)

md5 (not a faster non-crypto hash) is chosen deliberately so the DuckDB
oracle can restate the predicate exactly (same tradeoff as the minhash
family, functions/dedup.py); per-row cost is one md5 of a short string.
Map-only: no shuffle, no state, embarrassingly parallel over blocks.
"""

from __future__ import annotations

from typing import Callable

import hashlib

import numpy as np
import pyarrow as pa

from ray.data import Dataset


def _md5_32(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)


def stratified_sample(
    ds: Dataset,
    id_col: str,
    strata_col: str,
    rate_fn: Callable[[str], int],
    keep_cols: list[str] | None = None,
) -> Dataset:
    """Keep each row with probability ``rate_fn(strata)/100``, decided by
    the deterministic per-row hash above. ``rate_fn`` maps a stratum
    value to an integer percentage in [0, 100]; it is evaluated once per
    DISTINCT stratum per batch (vectorized via a dict gather), so it may
    be arbitrarily expensive."""
    cols = keep_cols or [id_col, strata_col]

    def fn(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        strata = t[strata_col].to_pylist()
        uniq = set(strata)
        rates = {s: int(rate_fn(str(s))) for s in uniq}
        keep = np.fromiter(
            (
                _md5_32(f"{i}|{s}") % 100 < rates[s]
                for i, s in zip(ids, strata)
            ),
            dtype=bool,
            count=len(ids),
        )
        return t.select(cols).filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow")
