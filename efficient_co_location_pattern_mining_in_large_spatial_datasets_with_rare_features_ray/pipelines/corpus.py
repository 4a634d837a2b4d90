"""End-to-end training-corpus cleaning pipeline.

The composition a large-scale LLM-data pipeline actually runs, expressed
over the ``documents`` table with this repo's operators:

    quality gate (vectorized metrics)          -- map_batches
      -> exact dedup (crc-bucket shuffle)      -- groupby(bucket)
      -> MinHash-LSH near-dup pruning          -- band shuffle + verify
      -> kept document ids

Near-dup resolution keeps, per connected component of the verified
near-dup graph, the smallest doc_id (union-find on the driver: the
verified pair set is small by LSH construction; at 10^12-doc scale the
same resolution runs as a few rounds of min-label propagation --
documented, same output)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from ..functions.text import quality_metrics
from .dedup import exact_dedup, minhash_neardup_pairs


def quality_filter(docs: Dataset, min_words: int = 20,
                   max_stop_ratio: float = 0.9) -> Dataset:
    """Keep documents passing the quality gate (vectorized)."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        m = quality_metrics(df["text"])
        keep = (m["n_words"].to_numpy() >= min_words) & (
            m["stop_ratio"].to_numpy() <= max_stop_ratio
        )
        return df[keep]

    return docs.map_batches(fn, batch_format="pandas")


def _union_find_components(pairs: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def clean_corpus(
    docs: Dataset,
    min_words: int = 20,
    neardup_threshold: float = 0.7,
) -> pa.Table:
    """Returns (doc_id, kept, reason): every input document with whether
    it survives the full gate and why it was dropped
    (quality | exact_dup | near_dup | '' when kept). Deterministic:
    exact/near duplicate groups keep their smallest doc_id."""
    all_ids = np.sort(
        np.array([r["doc_id"] for r in docs.select_columns(["doc_id"]).take_all()],
                 dtype=np.int64)
    )
    good = quality_filter(docs, min_words=min_words)
    good_ids = {
        int(r["doc_id"]) for r in good.select_columns(["doc_id"]).take_all()
    }
    # exact dedup among quality survivors
    exact = exact_dedup(good).take_all()
    exact_keep = {int(r["doc_id"]) for r in exact}
    exact_dropped = good_ids - exact_keep
    # near-dup resolution among exact-dedup survivors
    survivors = good.map_batches(
        lambda df: df[df["doc_id"].isin(exact_keep)], batch_format="pandas"
    )
    nd = minhash_neardup_pairs(survivors, threshold=neardup_threshold)
    pairs = list(zip(nd["a"].to_pylist(), nd["b"].to_pylist()))
    roots = _union_find_components(pairs)
    near_dropped = {x for x, r in roots.items() if r != x}

    kept, reason = [], []
    for did in all_ids.tolist():
        if did not in good_ids:
            kept.append(False); reason.append("quality")
        elif did in exact_dropped:
            kept.append(False); reason.append("exact_dup")
        elif did in near_dropped:
            kept.append(False); reason.append("near_dup")
        else:
            kept.append(True); reason.append("")
    return pa.table(
        {
            "doc_id": pa.array(all_ids, pa.int64()),
            "kept": pa.array(kept, pa.bool_()),
            "reason": pa.array(reason, pa.string()),
        }
    )
