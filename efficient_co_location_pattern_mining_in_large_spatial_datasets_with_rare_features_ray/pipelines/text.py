"""Text-analysis Dataset pipelines over the ``documents`` table."""

from __future__ import annotations

import numpy as np
import pandas as pd

from ray.data import Dataset

from ..functions.text import fingerprint, lang_id, quality_metrics, token_counts


def doc_quality(docs: Dataset) -> Dataset:
    """(doc_id, n_chars, n_words, avg_word_len, punct_ratio, stop_ratio,
    quality_score) -- SQL-reproducible metrics."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        out = quality_metrics(df["text"])
        out.insert(0, "doc_id", df["doc_id"].to_numpy(np.int64))
        return out

    return docs.map_batches(fn, batch_format="pandas")


def token_totals(docs: Dataset) -> Dataset:
    """Per-source token totals: (source, n_docs, total_tokens_ws,
    total_tokens_bpe). Partial-aggregates per batch before the tiny
    groupby -- the shuffle moves one row per (batch, source), not per doc."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = token_counts(df["text"])
        t["source"] = df["source"].to_numpy()
        g = t.groupby("source", sort=False).agg(
            n_docs=("n_tokens_ws", "size"),
            total_tokens_ws=("n_tokens_ws", "sum"),
            total_tokens_bpe=("n_tokens_bpe", "sum"),
        )
        return g.reset_index()

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("source", sort=False).agg(
            n_docs=("n_docs", "sum"),
            total_tokens_ws=("total_tokens_ws", "sum"),
            total_tokens_bpe=("total_tokens_bpe", "sum"),
        )
        return g.reset_index()

    return (
        docs.map_batches(partial, batch_format="pandas")
        .groupby("source")
        .map_groups(merge, batch_format="pandas")
    )


def doc_langid(docs: Dataset) -> Dataset:
    """(doc_id, lang, lang_pred) -- heuristic language id per doc."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "lang": df["lang"].to_numpy(),
                "lang_pred": lang_id(df["text"]),
            }
        )

    return docs.map_batches(fn, batch_format="pandas")


def doc_fingerprints(docs: Dataset) -> Dataset:
    """(doc_id, fp) rolling-hash document fingerprints."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "fp": fingerprint(df["text"]),
            }
        )

    return docs.map_batches(fn, batch_format="pandas")
