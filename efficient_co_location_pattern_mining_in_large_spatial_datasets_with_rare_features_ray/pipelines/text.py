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


def token_topk(docs: Dataset, k: int = 50) -> Dataset:
    """Global top-k most frequent whitespace tokens: (token, n).

    The classic LM-training-data word count at scale: per-batch partial
    ``value_counts`` (one row per distinct token per batch, not per
    occurrence), a groupby-sum over the shrunken partials, then a
    DISTRIBUTED sort + limit -- the full vocabulary never lands on the
    driver. Ties at the cutoff break deterministically (n desc, token
    asc), matching the SQL oracle's ORDER BY."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["text"].str.split().explode().value_counts()
        return pd.DataFrame(
            {"token": vc.index.astype(str), "n": vc.to_numpy(np.int64)}
        )

    agg = (
        docs.map_batches(partial, batch_format="pandas")
        .groupby("token")
        .sum("n")
        .map_batches(
            lambda df: df.rename(columns={"sum(n)": "n"}),
            batch_format="pandas",
        )
    )
    return agg.sort(key=["n", "token"], descending=[True, False]).limit(k)


def bigram_topk(docs: Dataset, k: int = 50) -> Dataset:
    """Global top-k token bigrams: (bigram, n) -- n-gram statistics for
    training-data analysis. Bigrams are built vectorized (one flat token
    array per batch with document-boundary masking, no per-doc Python
    loop); the shuffle shape matches token_topk."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.split()
        lens = toks.str.len().to_numpy(np.int64)
        keep = lens > 0
        if not keep.any():
            return pd.DataFrame(
                {"bigram": pd.Series([], dtype=str),
                 "n": pd.Series([], dtype=np.int64)}
            )
        flat = np.concatenate(toks.to_numpy()[keep]).astype(object)
        if len(flat) < 2:
            return pd.DataFrame(
                {"bigram": pd.Series([], dtype=str),
                 "n": pd.Series([], dtype=np.int64)}
            )
        # mask out pairs spanning a document boundary
        mask = np.ones(len(flat) - 1, bool)
        ends = np.cumsum(lens[keep])[:-1] - 1
        mask[ends] = False
        big = flat[:-1][mask] + " " + flat[1:][mask]
        vc = pd.Series(big).value_counts()
        return pd.DataFrame(
            {"bigram": vc.index.astype(str), "n": vc.to_numpy(np.int64)}
        )

    agg = (
        docs.map_batches(partial, batch_format="pandas")
        .groupby("bigram")
        .sum("n")
        .map_batches(
            lambda df: df.rename(columns={"sum(n)": "n"}),
            batch_format="pandas",
        )
    )
    return agg.sort(key=["n", "bigram"], descending=[True, False]).limit(k)
