"""Dataset-level deduplication pipelines over the ``documents`` table.

Scale notes (these shapes are what survives 10^12 rows; the testdata is
just small):

* exact dedup  -- hash-partition on a crc bucket of the text, exact
  text grouping *inside* each partition: the shuffle moves hashes+rows
  once, no driver loop.
* MinHash-LSH  -- signature per batch (vectorized), explode to
  (band, band_hash) rows, groupby band bucket -> candidate pairs,
  verify true shingle Jaccard on the candidates only (candidates are
  << corpus; texts fetched by a semi-join-style filter, broadcast as a
  dict because the candidate set is small by construction).
* SimHash      -- one signature row per doc; near-dup = small hamming
  distance, groupable by rotating bit-bands (same LSH shape).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset

from ..functions.dedup import (
    MINHASH_BANDS,
    band_hashes,
    crc_bucket,
    minhash_signature,
    simhash64,
)
from ..functions.text import char_shingles, char_shingles_str, jaccard


def exact_dedup(docs: Dataset, n_buckets: int = 64) -> Dataset:
    """One row per distinct text: (doc_id = min over copies, n_copies).
    Hash-bucket shuffle + exact text grouping inside the bucket (hash
    collisions are resolved by the inner exact groupby)."""

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df[["doc_id", "text"]].copy()
        df["bucket"] = df["text"].map(lambda t: crc_bucket(t, n_buckets))
        return df

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # coarse bucket -> exact text groupby INSIDE (vectorized pandas);
        # never one Ray group per distinct text
        g = df.groupby("text", sort=False)["doc_id"]
        out = g.agg(["min", "size"]).reset_index(drop=True)
        return out.rename(columns={"min": "doc_id", "size": "n_copies"})

    return (
        docs.map_batches(add_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def minhash_band_rows(docs: Dataset) -> Dataset:
    """(band, band_hash, doc_id) rows -- the LSH explode."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        ids, bands, hashes = [], [], []
        for did, text in zip(df["doc_id"], df["text"]):
            bh = band_hashes(minhash_signature(text))
            ids.extend([did] * MINHASH_BANDS)
            bands.extend(range(MINHASH_BANDS))
            hashes.extend(bh.tolist())
        return pd.DataFrame(
            {
                "band": np.asarray(bands, np.int32),
                "band_hash": np.asarray(hashes, np.int64),
                "doc_id": np.asarray(ids, np.int64),
            }
        )

    return docs.map_batches(fn, batch_format="pandas")


def minhash_candidates(docs: Dataset, n_buckets: int = 64) -> Dataset:
    """Candidate near-dup pairs (a < b) from LSH band buckets, deduped.
    The Ray shuffle key is a coarse hash of (band, band_hash) -- one Ray
    group per bucket, with the per-(band, band_hash) pairing vectorized
    in pandas inside (never one Ray group per LSH bucket)."""

    def pairs_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        a_out: list[np.ndarray] = []
        b_out: list[np.ndarray] = []
        for _, sub in df.groupby(["band", "band_hash"], sort=False):
            ids = np.sort(sub["doc_id"].unique())
            if len(ids) < 2:
                continue
            iu, ju = np.triu_indices(len(ids), k=1)
            a_out.append(ids[iu])
            b_out.append(ids[ju])
        if not a_out:
            return pd.DataFrame(
                {"a": np.empty(0, np.int64), "b": np.empty(0, np.int64)}
            )
        out = pd.DataFrame(
            {"a": np.concatenate(a_out), "b": np.concatenate(b_out)}
        )
        return out.drop_duplicates()

    rows = minhash_band_rows(docs)
    rows = rows.map_batches(
        lambda df: df.assign(
            bb=(df["band_hash"].to_numpy(np.int64) % n_buckets
                + df["band"].to_numpy(np.int64) * n_buckets)
        ),
        batch_format="pandas",
    )
    # pairs may still repeat across bands; consumers dedupe (the verify
    # step does it driver-side -- candidates are small by construction)
    return rows.groupby("bb").map_groups(pairs_in_bucket, batch_format="pandas")


def minhash_neardup_pairs(
    docs: Dataset, threshold: float = 0.7, shingle_k: int = 5
) -> pa.Table:
    """LSH candidates verified by exact shingle Jaccard >= threshold.
    Returns (a, b, jaccard) sorted. The verify step broadcasts only the
    candidate docs' shingle sets (small by construction)."""
    raw = minhash_candidates(docs).take_all()
    cand = [{"a": a, "b": b} for a, b in sorted({(int(c["a"]), int(c["b"])) for c in raw})]
    if not cand:
        return pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
             "jaccard": pa.array([], pa.float64())}
        )
    need = sorted({c["a"] for c in cand} | {c["b"] for c in cand})
    need_set = set(need)
    texts = (
        docs.map_batches(
            lambda df: df[df["doc_id"].isin(need_set)][["doc_id", "text"]],
            batch_format="pandas",
        )
        .take_all()
    )
    sh = {r["doc_id"]: char_shingles(r["text"], shingle_k) for r in texts}
    rows = []
    for c in cand:
        j = jaccard(sh[c["a"]], sh[c["b"]])
        if j >= threshold:
            rows.append((int(c["a"]), int(c["b"]), round(j, 6)))
    rows.sort()
    return pa.table(
        {
            "a": pa.array([r[0] for r in rows], pa.int64()),
            "b": pa.array([r[1] for r in rows], pa.int64()),
            "jaccard": pa.array([r[2] for r in rows], pa.float64()),
        }
    )


def simhash_signatures(docs: Dataset) -> Dataset:
    """(doc_id, simhash) -- one 64-bit signature per document."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "simhash": np.asarray(
                    [simhash64(t) for t in df["text"]], np.int64
                ),
            }
        )

    return docs.map_batches(fn, batch_format="pandas")


def ngram_jaccard_pairs(
    docs: Dataset, threshold: float = 0.3, k: int = 3, group_col: str = "source"
) -> Dataset:
    """Exact n-gram Jaccard near-dup pairs *within* a grouping column
    (e.g. same source): groupby(group_col) keeps the pairwise work
    partition-local. Columns: (a, b, jaccard). Uses UNhashed character
    shingles (char_shingles_str) so the result is collision-free and
    exactly reproducible by the DuckDB oracle (SQL_NGRAM_JACCARD)."""

    def per_group(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("doc_id")
        ids = df["doc_id"].to_numpy(np.int64)
        sh = [char_shingles_str(t, k) for t in df["text"]]
        a, b, js = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                jj = jaccard(sh[i], sh[j])
                if jj >= threshold:
                    a.append(ids[i]); b.append(ids[j]); js.append(round(jj, 6))
        return pd.DataFrame(
            {"a": np.asarray(a, np.int64), "b": np.asarray(b, np.int64),
             "jaccard": np.asarray(js, np.float64)}
        )

    return docs.groupby(group_col).map_groups(per_group, batch_format="pandas")
