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


TOKEN_HASH_MASK = (1 << 63) - 1  # md5-64 folded into non-negative int64


def doc_top_terms(docs: Dataset, k: int = 3) -> Dataset:
    """Per-document top-``k`` salient terms by tf-idf — the standard
    document-keyword / topic-signal extractor for training-data curation
    (dataset mixing by topic, salient-term dedup keys, search indexing).

    idf uses the BM25 rational form ``(N - df + 0.5) / (df + 0.5)``
    rather than a logarithm ON PURPOSE: tf, df and N are exact integers,
    so the score is one IEEE division and one multiply — bit-identical
    between numpy and the DuckDB oracle (a log-based idf could differ in
    the last ulp and break the driver's value-hash compare).

    Plan (every stage streams; the vocabulary never lands on the driver):
    1. one metadata count for N;
    2. per-batch tf kernel: whitespace-split + explode + group inside the
       batch (docs are row-complete in their batch, so tf needs no
       shuffle); tokens get a 63-bit md5 join key;
    3. df = groupby-sum over per-batch partial (token, n_docs) counts —
       one row per distinct token per batch moves, not one per
       occurrence;
    4. tf x df: hash_join on the int64 token hash (fact-x-fact shuffle
       join — df is vocabulary-sized, NOT broadcastable at crawl scale)
       with a post-join token-string equality filter so a 63-bit hash
       collision can only drop to the slow path, never corrupt a score;
    5. grouped_topk per doc_id (score desc, token asc) — per-block
       partial prune before the per-doc shuffle.
    """
    from .joins import hash_join
    from .rank import grouped_topk
    from ..functions.text import md5_64

    n_docs = docs.count()

    def tf_partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = pd.DataFrame(
            {"doc_id": df["doc_id"].to_numpy(np.int64),
             "token": df["text"].str.split().to_numpy()}
        ).explode("token", ignore_index=True).dropna(subset=["token"])
        g = (
            toks.groupby(["doc_id", "token"], sort=False)
            .size().rename("tf").reset_index()
        )
        u, inv = np.unique(g["token"].to_numpy(object), return_inverse=True)
        h = np.fromiter(
            (md5_64(t) & TOKEN_HASH_MASK for t in u), np.int64, len(u)
        )
        g["thash"] = h[inv]
        g["tf"] = g["tf"].astype(np.int64)
        return g

    tf = docs.map_batches(tf_partial, batch_format="pandas")

    def df_partial(g: pd.DataFrame) -> pd.DataFrame:
        # tf rows are unique per (doc, token): token row count == df
        p = (
            g.groupby(["thash", "token"], sort=False)
            .size().rename("df").reset_index()
        )
        p["df"] = p["df"].astype(np.int64)
        return p.rename(columns={"token": "token_r"})

    df_tbl = (
        tf.map_batches(df_partial, batch_format="pandas")
        .groupby(["thash", "token_r"])
        .sum("df")
        .map_batches(
            lambda d: d.rename(columns={"sum(df)": "df"}),
            batch_format="pandas",
        )
    )

    joined = hash_join(
        tf, df_tbl, key="thash", right_columns=["token_r", "df"]
    )

    def score(d: pd.DataFrame) -> pd.DataFrame:
        d = d[d["token"] == d["token_r"]]  # 63-bit collision guard
        dfv = d["df"].to_numpy(np.int64)
        idf = (np.float64(n_docs) - dfv + 0.5) / (dfv + 0.5)
        return pd.DataFrame(
            {"doc_id": d["doc_id"].to_numpy(np.int64),
             "token": d["token"].to_numpy(object),
             "tf": d["tf"].to_numpy(np.int64),
             "df": dfv,
             "score": d["tf"].to_numpy(np.int64) * idf}
        )

    scored = joined.map_batches(score, batch_format="pandas")
    return grouped_topk(
        scored, ["doc_id"], "score", k, tie_col="token", descending=True
    )


def doc_boilerplate(docs: Dataset) -> Dataset:
    """Gopher-style repeated-n-gram boilerplate signal per document:
    (doc_id, n_bigrams, n_dup_bigrams, dup_frac) where ``n_dup_bigrams``
    counts every bigram OCCURRENCE whose bigram repeats within the doc
    and ``dup_frac = n_dup / n_bigrams`` (0.0 for docs with < 2 tokens).
    Crawl-curation quality rule: boilerplate-heavy pages (nav bars,
    cookie banners, templated listings) score high and get dropped.

    Map-only (a doc's bigrams live in its batch — no shuffle anywhere);
    the kernel is the flat-token-array + doc-boundary-mask construction
    bigram_topk uses, plus one grouped size() per batch. dup_frac is a
    single IEEE division of two exact integers, so it is bit-identical
    to the SQL oracle with no rounding."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.split()
        lens = toks.str.len().to_numpy(np.int64)
        n_big = np.maximum(lens - 1, 0)
        n_dup = np.zeros(len(df), np.int64)
        keep = lens > 1
        if keep.any():
            flat = np.concatenate(toks.to_numpy()[keep]).astype(object)
            mask = np.ones(len(flat) - 1, bool)
            ends = np.cumsum(lens[keep])[:-1] - 1
            mask[ends] = False
            big = (flat[:-1] + " " + flat[1:])[mask]
            rows = np.flatnonzero(keep)
            # flat is concatenated in `rows` order and the boundary mask
            # drops exactly one bigram per doc seam -> lens-1 per doc
            doc_of = np.repeat(rows, lens[keep] - 1)
            cnt = (
                pd.DataFrame({"row": doc_of, "bigram": big})
                .groupby(["row", "bigram"], sort=False).size()
            )
            dup = cnt[cnt > 1].groupby(level="row").sum()
            n_dup[dup.index.to_numpy()] = dup.to_numpy(np.int64)
        dup_frac = np.zeros(len(df), np.float64)
        nz = n_big > 0
        dup_frac[nz] = n_dup[nz].astype(np.float64) / n_big[nz]
        return pd.DataFrame(
            {"doc_id": df["doc_id"].to_numpy(np.int64),
             "n_bigrams": n_big, "n_dup_bigrams": n_dup,
             "dup_frac": dup_frac}
        )

    return docs.map_batches(fn, batch_format="pandas")


def _word_ngrams(df: pd.DataFrame, n: int) -> tuple[np.ndarray, np.ndarray]:
    """(row_index, gram) arrays of whitespace word n-grams per doc —
    flat-token construction with doc-boundary masking (the bigram_topk
    pattern generalized to n), no per-doc Python loop."""
    toks = df["text"].str.split()
    lens = toks.str.len().fillna(0).to_numpy(np.int64)
    keep = lens >= n
    if not keep.any():
        return np.empty(0, np.int64), np.empty(0, object)
    flat = np.concatenate(toks.to_numpy()[keep]).astype(object)
    kl = lens[keep]
    offs = np.concatenate([[0], np.cumsum(kl)[:-1]])
    cnts = kl - (n - 1)
    from ..mining_core import _range_gather

    starts = _range_gather(offs, cnts)  # gram start index into flat
    grams = flat[starts]
    for j in range(1, n):
        grams = grams + " "
        grams = grams + flat[starts + j]
    doc_of = np.repeat(np.flatnonzero(keep), cnts)
    return doc_of, grams


def decontaminate(docs: Dataset, benchmark: Dataset, n: int = 5) -> Dataset:
    """Test-set decontamination — the guard every LLM training corpus
    needs: flag documents sharing any word ``n``-gram with a benchmark
    set. Output one row per doc: (doc_id, n_overlap, contaminated)
    where n_overlap counts the doc's DISTINCT n-grams that appear in
    the benchmark and contaminated = (n_overlap > 0) as int64.

    Scale shape: the benchmark side is SMALL by definition (eval sets
    are MBs against a 100-TB corpus) — its distinct gram set is
    collected once, shipped once via ray.put, and every corpus batch
    probes it with one vectorized ``isin`` (exact string matching — no
    hash false positives). The corpus side is map-only: no shuffle, no
    driver materialization of anything corpus-sized."""
    import ray as _ray

    bparts = benchmark.map_batches(
        lambda df: pd.DataFrame({"gram": pd.unique(_word_ngrams(df, n)[1])}),
        batch_format="pandas",
    ).to_pandas()
    bref = _ray.put(frozenset(bparts["gram"]))

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        bench = _ray.get(bref)
        doc_of, grams = _word_ngrams(df, n)
        n_overlap = np.zeros(len(df), np.int64)
        if len(grams):
            fr = pd.DataFrame({"row": doc_of, "gram": grams}).drop_duplicates()
            hit = fr["gram"].isin(bench).to_numpy()
            n_overlap = np.bincount(
                fr["row"].to_numpy()[hit], minlength=len(df)
            ).astype(np.int64)
        return pd.DataFrame(
            {"doc_id": df["doc_id"].to_numpy(np.int64),
             "n_overlap": n_overlap,
             "contaminated": (n_overlap > 0).astype(np.int64)}
        )

    return docs.map_batches(probe, batch_format="pandas")
