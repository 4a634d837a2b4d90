"""Similarity search over the ``embeddings`` table (list<float> column).

* ``ann_topk``          -- brute-force cosine top-k: the query matrix is
  broadcast via ``ray.put`` once, every batch does one float64 matmul
  against it and emits only its partial top-k; the driver merges k x
  #batches rows. This is the exact baseline; at 10^12 scale the same
  stage runs behind an IVF/LSH bucket filter (below).
* ``lsh_bucket_topk``   -- the scale path: sign-random-projection
  buckets colocate likely-similar vectors so each query only scans its
  own bucket(s). Recall-tested against the brute-force baseline.
* ``cosine_neardup_pairs`` -- all pairs with cosine >= tau, computed
  blockwise against the broadcast matrix (exact; SQL-oracled).
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset


def _normalize(m: np.ndarray) -> np.ndarray:
    m = m.astype(np.float64)
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _batch_matrix(df: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
    ids = df["vec_id"].to_numpy(np.int64)
    m = np.stack(df["embedding"].to_numpy())
    return ids, m


def ann_topk(
    embeddings: Dataset,
    query_ids: list[int],
    k: int = 10,
    include_self: bool = False,
) -> pa.Table:
    """Exact cosine top-k for each query vector. Output
    (query_id, vec_id, sim) with sim rounded to 6 and deterministic
    (sim desc, vec_id asc) tie order."""
    qset = {int(q) for q in query_ids}
    qdf = embeddings.map_batches(
        lambda df: df[df["vec_id"].isin(qset)], batch_format="pandas"
    ).to_pandas()
    qids, qm = _batch_matrix(qdf)
    qn = _normalize(qm)
    qref = ray.put((qids, qn))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        qids_, qn_ = ray.get(qref)
        ids, m = _batch_matrix(df)
        sims = _normalize(m) @ qn_.T  # (batch, nq)
        out = []
        for qi, qid in enumerate(qids_):
            s = sims[:, qi]
            mask = np.ones(len(ids), bool) if include_self else ids != qid
            idx = np.nonzero(mask)[0]
            if not len(idx):
                continue
            top = idx[np.argsort(-s[idx], kind="stable")[:k]]
            out.append(
                pd.DataFrame(
                    {"query_id": qid, "vec_id": ids[top], "sim": s[top]}
                )
            )
        if not out:
            return pd.DataFrame(
                {"query_id": np.empty(0, np.int64),
                 "vec_id": np.empty(0, np.int64),
                 "sim": np.empty(0, np.float64)}
            )
        return pd.concat(out, ignore_index=True)

    parts = embeddings.map_batches(partial, batch_format="pandas").take_all()
    best: dict[int, list] = {}
    for r in parts:
        # heap keyed by (sim, -vec_id) so ties resolve to the smaller id
        heapq.heappush(
            best.setdefault(int(r["query_id"]), []),
            (float(r["sim"]), -int(r["vec_id"])),
        )
        if len(best[int(r["query_id"])]) > k:
            heapq.heappop(best[int(r["query_id"])])
    rows = []
    for qid in sorted(best):
        ranked = sorted(best[qid], key=lambda t: (-t[0], -t[1]))
        for sim, nvid in ranked[:k]:
            rows.append((qid, -nvid, round(sim, 6)))
    return pa.table(
        {
            "query_id": pa.array([r[0] for r in rows], pa.int64()),
            "vec_id": pa.array([r[1] for r in rows], pa.int64()),
            "sim": pa.array([r[2] for r in rows], pa.float64()),
        }
    )


def cosine_neardup_pairs(embeddings: Dataset, tau: float) -> pa.Table:
    """All unordered pairs (a < b) with cosine >= tau. Exact: each batch
    multiplies against the full broadcast (normalized) matrix -- right
    shape for 'small enough to broadcast' sides; beyond that, swap the
    broadcast for LSH buckets (embedding-cosine near-dup at corpus
    scale). Output (a, b, sim) rounded to 6."""
    full = embeddings.to_pandas()
    ids, m = _batch_matrix(full)
    order = np.argsort(ids)
    ids, m = ids[order], _normalize(m)[order]
    ref = ray.put((ids, m))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        all_ids, all_m = ray.get(ref)
        bids, bm = _batch_matrix(df)
        sims = _normalize(bm) @ all_m.T
        a, b, s = [], [], []
        for i, bid in enumerate(bids):
            mask = (sims[i] >= tau) & (all_ids > bid)
            js = np.nonzero(mask)[0]
            a.extend([bid] * len(js))
            b.extend(all_ids[js].tolist())
            s.extend(sims[i, js].tolist())
        return pd.DataFrame(
            {"a": np.asarray(a, np.int64), "b": np.asarray(b, np.int64),
             "sim": np.round(np.asarray(s, np.float64), 6)}
        )

    parts = embeddings.map_batches(partial, batch_format="pandas").take_all()
    rows = sorted((int(r["a"]), int(r["b"]), float(r["sim"])) for r in parts)
    return pa.table(
        {
            "a": pa.array([r[0] for r in rows], pa.int64()),
            "b": pa.array([r[1] for r in rows], pa.int64()),
            "sim": pa.array([r[2] for r in rows], pa.float64()),
        }
    )


def ivf_topk(
    embeddings: Dataset,
    query_ids: list[int],
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    seed: int = 7,
    kmeans_iters: int = 8,
    train_sample: int = 2048,
) -> pa.Table:
    """IVF (inverted-file) ANN: a k-means coarse quantizer (trained on a
    driver-side sample, broadcast) assigns each vector to its nearest
    centroid list; a query scans only its n_probe closest lists. The
    other standard scale path next to LSH bucketing; recall-tested
    against the brute-force baseline. Output schema matches ann_topk."""
    sample = embeddings.take(train_sample)
    m = _normalize(np.stack([np.asarray(r["embedding"]) for r in sample]))
    rng = np.random.default_rng(seed)
    centroids = m[rng.choice(len(m), size=min(n_lists, len(m)), replace=False)]
    for _ in range(kmeans_iters):  # spherical k-means on the sample
        assign = np.argmax(m @ centroids.T, axis=1)
        for c in range(len(centroids)):
            sel = m[assign == c]
            if len(sel):
                v = sel.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    centroids[c] = v / n
    cref = ray.put(centroids)

    def add_list(df: pd.DataFrame) -> pd.DataFrame:
        cents = ray.get(cref)
        ids, mm = _batch_matrix(df)
        out = df[["vec_id", "embedding"]].copy()
        out["ivf_list"] = np.argmax(_normalize(mm) @ cents.T, axis=1)
        return out

    listed = embeddings.map_batches(add_list, batch_format="pandas")

    qset = {int(qq) for qq in query_ids}
    qdf = embeddings.map_batches(
        lambda df: df[df["vec_id"].isin(qset)], batch_format="pandas"
    ).to_pandas()
    qids, qm = _batch_matrix(qdf)
    qn = _normalize(qm)
    probes = np.argsort(-(qn @ centroids.T), axis=1)[:, :n_probe]
    wanted: dict[int, list[int]] = {}
    for qi in range(len(qids)):
        for lst in probes[qi]:
            wanted.setdefault(int(lst), []).append(qi)
    wref = ray.put((qids, qn, wanted))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        qids_, qn_, wanted_ = ray.get(wref)
        rows = []
        for lst, qis in wanted_.items():
            sub = df[df["ivf_list"] == lst]
            if sub.empty:
                continue
            ids, mm = _batch_matrix(sub)
            sims = _normalize(mm) @ qn_.T
            for qi in qis:
                qid = qids_[qi]
                idx = np.nonzero(ids != qid)[0]
                if not len(idx):
                    continue
                top = idx[np.argsort(-sims[idx, qi], kind="stable")[:k]]
                rows.append(pd.DataFrame(
                    {"query_id": qid, "vec_id": ids[top], "sim": sims[top, qi]}
                ))
        if not rows:
            return pd.DataFrame(
                {"query_id": np.empty(0, np.int64),
                 "vec_id": np.empty(0, np.int64),
                 "sim": np.empty(0, np.float64)}
            )
        return pd.concat(rows, ignore_index=True)

    parts = listed.map_batches(partial, batch_format="pandas").take_all()
    best: dict[int, list[tuple[float, int]]] = {}
    for r in parts:
        best.setdefault(int(r["query_id"]), []).append(
            (float(r["sim"]), int(r["vec_id"]))
        )
    rows_out = []
    for qid in sorted(best):
        for sim, vid in sorted(best[qid], key=lambda t: (-t[0], t[1]))[:k]:
            rows_out.append((qid, vid, round(sim, 6)))
    return pa.table(
        {
            "query_id": pa.array([r[0] for r in rows_out], pa.int64()),
            "vec_id": pa.array([r[1] for r in rows_out], pa.int64()),
            "sim": pa.array([r[2] for r in rows_out], pa.float64()),
        }
    )


def lsh_bucket_topk(
    embeddings: Dataset,
    query_ids: list[int],
    k: int = 10,
    n_bits: int = 8,
    seed: int = 42,
) -> pa.Table:
    """Scale-path ANN: sign-random-projection bucketing (n_bits hyper-
    planes -> 2^n_bits buckets), queries scan only rows whose bucket is
    within hamming distance 1 of the query bucket. Probabilistic recall
    (tested vs brute force); same output schema as ann_topk."""
    sample = embeddings.take(1)
    dim = len(sample[0]["embedding"])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_bits))
    pref = ray.put(planes)

    def bucket_of(m: np.ndarray, planes_: np.ndarray) -> np.ndarray:
        bits = (m @ planes_) > 0
        return (bits * (1 << np.arange(n_bits))).sum(axis=1).astype(np.int64)

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        planes_ = ray.get(pref)
        ids, m = _batch_matrix(df)
        out = df[["vec_id", "embedding"]].copy()
        out["bucket"] = bucket_of(_normalize(m), planes_)
        return out

    bucketed = embeddings.map_batches(add_bucket, batch_format="pandas")

    qset = {int(q) for q in query_ids}
    qdf = embeddings.map_batches(
        lambda df: df[df["vec_id"].isin(qset)], batch_format="pandas"
    ).to_pandas()
    qids, qm = _batch_matrix(qdf)
    qn = _normalize(qm)
    qb = bucket_of(qn, planes)
    # query bucket + all hamming-1 neighbors
    wanted: dict[int, list[int]] = {}
    for qi, b in enumerate(qb):
        bs = [int(b)] + [int(b) ^ (1 << i) for i in range(n_bits)]
        for bb in bs:
            wanted.setdefault(bb, []).append(qi)
    wref = ray.put((qids, qn, wanted))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        qids_, qn_, wanted_ = ray.get(wref)
        rows = []
        for bb, qis in wanted_.items():
            sub = df[df["bucket"] == bb]
            if sub.empty:
                continue
            ids, m = _batch_matrix(sub)
            sims = _normalize(m) @ qn_.T
            for qi in qis:
                qid = qids_[qi]
                mask = ids != qid
                idx = np.nonzero(mask)[0]
                if not len(idx):
                    continue
                top = idx[np.argsort(-sims[idx, qi], kind="stable")[:k]]
                rows.append(
                    pd.DataFrame(
                        {"query_id": qid, "vec_id": ids[top],
                         "sim": sims[top, qi]}
                    )
                )
        if not rows:
            return pd.DataFrame(
                {"query_id": np.empty(0, np.int64),
                 "vec_id": np.empty(0, np.int64),
                 "sim": np.empty(0, np.float64)}
            )
        return pd.concat(rows, ignore_index=True)

    parts = bucketed.map_batches(partial, batch_format="pandas").take_all()
    best: dict[int, list[tuple[float, int]]] = {}
    for r in parts:
        best.setdefault(int(r["query_id"]), []).append(
            (float(r["sim"]), int(r["vec_id"]))
        )
    rows_out = []
    for qid in sorted(best):
        ranked = sorted(best[qid], key=lambda t: (-t[0], t[1]))[:k]
        for sim, vid in ranked:
            rows_out.append((qid, vid, round(sim, 6)))
    return pa.table(
        {
            "query_id": pa.array([r[0] for r in rows_out], pa.int64()),
            "vec_id": pa.array([r[1] for r in rows_out], pa.int64()),
            "sim": pa.array([r[2] for r in rows_out], pa.float64()),
        }
    )
