"""Similarity search over the ``embeddings`` table (list<float> column).

* ``ann_topk``          -- brute-force cosine top-k: the query matrix is
  broadcast via ``ray.put`` once, every batch does one float64 matmul
  against it and emits only its partial top-k; the driver merges k x
  #batches rows. This is the exact baseline; at 10^12 scale the same
  stage runs behind an IVF/LSH bucket filter (below).
* ``lsh_bucket_topk``   -- the scale path: sign-random-projection
  buckets colocate likely-similar vectors so each query only scans its
  own bucket(s). Recall-tested against the brute-force baseline.
* ``cosine_neardup_pairs`` -- all pairs with cosine >= tau via a
  distributed block-pair cross join over object-store Arrow blocks
  (exact; SQL-oracled; no driver materialization of the dataset).

All intermediate embedding blocks are Arrow ``fixed_size_list<float64>``
(zero-copy matmul loads, no object-dtype size-estimation noise).
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


def _query_matrix(
    embeddings: Dataset, query_ids: list[int]
) -> tuple[np.ndarray, np.ndarray]:
    """Extract the query vectors with a pyarrow-native isin filter: the
    raw embeddings table never converts to pandas (object-dtype blocks
    made Ray's size estimator log per-batch errors and killed zero-copy)."""
    import pyarrow.compute as pc

    vals = pa.array(sorted({int(q) for q in query_ids}), pa.int64())

    def filt(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["vec_id"], value_set=vals))

    rows = embeddings.map_batches(filt, batch_format="pyarrow").take_all()
    ids = np.array([r["vec_id"] for r in rows], np.int64)
    m = (
        np.stack([np.asarray(r["embedding"], np.float64) for r in rows])
        if rows else np.empty((0, 0), np.float64)
    )
    return ids, m


def _pack(ids: np.ndarray, m: np.ndarray, extra: dict | None = None) -> pa.Table:
    """(ids, matrix) -> Arrow table with a fixed_size_list embedding
    column: zero-copy loads downstream and no object-dtype size-
    estimation noise in Ray's block planner."""
    cols: dict = {"vec_id": pa.array(ids, pa.int64())}
    cols["embedding"] = pa.FixedSizeListArray.from_arrays(
        pa.array(np.ascontiguousarray(m, dtype=np.float64).ravel(), pa.float64()),
        m.shape[1],
    )
    for name, arr in (extra or {}).items():
        cols[name] = pa.array(arr)
    return pa.table(cols)


def _unpack(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """Arrow table -> (ids, float64 matrix), zero-copy for
    fixed_size_list embeddings."""
    ids = t["vec_id"].to_numpy()
    col = t["embedding"].combine_chunks()
    if pa.types.is_fixed_size_list(col.type):
        flat = col.values.to_numpy(zero_copy_only=False)
        m = flat.reshape(len(t), col.type.list_size)
    else:
        flat = col.flatten().to_numpy(zero_copy_only=False)
        m = flat.reshape(len(t), -1)
    return ids, np.asarray(m, np.float64)


def _int8_roundtrip(m: np.ndarray) -> np.ndarray:
    """Symmetric int8 quantize-dequantize (same codec as quantize_int8):
    the vectors an int8 store would actually serve."""
    a = np.abs(m).max(axis=1, keepdims=True)
    with np.errstate(divide="ignore", invalid="ignore"):
        q = np.floor(m * 127.0 / a + 0.5)
    q[np.broadcast_to(a == 0.0, q.shape)] = 0.0
    return q * (a / 127.0)


def ann_topk(
    embeddings: Dataset,
    query_ids: list[int],
    k: int = 10,
    include_self: bool = False,
    int8: bool = False,
) -> pa.Table:
    """Exact cosine top-k for each query vector. Output
    (query_id, vec_id, sim) with sim rounded to 6 and deterministic
    (sim desc, vec_id asc) tie order. ``int8=True`` runs the same
    search over int8 quantize-dequantized vectors (both sides) — the
    accuracy a 4x-compressed vector store delivers."""
    qids, qm = _query_matrix(embeddings, query_ids)
    if int8:
        qm = _int8_roundtrip(qm)
    qn = _normalize(qm)
    qref = ray.put((qids, qn))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        qids_, qn_ = ray.get(qref)
        ids, m = _batch_matrix(df)
        if int8:
            m = _int8_roundtrip(m)
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


@ray.remote
def _block_pair_sims(ta: pa.Table, tb: pa.Table, same: bool, tau: float) -> pa.Table:
    """One cross-join cell: exact cosine between two normalized blocks,
    emitting pairs (min_id, max_id, sim >= tau). Blocks arrive by object
    store ref (zero-copy Arrow); the result is only the qualifying pairs."""
    ids_a, ma = _unpack(ta)
    ids_b, mb = _unpack(tb)
    if not len(ids_a) or not len(ids_b):
        return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                         "sim": pa.array([], pa.float64())})
    sims = ma @ mb.T
    if same:
        sel = (sims >= tau) & (ids_a[:, None] < ids_b[None, :])
    else:
        sel = sims >= tau  # disjoint id sets; orient below
    ii, jj = np.nonzero(sel)
    a = ids_a[ii]
    b = ids_b[jj]
    lo = np.minimum(a, b)
    hi = np.maximum(a, b)
    return pa.table(
        {"a": pa.array(lo, pa.int64()), "b": pa.array(hi, pa.int64()),
         "sim": pa.array(np.round(sims[ii, jj], 6), pa.float64())}
    )


def cosine_neardup_pairs(
    embeddings: Dataset, tau: float, n_shards: int = 8
) -> pa.Table:
    """All unordered pairs (a < b) with cosine >= tau -- EXACT, computed
    as a distributed block-pair cross join: the dataset is normalized
    and packed into n_shards Arrow blocks that stay in the object store;
    one Ray task per block pair (i <= j) computes its sims. The driver
    holds only block refs and the final qualifying-pair table (the query
    result). Raw tasks are used because a cross join is the one shape
    the Dataset API cannot express. O(n^2/P) compute is inherent to the
    exact op; at corpus scale run the LSH/IVF bucketing (lsh_bucket_topk
    / ivf_topk) as the candidate generator and keep this as the
    per-bucket verifier. Output (a, b, sim) rounded to 6."""

    def norm_block(df: pd.DataFrame) -> pa.Table:
        ids, m = _batch_matrix(df)
        return _pack(ids, _normalize(m))

    norm = (
        embeddings.map_batches(norm_block, batch_format="pandas")
        .repartition(n_shards)
        .materialize()
    )
    refs = norm.to_arrow_refs()
    tasks = [
        _block_pair_sims.remote(refs[i], refs[j], i == j, tau)
        for i in range(len(refs))
        for j in range(i, len(refs))
    ]
    parts = [t for t in ray.get(tasks) if t.num_rows]
    if not parts:
        return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                         "sim": pa.array([], pa.float64())})
    return pa.concat_tables(parts).sort_by(
        [("a", "ascending"), ("b", "ascending")]
    )


def lsh_neardup_pairs(
    embeddings: Dataset,
    tau: float,
    n_bands: int = 8,
    band_bits: int = 6,
    seed: int = 13,
) -> pa.Table:
    """Composed bucketed near-dup -- the corpus-scale variant of
    ``cosine_neardup_pairs``: sign-random-projection LSH generates the
    candidate buckets (n_bands independent bands of band_bits hyperplanes
    each; a pair collides somewhere with prob 1-(1-p^r)^b, p = 1 -
    angle/pi), and each (band, bucket) group runs the EXACT all-pairs
    cosine verifier over only its own vectors. End-to-end a Dataset
    pipeline: one map_batches (normalize + bucket, vectors replicated
    n_bands times), one groupby exchange per band-bucket for the verify,
    one pair-bucket exchange to dedupe pairs found in multiple bands.
    O(sum_g |g|^2) verify work instead of O(n^2); probabilistic recall
    (recall-tested vs the exact baseline; raise n_bands for tighter
    guarantees). Partitioning assumption: a single (band, bucket) group
    fits one task -- at crawl scale add more band bits to cap bucket
    sizes (queries.q_embed_neardup_lsh scales band_bits with the input
    row count). Output (a, b, sim) exactly like cosine_neardup_pairs.

    The projection planes are regenerated per task from the fixed seed
    and the batch's own embedding width (deterministic PCG64 stream, a
    few KB of work) instead of a take(1) dim probe + broadcast: one
    fewer pipeline-prefix read job per query and nothing to ship.

    Both group stages run on the static bucket exchange rather than
    Ray's sort-based groupby: the key spaces are small (band buckets,
    32 pair buckets), so boundary-sampling sort machinery is pure
    overhead here, and the exchange's typed-empty contract keeps
    schema-less empty pandas blocks out of the stream (Ray's map_groups
    emits one for every sorted block that holds zero groups)."""
    from ..stages.exchange import static_group_exchange

    _pair_buckets = 32
    _exch_parts = 32  # band-bucket hash partitions for the verify stage

    def add_band_buckets(df: pd.DataFrame) -> pa.Table:
        ids, m = _batch_matrix(df)
        planes_ = np.random.default_rng(seed).standard_normal(
            (m.shape[1], n_bands * band_bits)
        )
        mn = _normalize(m)
        bits = (mn @ planes_) > 0  # (n, bands*bits)
        weights = 1 << np.arange(band_bits, dtype=np.int64)
        bkeys = np.empty((len(ids), n_bands), np.int64)
        for band in range(n_bands):
            seg = bits[:, band * band_bits : (band + 1) * band_bits]
            bkeys[:, band] = (
                np.int64(band) << np.int64(band_bits)
            ) | (seg * weights).sum(axis=1)
        rep_ids = np.repeat(ids, n_bands)
        rep_m = np.repeat(mn, n_bands, axis=0)
        flat = bkeys.ravel()
        # Fibonacci-mix the band key into a dense exchange partition so
        # partitions stay balanced whatever (band, bucket) layout is
        bpart = (
            (flat * np.int64(-7046029254386353131)) >> np.int64(33)
        ) % np.int64(_exch_parts)
        return _pack(rep_ids, rep_m, {"bkey": flat, "bpart": bpart})

    _pairs_schema = pa.schema(
        [("a", pa.int64()), ("b", pa.int64()), ("sim", pa.float64()),
         ("pb", pa.int64())]
    )

    def verify_partition(t: pa.Table) -> pa.Table:
        """One exchange partition = many whole band buckets; verify each
        bucket's pairs with a dense sim matrix over just that bucket."""
        if t.num_rows < 2:
            return _pairs_schema.empty_table()
        order = np.argsort(t["bkey"].to_numpy(), kind="stable")
        t = t.take(pa.array(order))
        keys = t["bkey"].to_numpy()
        ids_all, m_all = _unpack(t)
        bounds = np.flatnonzero(np.diff(keys)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(keys)]))
        outs_a, outs_b, outs_s = [], [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            ids, m = ids_all[s:e], m_all[s:e]
            sims = m @ m.T  # rows arrive pre-normalized
            sel = (sims >= tau) & (ids[:, None] < ids[None, :])
            ii, jj = np.nonzero(sel)
            if not len(ii):
                continue
            outs_a.append(ids[ii])
            outs_b.append(ids[jj])
            outs_s.append(np.round(sims[ii, jj], 6))
        if not outs_a:
            return _pairs_schema.empty_table()
        a = np.concatenate(outs_a)
        b = np.concatenate(outs_b)
        return pa.table(
            {
                "a": pa.array(a, pa.int64()),
                "b": pa.array(b, pa.int64()),
                "sim": pa.array(np.concatenate(outs_s), pa.float64()),
                "pb": pa.array(
                    (a * np.int64(1000003) + b) % _pair_buckets, pa.int64()
                ),
            }
        )

    def dedupe_partition(t: pa.Table) -> pa.Table:
        df = t.to_pandas().drop_duplicates(["a", "b"])[["a", "b", "sim"]]
        return pa.Table.from_pandas(df, preserve_index=False)

    verified = static_group_exchange(
        embeddings.map_batches(add_band_buckets, batch_format="pandas"),
        "bpart", _exch_parts, verify_partition,
        empty_schema=_pairs_schema, drop_empty=True,
    )
    out = static_group_exchange(
        verified, "pb", _pair_buckets, dedupe_partition,
        empty_schema=pa.schema(
            [("a", pa.int64()), ("b", pa.int64()), ("sim", pa.float64())]
        ),
        drop_empty=True,
    ).to_pandas()
    if not len(out):
        return pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
             "sim": pa.array([], pa.float64())}
        )
    out = out.sort_values(["a", "b"]).reset_index(drop=True)
    return pa.table(
        {
            "a": pa.array(out["a"].to_numpy(np.int64), pa.int64()),
            "b": pa.array(out["b"].to_numpy(np.int64), pa.int64()),
            "sim": pa.array(out["sim"].to_numpy(np.float64), pa.float64()),
        }
    )


N_ANN_PARTS = 32  # bucket-partition count for the probe layout


@ray.remote
def _probe_part_task(t: pa.Table, key: str, part_wanted: dict, q, k: int):
    """Probe ONE bucket partition: scan only the wanted buckets inside
    it. ``q`` arrives as the broadcast (qids, qn) object (Ray resolves
    the top-level ref). Returns (partial top-k rows, probed row count)."""
    import pyarrow.compute as pc

    qids_, qn_ = q
    rows = []
    probed = 0
    if key not in t.column_names:  # empty partition (no rows hashed here)
        t = pa.table({})
        part_wanted = {}
    for bb, qis in part_wanted.items():
        sub = t.filter(pc.equal(t[key], bb))
        if not sub.num_rows:
            continue
        probed += sub.num_rows
        ids, m = _unpack(sub)
        sims = m @ qn_.T  # blocks stored pre-normalized
        for qi in qis:
            qid = qids_[qi]
            idx = np.nonzero(ids != qid)[0]
            if not len(idx):
                continue
            top = idx[np.argsort(-sims[idx, qi], kind="stable")[:k]]
            rows.append(
                pd.DataFrame(
                    {"query_id": qid, "vec_id": ids[top], "sim": sims[top, qi]}
                )
            )
    if not rows:
        out = pd.DataFrame(
            {"query_id": np.empty(0, np.int64),
             "vec_id": np.empty(0, np.int64),
             "sim": np.empty(0, np.float64)}
        )
    else:
        out = pd.concat(rows, ignore_index=True)
    return out, probed


def _probe_partitioned(
    ds: Dataset, key: str, wanted: dict, qids, qn, k: int,
    stats: dict | None = None,
) -> pa.Table:
    """The ANN probe over a BUCKET-PARTITIONED layout: materialize ``ds``
    partitioned by ``hash(bucket) = bucket % N_ANN_PARTS`` (the static
    exchange), then probe only the partitions containing wanted buckets.
    Probes therefore read a small fraction of the rows instead of
    filtering every block -- the layout a repeated-query serving path
    wants (write the partitioned dataset once, probe many times).
    ``stats``, if given, receives probed_rows / total_rows."""
    from ..stages.exchange import static_group_exchange
    from ..stages.sharded import materialized_blocks

    n_parts = N_ANN_PARTS

    def add_part(t: pa.Table) -> pa.Table:
        kv = t[key].to_numpy(zero_copy_only=False)
        return t.append_column(
            "part", pa.array((kv % n_parts).astype(np.int64), pa.int64())
        )

    parted = static_group_exchange(
        ds.map_batches(add_part, batch_format="pyarrow"), "part", n_parts,
        lambda t: t,
    )
    blocks = materialized_blocks(parted)  # block i == partition i
    per_part: dict[int, dict[int, list[int]]] = {}
    for bb, qis in wanted.items():
        per_part.setdefault(int(bb) % n_parts, {})[int(bb)] = qis
    qref = ray.put((qids, qn))
    outs = ray.get(
        [
            _probe_part_task.remote(blocks[p][0], key, pw, qref, k)
            for p, pw in sorted(per_part.items())
        ]
    )
    if stats is not None:
        stats["probed_rows"] = int(sum(o[1] for o in outs))
        stats["total_rows"] = int(sum(n for _, n in blocks))
        stats["partitions_read"] = len(per_part)
        stats["partitions_total"] = n_parts
    best: dict[int, list[tuple[float, int]]] = {}
    for df, _ in outs:
        for qid, vid, sim in zip(
            df["query_id"].to_numpy(np.int64),
            df["vec_id"].to_numpy(np.int64),
            df["sim"].to_numpy(np.float64),
        ):
            best.setdefault(int(qid), []).append((float(sim), int(vid)))
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


def _train_spherical_kmeans(
    embeddings: Dataset, n_lists: int, seed: int, kmeans_iters: int,
    train_sample: int,
) -> np.ndarray:
    """Spherical k-means on a bounded driver-side sample — the shared
    coarse quantizer of ivf_topk and embed_clusters. limit() pushes the
    bound into the read so only the first blocks materialize. The sample
    is sorted by vec_id before training: Ray's streaming executor does
    NOT guarantee row order, so an order-sensitive init (rng.choice into
    the stacked matrix) would make the centroids — and the committed
    VALUES goldens — depend on block arrival order (observed run-to-run
    within one session). With the sort, training is bit-deterministic
    whenever the dataset fits the sample bound (the golden regime); on
    bigger data only the sample MEMBERSHIP can vary, never the
    treatment of a given sample."""
    sample = (
        embeddings.select_columns(["vec_id", "embedding"])
        .limit(train_sample)
        .to_pandas()
        .sort_values("vec_id")["embedding"]
    )
    # float64 like the previous take() row path (float32 k-means drifts
    # the centroids and would invalidate the committed VALUES goldens)
    m = _normalize(np.stack([np.asarray(v) for v in sample]).astype(np.float64))
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
    return centroids


def embed_clusters(
    embeddings: Dataset,
    n_clusters: int = 8,
    seed: int = 7,
    kmeans_iters: int = 8,
    train_sample: int = 2048,
) -> Dataset:
    """Embedding-space clustering (the semantic-dedup / topic-mixing
    building block): train a spherical k-means quantizer on a bounded
    driver sample, broadcast the tiny centroid matrix once (ray.put),
    and assign EVERY vector map-only — (vec_id, cluster, sim) where sim
    is the cosine to the assigned centroid. No shuffle anywhere; the
    full dataset streams through one vectorized matmul per batch.
    Deterministic under the fixed seed -> committed VALUES golden."""
    centroids = _train_spherical_kmeans(
        embeddings, n_clusters, seed, kmeans_iters, train_sample
    )
    cref = ray.put(centroids)

    def assign(df: pd.DataFrame) -> pa.Table:
        cents = ray.get(cref)
        ids, m = _batch_matrix(df)
        mn = _normalize(m)
        sims = mn @ cents.T
        best = np.argmax(sims, axis=1)
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "cluster": pa.array(best.astype(np.int32)),
            "sim": pa.array(
                np.round(sims[np.arange(len(best)), best], 6), pa.float64()),
        })

    return embeddings.map_batches(assign, batch_format="pandas")


def ivf_topk(
    embeddings: Dataset,
    query_ids: list[int],
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    seed: int = 7,
    kmeans_iters: int = 8,
    train_sample: int = 2048,
    stats: dict | None = None,
) -> pa.Table:
    """IVF (inverted-file) ANN: a k-means coarse quantizer (trained on a
    driver-side sample, broadcast) assigns each vector to its nearest
    centroid list; the listed dataset is materialized PARTITIONED by
    list (static exchange) and a query probes only the partitions of its
    n_probe closest lists (probed rows << total; ``stats`` reports the
    counts). The other standard scale path next to LSH bucketing;
    recall-tested against the brute-force baseline. Output schema
    matches ann_topk."""
    centroids = _train_spherical_kmeans(
        embeddings, n_lists, seed, kmeans_iters, train_sample
    )
    cref = ray.put(centroids)

    def add_list(df: pd.DataFrame) -> pa.Table:
        cents = ray.get(cref)
        ids, mm = _batch_matrix(df)
        mn = _normalize(mm)
        return _pack(
            ids, mn,
            {"ivf_list": np.argmax(mn @ cents.T, axis=1).astype(np.int32)},
        )

    listed = embeddings.map_batches(add_list, batch_format="pandas")

    qids, qm = _query_matrix(embeddings, query_ids)
    qn = _normalize(qm)
    probes = np.argsort(-(qn @ centroids.T), axis=1)[:, :n_probe]
    wanted: dict[int, list[int]] = {}
    for qi in range(len(qids)):
        for lst in probes[qi]:
            wanted.setdefault(int(lst), []).append(qi)

    return _probe_partitioned(
        listed, "ivf_list", wanted, qids, qn, k, stats=stats
    )


def lsh_bucket_topk(
    embeddings: Dataset,
    query_ids: list[int],
    k: int = 10,
    n_bits: int = 8,
    seed: int = 42,
    stats: dict | None = None,
) -> pa.Table:
    """Scale-path ANN: sign-random-projection bucketing (n_bits hyper-
    planes -> 2^n_bits buckets); the bucketed dataset is materialized
    PARTITIONED by bucket hash (static exchange) and queries probe only
    the partitions holding their bucket or a hamming-1 neighbor
    (probed rows << total; ``stats`` reports the counts). Probabilistic
    recall (tested vs brute force); same output schema as ann_topk.

    The hyperplanes are regenerated per task from the fixed seed and the
    embedding width (deterministic PCG64), so there is no take(1) dim
    probe: the query-matrix pass (which every ANN query already runs) is
    the only pipeline-prefix read."""

    def _planes(dim: int) -> np.ndarray:
        return np.random.default_rng(seed).standard_normal((dim, n_bits))

    def bucket_of(m: np.ndarray, planes_: np.ndarray) -> np.ndarray:
        bits = (m @ planes_) > 0
        return (bits * (1 << np.arange(n_bits))).sum(axis=1).astype(np.int64)

    def add_bucket(df: pd.DataFrame) -> pa.Table:
        ids, m = _batch_matrix(df)
        mn = _normalize(m)
        return _pack(ids, mn, {"bucket": bucket_of(mn, _planes(m.shape[1]))})

    bucketed = embeddings.map_batches(add_bucket, batch_format="pandas")

    qids, qm = _query_matrix(embeddings, query_ids)
    qn = _normalize(qm)
    qb = bucket_of(qn, _planes(qm.shape[1]))
    # query bucket + all hamming-1 neighbors
    wanted: dict[int, list[int]] = {}
    for qi, b in enumerate(qb):
        bs = [int(b)] + [int(b) ^ (1 << i) for i in range(n_bits)]
        for bb in bs:
            wanted.setdefault(bb, []).append(qi)

    return _probe_partitioned(
        bucketed, "bucket", wanted, qids, qn, k, stats=stats
    )


def quantize_int8(embeddings: Dataset) -> Dataset:
    """Symmetric int8 quantization of an embedding column (the standard
    4x compression of a vector store before ANN serving): per-vector
    scale = max(|v|)/127, q_i = floor(v_i/scale + 0.5). Map-only and
    vectorized via reduceat over the flattened list column — no Python
    loop over rows, no shuffle. Emits per-vector integrity checksums
    (sum and |.|-sum of the quantized codes) instead of the code bytes
    so the SQL oracle can restate the op exactly; arithmetic is forced
    to float64 on both sides (float32 -> float64 is exact) for bit
    parity with DuckDB DOUBLE."""

    def fn(t: pa.Table) -> pa.Table:
        arr = t["embedding"].combine_chunks()
        offs = arr.offsets.to_numpy()
        flat = arr.flatten().to_numpy().astype(np.float64)
        widths = np.diff(offs)
        if (widths <= 0).any():
            raise ValueError("empty embedding row")
        m = np.maximum.reduceat(np.abs(flat), offs[:-1])
        mexp = np.repeat(m, widths)
        with np.errstate(divide="ignore", invalid="ignore"):
            q = np.floor(flat * 127.0 / mexp + 0.5)
        q[mexp == 0.0] = 0.0  # all-zero vector -> all-zero codes
        q_sum = np.add.reduceat(q, offs[:-1]).astype(np.int64)
        q_abs = np.add.reduceat(np.abs(q), offs[:-1]).astype(np.int64)
        return pa.table(
            {
                "vec_id": t["vec_id"],
                # half-AWAY-from-zero to the 9th decimal, matching DuckDB
                # round() in SQL_EMBED_QUANTIZE (np.round is half-to-even:
                # a value landing exactly on a half would diverge)
                "scale": pa.array(
                    np.floor(m / 127.0 * 1e9 + 0.5) / 1e9
                ),
                "q_sum": pa.array(q_sum),
                "q_abs_sum": pa.array(q_abs),
            }
        )

    return embeddings.map_batches(fn, batch_format="pyarrow")
