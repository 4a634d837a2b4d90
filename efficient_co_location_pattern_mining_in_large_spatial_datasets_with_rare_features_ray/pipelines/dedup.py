"""Dataset-level deduplication pipelines over the ``documents`` table.

Scale notes (these shapes are what survives 10^12 rows; the testdata is
just small):

* exact dedup  -- hash-partition on a crc bucket of the text, exact
  text grouping *inside* each partition: the shuffle moves hashes+rows
  once, no driver loop.
* MinHash-LSH  -- signature per batch (vectorized), explode to
  (band, band_hash) rows, groupby band bucket -> candidate pairs,
  then a fully distributed verify (pair-dedup shuffle -> doc-bucket
  shingle attach -> pair-bucket exact Jaccard); the driver only ever
  sees the final verified pair table.
* SimHash      -- one signature row per doc; near-dup = small hamming
  distance, groupable by rotating bit-bands (same LSH shape).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from ..functions.dedup import (
    MINHASH_BANDS,
    band_hashes_batch,
    hashed_shingles_batch,
    minhash_signatures_batch,
    simhash64_batch,
)
from ..stages.exchange import static_group_exchange


def _exchange_pandas(
    ds: Dataset, key: str, n_parts: int, fn, schema: pa.Schema
) -> Dataset:
    """Run a pandas group function over the static bucket exchange (the
    skew-proof ``groupby(int key).map_groups`` replacement -- no sort,
    no boundary sampling, and typed empty outputs instead of the
    schema-less empty pandas blocks Ray's map_groups emits for sorted
    blocks holding zero groups). ``fn`` gets ALL rows of one bucket and
    must handle the empty frame; its output is cast to ``schema``."""

    def apply(t: pa.Table) -> pa.Table:
        out = fn(t.to_pandas())
        if not len(out):
            return schema.empty_table()
        cols = [
            pa.array(out[f.name].to_numpy(), type=f.type)
            if not pa.types.is_nested(f.type)
            else pa.array(list(out[f.name]), type=f.type)
            for f in schema
        ]
        return pa.Table.from_arrays(cols, schema=schema)

    return static_group_exchange(
        ds, key, n_parts, apply, empty_schema=schema, drop_empty=True
    )


def exact_dedup(
    docs: Dataset, n_buckets: int = 64, keep: str = "first"
) -> Dataset:
    """One row per distinct text: (doc_id, n_copies). ``keep`` picks the
    survivor among the copies -- "first" (min doc_id, the default) or
    "latest" (max doc_id; the crawl-snapshot policy: newest wins).
    Hash-bucket shuffle + exact text grouping inside the bucket (hash
    collisions are resolved by the inner exact groupby)."""
    if keep not in ("first", "latest"):
        raise ValueError(f"keep must be 'first' or 'latest', got {keep!r}")
    agg = "min" if keep == "first" else "max"

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df[["doc_id", "text"]].copy()
        # any stable bucket hash works (grouping inside is exact);
        # vectorized, no per-row Python
        df["bucket"] = (
            pd.util.hash_array(df["text"].to_numpy(object), categorize=False)
            % np.uint64(n_buckets)
        ).astype(np.int64)
        return df

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # coarse bucket -> exact text groupby INSIDE (vectorized pandas);
        # never one Ray group per distinct text
        g = df.groupby("text", sort=False)["doc_id"]
        out = g.agg([agg, "size"]).reset_index(drop=True)
        return out.rename(columns={agg: "doc_id", "size": "n_copies"})

    return _exchange_pandas(
        docs.map_batches(add_bucket, batch_format="pandas"),
        "bucket", n_buckets, per_bucket,
        pa.schema([("doc_id", pa.int64()), ("n_copies", pa.int64())]),
    )


def minhash_band_rows(docs: Dataset) -> Dataset:
    """(band, band_hash, doc_id) rows -- the LSH explode."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        # whole-batch signature + band kernel (md5 once per DISTINCT
        # shingle in the batch, chunked reduceat min -- no per-doc loop);
        # values bit-identical to the scalar minhash_signature/band_hashes
        bh = band_hashes_batch(minhash_signatures_batch(df["text"].tolist()))
        n = len(df)
        return pd.DataFrame(
            {
                "band": np.tile(
                    np.arange(MINHASH_BANDS, dtype=np.int32), n
                ),
                "band_hash": bh.ravel(),
                "doc_id": np.repeat(
                    df["doc_id"].to_numpy(np.int64), MINHASH_BANDS
                ),
            }
        )

    return docs.map_batches(fn, batch_format="pandas")


def minhash_candidates(
    docs: Dataset, n_buckets: int = 64, bucket_cap: int = 1024
) -> Dataset:
    """Candidate near-dup pairs (a < b) from LSH band buckets, deduped.
    The Ray shuffle key is a coarse hash of (band, band_hash) -- one Ray
    group per bucket, with the per-(band, band_hash) pairing vectorized
    in pandas inside (never one Ray group per LSH bucket).

    Hot-bucket cap: a (band, band_hash) bucket holding more than
    ``bucket_cap`` distinct docs (typically a crawl's byte-identical
    docs reaching the near-dup stage un-exact-deduped: 10^5 copies
    would emit 5*10^9 all-pairs from ONE bucket) pairs every member to
    the bucket's representative (min doc_id) instead -- O(m) candidate
    pairs. Pairwise completeness inside such a bucket is traded for the
    star; transitive grouping downstream (corpus.neardup_components)
    still recovers the full duplicate cluster through the
    representative."""

    def pairs_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        a_out: list[np.ndarray] = []
        b_out: list[np.ndarray] = []
        for _, sub in df.groupby(["band", "band_hash"], sort=False):
            ids = np.sort(sub["doc_id"].unique())
            m = len(ids)
            if m < 2:
                continue
            if m > bucket_cap:
                a_out.append(np.full(m - 1, ids[0], np.int64))
                b_out.append(ids[1:])
                continue
            iu, ju = np.triu_indices(m, k=1)
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

    def add_bb(t: pa.Table) -> pa.Table:
        # arrow-native bucket assign: no pandas round-trip of the block
        band = t["band"].to_numpy(zero_copy_only=False).astype(np.int64)
        bh = t["band_hash"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column(
            "bb", pa.array((band * 1000003 + bh) % n_buckets, pa.int64())
        )

    rows = minhash_band_rows(docs).map_batches(
        add_bb, batch_format="pyarrow"
    )
    # pairs may still repeat across bands; minhash_verified_pairs dedupes
    # them in its first pair-bucket shuffle
    return _exchange_pandas(
        rows, "bb", n_buckets, pairs_in_bucket,
        pa.schema([("a", pa.int64()), ("b", pa.int64())]),
    )


ID_SHARD_MAX = 1_000_000  # candidate ids per broadcast shard


def shard_candidate_ids(needed_ids: np.ndarray, max_per_shard: int = ID_SHARD_MAX):
    """Shard the (sorted) candidate doc-id set for broadcast: ids are
    split by residue class into ceil(n/max_per_shard) separate objects,
    so NO single all-candidates object ever exists -- at crawl scale the
    id set outgrows one object / one worker-heap allocation, while each
    shard stays a bounded, zero-copy plasma read. Returns
    (n_shards, [refs])."""
    import ray as _ray

    n_sh = max(1, -(-len(needed_ids) // max_per_shard))
    by = needed_ids % np.int64(n_sh)
    return n_sh, [
        # residue-class slices of a sorted array stay sorted
        _ray.put(np.ascontiguousarray(needed_ids[by == s]))
        for s in range(n_sh)
    ]


def filter_to_candidates(
    did: np.ndarray, n_sh: int, shard_refs: list
) -> np.ndarray:
    """Membership mask of ``did`` against the sharded candidate-id set:
    each batch touches only the shards its residues hit, one sorted
    searchsorted probe per shard."""
    import ray as _ray

    mask = np.zeros(len(did), bool)
    if not len(did):
        return mask
    mod = did % np.int64(n_sh)
    for s in np.unique(mod):
        ids = _ray.get(shard_refs[int(s)])
        if not len(ids):
            continue
        sel = mod == s
        d = did[sel]
        pos = np.minimum(np.searchsorted(ids, d), len(ids) - 1)
        mask[sel] = ids[pos] == d
    return mask


def minhash_verified_pairs(
    docs: Dataset, threshold: float = 0.7, shingle_k: int = 5,
    n_buckets: int = 64, bucket_cap: int = 1024,
) -> Dataset:
    """LSH candidates verified by exact shingle Jaccard >= threshold,
    fully DISTRIBUTED -- the driver never materializes candidates or
    texts (on a crawl-scale corpus the candidate set is NOT small).
    Returns a Dataset of (a, b, jaccard).

    Shuffle plan (three bucketed exchanges, each over candidate-sized
    data, never one Ray group per pair/doc):
      1. pair-bucket groupby  -> dedupe candidate pairs across bands
      2. doc-bucket groupby over (pair-role rows UNION candidate docs'
         texts) -> compute each needed doc's shingle set ONCE, attach to
         each of its role rows. The text side is SEMI-JOINED before the
         exchange: the distinct candidate doc ids (a few per pair,
         deduped -- the small side) are broadcast SHARDED (one plasma
         object per <= ID_SHARD_MAX ids, shard_candidate_ids) and each
         text batch keeps only matching rows, so non-candidate
         documents' payloads never enter the shuffle (round 2 shipped
         the FULL corpus text through this exchange and filtered after)
         and no single all-candidates object exists at any scale.
      3. pair-bucket groupby  -> both role rows of a pair meet; exact
         Jaccard from the two sorted shingle arrays
    """
    import ray as _ray

    def dedupe(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"a": np.empty(0, np.int64), "b": np.empty(0, np.int64)})
        return df.drop_duplicates(["a", "b"])[["a", "b"]]

    def add_pb(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column(
            "pb", pa.array((a * 1000003 + b) % n_buckets, pa.int64())
        )

    cand = _exchange_pandas(
        minhash_candidates(
            docs, n_buckets=n_buckets, bucket_cap=bucket_cap
        ).map_batches(add_pb, batch_format="pyarrow"),
        "pb", n_buckets, dedupe,
        pa.schema([("a", pa.int64()), ("b", pa.int64())]),
    )

    def to_roles(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return _empty_roles()
        a = df["a"].to_numpy(np.int64)
        b = df["b"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "doc_id": np.concatenate([a, b]),
                "a": np.concatenate([a, a]),
                "b": np.concatenate([b, b]),
                "kind": np.zeros(2 * len(a), np.int8),
                "text": np.full(2 * len(a), "", object),
            }
        )

    def _empty_roles() -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": np.empty(0, np.int64), "a": np.empty(0, np.int64),
             "b": np.empty(0, np.int64), "kind": np.empty(0, np.int8),
             "text": np.empty(0, object)}
        )

    cand = cand.materialize()  # consumed twice: id semi-join + role rows

    @_ray.remote
    def _block_ids(t) -> np.ndarray:
        if hasattr(t, "column_names"):  # arrow block
            if t.num_rows == 0 or "a" not in t.column_names:
                return np.empty(0, np.int64)
            a = t["a"].to_numpy(zero_copy_only=False)
            b = t["b"].to_numpy(zero_copy_only=False)
        else:  # pandas block
            if t.empty or "a" not in t.columns:
                return np.empty(0, np.int64)
            a = t["a"].to_numpy(np.int64)
            b = t["b"].to_numpy(np.int64)
        return np.unique(np.concatenate([a, b]).astype(np.int64))

    id_parts = _ray.get([_block_ids.remote(r) for r in cand.to_arrow_refs()])
    needed_ids = (
        np.unique(np.concatenate(id_parts)) if id_parts else np.empty(0, np.int64)
    )
    # broadcast SHARDED (one object per <= ID_SHARD_MAX ids): no single
    # all-candidates object at any scale; batches probe only the shards
    # their residues hit
    n_id_shards, id_shard_refs = shard_candidate_ids(needed_ids)

    def keep_candidates(df: pd.DataFrame) -> pd.DataFrame:
        did = df["doc_id"].to_numpy(np.int64)
        mask = filter_to_candidates(did, n_id_shards, id_shard_refs)
        df = df[mask]
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "a": np.zeros(len(df), np.int64),
                "b": np.zeros(len(df), np.int64),
                "kind": np.ones(len(df), np.int8),
                "text": df["text"].to_numpy(object),
            }
        )

    roles = cand.map_batches(to_roles, batch_format="pandas")
    texts = docs.map_batches(keep_candidates, batch_format="pandas")

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"a": np.empty(0, np.int64), "b": np.empty(0, np.int64),
             "doc_id": np.empty(0, np.int64), "sh": np.empty(0, object)}
        )
        if df.empty:
            return empty
        role_rows = df[df["kind"] == 0]
        if role_rows.empty:
            return empty
        needed = set(role_rows["doc_id"].tolist())
        doc_rows = df[df["kind"] == 1]
        doc_rows = doc_rows[doc_rows["doc_id"].isin(needed)]
        # md5-hashed shingles: the same values the minhash signature and
        # the DuckDB oracle compute, so the exact-Jaccard verify agrees
        # with SQL bit-for-bit (batched kernel: md5 once per distinct
        # shingle, values sorted per doc)
        vals, offs = hashed_shingles_batch(
            doc_rows["text"].tolist(), shingle_k
        )
        sh = {
            did: vals[offs[i]: offs[i + 1]].astype(np.int64)
            for i, did in enumerate(doc_rows["doc_id"])
        }
        # a candidate doc may be absent from the corpus stream entirely;
        # drop its role rows so verify's len(sub) != 2 guard reports the
        # pair as lost instead of KeyError-ing here
        role_rows = role_rows[role_rows["doc_id"].isin(sh.keys())]
        return pd.DataFrame(
            {
                "a": role_rows["a"].to_numpy(np.int64),
                "b": role_rows["b"].to_numpy(np.int64),
                "doc_id": role_rows["doc_id"].to_numpy(np.int64),
                "sh": [sh[d] for d in role_rows["doc_id"]],
            }
        )

    def add_db(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("db", pa.array(did % n_buckets, pa.int64()))

    with_sh = _exchange_pandas(
        roles.union(texts).map_batches(add_db, batch_format="pyarrow"),
        "db", n_buckets, attach,
        pa.schema(
            [("a", pa.int64()), ("b", pa.int64()), ("doc_id", pa.int64()),
             ("sh", pa.list_(pa.int64()))]
        ),
    )

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"a": np.empty(0, np.int64), "b": np.empty(0, np.int64),
             "jaccard": np.empty(0, np.float64)}
        )
        if df.empty:
            return empty
        av, bv, jv = [], [], []
        for (a, b), sub in df.groupby(["a", "b"], sort=False):
            if len(sub) != 2:
                continue  # pair lost a side (doc absent from corpus)
            x, y = sub["sh"].iloc[0], sub["sh"].iloc[1]
            if sub["doc_id"].iloc[0] != a:
                x, y = y, x
            if len(x) == 0 and len(y) == 0:
                j = 1.0
            else:
                inter = np.intersect1d(x, y, assume_unique=True).size
                union = len(x) + len(y) - inter
                j = inter / union if union else 0.0
            if j >= threshold:
                av.append(a); bv.append(b); jv.append(round(j, 6))
        return pd.DataFrame(
            {"a": np.asarray(av, np.int64), "b": np.asarray(bv, np.int64),
             "jaccard": np.asarray(jv, np.float64)}
        )

    def add_pb2(t: pa.Table) -> pa.Table:
        # arrow-native: the sh list column must not round-trip through
        # pandas (Ray re-converts ndarray columns to its tensor
        # extension, which then can't concat with list<int64> slices)
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column(
            "pb2", pa.array((a * 1000003 + b) % n_buckets, pa.int64())
        )

    return _exchange_pandas(
        with_sh.map_batches(add_pb2, batch_format="pyarrow"),
        "pb2", n_buckets, verify,
        pa.schema(
            [("a", pa.int64()), ("b", pa.int64()), ("jaccard", pa.float64())]
        ),
    )


def minhash_neardup_pairs(
    docs: Dataset, threshold: float = 0.7, shingle_k: int = 5,
    bucket_cap: int = 1024,
) -> pa.Table:
    """Small-result wrapper over the distributed verify: sorted
    (a, b, jaccard) table. Only the FINAL verified pairs (the query
    result itself) reach the driver."""
    df = minhash_verified_pairs(
        docs, threshold, shingle_k, bucket_cap=bucket_cap
    ).to_pandas()
    df = df.sort_values(["a", "b"]).reset_index(drop=True)
    return pa.table(
        {
            "a": pa.array(df["a"].to_numpy(np.int64), pa.int64()),
            "b": pa.array(df["b"].to_numpy(np.int64), pa.int64()),
            "jaccard": pa.array(df["jaccard"].to_numpy(np.float64), pa.float64()),
        }
    )


def simhash_signatures(docs: Dataset) -> Dataset:
    """(doc_id, simhash) -- one 64-bit signature per document."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                # batched kernel: md5 once per distinct token in the batch
                "simhash": simhash64_batch(df["text"].tolist()),
            }
        )

    return docs.map_batches(fn, batch_format="pandas")


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount over a uint64 array."""
    return (
        np.unpackbits(np.ascontiguousarray(x).view(np.uint8))
        .reshape(len(x), 64)
        .sum(axis=1)
    )


def simhash_neardup_pairs(
    docs: Dataset,
    max_hamming: int = 3,
    n_bands: int | None = None,
    n_parts: int = 64,
) -> Dataset:
    """Near-duplicate doc pairs by SimHash LSH — the fuzzy-dedup shape a
    crawl-scale pipeline runs over simhash signatures: band the 64-bit
    signature into ``n_bands`` equal bit-slices, co-group rows sharing
    any (band, slice) value, verify candidates by exact hamming distance
    <= ``max_hamming``, dedup pairs found via multiple bands. Columns:
    (a, b, hamming), a < b.

    Pigeonhole guarantee (same machinery as multimodal.phash_neardup):
    any pair within ``n_bands - 1`` bits shares at least one clean band,
    so the default 4 bands x 16 bits is EXACT at hamming <= 3 with
    2^16 buckets per band (expected bucket size n/65536 — the
    production web-dedup configuration). No recall loss, no all-pairs
    stage anywhere: the per-bucket verify is O(|g|^2) over an
    expected-constant-size bucket."""
    from ..stages.exchange import static_group_exchange

    sigs = simhash_signatures(docs)
    if n_bands is None:
        if max_hamming > 15:
            raise ValueError(
                f"max_hamming={max_hamming} needs > 16 bands of < 4 bits "
                "— bucket values would be near-constant; use a cascade"
            )
        n_bands = next(b for b in (4, 8, 16) if b - 1 >= max_hamming)
    elif max_hamming > n_bands - 1:
        raise ValueError(
            f"max_hamming={max_hamming} breaks the pigeonhole guarantee "
            f"of n_bands={n_bands} (exact only to {n_bands - 1})"
        )
    band_bits = 64 // n_bands
    mask = np.uint64((1 << band_bits) - 1)

    def expand(t: pa.Table) -> pa.Table:
        sh = np.ascontiguousarray(
            t["simhash"].to_numpy(zero_copy_only=False)
        ).view(np.uint64)
        did = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(sh)
        bucket = np.empty(n * n_bands, np.int64)
        for b in range(n_bands):
            sl = (sh >> np.uint64(b * band_bits)) & mask
            bucket[b * n : (b + 1) * n] = (
                np.int64(b) << np.int64(band_bits)
            ) | sl.astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(np.tile(did, n_bands), pa.int64()),
                "simhash": pa.array(
                    np.tile(sh, n_bands).view(np.int64), pa.int64()
                ),
                "bucket": pa.array(bucket, pa.int64()),
                "part": pa.array(bucket % n_parts, pa.int64()),
            }
        )

    bands = sigs.map_batches(expand, batch_format="pyarrow")

    pair_schema = pa.schema(
        [("a", pa.int64()), ("b", pa.int64()), ("hamming", pa.int64()),
         ("pair_part", pa.int64())]
    )

    def verify(t: pa.Table) -> pa.Table:
        if t.num_rows < 2:
            return pair_schema.empty_table()
        df = t.to_pandas()
        out_a, out_b, out_d = [], [], []
        for _, g in df.groupby("bucket", sort=False):
            g = g.drop_duplicates("doc_id")
            m = len(g)
            if m < 2:
                continue
            sh = np.ascontiguousarray(
                g["simhash"].to_numpy(np.int64)
            ).view(np.uint64)
            ids = g["doc_id"].to_numpy(np.int64)
            order = np.argsort(ids)
            ids, sh = ids[order], sh[order]
            iu, ju = np.triu_indices(m, k=1)
            d = _popcount64(np.bitwise_xor(sh[iu], sh[ju]))
            keep = d <= max_hamming
            if keep.any():
                out_a.append(ids[iu[keep]])
                out_b.append(ids[ju[keep]])
                out_d.append(d[keep])
        if not out_a:
            return pair_schema.empty_table()
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        d = np.concatenate(out_d).astype(np.int64)
        return pa.table(
            {
                "a": pa.array(a, pa.int64()),
                "b": pa.array(b, pa.int64()),
                "hamming": pa.array(d, pa.int64()),
                "pair_part": pa.array((a * 1000003 + b) % n_parts, pa.int64()),
            }
        )

    cands = static_group_exchange(
        bands, "part", n_parts, verify,
        empty_schema=pair_schema, drop_empty=True,
    )

    out_schema = pa.schema(
        [("a", pa.int64()), ("b", pa.int64()), ("hamming", pa.int64())]
    )

    def dedup_pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = t.to_pandas().drop_duplicates(["a", "b"])
        return pa.table(
            {
                "a": pa.array(df["a"].to_numpy(np.int64), pa.int64()),
                "b": pa.array(df["b"].to_numpy(np.int64), pa.int64()),
                "hamming": pa.array(
                    df["hamming"].to_numpy(np.int64), pa.int64()
                ),
            }
        )

    return static_group_exchange(
        cands, "pair_part", n_parts, dedup_pairs,
        empty_schema=out_schema, drop_empty=True,
    )


def ngram_jaccard_pairs(
    docs: Dataset, threshold: float = 0.3, k: int = 3,
    group_col: str = "source", n_buckets: int = 64,
) -> Dataset:
    """Exact n-gram Jaccard near-dup pairs *within* a grouping column
    (e.g. same source). Columns: (a, b, jaccard).

    SKEW-FREE shuffle plan — the work shards by SHINGLE, never by
    source, so a hot source (half the crawl from one domain) spreads
    over every bucket instead of landing in a single task (rounds 1-4
    ran ``groupby(source).map_groups``: one whole source per task):

      1. incidence map  -- per doc: sorted distinct md5-hashed
         k-shingles (hashed_shingles_batch; values bit-identical to the
         minhash verify's and collision-free in practice, so the result
         equals the UNhashed SQL oracle) + the doc's shingle-set size
         carried ON each incidence row (no sizes broadcast needed).
         Empty docs emit one sentinel incidence (sh=-1, size=0).
      2. shingle-bucket exchange -- bucket key = hash(source, shingle);
         inside a bucket, each (source, shingle) run of doc_ids expands
         to (a < b, size_a, size_b) rows, vectorized per run length.
         Per-task work is O(sum over its shingle runs |run|^2) — a
         pathological shared-by-all shingle is bounded by the run, not
         the source.
      3. pair-bucket exchange -- groupby (a, b): |intersection| = row
         count, jaccard = inter / (size_a + size_b - inter); the
         empty-empty sentinel pair is 1.0 by definition.
    """

    inc_schema = pa.schema(
        [("doc_id", pa.int64()), ("shash", pa.int64()), ("sh", pa.int64()),
         ("size", pa.int64()), ("gb", pa.int64())]
    )

    def incidences(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return inc_schema.empty_table()
        vals, offs = hashed_shingles_batch(df["text"].tolist(), k)
        counts = np.diff(offs)
        did = df["doc_id"].to_numpy(np.int64)
        shash = pd.util.hash_array(
            df[group_col].to_numpy(object), categorize=False
        ).astype(np.int64)
        rep = np.repeat(np.arange(len(df)), counts)
        sh = vals.astype(np.int64)
        # empty docs: one sentinel incidence (md5-mod-p values are >= 0,
        # so sh=-1 cannot collide with a real shingle)
        emp = np.flatnonzero(counts == 0)
        doc_id = np.concatenate([did[rep], did[emp]])
        shash_r = np.concatenate([shash[rep], shash[emp]])
        sh_r = np.concatenate([sh, np.full(len(emp), -1, np.int64)])
        size_r = np.concatenate(
            [counts[rep].astype(np.int64), np.zeros(len(emp), np.int64)]
        )
        gb = (shash_r * np.int64(1000003) + sh_r) % n_buckets
        return pa.table(
            {
                "doc_id": pa.array(doc_id, pa.int64()),
                "shash": pa.array(shash_r, pa.int64()),
                "sh": pa.array(sh_r, pa.int64()),
                "size": pa.array(size_r, pa.int64()),
                "gb": pa.array(gb, pa.int64()),
            }
        )

    inc = docs.map_batches(incidences, batch_format="pandas")

    def pairs_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"a": np.empty(0, np.int64), "b": np.empty(0, np.int64),
             "sa": np.empty(0, np.int64), "sb": np.empty(0, np.int64),
             "pb": np.empty(0, np.int64)}
        )
        if len(df) < 2:
            return empty
        df = df.sort_values(["shash", "sh", "doc_id"], kind="stable")
        shh = df["shash"].to_numpy(np.int64)
        sh = df["sh"].to_numpy(np.int64)
        did = df["doc_id"].to_numpy(np.int64)
        sz = df["size"].to_numpy(np.int64)
        change = (shh[1:] != shh[:-1]) | (sh[1:] != sh[:-1])
        starts = np.concatenate([[0], np.flatnonzero(change) + 1])
        lens = np.diff(np.append(starts, len(df)))
        ii: list[np.ndarray] = []
        jj: list[np.ndarray] = []
        for L in np.unique(lens):
            if L < 2:
                continue
            S = starts[lens == L]
            iu, ju = np.triu_indices(int(L), 1)
            ii.append((S[:, None] + iu[None, :]).ravel())
            jj.append((S[:, None] + ju[None, :]).ravel())
        if not ii:
            return empty
        pi_ = np.concatenate(ii)
        pj_ = np.concatenate(jj)
        a, b = did[pi_], did[pj_]
        return pd.DataFrame(
            {"a": a, "b": b, "sa": sz[pi_], "sb": sz[pj_],
             "pb": (a * np.int64(1000003) + b) % n_buckets}
        )

    pair_rows = _exchange_pandas(
        inc, "gb", n_buckets, pairs_in_bucket,
        pa.schema(
            [("a", pa.int64()), ("b", pa.int64()), ("sa", pa.int64()),
             ("sb", pa.int64()), ("pb", pa.int64())]
        ),
    )

    def reduce_pairs(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"a": np.empty(0, np.int64), "b": np.empty(0, np.int64),
             "jaccard": np.empty(0, np.float64)}
        )
        if df.empty:
            return empty
        agg = (
            df.groupby(["a", "b"], sort=False)
            .agg(inter=("sa", "size"), sa=("sa", "first"), sb=("sb", "first"))
            .reset_index()
        )
        inter = agg["inter"].to_numpy(np.float64)
        sa = agg["sa"].to_numpy(np.int64)
        sb = agg["sb"].to_numpy(np.int64)
        both_empty = (sa == 0) & (sb == 0)  # the sentinel pair
        union = np.maximum(sa + sb - inter, 1.0)
        j = np.where(both_empty, 1.0, inter / union)
        keep = j >= threshold
        return pd.DataFrame(
            {
                "a": agg["a"].to_numpy(np.int64)[keep],
                "b": agg["b"].to_numpy(np.int64)[keep],
                "jaccard": np.round(j[keep], 6),
            }
        )

    return _exchange_pandas(
        pair_rows, "pb", n_buckets, reduce_pairs,
        pa.schema(
            [("a", pa.int64()), ("b", pa.int64()), ("jaccard", pa.float64())]
        ),
    )
