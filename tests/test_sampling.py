"""Deterministic stratified sampling: per-stratum rates honored,
run-to-run determinism, monotone (subset) behavior under rate raises."""

import numpy as np
import pyarrow as pa

from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines import (
    sampling,
)


def _table(n_per: int = 400, sources=("src0", "src1", "src2")) -> pa.Table:
    ids, srcs = [], []
    k = 0
    for s in sources:
        for _ in range(n_per):
            ids.append(k)
            srcs.append(s)
            k += 1
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "source": pa.array(srcs, pa.string())})


def test_rates_honored_and_deterministic(ray_session):
    import ray.data

    rates = {"src0": 10, "src1": 50, "src2": 90}
    ds = ray.data.from_arrow(_table())
    a = sampling.stratified_sample(
        ds, "doc_id", "source", lambda s: rates[s]
    ).to_pandas()
    b = sampling.stratified_sample(
        ds, "doc_id", "source", lambda s: rates[s]
    ).to_pandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])  # deterministic
    frac = a.groupby("source").size() / 400.0
    for s, r in rates.items():
        # md5 is uniform: observed fraction within +-12 points of target
        assert abs(frac.get(s, 0.0) - r / 100.0) < 0.12, (s, frac.get(s))


def test_raising_rate_keeps_superset(ray_session):
    import ray.data

    ds = ray.data.from_arrow(_table(n_per=300, sources=("src0",)))
    lo = set(
        sampling.stratified_sample(ds, "doc_id", "source", lambda s: 20)
        .to_pandas()["doc_id"]
    )
    hi = set(
        sampling.stratified_sample(ds, "doc_id", "source", lambda s: 60)
        .to_pandas()["doc_id"]
    )
    assert lo <= hi  # threshold predicate is monotone in the rate


def test_zero_and_full_rates(ray_session):
    import ray.data

    ds = ray.data.from_arrow(_table(n_per=50, sources=("src0",)))
    assert (
        sampling.stratified_sample(ds, "doc_id", "source", lambda s: 0).count()
        == 0
    )
    assert (
        sampling.stratified_sample(ds, "doc_id", "source", lambda s: 100).count()
        == 50
    )


def test_doc_sample_registered():
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines import (
        queries,
    )

    assert "doc_sample" in queries.DATA_QUERIES
    assert "doc_sample" in queries.DATA_SQL


def test_embed_quantize_matches_reference(ray_session):
    import pyarrow as pa
    import ray.data

    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines import (
        similarity,
    )

    vecs = [[0.5, -1.0, 0.25, 0.0], [2.0, 2.0, -2.0, 2.0], [0.0, 0.0, 0.0, 0.0]]
    t = pa.table({
        "vec_id": pa.array([0, 1, 2], pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
    })
    got = (
        similarity.quantize_int8(ray.data.from_arrow(t))
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    # row 0: scale 1/127; codes floor(v*127 + 0.5) = [64, -127, 32, 0]
    assert got.loc[0, "q_sum"] == 64 - 127 + 32
    assert got.loc[0, "q_abs_sum"] == 64 + 127 + 32
    # row 1: all +-127
    assert got.loc[1, "q_sum"] == 127 * 2 and got.loc[1, "q_abs_sum"] == 127 * 4
    # all-zero vector: scale 0, codes 0 (no NaN / div-by-zero leak)
    assert got.loc[2, "scale"] == 0.0 and got.loc[2, "q_abs_sum"] == 0

    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines import (
        queries,
    )

    assert "embed_quantize" in queries.DATA_QUERIES
    assert "embed_quantize" in queries.DATA_SQL


def test_exact_dedup_keep_policies(ray_session):
    import pyarrow as pa
    import ray.data

    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines import (
        dedup as dedup_pipe,
    )

    t = pa.table({
        "doc_id": pa.array([1, 5, 9, 2], pa.int64()),
        "text": pa.array(["aaa", "aaa", "aaa", "bbb"]),
    })
    ds = ray.data.from_arrow(t)
    first = dedup_pipe.exact_dedup(ds, n_buckets=4).to_pandas()
    latest = dedup_pipe.exact_dedup(ds, n_buckets=4, keep="latest").to_pandas()
    assert sorted(first["doc_id"]) == [1, 2]   # min doc_id survives
    assert sorted(latest["doc_id"]) == [2, 9]  # max doc_id survives
    assert sorted(first["n_copies"]) == sorted(latest["n_copies"]) == [1, 3]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        dedup_pipe.exact_dedup(ds, keep="oldest")

    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines import (
        queries,
    )

    assert "dedup_exact_latest" in queries.DATA_QUERIES
    assert "dedup_exact_latest" in queries.DATA_SQL


def test_ann_int8_recall_vs_exact(ray_session):
    import ray.data

    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines import (
        similarity,
    )

    emb = ray.data.read_parquet(
        "/root/testdata/sf0.001/embeddings.parquet",
        columns=["vec_id", "embedding"],
    )
    exact = similarity.ann_topk(emb, [0, 1, 2], k=10)
    quant = similarity.ann_topk(emb, [0, 1, 2], k=10, int8=True)
    hits = total = 0
    for qid in (0, 1, 2):
        e = {r["vec_id"] for r in exact.to_pylist() if r["query_id"] == qid}
        g = {r["vec_id"] for r in quant.to_pylist() if r["query_id"] == qid}
        hits += len(e & g)
        total += len(e)
    # int8 error is ~0.4% per component: recall@10 stays near-perfect
    assert hits / total >= 0.9, hits / total

    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines import (
        queries,
    )

    assert "ann_topk_int8" in queries.DATA_QUERIES
    assert "ann_topk_int8" in queries.DATA_SQL
