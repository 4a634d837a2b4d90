"""End-to-end corpus cleaning: quality gate, exact-dup, near-dup
component resolution, deterministic keep rules."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines.corpus import (
    clean_corpus,
    neardup_components,
)


def test_neardup_components_min_label_propagation(ray_session):
    """Distributed min-label propagation must equal union-find roots,
    including a long chain (multi-round convergence) and components
    spanning different shuffle buckets."""
    pairs = [(1, 2), (2, 3), (10, 11), (5, 6),
             # chain 200-201-...-208 forces ~8 propagation rounds
             *[(200 + i, 201 + i) for i in range(8)],
             # cross-bucket component (64 apart -> same bucket; 65 differs)
             (64, 129), (129, 1000)]
    df = pd.DataFrame(pairs, columns=["a", "b"])
    ds = ray.data.from_pandas(df).repartition(3)
    out = {r["node"]: r["root"] for r in neardup_components(ds).take_all()}
    assert out[1] == out[2] == out[3] == 1
    assert out[10] == out[11] == 10
    assert out[5] == out[6] == 5
    assert all(out[200 + i] == 200 for i in range(9))
    assert out[64] == out[129] == out[1000] == 64


def test_clean_corpus_end_to_end(ray_session):
    rng = np.random.default_rng(1)
    vocab = [f"w{i}" for i in range(300)]
    rows = []
    # 20 good unique docs
    for i in range(20):
        rows.append((i, " ".join(rng.choice(vocab, size=50)), "en", "s0"))
    # short doc -> quality drop
    rows.append((100, "too short", "en", "s0"))
    # exact duplicate of doc 3 -> exact_dup drop (higher id loses)
    rows.append((101, rows[3][1], "en", "s1"))
    # near duplicate of doc 7 (1-word change) -> near_dup drop
    w = rows[7][1].split(); w[10] = "changed"
    rows.append((102, " ".join(w), "en", "s1"))
    df = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    docs = ray.data.from_pandas(df).repartition(3)

    out_ds = clean_corpus(docs, min_words=20, neardup_threshold=0.7)
    # the verdict table STREAMS: clean_corpus returns a Dataset (one row
    # per corpus doc — never a driver-side to_pandas inside the pipeline)
    assert isinstance(out_ds, ray.data.Dataset)
    out = pa.concat_tables(
        [b for b in out_ds.iter_batches(batch_format="pyarrow")]
    )
    res = {d: (k, r) for d, k, r in zip(
        out["doc_id"].to_pylist(), out["kept"].to_pylist(),
        out["reason"].to_pylist())}
    assert len(res) == len(rows)
    assert res[100] == (False, "quality")
    assert res[101] == (False, "exact_dup")
    assert res[3] == (True, "")       # smaller id of the exact pair kept
    assert res[102] == (False, "near_dup")
    assert res[7] == (True, "")       # smaller id of the near pair kept
    assert sum(1 for k, _ in res.values() if k) == 20
    # deterministic across runs
    out2 = pa.concat_tables(
        [b for b in clean_corpus(
            docs, min_words=20, neardup_threshold=0.7
        ).iter_batches(batch_format="pyarrow")]
    )
    assert out.to_pydict() == out2.to_pydict()
