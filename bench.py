"""Benchmark harness.

Runs the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) with ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS or 32) and prints ONE JSON line:

    {"metric": ..., "value": <headline sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
     "rows": ..., "rows_per_sec": ...}

``--scaling`` re-runs the headline in fresh processes at num_cpus=8 and
32 on the SAME input (the sandbox stand-in for N vs 4N nodes) and
prints both throughputs plus the scaling efficiency.

Headline = the flagship north-rule pipeline: image+caption table ->
geotag -> grid distance join -> ordered stars -> per-subtree WPI mining.
The image table is generated once (deterministic, cached under /tmp) and
sized from the events row count of the chosen sf dir.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# flagship mining parameters for the image fixture (40 features,
# constant-density clustered layout): dense enough for multi-level
# patterns (max k ~ 6), bounded row-instance growth
IMG_FEATURES = 40
IMG_D = 6.0          # headline (streaming subtree mode, paper Alg. 3)
IMG_D_SALTED = 7.0   # secondary: salted/coordinated mode on a heavier d
IMG_MIN_PREV = 0.3


def image_fixture_dir(n_rows: int) -> str:
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.sources.images import (
        write_image_fixture,
    )

    # constant spatial density across scale factors: extent grows with
    # sqrt(n) so per-point neighbor counts (and pattern depth) stay fixed
    # and rows/sec is comparable between runs
    extent = round(1000.0 * (n_rows / 10000.0) ** 0.5, 1)
    d = f"/tmp/clpm_bench_images_{n_rows}_{extent}"
    return write_image_fixture(
        d, n=n_rows, n_features=IMG_FEATURES, seed=23, shards=32,
        extent=extent,
    )


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    import ray.data as rd

    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.config import (
        MiningConfig,
    )
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines import (
        dedup as dedup_pipe,
        multimodal,
        queries as q,
        similarity,
        text as text_pipe,
    )

    n_events = rd.read_parquet(f"{SF_DIR}/events.parquet").count()
    img_dir = image_fixture_dir(n_events)

    # warm the page cache so we measure compute+shuffle, not first disk read
    rd.read_parquet(f"{SF_DIR}/documents.parquet").count()
    rd.read_parquet(img_dir).count()

    timings: dict[str, float] = {}
    n_rows: dict[str, int] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        timings[name] = round(time.perf_counter() - t0, 3)
        return out

    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.sources.geotag import (
        geotag,
    )
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.sources.images import (
        GEOTAG_COLUMNS,
        read_image_table,
    )
    from efficient_co_location_pattern_mining_in_large_spatial_datasets_with_rare_features_ray.pipelines.colocation import (
        mine_coordinated,
    )

    # headline: flagship image-table mining via the streaming subtree
    # mode (paper Alg. 3: geotag -> grid join -> ordered stars -> per-
    # subtree level loop; single pass, no driver sync)
    run = timed(
        "colo_mine_images",
        lambda: multimodal.mine_image_table(
            img_dir,
            MiningConfig(neighbor_distance=IMG_D, min_prevalence=IMG_MIN_PREV),
        ),
    )
    n_rows["colo_mine_images"] = n_events
    n_patterns = run.patterns_table().num_rows

    # fresh Ray session per heavyweight section: leftover executor/object
    # state from a prior big job was measured to slow every later job in
    # the same session by 2-4x at high core counts
    def fresh_session():
        ray.shutdown()
        ray.init(
            address="local", num_cpus=NUM_CPUS, include_dashboard=False,
            ignore_reinit_error=True, logging_level="ERROR",
        )
        c = DataContext.get_current()
        c.enable_progress_bars = False
        c.execution_options.verbose_progress = False

    fresh_session()

    # secondary: salted/coordinated mode (root-instance shards, exact-
    # distinct PR reduce, checkpoint-resumable) on a heavier neighborhood
    run_s = timed(
        "colo_mine_images_salted",
        lambda: mine_coordinated(
            geotag(read_image_table(img_dir, columns=GEOTAG_COLUMNS)),
            MiningConfig(
                neighbor_distance=IMG_D_SALTED, min_prevalence=IMG_MIN_PREV
            ),
        ),
    )
    assert run_s.patterns_table().num_rows > 0

    fresh_session()

    # events-derived k2 metrics (the SQL-oracled aggregate path)
    timed("colo_patterns_k2", lambda: q.q_patterns_k2(SF_DIR))
    n_rows["colo_patterns_k2"] = n_events

    docs = rd.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text", "lang", "source"]
    )
    n_docs = docs.count()
    timed("doc_quality", lambda: text_pipe.doc_quality(docs).count())
    timed("dedup_exact", lambda: dedup_pipe.exact_dedup(docs).count())
    timed(
        "dedup_minhash_lsh",
        lambda: dedup_pipe.minhash_neardup_pairs(docs, threshold=0.7),
    )
    n_rows.update(
        {"doc_quality": n_docs, "dedup_exact": n_docs, "dedup_minhash_lsh": n_docs}
    )

    emb = rd.read_parquet(
        f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    timed("ann_topk", lambda: similarity.ann_topk(emb, [0, 1, 2], k=10))
    n_rows["ann_topk"] = emb.count()

    headline = timings["colo_mine_images"]
    result = {
        "metric": "size-k co-location mining end-to-end wall time "
        "(image+caption table, geotag->join->stars->subtree WPI mining)",
        "value": headline,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "rows": n_events,
        "rows_per_sec": round(n_events / headline, 1),
        "n_patterns": n_patterns,
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SF_DIR=SF_DIR)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    # N vs 4N parallelism in fresh processes. 4 -> 16 rather than 8 -> 32:
    # this sandbox is ONE 32-core socket, and beyond ~16 active cores the
    # vectorized (sort/shuffle-heavy) kernels saturate DRAM bandwidth --
    # a single-node artifact that separate nodes of a real cluster do not
    # share (each brings its own memory bus). Measured 8->32 numbers and
    # the analysis are recorded in BASELINE.md.
    lo, hi = 4, 16
    r_lo = one(lo)
    r_hi = one(hi)
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)

    def q_eff(name: str) -> float:
        return round(
            (r_lo["queries"][name] / r_hi["queries"][name]) / (hi / lo), 3
        )

    return {
        "metric": f"scaling efficiency (num_cpus {lo} -> {hi}, same input)",
        f"sec_{lo}": r_lo["value"],
        f"sec_{hi}": r_hi["value"],
        f"rows_per_sec_{lo}": r_lo["rows_per_sec"],
        f"rows_per_sec_{hi}": r_hi["rows_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "scaling_efficiency_salted": q_eff("colo_mine_images_salted"),
        "sf": SF_DIR,
        f"queries_{lo}": r_lo["queries"],
        f"queries_{hi}": r_hi["queries"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
