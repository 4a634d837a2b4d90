"""End-to-end co-location mining pipeline (the flagship).

instances(instance_id, feature, x, y)
  -> [encode]                      int64 dictionary codes (stages/sharded.py)
  -> [shuffle 1: groupby(tile)]    neighbor pairs   (stages/pairs.py)
  -> [shuffle 2: groupby(bucket)]  ordered stars + subtree keys (stages/stars.py)
  -> [shuffle 3: per-feature split] per-subtree Algorithm-1 loop
     (stages/mining.py -- static exchange over the known feature key
     space; sort-groupby degenerates on an n_features-value key)
  -> prevalent patterns sorted by (k, pattern)

Mirrors the serial reference lifecycle (src/main.cpp:31-122) re-expressed
as the paper's Algorithms 2-3 MapReduce decomposition. The only global
state is the m-entry feature-count context (computed by one small
groupby-count and captured in stage closures -- broadcast once per task
spec, never per batch).
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import pyarrow as pa

import ray
import ray.data
from ray.data import Dataset

from ..canonical import FeatureContext
from ..config import MiningConfig
from ..stages.grid import global_origin
from ..stages.mining import PATTERN_SCHEMA
from ..stages.pairs import neighbor_pairs
from ..stages.stars import build_stars


def scan_metadata(instances: Dataset) -> tuple[dict[str, int], tuple[float, float]]:
    """One streaming pass computing BOTH the feature-count map
    (src/utils.cpp:32-44, keyed on the feature column) and the global
    grid origin (min x, min y -- src/spatial_index.cpp:52-61): per-batch
    partial aggregates merged on the driver, no shuffle."""

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        vc = t["feature"].combine_chunks().value_counts()
        feats = vc.field("values")
        ns = vc.field("counts").cast(pa.int64())
        mx = pc.min(t["x"]).as_py()
        my = pc.min(t["y"]).as_py()
        k = len(feats)
        return pa.table(
            {
                "feature": feats,
                "n": ns,
                "min_x": pa.array([mx] * k, pa.float64()),
                "min_y": pa.array([my] * k, pa.float64()),
            }
        )

    rows = instances.map_batches(partial, batch_format="pyarrow").take_all()
    counts: dict[str, int] = {}
    ox, oy = float("inf"), float("inf")
    for r in rows:
        counts[r["feature"]] = counts.get(r["feature"], 0) + int(r["n"])
        ox = min(ox, r["min_x"])
        oy = min(oy, r["min_y"])
    return counts, (ox, oy)


def feature_counts(instances: Dataset) -> dict[str, int]:
    return scan_metadata(instances)[0]


def make_context(instances: Dataset) -> FeatureContext:
    return FeatureContext(feature_counts(instances))


@dataclass
class MiningRun:
    patterns: Dataset          # PATTERN_SCHEMA rows, sorted (k, pattern)
    ctx: FeatureContext
    config: MiningConfig
    seconds: float
    n_instances: int | None = None
    stage_stats: str | None = None  # ds.stats() of the executed DAG
    # the driver-side result table, cached when the run built it --
    # patterns_table() then skips a whole (tiny but ~0.3-0.5 s fixed
    # cost) Dataset job per call
    table: pa.Table | None = None

    def patterns_table(self) -> pa.Table:
        if self.table is not None:
            return self.table
        refs = self.patterns.to_arrow_refs()
        parts = [
            p.select(PATTERN_SCHEMA.names)
            for p in (ray.get(refs) if refs else [])
            if p.num_rows and set(PATTERN_SCHEMA.names) <= set(p.column_names)
        ]
        if not parts:
            return PATTERN_SCHEMA.empty_table()
        return pa.concat_tables(parts).combine_chunks()

    def pattern_set(self) -> set[tuple[str, ...]]:
        t = self.patterns_table()
        return {tuple(s.split(",")) for s in t["pattern"].to_pylist()}

    def report(self) -> dict:
        """Fields mirroring the reference report sink (src/main.cpp:90-117)."""
        t = self.patterns_table()
        return {
            "instance_count": self.n_instances,
            "neighbor_distance": self.config.neighbor_distance,
            "min_prevalence": self.config.min_prevalence,
            "elapsed_sec": self.seconds,
            "pattern_count": t.num_rows,
            "patterns": sorted(t["pattern"].to_pylist()),
        }


def mine(
    instances: Dataset,
    cfg: MiningConfig | None = None,
    ctx: FeatureContext | None = None,
    work_dir: str | None = None,
) -> MiningRun:
    """Run the full pipeline. ``instances`` must have columns
    (instance_id: string, feature: string, x: float64, y: float64).

    ``work_dir`` (or ``cfg.checkpoint_dir``) makes the run RESUMABLE:
    the star exchange's output and each subtree's pattern rows are
    checkpointed as fingerprinted parquet partitions; a rerun after a
    mid-job kill skips completed stages/roots
    (stages/mining.mine_task_graph_checkpointed)."""
    import os as _os

    cfg = cfg or MiningConfig()
    t0 = time.perf_counter()
    _timing = _os.environ.get("CLPM_TASK_TIMING")

    def _milestone(label: str) -> None:
        if _timing:
            print(f"MILESTONE {label} {time.perf_counter() - t0:.3f}", flush=True)

    origin = cfg.grid_origin
    # ONE materialize of the source; per-block row counts come from the
    # executor metadata, the feature-count/origin scan is one grouped
    # task wave, and the positional int64 id coding happens INSIDE the
    # task graph's first wave (offsets derive from the metadata) -- the
    # source is read once and written to plasma once.
    from ..stages.mining import scan_meta_blocks
    from ..stages.sharded import materialized_blocks

    blocks = materialized_blocks(instances)
    counts, scanned_origin = scan_meta_blocks(blocks)
    _milestone("encode_done")
    if ctx is None:
        ctx = FeatureContext(counts)
    origin = origin or scanned_origin

    work_dir = work_dir or cfg.checkpoint_dir
    if work_dir is not None:
        from ..stages.mining import mine_task_graph_checkpointed

        tables = mine_task_graph_checkpointed(
            blocks, ctx, cfg, origin,
            n_codes=int(sum(counts.values())), work_dir=work_dir,
        )
        tables = [t for t in tables if t.num_rows]
    else:
        # barrier-free task graph: pair buckets -> edge slices -> star
        # build (pre-split by subtree) -> per-subtree level loop; each
        # stage starts the moment its inputs exist
        # (stages/mining.mine_task_graph)
        from ..stages.mining import mine_task_graph

        tasks = mine_task_graph(
            blocks, ctx, cfg, origin, n_codes=int(sum(counts.values()))
        )
        _milestone("graph_submitted")
        # branch-split preps return LISTS of nested branch-task refs
        # alongside plain k2 pattern tables; all branch outputs fan into
        # ONE gather task (per-object driver ray.get overhead measured
        # ~2-3 s at ~320 branches), which also resolves the deep-split
        # sub-branch nesting
        from ..stages.mining import _gather_pattern_tables

        results = ray.get(list(tasks))
        _milestone("preps_done")
        branch_refs = [
            r for res in results if isinstance(res, list) for r in res
        ]
        tables = [
            t for t in results if not isinstance(t, list) and t.num_rows
        ]
        if branch_refs:
            gathered = ray.get(_gather_pattern_tables.remote(*branch_refs))
            if gathered.num_rows:
                tables.append(gathered)
        _milestone("branches_done")
    out = (
        pa.concat_tables(tables).combine_chunks()
        if tables else PATTERN_SCHEMA.empty_table()
    )
    # tiny result: sort on the driver (same (k, pattern) order as before)
    import pyarrow.compute as pc  # noqa: F401

    out = out.sort_by([("k", "ascending"), ("pattern", "ascending")])
    patterns = ray.data.from_arrow(out)
    secs = time.perf_counter() - t0
    return MiningRun(
        patterns=patterns, ctx=ctx, config=cfg, seconds=secs, table=out
    )


def mine_coordinated(
    instances: Dataset,
    cfg: MiningConfig | None = None,
    ctx: FeatureContext | None = None,
    n_shards: int | None = None,
    work_dir: str | None = None,
) -> MiningRun:
    """Salted / root-instance-sharded mining (stages/sharded.py).

    Same exact output as ``mine`` but partitioned by hash(root instance)
    instead of by rarest feature: immune to feature-count skew (a
    5-feature dataset still fans out to n_shards workers), supports
    Lemma 3 exactly (cfg.use_lemma3), and resumes from the sharded-star
    parquet checkpoint when work_dir is reused."""
    import tempfile

    import ray as _ray

    from ..stages.sharded import (
        ShardMiner,
        build_shard_stars,
        coordinated_level_loop,
        encode_and_scan,
    )
    from ..state.checkpoint import checkpoint_dataset, is_complete

    cfg = cfg or MiningConfig()
    t0 = time.perf_counter()
    import os as _os

    _timing = _os.environ.get("CLPM_TASK_TIMING")

    def _milestone(label: str) -> None:
        if _timing:
            print(f"SALTED {label} {time.perf_counter() - t0:.3f}", flush=True)

    origin = cfg.grid_origin
    # dictionary-encode instance ids to dense global int64 codes (the
    # whole sharded path then runs on vectorized int64 ops instead of
    # strings), fused with the metadata scan -- one pass, source read
    # exactly once per job.
    instances, counts, scanned_origin = encode_and_scan(instances)
    if ctx is None:
        ctx = FeatureContext(counts)
        origin = origin or scanned_origin
    total_cpus = int(_ray.cluster_resources().get("CPU", 8))
    if n_shards is None:
        # constant, cluster-size-independent: star replication depends on
        # n_shards (one copy per distinct in-neighbor shard), so tying it
        # to CPU count would make bigger clusters do MORE work
        n_shards = 64

    # one actor per core, each owning n_shards/n_actors shards: actor
    # processes are expensive to start; shard hashing does the balancing
    # (oversubscribing actors was measured to hurt at high core counts).
    # Created BEFORE the star job so process spawn + imports overlap the
    # Dataset work instead of serializing after it.
    n_actors = max(1, min(total_cpus, n_shards))
    owned: list[list[int]] = [[] for _ in range(n_actors)]
    for s in range(n_shards):
        owned[s % n_actors].append(s)
    actors = [
        ShardMiner.options(num_cpus=0).remote(ctx, shards, n_shards)
        for shards in owned
    ]

    use_checkpoint = work_dir is not None or cfg.checkpoint_dir is not None
    work_dir = work_dir or cfg.checkpoint_dir or tempfile.mkdtemp(prefix="clpm_shards_")
    fingerprint = {
        "d": cfg.neighbor_distance,
        "n_shards": n_shards,
        "counts": sorted(ctx.counts.items()),
        "layout": "int64-codes-v2",  # invalidates pre-encoding checkpoints
    }
    stage_dir = f"{work_dir}/shard_stars"

    def build_stars_ds():
        nonlocal origin
        if origin is None:
            origin = global_origin(instances)
        pairs = neighbor_pairs(instances, cfg, origin=origin)
        return build_shard_stars(
            pairs, ctx, n_shards,
            cfg.resolved_star_buckets(n_rows=int(sum(ctx.counts.values()))),
        )

    _milestone("encode_done")
    try:
        if use_checkpoint:
            if not is_complete(stage_dir, fingerprint):
                checkpoint_dataset(
                    build_stars_ds(), stage_dir, fingerprint,
                    partition_cols=["shard"],
                )
            ray.get([a.load.remote(stage_dir) for a in actors])
        else:
            # in-memory: skip the parquet round trip. The star-bucket
            # exchange tasks split their own output by shard
            # (num_returns=n_shards), so each actor fetches exactly its
            # rows -- no intermediate star Dataset, no split-task wave.
            from ..stages.sharded import build_shard_star_grid

            if origin is None:
                origin = global_origin(instances)
            pairs = neighbor_pairs(instances, cfg, origin=origin)
            grids = build_shard_star_grid(
                pairs, ctx, n_shards,
                cfg.resolved_star_buckets(
                    n_rows=int(sum(ctx.counts.values()))
                ),
            )
            _milestone("stars_submitted")
            load_stats = ray.get(
                [
                    a.load_split.remote(
                        [grids[b][s] for b in range(len(grids)) for s in shards]
                    )
                    for a, shards in zip(actors, owned)
                ]
            )
            if _timing:
                fs = sorted(s["fetch_s"] for s in load_stats)
                bs = sorted(s["build_s"] for s in load_stats)
                print(
                    f"SALTED load_split fetch_max={fs[-1]} "
                    f"fetch_med={fs[len(fs)//2]} build_max={bs[-1]} "
                    f"build_med={bs[len(bs)//2]} "
                    f"rows={sum(s['rows'] for s in load_stats)}",
                    flush=True,
                )
        _milestone("load_done")
        recs = coordinated_level_loop(
            actors, ctx, cfg.min_prevalence, cfg.use_lemma3, cfg.measure
        )
        _milestone("loop_done")
    finally:
        for a in actors:
            ray.kill(a)
    recs.sort(key=lambda r: (r["k"], r["pattern"]))
    t = pa.Table.from_arrays(
        [
            pa.array([",".join(r["pattern"]) for r in recs], pa.string()),
            pa.array([r["k"] for r in recs], pa.int32()),
            pa.array([r["pattern"][0] for r in recs], pa.string()),
            pa.array([r["wpi"] for r in recs], pa.float64()),
            pa.array([r["pi"] for r in recs], pa.float64()),
            pa.array([r["n_rows"] for r in recs], pa.int64()),
            pa.array([r["prs"] for r in recs], pa.list_(pa.float64())),
        ],
        schema=PATTERN_SCHEMA,
    )
    patterns = ray.data.from_arrow(t)
    secs = time.perf_counter() - t0
    return MiningRun(
        patterns=patterns, ctx=ctx, config=cfg, seconds=secs, table=t
    )


def write_results(run: MiningRun, out_dir: str) -> dict:
    """Report sink (reference src/main.cpp:73-122): prevalent patterns as
    parquet + a JSON report with the reference's fields (dataset size, d,
    min_prev, wall time, pattern count, numbered pattern list). Unlike
    the reference, the configured output path is honored
    (src/main.cpp:84 hard-codes ../results.txt)."""
    import json
    import os

    os.makedirs(out_dir, exist_ok=True)
    run.patterns.write_parquet(os.path.join(out_dir, "patterns"))
    report = run.report()
    with open(os.path.join(out_dir, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    if run.stage_stats:
        # per-stage wall/cpu/memory breakdown from the streaming executor
        with open(os.path.join(out_dir, "stage_stats.txt"), "w") as f:
            f.write(run.stage_stats)
    return report


def from_numpy(ids, feats, x, y, parallelism: int = 8) -> Dataset:
    """Build an instances Dataset from numpy arrays (tests/fixtures)."""
    t = pa.table(
        {
            "instance_id": pa.array([str(s) for s in ids], pa.string()),
            "feature": pa.array([str(s) for s in feats], pa.string()),
            "x": pa.array(x, pa.float64()),
            "y": pa.array(y, pa.float64()),
        }
    )
    ds = ray.data.from_arrow(t)
    return ds.repartition(parallelism) if parallelism else ds
