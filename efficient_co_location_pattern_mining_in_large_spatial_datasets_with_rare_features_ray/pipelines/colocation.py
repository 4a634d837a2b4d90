"""End-to-end co-location mining pipeline (the flagship).

instances(instance_id, feature, x, y)
  -> [shuffle 1: groupby(tile)]    neighbor pairs   (stages/pairs.py)
  -> [shuffle 2: groupby(bucket)]  ordered stars + subtree keys (stages/stars.py)
  -> [shuffle 3: groupby(subtree)] per-subtree Algorithm-1 loop (stages/mining.py)
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
from ..stages.mining import PATTERN_SCHEMA, mine_subtrees
from ..stages.pairs import neighbor_pairs
from ..stages.stars import build_stars


def feature_counts(instances: Dataset) -> dict[str, int]:
    """Global count-by-feature (reference src/utils.cpp:32-44 -- but keyed
    on the feature column, not id.substr(0,1)). Small driver-side result."""
    rows = instances.groupby("feature").count().take_all()
    return {r["feature"]: int(r["count()"]) for r in rows}


def make_context(instances: Dataset) -> FeatureContext:
    return FeatureContext(feature_counts(instances))


@dataclass
class MiningRun:
    patterns: Dataset          # PATTERN_SCHEMA rows, sorted (k, pattern)
    ctx: FeatureContext
    config: MiningConfig
    seconds: float
    n_instances: int | None = None

    def patterns_table(self) -> pa.Table:
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
) -> MiningRun:
    """Run the full pipeline. ``instances`` must have columns
    (instance_id: string, feature: string, x: float64, y: float64)."""
    cfg = cfg or MiningConfig()
    t0 = time.perf_counter()
    if ctx is None:
        ctx = make_context(instances)
    origin = cfg.grid_origin or global_origin(instances)
    pairs = neighbor_pairs(instances, cfg, origin=origin)
    stars = build_stars(pairs, ctx, cfg)
    patterns = mine_subtrees(stars, ctx, cfg)

    def _coerce(t: pa.Table) -> pa.Table:
        # groupby partitions with zero groups yield schemaless empty blocks;
        # pin every block to PATTERN_SCHEMA so consumers see one stable schema
        if t.num_rows == 0 or not set(PATTERN_SCHEMA.names) <= set(t.column_names):
            return PATTERN_SCHEMA.empty_table()
        return t.select(PATTERN_SCHEMA.names).cast(PATTERN_SCHEMA)

    patterns = patterns.map_batches(_coerce, batch_format="pyarrow")
    patterns = patterns.sort(["k", "pattern"])
    # sort() is the consuming barrier; time to here covers the whole DAG
    patterns = patterns.materialize()
    secs = time.perf_counter() - t0
    return MiningRun(patterns=patterns, ctx=ctx, config=cfg, seconds=secs)


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
