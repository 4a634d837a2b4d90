"""Resumable partitioned-parquet sink (per-PARTITION lineage).

``state/checkpoint.py`` resumes at STAGE granularity (one manifest per
stage). At 100 TB a single output stage is hours of writing; when it
dies 80% through, rerunning the whole stage wastes 80% of the work.
This sink gives each partition directory its own completion manifest:

    out_dir/
      part=<v1>/ *.parquet  _PART_MANIFEST.json   <- finished
      part=<v2>/ *.parquet                        <- partial (crashed)

On rerun, finished partitions are SKIPPED (their rows are filtered out
of the input before anything executes — the filter is a broadcast of
the finished-value set, not a shuffle), partial directories are cleared
and rewritten. The write itself is Ray Data's streaming
``write_parquet(partition_cols=...)``; per-partition manifests drop
only after the whole write wave lands, so a crash can never mark an
unfinished partition complete.

The partition column should be LOW-CARDINALITY (a shard id, a date, a
key range — the same contract as hive partitioning); the finished-set
broadcast is one small object.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

_PART_MANIFEST = "_PART_MANIFEST.json"


def _part_dir(out_dir: str, col: str, value) -> str:
    return os.path.join(out_dir, f"{col}={value}")


def finished_partitions(out_dir: str, col: str) -> set:
    """Partition VALUES (as strings — hive dirnames are strings) whose
    manifest exists."""
    done: set = set()
    if not os.path.isdir(out_dir):
        return done
    prefix = f"{col}="
    for name in os.listdir(out_dir):
        if name.startswith(prefix) and os.path.exists(
            os.path.join(out_dir, name, _PART_MANIFEST)
        ):
            done.add(name[len(prefix):])
    return done


def resumable_write_partitioned(
    ds: Dataset, out_dir: str, partition_col: str
) -> dict:
    """Write ``ds`` as hive-partitioned parquet under ``out_dir``,
    skipping partitions a previous (possibly crashed) run finished.
    Returns ``{"written": [values...], "skipped": [values...]}``.

    The partition column must be integer- or string-typed (hive dirname
    round-trip); rows of finished partitions never execute — the filter
    runs at the batch level against a broadcast frozenset."""
    os.makedirs(out_dir, exist_ok=True)
    done = finished_partitions(out_dir, partition_col)

    # clear partial (manifest-less) partition dirs from a crashed run so
    # the rewrite can't double-count rows
    prefix = f"{partition_col}="
    for name in os.listdir(out_dir):
        p = os.path.join(out_dir, name)
        if (
            name.startswith(prefix)
            and os.path.isdir(p)
            and not os.path.exists(os.path.join(p, _PART_MANIFEST))
        ):
            shutil.rmtree(p)

    done_ref = ray.put(frozenset(done))

    def drop_finished(t: pa.Table) -> pa.Table:
        fin = ray.get(done_ref)
        if not fin:
            return t
        vals = t[partition_col].to_numpy(zero_copy_only=False)
        keep = ~np.isin(vals.astype(str), np.array(sorted(fin), dtype=str))
        return t.filter(pa.array(keep))

    todo = ds.map_batches(drop_finished, batch_format="pyarrow")

    # distinct remaining partition values: tiny by the low-cardinality
    # contract (per-batch unique partials, driver merges one short row
    # per block)
    def distinct_vals(t: pa.Table) -> pa.Table:
        vals = t[partition_col].to_numpy(zero_copy_only=False)
        u = np.unique(vals.astype(str))
        return pa.table({"v": pa.array(u, pa.string())})

    todo = todo.materialize()  # one execution feeds both the distinct
    # pass and the write (not a scale concern: blocks live in plasma)
    new_vals = sorted(
        {r["v"] for r in todo.map_batches(
            distinct_vals, batch_format="pyarrow"
        ).take_all()}
    )
    if new_vals:
        todo.write_parquet(out_dir, partition_cols=[partition_col])
        for v in new_vals:
            pd_dir = _part_dir(out_dir, partition_col, v)
            with open(os.path.join(pd_dir, _PART_MANIFEST), "w") as f:
                json.dump({"partition": v}, f)
    return {"written": new_vals, "skipped": sorted(done)}
