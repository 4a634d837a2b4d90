"""Stage checkpoints with manifests (resumable runs).

A checkpointed stage writes its output dataset as partitioned parquet
under ``<dir>/<stage>/`` and then atomically drops a ``_MANIFEST.json``
recording what was written. On rerun, a stage whose manifest matches its
fingerprint (input row count + config knobs) is skipped and its output
is read back instead of recomputed -- per-partition lineage in the sense
of the north rule: a killed run resumes from the last completed stage,
and partitioned layouts let downstream consumers (shard actors) read
only their own partition directory.
"""

from __future__ import annotations

import json
import os
import tempfile

from ray.data import Dataset


def _manifest_path(stage_dir: str) -> str:
    return os.path.join(stage_dir, "_MANIFEST.json")


def _normalize(fingerprint: dict) -> dict:
    # JSON round-trip so tuples/lists/int-vs-float compare stably against
    # what a previous process wrote
    return json.loads(json.dumps(fingerprint))


def is_complete(stage_dir: str, fingerprint: dict) -> bool:
    try:
        with open(_manifest_path(stage_dir)) as f:
            m = json.load(f)
        return m.get("fingerprint") == _normalize(fingerprint)
    except (OSError, json.JSONDecodeError):
        return False


def mark_complete(stage_dir: str, fingerprint: dict, extra: dict | None = None):
    os.makedirs(stage_dir, exist_ok=True)
    payload = {"fingerprint": fingerprint, **(extra or {})}
    # atomic: write sidecar then rename
    fd, tmp = tempfile.mkstemp(dir=stage_dir, suffix=".manifest.tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, _manifest_path(stage_dir))


def checkpoint_dataset(
    ds: Dataset,
    stage_dir: str,
    fingerprint: dict,
    partition_cols: list[str] | None = None,
) -> str:
    """Write ``ds`` under stage_dir unless an up-to-date manifest exists.
    Returns stage_dir. Safe to re-run after a crash: an incomplete write
    has no manifest and is overwritten."""
    if is_complete(stage_dir, fingerprint):
        return stage_dir
    # no valid manifest -> any existing files are a partial write; clear them
    # so the rerun can't double-count rows
    if os.path.isdir(stage_dir):
        import shutil

        shutil.rmtree(stage_dir)
    os.makedirs(stage_dir, exist_ok=True)
    if partition_cols:
        ds.write_parquet(stage_dir, partition_cols=partition_cols)
    else:
        ds.write_parquet(stage_dir)
    mark_complete(stage_dir, fingerprint)
    return stage_dir
