"""JSONL (newline-delimited JSON) document source.

Crawl/training corpora commonly arrive as JSONL shards (one JSON object
per line, optionally gzip-compressed) rather than Parquet; this source
reads them into the same ``documents``-shaped Dataset the rest of the
engine consumes, so every text/dedup/corpus pipeline runs unchanged on
either storage format.

Ray-Data-first: ``ray.data.read_json`` splits by file (one read task
per shard on a cluster — shard your corpus into many files, as crawl
dumps already are) and streams Arrow blocks; gzip shards (``.gz``)
decompress inside the read tasks. JSON has no column pruning at the
byte level (every line must be parsed), so the projection happens
immediately after parse — pass ``columns`` and the surviving blocks
carry only what downstream stages need.
"""

from __future__ import annotations

from ray.data import Dataset


def read_documents_jsonl(
    path: str | list[str], columns: list[str] | None = None
) -> Dataset:
    """Dataset over JSONL document shard(s). ``path`` is a file, a
    directory of shards, or an explicit list; ``*.gz`` shards
    decompress in the read tasks. Pass ``columns`` to project right
    after parse (JSONL cannot prune at the byte level the way Parquet
    row groups can — prefer Parquet for hot columns at scale; this
    source is the ingest path, not the steady-state layout)."""
    import ray.data

    ds = ray.data.read_json(path)
    if columns is not None:
        ds = ds.select_columns(list(columns))
    return ds
