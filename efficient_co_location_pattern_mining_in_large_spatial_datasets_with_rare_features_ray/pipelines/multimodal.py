"""Multimodal (image) Dataset stages + the flagship image-mining pipeline.

Images are opaque ``binary`` columns with typed metadata (w, h, fmt);
every pixel-touching stage is an actor-pool ``map_batches`` (codec state
per actor, small batches because rows are wide). The sandbox has no
image libraries: PNG and baseline JPEG (JFIF) codecs plus
nearest-neighbor resize are real pure-numpy implementations written
from the public specs; audio / video codecs are STUBBED behind
NotImplementedError with the Ray-side plumbing (schemas, batch sizes,
actor signatures) real and tested.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from ..config import MiningConfig
from ..sources.geotag import check_invariants, geotag
from ..sources.image_codec import decode, encode_png
from ..sources.images import read_image_table
from . import colocation


class DecodeStats:
    """Actor stage: decode + per-image channel statistics (the
    'feature-extract' step of an image pipeline)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        means = np.zeros((batch.num_rows, 3), np.float64)
        stds = np.zeros(batch.num_rows, np.float64)
        blobs = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        for i, (blob, fmt) in enumerate(zip(blobs, fmts)):
            px = decode(blob, fmt).astype(np.float64)
            means[i] = px.mean(axis=(0, 1))
            stds[i] = px.std()
        return pa.table(
            {
                "image_id": batch["image_id"],
                "mean_r": pa.array(means[:, 0]),
                "mean_g": pa.array(means[:, 1]),
                "mean_b": pa.array(means[:, 2]),
                "std_gray": pa.array(stds),
            }
        )


class Resize:
    """Actor stage: nearest-neighbor resize (real numpy implementation),
    re-encoded as PNG. Output keeps the input schema."""

    def __init__(self, target: int = 4):
        self.target = int(target)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_bytes, out_w, out_h, out_fmt = [], [], [], []
        blobs = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        t = self.target
        for blob, fmt in zip(blobs, fmts):
            px = decode(blob, fmt)
            h, w, _ = px.shape
            yi = (np.arange(t) * h) // t
            xi = (np.arange(t) * w) // t
            small = px[yi][:, xi]
            out_bytes.append(encode_png(small))
            out_w.append(t)
            out_h.append(t)
            out_fmt.append("png")
        return pa.table(
            {
                "image_id": batch["image_id"],
                "bytes": pa.array(out_bytes, pa.binary()),
                "w": pa.array(out_w, pa.int32()),
                "h": pa.array(out_h, pa.int32()),
                "fmt": pa.array(out_fmt, pa.string()),
                "caption": batch["caption"],
                "phash": batch["phash"],
            }
        )


def decode_stats(images: Dataset, concurrency: int = 2) -> Dataset:
    return images.map_batches(
        DecodeStats, batch_format="pyarrow", batch_size=512,
        concurrency=concurrency, num_cpus=1,
    )


def resize_images(images: Dataset, target: int = 4, concurrency: int = 2) -> Dataset:
    return images.map_batches(
        Resize,
        fn_constructor_kwargs={"target": target},
        batch_format="pyarrow", batch_size=256,
        concurrency=concurrency, num_cpus=1,
    )


def sample_video_frames(*_args, **_kwargs):
    """STUB: video frame sampling needs a real demuxer (not in this
    container). The distributed shape would be identical to Resize:
    an actor-pool map_batches over binary rows."""
    raise NotImplementedError("video codecs unavailable in this environment")


def extract_audio_features(*_args, **_kwargs):
    """STUB: audio decode needs a real codec (not in this container)."""
    raise NotImplementedError("audio codecs unavailable in this environment")


def mine_image_table(
    path: str,
    cfg: MiningConfig | None = None,
    verify_invariants: bool = False,
) -> colocation.MiningRun:
    """The flagship end-to-end pipeline from the north rule: Lance/Parquet
    image+caption table -> geotag projection (bytes dropped before any
    shuffle) -> grid distance join -> ordered stars -> per-subtree WPI
    mining."""
    if verify_invariants:
        # invariant pass needs the pixels; run it on a full read first
        bad = check_invariants(read_image_table(path)).filter(
            lambda r: not r["invariant_ok"]
        )
        n_bad = bad.count()
        if n_bad:
            raise ValueError(f"{n_bad} rows violate image invariants")
    # mining path: prune at the read -- the wide `bytes` column never
    # leaves storage, let alone enters a shuffle
    from ..sources.images import GEOTAG_COLUMNS

    instances = geotag(read_image_table(path, columns=GEOTAG_COLUMNS))
    return colocation.mine(instances, cfg or MiningConfig())
