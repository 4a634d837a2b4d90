"""Deterministic image+caption fixture table (BASELINE.json input_hint).

Schema (Lance-compatible Arrow; written as partitioned Parquet since the
sandbox has no lance package -- ``read_image_table`` tries lance first):

    image_id: string   -- f"{feature}{ordinal}" like the reference ids
    bytes:    binary   -- encoded image (real PNG / real baseline JFIF)
    w, h:     int32
    fmt:      string   -- "png" | "jpeg"
    caption:  string   -- f"{feature} at {x:.3f} {y:.3f}"
    phash:    int64    -- (round(x*1000) << 32) | round(y*1000)

Geotag decode rule (shared with sources/geotag.py and the oracle):
feature = caption.split()[0]; x = (phash >> 32)/1000; y = (phash & 0xFFFFFFFF)/1000.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .fixtures import clustered_instances
from .image_codec import deterministic_pixels, encode_jpeg, encode_png

IMAGE_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)


def pack_phash(x: float, y: float) -> int:
    qx = int(round(x * 1000.0)) & 0xFFFFFFFF
    qy = int(round(y * 1000.0)) & 0xFFFFFFFF
    return (qx << 32) | qy


def build_image_table(
    ids: np.ndarray,
    feats: np.ndarray,
    xs: np.ndarray,
    ys: np.ndarray,
    img_size: int = 8,
) -> pa.Table:
    """Encode one fixture row per instance. Quantizes coordinates to 1e-3
    via phash -- callers must generate coordinates already rounded to 3
    decimals so geometry survives the pack/unpack round trip exactly."""
    rows = {k: [] for k in IMAGE_SCHEMA.names}
    for i in range(len(ids)):
        iid = str(ids[i])
        px = deterministic_pixels(iid, img_size, img_size)
        fmt = "png" if (i % 2 == 0) else "jpeg"
        data = encode_png(px) if fmt == "png" else encode_jpeg(px)
        rows["image_id"].append(iid)
        rows["bytes"].append(data)
        rows["w"].append(img_size)
        rows["h"].append(img_size)
        rows["fmt"].append(fmt)
        rows["caption"].append(f"{feats[i]} at {xs[i]:.3f} {ys[i]:.3f}")
        rows["phash"].append(pack_phash(float(xs[i]), float(ys[i])))
    return pa.table(rows, schema=IMAGE_SCHEMA)


def _write_image_shard(out_dir, s, lo, hi, img_size, ids, feats, xs, ys):
    t = build_image_table(
        ids[lo:hi], feats[lo:hi], xs[lo:hi], ys[lo:hi], img_size=img_size
    )
    pq.write_table(t, os.path.join(out_dir, f"part-{s:04d}.parquet"))


def write_image_fixture(
    out_dir: str,
    n: int = 5000,
    n_features: int = 24,
    extent: float = 1000.0,
    seed: int = 17,
    shards: int = 8,
    img_size: int = 8,
) -> str:
    """Clustered spatial layout (so co-location patterns exist) with a
    skewed feature-count profile including genuinely rare features.
    Written as ``part-XXXX.parquet`` shards; idempotent (skips if the
    manifest row count matches)."""
    os.makedirs(out_dir, exist_ok=True)
    # marker carries a codec version: bumping it invalidates fixture dirs
    # cached under /tmp by earlier rounds (jfif1 = real JPEG bitstreams)
    marker = os.path.join(out_dir, "_SUCCESS")
    stamp = f"{n}:jfif1"
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == stamp:
                return out_dir
    rng = np.random.default_rng(seed)
    # skewed counts: geometric-ish profile, a few rare features
    labels = [f"F{i:02d}" for i in range(n_features)]
    raw = rng.geometric(0.12, size=n_features).astype(np.float64)
    w = raw / raw.sum()
    counts = {lab: max(2, int(round(wi * n))) for lab, wi in zip(labels, w)}
    ids, feats, xs, ys = clustered_instances(
        n,
        feature_counts=counts,
        extent=(extent, extent),
        n_clusters=max(20, n // 100),
        cluster_sigma=6.0,
        seed=seed,
    )
    order = rng.permutation(len(ids))
    ids, feats, xs, ys = ids[order], feats[order], xs[order], ys[order]
    per = (len(ids) + shards - 1) // shards
    bounds = [
        (s, s * per, min((s + 1) * per, len(ids)))
        for s in range(shards)
        if s * per < len(ids)
    ]

    # the per-row codec loop is the cost (minutes at 10^6+ rows); shard
    # generation is embarrassingly parallel and deterministic per shard,
    # so fan out over Ray when a session is up (bench always has one).
    # Arrays go through the object store ONCE; tasks slice by bounds.
    import ray as _ray

    # real JPEG entropy coding is ~0.35 ms/row: fan out well before the
    # old 200k threshold (20k rows ~ 4s serial, the break-even point)
    if len(ids) > 20_000 and _ray.is_initialized():
        shard_task = _ray.remote(_write_image_shard)
        refs = [_ray.put(a) for a in (ids, feats, xs, ys)]
        _ray.get([
            shard_task.remote(out_dir, s, lo, hi, img_size, *refs)
            for s, lo, hi in bounds
        ])
    else:
        for s, lo, hi in bounds:
            _write_image_shard(out_dir, s, lo, hi, img_size, ids, feats, xs, ys)
    with open(marker, "w") as f:
        f.write(stamp)
    return out_dir


def lance_available() -> bool:
    """Capability probe for the Lance read path (the input hint names
    Lance tables; this sandbox has no lance wheel, so the probe returns
    False here and every read falls back to Parquet). Split out so the
    branch selection is testable without the library."""
    try:
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


def read_image_table(path: str, columns: list[str] | None = None):
    """Dataset over the image table; prefers Lance when available
    (input_hint names Lance), falls back to Parquet. Pass ``columns`` to
    prune at the read -- the mining path must never load ``bytes``."""
    import ray.data

    if lance_available():
        return ray.data.read_lance(path, columns=columns)
    return ray.data.read_parquet(path, columns=columns)


GEOTAG_COLUMNS = ["image_id", "caption", "phash"]  # all the miner needs
