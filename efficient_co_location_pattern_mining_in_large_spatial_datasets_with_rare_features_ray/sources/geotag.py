"""Geotag projection: image+caption table -> spatial instances.

The north-rule input is a Lance table of image+caption pairs; mining
operates on (feature, x, y). This stage is the stateless zero-copy-Arrow
projection (caption token -> feature, phash bit-fields -> coordinates)
plus an OPTIONAL per-row invariant check stage (decoded-pixel PSNR /
byte-equality, caption equality, dims) that runs as an actor pool so the
decoder state is constructed once per actor.

Crucially the wide ``bytes`` column is projected away here -- pixels
never enter any shuffle (SURVEY.md sec. 7.4 "wide binary rows").
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from .image_codec import decode, deterministic_pixels, psnr

PSNR_MIN_DB = 40.0


def unpack_phash(phash: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    ph = phash.astype(np.int64)
    x = ((ph >> 32) & 0xFFFFFFFF) / 1000.0
    y = (ph & 0xFFFFFFFF) / 1000.0
    return x, y


def geotag(images: Dataset) -> Dataset:
    """image table -> instances(instance_id, feature, x, y). Stateless,
    vectorized, drops every wide column at the read boundary."""

    def fn(t: pa.Table) -> pa.Table:
        x, y = unpack_phash(t["phash"].to_numpy())
        # feature = first whitespace token of the caption (vectorized)
        feat = pc.utf8_split_whitespace(t["caption"], max_splits=1)
        feat = pc.list_element(feat, 0)
        return pa.table(
            {
                "instance_id": t["image_id"],
                "feature": feat,
                "x": pa.array(x, pa.float64()),
                "y": pa.array(y, pa.float64()),
            }
        )

    return images.map_batches(fn, batch_format="pyarrow")


class InvariantChecker:
    """Actor-pool stage: decode each image and verify the per-row
    invariants from BASELINE.json input_hint (PSNR >= 40 dB for lossy
    fmt, byte-exact pixels for lossless, dims == (w, h), caption intact).
    Emits per-row booleans + psnr; raises on a violated invariant when
    ``strict`` (fail fast beats silent corruption at scale)."""

    def __init__(self, strict: bool = True):
        self.strict = strict  # decoder state / config held once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["image_id"].to_pylist()
        blobs = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        ws = batch["w"].to_pylist()
        hs = batch["h"].to_pylist()
        caps = batch["caption"].to_pylist()
        phs = batch["phash"].to_pylist()
        ok = np.zeros(len(ids), dtype=bool)
        db = np.zeros(len(ids), dtype=np.float64)
        for i, (iid, blob, fmt) in enumerate(zip(ids, blobs, fmts)):
            px = decode(blob, fmt)
            expect = deterministic_pixels(iid, ws[i], hs[i])
            if px.shape != (hs[i], ws[i], 3):
                ok[i] = False
                continue
            if fmt == "png":
                ok[i] = bool(np.array_equal(px, expect))
                db[i] = float("inf") if ok[i] else psnr(px, expect)
            else:
                db[i] = psnr(px, expect)
                ok[i] = db[i] >= PSNR_MIN_DB
            # caption integrity: its embedded coordinates must agree with
            # the phash bit-fields (caption = "{feat} at {x:.3f} {y:.3f}")
            parts = caps[i].split()
            ok[i] = (
                ok[i]
                and len(parts) == 4
                and int(round(float(parts[2]) * 1000)) == int(phs[i]) >> 32
                and int(round(float(parts[3]) * 1000)) == int(phs[i]) & 0xFFFFFFFF
            )
        if self.strict and not ok.all():
            bad = [ids[i] for i in np.nonzero(~ok)[0][:5]]
            raise ValueError(f"image invariants violated for {bad}")
        return pa.table(
            {
                "image_id": batch["image_id"],
                "invariant_ok": pa.array(ok),
                "psnr_db": pa.array(db),
                "fmt": batch["fmt"],
            }
        )


def check_invariants(images: Dataset, concurrency: int = 2) -> Dataset:
    # pool sizing: leave CPUs for the read stage -- an actor pool that
    # reserves every core deadlocks the streaming executor
    return images.map_batches(
        InvariantChecker,
        batch_format="pyarrow",
        batch_size=512,
        concurrency=concurrency,
        num_cpus=1,
    )
