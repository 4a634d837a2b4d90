"""Multimodal (image) Dataset stages + the flagship image-mining pipeline.

Images are opaque ``binary`` columns with typed metadata (w, h, fmt);
every pixel-touching stage is an actor-pool ``map_batches`` (codec state
per actor, small batches because rows are wide). The sandbox has no
media libraries: PNG and baseline JPEG (JFIF) codecs plus
nearest-neighbor resize are real pure-numpy implementations written
from the public specs, and so are the audio path (RIFF/WAVE PCM16,
sources/wav.py -> AudioFeatures) and the video frame-sampling path
(MJPEG = concatenated JFIF, sources/mjpeg.py -> MjpegFrameStats).
Only general COMPRESSED audio/video codecs (mp3/aac/h264...) are
stubbed behind NotImplementedError, with the Ray-side plumbing
(schemas, batch sizes, actor signatures) real and tested.
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


# ------------------------------------------------ perceptual hash (pHash)

# 32-point orthonormal DCT-II basis for the classic pHash recipe:
# luma -> 32x32 -> DCT -> top-left 8x8 minus DC -> median threshold.
_PH_N = np.arange(32)
_PH_D = np.cos((2 * _PH_N[None, :] + 1) * _PH_N[:, None] * np.pi / 64.0) * np.sqrt(
    2.0 / 32.0
)
_PH_D[0, :] *= 1.0 / np.sqrt(2.0)
_PH_LUMA = np.array([0.299, 0.587, 0.114])
_PH_POW = (np.uint64(1) << np.arange(63, dtype=np.uint64)).astype(np.uint64)


def phash64_pixels(px: np.ndarray) -> int:
    """(h, w, 3) uint8 -> 63-bit perceptual hash (as unsigned int).
    Measured on the fixture content: JPEG-re-encode of the same pixels
    moves 0-6 bits; unrelated images differ by >= 18 bits."""
    g = px.astype(np.float64) @ _PH_LUMA
    h, w = g.shape
    yi = (np.arange(32) * h) // 32
    xi = (np.arange(32) * w) // 32
    co = (_PH_D @ g[yi][:, xi] @ _PH_D.T)[0:8, 0:8].ravel()[1:]
    bits = (co > np.median(co)).astype(np.uint64)
    return int(bits @ _PH_POW)


class PHash:
    """Actor stage: decode each image and emit its perceptual hash.
    Codec lookup tables are per-process state (built once, cached)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        out = np.empty(len(blobs), dtype=np.uint64)
        for i, (blob, fmt) in enumerate(zip(blobs, fmts)):
            out[i] = phash64_pixels(decode(blob, fmt))
        return pa.table(
            {
                "image_id": batch["image_id"],
                "phash64": pa.array(out.view(np.int64)),
            }
        )


def image_phash(images: Dataset, concurrency: int = 2) -> Dataset:
    """image table -> (image_id, phash64:int64). The int64 column is the
    two's-complement view of the unsigned 63-bit hash (Arrow-friendly)."""
    return images.map_batches(
        PHash, batch_format="pyarrow", batch_size=512,
        concurrency=concurrency, num_cpus=1,
    )


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount over a uint64 array."""
    return (
        np.unpackbits(np.ascontiguousarray(x).view(np.uint8))
        .reshape(len(x), 64)
        .sum(axis=1)
    )


def phash_neardup(
    images: Dataset,
    max_hamming: int | None = None,
    n_bands: int | None = None,
    n_parts: int = 64,
    concurrency: int = 2,
) -> Dataset:
    """Image near-duplicate pairs by pHash LSH: band the 64-bit hash into
    ``n_bands`` equal slices, co-group rows sharing any (band, slice)
    value, verify candidates by exact hamming distance <= ``max_hamming``,
    and dedup pairs found via multiple bands.

    Pigeonhole guarantee: any pair within ``n_bands - 1`` bits shares at
    least one clean band, so 8 bands x 8 bits finds every pair at
    hamming <= 7 EXACTLY -- no recall loss. But 8-bit band values give
    only 256 buckets per band, so unrelated rows collide ~n/256 per
    bucket and the per-bucket O(|g|^2) verify blows up at crawl scale.
    Defaults therefore auto-scale (the classic SimHash-dedup tradeoff):
    n <= 50k rows -> 8 bands x 8 bits, exact at <= 7; larger -> 4 bands
    x 16 bits, exact at <= 3 (expected bucket size n/65536 -- the
    production configuration for web-dedup hamming radii). Pass
    ``n_bands``/``max_hamming`` explicitly to override. ``n_parts`` only
    caps exchange task count (buckets are re-grouped exactly inside each
    part, so it never changes results)."""
    from ..stages.exchange import static_group_exchange

    hashes = image_phash(images, concurrency=concurrency)
    if n_bands is None:
        if max_hamming is not None:
            # an explicit radius overrides the size tier: pick the
            # smallest band count that keeps the pigeonhole guarantee
            if max_hamming > 15:
                raise ValueError(
                    f"max_hamming={max_hamming} needs > 16 bands of < 4 "
                    "bits — bucket values would be near-constant; use a "
                    "multi-index or cascade instead"
                )
            n_bands = next(b for b in (4, 8, 16) if b - 1 >= max_hamming)
            if max_hamming > 7:
                # 16 bands of 4 bits = 16 buckets per band: unrelated
                # rows collide ~n/16 per bucket, so the per-bucket
                # O(|g|^2) verify degenerates toward all-pairs — the
                # same reasoning the >15 error states. Viable only at
                # small n; at scale use a multi-index/cascade.
                import warnings

                warnings.warn(
                    f"max_hamming={max_hamming} selects 16 bands of 4 "
                    "bits (16 buckets/band); the per-bucket O(|g|^2) "
                    "verify is near all-pairs at scale — only viable "
                    "for small inputs",
                    RuntimeWarning,
                    stacklevel=2,
                )
        else:
            # auto tier needs n: hashes is a tiny (id, int64) table -- a
            # materialize here also stops the band expansion re-decoding
            hashes = hashes.materialize()
            n_bands = 8 if hashes.count() <= 50_000 else 4
    elif max_hamming is not None and max_hamming > n_bands - 1:
        raise ValueError(
            f"max_hamming={max_hamming} breaks the pigeonhole guarantee "
            f"of n_bands={n_bands} (exact only to {n_bands - 1}); raise "
            "n_bands or lower max_hamming"
        )
    if max_hamming is None:
        max_hamming = n_bands - 1
    band_bits = 64 // n_bands
    mask = np.uint64((1 << band_bits) - 1)

    def expand(t: pa.Table) -> pa.Table:
        ph = np.asarray(t["phash64"].to_numpy()).view(np.uint64)
        n = len(ph)
        ids = pa.concat_arrays(
            [t["image_id"].combine_chunks()] * n_bands
        )
        bucket = np.empty(n * n_bands, dtype=np.int64)
        phr = np.tile(ph, n_bands)
        for b in range(n_bands):
            sl = (ph >> np.uint64(b * band_bits)) & mask
            bucket[b * n : (b + 1) * n] = (b << band_bits) | sl.view(np.int64)
        return pa.table(
            {
                "image_id": ids,
                "phash64": pa.array(phr.view(np.int64)),
                "bucket": pa.array(bucket),
                "part": pa.array(bucket % n_parts),
            }
        )

    bands = hashes.map_batches(expand, batch_format="pyarrow")

    pair_schema = pa.schema(
        [
            ("id_a", pa.string()),
            ("id_b", pa.string()),
            ("hamming", pa.int64()),
            ("pair_part", pa.int64()),
        ]
    )

    def verify(t: pa.Table) -> pa.Table:
        import pandas as pd

        if t.num_rows < 2:
            return pair_schema.empty_table()
        df = t.to_pandas()
        out_a, out_b, out_d = [], [], []
        # a part holds several exact buckets: pair only within a bucket
        for _, g in df.groupby("bucket", sort=False):
            if len(g) < 2:
                continue
            # bucket-mates sharing the SAME hash id are band-duplicates
            # of one image row; drop exact id dups inside the bucket
            g = g.drop_duplicates("image_id")
            m = len(g)
            if m < 2:
                continue
            ph = g["phash64"].to_numpy().view(np.uint64)
            iu, ju = np.triu_indices(m, k=1)
            d = _popcount64(np.bitwise_xor(ph[iu], ph[ju]))
            keep = d <= max_hamming
            if not keep.any():
                continue
            ids = g["image_id"].to_numpy()
            a, b = ids[iu[keep]], ids[ju[keep]]
            swap = a > b  # canonical order so cross-band dups collide
            a2 = np.where(swap, b, a)
            b2 = np.where(swap, a, b)
            out_a.append(a2)
            out_b.append(b2)
            out_d.append(d[keep])
        if not out_a:
            return pair_schema.empty_table()
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        d = np.concatenate(out_d).astype(np.int64)
        part = (
            pd.util.hash_array(
                pd.Series(a).str.cat(pd.Series(b), sep="|").to_numpy(object)
            )
            % n_parts
        ).astype(np.int64)
        return pa.table(
            {
                "id_a": pa.array(a, pa.string()),
                "id_b": pa.array(b, pa.string()),
                "hamming": pa.array(d),
                "pair_part": pa.array(part),
            }
        )

    cands = static_group_exchange(
        bands, "part", n_parts, verify,
        empty_schema=pair_schema, drop_empty=True,
    )

    out_schema = pa.schema(
        [("id_a", pa.string()), ("id_b", pa.string()), ("hamming", pa.int64())]
    )

    def dedup_pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = t.to_pandas().drop_duplicates(["id_a", "id_b"])
        return pa.table(
            {
                "id_a": pa.array(df["id_a"].to_numpy(), pa.string()),
                "id_b": pa.array(df["id_b"].to_numpy(), pa.string()),
                "hamming": pa.array(df["hamming"].to_numpy().astype(np.int64)),
            }
        )

    return static_group_exchange(
        cands, "pair_part", n_parts, dedup_pairs,
        empty_schema=out_schema, drop_empty=True,
    )


def sample_video_frames(*_args, **_kwargs):
    """STUB: video frame sampling needs a real demuxer (not in this
    container). The distributed shape would be identical to Resize:
    an actor-pool map_batches over binary rows. (MJPEG-style frame
    streams ARE supported — see ``mjpeg_frame_stats`` below, which
    demuxes concatenated JFIF frames with the real JPEG codec.)"""
    raise NotImplementedError(
        "general video codecs unavailable in this environment; "
        "use mjpeg_frame_stats for motion-JPEG streams"
    )


class MjpegFrameStats:
    """Actor stage: demux MJPEG (concatenated-JFIF) clips with the
    structural splitter (sources/mjpeg.py), sample every ``every_k``-th
    frame, decode with the real JPEG codec and emit per-frame stats —
    the frame-sample + feature-extract step of a video curation
    pipeline. One input row (clip) fans out to one output row per
    sampled frame."""

    def __init__(self, every_k: int = 1):
        if every_k < 1:
            raise ValueError("every_k must be >= 1")
        self.k = int(every_k)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..sources.mjpeg import split_mjpeg

        ids: list[str] = []
        fidx: list[int] = []
        nf: list[int] = []
        ws: list[int] = []
        hs: list[int] = []
        mg: list[float] = []
        for cid, blob in zip(
            batch["clip_id"].to_pylist(), batch["bytes"].to_pylist()
        ):
            frames = split_mjpeg(blob)
            for j in range(0, len(frames), self.k):
                px = decode(frames[j], "jpeg")
                ids.append(cid)
                fidx.append(j)
                nf.append(len(frames))
                hs.append(px.shape[0])
                ws.append(px.shape[1])
                mg.append(round(float(px.astype(np.float64).mean()), 6))
        return pa.table(
            {
                "clip_id": pa.array(ids, pa.string()),
                "frame_idx": pa.array(fidx, pa.int64()),
                "n_frames": pa.array(nf, pa.int64()),
                "w": pa.array(ws, pa.int64()),
                "h": pa.array(hs, pa.int64()),
                "mean_gray": pa.array(mg, pa.float64()),
            }
        )


def mjpeg_frame_stats(
    clips: Dataset, every_k: int = 1, concurrency: int = 2
) -> Dataset:
    """Distributed frame sampling + stats over a (clip_id, bytes) table
    of MJPEG clips — actor-pool map_batches, small batches because one
    row holds a whole clip."""
    return clips.map_batches(
        MjpegFrameStats,
        fn_constructor_kwargs={"every_k": every_k},
        batch_format="pyarrow", batch_size=64,
        concurrency=concurrency, num_cpus=1,
    )


class AudioFeatures:
    """Actor stage: decode RIFF/WAVE PCM16 clips (real from-spec numpy
    codec, sources/wav.py) and extract the standard clip-level features
    a training-data pipeline filters on: duration, RMS energy, peak
    amplitude, zero-crossing count. Integer features are exact; the two
    float features are deterministic per clip (fixed-order numpy
    reductions)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..sources.wav import decode_wav

        n = batch.num_rows
        n_samples = np.zeros(n, np.int64)
        rate = np.zeros(n, np.int64)
        dur = np.zeros(n, np.float64)
        rms = np.zeros(n, np.float64)
        peak = np.zeros(n, np.int64)
        zc = np.zeros(n, np.int64)
        for i, blob in enumerate(batch["bytes"].to_pylist()):
            s, r = decode_wav(blob)
            n_samples[i] = s.shape[0]
            rate[i] = r
            dur[i] = s.shape[0] / r
            x = s.astype(np.float64)
            rms[i] = np.sqrt((x * x).mean()) if s.size else 0.0
            peak[i] = np.abs(s.astype(np.int32)).max() if s.size else 0
            # sign changes on channel 0 (int-exact; >=0 vs <0)
            c0 = s[:, 0] >= 0
            zc[i] = int(np.count_nonzero(c0[1:] != c0[:-1]))
        return pa.table(
            {
                "clip_id": batch["clip_id"],
                "n_samples": pa.array(n_samples),
                "sample_rate": pa.array(rate),
                "duration_s": pa.array(dur),
                "rms": pa.array(np.round(rms, 6)),
                "peak": pa.array(peak),
                "zero_crossings": pa.array(zc),
            }
        )


def extract_audio_features(clips: Dataset, concurrency: int = 2) -> Dataset:
    """Distributed audio feature extraction over a (clip_id, bytes)
    table of RIFF/WAVE PCM16 clips — actor-pool map_batches, small
    batches because rows are wide binary."""
    return clips.map_batches(
        AudioFeatures, batch_format="pyarrow", batch_size=256,
        concurrency=concurrency, num_cpus=1,
    )


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
