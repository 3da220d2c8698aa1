"""Multimodal column plumbing: image/audio/video as opaque binary + typed
metadata, processed through Arrow-batched mapInPandas stages.

The Spark-side machinery (schemas, batch shapes, partition-preserving UDF
signatures, metadata propagation) is real and tested. The IMAGE path is a
real codec: BMP payloads (8-bit paletted / 24-bit BGR) decode through the
from-spec parser in datapipe/bmp.py — the synthetic media corpus emits
genuine BMP files and tests check closed-form histograms against the
encoded pixels. Audio/video kernels remain STUBS — the sandbox has no
ffmpeg — with a deterministic fake behind `_decode_image_stub` as the
non-BMP fallback; swapping in PIL/ffmpeg changes ONE function per
modality, nothing in the Spark plan.

Schemas:
    media(media_id long, kind string, payload binary,
          meta struct<width:int, height:int, sample_rate:int, n_frames:int>)
    image features -> (media_id, feat array<float>)
    frame samples  -> (media_id, frame_idx int, frame binary)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
)

HAVE_PIL = False
try:  # pragma: no cover - not present in this container
    import PIL.Image  # type: ignore  # noqa: F401

    HAVE_PIL = True
except Exception:
    pass


def _decode_image_stub(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic fake decode: bytes -> (h, w) uint8 grid by repeating the
    payload. Real impl: PIL.Image.open(BytesIO(payload)) -> np.asarray."""
    if HAVE_PIL:
        raise NotImplementedError("wire PIL decode here when the library ships")
    if not payload or width <= 0 or height <= 0:
        return np.zeros((0, 0), dtype=np.uint8)
    buf = np.frombuffer(bytes(payload), dtype=np.uint8)
    reps = int(np.ceil(width * height / max(len(buf), 1)))
    return np.tile(buf, reps)[: width * height].reshape(height, width)


def _decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """Image decode dispatch: real BMP codec for BMP payloads (the synthetic
    corpus and any 8/24-bpp uncompressed BMP input), deterministic stub for
    anything else (no PIL in this sandbox)."""
    from .bmp import decode_bmp, is_bmp

    payload = bytes(payload or b"")
    if is_bmp(payload):
        return decode_bmp(payload)
    return _decode_image_stub(payload, width, height)


def synthetic_media_df(spark, n: int, seed: int = 42, partitions: int = 4) -> DataFrame:
    """Deterministic corpus of media rows (pure function of (seed, id)).
    Image rows carry REAL encoded files (8-bit grayscale BMPs via the
    from-spec codec in bmp.py); audio/video payloads stay opaque bytes for
    the declared stub kernels."""
    from .bmp import encode_bmp_gray8

    def gen(batches):
        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                mid = int(mid)
                rng = np.random.default_rng([seed, mid])
                kind = ["image", "audio", "video"][mid % 3]
                width, height = 8 + mid % 8, 8
                if kind == "image":
                    img = rng.integers(0, 256, size=(height, width), dtype=np.uint8)
                    payload = encode_bmp_gray8(img)
                else:
                    payload = rng.integers(0, 256, size=64 + mid % 64, dtype=np.uint8).tobytes()
                meta = {
                    "width": width,
                    "height": height,
                    "sample_rate": 16000 if kind == "audio" else 0,
                    "n_frames": 10 + mid % 5 if kind == "video" else 1,
                }
                rows.append((mid, kind, payload, meta))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])

    return spark.range(0, n, numPartitions=partitions).mapInPandas(gen, MEDIA_SCHEMA)


def image_features(media: DataFrame, n_bins: int = 16) -> DataFrame:
    """images -> (media_id, feat array<float>): intensity histogram of the
    decoded grid (REAL decode for BMP payloads). Arrow-batched; per-batch
    numpy, no per-row Python at the Spark layer."""

    def extract(batches):
        for pdf in batches:
            ids, feats = [], []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                img = _decode_image(payload, int(meta["width"]), int(meta["height"]))
                hist, _ = np.histogram(img, bins=n_bins, range=(0, 256))
                total = hist.sum() or 1
                ids.append(int(mid))
                feats.append((hist / total).astype(np.float32))
            yield pd.DataFrame({"media_id": ids, "feat": feats})

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload", "meta")
        .mapInPandas(extract, "media_id long, feat array<float>")
    )


def resize_images(media: DataFrame, out_w: int = 4, out_h: int = 4) -> DataFrame:
    """images -> (media_id, resized binary): nearest-neighbor downsample of
    the decoded grid, re-encoded as raw bytes (stub for a real resize)."""

    def resize(batches):
        for pdf in batches:
            ids, blobs = [], []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                img = _decode_image(payload, int(meta["width"]), int(meta["height"]))
                if img.size == 0:
                    out = b""
                else:
                    ys = np.linspace(0, img.shape[0] - 1, out_h).astype(int)
                    xs = np.linspace(0, img.shape[1] - 1, out_w).astype(int)
                    out = img[np.ix_(ys, xs)].tobytes()
                ids.append(int(mid))
                blobs.append(out)
            yield pd.DataFrame({"media_id": ids, "resized": blobs})

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload", "meta")
        .mapInPandas(resize, "media_id long, resized binary")
    )


def sample_frames(media: DataFrame, every: int = 3) -> DataFrame:
    """videos -> (media_id, frame_idx, frame binary): every Nth frame index;
    frame payload sliced deterministically from the blob (stub for ffmpeg
    keyframe extraction). Output fans out rows — partitioning survives
    because mapInPandas emits within the input partition."""

    def frames(batches):
        for pdf in batches:
            rows = []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                n = int(meta["n_frames"])
                blob = bytes(payload)
                step = max(len(blob) // max(n, 1), 1)
                for fi in range(0, n, every):
                    rows.append((int(mid), fi, blob[fi * step : (fi + 1) * step]))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame"])

    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", "payload", "meta")
        .mapInPandas(frames, "media_id long, frame_idx int, frame binary")
    )
