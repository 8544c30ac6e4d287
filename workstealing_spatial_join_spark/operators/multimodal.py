"""Multimodal payload operators: images (and stubs for audio/video)
as opaque binary columns with typed metadata, processed in
Arrow-batched ``mapInPandas`` — the pattern a 10^12-row training-data
pipeline uses for media columns.

Real here: PNG + lossy-stub decode (functions/images.py), block-mean
resize, patch-feature extraction (feeds the similarity operators),
quality stats. STUBBED (no libjpeg/ffmpeg/soundfile in this
environment): real-JPEG decode, video frame sampling, audio features —
each raises NotImplementedError behind the same schema/batching
plumbing so swapping in the real decoder is a one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from workstealing_spatial_join_spark.functions import images as IMG


def _block_mean_resize(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Deterministic block-mean downsample/upsample (nearest for up)."""
    h, w, c = arr.shape
    ys = (np.arange(out_h + 1) * h) // out_h
    xs = (np.arange(out_w + 1) * w) // out_w
    out = np.empty((out_h, out_w, c), dtype=np.float64)
    for i in range(out_h):
        rows = arr[ys[i] : max(ys[i + 1], ys[i] + 1)]
        for j in range(out_w):
            out[i, j] = rows[:, xs[j] : max(xs[j + 1], xs[j] + 1)].mean(axis=(0, 1))
    return np.clip(out, 0, 255).astype(np.uint8)


def decode_stats(images: DataFrame) -> DataFrame:
    """Per-image decoded-pixel stats: mean/std per channel + sharpness
    proxy (mean abs horizontal gradient). One decode per row, batched."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for img_id, data in zip(pdf["image_id"], pdf["bytes"]):
                try:
                    arr = IMG.decode_image(bytes(data)).astype(np.float64)
                except Exception:
                    rows.append((img_id, None, None, None, None))
                    continue
                grad = np.abs(np.diff(arr.mean(axis=2), axis=1)).mean()
                rows.append(
                    (
                        img_id,
                        float(arr[..., 0].mean()),
                        float(arr[..., 1].mean()),
                        float(arr[..., 2].mean()),
                        float(grad),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["image_id", "mean_r", "mean_g", "mean_b", "sharpness"]
            )

    return images.select("image_id", "bytes").mapInPandas(
        stats,
        schema="image_id string, mean_r double, mean_g double, "
        "mean_b double, sharpness double",
    )


def resize_images(images: DataFrame, out_w: int = 32, out_h: int = 32) -> DataFrame:
    """Decode → block-mean resize → re-encode PNG. Schema-preserving
    transform of the payload column (fmt becomes 'png')."""

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_bytes, phashes = [], []
            for data in pdf["bytes"]:
                arr = IMG.decode_image(bytes(data))
                small = _block_mean_resize(arr, out_w, out_h)
                out_bytes.append(IMG.png_encode(small))
                phashes.append(IMG.phash64(small))
            res = pdf[["image_id", "caption"]].copy()
            res["bytes"] = pd.Series(out_bytes, dtype=object)
            res["w"] = np.int32(out_w)
            res["h"] = np.int32(out_h)
            res["fmt"] = "png"
            res["phash"] = pd.Series(phashes, dtype="int64")
            yield res[["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]]

    return images.select("image_id", "bytes", "caption").mapInPandas(
        work,
        schema="image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash long",
    )


def patch_features(images: DataFrame, grid: int = 8) -> DataFrame:
    """Image → grid×grid block-mean grayscale feature vector
    (array<float>), the embedding column for similarity/dedup ops."""

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for data in pdf["bytes"]:
                arr = IMG.decode_image(bytes(data))
                gray = arr.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
                small = _block_mean_resize(
                    gray[:, :, None].repeat(3, axis=2), grid, grid
                )[..., 0]
                v = small.ravel().astype(np.float32)
                n = np.linalg.norm(v)
                feats.append((v / n if n > 0 else v).tolist())
            yield pd.DataFrame(
                {"image_id": pdf["image_id"], "embedding": feats}
            )

    return images.select("image_id", "bytes").mapInPandas(
        work, schema="image_id string, embedding array<float>"
    )


def sample_video_frames(videos: DataFrame, every_n: int = 30) -> DataFrame:
    """STUB — video decode requires ffmpeg (absent here). The plumbing
    (schema, batching, explode-to-frames) is real; the decode raises."""

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for _pdf in batches:
            raise NotImplementedError(
                "video decode needs ffmpeg; plug a decoder into "
                "operators/multimodal.sample_video_frames"
            )
        yield pd.DataFrame(  # pragma: no cover — makes this a generator
            columns=["video_id", "frame_idx", "frame_png"]
        )

    return videos.select("video_id", "bytes").mapInPandas(
        work,
        schema="video_id string, frame_idx int, frame_png binary",
    )


def audio_features(audio: DataFrame, n_bands: int = 16) -> DataFrame:
    """STUB — audio decode requires soundfile/librosa (absent here)."""

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for _pdf in batches:
            raise NotImplementedError(
                "audio decode needs soundfile; plug a decoder into "
                "operators/multimodal.audio_features"
            )
        yield pd.DataFrame(  # pragma: no cover — makes this a generator
            columns=["audio_id", "band_energy"]
        )

    return audio.select("audio_id", "bytes").mapInPandas(
        work, schema="audio_id string, band_energy array<float>"
    )
