"""Multimodal payload operators: images (and stubs for audio/video)
as opaque binary columns with typed metadata, processed in
Arrow-batched ``mapInPandas`` — the pattern a 10^12-row training-data
pipeline uses for media columns.

Real here: PNG + lossy-stub decode (functions/images.py), block-mean
resize, patch-feature extraction (feeds the similarity operators),
quality stats, video frame sampling and audio spectral features —
the LAST TWO with a pluggable ``decoder=`` codec binding: everything
Spark-side (Arrow batching, frame explode, PNG encode, Hann+rFFT band
pooling) is real and tested against deterministic fake decoders
(``fake_video_decoder`` / ``fake_audio_decoder``); only the actual
codec call (ffmpeg / soundfile — absent from this sandbox) is
injected, and the default ``decoder=None`` raises NotImplementedError
rather than faking silently.
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


def decode_stats(images: DataFrame, jpeg_decoder=None) -> DataFrame:
    """Per-image decoded-pixel stats: mean/std per channel + sharpness
    proxy (mean abs horizontal gradient). One decode per row, batched.
    ``jpeg_decoder`` is the pluggable real-JPEG codec binding (see
    functions.images.decode_image)."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for img_id, data in zip(pdf["image_id"], pdf["bytes"]):
                try:
                    if data is None:  # NULL payload → null stats row
                        raise ValueError("null payload")
                    arr = IMG.decode_image(
                        bytes(data), jpeg_decoder=jpeg_decoder
                    ).astype(np.float64)
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


def resize_images(
    images: DataFrame, out_w: int = 32, out_h: int = 32, jpeg_decoder=None
) -> DataFrame:
    """Decode → block-mean resize → re-encode PNG. Schema-preserving
    transform of the payload column (fmt becomes 'png').
    ``jpeg_decoder`` is the pluggable real-JPEG codec binding."""

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keep, out_bytes, phashes = [], [], []
            for i, data in enumerate(pdf["bytes"]):
                if data is None:
                    continue  # NULL payload → row dropped, not a batch abort
                arr = IMG.decode_image(bytes(data), jpeg_decoder=jpeg_decoder)
                small = _block_mean_resize(arr, out_w, out_h)
                keep.append(i)
                out_bytes.append(IMG.png_encode(small))
                phashes.append(IMG.phash64(small))
            res = pdf.iloc[keep][["image_id", "caption"]].copy()
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


def patch_features(
    images: DataFrame, grid: int = 8, jpeg_decoder=None
) -> DataFrame:
    """Image → grid×grid block-mean grayscale feature vector
    (array<float>), the embedding column for similarity/dedup ops.
    ``jpeg_decoder`` is the pluggable real-JPEG codec binding."""

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for data in pdf["bytes"]:
                if data is None:
                    feats.append(None)  # NULL payload → null embedding
                    continue
                arr = IMG.decode_image(bytes(data), jpeg_decoder=jpeg_decoder)
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


_DCT8 = None


def _dct8_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II basis (the real JPEG transform)."""
    global _DCT8
    if _DCT8 is None:
        k = np.arange(8)
        m = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16.0)
        m[0] *= 1.0 / np.sqrt(2.0)
        _DCT8 = (m * 0.5).astype(np.float64)
    return _DCT8


_FAKE_JPEG_QUANT = 6.0  # flat table: coeff error ≤ 3 → PSNR ≈ 43 dB


def fake_jpeg_encode(arr: np.ndarray) -> bytes:
    """Deterministic DCT test codec ENCODER: real JPEG math (8×8
    blockwise orthonormal DCT-II, uniform quantization) under a real
    SOI header (``FF D8 FF``), with the coefficients zlib'd instead of
    Huffman-coded. Exists so the ``jpeg_decoder=`` seam can be
    exercised end-to-end without libjpeg; NOT wire-compatible with
    actual JPEG readers (the marker after SOI is the private ``FAKE``
    APP segment)."""
    import struct
    import zlib

    h, w, _ = arr.shape
    ph, pw = -h % 8, -w % 8
    padded = np.pad(arr, ((0, ph), (0, pw), (0, 0)), mode="edge")
    H, W = padded.shape[:2]
    c = _dct8_matrix()
    blocks = (
        padded.astype(np.float64)
        .reshape(H // 8, 8, W // 8, 8, 3)
        .transpose(0, 2, 4, 1, 3)  # (by, bx, ch, 8, 8)
    )
    coeff = np.einsum("ij,bxcjk,lk->bxcil", c, blocks - 128.0, c)
    q = np.round(coeff / _FAKE_JPEG_QUANT).astype(np.int16)
    return (
        b"\xff\xd8\xffFAKE"
        + struct.pack(">II", w, h)
        + zlib.compress(q.tobytes(), 6)
    )


def fake_jpeg_decoder():
    """Deterministic stand-in for a libjpeg/PIL binding: inverse of
    ``fake_jpeg_encode`` (dequantize + inverse 8×8 DCT). Same
    signature as a production decoder (``bytes -> HxWx3 uint8``)."""

    def decode(data: bytes) -> np.ndarray:
        import struct
        import zlib

        if not data.startswith(b"\xff\xd8\xffFAKE"):
            raise ValueError("not a FAKE-DCT jpeg stream")
        w, h = struct.unpack_from(">II", data, 7)
        H, W = h + (-h % 8), w + (-w % 8)
        q = np.frombuffer(
            zlib.decompress(data[15:]), dtype=np.int16
        ).reshape(H // 8, W // 8, 3, 8, 8)
        c = _dct8_matrix()
        coeff = q.astype(np.float64) * _FAKE_JPEG_QUANT
        blocks = np.einsum("ji,bxcjk,kl->bxcil", c, coeff, c) + 128.0
        padded = blocks.transpose(0, 3, 1, 4, 2).reshape(H, W, 3)
        return np.clip(np.round(padded), 0, 255).astype(np.uint8)[:h, :w]

    return decode


def fake_video_decoder(n_frames: int = 90, w: int = 16, h: int = 16):
    """Deterministic stand-in for an ffmpeg binding: frames derived
    from a hash of the payload bytes + frame index (same bytes → same
    frames on every executor). Lets the FULL Spark pipeline — explode
    to frames, sample, PNG-encode — run and be tested where no codec
    exists; swap in a real decoder with the same signature
    (``bytes -> iterator of (frame_idx, HxWx3 uint8)``) in
    production."""

    def decode(data: bytes):
        import hashlib

        seed = int.from_bytes(
            hashlib.sha256(data or b"").digest()[:8], "big"
        )
        rng = np.random.default_rng(seed)
        base = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        for idx in range(n_frames):
            # drifting brightness — frames differ deterministically
            frame = np.clip(
                base.astype(np.int32) + (idx * 7) % 64 - 32, 0, 255
            ).astype(np.uint8)
            yield idx, frame

    return decode


def sample_video_frames(
    videos: DataFrame, every_n: int = 30, decoder=None
) -> DataFrame:
    """Video payload → one row per SAMPLED frame (every ``every_n``-th),
    frames re-encoded as PNG. The Spark side — Arrow batching, the
    frame explode, the PNG encode — is fully real; ``decoder`` is the
    pluggable codec binding (``bytes -> iterator of (frame_idx,
    HxWx3 uint8 array)``). No ffmpeg exists in this sandbox, so the
    DEFAULT raises NotImplementedError; pass ``fake_video_decoder()``
    (deterministic) to exercise the pipeline, or an ffmpeg/PyAV-backed
    callable in production."""

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder is None:
                raise NotImplementedError(
                    "video decode needs a codec binding (ffmpeg/PyAV); "
                    "pass decoder=... (see fake_video_decoder)"
                )
            vids, idxs, pngs = [], [], []
            for vid, data in zip(pdf["video_id"], pdf["bytes"]):
                if data is None:
                    continue  # NULL payload → no frames, not a batch abort
                for frame_idx, frame in decoder(bytes(data)):
                    if frame_idx % every_n:
                        continue
                    vids.append(vid)
                    idxs.append(frame_idx)
                    pngs.append(IMG.png_encode(frame))
            yield pd.DataFrame({
                "video_id": vids,
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "frame_png": pd.Series(pngs, dtype=object),
            })

    return videos.select("video_id", "bytes").mapInPandas(
        work,
        schema="video_id string, frame_idx int, frame_png binary",
    )


def fake_audio_decoder(n_samples: int = 8192, rate: int = 16000):
    """Deterministic stand-in for a soundfile binding: a mix of
    payload-hash-seeded sinusoids (``bytes -> (float32 samples,
    sample_rate)``). Same contract as a real decoder."""

    def decode(data: bytes):
        import hashlib

        seed = int.from_bytes(
            hashlib.sha256(data or b"").digest()[:8], "big"
        )
        rng = np.random.default_rng(seed)
        t = np.arange(n_samples, dtype=np.float64) / rate
        sig = np.zeros(n_samples)
        for _ in range(4):
            f = float(rng.uniform(50, rate / 2 - 50))
            sig += float(rng.uniform(0.1, 1.0)) * np.sin(
                2 * np.pi * f * t + float(rng.uniform(0, 2 * np.pi))
            )
        return sig.astype(np.float32), rate

    return decode


def audio_features(
    audio: DataFrame, n_bands: int = 16, decoder=None
) -> DataFrame:
    """Audio payload → log-spaced spectral band energies (the feature
    column for the similarity/dedup operators). The DSP — Hann window,
    rFFT, band pooling — is real NumPy, computed per row inside the
    Arrow batch; ``decoder`` is the pluggable codec binding
    (``bytes -> (float samples, sample_rate)``). Default raises (no
    soundfile in this sandbox); pass ``fake_audio_decoder()`` to
    exercise the pipeline, or a soundfile-backed callable in
    production."""

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder is None:
                raise NotImplementedError(
                    "audio decode needs a codec binding (soundfile); "
                    "pass decoder=... (see fake_audio_decoder)"
                )
            ids, feats = [], []
            for aid, data in zip(pdf["audio_id"], pdf["bytes"]):
                if data is None:
                    # NULL payload → null features, not a batch abort
                    ids.append(aid)
                    feats.append(None)
                    continue
                samples, rate = decoder(bytes(data))
                x = np.asarray(samples, dtype=np.float64)
                x = x * np.hanning(len(x))
                spec = np.abs(np.fft.rfft(x)) ** 2
                freqs = np.fft.rfftfreq(len(x), d=1.0 / rate)
                # log-spaced band edges from 20 Hz to Nyquist
                edges = np.geomspace(20.0, rate / 2.0, n_bands + 1)
                band = np.searchsorted(edges, freqs, side="right") - 1
                energy = np.zeros(n_bands)
                ok = (band >= 0) & (band < n_bands)
                np.add.at(energy, band[ok], spec[ok])
                feats.append(
                    np.log1p(energy).astype(np.float32).tolist()
                )
                ids.append(aid)
            yield pd.DataFrame({"audio_id": ids, "band_energy": feats})

    return audio.select("audio_id", "bytes").mapInPandas(
        work, schema="audio_id string, band_energy array<float>"
    )
