"""Multimodal image operators: decode stats, resize, patch features
(+ ANN over image features end-to-end)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from workstealing_spatial_join_spark.functions import images as IMG
from workstealing_spatial_join_spark.operators.multimodal import (
    decode_stats,
    patch_features,
    resize_images,
    sample_video_frames,
)
from workstealing_spatial_join_spark.operators.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_lsh,
)
from workstealing_spatial_join_spark.sources import fixtures as FX


@pytest.fixture(scope="module")
def images(spark):
    return spark.createDataFrame(FX.images_pdf(120, with_bytes=True)).cache()


def test_decode_stats(images):
    rows = decode_stats(images).collect()
    assert len(rows) == 120
    for r in rows:
        assert 0 <= r.mean_r <= 255 and r.sharpness is not None


def test_resize_roundtrip(images):
    out = resize_images(images, 16, 16).collect()
    assert len(out) == 120
    for r in out:
        arr = IMG.decode_image(bytes(r.bytes))
        assert arr.shape == (16, 16, 3)
        assert r.fmt == "png" and r.w == 16 and r.h == 16
        assert IMG.phash64(arr) == r.phash


def test_patch_features_normalized(images):
    rows = patch_features(images).collect()
    assert len(rows) == 120
    for r in rows:
        v = np.asarray(r.embedding)
        assert v.shape == (64,)
        assert abs(np.linalg.norm(v) - 1.0) < 1e-5


def test_ann_over_image_features(spark, images):
    """End-to-end: image bytes → features → exact + LSH ANN; LSH top-1
    must agree with exact top-1 for most queries (recall check)."""
    feats = patch_features(images).cache()
    queries = feats.limit(20)
    exact = cosine_topk_bruteforce(
        queries, feats, k=1, q_id="image_id", c_id="image_id",
        q_vec="embedding", c_vec="embedding",
    )
    approx = cosine_topk_lsh(
        queries, feats, k=1, q_id="image_id", c_id="image_id",
        q_vec="embedding", c_vec="embedding", n_planes=8,
    )
    e = {r.query_id: r.neighbor_id for r in exact.collect()}
    a = {r.query_id: r.neighbor_id for r in approx.collect()}
    hits = sum(1 for q in e if a.get(q) == e[q])
    assert hits >= len(e) * 0.6  # multi-probe 1-bit recall floor


def test_video_stub_raises(spark):
    videos = spark.createDataFrame(
        [("v1", b"\x00fake")], "video_id string, bytes binary"
    )
    with pytest.raises(Exception) as exc_info:
        sample_video_frames(videos).collect()
    assert "ffmpeg" in str(exc_info.value) or "NotImplemented" in repr(exc_info.value)
