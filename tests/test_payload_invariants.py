"""input_hint payload invariants: decoded-pixel PSNR≥40dB (lossy) /
exact (lossless) + caption equality per row, carried THROUGH the
spatial join (late materialization), per BASELINE.json."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from workstealing_spatial_join_spark.functions import images as IMG
from workstealing_spatial_join_spark.operators.ingest import ingest_geometry
from workstealing_spatial_join_spark.operators.spatial_join import (
    point_in_polygon_join,
)
from workstealing_spatial_join_spark.sources import fixtures as FX

N = 200


@pytest.fixture(scope="module")
def images_pdf():
    return FX.images_pdf(N, with_bytes=True)


def _reference_pixels(i: int) -> np.ndarray:
    """Re-derive the pre-encoding pixel array for fixture row i."""
    rng = np.random.default_rng([42, 1, i])
    # consume the lon/lat draws exactly as fixtures._img_row does
    if i % 10 == 0:
        rng.uniform()
        rng.uniform()
    else:
        rng.uniform(-180.0, 180.0)
        rng.uniform(-60.0, 60.0)
    w, h = FX._WS[i % 3], FX._HS[i % 3]
    gx = np.linspace(0, 255, w)
    gy = np.linspace(0, 255, h)
    base = (gy[:, None] + gx[None, :]) / 2.0
    noise = rng.integers(0, 32, size=(h, w, 3))
    return np.clip(base[:, :, None] + noise, 0, 255).astype(np.uint8)


def test_codec_roundtrip_psnr(images_pdf):
    for _, row in images_pdf.iterrows():
        i = int(row.image_id[3:])
        ref = _reference_pixels(i)
        dec = IMG.decode_image(row["bytes"])
        assert dec.shape == (row.h, row.w, 3)
        if row.fmt == "png":
            assert np.array_equal(dec, ref), f"png not lossless for {row.image_id}"
        else:
            p = IMG.psnr(ref, dec)
            assert p >= 40.0, f"PSNR {p:.1f} < 40 for {row.image_id}"


def test_phash_deterministic(images_pdf):
    row = images_pdf.iloc[1]
    assert IMG.phash64(IMG.decode_image(row["bytes"])) == row.phash


def test_payload_through_join(spark, images_pdf):
    """Join carries image_id only; bytes+caption attach afterwards
    (late materialization). Verify per-row invariants on the joined
    output with a vectorized pandas UDF — no per-row Python driver
    loops over collected data."""
    images = spark.createDataFrame(images_pdf)
    polys = ingest_geometry(
        spark.createDataFrame(FX.polygons_pdf(300)), "wkt", keep_cols=["polygon_id"]
    )
    pairs = point_in_polygon_join(
        images, polys, mode="pairs", cell_deg=4.0
    )
    enriched = pairs.join(images, pairs.point_id == images.image_id)
    assert enriched.count() > 0

    @F.pandas_udf(T.BooleanType())
    def payload_ok(
        data: pd.Series, fmt: pd.Series, phash: pd.Series, caption: pd.Series
    ) -> pd.Series:
        out = []
        for b, f_, ph, cap in zip(data, fmt, phash, caption):
            dec = IMG.decode_image(bytes(b))
            ok = IMG.phash64(dec) == ph and cap.startswith("synthetic caption")
            out.append(bool(ok))
        return pd.Series(out)

    bad = enriched.where(
        ~payload_ok(F.col("bytes"), F.col("fmt"), F.col("phash"), F.col("caption"))
    ).count()
    assert bad == 0


def test_caption_equality_round_trip(spark, images_pdf):
    """Captions survive write→read→join byte-identically."""
    images = spark.createDataFrame(images_pdf)
    back = images.select("image_id", "caption").toPandas()
    merged = back.merge(images_pdf[["image_id", "caption"]], on="image_id")
    assert (merged.caption_x == merged.caption_y).all()
