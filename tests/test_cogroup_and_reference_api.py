"""Cogrouped physical strategy must equal the Catalyst-join strategy;
reference-parity file drivers end-to-end."""

import pytest

from workstealing_spatial_join_spark.operators.cogroup_join import (
    point_in_polygon_join_cogrouped,
    polygon_join_cogrouped,
)
from workstealing_spatial_join_spark.operators.ingest import ingest_geometry
from workstealing_spatial_join_spark.operators.reference_api import (
    spatial_join_files,
    spatial_join_partitioned_files,
)
from workstealing_spatial_join_spark.operators.spatial_join import (
    point_in_polygon_join,
    polygon_join,
)
from workstealing_spatial_join_spark.sources import fixtures as FX


@pytest.fixture(scope="module")
def layers(spark):
    ppdf = FX.polygons_pdf(120)
    la = ppdf.iloc[:60].rename(columns={"polygon_id": "a_id"})
    lb = ppdf.iloc[60:].rename(columns={"polygon_id": "b_id"})
    da = ingest_geometry(spark.createDataFrame(la), "wkt", keep_cols=["a_id"]).cache()
    db = ingest_geometry(spark.createDataFrame(lb), "wkt", keep_cols=["b_id"]).cache()
    return da, db


def test_cogroup_polygon_join_equals_catalyst_path(layers):
    da, db = layers
    want = {
        (r.lid, r.rid)
        for r in polygon_join(da, db, "a_id", "b_id", predicate="intersects").collect()
    }
    got = {
        (r.lid, r.rid)
        for r in polygon_join_cogrouped(da, db, "a_id", "b_id").collect()
    }
    assert got == want and len(want) > 0


def test_cogroup_pip_equals_catalyst_path(spark):
    images = spark.createDataFrame(
        FX.images_pdf(800, with_bytes=False)[["image_id", "lon", "lat"]]
    )
    polys = ingest_geometry(
        spark.createDataFrame(FX.polygons_pdf(80)), "wkt", keep_cols=["polygon_id"]
    )
    want = {
        (r.point_id, r.poly_id)
        for r in point_in_polygon_join(images, polys).collect()
    }
    got = {
        (r.point_id, r.poly_id)
        for r in point_in_polygon_join_cogrouped(images, polys).collect()
    }
    assert got == want and len(want) > 0


def test_reference_file_driver(spark, tmp_path, layers):
    """End-to-end parity shape: WKT text files in → scalar out, for
    all three predicates; parity driver ≥ refpoint driver."""
    ppdf = FX.polygons_pdf(120)
    f1 = tmp_path / "layer1.txt"
    f2 = tmp_path / "layer2.txt"
    f1.write_text("\n".join(ppdf.iloc[:60]["wkt"]) + "\n")
    f2.write_text("\n".join(ppdf.iloc[60:]["wkt"]) + "\n")
    da, db = layers
    for predicate in ("intersects", "intersection_numpoints", "union_numpoints"):
        got = spatial_join_files(
            spark, str(f1), str(f2), predicate=predicate
        ).collect()[0][0]
        want = polygon_join(
            da, db, "a_id", "b_id", predicate=predicate, mode="count"
        ).collect()[0][0]
        assert got == want, predicate
    parity = spatial_join_partitioned_files(spark, str(f1), str(f2)).collect()[0][0]
    dedup = spatial_join_files(spark, str(f1), str(f2), "intersects").collect()[0][0]
    assert parity >= dedup
