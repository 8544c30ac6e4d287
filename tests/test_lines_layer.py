"""Mixed-geometry joins: LineString layers through the same engine
(reference joins Polygon/LineString/Point layers,
include/global_var.h:57-60)."""

import pytest

from tests.oracle import join_oracle
from workstealing_spatial_join_spark.operators.ingest import ingest_geometry
from workstealing_spatial_join_spark.operators.spatial_join import polygon_join
from workstealing_spatial_join_spark.sources import fixtures as FX


@pytest.fixture(scope="module")
def line_poly_layers(spark):
    lines = FX.lines_pdf(150).rename(columns={"line_id": "a_id"})
    polys = FX.polygons_pdf(150).rename(columns={"polygon_id": "b_id"})
    dl = ingest_geometry(spark.createDataFrame(lines), "wkt", keep_cols=["a_id"])
    dp = ingest_geometry(spark.createDataFrame(polys), "wkt", keep_cols=["b_id"])
    return lines, polys, dl, dp


def test_line_polygon_intersects(line_poly_layers):
    lines, polys, dl, dp = line_poly_layers
    want_pairs, want_count = join_oracle(lines, polys, "a_id", "b_id", "intersects")
    got = polygon_join(dl, dp, "a_id", "b_id", predicate="intersects")
    got_pairs = {(r.lid, r.rid) for r in got.collect()}
    assert got_pairs == want_pairs
    assert len(want_pairs) > 0


def test_line_line_intersects(spark):
    la = FX.lines_pdf(120).rename(columns={"line_id": "a_id"})
    lb = FX.lines_pdf(240).iloc[120:].rename(columns={"line_id": "b_id"})
    da = ingest_geometry(spark.createDataFrame(la), "wkt", keep_cols=["a_id"])
    db = ingest_geometry(spark.createDataFrame(lb), "wkt", keep_cols=["b_id"])
    want_pairs, _ = join_oracle(la, lb, "a_id", "b_id", "intersects")
    got = {
        (r.lid, r.rid)
        for r in polygon_join(da, db, "a_id", "b_id", predicate="intersects").collect()
    }
    assert got == want_pairs
