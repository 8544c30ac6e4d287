"""Unit tests for the NumPy geometry kernels (no Spark)."""

import numpy as np

from workstealing_spatial_join_spark.functions import geom as G
from workstealing_spatial_join_spark.functions import wkt as W

SQ = np.array([[0.0, 0], [4, 0], [4, 4], [0, 4], [0, 0]])  # 4x4 square
TRI = np.array([[2.0, 2], [6, 2], [4, 6], [2, 2]])


def test_wkt_roundtrip():
    wkt = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
    geoms = W.parse_wkt(wkt)
    assert len(geoms) == 1
    gtype, rings = geoms[0]
    assert gtype == W.POLYGON and rings[0].shape == (5, 2)
    wkb = W.to_wkb(gtype, rings)
    back = W.from_wkb(wkb)
    assert np.allclose(back[0][1][0], rings[0])
    assert W.wkb_bounds(wkb) == (0.0, 0.0, 4.0, 4.0)
    assert W.wkb_num_points(wkb) == 5


def test_multipart_explode():
    wkt = "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5)))"
    geoms = W.parse_wkt(wkt)
    assert len(geoms) == 2
    assert all(g[0] == W.POLYGON for g in geoms)


def test_contains_xy_closed_boundary():
    xs = np.array([2.0, 4.0, 0.0, 5.0, -0.1, 2.0])
    ys = np.array([2.0, 2.0, 0.0, 5.0, 2.0, 4.0])  # interior, edge, vertex, out, out, edge
    res = G.polygon_contains_xy([SQ], xs, ys)
    assert res.tolist() == [True, True, True, False, False, True]


def test_contains_with_hole():
    hole = np.array([[1.0, 1], [3, 1], [3, 3], [1, 3], [1, 1]])
    rings = [SQ, hole]
    xs = np.array([2.0, 0.5, 1.0])
    ys = np.array([2.0, 0.5, 2.0])  # in hole, in shell, on hole boundary
    assert G.polygon_contains_xy(rings, xs, ys).tolist() == [False, True, True]


def test_intersects_polygons():
    assert G.intersects((W.POLYGON, [SQ]), (W.POLYGON, [TRI]))
    far = TRI + 100.0
    assert not G.intersects((W.POLYGON, [SQ]), (W.POLYGON, [far]))
    # containment without edge crossing
    inner = np.array([[1.0, 1], [2, 1], [2, 2], [1, 1]])
    assert G.intersects((W.POLYGON, [SQ]), (W.POLYGON, [inner]))
    # touching at a corner counts (closed semantics)
    touch = SQ + 4.0
    assert G.intersects((W.POLYGON, [SQ]), (W.POLYGON, [touch]))


def test_clip_convex_square_overlap():
    other = SQ + 2.0  # overlap is the 2x2 square (2,2)-(4,4)
    clipped = G.clip_convex(SQ, other)
    assert len(clipped) == 5  # 4 corners + closing vertex
    assert np.isclose(_ring_area(clipped), 4.0)


def test_clip_convex_disjoint_empty():
    assert len(G.clip_convex(SQ, SQ + 10.0)) == 0


def test_union_numpoints_disjoint_and_overlap():
    assert G.union_num_points_convex([SQ], [SQ + 10.0]) == 10
    # 4x4 and its +2 shift: union is an octagon-ish shape:
    # 3 corners of each square outside the other + 2 crossings + closing
    assert G.union_num_points_convex([SQ], [SQ + 2.0]) == 3 + 3 + 2 + 1


def test_line_predicates():
    line = np.array([[-1.0, 2.0], [5.0, 2.0]])
    assert G.intersects((W.LINESTRING, [line]), (W.POLYGON, [SQ]))
    miss = np.array([[-1.0, 9.0], [5.0, 9.0]])
    assert not G.intersects((W.LINESTRING, [miss]), (W.POLYGON, [SQ]))
    assert G.intersects(
        (W.LINESTRING, [line]), (W.LINESTRING, [np.array([[2.0, 0.0], [2.0, 4.0]])])
    )


def _ring_area(ring):
    x, y = ring[:-1, 0], ring[:-1, 1]
    return abs(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)) / 2


def test_is_valid_geom():
    sq = np.array([[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]], dtype=float)
    bow = np.array([[0, 0], [2, 2], [2, 0], [0, 2], [0, 0]], dtype=float)
    open_ring = sq[:-1]
    hole_in = np.array(
        [[0.5, 0.5], [0.5, 1.0], [1.0, 1.0], [1.0, 0.5], [0.5, 0.5]], dtype=float
    )
    hole_out = hole_in + 5.0
    assert G.is_valid_geom(W.POLYGON, [sq])
    assert not G.is_valid_geom(W.POLYGON, [bow])        # self-intersecting
    assert not G.is_valid_geom(W.POLYGON, [open_ring])  # not closed
    assert G.is_valid_geom(W.POLYGON, [sq, hole_in])
    assert not G.is_valid_geom(W.POLYGON, [sq, hole_out])
    assert not G.is_valid_geom(
        W.POLYGON, [np.array([[0, 0], [1, np.nan], [1, 1], [0, 0]])]
    )
    assert G.is_valid_geom(W.POINT, [np.array([[1.0, 2.0]])])
    assert G.is_valid_geom(W.LINESTRING, [sq[:3]])
    # concave-but-simple star stays valid
    from workstealing_spatial_join_spark.functions import overlay as OV

    star = np.array(
        [[0, 0], [4, 1], [2, 2], [3, 4], [1, 3], [0, 0]], dtype=float
    )
    assert not OV.is_convex(star)
    assert G.is_valid_geom(W.POLYGON, [star])


def test_ingest_validate_drops_invalid(spark):
    from workstealing_spatial_join_spark.operators.ingest import ingest_geometry

    rows = [
        (1, "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"),
        (2, "POLYGON ((0 0, 2 2, 2 0, 0 2, 0 0))"),  # bowtie
        (3, "not a geometry"),
    ]
    df = spark.createDataFrame(rows, "gid int, wkt string")
    lax = ingest_geometry(df, "wkt", keep_cols=["gid"])
    strict = ingest_geometry(df, "wkt", keep_cols=["gid"], validate=True)
    assert {r.gid for r in lax.collect()} == {1, 2}
    assert {r.gid for r in strict.collect()} == {1}
    # st_is_valid UDF agrees
    from pyspark.sql import functions as F

    from workstealing_spatial_join_spark.functions.predicates import st_is_valid

    flags = {
        r.gid: r.ok
        for r in lax.select("gid", st_is_valid(F.col("geom_wkb")).alias("ok")).collect()
    }
    assert flags == {1: True, 2: False}
