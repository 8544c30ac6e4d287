"""Exact-arithmetic arrangement overlay (functions/overlay_exact.py):
hand-derived GEOS/JTS-parity expectations for every degenerate family
the float Greiner–Hormann tracer refuses (shared edges, vertex
touches, collinear overlaps, interacting holes), agreement with the
float path on general position, and the line/point kernels.

Expected values are derived BY HAND from JTS OverlayOp semantics
(noded vertices retained; mixed-dimension intersection results; line
output split per noded span; every closed ring counts its repeated
closing vertex) — independently of both engine implementations.
"""

import numpy as np
import pytest

from workstealing_spatial_join_spark.functions import overlay as OV
from workstealing_spatial_join_spark.functions import overlay_exact as OX


def closed(pts):
    a = np.asarray(pts, dtype=np.float64)
    return np.vstack([a, a[:1]])


def rect(x0, y0, x1, y1):
    return closed([(x0, y0), (x1, y0), (x1, y1), (x0, y1)])


SQ_A = rect(0, 0, 1, 1)


class TestDegenerateRects:
    def test_edge_adjacent_full_edge(self):
        b = rect(1, 0, 2, 1)
        # intersection = LINESTRING(1 0, 1 1)
        assert OX.intersection_num_points_exact([SQ_A], [b]) == 2
        # union = one ring, noded at (1,0) and (1,1): 6 vertices + close
        assert OX.union_num_points_exact([SQ_A], [b]) == 7

    def test_edge_adjacent_partial_edge(self):
        a = rect(0, 0, 1, 2)
        b = rect(1, 1, 2, 3)
        # shared segment x=1, y in [1,2] -> LINESTRING
        assert OX.intersection_num_points_exact([a], [b]) == 2
        # union ring: 4 + 4 corners plus nodes (1,1) is B's corner,
        # (1,2) is A's corner -> 8 vertices + close
        assert OX.union_num_points_exact([a], [b]) == 9

    def test_corner_touch(self):
        b = rect(1, 1, 2, 2)
        # intersection = POINT(1 1)
        assert OX.intersection_num_points_exact([SQ_A], [b]) == 1
        # union = MULTIPOLYGON of both squares
        assert OX.union_num_points_exact([SQ_A], [b]) == 10

    def test_vertex_on_edge_touch(self):
        a = rect(0, 0, 3, 3)
        tri = closed([(3, 1), (5, 0), (5, 2)])
        assert OX.intersection_num_points_exact([a], [tri]) == 1
        # union: square ring noded at (3,1) -> 6, triangle -> 4
        assert OX.union_num_points_exact([a], [tri]) == 10

    def test_identical(self):
        assert OX.intersection_num_points_exact([SQ_A], [SQ_A]) == 5
        assert OX.union_num_points_exact([SQ_A], [SQ_A]) == 5

    def test_contained_sharing_boundary(self):
        a = rect(0, 0, 4, 4)
        b = rect(1, 0, 3, 2)  # bottom edge on A's bottom edge
        # intersection = B itself
        assert OX.intersection_num_points_exact([a], [b]) == 5
        # union = A noded at (1,0) and (3,0)
        assert OX.union_num_points_exact([a], [b]) == 7

    def test_collinear_overlap_with_area(self):
        a = rect(0, 0, 2, 1)
        b = rect(1, 0, 3, 1)
        # area overlap [1,2]x[0,1]; top/bottom boundaries collinear
        assert OX.intersection_num_points_exact([a], [b]) == 5
        # union ring noded at x=1,2 on both y=0 and y=1: 8 verts
        assert OX.union_num_points_exact([a], [b]) == 9

    def test_area_plus_separate_touch_point(self):
        # L-shaped A and staircase B: overlap area plus corner pinch
        a = closed([(0, 0), (1, 0), (1, 1), (2, 1), (2, 2), (0, 2)])
        b = closed([(0, 0), (2, 0), (2, 2), (1, 2), (1, 1), (0, 1)])
        # intersection = two unit squares touching at (1,1)
        assert OX.intersection_num_points_exact([a], [b]) == 10
        # union = square [0,2]^2 noded at (1,0),(2,1),(1,2),(0,1)
        assert OX.union_num_points_exact([a], [b]) == 9

    def test_disjoint_and_contained(self):
        b = rect(5, 5, 6, 6)
        assert OX.intersection_num_points_exact([SQ_A], [b]) == 0
        assert OX.union_num_points_exact([SQ_A], [b]) == 10
        inner = rect(0.25, 0.25, 0.5, 0.5)
        assert OX.intersection_num_points_exact([SQ_A], [inner]) == 5
        assert OX.union_num_points_exact([SQ_A], [inner]) == 5


class TestHoles:
    def test_interacting_holes_now_counted(self):
        shell_a = rect(0, 0, 10, 10)
        shell_b = rect(-1, -1, 11, 11)
        h1 = rect(4, 4, 6, 6)[::-1]
        h2 = rect(5, 5, 7, 7)[::-1]
        # result: shell A (5) + union-of-holes ring: 3+3 corners
        # outside the other + 2 crossings = 8 verts -> 9
        assert OX.intersection_num_points_exact(
            [shell_a, h1], [shell_b, h2]
        ) == 14
        # nested holes: union of holes = h1 -> 5 + 5
        h2n = rect(4.5, 4.5, 5.5, 5.5)[::-1]
        assert OX.intersection_num_points_exact(
            [shell_a, h1], [shell_b, h2n]
        ) == 10

    def test_union_with_input_holes(self):
        donut = [rect(0, 0, 4, 4), rect(1, 1, 3, 3)[::-1]]
        inner = rect(1.5, 1.5, 2.5, 2.5)
        # disjoint component inside the hole survives
        assert OX.union_num_points_exact(donut, [inner]) == 15
        # B plugs part of the hole -> L-shaped hole (6 verts) + shell
        a = [rect(0, 0, 6, 6), rect(2, 2, 4, 4)[::-1]]
        b = [rect(1, 1, 3, 3)]
        assert OX.union_num_points_exact(a, b) == 12
        # B fills the hole exactly -> solid square, shared boundary
        # dissolves but nodes (none new: corners coincide) -> 5
        c = [rect(1, 1, 3, 3)]
        assert OX.union_num_points_exact(donut, c) == 5

    def test_hole_touching_result_boundary(self):
        # B's hole touches the intersection boundary at a vertex
        a = [rect(0, 0, 4, 4)]
        b = [rect(2, 0, 6, 4), rect(3, 1, 4, 2)[::-1]]
        # intersection area = [2,4]x[0,4] minus the hole, whose right
        # edge x=4 lies ON A's boundary: the area ring detours around
        # the notch (2,0),(4,0),(4,1),(3,1),(3,2),(4,2),(4,4),(2,4)
        # -> 9, and the collapsed shared segment x=4,y in [1,2]
        # (boundary of both, no interior on either side) is emitted as
        # a LINESTRING -> +2
        assert OX.intersection_num_points_exact(a, b) == 11


class TestGeneralPositionAgreement:
    def test_matches_float_gh_on_fixture_sample(self):
        import pandas as pd

        from workstealing_spatial_join_spark.functions import wkt as W

        la = pd.read_parquet("bench_data/concave/layer_a.parquet")
        lb = pd.read_parquet("bench_data/concave/layer_b.parquet")
        exp = pd.read_parquet("bench_data/concave/expected_int.parquet")
        ga = {r.poly_id: W.from_wkb(bytes(r.geom_wkb))[0][1]
              for r in la.itertuples()}
        gb = {r.poly_id: W.from_wkb(bytes(r.geom_wkb))[0][1]
              for r in lb.itertuples()}
        sample = exp.sample(n=60, random_state=3)
        for r in sample.itertuples():
            assert OX.intersection_num_points_exact(
                ga[r.a_id], gb[r.b_id]
            ) == r.expected

    def test_union_matches_float_gh_on_fixture_sample(self):
        import pandas as pd

        from workstealing_spatial_join_spark.functions import wkt as W

        lc = pd.read_parquet("bench_data/concave/layer_c.parquet")
        ld = pd.read_parquet("bench_data/concave/layer_d.parquet")
        exp = pd.read_parquet("bench_data/concave/expected_union.parquet")
        gc = {r.poly_id: W.from_wkb(bytes(r.geom_wkb))[0][1]
              for r in lc.itertuples()}
        gd = {r.poly_id: W.from_wkb(bytes(r.geom_wkb))[0][1]
              for r in ld.itertuples()}
        sample = exp.sample(n=40, random_state=4)
        for r in sample.itertuples():
            assert OX.union_num_points_exact(
                gc[r.a_id], gd[r.b_id]
            ) == r.expected


class TestLineKernels:
    def test_line_crosses_polygon(self):
        line = np.array([(-1.0, 0.5), (2.0, 0.5)])
        # clipped span (0,0.5)-(1,0.5) -> LINESTRING 2 pts
        assert OX.line_polygon_intersection_num_points(line, [SQ_A]) == 2
        # union: square noded at (0,0.5),(1,0.5) -> 7; outside spans
        # (-1,.5)-(0,.5) and (1,.5)-(2,.5) -> 4
        assert OX.line_polygon_union_num_points(line, [SQ_A]) == 11

    def test_line_with_interior_vertex(self):
        line = np.array([(-1.0, 0.5), (0.5, 0.5), (2.0, 0.5)])
        # kept span crosses the original vertex (0.5,0.5): one
        # LineString (0,.5),(0.5,.5),(1,.5) -> 3 pts
        assert OX.line_polygon_intersection_num_points(line, [SQ_A]) == 3

    def test_line_touches_polygon_corner(self):
        line = np.array([(-1.0, 2.0), (2.0, -1.0)])  # through (1,1)? no
        # passes through (0.5,0.5)? x+y=1 -> touches corners (0,1),(1,0)
        # actually the segment y = 1-x intersects the square along the
        # full diagonal edge region: it ENTERS at (0,1) and exits (1,0),
        # span inside -> LINESTRING 2pts
        assert OX.line_polygon_intersection_num_points(line, [SQ_A]) == 2

    def test_line_tangent_point(self):
        line = np.array([(-1.0, 1.0), (0.0, 2.0)])
        b = rect(-1, -1, 0, 1)  # line touches corner (0... no:
        # line from (-1,1) to (0,2): point (-1,1) is b's top-left corner
        assert OX.line_polygon_intersection_num_points(line, [b]) == 1

    def test_line_on_boundary(self):
        line = np.array([(0.25, 0.0), (0.75, 0.0)])  # on bottom edge
        assert OX.line_polygon_intersection_num_points(line, [SQ_A]) == 2
        # union: ring noded at (0.25,0)(0.75,0) -> 7; no outside spans
        assert OX.line_polygon_union_num_points(line, [SQ_A]) == 7

    def test_line_line_cross_touch_overlap(self):
        a = np.array([(0.0, 0.0), (2.0, 2.0)])
        b = np.array([(0.0, 2.0), (2.0, 0.0)])
        assert OX.line_line_intersection_num_points(a, b) == 1
        # union: both lines noded at (1,1): 4 spans x 2 pts
        assert OX.line_line_union_num_points(a, b) == 8
        # collinear overlap
        c = np.array([(0.0, 0.0), (3.0, 0.0)])
        d = np.array([(1.0, 0.0), (2.0, 0.0)])
        assert OX.line_line_intersection_num_points(c, d) == 2
        # union: spans (0,1),(1,2),(2,3) -> 6 pts
        assert OX.line_line_union_num_points(c, d) == 6
        # touch at endpoint
        e = np.array([(3.0, 0.0), (5.0, 5.0)])
        assert OX.line_line_intersection_num_points(c, e) == 1
        # disjoint
        f = np.array([(10.0, 10.0), (11.0, 11.0)])
        assert OX.line_line_intersection_num_points(c, f) == 0
        assert OX.line_line_union_num_points(c, f) == 4

    def test_line_entirely_inside_polygon_union(self):
        line = np.array([(0.2, 0.2), (0.8, 0.8)])
        assert OX.line_polygon_intersection_num_points(line, [SQ_A]) == 2
        assert OX.line_polygon_union_num_points(line, [SQ_A]) == 5


class TestInvalid:
    def test_collapsed_ring_raises(self):
        flat = closed([(0, 0), (1, 0), (2, 0)])
        with pytest.raises(OX.InvalidOverlay):
            OX.intersection_num_points_exact([flat], [SQ_A])

    def test_float_path_still_raises_then_exact_agrees(self):
        # degenerate contact: float GH raises, exact kernel answers
        b = rect(1, 0, 2, 1)
        with pytest.raises(OV.DegenerateGeometry):
            OV.gh_clip(SQ_A, b, "intersection")
