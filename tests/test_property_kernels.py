"""Property-based kernel tests (hypothesis) — SURVEY.md §5.6: random
geometry with extreme skew, invariants vs brute-force definitions."""

import os

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

# Deep sweep knob (ROADMAP test debt): PROP_SCALE=10 multiplies every
# max_examples — run occasionally as a slow suite.
_SCALE = float(os.environ.get("PROP_SCALE", "1"))


def _ex(n: int) -> int:
    return max(10, int(n * _SCALE))

from workstealing_spatial_join_spark.functions import geom as G
from workstealing_spatial_join_spark.functions import grid as GRID
from workstealing_spatial_join_spark.functions import wkt as W

coord = st.floats(-170, 170, allow_nan=False, width=64)
small = st.floats(0.01, 20.0, allow_nan=False, width=64)


def rect(x0, y0, w, h):
    return np.array(
        [[x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h], [x0, y0]]
    )


@given(coord, coord, small, small, coord, coord)
@settings(max_examples=_ex(200), deadline=None)
def test_rect_contains_matches_bounds(x0, y0, w, h, px, py):
    r = rect(x0, y0, w, h)
    got = bool(G.polygon_contains_xy([r], np.array([px]), np.array([py]))[0])
    want = (x0 <= px <= x0 + w) and (y0 <= py <= y0 + h)
    assert got == want


@given(coord, coord, small, small, coord, coord, small, small)
@settings(max_examples=_ex(150), deadline=None)
def test_rect_intersects_matches_overlap(x0, y0, w, h, x1, y1, w2, h2):
    a, b = rect(x0, y0, w, h), rect(x1, y1, w2, h2)
    got = G.intersects((W.POLYGON, [a]), (W.POLYGON, [b]))
    want = (x0 <= x1 + w2) and (x1 <= x0 + w) and (y0 <= y1 + h2) and (y1 <= y0 + h)
    assert got == want
    # symmetry
    assert got == G.intersects((W.POLYGON, [b]), (W.POLYGON, [a]))


@given(coord, coord, small, small, coord, coord, small, small)
@settings(max_examples=_ex(150), deadline=None)
def test_clip_area_bounded(x0, y0, w, h, x1, y1, w2, h2):
    a, b = rect(x0, y0, w, h), rect(x1, y1, w2, h2)
    clipped = G.clip_convex(a, b)
    if len(clipped) == 0:
        return
    area = _ring_area(clipped)
    assert area <= min(w * h, w2 * h2) + 1e-6


@given(coord, st.floats(-85, 85, width=64), small, small)
@settings(max_examples=_ex(200), deadline=None)
def test_covering_cells_cover_all_interior_points(x0, y0, w, h):
    cells = set(GRID.cells_covering_bbox(x0, y0, x0 + w, y0 + h).tolist())
    rng = np.random.default_rng(0)
    xs = np.clip(rng.uniform(x0, x0 + w, 20), -180, 180 - 1e-9)
    ys = np.clip(rng.uniform(y0, y0 + h, 20), -90, 90 - 1e-9)
    pc = GRID.cell_id(xs, ys)
    assert set(pc.tolist()) <= cells


@given(st.lists(st.tuples(coord, st.floats(-85, 85, width=64)), min_size=3, max_size=20))
@settings(max_examples=_ex(100), deadline=None)
def test_wkb_roundtrip_random_lines(pts):
    arr = np.asarray(pts, dtype=np.float64)
    wkb = W.to_wkb(W.LINESTRING, [arr])
    back = W.from_wkb(wkb)
    assert back[0][0] == W.LINESTRING
    assert np.array_equal(back[0][1][0], arr)
    assert W.wkb_num_points(wkb) == len(arr)


def _ring_area(ring):
    x, y = ring[:-1, 0], ring[:-1, 1]
    return abs(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)) / 2
