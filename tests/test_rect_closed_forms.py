"""De-circularize the rect numPoints closed forms (ADVICE r2 #4): the
driver's rect_union_numpoints oracle recomputes the same 13-2(ca+cb)
formula the engine uses, so a shared derivation error would pass the
driver gate. Here both closed forms are checked against the EXACT
Fraction-arithmetic arrangement kernel (functions/overlay_exact.py) —
a structurally different derivation (node / classify / trace) that
shares no code with the formulas — over randomized integer-grid rect
pairs, which hit shared edges, corner touches, collinear overlaps and
containment constantly."""

import numpy as np
import pytest

from workstealing_spatial_join_spark.functions.overlay_exact import (
    intersection_num_points_exact,
    union_num_points_exact,
)
from workstealing_spatial_join_spark.functions.predicates import (
    _rect_generic_position,
    _rect_intersection_np,
    _rect_overlap_wh,
    _rect_union_np,
)


def _rect_ring(minx, miny, maxx, maxy):
    return np.array(
        [
            [minx, miny], [maxx, miny], [maxx, maxy], [minx, maxy],
            [minx, miny],
        ],
        dtype=float,
    )


def _random_rects(rng, n, grid):
    """Rect bounds with coordinates on a small integer grid — small
    grids make degenerate contacts (shared x/y values) the COMMON
    case, not the exception."""
    x = np.sort(rng.integers(0, grid, size=(n, 2)), axis=1)
    y = np.sort(rng.integers(0, grid, size=(n, 2)), axis=1)
    x[:, 1] += 1  # positive width/height
    y[:, 1] += 1
    return np.stack([x[:, 0], y[:, 0], x[:, 1], y[:, 1]], axis=1).astype(float)


@pytest.mark.parametrize("grid", [4, 10])
def test_rect_intersection_case_vs_exact_kernel(grid):
    rng = np.random.default_rng(grid)
    ba = _random_rects(rng, 300, grid)
    bb = _random_rects(rng, 300, grid)
    w, h = _rect_overlap_wh(ba, bb)
    got = _rect_intersection_np(w, h)
    for i in range(len(ba)):
        want = intersection_num_points_exact(
            [_rect_ring(*ba[i])], [_rect_ring(*bb[i])]
        )
        assert got[i] == want, (ba[i], bb[i], got[i], want)


@pytest.mark.parametrize("grid", [6, 12])
def test_rect_union_closed_form_vs_exact_kernel(grid):
    """The 13-2(ca+cb) formula is only CLAIMED for generic-position
    positive-overlap pairs — verify exactly that domain against the
    exact kernel, and verify the routing gate keeps everything else
    out of the formula."""
    rng = np.random.default_rng(100 + grid)
    ba = _random_rects(rng, 400, grid)
    bb = _random_rects(rng, 400, grid)
    w, h = _rect_overlap_wh(ba, bb)
    generic = _rect_generic_position(ba, bb) & (w > 0) & (h > 0)
    assert generic.any()
    got = _rect_union_np(ba[generic], bb[generic])
    idx = np.nonzero(generic)[0]
    for j, i in enumerate(idx):
        want = union_num_points_exact(
            [_rect_ring(*ba[i])], [_rect_ring(*bb[i])]
        )
        assert got[j] == want, (ba[i], bb[i], got[j], want)


def test_rect_union_degenerate_pairs_exact_kernel_values():
    """Hand-picked degenerate configurations (the formula's EXCLUDED
    domain): shared edge, corner touch, containment, identical rects,
    partial edge overlap — pin the exact kernel's GEOS-parity values
    so the non-generic routing has an anchored target."""
    cases = [
        # (rect_a, rect_b, expected union numPoints)
        ((0, 0, 2, 2), (2, 0, 4, 2), 7),   # full shared edge: boundary
        # dissolves but the nodes at (2,0)/(2,2) stay -> 6 verts + close
        ((0, 0, 2, 2), (2, 2, 4, 4), 10),  # corner touch: GEOS keeps a
        # 2-part MULTIPOLYGON (point contact) -> 5 + 5
        ((0, 0, 4, 4), (1, 1, 2, 2), 5),   # containment -> outer ring only
        ((0, 0, 2, 2), (0, 0, 2, 2), 5),   # identical
        ((0, 0, 3, 2), (1, 2, 2, 4), 9),   # edge-on-edge partial overlap
    ]
    for ra, rb, want in cases:
        got = union_num_points_exact([_rect_ring(*ra)], [_rect_ring(*rb)])
        assert got == want, (ra, rb, got, want)
