"""Cross-validate the two independent overlay implementations on
random integer-grid star polygons: the engine's refine entry (float
Greiner–Hormann fast path + exact-kernel fallback) must equal the
exact-Fraction arrangement kernel called DIRECTLY, on every pair.

Integer grids make degenerate contacts (shared vertices, collinear
edges, touches) common, so this exercises BOTH routes: pairs the
float tracer classifies (GH result must agree with the exact kernel —
two structurally different algorithms) and pairs it rejects (fallback
must be transparent). A disagreement in either direction is a real
bug in one of the kernels."""

import numpy as np
import pytest

from workstealing_spatial_join_spark.functions.overlay import (
    polygon_intersection_num_points,
    polygon_union_num_points,
)
from workstealing_spatial_join_spark.functions.overlay_exact import (
    InvalidOverlay,
    intersection_num_points_exact,
    union_num_points_exact,
)


def _star(rng, n_arms, grid=8):
    """Simple star polygon with vertices snapped to an integer grid;
    resample until the ring is simple and has positive area."""
    from workstealing_spatial_join_spark.functions.geom import ring_is_simple

    for _ in range(50):
        ang = np.sort(rng.uniform(0, 2 * np.pi, 2 * n_arms))
        rad = np.where(np.arange(2 * n_arms) % 2 == 0, 4.0, 2.0)
        pts = np.stack(
            [np.round(rad * np.cos(ang)), np.round(rad * np.sin(ang))],
            axis=1,
        )
        # dedup consecutive snapped duplicates
        keep = np.ones(len(pts), dtype=bool)
        keep[1:] = (pts[1:] != pts[:-1]).any(axis=1)
        pts = pts[keep]
        if len(pts) < 3:
            continue
        ring = np.vstack([pts, pts[:1]])
        area2 = np.sum(
            ring[:-1, 0] * ring[1:, 1] - ring[1:, 0] * ring[:-1, 1]
        )
        if area2 == 0 or not ring_is_simple(ring):
            continue
        if area2 < 0:
            ring = ring[::-1].copy()
        return ring
    return None


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_engine_refine_equals_exact_kernel_on_grid_stars(seed):
    rng = np.random.default_rng(seed)
    rings = []
    while len(rings) < 12:
        r = _star(rng, int(rng.integers(3, 7)))
        if r is not None:
            # small integer offsets keep plenty of shared coordinates
            rings.append(r + rng.integers(-2, 3, size=2).astype(float))
    checked = 0
    for i in range(len(rings)):
        for j in range(i + 1, len(rings)):
            a, b = [rings[i]], [rings[j]]
            try:
                want_int = intersection_num_points_exact(a, b)
                want_uni = union_num_points_exact(a, b)
            except InvalidOverlay:
                continue  # arrangement the exact kernel rejects: skip
            assert polygon_intersection_num_points(a, b) == want_int, (i, j)
            assert polygon_union_num_points(a, b) == want_uni, (i, j)
            checked += 1
    assert checked >= 40  # the sweep actually covered pairs
