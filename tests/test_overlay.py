"""General polygon overlay (Greiner–Hormann) verification.

Three independent cross-checks, per SURVEY.md §5's differential-oracle
strategy:
1. convex pairs: GH intersection == the independent Sutherland–Hodgman
   clipper; GH union == the convex boundary-counting kernel
2. hand-constructed concave cases with known answers (multi-component
   intersections, union-created holes)
3. random star polygons: the exact vertex-census identity
   numPoints(int) + numPoints(union)
     = strictly-inside(A,B) + strictly-inside(B,A) + outside counts
       + 2*crossings + ring closings
   with crossings and containment counted by code that shares nothing
   with the tracer.
"""

import numpy as np
import pytest

from workstealing_spatial_join_spark.functions import geom as G
from workstealing_spatial_join_spark.functions import overlay as OV


def closed(pts):
    a = np.asarray(pts, dtype=np.float64)
    return np.vstack([a, a[:1]])


def ring_area(ring):
    p = ring[:-1]
    x, y = p[:, 0], p[:, 1]
    return 0.5 * abs(float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)))


def convex_hull(pts):
    """Andrew monotone chain (independent of the engine kernels)."""
    pts = sorted(map(tuple, pts))
    def half(seq):
        out = []
        for p in seq:
            while len(out) >= 2 and (
                (out[-1][0] - out[-2][0]) * (p[1] - out[-2][1])
                - (out[-1][1] - out[-2][1]) * (p[0] - out[-2][0])
            ) <= 0:
                out.pop()
            out.append(p)
        return out
    lower = half(pts)
    upper = half(reversed(pts))
    return np.array(lower[:-1] + upper[:-1], dtype=np.float64)


def star(center, nv, rng, rmin=0.4, rmax=1.6):
    angles = np.sort(rng.uniform(0, 2 * np.pi, nv))
    radii = rng.uniform(rmin, rmax, nv)
    xs = center[0] + radii * np.cos(angles)
    ys = center[1] + radii * np.sin(angles)
    return closed(np.column_stack([xs, ys]))


def census(a, b):
    """Independent vertex census: (inside_a, inside_b, crossings)
    using only the ray-cast kernel and a scalar segment intersector."""
    ao, bo = a[:-1], b[:-1]
    in_a = int(G.polygon_contains_xy([b], ao[:, 0], ao[:, 1]).sum())
    in_b = int(G.polygon_contains_xy([a], bo[:, 0], bo[:, 1]).sum())
    crossings = 0
    for i in range(len(ao)):
        p, q = a[i], a[i + 1]
        for j in range(len(bo)):
            r, s = b[j], b[j + 1]
            d1 = np.sign((q[0]-p[0])*(r[1]-p[1]) - (q[1]-p[1])*(r[0]-p[0]))
            d2 = np.sign((q[0]-p[0])*(s[1]-p[1]) - (q[1]-p[1])*(s[0]-p[0]))
            d3 = np.sign((s[0]-r[0])*(p[1]-r[1]) - (s[1]-r[1])*(p[0]-r[0]))
            d4 = np.sign((s[0]-r[0])*(q[1]-r[1]) - (s[1]-r[1])*(q[0]-r[0]))
            if d1 != d2 and d3 != d4 and 0 not in (d1, d2, d3, d4):
                crossings += 1
    return in_a, in_b, crossings


def test_gh_matches_sh_on_convex_pairs():
    rng = np.random.default_rng(11)
    checked = 0
    for _ in range(60):
        a = closed(convex_hull(rng.normal(0, 1, (12, 2))))
        off = rng.uniform(-1.2, 1.2, 2)
        b = closed(convex_hull(rng.normal(0, 1, (12, 2)) + off))
        try:
            got = sum(len(r) for r in OV.gh_clip(a, b, "intersection"))
        except OV.DegenerateGeometry:
            continue
        want = G.classify_clip_num_points(G.clip_convex_raw(a, b))
        # SH classifier returns 0/1/2 for touches which GH rejects as
        # degenerate — only positive-area overlaps reach here
        assert got == (want if want >= 4 else 0), (a, b)
        # area parity too (not just counts)
        if got:
            sh = G.clip_convex(a, b)
            gh_rings = OV.gh_clip(a, b, "intersection")
            assert len(gh_rings) == 1
            assert ring_area(gh_rings[0]) == pytest.approx(ring_area(sh), rel=1e-9)
        checked += 1
    assert checked >= 50


def test_gh_union_matches_convex_kernel():
    rng = np.random.default_rng(12)
    checked = 0
    for _ in range(60):
        a = closed(convex_hull(rng.normal(0, 1, (10, 2))))
        b = closed(convex_hull(rng.normal(0, 1, (10, 2)) + rng.uniform(-1.5, 1.5, 2)))
        try:
            got = sum(len(r) for r in OV.gh_clip(a, b, "union"))
        except OV.DegenerateGeometry:
            continue
        want = G.union_num_points_convex([a], [b])
        assert got == want
        checked += 1
    assert checked >= 50


def test_concave_two_component_intersection():
    """U-shape crossed by a wide rect → TWO intersection components
    (each a 4-corner rect, 5 closed points)."""
    u = closed([(0, 0), (5, 0), (5, 5), (4, 5), (4, 1), (1, 1), (1, 5), (0, 5)])
    r = closed([(-0.5, 2.25), (5.5, 2.25), (5.5, 3.25), (-0.5, 3.25)])
    rings = OV.gh_clip(u, r, "intersection")
    assert len(rings) == 2
    assert sorted(len(x) for x in rings) == [5, 5]
    assert OV.polygon_intersection_num_points([u], [r]) == 10


def test_concave_union_creates_hole():
    """U-shape ∪ crossing rect encloses the cavity below the bar —
    the union must come back as outer ring + hole ring, and the areas
    must satisfy area(A)+area(B) = area(A∪B)+area(A∩B)."""
    u = closed([(0, 0), (5, 0), (5, 5), (4, 5), (4, 1), (1, 1), (1, 5), (0, 5)])
    r = closed([(-0.5, 2.25), (5.5, 2.25), (5.5, 3.25), (-0.5, 3.25)])
    rings = OV.gh_clip(u, r, "union")
    assert len(rings) == 2
    # classify: the ring whose first vertex is inside the other = hole
    r0, r1 = rings
    r0_in_r1 = G.polygon_contains_xy([r1], r0[:1, 0], r0[:1, 1])[0]
    outer, hole = (r1, r0) if r0_in_r1 else (r0, r1)
    a_u = ring_area(u)
    a_r = ring_area(r)
    a_int = sum(ring_area(x) for x in OV.gh_clip(u, r, "intersection"))
    a_union = ring_area(outer) - ring_area(hole)
    assert a_union == pytest.approx(a_u + a_r - a_int, rel=1e-12)
    assert OV.polygon_union_num_points([u], [r]) == sum(len(x) for x in rings)


def test_intersection_with_contained_hole():
    """A has a hole strictly inside the overlap region: the hole ring
    joins the intersection result (GEOS keeps interior rings)."""
    shell = closed([(0, 0), (10, 0), (10, 10), (0, 10)])
    hole = closed([(4, 4), (4, 6), (6, 6), (6, 4)])  # CW hole
    b = closed([(1.5, 1.5), (11, 1.5), (11, 11), (1.5, 11)])
    # shell∩b is a rect containing the hole entirely
    n = OV.polygon_intersection_num_points([shell, hole], [b])
    assert n == 5 + 5
    # hole strictly OUTSIDE the overlap: ignored
    hole_out = closed([(0.2, 0.2), (0.2, 1.0), (1.0, 1.0), (1.0, 0.2)])
    assert OV.polygon_intersection_num_points([shell, hole_out], [b]) == 5


def test_star_polygon_vertex_census_identity():
    """Random concave star pairs: counts from the GH tracer must equal
    the independent census identity."""
    rng = np.random.default_rng(13)
    checked = 0
    for _ in range(80):
        a = star((0.0, 0.0), int(rng.integers(6, 16)), rng)
        b = star(tuple(rng.uniform(-0.8, 0.8, 2)), int(rng.integers(6, 16)), rng)
        try:
            rings_i = OV.gh_clip(a, b, "intersection")
            rings_u = OV.gh_clip(a, b, "union")
        except OV.DegenerateGeometry:
            continue
        in_a, in_b, crossings = census(a, b)
        na, nb = len(a) - 1, len(b) - 1
        n_int = sum(len(r) for r in rings_i)
        n_uni = sum(len(r) for r in rings_u)
        want = (
            in_a + in_b                      # originals inside → intersection
            + (na - in_a) + (nb - in_b)      # originals outside → union
            + 2 * crossings                  # every crossing on both results
            + len(rings_i) + len(rings_u)    # closing vertices
        )
        assert n_int + n_uni == want, (a.tolist(), b.tolist())
        # area identity as well
        a_int = sum(ring_area(r) for r in rings_i)
        outer_area = 0.0
        for r in rings_u:
            others = [x for x in rings_u if x is not r]
            is_hole = any(
                G.polygon_contains_xy([o], r[:1, 0], r[:1, 1])[0] for o in others
            )
            outer_area += -ring_area(r) if is_hole else ring_area(r)
        assert outer_area == pytest.approx(
            ring_area(a) + ring_area(b) - a_int, rel=1e-9, abs=1e-12
        )
        checked += 1
    assert checked >= 60


def test_degenerate_raises_and_convex_fallback():
    sq = closed([(0, 0), (2, 0), (2, 2), (0, 2)])
    touch_edge = closed([(2, 0.5), (3, 0.5), (3, 1.5), (2, 1.5)])  # shares edge x=2
    with pytest.raises(OV.DegenerateGeometry):
        OV.gh_clip(sq, touch_edge, "intersection")
    # polygon-level wrapper falls back to the closed-halfplane SH
    # classifier: edge touch → LINESTRING → 2 points
    assert OV.polygon_intersection_num_points([sq], [touch_edge]) == 2
    corner = closed([(2, 2), (3, 2), (3, 3), (2, 3)])
    assert OV.polygon_intersection_num_points([sq], [corner]) == 1


def test_concave_fixture_expected_counts():
    """The committed concave fixture (bench_data/concave) was produced
    with exact-Fraction expected numPoints; the engine's float refine
    must reproduce every pair (the driver oracle re-checks this via
    DuckDB; this pytest pins it without Spark)."""
    import os

    import pandas as pd

    from workstealing_spatial_join_spark.functions import wkt as W

    fix = "/root/repo/bench_data/concave"
    if not os.path.exists(f"{fix}/expected_int.parquet"):
        pytest.skip("fixture not generated")
    for layers, expf, fn in (
        (("layer_a", "layer_b"), "expected_int",
         OV.polygon_intersection_num_points),
        (("layer_c", "layer_d"), "expected_union",
         OV.polygon_union_num_points),
    ):
        la = pd.read_parquet(f"{fix}/{layers[0]}.parquet")
        lb = pd.read_parquet(f"{fix}/{layers[1]}.parquet")
        exp = pd.read_parquet(f"{fix}/{expf}.parquet")
        ga = {r.poly_id: W.from_wkb(r.geom_wkb)[0][1] for r in la.itertuples()}
        gb = {r.poly_id: W.from_wkb(r.geom_wkb)[0][1] for r in lb.itertuples()}
        for r in exp.sample(n=min(150, len(exp)), random_state=5).itertuples():
            assert fn(ga[r.a_id], gb[r.b_id]) == r.expected, (r.a_id, r.b_id)


def test_rect_pair_core_semantics():
    """The vectorized rect×rect refine path (predicates.refine_pairs_core)
    implements GEOS 5/2/1/0 for intersection and the 13-2c closed form
    for generic union — checked against the per-pair kernels."""
    from workstealing_spatial_join_spark.functions import wkt as W
    from workstealing_spatial_join_spark.functions.predicates import (
        refine_pairs_core,
    )

    def rect_wkb(x0, y0, x1, y1):
        return W.to_wkb(
            W.POLYGON, [closed([(x0, y0), (x1, y0), (x1, y1), (x0, y1)])]
        )

    a = rect_wkb(0, 0, 2, 2)
    cases = [
        (rect_wkb(1, 1, 3, 3), 5),   # area overlap
        (rect_wkb(2, 0.5, 3, 1.5), 2),  # edge touch
        (rect_wkb(2, 2, 3, 3), 1),   # corner touch
        (rect_wkb(3, 3, 4, 4), 0),   # disjoint
        (rect_wkb(0.5, 0.5, 1.5, 1.5), 5),  # contained
    ]
    codes = np.arange(len(cases))
    uniques_b = [c[0] for c in cases]
    got = refine_pairs_core(
        np.zeros(len(cases), dtype=np.int64), [a], codes, uniques_b,
        "intersection_numpoints",
    )
    assert got.tolist() == [c[1] for c in cases]

    # generic-position random rect unions: vectorized formula vs the
    # independent convex boundary-counting kernel
    rng = np.random.default_rng(21)
    ua, ub, exp = [], [], []
    while len(ua) < 40:
        x0, y0 = rng.uniform(0, 3, 2)
        w1, h1 = rng.uniform(0.5, 3, 2)
        x2, y2 = rng.uniform(0, 3, 2)
        w2, h2 = rng.uniform(0.5, 3, 2)
        ra = (x0, y0, x0 + w1, y0 + h1)
        rb = (x2, y2, x2 + w2, y2 + h2)
        wov = min(ra[2], rb[2]) - max(ra[0], rb[0])
        hov = min(ra[3], rb[3]) - max(ra[1], rb[1])
        if wov <= 0 or hov <= 0:
            continue
        ua.append(rect_wkb(*ra))
        ub.append(rect_wkb(*rb))
        ka = closed([(ra[0], ra[1]), (ra[2], ra[1]), (ra[2], ra[3]), (ra[0], ra[3])])
        kb = closed([(rb[0], rb[1]), (rb[2], rb[1]), (rb[2], rb[3]), (rb[0], rb[3])])
        exp.append(G.union_num_points_convex([ka], [kb]))
    got = refine_pairs_core(
        np.arange(40), ua, np.arange(40), ub, "union_numpoints"
    )
    assert got.tolist() == exp
