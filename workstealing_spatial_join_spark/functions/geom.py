"""Exact geometry predicate kernels — pure NumPy, vectorized per Arrow
batch. These re-create the reference's GEOS refinement phase
(src/thread_util.cpp:412-455: ST_INTERSECTS via prepared geometry,
ST_INTERSECTION via intersection().getNumPoints(), ST_UNION via
Union().getNumPoints()) without GEOS, which is not available in this
environment.

Boundary semantics are CLOSED everywhere (a point on the boundary is
contained; touching geometries intersect), matching GEOS `intersects`.

Kernel shapes:
* many points × one polygon  → ``contains_xy`` (vectorized over points;
  the "prepared geometry" rebirth: decode + edge tables built once per
  unique polygon per batch, cf. src/spatial_join.cpp:98-99)
* one geometry × one geometry → ``intersects`` / ``clip_convex`` /
  ``union_num_points_convex`` (vectorized over edge pairs)
"""

from __future__ import annotations

import numpy as np

from workstealing_spatial_join_spark.functions.wkt import (
    LINESTRING,
    POINT,
    POLYGON,
)

_EPS = 0.0  # exact float comparisons; fixtures avoid degenerate inputs


# ------------------------------------------------------- point in poly


def ring_contains_xy(ring: np.ndarray, xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """Closed point-in-ring: crossing-number test (strict interior)
    OR'd with an exact on-boundary test. Vectorized over points; loops
    over the ring's edges (rings are small — fixtures use 6-24
    vertices, cf. FIXTURES.md §2)."""
    x0, y0 = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    inside = np.zeros(len(xs), dtype=bool)
    boundary = np.zeros(len(xs), dtype=bool)
    for i in range(len(x0)):
        ax, ay, bx, by = x0[i], y0[i], x1[i], y1[i]
        # crossing test, half-open vertex rule
        cond = (ay > ys) != (by > ys)
        if cond.any():
            xcross = (bx - ax) * (ys - ay) / (by - ay) + ax
            inside ^= cond & (xs < xcross)
        # on-segment test: collinear and within bbox
        cross = (bx - ax) * (ys - ay) - (by - ay) * (xs - ax)
        on = (
            (cross == 0)
            & (xs >= min(ax, bx))
            & (xs <= max(ax, bx))
            & (ys >= min(ay, by))
            & (ys <= max(ay, by))
        )
        boundary |= on
    return inside | boundary


def polygon_contains_xy(
    rings: list[np.ndarray], xs: np.ndarray, ys: np.ndarray
) -> np.ndarray:
    """Point in polygon with holes: in exterior and not strictly inside
    any hole (on a hole boundary still counts as contained)."""
    res = ring_contains_xy(rings[0], xs, ys)
    for hole in rings[1:]:
        x0, y0 = hole[:-1, 0], hole[:-1, 1]
        x1, y1 = hole[1:, 0], hole[1:, 1]
        strict_in = np.zeros(len(xs), dtype=bool)
        on_b = np.zeros(len(xs), dtype=bool)
        for i in range(len(x0)):
            ax, ay, bx, by = x0[i], y0[i], x1[i], y1[i]
            cond = (ay > ys) != (by > ys)
            if cond.any():
                xcross = (bx - ax) * (ys - ay) / (by - ay) + ax
                strict_in ^= cond & (xs < xcross)
            cross = (bx - ax) * (ys - ay) - (by - ay) * (xs - ax)
            on_b |= (
                (cross == 0)
                & (xs >= min(ax, bx))
                & (xs <= max(ax, bx))
                & (ys >= min(ay, by))
                & (ys <= max(ay, by))
            )
        res &= ~(strict_in & ~on_b)
    return res


def contains_xy_pairs_bucketed(
    ring_tensor: np.ndarray, xs: np.ndarray, ys: np.ndarray
) -> np.ndarray:
    """Closed point-in-ring for PAIRED inputs: ``ring_tensor`` is
    (m, nv, 2) — one ring per point — and xs/ys are (m,). Fully
    vectorized over both pairs and edges: zero Python per-row work.
    Callers bucket rings by vertex count to build the tensor
    (functions/predicates.py)."""
    x0 = ring_tensor[:, :-1, 0]
    y0 = ring_tensor[:, :-1, 1]
    x1 = ring_tensor[:, 1:, 0]
    y1 = ring_tensor[:, 1:, 1]
    px = xs[:, None]
    py = ys[:, None]
    cond = (y0 > py) != (y1 > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xcross = (x1 - x0) * (py - y0) / (y1 - y0) + x0
    inside = (cond & (px < xcross)).sum(axis=1) % 2 == 1
    cross = (x1 - x0) * (py - y0) - (y1 - y0) * (px - x0)
    on_edge = (
        (cross == 0)
        & (px >= np.minimum(x0, x1))
        & (px <= np.maximum(x0, x1))
        & (py >= np.minimum(y0, y1))
        & (py <= np.maximum(y0, y1))
    ).any(axis=1)
    return inside | on_edge


# ------------------------------------------------- segment intersection


def _edges(path: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    return path[:-1], path[1:]


def segments_intersect_any(pa: np.ndarray, pb: np.ndarray) -> bool:
    """True if any edge of path A touches/crosses any edge of path B.
    Vectorized over the (nA × nB) edge-pair grid (closed semantics:
    touching endpoints count)."""
    a0, a1 = _edges(pa)
    b0, b1 = _edges(pb)
    # orientation of (p,q,r): sign of cross(q-p, r-p)
    A0 = a0[:, None, :]
    A1 = a1[:, None, :]
    B0 = b0[None, :, :]
    B1 = b1[None, :, :]

    def orient(p, q, r):
        return np.sign(
            (q[..., 0] - p[..., 0]) * (r[..., 1] - p[..., 1])
            - (q[..., 1] - p[..., 1]) * (r[..., 0] - p[..., 0])
        )

    d1 = orient(A0, A1, B0)
    d2 = orient(A0, A1, B1)
    d3 = orient(B0, B1, A0)
    d4 = orient(B0, B1, A1)
    proper = (d1 != d2) & (d3 != d4)

    def on_seg(p, q, r):
        # r collinear with p-q and within bbox
        return (
            (r[..., 0] >= np.minimum(p[..., 0], q[..., 0]))
            & (r[..., 0] <= np.maximum(p[..., 0], q[..., 0]))
            & (r[..., 1] >= np.minimum(p[..., 1], q[..., 1]))
            & (r[..., 1] <= np.maximum(p[..., 1], q[..., 1]))
        )

    touch = (
        ((d1 == 0) & on_seg(A0, A1, B0))
        | ((d2 == 0) & on_seg(A0, A1, B1))
        | ((d3 == 0) & on_seg(B0, B1, A0))
        | ((d4 == 0) & on_seg(B0, B1, A1))
    )
    return bool((proper | touch).any())


def intersects_pairs_bucketed(
    ta: np.ndarray, tb: np.ndarray, chunk: int = 2048
) -> np.ndarray:
    """Closed polygon-intersects for PAIRED single-ring inputs:
    ``ta`` (m, nva, 2) vs ``tb`` (m, nvb, 2). Vectorized edge-pair
    orientation grid + first-vertex containment both ways; processed
    in chunks to bound the (m, nva-1, nvb-1) temporaries."""
    m = len(ta)
    out = np.zeros(m, dtype=bool)
    for s in range(0, m, chunk):
        e = min(s + chunk, m)
        A, B = ta[s:e], tb[s:e]
        a0 = A[:, :-1, None, :]
        a1 = A[:, 1:, None, :]
        b0 = B[:, None, :-1, :]
        b1 = B[:, None, 1:, :]

        def orient(p, q, r):
            return np.sign(
                (q[..., 0] - p[..., 0]) * (r[..., 1] - p[..., 1])
                - (q[..., 1] - p[..., 1]) * (r[..., 0] - p[..., 0])
            )

        d1 = orient(a0, a1, b0)
        d2 = orient(a0, a1, b1)
        d3 = orient(b0, b1, a0)
        d4 = orient(b0, b1, a1)
        hit = (d1 != d2) & (d3 != d4)

        def on_seg(p, q, r):
            return (
                (r[..., 0] >= np.minimum(p[..., 0], q[..., 0]))
                & (r[..., 0] <= np.maximum(p[..., 0], q[..., 0]))
                & (r[..., 1] >= np.minimum(p[..., 1], q[..., 1]))
                & (r[..., 1] <= np.maximum(p[..., 1], q[..., 1]))
            )

        hit |= (d1 == 0) & on_seg(a0, a1, b0)
        hit |= (d2 == 0) & on_seg(a0, a1, b1)
        hit |= (d3 == 0) & on_seg(b0, b1, a0)
        hit |= (d4 == 0) & on_seg(b0, b1, a1)
        edge_hit = hit.any(axis=(1, 2))
        res = edge_hit
        # no boundary contact → either disjoint or one fully inside:
        # first-vertex containment decides
        need = ~edge_hit
        if need.any():
            res = res.copy()
            res[need] = contains_xy_pairs_bucketed(
                B[need], A[need][:, 0, 0], A[need][:, 0, 1]
            ) | contains_xy_pairs_bucketed(
                A[need], B[need][:, 0, 0], B[need][:, 0, 1]
            )
        out[s:e] = res
    return out


# ------------------------------------------------------- intersects


def intersects(ga: tuple[int, list[np.ndarray]], gb: tuple[int, list[np.ndarray]]) -> bool:
    """Exact `ST_Intersects` between two simple geometries (closed
    semantics) — the refine kernel of J2 (src/spatial_join.cpp:94-118).
    MBR pre-filtering is the caller's job (filter phase)."""
    ta, ra = ga
    tb, rb = gb
    if ta > tb:  # normalize: point ≤ line ≤ polygon
        return intersects(gb, ga)
    if ta == POINT:
        x, y = ra[0][0]
        if tb == POINT:
            return bool(x == rb[0][0, 0] and y == rb[0][0, 1])
        if tb == LINESTRING:
            return bool(
                _point_on_path(rb[0], np.array([x]), np.array([y]))[0]
            )
        return bool(polygon_contains_xy(rb, np.array([x]), np.array([y]))[0])
    if ta == LINESTRING:
        if tb == LINESTRING:
            return segments_intersect_any(ra[0], rb[0])
        # line × polygon: any vertex inside, or any edge crossing the shell
        vs = ra[0]
        if polygon_contains_xy(rb, vs[:, 0], vs[:, 1]).any():
            return True
        return any(segments_intersect_any(ra[0], ring) for ring in rb)
    # polygon × polygon: edge crossing, or vertex containment either way
    for ring_a in ra:
        for ring_b in rb:
            if segments_intersect_any(ring_a, ring_b):
                return True
    va = ra[0]
    if polygon_contains_xy(rb, va[:, 0], va[:, 1]).any():
        return True
    vb = rb[0]
    return bool(polygon_contains_xy(ra, vb[:, 0], vb[:, 1]).any())


def _point_on_path(path: np.ndarray, xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    p0, p1 = _edges(path)
    res = np.zeros(len(xs), dtype=bool)
    for i in range(len(p0)):
        ax, ay = p0[i]
        bx, by = p1[i]
        cross = (bx - ax) * (ys - ay) - (by - ay) * (xs - ax)
        res |= (
            (cross == 0)
            & (xs >= min(ax, bx))
            & (xs <= max(ax, bx))
            & (ys >= min(ay, by))
            & (ys <= max(ay, by))
        )
    return res


# ------------------------------------------------------------ validity


def ring_is_simple(ring: np.ndarray) -> bool:
    """No self-intersection: no two NON-ADJACENT edges of the closed
    ring touch or cross (adjacent edges share an endpoint by
    construction). Vectorized over the edge-pair grid."""
    p = ring[:-1]
    n = len(p)
    if n < 3:
        return False
    a0 = p
    a1 = np.roll(p, -1, axis=0)
    # zero-length edges (repeated consecutive vertices) are invalid —
    # the adjacency mask below would otherwise hide them
    if ((a0 == a1).all(axis=1)).any():
        return False
    # degenerate flat rings (zero signed area) and spikes — adjacent
    # collinear edges that double back — are self-overlapping, but the
    # adjacency mask below exempts adjacent pairs from the grid test
    if _ring_area2(p) == 0.0:
        return False
    a2 = np.roll(p, -2, axis=0)
    e1 = a1 - a0
    e2 = a2 - a1
    cross12 = e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0]
    dot12 = e1[:, 0] * e2[:, 0] + e1[:, 1] * e2[:, 1]
    if ((cross12 == 0) & (dot12 < 0)).any():
        return False
    A0 = a0[:, None, :]
    A1 = a1[:, None, :]
    B0 = a0[None, :, :]
    B1 = a1[None, :, :]

    def orient(q, r, s):
        return np.sign(
            (r[..., 0] - q[..., 0]) * (s[..., 1] - q[..., 1])
            - (r[..., 1] - q[..., 1]) * (s[..., 0] - q[..., 0])
        )

    d1 = orient(A0, A1, B0)
    d2 = orient(A0, A1, B1)
    d3 = orient(B0, B1, A0)
    d4 = orient(B0, B1, A1)
    proper = (d1 != d2) & (d3 != d4)

    def on_seg(q, r, s):
        return (
            (s[..., 0] >= np.minimum(q[..., 0], r[..., 0]))
            & (s[..., 0] <= np.maximum(q[..., 0], r[..., 0]))
            & (s[..., 1] >= np.minimum(q[..., 1], r[..., 1]))
            & (s[..., 1] <= np.maximum(q[..., 1], r[..., 1]))
        )

    touch = (
        ((d1 == 0) & on_seg(A0, A1, B0))
        | ((d2 == 0) & on_seg(A0, A1, B1))
        | ((d3 == 0) & on_seg(B0, B1, A0))
        | ((d4 == 0) & on_seg(B0, B1, A1))
    )
    hit = proper | touch
    i = np.arange(n)
    adjacent = (
        (np.abs(i[:, None] - i[None, :]) <= 1)
        | (np.abs(i[:, None] - i[None, :]) == n - 1)
    )
    return not bool((hit & ~adjacent).any())


def _proper_cross_any(pa: np.ndarray, pb: np.ndarray) -> bool:
    """Any PROPER crossing between edges of two closed rings (strict
    transversal intersections only — shared vertices/touches allowed,
    as OGC permits a hole to touch its shell at points)."""
    a0, a1 = _edges(pa)
    b0, b1 = _edges(pb)
    A0 = a0[:, None, :]
    A1 = a1[:, None, :]
    B0 = b0[None, :, :]
    B1 = b1[None, :, :]

    def orient(p, q, r):
        return np.sign(
            (q[..., 0] - p[..., 0]) * (r[..., 1] - p[..., 1])
            - (q[..., 1] - p[..., 1]) * (r[..., 0] - p[..., 0])
        )

    d1 = orient(A0, A1, B0)
    d2 = orient(A0, A1, B1)
    d3 = orient(B0, B1, A0)
    d4 = orient(B0, B1, A1)
    proper = (d1 != d2) & (d3 != d4) & (d1 != 0) & (d2 != 0) & (d3 != 0) & (d4 != 0)
    return bool(proper.any())


def _strictly_inside_any(outer: np.ndarray, pts: np.ndarray) -> bool:
    """True iff ANY of ``pts`` lies STRICTLY inside closed ring
    ``outer`` (on-boundary points don't count — OGC allows holes and
    shells to touch at points)."""
    inside = ring_contains_xy(outer, pts[:, 0], pts[:, 1])
    if not inside.any():
        return False
    on = _point_on_path(outer, pts[:, 0], pts[:, 1])
    return bool((inside & ~on).any())


def _edge_midpoints(r: np.ndarray) -> np.ndarray:
    """Midpoint of every edge of a CLOSED ring — representative
    boundary-interior points for containment probes (a nested ring
    whose VERTICES all sit on the other ring's boundary still has some
    edge midpoint strictly inside it, unless the rings are identical —
    which ``_rings_identical`` rejects separately)."""
    return (r[:-1] + r[1:]) / 2.0


def _rings_identical(a: np.ndarray, b: np.ndarray) -> bool:
    """Same CLOSED ring as a point cycle — rotation- and direction-
    insensitive (GEOS DuplicateRings). Cheap set/size screens first;
    the cyclic-sequence compare only runs on screen-passing pairs."""
    pa, pb = a[:-1], b[:-1]
    if len(pa) != len(pb):
        return False
    ta = [tuple(p) for p in pa]
    tb = [tuple(p) for p in pb]
    if set(ta) != set(tb):
        return False
    m = min(ta)
    ai = ta.index(m)
    target = ta[ai:] + ta[:ai]
    for seq in (tb, tb[::-1]):
        for s in (k for k, v in enumerate(seq) if v == m):
            if seq[s:] + seq[:s] == target:
                return True
    return False


def is_valid_geom(gtype: int, rings: list[np.ndarray]) -> bool:
    """Structural + topological validity (the F6 upgrade — the
    reference only drops parse failures, src/reader.cpp:36-40):
    finite coordinates everywhere; polygons additionally need every
    ring closed with ≥4 points, simple (no self-intersection, no
    zero-length edges), each hole fully inside the shell (every hole
    vertex contained AND no edge properly crossing the shell — an
    anchor-vertex-only test would accept straddling holes), and the
    holes pairwise INTERIOR-DISJOINT: no hole nested inside or
    properly crossing another (GEOS IsValid's HoleOutsideShell /
    NestedHoles checks; point touches between rings remain legal —
    VERDICT r3 #8), no two rings identical (GEOS DuplicateRings), and
    nesting is probed with edge MIDPOINTS as well as vertices so a
    hole inscribed in another with all its vertices ON the other's
    boundary is still caught (ADVICE r4). Ring orientation is NOT a
    validity condition (OGC/GEOS accept either winding; the kernels
    normalize it)."""
    for r in rings:
        if not np.isfinite(r).all():
            return False
    if gtype == POINT:
        return rings[0].shape == (1, 2)
    if gtype == LINESTRING:
        return len(rings[0]) >= 2
    for r in rings:
        if len(r) < 4:
            return False
        if r[0][0] != r[-1][0] or r[0][1] != r[-1][1]:
            return False
        if not ring_is_simple(r):
            return False
    # no two rings identical (GEOS DuplicateRings — covers duplicate
    # holes AND a hole equal to the shell)
    for i in range(len(rings)):
        for j in range(i + 1, len(rings)):
            if _rings_identical(rings[i], rings[j]):
                return False
    shell = rings[0]
    holes = rings[1:]
    for hole in holes:
        if not ring_contains_xy(
            shell, hole[:-1, 0], hole[:-1, 1]
        ).all():
            return False
        if _proper_cross_any(hole, shell):
            return False
    # pairwise hole disjointness: a hole nested in (or properly
    # crossing) another hole makes the interior non-connected /
    # ill-defined; vertex touches are allowed. Probe BOTH vertices
    # and edge midpoints: a hole inscribed in another with every
    # vertex on the containing hole's boundary has no strictly-inside
    # vertex, but any non-shared edge's midpoint is strictly inside.
    for i in range(len(holes)):
        for j in range(i + 1, len(holes)):
            hi, hj = holes[i], holes[j]
            if _proper_cross_any(hi, hj):
                return False
            probe_i = np.vstack([hi[:-1], _edge_midpoints(hi)])
            probe_j = np.vstack([hj[:-1], _edge_midpoints(hj)])
            if _strictly_inside_any(hi, probe_j) or _strictly_inside_any(
                hj, probe_i
            ):
                return False
    return True


# ---------------------------------------------- convex clip (ST_Intersection)


def clip_convex_raw(subject: np.ndarray, clipper: np.ndarray) -> np.ndarray:
    """Sutherland–Hodgman with CLOSED half-planes: clip `subject` ring
    by CONVEX `clipper` ring. Returns the raw clipped vertex chain as
    an OPEN (n,2) array — possibly degenerate (a point or a collinear
    sliver when the polygons only touch), possibly with repeated
    vertices; ``classify_clip_num_points`` maps it to GEOS
    getNumPoints semantics. Both input rings must be closed."""
    # ensure clipper is counter-clockwise
    c = clipper[:-1]
    area2 = np.sum(c[:, 0] * np.roll(c[:, 1], -1) - np.roll(c[:, 0], -1) * c[:, 1])
    if area2 < 0:
        clipper = clipper[::-1]
    out = subject[:-1].tolist()
    c0, c1 = _edges(clipper)
    for i in range(len(c0)):
        if not out:
            break
        ax, ay = c0[i]
        bx, by = c1[i]
        inp = out
        out = []
        n = len(inp)
        for j in range(n):
            px, py = inp[j]
            qx, qy = inp[(j + 1) % n]
            dp = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
            dq = (bx - ax) * (qy - ay) - (by - ay) * (qx - ax)
            if dp >= 0:
                out.append([px, py])
            if (dp >= 0) != (dq >= 0) and dp != dq:
                t = dp / (dp - dq)
                out.append([px + t * (qx - px), py + t * (qy - py)])
    if not out:
        return np.empty((0, 2), dtype=np.float64)
    return np.asarray(out, dtype=np.float64)


def clip_convex(subject: np.ndarray, clipper: np.ndarray) -> np.ndarray:
    """Area-overlap convenience wrapper over ``clip_convex_raw``:
    returns the clipped ring (closed, (n,2)) when the intersection has
    positive area, else an empty array (degenerate touches collapse to
    empty here — use the raw variant + classifier for GEOS-parity
    point counts)."""
    pts = _dedupe_chain(clip_convex_raw(subject, clipper))
    if len(pts) < 3 or _ring_area2(pts) == 0.0:
        return np.empty((0, 2), dtype=np.float64)
    return np.vstack([pts, pts[:1]])


def _dedupe_chain(pts: np.ndarray) -> np.ndarray:
    """Order-preserving removal of repeated vertices (consecutive and
    global) from an open vertex chain."""
    if len(pts) == 0:
        return pts
    seen: set[tuple[float, float]] = set()
    keep = []
    for p in pts:
        key = (float(p[0]), float(p[1]))
        if key not in seen:
            seen.add(key)
            keep.append(p)
    return np.asarray(keep, dtype=np.float64)


def _ring_area2(pts: np.ndarray) -> float:
    """Twice the signed area of an open vertex chain."""
    x, y = pts[:, 0], pts[:, 1]
    return float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def area_centroid_scaled(
    parts: list, scale: int = 1000
) -> tuple[int, int, int]:
    """Integer-exact shoelace area + centroid numerators for a parsed
    geometry (list of ``(gtype, rings)`` parts; only POLYGON parts
    contribute). Coordinates are snapped to the ``1/scale`` lattice
    (fixture layers are 3-decimal, so ``np.rint(x*1000)`` recovers
    the exact integer) and everything downstream is int64 — the sums
    are order-independent and bit-reproducible in any engine, no
    float-summation bridge needed.

    Returns ``(area2, cnx, cny)`` where area2 = 2·area in
    ``scale^-2`` units (outer rings minus holes, orientation-
    normalized so stored ring winding doesn't matter), and the
    centroid is ``(cnx / (3·area2·scale), cny / (3·area2·scale))``
    in original units.
    """
    a2 = 0
    cnx = 0
    cny = 0
    for gtype, rings in parts:
        if gtype != POLYGON:
            continue
        for ri, r in enumerate(rings):
            pts = np.rint(np.asarray(r, dtype=np.float64) * scale).astype(
                np.int64
            )
            if len(pts) >= 2 and bool((pts[0] == pts[-1]).all()):
                pts = pts[:-1]
            if len(pts) < 3:
                continue
            x, y = pts[:, 0], pts[:, 1]
            x2, y2 = np.roll(x, -1), np.roll(y, -1)
            cross = x * y2 - x2 * y
            s = int(cross.sum())
            cx = int(((x + x2) * cross).sum())
            cy = int(((y + y2) * cross).sum())
            if ri == 0:
                f = 1 if s >= 0 else -1
            else:
                f = -1 if s >= 0 else 1
            a2 += f * s
            cnx += f * cx
            cny += f * cy
    return a2, cnx, cny


def classify_clip_num_points(pts: np.ndarray) -> int:
    """Map a raw clipped chain to GEOS ``intersection().getNumPoints()``
    semantics (src/thread_util.cpp:424-425 consumes exactly this):

    * empty chain → 0 (disjoint)
    * one unique point → 1 (corner touch → POINT)
    * two unique points, or ≥3 collinear (zero area) → 2 (edge touch →
      LINESTRING of the two extreme points)
    * else → polygon: unique vertices + 1 repeated closing vertex
    """
    pts = _dedupe_chain(pts)
    n = len(pts)
    if n == 0:
        return 0
    if n == 1:
        return 1
    if n == 2 or _ring_area2(pts) == 0.0:
        return 2
    return n + 1


def intersection_num_points(ra: list[np.ndarray], rb: list[np.ndarray]) -> int:
    """numPoints of the pairwise intersection (reference sums this per
    pair, src/thread_util.cpp:424-425), including degenerate touches
    (corner touch → 1, edge touch → 2 — GEOS returns POINT/LINESTRING
    there, not an empty polygon). Closed-ring counts include the
    repeated closing vertex, matching GEOS getNumPoints."""
    return classify_clip_num_points(clip_convex_raw(ra[0], rb[0]))


def union_num_points_convex(ra: list[np.ndarray], rb: list[np.ndarray]) -> int:
    """numPoints of the union of two CONVEX polygons (ST_UNION mode,
    src/thread_util.cpp:435-441): vertices of A outside B + vertices of
    B outside A + boundary crossing points + closing vertex."""
    a, b = ra[0], rb[0]
    va = a[:-1]
    vb = b[:-1]
    a_out = ~polygon_contains_xy(rb, va[:, 0], va[:, 1])
    b_out = ~polygon_contains_xy(ra, vb[:, 0], vb[:, 1])
    if a_out.all() and b_out.all() and not segments_intersect_any(a, b):
        # disjoint → multipolygon: all vertices (incl. both closings)
        return int(len(a) + len(b))
    crossings = _crossing_points(a, b)
    n_boundary = int(a_out.sum() + b_out.sum() + len(crossings))
    return n_boundary + 1 if n_boundary else int(min(len(a), len(b)))


def _crossing_points(pa: np.ndarray, pb: np.ndarray) -> np.ndarray:
    """Proper crossing points between two closed rings (unique)."""
    a0, a1 = _edges(pa)
    b0, b1 = _edges(pb)
    pts = []
    for i in range(len(a0)):
        ax, ay = a0[i]
        bx, by = a1[i]
        rx, ry = bx - ax, by - ay
        for j in range(len(b0)):
            cx, cy = b0[j]
            dx, dy = b1[j]
            sx, sy = dx - cx, dy - cy
            denom = rx * sy - ry * sx
            if denom == 0:
                continue
            t = ((cx - ax) * sy - (cy - ay) * sx) / denom
            u = ((cx - ax) * ry - (cy - ay) * rx) / denom
            if 0 <= t <= 1 and 0 <= u <= 1:
                pts.append((ax + t * rx, ay + t * ry))
    if not pts:
        return np.empty((0, 2))
    return np.unique(np.asarray(pts), axis=0)


# ------------------------------------------- simplify / convex hull


def simplify_dp(chain: np.ndarray, eps: float) -> np.ndarray:
    """Douglas-Peucker polyline simplification (iterative stack — no
    recursion depth limit). ``chain`` is an (n,2) open or closed
    vertex chain; returns the kept vertices in order (endpoints always
    kept). The point-to-segment distance over each span is vectorized
    NumPy; the stack loop runs once per KEPT split point, so the
    Python overhead is O(output), not O(n²)."""
    n = len(chain)
    if n <= 2:
        return chain.copy()
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    eps2 = eps * eps
    while stack:
        i, j = stack.pop()
        if j - i < 2:
            continue
        seg = chain[i:j + 1]
        a, b = seg[0], seg[-1]
        d = b - a
        ll = float(d @ d)
        rel = seg[1:-1] - a
        if ll == 0.0:
            dist2 = (rel * rel).sum(axis=1)
        else:
            # squared perpendicular distance via the cross product
            cr = rel[:, 0] * d[1] - rel[:, 1] * d[0]
            dist2 = cr * cr / ll
        kmax = int(np.argmax(dist2))
        if dist2[kmax] > eps2:
            split = i + 1 + kmax
            keep[split] = True
            stack.append((i, split))
            stack.append((split, j))
    return chain[keep]


def simplify_geom(
    gtype: int, rings: list[np.ndarray], eps: float
) -> tuple[int, list[np.ndarray]]:
    """Simplify a parsed geometry. Polygon rings are simplified as
    closed chains (first==last preserved); a ring collapsing below 4
    points (triangle + closure) keeps its original vertices —
    simplification never invalidates a ring here, matching the
    conservative side of GEOS TopologyPreservingSimplifier (which the
    reference's GEOS build exposes but the reference never calls).
    Points pass through."""
    if gtype == POINT:
        return gtype, [r.copy() for r in rings]
    out = []
    for r in rings:
        s = simplify_dp(r, eps)
        if gtype == POLYGON and len(s) < 4:
            s = r.copy()
        out.append(s)
    return gtype, out


def convex_hull(pts: np.ndarray) -> np.ndarray:
    """Convex hull via Andrew's monotone chain, CCW, first point NOT
    repeated. O(n log n) in the lexsort; the chain construction is the
    classic per-point loop (hull sizes are small). Collinear points on
    the hull boundary are dropped (strict turns only)."""
    p = np.unique(pts, axis=0)  # lexsorted unique
    if len(p) <= 2:
        return p

    def half(points):
        h = []
        for q in points:
            while len(h) >= 2:
                o, a = h[-2], h[-1]
                if (a[0] - o[0]) * (q[1] - o[1]) - (a[1] - o[1]) * (
                    q[0] - o[0]
                ) <= 0:
                    h.pop()
                else:
                    break
            h.append(q)
        return h

    lower = half(p)
    upper = half(p[::-1])
    return np.asarray(lower[:-1] + upper[:-1])
