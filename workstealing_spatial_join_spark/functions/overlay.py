"""General polygon overlay — intersection and union of simple
(possibly CONCAVE) polygons, pure NumPy + Python, no GEOS.

This closes the round-1 gap vs the reference, whose refine phase runs
GEOS ``intersection()->getNumPoints()`` / ``Union()->getNumPoints()``
on arbitrary geometry (src/thread_util.cpp:424-441) — its real
datasets (lakes, parks, cemeteries; job_script_for_HPC:29-32) are
overwhelmingly concave.

Algorithm: Greiner–Hormann clipping (Greiner & Hormann, "Efficient
clipping of arbitrary polygons", ACM TOG 17(2), 1998 — public
literature). Both rings get their proper boundary crossings inserted
as linked twin nodes; crossings are marked entry/exit by alternation;
result rings are traced by walking forward from entries / backward
from exits and jumping between twins. Intersection and union differ
only by inverting the initial entry flags.

Scope and honesty:
* GENERAL POSITION is required: proper crossings only — no
  vertex-on-edge, no collinear overlapping edges, no shared vertices.
  Degenerate configurations raise ``DegenerateGeometry``; callers
  fall back to the convex Sutherland–Hodgman kernel (which handles
  convex touches exactly) or to 0 with the reference's
  exception-swallowing parity (src/thread_util.cpp:427-429).
* HOLES are supported for intersection when each hole is strictly
  inside or strictly outside the other polygon's relevant rings
  (hole boundaries crossing the result boundary raise). Union
  supports hole-free inputs.
* Crossing detection is vectorized (edge-grid NumPy); node linking
  and tracing are per-pair Python — this kernel runs only on the
  non-rectangle tail of refine batches (functions/predicates.py
  routes rect×rect pairs to closed-form bounds math first).

Verification: tests/test_overlay.py checks GH against the independent
convex SH clipper on random convex pairs, and against exact
Fraction-arithmetic expected counts on the concave fixture
(scripts/gen_concave_fixture.py — a structurally different
exact-arithmetic implementation).
"""

from __future__ import annotations

import numpy as np

from workstealing_spatial_join_spark.functions import geom as G


class DegenerateGeometry(Exception):
    """Input pair is not in general position (touching boundaries,
    collinear edges, vertex-on-edge): the float GH tracer cannot
    classify it reliably."""


def _open(ring: np.ndarray) -> np.ndarray:
    """Drop the repeated closing vertex if present."""
    if len(ring) > 1 and ring[0][0] == ring[-1][0] and ring[0][1] == ring[-1][1]:
        return ring[:-1]
    return ring


def _area2(pts: np.ndarray) -> float:
    x, y = pts[:, 0], pts[:, 1]
    return float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def _ccw(pts: np.ndarray) -> np.ndarray:
    return pts if _area2(pts) >= 0 else pts[::-1]


def is_convex(ring: np.ndarray) -> bool:
    """Convexity of a closed or open ring (collinear vertices allowed)."""
    p = _open(np.asarray(ring, dtype=np.float64))
    a = p
    b = np.roll(p, -1, axis=0)
    c = np.roll(p, -2, axis=0)
    cross = (b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1]) - (
        b[:, 1] - a[:, 1]
    ) * (c[:, 0] - a[:, 0])
    return bool((cross >= 0).all() or (cross <= 0).all())


def _point_in(ring_open: np.ndarray, x: float, y: float) -> bool:
    """Strict-interior test is what GH marking needs; general position
    guarantees the probe never sits on the boundary, so the closed
    ray-cast kernel is equivalent."""
    closed = np.vstack([ring_open, ring_open[:1]])
    return bool(
        G.ring_contains_xy(closed, np.array([x]), np.array([y]))[0]
    )


_DENSE_PAIR_LIMIT = 4096  # below this the dense grid is cheaper


def edge_bbox_candidates(
    a0: np.ndarray, a1: np.ndarray, b0: np.ndarray, b1: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Indices (i, j) of a-edge × b-edge pairs whose bounding boxes
    overlap. Memory is O(#candidates), never O(Ea×Eb): edges are
    binned into a 2-D grid over the layers' common bbox; only pairs
    sharing a grid cell are tested, with the exact y/x overlap filter
    applied per cell in bounded chunks. The round-3 review found the
    1-D x-strip version degenerate on comb-shaped rings (edges that
    span the shared x-extent met in EVERY strip: O(strips·Ea·Eb)
    candidate memory); 2-D binning makes axis-spanning edges meet only
    where their other axis also overlaps, and the per-cell chunking
    caps peak memory regardless of input shape."""
    na, nb = len(a0), len(b0)
    if na * nb <= _DENSE_PAIR_LIMIT:
        ii, jj = np.meshgrid(np.arange(na), np.arange(nb), indexing="ij")
        ii, jj = ii.ravel(), jj.ravel()
    else:
        aminx = np.minimum(a0[:, 0], a1[:, 0])
        amaxx = np.maximum(a0[:, 0], a1[:, 0])
        bminx = np.minimum(b0[:, 0], b1[:, 0])
        bmaxx = np.maximum(b0[:, 0], b1[:, 0])
        aminy = np.minimum(a0[:, 1], a1[:, 1])
        amaxy = np.maximum(a0[:, 1], a1[:, 1])
        bminy = np.minimum(b0[:, 1], b1[:, 1])
        bmaxy = np.maximum(b0[:, 1], b1[:, 1])
        lox = max(aminx.min(), bminx.min())
        hix = min(amaxx.max(), bmaxx.max())
        loy = max(aminy.min(), bminy.min())
        hiy = min(amaxy.max(), bmaxy.max())
        if hix < lox or hiy < loy:
            z = np.empty(0, dtype=np.int64)
            return z, z.copy()
        # per-axis bin width ≈ the typical (median positive) edge span
        # on that axis: an isotropic ns×ns grid degenerates whenever
        # cell shape mismatches edge shape (zigzag boundaries: cells
        # 75×0.16 units vs 1×1 edges → ~30 edges per cell → millions
        # of candidate pairs). A couple of axis-spanning edges (e.g. a
        # polygon's long base) landing in every bin of one axis is
        # fine — it's O(edges · bins_crossed) entries, not O(n²).
        def _axis_bins(lo_ax, hi_ax, spans):
            ext = hi_ax - lo_ax
            if ext <= 0 or not np.isfinite(ext):
                return 1, 1.0
            pos = spans[spans > 0]
            med = float(np.median(pos)) if len(pos) else ext / 64.0
            w = max(2.0 * med, ext / 4096.0)
            if w <= 0 or not np.isfinite(w):
                return 1, ext
            n = int(np.clip(np.ceil(ext / w), 1, 4096))
            return n, ext / n

        nsx, wx = _axis_bins(
            lox, hix, np.concatenate([amaxx - aminx, bmaxx - bminx])
        )
        nsy, wy = _axis_bins(
            loy, hiy, np.concatenate([amaxy - aminy, bmaxy - bminy])
        )
        while nsx * nsy > (1 << 21):
            if nsx >= nsy:
                nsx = max(1, nsx // 2)
                wx *= 2
            else:
                nsy = max(1, nsy // 2)
                wy *= 2

        def cell_ranges(mnx, mxx, mny, mxy):
            keep = (mxx >= lox) & (mnx <= hix) & (mxy >= loy) & (mny <= hiy)
            sx0 = np.clip(np.floor((mnx - lox) / wx), 0, nsx - 1).astype(np.int64)
            sx1 = np.clip(np.floor((mxx - lox) / wx), 0, nsx - 1).astype(np.int64)
            sy0 = np.clip(np.floor((mny - loy) / wy), 0, nsy - 1).astype(np.int64)
            sy1 = np.clip(np.floor((mxy - loy) / wy), 0, nsy - 1).astype(np.int64)
            return sx0, sx1, sy0, sy1, keep

        def expand(sx0, sx1, sy0, sy1, keep):
            # vectorized (edge, cell) expansion: edge i contributes
            # every cell in its [sx0..sx1]×[sy0..sy1] block — no
            # per-edge Python loop
            idx = np.nonzero(keep)[0]
            if len(idx) == 0:
                z = np.empty(0, dtype=np.int64)
                return z, z.copy()
            nxs = sx1[idx] - sx0[idx] + 1
            nys = sy1[idx] - sy0[idx] + 1
            span = nxs * nys
            tot = int(span.sum())
            eidx = np.repeat(idx, span)
            local = np.arange(tot) - np.repeat(
                np.cumsum(span) - span, span
            )
            ny_rep = np.repeat(nys, span)
            cells = (
                (np.repeat(sx0[idx], span) + local // ny_rep) * nsy
                + np.repeat(sy0[idx], span) + local % ny_rep
            )
            return cells, eidx

        cella, ea = expand(*cell_ranges(aminx, amaxx, aminy, amaxy))
        cellb, eb = expand(*cell_ranges(bminx, bmaxx, bminy, bmaxy))
        ordb = np.argsort(cellb, kind="stable")
        cellb, eb = cellb[ordb], eb[ordb]
        # vectorized cell equi-join: every A (edge, cell) entry joins
        # the B entries of the same cell via one searchsorted pair;
        # chunked over A entries so peak pair memory stays bounded
        starts = np.searchsorted(cellb, cella, side="left")
        ends = np.searchsorted(cellb, cella, side="right")
        cnt = ends - starts
        chunk_cap = 1 << 22
        chunks_i, chunks_j = [], []
        n_entries = len(cella)
        # chunk boundaries from the pair-count cumsum (one searchsorted
        # per chunk — the entry-by-entry Python scan dominated runtime)
        cum = np.cumsum(cnt)
        bounds = [0]
        while bounds[-1] < n_entries:
            prev = bounds[-1]
            base = int(cum[prev - 1]) if prev else 0
            nxt = int(np.searchsorted(cum, base + chunk_cap, side="right"))
            bounds.append(min(max(nxt, prev + 1), n_entries))
        for pos, hi in zip(bounds[:-1], bounds[1:]):
            c = cnt[pos:hi]
            tot = int(c.sum())
            if tot:
                ii_c = np.repeat(ea[pos:hi], c)
                off = np.arange(tot) - np.repeat(np.cumsum(c) - c, c)
                jj_c = eb[np.repeat(starts[pos:hi], c) + off]
                # exact bbox overlap: survivors only — false positives
                # from the conservative grid never accumulate
                ov = (
                    (aminx[ii_c] <= bmaxx[jj_c])
                    & (bminx[jj_c] <= amaxx[ii_c])
                    & (aminy[ii_c] <= bmaxy[jj_c])
                    & (bminy[jj_c] <= amaxy[ii_c])
                )
                if ov.any():
                    chunks_i.append(ii_c[ov])
                    chunks_j.append(jj_c[ov])
        if not chunks_i:
            z = np.empty(0, dtype=np.int64)
            return z, z.copy()
        ii = np.concatenate(chunks_i)
        jj = np.concatenate(chunks_j)
        # dedup pairs that met in several cells
        key = ii * nb + jj
        key, first = np.unique(key, return_index=True)
        ii, jj = ii[first], jj[first]
    # exact bbox overlap filter (x needed for the dense path; the
    # strip grid is conservative on x too)
    ox = (
        np.minimum(np.maximum(a0[ii, 0], a1[ii, 0]),
                   np.maximum(b0[jj, 0], b1[jj, 0]))
        >= np.maximum(np.minimum(a0[ii, 0], a1[ii, 0]),
                      np.minimum(b0[jj, 0], b1[jj, 0]))
    )
    oy = (
        np.minimum(np.maximum(a0[ii, 1], a1[ii, 1]),
                   np.maximum(b0[jj, 1], b1[jj, 1]))
        >= np.maximum(np.minimum(a0[ii, 1], a1[ii, 1]),
                      np.minimum(b0[jj, 1], b1[jj, 1]))
    )
    keep = ox & oy
    return ii[keep], jj[keep]


def _proper_crossings(a: np.ndarray, b: np.ndarray):
    """All proper boundary crossings between open rings a and b.
    Returns (i, j, t, u, px, py) arrays: a-edge index, b-edge index,
    params strictly inside (0,1), crossing coordinates. Raises
    DegenerateGeometry on any non-proper contact. Edge pairs are
    bbox-prefiltered (strip grid) so memory stays O(#candidates)."""
    a0 = a
    a1 = np.roll(a, -1, axis=0)
    b0 = b
    b1 = np.roll(b, -1, axis=0)
    ci, cj = edge_bbox_candidates(a0, a1, b0, b1)
    if len(ci) == 0:
        z = np.empty(0, dtype=np.int64)
        zf = np.empty(0, dtype=np.float64)
        return z, z.copy(), zf, zf.copy(), zf.copy(), zf.copy()
    pa0, pa1 = a0[ci], a1[ci]
    pb0, pb1 = b0[cj], b1[cj]
    r = pa1 - pa0
    s = pb1 - pb0
    qp = pb0 - pa0
    denom = r[:, 0] * s[:, 1] - r[:, 1] * s[:, 0]
    cross_qp_s = qp[:, 0] * s[:, 1] - qp[:, 1] * s[:, 0]
    cross_qp_r = qp[:, 0] * r[:, 1] - qp[:, 1] * r[:, 0]

    with np.errstate(divide="ignore", invalid="ignore"):
        t = cross_qp_s / denom
        u = cross_qp_r / denom

    nz = denom != 0
    hit = nz & (t > 0.0) & (t < 1.0) & (u > 0.0) & (u < 1.0)
    # endpoint contact (t or u exactly 0/1 with the other in [0,1])
    touch = (
        nz
        & (t >= 0.0) & (t <= 1.0) & (u >= 0.0) & (u <= 1.0)
        & (((t == 0.0) | (t == 1.0)) | ((u == 0.0) | (u == 1.0)))
    )
    if touch.any():
        raise DegenerateGeometry("vertex-on-boundary contact")
    # collinear overlapping edges: parallel + collinear + bbox overlap
    # (candidates already bbox-overlap, so collinear parallel == overlap)
    par = ~nz & (cross_qp_s == 0)
    if par.any():
        raise DegenerateGeometry("collinear overlapping edges")
    sel = np.nonzero(hit)[0]
    ii = ci[sel]
    jj = cj[sel]
    tt = t[sel]
    uu = u[sel]
    px = pa0[sel, 0] + tt * r[sel, 0]
    py = pa0[sel, 1] + tt * r[sel, 1]
    return ii, jj, tt, uu, px, py


class _Node:
    __slots__ = ("x", "y", "crossing", "entry", "twin", "next", "prev", "seen")

    def __init__(self, x: float, y: float, crossing: bool = False):
        self.x = x
        self.y = y
        self.crossing = crossing
        self.entry = False
        self.twin = None
        self.next = None
        self.prev = None
        self.seen = False


def _build_list(ring: np.ndarray, crossings: list[tuple[int, float, _Node]]):
    """Circular doubly-linked node list: original vertices with
    crossing nodes spliced into their edges ordered by param."""
    by_edge: dict[int, list[tuple[float, _Node]]] = {}
    for edge, param, node in crossings:
        by_edge.setdefault(edge, []).append((param, node))
    nodes: list[_Node] = []
    for i, (x, y) in enumerate(ring):
        nodes.append(_Node(float(x), float(y)))
        if i in by_edge:
            ordered = sorted(by_edge[i], key=lambda e: e[0])
            params = [p for p, _ in ordered]
            if len(set(params)) != len(params):
                raise DegenerateGeometry("coincident crossings on one edge")
            nodes.extend(n for _, n in ordered)
    for i, node in enumerate(nodes):
        node.next = nodes[(i + 1) % len(nodes)]
        node.prev = nodes[i - 1]
    return nodes


def _mark_entries(nodes: list[_Node], other_open: np.ndarray, forint: bool):
    """Alternate entry/exit flags along the ring: the first crossing
    after a stretch outside the other polygon is an entry."""
    status_inside = _point_in(other_open, nodes[0].x, nodes[0].y)
    if nodes[0].crossing:
        raise DegenerateGeometry("ring starts on a crossing")
    for node in nodes:
        if node.crossing:
            node.entry = not status_inside
            status_inside = not status_inside
    # For intersection, trace rule consumes flags as-is; for union,
    # both rings' flags invert (classic GH op selection).
    if not forint:
        for node in nodes:
            if node.crossing:
                node.entry = not node.entry


def gh_clip(
    ring_a: np.ndarray, ring_b: np.ndarray, op: str = "intersection"
) -> list[np.ndarray]:
    """Greiner–Hormann overlay of two simple rings in general
    position. Returns a list of CLOSED result rings (intersection: the
    overlap components; union: outer boundary plus any enclosed hole
    rings). Raises DegenerateGeometry for non-general-position input.
    """
    a = _ccw(_open(np.asarray(ring_a, dtype=np.float64)))
    b = _ccw(_open(np.asarray(ring_b, dtype=np.float64)))
    forint = op == "intersection"

    ii, jj, tt, uu, px, py = _proper_crossings(a, b)
    if len(ii) == 0:
        a_in_b = _point_in(b, a[0, 0], a[0, 1])
        b_in_a = _point_in(a, b[0, 0], b[0, 1])
        closed_a = np.vstack([a, a[:1]])
        closed_b = np.vstack([b, b[:1]])
        if forint:
            if a_in_b:
                return [closed_a]
            if b_in_a:
                return [closed_b]
            return []
        if a_in_b:
            return [closed_b]
        if b_in_a:
            return [closed_a]
        return [closed_a, closed_b]
    if len(ii) % 2 != 0:
        raise DegenerateGeometry("odd crossing count")

    cross_a: list[tuple[int, float, _Node]] = []
    cross_b: list[tuple[int, float, _Node]] = []
    for k in range(len(ii)):
        na = _Node(float(px[k]), float(py[k]), crossing=True)
        nb = _Node(float(px[k]), float(py[k]), crossing=True)
        na.twin = nb
        nb.twin = na
        cross_a.append((int(ii[k]), float(tt[k]), na))
        cross_b.append((int(jj[k]), float(uu[k]), nb))

    nodes_a = _build_list(a, cross_a)
    nodes_b = _build_list(b, cross_b)
    _mark_entries(nodes_a, b, forint)
    _mark_entries(nodes_b, a, forint)

    rings: list[np.ndarray] = []
    budget = 4 * (len(nodes_a) + len(nodes_b)) + 8
    for start in (n for n in nodes_a if n.crossing):
        if start.seen:
            continue
        pts: list[tuple[float, float]] = []
        current = start
        steps = 0
        while True:
            current.seen = True
            if current.twin is not None:
                current.twin.seen = True
            pts.append((current.x, current.y))
            if current.entry:
                node = current.next
                while not node.crossing:
                    pts.append((node.x, node.y))
                    node = node.next
                    steps += 1
                    if steps > budget:
                        raise DegenerateGeometry("tracer did not close")
            else:
                node = current.prev
                while not node.crossing:
                    pts.append((node.x, node.y))
                    node = node.prev
                    steps += 1
                    if steps > budget:
                        raise DegenerateGeometry("tracer did not close")
            current = node.twin
            steps += 1
            if steps > budget:
                raise DegenerateGeometry("tracer did not close")
            if current is start or current.twin is start:
                break
        arr = np.asarray(pts, dtype=np.float64)
        if len(arr) < 3:
            raise DegenerateGeometry("degenerate traced ring")
        rings.append(np.vstack([arr, arr[:1]]))
    return rings


# ---------------------------------------- polygon-level numPoints


def _ring_num_points(rings: list[np.ndarray]) -> int:
    """GEOS getNumPoints over closed rings (closing vertex counted)."""
    return int(sum(len(r) for r in rings))


def _hole_placement(
    hole: np.ndarray, result_rings: list[np.ndarray]
) -> int | None:
    """Index of the result ring strictly containing the hole, or None
    if the hole is strictly outside all of them. A hole whose boundary
    crosses any result ring raises (unsupported overlay case)."""
    h = _ccw(_open(np.asarray(hole, dtype=np.float64)))
    for idx, ring in enumerate(result_rings):
        r = _open(ring)
        ii, _jj, _t, _u, _px, _py = _proper_crossings(h, r)
        if len(ii):
            raise DegenerateGeometry("hole crosses result boundary")
        if _point_in(r, h[0, 0], h[0, 1]):
            return idx
    return None


def polygon_intersection_num_points(
    rings_a: list[np.ndarray], rings_b: list[np.ndarray]
) -> int:
    """GEOS ``intersection(A, B).getNumPoints()`` for polygons with
    optional holes, ANY position. Fast path: GH shells overlay plus
    the contained-or-disjoint hole rule. Anything the float tracer
    cannot classify (degenerate contacts, interacting holes,
    hole-crossing results) routes to the exact-Fraction arrangement
    kernel (functions/overlay_exact.py), which is position-free.

    Round-2's convex Sutherland–Hodgman fallback is GONE: it was
    measurably WRONG on touching convex pairs (a single shared vertex
    produced LINESTRING-2 instead of GEOS's POINT-1; the union corner
    count broke on any touch) — 13/520 intersection and 211/520 union
    mismatches vs the exact kernel on random degenerate convex pairs.
    """
    try:
        return _intersection_num_points_fast(rings_a, rings_b)
    except DegenerateGeometry:
        from workstealing_spatial_join_spark.functions import (
            overlay_exact as OX,
        )

        return OX.intersection_num_points_exact(rings_a, rings_b)


def _intersection_num_points_fast(
    rings_a: list[np.ndarray], rings_b: list[np.ndarray]
) -> int:
    shells = gh_clip(rings_a[0], rings_b[0], "intersection")
    if not shells:
        return 0
    holes = list(rings_a[1:]) + list(rings_b[1:])
    kept: list[np.ndarray] = []
    hole_rings: list[np.ndarray] = []
    # a result component swallowed by a hole disappears entirely
    for shell in shells:
        s = _open(shell)
        inside_hole = False
        for hole in holes:
            h = _ccw(_open(np.asarray(hole, dtype=np.float64)))
            ii, _jj, _t, _u, _px, _py = _proper_crossings(s, h)
            if len(ii):
                raise DegenerateGeometry("hole crosses result boundary")
            if _point_in(h, s[0, 0], s[0, 1]):
                inside_hole = True
                break
        if not inside_hole:
            kept.append(shell)
    placed: dict[int, list[np.ndarray]] = {}
    for hole in holes:
        idx = _hole_placement(hole, kept)
        if idx is not None:
            placed.setdefault(idx, []).append(
                _open(np.asarray(hole, dtype=np.float64))
            )
    for ring_holes in placed.values():
        # two input holes landing in the SAME result component must
        # not interact: overlapping/nested holes would union into one
        # interior ring in GEOS — out of scope, raise (never a silent
        # wrong count)
        for i in range(len(ring_holes)):
            for j in range(i + 1, len(ring_holes)):
                ha, hb = ring_holes[i], ring_holes[j]
                ii, _jj, _t, _u, _px, _py = _proper_crossings(ha, hb)
                if len(ii):
                    raise DegenerateGeometry("holes overlap in result")
                if _point_in(hb, ha[0, 0], ha[0, 1]) or _point_in(
                    ha, hb[0, 0], hb[0, 1]
                ):
                    raise DegenerateGeometry("nested holes in result")
        hole_rings.extend(np.vstack([h, h[:1]]) for h in ring_holes)
    return _ring_num_points(kept) + _ring_num_points(hole_rings)


def polygon_union_num_points(
    rings_a: list[np.ndarray], rings_b: list[np.ndarray]
) -> int:
    """GEOS ``union(A, B).getNumPoints()`` for polygons with optional
    holes, ANY position. Hole-free general-position pairs take the GH
    union fast path (outer boundary plus any enclosed hole rings the
    union creates — interlocking C-shapes); inputs WITH holes and all
    degenerate contacts route to the exact arrangement kernel. The
    round-2 convex corner-count fallback is gone (wrong on touches,
    see polygon_intersection_num_points)."""
    if len(rings_a) > 1 or len(rings_b) > 1:
        from workstealing_spatial_join_spark.functions import (
            overlay_exact as OX,
        )

        return OX.union_num_points_exact(rings_a, rings_b)
    try:
        rings = gh_clip(rings_a[0], rings_b[0], "union")
    except DegenerateGeometry:
        from workstealing_spatial_join_spark.functions import (
            overlay_exact as OX,
        )

        return OX.union_num_points_exact(rings_a, rings_b)
    return _ring_num_points(rings)
