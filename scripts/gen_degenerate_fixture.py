"""Generate the DEGENERATE-position overlay fixture:
bench_data/degenerate/{layer_e,layer_f,expected_degen}.parquet
and the LINES-layer fixture:
bench_data/lines/{layer_lines,layer_polys,expected_lines}.parquet

Round-2 verdict: the concave fixture generator resampled away every
configuration the engine raised on, so CORRECTNESS could never see
the degenerate-contact gap. This generator is the opposite: every
pair is CONSTRUCTED to be degenerate (shared edges, vertex touches,
collinear overlaps, touching holes) and the expected numPoints come
from per-family CLOSED FORMS derived by hand from JTS/GEOS OverlayOp
semantics — documented next to each family, independent of BOTH
engine kernels (float GH in functions/overlay.py and the exact
arrangement in functions/overlay_exact.py). The engine is judged
against these values; a mismatch is reported, never resampled away.

Degeneracy is preserved exactly under the instance transforms used
(dyadic translation, power-of-two scale, 90-degree rotation — all
float-exact), so randomized placement cannot un-degenerate a family.

Line expectations use a STRUCTURALLY DIFFERENT exact derivation from
the engine's span tracer: for a general-position line,
``numPoints(intersection) = #proper boundary crossings + #line
vertices strictly inside the polygon`` (each inside span contributes
its two bounding crossings/endpoints once and its interior vertices
once — a local counting identity, no span assembly). Degenerate line
families use closed forms.

Run: python scripts/gen_degenerate_fixture.py   (deterministic)
"""

from __future__ import annotations

import os
import sys
from fractions import Fraction as Fr

import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

from workstealing_spatial_join_spark.functions import wkt as W  # noqa: E402

OUT_DEGEN = "/root/repo/bench_data/degenerate"
OUT_LINES = "/root/repo/bench_data/lines"


def closed(pts):
    a = np.asarray(pts, dtype=np.float64)
    return np.vstack([a, a[:1]])


def rect(x0, y0, x1, y1):
    return closed([(x0, y0), (x1, y0), (x1, y1), (x0, y1)])


def transform(rings, dx, dy, scale, rot):
    """Float-exact instance transform: dyadic translate, power-of-two
    scale, k×90° rotation — degeneracies (exact coincidences) survive
    because every operation is exact in IEEE float."""
    out = []
    for r in rings:
        p = np.asarray(r, dtype=np.float64) * scale
        for _ in range(rot % 4):
            p = np.stack([-p[:, 1], p[:, 0]], axis=1)
        p = p + np.array([dx, dy])
        out.append(p)
    return out


# --------------------------------------------------- polygon families
# Each returns (rings_a, rings_b, expected_int, expected_union) with
# the closed-form derivation in the comment.


def fam_edge_adjacent(rng):
    # Two rects sharing a FULL edge: intersection = the shared edge as
    # LINESTRING (2). Union = one ring, the shared corners become
    # nodes of the merged boundary: 6 vertices + closing = 7.
    w1 = int(rng.integers(1, 5))
    w2 = int(rng.integers(1, 5))
    h = int(rng.integers(1, 5))
    return [rect(0, 0, w1, h)], [rect(w1, 0, w1 + w2, h)], 2, 7


def fam_partial_shared_edge(rng):
    # Rects sharing a PARTIAL edge segment (strict overlap of the two
    # edge intervals). Intersection = LINESTRING (2). Union ring: 4+4
    # original corners plus one node on each side's shared line where
    # the other's corner splits the edge: 8 vertices + closing = 9.
    h = int(rng.integers(2, 5))
    dy = int(rng.integers(1, h))  # strict: 0 < dy < h
    return (
        [rect(0, 0, 2, h)],
        [rect(2, dy, 4, dy + h)],
        2,
        9,
    )


def fam_corner_touch(rng):
    # Rects touching at one corner: intersection = POINT (1); union =
    # MULTIPOLYGON of both rings = 5 + 5.
    w = int(rng.integers(1, 4))
    return [rect(0, 0, w, w)], [rect(w, w, w + 2, w + 2)], 1, 10


def fam_vertex_on_edge(rng):
    # Triangle apex touching the interior of a rect edge: intersection
    # = POINT (1); union = rect ring noded at the touch (5+1=6) +
    # triangle (4) = 10.
    ty = int(rng.integers(1, 3))
    return (
        [rect(0, 0, 3, 3)],
        [closed([(3, ty), (5, ty - 1), (5, ty + 1)])],
        1,
        10,
    )


def fam_collinear_overlap_area(rng):
    # Rects with equal y-extent overlapping in x: positive-area
    # intersection rectangle (5) whose top/bottom edges are collinear
    # with BOTH inputs. Union = one ring noded at both overlap
    # abscissae on both horizontal lines: 8 vertices + closing = 9.
    d = int(rng.integers(1, 3))
    return [rect(0, 0, 4, 2)], [rect(d, 0, 4 + d, 2)], 5, 9


def _star(rng, nv):
    ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
    if np.min(np.diff(ang, append=ang[0] + 2 * np.pi)) < 0.15:
        return None
    rad = rng.uniform(0.5, 2.0, nv)
    pts = np.round(
        np.stack([rad * np.cos(ang), rad * np.sin(ang)], axis=1) * 64
    ) / 64
    if len(np.unique(pts, axis=0)) != nv:
        return None
    # reject zero-area / self-intersecting stars (angular order makes
    # self-intersection impossible; just require nonzero area)
    x, y = pts[:, 0], pts[:, 1]
    if abs(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)) < 1e-9:
        return None
    return closed(pts)


def fam_identical(rng):
    # A == B exactly: intersection = union = the polygon itself,
    # numPoints = nv + closing.
    s = None
    while s is None:
        s = _star(rng, int(rng.integers(5, 12)))
    n = len(s)  # closed length = nv + 1
    return [s], [s.copy()], n, n


def fam_mirror_shared_edge(rng):
    # Concave pentagon with an exactly vertical right edge, mirrored
    # across that edge (mirror x -> 2c - x is float-exact for dyadic
    # c). Interiors on opposite sides: intersection = shared edge as
    # LINESTRING (2); union = ring of all non-shared vertices plus the
    # two shared endpoints: 2*nv - 2 vertices + closing = 2*nv - 1.
    a = closed([(1, -2), (1, 2), (-1, 1), (-0.5, 0), (-1, -1)])
    b = a.copy()
    b[:, 0] = 2.0 - b[:, 0]
    b = b[::-1].copy()  # keep simple-ring orientation sane
    nv = 5
    return [a], [b], 2, 2 * nv - 1


def fam_contained_sharing_edge(rng):
    # B inside A, B's bottom edge lying strictly within A's bottom
    # edge: intersection = B (5); union = A noded at B's two bottom
    # corners: 6 vertices + closing = 7.
    return [rect(0, 0, 6, 6)], [rect(1, 0, 3, 2)], 5, 7


def fam_donut_inner(rng):
    # A = square donut, B strictly inside the hole, no contact:
    # intersection is EMPTY (0); union = MULTIPOLYGON(A-with-hole, B)
    # = 5 + 5 + 5 = 15.
    donut = [rect(0, 0, 8, 8), rect(2, 2, 6, 6)[::-1]]
    return donut, [rect(3, 3, 5, 5)], 0, 15


def fam_donut_plug(rng):
    # B overlaps A's body AND part of A's hole: intersection = B minus
    # the hole = L-shape, 6 vertices + closing = 7. Union = A's shell
    # (5) + shrunken L-shaped hole (6 vertices + closing = 7) = 12.
    donut = [rect(0, 0, 6, 6), rect(2, 2, 4, 4)[::-1]]
    return donut, [rect(1, 1, 3, 3)], 7, 12


def fam_vertex_touch_concave(rng):
    # Two concave hexagons sharing EXACTLY one vertex (each otherwise
    # strictly inside its own half-plane): intersection = POINT (1);
    # union = MULTIPOLYGON = 7 + 7 = 14.
    a = closed([(0, 0), (-2, 1), (-4, 2), (-3, 0), (-4, -2), (-1, -1)])
    b = closed([(0, 0), (2, -1), (4, -2), (3, 0), (4, 2), (1, 1)])
    return [a], [b], 1, 14


POLY_FAMILIES = [
    ("edge_adjacent", fam_edge_adjacent, 14),
    ("partial_shared_edge", fam_partial_shared_edge, 14),
    ("corner_touch", fam_corner_touch, 12),
    ("vertex_on_edge", fam_vertex_on_edge, 12),
    ("collinear_overlap_area", fam_collinear_overlap_area, 12),
    ("identical", fam_identical, 12),
    ("mirror_shared_edge", fam_mirror_shared_edge, 10),
    ("contained_sharing_edge", fam_contained_sharing_edge, 10),
    ("donut_inner", fam_donut_inner, 10),
    ("donut_plug", fam_donut_plug, 10),
    ("vertex_touch_concave", fam_vertex_touch_concave, 10),
]


def poly_row(poly_id, rings):
    shell = rings[0]
    return {
        "poly_id": poly_id,
        "geom_wkb": W.to_wkb(W.POLYGON, [np.asarray(r) for r in rings]),
        "minx": float(shell[:, 0].min()),
        "miny": float(shell[:, 1].min()),
        "maxx": float(shell[:, 0].max()),
        "maxy": float(shell[:, 1].max()),
    }


def gen_degenerate():
    rng = np.random.default_rng(20260817)
    rows_e, rows_f, expected = [], [], []
    slot = 0
    for _name, fam, n_inst in POLY_FAMILIES:
        for _k in range(n_inst):
            ra, rb, exp_int, exp_uni = fam(rng)
            # float-exact instance transform; slots keep instances
            # spatially apart (inside world grid bounds) so the MBR
            # join pairs only partners
            dx = float((slot % 16) * 4 - 32)
            dy = float((slot // 16) * 4 - 16)
            scale = float(2.0 ** int(rng.integers(-4, -2)))
            rot = int(rng.integers(0, 4))
            ta = transform(ra, dx, dy, scale, rot)
            tb = transform(rb, dx, dy, scale, rot)
            a_id = 5000 + slot
            b_id = 6000 + slot
            rows_e.append(poly_row(a_id, ta))
            rows_f.append(poly_row(b_id, tb))
            expected.append(
                {
                    "a_id": a_id,
                    "b_id": b_id,
                    "family": _name,
                    "expected_int": exp_int,
                    "expected_union": exp_uni,
                }
            )
            slot += 1
    os.makedirs(OUT_DEGEN, exist_ok=True)
    pd.DataFrame(rows_e).to_parquet(f"{OUT_DEGEN}/layer_e.parquet", index=False)
    pd.DataFrame(rows_f).to_parquet(f"{OUT_DEGEN}/layer_f.parquet", index=False)
    pd.DataFrame(expected).to_parquet(
        f"{OUT_DEGEN}/expected_degen.parquet", index=False
    )
    return pd.DataFrame(expected)


# ------------------------------------------------------ line fixture
# Exact-Fraction local-counting oracle for general-position lines:
# numPoints = #proper crossings + #line vertices strictly inside.


def _orient(p, q, r):
    return (q[0] - p[0]) * (r[1] - p[1]) - (q[1] - p[1]) * (r[0] - p[0])


class LineDegenerate(Exception):
    pass


def _pip_exact(ring, pt):
    """Strict interior, exact; raises on boundary contact."""
    inside = False
    n = len(ring)
    for i in range(n):
        a, b = ring[i], ring[(i + 1) % n]
        o = _orient(a, b, pt)
        if o == 0 and (
            min(a[0], b[0]) <= pt[0] <= max(a[0], b[0])
            and min(a[1], b[1]) <= pt[1] <= max(a[1], b[1])
        ):
            raise LineDegenerate("vertex on boundary")
        if (a[1] > pt[1]) != (b[1] > pt[1]):
            xc = a[0] + (pt[1] - a[1]) * (b[0] - a[0]) / (b[1] - a[1])
            if pt[0] < xc:
                inside = not inside
    return inside


def line_counts_general(line_f, ring_f) -> tuple[int, int, int]:
    """Exact local counts for a general-position line×ring pair:
    (proper crossings, strictly-inside vertices, strictly-outside
    vertices). Raises LineDegenerate on any non-general contact."""
    crossings = 0
    for i in range(len(line_f) - 1):
        p, p2 = line_f[i], line_f[i + 1]
        r = (p2[0] - p[0], p2[1] - p[1])
        n = len(ring_f)
        for j in range(n):
            q, q2 = ring_f[j], ring_f[(j + 1) % n]
            s = (q2[0] - q[0], q2[1] - q[1])
            denom = r[0] * s[1] - r[1] * s[0]
            qp = (q[0] - p[0], q[1] - p[1])
            cqs = qp[0] * s[1] - qp[1] * s[0]
            if denom == 0:
                if cqs == 0 and (
                    min(p[0], p2[0]) <= max(q[0], q2[0])
                    and min(q[0], q2[0]) <= max(p[0], p2[0])
                    and min(p[1], p2[1]) <= max(q[1], q2[1])
                    and min(q[1], q2[1]) <= max(p[1], p2[1])
                ):
                    raise LineDegenerate("collinear overlap")
                continue
            t = Fr(cqs, 1) / denom
            u = Fr(qp[0] * r[1] - qp[1] * r[0], 1) / denom
            if 0 <= t <= 1 and 0 <= u <= 1:
                if t in (0, 1) or u in (0, 1):
                    raise LineDegenerate("endpoint contact")
                crossings += 1
    inside = sum(1 for v in line_f if _pip_exact(ring_f, v))
    return crossings, inside, len(line_f) - inside


def line_int_numpoints_general(line_f, ring_f) -> int:
    """Exact intersection oracle via local counting (NO span
    assembly): proper crossings + strictly-inside line vertices."""
    crossings, inside, _ = line_counts_general(line_f, ring_f)
    return crossings + inside


def line_union_numpoints_general(line_f, ring_f) -> int:
    """Exact union oracle via local counting: V_out + 2C + R + 1.

    Derivation (general position only): the union is the polygon with
    its ring noded at the C crossings (R + C vertices + closure) plus
    the line's OUTSIDE runs. Each outside run's endpoints are
    crossings or outside line endpoints; summed over runs that is
    exactly V_out + C points (2·runs = C + E_out and interior run
    vertices = V_out − E_out). Outside runs contain no interior nodes
    — crossings ARE the run boundaries — so JTS edge-splitting vs
    span-merging conventions cannot change the count; the identity is
    convention-free, unlike the engine's span-assembly tracer."""
    crossings, _, outside = line_counts_general(line_f, ring_f)
    return outside + 2 * crossings + len(ring_f) + 1


def _frac(pts):
    return [(Fr(float(x)), Fr(float(y))) for x, y in pts]


def gen_lines():
    rng = np.random.default_rng(816)
    polys, lines, expected = [], [], []
    # --- general-position random polylines vs concave stars ---
    slot = 0
    made = 0
    while made < 60:
        dx = float((slot % 16) * 6 - 48)
        dy = float((slot // 16) * 6 - 48)
        slot += 1
        star = None
        while star is None:
            star = _star(rng, int(rng.integers(6, 14)))
        star = star + np.array([dx, dy])
        nvert = int(rng.integers(2, 6))
        # x-monotone polyline: strictly increasing x makes
        # self-intersection impossible, so JTS self-noding semantics
        # never come into play
        xs = np.sort(np.round(rng.uniform(-2.5, 2.5, nvert + 1) * 64) / 64)
        if len(np.unique(xs)) != len(xs):
            continue
        ys = np.round(rng.uniform(-2.5, 2.5, nvert + 1) * 64) / 64
        line = np.stack([xs, ys], axis=1) + np.array([dx, dy])
        try:
            crossings, inside, outside = line_counts_general(
                _frac(line), _frac(star[:-1])
            )
        except LineDegenerate:
            continue
        exp = crossings + inside
        exp_union = outside + 2 * crossings + len(star[:-1]) + 1
        if exp == 0 and rng.uniform() < 0.7:
            continue  # keep a few empty pairs, not a flood
        lid = 7000 + made
        pid = 8000 + made
        lines.append(
            {
                "line_id": lid,
                "geom_wkb": W.to_wkb(W.LINESTRING, [line]),
                "minx": float(line[:, 0].min()),
                "miny": float(line[:, 1].min()),
                "maxx": float(line[:, 0].max()),
                "maxy": float(line[:, 1].max()),
            }
        )
        polys.append(poly_row(pid, [star]))
        expected.append(
            {"line_id": lid, "poly_id": pid, "family": "general",
             "expected_int": int(exp), "expected_union": int(exp_union)}
        )
        made += 1

    # --- constructed degenerate line families (closed forms) ---
    def add_case(name, line, rings, exp, exp_union):
        nonlocal slot
        dx = float((slot % 16) * 6 - 48)
        dy = float((slot // 16) * 6 - 48)
        slot += 1
        # quarter-scale (dyadic, float-exact) keeps instances inside
        # their slots; closed-form expectations are scale-invariant
        line = np.asarray(line, dtype=np.float64) * 0.25 + np.array([dx, dy])
        rings = [np.asarray(r) * 0.25 + np.array([dx, dy]) for r in rings]
        lid, pid = 7000 + len(lines), 8000 + len(polys)
        lines.append(
            {
                "line_id": lid,
                "geom_wkb": W.to_wkb(W.LINESTRING, [line]),
                "minx": float(line[:, 0].min()),
                "miny": float(line[:, 1].min()),
                "maxx": float(line[:, 0].max()),
                "maxy": float(line[:, 1].max()),
            }
        )
        polys.append(poly_row(pid, rings))
        expected.append(
            {"line_id": lid, "poly_id": pid, "family": name,
             "expected_int": exp, "expected_union": exp_union}
        )

    # Union closed forms (hand-derived per family, round 4 — closing
    # the r3 gap where degenerate families stored NULL): JTS OverlayOp
    # union(LINESTRING, POLYGON) = the polygon with its shell NODED at
    # every line∩ring contact (R original vertices + interior-of-edge
    # split points + closing vertex) PLUS the line spans strictly
    # outside the closed polygon, split at every node (2 points per
    # span here — no degenerate-family span carries an interior
    # original vertex). Contacts at EXISTING ring corners add no split
    # point. These counts are derived from the contact inventory of
    # each family alone (local counting, no span assembly, no engine
    # code), and are invariant under the slot translation + 0.25
    # scale.
    sq = rect(0, 0, 4, 4)
    for k in range(6):
        # on-boundary segment strictly inside the bottom edge: the
        # collapsed span is a LINESTRING of its 2 endpoints.
        # Union: no outside span; shell noded at the 2 segment
        # endpoints (interior of the bottom edge) -> 4 + 2 + 1 = 7
        x0 = 0.5 + 0.25 * k
        add_case("on_boundary",
                 [(x0, 0.0), (x0 + 1.0, 0.0)], [sq], 2, 7)
        # line along the bottom edge overshooting both ends: kept span
        # is exactly the noded edge (0,0)-(4,0) -> 2 points.
        # Union: contacts are the two CORNERS (no interior splits,
        # shell = 4 + 0 + 1 = 5) + two outside overshoot spans
        # (2 + 2) -> 9
        add_case("collinear_overshoot",
                 [(-1.0 - 0.25 * k, 0.0), (5.0, 0.0)], [sq], 2, 9)
        # V-shaped polyline whose apex touches the interior of the top
        # edge from outside: intersection = POINT -> 1.
        # Union: shell noded at the touch (4 + 1 + 1 = 6); the line is
        # outside except the touch node, which splits it into two
        # 2-point spans (2 + 2) -> 10
        add_case("tangent_touch",
                 [(-2.0, 6.0 + 0.25 * k), (2.0, 4.0), (6.0, 6.0)],
                 [sq], 1, 10)
        # endpoint lands exactly on a corner, rest outside: POINT -> 1.
        # Union: corner contact adds no split (shell 4 + 0 + 1 = 5);
        # one outside span of 2 points -> 7
        add_case("corner_endpoint",
                 [(-2.0, 8.0 + 0.25 * k), (0.0, 4.0)], [sq], 1, 7)
        # enters through one corner, exits through the other on the
        # same diagonal: the kept span is the chord between corners.
        # Union: both contacts at corners (shell 5); the inside chord
        # dissolves; two outside tails (2 + 2) -> 9
        add_case("corner_to_corner",
                 [(-1.0, 5.0), (5.0, -1.0)], [sq], 2, 9)
        # inside span with an interior vertex: crossings at x=0 and
        # x=4 plus the strictly-inside vertex -> 3.
        # Union: entry/exit nodes on edge interiors (shell
        # 4 + 2 + 1 = 7); inside span dissolves from the line part;
        # two outside tails (2 + 2) -> 11
        add_case("interior_vertex",
                 [(-1.0, 2.0), (2.0, 2.0 + 0.25 * k), (5.0, 2.0)],
                 [sq], 3, 11)
    return polys, lines, expected


def gen_lines_fixture():
    polys, lines, expected = gen_lines()
    os.makedirs(OUT_LINES, exist_ok=True)
    pd.DataFrame(lines).to_parquet(
        f"{OUT_LINES}/layer_lines.parquet", index=False
    )
    pd.DataFrame(polys).to_parquet(
        f"{OUT_LINES}/layer_polys.parquet", index=False
    )
    df = pd.DataFrame(expected)
    df.to_parquet(f"{OUT_LINES}/expected_lines.parquet", index=False)
    return df


def gen_invalid_family() -> list[tuple[str, bytes]]:
    """INVALID polygon WKBs (name, wkb) — the ingest ``validate=True``
    rejection family (VERDICT r3 #8). These are NOT written into the
    overlay layers (those must stay valid); tests feed them through
    ``ingest_geometry(..., validate=True)`` and assert every one is
    dropped. Families mirror GEOS IsValid failure classes:
    HoleOutsideShell, SelfIntersection (hole straddling the shell),
    NestedHoles, hole-hole proper crossing, RingNotClosed,
    TooFewPoints."""
    shell = rect(0, 0, 10, 10)
    cases = [
        ("hole_outside_shell", [shell, rect(20, 20, 22, 22)]),
        ("hole_straddles_shell", [shell, rect(8, 8, 12, 12)]),
        ("nested_holes", [shell, rect(2, 2, 8, 8), rect(4, 4, 6, 6)]),
        ("holes_properly_crossing",
         [shell, rect(2, 2, 6, 6), rect(4, 4, 8, 8)]),
        ("ring_not_closed",
         [np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0]])]),
        ("too_few_points",
         [np.array([[0.0, 0.0], [4.0, 0.0], [0.0, 0.0]])]),
        ("bowtie_self_intersection",
         [closed([(0, 0), (4, 4), (4, 0), (0, 4)])]),
        # GEOS DuplicateRings: two identical holes (second rotated +
        # reversed to prove the cycle-insensitive compare)
        ("duplicate_holes",
         [shell, rect(2, 2, 6, 6),
          closed([(6, 2), (6, 6), (2, 6), (2, 2)])]),
        # GEOS NestedHoles with ZERO strictly-inside vertices: a
        # triangle hole inscribed in a square hole, every triangle
        # vertex ON the square's boundary (ADVICE r4 — only an edge-
        # midpoint probe catches it)
        ("inscribed_hole_on_boundary",
         [shell, rect(2, 2, 8, 8),
          closed([(2, 2), (8, 2), (5, 8)])]),
        # hole identical to the shell: interior is empty / ill-defined
        ("hole_equals_shell", [shell, shell.copy()]),
    ]
    return [(name, W.to_wkb(W.POLYGON, rings)) for name, rings in cases]


def main():
    exp_d = gen_degenerate()
    exp_l = gen_lines_fixture()
    print(
        f"degenerate pairs: {len(exp_d)} "
        f"(int>0: {(exp_d.expected_int > 0).sum()}, "
        f"union sum {exp_d.expected_union.sum()}); "
        f"line pairs: {len(exp_l)} "
        f"(int>0: {(exp_l.expected_int > 0).sum()})"
    )


if __name__ == "__main__":
    main()
