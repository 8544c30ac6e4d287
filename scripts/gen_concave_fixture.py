"""Generate the concave-overlay correctness fixture:
bench_data/concave/{layer_a,layer_b,layer_c,layer_d,expected_int,
expected_union}.parquet

Layers are deterministic star polygons (concave, some with holes) on
a 1/1000 coordinate grid. For every MBR-overlapping pair the EXPECTED
intersection / union numPoints is computed with an EXACT
Fraction-arithmetic overlay that shares no code with the engine's
float Greiner–Hormann tracer (functions/overlay.py):

  subdivide both rings at their exact rational crossing points,
  classify each sub-edge by exact midpoint-in-polygon, keep the
  inside (intersection) or outside (union) sub-edges, stitch rings by
  exact start-point matching.

General position is ENFORCED exactly: any endpoint-on-edge contact,
collinear overlap, coincident crossing, or boundary-touching hole
makes the generator resample the offending polygon. The engine's
float path is then run as a cross-check: a DegenerateGeometry raise
also triggers resampling (the fixture must be in general position for
both arithmetics), but a silent VALUE mismatch hard-fails generation
— expected values always come from the exact implementation, never
from the engine.

Run: python scripts/gen_concave_fixture.py   (writes parquet + prints
a summary; deterministic — reruns reproduce identical files)
"""

from __future__ import annotations

import sys
from fractions import Fraction as Fr

import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

from workstealing_spatial_join_spark.functions import overlay as OV  # noqa: E402
from workstealing_spatial_join_spark.functions import wkt as W  # noqa: E402

OUT = "/root/repo/bench_data/concave"


# ------------------------------------------------ exact-arithmetic core


class Degenerate(Exception):
    pass


def orient(p, q, r):
    return (q[0] - p[0]) * (r[1] - p[1]) - (q[1] - p[1]) * (r[0] - p[0])


def point_in_ring_exact(ring, pt) -> bool:
    """Strict interior; raises Degenerate if pt lies on the boundary."""
    inside = False
    n = len(ring)
    for i in range(n):
        a, b = ring[i], ring[(i + 1) % n]
        o = orient(a, b, pt)
        if o == 0 and (
            min(a[0], b[0]) <= pt[0] <= max(a[0], b[0])
            and min(a[1], b[1]) <= pt[1] <= max(a[1], b[1])
        ):
            raise Degenerate("point on boundary")
        if (a[1] > pt[1]) != (b[1] > pt[1]):
            xc = a[0] + (pt[1] - a[1]) * (b[0] - a[0]) / (b[1] - a[1])
            if pt[0] < xc:
                inside = not inside
    return inside


def crossings_exact(A, B):
    """Proper crossings between rings A,B as {(i, t): point} maps per
    ring. Raises Degenerate on any non-proper contact."""
    ca: dict[int, list[tuple[Fr, tuple]]] = {}
    cb: dict[int, list[tuple[Fr, tuple]]] = {}
    na, nb = len(A), len(B)
    pts = set()
    for i in range(na):
        p, p2 = A[i], A[(i + 1) % na]
        r = (p2[0] - p[0], p2[1] - p[1])
        for j in range(nb):
            q, q2 = B[j], B[(j + 1) % nb]
            s = (q2[0] - q[0], q2[1] - q[1])
            denom = r[0] * s[1] - r[1] * s[0]
            qp = (q[0] - p[0], q[1] - p[1])
            cq_s = qp[0] * s[1] - qp[1] * s[0]
            cq_r = qp[0] * r[1] - qp[1] * r[0]
            if denom == 0:
                if cq_s == 0:  # collinear
                    if (
                        min(p[0], p2[0]) <= max(q[0], q2[0])
                        and min(q[0], q2[0]) <= max(p[0], p2[0])
                        and min(p[1], p2[1]) <= max(q[1], q2[1])
                        and min(q[1], q2[1]) <= max(p[1], p2[1])
                    ):
                        raise Degenerate("collinear overlap")
                continue
            t = Fr(cq_s, denom)
            u = Fr(cq_r, denom)
            if 0 <= t <= 1 and 0 <= u <= 1:
                if t in (0, 1) or u in (0, 1):
                    raise Degenerate("endpoint contact")
                pt = (p[0] + t * r[0], p[1] + t * r[1])
                if pt in pts:
                    raise Degenerate("coincident crossings")
                pts.add(pt)
                ca.setdefault(i, []).append((t, pt))
                cb.setdefault(j, []).append((u, pt))
    return ca, cb


def subdivide(ring, cross_map):
    """Ring vertices with crossings spliced in (exact order by t)."""
    out = []
    n = len(ring)
    for i in range(n):
        out.append(ring[i])
        for _t, pt in sorted(cross_map.get(i, []), key=lambda e: e[0]):
            out.append(pt)
    return out


def overlay_rings_exact(A, B, op: str):
    """Exact overlay of simple CCW rings → list of result rings
    (lists of exact points, open)."""
    ca, cb = crossings_exact(A, B)
    if not ca:
        a_in_b = point_in_ring_exact(B, A[0])
        b_in_a = point_in_ring_exact(A, B[0])
        if op == "intersection":
            if a_in_b:
                return [list(A)]
            if b_in_a:
                return [list(B)]
            return []
        if a_in_b:
            return [list(B)]
        if b_in_a:
            return [list(A)]
        return [list(A), list(B)]

    keep_inside = op == "intersection"
    edges = {}  # start point -> end point
    for ring, other, cmap in ((A, B, ca), (B, A, cb)):
        sub = subdivide(ring, cmap)
        m = len(sub)
        for i in range(m):
            s, e = sub[i], sub[(i + 1) % m]
            mid = ((s[0] + e[0]) / 2, (s[1] + e[1]) / 2)
            if point_in_ring_exact(other, mid) == keep_inside:
                if s in edges:
                    raise Degenerate("ambiguous stitch")
                edges[s] = e
    rings = []
    while edges:
        start, cur = next(iter(edges.items()))
        ring = []
        p = start
        for _ in range(len(edges) + 1):
            ring.append(p)
            nxt = edges.pop(p, None)
            if nxt is None:
                raise Degenerate("open chain")
            p = nxt
            if p == start:
                break
        else:
            raise Degenerate("unclosed ring")
        if len(ring) < 3:
            raise Degenerate("tiny ring")
        rings.append(ring)
    return rings


def ccw(ring):
    a2 = sum(
        ring[i][0] * ring[(i + 1) % len(ring)][1]
        - ring[(i + 1) % len(ring)][0] * ring[i][1]
        for i in range(len(ring))
    )
    if a2 == 0:
        raise Degenerate("zero-area ring")
    return ring if a2 > 0 else ring[::-1]


def int_numpoints_exact(shell_a, holes_a, shell_b, holes_b) -> int:
    """Exact GEOS-semantics intersection numPoints for polygons with
    contained-or-disjoint holes."""
    shells = overlay_rings_exact(shell_a, shell_b, "intersection")
    if not shells:
        return 0
    holes = holes_a + holes_b
    kept = []
    for ring in shells:
        swallowed = False
        for h in holes:
            ch, _ = crossings_exact(ring, h)
            if ch:
                raise Degenerate("hole crosses result")
            if point_in_ring_exact(h, ring[0]):
                swallowed = True
        if not swallowed:
            kept.append(ring)
    total = sum(len(r) + 1 for r in kept)
    placed: dict[int, list] = {}
    for h in holes:
        for ridx, ring in enumerate(kept):
            ch, _ = crossings_exact(h, ring)
            if ch:
                raise Degenerate("hole crosses result")
            if point_in_ring_exact(ring, h[0]):
                placed.setdefault(ridx, []).append(h)
                break
    for ring_holes in placed.values():
        # same rule as the engine: holes interacting inside one result
        # component are out of scope — raise, never silently miscount
        for i in range(len(ring_holes)):
            for j in range(i + 1, len(ring_holes)):
                ha, hb = ring_holes[i], ring_holes[j]
                ch, _ = crossings_exact(ha, hb)
                if ch:
                    raise Degenerate("holes overlap in result")
                if point_in_ring_exact(ha, hb[0]) or point_in_ring_exact(
                    hb, ha[0]
                ):
                    raise Degenerate("nested holes in result")
        total += sum(len(h) + 1 for h in ring_holes)
    return total


def union_numpoints_exact(shell_a, shell_b) -> int:
    rings = overlay_rings_exact(shell_a, shell_b, "union")
    return sum(len(r) + 1 for r in rings)


# ---------------------------------------------------------- generation


def snap(v: float) -> float:
    return round(v, 3)


def star(rng, cx, cy, nv, rmin, rmax):
    angles = np.sort(rng.uniform(0, 2 * np.pi, nv))
    if np.min(np.diff(angles, append=angles[0] + 2 * np.pi)) < 0.05:
        return None  # nearly-coincident angle → thin sliver risk
    radii = rng.uniform(rmin, rmax, nv)
    pts = [
        (snap(cx + r * np.cos(a)), snap(cy + r * np.sin(a)))
        for a, r in zip(angles, radii)
    ]
    if len(set(pts)) != len(pts):
        return None
    return pts


def hole_for(rng, cx, cy):
    """Small convex hole near the polygon center (strictly inside for
    rmin ≥ 0.4 star radii)."""
    r = 0.12
    k = int(rng.integers(4, 7))
    angles = np.sort(rng.uniform(0, 2 * np.pi, k))
    if np.min(np.diff(angles, append=angles[0] + 2 * np.pi)) < 0.2:
        return None
    pts = [
        (snap(cx + r * np.cos(a)), snap(cy + r * np.sin(a)))
        for a in angles
    ]
    return pts[::-1]  # CW, as WKB holes conventionally wind


def to_frac_ring(pts):
    return [(Fr(x), Fr(y)) for x, y in pts]


def make_layer(rng, n, region, with_holes, id0=0):
    polys = []
    while len(polys) < n:
        cx = rng.uniform(-region, region)
        cy = rng.uniform(-region, region)
        nv = int(rng.integers(6, 16))
        pts = star(rng, cx, cy, nv, 0.45, 1.5)
        if pts is None:
            continue
        shell_f = to_frac_ring(pts)
        try:
            ccw(shell_f)
        except Degenerate:
            continue
        holes = []
        if with_holes and rng.uniform() < 0.3:
            h = hole_for(rng, snap(cx), snap(cy))
            if h is None:
                continue
            hf = to_frac_ring(h)
            try:
                # hole strictly inside the shell, no contact
                ch, _ = crossings_exact(hf, shell_f)
                if ch or not all(
                    point_in_ring_exact(shell_f, p) for p in hf
                ):
                    continue
            except Degenerate:
                continue
            holes = [h]
        polys.append({"poly_id": id0 + len(polys), "shell": pts, "holes": holes})
    return polys


def poly_rows(polys):
    rows = []
    for p in polys:
        rings = [np.array(p["shell"] + p["shell"][:1], dtype=np.float64)]
        for h in p["holes"]:
            rings.append(np.array(h + h[:1], dtype=np.float64))
        wkb = W.to_wkb(W.POLYGON, rings)
        xs = [x for x, _ in p["shell"]]
        ys = [y for _, y in p["shell"]]
        rows.append(
            {
                "poly_id": p["poly_id"],
                "geom_wkb": wkb,
                "minx": min(xs), "miny": min(ys),
                "maxx": max(xs), "maxy": max(ys),
            }
        )
    return pd.DataFrame(rows)


def vertex_rows(polys):
    """Scaled-integer vertex table (poly_id, ring, idx, xi, yi) with
    rings CLOSED (last vertex repeats the first) — the DuckDB oracle
    recomputes the shoelace area/centroid from these int64 lattice
    coordinates with pure integer cross-product sums, independent of
    the engine's WKB decode path. Coordinates are 3-decimal by
    construction (snap), so xi = round(x*1000) is exact."""
    rows = []
    for p in polys:
        rings = [p["shell"] + p["shell"][:1]]
        rings += [h + h[:1] for h in p["holes"]]
        for ri, ring in enumerate(rings):
            for vi, (x, y) in enumerate(ring):
                rows.append(
                    {
                        "poly_id": p["poly_id"],
                        "ring": ri,
                        "idx": vi,
                        "xi": int(round(x * 1000)),
                        "yi": int(round(y * 1000)),
                    }
                )
    return pd.DataFrame(rows)


def frac_rings(p):
    shell = ccw(to_frac_ring(p["shell"]))
    holes = [to_frac_ring(h) for h in p["holes"]]
    return shell, holes


def float_rings(p):
    rings = [np.array(p["shell"] + p["shell"][:1], dtype=np.float64)]
    for h in p["holes"]:
        rings.append(np.array(h + h[:1], dtype=np.float64))
    return rings


def mbr_overlap(pa, pb):
    ax = [x for x, _ in pa["shell"]]
    ay = [y for _, y in pa["shell"]]
    bx = [x for x, _ in pb["shell"]]
    by = [y for _, y in pb["shell"]]
    return (
        min(ax) <= max(bx) and min(bx) <= max(ax)
        and min(ay) <= max(by) and min(by) <= max(ay)
    )


def build_expected(layer_l, layer_r, op):
    """Expected values for all MBR-overlapping pairs; returns
    (rows, bad_ids) where bad_ids are polygons involved in a
    degenerate configuration that must be resampled."""
    rows = []
    bad = set()
    for pa in layer_l:
        for pb in layer_r:
            if not mbr_overlap(pa, pb):
                continue
            sa, ha = frac_rings(pa)
            sb, hb = frac_rings(pb)
            try:
                if op == "intersection":
                    exp = int_numpoints_exact(sa, ha, sb, hb)
                else:
                    exp = union_numpoints_exact(sa, sb)
            except Degenerate:
                bad.add(("l", pa["poly_id"]))
                continue
            # engine float cross-check: degenerate float behavior →
            # resample; silent wrong value → HARD FAIL
            try:
                if op == "intersection":
                    got = OV.polygon_intersection_num_points(
                        float_rings(pa), float_rings(pb)
                    )
                else:
                    got = OV.polygon_union_num_points(
                        [float_rings(pa)[0]], [float_rings(pb)[0]]
                    )
            except OV.DegenerateGeometry:
                bad.add(("l", pa["poly_id"]))
                continue
            if got != exp:
                raise SystemExit(
                    f"ENGINE/EXACT MISMATCH {op} "
                    f"a={pa['poly_id']} b={pb['poly_id']}: {got} != {exp}"
                )
            rows.append({"a_id": pa["poly_id"], "b_id": pb["poly_id"],
                         "expected": exp})
    return rows, bad


def generate(op, n_l, n_r, with_holes, seed, id0_l, id0_r):
    rng = np.random.default_rng(seed)
    region = 8.0
    layer_l = make_layer(rng, n_l, region, with_holes, id0_l)
    layer_r = make_layer(rng, n_r, region, with_holes and op == "intersection",
                         id0_r)
    for _attempt in range(50):
        rows, bad = build_expected(layer_l, layer_r, op)
        if not bad:
            return layer_l, layer_r, rows
        # resample offending polygons (keep ids)
        for _side, pid in bad:
            for i, p in enumerate(layer_l):
                if p["poly_id"] == pid:
                    layer_l[i] = make_layer(rng, 1, region, with_holes, pid)[0]
    raise SystemExit("could not reach general position")


def main():
    import os

    os.makedirs(OUT, exist_ok=True)
    la, lb, exp_int = generate("intersection", 110, 140, True, 20260816, 0, 1000)
    lc, ld, exp_uni = generate("union", 90, 110, False, 816, 2000, 3000)
    poly_rows(la).to_parquet(f"{OUT}/layer_a.parquet", index=False)
    poly_rows(lb).to_parquet(f"{OUT}/layer_b.parquet", index=False)
    poly_rows(lc).to_parquet(f"{OUT}/layer_c.parquet", index=False)
    poly_rows(ld).to_parquet(f"{OUT}/layer_d.parquet", index=False)
    vertex_rows(la).to_parquet(f"{OUT}/vertices_a.parquet", index=False)
    pd.DataFrame(exp_int).to_parquet(f"{OUT}/expected_int.parquet", index=False)
    pd.DataFrame(exp_uni).to_parquet(f"{OUT}/expected_union.parquet", index=False)
    ni = sum(1 for r in exp_int if r["expected"] > 0)
    nu = sum(1 for r in exp_uni if r["expected"] > 0)
    print(
        f"layers a={len(la)} b={len(lb)} c={len(lc)} d={len(ld)}; "
        f"int pairs {len(exp_int)} ({ni} nonzero, "
        f"sum {sum(r['expected'] for r in exp_int)}); "
        f"union pairs {len(exp_uni)} ({nu} nonzero, "
        f"sum {sum(r['expected'] for r in exp_uni)})"
    )


if __name__ == "__main__":
    main()
