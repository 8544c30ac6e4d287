"""Round-5 batch 11: hexagonal binning (two-lattice Voronoi),
point→nearest-segment snap join, cross-document repeated-span
detector."""

from __future__ import annotations

from fractions import Fraction

import numpy as np
from pyspark.sql import functions as F

from workstealing_spatial_join_spark.operators.layout import (
    HEXBIN_SX,
    HEXBIN_SY,
    hexbin_density,
    sql_hexbin_center,
)
from workstealing_spatial_join_spark.operators.linesnap import (
    SNAP_RADIUS,
    nearest_segment_join,
)
from workstealing_spatial_join_spark.operators.textops import dup_spans
from workstealing_spatial_join_spark.plans.planner import audit_plan

SX, SY = HEXBIN_SX, HEXBIN_SY


def _hex_bruteforce(mx: int, my: int) -> tuple[int, int]:
    """Nearest center over BOTH full lattices within ±3 pitches (not
    just the engine's one-candidate-per-lattice shortcut); lattice A
    wins exact cross-lattice ties."""
    best = {}
    for lattice, (ox, oy) in (("a", (0, 0)), ("b", (SX, SY))):
        cands = []
        for i in range(mx // (2 * SX) - 3, mx // (2 * SX) + 4):
            for j in range(my // (2 * SY) - 3, my // (2 * SY) + 4):
                cx, cy = 2 * SX * i + ox, 2 * SY * j + oy
                d = (mx - cx) ** 2 * SY * SY + (my - cy) ** 2 * SX * SX
                cands.append((d, cx, cy))
        best[lattice] = min(cands)
    return best["a"][1:] if best["a"][0] <= best["b"][0] else best["b"][1:]


def test_hexbin_matches_full_lattice_voronoi(spark):
    rng = np.random.default_rng(7)
    mx = rng.integers(-180000, 180000, 300)
    my = rng.integers(-90000, 90000, 300)
    # skip axis half-pitch points: there the within-lattice nearest
    # center is ambiguous and the engine's rounding convention (not
    # the Voronoi property) decides — covered by the tie test below
    keep = (mx % SX != 0) & (my % SY != 0)
    pts = [(int(i), int(x), int(y)) for i, (x, y) in
           enumerate(zip(mx[keep], my[keep]))]
    df = spark.createDataFrame(pts, "point_id long, mx long, my long")
    got = {
        r["point_id"]: (r["hx"], r["hy"])
        for r in df.select(
            "point_id",
            F.expr(sql_hexbin_center("mx", "my", "spark")[0]).alias("hx"),
            F.expr(sql_hexbin_center("mx", "my", "spark")[1]).alias("hy"),
        ).collect()
    }
    for pid, x, y in pts:
        assert got[pid] == _hex_bruteforce(x, y), (pid, x, y)


def test_hexbin_boundary_tie_prefers_lattice_a(spark):
    # midpoint between A-center (0,0) and B-center (SX, SY): da == db
    df = spark.createDataFrame(
        [(1, SX // 2, SY // 2)], "point_id long, mx long, my long"
    )
    row = hexbin_density(df).collect()[0]
    assert (row["hx"], row["hy"]) == (0, 0)
    assert row["n_points"] == 1


def test_hexbin_density_plan_zero_python_one_exchange(spark):
    import __spark_entry__ as E

    df = E.queries()["points_hexbin"](spark, "/root/testdata/sf0.001")
    audit = audit_plan(df)
    assert sum(audit["python_nodes"].values()) == 0
    assert audit["exchanges"] == 1  # only the (hx, hy) groupBy


def _true_d2(px, py, x1, y1, x2, y2) -> Fraction:
    dx, dy = x2 - x1, y2 - y1
    len2 = dx * dx + dy * dy
    if len2 == 0:
        return Fraction((px - x1) ** 2 + (py - y1) ** 2)
    t = Fraction((px - x1) * dx + (py - y1) * dy, len2)
    if t <= 0:
        return Fraction((px - x1) ** 2 + (py - y1) ** 2)
    if t >= 1:
        return Fraction((px - x2) ** 2 + (py - y2) ** 2)
    cross = dx * (py - y1) - dy * (px - x1)
    return Fraction(cross * cross, len2)


def _scaled_key(px, py, x1, y1, x2, y2) -> int:
    return int((_true_d2(px, py, x1, y1, x2, y2) * (1 << 20)).__floor__())


SEGS = [
    # seg_id, x1, y1, x2, y2
    (1, 0, 0, 8000, 0),        # horizontal
    (2, 20000, 5000, 20000, 5000),   # degenerate point-segment
    (3, -30000, -30000, -26000, -22000),  # slanted
    (4, 50000, 0, 58000, 0),   # tie partner of 5 (below/above point)
    (5, 50000, 2000, 58000, 2000),
]
POINTS = [
    # point_id, mx, my, expected (seg or None)
    (1, 4000, 1000, 1),        # interior projection
    (2, -2000, 1500, 1),       # beyond endpoint → clamp to (0,0)
    (3, 20100, 4800, 2),       # nearest the degenerate segment
    (4, 54000, 1000, 4),       # EXACT tie between 4 and 5 → lower id
    (5, 4000, SNAP_RADIUS, 1),  # at exactly r → included
    (6, 4000, SNAP_RADIUS + 1, None),  # just beyond r → excluded
    (7, -27000, -25000, 3),    # slanted interior
]


def test_nearest_segment_crafted_exact(spark):
    pts = spark.createDataFrame(
        [(p, x, y) for p, x, y, _ in POINTS],
        "point_id long, mx long, my long",
    )
    segs = spark.createDataFrame(
        SEGS, "seg_id long, x1 long, y1 long, x2 long, y2 long"
    )
    got = {
        r["point_id"]: (r["seg_id"], r["d2_scaled"])
        for r in nearest_segment_join(pts, segs).collect()
    }
    for pid, x, y, want_seg in POINTS:
        if want_seg is None:
            assert pid not in got, pid
            continue
        seg = next(s for s in SEGS if s[0] == want_seg)
        assert got[pid] == (want_seg, _scaled_key(x, y, *seg[1:])), pid
    # the at-radius point sits exactly on the inclusion boundary
    assert got[5][1] == SNAP_RADIUS * SNAP_RADIUS * (1 << 20)


def test_nearest_segment_random_vs_bruteforce(spark):
    rng = np.random.default_rng(11)
    pts = [
        (int(i), int(x), int(y))
        for i, (x, y) in enumerate(
            zip(
                rng.integers(-60000, 60000, 150),
                rng.integers(-60000, 60000, 150),
            )
        )
    ]
    segs = []
    for i in range(40):
        x1 = int(rng.integers(-60000, 60000))
        y1 = int(rng.integers(-60000, 60000))
        segs.append(
            (
                i,
                x1,
                y1,
                x1 + int(rng.integers(-4000, 4001)),
                y1 + int(rng.integers(-4000, 4001)),
            )
        )
    got = {
        r["point_id"]: (r["seg_id"], r["d2_scaled"])
        for r in nearest_segment_join(
            spark.createDataFrame(pts, "point_id long, mx long, my long"),
            spark.createDataFrame(
                segs, "seg_id long, x1 long, y1 long, x2 long, y2 long"
            ),
        ).collect()
    }
    bound = SNAP_RADIUS * SNAP_RADIUS * (1 << 20)
    for pid, px, py in pts:
        keys = sorted(
            (_scaled_key(px, py, *s[1:]), s[0])
            for s in segs
            if _scaled_key(px, py, *s[1:]) <= bound
        )
        if keys:
            assert got[pid] == (keys[0][1], keys[0][0]), pid
        else:
            assert pid not in got, pid


def test_nearest_line_plan_zero_python(spark):
    import __spark_entry__ as E

    df = E.queries()["nearest_line"](spark, "/root/testdata/sf0.001")
    audit = audit_plan(df)
    assert sum(audit["python_nodes"].values()) == 0
    assert (
        audit["broadcast_joins"]
        + audit["sortmerge_joins"]
        + audit["shuffledhash_joins"]
        >= 1
    )


def test_dup_spans_crafted(spark):
    sent = "the quick brown fox jumps over the lazy dog again and again x"
    assert len(sent) >= 60
    rows = [
        # doc 1 and 2: identical text → every window collides
        (1, sent + " tail one padding padding padding"),
        (2, sent + " tail one padding padding padding"),
        # doc 3: the shared sentence at a stride-congruent offset
        # (20 chars of prefix) → its grid-aligned windows collide
        (3, "x" * 20 + sent + " different tail entirely here"),
        # doc 4: unique content, long enough to window
        (4, "completely unrelated content that shares no span with any "
            "other document in this corpus at all, guaranteed unique"),
        # doc 5: too short to produce any window
        (5, "short"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["span_hash"]: (r["n_docs"], r["n_occ"])
           for r in dup_spans(df).collect()}
    # python reference
    ref: dict[str, set[int]] = {}
    occ: dict[str, int] = {}
    import hashlib

    for doc_id, text in rows:
        if len(text) < 60:
            continue
        for pos in range(0, len(text) - 59, 20):
            h = hashlib.md5(text[pos : pos + 60].encode()).hexdigest()
            ref.setdefault(h, set()).add(doc_id)
            occ[h] = occ.get(h, 0) + 1
    want = {
        h: (len(docs), occ[h]) for h, docs in ref.items() if len(docs) >= 2
    }
    assert out == want
    assert want  # non-degenerate: the crafted corpus HAS shared spans
    # doc 1+2's first window is shared by doc 3 (offset 20 ≡ 0 mod 20)
    h0 = hashlib.md5(sent[:60].encode()).hexdigest()
    assert out[h0][0] == 3


def test_dup_spans_plan_zero_python(spark):
    import __spark_entry__ as E

    df = E.queries()["doc_dup_spans"](spark, "/root/testdata/sf0.001")
    audit = audit_plan(df)
    assert sum(audit["python_nodes"].values()) == 0
