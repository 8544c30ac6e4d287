"""Round-5 batch 16: segment×segment intersection join, exact
triangle counting on the occupied-cell graph, TPC-H Q4 shape."""

from __future__ import annotations

import itertools

from workstealing_spatial_join_spark.operators.graph import (
    occupied_cell_edges,
    triangle_counts,
)
from workstealing_spatial_join_spark.operators.segjoin import (
    segment_intersection_join,
    sql_segment_intersections,
)
from workstealing_spatial_join_spark.plans.planner import audit_plan

# ------------------------------------------------------- seg join


def _cross(p, q, r):
    return (q[0] - p[0]) * (r[1] - p[1]) - (q[1] - p[1]) * (r[0] - p[0])


def _on(p, a, b):
    return (
        min(a[0], b[0]) <= p[0] <= max(a[0], b[0])
        and min(a[1], b[1]) <= p[1] <= max(a[1], b[1])
    )


def _seg_kind(a1, a2, b1, b2):
    """Independent python reference: 'proper' / 'touch' / None."""
    d1 = _cross(a1, a2, b1)
    d2 = _cross(a1, a2, b2)
    d3 = _cross(b1, b2, a1)
    d4 = _cross(b1, b2, a2)
    if ((d1 > 0 and d2 < 0) or (d1 < 0 and d2 > 0)) and (
        (d3 > 0 and d4 < 0) or (d3 < 0 and d4 > 0)
    ):
        return "proper"
    if (
        (d1 == 0 and _on(b1, a1, a2))
        or (d2 == 0 and _on(b2, a1, a2))
        or (d3 == 0 and _on(a1, b1, b2))
        or (d4 == 0 and _on(a2, b1, b2))
    ):
        return "touch"
    return None


def _ref_pairs(segs):
    out = set()
    for (ia, ax1, ay1, ax2, ay2), (ib, bx1, by1, bx2, by2) in (
        itertools.combinations(segs, 2)
    ):
        k = _seg_kind((ax1, ay1), (ax2, ay2), (bx1, by1), (bx2, by2))
        if k:
            a, b = (ia, ib) if ia < ib else (ib, ia)
            out.add((a, b, k))
    return out


CRAFTED_SEGS = [
    # X crossing
    (1, 0, 0, 100, 100),
    (2, 0, 100, 100, 0),
    # T touch: endpoint of 4 on the interior of 3
    (3, 200, 0, 300, 0),
    (4, 250, 0, 250, 50),
    # shared endpoint
    (5, 400, 0, 500, 0),
    (6, 500, 0, 600, 50),
    # collinear overlap
    (7, 700, 0, 800, 0),
    (8, 750, 0, 900, 0),
    # collinear disjoint (bboxes don't even overlap)
    (9, 0, 200, 100, 200),
    (10, 200, 200, 300, 200),
    # parallel near-miss (bboxes overlap, no intersection)
    (11, 0, 500, 100, 500),
    (12, 0, 501, 100, 501),
    # degenerate point ON a segment
    (13, 0, 700, 100, 700),
    (14, 50, 700, 50, 700),
    # degenerate point NEAR a diagonal but off it (d3 = 0 by B1=B2,
    # but neither endpoint of 15 sits inside the point's bbox)
    (15, 0, 750, 100, 850),
    (16, 10, 765, 10, 765),
    # crossing pair whose bboxes each span 2×2 cells around the
    # (1024, 1024) cell corner — all 4 cells are shared, so the
    # reference-point rule must emit the pair EXACTLY once
    (17, 1000, 1000, 1048, 1048),
    (18, 1000, 1048, 1048, 1000),
]


def _expected_crafted():
    return _ref_pairs(CRAFTED_SEGS)


def test_crafted_reference_covers_all_kinds():
    exp = _expected_crafted()
    kinds = {k for (_, _, k) in exp}
    assert kinds == {"proper", "touch"}
    assert (1, 2, "proper") in exp
    assert (3, 4, "touch") in exp
    assert (5, 6, "touch") in exp
    assert (7, 8, "touch") in exp
    assert (13, 14, "touch") in exp
    assert (17, 18, "proper") in exp
    ids = {i for (i, j, _) in exp} | {j for (_, j, _) in exp}
    assert not {9, 10, 11, 12, 15, 16} & ids


def test_seg_join_matches_python_reference(spark):
    df = spark.createDataFrame(
        CRAFTED_SEGS, "seg_id long, x1 long, y1 long, x2 long, y2 long"
    )
    got = {
        (r["seg_a"], r["seg_b"], r["kind"])
        for r in segment_intersection_join(df, cell=1024).collect()
    }
    assert got == _expected_crafted()


def test_seg_join_refpoint_emits_multi_cell_pair_once(spark):
    df = spark.createDataFrame(
        [s for s in CRAFTED_SEGS if s[0] in (17, 18)],
        "seg_id long, x1 long, y1 long, x2 long, y2 long",
    )
    rows = segment_intersection_join(df, cell=1024).collect()
    assert len(rows) == 1  # 4 shared cells, exactly one emission


def test_seg_join_duckdb_twin_on_crafted(spark):
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE segs (seg_id BIGINT, x1 BIGINT, y1 BIGINT, "
        "x2 BIGINT, y2 BIGINT)"
    )
    con.executemany(
        "INSERT INTO segs VALUES (?, ?, ?, ?, ?)", CRAFTED_SEGS
    )
    got = {
        tuple(r)
        for r in con.execute(
            sql_segment_intersections("SELECT * FROM segs")
        ).fetchall()
    }
    assert got == _expected_crafted()


def test_seg_join_random_property(spark):
    import random

    rng = random.Random(160)
    segs = []
    for i in range(1, 61):
        x1, y1 = rng.randrange(0, 3000), rng.randrange(0, 3000)
        segs.append(
            (
                i,
                x1,
                y1,
                x1 + rng.randrange(-900, 901),
                y1 + rng.randrange(-900, 901),
            )
        )
    df = spark.createDataFrame(
        segs, "seg_id long, x1 long, y1 long, x2 long, y2 long"
    )
    got = {
        (r["seg_a"], r["seg_b"], r["kind"])
        for r in segment_intersection_join(df, cell=1024).collect()
    }
    assert got == _ref_pairs(segs)


def test_seg_join_plan_pure_catalyst(spark):
    import __spark_entry__ as E

    df = E.queries()["seg_intersections"](spark, "/root/testdata/sf0.001")
    audit = audit_plan(df)
    assert sum(audit["python_nodes"].values()) == 0
    assert (
        audit["broadcast_joins"]
        + audit["sortmerge_joins"]
        + audit["shuffledhash_joins"]
        == 1
    )


# ------------------------------------------------------ triangles


def _tri_ref(points, cell=8192):
    cells = {(x // cell, y // cell) for x, y in points}
    adj = {
        (a, b)
        for a in cells
        for b in cells
        if a != b and abs(a[0] - b[0]) <= 1 and abs(a[1] - b[1]) <= 1
    }
    counts: dict[tuple[int, int], int] = {}
    for u, v, w in itertools.combinations(sorted(cells), 3):
        if (u, v) in adj and (v, w) in adj and (u, w) in adj:
            for n in (u, v, w):
                counts[n] = counts.get(n, 0) + 1
    return counts


def test_triangles_k4_block(spark):
    pts = [(0, 0), (8192, 0), (0, 8192), (8192, 8192)]
    df = spark.createDataFrame(pts, "mx long, my long")
    got = {
        (r["cx"], r["cy"]): r["n_triangles"]
        for r in triangle_counts(occupied_cell_edges(df)).collect()
    }
    # K4: C(4,3)=4 triangles; every node is in exactly 3
    assert got == {(0, 0): 3, (1, 0): 3, (0, 1): 3, (1, 1): 3}


def test_triangles_random_matches_python_reference(spark):
    import random

    rng = random.Random(161)
    pts = [
        (rng.randrange(0, 50_000), rng.randrange(0, 50_000))
        for _ in range(40)
    ]
    df = spark.createDataFrame(pts, "mx long, my long")
    got = {
        (r["cx"], r["cy"]): r["n_triangles"]
        for r in triangle_counts(occupied_cell_edges(df)).collect()
    }
    assert got == _tri_ref(pts)


def test_triangles_plan_zero_python(spark):
    import __spark_entry__ as E

    df = E.queries()["cell_triangles"](spark, "/root/testdata/sf0.001")
    assert sum(audit_plan(df)["python_nodes"].values()) == 0


# ------------------------------------------------------------- q4


def test_q4_late_shipment_boundary(spark, monkeypatch):
    import datetime as dt

    import __spark_entry__ as E
    from workstealing_spatial_join_spark.sources import tables as TB

    d0 = dt.datetime(1996, 2, 1)
    orders = spark.createDataFrame(
        [
            (1, d0, "1-URGENT"),   # shipped exactly +30d: NOT late
            (2, d0, "1-URGENT"),   # shipped +31d: late
            (3, d0, "2-HIGH"),     # two late items: counted ONCE
            (4, dt.datetime(1995, 12, 31), "2-HIGH"),  # outside window
        ],
        "o_orderkey long, o_orderdate timestamp, o_orderpriority string",
    )
    li = spark.createDataFrame(
        [
            (1, d0 + dt.timedelta(days=30)),
            (2, d0 + dt.timedelta(days=31)),
            (3, d0 + dt.timedelta(days=40)),
            (3, d0 + dt.timedelta(days=50)),
            (4, d0 + dt.timedelta(days=90)),
        ],
        "l_orderkey long, l_shipdate timestamp",
    )
    frames = {"orders": orders, "lineitem": li}
    monkeypatch.setattr(TB, "load", lambda sp, sf, t: frames[t])
    rows = {
        r["o_orderpriority"]: r["order_count"]
        for r in E.q_q4_order_priority(spark, "ignored").collect()
    }
    assert rows == {"1-URGENT": 1, "2-HIGH": 1}


def test_q4_plan_zero_python(spark):
    import __spark_entry__ as E

    df = E.queries()["q4_order_priority"](spark, "/root/testdata/sf0.001")
    assert sum(audit_plan(df)["python_nodes"].values()) == 0
