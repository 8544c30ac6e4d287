"""Round-5 batch 15: regularized IDW surface, CDC snapshot diff,
and FocalSum map algebra."""

from __future__ import annotations

from workstealing_spatial_join_spark.operators.areal import (
    IDW_EPS2,
    IDW_W_SCALE,
    idw_surface,
)
from workstealing_spatial_join_spark.operators.snapshot import (
    snapshot_diff,
)
from workstealing_spatial_join_spark.operators.tiles import focal_sum
from workstealing_spatial_join_spark.plans.planner import audit_plan


def _idw_ref(points, cell, radius):
    half = cell // 2
    acc: dict[tuple[int, int], list] = {}
    for mx, my, v in points:
        cx, cy = mx // cell, my // cell
        for nx in range(cx - radius, cx + radius + 1):
            for ny in range(cy - radius, cy + radius + 1):
                d2 = (mx - (nx * cell + half)) ** 2 + (
                    my - (ny * cell + half)
                ) ** 2
                w = IDW_W_SCALE // (IDW_EPS2 + d2)
                a = acc.setdefault((nx, ny), [0, 0, 0])
                a[0] += 1
                a[1] += w * v
                a[2] += w
    out = {}
    for node, (n, wsum, wtot) in acc.items():
        if wtot > 0:
            # python // IS floor division — the reference semantics
            out[node] = (n, wsum // wtot)
    return out


IDW_PTS = [
    # one point exactly at a node center: weight capped by ε²
    (4096 + 2048, 4096 + 2048, 1000),  # hmm cell=4096 → center 2048
    (100, 100, -500),                  # negative measure
    (-5000, -5000, 250),               # negative coords
    (4000, 4000, 80_000),
    (4001, 4000, -80_000),             # near-twin with opposite sign
]


def test_idw_matches_python_reference(spark):
    cell, radius = 4096, 1
    df = spark.createDataFrame(IDW_PTS, "mx long, my long, cents long")
    got = {
        (r["nx"], r["ny"]): (r["n_pts"], r["idw_value"])
        for r in idw_surface(df, cell=cell, radius=radius).collect()
    }
    assert got == _idw_ref(IDW_PTS, cell, radius)
    # negative-measure nodes exist (sign-portable floor exercised)
    assert any(v[1] < 0 for v in got.values())


def test_idw_exact_at_node_center(spark):
    """A single point AT a node center dominates: idw == its value
    (floor makes it exact when it's the only contributor)."""
    cell = 4096
    pts = [(2048, 2048, 777)]
    df = spark.createDataFrame(pts, "mx long, my long, cents long")
    got = {
        (r["nx"], r["ny"]): r["idw_value"]
        for r in idw_surface(df, cell=cell).collect()
    }
    assert got[(0, 0)] == 777


def test_idw_plan_zero_python_no_join(spark):
    import __spark_entry__ as E

    df = E.queries()["idw_surface"](spark, "/root/testdata/sf0.001")
    audit = audit_plan(df)
    assert sum(audit["python_nodes"].values()) == 0
    assert (
        audit["broadcast_joins"]
        + audit["sortmerge_joins"]
        + audit["shuffledhash_joins"]
        == 0
    )


def test_snapshot_diff_classification(spark):
    old = spark.createDataFrame(
        [
            (1, 10, "A"),   # unchanged
            (2, 20, "B"),   # payload change → update
            (3, 30, "C"),   # absent in new → delete
            (4, None, "D"),  # NULL payload, unchanged (null-safe eq)
            (5, None, "E"),  # NULL → value = update
        ],
        "k long, v int, s string",
    )
    new = spark.createDataFrame(
        [
            (1, 10, "A"),
            (2, 21, "B"),
            (4, None, "D"),
            (5, 55, "E"),
            (6, 60, "F"),   # new key → insert
        ],
        "k long, v int, s string",
    )
    got = {
        r["k"]: r["change"]
        for r in snapshot_diff(old, new, "k", ["v", "s"]).collect()
    }
    assert got == {2: "update", 3: "delete", 5: "update", 6: "insert"}


def test_snapshot_diff_counts_consistent(spark):
    """On the driver fixture the congruence classes predict the
    counts: every surviving key ≡3 (mod 13) is an update, every key
    ≡0 (mod 97) a delete, every key ≡7 (mod 31) an insert."""
    import __spark_entry__ as E
    from workstealing_spatial_join_spark.sources import tables as TB

    sf = "/root/testdata/sf0.001"
    rows = E.q_snapshot_diff(spark, sf).collect()
    got = {}
    for r in rows:
        got.setdefault(r["change"], set()).add(r["o_orderkey"])
    keys = [
        r["o_orderkey"]
        for r in TB.load(spark, sf, "orders").select("o_orderkey").collect()
    ]
    want_del = {k for k in keys if k % E.SNAP_DEL_MOD == 0}
    want_upd = {
        k
        for k in keys
        if k % E.SNAP_UPD_MOD == 3 and k % E.SNAP_DEL_MOD != 0
    }
    want_ins = {
        k + E.SNAP_INS_OFFSET for k in keys if k % E.SNAP_INS_MOD == 7
    }
    assert got.get("delete", set()) == want_del
    assert got.get("update", set()) == want_upd
    assert got.get("insert", set()) == want_ins


def _focal_ref(points, cell, radius):
    from collections import Counter

    counts = Counter((mx // cell, my // cell) for mx, my in points)
    out: dict[tuple[int, int], list] = {}
    for (cx, cy), n in counts.items():
        for tx in range(cx - radius, cx + radius + 1):
            for ty in range(cy - radius, cy + radius + 1):
                a = out.setdefault((tx, ty), [0, 0])
                a[1] += n
                if (tx, ty) == (cx, cy):
                    a[0] += n
    return {k: tuple(v) for k, v in out.items()}


def test_focal_matches_python_reference(spark):
    cell = 1000
    pts = [
        (10, 10), (20, 20), (999, 999),      # all in cell (0,0)
        (1500, 500),                          # cell (1,0)
        (-1, -1),                             # cell (-1,-1)
        (5000, 5000),                         # isolated
    ]
    df = spark.createDataFrame(pts, "mx long, my long")
    got = {
        (r["tx"], r["ty"]): (r["own_n"], r["focal_n"])
        for r in focal_sum(df, cell=cell).collect()
    }
    ref = _focal_ref(pts, cell, 1)
    assert got == ref
    # dilated-support convention: cell (0,1) is empty but borders
    # (0,0) and (1,0) → own 0, focal 4
    assert got[(0, 1)] == (0, 4)
    # the occupied center sees its own 3 + neighbors (1,0) and (-1,-1)
    assert got[(0, 0)] == (3, 5)


def test_focal_plan_zero_python_two_exchanges(spark):
    import __spark_entry__ as E

    df = E.queries()["focal_density"](spark, "/root/testdata/sf0.001")
    audit = audit_plan(df)
    assert sum(audit["python_nodes"].values()) == 0
    # count-per-cell exchange + focal-target exchange, nothing else
    assert audit["exchanges"] == 2
