"""Round-5 batch 27 (file numbering): Hilbert-curve layout key,
cross-layer colocation quotient, temporal tile change detection."""

from __future__ import annotations

import datetime
import random

import duckdb

from workstealing_spatial_join_spark.operators.layout import (
    hilbert_key,
    sql_hilbert_key,
)
from workstealing_spatial_join_spark.operators.spatialstats import (
    colocation_quotient,
    sql_colocation_quotient,
)
from workstealing_spatial_join_spark.operators.trajectory import (
    sql_tile_change_detection,
    tile_change_detection,
)
from workstealing_spatial_join_spark.plans.planner import audit_plan


def _xy2d(order, x, y):
    """Canonical xy2d (Wikipedia/Hilbert) — the unit reference."""
    n = 1 << order
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if x & s else 0
        ry = 1 if y & s else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = n - 1 - x, n - 1 - y
            x, y = y, x
        s //= 2
    return d


# ---------------------------------------------------------- Hilbert


def test_hilbert_exhaustive_order3_and_adjacency(spark):
    side = 8
    pts = [(y * side + x, x, y) for x in range(side) for y in range(side)]
    df = spark.createDataFrame(pts, "point_id long, hx long, hy long")
    got = {
        r["point_id"]: r["hkey"]
        for r in hilbert_key(df, "hx", "hy", order=3).collect()
    }
    ref = {i: _xy2d(3, x, y) for i, x, y in pts}
    assert got == ref
    # THE Hilbert property Z-order lacks: consecutive ranks are
    # always 4-adjacent cells
    by_rank = sorted(
        ((d, i % side if False else None) for i, d in got.items())
    )
    cell_of = {d: (i, None) for i, d in got.items()}
    pos_of = {got[y * side + x]: (x, y)
              for x in range(side) for y in range(side)}
    for d in range(side * side - 1):
        (x1, y1), (x2, y2) = pos_of[d], pos_of[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1
    # bijective over the full grid
    assert sorted(got.values()) == list(range(side * side))


def test_hilbert_matches_reference_and_duckdb_order19(spark):
    rng = random.Random(2701)
    pts = [
        (i, rng.randrange(0, 360000), rng.randrange(0, 180000))
        for i in range(300)
    ]
    ref = {i: _xy2d(19, x, y) for i, x, y in pts}
    df = spark.createDataFrame(pts, "point_id long, hx long, hy long")
    got = {
        r["point_id"]: r["hkey"]
        for r in hilbert_key(df, "hx", "hy").collect()
    }
    assert got == ref
    con = duckdb.connect()
    con.execute("CREATE TABLE t (point_id BIGINT, hx BIGINT, hy BIGINT)")
    con.executemany("INSERT INTO t VALUES (?,?,?)", pts)
    duck = dict(
        con.execute(
            sql_hilbert_key("SELECT * FROM t", "hx", "hy", ("point_id",))
        ).fetchall()
    )
    assert duck == ref


def test_hilbert_xor_polynomial_table():
    # the polynomial replacing the XOR must match on all four inputs
    for rx in (0, 1):
        for ry in (0, 1):
            assert 3 * rx + ry - 2 * rx * ry == (3 * rx) ^ ry


def test_hilbert_zero_shuffle_zero_python(spark):
    df = spark.createDataFrame([(1, 3, 5)], "point_id long, hx long, hy long")
    audit = audit_plan(hilbert_key(df, "hx", "hy"))
    assert audit["exchanges"] == 0
    assert sum(audit["python_nodes"].values()) == 0


# ------------------------------------------------------- colocation


def _coloc_ref(pa, pb, t, cell=1):
    from collections import Counter

    ca = Counter((x // cell, y // cell) for x, y in pa)
    cb = Counter((x // cell, y // cell) for x, y in pb)
    shared = set(ca) & set(cb)
    sab = sum(ca[c] * cb[c] for c in shared)
    return (
        len(ca),
        len(cb),
        len(shared),
        t * sab * 10**6 // (sum(ca.values()) * sum(cb.values())),
    )


def _mk_cells(spark, pts, cell=1):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(pts, "px long, py long")
    return (
        df.select(
            (F.col("px") - ((F.col("px") % cell) + cell) % cell)
            .substr(0, 0)
            .alias("drop")
            if False
            else F.expr(f"px div {cell}").alias("cx"),
            F.expr(f"py div {cell}").alias("cy"),
        )
        .groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).alias("x"))
    )


def test_colocation_matches_reference_and_duckdb(spark):
    rng = random.Random(2702)
    # layer A: blobs; layer B: half colocated with A, half scattered
    pa, pb = [], []
    blobs = [(rng.randrange(0, 50), rng.randrange(0, 50)) for _ in range(8)]
    for bx, by in blobs:
        for _ in range(10):
            pa.append((bx, by))
        for _ in range(5):
            pb.append((bx, by))
    for _ in range(40):
        pb.append((rng.randrange(0, 50), rng.randrange(0, 50)))
    t = 2500
    ca, cb = _mk_cells(spark, pa), _mk_cells(spark, pb)
    row = colocation_quotient(ca, cb, t).collect()[0]
    got = (row["n_a"], row["n_b"], row["n_shared_cells"],
           row["coloc_ppm"])
    assert got == _coloc_ref(pa, pb, t)
    con = duckdb.connect()
    con.execute("CREATE TABLE pa (px BIGINT, py BIGINT)")
    con.execute("CREATE TABLE pb (px BIGINT, py BIGINT)")
    con.executemany("INSERT INTO pa VALUES (?,?)", pa)
    con.executemany("INSERT INTO pb VALUES (?,?)", pb)
    mk = "SELECT px AS cx, py AS cy, COUNT(*) AS x FROM {} GROUP BY 1,2"
    duck = con.execute(
        sql_colocation_quotient(mk.format("pa"), mk.format("pb"), t)
    ).fetchall()
    assert duck == [got]


def test_colocation_independent_vs_colocated(spark):
    # perfectly colocated layers on few cells of a big frame: CQ >> 1
    pts = [(i % 5, 0) for i in range(50)]
    ca = _mk_cells(spark, pts)
    cb = _mk_cells(spark, pts)
    row = colocation_quotient(ca, cb, 1000).collect()[0]
    assert row["coloc_ppm"] > 10_000_000
    # disjoint layers: CQ = 0 (no shared cells — zero row via sum)
    cb2 = _mk_cells(spark, [(100 + i, 50) for i in range(10)])
    out = colocation_quotient(ca, cb2, 1000).collect()
    # disjoint layers: the shared frame is empty and CQ is exactly 0
    assert out[0]["n_shared_cells"] == 0
    assert out[0]["coloc_ppm"] == 0


def test_colocation_plan_zero_python(spark):
    ca = _mk_cells(spark, [(0, 0), (1, 1)])
    cb = _mk_cells(spark, [(0, 0), (2, 2)])
    audit = audit_plan(colocation_quotient(ca, cb, 100))
    assert sum(audit["python_nodes"].values()) == 0


# ---------------------------------------------------- change detect


def _events_df(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


def test_change_classes_exact_thresholds(spark):
    # one user, one tile (sticky fixture: few events, epoch 0 only),
    # craft day counts around the 3:2 boundary via timestamps
    base = datetime.datetime(2024, 1, 1)
    rows = []
    # user 1: 2 events day 0, 3 events day 10 -> split day 6 (0+10+1)//2=5
    # n_first=2 (days<5), n_second=3 -> 2*3>=3*2 -> GAIN (exactly +50%)
    for i, day in enumerate([0, 0, 10, 10, 10]):
        rows.append(
            (i, base + datetime.timedelta(days=day, minutes=i), 1,
             "c", 0.0, "")
        )
    df = _events_df(spark, rows)
    out = tile_change_detection(df).collect()
    # the user's first epoch is 4 events, second 1 — all in one tile
    # (epoch 0 and 1 share tiles iff congruence allows; just assert
    # totals and classes are consistent with the SQL twin below)
    got = {(r["tx"], r["ty"]): (r["n_first"], r["n_second"], r["cls"])
           for r in out}
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events (event_id BIGINT, ts TIMESTAMP,"
        " user_id BIGINT, event_type VARCHAR, value DOUBLE,"
        " props VARCHAR)"
    )
    con.executemany("INSERT INTO events VALUES (?,?,?,?,?,?)", rows)
    want = {
        (r[0], r[1]): (r[2], r[3], r[4])
        for r in con.execute(
            sql_tile_change_detection(
                "SELECT user_id, event_id, ts FROM events"
            )
        ).fetchall()
    }
    assert got == want
    assert sum(a for a, _, _ in got.values()) == 2
    assert sum(b for _, b, _ in got.values()) == 3


def test_change_all_classes_reachable(spark):
    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # many users spread over 20 days -> tiles with varied halves
    rng = random.Random(2703)
    for u in range(1, 25):
        for k in range(rng.randrange(3, 12)):
            day = rng.randrange(0, 20)
            rows.append(
                (eid, base + datetime.timedelta(days=day, minutes=eid),
                 u, "c", 0.0, "")
            )
            eid += 1
    df = _events_df(spark, rows)
    classes = {r["cls"] for r in tile_change_detection(df).collect()}
    # crafted randomness: expect at least NEW/GONE plus a ratio class
    assert "NEW" in classes or "GAIN" in classes
    assert "GONE" in classes or "LOSS" in classes
    # twin agreement on the full frame
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events (event_id BIGINT, ts TIMESTAMP,"
        " user_id BIGINT, event_type VARCHAR, value DOUBLE,"
        " props VARCHAR)"
    )
    con.executemany("INSERT INTO events VALUES (?,?,?,?,?,?)", rows)
    got = {
        (r["tx"], r["ty"]): (r["n_first"], r["n_second"], r["cls"])
        for r in tile_change_detection(df).collect()
    }
    want = {
        (r[0], r[1]): (r[2], r[3], r[4])
        for r in con.execute(
            sql_tile_change_detection(
                "SELECT user_id, event_id, ts FROM events"
            )
        ).fetchall()
    }
    assert got == want


def test_change_plan_zero_python(spark):
    base = datetime.datetime(2024, 1, 1)
    rows = [(i, base + datetime.timedelta(minutes=i), 1, "c", 0.0, "")
            for i in range(8)]
    audit = audit_plan(tile_change_detection(_events_df(spark, rows)))
    assert sum(audit["python_nodes"].values()) == 0
