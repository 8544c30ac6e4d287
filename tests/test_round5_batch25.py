"""Round-5 batch 25: Geary's C, binary join counts, Getis–Ord local
hot-spot ratio — the spatial-autocorrelation family closeout."""

from __future__ import annotations

import random

import duckdb

from workstealing_spatial_join_spark.operators.spatialstats import (
    geary_c,
    getis_local,
    join_count_stats,
    sql_geary_c,
    sql_getis_local,
    sql_join_count_stats,
)
from workstealing_spatial_join_spark.plans.planner import audit_plan

CELL = 8192


def _cells_of(points, cell=CELL):
    counts: dict[tuple[int, int], int] = {}
    for x, y in points:
        k = (x // cell, y // cell)
        counts[k] = counts.get(k, 0) + 1
    return counts


def _geary_ref(points, cell=CELL):
    counts = _cells_of(points, cell)
    cells = sorted(counts)
    n = len(cells)
    s = sum(counts.values())
    z = {c: n * counts[c] - s for c in cells}
    num = 0
    w = 0
    for a in cells:
        for b in cells:
            if a != b and abs(a[0] - b[0]) <= 1 and abs(a[1] - b[1]) <= 1:
                num += (z[a] - z[b]) ** 2
                w += 1
    den = sum(v * v for v in z.values())
    return n, w, ((n - 1) * num * 10**6) // (2 * w * den)


def _join_counts_ref(points, threshold, cell=CELL):
    counts = _cells_of(points, cell)
    b = {c: 1 if v >= threshold else 0 for c, v in counts.items()}
    cells = sorted(b)
    n_b = sum(b.values())
    n_w = len(cells) - n_b
    bb = bw = ww = 0
    for i, a in enumerate(cells):
        for c in cells[i + 1:]:
            if abs(a[0] - c[0]) <= 1 and abs(a[1] - c[1]) <= 1:
                if b[a] and b[c]:
                    bb += 1
                elif not b[a] and not b[c]:
                    ww += 1
                else:
                    bw += 1
    return n_b, n_w, bb, bw, ww


def _getis_ref(points, cell=CELL):
    counts = _cells_of(points, cell)
    cells = sorted(counts)
    n = len(cells)
    s = sum(counts.values())
    out = {}
    for c in cells:
        win = [
            counts[d]
            for d in cells
            if abs(d[0] - c[0]) <= 1 and abs(d[1] - c[1]) <= 1
        ]
        ls, nw = sum(win), len(win)
        out[c] = (ls, nw, (ls * n * 10**6) // (nw * s))
    return out


def _random_points(seed, n=300):
    rng = random.Random(seed)
    pts = []
    while len(pts) < n:
        # mix of hot blobs and scatter so every class pair exists
        if rng.random() < 0.5:
            bx, by = rng.randrange(-5, 6), rng.randrange(-5, 6)
            for _ in range(rng.randrange(2, 8)):
                pts.append(
                    (
                        bx * CELL + rng.randrange(CELL),
                        by * CELL + rng.randrange(CELL),
                    )
                )
        else:
            pts.append(
                (rng.randrange(-40 * CELL, 40 * CELL),
                 rng.randrange(-40 * CELL, 40 * CELL))
            )
    return pts[:n]


def _duck(points, sql):
    con = duckdb.connect()
    con.execute("CREATE TABLE pts_t (mx BIGINT, my BIGINT)")
    con.executemany("INSERT INTO pts_t VALUES (?, ?)", points)
    return con.execute(sql("SELECT mx, my FROM pts_t")).fetchall()


# -------------------------------------------------------- Geary's C


def test_geary_matches_python_reference_and_duckdb(spark):
    pts = _random_points(2501)
    df = spark.createDataFrame(pts, "mx long, my long")
    row = geary_c(df).collect()[0]
    got = (row["n_cells"], row["w_edges"], row["c_ppm"])
    assert got == _geary_ref(pts)
    assert _duck(pts, sql_geary_c) == [got]


def test_geary_clustered_below_one_dispersed_above(spark):
    # clustered: smooth 3-wide plateau of heavy cells inside scatter
    clustered = []
    for ox in range(3):
        for oy in range(3):
            clustered += [(ox * CELL + 5, oy * CELL + 5)] * 6
    for i in range(12):
        clustered.append(((10 + 3 * i) * CELL + 5, (20 + 2 * i) * CELL))
    row = geary_c(
        spark.createDataFrame(clustered, "mx long, my long")
    ).collect()[0]
    assert row["c_ppm"] < 1_000_000
    # dispersed: checkerboard of heavy/light — contrasts maximal
    dispersed = []
    for ox in range(6):
        for oy in range(6):
            reps = 8 if (ox + oy) % 2 == 0 else 1
            dispersed += [(ox * CELL + 5, oy * CELL + 5)] * reps
    row = geary_c(
        spark.createDataFrame(dispersed, "mx long, my long")
    ).collect()[0]
    assert row["c_ppm"] > 1_000_000


def test_geary_plan_zero_python(spark):
    df = spark.createDataFrame([(0, 0), (9000, 9000)], "mx long, my long")
    audit = audit_plan(geary_c(df))
    assert sum(audit["python_nodes"].values()) == 0


# ------------------------------------------------------ join counts


def test_join_counts_crafted_raster(spark):
    # B-B pair, B-W pairs, W-W pair, plus an isolated W
    pts = (
        [(0, 0)] * 3                      # B at (0,0)
        + [(CELL, 0)] * 4                 # B at (1,0)   -> BB edge
        + [(2 * CELL, 0)]                 # W at (2,0)   -> BW edge
        + [(3 * CELL, 0)]                 # W at (3,0)   -> WW edge
        + [(50 * CELL, 50 * CELL)]        # isolated W — no edges
    )
    df = spark.createDataFrame(pts, "mx long, my long")
    row = join_count_stats(df, 3).collect()[0]
    got = (row["n_b"], row["n_w"], row["bb"], row["bw"], row["ww"])
    assert got == (2, 3, 1, 1, 1)
    assert got == _join_counts_ref(pts, 3)


def test_join_counts_matches_reference_and_duckdb(spark):
    pts = _random_points(2502)
    df = spark.createDataFrame(pts, "mx long, my long")
    row = join_count_stats(df, 3).collect()[0]
    got = (row["n_b"], row["n_w"], row["bb"], row["bw"], row["ww"])
    assert got == _join_counts_ref(pts, 3)
    assert _duck(pts, lambda s: sql_join_count_stats(s, 3)) == [got]
    # every adjacency accounted for exactly once
    edges = 0
    cells = sorted(_cells_of(pts))
    for i, a in enumerate(cells):
        for b in cells[i + 1:]:
            if abs(a[0] - b[0]) <= 1 and abs(a[1] - b[1]) <= 1:
                edges += 1
    assert row["bb"] + row["bw"] + row["ww"] == edges


def test_join_counts_plan_zero_python(spark):
    df = spark.createDataFrame([(0, 0), (9000, 9000)], "mx long, my long")
    audit = audit_plan(join_count_stats(df, 3))
    assert sum(audit["python_nodes"].values()) == 0


# -------------------------------------------------- Getis–Ord local


def test_getis_matches_python_reference_and_duckdb(spark):
    pts = _random_points(2503)
    df = spark.createDataFrame(pts, "mx long, my long")
    got = {
        (r["cx"], r["cy"]): (r["local_sum"], r["n_window"], r["gi_ppm"])
        for r in getis_local(df).collect()
    }
    assert got == _getis_ref(pts)
    duck = {
        (r[0], r[1]): (r[2], r[3], r[4])
        for r in _duck(pts, sql_getis_local)
    }
    assert duck == got


def test_getis_hot_center_cold_fringe(spark):
    # heavy 3x3 block; every cell of it sees a hot window, the far
    # scatter cells land below 10^6
    pts = []
    for ox in range(3):
        for oy in range(3):
            pts += [(ox * CELL + 5, oy * CELL + 5)] * 9
    scatter = [(30 + 7 * i, 60 + 11 * i) for i in range(10)]
    for i, (sx, sy) in enumerate(scatter):
        pts.append((sx * CELL + 5, sy * CELL + 5))
    df = spark.createDataFrame(pts, "mx long, my long")
    rows = {(r["cx"], r["cy"]): r["gi_ppm"] for r in getis_local(df).collect()}
    assert rows[(1, 1)] > 1_000_000           # center of the block
    for sx, sy in scatter:
        assert rows[(sx, sy)] < 1_000_000     # isolated singletons
    # the isolated windows are self-only
    got = {
        (r["cx"], r["cy"]): r["n_window"]
        for r in getis_local(df).collect()
    }
    assert got[(scatter[0][0], scatter[0][1])] == 1
    assert got[(1, 1)] == 9


def test_getis_plan_zero_python_no_extra_exchange(spark):
    df = spark.createDataFrame([(0, 0), (9000, 9000)], "mx long, my long")
    audit = audit_plan(getis_local(df))
    assert sum(audit["python_nodes"].values()) == 0
