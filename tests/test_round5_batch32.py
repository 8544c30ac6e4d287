"""Round-5 batch 32: bivariate cross-K ladder, raster clumps
(RegionGroup), tile×hour Pearson-residual temporal anomaly screen."""

from __future__ import annotations

import datetime
import random
from collections import Counter, defaultdict
from fractions import Fraction

import duckdb

from workstealing_spatial_join_spark.operators.graph import GRID_GRAPH_CELL
from workstealing_spatial_join_spark.operators.spatialstats import (
    cross_pair_ladder,
    raster_clumps,
    sql_cross_pair_ladder,
    sql_raster_clumps,
)
from workstealing_spatial_join_spark.operators.trajectory import (
    sql_tile_hour_residuals,
    sticky_positions,
    tile_hour_residuals,
)
from workstealing_spatial_join_spark.plans.planner import audit_plan

RUNGS = (500, 1000, 2000, 4000)


def _events_df(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


def _random_events(seed, n_users=25, n_events=600):
    rng = random.Random(seed)
    base = datetime.datetime(2024, 1, 1)
    return [
        (
            i,
            base
            + datetime.timedelta(
                days=rng.randrange(0, 20), minutes=int(rng.randrange(900))
            ),
            rng.randrange(1, n_users + 1),
            "c",
            0.0,
            "",
        )
        for i in range(n_events)
    ]


def _pts_df(spark, pts):
    return spark.createDataFrame(pts, "point_id long, mx long, my long")


# ------------------------------------------------ cross-K ladder


def _crossk_ref(pa, pb):
    out = Counter()
    for _, ax, ay in pa:
        for _, bx, by in pb:
            cheb = max(abs(ax - bx), abs(ay - by))
            for r in RUNGS:
                if cheb <= r:
                    out[r] += 1
    return dict(out)


def test_cross_ladder_matches_bruteforce(spark):
    rng = random.Random(3201)
    pa = [
        (i, rng.randrange(-9000, 9000), rng.randrange(-9000, 9000))
        for i in range(150)
    ]
    pb = [
        (i, rng.randrange(-9000, 9000), rng.randrange(-9000, 9000))
        for i in range(120)
    ]
    got = {
        r["r"]: r["n_pairs"]
        for r in cross_pair_ladder(
            _pts_df(spark, pa), _pts_df(spark, pb)
        ).collect()
    }
    assert got == _crossk_ref(pa, pb)


def test_cross_ladder_boundary_tie_counts(spark):
    # cheb EXACTLY 500 must land in the r=500 rung in both engines
    pa = [(1, 0, 0)]
    pb = [(1, 500, -300), (2, 501, 0)]
    got = {
        r["r"]: r["n_pairs"]
        for r in cross_pair_ladder(
            _pts_df(spark, pa), _pts_df(spark, pb)
        ).collect()
    }
    assert got == {500: 1, 1000: 2, 2000: 2, 4000: 2}


def test_cross_ladder_matches_duckdb(spark):
    rng = random.Random(3202)
    pa = [
        (i, rng.randrange(-20000, 20000), rng.randrange(-20000, 20000))
        for i in range(200)
    ]
    pb = [
        (i, rng.randrange(-20000, 20000), rng.randrange(-20000, 20000))
        for i in range(200)
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE ta (point_id BIGINT, mx BIGINT, my BIGINT)")
    con.execute("CREATE TABLE tb (point_id BIGINT, mx BIGINT, my BIGINT)")
    con.executemany("INSERT INTO ta VALUES (?,?,?)", pa)
    con.executemany("INSERT INTO tb VALUES (?,?,?)", pb)
    want = dict(
        con.execute(
            sql_cross_pair_ladder("SELECT * FROM ta", "SELECT * FROM tb")
        ).fetchall()
    )
    got = {
        r["r"]: r["n_pairs"]
        for r in cross_pair_ladder(
            _pts_df(spark, pa), _pts_df(spark, pb)
        ).collect()
    }
    assert got == want


def test_cross_ladder_plan_zero_python(spark):
    audit = audit_plan(
        cross_pair_ladder(
            _pts_df(spark, [(1, 0, 0)]), _pts_df(spark, [(1, 1, 1)])
        )
    )
    assert sum(audit["python_nodes"].values()) == 0


# ------------------------------------------------- raster clumps


def _clumps_ref(pts, cell=GRID_GRAPH_CELL):
    cells = Counter()
    for _, mx, my in pts:
        cells[(mx - ((mx % cell) + cell) % cell) // cell,
              (my - ((my % cell) + cell) % cell) // cell] += 1
    parent = {c: c for c in cells}

    def find(c):
        while parent[c] != c:
            parent[c] = parent[parent[c]]
            c = parent[c]
        return c

    for cx, cy in cells:
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                nb = (cx + dx, cy + dy)
                if nb != (cx, cy) and nb in cells:
                    ra, rb = find((cx, cy)), find(nb)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
    groups = defaultdict(list)
    for c in cells:
        groups[find(c)].append(c)
    out = {}
    for members in groups.values():
        label = min(
            cx * 4294967296 + cy + 2147483648 for cx, cy in members
        )
        xs = [c[0] for c in members]
        ys = [c[1] for c in members]
        out[label] = (
            len(members),
            sum(cells[c] for c in members),
            min(xs),
            max(xs),
            min(ys),
            max(ys),
        )
    return out


def test_raster_clumps_matches_unionfind(spark):
    rng = random.Random(3203)
    # sparse field (mostly singleton cells) + a dense blob spanning a
    # couple of cells (a guaranteed multi-cell clump)
    pts = [
        (i, rng.randrange(-300000, 300000), rng.randrange(-300000, 300000))
        for i in range(300)
    ] + [
        (1000 + i, rng.randrange(0, 20000), rng.randrange(0, 20000))
        for i in range(40)
    ]
    got = {
        r["comp"]: (
            r["n_cells"],
            r["n_points"],
            r["min_cx"],
            r["max_cx"],
            r["min_cy"],
            r["max_cy"],
        )
        for r in raster_clumps(_pts_df(spark, pts)).collect()
    }
    assert got == _clumps_ref(pts)
    # the fixture must exercise BOTH multi-cell clumps and singletons
    sizes = {v[0] for v in got.values()}
    assert 1 in sizes and max(sizes) >= 2


def test_raster_clumps_diagonal_is_connected(spark):
    # 8-adjacency: two cells sharing only a CORNER are one clump;
    # a third cell two cells away stays a singleton
    c = GRID_GRAPH_CELL
    pts = [(1, 0, 0), (2, c, c), (3, 5 * c, 5 * c)]
    rows = raster_clumps(_pts_df(spark, pts)).collect()
    assert sorted(r["n_cells"] for r in rows) == [1, 2]


def test_raster_clumps_matches_duckdb(spark):
    rng = random.Random(3204)
    pts = [
        (i, rng.randrange(-60000, 60000), rng.randrange(-60000, 60000))
        for i in range(400)
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE cpts (point_id BIGINT, mx BIGINT, my BIGINT)")
    con.executemany("INSERT INTO cpts VALUES (?,?,?)", pts)
    want = {
        r[0]: tuple(r[1:])
        for r in con.execute(
            sql_raster_clumps("SELECT * FROM cpts")
        ).fetchall()
    }
    got = {
        r["comp"]: (
            r["n_cells"],
            r["n_points"],
            r["min_cx"],
            r["max_cx"],
            r["min_cy"],
            r["max_cy"],
        )
        for r in raster_clumps(_pts_df(spark, pts)).collect()
    }
    assert got == want


# ------------------------------------------- tile-hour residuals


def _residuals_ref(spark, rows):
    pos = sticky_positions(_events_df(spark, rows)).collect()
    obs = Counter()
    for r in pos:
        hour = (int(r["ts"].timestamp() * 1_000_000) // 3600000000) % 24
        obs[(r["tx"], r["ty"], hour)] += 1
    t_tot = Counter()
    prof = Counter()
    for (tx, ty, h), o in obs.items():
        t_tot[(tx, ty)] += o
        prof[h] += o
    gg = sum(prof.values())
    out = {}
    for (tx, ty), t in t_tot.items():
        for h in range(24):
            if prof[h] == 0:
                continue  # inner join on the profile: E=0 hours drop
            o = obs.get((tx, ty, h), 0)
            dev = o * gg - t * prof[h]
            out[(tx, ty, h)] = (
                o,
                int(Fraction(dev * dev * 1_000_000, gg * t * prof[h])),
            )
    return out


def test_tile_hour_residuals_matches_reference(spark):
    rows = _random_events(3205, n_users=20, n_events=500)
    got = {
        (r["tx"], r["ty"], r["hour"]): (r["o"], r["residual_ppm"])
        for r in tile_hour_residuals(_events_df(spark, rows)).collect()
    }
    ref = _residuals_ref(spark, rows)
    assert got == ref
    # zero-observed hours are present and carry their closed form
    assert any(o == 0 and ppm > 0 for o, ppm in got.values())


def test_tile_hour_residuals_matches_duckdb(spark):
    rows = _random_events(3206, n_users=30, n_events=700)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events (event_id BIGINT, ts TIMESTAMP,"
        " user_id BIGINT, event_type VARCHAR, value DOUBLE,"
        " props VARCHAR)"
    )
    con.executemany("INSERT INTO events VALUES (?,?,?,?,?,?)", rows)
    want = {
        (r[0], r[1], r[2]): (r[3], r[4])
        for r in con.execute(
            sql_tile_hour_residuals(
                "SELECT user_id, event_id, ts FROM events"
            )
        ).fetchall()
    }
    got = {
        (r["tx"], r["ty"], r["hour"]): (r["o"], r["residual_ppm"])
        for r in tile_hour_residuals(_events_df(spark, rows)).collect()
    }
    assert got == want


def test_tile_hour_residuals_uniform_is_zero(spark):
    """All events in ONE global hour: every tile's profile equals the
    corpus profile exactly, so every emitted residual is 0 and each
    tile emits exactly one row (E = 0 hours drop with the profile
    inner join)."""
    base = datetime.datetime(2024, 1, 1, 9, 0)
    rows = [
        (i, base + datetime.timedelta(seconds=i), 1 + i % 3, "c", 0.0, "")
        for i in range(30)
    ]
    out = tile_hour_residuals(_events_df(spark, rows)).collect()
    assert all(r["residual_ppm"] == 0 for r in out)
    assert all(r["hour"] == 9 for r in out)


def test_tile_hour_residuals_plan_zero_python(spark):
    audit = audit_plan(
        tile_hour_residuals(_events_df(spark, _random_events(4)))
    )
    assert sum(audit["python_nodes"].values()) == 0
