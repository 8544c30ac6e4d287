"""Round-5 batch 26 (file numbering): spatial Gini, quadrat
dispersion (VMR), per-tile visitor concentration (Simpson's λ)."""

from __future__ import annotations

import random

import duckdb

from workstealing_spatial_join_spark.operators.spatialstats import (
    quadrat_dispersion,
    spatial_gini,
    sql_quadrat_dispersion,
    sql_spatial_gini,
)
from workstealing_spatial_join_spark.operators.trajectory import (
    sql_tile_visitor_concentration,
    tile_visitor_concentration,
)
from workstealing_spatial_join_spark.plans.planner import audit_plan

CELL = 8192


def _cells_of(points, cell=CELL):
    counts: dict[tuple[int, int], int] = {}
    for x, y in points:
        k = (x // cell, y // cell)
        counts[k] = counts.get(k, 0) + 1
    return counts


def _gini_ref(points, cell=CELL):
    xs = sorted(_cells_of(points, cell).values())
    n = len(xs)
    s = sum(xs)
    num = 2 * sum((i + 1) * x for i, x in enumerate(xs)) - (n + 1) * s
    return n, s, (num * 10**6) // (n * s)


def _vmr_ref(points, cell=CELL):
    counts = _cells_of(points, cell)
    cxs = [c[0] for c in counts]
    cys = [c[1] for c in counts]
    t = (max(cxs) - min(cxs) + 1) * (max(cys) - min(cys) + 1)
    s = sum(counts.values())
    sq = sum(v * v for v in counts.values())
    return t, len(counts), s, ((t * sq - s * s) * 10**6) // (t * s)


def _random_points(seed, n=400):
    rng = random.Random(seed)
    pts = []
    while len(pts) < n:
        if rng.random() < 0.6:
            bx, by = rng.randrange(-8, 9), rng.randrange(-8, 9)
            for _ in range(rng.randrange(1, 9)):
                pts.append(
                    (bx * CELL + rng.randrange(CELL),
                     by * CELL + rng.randrange(CELL))
                )
        else:
            pts.append(
                (rng.randrange(-30 * CELL, 30 * CELL),
                 rng.randrange(-30 * CELL, 30 * CELL))
            )
    return pts[:n]


def _duck(points, sql):
    con = duckdb.connect()
    con.execute("CREATE TABLE pts_t (mx BIGINT, my BIGINT)")
    con.executemany("INSERT INTO pts_t VALUES (?, ?)", points)
    return con.execute(sql("SELECT mx, my FROM pts_t")).fetchall()


# ------------------------------------------------------ spatial gini


def test_gini_matches_python_reference_and_duckdb(spark):
    pts = _random_points(2601)
    df = spark.createDataFrame(pts, "mx long, my long")
    row = spatial_gini(df).collect()[0]
    got = (row["n_cells"], row["s_tot"], row["gini_ppm"])
    assert got == _gini_ref(pts)
    assert _duck(pts, sql_spatial_gini) == [got]


def test_gini_uniform_zero_concentrated_high(spark):
    # perfectly equal counts -> G = (n+1 terms cancel) near 0
    equal = []
    for ox in range(5):
        for oy in range(5):
            equal += [(ox * CELL + 3, oy * CELL + 3)] * 4
    row = spatial_gini(
        spark.createDataFrame(equal, "mx long, my long")
    ).collect()[0]
    assert row["gini_ppm"] == 0
    # one cell holds nearly everything -> G near 1
    skew = [(0, 0)] * 96 + [
        ((i + 2) * CELL + 3, 0) for i in range(4)
    ]
    row = spatial_gini(
        spark.createDataFrame(skew, "mx long, my long")
    ).collect()[0]
    assert row["gini_ppm"] > 700_000


def test_gini_tiebreak_invariance(spark):
    # many tied counts: the statistic must not depend on which tied
    # cell gets which rank — compare against the python reference,
    # which sorts by count only
    pts = []
    for ox in range(10):
        pts += [(ox * CELL + 1, 0)] * 3        # 10 cells tied at 3
    for ox in range(4):
        pts += [(ox * CELL + 1, 5 * CELL)] * 7  # 4 cells tied at 7
    df = spark.createDataFrame(pts, "mx long, my long")
    row = spatial_gini(df).collect()[0]
    assert (row["n_cells"], row["s_tot"], row["gini_ppm"]) == _gini_ref(pts)


def test_gini_plan_zero_python(spark):
    df = spark.createDataFrame([(0, 0), (9000, 9000)], "mx long, my long")
    audit = audit_plan(spatial_gini(df))
    assert sum(audit["python_nodes"].values()) == 0


# ------------------------------------------------- quadrat dispersion


def test_vmr_matches_python_reference_and_duckdb(spark):
    pts = _random_points(2602)
    df = spark.createDataFrame(pts, "mx long, my long")
    row = quadrat_dispersion(df).collect()[0]
    got = (row["n_quadrats"], row["n_occupied"], row["s_tot"],
           row["vmr_ppm"])
    assert got == _vmr_ref(pts)
    assert _duck(pts, sql_quadrat_dispersion) == [got]


def test_vmr_uniform_low_clustered_high(spark):
    # every quadrat in the frame occupied with the same count: var=0
    uniform = []
    for ox in range(6):
        for oy in range(6):
            uniform += [(ox * CELL + 3, oy * CELL + 3)] * 2
    row = quadrat_dispersion(
        spark.createDataFrame(uniform, "mx long, my long")
    ).collect()[0]
    assert row["vmr_ppm"] == 0
    # all mass in one quadrat of a wide frame: VMR >> 1
    blob = [(0, 0)] * 50 + [(9 * CELL + 1, 9 * CELL + 1)]
    row = quadrat_dispersion(
        spark.createDataFrame(blob, "mx long, my long")
    ).collect()[0]
    assert row["vmr_ppm"] > 10_000_000


def test_vmr_counts_empty_quadrats(spark):
    # two occupied corners of a 3x3 frame: T must be 9, not 2
    pts = [(0, 0), (2 * CELL + 1, 2 * CELL + 1)]
    row = quadrat_dispersion(
        spark.createDataFrame(pts, "mx long, my long")
    ).collect()[0]
    assert row["n_quadrats"] == 9
    assert row["n_occupied"] == 2
    # T=9, S=2, sq=2: (9*2 - 4)*1e6 // (9*2) = 777777
    assert row["vmr_ppm"] == (9 * 2 - 4) * 10**6 // (9 * 2)


# ------------------------------------------- visitor concentration


def _lam_ref(visits):
    """visits: list of (tile, user) occurrences."""
    from collections import Counter

    per_tile: dict = {}
    for tile, user in visits:
        per_tile.setdefault(tile, Counter())[user] += 1
    out = {}
    for tile, cnt in per_tile.items():
        n = sum(cnt.values())
        if n < 2:
            continue
        same = sum(v * (v - 1) for v in cnt.values())
        out[tile] = (n, len(cnt), same * 10**6 // (n * (n - 1)))
    return out


def test_concentration_single_user_tile_is_1e6(spark):
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i, base + datetime.timedelta(minutes=i), 7, "c", 0.0, "")
        for i in range(8)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = tile_visitor_concentration(df).collect()
    assert out, "sticky epochs of one user must share at least one tile"
    for r in out:
        if r["n_visits"] >= 2:
            assert r["same_user_ppm"] == 1_000_000
            assert r["n_users"] == 1


def test_concentration_matches_duckdb_twin(spark):
    import datetime

    rng = random.Random(2603)
    base = datetime.datetime(2024, 1, 1)
    # users u and u+32 walk the SAME tile sequence (tx = (3u+15e) mod
    # 32, ty = (13u+27e) mod 32 — congruent residues), so mixed-user
    # tiles are guaranteed, not left to chance
    rows = [
        (
            i,
            base + datetime.timedelta(minutes=int(rng.randrange(50000))),
            rng.randrange(1, 40),
            "c",
            0.0,
            "",
        )
        for i in range(500)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    got = {
        (r["tx"], r["ty"]): (r["n_visits"], r["n_users"],
                             r["same_user_ppm"])
        for r in tile_visitor_concentration(df).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events (event_id BIGINT, ts TIMESTAMP,"
        " user_id BIGINT, event_type VARCHAR, value DOUBLE,"
        " props VARCHAR)"
    )
    con.executemany(
        "INSERT INTO events VALUES (?, ?, ?, ?, ?, ?)", rows
    )
    want = {
        (r[0], r[1]): (r[2], r[3], r[4])
        for r in con.execute(
            sql_tile_visitor_concentration(
                "SELECT user_id, event_id, ts FROM events"
            )
        ).fetchall()
    }
    assert got == want
    # mixed-user tiles sit strictly below 10^6
    assert any(v[2] < 1_000_000 for v in got.values())


def test_concentration_single_exchange_after_positions(spark):
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i, base + datetime.timedelta(minutes=i), i % 3, "c", 0.0, "")
        for i in range(30)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    audit = audit_plan(tile_visitor_concentration(df))
    # one exchange for the user window + one for the tile repartition
    assert audit["exchanges"] == 2
    assert sum(audit["python_nodes"].values()) == 0
