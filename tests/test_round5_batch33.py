"""Round-5 batch 33: coverage gaps (service complement), 2SFCA
accessibility, mobility motif trigrams."""

from __future__ import annotations

import datetime
import random
from collections import Counter, defaultdict

import duckdb

from workstealing_spatial_join_spark.operators.graph import GRID_GRAPH_CELL
from workstealing_spatial_join_spark.operators.spatialstats import (
    catchment_access_2sfca,
    coverage_gaps,
    sql_catchment_access_2sfca,
    sql_coverage_gaps,
)
from workstealing_spatial_join_spark.operators.trajectory import (
    od_trigrams,
    sql_od_trigrams,
    sticky_positions,
)
from workstealing_spatial_join_spark.plans.planner import audit_plan


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


def _fac_df(spark, fac, with_supply=False):
    schema = "fid long, fx long, fy long"
    if with_supply:
        schema += ", supply long"
    return spark.createDataFrame(fac, schema)


# ------------------------------------------------- coverage gaps


def _gaps_ref(pts, fac, max_d2, cell=GRID_GRAPH_CELL):
    cells = Counter()
    for _, mx, my in pts:
        cells[
            (mx - ((mx % cell) + cell) % cell) // cell,
            (my - ((my % cell) + cell) % cell) // cell,
        ] += 1
    out = {}
    for (cx, cy), x in cells.items():
        ux, uy = 2 * cx * cell + cell, 2 * cy * cell + cell
        md2q = min(
            (ux - 2 * fx) ** 2 + (uy - 2 * fy) ** 2 for _, fx, fy in fac
        )
        if md2q > 4 * max_d2:
            out[(cx, cy)] = (x, md2q)
    return out


def test_coverage_gaps_matches_bruteforce(spark):
    rng = random.Random(3301)
    pts = [
        (i, rng.randrange(-200000, 200000), rng.randrange(-200000, 200000))
        for i in range(400)
    ]
    fac = [
        (j, rng.randrange(-200000, 200000), rng.randrange(-200000, 200000))
        for j in range(1, 6)
    ]
    max_d2 = 50_000 ** 2
    got = {
        (r["cx"], r["cy"]): (r["n_points"], r["min_d2_q"])
        for r in coverage_gaps(
            _pts_df(spark, pts), _fac_df(spark, fac), max_d2
        ).collect()
    }
    ref = _gaps_ref(pts, fac, max_d2)
    assert got == ref
    assert got  # gaps exist at this radius


def test_coverage_gaps_boundary_is_strict(spark):
    """A cell center EXACTLY at the service radius is covered (gate
    is strict >): facility at distance exactly max_d in x only."""
    cell = GRID_GRAPH_CELL
    # one point in cell (0,0) → center (cell/2, cell/2); facility
    # exactly max_d east of the center (doubled coords make it exact)
    max_d = 10_000
    fac_x2 = cell + 2 * max_d  # doubled x of facility
    assert fac_x2 % 2 == 0
    pts = [(1, 10, 10)]
    fac = [(1, fac_x2 // 2, cell // 2)]
    out = coverage_gaps(
        _pts_df(spark, pts), _fac_df(spark, fac), max_d * max_d
    ).collect()
    assert out == []  # exactly at the radius → not a gap
    out2 = coverage_gaps(
        _pts_df(spark, pts), _fac_df(spark, fac), max_d * max_d - 1
    ).collect()
    assert len(out2) == 1  # one milli² tighter → a gap


def test_coverage_gaps_matches_duckdb(spark):
    rng = random.Random(3302)
    pts = [
        (i, rng.randrange(-150000, 150000), rng.randrange(-150000, 150000))
        for i in range(300)
    ]
    fac = [
        (j, rng.randrange(-150000, 150000), rng.randrange(-150000, 150000))
        for j in range(1, 5)
    ]
    max_d2 = 40_000 ** 2
    con = duckdb.connect()
    con.execute("CREATE TABLE gpts (point_id BIGINT, mx BIGINT, my BIGINT)")
    con.execute("CREATE TABLE gfac (fid BIGINT, fx BIGINT, fy BIGINT)")
    con.executemany("INSERT INTO gpts VALUES (?,?,?)", pts)
    con.executemany("INSERT INTO gfac VALUES (?,?,?)", fac)
    want = {
        (r[0], r[1]): (r[2], r[3])
        for r in con.execute(
            sql_coverage_gaps(
                "SELECT * FROM gpts", "SELECT * FROM gfac", max_d2
            )
        ).fetchall()
    }
    got = {
        (r["cx"], r["cy"]): (r["n_points"], r["min_d2_q"])
        for r in coverage_gaps(
            _pts_df(spark, pts), _fac_df(spark, fac), max_d2
        ).collect()
    }
    assert got == want


# ------------------------------------------------------- 2SFCA


def _access_ref(pts, fac, max_cheb):
    demand = Counter()
    for _, mx, my in pts:
        for fid, fx, fy, _s in fac:
            if abs(mx - fx) <= max_cheb and abs(my - fy) <= max_cheb:
                demand[fid] += 1
    ratios = {
        fid: (s * 1_000_000) // demand[fid]
        for fid, _fx, _fy, s in fac
        if demand[fid]
    }
    out = {}
    for pid, mx, my in pts:
        covering = [
            fid
            for fid, fx, fy, _s in fac
            if abs(mx - fx) <= max_cheb and abs(my - fy) <= max_cheb
        ]
        if covering:
            out[pid] = (
                len(covering),
                sum(ratios[f] for f in covering),
            )
    return out


def test_2sfca_matches_reference(spark):
    rng = random.Random(3303)
    pts = [
        (i, rng.randrange(-100000, 100000), rng.randrange(-100000, 100000))
        for i in range(300)
    ]
    fac = [
        (
            j,
            rng.randrange(-100000, 100000),
            rng.randrange(-100000, 100000),
            (j % 5 + 1) * 100,
        )
        for j in range(1, 8)
    ]
    got = {
        r["point_id"]: (r["n_fac"], r["access_ppm"])
        for r in catchment_access_2sfca(
            _pts_df(spark, pts), _fac_df(spark, fac, True), 60_000
        ).collect()
    }
    ref = _access_ref(pts, fac, 60_000)
    assert got == ref
    assert any(n > 1 for n, _ in got.values())  # overlapping catchments


def test_2sfca_matches_duckdb(spark):
    rng = random.Random(3304)
    pts = [
        (i, rng.randrange(-80000, 80000), rng.randrange(-80000, 80000))
        for i in range(250)
    ]
    fac = [
        (
            j,
            rng.randrange(-80000, 80000),
            rng.randrange(-80000, 80000),
            (j % 3 + 1) * 50,
        )
        for j in range(1, 7)
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE apts (point_id BIGINT, mx BIGINT, my BIGINT)")
    con.execute(
        "CREATE TABLE afac (fid BIGINT, fx BIGINT, fy BIGINT,"
        " supply BIGINT)"
    )
    con.executemany("INSERT INTO apts VALUES (?,?,?)", pts)
    con.executemany("INSERT INTO afac VALUES (?,?,?,?)", fac)
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            sql_catchment_access_2sfca(
                "SELECT * FROM apts", "SELECT * FROM afac", 50_000
            )
        ).fetchall()
    }
    got = {
        r["point_id"]: (r["n_fac"], r["access_ppm"])
        for r in catchment_access_2sfca(
            _pts_df(spark, pts), _fac_df(spark, fac, True), 50_000
        ).collect()
    }
    assert got == want


def test_2sfca_closed_form(spark):
    """One facility (supply 100) serving exactly 3 points → each
    scores floor(100e6/3) = 33333333 ppm from 1 facility."""
    pts = [(1, 0, 0), (2, 100, 0), (3, 0, 100), (4, 900000, 900000)]
    fac = [(7, 50, 50, 100)]
    got = {
        r["point_id"]: (r["n_fac"], r["access_ppm"])
        for r in catchment_access_2sfca(
            _pts_df(spark, pts), _fac_df(spark, fac, True), 1000
        ).collect()
    }
    assert got == {
        1: (1, 33333333),
        2: (1, 33333333),
        3: (1, 33333333),
    }  # point 4 is out of range and absent


def test_batch33_plans_zero_python(spark):
    pts = _pts_df(spark, [(1, 0, 0)])
    fac = _fac_df(spark, [(1, 1, 1)])
    facs = _fac_df(spark, [(1, 1, 1, 10)], True)
    for df in (
        coverage_gaps(pts, fac, 100),
        catchment_access_2sfca(pts, facs, 100),
        od_trigrams(_events_df(spark, _random_events(5))),
    ):
        assert sum(audit_plan(df)["python_nodes"].values()) == 0


# -------------------------------------------------- OD trigrams


def _trigrams_ref(spark, rows):
    pos = sticky_positions(_events_df(spark, rows)).collect()
    by_user = defaultdict(list)
    for r in pos:
        by_user[r["user_id"]].append((r["rn"], r["tx"], r["ty"]))
    out = Counter()
    for seq in by_user.values():
        seq.sort()
        moves = []
        for (_, x0, y0), (_, x1, y1) in zip(seq, seq[1:]):
            if (x0, y0) != (x1, y1):
                moves.append(((x0, y0), (x1, y1)))
        for (a, b), (b2, c) in zip(moves, moves[1:]):
            if b == b2:
                out[(a[0], a[1], b[0], b[1], c[0], c[1])] += 1
    return {
        k: (n, int(k[0] == k[4] and k[1] == k[5]))
        for k, n in out.items()
    }


def test_od_trigrams_matches_reference(spark):
    rows = _random_events(3305, n_users=20, n_events=600)
    got = {
        (
            r["t0x"], r["t0y"], r["t1x"], r["t1y"], r["t2x"], r["t2y"]
        ): (r["n"], r["is_return"])
        for r in od_trigrams(_events_df(spark, rows)).collect()
    }
    ref = _trigrams_ref(spark, rows)
    assert got == ref
    # fixture property: the sticky congruence walk cannot revert a
    # tile within two transitions (the x step 47 ≡ 15 mod 32 never
    # cancels over one repeat), so every motif here is a CHAIN — the
    # pendulum flag is exercised by the crafted test below instead
    flags = {v[1] for v in got.values()}
    assert flags == {0}
    assert got


def test_od_trigrams_matches_duckdb(spark):
    rows = _random_events(3306, n_users=30, n_events=800)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events (event_id BIGINT, ts TIMESTAMP,"
        " user_id BIGINT, event_type VARCHAR, value DOUBLE,"
        " props VARCHAR)"
    )
    con.executemany("INSERT INTO events VALUES (?,?,?,?,?,?)", rows)
    want = {
        tuple(r[:6]): (r[6], r[7])
        for r in con.execute(
            sql_od_trigrams("SELECT user_id, event_id, ts FROM events")
        ).fetchall()
    }
    got = {
        (
            r["t0x"], r["t0y"], r["t1x"], r["t1y"], r["t2x"], r["t2y"]
        ): (r["n"], r["is_return"])
        for r in od_trigrams(_events_df(spark, rows)).collect()
    }
    assert got == want


def test_trigram_pendulum_flag(spark):
    """A crafted position frame with a genuine A→B→A walk (plus a
    dwell step inside it that must not break the chain) sets
    is_return = 1; the A→B→C tail stays 0."""
    import datetime as dt

    from workstealing_spatial_join_spark.operators.trajectory import (
        trigram_motifs,
    )

    base = dt.datetime(2024, 1, 1)
    # walk: A(0,0) → B(1,0) → B (dwell) → A(0,0) → C(2,2)
    walk = [(0, 0), (1, 0), (1, 0), (0, 0), (2, 2)]
    pos = spark.createDataFrame(
        [
            (1, i, base + dt.timedelta(minutes=i), x, y)
            for i, (x, y) in enumerate(walk)
        ],
        "user_id long, event_id long, ts timestamp, tx long, ty long",
    )
    got = {
        (
            r["t0x"], r["t0y"], r["t1x"], r["t1y"], r["t2x"], r["t2y"]
        ): (r["n"], r["is_return"])
        for r in trigram_motifs(pos).collect()
    }
    assert got == {
        (0, 0, 1, 0, 0, 0): (1, 1),  # pendulum, chained across dwell
        (1, 0, 0, 0, 2, 2): (1, 0),  # chain
    }


def test_od_trigrams_dwell_does_not_break_chain(spark):
    """A dwell step BETWEEN two transitions must not break the
    motif chain: user 1's sticky walk A A B B: transitions A→B only
    — no trigram; crafted 3-tile walk with dwell in the middle
    still chains."""
    # hand-build via congruences is opaque; instead assert on the
    # random fixture that total trigram instances == per-user
    # chained-move pairs (the reference already models dwell gaps,
    # so equality IS the property)
    rows = _random_events(3307, n_users=10, n_events=400)
    got = od_trigrams(_events_df(spark, rows)).collect()
    total = sum(r["n"] for r in got)
    ref = _trigrams_ref(spark, rows)
    assert total == sum(n for n, _ in ref.values())
    assert total > 0
