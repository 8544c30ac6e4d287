"""Round-5 batch 31: jump-size spectrum (octave displacement
histogram), Voronoi nearest-facility catchment, space-time event-type
co-location lift."""

from __future__ import annotations

import datetime
import random
from collections import Counter, defaultdict
from fractions import Fraction

import duckdb

from workstealing_spatial_join_spark.operators.spatialstats import (
    sql_voronoi_catchment,
    voronoi_catchment,
)
from workstealing_spatial_join_spark.operators.trajectory import (
    jump_spectrum,
    sql_jump_spectrum,
    sql_type_colocation_lift,
    sticky_positions,
    type_colocation_lift,
)
from workstealing_spatial_join_spark.plans.planner import audit_plan

TYPES = ["click", "error", "purchase", "signup", "view"]


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
            rng.choice(TYPES),
            0.0,
            "",
        )
        for i in range(n_events)
    ]


def _duck(rows, sql_text):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events (event_id BIGINT, ts TIMESTAMP,"
        " user_id BIGINT, event_type VARCHAR, value DOUBLE,"
        " props VARCHAR)"
    )
    con.executemany("INSERT INTO events VALUES (?,?,?,?,?,?)", rows)
    return con.execute(sql_text).fetchall()


# ------------------------------------------------- jump spectrum


def _jump_ref(spark, rows):
    """Python reference: per-user ordered sticky tiles → moved-step
    squared displacements → octave (bit_length) histogram."""
    pos = sticky_positions(_events_df(spark, rows)).collect()
    by_user = defaultdict(list)
    for r in pos:
        by_user[r["user_id"]].append((r["rn"], r["tx"], r["ty"]))
    jumps = Counter()
    users = defaultdict(set)
    for uid, seq in by_user.items():
        seq.sort()
        for (_, x0, y0), (_, x1, y1) in zip(seq, seq[1:]):
            d2 = (x1 - x0) ** 2 + (y1 - y0) ** 2
            if d2 == 0:
                continue
            b = d2.bit_length()
            jumps[b] += 1
            users[b].add(uid)
    return {b: (jumps[b], len(users[b])) for b in jumps}


def test_jump_spectrum_matches_reference(spark):
    rows = _random_events(3101)
    got = {
        r["bucket"]: (r["n_jumps"], r["n_users"])
        for r in jump_spectrum(_events_df(spark, rows)).collect()
    }
    assert got == _jump_ref(spark, rows)
    assert len(got) >= 2  # the fixture exercises several octaves


def test_jump_spectrum_matches_duckdb(spark):
    rows = _random_events(3102, n_users=40, n_events=900)
    got = {
        (r["bucket"], r["n_jumps"], r["n_users"])
        for r in jump_spectrum(_events_df(spark, rows)).collect()
    }
    want = set(
        map(
            tuple,
            _duck(
                rows,
                sql_jump_spectrum(
                    "SELECT user_id, event_id, ts FROM events"
                ),
            ),
        )
    )
    assert got == want


def test_octave_bucket_is_exact_bit_length():
    """LENGTH(BIN(x)) == x.bit_length() for every x in 1..4097 —
    pins the power-of-two boundaries (no float log anywhere)."""
    con = duckdb.connect()
    rows = con.execute(
        "SELECT x, LENGTH(BIN(x)) FROM (SELECT CAST(UNNEST(RANGE(1, 4098))"
        " AS BIGINT) AS x)"
    ).fetchall()
    assert all(n == x.bit_length() for x, n in rows)


def test_jump_spectrum_plan_zero_python(spark):
    audit = audit_plan(jump_spectrum(_events_df(spark, _random_events(1))))
    assert sum(audit["python_nodes"].values()) == 0


# -------------------------------------------- voronoi catchment


def _pts_df(spark, pts):
    return spark.createDataFrame(pts, "point_id long, mx long, my long")


def _fac_df(spark, fac):
    return spark.createDataFrame(fac, "fid long, fx long, fy long")


def _catchment_ref(pts, fac):
    agg = defaultdict(lambda: [0, 0, 0])
    for pid, mx, my in pts:
        best = min(
            ((mx - fx) ** 2 + (my - fy) ** 2, fid) for fid, fx, fy in fac
        )
        d2, fid = best
        a = agg[fid]
        a[0] += 1
        a[1] += d2
        a[2] = max(a[2], d2)
    return {fid: tuple(v) for fid, v in agg.items()}


def test_voronoi_catchment_matches_bruteforce(spark):
    rng = random.Random(3103)
    pts = [
        (i, rng.randrange(-180000, 180000), rng.randrange(-90000, 90000))
        for i in range(400)
    ]
    fac = [
        (j * 7, rng.randrange(-180000, 180000), rng.randrange(-90000, 90000))
        for j in range(1, 12)
    ]
    got = {
        r["fid"]: (r["n_pts"], r["sum_d2"], r["max_d2"])
        for r in voronoi_catchment(
            _pts_df(spark, pts), _fac_df(spark, fac)
        ).collect()
    }
    assert got == _catchment_ref(pts, fac)


def test_voronoi_tie_breaks_to_smaller_fid(spark):
    # point at the exact midpoint of two facilities: equidistant,
    # must land on fid 2 (the smaller), never fid 9
    pts = [(1, 0, 0)]
    fac = [(9, 10, 0), (2, -10, 0)]
    rows = voronoi_catchment(
        _pts_df(spark, pts), _fac_df(spark, fac)
    ).collect()
    assert len(rows) == 1
    assert rows[0]["fid"] == 2
    assert rows[0]["max_d2"] == 100


def test_voronoi_catchment_matches_duckdb(spark):
    rng = random.Random(3104)
    pts = [
        (i, rng.randrange(-50000, 50000), rng.randrange(-50000, 50000))
        for i in range(300)
    ]
    fac = [
        (j, rng.randrange(-50000, 50000), rng.randrange(-50000, 50000))
        for j in range(1, 9)
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE pts (point_id BIGINT, mx BIGINT, my BIGINT)")
    con.execute("CREATE TABLE fcs (fid BIGINT, fx BIGINT, fy BIGINT)")
    con.executemany("INSERT INTO pts VALUES (?,?,?)", pts)
    con.executemany("INSERT INTO fcs VALUES (?,?,?)", fac)
    want = set(
        map(
            tuple,
            con.execute(
                sql_voronoi_catchment(
                    "SELECT * FROM pts", "SELECT * FROM fcs"
                )
            ).fetchall(),
        )
    )
    got = {
        (r["fid"], r["n_pts"], r["sum_d2"], r["max_d2"])
        for r in voronoi_catchment(
            _pts_df(spark, pts), _fac_df(spark, fac)
        ).collect()
    }
    assert got == want


def test_voronoi_plan_broadcasts_facilities(spark):
    audit = audit_plan(
        voronoi_catchment(
            _pts_df(spark, [(1, 0, 0)]), _fac_df(spark, [(1, 1, 1)])
        )
    )
    assert sum(audit["python_nodes"].values()) == 0
    assert audit["sortmerge_joins"] == 0  # facility side must broadcast


# --------------------------------------- type co-location lift


def _lift_ref(spark, rows):
    ev_type = {r[0]: r[3] for r in rows}
    pos = sticky_positions(_events_df(spark, rows)).collect()
    slots = set()
    for r in pos:
        day = int(r["ts"].timestamp() * 1_000_000) // 86400000000
        slots.add((r["tx"], r["ty"], day, ev_type[r["event_id"]]))
    slot_types = defaultdict(set)
    for tx, ty, day, t in slots:
        slot_types[(tx, ty, day)].add(t)
    total = len(slot_types)
    marg = Counter()
    co = Counter()
    for types in slot_types.values():
        ordered = sorted(types)
        for t in ordered:
            marg[t] += 1
        for i, a in enumerate(ordered):
            for b in ordered[i + 1 :]:
                co[(a, b)] += 1
    return {
        (a, b): (
            n,
            int(Fraction(n * total * 1_000_000, marg[a] * marg[b])),
        )
        for (a, b), n in co.items()
    }


def test_type_colocation_lift_matches_reference(spark):
    rows = _random_events(3105, n_users=30, n_events=700)
    got = {
        (r["type_a"], r["type_b"]): (r["n_co"], r["lift_ppm"])
        for r in type_colocation_lift(_events_df(spark, rows)).collect()
    }
    assert got == _lift_ref(spark, rows)
    assert got  # pairs exist


def test_type_colocation_lift_matches_duckdb(spark):
    rows = _random_events(3106, n_users=35, n_events=800)
    got = {
        (r["type_a"], r["type_b"], r["n_co"], r["lift_ppm"])
        for r in type_colocation_lift(_events_df(spark, rows)).collect()
    }
    want = set(
        map(
            tuple,
            _duck(
                rows,
                sql_type_colocation_lift(
                    "SELECT user_id, event_id, ts, event_type FROM events"
                ),
            ),
        )
    )
    assert got == want


def test_type_colocation_lift_closed_form(spark):
    """Two users, each one epoch of 2 events on day 0, disjoint tiles:
    types a/b co-occur in user 1's slot only. T = 2 slots,
    n_a = 1 (slot 1), n_b = 2 (both slots) → lift = 1·2/(1·2) = 1×."""
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (1, base, 1, "a", 0.0, ""),
        (2, base + datetime.timedelta(minutes=1), 1, "b", 0.0, ""),
        (3, base, 2, "b", 0.0, ""),
        (4, base + datetime.timedelta(minutes=1), 2, "b", 0.0, ""),
    ]
    out = type_colocation_lift(_events_df(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["type_a"], r["type_b"], r["n_co"], r["lift_ppm"]) == (
        "a",
        "b",
        1,
        1_000_000,
    )


def test_type_colocation_plan_zero_python(spark):
    audit = audit_plan(
        type_colocation_lift(_events_df(spark, _random_events(2)))
    )
    assert sum(audit["python_nodes"].values()) == 0
