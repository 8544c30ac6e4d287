"""Round-5 batch 39: location quotient, home-based tours, per-tile
image near-dup rate."""

from __future__ import annotations

import datetime
import random
from collections import Counter, defaultdict
from fractions import Fraction

import duckdb

from workstealing_spatial_join_spark.operators.trajectory import (
    home_tours,
    location_quotient,
    sql_home_tours,
    sql_location_quotient,
    sticky_positions,
)
from workstealing_spatial_join_spark.plans.planner import audit_plan

TYPES = ["click", "purchase", "view"]


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


def _duck_events(rows, sql_text):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events (event_id BIGINT, ts TIMESTAMP,"
        " user_id BIGINT, event_type VARCHAR, value DOUBLE,"
        " props VARCHAR)"
    )
    con.executemany("INSERT INTO events VALUES (?,?,?,?,?,?)", rows)
    return con.execute(sql_text).fetchall()


# ---------------------------------------------- location quotient


def _lq_ref(spark, rows, etype):
    ev_type = {r[0]: r[3] for r in rows}
    pos = sticky_positions(_events_df(spark, rows)).collect()
    per = defaultdict(lambda: [0, 0])
    for r in pos:
        c = per[(r["tx"], r["ty"])]
        c[1] += 1
        if ev_type[r["event_id"]] == etype:
            c[0] += 1
    a_tot = sum(v[0] for v in per.values())
    t_tot = sum(v[1] for v in per.values())
    return {
        k: (a, t, int(Fraction(a * t_tot * 1_000_000, t * a_tot)))
        for k, (a, t) in per.items()
        if a > 0
    }


def test_lq_matches_reference(spark):
    rows = _random_events(3901, n_users=30, n_events=800)
    got = {
        (r["tx"], r["ty"]): (r["n_type"], r["n_all"], r["lq_ppm"])
        for r in location_quotient(
            _events_df(spark, rows), "purchase"
        ).collect()
    }
    ref = _lq_ref(spark, rows, "purchase")
    assert got == ref
    # single-type tiles land ABOVE parity, mixed below — both exist
    assert any(v[2] > 1_000_000 for v in got.values())
    assert any(v[2] < 1_000_000 for v in got.values())


def test_lq_matches_duckdb(spark):
    rows = _random_events(3902, n_users=35, n_events=900)
    want = {
        (r[0], r[1]): tuple(r[2:])
        for r in _duck_events(
            rows,
            sql_location_quotient(
                "SELECT user_id, event_id, ts, event_type FROM events",
                "purchase",
            ),
        )
    }
    got = {
        (r["tx"], r["ty"]): (r["n_type"], r["n_all"], r["lq_ppm"])
        for r in location_quotient(
            _events_df(spark, rows), "purchase"
        ).collect()
    }
    assert got == want


# --------------------------------------------------- home tours


def _tours_ref(spark, rows):
    pos = sticky_positions(_events_df(spark, rows)).collect()
    by_user = defaultdict(list)
    for r in pos:
        by_user[r["user_id"]].append((r["rn"], r["tx"], r["ty"]))
    out = {}
    for u, seq in by_user.items():
        seq.sort()
        counts = Counter((t[1], t[2]) for t in seq)
        # modal tile, ties to smallest (tx, ty)
        best = min((-n, t) for t, n in counts.items())[1]
        flags = [(t[1], t[2]) != best for t in seq]  # True = away
        tours = []
        run = 0
        for f in flags:
            if f:
                run += 1
            elif run:
                tours.append(run)
                run = 0
        if run:
            tours.append(run)
        if not tours:
            continue
        total = len(seq)
        away = sum(tours)
        out[u] = (
            len(tours),
            max(tours),
            away * 1_000_000 // total,
        )
    return out


def test_home_tours_matches_reference(spark):
    rows = _random_events(3903, n_users=20, n_events=700)
    got = {
        r["user_id"]: (r["n_tours"], r["max_tour_events"], r["away_ppm"])
        for r in home_tours(_events_df(spark, rows)).collect()
    }
    assert got == _tours_ref(spark, rows)
    assert got


def test_home_tours_matches_duckdb(spark):
    rows = _random_events(3904, n_users=30, n_events=900)
    want = {
        r[0]: tuple(r[1:])
        for r in _duck_events(
            rows,
            sql_home_tours("SELECT user_id, event_id, ts FROM events"),
        )
    }
    got = {
        r["user_id"]: (r["n_tours"], r["max_tour_events"], r["away_ppm"])
        for r in home_tours(_events_df(spark, rows)).collect()
    }
    assert got == want


def test_home_tours_open_tour_counts(spark):
    """A user whose window ENDS mid-tour still has that tour counted
    (documented edge censoring): single user, 8 events — epochs 0
    and 1 give home (first, most visits via tiebreak) then away."""
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i, base + datetime.timedelta(minutes=i), 3, "c", 0.0, "")
        for i in range(8)
    ]
    got = home_tours(_events_df(spark, rows)).collect()
    ref = _tours_ref(spark, rows)
    got_d = {
        r["user_id"]: (r["n_tours"], r["max_tour_events"], r["away_ppm"])
        for r in got
    }
    assert got_d == ref
    if ref:  # when the walk leaves home at all, the open tour counts
        assert all(v[0] >= 1 for v in ref.values())


def test_batch39_plans_zero_python(spark):
    ev = _events_df(spark, _random_events(11))
    for df in (
        location_quotient(ev, "purchase"),
        home_tours(ev),
    ):
        assert sum(audit_plan(df)["python_nodes"].values()) == 0
