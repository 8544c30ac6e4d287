"""Round-5 batch 40: weekend ratio, inter-event-time spectrum, OD
asymmetry."""

from __future__ import annotations

import datetime
import random
from collections import Counter, defaultdict

import duckdb

from workstealing_spatial_join_spark.operators.trajectory import (
    iet_spectrum,
    od_asymmetry,
    od_matrix,
    sql_iet_spectrum,
    sql_od_asymmetry,
    sql_tile_weekend_ratio,
    sticky_positions,
    tile_weekend_ratio,
)
from workstealing_spatial_join_spark.plans.planner import audit_plan


def _events_df(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


def _random_events(seed, n_users=25, n_events=600, days=20):
    rng = random.Random(seed)
    base = datetime.datetime(2024, 1, 1)
    return [
        (
            i,
            base
            + datetime.timedelta(
                days=rng.randrange(0, days), minutes=int(rng.randrange(900))
            ),
            rng.randrange(1, n_users + 1),
            "c",
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


# ------------------------------------------------ weekend ratio


def test_weekend_ratio_matches_reference(spark):
    rows = _random_events(4001, days=21)
    pos = sticky_positions(_events_df(spark, rows)).collect()
    per = defaultdict(lambda: [0, 0])
    for r in pos:
        epoch_day = int(r["ts"].timestamp() * 1_000_000) // 86400000000
        is_we = (epoch_day + 4) % 7 in (0, 6)
        # sanity: the congruence IS the calendar day-of-week
        assert is_we == (r["ts"].weekday() >= 5)
        per[(r["tx"], r["ty"])][1 if is_we else 0] += 1
    ref = {
        k: (wd, we, we * 1_000_000 // (wd + we))
        for k, (wd, we) in per.items()
    }
    got = {
        (r["tx"], r["ty"]): (
            r["n_weekday"],
            r["n_weekend"],
            r["weekend_ppm"],
        )
        for r in tile_weekend_ratio(_events_df(spark, rows)).collect()
    }
    assert got == ref
    assert any(v[1] > 0 for v in got.values())


def test_weekend_ratio_matches_duckdb(spark):
    rows = _random_events(4002, n_users=30, n_events=900, days=28)
    want = {
        (r[0], r[1]): tuple(r[2:])
        for r in _duck_events(
            rows,
            sql_tile_weekend_ratio(
                "SELECT user_id, event_id, ts FROM events"
            ),
        )
    }
    got = {
        (r["tx"], r["ty"]): (
            r["n_weekday"],
            r["n_weekend"],
            r["weekend_ppm"],
        )
        for r in tile_weekend_ratio(_events_df(spark, rows)).collect()
    }
    assert got == want


# --------------------------------------------------- IET spectrum


def test_iet_spectrum_matches_reference(spark):
    rows = _random_events(4003, n_users=20, n_events=700)
    pos = sticky_positions(_events_df(spark, rows)).collect()
    by_user = defaultdict(list)
    for r in pos:
        by_user[r["user_id"]].append(
            (r["rn"], int(r["ts"].timestamp() * 1_000_000))
        )
    buckets = Counter()
    users = defaultdict(set)
    for u, seq in by_user.items():
        seq.sort()
        for (_, t0), (_, t1) in zip(seq, seq[1:]):
            gap = t1 - t0
            b = 0 if gap == 0 else gap.bit_length()
            buckets[b] += 1
            users[b].add(u)
    ref = {b: (n, len(users[b])) for b, n in buckets.items()}
    got = {
        r["bucket"]: (r["n_gaps"], r["n_users"])
        for r in iet_spectrum(_events_df(spark, rows)).collect()
    }
    assert got == ref


def test_iet_zero_gap_has_its_own_bucket(spark):
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (1, base, 1, "c", 0.0, ""),
        (2, base, 1, "c", 0.0, ""),  # same timestamp → gap 0
        (3, base + datetime.timedelta(seconds=1), 1, "c", 0.0, ""),
    ]
    got = {
        r["bucket"]: (r["n_gaps"], r["n_users"])
        for r in iet_spectrum(_events_df(spark, rows)).collect()
    }
    assert got[0] == (1, 1)  # the exact-collision class
    assert got[(10**6).bit_length()] == (1, 1)  # the 1-second gap


def test_iet_matches_duckdb(spark):
    rows = _random_events(4004, n_users=25, n_events=800)
    want = dict(
        (r[0], (r[1], r[2]))
        for r in _duck_events(
            rows,
            sql_iet_spectrum("SELECT user_id, event_id, ts FROM events"),
        )
    )
    got = {
        r["bucket"]: (r["n_gaps"], r["n_users"])
        for r in iet_spectrum(_events_df(spark, rows)).collect()
    }
    assert got == want


# --------------------------------------------------- OD asymmetry


def test_od_asymmetry_matches_reference(spark):
    rows = _random_events(4005, n_users=30, n_events=900)
    od = {
        (r["ftx"], r["fty"], r["ttx"], r["tty"]): r["n_trips"]
        for r in od_matrix(_events_df(spark, rows)).collect()
    }
    pairs = {}
    for (fx, fy, tx, ty), n in od.items():
        key = min((fx, fy, tx, ty), (tx, ty, fx, fy))
        a = (key[0], key[1], key[2], key[3])
        fwd = (fx, fy, tx, ty) == key
        cur = pairs.setdefault(a, [0, 0])
        cur[0 if fwd else 1] += n
    ref = {
        k: (
            ab,
            ba,
            abs(ab - ba) * 1_000_000 // (ab + ba),
        )
        for k, (ab, ba) in pairs.items()
    }
    got = {
        (r["ax"], r["ay"], r["bx"], r["by"]): (
            r["f_ab"],
            r["f_ba"],
            r["asym_ppm"],
        )
        for r in od_asymmetry(_events_df(spark, rows)).collect()
    }
    assert got == ref
    # one-way corridors exist and score exactly 10⁶
    assert any(v[2] == 1_000_000 for v in got.values())


def test_od_asymmetry_matches_duckdb(spark):
    rows = _random_events(4006, n_users=35, n_events=1000)
    want = {
        tuple(r[:4]): tuple(r[4:])
        for r in _duck_events(
            rows,
            sql_od_asymmetry("SELECT user_id, event_id, ts FROM events"),
        )
    }
    got = {
        (r["ax"], r["ay"], r["bx"], r["by"]): (
            r["f_ab"],
            r["f_ba"],
            r["asym_ppm"],
        )
        for r in od_asymmetry(_events_df(spark, rows)).collect()
    }
    assert got == want


def test_batch40_plans_zero_python(spark):
    ev = _events_df(spark, _random_events(12))
    for df in (
        tile_weekend_ratio(ev),
        iet_spectrum(ev),
        od_asymmetry(ev),
    ):
        assert sum(audit_plan(df)["python_nodes"].values()) == 0
