"""Round-5 batch 28 (file numbering): co-presence contacts, gravity
residuals, Theil–Sen slope."""

from __future__ import annotations

import datetime
import random
from fractions import Fraction

import duckdb

from workstealing_spatial_join_spark.operators.trajectory import (
    SEN_LCM,
    SEN_MAX_GAP,
    co_presence,
    od_gravity,
    sen_slope,
    sql_co_presence,
    sql_od_gravity,
    sql_sen_slope,
    sticky_positions,
)
from workstealing_spatial_join_spark.plans.planner import audit_plan


def _events_df(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


def _random_events(seed, n_users=40, n_events=500):
    rng = random.Random(seed)
    base = datetime.datetime(2024, 1, 1)
    rows = []
    for i in range(n_events):
        rows.append(
            (
                i,
                base
                + datetime.timedelta(
                    days=rng.randrange(0, 25),
                    minutes=int(rng.randrange(1000)),
                ),
                rng.randrange(1, n_users + 1),
                "c",
                0.0,
                "",
            )
        )
    return rows


def _duck_events(rows, sql):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events (event_id BIGINT, ts TIMESTAMP,"
        " user_id BIGINT, event_type VARCHAR, value DOUBLE,"
        " props VARCHAR)"
    )
    con.executemany("INSERT INTO events VALUES (?,?,?,?,?,?)", rows)
    return con.execute(
        sql("SELECT user_id, event_id, ts FROM events")
    ).fetchall()


# ------------------------------------------------------- co-presence


def test_co_presence_reference_and_duckdb(spark):
    rows = _random_events(2801)  # 40 users: pairs (u, u+32) walk congruent tiles
    df = _events_df(spark, rows)
    got = {
        (r["user_a"], r["user_b"]): r["n_shared"]
        for r in co_presence(df).collect()
    }
    # python reference straight off sticky_positions
    pos = sticky_positions(df).collect()
    visits = {
        (r["user_id"], r["tx"], r["ty"],
         int(r["ts"].timestamp() * 1_000_000) // 86400000000)
        for r in pos
    }
    from collections import Counter

    ref: Counter = Counter()
    by_slot: dict = {}
    for u, tx, ty, day in visits:
        by_slot.setdefault((tx, ty, day), set()).add(u)
    for slot, users in by_slot.items():
        us = sorted(users)
        for i, ua in enumerate(us):
            for ub in us[i + 1:]:
                ref[(ua, ub)] += 1
    assert got == dict(ref)
    duck = {(r[0], r[1]): r[2] for r in _duck_events(rows, sql_co_presence)}
    assert duck == got
    assert got, "fixture must produce contacts"


def test_co_presence_distinct_not_event_weighted(spark):
    # one user visiting a tile 5 times on one day + another once:
    # exactly ONE shared slot, not 5
    base = datetime.datetime(2024, 1, 1)
    rows = []
    # users 1 and 33 share tile sequences (congruent residues mod 32)
    for i in range(5):
        rows.append((i, base + datetime.timedelta(minutes=i), 1,
                     "c", 0.0, ""))
    rows.append((9, base + datetime.timedelta(minutes=50), 33,
                 "c", 0.0, ""))
    out = co_presence(_events_df(spark, rows)).collect()
    assert len(out) == 1
    assert out[0]["user_a"] == 1 and out[0]["user_b"] == 33
    assert out[0]["n_shared"] == 1


def test_co_presence_plan_zero_python(spark):
    rows = _random_events(2802, n_users=4, n_events=40)
    audit = audit_plan(co_presence(_events_df(spark, rows)))
    assert sum(audit["python_nodes"].values()) == 0


# ----------------------------------------------------- gravity model


def test_gravity_reference_and_duckdb(spark):
    rows = _random_events(2803)
    df = _events_df(spark, rows)
    got = {
        (r["ftx"], r["fty"], r["ttx"], r["tty"]):
            (r["n_trips"], r["grav_ppm"])
        for r in od_gravity(df).collect()
    }
    duck = {
        (r[0], r[1], r[2], r[3]): (r[4], r[5])
        for r in _duck_events(rows, sql_od_gravity)
    }
    assert duck == got
    # marginal identity: sum of flows == T; each ppm is the exact floor
    flows = {k: v[0] for k, v in got.items()}
    t = sum(flows.values())
    from collections import Counter

    o: Counter = Counter()
    d: Counter = Counter()
    for (fx, fy, tx_, ty_), n in flows.items():
        o[(fx, fy)] += n
        d[(tx_, ty_)] += n
    for (fx, fy, tx_, ty_), (n, ppm) in got.items():
        assert ppm == n * t * 10**6 // (o[(fx, fy)] * d[(tx_, ty_)])


def test_gravity_unique_corridors_closed_form(spark):
    # a single user's walk makes every corridor unique (n_trips = 1)
    # with unit marginals wherever origin/destination tiles are also
    # unique — there grav_ppm is EXACTLY T·10⁶ (the sparse-matrix
    # closed form: 1·T·10⁶/(1·1))
    base = datetime.datetime(2024, 1, 1)
    rows = [(i, base + datetime.timedelta(minutes=i), 5, "c", 0.0, "")
            for i in range(64)]
    out = od_gravity(_events_df(spark, rows)).collect()
    assert out, "the walk must change tiles"
    t = sum(r["n_trips"] for r in out)
    from collections import Counter

    o: Counter = Counter()
    d: Counter = Counter()
    for r in out:
        o[(r["ftx"], r["fty"])] += r["n_trips"]
        d[(r["ttx"], r["tty"])] += r["n_trips"]
    for r in out:
        if (
            r["n_trips"] == 1
            and o[(r["ftx"], r["fty"])] == 1
            and d[(r["ttx"], r["tty"])] == 1
        ):
            assert r["grav_ppm"] == t * 10**6
    assert any(
        r["n_trips"] == 1
        and o[(r["ftx"], r["fty"])] == 1
        and d[(r["ttx"], r["tty"])] == 1
        for r in out
    ), "fixture must contain a unique corridor"


def test_gravity_plan_zero_python(spark):
    rows = _random_events(2805, n_users=4, n_events=40)
    audit = audit_plan(od_gravity(_events_df(spark, rows)))
    assert sum(audit["python_nodes"].values()) == 0


# -------------------------------------------------------- Sen slope


def _sen_ref(daily):
    """daily: {(tx,ty): {day: x}} → {(tx,ty): (n_days, n_pairs,
    sen_ppmd)} — exact Fraction arithmetic."""
    out = {}
    for tile, series in daily.items():
        days = sorted(series)
        slopes = []
        for i, da in enumerate(days):
            for db in days[i + 1:]:
                slopes.append(
                    Fraction(series[db] - series[da], db - da)
                )
        slopes.sort()
        n_pairs = len(slopes)
        if not slopes:
            out[tile] = (len(days), 0, 0)
            continue
        med = slopes[(n_pairs + 1) // 2 - 1]
        ppmd = (med * 10**6).__floor__()
        out[tile] = (len(days), n_pairs, ppmd)
    return out


def test_sen_matches_fraction_reference_and_duckdb(spark):
    rows = _random_events(2806)
    df = _events_df(spark, rows)
    got = {
        (r["tx"], r["ty"]): (r["n_days"], r["n_pairs"], r["sen_ppmd"])
        for r in sen_slope(df).collect()
    }
    # python reference from sticky positions
    pos = sticky_positions(df).collect()
    from collections import Counter

    daily: dict = {}
    for r in pos:
        day = int(r["ts"].timestamp() * 1_000_000) // 86400000000
        daily.setdefault((r["tx"], r["ty"]), Counter())[day] += 1
    assert got == _sen_ref(daily)
    duck = {
        (r[0], r[1]): (r[2], r[3], r[4])
        for r in _duck_events(rows, sql_sen_slope)
    }
    assert duck == got


def test_sen_even_pair_count_takes_lower_median(spark):
    # 4 days -> 6 pairs (even): the lower median (3rd of 6) must be
    # picked — this is the float-division bug trap (rn == (n+1)/2
    # with float / never matches on even counts and silently DROPS
    # the tile; caught in development, pinned here)
    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # single user, 8 events over 4 days: rn 1..8 = epochs 0-1, which
    # share ONE tile (ex = e div 3 and ey = e div 2 are both 0), so
    # that tile's series has 4 days -> 6 pairs (even)
    for day, cnt in ((0, 1), (1, 2), (2, 2), (3, 3)):
        for k in range(cnt):
            rows.append(
                (eid, base + datetime.timedelta(days=day, minutes=k),
                 7, "c", 0.0, "")
            )
            eid += 1
    out = sen_slope(_events_df(spark, rows)).collect()
    got = {(r["tx"], r["ty"]): (r["n_days"], r["n_pairs"], r["sen_ppmd"])
           for r in out}
    pos = sticky_positions(_events_df(spark, rows)).collect()
    from collections import Counter

    daily: dict = {}
    for r in pos:
        day = int(r["ts"].timestamp() * 1_000_000) // 86400000000
        daily.setdefault((r["tx"], r["ty"]), Counter())[day] += 1
    ref = _sen_ref(daily)
    assert got == ref
    # at least one tile genuinely has an even pair count
    assert any(v[1] > 0 and v[1] % 2 == 0 for v in got.values())
    # and the 4-day tile's lower median is the hand-derived 0.5/day:
    # series (1,2,2,3) -> slopes {1, .5, 2/3, 0, .5, 1} -> 3rd of 6
    assert any(v == (4, 6, 500_000) for v in got.values())


def test_sen_lcm_covers_every_gap():
    import math

    l = 1
    for g in range(1, SEN_MAX_GAP + 1):
        l = l * g // math.gcd(l, g)
    assert l == SEN_LCM
    for g in range(1, SEN_MAX_GAP + 1):
        assert SEN_LCM % g == 0
    assert SEN_LCM < 2**63


def test_sen_single_day_tile_zero(spark):
    base = datetime.datetime(2024, 1, 1)
    rows = [(i, base + datetime.timedelta(minutes=i), 3, "c", 0.0, "")
            for i in range(3)]
    out = sen_slope(_events_df(spark, rows)).collect()
    for r in out:
        assert r["n_days"] == 1
        assert r["n_pairs"] == 0
        assert r["sen_ppmd"] == 0


def test_sen_plan_zero_python(spark):
    rows = _random_events(2807, n_users=4, n_events=40)
    audit = audit_plan(sen_slope(_events_df(spark, rows)))
    assert sum(audit["python_nodes"].values()) == 0
