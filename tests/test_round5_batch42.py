"""Round-5 batch 42: distance decay of co-location ties, travel
companion detection."""

from __future__ import annotations

import datetime
import random
from collections import Counter, defaultdict

import duckdb

from workstealing_spatial_join_spark.operators.trajectory import (
    co_travelers,
    distance_decay,
    sql_co_travelers,
    sql_distance_decay,
    sticky_positions,
    user_similarity,
)
from workstealing_spatial_join_spark.plans.planner import audit_plan


def _events_df(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


def _random_events(seed, n_users=40, n_events=900):
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


def _duck_events(rows, sql_text):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events (event_id BIGINT, ts TIMESTAMP,"
        " user_id BIGINT, event_type VARCHAR, value DOUBLE,"
        " props VARCHAR)"
    )
    con.executemany("INSERT INTO events VALUES (?,?,?,?,?,?)", rows)
    return con.execute(sql_text).fetchall()


# ------------------------------------------------ distance decay


def _decay_ref(spark, rows):
    sims = {
        (r["user_a"], r["user_b"]): r["jac_ppm"]
        for r in user_similarity(_events_df(spark, rows)).collect()
    }
    pos = sticky_positions(_events_df(spark, rows)).collect()
    counts = defaultdict(Counter)
    for r in pos:
        counts[r["user_id"]][(r["tx"], r["ty"])] += 1
    home = {
        u: min((-n, t) for t, n in c.items())[1]
        for u, c in counts.items()
    }
    buckets = defaultdict(lambda: [0, 0])
    for (a, b), jac in sims.items():
        ha, hb = home[a], home[b]
        cheb = max(abs(ha[0] - hb[0]), abs(ha[1] - hb[1]))
        bk = 0 if cheb == 0 else cheb.bit_length()
        buckets[bk][0] += 1
        buckets[bk][1] += jac
    return {
        bk: (n, sj // n) for bk, (n, sj) in buckets.items()
    }


def test_distance_decay_matches_reference(spark):
    rows = _random_events(4201)
    got = {
        r["bucket"]: (r["n_pairs"], r["mean_jac_ppm"])
        for r in distance_decay(_events_df(spark, rows)).collect()
    }
    ref = _decay_ref(spark, rows)
    assert got == ref
    assert got
    # several distance octaves are populated (the curve has support;
    # MONOTONE decay is a property of real social data, not of the
    # congruence fixture — the identical-footprint twins sit at
    # bucket 0, but near-home non-twin pairs dilute its mean)
    assert len(got) >= 2 and 0 in got


def test_distance_decay_matches_duckdb(spark):
    rows = _random_events(4202, n_users=45, n_events=1000)
    want = {
        r[0]: (r[1], r[2])
        for r in _duck_events(
            rows,
            sql_distance_decay("SELECT user_id, event_id, ts FROM events"),
        )
    }
    got = {
        r["bucket"]: (r["n_pairs"], r["mean_jac_ppm"])
        for r in distance_decay(_events_df(spark, rows)).collect()
    }
    assert got == want


# -------------------------------------------------- co-travelers


def _travel_ref(spark, rows, min_tiles=2):
    pos = sticky_positions(_events_df(spark, rows)).collect()
    visits = defaultdict(set)
    for r in pos:
        day = int(r["ts"].timestamp() * 1_000_000) // 86400000000
        visits[r["user_id"]].add((r["tx"], r["ty"], day))
    users = sorted(visits)
    out = {}
    for i, a in enumerate(users):
        for b in users[i + 1 :]:
            shared = visits[a] & visits[b]
            tiles = {(tx, ty) for tx, ty, _ in shared}
            if len(tiles) >= min_tiles:
                out[(a, b)] = (len(shared), len(tiles))
    return out


def test_co_travelers_matches_reference(spark):
    rows = _random_events(4203)
    got = {
        (r["user_a"], r["user_b"]): (
            r["n_shared_slots"],
            r["n_shared_tiles"],
        )
        for r in co_travelers(_events_df(spark, rows)).collect()
    }
    ref = _travel_ref(spark, rows)
    assert got == ref
    assert got  # congruent users co-move by construction


def test_co_travelers_excludes_single_place_pairs(spark):
    """Two users sharing only ONE tile (however many days) never
    qualify: a crafted pair with 4 shared same-tile days is absent;
    the reference confirms the engine's gate is the tile count, not
    the slot count."""
    rows = _random_events(4204, n_users=35, n_events=800)
    ref_all = _travel_ref(spark, rows, min_tiles=1)
    one_place = {
        k for k, (_s, t) in ref_all.items() if t == 1
    }
    got = {
        (r["user_a"], r["user_b"])
        for r in co_travelers(_events_df(spark, rows)).collect()
    }
    assert got.isdisjoint(one_place)
    assert got == {
        k for k, (_s, t) in ref_all.items() if t >= 2
    }


def test_co_travelers_matches_duckdb(spark):
    rows = _random_events(4205, n_users=45, n_events=1000)
    want = {
        (r[0], r[1]): (r[2], r[3])
        for r in _duck_events(
            rows,
            sql_co_travelers("SELECT user_id, event_id, ts FROM events"),
        )
    }
    got = {
        (r["user_a"], r["user_b"]): (
            r["n_shared_slots"],
            r["n_shared_tiles"],
        )
        for r in co_travelers(_events_df(spark, rows)).collect()
    }
    assert got == want


def test_batch42_plans_zero_python(spark):
    ev = _events_df(spark, _random_events(14))
    for df in (distance_decay(ev), co_travelers(ev)):
        assert sum(audit_plan(df)["python_nodes"].values()) == 0


# ------------------------------------------- user activity gini


def test_user_activity_gini_matches_reference(spark):
    from fractions import Fraction

    from workstealing_spatial_join_spark.operators.trajectory import (
        user_activity_gini,
    )

    rows = _random_events(4206, n_users=30, n_events=800)
    counts = Counter(r[2] for r in rows)
    xs = sorted(counts.values())
    n, s = len(xs), sum(xs)
    num = 2 * sum((i + 1) * x for i, x in enumerate(xs)) - (n + 1) * s
    want = int(Fraction(num * 1_000_000, n * s))
    row = user_activity_gini(_events_df(spark, rows)).collect()[0]
    assert (row["n_users"], row["s_tot"], row["gini_ppm"]) == (
        n,
        s,
        want,
    )


def test_user_activity_gini_bounds(spark):
    from workstealing_spatial_join_spark.operators.trajectory import (
        user_activity_gini,
    )

    base = datetime.datetime(2024, 1, 1)
    # perfectly equal: 4 users × 5 events → G = 0
    eq = [
        (i, base + datetime.timedelta(minutes=i), 1 + i % 4, "c", 0.0, "")
        for i in range(20)
    ]
    assert (
        user_activity_gini(_events_df(spark, eq)).collect()[0]["gini_ppm"]
        == 0
    )


def test_user_activity_gini_matches_duckdb(spark):
    from workstealing_spatial_join_spark.operators.trajectory import (
        sql_user_activity_gini,
        user_activity_gini,
    )

    rows = _random_events(4207, n_users=40, n_events=900)
    want = _duck_events(
        rows, sql_user_activity_gini("SELECT user_id FROM events")
    )[0]
    row = user_activity_gini(_events_df(spark, rows)).collect()[0]
    assert (row["n_users"], row["s_tot"], row["gini_ppm"]) == tuple(want)
