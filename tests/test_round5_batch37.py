"""Round-5 batch 37: co-visitation tile affinity, place lifecycle,
returner/explorer profiling."""

from __future__ import annotations

import datetime
import random
from collections import Counter, defaultdict

import duckdb

from workstealing_spatial_join_spark.operators.trajectory import (
    sql_tile_affinity,
    sql_tile_lifecycle,
    sql_user_explorer,
    sticky_positions,
    tile_affinity,
    tile_lifecycle,
    user_explorer,
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


def _visits(spark, rows):
    pos = sticky_positions(_events_df(spark, rows)).collect()
    return pos


# --------------------------------------------------- tile affinity


def _affinity_ref(spark, rows, min_common=2):
    pos = _visits(spark, rows)
    by_user = defaultdict(set)
    for r in pos:
        by_user[r["user_id"]].add((r["tx"], r["ty"]))
    pairs = Counter()
    for tiles in by_user.values():
        ordered = sorted(tiles)
        for i, a in enumerate(ordered):
            for b in ordered[i + 1 :]:
                pairs[(a, b)] += 1
    return {
        (a[0], a[1], b[0], b[1]): n
        for (a, b), n in pairs.items()
        if n >= min_common
    }


def test_affinity_matches_reference(spark):
    # 40 users > TILE_MOD=32 guarantees congruent user pairs (u, u+32)
    # whose tile sets coincide, so >=2-common pairs exist
    rows = _random_events(3701, n_users=40, n_events=900)
    got = {
        (r["ax"], r["ay"], r["bx"], r["by"]): r["n_common"]
        for r in tile_affinity(_events_df(spark, rows)).collect()
    }
    assert got == _affinity_ref(spark, rows)
    assert got


def test_affinity_matches_duckdb(spark):
    rows = _random_events(3702, n_users=45, n_events=1000)
    want = {
        tuple(r[:4]): r[4]
        for r in _duck_events(
            rows,
            sql_tile_affinity("SELECT user_id, event_id, ts FROM events"),
        )
    }
    got = {
        (r["ax"], r["ay"], r["bx"], r["by"]): r["n_common"]
        for r in tile_affinity(_events_df(spark, rows)).collect()
    }
    assert got == want


def test_affinity_counts_users_not_visits(spark):
    """One user visiting tiles A and B many times contributes ONE to
    the pair — the distinct-set semantics that separate affinity
    from co-occurrence volume. Two congruent users (u, u+32) walk
    the same tile sequence, so their shared pairs count exactly 2."""
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i, base + datetime.timedelta(minutes=i), 1 + 32 * (i % 2), "c", 0.0, "")
        for i in range(80)
    ]
    out = tile_affinity(_events_df(spark, rows)).collect()
    assert out
    assert all(r["n_common"] == 2 for r in out)


# -------------------------------------------------- tile lifecycle


def _lifecycle_ref(spark, rows):
    pos = _visits(spark, rows)
    days = defaultdict(set)
    for r in pos:
        day = int(r["ts"].timestamp() * 1_000_000) // 86400000000
        days[(r["tx"], r["ty"])].add(day)
    out = {}
    for tile, ds in days.items():
        s = sorted(ds)
        gaps = [b - a - 1 for a, b in zip(s, s[1:])]
        out[tile] = (s[0], s[-1], len(s), max(gaps) if gaps else 0)
    return out


def test_lifecycle_matches_reference(spark):
    rows = _random_events(3703, n_users=25, n_events=800, days=30)
    got = {
        (r["tx"], r["ty"]): (
            r["first_day"],
            r["last_day"],
            r["n_active_days"],
            r["max_gap_days"],
        )
        for r in tile_lifecycle(_events_df(spark, rows)).collect()
    }
    ref = _lifecycle_ref(spark, rows)
    assert got == ref
    # gaps genuinely occur at this sparsity
    assert any(v[3] > 0 for v in got.values())
    # and contiguous/single-day tiles report gap 0, not null
    assert any(v[3] == 0 for v in got.values())


def test_lifecycle_matches_duckdb(spark):
    rows = _random_events(3704, n_users=30, n_events=900, days=25)
    want = {
        (r[0], r[1]): tuple(r[2:])
        for r in _duck_events(
            rows,
            sql_tile_lifecycle("SELECT user_id, event_id, ts FROM events"),
        )
    }
    got = {
        (r["tx"], r["ty"]): (
            r["first_day"],
            r["last_day"],
            r["n_active_days"],
            r["max_gap_days"],
        )
        for r in tile_lifecycle(_events_df(spark, rows)).collect()
    }
    assert got == want


# -------------------------------------------------- user explorer


def _explorer_ref(spark, rows):
    pos = _visits(spark, rows)
    visits = Counter()
    tiles = defaultdict(set)
    for r in pos:
        visits[r["user_id"]] += 1
        tiles[r["user_id"]].add((r["tx"], r["ty"]))
    return {
        u: (n, len(tiles[u]), len(tiles[u]) * 1_000_000 // n)
        for u, n in visits.items()
    }


def test_explorer_matches_reference(spark):
    rows = _random_events(3705, n_users=20, n_events=700)
    got = {
        r["user_id"]: (r["n_visits"], r["n_tiles"], r["explore_ppm"])
        for r in user_explorer(_events_df(spark, rows)).collect()
    }
    assert got == _explorer_ref(spark, rows)


def test_explorer_matches_duckdb(spark):
    rows = _random_events(3706, n_users=30, n_events=900)
    want = {
        r[0]: tuple(r[1:])
        for r in _duck_events(
            rows,
            sql_user_explorer("SELECT user_id, event_id, ts FROM events"),
        )
    }
    got = {
        r["user_id"]: (r["n_visits"], r["n_tiles"], r["explore_ppm"])
        for r in user_explorer(_events_df(spark, rows)).collect()
    }
    assert got == want


def test_batch37_plans_zero_python(spark):
    ev = _events_df(spark, _random_events(9))
    for df in (
        tile_affinity(ev),
        tile_lifecycle(ev),
        user_explorer(ev),
    ):
        assert sum(audit_plan(df)["python_nodes"].values()) == 0
