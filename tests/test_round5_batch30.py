"""Round-5 batch 30 (file numbering): emerging-hot-spot classes,
tile burst days, image→hotspot distance enrichment."""

from __future__ import annotations

import datetime
import random

import duckdb

from workstealing_spatial_join_spark.operators.trajectory import (
    BURST_MULT,
    HOT_MULT,
    emerging_hotspots,
    sql_emerging_hotspots,
    sql_tile_bursts,
    sticky_positions,
    tile_bursts,
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


def _duck(rows, sql):
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


def _daily_ref(spark, rows):
    from collections import Counter

    pos = sticky_positions(_events_df(spark, rows)).collect()
    daily: dict = {}
    for r in pos:
        day = int(r["ts"].timestamp() * 1_000_000) // 86400000000
        daily.setdefault((r["tx"], r["ty"]), Counter())[day] += 1
    return daily


# ---------------------------------------------- emerging hot spots


def test_emerging_matches_reference_and_duckdb(spark):
    rows = _random_events(3001)
    df = _events_df(spark, rows)
    got = {
        (r["tx"], r["ty"]): (r["n_visits"], r["mk_s"], r["cls"])
        for r in emerging_hotspots(df).collect()
    }
    daily = _daily_ref(spark, rows)
    s_tot = sum(sum(c.values()) for c in daily.values())
    t = len(daily)
    ref = {}
    for tile, series in daily.items():
        days = sorted(series)
        mk = sum(
            (series[db] > series[da]) - (series[db] < series[da])
            for i, da in enumerate(days)
            for db in days[i + 1:]
        )
        n = sum(series.values())
        hot = n * t >= HOT_MULT * s_tot
        if hot and mk > 0:
            cls = "INTENSIFYING"
        elif hot and mk == 0:
            cls = "PERSISTENT"
        elif hot:
            cls = "DIMINISHING"
        elif mk > 0:
            cls = "EMERGING"
        else:
            cls = "NONE"
        ref[tile] = (n, mk, cls)
    assert got == ref
    duck = {
        (r[0], r[1]): (r[2], r[3], r[4])
        for r in _duck(rows, sql_emerging_hotspots)
    }
    assert duck == got
    # classification does real work: more than one class appears
    assert len({v[2] for v in got.values()}) >= 2


def test_emerging_crafted_classes(spark):
    # one user's tile visited heavily with rising series -> its tile
    # must be hot with positive trend (INTENSIFYING)
    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # heavy rising tile: user 1, 1/2/4 events on days 0/1/2 inside
    # epoch 0-1 (first 8 events share a tile — 1+2+4=7 < 8... use 7)
    for day, cnt in ((0, 1), (1, 2), (2, 4)):
        for k in range(cnt):
            rows.append(
                (eid, base + datetime.timedelta(days=day, minutes=k),
                 1, "c", 0.0, "")
            )
            eid += 1
    # background: several light single-visit users far away in user
    # space (different residues) so the corpus mean stays low
    for u in range(2, 12):
        rows.append(
            (eid, base + datetime.timedelta(days=5, minutes=u),
             u, "c", 0.0, "")
        )
        eid += 1
    out = {
        (r["tx"], r["ty"]): r["cls"]
        for r in emerging_hotspots(_events_df(spark, rows)).collect()
    }
    assert "INTENSIFYING" in out.values()


def test_emerging_plan_zero_python(spark):
    rows = _random_events(3002, n_users=4, n_events=40)
    audit = audit_plan(emerging_hotspots(_events_df(spark, rows)))
    assert sum(audit["python_nodes"].values()) == 0


# ---------------------------------------------------- burst days


def test_bursts_match_reference_and_duckdb(spark):
    rows = _random_events(3003)
    df = _events_df(spark, rows)
    got = {
        (r["tx"], r["ty"], r["day"]):
            (r["x"], r["tile_total"], r["n_days"])
        for r in tile_bursts(df).collect()
    }
    daily = _daily_ref(spark, rows)
    ref = {}
    for tile, series in daily.items():
        tot = sum(series.values())
        nd = len(series)
        if nd < 2:
            continue
        for day, x in series.items():
            if x * nd >= BURST_MULT * tot:
                ref[(tile[0], tile[1], day)] = (x, tot, nd)
    assert got == ref
    duck = {
        (r[0], r[1], r[2]): (r[3], r[4], r[5])
        for r in _duck(rows, sql_tile_bursts)
    }
    assert duck == got


def test_bursts_exact_threshold_boundary(spark):
    # target: a tile with series (1, 2, 1, 12) -> tot 16, n_days 4,
    # and the 12-day lands EXACTLY on the gate (12·4 = 48 = 3·16).
    # One user's epochs 0-1 hold only 8 events, so the tile is fed
    # by the congruent user pair (1, 33), which walks the same tiles
    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for day, cnt in ((0, 1), (1, 2), (2, 1), (3, 4)):   # user 1: 8
        for k in range(cnt):
            rows.append(
                (eid, base + datetime.timedelta(days=day, minutes=k),
                 1, "c", 0.0, "")
            )
            eid += 1
    for k in range(8):                                   # user 33: 8
        rows.append(
            (eid, base + datetime.timedelta(days=3, minutes=30 + k),
             33, "c", 0.0, "")
        )
        eid += 1
    out = tile_bursts(_events_df(spark, rows)).collect()
    daily = _daily_ref(spark, rows)
    ref = set()
    for tile, series in daily.items():
        tot = sum(series.values())
        nd = len(series)
        if nd < 2:
            continue
        for day, x in series.items():
            if x * nd >= BURST_MULT * tot:
                ref.add((tile[0], tile[1], day))
    assert {(r["tx"], r["ty"], r["day"]) for r in out} == ref
    assert ref, "the crafted 9-event day must burst somewhere"
    # and at least one crafted bucket sits exactly AT the gate
    assert any(
        x * nd == BURST_MULT * tot
        for tile, series in daily.items()
        if (nd := len(series)) >= 2
        for tot in [sum(series.values())]
        for x in series.values()
    )


def test_bursts_plan_zero_python(spark):
    rows = _random_events(3004, n_users=4, n_events=40)
    audit = audit_plan(tile_bursts(_events_df(spark, rows)))
    assert sum(audit["python_nodes"].values()) == 0


# ------------------------------------------- image hotspot distance


def test_img_hotspot_dist_composition(spark):
    # build a tiny field + images by hand through the driver query
    # machinery: closer images get smaller hops, unreachable absent
    import __spark_entry__ as E

    out = E.q_img_hotspot_dist(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert rows, "some images must land in the reachable band"
    hops = {r["hop"] for r in rows}
    assert min(hops) == 0, "images inside hot cells must read hop 0"
    # every hop within the BFS bound
    assert all(0 <= r["hop"] <= 8 for r in rows)
    # join keys dropped, exactly the advertised schema
    assert out.columns == ["image_id", "hop"]
