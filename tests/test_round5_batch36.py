"""Round-5 batch 36: Z-range index scan pruning, adaptive
k-anonymity release levels, per-user Markov predictability."""

from __future__ import annotations

import datetime
import random
from collections import Counter, defaultdict

import duckdb

from workstealing_spatial_join_spark.operators.layout import (
    MORTON_BITS,
    _morton2,
    grid_index,
    zrange_decompose,
    zrange_predicate,
)
from workstealing_spatial_join_spark.operators.trajectory import (
    adaptive_k_anonymity,
    sql_adaptive_k_anonymity,
    sql_user_predictability,
    sticky_positions,
    user_predictability,
)
from workstealing_spatial_join_spark.plans.planner import audit_plan

ZPOINTS = "/root/repo/bench_data/zpoints"


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


# --------------------------------------------------- z-range scan


def test_zrange_decompose_covers_exhaustively():
    """Every Morton key of every cell in the rect is inside some
    range, at several budget caps, over random rects at bits=5
    (small enough to brute-force the whole key space)."""
    rng = random.Random(3601)
    bits, n = 5, 32
    for _ in range(150):
        x0 = rng.randrange(n)
        x1 = rng.randrange(x0, n)
        y0 = rng.randrange(n)
        y1 = rng.randrange(y0, n)
        want = {
            _morton2(x, y, bits)
            for x in range(x0, x1 + 1)
            for y in range(y0, y1 + 1)
        }
        for cap in (4, 16, 64):
            ranges = zrange_decompose(x0, x1, y0, y1, bits, cap)
            assert len(ranges) <= cap
            covered = set()
            for lo, hi in ranges:
                covered.update(range(lo, hi + 1))
            assert want <= covered


def test_zrange_full_grid_is_one_range():
    n = 32
    assert zrange_decompose(0, n - 1, 0, n - 1, 5, 8) == [
        (0, n * n - 1)
    ]


def test_zrange_scan_matches_plain_bbox(spark):
    lon0, lon1, lat0, lat1 = 12.5, 44.0, -8.0, 30.5
    df = spark.read.parquet(ZPOINTS)
    pred = zrange_predicate(lon0, lon1, lat0, lat1)
    import pyspark.sql.functions as F

    pruned = (
        df.where(F.expr(pred))
        .where(
            (F.col("lon") >= lon0)
            & (F.col("lon") < lon1)
            & (F.col("lat") >= lat0)
            & (F.col("lat") < lat1)
        )
        .select("point_id")
    )
    plain = df.where(
        (F.col("lon") >= lon0)
        & (F.col("lon") < lon1)
        & (F.col("lat") >= lat0)
        & (F.col("lat") < lat1)
    ).select("point_id")
    got = {r["point_id"] for r in pruned.collect()}
    want = {r["point_id"] for r in plain.collect()}
    assert got == want
    assert got  # the window is non-trivial


def test_zrange_predicate_reaches_pushed_filters(spark):
    import pyspark.sql.functions as F

    pred = zrange_predicate(12.5, 44.0, -8.0, 30.5)
    df = (
        spark.read.parquet(ZPOINTS)
        .where(F.expr(pred))
        .select("point_id", "zkey")
    )
    audit = audit_plan(df)
    assert audit["pushed_filters"] >= 1
    assert "zkey" in audit["plan"]


def test_zrange_grid_index_matches_engine_scaling():
    # the driver-side scaler is the IEEE twin of _scale_axis: spot
    # values incl. clamping at both poles
    assert grid_index(-180.0, -180.0, 360.0, MORTON_BITS) == 0
    assert (
        grid_index(180.0, -180.0, 360.0, MORTON_BITS)
        == (1 << MORTON_BITS) - 1
    )
    assert grid_index(0.0, -180.0, 360.0, MORTON_BITS) == 1 << (
        MORTON_BITS - 1
    )


# ---------------------------------------------- adaptive k-anon


def _kanon_ref(spark, rows, k=3):
    pos = sticky_positions(_events_df(spark, rows)).collect()
    visits = {(r["tx"], r["ty"], r["user_id"]) for r in pos}
    levels = [(0, 1), (1, 2), (2, 4), (3, 8), (4, 16), (5, 32)]
    users_at = defaultdict(set)
    for tx, ty, u in visits:
        for l, s in levels:
            users_at[(l, tx // s, ty // s)].add(u)
    out = {}
    for tile in {(tx, ty) for tx, ty, _ in visits}:
        for l, s in levels:
            n = len(users_at[(l, tile[0] // s, tile[1] // s)])
            if n >= k:
                out[tile] = (l, n)
                break
    return out


def test_k_anon_matches_reference(spark):
    # k=3 at this corpus density exercises two release levels
    # (probed: levels {2, 3}); the driver query runs k=5 at the
    # denser sf fixtures
    rows = _random_events(3602, n_users=30, n_events=700)
    got = {
        (r["tx"], r["ty"]): (r["release_level"], r["n_users_at_level"])
        for r in adaptive_k_anonymity(
            _events_df(spark, rows), k=3
        ).collect()
    }
    ref = _kanon_ref(spark, rows, k=3)
    assert got == ref
    # the fixture exercises more than one release level
    assert len({v[0] for v in got.values()}) >= 2


def test_k_anon_matches_duckdb(spark):
    rows = _random_events(3603, n_users=40, n_events=900)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events (event_id BIGINT, ts TIMESTAMP,"
        " user_id BIGINT, event_type VARCHAR, value DOUBLE,"
        " props VARCHAR)"
    )
    con.executemany("INSERT INTO events VALUES (?,?,?,?,?,?)", rows)
    want = {
        (r[0], r[1]): (r[2], r[3])
        for r in con.execute(
            sql_adaptive_k_anonymity(
                "SELECT user_id, event_id, ts FROM events", k=3
            )
        ).fetchall()
    }
    got = {
        (r["tx"], r["ty"]): (r["release_level"], r["n_users_at_level"])
        for r in adaptive_k_anonymity(
            _events_df(spark, rows), k=3
        ).collect()
    }
    assert got == want


def test_k_anon_boundary(spark):
    """Exactly k users on one tile release at level 0; k−1 users on
    an isolated tile must coarsen (or drop if the whole world never
    reaches k)."""
    base = datetime.datetime(2024, 1, 1)
    # users 1..5 share tile via congruence only if hand-picked; use
    # k distinct users each emitting ONE event → all rn=1 → epoch 0;
    # tiles are user-dependent, so instead set k=number of users and
    # check: with 5 users total, level-5 (whole world) has 5 users,
    # so EVERY tile releases at some level and none is dropped.
    rows = [
        (i, base + datetime.timedelta(minutes=i), 1 + i, "c", 0.0, "")
        for i in range(5)
    ]
    got = adaptive_k_anonymity(_events_df(spark, rows), k=5).collect()
    tiles = sticky_positions(_events_df(spark, rows)).select(
        "tx", "ty"
    ).distinct().count()
    assert len(got) == tiles
    assert all(r["n_users_at_level"] >= 5 for r in got)
    got4 = adaptive_k_anonymity(_events_df(spark, rows), k=6).collect()
    assert got4 == []  # the whole world never reaches 6 users


# ----------------------------------------- user predictability


def _pred_ref(spark, rows):
    pos = sticky_positions(_events_df(spark, rows)).collect()
    by_user = defaultdict(list)
    for r in pos:
        by_user[r["user_id"]].append((r["rn"], r["tx"], r["ty"]))
    out = {}
    for u, seq in by_user.items():
        seq.sort()
        trans = Counter()
        for (_, x0, y0), (_, x1, y1) in zip(seq, seq[1:]):
            if (x0, y0) != (x1, y1):
                trans[((x0, y0), (x1, y1))] += 1
        if not trans:
            continue
        per_from = defaultdict(Counter)
        for (a, b), n in trans.items():
            per_from[a][b] = n
        n_moves = sum(trans.values())
        n_top = sum(max(c.values()) for c in per_from.values())
        out[u] = (n_moves, n_top * 1_000_000 // n_moves)
    return out


def test_predictability_matches_reference(spark):
    rows = _random_events(3604, n_users=20, n_events=700)
    got = {
        r["user_id"]: (r["n_moves"], r["pred_ppm"])
        for r in user_predictability(_events_df(spark, rows)).collect()
    }
    assert got == _pred_ref(spark, rows)
    assert got


def test_predictability_matches_duckdb(spark):
    rows = _random_events(3605, n_users=30, n_events=900)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events (event_id BIGINT, ts TIMESTAMP,"
        " user_id BIGINT, event_type VARCHAR, value DOUBLE,"
        " props VARCHAR)"
    )
    con.executemany("INSERT INTO events VALUES (?,?,?,?,?,?)", rows)
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            sql_user_predictability(
                "SELECT user_id, event_id, ts FROM events"
            )
        ).fetchall()
    }
    got = {
        r["user_id"]: (r["n_moves"], r["pred_ppm"])
        for r in user_predictability(_events_df(spark, rows)).collect()
    }
    assert got == want


def test_predictability_deterministic_walker_is_unit(spark):
    """The sticky walk of a single user is DETERMINISTIC — every
    origin tile always transitions to the same next tile — so a
    1-Markov predictor is perfect and pred_ppm = 10⁶ exactly
    (n_top = n_moves). A genuine property of the fixture, and the
    upper-boundary pin for the statistic."""
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i, base + datetime.timedelta(minutes=i), 7, "c", 0.0, "")
        for i in range(200)
    ]
    out = user_predictability(_events_df(spark, rows)).collect()
    assert len(out) == 1
    assert out[0]["pred_ppm"] == 1_000_000


def test_batch36_plans_zero_python(spark):
    ev = _events_df(spark, _random_events(8))
    for df in (
        adaptive_k_anonymity(ev),
        user_predictability(ev),
    ):
        assert sum(audit_plan(df)["python_nodes"].values()) == 0
