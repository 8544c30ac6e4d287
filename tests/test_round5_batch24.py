"""Round-5 batch 24: zonal majority, radius of gyration, OD top
destinations."""

from __future__ import annotations

from workstealing_spatial_join_spark.operators.spatialstats import (
    radius_of_gyration,
    sql_radius_of_gyration,
    sql_zonal_majority,
    zonal_majority,
)
from workstealing_spatial_join_spark.plans.planner import audit_plan

# ---------------------------------------------------- zonal majority


def test_majority_tiebreak_smallest_category(spark):
    rows = [
        # zone (0,0): b×2, a×2 → tie → 'a' wins (smallest)
        (0, 0, "b"), (0, 0, "b"), (0, 0, "a"), (0, 0, "a"),
        # zone (1,0): clear winner 'z'
        (1, 0, "z"), (1, 0, "z"), (1, 0, "a"),
    ]
    df = spark.createDataFrame(rows, "cx long, cy long, cat string")
    got = {
        (r["cx"], r["cy"]): (r["major_cat"], r["n_major"], r["n_total"])
        for r in zonal_majority(df).collect()
    }
    assert got == {(0, 0): ("a", 2, 4), (1, 0): ("z", 2, 3)}


def test_majority_duckdb_twin(spark):
    import duckdb

    rows = [
        (0, 0, "b"), (0, 0, "b"), (0, 0, "a"), (0, 0, "a"),
        (1, 0, "z"), (1, 0, "z"), (1, 0, "a"),
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE zsrc (cx BIGINT, cy BIGINT, cat VARCHAR)")
    con.executemany("INSERT INTO zsrc VALUES (?, ?, ?)", rows)
    got = {
        (r[0], r[1]): (r[2], r[3], r[4])
        for r in con.execute(
            sql_zonal_majority("SELECT * FROM zsrc")
        ).fetchall()
    }
    assert got == {(0, 0): ("a", 2, 4), (1, 0): ("z", 2, 3)}


def test_majority_single_exchange(spark):
    df = spark.createDataFrame(
        [(0, 0, "a")], "cx long, cy long, cat string"
    )
    audit = audit_plan(zonal_majority(df))
    assert audit["exchanges"] == 1
    assert sum(audit["python_nodes"].values()) == 0


# ------------------------------------------------- radius of gyration


def _rog_ref(pts_by_group):
    out = {}
    for g, pts in pts_by_group.items():
        n = len(pts)
        sx = sum(p[0] for p in pts)
        sy = sum(p[1] for p in pts)
        num = sum((n * x - sx) ** 2 + (n * y - sy) ** 2 for x, y in pts)
        out[g] = (n, num // (n * n * n))
    return out


def test_rog_exact_reference_and_duckdb(spark):
    import duckdb
    import random

    rng = random.Random(240)
    rows = []
    groups: dict[int, list] = {}
    for g in range(1, 11):
        for _ in range(rng.randrange(1, 30)):
            p = (rng.randrange(0, 200_000), rng.randrange(0, 200_000))
            rows.append((g, p[0], p[1]))
            groups.setdefault(g, []).append(p)
    ref = _rog_ref(groups)
    df = spark.createDataFrame(rows, "user_id long, mx long, my long")
    got = {
        r["user_id"]: (r["n_pts"], r["rog2_milli2"])
        for r in radius_of_gyration(df).collect()
    }
    assert got == ref
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE gsrc (user_id BIGINT, mx BIGINT, my BIGINT)"
    )
    con.executemany("INSERT INTO gsrc VALUES (?, ?, ?)", rows)
    duck = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            sql_radius_of_gyration("SELECT * FROM gsrc")
        ).fetchall()
    }
    assert duck == ref


def test_rog_single_point_zero(spark):
    df = spark.createDataFrame(
        [(1, 12345, -6789)], "user_id long, mx long, my long"
    )
    r = radius_of_gyration(df).collect()[0]
    assert (r["n_pts"], r["rog2_milli2"]) == (1, 0)


def test_rog_homebody_vs_traveler(spark):
    rows = [(1, 0, 0), (1, 10, 0), (1, 0, 10), (1, 10, 10)] + [
        (2, 0, 0), (2, 100_000, 0), (2, 0, 100_000), (2, 100_000, 100_000)
    ]
    df = spark.createDataFrame(rows, "user_id long, mx long, my long")
    got = {
        r["user_id"]: r["rog2_milli2"]
        for r in radius_of_gyration(df).collect()
    }
    assert got[2] > got[1] * 10**6  # the traveler's rog² dwarfs


# ------------------------------------------------- od top destinations


def test_od_topk_plan_and_cap(spark):
    import __spark_entry__ as E

    rows = E.queries()["od_top_destinations"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    per_origin: dict[tuple, list] = {}
    for r in rows:
        per_origin.setdefault((r["ftx"], r["fty"]), []).append(
            (r["rk"], r["n_trips"], r["ttx"], r["tty"])
        )
    assert per_origin
    for v in per_origin.values():
        v.sort()
        assert len(v) <= 3
        assert [rk for rk, *_ in v] == list(range(1, len(v) + 1))
        # n_trips non-increasing down the ranks
        trips = [t for _, t, *_ in v]
        assert trips == sorted(trips, reverse=True)
    df = E.queries()["od_top_destinations"](
        spark, "/root/testdata/sf0.001"
    )
    assert sum(audit_plan(df)["python_nodes"].values()) == 0


def test_batch24_driver_plans_zero_python(spark):
    import __spark_entry__ as E

    for name in ("zonal_majority", "user_rog"):
        df = E.queries()[name](spark, "/root/testdata/sf0.001")
        assert sum(audit_plan(df)["python_nodes"].values()) == 0, name


# ------------------------------------------------ batch 25 additions


def test_home_tile_tiebreak_lexicographic(spark, monkeypatch):
    import datetime as dt

    import __spark_entry__ as E
    from workstealing_spatial_join_spark.sources import tables as TB

    # user 3: 8 events = epochs 0,1 → two tiles, 4 events each (tie).
    # Winner must be the lexicographically smaller (tx, ty).
    ev = spark.createDataFrame(
        [(3, i, dt.datetime(2024, 1, 1, 0, i)) for i in range(8)],
        "user_id long, event_id long, ts timestamp",
    )
    monkeypatch.setattr(TB, "load", lambda sp, sf, t: ev)
    from workstealing_spatial_join_spark.operators.trajectory import (
        sticky_positions,
    )

    tiles = sorted(
        {(r["tx"], r["ty"]) for r in sticky_positions(ev).collect()}
    )
    rows = E.q_user_home_tile(spark, "ignored").collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["home_tx"], r["home_ty"]) == tiles[0]
    assert (r["n_home_events"], r["n_events"]) == (
        (8, 8) if len(tiles) == 1 else (4, 8)
    )


def test_dbscan_cluster_stats_consistency(spark):
    import __spark_entry__ as E
    from workstealing_spatial_join_spark.sources import tables as TB

    sf = "/root/testdata/sf0.001"
    stats = E.queries()["dbscan_cluster_stats"](spark, sf).collect()
    labeled = E.queries()["dbscan_points"](spark, sf).collect()
    assert sum(r["n_pts"] for r in stats) == len(labeled)
    by_cluster: dict = {}
    for r in labeled:
        by_cluster.setdefault(r["cluster"], []).append(r["role"])
    for r in stats:
        roles = by_cluster[r["cluster"]]
        assert r["n_pts"] == len(roles)
        assert r["n_core"] == sum(1 for x in roles if x == "core")
        assert r["minx"] <= r["cent_x"] <= r["maxx"]
        assert r["miny"] <= r["cent_y"] <= r["maxy"]


# ---------------------------------------------------- knox statistic


def _knox_ref(events):
    """Brute pair enumeration over (tx, ty, day) event rows."""
    import itertools

    n = len(events)
    ps = pt = pb = 0
    for a, b in itertools.combinations(events, 2):
        sc = abs(a[0] - b[0]) <= 1 and abs(a[1] - b[1]) <= 1
        tc = abs(a[2] - b[2]) <= 1
        ps += sc
        pt += tc
        pb += sc and tc
    npairs = n * (n - 1) // 2
    return (
        n, ps, pt, pb, (pb * npairs * 10**6) // (ps * pt)
    )


def _knox_run(spark, events):
    from workstealing_spatial_join_spark.operators.spatialstats import (
        knox_statistic,
    )

    cube = (
        spark.createDataFrame(events, "tx long, ty long, day long")
        .groupBy("tx", "ty", "day")
        .agg(__import__("pyspark.sql.functions", fromlist=["F"]).count("*").alias("n"))
    )
    r = knox_statistic(cube).collect()[0]
    return (
        r["n_events"], r["pairs_space"], r["pairs_time"],
        r["pairs_both"], r["knox_ppm"],
    )


def test_knox_matches_brute_reference(spark):
    import random

    rng = random.Random(250)
    events = [
        (rng.randrange(0, 6), rng.randrange(0, 6), rng.randrange(0, 8))
        for _ in range(120)
    ]
    assert _knox_run(spark, events) == _knox_ref(events)


def test_knox_duckdb_twin(spark):
    import duckdb

    import random

    from workstealing_spatial_join_spark.operators.spatialstats import (
        sql_knox_statistic,
    )

    rng = random.Random(251)
    events = [
        (rng.randrange(0, 5), rng.randrange(0, 5), rng.randrange(0, 6))
        for _ in range(90)
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE ev (tx BIGINT, ty BIGINT, day BIGINT)")
    con.executemany("INSERT INTO ev VALUES (?, ?, ?)", events)
    duck = con.execute(
        sql_knox_statistic(
            "SELECT tx, ty, day, COUNT(*) AS n FROM ev GROUP BY 1, 2, 3"
        )
    ).fetchone()
    assert tuple(duck) == _knox_ref(events)


def test_knox_interaction_detected_in_fixture(spark):
    """The sticky-epoch fixture couples tiles to event order, so a
    user's same-tile events are also time-adjacent — real space-time
    interaction the statistic must detect (ppm well above 10⁶)."""
    import __spark_entry__ as E

    r = E.queries()["knox_spacetime"](
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert r["knox_ppm"] > 1_200_000


def test_knox_plan_zero_python(spark):
    import __spark_entry__ as E

    df = E.queries()["knox_spacetime"](spark, "/root/testdata/sf0.001")
    assert sum(audit_plan(df)["python_nodes"].values()) == 0
