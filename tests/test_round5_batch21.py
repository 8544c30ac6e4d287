"""Round-5 batch 21: STR bulk-load leaf packing (exact distributed
global rank) and Mann-Kendall emerging-hot-spot trends."""

from __future__ import annotations

import datetime as dt
import itertools

from workstealing_spatial_join_spark.operators.layout import (
    exact_global_rank,
    str_pack_leaves,
    sql_str_pack_leaves,
)
from workstealing_spatial_join_spark.operators.trajectory import (
    mk_trend,
)
from workstealing_spatial_join_spark.plans.planner import audit_plan

# ------------------------------------------------------ global rank


def test_exact_global_rank_random_with_ties(spark):
    import random

    rng = random.Random(210)
    rows = [(i, rng.randrange(0, 40)) for i in range(1, 301)]
    df = spark.createDataFrame(rows, "point_id long, mx long")
    got = {
        r["point_id"]: r["g_rank"]
        for r in exact_global_rank(
            df, "mx", "point_id", partitions=7
        ).collect()
    }
    expect = {
        pid: rank
        for rank, (mx, pid) in enumerate(
            sorted((mx, pid) for pid, mx in rows)
        )
    }
    assert got == expect


def test_exact_global_rank_is_a_permutation(spark):
    df = spark.createDataFrame(
        [(i, 5) for i in range(1, 101)], "point_id long, mx long"
    )  # ALL values tied: tiebreak column must still yield 0..99
    ranks = sorted(
        r["g_rank"]
        for r in exact_global_rank(df, "mx", "point_id").collect()
    )
    assert ranks == list(range(100))


# -------------------------------------------------------------- STR


def _str_ref(points, cap):
    """Independent python STR packing over (x, y) pairs."""
    n = len(points)
    m = (n + cap - 1) // cap
    import math

    s = math.isqrt(m)
    if s * s < m:
        s += 1
    by_x = sorted(points)
    leaves = {}
    slices: dict[int, list] = {}
    for rank_x, p in enumerate(by_x):
        slices.setdefault(rank_x * s // n, []).append(p)
    for sl, pts in slices.items():
        pts.sort(key=lambda p: (p[1], p[0]))
        for i, p in enumerate(pts):
            leaves.setdefault((sl, i // cap), []).append(p)
    return {
        k: (
            len(v),
            min(p[0] for p in v),
            min(p[1] for p in v),
            max(p[0] for p in v),
            max(p[1] for p in v),
        )
        for k, v in leaves.items()
    }


def _collect_str(spark, pts, cap):
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(pts, 1)],
        "point_id long, mx long, my long",
    )
    return {
        (r["slice"], r["leaf"]): (
            r["n_pts"], r["minx"], r["miny"], r["maxx"], r["maxy"]
        )
        for r in str_pack_leaves(df, leaf_cap=cap).collect()
    }


def test_str_matches_python_reference(spark):
    import random

    rng = random.Random(211)
    pts = [
        (rng.randrange(0, 10_000), rng.randrange(0, 10_000))
        for _ in range(500)
    ]
    # distinct coordinates so the reference order is unambiguous
    pts = list(dict.fromkeys(pts))
    assert _collect_str(spark, pts, 16) == _str_ref(pts, 16)


def test_str_duplicate_coordinates_deterministic(spark):
    """Duplicate (x, y) rows may be ranked either way across
    engines/partitionings, but leaf AGGREGATES are invariant under
    swapping identical points — two runs and the DuckDB twin must
    agree exactly."""
    import duckdb

    pts = [(100, 100)] * 40 + [(200, 200)] * 40 + [(300, 100)] * 17
    a = _collect_str(spark, pts, 8)
    b = _collect_str(spark, pts, 8)
    assert a == b
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE pt_src (point_id BIGINT, mx BIGINT, my BIGINT)"
    )
    con.executemany(
        "INSERT INTO pt_src VALUES (?, ?, ?)",
        [(i, x, y) for i, (x, y) in enumerate(pts, 1)],
    )
    duck = {
        (r[0], r[1]): tuple(r[2:])
        for r in con.execute(
            sql_str_pack_leaves("SELECT * FROM pt_src", leaf_cap=8)
        ).fetchall()
    }
    assert duck == a


def test_str_leaf_capacity_respected(spark):
    import random

    rng = random.Random(212)
    pts = [
        (rng.randrange(0, 100_000), rng.randrange(0, 100_000))
        for _ in range(777)
    ]
    got = _collect_str(spark, pts, 32)
    assert all(v[0] <= 32 for v in got.values())
    assert sum(v[0] for v in got.values()) == len(pts)


def test_str_plan_zero_python(spark):
    import __spark_entry__ as E

    df = E.queries()["str_pack_leaves"](spark, "/root/testdata/sf0.001")
    assert sum(audit_plan(df)["python_nodes"].values()) == 0


# --------------------------------------------------------------- MK


def _mk_ref(series):
    return sum(
        (b > a) - (b < a) for a, b in itertools.combinations(series, 2)
    )


def test_mk_reference_shapes():
    assert _mk_ref([1, 2, 3, 4]) == 6
    assert _mk_ref([4, 3, 2, 1]) == -6
    assert _mk_ref([2, 2, 2]) == 0
    assert _mk_ref([1, 3, 2]) == 1


def test_mk_trend_crafted(spark, monkeypatch):
    """One user pinned to one tile (few events per day → epochs
    advance slowly, but we only need the daily counts): craft event
    days so the tile's daily series is strictly increasing."""
    from workstealing_spatial_join_spark.operators import trajectory as TJ

    rows = []
    eid = 0
    # user 5, 1+2+3 events on three consecutive days — few enough
    # that every event stays in epoch 0 (rn ≤ 4 ⇒ e = 0): one tile
    for day, cnt in ((1, 1), (2, 2), (3, 1)):
        for k in range(cnt):
            rows.append((5, eid, dt.datetime(2024, 1, day, 10, k)))
            eid += 1
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp"
    )
    got = {
        (r["tx"], r["ty"]): (r["n_days"], r["mk_s"], r["cls"])
        for r in mk_trend(ev).collect()
    }
    # all 4 events in epoch 0 → single tile; daily series (1, 2, 1):
    # pairs (1,2)+1 (1,1)0 (2,1)-1 → S = 0 → FLAT
    assert len(got) == 1
    assert list(got.values())[0] == (3, _mk_ref([1, 2, 1]), "FLAT")
    assert _mk_ref([1, 2, 1]) == 0


def test_mk_trend_inc_and_dec(spark):
    rows = []
    eid = 0
    # user 7: days 1..3 with rising counts 1,2,3 — but 6 events cross
    # an epoch boundary (rn 5,6 → epoch 1) and epoch 0→1 SHARES the
    # tile (e=0: ex=0, ey=0; e=1: ex=0, ey=0) so still one tile
    for day, cnt in ((1, 1), (2, 2), (3, 3)):
        for k in range(cnt):
            rows.append((7, eid, dt.datetime(2024, 1, day, 10, k)))
            eid += 1
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp"
    )
    got = [
        (r["n_days"], r["mk_s"], r["cls"])
        for r in mk_trend(ev).collect()
    ]
    assert got == [(3, 3, "INC")]


def test_mk_single_day_tile_flat_zero(spark):
    ev = spark.createDataFrame(
        [(9, 1, dt.datetime(2024, 3, 1))],
        "user_id long, event_id long, ts timestamp",
    )
    got = [
        (r["n_days"], r["mk_s"], r["cls"])
        for r in mk_trend(ev).collect()
    ]
    assert got == [(1, 0, "FLAT")]


def test_mk_plan_zero_python(spark):
    import __spark_entry__ as E

    df = E.queries()["mk_trend"](spark, "/root/testdata/sf0.001")
    assert sum(audit_plan(df)["python_nodes"].values()) == 0
