"""Round-5 batch 14: areal interpolation (zone measure → tile grid),
BFS hop distance over the segment cell graph, and per-user
time-weighted average (LOCF)."""

from __future__ import annotations

from collections import deque

from workstealing_spatial_join_spark.operators.areal import (
    AREAL_TILE,
    areal_transfer,
)
from workstealing_spatial_join_spark.operators.graph import bfs_hops
from workstealing_spatial_join_spark.operators.temporal import (
    time_weighted_avg,
)
from workstealing_spatial_join_spark.plans.planner import audit_plan


def _areal_ref(zones, tile):
    """Plain-python areal transfer: exact integer floor shares."""
    out: dict[tuple[int, int], list[int]] = {}
    for _zid, zminx, zminy, zmaxx, zmaxy, measure in zones:
        zarea = (zmaxx - zminx) * (zmaxy - zminy)
        for tx in range(zminx // tile, zmaxx // tile + 1):
            for ty in range(zminy // tile, zmaxy // tile + 1):
                ox = min(zmaxx, (tx + 1) * tile) - max(zminx, tx * tile)
                oy = min(zmaxy, (ty + 1) * tile) - max(zminy, ty * tile)
                if ox <= 0 or oy <= 0:
                    continue
                out.setdefault((tx, ty), []).append(
                    measure * (ox * oy) // zarea
                )
    return {
        k: (len(v), sum(v)) for k, v in out.items()
    }


ZONES = [
    # inside one tile
    (1, 100, 100, 600, 900, 10_000),
    # spans a tile boundary on x (tile=1000 in the test)
    (2, 700, 0, 1900, 500, 33_333),
    # spans 2×2 tiles, negative coords
    (3, -500, -500, 500, 500, 7),
    # exactly tile-aligned box (boundary overlap rows must be 0-area
    # and excluded, not emitted as zero rows)
    (4, 1000, 1000, 2000, 2000, 999),
    # tall thin zone crossing three tiles on y
    (5, 50, -100, 150, 2100, 101_010),
]


def test_areal_matches_python_reference(spark):
    tile = 1000
    df = spark.createDataFrame(
        ZONES,
        "zone_id long, zminx long, zminy long, zmaxx long, "
        "zmaxy long, measure long",
    )
    got = {
        (r["tx"], r["ty"]): (r["n_zones"], r["transferred"])
        for r in areal_transfer(df, tile=tile).collect()
    }
    assert got == _areal_ref(ZONES, tile)
    # the tile-aligned zone 4 lands entirely in tile (1,1): the
    # (2,*) and (*,2) covering candidates are 0-area and dropped
    assert got[(1, 1)][1] >= 999


def test_areal_mass_deficit_bound(spark):
    """Σ transfers per zone ≤ measure, short by < #tiles (floor)."""
    tile = 1000
    for zid, a, b, c, d, m in ZONES:
        ref = _areal_ref([(zid, a, b, c, d, m)], tile)
        total = sum(v[1] for v in ref.values())
        ntiles = len(ref)
        assert m - ntiles < total <= m


def test_areal_plan_zero_python_one_exchange(spark):
    import __spark_entry__ as E

    df = E.queries()["areal_tiles"](spark, "/root/testdata/sf0.001")
    audit = audit_plan(df)
    assert sum(audit["python_nodes"].values()) == 0
    # no join: the grid is implicit — one groupBy exchange only
    assert audit["exchanges"] == 1
    assert (
        audit["broadcast_joins"]
        + audit["sortmerge_joins"]
        + audit["shuffledhash_joins"]
        == 0
    )


def _bfs_ref(edges, max_hops):
    adj: dict[tuple[int, int], set] = {}
    for sx, sy, dx, dy in edges:
        if (sx, sy) == (dx, dy):
            continue
        adj.setdefault((sx, sy), set()).add((dx, dy))
        adj.setdefault((dx, dy), set()).add((sx, sy))
    if not adj:
        return {}
    seed = min(adj)
    dist = {seed: 0}
    q = deque([seed])
    while q:
        u = q.popleft()
        if dist[u] >= max_hops:
            continue
        for v in adj[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


EDGES = [
    # path 0-1-2-3 from the seed (0,0)
    (0, 0, 1, 0),
    (1, 0, 2, 0),
    (2, 0, 3, 0),
    # cycle back to the seed — must not lower any hop
    (3, 0, 0, 1),
    (0, 1, 0, 0),
    # a long tail that exceeds max_hops=3 from the seed
    (3, 0, 4, 0),
    (4, 0, 5, 0),
    # disconnected component — never reached
    (90, 90, 91, 90),
    # duplicate + reversed duplicate + self-loop: all collapse
    (1, 0, 2, 0),
    (2, 0, 1, 0),
    (7, 7, 7, 7),
]


def test_bfs_matches_python_reference(spark):
    df = spark.createDataFrame(EDGES, "sx long, sy long, dx long, dy long")
    got = {
        (r["nx"], r["ny"]): r["hop"]
        for r in bfs_hops(df, max_hops=3).collect()
    }
    assert got == _bfs_ref(EDGES, 3)
    # the path to (3,0) is 3 hops along the chain but 2 via the
    # cycle edge (0,0)-(0,1)-(3,0): BFS must take the shortcut
    assert got[(0, 0)] == 0 and got[(3, 0)] == 2
    assert got[(4, 0)] == 3  # reached exactly at the bound
    assert (90, 90) not in got  # disconnected
    assert (5, 0) not in got  # beyond max_hops
    assert (7, 7) not in got  # self-loop only node is not a graph node


def test_bfs_plan_zero_python(spark):
    import __spark_entry__ as E

    df = E.queries()["grid_bfs"](spark, "/root/testdata/sf0.001")
    audit = audit_plan(df)
    assert sum(audit["python_nodes"].values()) == 0


def _twa_ref(rows):
    by_user: dict[int, list] = {}
    for event_id, user, us, cents in rows:
        by_user.setdefault(user, []).append((us, event_id, cents))
    out = {}
    for user, evs in by_user.items():
        evs.sort()
        span = evs[-1][0] - evs[0][0]
        if span <= 0:
            continue
        wsum = sum(
            c * (evs[i + 1][0] - us)
            for i, (us, _e, c) in enumerate(evs[:-1])
        )
        out[user] = (len(evs), span, wsum, wsum // span)
    return out


def test_twa_matches_python_reference(spark):
    from datetime import datetime, timedelta

    base = datetime(2024, 1, 1)
    # (event_id, user, offset_us, cents)
    raw = [
        (1, 1, 0, 100),          # 1.00 held for 10s
        (2, 1, 10_000_000, 300),  # 3.00 held for 5s
        (3, 1, 15_000_000, 700),  # terminal: weight 0
        (4, 2, 0, 50),            # single event → excluded
        (5, 3, 0, 200),           # tie on ts with event 6:
        (6, 3, 0, 800),           # dt=0 → contributes nothing either way
        (7, 3, 4_000_000, 400),
    ]
    df = spark.createDataFrame(
        [
            (e, base + timedelta(microseconds=us), u, cents / 100.0)
            for e, u, us, cents in raw
        ],
        "event_id long, ts timestamp, user_id long, value double",
    )
    got = {
        r["user_id"]: (
            r["n_events"], r["span_us"], r["wsum"], r["twa_cents"]
        )
        for r in time_weighted_avg(df).collect()
    }
    ref = _twa_ref([(e, u, us, c) for e, u, us, c in raw])
    assert got == ref
    # user 1 by hand: (100·10s + 300·5s) / 15s = 166 floor
    assert got[1] == (3, 15_000_000, 100 * 10_000_000 + 300 * 5_000_000, 166)
    assert 2 not in got


def test_twa_plan_zero_python_one_exchange(spark):
    import __spark_entry__ as E

    df = E.queries()["events_twa"](spark, "/root/testdata/sf0.001")
    audit = audit_plan(df)
    assert sum(audit["python_nodes"].values()) == 0
    # window and groupBy share the user-key partitioning: ONE shuffle
    assert audit["exchanges"] == 1
