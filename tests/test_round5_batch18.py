"""Round-5 batch 18: exact-integer global Moran's I, OD tile-flow
matrix, per-user dwell episodes."""

from __future__ import annotations

import datetime as dt
import itertools

from workstealing_spatial_join_spark.operators.spatialstats import (
    morans_i,
    sql_morans_i,
)
from workstealing_spatial_join_spark.operators.trajectory import (
    EPOCH_LEN,
    TILE_MOD,
    dwell_stats,
    od_matrix,
)
from workstealing_spatial_join_spark.plans.planner import audit_plan

# ------------------------------------------------------- morans_i


def _moran_ref(points, cell=8192):
    """Independent python reference — float Moran's I and the exact
    integer ppm floor."""
    counts: dict[tuple[int, int], int] = {}
    for x, y in points:
        k = (x // cell, y // cell)
        counts[k] = counts.get(k, 0) + 1
    cells = sorted(counts)
    n = len(cells)
    s = sum(counts.values())
    z = {c: n * counts[c] - s for c in cells}
    num = w = 0
    for a, b in itertools.permutations(cells, 2):
        if abs(a[0] - b[0]) <= 1 and abs(a[1] - b[1]) <= 1:
            num += z[a] * z[b]
            w += 1
    den = sum(v * v for v in z.values())
    return n, w, (n * num * 10**6) // (w * den)


def _run_moran(spark, points):
    df = spark.createDataFrame(points, "mx long, my long")
    r = morans_i(df).collect()[0]
    return r["n_cells"], r["w_edges"], r["i_ppm"]


def test_moran_clustered_positive(spark):
    # two far-apart 2×2 blobs: heavy cells adjacent to heavy cells
    pts = []
    for bx, by, load in ((0, 0, 9), (40, 40, 1)):
        for ox, oy in ((0, 0), (1, 0), (0, 1), (1, 1)):
            pts += [((bx + ox) * 8192, (by + oy) * 8192)] * load
    got = _run_moran(spark, pts)
    assert got == _moran_ref(pts)
    assert got[2] > 0  # clustered ⇒ positive autocorrelation


def test_moran_dispersed_negative(spark):
    # checkerboard loads on one 4×4 block: unlike neighbors ⇒ I < 0
    pts = []
    for cx in range(4):
        for cy in range(4):
            load = 7 if (cx + cy) % 2 == 0 else 1
            pts += [(cx * 8192 + 5, cy * 8192 + 5)] * load
    got = _run_moran(spark, pts)
    assert got == _moran_ref(pts)
    assert got[2] < 0


def test_moran_negative_num_sign_portability(spark):
    """The dispersed case drives num < 0 through the Euclidean-
    remainder floor — both engines must land the identical ppm."""
    import duckdb

    pts = []
    for cx in range(4):
        for cy in range(4):
            load = 7 if (cx + cy) % 2 == 0 else 1
            pts += [(cx * 8192 + 5, cy * 8192 + 5)] * load
    got = _run_moran(spark, pts)
    con = duckdb.connect()
    con.execute("CREATE TABLE pt_src (mx BIGINT, my BIGINT)")
    con.executemany("INSERT INTO pt_src VALUES (?, ?)", pts)
    duck = con.execute(
        sql_morans_i("SELECT mx, my FROM pt_src")
    ).fetchone()
    assert tuple(duck) == got


def test_moran_random_matches_reference(spark):
    import random

    rng = random.Random(180)
    pts = [
        (rng.randrange(0, 60_000), rng.randrange(0, 60_000))
        for _ in range(300)
    ]
    assert _run_moran(spark, pts) == _moran_ref(pts)


def test_moran_plan_zero_python(spark):
    import __spark_entry__ as E

    df = E.queries()["morans_i"](spark, "/root/testdata/sf0.001")
    assert sum(audit_plan(df)["python_nodes"].values()) == 0


# ------------------------------------------------- trajectory base


def _mk_events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp"
    )


def _tile(user, rn):
    e = (rn - 1) // EPOCH_LEN
    return (
        (user * 131 + (e // 3) * 47) % TILE_MOD,
        (user * 173 + (e // 2) * 59) % TILE_MOD,
    )


def _traj_ref(rows):
    """rows: (user_id, event_id, ts). Returns (od dict, dwell dict)
    computed independently in plain python."""
    by_user: dict[int, list] = {}
    for u, eid, ts in rows:
        by_user.setdefault(u, []).append((ts, eid))
    od: dict[tuple, int] = {}
    dwell: dict[int, tuple] = {}
    for u, evs in by_user.items():
        evs.sort()
        tiles = [_tile(u, i + 1) for i in range(len(evs))]
        for prev, cur in zip(tiles, tiles[1:]):
            if prev != cur:
                k = prev + cur
                od[k] = od.get(k, 0) + 1
        # gaps-and-islands
        episodes = []
        for i, t in enumerate(tiles):
            if i == 0 or t != tiles[i - 1]:
                episodes.append([i, i])
            else:
                episodes[-1][1] = i
        spans = []
        for lo, hi in episodes:
            us = int(
                (evs[hi][0] - evs[lo][0]).total_seconds() * 1_000_000
            )
            spans.append((hi - lo + 1, us))
        dwell[u] = (
            len(spans),
            max(n for n, _ in spans),
            max(us for _, us in spans),
        )
    return od, dwell


CRAFTED_ROWS = [
    # user 1: 10 events a minute apart → epochs of 4/4/2
    *[
        (1, 100 + i, dt.datetime(2024, 1, 1, 0, i))
        for i in range(10)
    ],
    # user 2: single event (no trips, one 1-event episode)
    (2, 200, dt.datetime(2024, 1, 1, 0, 0)),
    # user 3: two events with IDENTICAL ts — event_id is the tiebreak
    (3, 301, dt.datetime(2024, 1, 1, 0, 0)),
    (3, 300, dt.datetime(2024, 1, 1, 0, 0)),
]


def test_od_matrix_crafted(spark):
    od, _ = _traj_ref(CRAFTED_ROWS)
    got = {
        (r["ftx"], r["fty"], r["ttx"], r["tty"]): r["n_trips"]
        for r in od_matrix(_mk_events(spark, CRAFTED_ROWS)).collect()
    }
    assert got == od


def test_dwell_crafted(spark):
    _, dwell = _traj_ref(CRAFTED_ROWS)
    got = {
        r["user_id"]: (
            r["n_episodes"], r["max_run_events"], r["max_dwell_us"]
        )
        for r in dwell_stats(_mk_events(spark, CRAFTED_ROWS)).collect()
    }
    assert got == dwell
    # user 1's first episode is EPOCH_LEN events spanning 3 minutes
    assert got[1][1] >= EPOCH_LEN
    assert got[2] == (1, 1, 0)


def test_traj_random_matches_reference(spark):
    import random

    rng = random.Random(181)
    rows = []
    eid = 0
    for u in range(1, 21):
        t = dt.datetime(2024, 1, 1)
        for _ in range(rng.randrange(1, 30)):
            t += dt.timedelta(seconds=rng.randrange(1, 500))
            rows.append((u, eid, t))
            eid += 1
    od, dwell = _traj_ref(rows)
    ev = _mk_events(spark, rows)
    got_od = {
        (r["ftx"], r["fty"], r["ttx"], r["tty"]): r["n_trips"]
        for r in od_matrix(ev).collect()
    }
    got_dw = {
        r["user_id"]: (
            r["n_episodes"], r["max_run_events"], r["max_dwell_us"]
        )
        for r in dwell_stats(ev).collect()
    }
    assert got_od == od
    assert got_dw == dwell


def test_dwell_merged_epochs_exist(spark, monkeypatch):
    """Consecutive epochs CAN hash to the same tile — assert the
    fixture actually produces a run longer than EPOCH_LEN somewhere
    at gate scale, so the episode grouping is provably not a no-op
    re-bucketing of epochs."""
    import __spark_entry__ as E

    rows = E.queries()["events_dwell"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert max(r["max_run_events"] for r in rows) > EPOCH_LEN


def test_dwell_single_exchange(spark):
    import __spark_entry__ as E

    df = E.queries()["events_dwell"](spark, "/root/testdata/sf0.001")
    audit = audit_plan(df)
    assert sum(audit["python_nodes"].values()) == 0
    assert audit["exchanges"] == 1


def test_od_plan_zero_python(spark):
    import __spark_entry__ as E

    df = E.queries()["events_od_matrix"](
        spark, "/root/testdata/sf0.001"
    )
    assert sum(audit_plan(df)["python_nodes"].values()) == 0
