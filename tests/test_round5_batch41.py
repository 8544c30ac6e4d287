"""Round-5 batch 41: percolation ladder (CCA), contact-network
degree octaves, co-location user similarity."""

from __future__ import annotations

import datetime
import random
from collections import Counter, defaultdict

import duckdb

from workstealing_spatial_join_spark.operators.graph import GRID_GRAPH_CELL
from workstealing_spatial_join_spark.operators.spatialstats import (
    percolation_ladder,
    sql_percolation_ladder,
)
from workstealing_spatial_join_spark.operators.trajectory import (
    contact_degrees,
    co_presence,
    sql_contact_degrees,
    sql_user_similarity,
    sticky_positions,
    user_similarity,
)
from workstealing_spatial_join_spark.plans.planner import audit_plan

CELL = GRID_GRAPH_CELL


def _pts_df(spark, pts):
    return spark.createDataFrame(pts, "point_id long, mx long, my long")


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


# --------------------------------------------- percolation ladder


def _perc_ref(pts, thetas=(1, 2, 4, 8)):
    cells = Counter()
    for _, mx, my in pts:
        cells[
            (mx - ((mx % CELL) + CELL) % CELL) // CELL,
            (my - ((my % CELL) + CELL) % CELL) // CELL,
        ] += 1
    out = {}
    for th in thetas:
        occ = {c for c, x in cells.items() if x >= th}
        parent = {c: c for c in occ}

        def find(c):
            while parent[c] != c:
                parent[c] = parent[parent[c]]
                c = parent[c]
            return c

        for cx, cy in occ:
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    nb = (cx + dx, cy + dy)
                    if nb != (cx, cy) and nb in occ:
                        ra, rb = find((cx, cy)), find(nb)
                        if ra != rb:
                            parent[max(ra, rb)] = min(ra, rb)
        comp = Counter(find(c) for c in occ)
        out[th] = (
            len(occ),
            len(comp),
            max(comp.values()) if comp else 0,
        )
    return out


def test_percolation_matches_unionfind(spark):
    rng = random.Random(4101)
    # dense blob + sparse field so rising θ genuinely erodes clusters
    pts = [
        (i, rng.randrange(0, 5 * CELL), rng.randrange(0, 5 * CELL))
        for i in range(300)
    ] + [
        (
            1000 + i,
            rng.randrange(-400000, -200000),
            rng.randrange(-400000, -200000),
        )
        for i in range(150)
    ]
    got = {
        r["theta"]: (
            r["occupied_cells"],
            r["n_clusters"],
            r["largest_cells"],
        )
        for r in percolation_ladder(_pts_df(spark, pts)).collect()
    }
    ref = _perc_ref(pts)
    # rungs where NO cell survives are absent from the engine output
    ref = {k: v for k, v in ref.items() if v[0] > 0}
    assert got == ref
    # the curve moves: occupancy is strictly monotone down the ladder
    occs = [got[t][0] for t in sorted(got)]
    assert occs == sorted(occs, reverse=True) and len(set(occs)) >= 2


def test_percolation_matches_duckdb(spark):
    rng = random.Random(4102)
    pts = [
        (i, rng.randrange(0, 4 * CELL), rng.randrange(0, 4 * CELL))
        for i in range(250)
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE pp (point_id BIGINT, mx BIGINT, my BIGINT)")
    con.executemany("INSERT INTO pp VALUES (?,?,?)", pts)
    want = {
        r[0]: tuple(r[1:])
        for r in con.execute(
            sql_percolation_ladder("SELECT * FROM pp")
        ).fetchall()
    }
    got = {
        r["theta"]: (
            r["occupied_cells"],
            r["n_clusters"],
            r["largest_cells"],
        )
        for r in percolation_ladder(_pts_df(spark, pts)).collect()
    }
    # the SQL twin emits every rung (0-row rungs as NULL aggregates);
    # compare on the engine's non-empty rungs and assert the SQL
    # empty rungs carry no cells
    for th, v in got.items():
        assert want[th] == v
    for th, v in want.items():
        if th not in got:
            assert v[0] is None or v[0] == 0


# ----------------------------------------------- contact degrees


def test_contact_degrees_matches_pairs(spark):
    rows = _random_events(4103)
    pairs = co_presence(_events_df(spark, rows)).collect()
    deg = Counter()
    for r in pairs:
        deg[r["user_a"]] += 1
        deg[r["user_b"]] += 1
    ref = Counter(d.bit_length() for d in deg.values())
    got = {
        r["bucket"]: r["n_users"]
        for r in contact_degrees(_events_df(spark, rows)).collect()
    }
    assert got == dict(ref)
    assert got


def test_contact_degrees_matches_duckdb(spark):
    rows = _random_events(4104, n_users=50, n_events=1000)
    want = dict(
        _duck_events(
            rows,
            sql_contact_degrees("SELECT user_id, event_id, ts FROM events"),
        )
    )
    got = {
        r["bucket"]: r["n_users"]
        for r in contact_degrees(_events_df(spark, rows)).collect()
    }
    assert got == want


# ---------------------------------------------- user similarity


def _sim_ref(spark, rows):
    pos = sticky_positions(_events_df(spark, rows)).collect()
    tiles = defaultdict(set)
    slots = defaultdict(set)
    for r in pos:
        day = int(r["ts"].timestamp() * 1_000_000) // 86400000000
        tiles[r["user_id"]].add((r["tx"], r["ty"]))
        slots[r["user_id"]].add((r["tx"], r["ty"], day))
    users = sorted(tiles)
    out = {}
    for i, a in enumerate(users):
        for b in users[i + 1 :]:
            if not (slots[a] & slots[b]):
                continue  # the co-presence gate
            inter = len(tiles[a] & tiles[b])
            union = len(tiles[a] | tiles[b])
            out[(a, b)] = (inter, inter * 1_000_000 // union)
    return out


def test_user_similarity_matches_reference(spark):
    rows = _random_events(4105)
    got = {
        (r["user_a"], r["user_b"]): (r["n_inter"], r["jac_ppm"])
        for r in user_similarity(_events_df(spark, rows)).collect()
    }
    ref = _sim_ref(spark, rows)
    assert got == ref
    assert got
    # congruent users (u, u+32) have IDENTICAL tile sets → 10⁶ ppm
    assert any(v[1] == 1_000_000 for v in got.values())


def test_user_similarity_matches_duckdb(spark):
    rows = _random_events(4106, n_users=45, n_events=1000)
    want = {
        (r[0], r[1]): (r[2], r[3])
        for r in _duck_events(
            rows,
            sql_user_similarity("SELECT user_id, event_id, ts FROM events"),
        )
    }
    got = {
        (r["user_a"], r["user_b"]): (r["n_inter"], r["jac_ppm"])
        for r in user_similarity(_events_df(spark, rows)).collect()
    }
    assert got == want


def test_batch41_plans_zero_python(spark):
    ev = _events_df(spark, _random_events(13))
    for df in (
        contact_degrees(ev),
        user_similarity(ev),
    ):
        assert sum(audit_plan(df)["python_nodes"].values()) == 0
