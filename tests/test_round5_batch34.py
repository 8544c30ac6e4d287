"""Round-5 batch 34: nearest-neighbour G-function spectrum, Markov
transition table, displacement rose."""

from __future__ import annotations

import datetime
import math
import random
from collections import Counter, defaultdict

import duckdb

from workstealing_spatial_join_spark.operators.graph import GRID_GRAPH_CELL
from workstealing_spatial_join_spark.operators.spatialstats import (
    nn_spectrum,
    sql_nn_spectrum,
)
from workstealing_spatial_join_spark.operators.trajectory import (
    markov_transitions,
    move_rose,
    od_matrix,
    sql_markov_transitions,
    sql_move_rose,
    sticky_positions,
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


def _pts_df(spark, pts):
    return spark.createDataFrame(pts, "point_id long, mx long, my long")


# -------------------------------------------------- nn spectrum


def _nn_ref(pts, cell=GRID_GRAPH_CELL):
    out = Counter()
    bound = cell * cell
    for pid, mx, my in pts:
        m = min(
            (mx - bx) ** 2 + (my - by) ** 2
            for qid, bx, by in pts
            if qid != pid
        )
        out[m.bit_length() if m <= bound else -1] += 1
    return dict(out)


def test_nn_spectrum_matches_bruteforce(spark):
    rng = random.Random(3401)
    # mixed density: tight pairs + a censored far-out tail
    pts = (
        [
            (i, rng.randrange(-40000, 40000), rng.randrange(-40000, 40000))
            for i in range(200)
        ]
        + [(900, 2_000_000, 2_000_000), (901, 3_000_000, -3_000_000)]
    )
    got = {
        r["bucket"]: r["n_points"]
        for r in nn_spectrum(_pts_df(spark, pts)).collect()
    }
    ref = _nn_ref(pts)
    assert got == ref
    assert -1 in got  # the censored tail is exercised


def test_nn_spectrum_censor_boundary(spark):
    """The bound is cell², NOT (cell+1)²: a NN exactly at Euclidean
    cell lands in its octave in both engines; a NN at cell+1 due
    east (Chebyshev cell+1 — OUTSIDE the 3×3 ring) is censored by
    BOTH, which is precisely why the looser bound would diverge."""
    cell = GRID_GRAPH_CELL
    at_cell = [(1, 0, 0), (2, cell, 0)]
    got = {
        r["bucket"]: r["n_points"]
        for r in nn_spectrum(_pts_df(spark, at_cell)).collect()
    }
    assert got == {(cell * cell).bit_length(): 2}
    beyond = [(1, 0, 0), (2, cell + 1, 0)]
    got2 = {
        r["bucket"]: r["n_points"]
        for r in nn_spectrum(_pts_df(spark, beyond)).collect()
    }
    assert got2 == {-1: 2}


def test_nn_spectrum_matches_duckdb(spark):
    rng = random.Random(3402)
    pts = [
        (i, rng.randrange(-60000, 60000), rng.randrange(-60000, 60000))
        for i in range(250)
    ] + [(800, 5_000_000, 0)]
    con = duckdb.connect()
    con.execute("CREATE TABLE npts (point_id BIGINT, mx BIGINT, my BIGINT)")
    con.executemany("INSERT INTO npts VALUES (?,?,?)", pts)
    want = dict(
        con.execute(sql_nn_spectrum("SELECT * FROM npts")).fetchall()
    )
    got = {
        r["bucket"]: r["n_points"]
        for r in nn_spectrum(_pts_df(spark, pts)).collect()
    }
    assert got == want


# --------------------------------------------- markov transitions


def test_markov_rows_sum_to_at_most_unit(spark):
    rows = _random_events(3403)
    out = markov_transitions(_events_df(spark, rows)).collect()
    assert out
    by_row = defaultdict(lambda: [0, 0, None])
    for r in out:
        k = (r["ftx"], r["fty"])
        by_row[k][0] += r["p_ppm"]
        by_row[k][1] += r["n_trips"]
        by_row[k][2] = r["row_total"]
    for psum, ntot, rtot in by_row.values():
        assert ntot == rtot  # marginal consistency
        assert psum <= 1_000_000  # floor quantization never overshoots
        # deficit bounded by the number of destinations − 1 µ-units
    od = {
        (r["ftx"], r["fty"], r["ttx"], r["tty"]): r["n_trips"]
        for r in od_matrix(_events_df(spark, rows)).collect()
    }
    got = {
        (r["ftx"], r["fty"], r["ttx"], r["tty"]): (
            r["n_trips"],
            r["p_ppm"],
        )
        for r in out
    }
    rt = Counter()
    for (fx, fy, _tx, _ty), n in od.items():
        rt[(fx, fy)] += n
    for k, n in od.items():
        assert got[k] == (n, n * 1_000_000 // rt[(k[0], k[1])])


def test_markov_matches_duckdb(spark):
    rows = _random_events(3404, n_users=30, n_events=800)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events (event_id BIGINT, ts TIMESTAMP,"
        " user_id BIGINT, event_type VARCHAR, value DOUBLE,"
        " props VARCHAR)"
    )
    con.executemany("INSERT INTO events VALUES (?,?,?,?,?,?)", rows)
    want = {
        tuple(r[:4]): tuple(r[4:])
        for r in con.execute(
            sql_markov_transitions(
                "SELECT user_id, event_id, ts FROM events"
            )
        ).fetchall()
    }
    got = {
        (r["ftx"], r["fty"], r["ttx"], r["tty"]): (
            r["n_trips"],
            r["row_total"],
            r["p_ppm"],
        )
        for r in markov_transitions(_events_df(spark, rows)).collect()
    }
    assert got == want


# ------------------------------------------------------ move rose


def _sector_ref(dx, dy):
    ang = math.degrees(math.atan2(dy, dx)) % 360
    return int(ang // 45) % 8


def _rose_ref(spark, rows):
    pos = sticky_positions(_events_df(spark, rows)).collect()
    by_user = defaultdict(list)
    for r in pos:
        by_user[r["user_id"]].append((r["rn"], r["tx"], r["ty"]))
    out = defaultdict(lambda: [0, 0])
    for seq in by_user.values():
        seq.sort()
        for (_, x0, y0), (_, x1, y1) in zip(seq, seq[1:]):
            dx, dy = x1 - x0, y1 - y0
            if (dx, dy) == (0, 0):
                continue
            s = _sector_ref(dx, dy)
            out[s][0] += 1
            out[s][1] += max(abs(dx), abs(dy))
    return {k: tuple(v) for k, v in out.items()}


def test_move_rose_matches_atan2_reference(spark):
    rows = _random_events(3405, n_users=40, n_events=900)
    got = {
        r["sector"]: (r["n_moves"], r["sum_cheb"])
        for r in move_rose(_events_df(spark, rows)).collect()
    }
    assert got == _rose_ref(spark, rows)
    assert len(got) >= 4  # several directions exercised


def test_move_rose_matches_duckdb(spark):
    rows = _random_events(3406, n_users=35, n_events=700)
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
            sql_move_rose("SELECT user_id, event_id, ts FROM events")
        ).fetchall()
    }
    got = {
        r["sector"]: (r["n_moves"], r["sum_cheb"])
        for r in move_rose(_events_df(spark, rows)).collect()
    }
    assert got == want


def test_batch34_plans_zero_python(spark):
    ev = _events_df(spark, _random_events(6))
    for df in (
        nn_spectrum(_pts_df(spark, [(1, 0, 0), (2, 5, 5)])),
        markov_transitions(ev),
        move_rose(ev),
    ):
        assert sum(audit_plan(df)["python_nodes"].values()) == 0


def test_nn_spectrum_all_isolated(spark):
    """ADVICE r5: a layer where EVERY point is ring-isolated used to
    return an EMPTY frame (hist empty → F.sum gives NULL n_cov →
    n_total - NULL is NULL → the iso > 0 filter dropped the censored
    row) while the DuckDB twin returns (-1, n_total). The coalesce
    makes the engine emit the censored row too."""
    pts = [
        (1, 0, 0),
        (2, 5_000_000, 5_000_000),
        (3, -5_000_000, 5_000_000),
    ]
    got = {
        r["bucket"]: r["n_points"]
        for r in nn_spectrum(_pts_df(spark, pts)).collect()
    }
    assert got == {-1: 3}
    assert got == _nn_ref(pts)
