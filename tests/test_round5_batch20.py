"""Round-5 batch 20: local Moran's I (LISA) and the Chebyshev
pair-count ladder."""

from __future__ import annotations

import itertools

from workstealing_spatial_join_spark.operators.spatialstats import (
    LADDER_RUNGS,
    local_morans,
    morans_i,
    pair_count_ladder,
    sql_local_morans,
    sql_pair_count_ladder,
)
from workstealing_spatial_join_spark.plans.planner import audit_plan

# ---------------------------------------------------- local morans


def _lisa_ref(points, cell=8192):
    counts: dict[tuple[int, int], int] = {}
    for x, y in points:
        k = (x // cell, y // cell)
        counts[k] = counts.get(k, 0) + 1
    cells = sorted(counts)
    n = len(cells)
    s = sum(counts.values())
    z = {c: n * counts[c] - s for c in cells}
    out = {}
    for c in cells:
        lag = sum(
            z[d]
            for d in cells
            if d != c
            and abs(d[0] - c[0]) <= 1
            and abs(d[1] - c[1]) <= 1
        )
        zi = z[c]
        if zi > 0 and lag > 0:
            cls = "HH"
        elif zi < 0 and lag < 0:
            cls = "LL"
        elif zi > 0 and lag < 0:
            cls = "HL"
        elif zi < 0 and lag > 0:
            cls = "LH"
        else:
            cls = "ZERO"
        out[c] = (zi, lag, zi * lag, cls)
    return out


def _blob_and_desert():
    """A dense 2×2 blob, a lone far hot cell, and a sparse ring —
    produces all four quadrant classes."""
    pts = []
    for ox, oy in ((0, 0), (1, 0), (0, 1), (1, 1)):
        pts += [(ox * 8192 + 3, oy * 8192 + 3)] * 8
    # sparse shell around the blob (low cells adjacent to high: LH)
    for ox, oy in ((-1, -1), (2, 2), (-1, 2), (2, -1)):
        pts += [(ox * 8192 + 3, oy * 8192 + 3)]
    # isolated heavy cell far away with a light neighbor (HL + LH)
    pts += [(50 * 8192 + 3, 50 * 8192 + 3)] * 9
    pts += [(51 * 8192 + 3, 50 * 8192 + 3)]
    # far lone light pair (LL)
    pts += [(90 * 8192 + 3, 90 * 8192 + 3)]
    pts += [(91 * 8192 + 3, 90 * 8192 + 3)]
    return pts


def _collect_lisa(spark, pts):
    df = spark.createDataFrame(pts, "mx long, my long")
    return {
        (r["cx"], r["cy"]): (r["z"], r["lag"], r["local_num"], r["cls"])
        for r in local_morans(df).collect()
    }


def test_lisa_matches_reference_all_classes(spark):
    pts = _blob_and_desert()
    got = _collect_lisa(spark, pts)
    ref = _lisa_ref(pts)
    assert got == ref
    assert {v[3] for v in got.values()} >= {"HH", "LL", "HL", "LH"}


def test_lisa_isolated_cell_lag_zero(spark):
    # two cells far apart: both isolated, lag must be 0 (not missing)
    pts = [(0, 0)] * 3 + [(80 * 8192, 80 * 8192)]
    got = _collect_lisa(spark, pts)
    assert all(v[1] == 0 and v[3] == "ZERO" for v in got.values())
    assert len(got) == 2


def test_lisa_sum_equals_global_numerator(spark):
    """Σ local_num must equal the global Moran numerator — recover
    the global i_ppm from the LISA frame and compare against
    morans_i directly."""
    import random

    rng = random.Random(200)
    pts = [
        (rng.randrange(0, 70_000), rng.randrange(0, 70_000))
        for _ in range(250)
    ]
    df = spark.createDataFrame(pts, "mx long, my long")
    lisa = _collect_lisa(spark, pts)
    num = sum(v[2] for v in lisa.values())
    den = sum(v[0] * v[0] for v in lisa.values())
    n = len(lisa)
    ref = _lisa_ref(pts)
    w = sum(
        1
        for a, b in itertools.permutations(ref, 2)
        if abs(a[0] - b[0]) <= 1 and abs(a[1] - b[1]) <= 1
    )
    expect_ppm = (n * num * 10**6) // (w * den)
    r = morans_i(df).collect()[0]
    assert (r["n_cells"], r["w_edges"], r["i_ppm"]) == (n, w, expect_ppm)


def test_lisa_duckdb_twin(spark):
    import duckdb

    pts = _blob_and_desert()
    got = _collect_lisa(spark, pts)
    con = duckdb.connect()
    con.execute("CREATE TABLE pt_src (mx BIGINT, my BIGINT)")
    con.executemany("INSERT INTO pt_src VALUES (?, ?)", pts)
    duck = {
        (r[0], r[1]): (r[2], r[3], r[4], r[5])
        for r in con.execute(
            sql_local_morans("SELECT mx, my FROM pt_src")
        ).fetchall()
    }
    assert duck == got


def test_lisa_plan_zero_python(spark):
    import __spark_entry__ as E

    df = E.queries()["local_morans"](spark, "/root/testdata/sf0.001")
    assert sum(audit_plan(df)["python_nodes"].values()) == 0


# ------------------------------------------------------ pair ladder


def _ladder_ref(points, rungs=LADDER_RUNGS):
    out = {r: 0 for r in rungs}
    for (i, (ax, ay)), (j, (bx, by)) in itertools.combinations(
        enumerate(points), 2
    ):
        cheb = max(abs(ax - bx), abs(ay - by))
        for r in rungs:
            if cheb <= r:
                out[r] += 1
    return out


def test_ladder_exact_ties_at_rung(spark):
    pts = [
        (1, 0, 0),
        (2, 500, 0),      # cheb 500 == rung 1: included there
        (3, 501, 0),      # cheb 501 from 1: first rung misses it
        (4, 0, 4000),     # cheb 4000 from 1: top rung boundary
        (5, 0, 4001),     # cheb 4001 from 1: outside every rung
        (6, 100_000, 0),  # far away entirely
    ]
    df = spark.createDataFrame(pts, "point_id long, mx long, my long")
    got = {
        r["r"]: r["n_pairs"] for r in pair_count_ladder(df).collect()
    }
    ref = _ladder_ref([(x, y) for _, x, y in pts])
    ref = {r: c for r, c in ref.items() if c}
    assert got == ref
    # the monotone profile: each rung includes the previous
    rs = sorted(got)
    assert all(got[a] <= got[b] for a, b in zip(rs, rs[1:]))


def test_ladder_cross_cell_pairs(spark):
    # pair straddling a 4096-cell boundary — the ring explode must
    # catch it even though home cells differ
    pts = [(1, 4090, 0), (2, 4100, 0)]
    df = spark.createDataFrame(pts, "point_id long, mx long, my long")
    got = {
        r["r"]: r["n_pairs"] for r in pair_count_ladder(df).collect()
    }
    assert got == {r: 1 for r in LADDER_RUNGS}


def test_ladder_random_matches_reference(spark):
    import random

    rng = random.Random(201)
    pts = [
        (i, rng.randrange(-20_000, 20_000), rng.randrange(-20_000, 20_000))
        for i in range(1, 120)
    ]
    df = spark.createDataFrame(pts, "point_id long, mx long, my long")
    got = {
        r["r"]: r["n_pairs"] for r in pair_count_ladder(df).collect()
    }
    ref = _ladder_ref([(x, y) for _, x, y in pts])
    assert got == {r: c for r, c in ref.items() if c}


def test_ladder_duckdb_twin_random(spark):
    import duckdb
    import random

    rng = random.Random(202)
    pts = [
        (i, rng.randrange(-20_000, 20_000), rng.randrange(-20_000, 20_000))
        for i in range(1, 120)
    ]
    df = spark.createDataFrame(pts, "point_id long, mx long, my long")
    got = {
        r["r"]: r["n_pairs"] for r in pair_count_ladder(df).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE pt_src (point_id BIGINT, mx BIGINT, my BIGINT)"
    )
    con.executemany("INSERT INTO pt_src VALUES (?, ?, ?)", pts)
    duck = dict(
        con.execute(
            sql_pair_count_ladder("SELECT * FROM pt_src")
        ).fetchall()
    )
    assert duck == got


def test_ladder_plan_zero_python_one_join(spark):
    import __spark_entry__ as E

    df = E.queries()["pair_count_ladder"](
        spark, "/root/testdata/sf0.001"
    )
    audit = audit_plan(df)
    assert sum(audit["python_nodes"].values()) == 0
    assert (
        audit["broadcast_joins"]
        + audit["sortmerge_joins"]
        + audit["shuffledhash_joins"]
        == 1
    )
