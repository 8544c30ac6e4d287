"""Round-5 batch 22: exact point-level DBSCAN."""

from __future__ import annotations

import itertools

from workstealing_spatial_join_spark.operators.cluster import (
    dbscan,
    sql_dbscan,
)
from workstealing_spatial_join_spark.plans.planner import audit_plan


def _dbscan_ref(points, eps, min_pts):
    """Independent python DBSCAN with the engine's deterministic
    conventions (min-core-id cluster labels, borders take the MIN
    candidate cluster)."""
    ids = [p[0] for p in points]
    xy = {p[0]: (p[1], p[2]) for p in points}
    nbrs = {i: set() for i in ids}
    for a, b in itertools.combinations(ids, 2):
        ax, ay = xy[a]
        bx, by = xy[b]
        if (ax - bx) ** 2 + (ay - by) ** 2 <= eps * eps:
            nbrs[a].add(b)
            nbrs[b].add(a)
    cores = {i for i in ids if len(nbrs[i]) + 1 >= min_pts}
    # min-reachable-core-id labels over the core subgraph
    label = {i: i for i in cores}
    changed = True
    while changed:
        changed = False
        for i in cores:
            for j in nbrs[i] & cores:
                if label[j] < label[i]:
                    label[i] = label[j]
                    changed = True
    out = {}
    for i in cores:
        out[i] = (label[i], "core")
    for i in ids:
        if i in cores:
            continue
        cand = [label[j] for j in nbrs[i] & cores]
        if cand:
            out[i] = (min(cand), "border")
    return out


def _run(spark, pts, eps, min_pts):
    df = spark.createDataFrame(pts, "point_id long, mx long, my long")
    return {
        r["point_id"]: (r["cluster"], r["role"])
        for r in dbscan(df, eps=eps, min_pts=min_pts).collect()
    }


CRAFTED = [
    # cluster A: 5-point plus-shape, all mutually within eps=100 of
    # the center; arms are 140 apart pairwise (> eps) so arm points
    # have 2-3 neighbors
    (1, 0, 0), (2, 100, 0), (3, -100, 0), (4, 0, 100), (5, 0, -100),
    # bridge point exactly eps from point 2 — boundary-distance pair
    (6, 200, 0),
    # cluster B: tight triangle far away + one border satellite
    (10, 5000, 5000), (11, 5020, 5000), (12, 5000, 5020),
    (13, 5115, 5000),  # within eps of 11 ONLY → 1 neighbor → border
    # noise: alone in the void
    (99, 20000, 20000),
]


def test_dbscan_crafted_roles(spark):
    got = _run(spark, CRAFTED, eps=100, min_pts=3)
    ref = _dbscan_ref(CRAFTED, 100, 3)
    assert got == ref
    # the center is core; the eps-boundary bridge joins as border/core
    assert got[1] == (1, "core")
    assert 99 not in got
    # cluster B labeled by its min core id
    assert got[10][0] == 10 and got[13] == (10, "border")


def test_dbscan_boundary_distance_exact(spark):
    # two cliques joined by a pair at EXACTLY eps: one cluster;
    # nudge 1 milli apart: two clusters. Floats could never pin this.
    def layer(gap):
        left = [(i, i * 10, 0) for i in range(1, 5)]
        right = [(i, 40 + gap + (i - 5) * 10, 0) for i in range(5, 9)]
        return left + right

    one = _run(spark, layer(100), eps=100, min_pts=3)
    two = _run(spark, layer(101), eps=100, min_pts=3)
    assert len({c for c, _ in one.values()}) == 1
    assert len({c for c, _ in two.values()}) == 2


def test_dbscan_random_matches_reference(spark):
    import random

    rng = random.Random(220)
    pts = [
        (i, rng.randrange(0, 3000), rng.randrange(0, 3000))
        for i in range(1, 181)
    ]
    got = _run(spark, pts, eps=250, min_pts=4)
    assert got == _dbscan_ref(pts, 250, 4)


def test_dbscan_duckdb_twin_random(spark):
    import duckdb
    import random

    rng = random.Random(221)
    pts = [
        (i, rng.randrange(0, 3000), rng.randrange(0, 3000))
        for i in range(1, 181)
    ]
    got = _run(spark, pts, eps=250, min_pts=4)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE pt_src (point_id BIGINT, mx BIGINT, my BIGINT)"
    )
    con.executemany("INSERT INTO pt_src VALUES (?, ?, ?)", pts)
    duck = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            sql_dbscan("SELECT * FROM pt_src", eps=250, min_pts=4)
        ).fetchall()
    }
    assert duck == got


def test_dbscan_fixture_has_all_three_roles(spark):
    """The mixture fixture must actually produce cores, borders AND
    noise at gate scale — otherwise the role machinery is untested
    by the driver contract."""
    import __spark_entry__ as E
    from workstealing_spatial_join_spark.sources import tables as TB

    sf = "/root/testdata/sf0.001"
    labeled = E.queries()["dbscan_points"](spark, sf).collect()
    roles = {r["role"] for r in labeled}
    assert roles == {"core", "border"}
    n_pts = TB.customer_cluster_points(spark, sf).count()
    assert len(labeled) < n_pts  # noise exists (absent rows)
    assert len({r["cluster"] for r in labeled}) > 1  # many clusters


def test_dbscan_plan_python_free_pairs(spark):
    import __spark_entry__ as E

    df = E.queries()["dbscan_points"](spark, "/root/testdata/sf0.001")
    assert sum(audit_plan(df)["python_nodes"].values()) == 0
