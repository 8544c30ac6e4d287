"""Round-5 batch 7: integer fixed-point PageRank, pareto-front
(skyline) selection, spatial ANTI-join, equi-width value histogram.
Unit semantics on crafted + random inputs plus plan gates (the driver
contract + scripts/check_contract.py cover sf0.01 oracle parity)."""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from workstealing_spatial_join_spark.operators.frontier import (
    pareto_front_2d,
    sql_pareto_front_2d,
)
from workstealing_spatial_join_spark.operators.graph import (
    pagerank_int,
    sql_pagerank_int,
)
from workstealing_spatial_join_spark.operators.sketch import (
    sql_value_histogram,
    value_histogram,
)
from workstealing_spatial_join_spark.plans.planner import audit_plan

# -------------------------------------------------------- pagerank


def _pagerank_ref(edges, iters, scale=1_000_000, dn=85, dd=100):
    """Plain-Python replay of the documented integer semantics."""
    edges = sorted(set(edges))
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    outd = {}
    for a, _ in edges:
        outd[a] = outd.get(a, 0) + 1
    base = scale * (dd - dn) // dd
    rank = {n: scale for n in nodes}
    for _ in range(iters):
        s = {n: 0 for n in nodes}
        for a, b in edges:
            s[b] += rank[a] // outd[a]
        rank = {n: base + (dn * s[n]) // dd for n in nodes}
    return rank


def test_pagerank_matches_integer_reference(spark):
    random.seed(11)
    edges = list(
        {(random.randint(0, 40), random.randint(0, 40)) for _ in range(200)}
    )
    edges = [e for e in edges if e[0] != e[1]]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {(r["node"], r["rank"]) for r in pagerank_int(df, iters=5).collect()}
    want = set(_pagerank_ref(edges, 5).items())
    assert got == want


def test_pagerank_duckdb_twin_bit_exact(spark):
    random.seed(23)
    edges = list(
        {(random.randint(0, 25), random.randint(0, 25)) for _ in range(90)}
    )
    edges = [e for e in edges if e[0] != e[1]]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {(r["node"], r["rank"]) for r in pagerank_int(df, iters=4).collect()}
    con = duckdb.connect()
    vals = ",".join(f"({a},{b})" for a, b in edges)
    con.execute(f"CREATE TABLE e AS SELECT * FROM (VALUES {vals}) v(src, dst)")
    sql = (
        "WITH "
        + sql_pagerank_int("SELECT src, dst FROM e", iters=4)
        + " SELECT node, rank FROM r4"
    )
    want = {tuple(r) for r in con.execute(sql).fetchall()}
    assert got == want


def test_pagerank_sink_and_dangling_semantics(spark):
    # chain 1→2→3: 3 is dangling (mass leaks), 1 has no in-edges
    # (settles at base), 2 receives 1's full rank each round.
    df = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank_int(df, iters=3).collect()}
    want = _pagerank_ref([(1, 2), (2, 3)], 3)
    assert got == want
    assert got[1] == 150_000  # base: scale*(100-85)//100
    assert got[3] > got[2] > got[1]  # chain accumulates downstream


def test_pagerank_dedupes_multi_edges(spark):
    # duplicate (1,2) rows must count as ONE edge for outdeg AND flow
    df = spark.createDataFrame(
        [(1, 2), (1, 2), (1, 3)], "src long, dst long"
    )
    got = {r["node"]: r["rank"] for r in pagerank_int(df, iters=2).collect()}
    want = _pagerank_ref([(1, 2), (1, 3)], 2)
    assert got == want
    assert got[2] == got[3]


# ---------------------------------------------------------- pareto


def _dominated(p, q):
    return q[0] >= p[0] and q[1] >= p[1] and (q[0] > p[0] or q[1] > p[1])


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_pareto_front_matches_brute_force(spark, seed):
    random.seed(seed)
    # small value range forces duplicate points and x/y ties — the
    # dominance edge cases (duplicates are mutually non-dominating)
    pts = [
        (i, random.randint(0, 12), random.randint(0, 12)) for i in range(400)
    ]
    df = spark.createDataFrame(pts, "id long, x long, y long").repartition(5)
    got = {tuple(r) for r in pareto_front_2d(df, "x", "y").collect()}
    want = {
        p for p in pts if not any(_dominated(p[1:], q[1:]) for q in pts)
    }
    assert got == want


def test_pareto_front_duckdb_twin(spark):
    random.seed(9)
    pts = [(i, random.randint(0, 30), random.randint(0, 30)) for i in range(300)]
    df = spark.createDataFrame(pts, "id long, x long, y long").repartition(4)
    got = {tuple(r) for r in pareto_front_2d(df, "x", "y").collect()}
    con = duckdb.connect()
    vals = ",".join(str(p) for p in pts)
    con.execute(f"CREATE TABLE t AS SELECT * FROM (VALUES {vals}) v(id, x, y)")
    want = {
        tuple(r)
        for r in con.execute(
            sql_pareto_front_2d("SELECT * FROM t", "x", "y")
        ).fetchall()
    }
    assert got == want


def test_pareto_front_single_point_and_total_order(spark):
    one = spark.createDataFrame([(1, 5, 5)], "id long, x long, y long")
    assert pareto_front_2d(one, "x", "y").count() == 1
    # strictly increasing x with strictly decreasing y: EVERY point is
    # on the front
    chain = spark.createDataFrame(
        [(i, i, 100 - i) for i in range(20)], "id long, x long, y long"
    ).repartition(3)
    assert pareto_front_2d(chain, "x", "y").count() == 20


# ------------------------------------------------------- histogram


def test_value_histogram_exact_and_twin(spark):
    cents = [0, 1, 499, 500, 501, 999, 1000, 2500, 2500, 9999]
    df = spark.createDataFrame([(c,) for c in cents], "c long")
    got = {
        tuple(r)
        for r in value_histogram(df, F.col("c"), 500).collect()
    }
    # hand-rolled expectation
    import collections

    binned = collections.defaultdict(lambda: [0, 0])
    for c in cents:
        b = c // 500
        binned[b][0] += 1
        binned[b][1] += c
    cum = 0
    want = set()
    for b in sorted(binned):
        n, s = binned[b]
        cum += n
        want.add((b, b * 500, n, s, cum))
    assert got == want
    con = duckdb.connect()
    vals = ",".join(f"({c})" for c in cents)
    con.execute(f"CREATE TABLE t AS SELECT * FROM (VALUES {vals}) v(c)")
    twin = {
        tuple(r)
        for r in con.execute(
            sql_value_histogram("SELECT c FROM t", "c", 500)
        ).fetchall()
    }
    assert twin == want


# ------------------------------------------------- spatial anti-join


def test_pip_anti_is_exact_complement_of_semi(spark):
    import __spark_entry__ as E
    from workstealing_spatial_join_spark.sources import tables as TB

    sf = "/root/testdata/sf0.001"
    pts = TB.customer_points(spark, sf)
    n_all = pts.count()
    semi = E._pip(spark, sf, "semi")
    anti = E.queries()["pip_anti"](spark, sf)
    n_semi, n_anti = semi.count(), anti.count()
    assert n_semi + n_anti == n_all
    # disjoint: no id in both
    overlap = anti.join(
        semi.withColumnRenamed("point_id", "c_custkey"), "c_custkey"
    ).count()
    assert overlap == 0


# ------------------------------------------------------- plan gates


def test_batch7_plan_budgets(spark):
    """All four batch-7 driver queries are pure Catalyst: zero Arrow
    and zero row-at-a-time Python nodes."""
    import __spark_entry__ as E

    qs = E.queries()
    sf = "/root/testdata/sf0.001"
    for name in (
        "pip_anti",
        "events_pagerank",
        "events_pareto",
        "events_value_hist",
    ):
        audit = audit_plan(qs[name](spark, sf))
        assert audit["python_nodes"]["ArrowEvalPython"] == 0, name
        assert audit["python_nodes"]["BatchEvalPython"] == 0, name
