"""Round-5 batch 19: TPC-H Q7/Q8/Q10/Q15/Q21 shapes — direction,
share, tie-break, ties-kept, and only-late-supplier semantics."""

from __future__ import annotations

import datetime as dt

from workstealing_spatial_join_spark.plans.planner import audit_plan


def _frames(spark, monkeypatch, frames):
    from workstealing_spatial_join_spark.sources import tables as TB

    monkeypatch.setattr(TB, "load", lambda sp, sf, t: frames[t])


def _nation(spark):
    return spark.createDataFrame(
        [(1, "NATION_1", 0), (2, "NATION_2", 0), (3, "NATION_3", 1)],
        "n_nationkey long, n_name string, n_regionkey long",
    )


# -------------------------------------------------------------- q7


def test_q7_directions_kept_separately(spark, monkeypatch):
    import __spark_entry__ as E

    d = dt.datetime(1996, 6, 1)
    supp = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3)], "s_suppkey long, s_nationkey long"
    )
    cust = spark.createDataFrame(
        [(100, 1), (200, 2), (300, 3)],
        "c_custkey long, c_nationkey long",
    )
    orders = spark.createDataFrame(
        [(1000, 100), (2000, 200), (3000, 300)],
        "o_orderkey long, o_custkey long",
    )
    li = spark.createDataFrame(
        [
            (2000, 10, 100.0, 0.0, d),   # N1 supp → N2 cust (kept)
            (1000, 20, 200.0, 0.0, d),   # N2 supp → N1 cust (kept)
            (1000, 10, 400.0, 0.0, d),   # N1 → N1 (dropped)
            (3000, 10, 800.0, 0.0, d),   # N1 → N3 (dropped)
            (2000, 10, 50.0, 0.0, dt.datetime(1995, 6, 1)),  # out of window
        ],
        "l_orderkey long, l_suppkey long, l_extendedprice double, "
        "l_discount double, l_shipdate timestamp",
    )
    _frames(
        spark,
        monkeypatch,
        {
            "nation": _nation(spark),
            "supplier": supp,
            "customer": cust,
            "orders": orders,
            "lineitem": li,
        },
    )
    rows = {
        (r["supp_nation"], r["cust_nation"], r["l_year"]): r["revenue_cc"]
        for r in E.q_q7_nation_volume(spark, "ignored").collect()
    }
    assert rows == {
        ("NATION_1", "NATION_2", 1996): 1_000_000,
        ("NATION_2", "NATION_1", 1996): 2_000_000,
    }


# -------------------------------------------------------------- q8


def test_q8_share_including_zero_year(spark, monkeypatch):
    import __spark_entry__ as E

    region = spark.createDataFrame(
        [(0, "ASIA"), (1, "EUROPE")], "r_regionkey long, r_name string"
    )
    part = spark.createDataFrame(
        [(1, "PROMO"), (2, "ECONOMY")], "p_partkey long, p_type string"
    )
    supp = spark.createDataFrame(
        [(10, 2), (20, 3)], "s_suppkey long, s_nationkey long"
    )
    # cust 100 in region ASIA (nation 1), cust 300 in EUROPE (nation 3)
    cust = spark.createDataFrame(
        [(100, 1), (300, 3)], "c_custkey long, c_nationkey long"
    )
    orders = spark.createDataFrame(
        [
            (1, 100, dt.datetime(1996, 2, 1)),
            (2, 100, dt.datetime(1997, 2, 1)),
            (3, 300, dt.datetime(1996, 2, 1)),
        ],
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    )
    li = spark.createDataFrame(
        [
            # 1996: NATION_2 supplier sells 100.00, other nation 300.00
            (1, 1, 10, 100.0, 0.0),
            (1, 1, 20, 300.0, 0.0),
            # 1997: only the non-target nation sells → share 0
            (2, 1, 20, 500.0, 0.0),
            # EUROPE customer: excluded from the region entirely
            (3, 1, 10, 999.0, 0.0),
            # wrong part type: excluded
            (1, 2, 10, 777.0, 0.0),
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_extendedprice double, l_discount double",
    )
    _frames(
        spark,
        monkeypatch,
        {
            "region": region,
            "part": part,
            "supplier": supp,
            "customer": cust,
            "orders": orders,
            "nation": _nation(spark),
            "lineitem": li,
        },
    )
    rows = {
        r["o_year"]: (r["nation_cc"], r["total_cc"], r["share_ppm"])
        for r in E.q_q8_market_share(spark, "ignored").collect()
    }
    assert rows == {
        1996: (1_000_000, 4_000_000, 250_000),
        1997: (0, 5_000_000, 0),
    }


# ------------------------------------------------------------- q10


def test_q10_boundary_tie_broken_by_custkey(spark, monkeypatch):
    import __spark_entry__ as E

    d = dt.datetime(1996, 2, 1)
    # 25 customers, all with IDENTICAL returned revenue → the top-20
    # cut is entirely tie-break; custkeys 1..20 must win
    n = 25
    cust = spark.createDataFrame(
        [(i, 1) for i in range(1, n + 1)],
        "c_custkey long, c_nationkey long",
    )
    orders = spark.createDataFrame(
        [(i, i, d) for i in range(1, n + 1)],
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    )
    li = spark.createDataFrame(
        [(i, "R", 100.0, 0.0) for i in range(1, n + 1)],
        "l_orderkey long, l_returnflag string, "
        "l_extendedprice double, l_discount double",
    )
    _frames(
        spark,
        monkeypatch,
        {
            "customer": cust,
            "orders": orders,
            "lineitem": li,
            "nation": _nation(spark),
        },
    )
    rows = E.q_q10_returned_revenue(spark, "ignored").collect()
    assert sorted(r["c_custkey"] for r in rows) == list(range(1, 21))
    assert all(r["revenue_cc"] == 1_000_000 for r in rows)


# ------------------------------------------------------------- q15


def test_q15_ties_all_kept(spark, monkeypatch):
    import __spark_entry__ as E

    d = dt.datetime(1996, 2, 1)
    li = spark.createDataFrame(
        [
            (1, 10, 100.0, 0.0, d),
            (2, 20, 60.0, 0.0, d),
            (3, 20, 40.0, 0.0, d),   # supp 20 also totals 100.00
            (4, 30, 99.99, 0.0, d),  # one cent short: excluded
        ],
        "l_orderkey long, l_suppkey long, l_extendedprice double, "
        "l_discount double, l_shipdate timestamp",
    )
    _frames(spark, monkeypatch, {"lineitem": li})
    rows = {
        r["s_suppkey"]: r["total_cc"]
        for r in E.q_q15_top_supplier(spark, "ignored").collect()
    }
    assert rows == {10: 1_000_000, 20: 1_000_000}


# ------------------------------------------------------------- q21


def test_q21_only_late_supplier_semantics(spark, monkeypatch):
    import __spark_entry__ as E

    d0 = dt.datetime(1996, 1, 1)
    late = d0 + dt.timedelta(days=61)
    ontime = d0 + dt.timedelta(days=60)  # boundary: NOT late
    orders = spark.createDataFrame(
        [(i, d0) for i in (1, 2, 3, 4)],
        "o_orderkey long, o_orderdate timestamp",
    )
    li = spark.createDataFrame(
        [
            # order 1: supp 10 late, supp 20 on time → 10 waits
            (1, 10, late), (1, 20, ontime),
            # order 2: BOTH late → nobody waits
            (2, 10, late), (2, 20, late),
            # order 3: single-supplier order, late → not counted
            (3, 10, late),
            # order 4: supp 20 late twice (two lineitems) + supp 30
            # on time → supplier-level dedup must count 20 ONCE
            (4, 20, late), (4, 20, late), (4, 30, ontime),
        ],
        "l_orderkey long, l_suppkey long, l_shipdate timestamp",
    )
    _frames(spark, monkeypatch, {"orders": orders, "lineitem": li})
    rows = {
        r["s_suppkey"]: r["numwait"]
        for r in E.q_q21_waiting_supplier(spark, "ignored").collect()
    }
    assert rows == {10: 1, 20: 1}


# ------------------------------------------------------- plan gates


def test_batch19_plans_zero_python(spark):
    import __spark_entry__ as E

    qs = E.queries()
    for name in (
        "q7_nation_volume",
        "q8_market_share",
        "q10_returned_revenue",
        "q15_top_supplier",
        "q21_waiting_supplier",
    ):
        df = qs[name](spark, "/root/testdata/sf0.001")
        audit = audit_plan(df)
        assert sum(audit["python_nodes"].values()) == 0, name


def test_q7_q8_broadcast_dims(spark):
    import __spark_entry__ as E

    qs = E.queries()
    for name in ("q7_nation_volume", "q8_market_share"):
        df = qs[name](spark, "/root/testdata/sf0.001")
        assert audit_plan(df)["broadcast_joins"] >= 2, name
