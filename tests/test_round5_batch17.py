"""Round-5 batch 17: TPC-H Q13 (zero-inclusive order-count
distribution), Q14 (exact int64 promo ppm via base-1000 long
division), Q17 (cross-multiplied small-quantity threshold)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from workstealing_spatial_join_spark.plans.planner import audit_plan


def _frames(spark, monkeypatch, frames):
    from workstealing_spatial_join_spark.sources import tables as TB

    monkeypatch.setattr(TB, "load", lambda sp, sf, t: frames[t])


# ------------------------------------------------------------- q13


def test_q13_zero_bucket_included(spark, monkeypatch):
    import __spark_entry__ as E

    cust = spark.createDataFrame(
        [(1,), (2,), (3,), (4,)], "c_custkey long"
    )
    orders = spark.createDataFrame(
        [(10, 1), (11, 1), (12, 2)], "o_orderkey long, o_custkey long"
    )
    _frames(spark, monkeypatch, {"customer": cust, "orders": orders})
    got = {
        r["c_count"]: r["custdist"]
        for r in E.q_q13_custdist(spark, "ignored").collect()
    }
    # customers 3 and 4 never ordered — the 0 bucket MUST exist
    assert got == {0: 2, 1: 1, 2: 1}


def test_q13_plan_zero_python(spark):
    import __spark_entry__ as E

    df = E.queries()["q13_custdist"](spark, "/root/testdata/sf0.001")
    assert sum(audit_plan(df)["python_nodes"].values()) == 0


# ------------------------------------------------------------- q14


def test_ppm_longdiv_exact_both_engines(spark):
    import duckdb

    import __spark_entry__ as E

    cases = [
        (0, 1),
        (1, 3),
        (2, 3),
        (999_999, 1_000_000),
        # t large enough that naive p·10^6 overflows int64
        (3_141_592_653_589_793, 9_000_000_000_000_000),
        (8_999_999_999_999_999, 9_000_000_000_000_000),
        (4_500_000_000_000_001, 9_000_000_000_000_002),
    ]
    exp = [(p * 10**6) // t for p, t in cases]
    df = spark.createDataFrame(cases, "promo_cc long, total_cc long")
    got_spark = [
        r[0]
        for r in df.select(
            F.expr(E.ppm_longdiv_sql("spark"))
        ).collect()
    ]
    assert got_spark == exp
    con = duckdb.connect()
    got_duck = [
        con.execute(
            "SELECT CAST("
            + E.ppm_longdiv_sql("duckdb", str(p), str(t))
            + " AS BIGINT)"
        ).fetchone()[0]
        for p, t in cases
    ]
    assert got_duck == exp


def test_q14_crafted_month(spark, monkeypatch):
    import __spark_entry__ as E

    part = spark.createDataFrame(
        [(1, "PROMO"), (2, "ECONOMY")], "p_partkey long, p_type string"
    )
    mar = dt.datetime(1996, 3, 10)
    out = dt.datetime(1996, 5, 1)
    li = spark.createDataFrame(
        [
            # promo: 100.00 at 0% discount → 10000·100 = 1_000_000 cc
            (1, mar, 100.0, 0.0),
            # non-promo: 300.00 at 10% → 30000·90 = 2_700_000 cc
            (2, mar, 300.0, 0.10),
            # outside the month window: ignored
            (1, out, 999.0, 0.0),
        ],
        "l_partkey long, l_shipdate timestamp, "
        "l_extendedprice double, l_discount double",
    )
    _frames(spark, monkeypatch, {"part": part, "lineitem": li})
    row = E.q_q14_promo_ppm(spark, "ignored").collect()[0]
    assert (row["promo_cc"], row["total_cc"]) == (1_000_000, 3_700_000)
    assert row["promo_ppm"] == (1_000_000 * 10**6) // 3_700_000


def test_q14_plan_zero_python_broadcast(spark):
    import __spark_entry__ as E

    df = E.queries()["q14_promo_ppm"](spark, "/root/testdata/sf0.001")
    audit = audit_plan(df)
    assert sum(audit["python_nodes"].values()) == 0
    assert audit["broadcast_joins"] >= 1


# ------------------------------------------------------------- q17


def test_q17_threshold_boundary(spark, monkeypatch):
    import __spark_entry__ as E

    part = spark.createDataFrame(
        [(1, E.Q17_BRAND), (2, E.Q17_BRAND), (3, "Brand#1")],
        "p_partkey long, p_brand string",
    )
    # part 1: qtys (1,1,2,16) → sum 20, cnt 4: 5·1·4 = 20 == sum →
    # the strict < EXCLUDES the boundary rows (n_small contribution 0)
    # part 2: qtys (1,1,2,17) → sum 21: 20 < 21 → both qty-1 rows in
    # part 3: wrong brand, never scanned past the broadcast filter
    rows = [
        (1, 1.0, 10.00), (1, 1.0, 11.00), (1, 2.0, 12.00), (1, 16.0, 13.00),
        (2, 1.0, 20.00), (2, 1.0, 21.00), (2, 2.0, 22.00), (2, 17.0, 23.00),
        (3, 1.0, 99.00),
    ]
    li = spark.createDataFrame(
        rows, "l_partkey long, l_quantity double, l_extendedprice double"
    )
    _frames(spark, monkeypatch, {"part": part, "lineitem": li})
    row = E.q_q17_small_qty_revenue(spark, "ignored").collect()[0]
    assert row["n_small"] == 2
    assert row["sum_price_c"] == 2000 + 2100
    assert row["avg_yearly_cc"] == (2000 + 2100) // 7


def test_q17_plan_zero_python_broadcast(spark):
    import __spark_entry__ as E

    df = E.queries()["q17_small_qty_revenue"](
        spark, "/root/testdata/sf0.001"
    )
    audit = audit_plan(df)
    assert sum(audit["python_nodes"].values()) == 0
    assert audit["broadcast_joins"] >= 1


# ------------------------------------------------------------- q19


def test_q19_bracket_membership(spark, monkeypatch):
    import __spark_entry__ as E

    part = spark.createDataFrame(
        [
            (1, "Brand#12", 3),   # in bracket 1 size range
            (2, "Brand#12", 6),   # size OUT of bracket 1
            (3, "Brand#23", 15),  # size OUT of bracket 2 (1..10)
            (4, "Brand#34", 15),  # in bracket 3 size range
            (5, "Brand#99", 3),   # brand matches nothing
        ],
        "p_partkey long, p_brand string, p_size int",
    )
    li = spark.createDataFrame(
        [
            # part 1: qty 11 is the bracket-1 UPPER boundary → in
            (1, 11.0, 100.0, 0.0),
            # part 1: qty 12 just above → out
            (1, 12.0, 100.0, 0.0),
            # part 2: right qty but size fails → out
            (2, 5.0, 100.0, 0.0),
            # part 3: right qty for Brand#23 but size fails → out
            (3, 15.0, 100.0, 0.0),
            # part 4: qty 20 is bracket-3 LOWER boundary → in
            (4, 20.0, 200.0, 0.10),
            # part 5: unmatched brand never joins
            (5, 3.0, 999.0, 0.0),
        ],
        "l_partkey long, l_quantity double, "
        "l_extendedprice double, l_discount double",
    )
    _frames(spark, monkeypatch, {"part": part, "lineitem": li})
    row = E.q_q19_bracket_revenue(spark, "ignored").collect()[0]
    assert row["n_items"] == 2
    # 10000·100 + 20000·90
    assert row["revenue_cc"] == 1_000_000 + 1_800_000


def test_q19_plan_zero_python_broadcast(spark):
    import __spark_entry__ as E

    df = E.queries()["q19_bracket_revenue"](
        spark, "/root/testdata/sf0.001"
    )
    audit = audit_plan(df)
    assert sum(audit["python_nodes"].values()) == 0
    assert audit["broadcast_joins"] >= 1


# ------------------------------------------------------------- q22


def test_q22_cross_multiplied_mean_boundary(spark, monkeypatch):
    import __spark_entry__ as E

    # positive balances: 100, 200, 300, 250 cents → sum 850, n 4;
    # bal·4 > 850 ⇔ bal > 212.5
    cust = spark.createDataFrame(
        [
            (1, 10, 1.00),   # below mean
            (2, 10, 2.00),   # 200·4 = 800 < 850: excluded
            (3, 20, 3.00),   # rich, only a PRE-cutoff order → idle
            (4, 20, -5.00),  # negative: excluded from the mean AND
                             # from the result (bal·n < sum)
            (5, 20, 2.50),   # rich but ordered AFTER the cutoff
        ],
        "c_custkey long, c_nationkey long, c_acctbal double",
    )
    orders = spark.createDataFrame(
        [
            (3, dt.datetime(1999, 12, 31)),  # pre-cutoff: stays idle
            (5, dt.datetime(2000, 1, 1)),    # cutoff is inclusive
        ],
        "o_custkey long, o_orderdate timestamp",
    )
    _frames(spark, monkeypatch, {"customer": cust, "orders": orders})
    rows = {
        r["c_nationkey"]: (r["numcust"], r["totacctbal_c"])
        for r in E.q_q22_idle_customers(spark, "ignored").collect()
    }
    assert rows == {20: (1, 300)}


def test_q22_plan_zero_python(spark):
    import __spark_entry__ as E

    df = E.queries()["q22_idle_customers"](
        spark, "/root/testdata/sf0.001"
    )
    audit = audit_plan(df)
    assert sum(audit["python_nodes"].values()) == 0
