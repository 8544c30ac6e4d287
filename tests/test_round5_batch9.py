"""Round-5 batch 9: TPC-H Q5 shape, per-user pivot crosstab,
referential-integrity audit, exact per-group median/MAD. Unit
semantics on crafted inputs plus plan gates (the driver contract +
scripts/check_contract.py cover sf0.01 oracle parity)."""

from __future__ import annotations

import statistics

from pyspark.sql import functions as F

from workstealing_spatial_join_spark.plans.planner import audit_plan


def test_events_mad_matches_order_statistic_reference(spark):
    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    got = {
        r["event_type"]: (r["n"], r["med_cents"], r["mad_cents"])
        for r in E.queries()["events_mad"](spark, sf).collect()
    }
    ev = spark.read.parquet(f"{sf}/events.parquet").collect()
    groups = {}
    for r in ev:
        groups.setdefault(r["event_type"], []).append(round(r["value"] * 100))

    def med(vals):
        # rank ceil(n/2) order statistic — the repo's discrete-median
        # convention (lower median for even n)
        s = sorted(vals)
        return s[-(-len(s) // 2) - 1]

    for t, vals in groups.items():
        m = med(vals)
        d = med([abs(v - m) for v in vals])
        assert got[t] == (len(vals), m, d), t


def test_events_pivot_matches_conditional_counts(spark):
    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    got = {
        r["user_id"]: tuple(r[f"n_{t}"] for t in E.EVENT_TYPES)
        for r in E.queries()["events_pivot"](spark, sf).collect()
    }
    ev = spark.read.parquet(f"{sf}/events.parquet").collect()
    want = {}
    for r in ev:
        c = want.setdefault(r["user_id"], {t: 0 for t in E.EVENT_TYPES})
        c[r["event_type"]] += 1
    assert got == {
        u: tuple(c[t] for t in E.EVENT_TYPES) for u, c in want.items()
    }


def test_rel_integrity_audit_detects_crafted_orphans(spark, monkeypatch):
    """On crafted tables with KNOWN violations the audit reports the
    exact counts (the driver tables are clean — zeros alone would not
    prove the operator sees orphans)."""
    import __spark_entry__ as E
    from workstealing_spatial_join_spark.sources import tables as TB

    li = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10), (99, 10), (98, 12)],
        "l_orderkey long, l_suppkey long",
    )  # orderkeys 98,99 have no parent order
    orders = spark.createDataFrame(
        [(1, 5), (2, 6), (3, 777)], "o_orderkey long, o_custkey long"
    )  # custkey 777 missing; order 3 has no lineitems (not audited)
    cust = spark.createDataFrame(
        [(5,), (6,), (7,)], "c_custkey long"
    )  # 7 has no orders
    supp = spark.createDataFrame(
        [(10,), (11,), (12,), (13,)], "s_suppkey long"
    )  # 13 has no lineitems
    frames = {
        "lineitem": li,
        "orders": orders,
        "customer": cust,
        "supplier": supp,
    }
    monkeypatch.setattr(TB, "load", lambda sp, sf, t: frames[t])
    got = {
        r["relation"]: r["n_rows"]
        for r in E.q_rel_integrity_audit(spark, "ignored").collect()
    }
    assert got == {
        "lineitem_orphans": 2,
        "orders_orphans": 1,
        "customers_without_orders": 1,
        "suppliers_without_lineitems": 1,
    }


def test_q5_same_nation_constraint_is_enforced(spark):
    """The s_nationkey = c_nationkey predicate must prune revenue:
    dropping it can only increase the total (strictly, on the driver
    fixture where cross-nation supplier matches exist)."""
    import __spark_entry__ as E
    from workstealing_spatial_join_spark.sources import tables as TB

    sf = "/root/testdata/sf0.001"
    with_c = (
        E.queries()["q5_region_revenue"](spark, sf)
        .agg(F.sum("revenue_cc"))
        .collect()[0][0]
    )
    # rebuild without the same-nation constraint
    region = TB.load(spark, sf, "region").where(F.col("r_name") == "ASIA")
    nation = TB.load(spark, sf, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    cust = TB.load(spark, sf, "customer").join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    )
    orders = (
        TB.load(spark, sf, "orders")
        .where(
            (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
            & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-01-01")))
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
    )
    rev = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        F.lit(100) - F.round(F.col("l_discount") * 100).cast("long")
    )
    loose = (
        TB.load(spark, sf, "lineitem")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .agg(F.sum(rev))
        .collect()[0][0]
    )
    assert with_c is not None and loose is not None
    assert with_c < loose


def test_batch9_plan_budgets(spark):
    import __spark_entry__ as E

    qs = E.queries()
    sf = "/root/testdata/sf0.001"
    for name in (
        "q5_region_revenue",
        "events_pivot",
        "rel_integrity_audit",
        "events_mad",
    ):
        audit = audit_plan(qs[name](spark, sf))
        assert audit["python_nodes"]["ArrowEvalPython"] == 0, name
        assert audit["python_nodes"]["BatchEvalPython"] == 0, name
