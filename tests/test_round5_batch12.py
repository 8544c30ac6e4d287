"""Round-5 batch 12: winnowing fingerprints (alignment-robust dup
detection), TPC-H Q2-shape argmin join, Q18-shape HAVING semi-join."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from workstealing_spatial_join_spark.operators.textops import (
    dup_spans,
    winnow_dup_grams,
)
from workstealing_spatial_join_spark.plans.planner import audit_plan

K, W = 32, 16


def _winnow_ref(rows, k=K, w=W):
    """Plain-python winnowing reference: for each window of w
    consecutive gram hashes (including trailing short windows, as the
    engine does), select the (hash, pos) min; distinct selections,
    then cross-doc gram counts."""
    sel: dict[str, dict[int, set[int]]] = {}
    for doc_id, text in rows:
        if len(text) < k:
            continue
        encs = []
        for pos in range(1, len(text) - k + 2):
            h = hashlib.md5(text[pos - 1 : pos - 1 + k].encode()).hexdigest()
            encs.append(h + "|" + str(pos).zfill(12))
        chosen = set()
        for i in range(len(encs)):
            chosen.add(min(encs[i : i + w]))
        for c in chosen:
            h, pos = c.split("|")
            sel.setdefault(h, {}).setdefault(doc_id, set()).add(int(pos))
    return {
        h: (len(docs), sum(len(p) for p in docs.values()))
        for h, docs in sel.items()
        if len(docs) >= 2
    }


def test_winnow_matches_python_reference(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, "zz alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (3, "totally different text with no overlap whatsoever here ok"),
        (4, "short"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["gram_hash"]: (r["n_docs"], r["n_sel"])
        for r in winnow_dup_grams(df).collect()
    }
    assert got == _winnow_ref(rows)
    assert got  # the shifted copy IS detected


def test_winnow_robust_where_strided_grid_misses(spark):
    # identical 60-char region at offsets 0 and 7: NOT congruent mod
    # 20, so dup_spans's strided windows hash different substrings —
    # but the region is ≥ K + W - 1 = 47 chars, so winnowing selects
    # an identical gram in both copies by the SIGMOD'03 guarantee
    region = "the exact same sentence appears twice, but shifted by seven!"
    assert len(region) >= 60
    rows = [
        (1, region + " tail of document number one, long enough"),
        (2, "seven__" + region + " other tail text for document two"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert dup_spans(df).count() == 0  # strided grid: blind here
    winnowed = winnow_dup_grams(df).count()
    assert winnowed > 0  # winnowing: catches the shifted copy


def test_winnow_plan_zero_python(spark):
    import __spark_entry__ as E

    df = E.queries()["doc_winnow_dups"](spark, "/root/testdata/sf0.001")
    audit = audit_plan(df)
    assert sum(audit["python_nodes"].values()) == 0


def test_q2_argmin_tiebreak_and_values(spark, monkeypatch):
    import __spark_entry__ as E
    from workstealing_spatial_join_spark.sources import tables as TB

    li = spark.createDataFrame(
        [
            # part 1: tie on min price 5.00 between suppliers 9 and 2
            # → lower suppkey (2) must win in both engines
            (1, 9, 5.00),
            (1, 2, 5.00),
            (1, 3, 7.25),
            # part 2: single offer
            (2, 9, 1.99),
        ],
        "l_partkey long, l_suppkey long, l_extendedprice double",
    )
    sup = spark.createDataFrame(
        [(2, 0), (3, 0), (9, 1)], "s_suppkey long, s_nationkey long"
    )
    nat = spark.createDataFrame(
        [(0, "FRANCE"), (1, "KENYA")], "n_nationkey long, n_name string"
    )
    frames = {"lineitem": li, "supplier": sup, "nation": nat}
    monkeypatch.setattr(TB, "load", lambda sp, sf, t: frames[t])
    got = {
        r["p_partkey"]: (
            r["s_suppkey"],
            r["min_price_cents"],
            r["supplier_nation"],
        )
        for r in E.q_q2_min_cost_supplier(spark, "ignored").collect()
    }
    assert got == {1: (2, 500, "FRANCE"), 2: (9, 199, "KENYA")}


def test_q2_plan_zero_python_broadcasts(spark):
    import __spark_entry__ as E

    df = E.queries()["q2_min_cost_supplier"](spark, "/root/testdata/sf0.001")
    audit = audit_plan(df)
    assert sum(audit["python_nodes"].values()) == 0
    assert audit["broadcast_joins"] >= 2  # supplier and nation dims


def test_q18_threshold_boundary(spark, monkeypatch):
    import __spark_entry__ as E
    from workstealing_spatial_join_spark.sources import tables as TB

    thr = E.Q18_MIN_QTY
    li = spark.createDataFrame(
        # order 1 sums to exactly thr (excluded: strict >);
        # order 2 sums to thr+1 (included)
        [(1, float(thr - 10)), (1, 10.0), (2, float(thr)), (2, 1.0)],
        "l_orderkey long, l_quantity double",
    )
    orders = spark.createDataFrame(
        [(1, 77), (2, 88)], "o_orderkey long, o_custkey long"
    )
    frames = {"lineitem": li, "orders": orders}
    monkeypatch.setattr(TB, "load", lambda sp, sf, t: frames[t])
    rows = E.q_q18_large_orders(spark, "ignored").collect()
    assert [(r["c_custkey"], r["o_orderkey"], r["total_qty"]) for r in rows] == [
        (88, 2, thr + 1)
    ]


def test_q18_plan_zero_python(spark):
    import __spark_entry__ as E

    df = E.queries()["q18_large_orders"](spark, "/root/testdata/sf0.001")
    audit = audit_plan(df)
    assert sum(audit["python_nodes"].values()) == 0
