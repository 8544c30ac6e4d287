"""Interval (range) self-join — bin decomposition + responsible-bin
dedup (operators/temporal.interval_overlap_join), the 1-D temporal
twin of the spatial grid-cell join (reference src/thread_util.cpp
joins by grid cell; here the cell is a fixed time bin)."""

import pyspark.sql.functions as F
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from workstealing_spatial_join_spark.operators.temporal import (
    interval_overlap_join,
)

W = 100  # small bin width so multi-bin spans are common in tests


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, start_us long, end_us long"
    )


def _pairs(df):
    return {
        (r.event_id_a, r.event_id_b, r.user_id, r.overlap_us)
        for r in df.collect()
    }


def _brute(rows):
    """Schedule-free definition: all-pairs closed-interval overlap."""
    out = set()
    for i, (ia, ka, sa, ea) in enumerate(rows):
        for ib, kb, sb, eb in rows[i + 1 :]:
            lo, hi = (ia, ib) if ia < ib else (ib, ia)
            if ka == kb and sa <= eb and sb <= ea:
                out.add((lo, hi, ka, min(ea, eb) - max(sa, sb)))
    return out


def test_basic_overlap_touch_and_disjoint(spark):
    rows = [
        (1, 7, 0, 50),      # overlaps 2 by 10
        (2, 7, 40, 120),    # touches 3 at exactly 120
        (3, 7, 120, 130),   # disjoint from 1
        (4, 7, 500, 600),   # disjoint from all
        (5, 8, 0, 1000),    # other user — never pairs with user 7
    ]
    got = _pairs(interval_overlap_join(_mk(spark, rows), bin_us=W))
    assert got == {
        (1, 2, 7, 10),
        (2, 3, 7, 0),  # closed intervals: touching endpoints count
    }


def test_multi_bin_span_emitted_once(spark):
    # both intervals span many bins and share several — the
    # responsible-bin rule must emit the pair exactly once
    rows = [(1, 7, 0, 950), (2, 7, 10, 920)]
    df = interval_overlap_join(_mk(spark, rows), bin_us=W)
    rws = df.collect()
    assert len(rws) == 1
    assert (rws[0].event_id_a, rws[0].event_id_b, rws[0].overlap_us) == (
        1,
        2,
        910,
    )


def test_id_order_and_schema(spark):
    rows = [(9, 7, 0, 10), (2, 7, 5, 15)]
    df = interval_overlap_join(_mk(spark, rows), bin_us=W)
    assert df.columns == ["event_id_a", "event_id_b", "user_id", "overlap_us"]
    r = df.collect()[0]
    assert (r.event_id_a, r.event_id_b) == (2, 9)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 2),          # key
            st.integers(0, 500),        # start
            st.integers(0, 300),        # length
        ),
        min_size=0,
        max_size=25,
    )
)
def test_matches_bruteforce(spark, raw):
    rows = [
        (i, k, s, s + ln) for i, (k, s, ln) in enumerate(raw)
    ]
    got = _pairs(interval_overlap_join(_mk(spark, rows), bin_us=W))
    assert got == _brute(rows)


@pytest.mark.parametrize("bin_us", [1, 37, 100, 10_000])
def test_bin_width_invariance(spark, bin_us):
    """The answer must not depend on the decomposition width — the
    work-stealing invariant in 1-D."""
    rows = [
        (i, i % 3, (i * 37) % 400, (i * 37) % 400 + (i * 53) % 250)
        for i in range(30)
    ]
    got = _pairs(interval_overlap_join(_mk(spark, rows), bin_us=bin_us))
    assert got == _brute(rows)


def test_plan_is_pure_catalyst(spark):
    from workstealing_spatial_join_spark.plans.planner import audit_plan

    rows = [(1, 7, 0, 50), (2, 7, 40, 120)]
    df = interval_overlap_join(_mk(spark, rows), bin_us=W)
    audit = audit_plan(df)
    assert audit["python_nodes"]["ArrowEvalPython"] == 0
    assert audit["python_nodes"]["BatchEvalPython"] == 0
