"""Temporal operators over the events stream: as-of join.

The as-of join ("for each left event, the most recent right event at
or before it, per key") is the canonical operator Spark's join syntax
lacks (SURVEY §2.5 extension family; kdb+ `aj`, Flink temporal join,
pandas `merge_asof`). A naive implementation is a range join —
O(n·m) per key after the shuffle, and Spark plans `l.ts >= r.ts` as a
broadcast-nested-loop. This one is the merge shape instead: union
both sides, ONE shuffle on the key, one ordered window pass carrying
the last right-side row forward (`last(..., ignorenulls=True)`).
Cost at 100 TB: a single hash exchange + in-partition sort — the same
plan a sort-merge join would pay, with no per-key quadratic refine.

Tie rule (deterministic, SQL-reproducible): rows are ordered by
``(ts, id)``; a right row at the exact same timestamp matches iff its
id sorts before the left row's id. Ids are assumed unique across both
sides (true for `events.event_id`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    events: DataFrame,
    left_type: str,
    right_type: str,
    key: str = "user_id",
    ts: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """For each event of ``left_type``, attach the most recent
    prior-or-equal event of ``right_type`` with the same ``key``.

    Returns ``(event_id, user_id, matched_id:long nullable,
    gap_us:long nullable)`` where gap_us is the microsecond lag from
    the matched right event to the left event (exact integer — no
    float time arithmetic).
    """
    both = events.where(F.col(type_col).isin(left_type, right_type)).select(
        F.col(id_col).alias("event_id"),
        F.col(key).alias("user_id"),
        # events.ts is TIMESTAMP_NTZ; with the session pinned to UTC
        # (session.py) the NTZ→LTZ cast is deterministic and
        # unix_micros matches DuckDB's epoch_us on the same naive value
        F.unix_micros(F.col(ts).cast("timestamp")).alias("ts_us"),
        F.col(type_col).alias("event_type"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_right = F.col("event_type") == right_type
    matched_id = F.last(F.when(is_right, F.col("event_id")), ignorenulls=True)
    matched_ts = F.last(F.when(is_right, F.col("ts_us")), ignorenulls=True)
    return (
        both.select(
            "event_id",
            "user_id",
            "ts_us",
            "event_type",
            matched_id.over(w).alias("matched_id"),
            matched_ts.over(w).alias("matched_ts"),
        )
        .where(F.col("event_type") == left_type)
        .select(
            "event_id",
            "user_id",
            "matched_id",
            (F.col("ts_us") - F.col("matched_ts")).alias("gap_us"),
        )
    )
