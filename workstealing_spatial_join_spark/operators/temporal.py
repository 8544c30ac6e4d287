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


def interval_overlap_join(
    intervals: DataFrame,
    key: str = "user_id",
    id_col: str = "event_id",
    start_col: str = "start_us",
    end_col: str = "end_us",
    bin_us: int = 4 * 3600 * 1_000_000,
) -> DataFrame:
    """Self-join of time intervals: all pairs with the same ``key``
    whose CLOSED intervals overlap (touching endpoints count, with
    ``overlap_us = 0``) — the 1-D temporal twin of the spatial
    grid-cell join (reference src/thread_util.cpp joins by grid cell;
    here the "cell" is a fixed time bin).

    Spark has no interval-join operator; the naive
    ``a.s <= b.e AND b.s <= a.e`` theta-join plans as a per-key
    nested loop — O(n²) per key and, keyless, a broadcast-nested-loop
    over everything. This is the bin-decomposition shape instead:

    * each interval explodes over the fixed-width bins it touches
      (``sequence(s DIV W, e DIV W)``, integer division — exact),
    * candidates come from ONE equi-join on ``(key, bin)``,
    * each qualifying pair is emitted EXACTLY ONCE with no DISTINCT
      shuffle: only the bin containing ``greatest(s_a, s_b)`` — the
      "reference bin", the 1-D form of the spatial responsible-cell
      rule (operators/spatial_join.py same-cell scope) — reports it.

    Cost at 100 TB: one hash exchange on (key, bin) with fanout
    ``⌈len/W⌉+1`` per row (pick ``bin_us`` near the typical interval
    length to keep it ~2), map-side pair verify, zero Python nodes.
    Skewed keys split across bins by construction.

    Returns ``({id}_a, {id}_b, key, overlap_us)`` with
    ``{id}_a < {id}_b``; all arithmetic is int64 microseconds (no
    float time math anywhere).
    """
    w = int(bin_us)
    slim = intervals.select(
        F.col(id_col).alias("_id"),
        F.col(key).alias("_key"),
        F.col(start_col).cast("long").alias("_s"),
        F.col(end_col).cast("long").alias("_e"),
    )
    binned = slim.select(
        "_id",
        "_key",
        "_s",
        "_e",
        F.explode(
            F.sequence(
                F.expr(f"_s DIV {w}L"), F.expr(f"_e DIV {w}L")
            )
        ).alias("_bin"),
    )
    a, b = binned.alias("a"), binned.alias("b")
    ca, cb = f"{id_col}_a", f"{id_col}_b"
    ref_bin = F.expr(f"greatest(a._s, b._s) DIV {w}L")
    return (
        a.join(
            b,
            on=[
                F.col("a._key") == F.col("b._key"),
                F.col("a._bin") == F.col("b._bin"),
                F.col("a._id") < F.col("b._id"),
                # closed-interval overlap
                F.col("a._s") <= F.col("b._e"),
                F.col("b._s") <= F.col("a._e"),
                # responsible-bin rule: exactly one bin reports a pair
                ref_bin == F.col("a._bin"),
            ],
        )
        .select(
            F.col("a._id").alias(ca),
            F.col("b._id").alias(cb),
            F.col("a._key").alias(key),
            (
                F.least(F.col("a._e"), F.col("b._e"))
                - F.greatest(F.col("a._s"), F.col("b._s"))
            ).alias("overlap_us"),
        )
    )


def time_rollup(
    events: DataFrame,
    ts: str = "ts",
    value: str = "value",
    levels: tuple[str, ...] = ("hour", "day", "month"),
) -> DataFrame:
    """Hypertable-style continuous aggregate: event counts and sums at
    EVERY time granularity in ONE scan — the temporal twin of the tile
    density pyramid (operators/tiles.tile_density_rollup, which
    rejected the per-level ladder after `.explain` showed one base
    scan per level). Native GROUPING SETS gives the same single-scan
    Expand plan with map-side partial aggregation; calendar-correct
    buckets via ``date_trunc`` (months are not fixed-width, so this is
    NOT the fixed-bin arithmetic the interval join uses).

    The measure is ``round(value*100)`` as int64 cents — bit-portable
    partial-sum arithmetic (double summation is order-dependent; an
    integer SUM is exact in any order, the same rule every sketch in
    operators/sketch.py follows).

    Returns ``(level, bucket_us, n_events, sum_cents)``; at 100 TB
    this is one shuffle whose fanout is ``len(levels)`` — and because
    partial aggregation runs map-side BEFORE the exchange, the rows
    shuffled per level are the distinct buckets, not the events.
    """
    base = events.select(
        F.col(ts).cast("timestamp").alias("_ts"),
        F.round(F.col(value) * 100).cast("long").alias("_cents"),
    )
    bcols = [
        F.unix_micros(F.date_trunc(lv, F.col("_ts"))).alias(f"_b_{lv}")
        for lv in levels
    ]
    df = base.select(*bcols, "_cents")
    # BOUND column refs (df[...]), not unresolved F.col: with
    # unresolved names in the sets list, Spark 4.1's groupingSets
    # mis-matches set members against the grouping columns and
    # silently DROPS result rows (observed: 5 of 6 rows, varying per
    # run; the SQL GROUPING SETS twin of the same plan returns all 6)
    sets = [[df[f"_b_{lv}"]] for lv in levels]
    # grouping() is only legal inside the aggregate, so the level
    # label is computed as an agg expression over the grouping flags
    level_expr = None
    for lv in levels:
        cond = F.grouping(df[f"_b_{lv}"]) == 0
        level_expr = (
            F.when(cond, F.lit(lv))
            if level_expr is None
            else level_expr.when(cond, F.lit(lv))
        )
    grouped = df.groupingSets(
        sets, *[df[f"_b_{lv}"] for lv in levels]
    ).agg(
        level_expr.alias("level"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum("_cents").alias("sum_cents"),
    )
    return grouped.select(
        "level",
        F.coalesce(*[F.col(f"_b_{lv}") for lv in levels]).alias(
            "bucket_us"
        ),
        "n_events",
        "sum_cents",
    )


def conversion_funnel(
    events: DataFrame,
    stages: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered conversion funnel: per user, the earliest stage-1
    event, then for each later stage the earliest event STRICTLY
    AFTER the previous stage's landing time.

    This is sequence matching, not conditional aggregation — a single
    ``groupBy`` with per-type mins can't express "click after THAT
    view" (a user whose only clicks precede their first view must
    not convert). Each stage is one min-aggregate keyed on the user,
    inner-joined to the previous stage's result and filtered to the
    open window; users drop out of later stages but stage 1's frame
    is kept as the left spine, so the output has one row per user
    who reached stage 1, with NULL timestamps past their depth.

    All exchanges hash on ``user_col`` — the stage ladder reuses one
    shuffle footprint — and the per-stage frames shrink
    monotonically. ``funnel_depth`` counts reached stages.
    """
    if len(stages) < 2:
        raise ValueError("conversion_funnel needs at least 2 stages")
    cols = [f"t_{i}" for i in range(len(stages))]
    spine = (
        events.filter(F.col(type_col) == stages[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias(cols[0]))
    )
    prev = spine
    laddered = [spine]
    for i, stage in enumerate(stages[1:], start=1):
        prev = (
            events.filter(F.col(type_col) == stage)
            .join(prev.select(user_col, cols[i - 1]), user_col)
            .filter(F.col(ts_col) > F.col(cols[i - 1]))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(cols[i]))
        )
        laddered.append(prev)
    out = laddered[0]
    for step in laddered[1:]:
        out = out.join(step, user_col, "left")
    depth = F.lit(1)
    for c in cols[1:]:
        depth = depth + F.col(c).isNotNull().cast("int")
    return out.select(
        user_col,
        *[
            F.col(c).alias(f"t_{stage}")
            for c, stage in zip(cols, stages)
        ],
        depth.alias("funnel_depth"),
    )


def time_weighted_avg(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-user TIME-weighted average under last-observation-carried-
    forward (the TimescaleDB ``time_weight('LOCF')`` primitive): each
    observation's value holds until the next one, so the average is
    ``Σ valueᵢ·(tᵢ₊₁−tᵢ) / (t_last − t_first)`` — a step-function
    integral, not the row average (a sensor emitting one reading per
    hour overnight must not outweigh one emitting per second at
    noon).

    Exactness: timestamps become int64 epoch MICROSECONDS
    (``unix_micros`` / ``epoch_us`` — identical integers in both
    engines), values integer cents, so the weighted sum is an exact
    int64 (cents ≤ ~10⁴ × span ≤ ~10¹³ µs per user keeps the sum far
    below 2^63) and the average is the exact floor division
    ``wsum div span`` — no float anywhere. Values must be
    non-negative (Spark ``div`` truncates toward zero, DuckDB ``//``
    floors; they agree only when wsum ≥ 0 — the same convention every
    integer-division operator in this engine documents). Ties on ts are broken by
    event_id in the ordering; a tied interval has dt = 0 and
    contributes nothing, so tie order cannot change the result.
    Users with a single event (span 0) are excluded — LOCF over a
    degenerate interval is undefined.

    Output: (user_id, n_events, span_us, wsum, twa_cents) with
    twa_cents = floor(wsum / span_us).

    Scale shape: ONE exchange on the user key — the lead() window and
    the groupBy share the same hash partitioning, so Catalyst plans a
    single shuffle (plan-gated in tests). The window frame is the
    default growing frame of lead (no buffering beyond one row).
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    cents = F.round(F.col(value_col) * 100).cast("long")
    w = Window.partitionBy(user_col).orderBy("us", "event_id")
    staged = events.select(
        F.col(user_col), F.col("event_id"), us.alias("us"), cents.alias("cents")
    ).withColumn("nxt", F.lead("us").over(w))
    return (
        staged.groupBy(user_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.max("us") - F.min("us")).alias("span_us"),
            F.sum(
                F.when(
                    F.col("nxt").isNotNull(),
                    F.col("cents") * (F.col("nxt") - F.col("us")),
                ).otherwise(F.lit(0))
            ).cast("long").alias("wsum"),
        )
        .where(F.col("span_us") > 0)
        .withColumn("twa_cents", F.expr("wsum div span_us"))
    )


def sql_time_weighted_avg() -> str:
    """DuckDB twin of :func:`time_weighted_avg` over `events`."""
    return (
        "WITH s AS (SELECT user_id, event_id, epoch_us(ts) AS us, "
        "CAST(round(value * 100) AS BIGINT) AS cents FROM events), "
        "l AS (SELECT user_id, us, cents, "
        "LEAD(us) OVER (PARTITION BY user_id ORDER BY us, event_id) "
        "AS nxt FROM s), "
        "a AS (SELECT user_id, COUNT(*) AS n_events, "
        "MAX(us) - MIN(us) AS span_us, "
        "CAST(SUM(CASE WHEN nxt IS NOT NULL "
        "THEN cents * (nxt - us) ELSE 0 END) AS BIGINT) AS wsum "
        "FROM l GROUP BY user_id) "
        "SELECT user_id, n_events, span_us, wsum, "
        "wsum // span_us AS twa_cents FROM a WHERE span_us > 0"
    )
