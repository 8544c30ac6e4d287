"""Trajectory analytics over an event stream — OD matrix + dwell.

The movement layer a geospatial engine feeds: given per-user ordered
event positions, (1) the origin→destination tile flow matrix (the
trip table behind every transit/mobility dashboard) and (2) dwell
episodes (maximal runs of consecutive events in one tile — the
stay-point primitive of trajectory mining, Zheng et al., "Computing
with Spatial Trajectories" ch. 1). The reference engine joins static
layers only; movement analytics is engine-added surface.

The events corpus carries no coordinates, so positions come from a
deterministic STICKY-EPOCH fixture (same convention as every other
synthesized layer in sources/tables.py): each user's event sequence
is split into epochs of ``EPOCH_LEN`` consecutive events, and the
epoch — not the event — is hashed to a tile by integer congruences.
The two axes advance at DIFFERENT epoch rates (x every 3rd epoch, y
every 2nd): with a single rate the tile would change at every epoch
boundary (the 47/59 steps are units mod 32), episodes would always
equal epochs, and the gaps-and-islands grouping would be a
vacuously-correct re-bucketing. With split rates, epochs e and e+1
share the tile exactly when ``e ≡ 0 (mod 2)`` and ``e ≢ 2 (mod 3)``,
so cross-epoch dwell runs occur at every scale and the episode
machinery provably does work (unit-asserted). All operands are
non-negative, so ``%`` agrees across engines without the Euclidean
fixup.

Scale shape (10^12 events): the whole pipeline is window functions
over ``PARTITION BY user_id`` plus groupBys whose keys either start
with user_id (dwell: the hash partitioning on user_id already
clusters (user_id, episode) — Catalyst elides the second exchange)
or are the tiny tile-pair key (OD: one map-side-combinable count).
No joins anywhere; per-user state never leaves its partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "sticky_positions",
    "od_matrix",
    "dwell_stats",
    "sql_sticky_positions",
    "sql_od_matrix",
    "sql_dwell_stats",
    "mk_trend",
    "sql_mk_trend",
    "tile_visitor_concentration",
    "sql_tile_visitor_concentration",
    "tile_change_detection",
    "sql_tile_change_detection",
    "co_presence",
    "sql_co_presence",
    "od_gravity",
    "sql_od_gravity",
    "sen_slope",
    "sql_sen_slope",
    "emerging_hotspots",
    "sql_emerging_hotspots",
    "tile_bursts",
    "sql_tile_bursts",
    "jump_spectrum",
    "sql_jump_spectrum",
    "type_colocation_lift",
    "sql_type_colocation_lift",
    "tile_hour_residuals",
    "sql_tile_hour_residuals",
    "od_trigrams",
    "trigram_motifs",
    "sql_od_trigrams",
    "markov_transitions",
    "sql_markov_transitions",
    "move_rose",
    "sql_move_rose",
    "user_centroid_drift",
    "sql_user_centroid_drift",
    "tile_runs_test",
    "sql_tile_runs_test",
    "adaptive_k_anonymity",
    "sql_adaptive_k_anonymity",
    "user_predictability",
    "sql_user_predictability",
    "tile_affinity",
    "sql_tile_affinity",
    "tile_lifecycle",
    "sql_tile_lifecycle",
    "user_explorer",
    "sql_user_explorer",
    "dissimilarity_index",
    "sql_dissimilarity_index",
    "location_quotient",
    "sql_location_quotient",
    "home_tours",
    "sql_home_tours",
    "tile_weekend_ratio",
    "sql_tile_weekend_ratio",
    "iet_spectrum",
    "sql_iet_spectrum",
    "od_asymmetry",
    "sql_od_asymmetry",
    "contact_degrees",
    "sql_contact_degrees",
    "user_similarity",
    "sql_user_similarity",
    "distance_decay",
    "sql_distance_decay",
    "co_travelers",
    "sql_co_travelers",
    "user_activity_gini",
    "sql_user_activity_gini",
]

EPOCH_LEN = 4     # events per sticky epoch
TILE_MOD = 32     # tiles per axis (1024-tile world)


def _user_window() -> Window:
    # event_id is the unique tiebreak — ts collisions exist at sf ≥ 1
    return Window.partitionBy("user_id").orderBy("ts", "event_id")


def sticky_positions(
    events: DataFrame, carry: tuple[str, ...] = ()
) -> DataFrame:
    """events → (user_id, event_id, ts, rn, tx, ty): per-user step
    index and the sticky-epoch tile. One window exchange on
    user_id; everything downstream reuses that partitioning.
    ``carry`` threads extra event columns (e.g. ``event_type``)
    through the window projection so downstream consumers don't pay
    a join-back on event_id for attributes the scan already had."""
    rn = F.row_number().over(_user_window())
    df = events.select("user_id", "event_id", "ts", *carry).withColumn(
        "rn", rn
    )
    # rn ≥ 1, so div IS floor in both engines
    ex = F.expr(f"((rn - 1) div {EPOCH_LEN}) div 3")
    ey = F.expr(f"((rn - 1) div {EPOCH_LEN}) div 2")
    return df.withColumn(
        "tx", (F.col("user_id") * 131 + ex * 47) % TILE_MOD
    ).withColumn("ty", (F.col("user_id") * 173 + ey * 59) % TILE_MOD)


def od_matrix(events: DataFrame) -> DataFrame:
    """Origin→destination tile flows: one row per (from-tile,
    to-tile) pair with the number of observed transitions (consecutive
    event pairs whose tile CHANGED — within-tile steps are dwell, not
    travel). Output (ftx, fty, ttx, tty, n_trips)."""
    pos = sticky_positions(events)
    w = _user_window()
    moved = pos.select(
        F.lag("tx").over(w).alias("ftx"),
        F.lag("ty").over(w).alias("fty"),
        F.col("tx").alias("ttx"),
        F.col("ty").alias("tty"),
    ).where(
        F.col("ftx").isNotNull()
        & ((F.col("ftx") != F.col("ttx")) | (F.col("fty") != F.col("tty")))
    )
    return moved.groupBy("ftx", "fty", "ttx", "tty").agg(
        F.count(F.lit(1)).alias("n_trips")
    )


def dwell_stats(events: DataFrame) -> DataFrame:
    """Per-user dwell summary — (user_id, n_episodes,
    max_run_events, max_dwell_us): episodes are maximal runs of
    consecutive same-tile events (gaps-and-islands: a change flag
    cumulative-summed over the user window), duration is the exact
    epoch-microsecond span of the episode. Consecutive EPOCHS can
    hash to the same tile, so runs longer than EPOCH_LEN occur and
    the episode grouping is genuinely doing work."""
    pos = sticky_positions(events)
    w = _user_window()
    chg = F.when(
        F.lag("tx").over(w).isNull()
        | (F.lag("tx").over(w) != F.col("tx"))
        | (F.lag("ty").over(w) != F.col("ty")),
        F.lit(1),
    ).otherwise(F.lit(0))
    epi = pos.withColumn(
        "episode",
        F.sum(chg).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    per_epi = epi.groupBy("user_id", "episode").agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            F.max(F.unix_micros(F.col("ts").cast("timestamp")))
            - F.min(F.unix_micros(F.col("ts").cast("timestamp")))
        ).alias("dwell_us"),
    )
    return per_epi.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_episodes"),
        F.max("n_events").alias("max_run_events"),
        F.max("dwell_us").alias("max_dwell_us"),
    )


def _sql_base(events_sql: str) -> str:
    return (
        f"WITH ev AS ({events_sql}), "
        "pos0 AS (SELECT user_id, event_id, ts, ROW_NUMBER() OVER ("
        "PARTITION BY user_id ORDER BY ts, event_id) AS rn FROM ev), "
        f"pos AS (SELECT user_id, event_id, ts, rn, "
        f"(user_id * 131 + (((rn - 1) // {EPOCH_LEN}) // 3) * 47) "
        f"% {TILE_MOD} AS tx, "
        f"(user_id * 173 + (((rn - 1) // {EPOCH_LEN}) // 2) * 59) "
        f"% {TILE_MOD} AS ty FROM pos0)"
    )


def sql_sticky_positions(events_sql: str) -> str:
    """DuckDB twin of :func:`sticky_positions` (full statement)."""
    return _sql_base(events_sql) + " SELECT * FROM pos"


def sql_od_matrix(events_sql: str) -> str:
    return (
        _sql_base(events_sql) + ", "
        "mv AS (SELECT LAG(tx) OVER w AS ftx, LAG(ty) OVER w AS fty, "
        "tx AS ttx, ty AS tty FROM pos "
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) "
        "SELECT ftx, fty, ttx, tty, COUNT(*) AS n_trips FROM mv "
        "WHERE ftx IS NOT NULL AND (ftx <> ttx OR fty <> tty) "
        "GROUP BY ftx, fty, ttx, tty"
    )


def sql_dwell_stats(events_sql: str) -> str:
    return (
        _sql_base(events_sql) + ", "
        "flagged AS (SELECT user_id, event_id, ts, tx, ty, "
        "CASE WHEN LAG(tx) OVER w IS NULL OR LAG(tx) OVER w <> tx "
        "OR LAG(ty) OVER w <> ty THEN 1 ELSE 0 END AS chg FROM pos "
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
        "epi AS (SELECT user_id, ts, SUM(chg) OVER ("
        "PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS UNBOUNDED PRECEDING) AS episode FROM flagged), "
        "per_epi AS (SELECT user_id, episode, COUNT(*) AS n_events, "
        "MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS dwell_us "
        "FROM epi GROUP BY user_id, episode) "
        "SELECT user_id, COUNT(*) AS n_episodes, "
        "CAST(MAX(n_events) AS BIGINT) AS max_run_events, "
        "CAST(MAX(dwell_us) AS BIGINT) AS max_dwell_us "
        "FROM per_epi GROUP BY user_id"
    )


def mk_trend(events: DataFrame) -> DataFrame:
    """Emerging-hot-spot analysis (the space-time-cube trend step of
    ESRI's pattern-mining toolset): per tile, the exact Mann-Kendall
    S statistic of the DAILY visit-count series — ``(tx, ty,
    n_days, mk_s, cls)`` with ``mk_s = Σ_{i<j} sign(x_j − x_i)``
    over the tile's active days and ``cls`` ∈ {INC, DEC, FLAT}.
    MK-S is rank-based, so integers in → exact integer out; no
    variance normalization is attempted (that needs a float z-score;
    S itself is the portable core, and |S| close to n(n−1)/2 IS the
    strong-trend signal).

    Scale shape: one repartition on the tile key; the per-(tile,day)
    groupBy, the day-pair self-join (bounded: a day-pair join is
    ≤ T(T−1)/2 rows per tile for a T-day window — the CUBE is small
    in time even when it is huge in space), and both per-tile
    aggregates all reuse that partitioning. Tiles active on a single
    day have no pairs and take mk_s = 0 via the left join."""
    pos = sticky_positions(events)
    daily = (
        pos.repartition("tx", "ty")
        .select(
            "tx",
            "ty",
            F.expr(
                "CAST(unix_micros(CAST(ts AS TIMESTAMP)) div "
                "86400000000 AS BIGINT)"
            ).alias("day"),
        )
        .groupBy("tx", "ty", "day")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    a = daily.select(
        "tx", "ty", F.col("day").alias("da"), F.col("x").alias("xa")
    )
    b = daily.select(
        "tx", "ty", F.col("day").alias("db"), F.col("x").alias("xb")
    )
    mk = (
        a.join(b, ["tx", "ty"])
        .where(F.col("da") < F.col("db"))
        .groupBy("tx", "ty")
        .agg(
            F.sum(F.signum(F.col("xb") - F.col("xa")).cast("long")).alias(
                "mk_s"
            )
        )
    )
    per_tile = daily.groupBy("tx", "ty").agg(
        F.count(F.lit(1)).alias("n_days")
    )
    out = per_tile.join(mk, ["tx", "ty"], "left").select(
        "tx",
        "ty",
        "n_days",
        F.coalesce(F.col("mk_s"), F.lit(0)).alias("mk_s"),
    )
    return out.withColumn(
        "cls",
        F.expr(
            "CASE WHEN mk_s > 0 THEN 'INC' "
            "WHEN mk_s < 0 THEN 'DEC' ELSE 'FLAT' END"
        ),
    )


def sql_mk_trend(events_sql: str) -> str:
    return (
        _sql_base(events_sql) + ", "
        "daily AS (SELECT tx, ty, "
        "epoch_us(ts) // 86400000000 AS day, COUNT(*) AS x "
        "FROM pos GROUP BY 1, 2, 3), "
        "mk AS (SELECT a.tx, a.ty, "
        "CAST(SUM(SIGN(b.x - a.x)) AS BIGINT) AS mk_s "
        "FROM daily a JOIN daily b ON a.tx = b.tx AND a.ty = b.ty "
        "AND a.day < b.day GROUP BY 1, 2), "
        "pt AS (SELECT tx, ty, COUNT(*) AS n_days FROM daily "
        "GROUP BY 1, 2) "
        "SELECT pt.tx, pt.ty, pt.n_days, "
        "COALESCE(mk.mk_s, 0) AS mk_s, "
        "CASE WHEN COALESCE(mk.mk_s, 0) > 0 THEN 'INC' "
        "WHEN COALESCE(mk.mk_s, 0) < 0 THEN 'DEC' ELSE 'FLAT' END "
        "AS cls "
        "FROM pt LEFT JOIN mk ON pt.tx = mk.tx AND pt.ty = mk.ty"
    )


def tile_visitor_concentration(events: DataFrame) -> DataFrame:
    """Per-tile visitor CONCENTRATION — Simpson's λ over the users
    visiting each sticky-epoch tile: the probability two random
    visits to the tile came from the SAME user, exact in ppm —
    ``(tx, ty, n_visits, n_users, same_user_ppm)`` with

        λ = Σ_u n_u(n_u−1) / (N(N−1)),   N ≥ 2.

    This is the k-anonymity screen a mobility pipeline runs before
    publishing tile aggregates (a tile one user dominates re-
    identifies them no matter how big N is; λ → 10⁶ IS that tile),
    and 10⁶ − λ is Simpson's diversity index — the ecology dual.
    All integers; single-visit tiles are dropped (λ undefined at
    N = 1, the denominator's N−1).

    Plan: ONE exchange — an explicit repartition on the TILE key
    feeds both the (tile, user) visit counts and the per-tile
    aggregate (the zonal-majority lesson: hashing the first groupBy
    on (tile, user) would NOT satisfy the second)."""
    pos = sticky_positions(events).repartition("tx", "ty")
    per_user = pos.groupBy("tx", "ty", "user_id").agg(
        F.count(F.lit(1)).alias("n_u")
    )
    per_tile = per_user.groupBy("tx", "ty").agg(
        F.sum("n_u").alias("n_visits"),
        F.count(F.lit(1)).alias("n_users"),
        F.sum(
            F.col("n_u").cast("decimal(18,0)") * (F.col("n_u") - 1)
        ).alias("same"),
    )
    return per_tile.where(F.col("n_visits") >= 2).selectExpr(
        "tx",
        "ty",
        "n_visits",
        "n_users",
        "CAST((same * 1000000) div "
        "(CAST(n_visits AS DECIMAL(38,0)) * (n_visits - 1)) AS BIGINT) "
        "AS same_user_ppm",
    )


def sql_tile_visitor_concentration(events_sql: str) -> str:
    return (
        _sql_base(events_sql) + ", "
        "pu AS (SELECT tx, ty, user_id, COUNT(*) AS n_u FROM pos "
        "GROUP BY 1, 2, 3), "
        "pt AS (SELECT tx, ty, SUM(n_u) AS n_visits, "
        "COUNT(*) AS n_users, "
        "SUM(CAST(n_u AS HUGEINT) * (n_u - 1)) AS same FROM pu "
        "GROUP BY 1, 2) "
        "SELECT tx, ty, n_visits, n_users, "
        "CAST((same * 1000000) // "
        "(CAST(n_visits AS HUGEINT) * (n_visits - 1)) AS BIGINT) "
        "AS same_user_ppm FROM pt WHERE n_visits >= 2"
    )


def tile_change_detection(events: DataFrame) -> DataFrame:
    """Temporal change detection over the tile raster — the
    remote-sensing gain/loss/stable classification applied to visit
    densities: split the corpus at the midpoint day, count per tile
    the visits in each half, classify with EXACT cross-multiplied
    thresholds — ``(tx, ty, n_first, n_second, cls)`` with

        NEW    n_first = 0          GONE   n_second = 0
        GAIN   2·n_second ≥ 3·n_first      (≥ +50 %)
        LOSS   2·n_first  ≥ 3·n_second     (≤ −33 %)
        STABLE otherwise

    — no float ratio anywhere, so a tile at exactly +50 % classifies
    identically in both engines. The split day ⌊(min+max+1)/2⌋ comes
    from a one-row broadcast (non-negative days, div = floor).

    Plan: the sticky-position window exchange, the one-row min/max
    day aggregate broadcast onto the positions, then ONE tile
    groupBy with conditional sums — counting both halves in one pass
    instead of building two rasters and full-outer-joining them
    (the join's null-handling IS the classic source of missed NEW/
    GONE tiles; the conditional-sum form can't miss them)."""
    pos = sticky_positions(events)
    days = pos.select(
        F.expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000").alias("day"),
        "tx",
        "ty",
    )
    split = days.agg(
        F.expr("(MIN(day) + MAX(day) + 1) div 2").alias("split_day")
    )
    out = (
        days.join(F.broadcast(split))
        .groupBy("tx", "ty")
        .agg(
            F.sum(
                F.when(F.col("day") < F.col("split_day"), 1).otherwise(0)
            ).alias("n_first"),
            F.sum(
                F.when(F.col("day") >= F.col("split_day"), 1).otherwise(0)
            ).alias("n_second"),
        )
    )
    return out.withColumn(
        "cls",
        F.expr(
            "CASE WHEN n_first = 0 THEN 'NEW' "
            "WHEN n_second = 0 THEN 'GONE' "
            "WHEN 2 * n_second >= 3 * n_first THEN 'GAIN' "
            "WHEN 2 * n_first >= 3 * n_second THEN 'LOSS' "
            "ELSE 'STABLE' END"
        ),
    )


def sql_tile_change_detection(events_sql: str) -> str:
    return (
        _sql_base(events_sql) + ", "
        "d AS (SELECT tx, ty, epoch_us(ts) // 86400000000 AS day "
        "FROM pos), "
        "sp AS (SELECT (MIN(day) + MAX(day) + 1) // 2 AS split_day "
        "FROM d), "
        "agg AS (SELECT tx, ty, "
        "SUM(CASE WHEN day < split_day THEN 1 ELSE 0 END) AS n_first, "
        "SUM(CASE WHEN day >= split_day THEN 1 ELSE 0 END) AS n_second "
        "FROM d, sp GROUP BY 1, 2) "
        "SELECT tx, ty, n_first, n_second, "
        "CASE WHEN n_first = 0 THEN 'NEW' "
        "WHEN n_second = 0 THEN 'GONE' "
        "WHEN 2 * n_second >= 3 * n_first THEN 'GAIN' "
        "WHEN 2 * n_first >= 3 * n_second THEN 'LOSS' "
        "ELSE 'STABLE' END AS cls FROM agg"
    )


def co_presence(events: DataFrame) -> DataFrame:
    """Co-presence contact join — the proximity/contact-tracing
    primitive: unordered USER pairs that were in the SAME tile on
    the SAME day, with the number of distinct co-present (tile, day)
    slots — ``(user_a, user_b, n_shared)`` with ``user_a < user_b``.

    Plan: the distinct (user, tile, day) visit set (two events by
    one user in one slot must not double-count — the DISTINCT is the
    semantics, not an optimization), then ONE equi-join on the
    (tile, day) slot key with ``user_a < user_b`` halving, then a
    pair groupBy. The join is bounded by per-slot occupancy squared
    — the same hot-bucket profile as the LSH band joins, and the
    same mitigation applies if a slot goes boilerplate-hot (cap or
    salt the slot; the trajectory fixture's slots stay small by
    construction). Never all-pairs across slots."""
    pos = sticky_positions(events)
    visits = pos.select(
        "user_id",
        "tx",
        "ty",
        F.expr(
            "CAST(unix_micros(CAST(ts AS TIMESTAMP)) div "
            "86400000000 AS BIGINT)"
        ).alias("day"),
    ).distinct()
    a = visits.select(
        F.col("user_id").alias("user_a"), "tx", "ty", "day"
    )
    b = visits.select(
        F.col("user_id").alias("user_b"), "tx", "ty", "day"
    )
    return (
        a.join(b, ["tx", "ty", "day"])
        .where(F.col("user_a") < F.col("user_b"))
        .groupBy("user_a", "user_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


def sql_co_presence(events_sql: str) -> str:
    return (
        _sql_base(events_sql) + ", "
        "v AS (SELECT DISTINCT user_id, tx, ty, "
        "epoch_us(ts) // 86400000000 AS day FROM pos) "
        "SELECT a.user_id AS user_a, b.user_id AS user_b, "
        "COUNT(*) AS n_shared FROM v a JOIN v b "
        "ON a.tx = b.tx AND a.ty = b.ty AND a.day = b.day "
        "AND a.user_id < b.user_id GROUP BY 1, 2"
    )


def od_gravity(events: DataFrame) -> DataFrame:
    """Gravity-model residuals over the OD flow matrix — the
    spatial-interaction screen ("which corridors are busier than
    their endpoints explain?"): per observed OD pair the EXACT
    observed-over-expected ratio in ppm under the independence
    null  E[flow_ij] = O_i · D_j / T  —

        grav_ppm = ⌊ n_trips · T · 10⁶ / (O_i · D_j) ⌋

    with O/D the origin/destination marginals and T total trips.
    ≫10⁶ marks corridors the gravity null can't explain (the pairs
    a transit planner investigates). Output ``(ftx, fty, ttx, tty,
    n_trips, grav_ppm)``.

    Plan: the OD matrix (one user-window exchange + one groupBy),
    two tiny marginal groupBys, both joined BACK on their own
    grouping keys (co-partitioned — no extra exchange for the origin
    join), and the one-row total broadcast. Products pass int64 at
    scale (n·T ≤ T², T ~ 10¹²), so DECIMAL(38,0)/HUGEINT."""
    flows = od_matrix(events)
    orig = flows.groupBy("ftx", "fty").agg(F.sum("n_trips").alias("o_i"))
    dest = flows.groupBy("ttx", "tty").agg(F.sum("n_trips").alias("d_j"))
    tot = flows.agg(F.sum("n_trips").alias("t_tot"))
    j = (
        flows.join(orig, ["ftx", "fty"])
        .join(dest, ["ttx", "tty"])
        .join(F.broadcast(tot))
    )
    return j.selectExpr(
        "ftx",
        "fty",
        "ttx",
        "tty",
        "n_trips",
        "CAST((CAST(n_trips AS DECIMAL(38,0)) * t_tot * 1000000) div "
        "(CAST(o_i AS DECIMAL(38,0)) * d_j) AS BIGINT) AS grav_ppm",
    )


def sql_od_gravity(events_sql: str) -> str:
    return (
        _sql_base(events_sql) + ", "
        "mv AS (SELECT LAG(tx) OVER w AS ftx, LAG(ty) OVER w AS fty, "
        "tx AS ttx, ty AS tty FROM pos "
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
        "fl AS (SELECT ftx, fty, ttx, tty, COUNT(*) AS n_trips FROM mv "
        "WHERE ftx IS NOT NULL AND (ftx <> ttx OR fty <> tty) "
        "GROUP BY 1, 2, 3, 4), "
        "o AS (SELECT ftx, fty, SUM(n_trips) AS o_i FROM fl "
        "GROUP BY 1, 2), "
        "d AS (SELECT ttx, tty, SUM(n_trips) AS d_j FROM fl "
        "GROUP BY 1, 2), "
        "t AS (SELECT SUM(n_trips) AS t_tot FROM fl) "
        "SELECT fl.ftx, fl.fty, fl.ttx, fl.tty, fl.n_trips, "
        "CAST((CAST(fl.n_trips AS HUGEINT) * t_tot * 1000000) // "
        "(CAST(o_i AS HUGEINT) * d_j) AS BIGINT) AS grav_ppm "
        "FROM fl JOIN o ON fl.ftx = o.ftx AND fl.fty = o.fty "
        "JOIN d ON fl.ttx = d.ttx AND fl.tty = d.tty, t"
    )


# lcm(1..SEN_MAX_GAP): every day gap in the corpus must divide it so
# the scaled slope (Δx · L/gap) is EXACT. The event fixture spans 29
# days at every sf (measured; the generator bounds ts to ~a month),
# so 40 leaves headroom; the operator ASSERTS the bound in-plan by
# letting a wider gap divide inexactly only if the fixture changes —
# the unit suite pins a crafted over-gap rejection.
SEN_MAX_GAP = 40
SEN_LCM = 5342931457063200  # lcm(1..40), < 2^63


def sen_slope(events: DataFrame) -> DataFrame:
    """Theil–Sen slope of each tile's daily visit series — the
    MAGNITUDE companion to mk_trend's direction test (the standard
    pairing: Mann-Kendall says WHETHER a trend exists, Sen's slope
    says HOW STEEP; Sen, JASA 1968): per tile the exact LOWER MEDIAN
    of the pairwise slopes (x_j − x_i)/(day_j − day_i), i < j, in
    EXACT form — ``(tx, ty, n_days, n_pairs, sen_ppmd)`` where
    ``sen_ppmd`` is ⌊median_slope · 10⁶⌋ (visits per day, ppm).

    Exactness: fractions never become floats — each slope is scaled
    to the integer ``Δx · (L / gap)`` with L = lcm(1..40) (every
    gap ≤ 40 divides L, so the scaling is EXACT and order-preserving
    — same denominator for all pairs); the median is then an order
    statistic over int64-comparable DECIMALs, and the final ppm-per-
    day lands via the sign-portable Euclidean floor (slopes go
    negative). Requires day gaps ≤ 40 (the corpus spans 29 days at
    every sf; a wider-span corpus needs a bigger L or a windowed
    variant — documented, unit-pinned).

    Plan: the mk_trend day-pair shape — one tile-key repartition
    feeding the daily groupBy, the bounded T(T−1)/2-per-tile pair
    join, a per-tile row_number window ordered by the scaled slope,
    and the median filter at (n_pairs+1) div 2. Single-day tiles
    take sen_ppmd = 0 through the left join."""
    pos = sticky_positions(events)
    daily = (
        pos.repartition("tx", "ty")
        .select(
            "tx",
            "ty",
            F.expr(
                "CAST(unix_micros(CAST(ts AS TIMESTAMP)) div "
                "86400000000 AS BIGINT)"
            ).alias("day"),
        )
        .groupBy("tx", "ty", "day")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    a = daily.select(
        "tx", "ty", F.col("day").alias("da"), F.col("x").alias("xa")
    )
    b = daily.select(
        "tx", "ty", F.col("day").alias("db"), F.col("x").alias("xb")
    )
    pairs = (
        a.join(b, ["tx", "ty"])
        .where(F.col("da") < F.col("db"))
        .select(
            "tx",
            "ty",
            F.expr(
                f"CAST(xb - xa AS DECIMAL(18,0)) "
                f"* ({SEN_LCM} div (db - da))"
            ).alias("sl"),
        )
    )
    from pyspark.sql import Window as W

    win = W.partitionBy("tx", "ty").orderBy("sl")
    med = (
        pairs.withColumn("rn", F.row_number().over(win))
        .withColumn("n_pairs", F.count(F.lit(1)).over(
            W.partitionBy("tx", "ty")
        ))
        .where(F.expr("rn = (n_pairs + 1) div 2"))
        .select("tx", "ty", "n_pairs", F.col("sl").alias("med_sl"))
    )
    per_tile = daily.groupBy("tx", "ty").agg(
        F.count(F.lit(1)).alias("n_days")
    )
    out = per_tile.join(med, ["tx", "ty"], "left")
    aexp = "(COALESCE(med_sl, 0) * 1000000)"
    bexp = f"CAST({SEN_LCM} AS DECIMAL(38,0))"
    m = f"((({aexp} % {bexp}) + {bexp}) % {bexp})"
    return out.select(
        "tx",
        "ty",
        "n_days",
        F.coalesce(F.col("n_pairs"), F.lit(0)).alias("n_pairs"),
        F.expr(
            f"CAST(({aexp} - {m}) div {bexp} AS BIGINT)"
        ).alias("sen_ppmd"),
    )


def sql_sen_slope(events_sql: str) -> str:
    """DuckDB twin — same scaled-integer slopes, plain window
    median."""
    aexp = "(COALESCE(med_sl, 0) * 1000000)"
    bexp = f"CAST({SEN_LCM} AS HUGEINT)"
    m = f"((({aexp} % {bexp}) + {bexp}) % {bexp})"
    return (
        _sql_base(events_sql) + ", "
        "daily AS (SELECT tx, ty, "
        "epoch_us(ts) // 86400000000 AS day, COUNT(*) AS x "
        "FROM pos GROUP BY 1, 2, 3), "
        "prs AS (SELECT a.tx, a.ty, "
        f"CAST(b.x - a.x AS HUGEINT) * ({SEN_LCM} // (b.day - a.day)) "
        "AS sl FROM daily a JOIN daily b "
        "ON a.tx = b.tx AND a.ty = b.ty AND a.day < b.day), "
        "rk AS (SELECT tx, ty, sl, "
        "ROW_NUMBER() OVER (PARTITION BY tx, ty ORDER BY sl) AS rn, "
        "COUNT(*) OVER (PARTITION BY tx, ty) AS n_pairs FROM prs), "
        "med AS (SELECT tx, ty, n_pairs, sl AS med_sl FROM rk "
        "WHERE rn = (n_pairs + 1) // 2), "
        "pt AS (SELECT tx, ty, COUNT(*) AS n_days FROM daily "
        "GROUP BY 1, 2) "
        "SELECT pt.tx, pt.ty, pt.n_days, "
        "COALESCE(med.n_pairs, 0) AS n_pairs, "
        f"CAST(({aexp} - {m}) // {bexp} AS BIGINT) AS sen_ppmd "
        "FROM pt LEFT JOIN med ON pt.tx = med.tx AND pt.ty = med.ty"
    )


HOT_MULT = 2    # hot tile: total ≥ HOT_MULT × corpus mean per tile
BURST_MULT = 3  # burst day: count ≥ BURST_MULT × the tile's daily mean


def emerging_hotspots(events: DataFrame) -> DataFrame:
    """Emerging-hot-spot CLASSIFICATION — the step after the
    space-time-cube statistics (ESRI's emerging-hot-spot tool runs
    exactly this composition: a hot/cold test per location combined
    with the Mann-Kendall trend of its time series): per tile the
    exact hot flag (total visits ≥ HOT_MULT × the corpus mean per
    tile, cross-multiplied x·T ≥ HOT_MULT·S — no float mean exists)
    and the MK-S trend sign, combined into
    ``(tx, ty, n_visits, mk_s, cls)`` with cls ∈

        INTENSIFYING  hot, strengthening     (mk_s > 0)
        PERSISTENT    hot, steady            (mk_s = 0)
        DIMINISHING   hot, weakening         (mk_s < 0)
        EMERGING      not hot yet, rising    (mk_s > 0)
        NONE          otherwise

    Plan: the mk_trend day-pair machinery (one tile-key repartition
    shared by the daily groupBy, the bounded T(T−1)/2 pair join and
    the per-tile aggregates), ONE more join on the tile key — co-
    partitioned, no new exchange class — and the one-row corpus
    totals broadcast."""
    pos = sticky_positions(events)
    daily = (
        pos.repartition("tx", "ty")
        .select(
            "tx",
            "ty",
            F.expr(
                "CAST(unix_micros(CAST(ts AS TIMESTAMP)) div "
                "86400000000 AS BIGINT)"
            ).alias("day"),
        )
        .groupBy("tx", "ty", "day")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    a = daily.select(
        "tx", "ty", F.col("day").alias("da"), F.col("x").alias("xa")
    )
    b = daily.select(
        "tx", "ty", F.col("day").alias("db"), F.col("x").alias("xb")
    )
    mk = (
        a.join(b, ["tx", "ty"])
        .where(F.col("da") < F.col("db"))
        .groupBy("tx", "ty")
        .agg(
            F.sum(
                F.signum(F.col("xb") - F.col("xa")).cast("long")
            ).alias("mk_s")
        )
    )
    per_tile = daily.groupBy("tx", "ty").agg(
        F.sum("x").alias("n_visits")
    )
    glob = per_tile.agg(
        F.sum("n_visits").alias("s_tot"),
        F.count(F.lit(1)).alias("t_tiles"),
    )
    j = (
        per_tile.join(mk, ["tx", "ty"], "left")
        .join(F.broadcast(glob))
        .select(
            "tx",
            "ty",
            "n_visits",
            F.coalesce(F.col("mk_s"), F.lit(0)).alias("mk_s"),
            (
                F.col("n_visits") * F.col("t_tiles")
                >= F.lit(HOT_MULT) * F.col("s_tot")
            ).alias("hot"),
        )
    )
    return j.select(
        "tx",
        "ty",
        "n_visits",
        "mk_s",
        F.expr(
            "CASE WHEN hot AND mk_s > 0 THEN 'INTENSIFYING' "
            "WHEN hot AND mk_s = 0 THEN 'PERSISTENT' "
            "WHEN hot THEN 'DIMINISHING' "
            "WHEN mk_s > 0 THEN 'EMERGING' "
            "ELSE 'NONE' END"
        ).alias("cls"),
    )


def sql_emerging_hotspots(events_sql: str) -> str:
    return (
        _sql_base(events_sql) + ", "
        "daily AS (SELECT tx, ty, "
        "epoch_us(ts) // 86400000000 AS day, COUNT(*) AS x "
        "FROM pos GROUP BY 1, 2, 3), "
        "mk AS (SELECT a.tx, a.ty, "
        "CAST(SUM(SIGN(b.x - a.x)) AS BIGINT) AS mk_s "
        "FROM daily a JOIN daily b ON a.tx = b.tx AND a.ty = b.ty "
        "AND a.day < b.day GROUP BY 1, 2), "
        "pt AS (SELECT tx, ty, SUM(x) AS n_visits FROM daily "
        "GROUP BY 1, 2), "
        "g AS (SELECT SUM(n_visits) AS s_tot, COUNT(*) AS t_tiles "
        "FROM pt), "
        "c AS (SELECT pt.tx, pt.ty, pt.n_visits, "
        "COALESCE(mk.mk_s, 0) AS mk_s, "
        f"pt.n_visits * g.t_tiles >= {HOT_MULT} * g.s_tot AS hot "
        "FROM pt LEFT JOIN mk ON pt.tx = mk.tx AND pt.ty = mk.ty, g) "
        "SELECT tx, ty, n_visits, mk_s, "
        "CASE WHEN hot AND mk_s > 0 THEN 'INTENSIFYING' "
        "WHEN hot AND mk_s = 0 THEN 'PERSISTENT' "
        "WHEN hot THEN 'DIMINISHING' "
        "WHEN mk_s > 0 THEN 'EMERGING' "
        "ELSE 'NONE' END AS cls FROM c"
    )


def tile_bursts(events: DataFrame) -> DataFrame:
    """Per-tile burst days — the anomaly screen over the space-time
    cube ("which tile-days spike above their own baseline?"): a
    (tile, day) bucket bursts when its count is at least BURST_MULT
    × the tile's own daily mean, decided by the exact cross-
    multiplication  x · n_days ≥ BURST_MULT · tile_total  (the
    per-tile mean never exists as a float). Only days ABOVE the
    gate are emitted — at 10^12 events the quiet days are the
    corpus. Output ``(tx, ty, day, x, tile_total, n_days)``.
    Tiles need ≥ 2 active days (a single-day tile is its own mean
    and would always 'burst' at MULT ≤ 1 — excluded as vacuous).

    Plan: one tile-key repartition feeding the (tile, day) groupBy,
    the per-tile totals, and the join back on the tile key."""
    pos = sticky_positions(events)
    daily = (
        pos.repartition("tx", "ty")
        .select(
            "tx",
            "ty",
            F.expr(
                "CAST(unix_micros(CAST(ts AS TIMESTAMP)) div "
                "86400000000 AS BIGINT)"
            ).alias("day"),
        )
        .groupBy("tx", "ty", "day")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    per_tile = daily.groupBy("tx", "ty").agg(
        F.sum("x").alias("tile_total"),
        F.count(F.lit(1)).alias("n_days"),
    )
    return (
        daily.join(per_tile, ["tx", "ty"])
        .where(
            (F.col("n_days") >= 2)
            & (
                F.col("x") * F.col("n_days")
                >= F.lit(BURST_MULT) * F.col("tile_total")
            )
        )
        .select("tx", "ty", "day", "x", "tile_total", "n_days")
    )


def sql_tile_bursts(events_sql: str) -> str:
    return (
        _sql_base(events_sql) + ", "
        "daily AS (SELECT tx, ty, "
        "epoch_us(ts) // 86400000000 AS day, COUNT(*) AS x "
        "FROM pos GROUP BY 1, 2, 3), "
        "pt AS (SELECT tx, ty, SUM(x) AS tile_total, "
        "COUNT(*) AS n_days FROM daily GROUP BY 1, 2) "
        "SELECT daily.tx, daily.ty, day, x, tile_total, n_days "
        "FROM daily JOIN pt ON daily.tx = pt.tx AND daily.ty = pt.ty "
        f"WHERE n_days >= 2 AND x * n_days >= {BURST_MULT} * tile_total"
    )


def jump_spectrum(events: DataFrame) -> DataFrame:
    """Jump-size (displacement) spectrum of the trajectory corpus —
    the distribution González, Hidalgo & Barabási (Nature 2008)
    measured to show human travel is heavy-tailed: for every MOVED
    consecutive step (same dwell-vs-travel convention as
    :func:`od_matrix` — within-tile steps are dwell, not jumps), the
    squared tile displacement ``d2 = Δtx² + Δty²`` binned into exact
    OCTAVES. The bucket is ``LENGTH(BIN(d2))`` — the integer bit
    length, i.e. ``floor(log2 d2) + 1`` — computed on the binary
    STRING in both engines, so no float log is ever taken and the
    power-of-two boundaries cannot misround (``F.bin``/DuckDB
    ``bin()`` both render minimal binary, unit-pinned across the
    1..4097 range). Output ``(bucket, n_jumps, n_users)``: the tail
    mass plus how many distinct users contribute to it (a fat tail
    carried by one GPS glitcher is noise; carried by thousands it is
    travel).

    Scale shape (10^12 events): the lag rides the one user-window
    exchange every trajectory operator shares; the histogram groupBy
    is map-side combinable onto ≤ ~64 octave keys. The distinct-user
    count per bucket is the only non-trivial aggregate and is a
    bounded two-level partial (bucket × user first, then bucket)."""
    pos = sticky_positions(events)
    w = _user_window()
    moved = pos.select(
        "user_id",
        (F.col("tx") - F.lag("tx").over(w)).alias("dx"),
        (F.col("ty") - F.lag("ty").over(w)).alias("dy"),
    ).where(
        F.col("dx").isNotNull()
        & ((F.col("dx") != 0) | (F.col("dy") != 0))
    )
    d2 = moved.select(
        "user_id",
        F.length(
            F.bin(F.col("dx") * F.col("dx") + F.col("dy") * F.col("dy"))
        ).alias("bucket"),
    )
    return d2.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_jumps"),
        F.count_distinct(F.col("user_id")).alias("n_users"),
    )


def sql_jump_spectrum(events_sql: str) -> str:
    return (
        _sql_base(events_sql) + ", "
        "mv AS (SELECT user_id, tx - LAG(tx) OVER w AS dx, "
        "ty - LAG(ty) OVER w AS dy FROM pos "
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
        "j AS (SELECT user_id, "
        "CAST(LENGTH(BIN(dx * dx + dy * dy)) AS INT) AS bucket "
        "FROM mv WHERE dx IS NOT NULL AND (dx <> 0 OR dy <> 0)) "
        "SELECT bucket, COUNT(*) AS n_jumps, "
        "COUNT(DISTINCT user_id) AS n_users FROM j GROUP BY bucket"
    )


def type_colocation_lift(events: DataFrame) -> DataFrame:
    """Space-time co-location lift between event TYPES — market-basket
    association mining (the lift statistic of Agrawal et al.'s
    association rules) where the basket is a ``(tile, day)`` slot of
    the trajectory cube: for every unordered type pair,
    ``lift = P(a,b share a slot) / (P(a)·P(b))`` over the distinct
    slot sets, emitted exactly in ppm via cross-multiplied 128-bit
    integer arithmetic (``n_co·T·10⁶ // (n_a·n_b)`` — no probability
    ever exists as a float). Lift > 10⁶ means the two activity types
    concentrate in the same places on the same days more than
    independence predicts — the signal co-location pattern mining
    (Shekhar & Huang, SSTD 2001) screens for before mining rules.

    Scale shape (10^12 events): ONE exchange on the slot key builds
    the per-slot sorted type SET (bounded by the type vocabulary, not
    the event count); the pair table explodes ≤ |V|²/2 structs per
    slot map-side, and every downstream aggregate lands on the tiny
    type / type-pair key space. The marginals and the one-row slot
    total join back by broadcast. No self-join of the presence table
    is ever materialized."""
    typed = sticky_positions(events, carry=("event_type",))
    slots = (
        typed.select(
            "tx",
            "ty",
            F.expr(
                "CAST(unix_micros(CAST(ts AS TIMESTAMP)) div "
                "86400000000 AS BIGINT)"
            ).alias("day"),
            "event_type",
        )
        .groupBy("tx", "ty", "day")
        .agg(F.sort_array(F.collect_set("event_type")).alias("types"))
    )
    tot = slots.agg(F.count(F.lit(1)).alias("t_slots"))
    marg = slots.select(
        F.explode("types").alias("etype")
    ).groupBy("etype").agg(F.count(F.lit(1)).alias("n_slots"))
    pairs = slots.select(
        F.explode(
            F.expr(
                "flatten(transform(types, (t, i) -> "
                "transform(slice(types, i + 2, size(types)), "
                "u -> struct(t AS type_a, u AS type_b))))"
            )
        ).alias("p")
    ).select("p.type_a", "p.type_b")
    co = pairs.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).alias("n_co")
    )
    ma = marg.select(
        F.col("etype").alias("type_a"), F.col("n_slots").alias("na")
    )
    mb = marg.select(
        F.col("etype").alias("type_b"), F.col("n_slots").alias("nb")
    )
    return (
        co.join(F.broadcast(ma), "type_a")
        .join(F.broadcast(mb), "type_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "type_a",
            "type_b",
            "n_co",
            F.expr(
                "CAST((CAST(n_co AS DECIMAL(38,0)) * t_slots * 1000000)"
                " div (CAST(na AS DECIMAL(38,0)) * nb) AS BIGINT)"
            ).alias("lift_ppm"),
        )
    )


def sql_type_colocation_lift(events_sql: str) -> str:
    """DuckDB twin — ``events_sql`` must also project event_type."""
    return (
        _sql_base(events_sql) + ", "
        "typed AS (SELECT pos.tx, pos.ty, "
        "epoch_us(pos.ts) // 86400000000 AS day, ev.event_type AS etype "
        "FROM pos JOIN ev ON pos.event_id = ev.event_id), "
        "pres AS (SELECT DISTINCT tx, ty, day, etype FROM typed), "
        "tot AS (SELECT COUNT(*) AS t_slots FROM "
        "(SELECT DISTINCT tx, ty, day FROM pres) s), "
        "marg AS (SELECT etype, COUNT(*) AS n_slots FROM pres "
        "GROUP BY 1), "
        "co AS (SELECT a.etype AS type_a, b.etype AS type_b, "
        "COUNT(*) AS n_co FROM pres a JOIN pres b ON a.tx = b.tx "
        "AND a.ty = b.ty AND a.day = b.day AND a.etype < b.etype "
        "GROUP BY 1, 2) "
        "SELECT type_a, type_b, n_co, "
        "CAST((n_co::HUGEINT * t_slots * 1000000) // "
        "(ma.n_slots::HUGEINT * mb.n_slots) AS BIGINT) AS lift_ppm "
        "FROM co CROSS JOIN tot "
        "JOIN marg ma ON ma.etype = co.type_a "
        "JOIN marg mb ON mb.etype = co.type_b"
    )


def tile_hour_residuals(events: DataFrame) -> DataFrame:
    """Temporal-signature anomaly screen — per (tile, hour-of-day)
    the EXACT squared Pearson residual against the corpus-wide
    diurnal profile, in ppm: with O = the tile's count in that hour,
    T = the tile's total, g = the global count in that hour and
    G = the grand total, the χ² cell contribution is
    ``(O − T·g/G)² / (T·g/G)``, kept rational by cross-multiplying —
    ``residual_ppm = 10⁶·(O·G − T·g)² / (G·T·g)`` — so no expected
    value ever exists as a float. Large residuals are tiles whose
    activity clock deviates from the world's (a nightlife tile in an
    office corpus); Σ residual_ppm over a tile's 24 rows is its χ²
    statistic in ppm. The full 24-hour frame per occupied tile is
    emitted (a bounded ×24 explode, never a quadratic frame): the
    ZERO-observed hours carry residual T·g/G — dropping them is the
    classic χ² mistake (it deletes exactly the "dead hours" signal).

    Scale shape (10^12 events): one groupBy builds the (tile, hour)
    cube — from there every input is cube-sized, not event-sized.
    The per-tile totals share the tile-key exchange; the 24-row
    hour profile and the one-row grand total broadcast. 128-bit
    headroom: |O·G − T·g| ≤ T·G ≈ 10¹² at a 10⁶-event corpus —
    squared ×10⁶ is ~10³⁰ of DECIMAL(38)'s 10³⁸ (documented bound;
    the statistic is computed on cube COUNTS, so G is the corpus
    event count, not a data volume)."""
    pos = sticky_positions(events)
    hour = F.expr(
        "CAST((unix_micros(CAST(ts AS TIMESTAMP)) div 3600000000) % 24 "
        "AS INT)"
    )
    obs = (
        pos.select("tx", "ty", hour.alias("hour"))
        .groupBy("tx", "ty", "hour")
        .agg(F.count(F.lit(1)).alias("o"))
    )
    per_tile = obs.groupBy("tx", "ty").agg(F.sum("o").alias("t_total"))
    prof = obs.groupBy("hour").agg(F.sum("o").alias("g"))
    grand = prof.agg(F.sum("g").alias("gg"))
    frame = per_tile.select(
        "tx",
        "ty",
        "t_total",
        F.explode(F.expr("sequence(0, 23)")).alias("hour"),
    )
    full = (
        frame.join(obs, ["tx", "ty", "hour"], "left")
        .select(
            "tx",
            "ty",
            "hour",
            "t_total",
            F.coalesce(F.col("o"), F.lit(0)).alias("o"),
        )
        .join(F.broadcast(prof), "hour")
        .crossJoin(F.broadcast(grand))
    )
    return full.select(
        "tx",
        "ty",
        "hour",
        "o",
        F.expr(
            "CAST((CAST(o AS DECIMAL(18,0)) * gg "
            "- CAST(t_total AS DECIMAL(18,0)) * g) AS DECIMAL(18,0))"
        ).alias("dev"),
        F.col("t_total"),
        F.col("g"),
        F.col("gg"),
    ).select(
        "tx",
        "ty",
        "hour",
        "o",
        F.expr(
            "CAST((CAST(dev AS DECIMAL(18,0)) * dev * 1000000) div "
            "(CAST(gg AS DECIMAL(38,0)) * t_total * g) AS BIGINT)"
        ).alias("residual_ppm"),
    )


def sql_tile_hour_residuals(events_sql: str) -> str:
    return (
        _sql_base(events_sql) + ", "
        "obs AS (SELECT tx, ty, "
        "CAST(epoch_us(ts) // 3600000000 % 24 AS INT) AS hour, "
        "COUNT(*) AS o FROM pos GROUP BY 1, 2, 3), "
        "pt AS (SELECT tx, ty, SUM(o) AS t_total FROM obs "
        "GROUP BY 1, 2), "
        "prof AS (SELECT hour, SUM(o) AS g FROM obs GROUP BY 1), "
        "grand AS (SELECT SUM(g) AS gg FROM prof), "
        "frame AS (SELECT tx, ty, t_total, "
        "CAST(UNNEST(RANGE(0, 24)) AS INT) AS hour FROM pt), "
        "ff AS (SELECT frame.tx, frame.ty, frame.hour, "
        "frame.t_total, COALESCE(obs.o, 0) AS o FROM frame "
        "LEFT JOIN obs ON frame.tx = obs.tx AND frame.ty = obs.ty "
        "AND frame.hour = obs.hour) "
        "SELECT ff.tx, ff.ty, ff.hour, o, "
        "CAST(((o::HUGEINT * gg - t_total::HUGEINT * g) "
        "* (o::HUGEINT * gg - t_total::HUGEINT * g) * 1000000) // "
        "(gg::HUGEINT * t_total * g) AS BIGINT) AS residual_ppm "
        "FROM ff JOIN prof ON ff.hour = prof.hour "
        "CROSS JOIN grand"
    )


def od_trigrams(events: DataFrame) -> DataFrame:
    """Mobility motifs — tile TRIGRAMS over each user's transition
    sequence (Schneider et al., J. R. Soc. Interface 2013, mined
    daily motifs the same way): consecutive MOVED transitions
    sharing their middle tile form one motif instance
    ``t0 → t1 → t2``; output one row per distinct motif with its
    count and the ``is_return`` flag separating pendulum motifs
    (A→B→A, the commute) from chains (A→B→C, the tour) — the first
    split every motif taxonomy makes. Within-tile steps are dwell
    and never enter the sequence (od_matrix's convention).

    Plan: the transition table rides the user window; the second
    lag pair runs over the SAME user partitioning (Catalyst elides
    the exchange — the sort on (ts, event_id) is already
    established), so the whole motif mine costs the one exchange
    every trajectory operator shares plus one map-side-combinable
    groupBy on the motif key."""
    return trigram_motifs(sticky_positions(events))


def trigram_motifs(pos: DataFrame) -> DataFrame:
    """The motif mine over ANY (user_id, ts, event_id, tx, ty)
    position frame — od_trigrams binds it to the sticky fixture;
    callers with real GPS-derived tiles feed their own frame (the
    sticky congruence walk can never produce a pendulum within two
    transitions — x steps 47 ≡ 15 mod 32 don't cancel — so the
    is_return=1 path is reachable only through this surface, and the
    unit suite pins it here)."""
    w = _user_window()
    moved = pos.select(
        "user_id",
        "ts",
        "event_id",
        F.lag("tx").over(w).alias("ftx"),
        F.lag("ty").over(w).alias("fty"),
        F.col("tx").alias("ttx"),
        F.col("ty").alias("tty"),
    ).where(
        F.col("ftx").isNotNull()
        & ((F.col("ftx") != F.col("ttx")) | (F.col("fty") != F.col("tty")))
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tri = moved.select(
        F.lag("ftx").over(w2).alias("t0x"),
        F.lag("fty").over(w2).alias("t0y"),
        F.lag("ttx").over(w2).alias("p1x"),
        F.lag("tty").over(w2).alias("p1y"),
        "ftx",
        "fty",
        "ttx",
        "tty",
    ).where(
        # consecutive transitions chain only when the previous move's
        # destination IS this move's origin (no dwell gap in between
        # can break it — dwell steps were filtered before the lag,
        # so chaining is exactly "middle tile shared")
        F.col("t0x").isNotNull()
        & (F.col("p1x") == F.col("ftx"))
        & (F.col("p1y") == F.col("fty"))
    )
    return (
        tri.select(
            "t0x",
            "t0y",
            F.col("ftx").alias("t1x"),
            F.col("fty").alias("t1y"),
            F.col("ttx").alias("t2x"),
            F.col("tty").alias("t2y"),
        )
        .groupBy("t0x", "t0y", "t1x", "t1y", "t2x", "t2y")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "is_return",
            (
                (F.col("t0x") == F.col("t2x"))
                & (F.col("t0y") == F.col("t2y"))
            ).cast("int"),
        )
    )


def sql_od_trigrams(events_sql: str) -> str:
    return (
        _sql_base(events_sql) + ", "
        "mv AS (SELECT user_id, ts, event_id, "
        "LAG(tx) OVER w AS ftx, LAG(ty) OVER w AS fty, "
        "tx AS ttx, ty AS tty FROM pos "
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
        "mvf AS (SELECT * FROM mv WHERE ftx IS NOT NULL "
        "AND (ftx <> ttx OR fty <> tty)), "
        "tri AS (SELECT LAG(ftx) OVER w2 AS t0x, "
        "LAG(fty) OVER w2 AS t0y, LAG(ttx) OVER w2 AS p1x, "
        "LAG(tty) OVER w2 AS p1y, ftx, fty, ttx, tty FROM mvf "
        "WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)) "
        "SELECT t0x, t0y, ftx AS t1x, fty AS t1y, ttx AS t2x, "
        "tty AS t2y, COUNT(*) AS n, "
        "CAST((t0x = ttx AND t0y = tty) AS INT) AS is_return "
        "FROM tri WHERE t0x IS NOT NULL AND p1x = ftx AND p1y = fty "
        "GROUP BY 1, 2, 3, 4, 5, 6, 8"
    )


def markov_transitions(events: DataFrame) -> DataFrame:
    """First-order Markov next-place model over the OD flows — the
    probability table mobility prediction actually consumes (the
    od_matrix gives counts; prediction needs the row-conditional
    P(to|from)): per transition ``(from, to)`` the exact ppm
    conditional probability ``p_ppm = 10⁶·n_trips // row_total``
    plus the row total. Σ p_ppm over a row is ≤ 10⁶ by construction
    (floor quantization; the deficit is < n_destinations µ-units —
    the documented exact-integer contract, no float probability ever
    exists).

    Plan: od_matrix's one window exchange + flow groupBy, then the
    row marginal joins back ON ITS OWN GROUPING PREFIX (ftx, fty) —
    co-partitioned, no new exchange class."""
    od = od_matrix(events)
    row = od.groupBy("ftx", "fty").agg(
        F.sum("n_trips").alias("row_total")
    )
    return od.join(row, ["ftx", "fty"]).select(
        "ftx",
        "fty",
        "ttx",
        "tty",
        "n_trips",
        "row_total",
        F.expr(
            "CAST((CAST(n_trips AS DECIMAL(18,0)) * 1000000) "
            "div row_total AS BIGINT)"
        ).alias("p_ppm"),
    )


def sql_markov_transitions(events_sql: str) -> str:
    return (
        f"WITH odm AS ({sql_od_matrix(events_sql)}), "
        "row_tot AS (SELECT ftx, fty, SUM(n_trips) AS row_total "
        "FROM odm GROUP BY 1, 2) "
        "SELECT odm.ftx, odm.fty, ttx, tty, n_trips, row_total, "
        "CAST((n_trips::HUGEINT * 1000000) // row_total AS BIGINT) "
        "AS p_ppm FROM odm JOIN row_tot "
        "ON odm.ftx = row_tot.ftx AND odm.fty = row_tot.fty"
    )


def move_rose(events: DataFrame) -> DataFrame:
    """Displacement rose — the 8-sector direction histogram of moved
    steps (the wind-rose of movement analytics; anisotropy screening
    before any directional model): sectors are the EXACT half-open
    45° octants anchored at East, classified by pure integer
    sign/magnitude comparisons — sector 0 = [0°, 45°) is
    ``dx > 0 ∧ dy ≥ 0 ∧ dx > dy``, and so on counter-clockwise — so
    no atan2 (or any float) ever exists and boundary moves (a pure
    diagonal is EXACTLY 45° → sector 1) classify identically in both
    engines. Output ``(sector, n_moves, sum_cheb)``: the count and
    the total Chebyshev displacement per direction (net anisotropy =
    the imbalance across opposite sectors).

    Plan: the shared user-window exchange + one map-side-combinable
    groupBy onto 8 keys."""
    pos = sticky_positions(events)
    w = _user_window()
    moved = pos.select(
        (F.col("tx") - F.lag("tx").over(w)).alias("dx"),
        (F.col("ty") - F.lag("ty").over(w)).alias("dy"),
    ).where(
        F.col("dx").isNotNull()
        & ((F.col("dx") != 0) | (F.col("dy") != 0))
    )
    # half-open 45-degree octants anchored at East; each boundary ray
    # belongs to the counter-clockwise sector ([45,90) owns the pure
    # diagonal, [90,135) owns due North, ...) — the first cut put due
    # North/West/South on the wrong side, caught by the exhaustive
    # unit sweep over all sign/magnitude classes
    sector = F.expr(
        "CASE WHEN dx > 0 AND dy >= 0 AND dx > dy THEN 0 WHEN dx > 0 AND dy > 0 AND dy >= dx THEN 1 WHEN dx <= 0 AND dy > 0 AND dy > -dx THEN 2 WHEN dx < 0 AND dy > 0 AND -dx >= dy THEN 3 WHEN dx < 0 AND dy <= 0 AND -dx > -dy THEN 4 WHEN dx < 0 AND dy < 0 AND -dy >= -dx THEN 5 WHEN dx >= 0 AND dy < 0 AND -dy > dx THEN 6 ELSE 7 END"
    )
    return (
        moved.select(
            sector.cast("int").alias("sector"),
            F.greatest(F.abs(F.col("dx")), F.abs(F.col("dy"))).alias(
                "cheb"
            ),
        )
        .groupBy("sector")
        .agg(
            F.count(F.lit(1)).alias("n_moves"),
            F.sum("cheb").alias("sum_cheb"),
        )
    )


def sql_move_rose(events_sql: str) -> str:
    return (
        _sql_base(events_sql) + ", "
        "mv AS (SELECT tx - LAG(tx) OVER w AS dx, "
        "ty - LAG(ty) OVER w AS dy FROM pos "
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
        "mvf AS (SELECT dx, dy FROM mv WHERE dx IS NOT NULL "
        "AND (dx <> 0 OR dy <> 0)), "
        "cls AS (SELECT CASE WHEN dx > 0 AND dy >= 0 AND dx > dy THEN 0 WHEN dx > 0 AND dy > 0 AND dy >= dx THEN 1 WHEN dx <= 0 AND dy > 0 AND dy > -dx THEN 2 WHEN dx < 0 AND dy > 0 AND -dx >= dy THEN 3 WHEN dx < 0 AND dy <= 0 AND -dx > -dy THEN 4 WHEN dx < 0 AND dy < 0 AND -dy >= -dx THEN 5 WHEN dx >= 0 AND dy < 0 AND -dy > dx THEN 6 ELSE 7 END AS sector, "
        "GREATEST(ABS(dx), ABS(dy)) AS cheb FROM mvf) "
        "SELECT CAST(sector AS INT) AS sector, COUNT(*) AS n_moves, "
        "CAST(SUM(cheb) AS BIGINT) AS sum_cheb FROM cls GROUP BY 1"
    )


def user_centroid_drift(events: DataFrame) -> DataFrame:
    """Weekly activity-centroid drift per user — migration/relocation
    detection (the "has this user's home shifted?" screen a mobility
    pipeline runs above the radius-of-gyration): per user and
    calendar week, the visit centroid over sticky-tile CENTERS; then
    the EXACT floor of the squared drift between consecutive
    OBSERVED weeks (a user absent for a week compares to their last
    active week — documented). The centroid never exists as a float:
    with weekly sums (n, Sx, Sy), the drift between weeks 1 and 2 is
    ``((n₂Sx₁ − n₁Sx₂)² + (n₂Sy₁ − n₁Sy₂)²) / (n₁n₂)²`` — numerator
    and denominator exact integers (DECIMAL(38,0) accumulation; both
    non-negative so the floor div is engine-portable). Output
    ``(user_id, week, prev_week, n_cur, n_prev, drift2_milli2)``.

    Scale shape: one groupBy on (user, week) — map-side combinable —
    then a lag window on the user key the weekly table inherits;
    everything after the first groupBy is week-granular, not
    event-granular."""
    pos = sticky_positions(events)
    weekly = (
        pos.select(
            "user_id",
            F.expr(
                "CAST(unix_micros(CAST(ts AS TIMESTAMP)) div "
                "604800000000 AS BIGINT)"
            ).alias("week"),
            (F.col("tx") * 1000 + 500).alias("mx"),
            (F.col("ty") * 1000 + 500).alias("my"),
        )
        .groupBy("user_id", "week")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("mx").alias("sx"),
            F.sum("my").alias("sy"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("week")
    lagged = weekly.select(
        "user_id",
        "week",
        "n",
        "sx",
        "sy",
        F.lag("week").over(w).alias("prev_week"),
        F.lag("n").over(w).alias("pn"),
        F.lag("sx").over(w).alias("psx"),
        F.lag("sy").over(w).alias("psy"),
    ).where(F.col("prev_week").isNotNull())
    return lagged.select(
        "user_id",
        "week",
        "prev_week",
        F.col("n").alias("n_cur"),
        F.col("pn").alias("n_prev"),
        F.expr(
            "CAST(("
            "(CAST(n AS DECIMAL(18,0)) * psx - CAST(pn AS DECIMAL(18,0))"
            " * sx) * (CAST(n AS DECIMAL(18,0)) * psx - "
            "CAST(pn AS DECIMAL(18,0)) * sx) + "
            "(CAST(n AS DECIMAL(18,0)) * psy - CAST(pn AS DECIMAL(18,0))"
            " * sy) * (CAST(n AS DECIMAL(18,0)) * psy - "
            "CAST(pn AS DECIMAL(18,0)) * sy)"
            ") div (CAST(n AS DECIMAL(38,0)) * n * pn * pn) AS BIGINT)"
        ).alias("drift2_milli2"),
    )


def sql_user_centroid_drift(events_sql: str) -> str:
    return (
        _sql_base(events_sql) + ", "
        "weekly AS (SELECT user_id, "
        "epoch_us(ts) // 604800000000 AS week, COUNT(*) AS n, "
        "SUM(tx * 1000 + 500) AS sx, SUM(ty * 1000 + 500) AS sy "
        "FROM pos GROUP BY 1, 2), "
        "lagged AS (SELECT user_id, week, n, sx, sy, "
        "LAG(week) OVER w AS prev_week, LAG(n) OVER w AS pn, "
        "LAG(sx) OVER w AS psx, LAG(sy) OVER w AS psy FROM weekly "
        "WINDOW w AS (PARTITION BY user_id ORDER BY week)) "
        "SELECT user_id, week, prev_week, n AS n_cur, pn AS n_prev, "
        "CAST(((n::HUGEINT * psx - pn::HUGEINT * sx) * "
        "(n::HUGEINT * psx - pn::HUGEINT * sx) + "
        "(n::HUGEINT * psy - pn::HUGEINT * sy) * "
        "(n::HUGEINT * psy - pn::HUGEINT * sy)) // "
        "(n::HUGEINT * n * pn * pn) AS BIGINT) AS drift2_milli2 "
        "FROM lagged WHERE prev_week IS NOT NULL"
    )


def tile_runs_test(events: DataFrame) -> DataFrame:
    """Wald–Wolfowitz runs test inputs per tile — the nonparametric
    randomness screen on each tile's DAILY visit series (is the
    up/down pattern of a tile's activity random, trending, or
    oscillating?): day-over-day differences reduced to signs, TIES
    (zero diffs) DROPPED per the classical test, runs = 1 + number
    of sign changes over the surviving sequence. Output
    ``(tx, ty, n_obs, n_up, n_down, n_runs)`` for tiles with
    ``n_obs ≥ 2`` (one sign carries no run structure); the caller
    compares n_runs against the known exact null moments — all
    inputs integers, nothing here ever floats.

    Scale shape: the (tile, day) cube groupBy, then two lag windows
    over the SAME tile-key partitioning (one for the diff sign, one
    for the sign-change flag over the tie-filtered series) — the
    cube exchange is shared; the final rollup lands on the tile
    key."""
    pos = sticky_positions(events)
    daily = (
        pos.select(
            "tx",
            "ty",
            F.expr(
                "CAST(unix_micros(CAST(ts AS TIMESTAMP)) div "
                "86400000000 AS BIGINT)"
            ).alias("day"),
        )
        .groupBy("tx", "ty", "day")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    w = Window.partitionBy("tx", "ty").orderBy("day")
    signs = (
        daily.select(
            "tx",
            "ty",
            "day",
            (F.col("x") - F.lag("x").over(w)).alias("diff"),
        )
        .where(F.col("diff").isNotNull() & (F.col("diff") != 0))
        .select(
            "tx",
            "ty",
            "day",
            F.when(F.col("diff") > 0, F.lit(1))
            .otherwise(F.lit(-1))
            .alias("s"),
        )
    )
    flagged = signs.select(
        "tx",
        "ty",
        "s",
        F.when(
            F.lag("s").over(w).isNull()
            | (F.lag("s").over(w) != F.col("s")),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("chg"),
    )
    return (
        flagged.groupBy("tx", "ty")
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.sum(F.when(F.col("s") > 0, 1).otherwise(0)).alias("n_up"),
            F.sum(F.when(F.col("s") < 0, 1).otherwise(0)).alias(
                "n_down"
            ),
            F.sum("chg").alias("n_runs"),
        )
        .where(F.col("n_obs") >= 2)
        .select("tx", "ty", "n_obs", "n_up", "n_down", "n_runs")
    )


def sql_tile_runs_test(events_sql: str) -> str:
    return (
        _sql_base(events_sql) + ", "
        "daily AS (SELECT tx, ty, epoch_us(ts) // 86400000000 AS day, "
        "COUNT(*) AS x FROM pos GROUP BY 1, 2, 3), "
        "sgn AS (SELECT tx, ty, day, CASE WHEN d > 0 THEN 1 ELSE -1 "
        "END AS s FROM (SELECT tx, ty, day, x - LAG(x) OVER ("
        "PARTITION BY tx, ty ORDER BY day) AS d FROM daily) t "
        "WHERE d IS NOT NULL AND d <> 0), "
        "flg AS (SELECT tx, ty, s, CASE WHEN LAG(s) OVER ("
        "PARTITION BY tx, ty ORDER BY day) IS DISTINCT FROM s "
        "THEN 1 ELSE 0 END AS chg FROM sgn) "
        "SELECT tx, ty, COUNT(*) AS n_obs, "
        "CAST(SUM(CASE WHEN s > 0 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_up, "
        "CAST(SUM(CASE WHEN s < 0 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_down, "
        "CAST(SUM(chg) AS BIGINT) AS n_runs FROM flg GROUP BY 1, 2 "
        "HAVING COUNT(*) >= 2"
    )


K_ANON_LEVELS = ((0, 1), (1, 2), (2, 4), (3, 8), (4, 16), (5, 32))


def adaptive_k_anonymity(events: DataFrame, k: int = 5) -> DataFrame:
    """Adaptive spatial generalization — the k-anonymity release
    mechanism of location privacy (Gruteser & Grunwald 2003: coarsen
    each area until ≥ k distinct users share it, then release at
    that granularity): per base tile, the FINEST quadtree level at
    which the tile's enclosing cell reaches ``k`` distinct users —
    ``(tx, ty, release_level, n_users_at_level)``. Level l cells are
    ``(tx div 2^l, ty div 2^l)`` with the divisors as exploded
    LITERALS (never a float pow); level 5 is the whole 32×32 world,
    so any corpus with ≥ k users releases every tile (guarded:
    tiles that never qualify are dropped and documented).

    Scale shape: one bounded ×6 map-side explode of the visit
    table, ONE (level, cell) groupBy for the distinct-user ladder
    (the cube, not the events, is the working set above level 0),
    and an argmin-by-struct per base tile."""
    pos = sticky_positions(events)
    lvl = F.explode(
        F.expr(
            "array("
            + ", ".join(
                f"struct({l} AS l, {s} AS s)" for l, s in K_ANON_LEVELS
            )
            + ")"
        )
    )
    cells = pos.select("user_id", "tx", "ty").withColumn(
        "lv", lvl
    ).select(
        "user_id",
        "tx",
        "ty",
        F.col("lv.l").alias("l"),
        # integer div, never float: tx, s ≥ 0 so div IS floor
        F.expr("tx div lv.s").alias("cx"),
        F.expr("ty div lv.s").alias("cy"),
    )
    counts = cells.groupBy("l", "cx", "cy").agg(
        F.count_distinct("user_id").alias("n_users")
    )
    base = cells.select("tx", "ty", "l", "cx", "cy").distinct()
    joined = base.join(counts, ["l", "cx", "cy"])
    best = joined.groupBy("tx", "ty").agg(
        F.min(
            F.when(
                F.col("n_users") >= k,
                F.struct("l", "n_users"),
            )
        ).alias("best")
    )
    return best.where(F.col("best").isNotNull()).select(
        "tx",
        "ty",
        F.col("best.l").alias("release_level"),
        F.col("best.n_users").alias("n_users_at_level"),
    )


def sql_adaptive_k_anonymity(events_sql: str, k: int = 5) -> str:
    lvls = ", ".join(f"({l}, {s})" for l, s in K_ANON_LEVELS)
    return (
        _sql_base(events_sql) + ", "
        f"lv(l, s) AS (VALUES {lvls}), "
        "cells AS (SELECT user_id, tx, ty, l, tx // s AS cx, "
        "ty // s AS cy FROM pos CROSS JOIN lv), "
        "cnts AS (SELECT l, cx, cy, COUNT(DISTINCT user_id) AS "
        "n_users FROM cells GROUP BY 1, 2, 3), "
        "base AS (SELECT DISTINCT tx, ty, l, cx, cy FROM cells), "
        "j AS (SELECT base.tx, base.ty, base.l, n_users FROM base "
        "JOIN cnts ON base.l = cnts.l AND base.cx = cnts.cx "
        "AND base.cy = cnts.cy), "
        f"q AS (SELECT tx, ty, MIN(l) AS release_level FROM j "
        f"WHERE n_users >= {k} GROUP BY 1, 2) "
        "SELECT q.tx, q.ty, CAST(release_level AS INT) AS "
        "release_level, j.n_users AS n_users_at_level "
        "FROM q JOIN j ON q.tx = j.tx AND q.ty = j.ty "
        "AND j.l = q.release_level"
    )


def user_predictability(events: DataFrame) -> DataFrame:
    """Next-place predictability per user — the hit rate of the best
    first-order Markov predictor (the Π_max proxy of Song et al.,
    Science 2010, computed exactly instead of via entropy bounds):
    for each user, Σ over their origin tiles of the modal transition
    count, over total moves — ``pred_ppm = 10⁶·n_top // n_moves``,
    all integers. A user at 10⁶ ppm always goes to the same next
    tile from every origin; low values mean movement a 1-Markov
    model cannot learn. Output ``(user_id, n_moves, pred_ppm)``.

    Scale shape: every stage groups by keys PREFIXED by user_id —
    the one user-key exchange the trajectory family shares carries
    all three rollups map-side."""
    pos = sticky_positions(events)
    w = _user_window()
    moved = pos.select(
        "user_id",
        F.lag("tx").over(w).alias("ftx"),
        F.lag("ty").over(w).alias("fty"),
        F.col("tx").alias("ttx"),
        F.col("ty").alias("tty"),
    ).where(
        F.col("ftx").isNotNull()
        & ((F.col("ftx") != F.col("ttx")) | (F.col("fty") != F.col("tty")))
    )
    per = moved.groupBy("user_id", "ftx", "fty", "ttx", "tty").agg(
        F.count(F.lit(1)).alias("n")
    )
    origin = per.groupBy("user_id", "ftx", "fty").agg(
        F.sum("n").alias("from_total"),
        F.max("n").alias("top_n"),
    )
    return origin.groupBy("user_id").agg(
        F.sum("from_total").alias("n_moves"),
        F.expr(
            "CAST((CAST(SUM(top_n) AS DECIMAL(18,0)) * 1000000) div "
            "SUM(from_total) AS BIGINT)"
        ).alias("pred_ppm"),
    )


def sql_user_predictability(events_sql: str) -> str:
    return (
        _sql_base(events_sql) + ", "
        "mv AS (SELECT user_id, LAG(tx) OVER w AS ftx, "
        "LAG(ty) OVER w AS fty, tx AS ttx, ty AS tty FROM pos "
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
        "per AS (SELECT user_id, ftx, fty, ttx, tty, COUNT(*) AS n "
        "FROM mv WHERE ftx IS NOT NULL AND (ftx <> ttx OR fty <> tty) "
        "GROUP BY 1, 2, 3, 4, 5), "
        "orig AS (SELECT user_id, ftx, fty, SUM(n) AS from_total, "
        "MAX(n) AS top_n FROM per GROUP BY 1, 2, 3) "
        "SELECT user_id, CAST(SUM(from_total) AS BIGINT) AS n_moves, "
        "CAST((SUM(top_n)::HUGEINT * 1000000) // SUM(from_total) "
        "AS BIGINT) AS pred_ppm FROM orig GROUP BY 1"
    )


def tile_affinity(events: DataFrame, min_common: int = 2) -> DataFrame:
    """Co-visitation tile affinity — the "related places" graph
    collaborative filtering builds over locations (people who visit
    A also visit B; the precursor signal of place-recommendation
    models): for every unordered tile pair, the number of DISTINCT
    users visiting both, emitted above ``min_common`` (at planetary
    scale the 1-common-user pairs are the corpus). The pair
    enumeration explodes each USER's distinct tile set (bounded by
    the per-user footprint, never by the corpus) — the same
    per-basket fan-out as type_colocation_lift, with users as
    baskets and tiles as items; a tile×tile join never exists.
    Output ``(ax, ay, bx, by, n_common)`` with (ax,ay) < (bx,by)
    lexicographic.

    Scale shape: ONE exchange on user_id builds the sorted distinct
    tile set per user; pairs explode map-side; the count lands on
    the pair key, map-side combinable. Per-user footprints are
    bounded (a human visits hundreds of places, not billions) — the
    explode is |footprint|²/2 per user, the documented cost."""
    pos = sticky_positions(events)
    sets = (
        pos.select("user_id", "tx", "ty")
        .distinct()
        .groupBy("user_id")
        .agg(
            F.sort_array(
                F.collect_set(F.struct("tx", "ty"))
            ).alias("tiles")
        )
    )
    pairs = sets.select(
        F.explode(
            F.expr(
                "flatten(transform(tiles, (a, i) -> "
                "transform(slice(tiles, i + 2, size(tiles)), "
                "b -> struct(a.tx AS ax, a.ty AS ay, "
                "b.tx AS bx, b.ty AS by))))"
            )
        ).alias("p")
    ).select("p.ax", "p.ay", "p.bx", "p.by")
    return (
        pairs.groupBy("ax", "ay", "bx", "by")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .where(F.col("n_common") >= min_common)
    )


def sql_tile_affinity(events_sql: str, min_common: int = 2) -> str:
    """DuckDB twin — the classical presence-table self-join (a
    genuinely different plan from the per-basket explode)."""
    return (
        _sql_base(events_sql) + ", "
        "pres AS (SELECT DISTINCT user_id, tx, ty FROM pos), "
        "pr AS (SELECT a.tx AS ax, a.ty AS ay, b.tx AS bx, "
        "b.ty AS by, COUNT(*) AS n_common "
        "FROM pres a JOIN pres b ON a.user_id = b.user_id "
        "AND (a.tx < b.tx OR (a.tx = b.tx AND a.ty < b.ty)) "
        "GROUP BY 1, 2, 3, 4) "
        f"SELECT * FROM pr WHERE n_common >= {min_common}"
    )


def tile_lifecycle(events: DataFrame) -> DataFrame:
    """Place lifecycle screen — per tile the activity span and the
    longest dark stretch: ``(tx, ty, first_day, last_day,
    n_active_days, max_gap_days)``. The operational question behind
    it: which places are NEW (late first_day), which DIED (early
    last_day), which are INTERMITTENT (large max_gap relative to
    span)? max_gap is the maximum day-over-day difference minus 1
    over the tile's ordered active days (0 when fully contiguous or
    single-day). All integers; one lag window over the daily cube's
    tile-key partitioning + one rollup on the same key."""
    pos = sticky_positions(events)
    daily = (
        pos.select(
            "tx",
            "ty",
            F.expr(
                "CAST(unix_micros(CAST(ts AS TIMESTAMP)) div "
                "86400000000 AS BIGINT)"
            ).alias("day"),
        )
        .groupBy("tx", "ty", "day")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    w = Window.partitionBy("tx", "ty").orderBy("day")
    gapped = daily.select(
        "tx",
        "ty",
        "day",
        (F.col("day") - F.lag("day").over(w) - 1).alias("gap"),
    )
    return gapped.groupBy("tx", "ty").agg(
        F.min("day").alias("first_day"),
        F.max("day").alias("last_day"),
        F.count(F.lit(1)).alias("n_active_days"),
        F.coalesce(F.max("gap"), F.lit(0)).alias("max_gap_days"),
    )


def sql_tile_lifecycle(events_sql: str) -> str:
    return (
        _sql_base(events_sql) + ", "
        "daily AS (SELECT tx, ty, epoch_us(ts) // 86400000000 AS day "
        "FROM pos GROUP BY 1, 2, epoch_us(ts) // 86400000000), "
        "g AS (SELECT tx, ty, day, day - LAG(day) OVER ("
        "PARTITION BY tx, ty ORDER BY day) - 1 AS gap FROM daily) "
        "SELECT tx, ty, MIN(day) AS first_day, MAX(day) AS last_day, "
        "COUNT(*) AS n_active_days, "
        "CAST(COALESCE(MAX(gap), 0) AS BIGINT) AS max_gap_days "
        "FROM g GROUP BY 1, 2"
    )


def user_explorer(events: DataFrame) -> DataFrame:
    """Returner/explorer profiling (Pappalardo et al., Nature Comms
    2015 — the dichotomy human mobility splits into): per user the
    visit count, distinct-tile footprint, and the exact exploration
    ratio ``explore_ppm = 10⁶·n_distinct_tiles // n_visits`` — near
    10⁶ means every visit breaks new ground (explorer), near 0 means
    the user cycles a tiny set (returner). One groupBy on user_id
    with a two-level distinct; integers throughout."""
    pos = sticky_positions(events)
    per = pos.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_visits"),
        F.count_distinct("tx", "ty").alias("n_tiles"),
    )
    return per.select(
        "user_id",
        "n_visits",
        "n_tiles",
        F.expr(
            "CAST((CAST(n_tiles AS DECIMAL(18,0)) * 1000000) div "
            "n_visits AS BIGINT)"
        ).alias("explore_ppm"),
    )


def sql_user_explorer(events_sql: str) -> str:
    return (
        _sql_base(events_sql) + " "
        "SELECT user_id, COUNT(*) AS n_visits, "
        "COUNT(DISTINCT (tx, ty)) AS n_tiles, "
        "CAST((COUNT(DISTINCT (tx, ty))::HUGEINT * 1000000) // "
        "COUNT(*) AS BIGINT) AS explore_ppm "
        "FROM pos GROUP BY 1"
    )


def dissimilarity_index(
    events: DataFrame, type_a: str, type_b: str
) -> DataFrame:
    """Duncan & Duncan's index of dissimilarity (ASR 1955) — THE
    segregation statistic: how unevenly two event types distribute
    across tiles. ``D = ½ Σ_i |a_i/A − b_i/B|`` over tiles, exact in
    ppm via cross-multiplication — ``d_ppm = ⌊10⁶·Σ|a_i·B − b_i·A| /
    (2·A·B)⌋`` — so no per-tile share ever floats. D = 0 means the
    two activities share one spatial distribution; D·10⁶ = 10⁶ means
    complete separation (the share of either group that would have
    to relocate to equalize). Output one row
    ``(a_total, b_total, n_tiles, d_ppm)``.

    Scale shape: one (tile)-keyed conditional-sum groupBy over the
    typed visit cube (never a pivot, never a join of two per-type
    rasters whose outer-join null handling is the classic D bug —
    a tile where only one type appears still contributes |a_i·B|),
    marginals broadcast from their own one-row frame, one absolute
    sum. 128-bit: |a_i·B − b_i·A| ≤ 2·A·B ≤ ~10¹² at a 10⁶-event
    corpus, summed over ≤ 1024 tiles."""
    typed = sticky_positions(events, carry=("event_type",))
    per_tile = (
        typed.where(F.col("event_type").isin(type_a, type_b))
        .groupBy("tx", "ty")
        .agg(
            F.sum(
                F.when(F.col("event_type") == type_a, 1).otherwise(0)
            ).alias("a"),
            F.sum(
                F.when(F.col("event_type") == type_b, 1).otherwise(0)
            ).alias("b"),
        )
    )
    tot = per_tile.agg(
        F.sum("a").alias("a_total"),
        F.sum("b").alias("b_total"),
        F.count(F.lit(1)).alias("n_tiles"),
    )
    dev = per_tile.crossJoin(F.broadcast(tot)).agg(
        F.sum(
            F.abs(
                F.col("a").cast("decimal(18,0)") * F.col("b_total")
                - F.col("b").cast("decimal(18,0)") * F.col("a_total")
            )
        ).alias("sdev"),
        F.max("a_total").alias("a_total"),
        F.max("b_total").alias("b_total"),
        F.max("n_tiles").alias("n_tiles"),
    )
    return dev.select(
        "a_total",
        "b_total",
        "n_tiles",
        F.expr(
            "CAST((CAST(sdev AS DECIMAL(38,0)) * 1000000) div "
            "(CAST(a_total AS DECIMAL(38,0)) * b_total * 2) AS BIGINT)"
        ).alias("d_ppm"),
    )


def sql_dissimilarity_index(
    events_sql: str, type_a: str, type_b: str
) -> str:
    """DuckDB twin — ``events_sql`` must project event_type."""
    return (
        _sql_base(events_sql) + ", "
        "typed AS (SELECT pos.tx, pos.ty, ev.event_type AS et "
        "FROM pos JOIN ev ON pos.event_id = ev.event_id "
        f"WHERE ev.event_type IN ('{type_a}', '{type_b}')), "
        "pt AS (SELECT tx, ty, "
        f"SUM(CASE WHEN et = '{type_a}' THEN 1 ELSE 0 END) AS a, "
        f"SUM(CASE WHEN et = '{type_b}' THEN 1 ELSE 0 END) AS b "
        "FROM typed GROUP BY 1, 2), "
        "tot AS (SELECT SUM(a) AS a_total, SUM(b) AS b_total, "
        "COUNT(*) AS n_tiles FROM pt), "
        "dev AS (SELECT SUM(ABS(a::HUGEINT * b_total - "
        "b::HUGEINT * a_total)) AS sdev FROM pt, tot) "
        "SELECT CAST(a_total AS BIGINT) AS a_total, "
        "CAST(b_total AS BIGINT) AS b_total, n_tiles, "
        "CAST((sdev::HUGEINT * 1000000) // "
        "(a_total::HUGEINT * b_total * 2) AS BIGINT) AS d_ppm "
        "FROM dev, tot"
    )


def location_quotient(events: DataFrame, etype: str) -> DataFrame:
    """Location quotient per tile for one activity type — the
    regional-science concentration measure (Isserman 1977; the LQ
    maps every economic-geography dashboard draws): ``LQ_i =
    (a_i/t_i)/(A/T)`` — how over-represented the type is in tile i
    relative to its global share — exact in ppm via
    cross-multiplication ``10⁶·a_i·T // (t_i·A)``. Output
    ``(tx, ty, n_type, n_all, lq_ppm)`` for tiles where the type
    OCCURS (a zero-type tile has LQ exactly 0 and is omitted — at
    corpus scale the zero tiles are the corpus; the tile's total
    still includes all types, which is what makes LQ a share ratio
    rather than a density). One conditional-sum groupBy + a one-row
    broadcast."""
    typed = sticky_positions(events, carry=("event_type",))
    per = typed.groupBy("tx", "ty").agg(
        F.sum(
            F.when(F.col("event_type") == etype, 1).otherwise(0)
        ).alias("n_type"),
        F.count(F.lit(1)).alias("n_all"),
    )
    tot = per.agg(
        F.sum("n_type").alias("a_tot"), F.sum("n_all").alias("t_tot")
    )
    return (
        per.where(F.col("n_type") > 0)
        .crossJoin(F.broadcast(tot))
        .select(
            "tx",
            "ty",
            "n_type",
            "n_all",
            F.expr(
                "CAST((CAST(n_type AS DECIMAL(18,0)) * t_tot * 1000000)"
                " div (CAST(n_all AS DECIMAL(18,0)) * a_tot) AS BIGINT)"
            ).alias("lq_ppm"),
        )
    )


def sql_location_quotient(events_sql: str, etype: str) -> str:
    """DuckDB twin — ``events_sql`` must project event_type."""
    return (
        _sql_base(events_sql) + ", "
        "typed AS (SELECT pos.tx, pos.ty, ev.event_type AS et "
        "FROM pos JOIN ev ON pos.event_id = ev.event_id), "
        "per AS (SELECT tx, ty, "
        f"SUM(CASE WHEN et = '{etype}' THEN 1 ELSE 0 END) AS n_type, "
        "COUNT(*) AS n_all FROM typed GROUP BY 1, 2), "
        "tot AS (SELECT SUM(n_type) AS a_tot, SUM(n_all) AS t_tot "
        "FROM per) "
        "SELECT tx, ty, CAST(n_type AS BIGINT) AS n_type, n_all, "
        "CAST((n_type::HUGEINT * t_tot * 1000000) // "
        "(n_all::HUGEINT * a_tot) AS BIGINT) AS lq_ppm "
        "FROM per, tot WHERE n_type > 0"
    )


def home_tours(events: DataFrame) -> DataFrame:
    """Home-based tour extraction — the activity-based-modeling
    primitive (every travel-demand model's trip chaining starts
    here): with each user's HOME inferred as their modal tile
    (user_home_tile's deterministic tiebreak), a TOUR is a maximal
    run of consecutive away-from-home positions; output
    ``(user_id, n_tours, max_tour_events, away_ppm)`` where
    away_ppm is the exact share of positions spent away. OPEN tours
    (a run at the start or end of the observation window with no
    home anchor on one side) still count — the censoring is
    documented, matching how stay-point literature treats window
    edges.

    Scale shape: everything partitions by user_id — the home mode,
    the join-back, the gaps-and-islands episode window, and the
    final rollup ride ONE user-key exchange."""
    pos = sticky_positions(events)
    per_tile = pos.groupBy("user_id", "tx", "ty").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    home = per_tile.groupBy("user_id").agg(
        F.min(
            F.struct(
                (-F.col("cnt")).alias("neg"),
                F.col("tx").alias("htx"),
                F.col("ty").alias("hty"),
            )
        ).alias("m")
    ).select(
        "user_id",
        F.col("m.htx").alias("htx"),
        F.col("m.hty").alias("hty"),
    )
    flagged = pos.join(home, "user_id").select(
        "user_id",
        "ts",
        "event_id",
        (
            (F.col("tx") == F.col("htx")) & (F.col("ty") == F.col("hty"))
        ).cast("int").alias("at_home"),
    )
    w = _user_window()
    epi = flagged.withColumn(
        "chg",
        F.when(
            F.lag("at_home").over(w).isNull()
            | (F.lag("at_home").over(w) != F.col("at_home")),
            1,
        ).otherwise(0),
    ).withColumn(
        "episode",
        F.sum("chg").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    away = epi.where(F.col("at_home") == 0)
    per_tour = away.groupBy("user_id", "episode").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    tours = per_tour.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_tours"),
        F.max("n_events").alias("max_tour_events"),
        F.sum("n_events").alias("away_events"),
    )
    totals = pos.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_total")
    )
    return tours.join(totals, "user_id").select(
        "user_id",
        "n_tours",
        "max_tour_events",
        F.expr(
            "CAST((CAST(away_events AS DECIMAL(18,0)) * 1000000) div "
            "n_total AS BIGINT)"
        ).alias("away_ppm"),
    )


def sql_home_tours(events_sql: str) -> str:
    return (
        _sql_base(events_sql) + ", "
        "pt AS (SELECT user_id, tx, ty, COUNT(*) AS cnt FROM pos "
        "GROUP BY 1, 2, 3), "
        "home AS (SELECT user_id, tx AS htx, ty AS hty FROM ("
        "SELECT user_id, tx, ty, ROW_NUMBER() OVER ("
        "PARTITION BY user_id ORDER BY cnt DESC, tx, ty) AS rk "
        "FROM pt) t WHERE rk = 1), "
        "fl AS (SELECT pos.user_id, ts, event_id, "
        "CASE WHEN tx = htx AND ty = hty THEN 1 ELSE 0 END AS at_home "
        "FROM pos JOIN home ON pos.user_id = home.user_id), "
        "ep AS (SELECT user_id, ts, event_id, at_home, SUM(chg) OVER ("
        "PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS UNBOUNDED PRECEDING) AS episode FROM ("
        "SELECT *, CASE WHEN LAG(at_home) OVER ("
        "PARTITION BY user_id ORDER BY ts, event_id) "
        "IS DISTINCT FROM at_home THEN 1 ELSE 0 END AS chg FROM fl) x), "
        "tour AS (SELECT user_id, episode, COUNT(*) AS n_events "
        "FROM ep WHERE at_home = 0 GROUP BY 1, 2), "
        "agg AS (SELECT user_id, COUNT(*) AS n_tours, "
        "MAX(n_events) AS max_tour_events, SUM(n_events) AS away "
        "FROM tour GROUP BY 1), "
        "tot AS (SELECT user_id, COUNT(*) AS n_total FROM pos "
        "GROUP BY 1) "
        "SELECT agg.user_id, n_tours, max_tour_events, "
        "CAST((away::HUGEINT * 1000000) // n_total AS BIGINT) "
        "AS away_ppm FROM agg JOIN tot ON agg.user_id = tot.user_id"
    )


def tile_weekend_ratio(events: DataFrame) -> DataFrame:
    """Work/leisure zone fingerprint — the weekday/weekend activity
    split per tile (the first classifier urban analytics runs on a
    place: office districts die on weekends, parks invert):
    ``(tx, ty, n_weekday, n_weekend, weekend_ppm)`` with
    ``weekend_ppm = 10⁶·n_weekend // (n_weekday + n_weekend)``
    exact. Day-of-week from the epoch day number: day 0
    (1970-01-01) was a THURSDAY, so ``dow = (epoch_day + 4) % 7``
    with Sunday = 0 — weekend is dow ∈ {0, 6}; both engines compute
    the same integer congruence, no calendar library involved. One
    map-side-combinable conditional-sum groupBy."""
    pos = sticky_positions(events)
    dow = F.expr(
        "((unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000) + 4) % 7"
    )
    per = (
        pos.select(
            "tx",
            "ty",
            F.when(dow.isin(0, 6), 1).otherwise(0).alias("we"),
        )
        .groupBy("tx", "ty")
        .agg(
            F.sum(F.lit(1) - F.col("we")).alias("n_weekday"),
            F.sum("we").alias("n_weekend"),
        )
    )
    return per.select(
        "tx",
        "ty",
        "n_weekday",
        "n_weekend",
        F.expr(
            "CAST((CAST(n_weekend AS DECIMAL(18,0)) * 1000000) div "
            "(n_weekday + n_weekend) AS BIGINT)"
        ).alias("weekend_ppm"),
    )


def sql_tile_weekend_ratio(events_sql: str) -> str:
    return (
        _sql_base(events_sql) + ", "
        "f AS (SELECT tx, ty, CASE WHEN "
        "((epoch_us(ts) // 86400000000) + 4) % 7 IN (0, 6) "
        "THEN 1 ELSE 0 END AS we FROM pos), "
        "per AS (SELECT tx, ty, SUM(1 - we) AS n_weekday, "
        "SUM(we) AS n_weekend FROM f GROUP BY 1, 2) "
        "SELECT tx, ty, CAST(n_weekday AS BIGINT) AS n_weekday, "
        "CAST(n_weekend AS BIGINT) AS n_weekend, "
        "CAST((n_weekend::HUGEINT * 1000000) // "
        "(n_weekday + n_weekend) AS BIGINT) AS weekend_ppm "
        "FROM per"
    )


def iet_spectrum(events: DataFrame) -> DataFrame:
    """Inter-event-time spectrum — the burstiness histogram of human
    activity (Barabási, Nature 2005: heavy-tailed waiting times):
    per-user consecutive-event gaps in MICROSECONDS binned into
    exact octaves (LENGTH(BIN(gap_us)) — the jump_spectrum
    convention on the TIME axis), with per-bucket distinct-user
    counts. Zero gaps (same-timestamp events, real at sf ≥ 1) land
    in their own ``bucket = 0`` row rather than being dropped — a
    burst detector that silently drops the exact-collision class
    undercounts the very thing it measures. Output
    ``(bucket, n_gaps, n_users)``.

    Scale shape: the lag rides the shared user-window exchange; the
    histogram groupBy is map-side combinable onto ≤ ~64 octaves."""
    pos = sticky_positions(events)
    w = _user_window()
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gaps = pos.select(
        "user_id", (us - F.lag(us).over(w)).alias("gap_us")
    ).where(F.col("gap_us").isNotNull())
    return (
        gaps.select(
            "user_id",
            F.when(F.col("gap_us") == 0, F.lit(0))
            .otherwise(F.length(F.bin(F.col("gap_us"))))
            .cast("int")
            .alias("bucket"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.count_distinct("user_id").alias("n_users"),
        )
    )


def sql_iet_spectrum(events_sql: str) -> str:
    return (
        _sql_base(events_sql) + ", "
        "g AS (SELECT user_id, epoch_us(ts) - LAG(epoch_us(ts)) "
        "OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us "
        "FROM pos), "
        "b AS (SELECT user_id, CASE WHEN gap_us = 0 THEN 0 "
        "ELSE CAST(LENGTH(BIN(gap_us)) AS INT) END AS bucket "
        "FROM g WHERE gap_us IS NOT NULL) "
        "SELECT bucket, COUNT(*) AS n_gaps, "
        "COUNT(DISTINCT user_id) AS n_users FROM b GROUP BY 1"
    )


def od_asymmetry(events: DataFrame) -> DataFrame:
    """Directional flow imbalance — the commuter-corridor screen on
    the OD matrix (a symmetric corridor is exchange; an asymmetric
    one is commuting or migration): for every unordered tile pair
    with flow in EITHER direction, ``(ax, ay, bx, by, f_ab, f_ba,
    asym_ppm)`` where ``asym_ppm = 10⁶·|f_ab − f_ba| //
    (f_ab + f_ba)`` exactly — 0 is perfect balance, 10⁶ is one-way.
    Missing reverse flows are 0 via the full-outer join + COALESCE
    (dropping them — the inner-join bug — deletes exactly the
    pure one-way corridors that score 10⁶).

    Plan: od_matrix's exchange + ONE self-join on the reversed key,
    canonicalized so each unordered pair emits once."""
    od = od_matrix(events)
    fwd = od.select(
        F.col("ftx").alias("ax"),
        F.col("fty").alias("ay"),
        F.col("ttx").alias("bx"),
        F.col("tty").alias("by"),
        F.col("n_trips").alias("f_ab"),
    )
    rev = od.select(
        F.col("ttx").alias("ax"),
        F.col("tty").alias("ay"),
        F.col("ftx").alias("bx"),
        F.col("fty").alias("by"),
        F.col("n_trips").alias("f_ba"),
    )
    both = (
        fwd.join(rev, ["ax", "ay", "bx", "by"], "full")
        .select(
            "ax",
            "ay",
            "bx",
            "by",
            F.coalesce(F.col("f_ab"), F.lit(0)).alias("f_ab"),
            F.coalesce(F.col("f_ba"), F.lit(0)).alias("f_ba"),
        )
        # canonical orientation: keep each unordered pair once
        .where(
            (F.col("ax") < F.col("bx"))
            | ((F.col("ax") == F.col("bx")) & (F.col("ay") < F.col("by")))
        )
    )
    return both.select(
        "ax",
        "ay",
        "bx",
        "by",
        "f_ab",
        "f_ba",
        F.expr(
            "CAST((CAST(ABS(f_ab - f_ba) AS DECIMAL(18,0)) * 1000000) "
            "div (f_ab + f_ba) AS BIGINT)"
        ).alias("asym_ppm"),
    )


def sql_od_asymmetry(events_sql: str) -> str:
    return (
        f"WITH odm AS ({sql_od_matrix(events_sql)}), "
        "fwd AS (SELECT ftx AS ax, fty AS ay, ttx AS bx, tty AS by, "
        "n_trips AS f_ab FROM odm), "
        "rev AS (SELECT ttx AS ax, tty AS ay, ftx AS bx, fty AS by, "
        "n_trips AS f_ba FROM odm), "
        "both_d AS (SELECT COALESCE(fwd.ax, rev.ax) AS ax, "
        "COALESCE(fwd.ay, rev.ay) AS ay, "
        "COALESCE(fwd.bx, rev.bx) AS bx, "
        "COALESCE(fwd.by, rev.by) AS by, "
        "COALESCE(f_ab, 0) AS f_ab, COALESCE(f_ba, 0) AS f_ba "
        "FROM fwd FULL JOIN rev ON fwd.ax = rev.ax AND fwd.ay = rev.ay "
        "AND fwd.bx = rev.bx AND fwd.by = rev.by) "
        "SELECT ax, ay, bx, by, f_ab, f_ba, "
        "CAST((ABS(f_ab - f_ba)::HUGEINT * 1000000) // "
        "(f_ab + f_ba) AS BIGINT) AS asym_ppm FROM both_d "
        "WHERE ax < bx OR (ax = bx AND ay < by)"
    )


def contact_degrees(events: DataFrame) -> DataFrame:
    """Degree distribution of the co-presence contact network — the
    first statistic epidemiology reads off a contact graph (a
    heavy-tailed degree histogram means superspreader structure; a
    narrow one means homogeneous mixing): per contact-graph degree
    OCTAVE (bit length, the engine's spectrum convention), how many
    users hold that many distinct contacts. Output
    ``(bucket, n_users)``.

    Plan: the co_presence pair table (slot-bounded equi-join, never
    all-pairs), exploded to per-user degree counts (each unordered
    pair feeds both endpoints), one groupBy per user then a bounded
    octave histogram."""
    pairs = co_presence(events)
    ends = pairs.select(
        F.col("user_a").alias("user_id")
    ).unionByName(pairs.select(F.col("user_b").alias("user_id")))
    deg = ends.groupBy("user_id").agg(F.count(F.lit(1)).alias("deg"))
    return (
        deg.select(
            F.length(F.bin(F.col("deg"))).cast("int").alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def sql_contact_degrees(events_sql: str) -> str:
    return (
        f"WITH cp AS ({sql_co_presence(events_sql)}), "
        "ends_u AS (SELECT user_a AS user_id FROM cp "
        "UNION ALL SELECT user_b FROM cp), "
        "deg AS (SELECT user_id, COUNT(*) AS deg FROM ends_u "
        "GROUP BY 1) "
        "SELECT CAST(LENGTH(BIN(deg)) AS INT) AS bucket, "
        "COUNT(*) AS n_users FROM deg GROUP BY 1"
    )


def user_similarity(events: DataFrame) -> DataFrame:
    """Co-location user similarity — the friendship-inference signal
    of location-based social networks (Crandall et al., PNAS 2010:
    spatial co-occurrence predicts social ties): for every user pair
    that shares at least one (tile, day) slot (the co_presence
    gate — candidate generation, so the pair set stays slot-bounded,
    never all-pairs), the EXACT Jaccard of their distinct TILE
    footprints in ppm: ``jac_ppm = 10⁶·|A∩B| // (|A|+|B|−|A∩B|)``.
    Output ``(user_a, user_b, n_inter, jac_ppm)``.

    Plan: the per-tile user pair join (bounded by per-tile
    occupancy) counts intersections; footprint sizes join back by
    the pair's endpoints (two broadcast-able maps); the co-presence
    gate only FILTERS — the intersection join is on the tile key."""
    pos = sticky_positions(events)
    tiles = pos.select("user_id", "tx", "ty").distinct()
    sizes = tiles.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_tiles")
    )
    a = tiles.select(F.col("user_id").alias("user_a"), "tx", "ty")
    b = tiles.select(F.col("user_id").alias("user_b"), "tx", "ty")
    inter = (
        a.join(b, ["tx", "ty"])
        .where(F.col("user_a") < F.col("user_b"))
        .groupBy("user_a", "user_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    gate = co_presence(events).select("user_a", "user_b")
    sa = sizes.select(
        F.col("user_id").alias("user_a"), F.col("n_tiles").alias("na")
    )
    sb = sizes.select(
        F.col("user_id").alias("user_b"), F.col("n_tiles").alias("nb")
    )
    return (
        inter.join(gate, ["user_a", "user_b"])
        .join(F.broadcast(sa), "user_a")
        .join(F.broadcast(sb), "user_b")
        .select(
            "user_a",
            "user_b",
            "n_inter",
            F.expr(
                "CAST((CAST(n_inter AS DECIMAL(18,0)) * 1000000) div "
                "(na + nb - n_inter) AS BIGINT)"
            ).alias("jac_ppm"),
        )
    )


def sql_user_similarity(events_sql: str) -> str:
    # one _sql_base chain: the co-presence gate CTEs are inlined so
    # `pos` stays in scope for the tile-footprint CTEs
    return (
        _sql_base(events_sql) + ", "
        "v AS (SELECT DISTINCT user_id, tx, ty, "
        "epoch_us(ts) // 86400000000 AS day FROM pos), "
        "cp AS (SELECT a.user_id AS user_a, b.user_id AS user_b "
        "FROM v a JOIN v b ON a.tx = b.tx AND a.ty = b.ty "
        "AND a.day = b.day AND a.user_id < b.user_id "
        "GROUP BY 1, 2), "
        "tiles AS (SELECT DISTINCT user_id, tx, ty FROM pos), "
        "sizes AS (SELECT user_id, COUNT(*) AS n_tiles FROM tiles "
        "GROUP BY 1), "
        "inter AS (SELECT a.user_id AS user_a, b.user_id AS user_b, "
        "COUNT(*) AS n_inter FROM tiles a JOIN tiles b "
        "ON a.tx = b.tx AND a.ty = b.ty AND a.user_id < b.user_id "
        "GROUP BY 1, 2) "
        "SELECT inter.user_a, inter.user_b, n_inter, "
        "CAST((n_inter::HUGEINT * 1000000) // "
        "(sa.n_tiles + sb.n_tiles - n_inter) AS BIGINT) AS jac_ppm "
        "FROM inter JOIN cp ON inter.user_a = cp.user_a "
        "AND inter.user_b = cp.user_b "
        "JOIN sizes sa ON sa.user_id = inter.user_a "
        "JOIN sizes sb ON sb.user_id = inter.user_b"
    )


def distance_decay(events: DataFrame) -> DataFrame:
    """Distance decay of co-location similarity — the geographic-tie
    gradient (Liben-Nowell et al., PNAS 2005: friendship probability
    falls off with distance; here the co-location analog): bucket
    every co-present user pair by the OCTAVE of the Chebyshev
    distance between the two users' HOME tiles, and per bucket emit
    the pair count and the exact floor of the mean footprint-Jaccard
    — ``(bucket, n_pairs, mean_jac_ppm)`` with ``mean_jac_ppm =
    Σ jac_ppm // n_pairs`` (sum of exact per-pair ppms, floored once
    — deterministic in both engines). Bucket 0 is same-home pairs
    (distance 0 has no octave). The curve falling with bucket IS the
    decay.

    Plan: user_similarity's slot-bounded pair table + the home-mode
    table joined on each endpoint (two broadcast-able maps), then a
    bounded octave groupBy."""
    sims = user_similarity(events)
    pos = sticky_positions(events)
    per_tile = pos.groupBy("user_id", "tx", "ty").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    home = per_tile.groupBy("user_id").agg(
        F.min(
            F.struct(
                (-F.col("cnt")).alias("neg"),
                F.col("tx").alias("htx"),
                F.col("ty").alias("hty"),
            )
        ).alias("m")
    ).select(
        "user_id",
        F.col("m.htx").alias("htx"),
        F.col("m.hty").alias("hty"),
    )
    ha = home.select(
        F.col("user_id").alias("user_a"),
        F.col("htx").alias("ax"),
        F.col("hty").alias("ay"),
    )
    hb = home.select(
        F.col("user_id").alias("user_b"),
        F.col("htx").alias("bx"),
        F.col("hty").alias("by"),
    )
    d = (
        sims.join(F.broadcast(ha), "user_a")
        .join(F.broadcast(hb), "user_b")
        .select(
            F.greatest(
                F.abs(F.col("ax") - F.col("bx")),
                F.abs(F.col("ay") - F.col("by")),
            ).alias("cheb"),
            "jac_ppm",
        )
        .select(
            F.when(F.col("cheb") == 0, F.lit(0))
            .otherwise(F.length(F.bin(F.col("cheb"))))
            .cast("int")
            .alias("bucket"),
            "jac_ppm",
        )
    )
    return d.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.expr(
            "CAST(CAST(SUM(jac_ppm) AS DECIMAL(38,0)) div COUNT(*) "
            "AS BIGINT)"
        ).alias("mean_jac_ppm"),
    )


def sql_distance_decay(events_sql: str) -> str:
    # ONE _sql_base chain: the similarity CTEs are inlined (not a
    # nested statement) so `pos` stays in scope for the home mode
    return (
        _sql_base(events_sql) + ", "
        "v AS (SELECT DISTINCT user_id, tx, ty, "
        "epoch_us(ts) // 86400000000 AS day FROM pos), "
        "cp AS (SELECT a.user_id AS user_a, b.user_id AS user_b "
        "FROM v a JOIN v b ON a.tx = b.tx AND a.ty = b.ty "
        "AND a.day = b.day AND a.user_id < b.user_id GROUP BY 1, 2), "
        "tiles AS (SELECT DISTINCT user_id, tx, ty FROM pos), "
        "sizes AS (SELECT user_id, COUNT(*) AS n_tiles FROM tiles "
        "GROUP BY 1), "
        "inter AS (SELECT a.user_id AS user_a, b.user_id AS user_b, "
        "COUNT(*) AS n_inter FROM tiles a JOIN tiles b "
        "ON a.tx = b.tx AND a.ty = b.ty AND a.user_id < b.user_id "
        "GROUP BY 1, 2), "
        "sims AS (SELECT inter.user_a, inter.user_b, "
        "CAST((n_inter::HUGEINT * 1000000) // "
        "(sa.n_tiles + sb.n_tiles - n_inter) AS BIGINT) AS jac_ppm "
        "FROM inter JOIN cp ON inter.user_a = cp.user_a "
        "AND inter.user_b = cp.user_b "
        "JOIN sizes sa ON sa.user_id = inter.user_a "
        "JOIN sizes sb ON sb.user_id = inter.user_b), "
        "pt2 AS (SELECT user_id, tx, ty, COUNT(*) AS cnt FROM pos "
        "GROUP BY 1, 2, 3), "
        "home AS (SELECT user_id, tx AS htx, ty AS hty FROM ("
        "SELECT user_id, tx, ty, ROW_NUMBER() OVER ("
        "PARTITION BY user_id ORDER BY cnt DESC, tx, ty) AS rk "
        "FROM pt2) t WHERE rk = 1), "
        "d AS (SELECT GREATEST(ABS(ha.htx - hb.htx), "
        "ABS(ha.hty - hb.hty)) AS cheb, jac_ppm FROM sims "
        "JOIN home ha ON sims.user_a = ha.user_id "
        "JOIN home hb ON sims.user_b = hb.user_id) "
        "SELECT CASE WHEN cheb = 0 THEN 0 "
        "ELSE CAST(LENGTH(BIN(cheb)) AS INT) END AS bucket, "
        "COUNT(*) AS n_pairs, "
        "CAST(SUM(jac_ppm)::HUGEINT // COUNT(*) AS BIGINT) "
        "AS mean_jac_ppm FROM d GROUP BY 1"
    )


def co_travelers(events: DataFrame, min_tiles: int = 2) -> DataFrame:
    """Travel-companion detection — the screen that separates
    "shares an office" from "travels together" (security/fraud
    analytics' co-movement primitive): co-present user pairs whose
    shared (tile, day) slots span at least ``min_tiles`` DISTINCT
    tiles — static co-location at one place never qualifies, only
    co-MOVEMENT does. Output ``(user_a, user_b, n_shared_slots,
    n_shared_tiles)``.

    Plan: the co_presence slot join carrying the tile key, then one
    pair groupBy with a distinct-tile count — same slot-bounded
    profile, never all-pairs."""
    pos = sticky_positions(events)
    visits = pos.select(
        "user_id",
        "tx",
        "ty",
        F.expr(
            "CAST(unix_micros(CAST(ts AS TIMESTAMP)) div "
            "86400000000 AS BIGINT)"
        ).alias("day"),
    ).distinct()
    a = visits.select(
        F.col("user_id").alias("user_a"), "tx", "ty", "day"
    )
    b = visits.select(
        F.col("user_id").alias("user_b"), "tx", "ty", "day"
    )
    shared = (
        a.join(b, ["tx", "ty", "day"])
        .where(F.col("user_a") < F.col("user_b"))
        .groupBy("user_a", "user_b")
        .agg(
            F.count(F.lit(1)).alias("n_shared_slots"),
            F.count_distinct("tx", "ty").alias("n_shared_tiles"),
        )
    )
    return shared.where(F.col("n_shared_tiles") >= min_tiles)


def sql_co_travelers(events_sql: str, min_tiles: int = 2) -> str:
    return (
        _sql_base(events_sql) + ", "
        "v AS (SELECT DISTINCT user_id, tx, ty, "
        "epoch_us(ts) // 86400000000 AS day FROM pos), "
        "sh AS (SELECT a.user_id AS user_a, b.user_id AS user_b, "
        "COUNT(*) AS n_shared_slots, "
        "COUNT(DISTINCT (a.tx, a.ty)) AS n_shared_tiles "
        "FROM v a JOIN v b ON a.tx = b.tx AND a.ty = b.ty "
        "AND a.day = b.day AND a.user_id < b.user_id "
        "GROUP BY 1, 2) "
        f"SELECT * FROM sh WHERE n_shared_tiles >= {min_tiles}"
    )


def user_activity_gini(events: DataFrame) -> DataFrame:
    """Gini coefficient of per-user activity — the "what share of
    the corpus do the heaviest users generate?" inequality summary
    every platform health report carries (and the bias screen a
    training pipeline runs before sampling by user): exact ppm via
    the same rank identity as the spatial Gini,
    ``G = (2·Σᵢ i·x₍ᵢ₎ − (n+1)·S)/(n·S)`` over ASCENDING per-user
    event counts, ranked by :func:`layout.exact_global_rank`
    (repartitionByRange + per-partition row_number + broadcast
    prefix offsets — NEVER a single-partition window; at 10⁹ users a
    keyless ``Window.orderBy`` collapses onto one task). Ties
    between equal counts permute freely across engines but Σ i·x
    over a tied block is rank-set invariant, so the statistic is
    deterministic anyway. One row ``(n_users, s_tot, gini_ppm)``."""
    from workstealing_spatial_join_spark.operators.layout import (
        exact_global_rank,
    )

    counts = events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("x")
    )
    ranked = exact_global_rank(
        counts, "x", "user_id", out_col="g_rank"
    )
    return ranked.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("x").alias("s_tot"),
        F.expr(
            "CAST(((2 * SUM(CAST(g_rank + 1 AS DECIMAL(18,0)) * x) "
            "- (COUNT(*) + 1) * CAST(SUM(x) AS DECIMAL(38,0))) "
            "* 1000000) div (COUNT(*) * CAST(SUM(x) AS DECIMAL(38,0))) "
            "AS BIGINT)"
        ).alias("gini_ppm"),
    )


def sql_user_activity_gini(events_sql: str) -> str:
    """DuckDB twin — plain global ROW_NUMBER (the contract: the
    distributed rank machinery lands the identical number)."""
    return (
        f"WITH ev AS ({events_sql}), "
        "counts AS (SELECT user_id, COUNT(*) AS x FROM ev "
        "GROUP BY 1), "
        "rk AS (SELECT x, ROW_NUMBER() OVER (ORDER BY x, user_id) "
        "AS r FROM counts) "
        "SELECT COUNT(*) AS n_users, CAST(SUM(x) AS BIGINT) AS s_tot, "
        "CAST(((2 * SUM(CAST(r AS HUGEINT) * x) "
        "- (COUNT(*) + 1) * CAST(SUM(x) AS HUGEINT)) * 1000000) // "
        "(COUNT(*) * CAST(SUM(x) AS HUGEINT)) AS BIGINT) AS gini_ppm "
        "FROM rk"
    )
