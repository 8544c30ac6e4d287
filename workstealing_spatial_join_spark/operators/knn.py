"""kNN join via grid k-ring expansion with distance refinement (J6 —
required by the north_rule; the reference has no kNN, SURVEY.md §2.3).

Plan per round (all Catalyst except nothing — there is NO Python in
this operator at all):

    queries → cell (floor arithmetic)
            → explode k-ring cells (sequence × sequence)
            → equi-join candidates on cell_id
            → euclidean distance (codegen'd)
            → Window row_number per query ≤ k

Correctness rule: searching Chebyshev ring r guarantees every
candidate within distance r*cell_deg of the query is seen. A query is
SETTLED when it has ≥k candidates and its k-th distance ≤ r*cell_deg;
unsettled queries re-run with a doubled ring (driver loop over a
shrinking distributed DataFrame — the moral analog of the reference's
iterative work redistribution, but expressed as dataflow).

Distances are planar-euclidean on lon/lat degrees (matches the DuckDB
oracle exactly); no longitude wrap (documented limitation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from workstealing_spatial_join_spark.functions import grid as GRID


def _ring_cells(df: DataFrame, r: int, cell_deg: float) -> DataFrame:
    # memoized name-based expressions (functions/exprs.py): the ring
    # explode is rebuilt once per (r, cell_deg) per process instead
    # of paying ~100 py4j round trips per kNN round
    from workstealing_spatial_join_spark.functions.exprs import cexpr
    from workstealing_spatial_join_spark.functions.grid import (
        _spark_sql_cell_x, _spark_sql_cell_y,
    )

    nx, ny = GRID.grid_dims(cell_deg)
    cx = _spark_sql_cell_x("qx", cell_deg)
    cy = _spark_sql_cell_y("qy", cell_deg)
    out = df.withColumn(
        "ring_x",
        cexpr(
            f"explode(sequence(GREATEST({cx} - {int(r)}L, 0L), "
            f"LEAST({cx} + {int(r)}L, {nx - 1}L)))"
        ),
    ).withColumn(
        "ring_y",
        cexpr(
            f"explode(sequence(GREATEST({cy} - {int(r)}L, 0L), "
            f"LEAST({cy} + {int(r)}L, {ny - 1}L)))"
        ),
    )
    return out.withColumn(
        "cell_id", cexpr("ring_x * 4294967296L + ring_y")
    ).drop("ring_x", "ring_y")


EARTH_RADIUS_KM = 6371.0088  # IUGG mean radius
_KM_PER_DEG = EARTH_RADIUS_KM * 3.141592653589793 / 180.0  # ≈ 111.195


def _haversine_km(qx, qy, cx, cy):
    """Great-circle distance in km — pure Catalyst (sin/cos/asin are
    JVM intrinsics; no Python)."""
    rad = F.lit(3.141592653589793 / 180.0)
    dlat = (cy - qy) * rad
    dlon = (cx - qx) * rad
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(qy * rad) * F.cos(cy * rad)
        * F.sin(dlon / 2) * F.sin(dlon / 2)
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def _auto_ring_cells(c: DataFrame, k: int, cell_deg: float,
                     max_ring: int) -> int:
    """First-ring size in cells from candidate BOUNDING-BOX density
    (occupied-cell density over-estimates sparse layers — most ring
    cells are empty). Shared by the planar and great-circle kNN
    joins. One cheap aggregate.

    Sizing rule: a query SETTLES at ring r only when its k-th
    neighbor lies strictly inside the guaranteed radius r·cell_deg —
    the circle INSCRIBED in the (2r+1)² ring box, not the box itself
    (round 2 targeted ~4k candidates in the box; at the bench density
    that picked r=1, whose inscribed circle holds barely k expected
    points, so half the queries paid ~4 extra doubling rounds — the
    knn_images 7.2→8.5 s regression). Target E[points within r·cd] =
    density·π·r² ≥ 3k+7: the +7 keeps the Poisson tail small at SMALL
    k too (P(Poisson(3k)<k) is only ~5% at k=1 — e⁻³ — and ~2% at
    k=2-3; with λ=3k+7, P(Poisson(λ)<k) < 1e-4 for every k ≥ 1), so
    round 1 settles all but genuinely sparse-region queries."""
    import math

    stats = c.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("cx").alias("x0"), F.max("cx").alias("x1"),
        F.min("cy").alias("y0"), F.max("cy").alias("y1"),
    ).collect()[0]
    if not stats["n"]:
        return 1
    cells = max(
        1.0,
        ((stats["x1"] - stats["x0"]) / cell_deg + 1)
        * ((stats["y1"] - stats["y0"]) / cell_deg + 1),
    )
    density = stats["n"] / cells  # points per cell == per cell_deg²
    return max(1, min(
        max_ring,
        math.ceil(
            math.sqrt((3.0 * k + 7.0) / (math.pi * max(density, 1e-12)))
        ),
    ))


def _haversine_ring_cover(
    q: DataFrame, radius_km: float, cell_deg: float
) -> DataFrame:
    """Explode query rows (qx, qy) into every cell that can hold a
    point within ``radius_km`` great-circle distance — the spherical
    cover shared by dwithin_haversine_join and knn_haversine_join.

    Latitude ring = radius/111.2 km-per-degree. Longitude ring uses
    the EXACT spherical bound λ_max = 2·asin(sin(ρ/2)/cos φ) at the
    band's extreme |lat| (the linear ρ/cos φ bound UNDER-covers at
    high latitude); when sin-ratio ≥ 1 the radius wraps the pole and
    every longitude qualifies. Longitude WRAPS at ±180° (pmod ring
    indices; array_distinct collapses full-circle rings)."""
    import math

    nx, ny = GRID.grid_dims(cell_deg)
    lat_deg = radius_km / _KM_PER_DEG
    r_lat_cells = max(1, math.ceil(lat_deg / cell_deg))
    extreme = F.least(F.abs(F.col("qy")) + F.lit(lat_deg), F.lit(89.99))
    rad = F.lit(3.141592653589793 / 180.0)
    sin_half = F.lit(math.sin(min(radius_km, 3.0 * EARTH_RADIUS_KM) /
                              (2.0 * EARTH_RADIUS_KM)))
    ratio = sin_half / F.cos(extreme * rad)
    lon_deg = F.asin(F.least(ratio, F.lit(1.0))) * F.lit(2.0) / rad + F.lit(1e-9)
    # full-circle cover when the ball reaches within 0.01° of the pole
    # (the extreme-latitude clamp would otherwise under-cover tiny
    # radii right at the pole: cross-pole neighbors sit at dlon=180°)
    # or when the sin-ratio bound wraps
    rx = F.when(
        (ratio >= 1.0)
        | (F.abs(F.col("qy")) + F.lit(lat_deg) >= F.lit(89.99)),
        F.lit(int(nx)).cast("long"),
    ).otherwise(F.ceil(lon_deg / F.lit(cell_deg)).cast("long"))
    cx_idx = GRID.cell_x_col(F.col("qx"), cell_deg)
    cy_idx = GRID.cell_y_col(F.col("qy"), cell_deg)
    return q.withColumn(
        "ring_x",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(cx_idx - rx, cx_idx + rx),
                    lambda x: F.pmod(x, F.lit(int(nx))),
                )
            )
        ),
    ).withColumn(
        "ring_y",
        F.explode(
            F.sequence(
                F.greatest(cy_idx - F.lit(r_lat_cells), F.lit(0)),
                F.least(cy_idx + F.lit(r_lat_cells), F.lit(ny - 1)),
            )
        ),
    ).withColumn(
        "cell_id",
        F.col("ring_x").cast("long") * F.lit(4294967296).cast("long")
        + F.col("ring_y").cast("long"),
    ).drop("ring_x", "ring_y")


def dwithin_haversine_join(
    left: DataFrame,
    right: DataFrame,
    radius_km: float,
    left_id: str = "image_id",
    right_id: str = "image_id",
    l_lon: str = "lon",
    l_lat: str = "lat",
    r_lon: str = "lon",
    r_lat: str = "lat",
    cell_deg: float = GRID.DEFAULT_CELL_DEG,
    exclude_self: bool = False,
) -> DataFrame:
    """Great-circle fixed-radius range join. The cell cover is
    POLE-SAFE: the latitude ring is radius/111.2km-per-degree, and the
    longitude ring widens by 1/cos at the band's extreme latitude
    (longitude degrees shrink toward the poles — a fixed Chebyshev
    ring would MISS true neighbors there), and the longitude ring
    WRAPS at ±180° (antimeridian pairs are genuine neighbors on the
    sphere — ring indices pass through pmod; array_distinct collapses
    full-circle rings). Everything stays Catalyst; the per-row
    longitude cover is a per-row sequence bound."""
    q = left.select(
        F.col(left_id).alias("left_id"),
        F.col(l_lon).alias("qx"),
        F.col(l_lat).alias("qy"),
    )
    c = right.select(
        F.col(right_id).alias("right_id"),
        F.col(r_lon).alias("cx"),
        F.col(r_lat).alias("cy"),
    ).withColumn("cell_id", GRID.cell_id_col(F.col("cx"), F.col("cy"), cell_deg))

    ringed = _haversine_ring_cover(q, radius_km, cell_deg)
    cand = ringed.join(c, on="cell_id")
    if exclude_self:
        cand = cand.where(F.col("left_id") != F.col("right_id"))
    return cand.withColumn(
        "dist_km",
        _haversine_km(F.col("qx"), F.col("qy"), F.col("cx"), F.col("cy")),
    ).where(F.col("dist_km") <= F.lit(float(radius_km))).select(
        "left_id", "right_id", "dist_km"
    )


def knn_haversine_join(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    query_id: str = "image_id",
    cand_id: str = "image_id",
    q_lon: str = "lon",
    q_lat: str = "lat",
    c_lon: str = "lon",
    c_lat: str = "lat",
    cell_deg: float = GRID.DEFAULT_CELL_DEG,
    initial_radius_km: float | str = "auto",
    exclude_self: bool = False,
    stats: dict | None = None,
) -> DataFrame:
    """Great-circle kNN: radius-doubling rounds over the spherical
    cell cover (pole-safe, antimeridian-wrapping — the same cover as
    dwithin_haversine_join). A query SETTLES when it has ≥k candidates
    and its k-th distance is STRICTLY inside the covered radius (the
    cover is a superset of the radius ball, so every unseen candidate
    is farther). Returns (query_id, neighbor_id, rank, dist_km);
    ties break by neighbor_id."""
    import math

    global_cover_km = 180.0 * _KM_PER_DEG + 1.0  # whole globe covered
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(q_lon).alias("qx"),
        F.col(q_lat).alias("qy"),
    )
    c = candidates.select(
        F.col(cand_id).alias("neighbor_id"),
        F.col(c_lon).alias("cx"),
        F.col(c_lat).alias("cy"),
    ).withColumn("cell_id", GRID.cell_id_col(F.col("cx"), F.col("cy"), cell_deg))

    if initial_radius_km == "auto":
        r0 = _auto_ring_cells(c, k, cell_deg, 1 << 30)
        initial_radius_km = r0 * cell_deg * _KM_PER_DEG

    w = Window.partitionBy("query_id").orderBy("dist_km", "neighbor_id")
    if stats is not None:
        stats["initial_radius_km"] = float(initial_radius_km)
        stats["rounds"] = 0
    settled_parts: list[DataFrame] = []
    # same count-based round bookkeeping as the planar loop: the input
    # is checkpointed once, each round checkpoints only the flagged
    # top-k; remaining stays a lazy anti-join chain over checkpoints
    # and the loop exits on settled-count arithmetic (2 jobs per
    # round instead of 3)
    remaining = q.localCheckpoint(eager=True)
    n_remaining = remaining.count()  # cheap: reads the checkpoint cache
    radius = float(initial_radius_km)
    while True:
        if stats is not None:
            stats["rounds"] += 1
        ringed = _haversine_ring_cover(remaining, radius, cell_deg)
        cand = ringed.join(c, on="cell_id")
        if exclude_self:
            cand = cand.where(F.col("query_id") != F.col("neighbor_id"))
        scored = cand.withColumn(
            "dist_km",
            _haversine_km(F.col("qx"), F.col("qy"), F.col("cx"), F.col("cy")),
        )
        topk = (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "dist_km")
        )
        if radius >= global_cover_km:
            settled_parts.append(topk)
            break
        # ONE job per round: the settled test rides the same window
        # partitioning as the top-k (count/max over partitionBy
        # query_id reuse the row_number exchange), so top-k + settle
        # classification materialize in a single checkpoint instead of
        # a checkpoint + groupBy + two derived jobs (round-3 shape).
        wq = Window.partitionBy("query_id")
        flagged = topk.withColumn(
            "settled",
            (F.count(F.lit(1)).over(wq) >= k)
            & (F.max("dist_km").over(wq) < F.lit(radius)),
        ).localCheckpoint(eager=True)
        settled_parts.append(
            flagged.where("settled").drop("settled")
        )
        settled_ids = flagged.where("settled").select("query_id").distinct()
        n_remaining -= settled_ids.count()
        if n_remaining <= 0:
            break
        remaining = remaining.join(settled_ids, on="query_id", how="left_anti")
        radius *= 2
    out = settled_parts[0]
    for part in settled_parts[1:]:
        out = out.unionByName(part)
    return out


def dwithin_join(
    left: DataFrame,
    right: DataFrame,
    radius: float,
    left_id: str = "image_id",
    right_id: str = "image_id",
    l_lon: str = "lon",
    l_lat: str = "lat",
    r_lon: str = "lon",
    r_lat: str = "lat",
    cell_deg: float = GRID.DEFAULT_CELL_DEG,
    exclude_self: bool = False,
    metric: str = "planar",  # planar | haversine
) -> DataFrame:
    """Fixed-radius range join (the `dwithin` predicate of the
    registry, SURVEY.md §2.5): all (left, right) pairs with planar
    euclidean distance ≤ radius. Filter phase = ring-cell equi-join
    covering the radius (pure Catalyst); refine = the distance
    comparison itself (also Catalyst — zero Python end to end).

    ``metric='planar'`` is euclidean on raw lon/lat degrees with NO
    longitude wrap (antimeridian pairs are ~360° apart, matching the
    planar oracle).

    WARNING: for GLOBAL-EXTENT geographic data (anything that can
    straddle the antimeridian or approach the poles) pass
    ``metric='haversine'`` — the planar default will miss true
    cross-antimeridian neighbors entirely. 'haversine' routes to
    ``dwithin_haversine_join``; ``radius`` is then km and the cover
    wraps ±180° and the poles."""
    import math

    if metric == "haversine":
        return dwithin_haversine_join(
            left, right, radius, left_id=left_id, right_id=right_id,
            l_lon=l_lon, l_lat=l_lat, r_lon=r_lon, r_lat=r_lat,
            cell_deg=cell_deg, exclude_self=exclude_self,
        )
    if metric != "planar":
        raise ValueError(f"unknown metric {metric!r}")

    r_cells = max(1, math.ceil(radius / cell_deg))
    q = left.select(
        F.col(left_id).alias("left_id"),
        F.col(l_lon).alias("qx"),
        F.col(l_lat).alias("qy"),
    )
    c = right.select(
        F.col(right_id).alias("right_id"),
        F.col(r_lon).alias("cx"),
        F.col(r_lat).alias("cy"),
    ).withColumn("cell_id", GRID.cell_id_col(F.col("cx"), F.col("cy"), cell_deg))
    ringed = _ring_cells(q, r_cells, cell_deg)
    cand = ringed.join(c, on="cell_id")
    if exclude_self:
        cand = cand.where(F.col("left_id") != F.col("right_id"))
    dx = F.col("qx") - F.col("cx")
    dy = F.col("qy") - F.col("cy")
    return cand.withColumn("dist", F.sqrt(dx * dx + dy * dy)).where(
        F.col("dist") <= F.lit(float(radius))
    ).select("left_id", "right_id", "dist")


def knn_join(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    query_id: str = "image_id",
    cand_id: str = "image_id",
    q_lon: str = "lon",
    q_lat: str = "lat",
    c_lon: str = "lon",
    c_lat: str = "lat",
    cell_deg: float = GRID.DEFAULT_CELL_DEG,
    initial_ring: int | str = "auto",
    max_ring: int | None = None,
    exclude_self: bool = False,
    stats: dict | None = None,
    metric: str = "planar",  # planar | haversine
) -> DataFrame:
    """k nearest candidates per query point. Returns
    ``(query_id, neighbor_id, rank, dist)``; ties broken by
    neighbor_id ascending (deterministic, oracle-matching).

    ``initial_ring='auto'`` sizes the first ring from candidate
    density (one cheap aggregate over the candidate layer) so the
    first round settles the bulk of queries without per-query tuning.

    ``metric``: 'planar' treats lon/lat as plain x/y — euclidean
    degrees, NO longitude wrap (two points across the antimeridian
    are ~360° apart, exactly as the planar oracle computes them).

    WARNING: for GLOBAL-EXTENT geographic data (anything that can
    straddle the antimeridian or approach the poles) pass
    ``metric='haversine'`` — the planar default will rank true
    cross-antimeridian neighbors as ~360° away and under-count
    high-latitude neighborhoods. 'haversine' routes to
    ``knn_haversine_join`` (wrapping, pole-safe spherical cover;
    ``dist`` is then great-circle km)."""
    if metric == "haversine":
        # ring/radius knobs are metric-specific: reject explicit
        # planar-cell arguments instead of silently dropping them
        if initial_ring != "auto" or max_ring is not None:
            raise ValueError(
                "initial_ring/max_ring are planar-grid knobs; use "
                "knn_haversine_join(initial_radius_km=...) directly"
            )
        return knn_haversine_join(
            queries, candidates, k=k, query_id=query_id, cand_id=cand_id,
            q_lon=q_lon, q_lat=q_lat, c_lon=c_lon, c_lat=c_lat,
            cell_deg=cell_deg, exclude_self=exclude_self, stats=stats,
        )
    if metric != "planar":
        raise ValueError(f"unknown metric {metric!r}")
    nx, ny = GRID.grid_dims(cell_deg)
    max_ring = max_ring or max(nx, ny)
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(q_lon).alias("qx"),
        F.col(q_lat).alias("qy"),
    )
    c = candidates.select(
        F.col(cand_id).alias("neighbor_id"),
        F.col(c_lon).alias("cx"),
        F.col(c_lat).alias("cy"),
    ).withColumn("cell_id", GRID.cell_id_col(F.col("cx"), F.col("cy"), cell_deg))

    if initial_ring == "auto":
        initial_ring = _auto_ring_cells(c, k, cell_deg, max_ring)
    if stats is not None:
        stats["initial_ring"] = initial_ring
        stats["rounds"] = 0

    w = Window.partitionBy("query_id").orderBy("dist", "neighbor_id")
    settled_parts: list[DataFrame] = []
    # Round bookkeeping by COUNT, not by materialization: the input is
    # checkpointed ONCE (an expensive upstream plan must not re-run per
    # round), then the remaining-queries frame stays a lazy anti-join
    # chain over per-round checkpoints (depth = rounds, each parent
    # materialized — no exponential regrowth) and the loop exits on
    # settled-count arithmetic instead of a per-round isEmpty job + a
    # per-round remaining checkpoint job (3 jobs per round → 2).
    remaining = q.localCheckpoint(eager=True)
    n_remaining = remaining.count()  # cheap: reads the checkpoint cache
    r = initial_ring
    while True:
        if stats is not None:
            stats["rounds"] += 1
        ringed = _ring_cells(remaining, r, cell_deg)
        cand = ringed.join(c, on="cell_id")
        if exclude_self:
            cand = cand.where(F.col("query_id") != F.col("neighbor_id"))
        # plain *, not pow(): basic IEEE ops are bit-identical across
        # Spark and the DuckDB oracle
        dx = F.col("qx") - F.col("cx")
        dy = F.col("qy") - F.col("cy")
        scored = cand.withColumn("dist", F.sqrt(dx * dx + dy * dy))
        topk = (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", F.col("dist"))
        )
        if r >= max_ring:
            settled_parts.append(topk)
            break
        # settled: k found and k-th dist STRICTLY within the guaranteed
        # radius. Ring r only guarantees unseen candidates lie at
        # dist > r*cell_deg in exact arithmetic; after float rounding
        # an unseen candidate's dist can collapse to exactly r*cell_deg
        # and tie-break ahead of a kept one — strict '<' closes that
        # hole at the cost of one extra round for exact-boundary kth.
        # The settle test rides the SAME window partitioning as the
        # top-k (count/max over partitionBy query_id reuse the
        # row_number exchange): ONE materializing job per round
        # instead of round-3's checkpoint + groupBy + derived jobs.
        wq = Window.partitionBy("query_id")
        flagged = topk.withColumn(
            "settled",
            (F.count(F.lit(1)).over(wq) >= k)
            & (F.max("dist").over(wq) < F.lit(float(r) * cell_deg)),
        ).localCheckpoint(eager=True)
        settled_parts.append(flagged.where("settled").drop("settled"))
        settled_ids = flagged.where("settled").select("query_id").distinct()
        # one cheap job against the checkpoint cache; queries with
        # ZERO candidates this round are absent from flagged, so the
        # remaining count must be tracked by subtraction, not derived
        # from flagged alone
        n_remaining -= settled_ids.count()
        if n_remaining <= 0:
            break
        remaining = remaining.join(settled_ids, on="query_id", how="left_anti")
        r *= 2
    out = settled_parts[0]
    for part in settled_parts[1:]:
        out = out.unionByName(part)
    return out
