"""Areal interpolation: area-weighted transfer of a zone measure
onto a regular tile grid (the GIS "areal interpolation" primitive —
e.g. census counts → map tiles, population → pixels).

Each zone rectangle carries an integer measure; every tile it
overlaps receives ``floor(measure · overlap_area / zone_area)`` and
the per-tile output is the sum of those exact integer transfers plus
the contributing-zone count. All arithmetic is int64:

* overlap per axis is ``min(hi, (t+1)·T) − max(lo, t·T)`` clamped ≥0
  (zone rects are closed, tiles half-open — measure-theoretically the
  boundary has zero area, so the convention only matters for
  degenerate zero-extent zones, which the generator never produces);
* ``overlap_area ≤ T²`` and ``zone_area`` are ≤ ~2.5e7 for the milli
  layers, so ``measure · overlap_area`` stays far below 2^63;
* the per-(zone,tile) floor division is exact integer `div` / `//`
  with both operands positive — truncation IS floor.

Floor-truncation means a zone's transfers sum to ≤ its measure (mass
deficit < n_tiles_covered); this is the documented convention, shared
bit-for-bit by both engines — callers needing exact mass conservation
assign the residual to the zone's reference tile downstream.

Scale shape: one bounded map-side double explode (a zone covers
``(extent/T + 2)²`` tiles — ≤ 9 for the milli layers at the default
tile) and ONE groupBy exchange on (tx, ty). No join at all: the tile
grid is implicit in the floor arithmetic, exactly like tile_assign
(reference parity: the reference's fixed-grid partitioner,
src/partition.cpp — here the grid IS the aggregation key, not a
partitioning detail).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

AREAL_TILE = 4_096  # milli; ≥ half the max zone extent → ≤ 3×3 cover


def _fd(a: str, b: int, dialect: str) -> str:
    """Floor division of a possibly-negative integer expression."""
    m = f"(((({a}) % {b}) + {b}) % {b})"
    op = "//" if dialect == "duckdb" else "div"
    return f"((({a}) - {m}) {op} {b})"


def areal_transfer(
    zones: DataFrame, tile: int = AREAL_TILE
) -> DataFrame:
    """``zones``: (zone_id, zminx, zminy, zmaxx, zmaxy, measure) all
    int64. Returns (tx, ty, n_zones, transferred) — the area-weighted
    integer share of every overlapping zone's measure, per tile."""
    op = "div"
    z = zones.withColumn("zarea", F.expr("(zmaxx - zminx) * (zmaxy - zminy)"))
    z = z.withColumn(
        "tx",
        F.explode(
            F.sequence(
                F.expr(_fd("zminx", tile, "spark")),
                F.expr(_fd("zmaxx", tile, "spark")),
            )
        ),
    ).withColumn(
        "ty",
        F.explode(
            F.sequence(
                F.expr(_fd("zminy", tile, "spark")),
                F.expr(_fd("zmaxy", tile, "spark")),
            )
        ),
    )
    ox = f"(LEAST(zmaxx, (tx + 1) * {tile}) - GREATEST(zminx, tx * {tile}))"
    oy = f"(LEAST(zmaxy, (ty + 1) * {tile}) - GREATEST(zminy, ty * {tile}))"
    share = f"((measure * ({ox} * {oy})) {op} zarea)"
    return (
        z.where(F.expr(f"{ox} > 0 AND {oy} > 0"))
        .groupBy("tx", "ty")
        .agg(
            F.count(F.lit(1)).alias("n_zones"),
            F.sum(F.expr(share)).cast("long").alias("transferred"),
        )
    )


def sql_areal_transfer(zones_sql: str, tile: int = AREAL_TILE) -> str:
    """DuckDB twin: identical floor arithmetic, lateral
    generate_series explode instead of Spark's sequence+explode."""
    ox = f"(LEAST(zmaxx, (tx + 1) * {tile}) - GREATEST(zminx, tx * {tile}))"
    oy = f"(LEAST(zmaxy, (ty + 1) * {tile}) - GREATEST(zminy, ty * {tile}))"
    return (
        f"WITH z AS ({zones_sql}), "
        f"c AS (SELECT zone_id, zminx, zminy, zmaxx, zmaxy, measure, "
        f"(zmaxx - zminx) * (zmaxy - zminy) AS zarea, tx, ty FROM z, "
        f"UNNEST(generate_series({_fd('zminx', tile, 'duckdb')}, "
        f"{_fd('zmaxx', tile, 'duckdb')})) AS gx(tx), "
        f"UNNEST(generate_series({_fd('zminy', tile, 'duckdb')}, "
        f"{_fd('zmaxy', tile, 'duckdb')})) AS gy(ty)) "
        f"SELECT tx, ty, COUNT(*) AS n_zones, "
        f"CAST(SUM((measure * ({ox} * {oy})) // zarea) AS BIGINT) "
        f"AS transferred "
        f"FROM c WHERE {ox} > 0 AND {oy} > 0 GROUP BY tx, ty"
    )


IDW_CELL = 8_192          # milli; nodes are cell centers
IDW_W_SCALE = 1 << 30     # weight numerator
IDW_EPS2 = 1 << 20        # regularization: d² floor (smoothing ε²)


def idw_surface(
    points: DataFrame,
    x_col: str = "mx",
    y_col: str = "my",
    value_col: str = "cents",
    cell: int = IDW_CELL,
    radius: int = 1,
) -> DataFrame:
    """Regularized inverse-distance-weighted interpolation of a
    point measure onto grid nodes (cell centers) — the classic IDW
    surface with the standard ε-regularization (Shepard's method
    with a smoothing floor, which also caps the weight so the sum
    stays in int64).

    Every node within ``radius`` cells (Chebyshev) of a point
    receives weight ``w = W_SCALE div (ε² + d²)`` from it — an exact
    int64 both engines compute identically (w ≤ W_SCALE/ε² = 1024 at
    the defaults) — and the node value is the exact FLOOR of
    Σw·v / Σw, computed sign-portably as
    ``(wsum − ((wsum % wtot + wtot) % wtot)) / wtot`` (Spark ``div``
    truncates and DuckDB ``//`` floors; subtracting the positive
    Euclidean remainder first makes the quotient exact in both, so
    NEGATIVE measures are fine). Nodes receive a row iff some point
    is within the radius.

    Overflow bound: |w·v| ≤ 1024·|v|; with |v| ≤ 10⁶ the node sum
    holds ~10⁴ points per node before nearing 2^63 — size ``cell``
    so node fan-in stays below that (the caller's density contract).

    Scale shape: one bounded map-side (2·radius+1)² explode per
    point, ONE groupBy exchange on the node key. No join — node
    positions are implicit in the grid arithmetic, exactly like
    areal_transfer."""
    half = cell // 2
    fd_x = f"(({x_col}) - (((({x_col}) % {cell}) + {cell}) % {cell})) div {cell}"
    fd_y = f"(({y_col}) - (((({y_col}) % {cell}) + {cell}) % {cell})) div {cell}"
    p = points.select(
        F.col(x_col), F.col(y_col),
        F.col(value_col).cast("long").alias("v"),
        F.expr(fd_x).alias("cx"), F.expr(fd_y).alias("cy"),
    )
    offs = f"sequence({-radius}, {radius})"
    p = (
        p.withColumn("ox", F.explode(F.expr(offs)))
        .withColumn("oy", F.explode(F.expr(offs)))
        .withColumn("nx", F.col("cx") + F.col("ox"))
        .withColumn("ny", F.col("cy") + F.col("oy"))
    )
    d2 = (
        f"(({x_col}) - (nx * {cell} + {half})) * "
        f"(({x_col}) - (nx * {cell} + {half})) + "
        f"(({y_col}) - (ny * {cell} + {half})) * "
        f"(({y_col}) - (ny * {cell} + {half}))"
    )
    w = f"({IDW_W_SCALE} div ({IDW_EPS2} + {d2}))"
    agg = (
        p.groupBy("nx", "ny")
        .agg(
            F.count(F.lit(1)).alias("n_pts"),
            F.sum(F.expr(f"{w} * v")).cast("long").alias("wsum"),
            F.sum(F.expr(w)).cast("long").alias("wtot"),
        )
        .where(F.col("wtot") > 0)
    )
    return agg.select(
        "nx", "ny", "n_pts",
        F.expr(
            "(wsum - (((wsum % wtot) + wtot) % wtot)) div wtot"
        ).cast("long").alias("idw_value"),
    )


def sql_idw_surface(
    points_sql: str,
    x_col: str = "mx",
    y_col: str = "my",
    value_col: str = "cents",
    cell: int = IDW_CELL,
    radius: int = 1,
) -> str:
    """DuckDB twin of :func:`idw_surface`."""
    half = cell // 2
    fd_x = f"(({x_col}) - (((({x_col}) % {cell}) + {cell}) % {cell})) // {cell}"
    fd_y = f"(({y_col}) - (((({y_col}) % {cell}) + {cell}) % {cell})) // {cell}"
    d2 = (
        f"(({x_col}) - (nx * {cell} + {half})) * "
        f"(({x_col}) - (nx * {cell} + {half})) + "
        f"(({y_col}) - (ny * {cell} + {half})) * "
        f"(({y_col}) - (ny * {cell} + {half}))"
    )
    w = f"({IDW_W_SCALE} // ({IDW_EPS2} + {d2}))"
    return (
        f"WITH p AS (SELECT {x_col}, {y_col}, "
        f"CAST({value_col} AS BIGINT) AS v, "
        f"{fd_x} AS cx, {fd_y} AS cy FROM ({points_sql}) src), "
        f"ex AS (SELECT {x_col}, {y_col}, v, cx + ox AS nx, cy + oy AS ny "
        f"FROM p, UNNEST(generate_series({-radius}, {radius})) AS tx(ox), "
        f"UNNEST(generate_series({-radius}, {radius})) AS ty(oy)), "
        f"a AS (SELECT nx, ny, COUNT(*) AS n_pts, "
        f"CAST(SUM({w} * v) AS BIGINT) AS wsum, "
        f"CAST(SUM({w}) AS BIGINT) AS wtot FROM ex GROUP BY nx, ny) "
        f"SELECT nx, ny, n_pts, "
        f"CAST((wsum - (((wsum % wtot) + wtot) % wtot)) // wtot AS BIGINT) "
        f"AS idw_value FROM a WHERE wtot > 0"
    )
