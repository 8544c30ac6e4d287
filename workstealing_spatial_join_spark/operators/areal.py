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
