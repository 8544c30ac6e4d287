"""Point→nearest-line-segment snap join (map-matching primitive).

The reference's join family is point-in-polygon and box overlap
(src/spatial_join.cpp); the natural next member a geospatial user
reaches for is "snap each point to the nearest road within radius r"
— candidate generation is the SAME grid filter phase (tests/main.cpp
same-cell scoping), only the refine changes from containment to
point-to-segment distance.

Plan shape (the one you'd want at 10^12 points):

* points → one covering cell each, pure-Catalyst floor arithmetic;
* segments → the few cells their r-expanded bbox covers (bounded
  explode: segment extent and r are both small vs the cell size);
* equi-join on (cx, cy). A point lives in exactly ONE cell, so a
  (point, segment) pair meets exactly once — no DISTINCT pass;
* refine INSIDE codegen: the squared point-to-segment distance is
  ranked by the exact integer key

      d2_scaled = floor(cross² · 2^20 / len2)           (interior)
                = |P-endpoint|² · 2^20                   (clamped)

  computed in decimal(38,0) → long. cross² ≤ ~4.1e15 for same-cell
  candidates and cross²·2^20 ≤ ~4.3e21 < 10^38, so the arithmetic is
  EXACT in both engines (Spark decimal `div`, DuckDB HUGEINT `//`
  — cross-checked bit-for-bit); no float enters the ranking. Two
  true distances can share a floor'd key only when they differ by
  < 2^-20 milli² — the (key, seg_id) tiebreak then picks the same
  winner in both engines, which is the contract that matters;
* per-point argmin: ONE exchange, min(struct(key, seg_id)).

The DuckDB oracle (sql_nearest_segment) deliberately runs a
DIFFERENT plan — a brute-force r-expanded bbox range join with
HUGEINT keys — so the contract also validates the cell decomposition
itself, not just the refine formula.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SNAP_RADIUS = 4_000  # millidegrees
SNAP_CELL = 8_192  # millidegrees; must exceed segment extent + radius
_SCALE = 1 << 20

# segment extent is bounded by construction (tables.supplier_segments:
# offsets in ±4000); candidates are pre-filtered to the same cell, so
# |px-x1| ≤ extent + cell ≤ ~2e4 and cross ≤ 2·extent·2e4 ≈ 1.6e8 →
# cross² ≈ 2.6e16 (int64), ·2^20 ≈ 2.7e22 (decimal 38).

_KEY_SQL = """
CASE
  WHEN (x2-x1)*(x2-x1) + (y2-y1)*(y2-y1) = 0
    OR (px-x1)*(x2-x1) + (py-y1)*(y2-y1) <= 0
  THEN ((px-x1)*(px-x1) + (py-y1)*(py-y1)) * {scale}
  WHEN (px-x1)*(x2-x1) + (py-y1)*(y2-y1)
       >= (x2-x1)*(x2-x1) + (y2-y1)*(y2-y1)
  THEN ((px-x2)*(px-x2) + (py-y2)*(py-y2)) * {scale}
  ELSE CAST((CAST((x2-x1)*(py-y1) - (y2-y1)*(px-x1) AS DECIMAL(19,0))
             * ((x2-x1)*(py-y1) - (y2-y1)*(px-x1)) * {scale})
            div ((x2-x1)*(x2-x1) + (y2-y1)*(y2-y1)) AS BIGINT)
END
"""


def _fd(col, g: int):
    # floor division for possibly-negative int64 by positive g:
    # subtract the nonnegative pmod first, then the division is exact
    return ((col - F.pmod(col, F.lit(g))) / F.lit(g)).cast("long")


def nearest_segment_join(
    points: DataFrame,
    segments: DataFrame,
    radius: int = SNAP_RADIUS,
    cell: int = SNAP_CELL,
) -> DataFrame:
    """For each point (point_id, mx, my — int64 milli), the nearest
    segment (seg_id, x1, y1, x2, y2 — int64 milli) within ``radius``,
    as (point_id, seg_id, d2_scaled). ``cell`` must be ≥ the maximum
    segment extent + radius so the covering-cell explode is bounded
    (≤ 3×3 cells per segment).
    Zero Python anywhere — tessellation, refine, and argmin are all
    Catalyst."""
    pts = points.select(
        "point_id",
        F.col("mx").alias("px"),
        F.col("my").alias("py"),
        _fd(F.col("mx"), cell).alias("cx"),
        _fd(F.col("my"), cell).alias("cy"),
    )
    r = F.lit(radius)
    segs = (
        segments.select(
            "seg_id",
            "x1",
            "y1",
            "x2",
            "y2",
            (F.least("x1", "x2") - r).alias("minx"),
            (F.greatest("x1", "x2") + r).alias("maxx"),
            (F.least("y1", "y2") - r).alias("miny"),
            (F.greatest("y1", "y2") + r).alias("maxy"),
        )
        .withColumn(
            "cx",
            F.explode(
                F.sequence(_fd(F.col("minx"), cell), _fd(F.col("maxx"), cell))
            ),
        )
        .withColumn(
            "cy",
            F.explode(
                F.sequence(_fd(F.col("miny"), cell), _fd(F.col("maxy"), cell))
            ),
        )
        .drop("minx", "maxx", "miny", "maxy")
    )
    key = F.expr(_KEY_SQL.format(scale=_SCALE))
    cands = (
        pts.join(segs, on=["cx", "cy"])
        .withColumn("d2_scaled", key)
        .where(F.col("d2_scaled") <= F.lit(radius * radius * _SCALE))
    )
    best = (
        cands.groupBy("point_id")
        .agg(F.min(F.struct("d2_scaled", "seg_id")).alias("b"))
        .select(
            "point_id",
            F.col("b.seg_id").alias("seg_id"),
            F.col("b.d2_scaled").alias("d2_scaled"),
        )
    )
    return best


def sql_nearest_segment(
    points_sql: str, segments_sql: str, radius: int = SNAP_RADIUS
) -> str:
    """DuckDB twin — brute-force expanded-bbox range join + HUGEINT
    exact keys (a genuinely different candidate plan from the
    engine's cell decomposition)."""
    key = (
        "CASE "
        "WHEN (x2-x1)*(x2-x1) + (y2-y1)*(y2-y1) = 0 "
        "  OR (px-x1)*(x2-x1) + (py-y1)*(y2-y1) <= 0 "
        f"THEN ((px-x1)*(px-x1) + (py-y1)*(py-y1)) * {_SCALE} "
        "WHEN (px-x1)*(x2-x1) + (py-y1)*(y2-y1) "
        "     >= (x2-x1)*(x2-x1) + (y2-y1)*(y2-y1) "
        f"THEN ((px-x2)*(px-x2) + (py-y2)*(py-y2)) * {_SCALE} "
        "ELSE (CAST((x2-x1)*(py-y1) - (y2-y1)*(px-x1) AS HUGEINT) "
        "      * ((x2-x1)*(py-y1) - (y2-y1)*(px-x1)) "
        f"     * {_SCALE}) "
        "     // ((x2-x1)*(x2-x1) + (y2-y1)*(y2-y1)) "
        "END"
    )
    return (
        f"WITH p AS (SELECT point_id, mx AS px, my AS py "
        f"FROM ({points_sql}) t), "
        f"s AS ({segments_sql}), "
        f"cand AS (SELECT p.point_id, s.seg_id, px, py, x1, y1, x2, y2 "
        f"FROM p JOIN s "
        f"ON px BETWEEN LEAST(x1, x2) - {radius} "
        f"AND GREATEST(x1, x2) + {radius} "
        f"AND py BETWEEN LEAST(y1, y2) - {radius} "
        f"AND GREATEST(y1, y2) + {radius}), "
        f"k AS (SELECT point_id, seg_id, {key} AS d2_scaled FROM cand), "
        f"f AS (SELECT point_id, seg_id, d2_scaled, ROW_NUMBER() OVER ("
        f"PARTITION BY point_id ORDER BY d2_scaled, seg_id) AS rn "
        f"FROM k WHERE d2_scaled <= {radius * radius * _SCALE}) "
        f"SELECT point_id, seg_id, CAST(d2_scaled AS BIGINT) AS d2_scaled "
        f"FROM f WHERE rn = 1"
    )
