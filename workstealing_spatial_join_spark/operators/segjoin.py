"""Segment × segment intersection join (line-layer self-join).

"Which roads cross which" — the lineal self-join the reference's
GEOS-backed `ST_Intersects` path answers for polyline layers
(reference: src/spatial_join.cpp builds an STRtree over layer A and
probes `intersects` per feature of layer B; the predicate itself is
GEOS). Here the predicate is the classic integer orientation test
(CLRS §33.1 / de Berg et al. §2.1) — with int64 coordinates every
quantity below is exact, so the WHOLE join is pure Catalyst: no GEOS,
no Python, no floats.

For segments A = A1A2 and B = B1B2 let

    d1 = cross(A1, A2, B1)   d2 = cross(A1, A2, B2)
    d3 = cross(B1, B2, A1)   d4 = cross(B1, B2, A2)

where ``cross(P, Q, R) = (Qx-Px)(Ry-Py) - (Qy-Py)(Rx-Px)``. The
segments PROPERLY cross iff d1,d2 have strict opposite signs AND
d3,d4 have strict opposite signs; they TOUCH (endpoint on the other
segment, shared endpoint, or collinear overlap) iff some ``di = 0``
and the corresponding point lies inside the other segment's bbox
(exact given collinearity, which ``di = 0`` certifies). Degenerate
point-segments fall out of the same predicate (a point touches a
segment iff it is collinear and inside the bbox; two points intersect
iff equal). Coordinate bound: the fixtures keep |coord| ≤ ~2e5 milli
and extents ≤ cell, so each cross term is ≤ ~4e5·4e5 — far inside
int64 for any planet-scale integer-milli layer.

Scale shape (the 10^12-segment lens): both sides take the same grid
filter phase as every join in this engine — a bounded ≤2×2
covering-cell explode (``cell`` ≥ the layer's max extent), ONE
equi-join on the cell with ``seg_a < seg_b``, and REFERENCE-POINT
pair dedup (the pair's bbox-intersection min corner lies in both
covering sets, so exactly one cell emits it — no DISTINCT shuffle).
The oracle instead takes a brute bbox range join with the identical
predicate, so the contract validates the decomposition AND the
refine independently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROAD_CELL = 1_024  # ≥ the road layer's max per-axis extent (1000)


def _fd(a: str, b: int, dialect: str) -> str:
    """Exact floor division for possibly-negative int64 SQL
    expressions, portable across Spark (truncating ``div``) and
    DuckDB (flooring ``//``): subtract the Euclidean remainder first
    so both tokens agree."""
    m = f"(((({a}) % {b}) + {b}) % {b})"
    op = "//" if dialect == "duckdb" else "div"
    return f"((({a}) - {m}) {op} {b})"


def intersect_exprs() -> dict[str, str]:
    """The orientation-test pipeline as named SQL expressions over
    columns (ax1, ay1, ax2, ay2, bx1, by1, bx2, by2) — identical text
    for Spark and DuckDB (comparisons and int64 products only; no
    division anywhere). Later entries reference earlier aliases, so
    apply them in order (withColumn / chained CTEs)."""

    def cross(px, py, qx, qy, rx, ry):
        return (
            f"(({qx} - {px}) * ({ry} - {py}) - "
            f"({qy} - {py}) * ({rx} - {px}))"
        )

    def on_bbox(px, py, x1, y1, x2, y2):
        # exact on-segment test GIVEN collinearity (the caller pairs
        # this with the matching d = 0)
        return (
            f"({px} BETWEEN LEAST({x1}, {x2}) AND GREATEST({x1}, {x2}) "
            f"AND {py} BETWEEN LEAST({y1}, {y2}) AND GREATEST({y1}, {y2}))"
        )

    return {
        "d1": cross("ax1", "ay1", "ax2", "ay2", "bx1", "by1"),
        "d2": cross("ax1", "ay1", "ax2", "ay2", "bx2", "by2"),
        "d3": cross("bx1", "by1", "bx2", "by2", "ax1", "ay1"),
        "d4": cross("bx1", "by1", "bx2", "by2", "ax2", "ay2"),
        "proper": (
            "(((d1 > 0 AND d2 < 0) OR (d1 < 0 AND d2 > 0)) AND "
            "((d3 > 0 AND d4 < 0) OR (d3 < 0 AND d4 > 0)))"
        ),
        "touch": (
            "((d1 = 0 AND "
            + on_bbox("bx1", "by1", "ax1", "ay1", "ax2", "ay2")
            + ") OR (d2 = 0 AND "
            + on_bbox("bx2", "by2", "ax1", "ay1", "ax2", "ay2")
            + ") OR (d3 = 0 AND "
            + on_bbox("ax1", "ay1", "bx1", "by1", "bx2", "by2")
            + ") OR (d4 = 0 AND "
            + on_bbox("ax2", "ay2", "bx1", "by1", "bx2", "by2")
            + "))"
        ),
        "hit": "(proper OR touch)",
        "kind": "(CASE WHEN proper THEN 'proper' ELSE 'touch' END)",
    }


def _with_bbox(segments: DataFrame, prefix: str) -> DataFrame:
    p = prefix
    return segments.select(
        F.col("seg_id").alias(f"seg_{p}"),
        F.col("x1").alias(f"{p}x1"),
        F.col("y1").alias(f"{p}y1"),
        F.col("x2").alias(f"{p}x2"),
        F.col("y2").alias(f"{p}y2"),
        F.least("x1", "x2").alias(f"{p}minx"),
        F.greatest("x1", "x2").alias(f"{p}maxx"),
        F.least("y1", "y2").alias(f"{p}miny"),
        F.greatest("y1", "y2").alias(f"{p}maxy"),
    )


def segment_intersection_join(
    segments: DataFrame, cell: int = ROAD_CELL
) -> DataFrame:
    """All intersecting segment pairs of one layer — ``(seg_a,
    seg_b, kind)`` with ``seg_a < seg_b`` and ``kind`` ∈ {'proper',
    'touch'}. segments: (seg_id, x1, y1, x2, y2 — int64 milli) with
    per-axis extent ≤ ``cell`` (keeps the covering explode ≤ 2×2).

    Plan: two bounded map-side explodes, one equi-join on the cell
    key, reference-point dedup, zero Python — the self-join twin of
    :func:`lineclip.clip_fraction_join`."""

    def covering(df: DataFrame, p: str) -> DataFrame:
        return df.withColumn(
            "cx",
            F.explode(
                F.sequence(
                    F.expr(_fd(f"{p}minx", cell, "spark")),
                    F.expr(_fd(f"{p}maxx", cell, "spark")),
                )
            ),
        ).withColumn(
            "cy",
            F.explode(
                F.sequence(
                    F.expr(_fd(f"{p}miny", cell, "spark")),
                    F.expr(_fd(f"{p}maxy", cell, "spark")),
                )
            ),
        )

    a = covering(_with_bbox(segments, "a"), "a")
    b = covering(_with_bbox(segments, "b"), "b")
    pairs = (
        a.join(b, on=["cx", "cy"])
        .where(F.col("seg_a") < F.col("seg_b"))
        .where(
            (F.col("aminx") <= F.col("bmaxx"))
            & (F.col("bminx") <= F.col("amaxx"))
            & (F.col("aminy") <= F.col("bmaxy"))
            & (F.col("bminy") <= F.col("amaxy"))
        )
        .where(
            # reference-point dedup: only the cell holding the
            # bbox-intersection's min corner emits the pair
            (
                F.col("cx")
                == F.expr(_fd("GREATEST(aminx, bminx)", cell, "spark"))
            )
            & (
                F.col("cy")
                == F.expr(_fd("GREATEST(aminy, bminy)", cell, "spark"))
            )
        )
    )
    out = pairs
    for name, expr in intersect_exprs().items():
        out = out.withColumn(name, F.expr(expr))
    return out.where(F.col("hit")).select(
        "seg_a", "seg_b", F.col("kind").cast("string").alias("kind")
    )


def sql_segment_intersections(segments_sql: str) -> str:
    """DuckDB twin — brute bbox range join (a genuinely different
    candidate plan: no grid, no refpoint rule) with the IDENTICAL
    orientation-test refine, so the contract validates the cell
    decomposition and the predicate independently. bbox columns are
    materialized in CTEs, not spelled LEAST/GREATEST inside the join
    condition (DuckDB IEJoin flat-vector assertion — see
    lineclip.sql_clip_fraction)."""
    e = intersect_exprs()
    return (
        f"WITH s0 AS ({segments_sql}), "
        "s AS (SELECT seg_id, x1, y1, x2, y2, "
        "LEAST(x1, x2) AS minx, GREATEST(x1, x2) AS maxx, "
        "LEAST(y1, y2) AS miny, GREATEST(y1, y2) AS maxy FROM s0), "
        "cand AS (SELECT sa.seg_id AS seg_a, sb.seg_id AS seg_b, "
        "sa.x1 AS ax1, sa.y1 AS ay1, sa.x2 AS ax2, sa.y2 AS ay2, "
        "sb.x1 AS bx1, sb.y1 AS by1, sb.x2 AS bx2, sb.y2 AS by2 "
        "FROM s sa JOIN s sb ON sa.seg_id < sb.seg_id "
        "AND sa.minx <= sb.maxx AND sb.minx <= sa.maxx "
        "AND sa.miny <= sb.maxy AND sb.miny <= sa.maxy), "
        f"dd AS (SELECT *, {e['d1']} AS d1, {e['d2']} AS d2, "
        f"{e['d3']} AS d3, {e['d4']} AS d4 FROM cand), "
        f"cls AS (SELECT *, {e['proper']} AS proper, "
        f"{e['touch']} AS touch FROM dd) "
        f"SELECT seg_a, seg_b, CAST({e['kind']} AS VARCHAR) AS kind "
        f"FROM cls WHERE {e['hit']}"
    )
