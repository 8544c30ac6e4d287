"""Segment × zone clip-fraction join (Liang–Barsky in pure Catalyst).

"How much of each road crosses each zone" — the lineal twin of zonal
statistics. For segment P(t) = A + t·(B-A), t ∈ [0,1], the portion
inside an axis-aligned zone is a parameter interval [tlo, thi]; this
operator emits, per overlapping (segment, zone) pair, the FRACTION of
the segment inside the zone as the exact integer
``floor((thi-tlo)·2^20)`` (length-weighted callers multiply by the
segment length).

Every quantity is int64 — no float and no wide decimal:

* per axis, the clip interval is [lo/den, hi/den] with den = |d| > 0
  (Liang–Barsky); a zero-d axis degenerates to "no constraint" or
  "empty", encoded as [0/1, 1/1] or [1/1, 0/1];
* both axes move to the common denominator D = den_x·den_y ≤ 1.6e7
  (segment extents are bounded by construction), so the interval
  intersection is GREATEST/LEAST over int64 ≤ ~1.5e9;
* frac_num = thi_num - tlo_num ≤ D, and frac_num·2^20 ≤ ~1.7e13 —
  the final floor division is exact integer `div` (Spark) / `//`
  (DuckDB), both operands positive so truncation IS floor.

A degenerate point-segment inside a zone clips to fraction 1 (all of
it is inside); a grazing touch clips to fraction 0 and IS emitted
(tlo == thi) — both conventions applied identically in both engines.

Candidates come from the same grid filter phase as every join in this
engine; both sides are multi-cell, so pairs are deduplicated by the
REFERENCE-POINT rule (the intersection bbox's min corner lies in both
bboxes, hence its cell is in both covering sets — emit only there).
At 10^12 segments this is: two bounded map-side explodes, one
equi-join on the cell, zero Python, one filter — no DISTINCT pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CLIP_CELL = 8_192  # ≥ max(segment extent, zone extent) of the layers
_SCALE = 1 << 20


def _fd(a: str, b: int, dialect: str) -> str:
    m = f"(((({a}) % {b}) + {b}) % {b})"
    op = "//" if dialect == "duckdb" else "div"
    return f"((({a}) - {m}) {op} {b})"


def clip_exprs(dialect: str) -> dict[str, str]:
    """The Liang–Barsky integer pipeline as named SQL expressions
    over columns (x1, y1, x2, y2, zminx, zminy, zmaxx, zmaxy) — ONE
    generator for both engines; only the integer-division token
    differs. Later entries reference earlier aliases, so apply them
    in order (withColumn / lateral CTE)."""
    op = "//" if dialect == "duckdb" else "div"

    def axis(d: str, p: str, lo: str, hi: str) -> tuple[str, str, str]:
        den = f"(CASE WHEN {d} = 0 THEN 1 ELSE ABS({d}) END)"
        lo_n = (
            f"(CASE WHEN {d} > 0 THEN {lo} - {p} "
            f"WHEN {d} < 0 THEN {p} - {hi} "
            f"ELSE (CASE WHEN {p} BETWEEN {lo} AND {hi} THEN 0 ELSE 1 END) "
            f"END)"
        )
        hi_n = (
            f"(CASE WHEN {d} > 0 THEN {hi} - {p} "
            f"WHEN {d} < 0 THEN {p} - {lo} "
            f"ELSE (CASE WHEN {p} BETWEEN {lo} AND {hi} THEN 1 ELSE 0 END) "
            f"END)"
        )
        return den, lo_n, hi_n

    den_x, lo_x, hi_x = axis("(x2 - x1)", "x1", "zminx", "zmaxx")
    den_y, lo_y, hi_y = axis("(y2 - y1)", "y1", "zminy", "zmaxy")
    return {
        "den_x": den_x,
        "lo_x": lo_x,
        "hi_x": hi_x,
        "den_y": den_y,
        "lo_y": lo_y,
        "hi_y": hi_y,
        "dd": "(den_x * den_y)",
        "tlo_num": "(GREATEST(0, lo_x * den_y, lo_y * den_x))",
        "thi_num": "(LEAST(dd, hi_x * den_y, hi_y * den_x))",
        "frac_scaled": f"(((thi_num - tlo_num) * {_SCALE}) {op} dd)",
    }


def clip_fraction_join(
    segments: DataFrame, zones: DataFrame, cell: int = CLIP_CELL
) -> DataFrame:
    """Per overlapping (seg_id, zone_id): the exact scaled fraction
    of the segment inside the zone. segments: (seg_id, x1, y1, x2,
    y2 — int64 milli); zones: (zone_id, zminx, zminy, zmaxx, zmaxy —
    int64 milli). ``cell`` must be ≥ both layers' max extent so the
    covering-cell explodes stay ≤ 2×2."""

    def covering(df: DataFrame, lo_x: str, hi_x: str, lo_y: str, hi_y: str):
        return df.withColumn(
            "cx",
            F.explode(
                F.sequence(
                    F.expr(_fd(lo_x, cell, "spark")),
                    F.expr(_fd(hi_x, cell, "spark")),
                )
            ),
        ).withColumn(
            "cy",
            F.explode(
                F.sequence(
                    F.expr(_fd(lo_y, cell, "spark")),
                    F.expr(_fd(hi_y, cell, "spark")),
                )
            ),
        )

    segs = covering(
        segments.select(
            "seg_id",
            "x1",
            "y1",
            "x2",
            "y2",
            F.least("x1", "x2").alias("sminx"),
            F.greatest("x1", "x2").alias("smaxx"),
            F.least("y1", "y2").alias("sminy"),
            F.greatest("y1", "y2").alias("smaxy"),
        ),
        "sminx",
        "smaxx",
        "sminy",
        "smaxy",
    )
    zns = covering(zones, "zminx", "zmaxx", "zminy", "zmaxy")
    pairs = segs.join(zns, on=["cx", "cy"]).where(
        # reference-point dedup: only the cell holding the
        # intersection bbox's min corner emits the pair
        (F.col("cx") == F.expr(_fd("GREATEST(sminx, zminx)", cell, "spark")))
        & (F.col("cy") == F.expr(_fd("GREATEST(sminy, zminy)", cell, "spark")))
    )
    out = pairs
    for name, expr in clip_exprs("spark").items():
        out = out.withColumn(name, F.expr(expr))
    return out.where(F.col("tlo_num") <= F.col("thi_num")).select(
        "seg_id", "zone_id", F.col("frac_scaled").cast("long").alias("frac_scaled")
    )


def sql_clip_fraction(segments_sql: str, zones_sql: str) -> str:
    """DuckDB twin — brute bbox range join (a different candidate
    plan, validating the cell decomposition + refpoint dedup) with
    the SAME integer clip pipeline."""
    e = clip_exprs("duckdb")
    return (
        # bbox columns are materialized in the s CTE rather than
        # spelled LEAST/GREATEST inside the join condition: DuckDB's
        # IEJoin hits an internal "flat vector" assertion on computed
        # range-join keys (observed v1.x); plain column comparisons
        # take the same plan without the bug
        f"WITH s0 AS ({segments_sql}), "
        f"s AS (SELECT seg_id, x1, y1, x2, y2, "
        f"LEAST(x1, x2) AS sminx, GREATEST(x1, x2) AS smaxx, "
        f"LEAST(y1, y2) AS sminy, GREATEST(y1, y2) AS smaxy FROM s0), "
        f"z AS ({zones_sql}), "
        f"cand AS (SELECT seg_id, x1, y1, x2, y2, "
        f"zone_id, zminx, zminy, zmaxx, zmaxy FROM s JOIN z "
        f"ON sminx <= zmaxx AND zminx <= smaxx "
        f"AND sminy <= zmaxy AND zminy <= smaxy), "
        f"ax AS (SELECT *, {e['den_x']} AS den_x, {e['lo_x']} AS lo_x, "
        f"{e['hi_x']} AS hi_x, {e['den_y']} AS den_y, {e['lo_y']} AS lo_y, "
        f"{e['hi_y']} AS hi_y FROM cand), "
        f"dd AS (SELECT *, {e['dd']} AS dd FROM ax), "
        f"iv AS (SELECT *, {e['tlo_num']} AS tlo_num, "
        f"{e['thi_num']} AS thi_num FROM dd) "
        f"SELECT seg_id, zone_id, "
        f"CAST({e['frac_scaled']} AS BIGINT) AS frac_scaled "
        f"FROM iv WHERE tlo_num <= thi_num"
    )
