"""Global spatial autocorrelation — exact-integer Moran's I.

Moran's I over the occupied-cell density raster of a point layer with
binary 8-neighbor (queen) weights: the single most-used global
clustering statistic in spatial analysis (PySAL ``esda.Moran``,
GeoDa's opening move). The reference engine has no statistics layer
at all (its output is a join count — src/spatial_join.cpp); this is
part of the analytics surface a Spark engine adds on top.

    I = (N / W) · Σ_ij w_ij (x_i − x̄)(x_j − x̄) / Σ_i (x_i − x̄)²

Exactness: with integer cell counts x_i, the centered value is kept
RATIONAL by scaling through N — ``z_i = N·x_i − S`` (S = Σx) is an
exact int64, and the N² factors cancel in the ratio. Sums of z
products can exceed int64 at scale (|z| ≤ N·max(x); the num sum is
bounded by W·max|z|², ~2.6e19 at sf1 worst case), so both engines
accumulate in 128-bit-capable types: DECIMAL(38,0) on Spark, HUGEINT
in DuckDB — z itself is cast to DECIMAL(18,0) so the product's
nominal precision (18+18+1 = 37) never hits Spark's 38-digit cap.
The final ratio is emitted in ppm via the engine-portable
sign-portable floor (subtract the Euclidean remainder, then divide:
Spark's truncating ``div`` and DuckDB's flooring ``//`` agree) —
num is negative for dispersed rasters, so sign portability matters.

Scale shape (10^12 points): ONE groupBy exchange builds the cell
raster (map-side combinable counts — the raster, not the points, is
the working set from there on); the neighbor structure is a bounded
×8 map-side explode + ONE equi-join of the raster against itself on
the cell key; the two global aggregates are one-row frames joined by
broadcast. Nothing anywhere is quadratic in cells, and nothing after
the first groupBy touches a point row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from workstealing_spatial_join_spark.operators.graph import GRID_GRAPH_CELL

__all__ = ["cell_counts", "morans_i", "sql_morans_i"]


def _fd(col: str, cell: int, dialect: str) -> str:
    m = f"(((({col}) % {cell}) + {cell}) % {cell})"
    op = "//" if dialect == "duckdb" else "div"
    return f"((({col}) - {m}) {op} {cell})"


def cell_counts(
    points: DataFrame,
    x_col: str = "mx",
    y_col: str = "my",
    cell: int = GRID_GRAPH_CELL,
) -> DataFrame:
    """Point layer → the sparse density raster ``(cx, cy, x)`` —
    occupied cells only, exact int64 counts, one map-side-combinable
    groupBy."""
    return (
        points.select(
            F.expr(_fd(x_col, cell, "spark")).alias("cx"),
            F.expr(_fd(y_col, cell, "spark")).alias("cy"),
        )
        .groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).alias("x"))
    )


def morans_i(
    points: DataFrame,
    x_col: str = "mx",
    y_col: str = "my",
    cell: int = GRID_GRAPH_CELL,
) -> DataFrame:
    """One row ``(n_cells, w_edges, i_ppm)`` — global Moran's I of
    the occupied-cell counts under binary queen weights, exact to
    the emitted ppm. ``i_ppm`` > 0 means clustered density (like
    neighbors like), < 0 dispersed, ≈ −10⁶/(N−1) random."""
    cells = cell_counts(points, x_col, y_col, cell)
    glob = cells.agg(
        F.sum("x").alias("s_tot"), F.count(F.lit(1)).alias("n_cells")
    )
    z = cells.join(F.broadcast(glob)).select(
        "cx",
        "cy",
        "n_cells",
        (F.col("n_cells") * F.col("x") - F.col("s_tot")).alias("z"),
    )
    den_n = z.agg(
        F.sum(
            F.col("z").cast("decimal(18,0)")
            * F.col("z").cast("decimal(18,0)")
        ).alias("den"),
        F.max("n_cells").alias("n_cells"),
    )
    offs = F.expr("array(-1, 0, 1)")
    nbr = (
        z.withColumn("ox", F.explode(offs))
        .withColumn("oy", F.explode(offs))
        .where("ox != 0 OR oy != 0")
        .select(
            (F.col("cx") + F.col("ox")).alias("dx"),
            (F.col("cy") + F.col("oy")).alias("dy"),
            F.col("z").alias("z_src"),
        )
    )
    dst = z.select(
        F.col("cx").alias("dx"), F.col("cy").alias("dy"),
        F.col("z").alias("z_dst"),
    )
    num_w = nbr.join(dst, ["dx", "dy"]).agg(
        F.sum(
            F.col("z_src").cast("decimal(18,0)")
            * F.col("z_dst").cast("decimal(18,0)")
        ).alias("num"),
        F.count(F.lit(1)).alias("w_edges"),
    )
    joined = num_w.join(F.broadcast(den_n))
    a = "(CAST(n_cells AS DECIMAL(38,0)) * num * 1000000)"
    b = "(CAST(w_edges AS DECIMAL(38,0)) * den)"
    m = f"((({a} % {b}) + {b}) % {b})"
    return joined.select(
        "n_cells",
        "w_edges",
        F.expr(f"CAST(({a} - {m}) div {b} AS BIGINT)").alias("i_ppm"),
    )


def sql_morans_i(
    points_sql: str,
    x_col: str = "mx",
    y_col: str = "my",
    cell: int = GRID_GRAPH_CELL,
) -> str:
    """DuckDB twin — HUGEINT accumulation, the same Euclidean-
    remainder floor, and deliberately a different join shape (the
    neighbor sum is a correlated scalar per cell rather than an
    exploded edge list), so the contract validates the edge
    decomposition too."""
    fx = _fd(x_col, cell, "duckdb")
    fy = _fd(y_col, cell, "duckdb")
    a = "(CAST(n_cells AS HUGEINT) * num * 1000000)"
    b = "(CAST(w_edges AS HUGEINT) * den)"
    m = f"((({a} % {b}) + {b}) % {b})"
    return (
        f"WITH pts AS ({points_sql}), "
        f"cells AS (SELECT {fx} AS cx, {fy} AS cy, "
        f"COUNT(*) AS x FROM pts GROUP BY 1, 2), "
        f"g AS (SELECT SUM(x) AS s_tot, COUNT(*) AS n_cells FROM cells), "
        f"z AS (SELECT cx, cy, g.n_cells * x - g.s_tot AS z "
        f"FROM cells, g), "
        f"num_w AS (SELECT SUM(CAST(a.z AS HUGEINT) * "
        f"CAST(b.z AS HUGEINT)) AS num, COUNT(*) AS w_edges "
        f"FROM z a JOIN z b ON ABS(a.cx - b.cx) <= 1 "
        f"AND ABS(a.cy - b.cy) <= 1 "
        f"AND (a.cx <> b.cx OR a.cy <> b.cy)), "
        f"den_n AS (SELECT SUM(CAST(z AS HUGEINT) * CAST(z AS HUGEINT)) "
        f"AS den, (SELECT n_cells FROM g) AS n_cells FROM z) "
        f"SELECT n_cells, w_edges, "
        f"CAST(({a} - {m}) // {b} AS BIGINT) AS i_ppm "
        f"FROM num_w, den_n"
    )
