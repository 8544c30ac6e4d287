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

__all__ = [
    "cell_counts",
    "morans_i",
    "sql_morans_i",
    "local_morans",
    "sql_local_morans",
    "pair_count_ladder",
    "sql_pair_count_ladder",
    "geary_c",
    "sql_geary_c",
    "join_count_stats",
    "sql_join_count_stats",
    "getis_local",
    "sql_getis_local",
    "spatial_gini",
    "sql_spatial_gini",
    "quadrat_dispersion",
    "sql_quadrat_dispersion",
    "colocation_quotient",
    "sql_colocation_quotient",
    "voronoi_catchment",
    "sql_voronoi_catchment",
    "cross_pair_ladder",
    "sql_cross_pair_ladder",
    "raster_clumps",
    "sql_raster_clumps",
    "coverage_gaps",
    "sql_coverage_gaps",
    "catchment_access_2sfca",
    "sql_catchment_access_2sfca",
    "nn_spectrum",
    "sql_nn_spectrum",
    "layer_coverage",
    "sql_layer_coverage",
    "general_g",
    "sql_general_g",
    "bivariate_moran",
    "sql_bivariate_moran",
    "percolation_ladder",
    "sql_percolation_ladder",
]


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
    a = "(CAST(n_cells AS DECIMAL(38,0)) * COALESCE(num, 0) * 1000000)"
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


def local_morans(
    points: DataFrame,
    x_col: str = "mx",
    y_col: str = "my",
    cell: int = GRID_GRAPH_CELL,
) -> DataFrame:
    """Local Moran's I (LISA — Anselin, Geographical Analysis 1995):
    per occupied cell, the exact integer local statistic and its
    quadrant class — ``(cx, cy, z, lag, local_num, cls)`` with
    ``z = N·x − S``, ``lag = Σ_{j∈queen(i)} z_j``, ``local_num =
    z·lag`` and ``cls`` ∈ {HH, LL, HL, LH, ZERO}. HH cells are the
    hot spots whose union IS the cluster map (LL cold spots, HL/LH
    spatial outliers); the global Moran numerator equals
    Σ local_num, which the unit suite asserts against
    :func:`morans_i`. |z| ≤ N·max(x) and |lag| ≤ 8|z|ₘₐₓ keep
    ``local_num`` inside int64 through ~10⁷-cell rasters (upgrade
    the product to DECIMAL beyond, as the global statistic does).

    Plan: the raster groupBy, a bounded ×8 map-side explode of z
    CONTRIBUTIONS (each cell sends z to its 8 neighbor slots), one
    groupBy on the receiving cell, and a LEFT join back onto the z
    frame (isolated cells take lag = 0) — the join keys are the
    groupBy keys, so both sides arrive co-partitioned and the join
    adds no exchange."""
    cells = cell_counts(points, x_col, y_col, cell)
    glob = cells.agg(
        F.sum("x").alias("s_tot"), F.count(F.lit(1)).alias("n_cells")
    )
    z = cells.join(F.broadcast(glob)).select(
        "cx",
        "cy",
        (F.col("n_cells") * F.col("x") - F.col("s_tot")).alias("z"),
    )
    offs = F.expr("array(-1, 0, 1)")
    contrib = (
        z.withColumn("ox", F.explode(offs))
        .withColumn("oy", F.explode(offs))
        .where("ox != 0 OR oy != 0")
        .select(
            (F.col("cx") + F.col("ox")).alias("nx"),
            (F.col("cy") + F.col("oy")).alias("ny"),
            F.col("z").alias("zc"),
        )
    )
    lag = contrib.groupBy("nx", "ny").agg(F.sum("zc").alias("lag"))
    out = z.join(
        lag,
        (F.col("cx") == F.col("nx")) & (F.col("cy") == F.col("ny")),
        "left",
    ).select(
        "cx",
        "cy",
        "z",
        F.coalesce(F.col("lag"), F.lit(0)).alias("lag"),
    )
    return out.select(
        "cx",
        "cy",
        "z",
        "lag",
        (F.col("z") * F.col("lag")).alias("local_num"),
        F.expr(
            "CASE WHEN z > 0 AND lag > 0 THEN 'HH' "
            "WHEN z < 0 AND lag < 0 THEN 'LL' "
            "WHEN z > 0 AND lag < 0 THEN 'HL' "
            "WHEN z < 0 AND lag > 0 THEN 'LH' "
            "ELSE 'ZERO' END"
        ).alias("cls"),
    )


def sql_local_morans(
    points_sql: str,
    x_col: str = "mx",
    y_col: str = "my",
    cell: int = GRID_GRAPH_CELL,
) -> str:
    """DuckDB twin of :func:`local_morans` — the lag arrives via an
    ABS-predicate LEFT self-join instead of the contribution explode
    (different plan, same integers)."""
    fx = _fd(x_col, cell, "duckdb")
    fy = _fd(y_col, cell, "duckdb")
    return (
        f"WITH pts AS ({points_sql}), "
        f"cells AS (SELECT {fx} AS cx, {fy} AS cy, "
        f"COUNT(*) AS x FROM pts GROUP BY 1, 2), "
        f"g AS (SELECT SUM(x) AS s_tot, COUNT(*) AS n_cells FROM cells), "
        f"z AS (SELECT cx, cy, g.n_cells * x - g.s_tot AS z "
        f"FROM cells, g), "
        f"lagd AS (SELECT a.cx, a.cy, a.z, "
        f"COALESCE(SUM(b.z), 0) AS lag FROM z a LEFT JOIN z b "
        f"ON ABS(a.cx - b.cx) <= 1 AND ABS(a.cy - b.cy) <= 1 "
        f"AND (a.cx <> b.cx OR a.cy <> b.cy) "
        f"GROUP BY a.cx, a.cy, a.z) "
        f"SELECT cx, cy, z, lag, z * lag AS local_num, "
        f"CASE WHEN z > 0 AND lag > 0 THEN 'HH' "
        f"WHEN z < 0 AND lag < 0 THEN 'LL' "
        f"WHEN z > 0 AND lag < 0 THEN 'HL' "
        f"WHEN z < 0 AND lag > 0 THEN 'LH' "
        f"ELSE 'ZERO' END AS cls FROM lagd"
    )


LADDER_RUNGS = (500, 1000, 2000, 4000)  # milli; max rung ≤ LADDER_CELL
LADDER_CELL = 4096


def pair_count_ladder(
    points: DataFrame,
    rungs: tuple[int, ...] = LADDER_RUNGS,
    cell: int = LADDER_CELL,
    x_col: str = "mx",
    y_col: str = "my",
    id_col: str = "point_id",
) -> DataFrame:
    """Ripley's-K-style pair-count ladder under the Chebyshev (L∞)
    metric: for each radius r in ``rungs``, the EXACT number of
    unordered point pairs with ``max(|Δx|, |Δy|) ≤ r`` — one row
    ``(r, n_pairs)`` per rung, every rung measured in ONE pass over
    a shared candidate set (the K function's whole point is the
    multi-scale profile; re-running dwithin per rung would re-shuffle
    the layer len(rungs) times).

    Plan: the standard grid filter at ``cell ≥ max(rungs)`` — side A
    explodes its 3×3 neighbor ring map-side, ONE equi-join on the
    cell key against side B's home cell (each pair meets exactly
    once: B's home cell is unique, so no dedup shuffle), ``id_a <
    id_b`` halves, then a bounded ×len(rungs) explode and a
    len(rungs)-row groupBy. All integers; ties at ``= r`` are exact
    in both engines."""
    assert max(rungs) <= cell
    fd = _fd(x_col, cell, "spark"), _fd(y_col, cell, "spark")
    a = points.select(
        F.col(id_col).alias("id_a"),
        F.col(x_col).alias("ax"),
        F.col(y_col).alias("ay"),
        F.expr(fd[0]).alias("acx"),
        F.expr(fd[1]).alias("acy"),
    )
    offs = F.expr("array(-1, 0, 1)")
    a = (
        a.withColumn("ox", F.explode(offs))
        .withColumn("oy", F.explode(offs))
        .select(
            "id_a",
            "ax",
            "ay",
            (F.col("acx") + F.col("ox")).alias("cx"),
            (F.col("acy") + F.col("oy")).alias("cy"),
        )
    )
    b = points.select(
        F.col(id_col).alias("id_b"),
        F.col(x_col).alias("bx"),
        F.col(y_col).alias("by"),
        F.expr(fd[0]).alias("cx"),
        F.expr(fd[1]).alias("cy"),
    )
    rung_arr = "array(" + ", ".join(str(r) for r in rungs) + ")"
    pairs = (
        a.join(b, ["cx", "cy"])
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            F.greatest(
                F.abs(F.col("ax") - F.col("bx")),
                F.abs(F.col("ay") - F.col("by")),
            ).alias("cheb")
        )
        .where(F.col("cheb") <= max(rungs))
    )
    return (
        pairs.withColumn("r", F.explode(F.expr(rung_arr)))
        .where(F.col("cheb") <= F.col("r"))
        .groupBy("r")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


def sql_pair_count_ladder(
    points_sql: str,
    rungs: tuple[int, ...] = LADDER_RUNGS,
    x_col: str = "mx",
    y_col: str = "my",
    id_col: str = "point_id",
) -> str:
    """DuckDB twin — brute bbox range self-join (no grid, no ring
    explode: a genuinely different candidate plan) with the same
    rung fan-out."""
    mx = max(rungs)
    vals = ", ".join(f"({r})" for r in rungs)
    return (
        f"WITH pts AS ({points_sql}), "
        f"pairs AS (SELECT GREATEST(ABS(a.{x_col} - b.{x_col}), "
        f"ABS(a.{y_col} - b.{y_col})) AS cheb "
        f"FROM pts a JOIN pts b ON a.{id_col} < b.{id_col} "
        f"AND a.{x_col} BETWEEN b.{x_col} - {mx} AND b.{x_col} + {mx} "
        f"AND a.{y_col} BETWEEN b.{y_col} - {mx} AND b.{y_col} + {mx}) "
        f"SELECT r, COUNT(*) AS n_pairs FROM pairs, "
        f"(VALUES {vals}) rungs(r) WHERE cheb <= r GROUP BY r"
    )


def zonal_majority(
    rows: DataFrame,
    zone_cols: tuple[str, str] = ("cx", "cy"),
    cat_col: str = "cat",
) -> DataFrame:
    """Zonal MAJORITY (the mode/majority-resample of raster algebra,
    GDAL's ``mode`` resampling / ArcGIS MajorityFilter): per zone the
    most frequent category, ties broken by the SMALLEST category
    value so the answer is deterministic in both engines —
    ``(cx, cy, major_cat, n_major, n_total)``.

    Shape: ONE exchange — an explicit repartition on the ZONE key
    (partitioning on a subset of the grouping keys satisfies both
    groupBys; the reverse — letting the first groupBy hash on
    (zone, cat) — does NOT satisfy the second, since equal zones
    with different categories land apart: measured, plan-gated),
    then the (zone, category) counts and the per-zone argmax as ONE
    ``min(struct(-cnt, cat))`` aggregate — no window, no
    join-back."""
    zx, zy = zone_cols
    per_cat = (
        rows.repartition(zx, zy)
        .groupBy(zx, zy, cat_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return per_cat.groupBy(zx, zy).agg(
        F.min(
            F.struct(
                (-F.col("cnt")).alias("neg"), F.col(cat_col).alias("c")
            )
        ).alias("m"),
        F.sum("cnt").alias("n_total"),
    ).select(
        zx,
        zy,
        F.col("m.c").alias("major_cat"),
        (-F.col("m.neg")).alias("n_major"),
        "n_total",
    )


def sql_zonal_majority(
    rows_sql: str,
    zone_cols: tuple[str, str] = ("cx", "cy"),
    cat_col: str = "cat",
) -> str:
    zx, zy = zone_cols
    return (
        f"WITH src AS ({rows_sql}), "
        f"pc AS (SELECT {zx}, {zy}, {cat_col}, COUNT(*) AS cnt "
        f"FROM src GROUP BY 1, 2, 3) "
        f"SELECT {zx}, {zy}, "
        f"MIN({cat_col}) FILTER (cnt = mx) AS major_cat, "
        f"mx AS n_major, tot AS n_total FROM ("
        f"SELECT *, MAX(cnt) OVER (PARTITION BY {zx}, {zy}) AS mx, "
        f"SUM(cnt) OVER (PARTITION BY {zx}, {zy}) AS tot FROM pc) "
        f"GROUP BY {zx}, {zy}, mx, tot"
    )


def radius_of_gyration(
    points: DataFrame,
    group_col: str = "user_id",
    x_col: str = "mx",
    y_col: str = "my",
) -> DataFrame:
    """Per-group radius of gyration (González et al., Nature 2008 —
    THE human-mobility statistic): ``rog² = Σᵢ‖rᵢ − r̄‖² / N``,
    emitted as the EXACT floor of the mean squared deviation in
    milli² — ``(group, n_pts, rog2_milli2)``. The centroid never
    exists as a float: with ``zx = N·x − Sx`` (int64),
    ``Σ‖r − r̄‖² / N = Σ(zx² + zy²) / N³`` exactly, accumulated in
    DECIMAL(38,0) (the z² sum passes int64 for ~10³ points at
    planet-scale coordinates) and floor-divided by N³ — all operands
    non-negative, so Spark's ``div`` and DuckDB's ``//`` agree.
    One groupBy for the sums, a broadcast-joined second pass for the
    deviations, a final groupBy on the same key — the two groupBys
    share the group-key exchange."""
    g = group_col
    sums = points.groupBy(g).agg(
        F.sum(x_col).alias("sx"),
        F.sum(y_col).alias("sy"),
        F.count(F.lit(1)).alias("n_pts"),
    )
    dev = points.join(sums, g).select(
        g,
        "n_pts",
        (F.col("n_pts") * F.col(x_col) - F.col("sx")).alias("zx"),
        (F.col("n_pts") * F.col(y_col) - F.col("sy")).alias("zy"),
    )
    return dev.groupBy(g, "n_pts").agg(
        F.expr(
            "CAST(SUM(CAST(zx AS DECIMAL(18,0)) * CAST(zx AS DECIMAL(18,0))"
            " + CAST(zy AS DECIMAL(18,0)) * CAST(zy AS DECIMAL(18,0))) "
            "div (CAST(n_pts AS DECIMAL(38,0)) * n_pts * n_pts) "
            "AS BIGINT)"
        ).alias("rog2_milli2")
    ).select(g, "n_pts", "rog2_milli2")


def sql_radius_of_gyration(
    points_sql: str,
    group_col: str = "user_id",
    x_col: str = "mx",
    y_col: str = "my",
) -> str:
    g = group_col
    return (
        f"WITH src AS ({points_sql}), "
        f"s AS (SELECT {g}, SUM({x_col}) AS sx, SUM({y_col}) AS sy, "
        f"COUNT(*) AS n_pts FROM src GROUP BY 1), "
        f"d AS (SELECT src.{g}, s.n_pts, "
        f"s.n_pts * src.{x_col} - s.sx AS zx, "
        f"s.n_pts * src.{y_col} - s.sy AS zy "
        f"FROM src JOIN s ON src.{g} = s.{g}) "
        f"SELECT {g}, n_pts, CAST(SUM(CAST(zx AS HUGEINT) * zx "
        f"+ CAST(zy AS HUGEINT) * zy) "
        f"// (CAST(n_pts AS HUGEINT) * n_pts * n_pts) AS BIGINT) "
        f"AS rog2_milli2 FROM d GROUP BY {g}, n_pts"
    )


def knox_statistic(
    buckets: DataFrame,
    day_window: int = 1,
) -> DataFrame:
    """Knox space-time interaction statistic (Knox, Applied
    Statistics 1964 — the classic epidemiology test: do events that
    are close in SPACE also cluster in TIME?) computed EXACTLY from
    the space-time-cube counts, never enumerating event pairs:
    a pair is space-close when its tiles are equal or 8-adjacent,
    time-close when ``|Δday| ≤ day_window``, and every pair class is
    a closed form over bucket counts — ``pairs = (Σ_{b1~b2} n₁·n₂
    − Σ n²)/2 + Σ n(n−1)/2`` over each symmetric closeness relation
    (the cross sum is even by symmetry, so the halving is exact).
    At 10^12 events the pair SETS are ~10^13+ rows; the cube is
    tiles × days — the counts, not the events, are the working set,
    the same trick mk_trend uses.

    buckets: (tx, ty, day, n) — the cube. Returns ONE row
    ``(n_events, pairs_space, pairs_time, pairs_both, knox_ppm)``
    where ``knox_ppm = ⌊pairs_both · C(N,2) · 10⁶ /
    (pairs_space · pairs_time)⌋`` — observed over expected-under-
    independence in ppm (≈10⁶ means no interaction; > 10⁶ means
    space-close pairs are ALSO time-close more often than chance),
    with the big products in DECIMAL(38,0)/HUGEINT since they pass
    int64 at scale. All three neighbor sums are bounded map-side
    explodes + one equi-join each over the (marginal) cube — never
    anything quadratic in buckets."""

    def cross_sum(df, axes, alias):
        a = df
        for col, off in axes:
            a = a.withColumn(f"o_{col}", F.explode(F.expr(off)))
        a = a.select(
            *[(F.col(c) + F.col(f"o_{c}")).alias(c) for c, _ in axes],
            F.col("n").alias("n_src"),
        )
        b = df.select(
            *[F.col(c) for c, _ in axes], F.col("n").alias("n_dst")
        )
        return a.join(b, [c for c, _ in axes]).agg(
            F.sum(
                F.col("n_src").cast("decimal(18,0)")
                * F.col("n_dst").cast("decimal(18,0)")
            ).alias(alias)
        )

    nine = "array(-1, 0, 1)"
    dayr = f"sequence({-day_window}L, {day_window}L)"
    cube = buckets.select("tx", "ty", "day", "n")
    glob = cube.agg(
        F.expr(
            "SUM(CAST(n AS DECIMAL(18,0)) * n)"
        ).alias("sq"),
        F.sum("n").alias("n_events"),
        F.expr(
            "SUM(CAST(n AS DECIMAL(18,0)) * (n - 1) div 2)"
        ).cast("decimal(38,0)").alias("within"),
    )
    s_both = cross_sum(
        cube, [("tx", nine), ("ty", nine), ("day", dayr)], "s_both"
    )
    s_space = cross_sum(
        cube.groupBy("tx", "ty").agg(F.sum("n").alias("n")),
        [("tx", nine), ("ty", nine)],
        "s_space",
    )
    s_time = cross_sum(
        cube.groupBy("day").agg(F.sum("n").alias("n")),
        [("day", dayr)],
        "s_time",
    )
    j = s_both.join(s_space).join(s_time).join(F.broadcast(glob))
    return j.selectExpr(
        "n_events",
        "CAST((s_space - sq) div 2 + within AS BIGINT) AS pairs_space",
        "CAST((s_time - sq) div 2 + within AS BIGINT) AS pairs_time",
        "CAST((s_both - sq) div 2 + within AS BIGINT) AS pairs_both",
        "CAST((((s_both - sq) div 2 + within) * "
        "(CAST(n_events AS DECIMAL(38,0)) * (n_events - 1) div 2) "
        "* 1000000) div "
        "(((s_space - sq) div 2 + within) * "
        "((s_time - sq) div 2 + within)) AS BIGINT) AS knox_ppm",
    )


def sql_knox_statistic(buckets_sql: str, day_window: int = 1) -> str:
    """DuckDB twin — the neighbor sums come from ABS-predicate self
    joins over the cube (different plan, same integers)."""
    w = day_window
    return (
        f"WITH cube0 AS ({buckets_sql}), "
        f"g AS (SELECT SUM(CAST(n AS HUGEINT) * n) AS sq, "
        f"SUM(n) AS n_events, "
        f"SUM(CAST(n AS HUGEINT) * (n - 1) // 2) AS within FROM cube0), "
        f"sb AS (SELECT SUM(CAST(a.n AS HUGEINT) * b.n) AS s_both "
        f"FROM cube0 a JOIN cube0 b ON ABS(a.tx - b.tx) <= 1 "
        f"AND ABS(a.ty - b.ty) <= 1 AND ABS(a.day - b.day) <= {w}), "
        f"spc AS (SELECT tx, ty, SUM(n) AS n FROM cube0 GROUP BY 1, 2), "
        f"ss AS (SELECT SUM(CAST(a.n AS HUGEINT) * b.n) AS s_space "
        f"FROM spc a JOIN spc b ON ABS(a.tx - b.tx) <= 1 "
        f"AND ABS(a.ty - b.ty) <= 1), "
        f"tmc AS (SELECT day, SUM(n) AS n FROM cube0 GROUP BY 1), "
        f"st AS (SELECT SUM(CAST(a.n AS HUGEINT) * b.n) AS s_time "
        f"FROM tmc a JOIN tmc b ON ABS(a.day - b.day) <= {w}) "
        f"SELECT CAST(n_events AS BIGINT) AS n_events, "
        f"CAST((s_space - sq) // 2 + within AS BIGINT) AS pairs_space, "
        f"CAST((s_time - sq) // 2 + within AS BIGINT) AS pairs_time, "
        f"CAST((s_both - sq) // 2 + within AS BIGINT) AS pairs_both, "
        f"CAST((((s_both - sq) // 2 + within) * "
        f"(CAST(n_events AS HUGEINT) * (n_events - 1) // 2) * 1000000) "
        f"// (((s_space - sq) // 2 + within) * "
        f"((s_time - sq) // 2 + within)) AS BIGINT) AS knox_ppm "
        f"FROM sb, ss, st, g"
    )


def geary_c(
    points: DataFrame,
    x_col: str = "mx",
    y_col: str = "my",
    cell: int = GRID_GRAPH_CELL,
) -> DataFrame:
    """Global Geary's C (Geary, The Incorporated Statistician 1954)
    over the occupied-cell density raster under binary queen weights
    — the EDGE-DIFFERENCE companion to Moran's I (Moran correlates
    neighbor values; Geary sums squared neighbor CONTRASTS, so it is
    the more sensitive of the two to local gradients):

        C = (N−1) · Σ_ij w_ij (x_i − x_j)² / (2W · Σ_i (x_i − x̄)²)

    One row ``(n_cells, w_edges, c_ppm)``; C < 1 (ppm < 10⁶) means
    clustered, > 1 dispersed. Exactness: the mean never exists —
    with ``z_i = N·x_i − S`` the N² factors in (z_i−z_j)² and Σz²
    cancel, every term is integral, and both engines accumulate the
    products in 128-bit types (DECIMAL(38,0) / HUGEINT). Numerator
    and denominator are both non-negative, so the final ppm floor is
    a plain integer division — no Euclidean-remainder dance needed
    (contrast :func:`morans_i`, whose numerator can be negative).

    Scale shape: identical to morans_i — one raster groupBy, a
    bounded ×8 map-side explode, ONE cell equi-join; nothing after
    the first groupBy touches a point row."""
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
            (F.col("z_src") - F.col("z_dst")).cast("decimal(18,0)")
            * (F.col("z_src") - F.col("z_dst")).cast("decimal(18,0)")
        ).alias("num"),
        F.count(F.lit(1)).alias("w_edges"),
    )
    joined = num_w.join(F.broadcast(den_n))
    return joined.selectExpr(
        "n_cells",
        "w_edges",
        "CAST(((CAST(n_cells AS DECIMAL(38,0)) - 1) * num * 1000000) "
        "div (2 * CAST(w_edges AS DECIMAL(38,0)) * den) AS BIGINT) "
        "AS c_ppm",
    )


def sql_geary_c(
    points_sql: str,
    x_col: str = "mx",
    y_col: str = "my",
    cell: int = GRID_GRAPH_CELL,
) -> str:
    """DuckDB twin of :func:`geary_c` — the edge-contrast sum is an
    ABS-predicate self-join over the raster (different plan from the
    explode + equi-join, same integers)."""
    fx = _fd(x_col, cell, "duckdb")
    fy = _fd(y_col, cell, "duckdb")
    return (
        f"WITH pts AS ({points_sql}), "
        f"cells AS (SELECT {fx} AS cx, {fy} AS cy, "
        f"COUNT(*) AS x FROM pts GROUP BY 1, 2), "
        f"g AS (SELECT SUM(x) AS s_tot, COUNT(*) AS n_cells FROM cells), "
        f"z AS (SELECT cx, cy, g.n_cells * x - g.s_tot AS z "
        f"FROM cells, g), "
        f"num_w AS (SELECT SUM(CAST(a.z - b.z AS HUGEINT) * "
        f"CAST(a.z - b.z AS HUGEINT)) AS num, COUNT(*) AS w_edges "
        f"FROM z a JOIN z b ON ABS(a.cx - b.cx) <= 1 "
        f"AND ABS(a.cy - b.cy) <= 1 "
        f"AND (a.cx <> b.cx OR a.cy <> b.cy)), "
        f"den_n AS (SELECT SUM(CAST(z AS HUGEINT) * CAST(z AS HUGEINT)) "
        f"AS den, (SELECT n_cells FROM g) AS n_cells FROM z) "
        f"SELECT n_cells, w_edges, "
        f"CAST(((CAST(n_cells AS HUGEINT) - 1) * num * 1000000) // "
        f"(2 * CAST(w_edges AS HUGEINT) * den) AS BIGINT) AS c_ppm "
        f"FROM num_w, den_n"
    )


def join_count_stats(
    points: DataFrame,
    hot_threshold: int,
    x_col: str = "mx",
    y_col: str = "my",
    cell: int = GRID_GRAPH_CELL,
) -> DataFrame:
    """Binary join-count statistics (Cliff & Ord 1981, ch. 1 — the
    oldest spatial-autocorrelation test there is, for CATEGORICAL
    rasters where Moran/Geary need interval data): classify every
    occupied cell Black (count ≥ ``hot_threshold``) or White, then
    count the UNORDERED 8-neighbor cell adjacencies by class pair.
    One row ``(n_b, n_w, bb, bw, ww)``; a clustered hot set shows BB
    far above the hypergeometric expectation E[BB] = W·n_b(n_b−1) /
    (N(N−1)) (left to the caller — every input to it is in the row).

    Each unordered edge counts ONCE: the ordered explode + equi-join
    emits both directions, and the lexicographic guard
    ``(sx, sy) < (dx, dy)`` on the SOURCE cell's own coordinates
    (carried through the explode) keeps exactly one. All exact
    integers; the same bounded ×8 explode + ONE equi-join shape as
    the other raster statistics."""
    cells = cell_counts(points, x_col, y_col, cell).select(
        "cx",
        "cy",
        (F.col("x") >= hot_threshold).cast("int").alias("b"),
    )
    classes = cells.agg(
        F.sum("b").alias("n_b"),
        F.sum(F.lit(1) - F.col("b")).alias("n_w"),
    )
    offs = F.expr("array(-1, 0, 1)")
    src = (
        cells.withColumn("ox", F.explode(offs))
        .withColumn("oy", F.explode(offs))
        .where("ox != 0 OR oy != 0")
        .select(
            F.col("cx").alias("sx"),
            F.col("cy").alias("sy"),
            (F.col("cx") + F.col("ox")).alias("dx"),
            (F.col("cy") + F.col("oy")).alias("dy"),
            F.col("b").alias("b_src"),
        )
    )
    dst = cells.select(
        F.col("cx").alias("dx"), F.col("cy").alias("dy"),
        F.col("b").alias("b_dst"),
    )
    pairs = (
        src.join(dst, ["dx", "dy"])
        .where(
            (F.col("sx") < F.col("dx"))
            | ((F.col("sx") == F.col("dx")) & (F.col("sy") < F.col("dy")))
        )
        .agg(
            F.sum(F.col("b_src") * F.col("b_dst")).alias("bb"),
            F.sum(
                F.col("b_src") + F.col("b_dst")
                - 2 * F.col("b_src") * F.col("b_dst")
            ).alias("bw"),
            F.sum(
                (1 - F.col("b_src")) * (1 - F.col("b_dst"))
            ).alias("ww"),
        )
    )
    return classes.join(pairs).select("n_b", "n_w", "bb", "bw", "ww")


def sql_join_count_stats(
    points_sql: str,
    hot_threshold: int,
    x_col: str = "mx",
    y_col: str = "my",
    cell: int = GRID_GRAPH_CELL,
) -> str:
    """DuckDB twin — unordered edges straight from an ABS-predicate
    self-join with the same lexicographic guard (no explode)."""
    fx = _fd(x_col, cell, "duckdb")
    fy = _fd(y_col, cell, "duckdb")
    return (
        f"WITH pts AS ({points_sql}), "
        f"cells AS (SELECT {fx} AS cx, {fy} AS cy, "
        f"CASE WHEN COUNT(*) >= {hot_threshold} THEN 1 ELSE 0 END AS b "
        f"FROM pts GROUP BY 1, 2), "
        f"cls AS (SELECT SUM(b) AS n_b, SUM(1 - b) AS n_w FROM cells), "
        f"prs AS (SELECT SUM(a.b * b.b) AS bb, "
        f"SUM(a.b + b.b - 2 * a.b * b.b) AS bw, "
        f"SUM((1 - a.b) * (1 - b.b)) AS ww "
        f"FROM cells a JOIN cells b ON ABS(a.cx - b.cx) <= 1 "
        f"AND ABS(a.cy - b.cy) <= 1 "
        f"AND (a.cx < b.cx OR (a.cx = b.cx AND a.cy < b.cy))) "
        f"SELECT n_b, n_w, bb, bw, ww FROM cls, prs"
    )


def getis_local(
    points: DataFrame,
    x_col: str = "mx",
    y_col: str = "my",
    cell: int = GRID_GRAPH_CELL,
) -> DataFrame:
    """Getis–Ord-style local hot-spot ratio (Getis & Ord,
    Geographical Analysis 1992 — the Gi* family behind ArcGIS Hot
    Spot Analysis): per occupied cell, the EXACT window density
    ratio ``(cx, cy, local_sum, n_window, gi_ppm)`` where
    ``local_sum`` sums the counts over the 3×3 window INCLUDING self
    (the * in Gi*), ``n_window`` counts the occupied cells in it,
    and ``gi_ppm = ⌊local_sum · N · 10⁶ / (n_window · S)⌋`` —
    observed window total over its expectation ``n_window·S/N``
    under a uniform spread of the mass across occupied cells.
    gi_ppm > 10⁶ marks hot windows, < 10⁶ cold ones; it is a
    monotone transform of the Gi* numerator at fixed window
    occupancy, exact where the textbook z-score needs a sqrt no
    integer engine can commit to.

    Plan: the raster groupBy, a bounded ×9 contribution explode
    (self included), one groupBy on the receiving cell, and an inner
    join back onto the raster frame ON THE GROUPBY KEYS (both sides
    co-partitioned — no extra exchange), with the one-row global
    frame broadcast. The products pass int64 at planet scale, so
    they ride DECIMAL(38,0)/HUGEINT."""
    cells = cell_counts(points, x_col, y_col, cell)
    glob = cells.agg(
        F.sum("x").alias("s_tot"), F.count(F.lit(1)).alias("n_cells")
    )
    offs = F.expr("array(-1, 0, 1)")
    contrib = (
        cells.withColumn("ox", F.explode(offs))
        .withColumn("oy", F.explode(offs))
        .select(
            (F.col("cx") + F.col("ox")).alias("nx"),
            (F.col("cy") + F.col("oy")).alias("ny"),
            F.col("x").alias("xc"),
        )
    )
    win = contrib.groupBy("nx", "ny").agg(
        F.sum("xc").alias("local_sum"),
        F.count(F.lit(1)).alias("n_window"),
    )
    out = cells.join(
        win,
        (F.col("cx") == F.col("nx")) & (F.col("cy") == F.col("ny")),
    ).join(F.broadcast(glob))
    return out.selectExpr(
        "cx",
        "cy",
        "local_sum",
        "n_window",
        "CAST((CAST(local_sum AS DECIMAL(38,0)) * n_cells * 1000000) "
        "div (CAST(n_window AS DECIMAL(38,0)) * s_tot) AS BIGINT) "
        "AS gi_ppm",
    )


def sql_getis_local(
    points_sql: str,
    x_col: str = "mx",
    y_col: str = "my",
    cell: int = GRID_GRAPH_CELL,
) -> str:
    """DuckDB twin of :func:`getis_local` — the window sum is an
    ABS-predicate self-join INCLUDING the equal cell (different plan
    from the ×9 contribution explode, same integers)."""
    fx = _fd(x_col, cell, "duckdb")
    fy = _fd(y_col, cell, "duckdb")
    return (
        f"WITH pts AS ({points_sql}), "
        f"cells AS (SELECT {fx} AS cx, {fy} AS cy, "
        f"COUNT(*) AS x FROM pts GROUP BY 1, 2), "
        f"g AS (SELECT SUM(x) AS s_tot, COUNT(*) AS n_cells FROM cells), "
        f"win AS (SELECT a.cx, a.cy, SUM(b.x) AS local_sum, "
        f"COUNT(*) AS n_window FROM cells a JOIN cells b "
        f"ON ABS(a.cx - b.cx) <= 1 AND ABS(a.cy - b.cy) <= 1 "
        f"GROUP BY a.cx, a.cy) "
        f"SELECT cx, cy, local_sum, n_window, "
        f"CAST((CAST(local_sum AS HUGEINT) * n_cells * 1000000) // "
        f"(CAST(n_window AS HUGEINT) * s_tot) AS BIGINT) AS gi_ppm "
        f"FROM win, g"
    )


def spatial_gini(
    points: DataFrame,
    x_col: str = "mx",
    y_col: str = "my",
    cell: int = GRID_GRAPH_CELL,
) -> DataFrame:
    """Gini coefficient of the occupied-cell density raster — THE
    inequality summary of a spatial distribution ("how concentrated
    is the mass in few cells?"), exact to the emitted ppm via the
    rank identity  G = (2·Σᵢ i·x₍ᵢ₎ − (n+1)·S) / (n·S)  with x₍ᵢ₎
    ascending and ranks 1-based. One row ``(n_cells, s_tot,
    gini_ppm)``.

    The global ascending rank comes from :func:`layout.
    exact_global_rank` — repartitionByRange + per-partition
    row_number + broadcast prefix offsets, NEVER a single-partition
    window (at 10^9 occupied cells ``Window.orderBy`` with no key
    collapses onto one task). Rank ties between equal counts may
    fall either way across engines, but Σ i·x over a tied block is
    invariant under permuting the block (same x multiplies the same
    rank set), so the statistic is deterministic anyway — the unit
    suite asserts it under two different tiebreaks. Products pass
    int64 at scale (rank ≤ n, Σ rank·x ≤ n·S), so they accumulate in
    DECIMAL(38,0)/HUGEINT; numerator ≥ 0 by the rearrangement
    inequality, making the ppm floor a plain division."""
    from workstealing_spatial_join_spark.operators.layout import (
        exact_global_rank,
    )

    cells = cell_counts(points, x_col, y_col, cell)
    # strict total order: count, then a unique per-cell key
    keyed = cells.withColumn(
        "tb", F.col("cx") * F.lit(1_000_000) + F.col("cy")
    )
    ranked = exact_global_rank(keyed, "x", "tb", out_col="g_rank")
    return ranked.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("x").alias("s_tot"),
        F.expr(
            "CAST(((2 * SUM(CAST(g_rank + 1 AS DECIMAL(18,0)) * x) "
            "- (COUNT(*) + 1) * CAST(SUM(x) AS DECIMAL(38,0))) "
            "* 1000000) div (COUNT(*) * CAST(SUM(x) AS DECIMAL(38,0))) "
            "AS BIGINT)"
        ).alias("gini_ppm"),
    )


def sql_spatial_gini(
    points_sql: str,
    x_col: str = "mx",
    y_col: str = "my",
    cell: int = GRID_GRAPH_CELL,
) -> str:
    """DuckDB twin — a plain global ROW_NUMBER (the point: the
    distributed rank machinery must land the identical statistic)."""
    fx = _fd(x_col, cell, "duckdb")
    fy = _fd(y_col, cell, "duckdb")
    return (
        f"WITH pts AS ({points_sql}), "
        f"cells AS (SELECT {fx} AS cx, {fy} AS cy, "
        f"COUNT(*) AS x FROM pts GROUP BY 1, 2), "
        f"rk AS (SELECT x, ROW_NUMBER() OVER (ORDER BY x, cx, cy) "
        f"AS r FROM cells) "
        f"SELECT COUNT(*) AS n_cells, SUM(x) AS s_tot, "
        f"CAST(((2 * SUM(CAST(r AS HUGEINT) * x) "
        f"- (COUNT(*) + 1) * CAST(SUM(x) AS HUGEINT)) * 1000000) // "
        f"(COUNT(*) * CAST(SUM(x) AS HUGEINT)) AS BIGINT) AS gini_ppm "
        f"FROM rk"
    )


def quadrat_dispersion(
    points: DataFrame,
    x_col: str = "mx",
    y_col: str = "my",
    cell: int = GRID_GRAPH_CELL,
) -> DataFrame:
    """Quadrat variance-to-mean dispersion index (the index of
    dispersion behind the classical quadrat-count CSR test — Fisher's
    VMR): one row ``(n_quadrats, n_occupied, s_tot, vmr_ppm)`` where
    the quadrat frame is the bounding box of the occupied cells —
    T = (max_cx−min_cx+1)·(max_cy−min_cy+1) quadrats INCLUDING the
    empty ones (dropping empties is the classic quadrat-test mistake:
    it biases VMR toward 1) — and

        VMR = var/mean = (T·Σx² − S²) / (T·S)   (exact, in ppm).

    ≈10⁶ means CSR (Poisson), ≫10⁶ clustered, <10⁶ dispersed. The
    empty quadrats never materialize: their contribution is the
    closed form above (Σ over ALL T quadrats of x² equals the
    occupied Σx² since empties add 0, and the −S²/T mean-correction
    covers the rest). T·Σx² ≥ S² by Cauchy–Schwarz, so the floor is
    a plain non-negative division in DECIMAL(38,0)/HUGEINT.

    Plan: ONE raster groupBy + ONE one-row aggregate — the cheapest
    statistic in the family."""
    cells = cell_counts(points, x_col, y_col, cell)
    return cells.agg(
        (
            (F.max("cx") - F.min("cx") + 1)
            * (F.max("cy") - F.min("cy") + 1)
        ).alias("n_quadrats"),
        F.count(F.lit(1)).alias("n_occupied"),
        F.sum("x").alias("s_tot"),
        F.expr(
            "CAST(((CAST((MAX(cx) - MIN(cx) + 1) AS DECIMAL(38,0)) "
            "* (MAX(cy) - MIN(cy) + 1) "
            "* SUM(CAST(x AS DECIMAL(18,0)) * x) "
            "- CAST(SUM(x) AS DECIMAL(38,0)) * SUM(x)) * 1000000) div "
            "(CAST((MAX(cx) - MIN(cx) + 1) AS DECIMAL(38,0)) "
            "* (MAX(cy) - MIN(cy) + 1) * SUM(x)) AS BIGINT)"
        ).alias("vmr_ppm"),
    )


def sql_quadrat_dispersion(
    points_sql: str,
    x_col: str = "mx",
    y_col: str = "my",
    cell: int = GRID_GRAPH_CELL,
) -> str:
    fx = _fd(x_col, cell, "duckdb")
    fy = _fd(y_col, cell, "duckdb")
    return (
        f"WITH pts AS ({points_sql}), "
        f"cells AS (SELECT {fx} AS cx, {fy} AS cy, "
        f"COUNT(*) AS x FROM pts GROUP BY 1, 2) "
        f"SELECT (MAX(cx) - MIN(cx) + 1) * (MAX(cy) - MIN(cy) + 1) "
        f"AS n_quadrats, COUNT(*) AS n_occupied, SUM(x) AS s_tot, "
        f"CAST(((CAST((MAX(cx) - MIN(cx) + 1) AS HUGEINT) "
        f"* (MAX(cy) - MIN(cy) + 1) * SUM(CAST(x AS HUGEINT) * x) "
        f"- CAST(SUM(x) AS HUGEINT) * SUM(x)) * 1000000) // "
        f"(CAST((MAX(cx) - MIN(cx) + 1) AS HUGEINT) "
        f"* (MAX(cy) - MIN(cy) + 1) * SUM(x)) AS BIGINT) AS vmr_ppm "
        f"FROM cells"
    )


def colocation_quotient(
    cells_a: DataFrame,
    cells_b: DataFrame,
    n_frame_cells: int,
) -> DataFrame:
    """Cross-layer colocation quotient over two density rasters on
    the SAME grid — the bivariate "do the two layers concentrate in
    the same places?" statistic (the cell-count form of the
    cross-K/CLQ family; Leslie & Kronenfeld, Geographical Analysis
    2011 ask it point-wise, this asks it grid-wise):

        CQ = T · Σ_cells a_i·b_i / (Sa · Sb)    — exact, in ppm

    with T the FIXED frame size (all grid cells, occupied or not).
    Under independent uniform placement E[CQ] = 1; ≫10⁶ means layer
    B piles up exactly where layer A does. One row ``(n_a, n_b,
    n_shared_cells, coloc_ppm)``. sqrt-free by construction (a
    Pearson correlation of the two rasters needs two sqrts no
    integer engine can commit to; CQ is the covariance-style ratio
    that doesn't).

    Inputs are ``(cx, cy, x)`` rasters (:func:`cell_counts` output
    shape). Only the INTERSECTION of occupied cells contributes to
    Σ a·b (empties multiply to 0), so the plan is two raster
    groupBys + ONE inner equi-join on the cell key + a one-row
    aggregate — the frame size enters as a literal."""
    a = cells_a.select("cx", "cy", F.col("x").alias("xa"))
    b = cells_b.select("cx", "cy", F.col("x").alias("xb"))
    ga = a.agg(F.sum("xa").alias("s_a"), F.count(F.lit(1)).alias("n_a"))
    gb = b.agg(F.sum("xb").alias("s_b"), F.count(F.lit(1)).alias("n_b"))
    shared = a.join(b, ["cx", "cy"]).agg(
        F.sum(
            F.col("xa").cast("decimal(18,0)")
            * F.col("xb").cast("decimal(18,0)")
        ).alias("sab"),
        F.count(F.lit(1)).alias("n_shared_cells"),
    )
    j = shared.join(F.broadcast(ga)).join(F.broadcast(gb))
    # COALESCE: disjoint layers have an empty shared frame — the sum
    # is NULL there, and "no co-occupancy" is CQ = 0, not unknown
    return j.selectExpr(
        "n_a",
        "n_b",
        "n_shared_cells",
        f"CAST((CAST({n_frame_cells} AS DECIMAL(38,0)) "
        "* COALESCE(sab, 0) * 1000000) "
        "div (CAST(s_a AS DECIMAL(38,0)) * s_b) AS BIGINT) "
        "AS coloc_ppm",
    )


def sql_colocation_quotient(
    cells_a_sql: str,
    cells_b_sql: str,
    n_frame_cells: int,
) -> str:
    """DuckDB twin — inputs are SQL producing (cx, cy, x) rasters."""
    return (
        f"WITH ca AS ({cells_a_sql}), cb AS ({cells_b_sql}), "
        f"ga AS (SELECT SUM(x) AS s_a, COUNT(*) AS n_a FROM ca), "
        f"gb AS (SELECT SUM(x) AS s_b, COUNT(*) AS n_b FROM cb), "
        f"sh AS (SELECT SUM(CAST(ca.x AS HUGEINT) * cb.x) AS sab, "
        f"COUNT(*) AS n_shared_cells FROM ca JOIN cb "
        f"ON ca.cx = cb.cx AND ca.cy = cb.cy) "
        f"SELECT n_a, n_b, n_shared_cells, "
        f"CAST((CAST({n_frame_cells} AS HUGEINT) * COALESCE(sab, 0) * 1000000) // "
        f"(CAST(s_a AS HUGEINT) * s_b) AS BIGINT) AS coloc_ppm "
        f"FROM sh, ga, gb"
    )


def voronoi_catchment(points: DataFrame, facilities: DataFrame) -> DataFrame:
    """Nearest-facility (Voronoi) allocation + catchment rollup — the
    location-allocation primitive behind service-area analysis
    (assign every demand point to its closest facility, then describe
    each facility's catchment): output one row per facility that wins
    at least one point, ``(fid, n_pts, sum_d2, max_d2)`` under EXACT
    int64 squared Euclidean distance on the milli grid (no sqrt is
    ever taken — the argmin and all rollup aggregates are
    sqrt-invariant). Ties (a point equidistant from two facilities)
    break to the SMALLER fid via a single lexicographic
    ``min(struct(d2, fid))``, so the allocation is deterministic in
    both engines.

    Scale shape (10^12 points × K facilities): the facility side of a
    location-allocation problem is small by definition (K sites, not
    K points) — it BROADCASTS, the demand side never shuffles, and
    the per-point argmin collapses map-side (partial
    ``min(struct)``), so the only exchange carries one row per point
    already reduced to its winning facility; the catchment rollup is
    a map-side-combinable groupBy on the tiny fid key. Nothing is
    quadratic in points; the K-way fan-out is the same bounded
    replicate-scan a broadcast spatial join pays. At planetary K the
    right tool is the kNN grid join (operators/knn.py) — this
    operator is the exact-assignment twin for catalog-sized facility
    sets."""
    d = points.crossJoin(F.broadcast(facilities)).select(
        "point_id",
        "fid",
        (
            (F.col("mx") - F.col("fx")) * (F.col("mx") - F.col("fx"))
            + (F.col("my") - F.col("fy")) * (F.col("my") - F.col("fy"))
        ).alias("d2"),
    )
    best = d.groupBy("point_id").agg(
        F.min(F.struct("d2", "fid")).alias("best")
    )
    return (
        best.select(
            F.col("best.fid").alias("fid"), F.col("best.d2").alias("d2")
        )
        .groupBy("fid")
        .agg(
            F.count(F.lit(1)).alias("n_pts"),
            F.sum("d2").alias("sum_d2"),
            F.max("d2").alias("max_d2"),
        )
    )


def sql_voronoi_catchment(points_sql: str, facilities_sql: str) -> str:
    """DuckDB twin — inputs produce (point_id, mx, my) and
    (fid, fx, fy). The argmin is the min-d2 filter + min-fid
    tiebreak, matching the struct ordering exactly."""
    return (
        f"WITH p AS ({points_sql}), f AS ({facilities_sql}), "
        "d AS (SELECT point_id, fid, (mx - fx) * (mx - fx) + "
        "(my - fy) * (my - fy) AS d2 FROM p CROSS JOIN f), "
        "m AS (SELECT point_id, MIN(d2) AS md2 FROM d GROUP BY 1), "
        "a AS (SELECT d.point_id, MIN(d.fid) AS fid, MIN(d.d2) AS d2 "
        "FROM d JOIN m ON d.point_id = m.point_id AND d.d2 = m.md2 "
        "GROUP BY 1) "
        "SELECT fid, COUNT(*) AS n_pts, "
        "CAST(SUM(d2) AS BIGINT) AS sum_d2, MAX(d2) AS max_d2 "
        "FROM a GROUP BY fid"
    )


def cross_pair_ladder(
    points_a: DataFrame,
    points_b: DataFrame,
    rungs: tuple[int, ...] = LADDER_RUNGS,
    cell: int = LADDER_CELL,
) -> DataFrame:
    """Bivariate (cross-K) pair-count ladder — Ripley's cross-K
    profile between TWO layers under the Chebyshev metric: for each
    radius r, the EXACT number of (a, b) cross pairs with
    ``max(|Δx|, |Δy|) ≤ r``. The univariate ladder
    (:func:`pair_count_ladder`) asks "does this layer cluster?";
    the cross ladder asks "does layer A cluster AROUND layer B?" at
    every scale — the multi-scale sharpening of the single-cell
    colocation quotient, and the standard screen for attraction vs
    repulsion between two point processes (Ripley 1977 §5; Dixon's
    cross-K). Inputs are ``(point_id, mx, my)`` layers; output one
    row ``(r, n_pairs)`` per rung.

    Plan: identical shape to the univariate ladder — side A explodes
    its 3×3 neighbor ring map-side, ONE equi-join on the cell key
    against side B's unique home cell (each cross pair meets exactly
    once, no dedup), a bounded ×len(rungs) explode, and a
    len(rungs)-row groupBy. No ``id_a < id_b`` halving: the layers
    are distinct, every (a, b) pair counts once."""
    assert max(rungs) <= cell
    fdx, fdy = _fd("mx", cell, "spark"), _fd("my", cell, "spark")
    offs = F.expr("array(-1, 0, 1)")
    a = (
        points_a.select(
            F.col("mx").alias("ax"),
            F.col("my").alias("ay"),
            F.expr(fdx).alias("acx"),
            F.expr(fdy).alias("acy"),
        )
        .withColumn("ox", F.explode(offs))
        .withColumn("oy", F.explode(offs))
        .select(
            "ax",
            "ay",
            (F.col("acx") + F.col("ox")).alias("cx"),
            (F.col("acy") + F.col("oy")).alias("cy"),
        )
    )
    b = points_b.select(
        F.col("mx").alias("bx"),
        F.col("my").alias("by"),
        F.expr(fdx).alias("cx"),
        F.expr(fdy).alias("cy"),
    )
    rung_arr = "array(" + ", ".join(str(r) for r in rungs) + ")"
    pairs = (
        a.join(b, ["cx", "cy"])
        .select(
            F.greatest(
                F.abs(F.col("ax") - F.col("bx")),
                F.abs(F.col("ay") - F.col("by")),
            ).alias("cheb")
        )
        .where(F.col("cheb") <= max(rungs))
    )
    return (
        pairs.withColumn("r", F.explode(F.expr(rung_arr)))
        .where(F.col("cheb") <= F.col("r"))
        .groupBy("r")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


def sql_cross_pair_ladder(
    points_a_sql: str,
    points_b_sql: str,
    rungs: tuple[int, ...] = LADDER_RUNGS,
) -> str:
    """DuckDB twin — brute bbox range join (IEJoin; a genuinely
    different candidate plan) with the same rung fan-out."""
    mx = max(rungs)
    vals = ", ".join(f"({r})" for r in rungs)
    return (
        f"WITH pa AS ({points_a_sql}), pb AS ({points_b_sql}), "
        f"cpairs AS (SELECT GREATEST(ABS(pa.mx - pb.mx), "
        f"ABS(pa.my - pb.my)) AS cheb FROM pa JOIN pb "
        f"ON pa.mx BETWEEN pb.mx - {mx} AND pb.mx + {mx} "
        f"AND pa.my BETWEEN pb.my - {mx} AND pb.my + {mx}) "
        f"SELECT r, COUNT(*) AS n_pairs FROM cpairs, "
        f"(VALUES {vals}) rungs(r) WHERE cheb <= r GROUP BY r"
    )


# cell-key packing for component labels: order-preserving on
# (cx, cy) lexicographic — cy + 2^31 is non-negative and < 2^32, so
# integer comparison of the packed key IS the pair comparison
_PACK_SHIFT = 4294967296  # 2^32
_PACK_BIAS = 2147483648   # 2^31


def raster_clumps(
    points: DataFrame,
    x_col: str = "mx",
    y_col: str = "my",
    cell: int = GRID_GRAPH_CELL,
) -> DataFrame:
    """Connected-component labeling of the occupied-cell raster —
    the CLUMP / RegionGroup operation of raster algebra (GRASS
    ``r.clump``, ArcGIS RegionGroup, the remote-sensing step that
    turns a classified mask into discrete patches): occupied cells
    connected under 8-adjacency form one clump; output one row per
    clump, ``(comp, n_cells, n_points, min_cx, max_cx, min_cy,
    max_cy)`` — size, mass, and bounding box (the patch-metrics base
    FRAGSTATS starts from). ``comp`` is the packed key of the
    lexicographically smallest member cell (order-preserving packing
    ``cx·2³² + cy + 2³¹``), so labels are deterministic in both
    engines. Cells with no occupied neighbor are SINGLETON clumps —
    the right-join + COALESCE keeps them (the label-propagation loop
    only sees edge-incident nodes).

    Scale shape: the raster, not the points, is the working set
    (ONE map-side-combinable groupBy); min-label propagation runs on
    the bounded occupied-cell graph (≤ 8 edges/cell) to fixpoint —
    O(diameter) bounded joins, each a cell-key equi-join; the rollup
    is one groupBy on the component key."""
    from workstealing_spatial_join_spark.operators.graph import (
        connected_components,
        occupied_cell_edges,
    )

    raster = cell_counts(points, x_col, y_col, cell)
    edges = occupied_cell_edges(points, x_col, y_col, cell)
    key = (
        lambda cx, cy: F.col(cx) * F.lit(_PACK_SHIFT)
        + F.col(cy)
        + F.lit(_PACK_BIAS)
    )
    labels = connected_components(
        edges.select(
            key("sx", "sy").alias("src"), key("dx", "dy").alias("dst")
        )
    )
    cells = raster.select(
        "cx", "cy", "x", key("cx", "cy").alias("node")
    )
    labeled = cells.join(labels, "node", "left").select(
        "cx",
        "cy",
        "x",
        F.coalesce(F.col("comp"), F.col("node")).alias("comp"),
    )
    return labeled.groupBy("comp").agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("x").alias("n_points"),
        F.min("cx").alias("min_cx"),
        F.max("cx").alias("max_cx"),
        F.min("cy").alias("min_cy"),
        F.max("cy").alias("max_cy"),
    )


def sql_raster_clumps(
    points_sql: str,
    x_col: str = "mx",
    y_col: str = "my",
    cell: int = GRID_GRAPH_CELL,
) -> str:
    """DuckDB twin: exact recursive-CTE closure over the SAME
    occupied-cell edge list, min-reduced, singletons kept by the
    same left-join + COALESCE."""
    fx = _fd(x_col, cell, "duckdb")
    fy = _fd(y_col, cell, "duckdb")
    pack = f"(cx * {_PACK_SHIFT} + cy + {_PACK_BIAS})"
    return (
        f"WITH RECURSIVE pts AS ({points_sql}), "
        f"raster AS (SELECT {fx} AS cx, {fy} AS cy, COUNT(*) AS x "
        f"FROM pts GROUP BY 1, 2), "
        "occ AS (SELECT cx, cy FROM raster), "
        "e2 AS MATERIALIZED (SELECT "
        f"(a.cx * {_PACK_SHIFT} + a.cy + {_PACK_BIAS}) AS a, "
        f"(b.cx * {_PACK_SHIFT} + b.cy + {_PACK_BIAS}) AS b "
        "FROM occ a JOIN occ b ON ABS(a.cx - b.cx) <= 1 "
        "AND ABS(a.cy - b.cy) <= 1 "
        "AND (a.cx <> b.cx OR a.cy <> b.cy)), "
        "nodes AS (SELECT DISTINCT a AS n FROM e2), "
        "reach(src, dst) AS (SELECT n, n FROM nodes "
        "UNION SELECT r.src, e.b FROM reach r JOIN e2 e ON r.dst = e.a), "
        "lab AS (SELECT src AS node, MIN(dst) AS comp FROM reach "
        "GROUP BY 1), "
        f"cells AS (SELECT cx, cy, x, {pack} AS node FROM raster), "
        "labeled AS (SELECT cells.cx, cells.cy, cells.x, "
        "COALESCE(lab.comp, cells.node) AS comp FROM cells "
        "LEFT JOIN lab ON cells.node = lab.node) "
        "SELECT comp, COUNT(*) AS n_cells, "
        "CAST(SUM(x) AS BIGINT) AS n_points, "
        "MIN(cx) AS min_cx, MAX(cx) AS max_cx, "
        "MIN(cy) AS min_cy, MAX(cy) AS max_cy "
        "FROM labeled GROUP BY comp"
    )


def coverage_gaps(
    points: DataFrame,
    facilities: DataFrame,
    max_d2: int,
    cell: int = GRID_GRAPH_CELL,
) -> DataFrame:
    """Service-coverage gap screen — the complement of the Voronoi
    allocation: occupied demand CELLS whose nearest facility is
    farther than the service radius (``min d2 > max_d2``, exact
    int64 squared distance from the cell CENTER·2 — see below), with
    how much demand sits stranded there. The output is what a
    planner asks after the catchment table: not "who serves whom"
    but "who is served by NO ONE" — ``(cx, cy, n_points, min_d2_q)``
    per uncovered cell, ordered-by nothing (the caller ranks by
    stranded demand).

    Exactness without halves: the cell center is ``(cx·cell +
    cell/2)`` which is fractional for odd cells — so distances are
    computed on DOUBLED coordinates (``2·center = 2·cx·cell + cell``,
    an exact int64), making ``min_d2_q`` the squared distance in
    QUARTER-milli² units (4× the milli² value; the threshold is
    scaled by 4 internally). No float ever exists; the gate
    ``min_d2_q > 4·max_d2`` is the exact milli² comparison.

    Scale shape: the demand raster (ONE map-side-combinable groupBy)
    crossed with the broadcast facility catalog; the per-cell min
    collapses map-side. Raster-sized, never point-sized, after the
    first groupBy."""
    raster = cell_counts(points, cell=cell)
    # doubled cell-center coordinates: 2·(c·cell + cell/2)
    centers = raster.select(
        "cx",
        "cy",
        "x",
        (F.col("cx") * (2 * cell) + cell).alias("ux"),
        (F.col("cy") * (2 * cell) + cell).alias("uy"),
    )
    d = centers.crossJoin(F.broadcast(facilities)).select(
        "cx",
        "cy",
        "x",
        (
            (F.col("ux") - F.lit(2) * F.col("fx"))
            * (F.col("ux") - F.lit(2) * F.col("fx"))
            + (F.col("uy") - F.lit(2) * F.col("fy"))
            * (F.col("uy") - F.lit(2) * F.col("fy"))
        ).alias("d2q"),
    )
    per_cell = d.groupBy("cx", "cy", "x").agg(
        F.min("d2q").alias("min_d2_q")
    )
    return per_cell.where(
        # 4·max_d2 precomputed in Python: it exceeds int32 for any
        # realistic radius, and both engines type bare literals int32
        F.col("min_d2_q") > F.lit(4 * max_d2)
    ).select(
        "cx", "cy", F.col("x").alias("n_points"), "min_d2_q"
    )


def sql_coverage_gaps(
    points_sql: str,
    facilities_sql: str,
    max_d2: int,
    cell: int = GRID_GRAPH_CELL,
) -> str:
    fx_ = _fd("mx", cell, "duckdb")
    fy_ = _fd("my", cell, "duckdb")
    return (
        f"WITH pts AS ({points_sql}), fac AS ({facilities_sql}), "
        f"raster AS (SELECT {fx_} AS cx, {fy_} AS cy, COUNT(*) AS x "
        f"FROM pts GROUP BY 1, 2), "
        f"ctr AS (SELECT cx, cy, x, cx * {2 * cell} + {cell} AS ux, "
        f"cy * {2 * cell} + {cell} AS uy FROM raster), "
        "d AS (SELECT cx, cy, x, "
        "(ux - 2 * fx) * (ux - 2 * fx) + (uy - 2 * fy) * (uy - 2 * fy) "
        "AS d2q FROM ctr CROSS JOIN fac), "
        "pc AS (SELECT cx, cy, x, MIN(d2q) AS min_d2_q FROM d "
        "GROUP BY 1, 2, 3) "
        f"SELECT cx, cy, x AS n_points, min_d2_q FROM pc "
        f"WHERE min_d2_q > {4 * max_d2}"
    )


def catchment_access_2sfca(
    points: DataFrame,
    facilities: DataFrame,
    max_cheb: int,
) -> DataFrame:
    """Two-step floating catchment area accessibility (2SFCA — Luo &
    Wang 2003, the standard spatial-accessibility score in health
    geography): step 1 computes each facility's supply-to-demand
    ratio ``R_f = supply_f / D_f`` over the demand points within its
    catchment (Chebyshev radius ``max_cheb``, exact integers); step
    2 scores each demand point ``A_i = Σ R_f`` over the facilities
    whose catchment covers it. Output ``(point_id, n_fac,
    access_ppm)``; uncovered points are ABSENT (their score is 0 and
    at 10^12 points the uncovered set is the corpus — the
    coverage-gap operator reports them).

    Determinism contract: each ratio is floored to ppm
    (``10⁶·supply_f // D_f``) BEFORE summing — Σ of exact rationals
    with unrelated denominators has no bounded common denominator,
    so the engine defines the score as the sum of ppm-quantized
    ratios, identical in both engines (documented quantization, not
    float drift; error < n_fac µ-units).

    Scale shape: facilities broadcast twice (catalog-sized); both
    the D_f rollup and the A_i rollup collapse map-side; the
    point×facility fan-out is range-gated before any shuffle."""
    fac = F.broadcast(facilities)
    within = points.crossJoin(fac).where(
        (F.abs(F.col("mx") - F.col("fx")) <= max_cheb)
        & (F.abs(F.col("my") - F.col("fy")) <= max_cheb)
    )
    demand = within.groupBy("fid", "supply").agg(
        F.count(F.lit(1)).alias("d_f")
    )
    ratios = demand.select(
        "fid",
        F.expr(
            "CAST((CAST(supply AS DECIMAL(18,0)) * 1000000) div d_f "
            "AS BIGINT)"
        ).alias("r_ppm"),
    )
    return (
        within.select("point_id", "fid")
        .join(F.broadcast(ratios), "fid")
        .groupBy("point_id")
        .agg(
            F.count(F.lit(1)).alias("n_fac"),
            F.sum("r_ppm").alias("access_ppm"),
        )
    )


def sql_catchment_access_2sfca(
    points_sql: str, facilities_sql: str, max_cheb: int
) -> str:
    return (
        f"WITH pts AS ({points_sql}), fac AS ({facilities_sql}), "
        f"w AS (SELECT point_id, fid, supply FROM pts CROSS JOIN fac "
        f"WHERE ABS(mx - fx) <= {max_cheb} "
        f"AND ABS(my - fy) <= {max_cheb}), "
        "dem AS (SELECT fid, supply, COUNT(*) AS d_f FROM w "
        "GROUP BY 1, 2), "
        "rat AS (SELECT fid, "
        "CAST((supply::HUGEINT * 1000000) // d_f AS BIGINT) AS r_ppm "
        "FROM dem) "
        "SELECT point_id, COUNT(*) AS n_fac, "
        "CAST(SUM(r_ppm) AS BIGINT) AS access_ppm "
        "FROM w JOIN rat ON w.fid = rat.fid GROUP BY point_id"
    )


def nn_spectrum(
    points: DataFrame,
    cell: int = GRID_GRAPH_CELL,
) -> DataFrame:
    """Nearest-neighbour distance spectrum — the G-function of point
    pattern analysis (Diggle §2; the empty-space twin of Ripley's K)
    as an exact OCTAVE histogram of per-point 1-NN squared Euclidean
    distance, right-CENSORED at the grid cell: output ``(bucket,
    n_points)`` where bucket = bit length of the exact NN d2 (same
    LENGTH(BIN(·)) octave convention as the jump spectrum) and the
    single ``bucket = -1`` row counts the censored tail (points
    whose every near neighbour is farther than the cell).

    Censoring is what makes ONE grid pass exact — no iterative ring
    escalation, with the threshold chosen so BOTH directions agree
    with the true global minimum: censor at ``d2 > cell²``. If the
    true NN d2 ≤ cell² then its Chebyshev ≤ cell, so it IS in the
    3×3 ring and the ring minimum equals the true minimum; if the
    true NN d2 > cell², every ring candidate is ≥ it, so the ring
    minimum is also > cell² and both engines censor. (The tempting
    looser bound (cell+1)² is WRONG: a true NN at Euclidean exactly
    cell+1 due east has Chebyshev cell+1 — outside the ring — so the
    engine would censor a point the brute-force oracle buckets;
    caught in design, pinned by a crafted boundary test.)
    Right-censoring at the study scale is standard G-function
    practice (border correction), not an approximation of this
    engine.

    Scale shape: the ×9 map-side ring explode + ONE cell-key
    equi-join (the pair_count_ladder plan), the per-point min
    collapsing map-side, and a bounded ~64-key octave groupBy."""
    fdx, fdy = _fd("mx", cell, "spark"), _fd("my", cell, "spark")
    offs = F.expr("array(-1, 0, 1)")
    a = (
        points.select(
            F.col("point_id").alias("id_a"),
            F.col("mx").alias("ax"),
            F.col("my").alias("ay"),
            F.expr(fdx).alias("acx"),
            F.expr(fdy).alias("acy"),
        )
        .withColumn("ox", F.explode(offs))
        .withColumn("oy", F.explode(offs))
        .select(
            "id_a",
            "ax",
            "ay",
            (F.col("acx") + F.col("ox")).alias("cx"),
            (F.col("acy") + F.col("oy")).alias("cy"),
        )
    )
    b = points.select(
        F.col("point_id").alias("id_b"),
        F.col("mx").alias("bx"),
        F.col("my").alias("by"),
        F.expr(fdx).alias("cx"),
        F.expr(fdy).alias("cy"),
    )
    bound = cell * cell
    ring_min = (
        a.join(b, ["cx", "cy"])
        .where(F.col("id_a") != F.col("id_b"))
        .select(
            "id_a",
            (
                (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx"))
                + (F.col("ay") - F.col("by"))
                * (F.col("ay") - F.col("by"))
            ).alias("d2"),
        )
        .groupBy("id_a")
        .agg(F.min("d2").alias("m"))
    )
    # censored = ring-min beyond the exactness bound OR no ring
    # neighbour at all (anti-join side)
    spectra = ring_min.select(
        F.when(
            F.col("m") <= F.lit(bound),
            F.length(F.bin(F.col("m"))).cast("int"),
        )
        .otherwise(F.lit(-1))
        .alias("bucket")
    )
    n_total = points.groupBy().agg(F.count(F.lit(1)).alias("n_total"))
    hist = spectra.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_points")
    )
    # fold ring-isolated points into the censored row. COALESCE the
    # covered sum (ADVICE r5): on a layer where EVERY point is
    # ring-isolated, hist is empty and F.sum yields NULL —
    # n_total - NULL is NULL, the iso > 0 filter would drop it, and
    # the engine would return an empty frame while the DuckDB twin
    # returns (-1, n_total).
    covered = hist.agg(
        F.coalesce(F.sum("n_points"), F.lit(0)).alias("n_cov")
    )
    extra = (
        n_total.crossJoin(F.broadcast(covered))
        .select((F.col("n_total") - F.col("n_cov")).alias("iso"))
        .where(F.col("iso") > 0)
        .select(F.lit(-1).alias("bucket"), F.col("iso").alias("n_points"))
    )
    return (
        hist.unionByName(extra)
        .groupBy("bucket")
        .agg(F.sum("n_points").alias("n_points"))
    )


def sql_nn_spectrum(
    points_sql: str,
    cell: int = GRID_GRAPH_CELL,
) -> str:
    """DuckDB twin — per-point bbox-pruned min (IEJoin, no grid: a
    genuinely different candidate plan), censored by the SAME bound.
    The ±cell bbox prune is LOSSLESS under the censor contract: any
    neighbour with d2 ≤ cell² has Chebyshev ≤ cell and is inside the
    bbox, and a bbox-min > cell² (or an empty bbox) is exactly the
    censored class — the same argument that makes the engine's 3×3
    ring exact. Without the prune the sf1 oracle is a 2.25·10¹⁰-pair
    quadratic; with it, an IEJoin."""
    bound = cell * cell
    return (
        f"WITH pts AS ({points_sql}), "
        "nn AS (SELECT a.point_id, "
        "MIN((a.mx - b.mx) * (a.mx - b.mx) + "
        "(a.my - b.my) * (a.my - b.my)) AS m "
        "FROM pts a JOIN pts b ON a.point_id <> b.point_id "
        f"AND b.mx BETWEEN a.mx - {cell} AND a.mx + {cell} "
        f"AND b.my BETWEEN a.my - {cell} AND a.my + {cell} "
        "GROUP BY 1), "
        "cls AS (SELECT CASE WHEN m IS NOT NULL AND m <= "
        f"{bound} THEN CAST(LENGTH(BIN(m)) AS INT) ELSE -1 END "
        "AS bucket FROM pts LEFT JOIN nn USING (point_id)) "
        "SELECT bucket, COUNT(*) AS n_points FROM cls GROUP BY 1"
    )


def layer_coverage(
    points_a: DataFrame,
    points_b: DataFrame,
    cell: int = GRID_GRAPH_CELL,
) -> DataFrame:
    """Cross-layer coverage completeness — the data-quality question
    a multimodal training pipeline asks before relying on a side
    layer ("what fraction of the ACTIVITY footprint has imagery?"):
    over the shared grid, the occupied-cell sets of layer A
    (activity) and layer B (coverage), their overlap, and the exact
    ppm share of A-cells that B covers. ONE row:
    ``(n_a_cells, n_b_cells, n_shared, coverage_ppm)`` with
    ``coverage_ppm = 10⁶·n_shared // n_a_cells``.

    Distinct from the colocation quotient (association strength of
    the DENSITIES) — this is set coverage of the FOOTPRINT: CQ can
    be high while coverage is poor (all imagery piled on one hot
    cell) and vice versa.

    Scale shape: two map-side-combinable distinct-cell groupBys,
    one cell-key inner join for the overlap, three one-row
    aggregates broadcast together. Raster-sized throughout."""
    fdx, fdy = _fd("mx", cell, "spark"), _fd("my", cell, "spark")

    def occ(df):
        return df.select(
            F.expr(fdx).alias("cx"), F.expr(fdy).alias("cy")
        ).distinct()

    a, b = occ(points_a), occ(points_b)
    na = a.agg(F.count(F.lit(1)).alias("n_a_cells"))
    nb = b.agg(F.count(F.lit(1)).alias("n_b_cells"))
    sh = a.join(b, ["cx", "cy"]).agg(
        F.count(F.lit(1)).alias("n_shared")
    )
    return (
        sh.crossJoin(F.broadcast(na))
        .crossJoin(F.broadcast(nb))
        .select(
            "n_a_cells",
            "n_b_cells",
            "n_shared",
            F.expr(
                "CAST((CAST(n_shared AS DECIMAL(18,0)) * 1000000) "
                "div n_a_cells AS BIGINT)"
            ).alias("coverage_ppm"),
        )
    )


def sql_layer_coverage(
    points_a_sql: str,
    points_b_sql: str,
    cell: int = GRID_GRAPH_CELL,
) -> str:
    fx_ = _fd("mx", cell, "duckdb")
    fy_ = _fd("my", cell, "duckdb")
    return (
        f"WITH pa AS ({points_a_sql}), pb AS ({points_b_sql}), "
        f"oa AS (SELECT DISTINCT {fx_} AS cx, {fy_} AS cy FROM pa), "
        f"ob AS (SELECT DISTINCT {fx_} AS cx, {fy_} AS cy FROM pb), "
        "na AS (SELECT COUNT(*) AS n_a_cells FROM oa), "
        "nb AS (SELECT COUNT(*) AS n_b_cells FROM ob), "
        "sh AS (SELECT COUNT(*) AS n_shared FROM oa JOIN ob "
        "ON oa.cx = ob.cx AND oa.cy = ob.cy) "
        "SELECT n_a_cells, n_b_cells, n_shared, "
        "CAST((n_shared::HUGEINT * 1000000) // n_a_cells AS BIGINT) "
        "AS coverage_ppm FROM sh, na, nb"
    )


def general_g(
    points: DataFrame,
    x_col: str = "mx",
    y_col: str = "my",
    cell: int = GRID_GRAPH_CELL,
) -> DataFrame:
    """Getis–Ord General G (Getis & Ord, Geog. Analysis 1992) — the
    global HIGH/LOW concentration statistic that complements Moran's
    I (which cannot tell hot clustering from cold clustering): over
    the occupied-cell raster with binary queen weights,
    ``G = Σ_{i≠j} w_ij·x_i·x_j / Σ_{i≠j} x_i·x_j``, exact in ppm.
    The denominator never enumerates pairs — it is the closed form
    ``S² − Σx²`` (S = Σx), so the only pair set ever touched is the
    bounded ×8 neighbor join the Moran machinery already uses. Both
    sums are non-negative (raw counts, not deviations), so the floor
    division is portable without the Euclidean fixup. One row
    ``(n_cells, w_edges, g_ppm)``; G above the E[G] ≈ W/(N(N−1))
    baseline means HIGH values cluster."""
    cells = cell_counts(points, x_col, y_col, cell)
    glob = cells.agg(
        F.sum("x").alias("s_tot"),
        F.sum(
            F.col("x").cast("decimal(18,0)")
            * F.col("x").cast("decimal(18,0)")
        ).alias("s_sq"),
        F.count(F.lit(1)).alias("n_cells"),
    )
    offs = F.expr("array(-1, 0, 1)")
    nbr = (
        cells.withColumn("ox", F.explode(offs))
        .withColumn("oy", F.explode(offs))
        .where("ox != 0 OR oy != 0")
        .select(
            (F.col("cx") + F.col("ox")).alias("dx"),
            (F.col("cy") + F.col("oy")).alias("dy"),
            F.col("x").alias("x_src"),
        )
    )
    dst = cells.select(
        F.col("cx").alias("dx"),
        F.col("cy").alias("dy"),
        F.col("x").alias("x_dst"),
    )
    num_w = nbr.join(dst, ["dx", "dy"]).agg(
        F.sum(
            F.col("x_src").cast("decimal(18,0)")
            * F.col("x_dst").cast("decimal(18,0)")
        ).alias("num"),
        F.count(F.lit(1)).alias("w_edges"),
    )
    # a layer with NO adjacent occupied cells has an empty pair set:
    # the one-row aggregate then carries num = NULL, and G is 0, not
    # unknown (same COALESCE stance as the colocation quotient)
    return num_w.join(F.broadcast(glob)).select(
        "n_cells",
        "w_edges",
        F.expr(
            "CAST((COALESCE(CAST(num AS DECIMAL(38,0)), 0) * 1000000) "
            "div (CAST(s_tot AS DECIMAL(38,0)) * s_tot - s_sq) "
            "AS BIGINT)"
        ).alias("g_ppm"),
    )


def sql_general_g(
    points_sql: str,
    x_col: str = "mx",
    y_col: str = "my",
    cell: int = GRID_GRAPH_CELL,
) -> str:
    fx_ = _fd(x_col, cell, "duckdb")
    fy_ = _fd(y_col, cell, "duckdb")
    return (
        f"WITH pts AS ({points_sql}), "
        f"cells AS (SELECT {fx_} AS cx, {fy_} AS cy, COUNT(*) AS x "
        f"FROM pts GROUP BY 1, 2), "
        "gl AS (SELECT SUM(x) AS s_tot, "
        "SUM(x::HUGEINT * x) AS s_sq, COUNT(*) AS n_cells FROM cells), "
        "nw AS (SELECT SUM(a.x::HUGEINT * b.x) AS num, "
        "COUNT(*) AS w_edges FROM cells a JOIN cells b "
        "ON ABS(a.cx - b.cx) <= 1 AND ABS(a.cy - b.cy) <= 1 "
        "AND (a.cx <> b.cx OR a.cy <> b.cy)) "
        "SELECT n_cells, w_edges, "
        "CAST((COALESCE(num, 0)::HUGEINT * 1000000) // "
        "(s_tot::HUGEINT * s_tot - s_sq) AS BIGINT) AS g_ppm "
        "FROM nw, gl"
    )


def bivariate_moran(
    points_a: DataFrame,
    points_b: DataFrame,
    cell: int = GRID_GRAPH_CELL,
) -> DataFrame:
    """Bivariate spatial cross-correlation (Wartenberg 1985 / GeoDa's
    bivariate Moran): does layer A's density relate to layer B's
    density in the SURROUNDING cells? Over the UNION of occupied
    cells (zero-filled per layer — dropping a cell absent from one
    layer biases the cross-product), with N-scaled deviations
    ``za_i = N·a_i − Sa`` and queen weights:
    ``I_AB = N·Σij w_ij·za_i·zb_j / (W·√(Σza²)·√(Σzb²))``.
    The two square roots cannot be exact — and the tempting signed
    SQUARE ``N²·num²·10¹²/(W²·Σza²·Σzb²)`` overflows 128-bit at sf1
    magnitudes (num ~ 10¹⁸ squared is 10³⁶ BEFORE the N²·10¹²
    factors — caught in design) — so the engine emits the exact
    DUAL-SLOPE form: ``slope_ab = 10⁶·N·num/(W·Σza²)`` (the
    regression coefficient of B's spatial lag on A — GeoDa's
    bivariate Moran is its standardized twin) and the mirrored
    ``slope_ba = 10⁶·N·num/(W·Σzb²)``; their product is exactly
    I_AB²·10¹² and each is overflow-safe and sign-portable (num can
    be negative → Euclidean-remainder floor, the morans_i
    convention). Output one row ``(n_cells, w_edges, slope_ab_ppm,
    slope_ba_ppm)``."""
    fdx, fdy = _fd("mx", cell, "spark"), _fd("my", cell, "spark")

    def raster(df, out):
        return (
            df.select(F.expr(fdx).alias("cx"), F.expr(fdy).alias("cy"))
            .groupBy("cx", "cy")
            .agg(F.count(F.lit(1)).alias(out))
        )
    ra, rb = raster(points_a, "a"), raster(points_b, "b")
    cells = (
        ra.join(rb, ["cx", "cy"], "full")
        .select(
            "cx",
            "cy",
            F.coalesce(F.col("a"), F.lit(0)).alias("a"),
            F.coalesce(F.col("b"), F.lit(0)).alias("b"),
        )
    )
    glob = cells.agg(
        F.sum("a").alias("sa"),
        F.sum("b").alias("sb"),
        F.count(F.lit(1)).alias("n"),
    )
    z = cells.join(F.broadcast(glob)).select(
        "cx",
        "cy",
        "n",
        (F.col("n") * F.col("a") - F.col("sa")).alias("za"),
        (F.col("n") * F.col("b") - F.col("sb")).alias("zb"),
    )
    dens = z.agg(
        F.sum(
            F.col("za").cast("decimal(18,0)")
            * F.col("za").cast("decimal(18,0)")
        ).alias("daa"),
        F.sum(
            F.col("zb").cast("decimal(18,0)")
            * F.col("zb").cast("decimal(18,0)")
        ).alias("dbb"),
        F.max("n").alias("n_cells"),
    )
    offs = F.expr("array(-1, 0, 1)")
    nbr = (
        z.withColumn("ox", F.explode(offs))
        .withColumn("oy", F.explode(offs))
        .where("ox != 0 OR oy != 0")
        .select(
            (F.col("cx") + F.col("ox")).alias("dx"),
            (F.col("cy") + F.col("oy")).alias("dy"),
            F.col("za").alias("za_src"),
        )
    )
    dst = z.select(
        F.col("cx").alias("dx"),
        F.col("cy").alias("dy"),
        F.col("zb").alias("zb_dst"),
    )
    num_w = nbr.join(dst, ["dx", "dy"]).agg(
        F.sum(
            F.col("za_src").cast("decimal(18,0)")
            * F.col("zb_dst").cast("decimal(18,0)")
        ).alias("num"),
        F.count(F.lit(1)).alias("w_edges"),
    )
    j = num_w.join(F.broadcast(dens))
    return j.select(
        "n_cells",
        "w_edges",
        F.expr("CAST((((CAST(n_cells AS DECIMAL(38,0)) * COALESCE(num, 0) * 1000000)) - ((((CAST(n_cells AS DECIMAL(38,0)) * COALESCE(num, 0) * 1000000) % (CAST(w_edges AS DECIMAL(38,0)) * daa)) + (CAST(w_edges AS DECIMAL(38,0)) * daa)) % (CAST(w_edges AS DECIMAL(38,0)) * daa))) div ((CAST(w_edges AS DECIMAL(38,0)) * daa)) AS BIGINT)").alias("slope_ab_ppm"),
        F.expr("CAST((((CAST(n_cells AS DECIMAL(38,0)) * COALESCE(num, 0) * 1000000)) - ((((CAST(n_cells AS DECIMAL(38,0)) * COALESCE(num, 0) * 1000000) % (CAST(w_edges AS DECIMAL(38,0)) * dbb)) + (CAST(w_edges AS DECIMAL(38,0)) * dbb)) % (CAST(w_edges AS DECIMAL(38,0)) * dbb))) div ((CAST(w_edges AS DECIMAL(38,0)) * dbb)) AS BIGINT)").alias("slope_ba_ppm"),
    )


def sql_bivariate_moran(
    points_a_sql: str,
    points_b_sql: str,
    cell: int = GRID_GRAPH_CELL,
) -> str:
    fx_ = _fd("mx", cell, "duckdb")
    fy_ = _fd("my", cell, "duckdb")
    return (
        f"WITH pa AS ({points_a_sql}), pb AS ({points_b_sql}), "
        f"ra AS (SELECT {fx_} AS cx, {fy_} AS cy, COUNT(*) AS a "
        f"FROM pa GROUP BY 1, 2), "
        f"rb AS (SELECT {fx_} AS cx, {fy_} AS cy, COUNT(*) AS b "
        f"FROM pb GROUP BY 1, 2), "
        "cells AS (SELECT COALESCE(ra.cx, rb.cx) AS cx, "
        "COALESCE(ra.cy, rb.cy) AS cy, COALESCE(a, 0) AS a, "
        "COALESCE(b, 0) AS b FROM ra FULL JOIN rb "
        "ON ra.cx = rb.cx AND ra.cy = rb.cy), "
        "gl AS (SELECT SUM(a) AS sa, SUM(b) AS sb, COUNT(*) AS n "
        "FROM cells), "
        "z AS (SELECT cx, cy, n, n * a - sa AS za, n * b - sb AS zb "
        "FROM cells, gl), "
        "dens AS (SELECT SUM(za::HUGEINT * za) AS daa, "
        "SUM(zb::HUGEINT * zb) AS dbb, MAX(n) AS n_cells FROM z), "
        "nw AS (SELECT SUM(x.za::HUGEINT * y.zb) AS num, "
        "COUNT(*) AS w_edges FROM z x JOIN z y "
        "ON ABS(x.cx - y.cx) <= 1 AND ABS(x.cy - y.cy) <= 1 "
        "AND (x.cx <> y.cx OR x.cy <> y.cy)) "
        "SELECT n_cells, w_edges, "
        "CAST((((n_cells::HUGEINT * COALESCE(num, 0) * 1000000)) - ((((n_cells::HUGEINT * COALESCE(num, 0) * 1000000) % (w_edges::HUGEINT * daa)) + (w_edges::HUGEINT * daa)) % (w_edges::HUGEINT * daa))) // ((w_edges::HUGEINT * daa)) AS BIGINT) AS slope_ab_ppm" ", "
        "CAST((((n_cells::HUGEINT * COALESCE(num, 0) * 1000000)) - ((((n_cells::HUGEINT * COALESCE(num, 0) * 1000000) % (w_edges::HUGEINT * dbb)) + (w_edges::HUGEINT * dbb)) % (w_edges::HUGEINT * dbb))) // ((w_edges::HUGEINT * dbb)) AS BIGINT) AS slope_ba_ppm" " "
        "FROM nw, dens"
    )


def percolation_ladder(
    points: DataFrame,
    thetas: tuple[int, ...] = (1, 2, 4, 8),
    cell: int = GRID_GRAPH_CELL,
) -> DataFrame:
    """Percolation transition curve over the density raster — the
    City Clustering Algorithm's sweep (Rozenfeld et al., PNAS 2008:
    cities are the connected clusters of cells above a density
    threshold; the curve of cluster count and largest-cluster size
    vs θ locates the percolation transition that separates 'one
    megaregion' from 'scattered towns'): for each threshold θ, keep
    cells with count ≥ θ, label 8-connected clusters, and emit one
    row ``(theta, occupied_cells, n_clusters, largest_cells)``.
    θ = 1 reproduces raster_clumps' component structure; rising θ
    erodes bridges first — the curve, not any single level, is the
    signal.

    Scale shape: the raster is built ONCE; each rung filters it
    (cheaper upward — cells shrink monotonically) and runs min-label
    propagation on the surviving cell graph. len(thetas) bounded
    label-propagation passes, each raster-sized."""
    from workstealing_spatial_join_spark.operators.graph import (
        connected_components,
    )

    raster = cell_counts(points, cell=cell)
    key = (
        F.col("cx") * F.lit(_PACK_SHIFT) + F.col("cy") + F.lit(_PACK_BIAS)
    )
    out = None
    for th in thetas:
        occ = raster.where(F.col("x") >= th).select(
            "cx", "cy", key.alias("node")
        )
        offs = F.expr("array(-1, 0, 1)")
        nbrs = (
            occ.withColumn("ox", F.explode(offs))
            .withColumn("oy", F.explode(offs))
            .where("ox != 0 OR oy != 0")
            .select(
                F.col("node").alias("src"),
                (
                    (F.col("cx") + F.col("ox")) * F.lit(_PACK_SHIFT)
                    + (F.col("cy") + F.col("oy"))
                    + F.lit(_PACK_BIAS)
                ).alias("dst"),
            )
        )
        edges = nbrs.join(
            occ.select(F.col("node").alias("dst")), "dst"
        )
        labels = connected_components(edges)
        labeled = occ.join(labels, "node", "left").select(
            F.coalesce(F.col("comp"), F.col("node")).alias("comp")
        )
        per_comp = labeled.groupBy("comp").agg(
            F.count(F.lit(1)).alias("n_cells")
        )
        row = per_comp.agg(
            F.lit(th).alias("theta"),
            F.sum("n_cells").alias("occupied_cells"),
            F.count(F.lit(1)).alias("n_clusters"),
            F.max("n_cells").alias("largest_cells"),
        ).select("theta", "occupied_cells", "n_clusters", "largest_cells")
        out = row if out is None else out.unionByName(row)
    return out


def sql_percolation_ladder(
    points_sql: str,
    thetas: tuple[int, ...] = (1, 2, 4, 8),
    cell: int = GRID_GRAPH_CELL,
) -> str:
    """DuckDB twin: one WITH RECURSIVE carrying a closure per rung
    over the SAME thresholded rasters."""
    fx = _fd("mx", cell, "duckdb")
    fy = _fd("my", cell, "duckdb")
    pack_a = f"(a.cx * {_PACK_SHIFT} + a.cy + {_PACK_BIAS})"
    pack_b = f"(b.cx * {_PACK_SHIFT} + b.cy + {_PACK_BIAS})"
    ctes = [
        f"pts AS ({points_sql})",
        f"raster AS (SELECT {fx} AS cx, {fy} AS cy, COUNT(*) AS x "
        f"FROM pts GROUP BY 1, 2)",
    ]
    selects = []
    for i, th in enumerate(thetas):
        ctes.append(
            f"occ{i} AS (SELECT cx, cy, "
            f"cx * {_PACK_SHIFT} + cy + {_PACK_BIAS} AS node "
            f"FROM raster WHERE x >= {th})"
        )
        ctes.append(
            f"e{i} AS MATERIALIZED (SELECT {pack_a} AS a, {pack_b} AS b "
            f"FROM occ{i} a JOIN occ{i} b "
            f"ON ABS(a.cx - b.cx) <= 1 AND ABS(a.cy - b.cy) <= 1 "
            f"AND (a.cx <> b.cx OR a.cy <> b.cy))"
        )
        ctes.append(
            f"n{i} AS (SELECT DISTINCT a AS n FROM e{i})"
        )
        ctes.append(
            f"reach{i}(src, dst) AS (SELECT n, n FROM n{i} "
            f"UNION SELECT r.src, e.b FROM reach{i} r "
            f"JOIN e{i} e ON r.dst = e.a)"
        )
        ctes.append(
            f"lab{i} AS (SELECT src AS node, MIN(dst) AS comp "
            f"FROM reach{i} GROUP BY 1)"
        )
        ctes.append(
            f"lb{i} AS (SELECT COALESCE(lab{i}.comp, occ{i}.node) AS comp "
            f"FROM occ{i} LEFT JOIN lab{i} ON occ{i}.node = lab{i}.node)"
        )
        ctes.append(
            f"pc{i} AS (SELECT comp, COUNT(*) AS n_cells FROM lb{i} "
            f"GROUP BY 1)"
        )
        selects.append(
            f"SELECT {th} AS theta, "
            f"CAST(SUM(n_cells) AS BIGINT) AS occupied_cells, "
            f"COUNT(*) AS n_clusters, MAX(n_cells) AS largest_cells "
            f"FROM pc{i}"
        )
    return (
        "WITH RECURSIVE " + ", ".join(ctes) + " "
        + " UNION ALL ".join(selects)
    )
