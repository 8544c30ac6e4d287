"""Raster-tile ↔ vector-cell assignment (J7 — north_rule requirement;
no analog in the reference, SURVEY.md §2.3).

Tile scheme: fixed-zoom lat/lon tiling (NOT web-mercator — chosen so
the arithmetic is exact and DuckDB-oracle-expressible):
``tx = floor((lon+180)/360 * 2^z)``, ``ty = floor((90-lat)/180 * 2^z)``,
``tile_id = 'z{z}/{tx}/{ty}'``. Pure Catalyst; zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from workstealing_spatial_join_spark.functions import grid as GRID
from workstealing_spatial_join_spark.operators.spatial_join import tessellate_bbox


def tile_xy_cols(lon, lat, zoom: int):
    n = 2 ** zoom
    tx = F.least(
        F.greatest(F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(n)), F.lit(0)),
        F.lit(n - 1),
    ).cast("long")
    ty = F.least(
        F.greatest(F.floor((F.lit(90.0) - lat) / F.lit(180.0) * F.lit(n)), F.lit(0)),
        F.lit(n - 1),
    ).cast("long")
    return tx, ty


_TXY_CACHE: dict = {}


def tile_xy_named(lon: str, lat: str, zoom: int):
    """``tile_xy_cols`` over column NAMES, built once per process —
    the fluent construction costs ~30 py4j round trips per call and
    every caller uses fixed names (see functions/exprs.py)."""
    from workstealing_spatial_join_spark.functions.exprs import _gateway_key

    key = (_gateway_key(), lon, lat, zoom)
    v = _TXY_CACHE.get(key)
    if v is None:
        v = tile_xy_cols(F.col(lon), F.col(lat), zoom)
        _TXY_CACHE[key] = v
    return v


def sql_tile_xy(lon_expr: str, lat_expr: str, zoom: int) -> tuple[str, str]:
    """Identical tile arithmetic as ANSI SQL (DuckDB oracle)."""
    n = 2 ** zoom
    tx = (
        f"LEAST(GREATEST(CAST(FLOOR(({lon_expr} + 180.0) / 360.0 * {n}) AS BIGINT),"
        f" 0), {n - 1})"
    )
    ty = (
        f"LEAST(GREATEST(CAST(FLOOR((90.0 - {lat_expr}) / 180.0 * {n}) AS BIGINT),"
        f" 0), {n - 1})"
    )
    return tx, ty


def assign_tiles(
    points: DataFrame,
    zoom: int = 6,
    point_id: str = "image_id",
    lon: str = "lon",
    lat: str = "lat",
    cell_deg: float = GRID.DEFAULT_CELL_DEG,
    tile_id_format: str = "string",  # string | packed
) -> DataFrame:
    """Per-image tile + cell assignment: ``(image_id, tile_id,
    cell_id)`` — the north_rule's materialization unit. Pure Catalyst
    arithmetic; partition the sink by cell_id (see sources.writer).

    ``tile_id_format='packed'`` emits ``zoom<<58 | tx<<29 | ty`` as a
    LongType instead of 'z6/x/y' strings — at 10^12-image scale the
    string construction is an allocation/GC bottleneck and packed ids
    are the storage-correct choice (stringify at the edge, not in the
    pipeline)."""
    tx, ty = tile_xy_named(lon, lat, zoom)
    if tile_id_format == "packed":
        tile = (
            F.lit(zoom).cast("long") * F.lit(1 << 58).cast("long")
            + tx * F.lit(1 << 29).cast("long")
            + ty
        ).alias("tile_id")
    else:
        tile = F.concat(
            F.lit(f"z{zoom}/"), tx.cast("string"), F.lit("/"), ty.cast("string")
        ).alias("tile_id")
    return points.select(
        F.col(point_id).alias("image_id"),
        tile,
        GRID.cell_id_col(F.col(lon), F.col(lat), cell_deg).alias("cell_id"),
    )


def tile_grid(spark: SparkSession, zoom: int = 6) -> DataFrame:
    """Materialize the full tile grid with bounds — generated with
    ``spark.range`` (distributed), no driver-side loop."""
    n = 2 ** zoom
    df = spark.range(n * n).select(
        (F.col("id") / n).cast("long").alias("tx"),
        F.pmod(F.col("id"), F.lit(n)).cast("long").alias("ty"),
    )
    w = 360.0 / n
    h = 180.0 / n
    return df.select(
        F.concat(
            F.lit(f"z{zoom}/"),
            F.col("tx").cast("string"),
            F.lit("/"),
            F.col("ty").cast("string"),
        ).alias("tile_id"),
        (F.col("tx") * w - 180.0).alias("minx"),
        (F.lit(90.0) - (F.col("ty") + 1) * h).alias("miny"),
        ((F.col("tx") + 1) * w - 180.0).alias("maxx"),
        (F.lit(90.0) - F.col("ty") * h).alias("maxy"),
        F.lit(zoom).cast("int").alias("zoom"),
    )


def tile_cell_assignment(
    spark: SparkSession,
    zoom: int = 6,
    cell_deg: float = GRID.DEFAULT_CELL_DEG,
) -> DataFrame:
    """Raster-tile ↔ vector-cell covering map ``(tile_id, cell_id)``:
    each tile exploded to the grid cells its bbox intersects. Used to
    route tile-level work to cell-partitioned vector data."""
    # nudge the open edges inward so an exactly-shared boundary line
    # doesn't claim the neighboring cell
    eps = 1e-9
    tiles = tile_grid(spark, zoom).select(
        "tile_id",
        F.col("minx") + eps,
        F.col("miny") + eps,
        F.col("maxx") - eps,
        F.col("maxy") - eps,
    ).toDF("tile_id", "minx", "miny", "maxx", "maxy")
    return tessellate_bbox(tiles, cell_deg).select("tile_id", "cell_id")


def tile_density_rollup(
    points: DataFrame,
    zoom: int = 6,
    min_zoom: int = 0,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Multi-resolution tile density: per-tile image counts at every
    zoom level from ``zoom`` down to ``min_zoom`` — the hypertable-
    rollup shape (heatmap pyramids, tile-server density layers).

    Scale shape: ONE scan + ONE shuffle, total. Each point explodes
    to its (level, parent-tile) memberships (parent id = tile id >>
    shift — pure Catalyst bit arithmetic), then a single groupBy
    aggregates all levels at once. The explode multiplies rows
    (levels+1)× BEFORE aggregation, but hash-aggregation's map-side
    combine collapses them to ≤Σ4^z ≈ (4/3)·4^zoom counter rows per
    input partition before anything hits the wire — so the exchange
    carries counters, not points. (A per-level rollup ladder reads
    nicer on paper but Spark plans are trees, not DAGs: the lazy
    union of 7 chained aggregates re-scans the base once per level —
    the `.explain` actually showed 7 scans — and fixing that needs a
    cache with lifecycle baggage. One Expand + one Exchange is the
    plan you want at 10^12 points, and it's what GROUPING SETS would
    compile to, minus the null-marker columns.)

    Returns ``(zoom:int, tx:long, ty:long, n_images:long)``.
    """
    if min_zoom > zoom:
        raise ValueError("min_zoom must be <= zoom")
    tx, ty = tile_xy_named(lon, lat, zoom)
    return (
        points.select(tx.alias("tx"), ty.alias("ty"))
        .select(
            F.explode(
                F.sequence(F.lit(0), F.lit(zoom - min_zoom))
            ).alias("s"),
            "tx",
            "ty",
        )
        .groupBy(
            (F.lit(zoom) - F.col("s")).cast("int").alias("zoom"),
            F.expr("shiftright(tx, cast(s AS int))").alias("tx"),
            F.expr("shiftright(ty, cast(s AS int))").alias("ty"),
        )
        .agg(F.count(F.lit(1)).alias("n_images"))
    )


def compact_cells(
    tiles: DataFrame,
    zoom: int,
    min_zoom: int = 0,
    tx: str = "tx",
    ty: str = "ty",
    materialize: bool = True,
) -> DataFrame:
    """Quadtree compaction of an occupied-tile set (H3 `compactCells`
    analog on the quadkey grid): wherever all 4 children of a parent
    are occupied, the parent replaces them — applied recursively up
    to ``min_zoom``. The compacted set covers exactly the same area
    with the minimal number of mixed-resolution cells, which is what
    you hand to a polygon-coverage index or a tile prefetcher instead
    of 4^zoom fine cells.

    Input: distinct occupied ``(tx, ty)`` at ``zoom``. Output:
    ``(zoom:int, tx:long, ty:long)`` — a cell appears iff it is
    "complete" at its level (at the finest level: occupied) and its
    parent is NOT complete.

    Scale shape: the first groupBy is over the occupied-tile set
    (≤4^zoom rows — already an aggregate, tiny next to the imagery);
    each further level shrinks 4×. All joins are equi-joins on
    (parent tx, ty); the anti-join build sides are the next-coarser
    level (always the smallest involved), so Spark broadcasts them.
    ``materialize=True`` (default) eagerly local-checkpoints the
    distinct occupied set: the iterative levels reference it from
    2(zoom-min_zoom)+1 plan branches, and Spark plans are trees —
    without truncation every branch re-derives it from the BASE
    TABLE (the lazy plan showed 11 base scans at zoom 5). The
    checkpoint is bounded by 4^zoom rows, so this is always safe;
    pass False only when the input is already a materialized tiny
    relation."""
    if min_zoom > zoom:
        raise ValueError("min_zoom must be <= zoom")
    occupied = tiles.select(
        F.col(tx).cast("long").alias("tx"), F.col(ty).cast("long").alias("ty")
    ).distinct()
    if materialize:
        occupied = occupied.localCheckpoint(eager=True)
    complete = {zoom: occupied}
    for z in range(zoom - 1, min_zoom - 1, -1):
        complete[z] = (
            complete[z + 1]
            .groupBy(
                F.shiftright(F.col("tx"), 1).alias("tx"),
                F.shiftright(F.col("ty"), 1).alias("ty"),
            )
            .agg(F.count(F.lit(1)).alias("n_children"))
            .where(F.col("n_children") == 4)
            .select("tx", "ty")
        )
    parts = []
    for z in range(min_zoom, zoom + 1):
        keep = complete[z]
        if z > min_zoom:
            parents = complete[z - 1]
            keep = keep.join(
                parents.select(
                    F.col("tx").alias("ptx"), F.col("ty").alias("pty")
                ),
                (F.shiftright(F.col("tx"), 1) == F.col("ptx"))
                & (F.shiftright(F.col("ty"), 1) == F.col("pty")),
                "left_anti",
            )
        parts.append(
            keep.select(F.lit(z).cast("int").alias("zoom"), "tx", "ty")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def focal_sum(
    points: DataFrame,
    x_col: str = "mx",
    y_col: str = "my",
    cell: int = 8_192,
    radius: int = 1,
) -> DataFrame:
    """Focal (moving-window) statistics over the sparse raster of
    point counts — map algebra's FocalSum: for every cell, its own
    point count plus the total over the (2r+1)² neighborhood. The
    smoothing pass every density product runs before thresholding
    (hot-spot maps, heatmap tiles, KDE with a box kernel).

    Sparse-raster convention: a row is emitted for every cell whose
    NEIGHBORHOOD is non-empty (the dilated support), with own_n = 0
    for cells that are empty but near occupied ones — that boundary
    ring is exactly what thresholding needs; restricting to occupied
    cells would need a join-back, and emitting the full raster
    extent would be dense-matrix thinking at 10^12 points.

    Scale shape: one groupBy exchange to count per cell, a bounded
    (2r+1)² map-side explode of the counts, and ONE more groupBy
    exchange on the target cell. No join; Catalyst keeps both
    aggregations whole-stage-codegen'd."""
    fd_x = f"(({x_col}) - (((({x_col}) % {cell}) + {cell}) % {cell})) div {cell}"
    fd_y = f"(({y_col}) - (((({y_col}) % {cell}) + {cell}) % {cell})) div {cell}"
    counts = (
        points.select(F.expr(fd_x).alias("cx"), F.expr(fd_y).alias("cy"))
        .groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    offs = f"sequence({-radius}, {radius})"
    spread = (
        counts.withColumn("ox", F.explode(F.expr(offs)))
        .withColumn("oy", F.explode(F.expr(offs)))
        .select(
            (F.col("cx") + F.col("ox")).alias("tx"),
            (F.col("cy") + F.col("oy")).alias("ty"),
            F.col("n"),
            F.when(
                (F.col("ox") == 0) & (F.col("oy") == 0), F.col("n")
            ).otherwise(F.lit(0)).alias("own"),
        )
    )
    return spread.groupBy("tx", "ty").agg(
        F.sum("own").cast("long").alias("own_n"),
        F.sum("n").cast("long").alias("focal_n"),
    )


def sql_focal_sum(
    points_sql: str,
    x_col: str = "mx",
    y_col: str = "my",
    cell: int = 8_192,
    radius: int = 1,
) -> str:
    """DuckDB twin of :func:`focal_sum`."""
    fd_x = f"(({x_col}) - (((({x_col}) % {cell}) + {cell}) % {cell})) // {cell}"
    fd_y = f"(({y_col}) - (((({y_col}) % {cell}) + {cell}) % {cell})) // {cell}"
    return (
        f"WITH c AS (SELECT {fd_x} AS cx, {fd_y} AS cy, COUNT(*) AS n "
        f"FROM ({points_sql}) p GROUP BY 1, 2), "
        f"s AS (SELECT cx + ox AS tx, cy + oy AS ty, n, "
        f"CASE WHEN ox = 0 AND oy = 0 THEN n ELSE 0 END AS own "
        f"FROM c, UNNEST(generate_series({-radius}, {radius})) AS a(ox), "
        f"UNNEST(generate_series({-radius}, {radius})) AS b(oy)) "
        f"SELECT tx, ty, CAST(SUM(own) AS BIGINT) AS own_n, "
        f"CAST(SUM(n) AS BIGINT) AS focal_n FROM s GROUP BY tx, ty"
    )
