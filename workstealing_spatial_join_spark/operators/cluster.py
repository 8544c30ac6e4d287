"""Grid-density spatial clustering (DBSCAN-style, grid-quantized):
cells with ≥ ``min_pts`` points are *dense*; dense cells that touch
(8-neighborhood) merge into one cluster. The grid quantization is
what makes DBSCAN shapes tractable at 100 TB: density estimation is
ONE map-side-combinable groupBy on the cell key (never a pairwise
ε-ball join), and cluster merging is connected components over the
*cell* graph — whose size is bounded by the grid (≤ nx·ny nodes)
regardless of how many trillions of points fall in it.

This is the clustering a geo-referenced image corpus needs (capture
hot-spots, near-duplicate shoot locations) and the natural
post-processing of the reference's spatial self-join — its users
chain DBSCAN-style grouping after ST_Intersects (see
operators/graph.py note).

Planar convention: no antimeridian wrap (cells at lon ±180 are not
neighbors) — matching the engine's planar k_ring/grid convention;
the haversine operators own the wrap.

Scale shape: groupBy(cell) with partial aggregation → dense-cell set
(small by construction) → 8-way neighbor-key explode + one equi-join
for edges → hash-min label propagation (operators/graph.py, one
shuffle per round over the CELL graph, not the point table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from workstealing_spatial_join_spark.functions import grid as GRID
from workstealing_spatial_join_spark.operators.graph import (
    connected_components,
)

_KEY_MULT = 4294967296  # 2^32 — same composite key as grid.cell_id


def grid_density_clusters(
    points: DataFrame,
    lon: str = "lon",
    lat: str = "lat",
    cell_deg: float = 1.0,
    min_pts: int = 2,
    max_iter: int = 50,
) -> DataFrame:
    """``(cx, cy, n_points, cluster_id)`` — one row per DENSE cell;
    ``cluster_id`` is the minimum composite cell key reachable
    through touching dense cells (isolated dense cells cluster with
    themselves). Deterministic: min-label is order-independent."""
    cx = GRID.cell_x_col(F.col(lon), cell_deg)
    cy = GRID.cell_y_col(F.col(lat), cell_deg)
    dense = (
        points.select(cx.alias("cx"), cy.alias("cy"))
        .groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).alias("n_points"))
        .filter(F.col("n_points") >= min_pts)
        .withColumn(
            "cell", F.col("cx") * F.lit(_KEY_MULT).cast("long") + F.col("cy")
        )
    )
    # 8-neighbor edges among dense cells: explode each cell's
    # neighbor keys, equi-join back against the dense set. Keys at
    # the grid edge produce out-of-range neighbor keys that simply
    # never match (no wrap). cell < nb halves the edge list; the
    # component step symmetrizes.
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
            if not (dx == 0 and dy == 0)
        ]
    )
    nb = dense.select(
        "cell",
        F.explode(offsets).alias("o"),
        F.col("cx"),
        F.col("cy"),
    ).select(
        "cell",
        (
            (F.col("cx") + F.col("o.dx")) * F.lit(_KEY_MULT).cast("long")
            + (F.col("cy") + F.col("o.dy"))
        ).alias("nb"),
    )
    edges = nb.join(
        dense.select(F.col("cell").alias("nb")), "nb"
    ).filter(F.col("cell") < F.col("nb"))
    comp = connected_components(edges, "cell", "nb", max_iter=max_iter)
    return (
        dense.join(
            comp.withColumnRenamed("node", "cell"), "cell", "left"
        )
        .select(
            "cx",
            "cy",
            "n_points",
            F.coalesce(F.col("comp"), F.col("cell")).alias("cluster_id"),
        )
    )


def sql_grid_density_clusters(
    points_sql: str,
    lon: str = "lon",
    lat: str = "lat",
    cell_deg: float = 1.0,
    min_pts: int = 2,
) -> str:
    """DuckDB twin: same dense-cell derivation, exact recursive-CTE
    closure over the same touching-cell edges (schedule-free — see
    operators/graph.sql_connected_components). Returns a full
    ``WITH RECURSIVE ... SELECT`` statement."""
    from workstealing_spatial_join_spark.operators.graph import (
        sql_connected_components,
    )

    cxs = GRID.sql_cell_x(lon, cell_deg)
    cys = GRID.sql_cell_y(lat, cell_deg)
    edge_body = (
        "SELECT a.cell AS a, b.cell AS b FROM cellk a JOIN cellk b "
        "ON b.cx BETWEEN a.cx - 1 AND a.cx + 1 "
        "AND b.cy BETWEEN a.cy - 1 AND a.cy + 1 "
        "AND a.cell < b.cell"
    )
    return (
        f"WITH RECURSIVE pts AS (SELECT {cxs} AS cx, {cys} AS cy "
        f"FROM ({points_sql})), "
        "dense AS (SELECT cx, cy, COUNT(*) AS n FROM pts "
        f"GROUP BY cx, cy HAVING COUNT(*) >= {min_pts}), "
        f"cellk AS MATERIALIZED (SELECT cx * {_KEY_MULT} + cy AS cell, "
        "cx, cy, n FROM dense), "
        + sql_connected_components(edge_body)
        + "SELECT k.cx, k.cy, CAST(k.n AS BIGINT) AS n_points, "
        "COALESCE(r.comp, k.cell) AS cluster_id FROM cellk k "
        "LEFT JOIN (SELECT src, MIN(dst) AS comp FROM reach "
        "GROUP BY src) r ON k.cell = r.src"
    )
