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


# -------------------------------------------------------------- DBSCAN

DBSCAN_EPS = 2_000      # milli; Euclidean ε (ε² exact in int64)
DBSCAN_MIN_PTS = 5      # neighborhood size INCLUDING the point itself


def _fd_expr(col: str, cell: int, dialect: str) -> str:
    m = f"(((({col}) % {cell}) + {cell}) % {cell})"
    op = "//" if dialect == "duckdb" else "div"
    return f"((({col}) - {m}) {op} {cell})"


def dbscan(
    points: DataFrame,
    eps: int = DBSCAN_EPS,
    min_pts: int = DBSCAN_MIN_PTS,
    x_col: str = "mx",
    y_col: str = "my",
    id_col: str = "point_id",
    max_iter: int = 50,
) -> DataFrame:
    """EXACT point-level DBSCAN (Ester et al., KDD 1996) under the
    Euclidean metric with integer coordinates — ``(point_id,
    cluster, role)`` for every non-noise point, ``role`` ∈ {core,
    border}, ``cluster`` = the minimum core id of the density-
    connected component (deterministic; textbook DBSCAN assigns a
    boundary point shared by two clusters arbitrarily — here it takes
    the MINIMUM candidate cluster, documented and mirrored in the
    oracle). dx²+dy² ≤ ε² is exact int64, so core status can never
    waver on a boundary-distance pair.

    Decomposition for 10^12 points (the RDD-DBSCAN / DBSCAN-on-Spark
    shape, rebuilt on DataFrames): ε-neighborhood pairs via the
    engine's standard grid filter (3×3 ring explode at cell = ε
    against the unique home cell — each ORDERED pair meets exactly
    once, so the degree count needs no dedup), one groupBy for
    degrees, then hash-min label propagation over the CORE-CORE edge
    list only (operators/graph.py) — the iteration never touches
    border or noise points, and borders attach with one extra join.
    Noise never appears in any post-filter exchange."""
    fd = _fd_expr(x_col, eps, "spark"), _fd_expr(y_col, eps, "spark")
    base = points.select(
        F.col(id_col).alias("pid"),
        F.col(x_col).alias("px"),
        F.col(y_col).alias("py"),
        F.expr(fd[0]).alias("hcx"),
        F.expr(fd[1]).alias("hcy"),
    )
    offs = F.expr("array(-1, 0, 1)")
    a = (
        base.withColumn("ox", F.explode(offs))
        .withColumn("oy", F.explode(offs))
        .select(
            F.col("pid").alias("id_a"),
            F.col("px").alias("ax"),
            F.col("py").alias("ay"),
            (F.col("hcx") + F.col("ox")).alias("cx"),
            (F.col("hcy") + F.col("oy")).alias("cy"),
        )
    )
    b = base.select(
        F.col("pid").alias("id_b"),
        F.col("px").alias("bx"),
        F.col("py").alias("by"),
        F.col("hcx").alias("cx"),
        F.col("hcy").alias("cy"),
    )
    pairs = (
        a.join(b, ["cx", "cy"])
        .where(F.col("id_a") != F.col("id_b"))
        .where(
            (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx"))
            + (F.col("ay") - F.col("by")) * (F.col("ay") - F.col("by"))
            <= F.lit(eps * eps)
        )
        .select("id_a", "id_b")
    )
    deg = pairs.groupBy("id_a").agg(F.count(F.lit(1)).alias("n_nbr"))
    cores = deg.where(F.col("n_nbr") >= min_pts - 1).select(
        F.col("id_a").alias("pid")
    )
    core_a = cores.select(F.col("pid").alias("id_a"))
    core_b = cores.select(F.col("pid").alias("id_b"))
    core_edges = (
        pairs.join(core_a, "id_a")
        .join(core_b, "id_b")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    comp = connected_components(
        core_edges, src="id_a", dst="id_b", max_iter=max_iter
    )
    core_lab = cores.join(
        comp.withColumnRenamed("node", "pid"), "pid", "left"
    ).select(
        "pid", F.coalesce(F.col("comp"), F.col("pid")).alias("cluster")
    )
    border = (
        pairs.join(
            cores.withColumnRenamed("pid", "id_a"), "id_a", "left_anti"
        )
        .join(
            core_lab.select(
                F.col("pid").alias("id_b"),
                F.col("cluster").alias("bcluster"),
            ),
            "id_b",
        )
        .groupBy("id_a")
        .agg(F.min("bcluster").alias("cluster"))
        .select(F.col("id_a").alias("pid"), "cluster")
    )
    return core_lab.withColumn("role", F.lit("core")).unionByName(
        border.withColumn("role", F.lit("border"))
    ).select(
        F.col("pid").alias(id_col), "cluster", "role"
    )


def sql_dbscan(
    points_sql: str,
    eps: int = DBSCAN_EPS,
    min_pts: int = DBSCAN_MIN_PTS,
    x_col: str = "mx",
    y_col: str = "my",
    id_col: str = "point_id",
) -> str:
    """DuckDB twin: brute bbox range self-join for the ε-pairs (no
    grid — a different candidate plan) + exact recursive-CTE closure
    for the core components (schedule-independent), so the contract
    validates the grid decomposition AND the iterative label
    propagation at once."""
    from workstealing_spatial_join_spark.operators.graph import (
        sql_connected_components,
    )

    cc = sql_connected_components(
        "SELECT id_a AS a, id_b AS b FROM core_edges"
    )
    return (
        f"WITH RECURSIVE pts AS ({points_sql}), "
        f"eps_pairs AS (SELECT a.{id_col} AS id_a, b.{id_col} AS id_b "
        f"FROM pts a JOIN pts b ON a.{id_col} <> b.{id_col} "
        f"AND a.{x_col} BETWEEN b.{x_col} - {eps} AND b.{x_col} + {eps} "
        f"AND a.{y_col} BETWEEN b.{y_col} - {eps} AND b.{y_col} + {eps} "
        f"AND (a.{x_col} - b.{x_col}) * (a.{x_col} - b.{x_col}) + "
        f"(a.{y_col} - b.{y_col}) * (a.{y_col} - b.{y_col}) "
        f"<= {eps * eps}), "
        f"deg AS (SELECT id_a, COUNT(*) AS n_nbr FROM eps_pairs GROUP BY 1), "
        f"cores AS (SELECT id_a AS pid FROM deg "
        f"WHERE n_nbr >= {min_pts} - 1), "
        f"core_edges AS (SELECT id_a, id_b FROM eps_pairs "
        f"WHERE id_a < id_b AND id_a IN (SELECT pid FROM cores) "
        f"AND id_b IN (SELECT pid FROM cores)), "
        f"{cc}"
        f", comp AS (SELECT src AS node, MIN(dst) AS comp FROM reach "
        f"GROUP BY src), "
        f"core_lab AS (SELECT c.pid, COALESCE(m.comp, c.pid) AS cluster "
        f"FROM cores c LEFT JOIN comp m ON m.node = c.pid), "
        f"border AS (SELECT p.id_a AS pid, MIN(l.cluster) AS cluster "
        f"FROM eps_pairs p JOIN core_lab l ON p.id_b = l.pid "
        f"WHERE p.id_a NOT IN (SELECT pid FROM cores) GROUP BY 1) "
        f"SELECT pid AS {id_col}, cluster, 'core' AS role FROM core_lab "
        f"UNION ALL "
        f"SELECT pid AS {id_col}, cluster, 'border' AS role FROM border"
    )
