"""Reference-parity driver API: the two entry shapes of the original
engine, re-expressed over this engine.

* ``spatial_join_files`` — tests/main.cpp:159 ``test_unpartition``:
  two line-delimited WKT (or hex-WKB) files, one compile-time
  predicate, result = ONE scalar. Here the predicate is a runtime
  argument and the scalar is a 1-row DataFrame.
* ``spatial_join_partitioned_files`` — tests/main.cpp:16 ``test``:
  pre-partitioned per-cell file pairs with per-cell multiplicity
  semantics (§3.2) — reproduced with dedup='parity'.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from workstealing_spatial_join_spark.operators.ingest import read_wkt_layer
from workstealing_spatial_join_spark.operators.spatial_join import polygon_join


def spatial_join_files(
    spark: SparkSession,
    path1: str,
    path2: str,
    predicate: str = "intersection_numpoints",
    fmt: str = "wkt",
    cell_deg: float = 1.0,
) -> DataFrame:
    """Unpartitioned two-file join → scalar ``join_count``:
    ST_INTERSECTION default sums intersection numPoints
    (src/thread_util.cpp:424-425); 'intersects' counts matches;
    'union_numpoints' sums union numPoints."""
    l1 = read_wkt_layer(spark, path1, fmt=fmt)
    l2 = read_wkt_layer(spark, path2, fmt=fmt)
    return polygon_join(
        l1, l2, "geom_id", "geom_id",
        predicate=predicate, mode="count", dedup="refpoint", cell_deg=cell_deg,
    )


def spatial_join_partitioned_files(
    spark: SparkSession,
    path1: str,
    path2: str,
    predicate: str = "intersects",
    fmt: str = "wkt",
    cell_deg: float = 1.0,
) -> DataFrame:
    """Pre-partitioned-driver parity: per-cell multiplicity counting —
    a pair co-occupying k cells counts k times (tests/main.cpp:99-104;
    src/thread_util.cpp:317; SURVEY.md §3.2)."""
    from pyspark.sql import functions as F

    l1 = read_wkt_layer(spark, path1, fmt=fmt)
    l2 = read_wkt_layer(spark, path2, fmt=fmt)
    pairs = polygon_join(
        l1, l2, "geom_id", "geom_id",
        predicate=predicate, mode="pairs", dedup="parity", cell_deg=cell_deg,
    )
    return pairs.agg(F.count(F.lit(1)).alias("join_count"))
