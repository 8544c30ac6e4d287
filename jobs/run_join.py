"""spark-submit entry point for the headline spatial-join + tiling
pipeline (north_rule launch shape:
``spark-submit --py-files engine.zip jobs/run_join.py ...``).

Builds nothing driver-side beyond the plan: reads the image table
(parquet dir or Iceberg table on a real cluster), the polygon layer,
runs the PIP join, materializes (image_id, tile_id, cell_id[, poly])
with lineage + resume via sources.writer.

Usage:
  spark-submit --py-files engine.zip jobs/run_join.py \
      --images <path> --polygons <path> --out <table_path> \
      [--mode pairs|count] [--cell-deg 1.0] [--zoom 6] [--job-id j1]

Build engine.zip with: python jobs/build_pyfiles.py
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession

from workstealing_spatial_join_spark.operators.spatial_join import (
    point_in_polygon_join,
)
from workstealing_spatial_join_spark.operators.tiles import assign_tiles
from workstealing_spatial_join_spark.sources.writer import write_resumable


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True)
    ap.add_argument("--polygons", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--mode", default="pairs")
    ap.add_argument("--cell-deg", type=float, default=1.0)
    ap.add_argument("--zoom", type=int, default=6)
    ap.add_argument("--job-id", default=None)
    args = ap.parse_args()

    # on a cluster the session comes from spark-submit confs
    spark = SparkSession.builder.getOrCreate()
    images = spark.read.parquet(args.images)
    polygons = spark.read.parquet(args.polygons)

    if args.mode == "count":
        n = point_in_polygon_join(
            images, polygons, mode="count", cell_deg=args.cell_deg
        ).collect()[0][0]
        print(json.dumps({"join_count": n}))
        return

    pairs = point_in_polygon_join(
        images, polygons, mode="pairs", cell_deg=args.cell_deg
    )
    tiles = assign_tiles(images, zoom=args.zoom, cell_deg=args.cell_deg)
    assignments = tiles.join(
        pairs.withColumnRenamed("point_id", "image_id"), on="image_id", how="left"
    )
    stats = write_resumable(assignments, args.out, "cell_id", job_id=args.job_id)
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
