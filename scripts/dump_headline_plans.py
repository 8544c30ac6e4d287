"""Dump .explain('formatted') for the bench.py headline entries that
are not in queries() (prepared-layer pip, salted pip, tile_assign,
knn) into plans/r06/<name>_<tag>.txt.

Usage: python scripts/dump_headline_plans.py <tag>
"""

import os
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from workstealing_spatial_join_spark.operators.knn import knn_join  # noqa: E402
from workstealing_spatial_join_spark.operators.spatial_join import (  # noqa: E402
    PreparedPolygonLayer,
    point_in_polygon_join,
)
from workstealing_spatial_join_spark.operators.tiles import assign_tiles  # noqa: E402
from workstealing_spatial_join_spark.session import get_spark  # noqa: E402


def main():
    tag = sys.argv[1]
    out_dir = "/root/repo/plans/r06"
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plans", cores=8, shuffle_partitions=8)
    bd = "/root/repo/bench_data"
    images = spark.read.parquet(f"{bd}/images_200000.parquet")
    polygons = spark.read.parquet(f"{bd}/polygons_10000.parquet")
    layer = PreparedPolygonLayer(polygons, poly_id="polygon_id")
    frames = {
        "spatial_join_pip": point_in_polygon_join(
            images, layer, mode="count"
        ),
        "spatial_join_pip_salted": point_in_polygon_join(
            images, layer, mode="count", salt=True
        ),
        "tile_assign": assign_tiles(images),
        # ONE round of the kNN loop has the representative plan; the
        # full operator is a driver loop of these
        "knn_images_round": knn_join(
            images.limit(5000), images, k=5, exclude_self=True,
            max_ring=1, initial_ring=1,
        ),
    }
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode
    for name, df in frames.items():
        text = df._jdf.queryExecution().explainString(
            mode.fromString("formatted")
        )
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(text)
        print(name, "written")
    spark.stop()


if __name__ == "__main__":
    main()
