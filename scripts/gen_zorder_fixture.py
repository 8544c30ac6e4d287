"""Generate bench_data/zpoints — the Z-order-clustered parquet
fixture for the index-pruned window-scan operator (zrange_scan).

200k deterministic congruence points (sf-invariant, like the
images_meta fixture), Morton-keyed by the engine's own zorder_key,
laid out with cluster_by_zorder into 32 files so parquet min/max
stats on zkey genuinely prune: each file covers a compact key (and
hence spatial) window. Run once; the committed fixture equals this
script's output.
"""

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from workstealing_spatial_join_spark.operators.layout import (  # noqa: E402
    cluster_by_zorder,
)
from workstealing_spatial_join_spark.session import get_spark  # noqa: E402

OUT = "/root/repo/bench_data/zpoints"
N = 200_000


def main():
    spark = get_spark("gen-zpoints", cores=8, shuffle_partitions=32)
    pts = spark.range(1, N + 1).select(
        F.col("id").alias("point_id"),
        (
            (F.col("id") * 9973 % 360000).cast("double") / 1000.0 - 180.0
        ).alias("lon"),
        (
            (F.col("id") * 7919 % 180000).cast("double") / 1000.0 - 90.0
        ).alias("lat"),
    )
    clustered = cluster_by_zorder(pts, "lon", "lat", 32, key_col="zkey")
    clustered.write.mode("overwrite").parquet(OUT)
    print("wrote", OUT)
    spark.stop()


if __name__ == "__main__":
    main()
