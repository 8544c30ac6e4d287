"""Bucketed-layer co-located join: plan must show the bucketed side
scanning its catalog buckets with NO Exchange (only the probe side
shuffles), and results must equal the standard join."""

from pyspark.sql import functions as F

from workstealing_spatial_join_spark.operators.ingest import ingest_geometry
from workstealing_spatial_join_spark.operators.spatial_join import (
    point_in_polygon_join,
)
from workstealing_spatial_join_spark.sources import fixtures as FX
from workstealing_spatial_join_spark.sources.bucketed import (
    pip_join_bucketed,
    save_bucketed_polygon_layer,
)


def test_bucketed_join_plan_and_equality(spark, tmp_path):
    images = spark.createDataFrame(
        FX.images_pdf(3000, with_bytes=False)[["image_id", "lon", "lat"]]
    )
    polys = ingest_geometry(
        spark.createDataFrame(FX.polygons_pdf(200)), "wkt",
        keep_cols=["polygon_id"],
    )
    save_bucketed_polygon_layer(
        polys, "bucketed_polys", n_buckets=16,
        path=str(tmp_path / "bucketed_polys"),
    )
    try:
        df = pip_join_bucketed(images, "bucketed_polys")
        got = {(r.point_id, r.poly_id) for r in df.collect()}
        want = {
            (r.point_id, r.poly_id)
            for r in point_in_polygon_join(
                images, polys, mode="pairs"
            ).collect()
        }
        assert got == want and len(got) > 0

        # plan shape: the bucketed scan feeds the join WITHOUT an
        # Exchange; the probe side has exactly one (inspect the AQE
        # final plan only — the string repeats it as "Initial Plan")
        plan = df._jdf.queryExecution().executedPlan().toString()
        if "== Initial Plan ==" in plan:
            plan = plan[: plan.index("== Initial Plan ==")]
        assert "bucketed_polys" in plan
        assert "Bucketed: true" in plan, plan
        assert "SelectedBucketsCount" in plan, plan
        assert plan.count("Exchange hashpartitioning") == 1, plan
    finally:
        spark.sql("DROP TABLE IF EXISTS bucketed_polys")
