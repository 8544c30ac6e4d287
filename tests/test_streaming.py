"""Streaming tile assignment: incremental processing via checkpoint
(only NEW files processed on re-run)."""

from pyspark.sql import functions as F

from workstealing_spatial_join_spark.sources import fixtures as FX
from workstealing_spatial_join_spark.streaming.ingest import (
    stream_events_hourly,
    stream_tile_assignments,
)


def test_stream_tile_assign_incremental(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    batch1 = spark.createDataFrame(FX.images_pdf(100, with_bytes=True))
    batch1.write.mode("append").parquet(src)
    stream_tile_assignments(spark, src, out, ckpt)
    n1 = spark.read.parquet(out).count()
    assert n1 == 100
    # second micro-batch: only the new file is processed
    batch2 = spark.createDataFrame(FX.images_pdf(150, with_bytes=True)).where(
        F.col("image_id") >= "img000000000100"
    )
    batch2.write.mode("append").parquet(src)
    stream_tile_assignments(spark, src, out, ckpt)
    result = spark.read.parquet(out)
    assert result.count() == 150
    assert result.select("image_id").distinct().count() == 150
    cols = set(result.columns)
    assert {"image_id", "tile_id", "cell_id"} <= cols


def test_stream_events_hourly(spark, tmp_path):
    src = str(tmp_path / "esrc")
    out = str(tmp_path / "eout")
    ckpt = str(tmp_path / "eckpt")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.write.mode("append").parquet(src)
    stream_events_hourly(spark, src, out, ckpt)
    got = spark.read.parquet(out)
    # append mode emits only windows closed by the watermark; with a
    # finite backlog the last windows stay open — compare a prefix
    batch = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )
    g = {(r.window_start, r.event_type): r.n_events for r in got.collect()}
    b = {(r.window_start, r.event_type): r.n_events for r in batch.collect()}
    assert len(g) > 0
    for k, v in g.items():
        assert b[k] == v  # every emitted window matches the batch truth
