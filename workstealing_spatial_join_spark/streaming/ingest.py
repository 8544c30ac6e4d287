"""Streaming ingest: continuously geotag + tile-assign newly arriving
image metadata, and windowed event aggregation with late-data handling.

The reference has no streaming at all; the north_rule's "checkpointed
resume" is satisfied by the batch writer (sources/writer.py). These
operators add the continuous-ingest path a 10^12-image pipeline needs:
new image batches land as files (or Kafka on a real cluster), the
stream assigns tiles/cells and appends to the partitioned store, with
Structured Streaming checkpoints giving exactly-once file-sink
semantics.

Everything is expressed on the streaming DataFrame API — the same
assign_tiles Catalyst expressions as batch (stream/batch unification).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from workstealing_spatial_join_spark.operators.tiles import assign_tiles
from workstealing_spatial_join_spark.sources.fixtures import IMAGES_SCHEMA


def read_image_stream(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int = 16
) -> DataFrame:
    return (
        spark.readStream.schema(IMAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )


def stream_tile_assignments(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    zoom: int = 6,
    available_now: bool = True,
):
    """images file-stream → (image_id, tile_id, cell_id) append sink,
    partitioned by cell_id. availableNow=True drains the backlog and
    stops (batch-like run with full streaming checkpoint semantics —
    re-running later processes only NEW files)."""
    stream = read_image_stream(spark, source_dir)
    assigned = assign_tiles(stream, zoom=zoom)
    writer = (
        assigned.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("cell_id")
        .outputMode("append")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def stream_events_hourly(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "2 hours",
    available_now: bool = True,
):
    """events file-stream → watermarked hourly windowed counts →
    append sink. The watermark bounds state and drops data later than
    its delay (Structured Streaming's late-data contract)."""
    ev = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
        )
        .parquet(source_dir)
    )
    agg = (
        ev.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    writer = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
