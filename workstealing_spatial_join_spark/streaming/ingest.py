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


def project_image_payload(records: DataFrame) -> DataFrame:
    """Kafka-record frame → IMAGES_SCHEMA frame: decode the JSON
    ``value`` payload (binary columns ride as base64, Spark's standard
    JSON binary encoding — ``to_json``/``from_json`` round-trip) and
    explode the struct into the same columns the file source yields.
    Pure Catalyst and source-agnostic: it accepts ANY frame with a
    binary ``value`` column, so the projection itself is testable on a
    batch frame without a broker, and the downstream plan (tiles, PIP,
    windows) is IDENTICAL to the file-source pipeline's."""
    return records.select(
        F.from_json(F.col("value").cast("string"), IMAGES_SCHEMA).alias("r")
    ).select("r.*")


def read_image_stream_kafka(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    fail_on_data_loss: bool = True,
) -> DataFrame:
    """Continuous-ingest source: ``readStream.format("kafka")`` with
    the standard option surface, projected to IMAGES_SCHEMA via
    ``project_image_payload`` — downstream operators cannot tell this
    frame from ``read_image_stream``'s (plan-parity pytest). Requires
    the spark-sql-kafka connector jar on the cluster (absent from this
    sandbox, hence the projection is factored out and tested on a
    batch twin; this constructor raises Spark's own missing-provider
    error without the jar)."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", str(fail_on_data_loss).lower())
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option(
            "maxOffsetsPerTrigger", int(max_offsets_per_trigger)
        )
    return project_image_payload(reader.load())


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


def stream_sessionize(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    gap_minutes: int = 30,
    available_now: bool = True,
):
    """CUSTOM STATEFUL streaming operator (applyInPandasWithState):
    per-user sessionization over an event file-stream. Per-user state
    = (session_start, last_ts, n_events) epochs; a batch's events
    extend the open session or CLOSE it when the gap exceeds
    ``gap_minutes`` — closed sessions are emitted as
    ``(user_id, session_start, session_end, n_events)``.

    State lives in the streaming state store under ``checkpoint_dir``:
    a later availableNow run RESUMES open sessions across process
    restarts (tested), which is the stateful analog of the batch
    writer's checkpointed resume."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap = gap_minutes * 60

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        (user,) = key
        if state.exists:
            st, last, n = state.get
        else:
            st, last, n = None, None, 0
        closed = []
        epochs = []
        for pdf in pdfs:
            epochs.append(pdf["epoch"].to_numpy())
        import numpy as np

        ts = np.sort(np.concatenate(epochs)) if epochs else np.array([])
        for t in ts:
            t = int(t)
            if last is None:
                st, last, n = t, t, 1
            elif t - last > gap:
                closed.append((user, st, last, n))
                st, last, n = t, t, 1
            else:
                # events sort within a batch but a LATE event can
                # arrive in a later micro-batch: it joins the open
                # session without rewinding last_ts (a rewind would
                # corrupt the gap test and emit end < start)
                last, n = max(last, t), n + 1
        if last is not None:
            state.update((st, last, n))
        yield pd.DataFrame(
            closed,
            columns=["user_id", "session_start", "session_end", "n_events"],
        )

    ev = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
        .select("user_id", F.col("ts").cast("long").alias("epoch"))
    )
    sessions = ev.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=(
            "user_id long, session_start long, session_end long, n_events long"
        ),
        stateStructType="session_start long, last_ts long, n long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    writer = (
        sessions.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
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


def stream_point_in_polygon(
    spark: SparkSession,
    source_dir: str,
    polygons,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """STREAMING twin of the headline operator: continuously join
    arriving image batches against a (slowly-changing) polygon layer —
    the steady-state shape of a 10^12-image geotagging pipeline.

    The SAME ``point_in_polygon_join`` runs on the streaming frame
    (stream/batch unification): tessellation is stateless Catalyst, the
    cell equi-join is a supported STREAM-STATIC join (the static side
    is the prepared layer's cached tessellation + broadcast geometry
    dictionary), and the refine predicate is the same broadcast-dict
    pandas UDF. Exactly-once append via the parquet sink + streaming
    checkpoint; availableNow drains the backlog and stops, and a later
    run processes only NEW files.

    ``polygons`` is a static DataFrame or a ``PreparedPolygonLayer``
    (prepare once, reuse across micro-batches AND across runs)."""
    from workstealing_spatial_join_spark.operators.spatial_join import (
        point_in_polygon_join,
    )

    stream = read_image_stream(spark, source_dir)
    pairs = point_in_polygon_join(stream, polygons, mode="pairs")
    writer = (
        pairs.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def stream_exact_dedup(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: str = (
        "doc_id long, ts timestamp, text string"
    ),
    hash_cols: tuple[str, ...] = ("text",),
    event_time_col: str = "ts",
    watermark: str = "1 hour",
    available_now: bool = True,
):
    """STREAMING twin of the batch ``exact_dedup`` (operators/dedup.py):
    first-writer-wins exact deduplication of a continuously arriving
    corpus — the ingest-time gate a 10^12-document training pipeline
    puts in front of its store so duplicates never land at all.

    The dedup key is the SAME md5-of-content convention as the batch
    operator; state is bounded by ``dropDuplicatesWithinWatermark``:
    a duplicate arriving within the watermark horizon of its original
    is dropped, and the state store evicts hashes older than the
    horizon instead of growing forever (a plain streaming
    ``dropDuplicates`` keeps EVERY hash — unbounded state, wrong shape
    at scale; late duplicates beyond the horizon are the batch
    compaction pass's job, which is exactly how production pipelines
    split the work). Exactly-once append via the parquet sink +
    checkpoint; a later availableNow run resumes the hash state from
    the state store, so a duplicate in a NEW file of a SECOND run is
    still dropped (tested).
    """
    rec = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
        .withColumn(
            "content_hash", F.md5(F.concat_ws("\x1f", *hash_cols))
        )
        .withWatermark(event_time_col, watermark)
    )
    deduped = rec.dropDuplicatesWithinWatermark(["content_hash"])
    writer = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def stream_tile_daily(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "2 days",
    available_now: bool = True,
):
    """Tiled-position file-stream → watermarked DAILY space-time cube
    → append sink: the streaming twin of the (tile, day) cube every
    batch trajectory operator (bursts, Mann-Kendall, emerging hot
    spots, runs test, lifecycle) consumes. Input records arrive
    already tiled — ``(user_id long, ts timestamp, tx long,
    ty long)`` — because tiling is a stateless per-row map the ingest
    edge applies (the batch twin's window-derived sticky fixture
    needs a per-user row_number, which Structured Streaming forbids;
    REAL deployments tile from GPS coordinates, stateless). The
    1-day event-time window aligns to UTC epoch days — the SAME
    boundary as the batch cube's ``epoch_us div 86400000000`` — so a
    batch groupBy over the same records is row-identical (the parity
    test's assertion). The watermark bounds state; records later
    than its delay drop per the Structured Streaming contract."""
    pos = (
        spark.readStream.schema(
            "user_id long, ts timestamp, tx long, ty long"
        )
        .parquet(source_dir)
    )
    agg = (
        pos.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("w"), "tx", "ty")
        .agg(F.count(F.lit(1)).alias("x"))
        .select(
            F.expr(
                "CAST(unix_micros(w.start) div 86400000000 AS BIGINT)"
            ).alias("day"),
            "tx",
            "ty",
            "x",
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
