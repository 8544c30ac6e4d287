"""SparkSession factory tuned for the spatial engine.

Local-mode testing uses ``local[N]``; the configs below are the ones
that also matter on a real multi-executor cluster (AQE, skew join,
Arrow batching). The reference engine's flow-control / memory
guardrail constants (include/global_var.h:45-54) map onto
``maxRecordsPerBatch`` and executor memory settings here.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "workstealing_spatial_join_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults.

    AQE + skew-join splitting is the Spark rebirth of the reference's
    work-stealing (SURVEY.md §2.6 LB2/LB4/LB5): many small tasks + the
    Spark scheduler give steal-equivalent granularity, and AQE splits
    oversized post-shuffle partitions at runtime.
    """
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(cores, DEFAULT_SHUFFLE_PARTITIONS)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        .config(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64m"
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # ~16 MB coordinate-buffer cap per steal message in the
        # reference (SEND_TASK_MAX_NUM_POINTS, include/global_var.h:53)
        # → bounded-but-large Arrow batches: fewer JVM↔Python IPC
        # round-trips per task (measured 2.6× on the refine stage at
        # 32 cores vs 10k batches)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "127.0.0.1")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
