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


def _pythonpath_with_package() -> str:
    """PYTHONPATH that lets the JVM-launched Python daemon/workers
    import this package (the same importability every engine pandas
    UDF already needs): the package's parent dir prepended to the
    inherited PYTHONPATH."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if root in existing.split(os.pathsep):
        return existing
    return root + (os.pathsep + existing if existing else "")


def _warm_worker_pool(spark: SparkSession, cores: int) -> None:
    """Fork the Python-worker pool NOW, once per SparkContext (guide
    §4.5, moved to session init): the first pandas-UDF stage of a
    fresh session otherwise pays daemon start + N concurrent worker
    forks + Arrow serializer init — measured 2.6 s idle / ~10 s under
    load at 32 cores — charged to whichever query runs first. One
    trivial Arrow-UDF job with one task per core forks every worker
    up front; ``spark.python.worker.reuse`` (default on) keeps the
    pool alive for the session's real queries. Long-lived production
    sessions amortize this anyway; eager init just moves the cost to
    startup where it belongs. Disable with SPARK_GRAFT_WARM_WORKERS=0.
    """
    sc = spark.sparkContext
    if getattr(sc, "_wssj_workers_warm", False):
        return
    try:
        import pandas as pd  # noqa: F401
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        # no type annotations: string hints would resolve against
        # module globals (pandas is imported locally) and NameError
        # out of the warmup; the bare decorator defaults to SCALAR
        @F.pandas_udf(T.LongType())
        def _ident(x):
            return x

        sc.setJobDescription("session init: warm worker pool + exec stack")
        # one tiny job shaped like a real query — a shuffle, an Arrow
        # UDF stage, a filter and an aggregate — so the first USER
        # query does not pay JVM classloading + janino/codegen +
        # shuffle-system + Arrow-writer init on top of its own work
        # (measured: first job of a fresh 32-core session ~5.5 s for
        # a 20k-row count that takes 0.6 s once warm; the prewarm
        # itself costs a fraction of that at 32 rows/partitions)
        (
            spark.range(32 * cores, numPartitions=cores)
            .repartition(cores)
            .select(_ident(F.col("id")).alias("v"))
            .where(F.col("v") >= 0)
            .agg(F.count(F.lit(1)))
            .collect()
        )
        sc.setJobDescription(None)
        sc._wssj_workers_warm = True
    except Exception:
        pass


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
    # the daemon/worker processes inherit the JVM's env; make sure the
    # package is importable there BEFORE the JVM launches (no-op when
    # a context already exists — workers then import via cwd/PYTHONPATH
    # exactly as the engine's UDFs already require)
    os.environ["PYTHONPATH"] = _pythonpath_with_package()
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
        # worker-pool daemon with the engine's hot imports preloaded:
        # forked workers inherit numpy/pandas/pyarrow + the engine's
        # kernel modules via copy-on-write instead of 32 concurrent
        # cold imports at the first Python stage (guide §4.5, one
        # level up). Same importability contract as the UDFs
        # themselves; the module no-ops on any individual failure.
        .config(
            "spark.python.daemon.module",
            os.environ.get(
                "SPARK_GRAFT_DAEMON_MODULE",
                "workstealing_spatial_join_spark.daemon_preload",
            ),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if os.environ.get("SPARK_GRAFT_WARM_WORKERS", "1") != "0":
        _warm_worker_pool(spark, cores)
    return spark
