"""Materialization sink: cell-partitioned writes with per-partition
lineage rows and checkpointed resume (north_rule: "materializing tile
assignments as Iceberg partitions with per-partition lineage rows and
checkpointed resume").

The reference has NO sink at all — results are a logged scalar
(src/thread_util.cpp:922-923); this is the upgrade S9 (SURVEY.md §2.1).

Iceberg gives atomic partition-level commits on a real cluster; this
sandbox has no Iceberg jars, so the writer detects availability and
falls back to a parquet directory layout with the same contract:

    <table>/data/cell_id=<v>/...parquet     partitioned data
    <table>/_manifest/...parquet            committed partition values
    <table>/_lineage/...parquet             per-partition lineage rows

Resume = anti-join the input's partitions against the manifest and
write only what's missing (idempotent at partition granularity —
dynamic partition overwrite makes a re-write of the same partition
replace, not duplicate). At 10^12 scale both the manifest and lineage
stay tiny (one row per partition), and the anti-join is a broadcast.
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def _manifest_partitions(spark: SparkSession, table_path: str) -> DataFrame | None:
    try:
        return spark.read.parquet(f"{table_path}/_manifest").select("pval").distinct()
    except Exception:
        return None  # first run — no manifest yet


def _coarsen_cell_expr(col, bits: int):
    """Block id for a packed cell_id (cx·2³² + cy): shift BOTH axes
    right by ``bits`` — a (2^bits)² cell block per directory. A plain
    ``cell_id >> k`` would coarsen only the y axis."""
    cx = F.shiftright(col, 32)
    cy = col.bitwiseAND(F.lit(4294967295))
    return (
        F.shiftright(cx, bits) * F.lit(4294967296).cast("long")
        + F.shiftright(cy, bits)
    )


ROWS_PER_PARTITION_TARGET = 50_000


def _auto_coarsen_bits(
    df: DataFrame, partition_col: str, target_partitions: int
) -> int:
    """Smallest per-axis shift whose block count fits the effective
    target — measured, not assumed (skewed layers don't shrink 4× per
    bit). ONE approx-distinct aggregate evaluates every candidate
    shift. The effective target scales with row count (≈1 block per
    50k rows, floor 64 for parallel writes, capped by
    ``target_partitions``): a 5k-row demo gets tens of directories, a
    10^12-row table gets the full cap — resume granularity follows
    (coarser blocks = coarser resume)."""
    col = F.col(partition_col).cast("long")
    ests = df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            F.approx_count_distinct(
                _coarsen_cell_expr(col, b) if b else col
            ).alias(f"b{b}")
            for b in range(0, 17, 2)
        ],
    ).collect()[0]
    target = min(
        target_partitions,
        max(64, ests["n_rows"] // ROWS_PER_PARTITION_TARGET),
    )
    for b in range(0, 17, 2):
        # approx_count_distinct err ~2%: 1.05 headroom keeps the
        # guarantee honest without overshooting a whole block level
        if ests[f"b{b}"] <= target * 1.05:
            return b
    return 16


def write_resumable(
    df: DataFrame,
    table_path: str,
    partition_col: str = "cell_id",
    job_id: str | None = None,
    coarsen_bits: int | str = "auto",
    target_partitions: int = 4096,
) -> dict:
    """Write ``df`` partitioned by ``partition_col`` with resume +
    lineage. Returns stats {written_partitions, skipped_partitions,
    rows}. Safe to re-run after a partial failure: already-committed
    partitions are skipped; a partition is committed only after its
    data files land (manifest row written last).

    File-count control (round-2 verdict #10): partitioning raw
    ``cell_id`` writes one directory per occupied cell — thousands of
    near-empty dirs at small scale, metadata pressure at any scale.
    ``coarsen_bits`` groups (2^bits)² cells into one COARSE BLOCK
    directory: 'auto' (default) picks the smallest shift whose block
    count stays ≤ ``target_partitions`` (one cheap approx-distinct
    pass; 0 when the raw cells already fit). The partition column in
    the layout is then ``<partition_col>_block``, the original column
    stays in the data files, and resume/manifest/lineage are keyed on
    the block (idempotency granularity = block)."""
    spark = df.sparkSession
    job_id = job_id or uuid.uuid4().hex[:12]
    # block coarsening is cell-id arithmetic — only integral partition
    # columns qualify (a string column like tile_id would cast to NULL
    # and collapse every row into one NULL block)
    integral = df.schema[partition_col].dataType.simpleString() in (
        "bigint", "int", "smallint", "tinyint"
    )
    if not integral and coarsen_bits == "auto":
        coarsen_bits = 0
    if not integral and coarsen_bits:
        raise ValueError(
            f"coarsen_bits needs an integral partition column; "
            f"{partition_col} is "
            f"{df.schema[partition_col].dataType.simpleString()}"
        )
    # a table's block size is part of its layout: the bits recorded on
    # first write are authoritative (a resume or a later batch using
    # different bits would alias block ids across layouts)
    try:
        recorded = int(
            spark.read.parquet(f"{table_path}/_meta")
            .select("coarsen_bits").first()[0]
        )
    except Exception:
        recorded = None
    if recorded is None and _manifest_partitions(spark, table_path) is not None:
        # legacy table: manifest exists but predates _meta — its pvals
        # are RAW partition values. Auto-coarsening here would anti-join
        # block ids against raw ids (silent skips where they collide)
        # and split the layout across two directory schemes.
        recorded = 0
    if recorded is not None:
        if coarsen_bits != "auto" and int(coarsen_bits) != recorded:
            raise ValueError(
                f"table {table_path} was written with coarsen_bits="
                f"{recorded}; got {coarsen_bits}"
            )
        coarsen_bits = recorded
    else:
        if coarsen_bits == "auto":
            coarsen_bits = _auto_coarsen_bits(
                df, partition_col, target_partitions
            )
        # record the partition column too: verify_lineage derives the
        # exact on-disk partition column from _meta instead of
        # suffix-matching data columns (a user column coincidentally
        # named *_block would otherwise shadow it — ADVICE r3)
        spark.createDataFrame(
            [(int(coarsen_bits), partition_col)],
            "coarsen_bits int, partition_col string",
        ).coalesce(1).write.mode("overwrite").parquet(f"{table_path}/_meta")
    if coarsen_bits:
        block_col = f"{partition_col}_block"
        df = df.withColumn(
            block_col,
            _coarsen_cell_expr(
                F.col(partition_col).cast("long"), int(coarsen_bits)
            ),
        )
        partition_col = block_col
    done = _manifest_partitions(spark, table_path)
    pending = df
    n_skipped = 0
    if done is not None:
        done = done.cache()
        n_skipped = done.count()
        pending = df.join(
            F.broadcast(done),
            on=df[partition_col].cast("string") == done["pval"],
            how="left_anti",
        )

    # lineage BEFORE write? No — compute alongside: per-partition row
    # count + order-insensitive checksum, from the same pending frame.
    lineage = pending.groupBy(
        F.col(partition_col).cast("string").alias("pval")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        # bit_xor: order-insensitive, overflow-free row checksum over
        # the NON-partition columns (the partition column's type does
        # not round-trip identically through directory partitioning)
        F.bit_xor(
            F.xxhash64(*[c for c in pending.columns if c != partition_col])
        ).alias("checksum"),
    )
    lineage = lineage.withColumn("job_id", F.lit(job_id)).withColumn(
        "written_at", F.lit(time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()))
    )
    # localCheckpoint (not cache): lineage's plan reads _manifest,
    # which this function appends to below — a lazy recompute after
    # that append would see its own output. Checkpointing severs the
    # plan so every later use reads the materialized result.
    lineage = lineage.localCheckpoint(eager=True)
    n_pending = lineage.count()
    if n_pending == 0:
        return {"written_partitions": 0, "skipped_partitions": n_skipped, "rows": 0}

    import time as _time

    t0 = _time.time()
    # Dynamic partition overwrite: re-writing a partition REPLACES its
    # files instead of appending. This is what makes resume idempotent
    # in the crash window where data landed but the manifest row did
    # not — the re-run re-selects that partition (absent from the
    # manifest) and overwrites the orphaned files rather than
    # duplicating rows. Iceberg's overwritePartitions() is the same
    # contract on a real cluster.
    prior = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            pending.write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(f"{table_path}/data")
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prior)
    # commit point: manifest + lineage written only after data lands
    lineage.select("pval", "job_id").write.mode("append").parquet(
        f"{table_path}/_manifest"
    )
    lineage.write.mode("append").parquet(f"{table_path}/_lineage")
    rows = int(lineage.agg(F.sum("n_rows")).collect()[0][0])
    # job-level metrics row (north_rule: per-partition lineage + metrics)
    spark.createDataFrame(
        [
            (
                job_id,
                n_pending,
                n_skipped,
                rows,
                round(_time.time() - t0, 3),
                time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            )
        ],
        "job_id string, written_partitions long, skipped_partitions long, "
        "rows long, write_seconds double, finished_at string",
    ).write.mode("append").parquet(f"{table_path}/_metrics")
    return {
        "written_partitions": n_pending,
        "skipped_partitions": n_skipped,
        "rows": rows,
    }


def read_table(spark: SparkSession, table_path: str) -> DataFrame:
    return spark.read.parquet(f"{table_path}/data")


def read_lineage(spark: SparkSession, table_path: str) -> DataFrame:
    return spark.read.parquet(f"{table_path}/_lineage")


def read_metrics(spark: SparkSession, table_path: str) -> DataFrame:
    return spark.read.parquet(f"{table_path}/_metrics")


def verify_lineage(
    spark: SparkSession,
    table_path: str,
    columns: list[str] | None = None,
) -> DataFrame:
    """Recompute per-partition counts (and, when ``columns`` gives the
    writer's original column order, bit_xor checksums) from the data
    files and diff against lineage — returns mismatching partitions
    (empty = intact).

    The partition column comes from ``_meta`` (exact name + whether a
    coarse ``<col>_block`` layout is in effect), so a user data column
    that happens to end in ``_block`` cannot shadow the real partition
    key (ADVICE r3). Suffix-matching remains only as the legacy
    fallback for tables written before ``_meta`` recorded the name."""
    data = read_table(spark, table_path)
    part = None
    try:
        meta = spark.read.parquet(f"{table_path}/_meta").first()
        base = meta["partition_col"]
        part = f"{base}_block" if int(meta["coarsen_bits"]) else base
    except Exception:
        pass
    if part is None or part not in data.columns:
        pcol = [c for c in data.columns if c.endswith("_block")] or [
            c for c in data.columns if c in ("cell_id", "pval")
        ]
        part = pcol[0] if pcol else data.columns[-1]
    lineage = read_lineage(spark, table_path)
    aggs = [F.count(F.lit(1)).alias("n_rows_actual")]
    if columns:
        aggs.append(F.bit_xor(F.xxhash64(*columns)).alias("checksum_actual"))
    actual = data.groupBy(F.col(part).cast("string").alias("pval")).agg(*aggs)
    lin_aggs = [F.sum("n_rows").alias("n_rows")]
    if columns:
        # partitions are written exactly once, so per-partition lineage
        # has one row; bit_xor folds them if a future writer splits
        lin_aggs.append(F.bit_xor("checksum").alias("checksum"))
    joined = (
        lineage.groupBy("pval").agg(*lin_aggs).join(actual, on="pval", how="full_outer")
    )
    bad = F.coalesce(F.col("n_rows"), F.lit(-1)) != F.coalesce(
        F.col("n_rows_actual"), F.lit(-2)
    )
    if columns:
        bad = bad | (
            F.coalesce(F.col("checksum"), F.lit(-1))
            != F.coalesce(F.col("checksum_actual"), F.lit(-2))
        )
    return joined.where(bad)
