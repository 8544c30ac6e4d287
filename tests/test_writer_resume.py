"""Checkpointed-resume + lineage tests (SURVEY.md §5 strategy 5)."""

import pytest
from pyspark.sql import functions as F

from workstealing_spatial_join_spark.sources.writer import (
    read_lineage,
    read_table,
    verify_lineage,
    write_resumable,
)


@pytest.fixture()
def assignments(spark):
    return spark.range(1000).select(
        F.concat(F.lit("img"), F.col("id")).alias("image_id"),
        F.pmod(F.col("id"), F.lit(10)).alias("cell_id"),
        (F.col("id") * 3).alias("payload"),
    )


def test_write_then_resume_noop(assignments, tmp_path):
    path = str(tmp_path / "t1")
    s1 = write_resumable(assignments, path, "cell_id", job_id="j1")
    assert s1 == {"written_partitions": 10, "skipped_partitions": 0, "rows": 1000}
    # second run: everything already committed
    s2 = write_resumable(assignments, path, "cell_id", job_id="j2")
    assert s2["written_partitions"] == 0
    assert s2["skipped_partitions"] == 10
    spark = assignments.sparkSession
    assert read_table(spark, path).count() == 1000  # no duplicates
    assert verify_lineage(spark, path).count() == 0


def test_partial_failure_resume(assignments, tmp_path):
    """Simulate a job that died after committing 4 of 10 partitions:
    the resume writes exactly the missing 6, and the final table is
    complete with unique rows and complete lineage."""
    path = str(tmp_path / "t2")
    first_half = assignments.where(F.col("cell_id") < 4)
    write_resumable(first_half, path, "cell_id", job_id="j1")
    s = write_resumable(assignments, path, "cell_id", job_id="j2")
    assert s["written_partitions"] == 6
    assert s["skipped_partitions"] == 4
    spark = assignments.sparkSession
    data = read_table(spark, path)
    assert data.count() == 1000
    assert data.select("image_id").distinct().count() == 1000
    lin = read_lineage(spark, path)
    assert lin.count() == 10
    assert {r.job_id for r in lin.collect()} == {"j1", "j2"}
    assert verify_lineage(spark, path).count() == 0
    # checksum-level verification over the payload columns
    assert (
        verify_lineage(spark, path, columns=["image_id", "payload"]).count() == 0
    )
    # metrics rows recorded per job
    from workstealing_spatial_join_spark.sources.writer import read_metrics

    metrics = {r.job_id: r for r in read_metrics(spark, path).collect()}
    assert metrics["j1"].written_partitions == 4
    assert metrics["j2"].written_partitions == 6
    assert metrics["j2"].skipped_partitions == 4


def test_resume_overwrites_orphaned_partition_data(assignments, tmp_path):
    """Crash window: data files for a partition landed but the manifest
    row never committed. The resume must OVERWRITE the orphaned
    partition (dynamic partition overwrite), not append a duplicate."""
    path = str(tmp_path / "t4")
    write_resumable(assignments.where(F.col("cell_id") < 4), path, "cell_id", "j1")
    spark = assignments.sparkSession
    # plant orphaned data for partition 7 — present on disk, absent
    # from the manifest (exactly what a crash between the data write
    # and the manifest append leaves behind)
    assignments.where(F.col("cell_id") == 7).write.mode("append").partitionBy(
        "cell_id"
    ).parquet(f"{path}/data")
    assert read_table(spark, path).count() == 500  # 400 committed + 100 orphan
    s = write_resumable(assignments, path, "cell_id", job_id="j2")
    assert s["written_partitions"] == 6
    data = read_table(spark, path)
    assert data.count() == 1000  # orphan replaced, not duplicated
    assert data.select("image_id").distinct().count() == 1000
    assert verify_lineage(spark, path, columns=["image_id", "payload"]).count() == 0


def test_lineage_detects_tampering(assignments, tmp_path):
    """Corrupt one partition after commit → checksum verify flags it."""
    import glob
    import os

    path = str(tmp_path / "t3")
    write_resumable(assignments, path, "cell_id", job_id="j1")
    # delete a data file from one partition
    victim = glob.glob(f"{path}/data/cell_id=3/*.parquet")[0]
    os.remove(victim)
    spark = assignments.sparkSession
    bad = verify_lineage(spark, path, columns=["image_id", "payload"]).collect()
    assert any(r.pval == "3" for r in bad)


def test_coarse_blocks_bound_directory_count(spark, tmp_path):
    """2000 distinct packed cell_ids with target_partitions=32 →
    far fewer than 2000 directories, resume still idempotent at
    block granularity, and every original cell_id survives in the
    data files (verdict r2 #10)."""
    import glob

    path = str(tmp_path / "tc")
    df = spark.range(2000).select(
        F.concat(F.lit("img"), F.col("id")).alias("image_id"),
        # packed cell id: cx in 0..49, cy in 0..39
        (
            F.pmod(F.col("id"), F.lit(50)) * F.lit(4294967296).cast("long")
            + F.pmod(F.col("id"), F.lit(40))
        ).alias("cell_id"),
    )
    assert df.select("cell_id").distinct().count() == 200
    s1 = write_resumable(df, path, "cell_id", job_id="j1",
                         target_partitions=32)
    dirs = glob.glob(f"{path}/data/cell_id_block=*")
    assert 0 < len(dirs) <= 34  # 1.05 headroom over the target
    assert s1["written_partitions"] == len(dirs)
    assert s1["rows"] == 2000
    # resume: nothing new — and the SAME bits are reused from _meta
    s2 = write_resumable(df, path, "cell_id", job_id="j2",
                         target_partitions=4096)
    assert s2["written_partitions"] == 0
    assert s2["skipped_partitions"] == len(dirs)
    data = read_table(spark, path)
    assert data.count() == 2000
    # the raw cell_id column survives inside the files
    assert data.select("cell_id").distinct().count() == 200
    assert verify_lineage(spark, path).count() == 0
    assert verify_lineage(spark, path, columns=["image_id", "cell_id"]).count() == 0


def test_coarse_blocks_partial_resume(spark, tmp_path):
    """Half the blocks committed, crash, resume writes only the rest."""
    path = str(tmp_path / "tp")
    df = spark.range(1000).select(
        F.concat(F.lit("img"), F.col("id")).alias("image_id"),
        (
            F.pmod(F.col("id"), F.lit(16)) * F.lit(4294967296).cast("long")
            + F.pmod(F.col("id"), F.lit(16))
        ).alias("cell_id"),
    )
    first = df.where(F.pmod(F.col("id"), F.lit(16)) < 8)
    s1 = write_resumable(first, path, "cell_id", job_id="j1",
                         coarsen_bits=2)
    s2 = write_resumable(df, path, "cell_id", job_id="j2")
    assert s1["written_partitions"] == 2  # blocks 0,1 (cells 0-7 >> 2)
    assert s2["written_partitions"] == 2  # blocks 2,3
    assert s2["skipped_partitions"] == 2
    data = read_table(spark, path)
    assert data.count() == 1000
    assert data.select("image_id").distinct().count() == 1000


def test_string_partition_col_skips_coarsening(spark, tmp_path):
    """A non-integral partition column (tile_id strings) must never be
    block-coarsened (cast->NULL would collapse the layout); 'auto'
    degrades to raw partitioning, explicit bits raise."""
    path = str(tmp_path / "ts")
    df = spark.range(200).select(
        F.concat(F.lit("img"), F.col("id")).alias("image_id"),
        F.concat(F.lit("z6/"), (F.col("id") % 10).cast("string")).alias("tile_id"),
    )
    s = write_resumable(df, path, "tile_id", job_id="j1")
    assert s["written_partitions"] == 10
    assert read_table(spark, path).count() == 200
    with pytest.raises(ValueError, match="integral"):
        write_resumable(df, str(tmp_path / "ts2"), "tile_id", coarsen_bits=2)


def test_legacy_table_resume_never_coarsens(spark, tmp_path):
    """Round-3 review: a table written before _meta existed (manifest
    present, raw-cell layout) must resume with coarsen_bits=0 — auto-
    coarsening would anti-join block ids against raw-id pvals (silent
    skips on collisions) and fork the directory layout."""
    import glob
    import shutil

    path = str(tmp_path / "tl")
    df = spark.range(1000).select(
        F.concat(F.lit("img"), F.col("id")).alias("image_id"),
        F.pmod(F.col("id"), F.lit(10)).alias("cell_id"),
    )
    write_resumable(df.where(F.col("cell_id") < 4), path, "cell_id", "j1",
                    coarsen_bits=0)
    shutil.rmtree(f"{path}/_meta")  # simulate a pre-coarsening table
    s = write_resumable(df, path, "cell_id", job_id="j2")
    assert s["written_partitions"] == 6
    assert s["skipped_partitions"] == 4
    data = read_table(spark, path)
    assert data.count() == 1000
    assert data.select("image_id").distinct().count() == 1000
    # single layout: raw cell_id dirs only
    assert len(glob.glob(f"{path}/data/cell_id=*")) == 10
    assert glob.glob(f"{path}/data/cell_id_block=*") == []


def test_verify_lineage_ignores_decoy_block_column(spark, tmp_path):
    """ADVICE r3: a user data column that happens to end in '_block'
    must not shadow the real partition key — verify_lineage reads the
    exact column from _meta. With suffix-matching, the decoy column
    (constant 0) would aggregate everything into one bogus partition
    and report spurious mismatches."""
    path = str(tmp_path / "decoy")
    df = spark.range(300).select(
        F.concat(F.lit("img"), F.col("id")).alias("image_id"),
        F.pmod(F.col("id"), F.lit(7)).alias("cell_id"),
        F.lit(0).cast("long").alias("extent_block"),  # decoy
    )
    write_resumable(df, path, "cell_id", job_id="j1",
                    target_partitions=4)
    assert verify_lineage(spark, path).count() == 0
    assert verify_lineage(
        spark, path, columns=["image_id", "cell_id", "extent_block"]
    ).count() == 0
