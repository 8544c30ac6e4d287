"""Round-5 batch 29 (file numbering): image dup-cluster catalog,
geo-outlying exact duplicates, per-tile caption-quality manifest."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from workstealing_spatial_join_spark.operators.dedup import phash_neardup
from workstealing_spatial_join_spark.operators.graph import (
    connected_components,
)
from workstealing_spatial_join_spark.plans.planner import audit_plan


def _img_df(spark, rows):
    return spark.createDataFrame(
        rows, "image_id string, phash long, lon double, lat double,"
        " caption string"
    )


# ----------------------------------------------- dup-cluster catalog


def test_dup_cluster_catalog_composition(spark):
    # three images: a~b (hamming 1), b~c (hamming 2) -> one cluster
    # of 3 via transitivity even though a~c is hamming 3; d isolated
    rows = [
        ("a", 0b0111, 10.5, 10.5, "x"),
        ("b", 0b0110, 10.5, 10.5, "x"),      # same cell as a
        ("c", 0b0010, 50.5, -20.5, "x"),     # far cell
        ("d", 0xFFFF00000000, 0.0, 0.0, "x"),  # hamming >= 14 to all
    ]
    img = _img_df(spark, rows)
    pairs = phash_neardup(img, max_hamming=3)
    comp = connected_components(pairs, "image_id_a", "image_id_b")
    cells = img.select(
        "image_id",
        F.floor((F.col("lon") + 180.0) / 1.0).alias("cx"),
        F.floor((F.col("lat") + 90.0) / 1.0).alias("cy"),
    )
    cat = (
        comp.join(cells, comp["node"] == cells["image_id"])
        .groupBy(F.col("comp").alias("component"))
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.greatest(
                F.max("cx") - F.min("cx"), F.max("cy") - F.min("cy")
            ).alias("spread_cells"),
        )
        .collect()
    )
    got = {r["component"]: (r["n_images"], r["spread_cells"])
           for r in cat}
    # one cluster rooted at min id "a", spanning the two cells
    assert got == {"a": (3, 40)}


def test_dup_cluster_min_label_deterministic(spark):
    rows = [
        ("z9", 0, 0.5, 0.5, "x"),
        ("a1", 1, 0.5, 0.5, "x"),
        ("m5", 3, 0.5, 0.5, "x"),
    ]
    img = _img_df(spark, rows)
    pairs = phash_neardup(img, max_hamming=3)
    comp = connected_components(pairs, "image_id_a", "image_id_b")
    labels = {r["node"]: r["comp"] for r in comp.collect()}
    assert set(labels.values()) == {"a1"}


# --------------------------------------------------- geo outliers


def test_geo_outliers_far_dups_only(spark):
    rows = [
        # exact dup 60 cells apart -> outlier
        ("a", 7, 10.5, 10.5, "x"), ("b", 7, 70.5, 10.5, "x"),
        # exact dup in the same cell -> burst shot, not an outlier
        ("c", 9, 20.2, 20.2, "x"), ("d", 9, 20.3, 20.3, "x"),
        # dup 3 cells apart -> below the spread threshold (5)
        ("e", 11, 30.5, 30.5, "x"), ("f", 11, 33.5, 30.5, "x"),
        # unique phash far from everything
        ("g", 13, -100.5, -50.5, "x"),
    ]
    img = _img_df(spark, rows)
    cells = img.select(
        "phash",
        F.floor((F.col("lon") + 180.0) / 1.0).alias("cx"),
        F.floor((F.col("lat") + 90.0) / 1.0).alias("cy"),
    )
    g = cells.groupBy("phash").agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.greatest(
            F.max("cx") - F.min("cx"), F.max("cy") - F.min("cy")
        ).alias("spread_cells"),
    )
    out = g.where(
        (F.col("n_copies") >= 2) & (F.col("spread_cells") >= 5)
    ).collect()
    assert {r["phash"] for r in out} == {7}
    assert out[0]["spread_cells"] == 60


def test_geo_outliers_driver_query_plan(spark):
    import __spark_entry__ as E

    df = E.q_phash_geo_outliers(spark, "/root/testdata/sf0.001")
    audit = audit_plan(df)
    assert sum(audit["python_nodes"].values()) == 0
    # single aggregation pipeline: at most one exchange
    assert audit["exchanges"] <= 1


# ------------------------------------------------- caption manifest


def test_caption_stats_token_convention(spark):
    import __spark_entry__ as E

    rows = [
        ("a", 1, 0.5, 0.5, "three word caption"),
        ("b", 2, 0.5, 0.5, "  "),                      # blank -> 0
        ("c", 3, 0.5, 0.5, "one two three four five"),
        ("d", 4, 50.5, 0.5, "short one"),
    ]
    img = _img_df(spark, rows)
    from workstealing_spatial_join_spark.operators.textops import (
        token_count_col,
    )

    cells = img.select(
        F.floor((F.col("lon") + 180.0) / 1.0).alias("cx"),
        F.floor((F.col("lat") + 90.0) / 1.0).alias("cy"),
        token_count_col(F.col("caption")).cast("long").alias("tok"),
    )
    out = (
        cells.groupBy("cx", "cy")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.sum("tok").alias("tot_tokens"),
            F.expr(
                "CAST(SUM(tok) * 1000000 div COUNT(*) AS BIGINT)"
            ).alias("ppm"),
            F.sum(
                F.when(F.col("tok") < E.SHORT_CAPTION_TOKENS, 1)
                .otherwise(0)
            ).alias("n_short"),
        )
        .collect()
    )
    got = {(r["cx"], r["cy"]): (r["n_images"], r["tot_tokens"],
                                r["ppm"], r["n_short"])
           for r in out}
    # cell (180,90): captions 3, 0, 5 tokens -> tot 8, mean 2.666 ppm
    assert got[(180, 90)] == (3, 8, 8 * 10**6 // 3, 2)
    assert got[(230, 90)] == (1, 2, 2 * 10**6, 1)


def test_caption_stats_driver_query_plan(spark):
    import __spark_entry__ as E

    df = E.q_tile_caption_stats(spark, "/root/testdata/sf0.001")
    audit = audit_plan(df)
    assert sum(audit["python_nodes"].values()) == 0
    assert audit["exchanges"] <= 1
