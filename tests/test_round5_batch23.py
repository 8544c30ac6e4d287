"""Round-5 batch 23: multi-source BFS distance transform,
tile-stratified sampling, decayed density."""

from __future__ import annotations

import datetime as dt
import hashlib

from pyspark.sql import functions as F

from workstealing_spatial_join_spark.operators.graph import (
    multi_source_bfs,
    occupied_cell_edges,
)
from workstealing_spatial_join_spark.plans.planner import audit_plan

# ------------------------------------------------ distance transform


def _edges(spark, pts):
    df = spark.createDataFrame(pts, "mx long, my long")
    return occupied_cell_edges(df)


def test_msbfs_nearest_seed_wins(spark):
    # a 7-cell corridor with seeds at both ENDS: the middle cell's
    # distance must be min over seeds (3), not the first-seed BFS (6)
    pts = [(i * 8192, 0) for i in range(7)]
    seeds = spark.createDataFrame([(0, 0), (6, 0)], "nx long, ny long")
    got = {
        (r["nx"], r["ny"]): r["hop"]
        for r in multi_source_bfs(_edges(spark, pts), seeds).collect()
    }
    assert got == {
        (0, 0): 0, (1, 0): 1, (2, 0): 2, (3, 0): 3,
        (4, 0): 2, (5, 0): 1, (6, 0): 0,
    }


def test_msbfs_isolated_seed_and_unreachable(spark):
    # two far-apart cells: the seed is isolated (hop 0, no spread);
    # the other cell is unreachable and must be ABSENT
    pts = [(0, 0), (50 * 8192, 0)]
    seeds = spark.createDataFrame([(0, 0)], "nx long, ny long")
    got = {
        (r["nx"], r["ny"]): r["hop"]
        for r in multi_source_bfs(_edges(spark, pts), seeds).collect()
    }
    assert got == {(0, 0): 0}


def test_msbfs_max_hops_truncates(spark):
    pts = [(i * 8192, 0) for i in range(12)]
    seeds = spark.createDataFrame([(0, 0)], "nx long, ny long")
    got = {
        (r["nx"], r["ny"]): r["hop"]
        for r in multi_source_bfs(
            _edges(spark, pts), seeds, max_hops=4
        ).collect()
    }
    assert max(got.values()) == 4 and len(got) == 5


def test_dist_to_hotspot_seed_cells_are_zero(spark):
    import __spark_entry__ as E
    from workstealing_spatial_join_spark.operators.spatialstats import (
        cell_counts,
    )
    from workstealing_spatial_join_spark.sources import tables as TB

    sf = "/root/testdata/sf0.001"
    got = {
        (r["nx"], r["ny"]): r["hop"]
        for r in E.queries()["dist_to_hotspot"](spark, sf).collect()
    }
    hot = {
        (r["cx"], r["cy"])
        for r in cell_counts(TB.customer_cluster_points(spark, sf))
        .where(F.col("x") >= E.HOTSPOT_MIN_PTS)
        .collect()
    }
    assert hot and all(got[c] == 0 for c in hot)
    assert any(h > 0 for h in got.values())


# ------------------------------------------------------------ sample


def test_sample_cap_and_md5_winners(spark):
    import __spark_entry__ as E

    rows = E.queries()["tile_stratified_sample"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    per_tile: dict[tuple, list] = {}
    for r in rows:
        per_tile.setdefault((r["cx"], r["cy"]), []).append(r["image_id"])
    assert max(len(v) for v in per_tile.values()) <= E.SAMPLE_PER_TILE
    # replay one capped tile's winners in plain python
    full = {
        (r["cx"], r["cy"]): r["ids"]
        for r in spark.read.parquet(E._IMAGES_META_PATH)
        .select(
            "image_id",
            F.expr("CAST(FLOOR(lon) AS BIGINT)").alias("cx"),
            F.expr("CAST(FLOOR(lat) AS BIGINT)").alias("cy"),
        )
        .groupBy("cx", "cy")
        .agg(F.collect_list("image_id").alias("ids"))
        .collect()
    }
    capped = [k for k, v in full.items() if len(v) > E.SAMPLE_PER_TILE]
    assert capped  # the cap must be doing real work somewhere
    k = capped[0]
    want = sorted(
        full[k],
        key=lambda i: (hashlib.md5(i.encode()).hexdigest(), i),
    )[: E.SAMPLE_PER_TILE]
    assert sorted(per_tile[k]) == sorted(want)


# ------------------------------------------------------------- decay


def test_decay_weights_exact(spark, monkeypatch):
    import __spark_entry__ as E
    from workstealing_spatial_join_spark.sources import tables as TB

    # one user, one tile (4 events = epoch 0); days chosen so ages
    # are 0, 7 and 21 days → weights 10^6, 5·10^5, 1.25·10^5
    base = dt.datetime(2024, 3, 1)
    ev = spark.createDataFrame(
        [
            (1, 1, base),
            (1, 2, base + dt.timedelta(days=14)),
            (1, 3, base + dt.timedelta(days=21)),
            (1, 4, base + dt.timedelta(days=21, hours=5)),
        ],
        "user_id long, event_id long, ts timestamp",
    )
    monkeypatch.setattr(TB, "load", lambda sp, sf, t: ev)
    rows = E.q_decayed_density(spark, "ignored").collect()
    assert len(rows) == 1
    # ages: 21 → w 125000; 7 → 500000; 0 and 0 → 1000000 each
    assert rows[0]["heat"] == 125_000 + 500_000 + 2 * 1_000_000


def test_decay_plan_zero_python(spark):
    import __spark_entry__ as E

    for name in ("decayed_density", "tile_stratified_sample"):
        df = E.queries()[name](spark, "/root/testdata/sf0.001")
        assert sum(audit_plan(df)["python_nodes"].values()) == 0, name
