"""Round-5 third batch: document chunking, token-budget shard
packing, zonal statistics, incremental anti-join dedup. Unit
semantics on crafted inputs — the driver contract and
scripts/check_contract.py cover sf0.01 oracle parity end to end."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from workstealing_spatial_join_spark.operators import textops as TX
from workstealing_spatial_join_spark.operators.ingest import ingest_geometry
from workstealing_spatial_join_spark.operators.zonal import zonal_stats
from workstealing_spatial_join_spark.plans.planner import audit_plan

# ---------------------------------------------------------- chunking


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


def test_chunk_covers_and_reconstructs(spark):
    size, stride = 16, 12
    texts = [
        "a" * 5,                       # shorter than one chunk
        "".join(chr(97 + i % 26) for i in range(100)),
        "x" * 16,                      # exactly one chunk
        "y" * 17,                      # one char past → two chunks
        "z" * (12 * 4 + 16),           # exact last-window fit
    ]
    out = (
        TX.chunk_documents(_docs(spark, texts), size=size, stride=stride)
        .toPandas()
        .sort_values(["doc_id", "chunk_idx"])
    )
    for i, t in enumerate(texts):
        n = len(t)
        expect_chunks = max(0, -(-(n - size) // stride)) + 1 if n > size else 1
        rows = out[out.doc_id == i]
        assert len(rows) == expect_chunks, (i, n)
        # starts advance by stride from 1; every char is covered;
        # chunk lengths match the substring closed form
        starts = rows.start_pos.tolist()
        assert starts == [1 + k * stride for k in range(len(rows))]
        assert starts[-1] <= n  # no empty trailing chunk
        covered = set()
        for s, ln in zip(rows.start_pos, rows.chunk_chars):
            assert ln == min(size, n - s + 1)
            covered.update(range(s, s + ln))
        assert covered == set(range(1, n + 1))


def test_chunk_hash_matches_python(spark):
    import hashlib

    texts = ["hello world " * 20]
    out = TX.chunk_documents(_docs(spark, texts), size=32, stride=24).toPandas()
    t = texts[0]
    for r in out.itertuples():
        want = hashlib.md5(
            t[r.start_pos - 1 : r.start_pos - 1 + 32].encode()
        ).hexdigest()
        assert r.chunk_hash == want


# ----------------------------------------------------------- packing


def test_pack_shards_budget_and_order(spark):
    texts = [("w " * (5 + i % 17)).strip() for i in range(60)]
    df = spark.createDataFrame(
        [
            Row(doc_id=i, text=t, source=f"s{i % 3}")
            for i, t in enumerate(texts)
        ]
    )
    budget = 40
    out = TX.pack_shards(df, budget_tokens=budget).toPandas()
    assert len(out) == 60
    for src, g in out.groupby("source"):
        # shard ordinals start at 0 and are gap-free
        shards = sorted(g.shard_ord.unique())
        assert shards == list(range(len(shards)))
        # a shard exceeds the budget only by its own last document
        # (docs are never split): sum minus the largest member is
        # strictly under budget
        for _, s in g.groupby("shard_ord"):
            total = s.token_count.sum()
            assert total - s.token_count.max() < budget
    # deterministic: re-run bit-identical
    again = TX.pack_shards(df, budget_tokens=budget).toPandas()
    a = out.sort_values("doc_id").reset_index(drop=True)
    b = again.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_pack_shards_oversized_doc_gets_own_shard(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=0, text="t " * 500, source="s"),
            Row(doc_id=1, text="t t t", source="s"),
            Row(doc_id=2, text="t " * 500, source="s"),
        ]
    )
    out = TX.pack_shards(df, budget_tokens=10).toPandas()
    big = out[out.token_count > 10]
    assert len(big) == 2
    # an over-budget doc never shares its shard with a later doc
    # (its own tokens blow past the boundary, so the next doc's
    # floor((cum-tok)/budget) lands strictly higher)
    for shard in big.shard_ord:
        members = out[out.shard_ord == shard]
        assert members.token_count.max() > 10
        assert (members.token_count > 10).sum() == 1


# ------------------------------------------------------------- zonal


@pytest.fixture(scope="module")
def zonal_layers(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("zonal")
    pts = spark.createDataFrame(
        [
            Row(
                pid=i,
                lon=float((i * 37) % 20) - 5.0,
                lat=float((i * 53) % 14) - 3.0,
                weight=(i % 7) + 1,
                kind="png" if i % 3 == 0 else "jpg",
            )
            for i in range(500)
        ]
    )
    zones = ingest_geometry(
        spark.createDataFrame(
            [
                Row(zid=0, wkt="POLYGON ((0 0, 8 0, 8 6, 0 6, 0 0))"),
                Row(zid=1, wkt="POLYGON ((4 2, 14 2, 14 10, 4 10, 4 2))"),
                Row(zid=2, wkt="POLYGON ((-100 -80, -90 -80, -90 -70, -100 -70, -100 -80))"),
            ]
        ),
        "wkt",
        keep_cols=["zid"],
    )
    pts.write.parquet(f"{d}/pts")
    zones.write.parquet(f"{d}/zones")
    return spark.read.parquet(f"{d}/pts"), spark.read.parquet(f"{d}/zones")


def test_zonal_stats_matches_pandas(spark, zonal_layers):
    pts, zones = zonal_layers
    out = zonal_stats(
        pts,
        zones,
        aggs=[
            F.count(F.lit(1)).alias("n"),
            F.sum("weight").cast("long").alias("sum_w"),
            F.count_distinct("kind").alias("n_kind"),
        ],
        point_id="pid",
        zone_id="zid",
        payload=("weight", "kind"),
    ).toPandas().set_index("zid")

    p = pts.toPandas()
    zb = {0: (0, 0, 8, 6), 1: (4, 2, 14, 10), 2: (-100, -80, -90, -70)}
    for zid, (x0, y0, x1, y1) in zb.items():
        inside = p[
            (p.lon >= x0) & (p.lon <= x1) & (p.lat >= y0) & (p.lat <= y1)
        ]
        if len(inside) == 0:
            assert zid not in out.index
            continue
        assert out.loc[zid, "n"] == len(inside)
        assert out.loc[zid, "sum_w"] == inside.weight.sum()
        assert out.loc[zid, "n_kind"] == inside.kind.nunique()


def test_zonal_empty_zones_kept_when_asked(spark, zonal_layers):
    pts, zones = zonal_layers
    out = zonal_stats(
        pts,
        zones,
        aggs=[F.count(F.lit(1)).alias("n")],
        point_id="pid",
        zone_id="zid",
        include_empty_zones=True,
    ).toPandas()
    assert set(out.zid) == {0, 1, 2}
    assert out[out.zid == 2].n.isna().all()


def test_zonal_payload_plan_is_single_join(spark, zonal_layers):
    """The payload rides the probe side: exactly one join in the
    plan, no second pair↔point equi-join, and rect zones keep the
    catalyst refine shortcut (zero Python)."""
    pts, zones = zonal_layers
    df = zonal_stats(
        pts,
        zones,
        aggs=[F.sum("weight").alias("sum_w")],
        point_id="pid",
        zone_id="zid",
        payload=("weight",),
    )
    a = audit_plan(df)
    assert (
        a["broadcast_joins"] + a["sortmerge_joins"] + a["shuffledhash_joins"]
        == 1
    ), a["plan"][:2000]
    assert sum(a["python_nodes"].values()) == 0, a["python_nodes"]


def test_point_payload_requires_pairs_mode(spark, zonal_layers):
    pts, zones = zonal_layers
    from workstealing_spatial_join_spark.operators.spatial_join import (
        point_in_polygon_join,
    )

    with pytest.raises(ValueError, match="point_payload"):
        point_in_polygon_join(
            pts, zones, point_id="pid", poly_id="zid",
            mode="count", point_payload=("weight",),
        )


# ----------------------------------------------- incremental anti-join


def test_incremental_dedup_anti_join(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=0, text="alpha", source="new"),
            Row(doc_id=1, text="beta", source="new"),
            Row(doc_id=2, text="alpha", source="old"),
            Row(doc_id=3, text="gamma", source="old"),
        ]
    )
    h = F.md5(F.col("text"))
    batch = df.where(F.col("source") == "new").select("doc_id", h.alias("h"))
    corpus = df.where(F.col("source") != "new").select(h.alias("h"))
    kept = sorted(
        r.doc_id
        for r in batch.join(corpus, "h", "left_anti").select("doc_id").collect()
    )
    assert kept == [1]
