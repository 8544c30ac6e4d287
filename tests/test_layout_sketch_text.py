"""Round-5 surface: space-filling-curve layout (Z-order/geohash +
clustered writes), Count-Min sketch, TF-IDF top terms, deterministic
stratified sampling, and discrete per-group quantiles."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from workstealing_spatial_join_spark.operators.layout import (
    GEOHASH_ALPHABET,
    cluster_by_zorder,
    geohash_expr,
    zorder_key,
)
from workstealing_spatial_join_spark.operators.sketch import (
    CMS_WIDTH,
    cms_counters,
    cms_estimate,
)
from workstealing_spatial_join_spark.operators.textops import (
    stratified_sample_hash,
    tfidf_top_terms,
)
from workstealing_spatial_join_spark.sources import tables as TB

SF001 = "/root/testdata/sf0.001"


# ------------------------------------------------------------ layout


def _np_spread(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64)
    for s, mk in [
        (16, 0x0000FFFF0000FFFF),
        (8, 0x00FF00FF00FF00FF),
        (4, 0x0F0F0F0F0F0F0F0F),
        (2, 0x3333333333333333),
        (1, 0x5555555555555555),
    ]:
        x = (x | (x << np.uint64(s))) & np.uint64(mk)
    return x


def test_zorder_matches_numpy_reference(spark):
    pts = TB.customer_points(spark, SF001)
    got = (
        pts.select("point_id", "lon", "lat", zorder_key(F.col("lon"), F.col("lat")).alias("zkey"))
        .orderBy("point_id")
        .toPandas()
    )
    ix = np.clip(
        np.floor((got.lon.values + 180.0) / 360.0 * 65536).astype(np.int64),
        0,
        65535,
    )
    iy = np.clip(
        np.floor((got.lat.values + 90.0) / 180.0 * 65536).astype(np.int64),
        0,
        65535,
    )
    ref = (_np_spread(ix) | (_np_spread(iy) << np.uint64(1))).astype(np.int64)
    assert (ref == got.zkey.values).all()


def _geohash_bisect(lon: float, lat: float, precision: int = 8) -> str:
    """Independent reference: the textbook interval-bisection encoder."""
    lo, hi, la, lb = -180.0, 180.0, -90.0, 90.0
    bits, even = [], True
    while len(bits) < precision * 5:
        if even:
            mid = (lo + hi) / 2
            bits.append(1 if lon >= mid else 0)
            lo, hi = (mid, hi) if lon >= mid else (lo, mid)
        else:
            mid = (la + lb) / 2
            bits.append(1 if lat >= mid else 0)
            la, lb = (mid, lb) if lat >= mid else (la, mid)
        even = not even
    out = ""
    for i in range(precision):
        v = 0
        for b in bits[5 * i : 5 * i + 5]:
            v = v * 2 + b
        out += GEOHASH_ALPHABET[v]
    return out


def test_geohash_matches_bisection_reference(spark):
    pts = TB.customer_points(spark, SF001).limit(60)
    got = (
        pts.select("point_id", "lon", "lat", geohash_expr("lon", "lat").alias("gh"))
        .orderBy("point_id")
        .toPandas()
    )
    for lon, lat, gh in zip(got.lon, got.lat, got.gh):
        assert gh == _geohash_bisect(float(lon), float(lat))


def test_zorder_prefix_locality(spark):
    # two points in the same 1/2^6-of-globe quad share the top 12 key
    # bits; a point in the opposite hemisphere does not.
    df = spark.createDataFrame(
        pd.DataFrame(
            {"lon": [10.0, 10.4, -170.0], "lat": [45.0, 45.3, -80.0]}
        )
    )
    keys = [
        r.z
        for r in df.select(
            zorder_key(F.col("lon"), F.col("lat")).alias("z")
        ).collect()
    ]
    assert keys[0] >> 20 == keys[1] >> 20
    assert keys[0] >> 20 != keys[2] >> 20


def test_cluster_by_zorder_tightens_file_stats(spark, tmp_path):
    """The pruning evidence: after curve-clustering, each parquet
    file's (lon, lat) min/max box covers a small fraction of the
    globe, so a windowed query skips most files on footer stats; a
    row-order write gives every file the whole globe."""
    pts = TB.customer_points(spark, "/root/testdata/sf0.01")
    plain_dir = str(tmp_path / "plain")
    clus_dir = str(tmp_path / "clustered")
    pts.repartition(8).write.mode("overwrite").parquet(plain_dir)
    cluster_by_zorder(pts, "lon", "lat", num_files=8).write.mode(
        "overwrite"
    ).parquet(clus_dir)

    def mean_box_area(d):
        areas = []
        for f in sorted(__import__("pathlib").Path(d).glob("*.parquet")):
            md = pq.ParquetFile(str(f)).metadata
            lo = {"lon": [], "lat": []}
            hi = {"lon": [], "lat": []}
            for rg in range(md.num_row_groups):
                row = md.row_group(rg)
                for ci in range(row.num_columns):
                    col = row.column(ci)
                    name = col.path_in_schema
                    if name in lo and col.statistics is not None:
                        lo[name].append(col.statistics.min)
                        hi[name].append(col.statistics.max)
            if lo["lon"]:
                w = (max(hi["lon"]) - min(lo["lon"])) / 360.0
                h = (max(hi["lat"]) - min(lo["lat"])) / 180.0
                areas.append(w * h)
        assert areas
        return float(np.mean(areas))

    plain = mean_box_area(plain_dir)
    clustered = mean_box_area(clus_dir)
    assert plain > 0.9  # row-order files span the globe
    assert clustered < 0.35 * plain


def test_zorder_query_pure_catalyst(spark):
    import __spark_entry__ as E

    df = E.q_points_zorder(spark, SF001)
    txt = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in txt and "BatchEvalPython" not in txt


# --------------------------------------------------------------- CMS


def test_cms_overestimates_never_under(spark):
    ev = TB.load(spark, SF001, "events")
    n_total = ev.count()
    counters = cms_counters(ev, "user_id")
    truth = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("t"))
    est = cms_estimate(counters, ev.select("user_id"), "user_id")
    j = est.join(truth, "user_id").select("cms_est", "t").toPandas()
    assert (j.cms_est >= j.t).all()
    # loose CMS bound: overshoot ≤ 4·e·N/width for every key (the
    # per-key probabilistic bound is e·N/width with prob 1/2^depth)
    assert (j.cms_est - j.t).max() <= 4 * np.e * n_total / CMS_WIDTH


def test_cms_counters_merge(spark):
    ev = TB.load(spark, SF001, "events")
    full = cms_counters(ev, "user_id")
    a = cms_counters(ev.filter(F.col("event_id") % 2 == 0), "user_id")
    b = cms_counters(ev.filter(F.col("event_id") % 2 == 1), "user_id")
    merged = (
        a.unionByName(b)
        .groupBy("row", "idx")
        .agg(F.sum("cnt").alias("cnt"))
    )
    diff = full.unionByName(merged.select("row", "idx", (F.col("cnt") * -1).alias("cnt")))
    resid = (
        diff.groupBy("row", "idx")
        .agg(F.sum("cnt").alias("d"))
        .filter(F.col("d") != 0)
        .count()
    )
    assert resid == 0


# -------------------------------------------------------------- text


def test_tfidf_unique_term_ranks_first(spark):
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "shared shared zebra",
                    "shared shared yak yak",
                    "shared walrus",
                ],
            }
        )
    )
    top = tfidf_top_terms(docs, k=1).toPandas().set_index("doc_id")
    assert top.loc[1, "term"] == "zebra"
    assert top.loc[2, "term"] == "yak"
    assert top.loc[3, "term"] == "walrus"


def test_stratified_sample_nested_and_rates(spark):
    docs = TB.load(spark, "/root/testdata/sf0.01", "documents")
    small = stratified_sample_hash(docs, "lang", {"en": 100}, 300)
    big = stratified_sample_hash(docs, "lang", {"en": 400}, 700)
    ids_small = {r.doc_id for r in small.select("doc_id").collect()}
    ids_big = {r.doc_id for r in big.select("doc_id").collect()}
    assert ids_small <= ids_big  # nested samples
    # rate sanity on the default stratum (binomial, wide tolerance)
    n_docs = docs.filter(F.col("lang") != "en").count()
    got = big.filter(F.col("lang") != "en").count()
    assert abs(got / n_docs - 0.7) < 0.12


def test_quantiles_match_numpy(spark):
    import __spark_entry__ as E

    got = E.q_events_quantiles(spark, SF001).toPandas()
    ev = pd.read_parquet(f"{SF001}/events.parquet")
    for (et, p), grp in got.groupby(["event_type", "p"]):
        vals = np.sort(ev.loc[ev.event_type == et, "value"].values)
        k = int(np.ceil(p * len(vals)))
        assert grp.q_value.iloc[0] == vals[k - 1]
        assert len(grp) == 1


def test_cms_and_tfidf_broadcast_small_sides(spark):
    """The sketch/df tables are tiny by construction — the plans must
    broadcast them, never shuffle the big probe/tf side."""
    import __spark_entry__ as E

    cms_plan = (
        E.q_events_cms_heavy(spark, SF001)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in cms_plan
    tfidf_plan = (
        E.q_doc_tfidf_top(spark, SF001)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in tfidf_plan


# ------------------------------------------------------------- bloom


def test_bloom_no_false_negatives(spark):
    """Every key inserted into the filter must pass the probe — the
    Bloom contract has no false negatives, ever."""
    from workstealing_spatial_join_spark.operators.sketch import (
        bloom_build,
        bloom_might_contain,
    )

    cust = TB.load(spark, SF001, "customer")
    seg = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey"
    )
    bloom = bloom_build(seg, "c_custkey")
    missed = (
        seg.crossJoin(F.broadcast(bloom))
        .filter(
            ~bloom_might_contain(F.col("bloom"), F.col("c_custkey"))
        )
        .count()
    )
    assert missed == 0


def test_bloom_merge_is_array_union(spark):
    """Two half-filters merged with array_union equal the filter
    built over the whole key set — the mergeability contract that
    lets 1000 executors build partial filters and OR them."""
    from workstealing_spatial_join_spark.operators.sketch import (
        bloom_build,
    )

    cust = TB.load(spark, SF001, "customer")
    keys = cust.select("c_custkey")
    full = bloom_build(keys, "c_custkey").collect()[0].bloom
    a = bloom_build(
        keys.filter(F.col("c_custkey") % 2 == 0), "c_custkey"
    )
    b = bloom_build(
        keys.filter(F.col("c_custkey") % 2 == 1), "c_custkey"
    )
    merged = (
        a.crossJoin(b.withColumnRenamed("bloom", "bloom_b"))
        .select(
            F.sort_array(
                F.array_union(F.col("bloom"), F.col("bloom_b"))
            ).alias("bloom")
        )
        .collect()[0]
        .bloom
    )
    assert merged == full


def test_bloom_fp_rate_bounded(spark):
    """Observed false-positive rate stays within 3x the analytic
    (1-e^{-kn/m})^k for the driver query's build/probe sizes."""
    import math

    import __spark_entry__ as E
    from workstealing_spatial_join_spark.operators.sketch import (
        BLOOM_BITS,
        BLOOM_K,
    )

    row = E.q_bloom_semijoin(spark, SF001).collect()[0]
    assert row.n_pass >= row.n_true  # no false negatives
    n_keys = (
        TB.load(spark, SF001, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .count()
    )
    p = (1.0 - math.exp(-BLOOM_K * n_keys / BLOOM_BITS)) ** BLOOM_K
    non_matching = row.n_orders - row.n_true
    assert row.n_false_pos <= max(10, 3 * p * non_matching)


def test_bloom_query_pure_catalyst_and_broadcast(spark):
    """The semi-join demo must stay JVM-side and broadcast both the
    one-row filter and the truth key set — a shuffle of the fact
    side would defeat the operator's purpose."""
    import __spark_entry__ as E

    df = E.q_bloom_semijoin(spark, SF001)
    txt = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in txt and "BatchEvalPython" not in txt
    assert "Broadcast" in txt
    assert "SortMergeJoin" not in txt
