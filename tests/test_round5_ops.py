"""Round-5 operator family: tile density rollup, quadtree cell
compaction, as-of join, repetition scoring, benchmark
decontamination, shoelace area/centroid. Unit semantics on crafted
inputs (the driver contract + scripts/check_contract.py cover the
sf0.01 oracle parity end to end)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from workstealing_spatial_join_spark.functions import geom as G
from workstealing_spatial_join_spark.functions import wkt as W
from workstealing_spatial_join_spark.operators import textops as TX
from workstealing_spatial_join_spark.operators.dedup import decontaminate
from workstealing_spatial_join_spark.operators.temporal import asof_join
from workstealing_spatial_join_spark.operators.tiles import (
    compact_cells,
    tile_density_rollup,
)

# ----------------------------------------------------------- rollup


def test_rollup_levels_consistent(spark):
    # 10 points in one zoom-3 tile + 3 points far away
    rows = [Row(lon=1.0 + 0.01 * i, lat=1.0 + 0.01 * i) for i in range(10)]
    rows += [Row(lon=-170.0, lat=-80.0)] * 3
    df = spark.createDataFrame(rows)
    out = tile_density_rollup(df, zoom=3, min_zoom=0).toPandas()
    # every level's total equals the point count
    totals = out.groupby("zoom")["n_images"].sum()
    assert set(totals) == {13}
    assert set(out["zoom"]) == {0, 1, 2, 3}
    # zoom 0 is one world tile holding everything
    z0 = out[out.zoom == 0]
    assert len(z0) == 1 and z0.n_images.iloc[0] == 13
    # parent count == sum of its children at every level
    for z in (1, 2, 3):
        kids = out[out.zoom == z].copy()
        kids["ptx"] = kids.tx // 2
        kids["pty"] = kids.ty // 2
        rolled = kids.groupby(["ptx", "pty"])["n_images"].sum().reset_index()
        parents = out[out.zoom == z - 1]
        m = rolled.merge(
            parents, left_on=["ptx", "pty"], right_on=["tx", "ty"]
        )
        assert len(m) == len(parents)
        assert (m["n_images_x"] == m["n_images_y"]).all()


# ---------------------------------------------------------- compact


def _tiles_df(spark, pairs):
    return spark.createDataFrame(
        [Row(tx=int(a), ty=int(b)) for a, b in pairs]
    )


def test_compact_full_quad_collapses(spark):
    # all 4 children of parent (0,0) at zoom1 -> single zoom-0 cell
    out = compact_cells(
        _tiles_df(spark, [(0, 0), (0, 1), (1, 0), (1, 1)]), zoom=1
    ).toPandas()
    assert out.values.tolist() == [[0, 0, 0]]


def test_compact_partial_quad_stays(spark):
    out = compact_cells(
        _tiles_df(spark, [(0, 0), (0, 1), (1, 0)]), zoom=1
    ).toPandas()
    assert len(out) == 3 and set(out.zoom) == {1}


def test_compact_two_levels_and_coverage(spark):
    # one complete zoom-2 quad-of-quads (tx,ty in 0..3 all present)
    # plus a lone distant tile -> root does NOT form; the 16-tile
    # block compacts to one zoom-1... actually to zoom-1 parents which
    # then form a complete zoom-0? zoom0 needs all 4 zoom-1 cells:
    # block gives (0,0),(0,1),(1,0),(1,1) at zoom1 = complete -> but
    # the lone tile (3,0)@zoom2 lives inside (1,0)@zoom1 which is
    # already complete, so it was part of the block. Use zoom 3.
    block = [(x, y) for x in range(4) for y in range(4)]  # zoom3 subset
    lone = [(7, 7)]
    out = compact_cells(_tiles_df(spark, block + lone), zoom=3).toPandas()
    # block = complete (0,0)@zoom1; lone survives at zoom3
    got = {(r.zoom, r.tx, r.ty) for r in out.itertuples()}
    assert got == {(1, 0, 0), (3, 7, 7)}
    # uncompacting reproduces the input exactly
    expanded = set()
    for z, tx, ty in got:
        s = 3 - z
        for dx in range(1 << s):
            for dy in range(1 << s):
                expanded.add(((tx << s) + dx, (ty << s) + dy))
    assert expanded == set(block + lone)


def test_compact_idempotent_on_sparse(spark):
    pairs = [(0, 0), (2, 3), (5, 1)]
    out = compact_cells(_tiles_df(spark, pairs), zoom=3).toPandas()
    assert {(r.tx, r.ty) for r in out.itertuples()} == set(pairs)
    assert set(out.zoom) == {3}


# ------------------------------------------------------------ as-of


def test_asof_basic_and_ties(spark):
    from datetime import datetime, timedelta

    base = datetime(2024, 1, 1)
    us = lambda s: base + timedelta(seconds=s)  # noqa: E731
    rows = [
        # user 1: view@0, click@10 -> match; view@20 after click ignored
        Row(event_id=1, user_id=1, ts=us(0), event_type="view"),
        Row(event_id=2, user_id=1, ts=us(10), event_type="click"),
        Row(event_id=3, user_id=1, ts=us(20), event_type="view"),
        # user 2: click with NO prior view -> null match
        Row(event_id=4, user_id=2, ts=us(5), event_type="click"),
        Row(event_id=5, user_id=2, ts=us(6), event_type="view"),
        # user 3: tie at same ts — view id 6 < click id 7 counts
        Row(event_id=6, user_id=3, ts=us(30), event_type="view"),
        Row(event_id=7, user_id=3, ts=us(30), event_type="click"),
        # user 3 second click: latest view wins
        Row(event_id=8, user_id=3, ts=us(40), event_type="view"),
        Row(event_id=9, user_id=3, ts=us(50), event_type="click"),
        # unrelated type never matches
        Row(event_id=10, user_id=1, ts=us(9), event_type="purchase"),
    ]
    ev = spark.createDataFrame(rows)
    out = {
        r.event_id: (r.matched_id, r.gap_us)
        for r in asof_join(ev, "click", "view").collect()
    }
    assert out[2] == (1, 10_000_000)
    assert out[4] == (None, None)
    assert out[7] == (6, 0)
    assert out[9] == (8, 10_000_000)
    assert set(out) == {2, 4, 7, 9}


# ------------------------------------------------------- repetition


def test_repetition_ratio(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b c a b c a b c"),  # 7 grams, 3 uniq
            Row(doc_id=2, text="all words differ here now"),  # 3/3
            Row(doc_id=3, text="too short"),  # 0 grams
            Row(doc_id=4, text=""),
        ]
    )
    n, d, r = TX.ngram_repetition_cols(F.col("text"), k=3)
    out = {
        row.doc_id: (row.n, row.d, row.r)
        for row in docs.select(
            "doc_id", n.alias("n"), d.alias("d"), r.alias("r")
        ).collect()
    }
    assert out[1] == (7, 3, 4 / 7)
    assert out[2] == (3, 3, 0.0)
    assert out[3] == (0, 0, 0.0)
    assert out[4] == (0, 0, 0.0)


# ----------------------------------------------------- decontaminate


def _wordgram_hashes_py(text: str, w: int = 8) -> set:
    import hashlib

    words = text.lower().strip().split()
    out = set()
    for i in range(len(words) - w + 1):
        g = " ".join(words[i:i + w])
        out.add(int(hashlib.md5(g.encode()).hexdigest()[2:17], 16))
    return out


def test_decontaminate_counts(spark):
    leak = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    corpus = spark.createDataFrame(
        [
            Row(doc_id=1, text=f"prefix words here {leak} suffix"),
            Row(doc_id=2, text="no overlap with anything benchy at all "
                               "one two three four five six seven"),
        ]
    )
    bench = spark.createDataFrame(
        [
            Row(doc_id=100, text=f"{leak} completely different tail"),
            Row(doc_id=101, text=f"another head {leak}"),
        ]
    )
    out = {
        r.doc_id: (r.n_shared, r.n_bench_docs)
        for r in decontaminate(corpus, bench).collect()
    }
    assert set(out) == {1}
    # independent python recomputation of the same md5 gram family
    c1 = _wordgram_hashes_py(f"prefix words here {leak} suffix")
    b = [
        _wordgram_hashes_py(f"{leak} completely different tail"),
        _wordgram_hashes_py(f"another head {leak}"),
    ]
    exp_shared = len(c1 & (b[0] | b[1]))
    exp_docs = sum(1 for s in b if c1 & s)
    assert out[1] == (exp_shared, exp_docs)
    assert exp_shared >= 3 and exp_docs == 2


# -------------------------------------------------- area / centroid


def test_area_centroid_square():
    ring = np.array([[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]], float)
    a2, cnx, cny = G.area_centroid_scaled([(W.POLYGON, [ring])])
    assert a2 == 2 * 4 * 1000 * 1000  # 2*area in 1e-6 units
    assert cnx / ((3.0 * a2) * 1000.0) == 1.0
    assert cny / ((3.0 * a2) * 1000.0) == 1.0


def test_area_centroid_hole_and_orientation():
    outer = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], float)
    hole = np.array([[1, 1], [3, 1], [3, 3], [1, 3], [1, 1]], float)
    # stored winding must not matter
    for flip_outer in (False, True):
        for flip_hole in (False, True):
            o = outer[::-1] if flip_outer else outer
            h = hole[::-1] if flip_hole else hole
            a2, cnx, cny = G.area_centroid_scaled([(W.POLYGON, [o, h])])
            assert a2 == 2 * (16 - 4) * 1000 * 1000
            assert cnx / ((3.0 * a2) * 1000.0) == pytest.approx(2.0)
            assert cny / ((3.0 * a2) * 1000.0) == pytest.approx(2.0)


def test_area_centroid_asymmetric_hole():
    outer = np.array([[0, 0], [6, 0], [6, 6], [0, 6], [0, 0]], float)
    hole = np.array([[4, 4], [5, 4], [5, 5], [4, 5], [4, 4]], float)
    a2, cnx, cny = G.area_centroid_scaled([(W.POLYGON, [outer, hole])])
    area = a2 / 2 / 1e6
    assert area == 35.0
    cx = cnx / ((3.0 * a2) * 1000.0)
    cy = cny / ((3.0 * a2) * 1000.0)
    # centroid = (36*3 - 1*4.5)/35 exactly, both axes
    assert cx == pytest.approx((36 * 3 - 1 * 4.5) / 35)
    assert cy == pytest.approx((36 * 3 - 1 * 4.5) / 35)


def test_area_centroid_udf_matches_kernel(spark):
    from workstealing_spatial_join_spark.functions.predicates import (
        st_area_centroid,
    )

    la = pd.read_parquet("/root/repo/bench_data/concave/layer_a.parquet")
    df = spark.createDataFrame(la[["poly_id", "geom_wkb"]])
    got = {
        r.poly_id: (r.ac.area2, r.ac.cx, r.ac.cy)
        for r in df.select(
            "poly_id", st_area_centroid(F.col("geom_wkb")).alias("ac")
        ).collect()
    }
    for _, row in la.iterrows():
        a2, cnx, cny = G.area_centroid_scaled(
            W.from_wkb(bytes(row.geom_wkb))
        )
        den = (3.0 * float(a2)) * 1000.0
        assert got[row.poly_id] == (a2, cnx / den, cny / den)
        assert a2 > 0


# ------------------------------------------------------- plan gates


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_asof_plan_single_exchange_zero_python(spark):
    from datetime import datetime

    ev = spark.createDataFrame(
        [Row(event_id=1, user_id=1, ts=datetime(2024, 1, 1),
             event_type="view")]
    )
    p = _plan(asof_join(ev, "click", "view"))
    assert p.count("Exchange") == 1  # ONE shuffle: the merge shape
    assert "Python" not in p


def test_rollup_plan_one_scan_one_exchange(spark, tmp_path):
    path = str(tmp_path / "pts.parquet")
    spark.createDataFrame(
        [Row(lon=float(i), lat=float(i % 80)) for i in range(50)]
    ).write.parquet(path)
    df = tile_density_rollup(spark.read.parquet(path), zoom=4)
    p = _plan(df)
    assert p.count("Scan parquet") == 1  # no per-level rescans
    assert p.count("Exchange hashpartitioning") == 1
    assert "Python" not in p


def test_decontam_plan_broadcasts_benchmark(spark):
    corpus = spark.createDataFrame([Row(doc_id=1, text="abcdefg")])
    bench = spark.createDataFrame([Row(doc_id=2, text="abcdexx")])
    p = _plan(decontaminate(corpus, bench))
    assert "BroadcastHashJoin" in p  # corpus side never shuffles


# -------------------------------------------------------------- hll


def test_hll_accuracy_and_merge(spark):
    from workstealing_spatial_join_spark.operators.sketch import (
        HLL_M,
        hll_correct,
        hll_distinct,
        hll_sketch,
    )

    # 5000 distinct keys, two disjoint halves tagged g=a/b
    df = spark.range(5000).select(
        F.when(F.col("id") < 2500, F.lit("a")).otherwise(F.lit("b")).alias("g"),
        F.col("id").alias("k"),
    )
    est = {
        r.g: hll_correct(r.hll_raw, r.n_registers_used)
        for r in hll_distinct(df, ["g"], "k").collect()
    }
    assert est["a"] == pytest.approx(2500, rel=0.12)
    assert est["b"] == pytest.approx(2500, rel=0.12)

    # mergeability: register-wise MAX of the two half-sketches equals
    # the sketch of the union (the property that makes HLL the scale
    # path — partials combine across partitions/datasets)
    whole = {
        (r.register, r.max_rho)
        for r in hll_sketch(
            df.select(F.lit("all").alias("g"), "k"), ["g"], "k"
        ).collect()
    }
    halves = hll_sketch(df, ["g"], "k")
    merged = {
        (r.register, r.max_rho)
        for r in halves.groupBy("register")
        .agg(F.max("max_rho").alias("max_rho"))
        .collect()
    }
    assert merged == whole


def test_hll_bin_rho_semantics(spark):
    # pin the LENGTH(BIN(x)) convention the SQL twin relies on
    from workstealing_spatial_join_spark.operators.sketch import (
        hll_register_cols,
    )
    import duckdb

    df = spark.createDataFrame([Row(k=i) for i in range(200)])
    reg, rho = hll_register_cols(F.col("k"))
    got = {
        r.k: (r.reg, r.rho)
        for r in df.select("k", reg.alias("reg"), rho.alias("rho")).collect()
    }
    con = duckdb.connect()
    want = {
        k: (rg, rh)
        for k, rg, rh in con.execute(
            "SELECT k, CAST(('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 2)) AS INT), "
            "LEAST(CASE WHEN x = 0 THEN 61 ELSE 61 - LENGTH(BIN(x)) END, 45) "
            "FROM (SELECT k, CAST(('0x' || substr(md5(CAST(k AS VARCHAR)), 3, 15)) AS BIGINT) AS x "
            "FROM range(200) t(k))"
        ).fetchall()
    }
    assert got == want


# ------------------------------------------- simplify / convex hull


def _rand_chain(rng, n):
    steps = rng.normal(size=(n, 2))
    return np.cumsum(steps, axis=0)


def test_simplify_dp_properties():
    rng = np.random.default_rng(7)
    for trial in range(20):
        chain = _rand_chain(rng, int(rng.integers(5, 80)))
        eps = float(rng.uniform(0.1, 2.0))
        out = G.simplify_dp(chain, eps)
        # endpoints kept; output is an ordered subsequence of input
        assert (out[0] == chain[0]).all() and (out[-1] == chain[-1]).all()
        idx = []
        j = 0
        for p in out:
            while not (chain[j] == p).all():
                j += 1
            idx.append(j)
        assert idx == sorted(idx)
        # every dropped point lies within eps of the kept chain's
        # corresponding segment (the DP guarantee)
        for a_i, b_i in zip(idx[:-1], idx[1:]):
            a, b = chain[a_i], chain[b_i]
            seg = chain[a_i:b_i + 1][1:-1]
            if len(seg) == 0:
                continue
            d = b - a
            ll = float(d @ d)
            rel = seg - a
            if ll == 0:
                dist2 = (rel * rel).sum(axis=1)
            else:
                cr = rel[:, 0] * d[1] - rel[:, 1] * d[0]
                dist2 = cr * cr / ll
            assert (dist2 <= eps * eps + 1e-9).all()


def test_simplify_dp_collinear_and_short():
    line = np.array([[0.0, 0], [1, 0], [2, 0], [3, 0]])
    assert len(G.simplify_dp(line, 0.0)) == 2  # strictly collinear
    two = np.array([[0.0, 0], [1, 1]])
    assert (G.simplify_dp(two, 5.0) == two).all()


def test_simplify_geom_ring_never_invalidated():
    # a tiny triangle ring simplifying below 4 closed points keeps
    # its original vertices
    tri = np.array([[0.0, 0], [1, 0], [0.5, 0.1], [0, 0]])
    gtype, rings = G.simplify_geom(W.POLYGON, [tri], eps=10.0)
    assert (rings[0] == tri).all()


def test_convex_hull_properties():
    rng = np.random.default_rng(11)
    for trial in range(20):
        pts = rng.uniform(-5, 5, size=(int(rng.integers(3, 200)), 2))
        h = G.convex_hull(pts)
        # hull is convex (strict CCW turns)
        m = len(h)
        assert m >= 3
        for i in range(m):
            o, a, b = h[i], h[(i + 1) % m], h[(i + 2) % m]
            cr = (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])
            assert cr > 0
        # all input points inside or on the hull
        for i in range(m):
            o, a = h[i], h[(i + 1) % m]
            cr = (a[0] - o[0]) * (pts[:, 1] - o[1]) - (a[1] - o[1]) * (
                pts[:, 0] - o[0]
            )
            assert (cr >= -1e-9).all()


def test_simplify_hull_udfs(spark):
    from workstealing_spatial_join_spark.functions.predicates import (
        make_simplify,
        st_convex_hull,
    )

    la = pd.read_parquet(
        "/root/repo/bench_data/concave/layer_a.parquet"
    ).head(30)
    df = spark.createDataFrame(la[["poly_id", "geom_wkb"]])
    out = df.select(
        "poly_id",
        make_simplify(0.05)(F.col("geom_wkb")).alias("simp"),
        st_convex_hull(F.col("geom_wkb")).alias("hull"),
    ).collect()
    for r in out:
        orig = W.from_wkb(bytes(la[la.poly_id == r.poly_id].geom_wkb.iloc[0]))
        simp = W.from_wkb(bytes(r.simp))
        hull = W.from_wkb(bytes(r.hull))
        # simplify: fewer-or-equal vertices, same ring count, closed
        assert len(simp[0][1]) == len(orig[0][1])
        for rs, ro in zip(simp[0][1], orig[0][1]):
            assert len(rs) <= len(ro) and (rs[0] == rs[-1]).all()
        # hull contains every original vertex
        hr = hull[0][1][0]
        m = len(hr) - 1
        pts = np.vstack(orig[0][1])
        for i in range(m):
            o, a = hr[i], hr[i + 1]
            cr = (a[0] - o[0]) * (pts[:, 1] - o[1]) - (a[1] - o[1]) * (
                pts[:, 0] - o[0]
            )
            assert (cr >= -1e-9).all()


def test_simplify_hull_vs_shapely_if_available():
    shapely = pytest.importorskip("shapely")
    from shapely.geometry import LineString, MultiPoint

    rng = np.random.default_rng(3)
    for _ in range(10):
        chain = _rand_chain(rng, 40)
        eps = float(rng.uniform(0.2, 1.5))
        ours = G.simplify_dp(chain, eps)
        theirs = np.asarray(
            LineString(chain).simplify(eps, preserve_topology=False).coords
        )
        assert np.allclose(ours, theirs)
        pts = rng.uniform(-5, 5, size=(50, 2))
        hull = G.convex_hull(pts)
        sh = np.asarray(MultiPoint(pts).convex_hull.exterior.coords)[:-1]
        # same vertex set (rotation/orientation may differ)
        assert {tuple(p) for p in hull} == {tuple(p) for p in sh}


def test_time_rollup_calendar_correct(spark):
    """Hour/day/month buckets over a month boundary; integer-cent
    sums; every level's totals must agree (aggregate-of-aggregate
    consistency, the temporal analog of test_rollup_levels_consistent)."""
    from datetime import datetime

    from workstealing_spatial_join_spark.operators.temporal import time_rollup

    ev = spark.createDataFrame(
        [
            Row(event_id=1, ts=datetime(2024, 1, 15, 3, 30), value=1.25),
            Row(event_id=2, ts=datetime(2024, 1, 15, 3, 45), value=0.75),
            Row(event_id=3, ts=datetime(2024, 1, 15, 22, 0), value=2.00),
            Row(event_id=4, ts=datetime(2024, 2, 1, 0, 0), value=2.50),
        ]
    )
    rows = {
        (r.level, r.bucket_us): (r.n_events, r.sum_cents)
        for r in time_rollup(ev).collect()
    }
    us = lambda *a: int(datetime(*a).timestamp() * 0) + int(
        (datetime(*a) - datetime(1970, 1, 1)).total_seconds() * 1_000_000
    )
    assert rows[("hour", us(2024, 1, 15, 3))] == (2, 200)
    assert rows[("hour", us(2024, 1, 15, 22))] == (1, 200)
    assert rows[("day", us(2024, 1, 15))] == (3, 400)
    assert rows[("month", us(2024, 1, 1))] == (3, 400)
    assert rows[("month", us(2024, 2, 1))] == (1, 250)
    # level-total consistency
    for lv in ("hour", "day", "month"):
        tot = [v for (l, _), v in rows.items() if l == lv]
        assert sum(n for n, _ in tot) == 4 and sum(s for _, s in tot) == 650


def test_time_rollup_plan_one_scan(spark, tmp_path):
    from datetime import datetime

    from workstealing_spatial_join_spark.operators.temporal import time_rollup

    path = str(tmp_path / "ev.parquet")
    spark.createDataFrame(
        [Row(event_id=i, ts=datetime(2024, 1, 1 + i % 20), value=1.0)
         for i in range(50)]
    ).write.parquet(path)
    p = _plan(time_rollup(spark.read.parquet(path)))
    assert p.count("Scan parquet") == 1  # single scan feeds the Expand
    assert "Expand" in p
    assert "Python" not in p
