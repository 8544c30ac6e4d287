"""Round-5 batch 6: BM25 retrieval, per-tile argmax selection,
ordered conversion funnel, near-dup canonical selection. Unit
semantics on crafted inputs plus plan gates (the driver contract +
scripts/check_contract.py cover sf0.01 oracle parity end to end)."""

from __future__ import annotations

import struct
from datetime import datetime
from fractions import Fraction

import pandas as pd
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from workstealing_spatial_join_spark.operators.dedup import (
    canonicalize_components,
)
from workstealing_spatial_join_spark.operators.graph import (
    connected_components,
)
from workstealing_spatial_join_spark.operators.temporal import (
    conversion_funnel,
)
from workstealing_spatial_join_spark.operators.textops import (
    bm25_topk_docs,
    sql_bm25_topk,
)
from workstealing_spatial_join_spark.plans.planner import audit_plan

# ------------------------------------------------------------- BM25

_CORPUS = [
    (1, "join join join hash scan filter"),
    (2, "the quick brown fox jumps over the lazy dog"),
    (3, "hash hash hash hash hash"),
    (4, "filter scan vector join hash filter scan vector"),
    (5, "vector"),
    (6, ""),
    (7, "scan scan scan scan scan scan scan scan scan scan"),
]
_TERMS = ("filter", "hash", "join", "scan", "vector")


def _bm25_oracle(corpus, terms, k):
    """Plain-Python brute force with the same integer-cleared
    fraction; exact Fraction score for RANKING, float replay of the
    engine's op order for VALUE comparison."""
    toks = {d: t.split() for d, t in corpus}
    dl = {d: len(tk) for d, tk in toks.items()}
    nd = len(corpus)
    tt = sum(dl.values())
    out = []
    for d, tk in toks.items():
        exact = Fraction(0)
        replay = 0.0
        for term in sorted(terms):
            tf = tk.count(term)
            df = sum(1 for tk2 in toks.values() if term in tk2)
            if tf > 0 and df > 0:
                num = 44 * tf * tt
                den = 20 * tf * tt + 6 * tt + 18 * dl[d] * nd
                exact += Fraction(num, den) * Fraction(nd, df)
                replay = replay + (float(num) / float(den)) * (
                    float(nd) / float(df)
                )
        out.append((d, exact, replay))
    out.sort(key=lambda r: (-r[1], r[0]))
    return out[:k]


def test_bm25_matches_bruteforce(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=d, text=t) for d, t in _CORPUS]
    )
    got = bm25_topk_docs(docs, terms=_TERMS, k=4).collect()
    want = _bm25_oracle(_CORPUS, _TERMS, 4)
    assert [r.doc_id for r in got] == [d for d, _, _ in want]
    # engine float must be the bit-exact replay of the fixed op order
    for r, (_, _, replay) in zip(got, want):
        assert struct.pack("<d", r.score) == struct.pack("<d", replay)


def test_bm25_duckdb_twin_bit_exact(spark):
    duckdb = pytest.importorskip("duckdb")
    docs = spark.createDataFrame(
        [Row(doc_id=d, text=t) for d, t in _CORPUS]
    )
    got = [(r.doc_id, r.score) for r in bm25_topk_docs(docs, _TERMS, 5).collect()]
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(_CORPUS, columns=["doc_id", "text"]))
    want = con.execute(sql_bm25_topk(_TERMS, 5)).fetchall()
    assert len(got) == len(want)
    for (gd, gs), (wd, ws) in zip(got, want):
        assert gd == wd
        assert struct.pack("<d", gs) == struct.pack("<d", ws)


def test_bm25_plan_zero_python_broadcast_stats(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=d, text=t) for d, t in _CORPUS]
    )
    df = bm25_topk_docs(docs, terms=_TERMS, k=3)
    audit = audit_plan(df)
    assert sum(audit["python_nodes"].values()) == 0
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the single global-stats row joins back as a broadcast, and the
    # top-k is a distributed TakeOrdered, not a global sort
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "TakeOrderedAndProject" in plan


# --------------------------------------------------- funnel ladder


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            Row(
                user_id=u,
                event_type=t,
                ts=datetime.fromisoformat(s),
            )
            for u, t, s in rows
        ]
    )


def test_funnel_orderings(spark):
    ev = _ev(
        spark,
        [
            # u1: full ordered funnel
            (1, "view", "2024-01-01 00:00:00"),
            (1, "click", "2024-01-01 00:01:00"),
            (1, "purchase", "2024-01-01 00:02:00"),
            # u2: click BEFORE the first view -> depth 1
            (2, "click", "2024-01-01 00:00:00"),
            (2, "view", "2024-01-01 00:01:00"),
            # u3: purchase before click -> depth 2 (view, click)
            (3, "view", "2024-01-01 00:00:00"),
            (3, "purchase", "2024-01-01 00:00:30"),
            (3, "click", "2024-01-01 00:01:00"),
            # u4: no view at all -> absent from the output
            (4, "click", "2024-01-01 00:00:00"),
            (4, "purchase", "2024-01-01 00:01:00"),
            # u5: simultaneous view/click (strict >) -> depth 1
            (5, "view", "2024-01-01 00:00:00"),
            (5, "click", "2024-01-01 00:00:00"),
            # u6: second click converts after the view
            (6, "click", "2024-01-01 00:00:00"),
            (6, "view", "2024-01-01 00:00:30"),
            (6, "click", "2024-01-01 00:01:00"),
        ],
    )
    out = {
        r.user_id: r
        for r in conversion_funnel(
            ev, stages=("view", "click", "purchase")
        ).collect()
    }
    assert set(out) == {1, 2, 3, 5, 6}
    assert out[1].funnel_depth == 3
    assert out[2].funnel_depth == 1 and out[2].t_click is None
    assert out[3].funnel_depth == 2 and out[3].t_purchase is None
    assert out[5].funnel_depth == 1
    assert out[6].funnel_depth == 2
    assert out[6].t_click == datetime.fromisoformat("2024-01-01 00:01:00")


def test_funnel_earliest_window_semantics(spark):
    # the click window opens at the FIRST view, not any later view:
    # view@0, view@10; click@5 counts (after first view)
    ev = _ev(
        spark,
        [
            (1, "view", "2024-01-01 00:00:00"),
            (1, "view", "2024-01-01 00:10:00"),
            (1, "click", "2024-01-01 00:05:00"),
        ],
    )
    row = conversion_funnel(ev, stages=("view", "click")).collect()[0]
    assert row.funnel_depth == 2
    assert row.t_click == datetime.fromisoformat("2024-01-01 00:05:00")


def test_funnel_plan_zero_python_exchanges_on_user(spark):
    ev = _ev(spark, [(1, "view", "2024-01-01 00:00:00")])
    df = conversion_funnel(ev)
    audit = audit_plan(df)
    assert sum(audit["python_nodes"].values()) == 0


def test_funnel_rejects_single_stage(spark):
    ev = _ev(spark, [(1, "view", "2024-01-01 00:00:00")])
    with pytest.raises(ValueError):
        conversion_funnel(ev, stages=("view",))


# ------------------------------------------- canonical per component


def test_canonicalize_longest_wins(spark):
    pairs = spark.createDataFrame(
        [Row(a=1, b=2), Row(a=2, b=3), Row(a=10, b=11)]
    )
    comp = connected_components(pairs, "a", "b").select(
        F.col("node").alias("doc_id"), F.col("comp").alias("component")
    )
    sizes = spark.createDataFrame(
        [
            Row(doc_id=1, n_chars=5),
            Row(doc_id=2, n_chars=9),
            Row(doc_id=3, n_chars=9),
            Row(doc_id=10, n_chars=1),
            Row(doc_id=11, n_chars=2),
        ]
    )
    out = canonicalize_components(comp, sizes).toPandas()
    by_id = out.set_index("doc_id")
    # {1,2,3}: 2 and 3 tie on size -> smaller id (2) wins
    assert by_id.loc[[1, 2, 3], "canonical_id"].tolist() == [2, 2, 2]
    # {10,11}: 11 is longer
    assert by_id.loc[[10, 11], "canonical_id"].tolist() == [11, 11]
    # keep is true exactly once per component, on the canonical row
    assert set(out[out.keep].doc_id) == {2, 11}
    assert out.groupby("component")["keep"].sum().eq(1).all()


def test_canonicalize_plan_zero_python(spark):
    comp = spark.createDataFrame(
        [Row(doc_id=1, component=1), Row(doc_id=2, component=1)]
    )
    sizes = spark.createDataFrame(
        [Row(doc_id=1, n_chars=3), Row(doc_id=2, n_chars=4)]
    )
    df = canonicalize_components(comp, sizes)
    audit = audit_plan(df)
    assert sum(audit["python_nodes"].values()) == 0


# --------------------------------------------- per-tile argmax pick


def test_tile_best_image_fixture_argmax(spark):
    """q_tile_best_image against a pandas argmax over the SAME
    fixture — per-tile winner by (pixels desc, image_id asc)."""
    import __spark_entry__ as E

    got = E.q_tile_best_image(spark, "/root/testdata/sf0.001").toPandas()
    img = pd.read_parquet(
        "/root/repo/bench_data/images_meta",
        columns=["image_id", "w", "h", "lon", "lat"],
    )
    # numpy replay of tile_xy_cols' arithmetic (the sf0.01 contract
    # checks the SQL twin independently)
    import numpy as np

    n = 2 ** E.IMG_STATS_ZOOM
    lon, lat = img.lon.to_numpy(), img.lat.to_numpy()
    tx = np.clip(
        np.floor((lon + 180.0) / 360.0 * n), 0, n - 1
    ).astype("int64")
    ty = np.clip(
        np.floor((90.0 - lat) / 180.0 * n), 0, n - 1
    ).astype("int64")
    img["tile_id"] = [
        f"z{E.IMG_STATS_ZOOM}/{a}/{b}" for a, b in zip(tx, ty)
    ]
    img["pixels"] = img.w * img.h
    want = (
        img.sort_values(
            ["tile_id", "pixels", "image_id"],
            ascending=[True, False, True],
        )
        .groupby("tile_id")
        .head(1)[["tile_id", "image_id", "pixels"]]
        .sort_values("tile_id")
        .reset_index(drop=True)
    )
    got = got.sort_values("tile_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, check_like=True
    )


def test_tile_best_image_plan_zero_python(spark):
    import __spark_entry__ as E

    df = E.q_tile_best_image(spark, "/root/testdata/sf0.001")
    audit = audit_plan(df)
    assert sum(audit["python_nodes"].values()) == 0
