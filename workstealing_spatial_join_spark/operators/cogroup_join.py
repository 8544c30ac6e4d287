"""Cogrouped per-cell spatial join — the J3 physical strategy
(reference: per-thread partitioned join, src/thread_util.cpp:247-933)
for LARGE × LARGE layers where neither side fits in a broadcast.

Shape: tessellate both layers → ``groupBy(cell_id).cogroup(...)``
→ one ``applyInPandas`` call per cell with BOTH sides' rows as pandas
DataFrames. Each geometry crosses the JVM→Python wire once per
covering cell (not once per candidate pair, as the WKB-column
transport does), and the whole filter+refine for a cell runs as one
vectorized NumPy pass — the in-Python analog of the reference's
build-STRtree-probe-shard loop (src/thread_util.cpp:284-319).

Skew note: a cogroup group = one task; AQE cannot split it. Pair this
with finer ``cell_deg`` or pre-salting for pathological cells — the
cost table (operators/skew.py) says which.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from workstealing_spatial_join_spark.functions import geom as G
from workstealing_spatial_join_spark.functions import grid as GRID
from workstealing_spatial_join_spark.functions import wkt as W
from workstealing_spatial_join_spark.operators.spatial_join import (
    tessellate_bbox,
    tessellate_points,
)


def _candidate_pairs_mbr(lp: pd.DataFrame, rp: pd.DataFrame):
    """All (i, j) index pairs whose MBRs overlap — vectorized outer
    bbox test, chunked on the left axis to bound memory."""
    li = []
    rj = []
    rminx = rp["minx"].to_numpy()
    rminy = rp["miny"].to_numpy()
    rmaxx = rp["maxx"].to_numpy()
    rmaxy = rp["maxy"].to_numpy()
    lminx = lp["minx"].to_numpy()
    lminy = lp["miny"].to_numpy()
    lmaxx = lp["maxx"].to_numpy()
    lmaxy = lp["maxy"].to_numpy()
    chunk = max(1, 4_000_000 // max(len(rp), 1))
    for s in range(0, len(lp), chunk):
        e = min(s + chunk, len(lp))
        ov = (
            (lminx[s:e, None] <= rmaxx[None, :])
            & (rminx[None, :] <= lmaxx[s:e, None])
            & (lminy[s:e, None] <= rmaxy[None, :])
            & (rminy[None, :] <= lmaxy[s:e, None])
        )
        ii, jj = np.nonzero(ov)
        li.append(ii + s)
        rj.append(jj)
    if not li:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    return np.concatenate(li), np.concatenate(rj)


def _refine_values(lp, rp, li, rj, predicate: str) -> np.ndarray:
    """Refine candidate index pairs through the shared vectorized core
    (functions/predicates.refine_pairs_core): rect×rect closed-form,
    vertex-count-bucketed ring kernels, general-clipper fallback.
    Each cell's geometries decode once (executor decode cache)."""
    from workstealing_spatial_join_spark.functions.predicates import (
        refine_pairs_core,
    )

    uniques_l = [bytes(w) for w in lp["geom_wkb"]]
    uniques_r = [bytes(w) for w in rp["geom_wkb"]]
    return refine_pairs_core(li, uniques_l, rj, uniques_r, predicate)


def polygon_join_cogrouped(
    left: DataFrame,
    right: DataFrame,
    left_id: str = "l_id",
    right_id: str = "r_id",
    predicate: str = "intersects",
    cell_deg: float = GRID.DEFAULT_CELL_DEG,
    mode: str = "pairs",  # pairs | count
    dedup: str = "refpoint",
) -> DataFrame:
    """Large×large polygon join via per-cell cogroup. Semantics match
    operators.spatial_join.polygon_join exactly (tested) for all three
    runtime predicates (intersects / intersection_numpoints /
    union_numpoints)."""
    if predicate not in (
        "intersects", "intersection_numpoints", "union_numpoints"
    ):
        raise ValueError(f"unknown predicate {predicate!r}")
    numpoints = predicate != "intersects"
    lt = tessellate_bbox(
        left.select(
            F.col(left_id).alias("lid"), "geom_wkb", "minx", "miny", "maxx", "maxy"
        ),
        cell_deg,
    )
    rt = tessellate_bbox(
        right.select(
            F.col(right_id).alias("rid"), "geom_wkb", "minx", "miny", "maxx", "maxy"
        ),
        cell_deg,
    )

    empty_cols: dict = {"lid": [], "rid": []}
    if numpoints:
        empty_cols["num_points"] = []

    def per_cell(key, lp: pd.DataFrame, rp: pd.DataFrame) -> pd.DataFrame:
        if lp.empty or rp.empty:
            return pd.DataFrame(empty_cols)
        li, rj = _candidate_pairs_mbr(lp, rp)
        if len(li) == 0:
            return pd.DataFrame(empty_cols)
        if dedup == "refpoint":
            # keep the pair only in the cell holding the MBR-overlap
            # top-left corner (same rule as the Catalyst path)
            cell = key[0]
            rx = np.maximum(lp["minx"].to_numpy()[li], rp["minx"].to_numpy()[rj])
            ry = np.maximum(lp["miny"].to_numpy()[li], rp["miny"].to_numpy()[rj])
            owner = GRID.cell_id(rx, ry, cell_deg)
            sel = owner == cell
            li, rj = li[sel], rj[sel]
            if len(li) == 0:
                return pd.DataFrame(empty_cols)
        vals = _refine_values(lp, rp, li, rj, predicate)
        if numpoints:
            keep = vals > 0
            return pd.DataFrame(
                {
                    "lid": lp["lid"].to_numpy()[li[keep]],
                    "rid": rp["rid"].to_numpy()[rj[keep]],
                    "num_points": vals[keep],
                }
            )
        keep = vals
        return pd.DataFrame(
            {
                "lid": lp["lid"].to_numpy()[li[keep]],
                "rid": rp["rid"].to_numpy()[rj[keep]],
            }
        )

    lid_t = lt.schema["lid"].dataType.simpleString()
    rid_t = rt.schema["rid"].dataType.simpleString()
    schema = f"lid {lid_t}, rid {rid_t}"
    if numpoints:
        schema += ", num_points bigint"
    pairs = (
        lt.groupBy("cell_id")
        .cogroup(rt.groupBy("cell_id"))
        .applyInPandas(per_cell, schema=schema)
    )
    if mode == "count":
        if numpoints:
            return pairs.agg(F.sum("num_points").alias("join_count"))
        return pairs.agg(F.count(F.lit(1)).alias("join_count"))
    return pairs


def point_in_polygon_join_cogrouped(
    points: DataFrame,
    polygons: DataFrame,
    point_id: str = "image_id",
    poly_id: str = "polygon_id",
    lon: str = "lon",
    lat: str = "lat",
    cell_deg: float = GRID.DEFAULT_CELL_DEG,
    mode: str = "pairs",
) -> DataFrame:
    """Large×large PIP via per-cell cogroup (polygon layer too big to
    broadcast). Each polygon crosses the wire once per covering cell."""
    pts = tessellate_points(
        points.select(
            F.col(point_id).alias("point_id"),
            F.col(lon).alias("px"),
            F.col(lat).alias("py"),
        ),
        lon="px",
        lat="py",
        cell_deg=cell_deg,
    )
    pls = tessellate_bbox(
        polygons.select(
            F.col(poly_id).alias("poly_id"),
            "geom_wkb", "minx", "miny", "maxx", "maxy",
        ),
        cell_deg,
    )

    def per_cell(lp: pd.DataFrame, rp: pd.DataFrame) -> pd.DataFrame:
        if lp.empty or rp.empty:
            return pd.DataFrame({"point_id": [], "poly_id": []})
        xs = lp["px"].to_numpy()
        ys = lp["py"].to_numpy()
        out_p, out_g = [], []
        for _, poly in rp.iterrows():
            m = (
                (xs >= poly["minx"]) & (xs <= poly["maxx"])
                & (ys >= poly["miny"]) & (ys <= poly["maxy"])
            )
            if not m.any():
                continue
            res = np.zeros(int(m.sum()), dtype=bool)
            for gtype, rings in W.from_wkb(poly["geom_wkb"]):
                if gtype == W.POLYGON:
                    res |= G.polygon_contains_xy(rings, xs[m], ys[m])
            hit_ids = lp["point_id"].to_numpy()[m][res]
            out_p.extend(hit_ids)
            out_g.extend([poly["poly_id"]] * len(hit_ids))
        return pd.DataFrame({"point_id": out_p, "poly_id": out_g})

    pid_t = pts.schema["point_id"].dataType.simpleString()
    gid_t = pls.schema["poly_id"].dataType.simpleString()
    pairs = (
        pts.groupBy("cell_id")
        .cogroup(pls.groupBy("cell_id"))
        .applyInPandas(per_cell, schema=f"point_id {pid_t}, poly_id {gid_t}")
    )
    if mode == "count":
        return pairs.agg(F.count(F.lit(1)).alias("join_count"))
    return pairs
