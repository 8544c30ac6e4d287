"""Brute-force O(n·m) reference oracles — the moral equivalent of the
reference's single-threaded library API (src/spatial_join.cpp:5-132)
run serially, per SURVEY.md §5."""

from __future__ import annotations

import numpy as np
import pandas as pd

from workstealing_spatial_join_spark.functions import geom as G
from workstealing_spatial_join_spark.functions import wkt as W


def pip_pairs_oracle(images: pd.DataFrame, polygons: pd.DataFrame) -> set:
    """All (image_id, polygon_id) point-in-polygon matches."""
    out = set()
    xs = images["lon"].to_numpy()
    ys = images["lat"].to_numpy()
    ids = images["image_id"].to_numpy()
    for _, poly in polygons.iterrows():
        geoms = W.parse_wkt(poly["wkt"])
        mask = np.zeros(len(xs), dtype=bool)
        for gtype, rings in geoms:
            if gtype == W.POLYGON:
                mask |= G.polygon_contains_xy(rings, xs, ys)
        for img_id in ids[mask]:
            out.add((img_id, poly["polygon_id"]))
    return out


def join_oracle(
    la: pd.DataFrame, lb: pd.DataFrame, id_a: str, id_b: str, predicate: str
):
    """Pairwise nested-loop join with MBR prefilter. Returns
    (pair set, scalar) where scalar is the reference-parity count
    (match count for intersects; numpoints sum otherwise)."""
    pairs = set()
    scalar = 0
    ga = [(r[id_a], W.parse_wkt(r["wkt"]), r) for _, r in la.iterrows()]
    gb = [(r[id_b], W.parse_wkt(r["wkt"]), r) for _, r in lb.iterrows()]
    for ida, geoms_a, ra in ga:
        for idb, geoms_b, rb in gb:
            if (
                ra["minx"] > rb["maxx"]
                or rb["minx"] > ra["maxx"]
                or ra["miny"] > rb["maxy"]
                or rb["miny"] > ra["maxy"]
            ):
                continue
            if predicate == "intersects":
                if any(
                    G.intersects(pa, pb) for pa in geoms_a for pb in geoms_b
                ):
                    pairs.add((ida, idb))
                    scalar += 1
            elif predicate == "intersection_numpoints":
                n = sum(
                    G.intersection_num_points(pa[1], pb[1])
                    for pa in geoms_a
                    for pb in geoms_b
                    if pa[0] == W.POLYGON and pb[0] == W.POLYGON
                )
                if n > 0:
                    pairs.add((ida, idb))
                    scalar += n
            elif predicate == "union_numpoints":
                n = sum(
                    G.union_num_points_convex(pa[1], pb[1])
                    for pa in geoms_a
                    for pb in geoms_b
                    if pa[0] == W.POLYGON and pb[0] == W.POLYGON
                )
                if n > 0:
                    pairs.add((ida, idb))
                    scalar += n
    return pairs, scalar
