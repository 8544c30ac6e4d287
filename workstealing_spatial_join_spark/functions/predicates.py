"""Arrow-batched pandas UDFs wrapping the NumPy refine kernels — the
engine's runtime predicate registry.

The reference selects its refine predicate at COMPILE time
(``#define USE_ST_INTERSECTION / USE_ST_INTERSECTS / USE_ST_UNION``,
include/global_var.h:9-12) and clones the kernel 8× through the code
(src/thread_util.cpp:412-455 et al.). Here each predicate exists once,
as a vectorized pandas UDF, selected at runtime by name.

Vectorization strategy ("prepared geometry" rebirth,
src/spatial_join.cpp:98-99): within each Arrow batch, geometries are
decoded once per UNIQUE wkb (pd.factorize) and point tests run as
NumPy array ops over all points probing that geometry.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from workstealing_spatial_join_spark.functions import geom as G
from workstealing_spatial_join_spark.functions import wkt as W


@F.pandas_udf(T.BooleanType())
def st_contains_xy(poly_wkb: pd.Series, x: pd.Series, y: pd.Series) -> pd.Series:
    """Closed point-in-polygon; decode each unique polygon once per
    batch, vectorize over its probe points."""
    xs = x.to_numpy(dtype=np.float64)
    ys = y.to_numpy(dtype=np.float64)
    out = np.zeros(len(xs), dtype=bool)
    codes, uniques = pd.factorize(poly_wkb)
    for u, wkb in enumerate(uniques):
        mask = codes == u
        res = np.zeros(int(mask.sum()), dtype=bool)
        for gtype, rings in W.from_wkb(wkb):
            if gtype == W.POLYGON:
                res |= G.polygon_contains_xy(rings, xs[mask], ys[mask])
        out[mask] = res
    return pd.Series(out)


def _decode_cache(series: pd.Series, cache: dict):
    out = []
    for wkb in series:
        g = cache.get(wkb)
        if g is None:
            g = W.from_wkb(wkb)
            cache[wkb] = g
        out.append(g)
    return out


@F.pandas_udf(T.BooleanType())
def st_intersects(wkb_a: pd.Series, wkb_b: pd.Series) -> pd.Series:
    """Exact ST_Intersects refine (J2/J5 ST_INTERSECTS mode,
    src/spatial_join.cpp:94-118)."""
    cache: dict = {}
    ga = _decode_cache(wkb_a, cache)
    gb = _decode_cache(wkb_b, cache)
    out = np.zeros(len(ga), dtype=bool)
    for i in range(len(ga)):
        try:
            out[i] = any(
                G.intersects(pa, pb) for pa in ga[i] for pb in gb[i]
            )
        except Exception:
            out[i] = False  # exception-swallowing parity, thread_util.cpp:427-429
    return pd.Series(out)


@F.pandas_udf(T.LongType())
def st_intersection_num_points(wkb_a: pd.Series, wkb_b: pd.Series) -> pd.Series:
    """numPoints of the pairwise intersection (J5 ST_INTERSECTION mode,
    src/thread_util.cpp:424-425). Defined on convex polygon inputs."""
    cache: dict = {}
    ga = _decode_cache(wkb_a, cache)
    gb = _decode_cache(wkb_b, cache)
    out = np.zeros(len(ga), dtype=np.int64)
    for i in range(len(ga)):
        try:
            n = 0
            for ta, ra in ga[i]:
                for tb, rb in gb[i]:
                    if ta == W.POLYGON and tb == W.POLYGON:
                        n += G.intersection_num_points(ra, rb)
            out[i] = n
        except Exception:
            out[i] = 0
    return pd.Series(out)


@F.pandas_udf(T.LongType())
def st_union_num_points(wkb_a: pd.Series, wkb_b: pd.Series) -> pd.Series:
    """numPoints of the pairwise union (J5 ST_UNION mode,
    src/thread_util.cpp:435-441). Defined on convex polygon inputs."""
    cache: dict = {}
    ga = _decode_cache(wkb_a, cache)
    gb = _decode_cache(wkb_b, cache)
    out = np.zeros(len(ga), dtype=np.int64)
    for i in range(len(ga)):
        try:
            n = 0
            for ta, ra in ga[i]:
                for tb, rb in gb[i]:
                    if ta == W.POLYGON and tb == W.POLYGON:
                        n += G.union_num_points_convex(ra, rb)
            out[i] = n
        except Exception:
            out[i] = 0
    return pd.Series(out)


PREDICATES = {
    "contains_xy": st_contains_xy,
    "intersects": st_intersects,
    "intersection_numpoints": st_intersection_num_points,
    "union_numpoints": st_union_num_points,
}
