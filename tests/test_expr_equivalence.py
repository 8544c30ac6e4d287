"""The memoized name-based expressions (functions/exprs.py,
grid.cell_id_named / covering_cells_named) must be VALUE-IDENTICAL to
the fluent-API originals they replace: the optimization round swapped
construction mechanics (one parsed SQL string per process vs one py4j
round trip per operator node), not semantics. Spark SQL parses a bare
``180.0`` as DECIMAL — the D/L literal suffixes are what keep the
arithmetic in double/long; this suite is the pin."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from workstealing_spatial_join_spark.functions import grid as GRID


@pytest.fixture(scope="module")
def frames(spark):
    rng = np.random.default_rng(11)
    n = 5000
    lon = rng.uniform(-200.0, 200.0, n)  # deliberately out of domain
    lat = rng.uniform(-100.0, 100.0, n)  # → exercises the clamps
    w = rng.uniform(0.0, 5.0, n)
    h = rng.uniform(0.0, 5.0, n)
    pts = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(lon, lat)], "lon double, lat double"
    )
    rects = spark.createDataFrame(
        [
            (float(a), float(b), float(a + c), float(b + d))
            for a, b, c, d in zip(lon, lat, w, h)
        ],
        "minx double, miny double, maxx double, maxy double",
    )
    return pts, rects


@pytest.mark.parametrize("cell_deg", [1.0, 0.25, 3.0])
def test_cell_id_named_identical(spark, frames, cell_deg):
    pts, _ = frames
    both = pts.select(
        GRID.cell_id_col(F.col("lon"), F.col("lat"), cell_deg).alias("a"),
        GRID.cell_id_named("lon", "lat", cell_deg).alias("b"),
    )
    assert both.where("a IS DISTINCT FROM b").count() == 0
    # dtype parity too: both long
    assert dict(both.dtypes) == {"a": "bigint", "b": "bigint"}


@pytest.mark.parametrize("cell_deg", [1.0, 0.25, 3.0])
def test_covering_cells_named_identical(spark, frames, cell_deg):
    _, rects = frames
    both = rects.select(
        GRID.covering_cells_cols(
            F.col("minx"), F.col("miny"), F.col("maxx"), F.col("maxy"),
            cell_deg,
        ).alias("a"),
        GRID.covering_cells_named(
            "minx", "miny", "maxx", "maxy", cell_deg
        ).alias("b"),
    )
    assert both.where("a IS DISTINCT FROM b").count() == 0


def test_cexpr_memoizes(spark):
    from workstealing_spatial_join_spark.functions.exprs import cexpr

    c1 = cexpr("1L + 2L")
    c2 = cexpr("1L + 2L")
    assert c1 is c2
    assert spark.range(1).select(c1.alias("v")).first()["v"] == 3
