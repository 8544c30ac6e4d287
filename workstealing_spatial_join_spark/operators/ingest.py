"""Geometry ingest: WKT/hex-WKB text → WKB + bounds + type columns,
with multipart explosion.

Re-creates the reference's scan/parse operators S1-S5 (SURVEY.md §2.1):
* S1 line scan        → ``spark.read.text`` + length filter (F5)
* S2 WKT parse        → Arrow-batched ``mapInPandas`` below
* S3 hex-WKB parse    → same path, ``fmt='wkb'``
* S4 parallel parse   → free: Spark parallelizes by input split
* F1/F2 envelope      → ``minx/miny/maxx/maxy`` columns computed once
  at ingest; Catalyst prunes/pushes them thereafter

Invalid rows are dropped silently, matching the reference's lax
validation (src/reader.cpp:36-40).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from workstealing_spatial_join_spark.functions import geom as GEOM
from workstealing_spatial_join_spark.functions import wkt as W

GEOM_COLS = ["geom_wkb", "gtype", "part_idx", "minx", "miny", "maxx", "maxy"]


def ingest_geometry(
    df: DataFrame,
    geom_col: str = "wkt",
    fmt: str = "wkt",
    keep_cols: list[str] | None = None,
    validate: bool = False,
) -> DataFrame:
    """Parse a WKT (or hex-WKB) string column into exploded simple
    geometries with cached bounds. One input row with a MULTI*
    geometry yields one output row per part (src/reader.cpp:44-50).

    Output columns: ``keep_cols + [geom_wkb, gtype, part_idx,
    minx, miny, maxx, maxy]``.

    ``validate=True`` additionally drops TOPOLOGICALLY invalid parts
    (self-intersecting rings, open rings, holes outside or straddling
    the shell, NESTED or properly-crossing holes, non-finite
    coordinates) — the F6 upgrade beyond the reference's
    parse-failure-only validation (src/reader.cpp:36-40); failure
    classes mirror GEOS IsValid (see functions/geom.is_valid_geom and
    scripts/gen_degenerate_fixture.gen_invalid_family).
    """
    keep_cols = keep_cols or [c for c in df.columns if c != geom_col]
    src = df.select(*keep_cols, F.col(geom_col).alias("__geom_src"))
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in src.schema if f.name != "__geom_src"]
        + [
            "geom_wkb binary",
            "gtype int",
            "part_idx int",
            "minx double",
            "miny double",
            "maxx double",
            "maxy double",
        ]
    )

    def parse_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {c: [] for c in pdf.columns if c != "__geom_src"}
            wkbs, gtypes, parts = [], [], []
            bounds = [[], [], [], []]
            for i, raw in enumerate(pdf["__geom_src"].tolist()):
                try:
                    if raw is None or len(raw) <= 5:  # F5 garbage filter
                        continue
                    geoms = (
                        W.parse_wkt(raw)
                        if fmt == "wkt"
                        else W.from_wkb(bytes.fromhex(raw))
                    )
                except Exception:
                    continue  # lax validation, reference parity
                for pidx, (gtype, rings) in enumerate(geoms):
                    if validate and not GEOM.is_valid_geom(gtype, rings):
                        continue
                    allc = np.vstack(rings)
                    wkbs.append(W.to_wkb(gtype, rings))
                    gtypes.append(gtype)
                    parts.append(pidx)
                    bounds[0].append(float(allc[:, 0].min()))
                    bounds[1].append(float(allc[:, 1].min()))
                    bounds[2].append(float(allc[:, 0].max()))
                    bounds[3].append(float(allc[:, 1].max()))
                    for c in rows:
                        rows[c].append(pdf[c].iloc[i])
            out = pd.DataFrame(rows)
            out["geom_wkb"] = pd.Series(wkbs, dtype=object)
            out["gtype"] = pd.Series(gtypes, dtype="int32")
            out["part_idx"] = pd.Series(parts, dtype="int32")
            for name, vals in zip(["minx", "miny", "maxx", "maxy"], bounds):
                out[name] = pd.Series(vals, dtype="float64")
            yield out

    return src.mapInPandas(parse_batches, schema=out_schema)


def read_wkt_layer(spark, path: str, fmt: str = "wkt") -> DataFrame:
    """Reference-parity layer reader: line-delimited WKT/hex-WKB text
    file → geometry DataFrame (S1+S2/S3). Spark's input-split
    parallelism replaces the reference's MPI-IO block reader S7
    (src/reader.cpp:364-518)."""
    lines = spark.read.text(path).withColumnRenamed("value", "wkt")
    lines = lines.where(F.length("wkt") > 5)  # src/reader.cpp:14
    lines = lines.withColumn("geom_id", F.monotonically_increasing_id())
    return ingest_geometry(lines, "wkt", fmt=fmt, keep_cols=["geom_id"])
