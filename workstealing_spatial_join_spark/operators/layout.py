"""Space-filling-curve data layout: Z-order (Morton) keys, geohash
encoding, and curve-clustered parquet writes.

The 100-TB story: a spatial table laid out in row order has every
file spanning the whole globe, so a query windowed to one city reads
every file. Sorting by a space-filling curve before writing makes
each parquet file cover a compact spatial range, so file- and
row-group-level min/max statistics prune almost everything outside
the query window — the same reason the reference partitions its
input into spatially coherent blocks before the join phase
(reference: src/reader.cpp block scan feeding src/spatial_join.cpp).
Here the curve key is PURE CATALYST integer arithmetic (scale →
clamp → bit-spread → interleave), so it runs JVM-side inside
whole-stage codegen, never leaves the scan stage, and is expressible
verbatim in ANSI SQL for the driver oracle.

Bit-exactness: the only float step is ``floor((lon+180)/360·2^b)``
— identical literal operands in both engines, one deterministic IEEE
subtract/divide/multiply chain, then integer ops only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MORTON_BITS = 16  # per axis → 32-bit key
GEOHASH_BITS = 20  # per axis → 40 bits → 8 base-32 chars
GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"

# (shift, mask) ladder spreading the low 32 bits of x to the even bit
# positions of a 64-bit word (classic "part1by1" magic numbers).
_SPREAD64 = [
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]


def _scale_axis(v: Column, lo: float, span: float, bits: int) -> Column:
    """Clamped integer grid coordinate in [0, 2^bits)."""
    n = 1 << bits
    ix = F.floor((v - F.lit(lo)) / F.lit(span) * F.lit(float(n)))
    return F.least(F.greatest(ix, F.lit(0)), F.lit(n - 1)).cast("long")


def _spread(x: Column) -> Column:
    for shift, mask in _SPREAD64:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def zorder_key(
    lon: Column, lat: Column, bits: int = MORTON_BITS
) -> Column:
    """Morton key interleaving ``bits``-bit grid coords (lon even
    bits, lat odd bits) — monotone locality: nearby points share key
    prefixes, so range-partitioning by this key co-locates space."""
    ix = _scale_axis(lon, -180.0, 360.0, bits)
    iy = _scale_axis(lat, -90.0, 180.0, bits)
    return _spread(ix).bitwiseOR(F.shiftleft(_spread(iy), 1))


def cluster_by_zorder(
    df: DataFrame,
    lon: str,
    lat: str,
    num_files: int,
    key_col: str = "_zkey",
) -> DataFrame:
    """Return ``df`` re-laid-out for writing: range-partitioned and
    sorted by the Morton key so each output file covers a compact
    spatial window (tight parquet min/max stats → file pruning).
    Drop ``key_col`` after write if undesired; keeping it enables
    key-range predicate pushdown on re-read."""
    keyed = df.withColumn(key_col, zorder_key(F.col(lon), F.col(lat)))
    return keyed.repartitionByRange(
        num_files, key_col
    ).sortWithinPartitions(key_col)


# ------------------------------------------------- expression twins
#
# One generator emits the formula for BOTH engines (dialect only
# changes the shift spelling: DuckDB has << / >>, Spark SQL spells
# them shiftleft/shiftright) — so the driver oracle runs the
# byte-identical arithmetic, not a reimplementation.


def _dialect(dialect: str):
    if dialect == "duckdb":
        return (
            lambda e, s: f"({e} << {s})",
            lambda e, s: f"({e} >> {s})",
        )
    return (
        lambda e, s: f"shiftleft({e}, {s})",
        lambda e, s: f"shiftright({e}, {s})",
    )


def _sql_spread(e: str, shl) -> str:
    for shift, mask in _SPREAD64:
        e = f"(({e} | {shl(e, shift)}) & {mask})"
    return e


def _sql_scale(v: str, lo: float, span: float, bits: int) -> str:
    n = 1 << bits
    ix = f"FLOOR((({v}) - ({lo!r})) / ({span!r}) * ({float(n)!r}))"
    return f"CAST(LEAST(GREATEST({ix}, 0), {n - 1}) AS BIGINT)"


def sql_zorder_key(
    lon: str, lat: str, dialect: str = "duckdb", bits: int = MORTON_BITS
) -> str:
    """SQL twin of :func:`zorder_key` (same generator both engines)."""
    shl, _ = _dialect(dialect)
    sx = _sql_spread(_sql_scale(lon, -180.0, 360.0, bits), shl)
    sy = _sql_spread(_sql_scale(lat, -90.0, 180.0, bits), shl)
    return f"({sx} | {shl(sy, 1)})"


def _geohash_parts(
    lon: str, lat: str, dialect: str, precision: int
) -> list[str]:
    shl, shr = _dialect(dialect)
    sx = _sql_spread(_sql_scale(lon, -180.0, 360.0, GEOHASH_BITS), shl)
    sy = _sql_spread(_sql_scale(lat, -90.0, 180.0, GEOHASH_BITS), shl)
    z = f"({shl(sx, 1)} | {sy})"
    total = 2 * GEOHASH_BITS
    return [
        f"substr('{GEOHASH_ALPHABET}', "
        f"CAST(({shr(z, total - 5 * (i + 1))} & 31) AS INT) + 1, 1)"
        for i in range(precision)
    ]


def sql_geohash(
    lon: str, lat: str, dialect: str = "duckdb", precision: int = 8
) -> str:
    """SQL twin of :func:`geohash_expr` (string concat per dialect)."""
    parts = _geohash_parts(lon, lat, dialect, precision)
    if dialect == "duckdb":
        return "(" + " || ".join(parts) + ")"
    return "concat(" + ", ".join(parts) + ")"


def geohash_expr(
    lon_sql: str, lat_sql: str, precision: int = 8
) -> Column:
    """Spark-side geohash: standard base-32 geohash string (lon owns
    the first bit), emitted by the same generator as the DuckDB twin.
    Pure Catalyst — interleave + substr lookups, no Python."""
    return F.expr(
        sql_geohash(lon_sql, lat_sql, dialect="spark", precision=precision)
    )


# ------------------------------------------------- hexagonal binning
#
# A honeycomb is the Voronoi diagram of two interleaved rectangular
# lattices: lattice A at (2i·sx, 2j·sy), lattice B offset by (sx, sy).
# Assigning a point to the nearer of its two candidate centers (one
# per lattice, in the metric that stretches x by 1/sx and y by 1/sy)
# tessellates the plane into hexagons — the same construction
# matplotlib's hexbin uses to fit hexagons to an arbitrary viewport
# aspect. With sy/sx = √3 the hexagons are regular; the defaults
# below use the closest INTEGER ratio (20784/12000 = 1.732) so every
# step — the round-to-nearest-center, the two distance forms, the
# winner CASE — is int64 arithmetic, identical in Spark and DuckDB,
# with no float rounding to reason about. Magnitudes: |mx-cx| ≤ sx,
# so each distance term is ≤ (sx·sy)² ≈ 6.2e16 — comfortably int64.
#
# At 10^12 rows this is the density-surface / choropleth primitive:
# the center assignment is a map-side projection inside whole-stage
# codegen and the only exchange is the groupBy on (hx, hy).

HEXBIN_SX = 12_000  # half-pitch x, millidegrees
HEXBIN_SY = 20_784  # half-pitch y ≈ √3·sx → near-regular hexagons


def _sql_floordiv(a: str, b: int, dialect: str) -> str:
    """Floor division of a possibly-negative int by a positive int,
    spelled with % so both engines share the semantics (both define
    % with the dividend's sign); the final division is exact (the
    numerator is a multiple of b), so truncating `div` (Spark) and
    `//` (DuckDB) agree."""
    m = f"(((({a}) % {b}) + {b}) % {b})"
    op = "//" if dialect == "duckdb" else "div"
    return f"((({a}) - {m}) {op} {b})"


def sql_hexbin_center(
    mx: str,
    my: str,
    dialect: str = "duckdb",
    sx: int = HEXBIN_SX,
    sy: int = HEXBIN_SY,
) -> tuple[str, str]:
    """(hx, hy) center expressions of the hexagon owning integer
    point (mx, my) — same generator for both engines. Boundary ties
    go to lattice A (da <= db), deterministically in both."""
    axa = f"({2 * sx} * {_sql_floordiv(f'({mx}) + {sx}', 2 * sx, dialect)})"
    aya = f"({2 * sy} * {_sql_floordiv(f'({my}) + {sy}', 2 * sy, dialect)})"
    bxb = f"({2 * sx} * {_sql_floordiv(mx, 2 * sx, dialect)} + {sx})"
    byb = f"({2 * sy} * {_sql_floordiv(my, 2 * sy, dialect)} + {sy})"

    def dist(cx: str, cy: str) -> str:
        dx = f"(({mx}) - {cx})"
        dy = f"(({my}) - {cy})"
        return f"({dx} * {dx} * {sy * sy} + {dy} * {dy} * {sx * sx})"

    da, db = dist(axa, aya), dist(bxb, byb)
    hx = f"(CASE WHEN {da} <= {db} THEN {axa} ELSE {bxb} END)"
    hy = f"(CASE WHEN {da} <= {db} THEN {aya} ELSE {byb} END)"
    return hx, hy


def hexbin_density(
    pts: DataFrame,
    mx: str = "mx",
    my: str = "my",
    id_col: str = "point_id",
    sx: int = HEXBIN_SX,
    sy: int = HEXBIN_SY,
) -> DataFrame:
    """Per-hexagon density over integer-millidegree points: center
    coords, point count, min id (a stable exemplar). Pure Catalyst —
    the center assignment never leaves the scan's codegen stage and
    the single exchange is the (hx, hy) groupBy."""
    hx, hy = sql_hexbin_center(mx, my, dialect="spark", sx=sx, sy=sy)
    return (
        pts.select(
            F.expr(hx).alias("hx"),
            F.expr(hy).alias("hy"),
            F.col(id_col),
        )
        .groupBy("hx", "hy")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.min(id_col).alias("min_point"),
        )
    )


# ---------------------------------------------------------------- STR

STR_LEAF_CAP = 64


def exact_global_rank(
    df: DataFrame,
    order_col: str,
    tiebreak_col: str,
    out_col: str = "g_rank",
    partitions: int = 32,
) -> DataFrame:
    """EXACT 0-based global rank by ``(order_col, tiebreak_col)``
    WITHOUT a single-partition window — the distributed order-
    statistics primitive STR packing (and any exact quantile/ranking
    job) needs at 10^12 rows, where ``Window.orderBy`` with no
    partition key collapses the frame onto one task.

    Mechanism: repartitionByRange on the sort key (range-disjoint
    partitions whose concatenation IS the global order — the sampled
    boundaries affect only the split points, never the rank), local
    row_number per physical partition, plus a broadcast prefix-offset
    frame (one tiny count-per-partition aggregate, cumulated over at
    most ``partitions`` rows). Rank = offset + local rank − 1: exact
    and deterministic regardless of where the sampled boundaries
    fall, because the tiebreak column makes the total order strict."""
    ranged = df.repartitionByRange(
        partitions, F.col(order_col), F.col(tiebreak_col)
    ).withColumn("_pid", F.spark_partition_id())
    from pyspark.sql import Window

    w = Window.partitionBy("_pid").orderBy(order_col, tiebreak_col)
    local = ranged.withColumn("_lrank", F.row_number().over(w))
    counts = local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    off_w = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offs = counts.select(
        "_pid", (F.sum("_n").over(off_w) - F.col("_n")).alias("_off")
    )
    return (
        local.join(F.broadcast(offs), "_pid")
        .withColumn(out_col, F.col("_off") + F.col("_lrank") - 1)
        .drop("_pid", "_lrank", "_off")
    )


def str_pack_leaves(
    points: DataFrame,
    leaf_cap: int = STR_LEAF_CAP,
    x_col: str = "mx",
    y_col: str = "my",
) -> DataFrame:
    """Sort-Tile-Recursive bulk-load leaf packing (Leutenegger et
    al., ICDE 1997) — the reference builds a GEOS STRtree per worker
    over its layer shard (reference: src/spatial_join.cpp STRtree
    build/probe); this materializes the same packing DISTRIBUTED, as
    a leaf table ``(slice, leaf, n_pts, minx, miny, maxx, maxy)``
    ready to serve as a global R-tree level or a spatially coherent
    file manifest.

    STR: m = ⌈n/cap⌉ leaves, S = ⌈√m⌉ vertical slices by x-rank,
    each slice packed by y-rank into runs of ``cap``. Both ranks are
    exact: x globally via :func:`exact_global_rank`, y per slice via
    an ordinary partitioned window. ``slice = (rank_x·S) div n`` and
    ``S = ceil(sqrt(m))`` are computed IN-PLAN from a broadcast
    one-row count frame — no driver-side action; IEEE sqrt of an
    int is exact at perfect squares and the ceil never wavers
    elsewhere, so both engines agree on S."""
    from pyspark.sql import Window

    ranked = exact_global_rank(points, x_col, y_col, "rank_x")
    glob = points.agg(F.count(F.lit(1)).alias("n"))
    withs = ranked.join(F.broadcast(glob)).withColumn(
        "s_slices",
        F.expr(
            f"CAST(CEIL(SQRT(CAST((n + {leaf_cap} - 1) div {leaf_cap} "
            f"AS DOUBLE))) AS BIGINT)"
        ),
    )
    sliced = withs.withColumn(
        "slice", F.expr("(rank_x * s_slices) div n")
    )
    wy = Window.partitionBy("slice").orderBy(y_col, x_col, "rank_x")
    leaves = sliced.withColumn(
        "rank_y", F.row_number().over(wy) - 1
    ).withColumn("leaf", F.expr(f"rank_y div {leaf_cap}"))
    return leaves.groupBy("slice", "leaf").agg(
        F.count(F.lit(1)).alias("n_pts"),
        F.min(x_col).alias("minx"),
        F.min(y_col).alias("miny"),
        F.max(x_col).alias("maxx"),
        F.max(y_col).alias("maxy"),
    )


def sql_str_pack_leaves(
    points_sql: str,
    leaf_cap: int = STR_LEAF_CAP,
    x_col: str = "mx",
    y_col: str = "my",
) -> str:
    """DuckDB twin — the ranks come from plain global ROW_NUMBERs
    (the single-node luxury), so the contract proves the distributed
    rank machinery lands the identical packing."""
    return (
        f"WITH pts AS ({points_sql}), "
        f"g AS (SELECT COUNT(*) AS n, CAST(CEIL(SQRT(CAST("
        f"(COUNT(*) + {leaf_cap} - 1) // {leaf_cap} AS DOUBLE))) "
        f"AS BIGINT) AS s_slices FROM pts), "
        f"rx AS (SELECT *, ROW_NUMBER() OVER (ORDER BY {x_col}, "
        f"{y_col}) - 1 AS rank_x FROM pts), "
        f"sl AS (SELECT rx.*, (rank_x * g.s_slices) // g.n AS slice "
        f"FROM rx, g), "
        f"ly AS (SELECT *, (ROW_NUMBER() OVER (PARTITION BY slice "
        f"ORDER BY {y_col}, {x_col}, rank_x) - 1) // {leaf_cap} "
        f"AS leaf FROM sl) "
        f"SELECT slice, leaf, COUNT(*) AS n_pts, "
        f"MIN({x_col}) AS minx, MIN({y_col}) AS miny, "
        f"MAX({x_col}) AS maxx, MAX({y_col}) AS maxy "
        f"FROM ly GROUP BY slice, leaf"
    )


# ------------------------------------------------------ Hilbert curve

HILBERT_ORDER = 19  # per-axis bits; 2^19 = 524288 > 360000 milli


def _hilbert_step(
    xc: str, yc: str, dc: str, s: int, n: int, dialect: str
):
    """One iteration of the classic xy2d walk (Hilbert 1891; the
    s-loop formulation popularized by Wikipedia's xy2d) as THREE
    simultaneous-update SQL expressions over the previous step's
    columns. Two portability traps, both unit-pinned:

    * The XOR in d += s²·((3·rx) ^ ry) is replaced by the equivalent
      polynomial 3·rx + ry − 2·rx·ry on {0,1}×{0,1} (DuckDB's ``^``
      is exponentiation) — ONE emitter, both engines.
    * The rotation reflects with the FULL side, ``n−1−x`` — the
      s−1−x variant found in some ports drives coordinates negative,
      where C/Python bit-ands (two's complement) and SQL ``%``
      (truncated) silently diverge. With n−1−x coordinates stay in
      [0, n) for the whole walk, so the bit test (x & s) is exactly
      (x div s) % 2 with everything non-negative."""
    dv = "//" if dialect == "duckdb" else "div"
    rx = f"(({xc} {dv} {s}) % 2)"
    ry = f"(({yc} {dv} {s}) % 2)"
    d_new = f"({dc} + {s * s} * (3 * {rx} + {ry} - 2 * {rx} * {ry}))"
    x_new = (
        f"CASE WHEN {ry} = 1 THEN {xc} "
        f"WHEN {rx} = 1 THEN {n - 1} - {yc} ELSE {yc} END"
    )
    y_new = (
        f"CASE WHEN {ry} = 1 THEN {yc} "
        f"WHEN {rx} = 1 THEN {n - 1} - {xc} ELSE {xc} END"
    )
    return x_new, y_new, d_new


def hilbert_key(
    df: DataFrame,
    x_col: str,
    y_col: str,
    order: int = HILBERT_ORDER,
    out_col: str = "hkey",
) -> DataFrame:
    """Hilbert-curve rank of non-negative integer grid coordinates in
    [0, 2^order) — the LOCALITY-OPTIMAL space-filling layout key.
    Z-order (``zorder_key``) has quadrant seams: consecutive Morton
    keys can jump across half the domain, so a range of keys maps to
    up to O(log n) disjoint spatial windows. Consecutive Hilbert
    ranks are ALWAYS 4-adjacent cells (unit-proven over an exhaustive
    grid), so each parquet file under a Hilbert sort covers one
    compact blob — measurably better min/max pruning at 100 TB, which
    is why Databricks liquid clustering moved from Z-order to Hilbert.

    Pure Catalyst: ``order`` stacked Projects (one per s level) that
    whole-stage codegen collapses into a single stage — zero shuffle,
    zero Python, plan-gated. d < 4^order fits int64 through order 31.
    """
    cur = (
        df.withColumn("_hx", F.col(x_col).cast("long"))
        .withColumn("_hy", F.col(y_col).cast("long"))
        .withColumn("_hd", F.lit(0).cast("long"))
    )
    keep = [c for c in df.columns]
    s = 1 << (order - 1)
    while s > 0:
        xn, yn, dn = _hilbert_step("_hx", "_hy", "_hd", s, 1 << order, "spark")
        cur = cur.select(
            *keep,
            F.expr(xn).cast("long").alias("_hx"),
            F.expr(yn).cast("long").alias("_hy"),
            F.expr(dn).cast("long").alias("_hd"),
        )
        s //= 2
    return cur.select(*keep, F.col("_hd").alias(out_col))


def sql_hilbert_key(
    src_sql: str,
    x_col: str,
    y_col: str,
    keep_cols: tuple,
    order: int = HILBERT_ORDER,
    out_col: str = "hkey",
) -> str:
    """DuckDB twin — the same emitter unrolled as chained CTEs."""
    keep = ", ".join(keep_cols)
    ctes = [
        f"h0 AS (SELECT {keep}, CAST({x_col} AS BIGINT) AS _hx, "
        f"CAST({y_col} AS BIGINT) AS _hy, CAST(0 AS BIGINT) AS _hd "
        f"FROM ({src_sql}))"
    ]
    s = 1 << (order - 1)
    i = 0
    while s > 0:
        xn, yn, dn = _hilbert_step("_hx", "_hy", "_hd", s, 1 << order, "duckdb")
        ctes.append(
            f"h{i + 1} AS (SELECT {keep}, CAST({xn} AS BIGINT) AS _hx, "
            f"CAST({yn} AS BIGINT) AS _hy, CAST({dn} AS BIGINT) AS _hd "
            f"FROM h{i})"
        )
        s //= 2
        i += 1
    return (
        "WITH " + ", ".join(ctes)
        + f" SELECT {keep}, _hd AS {out_col} FROM h{i}"
    )


# ------------------------------------------- Z-range decomposition
#
# How a curve-keyed table actually SERVES windowed queries at scale:
# decompose the query rectangle into a bounded set of CONTIGUOUS
# Morton-key intervals (quadtree descent), push those intervals into
# the scan as zkey BETWEEN predicates (parquet min/max stats prune
# files/row-groups), and refine with the exact bbox residual. The
# GeoMesa/BigQuery-GIS query path, reproduced on plain parquet.


def _morton2(ix: int, iy: int, bits: int) -> int:
    z = 0
    for b in range(bits):
        z |= ((ix >> b) & 1) << (2 * b) | ((iy >> b) & 1) << (2 * b + 1)
    return z


def zrange_decompose(
    ix0: int,
    ix1: int,
    iy0: int,
    iy1: int,
    bits: int = MORTON_BITS,
    max_ranges: int = 64,
) -> list[tuple[int, int]]:
    """Decompose the inclusive grid-cell rectangle
    ``[ix0..ix1] × [iy0..iy1]`` into ≤ ``max_ranges`` contiguous
    Morton-key intervals COVERING it (a superset — the scan refines
    with the exact bbox, so coarseness costs I/O, never correctness).
    Classic quadtree descent: a quad fully inside the rect emits its
    whole contiguous key block; a partial quad splits until the
    budget says stop, at which point it is emitted whole (coarsened).
    Adjacent/overlapping intervals are merged. Driver-side planning
    arithmetic — pure Python ints, runs once per query, never
    touches data."""
    out: list[tuple[int, int]] = []
    budget = [max_ranges * 4]  # leaf budget before coarsening

    def visit(qx: int, qy: int, level: int) -> None:
        # quad at `level` covers cells [qx<<level, (qx+1)<<level) etc.
        size = 1 << level
        x_lo, x_hi = qx * size, qx * size + size - 1
        y_lo, y_hi = qy * size, qy * size + size - 1
        if x_hi < ix0 or x_lo > ix1 or y_hi < iy0 or y_lo > iy1:
            return
        z_lo = _morton2(x_lo, y_lo, bits)
        full = (
            x_lo >= ix0 and x_hi <= ix1 and y_lo >= iy0 and y_hi <= iy1
        )
        if full or level == 0 or budget[0] <= 0:
            out.append((z_lo, z_lo + size * size - 1))
            if not full:
                budget[0] -= 1
            return
        budget[0] -= 1
        for dy in (0, 1):
            for dx in (0, 1):
                visit(qx * 2 + dx, qy * 2 + dy, level - 1)

    visit(0, 0, bits)
    out.sort()
    merged: list[tuple[int, int]] = []
    for lo, hi in out:
        if merged and lo <= merged[-1][1] + 1:
            merged[-1] = (merged[-1][0], max(merged[-1][1], hi))
        else:
            merged.append((lo, hi))
    # enforce the hard cap by greedily merging the smallest gaps
    while len(merged) > max_ranges:
        gaps = [
            (merged[i + 1][0] - merged[i][1], i)
            for i in range(len(merged) - 1)
        ]
        _, i = min(gaps)
        merged[i] = (merged[i][0], merged[i + 1][1])
        del merged[i + 1]
    return merged


def grid_index(v: float, lo: float, span: float, bits: int) -> int:
    """Driver-side twin of :func:`_scale_axis` — same IEEE chain."""
    import math

    n = 1 << bits
    ix = math.floor((v - lo) / span * float(n))
    return max(0, min(n - 1, ix))


def zrange_predicate(
    lon_min: float,
    lon_max: float,
    lat_min: float,
    lat_max: float,
    bits: int = MORTON_BITS,
    max_ranges: int = 64,
    key_col: str = "zkey",
    dialect: str = "spark",
) -> str:
    """The pushdown-able scan predicate for a lon/lat window: OR of
    ``key BETWEEN lo AND hi`` over the decomposed ranges. Identical
    string for Spark SQL and DuckDB (BETWEEN is ANSI)."""
    ranges = zrange_decompose(
        grid_index(lon_min, -180.0, 360.0, bits),
        grid_index(lon_max, -180.0, 360.0, bits),
        grid_index(lat_min, -90.0, 180.0, bits),
        grid_index(lat_max, -90.0, 180.0, bits),
        bits,
        max_ranges,
    )
    return (
        "("
        + " OR ".join(
            f"{key_col} BETWEEN {lo} AND {hi}" for lo, hi in ranges
        )
        + ")"
    )
