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
