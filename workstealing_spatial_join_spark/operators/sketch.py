"""Distinct-count sketches: HyperLogLog as pure Catalyst aggregation.

The 100-TB story for COUNT(DISTINCT): an exact distinct over 10^12
rows shuffles every distinct key; a HyperLogLog sketch shuffles at
most ``m`` (=2^b) register rows per group, merges associatively
(register-wise MAX — so partial aggregation, AQE, and cross-dataset
unions all compose), and answers within ~1.04/sqrt(m). This
implementation is deliberately EXACTLY reproducible in ANSI SQL so
the driver oracle can hash-compare it:

* item hash: md5 of the key rendered as a string — register index =
  first hex byte (b=8 → 256 registers), rho = leading-zero count of
  the next 60 bits + 1, computed via LENGTH(BIN(x)) (Spark's `bin`
  and DuckDB's `bin` both emit minimal binary digits, pytest-pinned).
* harmonic sum: registers are combined as INTEGERS — each register
  contributes 2^(45 - min(rho, 45)), an exact int64 term; the group
  sum is ≤ 2^53 even with all 256 registers empty, so it is exact in
  int64 AND in the double it becomes at division time. No float
  summation anywhere → no ordering sensitivity → bit-exact parity.
  (Capping rho at 45 changes the estimate only when a single hash
  has ≥45 leading zero bits — probability 2^-45 per item.)
* raw estimate: alpha_m·m²·2^45 / harmonic — the numerator is ONE
  Python-evaluated double literal embedded identically in the Spark
  plan and the oracle SQL, so the division has identical operands.

The RAW estimate is what is oracle-hashed (exact). The small-range
(linear-counting) correction uses ln(), which is not guaranteed
bit-identical across libm implementations — apply it caller-side
with ``hll_correct`` (tests verify accuracy, not the driver hash).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HLL_B = 8
HLL_M = 1 << HLL_B  # 256 registers
RHO_CAP = 45
_SCALE = 1 << RHO_CAP  # empty-register term; 256·2^45 = 2^53 exact


def hll_alpha(m: int = HLL_M) -> float:
    return 0.7213 / (1.0 + 1.079 / m)


def hll_numerator(m: int = HLL_M) -> float:
    """alpha·m²·2^45 as one double literal (same bits both engines)."""
    return hll_alpha(m) * float(m) * float(m) * float(_SCALE)


def hll_register_cols(key: Column) -> tuple[Column, Column]:
    """(register, rho) for one item — md5-based, SQL-twin-exact."""
    h = F.md5(key.cast("string"))
    reg = F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
    x = F.conv(F.substring(h, 3, 15), 16, 10).cast("long")
    rho = F.when(x == 0, F.lit(61)).otherwise(
        F.lit(61) - F.length(F.bin(x))
    )
    return reg, F.least(rho, F.lit(RHO_CAP))


def hll_sketch(
    df: DataFrame, group_cols: list[str], key: str
) -> DataFrame:
    """Per-group register table ``(group_cols..., register, max_rho)``
    — the mergeable representation (union two sketches by another
    groupBy-MAX over the same schema)."""
    reg, rho = hll_register_cols(F.col(key))
    return (
        df.select(*group_cols, reg.alias("register"), rho.alias("rho"))
        .groupBy(*group_cols, "register")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_distinct(
    df: DataFrame, group_cols: list[str], key: str
) -> DataFrame:
    """Per-group HLL distinct-count estimate. Output columns:
    ``n_registers_used`` (long), ``harmonic_scaled`` (long, exact),
    ``hll_raw`` (double, exact division) — all bit-reproducible; feed
    ``hll_raw``/``n_registers_used`` to :func:`hll_correct` for the
    small-range-corrected estimate."""
    sk = hll_sketch(df, group_cols, key)
    used = F.count(F.lit(1))
    present_sum = F.sum(
        F.expr(f"shiftleft(CAST(1 AS BIGINT), {RHO_CAP} - max_rho)")
    )
    harmonic = (
        present_sum + (F.lit(HLL_M) - used) * F.lit(_SCALE).cast("long")
    ).cast("long")
    return sk.groupBy(*group_cols).agg(
        used.cast("long").alias("n_registers_used"),
        harmonic.alias("harmonic_scaled"),
        (
            F.lit(hll_numerator()) / harmonic.cast("double")
        ).alias("hll_raw"),
    )


def hll_correct(raw: float, used: int, m: int = HLL_M) -> float:
    """Small-range (linear counting) correction — caller-side because
    ln() is not bit-portable across engines."""
    v = m - used
    if raw <= 2.5 * m and v > 0:
        return m * math.log(m / v)
    return raw


def sql_hll_distinct(
    src: str, group_expr: str, key_expr: str, alias: str = "g"
) -> str:
    """DuckDB twin of :func:`hll_distinct` — same md5 register/rho,
    same integer harmonic sum, same literal numerator."""
    num = repr(hll_numerator())
    return (
        f"WITH items AS (SELECT {group_expr} AS {alias}, "
        f"CAST(('0x' || substr(md5(CAST({key_expr} AS VARCHAR)), 1, 2)) "
        f"AS INT) AS register, "
        f"CAST(('0x' || substr(md5(CAST({key_expr} AS VARCHAR)), 3, 15)) "
        f"AS BIGINT) AS x FROM {src}), "
        f"regs AS (SELECT {alias}, register, "
        f"MAX(LEAST(CASE WHEN x = 0 THEN 61 ELSE 61 - LENGTH(BIN(x)) END, "
        f"{RHO_CAP})) AS max_rho FROM items GROUP BY {alias}, register), "
        f"agg AS (SELECT {alias}, COUNT(*) AS n_registers_used, "
        f"CAST(SUM(CAST(1 AS BIGINT) << ({RHO_CAP} - max_rho)) "
        f"+ ({HLL_M} - COUNT(*)) * CAST({_SCALE} AS BIGINT) AS BIGINT) "
        f"AS harmonic_scaled FROM regs GROUP BY {alias}) "
        f"SELECT {alias}, n_registers_used, harmonic_scaled, "
        f"{num} / CAST(harmonic_scaled AS DOUBLE) AS hll_raw FROM agg"
    )


# ------------------------------------------------ Count-Min sketch
#
# Heavy-hitter counting at 10^12 rows: exact per-key counts shuffle
# every key; a Count-Min sketch shuffles at most depth×width counter
# rows (mergeable by SUM — partial aggregation and cross-dataset
# unions compose), and over-estimates each key's count by at most
# e·N/width with probability 1-(1/2)^depth. Like the HLL above, the
# whole sketch is integer arithmetic on md5-derived indices, so the
# DuckDB oracle reproduces it bit-for-bit.

CMS_DEPTH = 4
CMS_WIDTH = 512


def cms_hash_idx(key: Column, row: Column, width: int = CMS_WIDTH) -> Column:
    """Bucket index for one (row, key): md5 of 'row:key' → 60-bit
    int → mod width. Row-salting the string gives CMS_DEPTH
    independent hash functions from one md5 family."""
    h = F.md5(F.concat(row.cast("string"), F.lit(":"), key.cast("string")))
    return F.pmod(
        F.conv(F.substring(h, 1, 15), 16, 10).cast("long"), F.lit(width)
    ).cast("int")


def cms_counters(
    df: DataFrame,
    key: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """The sketch itself: ``(row, idx, cnt)`` — ≤ depth·width rows
    total regardless of input size. The explode is absorbed by
    map-side partial aggregation (≤ depth·width groups per task).
    Merge two sketches by union + groupBy(row, idx).sum(cnt)."""
    row = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row")
    return (
        df.select(F.col(key).alias("_k"))
        .select(row, F.col("_k"))
        .select(
            "row", cms_hash_idx(F.col("_k"), F.col("row"), width).alias("idx")
        )
        .groupBy("row", "idx")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    counters: DataFrame,
    probes: DataFrame,
    key: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-query the sketch for every row of ``probes``: the
    estimate is min over rows of the addressed counter (0 when the
    bucket is empty — only possible for never-inserted keys). The
    probe side explodes ×depth then equi-joins the tiny counter
    table (broadcast-able by size: ≤ depth·width rows)."""
    row = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row")
    addressed = probes.select(F.col(key)).distinct().select(
        F.col(key), row
    ).select(
        F.col(key),
        F.col("row"),
        cms_hash_idx(F.col(key), F.col("row"), width).alias("idx"),
    )
    joined = addressed.join(
        F.broadcast(counters), on=["row", "idx"], how="left"
    )
    return joined.groupBy(key).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est")
    )


def sql_cms_heavy(
    src: str,
    key_expr: str,
    threshold: int,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> str:
    """DuckDB twin of the heavy-hitters query built from
    cms_counters + cms_estimate + an exact-count join: emits
    ``(key, cms_est, true_cnt)`` for keys whose CMS estimate meets
    the threshold. Same md5 row-salted bucket hash, same integer
    counters."""
    idx = (
        f"CAST(CAST(('0x' || substr(md5(CAST(r.j AS VARCHAR) || ':' || "
        f"CAST(k AS VARCHAR)), 1, 15)) AS BIGINT) % {width} AS INT)"
    )
    return (
        f"WITH items AS (SELECT {key_expr} AS k FROM {src}), "
        f"ins AS (SELECT r.j AS row, {idx} AS idx FROM items, "
        f"range({depth}) r(j)), "
        f"counters AS (SELECT row, idx, COUNT(*) AS cnt FROM ins "
        f"GROUP BY row, idx), "
        f"probes AS (SELECT DISTINCT k FROM items), "
        f"addr AS (SELECT k, r.j AS row, {idx} AS idx FROM probes, "
        f"range({depth}) r(j)), "
        f"est AS (SELECT k, MIN(COALESCE(cnt, 0)) AS cms_est FROM addr "
        f"LEFT JOIN counters USING (row, idx) GROUP BY k), "
        f"truth AS (SELECT k, COUNT(*) AS true_cnt FROM items GROUP BY k) "
        f"SELECT k, cms_est, true_cnt FROM est JOIN truth USING (k) "
        f"WHERE cms_est >= {threshold}"
    )


# ----------------------------------------------- Bloom-filter semi-join
#
# Selective-join pruning at 10^12 rows: filtering a huge fact table
# by a key subset normally shuffles the fact side; a Bloom filter of
# the build keys broadcasts as m bits and prunes fact rows map-side,
# with false-positive rate ~(1-e^{-kn/m})^k and NO false negatives —
# only survivors reach the real join. (Spark's own runtime row-group
# bloom pruning covers simple equi-joins; this operator makes the
# structure explicit, mergeable, and reusable across stages/queries.)
# The filter is represented as the sorted int array of set bit
# positions — integer md5 arithmetic, so the DuckDB oracle rebuilds
# it bit-for-bit; merge two filters by array_union.

BLOOM_BITS = 4096
BLOOM_K = 3


def bloom_position(key: Column, j: Column, m: int = BLOOM_BITS) -> Column:
    """Bit position for hash j of key — md5('j#key') mod m."""
    h = F.md5(F.concat(j.cast("string"), F.lit("#"), key.cast("string")))
    return F.pmod(
        F.conv(F.substring(h, 1, 15), 16, 10).cast("long"), F.lit(m)
    ).cast("int")


def bloom_build(
    keys: DataFrame, key: str, m: int = BLOOM_BITS, k: int = BLOOM_K
) -> DataFrame:
    """One-row DataFrame ``(bloom: array<int>)`` — the sorted set-bit
    positions of all build keys. Aggregates map-side to ≤m distinct
    positions per task; broadcast the single row to probe."""
    j = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("j")
    return (
        keys.select(F.col(key).alias("_k"))
        .select(F.col("_k"), j)
        .select(bloom_position(F.col("_k"), F.col("j"), m).alias("pos"))
        .agg(F.sort_array(F.collect_set("pos")).alias("bloom"))
    )


def bloom_might_contain(
    bloom_arr: Column, key: Column, m: int = BLOOM_BITS, k: int = BLOOM_K
) -> Column:
    """True iff every hash position of ``key`` is set (no false
    negatives). Pure Catalyst — k array_contains probes."""
    cond = F.lit(True)
    for j in range(k):
        cond = cond & F.array_contains(
            bloom_arr, bloom_position(key, F.lit(j), m)
        )
    return cond


def sql_bloom_semijoin_stats(
    m: int = BLOOM_BITS, k: int = BLOOM_K, segment: str = "BUILDING"
) -> str:
    """DuckDB twin of the driver's bloom semi-join demo: build the
    filter from one customer segment, probe every order, report
    (n_orders, n_pass, n_true, n_false_pos)."""

    def pos(key, j):
        return (
            f"CAST(CAST(('0x' || substr(md5(CAST({j} AS VARCHAR) || '#' || "
            f"CAST({key} AS VARCHAR)), 1, 15)) AS BIGINT) % {m} AS INT)"
        )

    probes = " AND ".join(
        f"list_contains(bloom, {pos('o.o_custkey', j)})" for j in range(k)
    )
    return (
        f"WITH seg AS (SELECT c_custkey FROM customer "
        f"WHERE c_mktsegment = '{segment}'), "
        f"bits AS (SELECT DISTINCT {pos('c_custkey', 'r.j')} AS pos "
        f"FROM seg, range({k}) r(j)), "
        "bl AS (SELECT list_sort(list(pos)) AS bloom FROM bits), "
        "probed AS (SELECT o.o_orderkey, "
        f"({probes}) AS pass, "
        "(o.o_custkey IN (SELECT c_custkey FROM seg)) AS truth "
        "FROM orders o CROSS JOIN bl) "
        "SELECT COUNT(*) AS n_orders, "
        "CAST(SUM(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass, "
        "CAST(SUM(CASE WHEN truth THEN 1 ELSE 0 END) AS BIGINT) AS n_true, "
        "CAST(SUM(CASE WHEN pass AND NOT truth THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n_false_pos FROM probed"
    )


def value_histogram(
    df: DataFrame,
    cents: Column,
    width_cents: int = 500,
) -> DataFrame:
    """Equi-width histogram over a NON-NEGATIVE integer-cents measure:
    ``(bin, lo_cents, n, sum_cents, cum_n)`` with
    ``bin = cents div width`` — the distribution profile a pipeline
    sidecar emits per ingest batch (spotting drift/truncation before
    training sees it).

    Scale shape: one map-side-combinable groupBy on the bin key (bin
    count is bounded by the value range, not the row count), then the
    cumulative count rides a single-task window over the tiny bin
    table. Integer floor-division bins require cents ≥ 0: Spark's
    ``div`` truncates toward zero while negative floors differ, so
    callers with signed measures must shift first (asserted here via
    a documented convention, not a runtime scan).
    """
    binned = (
        df.select(cents.cast("long").alias("_c"))
        .groupBy(F.expr(f"_c div {width_cents}").alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_c").alias("sum_cents"),
        )
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    return binned.select(
        "bin",
        (F.col("bin") * width_cents).alias("lo_cents"),
        "n",
        "sum_cents",
        F.sum("n").over(w).alias("cum_n"),
    )


def sql_value_histogram(
    body_sql: str, cents_expr: str, width_cents: int = 500
) -> str:
    """DuckDB twin of :func:`value_histogram` (``//`` floors, but the
    non-negative convention makes it identical to Spark's ``div``)."""
    return (
        f"WITH src AS ({body_sql}), "
        f"b AS (SELECT ({cents_expr}) // {width_cents} AS bin, "
        "COUNT(*) AS n, "
        f"CAST(SUM({cents_expr}) AS BIGINT) AS sum_cents "
        "FROM src GROUP BY 1) "
        f"SELECT bin, bin * {width_cents} AS lo_cents, n, sum_cents, "
        "CAST(SUM(n) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED "
        "PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n FROM b"
    )
